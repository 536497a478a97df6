"""b05 nq4: manual-DMA ring pipeline over the blocked coalesced layout.

in  (nblk*27, ce) -> out (nblk*64, ce), resident C (64, 27), MXU dot per
chunk.  Contiguous chunk DMAs (the strided variant does not compile).
"""
import sys, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.ops import bwdtrans, initdata

NQ = 4
E = 1048576
HIGHEST = jax.lax.Precision.HIGHEST


def kron_manual_blk(in_blk2, c_coa, *, ce, depth, precision=HIGHEST):
    nq_tot, nm_tot = c_coa.shape
    rows_in = in_blk2.shape[0]
    nblk = rows_in // nm_tot

    def kernel(c_ref, x_hbm, o_hbm):
        def body(xs, os, sx, sw):
            def rd(slot, j):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(j * nm_tot, nm_tot), :], xs.at[slot],
                    sx.at[slot])
            def wr(slot, j):
                return pltpu.make_async_copy(
                    os.at[slot], o_hbm.at[pl.ds(j * nq_tot, nq_tot), :],
                    sw.at[slot])
            for j in range(min(depth, nblk)):
                rd(j, j).start()
            def loop(j, _):
                slot = j % depth
                rd(slot, j).wait()
                @pl.when(j >= depth)
                def _():
                    wr(slot, j - depth).wait()
                os[slot] = jnp.dot(c_ref[:], xs[slot],
                                   preferred_element_type=xs.dtype,
                                   precision=precision)
                wr(slot, j).start()
                @pl.when(j + depth < nblk)
                def _():
                    rd(slot, j + depth).start()
                return _
            jax.lax.fori_loop(0, nblk, loop, None)
            for j in range(max(nblk - depth, 0), nblk):
                wr(j % depth, j).wait()
        pl.run_scoped(
            body,
            xs=pltpu.VMEM((depth, nm_tot, ce), in_blk2.dtype),
            os=pltpu.VMEM((depth, nq_tot, ce), in_blk2.dtype),
            sx=pltpu.SemaphoreType.DMA((depth,)),
            sw=pltpu.SemaphoreType.DMA((depth,)),
        )
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nblk * nq_tot, ce), in_blk2.dtype),
    )(c_coa, in_blk2)


def measure(label, fn, args, nm):
    chain = eps_chain(fn, eps_arg=1)
    run_k = timing.build_chain(chain)
    try:
        t, w = timing.time_chained(run_k, args, n_tests=12,
                                   compiler_options=timing.honest_options(None))
        print(f"{label:30s}: {1e-9 * E * nm / t:7.2f} GDOF/s  t={t*1e3:.2f} ms"
              f"  norm={w**0.5:.4f}")
    except Exception as ex:
        print(f"{label:30s}: FAIL {type(ex).__name__}: {str(ex)[:110]}")


def main():
    dt = jnp.float32
    basis = bwdtrans.make_basis3d(NQ, NQ, NQ, dt)
    e_pad = initdata.round_up(E, 128)
    in_em2, in_coa = bwdtrans.make_inputs3d(basis, E, e_pad, dt)
    c_em3, *_ = bwdtrans.operators3d(basis)
    c_coa3 = jnp.asarray(c_em3.T)
    nm = basis.nm_tot
    for ce, depth in ((8192, 3), (8192, 4), (16384, 3), (4096, 4),
                      (16384, 4), (32768, 3)):
        nblk = e_pad // ce
        in_blk2 = jnp.asarray(
            in_coa.reshape(nm, nblk, ce).transpose(1, 0, 2)).reshape(
                nblk * nm, ce)
        jax.block_until_ready(in_blk2)
        fn = jax.jit(functools.partial(kron_manual_blk, ce=ce, depth=depth))
        measure(f"kron_manual_blk ce={ce} d={depth}", fn, (in_blk2, c_coa3),
                nm)
        del in_blk2


if __name__ == "__main__":
    main()
