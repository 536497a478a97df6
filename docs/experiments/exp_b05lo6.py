"""b05 nq4 round-2 squeeze: epb sweep, blocked layout, manual-DMA kron.

nq=4^3: 27 modes in, 64 points out, f32 -> 364 B/elem, 13.48 B/DOF.
Measured machine ceilings (exp_b02f): read 733, write 643 GB/s.
Write-heavy mixed ceiling ~= 364 / (108/733 + 256/643) = 667 GB/s
=> ~49.5 GDOF/s physical ceiling at HBM-resident sizes.
"""
import sys, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.kernels import bwdtrans3d as pl_bt
from tpu_bench.ops import bwdtrans, initdata

NQ = 4
E = 1048576
HIGHEST = jax.lax.Precision.HIGHEST


def measure(label, fn, args, nm):
    chain = eps_chain(fn, eps_arg=1)
    run_k = timing.build_chain(chain)
    try:
        t, _ = timing.time_chained(run_k, args, n_tests=12,
                                   compiler_options=timing.honest_options(None))
        print(f"{label:34s}: {1e-9 * E * nm / t:7.2f} GDOF/s  t={t*1e3:.2f} ms")
    except Exception as ex:
        print(f"{label:34s}: FAIL {type(ex).__name__}: {str(ex)[:110]}")


# --- blocked-contiguous coalesced layout: (nblk, nm, ce) -----------------
def kron_blocked(in_blk, c_coa, *, interpret=False, precision=HIGHEST):
    nblk, nm_tot, ce = in_blk.shape
    nq_tot = c_coa.shape[0]
    def kern(c_ref, in_ref, out_ref):
        out_ref[0] = jnp.dot(c_ref[:], in_ref[0],
                             preferred_element_type=in_ref.dtype,
                             precision=precision)
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nq_tot, nm_tot), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nm_tot, ce), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nq_tot, ce), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, nq_tot, ce), in_blk.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(c_coa, in_blk)


# --- manual DMA pipelined kron over lane chunks --------------------------
def kron_manual(in_coa, c_coa, *, ce, depth, precision=HIGHEST):
    nm_tot, e = in_coa.shape
    nq_tot = c_coa.shape[0]
    nchunks = e // ce

    def kernel(c_ref, x_hbm, o_hbm):
        def body(xs, os, sx, sw):
            def rd(slot, j):
                return pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(j * ce, ce)], xs.at[slot], sx.at[slot])
            def wr(slot, j):
                return pltpu.make_async_copy(
                    os.at[slot], o_hbm.at[:, pl.ds(j * ce, ce)], sw.at[slot])
            for j in range(min(depth, nchunks)):
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
                @pl.when(j + depth < nchunks)
                def _():
                    rd(slot, j + depth).start()
                return _
            jax.lax.fori_loop(0, nchunks, loop, None)
            for j in range(max(nchunks - depth, 0), nchunks):
                wr(j % depth, j).wait()
        pl.run_scoped(
            body,
            xs=pltpu.VMEM((depth, nm_tot, ce), in_coa.dtype),
            os=pltpu.VMEM((depth, nq_tot, ce), in_coa.dtype),
            sx=pltpu.SemaphoreType.DMA((depth,)),
            sw=pltpu.SemaphoreType.DMA((depth,)),
        )
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nq_tot, e), in_coa.dtype),
    )(c_coa, in_coa)


def main():
    cfgdt = jnp.float32
    basis = bwdtrans.make_basis3d(NQ, NQ, NQ, cfgdt)
    e_pad = initdata.round_up(E, 128)
    in_em2, in_coa = bwdtrans.make_inputs3d(basis, E, e_pad, cfgdt)
    c_em3, c12t, s1, s2, s3 = bwdtrans.operators3d(basis)
    c_coa3 = jnp.asarray(c_em3.T)
    nm = basis.nm_tot
    jax.block_until_ready((in_coa, c_coa3))

    for epb in (8192, 16384, 32768, 65536):
        fn = jax.jit(functools.partial(pl_bt.kron_coalesced, epb=epb))
        measure(f"kron_coalesced epb={epb}", fn, (in_coa, c_coa3), nm)

    for ce in (8192, 16384, 32768):
        nblk = e_pad // ce
        in_blk = jnp.asarray(
            in_coa.reshape(nm, nblk, ce).transpose(1, 0, 2))
        jax.block_until_ready(in_blk)
        fn = jax.jit(functools.partial(kron_blocked))
        measure(f"kron_blocked ce={ce}", fn, (in_blk, c_coa3), nm)
        del in_blk

    for ce, depth in ((16384, 3), (32768, 3), (16384, 4), (65536, 2)):
        fn = jax.jit(functools.partial(kron_manual, ce=ce, depth=depth))
        measure(f"kron_manual ce={ce} d={depth}", fn, (in_coa, c_coa3), nm)

    # current best fused QP/Shared for comparison
    in_pcoa3 = jnp.asarray(
        in_coa.reshape(basis.nm2 * basis.nm1, basis.nm0, e_pad)
        .transpose(1, 0, 2))
    jax.block_until_ready(in_pcoa3)
    for epb in (8192, 16384):
        fn = jax.jit(functools.partial(pl_bt.qp_shared3d, epb=epb))
        measure(f"qp_shared3d epb={epb}", fn, (in_pcoa3, basis.b0, c12t), nm)


if __name__ == "__main__":
    main()
