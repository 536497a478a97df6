"""b05 nq=2^3 same-session wall proof: expand8 probe vs the production tier.

VERDICT r3 #3: the losing-cell argument — the committed 17.44 GDOF/s vs the
reference's 18.45 (benchmark05/nq2x2x2.log, Cuda Coales) is capped by the
chip's measured 1R:8W rate — rested on a probe measured in a DIFFERENT
session from the kernel.  This experiment runs, back-to-back on the idle
chip:

  P  expand8 probe      the exact ceilings.py 1R:8W manual-DMA ring probe
                        (512 MiB f32) and its implied nq=2^3 GDOF/s ceiling
                        (36 B/DOF: 1 read + 8 written f32 per input DOF)
  A  production         kron_vpu_blocked exactly as benchmark05 dispatches
                        it (wide-4D blocked layout, cap=262144)
  B  cap sweep          the same kernel at other wide-chunk caps
  C  bcast store        single stacked (nq, cr, lanes) store per block
                        instead of nq separate tile stores
  D  scaled expand      the probe's own DMA slot-ring with the c[t] scale
                        fused in: read chunk -> 8 scaled VMEM images -> 8
                        concurrent writes.  If the probe's 657 GB/s is
                        reachable with compute attached, this is the shape
                        that reaches it.

At nq=2^3 nm_tot=1, so the math is a pure scaled expansion out[t,e] =
C[t,0] * in[e]; all variants produce the same value multiset (norms are
layout-invariant).

Usage: python docs/experiments/exp_nq2wall.py [nelmt]   (default 1048576)
"""
import os as _os
import sys

sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.core.config import Config
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.core.validate import l2norm
from tpu_bench.kernels import common, stream
from tpu_bench.kernels.bwdtrans2d import (_parallel_params,
                                          kron_vpu_blocked)
from tpu_bench.benchmarks import benchmark04 as b04_mod
from tpu_bench.ops import bwdtrans, initdata


# ---- P: the ceilings.py expand8 probe, verbatim semantics ---------------


def probe_expand8(n=134217728, n_tests=12):
    """1R:8W GB/s on a 512 MiB f32 buffer (ceilings.py's expand8)."""
    x = jnp.arange(n, dtype=jnp.float32) % 7
    tok0 = jnp.zeros((1, 1), jnp.float32)
    jax.block_until_ready((x, tok0))

    @jax.jit
    def run_expand(k, xx, tok0):
        def body(i, tok):
            o = stream.expand_manual(xx, 8, bias=tok * 0.0)
            return o[:1, :1]

        tok = jax.lax.fori_loop(0, k, body, tok0)
        return jnp.sum(tok)

    t, _ = timing.time_chained(run_expand, (x, tok0), n_tests=n_tests,
                               compiler_options=timing.honest_options(None))
    return 9 * 4 * n * 1e-9 / t


# ---- C: broadcast-store variant of the VPU kron --------------------------


def _kron_bcast_kernel(nq, nm, c_ref, in_ref, out_ref):
    acc = [in_ref[0, 0] * c_ref[t, 0] for t in range(nq)]
    for p in range(1, nm):
        for t in range(nq):
            acc[t] += in_ref[0, p] * c_ref[t, p]
    out_ref[0] = jnp.stack(acc).astype(out_ref.dtype)


def kron_vpu_bcast(in_blk4, c_coa, *, interpret=False):
    nblk, nm, cr, lanes = in_blk4.shape
    nq = c_coa.shape[0]
    c_coa = c_coa.astype(common.acc_dtype(in_blk4.dtype))
    return pl.pallas_call(
        functools.partial(_kron_bcast_kernel, nq, nm),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nm, cr, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nq, cr, lanes), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, nq, cr, lanes),
                                       in_blk4.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(c_coa, in_blk4)


# ---- D: the probe's slot-ring with the scale fused in ---------------------


def _scaled_expand_kernel(rows, cr, depth, m, c_ref, x_hbm, out_hbm):
    nchunks = rows // cr

    def body(bufs, obufs, sr, sw):
        def rd(slot, j):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(j * cr, cr), :], bufs.at[slot], sr.at[slot])

        def wr(slot, j, t):
            return pltpu.make_async_copy(
                obufs.at[slot, t],
                out_hbm.at[pl.ds((j * m + t) * cr, cr), :], sw.at[slot, t])

        for j in range(min(depth, nchunks)):
            rd(j, j).start()

        def loop(j, _):
            slot = j % depth
            rd(slot, j).wait()
            for t in range(m):
                obufs[slot, t] = bufs[slot] * c_ref[t, 0]
            for t in range(m):
                wr(slot, j, t).start()

            @pl.when(j + depth < nchunks)
            def _():
                for t in range(m):
                    wr(slot, j, t).wait()  # slot reused: writes must land
                rd(slot, j + depth).start()

            return _

        jax.lax.fori_loop(0, nchunks, loop, None)
        for j in range(max(nchunks - depth, 0), nchunks):
            for t in range(m):
                wr(j % depth, j, t).wait()

    pl.run_scoped(body,
                  pltpu.VMEM((depth, cr, common.LANES), x_hbm.dtype),
                  pltpu.VMEM((depth, m, cr, common.LANES), x_hbm.dtype),
                  pltpu.SemaphoreType.DMA((depth,)),
                  pltpu.SemaphoreType.DMA((depth, m)))


def scaled_expand(x2, c_coa, *, chunk_bytes=2 * 1024 * 1024, depth=3,
                  interpret=False):
    """out[(j*m+t)*cr : ...] = c[t] * x[chunk j] — same value multiset as
    the kron at nm_tot=1, same DMA shape as the expand8 probe."""
    rows = x2.shape[0]
    m = c_coa.shape[0]
    cr = stream._chunk_rows(rows, x2.dtype.itemsize, chunk_bytes, depth)
    ring = depth * (1 + m) * cr * common.LANES * x2.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_scaled_expand_kernel, rows, cr, depth, m),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((m * rows, common.LANES), x2.dtype),
        interpret=interpret,
        **stream._vmem_params(ring, interpret),
    )(c_coa.astype(common.acc_dtype(x2.dtype)), x2)


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    cfg = Config(timing="chained")

    basis = bwdtrans.make_basis3d(2, 2, 2, jnp.float32)
    e_pad = initdata.round_up(nelmt, 128)
    assert e_pad == nelmt, "use a multiple of 128"
    src = bwdtrans.stream_sources(
        bwdtrans.element_data3d(basis, jnp.float32),
        (basis.nm2, basis.nm1, basis.nm0), nelmt, e_pad, jnp.float32)
    c_em3 = bwdtrans.operators3d(basis)[0]
    c_coa3 = jnp.asarray(c_em3.T)                      # (nq_tot=8, nm_tot=1)
    dof = 1e-9 * nelmt * basis.nm_tot
    ref_norm = float(l2norm(src["coa"]())) * float(jnp.linalg.norm(c_coa3))
    print(f"nq=2^3 nelmt={nelmt} ref norm {ref_norm:.6f}", flush=True)

    # P first — the probe and every kernel below share this session
    gbs = probe_expand8()
    print(f"P expand8 probe                  {gbs:8.2f} GB/s -> ceiling "
          f"{gbs / 36:6.2f} GDOF/s", flush=True)

    def run(label, fn, args):
        try:
            t, w = timing.measure(fn, args, cfg,
                                  chain_fn=eps_chain(fn, eps_arg=1),
                                  with_witness=True)
            err = abs(float(np.sqrt(w)) - ref_norm) / ref_norm
            print(f"{label:32s} {dof / t:8.2f} GDOF/s  rel-err {err:.2e}",
                  flush=True)
        except Exception as ex:
            print(f"{label:32s} FAIL {str(ex).splitlines()[0][:100]}",
                  flush=True)

    for cap in (131072, 262144, 524288):
        in_blk4 = b04_mod._blk4(src, basis.nm_tot, e_pad, cap)
        tag = "A production   " if cap == 262144 else "B cap sweep    "
        run(f"{tag} cap={cap:7d}", jax.jit(kron_vpu_blocked),
            (in_blk4, c_coa3))
        run(f"C bcast store   cap={cap:7d}", jax.jit(kron_vpu_bcast),
            (in_blk4, c_coa3))
        del in_blk4

    x2 = common.as_2d(src["coa"]().reshape(-1))  # nm_tot=1: flat e-stream
    for cb in (1, 2, 4):
        run(f"D scaled expand chunk={cb}MB",
            jax.jit(functools.partial(scaled_expand,
                                      chunk_bytes=cb * 1024 * 1024)),
            (x2, c_coa3))


if __name__ == "__main__":
    main()
