"""bf16 nq=2 kernel gap: where does the missing 10% go, and can a manual
slot ring reclaim it?

exp_bf16lo.py established (artifacts/wall/bf16lo.log): the 1R:mW probe rate
at bf16 granularity equals f32 (661 vs 657 GB/s — no 2-byte wall), the
production cap (512Ki elements) is already optimal, yet the production VPU
kron runs at 89.6% (2D) / 91.8% (3D) of the same-session probe where the
f32 kernel reaches 95.4%.  Leading hypothesis: Mosaic's block pipeline has
a fixed per-block bubble, and at bf16 each block carries HALF the bytes of
the f32 block (same element cap), doubling the relative bubble cost —
f32's 4.6% loss scales to ~9.2%, matching the measured 10.4%.

Variants, back-to-back at nelmt=1Mi (production peak size):

  A  control       kron_vpu_blocked at cap=512Ki — the committed tier
  B  native mul    same kernel but the scalar mul in bf16 (c downcast in
                   kernel) instead of f32-upcast math: isolates VPU
                   convert cost from pipeline cost
  C  plane stores  f32 math, nq separate per-plane stores instead of the
                   stacked broadcast store: isolates the stack relayout
  D  slot ring     the expand probe's own manual DMA ring with the c[t]
                   scale fused in (exp_nq2wall variant D): decouples DMA
                   chunk size from the grid, so the bubble amortizes over
                   16 MB chunks regardless of itemsize.  Lost to Mosaic at
                   f32 (17.56 vs 17.93 3D); at bf16 the bubble tax doubles
                   while the ring's does not — the balance should flip.

Runs the 2D m=4 case (b04 nq=2) and the 3D m=8 case (b05 nq=2^3).

Usage: python docs/experiments/exp_bf16lo2.py [nelmt]     (default 1048576)
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
from tpu_bench.kernels.bwdtrans2d import _parallel_params, kron_vpu_blocked
from tpu_bench.benchmarks import benchmark04 as b04_mod
from tpu_bench.ops import bwdtrans, initdata


# ---- B: native-dtype scalar mul (no f32 upcast on the VPU path) ----------


def _kron_native_kernel(nq, nm, c_ref, in_ref, out_ref):
    idt = out_ref.dtype
    cs = [[c_ref[t, p].astype(idt) for p in range(nm)] for t in range(nq)]
    acc = [in_ref[0, 0] * cs[t][0] for t in range(nq)]
    for p in range(1, nm):
        for t in range(nq):
            acc[t] += in_ref[0, p] * cs[t][p]
    out_ref[0] = jnp.stack(acc)


def kron_vpu_native(in_blk4, c_coa, *, interpret=False):
    nblk, nm, cr, lanes = in_blk4.shape
    nq = c_coa.shape[0]
    c_coa = c_coa.astype(common.acc_dtype(in_blk4.dtype))  # SMEM is 32-bit
    return pl.pallas_call(
        functools.partial(_kron_native_kernel, nq, nm),
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


# ---- C: per-plane stores (f32 math, no stacked broadcast) ----------------


def _kron_plane_kernel(nq, nm, c_ref, in_ref, out_ref):
    odt = out_ref.dtype
    for t in range(nq):
        acc = in_ref[0, 0] * c_ref[t, 0]
        for p in range(1, nm):
            acc += in_ref[0, p] * c_ref[t, p]
        out_ref[0, t] = acc.astype(odt)


def kron_vpu_planes(in_blk4, c_coa, *, interpret=False):
    nblk, nm, cr, lanes = in_blk4.shape
    nq = c_coa.shape[0]
    c_coa = c_coa.astype(common.acc_dtype(in_blk4.dtype))
    return pl.pallas_call(
        functools.partial(_kron_plane_kernel, nq, nm),
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


# ---- D: manual slot ring with the scale fused (exp_nq2wall variant D) ----


def _scaled_expand_kernel(rows, cr, depth, m, native, c_ref, x_hbm, out_hbm):
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
                c = c_ref[t, 0]
                if native:
                    c = c.astype(x_hbm.dtype)
                obufs[slot, t] = (bufs[slot] * c).astype(x_hbm.dtype)
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


def scaled_expand(x2, c_coa, *, chunk_bytes=8 * 1024 * 1024, depth=3,
                  native=False, interpret=False):
    rows = x2.shape[0]
    m = c_coa.shape[0]
    cr = stream._chunk_rows(rows, x2.dtype.itemsize, chunk_bytes, depth)
    ring = depth * (2 + m) * cr * common.LANES * x2.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_scaled_expand_kernel, rows, cr, depth, m, native),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((m * rows, common.LANES), x2.dtype),
        interpret=interpret,
        **stream._vmem_params(ring, interpret),
    )(c_coa.astype(common.acc_dtype(x2.dtype)), x2)


def run(label, fn, args, dof, ref_norm, cfg):
    try:
        t, w = timing.measure(fn, args, cfg,
                              chain_fn=eps_chain(fn, eps_arg=1),
                              with_witness=True)
        err = abs(float(np.sqrt(w)) - ref_norm) / ref_norm
        print(f"{label:36s} {dof / t:8.2f} GDOF/s  rel-err {err:.2e}",
              flush=True)
    except Exception as ex:
        print(f"{label:36s} FAIL {str(ex).splitlines()[0][:100]}",
              flush=True)


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    e_pad = initdata.round_up(nelmt, 128)
    assert e_pad == nelmt, "use a multiple of 128"
    cfg = Config(timing="chained")
    dt = jnp.bfloat16

    # ---- 2D b04 nq=2 (m=4) ----------------------------------------------
    basis = bwdtrans.make_basis2d(2, 2, dt)
    src = bwdtrans.stream_sources(
        bwdtrans.element_data2d(basis, dt),
        (basis.nm1, basis.nm0), nelmt, e_pad, dt)
    c_coa = jnp.asarray(bwdtrans.operators2d(basis)[0].T)  # (4, 1)
    dof = 1e-9 * nelmt * basis.nm_tot
    ref = float(l2norm(src["coa"]())) * float(
        jnp.linalg.norm(c_coa.astype(jnp.float32)))
    print(f"b04 nq=2 bf16 nelmt={nelmt} ref norm {ref:.6f}", flush=True)
    in_blk4 = b04_mod._blk4(src, basis.nm_tot, e_pad, 524288)
    run("A control  kron_vpu cap=512Ki", jax.jit(kron_vpu_blocked),
        (in_blk4, c_coa), dof, ref, cfg)
    run("B native mul         cap=512Ki", jax.jit(kron_vpu_native),
        (in_blk4, c_coa), dof, ref, cfg)
    run("C plane stores       cap=512Ki", jax.jit(kron_vpu_planes),
        (in_blk4, c_coa), dof, ref, cfg)
    del in_blk4
    x2 = common.as_2d(src["coa"]().reshape(-1))  # nm_tot=1: flat e-stream
    for cb in (4, 8, 16):
        run(f"D slot ring chunk={cb:2d}MB",
            jax.jit(functools.partial(scaled_expand,
                                      chunk_bytes=cb * 1024 * 1024)),
            (x2, c_coa), dof, ref, cfg)
    run("D slot ring chunk= 8MB native",
        jax.jit(functools.partial(scaled_expand, native=True)),
        (x2, c_coa), dof, ref, cfg)
    del x2, src

    # ---- 3D b05 nq=2^3 (m=8) ---------------------------------------------
    basis3 = bwdtrans.make_basis3d(2, 2, 2, dt)
    src3 = bwdtrans.stream_sources(
        bwdtrans.element_data3d(basis3, dt),
        (basis3.nm2, basis3.nm1, basis3.nm0), nelmt, e_pad, dt)
    c3 = jnp.asarray(bwdtrans.operators3d(basis3)[0].T)    # (8, 1)
    dof3 = 1e-9 * nelmt * basis3.nm_tot
    ref3 = float(l2norm(src3["coa"]())) * float(
        jnp.linalg.norm(c3.astype(jnp.float32)))
    print(f"b05 nq=2^3 bf16 nelmt={nelmt} ref norm {ref3:.6f}", flush=True)
    in_blk43 = b04_mod._blk4(src3, basis3.nm_tot, e_pad, 524288)
    run("A control  kron_vpu cap=512Ki", jax.jit(kron_vpu_blocked),
        (in_blk43, c3), dof3, ref3, cfg)
    run("B native mul         cap=512Ki", jax.jit(kron_vpu_native),
        (in_blk43, c3), dof3, ref3, cfg)
    del in_blk43
    x23 = common.as_2d(src3["coa"]().reshape(-1))
    for cb in (4, 8, 16):
        run(f"D slot ring chunk={cb:2d}MB",
            jax.jit(functools.partial(scaled_expand,
                                      chunk_bytes=cb * 1024 * 1024)),
            (x23, c3), dof3, ref3, cfg)


if __name__ == "__main__":
    main()
