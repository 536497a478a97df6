"""Pallas 2D BwdTrans kernels — benchmark04's hand-written tier.

The reference has six CUDA kernels spanning two axes
(benchmark04/benchmark04.cc:15-426): data layout (element-major vs
warp-interleaved "coalesced") and staging (monolithic per-thread vs
quadrature-point cooperative "QP" kernels with global or shared-memory
workspaces).  TPU-native mapping (SURVEY.md §2.3):

  layout axis:   element index on the slow axis (element-major, the
                 uncoalesced analog) vs on the 128-lane minor axis
                 (coalesced — the natural TPU tiling);
  staging axis:  single fused kernel holding inter-stage workspaces in VMEM
                 scratch (the __shared__ analog) vs two pallas_calls with
                 the workspace round-tripping through HBM (the global-
                 workspace analog);
  math axis:     sum-factorized two-stage contraction (loop of small MXU
                 dots, minimal FLOPs) vs single dense kron-operator GEMM
                 (maximal MXU regularity, more FLOPs).

All kernels keep the basis/operator matrices resident in VMEM and stream
elements in blocks of `epb` lanes/sublanes (the threads/elblocks analog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.kernels import common

HIGHEST = jax.lax.Precision.HIGHEST


def _split_f32(x):
    """Exact f32 = bf16 hi + f32 lo decomposition (lo is itself
    bf16-representable up to one more split level)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot(a, b, precision):
    # MXU accumulation is 32-bit minimum: for bf16 operands request an f32
    # accumulator (Mosaic rejects a bf16 acc outright) and let the caller
    # cast on store.  f32/f64 pass through unchanged.  Precision only
    # controls the bf16-decomposition of f32 operands — for bf16 inputs a
    # single MXU pass is already exact, so drop the request (Mosaic's
    # matmul lowering cannot honor HIGHEST on bf16).
    dt = jnp.result_type(a.dtype, b.dtype)
    if dt == jnp.bfloat16:
        precision = None
    elif precision == jax.lax.Precision.HIGH and dt == jnp.float32:
        # Mosaic rejects Precision.HIGH inside kernels, so build XLA's
        # HIGH scheme (bf16x3) by hand: split both operands into bf16
        # hi + lo and take three DEFAULT MXU passes, dropping only the
        # ~2^-18-weight lo*lo term.  Halves the MXU work of HIGHEST's
        # 6-pass emulation at ~1e-6 relative error — the measured
        # nq=32 frontier (docs/experiments/exp_nq32c.py: 3-pass 81
        # GDOF/s @ 1.03e-5 rel-err vs 6-pass 55.6 @ 5.3e-8).
        ah, al = _split_f32(a)
        bh, bl = _split_f32(b)
        d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
        return d(ah, bh) + (d(ah, bl) + d(al, bh))
    return jnp.dot(a, b, preferred_element_type=common.acc_dtype(dt),
                   precision=precision)


def _parallel_params(interpret):
    """Element-grid steps are independent: tell Mosaic so it can overlap
    the in/out DMA pipeline across grid steps (interpret mode takes none)."""
    return common.grid_semantics("parallel", interpret=interpret)


# ---- coalesced layout: (nm1, nm0, E) -> (nq1, nq0, E) -------------------


def _kron_coa_kernel(precision, c_ref, in_ref, out_ref):
    # single dense operator GEMM: out[(j,i), e] = C_coa[(j,i),(q,p)] in[(q,p), e]
    out_ref[:] = _dot(c_ref[:], in_ref[:], precision).astype(out_ref.dtype)


def kron_coalesced(in_coa, c_coa, *, epb, interpret=False, precision=HIGHEST):
    """out_coa = C_coa @ in_coa, element blocks on the lane axis."""
    nm_tot, e = in_coa.shape
    nq_tot = c_coa.shape[0]
    grid = (e // epb,)
    out = pl.pallas_call(
        functools.partial(_kron_coa_kernel, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq_tot, nm_tot), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nm_tot, epb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq_tot, epb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_tot, e), in_coa.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(c_coa, in_coa)
    return out


def _kron_blk_kernel(precision, c_ref, in_ref, out_ref):
    out_ref[0] = _dot(c_ref[:], in_ref[0], precision).astype(out_ref.dtype)


def kron_blocked(in_blk, c_coa, *, interpret=False, precision=HIGHEST):
    """Dense operator GEMM over the chunk-interleaved coalesced layout
    (nblk, nmTot, ce): each grid step's element chunk is one CONTIGUOUS
    HBM region (the reference's warp-interleaved layout with chunk width
    ce instead of warpsize 32, benchmark04/benchmark04.cc:859-875).
    Versus the flat (nmTot, E) layout, whose per-block reads are nmTot
    separate E-strided row segments, the contiguous chunks pipeline
    cleaner: measured 44.9 vs 43.8 GDOF/s at b05 nq=4^3, nelmt=1Mi (v5e,
    HBM-honest).  Dimension-agnostic — 3D callers pass the kron3 operator.
    Output stays blocked (nblk, nqTot, ce); norms are layout-invariant."""
    nblk, nm_tot, ce = in_blk.shape
    nq_tot = c_coa.shape[0]
    out = pl.pallas_call(
        functools.partial(_kron_blk_kernel, precision),
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
        interpret=interpret,
        **_parallel_params(interpret),
    )(c_coa, in_blk)
    return out


# Max nmTot*nqTot for the VPU-kron blocked tier (unrolled FMA statements
# per block): covers nq=2 only (any dim: 1*4 2D, 1*8 3D) — the K=1 regime
# where an MXU dot is pure broadcast and the VPU wins (3D nq=2: 17.5 vs
# 11.7 GDOF/s).  nq=4 2D moved to kron_wide4 in round 3: the 4D-wide MXU
# form reads 56.1 vs 44.9 for the VPU ring (docs/experiments/exp_lo46c.py).
VPU_KRON_MAX = 32

# Chunk width (elements) for the wide-4D MXU kron tier: measured optimum
# on v5e at nelmt=1Mi — 56.2/65.0/69.8 GDOF/s at nq=4/6/8 with ce=32768,
# falling monotonically toward ce=262144 (docs/experiments/exp_lo46d.py).
WIDE4_CHUNK = 32768


def _kron_wide4_kernel(precision, c_ref, in_ref, out_ref):
    nm, cr, lanes = in_ref.shape[1:]
    nq = out_ref.shape[1]
    flat = in_ref[0].reshape(nm, cr * lanes)
    og = _dot(c_ref[:], flat, precision)
    out_ref[0] = og.reshape(nq, cr, lanes).astype(out_ref.dtype)


def kron_wide4(in_blk4, c_coa, *, interpret=False, precision=HIGHEST):
    """Dense operator GEMM over the wide-chunk 4D blocked layout
    (nblk, nmTot, ce/128, 128) — the round-3 low/mid-order Coales tier
    (docs/experiments/exp_lo46{b,c,d}.py): the SAME kron GEMM at the SAME
    ce reads 50.7 vs 42.7 GDOF/s through the 4D form vs the flat-minor 3D
    form at nq=4 (Mosaic tiles the explicit (cr, 128) minor structure
    better than a 262144-wide row), and the ce=32768 optimum lands at
    95-98% of the geometry's measured copy-probe rate across nq=4..12:
    56.1/65.0/69.8/72.5/73.6 at nq=4/6/8/10/12 vs committed round-2
    values of 44.9/55.2/67.3/67.4/72.4.  Dimension-agnostic — in 3D it is
    the Coales tier for the mid orders, measured same-session ahead of the
    flat blocked GEMM (nq=4^3 47.4 vs 44.8, nq=6^3 59.6 vs 58.8 GDOF/s,
    artifacts/wall/lo3d.log) with 3D chunk optima 16384/8192.  Reference
    analog: the warp-interleaved coalesced CUDA kernel,
    benchmark04/benchmark04.cc:78-147."""
    nblk, nm, cr, lanes = in_blk4.shape
    nq = c_coa.shape[0]
    out = pl.pallas_call(
        functools.partial(_kron_wide4_kernel, precision),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nq, nm), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nm, cr, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nq, cr, lanes), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, nq, cr, lanes), in_blk4.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(c_coa, in_blk4)
    return out


def _kron_vpu_kernel(nq, nm, c_ref, in_ref, out_ref):
    # accumulate all nq output planes in vector registers, then store the
    # whole (nq, cr, lanes) block ONCE as a stacked broadcast — nq separate
    # tile stores leave ~2.5% on the table at the 1R:8W mix (the "C bcast
    # store" candidate of docs/experiments/exp_nq2wall.py)
    acc = [in_ref[0, 0] * c_ref[t, 0] for t in range(nq)]
    for p in range(1, nm):
        for t in range(nq):
            acc[t] += in_ref[0, p] * c_ref[t, p]
    out_ref[0] = jnp.stack(acc).astype(out_ref.dtype)


def kron_vpu_blocked(in_blk4, c_coa, *, interpret=False, precision=None):
    """Low-order dense kron as unrolled VPU FMAs over wide blocked chunks
    (Mosaic auto-pipelined) — no MXU pass: a (nqTot, nmTot) GEMM at
    nq<=4 is >90% tile padding and pays the 6-pass f32 emulation for a
    contraction that is really a streaming expansion.  Measured at b05
    nq=2^3 nelmt=1M in ONE session with the expand8 probe that sets the
    1R:8W mix ceiling (artifacts/wall/nq2wall.log): probe 656.4 GB/s ->
    18.23 GDOF/s ceiling; this kernel (stacked bcast store, 512Ki chunks)
    17.93 = 98% of it, vs 17.48 for the round-3 per-plane-store form at
    256Ki chunks and 11.7 for the MXU kron_blocked.  A manual-DMA
    slot-ring version measured ~6.3 regardless of chunk geometry
    (docs/experiments/exp_ring.py), and fusing the scale into the probe's
    own DMA ring peaked at 17.56 (exp_nq2wall.py variant D) — Mosaic's
    automatic block pipeline wins this one, so this kernel uses it.

    in_blk4 is the wide-chunk blocked layout (nblk, nmTot, ce/128, 128);
    output stays blocked — norms are layout-invariant.  precision is
    accepted for harness uniformity; there is no MXU pass."""
    del precision
    nblk, nm, cr, lanes = in_blk4.shape
    nq = c_coa.shape[0]
    c_coa = c_coa.astype(common.acc_dtype(in_blk4.dtype))  # SMEM is 32-bit
    out = pl.pallas_call(
        functools.partial(_kron_vpu_kernel, nq, nm),
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
    return out


def _qp_fused_kernel(nm0, nq0, precision, b1t_ref, b0_ref, in_ref, out_ref):
    odt = out_ref.dtype
    for p in range(nm0):
        # stage 1 (MXU): contract the q modes for mode p (f32 accumulator)
        tmp = _dot(b1t_ref[:], in_ref[p], precision)
        # stage 2 (VPU): accumulate mode p into every output plane i
        for i in range(nq0):
            contrib = (tmp * b0_ref[p, i]).astype(odt)
            if p == 0:
                out_ref[i] = contrib
            else:
                out_ref[i] += contrib


def qp_shared(in_pcoa3, b0, b1t, *, epb, interpret=False, precision=HIGHEST):
    """Single fused kernel with on-chip workspaces (the __shared__-workspace
    QP analog, benchmark04/benchmark04.cc:206-300): per p mode one MXU dot
    contracting q, then VPU accumulation over p straight into the output
    block.  Traffic-minimal: reads nmTot and writes nqTot values per
    element.  Input is p-major coalesced (nm0, nm1, E); output is i-major
    (nq0, nq1, E) — L2 norms are layout-invariant, which is what the
    cross-variant validation compares."""
    # SMEM holds 32-bit scalars: widen a bf16 basis for the scalar operand
    b0 = b0.astype(common.acc_dtype(in_pcoa3.dtype))
    nm0, nm1, e = in_pcoa3.shape
    nq0 = b0.shape[1]
    nq1 = b1t.shape[0]
    grid = (e // epb,)
    out = pl.pallas_call(
        functools.partial(_qp_fused_kernel, nm0, nq0, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq1, nm1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm0, nm1, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq0, nq1, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq0, nq1, e), in_pcoa3.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(b1t, b0, in_pcoa3)
    return out


def _qp_w_kernel(nm0, nq0, nq1, precision, b1t_ref, b0_ref, in_ref, out_ref,
                 w_ref):
    odt = out_ref.dtype
    # 1. all stage-1 dots upfront into the VMEM scratch: a dependency-free
    #    MXU queue the stage-2 loop below never has to wait on twice
    for p in range(nm0):
        w_ref[p] = _dot(b1t_ref[:], in_ref[p], precision).astype(w_ref.dtype)
    # 2. stage 2 accumulated in VECTOR REGISTERS, each output plane written
    #    exactly once (sliced back from the sublane-padded nq1p rows)
    for i in range(nq0):
        acc = w_ref[0] * b0_ref[0, i]
        for p in range(1, nm0):
            acc += w_ref[p] * b0_ref[p, i]
        out_ref[i] = acc[:nq1].astype(odt)


def qp_w(in_pcoa3, b0, b1tp, *, nq1, epb, interpret=False,
         precision=HIGHEST):
    """Mid/high-order fused QP kernel (the round-3 nq=14/16 dip fix,
    docs/experiments/exp_nq1416{c,d}.py): same math as qp_shared but
    restructured around the two measured stalls in its inner loop —

      - qp_shared interleaves one stage-1 dot with a stage-2 pass that
        accumulates via ``out_ref[i] +=``: a per-p VMEM read-modify-write
        chain on the output block.  Here stage 2 runs entirely in vector
        registers and writes each output plane once.
      - stage-1 dots all issue upfront into a VMEM scratch w, so the MXU
        queue drains ahead of the VPU loop instead of gating it per p.
      - b1tp is B1^T sublane-padded to nq1p = ceil8(nq1) zero rows: w
        planes and the stage-2 accumulator stay vreg-tile-aligned (the
        nq=14 case gains ~5% from this alone); the store slices back.

    Measured at nelmt=262144 (v5e, HBM-honest chained): nq=16
    74.8 GDOF/s vs 63.8 committed qp_shared (97% of the 77.3 empirical
    mix ceiling); nq=14 65.6 vs 62.3 (86%); nq=10/12 also ahead of
    qp_shared but still behind the dense-kron tiers that win there.
    Dispatched as the Pallas(QP/Shared) tier for 100 <= nqTot < 1024.
    Reference analog: the all-shared QP quad kernel,
    benchmark04/benchmark04.cc:206-300."""
    b0 = b0.astype(common.acc_dtype(in_pcoa3.dtype))  # SMEM is 32-bit
    nm0, nm1, e = in_pcoa3.shape
    nq0 = b0.shape[1]
    nq1p = b1tp.shape[0]
    grid = (e // epb,)
    out = pl.pallas_call(
        functools.partial(_qp_w_kernel, nm0, nq0, nq1, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq1p, nm1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm0, nm1, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq0, nq1, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq0, nq1, e), in_pcoa3.dtype),
        scratch_shapes=[pltpu.VMEM((nm0, nq1p, epb), in_pcoa3.dtype)],
        interpret=interpret,
        **_parallel_params(interpret),
    )(b1tp, b0, in_pcoa3)
    return out


def _qp_w_flat_kernel(nm0, nm1, nq0, nq1, precision, b1t_ref, b0_ref,
                      in_ref, out_ref, w_ref):
    odt = out_ref.dtype
    # stage 1 off unaligned flat slices; the w scratch stays tile-aligned
    for p in range(nm0):
        w_ref[p] = _dot(b1t_ref[:], in_ref[nm1 * p:nm1 * (p + 1)],
                        precision).astype(w_ref.dtype)
    # stage 2 in vregs; each output plane stored once at its flat offset
    for i in range(nq0):
        acc = w_ref[0] * b0_ref[0, i]
        for p in range(1, nm0):
            acc += w_ref[p] * b0_ref[p, i]
        out_ref[nq1 * i:nq1 * (i + 1)] = acc[:nq1].astype(odt)


def qp_w_flat(in_coa, b0, b1tp, *, nm1, nq1, epb, interpret=False,
              precision=HIGHEST):
    """qp_w over FLAT HBM blocks: the low-plane-occupancy dispatch.

    Per-plane DMA of (nm1, epb)/(nq1, epb) tiles moves padded 8-sublane
    tiles, so effective HBM bandwidth scales with last-tile occupancy —
    measured 62-88% across the odd orders for a pure stream with no
    contraction at all (exp_nq14c.py, artifacts/wall/nq14c.log).  This
    variant streams the SAME bytes as flat (nmTot, epb)/(nqTot, epb)
    blocks (96/98% occupancy at nq=14) and moves the plane slicing
    in-kernel, where Mosaic's unaligned-sublane copies are nearly free:
    measured nq=14 72.99 GDOF/s vs 65.79 for the plane form (95.5% of
    the aligned-stream mix ceiling), while the tax-free nq=16 control
    ties (74.60 vs 74.62) — exp_nq14d.py, artifacts/wall/nq14d.log.
    Dispatched for the qp_w regime when min plane occupancy < 0.9 (f32).
    Reference analog: the all-shared QP quad kernel,
    benchmark04/benchmark04.cc:206-300."""
    b0 = b0.astype(common.acc_dtype(in_coa.dtype))  # SMEM is 32-bit
    nm_tot, e = in_coa.shape
    nm0 = nm_tot // nm1
    nq0 = b0.shape[1]
    nq1p = b1tp.shape[0]
    nq_tot = nq0 * nq1
    grid = (e // epb,)
    return pl.pallas_call(
        functools.partial(_qp_w_flat_kernel, nm0, nm1, nq0, nq1, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq1p, nm1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm_tot, epb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq_tot, epb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_tot, e), in_coa.dtype),
        scratch_shapes=[pltpu.VMEM((nm0, nq1p, epb), in_coa.dtype)],
        interpret=interpret,
        **_parallel_params(interpret),
    )(b1tp, b0, in_coa)


def plane_occupancy(rows: int) -> float:
    """Last-tile sublane occupancy of an r-row f32 plane: the measured
    per-plane DMA efficiency factor (artifacts/wall/nq14c.log)."""
    return rows / ((rows + 7) // 8 * 8)


def _stage1_kernel(nm0, precision, b1t_ref, in_ref, w_ref):
    # contract the q modes per p mode: w[p] = B1T @ in[p]
    for p in range(nm0):
        w_ref[p] = _dot(b1t_ref[:], in_ref[p], precision).astype(w_ref.dtype)


def _stage2_kernel(nm0, nq0, b0_ref, w_ref, out_ref):
    # contract p on the VPU: out[i] = sum_p w[p] * B0[p, i]
    for i in range(nq0):
        acc = w_ref[0] * b0_ref[0, i]
        for p in range(1, nm0):
            acc += w_ref[p] * b0_ref[p, i]
        out_ref[i] = acc.astype(out_ref.dtype)


def qp_global(in_pcoa3, b0, b1t, *, epb, interpret=False, precision=HIGHEST):
    """Same stage split as two pallas_calls with the stage-1 workspace
    round-tripping via HBM (the global-workspace QP analog,
    benchmark04/benchmark04.cc:149-204)."""
    b0 = b0.astype(common.acc_dtype(in_pcoa3.dtype))  # SMEM is 32-bit
    nm0, nm1, e = in_pcoa3.shape
    nq0 = b0.shape[1]
    nq1 = b1t.shape[0]
    grid = (e // epb,)
    w = pl.pallas_call(
        functools.partial(_stage1_kernel, nm0, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq1, nm1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nm0, nm1, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nm0, nq1, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nm0, nq1, e), in_pcoa3.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(b1t, in_pcoa3)
    out = pl.pallas_call(
        functools.partial(_stage2_kernel, nm0, nq0),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm0, nq1, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq0, nq1, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq0, nq1, e), in_pcoa3.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(b0, w)
    return out


# ---- element-major layout: (E, nmTot) -> (E, nqTot) ---------------------


def _mxu_grouped_kernel(ngrp, g, nq1, nq0, nm0p, precision, s1_ref, s2_ref,
                        in_ref, out_ref, w_ref):
    # stage 1: one block-diagonal GEMM per p-mode group — g directions'
    # q-contractions fused into a single (g*nq1, g*nm1) MXU operator
    for gi in range(ngrp):
        wg = _dot(s1_ref[:], in_ref[gi], precision)       # (g*nq1, epb)
        for k in range(g):
            w_ref[:, gi * g + k, :] = (
                wg[k * nq1:(k + 1) * nq1].astype(w_ref.dtype))
    # stage 2: g output j-planes per GEMM — the (j, p) workspace slab is
    # contiguous in VMEM, so the (p, q) -> (q, p) relayout costs strided
    # VMEM writes in stage 1 and nothing here
    for h in range(nq1 // g):
        slab = w_ref[h * g:(h + 1) * g].reshape(g * nm0p, w_ref.shape[-1])
        og = _dot(s2_ref[:], slab, precision)             # (g*nq0, epb)
        for k in range(g):
            out_ref[h * g + k] = (
                og[k * nq0:(k + 1) * nq0].astype(out_ref.dtype))


def qp_mxu_grouped(in_g3, s1g, s2g, *, nq0, nq1, g, epb, interpret=False,
                   precision=HIGHEST):
    """High-order fused sum-factorization as two G-grouped block-diagonal
    MXU GEMMs (the round-3 nq=32 wall breaker, docs/experiments/
    exp_nq32.py): naive per-p-mode stage dots are (nq, nm)-shaped — 6%
    MXU tile utilization at nq=32 — while grouping g modes per GEMM gives
    (g*nq, g*nm) operators at ~97% utilization.  Measured at nq=32,
    nelmt=262144 (v5e, HBM-honest chained): 55.6 GDOF/s HIGHEST vs 40.1
    for the v-first hybrid qp_shared and 41.7 for the best committed
    round-2 column; at DEFAULT precision it is bandwidth-bound at ~81 —
    98% of the measured copy-through rate for this exact traffic.

    in_g3 is the p-grouped coalesced layout (ngrp, g*nm1, E) with p
    zero-padded to nm0p = ngrp*g (ops.bwdtrans.stream_sources 'grouped');
    s1g = blockdiag(B1^T, g), s2g = blockdiag(B0^T padded, g).  Requires
    g | nq1.  Reference analog: the all-shared QP quad kernel,
    benchmark04/benchmark04.cc:206-300."""
    ngrp, gnm1, e = in_g3.shape
    nm0p = ngrp * g
    grid = (e // epb,)
    out = pl.pallas_call(
        functools.partial(_mxu_grouped_kernel, ngrp, g, nq1, nq0, nm0p,
                          precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec(s1g.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(s2g.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ngrp, gnm1, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq1, nq0, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq1, nq0, e), in_g3.dtype),
        scratch_shapes=[pltpu.VMEM((nq1, nm0p, epb), in_g3.dtype)],
        interpret=interpret,
        **_parallel_params(interpret),
    )(s1g, s2g, in_g3)
    return out


def _kron_em_kernel(precision, c_ref, in_ref, out_ref):
    out_ref[:] = _dot(in_ref[:], c_ref[:], precision).astype(out_ref.dtype)


def kron_elem_major(in_em2, c_em, *, epb, interpret=False, precision=HIGHEST):
    """out_em2 = in_em2 @ C_em with elements on the sublane axis — the
    uncoalesced-layout analog (lane dim wastes (128 - nmTot%128) slots)."""
    e, nm_tot = in_em2.shape
    nq_tot = c_em.shape[1]
    grid = (e // epb,)
    out = pl.pallas_call(
        functools.partial(_kron_em_kernel, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nm_tot, nq_tot), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((epb, nm_tot), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((epb, nq_tot), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, nq_tot), in_em2.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(c_em, in_em2)
    return out


def _stages_em_kernel(precision, s1_ref, s2_ref, in_ref, out_ref, w_ref):
    w_ref[:] = _dot(in_ref[:], s1_ref[:], precision).astype(w_ref.dtype)
    out_ref[:] = _dot(w_ref[:], s2_ref[:], precision).astype(out_ref.dtype)


def qp1d_shared(in_em2, s1_em, s2_em, *, epb, interpret=False,
                precision=HIGHEST):
    """Fused element-major two-stage contraction (dense kron-structured
    stage operators), workspace in VMEM — the QP-1D/shared analog
    (benchmark04/benchmark04.cc:353-426)."""
    e, nm_tot = in_em2.shape
    w_cols = s1_em.shape[1]
    nq_tot = s2_em.shape[1]
    grid = (e // epb,)
    out = pl.pallas_call(
        functools.partial(_stages_em_kernel, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nm_tot, w_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_cols, nq_tot), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((epb, nm_tot), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((epb, nq_tot), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, nq_tot), in_em2.dtype),
        scratch_shapes=[pltpu.VMEM((epb, w_cols), in_em2.dtype)],
        interpret=interpret,
        **_parallel_params(interpret),
    )(s1_em, s2_em, in_em2)
    return out


def _stage_em_kernel(precision, s_ref, in_ref, out_ref):
    out_ref[:] = _dot(in_ref[:], s_ref[:], precision).astype(out_ref.dtype)


def _one_stage_em(x, s, *, epb, interpret, precision):
    e, k = x.shape
    n = s.shape[1]
    out = pl.pallas_call(
        functools.partial(_stage_em_kernel, precision),
        grid=(e // epb,),
        in_specs=[
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((epb, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((epb, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, n), x.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(s, x)
    return out


def qp1d_global(in_em2, s1_em, s2_em, *, epb, interpret=False,
                precision=HIGHEST):
    """Element-major two-stage contraction as two pallas_calls with the
    workspace in HBM (QP-1D/global analog, benchmark04.cc:302-351)."""
    w = _one_stage_em(in_em2, s1_em, epb=epb, interpret=interpret,
                      precision=precision)
    return _one_stage_em(w, s2_em, epb=epb, interpret=interpret,
                         precision=precision)
