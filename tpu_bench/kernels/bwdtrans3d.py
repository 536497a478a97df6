"""Pallas 3D BwdTrans kernels — benchmark05's hand-written tier.

Reference: six CUDA hex kernels with three contraction stages and two
inter-stage workspaces (benchmark05/benchmark05.cc:15-617).  TPU-native
design (same taxonomy as bwdtrans2d, one extra stage):

The fused QP kernel factors the contraction asymmetrically across the two
compute units: the nm0 leading modes are combined on the VPU with scalar
basis weights (a tiny nrq-row intermediate per output plane), and the
(r, q) mode pair is contracted jointly against kron(B2^T, B1^T) — one
well-shaped MXU dot (nq2*nq1 x nm2*nm1 operator, K = nm2*nm1 deep, element
block on the lanes) per output plane, written exactly once.  Versus a
literal 3-stage sum-factorization (dozens of K=nm-sized MXU issues per
block) this trades a small FLOP increase for nq0 well-shaped MXU issues
per block with every intermediate in registers.  Measured on v5e at
nq=8^3: 66 GDOF/s vs 38 for the per-(r,q)-dot formulation — ~80% of the
819 GB/s HBM roofline for the 343-in/512-out f32 element stream.

Input layout for the QP kernels is p-major "coalesced": (nm0, nm2*nm1, E)
with the element index on the 128-lane minor axis; output is i-major
(nq0, nq2*nq1, E), so each stage-2 accumulation step touches one leading-
axis plane (the cheapest VMEM addressing pattern).
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.kernels import common
from tpu_bench.kernels.bwdtrans2d import (_dot, _parallel_params,
                                          kron_blocked, kron_coalesced,
                                          kron_elem_major, _one_stage_em,
                                          plane_occupancy)

HIGHEST = jax.lax.Precision.HIGHEST


def flat_qp_gate(nrq: int, nkj: int, itemsize: int) -> bool:
    """Dispatch gate for qp_shared3d_flat: flat blocks whenever either the
    input (nrq = nm2*nm1 rows) or output (nkj = nq2*nq1 rows) plane pays a
    measurable sublane-padding tax.  Measured f32 (artifacts/wall/
    flat3d.log, same-session epb sweeps): flat wins at every swept order —
    nq=6^3 48.2->52.8 (min occ 0.781), nq=8^3 63.6->66.4 (0.875), nq=10^3
    67.0->71.2 (0.920) — so the gate admits every occupancy below the
    0.95 tile-aligned band within the measured plane-height band
    25 <= nrq <= 81 (nq=6^3..10^3).  Outside the band the incumbent plane
    form keeps the dispatch: the 1..9-row planes of nq=2^3/4^3 leave the
    in-kernel unaligned-slice cost unamortized, and orders above nq=10^3
    are unmeasured (ADVICE r4: no silent extrapolation).  bf16 (16-row
    sublane tiles) is MEASURED to prefer the plane form at both swept
    orders — nq=8^3 126.5 vs 124.2, nq=10^3 133.7 vs 109.3 GDOF/s
    (artifacts/wall/flat3dbf16.log): the bf16-native MXU pass leaves the
    kernel compute-side enough that the flat form's in-kernel unaligned
    slices cost more than the plane-DMA tax they dodge — so itemsize == 4
    stays the dtype gate, now on data."""
    return (itemsize == 4 and 25 <= nrq <= 81
            and min(plane_occupancy(nrq), plane_occupancy(nkj)) < 0.95)


# ---- coalesced layout: (nm0, nm2*nm1, E) -> (nq0, nq2*nq1, E) -----------


def _qp_fused_kernel3d(nm0, nq0, precision, c12t_ref, b0_ref, in_ref,
                       out_ref):
    # "v-first" stage order: for each output plane i, combine the p modes
    # of the INPUT on the VPU (nrq-row intermediate, lives in vregs), then
    # one MXU pair-contraction per plane, written exactly once —
    #     out[i] = C12T @ (sum_p B0[p, i] * in[p])
    # vs accumulating planes (read-modify-write of the nqTot-sized output
    # block per p) this halves on-chip traffic: measured 66 vs 58 GDOF/s
    # at nq=8^3 on v5e.
    #
    # v accumulates in acc_dtype (f32): a no-op for the f32 tier, and the
    # measured unit-wall fix for bf16 — the bf16-native combine runs the
    # VPU at ~95% of its FMA peak while the MXU idles (97.2 GDOF/s at
    # nq=10^3), whereas converting each plane on read and accumulating in
    # f32 vregs runs 134.8 at 29x lower rel-err (artifacts/wall/
    # bf16nq10.log; round4.md §8).  v narrows back to the input dtype
    # before the dot so the MXU pass stays native (bf16 in, f32 acc).
    idt = in_ref.dtype
    adt = common.acc_dtype(idt)
    for i in range(nq0):
        v = in_ref[0].astype(adt) * b0_ref[0, i].astype(adt)
        for p in range(1, nm0):
            v += in_ref[p].astype(adt) * b0_ref[p, i].astype(adt)
        out_ref[i] = _dot(c12t_ref[:], v.astype(idt),
                          precision).astype(out_ref.dtype)


def qp_shared3d(in_pcoa3, b0, c12t, *, epb, interpret=False,
                precision=HIGHEST):
    """Fused 3-stage contraction with on-chip workspaces (the __shared__ QP
    hex analog, benchmark05/benchmark05.cc:291-429): VPU combination of the
    p modes per output plane, one MXU pair-contraction per plane."""
    b0 = b0.astype(common.acc_dtype(in_pcoa3.dtype))  # SMEM is 32-bit
    nm0, nrq, e = in_pcoa3.shape       # nrq = nm2*nm1
    nq0 = b0.shape[1]
    nkj = c12t.shape[0]                # nq2*nq1
    grid = (e // epb,)
    out = pl.pallas_call(
        functools.partial(_qp_fused_kernel3d, nm0, nq0, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nkj, nrq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm0, nrq, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq0, nkj, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq0, nkj, e), in_pcoa3.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(c12t, b0, in_pcoa3)
    return out


def _qp_fused_flat_kernel3d(nm0, nrq, nq0, nkj, precision, c12t_ref, b0_ref,
                            in_ref, out_ref):
    # same v-first math as _qp_fused_kernel3d, off unaligned flat slices
    idt = in_ref.dtype
    adt = common.acc_dtype(idt)
    for i in range(nq0):
        v = in_ref[0:nrq].astype(adt) * b0_ref[0, i].astype(adt)
        for p in range(1, nm0):
            v += (in_ref[nrq * p:nrq * (p + 1)].astype(adt)
                  * b0_ref[p, i].astype(adt))
        out_ref[nkj * i:nkj * (i + 1)] = _dot(
            c12t_ref[:], v.astype(idt), precision).astype(out_ref.dtype)


def qp_shared3d_flat(in_pflat, b0, c12t, *, nrq, epb, interpret=False,
                     precision=HIGHEST):
    """qp_shared3d over FLAT HBM blocks — the 3D analog of the 2D
    qp_w_flat dispatch (kernels/bwdtrans2d.py): per-plane DMA of
    (nrq, epb)/(nkj, epb) tiles moves padded 8-sublane tiles, so the 3D
    QP kernels pay the measured plane-occupancy tax on every order whose
    nm2*nm1 / nq2*nq1 plane rows are not multiples of 8 — at nq=8^3 the
    input planes are 49 rows (87.5% of the 56-row padded tile), at
    nq=10^3 81 rows (92.0%).  This variant streams the SAME bytes as flat
    (nm0*nrq, epb) -> (nq0*nkj, epb) blocks (99.7/100% occupancy at
    nq=8^3) and slices the p planes in-kernel, where Mosaic's
    unaligned-sublane copies are nearly free (exp_nq14d.py measured the
    2D trade at <1% on the tax-free control order).

    in_pflat is the p-major coalesced stream flattened 2D:
    pcoa3.reshape(nm0*nrq, E), row index p*nrq + r — the same HBM bytes
    as the pcoa3 layout, so builders share it.  Output is the i-major
    flat (nq0*nkj, E); norms are layout-invariant.  Reference analog:
    the all-shared QP hex kernel, benchmark05/benchmark05.cc:291-429."""
    b0 = b0.astype(common.acc_dtype(in_pflat.dtype))  # SMEM is 32-bit
    nm_tot, e = in_pflat.shape
    nm0 = nm_tot // nrq
    nq0 = b0.shape[1]
    nkj = c12t.shape[0]
    nq_tot = nq0 * nkj
    grid = (e // epb,)
    return pl.pallas_call(
        functools.partial(_qp_fused_flat_kernel3d, nm0, nrq, nq0, nkj,
                          precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nkj, nrq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm_tot, epb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq_tot, epb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_tot, e), in_pflat.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(c12t, b0, in_pflat)


def _stage1_kernel3d(nm0, precision, c12t_ref, in_ref, w_ref):
    # contract the (r, q) pair per p mode: w[p] = C12T @ in[p]
    for p in range(nm0):
        w_ref[p] = _dot(c12t_ref[:], in_ref[p],
                        precision).astype(w_ref.dtype)


def _stage2_kernel3d(nm0, nq0, b0_ref, w_ref, out_ref):
    # contract p on the VPU: out[i] = sum_p w[p] * B0[p, i]
    for i in range(nq0):
        acc = w_ref[0] * b0_ref[0, i]
        for p in range(1, nm0):
            acc += w_ref[p] * b0_ref[p, i]
        out_ref[i] = acc.astype(out_ref.dtype)


def qp_global3d(in_pcoa3, b0, c12t, *, epb, interpret=False,
                precision=HIGHEST):
    """Same stage split as two pallas_calls with the pair-contraction
    workspace round-tripping through HBM (the global-workspace QP hex
    analog, benchmark05/benchmark05.cc:203-289)."""
    b0 = b0.astype(common.acc_dtype(in_pcoa3.dtype))  # SMEM is 32-bit
    nm0, nrq, e = in_pcoa3.shape
    nq0 = b0.shape[1]
    nkj = c12t.shape[0]
    grid = (e // epb,)
    w = pl.pallas_call(
        functools.partial(_stage1_kernel3d, nm0, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nkj, nrq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nm0, nrq, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nm0, nkj, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nm0, nkj, e), in_pcoa3.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(c12t, in_pcoa3)
    out = pl.pallas_call(
        functools.partial(_stage2_kernel3d, nm0, nq0),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm0, nkj, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq0, nkj, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq0, nkj, e), in_pcoa3.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(b0, w)
    return out


# ---- element-major layout: (E, nmTot3) -> (E, nqTot3) -------------------


def _stages3_em_kernel(precision, s1_ref, s2_ref, s3_ref, in_ref, out_ref,
                       w1_ref, w2_ref):
    w1_ref[:] = _dot(in_ref[:], s1_ref[:], precision).astype(w1_ref.dtype)
    w2_ref[:] = _dot(w1_ref[:], s2_ref[:], precision).astype(w2_ref.dtype)
    out_ref[:] = _dot(w2_ref[:], s3_ref[:], precision).astype(out_ref.dtype)


def qp1d_shared3d(in_em2, s1_em, s2_em, s3_em, *, epb, interpret=False,
                  precision=HIGHEST):
    """Fused element-major 3-stage dense contraction, workspaces in VMEM
    (QP-1D/shared hex analog, benchmark05/benchmark05.cc:510-617)."""
    e, nm_tot = in_em2.shape
    w1c = s1_em.shape[1]
    w2c = s2_em.shape[1]
    nq_tot = s3_em.shape[1]
    grid = (e // epb,)
    out = pl.pallas_call(
        functools.partial(_stages3_em_kernel, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nm_tot, w1c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w1c, w2c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w2c, nq_tot), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((epb, nm_tot), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((epb, nq_tot), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, nq_tot), in_em2.dtype),
        scratch_shapes=[
            pltpu.VMEM((epb, w1c), in_em2.dtype),
            pltpu.VMEM((epb, w2c), in_em2.dtype),
        ],
        interpret=interpret,
        **_parallel_params(interpret),
    )(s1_em, s2_em, s3_em, in_em2)
    return out


def qp1d_global3d(in_em2, s1_em, s2_em, s3_em, *, epb, interpret=False,
                  precision=HIGHEST):
    """Element-major 3-stage contraction as three pallas_calls with HBM
    workspaces (QP-1D hex analog, benchmark05/benchmark05.cc:431-508)."""
    w1 = _one_stage_em(in_em2, s1_em, epb=epb, interpret=interpret,
                       precision=precision)
    w2 = _one_stage_em(w1, s2_em, epb=epb, interpret=interpret,
                       precision=precision)
    return _one_stage_em(w2, s3_em, epb=epb, interpret=interpret,
                         precision=precision)
