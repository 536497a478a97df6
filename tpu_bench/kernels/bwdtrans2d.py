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

HIGHEST = jax.lax.Precision.HIGHEST


def _dot(a, b, precision):
    return jnp.dot(a, b, preferred_element_type=a.dtype, precision=precision)


# ---- coalesced layout: (nm1, nm0, E) -> (nq1, nq0, E) -------------------


def _kron_coa_kernel(precision, c_ref, in_ref, out_ref):
    # single dense operator GEMM: out[(j,i), e] = C_coa[(j,i),(q,p)] in[(q,p), e]
    out_ref[:] = _dot(c_ref[:], in_ref[:], precision)


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
    )(c_coa, in_coa)
    return out


def _stage1_kernel(nm1, precision, b0t_ref, in_ref, out_ref):
    # in: (nm1, nm0, EB); out: (nm1, nq0, EB): per-q MXU dot over modes p
    for q in range(nm1):
        out_ref[q] = _dot(b0t_ref[:], in_ref[q], precision)


def _stage2_kernel(nq0, precision, b1t_ref, w_ref, out_ref):
    # w: (nm1, nq0, EB); out: (nq1, nq0, EB): per-i MXU dot over modes q
    for i in range(nq0):
        out_ref[:, i, :] = _dot(b1t_ref[:], w_ref[:, i, :], precision)


def qp_global(in_coa3, b0t, b1t, *, epb, interpret=False, precision=HIGHEST):
    """Two pallas_calls with the stage workspace round-tripping via HBM
    (the global-workspace QP analog, benchmark04/benchmark04.cc:149-204)."""
    nm1, nm0, e = in_coa3.shape
    nq0 = b0t.shape[0]
    nq1 = b1t.shape[0]
    grid = (e // epb,)
    w = pl.pallas_call(
        functools.partial(_stage1_kernel, nm1, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq0, nm0), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nm1, nm0, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nm1, nq0, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nm1, nq0, e), in_coa3.dtype),
        interpret=interpret,
    )(b0t, in_coa3)
    out = pl.pallas_call(
        functools.partial(_stage2_kernel, nq0, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq1, nm1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nm1, nq0, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq1, nq0, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq1, nq0, e), in_coa3.dtype),
        interpret=interpret,
    )(b1t, w)
    return out


def _qp_shared_kernel(nm1, nq0, precision, b0t_ref, b1t_ref, in_ref, out_ref,
                      w_ref):
    for q in range(nm1):
        w_ref[q] = _dot(b0t_ref[:], in_ref[q], precision)
    for i in range(nq0):
        out_ref[:, i, :] = _dot(b1t_ref[:], w_ref[:, i, :], precision)


def qp_shared(in_coa3, b0t, b1t, *, epb, interpret=False, precision=HIGHEST):
    """Single fused kernel, stage workspace in VMEM scratch (the
    __shared__-workspace QP analog, benchmark04/benchmark04.cc:206-300).
    Traffic-minimal: reads nmTot and writes nqTot values per element."""
    nm1, nm0, e = in_coa3.shape
    nq0 = b0t.shape[0]
    nq1 = b1t.shape[0]
    grid = (e // epb,)
    out = pl.pallas_call(
        functools.partial(_qp_shared_kernel, nm1, nq0, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq0, nm0), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq1, nm1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nm1, nm0, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq1, nq0, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq1, nq0, e), in_coa3.dtype),
        scratch_shapes=[pltpu.VMEM((nm1, nq0, epb), in_coa3.dtype)],
        interpret=interpret,
    )(b0t, b1t, in_coa3)
    return out


# ---- element-major layout: (E, nmTot) -> (E, nqTot) ---------------------


def _kron_em_kernel(precision, c_ref, in_ref, out_ref):
    out_ref[:] = _dot(in_ref[:], c_ref[:], precision)


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
    )(c_em, in_em2)
    return out


def _stages_em_kernel(precision, s1_ref, s2_ref, in_ref, out_ref, w_ref):
    w_ref[:] = _dot(in_ref[:], s1_ref[:], precision)
    out_ref[:] = _dot(w_ref[:], s2_ref[:], precision)


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
    )(s1_em, s2_em, in_em2)
    return out


def _stage_em_kernel(precision, s_ref, in_ref, out_ref):
    out_ref[:] = _dot(in_ref[:], s_ref[:], precision)


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
