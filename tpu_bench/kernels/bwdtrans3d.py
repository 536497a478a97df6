"""Pallas 3D BwdTrans kernels — benchmark05's hand-written tier.

Reference: six CUDA hex kernels with three contraction stages and two
inter-stage workspaces (benchmark05/benchmark05.cc:15-617).  TPU-native
design (same taxonomy as bwdtrans2d, one extra stage):

The fused coalesced kernel factors the contraction asymmetrically for the
MXU: stage 1 contracts the p modes with a dot per (r, q) pair (the
sum-factorized minimum-FLOP path), then stages 2+3 contract (q, r) jointly
against the pair operator kron(B2^T, B1^T) with one dot per i — trading a
modest FLOP increase for far fewer (and larger) MXU issues than the naive
three-stage loop nest, while the workspace never leaves VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.kernels.bwdtrans2d import (_dot, kron_coalesced,
                                          kron_elem_major, _one_stage_em)

HIGHEST = jax.lax.Precision.HIGHEST


# ---- coalesced layout: (nm2*nm1, nm0, E) -> (nq2*nq1, nq0, E) -----------


def _stage1_kernel3d(nrq, precision, b0t_ref, in_ref, w_ref):
    # contract p for every (r, q) pair: w[(r,q)] = B0^T @ in[(r,q)]
    for rq in range(nrq):
        w_ref[rq] = _dot(b0t_ref[:], in_ref[rq], precision)


def _stage23_kernel3d(nq0, precision, c12t_ref, w_ref, out_ref):
    # contract (q, r) jointly per i: out[(k,j), i, :] = C12T @ w[(r,q), i, :]
    for i in range(nq0):
        out_ref[:, i, :] = _dot(c12t_ref[:], w_ref[:, i, :], precision)


def _qp_shared_kernel3d(nrq, nq0, precision, b0t_ref, c12t_ref, in_ref,
                        out_ref, w_ref):
    for rq in range(nrq):
        w_ref[rq] = _dot(b0t_ref[:], in_ref[rq], precision)
    for i in range(nq0):
        out_ref[:, i, :] = _dot(c12t_ref[:], w_ref[:, i, :], precision)


def qp_shared3d(in_coa3, b0t, c12t, *, epb, interpret=False,
                precision=HIGHEST):
    """Fused 3-stage contraction, workspace in VMEM scratch (the
    __shared__ QP hex analog, benchmark05/benchmark05.cc:291-429)."""
    nrq, nm0, e = in_coa3.shape        # nrq = nm2*nm1
    nq0 = b0t.shape[0]
    nkj = c12t.shape[0]                # nq2*nq1
    grid = (e // epb,)
    out = pl.pallas_call(
        functools.partial(_qp_shared_kernel3d, nrq, nq0, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq0, nm0), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nkj, nrq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrq, nm0, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nkj, nq0, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nkj, nq0, e), in_coa3.dtype),
        scratch_shapes=[pltpu.VMEM((nrq, nq0, epb), in_coa3.dtype)],
        interpret=interpret,
    )(b0t, c12t, in_coa3)
    return out


def qp_global3d(in_coa3, b0t, c12t, *, epb, interpret=False,
                precision=HIGHEST):
    """Same stages as two pallas_calls with the workspace in HBM (the
    global-workspace QP hex analog, benchmark05/benchmark05.cc:203-289)."""
    nrq, nm0, e = in_coa3.shape
    nq0 = b0t.shape[0]
    nkj = c12t.shape[0]
    grid = (e // epb,)
    w = pl.pallas_call(
        functools.partial(_stage1_kernel3d, nrq, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq0, nm0), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrq, nm0, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nrq, nq0, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrq, nq0, e), in_coa3.dtype),
        interpret=interpret,
    )(b0t, in_coa3)
    out = pl.pallas_call(
        functools.partial(_stage23_kernel3d, nq0, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nkj, nrq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrq, nq0, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nkj, nq0, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nkj, nq0, e), in_coa3.dtype),
        interpret=interpret,
    )(c12t, w)
    return out


# ---- element-major layout: (E, nmTot3) -> (E, nqTot3) -------------------


def _stages3_em_kernel(precision, s1_ref, s2_ref, s3_ref, in_ref, out_ref,
                       w1_ref, w2_ref):
    w1_ref[:] = _dot(in_ref[:], s1_ref[:], precision)
    w2_ref[:] = _dot(w1_ref[:], s2_ref[:], precision)
    out_ref[:] = _dot(w2_ref[:], s3_ref[:], precision)


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
