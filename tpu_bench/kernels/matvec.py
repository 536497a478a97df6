"""Pallas matrix-vector kernels — benchmark03's hand-written tier.

Reference: one thread-block per matrix row running a cooperative vectorized
dot product (dot_vl + compute_matvec, benchmark03/benchmark03.cc:15-104).
TPU-native equivalents — matvec is pure HBM streaming of A, so the natural
mapping is row-block tiles of A with the vector broadcast across lanes:

  * matvec_vpu:  2D grid over (row blocks, column blocks); each program
                 multiplies an (BM, BN) tile of A by the matching (1, BN)
                 slice of x and accumulates row sums into the (BM, 1) output
                 block (revisited across the column steps) — the
                 broadcast-multiply-reduce VPU path.
  * matvec_mxu:  left-vector MXU contraction on the column-major layout:
                 y^T = x^T . A_cm accumulated over K blocks — (1, BK) x
                 (BK, BN) MXU issues whose output tile is BN wide on the
                 lane axis (the "vector loads + fused dot" analog).  The
                 row-major formulation (BM, N) x (N, 1) starves the MXU —
                 its output tile occupies one of 128 lanes (measured
                 492 GB/s vs 739-763 for peers at size 16384 on v5e);
                 putting the output on lanes instead wastes only the
                 sublane axis (1 of 8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.kernels import common


def _vpu_kernel(a_ref, x_ref, out_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.sum(a_ref[:] * x_ref[:], axis=1, keepdims=True).astype(
        out_ref.dtype
    )


def matvec_vpu(a, x, *, bm=256, bn=2048, interpret=False):
    """y = A.x via broadcast-multiply + row-sum tiles (VPU path)."""
    m, n = a.shape
    bm = common.pow2_rows(m, bm)
    bn = common.pow2_rows(n, bn)
    grid = (m // bm, n // bn)
    x2 = x.reshape(1, n)
    out = pl.pallas_call(
        _vpu_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1), a.dtype),
        interpret=interpret,
        **common.grid_semantics("parallel", "arbitrary",
                                interpret=interpret),
    )(a, x2)
    return out.reshape(m)


def _mxu_kernel(precision, x_ref, a_ref, out_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jax.lax.dot_general(
        x_ref[:], a_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=out_ref.dtype,
        precision=precision,
    )


def matvec_mxu(a_cm, x, *, bn=512, bk=2048, interpret=False,
               precision=jax.lax.Precision.HIGHEST):
    """y = A.x as y^T = x^T . A_cm on the column-major (transposed) layout.

    2D grid over (output-column blocks, contraction blocks); each program
    issues one (1, BK) x (BK, BN) MXU contraction and accumulates into the
    (1, BN) output block, which is revisited across the K steps (the K grid
    dim is "arbitrary"; the column dim is "parallel")."""
    n, m = a_cm.shape  # a_cm[j, i] = A[i, j]
    bn = common.pow2_rows(m, bn)
    bk = common.pow2_rows(n, bk)
    grid = (m // bn, n // bk)
    xr = x.reshape(1, n)
    out = pl.pallas_call(
        functools.partial(_mxu_kernel, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bk), lambda j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m), a_cm.dtype),
        interpret=interpret,
        **common.grid_semantics("parallel", "arbitrary",
                                interpret=interpret),
    )(xr, a_cm)
    return out.reshape(m)
