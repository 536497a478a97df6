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
  * matvec_mxu:  1D grid over row blocks with the whole x resident in VMEM;
                 each program issues one (BM, N) x (N, 1) MXU contraction —
                 the "vector loads + fused dot" analog.
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


def _mxu_kernel(precision, a_ref, x_ref, out_ref):
    out_ref[:] = jnp.dot(
        a_ref[:], x_ref[:],
        preferred_element_type=out_ref.dtype,
        precision=precision,
    )


def matvec_mxu(a, x, *, bm=64, interpret=False,
               precision=jax.lax.Precision.HIGHEST):
    """y = A.x with full rows per program and an MXU contraction."""
    m, n = a.shape
    bm = common.pow2_rows(m, bm)
    grid = (m // bm,)
    xc = x.reshape(n, 1)
    out = pl.pallas_call(
        functools.partial(_mxu_kernel, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1), a.dtype),
        interpret=interpret,
        **common.grid_semantics("parallel", interpret=interpret),
    )(a, xc)
    return out.reshape(m)
