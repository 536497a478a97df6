"""Pallas reduction kernels — benchmark01's hand-written tier.

The reference's hand-CUDA reduction is a grid-stride sum-of-squares with a
warp shuffle tree and atomicAdd into per-block partials, followed by a second
kernel over the partials (benchmark01/benchmark01.cc:15-181).  The TPU-native
equivalents:

  * two-pass:   grid of programs each reducing one (rows, 128) tile of x to a
                per-program partial, then a second tiny kernel summing the
                partials — the l2norm_vl + reduce_vl two-launch structure.
  * one-pass:   sequential TPU grid accumulating into a single (1,1) output
                revisited by every program — the atomicAdd-accumulator analog
                (TPU grids execute sequentially per core, so the accumulation
                needs no atomics).
  * functor:    a generic transform-reduce engine taking an elementwise
                functor, mirroring reduceSumKernel's functor template
                (benchmark01/benchmark01.cc:84-141).

The wide variant reshapes x to 1024 lanes per row — the lane-aligned analog
of the reference's float4/double2 128-bit vector loads (utils/cuda_vectors.h).

Every kernel takes an `eps` scalar (SMEM) folded into the functor at zero
memory cost; the chained timing protocol threads a data dependence through
it (eps = 0.0 * previous_result) so XLA cannot hoist repeated applications
out of the timing loop (see core/timing.py).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.kernels import common


def square_eps(v, e):
    """(v + e)^2 — the b01 functor; e is 0.0 in un-chained use."""
    w = v + e
    return w * w


def _eps2d(eps, dtype):
    return jnp.asarray(eps, dtype=dtype).reshape(1, 1)


def _partials_kernel(f, eps_ref, x_ref, out_ref):
    # Each program owns one (1, 8, 128) tile of the partials array (TPU
    # block shapes must tile to (8, 128) in the last two dims); the partial
    # sum goes in position [0, 0, 0] and the zero entries are inert in the
    # second pass.
    s = jnp.sum(f(x_ref[:], eps_ref[0, 0]), dtype=out_ref.dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    out_ref[:] = jnp.where((row == 0) & (lane == 0), s,
                           jnp.zeros((), out_ref.dtype))


def _sum_kernel(in_ref, out_ref):
    out_ref[:] = jnp.sum(in_ref[:], dtype=out_ref.dtype).reshape(1, 1)


def transform_reduce_two_pass(x, eps, f: Callable, *, lanes=128,
                              target_rows=2048, interpret=False):
    """sum(f(x, eps)) via per-program partials + a second reduce kernel."""
    x2 = common.as_2d(x, lanes)
    rows = x2.shape[0]
    br = common.pow2_rows(rows, target_rows)
    grid = rows // br
    acc = common.acc_dtype(x.dtype)
    partials = pl.pallas_call(
        functools.partial(_partials_kernel, f),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((br, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 8, 128), acc),
        interpret=interpret,
        **common.grid_semantics("parallel", interpret=interpret),
    )(_eps2d(eps, x.dtype), x2)
    total = pl.pallas_call(
        _sum_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), acc),
        interpret=interpret,
    )(partials)
    return total[0, 0]


def _accum_kernel(f, eps_ref, x_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.sum(f(x_ref[:], eps_ref[0, 0]),
                          dtype=out_ref.dtype).reshape(1, 1)


def transform_reduce_one_pass(x, eps, f: Callable, *, lanes=128,
                              target_rows=2048, interpret=False):
    """sum(f(x, eps)) accumulated into one block across the sequential grid."""
    x2 = common.as_2d(x, lanes)
    rows = x2.shape[0]
    br = common.pow2_rows(rows, target_rows)
    grid = rows // br
    acc = common.acc_dtype(x.dtype)
    total = pl.pallas_call(
        functools.partial(_accum_kernel, f),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((br, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), acc),
        interpret=interpret,
        # the single output block is revisited by every grid step: ordered
        **common.grid_semantics("arbitrary", interpret=interpret),
    )(_eps2d(eps, x.dtype), x2)
    return total[0, 0]


def sumsq_two_pass(x, eps=0.0, *, interpret=False):
    """Sum of squares, narrow (128-lane) tiles — the scalar-load analog."""
    return transform_reduce_two_pass(x, eps, square_eps, lanes=128,
                                     interpret=interpret)


def sumsq_wide(x, eps=0.0, *, interpret=False):
    """Sum of squares, 1024-lane rows — the float4 vector-load analog."""
    return transform_reduce_one_pass(x, eps, square_eps, lanes=1024,
                                     target_rows=512, interpret=interpret)


def sumsq_functor(x, eps=0.0, f=square_eps, *, interpret=False):
    """Generic functor-driven reduction (reduceSumKernel analog)."""
    return transform_reduce_one_pass(x, eps, f, lanes=128,
                                     interpret=interpret)
