"""Pallas streaming-add kernels — benchmark02's hand-written tier.

Reference: grid-stride x[i] += y[i] in scalar and float4/double2 vector-load
flavors plus a generic functor kernel (benchmark02/benchmark02.cc:16-71).
TPU-native mapping: (rows, 128)-tiled in-place add with the input aliased
to the output (true x += y, 2 reads + 1 write like the CUDA kernel).

The "vector load" axis on TPU is DMA granularity, not lane width: the VREG
is fixed at (8, 128), and viewing the stream as rows wider than 128 lanes
forces a real relayout copy on every (rows, lanes) reshape of a mutating
operand (measured 286 vs 718 GB/s at 64 Mi elements on v5e).  So the
scalar-load analog uses small (512, 128) blocks (many grid steps, DMA
issue overhead exposed) and the float4/double2 analog uses large
(4096, 128) blocks — 2 MB per buffer, the most the triple-buffered
in/in/out pipeline fits in the 16 MB scoped-VMEM window.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.kernels import common


def _add_kernel(x_ref, y_ref, out_ref):
    out_ref[:] = x_ref[:] + y_ref[:]


def _map2_kernel(f, x_ref, y_ref, out_ref):
    out_ref[:] = f(x_ref[:], y_ref[:])


def _tiled_map2(x, y, kernel, *, lanes, target_rows, interpret):
    x2 = common.as_2d(x, lanes)
    y2 = common.as_2d(y, lanes)
    rows = x2.shape[0]
    br = common.pow2_rows(rows, target_rows)
    grid = rows // br
    spec = pl.BlockSpec((br, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        input_output_aliases={0: 0},  # in-place: x is donated to the output
        interpret=interpret,
        **common.grid_semantics("parallel", interpret=interpret),
    )(x2, y2)
    return out.reshape(x.shape)


def add_inplace(x, y, *, interpret=False):
    """x += y, small (512, 128) blocks — the scalar-load analog."""
    return _tiled_map2(x, y, _add_kernel, lanes=128, target_rows=512,
                       interpret=interpret)


def add_inplace_wide(x, y, *, interpret=False):
    """x += y, 2 MB (4096, 128) blocks — the float4/double2 vector-load
    analog (maximum DMA granularity; see module docstring)."""
    return _tiled_map2(x, y, _add_kernel, lanes=128, target_rows=4096,
                       interpret=interpret)


def map2_inplace(x, y, f: Callable = None, *, interpret=False):
    """Generic two-operand elementwise kernel (vector_kernel functor analog,
    benchmark02/benchmark02.cc:60-71)."""
    if f is None:
        f = lambda a, b: a + b
    return _tiled_map2(x, y, functools.partial(_map2_kernel, f), lanes=128,
                       target_rows=2048, interpret=interpret)
