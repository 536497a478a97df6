"""Pallas streaming-add kernels — benchmark02's hand-written tier.

Reference: grid-stride x[i] += y[i] in scalar and float4/double2 vector-load
flavors plus a generic functor kernel (benchmark02/benchmark02.cc:16-71).
TPU-native mapping: (rows, lanes)-tiled in-place add with the input aliased
to the output (true x += y, 2 reads + 1 write like the CUDA kernel); the
"vector load" analog widens rows to 1024 lanes; the functor variant is a
generic elementwise map over two operands.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
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
    """x += y, narrow (rows, 128) tiles — the scalar-load analog."""
    return _tiled_map2(x, y, _add_kernel, lanes=128, target_rows=2048,
                       interpret=interpret)


def add_inplace_wide(x, y, *, interpret=False):
    """x += y with 1024-lane rows — the float4/double2 vector-load analog."""
    return _tiled_map2(x, y, _add_kernel, lanes=1024, target_rows=512,
                       interpret=interpret)


def map2_inplace(x, y, f: Callable = None, *, interpret=False):
    """Generic two-operand elementwise kernel (vector_kernel functor analog,
    benchmark02/benchmark02.cc:60-71)."""
    if f is None:
        f = lambda a, b: a + b
    return _tiled_map2(x, y, functools.partial(_map2_kernel, f), lanes=128,
                       target_rows=2048, interpret=interpret)
