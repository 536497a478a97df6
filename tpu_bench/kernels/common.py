"""Shared helpers for the Pallas kernel tier."""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # TPU lane width: minor dim of every VPU/MXU tile
SUBLANES = 8  # f32 sublane count of one (8, 128) VPU tile


def grid_semantics(*dims: str, interpret: bool = False) -> dict:
    """compiler_params kwargs declaring each grid dim "parallel" (grid steps
    own disjoint blocks — Mosaic may overlap their DMA pipelines) or
    "arbitrary" (steps revisit a block, e.g. accumulators — must stay in
    order).  Interpret mode (CPU tests) takes no compiler params."""
    if interpret:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(dimension_semantics=dims)
    }


def pow2_rows(total_rows: int, target: int) -> int:
    """Largest power-of-two divisor of total_rows that is <= target.

    Guarantees the block count divides the array evenly (no remainder
    programs); default sweep sizes are powers of two so this normally
    saturates at `target`."""
    r = 1
    while r * 2 <= target and total_rows % (r * 2) == 0:
        r *= 2
    return r


def as_2d(x, lanes: int = LANES):
    """View a 1D array as (rows, lanes); sizes here are multiples of lanes."""
    n = x.shape[0]
    assert n % lanes == 0, (n, lanes)
    return x.reshape(n // lanes, lanes)


def acc_dtype(dtype) -> jnp.dtype:
    """Accumulator dtype for in-kernel reductions/matmuls."""
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float64:
        return jnp.dtype(jnp.float64)
    return jnp.dtype(jnp.float32)
