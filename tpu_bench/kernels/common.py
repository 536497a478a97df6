"""Shared helpers for the Pallas kernel tier."""

from __future__ import annotations

import jax.numpy as jnp

LANES = 128  # TPU lane width: minor dim of every VPU/MXU tile
SUBLANES = 8  # f32 sublane count of one (8, 128) VPU tile


def pow2_rows(total_rows: int, target: int) -> int:
    """Largest power-of-two block row count <= min(total_rows, target).

    Sweep sizes in this suite are powers of two, so the result always divides
    total_rows evenly (no remainder programs needed).
    """
    r = 1
    while r * 2 <= min(total_rows, target):
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
