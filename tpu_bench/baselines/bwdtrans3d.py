"""XLA library-tier 3D BwdTrans variants for benchmark05.

Reference tiers: four Kokkos hex formulations
(benchmark05/benchmark05.cc:693-1100) and the cuBLAS
gemmStridedBatched + two gemm path (:1126-1158).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("precision",))
def einsum_em(in_em4, b0, b1, b2, precision=HIGHEST):
    """Element-major einsum (Kokkos uncoalesced hex analog)."""
    return jnp.einsum("erqp,pi,qj,rk->ekji", in_em4, b0, b1, b2,
                      precision=precision)


@functools.partial(jax.jit, static_argnames=("precision",))
def einsum_coa(in_coa4, b0, b1, b2, precision=HIGHEST):
    """Coalesced-layout einsum (Kokkos coalesced hex analog)."""
    return jnp.einsum("rqpe,pi,qj,rk->kjie", in_coa4, b0, b1, b2,
                      precision=precision)


@functools.partial(jax.jit, static_argnames=("precision",))
def staged_em(in_em4, b0, b1, b2, precision=HIGHEST):
    """Explicit 3-stage contraction with materialized workspaces
    (Kokkos QP hex analog)."""
    w1 = jnp.einsum("erqp,pi->erqi", in_em4, b0, precision=precision)
    w2 = jnp.einsum("erqi,qj->erji", w1, b1, precision=precision)
    return jnp.einsum("erji,rk->ekji", w2, b2, precision=precision)


@functools.partial(jax.jit, static_argnames=("precision",))
def staged_dotgeneral(in_em4, b0, b1, b2, precision=HIGHEST):
    """3-stage via raw dot_general + transposes (Kokkos QP/shared analog)."""
    w1 = jax.lax.dot_general(in_em4, b0, (((3,), (0,)), ((), ())),
                             precision=precision)        # (E, nm2, nm1, nq0)
    w2 = jax.lax.dot_general(w1, b1, (((2,), (0,)), ((), ())),
                             precision=precision)        # (E, nm2, nq0, nq1)
    w3 = jax.lax.dot_general(w2, b2, (((1,), (0,)), ((), ())),
                             precision=precision)        # (E, nq0, nq1, nq2)
    return jnp.transpose(w3, (0, 3, 2, 1))                # (E, nq2, nq1, nq0)


@functools.partial(jax.jit, static_argnames=("precision",))
def gemm_kron(in_coa, c_coa3, precision=HIGHEST):
    """Single library GEMM on the full 3D kron operator (cuBLAS-tier):
    out_coa = C3_coa @ in_coa."""
    return jnp.dot(c_coa3, in_coa, precision=precision,
                   preferred_element_type=in_coa.dtype)
