"""Shared machinery for the 2D/3D tensor-product sum-factorization
("BwdTrans") benchmarks.

Math (2D, reference semantics from benchmark04/benchmark04.cc:489-523):

    out[e, j, i] = sum_{q, p} in[e, q, p] * B0[p, i] * B1[q, j]

with nm_d = nq_d - 1 modes per direction (:437-438), element data
in[e, q, p] = sin(q*nm0 + p + 1) (identical for every element, :470-477) and
basis B_d[m, n] = cos(m*nq_d + n) (:478-486).  3D adds a third contraction
(B2, out[e,k,j,i]; benchmark05/benchmark05.cc:695-740).

Two storage layouts, mirroring the reference's uncoalesced/coalesced pair
(:859-875): element-major (E, nmTot) with the element index on the slow
axis, and "coalesced" (nmTot, E) with the element index on the 128-lane
minor axis — the layout that tiles natively on the TPU VPU/MXU.

Operator matrices (device-built, untimed prep):
    C_em  = kron(B1, B0)              (nmTot, nqTot): out_em2 = in_em2 @ C_em
    S1_em = kron(I_nm1, B0)           stage-1 for element-major layout
    S2_em = kron(B1, I_nq0)           stage-2 for element-major layout
(coalesced variants use the transposes).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpu_bench.core.variants import Layouts  # noqa: F401  (re-export; canonical home moved, VERDICT r3 weak #7)
import numpy as np

from tpu_bench.ops import initdata
from tpu_bench.utils import native


@dataclasses.dataclass
class Basis2D:
    nq0: int
    nq1: int
    b0: jax.Array  # (nm0, nq0)
    b1: jax.Array  # (nm1, nq1)

    @property
    def nm0(self):
        return self.nq0 - 1

    @property
    def nm1(self):
        return self.nq1 - 1

    @property
    def nm_tot(self):
        return self.nm0 * self.nm1

    @property
    def nq_tot(self):
        return self.nq0 * self.nq1


def make_basis2d(nq0: int, nq1: int, dtype) -> Basis2D:
    nm0, nm1 = nq0 - 1, nq1 - 1
    return Basis2D(
        nq0=nq0,
        nq1=nq1,
        b0=initdata.host_basis_cos(nm0, nq0, dtype),
        b1=initdata.host_basis_cos(nm1, nq1, dtype),
    )


def element_data2d(basis: Basis2D, dtype) -> jax.Array:
    """One element's mode coefficients, flat (nmTot,): sin(l+1)."""
    return jnp.asarray(native.init_sin1(basis.nm_tot), dtype=dtype)


def make_inputs2d(basis: Basis2D, nelmt: int, nelmt_pad: int, dtype):
    """(in_em2 (E_pad, nmTot), in_coa (nmTot, E_pad)): identical per-element
    data, with zeroed padding elements beyond nelmt (inert in norms)."""
    elem = element_data2d(basis, dtype)
    in_em2 = jnp.tile(elem[None, :], (nelmt_pad, 1))
    if nelmt_pad != nelmt:
        mask = (jnp.arange(nelmt_pad) < nelmt)[:, None]
        in_em2 = jnp.where(mask, in_em2, jnp.zeros((), dtype))
    in_coa = jnp.asarray(in_em2.T)
    return in_em2, in_coa


def operators2d(basis: Basis2D):
    """Device operator matrices for the matmul-form variants."""
    b0, b1 = basis.b0, basis.b1
    eye0 = jnp.eye(basis.nq0, dtype=b0.dtype)
    eye1 = jnp.eye(basis.nm1, dtype=b0.dtype)
    c_em = jnp.kron(b1, b0)          # (nmTot, nqTot)
    s1_em = jnp.kron(eye1, b0)       # (nmTot, nm1*nq0)
    s2_em = jnp.kron(b1, eye0)       # (nm1*nq0, nqTot)
    return c_em, s1_em, s2_em


def grouped_g(nq0: int, nq1: int) -> int:
    """Group width for the block-diagonal MXU kernel: the smallest
    divisor of nq1 >= 2 with g*nq1 <= 128 (one MXU tile of output rows
    per GEMM), or 0 when none exists.  Measured at nq=32: g=2 beats g=4
    (55.6 vs 53.0 GDOF/s HIGHEST) — smaller groups mean smaller operand
    tiles re-read per GEMM (docs/experiments/exp_nq32.py)."""
    for g in range(2, nq1):
        if nq1 % g == 0 and g * nq1 <= 128:
            return g
    return 0


def grouped_operators2d(basis: Basis2D, g: int):
    """(s1g, s2g) block-diagonal operators for qp_mxu_grouped:
    s1g = blockdiag(B1^T, g) (g*nq1, g*nm1); s2g = blockdiag(B0^T padded
    to nm0p columns, g) (g*nq0, g*nm0p)."""
    b0 = np.asarray(basis.b0)
    b1t = np.asarray(basis.b1).T
    ngrp = -(-basis.nm0 // g)
    nm0p = ngrp * g
    b0t_p = np.zeros((basis.nq0, nm0p), b0.dtype)
    b0t_p[:, :basis.nm0] = b0.T

    def blockdiag(m):
        r, c = m.shape
        out = np.zeros((g * r, g * c), m.dtype)
        for k in range(g):
            out[k * r:(k + 1) * r, k * c:(k + 1) * c] = m
        return jnp.asarray(out)

    return blockdiag(b1t), blockdiag(b0t_p)


def _mask_trailing(x, nelmt, e_pad, dtype):
    if e_pad == nelmt:
        return jnp.asarray(x)
    mask = jnp.arange(e_pad) < nelmt
    return jnp.where(mask, x, jnp.zeros((), dtype))


def stream_sources(elem_flat, nm_shape, nelmt: int, e_pad: int, dtype):
    """Per-layout builders of the element stream, each materializing
    straight from the per-element coefficient vector — no cross-layout
    intermediates, so a sweep's resident set is ONE layout at a time.
    (The reference host-initializes both layouts up front,
    benchmark04/benchmark04.cc:859-875, on a GPU with ~5x this chip's HBM;
    holding one at a time is what admits the reference's published
    nelmt=1,048,576 rows for the heaviest nq on 16 GB.)

    nm_shape is (nm1, nm0) in 2D or (nm2, nm1, nm0) in 3D.  Builders:
      em2        (E, nmTot)           element-major
      coa        (nmTot, E)           coalesced (element on the lane axis)
      pcoa3      (nm0, rest, E)       p-major coalesced (fused QP kernels)
      blk(ce)    (E/ce, nmTot, ce)    chunk-interleaved coalesced
    """
    nm_shape = tuple(int(n) for n in nm_shape)
    nm0 = nm_shape[-1]
    nm_tot = 1
    for n in nm_shape:
        nm_tot *= n
    elem = jnp.asarray(elem_flat, dtype=dtype)

    def em2():
        x = jnp.broadcast_to(elem[None, :], (e_pad, nm_tot))
        if e_pad != nelmt:
            mask = (jnp.arange(e_pad) < nelmt)[:, None]
            x = jnp.where(mask, x, jnp.zeros((), dtype))
        return jnp.asarray(x)

    def coa():
        x = jnp.broadcast_to(elem[:, None], (nm_tot, e_pad))
        return _mask_trailing(x, nelmt, e_pad, dtype)

    def pcoa3():
        ep = jnp.asarray(elem.reshape(nm_tot // nm0, nm0).T)  # (nm0, rest)
        x = jnp.broadcast_to(ep[:, :, None], (nm0, nm_tot // nm0, e_pad))
        return _mask_trailing(x, nelmt, e_pad, dtype)

    def blk(ce):
        nblk = e_pad // ce
        x = jnp.broadcast_to(elem[None, :, None], (nblk, nm_tot, ce))
        if e_pad != nelmt:
            eidx = jnp.arange(nblk)[:, None, None] * ce + jnp.arange(ce)
            x = jnp.where(eidx < nelmt, x, jnp.zeros((), dtype))
        return jnp.asarray(x)

    def grouped(g):
        # p-grouped coalesced layout for the block-diagonal MXU kernel
        # (kernels.bwdtrans2d.qp_mxu_grouped): group gi's row block k
        # holds the rest-modes of p = gi*g + k, zero rows past nm0
        rest = nm_tot // nm0
        ngrp = -(-nm0 // g)
        ep = np.zeros((ngrp, g * rest), np.asarray(elem).dtype)
        em = np.asarray(elem).reshape(rest, nm0)
        for p in range(nm0):
            ep[p // g, (p % g) * rest:(p % g + 1) * rest] = em[:, p]
        x = jnp.broadcast_to(jnp.asarray(ep, dtype)[:, :, None],
                             (ngrp, g * rest, e_pad))
        return _mask_trailing(x, nelmt, e_pad, dtype)

    return dict(em2=em2, coa=coa, pcoa3=pcoa3, blk=blk, grouped=grouped)


def blocked_coa(in_coa: jax.Array, ce: int) -> jax.Array:
    """Chunk-interleave the coalesced layout: (nmTot, E) -> (E/ce, nmTot, ce)
    so each ce-element chunk's modes are one contiguous HBM region (the
    warp-interleaved layout of benchmark04/benchmark04.cc:859-875 with
    chunk width ce instead of warpsize 32).  Untimed layout prep, like the
    reference's host-side in_coa initialization."""
    nm_tot, e = in_coa.shape
    nblk = e // ce
    return jnp.asarray(in_coa.reshape(nm_tot, nblk, ce).transpose(1, 0, 2))


def pad_lanes(n: int, lanes: int = 128) -> int:
    """VMEM lane-dim footprint of an n-wide minor axis: element-major blocks
    (E, nmTot) pad nmTot up to the 128-lane tile, so their per-element VMEM
    cost uses the padded width (coalesced blocks put elements on the lane
    axis and pay no such padding)."""
    return -(-n // lanes) * lanes


def pad_rows(m: jax.Array, mult: int = 8) -> jax.Array:
    """Zero-pad a matrix's leading (sublane) dim up to a multiple of mult —
    keeps per-plane vreg tiles aligned in kernels that slice the rows back
    on store (kernels.bwdtrans2d.qp_w)."""
    r = m.shape[0]
    rp = -(-r // mult) * mult
    if rp == r:
        return m
    return jnp.concatenate(
        [m, jnp.zeros((rp - r,) + m.shape[1:], m.dtype)], axis=0)


def wide_chunk_elems(e_pad: int, cap: int = 262144) -> int:
    """Largest power-of-two elements-per-chunk dividing e_pad, capped —
    the blocked-chunk width for the low-order VPU kron tier (measured
    best at 256Ki on v5e, docs/experiments/exp_ring.py)."""
    ce = 128
    while ce * 2 <= min(e_pad, cap) and e_pad % (ce * 2) == 0:
        ce *= 2
    return ce


def wide4_chunk_elems(nm_tot: int, nq_tot: int, itemsize: int, e_pad: int,
                      cap: int, vmem_budget: int = 36 * 1024 * 1024) -> int:
    """Chunk width for the kron_wide4 MXU tier: the measured ce=32768
    optimum (docs/experiments/exp_lo46d.py), shrunk so the double-buffered
    in+out blocks fit the VMEM budget — at nq=14+ a 32768-wide block is
    96-520 MB and Mosaic cannot compile it.  The 36 MB budget reproduces
    the measured optima at nq=8/10/12 (32768/16384/16384) exactly."""
    cap = min(cap, max(vmem_budget // max((nm_tot + nq_tot) * itemsize * 2,
                                          1), 128))
    return wide_chunk_elems(e_pad, cap)


def choose_xla_chunk(fixed_bytes: int, w_bytes_per_elem: int, e_pad: int,
                     cap: int):
    """Element-chunk width for the XLA staged tiers (None = no chunking):
    chunk only when fixed residency (input + two chain-carried outputs)
    plus the full-size stage workspaces would overflow the sweep cap, and
    then pick the largest power-of-two ce whose ~two in-flight workspace
    chunks still fit.  Floored at 64Ki elements so a chunk's workspace
    dwarfs VMEM and the staged variants keep their HBM round-trip
    semantics (baselines.chunk_elems)."""
    if fixed_bytes + w_bytes_per_elem * e_pad <= cap:
        return None
    ce = 65536
    while (ce * 2 < e_pad
           and fixed_bytes + 2 * w_bytes_per_elem * (ce * 2) <= cap):
        ce *= 2
    return min(ce, e_pad)


def choose_epb(bytes_per_elem_col: int, nelmt_pad: int, epb: int = None,
               vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Elements per Pallas program (the threads/elblocks analog): the largest
    power of two whose VMEM working set fits the budget (SURVEY.md §7:
    basis + workspaces x elements-per-program must fit ~16 MB VMEM).
    Wider blocks amortize per-grid-step overhead; measured on v5e the 2D
    QP kernel keeps gaining through epb=8192 (94 GDOF/s vs 87 at 2048)."""
    if epb is None:
        cols = max(1, vmem_budget // max(bytes_per_elem_col, 1))
        epb = 128
        while epb * 2 <= min(cols, 8192):
            epb *= 2
    e = 1
    while e * 2 <= min(epb, nelmt_pad) and nelmt_pad % (e * 2) == 0:
        e *= 2
    return e


# ---- 3D (benchmark05) ---------------------------------------------------


@dataclasses.dataclass
class Basis3D:
    nq0: int
    nq1: int
    nq2: int
    b0: jax.Array  # (nm0, nq0)
    b1: jax.Array  # (nm1, nq1)
    b2: jax.Array  # (nm2, nq2)

    @property
    def nm0(self):
        return self.nq0 - 1

    @property
    def nm1(self):
        return self.nq1 - 1

    @property
    def nm2(self):
        return self.nq2 - 1

    @property
    def nm_tot(self):
        return self.nm0 * self.nm1 * self.nm2

    @property
    def nq_tot(self):
        return self.nq0 * self.nq1 * self.nq2


def make_basis3d(nq0: int, nq1: int, nq2: int, dtype) -> Basis3D:
    return Basis3D(
        nq0=nq0, nq1=nq1, nq2=nq2,
        b0=initdata.host_basis_cos(nq0 - 1, nq0, dtype),
        b1=initdata.host_basis_cos(nq1 - 1, nq1, dtype),
        b2=initdata.host_basis_cos(nq2 - 1, nq2, dtype),
    )


def element_data3d(basis: Basis3D, dtype) -> jax.Array:
    """One element's mode coefficients, flat (nmTot,) with rows (r,q,p)
    p-minor: sin(flat+1) (benchmark05/benchmark05.cc:666-672)."""
    return jnp.asarray(native.init_sin1(basis.nm_tot), dtype=dtype)


def make_inputs3d(basis: Basis3D, nelmt: int, nelmt_pad: int, dtype):
    """(in_em2 (E_pad, nmTot3), in_coa (nmTot3, E_pad)); rows flat (r,q,p)
    with p minor, values sin(flat+1) (benchmark05/benchmark05.cc:666-672)."""
    elem = jnp.asarray(native.init_sin1(basis.nm_tot), dtype=dtype)
    in_em2 = jnp.tile(elem[None, :], (nelmt_pad, 1))
    if nelmt_pad != nelmt:
        mask = (jnp.arange(nelmt_pad) < nelmt)[:, None]
        in_em2 = jnp.where(mask, in_em2, jnp.zeros((), dtype))
    in_coa = jnp.asarray(in_em2.T)
    return in_em2, in_coa


def operators3d(basis: Basis3D):
    """Operator matrices for the 3D matmul-form variants.

    c_em3:  kron(B2, B1, B0)   (nmTot3, nqTot3)   single-GEMM form
    c12t:   kron(B2^T, B1^T)   (nq2*nq1, nm2*nm1) pair-stage for the fused
                                sum-factorization kernels (contract q,r)
    s1/s2/s3_em: dense kron-structured per-stage operators (element-major)
    """
    b0, b1, b2 = basis.b0, basis.b1, basis.b2
    c_em3 = jnp.kron(b2, jnp.kron(b1, b0))
    c12t = jnp.kron(jnp.asarray(b2.T), jnp.asarray(b1.T))
    s1_em = jnp.kron(jnp.eye(basis.nm2 * basis.nm1, dtype=b0.dtype), b0)
    s2_em = jnp.kron(
        jnp.eye(basis.nm2, dtype=b0.dtype),
        jnp.kron(b1, jnp.eye(basis.nq0, dtype=b0.dtype)),
    )
    s3_em = jnp.kron(b2, jnp.eye(basis.nq1 * basis.nq0, dtype=b0.dtype))
    return c_em3, c12t, s1_em, s2_em, s3_em


def reference3d(basis: Basis3D, nelmt: int) -> np.ndarray:
    """f64 oracle out (nelmt, nq2, nq1, nq0)."""
    elem = native.init_sin1(basis.nm_tot)
    inp = np.broadcast_to(elem, (nelmt, basis.nm_tot)).reshape(
        nelmt, basis.nm2, basis.nm1, basis.nm0
    )
    b0 = native.init_cos(basis.nm0 * basis.nq0).reshape(basis.nm0, basis.nq0)
    b1 = native.init_cos(basis.nm1 * basis.nq1).reshape(basis.nm1, basis.nq1)
    b2 = native.init_cos(basis.nm2 * basis.nq2).reshape(basis.nm2, basis.nq2)
    return native.bwdtrans3d_ref(inp, b0, b1, b2)


# ---- f64 reference (test oracle plumbing) -------------------------------


def reference2d(basis: Basis2D, nelmt: int) -> np.ndarray:
    """f64 oracle out (nelmt, nq1, nq0) via the native/NumPy reference."""
    elem = native.init_sin1(basis.nm_tot)
    inp = np.broadcast_to(elem, (nelmt, basis.nm_tot)).reshape(
        nelmt, basis.nm1, basis.nm0
    )
    b0 = native.init_cos(basis.nm0 * basis.nq0).reshape(basis.nm0, basis.nq0)
    b1 = native.init_cos(basis.nm1 * basis.nq1).reshape(basis.nm1, basis.nq1)
    return native.bwdtrans2d_ref(inp, b0, b1)
