"""Double-float (df2) f32 arithmetic: ~48-bit math with no float64 types.

This toolchain's remote compile helper rejects every program compiled
under jax_enable_x64 that contains a Pallas call, and Mosaic has no f64
lowering at all (artifacts/wall/f64ozaki.log) — so everything the f64
tier needs ON DEVICE is built from error-free f32 transforms instead:
a value is carried as an unevaluated (hi, lo) f32 pair with
|lo| <= ulp(hi)/2, giving ~2^-48 relative accuracy.  The classic
constructions (Knuth two-sum, Dekker split two-prod) rely on IEEE f32
semantics, which XLA preserves: it does not reassociate or contract
float arithmetic without explicit fastmath-style flags, and the VPU is
IEEE-754 compliant for f32 add/mul.

Used by: the f64 Ozaki GEMM tier's validation norm (kernels/ozaki.py —
sumsq of a df2 tensor without ever creating an f64 device array) and the
f64 streaming kernels (kernels/reduction.py df2 tier), whose operands are
host-split f64 -> (hi, lo) pairs reading the same 8 bytes/value as the
reference's double loads (benchmark01/benchmark01.cc:15-77's double
instantiation).  All functions are jnp-level and shape-polymorphic, so
they work identically in XLA and inside Pallas kernel bodies.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SPLIT = 4097.0  # Dekker splitter 2^ceil(24/2) + 1 for f32's 24-bit mantissa


def two_sum(a, b):
    """Error-free add: a + b = s + e exactly (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free add assuming |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod(a, b):
    """Error-free multiply: a * b = p + e exactly (Dekker split; no FMA
    dependence — Mosaic exposes no fused-multiply-add primitive)."""
    p = a * b
    aa = a * jnp.float32(_SPLIT)
    ah = aa - (aa - a)
    al = a - ah
    bb = b * jnp.float32(_SPLIT)
    bh = bb - (bb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(x, y):
    """df2 + df2 -> df2 (Dekker/Linnainmaa add2, ~2^-48 relative)."""
    xh, xl = x
    yh, yl = y
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return fast_two_sum(s, e)


def sq(hi, lo):
    """df2 square: (hi + lo)^2 as a df2 pair; drops lo*lo (~2^-48 rel)."""
    p, e = two_prod(hi, hi)
    return p, e + jnp.float32(2.0) * hi * lo


def split_f64_np(x) -> tuple:
    """Host-side f64 -> (hi, lo) f32 pair, exactly: hi = f32(x),
    lo = f32(x - hi).  Reads/writes the same 8 bytes per value as the f64
    it represents, so a kernel streaming (hi, lo) is traffic-equivalent
    to the reference's double loads."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def tree_sum(hi, lo):
    """df2 sum of a df2 tensor: (s_hi, s_lo) f32 scalar pair via the same
    log-depth error-free pairwise tree as sumsq (no squaring).  Used to
    finish per-block partial pairs (kernels/df2stream.py second pass)."""
    sh, sl = hi.ravel(), lo.ravel()
    n = sh.shape[0]
    np2 = 1
    while np2 < n:
        np2 *= 2
    if np2 != n:
        z = jnp.zeros((np2 - n,), jnp.float32)
        sh = jnp.concatenate([sh, z])
        sl = jnp.concatenate([sl, z])
    while np2 > 1:
        half = np2 // 2
        sh, sl = add((sh[:half], sl[:half]), (sh[half:], sl[half:]))
        np2 = half
    return sh[0], sl[0]


def sumsq(hi, lo):
    """Sum of squares of a df2 tensor, accumulated in df2: returns the
    (s_hi, s_lo) f32 scalar pair.  Log-depth pairwise tree of error-free
    adds, so the result carries ~2^-48 relative error independent of n —
    combine `float(s_hi) + float(s_lo)` on the host (Python f64) for the
    full-precision value.  Norm-validation path of the f64 tier: the
    device math is pure f32, no x64 anywhere."""
    sh, sl = sq(hi.ravel(), lo.ravel())
    n = sh.shape[0]
    np2 = 1
    while np2 < n:
        np2 *= 2
    if np2 != n:
        z = jnp.zeros((np2 - n,), jnp.float32)
        sh = jnp.concatenate([sh, z])
        sl = jnp.concatenate([sl, z])
    while np2 > 1:
        half = np2 // 2
        sh, sl = add((sh[:half], sl[:half]), (sh[half:], sl[half:]))
        np2 = half
    return sh[0], sl[0]
