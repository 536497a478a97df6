"""f64 matmul on a chip with no f64 units: exact split-mantissa MXU GEMMs.

Mosaic rejects float64 refs outright, so the f64 tier's Pallas columns
cannot exist as direct ports (the committed f64 logs carry their failure
warnings), and XLA's emulated f64 dot runs ~0.4 GDOF/s on b04/b05 —
scalarized software arithmetic, ~1% of the bus ceiling.  This module
rebuilds the dense-kron contraction the TPU-native way, with the
split-mantissa ("Ozaki scheme") decomposition:

  1. **Split** (XLA, f64 elementwise, timed): x = s * sum_t v_t 2^(-w(t+1))
     where s is a power-of-two per-tensor scale and each slice v_t is a
     signed INTEGER with |v_t| <= 2^w — exactly representable in bf16's
     8 significant mantissa bits (7 explicit + implicit) for w <= 7.
     T slices cover wT mantissa bits (w=7,T=8 -> 56 >= 53).
  2. **Multiply** (Pallas, MXU): every pair dot(a_s, x_t) is a native
     1-pass bf16 GEMM whose f32 accumulator is EXACT, because the partial
     sums are integers bounded by K 2^(2w) <= 2^24 (w chosen per K).
     Products with s+t >= T are dropped — their total weight is
     ~K 2^(-w(T+2)).  Diagonal bands u = s+t share a scale, so band sums
     stay integer-exact under the same bound.
  3. **Combine** (in-kernel VPU, f32 double-float): bands are summed
     largest-first into a two-float compensated accumulator (two-sum),
     preserving ~48 bits through the recombination; the (hi, lo) f32 pair
     leaves the kernel and a trivial bandwidth-bound XLA pass forms
     hi + lo in f64.

Slice width per contraction depth: exactness needs (u+1) K 2^(2w) < 2^24
for every band u < T, i.e. w=7/T=8 for K <= 128 (2D operators) and
w=6/T=9 for K <= 1024 (3D, nq=10^3 has K=729).  End-to-end relative error
is ~1e-14 (dropped cross terms + the 48-bit df2 recombination), vs ~1e-16
native f64 — the tolerance is documented at the call site and asserted by
tests against NumPy f64.

Reference analog: the double-precision instantiation of the coalesced
dense-operator kernels (benchmark04/benchmark04.cc:1072 instantiates
run_test<double> only); this is its TPU-native counterpart where the
hardware has no f64 multiplier at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.kernels.bwdtrans2d import _parallel_params


def slice_params(k: int) -> tuple:
    """(w, T) such that every band sum is integer-exact in f32: the widest
    slice width w with (T)·K·2^(2w) < 2^24 at T = ceil(53 / w) + 1."""
    for w in (7, 6, 5, 4):
        t = -(-53 // w)  # wT >= 53: the dropped remainder is < 2^-(wT+1)
        if t * k * (1 << (2 * w)) < (1 << 24):
            return w, t
    raise ValueError(f"contraction depth {k} too deep for exact slicing")


def split_f64(x, w: int, t_slices: int):
    """x (f64) -> (slices bf16 stacked on axis 0, power-of-two scale f64).

    slices[t] are signed integers with |v| <= 2^w; dropping the remainder
    after T slices loses ~2^-(wT+1) relative to the scale.
    """
    ax = jnp.max(jnp.abs(x))
    scale = jnp.where(ax > 0, 2.0 ** jnp.ceil(jnp.log2(ax)), 1.0)
    r = x / scale
    slices = []
    for t in range(t_slices):
        v = jnp.round(r * (2.0 ** (w * (t + 1))))
        slices.append(v.astype(jnp.bfloat16))
        r = r - v * (2.0 ** (-w * (t + 1)))
    return jnp.stack(slices), scale


def _two_sum(a, b):
    """Error-free f32 addition: a + b = s + e exactly (Knuth two-sum)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _ozaki_kernel(t_a, t_x, w, precision, a_ref, x_ref, hi_ref, lo_ref):
    # band u = sum_{s+t=u} dot(a_s, x_t): integer-exact f32 by construction
    f32 = jnp.float32
    hi = None
    lo = None
    for u in range(max(t_a, t_x)):
        band = None
        for s in range(min(t_a, u + 1)):
            t = u - s
            if t >= t_x:
                continue
            d = jnp.dot(a_ref[s], x_ref[t], preferred_element_type=f32)
            band = d if band is None else band + d
        if band is None:
            continue
        scaled = band * f32(2.0 ** (-w * (u + 2)))
        if hi is None:
            hi, lo = scaled, jnp.zeros_like(scaled)
        else:
            # compensated accumulation, largest band first
            hi, e = _two_sum(hi, scaled)
            lo = lo + e
    hi_ref[:] = hi
    lo_ref[:] = lo


def kron_ozaki(in_slices, c_slices, scale_in, scale_c, *, epb,
               interpret=False, precision=None):
    """out_f64 = (C @ X) for f64 C (nqTot, nmTot) and X (nmTot, E), where
    both arrive pre-split (split_f64) and the product runs as exact bf16
    slice GEMMs on the MXU.  Returns the f64 result; the recombination
    hi + lo is one bandwidth-bound XLA pass."""
    t_c, nq_tot, nm_tot = c_slices.shape
    t_x = in_slices.shape[0]
    e = in_slices.shape[2]
    w, _ = slice_params(nm_tot)
    grid = (e // epb,)
    hi, lo = pl.pallas_call(
        functools.partial(_ozaki_kernel, t_c, t_x, w, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_c, nq_tot, nm_tot), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_x, nm_tot, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nq_tot, epb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq_tot, epb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_tot, e), jnp.float32),
            jax.ShapeDtypeStruct((nq_tot, e), jnp.float32),
        ],
        interpret=interpret,
        **_parallel_params(interpret),
    )(c_slices, in_slices)
    return (scale_c * scale_in) * (hi.astype(jnp.float64)
                                   + lo.astype(jnp.float64))


def coales_variant(*, epb, interpret=False):
    """The f64 Coales-tier variant fn for the benchmark harnesses:
    (in_coa f64, c_slices bf16, c_scale) -> out f64.  The element stream's
    split is per-element work and runs inside the timed fn; the operator
    arrives pre-split from prepare() (operators are untimed setup in every
    variant).  Dispatched for dtype == float64, where Mosaic rejects the
    direct kernels outright; documented tolerance ~1e-14 relative
    (tests/test_ozaki.py) vs the 1e-10 cross-variant f64 rtol."""

    def fn(in_coa, c_slices, c_scale):
        w, _ = slice_params(in_coa.shape[0])
        t = c_slices.shape[0]
        xs, sx = split_f64(in_coa, w, t)
        return kron_ozaki(xs, c_slices, sx, c_scale, epb=epb,
                          interpret=interpret)

    return fn


def kron_coalesced_f64(in_coa, c_coa, *, epb, c_split=None, interpret=False,
                       precision=None):
    """Drop-in f64 Coales-tier variant: split the element stream (timed —
    it is per-element work), multiply via exact slice GEMMs, recombine.
    The operator's split may be passed pre-computed (c_split) since every
    variant treats the basis operator as untimed setup."""
    nm_tot = in_coa.shape[0]
    w, t = slice_params(nm_tot)
    if c_split is None:
        c_split = split_f64(c_coa, w, t)
    c_slices, scale_c = c_split
    in_slices, scale_in = split_f64(in_coa, w, t)
    return kron_ozaki(in_slices, c_slices, scale_in, scale_c, epb=epb,
                      interpret=interpret, precision=precision)
