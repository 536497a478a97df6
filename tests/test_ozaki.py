"""kernels/ozaki.py — exact split-mantissa f64 GEMM (interpret mode).

The scheme's correctness rests on three provable properties, each asserted
here against NumPy f64: slices are exact bf16 integers that reconstruct
the input to ~2^-(wT+1); every slice-pair GEMM stays integer-exact in an
f32 accumulator for the (w, T) slice_params picks; and the df2 band
recombination keeps the end-to-end error <= ~1e-14 relative — documented
as the tier's tolerance (native f64 would be ~1e-16)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_bench.kernels import ozaki


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape))


@pytest.mark.parametrize("k", [1, 9, 49, 169, 343, 729, 961])
def test_slice_params_exactness_bound(k):
    w, t = ozaki.slice_params(k)
    assert w * t >= 53
    # every band sum (up to T dots of K products of two w-bit integers)
    # stays below f32's exact-integer range
    assert t * k * 2 ** (2 * w) < 2 ** 24


def test_split_reconstructs():
    x = _rand((37, 128), 0) * 3.7
    w, t = 7, 8
    slices, scale = ozaki.split_f64(x, w, t)
    assert slices.dtype == jnp.bfloat16
    # slices are integers bounded by 2^w
    s64 = np.asarray(slices, np.float64)
    assert np.all(s64 == np.round(s64))
    assert np.max(np.abs(s64)) <= 2 ** w
    rec = float(scale) * sum(
        s64[i] * 2.0 ** (-w * (i + 1)) for i in range(t))
    np.testing.assert_allclose(rec, np.asarray(x), rtol=0, atol=2e-16)


def test_split_zero_and_tiny():
    z, scale = ozaki.split_f64(jnp.zeros((4, 128)), 7, 8)
    assert float(jnp.max(jnp.abs(z))) == 0.0
    assert np.isfinite(float(scale))
    x = _rand((4, 128), 1) * 1e-200
    slices, scale = ozaki.split_f64(x, 7, 8)
    s64 = np.asarray(slices, np.float64)
    rec = float(scale) * sum(s64[i] * 2.0 ** (-7 * (i + 1)) for i in range(8))
    # the guarantee is absolute: |rec - x| < scale * 2^-(wT+1) (fixed-point
    # semantics — per-element relative error is unbounded for values far
    # below the tensor scale, exactly like the reference's f64 subnormals)
    assert np.max(np.abs(rec - np.asarray(x))) <= float(scale) * 2.0 ** -56


@pytest.mark.parametrize("m,k", [(64, 49), (512, 343), (1000, 729)])
def test_kron_ozaki_matches_numpy_f64(m, k):
    c = _rand((m, k), 2)
    x = _rand((k, 256), 3)
    out = ozaki.kron_coalesced_f64(x, c, epb=128, interpret=True)
    assert out.dtype == jnp.float64
    ref = np.asarray(c) @ np.asarray(x)
    rel = np.max(np.abs(np.asarray(out) - ref)) / np.max(np.abs(ref))
    assert rel < 5e-14, rel


def test_kron_ozaki_on_benchmark_operator():
    # the real b04 nq=8 operator + element stream, vs the NumPy reference
    from tpu_bench.core.config import Config
    from tpu_bench.benchmarks import benchmark04 as b04
    from tpu_bench.ops import bwdtrans

    cfg = Config(dtype=jnp.float64)
    data = b04.prepare(8, 8, 256, cfg)
    out = ozaki.kron_coalesced_f64(data["in_coa"], data["c_coa"], epb=128,
                                   interpret=True)
    ref = bwdtrans.reference2d(data["basis"], data["e_pad"])
    got = float(jnp.linalg.norm(out))
    want = float(np.linalg.norm(ref))
    assert abs(got - want) / want < 1e-13


def test_pair_and_band_forms_match_f64():
    """kron_ozaki_pair and kron_ozaki_band (the band-per-grid-step form)
    produce identical (hi, lo) pairs, both ~1e-15 of NumPy f64, and
    pair_norm's df2 tree matches the f64 norm — the x64-free sweep path
    (VERDICT r4 next #2)."""
    rng = np.random.default_rng(3)
    for k, nq_tot in ((49, 64), (343, 512)):
        c = rng.standard_normal((nq_tot, k))
        x = rng.standard_normal((k,))
        e = 256
        w, t = ozaki.slice_params(k)
        c_sl, s_c = ozaki.split_f64_np(c, w, t)
        x_sl, s_x = ozaki.split_f64_np(x, w, t)
        cs = jnp.asarray(c_sl).astype(jnp.bfloat16)
        xs = jnp.asarray(
            np.broadcast_to(x_sl[:, :, None], (t, k, e)).copy()
        ).astype(jnp.bfloat16)
        ref = c @ x
        ref_norm = float(np.sqrt((ref * ref).sum() * e))
        outs = []
        for fn in (ozaki.kron_ozaki_pair, ozaki.kron_ozaki_band):
            hi, lo = fn(xs, cs, epb=128, interpret=True)
            out = (np.asarray(hi, np.float64)
                   + np.asarray(lo, np.float64)) * (s_c * s_x)
            np.testing.assert_allclose(out[:, 0], ref, rtol=1e-13)
            nrm = ozaki.pair_norm((hi, lo), s_c * s_x)
            assert abs(nrm - ref_norm) / ref_norm < 1e-13
            outs.append(out)
        np.testing.assert_array_equal(outs[0], outs[1])


def test_split_f64_np_matches_jax_split():
    """The NumPy host split is value-identical to the in-XLA split."""
    x = np.asarray(_rand((5, 64), 7)) * 2.37
    w, t = 7, 8
    sl_np, sc_np = ozaki.split_f64_np(x, w, t)
    sl_jx, sc_jx = ozaki.split_f64(jnp.asarray(x), w, t)
    assert sc_np == float(sc_jx)
    np.testing.assert_array_equal(sl_np, np.asarray(sl_jx, np.float32))


def test_df2stream_kernels_match_f64():
    """kernels/df2stream.py: the b01/b02/b03 df2 tiers vs NumPy f64
    (interpret mode).  Operands are exact (hi, lo) f32 pairs of the same
    bytes as the f64 stream (df2stream.split_pair docstring)."""
    from tpu_bench.kernels import df2stream as df2s
    from tpu_bench.ops import df2 as df2ops

    rng = np.random.default_rng(11)
    x64 = rng.standard_normal(4096) * 3.0
    y64 = rng.standard_normal(4096) * 2.0
    x2 = tuple(jnp.asarray(v) for v in df2ops.split_f64_np(x64))
    y2 = tuple(jnp.asarray(v) for v in df2ops.split_f64_np(y64))
    # b01 sumsq tiers
    want = float(np.sum(x64 * x64))
    for fn in (df2s.sumsq_pair_two_pass, df2s.sumsq_pair_wide,
               df2s.sumsq_pair_one_pass):
        h, l = fn(x2, interpret=True)
        got = float(h) + float(l)
        assert abs(got - want) / want < 1e-13, fn.__name__
    # b02 add (accumulating)
    xh, xl = x2
    for _ in range(3):
        xh, xl = df2s.add_pair((xh, xl), y2, interpret=True)
    want = x64 + 3 * y64
    got = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
    # atol floor: elements near a zero crossing have unbounded rel err
    np.testing.assert_allclose(got, want, rtol=1e-12,
                               atol=1e-13 * np.abs(want).max())
    # b03 matvec, both layouts
    a64 = rng.standard_normal((256, 512))
    xv64 = rng.standard_normal(512)
    a2 = tuple(jnp.asarray(v) for v in df2ops.split_f64_np(a64))
    a2cm = tuple(jnp.asarray(v) for v in df2ops.split_f64_np(a64.T))
    xv2 = tuple(jnp.asarray(v) for v in df2ops.split_f64_np(xv64))
    want = a64 @ xv64
    for fn, args in ((df2s.matvec_pair_rm, (a2, xv2)),
                     (df2s.matvec_pair_cm, (a2cm, xv2))):
        yh, yl = fn(*args, interpret=True)
        got = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
        np.testing.assert_allclose(got, want, rtol=1e-12)
