"""b04 correctness: all 11 variants vs the f64 oracle + the reference-log
golden norm (benchmark04/nq8x8.log: nelmt 128 norm 29.12205853)."""

import numpy as np
import pytest

from tpu_bench.benchmarks import benchmark04 as b04
from tpu_bench.core.validate import l2norm, variant_norm
from tpu_bench.ops import bwdtrans


@pytest.mark.parametrize("nq", [2, 3, 8])
def test_variants_match_oracle(nq, cfg64):
    nelmt = 128
    data = b04.prepare(nq, nq, nelmt, cfg64)
    ref = bwdtrans.reference2d(data["basis"], nelmt)
    ref_norm = float(np.linalg.norm(ref))
    for label, fn, args in b04.build_variants(data, cfg64):
        out = fn(*args)
        assert variant_norm(out, data) == pytest.approx(
            ref_norm, rel=1e-10), label
        # shape-aware value check for the element-major einsum tier
        if label == "XLA(Uncoales)":
            np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-10)


def test_grouped_mxu_tier(cfg64):
    """nq=32 swaps the QP/Shared tier for the G-grouped block-diagonal
    MXU kernel (qp_mxu_grouped, g=2, nm0=31 zero-padded to 32); all 11
    variants must still match the oracle."""
    nelmt = 128
    data = b04.prepare(32, 32, nelmt, cfg64)
    assert "s1g" in data, "grouped tier should be active at nq=32"
    ref_norm = float(np.linalg.norm(bwdtrans.reference2d(data["basis"],
                                                         nelmt)))
    for label, fn, args in b04.build_variants(data, cfg64):
        assert variant_norm(fn(*args), data) == pytest.approx(
            ref_norm, rel=1e-10), label
    # sub-threshold orders keep the v-first hybrid
    assert "s1g" not in b04.prepare(16, 16, 128, cfg64)


def test_qp_w_tier(cfg64):
    """100 <= nqTot < 1024 swaps the QP/Shared tier for qp_w (stage-1
    upfront, vreg-accumulated stage-2, sublane-padded w planes); nq=11
    exercises the nq1p=16 zero-row padding path."""
    nelmt = 128
    data = b04.prepare(11, 11, nelmt, cfg64)
    assert "s1g" not in data
    ref_norm = float(
        np.linalg.norm(bwdtrans.reference2d(data["basis"], nelmt)))
    for label, fn, args in b04.build_variants(data, cfg64):
        assert variant_norm(fn(*args), data) == pytest.approx(
            ref_norm, rel=1e-10), label


def test_kron_coalesced_flat_layout(cfg64):
    """The flat (nmTot, E) kron kernel retained alongside the blocked
    Coales tier (kernels/bwdtrans2d.kron_blocked) for layout comparison."""
    from tpu_bench.kernels import bwdtrans2d as pl_bt

    nelmt = 128
    data = b04.prepare(4, 4, nelmt, cfg64)
    ref_norm = float(
        np.linalg.norm(bwdtrans.reference2d(data["basis"], nelmt)))
    out = pl_bt.kron_coalesced(data["in_coa"], data["c_coa"], epb=128,
                               interpret=True)
    assert l2norm(out) == pytest.approx(ref_norm, rel=1e-10)


def test_golden_norm_nq8(cfg64):
    """Reference committed log value (benchmark04/nq8x8.log:3)."""
    data = b04.prepare(8, 8, 128, cfg64)
    _, fn, args = b04.build_variants(data, cfg64)[0]
    assert variant_norm(fn(*args), data) == pytest.approx(29.12205853,
                                                          rel=1e-8)


@pytest.mark.parametrize("nq", [2, 6, 11])
def test_f32_agreement(nq, cfg32):
    """Covers every f32 Coales/QP-ladder regime (the f64 oracle tests now
    dispatch ozaki at the Coales slot): nq=2 VPU kron, nq=6 wide-4D MXU
    kron + qp_shared, nq=11 the qp_w mid-order tier."""
    nelmt = 256
    data = b04.prepare(nq, nq, nelmt, cfg32)
    norms = []
    for label, fn, args in b04.build_variants(data, cfg32):
        norms.append(l2norm(fn(*args)))
    ref = norms[0]
    for label, n in zip(b04.LABELS[1:], norms[1:]):
        assert n == pytest.approx(ref, rel=5e-4), label


def test_high_precision_agreement(cfg32):
    """--precision high: f32 contractions via the hand-built bf16x3 3-pass
    split (kernels/bwdtrans2d._dot — Mosaic rejects Precision.HIGH, so the
    split is built from DEFAULT passes).  Every variant must stay within
    the documented ~1e-5 envelope of the f64 oracle, including the grouped
    MXU kernel the nq=32 frontier lives on."""
    import dataclasses

    import jax

    cfg = dataclasses.replace(cfg32, precision=jax.lax.Precision.HIGH)
    nelmt = 256
    for nq in (6, 32):
        data = b04.prepare(nq, nq, nelmt, cfg)
        ref_norm = float(np.linalg.norm(
            bwdtrans.reference2d(data["basis"], nelmt)))
        for label, fn, args in b04.build_variants(data, cfg):
            got = l2norm(fn(*args))
            assert got == pytest.approx(ref_norm, rel=3e-5), (nq, label)


def test_split_f32_exact():
    """hi + lo must reconstruct f32 exactly (the 3-pass split's invariant)."""
    import jax.numpy as jnp

    from tpu_bench.kernels.bwdtrans2d import _split_f32

    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 128)),
                    dtype=jnp.float32)
    hi, lo = _split_f32(x)
    assert jnp.array_equal(hi + lo, x)


def test_odd_nelmt_padding(cfg64):
    """nelmt not a multiple of 128 must stay correct: padding elements are
    zeroed, so the norm matches the true element count."""
    nelmt = 200
    data = b04.prepare(4, 4, nelmt, cfg64)
    ref_norm = float(np.linalg.norm(bwdtrans.reference2d(data["basis"], nelmt)))
    for label, fn, args in b04.build_variants(data, cfg64):
        got = variant_norm(fn(*args), data)
        assert got == pytest.approx(ref_norm, rel=1e-10), label


def test_bf16_agreement():
    """bf16 halves HBM traffic; norms agree within the bf16 tolerance."""
    import jax.numpy as jnp

    from tpu_bench.core.config import Config
    from tpu_bench.core.validate import l2norm, variant_norm

    cfg = Config(dtype=jnp.bfloat16, n_tests=2)
    data = b04.prepare(4, 4, 128, cfg)
    norms = [l2norm(fn(*args)) for _, fn, args in b04.build_variants(data, cfg)]
    for label, n in zip(b04.LABELS[1:], norms[1:]):
        assert n == pytest.approx(norms[0], rel=5e-2), label


def test_qp_w_flat_gate(cfg32, cfg64):
    """The QP/Shared mid-order slot dispatches the flat-block qp_w where
    the measured plane-occupancy map says the per-plane DMA tax binds
    (artifacts/wall/nq14{c,d}.log): f32 nq=14 -> flat (occupancy 13/16),
    nq=16 -> plane (15/16, tax-free), f64 -> plane (unmeasured tier)."""
    def qp_key(nq, cfg):
        data = b04.prepare(nq, nq, 128, cfg)
        (label, _, keys), = [s for s in b04.variant_specs(data, cfg)
                             if s[0] == "Pallas(QP/Shared)"]
        return keys[0]

    assert qp_key(14, cfg32) == "in_coa"
    assert qp_key(16, cfg32) == "in_pcoa3"
    assert qp_key(14, cfg64) == "in_pcoa3"
