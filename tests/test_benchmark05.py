"""b05 correctness: all 11 variants vs the f64 oracle + the reference-log
golden norm (benchmark05/nq8x8x8.log: nelmt 128 norm 189.3141665)."""

import numpy as np
import pytest

from tpu_bench.benchmarks import benchmark05 as b05
from tpu_bench.core.validate import l2norm, variant_norm
from tpu_bench.ops import bwdtrans


@pytest.mark.parametrize("nq", [2, 3, 6])
def test_variants_match_oracle(nq, cfg64):
    nelmt = 128
    data = b05.prepare(nq, nq, nq, nelmt, cfg64)
    ref = bwdtrans.reference3d(data["basis"], nelmt)
    ref_norm = float(np.linalg.norm(ref))
    for label, fn, args in b05.build_variants(data, cfg64):
        out = fn(*args)
        assert variant_norm(out, data) == pytest.approx(
            ref_norm, rel=1e-10), label
        if label == "XLA(Uncoales)":
            np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-9)


def test_mixed_nq(cfg64):
    """Anisotropic quadrature orders exercise the index bookkeeping."""
    data = b05.prepare(3, 4, 5, 128, cfg64)
    ref_norm = float(np.linalg.norm(bwdtrans.reference3d(data["basis"], 128)))
    for label, fn, args in b05.build_variants(data, cfg64):
        assert variant_norm(fn(*args), data) == pytest.approx(
            ref_norm, rel=1e-10), label


def test_golden_norm_nq8(cfg64):
    """Reference committed log value (benchmark05/nq8x8x8.log:3)."""
    data = b05.prepare(8, 8, 8, 128, cfg64)
    _, fn, args = b05.build_variants(data, cfg64)[0]
    assert variant_norm(fn(*args), data) == pytest.approx(189.3141665,
                                                          rel=1e-8)


@pytest.mark.parametrize("nq", [2, 4, 8])
def test_f32_agreement(nq, cfg32):
    """Covers every f32 Coales-ladder regime (the f64 oracle tests now
    dispatch ozaki there): nq=2 VPU kron, nq=4 wide-4D MXU kron, nq=8
    flat blocked kron + the fused QP kernels."""
    data = b05.prepare(nq, nq, nq, 256, cfg32)
    norms = [l2norm(fn(*args)) for _, fn, args in b05.build_variants(data, cfg32)]
    for label, n in zip(b05.LABELS[1:], norms[1:]):
        assert n == pytest.approx(norms[0], rel=5e-4), label


def test_coales_tier_dispatch(cfg32, cfg64):
    """The 3D Pallas(Coales) tier is a three-way dispatch on measured
    regimes (artifacts/wall/{nq2wall,lo3d}.log): unrolled VPU kron at
    nq=2^3 (nmTot*nqTot <= VPU_KRON_MAX), wide-4D blocked MXU kron where
    its VMEM-budgeted chunk stays >= 8192 elements, flat blocked GEMM
    beyond.  The gate is shape-only, so a column never flips kernels
    mid-sweep."""
    def coales_key(nq, cfg):
        data = b05.prepare(nq, nq, nq, 128, cfg)
        specs = b05.variant_specs(data, cfg)
        (label, _, keys), = [s for s in specs if s[0] == "Pallas(Coales)"]
        return keys[0]

    assert coales_key(2, cfg32) == "in_blk_wide"   # VPU expansion regime
    assert coales_key(4, cfg32) == "in_blk_w4"     # measured wide4 win
    assert coales_key(6, cfg32) == "in_blk_w4"     # measured wide4 win
    assert coales_key(8, cfg32) == "in_blk"        # chunk < 8192: unmeasured
    # f64: Mosaic has no float64, so every direct kernel is uncompilable —
    # the tier dispatches the exact split-mantissa MXU form instead
    # (kernels/ozaki.py), whose operands BOTH arrive host-split
    # (split_f64_np) so the program is x64-free end to end
    assert coales_key(4, cfg64) == "in_slices"
    assert coales_key(6, cfg64) == "in_slices"


def test_bf16_f32v_accuracy():
    """The fused QP kernel accumulates its v combine in f32 vregs (the
    measured bf16 unit-wall fix, round4.md par. 8): with bf16 inputs the
    only rounding left in the combine is the per-plane input cast, so
    the norm error vs the f64 oracle stays well inside the single-cast
    bf16 bound.  Locks the acc-dtype semantics against regression to a
    bf16-native combine: measured in interpret mode at this shape the
    f32v error is 2.9e-4 vs 9.7e-4 native, so the 5e-4 bound fails the
    old semantics with margin (on chip the gap was 29x)."""
    import jax.numpy as jnp

    from tpu_bench.core.config import Config
    from tpu_bench.kernels import bwdtrans3d as pl_bt

    cfg = Config(dtype=jnp.bfloat16, n_tests=2)
    nq, nelmt = 6, 256
    data = b05.prepare(nq, nq, nq, nelmt, cfg)
    ref_norm = float(np.linalg.norm(bwdtrans.reference3d(data["basis"],
                                                         nelmt)))
    out = pl_bt.qp_shared3d(data["in_pcoa3"], data["b0"], data["c12t"],
                            epb=128, interpret=True,
                            precision=cfg.precision)
    assert l2norm(out) == pytest.approx(ref_norm, rel=5e-4)


@pytest.mark.parametrize("nq,dtype", [(4, "float32"), (8, "float32"),
                                      (6, "bfloat16")])
def test_qp_shared3d_flat_bit_exact(nq, dtype):
    """qp_shared3d_flat is the same v-first math as qp_shared3d off flat
    (nm0*nrq, E) blocks (in-kernel plane slicing removes the per-plane
    DMA occupancy tax, exp_flat3d.py) — outputs must agree bit-for-bit."""
    import jax.numpy as jnp

    from tpu_bench.core.config import Config
    from tpu_bench.kernels import bwdtrans3d as pl_bt

    cfg = Config(dtype=jnp.dtype(dtype), n_tests=2)
    data = b05.prepare(nq, nq, nq, 256, cfg)
    basis = data["basis"]
    nrq = basis.nm2 * basis.nm1
    ref = pl_bt.qp_shared3d(data["in_pcoa3"], data["b0"], data["c12t"],
                            epb=128, interpret=True,
                            precision=cfg.precision)
    flat = pl_bt.qp_shared3d_flat(
        data["in_pcoa3"].reshape(basis.nm0 * nrq, -1), data["b0"],
        data["c12t"], nrq=nrq, epb=128, interpret=True,
        precision=cfg.precision)
    np.testing.assert_array_equal(
        np.asarray(ref).reshape(flat.shape), np.asarray(flat))


def test_qp_shared_tier_dispatch(cfg32, cfg64):
    """The f32 QP/Shared tier dispatches the flat-block kernel wherever a
    plane pays the measured sublane-padding tax inside the measured band
    (artifacts/wall/flat3d.log: nq=6^3/8^3/10^3 all win; nq=2^3/4^3 planes
    are too short to amortize the in-kernel slices and keep the plane
    form, as do non-f32 dtypes)."""
    def qp_key(nq, cfg):
        data = b05.prepare(nq, nq, nq, 128, cfg)
        specs = b05.variant_specs(data, cfg)
        (_, _, keys), = [s for s in specs if s[0] == "Pallas(QP/Shared)"]
        return keys[0]

    assert qp_key(6, cfg32) == "in_pflat"
    assert qp_key(8, cfg32) == "in_pflat"
    assert qp_key(10, cfg32) == "in_pflat"
    assert qp_key(4, cfg32) == "in_pcoa3"   # below the measured band
    assert qp_key(8, cfg64) == "in_pcoa3"   # non-f32: unmeasured
