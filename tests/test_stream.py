"""Manual-DMA streaming kernels (kernels/stream.py) + roofline math."""

import numpy as np
import pytest
import jax.numpy as jnp

from tpu_bench.core import roofline
from tpu_bench.kernels import stream


def _x(n, dtype=jnp.float32):
    return jnp.arange(n, dtype=dtype) % 13


@pytest.mark.parametrize("n,chunk_bytes", [
    (128 * 8, 1 << 20),      # single chunk (cr capped at rows)
    (128 * 64, 8 * 128 * 4),  # 8 chunks > depth
    (128 * 24, 8 * 128 * 4),  # 3 chunks == depth
])
def test_add_inplace_manual(n, chunk_bytes):
    x, y = _x(n), jnp.full((n,), 2.0, jnp.float32)
    out = stream.add_inplace_manual(x, y, chunk_bytes=chunk_bytes,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) + 2.0,
                               rtol=1e-6)


def test_copy_scale_triad_manual():
    n = 128 * 32
    cb = 8 * 128 * 4
    x = _x(n)
    c = jnp.full((1, 1), 3.0, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(stream.copy_manual(x, chunk_bytes=cb, interpret=True)),
        np.asarray(x))
    np.testing.assert_allclose(
        np.asarray(stream.scale_manual(x, c, chunk_bytes=cb, interpret=True)),
        np.asarray(x) * 3.0, rtol=1e-6)
    y = jnp.full((n,), 2.0, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(stream.triad_manual(x, y, c, chunk_bytes=cb,
                                       interpret=True)),
        np.asarray(x) + 6.0, rtol=1e-6)


def test_fill():
    out = stream.fill(64, jnp.full((1, 1), 5.0, jnp.float32),
                      interpret=True)
    assert out.shape == (64, 128)
    np.testing.assert_allclose(np.asarray(out), 5.0)


def test_fill_manual():
    out = stream.fill_manual(64, jnp.full((1, 1), 5.0, jnp.float32),
                             chunk_bytes=8 * 128 * 4, interpret=True)
    assert out.shape == (64, 128)
    np.testing.assert_allclose(np.asarray(out), 5.0)


def test_read_manual_token():
    n = 128 * 32
    x = _x(n)
    tok = stream.read_manual(x, chunk_bytes=8 * 128 * 4, interpret=True)
    assert tok.shape == (8, 128)
    # token is the first 8 rows of the LAST chunk cycled into slot 0
    bias = jnp.full((1, 1), 2.5, jnp.float32)
    tok_b = stream.read_manual(x, bias, chunk_bytes=8 * 128 * 4,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(tok_b), np.asarray(tok) + 2.5)


def test_add_manual_f64():
    n = 128 * 16
    x = _x(n, jnp.float64)
    y = jnp.full((n,), 0.5, jnp.float64)
    out = stream.add_inplace_manual(x, y, chunk_bytes=4 * 128 * 8,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) + 0.5,
                               rtol=1e-12)


# ---- roofline derivations ------------------------------------------------


def test_mixed_bandwidth_limits():
    # equal directional rates -> the shared-bus mix saturates at that rate
    assert roofline.mixed_bandwidth(700.0, 700.0, 2, 1) == pytest.approx(700)
    # pure directions
    assert roofline.mixed_bandwidth(733.0, 643.0, 1, 0) == 733.0
    assert roofline.mixed_bandwidth(733.0, 643.0, 0, 1) == 643.0
    # shared-bus mixed is between the directional rates
    add = roofline.stream_add_ceiling(733.0, 643.0)
    assert 643.0 < add < 733.0
    # hand check: 3 / (2/733 + 1/643)
    assert add == pytest.approx(3 / (2 / 733.0 + 1 / 643.0))
    # full-duplex bound is always >= shared-bus
    add_d = roofline.stream_add_ceiling(733.0, 643.0, duplex=True)
    assert add_d == pytest.approx(3 / (2 / 733.0))
    assert add_d > add


def test_bwdtrans_ceiling_hand_check():
    # b05 nq=4 f32: 27 reads + 64 writes of 4 B per element, 27 DOF
    r_b, w_b = 27 * 4, 64 * 4
    bw = (r_b + w_b) / (r_b / 733.0 + w_b / 643.0)
    want = bw / ((r_b + w_b) / 27)
    got = roofline.bwdtrans_ceiling_gdofs(733.0, 643.0, 4, 3, 4)
    assert got == pytest.approx(want)
    # higher nq streams fewer bytes per DOF -> higher ceiling
    assert (roofline.bwdtrans_ceiling_gdofs(733, 643, 8, 3, 4)
            > roofline.bwdtrans_ceiling_gdofs(733, 643, 4, 3, 4))


def test_committed_ceilings_artifact():
    """The committed ceilings log must carry a parseable JSON summary with
    physically sane directional rates (used by the honesty test and the
    README table generator)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "ceilings", "ceilings.log")
    if not os.path.exists(path):
        pytest.skip("ceilings artifact not generated yet")
    summary = None
    with open(path) as f:
        for line in f:
            if line.startswith("{"):
                summary = json.loads(line)
    assert summary, "no JSON summary line"
    for key in ("read", "write", "add_3x"):
        assert key in summary, key
    # v5e: reads near nominal 819, writes below, nothing wildly above
    assert 500 < summary["write"] <= summary["read"] < 900
    assert summary["add_3x"] < 3 * summary["read"]


def test_ceilings_derived_table():
    from tpu_bench.benchmarks import ceilings

    bw = {"read": 733.0, "write": 643.0}
    rows = ceilings.derived_table(bw)
    names = [r[0] for r in rows]
    assert any("b02" in n for n in names)
    assert sum("b04" in n for n in names) == 9
    assert sum("b05" in n for n in names) == 5
    for _, shared, duplex, _ in rows:
        assert 0 < shared <= duplex * (1 + 1e-12)
