"""Round-2 tooling: honest-timing options, lazy Layouts, README table."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_bench.core import timing
from tpu_bench.ops import bwdtrans


def test_honest_options_off_tpu(cfg32):
    # CPU test runs: no TPU backend -> no compiler options (chained mode
    # off-TPU has no VMEM to starve)
    assert timing.honest_options(cfg32) is None
    assert timing.honest_options(None) is None


def test_honest_options_respects_optout(cfg32):
    import dataclasses

    cfg = dataclasses.replace(cfg32, hbm_honest=False)
    assert timing.honest_options(cfg) is None


def test_layouts_lazy_and_replace():
    calls = []

    def make():
        calls.append(1)
        return np.arange(4)

    lay = bwdtrans.Layouts(base={"a": 7}, derived={"d": make})
    assert lay["a"] == 7
    assert "a" in lay and "d" in lay and "x" not in lay
    d1, d2 = lay["d"], lay["d"]
    assert len(calls) == 2  # fresh per access, never cached
    np.testing.assert_array_equal(d1, d2)

    lay2 = lay.replace(a=9)
    assert lay2["a"] == 9 and lay["a"] == 7
    assert "d" in lay2


def test_readme_table_parses_committed_logs():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import readme_table

    root = os.path.join(os.path.dirname(__file__), "..")
    rows = readme_table.parse_log(
        os.path.join(root, "artifacts/b01/outfile.log"))
    assert rows and all(len(r[1]) == len(r[2]) == 5 for r in rows)
    v, lab, size = readme_table.peak(
        os.path.join(root, "artifacts/b05/nq8x8x8.log"))
    assert v > 0 and size > 0 and lab


def test_witness_sumsq_matches_l2norm():
    from tpu_bench.core.validate import l2norm

    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 1 << 17)),
                    dtype=jnp.float32)
    w = float(timing._witness_sumsq(x))
    assert np.sqrt(w) == pytest.approx(l2norm(x), rel=1e-6)
    # tuple outputs use the first element (pallas multi-output kernels)
    w2 = float(timing._witness_sumsq((x, None)))
    assert w2 == pytest.approx(w)
