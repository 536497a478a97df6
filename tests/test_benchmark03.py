"""b03 correctness: variants vs the f64 matvec oracle + reference-log golden
norms (benchmark03/outfile.log)."""

import numpy as np
import pytest

from tpu_bench.benchmarks import benchmark03 as b03
from tpu_bench.core.validate import l2norm
from tpu_bench.ops import initdata
from tpu_bench.utils import native

# ||A.x|| from /root/reference/benchmark03/outfile.log:5,8
GOLDEN_NORMS = {128: 1053.208334, 256: 3026.150384, 512: 8521.062683}


def _data(size, dtype):
    import jax.numpy as jnp

    from tpu_bench.kernels import df2stream as df2s

    a = initdata.host_matrix_sin1((size, size), dtype)
    a_t = jnp.asarray(a.T)
    x = initdata.host_x_linear(size, dtype)
    d = {"a_rm": a, "a_cm": a_t, "x": x}
    if jnp.dtype(dtype) == jnp.float64:
        d.update(a2_rm=df2s.split_pair(a), a2_cm=df2s.split_pair(a_t),
                 x2=df2s.split_pair(x))
    return d


def _as_f64(y):
    """Variant output -> f64 vector (df2 pairs recombine in NumPy f64)."""
    if isinstance(y, (tuple, list)):
        return np.asarray(y[0], np.float64) + np.asarray(y[1], np.float64)
    return np.asarray(y)


@pytest.mark.parametrize("size", [128, 256])
def test_variants_match_oracle(size, cfg64):
    data = _data(size, cfg64.dtype)
    expected = native.matvec_ref(np.asarray(data["a_rm"]),
                                 np.asarray(data["x"]))
    for label, fn, args in b03.build_variants(data, cfg64):
        y = _as_f64(fn(*args))
        np.testing.assert_allclose(y, expected, rtol=1e-10, err_msg=label)


@pytest.mark.parametrize("size,norm", sorted(GOLDEN_NORMS.items()))
def test_golden_norms(size, norm, cfg64):
    data = _data(size, cfg64.dtype)
    _, fn, args = b03.build_variants(data, cfg64)[1]
    assert l2norm(fn(*args)) == pytest.approx(norm, rel=1e-9)


def test_labels_match_specs(cfg32):
    assert [s[0] for s in b03.variant_specs(None, cfg32)] == b03.LABELS


def test_f32_accuracy(cfg32):
    size = 512
    data = _data(size, cfg32.dtype)
    expected = native.matvec_ref(np.asarray(data["a_rm"], np.float64),
                                 np.asarray(data["x"], np.float64))
    ref_norm = float(np.linalg.norm(expected))
    for label, fn, args in b03.build_variants(data, cfg32):
        got = l2norm(fn(*args))
        assert got == pytest.approx(ref_norm, rel=1e-5), label
