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


def _inputs(size, dtype):
    import jax.numpy as jnp

    a = initdata.host_matrix_sin1((size, size), dtype)
    return a, jnp.asarray(a.T), initdata.host_x_linear(size, dtype)


@pytest.mark.parametrize("size", [128, 256])
def test_variants_match_oracle(size, cfg64):
    a, a_t, x = _inputs(size, cfg64.dtype)
    expected = native.matvec_ref(np.asarray(a), np.asarray(x))
    for v in b03.VARIANTS:
        fn, layout = v.build(None, cfg64)
        y = np.asarray(fn(a_t if layout == "cm" else a, x))
        np.testing.assert_allclose(y, expected, rtol=1e-10, err_msg=v.label)


@pytest.mark.parametrize("size,norm", sorted(GOLDEN_NORMS.items()))
def test_golden_norms(size, norm, cfg64):
    a, a_t, x = _inputs(size, cfg64.dtype)
    fn, _ = b03.VARIANTS[1].build(None, cfg64)
    assert l2norm(fn(a, x)) == pytest.approx(norm, rel=1e-9)


def test_f32_accuracy(cfg32):
    size = 512
    a, a_t, x = _inputs(size, cfg32.dtype)
    expected = native.matvec_ref(np.asarray(a, np.float64),
                                 np.asarray(x, np.float64))
    ref_norm = float(np.linalg.norm(expected))
    for v in b03.VARIANTS:
        fn, layout = v.build(None, cfg32)
        got = l2norm(fn(a_t if layout == "cm" else a, x))
        assert got == pytest.approx(ref_norm, rel=1e-5), v.label
