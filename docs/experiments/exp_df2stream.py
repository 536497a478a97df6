"""df2 double-float streaming tier on hardware (VERDICT r4 next #5).

f64 b01 measured 238.8 GB/s (32% of the 757 read ceiling) and f64 b03
458.4 GB/s through XLA's emulated-x64 path.  The df2 kernels
(kernels/df2stream.py) stream the same bytes as the reference's double
loads but do the math as error-free f32 transforms, entirely outside the
x64 scope.  This probe measures them through the production chained
timer against the f64 oracle, at the committed artifact sweep's largest
sizes.

Usage: python docs/experiments/exp_df2stream.py
"""
import os as _os
import sys

sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))

import math

import jax
import numpy as np

import jax._src.config as _jcfg

from tpu_bench.core.config import Config
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.kernels import df2stream as df2s
from tpu_bench.ops import initdata
from tpu_bench.utils import native

assert not jax.config.jax_enable_x64
cfg = Config(n_tests=8)


def chain01(fn):
    def chain_fn(p, x2):
        import jax.numpy as jnp

        return fn(x2, jnp.float32(0.0) * p)
    return chain_fn


# ---- b01 ------------------------------------------------------------------
n = 1 << 28  # 2 GB of f64-equivalent bytes
with _jcfg.enable_x64(True):
    x = initdata.device_x(n, np.float64, pad_to=1024)
    x2 = df2s.split_pair(x)
    del x
ref = math.sqrt(float(np.sum(native.init_mod13(n) ** 2)))
for name, fn in (("two_pass", df2s.sumsq_pair_two_pass),
                 ("wide    ", df2s.sumsq_pair_wide),
                 ("one_pass", df2s.sumsq_pair_one_pass)):
    try:
        t, _ = timing.measure(fn, (x2,), cfg, chain_fn=chain01(fn),
                              with_witness=True)
        got = math.sqrt(sum(
            float(v) for v in timing.call_full_window(fn, (x2,), cfg)))
        err = abs(got - ref) / ref
        print(f"b01 df2 {name} n=2^28  {8e-9 * n / t:7.1f} GB/s  "
              f"rel-err {err:.2e}", flush=True)
    except Exception as ex:
        print(f"b01 df2 {name} FAIL {str(ex).splitlines()[0][:100]}",
              flush=True)
# diagnostic: same one-pass kernel with the df2 square stubbed to a plain
# f32 square (WRONG math, timing only) — separates the square's VPU cost
# from the tree/DMA cost
import jax.numpy as jnp

from tpu_bench.ops import df2 as _df2
_real_sq = _df2.sq
_df2.sq = lambda h, l: (h * h, jnp.zeros_like(h))
try:
    fn = df2s.sumsq_pair_one_pass
    t, _ = timing.measure(fn, (x2,), cfg, chain_fn=chain01(fn),
                          with_witness=True)
    print(f"b01 df2 one_pass PLAIN-SQ diagnostic  {8e-9 * n / t:7.1f} GB/s"
          " (timing only, wrong math)", flush=True)
except Exception as ex:
    print(f"b01 plain-sq diag FAIL {str(ex).splitlines()[0][:100]}",
          flush=True)
finally:
    _df2.sq = _real_sq
del x2

# ---- b02 ------------------------------------------------------------------
n = 1 << 27
with _jcfg.enable_x64(True):
    x2 = df2s.split_pair(initdata.device_x(n, np.float64, pad_to=1024))
    y2 = df2s.split_pair(initdata.device_y(n, np.float64, pad_to=1024))
ref = float(np.linalg.norm(native.init_mod13(n) + native.init_mod8(n)))
for name, fn in (("narrow ", df2s.add_pair),
                 ("wide   ", df2s.add_pair_wide)):
    try:
        t, _ = timing.measure(fn, (x2, y2), cfg,
                              chain_fn=eps_chain(fn, eps_arg=1),
                              with_witness=True)
        got = df2s.pair_sumsq_norm(
            timing.call_full_window(fn, (x2, y2), cfg))
        err = abs(got - ref) / ref
        print(f"b02 df2 {name} n=2^27  {24e-9 * n / t:7.1f} GB/s  "
              f"rel-err {err:.2e}", flush=True)
    except Exception as ex:
        print(f"b02 df2 {name} FAIL {str(ex).splitlines()[0][:100]}",
              flush=True)
del x2, y2

# ---- b03 ------------------------------------------------------------------
m = 16384
with _jcfg.enable_x64(True):
    a = initdata.host_matrix_sin1((m, m), np.float64)
    a2 = df2s.split_pair(a)
    import jax.numpy as jnp

    a2_cm = df2s.split_pair(jnp.asarray(a.T))
    del a
    x2 = df2s.split_pair(initdata.host_x_linear(m, np.float64))
ref = float(np.linalg.norm(native.matvec_ref(
    native.init_sin1(m * m).reshape(m, m), np.arange(m, dtype=np.float64))))
for name, fn, args in (("rm", df2s.matvec_pair_rm, (a2, x2)),
                       ("cm", df2s.matvec_pair_cm, (a2_cm, x2))):
    try:
        t, _ = timing.measure(fn, args, cfg,
                              chain_fn=eps_chain(fn, eps_arg=1),
                              with_witness=True)
        got = df2s.pair_sumsq_norm(
            timing.call_full_window(fn, args, cfg))
        err = abs(got - ref) / ref
        print(f"b03 df2 {name} m={m}  {8e-9 * m * m / t:7.1f} GB/s  "
              f"rel-err {err:.2e}", flush=True)
    except Exception as ex:
        print(f"b03 df2 {name} FAIL {str(ex).splitlines()[0][:100]}",
              flush=True)
