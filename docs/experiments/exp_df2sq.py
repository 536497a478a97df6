"""b01 df2 square-cost probe: single-split square + sloppy tree adds.

The df2 b01 tier measured 456 GB/s wide with the harness-alone (plain
f32 square) diagnostic at 666 (artifacts/wall/df2stream.log) — the gap
is the exact double-float square's VPU cost.  Two candidate cuts, both
still deterministic-error-bounded:

  A  production sq (two_prod splits BOTH factors — identical for a
     square, so one split is redundant) + canonical df2.add tree
  B  single-split square: split hi once (Dekker), p = hi*hi,
     e = (ah*ah - p) + 2*ah*al + al*al + 2*hi*lo — exact, ~12 ops vs 19
  C  B + sloppy tree adds (skip the fast_two_sum renorm; the tree's lo
     term stays a faithful residual — error <= ~2^-24 * |lo| ~ 1e-13
     relative for n = 2^28 positive terms)

Measured on the idle chip AFTER the round-5 f64 queue (solo discipline);
if B/C win materially they land as the production sq/tree next session.

Usage: python docs/experiments/exp_df2sq.py
"""
import os as _os
import sys

sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))

import math

import jax
import jax.numpy as jnp
import numpy as np

import jax._src.config as _jcfg

from tpu_bench.core.config import Config
from tpu_bench.core import timing
from tpu_bench.kernels import df2stream as df2s
from tpu_bench.ops import df2
from tpu_bench.ops import initdata
from tpu_bench.utils import native

assert not jax.config.jax_enable_x64
cfg = Config(n_tests=8)


def sq_single_split(hi, lo):
    # Dekker split of hi ONCE; exact square + the 2*hi*lo cross term
    aa = hi * jnp.float32(4097.0)
    ah = aa - (aa - hi)
    al = hi - ah
    p = hi * hi
    e = ((ah * ah - p) + jnp.float32(2.0) * (ah * al)) + al * al
    return p, e + jnp.float32(2.0) * hi * lo


def add_sloppy(x, y):
    s, e = df2.two_sum(x[0], y[0])
    return s, e + (x[1] + y[1])


def chain01(fn):
    def chain_fn(p, x2):
        return fn(x2, jnp.float32(0.0) * p)
    return chain_fn


n = 1 << 28
with _jcfg.enable_x64(True):
    x2 = df2s.split_pair(initdata.device_x(n, np.float64, pad_to=1024))
ref = math.sqrt(float(np.sum(native.init_mod13(n) ** 2)))

real_sq, real_add = df2.sq, df2.add
variants = [("A prod ", real_sq, real_add),
            ("B 1split", sq_single_split, real_add),
            ("C sloppy", sq_single_split, add_sloppy)]
for name, sq_fn, add_fn in variants:
    df2.sq, df2.add = sq_fn, add_fn
    try:
        fn = df2s.sumsq_pair_wide
        t, _ = timing.measure(fn, (x2,), cfg, chain_fn=chain01(fn),
                              with_witness=True)
        got = math.sqrt(sum(
            float(v) for v in timing.call_full_window(fn, (x2,), cfg)))
        err = abs(got - ref) / ref
        print(f"{name} wide n=2^28  {8e-9 * n / t:7.1f} GB/s  "
              f"rel-err {err:.2e}", flush=True)
    except Exception as ex:
        print(f"{name} FAIL {str(ex).splitlines()[0][:110]}", flush=True)
    finally:
        df2.sq, df2.add = real_sq, real_add
