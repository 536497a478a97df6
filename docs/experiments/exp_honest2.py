"""Round 2: starve MSA's alternate-memory pool via scoped-vmem limit."""
import sys, time
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax, functools
import jax.numpy as jnp
from tpu_bench.kernels import axpy as pl_axpy

SMALL = 131072
MID = 8 * 2**20

def build(size, options, use_pallas):
    if use_pallas:
        f = jax.jit(functools.partial(pl_axpy.add_inplace_wide, interpret=False))
        body = lambda i, xx: f(xx, y_ref[0])
    f = (functools.partial(pl_axpy.add_inplace_wide, interpret=False)
         if use_pallas else (lambda a, b: a + b))
    def step(k, x, y):
        out = jax.lax.fori_loop(0, k, lambda i, xx: f(xx, y), x)
        return jnp.sum(out)
    x = jnp.ones((size,), jnp.float32)
    y = jnp.full((size,), 1e-9, jnp.float32)
    lowered = jax.jit(step).lower(jnp.int32(1), x, y)
    comp = lowered.compile(compiler_options=options) if options else lowered.compile()
    return comp, x, y

def measure(size, options, use_pallas=False):
    comp, x, y = build(size, options, use_pallas)
    float(comp(jnp.int32(1), x, y))
    def best_of(k, reps=5):
        kk = jnp.int32(k); best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); float(comp(kk, x, y))
            best = min(best, time.perf_counter() - t0)
        return best
    k_hi = 64
    while True:
        k_lo = max(1, k_hi // 8)
        t_lo = best_of(k_lo); t_hi = best_of(k_hi); diff = t_hi - t_lo
        if diff > 8e-3 or t_hi > 2.0 or k_hi >= (1 << 20): break
        k_hi *= 8
    per = diff / (k_hi - k_lo)
    return 3 * 4 * 1e-9 * size / per

CANDS = [
    ("scoped112M", {"xla_tpu_scoped_vmem_limit_kib": 114688}),
    ("scoped64M", {"xla_tpu_scoped_vmem_limit_kib": 65536}),
    ("scoped112+mblo", {"xla_tpu_scoped_vmem_limit_kib": 114688,
        "xla_tpu_memory_bound_loop_optimizer_options": "enabled:false"}),
]
for name, opts in CANDS:
    for label, size in [("small", SMALL), ("mid", MID)]:
        try:
            print(f"{name:16s} {label:6s} xla    {measure(size, opts):9.1f} GB/s", flush=True)
        except Exception as ex:
            print(f"{name:16s} {label:6s} FAILED: {str(ex).splitlines()[0][:140]}", flush=True)
            break
# pallas probe with the best candidate
for name, opts in [("baseline", None), ("scoped112M", {"xla_tpu_scoped_vmem_limit_kib": 114688})]:
    for label, size in [("small", SMALL), ("mid", MID)]:
        try:
            print(f"{name:16s} {label:6s} pallas {measure(size, opts, True):9.1f} GB/s", flush=True)
        except Exception as ex:
            print(f"{name:16s} {label:6s} pallas FAILED: {str(ex).splitlines()[0][:140]}", flush=True)
            break
