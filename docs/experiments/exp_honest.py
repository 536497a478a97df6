"""Experiment: defeat VMEM residency in chained timing (VERDICT r1 #1).

Chained timing loops the kernel in a fori_loop; XLA's memory-space
assignment (MSA) keeps small loop-carried/invariant buffers resident in
VMEM across iterations, so sub-VMEM working sets report on-chip bandwidth
(e.g. 2932 GB/s at 128Ki f32 elements vs the 819 GB/s HBM peak).

This probes per-compile XLA TPU options that could force HBM traffic per
iteration, measuring a b02-style x+=y chain at a small (inflated) size and
a large (honest) size.
"""
import sys
import time

import jax
import jax.numpy as jnp

SMALL = 131072      # 0.5 MB working set -> inflated in r1 (2932 GB/s)
MID = 8 * 2**20     # 32 MB
LARGE = 128 * 2**20 # 512 MB -> honest (~686 GB/s)


def build(size, options):
    def step(k, x, y):
        out = jax.lax.fori_loop(0, k, lambda i, xx: xx + y, x)
        return jnp.sum(out)

    x = jnp.ones((size,), jnp.float32)
    y = jnp.full((size,), 1e-9, jnp.float32)
    lowered = jax.jit(step).lower(jnp.int32(1), x, y)
    if options:
        comp = lowered.compile(compiler_options=options)
    else:
        comp = lowered.compile()
    return comp, x, y


def measure(size, options):
    comp, x, y = build(size, options)
    float(comp(jnp.int32(1), x, y))  # warm

    def best_of(k, reps=5):
        kk = jnp.int32(k)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(comp(kk, x, y))
            best = min(best, time.perf_counter() - t0)
        return best

    k_hi = 64
    while True:
        k_lo = max(1, k_hi // 8)
        t_lo = best_of(k_lo)
        t_hi = best_of(k_hi)
        diff = t_hi - t_lo
        if diff > 8e-3 or t_hi > 2.0 or k_hi >= (1 << 20):
            break
        k_hi *= 8
    per = diff / (k_hi - k_lo)
    gbs = 3 * 4 * 1e-9 * size / per
    return gbs


CANDIDATES = [
    ("baseline", None),
    ("mblo_off", {"xla_tpu_memory_bound_loop_optimizer_options": "enabled:false"}),
    ("msa_off1", {"xla_tpu_enable_memory_space_assignment": False}),
    ("msa_off2", {"xla_tpu_memory_space_assignment": False}),
    ("alt_benefit0", {"xla_tpu_alternate_memory_benefit_scaling_factor": 0.0}),
    ("async_copies0", {"xla_tpu_msa_max_outstanding_async_copies": 0}),
    ("licm0", {"xla_tpu_licm_size_inflation_ratio": 0.0}),
]


def main():
    for name, opts in CANDIDATES:
        for label, size in [("small", SMALL), ("mid", MID)]:
            try:
                gbs = measure(size, opts)
                print(f"{name:16s} {label:6s} {gbs:9.1f} GB/s", flush=True)
            except Exception as ex:
                msg = str(ex).splitlines()[0][:160]
                print(f"{name:16s} {label:6s} FAILED: {msg}", flush=True)
                break  # bad flag: skip the other size


if __name__ == "__main__":
    main()
