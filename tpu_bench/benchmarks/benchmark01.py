"""Benchmark 01 — L2-norm reduction sqrt(sum x_i^2).

Reference: benchmark01/benchmark01.cc (harness :183-335, sweep :343).
Five variants; GB/s counts 1x read traffic: sizeof(T)*1e-9*size/t (:330-334).
Sweep: size = 1024 .. 536870912 (x2).  Norm printed is sqrt(sum x^2).

Variant mapping (reference tier -> TPU-native tier):
  Kokkos parallel_reduce      -> XLA jnp.sum(x*x)
  thrust::transform_reduce    -> XLA self-dot contraction
  CUDA scalar 2-kernel        -> Pallas two-pass (partials + reduce)
  CUDA float4 vector loads    -> Pallas one-pass, 1024-lane rows
  CUDA functor reduceSum      -> Pallas generic transform-reduce functor
"""

from __future__ import annotations

import functools
import math

import jax

from tpu_bench.baselines import reduction as xla_red
from tpu_bench.core import variants
from tpu_bench.core.config import Config, x64_scope
from tpu_bench.core.reporting import Reporter
from tpu_bench.core.validate import (check_norm_agreement, default_rtol,
                                     measure_checked)
from tpu_bench.kernels import reduction as pl_red
from tpu_bench.ops import initdata

import jax.numpy as jnp


def _chain(fn):
    """Chained-timing step: thread the probe through the eps scalar, which
    every b01 variant folds into its transform at zero memory cost."""

    def chain_fn(p, x):
        return fn(x, jnp.float32(0.0) * p)

    return chain_fn

LABELS = ["XLA", "XLA(dot)", "Pallas", "Pallas(vl)", "Pallas(functor)"]


def variant_specs(data, cfg):
    """Ordered (label, fn, operand keys) — core/variants.py convention.
    One streaming operand; the chained probe threads through the eps
    scalar every b01 variant folds in (_chain), not an operand key."""
    del data
    return [
        ("XLA", xla_red.sumsq, ("x",)),
        ("XLA(dot)", xla_red.sumsq_dot, ("x",)),
        ("Pallas", jax.jit(functools.partial(
            pl_red.sumsq_two_pass, interpret=cfg.interpret)), ("x",)),
        ("Pallas(vl)", jax.jit(functools.partial(
            pl_red.sumsq_wide, interpret=cfg.interpret)), ("x",)),
        ("Pallas(functor)", jax.jit(functools.partial(
            pl_red.sumsq_functor, interpret=cfg.interpret)), ("x",)),
    ]


def build_variants(data, cfg):
    return variants.materialize(variant_specs(data, cfg), data)


def run_test(size: int, cfg: Config, reporter: Reporter) -> None:
    """Time every variant at one size and emit the log-line triple
    (the run_test<T> analog, benchmark01/benchmark01.cc:183-335).
    f64 runs under scoped x64 (core/config.x64_scope) so the process
    never sets the global flag that locks Pallas out of this toolchain."""
    with x64_scope(cfg.dtype):
        _run_test(size, cfg, reporter)


def _run_test(size: int, cfg: Config, reporter: Reporter) -> None:
    x = initdata.device_x(size, cfg.dtype, pad_to=1024)
    jax.block_until_ready(x)
    data = {"x": x}

    times, norms = [], []
    for label, fn, args in build_variants(data, cfg):
        # b01's kernel output is the sumsq scalar itself, so its norm is
        # sqrt(out) = witness ** 0.25 (the witness squares the output)
        t, norm = measure_checked(
            label, fn, args, cfg, reporter, chain_fn=_chain(fn),
            norm_fn=lambda out: math.sqrt(float(out)),
            witness_norm=lambda w: w ** 0.25)
        times.append(t)
        norms.append(norm)

    if cfg.validate:
        for msg in check_norm_agreement(LABELS, norms, default_rtol(cfg.dtype),
                                        context=f"b01 size={size}"):
            reporter.note("WARNING: " + msg)

    gbs = [cfg.itemsize * 1e-9 * size / t for t in times]
    reporter.emit("Size", size, LABELS, norms, gbs, "GB/s")


def main(argv=None):
    from tpu_bench.benchmarks import cli

    args = cli.build_parser("benchmark01").parse_args(argv)
    cfg = Config.from_flags(args)
    reporter = Reporter("Benchmark01 : L2 norm reduction")
    cap = cfg.mem_cap_bytes
    with cli.profiled(args):
        for size in cli.sweep(1024, 536870912, args):
            if size * cfg.itemsize > cap:
                reporter.note(f"b01: stopping sweep at size {size} (memory cap)")
                break
            cli.guarded(reporter, "b01", size, run_test, size, cfg, reporter)


if __name__ == "__main__":
    main()
