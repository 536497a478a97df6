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

import contextlib
import functools
import math

import jax

from tpu_bench.baselines import reduction as xla_red
from tpu_bench.core import variants
from tpu_bench.core import timing
from tpu_bench.core.config import Config, x64_scope
from tpu_bench.core.reporting import Reporter
from tpu_bench.core.validate import (check_norm_agreement, default_rtol,
                                     measure_checked)
from tpu_bench.kernels import df2stream as df2s
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
    scalar every b01 variant folds in (_chain), not an operand key.

    f64 dispatches the Pallas tier onto the df2 double-float kernels
    (kernels/df2stream.py): the operand is the exact (hi, lo) f32 pair of
    the same bytes ("x2"), the program is pure f32 so it compiles outside
    the x64 scope, and the accumulation is error-free (~2^-48) so norms
    match the XLA f64 columns to ~1e-12."""
    del data
    if cfg.dtype == jnp.float64:
        pal = [
            ("Pallas", jax.jit(functools.partial(
                df2s.sumsq_pair_two_pass, interpret=cfg.interpret)),
             ("x2",)),
            ("Pallas(vl)", jax.jit(functools.partial(
                df2s.sumsq_pair_wide, interpret=cfg.interpret)), ("x2",)),
            ("Pallas(functor)", jax.jit(functools.partial(
                df2s.sumsq_pair_one_pass, interpret=cfg.interpret)),
             ("x2",)),
        ]
    else:
        pal = [
            ("Pallas", jax.jit(functools.partial(
                pl_red.sumsq_two_pass, interpret=cfg.interpret)), ("x",)),
            ("Pallas(vl)", jax.jit(functools.partial(
                pl_red.sumsq_wide, interpret=cfg.interpret)), ("x",)),
            ("Pallas(functor)", jax.jit(functools.partial(
                pl_red.sumsq_functor, interpret=cfg.interpret)), ("x",)),
        ]
    return [
        ("XLA", xla_red.sumsq, ("x",)),
        ("XLA(dot)", xla_red.sumsq_dot, ("x",)),
    ] + pal


def build_variants(data, cfg):
    return variants.materialize(variant_specs(data, cfg), data)


def run_test(size: int, cfg: Config, reporter: Reporter) -> None:
    """Time every variant at one size and emit the log-line triple
    (the run_test<T> analog, benchmark01/benchmark01.cc:183-335).
    f64 runs the XLA tier under SCOPED x64 and the Pallas df2 tier
    outside it (core/config.x64_scope — the global flag would lock every
    Pallas program out of this toolchain)."""
    with x64_scope(cfg.dtype):
        x = initdata.device_x(size, cfg.dtype, pad_to=1024)
        jax.block_until_ready(x)

    def x2():
        # exact (hi, lo) f32 pair of the same bytes; f64 split math needs
        # the scope, the pair itself does not
        with x64_scope(cfg.dtype):
            return df2s.split_pair(x)

    data = variants.Layouts(base={"x": x}, derived={"x2": x2})

    times, norms = [], []
    for label, fn, keys in variant_specs(data, cfg):
        xfree = keys[0] == "x2"
        scope = contextlib.nullcontext() if xfree else x64_scope(cfg.dtype)
        with scope:
            args = tuple(data[k] for k in keys)
            if xfree:
                # df2 pair output: norm = sqrt(hi + lo) combined in host
                # f64; the chain witness only proves completion.  The
                # untimed application compiles at the chain's full-chip
                # scoped-vmem window (timing.call_full_window).
                t, norm = measure_checked(
                    label, fn, args, cfg, reporter, chain_fn=_chain(fn),
                    norm_fn=lambda out: math.sqrt(sum(float(v)
                                                      for v in out)),
                    witness_norm=lambda w, _f=fn, _a=args: math.sqrt(
                        sum(float(v)
                            for v in timing.call_full_window(_f, _a,
                                                             cfg))))
            else:
                # b01's kernel output is the sumsq scalar itself, so its
                # norm is sqrt(out) = witness ** 0.25 (the witness squares
                # the output)
                t, norm = measure_checked(
                    label, fn, args, cfg, reporter, chain_fn=_chain(fn),
                    norm_fn=lambda out: math.sqrt(float(out)),
                    witness_norm=lambda w: w ** 0.25)
            del args
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
