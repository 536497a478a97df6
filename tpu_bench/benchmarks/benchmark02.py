"""Benchmark 02 — streaming vector addition x += y (STREAM-add-like).

Reference: benchmark02/benchmark02.cc (harness :73-260, sweep like b01).
Five variants; GB/s counts 2 reads + 1 write: 3*sizeof(T)*1e-9*size/t
(:255-259).  NOTE the reference's validation norm is computed AFTER the 40
timed repetitions, i.e. it is ||x0 + 40*y|| (:161-164) — the validation pass
here applies exactly cfg.n_tests accumulating additions to a fresh x so the
printed norms stay comparable with the committed reference logs.

x += y chains naturally (each rep reads the previous x), so chained timing
needs no optimization_barrier: the fori_loop body IS the steady-state kernel.

Variant mapping:
  Kokkos parallel_for   -> XLA add with x donated (true in-place)
  thrust::transform     -> XLA functional add
  CUDA scalar           -> Pallas in-place add, (rows, 128) tiles
  CUDA float4/double2   -> manual-DMA ring pipeline, 16 MB chunks
                           (kernels/stream.py: hand transaction control;
                           committed peak 690.7 GB/s, artifacts/b02 —
                           the exp_b02g sweep read 703 under different
                           conditions — vs ~680 for the automatic
                           pipeline)
  CUDA functor kernel   -> Pallas generic map2 functor
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp

from tpu_bench.baselines import axpy as xla_axpy
from tpu_bench.core import variants
from tpu_bench.core.config import Config, x64_scope
from tpu_bench.core.reporting import Reporter
from tpu_bench.core.timing import honest_options, sync_latency, time_chained
from tpu_bench.core.validate import (check_norm_agreement, default_rtol,
                                     fail_soft, l2norm)
from tpu_bench.kernels import axpy as pl_axpy
from tpu_bench.kernels import df2stream as pl_df2
from tpu_bench.kernels import stream as pl_stream
from tpu_bench.ops import initdata


def _pallas(fn, cfg):
    """jit a Pallas add variant (by pl_axpy name or callable) with x
    donated — true in-place semantics for the timing loop."""
    if isinstance(fn, str):
        fn = getattr(pl_axpy, fn)
    return jax.jit(functools.partial(fn, interpret=cfg.interpret),
                   donate_argnums=(0,))


LABELS = ["XLA(donate)", "XLA", "Pallas", "Pallas(vl)", "Pallas(functor)"]


def variant_specs(data, cfg):
    """Ordered (label, fn, operand keys) — core/variants.py convention.
    The "x" key is a lazy derived entry (fresh per access): the donated
    in-place variants consume their input, so each timing/validation pass
    needs its own copy.

    f64 dispatches the Pallas tier onto the df2 double-float kernels
    (kernels/df2stream.py): x and y stream as exact (hi, lo) f32 pairs —
    the same 24 bytes per element (2R + 1W) as the reference's double
    x[i] += y[i] — and the program is pure f32, compiling outside the
    x64 scope.  The manual-DMA ring (stream.py) is f32-only; the vl slot
    uses the 2 MB-block df2 add (the same DMA-granularity axis)."""
    del data
    if cfg.dtype == jnp.float64:
        pal = [
            ("Pallas", _pallas(pl_df2.add_pair, cfg), ("x2", "y2")),
            ("Pallas(vl)", _pallas(pl_df2.add_pair_wide, cfg),
             ("x2", "y2")),
            ("Pallas(functor)", _pallas(pl_df2.map2_pair, cfg),
             ("x2", "y2")),
        ]
    else:
        pal = [
            ("Pallas", _pallas("add_inplace", cfg), ("x", "y")),
            ("Pallas(vl)", jax.jit(
                functools.partial(pl_stream.add_inplace_manual,
                                  interpret=cfg.interpret),
                donate_argnums=(0,)), ("x", "y")),
            ("Pallas(functor)", _pallas("map2_inplace", cfg), ("x", "y")),
        ]
    return [
        ("XLA(donate)", xla_axpy.add_donated, ("x", "y")),
        ("XLA", xla_axpy.add, ("x", "y")),
    ] + pal


def build_variants(data, cfg):
    return variants.materialize(variant_specs(data, cfg), data)


def _accum_chain(fn):
    """run_k(k, x, y): k accumulating in-place additions, scalar probe out."""

    @jax.jit
    def run_k(k, x, y):
        out = jax.lax.fori_loop(0, k, lambda i, xx: fn(xx, y), x)
        # sum (not a single element) so XLA cannot slice-propagate the
        # probe through the loop and elide the streaming work; df2 pair
        # carries sum both halves (both must stay live)
        if isinstance(out, (tuple, list)):
            return sum(jnp.sum(o.astype(jnp.float32)) for o in out)
        return jnp.sum(out.astype(jnp.float32))

    return run_k


def _accum_apply(fn):
    """apply_n(k, x, y): k accumulating additions, returns the final x."""

    @jax.jit
    def apply_n(k, x, y):
        return jax.lax.fori_loop(0, k, lambda i, xx: fn(xx, y), x)

    return apply_n


def _time_accumulating(fn, cfg, data, xkey="x", ykey="y"):
    """Time one x += y application; return (seconds, x_after_n_tests_reps).
    data[xkey] yields a FRESH x per access (lazy derived layout)."""
    y = data[ykey]
    mode = cfg.timing
    if mode == "auto":
        mode = "chained" if sync_latency() > 1e-3 else "dispatch"

    if mode == "chained":
        run_k = _accum_chain(fn)
        t, _ = time_chained(run_k, (data[xkey], y), n_tests=cfg.n_tests,
                            compiler_options=honest_options(cfg))
        # validation pass at the chain's full-chip scoped-vmem window —
        # a bare jit compiles at the 16 MB default and rejects the larger
        # Pallas blocks the chain just timed (timing.call_full_window)
        apply_n = _accum_apply(fn)
        a = (jnp.int32(cfg.n_tests), data[xkey], y)
        opts = honest_options(cfg)
        if opts:
            apply_n = apply_n.lower(*a).compile(compiler_options=opts)
        x_final = apply_n(*a)
        return t, x_final

    # dispatch mode: warm the jit cache on a scratch x (donation may
    # invalidate it), then exactly n_tests timed accumulating reps.
    jax.block_until_ready(fn(data[xkey], y))
    x = data[xkey]
    jax.block_until_ready(x)
    from tpu_bench.core.timing import Timer

    timer = Timer()
    best = float("inf")
    for _ in range(cfg.n_tests):
        timer.start()
        x = fn(x, y)
        jax.block_until_ready(x)
        timer.stop()
        best = min(best, timer.elapsed_seconds())
    return best, x


def run_test(size: int, cfg: Config, reporter: Reporter) -> None:
    # f64: the XLA tier traces/executes under SCOPED x64, the Pallas df2
    # tier outside it (core/config.x64_scope) — the global flag would
    # lock every Pallas program out of this toolchain
    with x64_scope(cfg.dtype):
        y = initdata.device_y(size, cfg.dtype, pad_to=1024)
        jax.block_until_ready(y)

    def fresh_x():
        with x64_scope(cfg.dtype):
            return initdata.device_x(size, cfg.dtype, pad_to=1024)

    def fresh_x2():
        with x64_scope(cfg.dtype):
            return pl_df2.split_pair(
                initdata.device_x(size, cfg.dtype, pad_to=1024))

    def y2():
        with x64_scope(cfg.dtype):
            return pl_df2.split_pair(y)

    data = variants.Layouts(base={"y": y},
                            derived={"x": fresh_x, "x2": fresh_x2,
                                     "y2": y2})

    def timed(fn, keys):
        def thunk():
            t, x_final = _time_accumulating(fn, cfg, data, *keys)
            if isinstance(x_final, (tuple, list)):
                norm = pl_df2.pair_sumsq_norm(x_final)
            else:
                norm = l2norm(x_final)
            del x_final
            return t, norm
        return thunk

    times, norms = [], []
    for label, fn, keys in variant_specs(data, cfg):
        xfree = keys[0] == "x2"
        scope = contextlib.nullcontext() if xfree else x64_scope(cfg.dtype)
        with scope:
            t, norm = fail_soft(label, reporter, timed(fn, keys))
        times.append(t)
        norms.append(norm)

    if cfg.validate:
        for msg in check_norm_agreement(LABELS, norms, default_rtol(cfg.dtype),
                                        context=f"b02 size={size}"):
            reporter.note("WARNING: " + msg)

    gbs = [3 * cfg.itemsize * 1e-9 * size / t for t in times]
    reporter.emit("Size", size, LABELS, norms, gbs, "GB/s")


def main(argv=None):
    from tpu_bench.benchmarks import cli

    args = cli.build_parser("benchmark02").parse_args(argv)
    cfg = Config.from_flags(args)
    reporter = Reporter("Benchmark02 : Vector Addition")
    cap = cfg.mem_cap_bytes
    with cli.profiled(args):
        for size in cli.sweep(1024, 536870912, args):
            if 4 * size * cfg.itemsize > cap:  # y + x + warmup scratch + slack
                reporter.note(f"b02: stopping sweep at size {size} (memory cap)")
                break
            cli.guarded(reporter, "b02", size, run_test, size, cfg, reporter)


if __name__ == "__main__":
    main()
