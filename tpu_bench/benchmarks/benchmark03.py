"""Benchmark 03 — dense matrix-vector multiply y = A.x.

Reference: benchmark03/benchmark03.cc (harness :106-350).  Five variants;
GB/s counts the matrix traffic only: sizeof(T)*1e-9*M*N/t (:331-336).
Sweep: M = N = 128 .. 16384 (x2, `2<<6 .. <2<<14`, :345).
Data: A[i,j] = sin(i*N+j+1), x[j] = j (:161-167).

Variant mapping:
  Kokkos TeamPolicy row-reduce -> XLA broadcast-multiply + row sum
  cuBLAS gemv 'T' (row-major)  -> XLA dot_general on row-major A
  cuBLAS gemv 'N' (col-major)  -> XLA dot_general on transposed copy
  CUDA block-per-row dot       -> Pallas VPU row-block tiles
  CUDA vectorized dot (vl)     -> Pallas MXU left-vector contraction (cm)

Chained timing perturbs x (tiny next to A's streaming traffic).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp

from tpu_bench.baselines import matvec as xla_mv
from tpu_bench.core import variants
from tpu_bench.core.config import Config, x64_scope
from tpu_bench.core.reporting import Reporter
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.core.validate import (check_norm_agreement, default_rtol,
                                     measure_checked)
from tpu_bench.kernels import df2stream as pl_df2
from tpu_bench.kernels import matvec as pl_mv
from tpu_bench.ops import initdata

LABELS = ["XLA(rowsum)", "XLA(gemv-rm)", "XLA(gemv-cm)", "Pallas(vpu)",
          "Pallas(mxu)"]


def variant_specs(data, cfg):
    """Ordered (label, fn, operand keys) — core/variants.py convention.
    The matrix key picks the layout ("a_rm" row-major / "a_cm" the
    column-major copy); index 1 ("x") is the small operand the chained
    timer perturbs (eps_chain)."""
    del data
    if cfg.dtype == jnp.float64:
        # f64: both Pallas slots dispatch the df2 double-float kernels
        # (kernels/df2stream.py) — A streams as its exact (hi, lo) f32
        # pair, 8 B per entry like the reference's double loads.  The MXU
        # has no f64 path, so the two slots differ by traversal layout
        # (row-major row blocks vs the column-major copy), exactly the
        # axis the reference's cuBLAS 'T'/'N' pair probes.
        pal = [
            ("Pallas(vpu)", jax.jit(functools.partial(
                pl_df2.matvec_pair_rm, interpret=cfg.interpret)),
             ("a2_rm", "x2")),
            ("Pallas(mxu)", jax.jit(functools.partial(
                pl_df2.matvec_pair_cm, interpret=cfg.interpret)),
             ("a2_cm", "x2")),
        ]
    else:
        pal = [
            ("Pallas(vpu)", jax.jit(functools.partial(
                pl_mv.matvec_vpu, interpret=cfg.interpret)), ("a_rm", "x")),
            ("Pallas(mxu)", jax.jit(functools.partial(
                pl_mv.matvec_mxu, interpret=cfg.interpret,
                precision=cfg.precision)), ("a_cm", "x")),
        ]
    return [
        ("XLA(rowsum)", xla_mv.rowsum, ("a_rm", "x")),
        ("XLA(gemv-rm)",
         functools.partial(xla_mv.gemv_rm, precision=cfg.precision),
         ("a_rm", "x")),
        ("XLA(gemv-cm)",
         functools.partial(xla_mv.gemv_cm, precision=cfg.precision),
         ("a_cm", "x")),
    ] + pal


def build_variants(data, cfg):
    return variants.materialize(variant_specs(data, cfg), data)


def run_test(size: int, cfg: Config, reporter: Reporter) -> None:
    # f64: the XLA tier traces/executes under SCOPED x64, the Pallas df2
    # tier outside it (core/config.x64_scope) — the global flag would
    # lock every Pallas program out of this toolchain
    m = n = size
    with x64_scope(cfg.dtype):
        # zero-padded to sublane/lane multiples so odd sizes stay correct
        # in every tiled variant; throughput counts the true m*n
        a = initdata.host_matrix_sin1((m, n), cfg.dtype, pad_shape=(8, 128))
        a_t = jnp.asarray(a.T)  # column-major copy, materialized untimed
        x = initdata.host_x_linear(n, cfg.dtype, pad_to=128)
        jax.block_until_ready((a, a_t, x))

    def pair_of(arr):
        def build():
            with x64_scope(cfg.dtype):
                return pl_df2.split_pair(arr)
        return build

    data = variants.Layouts(
        base={"a_rm": a, "a_cm": a_t, "x": x},
        derived={"a2_rm": pair_of(a), "a2_cm": pair_of(a_t),
                 "x2": pair_of(x)})

    times, norms = [], []
    for label, fn, keys in variant_specs(data, cfg):
        xfree = keys[0].startswith("a2")
        scope = contextlib.nullcontext() if xfree else x64_scope(cfg.dtype)
        with scope:
            args = tuple(data[k] for k in keys)
            kw = {}
            if xfree:
                # df2 pair output: exact sumsq on device, combine + sqrt
                # in host f64; the chain witness only proves completion.
                # The untimed application compiles at the chain's
                # full-chip scoped-vmem window (timing.call_full_window).
                kw = dict(
                    norm_fn=pl_df2.pair_sumsq_norm,
                    witness_norm=lambda w, _f=fn, _a=args:
                        pl_df2.pair_sumsq_norm(
                            timing.call_full_window(_f, _a, cfg)))
            t, norm = measure_checked(label, fn, args, cfg, reporter,
                                      chain_fn=eps_chain(fn, eps_arg=1),
                                      **kw)
            del args, kw
        times.append(t)
        norms.append(norm)

    if cfg.validate:
        for msg in check_norm_agreement(LABELS, norms, default_rtol(cfg.dtype),
                                        context=f"b03 size={size}"):
            reporter.note("WARNING: " + msg)

    gbs = [cfg.itemsize * 1e-9 * m * n / t for t in times]
    reporter.emit("Size", size, LABELS, norms, gbs, "GB/s")


def main(argv=None):
    from tpu_bench.benchmarks import cli

    args = cli.build_parser("benchmark03").parse_args(argv)
    cfg = Config.from_flags(args)
    reporter = Reporter("Benchmark03 : Matrix-Vector Mult")
    cap = cfg.mem_cap_bytes
    with cli.profiled(args):
        for size in cli.sweep(128, 16384, args):
            if 3 * size * size * cfg.itemsize > cap:  # A + A^T + slack
                reporter.note(f"b03: stopping sweep at size {size} (memory cap)")
                break
            cli.guarded(reporter, "b03", size, run_test, size, cfg, reporter)


if __name__ == "__main__":
    main()
