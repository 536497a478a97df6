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

import functools

import jax
import jax.numpy as jnp

from tpu_bench.baselines import matvec as xla_mv
from tpu_bench.core.config import Config
from tpu_bench.core.registry import Variant
from tpu_bench.core.reporting import Reporter
from tpu_bench.core.timing import eps_chain
from tpu_bench.core.validate import (check_norm_agreement, default_rtol,
                                     measure_checked)
from tpu_bench.kernels import matvec as pl_mv
from tpu_bench.ops import initdata

VARIANTS = [
    Variant("XLA(rowsum)", lambda d, c: (xla_mv.rowsum, "rm")),
    Variant("XLA(gemv-rm)", lambda d, c: (
        functools.partial(xla_mv.gemv_rm, precision=c.precision), "rm")),
    Variant("XLA(gemv-cm)", lambda d, c: (
        functools.partial(xla_mv.gemv_cm, precision=c.precision), "cm")),
    Variant("Pallas(vpu)", lambda d, c: (jax.jit(functools.partial(
        pl_mv.matvec_vpu, interpret=c.interpret)), "rm")),
    Variant("Pallas(mxu)", lambda d, c: (jax.jit(functools.partial(
        pl_mv.matvec_mxu, interpret=c.interpret,
        precision=c.precision)), "cm")),
]

LABELS = [v.label for v in VARIANTS]


def run_test(size: int, cfg: Config, reporter: Reporter) -> None:
    m = n = size
    # zero-padded to sublane/lane multiples so odd sizes stay correct in
    # every tiled variant; throughput counts the true m*n
    a = initdata.host_matrix_sin1((m, n), cfg.dtype, pad_shape=(8, 128))
    a_t = jnp.asarray(a.T)  # column-major copy, materialized untimed
    x = initdata.host_x_linear(n, cfg.dtype, pad_to=128)
    jax.block_until_ready((a, a_t, x))

    times, norms = [], []
    for v in VARIANTS:
        fn, layout = v.build(None, cfg)
        mat = a_t if layout == "cm" else a
        t, norm = measure_checked(v.label, fn, (mat, x), cfg, reporter,
                                  chain_fn=eps_chain(fn, eps_arg=1))
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
