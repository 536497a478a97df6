"""Multi-chip element-parallel BwdTrans benchmark (additive; the reference
is single-GPU by design, SURVEY.md §2.3/§5.8).

Runs the fused 3D sum-factorization kernel data-parallel over every
available device: elements sharded on the dp mesh axis via shard_map, a
psum-reduced global validation norm, and aggregate GDOF/s reported.  On a
pod slice this is the weak-scaling element sweep; on one chip it reduces
to benchmark05's flagship variant; in the test suite it runs on 8 virtual
CPU devices in interpret mode.

Usage:  python -m tpu_bench.parallel.benchmark_dp [nq] [nelmt_per_device]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_bench.core.config import Config
from tpu_bench.core.reporting import Reporter
from tpu_bench.core.timing import eps_chain, measure
from tpu_bench.benchmarks import benchmark05 as b05
from tpu_bench.kernels import bwdtrans3d as pl_bt
from tpu_bench.parallel import mesh as pmesh


def _local_epb(data, mesh):
    # each device owns e_pad / dp elements; the block size must divide
    # the local shard, not the global stream
    shard = data["e_pad"] // mesh.shape["dp"]
    epb = 1
    while epb * 2 <= min(data["epb_qp"], shard) and shard % (epb * 2) == 0:
        epb *= 2
    return epb


def build_step(mesh, data, cfg):
    """jitted (in_pcoa3, b0, c12t) -> (out, norm_sq[1]) over the mesh.

    On a pure-dp mesh each device runs the full fused kernel on its element
    slab; with tp > 1 the (r, q) contraction is additionally sliced over tp
    with a psum epilogue (mesh.sharded_qp3d_apply)."""
    epb = _local_epb(data, mesh)
    if mesh.shape["tp"] > 1:
        step = pmesh.sharded_qp3d_apply(mesh, epb=epb,
                                        interpret=cfg.interpret,
                                        precision=cfg.precision)
        step_fast = pmesh.sharded_qp3d_apply(mesh, epb=epb,
                                             interpret=cfg.interpret,
                                             precision=cfg.precision,
                                             with_norm=False)
        return step, step_fast
    fn = functools.partial(pl_bt.qp_shared3d, epb=epb,
                           interpret=cfg.interpret, precision=cfg.precision)
    make = pmesh.sharded_elementwise_apply(mesh, fn)
    make_fast = pmesh.sharded_elementwise_apply(mesh, fn, with_norm=False)
    args = (data["in_pcoa3"], data["b0"], data["c12t"])
    return make(*args), make_fast(*args)


def run(nq: int, nelmt_per_dev: int, cfg: Config,
        reporter: Reporter, devices=None, tp: int = 1) -> float:
    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    # each device's element slab must itself be lane-aligned, so round the
    # per-device count up to 128 — this keeps e_pad divisible by 128 * dp
    # for any device count (including non-powers-of-two)
    from tpu_bench.ops import initdata

    nelmt_per_dev = initdata.round_up(nelmt_per_dev, 128)
    nelmt = nelmt_per_dev * n_dev
    data = b05.prepare(nq, nq, nq, nelmt, cfg)
    mesh = pmesh.make_mesh(devices, tp=tp)
    assert data["e_pad"] % (128 * mesh.shape["dp"]) == 0, (
        data["e_pad"], dict(mesh.shape))
    step, step_fast = build_step(mesh, data, cfg)
    args = (data["in_pcoa3"], data["b0"], data["c12t"])
    if mesh.shape["tp"] > 1:
        args = pmesh.shard_qp3d_inputs(mesh, *args)
    jax.block_until_ready(args[0])

    out, norm_sq = step(*args)  # validation pass: psum-reduced global norm
    norm = float(jnp.sqrt(norm_sq[0]))
    del out
    # timed step excludes the validation norm (an extra full output read)
    t = measure(step_fast, args, cfg,
                chain_fn=eps_chain(step_fast, eps_arg=1))
    nm = (nq - 1) ** 3
    label = (f"dp{mesh.shape['dp']}tp{tp}x{nelmt_per_dev}" if tp > 1
             else f"dp{n_dev}x{nelmt_per_dev}")
    gdofs = 1e-9 * nelmt * nm / t
    reporter.emit("nelmt", nelmt, [label], [norm], [gdofs], "DOF/s")
    return gdofs


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(prog="benchmark_dp")
    p.add_argument("nq", nargs="?", type=int, default=8)
    p.add_argument("nelmt_per_dev", nargs="?", type=int, default=131072)
    p.add_argument("--ntests", type=int, default=16)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel width: slice the (r, q) "
                        "contraction over tp ranks with a psum epilogue")
    args = p.parse_args(argv)
    cfg = Config(n_tests=args.ntests)
    n = len(jax.devices())
    reporter = Reporter(f"Benchmark DP : BwdTrans (3D) over {n} device(s)")
    reporter.sweep_title(f"BwdTrans (NQ = {args.nq}) x {n} devices")
    run(args.nq, args.nelmt_per_dev, cfg, reporter, tp=args.tp)


if __name__ == "__main__":
    main()
