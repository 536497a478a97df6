"""b04 nq=14: which stage of qp_w underperforms (stage isolation probes).

Round 4 falsified the partial-sublane-store hypothesis (exp_nq14.py,
artifacts/wall/nq14.log): all three store variants land within 1%, and
nq=14 sits at 86-88% of its mix ceiling while nq=16 runs 97%.  Unit-rate
arithmetic deepens the puzzle: at its committed peak nq=16 sustains
~2.5 TFLOP/s of stage-2 VPU work, while nq=14's peak implies only ~2.2 —
so a common VPU rate wall cannot explain the gap either.

This experiment isolates the two stages of the production qp_w at nq=14
and nq=16 under identical epb and traffic accounting:

  S1  stage-1 only: the nm0 MXU dots (K=nm1), w planes written out
  S2  stage-2 only: the vreg p-combine over raw input planes (no dots)
  A   production qp_w (both stages)
  K16 stage-1 with the operator K zero-padded 13 -> 16 and the input's
      nm1 rows padded on-chip is impossible without extra HBM traffic, so
      instead: b1tp columns zero-padded AND the dot fed a 16-row slice of
      a 16-row input layout built host-side.  This isolates the odd-K
      MXU question at equal FLOPs (the padded rows are zeros).

Comparing elt/s of S1 and S2 between nq=14 and nq=16 names the guilty
stage; K16 then tests the recorded stage-1-shape hypothesis directly.

Usage: python docs/experiments/exp_nq14b.py [nelmt]   (default 262144)
"""
import os as _os
import sys

sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.core.config import Config
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.kernels import common
from tpu_bench.kernels.bwdtrans2d import _dot, _parallel_params, qp_w
from tpu_bench.benchmarks import benchmark04 as b04_mod
from tpu_bench.ops import bwdtrans, initdata

HIGHEST = jax.lax.Precision.HIGHEST


def _s1_kernel(nm0, precision, b1tp_ref, in_ref, w_ref):
    for p in range(nm0):
        w_ref[p] = _dot(b1tp_ref[:], in_ref[p], precision).astype(w_ref.dtype)


def s1_only(in_pcoa3, b1tp, *, epb, interpret=False, precision=HIGHEST):
    nm0, nm1, e = in_pcoa3.shape
    nq1p = b1tp.shape[0]
    grid = (e // epb,)
    return pl.pallas_call(
        functools.partial(_s1_kernel, nm0, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq1p, nm1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nm0, nm1, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nm0, nq1p, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nm0, nq1p, e), in_pcoa3.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(b1tp, in_pcoa3)


def _s2_kernel(nm0, nq0, b0_ref, in_ref, out_ref):
    # p-combine straight off the raw input planes (no stage-1 dot):
    # same vreg accumulation structure as qp_w's stage 2
    for i in range(nq0):
        acc = in_ref[0] * b0_ref[0, i]
        for p in range(1, nm0):
            acc += in_ref[p] * b0_ref[p, i]
        out_ref[i] = acc.astype(out_ref.dtype)


def s2_only(in_pcoa3, b0, *, epb, interpret=False):
    b0 = b0.astype(common.acc_dtype(in_pcoa3.dtype))
    nm0, nm1, e = in_pcoa3.shape
    nq0 = b0.shape[1]
    grid = (e // epb,)
    return pl.pallas_call(
        functools.partial(_s2_kernel, nm0, nq0),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm0, nm1, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq0, nm1, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq0, nm1, e), in_pcoa3.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(b0, in_pcoa3)


def run(label, fn, args, nelmt, nm_tot, cfg):
    dof = 1e-9 * nelmt * nm_tot
    try:
        t = timing.measure(fn, args, cfg, chain_fn=eps_chain(fn, eps_arg=1))
        print(f"{label:40s} {dof / t:8.2f} GDOF/s  ({nelmt / t / 1e6:8.1f} "
              f"Melt/s)", flush=True)
    except Exception as ex:
        print(f"{label:40s} FAIL {str(ex).splitlines()[0][:100]}", flush=True)


def run_nq(nq, nelmt, cfg):
    data = b04_mod.prepare(nq, nq, nelmt, cfg)
    basis = data["basis"]
    in_pcoa3 = data["in_pcoa3"]
    b0, b1tp = data["b0"], data["b1tp"]
    epb = data["epb_qp"]
    nm = basis.nm_tot
    print(f"nq={nq} nm0={basis.nm0} epb={epb}", flush=True)
    mk = lambda fn, **kw: jax.jit(functools.partial(fn, epb=epb, **kw))

    run(f"A  qp_w          nq={nq}",
        mk(qp_w, nq1=nq, precision=cfg.precision),
        (in_pcoa3, b0, b1tp), nelmt, nm, cfg)
    run(f"S1 stage1-only   nq={nq}",
        mk(s1_only, precision=cfg.precision), (in_pcoa3, b1tp),
        nelmt, nm, cfg)
    run(f"S2 stage2-only   nq={nq}", mk(s2_only), (in_pcoa3, b0),
        nelmt, nm, cfg)
    if basis.nm1 % 8:
        # K16: zero-pad the contraction K (nm1 -> ceil8) in both operator
        # columns and a host-padded input; equal zero-FLOPs, aligned K
        nm1p = (basis.nm1 + 7) // 8 * 8
        b1tp_k = jnp.zeros((b1tp.shape[0], nm1p), b1tp.dtype)
        b1tp_k = b1tp_k.at[:, :basis.nm1].set(b1tp)
        in_k = jnp.zeros((basis.nm0, nm1p, in_pcoa3.shape[2]),
                         in_pcoa3.dtype)
        in_k = in_k.at[:, :basis.nm1, :].set(in_pcoa3)
        in_k = jax.block_until_ready(in_k)
        run(f"K16 stage1 K->{nm1p}  nq={nq}",
            mk(s1_only, precision=cfg.precision), (in_k, b1tp_k),
            nelmt, nm, cfg)
        del in_k


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    cfg = Config(timing="chained")
    for nq in (14, 16):
        run_nq(nq, nelmt, cfg)


if __name__ == "__main__":
    main()
