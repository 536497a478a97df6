"""b04 nq=14, hypothesis 4: is the 13/14-row stream GEOMETRY the wall?

Three hypotheses are falsified (exp_nq14: store alignment / sublane-padded
output; exp_nq14b: odd-K MXU shapes), and stage isolation shows BOTH
stages of qp_w run ~91% of the mix ceiling at nq=14 where nq=16's run
~97%.  The one thing every probe so far shared with the production kernel
is the operand geometry itself: (13, 13, E) reads and (14, 14, E) writes —
plane rows that are not multiples of the 8-sublane tile.  The empirical
mix ceilings (benchmarks/ceilings.py) are measured with ALIGNED pow2
streams, so if HBM<->VMEM streaming through 13/14-row planes itself pays
a geometry tax, the nq=14 cell is AT its true wall and the 86-88% figure
is an artifact of comparing against an aligned-stream bound.

Probes (pure streams, minimal VPU passthrough, no contraction):

  G14  read (13,13,epb) planes, write (14,14,epb)  — nq=14's exact mix
  G16  read (15,15,epb) planes, write (16,16,epb)  — nq=16's mix (control:
       15 rows are also unaligned, yet nq=16 reaches 97%)
  A16  read (16,16,epb), write (16,16,epb)          — fully aligned control
  A    production qp_w at nq=14 (same session, the repo's wall standard)

Each row prints achieved combined GB/s and its % of the empirical
shared-bus bound for ITS OWN byte mix (roofline.empirical_mix_bandwidth
over the committed ceilings artifact) — geometry is the only axis that
varies.  G14 at ~91% proves the wall; G14 at ~97% falsifies hypothesis 4.

Usage: python docs/experiments/exp_nq14c.py [nelmt]   (default 262144)
"""
import os as _os
import sys

sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import functools
import json

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.core.config import Config
from tpu_bench.core import timing, roofline
from tpu_bench.core.timing import eps_chain
from tpu_bench.kernels.bwdtrans2d import _parallel_params, qp_w
from tpu_bench.benchmarks import benchmark04 as b04_mod


def _geom_kernel(r_in, r_out, s_ref, in_ref, out_ref):
    # stream every input row in and every output row out; one VPU multiply
    # per row keeps the data dependence without compute cost
    c_in = in_ref.shape[1]
    c_out = out_ref.shape[1]
    for i in range(r_out):
        row = in_ref[i % r_in] * s_ref[0, 0]
        if c_out <= c_in:
            out_ref[i] = row[:c_out].astype(out_ref.dtype)
        else:
            out_ref[i, :c_in] = row.astype(out_ref.dtype)
            out_ref[i, c_in:] = row[: c_out - c_in].astype(out_ref.dtype)


def geom_stream(in_arr, s, *, r_out, c_out, epb, interpret=False):
    r_in, c_in, e = in_arr.shape
    grid = (e // epb,)
    return pl.pallas_call(
        functools.partial(_geom_kernel, r_in, r_out),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((r_in, c_in, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_out, c_out, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_out, c_out, e), in_arr.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(s, in_arr)


def bw_from_artifact():
    path = _os.path.join(_os.path.dirname(__file__), "..", "..",
                         "artifacts", "ceilings", "ceilings.log")
    with open(path) as f:
        for line in f:
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit("no ceilings JSON")


def run(label, fn, args, r_bytes, w_bytes, nelmt, bw, cfg):
    try:
        t = timing.measure(fn, args, cfg, chain_fn=eps_chain(fn, eps_arg=1))
    except Exception as ex:
        print(f"{label:34s} FAIL {str(ex).splitlines()[0][:100]}", flush=True)
        return
    gbs = (r_bytes + w_bytes) * nelmt / t / 1e9
    bound = roofline.empirical_mix_bandwidth(bw, r_bytes, w_bytes)
    print(f"{label:34s} {gbs:7.1f} GB/s  = {100 * gbs / bound:5.1f}% of its "
          f"{bound:6.1f} mix bound", flush=True)


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    cfg = Config(timing="chained")
    bw = bw_from_artifact()
    it = 4  # f32

    # production qp_w at nq=14 in the same session (GDOF/s context line)
    data = b04_mod.prepare(14, 14, nelmt, cfg)
    epb = data["epb_qp"]
    print(f"nelmt={nelmt} epb={epb}", flush=True)
    fn = jax.jit(functools.partial(qp_w, nq1=14, epb=epb,
                                   precision=cfg.precision))
    t = timing.measure(fn, (data["in_pcoa3"], data["b0"], data["b1tp"]),
                       cfg, chain_fn=eps_chain(fn, eps_arg=1))
    dof = 1e-9 * nelmt * 169
    gbs = (169 + 196) * it * nelmt / t / 1e9
    bound = roofline.empirical_mix_bandwidth(bw, 169 * it, 196 * it)
    print(f"{'A   production qp_w nq=14':34s} {gbs:7.1f} GB/s  = "
          f"{100 * gbs / bound:5.1f}% of its {bound:6.1f} mix bound  "
          f"({dof / t:6.2f} GDOF/s)", flush=True)

    s = jnp.ones((1, 1), jnp.float32)
    for label, (ri, ci, ro, co) in (
        ("G14 stream (13,13)->(14,14)", (13, 13, 14, 14)),
        ("G16 stream (15,15)->(16,16)", (15, 15, 16, 16)),
        ("A16 stream (16,16)->(16,16)", (16, 16, 16, 16)),
        # the other odd-row sweep geometries: does the tax hit them too?
        ("G06 stream ( 5, 5)->( 6, 6)", (5, 5, 6, 6)),
        ("G10 stream ( 9, 9)->(10,10)", (9, 9, 10, 10)),
        ("G12 stream (11,11)->(12,12)", (11, 11, 12, 12)),
    ):
        in_arr = jax.block_until_ready(
            jnp.ones((ri, ci, nelmt), jnp.float32))
        fn = jax.jit(functools.partial(geom_stream, r_out=ro, c_out=co,
                                       epb=epb))
        run(label, fn, (in_arr, s), ri * ci * it, ro * co * it, nelmt, bw,
            cfg)
        del in_arr


if __name__ == "__main__":
    main()
