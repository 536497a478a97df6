"""b04 nq=14: route around the geometry wall with flat HBM blocks.

exp_nq14c measured the wall: per-PLANE DMA of (13,13,E)/(14,14,E)
layouts moves padded 8-sublane tiles, capping the stream at ~88% of the
aligned rate (occupancy 13/16, 14/16).  The same bytes flattened to
(169,E)/(196,E) occupy 169/176 = 96% and 196/200 = 98% of their tiles —
IF Mosaic's in-VMEM handling of the now-unaligned plane slices
(in[13p:13p+13], out[14i:14i+14]) costs less than the DMA tax buys.

  A   production qp_w (3D plane blocks)            — the 88%-taxed stream
  F   flat qp_w: BlockSpec (nmTot,epb)/(nqTot,epb), plane slices in-kernel
      (stage-1 w scratch stays tile-aligned, identical to production)

Both at nq=14 (taxed) and nq=16 (tax-free control: flat should be ~equal
or slightly behind there, isolating the relayout cost).

Usage: python docs/experiments/exp_nq14d.py [nelmt]   (default 262144)
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
from tpu_bench.ops import bwdtrans

HIGHEST = jax.lax.Precision.HIGHEST


def _qp_w_flat_kernel(nm0, nm1, nq0, nq1, precision, b1t_ref, b0_ref,
                      in_ref, out_ref, w_ref):
    odt = out_ref.dtype
    # stage 1 off unaligned flat slices; w scratch stays tile-aligned
    for p in range(nm0):
        w_ref[p] = _dot(b1t_ref[:], in_ref[nm1 * p:nm1 * (p + 1)],
                        precision).astype(w_ref.dtype)
    # stage 2 in vregs; each output plane stored once at its flat offset
    for i in range(nq0):
        acc = w_ref[0] * b0_ref[0, i]
        for p in range(1, nm0):
            acc += w_ref[p] * b0_ref[p, i]
        out_ref[nq1 * i:nq1 * (i + 1)] = acc[:nq1].astype(odt)


def qp_w_flat(in_coa, b0, b1tp, *, nm1, nq1, epb, interpret=False,
              precision=HIGHEST):
    b0 = b0.astype(common.acc_dtype(in_coa.dtype))
    nm_tot, e = in_coa.shape
    nm0 = nm_tot // nm1
    nq0 = b0.shape[1]
    nq1p = b1tp.shape[0]
    nq_tot = nq0 * nq1
    grid = (e // epb,)
    return pl.pallas_call(
        functools.partial(_qp_w_flat_kernel, nm0, nm1, nq0, nq1, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq1p, nm1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm_tot, epb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq_tot, epb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_tot, e), in_coa.dtype),
        scratch_shapes=[pltpu.VMEM((nm0, nq1p, epb), in_coa.dtype)],
        interpret=interpret,
        **_parallel_params(interpret),
    )(b1tp, b0, in_coa)


def run(label, fn, args, nelmt, nm_tot, ref_norm, cfg):
    dof = 1e-9 * nelmt * nm_tot
    try:
        t, w = timing.measure(fn, args, cfg, chain_fn=eps_chain(fn, eps_arg=1),
                              with_witness=True)
        err = abs(float(np.sqrt(w)) - ref_norm) / ref_norm
        print(f"{label:36s} {dof / t:8.2f} GDOF/s  rel-err {err:.2e}",
              flush=True)
    except Exception as ex:
        print(f"{label:36s} FAIL {str(ex).splitlines()[0][:100]}", flush=True)


def run_nq(nq, nelmt, cfg):
    data = b04_mod.prepare(nq, nq, nelmt, cfg)
    basis = data["basis"]
    epb = data["epb_qp"]
    nm = basis.nm_tot
    e_pad = data["in_coa"].shape[1]
    ref_norm = float(np.linalg.norm(bwdtrans.reference2d(basis, e_pad)))
    print(f"nq={nq} nm0={basis.nm0} epb={epb} ref {ref_norm:.6f}",
          flush=True)
    mk = lambda fn, **kw: jax.jit(functools.partial(fn, **kw))

    run(f"A  qp_w (plane blocks)  nq={nq}",
        mk(qp_w, nq1=nq, epb=epb, precision=cfg.precision),
        (data["in_pcoa3"], data["b0"], data["b1tp"]), nelmt, nm, ref_norm,
        cfg)
    for ep in (epb, 2 * epb):
        if e_pad % ep:
            continue
        run(f"F  qp_w_flat epb={ep:5d}    nq={nq}",
            mk(qp_w_flat, nm1=basis.nm1, nq1=nq, epb=ep,
               precision=cfg.precision),
            (data["in_coa"], data["b0"], data["b1tp"]), nelmt, nm, ref_norm,
            cfg)


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    cfg = Config(timing="chained")
    for nq in (14, 16):
        run_nq(nq, nelmt, cfg)


if __name__ == "__main__":
    main()
