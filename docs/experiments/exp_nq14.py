"""nq=14 store-alignment probe: is the 86%-of-ceiling dip the output store?

qp_w lifted nq=16 to 97% of its mix ceiling but nq=14 only to 86%
(docs/round3.md §4b).  The FLOP/DOF model says the two orders should run
the same fraction (stage-2 padded-FMA per DOF: 17.2 vs 17.1) — the one
asymmetry left is the output store: the out block (nq0, nq1, epb) flattens
to nq0*nq1 sublane rows, and storing plane i writes rows [14i, 14i+14) —
at nq=14 every second plane straddles 8-row vreg tiles (14 = 8+6), so half
the stores are partial-tile masked writes; at nq=16 every store is
tile-aligned.  Three candidate fixes, measured against the qp_w baseline:

  A  qp_w             production baseline (store slices acc[:nq1])
  B  qp_w_stage       stage-2 writes aligned 16-row planes into a VMEM
                      scratch out-image (nq0, nq1p, epb), then ONE bulk
                      strided copy slices it into the real out block —
                      misalignment moves from 14 separate masked stores
                      to a single VMEM-VMEM copy
  C  qp_w_padded      the out array itself is sublane-padded to
                      (nq0, nq1p, E) with zero rows (norms layout-
                      invariant): every store AND the out DMA fully
                      aligned, at the price of 14% more HBM write bytes —
                      model cap 76.4*(365/393) = 71.0 GDOF/s vs the 65.7
                      committed, so it wins if it runs >= 93% of its own
                      ceiling

Usage: python docs/experiments/exp_nq14.py [nelmt]
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
from tpu_bench.core.validate import l2norm
from tpu_bench.kernels import common
from tpu_bench.kernels.bwdtrans2d import _dot, _parallel_params, qp_w
from tpu_bench.ops import bwdtrans
from tpu_bench.baselines import bwdtrans2d as xla_bt

HIGHEST = jax.lax.Precision.HIGHEST


def _qp_stage_kernel(nm0, nq0, nq1, precision, b1t_ref, b0_ref, in_ref,
                     out_ref, w_ref, o_ref):
    odt = out_ref.dtype
    for p in range(nm0):
        w_ref[p] = _dot(b1t_ref[:], in_ref[p], precision).astype(w_ref.dtype)
    # aligned 16-row stores into the scratch out-image
    for i in range(nq0):
        acc = w_ref[0] * b0_ref[0, i]
        for p in range(1, nm0):
            acc += w_ref[p] * b0_ref[p, i]
        o_ref[i] = acc.astype(odt)
    # one bulk strided copy carries all the misalignment
    out_ref[:] = o_ref[:, :nq1, :]


def qp_w_stage(in_pcoa3, b0, b1tp, *, nq1, epb, interpret=False,
               precision=HIGHEST):
    b0 = b0.astype(common.acc_dtype(in_pcoa3.dtype))
    nm0, nm1, e = in_pcoa3.shape
    assert e % epb == 0, f"nelmt {e} must divide by epb {epb}"
    nq0 = b0.shape[1]
    nq1p = b1tp.shape[0]
    return pl.pallas_call(
        functools.partial(_qp_stage_kernel, nm0, nq0, nq1, precision),
        grid=(e // epb,),
        in_specs=[
            pl.BlockSpec((nq1p, nm1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm0, nm1, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq0, nq1, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq0, nq1, e), in_pcoa3.dtype),
        scratch_shapes=[pltpu.VMEM((nm0, nq1p, epb), in_pcoa3.dtype),
                        pltpu.VMEM((nq0, nq1p, epb), in_pcoa3.dtype)],
        interpret=interpret,
        **_parallel_params(interpret),
    )(b1tp, b0, in_pcoa3)


def _qp_pad_kernel(nm0, nq0, precision, b1t_ref, b0_ref, in_ref, out_ref,
                   w_ref):
    odt = out_ref.dtype
    for p in range(nm0):
        w_ref[p] = _dot(b1t_ref[:], in_ref[p], precision).astype(w_ref.dtype)
    for i in range(nq0):
        acc = w_ref[0] * b0_ref[0, i]
        for p in range(1, nm0):
            acc += w_ref[p] * b0_ref[p, i]
        out_ref[i] = acc.astype(odt)  # full nq1p rows, aligned


def qp_w_padded(in_pcoa3, b0, b1tp, *, epb, interpret=False,
                precision=HIGHEST):
    """Sublane-padded output (nq0, nq1p, E): zero rows past nq1 (b1tp's
    padding rows are zero, so acc rows past nq1 are exact zeros — the
    L2 norm is unchanged)."""
    b0 = b0.astype(common.acc_dtype(in_pcoa3.dtype))
    nm0, nm1, e = in_pcoa3.shape
    assert e % epb == 0, f"nelmt {e} must divide by epb {epb}"
    nq0 = b0.shape[1]
    nq1p = b1tp.shape[0]
    return pl.pallas_call(
        functools.partial(_qp_pad_kernel, nm0, nq0, precision),
        grid=(e // epb,),
        in_specs=[
            pl.BlockSpec((nq1p, nm1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm0, nm1, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq0, nq1p, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq0, nq1p, e), in_pcoa3.dtype),
        scratch_shapes=[pltpu.VMEM((nm0, nq1p, epb), in_pcoa3.dtype)],
        interpret=interpret,
        **_parallel_params(interpret),
    )(b1tp, b0, in_pcoa3)


def run_nq(nq, nelmt, cfg):
    basis = bwdtrans.make_basis2d(nq, nq, jnp.float32)
    _, in_coa = bwdtrans.make_inputs2d(basis, nelmt, nelmt, jnp.float32)
    nm0, nm1, nq1 = basis.nm0, basis.nm1, basis.nq1
    dof = 1e-9 * nelmt * basis.nm_tot
    ref_norm = l2norm(xla_bt.einsum_coa(
        in_coa.reshape(nm1, nm0, nelmt), basis.b0, basis.b1))
    print(f"nq={nq} nelmt={nelmt} ref norm {ref_norm:.6f}", flush=True)

    in_pcoa3 = jnp.asarray(np.asarray(
        in_coa.reshape(nm1, nm0, nelmt).transpose(1, 0, 2)))
    b0 = jnp.asarray(basis.b0)
    b1tp = bwdtrans.pad_rows(jnp.asarray(np.asarray(basis.b1).T))

    variants = [("A qp_w", qp_w, dict(nq1=nq1)),
                ("B qp_w_stage", qp_w_stage, dict(nq1=nq1)),
                ("C qp_w_padded", qp_w_padded, dict())]
    for epb in (1024, 2048, 4096):
        if nelmt % epb:
            # grid=(e // epb,) would truncate: trailing blocks unwritten,
            # undefined values feeding the norm witness (ADVICE r3)
            print(f"skip epb={epb}: does not divide nelmt={nelmt}",
                  flush=True)
            continue
        for name, kern, kw in variants:
            fn = jax.jit(functools.partial(kern, epb=epb, **kw))
            label = f"nq{nq} {name} epb={epb}"
            try:
                t, w = timing.measure(
                    fn, (in_pcoa3, b0, b1tp), cfg,
                    chain_fn=eps_chain(fn, eps_arg=1), with_witness=True)
                norm = float(np.sqrt(w))
                err = abs(norm - ref_norm) / ref_norm
                print(f"{label:32s} {dof / t:8.2f} GDOF/s  "
                      f"rel-err {err:.2e}", flush=True)
            except Exception as ex:
                print(f"{label:32s} FAIL "
                      f"{str(ex).splitlines()[0][:100]}", flush=True)


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    cfg = Config(timing="chained")
    for nq in (14, 16):
        run_nq(nq, nelmt, cfg)


if __name__ == "__main__":
    main()
