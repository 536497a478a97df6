"""qp_w (stage-1-upfront, vreg-accumulated stage-2) tuning across nq.

exp_nq1416c.py found the structural win was never the dual path: em=0
(pure sum-factorization, all stage-1 dots into a VMEM scratch, stage-2
accumulated in vector registers) lifted nq16 64.3 -> 74.3 GDOF/s (96% of
ceiling) — the committed qp_shared's per-p `out_ref[i] +=` VMEM
read-modify-write chain was the real stall, not VPU FLOPs.  nq14 stayed
at ~63: its nq1=14 planes are sublane-misaligned (14 rows in 16-row
vregs).  This experiment:
  - sweeps epb for the em=0 structure at nq=10,12,14,16
  - tries a sublane-padded variant at nq14 (b1t padded to 16 rows so w
    planes and the stage-2 accumulator are (16, ev); the store slices
    back to 14 rows)

Usage: python docs/experiments/exp_nq1416d.py [nelmt]
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
from tpu_bench.kernels.bwdtrans2d import _dot, _parallel_params
from tpu_bench.ops import bwdtrans
from tpu_bench.baselines import bwdtrans2d as xla_bt

HIGHEST = jax.lax.Precision.HIGHEST


def _qpw_kernel(nm0, nq0, nq1, precision, b1t_ref, b0_ref, in_ref, out_ref,
                w_ref):
    odt = out_ref.dtype
    for p in range(nm0):
        w_ref[p] = _dot(b1t_ref[:], in_ref[p], precision).astype(w_ref.dtype)
    for i in range(nq0):
        acc = w_ref[0] * b0_ref[0, i]
        for p in range(1, nm0):
            acc += w_ref[p] * b0_ref[p, i]
        out_ref[i] = acc[:nq1].astype(odt)


def qp_w(in_pcoa3, b1tp, b0, *, nq0, nq1, epb, interpret=False,
         precision=HIGHEST):
    """b1tp may be sublane-padded: (nq1p >= nq1, nm1); w planes are nq1p
    rows, the store slices back to nq1."""
    b0 = b0.astype(common.acc_dtype(in_pcoa3.dtype))
    nm0, nm1, e = in_pcoa3.shape
    nq1p = b1tp.shape[0]
    grid = (e // epb,)
    return pl.pallas_call(
        functools.partial(_qpw_kernel, nm0, nq0, nq1, precision),
        grid=grid,
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
        scratch_shapes=[pltpu.VMEM((nm0, nq1p, epb), in_pcoa3.dtype)],
        interpret=interpret,
        **_parallel_params(interpret),
    )(b1tp, b0, in_pcoa3)


def run_nq(nq, nelmt, cases, cfg):
    basis = bwdtrans.make_basis2d(nq, nq, jnp.float32)
    _, in_coa = bwdtrans.make_inputs2d(basis, nelmt, nelmt, jnp.float32)
    nm0, nm1, nq0, nq1 = basis.nm0, basis.nm1, basis.nq0, basis.nq1
    dof = 1e-9 * nelmt * basis.nm_tot
    ref_norm = l2norm(xla_bt.einsum_coa(
        in_coa.reshape(nm1, nm0, nelmt), basis.b0, basis.b1))
    print(f"nq={nq} nelmt={nelmt} ref norm {ref_norm:.6f}", flush=True)

    in_pcoa3 = jnp.asarray(np.asarray(
        in_coa.reshape(nm1, nm0, nelmt).transpose(1, 0, 2)))
    b0 = jnp.asarray(basis.b0)
    b1t_np = np.asarray(basis.b1).T

    for qpad, epb in cases:
        nq1p = qpad if qpad else nq1
        b1tp = np.zeros((nq1p, nm1), np.float32)
        b1tp[:nq1] = b1t_np
        fn = jax.jit(functools.partial(
            qp_w, nq0=nq0, nq1=nq1, epb=epb))
        label = f"nq{nq} qp_w nq1p={nq1p} epb={epb}"
        try:
            t, w = timing.measure(
                fn, (in_pcoa3, jnp.asarray(b1tp), b0), cfg,
                chain_fn=eps_chain(fn, eps_arg=1), with_witness=True)
            norm = float(np.sqrt(w))
            err = abs(norm - ref_norm) / ref_norm
            print(f"{label:34s} {dof / t:8.2f} GDOF/s  rel-err {err:.2e}",
                  flush=True)
        except Exception as ex:
            print(f"{label:34s} FAIL {str(ex).splitlines()[0][:110]}",
                  flush=True)


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    cfg = Config(timing="chained")
    run_nq(14, nelmt, [(0, 2048), (16, 1024), (16, 2048), (16, 4096)], cfg)
    run_nq(16, nelmt, [(0, 1024), (0, 2048)], cfg)
    run_nq(12, nelmt, [(0, 2048), (16, 2048)], cfg)
    run_nq(10, nelmt, [(0, 2048), (16, 2048)], cfg)
    run_nq(8, nelmt, [(0, 2048), (0, 4096)], cfg)
    run_nq(6, nelmt, [(0, 4096)], cfg)


if __name__ == "__main__":
    main()
