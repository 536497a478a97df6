"""Dual-path fused kernel for the b04 nq=14/16 dip (round 3, VERDICT #4).

Committed state at nq=14/16: the dense-kron MXU tiers are MXU-bound at
~52-55 GDOF/s (the (nqTot, nmTot) operator crosses into a second K-tile:
K=169/225 padded to 256) and qp_shared is VPU-bound at ~63-64 (stage 2 is
nm0*nq0*nq1 ~ 2.5k f32 FMAs/elem = ~100% of the VPU's ~0.96e12 FMA/s at
the measured rate), i.e. 83% of the 76.4/77.3 empirical ceilings, vs 96%
at nq=12 where a single K-tile makes the kron tier bandwidth-bound.

qp_shared's own numbers prove intra-step MXU/VPU overlap (VPU saturated
while the stage-1 dots keep the MXU ~60% busy), so this experiment runs
BOTH formulations concurrently on disjoint element columns of the same
block: `em` columns through one dense kron GEMM (MXU) + the remaining
columns through the stage-split path.  Unit balance (6-pass HIGHEST MXU
~16.4e12 f32-MAC/s, VPU ~0.96e12):

  s1mxu: stage-1 dots on MXU  -> theoretical combined ~97 GDOF/s (BW-capped)
  allvpu: both stages on VPU  -> theoretical combined ~87 GDOF/s (BW-capped)

against the 76.4 GDOF/s 1R:1.34W mix ceiling; even 85-90% efficiency
clears the >=85%-of-ceiling target (~65).

Usage: python docs/experiments/exp_nq1416.py [nelmt]
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


def _dual_kernel(nm0, nm1, nq0, nq1, em, vpu_stage1, precision,
                 cpm_ref, b1t_ref, b1_ref, b0_ref, in_ref, out_ref):
    epb = in_ref.shape[-1]
    odt = out_ref.dtype
    if em:
        # MXU half: one dense kron GEMM over the first em columns, issued
        # first so its systolic passes churn under the VPU loop below
        flat = in_ref[:].reshape(nm0 * nm1, epb)
        og = _dot(cpm_ref[:], flat[:, :em], precision)
        out_ref[:, :, :em] = og.reshape(nq0, nq1, em).astype(odt)
    if em < epb:
        sl = slice(em, epb)
        for p in range(nm0):
            if vpu_stage1:
                tmp = b1_ref[0][:, None] * in_ref[p, 0, sl][None, :]
                for q in range(1, nm1):
                    tmp += b1_ref[q][:, None] * in_ref[p, q, sl][None, :]
            else:
                tmp = _dot(b1t_ref[:], in_ref[p, :, sl], precision)
            for i in range(nq0):
                contrib = (tmp * b0_ref[p, i]).astype(odt)
                if p == 0:
                    out_ref[i, :, sl] = contrib
                else:
                    out_ref[i, :, sl] += contrib


def qp_dual(in_pcoa3, cpm, b1t, b1, b0, *, nq0, nq1, em, epb,
            vpu_stage1=False, interpret=False, precision=HIGHEST):
    b0 = b0.astype(common.acc_dtype(in_pcoa3.dtype))
    nm0, nm1, e = in_pcoa3.shape
    grid = (e // epb,)
    return pl.pallas_call(
        functools.partial(_dual_kernel, nm0, nm1, nq0, nq1, em, vpu_stage1,
                          precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec(cpm.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq1, nm1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nm1, nq1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm0, nm1, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq0, nq1, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq0, nq1, e), in_pcoa3.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(cpm, b1t, b1, b0, in_pcoa3)


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
    b1 = jnp.asarray(basis.b1)
    b1t = jnp.asarray(np.asarray(basis.b1).T)
    cpm = jnp.asarray(np.kron(np.asarray(basis.b0).T,
                              np.asarray(basis.b1).T))

    for vpu_stage1, em, epb in cases:
        fn = jax.jit(functools.partial(
            qp_dual, nq0=nq0, nq1=nq1, em=em, epb=epb,
            vpu_stage1=vpu_stage1))
        label = (f"nq{nq} dual {'allvpu' if vpu_stage1 else 's1mxu'} "
                 f"em={em} epb={epb}")
        try:
            t, w = timing.measure(
                fn, (in_pcoa3, cpm, b1t, b1, b0), cfg,
                chain_fn=eps_chain(fn, eps_arg=1), with_witness=True)
            norm = float(np.sqrt(w))
            err = abs(norm - ref_norm) / ref_norm
            print(f"{label:40s} {dof / t:8.2f} GDOF/s  rel-err {err:.2e}",
                  flush=True)
        except Exception as ex:
            print(f"{label:40s} FAIL {str(ex).splitlines()[0][:110]}",
                  flush=True)


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    cfg = Config(timing="chained")
    cases = [
        (False, 0, 512),       # qp_shared baseline reproduction
        (False, 128, 512),
        (False, 256, 512),
        (True, 128, 512),
        (True, 256, 512),
        (False, 256, 1024),
        (False, 384, 1024),
        (True, 384, 1024),
    ]
    for nq in (14, 16):
        run_nq(nq, nelmt, cases, cfg)


if __name__ == "__main__":
    main()
