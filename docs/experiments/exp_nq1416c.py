"""Dual-path nq14/16, take 2: hide the kron dot behind the VPU loop.

exp_nq1416.py's dual kernel LOST to qp_shared at every em>0: the kron
result's store immediately follows its dot, and an in-order issue stall
on that dependency serializes the whole em-branch against the VPU loop
(measured 58.6 at em=512/epb=2048 == the serial-sum model t_kron+t_vpu).

This version restructures for overlap:
  1. all stage-1 dots issued upfront into a VMEM scratch w
     (dependency-free MXU queue: 13 small dots, ~0.2us each),
  2. the dense kron dot for the em columns issued next (async, in flight),
  3. the stage-2 VPU loop (depends only on w) issues and runs UNDER the
     kron,
  4. the kron result store is the LAST instruction (the only one that
     waits on it).

Balance model at epb=2048, em=512: t_vpu 4.1us vs t_mxu 2.5+1.6us ->
step ~4.2us = 82 GDOF/s, i.e. bandwidth-capped at the 76.4 ceiling.

Usage: python docs/experiments/exp_nq1416c.py [nelmt]
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


def _dualw_kernel(nm0, nm1, nq0, nq1, em, precision,
                  cpm_ref, b1t_ref, b0_ref, in_ref, out_ref, w_ref):
    epb = in_ref.shape[-1]
    odt = out_ref.dtype
    sl = slice(em, epb)
    # 1. stage-1 dots, all p upfront (no inter-dependencies)
    for p in range(nm0):
        w_ref[p] = _dot(b1t_ref[:], in_ref[p, :, sl],
                        precision).astype(w_ref.dtype)
    # 2. dense kron for the em columns: issued here, stored at the end
    if em:
        flat = in_ref[:].reshape(nm0 * nm1, epb)
        og = _dot(cpm_ref[:], flat[:, :em], precision)
    # 3. stage-2 VPU loop: depends only on w — runs under the kron
    for i in range(nq0):
        acc = w_ref[0] * b0_ref[0, i]
        for p in range(1, nm0):
            acc += w_ref[p] * b0_ref[p, i]
        out_ref[i, :, sl] = acc.astype(odt)
    # 4. the only instruction that waits on the kron
    if em:
        out_ref[:, :, :em] = og.reshape(nq0, nq1, em).astype(odt)


def qp_dualw(in_pcoa3, cpm, b1t, b0, *, nq0, nq1, em, epb,
             interpret=False, precision=HIGHEST):
    b0 = b0.astype(common.acc_dtype(in_pcoa3.dtype))
    nm0, nm1, e = in_pcoa3.shape
    grid = (e // epb,)
    ev = epb - em
    return pl.pallas_call(
        functools.partial(_dualw_kernel, nm0, nm1, nq0, nq1, em, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec(cpm.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq1, nm1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm0, nm1, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq0, nq1, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq0, nq1, e), in_pcoa3.dtype),
        scratch_shapes=[pltpu.VMEM((nm0, nq1, ev), in_pcoa3.dtype)],
        interpret=interpret,
        **_parallel_params(interpret),
    )(cpm, b1t, b0, in_pcoa3)


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
    b1t = jnp.asarray(np.asarray(basis.b1).T)
    cpm = jnp.asarray(np.kron(np.asarray(basis.b0).T,
                              np.asarray(basis.b1).T))

    for em, epb in cases:
        fn = jax.jit(functools.partial(
            qp_dualw, nq0=nq0, nq1=nq1, em=em, epb=epb))
        label = f"nq{nq} dualw em={em} epb={epb}"
        try:
            t, w = timing.measure(
                fn, (in_pcoa3, cpm, b1t, b0), cfg,
                chain_fn=eps_chain(fn, eps_arg=1), with_witness=True)
            norm = float(np.sqrt(w))
            err = abs(norm - ref_norm) / ref_norm
            print(f"{label:36s} {dof / t:8.2f} GDOF/s  rel-err {err:.2e}",
                  flush=True)
        except Exception as ex:
            print(f"{label:36s} FAIL {str(ex).splitlines()[0][:110]}",
                  flush=True)


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    cfg = Config(timing="chained")
    cases = [(0, 2048), (256, 2048), (512, 2048), (768, 2048),
             (512, 4096), (1024, 4096), (1536, 4096)]
    for nq in (14, 16):
        run_nq(nq, nelmt, cases, cfg)


if __name__ == "__main__":
    main()
