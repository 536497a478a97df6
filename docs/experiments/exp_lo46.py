"""b04 nq=4/6 low-order lift (round 3, VERDICT #4).

Committed state: every tier sits at ~78% (nq=4: 44.9/58.1) and ~84%
(nq=6: 56.2/66.9) of the interpolated empirical mix ceilings, with both
the MXU kron and the VPU kron individually capable of exceeding the
ceiling rate on paper — i.e. either the kernels leave overlap on the
table or the interpolated ceiling is optimistic for this exact geometry.

Two measurements on the wide-chunk blocked layout (the committed tier's):
  1. copy-through probe — exactly the op's traffic (read nmTot rows,
     write nqTot rows per chunk), zero math: the REAL ceiling for this
     geometry, replacing the interpolated one.
  2. dual-path kron — cmr 128-lane column groups of each chunk through
     one dense kron GEMM (MXU), the rest through unrolled VPU FMAs; the
     two units run concurrently (intra-step overlap), so the combined
     rate should reach whatever 1. measures.  cmr=0 and cmr=cr reproduce
     kron_vpu_blocked / kron_blocked.

Usage: python docs/experiments/exp_lo46.py [nelmt]
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


def _dual_blk_kernel(nq, nm, cmr, precision, c_ref, cs_ref, in_ref, out_ref):
    odt = out_ref.dtype
    cr = in_ref.shape[2]
    if cmr:
        flat = in_ref[0, :, :cmr].reshape(nm, cmr * 128)
        og = _dot(c_ref[:], flat, precision)
        out_ref[0, :, :cmr] = og.reshape(nq, cmr, 128).astype(odt)
    if cmr < cr:
        for t in range(nq):
            acc = in_ref[0, 0, cmr:] * cs_ref[t, 0]
            for p in range(1, nm):
                acc += in_ref[0, p, cmr:] * cs_ref[t, p]
            out_ref[0, t, cmr:] = acc.astype(odt)


def dual_blk(in_blk4, c_coa, cs, *, cmr, interpret=False, precision=HIGHEST):
    nblk, nm, cr, lanes = in_blk4.shape
    nq = c_coa.shape[0]
    return pl.pallas_call(
        functools.partial(_dual_blk_kernel, nq, nm, cmr, precision),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nq, nm), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nm, cr, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nq, cr, lanes), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, nq, cr, lanes), in_blk4.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(c_coa, cs, in_blk4)


def _probe_kernel(nq, nm, b_ref, in_ref, out_ref):
    x = in_ref[0] + b_ref[0, 0]
    for t in range(nq):
        out_ref[0, t] = x[t % nm]


def probe_blk(in_blk4, bias, nq, *, interpret=False):
    nblk, nm, cr, lanes = in_blk4.shape
    return pl.pallas_call(
        functools.partial(_probe_kernel, nq, nm),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nm, cr, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nq, cr, lanes), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, nq, cr, lanes), in_blk4.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(bias, in_blk4)


def run_nq(nq, nelmt, cmrs, cfg):
    basis = bwdtrans.make_basis2d(nq, nq, jnp.float32)
    _, in_coa = bwdtrans.make_inputs2d(basis, nelmt, nelmt, jnp.float32)
    nm_tot, nq_tot = basis.nm_tot, basis.nq_tot
    dof = 1e-9 * nelmt * nm_tot
    ref_norm = l2norm(xla_bt.einsum_coa(
        in_coa.reshape(basis.nm1, basis.nm0, nelmt), basis.b0, basis.b1))
    ce = bwdtrans.wide_chunk_elems(nelmt)
    cr = ce // 128
    in_blk4 = bwdtrans.blocked_coa(in_coa, ce).reshape(
        nelmt // ce, nm_tot, cr, 128)
    c_np = np.kron(np.asarray(basis.b1).T, np.asarray(basis.b0).T)
    c_coa = jnp.asarray(c_np)
    print(f"nq={nq} nelmt={nelmt} ce={ce} ref norm {ref_norm:.6f}",
          flush=True)

    bias = jnp.zeros((1, 1), jnp.float32)
    fnp = jax.jit(functools.partial(probe_blk, nq=nq_tot))
    t = timing.measure(fnp, (in_blk4, bias), cfg,
                       chain_fn=eps_chain(fnp, eps_arg=1))
    print(f"nq{nq} copy-probe            {dof / t:8.2f} GDOF/s-equiv",
          flush=True)

    for cmr in cmrs:
        fn = jax.jit(functools.partial(dual_blk, cmr=cmr))
        label = f"nq{nq} dual cmr={cmr}/{cr}"
        try:
            t, w = timing.measure(
                fn, (in_blk4, c_coa, c_coa), cfg,
                chain_fn=eps_chain(fn, eps_arg=1), with_witness=True)
            norm = float(np.sqrt(w))
            err = abs(norm - ref_norm) / ref_norm
            print(f"{label:28s} {dof / t:8.2f} GDOF/s  rel-err {err:.2e}",
                  flush=True)
        except Exception as ex:
            print(f"{label:28s} FAIL {str(ex).splitlines()[0][:110]}",
                  flush=True)


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    cfg = Config(timing="chained")
    run_nq(4, nelmt, (0, 512, 1024, 1536, 2048), cfg)
    run_nq(6, nelmt, (0, 1024, 1536, 2048), cfg)


if __name__ == "__main__":
    main()
