"""Diagnose kron_vpu_ring's shortfall at nq=2 (round 3).

Context: the expand probes measure 1R:{2,4,8}W manual-DMA mixes at
642-666 GB/s combined on 512 MiB buffers, but the production ring read
216 GB/s (10.8 GDOF/s) on b04 nq=2 nelmt=1M — where total op traffic is
just 20 MB.  Suspects: chunk width (512 KB vs the probes' 16 MB), ring
length (8 chunks), fori/semaphore overhead at tiny sizes, or the VPU
expand step.  This sweeps chunk width x depth for the ring and compares
a Mosaic-auto-pipelined VPU kron (kron_blocked minus the MXU) plus the
XLA einsum reference point, at b05 nq=2^3 shapes (the losing cell:
reference 18.45 GDOF/s) and at 4x the size to separate fixed overhead
from pattern cost.

Usage: python docs/experiments/exp_ring.py [nelmt ...]
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
from tpu_bench.kernels import stream
from tpu_bench.kernels.common import LANES, grid_semantics
from tpu_bench.ops import bwdtrans
from tpu_bench.baselines import bwdtrans3d as xla3


def _vpu_blk_kernel(nq, nm, c_ref, in_ref, out_ref):
    for t in range(nq):
        acc = in_ref[0, 0] * c_ref[t, 0]
        for p in range(1, nm):
            acc += in_ref[0, p] * c_ref[t, p]
        out_ref[0, t] = acc


def kron_vpu_auto(in_blk4, c_coa):
    """Mosaic-auto-pipelined VPU kron over blocked (nblk, nm, cr, 128)."""
    nblk, nm, cr, lanes = in_blk4.shape
    nq = c_coa.shape[0]
    return pl.pallas_call(
        functools.partial(_vpu_blk_kernel, nq, nm),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nm, cr, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nq, cr, lanes), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, nq, cr, lanes), in_blk4.dtype),
        **grid_semantics("parallel"),
    )(c_coa, in_blk4)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1048576, 4194304]
    cfg = Config(timing="chained")
    nq = 2
    basis = bwdtrans.make_basis3d(nq, nq, nq, jnp.float32)
    c_em3 = bwdtrans.operators3d(basis)[0]
    c_coa3 = jnp.asarray(c_em3.T)          # (8, 1)
    nq_tot = basis.nq_tot

    for nelmt in sizes:
        src = bwdtrans.stream_sources(
            bwdtrans.element_data3d(basis, jnp.float32), (1, 1, 1),
            nelmt, nelmt, jnp.float32)
        in_coa = src["coa"]()
        ref_norm = l2norm(xla3.einsum_coa(
            in_coa.reshape(1, 1, 1, nelmt), basis.b0, basis.b1, basis.b2))
        dof = 1e-9 * nelmt
        print(f"nelmt {nelmt}  ref norm {ref_norm:.6f}", flush=True)

        def bench(label, fn, args):
            try:
                t, w = timing.measure(fn, args, cfg,
                                      chain_fn=eps_chain(fn, eps_arg=1),
                                      with_witness=True)
                err = abs(float(np.sqrt(w)) - ref_norm) / ref_norm
                print(f"  {label:40s} {dof / t:8.2f} GDOF/s  err {err:.1e}",
                      flush=True)
            except Exception as ex:
                print(f"  {label:40s} FAIL {str(ex).splitlines()[0][:110]}",
                      flush=True)

        bench("XLA gemm_kron (committed winner)",
              jax.jit(functools.partial(xla3.gemm_kron)),
              (in_coa, c_coa3))

        for ce_elems in (65536, 262144, 524288):
            if nelmt % ce_elems or nelmt // ce_elems < 2:
                continue
            for depth in (2, 3):
                blk = src["blk"](ce_elems)
                fn = jax.jit(functools.partial(
                    stream.kron_vpu_ring, depth=depth))
                bench(f"ring ce={ce_elems} depth={depth}", fn,
                      (blk, c_coa3))

        for ce_elems in (65536, 262144):
            if nelmt % ce_elems:
                continue
            blk4 = src["blk"](ce_elems).reshape(
                nelmt // ce_elems, 1, ce_elems // LANES, LANES)
            bench(f"vpu-auto ce={ce_elems}",
                  jax.jit(kron_vpu_auto), (blk4, c_coa3))


if __name__ == "__main__":
    main()
