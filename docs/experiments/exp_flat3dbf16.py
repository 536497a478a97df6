"""bf16 3D plane-occupancy tax: qp_shared3d vs qp_shared3d_flat at bf16.

The f32 measurement (exp_flat3d.py, artifacts/wall/flat3d.log) routed the
3D QP tier around the per-plane sublane-padding DMA tax; the f32 dispatch
gate landed at @8df2bfc.  At bf16 the sublane tile is 16 rows, so the tax
map shifts: nq=8^3 input planes are 49 rows (76.6% of the 64-row padded
tile), nq=10^3 planes 81 rows (84.4%), outputs 64 (100%) / 100 (89.3%).
The bf16 b05 nq=10^3 cell sits at 137.4 GDOF/s = 94% of its halved-traffic
bus ceiling (round4.md par. 8) — if the committed gap is the plane tax,
flat blocks should claim most of it.

Measures back-to-back in one session, for nq in {8, 10}, bf16 inputs
(f32 vreg accumulation in both kernels — the production qp_f32v form):

  A  production   qp_shared3d       (nm0, nrq, E) plane blocks, epb sweep
  B  flat         qp_shared3d_flat  (nm0*nrq, E) flat blocks, epb sweep

Usage: python docs/experiments/exp_flat3dbf16.py [nelmt]  (default 262144)
"""
import os as _os
import sys

sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bench.core.config import Config
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.core.validate import l2norm
from tpu_bench.kernels import bwdtrans3d as pl3
from tpu_bench.ops import bwdtrans, initdata

HIGHEST = jax.lax.Precision.HIGHEST


def run(label, fn, args, dof, ref_norm, cfg):
    try:
        t, w = timing.measure(fn, args, cfg,
                              chain_fn=eps_chain(fn, eps_arg=1),
                              with_witness=True)
        err = abs(float(np.sqrt(w)) - ref_norm) / ref_norm
        print(f"{label:36s} {dof / t:8.2f} GDOF/s  rel-err {err:.2e}",
              flush=True)
    except Exception as ex:
        print(f"{label:36s} FAIL {str(ex).splitlines()[0][:100]}",
              flush=True)


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    e_pad = initdata.round_up(nelmt, 128)
    assert e_pad == nelmt, "use a multiple of 128"
    cfg = Config(timing="chained")
    dt = jnp.bfloat16

    for nq in (8, 10):
        basis = bwdtrans.make_basis3d(nq, nq, nq, dt)
        src = bwdtrans.stream_sources(
            bwdtrans.element_data3d(basis, dt),
            (basis.nm2, basis.nm1, basis.nm0), nelmt, e_pad, dt)
        c12t = bwdtrans.operators3d(basis)[1]
        nrq = basis.nm2 * basis.nm1
        nkj = c12t.shape[0]
        dof = 1e-9 * nelmt * basis.nm_tot
        in_pcoa3 = src["pcoa3"]()
        ref = float(np.linalg.norm(
            np.asarray(c12t, np.float64)
            @ (np.asarray(basis.b0, np.float64).T
               @ np.asarray(in_pcoa3[:, :, 0], np.float64)).T)
            * np.sqrt(nelmt))
        occ_r = nrq / ((nrq + 15) // 16 * 16)
        occ_w = nkj / ((nkj + 15) // 16 * 16)
        print(f"bf16 nq={nq}^3 nelmt={nelmt} plane occupancy in {occ_r:.3f} "
              f"out {occ_w:.3f} ref norm {ref:.6f}", flush=True)
        for epb in (512, 1024, 2048):
            run(f"A qp_shared3d      nq={nq} epb={epb:5d}",
                jax.jit(functools.partial(pl3.qp_shared3d, epb=epb,
                                          precision=HIGHEST)),
                (in_pcoa3, basis.b0, c12t), dof, ref, cfg)
        in_flat = in_pcoa3.reshape(basis.nm0 * nrq, e_pad)
        for epb in (512, 1024, 2048):
            run(f"B qp_shared3d_flat nq={nq} epb={epb:5d}",
                jax.jit(functools.partial(pl3.qp_shared3d_flat, nrq=nrq,
                                          epb=epb, precision=HIGHEST)),
                (in_flat, basis.b0, c12t), dof, ref, cfg)
        del in_pcoa3, in_flat, src


if __name__ == "__main__":
    main()
