"""3D plane-occupancy tax: qp_shared3d vs the flat-block qp_shared3d_flat.

The 2D qp_w_flat result (exp_nq14d.py, artifacts/wall/nq14d.log) showed
per-plane DMA of r-row tiles runs at the last-8-sublane-tile occupancy
r / (ceil(r/8)*8), and that streaming the same bytes as flat blocks with
in-kernel plane slicing removes the tax.  The 3D fused QP kernel pays the
same tax on every order: its input blocks are (nm0, nrq, epb) with
nrq = nm2*nm1 rows per plane — 49 rows at nq=8^3 (87.5% occupancy),
81 at nq=10^3 (92.0%), 25 at nq=6^3 (78.1%) — and its output planes are
nkj = nq2*nq1 rows (64/100/36 -> 100%/96.2%/90%).  The occupancy-weighted
mix model predicts flat blocks buy +5% at nq=8^3 and +5.4% at nq=10^3 —
on the committed peaks (64.9/67.7 GDOF/s, 94%/93% of ceiling) that is the
remaining gap to the mix ceiling.

This experiment measures, back-to-back on one session, for nq in {6,8,10}:

  A  production   qp_shared3d on the (nm0, nrq, E) pcoa3 layout, epb sweep
  B  flat         qp_shared3d_flat on the same HBM bytes reshaped
                  (nm0*nrq, E), epb sweep

qp_shared3d_flat is bit-exact against qp_shared3d in interpret mode (same
v-first math, slices moved in-kernel).

Usage: python docs/experiments/exp_flat3d.py [nelmt]      (default 262144)
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
    dt = jnp.float32

    for nq in (6, 8, 10):
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
        occ_r = nrq / ((nrq + 7) // 8 * 8)
        occ_w = nkj / ((nkj + 7) // 8 * 8)
        print(f"nq={nq}^3 nelmt={nelmt} plane occupancy in {occ_r:.3f} "
              f"out {occ_w:.3f} ref norm {ref:.6f}", flush=True)
        for epb in (256, 512, 1024):
            run(f"A qp_shared3d      nq={nq} epb={epb:5d}",
                jax.jit(functools.partial(pl3.qp_shared3d, epb=epb,
                                          precision=HIGHEST)),
                (in_pcoa3, basis.b0, c12t), dof, ref, cfg)
        in_flat = in_pcoa3.reshape(basis.nm0 * nrq, e_pad)
        for epb in (256, 512, 1024):
            run(f"B qp_shared3d_flat nq={nq} epb={epb:5d}",
                jax.jit(functools.partial(pl3.qp_shared3d_flat, nrq=nrq,
                                          epb=epb, precision=HIGHEST)),
                (in_flat, basis.b0, c12t), dof, ref, cfg)
        del in_pcoa3, in_flat, src


if __name__ == "__main__":
    main()
