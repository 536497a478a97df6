"""mxu_g follow-up (round 3): precision ladder + generalization to nq14/16.

exp_nq32.py findings at nq=32, nelmt=262144 (v5e, chained HBM-honest):
  copy-through (exact op traffic, no math)   80.6-83.4 GDOF/s-equiv
  qp_shared (committed v-first hybrid)       39.8-40.1
  mxu_g g=2 HIGHEST                          55.0-55.6
  mxu_g g=4 HIGHEST                          52.7-53.0
  mxu_g g=2/4 DEFAULT                        79.5-81.0 (rel-err 3.7e-3)

So the round-2 "on-chip wall" conclusion is wrong: the traffic mix
sustains ~98% of shared-bus through this geometry, and the grouped
block-diagonal all-MXU kernel is bandwidth-bound at DEFAULT precision.
At HIGHEST (6 bf16 passes) it is MXU-bound at ~55.  This experiment
measures HIGH (3 passes, expected rel-err ~1e-6 — well inside the f32
cross-variant rtol 5e-4) and runs the same kernel at nq=14/16 where the
committed QP/Shared tier dips to 78% of ceiling (VERDICT r2 weak #2).

Usage: python docs/experiments/exp_nq32b.py [nelmt]
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
from tpu_bench.ops import bwdtrans
from tpu_bench.baselines import bwdtrans2d as xla_bt

from exp_nq32 import mxu_g, _block_diag  # noqa: E402

PREC = {"HIGHEST": jax.lax.Precision.HIGHEST,
        "HIGH": jax.lax.Precision.HIGH,
        "DEFAULT": jax.lax.Precision.DEFAULT}


def run_nq(nq, nelmt, gs, precs, epbs, cfg):
    basis = bwdtrans.make_basis2d(nq, nq, jnp.float32)
    in_em2, in_coa = bwdtrans.make_inputs2d(basis, nelmt, nelmt, jnp.float32)
    nm0, nm1, nq0, nq1 = basis.nm0, basis.nm1, basis.nq0, basis.nq1
    dof = 1e-9 * nelmt * basis.nm_tot
    ref_norm = l2norm(xla_bt.einsum_coa(
        in_coa.reshape(nm1, nm0, nelmt), basis.b0, basis.b1))
    print(f"nq={nq} nelmt={nelmt} ref norm {ref_norm:.6f}", flush=True)

    in_pcoa3 = np.asarray(
        in_coa.reshape(nm1, nm0, nelmt).transpose(1, 0, 2))
    b0_np = np.asarray(basis.b0, np.float32)
    b1t_np = np.asarray(basis.b1.T, np.float32)

    for g in gs:
        ngrp = -(-nm0 // g)
        nm0p = ngrp * g
        in_p = np.zeros((nm0p, nm1, nelmt), np.float32)
        in_p[:nm0] = in_pcoa3
        in_g3 = jnp.asarray(in_p.reshape(ngrp, g * nm1, nelmt))
        s1g = jnp.asarray(_block_diag(b1t_np, g))
        b0t_p = np.zeros((nq0, nm0p), np.float32)
        b0t_p[:, :nm0] = b0_np.T
        s2g = jnp.asarray(_block_diag(b0t_p, g))
        for pname in precs:
            for epb in epbs:
                fn = jax.jit(functools.partial(
                    mxu_g, nq0=nq0, nq1=nq1, nm0p=nm0p, g=g, epb=epb,
                    precision=PREC[pname]))
                label = f"nq{nq} mxu_g g={g} {pname} epb={epb}"
                try:
                    t, w = timing.measure(
                        fn, (in_g3, s1g, s2g), cfg,
                        chain_fn=eps_chain(fn, eps_arg=1), with_witness=True)
                    norm = float(np.sqrt(w))
                    err = abs(norm - ref_norm) / ref_norm
                    print(f"{label:42s} {dof / t:8.2f} GDOF/s  "
                          f"rel-err {err:.2e}", flush=True)
                except Exception as ex:
                    print(f"{label:42s} FAIL "
                          f"{str(ex).splitlines()[0][:100]}", flush=True)


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    cfg = Config(timing="chained")
    run_nq(32, nelmt, gs=(2,), precs=("HIGH",), epbs=(512, 1024), cfg=cfg)
    run_nq(16, nelmt, gs=(8,), precs=("HIGHEST", "HIGH"), epbs=(512, 1024),
           cfg=cfg)
    # g must divide nq1 (mxu_g's stage-2 slab loop): nq14 -> g=7
    run_nq(14, nelmt, gs=(7,), precs=("HIGHEST", "HIGH"), epbs=(512, 1024),
           cfg=cfg)


if __name__ == "__main__":
    main()
