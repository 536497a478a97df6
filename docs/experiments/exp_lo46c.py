"""Low-order blocked kron, take 3: 4D-wide MXU form + MXU/VPU mix.

exp_lo46.py/exp_lo46b.py (nelmt=1Mi, v5e): the SAME dense kron GEMM at
the SAME ce=262144 chunk width reads 50.7 GDOF/s through the 4D
(nblk, nm, ce/128, 128) block form vs 42.7 through the 3D (nblk, nm, ce)
form — Mosaic tiles the explicit (cr, 128) minor structure better than a
262144-wide minor dim.  The nq=4 copy-probe says 59.4 is the geometry's
real ceiling; at nq=6 the probe says 67.5 while pure-MXU tops at ~55.6
(MXU ~84% busy at probe rate -> needs the VPU to carry ~25% of columns).

Sweeps here: pure-MXU 4D (cmr=cr) over ce, and the MXU/VPU mixed split
at the balance fractions, at nq=4 and nq=6.

Usage: python docs/experiments/exp_lo46c.py [nelmt]
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

from exp_lo46 import dual_blk  # noqa: E402


def run_nq(nq, nelmt, cases, cfg):
    basis = bwdtrans.make_basis2d(nq, nq, jnp.float32)
    _, in_coa = bwdtrans.make_inputs2d(basis, nelmt, nelmt, jnp.float32)
    dof = 1e-9 * nelmt * basis.nm_tot
    ref_norm = l2norm(xla_bt.einsum_coa(
        in_coa.reshape(basis.nm1, basis.nm0, nelmt), basis.b0, basis.b1))
    c_coa = jnp.asarray(np.kron(np.asarray(basis.b1).T,
                                np.asarray(basis.b0).T))
    print(f"nq={nq} nelmt={nelmt} ref norm {ref_norm:.6f}", flush=True)
    for ce, frac in cases:
        cr = ce // 128
        cmr = cr if frac is None else max(1, int(cr * frac))
        in_blk4 = bwdtrans.blocked_coa(in_coa, ce).reshape(
            nelmt // ce, basis.nm_tot, cr, 128)
        fn = jax.jit(functools.partial(dual_blk, cmr=cmr))
        label = f"nq{nq} ce={ce} cmr={cmr}/{cr}"
        try:
            t, w = timing.measure(
                fn, (in_blk4, c_coa, c_coa), cfg,
                chain_fn=eps_chain(fn, eps_arg=1), with_witness=True)
            norm = float(np.sqrt(w))
            err = abs(norm - ref_norm) / ref_norm
            print(f"{label:30s} {dof / t:8.2f} GDOF/s  rel-err {err:.2e}",
                  flush=True)
        except Exception as ex:
            print(f"{label:30s} FAIL {str(ex).splitlines()[0][:110]}",
                  flush=True)
        del in_blk4


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    cfg = Config(timing="chained")
    run_nq(4, nelmt, [(32768, None), (65536, None), (131072, None),
                      (262144, None), (131072, 0.55), (262144, 0.55)], cfg)
    run_nq(6, nelmt, [(32768, None), (65536, None), (131072, None),
                      (65536, 0.75), (131072, 0.75)], cfg)


if __name__ == "__main__":
    main()
