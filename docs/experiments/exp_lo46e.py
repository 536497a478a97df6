"""wide4 kron form on 3D (b05) low order — does the 2D win transfer?

2D result (exp_lo46d.py): the 4D-wide blocked kron at ce=32768 reaches
95-98% of the copy-probe rate at nq=4..12.  3D's Coales tier (committed:
kron_blocked, 3D-minor form, epb_kron chunks) peaks 45.0 (nq=4^3, 94% of
the interpolated ceiling) and 60.0 (nq=6^3).  VMEM bounds the chunk:
(nmTot+nqTot)*ce*8B (double-buffered in+out) must stay well under the
~128 MB VMEM, so 3D sweeps smaller ce than 2D.

Usage: python docs/experiments/exp_lo46e.py [nelmt]
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
from tpu_bench.kernels import bwdtrans2d as pl_bt
from tpu_bench.ops import bwdtrans
from tpu_bench.baselines import bwdtrans3d as xla_bt3


def run_nq(nq, nelmt, ces, cfg):
    basis = bwdtrans.make_basis3d(nq, nq, nq, jnp.float32)
    _, in_coa = bwdtrans.make_inputs3d(basis, nelmt, nelmt, jnp.float32)
    dof = 1e-9 * nelmt * basis.nm_tot
    c3 = np.kron(np.asarray(basis.b2).T,
                 np.kron(np.asarray(basis.b1).T, np.asarray(basis.b0).T))
    c_coa3 = jnp.asarray(c3)
    ref_norm = l2norm(xla_bt3.einsum_coa(
        in_coa.reshape(basis.nm2, basis.nm1, basis.nm0, nelmt),
        basis.b0, basis.b1, basis.b2))
    print(f"nq={nq}^3 nelmt={nelmt} ref norm {ref_norm:.6f}", flush=True)
    for ce in ces:
        cr = ce // 128
        in_blk4 = bwdtrans.blocked_coa(in_coa, ce).reshape(
            nelmt // ce, basis.nm_tot, cr, 128)
        fn = jax.jit(functools.partial(pl_bt.kron_wide4))
        label = f"nq{nq}^3 wide4 ce={ce}"
        try:
            t, w = timing.measure(
                fn, (in_blk4, c_coa3), cfg,
                chain_fn=eps_chain(fn, eps_arg=1), with_witness=True)
            norm = float(np.sqrt(w))
            err = abs(norm - ref_norm) / ref_norm
            print(f"{label:26s} {dof / t:8.2f} GDOF/s  rel-err {err:.2e}",
                  flush=True)
        except Exception as ex:
            print(f"{label:26s} FAIL {str(ex).splitlines()[0][:110]}",
                  flush=True)
        del in_blk4


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    cfg = Config(timing="chained")
    run_nq(4, nelmt, (16384, 32768, 65536), cfg)
    run_nq(6, nelmt, (8192, 16384, 32768), cfg)


if __name__ == "__main__":
    main()
