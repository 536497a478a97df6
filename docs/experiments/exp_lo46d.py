"""4D-wide blocked kron: chunk-width optimum across nq (VERDICT #4 wrap).

exp_lo46c.py: pure-MXU 4D-wide kron at ce=32768 reads 56.1 (nq=4, 95% of
the 59.4 copy-probe) and 65.3 (nq=6, 97% of 67.5) — both VERDICT targets
cleared with no VPU admixture.  This sweep finds the ce optimum and
checks whether the mid-order sweeps (nq=8..12), whose committed Coales
tier runs the 3D-blocked form at epb_kron chunks, gain as well.

Usage: python docs/experiments/exp_lo46d.py [nelmt]
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


def run_nq(nq, nelmt, ces, cfg):
    basis = bwdtrans.make_basis2d(nq, nq, jnp.float32)
    _, in_coa = bwdtrans.make_inputs2d(basis, nelmt, nelmt, jnp.float32)
    dof = 1e-9 * nelmt * basis.nm_tot
    ref_norm = l2norm(xla_bt.einsum_coa(
        in_coa.reshape(basis.nm1, basis.nm0, nelmt), basis.b0, basis.b1))
    c_coa = jnp.asarray(np.kron(np.asarray(basis.b1).T,
                                np.asarray(basis.b0).T))
    print(f"nq={nq} nelmt={nelmt} ref norm {ref_norm:.6f}", flush=True)
    for ce in ces:
        cr = ce // 128
        in_blk4 = bwdtrans.blocked_coa(in_coa, ce).reshape(
            nelmt // ce, basis.nm_tot, cr, 128)
        fn = jax.jit(functools.partial(dual_blk, cmr=cr))
        label = f"nq{nq} wide4 ce={ce}"
        try:
            t, w = timing.measure(
                fn, (in_blk4, c_coa, c_coa), cfg,
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
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    cfg = Config(timing="chained")
    run_nq(4, nelmt, (8192, 16384, 32768), cfg)
    run_nq(6, nelmt, (8192, 16384, 32768), cfg)
    run_nq(8, nelmt, (8192, 16384, 32768), cfg)
    run_nq(10, nelmt, (8192, 16384), cfg)
    run_nq(12, nelmt, (8192, 16384), cfg)


if __name__ == "__main__":
    main()
