"""Chunk-width sweep for the low-order blocked MXU kron (VERDICT #4 cont).

exp_lo46.py found (nelmt=1Mi, v5e): the nq=4 copy-probe sustains 59.4
GDOF/s-equiv through the exact op geometry (the interpolated ceiling is
real), and the pure-MXU kron on 262144-element chunks reads 50.7 vs the
committed tier's 44.9 (which runs ce=8192 chunks from epb_kron).  Chunk
width is the lever: this sweeps kron_blocked's ce at nq=4/6, both
3D-blocked (nblk, nmTot, ce) and the 4D wide form.

Usage: python docs/experiments/exp_lo46b.py [nelmt]
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
from tpu_bench.baselines import bwdtrans2d as xla_bt


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
        in_blk = bwdtrans.blocked_coa(in_coa, ce)
        fn = jax.jit(functools.partial(pl_bt.kron_blocked))
        label = f"nq{nq} kron_blocked ce={ce}"
        try:
            t, w = timing.measure(
                fn, (in_blk, c_coa), cfg,
                chain_fn=eps_chain(fn, eps_arg=1), with_witness=True)
            norm = float(np.sqrt(w))
            err = abs(norm - ref_norm) / ref_norm
            print(f"{label:34s} {dof / t:8.2f} GDOF/s  rel-err {err:.2e}",
                  flush=True)
        except Exception as ex:
            print(f"{label:34s} FAIL {str(ex).splitlines()[0][:110]}",
                  flush=True)
        del in_blk


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    cfg = Config(timing="chained")
    for nq in (4, 6):
        run_nq(nq, nelmt, (16384, 32768, 65536, 131072, 262144, 524288), cfg)


if __name__ == "__main__":
    main()
