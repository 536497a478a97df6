"""3D low/mid-order Coales tier: does the wide-4D MXU kron win in 3D too?

Round 3 moved the 2D nq>=4 Coales tier from the flat-minor chunk-
interleaved kron_blocked to kron_wide4 (the 4D (nblk, nmTot, ce/128, 128)
blocked form at ce=32768): 56.1 vs 44.9 GDOF/s at nq=4²
(docs/experiments/exp_lo46d.py).  benchmark05 still dispatches
kron_blocked for nq>=4 in 3D, where the committed nq=4³ Pallas(Coales)
peak (45.0) sits at 89% of the empirical mix ceiling (~50.5) — the lowest
non-wall 3D cell.  The kron math is dimension-agnostic (the 3D operator is
just bigger: (64, 27) at nq=4³ vs (16, 9) at nq=4²), so the same 4D form
should tile better here as well.  Measures, per nq in (4, 6):

  A  production     kron_blocked on the epb_kron chunk-interleaved layout,
                    exactly as benchmark05 dispatches it
  B  wide4 sweep    kron_wide4 on the wide-4D blocked layout at several
                    chunk caps (2D optimum was 32768)

Usage: python docs/experiments/exp_lo3d.py [nelmt]   (default 1048576)
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
from tpu_bench.kernels.bwdtrans2d import kron_blocked, kron_wide4
from tpu_bench.benchmarks import benchmark04 as b04_mod
from tpu_bench.benchmarks import benchmark05 as b05_mod
from tpu_bench.ops import bwdtrans, initdata


def run_nq(nq, nelmt, cfg):
    basis = bwdtrans.make_basis3d(nq, nq, nq, jnp.float32)
    e_pad = initdata.round_up(nelmt, 128)
    src = bwdtrans.stream_sources(
        bwdtrans.element_data3d(basis, jnp.float32),
        (basis.nm2, basis.nm1, basis.nm0), nelmt, e_pad, jnp.float32)
    c_coa3 = jnp.asarray(bwdtrans.operators3d(basis)[0].T)
    dof = 1e-9 * nelmt * basis.nm_tot
    ref_norm = float(np.linalg.norm(bwdtrans.reference3d(basis, e_pad)))
    print(f"nq={nq}^3 nelmt={nelmt} ref norm {ref_norm:.6f}", flush=True)

    def run(label, fn, args):
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

    # A: production path — epb_kron exactly as benchmark05.prepare sizes it
    data = b05_mod.prepare(nq, nq, nq, nelmt, cfg)
    in_blk = data["in_blk"]
    run(f"A kron_blocked  epb={data['epb_kron']:6d}",
        jax.jit(kron_blocked), (in_blk, c_coa3))
    del in_blk, data

    # B: the 2D winner's 4D form over chunk caps
    for cap in (8192, 16384, 32768, 65536, 131072):
        in_blk4 = b04_mod._blk4(src, basis.nm_tot, e_pad, cap)
        run(f"B kron_wide4    cap={cap:6d} (ce={in_blk4.shape[2] * 128})",
            jax.jit(kron_wide4), (in_blk4, c_coa3))
        del in_blk4


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    cfg = Config(timing="chained")
    for nq in (4, 6):
        run_nq(nq, nelmt, cfg)


if __name__ == "__main__":
    main()
