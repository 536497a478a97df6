"""High-order 2D fused kernel: both stages on the MXU.

At nq=32 the fused v-kernel's stage-2 VPU accumulation (nm0*nq0 = 992
vector FMAs per block) is a suspect bottleneck — every variant clusters
at ~40 GDOF/s, 49% of the shared-bus ceiling.  This experiment moves
stage 2 onto the MXU: stage 1 fills a VMEM workspace laid out
(nq1, nm0, epb) via strided (nq1, 1, epb) writes, then stage 2 is nq1
MXU dots out[:, j, :] = B0^T @ w[j] — no reshapes, no VPU inner loops.

RESULT (v5e, 262144 elmts, fixed-window solo timing): the all-MXU
formulation reaches 33.3 GDOF/s at HIGHEST precision vs 26.6 for the
v-first kernel at this size — but still below the two-stage XLA kron's
41.7 despite halving HBM traffic.  Dropping to DEFAULT (one-pass bf16)
precision lifts it only to 40.4 (norm error 3.7e-3, unacceptable), i.e.
a 6x cut in MXU passes buys 1.2x — the ~40 GDOF/s wall at nq=32 is
on-chip (VMEM bandwidth / sublane-padded relayout) bound, not MXU-pass
or HBM bound.  Eleven committed variants plus these two prototypes all
cluster at the same wall; the committed XLA(Coales) 41.7 is the
practical machine limit for this op shape.

Usage: python scripts/exp_b04hi.py [nq] [nelmt] [epb ...]
"""
import functools
import sys
import time

import os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.core.config import Config
from tpu_bench.core import timing
from tpu_bench.kernels import bwdtrans2d as k2
from tpu_bench.benchmarks import benchmark04 as b04

HIGHEST = jax.lax.Precision.HIGHEST


def _mxu_kernel2(nm0, nq0, precision, b1t_ref, b0t_ref, in_ref, out_ref,
                 w_ref):
    # w laid (nq1, nm0, epb): stage1 strided writes, stage2 clean dots
    for p in range(nm0):
        w_ref[:, p, :] = k2._dot(b1t_ref[:], in_ref[p], precision)
    nq1 = b1t_ref.shape[0]
    for j in range(nq1):
        out_ref[:, j, :] = k2._dot(b0t_ref[:], w_ref[j], precision)


def qp_shared_mxu(in_pcoa3, b0t, b1t, *, epb, interpret=False,
                  precision=HIGHEST):
    nm0, nm1, e = in_pcoa3.shape
    nq0 = b0t.shape[0]
    nq1 = b1t.shape[0]
    grid = (e // epb,)
    return pl.pallas_call(
        functools.partial(_mxu_kernel2, nm0, nq0, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq1, nm1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq0, nm0), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nm0, nm1, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq0, nq1, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq0, nq1, e), in_pcoa3.dtype),
        scratch_shapes=[pltpu.VMEM((nq1, nm0, epb), in_pcoa3.dtype)],
        interpret=interpret,
        **k2._parallel_params(interpret),
    )(b1t, b0t, in_pcoa3)


def main():
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    nelmt = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    epbs = [int(a) for a in sys.argv[3:]] or [128, 256, 512]
    cfg = Config()
    data = b04.prepare(nq, nq, nelmt, cfg)
    in_pcoa3 = data["in_pcoa3"]
    b0, b1t = data["b0"], data["b1t"]
    b0t = jnp.asarray(b0).T.copy()
    e_pad = in_pcoa3.shape[2]
    nm = nq - 1
    dofs = nelmt * nm * nm

    # reference norm from the committed variant
    ref = k2.qp_shared(in_pcoa3, b0, b1t, epb=data["epb_qp"])
    ref_norm = float(jnp.linalg.norm(ref))
    t = timing.measure(
        functools.partial(k2.qp_shared, epb=data["epb_qp"]),
        (in_pcoa3, b0, b1t), cfg,
        chain_fn=timing.eps_chain(
            functools.partial(k2.qp_shared, epb=data["epb_qp"]), eps_arg=0))
    print(f"qp_shared (current, epb={data['epb_qp']}): "
          f"{1e-9 * dofs / t:.2f} GDOF/s  norm {ref_norm:.6f}", flush=True)

    for epb in epbs:
        if e_pad % epb:
            continue
        fn = functools.partial(qp_shared_mxu, epb=epb)
        try:
            out = fn(in_pcoa3, b0t, b1t)
            norm = float(jnp.linalg.norm(out))
            t = timing.measure(fn, (in_pcoa3, b0t, b1t), cfg,
                               chain_fn=timing.eps_chain(fn, eps_arg=0))
            ok = abs(norm - ref_norm) / ref_norm < 1e-5
            print(f"qp_shared_mxu epb={epb}: {1e-9 * dofs / t:.2f} GDOF/s  "
                  f"norm {norm:.6f} {'OK' if ok else 'MISMATCH'}", flush=True)
        except Exception as exc:
            print(f"qp_shared_mxu epb={epb}: FAILED {str(exc)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
