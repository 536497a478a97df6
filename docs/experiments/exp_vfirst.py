"""Experiment: reversed stage order for the fused 3D BwdTrans kernel.

Current qp_shared3d: MXU pair-contraction per p, then VPU accumulation with
out-block read-modify-write (VMEM traffic ~2*nm0*nq_tot per element).
Candidate ("v-first"): for each output plane i, VPU-combine the p modes of
the *input* (nm0*nrq reads, nrq-sized result) and issue ONE MXU dot per i,
writing each output plane exactly once:

    out[i] = C12T @ (sum_p b0[p,i] * in[p])

Per-element VMEM traffic drops ~2x; MXU work rises nq0/nm0 (~14%).
Run: python scripts/exp_vfirst.py   (on the TPU, device otherwise idle)
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.core.config import Config
from tpu_bench.core.timing import eps_chain, measure
from tpu_bench.benchmarks import benchmark05 as b05
from tpu_bench.kernels import bwdtrans3d as pl_bt

HIGHEST = jax.lax.Precision.HIGHEST


def _dot(a, b, precision):
    return jnp.dot(a, b, preferred_element_type=a.dtype, precision=precision)


def _vfirst_kernel(nm0, nq0, precision, c12t_ref, b0_ref, in_ref, out_ref):
    for i in range(nq0):
        v = in_ref[0] * b0_ref[0, i]
        for p in range(1, nm0):
            v += in_ref[p] * b0_ref[p, i]
        out_ref[i] = _dot(c12t_ref[:], v, precision)


def qp_vfirst3d(in_pcoa3, b0, c12t, *, epb, interpret=False,
                precision=HIGHEST):
    nm0, nrq, e = in_pcoa3.shape
    nq0 = b0.shape[1]
    nkj = c12t.shape[0]
    out = pl.pallas_call(
        functools.partial(_vfirst_kernel, nm0, nq0, precision),
        grid=(e // epb,),
        in_specs=[
            pl.BlockSpec((nkj, nrq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm0, nrq, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq0, nkj, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq0, nkj, e), in_pcoa3.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(c12t, b0, in_pcoa3)
    return out


def main():
    nelmt = 131072
    cfg = Config(n_tests=16)
    data = b05.prepare(8, 8, 8, nelmt, cfg)
    jax.block_until_ready(data["in_pcoa3"])
    args = (data["in_pcoa3"], data["b0"], data["c12t"])

    cur = jax.jit(functools.partial(pl_bt.qp_shared3d, epb=data["epb_qp"],
                                    interpret=cfg.interpret,
                                    precision=cfg.precision))
    ref = cur(*args)

    for epb in [1024, 2048, 4096]:
        try:
            fn = jax.jit(functools.partial(qp_vfirst3d, epb=epb,
                                           interpret=cfg.interpret,
                                           precision=cfg.precision))
            out = fn(*args)
            err = float(jnp.max(jnp.abs(out - ref)))
            t = measure(fn, args, cfg, chain_fn=eps_chain(fn, eps_arg=1))
            print(f"vfirst epb={epb}: {1e-9*nelmt*343/t:8.2f} GDOF/s "
                  f"maxerr={err:.2e}", flush=True)
        except Exception as ex:
            print(f"vfirst epb={epb}: FAIL {str(ex)[:110]}", flush=True)

    t = measure(cur, args, cfg, chain_fn=eps_chain(cur, eps_arg=1))
    print(f"current epb={data['epb_qp']}: {1e-9*nelmt*343/t:8.2f} GDOF/s",
          flush=True)


if __name__ == "__main__":
    main()
