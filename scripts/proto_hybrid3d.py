"""Prototype: hybrid MXU/VPU fused 3D BwdTrans kernel vs current qp_shared3d.

Stage 1 contracts (r,q) jointly against kron(B2^T,B1^T) with one MXU dot per
p (nm0 medium dots instead of nrq+nq0 tiny ones); stage 2 contracts p on the
VPU with scalar basis weights from SMEM.
"""
import functools
import time

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


def _hybrid_kernel(nm0, nq0, precision, c12t_ref, b0t_ref, in_ref, out_ref,
                   w_ref):
    for p in range(nm0):
        w_ref[p] = _dot(c12t_ref[:], in_ref[p], precision)
    for i in range(nq0):
        acc = w_ref[0] * b0t_ref[i, 0]
        for p in range(1, nm0):
            acc = acc + w_ref[p] * b0t_ref[i, p]
        out_ref[:, i, :] = acc


def qp_hybrid3d(in_pcoa3, b0t, c12t, *, epb, interpret=False,
                precision=HIGHEST):
    nm0, nrq, e = in_pcoa3.shape
    nq0 = b0t.shape[0]
    nkj = c12t.shape[0]
    grid = (e // epb,)
    out = pl.pallas_call(
        functools.partial(_hybrid_kernel, nm0, nq0, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nkj, nrq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm0, nrq, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nkj, nq0, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nkj, nq0, e), in_pcoa3.dtype),
        scratch_shapes=[pltpu.VMEM((nm0, nkj, epb), in_pcoa3.dtype)],
        interpret=interpret,
    )(c12t, b0t, in_pcoa3)
    return out


def main():
    on_tpu = jax.default_backend() == "tpu"
    nelmt = 131072 if on_tpu else 1024
    cfg = Config(n_tests=16)
    data = b05.prepare(8, 8, 8, nelmt, cfg)
    in_pcoa3 = jnp.asarray(data["in_coa3"].transpose(1, 0, 2))
    jax.block_until_ready(in_pcoa3)

    # correctness vs existing kernel
    old_fn = functools.partial(pl_bt.qp_shared3d, epb=data["epb_qp"],
                               interpret=cfg.interpret,
                               precision=cfg.precision)
    ref = old_fn(data["in_coa3"], data["b0t"], data["c12t"])

    for epb in ([512, 1024, 2048] if on_tpu else [256]):
        new_fn = jax.jit(functools.partial(qp_hybrid3d, epb=epb,
                                           interpret=cfg.interpret,
                                           precision=cfg.precision))
        out = new_fn(in_pcoa3, data["b0t"], data["c12t"])
        err = float(jnp.max(jnp.abs(out - ref)))
        t = measure(new_fn, (in_pcoa3, data["b0t"], data["c12t"]), cfg,
                    chain_fn=eps_chain(new_fn, eps_arg=1))
        gd = 1e-9 * nelmt * 343 / t
        print(f"hybrid epb={epb}: {gd:8.2f} GDOF/s  maxerr={err:.3e}")

    t = measure(old_fn, (data["in_coa3"], data["b0t"], data["c12t"]), cfg,
                chain_fn=eps_chain(old_fn, eps_arg=1))
    print(f"old qp_shared3d epb={data['epb_qp']}: {1e-9*nelmt*343/t:8.2f} GDOF/s")


if __name__ == "__main__":
    main()
