"""b04 nq=32 wall attack (round 3, VERDICT #1).

Round 2 measured every variant clustering at ~40 GDOF/s = 49% of the
85.4 shared-bus ceiling and concluded "on-chip bound" from two facts:
fusing the workspace into VMEM does not help, and cutting MXU passes 6x
(DEFAULT precision) buys only 1.2x (docs/experiments/exp_b04hi.py).
This experiment separates the remaining suspects:

  1. copy-through — a Pallas kernel with EXACTLY the op's HBM traffic
     (read 961 rows, write 1024 rows per element block) and no math.
     If this also lands ~40 GDOF/s-equivalent, the wall is DMA/shape
     (how fast the chip streams this mix at these block geometries),
     not compute — the roofline's big-buffer directional probes would
     simply not transfer to this mix.
  2. qp_shared epb sweep — is the committed epb leaving overlap on the
     table?
  3. mxu_g — both stages as G-grouped block-diagonal MXU GEMMs
     (G=4: operators (128,124)/(128,128), ~97% MXU tile utilization vs
     6% for the naive (32,31)-shaped stage dots), with the inter-stage
     (p,q)->(q,p) relayout done by G-slab strided VMEM writes.  At
     HIGHEST this issues 262k MAC/elem vs 984k for the dense kron and
     62.5k (at 6% utilization) for naive sum-factorization.

Usage: python docs/experiments/exp_nq32.py [nelmt] [epb ...]
"""
import os as _os, sys
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.core.config import Config
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.core.validate import l2norm
from tpu_bench.kernels import bwdtrans2d as k2
from tpu_bench.kernels.common import grid_semantics
from tpu_bench.ops import bwdtrans
from tpu_bench.baselines import bwdtrans2d as xla_bt

HIGHEST = jax.lax.Precision.HIGHEST
NQ = 32


# ---- 1. copy-through: the op's traffic, none of its math ----------------


def _copy_kernel(b_ref, in_ref, out_ref):
    nm = in_ref.shape[0]
    nq = out_ref.shape[0]
    x = in_ref[:] + b_ref[0, 0]
    out_ref[:nm] = x
    out_ref[nm:] = x[: nq - nm]


def copy_through(in_coa, bias, nq_tot, *, epb):
    nm_tot, e = in_coa.shape
    return pl.pallas_call(
        _copy_kernel,
        grid=(e // epb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nm_tot, epb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq_tot, epb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_tot, e), in_coa.dtype),
        **grid_semantics("parallel"),
    )(bias, in_coa)


# ---- 3. G-grouped block-diagonal all-MXU kernel --------------------------


def _block_diag(m, g):
    r, c = m.shape
    out = np.zeros((g * r, g * c), m.dtype)
    for k in range(g):
        out[k * r:(k + 1) * r, k * c:(k + 1) * c] = m
    return out


def _mxu_g_kernel(ngrp, g, nq1, nq0, nm0p, precision, s1_ref, s2_ref,
                  in_ref, out_ref, w_ref):
    for gi in range(ngrp):
        wg = k2._dot(s1_ref[:], in_ref[gi], precision)      # (g*nq1, epb)
        for k in range(g):
            w_ref[:, gi * g + k, :] = wg[k * nq1:(k + 1) * nq1]
    for h in range(nq1 // g):
        slab = w_ref[h * g:(h + 1) * g].reshape(g * nm0p, w_ref.shape[-1])
        og = k2._dot(s2_ref[:], slab, precision)            # (g*nq0, epb)
        for k in range(g):
            out_ref[h * g + k] = og[k * nq0:(k + 1) * nq0]


def mxu_g(in_g3, s1g, s2g, nq0, nq1, nm0p, *, g, epb, precision=HIGHEST):
    ngrp, gnm1, e = in_g3.shape
    out = pl.pallas_call(
        functools.partial(_mxu_g_kernel, ngrp, g, nq1, nq0, nm0p, precision),
        grid=(e // epb,),
        in_specs=[
            pl.BlockSpec(s1g.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(s2g.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ngrp, gnm1, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq1, nq0, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq1, nq0, e), in_g3.dtype),
        scratch_shapes=[pltpu.VMEM((nq1, nm0p, epb), in_g3.dtype)],
        **grid_semantics("parallel"),
    )(s1g, s2g, in_g3)
    return out


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    epbs = [int(a) for a in sys.argv[2:]] or [256, 512, 1024]
    cfg = Config(timing="chained")
    dt = jnp.float32

    basis = bwdtrans.make_basis2d(NQ, NQ, dt)
    in_em2, in_coa = bwdtrans.make_inputs2d(basis, nelmt, nelmt, dt)
    nm0, nm1, nq0, nq1 = basis.nm0, basis.nm1, basis.nq0, basis.nq1
    nm_tot, nq_tot = basis.nm_tot, basis.nq_tot
    dof = 1e-9 * nelmt * nm_tot

    ref_norm = l2norm(xla_bt.einsum_coa(
        in_coa.reshape(nm1, nm0, nelmt), basis.b0, basis.b1))
    print(f"nelmt {nelmt}  reference norm {ref_norm:.8f}")

    def bench(label, fn, args, eps_arg=0):
        try:
            t, w = timing.measure(fn, args, cfg,
                                  chain_fn=eps_chain(fn, eps_arg=eps_arg),
                                  with_witness=True)
            norm = float(np.sqrt(w))
            ok = abs(norm - ref_norm) / ref_norm
            print(f"{label:44s} {dof / t:8.2f} GDOF/s   norm rel-err {ok:.2e}",
                  flush=True)
        except Exception as ex:
            print(f"{label:44s} FAIL {str(ex).splitlines()[0][:120]}",
                  flush=True)

    bias = jnp.zeros((1, 1), dt)
    for epb in epbs:
        fn = jax.jit(functools.partial(copy_through, nq_tot=nq_tot, epb=epb))
        bench(f"copy-through epb={epb}", fn, (in_coa, bias), eps_arg=1)

    in_pcoa3 = jnp.asarray(
        in_coa.reshape(nm1, nm0, nelmt).transpose(1, 0, 2))
    b1t = jnp.asarray(basis.b1.T)
    for epb in epbs:
        fn = jax.jit(functools.partial(k2.qp_shared, epb=epb,
                                       precision=HIGHEST))
        bench(f"qp_shared (v-first) epb={epb}", fn,
              (in_pcoa3, basis.b0, b1t), eps_arg=1)

    b0_np = np.asarray(basis.b0, np.float32)        # (nm0, nq0)
    b1t_np = np.asarray(basis.b1.T, np.float32)     # (nq1, nm1)
    for g in (2, 4):
        ngrp = -(-nm0 // g)
        nm0p = ngrp * g
        # input regrouped (ngrp, g*nm1, E), zero-padding p beyond nm0
        in_p = np.zeros((nm0p, nm1, nelmt), np.float32)
        in_p[:nm0] = np.asarray(in_pcoa3)
        in_g3 = jnp.asarray(in_p.reshape(ngrp, g * nm1, nelmt))
        s1g = jnp.asarray(_block_diag(b1t_np, g))           # (g*nq1, g*nm1)
        b0t_p = np.zeros((nq0, nm0p), np.float32)
        b0t_p[:, :nm0] = b0_np.T
        # stage-2 consumes w rows (j-local, p): operator block-diag over j
        s2g = jnp.asarray(_block_diag(b0t_p, g))            # (g*nq0, g*nm0p)
        for prec, pname in ((HIGHEST, "HIGHEST"),
                            (jax.lax.Precision.DEFAULT, "DEFAULT")):
            for epb in epbs:
                fn = jax.jit(functools.partial(
                    mxu_g, nq0=nq0, nq1=nq1, nm0p=nm0p, g=g, epb=epb,
                    precision=prec))
                bench(f"mxu_g g={g} {pname} epb={epb}", fn,
                      (in_g3, s1g, s2g), eps_arg=1)


if __name__ == "__main__":
    main()
