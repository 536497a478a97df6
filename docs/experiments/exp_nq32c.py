"""mxu_g with a manual 3-pass compensated bf16 product (round 3).

exp_nq32/b established: at nq=32 the traffic mix sustains ~83
GDOF/s-equiv (copy-through), mxu_g DEFAULT (1 bf16 pass, rel-err 3.7e-3)
is bandwidth-bound at ~81, mxu_g HIGHEST (6-pass f32 emulation) is
MXU-bound at ~55.6, and Mosaic rejects Precision.HIGH in-kernel.

This measures the middle point built by hand: split each f32 operand into
bf16 hi + bf16-representable lo and take 3 DEFAULT passes
(hi*hi + hi*lo + lo*hi) — XLA's own HIGH scheme.  MXU work halves vs
HIGHEST, so if the VPU splitting stays cheap the kernel should return to
bandwidth-bound ~80 with rel-err ~1e-6 (the dropped lo*lo term is
~2^-18 per product).

Usage: python docs/experiments/exp_nq32c.py [nelmt]
"""
import os as _os
import sys

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
from tpu_bench.kernels.common import grid_semantics
from tpu_bench.ops import bwdtrans
from tpu_bench.baselines import bwdtrans2d as xla_bt

from exp_nq32 import _block_diag  # noqa: E402

NQ = 32
DEFAULT = jax.lax.Precision.DEFAULT


def _split(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot1(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=DEFAULT)


def _dot3(s_hi, s_lo, x, passes=3):
    x_hi, x_lo = _split(x)
    acc = _dot1(s_hi, x_hi) + (_dot1(s_hi, x_lo) + _dot1(s_lo, x_hi))
    if passes == 4:
        acc = acc + _dot1(s_lo, x_lo)
    return acc


def _kernel(ngrp, g, nq1, nq0, nm0p, passes, s1h_ref, s1l_ref, s2h_ref,
            s2l_ref, in_ref, out_ref, w_ref):
    for gi in range(ngrp):
        wg = _dot3(s1h_ref[:], s1l_ref[:], in_ref[gi], passes)
        for k in range(g):
            w_ref[:, gi * g + k, :] = wg[k * nq1:(k + 1) * nq1]
    for h in range(nq1 // g):
        slab = w_ref[h * g:(h + 1) * g].reshape(g * nm0p, w_ref.shape[-1])
        og = _dot3(s2h_ref[:], s2l_ref[:], slab, passes)
        for k in range(g):
            out_ref[h * g + k] = og[k * nq0:(k + 1) * nq0]


def mxu_g3(in_g3, s1h, s1l, s2h, s2l, nq0, nq1, nm0p, *, g, epb, passes=3):
    ngrp, gnm1, e = in_g3.shape
    return pl.pallas_call(
        functools.partial(_kernel, ngrp, g, nq1, nq0, nm0p, passes),
        grid=(e // epb,),
        in_specs=[pl.BlockSpec(s.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
                  for s in (s1h, s1l, s2h, s2l)]
        + [pl.BlockSpec((ngrp, gnm1, epb), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nq1, nq0, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq1, nq0, e), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nq1, nm0p, epb), jnp.float32)],
        **grid_semantics("parallel"),
    )(s1h, s1l, s2h, s2l, in_g3)


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    cfg = Config(timing="chained")
    basis = bwdtrans.make_basis2d(NQ, NQ, jnp.float32)
    in_em2, in_coa = bwdtrans.make_inputs2d(basis, nelmt, nelmt, jnp.float32)
    nm0, nm1, nq0, nq1 = basis.nm0, basis.nm1, basis.nq0, basis.nq1
    dof = 1e-9 * nelmt * basis.nm_tot
    ref_norm = l2norm(xla_bt.einsum_coa(
        in_coa.reshape(nm1, nm0, nelmt), basis.b0, basis.b1))
    print(f"nq={NQ} nelmt={nelmt} ref norm {ref_norm:.6f}", flush=True)

    in_pcoa3 = np.asarray(in_coa.reshape(nm1, nm0, nelmt).transpose(1, 0, 2))
    b0_np = np.asarray(basis.b0, np.float32)
    b1t_np = np.asarray(basis.b1.T, np.float32)

    def split_np(m):
        hi = m.astype(np.float32).astype(jnp.bfloat16).astype(np.float32)
        return jnp.asarray(hi), jnp.asarray(m - hi)

    for g in (2, 4):
        ngrp = -(-nm0 // g)
        nm0p = ngrp * g
        in_p = np.zeros((nm0p, nm1, nelmt), np.float32)
        in_p[:nm0] = in_pcoa3
        in_g3 = jnp.asarray(in_p.reshape(ngrp, g * nm1, nelmt))
        s1 = _block_diag(b1t_np, g)
        b0t_p = np.zeros((nq0, nm0p), np.float32)
        b0t_p[:, :nm0] = b0_np.T
        s2 = _block_diag(b0t_p, g)
        s1h, s1l = split_np(s1)
        s2h, s2l = split_np(s2)
        for passes, epb in ((3, 512), (3, 1024), (4, 512), (4, 1024)):
            fn = jax.jit(functools.partial(
                mxu_g3, nq0=nq0, nq1=nq1, nm0p=nm0p, g=g, epb=epb,
                passes=passes))
            label = f"mxu_g3 ({passes}-pass) g={g} epb={epb}"
            try:
                t, w = timing.measure(
                    fn, (in_g3, s1h, s1l, s2h, s2l), cfg,
                    chain_fn=eps_chain(fn, eps_arg=1), with_witness=True)
                norm = float(np.sqrt(w))
                err = abs(norm - ref_norm) / ref_norm
                print(f"{label:34s} {dof / t:8.2f} GDOF/s  rel-err {err:.2e}",
                      flush=True)
            except Exception as ex:
                print(f"{label:34s} FAIL {str(ex).splitlines()[0][:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
