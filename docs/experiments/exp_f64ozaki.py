"""f64 dense-kron via exact split-mantissa MXU GEMMs (kernels/ozaki.py).

The f64 tier's committed peaks are 0.4 GDOF/s (XLA's emulated f64 dot,
~1% of the f64 bus ceiling) and every Pallas column fails — Mosaic has no
float64.  The Ozaki-scheme kernel sidesteps both: T exact bf16 integer
slices per operand, T(T+1)/2 native 1-pass MXU GEMMs whose f32
accumulation is integer-exact by construction, f32 double-float band
recombination in-kernel, one bandwidth-bound XLA pass back to f64.
Interpret-validated at <=1e-14 relative error vs NumPy f64 (vs ~1e-16
native); this run measures the pipeline stages on the chip:

  X  production XLA(GEMM) f64 (the committed tier's best variant)
  E  split_f64 of the element stream alone (XLA f64 elementwise rate)
  G  slice GEMM kernel alone, input pre-split (MXU + recombine rate)
  F  the full timed pipeline kron_coalesced_f64 (split + kernel +
     recombine), swept over epb — the candidate Pallas(Coales) f64 tier

Usage: python docs/experiments/exp_f64ozaki.py [nelmt]   (default 131072)
"""
import os as _os
import sys

sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_enable_x64", True)

import functools

import jax.numpy as jnp
import numpy as np

from tpu_bench.core.config import Config
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.kernels import ozaki
from tpu_bench.baselines import bwdtrans2d as xla2d
from tpu_bench.baselines import bwdtrans3d as xla3d
from tpu_bench.benchmarks import benchmark04 as b04_mod
from tpu_bench.benchmarks import benchmark05 as b05_mod
from tpu_bench.ops import bwdtrans


def run(label, fn, args, dof, ref_norm, cfg, eps_arg=0):
    try:
        t, w = timing.measure(fn, args, cfg,
                              chain_fn=eps_chain(fn, eps_arg=eps_arg),
                              with_witness=True)
        err = (abs(float(np.sqrt(w)) - ref_norm) / ref_norm
               if ref_norm else float("nan"))
        print(f"{label:42s} {dof / t:8.3f} GDOF/s  rel-err {err:.2e}",
              flush=True)
    except Exception as ex:
        print(f"{label:42s} FAIL {str(ex).splitlines()[0][:110]}", flush=True)


def run_case(dim, nq, nelmt, cfg):
    if dim == 2:
        data = b04_mod.prepare(nq, nq, nelmt, cfg)
        ref = bwdtrans.reference2d(data["basis"], data["e_pad"])
        gemm = xla2d.gemm_kron
    else:
        data = b05_mod.prepare(nq, nq, nq, nelmt, cfg)
        ref = bwdtrans.reference3d(data["basis"], data["e_pad"])
        gemm = xla3d.gemm_kron
    basis = data["basis"]
    in_coa = data["in_coa"]
    c_coa = data["c_coa" if dim == 2 else "c_coa3"]
    nm_tot = basis.nm_tot
    dof = 1e-9 * nelmt * nm_tot
    ref_norm = float(np.linalg.norm(ref))
    w, t = ozaki.slice_params(nm_tot)
    print(f"--- {dim}D nq={nq} nelmt={nelmt} K={nm_tot} w={w} T={t} "
          f"gemms={t * (t + 1) // 2} ref norm {ref_norm:.6f}", flush=True)

    run("X  XLA(GEMM) f64 production",
        jax.jit(functools.partial(gemm, precision=cfg.precision)),
        (in_coa, c_coa), dof, ref_norm, cfg)

    split = jax.jit(lambda x: ozaki.split_f64(x, w, t)[0])
    run("E  split_f64 only", split, (in_coa,), dof, 0.0, cfg)

    c_split = ozaki.split_f64(c_coa, w, t)
    in_slices, scale_in = jax.block_until_ready(
        jax.jit(lambda x: ozaki.split_f64(x, w, t))(in_coa))
    e_pad = in_slices.shape[2]
    for epb in (256, 512, 1024, 2048, 4096):
        if e_pad % epb or epb > e_pad:
            continue
        # VMEM sanity: slices + doubled stream + out pair
        if (t * nm_tot * 2 + basis.nq_tot * 8) * epb * 2 > 14 * 2 ** 20:
            continue
        run(f"G  slice-GEMM only       epb={epb:5d}",
            jax.jit(functools.partial(
                ozaki.kron_ozaki, epb=epb)),
            (in_slices, c_split[0], scale_in, c_split[1]), dof, ref_norm,
            cfg, eps_arg=2)

        def full_fn(x, c_slices, scale_c, *, _epb=epb):
            xs, sx = ozaki.split_f64(x, w, t)
            return ozaki.kron_ozaki(xs, c_slices, sx, scale_c, epb=_epb)

        run(f"F  full ozaki pipeline   epb={epb:5d}",
            jax.jit(full_fn), (in_coa, c_split[0], c_split[1]), dof,
            ref_norm, cfg, eps_arg=1)
    del in_slices


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    cfg = Config(dtype=jnp.float64, timing="chained")
    run_case(2, 8, nelmt, cfg)
    run_case(3, 8, nelmt, cfg)


if __name__ == "__main__":
    main()
