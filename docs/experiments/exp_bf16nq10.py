"""bf16 b05 nq=10^3: why 67% of the tier ceiling, and a split-unit hybrid.

The committed bf16 sweep (artifacts/bf16/b05/nq10x10x10.log) peaks at 97.5
GDOF/s = 67% of the halved-traffic ceiling (~145.6), the tier's one weak
cell.  Roofline arithmetic says the fused QP kernel's two formulations
each sit at a different UNIT wall at bf16:

  - v-first qp_shared3d: VPU p-combine is 13,770 FLOP/elt; the measured
    97.5 GDOF/s = 1.337e8 elt/s implies 1.84 TFLOP/s on the VPU — ~95% of
    the 8x128x2 FMA @ ~940 MHz = 1.93 TFLOP/s unit peak, with the MXU
    >90% idle (its 162k FLOP/elt pair-contraction takes ~0.9 ns/elt at
    the ~181 TFLOP/s the dense tier sustains).
  - dense-kron kron_blocked: 1.458M FLOP/elt all on the MXU; its measured
    90.6 GDOF/s implies ~181 TFLOP/s — ~92% of bf16 MXU peak, VPU idle.

So at bf16 this cell is the one place where NEITHER unit alone reaches the
bus: the fix is to run both at once.  The hybrid kernel splits each
element block's 128-lane-aligned lane range: lanes [0:s) go through ONE
dense-kron MXU GEMM (leading-dim reshape of the (nm0, nrq, epb) block to
(nm0*nrq, s) is layout-free), lanes [s:) through the v-first VPU path.
Balancing 8.05a = 7.13(1-a) ns/elt predicts a ~= 0.44 and a ~182 GDOF/s
compute bound — i.e. back above the 145.6 bus ceiling.

Probes measure each unit's sustained rate inside this kernel shape first;
then the hybrid is swept over split fractions.

Variants (nq=10^3, bf16, HBM-honest chained timing):
  A   production qp_shared3d over epb
  B   qp_shared3d with f32 vreg accumulation of v (converts once per
      input read instead of bf16 VPU ops; measures the convert tax)
  P1  VPU-only probe: the v build loop, dot skipped (out = v planes)
  P2  MXU-only probe: the 10 pair-dots on raw input planes, v skipped
  C   split-unit hybrid over split fraction and epb
  D   C with f32 v accumulation

The same arithmetic predicts a hybrid win at bf16 nq=8^3, where the VPU
path's 5,096 FLOP/elt caps the fused kernel at ~130 GDOF/s just below the
138 bus ceiling (XLA(GEMM) currently wins that cell at 134.2).

Usage: python docs/experiments/exp_bf16nq10.py [nelmt] [nq]
       (defaults 524288, 10)
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
from tpu_bench.kernels import common
from tpu_bench.kernels.bwdtrans2d import _dot, _parallel_params
from tpu_bench.kernels import bwdtrans3d as pl_bt
from tpu_bench.benchmarks import benchmark05 as b05_mod
from tpu_bench.ops import bwdtrans, initdata

F32 = jnp.float32


# ---- B: f32 vreg accumulation of v --------------------------------------


def _qp_f32v_kernel(nm0, nq0, precision, c12t_ref, b0_ref, in_ref, out_ref):
    idt = in_ref.dtype
    for i in range(nq0):
        v = in_ref[0].astype(F32) * b0_ref[0, i]
        for p in range(1, nm0):
            v += in_ref[p].astype(F32) * b0_ref[p, i]
        out_ref[i] = _dot(c12t_ref[:], v.astype(idt),
                          precision).astype(out_ref.dtype)


# ---- P1/P2: unit probes ---------------------------------------------------


def _vpu_probe_kernel(nm0, nq0, c12t_ref, b0_ref, in_ref, out_ref):
    # v build only; write v into the first nrq rows of each output plane
    idt = in_ref.dtype
    nrq = in_ref.shape[1]
    for i in range(nq0):
        v = in_ref[0] * b0_ref[0, i].astype(idt)
        for p in range(1, nm0):
            v += in_ref[p] * b0_ref[p, i].astype(idt)
        out_ref[i, :nrq] = v.astype(out_ref.dtype)
        out_ref[i, nrq:] = jnp.zeros_like(out_ref[i, nrq:])


def _mxu_probe_kernel(nm0, nq0, precision, c12t_ref, b0_ref, in_ref,
                      out_ref):
    # pair-dots only, on raw input planes (no v build)
    for i in range(nq0):
        out_ref[i] = _dot(c12t_ref[:], in_ref[i % nm0],
                          precision).astype(out_ref.dtype)


# ---- C/D: split-unit hybrid ----------------------------------------------


def _qp_hybrid_kernel(nm0, nq0, split, f32v, precision, ck_ref, c12t_ref,
                      b0_ref, in_ref, out_ref):
    idt = in_ref.dtype
    nrq = in_ref.shape[1]
    nkj = c12t_ref.shape[0]
    # MXU lanes [0:split): one dense-kron GEMM (leading-dim reshapes are
    # layout-free; the lane slice is 128-aligned)
    blk = in_ref[:, :, :split].reshape(nm0 * nrq, split)
    dense = _dot(ck_ref[:], blk, precision)            # (nq0*nkj, split)
    out_ref[:, :, :split] = dense.reshape(nq0, nkj, split).astype(
        out_ref.dtype)
    # VPU lanes [split:): v-first
    for i in range(nq0):
        if f32v:
            v = in_ref[0, :, split:].astype(F32) * b0_ref[0, i]
            for p in range(1, nm0):
                v += in_ref[p, :, split:].astype(F32) * b0_ref[p, i]
            v = v.astype(idt)
        else:
            v = in_ref[0, :, split:] * b0_ref[0, i].astype(idt)
            for p in range(1, nm0):
                v += in_ref[p, :, split:] * b0_ref[p, i].astype(idt)
        out_ref[i, :, split:] = _dot(c12t_ref[:], v,
                                     precision).astype(out_ref.dtype)


def _call_qp(kernel_body, in_pcoa3, b0, c12t, *, epb, out_rows=None,
             extra_ops=(), interpret=False, precision=None):
    b0 = b0.astype(common.acc_dtype(in_pcoa3.dtype))
    nm0, nrq, e = in_pcoa3.shape
    nq0 = b0.shape[1]
    nkj = out_rows or c12t.shape[0]
    grid = (e // epb,)
    extra_specs = [pl.BlockSpec(op.shape, lambda i: (0,) * op.ndim,
                                memory_space=pltpu.VMEM) for op in extra_ops]
    return pl.pallas_call(
        kernel_body,
        grid=grid,
        in_specs=extra_specs + [
            pl.BlockSpec((c12t.shape[0], nrq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nm0, nrq, epb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq0, nkj, epb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq0, nkj, e), in_pcoa3.dtype),
        interpret=interpret,
        **_parallel_params(interpret),
    )(*extra_ops, c12t, b0, in_pcoa3)


def qp_f32v(in_pcoa3, b0, c12t, *, epb, interpret=False, precision=None):
    nm0 = in_pcoa3.shape[0]
    nq0 = b0.shape[1]
    return _call_qp(functools.partial(_qp_f32v_kernel, nm0, nq0, precision),
                    in_pcoa3, b0, c12t, epb=epb, interpret=interpret)


def vpu_probe(in_pcoa3, b0, c12t, *, epb, interpret=False, precision=None):
    nm0 = in_pcoa3.shape[0]
    nq0 = b0.shape[1]
    return _call_qp(functools.partial(_vpu_probe_kernel, nm0, nq0),
                    in_pcoa3, b0, c12t, epb=epb, interpret=interpret)


def mxu_probe(in_pcoa3, b0, c12t, *, epb, interpret=False, precision=None):
    nm0 = in_pcoa3.shape[0]
    nq0 = b0.shape[1]
    return _call_qp(functools.partial(_mxu_probe_kernel, nm0, nq0, precision),
                    in_pcoa3, b0, c12t, epb=epb, interpret=interpret)


def qp_hybrid(in_pcoa3, b0, c12t, ck, *, epb, split, f32v=False,
              interpret=False, precision=None):
    nm0 = in_pcoa3.shape[0]
    nq0 = b0.shape[1]
    return _call_qp(
        functools.partial(_qp_hybrid_kernel, nm0, nq0, split, f32v,
                          precision),
        in_pcoa3, b0, c12t, epb=epb, extra_ops=(ck,), interpret=interpret)


def run(label, fn, args, dof, ref_norm, cfg):
    try:
        t, w = timing.measure(fn, args, cfg, chain_fn=eps_chain(fn, eps_arg=1),
                              with_witness=True)
        err = abs(float(np.sqrt(w)) - ref_norm) / ref_norm
        print(f"{label:44s} {dof / t:8.2f} GDOF/s  rel-err {err:.2e}",
              flush=True)
        return dof / t
    except Exception as ex:
        print(f"{label:44s} FAIL {str(ex).splitlines()[0][:100]}", flush=True)
        return 0.0


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cfg = Config(dtype=jnp.bfloat16, timing="chained")
    basis = bwdtrans.make_basis3d(nq, nq, nq, cfg.dtype)
    e_pad = initdata.round_up(nelmt, 128)
    data = b05_mod.prepare(nq, nq, nq, nelmt, cfg)
    in_pcoa3 = data["in_pcoa3"]
    b0, c12t = data["b0"], data["c12t"]
    ck = data["c_coa3"]  # dense kron operator (nqTot, nmTot)
    dof = 1e-9 * nelmt * basis.nm_tot
    ref_norm = float(np.linalg.norm(bwdtrans.reference3d(basis, e_pad)))
    epb0 = data["epb_qp"]
    print(f"bf16 nq={nq}^3 nelmt={nelmt} epb_qp={epb0} "
          f"ref norm {ref_norm:.6f}", flush=True)
    mk = lambda fn, **kw: jax.jit(functools.partial(
        fn, epb=kw.pop("epb"), precision=cfg.precision, **kw))

    # A: production over epb
    for epb in (512, 1024, 2048, 4096):
        if e_pad % epb:
            continue
        run(f"A qp_shared3d           epb={epb:5d}",
            mk(pl_bt.qp_shared3d, epb=epb), (in_pcoa3, b0, c12t), dof,
            ref_norm, cfg)

    # B: f32 vreg accumulation
    for epb in (1024, 2048):
        if e_pad % epb:
            continue
        run(f"B qp_f32v               epb={epb:5d}",
            mk(qp_f32v, epb=epb), (in_pcoa3, b0, c12t), dof, ref_norm, cfg)

    # P1/P2: unit probes (rates are diagnostic; norms will disagree)
    for epb in (2048,):
        if e_pad % epb:
            continue
        run(f"P1 vpu_probe (no dot)   epb={epb:5d}",
            mk(vpu_probe, epb=epb), (in_pcoa3, b0, c12t), dof, ref_norm, cfg)
        run(f"P2 mxu_probe (no v)     epb={epb:5d}",
            mk(mxu_probe, epb=epb), (in_pcoa3, b0, c12t), dof, ref_norm, cfg)

    # C/D: split-unit hybrid
    for epb in (1024, 2048, 4096):
        if e_pad % epb:
            continue
        for frac_num, frac_den in ((1, 4), (3, 8), (1, 2), (5, 8)):
            split = (epb * frac_num // frac_den) // 128 * 128
            if not (0 < split < epb):
                continue
            run(f"C hybrid  epb={epb:5d} split={split:5d} "
                f"({frac_num}/{frac_den})",
                mk(qp_hybrid, epb=epb, split=split),
                (in_pcoa3, b0, c12t, ck), dof, ref_norm, cfg)
        split = (epb * 7 // 16) // 128 * 128
        if 0 < split < epb:
            run(f"D hybrid+f32v epb={epb:5d} split={split:5d}",
                mk(qp_hybrid, epb=epb, split=split, f32v=True),
                (in_pcoa3, b0, c12t, ck), dof, ref_norm, cfg)


if __name__ == "__main__":
    main()
