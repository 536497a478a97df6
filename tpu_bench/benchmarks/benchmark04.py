"""Benchmark 04 — 2D tensor-product sum-factorization (BwdTrans quad).

Reference: benchmark04/benchmark04.cc (harness :428-1056, CLI :1058-1075).
Eleven variants; GDOF/s counts input DOFs: 1e-9*nelmt*nm0*nm1/t (:1043-1054).
Sweep: nelmt = 128 .. 1,048,576 (x2, :1070); nq from argv (default 8 8).

Variant mapping (reference -> TPU-native, SURVEY.md §7):
  Kokkos Uncoalesced        -> XLA einsum, element-major layout
  Kokkos Coalesced          -> XLA einsum, element-on-lane layout
  Kokkos QP                 -> XLA explicit two-stage einsum (HBM wsp)
  Kokkos QP/Shared          -> XLA two-stage dot_general
  cuBLAS gemm+gemmBatched   -> XLA single kron-operator GEMM
  Cuda Uncoalesced          -> Pallas kron GEMM, element-major blocks
  Cuda Coalesced            -> Pallas kron GEMM, element-on-lane blocks
  Cuda QP (global wsp)      -> Pallas 2-kernel sum-factorization, HBM wsp
  Cuda QP/Shared            -> Pallas fused sum-factorization, VMEM wsp
  Cuda QP-1D (global wsp)   -> Pallas 2-kernel dense-stage, element-major
  Cuda QP-1D/Shared         -> Pallas fused dense-stage, element-major

`epb` (elements per Pallas program) is the threads/elblocks analog
(reference defaults 128 1, :1060-1063); auto-sized from the VMEM budget.
Chained timing perturbs the basis/operator matrices (tiny next to the
element streams).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp

from tpu_bench.baselines import bwdtrans2d as xla_bt
from tpu_bench.core import variants
from tpu_bench.core.config import Config, x64_scope
from tpu_bench.core.reporting import Reporter
from tpu_bench.core.timing import eps_chain
from tpu_bench.core.validate import (check_norm_agreement, default_rtol,
                                     measure_checked)
from tpu_bench.kernels import bwdtrans2d as pl_bt
from tpu_bench.kernels import ozaki
from tpu_bench.ops import bwdtrans, initdata


def _pl(fn, cfg, epb):
    return jax.jit(functools.partial(fn, epb=epb, interpret=cfg.interpret,
                                     precision=cfg.precision))


def _pl_noepb(fn, cfg):
    return jax.jit(functools.partial(fn, interpret=cfg.interpret,
                                     precision=cfg.precision))


def _xla(fn, cfg, ce=None, axis=0):
    if ce:
        fn = xla_bt.chunk_elems(fn, ce, axis)
    return functools.partial(fn, precision=cfg.precision)


def _blk4(src, nm_tot, e_pad, cap=524288):
    """Wide-chunk blocked element stream, 4D (nblk, nmTot, ce/128, 128):
    cap=524288 for the nq=2 VPU kron tier (same-session cap sweep,
    artifacts/wall/nq2wall.log: 17.93 vs 17.53 GDOF/s at 256Ki), cap=
    WIDE4_CHUNK for the MXU kron_wide4 tier (exp_lo46d.py optimum)."""
    ce = bwdtrans.wide_chunk_elems(e_pad, cap)
    return src["blk"](ce).reshape(e_pad // ce, nm_tot, ce // 128, 128)


def variant_specs(data, cfg):
    """Ordered (label, fn, operand keys) for the 11-variant table; the key
    at index 1 names the small operand the chained timer perturbs.  Keys
    resolve through ops.bwdtrans.Layouts, so derived layouts of the element
    stream materialize one variant at a time."""
    epb_qp = data["epb_qp"]
    epb_1d = data["epb_1d"]
    ce = data["xla_ce"] if "xla_ce" in data else None
    return [
        ("XLA(Uncoales)", _xla(xla_bt.einsum_em, cfg, ce),
         ("in_em3", "b0", "b1")),
        ("XLA(Coales)", _xla(xla_bt.einsum_coa, cfg, ce, axis=-1),
         ("in_coa3", "b0", "b1")),
        ("XLA(QP)", _xla(xla_bt.staged_em, cfg, ce), ("in_em3", "b0", "b1")),
        ("XLA(QP/DG)", _xla(xla_bt.staged_dotgeneral, cfg, ce),
         ("in_em3", "b0", "b1")),
        ("XLA(GEMM)", _xla(xla_bt.gemm_kron, cfg, ce, axis=-1),
         ("in_coa", "c_coa")),
        ("Pallas(Uncoales)", _pl(pl_bt.kron_elem_major, cfg,
                                 data["epb_em"]), ("in_em2", "c_em")),
        # f64: exact split-mantissa MXU GEMMs, x64-free end to end — the
        # operands arrive host-split (split_f64_np) so the program is pure
        # bf16/f32 and compiles OUTSIDE the x64 scope (kernels/ozaki.py)
        ("Pallas(Coales)",
         jax.jit(ozaki.coales_pair_variant(epb=data["epb_oz"],
                                           interpret=cfg.interpret)),
         ("in_slices", "c_slices"))
        if "c_slices" in data
        else
        # low order (nq<=4 2D): the dense kron is a streaming expansion —
        # unrolled VPU FMAs instead of a padded MXU GEMM
        # (pl_bt.kron_vpu_blocked)
        ("Pallas(Coales)", _pl_noepb(pl_bt.kron_vpu_blocked, cfg),
         ("in_blk_wide", "c_coa"))
        if data["basis"].nm_tot * data["basis"].nq_tot <= pl_bt.VPU_KRON_MAX
        else
        # nq>=4: dense kron GEMM on the wide-4D blocked layout — beats
        # both the VPU ring and the flat-minor 3D form (exp_lo46d.py)
        ("Pallas(Coales)", _pl_noepb(pl_bt.kron_wide4, cfg),
         ("in_blk_w4", "c_coa")),
        ("Pallas(QP)", _pl(pl_bt.qp_global, cfg, epb_qp),
         ("in_pcoa3", "b0", "b1t")),
        # high order: G-grouped block-diagonal MXU form (see prepare)
        ("Pallas(QP/Shared)",
         jax.jit(functools.partial(
             pl_bt.qp_mxu_grouped, nq0=data["basis"].nq0,
             nq1=data["basis"].nq1, g=data["g_grp"], epb=data["epb_grp"],
             interpret=cfg.interpret, precision=cfg.precision)),
         ("in_g3", "s1g", "s2g"))
        if "s1g" in data else
        # mid-order, low plane-tile occupancy: flat-block qp_w — same
        # bytes DMA'd as (nmTot, epb)/(nqTot, epb) flat blocks, dodging
        # the measured per-plane padded-tile tax (exp_nq14c/d.py:
        # nq=14 72.99 vs 65.79 GDOF/s; gate mirrors the occupancy map)
        ("Pallas(QP/Shared)",
         jax.jit(functools.partial(
             pl_bt.qp_w_flat, nm1=data["basis"].nm1,
             nq1=data["basis"].nq1, epb=data["epb_qpf"],
             interpret=cfg.interpret, precision=cfg.precision)),
         ("in_coa", "b0", "b1tp"))
        if (data["basis"].nq_tot >= 100 and cfg.itemsize == 4
            and min(pl_bt.plane_occupancy(data["basis"].nm1),
                    pl_bt.plane_occupancy(data["basis"].nq1)) < 0.9) else
        # mid-order (100 <= nqTot < 1024): stage-1-upfront + vreg stage-2
        # (qp_w) — fixes the nq=14/16 VMEM-RMW stall, exp_nq1416d.py
        ("Pallas(QP/Shared)",
         jax.jit(functools.partial(
             pl_bt.qp_w, nq1=data["basis"].nq1, epb=epb_qp,
             interpret=cfg.interpret, precision=cfg.precision)),
         ("in_pcoa3", "b0", "b1tp"))
        if data["basis"].nq_tot >= 100 else
        ("Pallas(QP/Shared)", _pl(pl_bt.qp_shared, cfg, epb_qp),
         ("in_pcoa3", "b0", "b1t")),
        ("Pallas(QP-1D)", _pl(pl_bt.qp1d_global, cfg, epb_1d),
         ("in_em2", "s1_em", "s2_em")),
        ("Pallas(QP-1D/Shared)", _pl(pl_bt.qp1d_shared, cfg, epb_1d),
         ("in_em2", "s1_em", "s2_em")),
    ]


def build_variants(data, cfg):
    """(label, fn, args) with every operand materialized — test-suite and
    small-size convenience; sweeps use variant_specs + lazy resolution."""
    return variants.materialize(variant_specs(data, cfg), data)


LABELS = [
    "XLA(Uncoales)", "XLA(Coales)", "XLA(QP)", "XLA(QP/DG)", "XLA(GEMM)",
    "Pallas(Uncoales)", "Pallas(Coales)", "Pallas(QP)", "Pallas(QP/Shared)",
    "Pallas(QP-1D)", "Pallas(QP-1D/Shared)",
]


def prepare(nq0: int, nq1: int, nelmt: int, cfg: Config) -> dict:
    basis = bwdtrans.make_basis2d(nq0, nq1, cfg.dtype)
    e_pad = initdata.round_up(nelmt, 128)
    src = bwdtrans.stream_sources(bwdtrans.element_data2d(basis, cfg.dtype),
                                  (basis.nm1, basis.nm0), nelmt, e_pad,
                                  cfg.dtype)
    c_em, s1_em, s2_em = bwdtrans.operators2d(basis)
    nm1, nm0 = basis.nm1, basis.nm0
    budget = 14 * 1024 * 1024
    pad = bwdtrans.pad_lanes
    # coalesced blocks: elements on the lane axis, no tile padding
    bytes_coa = cfg.itemsize * (2 * basis.nm_tot + 2 * basis.nq_tot
                                + nm1 * basis.nq0)
    epb = bwdtrans.choose_epb(bytes_coa, e_pad, cfg.epb, budget)
    # kron tier keeps the dense (nqTot, nmTot) operator resident, and
    # Mosaic buffers it twice: charge 2x its bytes against the window
    # (observed 16.96M scoped OOM at nq=32 without this)
    kron_budget = max(11 * 1024 * 1024
                      - 2 * c_em.size * cfg.itemsize, 1 << 20)
    epb_kron = bwdtrans.choose_epb(
        cfg.itemsize * 2 * (basis.nm_tot + basis.nq_tot), e_pad, cfg.epb,
        kron_budget)
    # element-major blocks: the mode axis is the lane dim and pads to 128;
    # halved budget — Mosaic's scoped-vmem stack for these runs ~2x the
    # double-buffered block model (observed at nq=16 on v5e)
    bytes_em = cfg.itemsize * (2 * pad(basis.nm_tot) + 2 * pad(basis.nq_tot)
                               + pad(s1_em.shape[1]))
    epb_em = bwdtrans.choose_epb(bytes_em, e_pad, cfg.epb, budget // 2)
    data = bwdtrans.Layouts(
        base=dict(
            basis=basis,
            nelmt=nelmt,
            e_pad=e_pad,
            b0=basis.b0,
            b1=basis.b1,
            b0t=jnp.asarray(basis.b0.T),
            b1t=jnp.asarray(basis.b1.T),
            # B1^T sublane-padded to ceil8(nq1) zero rows (qp_w tier)
            b1tp=bwdtrans.pad_rows(jnp.asarray(basis.b1.T), 8),
            c_em=c_em,
            c_coa=jnp.asarray(c_em.T),
            s1_em=s1_em,
            s2_em=s2_em,
        ),
        # ALL layouts of the element stream are lazy, built fresh straight
        # from the coefficient vector (stream_sources): one layout resident
        # at a time, which is what admits nelmt=1,048,576 for the heaviest
        # nq on a 16 GB chip (VERDICT r2 missing #1)
        derived=dict(
            in_em2=src["em2"],
            in_coa=src["coa"],
            in_em3=lambda: src["em2"]().reshape(e_pad, nm1, nm0),
            in_coa3=lambda: src["coa"]().reshape(nm1, nm0, e_pad),
            # p-major coalesced layout for the hybrid MXU/VPU QP kernels
            in_pcoa3=src["pcoa3"],
            # chunk-interleaved coalesced layout (contiguous per-block HBM
            # chunks); chunk width = the kron tier's tuned epb
            in_blk=lambda: src["blk"](data["epb_kron"]),
            # wide-chunk blocked layout (4D) for the low-order VPU kron
            in_blk_wide=lambda: _blk4(src, basis.nm_tot, e_pad),
            # same 4D form at the MXU kron tier's measured chunk optimum
            in_blk_w4=lambda: _blk4(src, basis.nm_tot, e_pad,
                                    data["ce_wide4"]),
        ),
    )
    data["epb_qp"] = epb
    # flat-block qp_w tier: same per-element bytes but ~15% less VMEM
    # padding than the plane form; measured through 2x epb (exp_nq14d.py:
    # 73.0 @4096 vs 71.4 @2048 at nq=14) — double unless the user pinned
    # epb or the doubled block no longer divides the padded sweep size
    data["epb_qpf"] = (epb if cfg.epb is not None or e_pad % (2 * epb)
                       else 2 * epb)
    data["epb_kron"] = epb_kron
    data["ce_wide4"] = bwdtrans.wide4_chunk_elems(
        basis.nm_tot, basis.nq_tot, cfg.itemsize, e_pad, pl_bt.WIDE4_CHUNK)
    data["epb_em"] = data["epb_1d"] = epb_em
    # XLA-tier element chunking: cap the staged variants' HBM workspace
    # residency once in + workspace + two chain-carried outputs would not
    # fit the sweep cap (chunk_elems keeps per-chunk workspaces >> VMEM)
    it = cfg.itemsize
    nm_tot, nq_tot = basis.nm_tot, basis.nq_tot
    w_cols = nm1 * nq0
    data["xla_ce"] = bwdtrans.choose_xla_chunk(
        (nm_tot + 2 * nq_tot) * e_pad * it, w_cols * it, e_pad,
        cfg.mem_cap_bytes)
    if cfg.dtype == jnp.float64:
        # f64 Coales tier: x64-free exact split-mantissa MXU GEMMs
        # (kernels/ozaki.py; split/recombine on the host in NumPy f64)
        import numpy as np

        ozaki.prepare_f64_tier(data, np.asarray(data["c_coa"], np.float64),
                               nm_tot, nq_tot, nelmt, e_pad, cfg)
    # nq=32-class QP/Shared tier: G-grouped block-diagonal MXU kernel
    # (qp_mxu_grouped).  Only at nq_tot >= 1024: measured at nq=16/14 the
    # v-first hybrid still wins (64.5/63.4 vs 47.8/40.0 GDOF/s,
    # docs/experiments/exp_nq32b.py)
    g = bwdtrans.grouped_g(nq0, nq1)
    if g >= 2 and nq_tot >= 1024:
        s1g, s2g = bwdtrans.grouped_operators2d(basis, g)
        data["s1g"], data["s2g"], data["g_grp"] = s1g, s2g, g
        ngrp = -(-nm0 // g)
        cols = ngrp * g * (nm1 + nq1) + nq_tot
        data["epb_grp"] = bwdtrans.choose_epb(
            it * cols, e_pad, cfg.epb,
            max(budget - (s1g.size + s2g.size) * it, 1 << 20))
        data.add_derived("in_g3", lambda: src["grouped"](g))
    if cfg.autotune and cfg.epb is None:
        from tpu_bench.core import autotune as at

        sig = f"nq{nq0}x{nq1}/e{at.e_pad_class(e_pad)}"
        data["ce_wide4"] = at.autotune_epb(
            "b04/wide4", sig,
            lambda ce: (_pl_noepb(pl_bt.kron_wide4, cfg),
                        (_blk4(src, basis.nm_tot, e_pad, ce),
                         data["c_coa"])),
            cfg, e_pad, candidates=(8192, 16384, 32768, 65536),
            default=data["ce_wide4"])
        in_pcoa3 = data["in_pcoa3"]
        if nq_tot >= 100:
            data["epb_qp"] = at.autotune_epb(
                "b04/qpw", sig,
                lambda e: (jax.jit(functools.partial(
                    pl_bt.qp_w, nq1=basis.nq1, epb=e,
                    interpret=cfg.interpret, precision=cfg.precision)),
                    (in_pcoa3, data["b0"], data["b1tp"])),
                cfg, e_pad, default=epb)
        else:
            data["epb_qp"] = at.autotune_epb(
                "b04/qp", sig,
                lambda e: (_pl(pl_bt.qp_shared, cfg, e),
                           (in_pcoa3, data["b0"], data["b1t"])),
                cfg, e_pad, default=epb)
        del in_pcoa3
        data["epb_1d"] = at.autotune_epb(
            "b04/1d", sig,
            lambda e: (_pl(pl_bt.qp1d_shared, cfg, e),
                       (data["in_em2"], data["s1_em"], data["s2_em"])),
            cfg, e_pad, default=epb_em)
    return data


def _measure_scoped(label, fn, keys, data, cfg, reporter, tight):
    """One variant's (seconds, norm) with the per-variant x64 scope rule
    (shared by benchmarks 04/05): the f64 Ozaki Coales tier — a pure
    bf16/f32 program with host-side f64 split/recombine — runs OUTSIDE
    the x64 scope (the only context this toolchain compiles Pallas in)
    and validates through the df2 norm; every other variant runs inside
    the scope, a no-op for f32/bf16 runs."""
    carry = "scalar" if tight and label.startswith("Pallas") else "array"
    xfree = label == "Pallas(Coales)" and "c_slices" in data
    scope = contextlib.nullcontext() if xfree else x64_scope(cfg.dtype)
    with scope:
        args = tuple(data[k] for k in keys)  # lazy derived layouts
        kw = {}
        if xfree:
            scale = data["oz_scale"]
            kw = dict(
                norm_fn=lambda out: ozaki.pair_norm(out, scale),
                witness_norm=lambda w, _f=fn, _a=args:
                    ozaki.pair_norm_apply(_f, _a, cfg, scale))
        t, norm = measure_checked(label, fn, args, cfg, reporter,
                                  chain_fn=eps_chain(fn, eps_arg=1),
                                  carry=carry, **kw)
        del args, kw
    return t, norm


def run_test(nelmt: int, nq0: int, nq1: int, cfg: Config,
             reporter: Reporter) -> None:
    # f64 runs under SCOPED x64 (config.x64_scope): the XLA tier traces/
    # executes true f64 inside the scope, while the Pallas Ozaki tier —
    # whose program is pure bf16/f32 with host-side f64 split/recombine —
    # runs OUTSIDE it, which is the only way any Pallas program compiles
    # on this toolchain (kernels/ozaki.py module docstring).
    with x64_scope(cfg.dtype):
        data = prepare(nq0, nq1, nelmt, cfg)
        jax.block_until_ready(data["b0"])

    # pallas_call outputs are opaque to XLA, so Pallas variants may carry
    # only the probe scalar through the timing chain — one output buffer
    # resident instead of two (timing.build_chain).  Applied only at sizes
    # where the array carry would not fit (the top of the heaviest
    # sweeps), so every smaller size keeps its cached chained executable.
    basis = data["basis"]
    tight = ((basis.nm_tot + 2 * basis.nq_tot + basis.nm1 * nq0)
             * data["e_pad"] * cfg.itemsize > cfg.mem_cap_bytes)
    times, norms = [], []
    for label, fn, keys in variant_specs(data, cfg):
        t, norm = _measure_scoped(label, fn, keys, data, cfg, reporter,
                                  tight)
        times.append(t)
        norms.append(norm)

    if cfg.validate:
        for msg in check_norm_agreement(LABELS, norms, default_rtol(cfg.dtype),
                                        context=f"b04 nelmt={nelmt}"):
            reporter.note("WARNING: " + msg)

    nm0, nm1 = nq0 - 1, nq1 - 1
    dofs = [1e-9 * nelmt * nm0 * nm1 / t for t in times]
    reporter.emit("nelmt", nelmt, LABELS, norms, dofs, "DOF/s")


def main(argv=None):
    from tpu_bench.benchmarks import cli

    parser = cli.build_parser(
        "benchmark04",
        positionals=[("nq0", 8), ("nq1", 8), ("threads", None),
                     ("elblocks", None)],
    )
    args = parser.parse_args(argv)
    cfg = Config.from_flags(args)
    if cfg.epb is None and args.threads and args.elblocks:
        cfg.epb = args.threads * args.elblocks
    nq0, nq1 = args.nq0, args.nq1
    nm0, nm1 = nq0 - 1, nq1 - 1
    reporter = Reporter("Benchmark04 : BwdTrans (2D)")
    reporter.sweep_title(f"BwdTrans (NQ = {nq0}, {nq1})")
    cap = cfg.mem_cap_bytes
    nm_tot, nq_tot = nm0 * nm1, nq0 * nq1
    with cli.profiled(args):
        for nelmt in cli.sweep(128, 1048576, args):
            # residency model: one lazily-built input layout + the larger
            # of {two chain-carried outputs (XLA tiers, workspaces chunked
            # by choose_xla_chunk)} and {HBM workspace + one output
            # (Pallas global-wsp tiers, scalar carry)}, plus two in-flight
            # 64Ki-element workspace chunks
            wsp = nm1 * nq0
            need = ((nm_tot + max(2 * nq_tot, wsp + nq_tot)) * nelmt
                    + 2 * wsp * 65536) * cfg.itemsize
            if need > cap:
                reporter.note(f"b04: stopping sweep at nelmt {nelmt} (memory cap)")
                break
            cli.guarded(reporter, "b04", nelmt, run_test, nelmt, nq0, nq1, cfg, reporter)


if __name__ == "__main__":
    main()
