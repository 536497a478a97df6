"""Benchmark 05 — 3D tensor-product sum-factorization (BwdTrans hex).

Reference: benchmark05/benchmark05.cc (harness :619-1421, CLI :1423-1442:
`nq0 nq1 nq2 threads elblocks`).  Eleven variants; GDOF/s counts input DOFs:
1e-9*nelmt*nm0*nm1*nm2/t (:1407-1419).  Sweep: nelmt = 128 .. 1,048,576.

Variant taxonomy mirrors benchmark04 with a third contraction stage; the
fused Pallas sum-factorization kernels use the asymmetric stage split
described in kernels/bwdtrans3d.py.  VMEM budgeting per variant family is
the interesting 3D twist (SURVEY.md §5.7): at nq=10 an element carries 729
input + 1000 output values, so elements-per-block is sized per family from
its VMEM working set (operators + double-buffered element streams).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_bench.baselines import bwdtrans2d as xla2d
from tpu_bench.baselines import bwdtrans3d as xla_bt
from tpu_bench.core import variants
from tpu_bench.core.config import Config, x64_scope
from tpu_bench.core.reporting import Reporter
from tpu_bench.core.timing import eps_chain
from tpu_bench.core.validate import (check_norm_agreement, default_rtol,
                                     measure_checked)
from tpu_bench.benchmarks import benchmark04 as b04_mod
from tpu_bench.kernels import bwdtrans3d as pl_bt
from tpu_bench.kernels import bwdtrans2d as pl_bt2d
from tpu_bench.kernels import ozaki
from tpu_bench.kernels.bwdtrans2d import (VPU_KRON_MAX, kron_vpu_blocked,
                                          kron_wide4)
from tpu_bench.ops import bwdtrans, initdata


def _pl(fn, cfg, epb):
    return jax.jit(functools.partial(fn, epb=epb, interpret=cfg.interpret,
                                     precision=cfg.precision))


def _pl_noepb(fn, cfg):
    return jax.jit(functools.partial(fn, interpret=cfg.interpret,
                                     precision=cfg.precision))


def _xla(fn, cfg, ce=None, axis=0):
    if ce:
        fn = xla2d.chunk_elems(fn, ce, axis)
    return functools.partial(fn, precision=cfg.precision)


LABELS = [
    "XLA(Uncoales)", "XLA(Coales)", "XLA(QP)", "XLA(QP/DG)", "XLA(GEMM)",
    "Pallas(Uncoales)", "Pallas(Coales)", "Pallas(QP)", "Pallas(QP/Shared)",
    "Pallas(QP-1D)", "Pallas(QP-1D/Shared)",
]


def variant_specs(data, cfg):
    """Ordered (label, fn, operand keys); the key at index 1 is the small
    perturbed operand.  Keys resolve lazily (ops.bwdtrans.Layouts)."""
    ce = data["xla_ce"] if "xla_ce" in data else None
    return [
        ("XLA(Uncoales)", _xla(xla_bt.einsum_em, cfg, ce),
         ("in_em4", "b0", "b1", "b2")),
        ("XLA(Coales)", _xla(xla_bt.einsum_coa, cfg, ce, axis=-1),
         ("in_coa4", "b0", "b1", "b2")),
        ("XLA(QP)", _xla(xla_bt.staged_em, cfg, ce),
         ("in_em4", "b0", "b1", "b2")),
        ("XLA(QP/DG)", _xla(xla_bt.staged_dotgeneral, cfg, ce),
         ("in_em4", "b0", "b1", "b2")),
        ("XLA(GEMM)", _xla(xla_bt.gemm_kron, cfg, ce, axis=-1),
         ("in_coa", "c_coa3")),
        ("Pallas(Uncoales)", _pl(pl_bt.kron_elem_major, cfg,
                                 data["epb_em"]), ("in_em2", "c_em3")),
        # f64: exact split-mantissa MXU GEMMs, x64-free end to end — the
        # operands arrive host-split (split_f64_np) so the program is pure
        # bf16/f32 and compiles OUTSIDE the x64 scope (kernels/ozaki.py)
        ("Pallas(Coales)",
         jax.jit(ozaki.coales_pair_variant(epb=data["epb_oz"],
                                           interpret=cfg.interpret)),
         ("in_slices", "c_slices"))
        if "c_slices" in data
        else
        # low order (nq=2^3): 1R:8W streaming expansion — unrolled VPU
        # FMAs instead of a padded MXU GEMM (see benchmark04.variant_specs)
        ("Pallas(Coales)", _pl_noepb(kron_vpu_blocked, cfg),
         ("in_blk_wide", "c_coa3"))
        if data["basis"].nm_tot * data["basis"].nq_tot <= VPU_KRON_MAX
        else
        # mid order: the wide-4D blocked MXU kron, measured ahead of the
        # flat blocked GEMM wherever its VMEM-budgeted chunk stays >= 8192
        # elements (nq=4^3 47.4 vs 44.8, nq=6^3 59.6 vs 58.8 GDOF/s,
        # artifacts/wall/lo3d.log); narrower chunks are unmeasured in 3D
        # and keep the flat form (prepare gates via "in_blk_w4")
        ("Pallas(Coales)", _pl_noepb(kron_wide4, cfg),
         ("in_blk_w4", "c_coa3"))
        if "in_blk_w4" in data
        else
        ("Pallas(Coales)", _pl_noepb(pl_bt.kron_blocked, cfg),
         ("in_blk", "c_coa3")),
        ("Pallas(QP)", _pl(pl_bt.qp_global3d, cfg, data["epb_qp"]),
         ("in_pcoa3", "b0", "c12t")),
        # low plane-tile occupancy (f32): flat-block fused QP — the same
        # HBM bytes DMA'd as (nmTot, epb)/(nqTot, epb) blocks, dodging the
        # measured per-plane sublane-padding tax (exp_flat3d.py: nq=8^3
        # 63.6->66.4, nq=10^3 67.0->71.2 GDOF/s; gate IS the occupancy map)
        ("Pallas(QP/Shared)",
         jax.jit(functools.partial(
             pl_bt.qp_shared3d_flat,
             nrq=data["basis"].nm2 * data["basis"].nm1,
             epb=data["epb_qp"], interpret=cfg.interpret,
             precision=cfg.precision)),
         ("in_pflat", "b0", "c12t"))
        if data["qp_flat"]
        else
        ("Pallas(QP/Shared)", _pl(pl_bt.qp_shared3d, cfg, data["epb_qp"]),
         ("in_pcoa3", "b0", "c12t")),
        ("Pallas(QP-1D)", _pl(pl_bt.qp1d_global3d, cfg, data["epb_1d"]),
         ("in_em2", "s1_em", "s2_em", "s3_em")),
        ("Pallas(QP-1D/Shared)", _pl(pl_bt.qp1d_shared3d, cfg,
                                     data["epb_1d"]),
         ("in_em2", "s1_em", "s2_em", "s3_em")),
    ]


def build_variants(data, cfg):
    """(label, fn, args) with every operand materialized — test-suite and
    small-size convenience; sweeps use variant_specs + lazy resolution."""
    return variants.materialize(variant_specs(data, cfg), data)


def prepare(nq0: int, nq1: int, nq2: int, nelmt: int, cfg: Config) -> dict:
    basis = bwdtrans.make_basis3d(nq0, nq1, nq2, cfg.dtype)
    e_pad = initdata.round_up(nelmt, 128)
    src = bwdtrans.stream_sources(
        bwdtrans.element_data3d(basis, cfg.dtype),
        (basis.nm2, basis.nm1, basis.nm0), nelmt, e_pad, cfg.dtype)
    c_em3, c12t, s1_em, s2_em, s3_em = bwdtrans.operators3d(basis)
    nm0, nm1, nm2 = basis.nm0, basis.nm1, basis.nm2
    nm_tot, nq_tot = basis.nm_tot, basis.nq_tot
    it = cfg.itemsize
    nkj = nq2 * nq1
    budget = 8 * 1024 * 1024

    # fused QP working set: double-buffered in/out element streams plus one
    # (nkj, epb) stage-1 plane in flight — no VMEM scratch, so it can use
    # most of the 16 MB scoped-vmem window (measured: epb 2048 > 1024 > 512
    # at nq=8^3 on v5e)
    epb_qp = bwdtrans.choose_epb(
        it * (2 * nm_tot + 2 * nq_tot + nkj), e_pad, cfg.epb,
        14 * 1024 * 1024)
    # kron tier: the dense operator is resident and Mosaic buffers it
    # twice — charge 2x its bytes (see benchmark04)
    epb_kron = bwdtrans.choose_epb(
        it * 2 * (nm_tot + nq_tot), e_pad, cfg.epb,
        max(11 * 1024 * 1024 - 2 * c_em3.size * it, 1 << 20))
    pad = bwdtrans.pad_lanes
    # element-major blocks pad the mode axis to the 128-lane tile; halved
    # budget for Mosaic's ~2x scoped-vmem stack factor (see benchmark04)
    epb_em = bwdtrans.choose_epb(
        it * 2 * (pad(nm_tot) + pad(nq_tot)), e_pad, cfg.epb,
        max(budget // 2 - c_em3.size * it, 1 << 20))
    ops_bytes = (s1_em.size + s2_em.size + s3_em.size) * it
    w_cols = pad(s1_em.shape[1]) + pad(s2_em.shape[1])
    epb_1d = bwdtrans.choose_epb(
        it * (2 * pad(nm_tot) + 2 * pad(nq_tot) + w_cols), e_pad, cfg.epb,
        max(budget - ops_bytes, 1 << 20))

    data = bwdtrans.Layouts(
        base=dict(
            basis=basis,
            nelmt=nelmt,
            e_pad=e_pad,
            epb_qp=epb_qp,
            epb_kron=epb_kron,
            epb_em=epb_em,
            epb_1d=epb_1d,
            b0=basis.b0, b1=basis.b1, b2=basis.b2,
            c12t=c12t,
            c_em3=c_em3,
            c_coa3=jnp.asarray(c_em3.T),
            s1_em=s1_em, s2_em=s2_em, s3_em=s3_em,
        ),
        # ALL layouts of the element stream are lazy, built fresh straight
        # from the coefficient vector (stream_sources): one layout resident
        # at a time (VERDICT r2 missing #1)
        derived=dict(
            in_em2=src["em2"],
            in_coa=src["coa"],
            in_em4=lambda: src["em2"]().reshape(e_pad, nm2, nm1, nm0),
            in_coa3=lambda: src["coa"]().reshape(nm2 * nm1, nm0, e_pad),
            in_coa4=lambda: src["coa"]().reshape(nm2, nm1, nm0, e_pad),
            # p-major coalesced layout for the hybrid MXU/VPU QP kernels
            in_pcoa3=src["pcoa3"],
            # the same HBM bytes flattened (nmTot, E) for the flat-block
            # fused QP kernel (reshape of the contiguous pcoa3 stream)
            in_pflat=lambda: src["pcoa3"]().reshape(nm_tot, e_pad),
            # chunk-interleaved coalesced layout (contiguous per-block HBM
            # chunks); chunk width = the kron tier's tuned epb
            in_blk=lambda: src["blk"](data["epb_kron"]),
            # wide-chunk blocked layout (4D) for the low-order VPU kron
            in_blk_wide=lambda: b04_mod._blk4(src, basis.nm_tot, e_pad),
        ),
    )
    # mid-order Coales tier gate: the wide-4D blocked MXU kron wherever its
    # VMEM-budgeted chunk stays >= 8192 elements — the regime measured
    # ahead of the flat blocked GEMM in 3D (nq=4^3 47.4 vs 44.8, nq=6^3
    # 59.6 vs 58.8 GDOF/s, artifacts/wall/lo3d.log).  The 3D chunk cap is
    # 16384, which reproduces the same-session optima (16384 at nq=4^3,
    # 8192 at nq=6^3) exactly; the gate evaluates the cap shape-only
    # (e_pad-independent) so the tier never flips mid-sweep.
    W4_CAP3D = 16384
    if (nm_tot * nq_tot > VPU_KRON_MAX
            and bwdtrans.wide4_chunk_elems(nm_tot, nq_tot, it, 1 << 30,
                                           W4_CAP3D) >= 8192):
        data["ce_wide4"] = bwdtrans.wide4_chunk_elems(
            nm_tot, nq_tot, it, e_pad, W4_CAP3D)
        data.add_derived(
            "in_blk_w4",
            lambda: b04_mod._blk4(src, nm_tot, e_pad, data["ce_wide4"]))
    # XLA-tier element chunking (see benchmark04.prepare): bound the staged
    # variants' workspace residency at the largest sweep sizes
    w_cols = max(nm2 * nm1 * nq0, nm2 * nq1 * nq0)
    data["xla_ce"] = bwdtrans.choose_xla_chunk(
        (nm_tot + 2 * nq_tot) * e_pad * it, w_cols * it, e_pad,
        cfg.mem_cap_bytes)
    # QP/Shared dispatch gate, evaluated ONCE so variant_specs and the
    # autotune branch can never tune different kernels (ADVICE r4)
    data["qp_flat"] = pl_bt.flat_qp_gate(nm2 * nm1, c12t.shape[0],
                                         cfg.itemsize)
    if cfg.dtype == jnp.float64:
        # f64 Coales tier: x64-free exact split-mantissa MXU GEMMs
        # (kernels/ozaki.py; see benchmark04.prepare) — the 3D contraction
        # depth (nm_tot up to 729 at nq=10^3) picks narrower slices
        import numpy as np

        ozaki.prepare_f64_tier(data, np.asarray(data["c_coa3"], np.float64),
                               nm_tot, nq_tot, nelmt, e_pad, cfg)
    if cfg.autotune and cfg.epb is None:
        from tpu_bench.core import autotune as at

        sig = f"nq{nq0}x{nq1}x{nq2}/e{at.e_pad_class(e_pad)}"
        nrq = basis.nm2 * basis.nm1
        if data["qp_flat"]:
            # tune the kernel the dispatch will actually run
            in_pflat = data["in_pflat"]
            data["epb_qp"] = at.autotune_epb(
                "b05/qpf", sig,
                lambda e: (jax.jit(functools.partial(
                    pl_bt.qp_shared3d_flat, nrq=nrq, epb=e,
                    interpret=cfg.interpret, precision=cfg.precision)),
                           (in_pflat, data["b0"], data["c12t"])),
                cfg, e_pad, default=epb_qp)
            del in_pflat
        else:
            in_pcoa3 = data["in_pcoa3"]
            data["epb_qp"] = at.autotune_epb(
                "b05/qp", sig,
                lambda e: (_pl(pl_bt.qp_shared3d, cfg, e),
                           (in_pcoa3, data["b0"], data["c12t"])),
                cfg, e_pad, default=epb_qp)
            del in_pcoa3
        if "in_blk_w4" in data:
            data["ce_wide4"] = at.autotune_epb(
                "b05/wide4", sig,
                lambda ce: (_pl_noepb(kron_wide4, cfg),
                            (b04_mod._blk4(src, nm_tot, e_pad, ce),
                             data["c_coa3"])),
                cfg, e_pad, candidates=(4096, 8192, 16384, 32768),
                default=data["ce_wide4"])
        else:
            data["epb_kron"] = at.autotune_epb(
                "b05/kronblk", sig,
                lambda e: (_pl_noepb(pl_bt.kron_blocked, cfg),
                           (bwdtrans.blocked_coa(data["in_coa"], e),
                            data["c_coa3"])),
                cfg, e_pad, default=epb_kron)
        data["epb_1d"] = at.autotune_epb(
            "b05/1d", sig,
            lambda e: (_pl(pl_bt.qp1d_shared3d, cfg, e),
                       (data["in_em2"], data["s1_em"], data["s2_em"],
                        data["s3_em"])),
            cfg, e_pad, default=epb_1d)
    return data


def run_test(nelmt: int, nq0: int, nq1: int, nq2: int, cfg: Config,
             reporter: Reporter) -> None:
    # f64: scoped x64 for the XLA tier, x64-free Ozaki Pallas tier —
    # see benchmark04.run_test / _measure_scoped
    with x64_scope(cfg.dtype):
        data = prepare(nq0, nq1, nq2, nelmt, cfg)
        jax.block_until_ready(data["b0"])

    # scalar carry for Pallas variants only at array-carry-overflow sizes
    # (see benchmark04.run_test — keeps cached executables elsewhere)
    basis = data["basis"]
    tight = ((basis.nm_tot + 2 * basis.nq_tot + (nq0 - 1) * nq1 * nq2)
             * data["e_pad"] * cfg.itemsize > cfg.mem_cap_bytes)
    times, norms = [], []
    for label, fn, keys in variant_specs(data, cfg):
        t, norm = b04_mod._measure_scoped(label, fn, keys, data, cfg,
                                          reporter, tight)
        times.append(t)
        norms.append(norm)

    if cfg.validate:
        for msg in check_norm_agreement(LABELS, norms, default_rtol(cfg.dtype),
                                        context=f"b05 nelmt={nelmt}"):
            reporter.note("WARNING: " + msg)

    nm = (nq0 - 1) * (nq1 - 1) * (nq2 - 1)
    dofs = [1e-9 * nelmt * nm / t for t in times]
    reporter.emit("nelmt", nelmt, LABELS, norms, dofs, "DOF/s")


def main(argv=None):
    from tpu_bench.benchmarks import cli

    parser = cli.build_parser(
        "benchmark05",
        positionals=[("nq0", 8), ("nq1", 8), ("nq2", 8), ("threads", None),
                     ("elblocks", None)],
    )
    args = parser.parse_args(argv)
    cfg = Config.from_flags(args)
    if cfg.epb is None and args.threads and args.elblocks:
        cfg.epb = args.threads * args.elblocks
    nq0, nq1, nq2 = args.nq0, args.nq1, args.nq2
    nm_tot = (nq0 - 1) * (nq1 - 1) * (nq2 - 1)
    nq_tot = nq0 * nq1 * nq2
    reporter = Reporter("Benchmark05 : BwdTrans (3D)")
    reporter.sweep_title(f"BwdTrans (NQ = {nq0}, {nq1}, {nq2})")
    cap = cfg.mem_cap_bytes
    with cli.profiled(args):
        for nelmt in cli.sweep(128, 1048576, args):
            # residency model mirrors benchmark04.main: one lazy input
            # layout + max(two chain-carried outputs; HBM wsp + one output)
            # + two in-flight 64Ki-element XLA workspace chunks
            wsp = (nq0 - 1) * nq1 * nq2
            need = ((nm_tot + max(2 * nq_tot, wsp + nq_tot)) * nelmt
                    + 2 * max((nq2 - 1) * (nq1 - 1) * nq0,
                              (nq2 - 1) * nq1 * nq0) * 65536) * cfg.itemsize
            if need > cap:
                reporter.note(f"b05: stopping sweep at nelmt {nelmt} (memory cap)")
                break
            cli.guarded(reporter, "b05", nelmt, run_test, nelmt, nq0, nq1, nq2, cfg, reporter)


if __name__ == "__main__":
    main()
