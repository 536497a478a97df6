"""Machine bandwidth ceilings — the measured denominators for every honest
"percent of roofline" claim in the artifact set.

The reference's implicit baseline is the STREAM number of its GPU (b02's
2R+1W metric, benchmark02/benchmark02.cc:255-259); its committed peaks sit
at 89-95% of the ~1.5 TB/s device. On TPU v5e the HBM directions are
asymmetric (read saturates well above write), so this benchmark measures
each direction and the canonical STREAM mixes directly on the live chip:

    read   1R      sum(x)
    write  1W      fill(out)
    copy   1R+1W   out = x          (manual-DMA ring)
    scale  1R+1W   x *= c           (manual-DMA ring, in place)
    add    2R+1W   x += y           (manual-DMA ring, in place — b02's op)
    triad  2R+1W   x += c*y         (manual-DMA ring, in place)

All chained HBM-honest timing (core/timing.py) at a working set far above
VMEM.  Output: human-readable ceiling lines, a derived per-benchmark
physical-ceiling table (core/roofline.py), and one machine-parseable JSON
line.  Committed artifact: artifacts/ceilings/ceilings.log.
"""

from __future__ import annotations

import argparse
import functools
import json

import jax
import jax.numpy as jnp

from tpu_bench.core import roofline, timing
from tpu_bench.kernels import stream


def _chain_carry0(fn):
    """run_k(k, x, *rest): k serialized applications carried through x."""

    @jax.jit
    def run_k(k, *args):
        out = jax.lax.fori_loop(0, k, lambda i, xx: fn(xx, *args[1:]),
                                args[0])
        return jnp.sum(out.astype(jnp.float32))

    return run_k


def _measure(run_k, args, n_tests):
    t, _ = timing.time_chained(run_k, args, n_tests=n_tests,
                               compiler_options=timing.honest_options(None))
    return t


def measure_directions(n: int, n_tests: int = 12) -> dict:
    """Measured GB/s of actual bus traffic per direction/mix at n f32
    elements per buffer."""
    nbytes = 4 * n
    rows = n // 128
    x = jnp.arange(n, dtype=jnp.float32) % 7
    y = jnp.ones((n,), jnp.float32)
    c = jnp.full((1, 1), 1.0000001, jnp.float32)
    jax.block_until_ready((x, y, c))
    out = {}

    # read 1R, two probes (max wins — each may leave a little on the
    # table): manual-DMA chunk streaming, and the Mosaic-pipelined
    # sum-of-squares kernel (b01's partials tier reaches 759 on v5e)
    @jax.jit
    def run_read(k, xx):
        def body(i, tok):
            bias = (tok[:1, :1] * 0.0).astype(xx.dtype)
            return stream.read_manual(xx, bias)
        tok0 = stream.read_manual(xx)
        return jnp.sum(jax.lax.fori_loop(0, k, body, tok0))

    out["read_dma"] = nbytes * 1e-9 / _measure(run_read, (x,), n_tests)

    from tpu_bench.kernels import reduction as pl_red

    @jax.jit
    def run_sumsq(k, xx):
        def body(i, s):
            return jnp.atleast_1d(pl_red.sumsq_wide(xx, s[0] * 0.0))
        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros((1,), jnp.float32))[0]

    out["read_auto"] = nbytes * 1e-9 / _measure(run_sumsq, (x,), n_tests)
    out["read"] = max(out["read_dma"], out["read_auto"])

    # write 1W, two probes: manual-DMA fan-out fills and the Mosaic-
    # pipelined block fill
    @jax.jit
    def run_fill(k, seed):
        def body(i, s):
            filled = stream.fill_manual(rows, s)
            return (filled[0, :1] + 1.0).reshape(1, 1)
        return jnp.sum(jax.lax.fori_loop(0, k, body, seed))

    seed = jnp.zeros((1, 1), jnp.float32)
    out["write_dma"] = nbytes * 1e-9 / _measure(run_fill, (seed,), n_tests)

    @jax.jit
    def run_fill_auto(k, seed):
        def body(i, s):
            filled = stream.fill(rows, s)
            return (filled[0, :1] + 1.0).reshape(1, 1)
        return jnp.sum(jax.lax.fori_loop(0, k, body, seed))

    out["write_auto"] = nbytes * 1e-9 / _measure(run_fill_auto, (seed,),
                                                 n_tests)
    out["write"] = max(out["write_dma"], out["write_auto"])

    # copy 1R+1W: self-copy with the destination aliased to the source so
    # the chained loop reuses one buffer (see stream.copy_manual)
    copy = _chain_carry0(
        jax.jit(functools.partial(stream.copy_manual, inplace=True),
                donate_argnums=(0,)))
    out["copy_2x"] = 2 * nbytes * 1e-9 / _measure(copy, (x,), n_tests)

    # scale 1R+1W (in place)
    scale = _chain_carry0(
        jax.jit(functools.partial(stream.scale_manual), donate_argnums=(0,)))
    out["scale_2x"] = 2 * nbytes * 1e-9 / _measure(scale, (x, c), n_tests)

    # add 2R+1W (b02's op, 3x counting)
    add = _chain_carry0(
        jax.jit(functools.partial(stream.add_inplace_manual),
                donate_argnums=(0,)))
    out["add_3x"] = 3 * nbytes * 1e-9 / _measure(add, (x, y), n_tests)

    # triad 2R+1W
    triad = _chain_carry0(
        jax.jit(functools.partial(stream.triad_manual), donate_argnums=(0,)))
    out["triad_3x"] = 3 * nbytes * 1e-9 / _measure(triad, (x, y, c), n_tests)

    # expand 1R:{2,4,8}W — the write-heavy regime of the BwdTrans mixes
    # (up to 1R:8W at 3D nq=2); scalar token carry, the output is opaque
    # pallas DMA so one buffer stays resident
    for m in (2, 4, 8):

        @jax.jit
        def run_expand(k, xx, tok0, m=m):
            def body(i, tok):
                o = stream.expand_manual(xx, m, bias=tok * 0.0)
                return o[:1, :1]

            tok = jax.lax.fori_loop(0, k, body, tok0)
            return jnp.sum(tok)

        tok0 = jnp.zeros((1, 1), jnp.float32)
        out[f"expand{m}"] = ((1 + m) * nbytes * 1e-9
                             / _measure(run_expand, (x, tok0), n_tests))
    return out


def derived_table(bw: dict, itemsize: int = 4) -> list:
    """(name, shared_bus, empirical, unit) rows from the measured
    directions: shared-bus = no read/write overlap (the analytic target),
    empirical = the probe-ladder interpolation for that benchmark's exact
    mix (roofline.empirical_mix_bandwidth — the artifact honesty bound;
    falls back to full-duplex when the expand probes are absent)."""
    r, w = bw["read"], bw["write"]

    def emp(rb, wb, duplex_fallback):
        v = roofline.empirical_mix_bandwidth(bw, rb, wb)
        return v if v is not None else duplex_fallback

    rows = [
        ("b01 L2-norm (1R)", r, r, "GB/s"),
        ("b02 add 2R+1W (3x)", roofline.stream_add_ceiling(r, w),
         emp(2, 1, roofline.stream_add_ceiling(r, w, duplex=True)), "GB/s"),
        ("b03 matvec (A-read)", roofline.matvec_ceiling_gbs(r),
         roofline.matvec_ceiling_gbs(r), "GB/s"),
    ]
    for dim, nqs in ((2, (2, 4, 6, 8, 10, 12, 14, 16, 32)),
                     (3, (2, 4, 6, 8, 10))):
        for nq in nqs:
            v = roofline.empirical_bwdtrans_gdofs(bw, nq, dim, itemsize)
            if v is None:
                v = roofline.bwdtrans_ceiling_gdofs(r, w, nq, dim, itemsize,
                                                    duplex=True)
            rows.append((
                f"b0{dim + 2} {dim}D nq={nq}",
                roofline.bwdtrans_ceiling_gdofs(r, w, nq, dim, itemsize),
                v, "GDOF/s"))
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="measure HBM directional/mix bandwidth ceilings")
    parser.add_argument("--size", type=int, default=128 * 2**20,
                        help="elements per f32 buffer (default 128Mi)")
    parser.add_argument("--ntests", type=int, default=12)
    args = parser.parse_args(argv)

    dev = jax.devices()[0]
    print("-" * 32)
    print(f"{'Ceilings : HBM directions':<32}")
    print("-" * 32)
    print(f"device: {dev.device_kind}; buffer {4 * args.size / 2**20:.0f} "
          f"MiB f32; chained HBM-honest timing", flush=True)
    bw = measure_directions(args.size, args.ntests)
    for k, v in bw.items():
        print(f"Measured {k} GB/s: {v:.10g}", flush=True)
    print("Derived physical ceilings (core/roofline.py): "
          "shared-bus | empirical")
    for name, v, vd, unit in derived_table(bw):
        print(f"Ceiling {name} ({unit}): {v:.10g} | {vd:.10g}")
    print(json.dumps({"device": dev.device_kind, "f32_elems": args.size,
                      **{k: round(v, 1) for k, v in bw.items()}}))


if __name__ == "__main__":
    main()
