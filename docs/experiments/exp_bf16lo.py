"""bf16 low-order frontier: 2-byte-granularity ceilings + bytes-equal chunks.

The bf16 tier's weakest cells are the low orders — b04 nq=2 at 88%, nq=4 at
89%, b05 nq=2^3 at 91% of their shared-bus ceilings — while the f32
counterparts of the same kernels sit at 93-97%.  The bf16 cells are scored
against expand probes measured with f32 elements, and the production chunk
caps (512Ki elements for the VPU kron, 32Ki for kron_wide4) were tuned at
f32, where the same element count is twice the bytes per block.  This
experiment separates the two confounds back-to-back on one session:

  P  bf16 probes   expand4/expand8 with bf16 elements (same total bytes as
                   the f32 ceilings probes, 512 MiB) plus an f32 expand4
                   control: is the f32-measured 1R:mW rate even achievable
                   at 2-byte element granularity?  If not, the committed
                   cells are closer to the true wall than the table says.
  A  cap sweeps    the production tiers under itemsize-scaled caps.  At
                   bf16 a cap of 1Mi elements is byte-identical per block
                   to the f32-measured 512Ki optimum (artifacts/wall/
                   nq2wall.log), so if block *bytes* set the optimum the
                   doubled cap should recover the f32 efficiency; if block
                   *element count* does, the committed cap is already right.

Covers: b04 nq=2 (kron_vpu_blocked), b04 nq=4 (kron_wide4), b05 nq=2^3
(kron_vpu_blocked).  Reference analog: the float instantiation compiled for
every benchmark, /root/reference/benchmark04/benchmark04.cc:1072.

Usage: python docs/experiments/exp_bf16lo.py [nelmt]     (default 1048576)
"""
import os as _os
import sys

sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bench.core.config import Config
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.core.validate import l2norm
from tpu_bench.kernels import stream
from tpu_bench.kernels.bwdtrans2d import kron_vpu_blocked, kron_wide4
from tpu_bench.benchmarks import benchmark04 as b04_mod
from tpu_bench.ops import bwdtrans, initdata

HIGHEST = jax.lax.Precision.HIGHEST


def probe_expand(m, dtype, nbytes=512 * 1024 * 1024, n_tests=12,
                 chunk_bytes=stream.CHUNK_BYTES):
    """1R:mW GB/s with `dtype` elements on an nbytes source buffer — the
    ceilings.py expand probe re-run at the tier's element granularity.
    bf16 runs need chunk_bytes <= 8 MiB: the 16 MiB ring plus the bias-add
    staging overflows Mosaic's scoped window at itemsize 2."""
    itemsize = jnp.dtype(dtype).itemsize
    n = nbytes // itemsize
    x = (jnp.arange(n, dtype=jnp.float32) % 7).astype(dtype)
    tok0 = jnp.zeros((1, 1), dtype)
    jax.block_until_ready((x, tok0))

    @jax.jit
    def run_expand(k, xx, tok0):
        def body(i, tok):
            o = stream.expand_manual(xx, m, bias=tok * 0.0,
                                     chunk_bytes=chunk_bytes)
            return o[:1, :1]

        tok = jax.lax.fori_loop(0, k, body, tok0)
        return jnp.sum(tok.astype(jnp.float32))

    t, _ = timing.time_chained(run_expand, (x, tok0), n_tests=n_tests,
                               compiler_options=timing.honest_options(None))
    return (1 + m) * itemsize * n * 1e-9 / t


def run(label, fn, args, dof, ref_norm, cfg):
    try:
        t, w = timing.measure(fn, args, cfg,
                              chain_fn=eps_chain(fn, eps_arg=1),
                              with_witness=True)
        err = abs(float(np.sqrt(w)) - ref_norm) / ref_norm
        print(f"{label:34s} {dof / t:8.2f} GDOF/s  rel-err {err:.2e}",
              flush=True)
    except Exception as ex:
        print(f"{label:34s} FAIL {str(ex).splitlines()[0][:100]}",
              flush=True)


def main():
    nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    e_pad = initdata.round_up(nelmt, 128)
    assert e_pad == nelmt, "use a multiple of 128"
    cfg = Config(timing="chained")
    dt = jnp.bfloat16

    # ---- P: element-granularity probes (f32 control first) --------------
    g4f = probe_expand(4, jnp.float32)
    print(f"P expand4 f32  control            {g4f:8.2f} GB/s", flush=True)
    g4 = probe_expand(4, dt)
    print(f"P expand4 bf16                    {g4:8.2f} GB/s -> b04 nq=2 "
          f"ceiling {g4 / 10:6.2f} GDOF/s", flush=True)
    g8 = probe_expand(8, dt)
    print(f"P expand8 bf16                    {g8:8.2f} GB/s -> b05 nq=2^3 "
          f"ceiling {g8 / 18:6.2f} GDOF/s", flush=True)

    # ---- A1: b04 nq=2 VPU kron, cap sweep --------------------------------
    basis = bwdtrans.make_basis2d(2, 2, dt)
    src = bwdtrans.stream_sources(
        bwdtrans.element_data2d(basis, dt),
        (basis.nm1, basis.nm0), nelmt, e_pad, dt)
    c_coa = jnp.asarray(bwdtrans.operators2d(basis)[0].T)  # (4, 1)
    dof = 1e-9 * nelmt * basis.nm_tot
    ref = float(l2norm(src["coa"]())) * float(
        jnp.linalg.norm(c_coa.astype(jnp.float32)))
    print(f"b04 nq=2 bf16 nelmt={nelmt} ref norm {ref:.6f}", flush=True)
    for cap in (262144, 524288, 1048576):
        in_blk4 = b04_mod._blk4(src, basis.nm_tot, e_pad, cap)
        tag = "production" if cap == 524288 else "cap sweep "
        run(f"A1 {tag} nq=2  cap={cap:7d}", jax.jit(kron_vpu_blocked),
            (in_blk4, c_coa), dof, ref, cfg)
        del in_blk4

    # ---- A2: b04 nq=4 wide-4D MXU kron, cap sweep ------------------------
    basis4 = bwdtrans.make_basis2d(4, 4, dt)
    src4 = bwdtrans.stream_sources(
        bwdtrans.element_data2d(basis4, dt),
        (basis4.nm1, basis4.nm0), nelmt, e_pad, dt)
    c4 = jnp.asarray(bwdtrans.operators2d(basis4)[0].T)    # (16, 9)
    dof4 = 1e-9 * nelmt * basis4.nm_tot
    flat4 = src4["coa"]().reshape(basis4.nm_tot, e_pad)
    ref4 = float(jnp.linalg.norm(
        c4.astype(jnp.float32) @ flat4.astype(jnp.float32)))
    del flat4
    print(f"b04 nq=4 bf16 nelmt={nelmt} ref norm {ref4:.6f}", flush=True)
    for cap in (32768, 65536, 131072):
        in_blk4 = b04_mod._blk4(src4, basis4.nm_tot, e_pad, cap)
        tag = "production" if cap == 32768 else "cap sweep "
        run(f"A2 {tag} nq=4  cap={cap:7d}",
            jax.jit(functools.partial(kron_wide4, precision=HIGHEST)),
            (in_blk4, c4), dof4, ref4, cfg)
        del in_blk4
    del src4

    # ---- A3: b05 nq=2^3 VPU kron, cap sweep -------------------------------
    basis3 = bwdtrans.make_basis3d(2, 2, 2, dt)
    src3 = bwdtrans.stream_sources(
        bwdtrans.element_data3d(basis3, dt),
        (basis3.nm2, basis3.nm1, basis3.nm0), nelmt, e_pad, dt)
    c3 = jnp.asarray(bwdtrans.operators3d(basis3)[0].T)    # (8, 1)
    dof3 = 1e-9 * nelmt * basis3.nm_tot
    ref3 = float(l2norm(src3["coa"]())) * float(
        jnp.linalg.norm(c3.astype(jnp.float32)))
    print(f"b05 nq=2^3 bf16 nelmt={nelmt} ref norm {ref3:.6f}", flush=True)
    for cap in (262144, 524288, 1048576):
        in_blk4 = b04_mod._blk4(src3, basis3.nm_tot, e_pad, cap)
        tag = "production" if cap == 524288 else "cap sweep "
        run(f"A3 {tag} nq=2^3 cap={cap:7d}", jax.jit(kron_vpu_blocked),
            (in_blk4, c3), dof3, ref3, cfg)
        del in_blk4


if __name__ == "__main__":
    main()
