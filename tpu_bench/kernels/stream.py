"""Manual-DMA streaming pipeline kernels (the hand-vectorized tier).

Reference analog: the float4/double2 vector-load CUDA kernels
(utils/cuda_vectors.h:7-141, benchmark02/benchmark02.cc:16-58) — the tier
where the reference hand-controls memory transaction width.  The TPU
equivalent of that hand optimization is explicit HBM<->VMEM DMA control:
one VMEM slot ring per operand, chunks far larger than Mosaic's automatic
block pipeline would pick (16 MB vs 2 MB), the elementwise compute done in
the first operand's slot, and the writeback issued from that same slot.

Measured on v5e at 256 MB/buffer (f32, chained HBM-honest fixed-window
timing): chunk 16 MB x depth 3 sustains a committed 690.7 GB/s of
STREAM-add 3x counting (artifacts/b02) vs ~680 GB/s for the best
automatic Pallas block pipeline — 84% of the 819 GB/s nominal HBM and
~100% of the machine's measured STREAM-add probe (686 GB/s; the write
direction tops out at 660 GB/s, see benchmarks/ceilings.py).

Also hosts the direction-ceiling probes (fill = 1W, copy = 1R+1W) used by
benchmarks/ceilings.py to measure what the chip can actually do per
traffic mix — the denominators for every honest "percent of roofline"
claim in the artifact set.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.kernels import common

# 16 MB chunks on a depth-3 ring: measured best on v5e (scripts/exp_b02g.py
# sweep: {2,8,16,32} MB x depth {2,3,4} -> 16 MB / 3 wins at 703 GB/s)
CHUNK_BYTES = 16 * 1024 * 1024
DEPTH = 3


def _vmem_params(ring_bytes: int, interpret: bool) -> dict:
    """Per-kernel VMEM window sized to the slot rings (+1 MB slack).  The
    rings intentionally exceed Mosaic's ~16 MB default scoped window — a
    96 MB ring is the point of the hand tier — so the kernel must request
    its own limit; interpret mode takes no compiler params."""
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=min(ring_bytes + (1 << 20), 128 * 1024 * 1024))}


def _ring_kernel(nchunks, cr, depth, compute, n_scalar, *refs):
    """Slot-ring pipeline body: refs = (*scalars_smem, *in_hbm, out_hbm).

    Each chunk j: wait reads into slot j%depth, compute into the first
    operand's slot (None = pure copy), write back from it, then — once the
    write has landed — prefetch chunk j+depth into the freed slot.
    compute receives the streamed slots followed by the SMEM scalar refs.
    """
    scalars = refs[:n_scalar]
    n_in = len(refs) - n_scalar - 1
    ins, out_hbm = refs[n_scalar:n_scalar + n_in], refs[-1]

    def body(*scoped):
        rings = scoped[:n_in]
        sems = scoped[n_in:2 * n_in]
        sw = scoped[-1]

        def rd(i, slot, j):
            return pltpu.make_async_copy(
                ins[i].at[pl.ds(j * cr, cr), :], rings[i].at[slot],
                sems[i].at[slot])

        def wr(slot, j):
            return pltpu.make_async_copy(
                rings[0].at[slot], out_hbm.at[pl.ds(j * cr, cr), :],
                sw.at[slot])

        for j in range(min(depth, nchunks)):
            for i in range(n_in):
                rd(i, j, j).start()

        def loop(j, _):
            slot = j % depth
            for i in range(n_in):
                rd(i, slot, j).wait()
            if compute is not None:
                rings[0][slot] = compute(*(r[slot] for r in rings),
                                         *scalars)
            wr(slot, j).start()

            @pl.when(j + depth < nchunks)
            def _():
                wr(slot, j).wait()  # slot reused: the writeback must land
                for i in range(n_in):
                    rd(i, slot, j + depth).start()

            return _

        jax.lax.fori_loop(0, nchunks, loop, None)
        for j in range(max(nchunks - depth, 0), nchunks):
            wr(j % depth, j).wait()

    dtype = ins[0].dtype
    pl.run_scoped(
        body,
        *[pltpu.VMEM((depth, cr, common.LANES), dtype) for _ in range(n_in)],
        *[pltpu.SemaphoreType.DMA((depth,)) for _ in range(n_in)],
        pltpu.SemaphoreType.DMA((depth,)),
    )


def _chunk_rows(rows: int, itemsize: int, chunk_bytes: int, depth: int) -> int:
    """Largest power-of-2 row chunk <= chunk_bytes that divides rows."""
    target = max(chunk_bytes // (common.LANES * itemsize), 1)
    return common.pow2_rows(rows, target)


def _stream(compute: Optional[Callable], arrays, *, chunk_bytes: int,
            depth: int, inplace: bool, interpret: bool, scalars=()):
    """Run the ring pipeline over 1D operands; returns the streamed output.
    scalars are (1, 1) arrays handed to compute as SMEM refs."""
    x2s = [common.as_2d(a) for a in arrays]
    rows = x2s[0].shape[0]
    cr = _chunk_rows(rows, x2s[0].dtype.itemsize, chunk_bytes, depth)
    nchunks = rows // cr
    n_sc = len(scalars)
    ring_bytes = len(x2s) * depth * cr * common.LANES * x2s[0].dtype.itemsize
    out = pl.pallas_call(
        functools.partial(_ring_kernel, nchunks, cr, depth, compute, n_sc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM) for _ in scalars]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in x2s],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x2s[0].shape, x2s[0].dtype),
        input_output_aliases={n_sc: 0} if inplace else {},
        interpret=interpret,
        **_vmem_params(ring_bytes, interpret),
    )(*scalars, *x2s)
    return out.reshape(arrays[0].shape)


def add_inplace_manual(x, y, *, chunk_bytes: int = CHUNK_BYTES,
                       depth: int = DEPTH, interpret: bool = False):
    """x += y via the manual DMA ring — benchmark02's hand tier
    (reference vl kernel: benchmark02/benchmark02.cc:16-58)."""
    return _stream(lambda a, b: a + b, (x, y), chunk_bytes=chunk_bytes,
                   depth=depth, inplace=True, interpret=interpret)


def copy_manual(x, *, chunk_bytes: int = CHUNK_BYTES, depth: int = DEPTH,
                inplace: bool = False, interpret: bool = False):
    """Pure HBM->HBM copy (1R+1W) — the copy-mix ceiling probe.

    inplace=True self-copies (destination aliases the source): chained
    timing needs it so the loop-carried output reuses one buffer — without
    donation XLA double-buffers the carry and the probe halves (measured
    330 vs ~660 GB/s)."""
    return _stream(None, (x,), chunk_bytes=chunk_bytes, depth=depth,
                   inplace=inplace, interpret=interpret)


def scale_manual(x, c, *, chunk_bytes: int = CHUNK_BYTES, depth: int = DEPTH,
                 interpret: bool = False):
    """x *= c[0, 0] (1R+1W with compute) — STREAM-scale."""
    return _stream(lambda a, c_ref: a * c_ref[0, 0], (x,),
                   chunk_bytes=chunk_bytes, depth=depth, inplace=True,
                   interpret=interpret, scalars=(c,))


def triad_manual(x, y, c, *, chunk_bytes: int = CHUNK_BYTES,
                 depth: int = DEPTH, interpret: bool = False):
    """x = x + c[0, 0]*y (2R+1W) — STREAM-triad."""
    return _stream(lambda a, b, c_ref: a + c_ref[0, 0] * b, (x, y),
                   chunk_bytes=chunk_bytes, depth=depth, inplace=True,
                   interpret=interpret, scalars=(c,))


# ---------------------------------------------------------------------------
# write-only fill (the 1W direction ceiling)
# ---------------------------------------------------------------------------


def _fill_kernel(seed_ref, out_ref):
    out_ref[:] = jnp.full_like(out_ref, seed_ref[0, 0])


def fill(rows: int, seed, *, dtype=jnp.float32, block_rows: int = 8192,
         interpret: bool = False):
    """Write a (rows, 128) array of seed[0, 0] — pure-write bandwidth."""
    br = common.pow2_rows(rows, block_rows)
    return pl.pallas_call(
        _fill_kernel,
        grid=(rows // br,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((br, common.LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, common.LANES), dtype),
        interpret=interpret,
        **common.grid_semantics("parallel", interpret=interpret),
    )(seed)


def _fill_manual_kernel(rows, cr, depth, seed_ref, out_hbm):
    """A ring of depth VMEM source blocks, overlapping VMEM->HBM copies
    (distinct sources so concurrent DMAs never contend on one block)."""
    nchunks = rows // cr

    def body(buf, sw):
        buf[:] = jnp.full_like(buf, seed_ref[0, 0])

        def wr(slot, j):
            return pltpu.make_async_copy(
                buf.at[slot], out_hbm.at[pl.ds(j * cr, cr), :], sw.at[slot])

        for j in range(min(depth, nchunks)):
            wr(j, j).start()

        def loop(j, _):
            slot = j % depth
            wr(slot, j - depth).wait()
            wr(slot, j).start()
            return _

        jax.lax.fori_loop(depth, nchunks, loop, None)
        for j in range(max(nchunks - depth, 0), nchunks):
            wr(j % depth, j).wait()

    pl.run_scoped(body, pltpu.VMEM((depth, cr, common.LANES), out_hbm.dtype),
                  pltpu.SemaphoreType.DMA((depth,)))


def fill_manual(rows: int, seed, *, dtype=jnp.float32,
                chunk_bytes: int = CHUNK_BYTES, depth: int = DEPTH,
                interpret: bool = False):
    """Pure-write bandwidth via depth overlapping DMA copies of one VMEM
    source block — the 1W direction probe for benchmarks/ceilings.py."""
    cr = _chunk_rows(rows, jnp.dtype(dtype).itemsize, chunk_bytes, depth)
    ring = depth * cr * common.LANES * jnp.dtype(dtype).itemsize
    return pl.pallas_call(
        functools.partial(_fill_manual_kernel, rows, cr, depth),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((rows, common.LANES), dtype),
        interpret=interpret,
        **_vmem_params(ring, interpret),
    )(seed)


def _expand_manual_kernel(rows, cr, depth, m, bias_ref, x_hbm, out_hbm):
    """1R:mW ring: read chunk j into its slot, add the chained-timing bias,
    then issue m concurrent VMEM->HBM copies of the slot to m distinct
    output chunks; the slot is reused only after all m writes land."""
    nchunks = rows // cr

    def body(bufs, sr, sw):
        def rd(slot, j):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(j * cr, cr), :], bufs.at[slot], sr.at[slot])

        def wr(slot, j, t):
            return pltpu.make_async_copy(
                bufs.at[slot], out_hbm.at[pl.ds((j * m + t) * cr, cr), :],
                sw.at[slot, t])

        for j in range(min(depth, nchunks)):
            rd(j, j).start()

        def loop(j, _):
            slot = j % depth
            rd(slot, j).wait()
            bufs[slot] = bufs[slot] + bias_ref[0, 0]
            for t in range(m):
                wr(slot, j, t).start()

            @pl.when(j + depth < nchunks)
            def _():
                for t in range(m):
                    wr(slot, j, t).wait()  # slot reused: writes must land
                rd(slot, j + depth).start()

            return _

        jax.lax.fori_loop(0, nchunks, loop, None)
        for j in range(max(nchunks - depth, 0), nchunks):
            for t in range(m):
                wr(j % depth, j, t).wait()

    pl.run_scoped(body, pltpu.VMEM((depth, cr, common.LANES), x_hbm.dtype),
                  pltpu.SemaphoreType.DMA((depth,)),
                  pltpu.SemaphoreType.DMA((depth, m)))


def expand_manual(x, m: int, bias=None, *, chunk_bytes: int = CHUNK_BYTES,
                  depth: int = DEPTH, interpret: bool = False):
    """Write m copies of x (1R:mW) — the write-heavy mix probes for
    benchmarks/ceilings.py.  The BwdTrans benchmarks are write-dominant
    (nm^dim reads : nq^dim writes per element, up to 1R:8W at 3D nq=2), a
    regime the directional/STREAM probes do not cover; the 1R:{2,4,8}W
    ladder pins the chip's measured read/write overlap there, giving the
    committed-artifact honesty test an empirical per-mix bound instead of
    the loose full-duplex one (VERDICT r2 weak #5)."""
    x2 = common.as_2d(x)
    rows = x2.shape[0]
    cr = _chunk_rows(rows, x2.dtype.itemsize, chunk_bytes, depth)
    if bias is None:
        bias = jnp.zeros((1, 1), x2.dtype)
    # one extra chunk of slack beyond the slot ring: the bias-add staging
    # for sub-32-bit dtypes allocates ~chunk/2 more (measured bf16 overflow
    # vs the ring+1MB limit: +chunk/2-0.15MB at both 8 and 16 MB chunks)
    ring = (depth + 1) * cr * common.LANES * x2.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_expand_manual_kernel, rows, cr, depth, m),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((m * rows, common.LANES), x2.dtype),
        interpret=interpret,
        **_vmem_params(ring, interpret),
    )(bias, x2)




def _read_manual_kernel(rows, cr, depth, bias_ref, x_hbm, tok_ref):
    """Depth overlapping HBM->VMEM copies; data is consumed only by the
    tiny output token (DMAs are opaque to XLA — nothing can be elided)."""
    nchunks = rows // cr

    def body(bufs, sx):
        def rd(slot, j):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(j * cr, cr), :], bufs.at[slot], sx.at[slot])

        for j in range(min(depth, nchunks)):
            rd(j, j).start()

        def loop(j, _):
            slot = j % depth
            rd(slot, j - depth).wait()
            rd(slot, j).start()
            return _

        jax.lax.fori_loop(depth, nchunks, loop, None)
        for j in range(max(nchunks - depth, 0), nchunks):
            rd(j % depth, j).wait()
        tok_ref[:] = bufs[0, :8, :] + bias_ref[0, 0]

    pl.run_scoped(body, pltpu.VMEM((depth, cr, common.LANES), x_hbm.dtype),
                  pltpu.SemaphoreType.DMA((depth,)))


def read_manual(x, bias=None, *, chunk_bytes: int = CHUNK_BYTES,
                depth: int = DEPTH, interpret: bool = False):
    """Pure-read bandwidth probe: stream x HBM->VMEM, return an (8, 128)
    token (+ bias[0, 0], the chained-timing data dependence) — the 1R
    direction probe for benchmarks/ceilings.py."""
    x2 = common.as_2d(x)
    rows = x2.shape[0]
    cr = _chunk_rows(rows, x2.dtype.itemsize, chunk_bytes, depth)
    if bias is None:
        bias = jnp.zeros((1, 1), x2.dtype)
    ring = depth * cr * common.LANES * x2.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_read_manual_kernel, rows, cr, depth),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, common.LANES), x2.dtype),
        interpret=interpret,
        **_vmem_params(ring, interpret),
    )(bias, x2)
