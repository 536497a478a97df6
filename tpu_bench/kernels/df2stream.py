"""Double-float (df2) Pallas streaming kernels — the f64 hand tier for
benchmarks 01/02/03 on a chip with no f64 units.

The reference instantiates its streaming kernels as double
(benchmark01/benchmark01.cc:345, benchmark02:270, benchmark03:347); Mosaic
has no f64 lowering and the toolchain rejects any Pallas program compiled
under jax_enable_x64 (kernels/ozaki.py module docstring), and XLA's
emulated-x64 streaming runs far below the bus (f64 b01 measured 32% of
the read ceiling).  These kernels instead stream each f64 operand as its
exact (hi, lo) f32 pair — split once on device inside the x64 scope as
untimed prep, hi = f32(x), lo = f32(x - hi) — which reads/writes the SAME
8 bytes per value as the reference's double loads (traffic-honest), and
do the arithmetic with error-free f32 transforms (ops/df2, ~2^-48
relative: ~4 more decimal digits than the printed 10-digit norms need).

Shapes mirror the f32 kernels they shadow (kernels/reduction.py, axpy.py,
matvec.py): (rows, 128) tiles, per-block partials or sequential-grid
accumulation, the wide-row DMA-granularity axis, and the rm/cm layout
axis for matvec.  In-tile reductions are log-depth halving trees of
error-free adds, so the result is order-deterministic and matches the
scoped-x64 XLA columns to ~1e-12 relative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.kernels import common
from tpu_bench.ops import df2


def split_pair(x):
    """f64 device array -> (hi, lo) f32 pair, exactly (x = hi + lo).
    Runs f64 elementwise math, so call it INSIDE the x64 scope (untimed
    layout prep, like every variant's)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _tree2(sh, sl):
    """(rows, lanes) df2 pair -> (1, 1) df2 pair by error-free halving on
    both axes (rows and lanes must be powers of two)."""
    r = sh.shape[0]
    while r > 1:
        h = r // 2
        sh, sl = df2.add((sh[:h], sl[:h]), (sh[h:], sl[h:]))
        r = h
    c = sh.shape[1]
    while c > 1:
        h = c // 2
        sh, sl = df2.add((sh[:, :h], sl[:, :h]), (sh[:, h:], sl[:, h:]))
        c = h
    return sh, sl


# ---- b01: sum of squares -------------------------------------------------


def _embed00(v, shape):
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return jnp.where((row == 0) & (lane == 0), v[0, 0],
                     jnp.zeros((), v.dtype))


def _sq_partials_kernel(eps_ref, xh_ref, xl_ref, hi_ref, lo_ref):
    sh, sl = df2.sq(xh_ref[:] + eps_ref[0, 0], xl_ref[:])
    th, tl = _tree2(sh, sl)
    hi_ref[:] = _embed00(th, hi_ref.shape)
    lo_ref[:] = _embed00(tl, lo_ref.shape)


def sumsq_pair_two_pass(x2, eps=0.0, *, lanes=128, target_rows=2048,
                        interpret=False):
    """sum((hi+lo)^2) via per-program df2 partials + a df2 tree finish —
    the two-kernel CUDA-scalar analog (l2norm_vl + reduce_vl,
    benchmark01/benchmark01.cc:15-181) in double-float.  Returns the
    (s_hi, s_lo) f32 scalar pair; the norm is
    sqrt(float(s_hi) + float(s_lo)) on the host."""
    xh, xl = x2
    xh2 = common.as_2d(xh, lanes)
    xl2 = common.as_2d(xl, lanes)
    rows = xh2.shape[0]
    br = common.pow2_rows(rows, target_rows)
    grid = rows // br
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1)
    ph, plo = pl.pallas_call(
        _sq_partials_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((br, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid, 8, 128), jnp.float32),
        ],
        interpret=interpret,
        **common.grid_semantics("parallel", interpret=interpret),
    )(eps2, xh2, xl2)
    # second pass over <= a few thousand partials (zeros inert in two-sum)
    return df2.tree_sum(ph, plo)


def _sq_accum_kernel(eps_ref, xh_ref, xl_ref, hi_ref, lo_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        hi_ref[:] = jnp.zeros_like(hi_ref)
        lo_ref[:] = jnp.zeros_like(lo_ref)

    sh, sl = df2.sq(xh_ref[:] + eps_ref[0, 0], xl_ref[:])
    th, tl = _tree2(sh, sl)
    h, e = df2.add((hi_ref[:], lo_ref[:]), (th, tl))
    hi_ref[:] = h
    lo_ref[:] = e


def sumsq_pair_one_pass(x2, eps=0.0, *, lanes=128, target_rows=2048,
                        interpret=False):
    """sum((hi+lo)^2) accumulated into one df2 block across the sequential
    grid — the atomicAdd-accumulator analog in double-float."""
    xh, xl = x2
    xh2 = common.as_2d(xh, lanes)
    xl2 = common.as_2d(xl, lanes)
    rows = xh2.shape[0]
    br = common.pow2_rows(rows, target_rows)
    grid = rows // br
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1)
    spec = pl.BlockSpec((br, lanes), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    h, l = pl.pallas_call(
        _sq_accum_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            spec, spec,
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
        **common.grid_semantics("arbitrary", interpret=interpret),
    )(eps2, xh2, xl2)
    return h[0, 0], l[0, 0]


def sumsq_pair_wide(x2, eps=0.0, *, interpret=False):
    """1024-lane rows — the float4/double2 vector-load analog."""
    return sumsq_pair_one_pass(x2, eps, lanes=1024, target_rows=512,
                               interpret=interpret)


# ---- b02: x += y ---------------------------------------------------------


def _add_pair_kernel(xh_ref, xl_ref, yh_ref, yl_ref, oh_ref, ol_ref):
    h, e = df2.add((xh_ref[:], xl_ref[:]), (yh_ref[:], yl_ref[:]))
    oh_ref[:] = h
    ol_ref[:] = e


def add_pair(x2, y2, *, target_rows=512, interpret=False):
    """x += y on (hi, lo) pairs: reads 16 B + writes 8 B per element —
    byte-identical to the reference's double x[i] += y[i]
    (benchmark02/benchmark02.cc:16-58 double instantiation).  In-place:
    both halves of x are donated to the output."""
    xh, xl = x2
    yh, yl = y2
    lanes = 128
    xh2 = common.as_2d(xh, lanes)
    rows = xh2.shape[0]
    br = common.pow2_rows(rows, target_rows)
    grid = rows // br
    spec = pl.BlockSpec((br, lanes), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    oh, ol = pl.pallas_call(
        _add_pair_kernel,
        grid=(grid,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(xh2.shape, jnp.float32),
            jax.ShapeDtypeStruct(xh2.shape, jnp.float32),
        ],
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
        **common.grid_semantics("parallel", interpret=interpret),
    )(xh2, common.as_2d(xl, lanes), common.as_2d(yh, lanes),
      common.as_2d(yl, lanes))
    return oh.reshape(xh.shape), ol.reshape(xh.shape)


def add_pair_wide(x2, y2, *, interpret=False):
    """4096-row (2 MB) blocks — the DMA-granularity vector-load analog
    (see kernels/axpy.py module docstring)."""
    return add_pair(x2, y2, target_rows=4096, interpret=interpret)


def map2_pair(x2, y2, f=None, *, interpret=False):
    """Generic functor slot (vector_kernel analog): f maps two df2 pairs
    to one; defaults to the df2 add."""
    if f is not None:
        raise NotImplementedError("only the default df2-add functor is "
                                  "instantiated (reference parity)")
    return add_pair(x2, y2, target_rows=2048, interpret=interpret)


# ---- b03: y = A.x --------------------------------------------------------


def _mv_rm_kernel(ah_ref, al_ref, xh_ref, xl_ref, yh_ref, yl_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        yh_ref[:] = jnp.zeros_like(yh_ref)
        yl_ref[:] = jnp.zeros_like(yl_ref)

    ph, pe = df2.two_prod(ah_ref[:], xh_ref[:])
    pe = pe + ah_ref[:] * xl_ref[:] + al_ref[:] * xh_ref[:]
    c = ph.shape[1]
    while c > 1:
        h = c // 2
        ph, pe = df2.add((ph[:, :h], pe[:, :h]), (ph[:, h:], pe[:, h:]))
        c = h
    h, e = df2.add((yh_ref[:], yl_ref[:]), (ph, pe))
    yh_ref[:] = h
    yl_ref[:] = e


def matvec_pair_rm(a2, x2, *, bm=256, bn=2048, interpret=False):
    """y = A.x on (hi, lo) pairs, row-major row-block tiles (the
    block-per-row cooperative dot analog, benchmark03/benchmark03.cc:15-104
    double instantiation): exact two-prod products, df2 lane-halving row
    sums, df2 accumulation across column blocks.  Streams 8 B per matrix
    entry like the reference's double loads.  Returns the (yh, yl) pair."""
    ah, al = a2
    xh, xl = x2
    m, n = ah.shape
    bm = common.pow2_rows(m, bm)
    bn = common.pow2_rows(n, bn)
    grid = (m // bm, n // bn)
    xh2 = xh.reshape(1, n)
    xl2 = xl.reshape(1, n)
    a_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    yh, yl = pl.pallas_call(
        _mv_rm_kernel,
        grid=grid,
        in_specs=[a_spec, a_spec, x_spec, x_spec],
        out_specs=[y_spec, y_spec],
        out_shape=[
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        interpret=interpret,
        **common.grid_semantics("parallel", "arbitrary",
                                interpret=interpret),
    )(ah, al, xh2, xl2)
    return yh.reshape(m), yl.reshape(m)


def _mv_cm_kernel(ah_ref, al_ref, xh_ref, xl_ref, yh_ref, yl_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        yh_ref[:] = jnp.zeros_like(yh_ref)
        yl_ref[:] = jnp.zeros_like(yl_ref)

    ph, pe = df2.two_prod(ah_ref[:], xh_ref[:])
    pe = pe + ah_ref[:] * xl_ref[:] + al_ref[:] * xh_ref[:]
    r = ph.shape[0]
    while r > 1:
        h = r // 2
        ph, pe = df2.add((ph[:h], pe[:h]), (ph[h:], pe[h:]))
        r = h
    h, e = df2.add((yh_ref[:], yl_ref[:]), (ph, pe))
    yh_ref[:] = h
    yl_ref[:] = e


def matvec_pair_cm(a2_cm, x2, *, bn=512, bk=2048, interpret=False):
    """y = A.x on the column-major copy: tiles (BK, BN) of A^T with the
    x block broadcast down columns, df2 sublane-halving sums, output on
    the lane axis (the layout axis of the reference's cuBLAS 'N' tier;
    f64 has no MXU path, so both b03 Pallas slots are VPU double-float
    and differ by traversal layout exactly like the reference pair)."""
    ah, al = a2_cm
    xh, xl = x2
    n, m = ah.shape
    bn = common.pow2_rows(m, bn)
    bk = common.pow2_rows(n, bk)
    grid = (m // bn, n // bk)
    a_spec = pl.BlockSpec((bk, bn), lambda j, k: (k, j),
                          memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((bk, 1), lambda j, k: (k, 0),
                          memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, bn), lambda j, k: (0, j),
                          memory_space=pltpu.VMEM)
    yh, yl = pl.pallas_call(
        _mv_cm_kernel,
        grid=grid,
        in_specs=[a_spec, a_spec, x_spec, x_spec],
        out_specs=[y_spec, y_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
        ],
        interpret=interpret,
        **common.grid_semantics("parallel", "arbitrary",
                                interpret=interpret),
    )(ah, al, xh.reshape(n, 1), xl.reshape(n, 1))
    return yh.reshape(m), yl.reshape(m)


def pair_sumsq_norm(out) -> float:
    """Norm of a df2 output pair: df2 sumsq on device, combine + sqrt in
    Python f64 on the host (no f64 device type anywhere)."""
    import math

    h, l = jax.jit(df2.sumsq)(*out)
    return math.sqrt(float(h) + float(l))
