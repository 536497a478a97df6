"""Focused: big-chunk manual add (write from xs), read-only ceiling."""
import sys, time, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_bench.core import timing

N = 64 * 2**20

def manual_add2(x, y, *, cr, depth):
    """In-place add, compute into xs slot, write back from xs."""
    x2 = x.reshape(-1, 128); y2 = y.reshape(-1, 128)
    rows = x2.shape[0]
    nchunks = rows // cr

    def kernel(x_hbm, y_hbm, o_hbm):
        def body(xs, ys, sx, sy, sw):
            def rdx(slot, j):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(j * cr, cr), :], xs.at[slot], sx.at[slot])
            def rdy(slot, j):
                return pltpu.make_async_copy(
                    y_hbm.at[pl.ds(j * cr, cr), :], ys.at[slot], sy.at[slot])
            def wr(slot, j):
                return pltpu.make_async_copy(
                    xs.at[slot], o_hbm.at[pl.ds(j * cr, cr), :], sw.at[slot])
            for j in range(min(depth, nchunks)):
                rdx(j, j).start(); rdy(j, j).start()
            def loop(j, _):
                slot = j % depth
                rdx(slot, j).wait(); rdy(slot, j).wait()
                xs[slot] = xs[slot] + ys[slot]
                wr(slot, j).start()
                @pl.when(j + depth < nchunks)
                def _():
                    wr(slot, j).wait()  # xs[slot] reused: write must land
                    rdx(slot, j + depth).start()
                    rdy(slot, j + depth).start()
                return _
            jax.lax.fori_loop(0, nchunks, loop, None)
            for j in range(max(nchunks - depth, 0), nchunks):
                wr(j % depth, j).wait()
        pl.run_scoped(
            body,
            xs=pltpu.VMEM((depth, cr, 128), x2.dtype),
            ys=pltpu.VMEM((depth, cr, 128), x2.dtype),
            sx=pltpu.SemaphoreType.DMA((depth,)),
            sy=pltpu.SemaphoreType.DMA((depth,)),
            sw=pltpu.SemaphoreType.DMA((depth,)),
        )
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        input_output_aliases={0: 0},
    )(x2, y2)
    return out.reshape(x.shape)

def read_only(x, *, cr, depth):
    """Pure-read ceiling: sum chunks via manual DMA."""
    x2 = x.reshape(-1, 128)
    rows = x2.shape[0]
    nchunks = rows // cr
    def kernel(eps_ref, x_hbm, out_ref):
        def body(xs, acc, sx):
            def rdx(slot, j):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(j * cr, cr), :], xs.at[slot], sx.at[slot])
            for j in range(min(depth, nchunks)):
                rdx(j, j).start()
            acc[:] = jnp.zeros_like(acc)
            def loop(j, _):
                slot = j % depth
                rdx(slot, j).wait()
                acc[:] += jnp.sum(xs[slot] * xs[slot], axis=0,
                                  keepdims=True) + eps_ref[0, 0]
                @pl.when(j + depth < nchunks)
                def _():
                    rdx(slot, j + depth).start()
                return _
            jax.lax.fori_loop(0, nchunks, loop, None)
            out_ref[:] = jnp.sum(acc[:], dtype=out_ref.dtype).reshape(1, 1)
        pl.run_scoped(
            body,
            xs=pltpu.VMEM((depth, cr, 128), x2.dtype),
            acc=pltpu.VMEM((1, 128), jnp.float32),
            sx=pltpu.SemaphoreType.DMA((depth,)),
        )
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(jnp.zeros((1, 1), x.dtype), x2)[0, 0]

def run_add(label, fn):
    x = jnp.ones((N,), jnp.float32)
    y = jnp.full((N,), 1e-9, jnp.float32)
    @jax.jit
    def run_k(k, x, y):
        out = jax.lax.fori_loop(0, k, lambda i, c: fn(c, y), x)
        return jnp.sum(out[:128])
    try:
        t, _ = timing.time_chained(run_k, (x, y), n_tests=24,
                                compiler_options=timing.honest_options())
        print(f"{label:32s} {3 * 4 * N * 1e-9 / t:8.1f} GB/s", flush=True)
    except Exception as ex:
        print(f"{label:32s} FAILED: {str(ex).splitlines()[0][:160]}", flush=True)

def run_read(label, fn):
    x = jnp.ones((N,), jnp.float32)
    @jax.jit
    def run_k(k, x):
        def body(i, p):
            return fn(x + (0.0 * p).astype(x.dtype)[()])
        # perturb via eps-free: fold p into a dummy; simpler: chain through sum
        return jax.lax.fori_loop(0, k, lambda i, p: fn(x) + 0.0 * p,
                                 jnp.float32(0.0))
    try:
        t, _ = timing.time_chained(run_k, (x,), n_tests=24,
                                compiler_options=timing.honest_options())
        print(f"{label:32s} {4 * N * 1e-9 / t:8.1f} GB/s", flush=True)
    except Exception as ex:
        print(f"{label:32s} FAILED: {str(ex).splitlines()[0][:160]}", flush=True)

import numpy as np
xt = jnp.arange(1024 * 128, dtype=jnp.float32)
np.testing.assert_allclose(np.asarray(manual_add2(xt, jnp.ones_like(xt), cr=128, depth=3)),
                           np.asarray(xt) + 1.0)
print("correctness ok", flush=True)

for depth, cr in [(2, 8192), (2, 16384), (3, 8192), (3, 16384), (2, 32768)]:
    run_add(f"manual2 add d={depth} cr={cr}",
            functools.partial(manual_add2, cr=cr, depth=depth))
for depth, cr in [(2, 16384), (3, 8192), (4, 8192)]:
    run_read(f"manual read d={depth} cr={cr}",
             functools.partial(read_only, cr=cr, depth=depth))
