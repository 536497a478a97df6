"""Manual N-deep DMA-pipelined in-place add."""
import sys, time, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_bench.core import timing

N = 64 * 2**20

def manual_add(x, y, *, cr, depth):
    x2 = x.reshape(-1, 128); y2 = y.reshape(-1, 128)
    rows = x2.shape[0]
    nchunks = rows // cr

    def kernel(x_hbm, y_hbm, o_hbm):
        def body(xs, ys, os, sx, sy, sw):
            def rdx(slot, j):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(j * cr, cr), :], xs.at[slot], sx.at[slot])
            def rdy(slot, j):
                return pltpu.make_async_copy(
                    y_hbm.at[pl.ds(j * cr, cr), :], ys.at[slot], sy.at[slot])
            def wr(slot, j):
                return pltpu.make_async_copy(
                    os.at[slot], o_hbm.at[pl.ds(j * cr, cr), :], sw.at[slot])
            for j in range(min(depth, nchunks)):
                rdx(j, j).start()
                rdy(j, j).start()

            def loop(j, _):
                slot = j % depth
                rdx(slot, j).wait()
                rdy(slot, j).wait()
                @pl.when(j >= depth)
                def _():
                    wr(slot, j - depth).wait()
                os[slot] = xs[slot] + ys[slot]
                wr(slot, j).start()
                @pl.when(j + depth < nchunks)
                def _():
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
            os=pltpu.VMEM((depth, cr, 128), x2.dtype),
            sx=pltpu.SemaphoreType.DMA((depth,)),
            sy=pltpu.SemaphoreType.DMA((depth,)),
            sw=pltpu.SemaphoreType.DMA((depth,)),
        )

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        input_output_aliases={0: 0},
    )(x2, y2)
    return out.reshape(x.shape)

def run(label, fn):
    x = jnp.ones((N,), jnp.float32)
    y = jnp.full((N,), 1e-9, jnp.float32)
    @jax.jit
    def run_k(k, x, y):
        out = jax.lax.fori_loop(0, k, lambda i, c: fn(c, y), x)
        return jnp.sum(out[:128])
    try:
        t, _ = timing.time_chained(run_k, (x, y), n_tests=16,
                                compiler_options=timing.honest_options())
        print(f"{label:32s} {3 * 4 * N * 1e-9 / t:8.1f} GB/s", flush=True)
    except Exception as ex:
        print(f"{label:32s} FAILED: {str(ex).splitlines()[0][:160]}", flush=True)

# correctness probe first (tiny)
xt = jnp.arange(1024 * 128, dtype=jnp.float32).reshape(-1)
yt = jnp.ones_like(xt)
got = manual_add(xt, yt, cr=128, depth=3)
import numpy as np
np.testing.assert_allclose(np.asarray(got), np.asarray(xt) + 1.0)
print("correctness ok", flush=True)

for depth in [2, 3, 4]:
    for cr in [2048, 4096, 8192]:
        run(f"manual add d={depth} cr={cr}",
            functools.partial(manual_add, cr=cr, depth=depth))
