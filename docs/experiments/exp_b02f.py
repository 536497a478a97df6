"""b02 probe 2: directional ceilings + dual-queue manual pipelines."""
import sys, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_bench.core import timing

N = 128 * 2**20
BYTES = 4 * N


def chain_time(fn, *args, donate0=True):
    @jax.jit
    def run_k(k, *a):
        out = jax.lax.fori_loop(0, k, lambda i, xx: fn(xx, *a[1:]), a[0])
        return jnp.sum(out.astype(jnp.float32))
    t, _ = timing.time_chained(run_k, args, n_tests=12,
                               compiler_options=timing.honest_options(None))
    return t


def report(name, t, nbytes):
    print(f"{name:28s}: {nbytes*1e-9/t:8.1f} GB/s real   t={t*1e3:.2f} ms")


# write-only: broadcast a scalar derived from a tiny carried array
def fill_kernel(s_ref, o_ref):
    o_ref[:] = jnp.full_like(o_ref, s_ref[0, 0])


def pallas_fill(seed, *, br=8192, rows=N // 128):
    spec = pl.BlockSpec((br, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        fill_kernel, grid=(rows // br,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
    )(seed)


# read-only: sum
def sum_f(x):
    return jnp.sum(x.reshape(-1, 128), dtype=jnp.float32)


# dual-queue manual add: two independent slot rings over interleaved halves
def manual_add2q(x, y, *, cr, depth):
    x2 = x.reshape(-1, 128); y2 = y.reshape(-1, 128)
    rows = x2.shape[0]
    half = rows // 2
    nchunks = half // cr

    def kernel(x_hbm, y_hbm, o_hbm):
        def body(xs0, ys0, xs1, ys1, sx0, sy0, sw0, sx1, sy1, sw1):
            def mk(base, xs, ys, sx, sy, sw):
                def rdx(slot, j):
                    return pltpu.make_async_copy(
                        x_hbm.at[pl.ds(base + j * cr, cr), :], xs.at[slot],
                        sx.at[slot])
                def rdy(slot, j):
                    return pltpu.make_async_copy(
                        y_hbm.at[pl.ds(base + j * cr, cr), :], ys.at[slot],
                        sy.at[slot])
                def wr(slot, j):
                    return pltpu.make_async_copy(
                        xs.at[slot], o_hbm.at[pl.ds(base + j * cr, cr), :],
                        sw.at[slot])
                return rdx, rdy, wr
            q0 = mk(0, xs0, ys0, sx0, sy0, sw0)
            q1 = mk(half, xs1, ys1, sx1, sy1, sw1)
            for j in range(min(depth, nchunks)):
                q0[0](j, j).start(); q1[0](j, j).start()
                q0[1](j, j).start(); q1[1](j, j).start()
            def loop(j, _):
                slot = j % depth
                for (rdx, rdy, wr), xs, ys in ((q0, xs0, ys0), (q1, xs1, ys1)):
                    rdx(slot, j).wait(); rdy(slot, j).wait()
                    xs[slot] = xs[slot] + ys[slot]
                    wr(slot, j).start()
                    @pl.when(j + depth < nchunks)
                    def _():
                        wr(slot, j).wait()
                        rdx(slot, j + depth).start()
                        rdy(slot, j + depth).start()
                return _
            jax.lax.fori_loop(0, nchunks, loop, None)
            for j in range(max(nchunks - depth, 0), nchunks):
                q0[2](j % depth, j).wait(); q1[2](j % depth, j).wait()
        pl.run_scoped(
            body,
            xs0=pltpu.VMEM((depth, cr, 128), x2.dtype),
            ys0=pltpu.VMEM((depth, cr, 128), x2.dtype),
            xs1=pltpu.VMEM((depth, cr, 128), x2.dtype),
            ys1=pltpu.VMEM((depth, cr, 128), x2.dtype),
            sx0=pltpu.SemaphoreType.DMA((depth,)),
            sy0=pltpu.SemaphoreType.DMA((depth,)),
            sw0=pltpu.SemaphoreType.DMA((depth,)),
            sx1=pltpu.SemaphoreType.DMA((depth,)),
            sy1=pltpu.SemaphoreType.DMA((depth,)),
            sw1=pltpu.SemaphoreType.DMA((depth,)),
        )
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        input_output_aliases={0: 0},
    )(x2, y2).reshape(x.shape)


def main():
    x = jnp.arange(N, dtype=jnp.float32) % 7
    y = jnp.ones((N,), jnp.float32)
    jax.block_until_ready((x, y))

    # read-only ceiling (chain carries the scalar; reread x every iter)
    @jax.jit
    def run_sum(k, xx):
        def body(i, s):
            return s * 0.0 + sum_f(xx + s * 0.0)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
    t, _ = timing.time_chained(run_sum, (x,), n_tests=12,
                               compiler_options=timing.honest_options(None))
    report("read-only sum (1R)", t, BYTES)

    # write-only ceiling: carry a tiny seed, write N
    @jax.jit
    def run_fill(k, seed):
        def body(i, s):
            out = pallas_fill(s)
            return (out[0, :1] + 1.0).reshape(1, 1)
        last = jax.lax.fori_loop(0, k, body, seed)
        return jnp.sum(last)
    seed = jnp.zeros((1, 1), jnp.float32)
    t, _ = timing.time_chained(run_fill, (seed,), n_tests=12,
                               compiler_options=timing.honest_options(None))
    report("write-only fill (1W)", t, BYTES)

    # XLA copy donated (1R+1W same pages)
    cp = jax.jit(lambda a: a * 1.0, donate_argnums=(0,))
    t = chain_time(cp, x)
    report("xla scale donated (1R+1W)", t, 2 * BYTES)

    for cr, depth in [(8192, 3), (16384, 3)]:
        fn = jax.jit(functools.partial(manual_add2q, cr=cr, depth=depth),
                     donate_argnums=(0,))
        try:
            t = chain_time(fn, x, y)
            print(f"manual2q cr={cr:5d} d={depth}       : "
                  f"{3*BYTES*1e-9/t:8.1f} GB/s (3x)   t={t*1e3:.2f} ms "
                  f"[real {3*BYTES*1e-9/t:.0f}]")
        except Exception as e:
            print(f"manual2q cr={cr} d={depth}: FAIL {type(e).__name__}: "
                  f"{str(e)[:140]}")


if __name__ == "__main__":
    main()
