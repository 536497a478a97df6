"""b02 round-2 probe: ceilings + candidates at an honest (HBM) size.

Measures, at N elements f32 (all >> VMEM, chained timing):
  read   : sum(x)                      1R          -> read ceiling
  copy   : y -> out (pallas)           1R+1W       -> copy ceiling
  jnp    : donated x+y                 2R+1W
  wide   : pallas (4096,128) blocks    2R+1W
  manual : hand DMA pipeline, cr/depth 2R+1W
All reported as effective GB/s with the b02 3x metric where applicable.
"""
import sys, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_bench.core import timing
from tpu_bench.kernels import axpy as pl_axpy

N = 128 * 2**20  # 512 MB / buffer


def chain_time(fn, *args):
    @jax.jit
    def run_k(k, *a):
        out = jax.lax.fori_loop(
            0, k,
            lambda i, xx: fn(xx, *a[1:]),
            a[0])
        return jnp.sum(out.astype(jnp.float32))
    t, _ = timing.time_chained(run_k, args, n_tests=12,
                               compiler_options=timing.honest_options(None))
    return t


def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def pallas_copy(x, *, br=4096):
    x2 = x.reshape(-1, 128)
    spec = pl.BlockSpec((br, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        copy_kernel, grid=(x2.shape[0] // br,), in_specs=[spec],
        out_specs=spec, out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x2).reshape(x.shape)


def manual_add(x, y, *, cr, depth):
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
                    wr(slot, j).wait()
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
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        input_output_aliases={0: 0},
    )(x2, y2).reshape(x.shape)


def main():
    bytes_ = 4 * N
    x = jnp.arange(N, dtype=jnp.float32) % 7
    y = jnp.ones((N,), jnp.float32)
    jax.block_until_ready((x, y))

    # read ceiling: chained sum can't carry x... use a map: x -> x (sum probe)
    t = chain_time(lambda xx: xx * 1.0000001, x)
    print(f"scale(1R+1W jnp)   : {2*bytes_*1e-9/t:8.1f} GB/s eff(2x)  t={t*1e3:.2f} ms")

    t = chain_time(lambda xx: pallas_copy(xx), x)
    print(f"copy (1R+1W pallas): {2*bytes_*1e-9/t:8.1f} GB/s eff(2x)  t={t*1e3:.2f} ms")

    add_j = jax.jit(lambda a, b: a + b, donate_argnums=(0,))
    t = chain_time(add_j, x, y)
    print(f"jnp add (2R+1W)    : {3*bytes_*1e-9/t:8.1f} GB/s (3x)     t={t*1e3:.2f} ms")

    wide = jax.jit(functools.partial(pl_axpy.add_inplace_wide), donate_argnums=(0,))
    t = chain_time(wide, x, y)
    print(f"pallas wide (2R+1W): {3*bytes_*1e-9/t:8.1f} GB/s (3x)     t={t*1e3:.2f} ms")

    for cr, depth in [(2048, 4), (4096, 4), (8192, 3), (1024, 8), (4096, 6)]:
        fn = jax.jit(functools.partial(manual_add, cr=cr, depth=depth),
                     donate_argnums=(0,))
        try:
            t = chain_time(fn, x, y)
            print(f"manual cr={cr:5d} d={depth}: {3*bytes_*1e-9/t:8.1f} GB/s (3x)     t={t*1e3:.2f} ms")
        except Exception as e:
            print(f"manual cr={cr:5d} d={depth}: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
