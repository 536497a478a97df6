"""Bisect the Mosaic ring crash: row count x lane width of the slot ring."""
import os as _os, sys
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEPTH = 3


def build(cr_in, cr_out, lanes, nblk):
    """Identity-ish ring: read (cr_in, lanes), write (cr_out, lanes) chunks
    (broadcast pad if cr_out != cr_in)."""
    def kernel(x_hbm, o_hbm):
        def body(xs, os, sx, sw):
            def rd(slot, j):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(j * cr_in, cr_in), :], xs.at[slot],
                    sx.at[slot])
            def wr(slot, j):
                return pltpu.make_async_copy(
                    os.at[slot], o_hbm.at[pl.ds(j * cr_out, cr_out), :],
                    sw.at[slot])
            for j in range(min(DEPTH, nblk)):
                rd(j, j).start()
            def loop(j, _):
                slot = j % DEPTH
                rd(slot, j).wait()
                @pl.when(j >= DEPTH)
                def _():
                    wr(slot, j - DEPTH).wait()
                os[slot] = jnp.broadcast_to(
                    jnp.sum(xs[slot], axis=0, keepdims=True),
                    (cr_out, lanes))
                wr(slot, j).start()
                @pl.when(j + DEPTH < nblk)
                def _():
                    rd(slot, j + DEPTH).start()
                return _
            jax.lax.fori_loop(0, nblk, loop, None)
            for j in range(max(nblk - DEPTH, 0), nblk):
                wr(j % DEPTH, j).wait()
        pl.run_scoped(
            body,
            xs=pltpu.VMEM((DEPTH, cr_in, lanes), jnp.float32),
            os=pltpu.VMEM((DEPTH, cr_out, lanes), jnp.float32),
            sx=pltpu.SemaphoreType.DMA((DEPTH,)),
            sw=pltpu.SemaphoreType.DMA((DEPTH,)),
        )
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nblk * cr_out, lanes), jnp.float32),
    )


def main():
    cases = [
        ("pow2 rows, 128 lanes", 32, 32, 128, 16),
        ("pow2 rows, 4096 lanes", 32, 32, 4096, 16),
        ("27 rows in, 27 out, 128", 27, 27, 128, 16),
        ("32 in, 64 out, 128", 32, 64, 128, 16),
        ("27 in, 64 out, 128", 27, 64, 128, 16),
        ("27 in, 64 out, 4096", 27, 64, 4096, 16),
    ]
    for name, ci, co, ln, nb in cases:
        x = jnp.ones((nb * ci, ln), jnp.float32)
        try:
            out = jax.jit(build(ci, co, ln, nb))(x)
            jax.block_until_ready(out)
            print(f"{name:28s}: OK")
        except Exception as ex:
            print(f"{name:28s}: FAIL {type(ex).__name__}: "
                  f"{str(ex)[:90]}")


if __name__ == "__main__":
    main()
