"""Triage the manual-kron Mosaic crash: isolate VMEM-input-spec vs MXU dot."""
import sys, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NM, NQT, CE, DEPTH, NBLK = 27, 64, 4096, 3, 16
HIGHEST = jax.lax.Precision.HIGHEST


def build(mode):
    def kernel(c_ref, x_hbm, o_hbm):
        def body(xs, os, cs, sx, sw, sc):
            if mode in ("dma_c_dot", "dma_c_nodot"):
                cc = pltpu.make_async_copy(c_ref, cs, sc)
                cc.start(); cc.wait()
            def rd(slot, j):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(j * NM, NM), :], xs.at[slot], sx.at[slot])
            def wr(slot, j):
                return pltpu.make_async_copy(
                    os.at[slot], o_hbm.at[pl.ds(j * NQT, NQT), :],
                    sw.at[slot])
            for j in range(min(DEPTH, NBLK)):
                rd(j, j).start()
            def loop(j, _):
                slot = j % DEPTH
                rd(slot, j).wait()
                @pl.when(j >= DEPTH)
                def _():
                    wr(slot, j - DEPTH).wait()
                if mode == "nodot":
                    os[slot] = jnp.concatenate(
                        [xs[slot], xs[slot], xs[slot][:10]], axis=0)
                elif mode == "vmem_c_dot":
                    os[slot] = jnp.dot(c_ref[:], xs[slot],
                                       preferred_element_type=jnp.float32,
                                       precision=HIGHEST)
                elif mode == "dma_c_dot":
                    os[slot] = jnp.dot(cs[:], xs[slot],
                                       preferred_element_type=jnp.float32,
                                       precision=HIGHEST)
                elif mode == "dma_c_nodot":
                    os[slot] = jnp.concatenate(
                        [xs[slot], xs[slot], xs[slot][:10]], axis=0)
                wr(slot, j).start()
                @pl.when(j + DEPTH < NBLK)
                def _():
                    rd(slot, j + DEPTH).start()
                return _
            jax.lax.fori_loop(0, NBLK, loop, None)
            for j in range(max(NBLK - DEPTH, 0), NBLK):
                wr(j % DEPTH, j).wait()
        pl.run_scoped(
            body,
            xs=pltpu.VMEM((DEPTH, NM, CE), jnp.float32),
            os=pltpu.VMEM((DEPTH, NQT, CE), jnp.float32),
            cs=pltpu.VMEM((NQT, NM), jnp.float32),
            sx=pltpu.SemaphoreType.DMA((DEPTH,)),
            sw=pltpu.SemaphoreType.DMA((DEPTH,)),
            sc=pltpu.SemaphoreType.DMA,
        )
    c_space = pltpu.VMEM if mode == "vmem_c_dot" else pl.ANY
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=c_space),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NBLK * NQT, CE), jnp.float32),
    )


def main():
    c = jnp.ones((NQT, NM), jnp.float32)
    x = jnp.ones((NBLK * NM, CE), jnp.float32)
    for mode in ("nodot", "vmem_c_dot", "dma_c_dot", "dma_c_nodot"):
        try:
            out = jax.jit(build(mode))(c, x)
            jax.block_until_ready(out)
            print(f"{mode:12s}: OK  out[0,0]={float(out[0,0])}")
        except Exception as ex:
            msg = str(ex).replace("\n", " ")[:200]
            print(f"{mode:12s}: FAIL {type(ex).__name__}: {msg}")


if __name__ == "__main__":
    main()
