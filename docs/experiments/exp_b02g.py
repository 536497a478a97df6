"""b02 final tuning sweep for the manual-DMA add pipeline."""
import sys, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from tpu_bench.core import timing
from scripts.exp_b02e import manual_add, chain_time, N

BYTES = 4 * N


def main():
    x = jnp.arange(N, dtype=jnp.float32) % 7
    y = jnp.ones((N,), jnp.float32)
    jax.block_until_ready((x, y))
    best = (0.0, None)
    for cr, depth in [(16384, 2), (16384, 3), (32768, 2), (32768, 3),
                      (8192, 4), (16384, 4), (65536, 2)]:
        fn = jax.jit(functools.partial(manual_add, cr=cr, depth=depth),
                     donate_argnums=(0,))
        try:
            t = chain_time(fn, x, y)
            g = 3 * BYTES * 1e-9 / t
            print(f"manual cr={cr:6d} d={depth}: {g:8.1f} GB/s (3x)  "
                  f"t={t*1e3:.2f} ms")
            if g > best[0]:
                best = (g, (cr, depth))
        except Exception as e:
            print(f"manual cr={cr:6d} d={depth}: FAIL "
                  f"{type(e).__name__}: {str(e)[:100]}")
    # no-alias variant of the best: write to fresh pages
    print("best:", best)


if __name__ == "__main__":
    main()
