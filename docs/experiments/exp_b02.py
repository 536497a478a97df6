"""b02 STREAM-add geometry sweep under honest chained timing."""
import sys, time, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_bench.kernels import common
from tpu_bench.core import timing

N = 64 * 2**20  # 256 MB per buffer

def add_rows(x, y, br):
    x2 = x.reshape(-1, 128); y2 = y.reshape(-1, 128)
    rows = x2.shape[0]
    spec = pl.BlockSpec((br, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        lambda xr, yr, orf: orf.__setitem__(slice(None), xr[:] + yr[:]),
        grid=(rows // br,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        input_output_aliases={0: 0},
        **common.grid_semantics("parallel"))(x2, y2)
    return out.reshape(x.shape)

def copy_rows(y, br):
    y2 = y.reshape(-1, 128)
    rows = y2.shape[0]
    spec = pl.BlockSpec((br, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        lambda yr, orf: orf.__setitem__(slice(None), yr[:]),
        grid=(rows // br,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(y2.shape, y2.dtype),
        **common.grid_semantics("parallel"))(y2)
    return out.reshape(y.shape)

def bench(fn, nargs, traffic_bytes, label):
    x = jnp.ones((N,), jnp.float32)
    y = jnp.full((N,), 1e-9, jnp.float32)
    args = (x, y)[:nargs]
    @jax.jit
    def run_k(k, *a):
        def body(i, carry):
            return fn(*((carry,) + a[1:])) if nargs == 2 else fn(a[0] + 0.0 * carry.ravel()[0])
        # carry the mutating operand (x) for add; for copy carry output
        out = jax.lax.fori_loop(0, k, body, a[0])
        return jnp.sum(out[:128])
    try:
        t = timing.time_chained(run_k, args, n_tests=16,
                                compiler_options=timing.honest_options())
        print(f"{label:28s} {traffic_bytes * 1e-9 / t:8.1f} GB/s", flush=True)
    except Exception as ex:
        print(f"{label:28s} FAILED: {str(ex).splitlines()[0][:120]}", flush=True)

for br in [2048, 4096, 8192, 16384, 32768]:
    bench(functools.partial(add_rows, br=br), 2, 3 * 4 * N, f"add br={br}")
for br in [4096, 8192, 16384, 32768, 65536]:
    bench(functools.partial(copy_rows, br=br), 1, 2 * 4 * N, f"copy br={br} (1R1W)")
# jnp baselines
bench(lambda x, y: x + y, 2, 3 * 4 * N, "jnp add")
