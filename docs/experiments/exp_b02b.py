"""In-place vs out-of-place add; proper copy ceiling."""
import sys, time, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_bench.kernels import common
from tpu_bench.core import timing

N = 64 * 2**20

def make_add(br, alias):
    def f(x, y):
        x2 = x.reshape(-1, 128); y2 = y.reshape(-1, 128)
        rows = x2.shape[0]
        spec = pl.BlockSpec((br, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        kw = dict(input_output_aliases={0: 0}) if alias else {}
        out = pl.pallas_call(
            lambda xr, yr, orf: orf.__setitem__(slice(None), xr[:] + yr[:]),
            grid=(rows // br,), in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            **kw, **common.grid_semantics("parallel"))(x2, y2)
        return out.reshape(x.shape)
    return f

def make_copy(br):
    def f(x):
        x2 = x.reshape(-1, 128)
        rows = x2.shape[0]
        spec = pl.BlockSpec((br, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            lambda xr, orf: orf.__setitem__(slice(None), xr[:]),
            grid=(rows // br,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            **common.grid_semantics("parallel"))(x2)
        return out.reshape(x.shape)
    return f

def run(label, fn, nargs, traffic):
    x = jnp.ones((N,), jnp.float32)
    y = jnp.full((N,), 1e-9, jnp.float32)
    @jax.jit
    def run_k(k, *a):
        body = (lambda i, c: fn(c, a[1])) if nargs == 2 else (lambda i, c: fn(c))
        out = jax.lax.fori_loop(0, k, body, a[0])
        return jnp.sum(out[:128])
    try:
        t, _ = timing.time_chained(run_k, (x, y)[:nargs], n_tests=16,
                                compiler_options=timing.honest_options())
        print(f"{label:32s} {traffic * 1e-9 / t:8.1f} GB/s", flush=True)
    except Exception as ex:
        print(f"{label:32s} FAILED: {str(ex).splitlines()[0][:120]}", flush=True)

for br in [4096, 8192]:
    run(f"add inplace br={br}", make_add(br, True), 2, 3 * 4 * N)
    run(f"add outofplace br={br}", make_add(br, False), 2, 3 * 4 * N)
run("copy br=8192 (1R1W)", make_copy(8192), 1, 2 * 4 * N)
run("copy br=16384 (1R1W)", make_copy(16384), 1, 2 * 4 * N)
run("jnp add outofplace", jax.jit(lambda x, y: x + y), 2, 3 * 4 * N)
