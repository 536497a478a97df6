"""DMA ceiling probe for the nq4 stream shape; f64 support probe."""
import sys, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.kernels import common

E = 1048576

def probe27to64(in_coa, c_ref_unused, *, epb):
    """Reads (27, epb), writes (64, epb) with trivial VPU compute."""
    nm, e = in_coa.shape
    def kern(c_ref, in_ref, out_ref):
        x = in_ref[:]
        s = jnp.sum(x, axis=0, keepdims=True) + c_ref[0, 0]
        for m in range(64 // 8):
            out_ref[m * 8:(m + 1) * 8] = jnp.broadcast_to(s, (8, x.shape[1]))
    return pl.pallas_call(
        kern,
        grid=(e // epb,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((nm, epb), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, epb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, e), in_coa.dtype),
        **common.grid_semantics("parallel"))(c_ref_unused, in_coa)

x = jnp.ones((27, E), jnp.float32)
c = jnp.zeros((1, 1), jnp.float32)
for epb in [8192, 16384, 32768]:
    fn = jax.jit(functools.partial(probe27to64, epb=epb))
    run_k = timing.build_chain(eps_chain(fn, eps_arg=1))
    t, w = timing.time_chained(run_k, (x, c), n_tests=16,
                               compiler_options=timing.honest_options())
    gbs = (27 + 64) * 4 * E * 1e-9 / t
    print(f"probe 27R->64W epb={epb:6d}  {gbs:7.1f} GB/s "
          f"({1e-9 * E * 27 / t:6.2f} GDOF/s-equiv)", flush=True)

# f64 probes
import numpy as np
jax.config.update("jax_enable_x64", True)
try:
    a = jnp.ones((512, 512), jnp.float64)
    b = jnp.ones((512,), jnp.float64)
    r = jax.jit(lambda a, b: a @ b)(a, b)
    print("f64 dot OK:", float(r[0]), r.dtype, flush=True)
except Exception as ex:
    print("f64 dot FAILED:", str(ex).splitlines()[0][:120], flush=True)
try:
    r = jax.jit(lambda x: jnp.sum(x * x))(jnp.ones((1 << 20,), jnp.float64))
    print("f64 reduce OK:", float(r), flush=True)
except Exception as ex:
    print("f64 reduce FAILED:", str(ex).splitlines()[0][:120], flush=True)
try:
    e = jnp.einsum("eqp,pi,qj->eji", jnp.ones((128, 7, 7), jnp.float64),
                   jnp.ones((7, 8), jnp.float64), jnp.ones((7, 8), jnp.float64))
    print("f64 einsum OK:", float(e.sum()), flush=True)
except Exception as ex:
    print("f64 einsum FAILED:", str(ex).splitlines()[0][:120], flush=True)
