"""nq2 flat-chunk VPU kron; nq4 manual bf16x3 MXU kron."""
import sys, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_bench.core.config import Config
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.benchmarks import benchmark05 as b05
from tpu_bench.kernels import common

cfg = Config(n_tests=16)

# --- nq2: out[m, :] = c[m, 0] * x, full-tile chunks ---
def _scale_kernel(nq_tot, c_ref, in_ref, out_ref):
    x = in_ref[:]
    for m in range(nq_tot):
        out_ref[m] = c_ref[m, 0] * x

def kron_scale(in_coa, c_coa, *, epb):
    nm_tot, e = in_coa.shape
    assert nm_tot == 1
    nq_tot = c_coa.shape[0]
    rows = e // 128
    br = epb // 128
    in2 = in_coa.reshape(rows, 128)
    out = pl.pallas_call(
        functools.partial(_scale_kernel, nq_tot),
        grid=(rows // br,),
        in_specs=[pl.BlockSpec((nq_tot, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((br, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nq_tot, br, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_tot, rows, 128), in_coa.dtype),
        **common.grid_semantics("parallel"))(c_coa, in2)
    return out.reshape(nq_tot, e)

# --- nq4: manual bf16x3 MXU dot ---
def _kron_b3_kernel(ch_ref, cl_ref, in_ref, out_ref):
    x = in_ref[:]
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[:] = d(ch_ref[:], xh) + d(ch_ref[:], xl) + d(cl_ref[:], xh)

def kron_b3(in_coa, c_coa, *, epb):
    nm_tot, e = in_coa.shape
    nq_tot = c_coa.shape[0]
    ch = c_coa.astype(jnp.bfloat16)
    cl = (c_coa - ch.astype(jnp.float32)).astype(jnp.bfloat16)
    spec_c = pl.BlockSpec((nq_tot, nm_tot), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kron_b3_kernel,
        grid=(e // epb,),
        in_specs=[spec_c, spec_c,
                  pl.BlockSpec((nm_tot, epb), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nq_tot, epb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_tot, e), in_coa.dtype),
        **common.grid_semantics("parallel"))(ch, cl, in_coa)
    return out

def t_of(fn, args, eps_arg=1):
    run_k = timing.build_chain(eps_chain(fn, eps_arg=eps_arg))
    t, w = timing.time_chained(run_k, args, n_tests=16,
                               compiler_options=timing.honest_options())
    return t

# nq2
nelmt = 1048576
data = b05.prepare(2, 2, 2, nelmt, cfg)
args = (data["in_coa"], data["c_coa3"])
want = np.asarray(args[1]) @ np.asarray(args[0][:, :256])
got = np.asarray(jax.jit(functools.partial(kron_scale, epb=256))(
    args[0][:, :256], args[1]))
np.testing.assert_allclose(got, want, rtol=2e-5)
for epb in []:
    fn = jax.jit(functools.partial(kron_scale, epb=epb))
    t = t_of(fn, args)
    print(f"nq2 kron_scale epb={epb:6d}  {1e-9 * nelmt / t:7.2f} GDOF/s",
          flush=True)

# nq4
data = b05.prepare(4, 4, 4, nelmt, cfg)
args = (data["in_coa"], data["c_coa3"])
want = np.asarray(args[1]) @ np.asarray(args[0][:, :256])
got = np.asarray(jax.jit(functools.partial(kron_b3, epb=256))(
    args[0][:, :256], args[1]))
np.testing.assert_allclose(got, want, rtol=5e-4)
print("nq4 b3 correct", flush=True)
for epb in []:
    fn = jax.jit(functools.partial(kron_b3, epb=epb))
    t = t_of(fn, args)
    print(f"nq4 kron_b3 epb={epb:6d}  {1e-9 * nelmt * 27 / t:7.2f} GDOF/s",
          flush=True)
