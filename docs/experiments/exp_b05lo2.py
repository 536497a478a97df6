"""Low-order kron: VPU broadcast formulation + precision ladder."""
import sys, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_bench.core.config import Config
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.benchmarks import benchmark05 as b05
from tpu_bench.kernels import bwdtrans3d as pl_bt, common

cfg = Config(n_tests=16)

def _kron_vpu_kernel(nm_tot, c_ref, in_ref, out_ref):
    acc = c_ref[:, 0:1] * in_ref[0:1, :]
    for k in range(1, nm_tot):
        acc += c_ref[:, k:k + 1] * in_ref[k:k + 1, :]
    out_ref[:] = acc

def kron_vpu(in_coa, c_coa, *, epb):
    nm_tot, e = in_coa.shape
    nq_tot = c_coa.shape[0]
    return pl.pallas_call(
        functools.partial(_kron_vpu_kernel, nm_tot),
        grid=(e // epb,),
        in_specs=[pl.BlockSpec((nq_tot, nm_tot), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((nm_tot, epb), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nq_tot, epb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_tot, e), in_coa.dtype),
        **common.grid_semantics("parallel"))(c_coa, in_coa)

def t_of(fn, args):
    run_k = timing.build_chain(eps_chain(fn, eps_arg=1))
    t, w = timing.time_chained(run_k, args, n_tests=16,
                               compiler_options=timing.honest_options())
    return t

import numpy as np
for nq in [2, 4]:
    nelmt = 1048576
    data = b05.prepare(nq, nq, nq, nelmt, cfg)
    nm = (nq - 1) ** 3
    args = (data["in_coa"], data["c_coa3"])
    # correctness
    small = (np.asarray(args[1]) @ np.asarray(args[0][:, :256]))
    got = np.asarray(jax.jit(functools.partial(kron_vpu, epb=128))(
        args[0][:, :256], args[1]))
    np.testing.assert_allclose(got, small, rtol=2e-5)
    print(f"== nq={nq} vpu-kernel correct ==", flush=True)
    for epb in [8192, 16384, 32768]:
        fn = jax.jit(functools.partial(kron_vpu, epb=epb))
        t = t_of(fn, args)
        print(f"kron_vpu epb={epb:6d}  {1e-9 * nelmt * nm / t:7.2f} GDOF/s",
              flush=True)
    for prec in ["high", "default"]:
        p = {"high": jax.lax.Precision.HIGH,
             "default": jax.lax.Precision.DEFAULT}[prec]
        fn = jax.jit(functools.partial(pl_bt.kron_coalesced, epb=16384,
                                       interpret=False, precision=p))
        t = t_of(fn, args)
        print(f"kron_coa prec={prec:8s} {1e-9 * nelmt * nm / t:7.2f} GDOF/s",
              flush=True)
