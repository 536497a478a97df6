"""b05 low-order (nq=2,4) honest epb sweep."""
import sys, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
from tpu_bench.core.config import Config
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.benchmarks import benchmark05 as b05
from tpu_bench.kernels import bwdtrans3d as pl_bt
from tpu_bench.baselines import bwdtrans3d as xla_bt

cfg = Config(n_tests=16)

def t_of(fn, args):
    run_k = timing.build_chain(eps_chain(fn, eps_arg=1))
    t, w = timing.time_chained(run_k, args, n_tests=16,
                               compiler_options=timing.honest_options())
    return t

for nq in [4, 2]:
    nelmt = 1048576
    data = b05.prepare(nq, nq, nq, nelmt, cfg)
    nm = (nq - 1) ** 3
    print(f"== nq={nq} nelmt={nelmt} (epb_kron auto={data['epb_kron']}, "
          f"epb_qp auto={data['epb_qp']}) ==", flush=True)
    for epb in [8192, 16384, 32768, 65536]:
        try:
            fn = jax.jit(functools.partial(pl_bt.kron_coalesced, epb=epb,
                                           interpret=False,
                                           precision=cfg.precision))
            t = t_of(fn, (data["in_coa"], data["c_coa3"]))
            print(f"kron_coa epb={epb:6d}  {1e-9 * nelmt * nm / t:7.2f} GDOF/s",
                  flush=True)
        except Exception as ex:
            print(f"kron_coa epb={epb}: {str(ex).splitlines()[0][:100]}", flush=True)
    for epb in [4096, 8192, 16384, 32768]:
        try:
            fn = jax.jit(functools.partial(pl_bt.qp_shared3d, epb=epb,
                                           interpret=False,
                                           precision=cfg.precision))
            t = t_of(fn, (data["in_pcoa3"], data["b0"], data["c12t"]))
            print(f"qp_shared epb={epb:6d} {1e-9 * nelmt * nm / t:7.2f} GDOF/s",
                  flush=True)
        except Exception as ex:
            print(f"qp_shared epb={epb}: {str(ex).splitlines()[0][:100]}", flush=True)
    fn = functools.partial(xla_bt.gemm_kron, precision=cfg.precision)
    t = t_of(fn, (data["in_coa"], data["c_coa3"]))
    print(f"XLA gemm            {1e-9 * nelmt * nm / t:7.2f} GDOF/s", flush=True)
