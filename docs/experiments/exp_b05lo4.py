"""Time the bf16x3 kron at nq=2,4."""
import sys, functools
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
import numpy as np
from tpu_bench.core.config import Config
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.benchmarks import benchmark05 as b05
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__)))
from exp_b05lo3 import kron_b3

cfg = Config(n_tests=16)

def t_of(fn, args):
    run_k = timing.build_chain(eps_chain(fn, eps_arg=1))
    t, w = timing.time_chained(run_k, args, n_tests=16,
                               compiler_options=timing.honest_options())
    return t

nelmt = 1048576
for nq in [4, 2]:
    data = b05.prepare(nq, nq, nq, nelmt, cfg)
    nm = (nq - 1) ** 3
    args = (data["in_coa"], data["c_coa3"])
    for epb in [8192, 16384, 32768]:
        fn = jax.jit(functools.partial(kron_b3, epb=epb))
        t = t_of(fn, args)
        print(f"nq{nq} kron_b3 epb={epb:6d}  {1e-9 * nelmt * nm / t:7.2f} GDOF/s",
              flush=True)
