"""x64-free Ozaki route probe (VERDICT r4 next #2).

The round-4 experiment (exp_f64ozaki.py) showed this toolchain's remote
compile helper rejects EVERY Pallas program compiled under jax_enable_x64
— even the bf16-only slice GEMM.  This probe keeps x64 off for the whole
process: operands are split host-side in NumPy f64 (ozaki.split_f64_np),
the slice GEMMs run as a plain f32/bf16 Pallas program
(ozaki.kron_ozaki_pair), the validation norm uses the df2 f32 tree
(ozaki.pair_norm), and the reference value is NumPy f64 on the host.

Measures GDOF/s through the production chained timer and rel-err against
NumPy f64 for the b04 nq=8 (K=49) and b05 nq=8 (K=343) contractions.

Usage: python docs/experiments/exp_ozaki_xfree.py [nelmt]
"""
import os as _os
import sys

sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bench.core.config import Config
from tpu_bench.core import timing
from tpu_bench.core.timing import eps_chain
from tpu_bench.kernels import ozaki
from tpu_bench.utils import native

assert not jax.config.jax_enable_x64, "probe must run with x64 OFF"

nelmt = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
cfg = Config(n_tests=8)

for dims, nq in ((2, 8), (3, 8), (3, 10)):
    nm = nq - 1
    nm_tot, nq_tot = nm ** dims, nq ** dims
    # operator: kron of the cos bases, f64 on host
    b = native.init_cos(nm * nq).reshape(nm, nq)
    c = b
    for _ in range(dims - 1):
        c = np.kron(b, c)                    # (nmTot, nqTot) f64
    elem = native.init_sin1(nm_tot)          # (nmTot,) f64
    ref = c.T @ elem                         # (nqTot,) f64 per element
    ref_norm = float(np.sqrt((ref * ref).sum() * nelmt))

    w, t = ozaki.slice_params(nm_tot)
    c_sl, s_c = ozaki.split_f64_np(c.T, w, t)    # (T, nqTot, nmTot)
    x_sl, s_x = ozaki.split_f64_np(elem, w, t)   # (T, nmTot)
    c_slices = jnp.asarray(c_sl).astype(jnp.bfloat16)
    in_slices = jnp.asarray(
        np.broadcast_to(x_sl[:, :, None], (t, nm_tot, nelmt)).copy()
    ).astype(jnp.bfloat16)
    scale = s_c * s_x

    gemms = sum(min(t, u + 1) - max(0, u + 1 - t) for u in range(t))
    print(f"--- {dims}D nq={nq} nelmt={nelmt} K={nm_tot} w={w} T={t} "
          f"gemms={gemms} ref norm {ref_norm:.6f}", flush=True)
    dof = 1e-9 * nelmt * nm_tot
    import functools
    kerns = [("P pair", ozaki.kron_ozaki_pair),
             ("B band", ozaki.kron_ozaki_band)]
    for epb in (256, 512, 1024, 2048):
        if nelmt % epb:
            continue
        for name, kern in kerns:
            fn = jax.jit(functools.partial(kern, epb=epb,
                                           interpret=cfg.interpret))
            try:
                tsec, _ = timing.measure(fn, (in_slices, c_slices), cfg,
                                         chain_fn=eps_chain(fn, eps_arg=1),
                                         with_witness=True)
            except Exception as ex:
                print(f"{name} epb={epb:5d}  FAIL(chain) "
                      f"{str(ex).splitlines()[0][:110]}", flush=True)
                continue
            try:
                norm = ozaki.pair_norm_apply(fn, (in_slices, c_slices),
                                             cfg, scale)
                err = abs(norm - ref_norm) / ref_norm
                print(f"{name} epb={epb:5d}  {dof / tsec:9.3f} "
                      f"GDOF/s  rel-err {err:.2e}", flush=True)
            except Exception as ex:
                print(f"{name} epb={epb:5d}  t={tsec:.2e}s FAIL(norm) "
                      f"{str(ex).splitlines()[0][:110]}", flush=True)
