"""Stage-2 as one dot_general over the leading dim; vreg accumulators."""
import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bench.core.config import Config
from tpu_bench.core.timing import eps_chain, measure
from tpu_bench.benchmarks import benchmark05 as b05

HIGHEST = jax.lax.Precision.HIGHEST

def _dot(a, b, precision):
    return jnp.dot(a, b, preferred_element_type=a.dtype, precision=precision)

def _dg_kernel(nm0, nq0, precision, c12t_ref, b0t_ref, in_ref, out_ref, w_ref):
    for p in range(nm0):
        w_ref[p] = _dot(c12t_ref[:], in_ref[p], precision)
    out_ref[:] = jax.lax.dot_general(
        b0t_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=w_ref.dtype, precision=precision)

def _acc_kernel(nm0, nq0, precision, c12t_ref, b0t_ref, in_ref, out_ref):
    accs = [None] * nq0
    for p in range(nm0):
        tmp = _dot(c12t_ref[:], in_ref[p], precision)
        for i in range(nq0):
            v = tmp * b0t_ref[p, i]
            accs[i] = v if accs[i] is None else accs[i] + v
    for i in range(nq0):
        out_ref[i] = accs[i]

def build(kernel, nsc, in_pcoa3, b, c12t, epb, interpret):
    nm0, nrq, e = in_pcoa3.shape
    nq0 = 8
    nkj = c12t.shape[0]
    sc = [pltpu.VMEM((nm0, nkj, epb), in_pcoa3.dtype)] if nsc else []
    smem = pltpu.SMEM if kernel is _acc_kernel else pltpu.VMEM
    bspec = (pl.BlockSpec(memory_space=pltpu.SMEM) if kernel is _acc_kernel
             else pl.BlockSpec((nq0, nm0), lambda i: (0, 0), memory_space=pltpu.VMEM))
    def fn(in_pcoa3, b, c12t):
        return pl.pallas_call(
            functools.partial(kernel, nm0, nq0, HIGHEST),
            grid=(e // epb,),
            in_specs=[
                pl.BlockSpec((nkj, nrq), lambda i: (0, 0), memory_space=pltpu.VMEM),
                bspec,
                pl.BlockSpec((nm0, nrq, epb), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nq0, nkj, epb), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nq0, nkj, e), in_pcoa3.dtype),
            scratch_shapes=sc,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        )(c12t, b, in_pcoa3)
    return jax.jit(fn)

def main():
    nelmt = 131072
    cfg = Config(n_tests=16)
    data = b05.prepare(8, 8, 8, nelmt, cfg)
    in_pcoa3 = jnp.asarray(data["in_coa3"].transpose(1, 0, 2))
    jax.block_until_ready(in_pcoa3)

    for label, kernel, nsc, b in [
        ("dot_general", _dg_kernel, 1, data["b0t"]),
        ("vreg-acc", _acc_kernel, 0, data["b0"]),
    ]:
        for epb in [512, 1024]:
            try:
                fn = build(kernel, nsc, in_pcoa3, b, data["c12t"], epb, cfg.interpret)
                args = (in_pcoa3, b, data["c12t"])
                out = fn(*args)
                t = measure(fn, args, cfg, chain_fn=eps_chain(fn, eps_arg=1))
                gd = 1e-9 * nelmt * 343 / t
                print(f"{label} epb={epb}: {gd:8.2f} GDOF/s norm={float(jnp.linalg.norm(out)):.7e}")
            except Exception as ex:
                print(f"{label} epb={epb}: FAIL {str(ex)[:150]}")

main()
