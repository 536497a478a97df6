"""Timing harness.

Reference protocol (utils/timer.h:3-45 + benchmark01/benchmark01.cc:197-209):
wall-clock around each dispatch, device synced before stop(), 40 repetitions,
minimum kept.  We support that faithfully ("dispatch" mode) and add a
"chained" mode that is required for honest numbers on remote-attached TPUs:

The control link to the TPU can have a large fixed sync latency (measured
~25 ms through the axon relay in this environment) that buries kernel time
for any per-dispatch measurement.  Chained mode times ONE dispatch of k
data-dependent applications of the kernel — chained through
jax.lax.optimization_barrier so XLA cannot CSE/hoist the repeated work — and
forces true completion by pulling a scalar probe of the final output to the
host (a value the device must actually produce).  Two chain lengths are
measured and differenced, so every fixed cost (dispatch, sync round-trip,
probe transfer) cancels:

    t_kernel = (T(k_hi) - T(k_lo)) / (k_hi - k_lo)

Both modes keep the reference's min-of-N reduction.  Mode "auto" (default)
picks chained when the measured sync latency exceeds 1 ms.

HBM-honest chained timing.  A chained loop gives XLA's memory-space
assignment (MSA) pass the chance to keep small loop-carried/invariant
buffers resident in VMEM across iterations, so sub-VMEM working sets report
on-chip bandwidth (measured up to 8.8 TB/s vs the 819 GB/s v5e HBM peak) —
physically real, but not the reference's semantics of one dispatch's full
HBM traffic per repetition (benchmark01/benchmark01.cc:243-254).  MSA's
"alternate memory" pool is the chip VMEM minus the scoped-vmem window, so
compiling the timing executable with xla_tpu_scoped_vmem_limit_kib = the
full chip VMEM (128 MB on v5e) starves the pool to zero and forces every
iteration to stream operands from HBM (measured: 0.5 MB working set drops
2746 -> 433 GB/s; >=128 MB sizes unchanged).  Kernels are unaffected — the
scoped limit is a ceiling, not a reservation, and their own VMEM blocks
stay far below it.  Controlled by Config.hbm_honest (default True).
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from tpu_bench.utils import native


def _now_ns() -> int:
    return time.perf_counter_ns()


class Timer:
    """Stopwatch with the reference Timer's interface (utils/timer.h:3-45)."""

    def __init__(self):
        self._start = 0
        self._stop = 0
        self._clock = native.monotonic_ns or _now_ns

    def start(self) -> None:
        self._start = self._clock()

    def stop(self) -> None:
        self._stop = self._clock()

    def elapsed_nanoseconds(self) -> int:
        return self._stop - self._start

    def elapsed_seconds(self) -> float:
        return (self._stop - self._start) * 1e-9


# ---------------------------------------------------------------------------
# sync latency probe
# ---------------------------------------------------------------------------

_SYNC_LATENCY: Optional[float] = None


@jax.jit
def _tiny_op(x):
    return x + 1.0


def sync_latency() -> float:
    """Measured host<->device sync round-trip (cached)."""
    global _SYNC_LATENCY
    if _SYNC_LATENCY is None:
        x = jnp.zeros((), jnp.float32)
        float(_tiny_op(x))  # compile
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(_tiny_op(x))
            best = min(best, time.perf_counter() - t0)
        _SYNC_LATENCY = best
    return _SYNC_LATENCY


# ---------------------------------------------------------------------------
# dispatch mode (reference-faithful)
# ---------------------------------------------------------------------------


def time_variant(
    step: Callable[[], object],
    n_tests: int = 40,
    warmup: Optional[Callable[[], object]] = None,
) -> float:
    """Minimum wall-clock seconds over n_tests dispatches (dispatch mode).

    `step` must issue the computation AND block until the device is done.
    `warmup`, when given, is run once untimed to populate the jit cache.
    """
    if warmup is not None:
        out = warmup()
        jax.block_until_ready(out)
    timer = Timer()
    best = float("inf")
    for _ in range(n_tests):
        timer.start()
        out = step()
        jax.block_until_ready(out)
        timer.stop()
        best = min(best, timer.elapsed_seconds())
    return best


# ---------------------------------------------------------------------------
# chained mode
# ---------------------------------------------------------------------------

# Chip VMEM in KiB by device kind; setting the scoped-vmem window to the full
# chip VMEM leaves MSA's alternate-memory pool empty (see module docstring).
_VMEM_KIB = {"TPU v5 lite": 131072, "TPU v4": 131072, "TPU v5": 131072}
_VMEM_KIB_DEFAULT = 131072


def honest_options(cfg=None) -> Optional[dict]:
    """Compiler options that force HBM traffic per chain iteration, or None
    off-TPU / when cfg.hbm_honest is False.  Env TPU_BENCH_SCOPED_VMEM_KIB
    overrides the per-chip value (e.g. for a future chip with more VMEM)."""
    import os

    if cfg is not None and not getattr(cfg, "hbm_honest", True):
        return None
    if jax.default_backend() != "tpu":
        return None
    env = os.environ.get("TPU_BENCH_SCOPED_VMEM_KIB")
    if env is not None:
        kib = int(env)
    else:
        try:
            kind = jax.devices()[0].device_kind
        except Exception:
            kind = ""
        kib = next((v for k, v in _VMEM_KIB.items() if kind.startswith(k)),
                   _VMEM_KIB_DEFAULT)
    return {"xla_tpu_scoped_vmem_limit_kib": kib}


def call_full_window(fn, args, cfg):
    """Apply fn(*args) compiled at the SAME full-chip scoped-vmem window
    as the chained timing executable (honest_options).  A bare jit call
    compiles at the default 16 MB window and rejects exactly the larger
    Pallas blocks the chain just timed (measured: the 3D Ozaki epb=512
    program needs an 18.8 MB kernel stack) — every untimed validation
    application of a Pallas-backed variant must come through here."""
    g = jax.jit(fn)
    opts = honest_options(cfg)
    if opts:
        return g.lower(*args).compile(compiler_options=opts)(*args)
    return g(*args)


def _default_probe(out):
    """Cheapest true-completion witness: one element of the output."""
    if isinstance(out, (tuple, list)):
        out = out[0]
    return out.ravel()[0].astype(jnp.float32)


def _witness_sumsq(out):
    """Completion witness = chunked sum of squares of the final output.

    Serves two purposes: every output element is live (XLA cannot shrink
    the carried array), and — because the eps perturbation is exactly 0.0 —
    the final chain output equals one plain application of the kernel, so
    sqrt(witness) IS the validation norm.  Deriving the norm here saves a
    second compile of the bare kernel per (variant, size) on the remote-
    compile TPU link, where compiles dominate sweep wall-clock.  Chunked
    accumulation mirrors validate._norm_sq_f32 so printed norms agree with
    the CPU path."""
    if isinstance(out, (tuple, list)):
        out = out[0]
    x = out.ravel()
    acc = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    n = x.shape[0]
    chunk = 1 << 16
    if n > chunk and n % chunk == 0:
        partial = jnp.sum((x * x).reshape(n // chunk, chunk), axis=-1,
                          dtype=acc)
        return jnp.sum(partial, dtype=acc)
    return jnp.sum(x.astype(acc) * x.astype(acc), dtype=acc)


def build_chain(chain_fn: Callable, probe: Callable = _default_probe,
                carry: str = "array") -> Callable:
    """Return run_k(k, *args) -> f32 scalar: k serialized applications of
    chain_fn(p, *args), where p is the f32 probe of the previous output.

    chain_fn must fold p into its computation at negligible cost, e.g. by
    perturbing a small operand with eps = 0.0 * p.  This creates a true data
    dependence XLA cannot hoist or CSE (an optimization_barrier on the large
    operand does NOT work: XLA splits tuple barriers element-wise and then
    hoists the loop-invariant computation).

    Two further anti-elision measures, both load-bearing:
      * the loop CARRIES the full output array (not just the probe scalar) —
        a scalar carry lets XLA slice-propagate the probe through the body
        and shrink every iteration to a single output element;
      * the returned completion witness is sumsq(out_final), so every
        element of the carried array is live (one extra read, amortized
        over k) — and doubles as the validation norm (see _witness_sumsq).

    carry="scalar" carries only the probe through the loop and applies the
    final iteration outside it (witness/norm semantics unchanged).  This is
    ONLY sound when the variant's output is produced by a pallas_call: the
    kernel is opaque to XLA, so slice propagation cannot narrow it, and the
    sequential probe dependence still serializes iterations.  The payoff is
    buffer reuse — one output buffer alive instead of two loop-carried
    copies — which is what lets the global-workspace Pallas variants fit
    the nelmt=1,048,576 rows of the heaviest nq sweeps in 16 GB.

    k is a traced value, so one compilation covers every chain length.
    """
    if carry == "scalar":

        @jax.jit
        def run_k_scalar(k, *args):
            def body(_, p):
                return probe(chain_fn(p, *args)).astype(jnp.float32)

            p = jax.lax.fori_loop(0, k - 1, body, jnp.float32(0.0))
            return _witness_sumsq(chain_fn(p, *args))

        return run_k_scalar

    @jax.jit
    def run_k(k, *args):
        out0 = chain_fn(jnp.float32(0.0), *args)

        def body(_, out_prev):
            p = probe(out_prev)
            return chain_fn(p, *args)

        out = jax.lax.fori_loop(1, k, body, out0)
        return _witness_sumsq(out)

    return run_k


def eps_chain(fn: Callable, eps_arg: int = 0) -> Callable:
    """Make a chain_fn that perturbs args[eps_arg] by 0.0*p before calling fn.

    Use on a SMALL operand (a vector, a basis matrix) so the perturbation's
    materialization cost is negligible next to the streamed traffic.  A
    tuple operand (the df2 (hi, lo) pairs of the f64 tier) is perturbed in
    its first leaf only — sufficient for the data dependence."""

    def chain_fn(p, *args):
        args = list(args)
        a = args[eps_arg]
        if isinstance(a, (tuple, list)):
            eps = (jnp.float32(0.0) * p).astype(a[0].dtype)
            args[eps_arg] = (a[0] + eps,) + tuple(a[1:])
        else:
            args[eps_arg] = a + (jnp.float32(0.0) * p).astype(a.dtype)
        return fn(*args)

    return chain_fn


def time_chained(
    run_k: Callable,
    args: Sequence,
    n_tests: int = 40,
    compiler_options: Optional[dict] = None,
) -> float:
    """Seconds per kernel application via two-point chain differencing.

    The chain length escalates until the timing window (T(k_hi) - T(k_lo))
    comfortably exceeds the sync-latency noise floor, so tiny kernels (ns-µs)
    are resolved even over a ~25 ms control link.

    compiler_options (normally honest_options(cfg)) are applied to the
    timing executable's compile — the HBM-honesty mechanism (module
    docstring).  run_k must then be a jax.jit-wrapped callable.

    Returns (seconds, witness): witness is the float value of run_k's
    completion scalar (sumsq of the final output for build_chain chains)."""
    if compiler_options:
        run_k = run_k.lower(jnp.int32(1), *args).compile(
            compiler_options=compiler_options)
    witness = float(run_k(jnp.int32(1), *args))  # compile + warm
    lat = sync_latency()
    # The window must DWARF the link latency (3x, not a fraction of it):
    # the differenced minima each carry the latency jitter of their own
    # best rep, so a ~0.3*lat window leaves up to ~10% error that
    # min-of-reps turns into systematic inflation (observed: a 268 MB 1R
    # sweep row reading 890 GB/s against the chip's 805 measured read
    # ceiling).  With diff > 3*lat residual jitter bounds the error at the
    # low single-digit percent level.
    target = max(8e-3, 3.0 * lat)

    def timed(k):
        kk = jnp.int32(k)
        t0 = time.perf_counter()
        float(run_k(kk, *args))
        return time.perf_counter() - t0

    # scout the chain length with single runs (cheap: ~1.3x the final t_hi
    # in total), then min-of-reps only at the chosen level
    k_hi = 64
    while True:
        k_lo = max(1, k_hi // 8)
        t_hi = timed(k_hi)
        if (t_hi - timed(k_lo)) > target or t_hi > 2.0 or k_hi >= (1 << 20):
            break
        k_hi *= 8

    # long chains need fewer reps — the window already dwarfs jitter, so
    # min() is outlier rejection, not noise averaging
    reps = max(4, min(10, n_tests // 4))
    if t_hi > 0.5:
        reps = max(3, reps // 2)
    best_lo = min(timed(k_lo) for _ in range(reps))
    best_hi = min(timed(k_hi) for _ in range(reps))
    return _per_from_window(best_hi, best_lo, k_hi, k_lo), witness


def _per_from_window(best_hi: float, best_lo: float, k_hi: int,
                     k_lo: int) -> float:
    """Per-application seconds from the two-point window.

    A non-positive difference means link noise exceeded the window (observed
    once on the remote link: a committed b02 row read 98 PB/s because the
    old code clamped to 1e-12 s).  Never fabricate throughput from a broken
    window — fall back to the whole-chain bound best_hi/k_hi, which still
    contains the fixed dispatch/sync cost and therefore UNDER-states
    throughput (honest direction)."""
    per = (best_hi - best_lo) / (k_hi - k_lo)
    if per <= 0.0:
        return best_hi / k_hi
    return per


def resolve_mode(cfg) -> str:
    mode = getattr(cfg, "timing", "auto")
    if mode == "auto":
        mode = "chained" if sync_latency() > 1e-3 else "dispatch"
    return mode


def measure(
    fn: Callable,
    args: Sequence,
    cfg,
    chain_fn: Optional[Callable] = None,
    probe: Callable = _default_probe,
    step: Optional[Callable[[], object]] = None,
    warmup: Optional[Callable[[], object]] = None,
    with_witness: bool = False,
    carry: str = "array",
) -> float:
    """Time one application of fn(*args) per the configured timing mode.

    chain_fn(p, *args) is the latency-cancelling chained step (see
    build_chain); when omitted, chained mode perturbs args[0] — only correct
    when args[0] is cheap to rematerialize.  carry="scalar" halves output
    residency for pallas_call-backed variants (see build_chain).

    with_witness=True returns (seconds, witness) where witness is the
    chain's completion sumsq (None in dispatch mode — the caller applies
    the kernel itself there, which dispatch mode has already compiled).
    """
    mode = resolve_mode(cfg)
    if mode == "chained":
        run_k = build_chain(chain_fn if chain_fn is not None else eps_chain(fn),
                            probe=probe, carry=carry)
        t, witness = time_chained(run_k, args, n_tests=cfg.n_tests,
                                  compiler_options=honest_options(cfg))
        return (t, witness) if with_witness else t
    if step is None:
        step = lambda: fn(*args)
    t = time_variant(step, n_tests=cfg.n_tests, warmup=warmup or step)
    return (t, None) if with_witness else t
