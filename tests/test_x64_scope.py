"""The x64-free f64 tier end to end (VERDICT r4 next #2).

The pytest suite runs with GLOBAL x64 on (conftest), where
config.x64_scope is a no-op — so this test drives the real CLI in a
subprocess with x64 OFF, the exact configuration the TPU toolchain
requires (its compile helper rejects every Pallas program under
jax_enable_x64; artifacts/wall/f64ozaki.log).  Asserts: the sweep
completes, the Pallas(Coales) column is LIVE (nonzero DOF/s, non-nan
norm), and every variant's norm agrees with the committed reference
log's f64 value."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# benchmark04/nq8x8.log:3 (reference committed f64 norm at nelmt 128)
REF_NORM_NQ8_128 = 29.12205853


@pytest.mark.parametrize("bench,args,labels_mod", [
    ("benchmark04", ["8", "8"], "benchmark04"),
    ("benchmark05", ["4", "4", "4"], "benchmark05"),
])
def test_f64_cli_without_global_x64(bench, args, labels_mod):
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["TPU_BENCH_INTERPRET"] = "1"
    r = subprocess.run(
        [sys.executable, "-m", f"tpu_bench.benchmarks.{bench}", *args,
         "--dtype", "f64", "--max-size", "128", "--ntests", "2",
         "--timing", "dispatch"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.splitlines()
    case = next(l for l in lines if " Case: " in l)
    labels = case.split("Case:")[1].split()
    # the Case tokens split labels on spaces; ours contain none
    norm = next(l for l in lines if " norm: " in l).split()[3:]
    dofs = next(l for l in lines if " DOF/s: " in l).split()[3:]
    col = labels.index("Pallas(Coales)")
    assert norm[col] != "nan", "Ozaki column must be live without x64"
    assert float(dofs[col]) > 0.0
    # all live norms agree to the f64 cross-variant rtol
    live = [float(n) for n in norm if n != "nan"]
    assert len(live) >= 6  # 5 XLA columns + the Ozaki column at minimum
    for n in live[1:]:
        assert n == pytest.approx(live[0], rel=1e-9)
    if bench == "benchmark04":
        assert live[0] == pytest.approx(REF_NORM_NQ8_128, rel=1e-9)
