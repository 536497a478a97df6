"""f64 parity: the committed f64 artifact logs must reproduce the
reference's committed f64 norms (VERDICT r1 #5).

The reference instantiates double only (benchmark01/benchmark01.cc:345);
its committed logs are the parity oracle.  Expected values below are
transcribed from /root/reference/benchmark0N logs (setprecision(10)).
Skipped until the f64 artifact set has been generated on the TPU.
"""

import math
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")

# (artifact log, {size: reference norm}, source line)
CASES = [
    ("artifacts/f64/b01/outfile.log",
     {1024: 231.3925755, 536870912: 177955.207},
     "benchmark01/outfile.log"),
    ("artifacts/f64/b02/outfile.log",
     {1024: 5979.883197, 268435456: 3993756.506},
     "benchmark02/outfile.log"),
    ("artifacts/f64/b03/outfile.log",
     {16384: 1546429.037},
     "benchmark03/outfile.log"),
    ("artifacts/f64/b04/nq8x8.log",
     {128: 29.12205853},
     "benchmark04/nq8x8.log"),
    ("artifacts/f64/b05/nq8x8x8.log",
     {128: 189.3141665},
     "benchmark05/nq8x8x8.log"),
    # round-5 f64 order extension (VERDICT r4 next #3); norms transcribed
    # from the reference's committed per-order logs at nelmt 128 (the b05
    # Coales columns there carry the reference's own FP-accumulation
    # drift, e.g. nq4x4x4.log 74.40 vs 77.92 — majority value used)
    ("artifacts/f64/b04/nq2x2.log", {128: 12.29934445},
     "benchmark04/nq2x2.log"),
    ("artifacts/f64/b04/nq4x4.log", {128: 22.74297455},
     "benchmark04/nq4x4.log"),
    ("artifacts/f64/b04/nq6x6.log", {128: 50.7170893},
     "benchmark04/nq6x6.log"),
    ("artifacts/f64/b04/nq10x10.log", {128: 154.3352072},
     "benchmark04/nq10x10.log"),
    ("artifacts/f64/b04/nq12x12.log", {128: 159.5611325},
     "benchmark04/nq12x12.log"),
    ("artifacts/f64/b04/nq14x14.log", {128: 25.77250073},
     "benchmark04/nq14x14.log"),
    ("artifacts/f64/b04/nq16x16.log", {128: 88.15317209},
     "benchmark04/nq16x16.log"),
    ("artifacts/f64/b04/nq32x32.log", {128: 455.3487219},
     "benchmark04/nq32x32.log"),
    ("artifacts/f64/b05/nq2x2x2.log", {128: 13.97979752},
     "benchmark05/nq2x2x2.log"),
    ("artifacts/f64/b05/nq4x4x4.log", {128: 77.91803049},
     "benchmark05/nq4x4x4.log"),
    ("artifacts/f64/b05/nq6x6x6.log", {128: 408.4486145},
     "benchmark05/nq6x6x6.log"),
    ("artifacts/f64/b05/nq10x10x10.log", {128: 363.2723759},
     "benchmark05/nq10x10x10.log"),
]


def parse_norms(path):
    rows = {}
    with open(path) as f:
        for line in f:
            tok = line.split()
            if len(tok) >= 3 and tok[2] == "norm:":
                rows[int(tok[1])] = [float(v) for v in tok[3:]]
    return rows


@pytest.mark.parametrize("log,expect,src", CASES,
                         ids=[c[2].replace("/", "-") for c in CASES])
def test_f64_norms_match_reference(log, expect, src):
    path = os.path.join(ROOT, log)
    if not os.path.exists(path):
        pytest.skip(f"f64 artifact {log} not generated yet")
    rows = parse_norms(path)
    for size, want in expect.items():
        if size not in rows:
            pytest.skip(f"{log} has no row for size {size} (memory cap)")
        finite = [n for n in rows[size] if not math.isnan(n)]
        assert finite, f"{log} size {size}: no variant produced a norm"
        for n in finite:
            # reference prints %.10g; f64 paths must agree to ~9 digits
            assert n == pytest.approx(want, rel=5e-9), (
                f"{log} size {size}: {n} vs reference {src} {want}")
