"""Re-measure artifact rows that violate their physical ceiling.

Chain-differenced timing under heavy device sharing (six regeneration
workers multiplexing one chip) occasionally produces an over-estimated
row: the k_lo chain hits congestion the k_hi chain missed, the difference
shrinks, and the implied rate overshoots.  min-of-reps bounds inflation of
each chain time but not of the difference.  This pass finds rows whose
best value exceeds the empirical per-mix honesty cap for the benchmark's
traffic mix (roofline.honesty_cap_* x the committed ceilings artifact —
the same bound CI enforces), re-runs exactly those sweep points SOLO, and
splices the fresh Case/norm/value lines into the log in place.

A second mode, --peaks, addresses the opposite bias: rows measured while
the six regeneration workers shared the chip are *depressed* (min-of-reps
rarely lands in an idle gap), and the depressed peaks would understate the
committed baseline.  --peaks re-runs each log's headline rows — the row
with the best value and the largest-size row — solo and splices the fresh
uncontended triple in, whatever it reads.

Usage: python scripts/repair_rows.py [artifact root] [--peaks]
       (run with the chip idle)
"""

from __future__ import annotations

import contextlib
import glob
import io
import json
import os
import re
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")
TOL = 1.03


def ceilings(artdir):
    with open(os.path.join(artdir, "ceilings", "ceilings.log")) as f:
        for line in f:
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit("no ceilings JSON in artifacts")


def dtype_of(path):
    """(rerun flag args, itemsize) for an artifact log path.  Tier dirs
    (artifacts/{f64,bf16,high}/) mark non-default runs; reruns must carry
    the matching --dtype / --precision or they would splice rows measured
    under the wrong mode into the tier."""
    if f"{os.sep}f64{os.sep}" in path:
        return ["--dtype", "f64"], 8
    if f"{os.sep}bf16{os.sep}" in path:
        return ["--dtype", "bf16"], 2
    if f"{os.sep}high{os.sep}" in path:
        return ["--precision", "high"], 4
    return [], 4


def rows_of(path, unit):
    out = []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if len(tok) >= 3 and tok[2] == unit + ":":
                out.append((int(tok[1]), max(float(v) for v in tok[3:])))
    return out


def rerun(mod_main, argv):
    """Run a benchmark main with pinned size; return its stdout lines."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mod_main(argv)
    return buf.getvalue().splitlines()


def splice(path, size, fresh_lines):
    """Replace the Case/norm/value line triple for `size` in the log."""
    keep = {"Case:", "norm:"}
    fresh = [ln for ln in fresh_lines
             if len(ln.split()) >= 3 and ln.split()[1] == str(size)
             and (ln.split()[2] in keep or ln.split()[2].endswith("/s:"))]
    if not fresh:
        print(f"  !! rerun produced no row for {size}; leaving {path}")
        return
    out = []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if len(tok) >= 3 and tok[1] == str(size) and (
                    tok[2] in keep or tok[2].endswith("/s:")):
                continue  # drop the stale triple (re-inserted below)
            out.append(line.rstrip("\n"))
    # insert the fresh triple before the first row of a larger size, or at
    # the end of the file
    insert_at = len(out)
    for i, line in enumerate(out):
        tok = line.split()
        if (len(tok) >= 3 and tok[2] == "Case:" and tok[1].isdigit()
                and int(tok[1]) > size):
            insert_at = i
            break
    out[insert_at:insert_at] = fresh
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")


def peak_sizes(rows):
    """The sizes worth a solo refresh: best-value row + largest row."""
    if not rows:
        return []
    best = max(rows, key=lambda r: r[1])[0]
    last = max(rows, key=lambda r: r[0])[0]
    return sorted({best, last})


def main():
    argv = [a for a in sys.argv[1:] if a != "--peaks"]
    peaks = len(argv) != len(sys.argv) - 1
    artdir = argv[0] if argv else os.path.join(ROOT, "artifacts")
    sys.path.insert(0, ROOT)
    from tpu_bench.core import roofline
    from tpu_bench.benchmarks import (benchmark01, benchmark02, benchmark03,
                                      benchmark04, benchmark05)

    bw = ceilings(artdir)
    jobs = []  # (path, size, mod_main, argv)

    def stream(name, mod_main, mix):
        # the same empirical per-mix cap CI enforces (roofline.honesty_cap_*)
        cap = roofline.honesty_cap_mix(bw, *mix) * TOL
        for path in glob.glob(os.path.join(artdir, "**", name, "outfile.log"),
                              recursive=True):
            dt, _ = dtype_of(path)
            f64 = dt[1:] == ["f64"]
            rows = rows_of(path, "GB/s")
            if peaks:
                # f64 logs are norm-parity artifacts, not perf claims, and
                # their multi-GB host<->device marshalling makes solo
                # reruns hour-scale — ceiling repair still covers them
                picks = [] if f64 else [
                    (s, v) for s, v in rows if s in peak_sizes(rows)]
            else:
                picks = [(s, v) for s, v in rows if v > cap]
            for size, v in picks:
                jobs.append((path, size, v, cap, mod_main,
                             [f"--min-size={size}", f"--max-size={size}"]
                             + dt))

    def bwdtrans(name, mod_main, dim):
        for path in glob.glob(os.path.join(artdir, "**", name, "nq*.log"),
                              recursive=True):
            nq = int(re.search(r"nq(\d+)x", os.path.basename(path)).group(1))
            dt, it = dtype_of(path)
            f64 = dt[1:] == ["f64"]
            cap = roofline.honesty_cap_bwdtrans(bw, nq, dim, it) * TOL
            rows = rows_of(path, "DOF/s")
            if peaks:
                # f64 skipped (norm-parity artifacts, hour-scale reruns);
                # bf16 IS a perf claim and gets the solo peak refresh
                picks = [] if f64 else [
                    (s, v) for s, v in rows if s in peak_sizes(rows)]
            else:
                picks = [(s, v) for s, v in rows if v > cap]
            for size, v in picks:
                argv = [str(nq)] * dim + [f"--min-size={size}",
                                          f"--max-size={size}"] + dt
                jobs.append((path, size, v, cap, mod_main, argv))

    def collect():
        jobs.clear()
        stream("b01", benchmark01.main, (1, 0))
        stream("b02", benchmark02.main, (2, 1))
        stream("b03", benchmark03.main, (1, 0))
        bwdtrans("b04", benchmark04.main, 2)
        bwdtrans("b05", benchmark05.main, 3)

    # A refreshed value usually drops a contention-inflated best row, which
    # can promote a different stale row to "best" — iterate until every
    # log's current best has been refreshed in THIS run (bounded: each pass
    # only re-runs not-yet-refreshed (path, size) pairs).
    refreshed = set()
    for sweep in range(8 if peaks else 1):
        collect()
        if peaks:
            jobs[:] = [j for j in jobs if (j[0], j[1]) not in refreshed]
        if not jobs:
            if sweep == 0:
                print("all rows within ceilings; nothing to repair"
                      if not peaks else "no peak rows to refresh")
            break
        for path, size, v, cap, mod_main, argv in jobs:
            if peaks:
                print(f"refresh {path} size {size} solo (was {v:.1f})",
                      flush=True)
            else:
                print(f"repair {path} size {size}: {v:.1f} > cap {cap:.1f}",
                      flush=True)
            lines = rerun(mod_main, argv)
            splice(path, size, lines)
            refreshed.add((path, size))
        print(f"{'refreshed' if peaks else 'repaired'} {len(jobs)} rows "
              f"(pass {sweep + 1})")


if __name__ == "__main__":
    main()
