"""Dispatch-vs-chained timing anchor (VERDICT r1 #8).

Produces one log that quantitatively justifies the chained methodology
in-repo: the measured host<->device sync round-trip, then one large size
per benchmark timed BOTH ways.  Over a remote-attached TPU the dispatch
numbers are sync-latency-bound (reference semantics time one launch per
repetition, benchmark01/benchmark01.cc:197-209 — meaningful only when the
link latency is microseconds); the chained numbers cancel the fixed costs
and report steady-state kernel throughput with HBM-honest traffic.

Usage: python scripts/anchor.py [outdir]   (default artifacts/anchor)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

# `python scripts/anchor.py` puts scripts/ (not the repo root) on
# sys.path; don't depend on the editable install being present
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_one(mod_main, argv, stream):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mod_main(argv)
    stream.write(buf.getvalue())
    stream.flush()


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/anchor"
    os.makedirs(outdir, exist_ok=True)
    from tpu_bench.core.timing import sync_latency

    from tpu_bench.benchmarks import (benchmark01, benchmark02, benchmark03,
                                      benchmark04, benchmark05)

    cases = [
        ("b01", benchmark01.main,
         ["--min-size", "134217728", "--max-size", "134217728"]),
        ("b02", benchmark02.main,
         ["--min-size", "134217728", "--max-size", "134217728"]),
        ("b03", benchmark03.main,
         ["--min-size", "16384", "--max-size", "16384"]),
        ("b04", benchmark04.main,
         ["8", "8", "--min-size", "262144", "--max-size", "262144"]),
        ("b05", benchmark05.main,
         ["8", "8", "8", "--min-size", "262144", "--max-size", "262144"]),
    ]
    path = os.path.join(outdir, "anchor.log")
    with open(path, "w") as f:
        lat = sync_latency()
        f.write(f"# timing anchor: one large size per benchmark, both "
                f"timing modes\n")
        f.write(f"# measured host<->device sync round-trip: "
                f"{lat * 1e3:.3f} ms\n")
        f.write(f"# dispatch mode times sync latency + kernel per rep "
                f"(reference semantics, benchmark01.cc:197-209); chained "
                f"mode cancels fixed costs (tpu_bench/core/timing.py)\n")
        for name, mod_main, argv in cases:
            for mode in ("dispatch", "chained"):
                f.write(f"# --- {name} --timing {mode} ---\n")
                f.flush()
                run_one(mod_main, argv + ["--timing", mode, "--ntests", "16"],
                        f)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
