"""Shared log parsing + plotting for the postprocess scripts.

Parsing contract (SURVEY.md §3.3, benchmark01/postprocess.py:10-15): a
throughput line has token[1] = size and tokens[3:] = per-variant values, and
is selected by a pair of substrings ("Size" + "GB/s" for b01-b03,
"nelmt" + "DOF/s" for b04/b05 with a "NQ =" title line).  Variant labels are
read from the preceding Case line when available.
"""

from __future__ import annotations

import glob
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def parse_log(path, key, unit):
    """Return (sizes, series, labels, title) from one log file."""
    sizes, series, labels, title = [], [], None, ""
    with open(path) as f:
        for line in f:
            toks = line.split()
            if "NQ =" in line:
                title = line.strip()
            if len(toks) > 3 and toks[0] == key and toks[2] == "Case:":
                labels = toks[3:]
            elif key in line and unit in line and len(toks) > 3:
                sizes.append(float(toks[1]))
                series.append([float(v) for v in toks[3:]])
    return sizes, series, labels, title


def plot_logs(logdir, key, unit, xlabel, ylabel, ylim=None,
              fallback_labels=None):
    """One .png per .log, semilog-x, one line per variant column."""
    logs = sorted(glob.glob(os.path.join(logdir, "*.log")))
    if not logs:
        print(f"no .log files in {logdir}", file=sys.stderr)
        return []
    outputs = []
    for path in logs:
        sizes, series, labels, title = parse_log(path, key, unit)
        if not series:
            continue
        ncol = len(series[0])
        if not labels or len(labels) != ncol:
            labels = fallback_labels
        if not labels or len(labels) != ncol:
            labels = [f"variant{i}" for i in range(ncol)]
        plt.figure(figsize=(7, 5))
        for i in range(ncol):
            plt.semilogx(sizes, [row[i] for row in series], label=labels[i])
        plt.legend(fontsize=8)
        plt.xlabel(xlabel)
        plt.ylabel(ylabel)
        if ylim:
            plt.ylim(ylim)
        plt.title(title or os.path.basename(path))
        plt.grid(True, which="both", alpha=0.3)
        out = path[: -len(".log")] + ".png"
        plt.savefig(out, dpi=120)
        plt.close()
        outputs.append(out)
        print(f"wrote {out}")
    return outputs
