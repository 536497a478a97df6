"""Variant registry.

Each benchmark is a fixed, ordered list of Variants — the analog of the
reference's per-benchmark run_test<T> body timing 5-11 implementations of the
same math in sequence (benchmark01/benchmark01.cc:183-335,
benchmark04/benchmark04.cc:428-1056).  Keeping the list ordered preserves the
column order the postprocess scripts assume.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional


@dataclasses.dataclass
class VariantRun:
    """A prepared, timeable instance of one variant at one sweep size.

    step:    issue one repetition (must return something block-on-able).
    result:  produce the output array used for validation norms.  For
             accumulating benchmarks (b02's x += y) this is read AFTER the
             timed reps, matching the reference's post-timing norm
             (benchmark02/benchmark02.cc:161-164).
    warmup:  optional side-effect-free call that populates the jit cache.
    """

    step: Callable[[], object]
    result: Callable[[], object]
    warmup: Optional[Callable[[], object]] = None


@dataclasses.dataclass
class Variant:
    """label: the column name in Case lines; build(data, cfg) -> VariantRun."""

    label: str
    build: Callable


def run_variants(variants, data, cfg, timer_fn):
    """Time every variant; returns (times, norms_sources) in registry order."""
    times, outs = [], []
    for v in variants:
        run = v.build(data, cfg)
        t = timer_fn(run.step, n_tests=cfg.n_tests, warmup=run.warmup)
        times.append(t)
        outs.append(run.result())
    return times, outs
