"""Variant registry.

Each benchmark is a fixed, ordered list of Variants — the analog of the
reference's per-benchmark run_test<T> body timing 5-11 implementations of the
same math in sequence (benchmark01/benchmark01.cc:183-335,
benchmark04/benchmark04.cc:428-1056).  Keeping the list ordered preserves the
column order the postprocess scripts assume.
"""

from __future__ import annotations

import dataclasses
from typing import Callable


@dataclasses.dataclass
class Variant:
    """label: the column name in Case lines; build(data, cfg) -> callable
    computing one application of the variant's math."""

    label: str
    build: Callable
