"""Per-stage timing + optional XLA profiler traces.

The reference's observability is ad-hoc time.time() deltas and tqdm.write
(SURVEY.md §5).  This provides structured stage timers with a report, and
wires ``jax.profiler.trace`` for device-level traces when a trace dir is
set (TPUBODY_TRACE_DIR env var or explicit argument).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional


class StageTimer:
    """Collects named stage durations; optionally emits a jax profiler
    trace around each stage."""

    def __init__(self, trace_dir: Optional[str] = None):
        self.trace_dir = trace_dir or os.environ.get("TPUBODY_TRACE_DIR")
        self.records: List[Dict] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        ctx = contextlib.nullcontext()
        if self.trace_dir:
            import jax
            ctx = jax.profiler.trace(
                os.path.join(self.trace_dir, name.replace("/", "_")))
        t0 = time.perf_counter()
        with ctx:
            yield
        self.records.append(
            {"stage": name, "seconds": round(time.perf_counter() - t0, 4)})

    def report(self) -> str:
        lines = [f"{r['stage']:<28s} {r['seconds']:>9.3f}s"
                 for r in self.records]
        total = sum(r["seconds"] for r in self.records)
        lines.append(f"{'TOTAL':<28s} {total:>9.3f}s")
        return "\n".join(lines)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.records, f, indent=1)
