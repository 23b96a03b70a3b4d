"""Phase profiling: lightweight timers around synthesis/compile/device
phases, bridging to jax.profiler traces when available.

The reference's only perf tooling is criterion microbenches
(core/benches/lc.rs); here phases are first-class because a production
run has distinct host-synthesis / compile / witness / check stages whose
balance matters."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional

_PHASES: Dict[str, List[float]] = defaultdict(list)


@contextlib.contextmanager
def phase(name: str, trace: bool = False):
    """Time a named phase. With trace=True, also emit a jax.profiler
    StepTraceAnnotation so device traces line up with host phases."""
    ctx = contextlib.nullcontext()
    if trace:
        try:
            import jax.profiler

            ctx = jax.profiler.TraceAnnotation(name)
        except Exception:
            pass
    t0 = time.perf_counter()
    with ctx:
        yield
    _PHASES[name].append(time.perf_counter() - t0)


def phase_report(reset: bool = False) -> Dict[str, dict]:
    """Aggregate phase timings: {name: {count, total_s, mean_s}}."""
    out = {}
    for name, times in _PHASES.items():
        out[name] = {
            "count": len(times),
            "total_s": round(sum(times), 6),
            "mean_s": round(sum(times) / len(times), 6),
        }
    if reset:
        _PHASES.clear()
    return out
