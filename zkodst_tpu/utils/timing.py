"""Phase timing + structured metrics.

The ark_std `start_timer!`/`end_timer!` + criterion role (SURVEY.md §5.1,
§5.5): labeled wall-clock phases around setup/prove/verify — the labels
match the reference's benchmarking/src/constants.rs:1-3 for comparability —
plus machine-readable JSON metrics per run.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

# the reference's phase labels (benchmarking/src/constants.rs)
SETUP = "Setup generation"
PROVE = "Proof generation"
VERIFY = "Proof verification"


@dataclass
class Phase:
    label: str
    seconds: float


@dataclass
class Metrics:
    phases: List[Phase] = field(default_factory=list)
    values: Dict[str, float] = field(default_factory=dict)
    echo: bool = True

    @contextlib.contextmanager
    def phase(self, label: str):
        t0 = time.perf_counter()
        if self.echo:
            print(f"Start: [{label}]", flush=True)
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases.append(Phase(label, dt))
            if self.echo:
                print(f"End:   [{label}] {dt * 1e3:.1f} ms", flush=True)

    def record(self, key: str, value: float) -> None:
        self.values[key] = value

    def seconds(self, label: str) -> Optional[float]:
        for ph in reversed(self.phases):
            if ph.label == label:
                return ph.seconds
        return None

    def to_json(self) -> str:
        return json.dumps({
            "phases": {p.label: round(p.seconds, 6) for p in self.phases},
            **{k: v for k, v in self.values.items()},
        })


@contextlib.contextmanager
def profiler_trace(trace_dir: Optional[str]):
    """Capture a jax.profiler (Perfetto/XPlane) trace around a block.

    The flamegraph/criterion analogue of the reference's pprof hookup
    (blake2f-circuit/Cargo.toml:32-37, benches/primitives.rs:60-65;
    SURVEY.md §5.1): per-kernel device timelines viewable in Perfetto /
    TensorBoard. No-op when trace_dir is falsy, so callers can wire it to
    an env var (bench.py: ZKODST_PROFILE=<dir>)."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
