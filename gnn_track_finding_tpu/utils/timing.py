"""Per-stage timing & profiling.

The reference's only profiling is bash $SECONDS snapshots written to
execution_stages.txt / execution_times.txt (run_gnn_trackml_mod.sh:44-46,
171-186) plus inline time.time() prints.  Here:

  * StageTimer records named stage wall-clock (blocking on device results
    so device time is attributed to the right stage) and can write the
    reference's two text artifacts for parity;
  * `trace` wraps a block in the JAX profiler for TensorBoard-readable
    device traces.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional

import jax


class StageTimer:
    def __init__(self) -> None:
        self.stages: List[str] = ["start_time"]
        self.times: List[float] = [0.0]
        self._t0 = time.time()

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.stages.append(name)
        self.times.append(time.time() - self._t0)

    def durations(self) -> Dict[str, float]:
        return {self.stages[i]: self.times[i] - self.times[i - 1]
                for i in range(1, len(self.stages))}

    def write_artifacts(self, directory: str) -> None:
        """execution_stages.txt / execution_times.txt, as the reference
        writes them (run_gnn_trackml_mod.sh:177-187)."""
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "execution_stages.txt"), "w") as f:
            f.write("\n".join(self.stages) + "\n")
        with open(os.path.join(directory, "execution_times.txt"), "w") as f:
            f.write("\n".join(str(int(t)) for t in self.times) + "\n")


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """JAX profiler trace (view with TensorBoard / xprof)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
