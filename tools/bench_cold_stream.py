"""Cold DISTINCT-event streaming: the production case the binary event
cache cannot help.

Stages N path-distinct copies of the full TrackML event (distinct paths
-> distinct cache keys -> every load runs the real ingest) and streams
them through the prefetch loader + pipelined fused driver, in both
operating modes:

  clean       — the framework operating point: the NetworkX set()-order
                emulation is skipped entirely (no consumer reads the
                mirror; pinned in tests/test_graph_build.py) and the
                mirror is not even transferred.
  bug_compat  — parity numerics: every cold load pays the ~1.9 s
                vectorised order emulation the reference's defect
                reproduction needs.

Warmup compiles (and the first parse) happen on a separate staged copy
outside the timing; the timed loop still cold-parses every event.

Recorded in BASELINE.md "Distinct-event cold streams" (round 5:
clean 3.71 events/s, bug_compat 0.59 events/s on the one v5e chip).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python tools/bench_cold_stream.py [--n 8] [--modes clean bug_compat]
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import shutil
import time

STAGE_DIR = "/tmp/distinct_events"


def stage_copies(n: int):
    """Copy the event CSVs to n+1 distinct directories (index n is the
    warmup copy); returns the per-index TrackMLPaths factory."""
    from gnn_track_finding_tpu.data import trackml
    src = trackml.DEFAULT_EVENT
    names = {
        "nodes_csv": _os.path.basename(src.nodes_csv),
        "edges_csv": _os.path.basename(src.edges_csv),
        "truth_csv": _os.path.basename(src.truth_csv),
    }
    for i in range(n + 1):
        d = f"{STAGE_DIR}/{i}"
        _os.makedirs(d, exist_ok=True)
        for attr, base in names.items():
            dst = _os.path.join(d, base)
            if not _os.path.exists(dst):
                shutil.copy(getattr(src, attr), dst)

    def paths(i):
        d = f"{STAGE_DIR}/{i}"
        return trackml.TrackMLPaths(
            nodes_csv=_os.path.join(d, names["nodes_csv"]),
            edges_csv=_os.path.join(d, names["edges_csv"]),
            truth_csv=_os.path.join(d, names["truth_csv"]),
            particles_csv=None)

    return paths


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--modes", nargs="+", default=["clean", "bug_compat"],
                    choices=["clean", "bug_compat"])
    args = ap.parse_args()

    import jax
    from gnn_track_finding_tpu.utils.platform import ensure_backend
    ensure_backend()
    jax.config.update("jax_compilation_cache_dir",
                      f"/root/repo/.jax_cache/{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from gnn_track_finding_tpu.config import PipelineConfig
    from gnn_track_finding_tpu.data import trackml, prefetch
    from gnn_track_finding_tpu.models import pipeline

    paths = stage_copies(args.n)
    for name in args.modes:
        cfg = PipelineConfig(min_volume=7, max_volume=14)
        if name == "clean":
            cfg = dataclasses.replace(cfg, bug_compat=False)
        # warmup on the extra staged copy: compiles + first parse
        g, _ = trackml.load_event(paths(args.n), cfg, dtype=jnp.float32,
                                  with_tracker=False)
        pipeline.run_pipeline_fast(g, cfg)
        ps = [paths(i) for i in range(args.n)]
        t0 = time.perf_counter()
        total = 0
        loader = prefetch.prefetch_trackml(ps, cfg, dtype=jnp.float32,
                                           depth=2, cache_dir=None,
                                           with_tracker=False, workers=2)
        for out in pipeline.stream_pipeline(loader, cfg):
            total += len(out.candidates)
        dt = time.perf_counter() - t0
        print(f"cold distinct {args.n}-event stream [{name}]: "
              f"{args.n / dt:.2f} events/s ({total} candidates)")


if __name__ == "__main__":
    main()
