"""Per-stage steady-state device timings at full-event scale.

Methodology (CLAUDE.md "Machine gotchas"): each stage is measured as a
fused lax.fori_loop of N iterations inside ONE jit, completion forced via
a scalar checksum .item() (block_until_ready does not drain the relay),
minus the measured relay round-trip; divided by N.

Usage: python tools/profile_stages.py [--volumes 7 14] [--n 20] [--f64]
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--volumes", nargs=2, type=int, default=[7, 14])
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--f64", action="store_true")
    args = ap.parse_args()

    import jax
    from gnn_track_finding_tpu.utils.platform import ensure_backend
    ensure_backend()
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      f"/root/repo/.jax_cache/{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from gnn_track_finding_tpu.config import PipelineConfig
    from gnn_track_finding_tpu.data import trackml
    from gnn_track_finding_tpu.models import pipeline
    from gnn_track_finding_tpu.ops import clustering, extract, extrapolate, metadata, priors

    cfg = PipelineConfig(min_volume=args.volumes[0],
                         max_volume=args.volumes[1])
    dtype = jnp.float64 if args.f64 else jnp.float32
    t0 = time.time()
    g, host = trackml.load_event(trackml.DEFAULT_EVENT, cfg, dtype=dtype)
    print(f"[profile] {g.n_nodes} nodes / {g.n_edges} edges loaded "
          f"in {time.time() - t0:.1f}s; backend={jax.default_backend()}",
          file=sys.stderr)

    g = pipeline._prepare_jit(g, cfg)
    g1 = pipeline._stage_jit(g, cfg, 1, None)   # clustered state for later stages

    # relay round-trip: time a trivial jitted scalar op
    @jax.jit
    def _nop(x):
        return x + 1.0
    _ = _nop(jnp.float32(0)).item()
    t = time.time()
    for _ in range(5):
        _ = _nop(jnp.float32(0)).item()
    rtt = (time.time() - t) / 5
    print(f"[profile] relay round-trip {rtt * 1e3:.1f} ms", file=sys.stderr)

    def measure(name, fn, state, n=args.n):
        """fn: GraphState -> GraphState, fused n times."""
        @jax.jit
        def loop(s):
            def body(_, st):
                return fn(st)
            out = jax.lax.fori_loop(0, n, body, s)
            return out.merged_state.sum() + out.upd_sv.sum() + \
                out.active.sum().astype(out.dtype)
        t0 = time.time()
        _ = loop(state).item()
        t_first = time.time() - t0
        t0 = time.time()
        _ = loop(state).item()
        dt = (time.time() - t0 - rtt) / n
        print(f"{name:28s} {dt * 1e3:8.2f} ms/iter   "
              f"(first incl. compile {t_first:.1f}s)")

    measure("cluster_stage(seed)", lambda s: pipeline.cluster_stage(
        s, cfg, use_updated=False), g)
    measure("extrapolation_stage", lambda s: pipeline.extrapolation_stage(
        s, cfg), g1)
    measure("message_passing only", lambda s: extrapolate.message_passing(
        s, cfg), g1)
    measure("priors+reweight x2", lambda s: priors.reweight(
        priors.compute_prior_probabilities(
            priors.reweight(priors.compute_prior_probabilities(
                s, True), cfg), True), cfg), g1)
    measure("cluster_stage(updated)", lambda s: pipeline.cluster_stage(
        s, cfg, use_updated=True), g1)
    measure("metadata", lambda s: metadata.remove_state_metadata(s, cfg), g1)

    def ext(s):
        res = extract.extract_candidates(s, cfg, None)
        return extract.apply_extraction(s, res, cfg)
    measure("extract+apply (device CCA)", ext, g1, n=max(args.n // 4, 2))


if __name__ == "__main__":
    main()
