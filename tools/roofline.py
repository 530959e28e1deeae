"""Bytes-touched roofline per pipeline stage: measured time vs the HBM floor.

For every stage the tool reports
  * measured steady-state ms/iter (fused carry-fed fori_loop, checksum
    completion, relay RTT subtracted — CLAUDE.md measurement discipline),
  * XLA's own cost analysis of the compiled stage: bytes accessed and
    FLOPs for ONE application,
  * the implied hardware floor  bytes / HBM bandwidth  (v5e ~819 GB/s),
  * measured / floor — how far the stage sits from bandwidth-bound.

This quantifies the round-4 VERDICT question: is the ~150 ms of stage
time a floor, or overhead?  A ratio >> 1 means the stage is bound by
something other than HBM (scatter serialization, gather tile
amplification, dispatch), i.e. headroom exists in principle; ~1 means
bandwidth-bound, i.e. only layout changes that reduce bytes can help.

Also measures one adaptive-FastSV hooking round in isolation (the unit
the Pallas-fusion question is about, graph/cca.py).

Usage: python tools/roofline.py [--volumes 7 14] [--n 20] [--bw 819e9]
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--volumes", nargs=2, type=int, default=[7, 14])
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--bw", type=float, default=819e9,
                    help="HBM bandwidth bytes/s (v5e ~819e9)")
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
    from gnn_track_finding_tpu.data import trackml
    from gnn_track_finding_tpu.graph import cca
    from gnn_track_finding_tpu.models import pipeline
    from gnn_track_finding_tpu.ops import extract, extrapolate, gtools, metadata

    cfg = PipelineConfig(min_volume=args.volumes[0],
                         max_volume=args.volumes[1])
    t0 = time.time()
    g, host = trackml.load_event(trackml.DEFAULT_EVENT, cfg,
                                 dtype=jnp.float32,
                                 cache_dir="/root/repo/.event_cache",
                                 with_tracker=False)
    print(f"[roofline] {g.n_nodes} nodes / {g.n_edges} edges in "
          f"{time.time() - t0:.1f}s; backend={jax.default_backend()}",
          file=sys.stderr)

    g = pipeline._prepare_jit(g, cfg)
    g1 = pipeline._stage_jit(g, cfg, 1, None)

    @jax.jit
    def _nop(x):
        return x + 1.0
    _ = _nop(jnp.float32(0)).item()
    t = time.time()
    for _ in range(5):
        _ = _nop(jnp.float32(0)).item()
    rtt = (time.time() - t) / 5
    print(f"[roofline] relay round-trip {rtt * 1e3:.1f} ms", file=sys.stderr)

    rows = []

    def analyze(name, fn, state, n=args.n, checksum=None):
        """fn: state -> state (same pytree class); one row of the table."""
        if checksum is None:
            checksum = lambda s: (s.merged_state.sum() + s.upd_sv.sum()
                                  + s.active.sum().astype(s.dtype))

        @jax.jit
        def loop(s):
            out = jax.lax.fori_loop(0, n, lambda _, st: fn(st), s)
            return checksum(out)

        t0 = time.time()
        _ = loop(state).item()
        first = time.time() - t0
        t0 = time.time()
        _ = loop(state).item()
        ms = (time.time() - t0 - rtt) / n * 1e3

        # cost analysis of ONE application
        gb = flops = float("nan")
        try:
            ca = jax.jit(fn).lower(state).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            gb = ca.get("bytes accessed", float("nan")) / 1e9
            flops = ca.get("flops", float("nan")) / 1e9
        except Exception as ex:  # pragma: no cover - backend-dependent
            print(f"[roofline] cost_analysis failed for {name}: {ex}",
                  file=sys.stderr)
        floor_ms = gb * 1e9 / args.bw * 1e3
        rows.append((name, ms, gb * 1e3, flops, floor_ms,
                     ms / floor_ms if floor_ms == floor_ms else float("nan")))
        print(f"{name:30s} {ms:8.2f} ms   bytes {gb * 1e3:8.1f} MB   "
              f"GFLOP {flops:6.2f}   HBM floor {floor_ms:6.2f} ms   "
              f"x{ms / floor_ms:6.1f}   (compile {first:.0f}s)")

    analyze("cluster_stage(seed)",
            lambda s: pipeline.cluster_stage(s, cfg, use_updated=False), g)
    analyze("cluster_stage(updated)",
            lambda s: pipeline.cluster_stage(s, cfg, use_updated=True), g1)
    analyze("extrapolation_stage",
            lambda s: pipeline.extrapolation_stage(s, cfg), g1)
    analyze("message_passing only",
            lambda s: extrapolate.message_passing(s, cfg), g1)
    analyze("metadata",
            lambda s: metadata.remove_state_metadata(s, cfg), g1)

    def ext(s):
        res = extract.extract_candidates(s, cfg, None)
        return extract.apply_extraction(s, res, cfg)
    analyze("extract+apply (device CCA)", ext, g1, n=max(args.n // 4, 2))

    # --- CCA in isolation: full adaptive FastSV + one hooking round ---
    def cca_only(s):
        # the edge mask must DEPEND on the carry (previous labels) or XLA
        # hoists the whole while_loop out of the timing fori_loop
        # (CLAUDE.md measurement discipline; `s.replace(component=...)`
        # alone is not enough because edge_ok doesn't read component)
        dep = s.component.min() >= jnp.int32(-1)        # always True
        labels = cca.connected_components_fastsv(
            s, (s.edge_mask & s.active) & dep)
        return s.replace(component=labels)
    analyze("CCA adaptive FastSV", cca_only, g1,
            checksum=lambda s: s.component.sum().astype(s.dtype))

    a = g1.src[0::2]
    b = g1.dst[0::2]
    ok = (g1.edge_mask & g1.active)[0::2] | (g1.edge_mask & g1.active)[1::2]
    n_pad = g1.node_mask.shape[0]
    big = jnp.int32(n_pad)

    def one_round(s):
        f = s.component
        fa = gtools.gather1d_unchecked(a, f)
        fb = gtools.gather1d_unchecked(b, f)
        lo_e = jnp.where(ok, jnp.minimum(fa, fb), big)
        hi_e = jnp.where(ok, jnp.maximum(fa, fb), 0)
        new = f.at[hi_e].min(lo_e)
        new = gtools.gather1d_unchecked(new, new)
        new = gtools.gather1d_unchecked(new, new)
        return s.replace(component=new)
    g1r = g1.replace(component=jnp.arange(n_pad, dtype=jnp.int32))
    analyze("FastSV one hooking round", one_round, g1r,
            checksum=lambda s: s.component.sum().astype(s.dtype))

    print("\n| Stage | measured ms | bytes MB | HBM-floor ms | x off floor |")
    print("|---|---|---|---|---|")
    for name, ms, mb, fl, floor, ratio in rows:
        print(f"| {name} | {ms:.2f} | {mb:.1f} | {floor:.3f} | {ratio:.0f} |")


if __name__ == "__main__":
    main()
