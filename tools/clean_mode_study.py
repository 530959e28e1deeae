"""Clean mode vs bug-compatible mode: the physics upside.

The parity bar reproduces the reference's results bit-for-bit INCLUDING
its defects (covariance aliasing, squared tau variance, mirrored tau
pairing, cumulative var_ms, double-predict KF, elementwise-trace KL,
r/z rotation typo, filterpy scalar-Q broadcast — each cited at its use
site).  This study measures what the framework gains when the defects
are fixed (bug_compat=False) and when the calibrated per-node KL LUT —
plumbed but dead in the reference (clustering.py:386,400; thresholds
commented out in clustering_updated_states_test.py:176,233) — is
actually wired in.  The judge is the reference's own efficiency formula
(reconstruction_efficiency.py:213-218 via evaluation/efficiency.py).

Runs >= 10 seeded toy events per mode + the volume-7 TrackML event;
prints a markdown table for DESIGN.md/BASELINE.md.

Usage: python tools/clean_mode_study.py [--seeds 10] [--tracks 16]
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--tracks", type=int, default=16)
    ap.add_argument("--trackml", action="store_true",
                    help="also run the volume-7 TrackML event per mode")
    ap.add_argument("--tune", action="store_true",
                    help="sweep clean-mode clustering thresholds")
    ap.add_argument("--lut_diag", action="store_true",
                    help="print LUT threshold distribution diagnostics")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/cpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    from gnn_track_finding_tpu.config import PipelineConfig
    from gnn_track_finding_tpu.calib import lut as lut_mod
    from gnn_track_finding_tpu.calib import training_data
    from gnn_track_finding_tpu.evaluation import efficiency
    from gnn_track_finding_tpu.graph.build import build_graph_state
    from gnn_track_finding_tpu.models import pipeline, toymc

    base = PipelineConfig(node_bucket=256, edge_bucket=1024)

    # calibrate the LUT once, on CLEAN-mode training data (the LUT tunes
    # clean-mode clustering; calibrating on bug-compat KL values would
    # tune the defect, not the algorithm)
    clean_base = dataclasses.replace(base, bug_compat=False)
    rows = training_data.generate_training_data(num_events=30, seed=1000,
                                                cfg=clean_base)
    table = lut_mod.fit_lut_quantile(rows)
    print(f"[study] LUT fitted on {rows.shape[0]} clean-mode pairs, "
          f"{len(table.upper)} bins", file=_sys.stderr)

    modes = [
        ("bug_compat (reference semantics)",
         dataclasses.replace(base, bug_compat=True), False),
        ("clean (defects fixed)", clean_base, False),
        ("clean + calibrated LUT", clean_base, True),
    ]

    print("| mode | mean eff % | mean track purity | mean particle purity "
          "| candidates/event |")
    print("|---|---|---|---|---|")
    summary = {}
    for name, cfg, use_lut in modes:
        effs, tps, pps, ncands = [], [], [], []
        for seed in range(args.seeds):
            ev = toymc.generate_event(num_tracks=args.tracks, seed=seed)
            g, _ = build_graph_state(ev.xyzr, ev.vivl, ev.truth,
                                     ev.edge_pairs, cfg)
            thr = None
            if use_lut:
                feat = np.asarray(g.grad_stats)[:, 1]
                thr = jnp.asarray(table.thresholds_for(feat), g.dtype)
            out = pipeline.run_pipeline(g, cfg, kl_thresholds=thr)
            cands = [c.nodes for c in out.candidates]
            rep = efficiency.evaluate_toy(cands, ev.truth, ev.vivl, cfg)
            effs.append(rep.efficiency_pct)
            ncands.append(len(cands))
            if rep.track_purities.size:
                tps.append(rep.track_purities.mean())
                pps.append(rep.particle_purities.mean())
        row = (np.mean(effs), np.mean(tps) if tps else float("nan"),
               np.mean(pps) if pps else float("nan"), np.mean(ncands))
        summary[name] = row
        print(f"| {name} | {row[0]:.1f} | {row[1]:.3f} | {row[2]:.3f} "
              f"| {row[3]:.1f} |")

    if args.tune:
        # the reference's thresholds (chi2=1.0/KL=2.0 seed round,
        # run_gnn_trackml_mod.sh:89,112) are implicitly tuned to the
        # DEFECTIVE chi2/KL scales (squared tau variance, elementwise
        # trace); clean mode changes both scales, so compare at its own
        # operating point: a small sweep over the same exposed knobs
        best = None
        for cs in (0.5, 1.0, 2.0, 4.0):
            for ks in (1.0, 2.0, 4.0, 8.0):
                # each config is a fresh static jit arg -> a fresh set of
                # pipeline executables; without this the sweep exhausts
                # XLA:CPU's contiguous JIT code arena ("LLVM ERROR: Unable
                # to allocate section memory!" — CLAUDE.md Machine gotchas)
                jax.clear_caches()
                cfg = dataclasses.replace(
                    clean_base, chi2_threshold_seed=cs, kl_threshold_seed=ks)
                effs = []
                for seed in range(args.seeds):
                    ev = toymc.generate_event(num_tracks=args.tracks,
                                              seed=seed)
                    g, _ = build_graph_state(ev.xyzr, ev.vivl, ev.truth,
                                             ev.edge_pairs, cfg)
                    out = pipeline.run_pipeline(g, cfg)
                    rep = efficiency.evaluate_toy(
                        [c.nodes for c in out.candidates], ev.truth,
                        ev.vivl, cfg)
                    effs.append(rep.efficiency_pct)
                e = float(np.mean(effs))
                print(f"tune clean chi2={cs} kl={ks}: eff {e:.1f}%")
                if best is None or e > best[0]:
                    best = (e, cs, ks)
        print(f"best clean operating point: eff {best[0]:.1f}% at "
              f"chi2={best[1]} kl={best[2]}")

    if args.lut_diag:
        ev = toymc.generate_event(num_tracks=args.tracks, seed=0)
        g, _ = build_graph_state(ev.xyzr, ev.vivl, ev.truth, ev.edge_pairs,
                                 clean_base)
        feat = np.asarray(g.grad_stats)[:, 1]
        thr = table.thresholds_for(feat)
        print(f"lut thresholds: min {thr.min():.3g} max {thr.max():.3g} "
              f"mean {thr.mean():.3g}; scalar default "
              f"{clean_base.kl_threshold_seed}; "
              f"frac tighter: {(thr < clean_base.kl_threshold_seed).mean():.2f}")

    if args.trackml:
        from gnn_track_finding_tpu.data import trackml
        for name, cfg, use_lut in modes:
            cfg7 = dataclasses.replace(cfg, min_volume=7, max_volume=7,
                                       node_bucket=base.node_bucket,
                                       edge_bucket=base.edge_bucket)
            g, host = trackml.load_event(trackml.DEFAULT_EVENT, cfg7,
                                         dtype=jnp.float64)
            thr = None
            if use_lut:
                feat = np.asarray(g.grad_stats)[:, 1]
                thr = jnp.asarray(table.thresholds_for(feat), g.dtype)
            out = pipeline.run_pipeline(g, cfg7, kl_thresholds=thr)
            cands = [c.nodes for c in out.candidates]
            rep = efficiency.evaluate(cands, host, cfg7)
            print(f"trackml v7 | {name} | eff {rep.efficiency_pct:.1f}% "
                  f"({rep.num_reconstructed}/{rep.num_reference}) "
                  f"candidates {len(cands)}")


if __name__ == "__main__":
    main()
