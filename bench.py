"""Benchmark: message-passing iteration throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is the reference's hot stage (SURVEY.md section 3.3): one full
extrapolation iteration — Kalman extrapolate/validate/update over every
active directed edge plus the double prior/reweight renormalisation — on
the FULL TrackML event graph, volumes 7-14 (minCurv_0.3_134: 55,701 nodes,
330,944 directed edges), float32, steady state.

Baseline: the reference Python pipeline measured on this machine at the
same scale (BASELINE.md "Full event" section; the committed reference
crashes at full volume — two zero-size-reduction defects were patched to
skip, see BASELINE.md): 330,944 directed edges / 119 s extrapolation stage
wall-clock = 2,781 edges/s.
"""

import json
import os
import sys
import time

# Baseline measured by running the (patched) /root/reference stage CLIs on
# this machine at volumes 7-14 (single CPU process, BASELINE.md "Full event
# (volumes 7-14)" table): 330,944 directed edges / 119 s extrapolation.
REF_EDGES_PER_S = 2781.0

# Reference wall-clock for the WHOLE 3-iteration schedule (cluster,
# extrapolate, cluster, extraction after each, metadata after iter 2) at
# volumes 7-14, measured via tools/make_ref_baseline.py --volumes 7 14
# --run on this machine: execution_stages.txt start of clustering (220 s)
# to end of final extraction (963 s) — event conversion and the
# evaluation stages excluded on both sides (BASELINE.md round-3 section).
REF_FULL_PIPELINE_S = 743.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
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
    from gnn_track_finding_tpu.models import pipeline

    cfg = PipelineConfig(min_volume=7, max_volume=14)
    log(f"[bench] backend={jax.default_backend()} devices={jax.devices()}")

    t0 = time.time()
    g, _ = trackml.load_event(trackml.DEFAULT_EVENT, cfg, dtype=jnp.float32)
    log(f"[bench] loaded {g.n_nodes} nodes / {g.n_edges} directed edges "
        f"(volumes {cfg.min_volume}-{cfg.max_volume}) in {time.time() - t0:.1f}s")

    prep = jax.jit(pipeline.prepare, static_argnums=1)
    clus = jax.jit(pipeline.cluster_stage, static_argnums=(1, 2))

    # 40 fused reps: the ~25 ms relay round-trip amortizes to <1 ms/iter
    # (block_until_ready does not drain the relay, so the loop is timed
    # end-to-end including one round trip)
    n_rep = 40

    # fused n_rep-iteration loop: measures pure device time per iteration;
    # the scalar .item() forces execution to finish (block_until_ready does
    # NOT drain remote execution on the axon relay backend)
    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def loop_extrap(gr, cfg):
        def body(i, gg):
            return pipeline.extrapolation_stage(gg, cfg)
        out = jax.lax.fori_loop(0, n_rep, body, gr)
        return out.active.sum()

    t0 = time.time()
    g = prep(g, cfg)
    g = clus(g, cfg, False)
    _ = g.active.sum().item()
    log(f"[bench] prepare+cluster (incl. compile) {time.time() - t0:.1f}s")

    t0 = time.time()
    _ = loop_extrap(g, cfg).item()
    log(f"[bench] extrapolation loop compile+first run {time.time() - t0:.1f}s")

    t0 = time.time()
    checksum = loop_extrap(g, cfg).item()
    dt = (time.time() - t0) / n_rep
    edges_per_s = g.n_edges / dt
    log(f"[bench] extrapolation iteration: {dt * 1e3:.1f} ms "
        f"-> {edges_per_s:,.0f} edges/s (checksum {checksum})")

    # ---- secondary metric: the WHOLE 3-iteration schedule fused in one
    # jit (prepare + (stage, extract, metadata)x3 incl. device CCA) ----
    g0, _ = trackml.load_event(trackml.DEFAULT_EVENT, cfg, dtype=jnp.float32)
    n_full = 3

    @functools.partial(jax.jit, static_argnums=1)
    def loop_full(gr, cfg):
        def body(i, carry):
            acc, chk = carry
            # thread the carry through an input so XLA cannot hoist the
            # loop-invariant body (numerically a no-op at f32)
            gg = gr.replace(xyzr=gr.xyzr + chk * 1e-30)
            final, accepted, _ = pipeline.full_pipeline(gg, cfg)
            return (acc + accepted.sum(),
                    chk + final.active.sum().astype(gr.dtype) * 1e-30)
        acc, _ = jax.lax.fori_loop(0, n_full, body,
                                   (jnp.int32(0), jnp.asarray(0.0, g0.dtype)))
        return acc

    t0 = time.time()
    _ = loop_full(g0, cfg).item()
    log(f"[bench] full_pipeline compile+first run {time.time() - t0:.1f}s")
    t0 = time.time()
    acc = loop_full(g0, cfg).item()
    dt_full = (time.time() - t0) / n_full
    log(f"[bench] full 3-iteration pipeline: {dt_full:.3f} s "
        f"(accepted x{n_full} = {acc})")
    print(json.dumps({
        "metric": "full_pipeline_seconds_full_event",
        "value": round(dt_full, 3),
        "unit": "s",
        "vs_baseline": round(REF_FULL_PIPELINE_S / dt_full, 2),
    }))

    # ---- routine on-chip Pallas gate: XLA-vs-Mosaic agreement of the
    # production cluster kernel on the real backend (the suite's TPU test
    # is skipped on CPU CI, so this line is the per-round record of
    # kernel agreement; STAGES.md documents the ~4% f32 near-threshold
    # decision flips as different valid FMA roundings) ----
    try:
        import numpy as np
        from gnn_track_finding_tpu.ops import clustering
        gk = prep(g0, cfg)
        gx = clustering.cluster(gk, cfg, False, backend="xla")
        gp = clustering.cluster(gk, cfg, False, backend="pallas")
        fx = np.asarray(gx.has_merged)
        fp = np.asarray(gp.has_merged)
        n_alive = max(int(np.asarray(gk.node_mask).sum()), 1)
        agree = 1.0 - (fx != fp).sum() / n_alive
        both = fx & fp
        ms_x = np.asarray(gx.merged_state)[both]
        ms_p = np.asarray(gp.merged_state)[both]
        denom = np.maximum(np.abs(ms_x), 1e-6)
        max_rel = float(np.max(np.abs(ms_x - ms_p) / denom)) if both.any() \
            else float("nan")
        log(f"[bench] pallas cluster kernel vs XLA (compiled, "
            f"{jax.default_backend()}): found-flag agreement "
            f"{agree * 100:.2f}% ({int((fx != fp).sum())}/{n_alive} flips), "
            f"max rel merged-state diff where both merge {max_rel:.2e}")
    except Exception as ex:  # the gate must never sink the bench metrics
        log(f"[bench] pallas agreement gate failed: {ex!r}")

    # ---- production stream record: sustained end-to-end events/s
    # (ingest + host->device + fused schedule + packed readback,
    # prefetch loader + pipelined stream driver — the BASELINE.md
    # round-5 streaming table's headline row, re-measured every round).
    # Logged, not a JSON metric line: the two metric lines above are the
    # stable cross-round records. ----
    try:
        from gnn_track_finding_tpu.data import prefetch
        cache_dir = "/root/repo/.event_cache"
        # warm compiles + cache entry outside the timing
        gw, _ = trackml.load_event(trackml.DEFAULT_EVENT, cfg,
                                   dtype=jnp.float32, cache_dir=cache_dir,
                                   with_tracker=False)
        pipeline.run_pipeline_fast(gw, cfg)
        n_ev = 10
        loader = prefetch.prefetch_trackml(
            [trackml.DEFAULT_EVENT] * n_ev, cfg, dtype=jnp.float32,
            depth=2, cache_dir=cache_dir, with_tracker=False)
        t0 = time.time()
        n_cand = sum(len(out.candidates)
                     for out in pipeline.stream_pipeline(loader, cfg))
        ev_per_s = n_ev / (time.time() - t0)
        log(f"[bench] production stream ({n_ev} events, prefetch+pipelined, "
            f"binary cache): {ev_per_s:.2f} events/s sustained "
            f"({n_cand} candidates)")
    except Exception as ex:  # never sink the bench metrics
        log(f"[bench] stream record failed: {ex!r}")

    print(json.dumps({
        "metric": "message_passing_edges_per_s_full_event",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / REF_EDGES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
