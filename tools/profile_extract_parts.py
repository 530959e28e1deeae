"""Block-level profile of the extraction stage (ops/extract.py) at full
event: device CCA, candidate matrix, proximity merge, row compaction,
rotation + KF fit, accepted-first compaction, apply.

Usage: PYTHONPATH=/root/repo python tools/profile_extract_parts.py [--n 10]
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
    ap.add_argument("--n", type=int, default=10)
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
    from gnn_track_finding_tpu.ops import extract

    cfg = PipelineConfig(min_volume=args.volumes[0],
                         max_volume=args.volumes[1])
    g, _ = trackml.load_event(trackml.DEFAULT_EVENT, cfg, dtype=jnp.float32)
    g = pipeline._prepare_jit(g, cfg)
    g1 = pipeline._stage_jit(g, cfg, 1, None)
    labels0 = jax.jit(
        lambda s: cca.connected_components_fastsv(s, s.edge_mask & s.active)
    )(g1)
    print(f"[ex] N={g1.num_padded_nodes} E={g1.num_padded_edges} "
          f"backend={jax.default_backend()}", file=sys.stderr)

    @jax.jit
    def _nop(x):
        return x + 1.0
    _ = _nop(jnp.float32(0)).item()
    t = time.time()
    for _ in range(5):
        _ = _nop(jnp.float32(0)).item()
    rtt = (time.time() - t) / 5
    print(f"[ex] relay RTT {rtt * 1e3:.1f} ms", file=sys.stderr)

    n = args.n

    def measure(name, fn):
        @jax.jit
        def loop(s, lab):
            def body(_, chk):
                return fn(s, lab, chk)
            return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, s.dtype))
        t0 = time.time()
        _ = loop(g1, labels0).item()
        first = time.time() - t0
        t0 = time.time()
        _ = loop(g1, labels0).item()
        dt = (time.time() - t0 - rtt) / n
        print(f"{name:40s} {dt * 1e3:8.2f} ms/iter  (first {first:.1f}s)")

    def perturb_state(s, chk):
        return s.replace(active=s.active | (chk > 1e30))

    h = cfg.max_track_hits

    def p_cca(s, lab, chk):
        s = perturb_state(s, chk)
        out = cca.connected_components_fastsv(s, s.edge_mask & s.active)
        return out.sum().astype(s.dtype)

    def p_cca_gated(s, lab, chk):
        # fixed-round alternative; production is the adaptive fastsv
        # (see graph/cca.py round-4 notes)
        s = perturb_state(s, chk)
        labs, lab_ok, sizes = cca.connected_components_gated(
            s, s.edge_mask & s.active, max_size=h)
        return (labs.sum() + lab_ok.sum() + sizes.sum()).astype(s.dtype)

    def p_matrix(s, lab, chk):
        lab = lab + (chk > 1e30)
        mat, size, row_of_node = extract._candidate_matrix(
            s, lab, h, cfg.min_track_hits)
        return (mat.sum() + size.sum() + row_of_node.sum()).astype(s.dtype)

    def p_merge(s, lab, chk):
        lab = lab + (chk > 1e30)
        mat, size, _ = extract._candidate_matrix(s, lab, h, cfg.min_track_hits)
        coords, valid_m, can_process, n_pairs = extract._proximity_merge(
            s, cfg, mat, size)
        return coords.sum() + can_process.sum().astype(s.dtype)

    def p_full(s, lab, chk):
        lab = lab + (chk > 1e30)
        res = extract.extract_candidates(s, cfg, lab)
        return (res.pval_xy.sum() + res.acc_count.astype(s.dtype)
                + res.acc_nodes.sum().astype(s.dtype))

    def p_full_apply(s, lab, chk):
        lab = lab + (chk > 1e30)
        res = extract.extract_candidates(s, cfg, lab)
        out = extract.apply_extraction(s, res, cfg)
        return (out.node_mask.sum() + out.active.sum()).astype(s.dtype)

    def p_full_devcca(s, lab, chk):
        s = perturb_state(s, chk)
        res = extract.extract_candidates(s, cfg, None)
        out = extract.apply_extraction(s, res, cfg)
        return (out.node_mask.sum() + out.active.sum()).astype(s.dtype)

    def p_sort(s, lab, chk):
        lab = lab + (chk > 1e30)
        alive = s.node_mask
        big = jnp.int32(s.num_padded_nodes)
        l2 = jnp.where(alive, lab, big)
        order = jnp.lexsort((-s.xyzr[:, 3], l2))
        return order.sum().astype(s.dtype)

    def p_kf(s, lab, chk):
        # rotate + KF fit from a fixed candidate matrix (coords perturbed
        # by chk so the loop body is not hoisted)
        lab = lab + (chk > 1e30)
        mat, size, _ = extract._candidate_matrix(s, lab, h, cfg.min_track_hits)
        coords, valid_m, can_process, _ = extract._proximity_merge(
            s, cfg, mat, size)
        n_hits = jnp.sum(valid_m, axis=1)
        coords_r = extract._rotate_tracks(coords, valid_m, n_hits, cfg)
        pxy, pzr = extract._kf_fit(coords_r, valid_m, n_hits, cfg)
        return (pxy.sum() + pzr.sum()).astype(s.dtype)

    measure("device CCA (fastsv)", p_cca)
    measure("device CCA (gated, alternative)", p_cca_gated)
    measure("lexsort only", p_sort)
    measure("candidate matrix (lexsort)", p_matrix)
    measure("  + proximity merge", p_merge)
    measure("  + rotate + KF fit", p_kf)
    measure("extract_candidates (given labels)", p_full)
    measure("  + apply", p_full_apply)
    measure("extract+apply (device CCA)", p_full_devcca)


if __name__ == "__main__":
    main()
