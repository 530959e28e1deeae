"""Block-level profile of the two remaining hot paths: the fused
prior_reweight pass (ops/priors.py) and the cluster() wrapper around the
Pallas kernel (ops/clustering.py).

Same methodology as profile_stages.py: fused fori_loop inside one jit,
scalar checksum .item() to force completion, relay RTT subtracted.

Usage: PYTHONPATH=/root/repo python tools/profile_hot_parts.py [--n 20]
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
    from gnn_track_finding_tpu.models import pipeline
    from gnn_track_finding_tpu.ops import clustering, extrapolate, gtools, priors

    cfg = PipelineConfig(min_volume=args.volumes[0],
                         max_volume=args.volumes[1])
    g, _ = trackml.load_event(trackml.DEFAULT_EVENT, cfg, dtype=jnp.float32)
    g = pipeline._prepare_jit(g, cfg)
    g1 = pipeline._stage_jit(g, cfg, 1, None)
    g2 = jax.jit(extrapolate.message_passing, static_argnums=1)(g1, cfg)
    print(f"[hot] N={g2.num_padded_nodes} E={g2.num_padded_edges} "
          f"K={g2.max_degree} L={g2.n_layers} backend={jax.default_backend()}",
          file=sys.stderr)

    @jax.jit
    def _nop(x):
        return x + 1.0
    _ = _nop(jnp.float32(0)).item()
    t = time.time()
    for _ in range(5):
        _ = _nop(jnp.float32(0)).item()
    rtt = (time.time() - t) / 5
    print(f"[hot] relay RTT {rtt * 1e3:.1f} ms", file=sys.stderr)

    n = args.n

    def measure(name, fn, state):
        @jax.jit
        def loop(s):
            def body(_, chk):
                return fn(s, chk)
            return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, s.dtype))
        t0 = time.time()
        _ = loop(state).item()
        first = time.time() - t0
        t0 = time.time()
        _ = loop(state).item()
        dt = (time.time() - t0 - rtt) / n
        print(f"{name:38s} {dt * 1e3:8.2f} ms/iter  (first {first:.1f}s)")

    def perturb(x, chk):
        return x + (chk * 1e-30).astype(x.dtype)

    # ---------------- prior_reweight internals ----------------
    def pr_scatters(s, chk):
        member = s.has_updated & s.active & s.edge_mask
        ok_slot = jnp.zeros(s.in_edges.shape, bool).at[s.dst, s.slot_in].max(member)
        xs = perturb(s.upd_xyzr[:, 0], chk)
        row = jnp.where(member, s.dst, s.in_edges.shape[0])
        x_slot = jnp.zeros(s.in_edges.shape, s.dtype).at[row, s.slot_in].set(
            xs, mode="drop")
        return x_slot.sum() + ok_slot.sum().astype(s.dtype)

    def pr_count_nl(s, chk):
        member = s.has_updated & s.active & s.edge_mask
        ok_slot = jnp.zeros(s.in_edges.shape, bool).at[s.dst, s.slot_in].max(member)
        ok_slot = ok_slot & (perturb(s.upd_xyzr[:, 0], chk)[0] < 1e30)
        count_nl = jnp.stack(
            [jnp.sum(ok_slot & (s.in_src_layer == l), axis=1)
             for l in range(s.n_layers)], axis=1).astype(s.dtype)
        return count_nl.sum()

    def pr_distinct(s, chk):
        member = s.has_updated & s.active & s.edge_mask
        ok_slot = jnp.zeros(s.in_edges.shape, bool).at[s.dst, s.slot_in].max(member)
        xs = perturb(s.upd_xyzr[:, 0], chk)
        row = jnp.where(member, s.dst, s.in_edges.shape[0])
        x_slot = jnp.zeros(s.in_edges.shape, s.dtype).at[row, s.slot_in].set(
            xs, mode="drop")
        left_slot = x_slot < s.gnn_xyzr[:, 0][:, None]
        counts2 = priors._distinct_counts(ok_slot, x_slot, left_slot, s.dtype)
        return counts2.sum()

    def pr_packed_gather(s, chk):
        n_l = s.n_layers
        table = perturb(jnp.ones((s.num_padded_nodes, n_l + 4), s.dtype), chk)
        pe = table[s.dst]
        count_e = jnp.take_along_axis(pe[:, :n_l], s.e_src_layer[:, None], 1)[:, 0]
        side = (s.upd_xyzr[:, 0] > 0).astype(jnp.int32)
        norms = jnp.take_along_axis(pe[:, n_l + 2:n_l + 4], side[:, None], 1)[:, 0]
        return count_e.sum() + pe[:, n_l].sum() + norms.sum()

    def pr_denom(s, chk):
        member = s.has_updated & s.active & s.edge_mask
        wl = jnp.where(member, perturb(s.upd_weight, chk) * s.upd_likelihood, 0.0)
        denom = jax.ops.segment_sum(wl, s.dst, s.num_padded_nodes)
        return denom.sum()

    def pr_full(s, chk):
        s = s.replace(upd_weight=perturb(s.upd_weight, chk))
        out = priors.prior_reweight(s, cfg)
        return out.upd_weight.sum() + out.active.sum().astype(s.dtype)

    measure("prior_reweight FULL", pr_full, g2)
    measure("  table scatters (ok+x)", pr_scatters, g2)
    measure("  count_nl (L-loop)", pr_count_nl, g2)
    measure("  distinct counts (N,K,K)", pr_distinct, g2)
    measure("  packed (E,L+4) gather+take", pr_packed_gather, g2)
    measure("  denom segment_sum", pr_denom, g2)

    # ---------------- cluster() wrapper internals ----------------
    kc = clustering.KC

    def cl_member_compact(s, chk):
        member = (s.has_updated & s.edge_mask) & s.edge_mask
        member = member & (perturb(s.upd_weight, chk) < 1e30)
        member_slot = clustering._member_slots(s, member)
        tab, count = clustering._compact_member_edges(s, member_slot, kc)
        return tab.sum().astype(s.dtype) + count.sum().astype(s.dtype)

    def cl_pk_gather(s, chk):
        member = (s.has_updated & s.edge_mask) & s.edge_mask
        member_slot = clustering._member_slots(s, member)
        tab, count = clustering._compact_member_edges(s, member_slot, kc)
        e = jnp.maximum(tab, 0)
        packed = jnp.concatenate([
            perturb(s.upd_sv, chk), s.upd_cov.reshape(-1, 9), s.upd_joint,
            s.upd_joint_cov.reshape(-1, 9), s.upd_prior[:, None],
            s.upd_xyzr], axis=1)
        pk = packed[e]
        return pk.sum()

    def cl_transposes(s, chk):
        nn = s.num_padded_nodes
        pk = perturb(jnp.ones((nn, kc, 29), s.dtype), chk)
        j_sv = pk[..., 12:15]
        j_cov = pk[..., 15:24]
        p_sv = pk[..., 0:3]
        p_cov = pk[..., 3:12]
        prior = pk[..., 24]
        nb = pk[..., 25:29]
        t = lambda x, r: jnp.moveaxis(x, 0, -1).reshape(r, nn)
        outs = (t(j_sv, 3 * kc), t(j_cov, 9 * kc), t(p_sv, 3 * kc),
                t(p_cov, 9 * kc), t(prior[..., None], kc), t(nb, 4 * kc))
        return sum(o.sum() for o in outs)

    def cl_kernel_only(s, chk):
        member = (s.has_updated & s.edge_mask) & s.edge_mask
        member_slot = clustering._member_slots(s, member)
        tab, count = clustering._compact_member_edges(s, member_slot, kc)
        valid = tab >= 0
        e = jnp.maximum(tab, 0)
        packed = jnp.concatenate([
            perturb(s.upd_sv, chk), s.upd_cov.reshape(-1, 9), s.upd_joint,
            s.upd_joint_cov.reshape(-1, 9), s.upd_prior[:, None],
            s.upd_xyzr], axis=1)
        pk = packed[e]
        from gnn_track_finding_tpu.ops import pallas_cluster
        nn = s.num_padded_nodes
        t = lambda x, r: jnp.moveaxis(x, 0, -1).reshape(r, nn)
        gate = (count > cfg.cluster_min_edges - 1) & (count < cfg.cluster_max_edges + 1)
        chi2_thr, kl_thr = cfg.cluster_thresholds(True)
        klthr_arr = jnp.broadcast_to(jnp.asarray(kl_thr, s.dtype), (nn,))[None, :]
        found_i, pm_t, pc_t, mprior_t, deact_t = pallas_cluster.cluster_tile(
            cfg, float(chi2_thr),
            t(pk[..., 12:15], 3 * kc), t(pk[..., 15:24], 9 * kc),
            t(pk[..., 0:3], 3 * kc), t(pk[..., 3:12], 9 * kc),
            t(pk[..., 24][..., None], kc), t(valid[..., None].astype(jnp.int32), kc),
            t(pk[..., 25:29], 4 * kc), s.xyzr.T.astype(s.dtype),
            gate.astype(jnp.int32)[None, :], klthr_arr)
        return pm_t.sum() + found_i.sum().astype(s.dtype)

    def cl_apply(s, chk):
        member = (s.has_updated & s.edge_mask) & s.edge_mask
        member_slot = clustering._member_slots(s, member)
        nn = s.num_padded_nodes
        found = s.has_merged
        pm = perturb(s.merged_state, chk)
        pc = s.merged_cov
        mprior = s.merged_prior
        deact_slot = member_slot & found[:, None]
        out = clustering._apply_cluster_results(s, cfg, member_slot, found,
                                                pm, pc, mprior,
                                                deact_slot[:, :kc], kc)
        return out.merged_state.sum() + out.active.sum().astype(s.dtype)

    def cl_full(s, chk):
        s = s.replace(upd_weight=perturb(s.upd_weight, chk))
        out = clustering.cluster(s, cfg, True)
        return out.merged_state.sum() + out.active.sum().astype(s.dtype)

    measure("cluster FULL (updated)", cl_full, g2)
    measure("  member+compact (argsort)", cl_member_compact, g2)
    measure("  pk row gather (N,16,29)", cl_pk_gather, g2)
    measure("  transposes to node-minor", cl_transposes, g2)
    measure("  ... + pallas kernel", cl_kernel_only, g2)
    measure("  apply (3 table_lookups)", cl_apply, g2)


if __name__ == "__main__":
    main()
