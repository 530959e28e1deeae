"""Micro-profile of the extrapolation stage's constituent memory patterns.

Times each sub-block of ops/extrapolate.message_passing and the
priors/reweight chain in isolation (fused fori_loop inside one jit, scalar
checksum to force completion, relay RTT subtracted — CLAUDE.md
methodology).  A tiny checksum-dependent perturbation is threaded through
each iteration so XLA cannot hoist the body out of the loop.

Usage: PYTHONPATH=/root/repo python tools/profile_extrap_parts.py [--n 20]
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
    from gnn_track_finding_tpu.ops import extrapolate, linalg, priors

    cfg = PipelineConfig(min_volume=args.volumes[0],
                         max_volume=args.volumes[1])
    dtype = jnp.float32
    g, _ = trackml.load_event(trackml.DEFAULT_EVENT, cfg, dtype=dtype)
    print(f"[parts] N={g.num_padded_nodes} E={g.num_padded_edges} "
          f"K={g.max_degree} L={g.n_layers} backend={jax.default_backend()}",
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
    print(f"[parts] relay RTT {rtt * 1e3:.1f} ms", file=sys.stderr)

    n = args.n

    def measure(name, fn):
        """fn: (GraphState, chk scalar) -> new chk scalar."""
        @jax.jit
        def loop(s):
            def body(_, chk):
                return fn(s, chk)
            return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, s.dtype))
        t0 = time.time()
        _ = loop(g1).item()
        first = time.time() - t0
        t0 = time.time()
        _ = loop(g1).item()
        dt = (time.time() - t0 - rtt) / n
        print(f"{name:34s} {dt * 1e3:8.2f} ms/iter  (first {first:.1f}s)")

    def perturb(x, chk):
        # data dependency on the loop carry; numerically a no-op at f32
        return x + (chk * 1e-30).astype(x.dtype)

    # ---- individual memory patterns -------------------------------------
    def p_packed_gather(s, chk):
        packed = jnp.concatenate([
            perturb(s.merged_state, chk), s.merged_cov.reshape(-1, 9),
            s.has_merged[:, None].astype(s.dtype), s.gnn_xyzr], axis=1)
        pe = packed[s.src]
        return pe.sum()

    def p_dst_gather(s, chk):
        return perturb(s.gnn_xyzr, chk)[s.dst].sum()

    def p_cum_table(s, chk):
        otab = s.out_edges
        proc_slot = jnp.zeros(otab.shape, bool).at[s.src, s.slot_out].max(
            s.edge_mask & s.active)
        proc_slot = proc_slot & s.has_merged[:, None] & (otab >= 0)
        head = s.out_head_xyzr
        node_xyzr = perturb(s.gnn_xyzr, chk)
        a_n = s.merged_state[:, 0:1]
        b_n = s.merged_state[:, 1:2]
        dr_t = head[..., 3] - node_xyzr[:, 3:4]
        dz_t = head[..., 2] - node_xyzr[:, 2:3]
        hyp_t = jnp.sqrt(dr_t * dr_t + dz_t * dz_t)
        sin_t_t = jnp.abs(dr_t) / jnp.maximum(hyp_t, linalg.tiny(s.dtype))
        kappa_t = (2.0 * a_n) / (1.0 + (2.0 * a_n * head[..., 0] + b_n) ** 2) ** 1.5
        vms_t = sin_t_t * cfg.ms_coefficient() * kappa_t * kappa_t
        endcap_t = jnp.abs(node_xyzr[:, 2:3]) >= cfg.endcap_boundary
        vms_t = jnp.where(endcap_t, vms_t * jnp.abs(dr_t) / jnp.abs(dz_t), vms_t)
        slot_ms = jnp.where(proc_slot, vms_t, 0.0)
        cum = jnp.cumsum(slot_ms, axis=1)
        from gnn_track_finding_tpu.ops import gtools
        k_tab = otab.shape[1]
        cum_e = gtools.gather1d(cum.reshape(-1), s.src * k_tab + s.slot_out)
        return cum_e.sum() + cum[:, -1].sum()

    def p_edge_math(s, chk):
        # Jacobian + transport + KF on synthetic per-edge inputs (no gathers)
        E = s.num_padded_edges
        base = perturb(jnp.ones((E,), s.dtype) * 0.1, chk)
        a = base * 0.01
        b = base * 0.5
        c = base
        x_A = base * 30.0
        sp = base * 0.3
        cp = 1.0 - base * 0.05
        merged = jnp.stack([a, b, c], -1)
        cov = jnp.eye(3, dtype=s.dtype)[None] * base[:, None, None]
        F = extrapolate._jacobian_and_transport(a, b, c, x_A, sp, cp)
        extrp = linalg.mat3_vec(F, merged)
        extrp_cov = linalg.sandwich3(F, cov)
        S = extrp_cov[:, 2, 2] + cfg.sigma0xy ** 2
        chi2 = extrp[:, 2] * extrp[:, 2] / S
        lik = (2 * jnp.pi * jnp.abs(S)) ** -0.5 * jnp.exp(-0.5 * chi2)
        x_pred = linalg.mat3_vec(F, extrp)
        P_pred = linalg.sandwich3(F, extrp_cov)
        Sk = P_pred[:, 2, 2] + cfg.sigma0xy ** 2
        K = P_pred[:, :, 2] / Sk[:, None]
        x_post = x_pred + K * (0.0 - x_pred[:, 2])[:, None]
        ikh = jnp.eye(3, dtype=s.dtype) - K[:, :, None] * jnp.array(
            [0.0, 0.0, 1.0], s.dtype)[None, None, :]
        P_post = linalg.sandwich3(ikh, P_pred)
        return x_post.sum() + P_post.sum() + lik.sum()

    def p_final_wheres(s, chk):
        sel = s.active & s.edge_mask
        new = perturb(s.upd_sv, chk)
        out = (jnp.where(sel[:, None], new, s.upd_sv).sum()
               + jnp.where(sel[:, None, None], s.upd_cov + 1, s.upd_cov).sum()
               + jnp.where(sel[:, None], s.upd_joint + 1, s.upd_joint).sum()
               + jnp.where(sel[:, None, None], s.upd_joint_cov + 1,
                           s.upd_joint_cov).sum())
        return out

    def p_priors(s, chk):
        s = s.replace(upd_weight=perturb(s.upd_weight, chk))
        s = priors.compute_prior_probabilities(s, True)
        return s.upd_prior.sum()

    def p_side_norms(s, chk):
        s = s.replace(upd_xyzr=perturb(s.upd_xyzr, chk))
        return priors._side_norms(s).sum()

    def p_reweight(s, chk):
        s = s.replace(upd_weight=perturb(s.upd_weight, chk))
        s = priors.reweight(s, cfg)
        return s.upd_weight.sum() + s.active.sum().astype(s.dtype)

    def p_mp(s, chk):
        s = s.replace(merged_state=perturb(s.merged_state, chk))
        out = extrapolate.message_passing(s, cfg)
        return out.upd_sv.sum() + out.active.sum().astype(s.dtype)

    def p_prior_reweight_edge(s, chk):
        s = s.replace(upd_weight=perturb(s.upd_weight, chk))
        s = priors.prior_reweight(s, cfg, edge_distinct=True)
        return s.upd_weight.sum() + s.active.sum().astype(s.dtype)

    def p_prior_reweight_table(s, chk):
        s = s.replace(upd_weight=perturb(s.upd_weight, chk))
        s = priors.prior_reweight(s, cfg, edge_distinct=False)
        return s.upd_weight.sum() + s.active.sum().astype(s.dtype)

    def p_stage(s, chk):
        s = s.replace(merged_state=perturb(s.merged_state, chk))
        out = pipeline.extrapolation_stage(s, cfg)
        return out.upd_sv.sum() + out.active.sum().astype(s.dtype)

    def p_degrees(s, chk):
        s = s.replace(upd_weight=perturb(s.upd_weight, chk))
        return priors.update_degrees(s).degree.sum().astype(s.dtype)

    def p_mp_pr_rw(s, chk):
        s = s.replace(merged_state=perturb(s.merged_state, chk))
        s = extrapolate.message_passing(s, cfg)
        s = priors.compute_prior_probabilities(s, True)
        s = priors.reweight(s, cfg)
        return s.upd_sv.sum() + s.active.sum().astype(s.dtype)

    def p_two_rw(s, chk):
        s = s.replace(upd_weight=perturb(s.upd_weight, chk))
        s = priors.compute_prior_probabilities(s, True)
        s = priors.reweight(s, cfg)
        s = priors.compute_prior_probabilities(s, True)
        s = priors.reweight(s, cfg)
        return s.upd_weight.sum() + s.active.sum().astype(s.dtype)

    def p_stage_table(s, chk):
        s = s.replace(merged_state=perturb(s.merged_state, chk))
        s = extrapolate.message_passing(s, cfg)
        s = priors.prior_reweight(s, cfg, edge_distinct=False)
        s = priors.prior_reweight(s, cfg, edge_distinct=False)
        s = priors.update_degrees(s)
        return s.upd_sv.sum() + s.active.sum().astype(s.dtype)

    def p_stage_edge(s, chk):
        s = s.replace(merged_state=perturb(s.merged_state, chk))
        s = extrapolate.message_passing(s, cfg)
        s = priors.prior_reweight(s, cfg, edge_distinct=True)
        s = priors.prior_reweight(s, cfg, edge_distinct=True)
        s = priors.update_degrees(s)
        return s.upd_sv.sum() + s.active.sum().astype(s.dtype)

    def p_reweight_stage(s, chk):
        s = s.replace(upd_weight=perturb(s.upd_weight, chk))
        s = priors.reweight_stage(s, cfg, n_passes=2)
        return s.upd_weight.sum() + s.active.sum().astype(s.dtype)

    def p_reweight_stage1(s, chk):
        s = s.replace(upd_weight=perturb(s.upd_weight, chk))
        s = priors.reweight_stage(s, cfg, n_passes=1)
        return s.upd_weight.sum() + s.active.sum().astype(s.dtype)

    def p_stage_old(s, chk):
        s = s.replace(merged_state=perturb(s.merged_state, chk))
        s = extrapolate.message_passing(s, cfg)
        s = priors.prior_reweight(s, cfg)
        s = priors.prior_reweight(s, cfg)
        s = priors.update_degrees(s)
        return s.upd_sv.sum() + s.active.sum().astype(s.dtype)

    def p_reweight_scatters(s, chk):
        member = s.has_updated & s.active & s.edge_mask
        n_ = s.num_padded_nodes
        ktab = s.in_edges.shape[1]
        xs = perturb(s.upd_xyzr[:, 0], chk)
        row = jnp.where(member, s.dst, n_)
        x_tab = jnp.full((n_, ktab), jnp.inf, s.dtype).at[
            row, s.slot_in].set(xs, mode="drop")
        wl_tab = jnp.zeros((n_, ktab), s.dtype).at[row, s.slot_in].set(
            s.upd_weight * s.upd_likelihood, mode="drop")
        lik_tab = jnp.zeros((n_, ktab), s.dtype).at[row, s.slot_in].set(
            s.upd_likelihood, mode="drop")
        act_tab = jnp.zeros((n_, ktab), bool).at[s.dst, s.slot_in].max(
            s.edge_mask & s.active)
        return (x_tab.sum() + wl_tab.sum() + lik_tab.sum()
                + act_tab.sum().astype(s.dtype))

    def p_reweight_lookups(s, chk):
        from gnn_track_finding_tpu.ops import gtools
        tab = perturb(s.out_head_xyzr[..., 0], chk)   # any (N, K) f32
        a = gtools.table_lookup(tab, s.dst, s.slot_in)
        b = gtools.table_lookup(tab * 2.0, s.dst, s.slot_in)
        return a.sum() + b.sum()

    measure("FULL extrapolation_stage", p_stage)
    measure("stage (old 2x prior_reweight)", p_stage_old)
    measure("reweight_stage x2 (table-res)", p_reweight_stage)
    measure("reweight_stage x1 (table-res)", p_reweight_stage1)
    measure("  reweight scatter-in (4 tabs)", p_reweight_scatters)
    measure("  reweight lookup-out (2 f32)", p_reweight_lookups)
    measure("  mp cum-table block", p_cum_table)
    measure("stage (table distinct)", p_stage_table)
    measure("stage (edge distinct)", p_stage_edge)
    measure("prior_reweight (edge distinct)", p_prior_reweight_edge)
    measure("prior_reweight (table distinct)", p_prior_reweight_table)
    measure("message_passing", p_mp)
    measure("  packed[src] gather (E,17)", p_packed_gather)
    measure("  gnn_xyzr[dst] gather (E,4)", p_dst_gather)
    measure("  edge math (jac+KF, no mem)", p_edge_math)
    measure("  final where writes", p_final_wheres)


if __name__ == "__main__":
    main()
