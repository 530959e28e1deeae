"""Device-CCA variant study at full event: rounds and ms per variant.

Variants over the fastsv baseline (graph/cca.py):
  * table-init: seed labels with min-over-static-neighbour-ids (one
    (N, K) pass from the static in/out id tables + an active scatter)
    before the edge rounds;
  * deeper shortcutting (3 or 4 double-jumps per round);
  * aggressive hooking (additionally hook the grandparents).

Usage: PYTHONPATH=/root/repo python tools/profile_cca_variants.py
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time


def main() -> None:
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
    from gnn_track_finding_tpu.ops import gtools

    cfg = PipelineConfig(min_volume=7, max_volume=14)
    g, _ = trackml.load_event(trackml.DEFAULT_EVENT, cfg, dtype=jnp.float32)
    g = pipeline._prepare_jit(g, cfg)
    g1 = pipeline._stage_jit(g, cfg, 1, None)
    print(f"[cca] N={g1.num_padded_nodes} E={g1.num_padded_edges} "
          f"backend={jax.default_backend()}", file=sys.stderr)

    @jax.jit
    def _nop(x):
        return x + 1.0
    _ = _nop(jnp.float32(0)).item()
    t = time.time()
    for _ in range(5):
        _ = _nop(jnp.float32(0)).item()
    rtt = (time.time() - t) / 5
    print(f"[cca] relay RTT {rtt * 1e3:.1f} ms", file=sys.stderr)

    n_rep = 5

    def variant(g, edge_ok, *, table_init=False, jumps=2, aggressive=False):
        n = g.node_mask.shape[0]
        a = g.src[0::2]
        b = g.dst[0::2]
        ok = edge_ok[0::2] | edge_ok[1::2]
        init = jnp.arange(n, dtype=jnp.int32)
        big = jnp.int32(n)

        if table_init:
            in_e = jnp.maximum(g.in_edges, 0)
            out_e = jnp.maximum(g.out_edges, 0)
            in_ok = jnp.zeros(g.in_edges.shape, bool).at[
                g.dst, g.slot_in].max(edge_ok) & (g.in_edges >= 0)
            out_ok = jnp.zeros(g.out_edges.shape, bool).at[
                g.src, g.slot_out].max(edge_ok) & (g.out_edges >= 0)
            in_nb = gtools.gather1d(g.src, in_e)
            out_nb = gtools.gather1d(g.dst, out_e)
            l_in = jnp.where(in_ok, in_nb, big).min(axis=1)
            l_out = jnp.where(out_ok, out_nb, big).min(axis=1)
            f0 = jnp.minimum(init, jnp.minimum(l_in, l_out))
        else:
            f0 = init

        def body(state):
            f, _, rounds = state
            fa = gtools.gather1d(f, a)
            fb = gtools.gather1d(f, b)
            lo_e = jnp.where(ok, jnp.minimum(fa, fb), big)
            new = f.at[fa].min(lo_e)
            new = new.at[fb].min(lo_e)
            if aggressive:
                ga = gtools.gather1d(f, fa)
                gb = gtools.gather1d(f, fb)
                new = new.at[ga].min(lo_e)
                new = new.at[gb].min(lo_e)
            for _ in range(jumps):
                new = gtools.gather1d(new, gtools.gather1d(new, new))
            return new, jnp.any(new != f), rounds + 1

        labels, _, rounds = jax.lax.while_loop(
            lambda s: s[1], body, (f0, jnp.bool_(True), jnp.int32(0)))
        return jnp.where(g.node_mask, labels, init), rounds

    def measure(name, **kw):
        @jax.jit
        def loop(s):
            def body(_, carry):
                chk, rounds = carry
                lab, r = variant(
                    s.replace(active=s.active | (chk > 1e30)),
                    s.edge_mask & s.active, **kw)
                return lab.sum().astype(jnp.float32) * 1e-30, r
            return jax.lax.fori_loop(
                0, n_rep, body, (jnp.float32(0.0), jnp.int32(0)))
        t0 = time.time()
        _, r = loop(g1)
        r = r.item()
        first = time.time() - t0
        t0 = time.time()
        _, r2 = loop(g1)
        _ = r2.item()
        dt = (time.time() - t0 - rtt) / n_rep
        print(f"{name:44s} {dt * 1e3:8.2f} ms  rounds={r}  (first {first:.1f}s)")

    # correctness anchor
    ref = jax.jit(lambda s: cca.connected_components_fastsv(
        s, s.edge_mask & s.active))(g1)
    import numpy as np
    refn = np.asarray(ref)

    def check(name, **kw):
        lab, r = jax.jit(lambda s: variant(s, s.edge_mask & s.active, **kw))(g1)
        same = bool((np.asarray(lab) == refn).all())
        print(f"[cca] {name}: match={same} rounds={int(r)}", file=sys.stderr)

    import os
    variants = [
        ("fastsv j2 (baseline)", dict()),
        ("fastsv j3", dict(jumps=3)),
        ("fastsv j2 + table-init", dict(table_init=True)),
        ("fastsv j3 + table-init + aggressive",
         dict(table_init=True, jumps=3, aggressive=True)),
    ]
    do_check = os.environ.get("CCA_CHECK", "0") == "1"
    for name, kw in variants:
        if do_check:
            check(name, **kw)
        measure(name, **kw)


if __name__ == "__main__":
    main()
