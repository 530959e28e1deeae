"""Decompose the extrapolation-stage tail (priors+reweight x2 + degrees)
with the same state->state fused-loop methodology as profile_stages.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_reweight_parts.py
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
    from gnn_track_finding_tpu.ops import extrapolate, priors

    cfg = PipelineConfig(min_volume=args.volumes[0],
                         max_volume=args.volumes[1])
    g, _ = trackml.load_event(trackml.DEFAULT_EVENT, cfg, dtype=jnp.float32)
    g = pipeline._prepare_jit(g, cfg)
    g1 = pipeline._stage_jit(g, cfg, 1, None)
    # post-message-passing state: updated states present (realistic tail input)
    g2 = jax.jit(extrapolate.message_passing, static_argnums=1)(g1, cfg)
    print(f"[rw] N={g2.num_padded_nodes} E={g2.num_padded_edges} "
          f"backend={jax.default_backend()}", file=sys.stderr)

    @jax.jit
    def _nop(x):
        return x + 1.0
    _ = _nop(jnp.float32(0)).item()
    t = time.time()
    for _ in range(5):
        _ = _nop(jnp.float32(0)).item()
    rtt = (time.time() - t) / 5
    n = args.n

    def measure(name, fn, state):
        @jax.jit
        def loop(s):
            def body(_, st):
                return fn(st)
            out = jax.lax.fori_loop(0, n, body, s)
            return (out.upd_weight.sum() + out.upd_prior.sum()
                    + out.active.sum().astype(out.dtype)
                    + out.degree.sum().astype(out.dtype))
        t0 = time.time()
        _ = loop(state).item()
        first = time.time() - t0
        t0 = time.time()
        _ = loop(state).item()
        dt = (time.time() - t0 - rtt) / n
        print(f"{name:36s} {dt * 1e3:8.2f} ms/iter  (first {first:.1f}s)")

    measure("identity (loop overhead)", lambda s: s, g2)
    measure("prior(updated)",
            lambda s: priors.compute_prior_probabilities(s, True), g2)
    measure("reweight",
            lambda s: priors.reweight(s, cfg), g2)
    measure("update_degrees", priors.update_degrees, g2)
    measure("prior+reweight",
            lambda s: priors.reweight(
                priors.compute_prior_probabilities(s, True), cfg), g2)
    measure("full tail (pr+rw x2 + deg)",
            lambda s: priors.update_degrees(priors.reweight(
                priors.compute_prior_probabilities(
                    priors.reweight(priors.compute_prior_probabilities(
                        s, True), cfg), True), cfg)), g2)


if __name__ == "__main__":
    main()
