"""Compare clustering backends (XLA masked-batch vs Pallas VMEM kernel)
on the real TPU at full-event scale, plus the stage bits around them.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_cluster_backends.py
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
    from gnn_track_finding_tpu.ops import clustering

    cfg = PipelineConfig(min_volume=args.volumes[0],
                         max_volume=args.volumes[1])
    g, _ = trackml.load_event(trackml.DEFAULT_EVENT, cfg, dtype=jnp.float32)
    print(f"[clb] N={g.num_padded_nodes} E={g.num_padded_edges} "
          f"backend={jax.default_backend()}", file=sys.stderr)
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
    n = args.n

    def measure(name, fn, state):
        @jax.jit
        def loop(s):
            def body(_, st):
                return fn(st)
            out = jax.lax.fori_loop(0, n, body, s)
            return out.merged_state.sum() + out.active.sum().astype(out.dtype)
        t0 = time.time()
        _ = loop(state).item()
        first = time.time() - t0
        t0 = time.time()
        _ = loop(state).item()
        dt = (time.time() - t0 - rtt) / n
        print(f"{name:36s} {dt * 1e3:8.2f} ms/iter  (first {first:.1f}s)")

    from gnn_track_finding_tpu.ops import priors

    # cluster() never writes its own INPUTS (it reads has_updated/edge_mask/
    # upd_*/seed_* and writes merged_*/active), so a plain state-threaded
    # loop lets XLA hoist the whole kernel out and read ~n_rep-fold too
    # fast (the round-2 "7.8 ms" pallas reading).  Perturb the prior the
    # kernel consumes with a carry-dependent no-op.
    def dep_seed(s):
        f = (s.merged_state.sum() < 2.0 ** 100).astype(s.dtype)
        return s.replace(seed_prior=s.seed_prior * f)

    def dep_upd(s):
        f = (s.merged_state.sum() < 2.0 ** 100).astype(s.dtype)
        return s.replace(upd_prior=s.upd_prior * f)

    measure("cluster xla (seed)",
            lambda s: clustering.cluster(dep_seed(s), cfg, False, backend="xla"), g)
    measure("cluster pallas (seed)",
            lambda s: clustering.cluster(dep_seed(s), cfg, False, backend="pallas"), g)
    measure("cluster xla (updated)",
            lambda s: clustering.cluster(dep_upd(s), cfg, True, backend="xla"), g1)
    measure("cluster pallas (updated)",
            lambda s: clustering.cluster(dep_upd(s), cfg, True, backend="pallas"), g1)
    # the stage tail around the kernel (pipeline.cluster_stage).  These
    # read-only passes must be made carry-DEPENDENT or XLA hoists them
    # out of the timing fori_loop (the same artifact bench_cca had):
    # thread the previous iteration's degree into the active mask.
    def dep(s):
        return s.replace(active=s.active & (s.degree.sum() < 2 ** 30))

    measure("tail: update_degrees",
            lambda s: priors.update_degrees(dep(s)), g1)
    measure("tail: + mixture_weights", lambda s: priors.compute_mixture_weights(
        priors.update_degrees(dep(s)), True), g1)
    measure("tail: + prior_probabilities", lambda s: priors.compute_prior_probabilities(
        priors.compute_mixture_weights(priors.update_degrees(dep(s)), True), True), g1)
    measure("cluster_stage (updated, full)",
            lambda s: pipeline.cluster_stage(s, cfg, True), g1)
    # lane-tile sweep for the pallas kernel
    for t in (256, 1024, 2048):
        measure(f"cluster pallas tile={t}",
                lambda s, t=t: clustering.cluster(dep_upd(s), cfg, True,
                                                  backend="pallas",
                                                  pallas_tile=t), g1)


if __name__ == "__main__":
    main()
