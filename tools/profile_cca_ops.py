"""Per-op breakdown of one FastSV CCA round at full-event scale.

The round (graph/cca.py connected_components_fastsv body) is:
  2 edge-sized label gathers  ->  1 edge-sized scatter-min
  ->  `jumps` node-sized shortcut double-gathers  ->  any-reduce.
This tool times each piece in isolation (carry-dependent loop bodies so
XLA cannot hoist the measured op — CLAUDE.md "Measurement discipline").

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_cca_ops.py
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
    from gnn_track_finding_tpu.models import pipeline
    from gnn_track_finding_tpu.ops import gtools

    cfg = PipelineConfig(min_volume=7, max_volume=14)
    g, _ = trackml.load_event(trackml.DEFAULT_EVENT, cfg, dtype=jnp.float32)
    g = pipeline._prepare_jit(g, cfg)
    g1 = pipeline._stage_jit(g, cfg, 1, None)
    ok_full = g1.edge_mask & g1.active
    n = g1.num_padded_nodes
    a = g1.src[0::2]
    b = g1.dst[0::2]
    ok = ok_full[0::2] | ok_full[1::2]
    e = a.shape[0]
    print(f"[cca-ops] N={n} Epairs={e} backend={jax.default_backend()}",
          file=sys.stderr)

    @jax.jit
    def _nop(x):
        return x + 1
    _nop(jnp.int32(0)).item()
    rtts = []
    for _ in range(8):
        t = time.time()
        _nop(jnp.int32(0)).item()
        rtts.append(time.time() - t)
    rtt = min(rtts)
    print(f"[cca-ops] rtt {rtt * 1e3:.1f} ms", file=sys.stderr)

    n_rep = 40
    f_init = jnp.arange(n, dtype=jnp.int32)

    def timeit(name, build):
        """build(dep_scalar) -> int32 scalar consumed as next dep."""
        @jax.jit
        def loop():
            def body(i, acc):
                return build(acc) % jnp.int32(2 ** 20)
            return jax.lax.fori_loop(0, n_rep, body, jnp.int32(0))
        chk = loop().item()
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            chk = loop().item()
            best = min(best, time.time() - t0)
        dt = (best - rtt) / n_rep
        print(f"{name:28s} {dt * 1e3:8.3f} ms   (chk {chk})")
        return dt

    big = jnp.int32(n)

    # dep(acc) perturbs an input the measured op consumes with a bit XLA
    # cannot constant-fold (acc stays < 2^20 by construction, so the
    # perturbation is always +0 at runtime but not provably so)
    def dep_f(acc):
        return f_init + (acc >= jnp.int32(2 ** 30)).astype(jnp.int32)

    # checksums reduce per-element & 0xFF before summing: label values run
    # to ~57k, so a raw int32 sum over ~172k elements wraps and the printed
    # chk becomes platform noise (ADVICE.md round 3); masked sums stay
    # < 2^26 and reproduce across runs
    def chksum(arr):
        return (arr & jnp.int32(0xFF)).sum()

    timeit("edge gather x2 (f[a],f[b])", lambda acc: (
        chksum(gtools.gather1d(dep_f(acc), a))
        + chksum(gtools.gather1d(dep_f(acc), b))))

    timeit("edge gather x1", lambda acc: chksum(gtools.gather1d(dep_f(acc), a)))

    def scat(acc):
        f = dep_f(acc)
        lo = jnp.where(ok, jnp.minimum(a, b), big)
        hi = jnp.where(ok, jnp.maximum(a, b), 0)
        return chksum(f.at[hi].min(lo))
    timeit("edge scatter-min", scat)

    def shortcut2(acc):
        f = dep_f(acc)
        f = gtools.gather1d(f, f)
        f = gtools.gather1d(f, f)
        return chksum(f)
    timeit("node shortcut x2 (j=2)", shortcut2)

    timeit("any-reduce", lambda acc: (dep_f(acc) != f_init - 1).any()
           .astype(jnp.int32) + acc)

    def full_round(acc):
        f = dep_f(acc)
        fa = gtools.gather1d(f, a)
        fb = gtools.gather1d(f, b)
        lo = jnp.where(ok, jnp.minimum(fa, fb), big)
        hi = jnp.where(ok, jnp.maximum(fa, fb), 0)
        new = f.at[hi].min(lo)
        new = gtools.gather1d(new, new)
        new = gtools.gather1d(new, new)
        return chksum(new) + jnp.any(new != f).astype(jnp.int32)
    timeit("full fastsv round", full_round)


if __name__ == "__main__":
    main()
