"""Micro-benchmark of two-index lookup lowerings at full-event scale.

Compares, for several table widths W:
  a) row gather + take_along_axis (current gtools.table_lookup)
  b) row gather + one-hot multiply-reduce (static iota compare)
  c) row gather + where-select chain (W unrolled)
and the candidate replacements for the argsort compaction and the
cum-var_ms lookup.

Usage: PYTHONPATH=/root/repo python tools/profile_lookup_forms.py
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
    import numpy as np

    N, E, K = 57344, 344064, 64
    rng = np.random.default_rng(0)
    row = jnp.asarray(rng.integers(0, N, E), jnp.int32)

    @jax.jit
    def _nop(x):
        return x + 1.0
    _ = _nop(jnp.float32(0)).item()
    t = time.time()
    for _ in range(5):
        _ = _nop(jnp.float32(0)).item()
    rtt = (time.time() - t) / 5
    print(f"[lk] relay RTT {rtt * 1e3:.1f} ms backend={jax.default_backend()}",
          file=sys.stderr)

    n_rep = 20

    def measure(name, fn, *args):
        @jax.jit
        def loop(*a):
            def body(_, chk):
                return fn(chk, *a)
            return jax.lax.fori_loop(0, n_rep, body, jnp.float32(0.0))
        t0 = time.time()
        _ = loop(*args).item()
        first = time.time() - t0
        t0 = time.time()
        _ = loop(*args).item()
        dt = (time.time() - t0 - rtt) / n_rep
        print(f"{name:44s} {dt * 1e3:8.2f} ms/iter (first {first:.1f}s)")

    for w in (2, 7, 8, 11, 16, 64):
        table = jnp.asarray(rng.standard_normal((N, w)), jnp.float32)
        col = jnp.asarray(rng.integers(0, w, E), jnp.int32)

        def f_take(chk, table, row, col):
            t2 = table + chk * 1e-30
            return jnp.take_along_axis(t2[row], col[:, None], axis=-1)[:, 0].sum()

        def f_onehot(chk, table, row, col):
            t2 = table + chk * 1e-30
            rows = t2[row]
            oh = col[:, None] == jnp.arange(w, dtype=col.dtype)[None, :]
            return jnp.sum(jnp.where(oh, rows, 0.0), axis=-1).sum()

        def f_direct(chk, table, row, col):
            t2 = table + chk * 1e-30
            return t2[row, col].sum()

        measure(f"W={w:2d} take_along", f_take, table, row, col)
        measure(f"W={w:2d} onehot-sum", f_onehot, table, row, col)
        measure(f"W={w:2d} direct [r,c]", f_direct, table, row, col)

    # ---- compaction: argsort vs cumsum-rank scatter ----
    member_slot = jnp.asarray(rng.random((N, K)) < 0.1)
    tab = jnp.asarray(rng.integers(0, E, (N, K)), jnp.int32)
    kc = 16

    def c_argsort(chk, member_slot, tab):
        ms = member_slot & (chk < 1e30)
        order = jnp.argsort(~ms, axis=1, stable=True)
        sorted_tab = jnp.take_along_axis(tab, order, axis=1)
        sorted_valid = jnp.take_along_axis(ms, order, axis=1)
        compact = jnp.where(sorted_valid, sorted_tab, -1)[:, :kc]
        return compact.sum().astype(jnp.float32)

    def c_rank_scatter(chk, member_slot, tab):
        ms = member_slot & (chk < 1e30)
        rank = jnp.cumsum(ms, axis=1) - 1              # (N, K)
        ok = ms & (rank < kc)
        rows = jnp.where(ok, jnp.arange(N, dtype=jnp.int32)[:, None], N)
        compact = jnp.full((N + 1, kc), -1, jnp.int32).at[
            rows, jnp.where(ok, rank, 0)].max(jnp.where(ok, tab, -1),
                                              mode="drop")[:N]
        return compact.sum().astype(jnp.float32)

    measure("compact: argsort+take_along", c_argsort, member_slot, tab)
    measure("compact: cumsum-rank scatter", c_rank_scatter, member_slot, tab)

    # ---- cum var_ms: width-8 regroup vs sorted segmented cumsum ----
    src = jnp.asarray(np.sort(rng.integers(0, N, E)), jnp.int32)
    slot = jnp.asarray(rng.integers(0, K, E), jnp.int32)
    var = jnp.asarray(rng.random(E), jnp.float32)
    order = jnp.asarray(rng.permutation(E), jnp.int32)    # stand-in static perm
    rank = jnp.asarray(np.argsort(np.asarray(order)), jnp.int32)
    is_start = jnp.asarray(rng.random(E) < 0.17)

    def v_width8(chk, var, src, slot):
        cum = jnp.cumsum(jnp.zeros((N, K), jnp.float32).at[src, slot].add(
            var + chk * 1e-30), axis=1)
        idx = src * K + slot
        cum_e = jnp.take_along_axis(
            cum.reshape(-1, 8)[idx // 8], (idx % 8)[:, None], 1)[:, 0]
        return cum_e.sum()

    def v_width8_oh(chk, var, src, slot):
        cum = jnp.cumsum(jnp.zeros((N, K), jnp.float32).at[src, slot].add(
            var + chk * 1e-30), axis=1)
        idx = src * K + slot
        rows = cum.reshape(-1, 8)[idx // 8]
        oh = (idx % 8)[:, None] == jnp.arange(8, dtype=jnp.int32)[None, :]
        cum_e = jnp.sum(jnp.where(oh, rows, 0.0), axis=-1)
        return cum_e.sum()

    def v_sorted(chk, var, order, rank, is_start):
        vs = jnp.stack([var, var], -1)[order, 0] + chk * 1e-30
        cums = jnp.cumsum(vs)
        excl = cums - vs
        base = jax.lax.cummax(jnp.where(is_start, excl, 0.0))
        seg = cums - base
        cum_e = jnp.stack([seg, seg], -1)[rank, 0]
        return cum_e.sum()

    measure("cum: width-8 regroup take_along", v_width8, var, src, slot)
    measure("cum: width-8 regroup onehot", v_width8_oh, var, src, slot)
    measure("cum: sorted segmented cumsum", v_sorted, var, order, rank, is_start)


if __name__ == "__main__":
    main()
