"""Device connected-components via min-label propagation + pointer jumping.

The reference extracts components with nx.weakly_connected_components
(event_conversion.py:84, extract_track_candidates.py:332-346); its own
parallelism sketch is the convergence-based tag propagation in
tag_propagation/tag_propagation.py:128-167.  Here the same idea runs as a
lax.while_loop: each round every node takes the min label over its incident
(still-masked, still-active) edges in both directions, then labels are
path-compressed (label <- label[label]) so convergence is O(log n) rounds
on typical track graphs rather than O(diameter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def connected_components(src: jax.Array, dst: jax.Array, edge_ok: jax.Array,
                         node_ok: jax.Array) -> jax.Array:
    """Min-node-index component label per node.

    Masked-out nodes keep their own index as label.  Edge direction is
    ignored (weak connectivity).
    """
    n = node_ok.shape[0]
    init = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n)

    def body(state):
        labels, _ = state
        le = jnp.minimum(labels[src], labels[dst])
        le = jnp.where(edge_ok, le, big)
        new = labels
        new = new.at[src].min(le)
        new = new.at[dst].min(le)
        # pointer jumping / path compression (two hops per round)
        new = new[new]
        new = new[new]
        return new, jnp.any(new != labels)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return jnp.where(node_ok, labels, init)


def connected_components_paired(g, edge_ok: jax.Array) -> jax.Array:
    """Device CCA exploiting the build layout: directed edges are stored
    interleaved with their reverses (build.py: 2i = u->v, 2i+1 = v->u), so
    the undirected pair list is the even slice — halving the edge-sized
    gathers/scatters per round — and each round ends with a deep pointer-
    jumping pass (6 hops) so long-diameter components converge in far
    fewer rounds than the 2-hop variant.
    """
    from gnn_track_finding_tpu.ops import gtools

    n = g.node_mask.shape[0]
    a = g.src[0::2]
    b = g.dst[0::2]
    ok = edge_ok[0::2] | edge_ok[1::2]   # weak connectivity
    init = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n)

    def body(state):
        labels, _ = state
        la = gtools.gather1d(labels, a)
        lb = gtools.gather1d(labels, b)
        le = jnp.where(ok, jnp.minimum(la, lb), big)
        new = labels.at[a].min(le)
        new = new.at[b].min(le)

        def jump(_, l):
            return gtools.gather1d(l, gtools.gather1d(l, l))

        new = jax.lax.fori_loop(0, 3, jump, new)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(lambda s: s[1], body,
                                   (init, jnp.bool_(True)))
    return jnp.where(g.node_mask, labels, init)


def connected_components_fastsv(g, edge_ok: jax.Array,
                                warmup_rounds: int = 0,
                                jumps: int = 2,
                                axis_name=None) -> jax.Array:
    """FastSV/Shiloach-Vishkin-style device CCA: per round, hook the
    PARENT LABELS of each edge's endpoints onto the smaller side, then
    shortcut (f <- f[f]) — instead of one-hop label propagation.  Hooking
    at labels contracts label trees multiplicatively, so rounds scale
    with log(diameter) rather than diameter: 6 rounds / 43 ms on the full
    event vs ~50 rounds / 417 ms for the paired label-propagation variant
    (v5e, 55,701 nodes / 165,472 undirected pairs).

    Round-3 refinements: ONE scatter per hooking round, at the LARGER
    parent only — hooking lo onto fa when fa == lo is always a no-op
    (the invariant f[x] <= x makes min(f[lo], lo) = f[lo]), so writing
    at min(fa, fb) does nothing and only the max side's write can land —
    and a SPECIALISED FIRST ROUND: with f == identity the two edge-sized
    label gathers are the identity, so round 1 is just the scatter-min +
    shortcut.  Honest full-event numbers (v5e, tools/bench_cca.py, loop
    body carry-dependent so XLA cannot hoist the CCA out of the timing
    loop): jumps=2 32.7 ms (1 specialised + 5 full rounds; ~5.5 ms/round
    = 2 edge-sized label gathers + 1 scatter-min + 2 node-sized
    shortcut gathers) vs j1 43.8 / j3 35.8 / j4 38.4, label-propagation
    427.9, table-space 2801.  An early-stop variant (stop once every
    component still mutating is bigger than the extraction size gate)
    was measured structurally unprofitable: small components are clean
    after round 3 of 5, but the per-round dirtiness test (segment count
    + two label-class gathers) costs more than the two saved rounds.

    warmup_rounds > 0 prepends scatter-free table-space label-prop
    rounds (the connected_components_tables body) — strictly slower
    (w1 66.2 ms: the (N, K) label gathers dominate); kept only as an
    A/B knob, default off.

    Uses the interleaved edge layout (undirected pairs = even slice, like
    connected_components_paired) and width-2 packed gathers throughout.

    axis_name: edge-partitioned execution under shard_map — each shard
    hooks with its LOCAL pair block, partial hooks combine with one (N,)
    int32 pmin per round (exact); labels and the convergence check stay
    replicated.  The adaptive while_loop is the production extraction
    CCA: its early exit on later (sparser) extractions beats the
    fixed-round gated variant by ~5 ms on the fused full schedule.
    """
    from gnn_track_finding_tpu.ops import gtools

    n = g.node_mask.shape[0]
    a = g.src[0::2]
    b = g.dst[0::2]
    ok = edge_ok[0::2] | edge_ok[1::2]   # weak connectivity
    init = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n)

    def combine_min(f):
        if axis_name is None:
            return f
        return jax.lax.pmin(f, axis_name)

    f0 = init
    if warmup_rounds > 0:
        # slot-space ok flags via scatter (a 1-D bool gather edge_ok[tab]
        # would hit the pathological minor-axis path)
        in_ok = jnp.zeros(g.in_edges.shape, bool).at[
            g.dst, g.slot_in].max(edge_ok)
        out_ok = jnp.zeros(g.out_edges.shape, bool).at[
            g.src, g.slot_out].max(edge_ok)
        in_nb = gtools.gather1d(g.src, jnp.maximum(g.in_edges, 0))
        out_nb = gtools.gather1d(g.dst, jnp.maximum(g.out_edges, 0))

        def warm(_, f):
            l_in = jnp.where(in_ok, gtools.gather1d(f, in_nb), big).min(1)
            l_out = jnp.where(out_ok, gtools.gather1d(f, out_nb), big).min(1)
            f = jnp.minimum(f, jnp.minimum(l_in, l_out))
            f = gtools.gather1d(f, f)
            return gtools.gather1d(f, f)

        f0 = jax.lax.fori_loop(0, warmup_rounds, warm, f0)

    def shortcut(f):
        # in-range by construction (f holds node ids) -> unchecked form
        for _ in range(jumps):
            f = gtools.gather1d_unchecked(f, f)
        return f

    def body(state):
        f, _ = state
        fa = gtools.gather1d_unchecked(a, f)       # f[u]
        fb = gtools.gather1d_unchecked(b, f)       # f[v]
        lo_e = jnp.where(ok, jnp.minimum(fa, fb), big)
        hi_e = jnp.where(ok, jnp.maximum(fa, fb), 0)
        # masked edges carry `big` (no-op min at row 0).  Hook the parent
        # labels onto the smaller side (hooking at the NODES instead
        # degenerates to one-hop label propagation: measured 49 rounds /
        # 337 ms vs 6 rounds / 43 ms full-event)
        new = combine_min(f.at[hi_e].min(lo_e))
        new = shortcut(new)
        return new, jnp.any(new != f)

    if warmup_rounds == 0:
        # first round specialised: with f == identity, f[u] == u and
        # f[v] == v, so the two edge-sized label gathers vanish
        f0 = shortcut(combine_min(
            init.at[jnp.where(ok, jnp.maximum(a, b), 0)].min(
                jnp.where(ok, jnp.minimum(a, b), big))))

    labels, _ = jax.lax.while_loop(lambda s: s[1], body,
                                   (f0, jnp.bool_(True)))
    return jnp.where(g.node_mask, labels, init)


def connected_components_gated(g, edge_ok: jax.Array, max_size: int,
                               rounds: int = 5, jumps: int = 2,
                               axis_name=None):
    """Extraction-exact truncated FastSV: labels + per-label settledness.

    Extraction (extract_track_candidates.py:332-346,415) only consumes
    components of size <= max_size; oversized ones are discarded by the
    fragment/size gate.  Full FastSV spends its last rounds (and the
    while-loop's serialised convergence checks) converging the one giant
    background component (39k of 55.7k nodes after iteration 1) whose
    exact label the size gate then throws away.  Two structural
    alternatives measured dead:

      * incremental restart from the previous extraction's labels — the
        giant component loses edges (is "dirty") every single iteration,
        so it re-converges from scratch each time (53k/1.7k deleted
        pairs before extractions 2/3, dirtying 95%/75% of nodes);
      * an exact early-stop criterion ("no unsettled label owns a
        <=max_size segment") — the giant's own mid-convergence fragments
        are small and unsettled, so the criterion only fires at
        near-full convergence and its per-check scatters make it SLOWER
        than full FastSV (23.1 vs 19.6 ms full-event).

    What works: run a FIXED `rounds` hooking rounds (first specialised,
    no while loop, no convergence check), then mark every label still
    carrying an active crossing edge (f[u] != f[v]) as unsettled.
    `rounds=5` is the measured worst case for any component of
    <= 32 nodes across adversarial shapes (permuted/descending paths and
    random graphs, all sizes 2..32, 600 trials each; more jumps do not
    lower it — hooking depth is the binding constraint).  Feeding
    (labels, label_ok) to the size-gated candidate matrix then yields
    BIT-IDENTICAL extraction to full CCA: components <= max_size are
    fully converged and settled, and every oversized component is
    excluded either by segment size or by label_ok where full CCA
    excluded it by size.  Failure mode if a pathological <=max_size
    component ever needed a 6th round: it is DEFERRED (label_ok False,
    skipped this extraction, re-attempted next) — conservative, never
    mislabeled.  tests/test_graph_build.py::test_cca_gated_extraction_exact
    pins parity on adversarial permuted paths.

    Returns (labels, label_ok, sizes): labels (N,) int32; label_ok (N,)
    bool, False at labels with crossing active edges; sizes (N,) int32
    alive-node count per label value (reusable as the candidate-matrix
    segment sizes).

    axis_name: edge-partitioned execution under shard_map — each shard
    hooks with its LOCAL edge block (pairs stay local: shard sizes are
    even and reverses are adjacent, parallel/edge_shard.shard_graph),
    partial hooks combine with one (N,) int32 pmin per round and the
    crossing marks with one (N,) u8 psum; labels stay replicated.
    """
    from gnn_track_finding_tpu.ops import gtools

    n = g.node_mask.shape[0]
    a = g.src[0::2]
    b = g.dst[0::2]
    ok = edge_ok[0::2] | edge_ok[1::2]   # weak connectivity
    init = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n)
    alive = g.node_mask.astype(jnp.int32)

    def combine_min(f):
        if axis_name is None:
            return f
        return jax.lax.pmin(f, axis_name)

    def shortcut(f):
        # in-range by construction (f holds node ids) -> unchecked form
        for _ in range(jumps):
            f = gtools.gather1d_unchecked(f, f)
        return f

    # specialised first round: f == identity makes the label gathers
    # the identity (same as connected_components_fastsv)
    f = shortcut(combine_min(
        init.at[jnp.where(ok, jnp.maximum(a, b), 0)].min(
            jnp.where(ok, jnp.minimum(a, b), big))))

    def body(_, f):
        fa = gtools.gather1d_unchecked(a, f)
        fb = gtools.gather1d_unchecked(b, f)
        lo_e = jnp.where(ok, jnp.minimum(fa, fb), big)
        hi_e = jnp.where(ok, jnp.maximum(fa, fb), 0)
        return shortcut(combine_min(f.at[hi_e].min(lo_e)))

    f = jax.lax.fori_loop(0, rounds - 1, body, f)

    fa = gtools.gather1d_unchecked(a, f)
    fb = gtools.gather1d_unchecked(b, f)
    crossing = ok & (fa != fb)
    uns = jnp.zeros((n,), bool).at[fa].max(crossing).at[fb].max(crossing)
    if axis_name is not None:
        from gnn_track_finding_tpu.ops import collect
        uns = collect.allor(uns, axis_name)
    sizes = jnp.zeros((n,), jnp.int32).at[f].add(alive)
    labels = jnp.where(g.node_mask, f, init)
    return labels, ~uns, sizes


def connected_components_tables(g, edge_ok: jax.Array) -> jax.Array:
    """Scatter-free CCA over the fixed-K edge tables.

    Same result as `connected_components`, but each round is two (N, K)
    gathers + row reductions instead of edge scatters (TPU scatters
    serialize; this is the production path used by extraction).
    """
    n = g.num_padded_nodes
    init = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n)

    in_e = jnp.maximum(g.in_edges, 0)
    out_e = jnp.maximum(g.out_edges, 0)
    in_ok = (g.in_edges >= 0) & edge_ok[in_e]
    out_ok = (g.out_edges >= 0) & edge_ok[out_e]
    in_nb = g.src[in_e]          # (N, K) neighbour ids, static
    out_nb = g.dst[out_e]

    def body(state):
        labels, _ = state
        l_in = jnp.where(in_ok, labels[in_nb], big).min(axis=1)
        l_out = jnp.where(out_ok, labels[out_nb], big).min(axis=1)
        new = jnp.minimum(labels, jnp.minimum(l_in, l_out))
        new = new[new]
        new = new[new]
        return new, jnp.any(new != labels)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return jnp.where(g.node_mask, labels, init)
