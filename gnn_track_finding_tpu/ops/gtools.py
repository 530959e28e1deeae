"""Gather utilities for TPU-friendly lowering.

Measured on v5e (330k lookups, tools/profile_lookup_forms.py):

  * gathers of 1-element rows lower to a pathological path (hundreds of
    ms) while rows of width >= 2 run at memory speed — `gather1d` packs a
    1-D operand into width-2 rows before gathering;
  * for two-index lookups table[row, col], a row gather followed by a
    ONE-HOT multiply-reduce over the minor axis runs at 0.9 ms for ANY
    table width 2..64 — vs 5.5 ms for take_along_axis and 2.6-3.7 ms for
    the direct x[row, col] form (both lower to per-element minor-axis
    gathers).  XLA fuses the one-hot select into the row-gather consumer,
    so the (len(row), W) intermediate never materializes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather1d(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x[idx] for 1-D x via the fastest measured lowering.

    When len(x) is a multiple of 64 (every padded node/edge axis is),
    uses the BLOCKED form: reshape x to (len(x)/64, 64) and look up
    (idx // 64, idx % 64) with `table_lookup` — the row gather touches
    64x fewer distinct rows and XLA fuses the one-hot select into the
    consumer.  Measured on v5e (172k lookups from a 57,344-entry table,
    tools/profile_cca_ops.py study): 0.33 ms blocked vs 1.53 ms for the
    width-2 packing vs 1.44 ms for the direct 1-D gather.  Falls back
    to width-2 row packing otherwise.

    Contract: out-of-range idx (either sign) CLAMPS to the nearest
    endpoint, exactly like the plain x[idx] gather — the clamp below
    costs nothing (measured 0.41 ms clamped vs 0.44 unclamped on the
    172k-lookup CCA gather; it fuses into the index arithmetic).  Without
    it the blocked form's floor-div/mod block arithmetic would return an
    ARBITRARY in-range element for bad idx — a silent wrong-label hazard
    pinned by tests/test_aux.py::test_gather1d_oob_contract.
    """
    return gather1d_blocked(x, idx)


def gather1d_blocked(x: jax.Array, idx: jax.Array, width: int = 64) -> jax.Array:
    """Blocked row-gather form of gather1d (see gather1d docstring)."""
    return gather1d_unchecked(jnp.clip(idx, 0, x.shape[0] - 1), x, width)


def gather1d_unchecked(idx: jax.Array, x: jax.Array,
                       width: int = 64) -> jax.Array:
    """gather1d WITHOUT the endpoint clamp — out-of-range idx reads an
    ARBITRARY in-range element.  Only for call sites whose indices are
    in-range BY CONSTRUCTION and hot enough to care (the FastSV round
    loop: labels start at identity, hooks only write existing node ids,
    src/dst pad with 0 — graph/cca.py).  The argument order is flipped
    vs gather1d on purpose so a mechanical swap-in is impossible without
    reading this contract."""
    if x.shape[0] % width:
        return jnp.stack([x, x], axis=-1)[idx, 0]
    return table_lookup(x.reshape(-1, width), idx // width, idx % width)


def onehot_select(rows: jax.Array, col: jax.Array) -> jax.Array:
    """rows[..., col] per row via one-hot multiply-reduce (no minor-axis
    dynamic gather).  rows: (..., W); col: (...) int.

    Out-of-range contract: any col outside [0, W) — including negative
    values — yields 0 (False for bool rows), NOT a clamped element like
    take_along_axis would return.  Callers passing padded index arrays
    (slot fills of 0/-1) rely on this zero-fill semantics."""
    w = rows.shape[-1]
    oh = col[..., None] == jnp.arange(w, dtype=col.dtype)
    if rows.dtype == jnp.bool_:
        return jnp.any(rows & oh, axis=-1)
    # pin the accumulator dtype: under x64 jnp.sum promotes int32 -> int64,
    # which breaks while_loop carry typing at gather1d call sites
    return jnp.sum(jnp.where(oh, rows, 0), axis=-1, dtype=rows.dtype)


def table_lookup(table: jax.Array, row: jax.Array, col: jax.Array) -> jax.Array:
    """table[row, col] via row gather + one-hot multiply-reduce.

    Inherits onehot_select's contract: col outside [0, W) yields 0/False,
    not a clamped element.  row is NOT range-checked (it indexes a real
    gather) — callers must clamp/fill row themselves."""
    return onehot_select(table[row], col)
