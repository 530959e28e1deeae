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
    """x[idx] for 1-D x via the width-2 row-packing fast path."""
    return jnp.stack([x, x], axis=-1)[idx, 0]


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
    return jnp.sum(jnp.where(oh, rows, 0), axis=-1)


def table_lookup(table: jax.Array, row: jax.Array, col: jax.Array) -> jax.Array:
    """table[row, col] via row gather + one-hot multiply-reduce.

    Inherits onehot_select's contract: col outside [0, W) yields 0/False,
    not a clamped element.  row is NOT range-checked (it indexes a real
    gather) — callers must clamp/fill row themselves."""
    return onehot_select(table[row], col)
