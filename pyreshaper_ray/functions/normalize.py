"""Vectorized per-batch normalization kernels (pyarrow.compute only).

Analog of PyReshaper's per-variable classification + attribute pass
(``reshaper.py`` classification loop in the public repo) — but where
PyReshaper only copies values, the north_rule requires derived metric
columns. All kernels are Arrow-native; no per-row Python.

Derived columns (definitions are the contract — the DuckDB oracle SQL in
``__ray_entry__.py`` restates exactly these formulas):

    char_len : int32  = utf8 character length of ``text``
    tok_est  : int64  = (char_len + 3) // 4          (integer token estimate)
    is_tool  : bool   = tool != ''
    w1m/w1h/w1d : timestamp[us] = ts floored to minute / hour / day
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

WINDOW_UNITS = {"1m": "minute", "1h": "hour", "1d": "day", "1w": "week"}
WINDOW_US = {
    "1m": 60_000_000,
    "1h": 3_600_000_000,
    "1d": 86_400_000_000,
    # ISO weeks (Monday-start): pyarrow floor_temporal(unit="week") and
    # DuckDB date_trunc('week', ts) agree on the boundary
    "1w": 604_800_000_000,
}


def floor_window(ts: pa.ChunkedArray | pa.Array, tier: str) -> pa.Array:
    return pc.floor_temporal(ts, unit=WINDOW_UNITS[tier])


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Append char_len / tok_est / is_tool / w1m columns. Zero-copy input."""
    char_len = pc.cast(pc.utf8_length(batch["text"]), pa.int32())
    tok_est = pc.cast(
        pc.divide(pc.add(pc.cast(char_len, pa.int64()), 3), 4), pa.int64()
    )
    is_tool = pc.not_equal(batch["tool"], "")
    w1m = floor_window(batch["ts"], "1m")
    return (
        batch.append_column("char_len", char_len)
        .append_column("tok_est", tok_est)
        .append_column("is_tool", is_tool)
        .append_column("w1m", w1m)
    )
