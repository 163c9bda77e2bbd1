"""Single-process oracle — the correctness contract for the Ray engine.

Mirrors PyReshaper's serial mode + ``source/test/reshaperTests.py`` equivalence
design (public NCAR/PyReshaper repo): the distributed pipeline's outputs must
match these pure pyarrow/numpy/pandas implementations **bit-for-bit** at every
retention tier (tests/test_equivalence.py). All rollup metrics stay in the
integer domain so combine order cannot perturb results; float columns
(gap-fill interpolation) use a single fixed per-conversation formula shared
with the engine (functions/gapfill.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .functions.codecs import dod_encode, gorilla_encode
from .functions.gapfill import gapfill_conversation, gapfill_to_arrow
from .functions.normalize import WINDOW_US, normalize_batch

ROLLUP_COLUMNS = [
    "conv_id",
    "window_start",
    "turn_count",
    "char_sum",
    "char_min",
    "char_max",
    "tok_est_sum",
    "tool_calls",
]


def oracle_pivot(t: pa.Table) -> pa.Table:
    """Slice→series pivot: stable sort by (conv_id, turn_idx, ts, payload),
    dedup keep-first on (conv_id, turn_idx). Per-turn ``text`` is untouched —
    the bit-for-bit preservation contract. The payload columns in the sort
    key make the keep-first survivor deterministic even when duplicates share
    a ts but differ in text (same rule as the distributed kernel)."""
    idx = pc.sort_indices(
        t,
        sort_keys=[
            ("conv_id", "ascending"),
            ("turn_idx", "ascending"),
            ("ts", "ascending"),
        ]
        + [(c, "ascending") for c in ("role", "tool", "text") if c in t.column_names],
    )
    t = t.take(idx)
    df = pd.DataFrame({"conv_id": t["conv_id"].to_pandas(), "turn_idx": t["turn_idx"].to_pandas()})
    keep = ~df.duplicated(subset=["conv_id", "turn_idx"], keep="first")
    return t.filter(pa.array(keep.to_numpy()))


def oracle_normalize(t: pa.Table) -> pa.Table:
    return normalize_batch(t)


def oracle_rollup_1m(pivoted_normalized: pa.Table) -> pa.Table:
    """1m tier from deduped turns: per (conv_id, w1m) integer aggregates."""
    df = pivoted_normalized.select(
        ["conv_id", "w1m", "char_len", "tok_est", "is_tool"]
    ).to_pandas()
    g = df.groupby(["conv_id", "w1m"], sort=True)
    out = g.agg(
        turn_count=("char_len", "size"),
        char_sum=("char_len", "sum"),
        char_min=("char_len", "min"),
        char_max=("char_len", "max"),
        tok_est_sum=("tok_est", "sum"),
        tool_calls=("is_tool", "sum"),
    ).reset_index()
    out = out.rename(columns={"w1m": "window_start"})
    return _rollup_to_arrow(out)


def oracle_cascade(tier: pa.Table, to_tier: str) -> pa.Table:
    """Downsample a fine tier into a coarser one (1m→1h, 1h→1d).

    Exact because sums/counts compose (sum-of-sums) and min/max nest.
    """
    df = tier.to_pandas()
    if to_tier == "1w":
        # ISO Monday-start weeks (pandas floor() has no week unit;
        # W-SUN periods start on Monday — matches Arrow floor_temporal)
        df["window_start"] = (
            df["window_start"].dt.to_period("W-SUN").dt.start_time
        )
    else:
        unit = {"1h": "h", "1d": "D"}[to_tier]
        df["window_start"] = df["window_start"].dt.floor(unit)
    g = df.groupby(["conv_id", "window_start"], sort=True)
    out = g.agg(
        turn_count=("turn_count", "sum"),
        char_sum=("char_sum", "sum"),
        char_min=("char_min", "min"),
        char_max=("char_max", "max"),
        tok_est_sum=("tok_est_sum", "sum"),
        tool_calls=("tool_calls", "sum"),
    ).reset_index()
    return _rollup_to_arrow(out)


def _rollup_to_arrow(df: pd.DataFrame) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array(df["conv_id"], pa.string()),
            "window_start": pa.array(df["window_start"].to_numpy(), pa.timestamp("us")),
            "turn_count": pa.array(df["turn_count"].to_numpy(np.int64), pa.int64()),
            "char_sum": pa.array(df["char_sum"].to_numpy(np.int64), pa.int64()),
            "char_min": pa.array(df["char_min"].to_numpy(np.int32), pa.int32()),
            "char_max": pa.array(df["char_max"].to_numpy(np.int32), pa.int32()),
            "tok_est_sum": pa.array(df["tok_est_sum"].to_numpy(np.int64), pa.int64()),
            "tool_calls": pa.array(df["tool_calls"].to_numpy(np.int64), pa.int64()),
        }
    )


def oracle_gapfill(
    tier_1m: pa.Table, tier: str = "1m", max_gap: int | None = None
) -> pa.Table:
    """Gap-fill every conversation's window series on the tier grid.

    ``max_gap`` defaults to the engine-wide DEFAULT_MAX_GAP when None is not
    explicitly wanted — callers pass it through from the JobSpec."""
    from .functions.gapfill import DEFAULT_MAX_GAP

    if max_gap is None:
        max_gap = DEFAULT_MAX_GAP
    step = WINDOW_US[tier]
    df = tier_1m.to_pandas()
    df = df.sort_values(["conv_id", "window_start"], kind="mergesort")
    pieces: list[pa.Table] = []
    for conv_id, g in df.groupby("conv_id", sort=True):
        filled = gapfill_conversation(
            g["window_start"].to_numpy("datetime64[us]").astype(np.int64),
            g["turn_count"].to_numpy(np.int64),
            g["char_sum"].to_numpy(np.int64),
            g["char_min"].to_numpy(np.int32),
            g["char_max"].to_numpy(np.int32),
            g["tok_est_sum"].to_numpy(np.int64),
            g["tool_calls"].to_numpy(np.int64),
            step,
            max_gap=max_gap,
        )
        pieces.append(gapfill_to_arrow(conv_id, filled))
    if not pieces:
        from .functions.gapfill import GAPFILL_SCHEMA

        return GAPFILL_SCHEMA.empty_table()
    return pa.concat_tables(pieces)


def oracle_encode_series(pivoted_normalized: pa.Table) -> pa.Table:
    """Per-conversation encoded series: DoD(ts) + Gorilla(char_len as f64).

    The analog of PyReshaper's one-output-file-per-variable layout
    (``reshaper.py::convert`` naming loop): one row per conversation holding
    the whole compressed series.
    """
    df = pivoted_normalized.select(["conv_id", "ts", "char_len"]).to_pandas()
    conv_ids: list[str] = []
    n_turns: list[int] = []
    dod: list[bytes] = []
    gor: list[bytes] = []
    for conv_id, g in df.groupby("conv_id", sort=True):
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        vals = g["char_len"].to_numpy(np.float64)
        conv_ids.append(conv_id)
        n_turns.append(len(g))
        dod.append(dod_encode(ts))
        gor.append(gorilla_encode(vals))
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "n_turns": pa.array(n_turns, pa.int64()),
            "dod_ts": pa.array(dod, pa.binary()),
            "gorilla_char_len": pa.array(gor, pa.binary()),
        }
    )


def oracle_full(
    t: pa.Table, tiers: tuple[str, ...] = ("1m", "1h", "1d")
) -> dict[str, pa.Table]:
    """Run the whole flagship pipeline single-process. Returns all tiers."""
    norm = oracle_normalize(t)
    pivoted = oracle_pivot(norm)
    t1m = oracle_rollup_1m(pivoted)
    out = {"turns": pivoted, "rollup_1m": t1m}
    prev = t1m
    for tier in tiers:
        if tier == "1m":
            continue
        prev = oracle_cascade(prev, tier)
        out[f"rollup_{tier}"] = prev
    out["gapfill_1m"] = oracle_gapfill(t1m)
    out["series"] = oracle_encode_series(pivoted)
    return out
