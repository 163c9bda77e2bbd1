"""Gap-fill kernel: LOCF + linear interpolation on the tumbling-window grid.

Operates on ONE conversation's rollup-tier rows (sorted, unique window
starts). The engine applies it inside ``groupby(conv_id).map_groups`` after
the pivot guarantees per-conversation contiguity; the oracle applies it in a
plain loop over conversations. Both call THIS function, so the distributed
path is bit-exact vs the single-process path by construction, and the kernel
itself is unit-tested on hand-computed cases (tests/test_gapfill.py).

Semantics (F1-e3: a missing turn must not be invented — filled windows carry
zero counts and explicitly-flagged reconstructed values):

  - grid = every window from min(window) to max(window) step ``window_us``,
    EXCEPT that a gap longer than ``max_gap`` windows is left as a break
    (no filled rows) — the standard TSDB bound on interpolation, and the
    thing that keeps a sparse month-long stream from exploding into a
    half-million-row minute grid. ``max_gap=None`` fills unboundedly.
  - real rows pass through with ``filled = False``
  - missing windows get ``filled = True``, integer counts = 0,
    ``char_min``/``char_max`` = null,
    ``char_sum_interp`` = linear interpolation of char_sum between the
    nearest real neighbors (float64, fixed formula:
    prev + (next - prev) * (t - t_prev) / (t_next - t_prev)),
    ``locf_char_max`` = last-observed char_max (LOCF).
  - single-row conversations (F1-e4) produce a 1-row grid, no fill needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GAPFILL_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("window_start", pa.timestamp("us")),
        ("filled", pa.bool_()),
        ("turn_count", pa.int64()),
        ("char_sum", pa.int64()),
        ("char_min", pa.int32()),
        ("char_max", pa.int32()),
        ("tok_est_sum", pa.int64()),
        ("tool_calls", pa.int64()),
        ("char_sum_interp", pa.float64()),
        ("locf_char_max", pa.int32()),
    ]
)

GAPFILL_FIELDS = [
    ("window_start", pa.timestamp("us")),
    ("filled", pa.bool_()),
    ("turn_count", pa.int64()),
    ("char_sum", pa.int64()),
    ("char_min", pa.int32()),
    ("char_max", pa.int32()),
    ("tok_est_sum", pa.int64()),
    ("tool_calls", pa.int64()),
    ("char_sum_interp", pa.float64()),
    ("locf_char_max", pa.int32()),
]


DEFAULT_MAX_GAP = 60  # windows; shared by JobSpec, oracle and the SQL oracle


def gapfill_conversation(
    window_us: np.ndarray,
    turn_count: np.ndarray,
    char_sum: np.ndarray,
    char_min: np.ndarray,
    char_max: np.ndarray,
    tok_est_sum: np.ndarray,
    tool_calls: np.ndarray,
    step_us: int,
    max_gap: int | None = DEFAULT_MAX_GAP,
) -> dict[str, np.ndarray]:
    """Fill one conversation's window series. Inputs sorted ascending, unique.

    Returns a dict of numpy arrays matching GAPFILL_FIELDS (mask arrays for
    nullable char_min/char_max under keys ``_null_mask``).
    """
    window_us = np.asarray(window_us, dtype=np.int64)
    n = len(window_us)
    if n == 0:
        return {name: np.empty(0, dtype=np.int64) for name, _ in GAPFILL_FIELDS}
    lo, hi = int(window_us[0]), int(window_us[-1])
    if max_gap is None:
        grid = np.arange(lo, hi + step_us, step_us, dtype=np.int64)
    else:
        # fill only gaps of <= max_gap missing windows; longer gaps break
        gaps = np.diff(window_us) // step_us - 1  # missing windows per gap
        pieces = [window_us]
        fill_idx = np.nonzero((gaps > 0) & (gaps <= max_gap))[0]
        for i in fill_idx:
            pieces.append(
                np.arange(
                    window_us[i] + step_us, window_us[i + 1], step_us, dtype=np.int64
                )
            )
        grid = np.concatenate(pieces)
        grid.sort()
    g = len(grid)
    pos = np.searchsorted(grid, window_us)  # position of each real row in grid
    real = np.zeros(g, dtype=bool)
    real[pos] = True

    def scatter(vals: np.ndarray, dtype) -> np.ndarray:
        out = np.zeros(g, dtype=dtype)
        out[pos] = vals
        return out

    tc = scatter(np.asarray(turn_count, np.int64), np.int64)
    cs = scatter(np.asarray(char_sum, np.int64), np.int64)
    cmin = scatter(np.asarray(char_min, np.int32), np.int32)
    cmax = scatter(np.asarray(char_max, np.int32), np.int32)
    te = scatter(np.asarray(tok_est_sum, np.int64), np.int64)
    tool = scatter(np.asarray(tool_calls, np.int64), np.int64)

    # linear interpolation of char_sum over the grid (float64, fixed formula)
    interp = np.empty(g, dtype=np.float64)
    real_idx = pos
    real_t = window_us.astype(np.float64)
    real_v = np.asarray(char_sum, np.float64)
    interp[real_idx] = real_v
    if g > n:
        gap_mask = ~real
        gap_t = grid[gap_mask].astype(np.float64)
        # index of the real neighbor to the right of each gap point
        right = np.searchsorted(window_us, grid[gap_mask])
        left = right - 1
        # interior gaps only (grid spans [min,max] of real points, so every
        # gap point has both neighbors)
        t0, t1 = real_t[left], real_t[right]
        v0, v1 = real_v[left], real_v[right]
        interp[gap_mask] = v0 + (v1 - v0) * (gap_t - t0) / (t1 - t0)

    # LOCF of char_max
    locf_src = np.maximum.accumulate(np.where(real, np.arange(g), -1))
    locf = cmax[locf_src]  # locf_src >= 0 always (grid starts at a real row)

    return {
        "window_start": grid,
        "filled": ~real,
        "turn_count": tc,
        "char_sum": cs,
        "char_min": cmin,
        "char_max": cmax,
        "_null_mask": ~real,  # char_min/char_max null on filled rows
        "tok_est_sum": te,
        "tool_calls": tool,
        "char_sum_interp": interp,
        "locf_char_max": locf,
    }


def gapfill_to_arrow(conv_id: str, filled: dict[str, np.ndarray]) -> pa.Table:
    """Assemble the kernel output into the canonical Arrow gap-fill schema."""
    g = len(filled["window_start"])
    null_mask = filled.get("_null_mask")
    cols: dict[str, pa.Array] = {
        "conv_id": pa.array([conv_id] * g, pa.string()),
        "window_start": pa.array(filled["window_start"], pa.timestamp("us")),
        "filled": pa.array(filled["filled"], pa.bool_()),
        "turn_count": pa.array(filled["turn_count"], pa.int64()),
        "char_sum": pa.array(filled["char_sum"], pa.int64()),
        "char_min": pa.array(filled["char_min"], pa.int32(), mask=null_mask),
        "char_max": pa.array(filled["char_max"], pa.int32(), mask=null_mask),
        "tok_est_sum": pa.array(filled["tok_est_sum"], pa.int64()),
        "tool_calls": pa.array(filled["tool_calls"], pa.int64()),
        "char_sum_interp": pa.array(filled["char_sum_interp"], pa.float64()),
        "locf_char_max": pa.array(filled["locf_char_max"], pa.int32()),
    }
    return pa.table(cols)
