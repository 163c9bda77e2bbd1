"""Gap-fill stage: per-conversation LOCF + linear interpolation on the grid.

Runs on the 1m rollup tier (small relative to raw turns — one row per
(conv, active minute)), grouped by `conv_id` so each conversation's window
series is contiguous and ordered inside one group; state (last observed
value, neighbors for interpolation) never crosses group boundaries
(SURVEY.md §2.3). The kernel is the SAME pure function the oracle uses
(functions/gapfill.py) → distributed output is bit-exact by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.gapfill import gapfill_conversation, gapfill_to_arrow
from ..functions.normalize import WINDOW_US


def _gapfill_group_fn(step_us: int, max_gap: int | None):
    def fill(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("window_start", "ascending")])
        g = group.take(idx)
        win = (
            g["window_start"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        out = gapfill_conversation(
            win,
            g["turn_count"].to_numpy(zero_copy_only=False),
            g["char_sum"].to_numpy(zero_copy_only=False),
            g["char_min"].to_numpy(zero_copy_only=False),
            g["char_max"].to_numpy(zero_copy_only=False),
            g["tok_est_sum"].to_numpy(zero_copy_only=False),
            g["tool_calls"].to_numpy(zero_copy_only=False),
            step_us,
            max_gap=max_gap,
        )
        return gapfill_to_arrow(g["conv_id"][0].as_py(), out)

    return fill


def gapfill_tier(
    ds_tier: "ray.data.Dataset", tier: str = "1m", max_gap: int | None = None
) -> "ray.data.Dataset":
    from ..functions.gapfill import DEFAULT_MAX_GAP

    if max_gap is None:
        max_gap = DEFAULT_MAX_GAP
    return ds_tier.groupby("conv_id").map_groups(
        _gapfill_group_fn(WINDOW_US[tier], max_gap), batch_format="pyarrow"
    )
