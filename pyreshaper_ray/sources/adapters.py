"""Schema adapters: map driver testdata tables into the transcript shape.

The engine's authoritative input schema is the transcript table
(``BASELINE.json:input_hint``). The driver's `events` stream table maps onto
it naturally — a user's event stream is a "conversation", each event a turn:

    conv_id  = 'u' || user_id
    turn_idx = event_id (int32)   # unique per stream; pivot only needs an
                                  # ordering key, not contiguity (event ids
                                  # are assigned in ts order in the corpus)
    role     = event_type
    text     = props              # payload preserved byte-for-byte
    tool     = event_type if event_type in ('click','purchase') else ''
    ts       = ts

The equivalent SQL restatement lives in ``__ray_entry__.oracle_sql`` so every
adapted pipeline is DuckDB-checkable.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

TOOLY_EVENT_TYPES = ("click", "purchase")

# SQL restatement of the adapter, reused by every oracle query.
EVENTS_AS_TRANSCRIPTS_SQL = """
SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
       CAST(event_id AS INTEGER)       AS turn_idx,
       event_type                      AS role,
       props                           AS text,
       CASE WHEN event_type IN ('click','purchase') THEN event_type ELSE '' END AS tool,
       ts
FROM events
"""


def events_batch_to_transcripts(batch: pa.Table) -> pa.Table:
    conv_id = pc.binary_join_element_wise(
        "u", pc.cast(batch["user_id"], pa.string()), ""
    )
    is_tooly = pc.is_in(
        batch["event_type"], value_set=pa.array(list(TOOLY_EVENT_TYPES))
    )
    tool = pc.if_else(is_tooly, batch["event_type"], "")
    return pa.table(
        {
            "conv_id": conv_id,
            "turn_idx": pc.cast(batch["event_id"], pa.int32()),
            "role": batch["event_type"],
            "text": batch["props"],
            "tool": tool,
            "ts": batch["ts"],
        }
    )


def events_to_transcripts(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return events_ds.map_batches(
        events_batch_to_transcripts, batch_format="pyarrow", zero_copy_batch=True
    )


def read_events_as_transcripts(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    return events_to_transcripts(ds)
