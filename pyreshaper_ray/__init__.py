"""pyreshaper_ray — a from-scratch, Ray-Data-native time-series rollup +
downsample + retention engine over Parquet transcript tables.

Capability blueprint: NCAR/PyReshaper (public repo; `/root/reference` is empty,
see SURVEY.md §0) — its time-slice → time-series pivot, metadata handling,
write modes, chunking and diagnostics generalize here to:

- the pivot: ``groupby(conv_id)`` shuffle + per-group sort by ``(turn_idx, ts)``
  reshaping interleaved turns into ordered per-conversation series
  (analog of ``reshaper.py::Slice2SeriesReshaper.convert``),
- tumbling-window rollups (1m/1h/1d) with a continuous-aggregate cascade,
- gap-fill (LOCF + linear interpolation on the window grid),
- delta-of-delta timestamp + Gorilla XOR value compression,
- a per-partition checkpoint manifest (wmode analog) for resume + lineage.

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines,
``map_batches`` over zero-copy Arrow, actor pools for stateful stages.
"""

__version__ = "0.1.0"

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
