"""JobSpec — the analog of PyReshaper's ``specification.py::Specifier``.

The public repo's Specifier is a picklable config object holding
``infiles / ncfmt / compression_level / prefix / suffix / metadata / meta1d /
backend / exclude_list / time_series`` validated by ``validate()`` (type
checks then value checks) and serialized with ``write()``. The translation:

    infiles          → input (parquet path/glob/list)
    prefix/suffix    → out_dir (per-tier subdirectories, deterministic names)
    ncfmt/compression→ codecs on/off + parquet codec
    metadata/meta1d  → conv_meta broadcast table (+ `once` mode: write the
                       shared table once per run instead of per partition)
    exclude_list     → exclude_roles
    time_series      → conv_subset (explicit conversations, None = all)
    wmode            → resume mode: 's' skip completed buckets, 'o' overwrite

JSON instead of pickle: specs are human-readable, diffable job artifacts.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field

VALID_TIERS = ("1m", "1h", "1d", "1w")
VALID_WMODES = ("s", "o", "a")  # skip-if-done / overwrite / append
# 'a' (append): new input files are ingested into EXISTING tiers by
# recomputing only the buckets their rows hash into (manifest- and
# run-meta-driven); outputs are bit-equal to a from-scratch run on the
# union. The create_reshaper(wmode='a') analog, generalized to incremental
# continuous aggregates. Falls back to a full recompute when previously
# ingested files changed or the heavy/segment bucket assignments moved.


@dataclass
class JobSpec:
    input: str | list[str]
    out_dir: str
    n_buckets: int = 64  # 0 = auto-size from input bytes + cluster CPUs
    tiers: tuple[str, ...] = ("1m", "1h", "1d")  # "1w" is opt-in
    include_turns: bool = True  # False = rollups/series only: text never
    # enters the exchange (the 'project text away from metric paths early'
    # scale lever — the spill shrinks ~5x)
    gapfill: bool = True
    gapfill_max_gap: int | None = 60  # windows; None = unbounded fill
    encode: bool = True
    wmode: str = "s"
    conv_meta: str | None = None  # optional dimension-table parquet
    once: bool = True  # write shared metadata once per run (once-file analog)
    exclude_roles: tuple[str, ...] = ()
    conv_subset: tuple[str, ...] | None = None
    output_limit: int | None = None  # debug: only first N buckets (s2srun --limit)
    salt_threshold: int = 100_000  # turns above which a conversation is pinned
    # to its own bucket (whole, WeightBalanced analog)
    segment_threshold: int = 1_000_000  # turns above which a conversation is
    # SPLIT into contiguous turn_idx-range segments spread across buckets —
    # the giant-conversation path: no single task ever holds the whole
    # conversation; tier partials are merged and the series stream-encoded
    # in a per-conversation stitch step. 0 disables splitting.
    segment_rows: int = 250_000  # turns per segment (seg = turn_idx // this)
    exchange: str = "spill"  # "spill" | "hash" | "groupby" (see flagship.py)

    def validate(self) -> "JobSpec":
        """Type checks then value checks, mirroring Specifier.validate()."""
        if not isinstance(self.input, (str, list)):
            raise TypeError("input must be a path string or list of paths")
        if not isinstance(self.out_dir, str) or not self.out_dir:
            raise ValueError("out_dir must be a non-empty path")
        if not isinstance(self.n_buckets, int) or self.n_buckets < 0:
            raise ValueError("n_buckets must be a positive int (0 = auto)")
        bad = [t for t in self.tiers if t not in VALID_TIERS]
        if bad:
            raise ValueError(f"unknown tiers {bad}; valid: {VALID_TIERS}")
        if list(self.tiers) != sorted(self.tiers, key=VALID_TIERS.index):
            raise ValueError("tiers must be ordered fine→coarse (cascade input)")
        if self.wmode not in VALID_WMODES:
            raise ValueError(f"wmode must be one of {VALID_WMODES}")
        if self.exchange not in ("spill", "hash", "groupby"):
            raise ValueError("exchange must be 'spill', 'hash' or 'groupby'")
        if self.output_limit is not None and self.output_limit < 1:
            raise ValueError("output_limit must be >= 1")
        if self.segment_rows < 1:
            raise ValueError("segment_rows must be >= 1")
        if self.segment_threshold < 0:
            raise ValueError("segment_threshold must be >= 0 (0 = off)")
        paths = [self.input] if isinstance(self.input, str) else self.input
        for p in paths:
            base = p.split("*")[0] or "/"
            if not os.path.exists(base) and not os.path.exists(os.path.dirname(base)):
                raise ValueError(f"input path does not exist: {p}")
        return self

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2, default=list)

    @classmethod
    def read(cls, path: str) -> "JobSpec":
        with open(path) as f:
            d = json.load(f)
        for k in ("tiers", "exclude_roles"):
            if k in d and d[k] is not None:
                d[k] = tuple(d[k])
        if d.get("conv_subset") is not None:
            d["conv_subset"] = tuple(d["conv_subset"])
        return cls(**d).validate()


def create_spec(**kwargs) -> JobSpec:
    """Factory mirroring ``specification.create_specifier``."""
    return JobSpec(**kwargs).validate()
