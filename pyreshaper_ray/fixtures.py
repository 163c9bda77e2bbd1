"""Deterministic transcript fixture generator (FIXTURES.md, seed 42).

The transcript-domain translation of PyReshaper's ``source/test/mkTestData.py``
(public NCAR/PyReshaper repo): small, fully recomputable synthetic input that
exercises every variable class and edge case the engine must handle —
interleaved arrival order, duplicate turns, missing turns (gaps), single-turn
conversations, heavy skew, and codec stress paths.

Schema (authoritative, ``BASELINE.json:input_hint``)::

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp[us]

Edge cases (each has a dedicated test):
  F1-e1 skew: conv000007 / conv000123 get ``skew_turns`` turns (default 2400).
  F1-e2 interleaving: rows written globally sorted by ``ts`` across n_files.
  F1-e3 dups+gaps: every 25th conv duplicates turn_idx=3 and omits turn_idx=5.
  F1-e4 singleton: every 97th conv has exactly 1 turn.
  F1-e5 codec stress: conv000042 has exact 60 s gaps and constant char length.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS_US = np.datetime64("2026-01-01T00:00:00", "us").astype(np.int64)
_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua ut enim ad minim "
    "veniam quis nostrud exercitation ullamco laboris nisi ut aliquip "
)
_TOOLS = ("search", "python", "browser")
GAP_CHOICES_S = (5, 30, 70, 400)

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def n_turns(i: int, skew_turns: int = 2400) -> int:
    if i % 97 == 0:
        return 1  # F1-e4 singleton
    if i in (7, 123):
        return skew_turns  # F1-e1 skew
    return 4 + (i % 40)


def text_len(i: int, j: int) -> int:
    if i == 42:
        return 100  # F1-e5: constant value → Gorilla identical-XOR path
    return 20 + ((i * 31 + j * 17) % 400)


def turn_text(i: int, j: int) -> str:
    prefix = f"c{i}t{j}:"
    L = text_len(i, j)
    body = (_LOREM * (L // len(_LOREM) + 1))[: max(0, L - len(prefix))]
    return prefix + body


def _conv_rows(i: int, skew_turns: int):
    """Yield (turn_idx, role, text, tool, ts_us) for conversation i."""
    n = n_turns(i, skew_turns)
    ts = BASE_TS_US + i * 97 * 1_000_000
    prev_role = None
    alternator = 0  # 0 → user, 1 → assistant
    rows = []
    for j in range(n):
        if j > 0:
            if i == 42:
                gap_s = 60  # F1-e5: exact 60 s grid → all-zero delta-of-delta
            else:
                gap_s = GAP_CHOICES_S[(i * 7 + j) % 4]
            ts += gap_s * 1_000_000
        if j == 0 and i % 10 == 0:
            role = "system"
        elif prev_role == "assistant" and ((i * 31 + j * 53) % 100) < 15:
            role = "tool"
        else:
            role = ("user", "assistant")[alternator]
            alternator ^= 1
        tool = _TOOLS[(i + j) % 3] if role == "tool" else ""
        rows.append((j, role, turn_text(i, j), tool, ts))
        prev_role = role
    # F1-e3: duplicate turn 3 (identical payload), drop turn 5
    if i % 25 == 0 and i % 97 != 0 and i not in (7, 123):
        if n > 3:
            rows.append(rows[3])
        if n > 5:
            rows = [r for r in rows if r[0] != 5]
    return rows


def generate_transcripts(
    n_conv: int = 500, seed: int = 42, skew_turns: int = 2400
) -> pa.Table:
    """Build the transcript table, globally sorted by (ts, conv_id, turn_idx).

    Fully deterministic — `seed` is part of the signature for forward compat
    but every rule is a closed-form function of (i, j), so outputs are
    recomputable without re-running the generator.
    """
    conv_ids: list[str] = []
    turn_idx: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []
    for i in range(n_conv):
        cid = f"conv{i:06d}"
        for j, role, text, tool, ts in _conv_rows(i, skew_turns):
            conv_ids.append(cid)
            turn_idx.append(j)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(ts)
    # big corpora (the sf0.2+ scaling fixtures) exceed int32 string
    # offsets on the text column; 64-bit offsets keep the global
    # interleave sort's gather legal. Parquet writes both types
    # identically, so pipeline inputs are unchanged.
    text_type = pa.large_string() if len(texts) > 8_000_000 else pa.string()
    t = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, text_type),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(np.array(tss, dtype="int64"), pa.timestamp("us")),
        }
    )
    # F1-e2: interleave like real arrival order — global sort by ts.
    # The gather runs in slices: one whole-table take on a >2 GiB text
    # column overflows Arrow's int32 string offsets (hit at the sf0.2
    # scaling fixture); sliced takes keep every output chunk small and
    # concat_tables preserves chunking without re-concatenating buffers.
    idx = pa.compute.sort_indices(
        t, sort_keys=[("ts", "ascending"), ("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    step = 4_000_000
    if t.num_rows <= step:
        return t.take(idx)
    return pa.concat_tables(
        t.take(idx.slice(s, step)) for s in range(0, len(idx), step)
    )


def generate_conv_meta(n_conv: int = 500) -> pa.Table:
    """F2 `conv_meta` — small dimension table (ti-metadata analog)."""
    return pa.table(
        {
            "conv_id": pa.array([f"conv{i:06d}" for i in range(n_conv)]),
            "channel": pa.array([("api", "web", "cli")[i % 3] for i in range(n_conv)]),
            "model": pa.array([("m-a", "m-b")[i % 2] for i in range(n_conv)]),
        }
    )


def write_fixture(
    out_dir: str,
    n_conv: int = 500,
    n_files: int = 8,
    skew_turns: int = 2400,
) -> list[str]:
    """Write the fixture: `n_files` ts-contiguous parquet files under
    ``<out_dir>/transcripts/`` plus ``<out_dir>/conv_meta.parquet``.

    Returns the transcript file paths (their parent dir is the pipeline
    input). Idempotent: skips work if the directory already holds the
    expected files (generation is deterministic).
    """
    ts_dir = os.path.join(out_dir, "transcripts")
    os.makedirs(ts_dir, exist_ok=True)
    paths = [os.path.join(ts_dir, f"transcripts-{k:04d}.parquet") for k in range(n_files)]
    meta_path = os.path.join(out_dir, "conv_meta.parquet")
    marker = os.path.join(out_dir, f".fixture-{n_conv}-{n_files}-{skew_turns}")
    if os.path.exists(marker) and all(os.path.exists(p) for p in paths):
        return paths
    t = generate_transcripts(n_conv=n_conv, skew_turns=skew_turns)
    n = t.num_rows
    per = (n + n_files - 1) // n_files
    # the generator may hold text as large_string (>2 GiB corpora); each
    # per-file slice is small, so cast back to the canonical input schema
    # (parquet embeds the Arrow schema — readers must see string)
    i_text = t.schema.get_field_index("text")
    for k, p in enumerate(paths):
        sl = t.slice(k * per, per)
        if pa.types.is_large_string(sl.schema.field("text").type):
            sl = sl.set_column(
                i_text, "text", pa.compute.cast(sl["text"], pa.string())
            )
        pq.write_table(sl, p)
    pq.write_table(generate_conv_meta(n_conv), meta_path)
    with open(marker, "w") as f:
        f.write(str(n))
    return paths
