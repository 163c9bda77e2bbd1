"""Timeseries-native operators beyond the rollup tiers: OHLC bars,
time-weighted averages over irregular samples, and LTTB downsampling.

These are the downsample/summarize shapes a time-series store layers on the
raw series (the north_rule generalizes PyReshaper's slice→series pivot into
exactly this kind of rollup + downsample engine):

- ``ohlc_bars``: open/high/low/close per tumbling window, COMBINER-FIRST —
  each block reduces to one candidate row per (block, window) (argmin/argmax
  partials are mergeable once the deciding keys travel with the values), so
  the exchange is windows×blocks-sized, never event-sized.
- ``time_weighted_value``: per-entity time-weighted value sum over
  irregular samples (value held until the next observation) — exact integer
  (cents × whole seconds) numerator/denominator so the DuckDB oracle matches
  bit-for-bit. One groupby(user) co-partition exchange.
- ``lttb_downsample``: Largest-Triangle-Three-Buckets representative-point
  selection per series (Steinarsson 2013, the standard visual-fidelity
  downsampler) — per-series inside ``groupby(key).map_groups``; the
  sequential bucket walk is O(n) per series with vectorized per-bucket
  areas. Algorithmic point choice → rows-only driver entry, property-gated
  in tests (endpoints kept, exact count, points ⊆ input, deterministic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .analytics import to_cents

_US_PER_S = 1_000_000


def ohlc_bars(events_ds: "ray.data.Dataset", unit: str = "minute") -> "ray.data.Dataset":
    """OHLC candles of ``value`` (exact cents) per tumbling window.

    open = value at min (ts, event_id) in the window, close = at max —
    the event id is the deterministic tie-break, carried through the
    combiner so ties merge identically everywhere.

    Output: window_start, open_cents, high_cents, low_cents, close_cents,
    n_events (BIGINTs).
    """

    def partial(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch["ts"], unit=unit)
        t = pa.table(
            {
                "w": w,
                "ts_us": pc.cast(pc.cast(batch["ts"], pa.int64()), pa.int64()),
                "eid": pc.cast(batch["event_id"], pa.int64()),
                "v": to_cents(batch["value"]),
            }
        )
        idx = pc.sort_indices(
            t, sort_keys=[("w", "ascending"), ("ts_us", "ascending"), ("eid", "ascending")]
        )
        t = t.take(idx)
        wk = t["w"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        starts = np.flatnonzero(np.r_[True, wk[1:] != wk[:-1]])
        ends = np.r_[starts[1:], len(wk)] - 1
        v = t["v"].to_numpy(zero_copy_only=False)
        ts_us = t["ts_us"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "w": pa.array(wk[starts], pa.timestamp("us")),
                "open_ts": pa.array(ts_us[starts], pa.int64()),
                "open_id": pa.array(eid[starts], pa.int64()),
                "open_v": pa.array(v[starts], pa.int64()),
                "close_ts": pa.array(ts_us[ends], pa.int64()),
                "close_id": pa.array(eid[ends], pa.int64()),
                "close_v": pa.array(v[ends], pa.int64()),
                "vmin": pa.array(np.minimum.reduceat(v, starts), pa.int64()),
                "vmax": pa.array(np.maximum.reduceat(v, starts), pa.int64()),
                "n": pa.array(np.diff(np.r_[starts, len(wk)]).astype(np.int64), pa.int64()),
            }
        )

    OUT = pa.schema(
        [
            ("window_start", pa.timestamp("us")),
            ("open_cents", pa.int64()),
            ("high_cents", pa.int64()),
            ("low_cents", pa.int64()),
            ("close_cents", pa.int64()),
            ("n_events", pa.int64()),
        ]
    )

    # final merge groups by a COARSE bucket of the window key (hash
    # partitioning keeps each window's partials together) so the kernel
    # stays one vectorized run-merge over MANY windows — per-window
    # map_groups would cost one Python call per window
    _P = 256

    def add_kb(b: pa.Table) -> pa.Table:
        wk = pc.cast(pc.cast(b["w"], pa.int64()), pa.int64())
        return b.append_column(
            "kb",
            pc.bit_wise_and(
                pc.divide(wk, pa.scalar(60_000_000, pa.int64())),
                pa.scalar(_P - 1, pa.int64()),
            ),
        )

    def merge_block(block: pa.Table) -> pa.Table:
        if block.num_columns == 0 or block.num_rows == 0:
            return OUT.empty_table()
        # open: first row under (w, open_ts, open_id) order
        idx = pc.sort_indices(
            block,
            sort_keys=[
                ("w", "ascending"),
                ("open_ts", "ascending"),
                ("open_id", "ascending"),
            ],
        )
        t = block.take(idx)
        wk = t["w"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        starts = np.flatnonzero(np.r_[True, wk[1:] != wk[:-1]])
        bounds = np.r_[starts, len(wk)]
        open_v = t["open_v"].to_numpy(zero_copy_only=False)[starts]
        vmin = np.minimum.reduceat(t["vmin"].to_numpy(zero_copy_only=False), starts)
        vmax = np.maximum.reduceat(t["vmax"].to_numpy(zero_copy_only=False), starts)
        n = np.add.reduceat(t["n"].to_numpy(zero_copy_only=False), starts)
        # close: last row under (w, close_ts, close_id) order
        idx2 = pc.sort_indices(
            block,
            sort_keys=[
                ("w", "ascending"),
                ("close_ts", "ascending"),
                ("close_id", "ascending"),
            ],
        )
        t2 = block.take(idx2)
        close_v = t2["close_v"].to_numpy(zero_copy_only=False)[bounds[1:] - 1]
        return pa.table(
            {
                "window_start": pa.array(wk[starts], pa.timestamp("us")),
                "open_cents": pa.array(open_v, pa.int64()),
                "high_cents": pa.array(vmax, pa.int64()),
                "low_cents": pa.array(vmin, pa.int64()),
                "close_cents": pa.array(close_v, pa.int64()),
                "n_events": pa.array(n, pa.int64()),
            }
        )

    p = events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    p = p.map_batches(add_kb, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("kb").map_groups(merge_block, batch_format="pyarrow")


def time_weighted_value(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-user time-weighted value components over irregular samples: each
    observation's value holds until the user's next observation
    (last-observation-carried-forward weighting; the final observation has
    no interval and contributes nothing — SQL's LEAD-IS-NULL row).

    Exact integers: durations floor to whole seconds, values are cents, so
    numerator Σ v·Δt and denominator Σ Δt match the oracle bit-for-bit.
    Users with a single event emit nothing (no interval exists).

    Output: user_id, num_cents_s (Σ value_cents × Δt_s), den_s (Σ Δt_s).
    """

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "ts_us": pc.cast(pc.cast(batch["ts"], pa.int64()), pa.int64()),
                "eid": pc.cast(batch["event_id"], pa.int64()),
                "v": to_cents(batch["value"]),
            }
        )

    OUT = pa.schema(
        [("user_id", pa.int64()), ("num_cents_s", pa.int64()), ("den_s", pa.int64())]
    )

    def per_user(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows < 2:
            return OUT.empty_table()
        idx = pc.sort_indices(
            group, sort_keys=[("ts_us", "ascending"), ("eid", "ascending")]
        )
        t = group.take(idx)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        dt_s = (ts[1:] - ts[:-1]) // _US_PER_S
        return pa.table(
            {
                "user_id": t["user_id"][:1],
                "num_cents_s": pa.array([int((v[:-1] * dt_s).sum())], pa.int64()),
                "den_s": pa.array([int(dt_s.sum())], pa.int64()),
            }
        )

    p = events_ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def lttb_select(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB-selected points of one series (x ascending).

    Largest-Triangle-Three-Buckets: keep the first and last points; split
    the interior into n_out−2 buckets; in each bucket keep the point whose
    triangle with the PREVIOUS selected point and the NEXT bucket's mean is
    largest (ties → first such point). Deterministic.
    """
    n = len(x)
    if n_out >= n:
        return np.arange(n, dtype=np.int64)
    if n_out <= 2:
        return np.array([0, n - 1], dtype=np.int64)
    # interior bucket boundaries over points 1 .. n-2
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    a = 0  # previously selected index
    xf = x.astype(np.float64)
    yf = y.astype(np.float64)
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = edges[i + 1], (n if i == n_out - 3 else edges[i + 2])
        bx, by = xf[nlo:nhi].mean(), yf[nlo:nhi].mean()
        area = np.abs(
            (xf[a] - bx) * (yf[lo:hi] - yf[a]) - (xf[a] - xf[lo:hi]) * (by - yf[a])
        )
        a = lo + int(np.argmax(area))
        out[i + 1] = a
    out[-1] = n - 1
    return out


def lttb_downsample(
    events_ds: "ray.data.Dataset", n_out: int = 8
) -> "ray.data.Dataset":
    """Per-user LTTB downsample of the (ts, value_cents) series to at most
    ``n_out`` visually-representative points — the standard downsampler for
    rendering long series (Steinarsson 2013). One groupby(user)
    co-partition exchange; the per-series walk is O(n).

    Output: user_id, point_idx (0..k-1), ts, value_cents.
    """

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "ts_us": pc.cast(pc.cast(batch["ts"], pa.int64()), pa.int64()),
                "eid": pc.cast(batch["event_id"], pa.int64()),
                "v": to_cents(batch["value"]),
            }
        )

    OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("point_idx", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("value_cents", pa.int64()),
        ]
    )

    def per_user(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return OUT.empty_table()
        idx = pc.sort_indices(
            group, sort_keys=[("ts_us", "ascending"), ("eid", "ascending")]
        )
        t = group.take(idx)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        sel = lttb_select(ts, v, n_out)
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(len(sel), t["user_id"][0].as_py()), pa.int64()
                ),
                "point_idx": pa.array(np.arange(len(sel)), pa.int64()),
                "ts": pa.array(ts[sel], pa.timestamp("us")),
                "value_cents": pa.array(v[sel], pa.int64()),
            }
        )

    p = events_ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def _minute_counts_dense(ds_transcripts: "ray.data.Dataset") -> np.ndarray:
    """Dense zero-filled minute-grid turn counts for the whole corpus.

    Per-block partial counts (Arrow ``group_by`` over the minute key) reduce
    each block to at most minutes-domain rows, the global ``groupby(minute)``
    exchange therefore moves one row per (block, minute) — never one per
    turn — and the final collect is domain-sized (one row per minute of
    corpus span), the documented result-sized finalize. At 10^12 turns the
    grid for a year of data is ~526k rows: driver-trivial.
    """
    from ..util import collect_table

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.floor_temporal(batch["ts"], unit="minute")
        g = pa.table({"minute": m}).group_by("minute").aggregate([([], "count_all")])
        return pa.table(
            {
                "minute": g["minute"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    counts = (
        ds_transcripts.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("minute")
        .sum("n")
    )
    t = collect_table(counts)
    if t.num_rows == 0:
        return np.zeros(0, np.int64)
    mins = (
        t["minute"].to_numpy(zero_copy_only=False).astype("datetime64[m]").astype(np.int64)
    )
    n = t["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = mins.min(), mins.max()
    dense = np.zeros(hi - lo + 1, np.int64)
    dense[mins - lo] = n
    return dense


def acf_minute_counts(
    ds_transcripts: "ray.data.Dataset", lags: tuple[int, ...] = (1, 2, 3)
) -> pa.Table:
    """Autocorrelation COMPONENTS of the corpus-wide per-minute turn-count
    series at the given lags — the seasonality probe a rollup store runs
    before choosing retention tiers.

    The series is the dense zero-filled minute grid between the corpus'
    first and last active minute (missing minutes count 0, same convention
    as the gap-fill tier). For lag k, pairs are (x_t, x_{t+k}) over the
    grid; the output carries the EXACT integer Pearson components (n, Σx,
    Σy, Σxy, Σx², Σy²) per lag, so the result is bit-exact under any block
    order and the caller/SQL derives r — the same integer-components
    convention as ``corr_components``.
    """
    dense = _minute_counts_dense(ds_transcripts)
    rows = []
    for k in lags:
        if len(dense) > k:
            x = dense[:-k]
            y = dense[k:]
        else:
            x = y = np.zeros(0, np.int64)
        rows.append(
            (
                k,
                len(x),
                int(x.sum()),
                int(y.sum()),
                int((x * y).sum()),
                int((x * x).sum()),
                int((y * y).sum()),
            )
        )
    cols = list(zip(*rows))
    return pa.table(
        {
            "lag": pa.array(cols[0], pa.int64()),
            "n": pa.array(cols[1], pa.int64()),
            "sum_x": pa.array(cols[2], pa.int64()),
            "sum_y": pa.array(cols[3], pa.int64()),
            "sum_xy": pa.array(cols[4], pa.int64()),
            "sum_x2": pa.array(cols[5], pa.int64()),
            "sum_y2": pa.array(cols[6], pa.int64()),
        }
    )


def hour_dod_delta(ds_transcripts: "ray.data.Dataset") -> pa.Table:
    """Day-over-day hourly anomaly table: each hour's turn count next to the
    count of the SAME hour one day earlier, plus the exact delta — the
    seasonal-naive residual every ops dashboard alerts on.

    Combiner-first hourly counts (per-block Arrow ``group_by``, then one
    domain-sized ``groupby(hour)`` exchange); the day-over-day alignment is
    a numpy index shift on the hours-domain-sized collected table (the
    documented result-sized finalize — ~8.8k rows/year). Only hours whose
    previous-day hour exists in the corpus span are emitted (inner-join
    semantics), all counts exact int64.
    """
    from ..util import collect_table

    def partial(batch: pa.Table) -> pa.Table:
        h = pc.floor_temporal(batch["ts"], unit="hour")
        g = pa.table({"hour": h}).group_by("hour").aggregate([([], "count_all")])
        return pa.table(
            {"hour": g["hour"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    counts = (
        ds_transcripts.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("hour")
        .sum("n")
    )
    t = collect_table(counts)
    if t.num_rows == 0:
        return pa.table(
            {
                "hour": pa.array([], pa.timestamp("us")),
                "n": pa.array([], pa.int64()),
                "prev_n": pa.array([], pa.int64()),
                "delta": pa.array([], pa.int64()),
            }
        )
    hrs = (
        t["hour"].to_numpy(zero_copy_only=False).astype("datetime64[h]").astype(np.int64)
    )
    n = t["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    # sparse hour -> count map via searchsorted on the sorted hour keys
    order = np.argsort(hrs)
    hrs_s, n_s = hrs[order], n[order]
    want = hrs_s - 24  # same hour, previous day
    pos = np.searchsorted(hrs_s, want)
    pos_c = np.clip(pos, 0, len(hrs_s) - 1)
    has_prev = hrs_s[pos_c] == want
    cur_n = n_s[has_prev]
    prev_n = n_s[pos_c[has_prev]]
    return pa.table(
        {
            "hour": pa.array(
                hrs_s[has_prev].astype("datetime64[h]").astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "n": pa.array(cur_n, pa.int64()),
            "prev_n": pa.array(prev_n, pa.int64()),
            "delta": pa.array(cur_n - prev_n, pa.int64()),
        }
    )


def counter_increase_per_user(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Prometheus-style ``increase()``: treat each user's value series as a
    monotone counter that may RESET (drop), and compute the total observed
    increase — Σ (v_i − v_{i−1}) when non-negative, else v_i (the counter
    restarted and climbed back to v_i). Exact integer cents; ordering is
    (ts, event_id) so simultaneous samples are deterministic.

    Per-user kernel in ``groupby(user_id).map_groups``: one vectorized diff
    over the sorted series. The first sample contributes nothing (no prior
    observation), matching PromQL semantics.
    """

    def per_user(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(idx)
        v = to_cents(g["value"]).to_numpy(zero_copy_only=False)
        if len(v) < 2:
            inc = 0
            resets = 0
        else:
            d = np.diff(v)
            resets = int((d < 0).sum())
            inc = int(np.where(d >= 0, d, v[1:]).sum())
        return pa.table(
            {
                "user_id": pa.array([group["user_id"][0].as_py()], pa.int64()),
                "increase_cents": pa.array([inc], pa.int64()),
                "n_resets": pa.array([resets], pa.int64()),
            }
        )

    return events_ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def gap_survival_census(events_ds: "ray.data.Dataset") -> pa.Table:
    """Survival curve of inter-event gaps: for each threshold (1m, 5m, 1h,
    1d), how many consecutive-event gaps (per user, ts-ordered) are >= it —
    the idle-time distribution a session-gap or TTL policy is tuned from.

    Per-user gaps come from the standard co-partition kernel; each group
    reduces to ONE row of per-threshold counts, the final reduce is a
    4-integer sum — the exchange after the groupby is group-count-sized.
    """
    TH_US = np.array([60, 300, 3600, 86400], np.int64) * 1_000_000
    TH_LABEL = ["1m", "5m", "1h", "1d"]

    def per_user(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        ts = (
            group["ts"]
            .take(idx)
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        gaps = np.diff(ts)
        counts = (gaps[None, :] >= TH_US[:, None]).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "n_gaps": pa.array([len(gaps)], pa.int64()),
                **{
                    f"ge_{lab}": pa.array([int(c)], pa.int64())
                    for lab, c in zip(TH_LABEL, counts)
                },
            }
        )

    from ray.data.aggregate import Sum as _Sum

    from ..util import collect_table

    agg = (
        events_ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("g")
        .aggregate(
            _Sum("n_gaps", alias_name="n_gaps"),
            *[_Sum(f"ge_{lab}", alias_name=f"ge_{lab}") for lab in TH_LABEL],
        )
    )
    t = collect_table(agg)
    if t.num_rows == 0:
        vals = {"n_gaps": 0, **{f"ge_{lab}": 0 for lab in TH_LABEL}}
    else:
        vals = {c: t[c][0].as_py() for c in ["n_gaps"] + [f"ge_{lab}" for lab in TH_LABEL]}
    return pa.table(
        {
            "threshold": pa.array(TH_LABEL, pa.string()),
            "n_gaps": pa.array([vals["n_gaps"]] * len(TH_LABEL), pa.int64()),
            "n_ge": pa.array([vals[f"ge_{lab}"] for lab in TH_LABEL], pa.int64()),
        }
    )


def paa_segments(
    events_ds: "ray.data.Dataset", n_segments: int = 4
) -> "ray.data.Dataset":
    """Piecewise Aggregate Approximation (PAA) — the classic time-series
    dimensionality reduction: each user's (ts, event_id)-ordered value
    stream splits into ``n_segments`` contiguous runs (NTILE allocation:
    the first ``len % k`` segments take the extra row) and each segment
    reports its exact row count and integer-cents sum (the caller derives
    the segment mean; sums stay bit-exact where means would not).

    One groupby(user_id) exchange, a numpy ``repeat`` segment assignment
    (no Python loop), per-group Arrow aggregate — output is
    users × ``n_segments`` rows.

    Output: user_id, seg_idx (1-based, NTILE convention), n, cents_sum.
    """

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts": batch["ts"],
                "cents": to_cents(batch["value"]),
            }
        )

    OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("seg_idx", pa.int64()),
            ("n", pa.int64()),
            ("cents_sum", pa.int64()),
        ]
    )

    def per_user(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return OUT.empty_table()
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        n = g.num_rows
        base, extra = divmod(n, n_segments)
        sizes = np.full(n_segments, base, np.int64)
        sizes[:extra] += 1
        seg = np.repeat(np.arange(1, n_segments + 1), sizes)
        t = pa.table(
            {
                "user_id": g["user_id"],
                "seg_idx": pa.array(seg, pa.int64()),
                "cents": g["cents"],
            }
        )
        agg = t.group_by(["user_id", "seg_idx"]).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )
        return pa.table(
            {
                "user_id": agg["user_id"],
                "seg_idx": agg["seg_idx"],
                "n": pc.cast(agg["cents_count"], pa.int64()),
                "cents_sum": agg["cents_sum"],
            }
        )

    return (
        events_ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def hourly_seasonality(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Hour-of-day seasonality profile per event type: the 24-bin diurnal
    histogram plus each bin's share of the type's total in floor
    parts-per-million — the seasonal fingerprint capacity planners and
    anomaly baselines start from.

    Combiner-first per-block (type, hour) counts, one domain-sized groupby
    (|types|×24 rows max), share computed on the collected domain table
    with Python ints (n·10⁶ never trusts fixed-width multiply at
    10¹²-row scale).

    Output: event_type, hour (0–23), n, share_ppm.
    """
    import ray

    from ..util import collect_table

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.cast(pc.hour(batch["ts"]), pa.int64())
        g = (
            pa.table({"event_type": batch["event_type"], "hour": hour})
            .group_by(["event_type", "hour"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "hour": g["hour"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    OUT = pa.schema(
        [
            ("event_type", pa.string()),
            ("hour", pa.int64()),
            ("n", pa.int64()),
            ("share_ppm", pa.int64()),
        ]
    )
    cells = collect_table(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour"])
        .sum("n")
    )
    if cells.num_rows == 0 or "event_type" not in cells.column_names:
        return ray.data.from_arrow(OUT.empty_table())
    types = cells["event_type"].to_pylist()
    hours = cells["hour"].to_pylist()
    ns = cells["sum(n)"].to_pylist()
    row_tot: dict[str, int] = {}
    for t, n in zip(types, ns):
        row_tot[t] = row_tot.get(t, 0) + n
    out = pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "hour": pa.array(hours, pa.int64()),
            "n": pa.array(ns, pa.int64()),
            "share_ppm": pa.array(
                [n * 1_000_000 // row_tot[t] for t, n in zip(types, ns)],
                pa.int64(),
            ),
        }
    )
    return ray.data.from_arrow(out)


def retention_policy_census(
    ds_transcripts: "ray.data.Dataset",
    keep_1m_days: int = 7,
    keep_1h_days: int = 90,
) -> pa.Table:
    """Retention-policy dry run: for each rollup tier, how many
    (conv_id, window) rows the standard policy would keep vs expire —
    1m windows kept ``keep_1m_days`` days, 1h kept ``keep_1h_days`` days,
    1d kept forever — measured against ``now`` = the corpus's newest
    1-minute window (deterministic, no wall clock).  The sizing pass a
    tiered engine runs before applying `retain`.

    Distributed shape: one per-block DISTINCT (conv_id, w1m) projection
    (the only turn-sized pass), one groupby exchange over the 1m window
    domain; the 1h / 1d tier row sets derive from the 1m distinct set by
    refloor + distinct (tier-domain-sized exchanges).  ``now`` and the
    keep/drop totals are result-sized driver aggregates.

    Output (3 rows): tier, horizon_days (0 = unbounded), n_keep, n_drop.
    """
    from ..util import collect_table

    def w1m(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.schema(
                [("conv_id", pa.string()), ("window_start", pa.timestamp("us"))]
            ).empty_table()
        return (
            pa.table(
                {
                    "conv_id": batch["conv_id"],
                    "window_start": pc.floor_temporal(batch["ts"], unit="minute"),
                }
            )
            .group_by(["conv_id", "window_start"])
            .aggregate([])
        )

    def refloor(unit: str):
        def fn(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return pa.schema(
                    [("conv_id", pa.string()), ("window_start", pa.timestamp("us"))]
                ).empty_table()
            # Ray's hash aggregate returns the timestamp KEY at seconds
            # precision — lossless for floored windows, but normalize back
            # to the engine's canonical us before re-flooring
            return (
                pa.table(
                    {
                        "conv_id": batch["conv_id"],
                        "window_start": pc.floor_temporal(
                            pc.cast(batch["window_start"], pa.timestamp("us")),
                            unit=unit,
                        ),
                    }
                )
                .group_by(["conv_id", "window_start"])
                .aggregate([])
            )

        return fn

    def distinct(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        # tier-sized output: hash-partitioned Arrow group_by, not the
        # built-in reduce (~70 µs of Python per output group)
        from ..util import hash_partitioned_agg

        return hash_partitioned_agg(
            ds,
            keys=["conv_id", "window_start"],
            aggs=[(None, "count_all", "_n")],
        )

    t1m = distinct(
        ds_transcripts.map_batches(w1m, batch_format="pyarrow", zero_copy_batch=True)
    ).materialize()  # tier-sized (conv × active minutes), reused 3×

    t1h = distinct(
        t1m.map_batches(refloor("hour"), batch_format="pyarrow", zero_copy_batch=True)
    )
    t1d = distinct(
        t1m.map_batches(refloor("day"), batch_format="pyarrow", zero_copy_batch=True)
    )

    rows: list[tuple[str, int, int, int]] = []
    now = t1m.max("window_start")  # result-sized driver aggregate
    now_us = None if now is None else pa.scalar(now, pa.timestamp("us")).cast(pa.int64()).as_py()

    def census(ds: "ray.data.Dataset", tier: str, days: int) -> None:
        if now_us is None:
            rows.append((tier, days, 0, 0))
            return
        cutoff = now_us - days * 86_400_000_000

        def partial(b: pa.Table) -> pa.Table:
            if b.num_columns == 0 or b.num_rows == 0:
                return pa.table(
                    {"k": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
                )
            # normalize the (possibly seconds-precision) aggregate key to us
            w = pc.cast(pc.cast(b["window_start"], pa.timestamp("us")), pa.int64())
            keep = (
                b.num_rows
                if days == 0
                else pc.sum(
                    pc.cast(pc.greater_equal(w, pa.scalar(cutoff, pa.int64())), pa.int64())
                ).as_py()
                or 0
            )
            return pa.table(
                {
                    "k": pa.array([keep], pa.int64()),
                    "d": pa.array([b.num_rows - keep], pa.int64()),
                }
            )

        t = collect_table(ds.map_batches(partial, batch_format="pyarrow"))
        nk = int(pc.sum(t["k"]).as_py() or 0)
        nd = int(pc.sum(t["d"]).as_py() or 0)
        rows.append((tier, days, nk, nd))

    census(t1m, "1m", keep_1m_days)
    census(t1h, "1h", keep_1h_days)
    census(t1d, "1d", 0)
    return pa.table(
        {
            "tier": pa.array([r[0] for r in rows], pa.string()),
            "horizon_days": pa.array([r[1] for r in rows], pa.int64()),
            "n_keep": pa.array([r[2] for r in rows], pa.int64()),
            "n_drop": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def lead_lag_daily_xcorr(
    events_ds: "ray.data.Dataset",
    type_x: str = "click",
    type_y: str = "purchase",
    max_lag_days: int = 3,
) -> pa.Table:
    """Lead-lag cross-correlation components between two event types'
    DAILY count series: for each lag l in [-max_lag, +max_lag], the
    integer sums over days d where both series have a row at (d, d+l) —
    Σ x_d·y_{d+l}, Σ x_d, Σ y_{d+l}, and the overlap day count.  The
    caller derives the Pearson r per lag; sums stay bit-exact where the
    ratio would not.  Positive lag = y trails x by l days (x leads).

    Distributed shape: ONE event-sized pass — a per-block (type, day)
    count combiner over just the two types — then a day-domain-sized
    groupby; the lag alignment runs on the collected day table (calendar-
    sized, two int64 columns) with numpy searchsorted joins per lag.

    Output (2·max_lag+1 rows): lag_days, n_days, sum_xy, sum_x, sum_y.
    """
    from ..util import collect_table

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "day": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        keep = pc.is_in(
            batch["event_type"], value_set=pa.array([type_x, type_y])
        )
        b = batch.filter(keep)
        d = pc.cast(pc.floor_temporal(b["ts"], unit="day"), pa.int64())
        g = (
            pa.table({"event_type": b["event_type"], "day": d})
            .group_by(["event_type", "day"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "day": g["day"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = collect_table(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day"])
        .sum("n")
    )
    lags = list(range(-max_lag_days, max_lag_days + 1))
    if cells.num_rows == 0 or "event_type" not in cells.column_names:
        z = [0] * len(lags)
        return pa.table(
            {
                "lag_days": pa.array(lags, pa.int64()),
                "n_days": pa.array(z, pa.int64()),
                "sum_xy": pa.array(z, pa.int64()),
                "sum_x": pa.array(z, pa.int64()),
                "sum_y": pa.array(z, pa.int64()),
            }
        )
    et = cells["event_type"].to_numpy(zero_copy_only=False)
    day = cells["day"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = cells["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    mx = et == type_x
    my = et == type_y
    xd, xc = day[mx], n[mx]
    yd, yc = day[my], n[my]
    ox = np.argsort(xd)
    xd, xc = xd[ox], xc[ox]
    oy = np.argsort(yd)
    yd, yc = yd[oy], yc[oy]
    rows = {"lag_days": [], "n_days": [], "sum_xy": [], "sum_x": [], "sum_y": []}
    for lag in lags:
        target = xd + lag * DAY_US
        pos = np.searchsorted(yd, target)
        pos_c = np.clip(pos, 0, max(len(yd) - 1, 0))
        hit = (len(yd) > 0) & (yd[pos_c] == target) if len(yd) else np.zeros(
            len(target), bool
        )
        rows["lag_days"].append(lag)
        rows["n_days"].append(int(hit.sum()))
        rows["sum_xy"].append(int((xc[hit] * yc[pos_c[hit]]).sum()))
        rows["sum_x"].append(int(xc[hit].sum()))
        rows["sum_y"].append(int(yc[pos_c[hit]].sum()))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


def haar_minute_counts(
    ds_transcripts: "ray.data.Dataset", max_len: int = 1024
) -> pa.Table:
    """Unnormalized Haar wavelet decomposition of the corpus-wide
    per-minute turn-count series — the multi-resolution energy profile
    (which time scales carry the activity) used for similarity search and
    compression over time series.

    The dense zero-filled minute grid (same convention as ``acf``) is
    truncated to the first ``max_len`` minutes and zero-padded to a power
    of two; each level emits pair sums and pair differences WITHOUT the
    /2 normalization, so every coefficient is an exact integer (level-ℓ
    coefficients carry an implicit 2^ℓ scale the caller divides off).
    The combiner-reduced minute-count table is the only thing that crosses
    the exchange; the O(n) transform runs on the driver over the
    grid-sized vector.

    Output: level (BIGINT, 0 = finest detail), idx, coeff (BIGINTs);
    the final row (level = n_levels, idx = 0) is the total sum.
    """
    dense = _minute_counts_dense(ds_transcripts)[:max_len]
    n = 1
    while n < max(len(dense), 1):
        n *= 2
    x = np.zeros(n, np.int64)
    x[: len(dense)] = dense
    levels, idxs, coeffs = [], [], []
    level = 0
    cur = x
    while len(cur) > 1:
        a, b = cur[0::2], cur[1::2]
        diff = a - b
        levels.append(np.full(len(diff), level, np.int64))
        idxs.append(np.arange(len(diff), dtype=np.int64))
        coeffs.append(diff)
        cur = a + b
        level += 1
    levels.append(np.array([level], np.int64))
    idxs.append(np.array([0], np.int64))
    coeffs.append(cur[:1] if len(cur) else np.array([0], np.int64))
    return pa.table(
        {
            "level": pa.array(np.concatenate(levels), pa.int64()),
            "idx": pa.array(np.concatenate(idxs), pa.int64()),
            "coeff": pa.array(np.concatenate(coeffs), pa.int64()),
        }
    )


RESAMPLE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("j", pa.int64()),
        ("grid_ts", pa.timestamp("us")),
        ("value", pa.int64()),
    ]
)


def resample_uniform(
    ds_normalized: "ray.data.Dataset", k: int = 8
) -> "ray.data.Dataset":
    """Resample each conversation's char_len series onto a uniform k-point
    time grid by linear interpolation — the classic `resample()` that turns
    irregular event series into fixed-length feature vectors (the input
    shape clustering / sequence models need).

    Grid: ``g_j = t0 + (j·(t1−t0)) // (k−1)`` for j ∈ [0, k) over the
    conversation's [first, last] turn timestamps — integer microseconds,
    floor division, so every grid point is exact. Value at g_j is the
    floor-division lerp between the bracketing samples::

        v = v_i + trunc((v_{i+1} − v_i) · (g − p_i) / (p_{i+1} − p_i))

    all in int64, with division TRUNCATED toward zero — DuckDB's ``//``
    truncates for negative numerators (measured: ``-7 // 2 = -3``) while
    numpy floors, so the kernel applies ``sign · (|num| // den)`` to match
    the SQL bit-for-bit on downward slopes — choosing the LAST
    sample at ties (searchsorted right − 1) — the same bracket the oracle's
    ``s.ts ≤ g < s.next_ts`` join picks, so outputs are bit-exact.
    Single-point conversations (t1 == t0) are excluded on both sides.

    Distributed shape: per-conversation kernel under ``groupby(conv_id)``
    — the same co-location contract as gap-fill; vectorized searchsorted
    over all k grid points at once.

    Output: conv_id, j, grid_ts, value (k rows per multi-point conv).
    """

    def kernel(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("turn_idx", "ascending")]
        )
        g = group.take(idx)
        ts = (
            g["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        vals = g["char_len"].to_numpy(zero_copy_only=False).astype(np.int64)
        t0, t1 = int(ts[0]), int(ts[-1])
        if t1 <= t0:
            return RESAMPLE_SCHEMA.empty_table()
        j = np.arange(k, dtype=np.int64)
        grid = t0 + (j * (t1 - t0)) // (k - 1)
        i = np.searchsorted(ts, grid, side="right") - 1
        at_end = i >= len(ts) - 1
        i_next = np.minimum(i + 1, len(ts) - 1)
        num = (vals[i_next] - vals[i]) * (grid - ts[i])
        den = np.where(at_end, 1, ts[i_next] - ts[i])
        q = np.sign(num) * (np.abs(num) // den)  # trunc-toward-zero == SQL //
        v = np.where(at_end, vals[i], vals[i] + q)
        return pa.table(
            {
                "conv_id": pa.array([g["conv_id"][0].as_py()] * k, pa.string()),
                "j": pa.array(j, pa.int64()),
                "grid_ts": pa.array(grid, pa.timestamp("us")),
                "value": pa.array(v, pa.int64()),
            }
        )

    return ds_normalized.groupby("conv_id").map_groups(
        kernel, batch_format="pyarrow"
    )


def seasonal_naive_error(
    events_ds: "ray.data.Dataset", season_days: int = 7
) -> pa.Table:
    """Seasonal-naive backtest per event type: forecast each day's event
    count with the count from ``season_days`` earlier (the week-ago naive
    every anomaly detector benchmarks against), and report the exact
    integer absolute-error profile — the capacity-planning sanity check a
    rollup store runs before trusting fancier models.

    Combiner-first per-(event_type, day) counts (per-block Arrow
    ``group_by`` partials, one domain-sized ``groupby`` exchange —
    types×days rows, never event-sized), then the lag alignment is a numpy
    ``searchsorted`` shift on the collected domain-sized table (documented
    result-sized finalize, same convention as ``hour_dod_delta``). Only
    (type, day) cells whose week-ago cell EXISTS in the counts table are
    scored (inner-join semantics — the corpus edge days forecast nothing);
    missing-vs-zero distinction therefore matches the SQL restatement's
    self-join exactly.

    Output: one row per event_type with n_days scored, total/max absolute
    error, and totals of actual vs forecast — all exact int64.
    """
    from ray.data.aggregate import Sum as _Sum

    from ..util import collect_table

    def partial(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch["ts"], unit="day")
        g = (
            pa.table({"event_type": batch["event_type"], "day": d})
            .group_by(["event_type", "day"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "day": g["day"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    counts = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day"])
        .aggregate(_Sum("n", alias_name="n"))
    )
    t = collect_table(counts)  # domain-sized: |types| × |days|
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "n_days": pa.array([], pa.int64()),
            "total_abs_err": pa.array([], pa.int64()),
            "max_abs_err": pa.array([], pa.int64()),
            "total_actual": pa.array([], pa.int64()),
            "total_forecast": pa.array([], pa.int64()),
        }
    )
    if t.num_rows == 0:
        return empty
    et = t["event_type"].to_numpy(zero_copy_only=False)
    day = (
        t["day"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
    )
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    # composite sort key (type, day) so searchsorted can find week-ago cells
    order = np.lexsort((day, et))
    et_s, day_s, n_s = et[order], day[order], n[order]
    # encode type as dense rank to build an integer composite key
    uniq, type_id = np.unique(et_s, return_inverse=True)
    span = day_s.max() - day_s.min() + 1 + season_days
    key = type_id * span + (day_s - day_s.min())
    want = key - season_days
    pos = np.searchsorted(key, want)
    pos_c = np.clip(pos, 0, len(key) - 1)
    has_prev = key[pos_c] == want
    actual = n_s[has_prev]
    forecast = n_s[pos_c[has_prev]]
    err = np.abs(actual - forecast)
    tid = type_id[has_prev]
    rows = []
    for i, name in enumerate(uniq):
        m = tid == i
        if not m.any():
            continue
        rows.append(
            (
                str(name),
                int(m.sum()),
                int(err[m].sum()),
                int(err[m].max()),
                int(actual[m].sum()),
                int(forecast[m].sum()),
            )
        )
    if not rows:
        return empty
    cols = list(zip(*rows))
    return pa.table(
        {
            "event_type": pa.array(cols[0], pa.string()),
            "n_days": pa.array(cols[1], pa.int64()),
            "total_abs_err": pa.array(cols[2], pa.int64()),
            "max_abs_err": pa.array(cols[3], pa.int64()),
            "total_actual": pa.array(cols[4], pa.int64()),
            "total_forecast": pa.array(cols[5], pa.int64()),
        }
    )


def daily_type_entropy(events_ds: "ray.data.Dataset") -> pa.Table:
    """Shannon entropy of the event-type mix per day, in exact micro-nats —
    the diversity drift monitor a data-curation pipeline alarms on when one
    source/type starts dominating a day's traffic.

    Float policy (repo-wide idiom): each ``ln(count)`` is quantized ONCE to
    integer micro-nats (``floor(ln(n)*1e6 + 0.5)``), then the entropy

        H_micro = floor( Σ_t n_t * (L(N) − L(n_t))  //  N )

    is pure integer arithmetic — bit-identical in numpy and the DuckDB
    oracle as long as both engines' ``ln`` agree within 0.5 micro-nats
    (the same tolerance :func:`~.text.tfidf_top_term` already relies on).

    Combiner-first per-(day, type) counts; one domain-sized exchange; the
    entropy fold is a numpy pass over the collected domain-sized table.

    Output: day, n_events (int64), n_types (int64), entropy_micro_nats
    (int64).
    """
    from ray.data.aggregate import Sum as _Sum

    from ..util import collect_table

    def partial(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch["ts"], unit="day")
        g = (
            pa.table({"day": d, "event_type": batch["event_type"]})
            .group_by(["day", "event_type"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "day": g["day"],
                "event_type": g["event_type"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    counts = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "event_type"])
        .aggregate(_Sum("n", alias_name="n"))
    )
    t = collect_table(counts)
    if t.num_rows == 0:
        return pa.table(
            {
                "day": pa.array([], pa.timestamp("us")),
                "n_events": pa.array([], pa.int64()),
                "n_types": pa.array([], pa.int64()),
                "entropy_micro_nats": pa.array([], pa.int64()),
            }
        )
    day = (
        t["day"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
    )
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    L = np.floor(np.log(n.astype(np.float64)) * 1_000_000 + 0.5).astype(np.int64)
    order = np.argsort(day, kind="stable")
    day_s, n_s, L_s = day[order], n[order], L[order]
    udays, start = np.unique(day_s, return_index=True)
    bounds = np.append(start, len(day_s))
    out_day, out_n, out_k, out_h = [], [], [], []
    for i, d in enumerate(udays):
        lo, hi = bounds[i], bounds[i + 1]
        N = int(n_s[lo:hi].sum())
        LN = int(np.floor(np.log(float(N)) * 1_000_000 + 0.5))
        num = int((n_s[lo:hi] * (LN - L_s[lo:hi])).sum())
        out_day.append(int(d))
        out_n.append(N)
        out_k.append(int(hi - lo))
        out_h.append(num // N)
    return pa.table(
        {
            "day": pa.array(
                np.array(out_day, np.int64).astype("datetime64[D]").astype(
                    "datetime64[us]"
                ),
                pa.timestamp("us"),
            ),
            "n_events": pa.array(out_n, pa.int64()),
            "n_types": pa.array(out_k, pa.int64()),
            "entropy_micro_nats": pa.array(out_h, pa.int64()),
        }
    )


def seasonal_decompose_hourly(
    events_ds: "ray.data.Dataset", window: int = 25
) -> pa.Table:
    """Classical seasonal decomposition of the hourly event-count series:
    trend = centered moving average over an ODD ``window`` of hours,
    seasonal(hour-of-day) = truncated mean of the detrended values at that
    hour — the moving-average half of STL, integer-exact end to end.

    Combiner-first hourly counts (per-block Arrow ``group_by`` + one
    hour-keyed groupby), then the decomposition runs on the collected
    HOURS-DOMAIN-sized dense grid (~8.8k rows/year — the documented
    result-sized finalize, same contract as ``hour_dod_delta``): zero-fill
    via searchsorted, window sums via one cumsum, division truncated
    toward zero to match SQL ``//`` (negative detrended values!).

    Output: hod (0–23), n_obs, seasonal (BIGINTs), sorted by hod. Hours
    without a full centered window contribute nothing (SQL restates the
    same full-window bound).
    """
    from ..util import collect_table

    half = window // 2
    OUT = pa.schema(
        [("hod", pa.int64()), ("n_obs", pa.int64()), ("seasonal", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        h = pc.floor_temporal(batch["ts"], unit="hour")
        g = pa.table({"hour": h}).group_by("hour").aggregate([([], "count_all")])
        return pa.table(
            {"hour": g["hour"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    counts = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hour")
        .sum("n")
    )
    t = collect_table(counts)
    if t.num_rows == 0:
        return OUT.empty_table()
    hrs = (
        t["hour"].to_numpy(zero_copy_only=False).astype("datetime64[h]").astype(np.int64)
    )
    n = t["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(hrs)
    hrs, n = hrs[order], n[order]
    lo, hi = int(hrs[0]), int(hrs[-1])
    grid = np.arange(lo, hi + 1, dtype=np.int64)
    dense = np.zeros(len(grid), dtype=np.int64)
    dense[hrs - lo] = n
    if len(grid) < window:
        return OUT.empty_table()
    c = np.r_[0, np.cumsum(dense)]
    wsum = c[window:] - c[:-window]  # sum over [i-half, i+half] at i=half..
    trend = wsum // window  # counts >= 0: floor == trunc
    centers = grid[half : len(grid) - half]
    det = dense[half : len(grid) - half] - trend
    hod = centers % 24
    n_obs = np.bincount(hod, minlength=24).astype(np.int64)
    s_num = np.bincount(hod, weights=det.astype(np.float64), minlength=24)
    # bincount weights go through float64 — exact while |sum| < 2^53; redo
    # in int64 to keep the integer-domain guarantee
    s_num = np.zeros(24, dtype=np.int64)
    np.add.at(s_num, hod, det)
    present = n_obs > 0
    seas = np.zeros(24, dtype=np.int64)
    seas[present] = np.sign(s_num[present]) * (
        np.abs(s_num[present]) // n_obs[present]
    )  # trunc-toward-zero == SQL //
    hods = np.arange(24, dtype=np.int64)[present]
    return pa.table(
        {
            "hod": pa.array(hods, pa.int64()),
            "n_obs": pa.array(n_obs[present], pa.int64()),
            "seasonal": pa.array(seas[present], pa.int64()),
        }
    )


def changepoint_daily(events_ds: "ray.data.Dataset") -> pa.Table:
    """Single change-point detection (binary-segmentation step 1) on the
    daily event-count series: the split k maximizing the variance-
    reduction score ``SL²/nL + SR²/nR`` over prefix sums — the level-shift
    locator behind alert systems and segmented backfills (CUSUM's batch
    cousin; :func:`~.analytics.cusum_shift_users` is the streaming one).

    Float policy: the score is ordered in float64 on BOTH sides — each
    term is one integer→double cast and one division (identical operand
    order in numpy and the SQL restatement), so the argmax agrees
    bit-for-bit; the OUTPUT carries only integers (split day, counts,
    sums). Ties break on the earlier day.

    Combiner-first daily census; the scan folds the days-domain-sized
    collected series (the documented result-sized finalize).

    Output: one row — split_day (first day of the RIGHT segment), n_left,
    n_right, sum_left, sum_right (BIGINTs). Empty/1-day series → 0 rows.
    """
    from ..util import collect_table

    OUT = pa.schema(
        [
            ("split_day", pa.timestamp("us")),
            ("n_left", pa.int64()),
            ("n_right", pa.int64()),
            ("sum_left", pa.int64()),
            ("sum_right", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch["ts"], unit="day")
        g = pa.table({"day": d}).group_by("day").aggregate([([], "count_all")])
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    t = collect_table(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .sum("n")
    )
    if t.num_rows < 2:
        return OUT.empty_table()
    days = t["day"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    n = t["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(days)
    days, n = days[order], n[order]
    m = len(n)
    pre = np.cumsum(n)
    total = pre[-1]
    nl = np.arange(1, m, dtype=np.int64)
    nr = m - nl
    sl = pre[:-1]
    sr = total - sl
    # one int->double cast + one division per term, same as the SQL
    score = (sl * sl).astype(np.float64) / nl + (sr * sr).astype(np.float64) / nr
    best = int(np.argmax(score))  # first maximum = earliest split day
    return pa.table(
        {
            "split_day": pa.array([days[best + 1]], pa.timestamp("us")),
            "n_left": pa.array([int(nl[best])], pa.int64()),
            "n_right": pa.array([int(nr[best])], pa.int64()),
            "sum_left": pa.array([int(sl[best])], pa.int64()),
            "sum_right": pa.array([int(sr[best])], pa.int64()),
        }
    )


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (b > 0) — matches DuckDB's
    BIGINT ``//`` exactly (Python's ``//`` floors; DuckDB truncates:
    -7 // 5 is -1 there and -2 here), so both engines share one rounding
    rule and the recursion stays bit-exact."""
    return -((-a) // b) if a < 0 else a // b


def holt_winters_daily(
    events_ds: "ray.data.Dataset", period: int = 7
) -> "ray.data.Dataset":
    """Holt-Winters additive smoothing (level + trend + weekly seasonality)
    of each event type's daily count series, in EXACT integer micro-units —
    the capacity-forecasting recursion a rollup store runs per series, with
    every smoothing step mirrored by a recursive-CTE oracle.

    Fixed rational gains α=1/5, β=1/10, γ=1/4 applied term-by-term with
    truncate-toward-zero division (``_tdiv`` here, BIGINT ``//`` in
    DuckDB), so the whole recursion is order-fixed int64 arithmetic:

        f_t  = l + b + s[0]                       (one-step forecast)
        l'   = (y_t − s[0])÷5  + 4·(l + b)÷5      (÷ = truncating)
        b'   = (l' − l)÷10     + 9·b÷10
        s'   = (y_t − l')÷4    + 3·s[0]÷4

    Init: l = Σ first-week y ÷ 7, b = 0, s = first-week deviations; rows
    emit from day ``period`` on. Each type's day spine is densified
    (missing days count 0) from its own min to max day.

    Distribution: combiner-first (type, day) counts (the same domain-sized
    exchange as ``seasonal_naive_error``), then ``groupby(event_type)``
    ``map_groups`` runs the inherently-sequential recursion PER SERIES —
    the classic many-small-series forecasting layout: a 10^6-series corpus
    fans out across the cluster, each series' O(days) loop stays local.

    Output: event_type, day (DATE-truncated ts), y, forecast_micro,
    err_micro, level_micro, trend_micro — all exact int64.
    """
    from ray.data.aggregate import Sum as _Sum

    def partial(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch["ts"], unit="day")
        g = (
            pa.table({"event_type": batch["event_type"], "day": d})
            .group_by(["event_type", "day"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "day": g["day"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    counts = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day"])
        .aggregate(_Sum("n", alias_name="n"))
    )

    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "day": pa.array([], pa.timestamp("us")),
            "y": pa.array([], pa.int64()),
            "forecast_micro": pa.array([], pa.int64()),
            "err_micro": pa.array([], pa.int64()),
            "level_micro": pa.array([], pa.int64()),
            "trend_micro": pa.array([], pa.int64()),
        }
    )

    def hw_kernel(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("day", "ascending")])
        g = g.take(order)
        days = g["day"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(days) == 0:
            return empty
        d0, d1 = days.min(), days.max()
        span = int((d1 - d0).astype(np.int64)) + 1
        dense = np.zeros(span, np.int64)
        dense[(days - d0).astype(np.int64)] = n
        if span < period + 1:
            return empty
        ym = [int(v) * 1_000_000 for v in dense]
        lev = _tdiv(sum(ym[:period]), period)
        tr = 0
        s = [ym[i] - lev for i in range(period)]
        rows = []
        for t in range(period, span):
            f = lev + tr + s[0]
            err = ym[t] - f
            new_lev = _tdiv(ym[t] - s[0], 5) + _tdiv(4 * (lev + tr), 5)
            new_tr = _tdiv(new_lev - lev, 10) + _tdiv(9 * tr, 10)
            new_s = _tdiv(ym[t] - new_lev, 4) + _tdiv(3 * s[0], 4)
            s = s[1:] + [new_s]
            lev, tr = new_lev, new_tr
            rows.append((t, f, err, lev, tr))
        et = g["event_type"][0].as_py()
        ts_out = (d0 + np.array([r[0] for r in rows], np.int64)).astype(
            "datetime64[us]"
        )
        return pa.table(
            {
                "event_type": pa.array([et] * len(rows), pa.string()),
                "day": pa.array(ts_out, pa.timestamp("us")),
                "y": pa.array([dense[r[0]] for r in rows], pa.int64()),
                "forecast_micro": pa.array([r[1] for r in rows], pa.int64()),
                "err_micro": pa.array([r[2] for r in rows], pa.int64()),
                "level_micro": pa.array([r[3] for r in rows], pa.int64()),
                "trend_micro": pa.array([r[4] for r in rows], pa.int64()),
            }
        )

    return (
        counts.groupby("event_type")
        .map_groups(hw_kernel, batch_format="pyarrow")
        .sort(["event_type", "day"])
    )


def kaplan_meier_sessions(
    events_ds: "ray.data.Dataset", gap_s: int = 1800
) -> pa.Table:
    """Kaplan-Meier survival curve of SESSION durations with right
    censoring — the retention-tier estimator proper: how long does an
    activity session live, counting sessions still open at the corpus edge
    as censored instead of silently treating them as finished (the bias a
    naive duration histogram bakes in).

    Definitions (mirrored term-for-term by the recursive-CTE oracle): a
    session is a maximal per-user run of events with inter-event gaps
    ≤ ``gap_s`` (break on gap > gap_s, the ``session_windows``
    convention); its duration is ``(last − first) // 60 s`` whole minutes;
    it is right-CENSORED iff the corpus' max ts is < gap_s past its last
    event (the session may still be open). At each distinct duration t
    with d_t completed sessions and n_t at risk (duration ≥ t):

        S(t) = S(prev) · (n_t − d_t) ÷ n_t   (micro-units, S(−) = 10⁶,
                                              ÷ truncating; censored ties
                                              leave the risk set AFTER
                                              same-t deaths — the standard
                                              KM tie rule)

    Distributed shape: ONE user-keyed exchange of (user_id, ts) pairs
    (``groupby(user_id).map_groups``) whose kernel sessionizes fully
    vectorized (sort + diff + cumsum, Arrow group_by min/max per session)
    and reduces its output to a per-group duration × censored census —
    group-sized rows out, never session-sized; then a domain-sized
    ``groupby`` census merge (≤ 2·|distinct minutes| rows) and a
    result-sized sequential KM product on the driver (the documented
    finalize, same convention as ``hour_dod_delta``). The corpus max ts is
    a separate single-column aggregate pass (scalar broadcast).

    Output: one row per death time — duration_min, n_risk, n_events,
    n_censored, survival_ppm — all exact int64.
    """
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Sum as _Sum

    from ..util import collect_table
    from .timeseries import _tdiv

    gap_us = gap_s * 1_000_000
    mx = events_ds.aggregate(_Max("ts", alias_name="m"))
    max_us = None
    if mx is not None:
        v = mx["m"] if isinstance(mx, dict) else mx
        if v is not None:
            max_us = int(np.datetime64(v, "us").astype(np.int64))
    empty = pa.table(
        {
            "duration_min": pa.array([], pa.int64()),
            "n_risk": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_censored": pa.array([], pa.int64()),
            "survival_ppm": pa.array([], pa.int64()),
        }
    )
    if max_us is None:
        return empty

    def per_user(group: pa.Table) -> pa.Table:
        ts = np.sort(
            group["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        brk = np.concatenate(([0], (np.diff(ts) > gap_us).astype(np.int64)))
        sid = np.cumsum(brk)
        t = pa.table(
            {
                "sid": pa.array(sid, pa.int64()),
                "us": pa.array(ts, pa.int64()),
            }
        )
        agg = t.group_by(["sid"]).aggregate([("us", "min"), ("us", "max")])
        f = agg["us_min"].to_numpy(zero_copy_only=False)
        l = agg["us_max"].to_numpy(zero_copy_only=False)
        dur = (l - f) // 60_000_000
        censored = (max_us - l) < gap_us
        g = (
            pa.table(
                {
                    "duration_min": pa.array(dur, pa.int64()),
                    "censored": pa.array(censored, pa.bool_()),
                }
            )
            .group_by(["duration_min", "censored"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "duration_min": g["duration_min"],
                "censored": g["censored"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    census = collect_table(
        events_ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["duration_min", "censored"])
        .aggregate(_Sum("n", alias_name="n"))
    )
    if census.num_rows == 0:
        return empty
    dur = census["duration_min"].to_numpy(zero_copy_only=False).astype(np.int64)
    cen = census["censored"].to_numpy(zero_copy_only=False).astype(bool)
    n = census["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    times = np.unique(dur)
    d_at = {int(t): 0 for t in times.tolist()}
    c_at = {int(t): 0 for t in times.tolist()}
    for t, c, k in zip(dur.tolist(), cen.tolist(), n.tolist()):
        if c:
            c_at[t] += k
        else:
            d_at[t] += k
    rows = []
    s = 1_000_000
    at_risk = int(n.sum())
    for t in times.tolist():
        d, c = d_at[t], c_at[t]
        if d > 0:
            s = _tdiv(s * (at_risk - d), at_risk)
            rows.append((t, at_risk, d, c, s))
        at_risk -= d + c
    if not rows:
        return empty
    cols = list(zip(*rows))
    return pa.table(
        {
            "duration_min": pa.array(cols[0], pa.int64()),
            "n_risk": pa.array(cols[1], pa.int64()),
            "n_events": pa.array(cols[2], pa.int64()),
            "n_censored": pa.array(cols[3], pa.int64()),
            "survival_ppm": pa.array(cols[4], pa.int64()),
        }
    )


def dtw_event_type_pairs(events_ds: "ray.data.Dataset") -> pa.Table:
    """Banded (Sakoe-Chiba w=1) dynamic-time-warping distance between every
    pair of event types' daily count series — the shape-similarity measure
    a monitoring/retention stack uses to find metrics that move together
    when correlation misses small phase shifts (DTW tolerates ±1-day
    warps; ``lead_lag_daily_xcorr`` is its linear cousin).

    EXACT integers end to end: cost = |a_i − b_j| on raw daily counts; the
    band row [D(i,i−1), D(i,i), D(i,i+1)] carries int64 path costs, the
    out-of-band sentinel (2^62) is only ever COMPARED, never added, so no
    overflow. The oracle restates the same recursion as a recursive CTE
    whose intra-row dependency chain (dl → dm → dr) unrolls through nested
    subqueries — the ``holt_winters_daily`` pattern.

    Distributed shape: ONE combiner-first (type, day) census (the
    domain-sized exchange shared by ``seasonal_naive_error``); the census
    is broadcast once via ``ray.put`` (types × days, KiBs) and a Dataset
    of type PAIRS fans the O(n·w) sequential DP across the cluster — the
    many-small-series layout: 10^3 types → 5·10^5 independent pair
    kernels, each O(days). Both series densify over the GLOBAL day spine
    (missing days count 0).

    Output: one row per pair — type_a < type_b, n_days, dtw (BIGINT).
    """
    import ray
    from ray.data.aggregate import Sum as _Sum

    from ..util import cached_get, collect_table

    def partial(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch["ts"], unit="day")
        g = (
            pa.table({"event_type": batch["event_type"], "day": d})
            .group_by(["event_type", "day"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "day": g["day"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    counts = collect_table(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day"])
        .aggregate(_Sum("n", alias_name="n"))
    )
    empty = pa.table(
        {
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            "n_days": pa.array([], pa.int64()),
            "dtw": pa.array([], pa.int64()),
        }
    )
    if counts.num_rows == 0:
        return empty
    et = counts["event_type"].to_numpy(zero_copy_only=False)
    day = (
        counts["day"]
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[D]")
        .astype(np.int64)
    )
    n_ = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    d0, d1 = day.min(), day.max()
    span = int(d1 - d0) + 1
    types = sorted({str(t) for t in et})
    series = {t: np.zeros(span, np.int64) for t in types}
    for t, d, k in zip(et.tolist(), day.tolist(), n_.tolist()):
        series[str(t)][d - d0] = k
    if len(types) < 2:
        return empty
    ref = ray.put(series)
    pair_rows = [(a, b) for i, a in enumerate(types) for b in types[i + 1 :]]
    pairs_ds = ray.data.from_arrow(
        pa.table(
            {
                "type_a": pa.array([p[0] for p in pair_rows], pa.string()),
                "type_b": pa.array([p[1] for p in pair_rows], pa.string()),
            }
        )
    )

    INF = 1 << 62

    def dp(batch: pa.Table) -> pa.Table:
        ser = cached_get(ref)
        outs = []
        for ta, tb in zip(
            batch["type_a"].to_pylist(), batch["type_b"].to_pylist()
        ):
            a, b = ser[ta], ser[tb]
            n = len(a)
            # band row at step i: [D(i,i-1), D(i,i), D(i,i+1)]
            dm = abs(int(a[0]) - int(b[0]))
            dl = INF
            dr = abs(int(a[0]) - int(b[1])) + dm if n > 1 else INF
            for i in range(1, n):
                ai = int(a[i])
                ndl = abs(ai - int(b[i - 1])) + min(dl, dm)
                ndm = abs(ai - int(b[i])) + min(dm, dr, ndl)
                ndr = (
                    abs(ai - int(b[i + 1])) + min(dr, ndm)
                    if i + 1 < n
                    else INF
                )
                dl, dm, dr = ndl, ndm, ndr
            outs.append((ta, tb, n, dm))
        return pa.table(
            {
                "type_a": pa.array([o[0] for o in outs], pa.string()),
                "type_b": pa.array([o[1] for o in outs], pa.string()),
                "n_days": pa.array([o[2] for o in outs], pa.int64()),
                "dtw": pa.array([o[3] for o in outs], pa.int64()),
            }
        )

    return collect_table(
        pairs_ds.map_batches(dp, batch_format="pyarrow").sort(
            ["type_a", "type_b"]
        )
    )


def bollinger_daily_counts(
    events_ds: "ray.data.Dataset", window: int = 7, k: int = 2
) -> pa.Table:
    """Bollinger-band anomaly flags on the daily event-count series: a day
    is flagged when its count sits more than ``k`` sample standard
    deviations from the trailing ``window``-day mean — the classic
    volatility envelope, restated in EXACT integers via the
    cross-multiplied variance test

        (w·x − S)²  >  k² · (w·Q − S²)        (w = window,
                                               S = Σ counts, Q = Σ counts²)

    which is the literal ``|x − S/w| > k·sqrt((Q/w) − (S/w)²)`` with both
    sides multiplied by w² — no division, no sqrt, no float anywhere, so
    the engine and the SQL window restatement agree bit-for-bit.

    Window semantics are ROWS-based over the PRESENT days sorted ascending
    (current row + ``window − 1`` preceding), matching SQL ``ROWS BETWEEN
    w−1 PRECEDING AND CURRENT ROW``; days with fewer than ``window``
    predecessors are emitted unflagged (flag 0, the warm-up rows).

    Distributed shape: one combiner-first daily census (per-block Arrow
    ``group_by`` day counts → one days-domain ``groupby`` sum), then the
    rolling sums fold the days-sized collected series on the driver via
    prefix sums (the documented result-sized finalize, same convention as
    :func:`changepoint_daily`).

    Output: day (TIMESTAMP), n, win_sum, win_sumsq, bollinger_flag — all
    BIGINT, one row per present day.
    """
    from ..util import collect_table

    OUT = pa.schema(
        [
            ("day", pa.timestamp("us")),
            ("n", pa.int64()),
            ("win_sum", pa.int64()),
            ("win_sumsq", pa.int64()),
            ("bollinger_flag", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch["ts"], unit="day")
        g = pa.table({"day": d}).group_by("day").aggregate([([], "count_all")])
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    t = collect_table(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .sum("n")
    )
    if t.num_rows == 0:
        return OUT.empty_table()
    days = t["day"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    n = t["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(days)
    days, n = days[order], n[order]
    m = len(n)
    w = int(window)
    pre = np.concatenate(([0], np.cumsum(n)))
    pre2 = np.concatenate(([0], np.cumsum(n * n)))
    idx = np.arange(m)
    lo = np.maximum(0, idx - w + 1)
    s = pre[idx + 1] - pre[lo]
    q = pre2[idx + 1] - pre2[lo]
    full = idx >= w - 1
    lhs = (w * n - s) ** 2
    rhs = (k * k) * (w * q - s * s)
    flag = (full & (lhs > rhs)).astype(np.int64)
    return pa.table(
        {
            "day": pa.array(days, pa.timestamp("us")),
            "n": pa.array(n, pa.int64()),
            "win_sum": pa.array(s, pa.int64()),
            "win_sumsq": pa.array(q, pa.int64()),
            "bollinger_flag": pa.array(flag, pa.int64()),
        }
    )


def _hourly_present_series(events_ds: "ray.data.Dataset"):
    """Shared collector for the hourly event-count series: combiner-first
    per-block Arrow ``group_by`` hour counts → one hours-domain ``groupby``
    sum → collected + sorted numpy pair (hours as int64 epoch-hours,
    counts as int64). The hours domain is bounded (8.8k rows/year) — the
    documented result-sized finalize every daily/hourly kernel in this
    module shares."""
    from ..util import collect_table

    def partial(batch: pa.Table) -> pa.Table:
        h = pc.floor_temporal(batch["ts"], unit="hour")
        g = pa.table({"hour": h}).group_by("hour").aggregate([([], "count_all")])
        return pa.table(
            {"hour": g["hour"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    t = collect_table(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hour")
        .sum("n")
    )
    if t.num_rows == 0:
        return np.array([], np.int64), np.array([], np.int64)
    hrs = (
        t["hour"].to_numpy(zero_copy_only=False).astype("datetime64[h]").astype(np.int64)
    )
    n = t["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(hrs)
    return hrs[order], n[order]


def _hours_to_ts(hrs: np.ndarray) -> pa.Array:
    return pa.array(
        hrs.astype("datetime64[h]").astype("datetime64[us]"), pa.timestamp("us")
    )


def matrix_profile_hourly(
    events_ds: "ray.data.Dataset", w: int = 24
) -> pa.Table:
    """Matrix profile of the hourly event-count series (Yeh et al. 2016,
    UCR): for every length-``w`` subsequence over the PRESENT-hour rows
    (ordered, ROWS semantics — same contract as :func:`bollinger_daily_counts`),
    the squared Euclidean distance to its nearest non-trivial neighbor
    (exclusion zone ``|i − j| >= w``, the standard trivial-match guard).
    The minima locate motifs (small distances) and discords/anomalies
    (large distances) — the canonical all-pairs similarity primitive for
    time-series mining.

    EXACT integers end to end: counts are ints, so every pairwise distance
    ``Σ_k (x[i+k] − x[j+k])²`` is a BIGINT; ties break on the smaller
    neighbor index, so the engine and the SQL self-join restatement agree
    bit-for-bit (no z-normalization — that would need sqrt; the raw-count
    profile is the integer-exact variant).

    Distributed shape: the hourly census is combiner-first; the profile
    kernel folds the hours-domain-sized series (m ≤ 8.8k/year → m² ≤ 77M
    int ops, one numpy matmul) on the driver — the documented result-sized
    finalize. At a larger hours domain the same kernel tiles per window
    range inside ``map_groups`` (each tile needs only its ±w fringe).

    Output: idx (0-based window start row), window_start (TIMESTAMP of
    that hour), nn_idx, nn_dist_sq — BIGINTs, one row per window.
    """
    OUT = pa.schema(
        [
            ("idx", pa.int64()),
            ("window_start", pa.timestamp("us")),
            ("nn_idx", pa.int64()),
            ("nn_dist_sq", pa.int64()),
        ]
    )
    hrs, n = _hourly_present_series(events_ds)
    m = len(n)
    nwin = m - w + 1
    if nwin < w + 1:  # need at least one pair outside the exclusion zone
        return OUT.empty_table()
    # windows matrix (nwin × w) in int64; pairwise squared distances via
    # the Gram expansion d²(i,j) = |wi|² + |wj|² − 2·wi·wj — all integer
    W = np.lib.stride_tricks.sliding_window_view(n, w).astype(np.int64)
    sq = (W * W).sum(axis=1)
    G = W @ W.T  # int64 matmul, exact
    d2 = sq[:, None] + sq[None, :] - 2 * G
    ii = np.arange(nwin)
    excl = np.abs(ii[:, None] - ii[None, :]) < w
    BIG = np.int64(2**62)
    d2 = np.where(excl, BIG, d2)
    nn_idx = np.argmin(d2, axis=1)  # first minimum = smallest j on ties
    nn_d2 = d2[ii, nn_idx]
    return pa.table(
        {
            "idx": pa.array(ii, pa.int64()),
            "window_start": _hours_to_ts(hrs[:nwin]),
            "nn_idx": pa.array(nn_idx.astype(np.int64), pa.int64()),
            "nn_dist_sq": pa.array(nn_d2, pa.int64()),
        }
    )


def rs_range_hourly(
    events_ds: "ray.data.Dataset", sizes: tuple[int, ...] = (24, 48)
) -> pa.Table:
    """Rescaled-range (Hurst R/S analysis) census over the hourly
    event-count series: for each window size ``n`` in ``sizes``, tumbling
    windows of ``n`` consecutive present-hour rows emit the range of
    mean-adjusted cumulative deviations and the variance numerator — the
    two ingredients of the R/S statistic whose log-log slope estimates the
    Hurst exponent (long-range dependence; Mandelbrot & Wallis 1969).

    EXACT integers via scaling: with S = Σx over the window, the deviation
    of x_k from the mean scaled by n is ``n·x_k − S``, so the cumulative
    deviation Z_k = n·Σ_{i≤k}x_i − k·S is a BIGINT and

        r_scaled   = max_k Z_k − min_k Z_k      (= n · R, and Z_n = 0
                                                 puts 0 in the range set)
        var_num    = n·Q − S²                   (= n² · population var)

    are exact; the caller (or a notebook) does the one float log-log fit.
    Partial trailing windows are dropped (full windows only — the SQL
    restatement filters COUNT(*) OVER = n the same way).

    Combiner-first hourly census; the fold is one cumsum pass per size
    over the hours-domain-sized series (result-sized finalize).

    Output: win_n, win_idx, window_start (TIMESTAMP), s_sum, r_scaled,
    var_num — BIGINTs, one row per full tumbling window per size.
    """
    OUT = pa.schema(
        [
            ("win_n", pa.int64()),
            ("win_idx", pa.int64()),
            ("window_start", pa.timestamp("us")),
            ("s_sum", pa.int64()),
            ("r_scaled", pa.int64()),
            ("var_num", pa.int64()),
        ]
    )
    hrs, x = _hourly_present_series(events_ds)
    m = len(x)
    if m == 0:
        return OUT.empty_table()
    rows = {k: [] for k in ("win_n", "win_idx", "ws", "s_sum", "r", "v")}
    for wn in sizes:
        nfull = m // wn
        if nfull == 0:
            continue
        xs = x[: nfull * wn].reshape(nfull, wn)
        S = xs.sum(axis=1)
        Q = (xs * xs).sum(axis=1)
        csum = np.cumsum(xs, axis=1)
        k = np.arange(1, wn + 1, dtype=np.int64)
        Z = wn * csum - k[None, :] * S[:, None]
        r = Z.max(axis=1) - Z.min(axis=1)
        v = wn * Q - S * S
        rows["win_n"].extend([wn] * nfull)
        rows["win_idx"].extend(range(nfull))
        rows["ws"].extend(hrs[np.arange(nfull) * wn])
        rows["s_sum"].extend(S.tolist())
        rows["r"].extend(r.tolist())
        rows["v"].extend(v.tolist())
    return pa.table(
        {
            "win_n": pa.array(rows["win_n"], pa.int64()),
            "win_idx": pa.array(rows["win_idx"], pa.int64()),
            "window_start": _hours_to_ts(np.array(rows["ws"], np.int64)),
            "s_sum": pa.array(rows["s_sum"], pa.int64()),
            "r_scaled": pa.array(rows["r"], pa.int64()),
            "var_num": pa.array(rows["v"], pa.int64()),
        }
    )


def pettitt_change_hourly(events_ds: "ray.data.Dataset") -> pa.Table:
    """Pettitt non-parametric change-point test on the hourly event-count
    series (Pettitt 1979): the split k maximizing |U_k| where
    U_k = Σ_{i≤k} Σ_{j>k} sign(x_i − x_j) — the rank-based (outlier-robust)
    counterpart to :func:`changepoint_daily`'s variance-reduction split.

    EXACT integers via the standard recurrence U_k = U_{k−1} + V_k with
    V_k = Σ_{j≠k} sign(x_k − x_j) = #{x_j < x_k} − #{x_j > x_k}, computed
    vectorized with two searchsorteds against the sorted values. Ties in
    |U| break on the earlier k. The significance transform (exp) is left
    to the caller — the statistic itself is integer.

    Combiner-first hourly census; the fold is O(m log m) over the
    hours-domain-sized series (result-sized finalize).

    Output: one row — k (1-based position of the last LEFT-segment row),
    split_hour (TIMESTAMP of the first RIGHT-segment row), u_stat (signed),
    u_abs, m — BIGINTs. Empty/1-row series → 0 rows.
    """
    OUT = pa.schema(
        [
            ("k", pa.int64()),
            ("split_hour", pa.timestamp("us")),
            ("u_stat", pa.int64()),
            ("u_abs", pa.int64()),
            ("m", pa.int64()),
        ]
    )
    hrs, x = _hourly_present_series(events_ds)
    m = len(x)
    if m < 2:
        return OUT.empty_table()
    sx = np.sort(x)
    less = np.searchsorted(sx, x, side="left")
    greater = m - np.searchsorted(sx, x, side="right")
    V = less - greater
    U = np.cumsum(V)[:-1]  # U_k for k = 1..m-1
    best = int(np.argmax(np.abs(U)))  # first max = earliest k on ties
    return pa.table(
        {
            "k": pa.array([best + 1], pa.int64()),
            "split_hour": _hours_to_ts(hrs[best + 1 : best + 2]),
            "u_stat": pa.array([int(U[best])], pa.int64()),
            "u_abs": pa.array([int(abs(U[best]))], pa.int64()),
            "m": pa.array([m], pa.int64()),
        }
    )


def sax_hourly_symbols(
    events_ds: "ray.data.Dataset", segments: int = 8, alphabet: int = 4
) -> pa.Table:
    """SAX symbolization (Lin et al. 2003) of the hourly event-count
    series: PAA-compress the m present-hour rows into ``segments``
    equal-share segments, then map each segment mean to one of
    ``alphabet`` symbols by comparing against EXACT equi-depth breakpoints
    of the full series (order statistics — the integer-exact stand-in for
    the Gaussian breakpoints of classic SAX, which would need erf).

    All comparisons are cross-multiplied exact: segment assignment is
    ``seg = floor(rn · segments / m)`` (0-based rn — the same integer-split
    contract as :func:`paa_segments`); the PAA mean is carried as the
    fraction (paa_num = Σx, paa_den = count); breakpoint b_k is the value
    at 1-based position ``ceil(k·m/alphabet)`` of the sorted series; the
    symbol is #{k : b_k · paa_den < paa_num} — no division anywhere, so
    the SQL restatement matches bit-for-bit.

    Combiner-first hourly census; segments-sized fold (result-sized
    finalize). Output: seg (0-based), n_rows, paa_num, paa_den, symbol —
    BIGINTs, one row per non-empty segment.
    """
    OUT = pa.schema(
        [
            ("seg", pa.int64()),
            ("n_rows", pa.int64()),
            ("paa_num", pa.int64()),
            ("paa_den", pa.int64()),
            ("symbol", pa.int64()),
        ]
    )
    _hrs, x = _hourly_present_series(events_ds)
    m = len(x)
    if m == 0:
        return OUT.empty_table()
    rn = np.arange(m, dtype=np.int64)
    seg = rn * segments // m
    num = np.zeros(segments, dtype=np.int64)
    den = np.zeros(segments, dtype=np.int64)
    np.add.at(num, seg, x)
    np.add.at(den, seg, 1)
    sx = np.sort(x)
    # breakpoint k (1..alphabet-1) = value at 1-based position ceil(k*m/alphabet)
    pos = np.array(
        [-(-(k * m) // alphabet) for k in range(1, alphabet)], dtype=np.int64
    )
    breaks = sx[pos - 1]
    present = den > 0
    segs = np.arange(segments, dtype=np.int64)[present]
    nums, dens = num[present], den[present]
    sym = (breaks[None, :] * dens[:, None] < nums[:, None]).sum(axis=1)
    return pa.table(
        {
            "seg": pa.array(segs, pa.int64()),
            "n_rows": pa.array(dens, pa.int64()),
            "paa_num": pa.array(nums, pa.int64()),
            "paa_den": pa.array(dens, pa.int64()),
            "symbol": pa.array(sym.astype(np.int64), pa.int64()),
        }
    )


def runs_test_hourly(events_ds: "ray.data.Dataset") -> pa.Table:
    """Wald–Wolfowitz runs test for randomness on the hourly event-count
    series: dichotomize each hour as above/below the series median
    (median-equal hours discarded, the standard treatment), then count
    the runs of consecutive same-side hours — too few runs ⇒ trending /
    clustered load, too many ⇒ oscillation. The z-transform is left to
    the caller; every reported component is an exact integer.

    The median is the LOWER median (value at 1-based position
    ``ceil(m/2)`` of the sorted series — an order statistic, no
    averaging), so the dichotomy is integer-exact and the SQL restatement
    agrees bit-for-bit.

    Combiner-first hourly census; O(m log m) fold over the hours-domain
    series (result-sized finalize).

    Output: one row — m, med, n_above, n_below, n_runs (BIGINTs).
    Empty series → 0 rows; all-equal series → n_runs 0.
    """
    OUT = pa.schema(
        [
            ("m", pa.int64()),
            ("med", pa.int64()),
            ("n_above", pa.int64()),
            ("n_below", pa.int64()),
            ("n_runs", pa.int64()),
        ]
    )
    _hrs, x = _hourly_present_series(events_ds)
    m = len(x)
    if m == 0:
        return OUT.empty_table()
    sx = np.sort(x)
    med = int(sx[(m + 1) // 2 - 1])
    kept = x[x != med]
    sg = kept > med
    n_above = int(sg.sum())
    n_below = int(len(kept) - n_above)
    n_runs = 0 if len(kept) == 0 else 1 + int((sg[1:] != sg[:-1]).sum())
    return pa.table(
        {
            "m": pa.array([m], pa.int64()),
            "med": pa.array([med], pa.int64()),
            "n_above": pa.array([n_above], pa.int64()),
            "n_below": pa.array([n_below], pa.int64()),
            "n_runs": pa.array([n_runs], pa.int64()),
        }
    )


def mi_type_hod(events_ds: "ray.data.Dataset") -> pa.Table:
    """Mutual information between event type and hour-of-day, in exact
    micro-nats — the dependence monitor behind "does traffic mix shift by
    time of day?" alerts (0 ⇒ independent; the chi-square census
    :func:`~.analytics.chi2_independence_cells` is the moment-based
    cousin; this is the information-theoretic one).

    Same float policy as :func:`daily_type_entropy`: each ``ln(count)``
    is quantized ONCE to integer micro-nats L(n) = floor(ln(n)·1e6 + .5),
    then

        mi_num   = Σ_{t,h} n_th · (L(n_th) + L(N) − L(n_t) − L(n_h))
        mi_micro = trunc(mi_num / N)

    is pure integer arithmetic (truncating division — quantization can
    push the sum a hair negative, so the rounding rule must match SQL's
    ``//``). Combiner-first per-(type, hod) counts — a ≤ types×24-row
    exchange; the fold is a numpy pass over that domain-sized table.

    Output: one row — n_events, n_types, n_hods, mi_num, mi_micro_nats
    (BIGINTs). Empty input → 0 rows.
    """
    from ray.data.aggregate import Sum as _Sum

    from ..util import collect_table

    OUT = pa.schema(
        [
            ("n_events", pa.int64()),
            ("n_types", pa.int64()),
            ("n_hods", pa.int64()),
            ("mi_num", pa.int64()),
            ("mi_micro_nats", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "event_type": batch["event_type"],
                    "hod": pc.cast(pc.hour(batch["ts"]), pa.int64()),
                }
            )
            .group_by(["event_type", "hod"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "hod": g["hod"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    t = collect_table(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hod"])
        .aggregate(_Sum("n", alias_name="n"))
    )
    if t.num_rows == 0:
        return OUT.empty_table()
    et = t["event_type"].to_pylist()
    hod = t["hod"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)

    def L(v: np.ndarray) -> np.ndarray:
        return np.floor(np.log(v.astype(np.float64)) * 1_000_000 + 0.5).astype(
            np.int64
        )

    types = sorted(set(et))
    tix = np.array([types.index(e) for e in et], dtype=np.int64)
    nt = np.zeros(len(types), dtype=np.int64)
    np.add.at(nt, tix, n)
    nh = np.zeros(24, dtype=np.int64)
    np.add.at(nh, hod, n)
    N = int(n.sum())
    LN = int(np.floor(np.log(float(N)) * 1_000_000 + 0.5))
    # nh[hod] is the per-row hour marginal — every observed hod has count > 0
    num = int((n * (L(n) + LN - L(nt)[tix] - L(nh[hod]))).sum())
    mi = _tdiv(num, N)
    return pa.table(
        {
            "n_events": pa.array([N], pa.int64()),
            "n_types": pa.array([len(types)], pa.int64()),
            "n_hods": pa.array([int((nh > 0).sum())], pa.int64()),
            "mi_num": pa.array([num], pa.int64()),
            "mi_micro_nats": pa.array([mi], pa.int64()),
        }
    )


def croston_daily(
    events_ds: "ray.data.Dataset", event_type: str = "purchase", alpha_den: int = 8
) -> pa.Table:
    """Croston's method (1972) for intermittent demand on the daily count
    series of one event type: separate exponential smoothing of the
    demand SIZE (z) and the inter-demand INTERVAL (p) updated only on
    demand days — the standard forecaster when most days are zero (the
    demand rate is z/p; that one division is left to the caller).

    Integer-exact in milli-units with the repo's truncating-division
    idiom (:func:`_tdiv` == SQL ``//``): with smoothing 1/``alpha_den``,

        z_k = z_{k−1} + trunc((1000·x_k − z_{k−1}) / alpha_den)
        p_k = p_{k−1} + trunc((1000·q_k − p_{k−1}) / alpha_den)

    initialized z_1 = 1000·x_1, p_1 = 1000·q_1 with q_1 = 1 (first
    interval unobserved — the usual convention) and q_k the calendar-day
    gap to the previous demand day. The sequential recurrence folds the
    days-domain-sized collected series (result-sized finalize); the SQL
    restatement is a recursive CTE over the same recurrence.

    Output: day, x, q, z_milli, p_milli — BIGINTs, one row per demand
    day. Empty input → 0 rows.
    """
    from ..util import collect_table

    OUT = pa.schema(
        [
            ("day", pa.timestamp("us")),
            ("x", pa.int64()),
            ("q", pa.int64()),
            ("z_milli", pa.int64()),
            ("p_milli", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["event_type"], event_type)
        d = pc.floor_temporal(pc.filter(batch["ts"], keep), unit="day")
        g = pa.table({"day": d}).group_by("day").aggregate([([], "count_all")])
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    t = collect_table(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .sum("n")
    )
    if t.num_rows == 0:
        return OUT.empty_table()
    days = (
        t["day"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
    )
    x = t["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(days)
    days, x = days[order], x[order]
    q = np.r_[1, np.diff(days)]
    z = np.empty(len(x), dtype=np.int64)
    p = np.empty(len(x), dtype=np.int64)
    z[0], p[0] = 1000 * int(x[0]), 1000 * int(q[0])
    for k in range(1, len(x)):
        z[k] = z[k - 1] + _tdiv(1000 * int(x[k]) - int(z[k - 1]), alpha_den)
        p[k] = p[k - 1] + _tdiv(1000 * int(q[k]) - int(p[k - 1]), alpha_den)
    return pa.table(
        {
            "day": pa.array(
                days.astype("datetime64[D]").astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "x": pa.array(x, pa.int64()),
            "q": pa.array(q.astype(np.int64), pa.int64()),
            "z_milli": pa.array(z, pa.int64()),
            "p_milli": pa.array(p, pa.int64()),
        }
    )


def dow_adjusted_anomalies(
    events_ds: "ray.data.Dataset", k: int = 1
) -> pa.Table:
    """Day-of-week-adjusted anomaly flags on the daily event-count series:
    a day is flagged when its count sits more than ``k`` sample standard
    deviations from ITS OWN weekday's mean — the seasonality-aware
    complement to :func:`bollinger_daily_counts`'s trailing window (a
    quiet Sunday is normal; a Sunday with Monday traffic is not).

    Exact integers via the same cross-multiplied variance test, grouped
    by weekday: with m days of that weekday, S = Σ counts, Q = Σ counts²
    (the day's own count included, as in Bollinger),

        flag  ⇔  m ≥ 2  ∧  (m·x − S)²  >  k² · (m·Q − S²)

    Default k = 1: with the day's own value inside the weekday stats, the
    achievable z² is bounded by m − 1, so k = 2 cannot fire until a
    weekday has ≥ 6 observations — k = 1 keeps the flag meaningful on
    month-scale corpora (the SQL restatement carries the same k).

    Weekday numbering matches DuckDB's ``dayofweek`` (0 = Sunday):
    epoch day 0 (1970-01-01) is a Thursday, so dow = (day_idx + 4) % 7.

    Combiner-first daily census; the fold is one bincount pass over the
    days-domain series (result-sized finalize).

    Output: day (TIMESTAMP), n, dow, dow_flag — BIGINTs, one row per
    present day.
    """
    from ..util import collect_table

    OUT = pa.schema(
        [
            ("day", pa.timestamp("us")),
            ("n", pa.int64()),
            ("dow", pa.int64()),
            ("dow_flag", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch["ts"], unit="day")
        g = pa.table({"day": d}).group_by("day").aggregate([([], "count_all")])
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    t = collect_table(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .sum("n")
    )
    if t.num_rows == 0:
        return OUT.empty_table()
    days = (
        t["day"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
    )
    n = t["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(days)
    days, n = days[order], n[order]
    dow = (days + 4) % 7
    m = np.bincount(dow, minlength=7).astype(np.int64)
    S = np.zeros(7, dtype=np.int64)
    Q = np.zeros(7, dtype=np.int64)
    np.add.at(S, dow, n)
    np.add.at(Q, dow, n * n)
    md, sd, qd = m[dow], S[dow], Q[dow]
    lhs = (md * n - sd) ** 2
    rhs = (k * k) * (md * qd - sd * sd)
    flag = ((md >= 2) & (lhs > rhs)).astype(np.int64)
    return pa.table(
        {
            "day": pa.array(
                days.astype("datetime64[D]").astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "n": pa.array(n, pa.int64()),
            "dow": pa.array(dow, pa.int64()),
            "dow_flag": pa.array(flag, pa.int64()),
        }
    )


def error_budget_burn(
    events_ds: "ray.data.Dataset", budget_ppm: int = 10_000
) -> pa.Table:
    """SLO error-budget burn census: per day, the error rate in exact ppm
    and the cumulative overage against a ``budget_ppm`` target (default
    1%) — the burn-rate table an on-call dashboard plots and a retention
    policy gates deletions on ("don't expire raw tiers while the budget
    is burning").

    Exact integers: err_ppm = 1e6·n_err // n_tot (floor — both counts
    positive), over = max(0, err_ppm − budget), cum_over = running sum in
    day order. Combiner-first daily (total, error) census; the cumsum
    folds the days-domain series (result-sized finalize).

    Output: day, n_tot, n_err, err_ppm, over_ppm, cum_over_ppm — BIGINTs.
    """
    from ray.data.aggregate import Sum as _Sum

    from ..util import collect_table

    OUT = pa.schema(
        [
            ("day", pa.timestamp("us")),
            ("n_tot", pa.int64()),
            ("n_err", pa.int64()),
            ("err_ppm", pa.int64()),
            ("over_ppm", pa.int64()),
            ("cum_over_ppm", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch["ts"], unit="day")
        err = pc.cast(
            pc.equal(batch["event_type"], "error"), pa.int64()
        )
        g = (
            pa.table({"day": d, "e": err})
            .group_by("day")
            .aggregate([("e", "sum"), ("e", "count")])
        )
        return pa.table(
            {
                "day": g["day"],
                "n_err": pc.cast(g["e_sum"], pa.int64()),
                "n_tot": pc.cast(g["e_count"], pa.int64()),
            }
        )

    t = collect_table(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(_Sum("n_err", alias_name="n_err"), _Sum("n_tot", alias_name="n_tot"))
    )
    if t.num_rows == 0:
        return OUT.empty_table()
    days = t["day"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    n_err = t["n_err"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_tot = t["n_tot"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(days)
    days, n_err, n_tot = days[order], n_err[order], n_tot[order]
    ppm = 1_000_000 * n_err // n_tot
    over = np.maximum(ppm - budget_ppm, 0)
    return pa.table(
        {
            "day": pa.array(days, pa.timestamp("us")),
            "n_tot": pa.array(n_tot, pa.int64()),
            "n_err": pa.array(n_err, pa.int64()),
            "err_ppm": pa.array(ppm, pa.int64()),
            "over_ppm": pa.array(over, pa.int64()),
            "cum_over_ppm": pa.array(np.cumsum(over), pa.int64()),
        }
    )


def value_acf_daily(
    events_ds: "ray.data.Dataset", max_lag: int = 7
) -> pa.Table:
    """Autocovariance COMPONENTS of the daily revenue series (value cents
    summed per present day) at lags 1..``max_lag`` — the revenue-rhythm
    sibling of :func:`acf_minute_counts`, kept in exact integers: per lag
    L over the day-ordered series x,

        n_pairs = m − L,   sum_lag = Σ x_t·x_{t+L},
        sum_head = Σ_{t<m−L} x_t,   sum_tail = Σ_{t≥L} x_t

    plus the global (m, S, Q) row at lag 0 — every normalized ACF variant
    derives from these BIGINTs with the caller's one float step.

    Combiner-first daily cents census; the lag products fold the
    days-domain series (result-sized finalize).

    Output: lag (0..max_lag), n_pairs, sum_lag, sum_head, sum_tail —
    BIGINTs (lag 0 row: m, Q, S, S).
    """
    from ..util import collect_table

    OUT = pa.schema(
        [
            ("lag", pa.int64()),
            ("n_pairs", pa.int64()),
            ("sum_lag", pa.int64()),
            ("sum_head", pa.int64()),
            ("sum_tail", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch["ts"], unit="day")
        g = (
            pa.table({"day": d, "c": to_cents(batch["value"])})
            .group_by("day")
            .aggregate([("c", "sum")])
        )
        return pa.table(
            {"day": g["day"], "c": pc.cast(g["c_sum"], pa.int64())}
        )

    t = collect_table(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .sum("c")
    )
    if t.num_rows == 0:
        return OUT.empty_table()
    days = t["day"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    x = t["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = x[np.argsort(days)]
    m = len(x)
    rows = {k: [] for k in ("lag", "np", "sl", "sh", "st")}
    rows["lag"].append(0)
    rows["np"].append(m)
    rows["sl"].append(int((x * x).sum()))
    rows["sh"].append(int(x.sum()))
    rows["st"].append(int(x.sum()))
    for L in range(1, min(max_lag, m - 1) + 1):
        rows["lag"].append(L)
        rows["np"].append(m - L)
        rows["sl"].append(int((x[:-L] * x[L:]).sum()))
        rows["sh"].append(int(x[:-L].sum()))
        rows["st"].append(int(x[L:].sum()))
    return pa.table(
        {
            "lag": pa.array(rows["lag"], pa.int64()),
            "n_pairs": pa.array(rows["np"], pa.int64()),
            "sum_lag": pa.array(rows["sl"], pa.int64()),
            "sum_head": pa.array(rows["sh"], pa.int64()),
            "sum_tail": pa.array(rows["st"], pa.int64()),
        }
    )


def max_quiet_gap_hourly(events_ds: "ray.data.Dataset") -> pa.Table:
    """Longest silence in the stream at hour resolution: the maximum gap
    between consecutive PRESENT hours (the "did ingestion stall?" alarm;
    gap = 1 means no missing hour). Earliest occurrence wins ties.

    Combiner-first hourly census; one diff over the hours-domain series.

    Output: one row — gap_hours, gap_start (last hour BEFORE the gap),
    gap_end (first hour after), BIGINT/TIMESTAMPs. < 2 present hours →
    0 rows.
    """
    OUT = pa.schema(
        [
            ("gap_hours", pa.int64()),
            ("gap_start", pa.timestamp("us")),
            ("gap_end", pa.timestamp("us")),
        ]
    )
    hrs, _n = _hourly_present_series(events_ds)
    if len(hrs) < 2:
        return OUT.empty_table()
    d = np.diff(hrs)
    i = int(np.argmax(d))  # first maximum = earliest gap
    return pa.table(
        {
            "gap_hours": pa.array([int(d[i])], pa.int64()),
            "gap_start": _hours_to_ts(hrs[i : i + 1]),
            "gap_end": _hours_to_ts(hrs[i + 1 : i + 2]),
        }
    )


def daily_peak_trough(events_ds: "ray.data.Dataset") -> pa.Table:
    """Per-day load peak-to-trough: max and min hourly event count among
    the day's PRESENT hours, with the cross-multiplied ratio in exact ppm
    (1e6·max // min — min ≥ 1 by construction) — the intraday burstiness
    row a capacity dashboard plots.

    Combiner-first (day, hour) census; one reduceat fold over the
    hours-domain series. Output: day, n_hours, peak, trough, ratio_ppm
    (BIGINTs).
    """
    from ..util import collect_table

    OUT = pa.schema(
        [
            ("day", pa.timestamp("us")),
            ("n_hours", pa.int64()),
            ("peak", pa.int64()),
            ("trough", pa.int64()),
            ("ratio_ppm", pa.int64()),
        ]
    )
    hrs, n = _hourly_present_series(events_ds)
    if len(hrs) == 0:
        return OUT.empty_table()
    day = hrs // 24
    starts = np.flatnonzero(np.r_[True, day[1:] != day[:-1]])
    peak = np.maximum.reduceat(n, starts)
    trough = np.minimum.reduceat(n, starts)
    counts = np.diff(np.r_[starts, len(n)])
    ratio = 1_000_000 * peak // trough
    return pa.table(
        {
            "day": pa.array(
                (day[starts] * 24).astype("datetime64[h]").astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "n_hours": pa.array(counts.astype(np.int64), pa.int64()),
            "peak": pa.array(peak, pa.int64()),
            "trough": pa.array(trough, pa.int64()),
            "ratio_ppm": pa.array(ratio, pa.int64()),
        }
    )


def rolling_zscore_days(events_ds: "ray.data.Dataset", k: float = 3.0) -> pa.Table:
    """Integer-exact rolling z-score anomaly flags on the DAILY event-count
    series: day x is anomalous vs its trailing window of the 7 PRECEDING
    ROWS of the day series (present days only — with calendar gaps the
    window reaches further than 7 calendar days back, matching the SQL
    oracle's ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) when

        (n·x − S)² > k²·(n·Q − S²)          [n ≥ 2]

    which is exactly z² > k² with μ = S/n, σ² = (n·Q − S²)/n² — cross-
    multiplied so no float ever enters the decision (k² is exact for
    integer/half-integer k). Zero-variance windows flag any x ≠ μ
    (n·x ≠ S).

    Bound (module convention): Q = Σx² and (n·x−S)²·4 stay inside int64
    only for daily counts |x| < ~7·10⁸ (Q ≤ 7·x² < 2⁶²; the lhs square is
    ≤ (8·max x)²·4). Past that numpy would WRAP silently where the SQL
    oracle errors — scale counts down first (e.g. flag on thousands).

    Distribution: combiner-first daily census (day-keyed, span-bounded —
    the same documented bound as the other calendar-grid kernels in this
    module); the rolling recurrence is a vectorized sliding window over
    the sorted day series.

    Output: window_start (day), n_events, flagged (0/1), all BIGINT.
    """
    from ray.data.aggregate import Sum

    from ..util import collect_table

    def partial(b: pa.Table) -> pa.Table:
        d = pc.floor_temporal(b["ts"], unit="day")
        g = pa.table({"w": d}).group_by("w").aggregate([([], "count_all")])
        return pa.table(
            {"w": g["w"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    census = collect_table(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("w")
        .aggregate(Sum("n", alias_name="n"))
    )
    if census.num_rows == 0:
        return pa.table(
            {
                "window_start": pa.array([], pa.timestamp("us")),
                "n_events": pa.array([], pa.int64()),
                "flagged": pa.array([], pa.int64()),
            }
        )
    idx = pc.sort_indices(census, sort_keys=[("w", "ascending")])
    census = census.take(idx)
    w = census["w"].to_numpy(zero_copy_only=False)
    x = census["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    W = 7
    csum = np.r_[0, np.cumsum(x)]
    csq = np.r_[0, np.cumsum(x * x)]
    lo = np.maximum(0, np.arange(len(x)) - W)
    n = (np.arange(len(x)) - lo).astype(np.int64)
    S = csum[np.arange(len(x))] - csum[lo]
    Q = csq[np.arange(len(x))] - csq[lo]
    k2_num, k2_den = int(round(k * k * 4)), 4  # exact for half-integer k
    lhs = (n * x - S) ** 2 * k2_den
    var_n2 = n * Q - S * S  # n² · σ²
    flagged = np.where(
        n < 2,
        0,
        np.where(
            var_n2 > 0,
            (lhs > k2_num * var_n2).astype(np.int64),
            (n * x != S).astype(np.int64),
        ),
    ).astype(np.int64)
    return pa.table(
        {
            "window_start": pa.array(w, pa.timestamp("us")),
            "n_events": pa.array(x, pa.int64()),
            "flagged": pa.array(flagged, pa.int64()),
        }
    )


def vwap_ship_daily(sf_dir: str) -> "ray.data.Dataset":
    """Volume-weighted average price per ship day over lineitem — the
    VWAP bar a market-data rollup keeps next to OHLC. Exact integer
    components cross the exchange (num = Σ price_cents·qty,
    den = Σ qty); the derived vwap_cents = num // den is also integral so
    the whole row hash-matches SQL.

    Combiner-first: per-block day-keyed partial sums; day-keyed merge.

    Output: window_start (day), num_u, qty_sum, vwap_cents (BIGINTs).
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        d = pc.floor_temporal(b["l_shipdate"], unit="day")
        qty = pc.cast(b["l_quantity"], pa.int64())
        price = to_cents(b["l_extendedprice"])
        num = pc.multiply(pc.cast(price, pa.int64()), qty)
        t = pa.table({"w": d, "num": num, "qty": qty})
        g = t.group_by("w").aggregate([("num", "sum"), ("qty", "sum")])
        return pa.table(
            {
                "w": g["w"],
                "num": pc.cast(g["num_sum"], pa.int64()),
                "qty": pc.cast(g["qty_sum"], pa.int64()),
            }
        )

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_shipdate", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("w")
        .aggregate(Sum("num", alias_name="num"), Sum("qty", alias_name="qty"))
    )

    def finish(b: pa.Table) -> pa.Table:
        num = b["num"].to_numpy(zero_copy_only=False)
        qty = b["qty"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "window_start": pc.cast(b["w"], pa.timestamp("us")),
                "num_u": pa.array(num, pa.int64()),
                "qty_sum": pa.array(qty, pa.int64()),
                "vwap_cents": pa.array(num // np.maximum(qty, 1), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
