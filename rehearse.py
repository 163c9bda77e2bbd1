#!/usr/bin/env python
"""Driver-gate rehearsal: run EVERY queries() entry against its
oracle_sql() truth via DuckDB — the exact comparison the correctness
driver applies (sorted columns, row-for-row value equality) — and print
one summary line.

    python rehearse.py [sf_dir ...]        # default /root/testdata/sf0.01
    GRAFT_REHEARSE_PREFIX=50 python rehearse.py   # only the driver prefix

Owns its Ray session (like bench.py); queries without an oracle run as
rows-only executions (they must simply complete).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb
    import pandas as pd
    import pyarrow as pa

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    prefix = os.environ.get("GRAFT_REHEARSE_PREFIX")
    names = list(qs)[: int(prefix)] if prefix else list(qs)

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    def topd(r):
        if isinstance(r, ray.data.Dataset):
            return r.to_pandas()
        if isinstance(r, pa.Table):
            return r.to_pandas()
        return r

    rc = 0
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.01"]:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        n_ok = n_rows_only = 0
        fails: list[str] = []
        for name in names:
            t0 = time.time()
            try:
                raw = topd(qs[name](sf_dir))
                if name not in osql:
                    n_rows_only += 1
                    continue
                got = canon(raw)
                want = canon(con.execute(osql[name]).df())
                assert list(got.columns) == list(want.columns), (
                    f"cols {list(got.columns)} != {list(want.columns)}"
                )
                assert len(got) == len(want), f"rows {len(got)} != {len(want)}"
                pd.testing.assert_frame_equal(got, want, check_dtype=False)
                n_ok += 1
            except Exception as ex:  # noqa: BLE001 — summary-line harness
                fails.append(f"{name}: {type(ex).__name__} {str(ex)[:160]}")
                print(f"FAIL {name} ({time.time() - t0:.1f}s)", flush=True)
        print(
            f"{sf_dir}: oracled-ok={n_ok} rows-only={n_rows_only} "
            f"failures={len(fails)}"
        )
        for f in fails:
            print("  -", f)
        rc |= 1 if fails else 0
        con.close()
    ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
