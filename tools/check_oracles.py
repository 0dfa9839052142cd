"""Local mirror of the driver's correctness gate: run every queries()
entry at a given sf_dir and compare against oracle_sql() via DuckDB
(row count + schema + order-insensitive values).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            raw = to_pandas(fn(sf_dir))
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            # rows-only check (list/binary columns aren't sortable anyway)
            print(f"rows  {name}: {len(raw)} rows ({elapsed:.1f}s) [no oracle]")
            continue
        got = normalize(raw)
        raw_want = con.execute(oracles[name]).df()
        # exact-dtype parity warning — ADVISORY, not a failure.  The
        # driver's value hash flips on int-vs-DOUBLE family changes
        # (CLAUDE.md trap 8), but measured driver behavior (CORRECTNESS
        # r1-r4) shows it TOLERATES int64-vs-int32 width and
        # datetime64[s]-vs-[us] unit differences (q_join_shuffle,
        # q_events_hourly/sliding/anomaly all hash_match=True).  Treat a
        # new warning as a prompt to check, not an automatic bug.
        for c in set(raw.columns) & set(raw_want.columns):
            gd, wd = raw[c].dtype, raw_want[c].dtype
            if gd != wd:
                print(f"  dtype-warn {name}.{c}: ray={gd} duck={wd}")
        want = normalize(raw_want)
        status = "ok"
        if list(got.columns) != list(want.columns):
            status = f"SCHEMA MISMATCH got={list(got.columns)} want={list(want.columns)}"
        elif len(got) != len(want):
            status = f"ROWCOUNT MISMATCH got={len(got)} want={len(want)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=False, atol=1e-8
                )
            except AssertionError as e:
                status = "VALUE MISMATCH: " + str(e).split("\n")[0]
        tag = "ok   " if status == "ok" else "FAIL "
        if status != "ok":
            failures.append(name)
        print(f"{tag} {name}: {len(got)} rows ({elapsed:.1f}s) {status if status != 'ok' else ''}")
    ray.shutdown()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
