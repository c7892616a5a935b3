"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry and compare against oracle_sql() in DuckDB
(row count, column-name set, order-insensitive values).

    python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _normalize(df: pd.DataFrame) -> tuple[pd.DataFrame, dict[str, str]]:
    """Canonicalize for an order-insensitive value compare, AND report each
    column's numeric KIND ('int'/'float'/'bool'/'other') from the RAW dtype,
    before any coercion.  The driver's hash renders values dtype-sensitively
    (810 vs 810.0 hash differently), so an int-vs-float split between Spark
    and DuckDB — e.g. an uncast SUM(CASE ...) coming back HUGEINT→float64 —
    must fail HERE too, not just at the driver (round-4 verdict item 2:
    check_dtype=False + Int64 coercion made this gate blind to exactly the
    bug class that shipped two rounds)."""
    kinds = {}
    for c in df.columns:
        if pd.api.types.is_bool_dtype(df[c]):
            kinds[c] = "bool"
        elif pd.api.types.is_integer_dtype(df[c]):
            kinds[c] = "int"
        elif pd.api.types.is_float_dtype(df[c]):
            kinds[c] = "float"
        else:
            kinds[c] = "other"
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    df = df.sort_values(list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df, kinds


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from tests.conftest import _build_session

    spark = _build_session("local[8]", 16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (no oracle) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        (g, g_kinds), (e_, e_kinds) = _normalize(got), _normalize(exp)
        status = []
        if len(g) != len(e_):
            status.append(f"rowcount {len(g)} vs {len(e_)}")
        if list(g.columns) != list(e_.columns):
            status.append(f"schema {list(g.columns)} vs {list(e_.columns)}")
        else:
            kind_diffs = [f"{c}: spark={g_kinds[c]} oracle={e_kinds[c]}"
                          for c in g.columns if g_kinds[c] != e_kinds[c]]
            if kind_diffs:
                status.append("dtype kind (driver hashes this): "
                              + "; ".join(kind_diffs))
        if not status:
            try:
                pd.testing.assert_frame_equal(g, e_, check_dtype=False,
                                              check_exact=True)
            except AssertionError as ex:
                status.append("values: " + str(ex).split("\n")[0])
                # show first diff rows
                neq = (g.astype(str) != e_.astype(str)).any(axis=1)
                if neq.any():
                    i = neq.idxmax()
                    status.append(f"first diff @{i}: got={g.loc[i].to_dict()} "
                                  f"exp={e_.loc[i].to_dict()}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            print(f"OK    {name}: {len(g)} rows [{time.time() - t0:.1f}s]")

    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
