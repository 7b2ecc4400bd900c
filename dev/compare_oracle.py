#!/usr/bin/env python3
"""Dev-only harness (not part of the engine): replicate the driver's
DuckDB-oracle compare locally. Usage:
  python3 dev/compare_oracle.py <verify_out_dir> <sf_dir>
Reads each <name>/ parquet result dumped by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB against the sf parquet
tables, and reports row/schema/value mismatches (column-name-sorted,
like the driver)."""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(out_dir: str, sf_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    try:
        oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    except FileNotFoundError:
        # SPARK_GRAFT_ONLY runs dump their catalog to a subset file so
        # they can't clobber a full run's oracle_sql.json
        oracle = json.load(open(f"{out_dir}/oracle_sql_subset.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_bad += 1
            continue
        # exact value compare (incl. float bit equality)
        bad = None
        for c in got.columns:
            a, b = got[c], exp[c]
            # dtype-kind compare: the driver hashes rendered values, so
            # int64 123 vs float64 123.0 (e.g. DuckDB HUGEINT sums) is a
            # real mismatch even though numpy == says equal
            ka, kb = a.dtype.kind, b.dtype.kind
            num = {"i", "u", "f"}
            if ka != kb and (ka in num or kb in num) and not (ka in "iu" and kb in "iu"):
                bad = (c, -1, f"dtype {a.dtype}", f"dtype {b.dtype}")
                break
            try:
                eq = (a.values == b.values) | (a.isna().values & b.isna().values)
            except Exception:
                eq = a.astype(str).values == b.astype(str).values
            if not eq.all():
                i = int((~eq).argmax())
                bad = (c, i, a.iloc[i], b.iloc[i])
                break
        if bad:
            c, i, av, bv = bad
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} oracle={bv!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
