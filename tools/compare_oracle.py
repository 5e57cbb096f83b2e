#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run each
SparkEntry.oracleSql query in DuckDB over the same parquet tables and
compare with the Spark parquet dump from graft.Verify.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            ddf = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        ddf = ddf.reindex(sorted(ddf.columns), axis=1)
        # Sort both frames by every hashable column: a multi-file Spark
        # dump would otherwise depend on filename order, and queries whose
        # ORDER BY is not total would produce spurious row mismatches.
        sort_cols = [c for c in sdf.columns
                     if sdf[c].dtype != object or
                     sdf[c].map(lambda v: isinstance(v, (str, bytes, type(None)))).all()]
        if sort_cols:
            sdf = sdf.sort_values(sort_cols, ignore_index=True)
            try:
                ddf = ddf.sort_values(sort_cols, ignore_index=True)
            except KeyError:
                pass
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: cols spark={list(sdf.columns)} duck={list(ddf.columns)}")
            n_bad += 1
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in sdf.columns:
            a, b = sdf[c], ddf[c]
            try:
                a = a.astype(b.dtype)
            except Exception:  # noqa: BLE001
                pass
            eq = (a.values == b.values) | (a.isna().values & b.isna().values)
            if not eq.all():
                i = int((~eq).argmax())
                bad_cols.append(f"{c} (row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r})")
        if bad_cols:
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            n_bad += 1
        else:
            print(f"ok   {name}: {len(sdf)} rows")
    declared = set(oracle)
    dumped = {p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if "." not in p.split("/")[-1]}
    for name in sorted(dumped - declared):
        print(f"note {name}: rows-only (no oracle)")
    return n_bad


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
