#!/usr/bin/env python3
"""Strict (hash-faithful) twin of compare_oracle.py: reproduces what a
byte-level driver hash can distinguish but a value-compare cannot —
dtype drift (DuckDB HUGEINT sums -> pandas float64 vs Spark int64),
IEEE -0.0 vs +0.0, and NaN-vs-NULL encodings.

Both sides are compared at the ARROW level: the Spark parquet dump is
read with pyarrow; the DuckDB oracle result is fetched as an arrow
table (NULL != NaN there, unlike pandas float64). Columns are sorted
by name, rows by every column; then per-column the arrow types must
match (int64==int64, not int64~float64) and float values must match
BITWISE (so -0.0 != +0.0 and NaN != NULL).

Usage: python3 tools/compare_strict.py <sfDir> <verifyOutDir> [nameFilter...]
"""
import glob
import json
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_type(t: pa.DataType) -> str:
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)


def to_sortable(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].map(lambda v: str(v) if v is not None else None)
    return out


def cell_repr(col: pa.ChunkedArray):
    """Hash-faithful per-cell canonical repr: floats by BIT PATTERN
    (NULL distinct from NaN, -0.0 distinct from +0.0)."""
    t = col.type
    vals = col.to_pylist()
    if pa.types.is_floating(t):
        out = []
        for v in vals:
            if v is None:
                out.append("NULL")
            else:
                out.append(np.float64(v).view(np.uint64).item())
        return out
    if pa.types.is_timestamp(t):
        # Spark parquet carries tz=UTC (pandas.Timestamp), DuckDB arrow
        # is naive (datetime) — same UTC instant; canonicalize to the
        # naive isoformat so reprs (and the row sort built on them) align.
        import datetime
        out = []
        for v in vals:
            if v is None:
                out.append("NULL")
            else:
                if getattr(v, "tzinfo", None) is not None:
                    v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
                out.append(v.isoformat())
        return out
    return [("NULL" if v is None else repr(v)) for v in vals]


def main(sf_dir: str, out_dir: str, names=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        if names and name not in names:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            dtab = con.sql(sql).arrow()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        stab = pa.concat_tables([pq.read_table(f) for f in files],
                                promote_options="permissive")
        stab = stab.select(sorted(stab.column_names))
        dtab = dtab.select(sorted(dtab.column_names)) \
            if set(dtab.column_names) == set(stab.column_names) else dtab
        if stab.column_names != dtab.column_names:
            print(f"FAIL {name}: cols spark={stab.column_names} duck={dtab.column_names}")
            n_bad += 1
            continue
        if stab.num_rows != dtab.num_rows:
            print(f"FAIL {name}: rows spark={stab.num_rows} duck={dtab.num_rows}")
            n_bad += 1
            continue
        bad = []
        for c in stab.column_names:
            ts, td = canon_type(stab.schema.field(c).type), canon_type(dtab.schema.field(c).type)
            if ts != td:
                bad.append(f"{c}: TYPE spark={ts} duck={td}")
        if bad:
            print(f"FAIL {name}: {bad}")
            n_bad += 1
            continue
        # row order: sort both by the canonical reprs of every column
        def sort_key(tab):
            cols = [cell_repr(tab.column(c)) for c in tab.column_names]
            rows = list(zip(*cols)) if cols else []
            return sorted(range(len(rows)), key=lambda i: tuple(map(str, rows[i])))
        sidx, didx = sort_key(stab), sort_key(dtab)
        for c in stab.column_names:
            sv = cell_repr(stab.column(c))
            dv = cell_repr(dtab.column(c))
            sv = [sv[i] for i in sidx]
            dv = [dv[i] for i in didx]
            if sv != dv:
                i = next(i for i in range(len(sv)) if sv[i] != dv[i])
                def show(x):
                    if isinstance(x, int):
                        return f"{np.uint64(x).view(np.float64)!r}(bits={x:#x})"
                    return repr(x)
                bad.append(f"{c} (row {i}: {show(sv[i])} vs {show(dv[i])})")
        if bad:
            print(f"FAIL {name}: {bad[:4]}")
            n_bad += 1
        else:
            print(f"ok   {name}: {stab.num_rows} rows")
    print(f"strict: {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
