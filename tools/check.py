#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet (Spark result), runs the matching oracle SQL
from <out>/oracle_sql.json in DuckDB over the sf_dir parquet tables, and
compares sorted rows / sorted column names. NOT part of the shipped library —
dev harness only (mirrors the driver's duckdb compare).
"""
import json, math, sys, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9) + 0.0  # folds -0.0 to 0.0
    return v

def rows_of(cols, table):
    # table: list of column arrays ordered by sorted col name
    rows = [tuple(norm(c[i]) for c in table) for i in range(len(table[0]) if table else 0)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows

def main():
    out, sf = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only: continue
        # Rot-check: the driver hashes serialized arrow values, where DuckDB
        # HUGEINT becomes decimal128 and never matches Spark's int64 even
        # when every value is equal (Python == hides this: Decimal(5)==5).
        # Any uncast SUM / `//` chain silently reintroduces the class, so
        # fail loudly on the oracle's DESCRIBEd output types up front.
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
            wide = [(c, t) for c, t, *_ in desc
                    if "HUGEINT" in t.upper() or "INT128" in t.upper()]
            if wide:
                print(f"FAIL {name}: oracle emits non-arrow-portable types {wide}"
                      " — CAST the aggregate to BIGINT in the oracle SQL")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error {e}"); n_fail += 1; continue
        res_dir = os.path.join(out, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_t = pq.read_table(files[0])
        try:
            duck = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        s_cols = sorted(spark_t.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: cols {s_cols} vs {d_cols}"); n_fail += 1; continue
        s_rows = rows_of(s_cols, [spark_t.column(c).to_pylist() for c in s_cols])
        d_rows = rows_of(d_cols, [duck.column(c).to_pylist() for c in d_cols])
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: {len(s_rows)} vs {len(d_rows)} rows"); n_fail += 1; continue
        bad = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        if bad:
            i = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; first @{i}:")
            print(f"  spark: {s_rows[i]}")
            print(f"  duck : {d_rows[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
