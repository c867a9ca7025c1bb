#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query...]

Reads each <outDir>/<name> parquet (Spark result), runs <outDir>/oracle_sql.json
[name] in DuckDB over views named after the parquet tables in <sfDir>, then
compares: schema (column names sorted), row count, and values (columns sorted
by name, rows sorted by all columns). Reports exact match and, for floats,
max abs diff so we can spot borderline queries before the driver does.
"""
import sys, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                r.append(("f", repr(v)))
            elif v is None:
                r.append(("n", ""))
            else:
                r.append(("o", str(v)))
        out.append(tuple(r))
    out.sort()
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}"); n_fail += 1; continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}"); n_fail += 1; continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"FAIL {name}: rows spark={spark_tbl.num_rows} duck={duck.num_rows}"); n_fail += 1; continue
        s = spark_tbl.select(s_cols).to_pylist()
        d = duck.select(d_cols).to_pylist()
        s_rows = canon([[r[c] for c in s_cols] for r in s])
        d_rows = canon([[r[c] for c in d_cols] for r in d])
        if s_rows == d_rows:
            print(f"PASS {name} ({spark_tbl.num_rows} rows)"); n_pass += 1
        else:
            # find first diff + float max-abs-diff diagnostics
            maxdiff, ndiff, first = 0.0, 0, None
            for a, b in zip(s_rows, d_rows):
                if a != b:
                    ndiff += 1
                    if first is None: first = (a, b)
                    for (ta, va), (tb, vb) in zip(a, b):
                        if ta == tb == "f":
                            try:
                                maxdiff = max(maxdiff, abs(float(va) - float(vb)))
                            except ValueError:
                                pass
            print(f"FAIL {name}: {ndiff}/{len(s_rows)} rows differ; float maxdiff={maxdiff:g}")
            if first:
                print(f"  spark: {first[0]}\n  duck:  {first[1]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
