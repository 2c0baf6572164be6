#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json, runs each SQL in DuckDB over the
parquet tables in <sf_dir>, loads the corresponding Spark result parquet,
and compares: column names (sorted), row counts, and a hash of the
row-sorted, column-name-sorted values.
"""
import sys, json, glob, hashlib, math
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if not math.isfinite(v):
            return "nan" if v != v else ("inf" if v > 0 else "-inf")
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        tbl = pa.concat_tables([pq.read_table(f) for f in spark_files])
        s_names = list(tbl.column_names)
        s_rows = [tuple(r[c] for c in s_names) for r in tbl.to_pylist()]
        try:
            cur = con.execute(sql)
            d_names = [d[0] for d in cur.description]
            # go through pandas like the driver does: this surfaces type
            # divergences fetchall() hides — e.g. DuckDB sum(BIGINT) returns
            # HUGEINT, which pandas renders as float64 ("123.0" != "123")
            ddf = cur.df()
            d_rows = [
                tuple(v.item() if hasattr(v, "item") else v for v in row)
                for row in ddf.itertuples(index=False, name=None)
            ]
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failures += 1
            continue
        ok_cols = sorted(s_names) == sorted(d_names)
        ok_rows = len(s_rows) == len(d_rows)
        ok_hash = ok_cols and table_hash(s_names, s_rows) == table_hash(d_names, d_rows)
        if ok_cols and ok_rows and ok_hash:
            print(f"PASS {name}: {len(s_rows)} rows")
        else:
            failures += 1
            print(f"FAIL {name}: cols_match={ok_cols} rows {len(s_rows)} vs "
                  f"{len(d_rows)} hash_match={ok_hash}")
            if not ok_cols:
                print(f"  spark cols: {sorted(s_names)}")
                print(f"  duck  cols: {sorted(d_names)}")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
