#!/usr/bin/env python3
"""Cross-SF correctness sidecar checker (round-12 verdict #4).

Same gate semantics as check_correctness.py — column names (sorted),
row count, content hash — but the hash compare runs INSIDE DuckDB as a
multiset aggregate (sum of per-row 64-bit hashes over name-sorted,
NULL-canonicalized varchar renderings), so 10^8-row gate outputs never
materialize in Python. Both sides (Spark parquet and the oracle SQL)
go through the identical DuckDB rendering, so the compare is
engine-symmetric.

Usage: python3 tools/check_sf.py <verify_out_dir> <sf_dir> [out_json] [only]
  `only`: comma-separated gate filter; with an existing out_json, results
  for unfiltered gates are carried over (incremental re-check).
"""
import sys, json, glob, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Gates whose oracle materializes a quadratic intermediate (the kNN
# cross-join+window is |cust|x|supp| rows before rank<=k cuts it) are
# compared in SHARDS: the multiset hash is a SUM of per-row hashes, so
# per-shard (count, hash) pairs ADD across disjoint shards — same
# fingerprint, bounded peak memory. DuckDB 1.0's window operator cannot
# spill, and a shard predicate ABOVE the window is not pushed through
# it (verified with EXPLAIN), so the shard restricts the BASE table the
# window partitions by: q_knn's row_number partitions by c.id, so
# evaluating the oracle over disjoint customer slices is exact.
# Spec: out gate -> (probe table, probe key, shard count).
SHARDED = {"q_knn": ("customer", "c_custkey", 16)}


def fingerprint(con, subquery):
    """(sorted column names, row count, multiset hash) of a relation."""
    cols = [d[0] for d in con.execute(
        f"SELECT * FROM ({subquery}) LIMIT 0").description]
    ordered = sorted(cols)
    rendered = ", ".join(
        f"COALESCE(CAST(\"{c}\" AS VARCHAR), 'NULL')" for c in ordered)
    n, h = con.execute(
        f"SELECT count(*), COALESCE(sum(hash(concat_ws(chr(1), {rendered}))), 0)"
        f" FROM ({subquery})").fetchone()
    return ordered, n, str(h)


def fingerprint_sharded(con, subquery, view_sql, table, key, n_shards):
    """[[fingerprint]] of an oracle whose probe TABLE is evaluated in
    n disjoint `key % n` slices (view re-created per slice, restored
    after). Counts and multiset hashes sum across slices."""
    cols = [d[0] for d in con.execute(
        f"SELECT * FROM ({subquery}) LIMIT 0").description]
    ordered = sorted(cols)
    rendered = ", ".join(
        f"COALESCE(CAST(\"{c}\" AS VARCHAR), 'NULL')" for c in ordered)
    n_total, h_total = 0, 0
    try:
        for i in range(n_shards):
            con.execute(f"CREATE OR REPLACE VIEW {table} AS "
                        f"SELECT * FROM ({view_sql}) WHERE (\"{key}\" % {n_shards}) = {i}")
            n, h = con.execute(
                f"SELECT count(*), COALESCE(sum(hash(concat_ws(chr(1), {rendered}))), 0)"
                f" FROM ({subquery})").fetchone()
            n_total += n
            h_total += int(h)
    finally:
        con.execute(f"CREATE OR REPLACE VIEW {table} AS {view_sql}")
    return ordered, n_total, str(h_total)


def main(out_dir, sf_dir, out_json=None, only=None):
    con = duckdb.connect()
    # An in-memory DuckDB has NO temp_directory, so big oracle shapes
    # (the kNN cross-join+window is ~1.5e9 intermediate rows at sf1)
    # abort with OOM instead of spilling — exactly the 4 failures in the
    # first CORRECTNESS_SF1 run. Give it a spill dir, drop insertion-
    # order preservation (halves sort memory), and cap memory below the
    # cgroup so the allocator spills instead of dying.
    con.execute("SET temp_directory='/tmp/duckdb_sf_spill'")
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='80GB'")
    view_sql = {}
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            src = (f"SELECT * FROM read_parquet('{p}/*.parquet')"
                   if os.path.isdir(p) else
                   f"SELECT * FROM read_parquet('{p}')")
            view_sql[t] = src
            con.execute(f"CREATE VIEW {t} AS {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results, failures = {}, 0
    if only is not None:
        keep = set(only.split(","))
        unknown = keep - set(oracle)
        if unknown:
            # a typo must not silently record a green sidecar for a gate
            # that was never re-checked
            sys.exit(f"unknown gate(s) in filter: {sorted(unknown)}")
        # carry over prior results for gates outside the filter — also
        # ones absent from the CURRENT oracle_sql.json (a filtered Verify
        # run rewrites that file with only its subset; earlier sidecar
        # results must survive the incremental re-check)
        if out_json and os.path.exists(out_json):
            prior = json.load(open(out_json)).get("results", {})
            for k, v in prior.items():
                if k not in keep:
                    results[k] = v
                    if v.get("status") != "pass":
                        failures += 1
        oracle = {k: v for k, v in oracle.items() if k in keep}
    for name, sql in sorted(oracle.items()):
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output")
            results[name] = {"status": "fail", "reason": "no spark output"}
            failures += 1
            continue
        t0 = time.time()
        # static oracle SQL embeds the driver gate's aux path
        # (.../oracle_aux/sf0.01/...); the Spark side writes the aux keyed
        # by the SF dir under test — point the oracle at the same one
        sql = sql.replace("/oracle_aux/sf0.01/",
                          f"/oracle_aux/{os.path.basename(sf_dir.rstrip('/'))}/")
        shard = SHARDED.get(name)
        try:
            s_cols, s_n, s_h = fingerprint(
                con, f"SELECT * FROM read_parquet('{spark_glob}')")
            if shard and shard[0] in view_sql:
                tbl, key, k = shard
                d_cols, d_n, d_h = fingerprint_sharded(
                    con, sql, view_sql[tbl], tbl, key, k)
            else:
                d_cols, d_n, d_h = fingerprint(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            results[name] = {"status": "fail", "reason": f"oracle error {e}"}
            failures += 1
            continue
        dt = time.time() - t0
        if s_cols != d_cols:
            print(f"FAIL {name}: columns {s_cols} vs {d_cols}")
            results[name] = {"status": "fail", "reason": "schema",
                             "spark": s_cols, "duck": d_cols}
            failures += 1
        elif s_n != d_n:
            print(f"FAIL {name}: rows {s_n} vs {d_n}")
            results[name] = {"status": "fail", "reason": "rows",
                             "spark": s_n, "duck": d_n}
            failures += 1
        elif s_h != d_h:
            print(f"FAIL {name}: hash mismatch over {s_n} rows")
            results[name] = {"status": "fail", "reason": "hash", "rows": s_n}
            failures += 1
        else:
            print(f"PASS {name}: {s_n} rows ({dt:.1f}s)")
            results[name] = {"status": "pass", "rows": s_n,
                             "check_sec": round(dt, 1)}
    total = len(results) if only is not None else len(oracle)
    print(f"\n{total - failures}/{total} queries pass")
    if out_json:
        json.dump({"sf_dir": sf_dir, "results": results,
                   "passed": total - failures, "total": total},
                  open(out_json, "w"), indent=1)
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2],
                       sys.argv[3] if len(sys.argv) > 3 else None,
                       sys.argv[4] if len(sys.argv) > 4 else None) else 0)
