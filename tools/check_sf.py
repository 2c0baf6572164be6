#!/usr/bin/env python3
"""Cross-SF correctness sidecar checker (round-12 verdict #4).

Same gate semantics as check_correctness.py — column names (sorted),
row count, content hash — but the hash compare runs INSIDE DuckDB as a
multiset aggregate (sum of per-row 64-bit hashes over name-sorted,
NULL-canonicalized varchar renderings), so 10^8-row gate outputs never
materialize in Python. Both sides (Spark parquet and the oracle SQL)
go through the identical DuckDB rendering, so the compare is
engine-symmetric.

Gates whose oracle is too expensive to recompute fully at sf1 are
verified on a deterministic residue slice (see CHEAP below): bit-exact
rows+hash on the slice, full schema + full spark-side row count, with
the slice spec recorded in the result so a sampled pass is never
mistaken for a full one.

Usage: python3 tools/check_sf.py <verify_out_dir> <sf_dir> [out_json] [only]
  `only`: comma-separated gate filter; with an existing out_json, results
  for unfiltered gates are carried over (incremental re-check).
"""
import sys, json, glob, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Gates whose oracle is too expensive for a per-round full check at sf1
# (round-13 costs: q_spjoin_dwithin 345 s — a 61M-row join recomputed in
# DuckDB; q_bpe_encode 216 s — a per-doc recursive-CTE merge fold;
# q_knn 59 s — a |cust|x|supp| cross-join+window) are verified on a
# deterministic SLICE: rows with `out_col % n IN residues`. Both sides
# go through the SAME DuckDB session and predicate, so the compare is
# engine-symmetric and bit-exact ON THE SLICE; schema equality stays
# full-output, and the result records the slice spec plus the full
# spark-side row count so a sampled pass can't be misread as a full one.
#
# Two evaluation modes per gate:
#  - table/key ABSENT: the residue predicate goes ON TOP of the oracle
#    subquery; DuckDB pushes it through joins/projections down to the
#    base table (oracle compute shrinks ~n/|residues|-fold). Valid for
#    join/map shapes where out_col is a base-table key verbatim.
#  - table/key PRESENT: the probe TABLE's view is re-created per residue
#    (a predicate above a WINDOW is not pushed through it — verified
#    with EXPLAIN — so the slice must restrict the base table the window
#    partitions by; exact because the window PARTITIONs BY that key).
#    Counts/hashes of residue slices ADD (multiset-hash = sum of row
#    hashes), which also bounds DuckDB's peak memory per slice.
# residues == range(n) makes either mode a FULL check (the q_knn memory-
# bounding shards of round 13 are residues=range(16)).
CHEAP = {
    # q_knn stays a FULL check — residues = range(n) — evaluated in 16
    # customer shards purely to bound DuckDB's window memory (its oracle
    # is a |cust|x|supp| cross join whose windows can't spill), the
    # round-13 protocol. ~60 s at sf1; narrowing it to a partial slice
    # would leave 7/8 of the kNN output unverified at every SF.
    "q_knn": dict(table="customer", key="c_custkey", out="cid",
                  n=16, residues=tuple(range(16))),
    "q_spjoin_dwithin": dict(out="cid", n=10, residues=(0,)),
    # tokenizer-apply oracles: the residue must restrict the documents
    # VIEW itself (table mode) — the per-doc recursive-CTE fold is opaque
    # to DuckDB's filter pushdown, so predicate-on-top only trimmed the
    # final join (measured 163.7 s / 75.6 s at sf1 vs 216 s / 80 s full).
    # Exact per residue: merges/vocab come from a checkpointed aux table
    # independent of the documents view, and each doc tokenizes alone.
    "q_bpe_encode": dict(table="documents", key="doc_id", out="doc_id",
                         n=5, residues=(0,)),
    "q_wordpiece": dict(table="documents", key="doc_id", out="doc_id",
                        n=5, residues=(0,)),
}
# the dwithin partitioner variants share q_spjoin_dwithin's oracle; the
# kNN SQL-surface twins share q_knn's window shape (and its probe table)
for _v in ("bsp", "qt", "str", "hc", "slc", "bos",
           "strdist", "slcdist", "qtdist", "bspdist", "bosdist"):
    CHEAP[f"q_spjoin_dwithin_{_v}"] = CHEAP["q_spjoin_dwithin"]
CHEAP["q_knn_sql"] = CHEAP["q_knn"]
CHEAP["q_knn_bounded"] = CHEAP["q_knn"]
CHEAP["q_spjoin_dwithin_earth"] = CHEAP["q_spjoin_dwithin"]
# round-14 sidecar extension (sf1 costs measured before adding each):
#  - knn_3d window over a 150k x 200k cross join: 1/100 customer slice
#    measured 57.8 s -> n=200 keeps the check ~30 s (oc twin = same oracle)
#  - spt / range / interval joins: output grows ~150M rows at sf1; the
#    residue predicate pushes to the probe-side base table (2.2 s / 0.2 s
#    / 2.9 s measured at the slices below)
#  - disjoint NOT EXISTS anti join: 4.9 s at 1/10
CHEAP["q_knn_3d"] = dict(table="customer", key="c_custkey", out="cid",
                         n=200, residues=(0,))
CHEAP["q_knn_3d_oc"] = CHEAP["q_knn_3d"]
CHEAP["q_spjoin_spt"] = dict(out="cid", n=100, residues=(0,))
CHEAP["q_range_join"] = dict(out="pid", n=20, residues=(0,))
CHEAP["q_interval_join"] = dict(out="aid", n=20, residues=(0,))
CHEAP["q_disjoint_sql"] = dict(out="cid", n=10, residues=(0,))
# full-catalog sidecar (round-14): q_fields' box self-join emits 163.7M
# rows at sf1 (the DuckDB recompute alone measured 145.7 s full); the
# l_id residue pushes to the left base side. twolevel/sampled share the
# dwithin oracle; disjoint_global shares disjoint_sql's shape.
CHEAP["q_fields"] = dict(out="l_id", n=10, residues=(0,))
CHEAP["q_spjoin_projectall"] = CHEAP["q_fields"]
CHEAP["q_disjoint_global"] = CHEAP["q_disjoint_sql"]
CHEAP["q_spjoin_twolevel"] = CHEAP["q_spjoin_dwithin"]
CHEAP["q_spjoin_sampled"] = CHEAP["q_spjoin_dwithin"]
# round-16 (verdict #4): the residual-ADC oracles join a (qid,list,sub,
# code,dq) LUT aux against the 32M-row code aux and GROUP BY (qid,nid) —
# the agg table is |queries| x |items-in-probed-lists| groups (~2e10 at
# sf10's 40k queries), the >70 GB DuckDB spill that failed the sf10
# sidecar. The slice restricts the LUT AUX TABLE by qid (aux mode below):
# each query's ADC sums derive only from its own LUT rows, so the slice
# is exact per qid, and 487 is prime so it does not interact with the
# vec_id%50 query-draw pattern (qids are multiples of 50; a divisor of
# 50 would select a biased 1/2 or 1/10 of them). ~82 of 40k queries at
# sf10 -> ~41M agg groups, well inside the 48 GB limit.
CHEAP["q_ann_ivfpq"] = dict(aux="ann_ivfpq_luts", key="qid", out="qid",
                            n=487, residues=(0,))
CHEAP["q_ann_ivfpq_compact"] = dict(aux="ann_ivfpqc_luts", key="qid",
                                    out="qid", n=487, residues=(0,))
# the area-growth twins share their base gates' oracle shapes (the kNN
# twins' cross-join+window is identical modulo block offsets)
CHEAP["q_knn_area"] = CHEAP["q_knn"]
CHEAP["q_knn_3d_area"] = CHEAP["q_knn_3d"]
CHEAP["q_spjoin_dwithin_area"] = CHEAP["q_spjoin_dwithin"]

# Per-SF overrides (round-16 verdict #4): specs whose cost is bound by
# |probe| x |corpus| stop being affordable at sf10 even sliced — the kNN
# window family's cross join is 1.5M x 1M there. These overrides narrow
# the probe slice AT SF10 ONLY (basename match), keeping the sf1 checks
# at their existing (fuller) coverage; every sliced result records its
# slice spec, so a partial pass is never mistaken for a full one.
CHEAP_BY_SF = {
    "graft_sf10": {
        # 2-D kNN: ~1.5k of 1.5M customers x 1M suppliers = 1.5e9
        # window rows per check — measured-affordable class
        "q_knn": dict(table="customer", key="c_custkey", out="cid",
                      n=1000, residues=(0,)),
        # 3-D kNN vs 2M part cubes: the n=2000 slice (750 probes -> 1.5G
        # window rows) spilled DuckDB past the 76 GB free disk at the
        # r17 re-record; 75 probes keep the window sort ~150M rows. The
        # slice spec rides in the result, so the partial pass is labeled.
        "q_knn_3d": dict(table="customer", key="c_custkey", out="cid",
                         n=20000, residues=(0,)),
    }
}
CHEAP_BY_SF["graft_sf10"]["q_knn_sql"] = CHEAP_BY_SF["graft_sf10"]["q_knn"]
CHEAP_BY_SF["graft_sf10"]["q_knn_bounded"] = CHEAP_BY_SF["graft_sf10"]["q_knn"]
CHEAP_BY_SF["graft_sf10"]["q_knn_area"] = CHEAP_BY_SF["graft_sf10"]["q_knn"]
CHEAP_BY_SF["graft_sf10"]["q_knn_3d_oc"] = CHEAP_BY_SF["graft_sf10"]["q_knn_3d"]
CHEAP_BY_SF["graft_sf10"]["q_knn_3d_area"] = CHEAP_BY_SF["graft_sf10"]["q_knn_3d"]


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


def check_slice_key(con, relation, col, what):
    """A NULL slice key drops from every residue (NULL % n is NULL) and a
    negative one from all non-negative residues (DuckDB % keeps the
    sign) — rows that would be SILENTLY excluded from verification on
    both sides. Fail loudly instead."""
    bad = con.execute(
        f"SELECT count(*) FROM ({relation}) "
        f"WHERE \"{col}\" IS NULL OR \"{col}\" < 0").fetchone()[0]
    if bad:
        raise RuntimeError(
            f"{what}: {bad} rows have NULL/negative \"{col}\" — the "
            f"residue slice would silently skip them; pick another key")


def fingerprint_cheap(con, subquery, view_sql, spec):
    """[[fingerprint]] restricted to the deterministic residue slice in
    `spec` (see CHEAP). table/key present: the probe table's view is
    re-created per residue and restored after; counts and multiset
    hashes sum across residues. table absent: one pass with the residue
    predicate on top of the subquery (pushed down by DuckDB)."""
    cols = [d[0] for d in con.execute(
        f"SELECT * FROM ({subquery}) LIMIT 0").description]
    ordered = sorted(cols)
    rendered = ", ".join(
        f"COALESCE(CAST(\"{c}\" AS VARCHAR), 'NULL')" for c in ordered)
    n, residues = spec["n"], list(spec["residues"])
    if "aux" in spec:
        # aux mode: the probe relation is a checkpointed aux parquet
        # referenced inline via read_parquet (no DuckDB view to swap) —
        # splice the residue predicate into the read_parquet call itself,
        # per residue. Exact when each output row's derivation reads only
        # the aux rows sharing its `key` (ADC: sums group by qid).
        import re
        key = spec["key"]
        pat = re.compile(
            r"read_parquet\('([^']*/%s/\*\.parquet)'\)" % re.escape(spec["aux"]))
        m = pat.search(subquery)
        if not m:
            raise RuntimeError(
                f"CHEAP aux {spec['aux']}: read_parquet reference not found "
                "in the oracle SQL — aux name or path template drifted")
        base = f"read_parquet('{m.group(1)}')"
        check_slice_key(con, f"SELECT * FROM {base}", key,
                        f"CHEAP aux {spec['aux']}.{key}")
        n_total, h_total = 0, 0
        for i in residues:
            filt = (f"(SELECT * FROM {base} "
                    f"WHERE (\"{key}\" % {n}) = {i})")
            q = pat.sub(lambda _: filt, subquery)
            cnt, h = con.execute(
                f"SELECT count(*), COALESCE(sum(hash(concat_ws(chr(1), {rendered}))), 0)"
                f" FROM ({q})").fetchone()
            n_total += cnt
            h_total += int(h)
        return ordered, n_total, str(h_total)
    if "table" not in spec:
        pred = f"(\"{spec['out']}\" % {n}) IN ({', '.join(map(str, residues))})"
        cnt, h = con.execute(
            f"SELECT count(*), COALESCE(sum(hash(concat_ws(chr(1), {rendered}))), 0)"
            f" FROM ({subquery}) WHERE {pred}").fetchone()
        return ordered, cnt, str(int(h))
    table, key = spec["table"], spec["key"]
    check_slice_key(con, view_sql[table], key, f"CHEAP probe {table}.{key}")
    n_total, h_total = 0, 0
    try:
        for i in residues:
            con.execute(f"CREATE OR REPLACE VIEW {table} AS "
                        f"SELECT * FROM ({view_sql[table]}) WHERE (\"{key}\" % {n}) = {i}")
            cnt, h = con.execute(
                f"SELECT count(*), COALESCE(sum(hash(concat_ws(chr(1), {rendered}))), 0)"
                f" FROM ({subquery})").fetchone()
            n_total += cnt
            h_total += int(h)
    finally:
        con.execute(f"CREATE OR REPLACE VIEW {table} AS {view_sql[table]}")
    return ordered, n_total, str(h_total)


def fresh_con(view_sql):
    """One DuckDB connection PER GATE (sf10 lesson: a shared connection
    accumulated allocator state across ~25 heavy oracle shapes and began
    failing tiny mallocs nondeterministically — 'bad allocation' on a
    2 KB block with 116 GB of host memory free; a fresh connection per
    gate isolates every gate's memory lifecycle). Settings:
    - temp_directory: an in-memory DuckDB has NO spill dir, so big
      oracle shapes (the kNN cross-join+window is ~1.5e9 intermediate
      rows at sf1) abort with OOM instead of spilling.
    - preserve_insertion_order=false halves sort memory.
    - memory_limit below the cgroup (env CHECK_SF_MEMLIMIT, default
      48GB — lower than the old 80GB so the buffer manager spills long
      before malloc can fail) so the allocator spills instead of dying."""
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_sf_spill'")
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='%s'"
                % os.environ.get("CHECK_SF_MEMLIMIT", "48GB"))
    for t, src in view_sql.items():
        con.execute(f"CREATE VIEW {t} AS {src}")
    return con


def gate_fingerprints(name, sql, view_sql, spark_glob, sf_dir):
    """The per-gate oracle work, run in a fresh worker process (see the
    executor comment in main): returns the spark/duck fingerprints, or
    {'err': ...} on any oracle failure."""
    con = fresh_con(view_sql)
    # static oracle SQL embeds the driver gate's aux path
    # (.../oracle_aux/sf0.01/...); the Spark side writes the aux keyed
    # by the SF dir under test — point the oracle at the same one
    sql = sql.replace("/oracle_aux/sf0.01/",
                      f"/oracle_aux/{os.path.basename(sf_dir.rstrip('/'))}/")
    cheap = CHEAP_BY_SF.get(
        os.path.basename(sf_dir.rstrip("/")), {}).get(name, CHEAP.get(name))
    if cheap and "table" in cheap and cheap["table"] not in view_sql:
        cheap = None
    sliced, s_full_n = None, None
    spark_rel = f"SELECT * FROM read_parquet('{spark_glob}')"
    try:
        if cheap:
            out, n = cheap["out"], cheap["n"]
            residues = list(cheap["residues"])
            sliced = f"{out}%{n} in {residues}"
            # full spark-side row count: RECORDED (spark_rows_full in
            # the output), verified against the oracle only when the
            # gate opts in with full_count=True — for the rest, spurious
            # spark rows in unchecked residues are a disclosed slicing
            # gap (the cross-engine rows/hash compare runs on the slice)
            s_full_n = con.execute(
                f"SELECT count(*) FROM ({spark_rel})").fetchone()[0]
            if cheap.get("full_count"):
                d_full_n = con.execute(
                    f"SELECT count(*) FROM ({sql})").fetchone()[0]
                if d_full_n != s_full_n:
                    raise AssertionError(
                        f"FULL row count mismatch: spark {s_full_n} vs "
                        f"oracle {d_full_n} (slice checks only {sliced})")
            check_slice_key(con, spark_rel, out,
                            f"{name} spark output \"{out}\"")
            pred = f"(\"{out}\" % {n}) IN ({', '.join(map(str, residues))})"
            s_cols, s_n, s_h = fingerprint(con, f"{spark_rel} WHERE {pred}")
            d_cols, d_n, d_h = fingerprint_cheap(con, sql, view_sql, cheap)
        else:
            s_cols, s_n, s_h = fingerprint(con, spark_rel)
            d_cols, d_n, d_h = fingerprint(con, sql)
    except Exception as e:
        return {"err": str(e)}
    finally:
        con.close()
    return {"s_cols": s_cols, "s_n": s_n, "s_h": s_h,
            "d_cols": d_cols, "d_n": d_n, "d_h": d_h,
            "sliced": sliced, "s_full_n": s_full_n}


def _gate_worker(q, name, sql, view_sql, spark_glob, sf_dir):
    """Child entry point: run one gate's oracle and ship the (small)
    fingerprint dict back on the queue. Any exception becomes an err
    payload so the parent never has to infer failure from exit codes."""
    try:
        q.put(gate_fingerprints(name, sql, view_sql, spark_glob, sf_dir))
    except BaseException as e:  # noqa: BLE001 — the whole point is to report
        q.put({"err": f"{type(e).__name__}: {e}"})


def run_gate_isolated(mp_ctx, gate_timeout, name, sql, view_sql,
                      spark_glob, sf_dir):
    """Run one gate in its own process with an optional wall budget.
    Uses only documented multiprocessing.Process APIs: on budget miss the
    child is killed via Process.kill(); a child that dies without putting
    a result (OOM-kill, hard crash) is reported distinguishably."""
    import queue as queue_mod
    q = mp_ctx.Queue()
    p = mp_ctx.Process(target=_gate_worker, daemon=True,
                       args=(q, name, sql, view_sql, spark_glob, sf_dir))
    p.start()
    deadline = time.time() + gate_timeout if gate_timeout else None
    try:
        while True:
            try:
                # poll in 1 s slices so a silently-dead child is noticed
                # even with no gate_timeout set (the old pool raised
                # BrokenProcessPool for this; a bare Queue never would)
                return q.get(timeout=1.0)
            except queue_mod.Empty:
                if deadline is not None and time.time() >= deadline:
                    p.kill()
                    return {"err": f"oracle exceeded CHECK_SF_GATE_TIMEOUT="
                                   f"{gate_timeout:g}s (budget miss, not a "
                                   f"value mismatch)"}
                if not p.is_alive():
                    # one last drain: the child may have put the result
                    # between our empty poll and its exit
                    try:
                        return q.get_nowait()
                    except queue_mod.Empty:
                        return {"err": "oracle worker process died "
                                       "(OOM-killed?)"}
    finally:
        p.join(timeout=5)
        q.close()


def main(out_dir, sf_dir, out_json=None, only=None):
    view_sql = {}
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            src = (f"SELECT * FROM read_parquet('{p}/*.parquet')"
                   if os.path.isdir(p) else
                   f"SELECT * FROM read_parquet('{p}')")
            view_sql[t] = src
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
    # one FRESH PROCESS per gate: a shared process accumulated DuckDB
    # allocator/mmap state across ~25 heavy oracle shapes at sf10 and
    # began failing KILOBYTE mallocs with >100 GB of host memory free
    # (vm.max_map_count exhaustion class); per-gate connections in one
    # process were NOT enough — the leak is process-level, so the
    # process is the isolation unit. Plain multiprocessing.Process per
    # gate (not ProcessPoolExecutor) so the timeout path kills the
    # worker through the DOCUMENTED Process API — the earlier pool
    # version reached into the undocumented executor._processes dict,
    # which can break across CPython versions exactly when the timeout
    # fires.
    import multiprocessing as mp
    mp_ctx = mp.get_context("fork")
    # optional per-gate wall budget (seconds): an oracle whose cost was
    # mis-predicted at a new SF must fail THAT gate, not hang the whole
    # sidecar run. On timeout the worker process is killed (it holds the
    # only DuckDB state); the gate records a distinguishable reason so a
    # budget miss is never read as a wrong-answer failure.
    gate_timeout = os.environ.get("CHECK_SF_GATE_TIMEOUT")
    gate_timeout = float(gate_timeout) if gate_timeout else None
    for name, sql in sorted(oracle.items()):
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output")
            results[name] = {"status": "fail", "reason": "no spark output"}
            failures += 1
            continue
        t0 = time.time()
        r = run_gate_isolated(mp_ctx, gate_timeout, name, sql, view_sql,
                              spark_glob, sf_dir)
        if "err" in r:
            print(f"FAIL {name}: oracle error {r['err']}")
            results[name] = {"status": "fail",
                             "reason": f"oracle error {r['err']}"}
            failures += 1
            continue
        s_cols, s_n, s_h = r["s_cols"], r["s_n"], r["s_h"]
        d_cols, d_n, d_h = r["d_cols"], r["d_n"], r["d_h"]
        sliced, s_full_n = r["sliced"], r["s_full_n"]
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
            note = f" [slice {sliced}]" if sliced else ""
            print(f"PASS {name}: {s_n} rows ({dt:.1f}s){note}")
            results[name] = {"status": "pass", "rows": s_n,
                             "check_sec": round(dt, 1)}
            if sliced:
                # an honest sampled pass must not read like a full one
                results[name]["sliced"] = sliced
                results[name]["spark_rows_full"] = s_full_n
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
