#!/usr/bin/env python
"""Cross-engine check of c159 record linkage at the 100x scale the
driver's sf0.01 gate cannot reach (dev tool only; driver-side python
stack). Replays the EXACT oracle SQL that graft.Verify dumps -- the
same text the sf-gate hash-verifies -- sharded 16 ways on the dirty
side (dirty_id % 16 inside the dirty CTE's WHERE), because DuckDB
runs a single-row-group parquet join ~2-threaded; multiprocessing
over shards restores parallelism (the c158 oracle treatment from
round 14). The shard predicate partitions the dirty side, and every
output row carries exactly one dirty_id, so the union of shard
results IS the unsharded result.

Usage:
  python scripts/link_oracle.py <sfDir> <sparkBatchParquetDir> <oracle_sql.json>

Compares the merged DuckDB result against the parquet that
graft.LinkScale writes (batch_c159.parquet), row by row after a full
sort, and independently tallies planted-pair recall (every dirty
record must self-link at its class's exact score).
"""
import json, os, sys, glob, multiprocessing
import duckdb

SHARDS = 16
MARKER = "WHERE substr(md5('link:' || CAST(c_custkey AS VARCHAR)), 1, 1) < '8')"
COLS = ["cust_id", "dirty_id", "name_agree", "bal_agree", "score"]


def customer_glob(sf_dir):
    p = f"{sf_dir}/customer.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def run_shard(args):
    k, sf_dir, sql = args
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{customer_glob(sf_dir)}')")
    return con.execute(sql).fetchall()


def main(sf_dir, spark_dir, oracle_json):
    sql = json.load(open(oracle_json))["c159_record_linkage"]
    assert sql.count(MARKER) == 1, "dirty-CTE marker not found; oracle text changed"
    shard_args = [
        (k, sf_dir, sql.replace(
            MARKER,
            "WHERE substr(md5('link:' || CAST(c_custkey AS VARCHAR)), 1, 1) < '8' "
            f"AND c_custkey % {SHARDS} = {k})"))
        for k in range(SHARDS)]
    with multiprocessing.Pool(SHARDS) as pool:
        shards = pool.map(run_shard, shard_args)
    exp = sorted(r for rows in shards for r in rows)
    con = duckdb.connect()
    files = sorted(glob.glob(f"{spark_dir}/*.parquet"))
    got = sorted(con.execute(
        f"SELECT {', '.join(COLS)} FROM read_parquet({files!r})").fetchall())
    print(f"duck rows={len(exp)} spark rows={len(got)}")
    if len(exp) != len(got):
        print("FAIL: row counts differ")
        return 1
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(got, exp)) if tuple(a) != tuple(b)]
    if bad:
        i, a, b = bad[0]
        print(f"FAIL: {len(bad)}/{len(got)} rows differ; first at {i}:\n"
              f"  spark={a}\n  duck ={b}")
        return 1
    # Independent planted recall: the plant says every md5-dealt dirty
    # record self-links at 9 (class 0) or 6 (class 1) -- counted from
    # the ORACLE result, not the pipeline under test.
    planted = con.execute(
        "SELECT CASE WHEN substr(md5('link:' || CAST(c_custkey AS VARCHAR)), 2, 1) < '8' "
        "THEN 9 ELSE 6 END AS exp_score, c_custkey "
        f"FROM read_parquet('{customer_glob(sf_dir)}') "
        "WHERE substr(md5('link:' || CAST(c_custkey AS VARCHAR)), 1, 1) < '8'").fetchall()
    self_scores = {(c, d): s for (c, d, _na, _ba, s) in exp if c == d}
    recovered = sum(1 for (score, cid) in planted
                    if self_scores.get((cid, cid)) == score)
    print(f"planted={len(planted)} recovered_at_exact_score={recovered}")
    if recovered != len(planted):
        print("FAIL: planted-pair recall loss")
        return 1
    print(f"OK: c159 hash-equal at {sf_dir} ({len(got)} rows, {SHARDS} shards)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
