#!/usr/bin/env python
"""Local emulation of the driver's t2 oracle compare (dev tool only —
not part of the shipped library; uses the driver-side python stack).

Usage: python scripts/check.py <sfDir> <verifyOutDir>

For each <verifyOutDir>/<name>/ parquet result, runs the matching SQL
from oracle_sql.json in DuckDB (tables registered as views over the
sfDir parquet files), sorts columns by name on both sides, and
compares values row-by-row in result order.
"""
import json, sys, glob, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    failed = []
    for name in sorted(oracle):
        res_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not res_glob:
            print(f"FAIL {name}: no spark result parquet"); failed.append(name); continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({res_glob!r})").fetch_arrow_table()
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); failed.append(name); continue
        g = got.select(sorted(got.column_names)).to_pylist()
        e = exp.select(sorted(exp.column_names)).to_pylist()
        if sorted(got.column_names) != sorted(exp.column_names):
            print(f"FAIL {name}: columns {sorted(got.column_names)} != {sorted(exp.column_names)}")
            failed.append(name); continue
        gt = {f.name: f.type for f in got.schema}
        et = {f.name: f.type for f in exp.schema}
        tdiff = [(c, str(gt[c]), str(et[c])) for c in gt if str(gt[c]) != str(et[c])]
        if tdiff:
            print(f"WARN {name}: type mismatch (driver may flag schema): {tdiff}")
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}"); failed.append(name); continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first at {i}:\n  spark={a}\n  duck ={b}")
            failed.append(name); continue
        print(f"OK   {name}: {len(g)} rows")
    print(f"\n{len(oracle)-len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
