#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run the oracle SQL in DuckDB over the same parquet tables and
compare rows/schema/values (columns sorted by name, values canonicalized).

Usage: tools/compare.py /tmp/verify1 /root/testdata/sf0.01
"""
import json, math, sys
import duckdb

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)

def table(rows, names):
    idx = sorted(range(len(names)), key=lambda i: names[i])
    return [tuple(canon(r[i]) for i in idx) for r in rows]

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            grows, gnames = got.fetchall(), [d[0] for d in got.description]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}"); n_fail += 1
            continue
        try:
            exp = con.execute(sql)
            erows, enames = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1
            continue
        if gnames == ["__verify_error"]:
            # Verify's error-marker parquet: the Spark query threw; the
            # marker carries the exception so the gate shows the CAUSE
            print(f"FAIL {name}: spark query failed: {grows[0][0]}")
            n_fail += 1
            continue
        if sorted(gnames) != sorted(enames):
            print(f"FAIL {name}: columns {sorted(gnames)} != {sorted(enames)}")
            n_fail += 1
            continue
        gt, et = table(grows, gnames), table(erows, enames)
        if len(gt) != len(et):
            print(f"FAIL {name}: rows {len(gt)} != {len(et)}"); n_fail += 1
            continue
        if gt != et:
            bad = next(i for i in range(len(gt)) if gt[i] != et[i])
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  spark : {gt[bad]}")
            print(f"  oracle: {et[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(gt)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
