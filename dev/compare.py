#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool, not shipped).

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB against the
parquet tables in <sfdir>, reads the Spark-written parquet from
<outdir>/<query>/, and compares schema + row-order + values strictly.

Usage: python3 dev/compare.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# Output-type convention the driver's pandas comparator imposes (round-1
# lesson: 11 queries red on it while this gate was green): DECIMAL columns
# hash-mismatch (DuckDB result → float64, Spark parquet → Decimal objects)
# and LIST/STRUCT/MAP/BLOB columns crash pandas sorting ("unhashable type").
# Round-4 lesson: DuckDB window/aggregate sums over integers yield HUGEINT,
# which fetches as Python int and compares equal here but hash-mismatches in
# the driver (int128 vs int64 dtype) — reject it too. Reject them HERE so
# the gap between this gate and the driver's cannot recur. Serialize arrays
# to strings, cast final decimals to DOUBLE, CAST integer sums to BIGINT.
def unsafe_types(rel):
    bad = []
    for c, t in zip(rel.columns, rel.types):
        s = str(t).upper()
        if s.startswith("DECIMAL") or s.endswith("[]") or \
           s.startswith(("STRUCT", "MAP", "UNION")) or s == "BLOB" or \
           s in ("HUGEINT", "UHUGEINT"):
            bad.append(f"{c}:{s}")
    return bad


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            want = con.sql(sql)
            want_cols = list(want.columns)
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            got_cols = list(got.columns)
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        bad_types = [f"oracle {b}" for b in unsafe_types(want)] + \
                    [f"spark {b}" for b in unsafe_types(got)]
        if bad_types:
            print(f"FAIL {name}: driver-unsafe output types: {', '.join(bad_types)}")
            n_fail += 1
            continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns differ: oracle={sorted(want_cols)} spark={sorted(got_cols)}")
            n_fail += 1
            continue
        if len(want_rows) != len(got_rows):
            print(f"FAIL {name}: rowcount differs: oracle={len(want_rows)} spark={len(got_rows)}")
            n_fail += 1
            continue
        if len(want_rows) == 0:
            print(f"FAIL {name}: EMPTY result (masks bugs; SURVEY 2.10(7))")
            n_fail += 1
            continue
        # align column order by name
        wperm = [want_cols.index(c) for c in sorted(want_cols)]
        gperm = [got_cols.index(c) for c in sorted(got_cols)]
        bad = None
        for i, (wr, gr) in enumerate(zip(want_rows, got_rows)):
            wv = tuple(norm(wr[j]) for j in wperm)
            gv = tuple(norm(gr[j]) for j in gperm)
            if wv != gv:
                bad = (i, wv, gv)
                break
        if bad:
            i, wv, gv = bad
            print(f"FAIL {name}: row {i} differs\n  oracle: {wv}\n  spark:  {gv}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
