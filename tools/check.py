#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev loop only; the
shipped engine is pure Scala). Runs each oracle SQL from
outDir/oracle_sql.json in DuckDB over the sf tables, loads the engine's
parquet output for the same query, sorts columns by name and rows by all
columns, and compares values exactly.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    r.append("NaN")
                else:
                    r.append(repr(v))  # full precision
            else:
                r.append(repr(v))
        out.append(tuple(r))
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # guard against a stale outDir silently shrinking the check set
    import os
    dumped = {d for d in os.listdir(out_dir) if not d.endswith(".json")}
    extra = dumped - set(oracle)
    if extra:
        print(f"note: {len(extra)} rows-only outputs (no oracle): {sorted(extra)}")
    missing = set(oracle) - dumped
    if missing:
        print(f"WARNING: oracle declared but no engine output: {sorted(missing)}")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql)
            want_cols = sorted(want.columns)
            # The driver's compare goes through an arrow/pandas bridge where
            # HUGEINT (duckdb's sum(BIGINT) result) renders as float → hash
            # mismatch even when values are equal. Flag those types here so
            # the dev loop catches what the driver would fail.
            bad_types = [(c, str(t)) for c, t in zip(want.columns, want.types)
                         if str(t) in ("HUGEINT", "UHUGEINT", "UBIGINT")]
            if bad_types:
                print(f"FAIL {name}: oracle column types unsafe for the "
                      f"driver's arrow bridge (CAST to BIGINT): {bad_types}")
                n_fail += 1
                continue
            want_rows = canon(con.sql(
                f"SELECT {', '.join(want_cols)} FROM want").fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = canon(con.sql(
                f"SELECT {', '.join(got_cols)} FROM got").fetchall())
        except Exception as e:
            print(f"FAIL {name}: engine output unreadable: {str(e)[:200]}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            n_fail += 1
        elif len(got_rows) != len(want_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(want_rows)}")
            n_fail += 1
        elif got_rows != want_rows:
            diff = [i for i, (g, w) in enumerate(zip(got_rows, want_rows)) if g != w]
            print(f"FAIL {name}: {len(diff)} differing rows of {len(got_rows)}; "
                  f"first: got={got_rows[diff[0]]} want={want_rows[diff[0]]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
