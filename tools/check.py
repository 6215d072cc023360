#!/usr/bin/env python3
"""Local correctness checker mimicking the driver's DuckDB-oracle
compare: for each query output parquet written by graft.Verify, run the
declared oracle SQL in DuckDB over the same sf tables, sort columns by
name, and compare values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Dev tool only — not part of the Spark library.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


# Exact-at-the-engine types that pandas silently degrades to float64.
# When a compared column is one of these on EITHER side, the pandas
# frames on BOTH sides may be float64 and .equals() passes while the
# driver's dtype/render-strict hash fails (r2 cost_report, r6
# join_size_probe). Canary: refuse to certify such a column at all —
# the fix is always to emit BIGINT/DOUBLE explicitly on both sides.
_INEXACT_IN_PANDAS = ("DECIMAL", "HUGEINT", "UHUGEINT")


def duck_types(con, sql: str) -> dict:
    return {r[0]: r[1] for r in con.sql(f"DESCRIBE {sql}").fetchall()}


def decimal_canary(name: str, spark_types: dict, oracle_types: dict) -> bool:
    """True if any compared column is exact-in-engine but float in
    pandas — a driver hash break that the value compare cannot see."""
    bad = False
    for c in sorted(set(spark_types) | set(oracle_types)):
        st = spark_types.get(c, "?")
        ot = oracle_types.get(c, "?")
        for side, t, other in ((("spark", st, ot)), (("oracle", ot, st))):
            if any(t.upper().startswith(p) for p in _INEXACT_IN_PANDAS):
                print(f"  {name}.{c}: {side} side is {t} (other side {other})"
                      f" — pandas coerces to float64, the driver hash will"
                      f" diverge even if values match; emit BIGINT/DOUBLE")
                bad = True
                break
    return bad


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = canon(con.sql(
            f"SELECT * FROM read_parquet({spark_files!r})").df())
        try:
            want = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if decimal_canary(name,
                duck_types(con, f"SELECT * FROM read_parquet({spark_files!r})"),
                duck_types(con, oracles[name])):
            print(f"FAIL {name}: decimal-dtype canary (see above)")
            n_fail += 1
            continue
        ok_schema = list(got.columns) == list(want.columns)
        ok_rows = len(got) == len(want)
        # Dtype-STRICT: the driver's value-hash is sensitive to dtype
        # (e.g. DuckDB HUGEINT arrives as float64 where Spark writes
        # int64 and the rendered values then hash differently), so a
        # dtype mismatch is a FAIL here even when every value matches.
        ok_vals = ok_schema and ok_rows and got.equals(want)
        if ok_schema and ok_rows and not ok_vals:
            for c in got.columns:
                if got[c].equals(want[c]):
                    continue
                if got[c].dtype != want[c].dtype:
                    print(f"  {name}.{c}: dtype mismatch "
                          f"spark={got[c].dtype} oracle={want[c].dtype} "
                          f"(driver hash WILL differ — cast the oracle)")
                neq = ~(got[c].eq(want[c]) | (got[c].isna() & want[c].isna()))
                if neq.any():
                    i = neq[neq].index[0]
                    print(f"  {name}.{c} differs at row {i}: "
                          f"spark={got[c][i]!r} oracle={want[c][i]!r} "
                          f"(dtype {got[c].dtype} vs {want[c].dtype})")
        if ok_vals:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: schema_ok={ok_schema} rows={len(got)}/{len(want)}")
            if not ok_schema:
                print(f"  spark cols:  {list(got.columns)}")
                print(f"  oracle cols: {list(want.columns)}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
