#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not shipped).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Runs each oracle_sql.json entry in DuckDB against the parquet tables in
sfDir, loads the Spark result parquet from verifyOutDir/<name>, sorts
columns by name (the driver does the same before hashing), and compares
shape + values cell-by-cell. Queries without oracle SQL get a rows>0 smoke
check.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(norm(x) for x in v.tolist())
        if isinstance(v, np.floating):
            return round(float(v), 9)
        if isinstance(v, np.integer):
            return int(v)
    except ImportError:
        pass
    return v


def cmp_cell(a, b):
    a, b = norm(a), norm(b)
    if a is None and b is None:
        return True
    # pd.NaT (null timestamp) compares False to itself, like NaN — but
    # ONLY same-kind na values are equal: None-vs-NaN stays a mismatch
    # (a null-propagation regression must not pass the local gate)
    if type(a).__name__ == "NaTType" and type(b).__name__ == "NaTType":
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # Bit-level parity like the driver's hash: 0.0 != -0.0
        # (Python == treats them equal; the driver hashes raw bits).
        if a == 0.0 and b == 0.0:
            return math.copysign(1.0, a) == math.copysign(1.0, b)
        return a == b
    return a == b


def neg_zero_cell(vals):
    """First (row, col) holding IEEE -0.0, else None (arrays included)."""
    def is_neg0(v):
        if isinstance(v, float):
            return v == 0.0 and math.copysign(1.0, v) < 0
        if isinstance(v, (list, tuple)):
            return any(is_neg0(x) for x in v)
        try:
            import numpy as np
            if isinstance(v, np.ndarray):
                return any(is_neg0(float(x)) for x in v.ravel().tolist())
            if isinstance(v, np.floating):
                return is_neg0(float(v))
        except ImportError:
            pass
        return False
    for i in range(vals.shape[0]):
        for j in range(vals.shape[1]):
            if is_neg0(vals[i][j]):
                return (i, j)
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    import glob
    produced = {p.rstrip("/").split("/")[-1]
                for p in glob.glob(f"{out_dir}/*/")}
    names = sorted(produced | set(oracle)) if not only else sorted(only)

    n_pass = n_fail = 0
    for name in names:
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            ok = len(spark_df) > 0
            print(f"{'ok  ' if ok else 'FAIL'} {name}: Q-tier, "
                  f"{len(spark_df)} rows")
            n_pass += ok
            n_fail += not ok
            continue
        try:
            ora_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s = spark_df[sorted(spark_df.columns)]
        o = ora_df[sorted(ora_df.columns)]
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} "
                  f"oracle={list(o.columns)}")
            n_fail += 1
            continue
        if s.shape != o.shape:
            print(f"FAIL {name}: shape spark={s.shape} oracle={o.shape}")
            n_fail += 1
            continue
        bad = None
        sv, ov = s.values, o.values
        for i in range(s.shape[0]):
            for j in range(s.shape[1]):
                if not cmp_cell(sv[i][j], ov[i][j]):
                    bad = (i, s.columns[j], sv[i][j], ov[i][j])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
            continue
        # -0.0 lint (VERDICT r15): DuckDB round() preserves the sign of
        # zero while Spark's BigDecimal round does not, and the driver
        # hashes raw bits — q_agg_fdr_bh reddened round 15 on ONE -0.0
        # cell. ANY signed-zero cell (either side) means the query is
        # one fixture refresh away from joining that class: fail it
        # here so the fix lands before the driver sees it. Normalize
        # with `x + 0.0` in the oracle / `when(x === 0, 0.0)` in Spark.
        neg0 = neg_zero_cell(sv) or neg_zero_cell(ov)
        if neg0:
            print(f"FAIL {name}: -0.0 cell at row {neg0[0]} col "
                  f"{s.columns[neg0[1]]} (signed-zero lint: normalize "
                  f"the zero on both engines)")
            n_fail += 1
        else:
            print(f"ok   {name}: {s.shape[0]} rows x {s.shape[1]} cols")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
