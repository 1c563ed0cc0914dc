#!/usr/bin/env python3
"""DEV-ONLY local oracle harness (not part of the engine; the engine is pure
Scala/Spark). Replicates the driver's correctness gate: for each query output
parquet written by `graft.Verify`, run the matching oracle SQL from
oracle_sql.json in DuckDB over the same fixture tables and diff.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, then rows; normalize values for comparison."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)  # full precision
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            elif isinstance(v, list):
                v = tuple(round(float(x), 9)
                          if isinstance(x, (int, float)) else str(x)
                          for x in v)
            rr.append(v)
        out.append(tuple(rr))
    return sorted(out, key=repr), [cols[i] for i in idx]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_rows, got_cols = canon(got_rel.fetchall(), got_rel.columns)
            exp_rel = con.sql(sql)
            exp_rows, exp_cols = canon(exp_rel.fetchall(), exp_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:200]}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols spark={got_cols} oracle={exp_cols}")
            n_fail += 1
        elif got_rows != exp_rows:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(exp_rows)}")
            diffs = [(a, b) for a, b in zip(got_rows, exp_rows) if a != b]
            for a, b in diffs[:5]:
                print(f"   spark : {a}\n   oracle: {b}")
            if len(got_rows) != len(exp_rows):
                only_g = set(map(repr, got_rows)) - set(map(repr, exp_rows))
                only_e = set(map(repr, exp_rows)) - set(map(repr, got_rows))
                for x in list(only_g)[:3]:
                    print(f"   only-spark : {x}")
                for x in list(only_e)[:3]:
                    print(f"   only-oracle: {x}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got_rows)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
