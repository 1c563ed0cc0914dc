#!/usr/bin/env python3
"""DEV-ONLY local oracle harness (not part of the engine; the engine is pure
Scala/Spark). Replicates the driver's correctness gate: for each query output
parquet written by `graft.Verify`, run the matching oracle SQL from
oracle_sql.json in DuckDB over the same fixture tables and diff.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir> [name1,name2,...]
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


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_types = {c: str(t) for c, t in zip(got_rel.columns,
                                                   got_rel.types)}
            got_rows, got_cols = canon(got_rel.fetchall(), got_rel.columns)
            exp_rel = con.sql(sql)
            exp_types = {c: str(t) for c, t in zip(exp_rel.columns,
                                                   exp_rel.types)}
            exp_rows, exp_cols = canon(exp_rel.fetchall(), exp_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:200]}")
            n_fail += 1
            continue
        # The driver's hash is TYPED: a DuckDB HUGEINT (un-cast SUM over
        # integers) vs Spark BIGINT mismatches even when values agree.
        # Surface dtype drift here so the class of bug dies in dev.
        # Int widths up to 64-bit all canonicalize to int64 driver-side
        # (r6 empirically: INTEGER-vs-BIGINT queries pass the gate), so
        # only flag drift ACROSS classes — int128 (HUGEINT) is its own
        # class, which is exactly the SUM trap.
        WIDTH = {"TINYINT": "i64", "SMALLINT": "i64", "INTEGER": "i64",
                 "BIGINT": "i64", "UTINYINT": "i64", "USMALLINT": "i64",
                 "UINTEGER": "i64"}
        norm = lambda t: WIDTH.get(t, t) if t is not None else None
        type_diff = [(c, got_types.get(c), exp_types.get(c))
                     for c in sorted(set(got_types) | set(exp_types))
                     if norm(got_types.get(c)) != norm(exp_types.get(c))]
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols spark={got_cols} oracle={exp_cols}")
            n_fail += 1
        elif type_diff:
            print(f"FAIL {name}: dtypes {type_diff}")
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
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
