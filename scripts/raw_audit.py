#!/usr/bin/env python3
"""RAW-value audit of the scalar fuzz gate: compare every cell of every
q_fuzz_expr_* window between the Spark Verify dump and DuckDB's oracle
evaluation at FULL double precision — no comparator normalization, no
10-significant-digit rounding. Stronger than selfcheck.py's hash gate:
a zero here means the two engines agree BITWISE, so any driver red is
attributable to the driver's environment (its DuckDB version, libm, or
comparator), never to residual local FP drift.

r14 baseline: 24 windows / 788,620 cells / 0 diffs (the pow pin removed
the last two 1-ulp rows the r12 audit carried in b1/e020).

Usage: python3 scripts/raw_audit.py [sfdir] [verify_outdir]
"""
import sys, json, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    names = sorted(n for n in oracle if n.startswith("q_fuzz_expr_"))
    cells = diffs = 0
    for n in names:
        duck = con.execute(oracle[n]).fetchall()
        cols = [d[0] for d in con.description]
        spark = con.execute(
            f"SELECT * FROM read_parquet('{OUT}/{n}/*.parquet')").fetchall()
        scols = [d[0] for d in con.description]
        ki, ski = cols.index("k"), scols.index("k")
        dmap = {r[ki]: r for r in duck}
        smap = {r[ski]: r for r in spark}
        assert set(dmap) == set(smap), f"{n}: key sets differ"
        sidx = {c: i for i, c in enumerate(scols)}
        for k, drow in dmap.items():
            srow = smap[k]
            for i, c in enumerate(cols):
                a, b = drow[i], srow[sidx[c]]
                cells += 1
                same = (a is None and b is None) or a == b or (
                    isinstance(a, float) and isinstance(b, float)
                    and math.isnan(a) and math.isnan(b))
                if not same:
                    diffs += 1
                    if diffs <= 20:
                        print(f"RAW DIFF {n}.{c} k={k}: duck={a!r} spark={b!r}")
    print(f"windows={len(names)} cells={cells} raw_diffs={diffs}")
    return 1 if diffs else 0


if __name__ == "__main__":
    sys.exit(main())
