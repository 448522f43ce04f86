#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale factor, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (row count, sorted-by-name columns, value hash).

Usage: python3 scripts/selfcheck.py [sfdir] [outdir]
"""
import sys, os, json, glob, math, subprocess
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    import hashlib
    return hashlib.sha256("\n".join(lines).encode()).hexdigest(), lines


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        pq = f"{OUT}/{name}"
        files = glob.glob(f"{pq}/*.parquet")
        if not files:
            results[name] = "MISSING spark output"
            continue
        got_rel = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
        got_cols = [d[0] for d in got_rel.description]
        got = got_rel.fetchall()
        try:
            want_rel = con.execute(oracle[name])
            want_cols = [d[0] for d in want_rel.description]
            want = want_rel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        if sorted(got_cols) != sorted(want_cols):
            results[name] = f"SCHEMA MISMATCH spark={sorted(got_cols)} duck={sorted(want_cols)}"
            continue
        if len(got) != len(want):
            results[name] = f"ROWS MISMATCH spark={len(got)} duck={len(want)}"
            continue
        h1, l1 = table_hash(got, got_cols)
        h2, l2 = table_hash(want, want_cols)
        if h1 != h2:
            diff = [(a, b) for a, b in zip(l1, l2) if a != b][:3]
            results[name] = f"HASH MISMATCH e.g. {diff}"
            continue
        # The DRIVER's comparator goes through pandas and is dtype- and
        # sortability-sensitive in ways fetchall() is not: DuckDB HUGEINT
        # (integer sum()) becomes float64 while Spark emits int64, and
        # array cells are unhashable in pandas sort_values. Flag both so
        # a local pass predicts a driver pass.
        got_df = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')").df()
        want_df = con.execute(oracle[name]).df()

        # integer WIDTH differences hash identically in the driver
        # (int32 1 == int64 1); int-vs-float does not (500 != 500.0) —
        # the HUGEINT→float64 sum() trap. Collapse widths, keep kinds.
        def kind(t):
            s = str(t)
            if s.startswith(("int", "uint")):
                return "int"
            if s.startswith("float"):
                return "float"
            return s
        dt1 = sorted((c, kind(t)) for c, t in got_df.dtypes.items())
        dt2 = sorted((c, kind(t)) for c, t in want_df.dtypes.items())
        if dt1 != dt2:
            bad = [(a, b) for a, b in zip(dt1, dt2) if a != b]
            results[name] = f"DTYPE MISMATCH (driver-red) spark-vs-duck {bad}"
            continue
        unsortable = [c for c in got_df.columns
                      if len(got_df) and isinstance(got_df[c].iloc[0], (list, tuple))
                      or len(got_df) and type(got_df[c].iloc[0]).__name__ == "ndarray"]
        if unsortable:
            results[name] = f"UNSORTABLE ARRAY COLS (driver-red): {unsortable}"
            continue
        results[name] = "OK"

    # queries with no oracle: rows-only check
    for d in sorted(glob.glob(f"{OUT}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle or name.startswith("_"):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if files:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            results[name] = f"rows-only: {n} rows"

    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        mark = "✓" if v == "OK" else ("·" if v.startswith("rows-only") else "✗")
        print(f" {mark} {k}: {v}")
    print(f"\n{ok}/{len([v for v in results.values() if not v.startswith('rows-only')])} oracle-checked queries OK")
    if any(v != "OK" and not v.startswith("rows-only") for v in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
