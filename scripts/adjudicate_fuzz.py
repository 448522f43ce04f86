#!/usr/bin/env python3
"""Interpret a driver CORRECTNESS_r*.json against the r13 fuzz decision
key (COVERAGE.md §2.7): the scalar gate blocks b1/b2/b4 run as five
25-case windows each, and the pattern of red windows names the class of
the divergence.

Usage: python3 scripts/adjudicate_fuzz.py CORRECTNESS_r13.json
"""
import json
import sys

# window -> (constructs of interest, from the per-sub-block census)
NOTES = {
    "q_fuzz_expr_b1b": "contains b1's ONLY get[arr,idx=1] tree (e041)",
    "q_fuzz_expr_b2a": "contains get[arr,idx=1] trees e021+e025",
    "q_fuzz_expr_b2d": "contains get[arr,idx=1] tree e095",
    "q_fuzz_expr_b2e": "contains BOTH pow-fragile columns (e103 int-cliff, "
                       "e117 1-ulp rendering boundary) -> FP/libm class",
}


def main(path):
    d = json.load(open(path))
    fuzz = {k: v for k, v in d.items() if k.startswith("q_fuzz_")}
    red = sorted(k for k, v in fuzz.items()
                 if not (v.get("rows_match") and v.get("schema_match")
                         and v.get("hash_match")) or v.get("err"))
    green = sorted(set(fuzz) - set(red))
    print(f"fuzz rows: {len(fuzz)} total, {len(red)} red")
    if not red:
        print("ALL GREEN - the r12 b1/b2 divergence did not reproduce "
              "(or the r13 GetOp/regexQuote fixes removed it).")
        return 0
    for k in red:
        note = NOTES.get(k, "")
        print(f"  RED {k}  {fuzz[k]}  {note}")
    reds = set(red)
    if reds == {"q_fuzz_expr_b2e"}:
        print("=> FP/libm class: the driver's DuckDB build computes pow "
              "differently; adjudicate e103/e117 cell-by-cell.")
    elif reds == {"q_fuzz_expr_b1b", "q_fuzz_expr_b2a", "q_fuzz_expr_b2d"}:
        print("=> get[arr,idx=1] confirmed: list_extract(arr, 2) vs "
              "try_element_at(arr, 2) diverge on the driver's engine.")
    else:
        print("=> mixed/other: look up each window's construct census in "
              "COVERAGE.md §2.7 and dump its 25 trees with "
              "Test/runMain graft.FuzzDumpMain <seed> all (seeds: b1=1001, "
              "b2=2002, b4=4004; window w slices cases 25*(w-'a')..+25).")
    print(f"(green for reference: {', '.join(g for g in green if 'expr' in g)})")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_r13.json"))
