#!/usr/bin/env python3
"""Interpret a driver CORRECTNESS_r*.json against the r14 fuzz decision
key (COVERAGE.md §2.7).

Gate layout since r14: scalar blocks b1/b2/b4 run as windows — b1b..e,
b2a, b2c..e, b4a..e are 25-case windows; the two r13 driver-red windows
run as five 5-case sub-sub-windows each (q_fuzz_expr_b1a1..a5 over seed
1001 cases 0-24, q_fuzz_expr_b2b1..b2b5 over seed 2002 cases 25-49).

r14 standing evidence (all gathered at sf0.01, the driver's gate SF):
 - Every construct/value hypothesis for the r13 b1a/b2b reds was REFUTED
   locally: construct census (no red-only op), value-class census (b1a
   has ZERO dangerous cells; b2b only empty strings, which green windows
   share), pow ±1-ulp drift in BOTH modes under the Python-faithful
   comparator (FuzzUlpMain: zero flips in b1a/b2b; the only pow-sensitive
   columns are in driver-GREEN windows b2e/b3/b4e), and the empty-split
   boundary (['']/[] — flips land only in green windows).
 - The one op with ANY cross-engine value license — pow — is rendered
   libm-free since r14 (JxSql.Dialect.pow: literal exponents 2/3 become
   repeated multiplication on BOTH sides; value-preserving vs DuckDB
   1.0.0 on every cell of all 500 trees). If the divergence was pow in
   any form (driver libm, platform Math.pow intrinsic, a comparator
   stricter than %.10g), it cannot recur.
 - The multi-version DuckDB axis is CLOSED in this sandbox (zero egress;
   only 1.0.0 available) — version hypotheses can only be killed by the
   driver artifact itself.

Usage: python3 scripts/adjudicate_fuzz.py CORRECTNESS_r14.json
"""
import json
import sys

# sub-window -> pow trees it contains + the discrete ops they feed
# (from the b1/b2 dumps; pow-bearing columns per FuzzPowMain)
NOTES = {
    "q_fuzz_expr_b1a1": "pow: e002 pow(num1,2) integral base, value output",
    "q_fuzz_expr_b1a2": "pow: e007 pow(count,2) integral; e009 TWO pows "
                        "feeding an lte comparison (discrete flip risk)",
    "q_fuzz_expr_b1a3": "pow: e014 pow(num1,2) integral, greatest/div chain",
    "q_fuzz_expr_b1a4": "pow: e016 pow(NON-INTEGRAL ratio, 3) — the only "
                        "non-integral-base pow in b1a (libm territory)",
    "q_fuzz_expr_b1a5": "pow: e023 pow(num1,3) in a floor() divisor "
                        "(discrete flip risk)",
    "q_fuzz_expr_b2b1": "NO pow tree (e025-e029); if red alone, the "
                        "divergence is not pow at all",
    "q_fuzz_expr_b2b2": "pow: e030 integral; e034 pow(fmod,2) feeding an "
                        "EQUALITY (discrete flip risk)",
    "q_fuzz_expr_b2b3": "pow: e036 pow(-2,3) literal in an equality; "
                        "e038 pow(int1,3) integral",
    "q_fuzz_expr_b2b4": "pow: e043 pow(integral add, 3)",
    "q_fuzz_expr_b2b5": "pow: e046 pow(num1-int2, 3) integral",
    "q_fuzz_expr_b2e": "pow-sensitive columns e117/e118 (the ONLY "
                       "columns a ±1-ulp libm drift can flip, per "
                       "FuzzUlpMain) — was driver-GREEN in r13",
}


def main(path):
    d = json.load(open(path))
    fuzz = {k: v for k, v in d.items() if k.startswith("q_fuzz_")}
    red = sorted(k for k, v in fuzz.items()
                 if not (v.get("rows_match") and v.get("schema_match")
                         and v.get("hash_match")) or v.get("err"))
    print(f"fuzz rows: {len(fuzz)} total, {len(red)} red")
    if not red:
        print("ALL GREEN. The r12/r13 b1/b2 divergence is gone. Given the "
              "refutation of every non-pow hypothesis and that r14's only "
              "semantic change to these trees is the libm-free pow pin, "
              "record the class as pow-under-driver-environment "
              "(libm/intrinsic/comparator-precision) in COVERAGE.md and "
              "keep the pin. Catalog freeze can resume.")
        return 0
    for k in red:
        print(f"  RED {k}  {fuzz[k]}  {NOTES.get(k, '')}")
    reds = set(red)
    sub = {k for k in reds if any(k.startswith(p) for p in
                                  ("q_fuzz_expr_b1a", "q_fuzz_expr_b2b"))}
    if reds == sub:
        print("=> The r13 divergence persists AND the pow pin did not fix "
              "it — pow is now exonerated too (both sides multiply). Each "
              "red row above names <=5 trees: dump them with "
              "Test/runMain graft.FuzzDumpMain <seed> all (b1=1001, "
              "b2=2002; b1aN = cases 5*(N-1)..5*N-1, b2bN = 25+5*(N-1)..) "
              "and adjudicate per tree: exclude the named tree from the "
              "gate by generation discipline with a COVERAGE.md note, or "
              "pin its seam the way div/mod/split were pinned.")
    elif sub:
        print("=> Mixed pattern: the persisting b1a/b2b residue plus NEW "
              "windows — a redraw-independent environment boundary that "
              "MOVED. Treat the new windows with the construct census "
              "first (COVERAGE.md §2.7 lookup table).")
    else:
        print("=> The r13 windows went green (pow pin vindicated) but NEW "
              "windows reddened. If b2e is among them: that is the "
              "pow-sensitive window — but pow is now rendered as "
              "multiplication, so suspect the comparator's float "
              "normalization instead. Otherwise: construct census lookup "
              "(COVERAGE.md §2.7) and 5-case-split the new window next "
              "round (FuzzCatalog.redWindows is the one-line lever).")
    green = sorted(set(fuzz) - reds)
    print(f"(green for reference: {', '.join(g for g in green if 'expr' in g)})")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_r14.json"))
