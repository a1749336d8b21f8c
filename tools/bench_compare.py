#!/usr/bin/env python3
"""Compare two graft bench JSONs (old new), flagging real regressions.

Usage: python3 tools/bench_compare.py BENCH_old.json BENCH_new.json [ratio]

Host-variance rule of thumb (measured 2026-08-12, BENCH_NOTES.md): identical
code can move ±25% run-to-run on this box, uniformly across queries. Treat a
per-query move as signal only if it exceeds the default 1.5x AND the common-
set total moved much less (i.e. the move is NOT uniform).
"""
import json, re, sys

def load(p):
    with open(p) as f:
        txt = f.read()
    # full bench line (possibly with sbt "[info] " prefixes around it)
    for l in txt.splitlines():
        if '"metric"' in l:
            return json.loads(l[l.index('{'):])
    d = json.loads(txt)
    if "queries" in d:
        return d
    # driver-format file: per-query pairs recoverable from the "tail" string
    pairs = re.findall(r'\\?"([a-z0-9_]+)\\?":([0-9.]+)', d.get("tail", ""))
    return {"queries": {k: float(v) for k, v in pairs
                        if not k.startswith(("metric", "value", "sf"))},
            "failed": []}

def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    ot = sum(oq[k] for k in common)
    nt = sum(nq[k] for k in common)
    drift = nt / ot if ot else 1.0
    print(f"common {len(common)} queries: {ot:.1f}s -> {nt:.1f}s "
          f"(uniform drift x{drift:.2f})")
    print(f"added: {sorted(set(nq)-set(oq))}")
    print(f"removed: {sorted(set(oq)-set(nq))}")
    regs = [(nq[k]/oq[k], oq[k], nq[k], k) for k in common
            if oq[k] > 0.3 and nq[k]/oq[k] > thr * max(1.0, drift)]
    if regs:
        print(f"\nper-query moves > {thr}x beyond the uniform drift:")
        for r, o, n, k in sorted(regs, reverse=True):
            print(f"  {r:.2f}x  {o:.2f}s -> {n:.2f}s  {k}")
    else:
        print(f"\nno per-query regression beyond {thr}x after drift correction")
    failed = new.get("failed")
    if failed and failed != []:
        print(f"\nFAILED queries in new run: {failed}")
        sys.exit(1)

if __name__ == "__main__":
    main()
