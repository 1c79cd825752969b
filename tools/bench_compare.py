#!/usr/bin/env python3
"""Compare a bench attempt against a reference record (default: the
committed canonical BENCH_QUERIES.json).

Usage: bench_compare.py ATTEMPT.json [REFERENCE.json]

Prints the common-query-set totals, the canary verdict, the flagged
window count, and the biggest per-query regressions — the facts needed
to decide whether an attempt may become the committed canonical.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read())


def main():
    attempt = load(sys.argv[1])
    ref = load(sys.argv[2] if len(sys.argv) > 2 else "BENCH_QUERIES.json")
    aq, rq = attempt["queries"], ref["queries"]
    common = sorted(set(aq) & set(rq))
    a_common = sum(aq[q] for q in common)
    r_common = sum(rq[q] for q in common)
    print(f"attempt queries: {len(aq)}  reference queries: {len(rq)}  "
          f"common: {len(common)}")
    print(f"common-set total: attempt {a_common:.1f} s vs reference "
          f"{r_common:.1f} s ({(a_common / r_common - 1) * 100:+.1f}%)")
    new = sorted(set(aq) - set(rq))
    if new:
        print(f"new queries ({len(new)}): "
              f"{sum(aq[q] for q in new):.1f} s total")
        for q in new:
            print(f"  {q:<28} {aq[q]:8.2f} s")
    canary = attempt.get("canary", {})
    print(f"canary: contended={canary.get('contended')} "
          f"probes={['%.2f' % p for p in canary.get('samples', [])]} "
          f"ref={canary.get('ref_sec')}")
    flagged = json.loads(attempt.get("canary_flagged", "[]")) \
        if isinstance(attempt.get("canary_flagged"), str) \
        else attempt.get("canary_flagged", [])
    print(f"canary-flagged windows: {len(flagged)} / {len(aq)}")
    iso = attempt.get("isolated", {})
    print(f"isolated anchors: {len(iso)}")
    regs = sorted(((aq[q] - rq[q], q) for q in common), reverse=True)[:10]
    print("top regressions vs reference (in-suite):")
    for d, q in regs:
        iso_s = f"  iso={iso[q]:.2f}" if q in iso else ""
        print(f"  {q:<28} {rq[q]:7.2f} -> {aq[q]:7.2f}  ({d:+.2f}){iso_s}")


if __name__ == "__main__":
    main()
