#!/usr/bin/env python3
"""Compare bench attempts against a reference record (default: the
committed canonical BENCH_QUERIES.json).

Usage: bench_compare.py ATTEMPT.json [ATTEMPT2.json ...] [REFERENCE.json]

With ONE attempt: prints the common-query-set totals, the canary
verdict, the flagged window count, and the biggest per-query
regressions — the facts needed to decide whether an attempt may become
the committed canonical.

With SEVERAL attempts (the round-17 extension): the LAST argument is
the reference and every earlier one is an attempt; per-query MEDIANS
across the attempts are compared instead of a single slot's numbers,
so common-set judgments stop hinging on whichever co-tenant burst hit
one run. Flagged-window counts are reported per attempt.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read())


def flagged_of(attempt):
    raw = attempt.get("canary_flagged", [])
    return json.loads(raw) if isinstance(raw, str) else raw


def single(attempt, ref):
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
    print(f"canary-flagged windows: {len(flagged_of(attempt))} / {len(aq)}")
    iso = attempt.get("isolated", {})
    print(f"isolated anchors: {len(iso)}")
    regs = sorted(((aq[q] - rq[q], q) for q in common), reverse=True)[:10]
    print("top regressions vs reference (in-suite):")
    for d, q in regs:
        iso_s = f"  iso={iso[q]:.2f}" if q in iso else ""
        print(f"  {q:<28} {rq[q]:7.2f} -> {aq[q]:7.2f}  ({d:+.2f}){iso_s}")


def medians(attempts, ref):
    rq = ref["queries"]
    qsets = [set(a["queries"]) for a in attempts]
    present = set.union(*qsets)
    med = {q: statistics.median(
        [a["queries"][q] for a in attempts if q in a["queries"]])
        for q in present}
    common = sorted(present & set(rq))
    m_common = sum(med[q] for q in common)
    r_common = sum(rq[q] for q in common)
    print(f"attempts: {len(attempts)}  queries (union): {len(present)}  "
          f"reference: {len(rq)}  common: {len(common)}")
    for i, a in enumerate(attempts, 1):
        c = a.get("canary", {})
        tot = sum(a["queries"][q] for q in common if q in a["queries"])
        print(f"  attempt {i}: common-set {tot:.1f} s  "
              f"contended={c.get('contended')}  "
              f"flagged={len(flagged_of(a))}/{len(a['queries'])}")
    print(f"common-set MEDIAN total: {m_common:.1f} s vs reference "
          f"{r_common:.1f} s ({(m_common / r_common - 1) * 100:+.1f}%)")
    new = sorted(present - set(rq))
    if new:
        print(f"new queries ({len(new)}): "
              f"{sum(med[q] for q in new):.1f} s median total")
    regs = sorted(((med[q] - rq[q], q) for q in common), reverse=True)[:10]
    print("top median regressions vs reference:")
    for d, q in regs:
        spread = [a["queries"][q] for a in attempts if q in a["queries"]]
        print(f"  {q:<28} {rq[q]:7.2f} -> {med[q]:7.2f}  ({d:+.2f})  "
              f"spread=[{min(spread):.2f}..{max(spread):.2f}]")


def main():
    args = sys.argv[1:]
    if not args:
        sys.exit(__doc__)
    if len(args) == 1:
        single(load(args[0]), load("BENCH_QUERIES.json"))
    elif len(args) == 2:
        single(load(args[0]), load(args[1]))
    else:
        *attempt_paths, ref_path = args
        medians([load(p) for p in attempt_paths], load(ref_path))


if __name__ == "__main__":
    main()
