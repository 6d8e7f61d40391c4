#!/usr/bin/env python3
"""Per-query bench comparison: old vs new BENCH json (the driver's
one-line format or a saved local run). Flags regressions beyond a
threshold and lists adds/drops. Usage:
  python3 tools/benchdiff.py BENCH_r02.json /tmp/bench_now.json [--pct 15]
Also importable: load() / compare() back tools/benchgate.py.
"""
import json, re, sys


def load(path):
    with open(path) as f:
        txt = f.read()
    return parse(txt)


def parse(txt):
    # the text may hold SEVERAL JSON lines among log noise (Bench emits a
    # cumulative line after every pass; the last is the final min-over-
    # passes result), possibly behind an sbt "[info] " prefix — keep the
    # LAST parseable queries line
    best = None
    for line in txt.splitlines():
        if '"queries"' in line and "{" in line:
            try:
                best = json.loads(line[line.index("{"):])
            except json.JSONDecodeError:
                pass
    if best is not None:
        return best
    # fallback: the driver wraps (and may truncate) the JSON line inside a
    # "tail" field — scrape whatever (query, seconds) pairs survive
    pairs = re.findall(r'\\?"(q[\w]*)\\?":(-?[0-9.]+)', txt)
    qs = {k: float(v) for k, v in pairs}
    if qs:
        return {"queries": qs}
    return json.loads(txt)


# Frozen host-speed sentinels (round-13 verdict "what's wrong #1"):
# the six TPC-H families, untouched since round 5. The host factor is
# the median new/old ratio over THESE queries only — code that nobody
# edited — so a uniformly hot host still normalizes out, but a genuine
# across-the-board code regression (session config, OpCache, a shared
# helper) now shows up as regressions against a factor the regression
# itself cannot move. The old scheme took the median of the very
# distribution being gated, which would absorb exactly that case.
SENTINELS = ("q1_pricing_summary", "q3_shipping_priority",
             "q5_local_supplier_volume", "q9_product_type_profit",
             "q18_large_volume", "q21_waiting_supplier")


def host_factor(old, new):
    """Median per-query ratio new/old over the frozen SENTINELS — the
    uniform host-speed drift between the two runs (round-7 verdict #3:
    the r7 baseline refresh moved the suite total 75→90 s with ZERO
    plan changes, so absolute per-query gates are noise-bound). Using
    only the frozen sentinel set keeps the factor independent of the
    distribution being gated (round-13 verdict): a single structural
    regression elsewhere cannot shift it, and neither can a global one.
    Falls back to the all-shared-queries median (the pre-r14 behavior)
    when fewer than 4 sentinels are present in both maps — e.g. a
    SPARK_GRAFT_ONLY partial run — and to 1.0 below 5 shared queries."""
    oq, nq = old.get("queries", {}), new.get("queries", {})
    sent = sorted(nq[q] / oq[q] for q in SENTINELS
                  if oq.get(q, 0) > 0 and nq.get(q, 0) > 0)
    if len(sent) >= 4:
        mid = len(sent) // 2
        return sent[mid] if len(sent) % 2 else (sent[mid - 1] + sent[mid]) / 2
    ratios = sorted(nq[q] / oq[q] for q in set(oq) & set(nq)
                    if oq[q] > 0 and nq[q] > 0)
    if len(ratios) < 5:
        return 1.0
    mid = len(ratios) // 2
    return ratios[mid] if len(ratios) % 2 else (ratios[mid - 1] + ratios[mid]) / 2


def compare(old, new, pct, min_abs=0.15, normalize=1.0):
    """(all-rows, regressions) over shared queries; a regression is a
    delta beyond pct% AND min_abs seconds (sub-150ms jitter ignored).
    `normalize` divides every new-run time first (see host_factor), so
    the thresholds gate each query's move RELATIVE to the suite — a
    uniformly hot host shifts nothing, a single structural 1.5× still
    trips. Reported rows carry the normalized new time."""
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    rows, worse = [], []
    for q in shared:
        a, b = oq[q], nq[q] / normalize
        if a <= 0 or b <= 0:
            continue
        d = 100.0 * (b - a) / a
        rows.append((d, q, a, b))
        if d > pct and b - a > min_abs:
            worse.append((d, q, a, b))
    rows.sort(reverse=True)
    return rows, worse


def main():
    args, pct, expect_pct = [], 15.0, False
    for a in sys.argv[1:]:
        if expect_pct:
            pct, expect_pct = float(a), False
        elif a == "--pct":
            expect_pct = True
        elif not a.startswith("--"):
            args.append(a)

    old, new = load(args[0]), load(args[1])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    rows, worse = compare(old, new, pct)

    print(f"shared {len(shared)} queries; old total {sum(oq[q] for q in shared):.1f}s "
          f"→ new total {sum(nq[q] for q in shared):.1f}s")
    print(f"added: {sorted(set(nq) - set(oq))}")
    print(f"dropped: {sorted(set(oq) - set(nq))}")
    print("\nbiggest moves (± %):")
    for d, q, a, b in rows[:8] + [r for r in rows[-4:] if r not in rows[:8]]:
        print(f"  {d:+7.1f}%  {q:32s} {a:6.2f}s → {b:6.2f}s")
    if worse:
        print(f"\nREGRESSIONS over {pct:.0f}% (and >0.15s):")
        for d, q, a, b in worse:
            print(f"  {d:+7.1f}%  {q:32s} {a:6.2f}s → {b:6.2f}s")
        sys.exit(1)
    print("\nno regressions beyond threshold")


if __name__ == "__main__":
    main()
