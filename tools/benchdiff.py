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


def compare(old, new, pct, min_abs=0.15):
    """(all-rows, regressions) over shared queries; a regression is a
    delta beyond pct% AND min_abs seconds (sub-150ms jitter ignored)."""
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    rows, worse = [], []
    for q in shared:
        a, b = oq[q], nq[q]
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
