#!/usr/bin/env python3
"""Round-over-round BENCH_FULL.txt diff with setup/load attribution.

Usage:
    python3 tools/bench_diff.py PREV_BENCH_FULL CUR_BENCH_FULL [--threshold 1.5]
    python3 tools/bench_diff.py <(git show <rev>:BENCH_FULL.txt) BENCH_FULL.txt

Compares the LIKE-FOR-LIKE statistic (min3 — min of the first three
samples; min-of-N with adaptive widening is one-sidedly biased) and
emits a markdown regress/improve table so bench regressions arrive
pre-adjudicated instead of judge-derived (VERDICT r17 item 6). Each
regression row carries the two attribution signals the r15–r17
adjudications kept re-deriving by hand:

  setup  — what fraction of the current entry is Layout-writer setup
           (table-history builds, not the advertised query)
  load   — the max 1-min loadavg observed across the entry's samples in
           BOTH rounds (prev>cur); a regression whose current-round load
           is far above its prior-round load is contention evidence, not
           a plan change

Exit code 0 always: the tool reports, the reader adjudicates.
"""
import re
import sys

LINE = re.compile(
    r"^(?P<name>\S+)\s+pos=(?P<pos>\d+)\s+n=(?P<n>\d+)\s+"
    r"min=(?P<min>-?[\d.]+)\s+min3=(?P<min3>-?[\d.]+)\s+"
    r"setup_sec=(?P<setup>-?[\d.]+)\s+query_sec=(?P<query>-?[\d.]+)\s+"
    r"runs=(?P<runs>\S+)\s+setup=(?P<setups>\S+)\s+at=(?P<at>\S+)\s+"
    r"load=(?P<load>\S+)$")


def parse(path):
    out = {}
    with open(path) as f:
        for line in f:
            m = LINE.match(line.strip())
            if not m:
                continue
            d = m.groupdict()
            loads = [float(x) for pair in d["load"].split(",")
                     for x in pair.split(">") if x not in ("?", "")]
            out[d["name"]] = {
                "pos": int(d["pos"]),
                "min3": float(d["min3"]),
                "min": float(d["min"]),
                "setup": float(d["setup"]),
                "query": float(d["query"]),
                "max_load": max(loads) if loads else float("nan"),
            }
    return out


def fmt_row(name, p, c):
    ratio = c["min3"] / p["min3"] if p["min3"] > 0 else float("inf")
    setup_frac = c["setup"] / c["min3"] if c["min3"] > 0 else 0.0
    attrib = []
    if setup_frac > 0.4:
        attrib.append(f"setup {c['setup']:.1f}s ({setup_frac:.0%})")
    if c["max_load"] > p["max_load"] + 2.0:
        attrib.append(f"load {p['max_load']:.1f}->{c['max_load']:.1f}")
    return (f"| {name} | {p['min3']:.2f} | {c['min3']:.2f} | {ratio:.2f}x "
            f"| {', '.join(attrib) or '-'} |")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1] if "=" in a
                        else sys.argv[sys.argv.index(a) + 1])
    if len(args) < 2:
        sys.exit(__doc__)
    prev, cur = parse(args[0]), parse(args[1])
    common = sorted(set(prev) & set(cur))
    added = sorted(set(cur) - set(prev))
    removed = sorted(set(prev) - set(cur))

    # ignore sub-0.5s entries for ratio classification: JIT/page-cache
    # jitter legitimately doubles tiny numbers (Bench's own widening floor)
    def sig(n):
        return max(prev[n]["min3"], cur[n]["min3"]) > 0.5 and \
            prev[n]["min3"] > 0 and cur[n]["min3"] > 0

    regress = [n for n in common if sig(n)
               and cur[n]["min3"] / prev[n]["min3"] > thr]
    improve = [n for n in common if sig(n)
               and prev[n]["min3"] / cur[n]["min3"] > thr]
    tp = sum(prev[n]["min3"] for n in common)
    tc = sum(cur[n]["min3"] for n in common)
    print(f"## bench diff: {args[0]} -> {args[1]}")
    print(f"common={len(common)} added={len(added)} removed={len(removed)} "
          f"threshold={thr}x (min3, like-for-like)")
    print(f"common-query total: {tp:.1f}s -> {tc:.1f}s "
          f"({(tc - tp) / tp * 100.0:+.1f}%)" if tp > 0 else "")
    for title, names in (("regressions", regress), ("improvements", improve)):
        print(f"\n### {title} ({len(names)})")
        if names:
            print("| query | prev | cur | ratio | attribution |")
            print("|---|---|---|---|---|")
            for n in sorted(names, key=lambda n: -cur[n]["min3"]
                            / prev[n]["min3"]):
                print(fmt_row(n, prev[n], cur[n]))
        else:
            print("(none)")
    if added:
        print(f"\n### added ({len(added)}): "
              + ", ".join(f"{n} {cur[n]['min3']:.2f}s" for n in added))
    if removed:
        print(f"\n### removed ({len(removed)}): " + ", ".join(removed))


if __name__ == "__main__":
    main()
