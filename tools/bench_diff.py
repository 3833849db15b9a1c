#!/usr/bin/env python3
"""Suspect-aware round-over-round bench differ.

Reads two BENCH_RESULTS.json artifacts (old, new) and prints only the
changes a human should act on, using the canary metadata the r13 sweep
records:

- rows whose new reading carries `"suspect"` or a hot canary window
  (`canary_ratio > 1.3`) are MEASUREMENT rows — listed separately,
  never as regressions (four rounds of judges re-measuring phantom
  rows by hand is the failure mode this file exists to end);
- failures (-1 markers) are listed as breaks/fixes, never as speedups
  or slowdowns;
- everything else diffs on a ratio threshold (default 1.5x either way).

Usage: tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]
                                             [--min-delta 0.5]
`--min-delta` (seconds) floors the ratio rules: a 1.7x swing on a
0.15 s row is scheduler noise, not a regression worth a human.
Exit code 1 if any code-attributable regression is found, else 0.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return (d.get("queries", {}), set(d.get("suspect", [])),
            d.get("canary_ratio", {}), set(d.get("rerun", [])))


def opt(argv, name, default):
    for a in argv:
        if a.startswith(name):
            return float(a.split("=", 1)[1] if "=" in a
                         else argv[argv.index(a) + 1])
    return default


def main(argv):
    args, skip = [], False
    for i, a in enumerate(argv):
        if skip:
            skip = False
        elif a.startswith("--"):
            skip = "=" not in a  # bare --opt consumes the next token
        else:
            args.append(a)
    thr = opt(argv, "--threshold", 1.5)
    min_delta = opt(argv, "--min-delta", 0.5)
    old_q, _, _, _ = load(args[0])
    new_q, new_sus, new_ratio, new_rerun = load(args[1])

    regressions, improvements, measurement = [], [], []
    breaks, fixes = [], []
    for name in sorted(set(old_q) | set(new_q)):
        o, n = old_q.get(name), new_q.get(name)
        if o is None:
            print(f"NEW      {name}: {n:.3f}s"
                  + (" [suspect]" if name in new_sus else ""))
            continue
        if n is None:
            print(f"REMOVED  {name} (was {o:.3f}s)")
            continue
        if o < 0 <= n:
            fixes.append(f"FIXED    {name}: was failed, now {n:.3f}s")
            continue
        if n < 0 <= o:
            breaks.append(f"BROKE    {name}: was {o:.3f}s, now failed")
            continue
        if o < 0 and n < 0:
            continue
        ratio = n / o if o > 0 else float("inf")
        tag = (f"{name}: {o:.3f}s -> {n:.3f}s ({ratio:.2f}x)"
               + (f" canary={new_ratio.get(name):.2f}"
                  if name in new_ratio else "")
               + (" rerun" if name in new_rerun else ""))
        if abs(n - o) < min_delta:
            continue
        if name in new_sus or new_ratio.get(name, 1.0) > 1.3:
            if ratio >= thr or ratio <= 1 / thr:
                measurement.append("MEASURE  " + tag)
        elif ratio >= thr:
            regressions.append("SLOWER   " + tag)
        elif ratio <= 1 / thr:
            improvements.append("FASTER   " + tag)

    for sec, rows in (("code-attributable regressions", regressions),
                      ("breaks", breaks), ("fixes", fixes),
                      ("improvements", improvements),
                      ("measurement-suspect (contended window or >2x "
                       "committed band — re-measure, don't chase)",
                       measurement)):
        if rows:
            print(f"\n== {sec} ==")
            print("\n".join(rows))
    if not any((regressions, breaks, fixes, improvements, measurement)):
        print("no changes past threshold")
    return 1 if regressions or breaks else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
