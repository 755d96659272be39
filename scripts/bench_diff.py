#!/usr/bin/env python3
"""Cross-round per-query bench regression diff (r7, the r6 verdict's #5).

r8: SIGPIPE restored to default so `| head` truncates cleanly instead of
dumping a BrokenPipeError traceback.

Usage: python3 scripts/bench_diff.py <old_bench.json> <new_bench.json> [band]

Compares the per-query min-of-N times of two Bench JSON files (the bare
`bench_full.json`/`bench_out.json` artifacts) and prints a markdown table
of every query whose time moved more than `band` (default 0.15 = ±15%,
the measured min-of-3 noise floor), plus added/removed queries and the
totals. Exit code 0 always — the diff is telemetry, not a gate; the
human (or the round log) decides what a mover means. Driver-side tooling
only — the engine never depends on this.
"""
import json
import signal
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)


def load(p):
    with open(p) as f:
        d = json.load(f)
    if d.get("timing", "single-shot") == "single-shot":
        print(f"note: {p} is single-shot; deltas vs min-of-N are "
              "protocol-confounded", file=sys.stderr)
    return d


def main(old_path, new_path, band=0.15):
    old, new = load(old_path), load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    movers, added, removed = [], sorted(set(nq) - set(oq)), sorted(set(oq) - set(nq))
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a <= 0:
            continue
        rel = (b - a) / a
        if abs(rel) > band:
            movers.append((rel, name, a, b))
    movers.sort(key=lambda m: -abs(m[0]))
    print(f"### bench diff: {old_path} → {new_path} (±{band:.0%} band)\n")
    print(f"| total | {old.get('value', 0):.2f} s → {new.get('value', 0):.2f} s | "
          f"{len(oq)} → {len(nq)} queries |")
    print("|---|---|---|")
    if not movers:
        print("| movers | none beyond the band | |")
    for rel, name, a, b in movers:
        print(f"| `{name}` | {a:.2f} s → {b:.2f} s | {rel:+.0%} |")
    for name in added:
        print(f"| `{name}` | (new) → {nq[name]:.2f} s | added |")
    for name in removed:
        print(f"| `{name}` | {oq[name]:.2f} s → (gone) | removed |")
    return 0


if __name__ == "__main__":
    band = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    sys.exit(main(sys.argv[1], sys.argv[2], band))
