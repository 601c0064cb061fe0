"""Diff two full-registry timing sweeps (bench.py SPARK_GRAFT_BENCH_ALL
JSON lines, as committed under sweeps/) and flag movers.

Mechanizes the SCALE.md §7 per-round sweep diff: instead of comparing
head-of-registry prose highlights, point this at last round's committed
sweep and this round's and read the flag list. Boot-class context is
printed first (floors + anchors when present) because on this VM a
±30-35% swing on unchanged code is the documented boot lottery —
a mover is only a finding if it exceeds the flag ratio AFTER the
anchors say the boots are comparable (SCALE.md §7/§8 reading rules).

Usage:
    python scripts/sweep_diff.py OLD.json NEW.json [--flag 1.5] [--min-sec 1.0]

Flags queries whose NEW/OLD ratio exceeds --flag (default 1.5) in
either direction (slowdowns AND speedups beyond 1/flag are listed —
an unexplained speedup can be a vacuity bug, the q_grid_join lesson)
with NEW or OLD time above --min-sec (default 1.0 s; sub-second
readings are floor-dominated on this box and carry no signal).
Exit code 0 always: the adjudication is human (boot class first).
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--flag", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=1.0)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    for label, d in (("old", old), ("new", new)):
        anchors = d.get(
            "anchors",
            {
                "job_floor_sec": d.get("job_floor_sec"),
                "shuffle_floor_sec": d.get("shuffle_floor_sec"),
            },
        )
        print(
            f"{label}: sf={d.get('sf')} total={d['value']} "
            f"n={len(d['queries'])} anchors={anchors}"
        )
    if old.get("sf") != new.get("sf"):
        print(
            f"WARNING: comparing different scales (sf {old.get('sf')} vs "
            f"{new.get('sf')}) — ratios include the data-size ratio, not "
            f"just code/boot drift"
        )

    oq, nq = old["queries"], new["queries"]
    both = sorted(set(oq) & set(nq))
    only_old, only_new = sorted(set(oq) - set(nq)), sorted(set(nq) - set(oq))
    if only_old:
        print(f"only in old ({len(only_old)}): {only_old}")
    if only_new:
        print(f"only in new ({len(only_new)}): {only_new}")

    flagged = []
    for name in both:
        o, n = oq[name], nq[name]
        if max(o, n) < args.min_sec:
            continue
        # a 0.000 old reading with a real new one is an infinite-ratio
        # mover, not a skip (the docstring's flag contract)
        r = n / o if o else float("inf")
        if r > args.flag or r < 1 / args.flag:
            flagged.append((r, name, o, n))
    flagged.sort(reverse=True)
    if not flagged:
        print(f"no movers beyond {args.flag}x (min {args.min_sec}s)")
    else:
        print(f"{len(flagged)} mover(s) beyond {args.flag}x (min {args.min_sec}s):")
        for r, name, o, n in flagged:
            print(f"  {name}: {o:.2f} -> {n:.2f}  ({r:.2f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
