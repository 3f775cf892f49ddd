#!/usr/bin/env python3
"""Floor-aware bench diff: report real movers, suppress contention phantoms.

Driver re-runs keep flagging sub-second queries as ">2x movers" when the
prior reading was an isolated-floor-grade observation and the new one
absorbed sandbox contention (r16: seven such phantoms, all 0.1-0.5 s).
The committed per-query floors (one-time isolated passes) give the diff an
absolute reference: a query is a MOVER only when

    new > max(2 * prior, 1.3 * floor)

i.e. it both doubled against the prior window AND sits meaningfully above
the best the machine has ever done on that query. A query without a floor
entry falls back to the plain 2x-of-prior rule.

Usage:
  bench_diff.py <prior_bench.json> <new_bench.json> <floors.json> [more_floors.json ...]

Bench files are BENCH_FULL-shaped ({"queries": {name: sec}}); floors files
accept either {"queries": {...}} (BENCH_GRAPH_FLOORS/BENCH_FLOORS_SUBSEC
shape) or {"floors": {...}}, and later files override earlier ones on key
collisions. Exit 0 iff no movers.
"""
import json
import sys


def load_queries(path):
    d = json.load(open(path))
    q = d.get("queries") or d.get("floors") or {}
    return {k: v for k, v in q.items() if isinstance(v, (int, float))}


def main(prior_path, new_path, floor_paths):
    prior = load_queries(prior_path)
    new = load_queries(new_path)
    floors = {}
    for p in floor_paths:
        floors.update(load_queries(p))
    movers, suppressed = [], []
    for name, nv in sorted(new.items()):
        pv = prior.get(name)
        if pv is None or pv <= 0 or nv <= 0:
            continue  # new query, or a -1 failure sentinel (reported by bench)
        if nv <= 2 * pv:
            continue
        fl = floors.get(name)
        if fl is not None and nv <= 1.3 * fl:
            suppressed.append((name, pv, nv, fl))
        else:
            movers.append((name, pv, nv, fl))
    for name, pv, nv, fl in suppressed:
        print(f"ok    {name}: {pv:.3f} -> {nv:.3f} (> 2x prior but within "
              f"1.3x floor {fl:.3f} — contention, not a regression)")
    for name, pv, nv, fl in movers:
        floor_s = f"floor {fl:.3f}" if fl is not None else "no floor on record"
        print(f"MOVER {name}: {pv:.3f} -> {nv:.3f} ({nv/pv:.1f}x prior; {floor_s})")
    print(f"== {len(movers)} movers, {len(suppressed)} contention phantoms "
          f"suppressed, {len(new)} queries compared ==")
    return 1 if movers else 0


if __name__ == "__main__":
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
