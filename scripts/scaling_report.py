#!/usr/bin/env python
"""Summarize BENCH/scaling_runs.json (r5 evidence format) for the GC/scale
adjudication: per run — wall, urls/s, noise verdict, TRUE task CPU
(Executor CPU Time, level-comparable), summed task run/GC time (NOT
level-comparable: scales with concurrent-task count), actual GC STW pause
wall from the unified GC log, spill, and peak heap.

Usage: python scripts/scaling_report.py [BENCH/scaling_runs.json]
"""
from __future__ import annotations

import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/scaling_runs.json"
    state = json.load(open(path))
    runs = state.get("runs", state)
    attempts = state.get("attempts", {})
    hdr = (f"{'lvl':>4} {'noisy':>6} {'wall_s':>7} {'urls/s':>8} {'steal%':>7} "
           f"{'mp_pre':>6} {'cpu_true':>9} {'cpu_infl':>8} {'task_run':>9} {'gc_sum':>7} "
           f"{'gc_wall':>8} {'pauses':>6} {'spill_MB':>8} {'heap_MB':>8}")
    print(hdr)
    for lvl, rs in sorted(runs.items(), key=lambda kv: int(kv[0])):
        for r in rs:
            ev = r.get("evlog") or {}
            gc = r.get("gclog") or {}
            print(f"{lvl:>4} {str(r.get('noisy')):>6} {r.get('wall_s', -1):>7.0f} "
                  f"{r.get('urls_per_sec', -1):>8.1f} "
                  f"{r.get('steal_pct_run', -1):>7.2f} "
                  f"{(r.get('probe_pre') or {}).get('mp_probe_s', -1):>6.2f} "
                  f"{ev.get('task_cpu_s', -1):>9.0f} "
                  f"{str(r.get('cpu_inflation', '-')):>8} "
                  f"{ev.get('task_run_s', ev.get('task_cpu_s', -1)):>9.0f} "
                  f"{ev.get('gc_s', -1):>7.0f} "
                  f"{gc.get('pause_wall_s', -1):>8.1f} "
                  f"{gc.get('pauses', -1):>6} "
                  f"{ev.get('spill_mb', -1):>8.1f} "
                  f"{gc.get('max_heap_used_mb', -1):>8.0f}")
        if str(lvl) in attempts:
            n = attempts[str(lvl)]
            print(f"  level {lvl}: {len(rs)} results / {n} attempts, "
                  f"{sum(1 for r in rs if not r.get('noisy'))} clean")
    best = {}
    for lvl, rs in runs.items():
        pool = [r for r in rs if not r.get("noisy")] or rs
        if pool:
            best[int(lvl)] = max(pool, key=lambda r: r.get("urls_per_sec", 0))
    if len(best) == 2:
        lo, hi = sorted(best)
        eff = (best[hi]["urls_per_sec"] / best[lo]["urls_per_sec"]) / (hi // lo)
        print(f"\nbest-per-level eff({lo}->{hi}) = {eff:.3f} "
              f"(clean: {not best[lo].get('noisy') and not best[hi].get('noisy')})")


if __name__ == "__main__":
    main()
