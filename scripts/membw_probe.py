"""Host scaling probe for the BENCH/BASELINE.md core-pair choice.

Runs the extraction kernel (render + process_document, no Spark) under raw
multiprocessing at two worker counts and prints the speedup. The kernel's
bandwidth density sets where this box's memory bandwidth saturates, so the
ladder must be RE-MEASURED whenever the extraction path changes. Measured
ladders (calm windows):
  pre-tokenizer (html.parser engine):  4->16 3.41x (0.85), 8->32 2.73x
  post-tokenizer (regex engine, r5):   1->4 4.07x (1.02), 2->8 3.64x
                                       (0.91), 4->16 2.23x (0.56)
A pure-register loop scales ~4x at 32 workers, so the ceiling is bandwidth,
not CPU. A real 4N-executor cluster adds memory channels with nodes, so the
sandbox stand-in uses the largest 4x step the hardware can express — 2 vs 8
for the current engine (bench.py SCALING_CORES).

Usage: python scripts/membw_probe.py [lo hi]   (default 4 16; try 2 8)
"""

import sys
import time
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from neocrawler_spark import synth
from neocrawler_spark.functions.extract import process_document
from neocrawler_spark.rules import load_rules

P = synth.site_params(n_domains=1, cats=1, lists_per_cat=1,
                      details_per_list=4, hot_details_per_list=4)
RULE = next(r for r in load_rules(synth.gen_rules(P)) if r["type"] == "node")
N = 200_000


def work(args):
    lo, hi = args
    t0 = time.time()
    for i in range(lo, hi):
        html, _ = synth.render_detail(0, i)
        url = f"http://www1.site0.test/weixin_{i}.html?id={i}"
        process_document(url, html, RULE, None, True)
    return time.time() - t0


def run(workers: int) -> float:
    chunks = [(i * N // workers, (i + 1) * N // workers) for i in range(workers)]
    t0 = time.time()
    with ProcessPoolExecutor(workers) as ex:
        list(ex.map(work, chunks))
    return time.time() - t0


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    t_hi, t_lo = run(hi), run(lo)
    speed = t_lo / t_hi
    print(f"{lo} workers: {t_lo:.1f}s   {hi} workers: {t_hi:.1f}s   "
          f"speedup {speed:.2f}x   efficiency {speed / (hi / lo):.2f}")


if __name__ == "__main__":
    main()
