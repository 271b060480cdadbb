#!/usr/bin/env python
"""Extra benchmarks for the optimization round (guide §1.4): noop-sink
isolation per declared query, plus a phase decomposition of the LSH family
(the two dominant walls in BENCH_r05). bench.py itself is FROZEN — this file
is where the round's before/after numbers come from.

Usage:
  python bench_extra.py queries [name ...]   # noop-timed declared queries
  python bench_extra.py lsh                  # LSH phase decomposition
  python bench_extra.py explain [dir]        # dump .explain("formatted") per query
  python bench_extra.py crawl [evlog-dir]    # headline-config crawl (+ event log)
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# queries() functions that materialize eagerly inside the call (pins / loops):
# for these the call itself is the computation and noop adds nothing.
EAGER = {"dedup_lsh_resolve", "crawl_round_smoke"}


def _spark():
    from neocrawler_spark.session import get_spark

    return get_spark("bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def cmd_queries(names: list[str]):
    import __spark_entry__ as entry

    spark = _spark()
    qs = entry.queries()
    names = names or [n for n in qs if n != "crawl_round_smoke"]
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        build_s = time.time() - t0
        t0 = time.time()
        _noop(df)
        noop_s = time.time() - t0
        out[name] = {"build_s": round(build_s, 3), "noop_s": round(noop_s, 3),
                     "total_s": round(build_s + noop_s, 3)}
        print(json.dumps({name: out[name]}), flush=True)
    print("SUMMARY " + json.dumps(out))


def cmd_lsh():
    """Decompose the minhash→bands→pairs→verify→CC pipeline phase by phase."""
    from neocrawler_spark.operators import dedup

    spark = _spark()
    walls = {}

    def timed(tag, fn):
        spark.sparkContext.setJobDescription(f"lsh: {tag}")
        t0 = time.time()
        r = fn()
        walls[tag] = round(time.time() - t0, 3)
        print(json.dumps({tag: walls[tag]}), flush=True)
        return r

    from pyspark.sql import functions as F

    sig = dedup.q_dedup_minhash(spark, SF_DIR)
    timed("minhash_noop", lambda: _noop(sig))
    bands = dedup._bands_local(dedup._doc_sig_frame(spark, SF_DIR))
    timed("bands_noop", lambda: _noop(bands))
    pinned = timed("bands_pin", lambda: dedup._pin(spark, bands, "bands")[0])
    spread = dedup._spread_join_side(spark, pinned)
    pairs = (
        dedup._band_pairs(spread, spread)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    timed("pairs_join_noop", lambda: _noop(pairs))
    timed("pairs_distinct_noop", lambda: _noop(pairs.distinct()))
    timed("lsh_full", lambda: dedup.q_dedup_minhash_lsh(spark, SF_DIR).count())
    timed("resolve_full", lambda: dedup.q_dedup_lsh_resolve(spark, SF_DIR).count())
    print("SUMMARY " + json.dumps(walls))


def cmd_explain(outdir: str, suffix: str = "", names: list[str] | None = None):
    import __spark_entry__ as entry

    spark = _spark()
    qs = entry.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in (names or [n for n in qs if n not in EAGER]):
        try:
            plan = qs[name](spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        except Exception as e:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {e}"
        tag = f"_{suffix}" if suffix else ""
        with open(os.path.join(outdir, f"{name}{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}")


def cmd_crawl(evdir: str | None):
    """The headline bench crawl (same params/settings as bench.py's default
    mode), optionally with an event log for per-job gap analysis."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import BENCH_PARAMS, BENCH_ROUNDS, BENCH_SETTINGS, run_crawl
    from neocrawler_spark.session import get_spark

    extra = {}
    if evdir:
        os.makedirs(evdir, exist_ok=True)
        extra = {"spark.eventLog.enabled": "true", "spark.eventLog.dir": evdir}
    spark = get_spark("bench_extra_crawl", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS, extra_conf=extra)
    c = run_crawl(spark, rounds=BENCH_ROUNDS, site_params=BENCH_PARAMS,
                  settings=dict(BENCH_SETTINGS), bucketed_corpus=True)
    for r in c["per_round"]:
        print("ROUND " + json.dumps(r), flush=True)
    print("CRAWL " + json.dumps({k: c[k] for k in
                                 ("urls_processed", "wall_s", "urls_per_sec")}))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "queries":
        cmd_queries(sys.argv[2:])
    elif cmd == "crawl":
        cmd_crawl(sys.argv[2] if len(sys.argv) > 2 else None)
    elif cmd == "lsh":
        cmd_lsh()
    elif cmd == "explain":
        cmd_explain(sys.argv[2] if len(sys.argv) > 2 else "plans/r06",
                    sys.argv[3] if len(sys.argv) > 3 else "",
                    sys.argv[4:] or None)
    else:
        raise SystemExit(f"unknown command {cmd}")
