"""Driver contract for the spark-graft builder (PySpark target).

queries() = every SURVEY.md §2 operator re-expressed over the driver's
testdata tables + the training-data ops (dedup/similarity/text), each paired
with a DuckDB oracle in oracle_sql(). The crawl engine itself (frontier,
bloom seen-set, quota scheduler, politeness, extraction) runs over its own
catalog — covered by `crawl_round_smoke` (rows-only; non-SQL-expressible)
and exhaustively by tests/test_e2e_crawl.py.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from neocrawler_spark.functions import text as text_ops
from neocrawler_spark.operators import analytics, crawl_gate, dedup, similarity

_ALL = {
    **analytics.QUERIES,
    **crawl_gate.QUERIES,
    **dedup.QUERIES,
    **similarity.QUERIES,
    **text_ops.QUERIES,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the weighted-fair quota scheduler (the reference's core
    scheduling operator, scheduler/index.js:210/250-254, as a distributed
    window — SURVEY.md §2.4) on sf0.001."""
    return analytics.q_weighted_fair_quota(spark, "/root/testdata/sf0.001")


def _crawl_round_smoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full crawl round (seed → politeness → fetch-join → validate →
    extract pUDF → discovery) on the deterministic synthetic site graph;
    returns the fetch_log. Non-SQL-expressible (stateful multi-table round) —
    rows-only check; full assertions live in tests/test_e2e_crawl.py."""
    from neocrawler_spark import synth
    from neocrawler_spark.plans.round import CrawlContext
    from neocrawler_spark.rules import load_rules
    from neocrawler_spark.sources.tables import Catalog
    from neocrawler_spark.streaming.driver import run_rounds
    from neocrawler_spark import schema

    params = synth.site_params(n_domains=1, cats=1, lists_per_cat=1, details_per_list=2,
                               hot_details_per_list=2)
    cat = Catalog(tempfile.mkdtemp(prefix="ncs_smoke_"))
    ctx = CrawlContext(
        spark, cat, load_rules(synth.gen_rules(params)),
        synth.gen_pages_df(spark, params), synth.gen_robots_df(spark, params),
        settings={"buckets": 4, "bloom_keys_per_bucket": 100},
    )
    run_rounds(ctx, 2)
    return cat.read(spark, "fetch_log", schema.FETCH_LOG)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {name: fn for name, (fn, _sql) in _ALL.items()}
    out["crawl_round_smoke"] = _crawl_round_smoke
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _ALL.items() if sql}
