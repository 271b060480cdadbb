"""LSH pair → cluster resolution (q_dedup_lsh_resolve) on a KNOWN near-dup
layout: verified clusters resolve to min-doc_id representatives; docs with no
verified near-dup never appear in the output."""

import pytest

from neocrawler_spark.operators.dedup import q_dedup_lsh_resolve


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    base = " ".join(f"tok{i}" for i in range(60))
    other = " ".join(f"alt{i}" for i in range(60))
    rows = [
        # cluster A: identical texts → full-signature agreement (clique)
        (1, base), (2, base), (5, base),
        # cluster B: identical texts, disjoint vocabulary from A
        (10, other), (11, other),
        # singleton: unique vocabulary — no candidate pair survives verify
        (20, " ".join(f"solo{i}" for i in range(60))),
    ]
    d = tmp_path_factory.mktemp("docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_known_clusters_resolve(spark, docs_dir):
    out = {r["doc_id"]: (r["cluster_rep"], r["keep"])
           for r in q_dedup_lsh_resolve(spark, docs_dir).collect()}
    assert out == {
        1: (1, True), 2: (1, False), 5: (1, False),
        10: (10, True), 11: (10, False),
    }
