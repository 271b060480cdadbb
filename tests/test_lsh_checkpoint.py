"""dedup_minhash_lsh materialization paths: the default localCheckpoint and
the executor-loss-safe table-write path (NCS_LSH_CHECKPOINT_DIR) must yield
identical candidate pairs (r2 VERDICT #7)."""

import os

from neocrawler_spark.operators.dedup import q_dedup_minhash_lsh

SF = "/root/testdata/sf0.001"


def test_table_write_path_matches_local_checkpoint(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("NCS_LSH_CHECKPOINT_DIR", raising=False)
    base = sorted(map(tuple, q_dedup_minhash_lsh(spark, SF).collect()))

    monkeypatch.setenv("NCS_LSH_CHECKPOINT_DIR", str(tmp_path / "ckpt"))
    reliable = sorted(map(tuple, q_dedup_minhash_lsh(spark, SF).collect()))
    assert reliable == base
    # the table write actually happened (files on disk under the ckpt dir)
    written = [p for p, _d, fs in os.walk(tmp_path / "ckpt") for f in fs
               if f.endswith(".parquet")]
    assert written
