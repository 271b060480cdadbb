"""Materialization paths for the LSH pipeline: the default localCheckpoint
route and the executor-loss-safe table-write route (NCS_LSH_CHECKPOINT_DIR)
must yield identical results, for both the candidate pairs (r2 VERDICT #7)
and the full pairs→clusters resolve loop (r4 VERDICT #5). The table-write
route must also not leak dirs across invocations: everything lands under one
per-session subdir, and the CC loop removes each superseded labels table as
soon as its successor is pinned (r4 ADVICE)."""

import os

from neocrawler_spark.operators.dedup import q_dedup_lsh_resolve, q_dedup_minhash_lsh

SF = "/root/testdata/sf0.001"


def _parquet_files(root):
    return [os.path.join(p, f) for p, _d, fs in os.walk(root) for f in fs
            if f.endswith(".parquet")]


def test_table_write_path_matches_local_checkpoint(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("NCS_LSH_CHECKPOINT_DIR", raising=False)
    base = sorted(map(tuple, q_dedup_minhash_lsh(spark, SF).collect()))

    monkeypatch.setenv("NCS_LSH_CHECKPOINT_DIR", str(tmp_path / "ckpt"))
    reliable = sorted(map(tuple, q_dedup_minhash_lsh(spark, SF).collect()))
    assert reliable == base
    # the table write actually happened (files on disk under the ckpt dir)
    assert _parquet_files(tmp_path / "ckpt")


def test_resolve_loop_table_write_path(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("NCS_LSH_CHECKPOINT_DIR", raising=False)
    base = sorted(map(tuple, q_dedup_lsh_resolve(spark, SF).collect()))

    ckpt = tmp_path / "ckpt"
    monkeypatch.setenv("NCS_LSH_CHECKPOINT_DIR", str(ckpt))
    reliable_df = q_dedup_lsh_resolve(spark, SF)
    reliable = sorted(map(tuple, reliable_df.collect()))
    assert reliable == base

    # single per-session subdir; the loop's superseded tables were removed
    # (left on disk: the linear pins — sigs + groups + group-graph edges +
    # the FINAL labels table the returned frame still reads — never a
    # per-iteration pile-up)
    sessions = os.listdir(ckpt)
    assert len(sessions) == 1 and sessions[0].startswith("ncs-lsh-")
    sess = ckpt / sessions[0]
    tags = sorted({d.split("-")[0] for d in os.listdir(sess)})
    assert tags == ["edges", "groups", "labels", "sigs"]
    n_labels = sum(1 for d in os.listdir(sess) if d.startswith("labels-"))
    assert n_labels == 1
    assert not any(d.startswith("verified-") for d in os.listdir(sess))
    # the returned frame survives the cleanup (reads the final labels table)
    assert sorted(map(tuple, reliable_df.collect())) == base
