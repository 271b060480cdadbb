"""Multimodal binary-column plumbing: schema, batch shape, determinism of
the stubbed decode path, strict-mode NotImplementedError."""

import pytest
from pyspark.sql import functions as F

from neocrawler_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("a", b"\xff\xd8\xff\xe0" + b"j" * 5000),
        ("b", b"\x89PNG\r\n" + b"p" * 9000),
        ("c", b"ID3\x04" + b"m" * 100),
        ("d", None),
    ]
    return spark.createDataFrame(rows, "media_id string, blob binary")


def test_metadata(media):
    out = {r["media_id"]: r for r in mm.media_metadata(media, "media_id", "blob").collect()}
    assert out["a"]["media_kind"] == "image/jpeg" and out["a"]["n_bytes"] == 5004
    assert out["b"]["media_kind"] == "image/png"
    assert out["c"]["media_kind"] == "audio/mp3"
    assert out["d"]["n_bytes"] is None


def test_metadata_sha1_matches_hashlib(media):
    """sha1 golden vs hashlib — DuckDB has no sha1, so the driver gate drops
    this column (crawl_gate.q_media_metadata); this is its verification."""
    import hashlib

    out = {r["media_id"]: r["sha1"] for r in mm.media_metadata(media, "media_id", "blob").collect()}
    assert out["a"] == hashlib.sha1(b"\xff\xd8\xff\xe0" + b"j" * 5000).hexdigest()
    assert out["c"] == hashlib.sha1(b"ID3\x04" + b"m" * 100).hexdigest()
    assert out["d"] is None


def test_feature_extract_deterministic(media):
    a = mm.feature_extract(media, "media_id", "blob").orderBy("media_id").collect()
    b = mm.feature_extract(media, "media_id", "blob").orderBy("media_id").collect()
    assert a == b
    feats = {r["media_id"]: r["feature"] for r in a}
    assert len(feats["a"]) == 8
    assert all(0.0 <= v <= 1.0 for v in feats["a"])
    assert feats["d"] is None
    # matches the pure-python stub exactly (plumbing does not perturb bytes)
    blob = b"\xff\xd8\xff\xe0" + b"j" * 5000
    assert feats["a"] == pytest.approx(mm.decode_stub(blob), abs=0)


def test_feature_extract_strict_raises(media):
    with pytest.raises(Exception) as ei:
        mm.feature_extract(media, "media_id", "blob", strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_frame_sample_fanout(media):
    out = mm.frame_sample(media, "media_id", "blob", every_n_bytes=2048, max_frames=3)
    rows = out.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id["b"]) == 3  # 9006 bytes → 4 chunks capped at 3
    assert len(by_id["c"]) == 1  # tiny blob → 1 frame
    assert "d" not in by_id
    assert all(r["frame_bytes"] <= 2048 for r in rows)
