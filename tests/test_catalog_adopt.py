"""Catalog.commit_files (stage-file adoption) and commit_rows (driver-side
pyarrow commit): manifest contract, hardlink survival after drop_stages,
schema-projected reads over adopted files carrying extra columns."""

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from neocrawler_spark.sources.tables import Catalog

SCHEMA = T.StructType([
    T.StructField("k", T.StringType(), False),
    T.StructField("v", T.LongType(), False),
])


def _write_parquet(path, rows):
    tbl = pa.table({"k": [r[0] for r in rows], "v": [r[1] for r in rows],
                    "extra": [1.5] * len(rows)})
    pq.write_table(tbl, path)


def test_commit_files_adopts_and_survives_stage_drop(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    stage_dir = cat.root / "_stages" / "r00000001" / "x" / "p=a"
    stage_dir.mkdir(parents=True)
    _write_parquet(stage_dir / "f1.parquet", [("a", 1), ("b", 2)])
    files = cat.stage_partition_files(1, "x", p="a")
    assert len(files) == 1
    snap = cat.commit_files("t", files, round_no=1)
    assert snap == 1
    man = cat.manifest("t")
    assert man["total_rows"] == 2 and man["n_new_files"] == 1
    # dropping the stage must not invalidate the snapshot (hardlinked)
    cat.drop_stages(1)
    got = sorted(tuple(r) for r in cat.read(spark, "t", SCHEMA).collect())
    # extra physical column is invisible through the schema-projected read
    assert got == [("a", 1), ("b", 2)]


def test_commit_files_append_keeps_parent(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    d = tmp_path / "ext"
    d.mkdir()
    _write_parquet(d / "a.parquet", [("a", 1)])
    _write_parquet(d / "b.parquet", [("b", 2)])
    cat.commit_files("t", [d / "a.parquet"])
    cat.commit_files("t", [d / "b.parquet"], mode="append")
    got = sorted(tuple(r) for r in cat.read(spark, "t", SCHEMA).collect())
    assert got == [("a", 1), ("b", 2)]
    # empty adoption is a valid (possibly empty-delta) snapshot
    cat.commit_files("t", [], mode="append")
    assert cat.read(spark, "t", SCHEMA).count() == 2


def test_commit_rows_roundtrip(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    cat.commit_rows("m", [("x", 1), ("y", 2)], SCHEMA, mode="append")
    cat.commit_rows("m", [("z", 3)], SCHEMA, mode="append")
    got = sorted(tuple(r) for r in cat.read(spark, "m", SCHEMA).collect())
    assert got == [("x", 1), ("y", 2), ("z", 3)]
    # empty row set keeps the schema readable
    cat.commit_rows("m2", [], SCHEMA)
    assert cat.read(spark, "m2", SCHEMA).count() == 0
