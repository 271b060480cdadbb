"""Snapshot table layer: partitioned Parquet + atomic JSON manifests.

The north_rule requires Iceberg-style state checkpointing (resumable,
per-partition lineage + metrics). The sandbox has no Iceberg runtime jar, so
this module implements the same *contract* with plain Parquet:

* a table = a directory of immutable snapshot file-sets
* a manifest per snapshot: file list with per-file rows/bytes, parent
  snapshot id (lineage), free-form metrics
* commit = write-files → write-manifest → atomic rename of the CURRENT
  pointer (readers only ever follow CURRENT, so a crash mid-commit leaves the
  previous snapshot intact — the resume guarantee)
* append = new manifest referencing parent files + new files (no rewrite)
* reads go through the manifest's explicit file list, so time-travel /
  rollback is `set_current(name, snap)`

Swap-in path for a real cluster: replace Catalog with an Iceberg catalog —
every call site uses only read / commit / current_snapshot.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as _fn
from pyspark.sql import types as T


def _fcol(name: str):
    return _fn.col(name)


class Catalog:
    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------- paths
    def _tdir(self, name: str) -> Path:
        return self.root / name

    def _manifest_path(self, name: str, snap: int) -> Path:
        return self._tdir(name) / "_manifests" / f"{snap:012d}.json"

    def _current_path(self, name: str) -> Path:
        return self._tdir(name) / "CURRENT"

    # ----------------------------------------------------------- snapshots
    def current_snapshot(self, name: str) -> int | None:
        p = self._current_path(name)
        if not p.exists():
            return None
        return int(p.read_text().strip())

    def set_current(self, name: str, snap: int) -> None:
        """Atomic pointer swap (rollback / resume)."""
        p = self._current_path(name)
        tmp = p.with_suffix(f".tmp-{uuid.uuid4().hex}")
        tmp.write_text(str(snap))
        os.replace(tmp, p)

    def manifest(self, name: str, snap: int | None = None) -> dict | None:
        if snap is None:
            snap = self.current_snapshot(name)
        if snap is None:
            return None
        mp = self._manifest_path(name, snap)
        return json.loads(mp.read_text()) if mp.exists() else None

    # --------------------------------------------------------------- read
    def read(self, spark: SparkSession, name: str, schema: T.StructType) -> DataFrame:
        m = self.manifest(name)
        if m is None or not m["files"]:
            # one slice: createDataFrame parallelizes into defaultParallelism
            # EMPTY partitions, so every consumer stage of an empty table read
            # pays a cores-wide task launch for nothing (round 1 reads 4
            # not-yet-existing tables — measured 32-task 0-CPU stages)
            from .. import schema as _schema_mod
            return _schema_mod.local_df(spark, [], schema)
        return spark.read.schema(schema).parquet(*[f["path"] for f in m["files"]])

    def exists(self, name: str) -> bool:
        return self.current_snapshot(name) is not None

    # -------------------------------------------------------------- commit
    def commit(
        self,
        name: str,
        df: DataFrame,
        mode: str = "overwrite",
        round_no: int | None = None,
        partition_by: list[str] | None = None,
        metrics: dict | None = None,
        replaced_partitions: dict[str, list] | None = None,
        split_col: str | None = None,
        files_per_partition: int = 1,
    ) -> int:
        """Write df as a new snapshot.

        mode='overwrite'  — snapshot is exactly df's files.
        mode='append'     — snapshot = parent files + df's files.
        replaced_partitions={'col': [v,...]} with mode='overwrite-partitions'
          — snapshot = parent files whose partition value ∉ list, + df's
          files (the MERGE-touches-only-dirty-buckets path: at 10^10 rows a
          round touches a fraction of buckets; untouched bucket files are
          carried by reference, never rewritten).
        """
        tdir = self._tdir(name)
        (tdir / "_manifests").mkdir(parents=True, exist_ok=True)
        parent = self.current_snapshot(name)
        snap = (parent or 0) + 1
        data_dir = tdir / f"snap-{snap:012d}"

        t0 = time.time()
        df.sparkSession.sparkContext.setJobDescription(f"commit:{name}")
        if partition_by:
            # cluster rows so each partition value lands in a BOUNDED number
            # of files: without this, a partitioned write fans out
            # shuffle_partitions × values files (2048 at 32 cores × 64
            # buckets), and per-file costs — footer scan here, file listing
            # on every read — grow WITH core count, inverting scaling.
            # files_per_partition > 1 + split_col salts hot partition values
            # across up to that many writer tasks (r1 ADVICE: a single file
            # per value caps write parallelism at the touched-bucket count
            # and makes hot buckets single giant files).
            cols = [_fcol(c) for c in partition_by]
            if split_col and files_per_partition > 1:
                cols.append(
                    _fn.pmod(_fn.crc32(_fcol(split_col).cast("string")),
                             _fn.lit(files_per_partition))
                )
            df = df.repartition(*cols)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(data_dir))
        df.sparkSession.sparkContext.setJobDescription(None)
        write_ms = int((time.time() - t0) * 1000)

        t1 = time.time()
        new_files = self._scan_files(data_dir)
        scan_ms = int((time.time() - t1) * 1000)
        files: list[dict]
        if mode == "overwrite" or parent is None:
            files = new_files
        elif mode == "append":
            files = list(self.manifest(name, parent)["files"]) + new_files
        elif mode == "overwrite-partitions":
            assert replaced_partitions and len(replaced_partitions) == 1
            col, vals = next(iter(replaced_partitions.items()))
            tokens = {f"{col}={v}" for v in vals}
            kept = [
                f
                for f in self.manifest(name, parent)["files"]
                if not any(tok in f["path"].split(os.sep) for tok in tokens)
            ]
            files = kept + new_files
        else:
            raise ValueError(f"unknown commit mode: {mode}")

        self._write_manifest(name, snap, parent, round_no, mode, files, new_files,
                             metrics, write_ms, scan_ms)
        return snap

    def commit_files(
        self,
        name: str,
        file_paths: list[str | Path],
        mode: str = "overwrite",
        round_no: int | None = None,
        metrics: dict | None = None,
    ) -> int:
        """Manifest-only commit: adopt ALREADY-WRITTEN parquet files (e.g. a
        partition of an intra-round stage) as a new snapshot — no Spark job.
        Files are hardlinked into the snapshot dir (copy fallback), so the
        snapshot survives `drop_stages`. This is the floor-cut path: when a
        sink is a pure row-subset of a stage that was partitioned on the
        subset predicate, the commit collapses to a driver-side link+footer
        scan. The Iceberg analog is manifest reuse of unchanged data files.

        Adopted files may carry EXTRA physical columns (stages hold working
        columns); readers go through `read(schema)` which projects the
        table's declared columns only.
        """
        tdir = self._tdir(name)
        (tdir / "_manifests").mkdir(parents=True, exist_ok=True)
        parent = self.current_snapshot(name)
        snap = (parent or 0) + 1
        data_dir = tdir / f"snap-{snap:012d}"
        data_dir.mkdir(parents=True, exist_ok=True)
        linked: list[Path] = []
        for i, src in enumerate(sorted(str(p) for p in file_paths)):
            dst = data_dir / f"adopt-{i:05d}.parquet"
            try:
                os.link(src, dst)
            except OSError:
                import shutil

                shutil.copy2(src, dst)
            linked.append(dst)
        new_files = self._scan_paths(linked)
        if mode == "overwrite" or parent is None:
            files = new_files
        elif mode == "append":
            files = list(self.manifest(name, parent)["files"]) + new_files
        else:
            raise ValueError(f"commit_files: unsupported mode {mode}")
        self._write_manifest(name, snap, parent, round_no, mode, files, new_files,
                             metrics, write_ms=0, scan_ms=0)
        return snap

    def commit_rows(
        self,
        name: str,
        rows: list[tuple],
        schema: T.StructType,
        mode: str = "append",
        round_no: int | None = None,
    ) -> int:
        """Driver-side commit of a TINY row set (config-sized — e.g. one
        round's metrics rollup, O(domains×statuses) rows) via pyarrow: no
        Spark job at all. Schema is the table's Spark StructType, mapped to
        arrow so `read(schema)` round-trips exactly."""
        import pyarrow as pa

        _ARROW = {"integer": pa.int32(), "long": pa.int64(), "string": pa.string(),
                  "double": pa.float64(), "boolean": pa.bool_()}
        arrow_schema = pa.schema(
            [(f.name, _ARROW[f.dataType.typeName()]) for f in schema.fields]
        )
        cols = list(zip(*rows)) if rows else [[] for _ in schema.fields]
        table = pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, arrow_schema)],
            schema=arrow_schema,
        )
        tdir = self._tdir(name)
        (tdir / "_manifests").mkdir(parents=True, exist_ok=True)
        parent = self.current_snapshot(name)
        snap = (parent or 0) + 1
        data_dir = tdir / f"snap-{snap:012d}"
        data_dir.mkdir(parents=True, exist_ok=True)
        out = data_dir / "part-00000.parquet"
        pq.write_table(table, out)
        new_files = self._scan_paths([out])
        if mode == "overwrite" or parent is None:
            files = new_files
        elif mode == "append":
            files = list(self.manifest(name, parent)["files"]) + new_files
        else:
            raise ValueError(f"commit_rows: unsupported mode {mode}")
        self._write_manifest(name, snap, parent, round_no, mode, files, new_files,
                             None, write_ms=0, scan_ms=0)
        return snap

    def _write_manifest(self, name, snap, parent, round_no, mode, files,
                        new_files, metrics, write_ms, scan_ms) -> None:
        man = {
            "table": name,
            "snapshot": snap,
            "parent": parent,
            "round": round_no,
            "mode": mode,
            "write_ms": write_ms,
            "scan_ms": scan_ms,
            "n_new_files": len(new_files),
            "files": files,
            "total_rows": sum(f["rows"] for f in files),
            "total_bytes": sum(f["bytes"] for f in files),
            "new_rows": sum(f["rows"] for f in new_files),
            "metrics": metrics or {},
        }
        mp = self._manifest_path(name, snap)
        tmp = mp.with_suffix(f".tmp-{uuid.uuid4().hex}")
        tmp.write_text(json.dumps(man))
        os.replace(tmp, mp)
        self.set_current(name, snap)

    @staticmethod
    def _scan_paths(paths: list[Path]) -> list[dict]:
        from concurrent.futures import ThreadPoolExecutor

        def one(p: Path) -> dict:
            meta = pq.ParquetFile(p).metadata
            return {"path": str(p), "rows": meta.num_rows, "bytes": p.stat().st_size}

        if len(paths) <= 4:
            return [one(p) for p in paths]
        with ThreadPoolExecutor(max_workers=16) as pool:
            return list(pool.map(one, paths))

    @classmethod
    def _scan_files(cls, data_dir: Path) -> list[dict]:
        return cls._scan_paths(sorted(data_dir.rglob("*.parquet")))

    # ------------------------------------------------------------- stages
    def stage(self, spark: SparkSession, round_no: int, name: str, df: DataFrame,
              repartition: int | None = None,
              partition_by: list[str] | None = None,
              shuffle: bool = True) -> DataFrame:
        """Materialize an intra-round intermediate to parquet and return a
        reader over it. This cuts the round's DAG at stage boundaries: every
        downstream job sees `Scan parquet` instead of the full upstream
        lineage, so task binaries stay KB-sized, codegen compiles small
        stages, and nothing is ever recomputed. (Spark does NOT dedupe common
        subtrees across actions/branches — measured: a persist/count-barrier
        version of this round spent ~20,000 task-CPU-seconds re-evaluating
        and re-deserializing nested cached plans for ~300s of real work.)

        Stages are transient (no manifest): resume replays the whole round
        from the last committed snapshot, so stage files never need recovery.
        """
        path = self.root / "_stages" / f"r{round_no:08d}" / name
        spark.sparkContext.setJobDescription(f"stage:{name}")
        if partition_by:
            # partitioned stage: the partition-value *set* becomes readable
            # driver-side from the directory names (stage_partition_values) —
            # replaces a distinct().collect() job with a listdir.
            # shuffle=False keeps the upstream partitioning (each task writes
            # ≤|values| files) — for LOW-cardinality partition cols (e.g. a
            # boolean disposition) where clustering would collapse the write
            # to |values| tasks and serialize a wave; the file-count bound is
            # tasks×values, and downstream reads get partition PRUNING, which
            # is the point (stage_partition_files adopts a value's files into
            # a snapshot without any Spark job).
            w = df.repartition(*[_fcol(c) for c in partition_by]) if shuffle else df
            w.write.mode("overwrite").partitionBy(*partition_by).parquet(str(path))
        else:
            w = df.repartition(repartition) if repartition else df
            w.write.mode("overwrite").parquet(str(path))
        spark.sparkContext.setJobDescription(None)
        # read back with the writer's schema: a partitioned write of an EMPTY
        # frame (e.g. a converged round with no updates) leaves zero data
        # files, and schema inference would fail on the bare directory
        return spark.read.schema(df.schema).parquet(str(path))

    def stage_partition_files(self, round_no: int, name: str,
                              **partition_values: str) -> list[Path]:
        """Data files of one partition of a partitioned stage (hive dir
        layout), listed driver-side — the input to `commit_files`."""
        base = self.root / "_stages" / f"r{round_no:08d}" / name
        for k, v in partition_values.items():
            base = base / f"{k}={v}"
        if not base.exists():
            return []
        return sorted(base.rglob("*.parquet"))

    def stage_rows(self, round_no: int, name: str, **partition_values: str) -> int:
        """Row count of a stage (or one partition of it) from parquet
        footers, driver-side — no Spark job. Lets the round skip whole
        commit/append jobs whose input is provably empty."""
        base = self.root / "_stages" / f"r{round_no:08d}" / name
        for k, v in partition_values.items():
            base = base / f"{k}={v}"
        if not base.exists():
            return 0
        return sum(f["rows"] for f in self._scan_paths(sorted(base.rglob("*.parquet"))))

    def stage_partition_values(self, round_no: int, name: str) -> list[dict]:
        """Distinct partition-column value combos of a partitioned stage,
        parsed from its hive-style directory names — no Spark job."""
        base = self.root / "_stages" / f"r{round_no:08d}" / name
        out = []

        def walk(d: Path, acc: dict):
            subs = [p for p in d.iterdir() if p.is_dir() and "=" in p.name]
            if not subs:
                if acc:
                    out.append(dict(acc))
                return
            for p in subs:
                k, v = p.name.split("=", 1)
                walk(p, {**acc, k: v})

        if base.exists():
            walk(base, {})
        return out

    def drop_stages(self, round_no: int) -> None:
        import shutil

        shutil.rmtree(self.root / "_stages" / f"r{round_no:08d}", ignore_errors=True)

    # ------------------------------------------------------------ round log
    def commit_round(self, round_no: int, snapshots: dict[str, int], metrics: dict) -> None:
        """Mark a round complete: records every table's snapshot id so resume
        restores a mutually-consistent view of all state tables."""
        rdir = self.root / "_rounds"
        rdir.mkdir(exist_ok=True)
        p = rdir / f"{round_no:08d}.json"
        tmp = p.with_suffix(f".tmp-{uuid.uuid4().hex}")
        tmp.write_text(json.dumps({"round": round_no, "snapshots": snapshots, "metrics": metrics}))
        os.replace(tmp, p)

    def last_completed_round(self) -> dict | None:
        rdir = self.root / "_rounds"
        if not rdir.exists():
            return None
        files = sorted(rdir.glob("*.json"))
        if not files:
            return None
        return json.loads(files[-1].read_text())

    def restore_round(self, round_info: dict) -> None:
        """Point every table's CURRENT at the snapshots of a completed round
        (discards any partially-committed later round — crash resume)."""
        for name, snap in round_info["snapshots"].items():
            self.set_current(name, snap)
