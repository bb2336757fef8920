"""Checkpointed stage outputs + resumable reruns (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Generalizes the reference's compute-once-serve-many blob cache
(reference: backend/routers/catchment.py:379,659-663 stores the whole result file and
re-serves it) into stage-level parquet checkpoints: each stage writes to
``<root>/<stage>/`` with a ``_MANIFEST.json`` (row count, schema, inputs fingerprint)
committed AFTER the parquet ``_SUCCESS`` marker; a rerun skips any stage whose manifest
matches.  At cluster scale this is the standard idempotent-stage pattern: the manifest
is the commit point, safe under retries.

All manifest I/O goes through the Hadoop FileSystem API resolved from the root path's
scheme — the data AND the manifest land on the same filesystem whether root is a local
dir, ``hdfs://`` or ``s3a://`` (driver-local ``open()``/``os.rename`` would silently
divert the manifest to the driver's disk on a cluster and break resume).  The tmp +
rename publish is atomic on HDFS/local; on S3A rename is copy+delete but the manifest
is still the last artifact written, so a torn run re-executes the stage (never serves
a partial checkpoint).

``fingerprint`` is REQUIRED: it must encode every input the stage depends on (paths,
parameters, code version).  A round-1 default of "" made forgetting it silently reuse
stale checkpoints across different inputs.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


class StageCheckpointer:
    def __init__(self, spark: SparkSession, root: str, run_id: int = 0):
        self.spark = spark
        self.root = root.rstrip("/")
        self.run_id = run_id
        fs, p = self._fs_path(self.root)
        fs.mkdirs(p)

    # -- Hadoop FileSystem plumbing (scheme-aware: file://, hdfs://, s3a://, ...) --

    def _fs_path(self, path_str: str):
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path_str)
        fs = p.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, p

    def _read_text(self, path_str: str) -> str | None:
        fs, p = self._fs_path(path_str)
        if not fs.exists(p):
            return None
        stream = fs.open(p)
        try:
            data = self.spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        return bytes(data).decode("utf-8")

    def _write_text_atomic(self, path_str: str, text: str) -> None:
        fs, dst = self._fs_path(path_str)
        _, tmp = self._fs_path(path_str + ".tmp")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        if fs.exists(dst):
            fs.delete(dst, False)
        fs.rename(tmp, dst)

    # -- stage API --

    def _stage_dir(self, stage: str) -> str:
        return f"{self.root}/{stage}"

    def _manifest_path(self, stage: str) -> str:
        return f"{self._stage_dir(stage)}/{MANIFEST}"

    def is_complete(self, stage: str, fingerprint: str) -> bool:
        # ANY manifest read failure means "not committed": a torn write surfaces as
        # a Hadoop ChecksumException (LocalFileSystem keeps .crc sidecars), malformed
        # JSON as a decode error — both must trigger recompute, never crash the rerun
        try:
            text = self._read_text(self._manifest_path(stage))
        except Exception:
            return False
        if text is None:
            return False
        try:
            m = json.loads(text)
        except json.JSONDecodeError:
            return False
        return m.get("fingerprint") == fingerprint and m.get("committed", False)

    def run_stage(
        self,
        stage: str,
        build: "callable[[], DataFrame]",
        fingerprint: str,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Execute ``build`` -> write parquet -> commit manifest; or skip and read the
        checkpoint when the manifest already matches (resume path)."""
        sdir = self._stage_dir(stage)
        if self.is_complete(stage, fingerprint):
            return self.spark.read.parquet(sdir)
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(sdir)
        out = self.spark.read.parquet(sdir)
        n = out.count()
        manifest = {
            "stage": stage,
            "run_id": self.run_id,
            "fingerprint": fingerprint,
            "rows": n,
            "schema": out.schema.jsonValue(),
            "committed": True,
            "committed_at": time.time(),
        }
        self._write_text_atomic(self._manifest_path(stage), json.dumps(manifest))
        return out

    def partition_lineage(self, stage: str, df: DataFrame) -> DataFrame:
        """Per-partition lineage rows: (stage, partition_id, rows) — the engine analog
        of the reference's per-run metrics columns, at partition granularity."""
        return (
            df.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(F.count("*").alias("rows"))
            .withColumn("stage", F.lit(stage))
            .withColumn("run_id", F.lit(self.run_id))
        )
