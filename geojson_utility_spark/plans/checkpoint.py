"""Checkpointed stage outputs + resumable reruns (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Generalizes the reference's compute-once-serve-many blob cache
(reference: backend/routers/catchment.py:379,659-663 stores the whole result file and
re-serves it) into stage-level parquet checkpoints: each stage writes to
``<root>/<stage>/`` with a ``_MANIFEST.json`` (row count, schema, inputs fingerprint)
committed AFTER the parquet ``_SUCCESS`` marker; a rerun skips any stage whose manifest
matches.  At cluster scale this is the standard idempotent-stage pattern: object-store
rename-free (manifest is the commit point), safe under retries.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


class StageCheckpointer:
    def __init__(self, spark: SparkSession, root: str, run_id: int = 0):
        self.spark = spark
        self.root = root
        self.run_id = run_id
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), MANIFEST)

    def is_complete(self, stage: str, fingerprint: str = "") -> bool:
        path = self._manifest_path(stage)
        if not os.path.exists(path):
            return False
        try:
            with open(path) as f:
                m = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return m.get("fingerprint", "") == fingerprint and m.get("committed", False)

    def run_stage(
        self,
        stage: str,
        build: "callable[[], DataFrame]",
        fingerprint: str = "",
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
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, self._manifest_path(stage))
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
