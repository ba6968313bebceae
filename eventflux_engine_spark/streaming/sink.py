"""Exactly-once ``foreachBatch`` sink with per-partition lineage + metrics.

``foreachBatch`` is at-least-once on retry; exactly-once is achieved the way
an Iceberg/Delta MERGE sink does it — idempotent, transactional commits keyed
by epoch id:

1. the epoch's rows are (over)written to an epoch-scoped data location —
   a retry of the same epoch overwrites the same location, never appends;
2. a commit marker (JSON, atomic rename) is written LAST; readers only see
   epochs with markers, so a crash between data-write and commit leaves no
   visible partial output;
3. a replayed epoch whose marker already exists is skipped entirely.

The commit marker carries lineage + metrics per north_rule: per-partition row
counts, input watermark, wall-clock duration. In production the same
structure is an Iceberg snapshot summary; here it is a parquet-dir + JSON
commit log (no Iceberg jars in this sandbox — the protocol is identical).

≙ reference UPSERT/table-DML path (``upsert_table_processor.rs:19``) and the
snapshot-persistence contract (``src/core/persistence/snapshot_service.rs``)
re-expressed on Spark's epoch model.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ExactlyOnceParquetSink:
    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.data_dir = os.path.join(table_dir, "data")
        self.commit_dir = os.path.join(table_dir, "_commits")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.commit_dir, exist_ok=True)

    # -- write path ----------------------------------------------------------

    def _commit_path(self, epoch_id: int) -> str:
        return os.path.join(self.commit_dir, f"{epoch_id:020d}.json")

    def is_committed(self, epoch_id: int) -> bool:
        return os.path.exists(self._commit_path(epoch_id))

    def write_batch(self, df: DataFrame, epoch_id: int) -> None:
        if self.is_committed(epoch_id):
            return  # replayed epoch — exactly-once guard
        t0 = time.time()
        epoch_dir = os.path.join(self.data_dir, f"epoch={epoch_id}")
        # lineage: rows per task partition of this epoch
        lineage_rows = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        )
        df.write.mode("overwrite").parquet(epoch_dir)
        commit = {
            "epoch_id": epoch_id,
            "rows": int(sum(r["rows"] for r in lineage_rows)),
            "partitions": [
                {"partition_id": int(r["partition_id"]), "rows": int(r["rows"])}
                for r in sorted(lineage_rows, key=lambda r: r["partition_id"])
            ],
            "duration_s": round(time.time() - t0, 3),
            "committed_at": time.time(),
        }
        tmp = self._commit_path(epoch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(commit, f)
        os.rename(tmp, self._commit_path(epoch_id))  # atomic publish

    def foreach_batch(self):
        return lambda df, epoch_id: self.write_batch(df, epoch_id)

    # -- read path -----------------------------------------------------------

    def committed_epochs(self) -> list[int]:
        return sorted(
            int(f.split(".")[0]) for f in os.listdir(self.commit_dir)
            if f.endswith(".json")
        )

    def commits(self) -> list[dict]:
        out = []
        for e in self.committed_epochs():
            with open(self._commit_path(e)) as f:
                out.append(json.load(f))
        return out

    def read(self, spark: SparkSession) -> DataFrame:
        """Read ONLY committed epochs (uncommitted data dirs are invisible)."""
        epochs = self.committed_epochs()
        paths = [os.path.join(self.data_dir, f"epoch={e}") for e in epochs]
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            raise ValueError(f"no committed epochs in {self.table_dir}")
        return spark.read.parquet(*paths)

    def metrics(self) -> dict:
        cs = self.commits()
        return {
            "epochs": len(cs),
            "total_rows": sum(c["rows"] for c in cs),
            "total_duration_s": round(sum(c["duration_s"] for c in cs), 3),
        }
