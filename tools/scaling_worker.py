"""One scaling-run worker: spark-submit-style job at N executors.

Launched by ``tools/bench_scaling.py`` as a separate process per cluster
size. Emulates ``spark-submit --py-files pkg.zip`` at N executors with a
``local-cluster[N, cores, mem]`` master — real separate executor JVMs, real
inter-JVM shuffle, package shipped to executors as a zip.

Env: N_EXEC, EXEC_CORES (default 4), TURNS_PER_EXEC (default 32M), REPS.
Prints one JSON line with throughput per job.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_exec = int(os.environ["N_EXEC"])
    cores = int(os.environ.get("EXEC_CORES", "4"))
    per_exec = int(os.environ.get("TURNS_PER_EXEC", "32000000"))
    reps = int(os.environ.get("REPS", "3"))
    n_turns = per_exec * n_exec

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = f"/tmp/efs_pkg_{os.getpid()}.zip"
    shutil.make_archive(pkg_zip[:-4], "zip", repo, "eventflux_engine_spark")

    spark = (
        SparkSession.builder.master(f"local-cluster[{n_exec},{cores},8192]")
        .appName(f"scaling_{n_exec}x{cores}")
        .config("spark.executor.memory", "7g")
        .config("spark.sql.shuffle.partitions", str(n_exec * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addPyFile(pkg_zip)

    from eventflux_engine_spark.cep import PatternSpec, Step, match_pattern_batch
    from eventflux_engine_spark.cep.fused import fused_transcript_pipeline
    from eventflux_engine_spark.datamodel import synth_transcripts_bucketed

    spec = PatternSpec(
        steps=(Step("e1", "is_user"), Step("e2", "is_assistant")),
        within=pd.Timedelta(minutes=30),
    )

    def flagged(seed: int):
        t = synth_transcripts_bucketed(
            spark, n_turns + seed * 200, 200, partitions=n_exec * cores * 4
        )
        return t.withColumn("is_user", F.col("role") == "user").withColumn(
            "is_assistant", F.col("role") == "assistant"
        )

    jobs = {
        "cep_fused_pipeline": lambda s: fused_transcript_pipeline(
            flagged(s), spec, input_sorted=True
        )
        .groupBy()
        .sum("n_matches", "n_sessions", "n_windows")
        .collect(),
        "pattern_only": lambda s: match_pattern_batch(flagged(s), spec, input_sorted=True)
        .groupBy()
        .count()
        .collect(),
    }

    out = {"n_exec": n_exec, "cores": cores, "n_turns": n_turns, "jobs": {}}
    for name, job in jobs.items():
        job(0)  # warm
        times = []
        for i in range(1, reps + 1):
            t0 = time.time()
            job(i)
            times.append(round(time.time() - t0, 2))
        out["jobs"][name] = {
            "times_s": times,
            "best_s": min(times),
            "turns_per_sec": round(n_turns / min(times), 1),
        }
    spark.stop()
    os.remove(pkg_zip)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
