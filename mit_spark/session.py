"""SparkSession factory with the engine's tuned defaults.

Performance-relevant settings (all measured in this container, see
BENCH/BASELINE.md):
  * MALLOC_MMAP_THRESHOLD_/MALLOC_TRIM_THRESHOLD_: numpy image buffers at
    detect_size=2048 exceed glibc's 128 KiB mmap threshold; without these,
    every large allocation mmaps + munmaps and pays first-touch page faults
    (~10-20x slowdown in sandboxed kernels). Raising the thresholds keeps
    buffers in the arena for reuse. Exported to python workers via env.
  * OMP/BLAS threads = 1: 32 python workers x N BLAS threads oversubscribes
    (the reference pins ORT intra=4/inter=2 for ONE process,
    base-util/src/onnx.rs:59-60; for a worker-per-core model 1 is correct).
  * Arrow batch size bounded: each media span costs ~0.05-0.6 s in the UDF;
    small batches keep tasks responsive and bound worker memory.
"""

from __future__ import annotations

import os

WORKER_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "1073741824",
    "MALLOC_TRIM_THRESHOLD_": "1073741824",
    "OMP_NUM_THREADS": "1",
    "OPENBLAS_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
}


def apply_worker_env() -> None:
    for k, v in WORKER_ENV.items():
        os.environ.setdefault(k, v)


def make_session(
    master: str | None = None,
    app_name: str = "mit-spark",
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
):
    from pyspark.sql import SparkSession

    apply_worker_env()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")  # NTZ<->TZ casts relabel
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
    )
    n_shuffle = shuffle_partitions or int(master[master.find("[") + 1 : -1].replace("*", "0") or 0) or 32
    builder = builder.config("spark.sql.shuffle.partitions", str(max(n_shuffle, 16)))
    for k, v in WORKER_ENV.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
