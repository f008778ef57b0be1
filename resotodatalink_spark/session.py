"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set fleet-wide on a real
cluster: AQE on (runtime re-plan, skew-join handling, partition
coalescing), Arrow for any Python exchange, UTC session time zone so
timestamp semantics match the reference's UTC string round-trip
(reference sql.py:43-55).  ``spark.sql.shuffle.partitions`` is sized
to the core count for local-bench scale (see the config comment for
the measured A/B and the cluster sizing rule); the sections that need
more width raise the runtime conf around themselves (bench.py sf10).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "resotodatalink-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Return (or create) the tuned session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    shuffle partitions match it so local runs don't over-partition tiny
    shuffles — AQE coalescing handles the rest.  ``extra_conf`` lets a
    caller override builder configs (bench.py re-enables the UI server
    to scrape per-query stage metrics from its REST API).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # 1x cores at LOCAL bench scale — a round-10 fresh-session A/B
        # measured 4x cores at +47% on an sf1 subset (iterative
        # checkpoint loops and streaming state pay fixed per-task cost
        # on byte-small partitions; AQE's parallelism-first coalescing
        # keeps reduce width near cores either way).  On a real cluster
        # size this to 2-4x TOTAL cores.  Both this and the AQE
        # advisory are RUNTIME SQL confs: bench.py raises them to
        # 4x cores / 16m around its sf10 section only, where exchanges
        # whose rows EXPAND after the shuffle (the posting-pair
        # aggregate: 1.9 GB compressed in, ~5-8x deserialized) need
        # width, not the default — measured 71s/25.8 GB spill ->
        # 30.3s/zero spill there with no sf1/headline tax.
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime bloom-filter pushdown: big shuffle joins get a bloom
        # filter from the small side applied at the big side's scan
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # harmless with the current timestamp[us] testdata; lets a
        # TIMESTAMP(NANOS) events footer (which Spark's vectorized
        # reader rejects) read as longs for tables.py's fallback branch
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Whole-stage codegen emits ONE method per stage; the JVM JIT
        # refuses to compile methods over ~8000 bytecode bytes
        # (-XX:-DontCompileHugeMethods), so a stage fused around a
        # 64-term dot-product or 16-char hash chain lands in the JVM
        # *bytecode interpreter*.  Spark's default hugeMethodLimit
        # (65535) only aborts codegen far past that point.  Aligning it
        # with the JIT threshold makes oversized stages fall back to
        # per-expression codegen (small, JIT-able methods): measured
        # 3.4x on a 1M-row cosine scan; normal stages keep WSCG.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        # local[32] packs ALL executor threads into this single JVM, so
        # the heap is 32 concurrent tasks' working memory plus the
        # block manager (localCheckpoint blocks live here too).  8g
        # gave ~256 MB per concurrent task and OOMed when the sf10
        # decade section ran FIRST in a fresh session (round 9: three
        # back-to-back 5M-doc checkpointing queries before any GC
        # pressure let ContextCleaner reap) — 16g is still far below a
        # real 32-core executor fleet's aggregate heap.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # JVM unified logging defaults to STDOUT; a GC warning landing
        # on fd 1 mid-bench contaminated bench.py's one-JSON-line
        # contract (observed: "[gc,alloc] ... Retried waiting for
        # GCLocker" interleaved before the JSON).  Route ALL JVM log
        # output to stderr so stdout stays parseable.
        .config(
            "spark.driver.extraJavaOptions",
            "-Xlog:all=warning:stderr:uptime,level,tags",
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
