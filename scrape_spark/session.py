"""SparkSession factory with scale-oriented defaults.

Designed for a multi-executor cluster reading ~100 TB of Common-Crawl-style
pages; tested on ``local[N]``. Every default here is chosen for the 10^10-URL
frontier case:

- AQE on (runtime coalesce + skew-join split) — mega-host skew is a first-class
  concern (BASELINE.json north_rule).
- Arrow batches capped small because ``html`` rows are large (a 2048-row batch
  of 100 KB pages is ~200 MB per Python worker otherwise).
- Broadcast threshold raised: the robots dim table (one row per (host, agent))
  is small relative to the frontier and must broadcast (reference does a per-row
  MySQL lookup, robots_handler.py:60-69).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def local_df(spark: SparkSession, rows, schema):
    """Small local-data DataFrame materialized JVM-side (one Arrow batch).

    ``spark.createDataFrame(list)`` plans a Python-RDD scan with
    ``spark.default.parallelism`` slices, and every downstream action
    re-evaluates it through one Python-worker handshake PER SLICE — the rows
    stay driver-side, so the cost recurs on each action. Measured here:
    ~0.2 s/handshake × 32 slices ≈ 6 s per action on a 12-row seed frame
    (this sandbox's process fork is slow; a real cluster pays less per
    handshake but still one per slice per action). Routing through pandas
    takes the Arrow path: the rows land in the JVM as Arrow batches at
    creation time and every later action is pure JVM.

    Falls back to the plain path for empty input (zero-slice scan, already
    free) or when pandas/Arrow conversion rejects the data.
    """
    if rows:
        try:
            import pandas as pd
            from pyspark.sql.types import StructType

            st = (
                StructType.fromDDL(schema) if isinstance(schema, str) else schema
            )
            pdf = pd.DataFrame(
                [tuple(r) for r in rows], columns=st.names, dtype=object
            )
            return spark.createDataFrame(pdf, schema=st)
        except Exception:  # unsupported shape/type → plain path
            pass
    return spark.createDataFrame(rows, schema)


def empty_df(spark: SparkSession, schema):
    """Empty DataFrame as a pure-JVM relation (no Python-RDD scan).

    ``spark.createDataFrame([], schema)`` still plans a Python-RDD scan whose
    empty slices each handshake a Python worker on every action (~0.35 s per
    action measured here). An empty ``range(0)`` projection is JVM-only and
    folds away at plan time.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    return spark.range(0).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
    )


def _default_driver_mem() -> str:
    """Driver heap default derived from available memory.

    The bench environment wants a large FIXED pre-touched heap (lazily-faulted
    guest memory → GC pauses, see get_spark notes), but baking 12g into the
    library default makes every consumer fail on smaller hosts. Use roughly
    half of MemAvailable, clamped to [2g, 12g]; the env override
    ``SPARK_GRAFT_DRIVER_MEM`` remains the bench knob.
    """
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) // (1024 * 1024)
                    return f"{max(2, min(12, avail_gb // 2))}g"
    except OSError:
        pass
    return "4g"


def _ship_package(spark: SparkSession) -> None:
    """Ship ``scrape_spark`` to executors (the ``--py-files`` equivalent).

    Python workers don't inherit driver-side sys.path mutations; on a real
    cluster the package is distributed via ``spark-submit --py-files
    scrape_spark.zip`` (north_rule). For programmatic sessions we build the
    same zip once and ``addPyFile`` it so pandas-UDF closures referencing
    ``scrape_spark.functions`` deserialize on every executor.
    """
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), "scrape_spark_pyfiles.zip")
    if not os.path.exists(zpath) or os.path.getmtime(zpath) < max(
        os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(pkg_root)
        for f in fs
        if f.endswith(".py")
    ):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for dp, _, fs in os.walk(pkg_root):
                for f in fs:
                    if f.endswith(".py"):
                        full = os.path.join(dp, f)
                        rel = os.path.join(
                            "scrape_spark", os.path.relpath(full, pkg_root)
                        )
                        zf.write(full, rel)
        os.replace(tmp, zpath)
    spark.sparkContext.addPyFile(zpath)


def get_spark(
    app_name: str = "scrape-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    # modest FIXED heap: this sandbox's guest memory is lazily faulted by the
    # host, so on-demand heap growth under 32-thread allocation pressure
    # produced young-GC pauses up to 118 s (measured). A small pre-touched
    # heap keeps the working set resident; spill handles the rest.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM") or _default_driver_mem()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local mode: driver JVM IS the executor — the 1g default thrashes GC
        # the moment 32 tasks hold html Arrow batches concurrently
        .config("spark.driver.memory", driver_mem)
        # throughput GC: html/Arrow buffers are large short-lived allocations;
        # G1's humongous-region handling stalled parse stages (GCLocker storms).
        # -Xms fixes the committed heap so GC-driven growth (measured 118 s
        # young-GC pauses on this host's lazily-faulted guest memory) never
        # happens; the working set is faulted by the first (warm-up) pass.
        # AlwaysPreTouch is opt-in: faulting the FULL heap at startup costs
        # 30-140 s on this VM (~90 MB/s fault path) and is strictly more work
        # than the job's working set needs.
        # UseTransparentHugePages: madvise(MADV_HUGEPAGE) the heap so it
        # faults in 2 MB chunks — this guest's 4 KB fault path measured
        # ~360 MB/s idle and collapses to <15 MB/s under concurrent fault
        # load; THP faulting measured ~1 GB/s and cuts fault exits 512×.
        # COUPLED to AlwaysPreTouch: this kernel runs thp defrag=madvise,
        # so a madvise'd heap pays SYNCHRONOUS compaction on every lazy
        # fault — measured 3× slowdown on warm scan-side queries when the
        # heap faults mid-job. With pretouch the whole heap faults (fast,
        # via THP) at startup and steady state never faults again; without
        # pretouch the lazily-faulted 4 KB path is the cheaper trade.
        .config(
            "spark.driver.extraJavaOptions",
            f"-XX:+UseParallelGC -Xms{driver_mem}"
            + (
                " -XX:+UseTransparentHugePages -XX:+AlwaysPreTouch"
                if os.environ.get("SPARK_GRAFT_PRETOUCH") == "1"
                else ""
            ),
        )
        # timestamp rendering (events_hourly etc.) must not depend on the
        # host zone: parquet timestamps are written/read as UTC instants
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.default.parallelism", str(shuffle_partitions or cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # html rows are large; keep Arrow batches SMALL. At 100 KB CC pages a
        # 1024-row batch is ~100 MB per Python worker; and with both the
        # input and output Arrow streams in flight, batches larger than the
        # kernel socket buffers (4 MB here) produced a bidirectional TCP
        # zero-window deadlock between executor and worker (both queues
        # full, persist-timer probing, task stalled for minutes — observed
        # on the bench fixture at 1024 rows × ~6 KB html). Scalar pandas
        # UDFs have no maxBytesPerBatch; the record cap is the only knob.
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "128"),
        )
        # InferFiltersFromGenerate synthesizes `size(udf.links)>0` below an
        # explode and pushes it through joins, CLONING the Arrow parse UDF
        # onto the pages scan side: every page parsed twice and the html side
        # dragged through an Exchange (observed on the scaling job — two
        # concurrent full-parse stages). The inferred filter saves nothing
        # here (evaluating it costs the same UDF it guards), so exclude the
        # rule engine-wide.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.maxResultSize", "2g")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark
