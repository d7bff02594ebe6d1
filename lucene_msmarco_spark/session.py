"""SparkSession builders tuned for the engine.

Local sandbox runs use ``local[N]`` single-JVM; the same confs are what we
would ship to a 1000-executor cluster via ``spark-submit --py-files`` —
AQE on (runtime re-plan + skew-join splitting, complementing our explicit
hot-term salting), Arrow enabled for the pandas-UDF analyzer path, and
shuffle partitions sized to the parallelism level.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_local_dir() -> str:
    """Shuffle/spill scratch dir.

    Tmpfs trades RAM for shuffle I/O: this sandbox's shared virtual disk
    stalls unpredictably under host load and serializes shuffle-write-bound
    stages, so /dev/shm stands in for the fast local NVMe a real executor
    would own. The trade-off: spill onto RAM-backed tmpfs consumes memory,
    so a large shuffle under pressure can OOM the host instead of spilling
    to disk — we therefore only pick tmpfs when it currently has plenty of
    headroom (>= 32 GiB free), and a deployment should simply leave this
    unset so executors use their own disks (set ``SPARK_LOCAL_DIRS``
    cluster-side, or ``LMS_SPARK_LOCAL_DIR`` here, to pin explicitly —
    the memory sizing knob ``SPARK_DRIVER_MEM`` lives next to this).
    """
    env = os.environ.get("LMS_SPARK_LOCAL_DIR")
    if env:
        return env
    if os.path.isdir("/dev/shm"):
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize >= 32 * 2**30:
            return "/dev/shm/spark-local"
    return "/tmp"


def build_session(
    app_name: str = "lucene-msmarco-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # heuristic: local[N] -> N shuffle partitions (avoid 200 tiny tasks)
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[6:-1]
            shuffle_partitions = cpus if inner == "*" else int(inner)
        else:
            shuffle_partitions = 2 * cpus

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # broadcast threshold: query-term and stats tables are tiny
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # shuffle/spill scratch — see _default_local_dir for the tmpfs
        # trade-off and the LMS_SPARK_LOCAL_DIR / SPARK_LOCAL_DIRS override
        .config("spark.local.dir", _default_local_dir())
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers regardless of
    the driver's cwd — the library equivalent of the north rule's
    ``spark-submit --py-files`` deployment. Zips the installed package once
    per session and registers it with ``addPyFile``."""
    import tempfile
    import zipfile

    import lucene_msmarco_spark as pkg

    sc = spark.sparkContext
    if getattr(sc, "_lms_pyfiles_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    tmp = tempfile.NamedTemporaryFile(
        prefix="lucene_msmarco_spark_", suffix=".zip", delete=False
    )
    with zipfile.ZipFile(tmp.name, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "lucene_msmarco_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    sc.addPyFile(tmp.name)
    sc._lms_pyfiles_shipped = True


def get_or_create(master: str | None = None) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return build_session(master=master)
