"""SparkSession factory with scale-oriented defaults.

Tuned for the project's execution model: tested on local[N] but designed
for a 1000-executor cluster over ~100 TB. The knobs below are the ones
that matter at that scale; everything else is left to Spark/AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for 100 TB-scale behavior, applied only when the caller
# hasn't already set them:
#
# - AQE on (coalesce tiny shuffle partitions, split skewed ones, convert
#   sort-merge joins to broadcast at runtime). This replaces most manual
#   shuffle tuning and is the single biggest lever for plan quality on
#   skewed real data.
# - shuffle.partitions: sized to cores locally; on a real cluster AQE's
#   coalescing makes the initial number mostly a ceiling, so a high value
#   is safe.
# - maxPartitionBytes 128m: keeps scan partitions executor-memory sized at
#   any input scale.
# - parquet filter/aggregate pushdown + nanos-as-long handling so the scan
#   does the pruning (the analogue of the reference's bloom/index skipping,
#   kv/table/table.cpp:250-285).
# - Arrow enabled: every Pandas-UDF crossing is Arrow-batched, never
#   per-row pickling.
_DEFAULTS = {
    # Driver testdata parquet carries TIMESTAMP(NANOS) columns, which
    # Spark cannot read natively; read them as raw long nanos and convert
    # in sources.tables.load_table (exact integer div, no precision loss).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # spark.driver.memory: set dynamically below (_driver_memory_default)
    # — sized from the HOST's RAM, not a constant. See that function.
    # Reliable checkpoints (bpe_train's per-round lineage cut when a
    # checkpoint dir is configured) are NOT cleaned by default — the
    # files outlive the RDDs and a long session accumulates one
    # segmentation frame per training ROUND on the checkpoint volume.
    # This flag lets the ContextCleaner delete a checkpoint's files
    # once its RDD is garbage-collected. Read at SparkContext START —
    # sessions built elsewhere must set it themselves (bpe_train's
    # docstring says so).
    "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
    "spark.ui.enabled": "false",
    # Never write \r[Stage ...] progress bars to the console: when stdout
    # and stderr are captured as one stream they interleave with (and can
    # truncate) machine-read JSON output — this corrupted BENCH_r05.json.
    "spark.ui.showConsoleProgress": "false",
}


def _driver_memory_default() -> str:
    """Local-mode driver heap sized from the machine, not a constant.

    The local-mode driver JVM IS the executor pool, so its heap must be
    machine-sized: 8g was enough through the 100x sweep, but the 1000x
    (sf100) probe OOM'd the minhash Arrow pass at 8g on a 128 GiB box —
    there 24g gives 32 concurrent tasks ~750 MB each. Baking 24g into
    every get_spark() caller would invite swap/OOM-kill on 16-32 GiB
    hosts (ADVICE r12), so derive it: min(24g, ~40% of MemTotal),
    floored at 2g. On a real cluster this knob is ops config and the
    caller's extra_conf / spark-submit wins anyway.
    """
    gib = None
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    gib = int(line.split()[1]) // (1024 * 1024)
                    break
    except OSError:
        pass
    if gib is None:
        # non-Linux hosts (no /proc): POSIX sysconf is the portable
        # route to physical RAM — without it a macOS dev box with
        # plenty of memory would silently get the conservative floor
        # and OOM workloads that used to fit (ADVICE r13)
        try:
            gib = (os.sysconf("SC_PHYS_PAGES")
                   * os.sysconf("SC_PAGE_SIZE")) // (1024 ** 3)
        except (ValueError, OSError, AttributeError):
            gib = 8  # last-resort fallback: RAM genuinely unreadable
    return f"{max(2, min(24, int(gib * 0.4)))}g"


def _local_scratch_default(master: str, conf: dict[str, str],
                           environ=os.environ) -> str | None:
    """RAM-backed shuffle scratch for LOCAL mode, or None to leave
    Spark's default (/tmp) alone.

    Why (optimization guide §2.1): shuffle files, spilled blocks and
    localCheckpoint overflow all land in ``spark.local.dir``. On a
    shared host whose disk is contended by neighbors, that scratch
    write is the wall — this box measured ~20 MB/s sequential writes
    under a neighbor window, turning sub-second shuffle-heavy queries
    into 10-60x stalls (r15 baseline: dedup_minhash_xxh median 10.9 s
    → 1.9 s with scratch on /dev/shm, same window). Local-mode shuffle
    volumes here are MBs-to-low-GBs, so RAM-backed scratch is strictly
    better when RAM is plentiful.

    Scale story: this default fires ONLY for local[...] masters. On a
    real cluster the resource manager dictates scratch placement
    (YARN/Kubernetes override spark.local.dir with container dirs),
    and 100 TB shuffles cannot live in RAM — so there is deliberately
    no production analogue of this knob to mis-tune.

    Precedence: an explicit ``spark.local.dir`` in conf, or the
    standard ``SPARK_LOCAL_DIRS`` env, always wins (returns None).
    ``SPARK_GRAFT_LOCAL_DIR`` overrides the choice of directory.
    Guard: /dev/shm must exist with >= 16 GiB free, else None.

    Failure mode (ADVICE r15): tmpfs scratch is HOST RAM — a spill
    larger than the remaining /dev/shm fails mid-query with ENOSPC
    while pressuring host memory. The 16 GiB-free guard bounds entry,
    not growth; for spill-heavy local workloads set
    ``SPARK_GRAFT_LOCAL_DIR`` (or ``spark.local.dir``/
    ``SPARK_LOCAL_DIRS``) to a disk path — that env var is the escape
    hatch. To keep crashed runs from parking shuffle files in tmpfs
    until reboot, each session scratches under a PID-named subdir and
    ``get_spark`` sweeps siblings whose owning process is gone
    (_sweep_dead_scratch).
    """
    if not master.startswith("local"):
        return None
    if "spark.local.dir" in conf or environ.get("SPARK_LOCAL_DIRS"):
        return None
    override = environ.get("SPARK_GRAFT_LOCAL_DIR")
    if override:
        return override
    shm = "/dev/shm"
    try:
        st = os.statvfs(shm)
        if st.f_bavail * st.f_frsize < 16 * 1024 ** 3:
            return None
    except OSError:
        return None
    # PID-named subdir: Spark cleans its spark-*/blockmgr-* dirs on a
    # clean exit, but a crashed/killed run leaves them in tmpfs —
    # consuming host RAM until reboot (ADVICE r15). Naming each
    # session's scratch by owning pid makes stale dirs identifiable
    # (pid no longer alive), so the sweep below can reclaim them
    # without ever touching a LIVE session's shuffle files.
    return os.path.join(shm, "quasdb-spark-scratch", str(os.getpid()))


def _sweep_dead_scratch(scratch: str) -> None:
    """Remove sibling PID-dirs under the shared scratch root whose
    owning process is gone (crashed runs' shuffle/spill files,
    otherwise parked in tmpfs until reboot). Only PID-named dirs are
    candidates; a live pid (or any doubt) skips the dir. Unnamed
    residue (pre-r16 layout wrote spark-* directly under the root) is
    deliberately NOT swept: a still-running old-layout session is
    indistinguishable from a crashed one, and deleting live shuffle
    files corrupts it — that residue is small and clears at reboot."""
    import shutil
    import stat as _stat

    root = os.path.dirname(scratch)
    try:
        entries = os.listdir(root)
    except OSError:
        return
    me = os.path.basename(scratch)
    for name in entries:
        if name == me or not name.isdigit():
            continue
        p = os.path.join(root, name)
        try:
            if not _stat.S_ISDIR(os.lstat(p).st_mode):
                continue
        except OSError:
            continue
        try:
            os.kill(int(name), 0)
            continue  # owner alive — never touch
        except ProcessLookupError:
            pass  # owner gone: stale
        except OSError:
            continue  # unknowable (other user etc.): skip
        shutil.rmtree(p, ignore_errors=True)


def get_spark(app_name: str = "quasdb_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if the
    env var is unset); on a real cluster pass ``None`` with a master
    already configured, or ``yarn``/``k8s`` URLs.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    # Python workers unpickle Pandas-UDF closures by reference to this
    # package — make it importable for them regardless of the driver's
    # cwd. Local mode: PYTHONPATH inherited by worker processes; on a
    # real cluster ship the package via --py-files / pip instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
    builder = SparkSession.builder.appName(app_name).master(master)
    builder = builder.config("spark.executorEnv.PYTHONPATH",
                             os.environ["PYTHONPATH"])
    conf = dict(_DEFAULTS)
    conf["spark.driver.memory"] = _driver_memory_default()
    if extra_conf:
        conf.update(extra_conf)
    scratch = _local_scratch_default(master, conf)
    if scratch:
        os.makedirs(scratch, exist_ok=True)
        conf["spark.local.dir"] = scratch
        if os.path.basename(scratch) == str(os.getpid()):
            # default shm layout only (an explicit SPARK_GRAFT_LOCAL_DIR
            # is the caller's to manage): reclaim crashed runs' tmpfs
            _sweep_dead_scratch(scratch)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to a session we didn't build
    (e.g. the driver's). Only touches SQL confs that can change at
    runtime; silently skips any that can't."""
    for k, v in _DEFAULTS.items():
        if k.startswith("spark.sql."):
            try:
                spark.conf.set(k, v)
            except Exception:
                pass
    return spark
