"""Registry plumbing for the declared query surface.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered under a
stable name, optionally paired with an ANSI-SQL oracle string that DuckDB runs
on the same parquet tables (views ``region nation customer supplier part
orders lineitem events documents embeddings`` are pre-registered by the
driver). The driver compares row count + schema + order-insensitive value
hash, with result columns sorted by name — so every computed column is aliased
identically on both sides, float aggregates are rounded explicitly, and
timestamps are rendered as strings (engine-neutral).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` marks it non-SQL-expressible (the
    driver then records a weaker rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver table. ``events.ts`` is TIMESTAMP(NANOS) in parquet,
    which Spark's reader rejects outright (SPARK-40819); read it as raw
    nanos (legacy conf) and convert with exact integer division to
    microseconds — the same truncation DuckDB applies when it reads the
    nanos column into its microsecond timestamps."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _scratch_root() -> str:
    """Root for query scratch dirs. ``SPARK_GRAFT_TMPDIR`` overrides;
    otherwise prefer RAM-backed ``/dev/shm`` when present and writable —
    lifecycle fixtures are ephemeral by contract (recreated inside every
    run; nothing is reused across runs), so they belong on the fastest
    ephemeral storage the node has, exactly like shuffle scratch on a
    production node's local NVMe/tmpfs (guide §6: I/O layout). Measured
    ~80 ms saved per small parquet write vs the disk-backed default
    tempdir. Falls back to ``tempfile.gettempdir()``."""
    import os
    import tempfile

    env = os.environ.get("SPARK_GRAFT_TMPDIR")
    if env:
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        # tmpfs is typically capped at 50% of RAM; only prefer it when it
        # has real headroom (>= 4 GiB free), else large-SF fixtures could
        # hit ENOSPC or squeeze JVM memory where plain disk would not
        try:
            st = os.statvfs(shm)
            if st.f_bavail * st.f_frsize >= 4 << 30:
                return shm
        except OSError:
            pass
    return tempfile.gettempdir()


def query_tmp(prefix: str, salt: str, clean: bool = True) -> str:
    """Scratch dir for a format/round-trip query: pid-scoped (parallel
    test processes never collide) and salted by ``salt`` (callers pass
    the sf_dir so sf0.001 and sf0.01 runs in one session get distinct
    dirs, or a schema digest for plan-scoped dirs). ``clean=True``
    removes any leftover from a prior run in this process so
    re-registration is idempotent — the single cleanup contract for
    every site that used to hand-roll this. Lives under
    ``_scratch_root()`` (RAM-backed when available)."""
    import os
    import shutil

    path = os.path.join(
        _scratch_root(),
        f"evo_{prefix}_{os.getpid()}_{abs(hash(salt)) % 10**8}",
    )
    if clean and os.path.exists(path):
        shutil.rmtree(path)
    return path
