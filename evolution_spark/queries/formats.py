"""Sink-format round-trip queries: ORC and CSV (Spark-built-in targets the
reference has no analogue for — its only executable sink is Parquet,
crates/evolution-writer/src/parquet.rs:53-70, with Delta/Iceberg/IPC left as
``todo!()``, examples/full/src/cli.rs:205-207).

Each query writes a driver table through ``Converter``'s sink dispatch
surface (``df.write.orc`` / ``df.write.csv``), reads it back with an
explicit schema (single-pass, no inference scan), and aggregates — an
identity-through-roundtrip oracle: any type loss, encoding corruption, or
quoting bug in the sink/source pair breaks the value hash.

Scale notes: both writes are partition-parallel (one part file per task, no
coalesce); the read-back is a plain distributed scan. ORC round-trips the
exact logical types; CSV serializes timestamps/doubles to text, so the CSV
query asserts the textual codec (quoting, timestamp format, shortest-float)
is lossless for the driver schema.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from evolution_spark.queries.base import query, query_tmp, table


def _roundtrip(df, fmt: str, read_options: dict | None = None):
    """Write ``df`` to a temp dir in ``fmt``, read it back with the source
    schema. The temp dir persists until process exit (Spark reads lazily);
    repeated calls reuse one dir per format+plan to stay idempotent."""
    spark = df.sparkSession
    tmp = query_tmp(f"fmt_{fmt}", df.schema.json())
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(tmp)
    reader = spark.read.schema(df.schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in (read_options or {}).items():
        reader = reader.option(k, v)
    return getattr(reader, fmt)(tmp)


@query(
    "orc_roundtrip_customer",
    oracle="""
    SELECT c_nationkey AS nationkey,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents,
           MIN(c_name) AS min_name, MAX(c_name) AS max_name
    FROM customer GROUP BY c_nationkey
    """,
)
def orc_roundtrip_customer(spark, sf_dir):
    """customer -> ORC sink -> explicit-schema ORC source -> aggregate.

    ORC preserves the logical types exactly (BIGINT/INT/DOUBLE/VARCHAR), so
    the oracle is the same aggregate over the original parquet table."""
    c = table(spark, sf_dir, "customer")
    back = _roundtrip(c, "orc")
    return back.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias("acctbal_cents"),
        F.min("c_name").alias("min_name"),
        F.max("c_name").alias("max_name"),
    )


@query(
    "csv_roundtrip_orders",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS first_date,
           strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_date,
           MAX(o_orderstatus) AS max_status
    FROM orders GROUP BY o_orderpriority
    """,
)
def csv_roundtrip_orders(spark, sf_dir):
    """orders -> CSV sink (header, RFC-4180 quoting) -> explicit-schema CSV
    source -> aggregate. Exercises the text codec on every driver dtype:
    BIGINT, DOUBLE (shortest-repr round-trip), TIMESTAMP, VARCHAR."""
    o = table(spark, sf_dir, "orders")
    back = _roundtrip(o, "csv")
    return back.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("total_cents"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("first_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("last_date"),
        F.max("o_orderstatus").alias("max_status"),
    )


@query(
    "zorder_cluster_scan",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM lineitem
    WHERE l_orderkey % 10 < 3 AND l_partkey % 7 < 2
    GROUP BY l_returnflag
    """,
)
def zorder_cluster_scan(spark, sf_dir):
    """lineitem -> Z-order-clustered parquet on (l_orderkey, l_partkey) ->
    filtered scan -> aggregate; oracle runs the same predicate on the
    original table, so the clustering rewrite is proven lossless. The layout
    contract itself (tight 2-D footers, minority-overlap pruning) is proven
    from footers in test_converter.py::test_zorder_clustered_2d_skipping."""
    from evolution_spark.io import write_zorder_clustered

    li = table(spark, sf_dir, "lineitem")
    tmp = query_tmp("zorder", sf_dir)
    write_zorder_clustered(li, tmp, ["l_orderkey", "l_partkey"], n_files=8)
    back = spark.read.parquet(tmp)
    return (
        back.where((F.col("l_orderkey") % 10 < 3) & (F.col("l_partkey") % 7 < 2))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "price_cents"
            ),
        )
    )


@query(
    "incremental_partition_overwrite",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY 1, 2
    """,
)
def incremental_partition_overwrite(spark, sf_dir):
    """Daily-rollup maintenance via dynamic partition overwrite
    (io/partitioned.py): the initial load lands with the last two days
    PARTIAL (half the events — simulating an in-flight ingest), then the
    correction batch recomputes exactly those two days and dynamic-
    overwrites them. Only the stale partition directories are rewritten
    (proven file-by-file in test_converter.py); the final table equals a
    full recompute, which is what the oracle checks. At 100 TB the
    correction costs two days of data, not a table rewrite."""
    from evolution_spark.io.partitioned import overwrite_partitions, write_partitioned

    e = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))

    def rollup(df):
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )

    cutoff = e.agg(F.date_sub(F.max("day"), 1).alias("c")).first()["c"]
    tmp = query_tmp("dpo", sf_dir)
    stale = rollup(
        e.where(F.col("day") < cutoff).unionByName(
            e.where((F.col("day") >= cutoff) & (F.col("event_id") % 2 == 0))
        )
    )
    write_partitioned(stale, tmp, "day")
    correction = rollup(e.where(F.col("day") >= cutoff))
    overwrite_partitions(correction, tmp, "day")
    back = spark.read.parquet(tmp)
    return back.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
        "value_cents",
    )


@query(
    "schema_evolution_merge",
    oracle="""
    SELECT CASE WHEN event_id % 2 = 0 THEN 'unknown' ELSE event_type END
             AS event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY 1
    """,
)
def schema_evolution_merge(spark, sf_dir):
    """Schema evolution across partitions: an old load written WITHOUT the
    event_type column and a new load written WITH it read back as one
    table via mergeSchema — old rows surface NULL for the added column
    (coalesced to 'unknown'). The capability a long-lived 100 TB table
    needs to add columns without rewriting history; per-file footers keep
    the read a normal parallel scan (schema merge happens at planning,
    not per row)."""
    e = table(spark, sf_dir, "events")
    tmp = query_tmp("sev", sf_dir)
    old = e.where(F.col("event_id") % 2 == 0).select("event_id", "value")
    new = e.where(F.col("event_id") % 2 == 1).select("event_id", "value", "event_type")
    old.write.parquet(f"{tmp}/load=0")
    new.write.parquet(f"{tmp}/load=1")
    back = spark.read.option("mergeSchema", "true").parquet(tmp)
    return (
        back.groupBy(
            F.coalesce(F.col("event_type"), F.lit("unknown")).alias("event_type")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
    )


@query(
    "delta_roundtrip_customer",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM customer GROUP BY c_mktsegment
    """,
)
def delta_roundtrip_customer(spark, sf_dir):
    """customer -> native Delta snapshot (io/delta_log.py: distributed
    parquet data + spec-compliant _delta_log JSON commit, no connector
    jar) -> log-driven read (file list from the commit's add actions, not
    a directory listing) -> aggregate. Identity-through-roundtrip oracle:
    the reference declares a Delta target but leaves it todo!()
    (crates/evolution-target/src/target.rs:31-37); this is the executable
    write-side parity."""
    from evolution_spark.io.delta_log import read_delta_snapshot, write_delta_snapshot

    c = table(spark, sf_dir, "customer")
    tmp = query_tmp("delta", sf_dir)
    write_delta_snapshot(c, tmp, mode="overwrite")
    back = read_delta_snapshot(spark, tmp)
    return back.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias("acctbal_cents"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "avro_roundtrip_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM events GROUP BY event_type
    """,
)
def avro_roundtrip_events(spark, sf_dir):
    """events -> native Avro container sink (io/avro.py: pure-python
    codec, one file per partition, spec bytes cross-validated against the
    JVM's avro-core reader) -> distributed Avro source -> aggregate.
    Identity-through-roundtrip oracle over every driver dtype the events
    table carries (bigint, string, double, timestamp_ntz + nulls in
    session_id)."""
    from evolution_spark.io.avro import read_avro, write_avro

    e = table(spark, sf_dir, "events")
    tmp = query_tmp("avro", sf_dir)
    # rebalance before the file-per-partition sink (r15, guide §6 file
    # sizing): the single-row-group source scan is one partition, which
    # would serialize the whole Python encode into one file AND the
    # read-back decode into one task (the source parallelizes per file).
    # A round-robin spread to defaultParallelism is the standard pre-sink
    # rebalance; the roundtrip aggregate is placement-invariant.
    write_avro(e.repartition(spark.sparkContext.defaultParallelism), tmp)
    back = read_avro(spark, tmp, e.schema)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
    )


@query(
    "iceberg_roundtrip_supplier",
    oracle="""
    SELECT s_nationkey AS nationkey,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents,
           MIN(s_suppkey) AS min_key, MAX(s_suppkey) AS max_key
    FROM supplier GROUP BY s_nationkey
    """,
)
def iceberg_roundtrip_supplier(spark, sf_dir):
    """supplier -> native Iceberg v2 snapshot (io/iceberg_meta.py:
    distributed parquet data partitioned by s_nationkey + spec-compliant
    metadata.json / manifest-list / manifest Avro chain, no connector
    jar) -> metadata-driven read (file list replayed from the snapshot's
    manifests, not a directory listing; identity-partition values resolve
    from the hive paths) -> aggregate. Identity-through-roundtrip oracle:
    the reference declares an Iceberg target but leaves it todo!()
    (crates/evolution-target/src/target.rs:31-37,
    examples/iceberg/src/main.rs:28-30); this is the executable
    write-side parity. Grouping on the partition column makes any
    mis-parsed partition value or dropped data file break the hash."""
    from evolution_spark.io.iceberg_meta import read_iceberg_table, write_iceberg_table

    s = table(spark, sf_dir, "supplier")
    tmp = query_tmp("iceberg", sf_dir)
    write_iceberg_table(s, tmp, mode="overwrite", partition_by=["s_nationkey"])
    back = read_iceberg_table(spark, tmp)
    return back.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.round(F.col("s_acctbal") * 100).cast("bigint")).alias("acctbal_cents"),
        F.min("s_suppkey").alias("min_key"),
        F.max("s_suppkey").alias("max_key"),
    )


@query(
    "delta_time_travel",
    oracle="""
    SELECT 0 AS version, c_mktsegment AS segment, COUNT(*) AS n_customers,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM customer GROUP BY c_mktsegment
    UNION ALL
    SELECT 1, c_mktsegment, COUNT(*), MIN(c_custkey), MAX(c_custkey)
    FROM customer WHERE c_mktsegment = 'AUTOMOBILE' GROUP BY c_mktsegment
    UNION ALL
    SELECT 2, c_mktsegment, COUNT(*), MIN(c_custkey), MAX(c_custkey)
    FROM customer WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    GROUP BY c_mktsegment
    """,
)
def delta_time_travel(spark, sf_dir):
    """Delta time travel on the native log writer (io/delta_log.py):
    version 0 = full customer snapshot, version 1 = OVERWRITE with only the
    AUTOMOBILE segment (remove+add actions — old files logically deleted,
    physically retained), version 2 = APPEND of the BUILDING segment. Each
    version is then read back BY REPLAYING THE LOG through that commit and
    aggregated — proving historical versions stay readable after
    overwrites, the core Delta reproducibility guarantee (a training run
    can pin the exact corpus version it saw). The oracle states each
    version's expected contents directly against the source table."""
    from evolution_spark.io.delta_log import (
        commit_delta,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer")
    tmp = query_tmp("delta_tt", sf_dir)
    write_delta_snapshot(c, tmp)
    commit_delta(c.where(F.col("c_mktsegment") == "AUTOMOBILE"), tmp, mode="overwrite")
    commit_delta(c.where(F.col("c_mktsegment") == "BUILDING"), tmp, mode="append")

    out = None
    for v in (0, 1, 2):
        snap = read_delta_snapshot(spark, tmp, version=v)
        agg = snap.groupBy(F.col("c_mktsegment").alias("segment")).agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        ).select(F.lit(v).alias("version"), "segment", "n_customers", "min_key", "max_key")
        out = agg if out is None else out.unionByName(agg)
    return out


@query(
    "delta_merge_cdc",
    oracle="""
    WITH merged AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS bal
      FROM customer WHERE c_custkey % 10 != 5
      UNION ALL
      SELECT c_custkey + 1000000, c_mktsegment, 0.0
      FROM customer WHERE c_custkey < 5
    )
    SELECT c_mktsegment AS segment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(ROUND(bal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM merged GROUP BY c_mktsegment
    """,
)
def delta_merge_cdc(spark, sf_dir):
    """MERGE INTO the native Delta table from a CDC change set
    (io/delta_log.merge_delta_cdc): updates (+100 to every 10th key),
    deletes (every key ending in 5), and inserts (5 new high keys) land as
    ONE new commit via a full-outer key join; the pre-merge snapshot stays
    time-travel readable. The oracle restates the post-merge table
    directly against the source. At 100 TB the join shuffles only once on
    the key, and the logged per-file stats enable the standard refinement
    of rewriting only files whose key range intersects the change set."""
    from evolution_spark.io.delta_log import (
        merge_delta_cdc,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tmp = query_tmp("delta_mrg", sf_dir)
    write_delta_snapshot(c, tmp)

    updates = c.where(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("u").alias("_op"),
    )
    deletes = c.where(F.col("c_custkey") % 10 == 5).select(
        "c_custkey", "c_mktsegment", "c_acctbal", F.lit("d").alias("_op")
    )
    inserts = c.where(F.col("c_custkey") < 5).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        "c_mktsegment",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("u").alias("_op"),
    )
    merge_delta_cdc(
        spark, tmp, updates.unionByName(deletes).unionByName(inserts), key="c_custkey"
    )
    back = read_delta_snapshot(spark, tmp)  # latest = post-merge
    return back.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias("acctbal_cents"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "iceberg_append_time_travel",
    oracle="""
    SELECT 0 AS snap, COUNT(*) AS n_rows,
           CAST(SUM(s_suppkey) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM supplier
    UNION ALL
    SELECT 1, COUNT(*), CAST(SUM(s_suppkey) AS BIGINT),
           CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT)
    FROM (
      SELECT s_suppkey, s_acctbal FROM supplier
      UNION ALL
      SELECT s_suppkey, s_acctbal FROM supplier WHERE s_nationkey < 5
    )
    """,
)
def iceberg_append_time_travel(spark, sf_dir):
    """Iceberg multi-snapshot append + snapshot-id time travel on the
    native v2 writer (io/iceberg_meta.py): snapshot 0 = full supplier
    table; snapshot 1 = APPEND of the nationkey<5 rows (new manifest +
    manifest list reusing snapshot 0's manifests BY REFERENCE — appends
    never rewrite old metadata; the version-hint swap is the atomic
    commit). Both snapshots are then read back by id and aggregated; the
    oracle restates each snapshot's contents against the source table.
    The Iceberg twin of ``delta_time_travel``."""
    from evolution_spark.io.iceberg_meta import (
        append_iceberg_snapshot,
        read_iceberg_table,
        write_iceberg_table,
    )

    s = table(spark, sf_dir, "supplier")
    tmp = query_tmp("ice_tt", sf_dir)
    s0 = write_iceberg_table(s, tmp)
    append_iceberg_snapshot(s.where(F.col("s_nationkey") < 5), tmp)

    out = None
    for snap, sid in ((0, s0["snapshot-id"]), (1, None)):
        df = read_iceberg_table(spark, tmp, snapshot_id=sid)
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("s_suppkey").alias("key_sum"),
            F.sum(F.round(F.col("s_acctbal") * 100).cast("bigint")).alias("bal_cents"),
        ).select(F.lit(snap).alias("snap"), "n_rows", "key_sum", "bal_cents")
        out = agg if out is None else out.unionByName(agg)
    return out


@query(
    "delta_maintenance_lifecycle",
    oracle="""
    SELECT o_orderpriority AS priority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def delta_maintenance_lifecycle(spark, sf_dir):
    """The full Delta small-files lifecycle as one checked pipeline:
    4 fragmented appends (the streaming-sink shape) -> OPTIMIZE compaction
    (replace commit) -> log CHECKPOINT (+_last_checkpoint) -> VACUUM of the
    pre-compaction files -> read the final table THROUGH the checkpoint
    path and aggregate. The oracle states the expected contents directly
    against the source, so every maintenance step is value-checked: a
    row lost in compaction, a live file vacuumed, or a checkpoint that
    replays wrong all fail the hash."""
    from evolution_spark.io.delta_log import (
        checkpoint_delta,
        commit_delta,
        optimize_delta,
        read_delta_snapshot,
        vacuum_delta,
        write_delta_snapshot,
    )

    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    tmp = query_tmp("delta_life", sf_dir)
    # fragmented ingestion: 4 hash-sliced appends, several files each
    write_delta_snapshot(o.where(F.col("o_orderkey") % 4 == 0).repartition(3), tmp)
    for m in (1, 2, 3):
        commit_delta(
            o.where(F.col("o_orderkey") % 4 == m).repartition(3), tmp, mode="append"
        )
    optimize_delta(spark, tmp, target_files=2)
    checkpoint_delta(tmp)
    vacuum_delta(tmp, keep_versions=1)
    back = read_delta_snapshot(spark, tmp)  # resolves via the checkpoint
    return back.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("price_cents"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "delta_skipping_scan",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderkey BETWEEN 500 AND 700
    ORDER BY o_orderkey
    """,
)
def delta_skipping_scan(spark, sf_dir):
    """orders -> range-clustered Delta commits (one per o_orderkey band) ->
    needle-range read through stats-based FILE skipping (add-action
    minValues/maxValues decide which files can match BEFORE Spark lists
    them) -> same rows as the plain predicate on the source table, proving
    the skip is lossless. At 100 TB this is the difference between
    touching O(needle) files and opening O(table) parquet footers; the
    pruning contract itself (file counts per predicate) is pinned in
    test_converter.py::test_delta_read_data_skipping."""
    from evolution_spark.io.delta_log import (
        commit_delta,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    tmp = query_tmp("deltaskip", sf_dir)
    n = o.agg(F.max("o_orderkey")).collect()[0][0]
    band = max(1, (int(n) + 1) // 4)
    write_delta_snapshot(
        o.where(F.col("o_orderkey") < band).coalesce(1), tmp
    )
    for i in range(1, 4):
        lo = F.col("o_orderkey") >= i * band
        # the LAST band is unbounded above: (n+1)//4 truncates, so a
        # capped final band would silently drop the max-key rows and the
        # "lossless" claim vs the source-table oracle would be false
        cond = lo if i == 3 else lo & (F.col("o_orderkey") < (i + 1) * band)
        commit_delta(o.where(cond).coalesce(1), tmp, mode="append")
    back = read_delta_snapshot(
        spark, tmp, skip_where=[("o_orderkey", ">=", 500), ("o_orderkey", "<=", 700)]
    )
    return (
        back.where(F.col("o_orderkey").between(500, 700))
        .select(
            "o_orderkey", F.round("o_totalprice", 2).alias("total")
        )
        .orderBy("o_orderkey")
    )


@query(
    "ipc_roundtrip_nation",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey
    """,
)
def ipc_roundtrip_nation(spark, sf_dir):
    """nation -> Arrow IPC container files (io/ipc.py, distributed
    mapInArrow write: one file per partition, zero-copy Arrow both sides)
    -> distributed IPC read -> identity oracle, proving the IPC target the
    reference declares but never shipped (target.rs:31-37) round-trips
    losslessly."""
    from evolution_spark.io.ipc import read_ipc, write_ipc

    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    tmp = query_tmp("ipc", sf_dir)
    write_ipc(n, tmp)
    back = read_ipc(spark, tmp, n.schema)
    return back.orderBy("n_nationkey")


@query(
    "iceberg_maintenance_lifecycle",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id
    FROM events GROUP BY event_type
    """,
)
def iceberg_maintenance_lifecycle(spark, sf_dir):
    """The Iceberg small-files lifecycle as one checked pipeline:
    fragmented initial write + 3 appends -> COMPACTION (replace snapshot)
    -> EXPIRE of the superseded snapshots -> read the surviving snapshot
    and aggregate. The oracle states the expected contents directly
    against the source, so a row lost in the rewrite, a live file expired,
    or a manifest-list chain broken by the replace all fail the hash."""
    from evolution_spark.io.iceberg_meta import (
        append_iceberg_snapshot,
        compact_iceberg_table,
        expire_iceberg_snapshots,
        read_iceberg_table,
        write_iceberg_table,
    )

    e = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    tmp = query_tmp("ice_life", sf_dir)
    write_iceberg_table(e.where(F.col("event_id") % 4 == 0).repartition(3), tmp)
    for m in (1, 2, 3):
        append_iceberg_snapshot(
            e.where(F.col("event_id") % 4 == m).repartition(3), tmp
        )
    compact_iceberg_table(spark, tmp, target_files=2)
    expire_iceberg_snapshots(tmp, keep_last=1)
    back = read_iceberg_table(spark, tmp)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


@query(
    "delta_deletion_vector_read",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_alive,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM customer WHERE c_custkey % 7 <> 0
    GROUP BY c_mktsegment
    """,
)
def delta_deletion_vector_read(spark, sf_dir):
    """READ a Delta table bearing deletion vectors the way a DV-enabled
    foreign writer (e.g. a Databricks DELETE, where DVs are on by default)
    leaves it: customer lands as a single sorted file under a reader-v3
    ``deletionVectors`` protocol, then a DELETE commit pairs a remove with
    an add carrying a roaring-bitmap DV file (io/deletion_vectors.py, per
    Delta PROTOCOL.md) marking every ``c_custkey % 7 == 0`` row position.
    ``read_delta_snapshot`` decodes the DV driver-side (compressed bitmap —
    metadata-sized) and drops the positions via a broadcast anti-join on
    ``_metadata.file_path``/``row_index`` — JVM-side, cost ~ deleted rows,
    never table size. The oracle states the survivors straight from the
    source table, so one resurrected or over-deleted row fails the hash.
    The reference refuses DV tables (its Delta example is a ``todo!()`` —
    examples/delta/src/main.rs:28-30); this exceeds it."""
    import json
    import uuid
    from pathlib import Path

    from evolution_spark.io.delta_log import read_delta_snapshot
    from evolution_spark.io.deletion_vectors import write_dv_file

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tmp = Path(query_tmp("deltadv", sf_dir))
    tmp.mkdir(parents=True, exist_ok=True)
    # one sorted file -> position i == i-th smallest custkey (deterministic)
    c.orderBy("c_custkey").coalesce(1).write.mode("overwrite").parquet(
        str(tmp / "_stage")
    )
    name = f"part-00000-{uuid.uuid4().hex}.parquet"
    import os

    src = next((tmp / "_stage").glob("*.parquet"))
    os.replace(src, tmp / name)
    log = tmp / "_delta_log"
    log.mkdir(exist_ok=True)
    v0 = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": str(uuid.uuid4()), "format": {"provider": "parquet"},
                      "schemaString": c.schema.json(), "partitionColumns": [],
                      "configuration": {}, "createdTime": 0}},
        {"add": {"path": name, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    (log / f"{0:020d}.json").write_text(
        "".join(json.dumps(a) + "\n" for a in v0)
    )
    # deleted positions = sorted ranks of the matching keys (collect is the
    # deleted-row set a DELETE materializes anyway — not a table collect)
    from pyspark.sql import Window

    pos = (
        c.select(
            (F.row_number().over(Window.orderBy("c_custkey")) - 1).alias("p"),
            "c_custkey",
        )
        .where(F.col("c_custkey") % 7 == 0)
        .collect()
    )
    desc = write_dv_file(tmp, [r.p for r in pos])
    v1 = [
        {"remove": {"path": name, "deletionTimestamp": 1, "dataChange": True}},
        {"add": {"path": name, "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True,
                 "deletionVector": desc}},
    ]
    (log / f"{1:020d}.json").write_text(
        "".join(json.dumps(a) + "\n" for a in v1)
    )
    back = read_delta_snapshot(spark, str(tmp))
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "acctbal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "iceberg_position_delete_scan",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_alive,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM customer WHERE c_custkey % 5 <> 0
    GROUP BY c_mktsegment
    """,
)
def iceberg_position_delete_scan(spark, sf_dir):
    """Iceberg v2 merge-on-read: customer becomes a native Iceberg table,
    a DELETE snapshot tracks a POSITION delete file (plain parquet
    ``(file_path, pos)`` rows in a content=1 manifest — Iceberg spec
    "Position Delete Files") for every ``c_custkey % 5 == 0`` row, and the
    scan drops those rows via a broadcast anti-join on the file/row-index
    metadata columns — no rewrite of the data files. The delete positions
    come from the scan metadata exactly as an engine's DELETE would compute
    them. Oracle = the survivors from the source table; the reference's
    iceberg example is a ``todo!()`` (examples/iceberg/src/main.rs:28-30)."""
    from evolution_spark.io.iceberg_meta import (
        append_position_deletes,
        read_iceberg_table,
        write_iceberg_table,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tmp = query_tmp("iceposdel", sf_dir)
    write_iceberg_table(c.repartition(4), tmp)
    dels = (
        spark.read.option("pathGlobFilter", "part-*")
        .parquet(f"{tmp}/data")
        .where(F.col("c_custkey") % 5 == 0)
        .select(
            F.regexp_replace(
                F.col("_metadata.file_path"), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"
            ).alias("fp"),
            F.col("_metadata.row_index").alias("ri"),
        )
        .collect()
    )
    append_position_deletes(tmp, [(r.fp, r.ri) for r in dels])
    back = read_iceberg_table(spark, tmp)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "acctbal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "delta_add_column_evolution",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN c_custkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_legacy,
           CAST(SUM(CASE WHEN c_custkey % 2 = 0
                         THEN CAST(ROUND(c_acctbal * 100) AS BIGINT) END)
                AS BIGINT) AS acct_cents
    FROM customer GROUP BY c_mktsegment
    """,
)
def delta_add_column_evolution(spark, sf_dir):
    """ADD COLUMN schema evolution on the native Delta writer, round-trip
    checked: half of customer lands under the ORIGINAL two-column schema,
    a metadata-only ADD COLUMNS commit widens it (evolve_delta_schema —
    no data file rewritten, O(1) at any table size), and the other half
    appends WITH the new column. The read resolves both file generations
    against the evolved schema — legacy files scan as null — and the
    oracle pins exactly which rows must be null vs populated, so a
    mis-filled column on either side of the evolution fails the hash."""
    from pyspark.sql import types as T

    from evolution_spark.io.delta_log import (
        commit_delta,
        evolve_delta_schema,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer")
    tmp = query_tmp("deltaevo", sf_dir)
    old = c.where(F.col("c_custkey") % 2 == 1).select("c_custkey", "c_mktsegment")
    write_delta_snapshot(old, tmp)
    evolve_delta_schema(tmp, [("acct_cents", T.LongType())])
    new = c.where(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("acct_cents"),
    )
    commit_delta(new, tmp, mode="append")
    back = read_delta_snapshot(spark, tmp)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("acct_cents").isNull().cast("long")).cast("bigint").alias("n_legacy"),
        F.sum("acct_cents").cast("bigint").alias("acct_cents"),
    )


@query(
    "iceberg_add_column_evolution",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN c_custkey % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_legacy,
           CAST(SUM(CASE WHEN c_custkey % 3 = 0
                         THEN CAST(ROUND(c_acctbal * 100) AS BIGINT) END)
                AS BIGINT) AS acct_cents
    FROM customer GROUP BY c_mktsegment
    """,
)
def iceberg_add_column_evolution(spark, sf_dir):
    """The Iceberg twin of delta_add_column_evolution: the widened schema
    gets FRESH field-ids under a new schema-id (evolve_iceberg_schema —
    the spec's never-reuse-ids invariant), the name-mapping grows with
    them, and an evolved append lands beside the legacy snapshot's files.
    The scan resolves both generations (legacy rows null in the added
    column); time travel keeps reading each snapshot under its own
    recorded schema-id (pinned in tests/test_schema_evolution.py)."""
    from evolution_spark.io.iceberg_meta import (
        append_iceberg_snapshot,
        evolve_iceberg_schema,
        read_iceberg_table,
        write_iceberg_table,
    )

    c = table(spark, sf_dir, "customer")
    tmp = query_tmp("iceevo", sf_dir)
    old = c.where(F.col("c_custkey") % 3 != 0).select("c_custkey", "c_mktsegment")
    write_iceberg_table(old, tmp)
    evolve_iceberg_schema(tmp, [("acct_cents", "long")])
    new = c.where(F.col("c_custkey") % 3 == 0).select(
        "c_custkey", "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("acct_cents"),
    )
    append_iceberg_snapshot(new, tmp)
    back = read_iceberg_table(spark, tmp)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("acct_cents").isNull().cast("long")).cast("bigint").alias("n_legacy"),
        F.sum("acct_cents").cast("bigint").alias("acct_cents"),
    )


@query(
    "delta_mor_delete_lifecycle",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_alive,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM customer
    WHERE NOT (c_acctbal < 0) AND NOT (c_custkey % 11 = 0)
    GROUP BY c_mktsegment
    """,
)
def delta_mor_delete_lifecycle(spark, sf_dir):
    """Merge-on-read DELETE on the native Delta writer, full lifecycle:
    customer lands as a plain v1/v2 table, then TWO ``delete_delta_rows``
    calls (negative balances, then every 11th key) mark rows deleted via
    deletion vectors — the first upgrades the protocol to reader-3/
    writer-7 with the deletionVectors feature in the same commit, the
    second supersedes the first file DVs with union bitmaps, and no data
    file is rewritten at any point. OPTIMIZE then materializes the deletes
    (its rewrite reads through the DVs), and the post-compaction read must
    still equal the oracle's survivor set — one resurrected or
    over-deleted row anywhere in delete-scan, bitmap union, or compaction
    fails the hash."""
    from evolution_spark.io.delta_log import (
        delete_delta_rows,
        optimize_delta,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tmp = query_tmp("deltamor", sf_dir)
    write_delta_snapshot(c.repartition(4), tmp)
    delete_delta_rows(spark, tmp, "c_acctbal < 0")
    delete_delta_rows(spark, tmp, "c_custkey % 11 = 0")
    optimize_delta(spark, tmp, target_files=2)
    back = read_delta_snapshot(spark, tmp)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "acctbal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "delta_column_mapping_read",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM customer GROUP BY c_mktsegment
    """,
)
def delta_column_mapping_read(spark, sf_dir):
    """READ a column-mapped Delta table (``delta.columnMapping.mode=name``,
    the other Databricks-default feature besides DVs — enabled by any
    RENAME/DROP COLUMN): the parquet files store PHYSICAL ``col-<hex>``
    names, the Delta schema maps them to logical names via field metadata,
    and ``read_delta_snapshot`` scans under the physical schema then
    aliases back — so the result carries the logical customer columns with
    exact values, hash-checked against the source table. The table is
    built foreign-style here: physical-named files + a hand-written
    reader-v3 log with the columnMapping feature."""
    import json
    import os
    import uuid
    from pathlib import Path

    from evolution_spark.io.delta_log import read_delta_snapshot

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tmp = Path(query_tmp("deltacmap", sf_dir))
    tmp.mkdir(parents=True, exist_ok=True)
    phys = {c_name: f"col-{i}{uuid.uuid4().hex[:6]}"
            for i, c_name in enumerate(c.columns)}
    c.select(*[F.col(n).alias(p) for n, p in phys.items()]).repartition(
        3
    ).write.mode("overwrite").parquet(str(tmp / "_stage"))
    adds = []
    for src in sorted((tmp / "_stage").glob("*.parquet")):
        name = f"part-{uuid.uuid4().hex}.parquet"
        os.replace(src, tmp / name)
        adds.append({"add": {"path": name, "partitionValues": {}, "size": 1,
                             "modificationTime": 0, "dataChange": True}})
    types = {"c_custkey": "long", "c_mktsegment": "string",
             "c_acctbal": "double"}
    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": n, "type": types[n], "nullable": True,
             "metadata": {"delta.columnMapping.id": i + 1,
                          "delta.columnMapping.physicalName": phys[n]}}
            for i, n in enumerate(c.columns)
        ],
    })
    v0 = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping"]}},
        {"metaData": {"id": str(uuid.uuid4()), "format": {"provider": "parquet"},
                      "schemaString": schema_string, "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "name"},
                      "createdTime": 0}},
    ] + adds
    log = tmp / "_delta_log"
    log.mkdir(exist_ok=True)
    (log / f"{0:020d}.json").write_text(
        "".join(json.dumps(a) + "\n" for a in v0)
    )
    back = read_delta_snapshot(spark, str(tmp))
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "acctbal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "delta_cdf_changes",
    oracle="""
    SELECT 'insert' AS change_type, c_mktsegment,
           COUNT(*) AS n_rows, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer WHERE c_custkey % 2 = 0 GROUP BY c_mktsegment
    UNION ALL
    SELECT 'delete' AS change_type, c_mktsegment,
           COUNT(*) AS n_rows, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer WHERE c_custkey % 7 = 0 GROUP BY c_mktsegment
    """,
)
def delta_cdf_changes(spark, sf_dir):
    """Change-data-feed consumption from the native Delta log: customer
    lands in two generations (odd keys at v0, even keys appended at v1),
    then a merge-on-read DELETE (every 7th key) at v2 — and
    ``table_changes(spark, path, 1)`` recovers exactly what a downstream
    incremental consumer must apply: the v1 inserts (even keys) and the
    v2 deletes (every 7th key, emitted from the DV bitmap diff without
    any CDF sidecar files). The oracle restates both change sets straight
    from the source table, so a missed or phantom change row fails the
    hash. Scale: log parse + DV decode are driver-side metadata; row
    recovery scans only the touched files with broadcast position
    joins."""
    from evolution_spark.io.delta_log import (
        commit_delta,
        delete_delta_rows,
        table_changes,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    tmp = query_tmp("deltacdf", sf_dir)
    write_delta_snapshot(c.where(F.col("c_custkey") % 2 == 1), tmp)  # v0
    commit_delta(c.where(F.col("c_custkey") % 2 == 0), tmp, mode="append")  # v1
    delete_delta_rows(spark, tmp, "c_custkey % 7 = 0")  # v2
    ch = table_changes(spark, tmp, 1)
    return ch.groupBy(
        F.col("_change_type").alias("change_type"), "c_mktsegment"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
    )


@query(
    "delta_python_source_read",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_alive,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM customer WHERE c_custkey % 13 <> 0
    GROUP BY c_mktsegment
    """,
)
def delta_python_source_read(spark, sf_dir):
    """The native Delta reader as a REAL Spark data source (PySpark 4
    Python DataSource API): customer lands as a multi-file table, a
    merge-on-read DELETE marks every 13th key via deletion vectors, and
    the read goes through ``spark.read.format("evolution_delta")`` — Spark
    plans one input partition per live file, and each EXECUTOR masks its
    own file's DV positions out of the Arrow batches directly (no join at
    all — compare the anti-join plan of delta_deletion_vector_read).
    The oracle pins the survivor set, so a mis-masked position in any
    file's batch stream fails the hash. This is the source-integration
    shape the reference's ``todo!()`` targets imply
    (crates/evolution-target/src/target.rs:31-37)."""
    from evolution_spark.io.delta_log import delete_delta_rows, write_delta_snapshot
    from evolution_spark.io.delta_source import register_delta_source

    register_delta_source(spark)
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tmp = query_tmp("deltapysrc", sf_dir)
    write_delta_snapshot(c.repartition(4), tmp)
    delete_delta_rows(spark, tmp, "c_custkey % 13 = 0")
    back = spark.read.format("evolution_delta").load(tmp)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "acctbal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "delta_mor_update_lifecycle",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_alive,
           CAST(SUM(CAST(ROUND(
             (CASE WHEN c_mktsegment = 'BUILDING'
                   THEN c_acctbal + 10 ELSE c_acctbal END) * 100
           ) AS BIGINT)) AS BIGINT) AS acctbal_cents,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM customer WHERE c_custkey % 9 <> 0
    GROUP BY c_mktsegment
    """,
)
def delta_mor_update_lifecycle(spark, sf_dir):
    """Merge-on-read UPDATE completing the native Delta DML trio: one
    ATOMIC commit marks the old row versions deleted via deletion vectors
    and appends the updated copies (here: +10 to every BUILDING balance),
    then a merge-on-read DELETE drops every 9th key — no data file is
    rewritten at any point. The oracle restates the surviving rows with
    the CASE-adjusted balances from the source table, so a lost update, a
    double-applied update (old row resurrecting beside its copy), or an
    over-delete all fail the hash."""
    from evolution_spark.io.delta_log import (
        delete_delta_rows,
        read_delta_snapshot,
        update_delta_rows,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tmp = query_tmp("deltamorupd", sf_dir)
    write_delta_snapshot(c.repartition(4), tmp)
    update_delta_rows(
        spark, tmp, "c_mktsegment = 'BUILDING'", {"c_acctbal": "c_acctbal + 10"}
    )
    delete_delta_rows(spark, tmp, "c_custkey % 9 = 0")
    back = read_delta_snapshot(spark, tmp)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "acctbal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "iceberg_cdc_changes",
    oracle="""
    SELECT 'insert' AS change_type, c_mktsegment,
           COUNT(*) AS n_rows, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer WHERE c_custkey % 2 = 0 GROUP BY c_mktsegment
    UNION ALL
    SELECT 'delete' AS change_type, c_mktsegment,
           COUNT(*) AS n_rows, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer WHERE c_custkey % 13 = 0 GROUP BY c_mktsegment
    """,
)
def iceberg_cdc_changes(spark, sf_dir):
    """Incremental change consumption from native Iceberg metadata (the
    delta_cdf_changes twin): odd keys land at the initial snapshot, even
    keys in an append, every 13th key in a position-delete snapshot — and
    ``iceberg_table_changes(after_snapshot_id=initial)`` recovers exactly
    the insert/delete sets a downstream consumer must apply, with delete
    rows rebuilt by joining the delete file's (file, pos) pairs against
    the data files' row indexes. Oracle restates both change sets from
    the source table."""
    from evolution_spark.io.iceberg_meta import (
        append_iceberg_snapshot,
        append_position_deletes,
        iceberg_table_changes,
        write_iceberg_table,
    )

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    tmp = query_tmp("icecdc", sf_dir)
    s0 = write_iceberg_table(c.where(F.col("c_custkey") % 2 == 1), tmp)
    append_iceberg_snapshot(c.where(F.col("c_custkey") % 2 == 0), tmp)
    dels = (
        spark.read.option("pathGlobFilter", "part-*")
        .parquet(f"{tmp}/data")
        .where(F.col("c_custkey") % 13 == 0)
        .select(
            F.regexp_replace(
                F.col("_metadata.file_path"), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"
            ).alias("fp"),
            F.col("_metadata.row_index").alias("ri"),
        )
        .collect()
    )
    append_position_deletes(tmp, [(r.fp, r.ri) for r in dels])
    ch = iceberg_table_changes(spark, tmp, after_snapshot_id=s0["snapshot-id"])
    return ch.groupBy(
        F.col("_change_type").alias("change_type"), "c_mktsegment"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
    )


@query(
    "iceberg_python_source_read",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_alive,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM customer WHERE c_custkey % 17 <> 0
    GROUP BY c_mktsegment
    """,
)
def iceberg_python_source_read(spark, sf_dir):
    """The native Iceberg reader as a REAL Spark data source (the
    evolution_delta twin): customer becomes a multi-file Iceberg table
    with a position-delete snapshot marking every 17th key, and the read
    goes through ``spark.read.format("evolution_iceberg")`` — one input
    partition per data file, each executor masking its own file's delete
    positions out of the Arrow batches (delete files grouped per target
    file driver-side, shipped as compact roaring bitmaps). Oracle pins the
    survivor set at three scales."""
    from evolution_spark.io.iceberg_meta import (
        append_position_deletes,
        write_iceberg_table,
    )
    from evolution_spark.io.iceberg_source import register_iceberg_source

    register_iceberg_source(spark)
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tmp = query_tmp("icepysrc", sf_dir)
    write_iceberg_table(c.repartition(4), tmp)
    dels = (
        spark.read.option("pathGlobFilter", "part-*")
        .parquet(f"{tmp}/data")
        .where(F.col("c_custkey") % 17 == 0)
        .select(
            F.regexp_replace(
                F.col("_metadata.file_path"), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"
            ).alias("fp"),
            F.col("_metadata.row_index").alias("ri"),
        )
        .collect()
    )
    append_position_deletes(tmp, [(r.fp, r.ri) for r in dels])
    back = spark.read.format("evolution_iceberg").load(tmp)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "acctbal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "iceberg_python_source_write",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def iceberg_python_source_write(spark, sf_dir):
    """The WRITE side of the ``evolution_iceberg`` data source — the
    capability the reference's Iceberg target declares and leaves as a
    ``todo!()`` (examples/iceberg/src/main.rs:28-30): odd customer keys
    land via the library writer, even keys flow through
    ``df.write.format("evolution_iceberg").mode("append")`` — executor
    tasks stage parquet shards, the driver commit publishes them as ONE
    atomic append snapshot through the same manifest/metadata core the
    DataFrame path uses. Reading the union back through the source and
    matching the full-table oracle proves the sink's snapshot carries
    every shard exactly once (a dropped or double-moved shard fails the
    hash). Scale: shard writes are distributed; the commit is
    metadata-sized (one manifest entry per shard)."""
    from evolution_spark.io.iceberg_meta import write_iceberg_table
    from evolution_spark.io.iceberg_source import register_iceberg_source

    register_iceberg_source(spark)
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tmp = query_tmp("icepysink", sf_dir)
    write_iceberg_table(c.where(F.col("c_custkey") % 2 == 1), tmp)
    c.where(F.col("c_custkey") % 2 == 0).repartition(4).write.format(
        "evolution_iceberg"
    ).mode("append").save(tmp)
    back = spark.read.format("evolution_iceberg").load(tmp)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "acctbal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "delta_rename_drop_time_travel",
    oracle="""
    SELECT 'latest' AS snapshot, COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(balance * 100) AS BIGINT)) AS BIGINT)
             AS balance_cents,
           CAST(0 AS BIGINT) AS n_segments,
           MIN(k) AS min_key, MAX(k) AS max_key
    FROM (
      SELECT c_custkey AS k, c_acctbal AS balance FROM customer
      UNION ALL
      SELECT c_custkey + 10000000, c_acctbal + 5
      FROM customer WHERE c_custkey % 4 = 0
    )
    UNION ALL
    SELECT 'v0', COUNT(*),
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT),
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
           MIN(c_custkey), MAX(c_custkey)
    FROM customer
    """,
)
def delta_rename_drop_time_travel(spark, sf_dir):
    """Column-mapping WRITE + metadata-only RENAME/DROP COLUMN, round
    tripped through time travel: customer lands as a NAME-mapped table
    (files store ``col-<hex>`` physical names), ``c_acctbal`` is renamed
    to ``balance`` (metadata-only — the physical name pins the stored
    data), an append lands under the NEW logical name, and
    ``c_mktsegment`` is dropped. The result unions the LATEST read
    (renamed column over old+new files, dropped column gone) with a
    time-travel read of VERSION 0 (old names, dropped column still
    readable) — so a mis-resolved physical column, a lost append, or a
    resurrected dropped column in either schema epoch fails the hash.
    Scale: rename/drop are O(1) metadata commits regardless of table
    size — the point of column mapping at 100 TB."""
    from evolution_spark.io.delta_log import (
        commit_delta,
        drop_delta_column,
        read_delta_snapshot,
        rename_delta_column,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tmp = query_tmp("deltarename", sf_dir)
    write_delta_snapshot(c, tmp, column_mapping=True)             # v0
    rename_delta_column(tmp, "c_acctbal", "balance")              # v1
    commit_delta(                                                 # v2
        c.where(F.col("c_custkey") % 4 == 0).select(
            (F.col("c_custkey") + 10000000).alias("c_custkey"),
            F.col("c_mktsegment"),
            (F.col("c_acctbal") + 5).alias("balance"),
        ),
        tmp, mode="append",
    )
    drop_delta_column(tmp, "c_mktsegment")                        # v3
    latest = read_delta_snapshot(spark, tmp).agg(
        F.lit("latest").alias("snapshot"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("balance") * 100).cast("bigint")).alias(
            "balance_cents"
        ),
        F.lit(0).cast("bigint").alias("n_segments"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )
    v0 = read_delta_snapshot(spark, tmp, version=0).agg(
        F.lit("v0").alias("snapshot"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "balance_cents"
        ),
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )
    return latest.unionByName(v0)


@query(
    "iceberg_rename_widen_time_travel",
    oracle="""
    SELECT 'latest' AS snapshot, COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(balance * 100) AS BIGINT)) AS BIGINT)
             AS balance_cents,
           MIN(k) AS min_key, MAX(k) AS max_key
    FROM (
      SELECT c_custkey AS k, c_acctbal AS balance FROM customer
      UNION ALL
      SELECT c_custkey + 10000000, c_acctbal + 5
      FROM customer WHERE c_custkey % 4 = 0
    )
    UNION ALL
    SELECT 'v0', COUNT(*),
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT),
           MIN(c_custkey), MAX(c_custkey)
    FROM customer
    """,
)
def iceberg_rename_widen_time_travel(spark, sf_dir):
    """Iceberg RENAME + type-widen evolution round-tripped through time
    travel (the ``delta_rename_drop_time_travel`` twin, on field-id
    stability instead of physical names): customer lands with an INT key,
    ``c_acctbal`` is renamed to ``balance`` and the key widened to LONG
    (both metadata-only — no file rewritten), then an append lands under
    the NEW schema. The LATEST read realigns the pre-evolution files by
    field id (old name aliased, int upcast) and unions them with the new
    epoch; the snapshot-1 time-travel read shows the ORIGINAL names and
    the narrow key. A mis-aliased column, a lost upcast, or a rename
    applied to the historical snapshot fails the hash. Scale: evolution
    is O(1) metadata regardless of table size."""
    from evolution_spark.io.iceberg_meta import (
        _load_metadata,
        append_iceberg_snapshot,
        read_iceberg_table,
        rename_iceberg_column,
        widen_iceberg_column,
        write_iceberg_table,
    )
    from pathlib import Path as _P

    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("int").alias("c_custkey"),
        "c_acctbal",
    )
    tmp = query_tmp("icerename", sf_dir)
    write_iceberg_table(c, tmp)                                    # snap 1
    rename_iceberg_column(tmp, "c_acctbal", "balance")
    widen_iceberg_column(tmp, "c_custkey", "long")
    append_iceberg_snapshot(                                       # snap 2
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 4 == 0)
        .select(
            (F.col("c_custkey") + 10000000).alias("c_custkey"),
            (F.col("c_acctbal") + 5).alias("balance"),
        ),
        tmp,
    )
    latest = read_iceberg_table(spark, tmp).agg(
        F.lit("latest").alias("snapshot"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("balance") * 100).cast("bigint")).alias(
            "balance_cents"
        ),
        F.min("c_custkey").cast("bigint").alias("min_key"),
        F.max("c_custkey").cast("bigint").alias("max_key"),
    )
    md, _ = _load_metadata(_P(tmp))
    first = min(md["snapshots"], key=lambda s: s["sequence-number"])
    v0 = read_iceberg_table(
        spark, tmp, snapshot_id=first["snapshot-id"]
    ).agg(
        F.lit("v0").alias("snapshot"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "balance_cents"
        ),
        F.min("c_custkey").cast("bigint").alias("min_key"),
        F.max("c_custkey").cast("bigint").alias("max_key"),
    )
    return latest.unionByName(v0)


@query(
    "iceberg_mor_delete_lifecycle",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_alive,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM customer
    WHERE NOT (c_acctbal < 0) AND NOT (c_custkey % 11 = 0)
    GROUP BY c_mktsegment
    """,
)
def iceberg_mor_delete_lifecycle(spark, sf_dir):
    """Predicate-driven merge-on-read DELETE on the native Iceberg v2
    writer, full lifecycle (the ``delta_mor_delete_lifecycle`` twin):
    customer lands as a table, then TWO ``delete_iceberg_rows`` calls
    (negative balances, then every 11th key) commit position-delete
    snapshots — the second's lineage scan reads THROUGH the first's
    deletes, so already-dead rows are never re-deleted — and compaction
    materializes the survivors into fresh files (REPLACE snapshot, fresh
    manifest list). The post-compaction read must equal the oracle's
    survivor set — a resurrected or over-deleted row anywhere in the
    lineage scan, delete-file application, or compaction fails the hash.
    Scale: predicate scans are distributed delete-filtered reads; only
    matched (file, position) pairs — the changed-row set — reach the
    driver."""
    from evolution_spark.io.iceberg_meta import (
        compact_iceberg_table,
        delete_iceberg_rows,
        read_iceberg_table,
        write_iceberg_table,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tmp = query_tmp("icemordel", sf_dir)
    write_iceberg_table(c.repartition(4), tmp)
    delete_iceberg_rows(spark, tmp, "c_acctbal < 0")
    delete_iceberg_rows(spark, tmp, "c_custkey % 11 = 0")
    compact_iceberg_table(spark, tmp, target_files=2)
    back = read_iceberg_table(spark, tmp)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "acctbal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "iceberg_mor_update_lifecycle",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_alive,
           CAST(SUM(CAST(ROUND(
             (CASE WHEN c_mktsegment = 'BUILDING'
                   THEN c_acctbal + 10 ELSE c_acctbal END) * 100
           ) AS BIGINT)) AS BIGINT) AS acctbal_cents,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM customer WHERE c_custkey % 9 <> 0
    GROUP BY c_mktsegment
    """,
)
def iceberg_mor_update_lifecycle(spark, sf_dir):
    """Predicate-driven merge-on-read UPDATE on the native Iceberg v2
    writer (the ``delta_mor_update_lifecycle`` twin): ONE atomic
    ``overwrite`` snapshot carries BOTH the position deletes marking the
    old row versions AND the new files holding the updated copies (+10 to
    every BUILDING balance); a predicate DELETE then drops every 9th key.
    No data file is rewritten at any point. The oracle restates the
    surviving rows with CASE-adjusted balances from the source table, so
    a lost update, double-applied update, or row leaked between the
    delete half and the append half of the UPDATE snapshot fails the
    hash."""
    from evolution_spark.io.iceberg_meta import (
        delete_iceberg_rows,
        read_iceberg_table,
        update_iceberg_rows,
        write_iceberg_table,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tmp = query_tmp("icemorupd", sf_dir)
    write_iceberg_table(c.repartition(4), tmp)
    update_iceberg_rows(
        spark, tmp, "c_mktsegment = 'BUILDING'", {"c_acctbal": "c_acctbal + 10"}
    )
    delete_iceberg_rows(spark, tmp, "c_custkey % 9 = 0")
    back = read_iceberg_table(spark, tmp)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "acctbal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "iceberg_merge_cdc",
    oracle="""
    WITH merged AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS bal
      FROM customer WHERE c_custkey % 10 != 5
      UNION ALL
      SELECT c_custkey + 1000000, c_mktsegment, 0.0
      FROM customer WHERE c_custkey < 5
    )
    SELECT c_mktsegment AS segment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(ROUND(bal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM merged GROUP BY c_mktsegment
    """,
)
def iceberg_merge_cdc(spark, sf_dir):
    """MERGE INTO the native Iceberg table from the same CDC change set
    as ``delta_merge_cdc`` — but MERGE-ON-READ
    (io/iceberg_meta.merge_iceberg_cdc): ONE atomic overwrite snapshot
    position-deletes every matched row version and appends exactly the
    upserted rows, so write volume is O(change set) instead of the Delta
    twin's O(intersecting files) rewrite; compaction then materializes
    the merge on maintenance time. Updates (+100 to every 10th key),
    deletes (keys ending in 5), inserts (5 new high keys); the oracle
    restates the post-merge table directly against the source, so a
    missed delete, double-applied update, or lost insert fails the
    hash."""
    from evolution_spark.io.iceberg_meta import (
        merge_iceberg_cdc,
        read_iceberg_table,
        write_iceberg_table,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tmp = query_tmp("ice_mrg", sf_dir)
    write_iceberg_table(c, tmp)
    updates = c.where(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", "c_mktsegment",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("u").alias("_op"),
    )
    deletes = c.where(F.col("c_custkey") % 10 == 5).select(
        "c_custkey", "c_mktsegment", "c_acctbal", F.lit("d").alias("_op")
    )
    inserts = c.where(F.col("c_custkey") < 5).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        "c_mktsegment",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("u").alias("_op"),
    )
    merge_iceberg_cdc(
        spark, tmp, updates.unionByName(deletes).unionByName(inserts),
        key="c_custkey",
    )
    back = read_iceberg_table(spark, tmp)
    return back.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "acctbal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "iceberg_equality_delete_scan",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_alive,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer
    WHERE c_custkey % 19 <> 0 OR (c_custkey % 19 = 0 AND c_custkey % 2 = 0)
    GROUP BY c_mktsegment
    """,
)
def iceberg_equality_delete_scan(spark, sf_dir):
    """Iceberg v2 EQUALITY deletes end-to-end with the spec's sequence
    rule live-checked: customer lands as a table, an equality-delete
    snapshot drops every 19th key by VALUE (no positions — the upsert
    primitive), and a LATER append re-adds the even ones among them. The
    scan must delete the old generation's matching rows yet keep the
    re-appended ones (their data files carry a NEWER sequence number than
    the delete) — the oracle's survivor predicate encodes exactly that, so
    an unscoped equality join (deleting the re-adds too) or an ignored
    delete both fail the hash."""
    from evolution_spark.io.iceberg_meta import (
        append_equality_deletes,
        append_iceberg_snapshot,
        read_iceberg_table,
        write_iceberg_table,
    )

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    tmp = query_tmp("iceeqdel", sf_dir)
    write_iceberg_table(c.repartition(3), tmp)
    keys = [
        int(r.c_custkey)
        for r in c.where(F.col("c_custkey") % 19 == 0).collect()
    ]
    append_equality_deletes(tmp, [{"c_custkey": k} for k in keys], ["c_custkey"])
    # later generation: the even deleted keys come back and must SURVIVE
    append_iceberg_snapshot(
        c.where((F.col("c_custkey") % 19 == 0) & (F.col("c_custkey") % 2 == 0)),
        tmp,
    )
    back = read_iceberg_table(spark, tmp)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
    )


@query(
    "delta_restore_lifecycle",
    oracle="""
    SELECT 'restored' AS state, COUNT(*) AS n_rows,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM customer
    UNION ALL
    SELECT 'pre_restore', COUNT(*), CAST(SUM(k) AS BIGINT), MIN(k), MAX(k)
    FROM (
      SELECT c_custkey AS k FROM customer WHERE c_custkey % 4 <> 0
      UNION ALL
      SELECT c_custkey + 10000000 FROM customer
      WHERE c_custkey % 6 = 0 AND c_custkey % 4 <> 0
    )
    """,
)
def delta_restore_lifecycle(spark, sf_dir):
    """RESTORE TABLE TO VERSION AS OF, the oops-recovery primitive:
    customer lands (v0), derived rows append (v1), a merge-on-read
    DELETE drops every 4th key via deletion vectors (v2), then the table
    RESTORES to v0 in ONE metadata-only commit — removes the appended
    files and re-adds the DV-carrying files in their ORIGINAL (DV-free)
    state. The result unions the post-restore read (exactly the v0
    rows — a leftover DV or surviving appended file fails the hash) with
    a time-travel read of the pre-restore v2 state (history preserved —
    RESTORE adds history, never erases it). Scale: O(changed files)
    metadata at any table size; no data file is touched."""
    from evolution_spark.io.delta_log import (
        commit_delta,
        delete_delta_rows,
        read_delta_snapshot,
        restore_delta_table,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select("c_custkey")
    tmp = query_tmp("deltarestore", sf_dir)
    write_delta_snapshot(c, tmp)                                   # v0
    commit_delta(
        c.where(F.col("c_custkey") % 6 == 0).select(
            (F.col("c_custkey") + 10000000).alias("c_custkey")
        ),
        tmp, mode="append",
    )                                                              # v1
    delete_delta_rows(spark, tmp, "c_custkey % 4 = 0")             # v2
    restore_delta_table(tmp, 0)                                    # v3
    restored = read_delta_snapshot(spark, tmp).agg(
        F.lit("restored").alias("state"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )
    pre = read_delta_snapshot(spark, tmp, version=2).agg(
        F.lit("pre_restore").alias("state"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )
    return restored.unionByName(pre)


@query(
    "iceberg_rollback_lifecycle",
    oracle="""
    SELECT COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS key_sum,
           MIN(k) AS min_key, MAX(k) AS max_key
    FROM (
      SELECT c_custkey AS k FROM customer
      UNION ALL
      SELECT c_custkey + 20000000 FROM customer WHERE c_custkey % 5 = 0
    )
    """,
)
def iceberg_rollback_lifecycle(spark, sf_dir):
    """Iceberg ROLLBACK (the restore twin on snapshot lineage): customer
    lands (snap 1), a bad append lands (snap 2), the table rolls back to
    snap 1 (metadata-only — current-snapshot-id moves, nothing is
    deleted), and a GOOD append lands on top. The final read must hold
    exactly base ∪ good rows — a surviving bad row means the rollback
    didn't take; a missing good row means post-rollback writes broke.
    Sequence numbers stay monotonic across the rollback (spec rule),
    which the snapshot-commit core asserts by construction."""
    from evolution_spark.io.iceberg_meta import (
        _load_metadata,
        append_iceberg_snapshot,
        read_iceberg_table,
        rollback_iceberg_table,
        write_iceberg_table,
    )
    from pathlib import Path as _P

    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    tmp = query_tmp("icerollback", sf_dir)
    write_iceberg_table(c, tmp)                                    # snap 1
    md, _ = _load_metadata(_P(tmp))
    base_snap = md["current-snapshot-id"]
    append_iceberg_snapshot(                                       # snap 2 (bad)
        c.where(F.col("k") % 3 == 0).select((F.col("k") + 90000000).alias("k")),
        tmp,
    )
    rollback_iceberg_table(tmp, base_snap)
    append_iceberg_snapshot(                                       # snap 3 (good)
        c.where(F.col("k") % 5 == 0).select((F.col("k") + 20000000).alias("k")),
        tmp,
    )
    return read_iceberg_table(spark, tmp).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("k").cast("bigint").alias("key_sum"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )


@query(
    "delta_check_constraint_enforcement",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(bal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
           MIN(k) AS min_key, MAX(k) AS max_key
    FROM (
      SELECT c_custkey AS k, c_mktsegment, c_acctbal AS bal FROM customer
      UNION ALL
      SELECT c_custkey + 10000000, c_mktsegment, ABS(c_acctbal)
      FROM customer WHERE c_custkey % 8 = 0
    ) GROUP BY c_mktsegment
    """,
)
def delta_check_constraint_enforcement(spark, sf_dir):
    """CHECK constraints, the writer-v3 protocol obligation the round-6
    engine still refused: customer lands, ``ADD CONSTRAINT bal_floor
    CHECK (c_acctbal >= -1000)`` upgrades the protocol, a VALID append
    (absolute balances) commits, and a VIOLATING append (balance -9999)
    must ABORT with no version published — the query asserts the refusal
    and that the log did not advance, then returns the surviving table.
    A constraint that silently failed open (the violating rows landing)
    or failed closed (the valid append blocked) both change the oracle's
    closed-form row set. Scale: validation is ONE combined scan of the
    staged output (already materialized), never of the table."""
    from pathlib import Path as _P

    from evolution_spark.io.delta_log import (
        DeltaProtocolError,
        _replay_log,
        add_delta_constraint,
        commit_delta,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tmp = query_tmp("deltachk", sf_dir)
    write_delta_snapshot(c, tmp)
    add_delta_constraint(spark, tmp, "bal_floor", "c_acctbal >= -1000")
    commit_delta(
        c.where(F.col("c_custkey") % 8 == 0).select(
            (F.col("c_custkey") + 10000000).alias("c_custkey"),
            "c_mktsegment",
            F.abs(F.col("c_acctbal")).alias("c_acctbal"),
        ),
        tmp, mode="append",
    )
    before = _replay_log(_P(tmp))[3]
    try:
        commit_delta(
            spark.createDataFrame(
                [(99999999, "BUILDING", -9999.0)],
                "c_custkey long, c_mktsegment string, c_acctbal double",
            ),
            tmp, mode="append",
        )
        raise AssertionError("violating append must refuse")
    except DeltaProtocolError:
        pass
    assert _replay_log(_P(tmp))[3] == before  # no version published
    back = read_delta_snapshot(spark, tmp)
    return back.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "iceberg_stats_skipping",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
    FROM orders
    WHERE o_orderkey >=
          CAST(FLOOR((SELECT MAX(o_orderkey) FROM orders) * 0.9) AS BIGINT)
    GROUP BY o_orderpriority
    """,
)
def iceberg_stats_skipping(spark, sf_dir):
    """Manifest-level DATA SKIPPING on column bounds — the Iceberg scan
    path's needle-on-100-TB feature (the ``read_delta_snapshot
    (skip_where=...)`` twin on field-id-keyed manifest bounds): orders
    lands range-clustered on o_orderkey into 8 files, each manifest entry
    carrying per-column lower/upper bounds from the parquet footers
    (spec's single-value binary serialization). A read with
    ``skip_where=[("o_orderkey", ">=", cut)]`` drops every file whose
    bound range provably excludes the cut BEFORE Spark lists it — the
    query asserts the pruned scan touches a strict subset of the files —
    and the same predicate still applies as a filter (skipping only
    removes files that cannot match). Bounds are keyed by FIELD ID, so
    pruning survives renames. The oracle recomputes the top-decile
    aggregate from the raw table."""
    from evolution_spark.io.iceberg_meta import (
        read_iceberg_table,
        write_iceberg_table,
    )

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    tmp = query_tmp("iceskip", sf_dir)
    write_iceberg_table(o.repartitionByRange(8, "o_orderkey"), tmp)
    cut = int(o.agg(F.max("o_orderkey")).collect()[0][0] * 0.9)
    full = read_iceberg_table(spark, tmp)
    pruned = read_iceberg_table(
        spark, tmp, skip_where=[("o_orderkey", ">=", cut)]
    )
    n_full, n_pruned = len(full.inputFiles()), len(pruned.inputFiles())
    assert n_pruned < n_full, (n_pruned, n_full)  # skipping actually fired
    return pruned.where(F.col("o_orderkey") >= cut).groupBy(
        "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "price_cents"
        ),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "iceberg_tag_pinned_read",
    oracle="""
    SELECT 'tagged' AS state, COUNT(*) AS n_rows,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer WHERE c_custkey % 2 = 1
    UNION ALL
    SELECT 'head', COUNT(*), CAST(SUM(c_custkey) AS BIGINT)
    FROM customer
    """,
)
def iceberg_tag_pinned_read(spark, sf_dir):
    """Named snapshot TAGS — the reproducibility primitive a training-
    data pipeline needs (pin the exact corpus snapshot a model trained
    on): odd customer keys land and get tagged ``corpus-v1``, even keys
    append, snapshot retention expires everything but the head — and the
    tagged read STILL returns exactly the pinned state, because refs
    hold their snapshots against expiration (spec ``refs`` semantics).
    The result unions the tagged read with the head read; a tag that
    drifted with the table, or an expire that reclaimed the pinned
    snapshot, fails the hash. Metadata-only: tags are O(1) at any table
    size."""
    from evolution_spark.io.iceberg_meta import (
        append_iceberg_snapshot,
        expire_iceberg_snapshots,
        read_iceberg_table,
        tag_iceberg_snapshot,
        write_iceberg_table,
    )

    c = table(spark, sf_dir, "customer").select("c_custkey")
    tmp = query_tmp("icetag", sf_dir)
    write_iceberg_table(c.where(F.col("c_custkey") % 2 == 1), tmp)
    tag_iceberg_snapshot(tmp, "corpus-v1")
    append_iceberg_snapshot(c.where(F.col("c_custkey") % 2 == 0), tmp)
    expire_iceberg_snapshots(tmp, keep_last=1)  # the tag must survive
    tagged = read_iceberg_table(spark, tmp, ref="corpus-v1").agg(
        F.lit("tagged").alias("state"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
    )
    head = read_iceberg_table(spark, tmp).agg(
        F.lit("head").alias("state"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
    )
    return tagged.unionByName(head)


@query(
    "iceberg_partition_transforms",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents,
           COUNT(DISTINCT o_custkey) AS n_custs
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-03-01'
      AND o_orderdate <  TIMESTAMP '1995-04-01'
    GROUP BY o_orderpriority
    """,
)
def iceberg_partition_transforms(spark, sf_dir):
    """Iceberg PARTITION TRANSFORMS (spec v2 family: here ``month`` +
    ``bucket[4]``) — the layout feature that turns a 100 TB time-series
    scan into a one-month, one-bucket file listing. Orders lands
    partitioned by ``months(o_orderdate)`` and ``bucket(4, o_custkey)``
    (spec-pinned Murmur3, Appendix B vectors tested); the read prunes at
    the MANIFEST level by applying the same transform to the predicate
    literal driver-side — ``{'o_orderdate': '1995-03-15'}`` keeps only
    the 1995-03 month partition's files (asserted: strict inputFiles
    subset), and adding ``{'o_custkey': k}`` prunes further to one bucket
    while keeping every row of that key (asserted). Transform
    partitioning is lossy, so source columns stay in the data files and
    the month window still applies as a residual filter. The oracle
    recomputes the month aggregate from the raw table — a wrong bucket
    hash, a mis-parsed partition dir, or over-pruning breaks the value
    hash. Reference parity: the reference declares the Iceberg target but
    implements none of this (crates/evolution-target/src/target.rs)."""
    from evolution_spark.io.iceberg_meta import (
        read_iceberg_table,
        write_iceberg_table,
    )

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
        "o_orderpriority",
    )
    tmp = query_tmp("icetransform", sf_dir)
    write_iceberg_table(
        o, tmp, partition_by=["months(o_orderdate)", "bucket(4, o_custkey)"],
        # hash distribution: one task per partition dir, dirs x 1 files —
        # without it this write emits tasks x dirs small files
        distribute=True,
    )
    full = read_iceberg_table(spark, tmp)
    month = read_iceberg_table(
        spark, tmp, partition_where={"o_orderdate": "1995-03-15"}
    )
    assert len(month.inputFiles()) < len(full.inputFiles())
    in_month = month.where(
        (F.col("o_orderdate") >= F.lit("1995-03-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp_ntz"))
    )
    # bucket prune keeps every row of the pruned-to key
    k = in_month.agg(F.min("o_custkey")).collect()[0][0]
    both = read_iceberg_table(
        spark, tmp,
        partition_where={"o_orderdate": "1995-03-15", "o_custkey": int(k)},
    )
    assert len(both.inputFiles()) <= len(month.inputFiles())
    _march = (
        (F.col("o_orderdate") >= F.lit("1995-03-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp_ntz"))
    )
    # both counts in ONE action (a 1x1 crossJoin of the two aggregates):
    # same two counts compared, one driver round trip instead of two
    # (guide §5 — every extra action at this fixture scale is ~130 ms of
    # JVM wait)
    _cnts = (
        both.where(_march & (F.col("o_custkey") == int(k)))
        .agg(F.count(F.lit(1)).alias("nb"))
        .crossJoin(
            full.where(_march & (F.col("o_custkey") == int(k)))
            .agg(F.count(F.lit(1)).alias("nf"))
        )
        .first()
    )
    assert _cnts["nb"] == _cnts["nf"]
    return in_month.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "price_cents"
        ),
        F.countDistinct("o_custkey").alias("n_custs"),
    )


@query(
    "iceberg_branch_lifecycle",
    oracle="""
    SELECT 'main_before' AS state, COUNT(*) AS n_rows,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer WHERE c_custkey % 2 = 1
    UNION ALL
    SELECT 'branch_audit', COUNT(*), CAST(SUM(c_custkey) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'main_after', COUNT(*), CAST(SUM(c_custkey) AS BIGINT)
    FROM customer
    """,
)
def iceberg_branch_lifecycle(spark, sf_dir):
    """Iceberg BRANCH refs — the write-audit-publish workflow a corpus
    pipeline stages updates with: odd customer keys land on main, a
    ``staging`` branch takes the even-key append (main provably
    untouched: the 'main_before' leg reads main AFTER the branch
    commit), the branch read audits the full corpus, and fast-forward
    publishes it — 'main_after' must equal the branch read. A branch
    commit that leaks into main, a fast-forward that drops rows, or a
    ref resolving to the wrong snapshot breaks the hash. All ref
    operations are metadata-only (O(1) at any table size); the branch
    commit itself is a normal distributed append."""
    from evolution_spark.io.iceberg_meta import (
        append_iceberg_snapshot,
        create_iceberg_branch,
        fast_forward_iceberg_branch,
        read_iceberg_table,
        write_iceberg_table,
    )

    c = table(spark, sf_dir, "customer").select("c_custkey")
    tmp = query_tmp("icebranch", sf_dir)
    write_iceberg_table(c.where(F.col("c_custkey") % 2 == 1), tmp)
    create_iceberg_branch(tmp, "staging")
    append_iceberg_snapshot(
        c.where(F.col("c_custkey") % 2 == 0), tmp, branch="staging"
    )

    def _leg(df, state):
        return df.agg(
            F.lit(state).alias("state"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("c_custkey").cast("bigint").alias("key_sum"),
        )

    main_before = _leg(read_iceberg_table(spark, tmp), "main_before")
    branch_audit = _leg(
        read_iceberg_table(spark, tmp, ref="staging"), "branch_audit"
    )
    fast_forward_iceberg_branch(tmp, "staging")
    main_after = _leg(read_iceberg_table(spark, tmp), "main_after")
    return main_before.unionByName(branch_audit).unionByName(main_after)


@query(
    "delta_shallow_clone",
    oracle="""
    SELECT 'clone' AS state, c_mktsegment AS segment, COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents
    FROM customer GROUP BY c_mktsegment
    UNION ALL
    SELECT 'clone_evolved', c_mktsegment, COUNT(*),
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
    FROM customer WHERE c_custkey % 2 = 0 GROUP BY c_mktsegment
    """,
)
def delta_shallow_clone(spark, sf_dir):
    """Delta SHALLOW CLONE — the dev/test-against-prod primitive: a
    metadata-only v0 commit referencing the partitioned source table's
    files by ABSOLUTE path (spec: add.path may be absolute; partition
    columns resolve from each add's ``partitionValues``, the
    spec-faithful source, since hive-dir discovery cannot cross roots).
    The clone then evolves independently: a predicate DELETE attaches a
    deletion vector to a source-referencing add (merge-on-read — zero
    source bytes rewritten) while the SOURCE keeps every row (asserted).
    At 100 TB a clone is one metadata commit instead of a 100 TB copy.
    The 'clone' leg hashes the full cloned corpus; 'clone_evolved' hashes
    the post-DELETE clone; a clone that leaked DML into the source, lost
    partition values, or mis-resolved absolute paths breaks the hash."""
    from evolution_spark.io.delta_log import (
        clone_delta_table,
        delete_delta_rows,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    src = query_tmp("clonesrc", sf_dir)
    dst = query_tmp("clonedst", sf_dir)
    write_delta_snapshot(c, src, partition_by=["c_mktsegment"])
    clone_delta_table(src, dst)

    def _leg(df, state):
        return df.groupBy(F.col("c_mktsegment").alias("segment")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
                "bal_cents"
            ),
        ).select(F.lit(state).alias("state"), "segment", "n_rows", "bal_cents")

    before = _leg(read_delta_snapshot(spark, dst), "clone")
    delete_delta_rows(spark, dst, "c_custkey % 2 = 1")
    evolved = _leg(read_delta_snapshot(spark, dst), "clone_evolved")
    # the DML stayed in the clone: the source still holds every row
    assert read_delta_snapshot(spark, src).count() == c.count()
    return before.unionByName(evolved)


@query(
    "delta_id_mode_read",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key
    FROM customer GROUP BY c_mktsegment
    """,
)
def delta_id_mode_read(spark, sf_dir):
    """READ a Delta table in column-mapping **id** mode (reader v2 /
    ``delta.columnMapping.mode='id'``): resolution is by parquet FIELD ID
    (``delta.columnMapping.id`` == footer field id), not by name — the
    spec shape UniForm/converted tables produce, where different files
    store DIFFERENT physical column names for the same logical column.

    The fixture is deliberately adversarial: two file batches whose
    physical data-column names disagree (``col-even-*`` vs ``col-odd-*``),
    hive-partitioned under the PHYSICAL partition directory name; a
    name-resolving reader would surface half the table as null. The read
    goes through ``read_delta_snapshot``'s field-id branch (Spark's
    ``spark.sql.parquet.fieldId.read.enabled`` + ``parquet.field.id``
    schema metadata — the public SPARK-38094 mechanism), partition dirs
    alias back to the logical name, and the aggregate hash-checks every
    column against the source table. Reference parity: the reference's
    Delta target is ``todo!()`` (examples/delta/src/main.rs:28-30); this
    is native capability beyond it."""
    import json
    import os
    import uuid
    from pathlib import Path

    from evolution_spark.io.delta_log import read_delta_snapshot

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    tmp = Path(query_tmp("deltaidmode", sf_dir))
    tmp.mkdir(parents=True, exist_ok=True)
    phys_seg = "col-seg-9af1"
    fid = {"c_custkey": 1, "c_acctbal": 2}
    adds = []
    for tag, pred in (("even", "c_custkey % 2 = 0"), ("odd", "c_custkey % 2 = 1")):
        # per-batch physical names DIFFER; only the field ids agree
        out = c.where(pred).select(
            F.col("c_custkey").alias(f"col-{tag}-key"),
            F.col("c_acctbal").alias(f"col-{tag}-bal"),
            F.col("c_mktsegment").alias(phys_seg),
        )
        out = out.withMetadata(f"col-{tag}-key", {"parquet.field.id": 1})
        out = out.withMetadata(f"col-{tag}-bal", {"parquet.field.id": 2})
        stage = tmp / f"_stage_{tag}"
        out.repartition(2).write.partitionBy(phys_seg).mode(
            "overwrite"
        ).parquet(str(stage))
        for src in sorted(stage.rglob("*.parquet")):
            seg_dir = src.parent.name  # 'col-seg-9af1=BUILDING'
            seg_val = seg_dir.partition("=")[2]
            dest_dir = tmp / seg_dir
            dest_dir.mkdir(exist_ok=True)
            name = f"part-{uuid.uuid4().hex}.parquet"
            os.replace(src, dest_dir / name)
            adds.append({"add": {
                "path": f"{seg_dir}/{name}",
                "partitionValues": {phys_seg: seg_val},
                "size": (dest_dir / name).stat().st_size,
                "modificationTime": 0, "dataChange": True,
            }})
    types = {"c_custkey": "long", "c_acctbal": "double",
             "c_mktsegment": "string"}
    phys_meta = {"c_custkey": "col-even-key", "c_acctbal": "col-even-bal",
                 "c_mktsegment": phys_seg}
    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": n, "type": types[n], "nullable": True,
             "metadata": {
                 "delta.columnMapping.id": fid.get(n, 3),
                 "delta.columnMapping.physicalName": phys_meta[n]}}
            for n in c.columns
        ],
    })
    v0 = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping"]}},
        {"metaData": {"id": str(uuid.uuid4()),
                      "format": {"provider": "parquet"},
                      "schemaString": schema_string,
                      "partitionColumns": [phys_seg],
                      "configuration": {"delta.columnMapping.mode": "id"},
                      "createdTime": 0}},
    ] + adds
    log = tmp / "_delta_log"
    log.mkdir(exist_ok=True)
    (log / f"{0:020d}.json").write_text(
        "".join(json.dumps(a) + "\n" for a in v0)
    )
    back = read_delta_snapshot(spark, str(tmp))
    return back.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "delta_partitioned_rename_lifecycle",
    oracle="""
    SELECT 'v0' AS state, c_mktsegment AS segment,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents
    FROM customer GROUP BY c_mktsegment
    UNION ALL
    SELECT 'renamed_deleted' AS state, c_mktsegment AS segment,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents
    FROM customer WHERE c_custkey % 10 <> 0 GROUP BY c_mktsegment
    """,
)
def delta_partitioned_rename_lifecycle(spark, sf_dir):
    """RENAME COLUMN on a PARTITIONED Delta table (round-8 capability —
    previously the mapping upgrade refused partitioned tables entirely):
    write customer hive-partitioned by segment, upgrade to name-mode
    column mapping (metadata-only: physical name = current name, so the
    existing directory layout and partitionValues keys are already the
    physical names), RENAME the balance column, then run partition-aware
    DML (DELETE) on the mapped table. Leg 'v0' time-travels to the
    pre-rename version (old column name, all rows); leg 'renamed_deleted'
    reads the final state through the mapping. The partition column
    itself stays rename-refused (directory layout is keyed by its
    physical name) — asserted inline."""
    from evolution_spark.io.delta_log import (
        delete_delta_rows,
        read_delta_snapshot,
        rename_delta_column,
        upgrade_delta_to_column_mapping,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    path = query_tmp("deltapartmap", sf_dir)
    write_delta_snapshot(c, path, partition_by=["c_mktsegment"])
    upgrade_delta_to_column_mapping(path)
    rename_delta_column(path, "c_acctbal", "bal")
    try:
        rename_delta_column(path, "c_mktsegment", "segment")
        raise AssertionError("partition-column rename must refuse")
    except ValueError:
        pass
    delete_delta_rows(spark, path, "c_custkey % 10 = 0")

    v0 = read_delta_snapshot(spark, path, version=0)
    leg0 = v0.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
    ).select(F.lit("v0").alias("state"), "segment", "n_rows", "bal_cents")
    cur = read_delta_snapshot(spark, path)
    leg1 = cur.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("bal") * 100).cast("bigint")).alias("bal_cents"),
    ).select(
        F.lit("renamed_deleted").alias("state"), "segment", "n_rows",
        "bal_cents",
    )
    return leg0.unionByName(leg1)


@query(
    "iceberg_scoped_equality_delete",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS n_alive,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer
    WHERE NOT (c_mktsegment = 'BUILDING' AND c_custkey % 7 = 0)
      AND c_custkey % 23 <> 0
    GROUP BY c_mktsegment
    """,
)
def iceberg_scoped_equality_delete(spark, sf_dir):
    """PARTITION-SCOPED Iceberg equality deletes (round-8 capability —
    previously any real partition record in a delete entry refused): the
    customer table lands hive-partitioned by segment; a SCOPED delete
    drops every 7th key ONLY inside the BUILDING partition (the delete
    manifest entry carries the real partition record, and the scan
    restricts the anti-join to data files whose canonical partition
    record matches); a GLOBAL delete then drops every 23rd key
    everywhere. The oracle encodes exactly that survivor set — an
    over-applied scoped delete (the old refusal's failure mode) kills
    the hash because the same key values exist in every other segment."""
    from evolution_spark.io.iceberg_meta import (
        append_equality_deletes,
        read_iceberg_table,
        write_iceberg_table,
    )

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    tmp = query_tmp("icescoped", sf_dir)
    write_iceberg_table(c, tmp, partition_by=["c_mktsegment"])
    keys = [
        int(r.c_custkey)
        for r in c.where(F.col("c_custkey") % 7 == 0).collect()
    ]
    append_equality_deletes(
        tmp, [{"c_custkey": k} for k in keys], ["c_custkey"],
        partition_scope={"c_mktsegment": "BUILDING"},
    )
    gkeys = [
        int(r.c_custkey)
        for r in c.where(F.col("c_custkey") % 23 == 0).collect()
    ]
    append_equality_deletes(tmp, [{"c_custkey": k} for k in gkeys], ["c_custkey"])
    back = read_iceberg_table(spark, tmp)
    return back.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
    )


@query(
    "delta_cdf_sidecar_roundtrip",
    oracle="""
    SELECT 'update_preimage' AS change_type, 1 AS commit_version,
           COUNT(*) AS n_rows, CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT 'update_postimage', 1, COUNT(*), CAST(SUM(c_custkey) AS BIGINT),
           CAST(SUM(CAST(ROUND((c_acctbal + 1) * 100) AS BIGINT)) AS BIGINT)
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT 'delete', 2, COUNT(*), CAST(SUM(c_custkey) AS BIGINT),
           CAST(SUM(CAST(ROUND(
             (c_acctbal + CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END)
             * 100) AS BIGINT)) AS BIGINT)
    FROM customer WHERE c_custkey % 17 = 0
    """,
)
def delta_cdf_sidecar_roundtrip(spark, sf_dir):
    """Delta CDF SIDECAR lifecycle (round-8 capability — previously
    ``table_changes`` only DERIVED changes from add/remove diffs, which
    cannot pair update pre/post-images): customer lands with
    ``delta.enableChangeDataFeed=true``; an UPDATE (v1) bumps every 10th
    key's balance and a DELETE (v2) drops every 17th key — both commits
    write ``_change_data`` sidecar parquet + ``cdc`` actions, and
    ``table_changes`` reads those files instead of deriving. The oracle
    recomputes all three change legs (preimage, postimage with the bump,
    delete with the bump applied to overlapping keys) — a reader that
    derived instead of using sidecars would emit 'delete'/'insert' types
    and fail the hash, as would a sidecar that recorded pre-update
    balances in the delete leg."""
    from evolution_spark.io.delta_log import (
        delete_delta_rows,
        table_changes,
        update_delta_rows,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    path = query_tmp("deltacdfside", sf_dir)
    write_delta_snapshot(
        c, path, configuration={"delta.enableChangeDataFeed": "true"}
    )
    update_delta_rows(spark, path, "c_custkey % 10 = 0", {"c_acctbal": "c_acctbal + 1"})
    delete_delta_rows(spark, path, "c_custkey % 17 = 0")
    ch = table_changes(spark, path, 1, 2)
    return ch.groupBy(
        F.col("_change_type").alias("change_type"),
        F.col("_commit_version").cast("int").alias("commit_version"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
    )


@query(
    "delta_table_health_advisor",
    oracle="""
    WITH t AS (SELECT COUNT(*) AS total FROM customer),
    d AS (SELECT COUNT(*) AS dels FROM customer WHERE c_custkey % 3 = 0)
    SELECT 'delta' AS format,
           t.total AS total_rows,
           d.dels AS deleted_rows,
           ROUND(d.dels * 1.0 / t.total, 4) AS delete_ratio,
           64 AS live_files, 64 AS small_files,
           CAST(2 AS BIGINT) AS n_recommendations
    FROM t, d
    """,
)
def delta_table_health_advisor(spark, sf_dir):
    """Maintenance advisor end-to-end (round-8 capability): customer
    lands as 64 Delta files, a merge-on-read DELETE marks every 3rd key
    via deletion vectors, and ``table_health`` — one METADATA-ONLY pass,
    no data scan — reports the accumulated debt: deleted rows / ratio
    from DV cardinalities, live/small file counts, and the
    recommendations the v3.3 stress thresholds trigger (a ~33% delete
    ratio is past the 2x-scan-cost CRITICAL line, and 64 tiny files trip
    the small-file WARN). The oracle recomputes every signal from the
    table's own predicate arithmetic, so a drifting cardinality count or
    threshold misfire breaks the hash."""
    from evolution_spark.io.delta_log import (
        delete_delta_rows,
        write_delta_snapshot,
    )
    from evolution_spark.io.maintenance import table_health

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    path = query_tmp("deltahealth", sf_dir)
    write_delta_snapshot(c.repartition(64), path)
    delete_delta_rows(spark, path, "c_custkey % 3 = 0")
    h = table_health(path)
    s = h["signals"]
    return spark.createDataFrame(
        [(
            h["format"], s["total_rows"], s["deleted_rows"],
            s["delete_ratio"], s["live_files"], s["small_files"],
            len(h["recommendations"]),
        )],
        "format string, total_rows bigint, deleted_rows bigint, "
        "delete_ratio double, live_files int, small_files int, "
        "n_recommendations bigint",
    )


@query(
    "delta_nested_struct_mapping_read",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key
    FROM customer GROUP BY c_mktsegment
    """,
)
def delta_nested_struct_mapping_read(spark, sf_dir):
    """Column mapping over a NESTED STRUCT (round-8 capability —
    previously any mapped table containing a struct refused): the
    foreign-style fixture stores customer as ``k`` + ``s struct<bal,
    seg>`` with ``col-*`` PHYSICAL names at BOTH nesting levels (the
    shape a Databricks table gets after renaming a struct's inner
    field); the scan reads the recursively-physical schema and aliases
    back via a positional struct CAST — flat-map resolution would
    surface the inner fields as null and break the hash. Aggregates
    group by the struct's inner seg and sum its inner bal, so both
    nested resolutions are value-checked."""
    import json
    import os
    import uuid
    from pathlib import Path

    from evolution_spark.io.delta_log import read_delta_snapshot

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    tmp = Path(query_tmp("deltanested", sf_dir))
    tmp.mkdir(parents=True, exist_ok=True)
    src = c.select(
        F.col("c_custkey").alias("col-k"),
        F.struct(
            F.col("c_acctbal").alias("col-bal"),
            F.col("c_mktsegment").alias("col-seg"),
        ).alias("col-s"),
    )
    stage = tmp / "_stage"
    src.repartition(3).write.mode("overwrite").parquet(str(stage))
    adds = []
    for f in sorted(stage.rglob("*.parquet")):
        name = f"part-{uuid.uuid4().hex}.parquet"
        os.replace(f, tmp / name)
        adds.append({"add": {
            "path": name, "partitionValues": {},
            "size": (tmp / name).stat().st_size,
            "modificationTime": 0, "dataChange": True,
        }})
    fields = [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-k"}},
        {"name": "s", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-s"},
         "type": {"type": "struct", "fields": [
             {"name": "bal", "type": "double", "nullable": True,
              "metadata": {"delta.columnMapping.id": 3,
                           "delta.columnMapping.physicalName": "col-bal"}},
             {"name": "seg", "type": "string", "nullable": True,
              "metadata": {"delta.columnMapping.id": 4,
                           "delta.columnMapping.physicalName": "col-seg"}},
         ]}},
    ]
    v0 = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping"]}},
        {"metaData": {"id": str(uuid.uuid4()),
                      "format": {"provider": "parquet"},
                      "schemaString": json.dumps(
                          {"type": "struct", "fields": fields}),
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "name"},
                      "createdTime": 0}},
    ] + adds
    log = tmp / "_delta_log"
    log.mkdir(exist_ok=True)
    (log / f"{0:020d}.json").write_text(
        "".join(json.dumps(a) + "\n" for a in v0)
    )
    back = read_delta_snapshot(spark, str(tmp))
    return back.groupBy(F.col("s.seg").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("s.bal") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
        F.min("k").alias("min_key"),
    )


@query(
    "delta_cdf_stream_roundtrip",
    oracle="""
    SELECT 'update_preimage' AS change_type, 1 AS commit_version,
           COUNT(*) AS n_rows, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer WHERE c_custkey % 9 = 0
    UNION ALL
    SELECT 'update_postimage', 1, COUNT(*), CAST(SUM(c_custkey) AS BIGINT)
    FROM customer WHERE c_custkey % 9 = 0
    UNION ALL
    SELECT 'delete', 2, COUNT(*), CAST(SUM(c_custkey) AS BIGINT)
    FROM customer WHERE c_custkey % 13 = 0
    UNION ALL
    SELECT 'insert', 3, COUNT(*), CAST(SUM(c_custkey + 20000000) AS BIGINT)
    FROM customer WHERE c_custkey % 31 = 0
    """,
)
def delta_cdf_stream_roundtrip(spark, sf_dir):
    """STREAMING change data feed (round-8 capability): the
    evolution_delta source with ``readChangeFeed=true`` runs a REAL
    Structured Streaming query (availableNow trigger, memory sink) over
    a CDF table's history — an UPDATE (v1) and DELETE (v2) stream their
    exact row-level changes from the CDF sidecars (pre/post-image pairs
    a plain stream can only fail on), and a later append (v3) streams as
    inserts. The oracle recomputes all four change legs; a stream that
    derived instead of reading sidecars, double-counted a commit, or
    mis-stamped _commit_version breaks the hash. The plain (non-CDF)
    stream's semantics are unchanged — it still fails loudly on
    non-append commits."""
    import uuid as _uuid

    from evolution_spark.io.delta_log import (
        commit_delta,
        delete_delta_rows,
        update_delta_rows,
        write_delta_snapshot,
    )
    from evolution_spark.io.delta_source import register_delta_source

    register_delta_source(spark)
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    path = query_tmp("deltacdfstream", sf_dir)
    write_delta_snapshot(
        c, path, configuration={"delta.enableChangeDataFeed": "true"}
    )
    update_delta_rows(spark, path, "c_custkey % 9 = 0",
                      {"c_acctbal": "c_acctbal + 2"})
    delete_delta_rows(spark, path, "c_custkey % 13 = 0")
    commit_delta(
        c.where(F.col("c_custkey") % 31 == 0).select(
            (F.col("c_custkey") + 20_000_000).alias("c_custkey"),
            "c_acctbal",
        ),
        path, mode="append",
    )
    sink = f"cdf_stream_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("evolution_delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .load(path)
        .writeStream.format("memory").queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table(sink)
    return out.groupBy(
        F.col("_change_type").alias("change_type"),
        F.col("_commit_version").cast("int").alias("commit_version"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        # the insert leg's keys were shifted; key_sum pins exact rows on
        # every leg without floating-point concerns
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
    )


@query(
    "iceberg_partition_evolution",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    WHERE (o_orderkey % 2 = 0 AND o_custkey % 4 = 1)
       OR (o_orderkey % 2 = 1 AND o_custkey % 4 = 2)
    GROUP BY o_orderpriority
    """,
)
def iceberg_partition_evolution(spark, sf_dir):
    """Iceberg PARTITION EVOLUTION (round-8 capability): orders lands
    UNPARTITIONED (spec 0, even keys), the default spec evolves to
    identity(custmod) in one metadata-only commit, and the odd keys land
    under the new hive layout (spec 1). The read unions both spec epochs
    (different directory layouts scan as separate groups) and
    ``partition_where={'custmod': ...}`` prunes ONLY the new-spec
    manifests — old-spec files are kept conservatively, so the final
    residual filter must still find every matching old-spec row. The
    query reads two pruned slices (custmod 1 from the evolved layout
    plus the residually-filtered old files; custmod 2 likewise) and
    aggregates; over-pruning old-spec files, a broken epoch union, or a
    mis-parsed new layout all break the hash. Asserted inline: the
    pruned read lists fewer files than the full read."""
    from evolution_spark.io.iceberg_meta import (
        append_iceberg_snapshot,
        evolve_iceberg_partition_spec,
        read_iceberg_table,
        write_iceberg_table,
    )

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    ).withColumn("custmod", (F.col("o_custkey") % 4).cast("long"))
    tmp = query_tmp("icespecevo", sf_dir)
    write_iceberg_table(o.where(F.col("o_orderkey") % 2 == 0), tmp)
    evolve_iceberg_partition_spec(tmp, ["custmod"])
    append_iceberg_snapshot(o.where(F.col("o_orderkey") % 2 == 1), tmp)

    full = read_iceberg_table(spark, tmp)
    legs = []
    for cm, key_parity in ((1, 0), (2, 1)):
        pr = read_iceberg_table(spark, tmp, partition_where={"custmod": cm})
        assert len(pr.inputFiles()) < len(full.inputFiles())
        legs.append(
            pr.where(
                (F.col("custmod") == cm)
                & (F.col("o_orderkey") % 2 == key_parity)
            )
        )
    out = legs[0].unionByName(legs[1])
    return out.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
    )


@query(
    "delta_history_audit",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS base FROM customer),
    n5 AS (SELECT COUNT(*) AS added FROM customer WHERE c_custkey % 5 = 0),
    d AS (
      SELECT (SELECT COUNT(*) FROM customer WHERE c_custkey % 7 = 0)
           + (SELECT COUNT(*) FROM customer
              WHERE c_custkey % 5 = 0 AND (c_custkey + 10000000) % 7 = 0)
           AS deleted
    )
    SELECT 0 AS version, 'WRITE' AS operation, n.base AS n_rows FROM n
    UNION ALL
    SELECT 1, 'WRITE', n.base + n5.added FROM n, n5
    UNION ALL
    SELECT 2, 'DELETE', n.base + n5.added - d.deleted FROM n, n5, d
    UNION ALL
    SELECT 3, 'OPTIMIZE', n.base + n5.added - d.deleted FROM n, n5, d
    """,
)
def delta_history_audit(spark, sf_dir):
    """DESCRIBE HISTORY x TIME TRAVEL consistency (round-8 capability):
    ``delta_table_history`` lists every commit with its operation, and
    each listed version must time-travel to exactly the row count the
    operation sequence implies — write, append, merge-on-read DELETE
    (DV), OPTIMIZE (layout-only, count unchanged). A history row with
    the wrong operation label, a missing commit, or a version that
    travels to the wrong snapshot breaks the hash. History is one
    driver-side log pass; the counts are four snapshot scans."""
    from evolution_spark.io.delta_log import (
        commit_delta,
        delete_delta_rows,
        delta_table_history,
        optimize_delta,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    path = query_tmp("deltahist", sf_dir)
    write_delta_snapshot(c, path)
    commit_delta(
        c.where(F.col("c_custkey") % 5 == 0).select(
            (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
            "c_acctbal",
        ),
        path, mode="append",
    )
    delete_delta_rows(spark, path, "c_custkey % 7 = 0")
    optimize_delta(spark, path)

    hist = delta_table_history(spark, path).select("version", "operation")
    legs = [
        read_delta_snapshot(spark, path, version=v).agg(
            F.lit(v).cast("long").alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        for v in range(4)
    ]
    counts = legs[0]
    for l in legs[1:]:
        counts = counts.unionByName(l)
    return hist.join(counts, "version").select(
        "version", "operation", "n_rows"
    )


@query(
    "iceberg_snapshots_audit",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS base FROM supplier),
    n3 AS (SELECT COUNT(*) AS added FROM supplier WHERE s_suppkey % 3 = 0)
    SELECT 1 AS seq, 'append' AS operation, n.base AS n_rows FROM n
    UNION ALL
    SELECT 2, 'append', n.base + n3.added FROM n, n3
    UNION ALL
    SELECT 3, 'delete',
           n.base + n3.added
           - (SELECT COUNT(*) FROM supplier WHERE s_suppkey % 11 = 0)
           - (SELECT COUNT(*) FROM supplier
              WHERE s_suppkey % 3 = 0 AND (s_suppkey + 10000000) % 11 = 0)
    FROM n, n3
    """,
)
def iceberg_snapshots_audit(spark, sf_dir):
    """Iceberg ``$snapshots`` metadata table x snapshot time travel
    (round-8 capability): every snapshot listed by
    ``iceberg_metadata_table(..., 'snapshots')`` — ordered by sequence
    number, labeled with its summary operation — must time-travel to the
    row count its operation implies (append, append, position-delete).
    A mislabeled summary, a missing snapshot row, or a wrong
    snapshot-id/sequence pairing breaks the hash."""
    from evolution_spark.io.iceberg_meta import (
        append_iceberg_snapshot,
        delete_iceberg_rows,
        iceberg_metadata_table,
        read_iceberg_table,
        write_iceberg_table,
    )

    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    path = query_tmp("icesnaps", sf_dir)
    write_iceberg_table(s, path)
    append_iceberg_snapshot(
        s.where(F.col("s_suppkey") % 3 == 0).select(
            (F.col("s_suppkey") + 10_000_000).alias("s_suppkey"),
            "s_acctbal",
        ),
        path,
    )
    delete_iceberg_rows(spark, path, "s_suppkey % 11 = 0")

    snaps = iceberg_metadata_table(spark, path, "snapshots").select(
        F.col("sequence_number").cast("int").alias("seq"),
        "operation", "snapshot_id",
    )
    ids = {r.seq: r.snapshot_id for r in snaps.collect()}
    legs = [
        read_iceberg_table(spark, path, snapshot_id=ids[seq]).agg(
            F.lit(seq).cast("int").alias("seq"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        for seq in sorted(ids)
    ]
    counts = legs[0]
    for l in legs[1:]:
        counts = counts.unionByName(l)
    return snaps.drop("snapshot_id").join(counts, "seq").select(
        "seq", "operation", "n_rows"
    )


@query(
    "delta_nested_rename_lifecycle",
    oracle="""
    SELECT 'v_pre' AS state, c_mktsegment AS segment, COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents
    FROM customer GROUP BY c_mktsegment
    UNION ALL
    SELECT 'v_renamed', c_mktsegment, COUNT(*),
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
    FROM customer WHERE c_custkey % 6 <> 0 GROUP BY c_mktsegment
    """,
)
def delta_nested_rename_lifecycle(spark, sf_dir):
    """Inner-struct-member RENAME on this engine's OWN table (round-8
    capability — the write-side twin of delta_nested_struct_mapping_read):
    customer lands as ``k`` + ``s struct<bal, seg>``, the mapping upgrade
    stamps ids/physicalNames at every nesting level (metadata-only), the
    inner member renames ``s.bal -> s.balance`` by dotted path, and a
    merge-on-read DELETE then runs against the renamed schema. Leg
    'v_pre' time-travels to the pre-rename version (old inner name, all
    rows); 'v_renamed' reads the final state — inner values must resolve
    through the UNCHANGED physical names or both legs break the hash."""
    from evolution_spark.io.delta_log import (
        delete_delta_rows,
        read_delta_snapshot,
        rename_delta_column,
        upgrade_delta_to_column_mapping,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.struct(
            F.col("c_acctbal").alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        ).alias("s"),
    )
    path = query_tmp("deltanestedren", sf_dir)
    write_delta_snapshot(c, path)
    upgrade_delta_to_column_mapping(path)
    rename_delta_column(path, "s.bal", "balance")
    delete_delta_rows(spark, path, "k % 6 = 0")

    pre = read_delta_snapshot(spark, path, version=0)
    leg0 = pre.groupBy(F.col("s.seg").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("s.bal") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
    ).select(F.lit("v_pre").alias("state"), "segment", "n_rows", "bal_cents")
    cur = read_delta_snapshot(spark, path)
    leg1 = cur.groupBy(F.col("s.seg").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("s.balance") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
    ).select(
        F.lit("v_renamed").alias("state"), "segment", "n_rows", "bal_cents"
    )
    return leg0.unionByName(leg1)


@query(
    "delta_foreign_features_read",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
           strftime(MIN(TIMESTAMP '1995-01-01 00:00:00'
                        + INTERVAL (c_custkey % 48) HOUR),
                    '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(MAX(TIMESTAMP '1995-01-01 00:00:00'
                        + INTERVAL (c_custkey % 48) HOUR),
                    '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM customer GROUP BY c_mktsegment
    """,
)
def delta_foreign_features_read(spark, sf_dir):
    """READ a Delta table exercising the two v3-protocol reader features a
    foreign (e.g. recent-Databricks-written) table most commonly carries
    beyond DVs/columnMapping: ``timestampNtz`` (the schema holds a
    ``timestamp_ntz`` column, which obliges the feature per the spec's
    activation rule — ``write_delta_snapshot`` declares it automatically)
    and ``v2Checkpoint`` (the log's checkpoint is a UUID-named manifest
    whose add actions live in ``_delta_log/_sidecars/`` parquet parts).
    The table lands in three commits (custkey mod-3 slices), is
    checkpointed in V2 form after the second, and the pre-checkpoint JSON
    commits are then DELETED — so the read provably reconstructs state
    through the manifest + both sidecars + the one post-checkpoint JSON
    commit, and the NTZ values must come back bit-exact (a reader that
    decoded them UTC-adjusted would shift every rendered hour). Scale:
    sidecars are the spec's answer to 100 TB logs — file actions split
    across parallel-loadable parts instead of one monolithic checkpoint.
    Ref parity: crates/evolution-target (Delta target is `todo!()` in the
    reference; this surface is native here)."""
    from pathlib import Path

    from evolution_spark.io.delta_log import (
        checkpoint_delta,
        commit_delta,
        read_delta_snapshot,
        upgrade_delta_features,
        write_delta_snapshot,
    )

    def slice_df(mod):
        return (
            table(spark, sf_dir, "customer")
            .where(F.col("c_custkey") % 3 == mod)
            .select(
                "c_custkey",
                "c_mktsegment",
                F.expr(
                    "timestamp_ntz'1995-01-01 00:00:00' "
                    "+ make_interval(0, 0, 0, 0, c_custkey % 48, 0, 0)"
                ).alias("ts"),
            )
        )

    path = query_tmp("deltaforeign", sf_dir)
    write_delta_snapshot(slice_df(0), path)          # v0: declares timestampNtz
    commit_delta(slice_df(1), path, mode="append")   # v1
    upgrade_delta_features(
        path, reader=["v2Checkpoint"], writer=["v2Checkpoint"]
    )                                                # v2
    ck = checkpoint_delta(path, v2=True, sidecar_files=2)
    commit_delta(slice_df(2), path, mode="append")   # v3: post-checkpoint
    log = Path(path) / "_delta_log"
    for v in range(ck["version"] + 1):               # truncate: force the
        (log / f"{v:020d}.json").unlink()            # v2-manifest read path
    back = read_delta_snapshot(spark, path)
    assert dict(back.dtypes)["ts"] == "timestamp_ntz", back.dtypes
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").alias("key_sum"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


def _evolve_array_element(path):
    """Foreign-writer-style evolution of an ARRAY element struct on a
    column-mapped table: logical rename p->pp (physicalName kept), member
    DROP q, member ADD r (fresh physicalName, never stored) — one
    metadata-only commit, the shape a foreign engine's nested ALTER
    leaves behind."""
    import json as _json
    from pathlib import Path as _Path

    from evolution_spark.io.delta_log import _replay_log

    table_dir = _Path(path)
    _, schema_string, _, latest, state = _replay_log(
        table_dir, return_state=True
    )
    sj = _json.loads(schema_string)
    h = next(f for f in sj["fields"] if f["name"] == "h")
    elem = h["type"]["elementType"]
    state_config = dict(
        (state["metadata"].get("configuration")) or {}
    )
    # never regress below the stored maxColumnId: a prior DROP may have
    # retired an id higher than any still visible (review r10 pass 2)
    max_id = max(
        max(int(m) for m in _re_findall_ids(schema_string)),
        int(state_config.get("delta.columnMapping.maxColumnId", 0)),
    )
    new_fields = []
    for f in elem["fields"]:
        if f["name"] == "p":
            # a rename must PIN the stored name as the physical name —
            # element members carry no stamped physicalName at write time
            # (they store their logical names), so the foreign ALTER
            # records it on the renamed field
            meta = dict(f.get("metadata") or {})
            meta.setdefault("delta.columnMapping.physicalName", f["name"])
            new_fields.append(dict(f, name="pp", metadata=meta))
        elif f["name"] == "q":
            continue  # dropped
        else:
            new_fields.append(f)
    new_fields.append({
        "name": "r", "type": "long", "nullable": True,
        "metadata": {"delta.columnMapping.id": max_id + 1,
                     "delta.columnMapping.physicalName":
                         f"col-r-{max_id + 1:x}"},
    })
    elem["fields"] = new_fields
    meta = dict(state["metadata"])
    meta["schemaString"] = _json.dumps(sj)
    # the new member consumed an id: maxColumnId must advance in the SAME
    # commit or the next ADD COLUMN reuses it (duplicate mapping ids —
    # review r10 pass 1)
    config = dict(meta.get("configuration") or {})
    config["delta.columnMapping.maxColumnId"] = str(max_id + 1)
    meta["configuration"] = config
    (table_dir / "_delta_log" / f"{latest + 1:020d}.json").write_text(
        _json.dumps({"metaData": meta}) + "\n"
    )


def _re_findall_ids(schema_string):
    import re as _re

    return _re.findall(r'"delta.columnMapping.id":\s*(\d+)', schema_string)


@query(
    "delta_source_nested_mapping_read",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_alive,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents,
           CAST(SUM(c_custkey % 97) AS BIGINT) AS tag_sum,
           CAST(SUM((c_custkey % 5) + ((c_custkey * 3) % 11)) AS BIGINT)
             AS pp_sum,
           CAST(0 AS BIGINT) AS r_nonnull
    FROM customer WHERE c_custkey % 11 <> 0
    GROUP BY c_mktsegment
    """,
)
def delta_source_nested_mapping_read(spark, sf_dir):
    """NESTED column mapping through the mounted DataSource (the path a
    Spark user actually reads): customer lands as a column-mapped table
    with a struct column ``s<bal, seg, inner<tag>>``, then a nested
    RENAME (``s.bal`` -> ``balance``: pure-rename files resolve via a
    zero-copy Arrow ``view``), a nested DROP (``s.inner.tag`` stays, a
    sibling ``s.seg`` drop forces the struct REBUILD path on the
    pre-drop files), and a DV DELETE (every 11th key) — and the read
    goes through ``spark.read.format("evolution_delta")``, whose
    executors now resolve physical names recursively per file instead of
    refusing nested mapped structs. The oracle pins the survivor set and
    every nested value, so a wrong inner-field resolution (the silent
    failure the old refusal guarded against) fails the hash. Scale: the
    rename is metadata-only; per-file conversion is zero-copy except on
    the rebuilt pre-drop files."""
    from evolution_spark.io.delta_log import (
        delete_delta_rows,
        drop_delta_column,
        rename_delta_column,
        write_delta_snapshot,
    )
    from evolution_spark.io.delta_source import register_delta_source

    register_delta_source(spark)
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.struct(
            F.col("c_acctbal").alias("bal"),
            F.col("c_mktsegment").alias("seg"),
            F.struct((F.col("c_custkey") % 97).alias("tag")).alias("inner"),
        ).alias("s"),
        F.array(
            F.struct((F.col("c_custkey") % 5).alias("p"),
                     (F.col("c_custkey") % 13).alias("q")),
            F.struct(((F.col("c_custkey") * 3) % 11).alias("p"),
                     (F.col("c_custkey") % 17).alias("q")),
        ).alias("h"),
    )
    tmp = query_tmp("deltasrcnested", sf_dir)
    write_delta_snapshot(c.repartition(4), tmp, column_mapping=True)
    rename_delta_column(tmp, "s.bal", "balance")
    drop_delta_column(tmp, "s.seg")
    # round 10: the ARRAY element struct evolves too, foreign-writer
    # style (member rename p->pp, member DROP q, member ADD r never
    # stored) — the source's arrow reader rebuilds the element struct
    # reusing the stored list offsets
    _evolve_array_element(tmp)
    # re-add under a NEW physical name: existing files must NOT resurrect
    # the dropped column's stored data, new files carry the re-added one
    from pyspark.sql.types import StringType

    from evolution_spark.io.delta_log import evolve_delta_schema

    evolve_delta_schema(tmp, [("segment", StringType())])
    delete_delta_rows(spark, tmp, "c_custkey % 11 = 0")
    back = spark.read.format("evolution_delta").load(tmp)
    joined = back.join(
        table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        "c_custkey",
    )
    assert dict(back.dtypes)["segment"] == "string"
    assert "array<struct<pp:bigint,r:bigint>>" == dict(back.dtypes)["h"]
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum(F.round(F.col("s.balance") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
        F.sum("s.inner.tag").alias("tag_sum"),
        F.sum(F.expr(
            "aggregate(transform(h, x -> x.pp), 0L, (a, b) -> a + b)"
        )).alias("pp_sum"),
        F.sum(F.expr(
            "aggregate(transform(h, x -> CASE WHEN x.r IS NULL THEN 0L "
            "ELSE 1L END), 0L, (a, b) -> a + b)"
        )).alias("r_nonnull"),
    )


@query(
    "delta_invariants_enforced",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents,
           1 AS refusals
    FROM customer GROUP BY c_mktsegment
    """,
)
def delta_invariants_enforced(spark, sf_dir):
    """LEGACY COLUMN INVARIANTS enforced at commit (Delta writer-v2's
    oldest obligation, PROTOCOL.md 'Column Invariants'): a hand-aged
    table carries ``delta.invariants: {"expression": {"expression":
    "c_acctbal > -1000"}}`` in the ``c_acctbal`` field metadata — the
    encoding tables created by early Delta releases still hold. A valid
    append commits; an append whose rows violate the invariant REFUSES
    with the first offending row named and publishes no version (the
    caught refusal is pinned into the result as ``refusals``); the final
    state is exactly the valid rows, hash-checked. Before round 9 such a
    table refused ALL writes; now it writes safely under the same
    staged-scan validation CHECK constraints get — one combined scan of
    the staged output, no recompute of the source plan."""
    import json
    from pathlib import Path

    from evolution_spark.io.delta_log import (
        DeltaProtocolError,
        commit_delta,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = query_tmp("deltainv", sf_dir)
    write_delta_snapshot(c.where(F.col("c_custkey") % 2 == 0), path)
    # age the table: stamp the invariant into v0's field metadata (the
    # shape a 2019-era writer left behind)
    log = Path(path) / "_delta_log"
    v0 = log / f"{0:020d}.json"
    lines = []
    for ln in v0.read_text().splitlines():
        a = json.loads(ln)
        if "metaData" in a:
            sj = json.loads(a["metaData"]["schemaString"])
            for f in sj["fields"]:
                if f["name"] == "c_acctbal":
                    f["metadata"]["delta.invariants"] = json.dumps(
                        {"expression": {"expression": "c_acctbal > -1000"}}
                    )
            a["metaData"]["schemaString"] = json.dumps(sj)
        lines.append(json.dumps(a))
    v0.write_text("\n".join(lines) + "\n")
    commit_delta(c.where(F.col("c_custkey") % 2 == 1), path, mode="append")
    refusals = 0
    try:
        commit_delta(
            c.limit(50).withColumn("c_acctbal", F.col("c_acctbal") - 1_000_000),
            path, mode="append",
        )
    except DeltaProtocolError:
        refusals = 1
    back = read_delta_snapshot(spark, path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
        F.lit(refusals).alias("refusals"),
    )


@query(
    "iceberg_v3_dv_read",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_alive,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents,
           MIN(c_custkey) AS min_key
    FROM customer
    WHERE c_custkey % 7 <> 0 AND c_custkey % 11 <> 3
    GROUP BY c_mktsegment
    """,
)
def iceberg_v3_dv_read(spark, sf_dir):
    """Iceberg FORMAT-VERSION 3 deletion vectors (spec v3 'Deletion
    Vectors' + Puffin spec): customer lands as a v2 table, upgrades to v3
    (metadata-only), and two predicate DELETEs commit as Puffin
    roaring-bitmap DVs — manifest entries carrying
    ``referenced_data_file``/``content_offset``/``content_size_in_bytes``
    (spec field-ids 143-145), one blob per data file, CRC-validated on
    read. The second DELETE exercises v3's one-live-DV-per-file
    invariant: existing vectors MERGE into fresh blobs and the commit's
    manifest list drops the superseded DV manifests. The scan decodes
    each blob (cost ∝ deleted rows) and applies positions through the
    same (file, pos) anti-join as v2 position deletes — per-file scoping
    is what makes the delete state distributable at 100 TB. The oracle
    pins the double-survivor set, so a mis-merged or mis-scoped vector
    fails the hash. Non-DV writes to v3 tables refuse (row lineage is a
    writer obligation this engine does not take on)."""
    from evolution_spark.io.iceberg_meta import (
        delete_iceberg_rows_dv,
        read_iceberg_table,
        upgrade_iceberg_format_version,
        write_iceberg_table,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = query_tmp("icev3dv", sf_dir)
    write_iceberg_table(c.repartition(4), path)
    upgrade_iceberg_format_version(path)
    delete_iceberg_rows_dv(spark, path, "c_custkey % 7 = 0")
    delete_iceberg_rows_dv(spark, path, "c_custkey % 11 = 3")
    back = read_iceberg_table(spark, path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
    )


@query(
    "delta_generated_columns_enforced",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents,
           1 AS refusals
    FROM customer GROUP BY c_mktsegment
    """,
)
def delta_generated_columns_enforced(spark, sf_dir):
    """GENERATED COLUMNS enforced at commit (Delta PROTOCOL.md 'Generated
    Columns', writer v4 / the v7 ``generatedColumns`` feature): a
    hand-aged table carries ``delta.generationExpression = "CAST(ROUND(
    c_acctbal * 100) AS BIGINT)"`` on its ``bal_cents`` field — the shape
    a foreign writer's ``GENERATED ALWAYS AS`` DDL leaves behind. A valid
    append (provided values null-safe-EQUAL the expression on every row)
    commits; an append whose values diverge REFUSES with the offending
    row named and publishes no version (the caught refusal is pinned into
    the result as ``refusals``). Before round 10 such tables refused ALL
    writes; now they write safely under the same staged-scan validation
    CHECK constraints and invariants get — one combined scan of the
    already-materialized staged output, no recompute of the source plan,
    no extra shuffle. Ref parity: crates/evolution-target (the
    reference's Delta target is `todo!()`; this surface is native
    here)."""
    import json
    from pathlib import Path

    from evolution_spark.io.delta_log import (
        DeltaProtocolError,
        commit_delta,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    gen_expr = "CAST(ROUND(c_acctbal * 100) AS BIGINT)"
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.expr(gen_expr).alias("bal_cents"),
    )
    path = query_tmp("deltagen", sf_dir)
    write_delta_snapshot(c.where(F.col("c_custkey") % 2 == 0), path)
    # age the table: stamp the generation expression into v0's field
    # metadata (what a foreign GENERATED ALWAYS AS column looks like)
    log = Path(path) / "_delta_log"
    v0 = log / f"{0:020d}.json"
    lines = []
    for ln in v0.read_text().splitlines():
        a = json.loads(ln)
        if "metaData" in a:
            sj = json.loads(a["metaData"]["schemaString"])
            for f in sj["fields"]:
                if f["name"] == "bal_cents":
                    f["metadata"]["delta.generationExpression"] = gen_expr
            a["metaData"]["schemaString"] = json.dumps(sj)
        lines.append(json.dumps(a))
    v0.write_text("\n".join(lines) + "\n")
    commit_delta(c.where(F.col("c_custkey") % 2 == 1), path, mode="append")
    refusals = 0
    try:
        commit_delta(
            c.limit(50).withColumn("bal_cents", F.col("bal_cents") + 1),
            path, mode="append",
        )
    except DeltaProtocolError:
        refusals = 1
    back = read_delta_snapshot(spark, path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("bal_cents").alias("bal_cents"),
        F.lit(refusals).alias("refusals"),
    )


@query(
    "iceberg_v3_append",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_alive,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents,
           MAX(c_custkey) AS max_key
    FROM customer
    WHERE c_custkey % 9 <> 4
    GROUP BY c_mktsegment
    """,
)
def iceberg_v3_append(spark, sf_dir):
    """Iceberg FORMAT-VERSION 3 APPENDS with ROW LINEAGE (spec v3 'Row
    Lineage' — round 10; closes the v3 write refusal the round-9 verdict
    ranked #2): customer lands as a v2 table (one third), upgrades to v3
    (metadata-only, ``next-row-id`` initialized), then TWO v3 appends
    commit the remaining thirds — each added data file gets an explicit
    ``first_row_id`` (spec field-id 142), the new data manifest's
    manifest-list entry carries the manifest's base id (field-id 520),
    the snapshot records ``first-row-id``, and the table's
    ``next-row-id`` advances by exactly the appended row count (asserted
    inline). A Puffin DV DELETE then proves lineage bookkeeping composes
    with merge-on-read state (DV commits assign no ids). Scale: lineage
    assignment is driver-side integer bookkeeping over manifest entries —
    no data file is read or rewritten, so v3 append cost equals v2 append
    cost at any table size. Pre-upgrade files keep null lineage until a
    rewrite assigns ids (spec-legal; round 11 made rewrites
    lineage-preserving — see iceberg_v3_compaction_lifecycle). Ref parity:
    crates/evolution-target (the reference's Iceberg target is
    ``todo!()``; this surface is native here)."""
    from pathlib import Path

    from evolution_spark.io.iceberg_meta import (
        _load_metadata,
        append_iceberg_snapshot,
        delete_iceberg_rows_dv,
        read_iceberg_table,
        upgrade_iceberg_format_version,
        write_iceberg_table,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = query_tmp("icev3app", sf_dir)
    write_iceberg_table(c.where(F.col("c_custkey") % 3 == 0), path)  # v2 era
    upgrade_iceberg_format_version(path)
    n1 = c.where(F.col("c_custkey") % 3 == 1).count()
    append_iceberg_snapshot(c.where(F.col("c_custkey") % 3 == 1), path)
    meta, _ = _load_metadata(Path(path))
    assert int(meta["next-row-id"]) == n1, (meta.get("next-row-id"), n1)
    n2 = c.where(F.col("c_custkey") % 3 == 2).count()
    append_iceberg_snapshot(c.where(F.col("c_custkey") % 3 == 2), path)
    delete_iceberg_rows_dv(spark, path, "c_custkey % 9 = 4")
    meta2, _ = _load_metadata(Path(path))
    assert int(meta2["next-row-id"]) == n1 + n2  # DV delete assigned nothing
    back = read_iceberg_table(spark, path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "iceberg_v3_compaction_lifecycle",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_alive,
           CAST(SUM(CAST(ROUND(
               (c_acctbal
                + CASE WHEN c_custkey % 7 = 3 THEN 1000 ELSE 0 END) * 100
           ) AS BIGINT)) AS BIGINT) AS bal_cents,
           MAX(c_custkey) AS max_key
    FROM customer
    WHERE c_custkey % 9 <> 4
    GROUP BY c_mktsegment
    """,
)
def iceberg_v3_compaction_lifecycle(spark, sf_dir):
    """Iceberg v3 ROW-LINEAGE-PRESERVING REWRITES (round 11; closes the
    last v3 maintenance refusal the round-10 verdict ranked #1): customer
    lands across eras (v2 write -> upgrade -> two v3 appends), a DV
    DELETE kills ``c_custkey % 9 = 4``, a merge-on-read UPDATE bumps
    ``c_acctbal`` by 1000 for ``c_custkey % 7 = 3`` (old versions die as
    merged deletion vectors; new versions MATERIALIZE the carried
    ``_row_id`` per spec 'Row Lineage'), then COMPACTION rewrites the
    live set into 4 files, materializing every surviving row's
    ``_row_id``/``_last_updated_sequence_number`` under the spec's
    reserved parquet field-ids (2147483540/2147483539). Inline asserts
    prove (a) every pre-compaction id survives the rewrite on the SAME
    row — a distributed anti-join, zero mismatches — and (b) the
    post-compaction table has a non-null unique id per row (pre-upgrade
    rows acquired fresh ids via the new files' first_row_id + position).
    The oracle checks the DATA the rewrites produced; the asserts check
    the lineage the oracle cannot see (ids are engine-assigned). Scale:
    compaction is a distributed read->write of live files only; the
    lineage projection is a broadcast file-map join, no extra shuffle.
    Ref parity: the reference's Iceberg target is ``todo!()``
    (examples/iceberg/src/main.rs:28-30)."""
    from evolution_spark.io.iceberg_meta import (
        append_iceberg_snapshot,
        compact_iceberg_table,
        delete_iceberg_rows,
        read_iceberg_table,
        update_iceberg_rows,
        upgrade_iceberg_format_version,
        write_iceberg_table,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = query_tmp("icev3cmp", sf_dir)
    write_iceberg_table(c.where(F.col("c_custkey") % 3 == 0), path)
    upgrade_iceberg_format_version(path)
    append_iceberg_snapshot(c.where(F.col("c_custkey") % 3 == 1), path)
    append_iceberg_snapshot(c.where(F.col("c_custkey") % 3 == 2), path)
    delete_iceberg_rows(spark, path, "c_custkey % 9 = 4")  # -> DVs on v3
    update_iceberg_rows(
        spark, path, "c_custkey % 7 = 3", {"c_acctbal": "c_acctbal + 1000"}
    )
    pre = (
        read_iceberg_table(spark, path, row_lineage=True)
        .select("c_custkey", "_row_id", "_last_updated_sequence_number")
        .where(F.col("_row_id").isNotNull())
        .localCheckpoint(eager=True)  # pin: the compaction replaces state
    )
    compact_iceberg_table(spark, path, target_files=4)
    post = read_iceberg_table(spark, path, row_lineage=True)
    lost = (
        pre.alias("a")
        .join(post.alias("b"), "c_custkey")
        .where(
            (F.col("a._row_id") != F.col("b._row_id"))
            | (
                F.col("a._last_updated_sequence_number")
                != F.col("b._last_updated_sequence_number")
            )
        )
        .count()
    )
    assert lost == 0, f"{lost} rows changed lineage across compaction"
    stats = post.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("_row_id").alias("n_ids"),
        F.count_distinct("_row_id").alias("n_distinct"),
    ).collect()[0]
    assert stats["n"] == stats["n_ids"] == stats["n_distinct"], stats
    # return a plain (no-lineage) read: the lineage projection above is
    # for the asserts only, and keeping it in the returned plan leaves a
    # dead per-row _metadata struct build Catalyst does not eliminate
    post = read_iceberg_table(spark, path)
    return post.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "iceberg_v3_default_values",
    oracle="""
    SELECT c_mktsegment,
           CASE WHEN c_custkey % 3 = 1 THEN 'active' ELSE 'legacy' END
             AS tier,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN c_custkey % 3 = 1 THEN 5000 ELSE 2500 END)
                AS BIGINT) AS bonus_cents,
           MAX(c_custkey) AS max_key
    FROM customer
    GROUP BY c_mktsegment,
             CASE WHEN c_custkey % 3 = 1 THEN 'active' ELSE 'legacy' END
    """,
)
def iceberg_v3_default_values(spark, sf_dir):
    """Iceberg v3 COLUMN DEFAULTS, both directions (spec v3 'Default
    values' — round 11 read, round 12 write): a third of customer lands
    BEFORE the columns exist, the table upgrades to v3 and ADD COLUMNs
    ``tier`` (string, default 'legacy'), ``bonus`` (double, default
    25.0) and ``joined`` (date default) — the defaults land as
    ``initial-default``/``write-default`` on the new schema fields,
    metadata-only — then one third appends WITH explicit values and the
    last third appends OMITTING the three columns entirely: the commit
    fills them from ``write-default`` (physically written — the file
    claims the current schema, so the read-side realign would never
    inject for it; reaching the same aggregate proves the write fill).
    The read realigns pre-evolution files by field id and injects each
    field's ``initial-default`` instead of null (the v3 reader rule), on
    BOTH the library reader and the ``evolution_iceberg`` DataSource
    (asserted equal inline; the date defaults are asserted inline too
    since DuckDB sees no date column). Scale: defaults are literals in
    the realign projection / append projection — zero data rewritten at
    ADD COLUMN time. Ref parity: the reference's Iceberg target is
    ``todo!()`` (examples/iceberg/src/main.rs:28-30)."""
    import datetime

    from evolution_spark.io.iceberg_meta import (
        append_iceberg_snapshot,
        evolve_iceberg_schema,
        read_iceberg_table,
        upgrade_iceberg_format_version,
        write_iceberg_table,
    )

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    path = query_tmp("icev3def", sf_dir)
    write_iceberg_table(c.where(F.col("c_custkey") % 3 == 0), path)
    upgrade_iceberg_format_version(path)
    evolve_iceberg_schema(path, [
        ("tier", "string", "legacy"),
        ("bonus", "double", 25.0),
        ("joined", "date", datetime.date(2020, 1, 2)),
    ])
    append_iceberg_snapshot(
        c.where(F.col("c_custkey") % 3 == 1).select(
            "c_custkey", "c_mktsegment",
            F.lit("active").alias("tier"),
            F.lit(50.0).alias("bonus"),
            F.lit(datetime.date(2024, 5, 5)).alias("joined"),
        ),
        path,
    )
    # round-12 write leg: OMIT the three default-bearing columns — the
    # commit must fill them from write-default (or refuse; pre-round-12
    # this raised a schema mismatch)
    append_iceberg_snapshot(c.where(F.col("c_custkey") % 3 == 2), path)
    back = read_iceberg_table(spark, path)
    # the date default applied to every pre-evolution row AND every
    # write-default-filled row (inline — the oracle has no date column)
    dates = back.agg(
        F.min(F.when(F.col("tier") == "legacy", F.col("joined"))).alias("lo"),
        F.max(F.when(F.col("tier") == "legacy", F.col("joined"))).alias("hi"),
        F.sum(F.col("joined").isNull().cast("bigint")).alias("nulls"),
    ).collect()[0]
    assert str(dates["lo"]) == str(dates["hi"]) == "2020-01-02", dates
    assert dates["nulls"] == 0, dates
    # the DataSource path injects the same defaults
    from evolution_spark.io.iceberg_source import EvolutionIcebergDataSource

    spark.dataSource.register(EvolutionIcebergDataSource)
    src = spark.read.format("evolution_iceberg").load(path)
    assert (
        src.exceptAll(back).isEmpty() and back.exceptAll(src).isEmpty()
    ), "DataSource read diverges from the library reader under defaults"
    return back.groupBy("c_mktsegment", "tier").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("bonus") * 100).cast("bigint")).alias(
            "bonus_cents"
        ),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "delta_identity_columns",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           COUNT(*) AS n_uid_distinct,
           CAST(0 AS BIGINT) AS misaligned,
           CAST(0 AS BIGINT) AS below_mark,
           1 AS refusals
    FROM customer GROUP BY c_mktsegment
    """,
)
def delta_identity_columns(spark, sf_dir):
    """IDENTITY COLUMNS managed at commit (Delta PROTOCOL.md 'Identity
    Columns', writer v6 / the v7 ``identityColumns`` feature — round 10;
    the last writer feature this engine refused): a hand-aged table
    carries ``delta.identity.start=10, step=10, highWaterMark,
    allowExplicitInsert=false`` on ``uid``. An append that OMITS the
    column gets writer-assigned values — unique, strictly beyond the high
    water mark, and start+k*step aligned (all three properties checked in
    the returned aggregation: ``n_uid_distinct`` must equal ``n_rows``,
    ``misaligned`` and ``below_mark`` must be 0) — and the mark advances
    via a metaData action in the SAME commit, so a crash between commits
    can never reassign ids. An explicit insert REFUSES (GENERATED ALWAYS;
    pinned as ``refusals``). Scale: generation is
    ``monotonically_increasing_id``-based — zero shuffle, values sparse
    but spec-legal (uniqueness + alignment, not density); the mark update
    is driver-side footer-stats arithmetic. Ref parity:
    crates/evolution-target (Delta target is ``todo!()`` in the
    reference)."""
    import json
    from pathlib import Path

    from evolution_spark.io.delta_log import (
        DeltaProtocolError,
        _replay_log,
        commit_delta,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    even = c.where(F.col("c_custkey") % 2 == 0)
    odd = c.where(F.col("c_custkey") % 2 == 1)
    hwm = even.agg(F.max(F.col("c_custkey") * 10)).collect()[0][0]
    path = query_tmp("deltaident", sf_dir)
    write_delta_snapshot(
        even.select((F.col("c_custkey") * 10).alias("uid"),
                    F.col("c_custkey").alias("k"), "c_mktsegment"),
        path,
    )
    log = Path(path) / "_delta_log"
    v0 = log / f"{0:020d}.json"
    lines = []
    for ln in v0.read_text().splitlines():
        a = json.loads(ln)
        if "metaData" in a:
            sj = json.loads(a["metaData"]["schemaString"])
            for f in sj["fields"]:
                if f["name"] == "uid":
                    f["metadata"] = {
                        "delta.identity.start": 10,
                        "delta.identity.step": 10,
                        "delta.identity.highWaterMark": int(hwm),
                        "delta.identity.allowExplicitInsert": False,
                    }
            a["metaData"]["schemaString"] = json.dumps(sj)
        lines.append(json.dumps(a))
    v0.write_text("\n".join(lines) + "\n")
    # generated append: the writer assigns uid (column omitted)
    commit_delta(
        odd.select(F.col("c_custkey").alias("k"), "c_mktsegment"),
        path, mode="append",
    )
    refusals = 0
    try:
        commit_delta(
            odd.limit(5).select(F.lit(99999).cast("long").alias("uid"),
                                F.col("c_custkey").alias("k"),
                                "c_mktsegment"),
            path, mode="append",
        )
    except DeltaProtocolError:
        refusals = 1
    # the mark advanced in the generated commit
    _, ss, _, _, _ = _replay_log(Path(path), return_state=True)
    f = next(f for f in json.loads(ss)["fields"] if f["name"] == "uid")
    assert f["metadata"]["delta.identity.highWaterMark"] > int(hwm)

    # COLUMN-MAPPED leg (round 11 — the identity x columnMapping refusal
    # is lifted): a second table upgrades to name mapping, RENAMES the
    # identity column (physical != logical), then a generated append must
    # still assign unique aligned values and advance the mark, which now
    # requires the physical-name footer-stats lookup. Inline-asserted so
    # the oracle (which checks the MAIN table's data) stays unchanged.
    from evolution_spark.io.delta_log import (
        _schema_identity_columns,
        rename_delta_column,
        upgrade_delta_to_column_mapping,
    )

    mpath = query_tmp("deltaidentmap", sf_dir)
    mseed = even.limit(50).select(
        (F.col("c_custkey") * 10).alias("uid"),
        F.col("c_custkey").alias("k"),
    ).localCheckpoint(eager=True)  # pin: limit() must not re-evaluate
    mhwm = int(mseed.agg(F.max("uid")).collect()[0][0])
    write_delta_snapshot(mseed, mpath)
    upgrade_delta_to_column_mapping(mpath)
    rename_delta_column(mpath, "uid", "user_id")
    mlog = Path(mpath) / "_delta_log"
    _, mss, _, mlatest, mst = _replay_log(Path(mpath), return_state=True)
    msj = json.loads(mss)
    for fld in msj["fields"]:
        if fld["name"] == "user_id":
            fm = dict(fld.get("metadata") or {})
            fm.update({
                "delta.identity.start": 10, "delta.identity.step": 10,
                "delta.identity.highWaterMark": mhwm,
                "delta.identity.allowExplicitInsert": False,
            })
            fld["metadata"] = fm
    mmeta = dict(mst["metadata"])
    mmeta["schemaString"] = json.dumps(msj)
    mproto = mst["protocol"]
    (mlog / f"{mlatest + 1:020d}.json").write_text(
        json.dumps({"protocol": {
            "minReaderVersion": int(mproto.get("minReaderVersion", 2)),
            "minWriterVersion": 7,
            **({"readerFeatures": mproto["readerFeatures"]}
               if mproto.get("readerFeatures") else {}),
            "writerFeatures": sorted(
                set(mproto.get("writerFeatures") or [])
                | {"identityColumns", "columnMapping"}
            )}}) + "\n" + json.dumps({"metaData": mmeta}) + "\n"
    )
    commit_delta(
        odd.limit(40).select(F.col("c_custkey").alias("k")), mpath,
        mode="append",
    )
    mrows = read_delta_snapshot(spark, mpath).where("user_id is not null")
    mstats = mrows.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("nd"),
        F.sum(((F.col("user_id") % 10) != 0).cast("bigint")).alias("mis"),
    ).collect()[0]
    assert mstats["n"] == mstats["nd"] and mstats["mis"] == 0, mstats
    mident = _schema_identity_columns(
        _replay_log(Path(mpath), return_state=True)[1]
    )
    assert mident["user_id"]["high"] is not None  # mark advanced, logical key

    back = read_delta_snapshot(spark, path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("uid").alias("n_uid_distinct"),
        F.sum(((F.col("uid") % 10) != 0).cast("bigint")).alias("misaligned"),
        F.sum(((F.col("k") % 2 == 1) & (F.col("uid") <= F.lit(int(hwm))))
              .cast("bigint")).alias("below_mark"),
        F.lit(refusals).alias("refusals"),
    )


@query(
    "delta_type_widening_read",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS cents_sum,
           MAX(c_custkey) AS max_key
    FROM customer GROUP BY c_mktsegment
    """,
)
def delta_type_widening_read(spark, sf_dir):
    """TYPE WIDENING reads (Delta PROTOCOL.md 'Type Widening', the
    ``typeWidening`` reader+writer feature — round 10; the last
    non-ignorable reader feature this engine refused): customer lands in
    an INT-era snapshot (``k`` int, ``cents`` int), a foreign ALTER
    widens both to long (``delta.typeChanges`` recorded per field,
    protocol upgraded to v3/v7 + typeWidening), and a post-widening
    append writes the current wide types — so the read decodes MIXED
    int32/int64 files under one long schema. Spark 4's parquet vectorized
    reader performs the spec's conversions natively (integer widenings,
    float->double, decimal growth, date->timestamp_ntz), so the plan
    stays a plain scan — zero extra cost at 100 TB. Conversions the
    reader cannot perform (int->double/decimal) refuse at the METADATA
    level, naming the pair, instead of failing per file mid-scan. Ref
    parity: crates/evolution-target (Delta target is ``todo!()`` in the
    reference)."""
    import json
    from pathlib import Path

    from evolution_spark.io.delta_log import (
        commit_delta,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = query_tmp("deltawiden", sf_dir)
    write_delta_snapshot(
        c.where(F.col("c_custkey") % 2 == 0).select(
            F.col("c_custkey").cast("int").alias("k"),
            "c_mktsegment",
            F.round(F.col("c_acctbal") * 100).cast("int").alias("cents"),
        ),
        path,
    )
    log = Path(path) / "_delta_log"
    v0 = (log / f"{0:020d}.json").read_text().splitlines()
    meta = next(json.loads(l) for l in v0 if "metaData" in l)
    sj = json.loads(meta["metaData"]["schemaString"])
    for f in sj["fields"]:
        if f["name"] in ("k", "cents"):
            f["type"] = "long"
            f["metadata"] = {"delta.typeChanges": [
                {"fromType": "integer", "toType": "long", "tableVersion": 1}
            ]}
    meta["metaData"]["schemaString"] = json.dumps(sj)
    (log / f"{1:020d}.json").write_text(
        json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["typeWidening"],
            "writerFeatures": ["typeWidening"]}}) + "\n"
        + json.dumps(meta) + "\n"
    )
    commit_delta(
        c.where(F.col("c_custkey") % 2 == 1).select(
            F.col("c_custkey").alias("k"),
            "c_mktsegment",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        ),
        path, mode="append",
    )
    back = read_delta_snapshot(spark, path)
    assert dict(back.dtypes)["k"] == "bigint"
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("cents_sum"),
        F.max("k").alias("max_key"),
    )


@query(
    "delta_in_commit_timestamps",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents,
           4 AS stamped_commits
    FROM customer WHERE c_custkey % 10 <> 7
    GROUP BY c_mktsegment
    """,
)
def delta_in_commit_timestamps(spark, sf_dir):
    """IN-COMMIT TIMESTAMPS (Delta PROTOCOL.md 'In-Commit Timestamps',
    the v7 ``inCommitTimestamp`` writer feature — round 10): a table
    created with ``delta.enableInCommitTimestamps`` gets
    ``commitInfo.inCommitTimestamp`` stamped on EVERY commit — creation,
    appends, and the DV DELETE — each strictly greater than the previous
    (the spec's fix for file-mtime clock skew in timestamp-based time
    travel; same-millisecond commits still advance by +1). The
    monotone-chain property is asserted inline and the stamped-commit
    count is pinned into the oracle-checked result. Scale: stamping reads
    ONE metadata-sized JSON (the previous commit) per publish — no data
    I/O. Ref parity: crates/evolution-target (Delta target is
    ``todo!()`` in the reference)."""
    import json
    from pathlib import Path

    from evolution_spark.io.delta_log import (
        commit_delta,
        delete_delta_rows,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = query_tmp("deltaict", sf_dir)
    write_delta_snapshot(
        c.where(F.col("c_custkey") % 3 == 0), path,
        configuration={"delta.enableInCommitTimestamps": "true"},
    )                                                              # v0
    commit_delta(c.where(F.col("c_custkey") % 3 == 1), path,
                 mode="append")                                    # v1
    commit_delta(c.where(F.col("c_custkey") % 3 == 2), path,
                 mode="append")                                    # v2
    delete_delta_rows(spark, path, "c_custkey % 10 = 7")           # v3+DV
    log = Path(path) / "_delta_log"
    icts = []
    for p in sorted(log.glob("*.json")):
        for ln in p.read_text().splitlines():
            a = json.loads(ln)
            if "commitInfo" in a and "inCommitTimestamp" in a["commitInfo"]:
                icts.append(a["commitInfo"]["inCommitTimestamp"])
    assert all(b > a for a, b in zip(icts, icts[1:])), icts
    back = read_delta_snapshot(spark, path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
        F.lit(len(icts)).alias("stamped_commits"),
    )


@query(
    "delta_row_tracking_append",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents,
           (SELECT COUNT(*) - 1 FROM customer WHERE c_custkey % 3 <> 0)
             AS row_id_mark
    FROM customer GROUP BY c_mktsegment
    """,
)
def delta_row_tracking_append(spark, sf_dir):
    """ROW TRACKING writes (Delta PROTOCOL.md 'Row Tracking', the v7
    ``rowTracking`` feature — round 10; with domainMetadata this
    completes the writer-feature surface): a foreign table upgrades to
    rowTracking AFTER its first slice lands, then TWO appends get
    writer-assigned ``baseRowId`` spans — contiguous, starting at the
    ``delta.rowTracking`` domain's ``rowIdHighWaterMark`` + 1, with
    ``defaultRowCommitVersion`` stamped — and the mark advances via a
    domainMetadata action in the SAME commit, so the final mark equals
    (rows appended under the feature) - 1 (oracle-checked via a scalar
    subquery). Contiguity/versions are asserted inline. Rewrites
    (OPTIMIZE/UPDATE/MERGE) preserve carried rows' materialized ids
    since round 11 (see delta_row_tracking_optimize); DV deletes re-add
    the same file and keep its baseRowId.
    Scale: assignment is driver-side footer-stat arithmetic,
    one domainMetadata action per commit. Ref parity:
    crates/evolution-target (Delta target is ``todo!()``)."""
    import json
    from pathlib import Path

    from evolution_spark.io.delta_log import (
        _replay_log,
        commit_delta,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = query_tmp("deltarowtrack", sf_dir)
    write_delta_snapshot(c.where(F.col("c_custkey") % 3 == 0), path)  # v0
    log = Path(path) / "_delta_log"
    (log / f"{1:020d}.json").write_text(json.dumps({"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["rowTracking", "domainMetadata"],
        "writerFeatures": ["rowTracking", "domainMetadata"]}}) + "\n")
    commit_delta(c.where(F.col("c_custkey") % 3 == 1), path,
                 mode="append")                                       # v2
    commit_delta(c.where(F.col("c_custkey") % 3 == 2), path,
                 mode="append")                                       # v3
    # inline: spans contiguous per commit, versions stamped, mark exact
    spans = {}
    for p in sorted(log.glob("*.json")):
        v = int(p.stem)
        for ln in p.read_text().splitlines():
            a = json.loads(ln)
            if "add" in a and "baseRowId" in a["add"]:
                assert a["add"]["defaultRowCommitVersion"] == v
                n = json.loads(a["add"]["stats"])["numRecords"]
                spans.setdefault(v, []).append(
                    (a["add"]["baseRowId"], n)
                )
    flat = sorted(x for vs in spans.values() for x in vs)
    rid = 0
    for base, n in flat:
        assert base == rid, (base, rid)
        rid += n
    _, _, _, _, st = _replay_log(Path(path), return_state=True)
    mark = json.loads(st["domain_metadata"]["delta.rowTracking"][
        "configuration"])["rowIdHighWaterMark"]
    assert mark == rid - 1
    back = read_delta_snapshot(spark, path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
        F.lit(int(mark)).alias("row_id_mark"),
    )


@query(
    "delta_row_tracking_optimize",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_alive,
           CAST(SUM(CAST(ROUND(
               (c_acctbal
                + CASE WHEN c_custkey % 7 = 3 THEN 1000 ELSE 0 END) * 100
           ) AS BIGINT)) AS BIGINT) AS bal_cents,
           MAX(c_custkey) AS max_key
    FROM customer
    WHERE c_custkey % 9 <> 4
    GROUP BY c_mktsegment
    """,
)
def delta_row_tracking_optimize(spark, sf_dir):
    """Delta ROW-TRACKING-PRESERVING REWRITES (PROTOCOL.md 'Row
    Tracking' — round 11; closes the rewrite refusal the round-10
    verdict ranked #2): customer lands across eras (plain write ->
    rowTracking protocol upgrade -> two tracked appends), a DV DELETE
    kills ``c_custkey % 9 = 4`` (files re-added with their baseRowId), a
    merge-on-read UPDATE bumps ``c_acctbal`` by 1000 for
    ``c_custkey % 7 = 3`` (updated copies MATERIALIZE the carried
    ``_row_id``, commit version resets to the UPDATE's), then OPTIMIZE
    rewrites the live set into 4 files, materializing every surviving
    row's id/commit-version under the configuration's
    ``delta.rowTracking.materializedRow*ColumnName`` columns (assigned
    idempotently, recorded via a metaData commit). Inline asserts prove
    (a) zero rows changed (id, commit version) across the OPTIMIZE —
    a distributed join — and (b) the post-OPTIMIZE table has a non-null
    unique id per row (pre-feature rows acquired fresh ids via the new
    adds' baseRowId + position). The oracle checks the DATA; the asserts
    check the lineage the oracle cannot see (ids are writer-assigned).
    Scale: lineage is a broadcast file-map join over footer positions;
    the OPTIMIZE write is distributed; the log work is metadata-sized.
    Ref parity: the reference's Delta target is ``todo!()``
    (examples/delta/src/main.rs:28-30)."""
    import json
    from pathlib import Path

    from evolution_spark.io.delta_log import (
        commit_delta,
        delete_delta_rows,
        optimize_delta,
        read_delta_row_lineage,
        read_delta_snapshot,
        update_delta_rows,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = query_tmp("deltartopt", sf_dir)
    write_delta_snapshot(c.where(F.col("c_custkey") % 3 == 0), path)  # v0
    log = Path(path) / "_delta_log"
    (log / f"{1:020d}.json").write_text(json.dumps({"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["rowTracking", "domainMetadata"],
        "writerFeatures": ["rowTracking", "domainMetadata"]}}) + "\n")
    commit_delta(c.where(F.col("c_custkey") % 3 == 1), path, mode="append")
    commit_delta(c.where(F.col("c_custkey") % 3 == 2), path, mode="append")
    delete_delta_rows(spark, path, "c_custkey % 9 = 4")  # DV, ids kept
    update_delta_rows(
        spark, path, "c_custkey % 7 = 3", {"c_acctbal": "c_acctbal + 1000"}
    )
    pre = (
        read_delta_row_lineage(spark, path)
        .select("c_custkey", "_row_id", "_row_commit_version")
        .where(F.col("_row_id").isNotNull())
        .localCheckpoint(eager=True)  # pin: OPTIMIZE replaces the state
    )
    optimize_delta(spark, path, target_files=4)
    post = read_delta_row_lineage(spark, path)
    lost = (
        pre.alias("a")
        .join(post.alias("b"), "c_custkey")
        .where(
            (F.col("a._row_id") != F.col("b._row_id"))
            | (
                F.col("a._row_commit_version")
                != F.col("b._row_commit_version")
            )
        )
        .count()
    )
    assert lost == 0, f"{lost} rows changed lineage across OPTIMIZE"
    stats = post.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("_row_id").alias("n_ids"),
        F.count_distinct("_row_id").alias("n_distinct"),
    ).collect()[0]
    assert stats["n"] == stats["n_ids"] == stats["n_distinct"], stats
    back = read_delta_snapshot(spark, path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "delta_variant_read",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents,
           MAX(c_custkey) AS max_key
    FROM customer WHERE c_custkey % 6 <> 3
    GROUP BY c_mktsegment
    """,
)
def delta_variant_read(spark, sf_dir):
    """VARIANT columns through the native Delta writer/reader (Delta
    PROTOCOL.md 'Variant Data Type', the ``variantType`` reader+writer
    feature — round 10; with this, every stable v7 feature except
    collations is implemented): customer rows land with a ``v`` VARIANT
    column built by ``parse_json`` (Spark 4's VariantType maps 1:1 —
    schema json type ``variant``, parquet physical = the spec's
    value/metadata binary group), the creation commit AUTO-DECLARES the
    feature in both sets (activation rule, like timestampNtz), an append
    and a DV DELETE exercise the lifecycle, and the final aggregation
    groups by a STRING EXTRACTED FROM INSIDE the variant
    (``variant_get(v, '$.seg', 'string')``) with sums over
    ``variant_get(v, '$.cents', 'long')`` — so a mis-decoded binary fails
    the hash. Footer stats for variant files come from one Spark-side
    count scan of the staged output (pyarrow cannot parse the VARIANT
    logical type), so adds keep numRecords and the commit path stays
    driver-light. Ref parity: crates/evolution-target (Delta target is
    ``todo!()``)."""
    from evolution_spark.io.delta_log import (
        commit_delta,
        delete_delta_rows,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.parse_json(F.concat(
            F.lit('{"seg": "'), F.col("c_mktsegment"),
            F.lit('", "cents": '),
            F.round(F.col("c_acctbal") * 100).cast("bigint").cast("string"),
            F.lit('}'),
        )).alias("v"),
    )
    path = query_tmp("deltavariant", sf_dir)
    write_delta_snapshot(c.where(F.col("c_custkey") % 2 == 0), path)
    commit_delta(c.where(F.col("c_custkey") % 2 == 1), path, mode="append")
    delete_delta_rows(spark, path, "c_custkey % 6 = 3")
    back = read_delta_snapshot(spark, path)
    return back.groupBy(
        F.expr("variant_get(v, '$.seg', 'string')").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr("variant_get(v, '$.cents', 'long')")).alias(
            "bal_cents"
        ),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "delta_multipart_checkpoint_read",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents,
           MIN(c_custkey) AS min_key
    FROM customer GROUP BY c_mktsegment
    """,
)
def delta_multipart_checkpoint_read(spark, sf_dir):
    """Classic MULTI-PART checkpoint reads (Delta spec checkpoint naming
    ``<v>.checkpoint.<part>.<parts>.parquet`` + the ``parts`` field in
    ``_last_checkpoint`` — round 10, ADVICE r09 high): customer lands in
    three commits, is checkpointed, and the single-file checkpoint is
    rewritten as a foreign writer's THREE-part set (contiguous row
    slices, spec zero-padding); the pre-checkpoint JSON commits are then DELETED,
    so the read provably reconstructs the live set from ALL parts — a
    reader that picked one part (the pre-fix glob behavior) would return
    a silently partial table and fail the hash. An incomplete part set
    refuses loudly (asserted inline). Scale: multi-part checkpoints are
    the spec's pre-V2 answer to huge logs — parts load independently.
    Ref parity: crates/evolution-target (Delta target is ``todo!()``)."""
    import json
    from pathlib import Path

    import pyarrow.parquet as papq

    from evolution_spark.io.delta_log import (
        checkpoint_delta,
        commit_delta,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = query_tmp("deltampckpt", sf_dir)
    write_delta_snapshot(c.where(F.col("c_custkey") % 3 == 0), path)
    commit_delta(c.where(F.col("c_custkey") % 3 == 1), path, mode="append")
    commit_delta(c.where(F.col("c_custkey") % 3 == 2), path, mode="append")
    ck = checkpoint_delta(path)
    log = Path(path) / "_delta_log"
    v = ck["version"]
    single = log / f"{v:020d}.checkpoint.parquet"
    t = papq.read_table(single)
    n_parts = 3
    rows_per = max(1, (t.num_rows + n_parts - 1) // n_parts)
    for i in range(n_parts):
        papq.write_table(
            t.slice(i * rows_per, rows_per),
            log / f"{v:020d}.checkpoint.{i + 1:010d}.{n_parts:010d}.parquet",
        )
    single.unlink()
    ptr = json.loads((log / "_last_checkpoint").read_text())
    ptr["parts"] = n_parts
    (log / "_last_checkpoint").write_text(json.dumps(ptr))
    for j in range(v + 1):
        p = log / f"{j:020d}.json"
        if p.exists():
            p.unlink()
    # an incomplete part set must refuse, never fold a subset
    part2 = log / f"{v:020d}.checkpoint.{2:010d}.{n_parts:010d}.parquet"
    moved = part2.with_name(part2.name + ".hidden")
    part2.rename(moved)
    try:
        read_delta_snapshot(spark, path).count()
        raise AssertionError("partial multi-part checkpoint did not refuse")
    except FileNotFoundError:
        pass
    moved.rename(part2)
    back = read_delta_snapshot(spark, path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "bal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
    )
