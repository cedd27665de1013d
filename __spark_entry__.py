"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-shape pricing summary) on
sf0.001. ``queries()``/``oracle_sql()`` expose the engine's full declared
query surface (SURVEY.md §2.3; 268 queries, 264 with DuckDB oracles — the
4 rows-only are genuinely estimate/seeded): all 22 TPC-H shapes,
date/window analytics, temporal joins (as-of/range/PIT), text analysis +
dedup (exact, MinHash-LSH, n-gram Jaccard, SimHash, SemDeDup, winnowing),
BPE tokenization (pinned-merge, recursive-CTE oracle), embedding
similarity (brute-force + LSH ANN + IVF-PQ, partitioned layouts) and
compression (int8, random projection), dataset curation (splits,
sampling, scrubbing, chunking, packing, contracts), graph analytics
(PageRank, components, triangles, k-hop BFS), robust/time-series
statistics (winsorize, CUSUM, Theil-Sen, seasonal decomposition, A/B
z-test, Benford, CCF), native Delta/Iceberg/Avro/IPC format lifecycles —
including round 6's row-level-delete surface: Delta deletion-vector
reads, merge-on-read DELETE/UPDATE, column mapping, CDF (table_changes),
Iceberg position+equality deletes with sequence scoping, ADD COLUMN
schema evolution on both writers, incremental change readers for both
formats, and the evolution_delta / evolution_iceberg Python DataSources
(batch + streaming source, exactly-once streaming sink) — streaming
batch twins (windows, sessions, stream-join attribution incl.
left-outer), multimodal codecs (BMP/WAV/PNG, all real), and the FLF
converter itself surfaced as identity-oracle queries.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the driver's CWD.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from evolution_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _coverage_priority() -> list[str]:
    """Order queries so driver correctness coverage rotates across rounds.

    The driver records CORRECTNESS rows for a prefix of ``queries()`` (r01:
    exactly the first 50 of 113), so a static order leaves the tail forever
    unverified. Sort by (never-checked first, then checked-but-failed, then
    green — oldest check first) using the CORRECTNESS_r*.json files committed
    in the repo root; ties keep registration order. Every registered query
    therefore gets a driver row within ceil(n_queries / cap) rounds, and
    fixed failures re-enter the checked window immediately.
    """
    import json

    last_round: dict[str, int] = {}
    last_green: dict[str, bool] = {}
    last_rows_only: dict[str, bool] = {}
    for path in sorted(Path(_REPO).glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(path.stem.split("_r")[1])
            data = json.loads(path.read_text())
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            last_round[name] = rnd
            checks = (row.get("rows_match"), row.get("schema_match"), row.get("hash_match"))
            last_green[name] = all(c is not False for c in checks) and row.get("err") in (
                None,
                "no_oracle",
            )
            last_rows_only[name] = row.get("err") == "no_oracle"

    reg_order = {n: i for i, n in enumerate(QUERIES)}

    # Queries whose internals were changed by the r15/r16 optimization
    # rounds but which the rotating oracle sample has not re-hashed since:
    # front them (r15 verdict item 3) so the driver confirms the rewrites,
    # ahead of merely-stale green queries.
    promote = {
        "bfs_khop_reach", "dedup_ngram_jaccard", "map_functions",
        "pq_encode_codes", "iceberg_partition_transforms",
    }

    def key(name: str):
        if name in last_round and not last_green[name]:
            return (0, 0, reg_order[name])          # failed last check: re-verify now
        if name not in last_round:
            return (1, 0, reg_order[name])          # never driver-checked
        if name in promote and last_round[name] < 16:
            return (1, 1, reg_order[name])          # optimizer-touched, unsampled
        if last_rows_only.get(name) and name in ORACLES:
            # last check was the weaker rows-only form but an oracle exists
            # NOW (added after that check): promote so the hash check runs
            # in the next prefix instead of waiting out the staleness queue
            return (1, 0, reg_order[name])
        return (2, last_round[name], reg_order[name])  # green: stalest first

    return sorted(QUERIES, key=key)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so the
    driver's correctness prefix covers never-checked / failed queries first."""
    return {n: QUERIES[n] for n in _coverage_priority()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted entries are
    non-SQL-expressible and get the driver's rows-only check)."""
    return dict(ORACLES)
