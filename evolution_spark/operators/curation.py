"""Dataset-curation operators: deterministic splitting/sampling, pattern
scrubbing, token-window chunking, and int8 embedding quantization — the
reusable DataFrame→DataFrame API behind the oracle-checked queries in
``queries/pipeline.py`` (which pin their semantics against DuckDB at three
scale factors).

Everything is hash-deterministic (no RNG) and built-ins-only (no UDFs), so
pipelines built from these operators reproduce bit-identically and stay
inside whole-stage codegen. Scale notes per operator docstring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from evolution_spark.functions.text import hash32, norm_text


def split_assign(
    df: DataFrame,
    key: str,
    splits: dict[str, int],
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash of ``key`` (deterministic,
    RNG-free). ``splits`` maps name -> percent; percents must sum to 100.

    Example: ``split_assign(docs, "doc_id", {"train": 90, "val": 5,
    "test": 5})``. Membership is a pure function of the key, so re-runs,
    engine upgrades, and partial reprocessing can never shuffle rows between
    splits — the property ``df.sample`` cannot give. Narrow (no shuffle)."""
    total = sum(splits.values())
    if total != 100:
        raise ValueError(f"split percents must sum to 100, got {total}")
    bucket = hash32(F.col(key).cast("string")) % 100
    expr: Column | None = None
    lo = 0
    for name, pct in splits.items():
        hi = lo + pct
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn(out_col, expr)


def sample_deterministic(df: DataFrame, key: str, rate: float) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows by key hash
    (hash mod 10^6 < rate*10^6). Stratum-uniform and join-stable: sampling
    two tables with the same key keeps them referentially consistent."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(rate * 1_000_000)
    return df.where(hash32(F.col(key).cast("string")) % 1_000_000 < threshold)


def weighted_sample(df: DataFrame, key: str, weight: str, k: int) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    priority = u^(1/w) with ``u`` a deterministic per-key uniform in (0, 1]
    derived from ``md5(key)``; the k rows with the highest priority are an
    exact weighted sample. Deterministic (re-runs pick the same rows) and
    fully distributed: the top-k is a ``TakeOrderedAndProject`` — per-task
    heaps of size k, no global sort, no shuffle of the losers. The standard
    quality-weighted curation draw (sample ∝ doc quality/length).

    Weights must be strictly positive: w=0 makes the priority NULL (the row
    would silently vanish under desc-nulls-last) and w<0 makes u^(1/w) > 1
    (the row would deterministically dominate the draw) — both corrupt the
    A-ES sample silently, so non-positive weights fail loudly instead."""
    u = (hash32(F.col(key).cast("string")) + 1) / F.lit(4294967296.0)
    w = F.col(weight)
    checked_w = F.when(
        w > 0, w
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"weighted_sample: non-positive weight in '{weight}': "),
                w.cast("string"),
            )
        )
    )
    pr = F.pow(u, F.lit(1.0) / checked_w)
    return (
        df.withColumn("__pr", pr)
        .orderBy(F.desc("__pr"), key)
        .limit(k)
        .drop("__pr")
    )


def scrub_patterns(
    df: DataFrame,
    text_col: str,
    pattern: str,
    replacement: str = "[REDACTED]",
    count_col: str = "n_redacted",
) -> DataFrame:
    """Redact regex matches in ``text_col`` (PII scrubbing shape), adding a
    per-row match count. The regexp evaluates once per row in codegen; at
    100 TB this is scan-bound. Pass an anchored/word-bounded pattern —
    e.g. email: ``[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}``."""
    return df.withColumn(
        count_col, F.size(F.regexp_extract_all(text_col, F.lit(pattern), 0))
    ).withColumn(text_col, F.regexp_replace(text_col, pattern, replacement))


def chunk_tokens(
    df: DataFrame,
    text_col: str,
    id_cols: list[str],
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Token-window chunking with overlap (RAG / pretraining prep): explode
    each document into ``(id_cols..., chunk_idx, chunk_text, n_tokens)``
    rows. Starts are 0, step, 2*step, ... while start < n_tokens
    (step = chunk_tokens - overlap); the tail chunk may be short. One
    Generate, no shuffle; chunk count ~ n_tokens/step bounds output size."""
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    w = F.split(norm_text(F.col(text_col)), " ")
    ex = df.select(*id_cols, w.alias("_w")).select(
        *id_cols,
        "_w",
        F.explode(
            F.sequence(F.lit(0), F.floor((F.size("_w") - 1) / step).cast("int"))
        ).alias("chunk_idx"),
    )
    chunk = F.slice("_w", F.col("chunk_idx") * step + 1, chunk_tokens)
    return ex.select(
        *id_cols,
        "chunk_idx",
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )


def quantize_embeddings_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q_embedding"
) -> DataFrame:
    """Symmetric int8 quantization: per-vector absmax scale, components
    round(v/scale) in [-127, 127] as ``array<int>`` plus a ``scale`` double
    for dequantization (v ≈ q * scale). 4x smaller than float32 — the
    compression step before building a billion-vector ANN index. Narrow,
    per-row array math.

    An all-zero vector has absmax 0; its scale is kept at 0.0 (nothing to
    dequantize back) and the quantized components are 0, not NULL/NaN —
    the division is guarded rather than emitting 0/0."""
    xd = lambda x: x.cast("double")  # noqa: E731
    scale = F.array_max(F.transform(vec_col, lambda x: F.abs(xd(x)))) / 127.0
    return df.withColumn("scale", scale).withColumn(
        out_col,
        F.when(
            F.col("scale") == 0.0,
            F.transform(vec_col, lambda x: F.lit(0).cast("int")),
        ).otherwise(
            F.transform(vec_col, lambda x: F.round(xd(x) / F.col("scale")).cast("int"))
        ),
    )


def dequantize_embeddings(
    df: DataFrame, q_col: str = "q_embedding", out_col: str = "embedding"
) -> DataFrame:
    """Inverse of ``quantize_embeddings_int8``: v ≈ q * scale."""
    return df.withColumn(
        out_col,
        F.transform(q_col, lambda q: (q.cast("double") * F.col("scale")).cast("float")),
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    by: str,
    order: str,
    out_col: str = "pack_id",
) -> DataFrame:
    """Assign each document to a token-budget pack (sequence-packing planner
    for pretraining batches): within each ``by`` partition, walk documents in
    ``order`` and place each at the running token offset; ``pack_id`` =
    offset // budget. Contiguous-fill semantics (a document may straddle a
    pack boundary and is counted in the pack where it starts) — the
    deterministic, single-window-pass formulation; greedy first-fit would
    need sequential state.

    Scale: one shuffle on ``by`` + one window cumsum. At 100 TB, pick a
    ``by`` key with bounded partition size (e.g. shard = hash(doc) % N, not
    a single global key), since each partition is one sorted task.
    """
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(order).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(out_col, F.floor(offset / F.lit(budget)))


def data_contract_check(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """dbt-style data-contract assertion battery: ``rules`` maps rule name
    -> boolean VALIDITY expression; returns one row per rule with
    ``(rule, n_violations, n_rows)``. NULL rule results count as
    violations (a null check is a failed check).

    Scale: ALL rules evaluate in ONE scan — each rule is a conditional
    count inside a single hash aggregate (map-side partial), so adding a
    rule costs one codegen'd expression, not another pass over 100 TB.
    The wide->long pivot happens on the single aggregate row via stack."""
    if not rules:
        raise ValueError("data_contract_check needs at least one rule")
    aggs = [
        # coalesce(..., 0): an EMPTY input (idle streaming micro-batch)
        # must report 0 violations, not NULL — a NULL would read as
        # "unchecked" to any downstream alert
        F.coalesce(
            F.sum(F.when(F.coalesce(expr, F.lit(False)), 0).otherwise(1)),
            F.lit(0),
        ).alias(f"__v{i}")
        for i, (_, expr) in enumerate(rules)
    ] + [F.count(F.lit(1)).alias("__n")]
    wide = df.agg(*aggs)
    # rule names go through lit() columns, never an f-string SQL fragment —
    # a name containing quotes must not break (or alter) the projection
    pairs: list[Column] = []
    for i, (name, _) in enumerate(rules):
        pairs.extend([F.lit(name), F.col(f"__v{i}")])
    return (
        wide.select(
            F.stack(F.lit(len(rules)), *pairs).alias("rule", "n_violations"),
            F.col("__n").alias("n_rows"),
        )
        .orderBy("rule")
    )
