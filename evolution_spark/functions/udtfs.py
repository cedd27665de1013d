"""Python UDTF surface (table-valued extension functions).

The reference's only extension mechanism is implementing Rust traits
(``Parser``/``Trimmer``/``ColumnBuilder``/``Writer`` — SURVEY.md §2.2); this
engine's equivalents are (1) plain Column-function composition
(functions/text.py, functions/vectors.py — the fast, codegen path), (2)
Pandas UDFs / mapInPandas for vectorized Python (operators/multimodal.py),
and (3) — here — Python UDTFs (Spark ≥3.5) for one-row-to-many-rows logic
that needs imperative Python.

UDTFs are the SLOW path (row-at-a-time Python evaluation): use them only
where the logic genuinely can't be a built-in composition. The chunker
below intentionally duplicates the JVM-side ``chunk_documents_overlap``
query so tests can assert both paths agree — demonstrating when NOT to use
a UDTF as much as how to.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="chunk_idx: int, chunk_text: string, n_tokens: int")
class ChunkTextUDTF:
    """Token-window chunker as a UDTF: yields (chunk_idx, text, n_tokens)
    rows for one input document. Equivalent JVM-side formulation:
    queries/pipeline.chunk_documents_overlap (preferred in pipelines)."""

    def eval(self, text: str, chunk_tokens: int, overlap: int):
        if text is None:
            return
        words = text.lower().split()
        step = max(chunk_tokens - overlap, 1)
        if not words:
            return
        # Starts at 0, step, 2*step, ... while start < n — the same
        # enumeration as the JVM-side sequence(0, (n-1) div step).
        for idx, start in enumerate(range(0, len(words), step)):
            piece = words[start : start + chunk_tokens]
            yield idx, " ".join(piece), len(piece)


@udtf(returnType="key: string, value: string")
class ParseKVPairsUDTF:
    """Explode a 'k1=v1;k2=v2' properties string into (key, value) rows —
    the canonical one-to-many parse that SQL lateral views need a table
    function for."""

    def eval(self, props: str):
        if not props:
            return
        for pair in props.split(";"):
            if "=" in pair:
                k, _, v = pair.partition("=")
                yield k.strip(), v.strip()


def register_udtfs(spark) -> None:
    """Register the UDTFs for SQL use:
    ``SELECT c.* FROM docs, LATERAL chunk_text(text, 32, 8) c``."""
    spark.udtf.register("chunk_text", ChunkTextUDTF)
    spark.udtf.register("parse_kv_pairs", ParseKVPairsUDTF)


__all__ = ["ChunkTextUDTF", "ParseKVPairsUDTF", "register_udtfs", "lit"]
