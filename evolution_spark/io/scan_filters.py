"""Shared scan-side row filtering for position-based deletes — the one
implementation of (file, row-position) anti-join used by BOTH the Delta
deletion-vector reader (``delta_log._scan_adds``) and the Iceberg
position-delete reader (``iceberg_meta.read_iceberg_table``), so a fix to
path normalization or join strategy lands once.

Path normalization: Spark's ``_metadata.file_path`` is a Hadoop URI —
scheme-prefixed (``file:/x`` or ``file:///x``) AND percent-encoded
(``seg=A B`` appears as ``seg=A%20B``). Catalog/descriptor paths are plain
filesystem paths. Comparing them verbatim silently resurrects deleted rows
for any path with a URI-encodable character, so both sides are normalized
to the decoded, scheme-less form: strip the scheme, protect literal ``+``
(``url_decode`` follows ``URLDecoder`` in turning ``+`` into a space),
then percent-decode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# matches any URI scheme prefix (file:/, file:///, hdfs://host/ is NOT
# fully handled — local-fs engines only, like the rest of the native
# table readers)
URI_SCHEME_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*:/+"


def plain_path(p: str) -> str:
    """Driver-side twin of :func:`decoded_file_path`: catalog/manifest
    paths may be plain or URI-form (``file:///x``, percent-encoded);
    normalize to the decoded plain form so python-side keying matches the
    scan-side column."""
    import re
    from urllib.parse import unquote

    return unquote(re.sub(URI_SCHEME_RE, "/", p))


def decoded_file_path(col: Column | str) -> Column:
    """``_metadata.file_path`` -> plain decoded filesystem path."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, URI_SCHEME_RE, "/")
    # literal '+' must survive URLDecoder semantics: escape it first so
    # url_decode only collapses genuine %XX escapes
    return F.url_decode(F.regexp_replace(stripped, r"\+", "%2B"))


def anti_join_deleted_positions(
    df: DataFrame,
    deleted: DataFrame,
    deleted_rows: int,
    broadcast_limit: int = 4_000_000,
    fp_col: str | None = None,
    ri_col: str | None = None,
) -> DataFrame:
    """Drop rows of ``df`` whose (file, row-index) appears in ``deleted``
    (columns ``file_path`` string — plain decoded path — and ``pos``
    long). JVM-side left-anti join on the parquet scan's metadata columns;
    the build side is proportional to the DELETED row count in scanned
    files, never table size — broadcast while small (``deleted_rows`` is
    the caller's cardinality estimate from descriptors/manifests), else
    left to AQE."""
    if fp_col is None:
        # default: derive (file, row) from the hidden parquet metadata
        # column; callers whose plan already lost ``_metadata`` (joins,
        # unions) pass their own materialized fp_col/ri_col instead
        phys = df.withColumns({
            "__del_fp": decoded_file_path(F.col("_metadata.file_path")),
            "__del_ri": F.col("_metadata.row_index"),
        })
        fp_col, ri_col, drop_helpers = "__del_fp", "__del_ri", True
    else:
        phys, drop_helpers = df, False
    build = F.broadcast(deleted) if deleted_rows <= broadcast_limit else deleted
    out = phys.join(
        build,
        (phys[fp_col] == build["file_path"])
        & (phys[ri_col] == build["pos"]),
        "left_anti",
    )
    return out.drop("__del_fp", "__del_ri") if drop_helpers else out
