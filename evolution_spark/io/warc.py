"""WARC (Web ARChive, ISO 28500) source — how a 100 TB pretraining
corpus actually ARRIVES (Common Crawl ships WARC), so the engine reads
it natively instead of requiring a pre-conversion step.

Format facts (public spec + the Common Crawl packaging convention):
a WARC file is a sequence of records, each::

    WARC/1.0\\r\\n
    <name>: <value>\\r\\n ...          (WARC-Type, WARC-Target-URI,
    \\r\\n                              WARC-Date, Content-Length, ...)
    <Content-Length payload bytes>
    \\r\\n\\r\\n

and the ``.warc.gz`` convention compresses EACH RECORD as its own gzip
member, members concatenated — the property that makes an otherwise
unsplittable gzip stream distributable.

Scale design (the whole point of this module):

1. **Index pass** — one task per FILE streams the raw bytes through a
   ``zlib`` decompressobj in bounded chunks (decompressed output is
   DISCARDED; memory stays O(chunk)), recording each gzip member's
   (offset, compressed length). No driver work, no whole-file gunzip,
   no full-file buffering.
2. **Record pass** — the index explodes to one row per RECORD and is
   repartitioned, so parse parallelism tracks record count, not file
   count; each task range-reads ``[offset, offset+length)`` (a range
   GET against object storage in a real deployment), inflates its one
   member, and parses headers + payload.

Plain uncompressed ``.warc`` and internally-chunked variants are a
loud refusal — record-per-member is the split contract.

``read_warc`` returns (file, offset, warc_type, record_id, uri, date,
content_type, http_status, payload, n_bytes): HTTP response records
surface the status code and the BODY (headers stripped); other record
types carry their raw block.

Ref parity: the reference has no web-archive source (extension
surface; its scan operator is the fixed-length-file reader —
crates/evolution-slicer/src/slicer.rs).
"""
from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_CHUNK = 1 << 20
_GZIP_MAGIC = b"\x1f\x8b"

_INDEX_SCHEMA = "file string, offset long, length long"
_RECORD_SCHEMA = (
    "file string, offset long, warc_type string, record_id string, "
    "uri string, date string, content_type string, http_status int, "
    "payload binary, n_bytes long, refers_to string, "
    "payload_digest string, profile string"
)


def index_gzip_members(path: str):
    """Stream one ``.warc.gz`` file and yield (offset, length) per gzip
    member. Bounded memory: inflated bytes are discarded; only offsets
    survive. Runs inside an executor task."""
    offsets = []
    with open(path, "rb") as f:
        head = f.read(2)
        if head != _GZIP_MAGIC:
            raise ValueError(
                f"{path}: not record-per-member gzip (magic "
                f"{head!r}); plain/chunked WARC variants are refused — "
                "repackage as .warc.gz with one member per record"
            )
        f.seek(0)
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        member_start = 0
        pos = 0
        while True:
            chunk = f.read(_CHUNK)
            if not chunk:
                break
            data = chunk
            base = pos
            while data:
                try:
                    # Bound the inflated output too (a gzip-bomb member
                    # would otherwise materialize its full expansion):
                    # max_length caps each decompress call at _CHUNK
                    # bytes of output; unconsumed input waits in
                    # unconsumed_tail until the next bounded call.
                    d.decompress(data, _CHUNK)  # output discarded
                    while d.unconsumed_tail and not d.eof:
                        d.decompress(d.unconsumed_tail, _CHUNK)
                except zlib.error as exc:
                    raise ValueError(
                        f"{path}: corrupt gzip member at offset "
                        f"{member_start}: {exc}"
                    )
                if not d.eof:
                    break  # member continues into the next chunk
                consumed = len(data) - len(d.unused_data)
                member_end = base + consumed
                offsets.append((member_start, member_end - member_start))
                member_start = member_end
                data = d.unused_data
                base = member_end
                if len(data) >= 2 and data[:2] != _GZIP_MAGIC:
                    raise ValueError(
                        f"{path}: trailing bytes after a gzip member "
                        "are not another member — refused"
                    )
                d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            pos += len(chunk)
        if member_start != pos:
            raise ValueError(f"{path}: truncated final gzip member")
    return offsets


def parse_warc_record(block: bytes, file: str = "", offset: int = 0):
    """Parse ONE inflated WARC record -> the _RECORD_SCHEMA tuple.
    HTTP ``response`` records get their status parsed and headers
    stripped from the payload."""
    nl = block.find(b"\r\n")
    if nl < 0 or not block[:nl].startswith(b"WARC/"):
        raise ValueError("WARC record missing its WARC/x.y version line")
    version = block[5:nl].decode("ascii", "replace")
    if version not in ("1.0", "1.1"):
        raise ValueError(f"unsupported WARC version {version}")
    hdr_end = block.find(b"\r\n\r\n", nl)
    if hdr_end < 0:
        raise ValueError("WARC header block unterminated")
    headers = {}
    last_key = None
    for line in block[nl + 2: hdr_end].split(b"\r\n"):
        if line[:1] in (b" ", b"\t") and last_key is not None:
            # RFC2822-style folded (continuation) line — valid WARC
            headers[last_key] += " " + line.strip().decode(
                "utf-8", "replace")
            continue
        if b":" not in line:
            raise ValueError("malformed WARC header line")
        k, v = line.split(b":", 1)
        last_key = k.strip().lower().decode("ascii", "replace")
        headers[last_key] = v.strip().decode("utf-8", "replace")
    try:
        length = int(headers["content-length"])
    except (KeyError, ValueError):
        raise ValueError("WARC record missing a valid Content-Length")
    body_start = hdr_end + 4
    if body_start + length > len(block):
        raise ValueError("WARC Content-Length overruns the record")
    body = block[body_start: body_start + length]
    warc_type = headers.get("warc-type")
    if not warc_type:
        raise ValueError("WARC record missing WARC-Type")
    http_status = None
    payload = body
    ctype = headers.get("content-type")
    if warc_type == "response" and body[:5] in (b"HTTP/",):
        he = body.find(b"\r\n\r\n")
        if he < 0:
            raise ValueError("HTTP response headers unterminated")
        status_line = body[: body.find(b"\r\n")].split(b" ")
        if len(status_line) < 2 or not status_line[1].isdigit():
            raise ValueError("HTTP status line malformed")
        http_status = int(status_line[1])
        for line in body[body.find(b"\r\n") + 2: he].split(b"\r\n"):
            if line.lower().startswith(b"content-type:"):
                ctype = line.split(b":", 1)[1].strip().decode(
                    "utf-8", "replace")
        payload = body[he + 4:]
    return (
        file, offset, warc_type, headers.get("warc-record-id"),
        headers.get("warc-target-uri"), headers.get("warc-date"),
        ctype, http_status, bytes(payload), len(payload),
        # revisit-dedup surface (ISO 28500 §6.7): the original this
        # record re-observed, the payload content digest, and the
        # revisit profile URI (identical-payload-digest vs
        # server-not-modified)
        headers.get("warc-refers-to"),
        headers.get("warc-payload-digest"),
        headers.get("warc-profile"),
    )


def read_warc(spark: SparkSession, paths: list[str],
              records_per_partition: int = 2000,
              on_error: str = "raise") -> DataFrame:
    """Distributed ``.warc.gz`` reader: file-parallel member indexing,
    then record-parallel inflate+parse (see module docstring for the
    scale shape). ``records_per_partition`` sizes the second stage so
    parse parallelism is independent of file count.

    ``on_error``: ``"raise"`` (default) fails the task on a corrupt
    record — the strict-container posture; ``"skip"`` drops corrupt
    RECORDS (bad header block, short Content-Length, corrupt member)
    and keeps the rest of the file — the posture for a 100 TB crawl
    where one mangled record must not abort a stage. Member-INDEX
    errors (a file that is not record-per-member gzip at all) always
    raise: that is a wrong-packaging error, not a bad record."""
    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    if not paths:
        raise ValueError("read_warc needs at least one path")
    files = spark.createDataFrame([(p,) for p in sorted(paths)],
                                  "file string")

    def _index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["file"]:
                for off, ln in index_gzip_members(p):
                    rows.append((p, off, ln))
            yield pd.DataFrame(rows, columns=["file", "offset",
                                              "length"])

    idx = files.repartition(max(len(paths), 1), "file").mapInPandas(
        _index, _INDEX_SCHEMA
    ).localCheckpoint()  # index rows are tiny; never re-stream the
    # raw files for the count + the parse stage below
    n_total = idx.count()
    n_parts = max(1, (n_total + records_per_partition - 1)
                  // records_per_partition)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            handles = {}
            try:
                for p, off, ln in zip(pdf["file"], pdf["offset"],
                                      pdf["length"]):
                    f = handles.get(p)
                    if f is None:
                        f = handles[p] = open(p, "rb")
                    f.seek(int(off))
                    raw = f.read(int(ln))
                    try:
                        try:
                            block = zlib.decompress(
                                raw, 16 + zlib.MAX_WBITS)
                        except zlib.error as exc:
                            raise ValueError(
                                f"{p}: corrupt gzip member at {off}: "
                                f"{exc}"
                            )
                        rows.append(
                            parse_warc_record(block, p, int(off)))
                    except ValueError:
                        if on_error == "raise":
                            raise
                        # on_error="skip": drop this record, keep the
                        # rest of the file
            finally:
                for f in handles.values():
                    f.close()
            yield pd.DataFrame(rows, columns=[
                "file", "offset", "warc_type", "record_id", "uri",
                "date", "content_type", "http_status", "payload",
                "n_bytes", "refers_to", "payload_digest", "profile",
            ])

    return idx.repartition(n_parts).mapInPandas(_parse, _RECORD_SCHEMA)


# ------------------------------------------------------ fixture writer


def build_warc_record(warc_type: str, uri: str | None, date: str,
                      payload: bytes, record_id: str,
                      content_type: str = "text/plain",
                      extra_headers: dict | None = None) -> bytes:
    hdrs = [
        b"WARC/1.0",
        f"WARC-Type: {warc_type}".encode(),
        f"WARC-Record-ID: {record_id}".encode(),
        f"WARC-Date: {date}".encode(),
        f"Content-Type: {content_type}".encode(),
        f"Content-Length: {len(payload)}".encode(),
    ]
    if uri is not None:
        hdrs.insert(3, f"WARC-Target-URI: {uri}".encode())
    for k, v in (extra_headers or {}).items():
        hdrs.append(f"{k}: {v}".encode())
    return b"\r\n".join(hdrs) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def write_warc_gz(path: str, records: list[bytes]):
    """Write records as one ``.warc.gz`` — each record its own gzip
    member (the Common Crawl packaging this reader splits on)."""
    import gzip
    import io

    with open(path, "wb") as f:
        for rec in records:
            buf = io.BytesIO()
            # mtime pinned for byte-deterministic fixtures
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            f.write(buf.getvalue())


# ------------------------------------------------------------- ARC (legacy)

_ARC_RECORD_SCHEMA = (
    "file string, offset long, uri string, ip string, date string, "
    "content_type string, payload binary, n_bytes long"
)


def parse_arc_record(block: bytes, file: str = "", offset: int = 0):
    """Parse ONE inflated ARC record (Internet Archive legacy format,
    the pre-WARC Common Crawl packaging): a single space-separated
    header line -- v1 ``URL IP date content-type length`` (5 fields) or
    v2 (10 fields, length last) -- then ``length`` payload bytes."""
    nl = block.find(b"\n")
    if nl < 0:
        raise ValueError("ARC record missing its header line")
    fields = block[:nl].decode("utf-8", "replace").split(" ")
    if len(fields) not in (5, 10):
        raise ValueError(
            f"ARC header has {len(fields)} fields (v1=5 or v2=10)"
        )
    url, ip, date = fields[0], fields[1], fields[2]
    mime = fields[3]  # Content-type is field 4 in both v1 and v2
    try:
        length = int(fields[-1])
    except ValueError:
        raise ValueError("ARC header length field is not an integer")
    body = block[nl + 1: nl + 1 + length]
    if len(body) < length:
        raise ValueError("ARC length overruns the record")
    return (file, offset, url, ip, date, mime, bytes(body), length)


def read_arc(spark: SparkSession, paths: list[str],
             records_per_partition: int = 2000) -> DataFrame:
    """Distributed ``.arc.gz`` reader: the same member-index-then-
    range-read shape as :func:`read_warc` (ARC files from the Internet
    Archive era use the identical gzip-member-per-record packaging).
    The leading ``filedesc://`` version record of each file is emitted
    like any other row (filter on ``uri`` to drop it)."""
    import pandas as pd

    if not paths:
        raise ValueError("read_arc needs at least one path")
    files = spark.createDataFrame([(p,) for p in sorted(paths)],
                                  "file string")

    def _index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["file"]:
                for off, ln in index_gzip_members(p):
                    rows.append((p, off, ln))
            yield pd.DataFrame(rows, columns=["file", "offset",
                                              "length"])

    idx = files.repartition(max(len(paths), 1), "file").mapInPandas(
        _index, _INDEX_SCHEMA
    ).localCheckpoint()
    n_total = idx.count()
    n_parts = max(1, (n_total + records_per_partition - 1)
                  // records_per_partition)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            handles = {}
            try:
                for p, off, ln in zip(pdf["file"], pdf["offset"],
                                      pdf["length"]):
                    f = handles.get(p)
                    if f is None:
                        f = handles[p] = open(p, "rb")
                    f.seek(int(off))
                    raw = f.read(int(ln))
                    try:
                        block = zlib.decompress(raw, 16 + zlib.MAX_WBITS)
                    except zlib.error as exc:
                        raise ValueError(
                            f"{p}: corrupt gzip member at {off}: {exc}"
                        )
                    rows.append(parse_arc_record(block, p, int(off)))
            finally:
                for f in handles.values():
                    f.close()
            yield pd.DataFrame(rows, columns=[
                "file", "offset", "uri", "ip", "date", "content_type",
                "payload", "n_bytes",
            ])

    return idx.repartition(n_parts).mapInPandas(_parse,
                                                _ARC_RECORD_SCHEMA)


def build_arc_record(url: str, ip: str, date: str, content_type: str,
                     payload: bytes) -> bytes:
    hdr = f"{url} {ip} {date} {content_type} {len(payload)}\n"
    return hdr.encode() + payload + b"\n"
