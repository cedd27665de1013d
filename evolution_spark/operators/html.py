"""HTML -> text extraction: the bridge between the WARC source's raw
``text/html`` response bodies and the ``documents``-shaped text surface
(dedup / quality / language-ID) — the literal first step of a Common
Crawl pretraining pipeline.

Three layers, all pure Python and deterministic (the Spark side is one
Arrow-batched ``mapInPandas``, partition-preserving — payload bytes
never shuffle):

1. **Charset sniff + decode** (:func:`sniff_charset`,
   :func:`decode_html`): BOM first (UTF-8 / UTF-16 LE/BE), then the
   Content-Type header parameter, then a WHATWG-style ``<meta>``
   prescan over the first 1024 bytes; otherwise strict UTF-8 with a
   windows-1252 fallback (the browser default for legacy bytes).
   Decode is TOTAL — undecodable bytes become U+FFFD, never an
   exception — because a crawl corpus always contains mislabeled pages
   and one bad page must not fail a task.

2. **Tokenizer** (:func:`parse_blocks`): a small from-scratch scanner
   (comments, CDATA, doctype/PI, quoted attribute values, HTML5
   raw-text elements ``script/style/noscript/template/iframe`` skipped
   to their closing tag, ``<title>`` captured separately). Text
   segments into BLOCKS at block-level element boundaries; inline
   markup (``a``, ``span``, ``b`` …) does not split a block. Each
   block tracks its word count and anchor-word count (text inside
   ``<a>``), the two features main-content classification needs.
   Entities resolve via the stdlib WHATWG table (``html.unescape``);
   whitespace collapses to single spaces (including inside ``pre`` —
   documented simplification, token statistics downstream are
   whitespace-insensitive). The scanner is total: any byte soup yields
   some text, never an exception (fuzz-tested contract).

3. **Main-content classifier** (:func:`classify_blocks`): the
   published densitometric decision rules of Kohlschuetter, Fankhauser
   & Nejdl, "Boilerplate Detection using Shallow Text Features"
   (WSDM 2010) — the ``NumWordsRulesClassifier``: a block is content
   or boilerplate from (link density, word count) of itself and its
   neighbor blocks. No model file, deterministic, language-agnostic.

Ref parity: extension surface — the reference (a fixed-length-file
converter, crates/evolution-slicer/src/slicer.rs) has no HTML or web
corpus handling; this implements the engine's own WARC->documents
ambition (VERDICT r13 item 1).
"""
from __future__ import annotations

import html as _htmllib
import re
from typing import Iterator, NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Elements whose content browsers do not render as page text: skip to
# the matching close tag (HTML5 raw-text / escapable-raw-text rules;
# iframe fallback content is also never rendered).
_RAW_TEXT = {"script", "style", "noscript", "template", "iframe"}

# Block-level boundaries: text on either side belongs to different
# blocks. (br is handled as a boundary too — nav link stacks separated
# by <br> would otherwise fuse with the adjacent paragraph.)
_BLOCK = {
    "address", "article", "aside", "blockquote", "br", "caption",
    "center", "dd", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "li", "main", "nav", "ol", "option", "p", "pre",
    "section", "select", "table", "tbody", "td", "tfoot", "th",
    "thead", "tr", "ul",
}

_TAG_NAME = re.compile(r"[a-zA-Z][a-zA-Z0-9-]*")
# length-PRESERVING lowercase for scanner offset maps: str.lower() can
# change string length (U+0130 'İ' -> 2 code points), which would
# desynchronize raw-text close-tag offsets against the original text;
# tag names are ASCII, so an A-Z-only translation is both correct and
# offset-stable.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")


def _skip_markup_decl(text: str, lt: int):
    """If ``text[lt:]`` opens a comment / CDATA / doctype / PI,
    return the resume position past it; else None. Shared by both
    scanners so their markup-skipping can never drift."""
    n = len(text)
    if text.startswith("<!--", lt):
        end = text.find("-->", lt + 4)
        return n if end < 0 else end + 3
    if text.startswith("<![CDATA[", lt):
        end = text.find("]]>", lt + 9)
        return n if end < 0 else end + 3
    if text.startswith("<!", lt) or text.startswith("<?", lt):
        end = text.find(">", lt)
        return n if end < 0 else end + 1
    return None


_CT_CHARSET = re.compile(r"""charset\s*=\s*["']?\s*([\w.:-]+)""",
                         re.IGNORECASE)

# WHATWG-ish label normalization for the charsets a crawl actually
# carries. Unknown labels fall back to the default utf-8/cp1252 path.
_CHARSET_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "utf-16": "utf-16-le", "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    # WHATWG maps latin-1/ascii labels to windows-1252
    "iso-8859-1": "cp1252", "iso8859-1": "cp1252", "latin-1": "cp1252",
    "latin1": "cp1252", "ascii": "cp1252", "us-ascii": "cp1252",
    "windows-1252": "cp1252", "cp1252": "cp1252", "x-cp1252": "cp1252",
    "iso-8859-15": "iso-8859-15", "iso-8859-2": "iso-8859-2",
    "windows-1251": "cp1251", "cp1251": "cp1251", "koi8-r": "koi8-r",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "euc-jp": "euc_jp", "euc-kr": "euc_kr",
    "gbk": "gbk", "gb2312": "gbk", "gb18030": "gb18030",
    "big5": "big5",
}


def sniff_charset(payload: bytes, content_type: str | None = None):
    """Return (python codec name, bom_length). Precedence per the
    WHATWG encoding sniff: BOM > Content-Type param > meta prescan
    (first 1024 bytes) > None (caller applies the utf-8/cp1252
    default)."""
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8", 3
    if payload[:2] == b"\xff\xfe":
        return "utf-16-le", 2
    if payload[:2] == b"\xfe\xff":
        return "utf-16-be", 2
    if content_type:
        m = _CT_CHARSET.search(content_type)
        if m:
            enc = _CHARSET_ALIASES.get(m.group(1).lower())
            if enc:
                return enc, 0
    head = payload[:1024].decode("latin-1")
    # WHATWG-style prescan: comments never contribute (strip closed
    # comments, truncate at an unterminated one), and charset is read
    # from META ATTRIBUTE position only — a 'charset=' inside some
    # other tag's content attribute is page text, not a declaration
    head = re.sub(r"<!--.*?-->", " ", head, flags=re.S)
    cut = head.find("<!--")
    if cut >= 0:
        head = head[:cut]
    for mm in re.finditer(r"<meta\b", head, re.IGNORECASE):
        span = head[mm.end(): _tag_end(head, mm.end())]
        cs = _attr_value(span, "charset")
        if cs is None:
            he = (_attr_value(span, "http-equiv") or "").strip()
            if he.lower() == "content-type":
                m2 = _CT_CHARSET.search(_attr_value(span, "content")
                                        or "")
                cs = m2.group(1) if m2 else None
        if cs:
            enc = _CHARSET_ALIASES.get(cs.strip().lower())
            if enc:
                # WHATWG meta rule: a declared UTF-16 maps to UTF-8 —
                # an ASCII-readable <meta> proves the bytes are not
                # UTF-16 (the classic mislabeled-page case)
                if enc.startswith("utf-16"):
                    enc = "utf-8"
                return enc, 0
    return None, 0


def decode_html(payload: bytes, content_type: str | None = None):
    """Total bytes->str decode. Returns (text, charset_label): the
    sniffed codec with errors='replace', else strict utf-8, else
    cp1252 with errors='replace' (every byte yields SOMETHING —
    the one-bad-page-cannot-fail-a-task contract)."""
    payload = bytes(payload)
    enc, bom = sniff_charset(payload, content_type)
    if enc is not None:
        return payload[bom:].decode(enc, "replace"), enc
    try:
        return payload.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return payload.decode("cp1252", "replace"), "cp1252"


class Block(NamedTuple):
    text: str
    n_words: int
    n_anchor_words: int

    @property
    def link_density(self) -> float:
        return self.n_anchor_words / self.n_words if self.n_words else 0.0


def _raw_text_end(s: str, low: str, pos: int, name: str):
    """(content_end, resume_pos) for an HTML5 raw-text element body
    starting at ``pos``: the body ends only at a matching close tag —
    ``</name`` followed by whitespace, '/' or '>' (so ``</scripts>``
    does NOT terminate a script). ``low`` is the pre-lowercased
    document (lowercase once per parse, not per element).
    Unterminated -> (len, len)."""
    needle = "</" + name
    i = pos
    while True:
        i = low.find(needle, i)
        if i < 0:
            return len(s), len(s)
        after = i + len(needle)
        if after >= len(s) or s[after] in " \t\n\r\f/>":
            gt = s.find(">", after)
            return i, (len(s) if gt < 0 else gt + 1)
        i = after


def _tag_end(text: str, i: int) -> int:
    """Scan from just past the tag name to the tag's closing '>',
    with HTML5 attribute-value quote semantics: a quote starts a
    quoted value only immediately after '=' (optionally with
    whitespace); anywhere else it is literal (a stray apostrophe in
    an unquoted value must not swallow the rest of the document)."""
    n = len(text)
    expect_value = False
    while i < n:
        c = text[i]
        if c in "\"'":
            if expect_value:
                q = text.find(c, i + 1)
                i = n if q < 0 else q + 1
                expect_value = False
                continue
            i += 1
            continue
        if c == ">":
            return i
        if c == "=":
            expect_value = True
        elif c not in " \t\n\r\f":
            if expect_value and c != "=":
                # first character of an unquoted value: consume it
                while i < n and text[i] not in " \t\n\r\f>":
                    i += 1
                expect_value = False
                continue
        i += 1
    return n


def parse_blocks(text: str):
    """Scan an HTML string into (blocks, title). Never raises —
    malformed markup degrades to literal text."""
    blocks: list[Block] = []
    title: str | None = None
    buf: list[str] = []          # text segments of the current block
    anchor_buf: list[str] = []   # segments emitted while inside <a>
    anchor_depth = 0
    n = len(text)
    low = text.translate(_ASCII_LOWER)  # offset-stable (see above)
    pos = 0

    def flush():
        nonlocal buf, anchor_buf
        words = _htmllib.unescape(" ".join(buf)).split()
        if words:
            a_words = _htmllib.unescape(" ".join(anchor_buf)).split()
            blocks.append(Block(" ".join(words), len(words),
                                min(len(a_words), len(words))))
        buf, anchor_buf = [], []

    while pos < n:
        lt = text.find("<", pos)
        if lt < 0:
            seg = text[pos:]
            buf.append(seg)
            if anchor_depth:
                anchor_buf.append(seg)
            break
        if lt > pos:
            seg = text[pos:lt]
            buf.append(seg)
            if anchor_depth:
                anchor_buf.append(seg)
        decl = _skip_markup_decl(text, lt)
        if decl is not None:
            pos = decl
            continue
        close = text.startswith("</", lt)
        m = _TAG_NAME.match(text, lt + (2 if close else 1))
        if not m:
            # stray '<': literal text
            buf.append("<")
            if anchor_depth:
                anchor_buf.append("<")
            pos = lt + 1
            continue
        name = m.group(0).lower()
        i = _tag_end(text, m.end())
        pos = n if i >= n else i + 1
        if close:
            if name in _BLOCK:
                flush()
            elif name == "a" and anchor_depth:
                anchor_depth -= 1
            continue
        if name == "title":
            # every <title> body is raw text (head title, SVG titles
            # — none renders as page text); only the first is THE
            # document title
            end_content, resume = _raw_text_end(text, low, pos,
                                                "title")
            if title is None:
                title = " ".join(
                    _htmllib.unescape(text[pos:end_content]).split())
            pos = resume
            continue
        if name in _RAW_TEXT:
            _, pos = _raw_text_end(text, low, pos, name)
            if name in _BLOCK:  # (none today, future-proof)
                flush()
            continue
        if name in _BLOCK:
            flush()
        elif name == "a":
            # HTML5: a new <a> implicitly closes any open anchor (and
            # caps a forgotten </a>'s poisoning at the next anchor)
            anchor_depth = 1
    flush()
    return blocks, title


_EMPTY = Block("", 0, 0)


def classify_blocks(blocks: list[Block]) -> list[bool]:
    """Kohlschuetter et al. (WSDM 2010) NumWordsRulesClassifier —
    published decision rules verbatim; True = main content."""
    out = []
    for k, curr in enumerate(blocks):
        prev = blocks[k - 1] if k else _EMPTY
        nxt = blocks[k + 1] if k + 1 < len(blocks) else _EMPTY
        if curr.link_density > 0.333333:
            out.append(False)
        elif prev.link_density <= 0.555556:
            if curr.n_words > 16 or nxt.n_words > 15:
                out.append(True)
            else:
                out.append(prev.n_words > 4)
        else:
            out.append(curr.n_words > 40 or nxt.n_words > 17)
    return out


def html_to_text(payload, content_type: str | None = None,
                 main_content: bool = True):
    """One page end-to-end: decode -> parse -> classify. Returns
    (text, title, charset, n_blocks, n_content_blocks); ``text`` joins
    kept blocks with newlines (all blocks when main_content=False)."""
    if isinstance(payload, str):
        text, charset = payload, "str"
    else:
        text, charset = decode_html(payload, content_type)
    blocks, title = parse_blocks(text)
    keep = classify_blocks(blocks) if main_content else \
        [True] * len(blocks)
    kept = [b.text for b, k in zip(blocks, keep) if k]
    return ("\n".join(kept), title, charset, len(blocks),
            sum(keep))


def extract_html_text(
    df: DataFrame,
    payload_col: str = "payload",
    content_type_col: str | None = "content_type",
    main_content: bool = True,
) -> DataFrame:
    """Spark operator: append (charset, title, text, n_blocks,
    n_content_blocks) to each row by running :func:`html_to_text` over
    Arrow batches. Partition-preserving mapInPandas — no shuffle, the
    multi-KB html payloads stay where the WARC reader put them; NULL
    payloads pass through with NULL outputs. Pair with
    :func:`~evolution_spark.operators.multimodal.cap_payload_partitions`
    for multi-MB pathological pages."""
    import pandas as pd

    fields = list(df.schema.fields)
    out_schema = StructType(fields + [
        StructField("charset", StringType(), True),
        StructField("title", StringType(), True),
        StructField("text", StringType(), True),
        StructField("n_blocks", IntegerType(), True),
        StructField("n_content_blocks", IntegerType(), True),
    ])
    cols = [f.name for f in fields]
    has_ct = content_type_col is not None and \
        content_type_col in df.columns

    def _extract(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            cts = pdf[content_type_col] if has_ct else None
            for j, payload in enumerate(pdf[payload_col]):
                if payload is None:
                    outs.append((None, None, None, None, None))
                    continue
                ct = cts.iloc[j] if cts is not None else None
                outs.append(html_to_text(payload, ct, main_content))
            out = pdf[cols].copy()
            # html_to_text tuple order: (text, title, charset, nb, nc)
            res = pd.DataFrame(
                outs, columns=["text", "title", "charset", "n_blocks",
                               "n_content_blocks"], index=out.index)
            for c in ("charset", "title", "text", "n_blocks",
                      "n_content_blocks"):
                out[c] = res[c]
            yield out

    return df.mapInPandas(_extract, out_schema)


def warc_html_documents(spark, paths, main_content: bool = True,
                        records_per_partition: int = 2000) -> DataFrame:
    """The WARC -> documents bridge: read .warc.gz, keep HTTP-200
    ``text/html`` responses, extract text, and shape the result like
    the ``documents`` table (doc_id-less: record_id/uri are the keys a
    crawl provides). Downstream dedup/quality/langid consume ``text``
    directly."""
    from pyspark.sql import functions as F

    from evolution_spark.io.warc import read_warc

    recs = read_warc(spark, paths,
                     records_per_partition=records_per_partition)
    pages = recs.where(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("content_type").contains("text/html")
    )
    return extract_html_text(
        pages, main_content=main_content
    ).select(
        "record_id", "uri", "date", "charset", "title", "text",
        "n_blocks", "n_content_blocks", "n_bytes",
    )


def _attr_value(span: str, want: str):
    """HTML5-shaped attribute walk over a tag's attribute span:
    returns the value of attribute ``want`` (exact name match — a
    ``data-href`` or an ``href=`` inside ANOTHER attribute's quoted
    value is not a hit), or None."""
    i, n = 0, len(span)
    while i < n:
        while i < n and span[i] in " \t\n\r\f/":
            i += 1
        if i >= n:
            return None
        j = i
        while j < n and span[j] not in " \t\n\r\f=/":
            j += 1
        if j == i:  # stray '=' with no name
            i += 1
            continue
        name = span[i:j].lower()
        i = j
        while i < n and span[i] in " \t\n\r\f":
            i += 1
        val = ""
        if i < n and span[i] == "=":
            i += 1
            while i < n and span[i] in " \t\n\r\f":
                i += 1
            if i < n and span[i] in "\"'":
                q = span.find(span[i], i + 1)
                val = span[i + 1: (n if q < 0 else q)]
                i = n if q < 0 else q + 1
            else:
                k = i
                while k < n and span[k] not in " \t\n\r\f":
                    k += 1
                val = span[i:k]
                i = k
        if name == want:
            return val
    return None


def _scan_links(text: str):
    """Shared walk behind the link extractors: returns (hrefs,
    base_href) — the ``<a href>`` targets in document order plus the
    FIRST ``<base href>`` (WHATWG: later base elements are ignored).
    Same scanning discipline as :func:`parse_blocks` — comments,
    CDATA, doctype/PI and raw-text element bodies (a ``<a href``
    inside a script string is NOT a link) are skipped, quoted
    attribute values may contain ``>``."""
    links: list[str] = []
    base_href = None
    n = len(text)
    low = text.translate(_ASCII_LOWER)  # offset-stable lowercase
    pos = 0
    while pos < n:
        lt = text.find("<", pos)
        if lt < 0:
            break
        decl = _skip_markup_decl(text, lt)
        if decl is not None:
            pos = decl
            continue
        close = text.startswith("</", lt)
        m = _TAG_NAME.match(text, lt + (2 if close else 1))
        if not m:
            pos = lt + 1
            continue
        name = m.group(0).lower()
        i = _tag_end(text, m.end())  # shared quote-aware scanner
        attr_span = text[m.end(): i]
        pos = n if i >= n else i + 1
        if close:
            continue
        if name == "a":
            raw = _attr_value(attr_span, "href")
            if raw is not None:
                href = _htmllib.unescape(raw).strip()
                if href:
                    links.append(href)
        elif name == "base" and base_href is None:
            raw = _attr_value(attr_span, "href")
            if raw is not None:
                b = _htmllib.unescape(raw).strip()
                if b:
                    base_href = b
        elif name in _RAW_TEXT or name == "title":
            _, pos = _raw_text_end(text, low, pos, name)
    return links, base_href


def extract_links(text_or_bytes, content_type: str | None = None):
    """Collect the href targets of ``<a>`` elements, in document
    order (entities resolved, surrounding whitespace stripped),
    VERBATIM — no URL resolution (see
    :func:`extract_links_resolved`). Total: malformed markup yields
    a (possibly empty) list, never an exception."""
    if isinstance(text_or_bytes, (bytes, bytearray, memoryview)):
        text, _ = decode_html(bytes(text_or_bytes), content_type)
    else:
        text = text_or_bytes
    return _scan_links(text)[0]


# ------------------------------------------------------ URL resolution

# WHATWG special schemes and their default ports (https://url.spec
# .whatwg.org/#special-scheme); file has no port
_SPECIAL_SCHEMES = {"http": 80, "https": 443, "ws": 80, "wss": 443,
                    "ftp": 21, "file": None}
_URL_TAB_NL = re.compile(r"[\t\n\r]")
_SCHEME_RE = re.compile(r"([a-zA-Z][a-zA-Z0-9+.\-]*):")
# WHATWG trims C0 controls and space from both ends before parsing
_C0_SPACE = "".join(map(chr, range(0x21)))


def resolve_url(ref: str | None, base: str | None):
    """WHATWG-flavored basic URL resolution on top of the stdlib's
    RFC 3986 ``urljoin``: ASCII tab/newline removed, C0-control/space
    trimmed, backslashes treated as slashes for special-scheme refs
    (browsers do), then urljoin handles the scheme / network-path /
    absolute-path / relative / fragment reference forms including
    dot-segment normalization. Returns None when the inputs cannot
    resolve (total — never raises)."""
    from urllib.parse import urljoin, urlsplit

    if not ref or not base:
        return None
    ref = _URL_TAB_NL.sub("", ref).strip(_C0_SPACE)
    if not ref:
        return None
    try:
        m = _SCHEME_RE.match(ref)
        scheme = (m.group(1).lower() if m
                  else urlsplit(base).scheme.lower())
        if scheme in _SPECIAL_SCHEMES:
            ref = ref.replace("\\", "/")
        out = urljoin(base, ref)
        return out if out else None
    except ValueError:
        return None


def canonicalize_url(url: str | None):
    """Canonical form for link-graph / dedup keys: lowercase scheme
    and host, default port stripped (http:80, https:443, ...), empty
    path of a special-scheme authority URL becomes "/", fragment
    dropped (two pages differing only in fragment are the same fetch
    target). Query strings are KEPT — they address distinct
    resources. Total: anything unparseable comes back unchanged."""
    from urllib.parse import urlsplit, urlunsplit

    if not url:
        return url
    try:
        parts = urlsplit(url)
        scheme = parts.scheme.lower()
        host = parts.hostname
        if host is None:
            netloc = parts.netloc
        else:
            if ":" in host:  # IPv6 literal — re-bracket
                host = f"[{host}]"
            userinfo = ""
            if parts.username:
                userinfo = parts.username
                if parts.password:
                    userinfo += ":" + parts.password
                userinfo += "@"
            netloc = userinfo + host
            port = parts.port  # may raise ValueError (bad port)
            if port is not None and port != _SPECIAL_SCHEMES.get(
                    scheme):
                netloc += f":{port}"
        path = parts.path
        if not path and netloc and scheme in _SPECIAL_SCHEMES:
            path = "/"
        return urlunsplit((scheme, netloc, path, parts.query, ""))
    except ValueError:
        return url


def extract_links_resolved(text_or_bytes, base_url: str | None,
                           content_type: str | None = None):
    """Like :func:`extract_links` but each href is RESOLVED against
    the document's effective base — the first ``<base href>`` (itself
    resolved against ``base_url``, per WHATWG) or ``base_url`` — and
    canonicalized. Returns [(raw_href, resolved_or_None)] in document
    order; an unresolvable href keeps its raw form with None."""
    if isinstance(text_or_bytes, (bytes, bytearray, memoryview)):
        text, _ = decode_html(bytes(text_or_bytes), content_type)
    else:
        text = text_or_bytes
    links, base_href = _scan_links(text)
    effective = base_url
    if base_href is not None:
        resolved_base = resolve_url(base_href, base_url)
        if resolved_base is not None:
            effective = resolved_base
        elif _SCHEME_RE.match(base_href):
            # absolute base works even without a document URL
            effective = base_href
    out = []
    for raw in links:
        r = resolve_url(raw, effective)
        out.append((raw, canonicalize_url(r) if r is not None
                    else None))
    return out


def extract_html_links(
    df: DataFrame,
    payload_col: str = "payload",
    content_type_col: str | None = "content_type",
    uri_col: str = "uri",
    resolve: bool = True,
) -> DataFrame:
    """Spark operator: explode each HTML payload into link-graph edge
    rows — the raw material of a crawl's frontier expansion,
    in-degree quality signals, and PageRank. With ``resolve=True``
    (the default — real pages mix absolute and relative hrefs, and a
    graph keyed on verbatim hrefs conflates them) each href is
    resolved against the record URI with ``<base href>`` precedence
    and canonicalized (lowercase scheme/host, default-port strip,
    fragment drop); output is (src_uri, href, raw_href, link_pos)
    with ``href`` the canonical form (null when unresolvable).
    ``resolve=False`` keeps the verbatim 3-column shape.
    Partition-preserving mapInPandas: page bytes never shuffle, only
    the edge rows (a few strings + an int) leave the scan stage."""
    import pandas as pd

    has_ct = content_type_col is not None and \
        content_type_col in df.columns

    def _links(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            cts = pdf[content_type_col] if has_ct else None
            for j, payload in enumerate(pdf[payload_col]):
                if payload is None:
                    continue
                uri = pdf[uri_col].iloc[j]
                ct = cts.iloc[j] if cts is not None else None
                if resolve:
                    for k, (raw, res) in enumerate(
                            extract_links_resolved(payload, uri,
                                                   ct)):
                        rows.append((uri, res, raw, k))
                else:
                    for k, href in enumerate(
                            extract_links(payload, ct)):
                        rows.append((uri, href, k))
            cols = (["src_uri", "href", "raw_href", "link_pos"]
                    if resolve else ["src_uri", "href", "link_pos"])
            yield pd.DataFrame(rows, columns=cols)

    schema = ("src_uri string, href string, raw_href string, "
              "link_pos int") if resolve else \
        "src_uri string, href string, link_pos int"
    return df.mapInPandas(_links, schema)
