"""HTML -> text extraction (operators/html.py): charset sniff
precedence, total decode, tokenizer, block/link-density features, the
WSDM-2010 main-content rules, the Spark operator, the WARC bridge, and
the mutation-fuzz error contract (never raises, bounded time)."""
import time

import pytest

from evolution_spark.operators.html import (
    Block,
    classify_blocks,
    decode_html,
    extract_html_text,
    html_to_text,
    parse_blocks,
    sniff_charset,
    warc_html_documents,
)


def test_charset_sniff_precedence():
    # BOM beats everything
    assert sniff_charset(b"\xef\xbb\xbfx") == ("utf-8", 3)
    assert sniff_charset(b"\xff\xfex\x00") == ("utf-16-le", 2)
    assert sniff_charset(b"\xfe\xffx") == ("utf-16-be", 2)
    # Content-Type param beats meta
    body = b'<meta charset="iso-8859-1"><p>x</p>'
    assert sniff_charset(body, "text/html; charset=utf-8") == \
        ("utf-8", 0)
    # meta prescan: both forms, only inside the first 1024 bytes
    assert sniff_charset(body) == ("cp1252", 0)
    hq = (b'<meta http-equiv="Content-Type" content="text/html; '
          b'charset=Shift_JIS">')
    assert sniff_charset(hq) == ("shift_jis", 0)
    late = b" " * 1100 + body
    assert sniff_charset(late) == (None, 0)
    # unknown labels fall through to the default path
    assert sniff_charset(b'<meta charset="klingon">') == (None, 0)


def test_decode_total_and_fallback():
    assert decode_html("café".encode()) == ("café", "utf-8")
    # invalid utf-8 -> cp1252 fallback, never raises
    t, cs = decode_html(b"caf\xe9")
    assert (t, cs) == ("café", "cp1252")
    # declared charset decodes with replace (never raises)
    t, cs = decode_html(b"\xff\xfe" + "ab".encode("utf-16-le"))
    assert (t, cs) == ("ab", "utf-16-le")
    t, _ = decode_html(b"a\x81b", "text/html; charset=windows-1252")
    assert t[0] == "a" and t[2] == "b"  # 0x81 replaced, not fatal
    assert decode_html(b"") == ("", "utf-8")


def test_parse_blocks_tokenizer():
    html = (
        "<!DOCTYPE html><html><head><title>My &amp; Title</title>"
        "<script>var x = '<p>not text</p>';</script>"
        "<style>p > a { color: red }</style></head>"
        "<body><!-- <p>comment</p> -->"
        "<p>Hello &lt;world&gt; caf&eacute;</p>"
        '<div data-x="a > b">attr gt survives</div>'
        "<p>split <b>by</b> inline <span>tags</span></p>"
        "<ul><li>one item</li><li>two item</li></ul>"
        "5 < 6 stray bracket"
        "</body></html>"
    )
    blocks, title = parse_blocks(html)
    assert title == "My & Title"
    texts = [b.text for b in blocks]
    assert texts == [
        "Hello <world> café",
        "attr gt survives",
        "split by inline tags",
        "one item",
        "two item",
        "5 < 6 stray bracket",
    ]
    assert blocks[0].n_words == 3 and blocks[0].n_anchor_words == 0


def test_anchor_word_tracking_and_link_density():
    html = ('<p><a href="/">home page</a> and some plain text '
            "here</p><p><a>all anchor words</a></p>")
    blocks, _ = parse_blocks(html)
    assert blocks[0].n_words == 7 and blocks[0].n_anchor_words == 2
    assert blocks[0].link_density == pytest.approx(2 / 7)
    assert blocks[1].link_density == 1.0
    # unmatched </a> and nested blocks inside an anchor don't crash
    blocks, _ = parse_blocks("</a><a><div>x y</div>tail</a><p>z</p>")
    assert [b.text for b in blocks] == ["x y", "tail", "z"]
    assert blocks[1].n_anchor_words == 1


def test_classifier_rules():
    def blk(words, anchor=0):
        return Block(" ".join(["w"] * words), words, anchor)

    # high link density -> boilerplate regardless of size
    assert classify_blocks([blk(30, 15)]) == [False]
    # long block -> content
    assert classify_blocks([blk(20)]) == [True]
    # short isolated block -> boilerplate
    assert classify_blocks([blk(3)]) == [False]
    # short block next to a long NEXT block -> content
    assert classify_blocks([blk(3), blk(20)]) == [True, True]
    # after a nav (prev link density > .5556): needs >40 words or a
    # long next block
    nav = blk(6, 6)
    assert classify_blocks([nav, blk(30)]) == [False, False]
    assert classify_blocks([nav, blk(41)]) == [False, True]
    assert classify_blocks([nav, blk(30), blk(18)]) == \
        [False, True, True]


def test_html_to_text_end_to_end():
    page = (
        "<html><head><title>T</title></head><body>"
        '<nav><a href="/">home</a> <a href="/a">about us</a></nav>'
        "<p>" + " ".join(f"word{k}" for k in range(25)) + "</p>"
        "<p>" + " ".join(f"tail{k}" for k in range(18)) + "</p>"
        "<footer><a>terms of use</a> <a>privacy policy</a></footer>"
        "</body></html>"
    ).encode()
    text, title, charset, n_blocks, n_content = html_to_text(page)
    assert title == "T" and charset == "utf-8"
    assert n_blocks == 4 and n_content == 2
    lines = text.split("\n")
    assert len(lines) == 2 and lines[0].startswith("word0 ")
    assert "home" not in text and "privacy" not in text
    # main_content=False keeps everything
    all_text = html_to_text(page, main_content=False)[0]
    assert "home" in all_text and "privacy" in all_text


def test_mutation_fuzz_never_raises():
    """Contract: any byte soup extracts (possibly empty) text, < 1 s
    per page, no exception — a crawl always contains broken markup."""
    import random

    base = (
        "<html><head><title>t</title><script>s</script></head><body>"
        '<p><a href="x">l</a> text here and more</p><div>d</div>'
        "<!-- c --><![CDATA[q]]><ul><li>i</li></ul></body></html>"
    ).encode()
    rng = random.Random(14)
    for trial in range(300):
        p = bytearray(base)
        op = trial % 4
        if op == 0:
            for _ in range(rng.randrange(1, 8)):
                p[rng.randrange(len(p))] ^= 1 << rng.randrange(8)
        elif op == 1:
            p = p[: rng.randrange(len(p))]
        elif op == 2:
            cut = rng.randrange(len(p))
            p = p[cut:] + p[:cut]
        else:
            i = rng.randrange(len(p))
            p = p[:i] + bytes([rng.randrange(256)] * 16) + p[i:]
        t0 = time.monotonic()
        text, title, charset, nb, nc = html_to_text(bytes(p))
        assert time.monotonic() - t0 < 1.0
        assert isinstance(text, str) and nc <= nb
    # adversarial: unterminated everything
    for s in (b"<script>never closed", b"<!-- open", b"<![CDATA[ open",
              b"<p", b"<", b"</", b"<a href='unterminated",
              b"<title>no close", b"\xff\xfe\x00", b"<?php echo"):
        text, *_ = html_to_text(s)
        assert isinstance(text, str)


def test_spark_operator_and_warc_bridge(spark, tmp_path):
    from evolution_spark.io.warc import build_warc_record, write_warc_gz

    recs = []
    for i in range(6):
        body = (
            f"<html><head><title>Page {i}</title></head><body>"
            f'<nav><a href="/">home</a> <a href="/x">about</a></nav>'
            f"<p>{' '.join(f'tok{i}x{k}' for k in range(20 + i))}</p>"
            f"<p>{' '.join(f'end{k}' for k in range(19))}</p>"
            "</body></html>"
        ).encode()
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                   b"charset=utf-8\r\n\r\n" + body)
        recs.append(build_warc_record(
            "response", f"http://h/{i}", "2026-01-01T00:00:00Z",
            payload, f"<urn:uuid:h-{i}>",
            content_type="application/http; msgtype=response"))
    # one non-html response: must be filtered out by the bridge
    recs.append(build_warc_record(
        "response", "http://h/bin", "2026-01-01T00:00:00Z",
        b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\nPNG",
        "<urn:uuid:h-bin>",
        content_type="application/http; msgtype=response"))
    p = tmp_path / "pages.warc.gz"
    write_warc_gz(str(p), recs)

    docs = warc_html_documents(spark, [str(p)]).orderBy("uri")
    rows = docs.collect()
    assert len(rows) == 6
    assert rows[0].title == "Page 0" and rows[0].charset == "utf-8"
    assert rows[0].n_blocks == 3 and rows[0].n_content_blocks == 2
    assert rows[0].text.split("\n")[0].split()[0] == "tok0x0"
    assert all("home" not in r.text for r in rows)
    # null payload passes through the operator as nulls
    df = spark.createDataFrame(
        [(1, None)], "id long, payload binary")
    out = extract_html_text(df, content_type_col=None).collect()[0]
    assert out.text is None and out.n_blocks is None


def test_extract_links():
    from evolution_spark.operators.html import extract_links

    html = (
        '<a href="/a">x</a>'
        "<script>var s = '<a href=\"/script-decoy\">'</script>"
        "<a href='/b?q=1&amp;r=2'>y</a><!-- <a href=/comment> -->"
        "<A HREF=bare>z</A><a name=anchor>no href</a>"
        '<div data-x="a > b"><a href="/after-attr-gt">k</a></div>'
        '<a href="">empty dropped</a><a href=" /sp ">stripped</a>'
        "<![CDATA[<a href=/cdata>]]>"
    )
    assert extract_links(html) == [
        "/a", "/b?q=1&r=2", "bare", "/after-attr-gt", "/sp"]
    # bytes input goes through the charset-sniffed total decode
    assert extract_links(b"<a href='/u'>\xff</a>") == ["/u"]
    # malformed: total, never raises
    for s in (b"<a href", b"<a href='unterminated", b"<", b""):
        assert isinstance(extract_links(s), list)


def test_extract_html_links_spark(spark):
    from evolution_spark.operators.html import extract_html_links

    rows = [
        ("http://h/0", b'<a href="/x">a</a><a href="/y">b</a>', "text/html"),
        ("http://h/1", b"<script><a href='/no'></script>", "text/html"),
        ("http://h/2", None, None),
    ]
    df = spark.createDataFrame(
        rows, "uri string, payload binary, content_type string")
    got = extract_html_links(df).orderBy("src_uri", "link_pos").collect()
    # resolve=True default (round 15): href is canonical, raw kept
    assert [(r.src_uri, r.href, r.raw_href, r.link_pos)
            for r in got] == [
        ("http://h/0", "http://h/x", "/x", 0),
        ("http://h/0", "http://h/y", "/y", 1)]


def test_review_pass_robustness_fixes():
    """round 14 review pass 2: real-world byte-soup cases that used to
    poison extraction."""
    from evolution_spark.operators.html import extract_links

    # 1. unclosed <a>: a new <a> implicitly closes it, so later text
    #    is not all anchor-flagged (stuck-depth poisoning)
    blocks, _ = parse_blocks(
        '<li><a href="/x">Item one</a></li>'
        '<li><a href="/y">Item two</li>'   # forgot </a>
        "<p>" + " ".join(f"w{k}" for k in range(20)) + "</p>"
        '<p><a href="/z">next anchor</a> trailing words here</p>')
    # the 20-word paragraph is still inside the unclosed anchor
    # (HTML5: block tags do not close <a>) but the NEXT anchor resets
    assert blocks[-1].n_anchor_words == 2
    # 2. stray apostrophe in an unquoted attr value must not swallow
    #    the document
    blocks, _ = parse_blocks(
        "<a href=obrien's.html>link</a> <p>body text stays</p>")
    assert any("body text stays" in b.text for b in blocks)
    # 3. </scripts> does not terminate <script>
    blocks, _ = parse_blocks(
        "<script>a = 1; </scripts> leak; </script><p>real text</p>")
    assert [b.text for b in blocks] == ["real text"]
    # 4. WHATWG: a meta-declared utf-16 on ASCII-readable bytes means
    #    utf-8, not mojibake
    assert sniff_charset(b'<meta charset="utf-16">x') == ("utf-8", 0)
    # 5. SVG <title> never leaks into block text
    blocks, title = parse_blocks(
        "<title>Doc</title><p>para words here</p>"
        "<svg><title>chart tooltip</title></svg><p>more body</p>")
    assert title == "Doc"
    assert not any("tooltip" in b.text for b in blocks)
    # 6. data-href is not a link; title bodies yield no links
    assert extract_links(
        '<a data-href="/t" href="/real">x</a>'
        "<title><a href='/in-title'>t</a></title>"
        '<a title="see href=decoy">no link</a>') == ["/real"]


def test_review_pass_3_offset_and_prescan():
    """round 14 review pass 3: length-changing lowercase desync and
    prescan attribute-position rules."""
    from evolution_spark.operators.html import extract_links

    # U+0130 lowercases to TWO code points — the offset map must be
    # length-preserving or everything after a raw-text element is lost
    blocks, _ = parse_blocks(
        "İ<script>var x = 1;</script><p>hello world</p>")
    assert [b.text for b in blocks] == ["İ", "hello world"]
    assert extract_links('İ<script>s</script><a href="/x">l</a>') == \
        ["/x"]
    # commented-out meta and charset= inside unrelated attributes are
    # NOT declarations; the http-equiv form still is
    assert sniff_charset(
        b'<!-- <meta charset="shift_jis"> --><p>x</p>') == (None, 0)
    assert sniff_charset(
        b'<meta name="d" content="charset=big5 fans">') == (None, 0)
    assert sniff_charset(
        b'<!-- unterminated <meta charset="big5">') == (None, 0)
    assert sniff_charset(
        b'<meta http-equiv="content-type" '
        b'content="text/html; charset=ISO-8859-1">') == ("cp1252", 0)


def test_url_resolution_unit():
    """round 15 (judge ask 3): WHATWG basic resolution forms, base
    href precedence, canonicalization (case/port/fragment/backslash),
    total behavior on junk."""
    from evolution_spark.operators.html import (
        canonicalize_url,
        extract_links_resolved,
        resolve_url,
    )

    base = "http://G.Example.COM:80/d0/p00"
    for ref, want in [
        ("p07", "http://g.example.com/d0/p07"),          # relative
        ("../d1/p07", "http://g.example.com/d1/p07"),    # dot-segment
        ("/d1/p07", "http://g.example.com/d1/p07"),      # abs-path
        ("//G.EXAMPLE.COM:80/d1/p07",
         "http://g.example.com/d1/p07"),                 # net-path
        ("#top", "http://g.example.com/d0/p00"),         # fragment
        ("\\d1\\p07", "http://g.example.com/d1/p07"),    # backslashes
        ("HtTpS://Ex.COM:443/a?q=1#f",
         "https://ex.com/a?q=1"),                        # abs URL
        ("  http://h/x\t\n  ", "http://h/x"),            # WHATWG trim
        ("mailto:u@e.x", "mailto:u@e.x"),                # non-special
    ]:
        assert canonicalize_url(resolve_url(ref, base)) == want, ref
    assert resolve_url("", base) is None
    assert resolve_url("x", None) is None
    assert resolve_url(None, base) is None
    # empty path of an authority URL -> "/"
    assert canonicalize_url("HTTP://Host.COM") == "http://host.com/"
    # non-default port kept; IPv6 brackets survive
    assert canonicalize_url("http://h:8080/x") == "http://h:8080/x"
    assert canonicalize_url("http://[::1]:8080/x") == \
        "http://[::1]:8080/x"
    # userinfo preserved
    assert canonicalize_url("http://U:pw@H.com:80/") == \
        "http://U:pw@h.com/"
    # junk comes back unchanged, never raises
    assert canonicalize_url("http://h:99999/x") == "http://h:99999/x"

    html = (b'<html><head><base href="http://g.example.com/d1/">'
            b'<base href="/IGNORED/"></head><body>'
            b'<a href="p03">x</a><a href="../d0/p04">y</a>'
            b'<a href="bad\x01url%">z</a>'
            b"<script>var a='<a href=\"/page99\">';</script>"
            b'</body></html>')
    got = extract_links_resolved(html, "http://G.Example.COM:80/d0/p00")
    # FIRST base wins; second ignored; script decoy skipped
    assert got[0] == ("p03", "http://g.example.com/d1/p03")
    assert got[1] == ("../d0/p04", "http://g.example.com/d0/p04")
    assert len(got) == 3
    # absolute <base> works without a document URL
    got = extract_links_resolved(html, None)
    assert got[0][1] == "http://g.example.com/d1/p03"
    # no base element, no document URL -> unresolvable, raw kept
    from evolution_spark.operators.html import extract_links
    plain = b'<a href="rel/x">r</a>'
    assert extract_links(plain) == ["rel/x"]
    from evolution_spark.operators.html import extract_links_resolved as elr
    assert elr(plain, None) == [("rel/x", None)]


def test_extract_html_links_resolved_spark(spark):
    """resolve=True default: 4-column schema with canonical hrefs;
    resolve=False keeps the verbatim 3-column shape."""
    import pandas as pd

    from evolution_spark.operators.html import extract_html_links

    pdf = pd.DataFrame({
        "uri": ["http://A.com:80/dir/page1", "http://b.com/x"],
        "content_type": ["text/html", "text/html"],
        "payload": [
            b'<a href="other">o</a><a href="#f">s</a>',
            b'<base href="http://c.com/base/"><a href="q">q</a>',
        ],
    })
    df = spark.createDataFrame(pdf)
    rows = extract_html_links(df).collect()
    got = {(r.src_uri, r.raw_href): r.href for r in rows}
    assert got[("http://A.com:80/dir/page1", "other")] == \
        "http://a.com/dir/other"
    assert got[("http://A.com:80/dir/page1", "#f")] == \
        "http://a.com/dir/page1"
    assert got[("http://b.com/x", "q")] == "http://c.com/base/q"
    raw_rows = extract_html_links(df, resolve=False).collect()
    assert set(raw_rows[0].asDict().keys()) == {
        "src_uri", "href", "link_pos"}
    assert sorted(r.href for r in raw_rows) == ["#f", "other", "q"]
