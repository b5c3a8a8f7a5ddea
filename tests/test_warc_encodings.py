"""sources/warc.py — HTTP wire-framing undo (round-8): chunked
transfer framing and gzip/deflate content encodings are the norm in
real crawl archives; leaving them in `payload` corrupts text
extraction and charset decoding downstream."""

from __future__ import annotations

import gzip as _gzip
import zlib

import pytest

from polars_fastx_spark.sources import warc
from polars_fastx_spark.sources.warc import (
    _dechunk,
    _decode_content_encoding,
)

BODY = "<html><body><p>réal page body…</p></body></html>".encode("utf-8")


def _chunked(body: bytes, sizes=(7, 11, 5)) -> bytes:
    out, i = [], 0
    it = iter(sizes)
    while i < len(body):
        n = min(next(it, 16), len(body) - i)
        out.append(f"{n:x}".encode() + b"\r\n" + body[i:i + n] + b"\r\n")
        i += n
    out.append(b"0\r\n\r\n")
    return b"".join(out)


def test_dechunk_roundtrip_and_extensions():
    assert _dechunk(_chunked(BODY)) == BODY
    # chunk extensions after ';' are ignored per spec
    framed = (b"5;ext=1\r\nhello\r\n0\r\n\r\n")
    assert _dechunk(framed) == b"hello"


def test_dechunk_malformed_keeps_raw():
    for raw in (b"zz\r\nhello", b"5\r\nhel", b"nochunks at all", b""):
        assert _dechunk(raw) == raw


def test_content_encoding_gzip_deflate_and_corrupt():
    assert _decode_content_encoding(_gzip.compress(BODY), "gzip") == BODY
    assert _decode_content_encoding(
        zlib.compress(BODY), "deflate"
    ) == BODY
    # raw-deflate (the historical IE-style server bug) also decodes
    comp = zlib.compressobj(wbits=-15)
    raw = comp.compress(BODY) + comp.flush()
    assert _decode_content_encoding(raw, "deflate") == BODY
    # corrupt stream keeps the raw bytes
    assert _decode_content_encoding(b"\x1f\x8bgarbage", "gzip") == \
        b"\x1f\x8bgarbage"
    assert _decode_content_encoding(BODY, "identity") == BODY


def _http_block(body: bytes, extra_headers: str) -> bytes:
    return (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        f"{extra_headers}\r\n\r\n"
    ).encode() + body


def test_scan_undoes_chunked_and_gzip(spark, tmp_path):
    recs = [
        warc.render_warc_record(
            "<urn:uuid:e-0>", "response", "https://a.com/chunked",
            "2026-08-15T00:00:00Z",
            _http_block(_chunked(BODY), "Transfer-Encoding: chunked"),
        ),
        warc.render_warc_record(
            "<urn:uuid:e-1>", "response", "https://a.com/gz",
            "2026-08-15T00:00:00Z",
            _http_block(_gzip.compress(BODY), "Content-Encoding: gzip"),
        ),
        warc.render_warc_record(
            "<urn:uuid:e-2>", "response", "https://a.com/both",
            "2026-08-15T00:00:00Z",
            _http_block(
                _chunked(_gzip.compress(BODY)),
                "Transfer-Encoding: chunked\r\nContent-Encoding: gzip",
            ),
        ),
        warc.render_warc_record(
            "<urn:uuid:e-3>", "response", "https://a.com/plain",
            "2026-08-15T00:00:00Z", _http_block(BODY, "X-Extra: 1"),
        ),
    ]
    path = tmp_path / "enc.warc.gz"
    warc.write_warc(str(path), recs)
    rows = {
        r["target_uri"]: bytes(r["payload"])
        for r in warc.scan_warc(spark, str(path)).collect()
    }
    assert rows["https://a.com/chunked"] == BODY
    assert rows["https://a.com/gz"] == BODY
    assert rows["https://a.com/both"] == BODY
    assert rows["https://a.com/plain"] == BODY
    # and the decoded payload flows into exact text downstream
    from polars_fastx_spark.functions.charset import decode_payloads

    out = decode_payloads(warc.scan_warc(spark, str(path)))
    texts = {r["target_uri"]: r["text"] for r in out.collect()}
    want = BODY.decode("utf-8")
    assert all(t == want for t in texts.values()), texts


def test_decompression_bomb_keeps_raw_bytes():
    """Untrusted archive bytes must not OOM the executor (round-8
    ADVICE medium #2): the inflate is output-bounded, and a body
    whose decompressed size blows past the cap keeps its raw bytes —
    the module's best-effort contract, one layer down."""
    bomb = _gzip.compress(b"\x00" * (8 << 20))   # ~8 KB -> 8 MiB
    assert len(bomb) < 64 << 10
    # under a 1 MiB cap the bomb never materializes
    assert _decode_content_encoding(bomb, "gzip", cap=1 << 20) == bomb
    zbomb = zlib.compress(b"\x00" * (8 << 20))
    assert _decode_content_encoding(zbomb, "deflate", cap=1 << 20) == zbomb
    # a legitimate page under the cap still decodes
    assert _decode_content_encoding(
        _gzip.compress(BODY), "gzip", cap=1 << 20
    ) == BODY
    # truncated stream still keeps raw bytes (partial inflate would
    # silently hand downstream a cut-off page as if complete)
    trunc = _gzip.compress(BODY)[:-6]
    assert _decode_content_encoding(trunc, "gzip") == trunc


def test_undo_content_encoding_chain_and_residual():
    """RFC 9110 chain undo with residual surfacing: codings undo in
    reverse listed order; the undo stops at the first coding it
    cannot handle and the remainder is the residual downstream
    quarantine keys on."""
    body, res = warc._undo_content_encodings(_gzip.compress(BODY), "gzip")
    assert (body, res) == (BODY, None)
    body, res = warc._undo_content_encodings(BODY, "identity")
    assert (body, res) == (BODY, None)
    # unsupported label: raw kept, residual surfaced
    body, res = warc._undo_content_encodings(b"\x00br-bytes", "br")
    assert (body, res) == (b"\x00br-bytes", "br")
    # 'gzip, br' (gzip applied first, br last): br is outermost and
    # cannot be undone, so the gzip beneath it is unreachable too
    blob = _gzip.compress(BODY)
    body, res = warc._undo_content_encodings(blob, "gzip, br")
    assert (body, res) == (blob, "gzip, br")
    # 'br, gzip': the outer gzip undoes, then the chain stops at br
    body, res = warc._undo_content_encodings(
        _gzip.compress(b"BRDATA"), "br, gzip"
    )
    assert (body, res) == (b"BRDATA", "br")
    # corrupt stream -> its own label is the residual
    body, res = warc._undo_content_encodings(b"\x1f\x8bgarbage", "gzip")
    assert (body, res) == (b"\x1f\x8bgarbage", "gzip")


def test_injectable_content_decoder_seam():
    """Environments with brotli/zstd register a decoder and those
    bodies decode like gzip (the Pillow/JPEG injection precedent);
    a decoder that raises keeps the residual."""
    xor = lambda b: bytes(x ^ 0xFF for x in b)  # noqa: E731 — stand-in codec
    try:
        warc.register_content_decoder("br", xor)
        enc = xor(BODY)
        assert warc._undo_content_encodings(enc, "br") == (BODY, None)
        # chained under gzip: both undo
        assert warc._undo_content_encodings(
            _gzip.compress(enc), "br, gzip"
        ) == (BODY, None)

        def _boom(_):
            raise ValueError("no codec")

        warc.register_content_decoder("zstd", _boom)
        assert warc._undo_content_encodings(b"zz", "zstd") == (b"zz", "zstd")
    finally:
        warc.CONTENT_DECODERS.pop("br", None)
        warc.CONTENT_DECODERS.pop("zstd", None)


def test_scan_surfaces_residual_content_encoding(spark, tmp_path):
    """The parser surfaces what it could not undo: decodable bodies
    scan with content_encoding NULL, a br body keeps its raw bytes
    with 'br' in the column — the signal the crawl front door's
    quarantine keys on."""
    br_bytes = bytes(range(256)) * 4  # stand-in compressed bytes
    recs = [
        warc.render_warc_record(
            "<urn:uuid:q-0>", "response", "https://a.com/gz",
            "2026-08-15T00:00:00Z",
            _http_block(_gzip.compress(BODY), "Content-Encoding: gzip"),
        ),
        warc.render_warc_record(
            "<urn:uuid:q-1>", "response", "https://a.com/br",
            "2026-08-15T00:00:00Z",
            _http_block(br_bytes, "Content-Encoding: br"),
        ),
        warc.render_warc_record(
            "<urn:uuid:q-2>", "response", "https://a.com/plain",
            "2026-08-15T00:00:00Z", _http_block(BODY, "X-Extra: 1"),
        ),
    ]
    path = tmp_path / "q.warc.gz"
    warc.write_warc(str(path), recs)
    rows = {
        r["target_uri"]: (bytes(r["payload"]), r["content_encoding"])
        for r in warc.scan_warc(spark, str(path)).collect()
    }
    assert rows["https://a.com/gz"] == (BODY, None)
    assert rows["https://a.com/br"] == (br_bytes, "br")
    assert rows["https://a.com/plain"] == (BODY, None)


def test_crawl_quarantines_undecodable_bodies(spark, tmp_path):
    """E2E 'done' bar for the round-8 verdict's top task: a planted
    br-encoded record provably never reaches the text tier as text —
    it drops at the quarantine stage (counted in the phase
    accounting), while its decodable neighbors flow through."""
    from polars_fastx_spark.pipeline import crawl_to_corpus

    def filler(tag):
        # per-page DISTINCT filler (shared filler -> LSH collapse)
        return " ".join(f"{tag}{i} token" for i in range(30))

    ok_a = f"plain page body {filler('pa')}"
    ok_b = f"gzip page body {filler('gb')}"
    # stand-in br bytes: NOT valid gzip/deflate, high-entropy enough
    # that a windows-1252 "decode" of them would read as garbage
    br_bytes = bytes(range(256)) * 8

    def _rec(i, uri, block):
        return warc.render_warc_record(
            f"<urn:uuid:e2e-{i}>", "response", uri,
            "2026-08-01T00:00:00Z", block,
        )

    recs = [
        _rec(0, "https://ok.example/a",
             _http_block(
                 f"<html><body><p>{ok_a}</p></body></html>".encode(),
                 "X-Extra: 1")),
        _rec(1, "https://ok.example/b",
             _http_block(
                 _gzip.compress(
                     f"<html><body><p>{ok_b}</p></body></html>".encode()),
                 "Content-Encoding: gzip")),
        _rec(2, "https://bad.example/br",
             _http_block(br_bytes, "Content-Encoding: br")),
    ]
    src = tmp_path / "crawl"
    src.mkdir()
    warc.write_warc(str(src / "a.warc.gz"), recs)

    timings: dict = {}
    got = crawl_to_corpus(
        spark, str(src) + "/*.warc.gz", str(tmp_path / "corpus"),
        domain_cap_n=10, timings=timings,
    )
    urls = {r["url"] for r in got.collect()}
    assert "https://ok.example/a" in urls
    assert "https://ok.example/b" in urls
    # the br record is gone — and no corpus text contains its bytes
    # mojibake'd (the windows-1252 view of byte 0xNN)
    assert not any("bad.example" in u for u in urls)
    texts = " ".join(r["text"] for r in got.collect())
    assert br_bytes.decode("windows-1252", errors="replace")[:40] not in texts
    # phase accounting shows the drop: 3 responses in, 2 survive
    assert timings["quarantine"]["rows"] == 2


def test_quarantine_observability_form(spark):
    """quarantine_undecoded keeps rows, flags them, and nulls text."""
    from polars_fastx_spark.functions.charset import quarantine_undecoded

    df = spark.createDataFrame(
        [(1, None, "good"), (2, "br", "garbage"),
         (3, "", "also good"), (4, "gzip, br", "worse")],
        "id long, content_encoding string, text string",
    )
    got = {
        r["id"]: (r["quarantined"], r["text"])
        for r in quarantine_undecoded(df).collect()
    }
    assert got == {
        1: (False, "good"), 2: (True, None),
        3: (False, "also good"), 4: (True, None),
    }


def test_stream_warc_surfaces_residual_content_encoding(spark, tmp_path):
    """The streaming WARC source shares the batch parser, so the
    content_encoding residual (and the quarantine predicate over it)
    reaches live-ingest pipelines identically: a br body streams with
    its raw bytes + 'br', a gzip body streams decoded + NULL."""
    from polars_fastx_spark.functions.charset import undecoded_flag
    from polars_fastx_spark.streaming.warc_stream import stream_warc

    src = tmp_path / "warcs"
    src.mkdir()
    br_bytes = bytes(range(256)) * 4
    warc.write_warc(
        str(src / "a.warc.gz"),
        [
            warc.render_warc_record(
                "<urn:uuid:sq-0>", "response", "https://a.com/gz",
                "2026-08-15T00:00:00Z",
                _http_block(_gzip.compress(BODY), "Content-Encoding: gzip"),
            ),
            warc.render_warc_record(
                "<urn:uuid:sq-1>", "response", "https://a.com/br",
                "2026-08-15T00:00:00Z",
                _http_block(br_bytes, "Content-Encoding: br"),
            ),
        ],
    )
    out = tmp_path / "mem"
    q = (
        stream_warc(spark, str(src))
        .withColumn("q", undecoded_flag())
        .writeStream.format("memory")
        .queryName("warc_ce_stream")
        .option(
            "checkpointLocation", str(tmp_path / "ck")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["target_uri"]: (bytes(r["payload"]), r["content_encoding"], r["q"])
        for r in spark.sql("SELECT * FROM warc_ce_stream").collect()
    }
    assert rows["https://a.com/gz"] == (BODY, None, False)
    assert rows["https://a.com/br"] == (br_bytes, "br", True)
