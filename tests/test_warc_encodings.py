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
