"""WARC (Web ARChive, ISO 28500) reader — and a conformance writer — in
pure stdlib, no warcio dependency.

WARC is the Common Crawl container: a concatenation of records, each a
``WARC/1.x`` version line, CRLF-terminated named headers, a CRLF CRLF
separator, ``Content-Length`` octets of block, and a CRLF CRLF record
separator. Crawl archives gzip each record as its OWN gzip member so
readers can split archives without decompressing them end-to-end — this
module handles both that per-record-member layout and plain concatenation,
walking gzip members with stdlib zlib (wbits=47) via ``unused_data``.

Response records carry an HTTP/1.1 message in the block;
:func:`http_response_body` splits the status line / headers from the body
so a text pipeline gets the payload octets. The writer
(:func:`encode_warc`) emits warcinfo/request/response records with
deterministic ids, so decode(encode(...)) is exact and oracle-checkable
against the source text.

Cost posture: header parsing is per-record Python over small records,
linear in archive bytes, run inside the same shuffle-free Arrow-batched
``mapInPandas`` as the codec family; at 100 TB each WARC file is one
input split and records never cross files, so the parse parallelizes
embarrassingly across executors.
"""

from __future__ import annotations

import zlib


#: Expansion ceiling for one archive's decompressed bytes. Same
#: decompression-bomb posture as the PNG bounded inflate: a ~50 KB gzip
#: member can legally expand ~1000:1, so a few-KB bomb shard could
#: otherwise allocate executor memory without bound. Crawl WARC files
#: are ~1 GiB decompressed; the cap is generous headroom, not a format
#: limit.
_MAX_ARCHIVE_BYTES = 4 << 30


def _gunzip_members(payload: bytes, max_bytes: int = _MAX_ARCHIVE_BYTES) -> bytes:
    """Decompress a concatenation of gzip members (the Common Crawl
    per-record layout) into one plain buffer, refusing archives that
    expand past ``max_bytes`` (decompression-bomb guard — the overflow
    is detected incrementally, never materialized)."""
    out = bytearray()
    rest = payload
    while rest:
        d = zlib.decompressobj(wbits=47)  # gzip or zlib header
        try:
            out.extend(d.decompress(rest, max(1, max_bytes - len(out))))
            while d.unconsumed_tail:
                if len(out) >= max_bytes:
                    raise ValueError(
                        f"WARC archive expands past {max_bytes} bytes"
                    )
                out.extend(
                    d.decompress(d.unconsumed_tail, max(1, max_bytes - len(out)))
                )
            out.extend(d.flush())
        except zlib.error as ex:
            raise ValueError(f"WARC gzip member corrupt: {ex}")
        if len(out) > max_bytes:
            raise ValueError(f"WARC archive expands past {max_bytes} bytes")
        if not d.eof:
            raise ValueError("truncated WARC gzip member")
        if d.unused_data == rest:
            raise ValueError("WARC gzip walk made no progress")
        rest = d.unused_data
    return bytes(out)


def parse_warc(payload: bytes) -> list[dict]:
    """WARC archive → list of records, each
    ``{"version", "headers" (dict, original-case keys), "block" (bytes)}``.
    Accepts plain or gzip (single- or per-record-member) archives.
    Raises ``ValueError`` on malformed version lines, headers,
    content lengths, or truncated blocks."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    records: list[dict] = []
    pos = 0
    n = len(payload)
    while pos < n:
        # tolerate the inter-record CRLFs
        while pos < n and payload[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        eol = payload.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("truncated WARC version line")
        version = payload[pos:eol].decode("ascii", "replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}: {version[:20]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        last_key: str | None = None
        while True:
            eol = payload.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("truncated WARC header block")
            line = payload[pos:eol]
            pos = eol + 2
            if not line:
                break
            if line[:1] in (b" ", b"\t") and last_key is not None:
                # ISO 28500 header folding: a leading-whitespace line
                # continues the previous field's value
                headers[last_key] += " " + line.decode("utf-8", "replace").strip()
                continue
            if b":" not in line:
                raise ValueError(f"malformed WARC header line {line[:40]!r}")
            k, v = line.split(b":", 1)
            last_key = k.decode("ascii", "replace").strip()
            headers[last_key] = v.decode("utf-8", "replace").strip()
        lengths = [v for k, v in headers.items() if k.lower() == "content-length"]
        if not lengths or not lengths[0].isdigit():
            raise ValueError("WARC record missing a numeric Content-Length")
        length = int(lengths[0])
        if pos + length > n:
            raise ValueError("truncated WARC record block")
        block = payload[pos : pos + length]
        pos += length
        tail = payload[pos : pos + 4]
        if tail != b"\r\n\r\n":
            # spec: two CRLFs terminate the record; a separator TRUNCATED
            # at EOF is tolerated (the remainder must be a prefix of the
            # CRLF pair — round-9 advisor: arbitrary 1-3 trailing bytes
            # previously parsed silently), anything else is corruption
            if pos + 4 <= n or not b"\r\n\r\n".startswith(tail):
                raise ValueError("WARC record separator missing")
        pos += 4
        records.append({"version": version, "headers": headers, "block": block})
    if not records:
        raise ValueError("empty WARC archive")
    return records


def warc_type(record: dict) -> str:
    for k, v in record["headers"].items():
        if k.lower() == "warc-type":
            return v
    return ""


def http_response_body(record: dict) -> tuple[int, bytes]:
    """Split a response record's HTTP/1.1 message → (status, body bytes).
    Raises ``ValueError`` when the block is not an HTTP response."""
    block = record["block"]
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        raise ValueError("WARC response block is not an HTTP message")
    status_line = block[: block.find(b"\r\n")].split(b" ")
    if len(status_line) < 2 or not status_line[1].isdigit():
        raise ValueError("malformed HTTP status line in WARC response")
    return int(status_line[1]), block[sep + 4 :]


def http_response_message(record: dict) -> tuple[int, dict, bytes]:
    """Split a response record's HTTP/1.1 message → (status, header dict,
    body bytes). Header names are lowercased; folded continuation lines
    extend the previous field (RFC 7230 obs-fold)."""
    status, body = http_response_body(record)
    block = record["block"]
    head = block[: block.find(b"\r\n\r\n")].split(b"\r\n")[1:]
    headers: dict[str, str] = {}
    last: str | None = None
    for line in head:
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.decode("latin-1").strip()
            continue
        if b":" not in line:
            raise ValueError(f"malformed HTTP header line {line[:40]!r}")
        k, v = line.split(b":", 1)
        last = k.decode("latin-1").strip().lower()
        headers[last] = v.decode("latin-1").strip()
    return status, headers, body


#: Expansion ceiling for ONE HTTP message body's content/transfer
#: decoding — same decompression-bomb posture as ``_gunzip_members``
#: but sized for a single page, not a whole archive.
_MAX_HTTP_BODY_BYTES = 1 << 28


def dechunk_http_body(body: bytes) -> bytes:
    """RFC 7230 §4.1 chunked transfer decoding: each chunk is a hex
    size line (optionally carrying ``;name=value`` chunk extensions,
    which are ignored), CRLF, ``size`` octets of data, CRLF; a zero-size
    chunk ends the data, followed by zero or more trailer fields and a
    final CRLF. WARC blocks carry the COMPLETE message as served, so
    bytes after the terminating CRLF are corruption, as is any
    truncation — both raise ``ValueError`` (the module's contract)."""
    out = bytearray()
    pos = 0
    n = len(body)
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("truncated HTTP chunk-size line")
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        if not size_tok or any(
            c not in b"0123456789abcdefABCDEF" for c in size_tok
        ):
            raise ValueError(f"malformed HTTP chunk size {size_tok[:16]!r}")
        size = int(size_tok, 16)
        pos = eol + 2
        if size == 0:
            break
        if len(out) + size > _MAX_HTTP_BODY_BYTES:
            raise ValueError(
                f"chunked HTTP body expands past {_MAX_HTTP_BODY_BYTES} bytes"
            )
        if pos + size + 2 > n:
            raise ValueError("truncated HTTP chunk data")
        out.extend(body[pos : pos + size])
        if body[pos + size : pos + size + 2] != b"\r\n":
            raise ValueError("HTTP chunk data missing its CRLF terminator")
        pos += size + 2
    while True:  # trailer section (RFC 7230 §4.1.2): fields then CRLF
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("truncated HTTP chunk trailer section")
        line = body[pos:eol]
        pos = eol + 2
        if not line:
            break
        if b":" not in line:
            raise ValueError(f"malformed HTTP trailer field {line[:40]!r}")
    if pos != n:
        raise ValueError("bytes after the HTTP last-chunk terminator")
    return bytes(out)


def inflate_http_body(
    body: bytes, coding: str, max_bytes: int = _MAX_HTTP_BODY_BYTES
) -> bytes:
    """Remove one ``gzip``/``x-gzip``/``deflate`` content- or
    transfer-coding (RFC 9110 §8.4.1). ``deflate`` means zlib-wrapped
    on the wire, but a notorious population of servers sends RAW
    deflate — both are accepted (zlib first, raw retry), matching what
    every production crawl client does. Decompression is bomb-capped
    incrementally like :func:`_gunzip_members`; truncated streams and
    trailing garbage raise ``ValueError``."""
    if coding in ("gzip", "x-gzip"):
        attempts: tuple[int, ...] = (31,)
    elif coding == "deflate":
        attempts = (15, -15)
    else:
        raise ValueError(f"unsupported HTTP content-coding {coding!r}")
    last_error: Exception | None = None
    for wbits in attempts:
        d = zlib.decompressobj(wbits=wbits)
        out = bytearray()
        try:
            out.extend(d.decompress(body, max(1, max_bytes - len(out))))
            while d.unconsumed_tail:
                if len(out) >= max_bytes:
                    raise ValueError(
                        f"HTTP body expands past {max_bytes} bytes"
                    )
                out.extend(
                    d.decompress(
                        d.unconsumed_tail, max(1, max_bytes - len(out))
                    )
                )
            out.extend(d.flush())
        except zlib.error as ex:
            last_error = ex
            continue
        if len(out) > max_bytes:
            raise ValueError(f"HTTP body expands past {max_bytes} bytes")
        if not d.eof:
            raise ValueError(f"truncated {coding} HTTP body")
        if d.unused_data:
            raise ValueError(f"trailing bytes after {coding} HTTP body")
        return bytes(out)
    raise ValueError(f"corrupt {coding} HTTP body: {last_error}")


def http_decode_body(
    headers: dict, body: bytes, max_bytes: int = _MAX_HTTP_BODY_BYTES
) -> bytes:
    """Undo ``Transfer-Encoding`` then ``Content-Encoding`` (RFC 7230
    §3.3.1: transfer codings are applied by the sender LAST, so the
    receiver removes them first; within each header the codings are
    listed in application order, so removal walks the list right to
    left). Common Crawl stores responses AS SERVED, so both are
    everyday inputs. ``headers`` is the lowercased-name dict
    :func:`http_response_message` returns; identity codings are
    no-ops; anything unrecognized raises ``ValueError``."""

    def codings(name: str) -> list[str]:
        return [
            t.strip().lower()
            for t in headers.get(name, "").split(",")
            if t.strip()
        ]

    for coding in reversed(codings("transfer-encoding")):
        if coding == "identity":
            continue
        if coding == "chunked":
            body = dechunk_http_body(body)
        elif coding in ("gzip", "x-gzip", "deflate"):
            body = inflate_http_body(body, coding, max_bytes)
        else:
            raise ValueError(f"unsupported HTTP transfer-coding {coding!r}")
    for coding in reversed(codings("content-encoding")):
        if coding == "identity":
            continue
        if coding in ("gzip", "x-gzip", "deflate"):
            body = inflate_http_body(body, coding, max_bytes)
        else:
            raise ValueError(f"unsupported HTTP content-coding {coding!r}")
    return body


def encode_http_payload(
    body: bytes, mode: str = "identity"
) -> "tuple[bytes, list[tuple[str, str]]]":
    """Apply a serving shape to an HTTP response body → ``(wire bytes,
    extra header fields)``. Modes (the mm34 fixture rotation — each is
    a shape real crawl archives contain):

    - ``identity`` — as-is (plus nothing; Content-Length is emitted by
      the caller for non-chunked bodies),
    - ``chunked`` — ``Transfer-Encoding: chunked`` with deterministic
      uneven chunk sizes, a chunk extension on the first chunk, and a
      trailer field (both must be ignored by the decoder),
    - ``gzip`` / ``deflate`` — ``Content-Encoding`` (deflate is
      zlib-wrapped, the spec shape),
    - ``gzip+chunked`` — gzip content-coding SERVED chunked, the
      everyday combination (removal order matters: dechunk first)."""
    if mode == "identity":
        return body, []

    def chunked(data: bytes) -> bytes:
        sizes = (7, 1, 64, 256)
        out = bytearray()
        pos = 0
        first = True
        while pos < len(data):
            size = min(sizes[pos % len(sizes)], len(data) - pos)
            ext = b";fixture=1" if first else b""
            out.extend(b"%x" % size + ext + b"\r\n")
            out.extend(data[pos : pos + size])
            out.extend(b"\r\n")
            pos += size
            first = False
        out.extend(b"0\r\nX-Fixture-Trailer: 1\r\n\r\n")
        return bytes(out)

    def gz(data: bytes) -> bytes:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(data) + co.flush()

    if mode == "chunked":
        return chunked(body), [("Transfer-Encoding", "chunked")]
    if mode == "gzip":
        return gz(body), [("Content-Encoding", "gzip")]
    if mode == "deflate":
        return zlib.compress(body, 6), [("Content-Encoding", "deflate")]
    if mode == "gzip+chunked":
        return chunked(gz(body)), [
            ("Content-Encoding", "gzip"),
            ("Transfer-Encoding", "chunked"),
        ]
    raise ValueError(f"unknown HTTP payload mode {mode!r}")


def http_charset(headers: dict, body: bytes, default: str = "utf-8") -> str:
    """Charset resolution the way crawl pipelines actually do it:
    the Content-Type ``charset=`` parameter wins, then a Unicode BOM,
    then the default. Returns a Python codec name."""
    ct = headers.get("content-type", "")
    for part in ct.split(";")[1:]:
        k, _, v = part.strip().partition("=")
        if k.strip().lower() == "charset" and v:
            return v.strip().strip('"').lower()
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    return default


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 dot-segment removal (``/a/../b/./c`` → ``/b/c``),
    the path half of URL canonicalization."""
    if not path:
        return path
    absolute = path.startswith("/")
    segs = path.split("/")
    out: list[str] = []
    for seg in segs:
        if seg == ".":
            continue
        if seg == "..":
            # un-resolvable leading ".." segments are removed (RFC 3986
            # §5.2.4 rules A/D), same as the absolute-root case
            if out and out[-1] != "":
                out.pop()
            continue
        out.append(seg)
    if segs[-1] in (".", "..") and (not out or out[-1] != ""):
        out.append("")  # trailing dot segments denote a directory
    res = "/".join(out)
    if absolute and not res.startswith("/"):
        res = "/" + res
    return res


#: RFC 3986 §2.3 unreserved characters — percent-encoded octets in this
#: set decode during normalization; everything else keeps its escape
#: (with uppercased hex digits, §6.2.2.1).
_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = None  # compiled lazily; urllib import is already deferred


def _normalize_pct(s: str) -> str:
    """RFC 3986 §6.2.2.1/§6.2.2.2 percent-encoding normalization:
    uppercase the hex digits of every valid ``%XX`` triplet and decode
    the ones that encode unreserved characters (``%7E`` → ``~``), so
    ``/doc/%7euser`` and ``/doc/~user`` canonicalize to the same dedup
    key. Invalid escapes (``%zz``, a trailing ``%``) pass through
    untouched — real crawl URLs carry them and they are not octets."""
    global _PCT_RE
    if _PCT_RE is None:
        import re

        _PCT_RE = re.compile("%([0-9a-fA-F]{2})")

    def sub(m: "object") -> str:
        octet = int(m.group(1), 16)
        ch = chr(octet)
        if octet < 128 and ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(sub, s)


def canonicalize_url(url: str) -> str:
    """RFC 3986 §6 URL normalization, the CCNet-style crawl dedup key:
    lowercase scheme + host, drop the scheme's default port (80/443),
    drop the fragment, normalize percent-encoding (uppercase ``%XX``
    hex, decode unreserved octets — :func:`_normalize_pct`), resolve
    dot segments, empty path → ``/``, and STABLE-sort query parameters
    by key (duplicate keys keep their relative order, so
    ``?z=9&y=8&z=1`` → ``?y=8&z=9&z=1``). A malformed authority (e.g.
    a non-numeric port) raises ``ValueError`` naming the URL — the
    module's corrupt-input contract (round-10 advisor)."""
    from urllib.parse import urlsplit, urlunsplit

    try:
        p = urlsplit(url.strip())
        port = p.port  # property access parses (and may reject) the port
    except ValueError as ex:
        raise ValueError(f"malformed URL {url!r}: {ex}")
    scheme = p.scheme.lower()
    host = (p.hostname or "").lower()
    default = {"http": 80, "https": 443}.get(scheme)
    netloc = host
    if port is not None and port != default:
        netloc = f"{host}:{port}"
    path = _remove_dot_segments(_normalize_pct(p.path)) or "/"
    query = (
        "&".join(
            sorted(
                _normalize_pct(p.query).split("&"),
                key=lambda kv: kv.split("=", 1)[0],
            )
        )
        if p.query
        else ""
    )
    return urlunsplit((scheme, netloc, path, query, ""))


def url_host(url: str) -> str:
    """Lowercased hostname without port — the host-level grouping key."""
    from urllib.parse import urlsplit

    return (urlsplit(url.strip()).hostname or "").lower()


def surt_key(url: str) -> str:
    """SURT (Sort-friendly URI Reordering Transform) of a URL — the
    public key format crawl indexes (CDX) sort by (pywb/OpenWayback
    convention): canonicalize (:func:`canonicalize_url`), then reverse
    the host labels comma-joined so one host's URLs sort contiguously,
    append a non-default port as ``:port``, then ``)`` and the
    canonical path + ``?`` + sorted query. The scheme is dropped —
    http/https variants of one page share a key.

    ``HTTP://Example.COM:80/doc/1?b=2&a=1#f`` →
    ``com,example)/doc/1?a=1&b=2``."""
    from urllib.parse import urlsplit

    p = urlsplit(canonicalize_url(url))
    host = ",".join(reversed((p.hostname or "").split(".")))
    if p.port is not None:
        host += f":{p.port}"
    return host + ")" + p.path + (("?" + p.query) if p.query else "")


def warc_record_spans(payload: bytes) -> "list[tuple[int, int]]":
    """Per-record ``(offset, length)`` spans INTO the original archive
    bytes — the CDX index payload that makes a 100 TB archive store
    range-addressable (fetch one record with a ranged read, no full
    scan). For per-record-gzip archives (the Common Crawl layout) the
    spans are gzip-member boundaries; for plain archives they are
    record boundaries. Aligned 1:1 with :func:`parse_warc`'s record
    list; each sliced span re-parses standalone to exactly that record
    (pinned by tests). Raises ``ValueError`` on corruption, same
    contract as the parser."""
    spans: list[tuple[int, int]] = []
    if payload[:2] == b"\x1f\x8b":
        rest = payload
        pos = 0
        while rest:
            d = zlib.decompressobj(wbits=47)
            try:
                d.decompress(rest, 1)
                while not d.eof:
                    if not d.unconsumed_tail:
                        raise ValueError("truncated WARC gzip member")
                    d.decompress(d.unconsumed_tail, 1 << 20)
            except zlib.error as ex:
                raise ValueError(f"WARC gzip member corrupt: {ex}")
            consumed = len(rest) - len(d.unused_data)
            if consumed == 0:
                raise ValueError("WARC gzip walk made no progress")
            spans.append((pos, consumed))
            pos += consumed
            rest = d.unused_data
        return spans
    pos = 0
    n = len(payload)
    while pos < n:
        while pos < n and payload[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        start = pos
        # version line + headers: find the blank line, read Content-Length
        head_end = payload.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        length = None
        for line in payload[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length" and v.strip().isdigit():
                length = int(v.strip())
                break
        if length is None:
            raise ValueError("WARC record missing a numeric Content-Length")
        if head_end + 4 + length > n:
            raise ValueError("truncated WARC record block")
        pos = head_end + 4 + length + 4  # headers + CRLFCRLF + block + sep
        spans.append((start, min(pos, n) - start))
    if not spans:
        raise ValueError("empty WARC archive")
    return spans


def messy_fixture_url(doc_id: int) -> str:
    """Deterministic non-canonical URL per document (rotated
    ``(doc_id // 10) % 5``): uppercase scheme/host + default port +
    unsorted query + fragment; default https port + trailing slash;
    an ALREADY-canonical URL with duplicate query keys (sort stability
    must leave it unchanged); a non-default port + fragment; and dot
    segments. The mm30 oracle re-derives each expected canonical form
    as a constant of the doc id."""
    r = (doc_id // 10) % 5
    if r == 0:
        return f"HTTP://Example.COM:80/doc/{doc_id}?b=2&a=1#frag"
    if r == 1:
        return f"https://WWW.Example.Org:443/doc/{doc_id}/"
    if r == 2:
        return f"http://cdn.example.net/doc/{doc_id}?y=8&z=9&z=1"
    if r == 3:
        return f"http://example.com:8080/doc/{doc_id}#sec-2"
    return f"HTTPS://example.com/a/../doc/./{doc_id}"


def encode_wet(
    docs: "list[tuple[int, str]]",
    per_record_gzip: bool = True,
    date: str = "2024-01-01T00:00:00Z",
    uris: "list[str] | None" = None,
) -> bytes:
    """(doc_id, extracted text) pairs → a WET file: the Common Crawl
    EXTRACTED-TEXT companion format — a WARC/1.0 archive of
    ``conversion`` records (ISO 28500 §6.8) whose blocks are the plain
    UTF-8 text, each carrying ``WARC-Refers-To`` naming the response
    record it was converted from (the id :func:`encode_warc` assigns)
    and the source ``WARC-Target-URI``. This is the SINK a crawl
    extraction pipeline writes; :func:`parse_warc` reads it back, so
    write→read is oracle-checkable byte-exactly."""

    def record(extra: dict, block: bytes, rid: str) -> bytes:
        head = [
            b"WARC/1.0",
            b"WARC-Type: conversion",
            b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
            b"WARC-Date: " + date.encode(),
        ]
        for k, v in extra.items():
            head.append(f"{k}: {v}".encode())
        head.append(b"Content-Length: " + str(len(block)).encode())
        return b"\r\n".join(head) + b"\r\n\r\n" + block + b"\r\n\r\n"

    def gz(member: bytes) -> bytes:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(member) + co.flush()

    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-00000000000e>\r\n"
        b"WARC-Date: " + date.encode() + b"\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 44\r\n\r\n"
        b"software: youbike-etl-pipeline-spark (wet)\r\n\r\n\r\n"
    )
    out = bytearray(gz(info) if per_record_gzip else info)
    for i, (doc_id, text) in enumerate(docs):
        uri = uris[i] if uris is not None else f"http://example.com/doc/{doc_id}"
        rec = record(
            {
                "WARC-Target-URI": uri,
                "WARC-Refers-To": (
                    f"<urn:uuid:{doc_id:08x}-0000-0000-0000-000000000002>"
                ),
                "Content-Type": "text/plain; charset=utf-8",
            },
            ("" if text is None else text).encode("utf-8"),
            f"{doc_id:08x}-0000-0000-0000-00000000000c",
        )
        out.extend(gz(rec) if per_record_gzip else rec)
    return bytes(out)


def encode_http_response(
    status: int,
    reason: str,
    headers: "list[tuple[str, str]]",
    body: bytes,
) -> bytes:
    """Assemble a complete HTTP/1.1 response message (status line,
    header fields, Content-Length, CRLF CRLF, body) — the WARC response
    block for non-200 fixture shapes (redirects, errors) that
    :func:`encode_warc`'s default 200 path doesn't cover."""
    lines = [f"HTTP/1.1 {status} {reason}".encode("latin-1")]
    for k, v in headers:
        lines.append(f"{k}: {v}".encode("latin-1"))
    lines.append(b"Content-Length: " + str(len(body)).encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + body


def encode_warc(
    docs: "list[tuple[int, bytes]]",
    per_record_gzip: bool = True,
    date: str = "2024-01-01T00:00:00Z",
    uris: "list[str] | None" = None,
    content_types: "list[str] | None" = None,
    transfer_modes: "list[str] | None" = None,
    http_messages: "list[bytes] | None" = None,
) -> bytes:
    """(doc_id, body bytes) pairs → a WARC/1.0 archive in the Common
    Crawl shape: one warcinfo record, then a request + response pair per
    document (the response wraps the body in an HTTP/1.1 200 message).
    ``per_record_gzip`` emits each record as its own gzip member, the
    layout crawl tooling expects; record ids derive from the doc ids, so
    the output is deterministic. ``uris`` overrides the default
    ``WARC-Target-URI`` per document (aligned with ``docs``);
    ``transfer_modes`` serves each document's HTTP body in a transfer
    shape (:func:`encode_http_payload` — chunked / gzip / deflate /
    gzip+chunked — Common Crawl stores responses AS SERVED);
    ``http_messages`` overrides the response's HTTP block entirely
    (aligned with ``docs``; entries may be None for the default 200
    path — :func:`encode_http_response` builds redirect/error shapes);
    the default path's bytes are pinned unchanged (tests/test_warc.py)."""

    def record(rtype: str, extra: dict, block: bytes, rid: str) -> bytes:
        head = [
            b"WARC/1.0",
            b"WARC-Type: " + rtype.encode(),
            b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
            b"WARC-Date: " + date.encode(),
        ]
        for k, v in extra.items():
            head.append(f"{k}: {v}".encode())
        head.append(b"Content-Length: " + str(len(block)).encode())
        return b"\r\n".join(head) + b"\r\n\r\n" + block + b"\r\n\r\n"

    def gz(member: bytes) -> bytes:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(member) + co.flush()

    out = bytearray()
    info = record(
        "warcinfo",
        {"Content-Type": "application/warc-fields"},
        b"software: youbike-etl-pipeline-spark\r\n",
        "00000000-0000-0000-0000-000000000000",
    )
    out.extend(gz(info) if per_record_gzip else info)
    for i, (doc_id, body) in enumerate(docs):
        uri = uris[i] if uris is not None else f"http://example.com/doc/{doc_id}"
        req = record(
            "request",
            {
                "WARC-Target-URI": uri,
                "Content-Type": "application/http; msgtype=request",
            },
            f"GET /doc/{doc_id} HTTP/1.1\r\nHost: example.com\r\n\r\n".encode(),
            f"{doc_id:08x}-0000-0000-0000-000000000001",
        )
        ct = (
            content_types[i]
            if content_types is not None
            else "text/plain; charset=utf-8"
        )
        override = http_messages[i] if http_messages is not None else None
        if override is not None:
            http = override
        else:
            mode = (
                transfer_modes[i] if transfer_modes is not None else "identity"
            )
            wire, extra = encode_http_payload(body, mode)
            head_lines = [
                b"HTTP/1.1 200 OK",
                b"Content-Type: " + ct.encode("latin-1"),
            ]
            for hk, hv in extra:
                head_lines.append(f"{hk}: {hv}".encode("latin-1"))
            if not any(hk.lower() == "transfer-encoding" for hk, _ in extra):
                # RFC 7230 §3.3.2: a message with Transfer-Encoding
                # carries no Content-Length; everything else states the
                # WIRE length
                head_lines.append(
                    b"Content-Length: " + str(len(wire)).encode()
                )
            http = b"\r\n".join(head_lines) + b"\r\n\r\n" + wire
        resp = record(
            "response",
            {
                "WARC-Target-URI": uri,
                "Content-Type": "application/http; msgtype=response",
            },
            http,
            f"{doc_id:08x}-0000-0000-0000-000000000002",
        )
        if per_record_gzip:
            out.extend(gz(req))
            out.extend(gz(resp))
        else:
            out.extend(req)
            out.extend(resp)
    return bytes(out)
