"""WARC revisit records (round 11, mm42): encode/resolve round trip in
both archive layouts, digest verification, dangling references, and the
corruption contract."""

from __future__ import annotations

import pytest

from youbike_etl_pipeline_spark.operators.revisit import (
    REVISIT_PROFILE,
    encode_revisit_warc,
    payload_digest,
    resolve_revisits,
)
from youbike_etl_pipeline_spark.operators.warc import parse_warc, warc_type

DOCS = [
    (10, b"group content 0", None),
    (20, b"group content 0", 10),
    (30, b"group content 1", None),
    (40, b"group content 1", 30),
    (50, b"group content 1", 30),
]


def test_digest_format():
    d = payload_digest(b"hello")
    assert d.startswith("sha1:") and len(d) == 5 + 32
    # RFC 4648 base32 alphabet only
    assert all(c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567=" for c in d[5:])


@pytest.mark.parametrize("gz", [True, False])
def test_round_trip_both_layouts(gz):
    payload = encode_revisit_warc(DOCS, per_record_gzip=gz)
    rows = resolve_revisits(payload)
    assert len(rows) == 5
    by_uri = {r["uri"]: r for r in rows}
    orig = by_uri["http://example.com/doc/10"]
    assert not orig["is_revisit"]
    assert orig["payload"] == b"group content 0"
    # responses verify their OWN declared digest (non-null so the
    # digest_ok column never mixes bool and null — nullable booleans
    # stringify differently in the driver's pandas compare)
    assert orig["refers_to"] is None and orig["digest_ok"] is True
    dup = by_uri["http://example.com/doc/20"]
    assert dup["is_revisit"]
    assert dup["refers_to"].endswith("000002")
    assert dup["digest_ok"] is True
    # dedup resolution reconstructs the elided payload
    assert dup["payload"] == b"group content 0"
    assert by_uri["http://example.com/doc/50"]["payload"] == b"group content 1"


def test_revisit_record_shape():
    payload = encode_revisit_warc(DOCS[:2], per_record_gzip=False)
    records = parse_warc(payload)
    revisits = [r for r in records if warc_type(r) == "revisit"]
    assert len(revisits) == 1
    heads = {k.lower(): v for k, v in revisits[0]["headers"].items()}
    assert heads["warc-profile"] == REVISIT_PROFILE
    assert heads["warc-refers-to-target-uri"] == "http://example.com/doc/10"
    assert "warc-refers-to-date" in heads
    # block carries HTTP headers ONLY — the payload is elided
    assert revisits[0]["block"].endswith(b"\r\n\r\n")
    assert b"group content" not in revisits[0]["block"]
    # the revisit block is far smaller than the payload it replaces
    assert len(revisits[0]["block"]) < len(b"group content 0") + 80


def test_tampered_original_payload_fails_digest():
    payload = encode_revisit_warc(DOCS[:2], per_record_gzip=False)
    # same-length flip of the ORIGINAL response's body: the revisit's
    # declared digest then mismatches the recomputed payload digest
    msg = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Content-Length: 15\r\n\r\ngroup content 0"
    )
    tampered = payload.replace(msg, msg[:-1] + b"X", 1)
    assert tampered != payload
    rows = resolve_revisits(tampered)
    dup = next(r for r in rows if r["is_revisit"])
    assert dup["digest_ok"] is False


def test_dangling_reference():
    payload = encode_revisit_warc([(20, b"x", 99)], per_record_gzip=False)
    rows = resolve_revisits(payload)
    assert rows[0]["is_revisit"]
    assert rows[0]["payload"] is None and rows[0]["digest_ok"] is None


def test_truncation_typed_errors():
    payload = encode_revisit_warc(DOCS, per_record_gzip=True)
    for cut in (len(payload) // 3, len(payload) - 7):
        try:
            resolve_revisits(payload[:cut])
        except ValueError:
            pass  # typed corruption error is the contract
