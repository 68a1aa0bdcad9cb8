"""WARC source (sources/warc.py, X44): spec round-trips, malformed-input
degradation, bomb guards, and the Content-Length-driven framing that a
hostile payload cannot desynchronize.

The end-to-end oracle (distributed pack -> parse == envelope-arithmetic
witness) runs in tests/test_entry_contract.py."""

from __future__ import annotations

import gzip
import random

import pytest

from ocr_pipeline_spark.sources.warc import (
    MAX_RECORD_BYTES,
    build_warc,
    http_response_payload,
    parse_warc,
    split_http_response,
    warc_pages_df,
)


def _recs(n=5):
    return [
        {
            "rec_type": "response",
            "url": f"https://h{i}.example.com/p/{i}",
            "date": f"2024-01-0{i % 9 + 1}T00:00:0{i % 10}Z",
            "payload": http_response_payload(
                f"<html><body>doc {i}</body></html>".encode()
            ),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_round_trip(gz):
    recs = _recs()
    out = parse_warc(build_warc(recs, per_record_gzip=gz))
    assert len(out) == len(recs)
    for want, got in zip(recs, out):
        assert got["rec_type"] == "response"
        assert got["url"] == want["url"]
        assert got["date"] == want["date"]
        assert got["payload"] == want["payload"]
        status, body = split_http_response(got["payload"])
        assert status == 200
        assert body == split_http_response(want["payload"])[1]


def test_payload_containing_warc_magic_does_not_desync():
    """Framing is Content-Length-driven: a body that embeds a fake
    record header must not split the archive."""
    evil = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nnot a record"
    recs = [
        {"rec_type": "resource", "url": "u1", "date": "2024-01-01T00:00:00Z",
         "payload": evil},
        {"rec_type": "resource", "url": "u2", "date": "2024-01-01T00:00:01Z",
         "payload": b"tail"},
    ]
    out = parse_warc(build_warc(recs))
    assert [r["url"] for r in out] == ["u1", "u2"]
    assert out[0]["payload"] == evil


def test_truncated_archive_yields_prior_records():
    data = build_warc(_recs(3))
    cut = parse_warc(data[: len(data) - len(data) // 3])
    assert 1 <= len(cut) < 3
    full = parse_warc(data)
    for a, b in zip(cut, full):
        assert a["payload"] == b["payload"]


def test_lying_content_length_stops_cleanly():
    blob = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        b"Content-Length: %d\r\n\r\n" % (MAX_RECORD_BYTES + 1)
    )
    assert parse_warc(blob + b"x" * 64) == []
    assert parse_warc(
        b"WARC/1.0\r\nContent-Length: nope\r\n\r\n"
    ) == []


def test_gzip_bomb_member_rejected():
    bomb_plain = b"A" * (MAX_RECORD_BYTES + 2)
    member = gzip.compress(bomb_plain)
    assert len(member) < 1 << 22  # it IS a bomb
    assert parse_warc(member) == []


def test_garbage_fuzz_never_raises():
    rng = random.Random(11)
    good = build_warc(_recs(2), per_record_gzip=True)
    for _ in range(300):
        n = rng.randrange(0, 200)
        blob = bytes(rng.randrange(256) for _ in range(n))
        parse_warc(blob)  # must not raise
        parse_warc(good[: rng.randrange(len(good))])


def test_split_http_response_edges():
    assert split_http_response(b"plain bytes") == (0, b"plain bytes")
    assert split_http_response(b"HTTP/1.1 \r\n\r\nx") == (
        0,
        b"HTTP/1.1 \r\n\r\nx",
    )
    assert split_http_response(b"HTTP/1.1 404 NF\r\nA: b\r\n\r\nbody") == (
        404,
        b"body",
    )


def test_distributed_parse_partition_invariant(spark):
    """Same records whatever the blob partitioning — the kernel is a
    pure per-blob function."""
    recs = _recs(8)
    blob = build_warc(recs, per_record_gzip=True)
    rows = [(i, blob) for i in range(4)]  # 4 copies of the archive
    df = spark.createDataFrame(rows, "warc_id int, warc binary")
    out1 = (
        warc_pages_df(df.repartition(1), "warc")
        .orderBy("url").toPandas()
    )
    out7 = (
        warc_pages_df(df.repartition(7), "warc")
        .orderBy("url").toPandas()
    )
    assert len(out1) == 4 * len(recs)
    assert out1.equals(out7)


def test_near_cap_payload_parses_in_both_layouts():
    """A payload just under MAX_RECORD_BYTES must survive BOTH the
    plain and the per-record-gzip layout: the gzip member's plaintext
    carries the WARC header envelope on top of the payload, so the
    inflation bound must be payload cap + header allowance, not the
    bare payload cap (regression: the envelope tripped the cap and the
    record silently vanished in the exact layout Common Crawl uses)."""
    from ocr_pipeline_spark.sources.warc import (
        MAX_RECORD_BYTES,
        build_warc,
        parse_warc,
    )

    rec = {
        "rec_type": "response",
        "url": "https://cap.example.com/big",
        "date": "2024-01-01T00:00:00Z",
        "payload": b"x" * (MAX_RECORD_BYTES - 50),
    }
    assert len(parse_warc(build_warc([rec]))) == 1
    assert len(parse_warc(build_warc([rec], per_record_gzip=True))) == 1
    # and one byte OVER the payload cap is rejected in both layouts
    big = dict(rec, payload=b"x" * (MAX_RECORD_BYTES + 1))
    assert parse_warc(build_warc([big])) == []
    assert parse_warc(build_warc([big], per_record_gzip=True)) == []


def test_wet_export_deterministic_and_round_trips(spark):
    """X61: the WET exporter's shard md5s are partition-invariant
    (content-addressed shards, url-sorted records, pinned gzip mtime),
    and the container parses back to the exact (url, payload) set with
    rec_type 'conversion'."""
    import hashlib

    from ocr_pipeline_spark.sources.warc import (
        build_warc,
        parse_warc,
        wet_export_df,
    )

    rows = [
        (f"https://s{i % 3}.example.com/d/{i}",
         "2024-01-01T00:00:00Z",
         f"extracted text {i} " * 5)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "url string, wet_date string, text string")
    one = wet_export_df(df.repartition(1), n_shards=4).collect()
    many = wet_export_df(df.repartition(13), n_shards=4).collect()
    key = lambda r: (r.shard, r.n_records, r.n_bytes, r.wet_md5)  # noqa: E731
    assert sorted(map(key, one)) == sorted(map(key, many))
    assert sum(r.n_records for r in one) == 40

    # twin build of shard 0 in-process: md5 equality proves the Spark
    # path wrote byte-identical container bytes; then parse them back
    shard0 = sorted(
        (u, d, t) for u, d, t in rows
        if int(hashlib.md5(u.encode()).hexdigest()[0], 16) % 4 == 0
    )
    blob = build_warc(
        [
            {"rec_type": "conversion", "url": u, "date": d,
             "payload": t.encode("utf-8")}
            for u, d, t in shard0
        ],
        per_record_gzip=True,
    )
    spark_shard0 = next(r for r in one if r.shard == 0)
    assert spark_shard0.wet_md5 == hashlib.md5(blob).hexdigest()
    assert spark_shard0.n_bytes == len(blob)
    parsed = parse_warc(blob)
    assert [(p["url"], p["payload"]) for p in parsed] == [
        (u, t.encode("utf-8")) for u, _, t in shard0
    ]
    assert all(p["rec_type"] == "conversion" for p in parsed)
