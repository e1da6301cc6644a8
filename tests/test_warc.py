"""WARC source: stdlib parser + Spark binaryFile->mapInPandas reader.

The reference has no archive source (defuddle.go parses strings/URLs);
read_warc is the Spark-native ingestion path for Common-Crawl-shaped
corpora — per-file parallelism over unsplittable multi-member gzip.
"""

import gzip

import pytest


def _http_payload(body: bytes, ctype=b"text/html; charset=utf-8",
                  chunked=False, content_gzip=False) -> bytes:
    headers = [b"HTTP/1.1 200 OK", b"Content-Type: " + ctype]
    if content_gzip:
        body = gzip.compress(body)
        headers.append(b"Content-Encoding: gzip")
    if chunked:
        headers.append(b"Transfer-Encoding: chunked")
        # two chunks + terminator
        half = max(1, len(body) // 2)
        body = (format(half, "x").encode() + b"\r\n" + body[:half] + b"\r\n"
                + format(len(body) - half, "x").encode() + b"\r\n"
                + body[half:] + b"\r\n0\r\n\r\n")
    else:
        headers.append(b"Content-Length: " + str(len(body)).encode())
    return b"\r\n".join(headers) + b"\r\n\r\n" + body


def _warc_record(url: str, payload: bytes, warc_type=b"response",
                 ctype=b'application/http; msgtype=response',
                 date=b"2024-03-01T12:00:00Z", rec_id=b"<urn:uuid:r1>"):
    head = [b"WARC/1.0",
            b"WARC-Type: " + warc_type,
            b"WARC-Date: " + date,
            b"WARC-Record-ID: " + rec_id,
            b"Content-Type: " + ctype,
            b"Content-Length: " + str(len(payload)).encode()]
    if url is not None:
        head.insert(2, b"WARC-Target-URI: " + url.encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _page(i: int, words: str = "warc page body text") -> bytes:
    return (f"<!DOCTYPE html><html><head><title>W{i}</title></head>"
            f"<body><article><h1>W{i}</h1><p>{words} {i}</p></article>"
            f"</body></html>").encode()


def _archive_members():
    """A realistic member list: warcinfo, then request/response pairs,
    one chunked, one content-gzip."""
    return [
        _warc_record(None, b"software: test\r\n", warc_type=b"warcinfo",
                     ctype=b"application/warc-fields", rec_id=b"<urn:uuid:w>"),
        _warc_record("https://w.example.test/0", b"GET /0 HTTP/1.1\r\n\r\n",
                     warc_type=b"request",
                     ctype=b"application/http; msgtype=request",
                     rec_id=b"<urn:uuid:q0>"),
        _warc_record("https://w.example.test/0", _http_payload(_page(0)),
                     rec_id=b"<urn:uuid:r0>"),
        _warc_record("https://w.example.test/1",
                     _http_payload(_page(1), chunked=True),
                     rec_id=b"<urn:uuid:r1>"),
        _warc_record("https://w.example.test/2",
                     _http_payload(_page(2), content_gzip=True),
                     rec_id=b"<urn:uuid:r2>"),
    ]


def test_iter_warc_records_plain_and_gzip():
    from defuddle_spark.spark.warc import iter_warc_records
    members = _archive_members()
    plain = b"".join(members)
    # Common-Crawl convention: one gzip member per record
    gz = b"".join(gzip.compress(m) for m in members)
    for raw in (plain, gz):
        recs = list(iter_warc_records(raw))
        assert [r.get("warc-type") for r in recs] == \
            ["warcinfo", "request", "response", "response", "response"]
        assert recs[2]["warc-target-uri"] == "https://w.example.test/0"
        assert recs[2]["payload"].endswith(_page(0))


def test_iter_warc_records_member_spans_chunks():
    """A payload larger than the 1 MB decompress chunk exercises the
    unconsumed_tail path; member boundaries at odd offsets exercise
    unused_data re-feeding."""
    from defuddle_spark.spark.warc import iter_warc_records
    big = _page(7, words="x" * 3_000_000)
    members = [
        _warc_record("https://w.example.test/big", _http_payload(big),
                     rec_id=b"<urn:uuid:big>"),
        _warc_record("https://w.example.test/after", _http_payload(_page(8)),
                     rec_id=b"<urn:uuid:after>"),
    ]
    recs = list(iter_warc_records(b"".join(gzip.compress(m)
                                           for m in members)))
    assert len(recs) == 2
    assert recs[0]["payload"].endswith(big)
    assert recs[1]["warc-target-uri"] == "https://w.example.test/after"


def test_iter_warc_records_truncated_tail():
    """A truncated final record ends iteration; prior records survive."""
    from defuddle_spark.spark.warc import iter_warc_records
    good = _warc_record("https://w.example.test/0", _http_payload(_page(0)))
    bad = _warc_record("https://w.example.test/1",
                       _http_payload(_page(1)))[:-40]
    recs = list(iter_warc_records(good + bad))
    assert [r["warc-target-uri"] for r in recs] == \
        ["https://w.example.test/0"]


def test_decode_http_payload_transport_artifacts():
    from defuddle_spark.spark.warc import _decode_http_payload
    body = _page(3)
    for kw in ({}, {"chunked": True}, {"content_gzip": True}):
        status, ctype, got = _decode_http_payload(_http_payload(body, **kw))
        assert status == 200
        assert ctype == "text/html; charset=utf-8"
        assert got == body, kw


def test_iter_warc_records_corrupt_gzip_ends_not_raises():
    """A flipped byte mid-archive or trailing non-gzip garbage must
    never crash the task — and since round 7's replay pass, a flip that
    lands in a member's CRC TRAILER (deflate data intact) recovers the
    record byte-exact instead of dropping it."""
    from defuddle_spark.spark.warc import iter_warc_records
    good = gzip.compress(
        _warc_record("https://w.example.test/0", _http_payload(_page(0))))
    # trailing garbage after the last member
    recs = list(iter_warc_records(good + b"\x00garbage-not-gzip\xff" * 4))
    assert [r["warc-target-uri"] for r in recs] == \
        ["https://w.example.test/0"]
    # second member's CRC byte flipped: deflate stream is intact, so the
    # replay recovers the record with byte-identical payload (distinct
    # record id — duplicate-id suppression is live once a stream resyncs)
    bad = bytearray(gzip.compress(
        _warc_record("https://w.example.test/1", _http_payload(_page(1)),
                     rec_id=b"<urn:uuid:r1-second>")))
    bad[-5] ^= 0xFF
    stats = {}
    recs = list(iter_warc_records(good + bytes(bad), stats=stats))
    assert [r["warc-target-uri"] for r in recs] == \
        ["https://w.example.test/0", "https://w.example.test/1"]
    assert recs[1]["payload"].endswith(_page(1))
    assert stats["resyncs"] == 1  # the corruption is still surfaced


def test_iter_warc_records_resyncs_past_corrupt_member():
    """One corrupt gzip member mid-archive loses only ITS record: the
    stream resyncs at the next member magic (member-per-record means
    that is a record boundary) and every other record survives — at
    crawl scale the old ends-the-stream behavior silently dropped the
    rest of a ~1 GB file. The loss is counted, never silent."""
    from defuddle_spark.spark.warc import iter_warc_records
    members = [gzip.compress(_warc_record(
        f"https://r.example.test/{i}", _http_payload(_page(i)),
        rec_id=f"<urn:uuid:{i}>".encode())) for i in range(200)]
    bad = bytearray(members[100])
    bad[len(bad) // 2] ^= 0xFF  # flip a bit mid-deflate
    raw = b"".join(members[:100]) + bytes(bad) + b"".join(members[101:])
    stats = {}
    recs = list(iter_warc_records(raw, stats=stats))
    urls = {r["warc-target-uri"] for r in recs}
    assert len(recs) == 199
    assert stats["resyncs"] >= 1
    assert urls == {f"https://r.example.test/{i}"
                    for i in range(200) if i != 100}
    # two corrupt members in a row: still only those two lost
    bad2 = bytearray(members[101])
    bad2[len(bad2) // 2] ^= 0xFF
    raw2 = (b"".join(members[:100]) + bytes(bad) + bytes(bad2)
            + b"".join(members[102:]))
    recs2 = list(iter_warc_records(raw2))
    assert len(recs2) == 198
    # a clean archive reports zero resyncs
    clean_stats = {}
    assert len(list(iter_warc_records(b"".join(members),
                                      stats=clean_stats))) == 200
    assert clean_stats["resyncs"] == 0


def _noisy_page(i: int, n: int = 40) -> bytes:
    """Deterministic low-compressibility page (md5-hex words): realistic
    gzip ratios, so corruption tests exercise multi-slice replay instead
    of a whole archive collapsing into one compressed KB."""
    import hashlib
    words = " ".join(hashlib.md5(f"{i}:{j}".encode()).hexdigest()
                     for j in range(n))
    return (f"<html><body><p>{words}</p></body></html>").encode()


def test_iter_warc_records_single_member_replay_recovery():
    """A SINGLE-member gzip archive (every record in one stream) with a
    mid-file corruption must keep its clean prefix: zlib.error discards
    the failing decompress call's entire output, so without the replay
    pass everything before the corruption silently vanished too."""
    from defuddle_spark.spark.warc import iter_warc_records
    members = [_warc_record(f"https://sm.example.test/{i}",
                            _http_payload(_noisy_page(i)),
                            rec_id=f"<urn:uuid:{i}>".encode())
               for i in range(40)]
    single = gzip.compress(b"".join(members))
    bad = bytearray(single)
    bad[len(bad) // 2] ^= 0xFF
    stats = {}
    recs = list(iter_warc_records(bytes(bad), stats=stats))
    assert stats["resyncs"] == 1
    assert len(recs) >= 15  # the clean prefix survives
    for i, r in enumerate(recs[:15]):  # and is byte-intact, in order
        assert r["warc-target-uri"] == f"https://sm.example.test/{i}"
        assert r["payload"].endswith(_noisy_page(i))
    # the untouched archive still parses completely
    assert len(list(iter_warc_records(single))) == 40


def test_block_digest_verification_drops_garbled_records():
    """Corruption that flips a literal WITHOUT breaking the deflate
    structure yields a parseable-but-wrong record (only the member CRC
    catches it, after delivery). WARC-Block-Digest is the per-record
    integrity layer: under the default "auto" mode a resynced stream
    verifies every record it yields and drops the garbled one."""
    from defuddle_spark.spark.warc import (block_digest,
                                           build_warc_record,
                                           iter_warc_records)

    # stamp digests the way write_warc does
    with_dig = [build_warc_record(
        _http_payload(_noisy_page(i)), url=f"https://dg.example.test/{i}",
        record_id=f"<urn:uuid:{i}>", with_digest=True) for i in range(40)]
    single = gzip.compress(b"".join(with_dig))
    bad = bytearray(single)
    bad[len(bad) // 2] ^= 0xFF
    stats = {}
    recs = list(iter_warc_records(bytes(bad), stats=stats))
    assert stats["resyncs"] == 1
    # the verification contract: every surviving record that still
    # CARRIES a digest header is byte-correct (a flip can garble the
    # header block itself away, leaving an unverifiable record — those
    # are detectable downstream by their junk url/content, but a
    # payload-garbled record with an intact digest NEVER survives)
    for r in recs:
        if "warc-block-digest" in r:
            i = int(r["warc-target-uri"].rsplit("/", 1)[1])
            assert r["payload"].endswith(_noisy_page(i))
    assert len(recs) + stats["digest_failures"] <= 40
    # a clean archive: digests never checked under auto (zero cost)
    clean_stats = {}
    assert len(list(iter_warc_records(single, stats=clean_stats))) == 40
    assert clean_stats["digest_failures"] == 0

    # verify_digests=True checks even without corruption: tamper with
    # one record's payload byte but keep framing + digest header
    rec = with_dig[7]
    t = bytearray(rec)
    t[rec.find(b"\r\n\r\n") + 200] ^= 0xFF  # flip inside the payload
    tampered = b"".join(with_dig[:7]) + bytes(t) + b"".join(with_dig[8:])
    s2 = {}
    kept = list(iter_warc_records(tampered, stats=s2,
                                  verify_digests=True))
    assert s2["digest_failures"] == 1
    assert len(kept) == 39
    assert all(r["warc-target-uri"] != "https://dg.example.test/7"
               for r in kept)
    # digest helper emits the Common Crawl convention
    assert block_digest(b"x").startswith("sha1:")


def test_plain_archive_with_leading_blank_lines_and_gzip_payload():
    """A valid PLAIN archive prefixed by many blank lines (which the
    header parser tolerates) whose record carries a gzip
    Content-Encoding body must parse normally — the archive sniff must
    match the parser's real blank-line tolerance, not a fixed peek
    window, or the file gets reinterpreted as gzip from inside the
    payload (review r7: 0 records, resyncs=2 on a valid file)."""
    from defuddle_spark.spark.warc import iter_warc_records
    raw = (b"\r\n" * 6
           + _warc_record("https://p.example.test/0",
                          _http_payload(_page(0), content_gzip=True),
                          rec_id=b"<urn:uuid:p0>")
           + _warc_record("https://p.example.test/1",
                          _http_payload(_page(1)),
                          rec_id=b"<urn:uuid:p1>"))
    stats = {}
    recs = list(iter_warc_records(raw, stats=stats))
    assert [r["warc-target-uri"] for r in recs] == \
        ["https://p.example.test/0", "https://p.example.test/1"]
    assert stats["resyncs"] == 0


def test_readline_limit_consistent_across_compression():
    """An overlong header line must parse IDENTICALLY from plain and
    gzip archives: gzip decodes ~1 MB chunks, so the newline used to be
    buffered before the limit check triggered and the same record gave
    a longer url than its plain-archive twin (ADVICE r6)."""
    from defuddle_spark.spark.warc import iter_warc_records
    huge_url = "https://w.example.test/q?" + "a" * 70_000  # > 64 KB line
    rec = _warc_record(huge_url, _http_payload(_page(6)),
                       rec_id=b"<urn:uuid:huge>")
    after = _warc_record("https://w.example.test/after",
                         _http_payload(_page(7)), rec_id=b"<urn:uuid:af>")
    plain = list(iter_warc_records(rec + after))
    gz = list(iter_warc_records(gzip.compress(rec) + gzip.compress(after)))
    assert [r["warc-target-uri"] for r in plain] == \
        [r["warc-target-uri"] for r in gz]
    assert plain[0]["payload"] == gz[0]["payload"]
    assert plain[1]["warc-target-uri"] == "https://w.example.test/after"


def test_iter_warc_records_negative_content_length():
    """Content-Length: -1 must stop iteration, not slice the buffer
    from the end and swallow the following record."""
    from defuddle_spark.spark.warc import iter_warc_records
    evil = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://w.example.test/evil\r\n"
            b"Content-Length: -1\r\n\r\n")
    after = _warc_record("https://w.example.test/after",
                         _http_payload(_page(9)))
    recs = list(iter_warc_records(evil + after))
    assert recs == []
    # and a valid record BEFORE the malformed one still survives
    before = _warc_record("https://w.example.test/before",
                          _http_payload(_page(8)))
    recs = list(iter_warc_records(before + evil + after))
    assert [r["warc-target-uri"] for r in recs] == \
        ["https://w.example.test/before"]


def test_iter_warc_records_negative_length_takes_pending_resync():
    """A corrupt member whose recovered prefix parses as a NEGATIVE
    Content-Length must take the pending resync boundary like every
    sibling malformed-header branch (ADVICE r7): the rest of the
    archive survives. Without a pending boundary (plain malformed
    archive, pinned above) a negative length still ends iteration."""
    from defuddle_spark.spark.warc import iter_warc_records
    good0 = gzip.compress(_warc_record("https://w.example.test/g0",
                                       _http_payload(_page(0))))
    pad = _noisy_page(7, 400)
    evil_plain = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                  b"WARC-Target-URI: https://w.example.test/evil\r\n"
                  b"Content-Length: -7\r\n\r\n" + pad)
    evil = bytearray(gzip.compress(evil_plain))
    # corrupt mid-deflate, well past the header block's compressed
    # bytes: the replay recovers the header cleanly, then zlib errors
    evil[len(evil) // 2] ^= 0xFF
    good1 = gzip.compress(_warc_record("https://w.example.test/g1",
                                       _http_payload(_page(1)),
                                       rec_id=b"<urn:uuid:neg-g1>"))
    stats = {}
    recs = list(iter_warc_records(good0 + bytes(evil) + good1,
                                  stats=stats))
    assert [r["warc-target-uri"] for r in recs] == \
        ["https://w.example.test/g0", "https://w.example.test/g1"]
    assert stats["resyncs"] >= 1


def test_decode_http_payload_multimember_gzip_body():
    """Multi-member gzip Content-Encoding bodies decode fully — a
    one-shot zlib.decompress stops silently after member one."""
    from defuddle_spark.spark.warc import _decode_http_payload
    part1, part2 = _page(4), b"<!-- tail member -->"
    body = gzip.compress(part1) + gzip.compress(part2)
    payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
               b"Content-Encoding: gzip\r\n"
               b"Content-Length: " + str(len(body)).encode()
               + b"\r\n\r\n" + body)
    status, _, got = _decode_http_payload(payload)
    assert status == 200
    assert got == part1 + part2


def test_decode_http_payload_deflate_variants():
    """Content-Encoding: deflate — zlib-wrapped (incl. window sizes
    below 32K whose CMF byte is not 0x78) and raw-deflate both decode."""
    import zlib

    from defuddle_spark.spark.warc import _decode_http_payload
    body = _page(5)
    small = zlib.compressobj(wbits=9)
    variants = [
        zlib.compress(body),                             # 0x78 CMF
        small.compress(body) + small.flush(),            # 0x18 CMF
        zlib.compress(body)[2:-4],                       # raw deflate
    ]
    for enc_body in variants:
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                   b"Content-Encoding: deflate\r\n"
                   b"Content-Length: " + str(len(enc_body)).encode()
                   + b"\r\n\r\n" + enc_body)
        status, _, got = _decode_http_payload(payload)
        assert status == 200
        assert got == body, enc_body[:2].hex()


def test_iter_warc_records_overlong_header_line():
    """A >64 KB header value is truncated but framing survives: the
    line is consumed through its real newline, the record's payload is
    intact, and the next record still parses."""
    from defuddle_spark.spark.warc import iter_warc_records
    huge_url = "https://w.example.test/q?" + "a" * (200_000)
    rec = _warc_record(huge_url, _http_payload(_page(6)),
                       rec_id=b"<urn:uuid:huge>")
    after = _warc_record("https://w.example.test/after",
                         _http_payload(_page(7)),
                         rec_id=b"<urn:uuid:after>")
    recs = list(iter_warc_records(rec + after))
    assert len(recs) == 2
    assert recs[0]["warc-target-uri"].startswith(
        "https://w.example.test/q?aaa")
    assert recs[0]["payload"].endswith(_page(6))
    assert recs[1]["warc-target-uri"] == "https://w.example.test/after"


def test_read_warc_stream_incremental(spark, tmp_path):
    """Streaming ingestion of a landing directory: an availableNow run
    drains the backlog; after a new archive lands, a resumed run (same
    checkpoint) ingests ONLY the new file — no re-parse, no dupes."""
    from pyspark.sql import functions as F

    from defuddle_spark.spark.warc import read_warc_stream

    inp = tmp_path / "landing"
    inp.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (inp / "a.warc.gz").write_bytes(b"".join(
        gzip.compress(_warc_record(f"https://s.example.test/{i}",
                                   _http_payload(_page(i)),
                                   rec_id=f"<urn:uuid:{i}>".encode()))
        for i in (0, 1)))

    def drain():
        q = (read_warc_stream(spark, str(inp))
             .select("url", "html", "http_status")
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    got = {r["url"] for r in spark.read.parquet(out).collect()}
    assert got == {"https://s.example.test/0", "https://s.example.test/1"}

    (inp / "b.warc.gz").write_bytes(gzip.compress(
        _warc_record("https://s.example.test/2", _http_payload(_page(2)),
                     rec_id=b"<urn:uuid:2>")))
    drain()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3  # no duplicate ingestion of a.warc.gz
    assert {r["url"] for r in rows} == {
        f"https://s.example.test/{i}" for i in (0, 1, 2)}
    assert all(r["http_status"] == 200
               and bytes(r["html"]).startswith(b"<!DOCTYPE") for r in rows)


def test_read_warc_resync_accumulator(spark, tmp_path):
    """The corrupt-member count is measurable from the driver: pass a
    Spark accumulator and it totals skipped members across all files —
    a crawl operator's data-loss metric, not just an executor log."""
    d = tmp_path / "acc"
    d.mkdir()
    good = [gzip.compress(_warc_record(
        f"https://a.example.test/{i}", _http_payload(_page(i)),
        rec_id=f"<urn:uuid:{i}>".encode())) for i in range(6)]
    (d / "clean.warc.gz").write_bytes(b"".join(good[:3]))
    poisoned = bytearray(good[4])
    poisoned[len(poisoned) // 2] ^= 0xFF
    (d / "poisoned.warc.gz").write_bytes(
        good[3] + bytes(poisoned) + good[5])

    from defuddle_spark.spark.warc import read_warc
    acc = spark.sparkContext.accumulator(0)
    rows = read_warc(spark, str(d), resync_acc=acc).collect()
    assert {r["url"] for r in rows} == {
        f"https://a.example.test/{i}" for i in range(6) if i != 4}
    assert acc.value >= 1


def test_read_warc_stream_poisoned_archive(spark, tmp_path):
    """A corrupt archive in the landing directory must not kill the
    streaming query: the stream drains every good file completely and
    salvages the poisoned file's intact records (verdict r6 #5)."""
    from defuddle_spark.spark.warc import read_warc_stream

    inp = tmp_path / "landing"
    inp.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def member(i):
        return gzip.compress(_warc_record(
            f"https://p.example.test/{i}", _http_payload(_page(i)),
            rec_id=f"<urn:uuid:{i}>".encode()))

    (inp / "a.warc.gz").write_bytes(member(0) + member(1))
    poisoned = bytearray(member(3))
    poisoned[len(poisoned) // 2] ^= 0xFF
    (inp / "b.warc.gz").write_bytes(
        member(2) + bytes(poisoned) + member(4))
    (inp / "c.warc.gz").write_bytes(member(5))

    q = (read_warc_stream(spark, str(inp), max_files_per_trigger=1)
         .select("url", "http_status")
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r["url"] for r in spark.read.parquet(out).collect()}
    assert got == {f"https://p.example.test/{i}"
                   for i in (0, 1, 2, 4, 5)}  # only the corrupt member lost


def test_write_warc_refuses_object_store_paths(spark, tmp_path):
    """write_warc writes with executor-local open(): an object-store
    out_dir must be refused EAGERLY (driver-side, before any job) with
    the deployment recipe — the old failure was a late executor error,
    and the stale-archive glob guard silently saw nothing there."""
    from pyspark.sql import Row

    from defuddle_spark.spark.warc import read_warc, write_warc

    pages = spark.createDataFrame(
        [Row(url="https://s.example.test/0", html=_page(0))])
    for uri in ("s3a://bucket/crawl/out", "hdfs://nn:8020/crawl/out",
                "gs://bucket/out"):
        with pytest.raises(ValueError, match="posix"):
            write_warc(pages, uri)  # raises before any action
    # a file:// host that isn't this machine is refused too
    with pytest.raises(ValueError, match="host"):
        write_warc(pages, "file://nas.internal/exports/out")
    # file: URIs are posix paths in disguise — every spelling resolves
    # to the URI's PATH (a fixed-prefix strip mangled 'file:/x')
    for i, uri in enumerate(["file://{}", "file:{}", "file://localhost{}"]):
        out = str(tmp_path / f"fileuri{i}")
        write_warc(pages, uri.format(out)).collect()
        assert read_warc(spark, out).count() == 1, uri
    # a relative path whose first segment contains a colon is a PATH,
    # not a scheme — the eager guard must not refuse it (guard fires at
    # call time; not collected, since executor cwd is not the test's)
    write_warc(pages, "out:2026/emitted")  # no ValueError


def test_write_warc_roundtrip(spark, tmp_path):
    """write_warc → read_warc is lossless for (url, warc_ts, html,
    http_status); manifest rows account for every record; the
    records_per_file split produces multiple archives per partition."""
    import datetime

    from pyspark.sql import Row, functions as F

    from defuddle_spark.spark.warc import read_warc, write_warc

    ts = datetime.datetime(2024, 5, 6, 7, 8, 9)
    pages = spark.createDataFrame([
        Row(url=f"https://rt.example.test/{i}", warc_ts=ts,
            html=_page(i), http_status=200 + (i % 2))
        for i in range(10)
    ]).repartition(2)
    out = str(tmp_path / "emitted")
    manifest = write_warc(pages, out, records_per_file=3).collect()
    assert sum(m["records"] for m in manifest) == 10
    assert len(manifest) >= 4  # 2 partitions x ceil(5/3)
    back = {r["url"]: r for r in read_warc(spark, out).collect()}
    assert sorted(back) == sorted(f"https://rt.example.test/{i}"
                                  for i in range(10))
    for i in range(10):
        r = back[f"https://rt.example.test/{i}"]
        assert bytes(r["html"]) == _page(i)
        assert r["http_status"] == 200 + (i % 2)
        assert r["warc_ts"].isoformat() == "2024-05-06T07:08:09"

    # no stale temp files survive a successful run
    import os
    assert not [f for f in os.listdir(out) if f.startswith(".")]

    # a second write into the same dir is refused without overwrite=True
    with pytest.raises(ValueError, match="overwrite=True"):
        write_warc(pages, out).collect()
    write_warc(pages, out, records_per_file=3, overwrite=True).collect()
    assert read_warc(spark, out).count() == 10

    # plain (non-gzip) archives round-trip too
    out2 = str(tmp_path / "emitted_plain")
    write_warc(pages.select("url", "html"), out2,
               gzip_members=False).collect()
    back2 = read_warc(spark, out2)
    assert back2.count() == 10
    # no ts/status columns in the input -> epoch date + 200 default
    one = back2.filter(F.col("url") == "https://rt.example.test/3").first()
    assert one["http_status"] == 200
    assert one["warc_ts"].isoformat() == "1970-01-01T00:00:00"


def test_write_warc_hostile_inputs(spark, tmp_path):
    """CRLF in a url cannot break archive framing; repeated captures of
    one url get distinct record ids; sub-second warc_ts truncates to
    WARC/1.0's second precision (documented, pinned here)."""
    import datetime

    from pyspark.sql import Row

    from defuddle_spark.spark.warc import read_warc, write_warc

    evil = "https://e.test/a\r\n\r\nWARC-Type: injected"
    rows = [
        Row(url=evil, warc_ts=None, html=_page(0)),
        Row(url="https://e.test/snap", warc_ts=datetime.datetime(
            2024, 5, 6, 7, 8, 9, 123456), html=_page(1)),
        Row(url="https://e.test/snap", warc_ts=datetime.datetime(
            2024, 5, 7, 7, 8, 9), html=_page(2)),
    ]
    out = str(tmp_path / "hostile")
    write_warc(spark.createDataFrame(rows).coalesce(1), out).collect()
    back = read_warc(spark, out).collect()
    assert len(back) == 3  # framing survived the CRLF url
    by_url = {}
    for r in back:
        by_url.setdefault(r["url"], []).append(r)
    assert sorted(by_url) == [
        "https://e.test/a%0D%0A%0D%0AWARC-Type: injected",
        "https://e.test/snap"]
    snaps = by_url["https://e.test/snap"]
    assert snaps[0]["record_id"] != snaps[1]["record_id"]
    assert {r["warc_ts"].isoformat() for r in snaps} == {
        "2024-05-06T07:08:09", "2024-05-07T07:08:09"}  # truncated


def test_write_warc_session_timezone(spark, tmp_path):
    """WARC-Date on disk must be the true UTC instant even when the
    session timezone is not UTC (naive pandas timestamps are
    session-local wall time); read_warc reverses it exactly."""
    import datetime
    import glob
    import gzip as _gz

    from pyspark.sql import Row

    from defuddle_spark.spark.warc import read_warc, write_warc

    key = "spark.sql.session.timeZone"
    old = spark.conf.get(key)
    spark.conf.set(key, "America/New_York")
    try:
        # createDataFrame on this UTC box stores the instant 12:00Z;
        # mapInPandas exports it as NY wall 07:00 — a tz-naive writer
        # would stamp 07:00Z on disk (5h early), and a tz-naive reader
        # would collect 17:00. Both must read 12:00.
        instant = datetime.datetime(2024, 1, 15, 12, 0, 0)
        out = str(tmp_path / "tz")
        write_warc(spark.createDataFrame(
            [Row(url="https://tz.test/1", warc_ts=instant,
                 html=_page(1))]), out).collect()
        raw = _gz.decompress(open(glob.glob(out + "/part-*")[0],
                                  "rb").read())
        assert b"WARC-Date: 2024-01-15T12:00:00Z" in raw
        got = read_warc(spark, out).first()
        assert got["warc_ts"] == instant
    finally:
        spark.conf.set(key, old)


def test_read_warc_spark(spark, tmp_path):
    from pyspark.sql import functions as F

    from defuddle_spark.spark.pipeline import extract_pages
    from defuddle_spark.spark.warc import read_warc

    d = tmp_path / "warcs"
    d.mkdir()
    members = _archive_members()
    (d / "a.warc.gz").write_bytes(
        b"".join(gzip.compress(m) for m in members))
    (d / "b.warc").write_bytes(  # plain archive, different pages
        _warc_record("https://w.example.test/10", _http_payload(_page(10)))
        + _warc_record("https://w.example.test/11",
                       _http_payload(_page(11))))

    df = read_warc(spark, str(d))
    rows = {r["url"]: r for r in df.collect()}
    # responses only (warcinfo/request filtered), both files
    assert sorted(rows) == [f"https://w.example.test/{i}"
                            for i in (0, 1, 10, 11, 2)]
    r0 = rows["https://w.example.test/0"]
    assert bytes(r0["html"]) == _page(0)
    assert r0["http_status"] == 200
    assert r0["warc_type"] == "response"
    assert r0["warc_ts"].isoformat() == "2024-03-01T12:00:00"
    assert r0["warc_path"].endswith("a.warc.gz")

    # unfiltered read surfaces every record type
    all_types = {r["warc_type"] for r in
                 read_warc(spark, str(d), warc_types=()).collect()}
    assert all_types == {"warcinfo", "request", "response"}

    # end-to-end: the archive feeds the extraction kernel directly
    out = extract_pages(df.select("url", "html"), with_routing_column=False)
    got = {r["url"]: r for r in out.collect()}
    assert got["https://w.example.test/2"]["title"] == "W2"
    assert "warc page body text 2" in got["https://w.example.test/2"][
        "extracted_text"]
    assert all(r["error"] is None for r in got.values())


def test_read_warc_stream_feeds_extraction_pipeline(spark, tmp_path):
    """End-to-end streaming glue: WARC archives landing in a directory →
    read_warc_stream → extract_pages → parquet sink, one availableNow
    drain. The extraction output must match the batch pipeline on the
    same pages byte-for-byte (title/content), proving the archive
    stream really is a drop-in pages source for the streaming kernel."""
    from pyspark.sql import Row

    from defuddle_spark.spark.pipeline import extract_pages
    from defuddle_spark.spark.warc import read_warc_stream

    def page(i):
        return _page(i, words="stream body text number")

    inp = tmp_path / "landing"
    inp.mkdir()
    (inp / "a.warc.gz").write_bytes(b"".join(
        gzip.compress(_warc_record(f"https://st.example.test/{i}",
                                   _http_payload(page(i)),
                                   rec_id=f"<urn:uuid:{i}>".encode()))
        for i in range(6)))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    stream = read_warc_stream(spark, str(inp)).select("url", "html")
    q = (extract_pages(stream, with_routing_column=False)
         .select("url", "title", "content", "word_count", "error")
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = {r["url"]: r for r in spark.read.parquet(out).collect()}
    batch_pages = spark.createDataFrame(
        [Row(url=f"https://st.example.test/{i}", html=page(i))
         for i in range(6)])
    want = {r["url"]: r for r in extract_pages(
        batch_pages, with_routing_column=False)
        .select("url", "title", "content", "word_count", "error")
        .collect()}
    assert sorted(got) == sorted(want)
    for url, w in want.items():
        g = got[url]
        assert (g["title"], g["content"], g["word_count"]) == \
            (w["title"], w["content"], w["word_count"])
        assert g["error"] is None
