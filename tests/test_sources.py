"""Custom Python data sources: WARC reader + synthetic generator."""

import os

import pytest


def _write_warc(path, records):
    with open(path, "wb") as f:
        for rid, rtype, uri, ctype, payload in records:
            hdr = (
                f"WARC/1.0\r\n"
                f"WARC-Record-ID: {rid}\r\n"
                f"WARC-Type: {rtype}\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode()
            f.write(hdr + payload + b"\r\n\r\n")


@pytest.fixture(scope="module")
def registered(spark):
    from warp_pipes_spark.sources import register_sources

    register_sources(spark)
    return spark


def test_warc_reader_parses_records(registered, tmp_path):
    _write_warc(
        tmp_path / "a.warc",
        [
            ("<urn:uuid:1>", "response", "http://x.test/1", "text/html", b"<html>one</html>"),
            ("<urn:uuid:2>", "response", "http://x.test/2", "text/plain", b"two"),
        ],
    )
    _write_warc(
        tmp_path / "b.warc",
        [("<urn:uuid:3>", "request", "http://x.test/3", "text/plain", b"three33")],
    )
    df = registered.read.format("warc").load(str(tmp_path))
    rows = {r["record_id"]: r for r in df.collect()}
    assert len(rows) == 3
    assert rows["<urn:uuid:1>"]["payload"] == bytearray(b"<html>one</html>")
    assert rows["<urn:uuid:2>"]["content_length"] == 3
    assert rows["<urn:uuid:3>"]["warc_type"] == "request"
    # one partition per file
    assert df.rdd.getNumPartitions() == 2


def test_warc_reader_gzip(registered, tmp_path):
    import gzip

    raw = tmp_path / "c.warc"
    _write_warc(raw, [("<urn:uuid:9>", "response", "u", "text/plain", b"gz payload")])
    gz = tmp_path / "c.warc.gz"
    gz.write_bytes(gzip.compress(raw.read_bytes()))
    os.remove(raw)
    df = registered.read.format("warc").load(str(tmp_path))
    assert df.collect()[0]["payload"] == bytearray(b"gz payload")


def test_synthetic_batch_deterministic_across_parallelism(registered):
    a = registered.read.format("synthetic_docs").option("num_docs", 200) \
        .option("seed", 7).option("num_partitions", 4).load()
    b = registered.read.format("synthetic_docs").option("num_docs", 200) \
        .option("seed", 7).option("num_partitions", 13).load()
    assert a.count() == 200
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = registered.read.format("synthetic_docs").option("num_docs", 200) \
        .option("seed", 8).load()
    assert c.exceptAll(a).count() > 0  # seed changes content


def test_synthetic_stream_micro_batches(registered, tmp_path):
    # Python simple-stream sources don't support Trigger.AvailableNow (Spark
    # falls back to a single batch), so run micro-batches continuously and
    # poll until the bounded source is drained.
    import time

    q = (
        registered.readStream.format("synthetic_docs")
        .option("num_docs", 50).option("batch_size", 20).option("seed", 3)
        .load()
        .writeStream.format("memory").queryName("synth_docs")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if registered.sql("SELECT * FROM synth_docs").count() >= 50:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = registered.sql("SELECT * FROM synth_docs").collect()
    assert len(got) == 50
    # identical to the batch generator output (replayable source)
    batch = registered.read.format("synthetic_docs").option("num_docs", 50) \
        .option("seed", 3).load().collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))


def test_read_jsonl_three_way_split(spark, tmp_path):
    """Every input line lands in exactly one output: good, unparseable
    quarantine (verbatim), or missing-required drift."""
    from warp_pipes_spark.sources.jsonl import read_jsonl

    src = tmp_path / "corpus"
    src.mkdir()
    lines = [
        '{"doc_id": 1, "text": "hello", "lang": "en"}',
        '{"doc_id": 2, "text": "welt", "lang": "de"}',
        '{"doc_id": 3, "lang": "fr"}',            # parses, text missing
        '{"doc_id": 4, "text": "trunca',           # malformed JSON
        'not json at all',                         # malformed
    ]
    (src / "part0.jsonl").write_text("\n".join(lines))

    good, quar = read_jsonl(
        spark, str(src), "doc_id long, text string, lang string",
        required=["text"],
    )
    g = {r["doc_id"]: r for r in good.collect()}
    q = quar.collect()
    assert set(g) == {1, 2}
    assert g[1]["text"] == "hello"
    reasons = sorted(r["reason"] for r in q)
    assert reasons == ["missing_required", "unparseable", "unparseable"]
    raws = {r["raw"] for r in q if r["reason"] == "unparseable"}
    assert raws == {'{"doc_id": 4, "text": "trunca', "not json at all"}
    drift = [r for r in q if r["reason"] == "missing_required"]
    assert drift[0]["doc_id"] == 3 and drift[0]["raw"] is None
    # totality: 5 lines in, 2 + 3 out
    assert good.count() + quar.count() == 5


def test_jsonl_to_parquet_roundtrip(spark, tmp_path):
    from warp_pipes_spark.sources.jsonl import jsonl_to_parquet

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "x"}\n{"bad\n{"doc_id": 2, "text": "y"}'
    )
    n_good, n_quar = jsonl_to_parquet(
        spark, str(src), str(tmp_path / "out"), "doc_id long, text string"
    )
    assert (n_good, n_quar) == (2, 1)
    back = spark.read.parquet(str(tmp_path / "out" / "data"))
    assert sorted(r["doc_id"] for r in back.collect()) == [1, 2]


def test_read_csv_three_way_split(spark, tmp_path):
    """CSV ingestion: header dropped, typed good rows, wrong-arity /
    type-mismatch lines quarantined verbatim, missing-required drift."""
    from warp_pipes_spark.sources.csv import read_csv

    src = tmp_path / "tabular"
    src.mkdir()
    lines = [
        "doc_id,text,score",
        "1,hello,0.5",
        "2,welt,1.25",
        "3,,0.75",                 # parses, text empty -> missing_required
        "4,oops,notanumber",       # type mismatch -> unparseable
        "5,too,many,fields,here",  # wrong arity -> unparseable
    ]
    (src / "part0.csv").write_text("\n".join(lines))

    good, quar = read_csv(
        spark, str(src), "doc_id long, text string, score double",
        required=["text"],
    )
    g = {r["doc_id"]: r for r in good.collect()}
    q = quar.collect()
    assert set(g) == {1, 2}
    assert g[2]["score"] == 1.25
    reasons = sorted(r["reason"] for r in q)
    assert reasons == ["missing_required", "unparseable", "unparseable"]
    raws = {r["raw"] for r in q if r["reason"] == "unparseable"}
    assert raws == {"4,oops,notanumber", "5,too,many,fields,here"}
    drift = [r for r in q if r["reason"] == "missing_required"]
    assert drift[0]["doc_id"] == 3 and drift[0]["raw"] is None
    # totality: 5 data lines in (header excluded), 2 + 3 out
    assert good.count() + quar.count() == 5


def test_csv_to_parquet_and_orc_roundtrip(spark, tmp_path):
    from warp_pipes_spark.sources.csv import csv_to_parquet, read_orc, to_orc

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.csv").write_text("doc_id,text\n1,aa\n2,bb\nbad,line,extra\n")
    n_good, n_quar = csv_to_parquet(
        spark, str(src), str(tmp_path / "out"), "doc_id long, text string"
    )
    assert (n_good, n_quar) == (2, 1)
    df = spark.read.parquet(str(tmp_path / "out" / "data"))

    to_orc(df, str(tmp_path / "orc"))
    back = read_orc(spark, str(tmp_path / "orc"))
    assert sorted((r["doc_id"], r["text"]) for r in back.collect()) == [
        (1, "aa"), (2, "bb"),
    ]
