"""Binary and plain-text corpus sources (sources/readers.py):
roundtrip fidelity, size guards, id stability, and the multimodal
plumbing handoff."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.sources.readers import (
    read_binary_docs,
    read_text_docs,
)

PAYLOADS = {
    "a.png": b"\x89PNG-fake-bytes-aaaa",
    "b.png": b"\x89PNG-fake-bytes-bb",
    "c.txt": b"not a png",
    "big.png": b"\x00" * 4096,
}


def _write_payloads(tmp_path):
    d = tmp_path / "blobs"
    d.mkdir()
    for name, data in PAYLOADS.items():
        (d / name).write_bytes(data)
    return str(d)


def test_binary_docs_roundtrip_and_filters(spark, tmp_path):
    d = _write_payloads(tmp_path)
    df = read_binary_docs(spark, d)
    got = {os.path.basename(r["path"]): bytes(r["content"]) for r in df.collect()}
    assert got == PAYLOADS  # byte-faithful, all files
    # glob + size guard compose; lengths are trustworthy
    pngs = read_binary_docs(spark, d, glob="*.png", max_bytes=100)
    names = {os.path.basename(r["path"]) for r in pngs.collect()}
    assert names == {"a.png", "b.png"}
    rows = {os.path.basename(r["path"]): r["length"] for r in pngs.collect()}
    assert rows == {"a.png": 20, "b.png": 18}
    # ids: stable across reads, unique per path
    ids1 = {r["path"]: r["doc_id"] for r in df.collect()}
    ids2 = {r["path"]: r["doc_id"] for r in read_binary_docs(spark, d).collect()}
    assert ids1 == ids2
    assert len(set(ids1.values())) == len(ids1)


def test_binary_docs_feed_multimodal_plumbing(spark, tmp_path):
    """The handoff: binaryFile output flows straight through the
    multimodal metadata stage."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.multimodal import (
        binary_with_metadata,
    )

    d = _write_payloads(tmp_path)
    df = read_binary_docs(spark, d, glob="*.png")
    meta = binary_with_metadata(df, "content")
    assert meta.count() == 3
    assert "payload_bytes" in meta.columns or len(meta.columns) > len(df.columns)


def test_text_docs_whole_file_and_lines(spark, tmp_path):
    d = tmp_path / "texts"
    d.mkdir()
    (d / "one.txt").write_text("hello world\nsecond line")
    (d / "two.txt").write_text("another document")
    whole = read_text_docs(spark, str(d))
    got = {os.path.basename(r["path"]): r["text"] for r in whole.collect()}
    assert got == {
        "one.txt": "hello world\nsecond line",
        "two.txt": "another document",
    }
    assert whole.select("doc_id").distinct().count() == 2

    lines = read_text_docs(spark, str(d), whole_file=False)
    texts = sorted(r["text"] for r in lines.collect())
    assert texts == ["another document", "hello world", "second line"]
    assert lines.select("doc_id").distinct().count() == 3  # line-salted ids


def test_text_line_ids_split_invariant(spark, tmp_path):
    """Line-mode ids are content-keyed: re-reading under a different
    split/parallelism plan yields the IDENTICAL id set (review-found:
    positional numbering depended on scan-split order). Duplicate
    identical lines keep distinct ids."""
    d = tmp_path / "texts"
    d.mkdir()
    (d / "dump.txt").write_text("\n".join(
        ["alpha", "beta", "alpha", "gamma"] + [f"line{i}" for i in range(50)]
    ))
    a = read_text_docs(spark, str(d), whole_file=False)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
    try:
        b = read_text_docs(spark, str(d), whole_file=False)
        ids_b = sorted(r["doc_id"] for r in b.collect())
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
    assert ids_a == ids_b
    assert len(ids_a) == len(set(ids_a)) == 54


def test_read_binary_corpus_equals_vectorized_read(spark, tmp_path):
    """The wide-binary row-based read path (r12: the vectorized
    reader's per-batch cost measures ~quadratic in batch bytes on
    ~100 KB payloads) is a pure perf knob — identical rows, schema,
    and bytes as the default vectorized scan."""
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.readers import (
        read_binary_corpus,
    )

    rows = [(i, bytes([i % 251]) * (50_000 + i)) for i in range(40)]
    src = spark.createDataFrame(rows, "doc_id long, payload binary")
    path = str(tmp_path / "corpus")
    src.write.parquet(path)
    plain = {
        r["doc_id"]: r["payload"] for r in spark.read.parquet(path).collect()
    }
    rowbased = {
        r["doc_id"]: r["payload"]
        for r in read_binary_corpus(spark, path).collect()
    }
    assert rowbased == plain
    assert read_binary_corpus(spark, path).schema == spark.read.parquet(path).schema
