"""Shard-file sources (sources/shards.py): WebDataset tar shards and
compressed JSONL — the formats a real training corpus ships in."""

import gzip
import io
import json
import os
import tarfile

import numpy as np
import pytest

from vastdb_sdk_spark.sources.shards import (
    ShardFormatError,
    _split_member,
    group_samples,
    read_jsonl_shards,
    read_webdataset,
    write_webdataset_shards,
)


def test_split_member_webdataset_layout():
    assert _split_member("000123.jpg") == ("000123", "jpg")
    # key is everything to the FIRST dot of the basename
    assert _split_member("a/b/0001.seg.json") == ("a/b/0001", "seg.json")
    assert _split_member("dir/noext") == ("dir/noext", "")


def _make_shard(samples: dict[str, dict[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for key, members in samples.items():
            for ext, data in members.items():
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_read_webdataset_members_and_samples(spark, tmp_path):
    shard_a = _make_shard(
        {
            "000000": {"txt": b"hello", "cls": b"3"},
            "000001": {"txt": b"world", "cls": b"7"},
        }
    )
    shard_b = _make_shard({"000002": {"txt": b"third"}})
    (tmp_path / "shard-0.tar").write_bytes(shard_a)
    (tmp_path / "shard-1.tar").write_bytes(shard_b)
    df = read_webdataset(spark, str(tmp_path))
    rows = {(r["key"], r["ext"]): bytes(r["payload"]) for r in df.collect()}
    assert rows[("000000", "txt")] == b"hello"
    assert rows[("000002", "txt")] == b"third"
    assert len(rows) == 5
    # ext filter prunes worker-side
    only_txt = read_webdataset(spark, str(tmp_path), exts=["txt"])
    assert only_txt.count() == 3
    # sample assembly: one row per key, one column per ext
    samples = group_samples(df, ["txt", "cls"]).collect()
    by_key = {r["key"]: r for r in samples}
    assert len(by_key) == 3
    assert bytes(by_key["000000"]["cls"]) == b"3"
    assert by_key["000002"]["cls"] is None


def test_webdataset_write_read_round_trip(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = spark.createDataFrame(
        [(f"{i:06d}", bytearray(f"doc {i}".encode()), bytearray([i]))
         for i in range(20)],
        "key string, txt binary, cls binary",
    )
    n = write_webdataset_shards(df, out, n_shards=4)
    assert n == 4
    names = sorted(os.listdir(out))
    assert names == [f"shard-{i:05d}.tar" for i in range(4)]
    back = read_webdataset(spark, out)
    samples = group_samples(back, ["txt", "cls"]).collect()
    assert len(samples) == 20
    for r in samples:
        i = int(r["key"])
        assert bytes(r["txt"]) == f"doc {i}".encode()
        assert bytes(r["cls"]) == bytes([i])


def test_webdataset_multimodal_composition(spark, tmp_path):
    """The pipeline the source exists for: tar shards of (jpg, txt)
    samples -> member rows -> image_stats over the jpg payloads."""
    from vastdb_sdk_spark.operators.jpegcodec import encode_jpeg
    from vastdb_sdk_spark.operators.multimodal import image_stats

    samples = {}
    for i in range(6):
        v = 2 * ((i * 31 + np.arange(4) * 17) % 128)
        yy, xx = np.mgrid[0:16, 0:16]
        img = v[(yy // 8) * 2 + (xx // 8)].astype(np.uint8)
        samples[f"{i:06d}"] = {
            "jpg": encode_jpeg(img, quality=50),
            "txt": f"caption {i}".encode(),
        }
    (tmp_path / "shard-0.tar").write_bytes(_make_shard(samples))
    members = read_webdataset(spark, str(tmp_path), exts=["jpg"])
    from pyspark.sql import functions as F

    media = members.select(
        F.col("key").cast("long").alias("media_id"), "payload"
    )
    got = {r["media_id"]: r for r in image_stats(media).collect()}
    assert len(got) == 6
    for i in range(6):
        v = 2 * ((i * 31 + np.arange(4) * 17) % 128)
        yy, xx = np.mgrid[0:16, 0:16]
        img = v[(yy // 8) * 2 + (xx // 8)].astype(np.int64)
        flat = np.repeat(img.reshape(-1), 3)
        assert got[i]["px_sum"] == int(flat.sum())
        assert got[i]["px_wsum"] == int((flat * np.arange(flat.size)).sum())


def test_read_webdataset_bad_shard_is_loud(spark, tmp_path):
    (tmp_path / "shard-0.tar").write_bytes(b"this is not a tar file" * 40)
    with pytest.raises(Exception, match="bad tar shard"):
        read_webdataset(spark, str(tmp_path)).collect()


@pytest.mark.parametrize("codec,suffix", [("gzip", "gz"), ("zstd", "zst"), ("lz4", "lz4")])
def test_read_jsonl_shards_codecs(spark, tmp_path, codec, suffix):
    lines = [
        json.dumps({"doc_id": i, "text": f"line {i}", "score": i / 10})
        for i in range(50)
    ]
    raw = ("\n".join(lines) + "\n").encode()
    if codec == "gzip":
        blob = gzip.compress(raw)
    else:
        import pyarrow as pa

        buf = pa.BufferOutputStream()
        with pa.CompressedOutputStream(buf, codec) as s:
            s.write(raw)
        blob = buf.getvalue().to_pybytes()
    (tmp_path / f"part-0.jsonl.{suffix}").write_bytes(blob)
    df = read_jsonl_shards(
        spark, str(tmp_path), "doc_id long, text string, score double"
    )
    rows = sorted(df.collect(), key=lambda r: r["doc_id"])
    assert len(rows) == 50
    assert rows[7]["text"] == "line 7" and rows[7]["score"] == 0.7


def test_read_jsonl_shards_plain_missing_fields_and_errors(spark, tmp_path):
    (tmp_path / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "x"}\n\n{"doc_id": 2}\n'
    )
    df = read_jsonl_shards(spark, str(tmp_path), "doc_id long, text string")
    rows = {r["doc_id"]: r["text"] for r in df.collect()}
    assert rows == {1: "x", 2: None}
    (tmp_path / "bad.jsonl").write_text('{"doc_id": 1}\nnot json\n')
    with pytest.raises(Exception, match="bad JSON at .*bad.jsonl:2"):
        read_jsonl_shards(
            spark, str(tmp_path), "doc_id long", pattern="bad.jsonl"
        ).collect()
    (tmp_path / "trunc.jsonl.gz").write_bytes(b"\x1f\x8b\x08\x00junk")
    with pytest.raises(Exception, match="bad gzip shard"):
        read_jsonl_shards(
            spark, str(tmp_path), "doc_id long", pattern="*.gz"
        ).collect()


def test_stream_webdataset_incremental(spark, tmp_path):
    """Streaming twin: an availableNow pass drains the landing dir; a
    shard dropped later is picked up by the next pass with checkpointed
    progress (no reprocessing of the first shard)."""
    from vastdb_sdk_spark.sources.shards import stream_webdataset

    land = tmp_path / "landing"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (land / "shard-0.tar").write_bytes(
        _make_shard({"000000": {"txt": b"first"}})
    )

    out = str(tmp_path / "out")

    def drain():
        q = (
            stream_webdataset(spark, str(land), max_files_per_trigger=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r["key"], bytes(r["payload"]))
            for r in spark.read.parquet(out).collect()
        )

    first = drain()
    assert first == [("000000", b"first")]
    (land / "shard-1.tar").write_bytes(
        _make_shard({"000001": {"txt": b"second"}})
    )
    second = drain()
    # the checkpoint guarantees shard-0 was NOT re-extracted: exactly
    # one row per sample after two passes
    assert second == [("000000", b"first"), ("000001", b"second")]
