"""Source/sink helpers: partition pruning and bucketed-join shuffle removal."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.plans import count_shuffles, formatted_plan
from spark_iforest_spark import sources
from spark_iforest_spark.sources import read_table, write_bucketed, write_partitioned


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="sources-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_write_prunes(spark, tmpdir, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    write_partitioned(docs, tmpdir + "/by_lang", ["lang"])
    back = spark.read.parquet(tmpdir + "/by_lang").where(F.col("lang") == "en")
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters", 1)[1][:200]
    assert back.count() == docs.where("lang = 'en'").count()


def test_bucketed_join_skips_shuffle(spark, tmpdir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        write_bucketed(df, "t_bucketed_a", ["k"], 4)
        write_bucketed(df, "t_bucketed_b", ["k"], 4)
        a = spark.table("t_bucketed_a")
        b = spark.table("t_bucketed_b")
        joined = a.join(b, "k")
        # co-located buckets: the join plan needs no Exchange at all
        assert count_shuffles(joined) == 0
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_b")


def test_binary_file_ingestion_end_to_end(spark, tmpdir):
    """read_binary_files -> extract_features on REAL on-disk files: the
    multimodal path exercised from the binaryFile source, not text-as-bytes."""
    import hashlib
    import os

    from spark_iforest_spark.operators import multimodal
    from spark_iforest_spark.sources import read_binary_files

    payloads = {
        0: bytes(range(256)) * 4,
        1: b"\x00" * 100 + b"\xff" * 28,
        2: os.urandom(0) + b"single-chunk-payload",
    }
    media_dir = tmpdir + "/media"
    os.makedirs(media_dir)
    for i, data in payloads.items():
        with open(f"{media_dir}/f{i}.bin", "wb") as fh:
            fh.write(data)

    raw = read_binary_files(spark, media_dir + "/*.bin")
    assert set(raw.columns) >= {"path", "length", "content"}
    media = raw.select(
        F.regexp_extract(F.col("path"), r"f(\d+)\.bin", 1).cast("long").alias("doc_id"),
        F.col("content").alias("payload"),
    )
    out = {r.doc_id: r for r in multimodal.extract_features(media).collect()}
    assert set(out) == set(payloads)
    for i, data in payloads.items():
        assert out[i].n_bytes == len(data)
        assert out[i].content_md5 == hashlib.md5(data).hexdigest()
        assert abs(sum(out[i].features) - 1.0) < 1e-6  # L1-normalized histogram

    # frame sampling over the same binary source: chunk accounting must
    # reconstruct each payload exactly
    frames = multimodal.frame_sample(media, every_n_bytes=64).collect()
    per_doc = {}
    for r in frames:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_bytes
    assert per_doc == {i: len(d) for i, d in payloads.items()}


def test_png_wav_header_decoders_end_to_end(spark, tmpdir):
    """Round-4: the register_decoder plug point proven with REAL formats —
    pure-struct PNG/WAV header parsers, exercised from the binaryFile
    source through per-row media-type dispatch. The stub stays the
    fallback for unregistered types."""
    import os
    import struct

    from spark_iforest_spark.operators import multimodal
    from spark_iforest_spark.sources import read_binary_files

    def png_bytes(w, h, depth=8, color=2):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
            + struct.pack(">I", 0) + b"IEND" + b"\x00\x00\x00\x00"
        )

    def wav_bytes(n_ch, rate, bits, n_frames):
        block = n_ch * bits // 8
        data = b"\x00" * (n_frames * block)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, bits)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    media_dir = str(tmpdir) + "/typed_media"
    os.makedirs(media_dir)
    files = {
        0: ("img.png", png_bytes(640, 480)),
        1: ("clip.wav", wav_bytes(2, 44100, 16, 22050)),
        2: ("blob.bin", b"opaque-payload-no-decoder"),
    }
    for i, (name, data) in files.items():
        with open(f"{media_dir}/{i}_{name}", "wb") as fh:
            fh.write(data)

    media = read_binary_files(spark, media_dir + "/*").select(
        F.regexp_extract(F.col("path"), r"/(\d+)_", 1).cast("long").alias("doc_id"),
        F.col("content").alias("payload"),
        F.when(F.col("path").endswith(".png"), "image/png")
        .when(F.col("path").endswith(".wav"), "audio/wav")
        .otherwise("application/octet-stream")
        .alias("media_type"),
    )
    out = {
        r.doc_id: r
        for r in multimodal.extract_features(media, media_type_col="media_type").collect()
    }
    # PNG header plane: [w, h, depth, color, comp, filt, interlace, n_chunks, bytes]
    assert out[0].features[:4] == [640.0, 480.0, 8.0, 2.0]
    assert out[0].features[7] == 2.0  # IHDR + IEND
    # WAV header plane: [ch, rate, bits, frames, dur_ms, byte_rate, fmt, data, bytes]
    assert out[1].features[:4] == [2.0, 44100.0, 16.0, 22050.0]
    assert out[1].features[4] == 500.0  # 22050 frames @ 44.1kHz = 500 ms
    # unregistered type falls back to the stub histogram (L1-normalized)
    assert abs(sum(out[2].features) - 1.0) < 1e-6
    # direct decoder behavior: malformed payloads raise like real decoders
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.decode_png_header(b"not a png")
    with _pytest.raises(ValueError):
        multimodal.decode_wav_header(b"RIFFxxxxNOPE")


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = sources.read_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    sources.write_jsonl(docs, out, compression="gzip")
    back = sources.read_jsonl(spark, out, schema=docs.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))
    # schema-first read: declared schema is honored exactly
    assert back.schema == docs.schema


def test_extract_features_degrades_malformed_rows(spark):
    from spark_iforest_spark.operators import multimodal

    # one malformed payload must not fail the whole mapInPandas task: the
    # row degrades to stub-histogram features; an empty payload (stub also
    # unrunnable) degrades to null features. Healthy rows are untouched.
    rows = [
        (0, b"\x89PNG\r\n\x1a\n" + b"\x00" * 10, "image/png"),      # truncated PNG
        (1, b"RIFF\x00\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01", "audio/wav"),  # truncated fmt
        (2, b"healthy opaque payload", "application/octet-stream"),
        (3, b"", "image/png"),                                       # empty
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )
    out = {
        r.doc_id: r
        for r in multimodal.extract_features(media, media_type_col="media_type").collect()
    }
    assert len(out) == 4
    for did in (0, 1, 2):  # degraded + healthy rows all get stub histograms
        assert abs(sum(out[did].features) - 1.0) < 1e-4
    assert out[3].features is None
    assert out[3].n_bytes == 0


def test_jpeg_gif_mp4_header_decoders(spark):
    """Round-5 decoders: hand-built minimal payloads, field-exact checks,
    malformed payloads raise the documented ValueError."""
    import struct

    import pytest as _pytest

    from spark_iforest_spark.operators import multimodal

    # JPEG: SOI + APP0 + (progressive) SOF2 + SOS
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof2 = b"\xff\xc2" + struct.pack(">H", 10) + struct.pack(">BHHB", 8, 480, 640, 3) + b"\x00\x00"
    sos = b"\xff\xda" + struct.pack(">H", 2)
    jpeg = b"\xff\xd8" + app0 + b"\xff" + sof2 + sos + b"entropy-data"
    f = multimodal.decode_jpeg_header(jpeg)
    assert list(f[:5]) == [640.0, 480.0, 8.0, 3.0, 1.0]  # w, h, prec, comp, progressive
    assert f[6] == len(jpeg)
    with _pytest.raises(ValueError):
        multimodal.decode_jpeg_header(b"\xff\xd8\xff\xe0\x00\x01")  # bad seg len
    with _pytest.raises(ValueError):
        multimodal.decode_jpeg_header(b"\xff\xd8" + app0)  # no SOF

    # GIF89a, 320x200, GCT of 256 colors
    gif = b"GIF89a" + struct.pack("<HHBBB", 320, 200, 0b1111_0111, 5, 0)
    f = multimodal.decode_gif_header(gif)
    assert list(f[:6]) == [320.0, 200.0, 89.0, 1.0, 256.0, 5.0]
    with _pytest.raises(ValueError):
        multimodal.decode_gif_header(b"GIF10a" + b"\x00" * 7)

    # MP4: ftyp + moov(mvhd v0, timescale 600, duration 3000 -> 5 s)
    ftyp = struct.pack(">I4s", 16, b"ftyp") + b"isom" + struct.pack(">I", 512)
    mvhd_body = bytes([0]) + b"\x00" * 3 + b"\x00" * 8 + struct.pack(">II", 600, 3000) + b"\x00" * 80
    mvhd = struct.pack(">I4s", 8 + len(mvhd_body), b"mvhd") + mvhd_body
    moov = struct.pack(">I4s", 8 + len(mvhd), b"moov") + mvhd
    mp4 = ftyp + moov
    f = multimodal.decode_mp4_header(mp4)
    assert list(f[:6]) == [5.0, 600.0, 3000.0, 0.0, 2.0, 1.0]
    # 64-bit largesize box variant parses identically
    moov64 = struct.pack(">I4s", 1, b"moov") + struct.pack(">Q", 16 + len(mvhd)) + mvhd
    f64 = multimodal.decode_mp4_header(ftyp + moov64)
    assert list(f64[:3]) == [5.0, 600.0, 3000.0]
    with _pytest.raises(ValueError):
        multimodal.decode_mp4_header(b"\x00\x00\x00\x08free")  # no ftyp/moov
    with _pytest.raises(ValueError):
        multimodal.decode_mp4_header(ftyp + struct.pack(">I4s", 99, b"moov"))  # oob size

    # registered at import: pipeline dispatch picks them up per media_type
    rows = [(0, jpeg, "image/jpeg"), (1, gif, "image/gif"), (2, mp4, "video/mp4")]
    media = spark.createDataFrame(rows, "doc_id long, payload binary, media_type string")
    out = {
        r.doc_id: r.features
        for r in multimodal.extract_features(media, media_type_col="media_type").collect()
    }
    assert out[0][:2] == [640.0, 480.0]
    assert out[1][:2] == [320.0, 200.0]
    assert out[2][0] == 5.0
