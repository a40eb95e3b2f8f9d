"""WebDataset tar-shard I/O (X60): round trip, grouping, determinism.

The container format multimodal training pipelines ship: tar shards of
basename-keyed samples. Pins that the Spark-side plumbing is real — a
written corpus reads back byte-identical through the binaryFile +
mapInPandas path, samples group to ext→content maps, shard bytes are a
pure function of the row set, and the members decode through the round-8
REAL codecs (PNG dims, WAV rate) end to end.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators import jpeg_codec, png_codec, wav_codec
from pdf_parse_vector_db_spark.sources import webdataset as wd

N_SAMPLES = 40
FIELDS = {"txt", "png", "wav", "jpg"}


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(13)
    rows = []
    for i in range(N_SAMPLES):
        key = f"{i:06d}"
        img = rng.integers(0, 256, size=(8 + i % 4, 10, 3), dtype=np.uint8)
        audio = rng.integers(-3000, 3000, size=(160 + i, 1)).astype(np.int16)
        rows += [
            (key, "txt", bytearray(f"caption {i}".encode())),
            (key, "png", bytearray(png_codec.encode_png(img))),
            (key, "wav", bytearray(wav_codec.encode_wav(audio, 8000))),
            (key, "jpg", bytearray(jpeg_codec.encode_jpeg(img, quality=90))),
        ]
    return spark.createDataFrame(rows, "key string, ext string, content binary")


def test_write_read_round_trip(spark, corpus, tmp_path):
    out = str(tmp_path / "shards")
    manifest = wd.write_tar_shards(corpus, out, n_shards=4).collect()
    assert sum(r.n_members for r in manifest) == len(FIELDS) * N_SAMPLES
    assert len(manifest) <= 4

    members = wd.read_tar_shards(spark, f"{out}/*.tar")
    assert members.count() == len(FIELDS) * N_SAMPLES
    # byte-exact round trip per (key, ext)
    back = {
        (r.key, r.ext): bytes(r.content) for r in members.collect()
    }
    for r in corpus.collect():
        assert back[(r.key, r.ext)] == bytes(r.content)


def test_group_samples_and_decode_through_real_codecs(spark, corpus, tmp_path):
    out = str(tmp_path / "shards")
    wd.write_tar_shards(corpus, out, n_shards=4).collect()
    samples = wd.group_samples(wd.read_tar_shards(spark, f"{out}/*.tar"))
    rows = samples.collect()
    assert len(rows) == N_SAMPLES
    assert all(r.n_fields == len(FIELDS) for r in rows)
    assert all(set(r.fields) == FIELDS for r in rows)
    # a sample never straddles shards
    assert samples.select("key").distinct().count() == N_SAMPLES
    one = next(r for r in rows if r.key == "000007")
    px = png_codec.decode_png(bytes(one.fields["png"]))
    assert px.shape == (8 + 7 % 4, 10, 3)
    rate, n_ch, _ = wav_codec.decode_wav(bytes(one.fields["wav"]))
    assert (rate, n_ch) == (8000, 1)
    jpx = jpeg_codec.decode_jpeg(bytes(one.fields["jpg"]))
    assert jpx.shape == (8 + 7 % 4, 10, 3)
    assert bytes(one.fields["txt"]) == b"caption 7"


def test_shard_bytes_are_deterministic(spark, corpus, tmp_path):
    """Idempotent republish: the same row set (even arriving in a
    different partitioning) writes byte-identical shards."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    wd.write_tar_shards(corpus, a, n_shards=4).collect()
    wd.write_tar_shards(corpus.repartition(7), b, n_shards=4).collect()
    import os

    names = sorted(os.listdir(a))
    assert names == sorted(os.listdir(b))
    for n in names:
        with open(os.path.join(a, n), "rb") as fa, open(os.path.join(b, n), "rb") as fb:
            assert fa.read() == fb.read(), n
