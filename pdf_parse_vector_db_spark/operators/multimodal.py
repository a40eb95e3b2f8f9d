"""Multimodal columns (north-star X6): image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched stages.

Container constraint: no image/audio libraries are installed here, so the
DECODE kernels are deliberately split:
  * the Spark-side plumbing — binary column handling, schema, mapInPandas
    batch shape, partitioning — is REAL and tested;
  * the pixel/sample decoding inside the batch is either a clearly-marked
    NotImplementedError (real decoder, needs Pillow/ffmpeg) or a
    deterministic fake that derives plausible metadata/features from the
    bytes' sha256 — enough to validate the distributed plumbing end to end.

Scale notes: binary payloads ride the columnar path (Parquet BYTE_ARRAY /
binaryFile source); all stages below are pure maps — the only shuffle a
multimodal pipeline needs is whatever the caller aggregates afterwards.
Feature extraction writes fixed-width float arrays, which is exactly the
embedding column shape the ANN/dedup tiers consume (operators/ann.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Typed metadata attached to every media row.
MEDIA_META_SCHEMA = (
    "doc_id bigint, kind string, n_bytes bigint, sha256 string, "
    "width int, height int, n_frames int, sample_rate int"
)


def attach_binary(docs: DataFrame, text_col: str = "text", kind: str = "image") -> DataFrame:
    """Fixture adapter: treat each document's UTF-8 bytes as an opaque media
    payload (`content: binary`) with a `kind` tag — the schema a binaryFile
    ingest (`spark.read.format('binaryFile')`) produces for real assets."""
    return docs.withColumn("content", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "kind", F.lit(kind)
    )


def _fake_dims(digest: bytes, kind: str) -> tuple[int, int, int, int]:
    """Deterministic stand-in metadata derived from the content hash."""
    w = 160 + digest[0] % 8 * 80
    h = 120 + digest[1] % 8 * 60
    frames = 1 if kind == "image" else 1 + digest[2]
    rate = 0 if kind == "image" else 8000 * (1 + digest[3] % 6)
    return w, h, frames, rate


def decode_media_meta(media: DataFrame, real_decoder: bool = False) -> DataFrame:
    """mapInPandas decode: binary content → typed metadata row.

    real_decoder=True decodes REAL bytes for PNG (operators/png_codec),
    baseline JPEG (operators/jpeg_codec — round-9 upgrade: true dims
    through the full huffman+IDCT pipeline, covering the format that
    dominates web image corpora), and 16-bit PCM WAV (operators/
    wav_codec) payloads; anything else under the real tier still raises
    NotImplementedError (that is where Pillow/ffmpeg plugs in)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_parse_vector_db_spark.operators import (
            avi_codec,
            flac_codec,
            gif_codec,
            jpeg_codec,
            png_codec,
            wav_codec,
        )

        for pdf in batches:
            if real_decoder:
                out = {k: [] for k in (
                    "doc_id", "kind", "n_bytes", "sha256", "width", "height",
                    "n_frames", "sample_rate",
                )}
                for rec in pdf.itertuples(index=False):
                    content = bytes(rec.content) if rec.content is not None else b""
                    out["doc_id"].append(rec.doc_id)
                    out["kind"].append(rec.kind)
                    out["n_bytes"].append(len(content))
                    out["sha256"].append(hashlib.sha256(content).hexdigest())
                    if png_codec.is_png(content):
                        px = png_codec.decode_png(content)
                        out["width"].append(px.shape[1])
                        out["height"].append(px.shape[0])
                        out["n_frames"].append(1)
                        out["sample_rate"].append(0)
                    elif jpeg_codec.is_jpeg(content):
                        px = jpeg_codec.decode_jpeg(content)
                        out["width"].append(px.shape[1])
                        out["height"].append(px.shape[0])
                        out["n_frames"].append(1)
                        out["sample_rate"].append(0)
                    elif wav_codec.is_wav(content):
                        rate, _n_ch, samples = wav_codec.decode_wav(content)
                        out["width"].append(0)
                        out["height"].append(0)
                        out["n_frames"].append(int(samples.shape[0]))
                        out["sample_rate"].append(int(rate))
                    elif avi_codec.is_avi(content):
                        v = avi_codec.parse_avi(content)
                        out["width"].append(v["width"])
                        out["height"].append(v["height"])
                        out["n_frames"].append(v["n_frames"])
                        # fps rides the sample_rate slot (the schema's one
                        # temporal-rate field; images use 0 there too)
                        out["sample_rate"].append(v["fps"])
                    elif gif_codec.is_gif(content):
                        v = gif_codec.decode_gif(content)
                        out["width"].append(v["width"])
                        out["height"].append(v["height"])
                        out["n_frames"].append(v["n_frames"])
                        d0 = v["delays_cs"][0] if v["delays_cs"] else 0
                        # ansi: stdlib python; the ternary guards d0 == 0
                        out["sample_rate"].append(round(100 / d0) if d0 else 0)
                    elif flac_codec.is_flac(content):
                        rate, _n_ch, samples = flac_codec.decode_flac(content)
                        out["width"].append(0)
                        out["height"].append(0)
                        out["n_frames"].append(int(samples.shape[0]))
                        out["sample_rate"].append(int(rate))
                    else:
                        raise NotImplementedError(
                            "real decoding of this media requires Pillow/"
                            "ffmpeg (not in container); PNG, baseline+"
                            "progressive JPEG, 16-bit PCM WAV, FLAC, "
                            "MJPEG-AVI, and GIF87a/89a decode natively"
                        )
                yield pd.DataFrame(out)
                continue
            out = {k: [] for k in (
                "doc_id", "kind", "n_bytes", "sha256", "width", "height", "n_frames", "sample_rate"
            )}
            for rec in pdf.itertuples(index=False):
                content = bytes(rec.content) if rec.content is not None else b""
                digest = hashlib.sha256(content).digest()
                w, h, fr, sr = _fake_dims(digest, rec.kind)
                out["doc_id"].append(rec.doc_id)
                out["kind"].append(rec.kind)
                out["n_bytes"].append(len(content))
                out["sha256"].append(digest.hex())
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(fr)
                out["sample_rate"].append(sr)
            yield pd.DataFrame(out)

    return media.select("doc_id", "kind", "content").mapInPandas(decode, MEDIA_META_SCHEMA)


def extract_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """mapInPandas feature extraction: binary content → fixed-width float
    vector (the multimodal embedding). Deterministic fake: unit-normalized
    digest bytes — component i is (2·digest[i%32]−255)/√Σ, an odd integer
    over an exact-integer norm, so BOTH the float64 division and the
    float32 rounding reproduce bit-identically from the hex digest alone
    (the DuckDB oracle recomputes every component — digest-math like
    decode/frames, replacing round 2's RNG fake that was only rows-only
    checkable). Real models (CLIP et al.) replace `_vec` only — batch
    shape, schema, and normalization are the production plumbing."""

    import math

    def _vec(content: bytes) -> list[float]:
        digest = hashlib.sha256(content).digest()
        ints = [2 * digest[i % 32] - 255 for i in range(dim)]
        root = math.sqrt(float(sum(v * v for v in ints)))  # exact int under sqrt
        # ansi: Python; ints are odd -> ssq > 0 -> root > 0
        return [float(np.float32(v / root)) for v in ints]

    schema = f"doc_id bigint, kind string, feature array<float>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "feature": [
                        _vec(bytes(c) if c is not None else b"") for c in pdf["content"]
                    ],
                }
            )

    return media.select("doc_id", "kind", "content").mapInPandas(extract, schema)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style UDTF: one media row → n_frames/every_n frame rows. The
    fake synthesizes frame ids from the metadata; a real pipeline yields
    (frame_idx, frame_bytes). Demonstrates the 1→N mapInPandas explode that
    frame-level training data extraction needs."""
    meta = decode_media_meta(media)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, idxs = [], [], []
            for rec in pdf.itertuples(index=False):
                for i in range(0, int(rec.n_frames), every_n):
                    ids.append(rec.doc_id)
                    kinds.append(rec.kind)
                    idxs.append(i)
            yield pd.DataFrame({"doc_id": ids, "kind": kinds, "frame_idx": idxs})

    return meta.mapInPandas(sample, "doc_id bigint, kind string, frame_idx int")


def frame_sample_fused(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Single-stage decode+sample: one mapInPandas pass derives the frame
    count from the content digest and emits the sampled frame rows
    directly — no intermediate full-metadata Arrow round trip, no hex
    digest string, and no hashing at all for still images (n_frames is 1
    by definition). This is the lean shape the frames QUERY uses;
    ``frame_sample`` (decode → sample as two composable stages) remains
    the operator real pipelines chain with other metadata consumers.
    Round-2 lesson: the two-stage chain tripled the query's wall time
    doing per-row digest bookkeeping its consumer never read."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, idxs = [], [], []
            for rec in pdf.itertuples(index=False):
                if rec.kind == "image":
                    nf = 1
                else:
                    content = bytes(rec.content) if rec.content is not None else b""
                    nf = 1 + hashlib.sha256(content).digest()[2]
                for i in range(0, nf, every_n):
                    ids.append(rec.doc_id)
                    kinds.append(rec.kind)
                    idxs.append(i)
            yield pd.DataFrame({"doc_id": ids, "kind": kinds, "frame_idx": idxs})

    return media.select("doc_id", "kind", "content").mapInPandas(
        sample, "doc_id bigint, kind string, frame_idx int"
    )


#: pigeonhole guarantee: hamming(a, b) <= PHASH_RADIUS with PHASH_BANDS
#: bands means at least one band is bit-identical (radius < bands), so the
#: band-bucket self-join misses no true pair — the Manku et al. (WWW'07)
#: fingerprint-dedup decomposition.
PHASH_BANDS = 4
PHASH_RADIUS = 3

# One projection, one pass, zero Python: every array is bound exactly once
# via the single-element-array transform trick (a bare withColumn alias is
# inlined by Catalyst's projection collapse, re-evaluating split() per
# reference — the O(n^2) cliff the verify notes pin). Shape:
#   chars  = the decoded payload as a character array
#   pixels = 64 'grayscale blocks': codepoint mass of each of 64 equal
#            character slices (the deterministic, locality-preserving
#            stand-in for Pillow's 8x8 block means — small edits move few
#            blocks). Character granularity matters: WORD-slice occupancy
#            turned out to be a pure function of the word count (period-8
#            moiré patterns collapsed thousands of unrelated docs onto one
#            hash); char slices keep every block occupied and content-driven.
#   bit i  = pixel_i > mean  (compared as 64*pixel_i > total: exact ints)
#   bands  = four 16-bit ints b0..b3 (packing 64 bits into one BIGINT would
#            fight the sign bit in BOTH engines; bands are what the join
#            keys on anyway)
_PHASH_EXPR = r"""
transform(array(split(trim(decode(content, 'UTF-8')), '')), ws ->
  transform(array(transform(sequence(0, 63), i ->
      aggregate(
        slice(ws, ((i * size(ws)) div 64) + 1,
              (((i + 1) * size(ws)) div 64) - ((i * size(ws)) div 64)),
        0L, (a, w) -> a + ascii(w)))), px ->
    transform(array(aggregate(px, 0L, (a, x) -> a + x)), tot ->
      named_struct(
        'b0', aggregate(sequence(0, 15), 0,
                (a, j) -> a + if(64 * element_at(px, j + 1)  > tot, shiftleft(1, j), 0)),
        'b1', aggregate(sequence(0, 15), 0,
                (a, j) -> a + if(64 * element_at(px, j + 17) > tot, shiftleft(1, j), 0)),
        'b2', aggregate(sequence(0, 15), 0,
                (a, j) -> a + if(64 * element_at(px, j + 33) > tot, shiftleft(1, j), 0)),
        'b3', aggregate(sequence(0, 15), 0,
                (a, j) -> a + if(64 * element_at(px, j + 49) > tot, shiftleft(1, j), 0))
      ))[0])[0])[0]
"""


def perceptual_hash(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint of each binary payload:
    64 content-derived 'pixel' blocks, one bit per block (above/below the
    mean), emitted as four 16-bit band ints — the image near-dup device
    (pHash family) behind every large-scale vision-corpus dedup.

    The pixel stage is the deterministic decode fake shared by this module
    (a real pipeline swaps in Pillow: grayscale 8x8 block means — one line,
    same downstream): block i is the codepoint mass of the i-th of 64 equal
    character slices, so it is LOCALITY-PRESERVING — a small edit perturbs
    few blocks, an exact dup matches in all 64 — unlike the sha256 fakes,
    which are deliberately avalanche. Pure codegen map (no UDF, no shuffle);
    output is 4 ints/row, the only bytes later joins exchange."""
    return media.select(
        "doc_id", F.expr(_PHASH_EXPR).alias("ph")
    ).select("doc_id", "ph.b0", "ph.b1", "ph.b2", "ph.b3")


def perceptual_hash_png(media: DataFrame) -> DataFrame:
    """REAL-pixel aHash for PNG (round 8) and baseline-JPEG (round 9)
    payloads: decode with the pure-stdlib/numpy codecs, grayscale, 8×8
    block means, one bit per block — the textbook average-hash — emitted
    in the SAME (doc_id, b0..b3) 4-band shape as the codegen fake tier,
    so `phash_near_dup_pairs` consumes either tier unchanged. aHash is
    built on block MEANS, so it is stable across JPEG's quantization
    noise — the property that makes PNG↔JPEG re-encode near-dups land
    within the banding radius (pinned in tests/test_png_codec.py).
    Arrow-batched mapInPandas (decode is necessarily Python); output is
    4 ints/row, so the banding join's exchange volume is identical to
    the fake tier's."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_parse_vector_db_spark.operators import jpeg_codec, png_codec

        for pdf in batches:
            out = {"doc_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for rec in pdf.itertuples(index=False):
                content = bytes(rec.content) if rec.content is not None else b""
                px = (
                    jpeg_codec.decode_jpeg(content)
                    if jpeg_codec.is_jpeg(content)
                    else png_codec.decode_png(content)
                )
                bands = png_codec.ahash_64(px)
                out["doc_id"].append(rec.doc_id)
                for i, v in enumerate(bands):
                    out[f"b{i}"].append(v)
            yield pd.DataFrame(out)

    return media.select("doc_id", "content").mapInPandas(
        hash_batch, "doc_id bigint, b0 int, b1 int, b2 int, b3 int"
    )


def video_frames(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame extraction (round 10): MJPEG-AVI payloads →
    sampled frame rows (doc_id, frame_idx, width, height, frame: the
    frame's own JFIF bytes). The container walk locates frames without
    decoding pixels — MJPEG frames are independent keyframes, so
    sampling every_n-th frame touches only the sampled bytes; the 1→N
    mapInPandas explode is the real version of ``frame_sample``'s
    digest fake. At scale the frame rows are the unit of downstream
    parallelism (decode/phash/resize fan out per frame, not per video)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_parse_vector_db_spark.operators import avi_codec

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                content = bytes(rec.content) if rec.content is not None else b""
                v = avi_codec.parse_avi(content)
                for i in range(0, v["n_frames"], every_n):
                    rows.append(
                        {
                            "doc_id": rec.doc_id,
                            "frame_idx": i,
                            "width": v["width"],
                            "height": v["height"],
                            "frame": v["frames"][i],
                        }
                    )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "content").mapInPandas(
        sample, "doc_id bigint, frame_idx int, width int, height int, frame binary"
    )


def video_frame_phash(media: DataFrame, every_n: int = 1) -> DataFrame:
    """Per-frame REAL-pixel aHash for MJPEG-AVI payloads: sampled frames
    decode through the JPEG codec, hash with the same 8×8-block-mean
    aHash as the image tiers, and emit (doc_id, frame_idx, b0..b3) — the
    4-band shape ``phash_near_dup_pairs`` consumes, so cross-VIDEO (and
    video↔still-image) near-dup detection reuses the banding join
    unchanged. This is the frame-dedup pass a video training corpus
    runs before sampling clips (near-identical frames across re-encodes
    collapse into one)."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_parse_vector_db_spark.operators import jpeg_codec, png_codec

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for rec in pdf.itertuples(index=False):
                px = jpeg_codec.decode_jpeg(bytes(rec.frame))
                bands = png_codec.ahash_64(px)
                out["doc_id"].append(rec.doc_id)
                out["frame_idx"].append(rec.frame_idx)
                for i, v in enumerate(bands):
                    out[f"b{i}"].append(v)
            yield pd.DataFrame(out)

    return video_frames(media, every_n).mapInPandas(
        hash_batch, "doc_id bigint, frame_idx int, b0 int, b1 int, b2 int, b3 int"
    )


def animation_frame_phash(media: DataFrame, every_n: int = 1) -> DataFrame:
    """Container-universal per-frame real-pixel aHash (round 10): one
    Arrow stage that dispatches on the payload's own signature — MJPEG-AVI
    (frames decode through the JPEG codec), animated GIF (lossless
    composed frames), and still PNG/JPEG as 1-frame media — and emits the
    shared (doc_id, frame_idx, b0..b3) 4-band shape, so
    ``phash_near_dup_pairs`` finds duplicates ACROSS containers: the same
    pixels land on the same hash whether they arrived as a video frame,
    a GIF frame, or a still image. This is the cross-container collapse a
    multimodal training corpus needs (the same meme circulates as all
    three)."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_parse_vector_db_spark.operators import (
            avi_codec,
            gif_codec,
            jpeg_codec,
            png_codec,
        )

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for rec in pdf.itertuples(index=False):
                content = bytes(rec.content) if rec.content is not None else b""
                if avi_codec.is_avi(content):
                    v = avi_codec.parse_avi(content)
                    frames = [
                        (i, jpeg_codec.decode_jpeg(v["frames"][i]))
                        for i in range(0, v["n_frames"], every_n)
                    ]
                elif gif_codec.is_gif(content):
                    v = gif_codec.decode_gif(content)
                    frames = [
                        (i, v["frames"][i])
                        for i in range(0, v["n_frames"], every_n)
                    ]
                elif jpeg_codec.is_jpeg(content):
                    frames = [(0, jpeg_codec.decode_jpeg(content))]
                else:
                    frames = [(0, png_codec.decode_png(content))]
                for i, px in frames:
                    bands = png_codec.ahash_64(px)
                    out["doc_id"].append(rec.doc_id)
                    out["frame_idx"].append(i)
                    for j, v_ in enumerate(bands):
                        out[f"b{j}"].append(v_)
            yield pd.DataFrame(out)

    return media.select("doc_id", "content").mapInPandas(
        hash_batch, "doc_id bigint, frame_idx int, b0 int, b1 int, b2 int, b3 int"
    )


AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, n_frames bigint, "
    "duration_s double, rms double, zcr double, peak double, bands array<double>"
)


def audio_features_wav(media: DataFrame) -> DataFrame:
    """REAL audio features for WAV payloads (round 8): stdlib decode +
    deterministic DSP (operators/wav_codec.py) — true sample rate /
    duration, RMS / zero-crossing / peak, and an 8-band spectral energy
    profile, all rounded to 6 dp. The silence/clipping/bandwidth filters
    an audio-corpus curation pass runs. Arrow-batched mapInPandas; the
    output is 8 scalars + an 8-float array per row, so downstream
    aggregations exchange fixed-width rows only."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_parse_vector_db_spark.operators import wav_codec

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                content = bytes(rec.content) if rec.content is not None else b""
                f = wav_codec.audio_features(content)
                rows.append(
                    {
                        "doc_id": rec.doc_id,
                        "sample_rate": f["sample_rate"],
                        "n_channels": f["n_channels"],
                        "n_frames": f["n_frames"],
                        "duration_s": f["duration_s"],
                        "rms": f["rms"],
                        "zcr": f["zcr"],
                        "peak": f["peak"],
                        "bands": f["bands"],
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "content").mapInPandas(
        feats, AUDIO_FEATURES_SCHEMA
    )


def phash_near_dup_pairs(hashes: DataFrame, radius: int = PHASH_RADIUS) -> DataFrame:
    """Banded hamming-radius self-join over perceptual hashes: explode each
    hash into its 4 bands, bucket-join on (band_idx, band_value) —
    pigeonhole-complete for radius < 4 — then verify candidates with the
    exact popcount distance. Same candidate-generation-then-verify shape
    as the simhash tier.

    Plan shape (read off PLANS.md, not assumed): the exploded rows CARRY
    the full 4-band hash, so the band join alone supplies both sides of
    the verify — the first cut re-joined the hash table per side, which
    re-computed the 64-block expression on four plan legs; this shape
    computes it once per self-join leg and verifies inline before the
    DISTINCT pair cut. The band-bucket exchange carries 6 ints/row."""
    if radius >= PHASH_BANDS:
        raise ValueError("banding is only pigeonhole-complete for radius < bands")
    bands = hashes.select(
        "doc_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band", "val"),
    )
    left = bands.alias("l")
    right = bands.alias("r")
    hamming = sum(
        F.bit_count(F.expr(f"l.{c} ^ r.{c}")) for c in ("b0", "b1", "b2", "b3")
    )
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= radius)
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            "hamming",
        )
        .distinct()
    )


RESIZE_SCHEMA = (
    "doc_id bigint, kind string, src_w int, src_h int, dst_w int, dst_h int, "
    "scale double, out_bytes bigint, out_sha string"
)


def resize_media(
    media: DataFrame, max_side: int = 224, real_decoder: bool = False
) -> DataFrame:
    """mapInPandas resize: binary content → aspect-preserving thumbnail
    metadata + resized-payload digest (the preprocessing step before any
    vision encoder, which expects a bounded max side).

    real_decoder=True is where Pillow's `Image.resize` plugs in — not
    available in this container → NotImplementedError. The deterministic
    fake derives source dims from the content hash (same device as
    decode_media_meta), computes the REAL aspect-preserving target
    geometry (that arithmetic IS the production logic), and stands in for
    the pixel resample with a size-proportional slice of the source bytes
    re-hashed — deterministic, so the whole stage sits under the oracle
    hash. Pure map stage: no shuffle, payloads never leave their
    partition.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_parse_vector_db_spark.operators import jpeg_codec, png_codec

        for pdf in batches:
            if real_decoder:
                out = {k: [] for k in (
                    "doc_id", "kind", "src_w", "src_h", "dst_w", "dst_h",
                    "scale", "out_bytes", "out_sha",
                )}
                for rec in pdf.itertuples(index=False):
                    content = bytes(rec.content) if rec.content is not None else b""
                    is_jpg = jpeg_codec.is_jpeg(content)
                    if not (png_codec.is_png(content) or is_jpg):
                        raise NotImplementedError(
                            "real resampling of non-PNG/JPEG media requires "
                            "Pillow (not in container); PNG and baseline JPEG "
                            "resize natively"
                        )
                    px = (
                        jpeg_codec.decode_jpeg(content)
                        if is_jpg
                        else png_codec.decode_png(content)
                    )
                    h, w = px.shape[0], px.shape[1]
                    scale = min(1.0, max_side / max(w, h))  # ansi: Python
                    dw, dh = max(1, int(w * scale)), max(1, int(h * scale))
                    small = png_codec.resize_nearest(px, dw, dh)
                    # re-encode in the source format (a thumbnail pipeline
                    # keeps the container unless told otherwise)
                    resized = (
                        jpeg_codec.encode_jpeg(
                            small if small.shape[2] != 1 else small[:, :, 0]
                        )
                        if is_jpg
                        else png_codec.encode_png(small)
                    )
                    out["doc_id"].append(rec.doc_id)
                    out["kind"].append(rec.kind)
                    out["src_w"].append(w)
                    out["src_h"].append(h)
                    out["dst_w"].append(dw)
                    out["dst_h"].append(dh)
                    out["scale"].append(round(scale, 6))
                    out["out_bytes"].append(len(resized))
                    out["out_sha"].append(hashlib.sha256(resized).hexdigest())
                yield pd.DataFrame(out)
                continue
            out = {k: [] for k in (
                "doc_id", "kind", "src_w", "src_h", "dst_w", "dst_h",
                "scale", "out_bytes", "out_sha",
            )}
            for rec in pdf.itertuples(index=False):
                content = bytes(rec.content) if rec.content is not None else b""
                digest = hashlib.sha256(content).digest()
                w, h, _, _ = _fake_dims(digest, rec.kind)
                scale = min(1.0, max_side / max(w, h))  # ansi: Python; w >= 160
                dw, dh = max(1, int(w * scale)), max(1, int(h * scale))
                # fake resample: keep a scale^2-proportional prefix of the
                # payload (pixel count shrinks quadratically), re-digest
                keep = max(1, int(len(content) * scale * scale))
                resized = content[:keep]
                out["doc_id"].append(rec.doc_id)
                out["kind"].append(rec.kind)
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["dst_w"].append(dw)
                out["dst_h"].append(dh)
                out["scale"].append(round(scale, 6))
                out["out_bytes"].append(len(resized))
                out["out_sha"].append(hashlib.sha256(resized).hexdigest())
            yield pd.DataFrame(out)

    return media.select("doc_id", "kind", "content").mapInPandas(resize, RESIZE_SCHEMA)
