"""Multimodal-column queries (north-star X6) over binary payloads derived
from the documents fixture (no media libs in container — see
operators/multimodal.py for the real/fake decoder split)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators.multimodal import (
    attach_binary,
    decode_media_meta,
    extract_features,
    frame_sample_fused,
    perceptual_hash,
    phash_near_dup_pairs,
    resize_media,
)
from pdf_parse_vector_db_spark.plans.registry import QuerySpec
from pdf_parse_vector_db_spark.sources.registry import load_table


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata projection: byte length + content digest of
    each payload — pure Catalyst over the binary column (oracle-checked;
    both engines hash the same UTF-8 bytes)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    media = attach_binary(docs)
    return media.select(
        "doc_id",
        "kind",
        F.length(F.col("content")).cast("bigint").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )


MULTIMODAL_META_SQL = """
SELECT doc_id,
       'image' AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS content_sha
FROM documents
"""


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing: binary → typed media metadata (kinds
    alternate image/video by doc parity). Oracle-checked: the fake
    decoder's dimensions are sha256-digest byte arithmetic, which the
    DuckDB twin reproduces from the hex digest — so the Arrow batch
    boundary, schema, and per-row decode all sit under the value hash."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    media = attach_binary(docs).withColumn(
        "kind", F.when(F.col("doc_id") % 2 == 0, "image").otherwise("video")
    )
    # eager cut before the presentation sort: orderBy's range sampling
    # re-executes a narrow upstream, doubling the Python decode stage
    # (round-10 optimization; see video_ingest_meta)
    return decode_media_meta(media).localCheckpoint().orderBy("doc_id")


# digest byte k of the hex sha256 is hex chars [2k+1, 2k+2] — mirror of
# operators/multimodal._fake_dims
MULTIMODAL_DECODE_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS kind,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         sha256(text) AS sha
  FROM documents
),
b AS (
  SELECT *,
         ('0x' || substr(sha, 1, 2))::INT AS b0,
         ('0x' || substr(sha, 3, 2))::INT AS b1,
         ('0x' || substr(sha, 5, 2))::INT AS b2,
         ('0x' || substr(sha, 7, 2))::INT AS b3
  FROM m
)
SELECT doc_id, kind, n_bytes, sha AS sha256,
       CAST(160 + (b0 % 8) * 80 AS INT) AS width,
       CAST(120 + (b1 % 8) * 60 AS INT) AS height,
       CAST(CASE WHEN kind = 'image' THEN 1 ELSE 1 + b2 END AS INT) AS n_frames,
       CAST(CASE WHEN kind = 'image' THEN 0 ELSE 8000 * (1 + b3 % 6) END AS INT) AS sample_rate
FROM b
ORDER BY doc_id
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing: binary → unit-norm float vector; the
    output column is ANN-ready (same shape the embeddings table has).
    Oracle-backed since round 3: the fake extractor is digest math
    (operators/multimodal.extract_features), so the DuckDB twin recomputes
    the float32 components from the hex digest and the norm fold and the
    first component both sit under the value hash."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    media = attach_binary(docs)
    feats = extract_features(media, dim=64)
    return feats.select(
        "doc_id",
        F.size("feature").alias("dim"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.col("feature").cast("array<double>"),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ),
            4,
        ).alias("norm"),
        F.round(F.col("feature")[0].cast("double"), 6).alias("f0"),
        # eager cut before the presentation sort (see video_ingest_meta)
    ).localCheckpoint().orderBy("doc_id")


MULTIMODAL_FEATURES_SQL = """
WITH m AS (
  SELECT doc_id, sha256(text) AS sha FROM documents
), b AS (
  SELECT doc_id,
         list_transform(range(32),
           j -> 2 * (('0x' || substr(sha, CAST(2 * j + 1 AS INT), 2))::INT) - 255
         ) AS ints
  FROM m
), s AS (
  SELECT doc_id, ints,
         sqrt(CAST(2 * list_sum(list_transform(ints, v -> v * v)) AS DOUBLE)) AS root
  FROM b
), c AS (
  SELECT doc_id,
         list_transform(list_concat(ints, ints),
                        v -> CAST(CAST(v AS DOUBLE) / root AS REAL)) AS f
  FROM s
)
SELECT doc_id,
       CAST(len(f) AS INT) AS dim,
       round(sqrt(list_sum(list_transform(f, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS norm,
       round(CAST(f[1] AS DOUBLE), 6) AS f0
FROM c
ORDER BY doc_id
"""


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling UDTF accounting: sampled frame rows per kind.
    Oracle-checked: sampled-frame counts are ceil(n_frames / every_n) over
    the digest-derived frame counts, reproduced by the DuckDB twin.
    Uses the fused single-stage sampler (one mapInPandas, no intermediate
    metadata round trip) — the two-stage frame_sample chain regressed this
    query 0.89→2.99 s in round 2 on digest bookkeeping nothing consumed."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    media = attach_binary(docs).withColumn(
        "kind", F.when(F.col("doc_id") % 2 == 0, "image").otherwise("video")
    )
    frames = frame_sample_fused(media, every_n=10)
    return (
        frames.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_frames_sampled"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("kind")
    )


MULTIMODAL_FRAMES_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS kind,
         sha256(text) AS sha
  FROM documents
),
f AS (
  SELECT doc_id, kind,
         CASE WHEN kind = 'image' THEN 1
              ELSE 1 + ('0x' || substr(sha, 5, 2))::INT END AS n_frames
  FROM m
)
SELECT kind,
       CAST(sum((n_frames + 9) // 10) AS BIGINT) AS n_frames_sampled,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM f
GROUP BY kind
ORDER BY kind
"""


def clip_pair_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: LAION-style image–text pair filtering — pair up the embedding
    corpus two-by-two (even vec_id = image tower, odd = text tower of the
    same logical pair), keep pairs whose cross-modal cosine clears the
    threshold, and report per-label keep accounting. The gate every
    multimodal training set applies before contrastive training (Schuhmann
    et al. 2021 filter CommonCrawl pairs at CLIP cosine ≥ 0.3).

    Scale shape: the pair join is a self-join on pair_id — both sides
    partial-project to (pair_id, vector) map-side and the join key is an
    8-byte int; with the corpus laid out bucketed by pair_id it is
    exchange-free. The cosine is pure codegen array algebra."""
    emb = load_table(spark, sf_dir, "embeddings")
    img = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.floor(F.col("vec_id") / 2).cast("bigint").alias("pair_id"),
        F.col("embedding").alias("img_vec"),
        "label",
    )
    txt = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.floor(F.col("vec_id") / 2).cast("bigint").alias("pair_id"),
        F.col("embedding").alias("txt_vec"),
    )
    from pdf_parse_vector_db_spark.functions.vector import cosine_similarity

    pairs = img.join(txt, on="pair_id").withColumn(
        "cos", F.round(cosine_similarity(F.col("img_vec"), F.col("txt_vec")), 6)
    )
    # mean over integer micros, not avg(double): the 6dp-rounded cosines
    # become exact integers, so the sum is order-independent and the mean
    # identical across engines (a float avg flipped a 6th decimal at sf0.1)
    return (
        pairs.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("pairs"),
            F.sum((F.col("cos") >= 0.2).cast("long")).alias("kept"),
            F.round(
                F.sum(F.round(F.col("cos") * 1e6).cast("bigint"))
                # ansi: group count >= 1 times a nonzero literal
                / (F.count(F.lit(1)) * 1e6),
                6,
            ).alias("mean_cos"),
        )
        .orderBy("label")
    )


CLIP_PAIR_FILTER_SQL = """
WITH img AS (
  SELECT CAST(vec_id // 2 AS BIGINT) AS pair_id,
         CAST(embedding AS DOUBLE[]) AS img_vec, label
  FROM embeddings WHERE vec_id % 2 = 0
),
txt AS (
  SELECT CAST(vec_id // 2 AS BIGINT) AS pair_id,
         CAST(embedding AS DOUBLE[]) AS txt_vec
  FROM embeddings WHERE vec_id % 2 = 1
),
pairs AS (
  SELECT i.label, round(list_cosine_similarity(i.img_vec, t.txt_vec), 6) AS cos
  FROM img i JOIN txt t USING (pair_id)
)
SELECT label,
       count(*) AS pairs,
       CAST(sum(CASE WHEN cos >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       round(CAST(sum(CAST(round(cos * 1000000) AS BIGINT)) AS DOUBLE)
             / (count(*) * 1000000.0), 6) AS mean_cos
FROM pairs
GROUP BY label
ORDER BY label
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 resize plumbing: aspect-preserving thumbnail geometry + resized
    payload digest via mapInPandas (operators/multimodal.resize_media).
    The geometry arithmetic is the production logic; the pixel resample is
    the documented deterministic fake (digest of a scale²-proportional
    byte prefix), so the WHOLE stage — including the fake — sits under
    the oracle hash. Oracle caveat: DuckDB's sha256 is VARCHAR-only, so
    the byte-prefix equals the char-prefix only because the fixture text
    is ASCII; real binary payloads keep the Spark side unchanged and drop
    the oracle to rows-only."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    # eager cut before the presentation sort (see video_ingest_meta)
    return resize_media(attach_binary(docs)).localCheckpoint().orderBy("doc_id")


MULTIMODAL_RESIZE_SQL = """
WITH m AS (
  SELECT doc_id, 'image' AS kind, text,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         sha256(text) AS sha
  FROM documents
), dims AS (
  SELECT doc_id, kind, text, n_bytes,
         160 + (('0x' || substring(sha, 1, 2))::INT % 8) * 80 AS src_w,
         120 + (('0x' || substring(sha, 3, 2))::INT % 8) * 60 AS src_h
  FROM m
), geo AS (
  SELECT doc_id, kind, text, n_bytes, src_w, src_h,
         least(1.0, 224.0 / greatest(src_w, src_h)) AS scale
  FROM dims
)
SELECT doc_id, kind,
       CAST(src_w AS INTEGER) AS src_w, CAST(src_h AS INTEGER) AS src_h,
       CAST(greatest(1, floor(src_w * scale)) AS INTEGER) AS dst_w,
       CAST(greatest(1, floor(src_h * scale)) AS INTEGER) AS dst_h,
       round(scale, 6) AS scale,
       CAST(greatest(1, floor(n_bytes * scale * scale)) AS BIGINT) AS out_bytes,
       sha256(substring(text, 1, CAST(greatest(1, floor(n_bytes * scale * scale)) AS BIGINT)))
         AS out_sha
FROM geo
ORDER BY doc_id
"""


def phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X47: perceptual-hash (aHash) image near-dup pairs — the missing
    member of the multimodal dedup family (LAION-scale vision corpora dedup
    on pHash hamming distance, not byte equality). 64 locality-preserving
    'pixel' blocks per payload → one above-mean bit each → four 16-bit
    bands; banded self-join (pigeonhole-complete at radius 3 < 4 bands,
    Manku et al. WWW'07) then exact popcount verify. Everything is integer
    arithmetic over a whitespace tokenization both engines share, so the
    WHOLE pipeline — blocks, bits, banding, verify — sits under the value
    hash. Scale shape: hash stage is a pure codegen map (4 ints/row); the
    only exchange is the 16-byte band-bucket key; verify joins ride the
    already-distinct candidate pairs."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    hashes = perceptual_hash(attach_binary(docs))
    return phash_near_dup_pairs(hashes).orderBy("doc_a", "doc_b")


PHASH_NEAR_DUPS_SQL = r"""
WITH ws AS (
  SELECT doc_id, string_split(trim(text), '') AS w FROM documents
),
px AS (
  SELECT doc_id,
         list_transform(range(64), i ->
           coalesce(list_sum(list_transform(
             w[CAST((i * len(w)) // 64 + 1 AS BIGINT)
               : CAST(((i + 1) * len(w)) // 64 AS BIGINT)],
             x -> ascii(x))), 0)::BIGINT) AS px
  FROM ws
),
tot AS (
  SELECT doc_id, px, coalesce(list_sum(px), 0)::BIGINT AS tot FROM px
),
hashes AS (
  SELECT doc_id,
         coalesce(list_sum(list_transform(range(16), j ->
           CASE WHEN 64 * px[CAST(j + 1 AS BIGINT)]  > tot THEN (1 << j) ELSE 0 END)), 0)::INT AS b0,
         coalesce(list_sum(list_transform(range(16), j ->
           CASE WHEN 64 * px[CAST(j + 17 AS BIGINT)] > tot THEN (1 << j) ELSE 0 END)), 0)::INT AS b1,
         coalesce(list_sum(list_transform(range(16), j ->
           CASE WHEN 64 * px[CAST(j + 33 AS BIGINT)] > tot THEN (1 << j) ELSE 0 END)), 0)::INT AS b2,
         coalesce(list_sum(list_transform(range(16), j ->
           CASE WHEN 64 * px[CAST(j + 49 AS BIGINT)] > tot THEN (1 << j) ELSE 0 END)), 0)::INT AS b3
  FROM tot
),
bx AS (
  SELECT doc_id, j AS band,
         CASE j WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS val
  FROM hashes, range(4) t(j)
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bx a JOIN bx b
    ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(ha.b0::BIGINT, hb.b0::BIGINT))
          + bit_count(xor(ha.b1::BIGINT, hb.b1::BIGINT))
          + bit_count(xor(ha.b2::BIGINT, hb.b2::BIGINT))
          + bit_count(xor(ha.b3::BIGINT, hb.b3::BIGINT)) AS INT) AS hamming
FROM cands c
JOIN hashes ha ON ha.doc_id = c.doc_a
JOIN hashes hb ON hb.doc_id = c.doc_b
WHERE bit_count(xor(ha.b0::BIGINT, hb.b0::BIGINT))
    + bit_count(xor(ha.b1::BIGINT, hb.b1::BIGINT))
    + bit_count(xor(ha.b2::BIGINT, hb.b2::BIGINT))
    + bit_count(xor(ha.b3::BIGINT, hb.b3::BIGINT)) <= 3
ORDER BY doc_a, doc_b
"""


def video_ingest_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X75 end-to-end video-container loop, oracle-pinned: every document
    is rendered into a REAL MJPEG-AVI (1 + n_chars % 4 frames of
    deterministic 16×24 gradient pixels, fps 10, frames seeded by the
    document's text bytes), then parsed BACK by the container reader and
    frame-sampled at stride 2 — all inside one Arrow batch. The surfaced
    columns (frame count, dims, fps, sampled-frame count) are integers
    the oracle recomputes arithmetically, so any disagreement anywhere
    in the encode→parse→sample loop (header fields, chunk walk, idx1,
    word alignment, sampling stride) breaks the value hash. The pixel
    payloads themselves are pinned bit-exactly in tests/test_avi_codec.

    Scale shape: pure 1-row→1-row mapInPandas over the documents scan —
    no shuffle; the presentation orderBy rides the tiny result."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "text"
    )

    def loop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_parse_vector_db_spark.operators import avi_codec

        base = np.linspace(0, 255, 24, dtype=np.float64)
        for pdf in batches:
            out = {
                "doc_id": [], "n_frames": [], "width": [], "height": [],
                "fps": [], "n_sampled": [],
            }
            for rec in pdf.itertuples(index=False):
                txt = rec.text or ""
                k = 1 + len(txt) % 4
                tb = txt.encode("utf-8")
                frames = []
                for i in range(k):
                    shift = float(tb[i % len(tb)]) if tb else 0.0
                    f = np.clip(
                        np.add.outer(np.arange(16) * 3.0 + shift + i * 11.0, base),
                        0,
                        255,
                    ).astype(np.uint8)
                    frames.append(f)
                avi = avi_codec.encode_avi(frames, fps=10, quality=80)
                v = avi_codec.parse_avi(avi)
                sampled = [i for i in range(0, v["n_frames"], 2)]
                out["doc_id"].append(rec.doc_id)
                out["n_frames"].append(v["n_frames"])
                out["width"].append(v["width"])
                out["height"].append(v["height"])
                out["fps"].append(v["fps"])
                out["n_sampled"].append(len(sampled))
            yield pd.DataFrame(out)

    return (
        docs.mapInPandas(
            loop,
            "doc_id bigint, n_frames int, width int, height int, fps int, "
            "n_sampled int",
        )
        # EAGER cut before the presentation sort (round-10 optimization,
        # guide §1.4): orderBy's range-boundary sampling re-executes a
        # narrow upstream, so the whole AVI encode→parse loop ran TWICE
        # per bench pass; materializing the 6-narrow-column result once
        # makes the sample+sort read materialized rows instead.
        .localCheckpoint()
        .orderBy("doc_id")
    )


VIDEO_INGEST_META_SQL = """
SELECT doc_id,
       CAST(1 + length(text) % 4 AS INTEGER) AS n_frames,
       CAST(24 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       CAST(10 AS INTEGER) AS fps,
       CAST((1 + length(text) % 4 + 1) // 2 AS INTEGER) AS n_sampled
FROM documents
ORDER BY doc_id
"""


def gif_roundtrip_pixelsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X78 end-to-end GIF loop under a PIXEL-EXACT oracle: every document
    renders 1 + doc_id % 3 frames of formula pixels
    (v(f, y, x) = (doc_id + 3y + 5x + 7f) mod 200, gray 8x12), encodes a
    real animated GIF, decodes it back, and surfaces the SUM OF DECODED
    PIXEL VALUES. GIF is palette-lossless, so the decoded sum must equal
    the closed-form arithmetic the DuckDB twin computes — any defect in
    the LZW coder, palette construction, sub-block segmentation, or frame
    composition changes the sum and breaks the value hash. (The lossy
    AVI loop pins container FIELDS the same way; losslessness is what
    lets this one pin the pixels themselves.)

    Scale shape: pure 1-row→1-row mapInPandas over the documents scan."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents", spread=True).select("doc_id")

    def loop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_parse_vector_db_spark.operators import gif_codec

        yy = np.arange(8).reshape(-1, 1)
        xx = np.arange(12).reshape(1, -1)
        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "pixel_sum": []}
            for rec in pdf.itertuples(index=False):
                k = 1 + rec.doc_id % 3
                frames = []
                for f in range(k):
                    v = ((rec.doc_id + 3 * yy + 5 * xx + 7 * f) % 200).astype(
                        np.uint8
                    )
                    frames.append(np.stack([v, v, v], axis=-1))
                g = gif_codec.encode_gif(frames, delay_cs=4)
                d = gif_codec.decode_gif(g)
                s = int(sum(int(fr.sum()) for fr in d["frames"]))
                out["doc_id"].append(rec.doc_id)
                out["n_frames"].append(d["n_frames"])
                out["pixel_sum"].append(s)
            yield pd.DataFrame(out)

    return (
        docs.mapInPandas(loop, "doc_id bigint, n_frames int, pixel_sum bigint")
        # eager cut: the sort's sampling pass must not re-run the LZW loop
        # (see video_ingest_meta)
        .localCheckpoint()
        .orderBy("doc_id")
    )


GIF_ROUNDTRIP_PIXELSUM_SQL = """
SELECT d.doc_id,
       CAST(1 + d.doc_id % 3 AS INTEGER) AS n_frames,
       CAST(3 * sum((d.doc_id + 3 * y.y + 5 * x.x + 7 * f.f) % 200) AS BIGINT)
         AS pixel_sum
FROM documents d, range(3) f(f), range(8) y(y), range(12) x(x)
WHERE f.f < 1 + d.doc_id % 3
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


def flac_roundtrip_samplesum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X79 end-to-end FLAC loop under a SAMPLE-EXACT oracle (the audio
    analog of gif_roundtrip_pixelsum): every document renders
    300 + (doc_id % 4)·100 formula samples
    (s(i) = ((doc_id·7 + i·13) mod 4001) − 2000, int16 mono), encodes a
    real FLAC (FIXED predictors + Rice residuals — the compressed path,
    not verbatim), decodes it back, and surfaces the SUM OF DECODED
    SAMPLES. FLAC is lossless, so the sum must equal the closed form the
    DuckDB twin computes — any defect in the bit packing, CRCs, Rice
    coder, or predictor reconstruction breaks the value hash.

    Scale shape: pure 1-row→1-row mapInPandas over a doc_id-only scan;
    per-row cost is the per-sample Rice coding, parallelized by the
    document partitioning."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents", spread=True).select("doc_id")

    def loop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_parse_vector_db_spark.operators import flac_codec

        for pdf in batches:
            out = {"doc_id": [], "n_samples": [], "sample_sum": []}
            for rec in pdf.itertuples(index=False):
                n = 300 + (rec.doc_id % 4) * 100
                i = np.arange(n, dtype=np.int64)
                s = (((rec.doc_id * 7 + i * 13) % 4001) - 2000).astype(np.int16)
                f = flac_codec.encode_flac(s, 8000, block=256)
                _rate, _nch, dec = flac_codec.decode_flac(f)
                out["doc_id"].append(rec.doc_id)
                out["n_samples"].append(int(dec.shape[0]))
                out["sample_sum"].append(int(dec.sum()))
            yield pd.DataFrame(out)

    return (
        docs.mapInPandas(loop, "doc_id bigint, n_samples int, sample_sum bigint")
        # eager cut: the sort's sampling pass must not re-run the Rice coder
        # (see video_ingest_meta)
        .localCheckpoint()
        .orderBy("doc_id")
    )


FLAC_ROUNDTRIP_SAMPLESUM_SQL = """
SELECT d.doc_id,
       CAST(300 + (d.doc_id % 4) * 100 AS INTEGER) AS n_samples,
       CAST(sum((d.doc_id * 7 + i.i * 13) % 4001 - 2000) AS BIGINT) AS sample_sum
FROM documents d, range(600) i(i)
WHERE i.i < 300 + (d.doc_id % 4) * 100
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


QUERIES = [
    QuerySpec("multimodal_meta", multimodal_meta, MULTIMODAL_META_SQL, "X6 binary metadata"),
    QuerySpec("gif_roundtrip_pixelsum", gif_roundtrip_pixelsum, GIF_ROUNDTRIP_PIXELSUM_SQL, "X78 lossless GIF encode->decode loop pinned by a closed-form pixel checksum (any LZW/palette/composition defect breaks the hash)"),
    QuerySpec("flac_roundtrip_samplesum", flac_roundtrip_samplesum, FLAC_ROUNDTRIP_SAMPLESUM_SQL, "X79 lossless FLAC encode->decode loop (FIXED+Rice compressed path) pinned by a closed-form sample checksum"),
    QuerySpec("video_ingest_meta", video_ingest_meta, VIDEO_INGEST_META_SQL, "X75 MJPEG-AVI encode->parse->sample loop with arithmetic oracle over the surfaced container fields"),
    QuerySpec("phash_near_dups", phash_near_dups, PHASH_NEAR_DUPS_SQL, "X47 perceptual-hash image near-dup pairs (banded hamming, integer-exact oracle)"),
    QuerySpec("clip_pair_filter", clip_pair_filter, CLIP_PAIR_FILTER_SQL, "X6 cross-modal cosine pair gate"),
    QuerySpec("multimodal_decode", multimodal_decode, MULTIMODAL_DECODE_SQL, "X6 decode plumbing (digest-math oracle)"),
    QuerySpec("multimodal_features", multimodal_features, MULTIMODAL_FEATURES_SQL, "X6 feature extraction (digest-math oracle since r3)"),
    QuerySpec("multimodal_frames", multimodal_frames, MULTIMODAL_FRAMES_SQL, "X6 frame sampling (digest-math oracle)"),
    QuerySpec("multimodal_resize", multimodal_resize, MULTIMODAL_RESIZE_SQL, "X6 aspect-preserving resize plumbing (digest-math oracle)"),
]
