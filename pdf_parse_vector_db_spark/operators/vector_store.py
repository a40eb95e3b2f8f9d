"""Compressed vector storage layout (X61 MATERIALIZED): packed sign
bits + Matryoshka prefix as STORED columns, written once at ingest.

Round 8 introduced the two modern coarse-stage ANN tiers — binary
quantization (Hamming over sign bits) and Matryoshka prefix distance —
but computed both compressions per query from the full float arrays, so
the coarse scans read 100% of the vector bytes and the tiers' claimed
I/O win was aspirational. This module makes the claim true in code, the
same move operators/ivf_index.py made for the IVF assignment (and the
same index-at-ingest posture as the reference's Milvus collection,
extract_and_embed.py:53-58: the index is built when vectors land, not
when queries arrive):

  * ``pack_sign_bits_expr``    — array<double> → array<bigint> of
    ceil(dim/64) words, bit j of word w set iff vec[64w+j] > 0. Pure
    codegen (no UDF); bit 63 reaches the sign bit via shiftleft on two
    32-bit halves, the exact overflow-safe fold simhash_packed_expr
    pinned (operators/dedup.py) — arithmetic 2^63 would overflow under
    ANSI mode.
  * ``mrl_prefix_expr``        — the first `width` dimensions as their
    own column (MRL-trained embeddings front-load semantic mass).
  * ``build_compressed_layout``— one pass over the corpus writes
    (vec_id, label, packed, prefix, embedding) parquet. Parquet is
    columnar, so a coarse scan that selects only (vec_id, label,
    packed) reads d/8 bytes per vector instead of 8d — the 64× memory-
    bandwidth cut that makes BQ the first filter in production vector
    stores — and the MRL coarse stage reads only the prefix column
    (width/dim of the float bytes). Column pruning is pinned in
    tests/test_ann.py via ReadSchema.
  * ``hamming_packed``         — Σ bit_count(a XOR b) over the word
    arrays; scalar bit arithmetic in codegen, ~1 long op per 64 dims.

Scale: the layout is embarrassingly parallel to build (per-row map, no
shuffle) and append-only to maintain — a new batch packs its own rows;
no global state, unlike IVF's trained quantizer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_sign_bits_expr(vec_sql: str, dim: int) -> Column:
    """Sign bits of the array<double> SQL expression `vec_sql` packed
    into ceil(dim/64) BIGINT words (little-endian within each word:
    dimension 64w+j → bit j of word w). Tail bits past `dim` are zero in
    every row, so they never contribute to a XOR popcount."""
    n_words = (dim + 63) // 64
    # 0/1 bit vector for word __w, padded past dim
    bits = (
        f"transform(sequence(0, 63), j -> CASE WHEN __w * 64 + j < {dim} "
        f"AND element_at({vec_sql}, CAST(__w * 64 + j + 1 AS INT)) > CAST(0 AS DOUBLE) "
        f"THEN 1 ELSE 0 END)"
    )

    def half(off: int) -> str:
        return (
            f"aggregate(zip_with(slice(__bits, {off}, 32), sequence(0, 31), "
            "(v, b) -> CASE WHEN v = 1 THEN shiftleft(1L, b) ELSE 0L END), "
            "0L, (acc, x) -> acc + x)"
        )

    # bind the bit vector once via the single-element-array trick so the
    # transform isn't re-evaluated per half (same idiom as
    # dedup.simhash_packed_expr)
    word = (
        f"element_at(transform(array({bits}), "
        f"__bits -> shiftleft({half(33)}, 32) | {half(1)}), 1)"
    )
    return F.expr(f"transform(sequence(0, {n_words - 1}), __w -> {word})")


def mrl_prefix_expr(vec_col: Column, width: int) -> Column:
    """The Matryoshka prefix — the first `width` dimensions — as its own
    stored column."""
    return F.slice(vec_col, 1, width)


def hamming_packed(a: Column, b: Column) -> Column:
    """Hamming distance between two packed sign-bit word arrays:
    Σ bit_count(a[i] XOR b[i])."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def compressed_columns(
    emb: DataFrame, dim: int, prefix_width: int = 16
) -> DataFrame:
    """(vec_id, label, packed, prefix, embedding) — the stored layout's
    row shape, shared by the bulk build and the CDC feed sync so batch
    and stream cannot disagree on the packing."""
    return emb.select(
        "vec_id",
        "label",
        pack_sign_bits_expr("CAST(embedding AS ARRAY<DOUBLE>)", dim).alias("packed"),
        mrl_prefix_expr(
            F.col("embedding").cast("array<double>"), prefix_width
        ).alias("prefix"),
        "embedding",
    )


def sync_compressed_layout_from_feed(
    spark,
    source_table: str,
    layout_table: str,
    cursor: int,
    dim: int,
    prefix_width: int = 16,
) -> int:
    """CDC-driven maintenance of the compressed layout — the X61 analog
    of sync_ivf_index_from_feed: rows appended to the manifested
    `source_table` since `cursor` are packed/prefixed and committed to
    the manifested `layout_table`, exactly once (idempotency key =
    source version window). Packing is per-row with no global state (no
    trained quantizer), so the sync is a pure map + append — the
    cheapest index maintenance in the family. Returns the new cursor."""
    from pdf_parse_vector_db_spark.sources import manifest as M

    to, feed = M.table_changes(
        spark, source_table, from_version=cursor, ignore_replaces=True
    )
    if feed is None:
        return to
    M.commit_append(
        spark,
        layout_table,
        compressed_columns(feed, dim, prefix_width),
        idempotency_key=f"vstore-sync-v{cursor}-v{to}",
        stats_cols=("vec_id",),
    )
    return to


def search_compressed_layout(
    spark,
    layout_table: str,
    qvec: list[float],
    k: int = 5,
    n_candidates: int = 50,
) -> DataFrame:
    """BQ two-stage search over the MANIFESTED layout table that
    sync_compressed_layout_from_feed maintains — X61's production loop
    (ingest → CDC pack sync → compressed search) with no per-query
    packing anywhere: the query's sign bits are computed once on its own
    1-row frame, the coarse stage scans only the stored packed column,
    and the exact rerank reads full embeddings for the candidate rows."""
    from pyspark.sql import functions as F  # noqa: F811 — local for clarity

    from pdf_parse_vector_db_spark.functions.vector import l2_distance
    from pdf_parse_vector_db_spark.sources import manifest as M

    _, layout = M.snapshot(spark, layout_table)
    if layout is None:
        raise ValueError("search_compressed_layout needs a non-empty layout table")
    dim = len(qvec)
    q = spark.createDataFrame([(qvec,)], "qvec array<double>").select(
        pack_sign_bits_expr("qvec", dim).alias("qpacked"),
        F.col("qvec"),
    )
    cand = (
        layout.select("vec_id", "packed")
        .crossJoin(F.broadcast(q.select("qpacked")))
        .select(
            "vec_id",
            hamming_packed(F.col("packed"), F.col("qpacked")).alias("ham"),
        )
        .orderBy("ham", "vec_id")
        .limit(n_candidates)
        .select("vec_id")
    )
    return (
        layout.select("vec_id", "label", "embedding")
        .join(F.broadcast(cand), "vec_id", "left_semi")
        .crossJoin(F.broadcast(q.select("qvec")))
        .select(
            "vec_id",
            "label",
            F.round(
                l2_distance(F.col("embedding").cast("array<double>"), F.col("qvec")),
                6,
            ).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(k)
        .select("vec_id", "label", F.round(F.col("d"), 4).alias("score"))
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (round 10, X71): the third classic compression
# tier beside PQ (codebooks) and BQ (sign bits) — Milvus IVF_SQ8 / FAISS
# ScalarQuantizer parity. Each dimension maps affinely onto one BYTE:
#   code = clamp(round((v - min_d) / (max_d - min_d) * 255), 0, 255)
# with per-dimension (min_d, max_d) TRAINED over the corpus (a global
# statistic, like IVF's quantizer and unlike BQ's stateless sign packing —
# so SQ8 lives in its own trained layout, not in `compressed_columns`).
# Eight codes pack into one BIGINT word (OR-fold of shifted bytes — no
# arithmetic add, so no ANSI overflow path for codes >= 128 in the top
# byte), giving a stored coarse column of exactly 1 byte/dimension:
# 8x fewer bytes than the float64 math width, 4x fewer than the float32
# storage width. The coarse stage ranks by ASYMMETRIC distance (ADC):
# full-precision query vs dequantized corpus rows, entirely in whole-stage
# codegen via transform/aggregate — then the usual exact rerank reads full
# embeddings for candidate rows only.


def sq8_train_params(emb: DataFrame) -> DataFrame:
    """Per-dimension (min, max) over the corpus as ONE row
    (mins array<double>, maxs array<double>).

    Shape at scale: posexplode -> groupBy(pos) has a map-side partial
    combine, so the exchange carries (partitions x dim) rows, never
    (N x dim); the final collect_list is dim-sized. min/max over doubles
    are exact, so the trained params are bit-identical on any engine."""
    ex = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val")
    )
    per = ex.groupBy("pos").agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    return per.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))), lambda s: s["mn"]
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mx"))), lambda s: s["mx"]
        ).alias("maxs"),
    )


def _sq8_code_sql(vec_sql: str, idx: str, dim: int) -> str:
    """SQL for the byte code of 0-based dimension `idx` (an expression),
    reading per-dim params from columns `mins`/`maxs`. Indices past `dim`
    (word-tail padding) and degenerate dims (max == min) code to 0."""
    mn = f"element_at(mins, CAST({idx} AS INT) + 1)"
    mx = f"element_at(maxs, CAST({idx} AS INT) + 1)"
    v = f"element_at({vec_sql}, CAST({idx} AS INT) + 1)"
    return (
        f"CASE WHEN {idx} >= {dim} THEN 0L "
        f"WHEN {mx} = {mn} THEN 0L "
        f"ELSE CAST(least(CAST(255 AS DOUBLE), greatest(CAST(0 AS DOUBLE), "
        f"round(({v} - {mn}) / ({mx} - {mn}) * CAST(255 AS DOUBLE)))) AS BIGINT) END"
    )


def sq8_pack_expr(vec_sql: str, dim: int) -> Column:
    """array<double> SQL expression -> ceil(dim/8) BIGINT words, 8 byte
    codes per word (code for dim 8w+j occupies bits 8j..8j+7 of word w).
    OR-fold, not addition: shiftleft(code, 56) of a code >= 128 sets bit
    63, and bitwise OR of disjoint byte lanes has no overflow semantics
    to trip ANSI mode. Requires `mins`/`maxs` param columns in scope
    (crossJoin the broadcast 1-row sq8_train_params frame first)."""
    n_words = (dim + 7) // 8
    code = _sq8_code_sql(vec_sql, "(__w * 8 + __j)", dim)
    word = (
        "aggregate(transform(sequence(0, 7), __j -> "
        f"shiftleft({code}, __j * 8)), 0L, (acc, x) -> acc | x)"
    )
    return F.expr(f"transform(sequence(0, {n_words - 1}), __w -> {word})")


def sq8_dequant_expr(words_sql: str, dim: int) -> Column:
    """Packed SQ8 words -> the dequantized array<double>:
    deq_d = min_d + code_d * ((max_d - min_d) / 255). Byte extraction is
    shiftright + mask (arithmetic shift's sign-extension is masked off by
    `& 255`, so the top byte of a negative word decodes correctly).
    Requires `mins`/`maxs` columns in scope. The coarse ADC distance is
    l2_distance(this, query) — identical left-to-right double arithmetic
    to the DuckDB twin's list(...) ORDER BY pos construction."""
    mn = "element_at(mins, __i + 1)"
    mx = "element_at(maxs, __i + 1)"
    code = (
        f"shiftright(element_at({words_sql}, CAST(__i div 8 AS INT) + 1), "
        "(__i % 8) * 8) & 255L"
    )
    return F.expr(
        f"transform(sequence(0, {dim - 1}), __i -> "
        f"CASE WHEN {mx} = {mn} THEN {mn} "
        f"ELSE {mn} + CAST(({code}) AS DOUBLE) * (({mx} - {mn}) / CAST(255 AS DOUBLE)) END)"
    )


def sq8_columns(emb: DataFrame, params: DataFrame, dim: int) -> DataFrame:
    """(vec_id, label, sq8, embedding) — the stored SQ8 layout row shape.
    `params` is the 1-row sq8_train_params frame (broadcast: 2 x dim
    doubles). The full embedding rides along for the exact rerank, which
    column pruning keeps out of the coarse scan."""
    return emb.crossJoin(F.broadcast(params)).select(
        "vec_id",
        "label",
        sq8_pack_expr("CAST(embedding AS ARRAY<DOUBLE>)", dim).alias("sq8"),
        "embedding",
    )


def build_sq8_layout(emb: DataFrame, path: str, dim: int) -> DataFrame:
    """Train params, write the packed layout parquet at `path`, and
    return the trained 1-row params frame (callers persist it beside the
    layout — re-training on a grown corpus is a rebuild, the same
    retrain-vs-drift posture as the IVF quantizer)."""
    params = sq8_train_params(emb)
    sq8_columns(emb, params, dim).write.mode("overwrite").parquet(path)
    return params


def build_compressed_layout(
    emb: DataFrame, path: str, dim: int, prefix_width: int = 16
) -> None:
    """One corpus pass → (vec_id, label, packed, prefix, embedding)
    parquet at `path`. Overwrite semantics: rebuilding is idempotent.
    The full embedding rides along as its own column so the exact rerank
    reads it ONLY for the candidate rows (broadcast semi-join), while
    the coarse stages' column pruning never touches it."""
    compressed_columns(emb, dim, prefix_width).write.mode("overwrite").parquet(path)
