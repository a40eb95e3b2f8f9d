"""Semantic pins for plans/curation.py beyond the oracle equality that
tests/test_oracle.py already enforces: each query's defining invariant,
checked on the sf0.001 fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.plans import curation as C
from tests.conftest import SF_SMOKE


def test_edit_distance_twins_found(spark):
    rows = C.edit_distance_dups(spark, SF_SMOKE).collect()
    assert rows, "planted twins must surface"
    # every planted twin (doc_id % 17 == 0 → doc_id + 1000, 6 chars cut,
    # +1 when the cut exposes a trailing space that canon then trims)
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    planted = {d for d in range(0, n_docs, C._EDIT_TWIN_MOD)}
    found = {
        r.id_a
        for r in rows
        if r.id_b == r.id_a + C._EDIT_TWIN_OFFSET and r.dist <= 7
    }
    assert planted <= found
    assert all(0 <= r.dist <= C._EDIT_MAX_DIST for r in rows)


def test_domain_caps_bounds(spark):
    rows = C.domain_caps(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.docs_kept <= min(C._DOMAIN_CAP, r.docs_total)
        assert r.tokens_kept >= 0


def test_blocklist_removes_blocked_sources(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    present = {r.source for r in docs.select("source").distinct().collect()}
    blocked_present = present & set(C._BLOCKED_SOURCES)
    out = C.blocklist_filter(spark, SF_SMOKE)
    total_sources = out.agg(F.sum("n_sources")).collect()[0][0] or 0
    # surviving distinct sources, summed over langs, can never include a
    # blocked source: per-lang distinct counts are each ≤ |present - blocked|
    assert all(
        r.n_sources <= len(present - blocked_present) for r in out.collect()
    )
    assert total_sources > 0


def test_corpus_diff_statuses_partition_ids(spark):
    rows = {r.status: r for r in C.corpus_diff(spark, SF_SMOKE).collect()}
    assert set(rows) <= {"added", "removed", "changed", "unchanged"}
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    # every doc_id lands in exactly one status bucket
    assert sum(r.n_docs for r in rows.values()) == n_docs
    if "added" in rows:  # version B exclusives are exactly the % 10 == 9 ids
        assert rows["added"].min_doc_id % 10 == 9


def test_dsir_scores_every_doc_and_is_deterministic(spark):
    df = C.dsir_importance(spark, SF_SMOKE)
    rows = df.collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == n_docs
    assert all(r.n_terms > 0 for r in rows)
    assert rows == df.collect()  # integer-exact scoring: bit-stable reruns


def test_ppl_buckets_are_terciles_per_lang(spark):
    rows = C.unigram_ppl_buckets(spark, SF_SMOKE).collect()
    assert rows and all(r.ppl_bucket in (1, 2, 3) for r in rows)
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.ppl_bucket)
    for lang, buckets in by_lang.items():
        counts = [buckets.count(b) for b in (1, 2, 3)]
        assert max(counts) - min(counts) <= 1, (lang, counts)  # ntile balance


def test_rerank_orders_by_second_metric(spark):
    rows = C.rerank_two_stage(spark, SF_SMOKE).collect()
    assert len(rows) == C._RERANK_K
    cos = [r.cos_score for r in rows]
    assert cos == sorted(cos, reverse=True)


def test_incremental_dedup_classes(spark):
    """Exact re-crawls (doc_id % 26 == 0) must match their original at
    jaccard 1.0; reversed-word arrivals must not match anything at the
    0.5 threshold (shared vocabulary, no shared 3-shingles)."""
    rows = {r.new_id: r for r in C.incremental_dedup(spark, SF_SMOKE).collect()}
    assert rows
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    for d in range(0, n_docs, C._INC_MOD):
        r = rows[d + C._INC_OFFSET]
        if d % (2 * C._INC_MOD) == 0:
            assert r.is_dup and r.jaccard == 1.0 and r.hist_id is not None, r
        else:
            assert not r.is_dup and r.hist_id is None, r


def test_misra_gries_no_false_negatives_any_partitioning(spark):
    """The MG candidate pass must never lose a true heavy hitter however
    the tokens are partitioned — compare against the naive groupBy answer
    under a skewed and a round-robin layout."""
    from pdf_parse_vector_db_spark.operators.frequent import frequent_terms

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    tok = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term")
    ).persist()
    phi = 0.01
    total = tok.count()
    naive = {
        (r.term, r.cnt)
        for r in tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= -(-total * phi // 1))
        .collect()
    }
    for layout in (tok.repartition(7), tok.repartition(13, "term"), tok.coalesce(1)):
        got = {(r.term, r.cnt) for r in frequent_terms(layout, phi=phi).collect()}
        assert got == naive
    tok.unpersist()


def test_bitext_mining_one_nomination_per_source(spark):
    rows = C.bitext_mining(spark, SF_SMOKE).collect()
    assert rows, "mining must nominate at least one pair"
    srcs = [r.src_id for r in rows]
    assert len(srcs) == len(set(srcs)), "at most one target per source"
    assert all(r.margin >= C._MINE_MARGIN for r in rows)


def test_bpe_pair_counts_descending_and_plausible(spark):
    rows = C.bpe_pair_counts(spark, SF_SMOKE).collect()
    assert len(rows) == C._BPE_TOP
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(len(r.pair) == 2 for r in rows)
