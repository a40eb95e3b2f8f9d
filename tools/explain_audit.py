"""Dump the executed physical plans of the flagship queries to PLANS.md.

The scale claims in README/SURVEY (pushdown, pruning, broadcast, partial
agg, TakeOrderedAndProject) are pinned as assertions in tests/test_plans.py;
this tool materializes the evidence so a reviewer can read the actual plans
without running Spark:

    python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

#: query → the plan property a reviewer should look for.
AUDIT = {
    "knn_topk": "PushedFilters on label; TakeOrderedAndProject (no global sort)",
    "search_similar": "broadcast of the 1-row query vector; window dedup over 100 rows only",
    "regional_revenue": "BroadcastHashJoin for region/nation/customer dims",
    "pricing_summary": "two HashAggregates (map-side partial before exchange)",
    "market_share": "join ordering: 3 broadcast dims + single shuffled fact-fact join",
    "corpus_prep": "quality gate before any exchange; 16-byte fingerprint shuffle",
    "doc_fingerprints": "column pruning: only (doc_id, text) read",
    "embedding_near_dups": "block-pair applyInPandas fan-out, no quadratic join",
    "price_percentiles": "ObjectHashAggregate, partial before exchange (exact percentile still combines map-side)",
    "decontaminate_overlap": "holdout shingles BroadcastHashJoin; corpus text never exchanged",
    "training_shards": "single per-lang sort exchange shared by window and output order",
    "embedding_quantization": "pure Catalyst array algebra, no Python operators, partial agg",
    "corpus_to_shards": "quality-gate Filter BEFORE any Exchange; fingerprint-only dedup shuffle",
    "funnel_conversion": "one user_id exchange reused by all three stage aggs (AQE co-partitioning)",
    "table_stats": "single FileScan per table feeding the multi-distinct aggregate",
    "dsir_importance": "256-row weight table BroadcastHashJoin onto the token stream",
    "blocklist_filter": "broadcast LeftAnti gate; corpus side never shuffles",
    "rerank_two_stage": "TakeOrderedAndProject at BOTH stages (fetch and rerank)",
    "frequent_terms": "MG candidates via mapInPandas, then broadcast semi-join recount",
    "incremental_dedup": "batch-sized band probe join; history text never pairs with itself",
    "embedding_outliers": "centroid agg and rejoin exchange on the same (label,pos) key",
    "span_dedup": "codegen span derivation (no Python); one span exchange for winner election",
    "referential_audit": "broadcast LeftAnti FK-orphan checks; fact side never shuffles for dims",
    "user_state_intervals": "both island row_numbers share one (user_id, ts) sort",
    "containment_dups": "map-side pair emission from rare posting lists, no self-join exchange",
    "zorder_skipping": "pure codegen bit interleave; ntile sorts are the audited layout itself",
    "simhash_portable_dups": "map-side signature fold; only 4 band INTs per doc cross any exchange",
    "simhash_near_dups": "pure-codegen packed-long signature (no Python); barrier exchange shared via ReusedExchange; non-null sig so no pushed-filter recompute",
    "event_transitions": "lead() on one (user_id) sort; transition agg exchanges |types|^2 keys only",
    "key_skew_audit": "per-leg two-level aggregate (map-side partial first); 4-row report union",
    "decayed_engagement": "single scan, one user_id exchange, integer-micros partial agg",
    "cdc_apply": "changelog-sized row_number; snapshot only aggregates, never shuffles rows",
    "collocation_pmi": "zip_with bigrams (no self-join); totals roll up from aggs, not corpus re-scans; TakeOrderedAndProject top-50",
    "source_kl_divergence": "ONE token explode; term/source/corpus marginals all derive from the (source,term) agg",
    "profit_by_nation": "Q9 shape: part/supplier/nation all BroadcastHashJoin; lineitem shuffles only for orders join + 2-key agg",
    "semdedup": "cluster-bounded blocked-BLAS pairwise (FlatMapGroupsInPandas); integer-micros centroids broadcast back",
    "bloom_filter_audit": "<= m-row filter as broadcast build side; probe stream never shuffles for membership",
    "vocab_oov": "top-V vocab via TakeOrderedAndProject, broadcast back onto the token stream",
    "nation_triangles": "fact->dim graph contraction before the ordered a<b<c triangle join; no CartesianProduct",
    "bpe_learn_merges": "unrolled elect-and-apply rounds; each merge re-enters as a 1-row broadcast, never a collect",
    "span_corruption_plan": "both mask windows share one (doc_id, pos) sort; single exchange end to end",
    "segment_priority_chi2": "constant-size contingency agg; marginals as windows over 25 cells, not corpus re-scans",
    "classifier_auc": "per-dim centroid agg broadcast back (1-row BNLJ); rank window input is the score histogram agg, never per-row",
    "retrieval_relevance": "5-row query panel broadcast onto the corpus scan; per-query window after rank<=10 cut",
    "phrase_search": "term equality filters applied between explode and exchange; equi-join on doc_id, no CartesianProduct",
    "max_open_orders": "sweep-line: running-sum window input is the per-day delta agg joined to the calendar spine",
    "kmv_overlap": "k-row sketches via per-source rank windows over distinct hashes; estimates join as 1-row broadcasts",
    "es_weighted_reservoir": "TakeOrderedAndProject on the rounded ES key — per-partition k-heaps, no global sort",
    "kcore_peel": "per-round degree agg + alive semi-joins; AQE broadcasts the shrinking alive set",
    "segment_priority_mi": "one contingency agg; MI/entropy as integer-nanos sums over 25 cells",
    "revenue_autocorrelation": "lag window over the calendar spine only; Pearson from exact integer sufficient stats",
    "revenue_trend_ols": "grouped OLS from one-pass sufficient statistics; dims broadcast",
    "fisher_dims": "dim×label sufficient-stat agg; everything after runs on 640 rows",
    "quantile_normalize": "101-row global percentile table broadcast; per-source rank windows, no global per-row rank",
    "cdc_chunk_dedup": "chunking+fingerprinting map-side in one generator; only 16-byte fps exchange",
    "event_debounce": "one (user,type) sort exchange for the lag; |types|-key rollup",
    "cep_pattern_funnel": "user-keyed range joins, co-partitioned after the first exchange",
    "ppjoin_near_dups": "prefix-token equi-join candidates over hashed trigram keys; no CartesianProduct",
    "hll_merge_audit": "register-wise max re-agg: merged and direct sketches share the (bucket) key space",
    "data_contract_audit": "each constraint a scan-level partial agg; referential check is a broadcast anti-join",
    "mv_rewrite_audit": "rewrite path aggregates the months×nations MV, not the fact; dims broadcast",
    "purchase_view_left_pairs": "time-band left join; at stream time both watermarks bound the state",
    "rendezvous_sharding": "HRW assignment as per-row array algebra — no explode, no shuffle before the 8-key rollup",
    "pareto_suppliers": "skyline via per-nation RANGE-frame running min, not a dominance self-join",
    "cuped_ab_test": "one user-keyed agg; all CUPED algebra on per-variant sufficient stats",
    "forecast_backtest": "lag windows over the bounded monthly series; one (month) agg over orders",
    "label_propagation": "per-round argmax window over the (node,label) count table, never raw edges",
    "sssp_bounded": "unrolled relax join+min-agg rounds; dims broadcast in graph construction",
    "threshold_algorithm_topk": "both prefixes TakeOrderedAndProject; random access = hash joins of <=2d candidate ids",
    "revenue_recognition": "day explode aggregates map-side to month keys; no windows",
    "correlated_sample_audit": "all three join legs hash joins; sampling gates are scan-level filters",
    "multimodal_resize": "pure mapInPandas stage; payloads never leave their partition",
    "bitemporal_asof": "each as-of leg one user-keyed rank window over the doubly-filtered changelog",
    "merkle_diff_audit": "fixed-key-space XOR digests with map-side partials; digest-only exchange",
    "length_ks_test": "CDF window over the bounded length histogram, not per-row",
    "apportion_sample_slots": "|langs|-row agg; remainder ranking window over <=|langs| rows",
    "encoding_advisor": "bucket-partitioned run lags; boundary correction over the bounded bucket table",
    "ivf_knn": "seed broadcast; assignment argmin as one MIN agg; probe IN-filter = partition pruning at scale",
    "ivf_partitioned_knn": "the materialized form: scan shows PartitionFilters cluster_id IN (nprobe cells) over the partitionBy layout; only probed cells listed/decoded",
    "decision_llm_stage": "cascade CASE + substring map-side; one Arrow-batched UDF; no exchange before the sort",
    "zorder_layout": "global row_number = the Z-ORDER rewrite sort; zone-map accounting on 2x64 rows",
    "scd2_customer_history": "one dim x batch full-outer join; three projection legs unioned, no window",
    "multimodal_features": "pure mapInPandas feature stage; norm fold in codegen over the float array",
    "lsh_portable_knn": "planes broadcast as DATA (dim-agnostic since r6, no 64 KB codegen cliff); candidate OR-filter before the top-k cut",
    "inference_batch_packing": "one documents scan -> stack unpivot; both strategies share the ranking windows",
    "power_iteration_top_pc": "narrow explode + vec_id self-join (r6: no dim-wide payload); dim^2-key Gram exchange once (checkpointed); matvecs join a broadcast dim-row vector",
    "search_ingested": "ingest chunks cached once; search is filtered scan + TakeOrderedAndProject over it",
    "ann_recall": "probe ranking as a window over broadcast seeds; recall as a left-semi count - no driver loop",
    "substring_dedup_plan": "one shingle-hash exchange (rank window); island merge windows keyed doc_id; no UDFs",
    "token_budget_plan": "rank/cumsum/total windows + final agg share ONE source-keyed exchange",
    "nearest_event_join": "hour-band equi-join (user,bucket) - no time-range nested loop; argmin = one MIN pack agg",
    "adamic_adar_linkpred": "deg broadcast onto per-supplier self-join; TakeOrderedAndProject(50) cut",
    "l_diversity_audit": "QI broadcast onto orders; one fact agg with partial distinct; l-grid on class table only",
    "ngram_coverage_curve": "gram hash-agg with map-side partials; head cut TakeOrdered(100) before any window",
    "soft_dedup_weights": "components reused from dup pipeline; csize agg + broadcast-back; integer-micros sums",
    "pq_knn": "FIXED-ksub codebook broadcast (r5); encode argmin one MIN agg; ADC TakeOrdered over codes only",
    "embedding_pca_variance": "shared _pi_core Gram exchange + matvecs; trace = dim-row filter of checkpointed C*",
    "bpe_encode_tokens": "per-round localCheckpoint lineage cuts (r6): corpus word agg once, each round one |vocab| exchange + 1-row broadcast merge; final plan = one token-count exchange over the checkpointed vocab",
    "fs_record_linkage": "SNM window hashpartitions on the nation block key; EM stats are SinglePartition aggs re-entering as 1-row BroadcastNestedLoopJoins; no CartesianProduct",
    "phash_near_dups": "pure-codegen 64-block hash (no UDF); band-bucket equi-join exchanges 16-byte keys; popcount verify after DISTINCT candidate cut; no CartesianProduct",
    "nn_descent_graph": "stride init is a 3-row BroadcastNestedLoopJoin + semi-join; per-round local join = hash self-joins on integer ids, canonical-pair DISTINCT before ONE dot-product fold per pair (norms precomputed, broadcast); windowed top-K; no CartesianProduct",
    "dbscan_clusters": "eps-pairs ride the bucketed applyInPandas BLAS kernel keyed by IVF cell; degree/core/border are integer-key hash aggs and semi/anti joins; components via the localCheckpoint'd Pregel fixpoint; no CartesianProduct",
    "dbscan_clusters_halo": "multi-probe assignment = broadcast-seeds window (row_number over the packed key); same bucketed BLAS kernel with nprobe-duplicated rows + DISTINCT pair cut; identical integer tail; no CartesianProduct",
    "nn_descent_incremental": "seed stage = stride broadcast + IVF same-cell equi-join; fresh-flagged wedge join on integer ids only; payload attach is a PLAIN id join (AQE-decided, no broadcast hint); touched-node semi/anti split before re-rank windows; no CartesianProduct",
    "graph_knn": "beam search over the NN-Descent graph: per-hop frontier = integer-id hash join beam x graph, rerank = TakeOrderedAndProject on the packed (dist-micros, id) key; beam-sized localCheckpoints only; no CartesianProduct",
    "ivf_filtered_knn": "label predicate PUSHED into the parquet scan (PushedFilters) BEFORE the coarse argmin — only qualifying vectors are assigned or scored; widened probe broadcast; TakeOrderedAndProject final cut",
    "bq_knn": "coarse FileScan projects ONLY (vec_id, label, packed) — ReadSchema excludes the embedding column (d/8 bytes/vector); Hamming = bit_count(xor) fold in codegen; rerank reads embeddings under a broadcast semi-join on 50 candidate ids; both cuts TakeOrderedAndProject",
    "mrl_knn": "coarse FileScan projects ONLY (vec_id, label, prefix) — ReadSchema excludes the embedding column (16/d of the float bytes); rerank reads embeddings under a broadcast semi-join; both cuts TakeOrderedAndProject",
    "graph_knn_stored": "SEARCH-ONLY plan over the persisted graph artifact (the build happened once per session): entry rank + 4 hops, each an integer-id hash join of the ≤16-row beam into the stored (src,dst) FileScan + a TakeOrderedAndProject cut on the packed key; no NN-Descent stages anywhere in this plan",
    "graph_filtered_knn": "ACORN filtered beam: rank stage joins the label-FILTERED embedding scan (predicate pushed), expansion joins 1- and 2-hop through the UNFILTERED graph on integer ids; widened 32-row beam localCheckpoints; TakeOrderedAndProject cuts; no CartesianProduct",
    "bq_filtered_knn": "label predicate PUSHED into the packed coarse FileScan (PushedFilters: EqualTo(label,1), ReadSchema = (vec_id,label,packed) — no embedding bytes); Hamming fold in codegen; exact rerank over filtered candidates via broadcast semi-join",
    "pdf_roundtrip_ingest": "single ArrowEvalPython stage over the documents scan (ReadSchema = doc_id,text only) — render-to-PDF + parse-back is a pure per-row map, no shuffle except the final presentation sort; no CartesianProduct",
    "range_search": "single scan + broadcast query attach; BOTH band bounds in whole-stage codegen BEFORE the presentation sort (the sort sees only qualifying rows); no top-k operator by design; no CartesianProduct",
    "search_pagination": "ranking window rides the 100-row over-fetch (TakeOrderedAndProject), so the single-partition window is bounded at fetch_k regardless of corpus size; page filter on row_number; no CartesianProduct",
    "sq8_knn": "coarse FileScan projects ONLY (vec_id, sq8) — ReadSchema excludes the embedding column (1 byte/dim of packed codes); ADC dequant+distance is a transform/aggregate fold in codegen with the 1-row params broadcast; rerank reads embeddings under a broadcast semi-join; both cuts TakeOrderedAndProject",
    "sq8_filtered_knn": "label predicate PUSHED into the packed byte-code coarse FileScan (PushedFilters: EqualTo(label,1), ReadSchema = (vec_id,label,sq8) — no embedding bytes); same codegen ADC fold; exact rerank over filtered candidates",
    "ivf_sq8_knn": "the composed Milvus IVF_SQ8 layering: broadcast-seeds argmin assignment + nprobe semi-join FIRST (partition pruning at scale), THEN the SQ8 ADC fold ranks only probed rows, THEN exact rerank of 50 candidates — the two prunings multiply; no CartesianProduct",
    "grouping_search": "ONE shuffle keyed by the group field; WindowGroupLimit cuts to group_size below the per-group sort; group ranking is TakeOrderedAndProject over one-row-per-group bests; 3-row group list broadcast back onto winners",
    "sparse_knn": "corpus token stream LEFT-SEMI joined against the broadcast query-term set BEFORE the (doc_id, term) exchange — posting rows only; tf/df hash aggs with map-side partials; dot product accumulates integer micros (order-independent); TakeOrderedAndProject(10)",
    "hybrid_weighted": "both legs end in TakeOrderedAndProject cuts before any window; per-leg min/max are 1-row aggregates over the 50-row cut re-entering as broadcast; fusion is a full-outer join of two ≤50-row sides",
    "maxsim_topk": "3-row query set broadcast; per-(entity, q) MAX is a partially-aggregated groupBy (map-side combine → entities×3 rows at the exchange); Σ of maxes over integer micros; TakeOrderedAndProject(5)",
    "video_ingest_meta": "single ArrowEvalPython stage over the documents scan (ReadSchema = doc_id,text only) — AVI encode→parse→sample is a pure per-row map, no shuffle before the presentation sort",
    "multi_query_knn": "Q queries off ONE corpus scan: broadcast query set; per-query top-k planned as WindowGroupLimit — each task keeps ≤ k rows per query BEFORE the exchange (shuffle ≤ partitions × Q × k rows, never Q × N)",
    "gif_roundtrip_pixelsum": "single ArrowEvalPython stage over a doc_id-only scan (ReadSchema = doc_id) — GIF encode→decode→checksum is a pure per-row map, no shuffle before the presentation sort",
    "flac_roundtrip_samplesum": "single ArrowEvalPython stage over a doc_id-only scan — FLAC encode→decode→checksum through the compressed FIXED+Rice path is a pure per-row map, no shuffle before the presentation sort",
    "bm25_analyzed_topk": "analyzer + query-term filter BEFORE the (doc_id, term) exchange — only query-term posting rows shuffle; tf/df map-side combined; corpus constants broadcast; TakeOrderedAndProject(10)",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from pdf_parse_vector_db_spark.session import get_spark

    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out = [
        "# PLANS — executed physical plans of the flagship queries",
        "",
        f"Generated by tools/explain_audit.py at {os.path.basename(sf_dir)}; the",
        "properties called out per query are asserted in tests/test_plans.py.",
        "",
    ]
    for name, claim in AUDIT.items():
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name}", "", f"*Look for: {claim}*", "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(ROOT, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(AUDIT)} plans)")


if __name__ == "__main__":
    main()
