"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "triples_per_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is timed via a full materialization (count), which forces the
extraction UDFs and any shuffles without driver-side transfer overhead.
Scaling-efficiency numbers (N vs 4N cores) come from
tools/bench_scaling.py and are recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _cpu_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — lets the bench record
    hypervisor contention over ITS OWN window. This box is
    multi-tenant: measured steal ranges 0–19%, and a 15%-steal window
    roughly halves multi-core throughput, so a headline number without
    its steal context is not comparable across rounds."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return (vals[7] if len(vals) > 7 else 0, sum(vals))
    except OSError:
        return (0, 0)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    turns_per_doc = int(os.environ.get("SPARK_GRAFT_TURNS_PER_DOC", "64"))
    steal0, total0 = _cpu_ticks()

    from semargl_spark.spark_util import tuned_session

    spark = tuned_session(parallelism=cpus, app_name="semargl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from semargl_spark import queries as Q
    from semargl_spark.operators.extract import extract_statements, triples
    from semargl_spark.sources.transcripts import synth_transcripts

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name: str, make_df, runs: int = 2) -> None:
        # time construction + materialization: iterative operators
        # (connected components) do eager work while building the plan.
        # best-of-N: the first run of each distinct plan shape absorbs
        # JVM codegen/JIT compilation (~seconds) that a long-running
        # cluster job pays once; warm numbers are the steady state
        # (the reference benches warm up too, BenchmarkRdfa.java:86-92)
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            df = make_df() if callable(make_df) else make_df
            counts[name] = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # warm the JVM + the mapInPandas python-worker pool so per-query
    # numbers measure the pipeline, not interpreter startup (reference
    # benches also warm up, BenchmarkRdfa.java:86-92)
    triples(
        extract_statements(synth_transcripts(spark, sf_dir, turns_per_doc=1))
    ).count()

    # flagship: mixed-format corpus at bench turn multiplier; best of 3
    # (the first timed runs still absorb tail-end JIT/worker warmup, and
    # the headline number should not ride on one noisy sample)
    mixed = synth_transcripts(spark, sf_dir, turns_per_doc=turns_per_doc)
    timed("extract_mixed", lambda: triples(extract_statements(mixed)), runs=4)

    registry = Q.registry()
    for name in (
        "extract_ntriples",
        "extract_jsonld",
        "extract_rdfa",
        "extract_rdfxml",
        "extract_nquads",
        "extract_trig",
        "turn_ordering",
    ):
        if name in registry:
            try:
                timed(name, lambda n=name: registry[n](spark, sf_dir))
            except Exception:
                timings[name] = -1.0

    # priority block: the queries whose round-over-round trend we track
    # first (stable warm ordering); everything else in the registry is
    # folded in afterwards so the bench surface can never drift from the
    # correctness surface
    for name in ("entity_link", "canonicalize", "pipeline_kg", "kg_edges",
                 "dedup_minhash", "simhash", "ann_topk", "ann_ivf",
                 "ann_lsh", "quality_score", "fingerprint", "media_features",
                 "media_real_decode", "lang_id_ngram",
                 "vocab_expand", "render_turtle", "render_jsonld", "model_diff",
                 "pii_redact", "split_assign", "pack_sequences",
                 "contamination", "kg_bgp", "kg_pagerank", "kg_path", "kg_path_star", "kg_wl_colors", "kg_schema_summary", "kg_literal_stats",
                 "extract_turtle", "repetition_stats", "kmeans_assign",
                 "events_asof", "events_interval", "events_funnel", "corpus_mix", "quota_resample",
                 "quality_topk", "entity_link_fuzzy", "global_shuffle",
                 "dedup_incremental", "dedup_substring",
                 "boilerplate_windows", "corpus_quantiles", "kg_degree_stats",
                 "semdedup", "top_terms", "top_ngrams", "cooccurrence",
                 "kg_triangles", "kg_node_sim", "kg_bgp_optional",
                 "c4_filter", "lm_score", "turn_transitions",
                 "kg_label_prop", "kg_neg_samples", "kg_validate",
                 "embedding_project", "turn_latency",
                 "kg_rdfs_infer", "canonicalize_incremental",
                 "kg_modularity", "kg_neighbor_agg",
                 "kg_ppr", "kg_snapshot_diff", "kg_adjacency", "kg_random_walks", "kg_skipgram_pairs",
                 "transcripts_profile", "events_stream_sessions",
                 "pipeline_training", "text_search", "inverted_index",
                 "skew_salted_join", "bm25_search", "hybrid_search",
                 "events_retention", "kg_entity_card", "kg_sparql",
                 "kg_sparql_construct", "kg_sparql_path",
                 "kg_sparql_values", "kg_sparql_having",
                 "kg_sparql_graph", "kg_sparql_describe",
                 "kg_sparql_exists", "kg_sparql_bind",
                 "kg_sparql_subquery",
                 "kg_sparql_agg_filter", "kg_sparql_group_concat",
                 "kg_sparql_describe_where", "ppmi", "kg_sparql_update",
                 "knn_graph", "embedding_quantize", "quantized_topk", "knn_classify",
                 "semantic_clusters", "winnow",
                 "kg_sparql_seq", "kg_sparql_nps", "kg_sparql_path_zero",
                 "kg_hits", "kg_kcore", "agent_loops",
                 "dedup_survivors_quality", "kg_sparql_ask", "kg_reach_seeded", "kg_sparql_page", "kg_comention", "kg_sparql_optional_filter", "kg_sparql_neg_fail", "kg_sparql_agg_optional",
                 "weighted_sample", "ngram_novelty", "lang_id_confusion", "kg_entity_timeline",
                 "kg_edge_provenance", "stratified_sample", "segment_dedup",
                 "graph_stats", "kg_sparql_count_distinct", "pq_encode", "pq_search", "pq_ivf_search", "ann_recall", "kg_scc",
                 "bpe_train", "bpe_segment", "embedding_dim_recall",
                 "kg_list_members", "kg_cardinality_sketch",
                 "vocab_overlap_sketch", "kg_neighborhood_anf",
                 "token_freq_sketch", "stream_cardinality",
                 "kg_temporal_reach", "kg_asof_view",
                 "kg_owl_infer", "kg_sameas_fuse", "kg_truth_vote",
                 "wordpiece_train", "kg_quotient", "kg_pred_align",
                 "stream_heavy_hitters", "kg_weighted_path",
                 "dsir_select", "kg_harmonic",
                 "unigram_vocab", "unigram_segment",
                 "kg_link_predict", "kg_c14n", "kg_c14n_hash",
                 "stream_c14n_dedup", "conv_topic_shifts", "hamming_topk",
                 "chat_render", "preference_bt", "conv_near_dup",
                 "pipeline_sft", "kg_node2vec", "kg_link_ranking",
                 "pack_manifest", "kg_transitive_reduce",
                 "embedding_label_prop", "render_trig",
                 "transcripts_validate", "textrank_summary", "kg_ktruss", "stream_sft",
                 "events_allen", "embedding_drift", "kg_sparql_cbd",
                 "span_corruption", "fim_transform", "instruction_pairs",
                 "curriculum_order"):
        if name in registry:
            try:
                timed(name, lambda n=name: registry[n](spark, sf_dir))
            except Exception:
                timings[name] = -1.0

    # remainder sweep: every registry query not timed above, sorted for
    # a deterministic order. EXCLUDE documents the (currently empty)
    # escape hatch — a query may only be skipped with a recorded reason,
    # which lands in the JSON so BENCH_rN carries the full accounting.
    EXCLUDE: dict[str, str] = {}
    for name in sorted(registry):
        if name in timings or name in EXCLUDE:
            continue
        try:
            timed(name, lambda n=name: registry[n](spark, sf_dir))
        except Exception:
            timings[name] = -1.0

    total_triples = counts.get("extract_mixed", 0)
    wall = timings.get("extract_mixed", 1.0)
    tps = round(total_triples / wall, 1) if wall > 0 else 0.0

    # scheduler-noise-free streaming numbers (r4 verdict item 3): the
    # wall of an availableNow replay carries ~2× micro-batch scheduling
    # jitter across host windows; the summed per-batch triggerExecution
    # durations are the comparable work metric, reported side by side.
    from semargl_spark import queries_pipeline as QP

    stream_work = dict(sorted(QP.STREAM_WORK_SEC.items()))

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    steal1, total1 = _cpu_ticks()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / (total1 - total0), 2)
        if total1 > total0 else None
    )
    print(
        json.dumps(
            {
                "metric": "triples_per_sec",
                "value": tps,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "counts": counts,
                "cpus": cpus,
                "turns_per_doc": turns_per_doc,
                "host_steal_pct": steal_pct,
                "stream_work_sec": stream_work,
                "excluded": EXCLUDE,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
