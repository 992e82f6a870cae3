"""Operator/query registry.

Each operator module defines ``QUERIES: dict[name, (callable, oracle_sql)]``
where the callable is ``(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is
an equivalent DuckDB SQL string (or ``None`` for non-SQL-expressible ops —
the driver then records a weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect_registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Merge every operator module's QUERIES into (queries, oracles).

    Pure plan builders are wrapped in ``plan_cached`` (sources.tables):
    their DataFrame is deterministic in (session, sf_dir), so repeated
    invocation — bench reps, driver correctness + smoke passes — reuses
    one logical plan instead of re-paying hundreds of Py4J expression
    round-trips. Modules whose builders have construction-time side
    effects (sink writes, streaming runs, data-source registration) are
    excluded, as is the export query's side-effect writer.
    """
    from . import (curation, dedup, excision, graph, ingest, linear,
                   multimodal, outlier, relational, segmentation,
                   similarity, text, timeseries)
    from ..streaming import events as streaming_events
    from ..sources import cells as cells_src
    from ..sources import cells_binary as cells_bin
    from ..sources import cells_datasource as cells_ds
    from ..sources import sinks as sinks_src
    from ..sources.tables import plan_cached

    impure_modules = (streaming_events, sinks_src, cells_ds, cells_bin)
    # also impure by construction: text_udtf_chunk registers a UDTF +
    # temp view; ann_pq_topk collects the PQ codebook at build time —
    # leaving them unwrapped keeps bench reps honest about that cost
    # multimodal_png_roundtrip materializes per-image PNG files at
    # construction (mkdtemp + a collected write job) — plan-caching it
    # would silently skip that cost on repeat invocations
    # ann_incremental_assign / ann_ivf_trained_topk run the Lloyd's
    # codebook training (driver-looped collects) at construction —
    # plan-caching them would silently skip the training cost on bench
    # reps; the *_persisted variants amortize it BY DESIGN (write-once
    # artifacts), so they stay cached like dedup_incremental_persisted
    impure_names = {"multimodal_export", "multimodal_png_roundtrip",
                    "text_udtf_chunk",
                    "text_udtf_ngrams", "text_udtf_table_arg",
                    "ann_pq_topk", "ann_pq_refine", "ml_kmeans_lloyd",
                    "q69_sql_udf", "q71_skew_autosalt", "ann_recall_eval",
                    "ann_recall_sweep", "ann_trained_sweep", "ann_incremental_assign",
                    "ann_ivf_trained_topk",
                    "q72_session_variable"}

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (relational, outlier, dedup, similarity, linear, graph, text,
                curation, ingest, excision, timeseries, streaming_events,
                cells_src, segmentation, multimodal, sinks_src, cells_ds,
                cells_bin):
        for name, (fn, sql) in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name: {name}")
            if mod not in impure_modules and name not in impure_names:
                fn = plan_cached(fn)
            queries[name] = fn
            if sql is not None:
                oracles[name] = sql
    # Registry ORDER: the independent driver verifies the FIRST 50
    # entries (rows + schema + value hash vs DuckDB), so the front of
    # the dict must span every operator family — relational core,
    # dedup ladder, ANN, ML, graph, text/LM, curation, ingest,
    # timeseries, streaming, cells, multimodal, sinks — not just
    # q01..q50 (r9 verdict item 4). Names listed here jump to the
    # front in this order; everything else keeps module order behind
    # them. Name-keyed consumers (tests, bench, selfcheck) are
    # unaffected.
    front = [
        "q01_pricing_summary", "q02_filter_project", "q03_revenue_topn",
        "q04_order_priority", "q05_region_revenue", "q07_window_rank",
        "q16_asof_join", "q17_outlier_votes", "q24_percentiles",
        "q27_skew_salted_votes", "q49_lateral_topn", "q50_recursive_spine",
        "outlier_fit", "outlier_transform",
        "dedup_exact", "dedup_minhash_verified", "dedup_simhash",
        "dedup_incremental", "dedup_incremental_persisted",
        "dedup_recall_sweep",
        "ann_bruteforce_topk", "ann_ivf_topk", "ann_ivf_trained_topk",
        "ann_incremental_persisted", "ann_pq_topk", "embedding_neardup",
        "ml_gram_matrix", "ml_kmeans_lloyd", "ml_logreg_irls",
        "graph_pagerank", "graph_components",
        "text_token_stats", "lang_id", "text_bm25_search",
        "text_lm_perplexity", "lm_incremental_refresh",
        "curate_pipeline", "curate_decontaminate", "curate_pack_sequences",
        "ingest_gate_pipeline",
        "ts_hypertable_rollup", "ts_cusum_changepoint",
        "stream_hourly_by_type", "stream_dedup_against_index",
        "stream_ingest_pipeline", "stream_ingest_loop",
        "cells_features", "cells_blur_threshold",
        "multimodal_audio_vad", "sink_zorder_clustered",
    ]
    missing = [n for n in front if n not in queries]
    if missing:
        raise ValueError(f"front-of-registry names not found: {missing}")
    ordered = {n: queries[n] for n in front}
    ordered.update(queries)  # existing keys keep their front position
    return ordered, oracles
