"""Workload entries: streaming ingest + multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spj_query_engine_spark.catalog import load_tables
from spj_query_engine_spark.operators import multimodal, sampling, temporal
from spj_query_engine_spark.streaming import ingest, stateful
from spj_query_engine_spark.workload.registry import register


@register(
    "e05_streaming_rollup",
    temporal.tumbling_rollup_sql(),
    doc="Structured Streaming tumbling rollup (readStream parquet → "
    "watermark+window agg → memory sink, driven to completion); oracle = the "
    "batch rollup SQL, proving stream/batch semantic equality.",
)
def e05_streaming_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ingest.run_streaming_rollup(spark, sf_dir)


def _mm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return multimodal.attach_payload(docs)


@register(
    "m01_decode_features",
    multimodal.decode_features_wide_sql(),
    doc="Multimodal decode + feature extraction: binary payload column → "
    "Arrow-batched mapInPandas → 8-dim features (decoder stubbed "
    "deterministically; plumbing real and oracle-verified). Gate shape "
    "flattens the feature vector to scalar columns — the driver's pandas "
    "canonicalizer cannot sort array cells (CORRECTNESS_r02 m01 err).",
)
def m01_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.decode_features_wide(_mm(spark, sf_dir))


@register(
    "m02_frame_sample",
    multimodal.frame_sample_sql(),
    doc="Frame sampling: payload byte stream → %s contiguous chunks → "
    "per-frame fingerprint via mapInPandas (codec stubbed to md5)."
    % multimodal.FRAME_COUNT,
)
def m02_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.frame_sample(_mm(spark, sf_dir))


@register(
    "e06_stream_sessionize",
    temporal.sessionize_sql(),
    doc="Custom stateful streaming operator: sessionization via "
    "applyInPandasWithState (open-session tail per user carried across "
    "micro-batches, O(active users) state); oracle = the batch sessionize "
    "SQL — stream/batch equality on finite replay.",
)
def e06_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.streaming.stateful import run_stateful_sessionize

    return run_stateful_sessionize(spark, sf_dir)


@register(
    "m03_resize",
    multimodal.resize_payload_sql(),
    doc="Multimodal resize: nearest-neighbor byte-stream resample to %s "
    "bytes via Arrow-batched mapInPandas (codec stubbed, plumbing real); "
    "refreshed payload + metadata chain downstream." % multimodal.RESIZE_TARGET,
)
def m03_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.resize_payload(_mm(spark, sf_dir))


@register(
    "m04_audio_windows",
    multimodal.audio_windows_sql(),
    doc="Audio-shaped analysis: payload bytes as PCM samples → overlapping "
    "(win=%s, hop=%s) windows → per-window energy + peak via mapInPandas; "
    "variable fan-out (one row → ceil(n/hop) rows), codec stubbed."
    % (multimodal.AUDIO_WIN, multimodal.AUDIO_HOP),
)
def m04_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.audio_windows(_mm(spark, sf_dir))


@register(
    "e07_stream_dedup",
    "SELECT DISTINCT event_id FROM events",
    doc="Streaming exact dedup (dropDuplicates keyed state on a stream); "
    "finite replay equals batch DISTINCT — the oracle.",
)
def e07_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ingest.run_streaming_dedup(spark, sf_dir)


@register(
    "p01_train_split",
    sampling.train_split_sql(),
    doc="Deterministic 80/10/10 train/val/test split by portable hash bucket "
    "of the row key — reproducible across engines and cluster layouts; pure "
    "projection, no shuffle.",
)
def p01_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.sampling import train_split

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return train_split(docs)


@register(
    "e10_stream_asof",
    temporal.asof_join_sql(),
    doc="Streaming AS-OF join, stream-static: default path is foreachBatch "
    "+ the JVM batch LOCF as-of against the static order side (no custom "
    "state - each micro-batch's enrichment is a pure function of the "
    "dimension, whole-stage codegen end to end); spj.stream.asof.api=apws "
    "selects the two-stream applyInPandasWithState union fold "
    "(last-order-per-user carried in state) for when orders also arrive "
    "incrementally. Both paths' finite replay equals the batch as-of join "
    "- the oracle.",
)
def e10_stream_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.streaming.stateful import run_stateful_asof

    return run_stateful_asof(spark, sf_dir)


@register(
    "p02_stratified_sample",
    sampling.stratified_sample_sql(),
    doc="Deterministic 10% stratified sample: hash salted with the stratum "
    "(lang), so per-stratum kept sets are independent; pure projection + "
    "filter, reproducible on any cluster layout.",
)
def p02_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.sampling import stratified_sample

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return stratified_sample(docs)


@register(
    "p03_mixture_sample",
    sampling.mixture_sample_sql(),
    doc="Weighted source-mixture sample (data-mixing recipe: 100/50/50/25% "
    "named tiers, 10% long tail) by salted portable hash; raising a rate "
    "strictly grows the kept set.  Pure projection + filter.",
)
def p03_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.sampling import mixture_sample

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return mixture_sample(docs)


@register(
    "e13_stream_session",
    temporal.native_sessionize_sql(),
    doc="Streaming sessionization via the native session_window aggregate "
    "(state-store-merged gap intervals across micro-batches); finite replay "
    "in complete mode equals the batch native_sessionize — the oracle.",
)
def e13_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ingest.run_streaming_session(spark, sf_dir)


@register(
    "p04_uniform_k_sample",
    sampling.uniform_k_sample_sql(),
    doc="Exactly-k uniform sample as a bottom-k sketch over a salted "
    "portable hash — reservoir sampling's result without sequential state; "
    "executes as TakeOrderedAndProject (per-partition top-k + merge, no "
    "global sort).",
)
def p04_uniform_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.sampling import uniform_k_sample

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return uniform_k_sample(docs)


@register(
    "m05_modality_lake",
    multimodal.modality_lake_stats_sql(),
    doc="Modality-partitioned multimodal lake: partitionBy(modality) write, "
    "then a single-modality read-back whose filter prunes partitions at "
    "planning time (PartitionFilters in the scan — asserted in plan "
    "hygiene); aggregate = asset count + byte volume of the pruned scan.",
    bench=False,  # dominated by the write, not scan throughput
)
def m05_modality_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.modality_lake_stats(spark, _mm(spark, sf_dir))


@register(
    "p05_pack_sequences",
    sampling.pack_sequences_sql(),
    doc="Deterministic sequence packing (LLM-pretraining concat-and-chunk): "
    "docs hash into %s independent packing streams, window cumsum assigns "
    "each doc its %s-token chunk span — parallelism scales with the stream "
    "count, no global sequence."
    % (
        sampling.PACK_BUCKETS,
        sampling.PACK_CTX,
    ),
)
def p05_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.sampling import pack_sequences

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return pack_sequences(docs)


@register(
    "e15_stream_upsert",
    """
    SELECT user_id,
           event_id AS last_event_id,
           epoch_us(ts) AS last_ts_us,
           value::DOUBLE AS last_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Streaming upsert sink (foreachBatch): per-batch latest-per-user "
    "rows append to a keyed target (log-structured merge), merge-on-read "
    "compacts to the latest per key; latest-per-key is associative, so "
    "finite replay equals the batch latest-event-per-user query - the "
    "oracle.",
)
def e15_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ingest.run_stream_upsert(spark, sf_dir)


@register(
    "e16_stream_stream_join",
    ingest.stream_stream_join_sql(),
    doc="Stream-stream inner join (purchase x preceding click within %s "
    "min, same user): both sides watermarked, time-range condition bounds "
    "the join state; inner joins are monotone so finite replay equals the "
    "batch join - the oracle." % ingest.STREAM_JOIN_MINUTES,
    bench=False,  # micro-batch replay overhead dominates; e04 is the throughput twin
)
def e16_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ingest.run_stream_stream_join(spark, sf_dir)


@register(
    "p06_overlap_chunks",
    sampling.overlap_chunks_sql(),
    doc="RAG chunking: overlapping %d-token windows every %d tokens "
    "(p05's retrieval twin - overlap so no answer span straddles a cut "
    "unseen); one digest row per chunk, pure projection fan-out, zero "
    "shuffles." % (sampling.RAG_CHUNK, sampling.RAG_STRIDE),
)
def p06_overlap_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.overlap_chunks(docs)


@register(
    "p07_leakage_safe_split",
    sampling.leakage_safe_split_sql(),
    doc="Leakage-safe train/val/test split: the split key is the MinHash "
    "near-dup CLUSTER id (d02 pairs -> d07 components; singletons key on "
    "themselves) so both sides of every near-dup pair land in the same "
    "split by construction - the held-out-set contamination guard p01's "
    "independent per-doc hash cannot give; the cluster frame is small and "
    "the split stays a hash projection.",
)
def p07_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.core import coarse_materialize

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # pair derivation + the cc_alternating fixpoint loop (many short
    # join/agg/checkpoint stages) materialize under the graph family's
    # coarse scope — a no-op at scale via the optimizer-estimate clamp
    return coarse_materialize(sampling.leakage_safe_split, docs)


@register(
    "e24_stream_enrich",
    """
    SELECT e.event_id, e.user_id, e.event_type,
           CAST(COALESCE(d.n_orders, 0) AS BIGINT) AS n_orders,
           COALESCE(d.lifetime_spend, 0.0) AS lifetime_spend
    FROM events e
    LEFT JOIN (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lifetime_spend
      FROM orders GROUP BY o_custkey
    ) d ON d.o_custkey = e.user_id
    """,
    doc="Stream-STATIC enrichment: the event stream broadcast-joins a "
    "batch per-user dimension (order count + decimal lifetime spend) in "
    "every micro-batch - the production feature-enricher shape with ZERO "
    "streaming state; finite replay equals the batch left join, the "
    "oracle.",
)
def e24_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ingest.run_streaming_enrich(spark, sf_dir)


@register(
    "m06_payload_dedup",
    multimodal.payload_dedup_sql(),
    doc="Binary-payload exact dedup: assets grouped by md5 of the RAW "
    "bytes (the multimodal twin of text-path d01) - the storage-level "
    "dedup an asset lake runs before any decode; digests are a "
    "projection, the rollup shuffles 16-byte keys, never payloads.",
)
def m06_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.payload_dedup(_mm(spark, sf_dir))


@register(
    "e27_stream_sliding",
    temporal.sliding_rollup_sql(),
    doc="Streaming SLIDING-window rollup: watermark + overlapping window "
    "state (each event updates width/step window states in the store - "
    "the strictly harder bookkeeping e05's tumbling case avoids); finite "
    "replay in complete mode equals the batch sliding rollup, the "
    "oracle.",
)
def e27_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ingest.run_streaming_sliding(spark, sf_dir)


@register(
    "m07_frame_dup_pairs",
    multimodal.frame_dup_pairs_sql(),
    doc="Perceptual near-dup pairs for video-like assets: >= %d sampled "
    "frames sharing a fingerprint at the same position (keyframe-overlap "
    "dedup, codec+pHash stubbed to chunk-md5) - inverted index on "
    "(frame_no, fp) with a %d-asset boilerplate cap, payloads never "
    "enter the join." % (multimodal.FRAME_DUP_MIN_SHARED, multimodal.FRAME_DF_CAP),
)
def m07_frame_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.frame_dup_pairs(_mm(spark, sf_dir))


@register(
    "e31_stream_cdc",
    temporal.cdc_apply_sql(),
    doc="Streaming CDC apply (foreachBatch): e15's upsert sink plus DELETE "
    "tombstones that outlive their batch - merge-on-read takes the latest "
    "fragment per key, then drops tombstone winners; latest-op-per-key is "
    "associative, so finite replay equals the batch cdc_apply (e30), the "
    "oracle.",
)
def e31_stream_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ingest.run_stream_cdc(spark, sf_dir)


@register(
    "p08_temperature_sample",
    sampling.temperature_sample_sql(),
    doc="Temperature-scaled mixture sample (tau=0.5): per-source keep rates "
    "derived from the corpus's own counts (share ~ sqrt(n_s)), applied as "
    "a ppm-quantized portable-hash filter.  The rate table is one tiny "
    "broadcast aggregate; the corpus itself never shuffles.  sqrt is "
    "IEEE-exact in both engines; the across-source total rides DECIMAL so "
    "the rates are order-independent.",
)
def p08_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.temperature_sample(docs)


@register(
    "p09_curriculum_order",
    sampling.curriculum_order_sql(),
    doc="Curriculum ordering: difficulty band from the 4-place-rounded "
    "quality score + salted-hash shuffle key within each band.  Emits "
    "SORT KEYS, never a global row_number - the write-time range "
    "partitioner materializes the total order distributedly.",
)
def p09_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.curriculum_order(docs)


@register(
    "p10_snapshot_diff",
    sampling.orders_snapshot_diff_sql(),
    doc="Snapshot diff: each side collapses to (key, md5 digest of compared "
    "columns) BEFORE a full-outer join, so version comparison shuffles "
    "16-byte digests, never rows; output is the added/removed/changed "
    "key list an incremental recompute feeds on.  Floats stringify via "
    "DECIMAL so digests match across engines.",
)
def p10_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return sampling.orders_snapshot_diff(orders)


@register(
    "p11_export_manifest",
    sampling.export_manifest_sql(),
    doc="Per-stream export manifest over the p05 packing: doc/token/chunk "
    "counts + an order-sensitive md5 of member ids - the completeness "
    "receipt a data release ships; one bucket-bounded rollup, digest "
    "folds an explicitly sorted id list so any layout reproduces it.",
)
def p11_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.export_manifest(docs)


from spj_query_engine_spark.sources.pydatasource import detrange_rollup_sql
from spj_query_engine_spark.sources import pydatasource


@register(
    "u05_python_datasource",
    detrange_rollup_sql(),
    doc="Spark 4 custom Python DataSource (pyspark.sql.datasource): driver "
    "plans InputPartition splits, executors iterate them in parallel, rows "
    "enter the plan as a normal scan - the Spark-native generalization of "
    "the reference's single-process ConvertTxtToTbl; the deterministic "
    "hash table replays exactly in SQL.",
)
def u05_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.sources.pydatasource import detrange_rollup

    return detrange_rollup(spark)


@register(
    "m08_integrity_audit",
    multimodal.integrity_audit_sql(),
    doc="Asset-lake integrity audit: size + content hash re-derived from "
    "payload BYTES vs stored metadata (stale metadata / truncation / "
    "bit-rot catch before a training export); deterministic stale-size "
    "plant on doc_id %% %d == 0 proves the audit flags exactly the bad "
    "records.  Pure projection + filter - scan-speed, no shuffle until "
    "the tiny flagged set." % multimodal.TAMPER_MOD,
)
def m08_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.integrity_audit(_mm(spark, sf_dir))


@register(
    "p12_data_card",
    sampling.data_card_sql(),
    doc="Per-source DATA CARD (Datasheets for Datasets): doc/token totals, "
    "language inventory, dominant language + share, mean/median length - "
    "one corpus rollup on (source, lang) with catalog-bounded windows on "
    "top; shares divide exact BIGINTs, median documented to swap to "
    "approx_percentile at 100 TB.",
)
def p12_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.data_card(docs)


@register(
    "p13_balanced_sample",
    sampling.balanced_sample_sql(),
    doc="Exact-k balanced sample: exactly %d rows per language by salted "
    "portable-hash rank - the equal-representation eval set p02's "
    "binomial keep-rate cannot give; one window per stratum partition, "
    "under-full strata keep everything." % sampling.BALANCED_K,
)
def p13_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.balanced_sample(docs)


@register(
    "m09_format_sniff",
    multimodal.format_sniff_audit_sql(),
    doc="Content-type sniffing audit (m08's sibling): real format from the "
    "payload's MAGIC NUMBER vs declared mime - the mislabeled-asset "
    "quarantine at ingest; deterministic PNG-header plant on doc_id %% %d "
    "== 0 proves the audit flags exactly the bad rows; 8-byte prefix "
    "compare per row, no shuffle until the flagged set."
    % multimodal.SNIFF_MOD,
)
def m09_format_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.format_sniff_audit(_mm(spark, sf_dir))


@register(
    "p14_e2e_pipeline",
    sampling.e2e_pipeline_sql(),
    doc="The WHOLE curation chain as one declarative plan: quality >= "
    "corpus median -> exact-dedup min-id survivors -> hash split -> "
    "per-split doc/token manifest - Catalyst pipelines the projections "
    "and shares the one real shuffle; each stage is individually "
    "oracle-proven elsewhere (t02/t11, d01, p01, p11), this proves "
    "the composition.",
)
def p14_e2e_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.e2e_pipeline(docs)


@register(
    "p15_dsir_selection",
    sampling.dsir_selection_sql(),
    doc="DSIR importance selection (Xie et al. 2023): hashed-unigram "
    "importance weights score every doc by target-likeness (target = the "
    "'en' slice), top-20% selected, per-language census reported - the "
    "weight table is O(512) rows broadcast everywhere, integer-exact "
    "ratios per the t12/t21 discipline; self-check: the target language "
    "posts the highest mean weight.",
)
def p15_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.dsir_selection(docs)


@register(
    "p16_interleave_sources",
    sampling.interleave_sources_sql(),
    doc="Source-interleaved training order: deterministic round-robin "
    "position + %d-way shard stripe per document - p03/p15 choose WHAT "
    "to train on, this fixes the ORDER so no batch is a homogeneous "
    "run of one source; one per-source rank window + the honest global "
    "ordering window (or range-partitioned sort at 100 TB, documented)."
    % sampling.INTERLEAVE_SHARDS,
)
def p16_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.interleave_sources(docs)


@register(
    "m10_cdc_chunking",
    multimodal.cdc_chunks_sql(),
    doc="Content-defined chunking (LBFS/rsync boundary rule): payload split "
    "where the %d-byte rolling hash hits 0 mod %d, so boundaries move "
    "WITH the content and an insert invalidates one chunk, not every "
    "block after it (d13's fixed blocks shift-break); per-chunk "
    "fingerprint + corpus-wide copy count.  Byte loop is Arrow-batched "
    "mapInPandas with a vectorized numpy fold; census shuffles digests "
    "only." % (multimodal.CDC_W, multimodal.CDC_D),
)
def m10_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.cdc_chunks(_mm(spark, sf_dir))


from spj_query_engine_spark.sources.pydatasource import (
    sink_roundtrip_rollup,
    sink_roundtrip_rollup_sql,
)


@register(
    "u08_python_sink",
    sink_roundtrip_rollup_sql(),
    doc="Custom Python DataSource WRITER (Spark 4 DataSourceWriter): tasks "
    "write partition-parallel JSONL files through the jsonlsink format "
    "and the rollup of the read-back equals the source table - the sink "
    "half of u05's extension surface, proving the full custom-format "
    "round trip a real connector (queue, REST, proprietary format) "
    "implements.",
    bench=False,  # dominated by local file IO, not engine throughput
)
def u08_python_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sink_roundtrip_rollup(spark, docs)


@register(
    "m11_shot_boundaries",
    multimodal.shot_boundaries_sql(),
    doc="Shot-boundary detection (frame-difference cuts): %d byte-range "
    "frames per payload, exact integer intensity profile per frame, cut "
    "where |delta mean_ppm| exceeds %d - the scene segmentation step "
    "video curation keys on; Arrow-batched frame stats + ONE per-doc lag "
    "window, decode slot stubbed to byte values."
    % (multimodal.SHOT_FRAMES, multimodal.SHOT_DELTA_PPM),
)
def m11_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.shot_boundaries(_mm(spark, sf_dir))


@register(
    "p17_token_budget_pack",
    sampling.token_budget_pack_sql(),
    doc="Token-BUDGET selection: walk the corpus in quality order and keep "
    "docs until the running token total fills %d%% of the corpus - the "
    "budgeted form of quality filtering (p14 cuts at a score threshold; "
    "a training run's real constraint is a token count).  One corpus "
    "projection + broadcast total + ONE ordered cumulative window "
    "(range-partitioned sort at 100 TB)." % sampling.BUDGET_PCT,
)
def p17_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.token_budget_pack(docs)


@register(
    "m12_active_segments",
    multimodal.active_segments_sql(),
    doc="Active-segment extraction (VAD / silence-trim shape): m04's "
    "energy windows flagged active when per-sample energy beats the "
    "payload's own average (cross-multiplied BIGINT, no ratio float), "
    "consecutive actives merged by gaps-and-islands - audio curation "
    "cuts on exactly these segments; per-doc windows only, never "
    "corpus-wide.",
)
def m12_active_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.active_segments(_mm(spark, sf_dir))


@register(
    "p18_epoch_orders",
    sampling.epoch_orders_sql(),
    doc="Per-epoch training order: each epoch is a fresh deterministic "
    "shuffle (portable hash salted by epoch), both positions + rank "
    "displacement per doc so decorrelation is MEASURED (uniform "
    "permutations displace ~n/3 on average; a broken salt shows 0) - "
    "one rank window per epoch, positions meet via conditional "
    "aggregation, no self-join.",
)
def p18_epoch_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.epoch_orders(docs)


@register(
    "p19_balanced_shards",
    sampling.balanced_shards_sql(),
    doc="Work-balanced shard assignment: docs ranked by token count dealt "
    "to %d shards in SNAKE order (the greedy near-equal-mass bound, no "
    "iterative bin-packer), emitting per-shard doc count, token mass "
    "and ppm share - the pre-flight audit before per-shard "
    "tokenization/training jobs that must finish together; one global "
    "size-rank window over per-DOC rows + pure integer projections."
    % sampling.N_SHARDS,
)
def p19_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.balanced_shards(docs)


@register(
    "m13_ahash_pairs",
    multimodal.ahash_pairs_sql(),
    doc="Perceptual average-hash near-dup pairs: %d-bit aHash per asset "
    "(samples thresholded at the asset's own mean - survives monotone "
    "brightness-style shifts where m07's chunk-md5 needs exact bytes) "
    "computed at the Arrow decode boundary, banded %d x %d-bit candidate "
    "join with a boilerplate-band DF cap, verified by one "
    "bit_count(xor) per candidate; payloads never join."
    % (multimodal.AHASH_BITS, multimodal.AHASH_BANDS, multimodal.AHASH_BAND_BITS),
)
def m13_ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.ahash_pairs(_mm(spark, sf_dir))


@register(
    "u09_stream_python_source",
    pydatasource.detstream_rollup_sql(),
    doc="Streaming Python DataSource (Spark 4 SimpleDataSourceStreamReader): "
    "row-position offsets, bounded micro-batches, offset-range replay for "
    "exactly-once restart - the queue/CDC connector contract; the same "
    "deterministic table as u05 arrives across ~5 micro-batches and a "
    "stateful complete-mode aggregate must converge to the batch answer.",
    bench=False,  # micro-batch fixed cost, not engine throughput
)
def u09_stream_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pydatasource.detstream_rollup(spark)


@register(
    "m14_pair_alignment",
    multimodal.pair_alignment_sql(),
    doc="Cross-modal alignment audit: FULL OUTER join of the text corpus "
    "and the embedding store on id -> paired / text-only / "
    "embedding-only with ppm shares - the pre-flight integrity check "
    "every contrastive pair loader silently assumes (text-only share = "
    "the re-embedding backlog); both sides reduce to ID-ONLY frames, "
    "payloads and vectors never shuffle.",
)
def m14_pair_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents", "embeddings"))
    return multimodal.pair_alignment(t["documents"], t["embeddings"])


@register(
    "p20_source_quality_mix",
    sampling.source_quality_mix_sql(),
    doc="Source x quality-band mix: docs and token mass per (source, t02 "
    "quality band) with ppm shares WITHIN each source - turns the "
    "per-doc score into a mixture decision (which sources earn their "
    "p03 weight with high-quality mass); band edges compare the 4dp "
    "floor-rounded score both engines compute bit-identically, so no "
    "boundary doc can band-flip.",
)
def p20_source_quality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.source_quality_mix(docs)


@register(
    "p21_rendezvous_shards",
    sampling.rendezvous_shards_sql(),
    doc="Rendezvous (highest-random-weight) shard assignment + reshard "
    "audit: each doc lands on the argmax of %s portable integer "
    "(doc, shard) hashes; adding a shard moves ONLY docs whose new argmax "
    "IS the new shard (~1/(n+1) of the corpus, vs ~all under mod-N) - "
    "per-shard doc count, movers, moved ppm." % sampling.RDV_SHARDS,
)
def p21_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.rendezvous_shards(docs)


@register(
    "p22_source_cap",
    sampling.source_cap_sql(),
    doc="Per-source quality-ranked cap (C4/RefinedWeb domain capping): "
    "keep the %d best-quality docs per source, deterministic doc_id "
    "tie-break - NOT a row_number window over the corpus: salted "
    "two-level top-K (bounded state at every step, SALT x parallelism "
    "on hot sources) extracts each source's admission cutoff, which "
    "broadcasts back for a one-compare-per-row keep decision."
    % sampling.SOURCE_CAP_K,
)
def p22_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sampling.source_cap(docs)


@register(
    "u10_foreach_batch_sink",
    stateful.tws_running_totals_sql(),
    doc="foreachBatch IDEMPOTENT sink: update-mode per-user totals land in "
    "batch-id-keyed overwrite directories (a retried batch replaces its "
    "own attempt - Spark replays foreachBatch with the same batchId on "
    "recovery) and the read side reconciles MERGE-style on max batch id "
    "per key - the exactly-once pattern for JDBC/object-store targets "
    "with no transactional writer; finite replay reconciles to the batch "
    "rollup (e32's integer-cents fold).",
    bench=False,  # micro-batch + scratch-dir fixed cost, not throughput
)
def u10_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.streaming.ingest import foreach_batch_totals

    return foreach_batch_totals(spark, sf_dir)
