package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  // SQL fragments mirroring operators.Relational's exact-decimal money
  // arithmetic (see Scaladoc there: double sums are order-dependent in
  // the last ulp and flip round-half cells between engines).
  private val DISC_PRICE =
    "CAST(l_extendedprice AS DECIMAL(12,2))*(CAST(1 AS DECIMAL(3,2))-CAST(l_discount AS DECIMAL(4,2)))"
  private val CHARGE =
    s"$DISC_PRICE*(CAST(1 AS DECIMAL(3,2))+CAST(l_tax AS DECIMAL(4,2)))"
  private def m2(expr: String): String = s"CAST(round(sum($expr),2) AS DOUBLE)"
  private def avg4(col: String): String =
    s"round(CAST(sum(CAST($col AS DECIMAL(12,2))) AS DOUBLE)/count(*),4)"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"        -> (Relational.q1Agg _),
    "q2_join_agg"   -> (Relational.q2JoinAgg _),
    "q3_topn"       -> (Relational.q3TopN _),
    "q4_exists"     -> (Relational.q4Exists _),
    "q5_antijoin"   -> (Relational.q5AntiJoin _),
    "q6_selective"  -> (Relational.q6Selective _),
    "q7_window"     -> (Relational.q7Window _),
    "q8_rollup"     -> (Relational.q8Rollup _),
    "q13_pivot"           -> (Relational.q13Pivot _),
    "q14_setops"          -> (Relational.q14SetOps _),
    "q15_topn_per_group"  -> (Relational.q15TopNPerGroup _),
    "q16_scalar_subquery" -> (Relational.q16ScalarSubquery _),
    "q17_conditional_agg" -> (Relational.q17ConditionalAgg _),
    "text_word_freq"      -> (TextAnalysis.wordFreq _),
    "text_tfidf"          -> (TextAnalysis.tfidf _),
    "text_bm25"           -> ((s: SparkSession, d: String) => TextAnalysis.bm25(s, d)),
    "emb_centroids"       -> (Similarity.embCentroids _),
    "q9_asof"          -> (Temporal.q9AsOf _),
    "q10_range_join"   -> (Temporal.q10RangeJoin _),
    "q11_grouping_sets" -> (Temporal.q11GroupingSets _),
    "q12_percentile_join" -> (Temporal.q12PercentileJoin _),
    "q19_moving_avg"   -> (Temporal.q19MovingAvg _),
    "q22_window_suite" -> (Temporal.q22WindowSuite _),
    "q20_topk_custom"  -> (Relational.q20TopKCustom _),
    "q21_correlated_agg" -> (Relational.q21CorrelatedAgg _),
    "emb_kmeans"       -> ((s: SparkSession, d: String) => Clustering.kmeansAssign(s, d)),
    "logs_recent"              -> ((s: SparkSession, d: String) => LogAnalytics.recent(s, d)),
    "logs_severity_by_service" -> (LogAnalytics.severityByService _),
    "logs_timeseries"          -> ((s: SparkSession, d: String) => LogAnalytics.timeseries(s, d)),
    "logs_timeseries_5m"       -> ((s: SparkSession, d: String) =>
                                     LogAnalytics.timeseries(s, d, "5 minutes")),
    "logs_severity_number"     -> ((s: SparkSession, d: String) => LogAnalytics.severityNumber(s, d)),
    "logs_trace_lookup"        -> ((s: SparkSession, d: String) => LogAnalytics.traceLookup(s, d)),
    "trace_spans"              -> ((s: SparkSession, d: String) => TraceAnalytics.traceSpans(s, d)),
    "trace_service_graph"      -> (TraceAnalytics.serviceGraph _),
    "trace_summary"            -> (TraceAnalytics.traceSummary _),
    "trace_critical_path"      -> (TraceAnalytics.criticalPath _),
    "trace_latency"            -> (TraceAnalytics.latencyByService _),
    "trace_logs"               -> (TraceAnalytics.traceLogs _),
    "trace_tail_sample"        -> ((s: SparkSession, d: String) => TraceAnalytics.tailSample(s, d)),
    "trace_self_time"          -> (TraceAnalytics.selfTime _),
    "trace_lake_spans"         -> ((s: SparkSession, d: String) => TraceAnalytics.lakeTraceSpans(s, d)),
    "trace_span_events"        -> (TraceAnalytics.lakeSpanEvents _),
    "trace_span_links"         -> (TraceAnalytics.lakeSpanLinks _),
    "metrics_rate"             -> (MetricAnalytics.rate _),
    "metrics_exemplars"        -> (MetricAnalytics.exemplars _),
    "metrics_otlp_proto"       -> (MetricAnalytics.otlpProtoRoundtrip _),
    "metrics_exp_p95"          -> ((s: SparkSession, d: String) => MetricAnalytics.expQuantile(s, d)),
    "metrics_lake_rate"        -> (MetricAnalytics.lakeRate _),
    "metrics_lake_exemplars"   -> (MetricAnalytics.lakeExemplars _),
    "metrics_lake_gauge"       -> (MetricAnalytics.lakeGauge _),
    "metrics_lake_hist_p95"    -> (MetricAnalytics.lakeHistP95 _),
    "metrics_lake_summary"     -> (MetricAnalytics.lakeSummary _),
    "trace_otlp_proto"         -> (TraceAnalytics.otlpProtoRoundtrip _),
    "trace_lake_latency"       -> (TraceAnalytics.lakeLatency _),
    "trace_lake_graph"         -> (TraceAnalytics.lakeServiceGraph _),
    "trace_lake_summary"       -> (TraceAnalytics.lakeSummary _),
    "trace_lake_tail"          -> (TraceAnalytics.lakeTailSample _),
    "trace_lake_self"          -> (TraceAnalytics.lakeSelfTime _),
    "trace_lake_critical"      -> (TraceAnalytics.lakeCriticalPath _),
    "metrics_gauge"            -> (MetricAnalytics.gauge _),
    "metrics_histogram"        -> (MetricAnalytics.histogram _),
    "metrics_hist_p95"         -> ((s: SparkSession, d: String) => MetricAnalytics.histogramQuantile(s, d)),
    "lake_severity_by_service" -> (LakeAnalytics.severityByService _),
    "lake_iceberg"        -> (LakeAnalytics.icebergSeverity _),
    "lake_iceberg_inc"    -> (LakeAnalytics.icebergIncSeverity _),
    "lake_iceberg_ext"    -> (LakeAnalytics.icebergExternalRegions _),
    "lake_iceberg_day"    -> (LakeAnalytics.icebergExternalDays _),
    "lake_iceberg_dml"    -> (LakeAnalytics.morSeverity _),
    "lake_iceberg_merge"  -> (LakeAnalytics.mergeMorSeverity _),
    "lake_iceberg_eqdml"  -> (LakeAnalytics.eqMorSeverity _),
    "lake_cdc_apply"      -> (LakeAnalytics.cdcApplySeverity _),
    "lake_evolve"         -> (LakeAnalytics.evolveSeverity _),
    "lake_evolve_stats"   -> (LakeAnalytics.evolveStatsSeverity _),
    "lake_evolve_layout"  -> (LakeAnalytics.evolveLayoutSeverity _),
    "lake_travel_schema"  -> (LakeAnalytics.travelSchemaSeverity _),
    "lake_spec_evolve"    -> (LakeAnalytics.specEvolveSeverity _),
    "lake_native_specs"   -> (LakeAnalytics.specEvolveNativeSeverity _),
    "lake_retention"      -> (LakeAnalytics.retentionSeverity _),
    "lake_iceberg_mor"    -> (LakeAnalytics.icebergMorRegions _),
    "lake_iceberg_rest"   -> (LakeAnalytics.icebergRestSeverity _),
    "lake_iceberg_tt"     -> (LakeAnalytics.icebergTimeTravel _),
    "lake_timeseries"          -> (LakeAnalytics.timeseries _),
    "logs_search"              -> ((s: SparkSession, d: String) => LogAnalytics.search(s, d)),
    "logs_json_attrs"          -> (LogAnalytics.jsonAttrs _),
    "logs_error_rate"          -> (LogAnalytics.errorRate _),
    "logs_p95_value"           -> (LogAnalytics.p95Value _),
    "logs_sessionize"          -> (LogAnalytics.sessionize _),
    "logs_topk_users"          -> (LogAnalytics.topkUsers _),
    "logs_dau"                 -> (LogAnalytics.dau _),
    "logs_exemplars"           -> ((s: SparkSession, d: String) => LogAnalytics.exemplars(s, d)),
    "logs_approx_dau"          -> (LogAnalytics.approxDau _),
    "logs_otlp_roundtrip"      -> (LogAnalytics.otlpRoundtrip _),
    "logs_otlp_proto"          -> (LogAnalytics.otlpProtoRoundtrip _),
    "logs_p95_approx"          -> (LogAnalytics.approxP95 _),
    "logs_sample"              -> (LogAnalytics.sample _),
    "q18_salted_agg"           -> ((s: SparkSession, d: String) => Skew.saltedEventAgg(s, d)),
    "mm_pipeline"              -> (Multimodal.pipeline _),
    "text_tokens"         -> (TextAnalysis.tokens _),
    "text_stats"          -> (TextAnalysis.stats _),
    "text_langid"         -> (TextAnalysis.langId _),
    "text_fingerprint"    -> (TextAnalysis.fingerprint _),
    "text_entropy"        -> (TextAnalysis.entropy _),
    "dedup_exact"         -> (Dedup.exact _),
    "dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.ngramJaccard(s, d)),
    "dedup_minhash"       -> (Dedup.minhash _),
    "dedup_simhash"       -> (Dedup.simhash _),
    "dedup_embedding"     -> ((s: SparkSession, d: String) => Dedup.embeddingPairs(s, d)),
    "dedup_semantic"      -> ((s: SparkSession, d: String) => Dedup.semantic(s, d)),
    "ann_topk"            -> ((s: SparkSession, d: String) => Similarity.annTopk(s, d)),
    "ann_lsh"             -> ((s: SparkSession, d: String) => Similarity.annLsh(s, d)),
    "ann_ivf"             -> ((s: SparkSession, d: String) => Similarity.annIvf(s, d)),
    "corpus_curate"       -> ((s: SparkSession, d: String) => Curation.curate(s, d)),
    "sample_per_group"    -> ((s: SparkSession, d: String) => Curation.samplePerGroup(s, d)),
    "contamination"       -> ((s: SparkSession, d: String) => Curation.contamination(s, d)),
    "dedup_clusters"      -> ((s: SparkSession, d: String) => Curation.dedupClusters(s, d)),
    "dedup_rank"          -> ((s: SparkSession, d: String) => Curation.dedupRank(s, d)),
    "dedup_canonical"     -> ((s: SparkSession, d: String) => Curation.dedupCanonical(s, d)),
    "dedup_keep"          -> ((s: SparkSession, d: String) => Curation.dedupKeep(s, d)),
    "unigram_train"       -> ((s: SparkSession, d: String) => Unigram.train(s, d)),
    "unigram_encode"      -> ((s: SparkSession, d: String) => Unigram.encode(s, d)),
    "corpus_lang_mix"     -> ((s: SparkSession, d: String) => Curation.langMix(s, d)),
    "wordpiece_train"     -> ((s: SparkSession, d: String) => Wordpiece.train(s, d)),
    "wordpiece_encode"    -> ((s: SparkSession, d: String) => Wordpiece.encode(s, d)),
    "text_quality_rules"  -> (TrainPrep.qualityRules _),
    "text_repetition"     -> (TrainPrep.repetition _),
    "text_pii_scrub"      -> (TrainPrep.piiScrub _),
    "dedup_phrases"       -> ((s: SparkSession, d: String) => TrainPrep.dedupPhrases(s, d)),
    "dedup_spans"         -> ((s: SparkSession, d: String) => TrainPrep.spanDedup(s, d)),
    "pack_sequences"      -> ((s: SparkSession, d: String) => TrainPrep.packSequences(s, d)),
    "pack_epoch_order"    -> ((s: SparkSession, d: String) =>
                                TrainPrep.epochOrder(s, d, sorted = true)),
    "text_chunk"          -> ((s: SparkSession, d: String) => TrainPrep.chunk(s, d)),
    // CONTRACT projection: the driver's pandas compare can't sort/hash
    // array cells, so the span list is flattened to a canonical string
    // ("doc_id:offset:toks" joined by ","). The typed array stays in
    // TrainPrep.packManifest's API and specs; the string form is also
    // exactly reproducible in DuckDB (string_agg) → full oracle check.
    "pack_manifest"       -> ((s: SparkSession, d: String) => TrainPrep.packManifest(s, d)
      .withColumn("spans", org.apache.spark.sql.functions.expr(
        "array_join(transform(spans, x -> concat(x.doc_id, ':', x.offset, ':', x.toks)), ',')"))),
    "lake_stats_prune"    -> (LakeAnalytics.windowSeverity _),
    "lake_resource_attrs" -> (LakeAnalytics.resourceAttrs _),
    "lake_tail"           -> ((s: SparkSession, d: String) => LakeAnalytics.tail(s, d)),
    "lake_needle"         -> ((s: SparkSession, d: String) => LakeAnalytics.needle(s, d)),
    "lake_span_lookup"    -> ((s: SparkSession, d: String) => LakeAnalytics.spanLookup(s, d)),
    "lake_sql_lookup"     -> ((s: SparkSession, d: String) => LakeAnalytics.sqlSpanLookup(s, d)),
    "lake_grep"           -> ((s: SparkSession, d: String) => LakeAnalytics.grep(s, d)),
    "lake_dml"            -> (LakeAnalytics.dmlSeverity _),
    "lake_sql_dml"        -> (LakeAnalytics.sqlDmlSeverity _),
    "lake_sql_read"       -> (LakeAnalytics.sqlReadSeverity _),
    "lake_sql_travel"     -> (LakeAnalytics.sqlTravelSeverity _),
    "lake_stream_read"    -> (LakeAnalytics.streamReadSeverity _),
    "logs_heavy_hitters"  -> ((s: SparkSession, d: String) => LogAnalytics.heavyHitters(s, d)),
    "dedup_incremental"   -> ((s: SparkSession, d: String) => Dedup.incremental(s, d)),
    "contamination_bloom" -> ((s: SparkSession, d: String) => Curation.contaminationBloom(s, d)),
    // rows-only by design: k-means cells are iterative (no SQL oracle);
    // recall + injected-paraphrase specs in CurationSpec
    "contamination_semantic" -> ((s: SparkSession, d: String) => Curation.contaminationSemantic(s, d)),
    "q23_bucketed_join"   -> (graft.sources.Bucketing.bucketedJoin _),
    "q24_waiting_suppliers" -> (Relational.q24WaitingSuppliers _),
    "q27_hierarchy"       -> (Hierarchy.customerTree _),
    "mm_frames"           -> (Multimodal.frames _),
    "mm_dedup"            -> ((s: SparkSession, d: String) => Multimodal.mediaDedup(s, d)),
    "mm_neardup"          -> ((s: SparkSession, d: String) => Multimodal.mediaNearDup(s, d)),
    "ann_ivf_index"       -> ((s: SparkSession, d: String) => IvfIndex.query(s, d)),
    "text_logprob"        -> (TrainPrep.unigramLogprob _),
    "corpus_split"        -> ((s: SparkSession, d: String) => Curation.corpusSplit(s, d)),
    "corpus_mix"          -> (Curation.corpusMix _),
    "mix_budget"          -> ((s: SparkSession, d: String) => Curation.mixBudget(s, d)),
    "mix_temperature"     -> (Curation.mixTemperature _),
    "corpus_upsample"     -> ((s: SparkSession, d: String) => Curation.corpusUpsample(s, d)),
    "logs_scope_attrs"    -> (LogAnalytics.scopeAttrs _),
    "logs_dau_sketch"     -> (LogAnalytics.dauSketch _),
    // CONTRACT projection (see pack_manifest): packed doc list → csv string.
    "pack_bestfit"        -> ((s: SparkSession, d: String) => TrainPrep.packBestFit(s, d)
      .withColumn("doc_ids", org.apache.spark.sql.functions.expr(
        "array_join(transform(doc_ids, x -> cast(x as string)), ',')"))),
    "logs_anomaly"        -> ((s: SparkSession, d: String) => LogAnalytics.anomaly(s, d)),
    "logs_trend"          -> ((s: SparkSession, d: String) => LogAnalytics.trend(s, d)),
    "logs_slo_burn"       -> ((s: SparkSession, d: String) => LogAnalytics.sloBurn(s, d)),
    "logs_transitions"    -> (LogAnalytics.transitions _),
    "table_stats"         -> ((s: SparkSession, d: String) => TableStats.lineitemStats(s, d)),
    "ann_quantized"       -> ((s: SparkSession, d: String) => Similarity.annQuantized(s, d)),
    "ann_pq"              -> ((s: SparkSession, d: String) => Similarity.annPq(s, d)),
    "ann_ivfpq"           -> ((s: SparkSession, d: String) => Similarity.annIvfPq(s, d)),
    "lake_rollup"         -> (LakeAnalytics.rollup _),
    "logs_funnel"         -> ((s: SparkSession, d: String) => Behavior.funnel(s, d)),
    "logs_retention"      -> (Behavior.retention _),
    "logs_gap_fill"       -> ((s: SparkSession, d: String) => Behavior.gapFill(s, d)),
    "logs_patterns"       -> ((s: SparkSession, d: String) => Behavior.patterns(s, d)),
    "bpe_pairs"           -> ((s: SparkSession, d: String) => Bpe.pairs(s, d)),
    "bpe_train"           -> ((s: SparkSession, d: String) => Bpe.train(s, d)),
    "lake_cluster"        -> (LakeAnalytics.clusterWindow _),
    "lake_rewrite_manifests" -> (LakeAnalytics.rewriteManSeverity _),
    "logs_histogram"      -> ((s: SparkSession, d: String) => LogAnalytics.histogram(s, d)),
    "corpus_stats"        -> (Curation.corpusStats _),
    "text_toxicity"       -> ((s: SparkSession, d: String) => TrainPrep.toxicity(s, d)),
    "text_line_dedup"     -> ((s: SparkSession, d: String) => TrainPrep.lineDedup(s, d)),
    "ann_filtered"        -> ((s: SparkSession, d: String) => Similarity.annFiltered(s, d)),
    "q25_full_outer"      -> (Relational.q25FullOuter _),
    "lake_changes"        -> (LakeAnalytics.changes _),
    "lake_merged"         -> (LakeAnalytics.mergedSchema _),
    "bpe_encode"          -> ((s: SparkSession, d: String) => Bpe.encode(s, d)),
    // CONTRACT projection (see pack_manifest): projected vector → flat
    // string. emb_pca stays JSON/rows-only (its basis comes from a
    // driver-side eigensolve over Spark double sums — not SQL-
    // replayable); emb_project flattens to INTEGER-MICRO components
    // (floor(p·1e6) — format-free), because its seeded matrix IS a
    // pure function of (seed, dims) that the DuckDB oracle re-derives
    // term-for-term: the dot is replayed in the same left-to-right
    // IEEE order, so the hash-match certifies bit-identical doubles.
    "emb_pca"             -> ((s: SparkSession, d: String) => Pca.embPca(s, d)
      .withColumn("proj", org.apache.spark.sql.functions.expr("to_json(proj)"))),
    "ann_opq"             -> ((s: SparkSession, d: String) => Opq.annOpq(s, d)),
    "emb_project"         -> ((s: SparkSession, d: String) => Similarity.embProject(s, d)
      .withColumn("proj", org.apache.spark.sql.functions.expr(
        "concat_ws(',', transform(proj, p -> CAST(floor(p * 1000000D) AS STRING)))"))),
    "lake_branch"         -> (LakeAnalytics.branchSeverity _),
    "text_bigram_logprob" -> (TrainPrep.bigramLogprob _),
    "text_trigram_logprob" -> (TrainPrep.trigramLogprob _),
    "text_quality_score"  -> ((s: SparkSession, d: String) => TrainPrep.qualityScore(s, d)),
    "corpus_pipeline"     -> (TrainPrep.pipeline _),
    "logs_alert_bursts"   -> ((s: SparkSession, d: String) => LogAnalytics.alertBursts(s, d)),
    "sample_weighted"     -> ((s: SparkSession, d: String) => Curation.sampleWeighted(s, d)),
    "split_leakage"       -> ((s: SparkSession, d: String) => Curation.splitLeakage(s, d)),
    "corpus_split_clean"  -> ((s: SparkSession, d: String) => Curation.corpusSplitClean(s, d)),
    "logs_compare"        -> (LogAnalytics.compareWindows _),
    "q26_unpivot"         -> (Relational.q26Unpivot _)
  )

  /** The `emb_project` oracle is GENERATED, not hand-written: the JL
    * matrix is a pure function of (seed=42, outDim=8, dim=64) — the
    * same `java.util.Random.nextGaussian` stream the operator derives
    * (Similarity.embProject) — so the SQL embeds the 8×64 plane
    * literals and replays each dot with `list_dot_product` over the
    * double-cast embedding, flooring to integer micros exactly like
    * the contract projection. Dim is pinned to the testdata's 64; a
    * different corpus dim fails loudly, not wrongly.
    */
  private def embProjectOracle: String = {
    val (outDim, dim, seed) = (8, 64, 42L)
    val rng = new java.util.Random(seed)
    val planes = Array.fill(outDim)(
      Array.fill(dim)(rng.nextGaussian() / math.sqrt(outDim.toDouble)))
    val comps = planes.map { p =>
      s"CAST(floor(list_dot_product(v, [${p.mkString(", ")}]) * 1000000) AS BIGINT)"
    }
    s"""WITH e AS (SELECT vec_id, label,
       | list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
       |SELECT vec_id, label, concat_ws(',', ${comps.mkString(", ")}) AS proj
       |FROM e ORDER BY vec_id""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  // Oracles shared VERBATIM by a synthesis query and its lake twin
  // (binding one string to both keys keeps the "same oracle" claim
  // structurally true — an edit cannot silently diverge the pair)
  private val oracleTraceServiceGraph =
    """WITH base AS (
        |  SELECT *, md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id
        |  FROM events),
        |spans AS (
        |  SELECT trace_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY trace_id ORDER BY ts, event_id) AS INTEGER) AS idx,
        |    CASE WHEN event_type IN ('view','click') THEN 'web'
        |         WHEN event_type = 'signup' THEN 'auth'
        |         WHEN event_type = 'purchase' THEN 'checkout'
        |         ELSE 'backend' END AS service,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS dur_ms
        |  FROM base)
        |SELECT p.service AS parent_service, c.service AS service,
        |  count(*) AS calls, CAST(SUM(c.dur_ms) AS BIGINT) AS callee_ms
        |FROM spans c JOIN spans p
        |  ON p.trace_id = c.trace_id AND p.idx = c.idx // 2
        |WHERE c.idx > 1
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  private val oracleTraceSummary =
    """WITH base AS (
        |  SELECT *, md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id
        |  FROM events),
        |spans AS (
        |  SELECT trace_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY trace_id ORDER BY ts, event_id) AS INTEGER) AS idx,
        |    CASE WHEN event_type IN ('view','click') THEN 'web'
        |         WHEN event_type = 'signup' THEN 'auth'
        |         WHEN event_type = 'purchase' THEN 'checkout'
        |         ELSE 'backend' END AS service,
        |    event_type AS operation,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS dur_ms
        |  FROM base)
        |SELECT trace_id, count(*) AS n_spans,
        |  CAST(SUM(dur_ms) AS BIGINT) AS total_ms,
        |  MAX(CASE WHEN idx = 1 THEN service END) AS root_service,
        |  CAST(SUM(CASE WHEN operation = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
        |FROM spans GROUP BY trace_id ORDER BY trace_id""".stripMargin

  private val oracleTraceTailSample =
    """WITH base AS (
        |  SELECT *, md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id
        |  FROM events),
        |spans AS (
        |  SELECT trace_id, event_type AS operation,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS dur_ms
        |  FROM base),
        |t AS (
        |  SELECT trace_id, count(*) AS n_spans,
        |    CAST(SUM(dur_ms) AS BIGINT) AS total_ms,
        |    SUM(CASE WHEN operation = 'error' THEN 1 ELSE 0 END) AS n_errors
        |  FROM spans GROUP BY 1)
        |SELECT trace_id, n_spans, total_ms,
        |  CASE WHEN n_errors > 0 THEN 'error'
        |       WHEN total_ms >= 3000 THEN 'slow'
        |       WHEN substr(md5(trace_id), 1, 2) < '2a' THEN 'prob' END AS reason
        |FROM t
        |WHERE n_errors > 0 OR total_ms >= 3000 OR substr(md5(trace_id), 1, 2) < '2a'
        |ORDER BY trace_id""".stripMargin

  private val oracleTraceSelfTime =
    """WITH base AS (
        |  SELECT *, md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id
        |  FROM events),
        |spans AS (
        |  SELECT trace_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY trace_id ORDER BY ts, event_id) AS INTEGER) AS idx,
        |    CASE WHEN event_type IN ('view','click') THEN 'web'
        |         WHEN event_type = 'signup' THEN 'auth'
        |         WHEN event_type = 'purchase' THEN 'checkout'
        |         ELSE 'backend' END AS service,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS dur_ms
        |  FROM base),
        |kids AS (
        |  SELECT trace_id, idx // 2 AS idx, SUM(dur_ms) AS child_ms
        |  FROM spans WHERE idx > 1 GROUP BY 1, 2)
        |SELECT s.service AS service, count(*) AS n_spans,
        |  CAST(SUM(s.dur_ms) AS BIGINT) AS total_ms,
        |  CAST(SUM(s.dur_ms - COALESCE(k.child_ms, 0)) AS BIGINT) AS self_ms
        |FROM spans s LEFT JOIN kids k
        |  ON k.trace_id = s.trace_id AND k.idx = s.idx
        |GROUP BY 1 ORDER BY 1""".stripMargin

  private val oracleTraceCriticalPath =
    """WITH RECURSIVE base AS (
        |  SELECT *, md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id
        |  FROM events),
        |spans AS (
        |  SELECT trace_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY trace_id ORDER BY ts, event_id) AS INTEGER) AS idx,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS dur_ms
        |  FROM base),
        |walk AS (
        |  SELECT trace_id, idx, dur_ms AS path_ms, idx AS cur FROM spans
        |  UNION ALL
        |  SELECT w.trace_id, w.idx, w.path_ms + s.dur_ms, s.idx
        |  FROM walk w JOIN spans s
        |    ON s.trace_id = w.trace_id AND s.idx = w.cur // 2
        |  WHERE w.cur > 1)
        |SELECT w.trace_id AS trace_id,
        |  CAST(MAX(w.path_ms) AS BIGINT) AS critical_ms,
        |  CAST(MAX(n.n) AS BIGINT) AS n_spans
        |FROM walk w JOIN (
        |  SELECT trace_id, count(*) AS n FROM spans GROUP BY trace_id) n
        |  ON n.trace_id = w.trace_id
        |WHERE w.cur = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin

  private val oracleTraceLatency =
    """WITH base AS (
        |  SELECT *, md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id
        |  FROM events),
        |spans AS (
        |  SELECT trace_id,
        |    CASE WHEN event_type IN ('view','click') THEN 'web'
        |         WHEN event_type = 'signup' THEN 'auth'
        |         WHEN event_type = 'purchase' THEN 'checkout'
        |         ELSE 'backend' END AS service,
        |    event_type AS operation,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS dur_ms
        |  FROM base)
        |SELECT service, operation,
        |  round(quantile_cont(dur_ms, 0.5), 4) AS p50_ms,
        |  round(quantile_cont(dur_ms, 0.95), 4) AS p95_ms,
        |  count(*) AS calls,
        |  CAST(SUM(dur_ms) AS BIGINT) AS total_ms
        |FROM spans GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  private val oracleMetricsHistP95 =
    """WITH b AS (
        |  SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service,
        |    CASE WHEN value <= 1 THEN 1.0 WHEN value <= 5 THEN 5.0
        |         WHEN value <= 10 THEN 10.0 WHEN value <= 50 THEN 50.0
        |         WHEN value <= 100 THEN 100.0 WHEN value <= 500 THEN 500.0
        |    END AS le
        |  FROM events),
        |g AS (SELECT service, le, count(*) AS bucket_n FROM b
        |      WHERE le IS NOT NULL GROUP BY 1,2),
        |h AS (SELECT service, le,
        |        SUM(bucket_n) OVER (PARTITION BY service ORDER BY le) AS cum_n
        |      FROM g),
        |t AS (SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service,
        |        count(*) AS total FROM events GROUP BY 1),
        |x AS (SELECT h.service, h.le, h.cum_n,
        |        COALESCE(LAG(h.le) OVER (PARTITION BY h.service ORDER BY h.le), 0.0) AS lo,
        |        COALESCE(LAG(h.cum_n) OVER (PARTITION BY h.service ORDER BY h.le), 0) AS cum_before,
        |        0.95 * t.total AS rnk
        |      FROM h JOIN t ON t.service = h.service),
        |e AS (SELECT service,
        |        lo + (le - lo) * (rnk - cum_before) / (cum_n - cum_before) AS est,
        |        ROW_NUMBER() OVER (PARTITION BY service ORDER BY le) AS rn
        |      FROM x WHERE cum_n >= rnk)
        |SELECT t.service AS service, ROUND(COALESCE(e.est, 500.0), 4) AS p95
        |FROM t LEFT JOIN e ON e.service = t.service AND e.rn = 1
        |ORDER BY service""".stripMargin

  private val oracleMetricsExemplars =
    """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service,
        |  CAST(EXTRACT(day FROM ts) AS INTEGER) AS day,
        |  CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
        |  count(*) AS n,
        |  MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS max_c,
        |  (MAX(struct_pack(
        |    vi := CAST(FLOOR(value * 100 + 0.5) AS BIGINT),
        |    tid := md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d'))))).tid
        |    AS exemplar_trace_id
        |FROM events GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin

  private val oracleMetricsGauge =
    """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service,
        |  CAST(EXTRACT(day FROM ts) AS INTEGER) AS day,
        |  CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
        |  count(*) AS n,
        |  MIN(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS min_c,
        |  MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS max_c,
        |  ((SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) * 200 + count(*))
        |    // (2 * count(*))) / 10000.0 AS avg_v
        |FROM events GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "emb_project" -> embProjectOracle,
    // pack_epoch_order: the oracle runs the NAIVE global row_number
    // per epoch — the decomposed plan must equal it hash-for-hash
    "pack_epoch_order" ->
      """WITH k AS (SELECT doc_id, e.epoch,
        |  md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS ord
        | FROM documents CROSS JOIN (SELECT unnest(range(3)) AS epoch) e)
        |SELECT epoch,
        | row_number() OVER (PARTITION BY epoch ORDER BY ord, doc_id) AS position,
        | doc_id
        |FROM k ORDER BY epoch, position""".stripMargin,
    // corpus_lang_mix: the langid CASE composed with the quantized-
    // sqrt temperature-mix arithmetic, replayed end-to-end
    "corpus_lang_mix" ->
      """WITH t0 AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS tk
        | FROM documents),
        |t1 AS (SELECT doc_id, text, len(tk) AS n_toks,
        |  len(list_filter(tk, x -> x IN ('the','a','and','of','to','is'))) AS s_en,
        |  len(list_filter(tk, x -> x IN ('el','los','las','una','y','que'))) AS s_es,
        |  len(list_filter(tk, x -> x IN ('der','die','das','und','ist','nicht'))) AS s_de,
        |  len(list_filter(tk, x -> x IN ('le','les','des','et','est','une'))) AS s_fr,
        |  regexp_matches(text, '[\x{4e00}-\x{9fff}]') AS zh
        | FROM t0),
        |d AS (SELECT doc_id, n_toks,
        | CASE WHEN zh THEN 'zh'
        |      WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
        |      WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
        |      WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
        |      WHEN s_fr > 0 THEN 'fr'
        |      ELSE 'unknown' END AS pred_lang
        | FROM t1),
        |s AS (SELECT pred_lang, CAST(sum(n_toks) AS BIGINT) AS src_toks FROM d GROUP BY 1),
        |q AS (SELECT pred_lang, src_toks,
        |  CAST(floor(sqrt(CAST(src_toks AS DOUBLE)) * 65536.0) AS BIGINT) AS w_q FROM s),
        |g AS (SELECT CAST(sum(src_toks) // 2 AS BIGINT) AS budget,
        |  CAST(sum(w_q) AS BIGINT) AS sum_w FROM q),
        |t AS (SELECT q.pred_lang,
        |  CAST(floor(((CAST(g.budget AS DOUBLE)
        |    * (CAST(q.w_q AS DOUBLE) / CAST(g.sum_w AS DOUBLE)))
        |    / CAST(q.src_toks AS DOUBLE)) * 4294967296.0) AS BIGINT) AS th
        |  FROM q CROSS JOIN g)
        |SELECT d.doc_id, d.pred_lang, d.n_toks FROM d JOIN t ON d.pred_lang = t.pred_lang
        |WHERE t.th >= 4294967296
        |   OR upper(substr(md5(CAST(d.doc_id AS VARCHAR)),1,8)) < lpad(hex(t.th),8,'0')
        |ORDER BY d.doc_id""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${m2("CAST(l_quantity AS DECIMAL(12,2))")} AS sum_qty,
         | ${m2("CAST(l_extendedprice AS DECIMAL(12,2))")} AS sum_base_price,
         | ${m2(DISC_PRICE)} AS sum_disc_price,
         | ${m2(CHARGE)} AS sum_charge,
         | ${avg4("l_quantity")} AS avg_qty,
         | ${avg4("l_extendedprice")} AS avg_price,
         | ${avg4("l_discount")} AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_agg" ->
      s"""SELECT n_name, ${m2(DISC_PRICE)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
         |JOIN customer ON o_custkey=c_custkey
         |JOIN nation ON c_nationkey=n_nationkey
         |JOIN region ON n_regionkey=r_regionkey
         |WHERE r_name='ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q3_topn" ->
      s"""SELECT l_orderkey, strftime(o_orderdate,'%Y-%m-%d') AS orderdate,
         | ${m2(DISC_PRICE)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
         |JOIN customer ON o_custkey=c_custkey
         |WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey=o_orderkey AND l_quantity>45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_antijoin" ->
      s"""SELECT c_mktsegment, count(*) AS n_customers,
         | ${m2("CAST(c_acctbal AS DECIMAL(12,2))")} AS sum_acctbal
         |FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey
         |                  AND o_orderdate >= TIMESTAMP '2000-06-01')
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q6_selective" ->
      s"""SELECT ${m2("CAST(l_extendedprice AS DECIMAL(12,2))*CAST(l_discount AS DECIMAL(4,2))")} AS revenue,
         | count(*) AS n_lines
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q7_window" ->
      s"""WITH monthly AS (
         |  SELECT l_suppkey,
         |    strftime(date_trunc('month', l_shipdate),'%Y-%m-%d') AS month,
         |    ${m2(DISC_PRICE)} AS revenue
         |  FROM lineitem GROUP BY 1,2)
         |SELECT l_suppkey, month, revenue,
         |  round(sum(revenue) OVER (PARTITION BY l_suppkey ORDER BY month),2)
         |    AS running_revenue,
         |  row_number() OVER (PARTITION BY l_suppkey
         |                     ORDER BY revenue DESC, month) AS month_rank
         |FROM monthly ORDER BY l_suppkey, month""".stripMargin,
    "q8_rollup" ->
      s"""SELECT coalesce(l_returnflag,'ALL') AS returnflag,
         | coalesce(l_linestatus,'ALL') AS linestatus,
         | ${m2("CAST(l_quantity AS DECIMAL(12,2))")} AS sum_qty, count(*) AS n_lines
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,
    "logs_sample" ->
      """SELECT event_id, md5(CAST(event_id AS VARCHAR)) AS h
        |FROM events ORDER BY h LIMIT 100""".stripMargin,
    "q21_correlated_agg" ->
      s"""SELECT ${m2("CAST(l_extendedprice AS DECIMAL(12,2))")} AS sum_price,
         | count(*) AS n_lines
         |FROM lineitem l1
         |WHERE l_quantity < (SELECT 0.5*CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)/count(*)
         |                    FROM lineitem l2
         |                    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,
    "q20_topk_custom" ->
      s"""WITH pr AS (
         |  SELECT l_suppkey, l_partkey, ${m2(DISC_PRICE)} AS revenue
         |  FROM lineitem GROUP BY 1,2)
         |SELECT l_suppkey, l_partkey, revenue FROM (
         |  SELECT *, row_number() OVER (PARTITION BY l_suppkey
         |    ORDER BY revenue DESC, l_partkey) AS rnk FROM pr)
         |WHERE rnk <= 3 ORDER BY l_suppkey, revenue DESC, l_partkey""".stripMargin,
    "q22_window_suite" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate,'%Y-%m-%d') AS orderdate,
        | o_totalprice,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | lead(o_totalprice, 1) OVER w AS next_price,
        | strftime(first_value(o_orderdate) OVER w,'%Y-%m-%d') AS first_date,
        | ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q19_moving_avg" ->
      """WITH daily AS (
        |  SELECT strftime(l_shipdate,'%Y-%m-%d') AS day,
        |    CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS day_num,
        |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))),2) AS DOUBLE) AS revenue
        |  FROM lineitem GROUP BY 1,2)
        |SELECT day, revenue,
        |  CAST((2 * c + n) // (2 * n) AS DOUBLE) / 100 AS mov_avg_7d,
        |  CAST(c AS DOUBLE) / 100 AS mov_sum_7d
        |FROM (
        |  SELECT day, revenue,
        |    sum(CAST(CAST(revenue AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER w AS c,
        |    count(*) OVER w AS n
        |  FROM daily
        |  WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |ORDER BY day""".stripMargin,
    "q18_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        | CAST(round(sum(CAST(value AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q13_pivot" ->
      s"""SELECT l_returnflag,
         | ${m2("CASE WHEN l_linestatus='F' THEN CAST(l_quantity AS DECIMAL(12,2)) END")} AS qty_f,
         | ${m2("CASE WHEN l_linestatus='O' THEN CAST(l_quantity AS DECIMAL(12,2)) END")} AS qty_o
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q14_setops" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
        |ORDER BY o_custkey""".stripMargin,
    "q15_topn_per_group" ->
      s"""WITH pr AS (
         |  SELECT l_suppkey, l_partkey, ${m2(DISC_PRICE)} AS revenue
         |  FROM lineitem GROUP BY 1,2)
         |SELECT l_suppkey, l_partkey, revenue, rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY l_suppkey
         |    ORDER BY revenue DESC, l_partkey) AS rnk FROM pr)
         |WHERE rnk <= 3 ORDER BY l_suppkey, rnk""".stripMargin,
    "q16_scalar_subquery" ->
      s"""SELECT l_returnflag, count(*) AS n_lines,
         | ${m2("CAST(l_extendedprice AS DECIMAL(12,2))")} AS sum_price
         |FROM lineitem
         |WHERE l_extendedprice > (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)/count(*)
         |                         FROM lineitem)
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q17_conditional_agg" ->
      s"""SELECT o_orderpriority, count(*) AS n_orders,
         | CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
         | ${m2("CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END")} AS sum_f,
         | ${m2("CASE WHEN o_orderstatus<>'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END")} AS sum_not_f
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "text_word_freq" ->
      """WITH t AS (SELECT unnest(list_filter(string_split_regex(lower(text),'\s+'),
        |  x->len(x)>0)) AS w FROM documents)
        |SELECT w, count(*) AS n FROM t GROUP BY w
        |ORDER BY n DESC, w LIMIT 50""".stripMargin,
    "text_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),'\s+'),
        |  x->len(x)>0)) AS w FROM documents),
        |terms AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1,2),
        |dfreq AS (SELECT w, count(*) AS df FROM terms GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.w, t.tf * ln(CAST(n.n_docs AS DOUBLE)/d.df) AS score_exact
        |  FROM terms t JOIN dfreq d ON t.w=d.w CROSS JOIN n
        |  WHERE t.doc_id < 20)
        |SELECT doc_id, w, round(score_exact,4) AS score, rnk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score_exact DESC, w) AS rnk FROM scored)
        |WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin,
    "text_bm25" ->
      """WITH d AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS tk
        | FROM documents),
        |wl AS (SELECT doc_id, len(tk) AS dl, tk FROM d),
        |g AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_toks FROM wl),
        |tf AS (SELECT doc_id, dl, w, count(*) AS tf FROM (
        |  SELECT doc_id, dl, unnest(list_filter(tk,
        |    x -> x IN ('vector','join','stream'))) AS w FROM wl) GROUP BY 1,2,3),
        |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
        |idf AS (SELECT f.w,
        |  CAST(round(ln(((CAST(g.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE)) + 0.5)
        |    / (CAST(f.df AS DOUBLE) + 0.5) + 1.0) * 1e6) AS BIGINT) AS idf_micro,
        |  CAST(g.total_toks AS DOUBLE) / CAST(g.n_docs AS DOUBLE) AS avgdl
        |  FROM dfreq f CROSS JOIN g),
        |s AS (SELECT tf.doc_id, tf.dl,
        |  CAST(round(CAST(i.idf_micro AS DOUBLE) *
        |    ((CAST(tf.tf AS DOUBLE) * 2.2) / (CAST(tf.tf AS DOUBLE)
        |      + 1.2 * (0.25 + 0.75 * (CAST(tf.dl AS DOUBLE) / i.avgdl))))) AS BIGINT)
        |    AS score_micro
        |  FROM tf JOIN idf i ON tf.w = i.w)
        |SELECT doc_id, dl, CAST(sum(score_micro) AS BIGINT) AS bm25_micro,
        |  count(*) AS n_terms
        |FROM s GROUP BY doc_id, dl
        |ORDER BY bm25_micro DESC, doc_id LIMIT 20""".stripMargin,
    "emb_centroids" ->
      """SELECT label, i-1 AS dim, round(avg(CAST(x AS DOUBLE)),4) AS c,
        | count(*) AS n
        |FROM (SELECT label, unnest(embedding) AS x,
        |      generate_subscripts(embedding,1) AS i FROM embeddings)
        |GROUP BY label, i ORDER BY label, dim""".stripMargin,
    "q9_asof" ->
      """WITH e AS (SELECT event_id, user_id, ts, event_type, epoch_us(ts) AS us FROM events),
        |w AS (SELECT *, last_value(CASE WHEN event_type='click' THEN us END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_us
        | FROM e)
        |SELECT event_id, user_id, strftime(ts,'%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        | strftime(make_timestamp(click_us),'%Y-%m-%d %H:%M:%S.%f') AS click_ts_str,
        | CAST(us - click_us AS BIGINT) AS wait_us
        |FROM w WHERE event_type='purchase' ORDER BY event_id""".stripMargin,
    "q10_range_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
        | CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
        |FROM events c JOIN events p
        | ON c.user_id = p.user_id AND c.event_type='click' AND p.event_type='purchase'
        | AND p.ts > c.ts AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
        |ORDER BY click_id, purchase_id""".stripMargin,
    "q11_grouping_sets" ->
      """SELECT coalesce(l_returnflag,'ALL') AS returnflag,
        | coalesce(l_linestatus,'ALL') AS linestatus,
        | CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_qty,
        | count(*) AS n_lines
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q12_percentile_join" ->
      """SELECT n_name, round(quantile_cont(c_acctbal, 0.5),4) AS median_bal,
        | round(quantile_cont(c_acctbal, 0.9),4) AS p90_bal,
        | count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey=n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "logs_recent" ->
      """SELECT event_id, strftime(ts,'%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        | user_id, event_type, value, props
        |FROM events WHERE ts >= TIMESTAMP '2024-01-28'
        |ORDER BY ts DESC, event_id DESC LIMIT 100""".stripMargin,
    "logs_severity_by_service" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "logs_timeseries" ->
      """SELECT strftime(date_trunc('hour', ts),'%Y-%m-%d %H:%M:%S') AS bucket,
        | event_type, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "logs_timeseries_5m" ->
      """SELECT strftime(make_timestamp(CAST(floor(epoch_us(ts)/300000000)*300000000 AS BIGINT)),
        |   '%Y-%m-%d %H:%M:%S') AS bucket,
        | event_type, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "logs_severity_number" ->
      """SELECT 'svc-' || CAST(user_id AS VARCHAR) AS service_name,
        | CASE WHEN event_type='error' THEN 17 WHEN event_type='signup' THEN 13
        |      WHEN event_type='purchase' THEN 9 WHEN event_type='view' THEN 9
        |      ELSE 5 END AS severity_number,
        | event_type AS severity_text, count(*) AS n
        |FROM events
        |WHERE event_type IN ('error','signup')
        |GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    "logs_trace_lookup" ->
      """SELECT md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id,
        | substring(md5(CAST(event_id AS VARCHAR)),1,16) AS span_id,
        | strftime(ts,'%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        | event_type AS severity_text,
        | CASE WHEN event_type='error' THEN 17 WHEN event_type='signup' THEN 13
        |      WHEN event_type='purchase' THEN 9 WHEN event_type='view' THEN 9
        |      ELSE 5 END AS severity_number,
        | props AS body
        |FROM events
        |WHERE user_id = 7 AND strftime(ts,'%Y-%m-%d') = '2024-01-15'
        |ORDER BY ts_str, span_id""".stripMargin,
    // ---- traces family: the shared span synthesis is replayed
    // verbatim in each oracle (base → trace_id, spans → rank/ids/
    // service tier/duration; heap parent = idx // 2) ----
    "trace_spans" ->
      """WITH base AS (
        |  SELECT *, md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id
        |  FROM events),
        |spans AS (
        |  SELECT trace_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY trace_id ORDER BY ts, event_id) AS INTEGER) AS idx,
        |    md5(CAST(event_id AS VARCHAR)) AS span_id,
        |    CASE WHEN event_type IN ('view','click') THEN 'web'
        |         WHEN event_type = 'signup' THEN 'auth'
        |         WHEN event_type = 'purchase' THEN 'checkout'
        |         ELSE 'backend' END AS service,
        |    event_type AS operation,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS dur_ms
        |  FROM base WHERE trace_id = md5('7/2024-01-15'))
        |SELECT c.idx AS idx, c.span_id AS span_id, p.span_id AS parent_span_id,
        |  c.service AS service, c.operation AS operation, c.dur_ms AS dur_ms
        |FROM spans c LEFT JOIN spans p ON p.idx = c.idx // 2
        |ORDER BY idx""".stripMargin,
    // the same trace's tree read as a bloom-routed point lookup on
    // the ingested lake (no idx — the lake orders by span id); parent
    // ids are the REAL pointers the wire carried
    "trace_lake_spans" ->
      """WITH base AS (
        |  SELECT *, md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id
        |  FROM events),
        |spans AS (
        |  SELECT trace_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY trace_id ORDER BY ts, event_id) AS INTEGER) AS idx,
        |    md5(CAST(event_id AS VARCHAR)) AS span_id,
        |    CASE WHEN event_type IN ('view','click') THEN 'web'
        |         WHEN event_type = 'signup' THEN 'auth'
        |         WHEN event_type = 'purchase' THEN 'checkout'
        |         ELSE 'backend' END AS service,
        |    event_type AS operation,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS dur_ms
        |  FROM base WHERE trace_id = md5('7/2024-01-15'))
        |SELECT c.span_id AS span_id, p.span_id AS parent_span_id,
        |  c.service AS service, c.operation AS operation, c.dur_ms AS dur_ms
        |FROM spans c LEFT JOIN spans p ON p.idx = c.idx // 2
        |ORDER BY span_id""".stripMargin,
    "trace_service_graph" -> oracleTraceServiceGraph,
    "trace_lake_graph" -> oracleTraceServiceGraph,
    "trace_summary" -> oracleTraceSummary,
    "trace_lake_summary" -> oracleTraceSummary,
    "trace_critical_path" -> oracleTraceCriticalPath,
    "trace_lake_critical" -> oracleTraceCriticalPath,
    "trace_latency" -> oracleTraceLatency,
    // same oracle as trace_latency: the lake-surface twin must
    // reproduce the synthesis aggregate bit for bit through the full
    // envelope->parse->write->sync->read path
    "trace_lake_latency" -> oracleTraceLatency,
    // cross-signal: spans left-joined to their WARN+ log records on
    // the (trace_id, 16-hex span prefix) context both syntheses stamp;
    // the oracle replays both sides and the prefix join verbatim
    "trace_logs" ->
      """WITH base AS (
        |  SELECT *, md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id
        |  FROM events),
        |spans AS (
        |  SELECT trace_id,
        |    md5(CAST(event_id AS VARCHAR)) AS span_id,
        |    CASE WHEN event_type IN ('view','click') THEN 'web'
        |         WHEN event_type = 'signup' THEN 'auth'
        |         WHEN event_type = 'purchase' THEN 'checkout'
        |         ELSE 'backend' END AS service,
        |    strftime(ts,'%Y-%m-%d') AS day,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS dur_ms
        |  FROM base),
        |logs AS (
        |  SELECT trace_id, substr(md5(CAST(event_id AS VARCHAR)), 1, 16) AS l_span_id
        |  FROM base
        |  WHERE CASE WHEN event_type = 'error' THEN 17
        |             WHEN event_type = 'signup' THEN 13
        |             WHEN event_type IN ('purchase','view') THEN 9
        |             ELSE 5 END >= 13)
        |SELECT s.service AS service, s.day AS day, count(*) AS n_spans,
        |  CAST(SUM(CASE WHEN l.l_span_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_warn,
        |  CAST(COALESCE(SUM(CASE WHEN l.l_span_id IS NOT NULL THEN s.dur_ms END), 0) AS BIGINT) AS warn_ms
        |FROM spans s LEFT JOIN logs l
        |  ON l.trace_id = s.trace_id AND l.l_span_id = substr(s.span_id, 1, 16)
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // tail sampling: decision = pure function of the aggregated trace
    // (error > slow > md5-prefix hash rule), replayed verbatim
    "trace_tail_sample" -> oracleTraceTailSample,
    "trace_lake_tail" -> oracleTraceTailSample,
    // self time: dur − Σ children dur via one heap-parent-keyed
    // aggregate joined back; negative = child overlap, kept as-is
    "trace_self_time" -> oracleTraceSelfTime,
    // span events: error spans and dur_ms ≡ 0 (mod 7) spans carry one
    // "exception" event whose type is a deterministic function of
    // dur_ms — the oracle replays the synthesis rules; the Spark side
    // reads what BOTH wire transports landed in the span lake
    "trace_span_events" ->
      """WITH spans AS (
        |  SELECT CASE WHEN event_type IN ('view','click') THEN 'web'
        |              WHEN event_type = 'signup' THEN 'auth'
        |              WHEN event_type = 'purchase' THEN 'checkout'
        |              ELSE 'backend' END AS service,
        |         event_type AS operation,
        |         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS dur_ms
        |  FROM events)
        |SELECT service,
        |  CASE WHEN dur_ms % 3 = 0 THEN 'TimeoutError'
        |       WHEN dur_ms % 3 = 1 THEN 'ConnectionError'
        |       ELSE 'ValueError' END AS exc_type,
        |  count(*) AS n
        |FROM spans
        |WHERE operation = 'error' OR dur_ms % 7 = 0
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // links: each root span links to the same user's previous-day
    // trace; resolved = that trace exists in the lake (the user had
    // events the day before)
    "trace_span_links" ->
      """WITH base AS (
        |  SELECT *,
        |    md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id,
        |    md5(CAST(user_id AS VARCHAR) || '/' ||
        |        strftime(ts - INTERVAL 1 DAY,'%Y-%m-%d')) AS prev_trace_id
        |  FROM events),
        |spans AS (
        |  SELECT trace_id, prev_trace_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY trace_id ORDER BY ts, event_id) AS INTEGER) AS idx,
        |    CASE WHEN event_type IN ('view','click') THEN 'web'
        |         WHEN event_type = 'signup' THEN 'auth'
        |         WHEN event_type = 'purchase' THEN 'checkout'
        |         ELSE 'backend' END AS service
        |  FROM base),
        |roots AS (SELECT service, prev_trace_id AS target FROM spans WHERE idx = 1)
        |SELECT service,
        |  (target IN (SELECT DISTINCT trace_id FROM spans)) AS resolved,
        |  count(*) AS n
        |FROM roots GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "trace_lake_self" -> oracleTraceSelfTime,
    // ---- metrics family: counter samples are daily-resetting
    // cumulative integer-cent sums; the oracles replay the synthesis
    // and the PromQL reset-correction / quantile formulas verbatim ----
    "metrics_rate" ->
      """WITH base AS (
        |  SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service,
        |    CAST(EXTRACT(day FROM ts) AS INTEGER) AS day,
        |    CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
        |    ts, event_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vi
        |  FROM events),
        |samples AS (
        |  SELECT *, SUM(vi) OVER (PARTITION BY service, day ORDER BY ts, event_id) AS cum
        |  FROM base),
        |deltas AS (
        |  SELECT *, LAG(cum) OVER (PARTITION BY service ORDER BY ts, event_id) AS prev
        |  FROM samples)
        |SELECT service, day, hour,
        |  CAST(SUM(CASE WHEN prev IS NULL OR cum < prev THEN cum ELSE cum - prev END) AS BIGINT) AS increase_c
        |FROM deltas GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    // exemplars: the deterministic peak pick rides the same
    // (value, trace_id) struct max on both engines — struct ordering
    // is field-by-field, so ties break to the largest trace id and
    // negative/any-magnitude values order numerically
    "metrics_exemplars" -> oracleMetricsExemplars,
    "metrics_lake_exemplars" -> oracleMetricsExemplars,
    // protobuf wire round-trips: the oracle replays the synthesis +
    // aggregate directly, so the hash-match certifies the
    // encode→wire→decode→flatten path record-for-record
    "trace_otlp_proto" ->
      """WITH base AS (
        |  SELECT *, md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id
        |  FROM events),
        |spans AS (
        |  SELECT trace_id, ts,
        |    CASE WHEN event_type IN ('view','click') THEN 'web'
        |         WHEN event_type = 'signup' THEN 'auth'
        |         WHEN event_type = 'purchase' THEN 'checkout'
        |         ELSE 'backend' END AS service_name,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS dur_ms
        |  FROM base)
        |SELECT service_name, count(*) AS n_spans,
        |  CAST(SUM(dur_ms) * 1000000 AS BIGINT) AS total_dur_ns,
        |  count(DISTINCT trace_id) AS n_traces,
        |  strftime(min(ts),'%Y-%m-%d %H:%M:%S.%f') AS first_ts,
        |  strftime(max(ts),'%Y-%m-%d %H:%M:%S.%f') AS last_ts
        |FROM spans GROUP BY 1 ORDER BY 1""".stripMargin,
    "metrics_otlp_proto" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        |  count(*) AS n,
        |  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_c,
        |  strftime(min(ts),'%Y-%m-%d %H:%M:%S.%f') AS first_ts,
        |  strftime(max(ts),'%Y-%m-%d %H:%M:%S.%f') AS last_ts
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // exponential-histogram quantile: scale-0 base-2 buckets via EXACT
    // integer bit length (no float log at boundaries), same rank walk
    // and linear interpolation on both engines
    // the lake twin's lag orders by (timestamp, value) — replayed
    // verbatim ((ts, cum)); increase lands as DOUBLE on both sides
    "metrics_lake_rate" ->
      """WITH base AS (
        |  SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service,
        |    CAST(EXTRACT(day FROM ts) AS INTEGER) AS day,
        |    ts, event_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vi
        |  FROM events),
        |samples AS (
        |  SELECT *, SUM(vi) OVER (PARTITION BY service, day ORDER BY ts, event_id) AS cum
        |  FROM base),
        |deltas AS (
        |  SELECT *, LAG(cum) OVER (PARTITION BY service ORDER BY ts, cum) AS prev
        |  FROM samples)
        |SELECT service AS service_name, 'requests' AS metric_name,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  CAST(SUM(CASE WHEN prev IS NULL OR cum < prev THEN cum ELSE cum - prev END) AS DOUBLE) AS increase
        |FROM deltas GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    "metrics_exp_p95" ->
      """WITH base AS (
        |  SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vi
        |  FROM events),
        |pos AS (
        |  SELECT service, CAST(length(printf('%b', vi)) - 1 AS INTEGER) AS idx,
        |    count(*) AS bucket_n
        |  FROM base WHERE vi >= 1 GROUP BY 1, 2),
        |tot AS (
        |  SELECT service, count(*) AS total,
        |    SUM(CASE WHEN vi = 0 THEN 1 ELSE 0 END) AS zero_n
        |  FROM base GROUP BY 1),
        |cum AS (
        |  SELECT service, idx, bucket_n,
        |    COALESCE(SUM(bucket_n) OVER (PARTITION BY service ORDER BY idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM pos),
        |hit AS (
        |  SELECT c.service,
        |    MIN_BY(POW(2.0, idx) + (POW(2.0, idx + 1) - POW(2.0, idx)) *
        |      (0.95 * t.total - t.zero_n - c.cum_before) / c.bucket_n, idx) AS est
        |  FROM cum c JOIN tot t USING (service)
        |  WHERE t.zero_n + c.cum_before + c.bucket_n >= 0.95 * t.total
        |  GROUP BY 1)
        |SELECT t.service AS service,
        |  ROUND(CASE WHEN t.zero_n >= 0.95 * t.total THEN 0.0 ELSE h.est END, 4) AS p95_c
        |FROM tot t LEFT JOIN hit h USING (service) ORDER BY 1""".stripMargin,
    "metrics_gauge" -> oracleMetricsGauge,
    "metrics_lake_gauge" -> oracleMetricsGauge,
    "metrics_histogram" ->
      """WITH b AS (
        |  SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service,
        |    CASE WHEN value <= 1 THEN 1.0 WHEN value <= 5 THEN 5.0
        |         WHEN value <= 10 THEN 10.0 WHEN value <= 50 THEN 50.0
        |         WHEN value <= 100 THEN 100.0 WHEN value <= 500 THEN 500.0
        |    END AS le
        |  FROM events),
        |g AS (SELECT service, le, count(*) AS bucket_n FROM b
        |      WHERE le IS NOT NULL GROUP BY 1,2)
        |SELECT service, le,
        |  CAST(SUM(bucket_n) OVER (PARTITION BY service ORDER BY le) AS BIGINT) AS cum_n
        |FROM g ORDER BY 1,2""".stripMargin,
    "metrics_hist_p95" -> oracleMetricsHistP95,
    // same oracle as metrics_hist_p95: merged per-hour ingested
    // histogram points must reproduce the one-shot quantile exactly
    "metrics_lake_hist_p95" -> oracleMetricsHistP95,
    // the Summary kind: per-(service, day) summaries carry the day's
    // max in the 0.95 slot; the reader takes each series' LATEST
    // point — so the oracle is the latest day's max per service
    "metrics_lake_summary" ->
      """WITH e AS (
        |  SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service,
        |    CAST(ts AS DATE) AS d, value
        |  FROM events),
        |last AS (SELECT service, max(d) AS md FROM e GROUP BY 1)
        |SELECT e.service AS service, max(e.value) AS p95
        |FROM e JOIN last ON e.service = last.service AND e.d = last.md
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "lake_severity_by_service" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // the Iceberg-metadata read path must surface the SAME table —
    // identical oracle as lake_severity_by_service
    "lake_iceberg" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // the incremental (two-snapshot, delta-manifest) export chain must
    // surface the SAME full table — identical oracle again
    "lake_iceberg_inc" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // the externally-written v1 fixture is nation re-partitioned by
    // region with manifest-only partition values; the oracle reads the
    // ORIGINAL nation parquet
    "lake_iceberg_ext" ->
      """SELECT n_regionkey, count(*) AS n, min(n_name) AS mn
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin,
    // day-transform fixture holds exactly the two fixture days of
    // events; the oracle filters the original parquet to the same days
    "lake_iceberg_day" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, count(*) AS n,
        |  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_c,
        |  count(DISTINCT user_id) AS users
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-12' AND DATE '2024-01-13'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // v2 merge-on-read fixture: nation minus the position-deleted keys
    // {2,7} and the equality-deleted keys {11,14}; the STALE equality
    // delete naming key 20 (sequence not above the data file's) must
    // NOT apply — the oracle keeps key 20
    // the graft-WRITTEN v2 position-delete snapshot, read back through
    // the MOR chain — post-delete events oracle (svc-7 signups gone)
    "lake_iceberg_dml" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events
        |WHERE NOT (user_id % 10 = 7 AND event_type = 'signup')
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // MOR MERGE: svc-2 signups reclassified 'converted' by upsertMor
    // (position-delete + append), read back through the mixed-delta
    // exported chain
    "lake_iceberg_merge" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | CASE WHEN user_id % 10 = 2 AND event_type = 'signup'
        |      THEN 'converted' ELSE event_type END AS severity_text,
        | count(*) AS n
        |FROM events
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // EQUALITY-delete DML: svc-3 views reclassified 'vip' by upsertEq
    // (keyed retraction + same-sequence appends), svc-6 errors
    // retracted by deleteEq, read back through the exported chain of
    // interleaving-consistent snapshots (content=2 + equality_ids)
    "lake_iceberg_eqdml" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | CASE WHEN user_id % 10 = 3 AND event_type = 'view'
        |      THEN 'vip' ELSE event_type END AS severity_text,
        | count(*) AS n
        |FROM events
        |WHERE NOT (user_id % 10 = 6 AND event_type = 'error')
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // the CDC sink's two-batch changelog replayed in SQL: svc-5 view →
    // 'flagged' (lsn-2 winner; the even-event half deleted by batch 2),
    // svc-8 purchase deleted, svc-9 signup twinned as 'replayed'
    // inserts, svc-0 error → 'triaged' — read back through the
    // re-exported chain after eq→pos delete conversion
    "lake_cdc_apply" ->
      """SELECT service_name, severity_text, count(*) AS n FROM (
        |  SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        |    CASE WHEN user_id % 10 = 5 AND event_type = 'view' THEN 'flagged'
        |         WHEN user_id % 10 = 0 AND event_type = 'error' THEN 'triaged'
        |         ELSE event_type END AS severity_text
        |  FROM events
        |  WHERE NOT (user_id % 10 = 8 AND event_type = 'purchase')
        |    AND NOT (user_id % 10 = 5 AND event_type = 'view' AND event_id % 2 = 0)
        |  UNION ALL
        |  SELECT 'svc-9' AS service_name, 'replayed' AS severity_text
        |  FROM events WHERE user_id % 10 = 9 AND event_type = 'signup'
        |) GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // SCHEMA EVOLUTION: severity_text renamed to severity (id-bound,
    // metadata-only) and severity_number promoted int→long mid-chain;
    // 'cur' reads both generations folded under the new schema (the
    // post-evolution batch re-lands svc-0/1/2 as 'evolved' twins),
    // 'pre' time-travels to the pre-evolution snapshot under ITS OWN
    // schema-id (snapshot-schema semantics — old name, narrow int),
    // aligned to the current shape for the union
    "lake_evolve" ->
      """WITH sev AS (
        |  SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        |    event_type,
        |    CASE WHEN event_type = 'error' THEN 17
        |         WHEN event_type = 'signup' THEN 13
        |         WHEN event_type = 'purchase' THEN 9
        |         WHEN event_type = 'view' THEN 9 ELSE 5 END AS sev_num,
        |    user_id
        |  FROM events)
        |SELECT phase, service_name, severity, n, sum_sev FROM (
        |  SELECT 'cur' AS phase, service_name, event_type AS severity,
        |    count(*) AS n, CAST(sum(sev_num) AS BIGINT) AS sum_sev
        |  FROM sev GROUP BY 1,2,3
        |  UNION ALL
        |  SELECT 'cur', service_name, 'evolved', count(*),
        |    CAST(sum(sev_num) AS BIGINT)
        |  FROM sev WHERE user_id % 10 < 3 GROUP BY 1,2,3
        |  UNION ALL
        |  SELECT 'pre', service_name, event_type, count(*),
        |    CAST(sum(sev_num) AS BIGINT)
        |  FROM sev GROUP BY 1,2,3
        |) ORDER BY phase, service_name, severity""".stripMargin,
    // STAT-AXIS EVOLUTION: both zone-map axes renamed mid-life
    // (service_name→service, timestamp→event_time) on a FLAT lake;
    // the query is a windowed read on the RENAMED time axis grouped by
    // the renamed service axis, post-rename 'statted' twins included
    "lake_evolve_stats" ->
      """SELECT service, severity_text, n FROM (
        |  SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service,
        |    event_type AS severity_text, count(*) AS n
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-25 00:00:00'
        |  GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR), 'statted', count(*)
        |  FROM events
        |  WHERE user_id % 10 < 2
        |    AND ts >= TIMESTAMP '2024-01-05 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-25 00:00:00'
        |  GROUP BY 1
        |) ORDER BY service, severity_text""".stripMargin,
    // LAYOUT-COLUMN EVOLUTION: the partitioned lake's DIRECTORY KEY
    // (service_name= dirs) renamed to `service` mid-life — a
    // metadata-only layout alias; the equality filter binds the NEW
    // name and still partition-prunes (plan-asserted in the spec);
    // post-rename 'relaid' twins (svc-0/1, filter keeps svc-0) land
    // under the physical key and fold in
    "lake_evolve_layout" ->
      """SELECT service, severity_text, n FROM (
        |  SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service,
        |    event_type AS severity_text, count(*) AS n
        |  FROM events WHERE user_id % 10 IN (0, 3) GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'svc-0', 'relaid', count(*)
        |  FROM events WHERE user_id % 10 = 0
        |) ORDER BY service, severity_text""".stripMargin,
    // SNAPSHOT-SCHEMA TIME TRAVEL: 'pre' anchors before the body-drop
    // and still counts the dropped column's values; 'cur' reads the
    // post-drop schema with the 'afterdrop' twins
    "lake_travel_schema" ->
      """SELECT phase, service_name, severity_text, n, n_body FROM (
        |  SELECT 'pre' AS phase,
        |    'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        |    event_type AS severity_text, count(*) AS n,
        |    CAST(count(props) AS BIGINT) AS n_body
        |  FROM events GROUP BY 1, 2, 3
        |  UNION ALL
        |  SELECT 'cur', 'svc-' || CAST(user_id % 10 AS VARCHAR),
        |    event_type, count(*), CAST(NULL AS BIGINT)
        |  FROM events GROUP BY 1, 2, 3
        |  UNION ALL
        |  SELECT 'cur', 'svc-0', 'afterdrop', count(*), CAST(NULL AS BIGINT)
        |  FROM events WHERE user_id % 10 = 0
        |) ORDER BY phase, service_name, severity_text, n""".stripMargin,
    // PARTITION-SPEC EVOLUTION: the hourly generation (svc-0/1, spec 0)
    // plus its daily-layout 'daily' twins (spec 2) — hour comes from
    // dirs for the former and the data column for the latter, read
    // through one two-spec chain
    "lake_spec_evolve" ->
      """WITH win AS (
        |  SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        |    CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour, event_type
        |  FROM events
        |  WHERE user_id % 10 = 0 AND EXTRACT(year FROM ts) = 2024
        |    AND EXTRACT(month FROM ts) = 1
        |    AND EXTRACT(day FROM ts) BETWEEN 10 AND 14)
        |SELECT service_name, hour, severity_text, n FROM (
        |  SELECT service_name, hour, event_type AS severity_text,
        |    count(*) AS n
        |  FROM win GROUP BY 1,2,3
        |  UNION ALL
        |  SELECT service_name, hour, 'daily', count(*)
        |  FROM win GROUP BY 1,2,3
        |) ORDER BY service_name, hour, severity_text""".stripMargin,
    // the NATIVE multi-spec read of the same layout-flipped fixture —
    // identical truth, no export detour
    "lake_native_specs" ->
      """WITH win AS (
        |  SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        |    CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour, event_type
        |  FROM events
        |  WHERE user_id % 10 = 0 AND EXTRACT(year FROM ts) = 2024
        |    AND EXTRACT(month FROM ts) = 1
        |    AND EXTRACT(day FROM ts) BETWEEN 10 AND 14)
        |SELECT service_name, hour, severity_text, n FROM (
        |  SELECT service_name, hour, event_type AS severity_text,
        |    count(*) AS n
        |  FROM win GROUP BY 1,2,3
        |  UNION ALL
        |  SELECT service_name, hour, 'daily', count(*)
        |  FROM win GROUP BY 1,2,3
        |) ORDER BY service_name, hour, severity_text""".stripMargin,
    "lake_iceberg_mor" ->
      """SELECT n_regionkey, count(*) AS n, min(n_name) AS mn
        |FROM nation WHERE n_nationkey NOT IN (2, 7, 11, 14)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // RETENTION: everything before Jan 16 noon expired — full days
    // dropped metadata-only, the straddling day split by a position
    // delete — read back through the re-exported chain
    "lake_retention" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events WHERE ts >= TIMESTAMP '2024-01-16 12:00:00'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // the live REST-catalog round-trip must surface the SAME table —
    // identical oracle as lake_severity_by_service
    "lake_iceberg_rest" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // time travel to the FIRST snapshot of the incremental fixture:
    // that export covered exactly the day <= 15 half of the month
    "lake_iceberg_tt" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events WHERE EXTRACT(day FROM ts) <= 15
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "lake_rollup" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "lake_timeseries" ->
      """SELECT CAST(EXTRACT(day FROM ts) AS INTEGER) AS day,
        | CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
        | event_type AS severity_text, count(*) AS n
        |FROM events
        |WHERE user_id % 10 = 3 AND EXTRACT(year FROM ts) = 2024
        |  AND EXTRACT(month FROM ts) = 1 AND EXTRACT(day FROM ts) BETWEEN 10 AND 19
        |GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    "lake_resource_attrs" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | 'ns-' || CAST(user_id % 3 AS VARCHAR) AS namespace, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "lake_tail" ->
      """SELECT strftime(ts,'%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        | 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, 'graft' AS scope_name, props AS body
        |FROM events
        |WHERE EXTRACT(year FROM ts) = 2024 AND EXTRACT(month FROM ts) = 1
        |  AND EXTRACT(day FROM ts) BETWEEN 25 AND 31
        |ORDER BY ts_str DESC, service_name, severity_text, body LIMIT 1000""".stripMargin,
    "lake_needle" ->
      """SELECT md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id,
        | substring(md5(CAST(event_id AS VARCHAR)),1,16) AS span_id,
        | strftime(ts,'%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        | 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, props AS body
        |FROM events
        |WHERE user_id = 7 AND strftime(ts,'%Y-%m-%d') = '2024-01-15'
        |ORDER BY ts_str, span_id""".stripMargin,
    // the generic-column twin of lake_needle: the same chain certified
    // on span_id's own sidecar (LakeIndex.on)
    "lake_span_lookup" ->
      """SELECT md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id,
        | substring(md5(CAST(event_id AS VARCHAR)),1,16) AS span_id,
        | strftime(ts,'%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        | 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, props AS body
        |FROM events
        |WHERE event_id = 5
        |ORDER BY ts_str, span_id""".stripMargin,
    // the SQL route to the same sidecar lookup (graft_lake_lookup TVF)
    // — identical result set, identical oracle shape
    "lake_sql_lookup" ->
      """SELECT md5(CAST(user_id AS VARCHAR) || '/' || strftime(ts,'%Y-%m-%d')) AS trace_id,
        | substring(md5(CAST(event_id AS VARCHAR)),1,16) AS span_id,
        | strftime(ts,'%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        | 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, props AS body
        |FROM events
        |WHERE event_id = 5
        |ORDER BY ts_str, span_id""".stripMargin,
    "lake_grep" ->
      """SELECT strftime(ts,'%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        | 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, props AS body
        |FROM events
        |WHERE list_contains(string_split_regex(lower(props), '[^a-z0-9]+'), '69')
        |ORDER BY ts_str, service_name, severity_text, body""".stripMargin,
    "lake_dml" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events
        |WHERE NOT (user_id % 10 = 3 AND event_type = 'view')
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "lake_sql_dml" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events
        |WHERE NOT (user_id % 10 = 3 AND event_type = 'view')
        |  AND NOT (user_id % 10 = 7 AND event_type = 'signup')
        |  AND NOT (user_id % 10 = 5 AND event_type = 'click')
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // SQL time travel to the pre-DML instant resurrects every
    // lifecycle delete — oracle = the FULL events synthesis
    "lake_sql_travel" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // the readStream facade drains the whole lake: every appended row
    // exactly once, the MOR delete and the compaction rewrite
    // invisible — so the stream's truth is the FULL events synthesis
    "lake_stream_read" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // identical post-lifecycle state as lake_sql_dml — read via the
    // graft_lake SQL TVF instead of the Scala API
    "lake_sql_read" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events
        |WHERE NOT (user_id % 10 = 3 AND event_type = 'view')
        |  AND NOT (user_id % 10 = 7 AND event_type = 'signup')
        |  AND NOT (user_id % 10 = 5 AND event_type = 'click')
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "logs_search" ->
      """SELECT event_id, strftime(ts,'%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        | user_id, event_type, props
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
        |  AND props LIKE '%"k": 7%'
        |ORDER BY ts, event_id""".stripMargin,
    "logs_json_attrs" ->
      """SELECT CAST(json_extract_string(props,'$.k') AS INTEGER)%10 AS k_bucket,
        | count(*) AS n,
        | CAST(round(sum(CAST(value AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "logs_error_rate" ->
      """SELECT strftime(ts,'%Y-%m-%d') AS day, count(*) AS n_events,
        | CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        | round(CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS DOUBLE)/count(*),4) AS error_rate
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "logs_p95_value" ->
      """SELECT event_type, round(quantile_cont(value,0.5),4) AS p50,
        | round(quantile_cont(value,0.95),4) AS p95, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "logs_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, us,
        |    sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM e)
        |SELECT user_id, strftime(min(ts),'%Y-%m-%d %H:%M:%S.%f') AS session_start,
        | count(*) AS n_events, CAST(max(us)-min(us) AS BIGINT) AS duration_us
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_start""".stripMargin,
    "logs_topk_users" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(round(sum(CAST(value AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1
        |ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin,
    "logs_dau" ->
      """SELECT strftime(ts,'%Y-%m-%d') AS day,
        | count(DISTINCT user_id) AS dau, count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "logs_otlp_roundtrip" ->
      """SELECT 'svc-' || CAST(user_id AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n,
        | strftime(min(ts),'%Y-%m-%d %H:%M:%S.%f') AS first_ts,
        | strftime(max(ts),'%Y-%m-%d %H:%M:%S.%f') AS last_ts
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "logs_exemplars" ->
      """WITH e AS (SELECT event_type, strftime(ts,'%Y-%m-%d') AS day, event_id,
        |  md5(CAST(event_id AS VARCHAR)) AS h FROM events),
        |r AS (SELECT event_type, day, event_id,
        |  row_number() OVER (PARTITION BY event_type, day ORDER BY h, event_id) AS rk
        | FROM e)
        |SELECT event_type, day, CAST(rk AS INTEGER) AS rk, event_id
        |FROM r WHERE rk <= 3 ORDER BY event_type, day, rk""".stripMargin,
    // same direct aggregate: the protobuf wire round-trip must land the
    // identical rows as the JSON transport
    "logs_otlp_proto" ->
      """SELECT 'svc-' || CAST(user_id AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n,
        | strftime(min(ts),'%Y-%m-%d %H:%M:%S.%f') AS first_ts,
        | strftime(max(ts),'%Y-%m-%d %H:%M:%S.%f') AS last_ts
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // md5 over the payload BYTES == DuckDB md5 over the source string
    // (payload = the text's UTF-8 encoding); same injected re-crawl
    "mm_dedup" ->
      """WITH m AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 25 = 0)
        |SELECT md5(text) AS media_md5, count(*) AS n_copies,
        | CAST(min(doc_id) AS BIGINT) AS keeper
        |FROM m GROUP BY 1 HAVING count(*) > 1 ORDER BY media_md5""".stripMargin,
    "mm_pipeline" ->
      """SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |  WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        | count(*) AS n_docs, CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        | len(list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0)) AS n_tokens,
        | len(list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x->len(x)>0)) AS n_words,
        | CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_stats" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS tk
        | FROM documents)
        |SELECT doc_id, len(text) AS n_chars_calc, len(tk) AS n_tokens,
        | len(text) - len(regexp_replace(text,'[.,!?;:]','','g')) AS punct_n,
        | len(list_filter(tk, x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS stop_hits,
        | round(least(1.0, CAST(len(tk) AS DOUBLE)/100.0)*0.5 +
        |   (CAST(len(list_filter(tk, x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS DOUBLE)
        |    / greatest(len(tk),1))*0.5, 4) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT doc_id, lang, text,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS tk
        | FROM documents),
        |s AS (SELECT lang,
        |  len(list_filter(tk, x -> x IN ('the','a','and','of','to','is'))) AS s_en,
        |  len(list_filter(tk, x -> x IN ('el','los','las','una','y','que'))) AS s_es,
        |  len(list_filter(tk, x -> x IN ('der','die','das','und','ist','nicht'))) AS s_de,
        |  len(list_filter(tk, x -> x IN ('le','les','des','et','est','une'))) AS s_fr,
        |  regexp_matches(text, '[\x{4e00}-\x{9fff}]') AS zh
        | FROM t)
        |SELECT lang,
        | CASE WHEN zh THEN 'zh'
        |      WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
        |      WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
        |      WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
        |      WHEN s_fr > 0 THEN 'fr'
        |      ELSE 'unknown' END AS pred_lang,
        | count(*) AS n
        |FROM s GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "text_fingerprint" ->
      """WITH f AS (SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0))),' ')) AS fp
        | FROM documents)
        |SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS cluster_n
        |FROM f ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """WITH f AS (SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0))),' ')) AS h
        | FROM documents)
        |SELECT h, count(*) AS n_docs, min(doc_id) AS keeper
        |FROM f GROUP BY h HAVING count(*) > 1 ORDER BY h""".stripMargin,
    // integer micro-nats: M(x)=round(1e6*ln x); entropy=(M(n)*n - sum c*M(c)) // n.
    // Every intermediate is a BIGINT, so the value is order-independent and
    // bit-exact across engines (see graft.functions.CharEntropy).
    "text_entropy" ->
      """WITH f AS (
        |  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split_regex(text, '')) AS ch FROM documents) u
        |  GROUP BY doc_id, ch),
        |s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |        CAST(sum(c * CAST(round(1000000*ln(c)) AS BIGINT)) AS BIGINT) AS t
        |      FROM f GROUP BY doc_id)
        |SELECT doc_id,
        |  (CAST(round(1000000*ln(n)) AS BIGINT) * n - t) // n AS ent_unats,
        |  ((CAST(round(1000000*ln(n)) AS BIGINT) * n - t) // n) BETWEEN 2000000 AND 4800000
        |    AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t
        | FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |sh3 AS (SELECT doc_id,
        |  w || ' ' || lead(w,1) OVER (PARTITION BY doc_id ORDER BY i)
        |    || ' ' || lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) AS s
        | FROM tok QUALIFY lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh3),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2)
        |SELECT p.da, p.db,
        | round(CAST(p.inter AS DOUBLE)/(sa.n+sb.n-p.inter),4) AS j
        |FROM pairs p JOIN sz sa ON p.da=sa.doc_id JOIN sz sb ON p.db=sb.doc_id
        |WHERE CAST(p.inter AS DOUBLE)/(sa.n+sb.n-p.inter) >= 0.8
        |ORDER BY p.da, p.db""".stripMargin,
    "split_leakage" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t
        | FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |sh3 AS (SELECT doc_id,
        |  w || ' ' || lead(w,1) OVER (PARTITION BY doc_id ORDER BY i)
        |    || ' ' || lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) AS s
        | FROM tok QUALIFY lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh3),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2),
        |je AS (SELECT p.da, p.db
        |  FROM pairs p JOIN sz sa ON p.da=sa.doc_id JOIN sz sb ON p.db=sb.doc_id
        |  WHERE CAST(p.inter AS DOUBLE)/(sa.n+sb.n-p.inter) >= 0.8),
        |sp AS (SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < 'f0' THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < 'f8' THEN 'val'
        |       ELSE 'test' END AS split FROM documents),
        |e AS (SELECT j.da, j.db, a.split AS sa, b.split AS sb
        |  FROM je j JOIN sp a ON j.da=a.doc_id JOIN sp b ON j.db=b.doc_id
        |  WHERE a.split <> b.split)
        |SELECT least(sa,sb) AS split_lo, greatest(sa,sb) AS split_hi,
        | count(*) AS n_edges,
        | string_agg(CAST(da AS VARCHAR) || ':' || CAST(db AS VARCHAR), ','
        |   ORDER BY da, db) AS edges
        |FROM e GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // real WITH RECURSIVE transitive closure replays the engine's
    // HashMin connected components on the small edge set — upgrades
    // the iterative operator from rows-only to hash-match
    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t
        | FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |sh3 AS (SELECT doc_id,
        |  w || ' ' || lead(w,1) OVER (PARTITION BY doc_id ORDER BY i)
        |    || ' ' || lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) AS s
        | FROM tok QUALIFY lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh3),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2),
        |je AS (SELECT p.da, p.db
        |  FROM pairs p JOIN sz sa ON p.da=sa.doc_id JOIN sz sb ON p.db=sb.doc_id
        |  WHERE CAST(p.inter AS DOUBLE)/(sa.n+sb.n-p.inter) >= 0.8),
        |sym AS (SELECT da AS a, db AS b FROM je UNION SELECT db, da FROM je),
        |verts AS (SELECT DISTINCT a FROM sym),
        |r(a, b) AS (SELECT a, a FROM verts
        |  UNION SELECT r.a, s.b FROM r JOIN sym s ON r.b = s.a)
        |SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    // the same edge-set CTE chain as dedup_clusters, then 5 unrolled
    // integer-micro-unit PageRank rounds — every engine-side op is
    // integer division, so the trajectory hash-matches exactly
    "dedup_rank" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t
        | FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |sh3 AS (SELECT doc_id,
        |  w || ' ' || lead(w,1) OVER (PARTITION BY doc_id ORDER BY i)
        |    || ' ' || lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) AS s
        | FROM tok QUALIFY lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh3),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2),
        |je AS (SELECT p.da, p.db
        |  FROM pairs p JOIN sz sa ON p.da=sa.doc_id JOIN sz sb ON p.db=sb.doc_id
        |  WHERE CAST(p.inter AS DOUBLE)/(sa.n+sb.n-p.inter) >= 0.8),
        |sym AS (SELECT da AS src, db AS dst FROM je UNION ALL SELECT db, da FROM je),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
        |r0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS r FROM deg),
        |c1 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r0 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r1 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c1.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c1 ON d.src=c1.dst),
        |c2 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r1 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r2 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c2.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c2 ON d.src=c2.dst),
        |c3 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r2 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r3 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c3.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c3 ON d.src=c3.dst),
        |c4 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r3 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r4 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c4.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c4 ON d.src=c4.dst),
        |c5 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r4 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r5 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c5.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c5 ON d.src=c5.dst)
        |SELECT d.src AS doc_id, d.deg AS degree, r5.r AS rank_micro
        |FROM r5 JOIN deg d ON r5.id=d.src ORDER BY doc_id""".stripMargin,
    // composes the recursive-CTE closure (clusters) with the unrolled
    // integer PageRank chain (centrality), then argmax-per-cluster with
    // min-doc_id tie-break — certifies the full keeper-selection
    // composition, not just its two hash-proven pieces
    "dedup_canonical" ->
      """WITH RECURSIVE toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t
        | FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |sh3 AS (SELECT doc_id,
        |  w || ' ' || lead(w,1) OVER (PARTITION BY doc_id ORDER BY i)
        |    || ' ' || lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) AS s
        | FROM tok QUALIFY lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh3),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2),
        |je AS (SELECT p.da, p.db
        |  FROM pairs p JOIN sz sa ON p.da=sa.doc_id JOIN sz sb ON p.db=sb.doc_id
        |  WHERE CAST(p.inter AS DOUBLE)/(sa.n+sb.n-p.inter) >= 0.8),
        |symc AS (SELECT da AS a, db AS b FROM je UNION SELECT db, da FROM je),
        |verts AS (SELECT DISTINCT a FROM symc),
        |rc(a, b) AS (SELECT a, a FROM verts
        |  UNION SELECT rc.a, s.b FROM rc JOIN symc s ON rc.b = s.a),
        |cl AS (SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster
        |  FROM rc GROUP BY 1),
        |sym AS (SELECT da AS src, db AS dst FROM je UNION ALL SELECT db, da FROM je),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
        |r0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS r FROM deg),
        |c1 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r0 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r1 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c1.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c1 ON d.src=c1.dst),
        |c2 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r1 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r2 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c2.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c2 ON d.src=c2.dst),
        |c3 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r2 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r3 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c3.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c3 ON d.src=c3.dst),
        |c4 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r3 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r4 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c4.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c4 ON d.src=c4.dst),
        |c5 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r4 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r5 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c5.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c5 ON d.src=c5.dst),
        |lab AS (SELECT cl.doc_id, cl.cluster, r5.r AS rank_micro
        |  FROM cl JOIN r5 ON cl.doc_id = r5.id),
        |top AS (SELECT cluster, max(rank_micro) AS rank_micro,
        |  CAST(count(*) AS BIGINT) AS n_members FROM lab GROUP BY 1)
        |SELECT t.cluster, CAST(min(l.doc_id) AS BIGINT) AS canonical_id,
        |  t.rank_micro, t.n_members
        |FROM lab l JOIN top t
        |  ON l.cluster = t.cluster AND l.rank_micro = t.rank_micro
        |GROUP BY 1, 3, 4 ORDER BY 1""".stripMargin,
    // the corpus-wide materialization of the canonical decision: same
    // closure+PageRank composition, then a per-document status tag
    "dedup_keep" ->
      """WITH RECURSIVE toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t
        | FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |sh3 AS (SELECT doc_id,
        |  w || ' ' || lead(w,1) OVER (PARTITION BY doc_id ORDER BY i)
        |    || ' ' || lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) AS s
        | FROM tok QUALIFY lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh3),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2),
        |je AS (SELECT p.da, p.db
        |  FROM pairs p JOIN sz sa ON p.da=sa.doc_id JOIN sz sb ON p.db=sb.doc_id
        |  WHERE CAST(p.inter AS DOUBLE)/(sa.n+sb.n-p.inter) >= 0.8),
        |symc AS (SELECT da AS a, db AS b FROM je UNION SELECT db, da FROM je),
        |verts AS (SELECT DISTINCT a FROM symc),
        |rc(a, b) AS (SELECT a, a FROM verts
        |  UNION SELECT rc.a, s.b FROM rc JOIN symc s ON rc.b = s.a),
        |cl AS (SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster
        |  FROM rc GROUP BY 1),
        |sym AS (SELECT da AS src, db AS dst FROM je UNION ALL SELECT db, da FROM je),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
        |r0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS r FROM deg),
        |c1 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r0 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r1 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c1.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c1 ON d.src=c1.dst),
        |c2 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r1 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r2 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c2.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c2 ON d.src=c2.dst),
        |c3 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r2 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r3 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c3.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c3 ON d.src=c3.dst),
        |c4 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r3 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r4 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c4.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c4 ON d.src=c4.dst),
        |c5 AS (SELECT e.dst, sum(r.r // g.deg) AS s FROM sym e
        |  JOIN r4 r ON e.src=r.id JOIN deg g ON e.src=g.src GROUP BY 1),
        |r5 AS (SELECT d.src AS id,
        |  CAST(150000 + (85 * coalesce(c5.s,0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN c5 ON d.src=c5.dst),
        |lab AS (SELECT cl.doc_id, cl.cluster, r5.r AS rank_micro
        |  FROM cl JOIN r5 ON cl.doc_id = r5.id),
        |top AS (SELECT cluster, max(rank_micro) AS rank_micro
        |  FROM lab GROUP BY 1),
        |canon AS (SELECT t.cluster,
        |  CAST(min(l.doc_id) AS BIGINT) AS canonical_id
        |  FROM lab l JOIN top t
        |    ON l.cluster = t.cluster AND l.rank_micro = t.rank_micro
        |  GROUP BY 1)
        |SELECT d.doc_id, d.source,
        |  CASE WHEN cl.cluster IS NULL THEN 'unique'
        |       WHEN d.doc_id = cn.canonical_id THEN 'canonical'
        |       ELSE 'drop' END AS status
        |FROM documents d
        |LEFT JOIN cl ON d.doc_id = cl.doc_id
        |LEFT JOIN canon cn ON cl.cluster = cn.cluster
        |ORDER BY d.doc_id""".stripMargin,
    "corpus_split_clean" ->
      """WITH RECURSIVE toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t
        | FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |sh3 AS (SELECT doc_id,
        |  w || ' ' || lead(w,1) OVER (PARTITION BY doc_id ORDER BY i)
        |    || ' ' || lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) AS s
        | FROM tok QUALIFY lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh3),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2),
        |je AS (SELECT p.da, p.db
        |  FROM pairs p JOIN sz sa ON p.da=sa.doc_id JOIN sz sb ON p.db=sb.doc_id
        |  WHERE CAST(p.inter AS DOUBLE)/(sa.n+sb.n-p.inter) >= 0.8),
        |sym AS (SELECT da AS a, db AS b FROM je UNION SELECT db, da FROM je),
        |verts AS (SELECT DISTINCT a FROM sym),
        |r(a, b) AS (SELECT a, a FROM verts
        |  UNION SELECT r.a, s.b FROM r JOIN sym s ON r.b = s.a),
        |lab AS (SELECT a AS doc_id, min(b) AS cluster FROM r GROUP BY 1),
        |sp AS (SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < 'f0' THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < 'f8' THEN 'val'
        |       ELSE 'test' END AS split FROM documents)
        |SELECT d.doc_id, d.source, sp.split AS split_orig,
        | coalesce(ks.split, sp.split) AS split
        |FROM documents d
        |JOIN sp ON sp.doc_id = d.doc_id
        |LEFT JOIN lab ON lab.doc_id = d.doc_id
        |LEFT JOIN sp ks ON ks.doc_id = lab.cluster
        |ORDER BY d.doc_id""".stripMargin,
    "corpus_curate" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS tk
        | FROM documents),
        |s AS (SELECT doc_id, len(tk) AS n_tokens,
        |  len(list_filter(tk, x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS stop_hits,
        |  md5(array_to_string(list_sort(list_distinct(tk)),' ')) AS fp
        | FROM t),
        |q AS (SELECT doc_id, n_tokens,
        |  round(least(1.0, CAST(n_tokens AS DOUBLE)/100.0)*0.5 +
        |    (CAST(stop_hits AS DOUBLE)/greatest(n_tokens,1))*0.5, 4) AS quality,
        |  min(doc_id) OVER (PARTITION BY fp) AS keeper
        | FROM s)
        |SELECT doc_id, n_tokens, quality,
        | CASE WHEN n_tokens < 20 THEN 'short'
        |      WHEN quality < 0.25 THEN 'low_quality'
        |      WHEN doc_id <> keeper THEN 'duplicate'
        |      ELSE 'keep' END AS reason
        |FROM q ORDER BY doc_id""".stripMargin,
    "sample_per_group" ->
      """SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM (
        | SELECT lang, doc_id,
        |  row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
        | FROM documents)
        |WHERE rn <= 5 ORDER BY lang, h""".stripMargin,
    "contamination" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |sh5 AS (SELECT doc_id,
        |  w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win
        |    || ' ' || lead(w,3) OVER win || ' ' || lead(w,4) OVER win AS s
        | FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        | QUALIFY lead(w,4) OVER win IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh5),
        |test AS (SELECT DISTINCT s FROM sh WHERE doc_id < 20)
        |SELECT doc_id, count(*) AS n_hits
        |FROM sh WHERE doc_id >= 20 AND s IN (SELECT s FROM test)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x->CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v,v)) AS nrm FROM e)
        |SELECT a.vec_id AS va, b.vec_id AS vb,
        | round(list_dot_product(a.v,b.v)/(a.nrm*b.nrm),4) AS cos
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v,b.v)/(a.nrm*b.nrm) >= 0.45
        |ORDER BY va, vb""".stripMargin,
    "text_quality_rules" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t,
        |  len(regexp_replace(lower(text), '\s+', '', 'g')) AS chars FROM documents),
        |m AS (SELECT doc_id, len(t) AS n_words, chars,
        |  CAST(list_contains(t,'the') AS INT) + CAST(list_contains(t,'a') AS INT)
        |   + CAST(list_contains(t,'of') AS INT) + CAST(list_contains(t,'to') AS INT)
        |   + CAST(list_contains(t,'and') AS INT) + CAST(list_contains(t,'in') AS INT) AS stop_hits
        | FROM toks)
        |SELECT doc_id, n_words,
        | round(CAST(chars AS DOUBLE)/n_words, 4) AS mean_wlen, stop_hits,
        | ((n_words BETWEEN 50 AND 100000)
        |   AND (CAST(chars AS DOUBLE)/n_words BETWEEN 2.0 AND 10.0)
        |   AND stop_hits >= 2) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |bg AS (SELECT doc_id, w || ' ' || lead(w,1) OVER win AS b
        |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        |  QUALIFY lead(w,1) OVER win IS NOT NULL),
        |bga AS (SELECT doc_id, count(DISTINCT b) AS d_bg, count(*) AS n_bg FROM bg GROUP BY 1),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1,2),
        |wca AS (SELECT doc_id, max(c) AS max_wc, CAST(sum(c) AS BIGINT) AS n_words FROM wc GROUP BY 1)
        |SELECT doc_id,
        | round(CAST(max_wc AS DOUBLE)/n_words, 4) AS top_word_frac,
        | round(1.0 - CAST(d_bg AS DOUBLE)/n_bg, 4) AS dup_2gram_frac,
        | ((CAST(max_wc AS DOUBLE)/n_words) <= 0.2
        |   AND (1.0 - CAST(d_bg AS DOUBLE)/n_bg) <= 0.3) AS keep
        |FROM wca JOIN bga USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_pii_scrub" ->
      """WITH aug AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |    || '.' || CAST(doc_id % 100 AS VARCHAR)
        |  ELSE text END AS a FROM documents)
        |SELECT doc_id,
        | len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        | len(regexp_extract_all(a, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        | md5(regexp_replace(regexp_replace(a,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS scrub_md5
        |FROM aug ORDER BY doc_id""".stripMargin,
    "dedup_phrases" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |sh5 AS (SELECT doc_id,
        |  w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win
        |    || ' ' || lead(w,3) OVER win || ' ' || lead(w,4) OVER win AS s
        | FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        | QUALIFY lead(w,4) OVER win IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh5)
        |SELECT s, CAST(count(*) AS BIGINT) AS n_docs FROM sh GROUP BY s
        |HAVING count(*) >= 2 ORDER BY n_docs DESC, s LIMIT 100""".stripMargin,
    // the injected boilerplate, the k-gram coverage and the scrub are
    // replayed verbatim: both engines must drop the same positions
    "dedup_spans" ->
      """WITH aug AS (SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 1
        |    THEN text || ' limited time offer click here to claim your free bonus now'
        |  ELSE text END AS a FROM documents),
        |toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(a),'\s+'), x->len(x)>0) AS t FROM aug),
        |grams AS (SELECT doc_id, t,
        |  unnest(range(0, greatest(len(t) - 4, 0))) AS i FROM toks),
        |g2 AS (SELECT doc_id, i, array_to_string(t[i+1:i+5], ' ') AS g FROM grams),
        |dup AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df
        |  FROM g2 GROUP BY 1) WHERE df >= 2),
        |starts AS (SELECT doc_id, i FROM g2 WHERE g IN (SELECT g FROM dup)),
        |offs AS (SELECT doc_id, i, unnest(range(0, 5)) AS off FROM starts),
        |covered AS (SELECT DISTINCT doc_id, i + off AS p FROM offs),
        |tok AS (SELECT doc_id, unnest(t) AS w,
        |  generate_subscripts(t,1) - 1 AS p FROM toks),
        |kept AS (SELECT tok.doc_id, tok.w, tok.p FROM tok
        |  LEFT JOIN covered c ON c.doc_id = tok.doc_id AND c.p = tok.p
        |  WHERE c.p IS NULL),
        |ka AS (SELECT doc_id, count(*) AS n_kept,
        |  md5(string_agg(w, ' ' ORDER BY p)) AS scrub_md5 FROM kept GROUP BY 1),
        |tot AS (SELECT doc_id, CAST(len(t) AS INT) AS n_tokens FROM toks)
        |SELECT t.doc_id, t.n_tokens,
        | CAST(t.n_tokens - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
        | coalesce(ka.scrub_md5, md5('')) AS scrub_md5
        |FROM tot t LEFT JOIN ka USING (doc_id) ORDER BY doc_id""".stripMargin,
    "pack_sequences" ->
      """WITH d AS (SELECT doc_id, source,
        |  len(list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0)) AS toks
        | FROM documents),
        |c AS (SELECT doc_id, source, toks,
        |  sum(toks) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
        |SELECT source, CAST((cum - toks) // 512 AS BIGINT) AS bin,
        | count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "text_chunk" ->
      """WITH d AS (SELECT doc_id, source,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t
        | FROM documents),
        |n AS (SELECT doc_id, source, t, len(t) AS n FROM d WHERE len(t) > 0),
        |c AS (SELECT doc_id, source, n, t,
        |  unnest(range(0, ((n - 1) // 96) + 1)) AS chunk_id FROM n)
        |SELECT doc_id, source, CAST(chunk_id AS BIGINT) AS chunk_id,
        | CAST(chunk_id * 96 AS BIGINT) AS start_tok,
        | CAST(least(128, n - chunk_id * 96) AS BIGINT) AS n_tok,
        | md5(array_to_string(t[CAST(chunk_id * 96 + 1 AS BIGINT) :
        |   CAST(least(n, chunk_id * 96 + 128) AS BIGINT)], ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "pack_manifest" ->
      """WITH d AS (SELECT doc_id, source,
        |  len(list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0)) AS toks
        | FROM documents),
        |c AS (SELECT doc_id, source, toks,
        |  sum(toks) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d),
        |b AS (SELECT doc_id, source, toks,
        |  CAST((cum - toks) // 512 AS BIGINT) AS bin,
        |  CAST((cum - toks) - ((cum - toks) // 512) * 512 AS BIGINT) AS "offset" FROM c)
        |SELECT source, bin,
        | string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST("offset" AS VARCHAR)
        |   || ':' || CAST(toks AS VARCHAR), ',' ORDER BY doc_id, "offset", toks) AS spans,
        | count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens
        |FROM b GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "lake_stats_prune" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-12' AND ts < TIMESTAMP '2024-01-14'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "corpus_split" ->
      """SELECT doc_id, source,
        | CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < 'f0' THEN 'train'
        |      WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < 'f8' THEN 'val'
        |      ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "corpus_mix" ->
      """WITH d AS (SELECT doc_id, source,
        |  len(list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0)) AS n_toks
        | FROM documents),
        |s AS (SELECT source, CAST(sum(n_toks) AS BIGINT) AS src_toks FROM d GROUP BY 1),
        |g AS (SELECT CAST(sum(src_toks) // 2 AS BIGINT) AS budget, count(*) AS ns FROM s),
        |t AS (SELECT s.source,
        |  CAST(floor(((CAST(g.budget AS DOUBLE) * (1.0 / CAST(g.ns AS DOUBLE)))
        |    / CAST(s.src_toks AS DOUBLE)) * 4294967296.0) AS BIGINT) AS th
        |  FROM s CROSS JOIN g)
        |SELECT d.doc_id, d.source, d.n_toks FROM d JOIN t ON d.source = t.source
        |WHERE t.th >= 4294967296
        |   OR upper(substr(md5(CAST(d.doc_id AS VARCHAR)),1,8)) < lpad(hex(t.th),8,'0')
        |ORDER BY d.doc_id""".stripMargin,
    "mix_temperature" ->
      """WITH d AS (SELECT doc_id, source,
        |  len(list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0)) AS n_toks
        | FROM documents),
        |s AS (SELECT source, CAST(sum(n_toks) AS BIGINT) AS src_toks FROM d GROUP BY 1),
        |q AS (SELECT source, src_toks,
        |  CAST(floor(sqrt(CAST(src_toks AS DOUBLE)) * 65536.0) AS BIGINT) AS w_q FROM s),
        |g AS (SELECT CAST(sum(src_toks) // 2 AS BIGINT) AS budget,
        |  CAST(sum(w_q) AS BIGINT) AS sum_w FROM q),
        |t AS (SELECT q.source,
        |  CAST(floor(((CAST(g.budget AS DOUBLE)
        |    * (CAST(q.w_q AS DOUBLE) / CAST(g.sum_w AS DOUBLE)))
        |    / CAST(q.src_toks AS DOUBLE)) * 4294967296.0) AS BIGINT) AS th
        |  FROM q CROSS JOIN g)
        |SELECT d.doc_id, d.source, d.n_toks FROM d JOIN t ON d.source = t.source
        |WHERE t.th >= 4294967296
        |   OR upper(substr(md5(CAST(d.doc_id AS VARCHAR)),1,8)) < lpad(hex(t.th),8,'0')
        |ORDER BY d.doc_id""".stripMargin,
    "mix_budget" ->
      """WITH d AS (SELECT doc_id, source,
        |  len(list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0)) AS n_toks,
        |  md5(CAST(doc_id AS VARCHAR)) AS ord
        | FROM documents),
        |c AS (SELECT doc_id, source, n_toks,
        |  CAST(sum(n_toks) OVER (PARTITION BY source ORDER BY ord) AS BIGINT) AS cum_toks
        | FROM d)
        |SELECT doc_id, source, n_toks, cum_toks FROM c
        |WHERE cum_toks <= 700 ORDER BY source, cum_toks""".stripMargin,
    "corpus_upsample" ->
      """WITH d AS (SELECT doc_id, source,
        |  len(list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0)) AS n_toks
        | FROM documents),
        |s AS (SELECT source, CAST(sum(n_toks) AS BIGINT) AS src_toks FROM d GROUP BY 1),
        |g AS (SELECT CAST(max(src_toks) * 2 AS BIGINT) AS target FROM s),
        |r AS (SELECT s.source,
        |  CASE WHEN s.src_toks = 0 THEN 1.0
        |       ELSE CAST(g.target AS DOUBLE) / CAST(s.src_toks AS DOUBLE) END AS rate
        |  FROM s CROSS JOIN g),
        |t AS (SELECT source, CAST(floor(rate) AS BIGINT) AS base,
        |  CAST(floor((rate - floor(rate)) * 4294967296.0) AS BIGINT) AS th FROM r),
        |c AS (SELECT d.doc_id, d.source,
        |  t.base + CASE WHEN upper(substr(md5(CAST(d.doc_id AS VARCHAR)),1,8))
        |                     < lpad(hex(t.th),8,'0') THEN 1 ELSE 0 END AS copies
        |  FROM d JOIN t ON d.source = t.source)
        |SELECT doc_id, source, unnest(range(0, copies)) AS epoch
        |FROM c ORDER BY doc_id, epoch""".stripMargin,
    // alpha = 1/2 makes every term dyadic-exact; left-associated sums match
    // the Spark expression's order, so ewma is bit-identical with no rounding
    "logs_trend" ->
      """WITH b AS (SELECT strftime(date_trunc('hour', ts),'%Y-%m-%d %H:%M:%S') AS bucket,
        |  event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1,2),
        |l AS (SELECT bucket, event_type, n,
        |  lag(n,1) OVER f AS l1, lag(n,2) OVER f AS l2, lag(n,3) OVER f AS l3,
        |  lag(n,4) OVER f AS l4, lag(n,5) OVER f AS l5
        | FROM b WINDOW f AS (PARTITION BY event_type ORDER BY bucket))
        |SELECT bucket, event_type, n,
        | (CAST(n AS DOUBLE) + coalesce(CAST(l1 AS DOUBLE),0)*0.5
        |   + coalesce(CAST(l2 AS DOUBLE),0)*0.25 + coalesce(CAST(l3 AS DOUBLE),0)*0.125
        |   + coalesce(CAST(l4 AS DOUBLE),0)*0.0625 + coalesce(CAST(l5 AS DOUBLE),0)*0.03125)
        | / (1.0 + (CASE WHEN l1 IS NULL THEN 0 ELSE 0.5 END)
        |   + (CASE WHEN l2 IS NULL THEN 0 ELSE 0.25 END)
        |   + (CASE WHEN l3 IS NULL THEN 0 ELSE 0.125 END)
        |   + (CASE WHEN l4 IS NULL THEN 0 ELSE 0.0625 END)
        |   + (CASE WHEN l5 IS NULL THEN 0 ELSE 0.03125 END)) AS ewma
        |FROM l ORDER BY bucket, event_type""".stripMargin,
    // one exact-integer division per row -> bit-identical, no rounding
    "logs_transitions" ->
      """WITH t AS (SELECT user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        | FROM events),
        |c AS (SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
        |      FROM t WHERE prev_type IS NOT NULL GROUP BY 1,2)
        |SELECT prev_type, event_type, n,
        | CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
        |FROM c ORDER BY prev_type, event_type""".stripMargin,
    // integer cross-multiplication verdicts (err*4 >= tot*factor for the
    // 25% budget): exact in any evaluation order on both engines
    "logs_slo_burn" ->
      """WITH b AS (SELECT strftime(date_trunc('hour', ts),'%Y-%m-%d %H:%M:%S') AS bucket,
        |  CAST(count(*) AS BIGINT) AS total,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
        | FROM events GROUP BY 1),
        |w AS (SELECT bucket, total, errors,
        |  CAST(sum(errors) OVER s AS BIGINT) AS err_s, CAST(sum(total) OVER s AS BIGINT) AS tot_s,
        |  CAST(sum(errors) OVER l AS BIGINT) AS err_l, CAST(sum(total) OVER l AS BIGINT) AS tot_l,
        |  count(total) OVER l AS n_l
        | FROM b WINDOW
        |  s AS (ORDER BY bucket ROWS BETWEEN 0 PRECEDING AND CURRENT ROW),
        |  l AS (ORDER BY bucket ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
        |SELECT bucket, total, errors, err_l, tot_l,
        | (n_l = 6 AND err_s * 4 >= tot_s * 1 AND err_l * 4 >= tot_l * 1) AS page
        |FROM w ORDER BY bucket""".stripMargin,
    "logs_anomaly" ->
      """WITH b AS (SELECT strftime(date_trunc('hour', ts),'%Y-%m-%d %H:%M:%S') AS bucket,
        |  event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1,2),
        |w AS (SELECT bucket, event_type, n,
        |  CAST(coalesce(sum(n) OVER f, 0) AS BIGINT) AS trailing_n,
        |  count(n) OVER f AS trailing_buckets
        | FROM b WINDOW f AS (PARTITION BY event_type ORDER BY bucket
        |   ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
        |SELECT bucket, event_type, n, trailing_n,
        | (trailing_buckets = 6 AND n * 6 > trailing_n * 2) AS is_anomaly
        |FROM w ORDER BY bucket, event_type""".stripMargin,
    "table_stats" ->
      """WITH a AS (SELECT count(*) AS n,
        |  CAST(count(DISTINCT l_quantity) AS BIGINT) AS ndv_qty,
        |  CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS ndv_px,
        |  CAST(count(DISTINCT l_linenumber) AS BIGINT) AS ndv_ln,
        |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS ndv_rf,
        |  CAST(count(DISTINCT l_shipdate) AS BIGINT) AS ndv_sd,
        |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
        |  CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_px,
        |  CAST(sum(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ln,
        |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_rf,
        |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_sd,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  min(l_extendedprice) AS min_px, max(l_extendedprice) AS max_px,
        |  CAST(min(l_linenumber) AS DOUBLE) AS min_ln, CAST(max(l_linenumber) AS DOUBLE) AS max_ln,
        |  min(l_returnflag) AS min_rf, max(l_returnflag) AS max_rf,
        |  min(strftime(l_shipdate,'%Y-%m-%d %H:%M:%S')) AS min_sd,
        |  max(strftime(l_shipdate,'%Y-%m-%d %H:%M:%S')) AS max_sd
        | FROM lineitem)
        |SELECT 'l_quantity' AS col_name, n, null_qty AS n_null, ndv_qty AS n_distinct,
        | min_qty AS min_num, max_qty AS max_num,
        | CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a
        |UNION ALL SELECT 'l_extendedprice', n, null_px, ndv_px, min_px, max_px, NULL, NULL FROM a
        |UNION ALL SELECT 'l_linenumber', n, null_ln, ndv_ln, min_ln, max_ln, NULL, NULL FROM a
        |UNION ALL SELECT 'l_returnflag', n, null_rf, ndv_rf,
        | CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min_rf, max_rf FROM a
        |UNION ALL SELECT 'l_shipdate', n, null_sd, ndv_sd,
        | CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min_sd, max_sd FROM a
        |ORDER BY col_name""".stripMargin,
    "logs_scope_attrs" ->
      """SELECT 'graft' AS scope_name,
        | '1.' || CAST(user_id % 2 AS VARCHAR) AS scope_version,
        | 'mod-' || CAST(user_id % 4 AS VARCHAR) AS module, count(*) AS n
        |FROM events WHERE event_type = 'error'
        |GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    "text_logprob" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
        |tf AS (SELECT doc_id, w, count(*) AS c_dw FROM tok GROUP BY 1,2),
        |freq AS (SELECT w, CAST(sum(c_dw) AS BIGINT) AS c_w FROM tf GROUP BY 1),
        |n AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_total FROM freq)
        |SELECT doc_id, CAST(sum(c_dw) AS BIGINT) AS n_tokens,
        | round(CAST(sum(c_dw * CAST(round(ln(c_w / n_total) * 1e6) AS BIGINT)) AS DOUBLE)
        |   / (CAST(sum(c_dw) AS DOUBLE) * 1e6), 4) AS avg_logprob
        |FROM tf JOIN freq USING (w) CROSS JOIN n
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q24_waiting_suppliers" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        |  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |SELECT s.l_suppkey AS suppkey, count(*) AS numwait FROM late s
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey=s.l_orderkey AND l2.l_suppkey<>s.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey=s.l_orderkey AND l3.l_suppkey<>s.l_suppkey)
        |GROUP BY 1 ORDER BY numwait DESC, suppkey LIMIT 10""".stripMargin,
    "q27_hierarchy" ->
      """WITH RECURSIVE r AS (
        |  SELECT c_custkey AS id, CAST(0 AS BIGINT) AS depth FROM customer WHERE c_custkey = 0
        |  UNION ALL
        |  SELECT c.c_custkey, r.depth + 1 FROM customer c
        |  JOIN r ON (c.c_custkey - 1) // 2 = r.id
        |  WHERE c.c_custkey > 0)
        |SELECT depth, count(*) AS n, min(id) AS min_key, max(id) AS max_key
        |FROM r GROUP BY depth ORDER BY depth""".stripMargin,
    "mm_frames" ->
      """WITH v AS (SELECT doc_id, strlen(text) AS len FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT doc_id, len,
        |  unnest(range(0, CAST(least(8, (len + 255) // 256) AS BIGINT))) AS frame_idx
        | FROM v)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        | CAST(least(256, len - frame_idx * 256) AS INT) AS n_bytes
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "q23_bucketed_join" ->
      s"""SELECT o_orderpriority, ${m2(DISC_PRICE)} AS revenue,
         | count(*) AS n_lines
         |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "dedup_incremental" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t
        | FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |sh3 AS (SELECT doc_id,
        |  w || ' ' || lead(w,1) OVER (PARTITION BY doc_id ORDER BY i)
        |    || ' ' || lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) AS s
        | FROM tok QUALIFY lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh3),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS new_id, b.doc_id AS old_id, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id%5=4 AND b.doc_id%5<>4 GROUP BY 1,2)
        |SELECT p.new_id, p.old_id,
        | round(CAST(p.inter AS DOUBLE)/(sa.n+sb.n-p.inter),4) AS j
        |FROM pairs p JOIN sz sa ON p.new_id=sa.doc_id JOIN sz sb ON p.old_id=sb.doc_id
        |WHERE CAST(p.inter AS DOUBLE)/(sa.n+sb.n-p.inter) >= 0.8
        |ORDER BY p.new_id, p.old_id""".stripMargin,
    "contamination_bloom" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |sh5 AS (SELECT doc_id,
        |  w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win
        |    || ' ' || lead(w,3) OVER win || ' ' || lead(w,4) OVER win AS s
        | FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        | QUALIFY lead(w,4) OVER win IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh5),
        |test AS (SELECT DISTINCT s FROM sh WHERE doc_id < 20)
        |SELECT doc_id, count(*) AS n_hits
        |FROM sh WHERE doc_id >= 20 AND s IN (SELECT s FROM test)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ann_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x->CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v,v)) AS nrm FROM e),
        |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
        |ranked AS (
        | SELECT q.q_id, n.vec_id,
        |  list_dot_product(q.qv,n.v)/(q.qn*n.nrm) AS cos,
        |  row_number() OVER (PARTITION BY q.q_id
        |    ORDER BY list_dot_product(q.qv,n.v)/(q.qn*n.nrm) DESC, n.vec_id) AS rank
        | FROM q JOIN n ON n.vec_id <> q.q_id)
        |SELECT q_id, vec_id, rank, round(cos,4) AS cos
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "logs_funnel" ->
      """WITH s1 AS (SELECT user_id,
        |  min(ts) FILTER (WHERE event_type = 'view') AS t1 FROM events GROUP BY user_id),
        |s2 AS (SELECT s1.user_id, s1.t1, min(e.ts) AS t2
        | FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id AND e.event_type = 'click'
        |   AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOUR
        | GROUP BY s1.user_id, s1.t1),
        |s3 AS (SELECT s2.user_id, s2.t1, s2.t2, min(e.ts) AS t3
        | FROM s2 LEFT JOIN events e ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        |   AND e.ts > s2.t2 AND e.ts <= s2.t1 + INTERVAL 24 HOUR
        | GROUP BY s2.user_id, s2.t1, s2.t2)
        |SELECT CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage,
        |       count(*) AS n_users
        |FROM s3 GROUP BY 1 ORDER BY 1""".stripMargin,
    "logs_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort FROM ud),
        |f AS (SELECT cohort, user_id,
        |   max(CASE WHEN day = cohort + 1 THEN 1 ELSE 0 END) AS f1,
        |   max(CASE WHEN day = cohort + 7 THEN 1 ELSE 0 END) AS f7
        | FROM c GROUP BY cohort, user_id)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort, count(*) AS n_users,
        |  CAST(sum(f1) AS BIGINT) AS d1, CAST(sum(f7) AS BIGINT) AS d7
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "logs_gap_fill" ->
      """WITH axis AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
        |    TIMESTAMP '2024-01-08 00:00:00' - INTERVAL 5 MINUTE, INTERVAL 5 MINUTE)) AS b),
        |cnt AS (SELECT
        |  make_timestamp(CAST(floor(epoch_us(ts)/300000000)*300000000 AS BIGINT)) AS b,
        |  count(*) AS cnt FROM events
        | WHERE event_type = 'signup' AND ts >= TIMESTAMP '2024-01-05'
        |   AND ts < TIMESTAMP '2024-01-08'
        | GROUP BY 1)
        |SELECT strftime(axis.b, '%Y-%m-%d %H:%M:%S') AS bucket,
        |       CAST(coalesce(cnt.cnt, 0) AS BIGINT) AS n
        |FROM axis LEFT JOIN cnt ON axis.b = cnt.b ORDER BY 1""".stripMargin,
    "logs_patterns" ->
      """SELECT regexp_replace(event_type || ' ' || props, '[0-9]+', '#', 'g') AS template,
        |       count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY n DESC, template LIMIT 20""".stripMargin,
    "bpe_pairs" ->
      """WITH w AS (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |    x -> len(x) > 0)) AS word FROM documents),
        |v AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
        |p AS (SELECT substring(word, i, 2) AS pair, cnt
        |  FROM v, unnest(generate_series(1, len(word)-1)) AS t(i)
        |  WHERE len(word) >= 2)
        |SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
        |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin,
    "lake_cluster" ->
      """SELECT event_type AS severity_text, count(*) AS n
        |FROM events
        |WHERE user_id % 10 = 3
        |  AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // REGISTRY REWRITE (LogCompact.rewriteManifests — Iceberg's
    // rewrite_manifests for the control plane): both registries
    // consolidated after three sync rounds + a MOR delete; the rewrite
    // is metadata-only and row-preserving, so the table equals events
    // minus the MOR-deleted slice — any lost registration or dropped
    // delete entry breaks the hash
    "lake_rewrite_manifests" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events
        |WHERE NOT (user_id % 10 = 2 AND event_type = 'click')
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "logs_histogram" ->
      """SELECT event_type, CAST(floor(value/25.0) AS BIGINT) AS bin,
        | round(CAST(floor(value/25.0) AS BIGINT)*25.0, 2) AS lo,
        | round((CAST(floor(value/25.0) AS BIGINT)+1)*25.0, 2) AS hi,
        | count(*) AS n,
        | CAST(round(sum(CAST(value AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "corpus_stats" ->
      """WITH d AS (SELECT source,
        |  len(list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0)) AS toks
        | FROM documents)
        |SELECT source, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS total_toks,
        | min(toks) AS min_toks, round(avg(toks),4) AS mean_toks,
        | round(quantile_cont(toks,0.5),4) AS median_toks,
        | round(quantile_cont(toks,0.9),4) AS p90_toks, max(toks) AS max_toks
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_toxicity" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS tk
        | FROM documents),
        |m AS (SELECT doc_id, len(tk) AS n_tokens,
        |  len(list_filter(tk, x -> list_contains(['slow','crash','kill'], x))) AS n_flagged
        | FROM t)
        |SELECT doc_id, n_tokens, n_flagged,
        | round(CAST(n_flagged AS DOUBLE)/greatest(n_tokens,1), 4) AS flag_frac,
        | (CAST(n_flagged AS DOUBLE)/greatest(n_tokens,1) <= 0.02) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "text_line_dedup" ->
      """WITH aug AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN text || ' please subscribe to our newsletter today'
        |  ELSE text END AS a FROM documents),
        |toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(a),'\s+'), x->len(x)>0) AS t FROM aug),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |lines AS (SELECT doc_id, (i-1)//5 AS line_id,
        |  string_agg(w, ' ' ORDER BY i) AS line FROM tok GROUP BY 1,2),
        |heavy AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS df
        |  FROM lines GROUP BY 1) WHERE df >= 3),
        |kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM heavy)),
        |tot AS (SELECT doc_id, CAST(count(*) AS INT) AS n_lines FROM lines GROUP BY 1),
        |ka AS (SELECT doc_id, count(*) AS n_kept,
        |  md5(string_agg(line, ' ' ORDER BY line_id)) AS scrub_md5 FROM kept GROUP BY 1)
        |SELECT t.doc_id, t.n_lines,
        | CAST(t.n_lines - coalesce(ka.n_kept,0) AS BIGINT) AS n_dropped,
        | coalesce(ka.scrub_md5, md5('')) AS scrub_md5
        |FROM tot t LEFT JOIN ka USING (doc_id) ORDER BY doc_id""".stripMargin,
    "ann_filtered" ->
      """WITH e AS (SELECT vec_id, label,
        |  list_transform(embedding, x->CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v,v)) AS nrm FROM e),
        |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
        |  FROM n WHERE vec_id < 10),
        |ranked AS (
        | SELECT q.q_id, n.label, n.vec_id,
        |  list_dot_product(q.qv,n.v)/(q.qn*n.nrm) AS cos,
        |  row_number() OVER (PARTITION BY q.q_id
        |    ORDER BY list_dot_product(q.qv,n.v)/(q.qn*n.nrm) DESC, n.vec_id) AS rank
        | FROM q JOIN n ON n.label = q.q_label AND n.vec_id <> q.q_id)
        |SELECT q_id, label, vec_id, rank, round(cos,4) AS cos
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "q25_full_outer" ->
      """WITH e AS (SELECT CAST(floor(value/5) AS BIGINT) AS bin, count(*) AS n_error
        |  FROM events WHERE event_type='error' GROUP BY 1),
        |p AS (SELECT CAST(floor(value/5) AS BIGINT) AS bin, count(*) AS n_purchase
        |  FROM events WHERE event_type='purchase' GROUP BY 1)
        |SELECT coalesce(e.bin, p.bin) AS bin,
        | coalesce(e.n_error, 0) AS n_error,
        | coalesce(p.n_purchase, 0) AS n_purchase,
        | (e.bin IS NULL OR p.bin IS NULL) AS one_sided
        |FROM e FULL OUTER JOIN p ON e.bin = p.bin
        |ORDER BY bin""".stripMargin,
    "lake_changes" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events WHERE ts >= TIMESTAMP '2024-01-16'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "lake_merged" ->
      """SELECT event_type AS severity_text,
        | CASE WHEN ts < TIMESTAMP '2024-01-16' THEN '(pre-evolution)' ELSE '1.0' END AS ver,
        | count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "lake_branch" ->
      """SELECT 'svc-' || CAST(user_id % 10 AS VARCHAR) AS service_name,
        | event_type AS severity_text, count(*) AS n
        |FROM events WHERE ts < TIMESTAMP '2024-01-16'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "text_bigram_logprob" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |bgr AS (SELECT doc_id, w, lead(w,1) OVER win AS w2
        |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        |  QUALIFY lead(w,1) OVER win IS NOT NULL),
        |bg AS (SELECT doc_id, w, w2, count(*) AS c_dab FROM bgr GROUP BY 1,2,3),
        |pair AS (SELECT w, w2, sum(c_dab) AS c2 FROM bg GROUP BY 1,2),
        |ctx AS (SELECT w, sum(c2) AS c1 FROM pair GROUP BY 1)
        |SELECT doc_id, CAST(sum(c_dab) AS BIGINT) AS n_bigrams,
        | round(CAST(sum(c_dab * CAST(round(ln(CAST(c2 AS DOUBLE)/c1)*1e6) AS BIGINT)) AS DOUBLE)
        |   / (CAST(sum(c_dab) AS DOUBLE) * 1e6), 4) AS avg_logprob
        |FROM bg JOIN pair USING (w, w2) JOIN ctx USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_trigram_logprob" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t,1) AS i FROM toks),
        |tgr AS (SELECT doc_id, w, lead(w,1) OVER win AS w2, lead(w,2) OVER win AS w3
        |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        |  QUALIFY lead(w,2) OVER win IS NOT NULL),
        |tg AS (SELECT doc_id, w, w2, w3, CAST(count(*) AS BIGINT) AS k FROM tgr GROUP BY 1,2,3,4),
        |tri AS (SELECT w, w2, w3, CAST(sum(k) AS BIGINT) AS c3 FROM tg
        |  WHERE doc_id % 2 = 0 GROUP BY 1,2,3),
        |ctx2 AS (SELECT w, w2, CAST(sum(c3) AS BIGINT) AS n3 FROM tri GROUP BY 1,2),
        |bi AS (SELECT w2, w3, CAST(sum(c3) AS BIGINT) AS b2 FROM tri GROUP BY 1,2),
        |ctx1 AS (SELECT w2, CAST(sum(b2) AS BIGINT) AS n1 FROM bi GROUP BY 1),
        |uni AS (SELECT w3, CAST(sum(c3) AS BIGINT) AS u1 FROM tri GROUP BY 1),
        |nt AS (SELECT CAST(sum(c3) AS BIGINT) AS nn FROM tri),
        |sc AS (SELECT g.doc_id, g.k,
        |  CASE WHEN t.c3 IS NOT NULL
        |       THEN CAST(round(ln(CAST(t.c3 AS DOUBLE)/c2.n3)*1e6) AS BIGINT)
        |       WHEN b.b2 IS NOT NULL
        |       THEN CAST(round(ln(0.5 * CAST(b.b2 AS DOUBLE)/c1.n1)*1e6) AS BIGINT)
        |       ELSE CAST(round(ln(0.25 * CAST(coalesce(u.u1,1) AS DOUBLE)/n.nn)*1e6) AS BIGINT)
        |  END AS lp,
        |  CASE WHEN t.c3 IS NULL THEN g.k ELSE 0 END AS bo
        | FROM tg g
        | LEFT JOIN tri t ON g.w=t.w AND g.w2=t.w2 AND g.w3=t.w3
        | LEFT JOIN ctx2 c2 ON g.w=c2.w AND g.w2=c2.w2
        | LEFT JOIN bi b ON g.w2=b.w2 AND g.w3=b.w3
        | LEFT JOIN ctx1 c1 ON g.w2=c1.w2
        | LEFT JOIN uni u ON g.w3=u.w3
        | CROSS JOIN nt n)
        |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_trigrams,
        | CAST(sum(bo) AS BIGINT) AS n_backoff,
        | round(CAST(sum(k * lp) AS DOUBLE)/(CAST(sum(k) AS DOUBLE)*1e6), 4) AS avg_logprob
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_quality_score" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS tk,
        |  len(regexp_replace(lower(text), '\s+', '', 'g')) AS chars FROM documents),
        |m AS (SELECT doc_id, len(tk) AS n_tokens,
        |  len(list_filter(tk, x -> list_contains(['the','a','of','to','and','in'], x))) AS stop_n,
        |  chars FROM t),
        |f AS (SELECT doc_id, n_tokens,
        |  CAST(stop_n AS DOUBLE)/n_tokens AS sr,
        |  CAST(chars AS DOUBLE)/n_tokens AS mw FROM m)
        |SELECT doc_id, n_tokens, round(sr,4) AS stop_ratio, round(mw,4) AS mean_wlen,
        | round(1.0/(1.0+exp(-(-1.0 + 0.35*ln(n_tokens) + 4.0*sr - 0.6*(mw-5.0)))),4) AS score,
        | (1.0/(1.0+exp(-(-1.0 + 0.35*ln(n_tokens) + 4.0*sr - 0.6*(mw-5.0)))) >= 0.5) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    "corpus_pipeline" ->
      """WITH t AS (SELECT doc_id, source,
        |  list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0) AS tk,
        |  len(regexp_replace(lower(text), '\s+', '', 'g')) AS chars FROM documents),
        |base AS (SELECT doc_id, source, chars, len(tk) AS n_tokens,
        |  md5(array_to_string(list_sort(list_distinct(tk)),' ')) AS fp,
        |  CAST(list_contains(tk,'the') AS INT) + CAST(list_contains(tk,'a') AS INT)
        |   + CAST(list_contains(tk,'of') AS INT) + CAST(list_contains(tk,'to') AS INT)
        |   + CAST(list_contains(tk,'and') AS INT) + CAST(list_contains(tk,'in') AS INT) AS stop_hits,
        |  len(list_filter(tk, x -> list_contains(['slow','crash','kill'], x))) AS n_flagged
        | FROM t),
        |tok AS (SELECT doc_id, unnest(tk) AS w, generate_subscripts(tk,1) AS i FROM t),
        |bg AS (SELECT doc_id, w || ' ' || lead(w,1) OVER win AS b
        |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        |  QUALIFY lead(w,1) OVER win IS NOT NULL),
        |bga AS (SELECT doc_id, count(DISTINCT b) AS d_bg, count(*) AS n_bg FROM bg GROUP BY 1),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1,2),
        |wca AS (SELECT doc_id, max(c) AS max_wc, sum(c) AS n_words FROM wc GROUP BY 1),
        |rep AS (SELECT doc_id,
        |  ((CAST(max_wc AS DOUBLE)/n_words) <= 0.2
        |    AND (1.0 - CAST(d_bg AS DOUBLE)/n_bg) <= 0.3) AS rep_keep
        | FROM wca JOIN bga USING (doc_id)),
        |keepers AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS keeper FROM base),
        |kept AS (SELECT b.* FROM base b
        |  JOIN rep USING (doc_id) JOIN keepers USING (doc_id)
        |  WHERE b.n_tokens BETWEEN 50 AND 100000
        |    AND (CAST(b.chars AS DOUBLE)/b.n_tokens) BETWEEN 2.0 AND 10.0
        |    AND b.stop_hits >= 2
        |    AND (CAST(b.n_flagged AS DOUBLE)/greatest(b.n_tokens,1)) <= 0.02
        |    AND rep.rep_keep AND doc_id = keepers.keeper)
        |SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < 'f0' THEN 'train'
        |            WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < 'f8' THEN 'val'
        |            ELSE 'test' END AS split,
        |  source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM kept GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "logs_alert_bursts" ->
      """WITH b AS (SELECT strftime(date_trunc('hour', ts),'%Y-%m-%d %H:%M:%S') AS bucket,
        |  event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1,2),
        |w AS (SELECT bucket, event_type, n,
        |  CAST(coalesce(sum(n) OVER f, 0) AS BIGINT) AS trailing_n,
        |  count(n) OVER f AS trailing_buckets
        | FROM b WINDOW f AS (PARTITION BY event_type ORDER BY bucket
        |   ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)),
        |a AS (SELECT bucket, event_type, n FROM w
        |  WHERE trailing_buckets = 6 AND n * 6 > trailing_n * 2),
        |g AS (SELECT bucket, event_type, n,
        |  CASE WHEN lag(bucket) OVER t IS NULL
        |    OR (epoch(CAST(bucket AS TIMESTAMP)) - epoch(CAST(lag(bucket) OVER t AS TIMESTAMP)))/3600 > 3
        |    THEN 1 ELSE 0 END AS new_burst
        | FROM a WINDOW t AS (PARTITION BY event_type ORDER BY bucket)),
        |i AS (SELECT bucket, event_type, n,
        |  CAST(sum(new_burst) OVER (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS burst
        | FROM g)
        |SELECT event_type, burst, min(bucket) AS burst_start, max(bucket) AS burst_end,
        | count(*) AS n_buckets, max(n) AS peak_n
        |FROM i GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "sample_weighted" ->
      """WITH d AS (SELECT doc_id, source,
        |  len(list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0)) AS n_toks
        | FROM documents),
        |keyed AS (SELECT doc_id, source, n_toks,
        |  -ln((CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS UBIGINT) + 0.5)
        |      / 4294967296.0) / greatest(n_toks, 1) AS key
        | FROM d)
        |SELECT doc_id, source, n_toks, round(key, 8) AS key
        |FROM keyed ORDER BY key, doc_id LIMIT 20""".stripMargin,
    "logs_compare" ->
      """WITH b AS (SELECT strftime(ts,'%Y-%m-%d') AS day, event_type,
        |  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1,2)
        |SELECT day, event_type, n,
        | lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n,
        | round(CAST(n - lag(n) OVER (PARTITION BY event_type ORDER BY day) AS DOUBLE)
        |   / lag(n) OVER (PARTITION BY event_type ORDER BY day) * 100, 2) AS pct_change
        |FROM b ORDER BY day, event_type""".stripMargin,
    "q26_unpivot" ->
      """WITH w AS (SELECT l_returnflag,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_price,
        |  CAST(round(sum(CAST(l_discount AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_disc
        | FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, measure, value FROM (
        | SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
        | UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
        | UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM w)
        |ORDER BY l_returnflag, measure""".stripMargin
  )
}
