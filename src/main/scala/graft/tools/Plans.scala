package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Dumps `.explain("formatted")` for the headline queries → PLANS.md,
  * the physical-plan evidence for the scale claims in SURVEY.md §5/§7.5.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/root/repo/PLANS.md")
    val spark = GraftSession.builder("plans", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val headline = Seq(
      "q1_agg" -> "wide aggregate: pushed date filter, 7-column ReadSchema, partial HashAggregate",
      "q2_join_agg" -> "star join: every dimension BroadcastHashJoin, fact shuffles only for final agg",
      "q6_selective" -> "pushdown showcase: all 4 predicates in PushedFilters, 4-column ReadSchema",
      "q9_asof" -> "as-of join: single Window over one Exchange(user_id), no join blow-up",
      "q10_range_join" -> "range join: bucketed SortMergeJoin/ShuffledHashJoin equi-join, no NestedLoop",
      "logs_recent" -> "raw-ns timestamp bound pushed to the scan; TakeOrderedAndProject (per-partition top-K)",
      "dedup_minhash" -> "signatures as one projection (graft_minhash); shuffles only band buckets + verification",
      "dedup_embedding" -> "banded hyperplane-LSH candidates via equi-join on (band,bucket); exact-cosine verify; NO BroadcastNestedLoopJoin",
      "dedup_simhash" -> "packed BIGINT signature; band = shift+mask, hamming verify = codegen'd bit_count(a^b)",
      "ann_topk" -> "corpus STREAMED, 10-row query set as the BroadcastExchange build side (BuildRight)",
      "lake_timeseries" -> "registered-lake read: service_name/year/month/day in PartitionFilters; manifest applied as broadcast semi-join",
      "contamination" -> "decontamination scan: test shingles as BroadcastExchange, one corpus pass, no corpus shuffle before the final agg",
      "q20_topk_custom" -> "CUSTOM TopKPerGroupExec: bounded per-key heaps, ClusteredDistribution → one hash exchange",
      "q23_bucketed_join" -> "bucketed+sorted fact join: SMJ reads matching buckets (Bucketed: true), zero Exchange/Sort under the join — only the final agg+orderBy shuffle",
      "dedup_incremental" -> "bipartite batch-vs-corpus inverted-index join: cost proportional to the new batch, never corpus²",
      "contamination_bloom" -> "bloom probe (might_contain) INSIDE the scan-side filter, before the exact broadcast semi-join",
      "lake_stats_prune" -> "manifest zone-map window read: pruned path set as broadcast semi-join, row filter on top",
      "logs_heavy_hitters" -> "SpaceSaving summary: one partial/final ObjectHashAggregate pair, O(m) state, no per-user shuffle",
      "mm_frames" -> "frame fan-out via batched mapPartitions (DeserializeToObject/MapPartitions/SerializeFromObject), 1:N",
      "ann_ivf_index" -> "disk-backed IVF: probed cells as a literal IN in PartitionFilters — non-probed cell partitions never opened",
      "ann_ivfpq" -> "IVFPQ: probed cells as PartitionFilters on the persisted code table, heavy pass is ADC table lookups (no float dot); candidate cut + exact rerank both TopKPerGroupExec, candidates broadcast-joined — no Window, no driver collect",
      "dedup_spans" -> "exact substring dedup: duplicated-gram semi-join, ONE doc-keyed collect_set agg, map-only indexed-lambda scrub — no token-level join",
      "mm_neardup" -> "media near-dup: banded SimHash over byte shingles as one projection, candidates via (band,bucket) equi-join, hamming verify — only signatures shuffle, payloads stay put",
      "q24_waiting_suppliers" -> "Q21 shape: cached late set, semi+anti joins equi on l_orderkey with non-equi supplier guards",
      "lake_tail" -> "Grafana Logs panel on the lake: year/month/day bounds in PartitionFilters, TakeOrderedAndProject tail — only the window's day dirs are opened",
      "lake_resource_attrs" -> "resource_attributes JSON parsed once in the scan stage (codegen'd from_json), one (service,namespace) agg shuffle",
      "ann_quantized" -> "int8 ANN: quantized heavy pass reads 1/4 the bytes; top-c cut and final ranking are bounded-heap TopKPerGroupExec nodes, candidate set broadcast into the float rerank join — no per-query Window sort anywhere",
      "corpus_mix" -> "domain mixing: per-source token-mass agg broadcast back onto the corpus, keep decision map-only — the corpus itself never shuffles",
      "logs_dau_sketch" -> "two-level mergeable HLL: partial sketch ObjectHashAggregate per (day,service), union-agg per day — partials persistable and reaggregatable along any dimension",
      "lake_needle" -> "trace point lookup through the per-file bloom sidecar: the index probe is a FILE-count-sized job, the data scan's semi-join keep-set holds only bloom-positive files",
      "lake_dml" -> "severity agg over the post-DELETE manifest: the copy-on-write rewrite touched only files containing matching rows; readers see active (non-tombstoned) entries only",
      "text_line_dedup" -> "boilerplate-line scrub: lines built map-only (slice/transform, no explode before the df agg), heavy set as BroadcastExchange build side of the anti-join, one doc-keyed reassembly agg",
      "lake_changes" -> "incremental read: the since-mark append-only path set as broadcast semi-join — scan cost proportional to the new files, never lake size",
      "ann_filtered" -> "filtered vector search: label equality in the equi-join key (BuildRight broadcast of the query set) — each query meets only its label stripe, pre-filtering not post-filtering",
      "bpe_encode" -> "tokenizer application: corpus scanned once into (doc,word) counts; the iterative merge folds run on the vocabulary side of the word join, never per occurrence",
      "corpus_pipeline" -> "end-to-end curation: all per-row gates fused into the scan projection; one repetition window pass joined doc-keyed; one fingerprint window; tiny final agg",
      "dedup_semantic" -> "SemDeDup: centroid assignment map-only (codegen'd dots over broadcast centroid literals), within-cluster pairs via equi-join on the cell id — no all-pairs join at any point",
      "text_entropy" -> "char entropy: ONE codegen'd map projection (graft_entropy static call), no explode, no shuffle before the output sort",
      "logs_trend" -> "EWMA trend: one agg to bucket×type cardinality, lag window over the tiny series — never event-cardinality rows",
      "corpus_upsample" -> "epoch mixing: per-source token-mass agg broadcast back onto the corpus, copies decided map-only, explode emits epochs — the corpus never shuffles",
      "lake_merged" -> "schema-evolution read: mergeSchema union across file generations, NULL-filled old files, manifest semi-join intact",
      "logs_slo_burn" -> "SLO burn: one agg to hourly-bucket cardinality, both rolling windows over the ~720-row series",
      "logs_transitions" -> "transition matrix: one lag window shuffled on user_id, |types|^2-row aggregate on top",
      "q27_hierarchy" -> "recursive-CTE equivalent: the shown plan is the final depth histogram; the pointer-jumping rounds (log2(depth) equi-joins, one job each via observe+localCheckpoint) run before it",
      "logs_otlp_proto" -> "protobuf intake round-trip: encode (graft_otlp_proto) and wire decode (graft_otlp_json) are adjacent codegen'd projections in ONE stage — the only shuffle is the final severity aggregate",
      "split_leakage" -> "split-leakage audit: the tiny near-dup edge table joined twice against the map-only split projection (broadcast-size), 3-row aggregate — the corpus is never rescanned",
      "dedup_clusters" -> "connected components: the shown plan is the final labels projection; each HashMin round is ONE job over the persisted KB-scale edge set at loop parallelism (4 tasks), lineage truncated per round",
      "text_chunk" -> "RAG chunking: tokenize-once projection + explode(sequence) — 3-column ReadSchema, zero shuffles before the output sort, output ∝ chunks",
      "ann_pq" -> "product quantization: encode = map-only argmin over codebook literals; ADC scores are zip_with table lookups (no float dot in the heavy pass); candidate cut + exact rerank both TopKPerGroupExec with a broadcast candidate join",
      "corpus_split_clean" -> "leakage repair: broadcast label join onto the map-only split projection — the corpus never shuffles; cluster labels come from the KB-scale edge iteration",
      "lake_grep" -> "keyword search through the token-bloom sidecar: survivor paths feed the reader directly (pruned files never opened — the token predicate can't push down), row-level token filter on top",
      "mix_budget" -> "hard token budget: (source×256) bucket totals via map-side-combined agg, running total over a ≤256-row frame, per-row cumsum window only inside budget-reachable buckets — sorted data ∝ budget, not corpus",
      "dedup_rank" -> "integer PageRank: shown plan is the final degree join; each of the 5 rounds is one join+agg over the cached degree-annotated edge relation, lineage truncated per round",
      "dedup_canonical" -> "per-cluster keeper: two mergeable aggregates over vertex-cardinality control frames + broadcast top-table join — no window, corpus untouched",
      "text_trigram_logprob" -> "stupid-backoff trigram LM: one tokenize+window pass; model tables are vocabulary-cardinality aggregates; scoring = n-gram-keyed equi-joins + broadcast scalar N, integer micro-nat CASE",
      "text_bm25" -> "BM25: ONE tokenize pass into a narrow cached per-doc frame (per-term tf via size/array_remove builtins — no interpreted lambda, no per-(doc,term) shuffle); |Q|-struct explode filtered to hits; df/corpus aggs broadcast back; TakeOrdered top-k",
      "wordpiece_encode" -> "WordPiece application: greedy longest-match segmentation (graft_wordpiece_segment, vocab as one literal) on the VOCABULARY side of the word join — corpus scanned once into (doc,word) counts, segmentation once per distinct word",
      "dedup_keep" -> "corpus-wide keep/drop tagging: one map-only corpus pass; cluster-label and keeper control tables joined via the size-guarded broadcast (shuffle-join fallback above threshold)",
      "ann_opq" -> "OPQ rotated PQ: rotation = codegen'd dots against permuted-PCA-basis literals with constant centering (map-only), ADC over rotated codes, TopK candidate cut + broadcast-join exact rerank on raw floats",
      "lake_iceberg" -> "severity aggregate through the EXPORTED Iceberg metadata chain (version-hint -> metadata.json -> Avro manifests -> file keep-set): same root-scan + broadcast semi-join as the manifest read — interop certified by the shared oracle",
      "lake_iceberg_mor" -> "v2 merge-on-read: per-file (partition, sequence) via ONE broadcast map on _metadata.file_path; equality deletes null-safe anti-join (seq strictly below, partition-scope literals), position deletes anti-join on (file, row_index) — delete side sized by the deleted population",
      "lake_iceberg_rest" -> "live REST-catalog round-trip: loadTable GET -> metadata-location -> chain walk (control-plane) -> the same distributed scan as the direct read; no data moves through the catalog",
      "trace_service_graph" -> "APM service map: one trace-keyed rank window, parent edge equi-join co-partitioned on (trace_id, pidx), tier^2-cardinality aggregate",
      "trace_critical_path" -> "heap-tree critical path: shown plan is the final per-trace max; each of the log2(depth) rounds advances every span one hop via a co-partitioned join (localCheckpoint-truncated)",
      "metrics_rate" -> "PromQL increase(): day-chunk + halo — cum AND lag windows per (service, day) on one exchange; previous-day closing totals broadcast back as the seed (plan-spec asserts all sample-ordered windows are (service, day)-keyed)",
      "metrics_hist_p95" -> "histogram_quantile: corpus work is ONE map-only bucket projection + (service x le) aggregate; lag/interpolation windows run on the boundaries-cardinality frame",
      "trace_logs" -> "cross-signal spans JOIN logs: the trace family's one large-large join — hash-partitioned equi-join on (trace_id, 16-hex span prefix), one shuffle each side, no corpus broadcast, <=1 match per span; service x day aggregate",
      "metrics_exemplars" -> "OTel exemplars: map-only projection + ONE aggregate shuffle; the peak-sample trace id is a mergeable max over a (value, trace_id) struct — no window, no second pass",
      "metrics_exp_p95" -> "exponential-histogram quantile: corpus work is ONE map-only exact-integer bucket projection (length(bin(vi))-1) + (service x idx) aggregate; rank walk on the tiny frame",
      "trace_otlp_proto" -> "traces wire round-trip: encode+decode are codegen'd map-only expressions in one stage; shuffles are the synthesis rank window + the final aggregate",
      "lake_iceberg_day" -> "day-transform external table: manifest-driven file set, NO phantom partition column attach; scan + broadcast attach map built one-task-per-manifest",
      "trace_lake_critical" -> "pointer jumping over opaque span ids: shown plan is the final per-trace max; each of the log2(depth) rounds composes the checkpointed chain with itself (acc += acc at jump, jump = jump at jump)",
      "metrics_lake_rate" -> "ingested-lake increase(): manifest semi-join scan -> series-keyed lag window -> bucket aggregate; the certification twin of the synthesis rate plan",
      "lake_iceberg_dml" -> "graft-WRITTEN v2 delete snapshot read merge-on-read on the FAST PATH (global position deletes): keep-set LeftSemi + delete LeftAnti, both broadcast — partition-discovery types stable, delete side sized by the deleted rows, the data scan never reshuffles",
      "lake_iceberg_merge" -> "MOR merge readback: mixed delta snapshot (delete manifest + appended update files) — same broadcast LeftSemi/LeftAnti shape; matched originals invisible, update rows scanned like any data file",
      "trace_lake_spans" -> "bloom-routed trace point lookup on the ingested span lake: the keep-set holds only bloom-positive files (index probe is a file-count-sized job), trace_id literal filter pushed to the scan on top",
      "trace_span_events" -> "span-event exception analysis: landed JSON arrays explode map-only (generate after the manifest semi-join scan), attribute extraction codegen'd from_json, one (service x type)-cardinality aggregate",
      "trace_span_links" -> "trace->trace causality: map-only link explode + distinct trace-id relation join (user-day cardinality), tiny (service x resolved) aggregate — the span corpus never shuffles for the explode side",
      "metrics_lake_summary" -> "Summary-kind quantile surface: manifest semi-join scan -> ONE series-keyed max-struct aggregate (latest snapshot) -> map-only quantile extraction from the landed JSON pairs",
      "lake_iceberg_eqdml" -> "EQUALITY-delete readback: one data scan + per-file sequence attach (broadcast map) + null-safe LeftAnti per key-column set gated on data_seq < delete_seq — upsertEq inserts (same seq) survive, the later deleteEq applies; no corpus shuffle, delete side sized by the retraction keys",
      "lake_retention" -> "TTL-expired lake readback: the dropped day files are GONE from the scan's file list (metadata-only restatement — nothing anti-joins them), only the cutoff-straddling day pays a position-delete LeftAnti; the surviving scan + aggregate is the same plan as an unexpired lake",
      "lake_cdc_apply" -> "CDC-maintained lake readback AFTER eq→pos delete conversion: the equality anti-join chain is GONE (retired to folded position deletes), so the plan is one data scan + ONE position-delete LeftAnti on (file, pos) + the aggregate — per-scan delete cost no longer grows with CDC commit count, and no data file was rewritten to get there",
      "lake_evolve" -> "ID-BOUND rename + int→long promotion readback: ONE root scan under an explicit request schema (retired name at the widened type alongside the new), the alias fold a plain codegen'd coalesce projection — no second scan, no shuffle, no data rewritten; both phases (current + pre-evolution snapshot) are the same keep-set LeftSemi shape, unioned before one aggregate",
      "lake_spec_evolve" -> "TWO-SPEC chain readback (hourly→daily layout flip): explicit-file scan with directory inference OFF (mixed depths conflict structurally), per-file identity values from a broadcast manifest map, hour COALESCED map-value-over-data-column per generation — one scan, one broadcast join, one aggregate; no restatement ever happened, the hourly manifests ride carried under spec 0",
      "lake_evolve_stats" -> "STAT-AXIS rename readback: a zone-map-pruned window read whose manifest keep-set filtered min_ts/max_ts BEFORE the scan (the renamed axis moved only the NAME — the bounds are the field's values), then one root scan under the request schema with the service/time aliases folded by a codegen'd coalesce projection; the row filter binds the renamed axis, one aggregate, no extra scan or shuffle vs the un-renamed plan",
      "lake_travel_schema" -> "SNAPSHOT-SCHEMA travel: two keep-set LeftSemi root scans (the anchor's registered-by-then set and the current set), the PRE phase under the as-of schema (dropped column requested explicitly, its bytes still on disk), the CUR phase under the post-drop schema — schema resolution is a memoized log parse, zero footer probes, both phases one aggregate each then a union",
      "lake_evolve_layout" -> "LAYOUT-COLUMN RENAME readback: the equality filter on the RENAMED name reaches the scan as a PartitionFilter on the PHYSICAL directory key (the alias is a plain rename projection the optimizer pushes through — never a per-file coalesce, which would kill pruning); otherwise the same pruned root scan + keep-set LeftSemi + one aggregate as an un-renamed lake — zero directories rewritten",
      "lake_rewrite_manifests" -> "post-REGISTRY-REWRITE readback: the executed plan is the unchanged lake shape (root scan + keep-set LeftSemi + MOR position LeftAnti + aggregate) — the rewrite consolidated only the registries' part files, shrinking PLANNING-time listing/footer-opens from one-plus files per sync round to ceil(bytes/64MB) while the data plan stays byte-identical")

    // EVERY contract query gets a section (the freshness gate in
    // graft.Bench fails when one is missing, so a new query cannot
    // ship without its plan reviewed): curated annotations above,
    // a neutral note for the rest. Curated order first, remainder
    // alphabetical.
    val whyOf = headline.toMap
    val rest = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(whyOf.contains)
      .map(n => n -> "contract query (auto-included — every SparkEntry.queries key carries its executed plan)")
    val sb = new StringBuilder
    sb.append("# Physical plans (generated by graft.tools.Plans at sf0.01)\n\n")
    sb.append("Evidence for SURVEY.md §5 scale claims. Regenerate with\n")
    sb.append("`sbt \"runMain graft.tools.Plans <sfDir> <out>\"`.\n")
    sb.append("One section per contract query; graft.Bench fails when a\n")
    sb.append("query has no section here (the plans freshness gate).\n")
    (headline ++ rest).foreach { case (name, why) =>
      System.err.println(s"[plans] $name")
      val df = SparkEntry.queries(name)(spark, dir)
      df.count() // let AQE finalize so the plan shows the executed shape
      sb.append(s"\n## $name\n\n_${why}_\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
