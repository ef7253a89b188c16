package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{LakeIndex, LogSync, LogWriter, OtlpLogs, Tables}

/** End-to-end lake queries over the reference's 15-column OTel schema:
  * the full Quick-Start flow (reference README.md; scripts/sync-logs.sh)
  * as ONE pipeline — OTLP/JSON envelopes → [[OtlpLogs.parse]] →
  * [[LogWriter]] partitioned lake (`service_name/year/month/day/hour`)
  * → [[LogSync]] manifest registration → [[LogSync.table]] → analytics.
  *
  * The oracle-checked queries below run against the REGISTERED LAKE,
  * not the raw events table, so a hash-match certifies every stage:
  * encode, parse, partitioned write, registration, partition-discovery
  * read, and the aggregate itself. Time/service predicates hit the
  * partition columns, so at 100 TB these queries scan only the matching
  * hour directories (spec asserts the filters land in PartitionFilters).
  */
object LakeAnalytics {

  /** Events become logs of 10 services (user_id mod 10) — the
    * reference demo's service-count scale; partition dir count stays
    * bounded (10 services × days × 24 h) independent of row count.
    */
  private def payloads(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(OtlpLogs.toOtlpJsonTraced(
        unix_micros(col("ts")),
        concat(lit("svc-"), col("user_id") % 10),
        col("event_type"),
        when(col("event_type") === "error", 17)
          .when(col("event_type") === "signup", 13)
          .when(col("event_type") === "purchase", 9)
          .when(col("event_type") === "view", 9)
          .otherwise(5),
        col("props"),
        // a user's events on one day share a trace; each event is a
        // span — gives the lake the high-cardinality point-lookup key
        // the bloom file index ([[graft.sources.LakeIndex]]) serves
        md5(concat(col("user_id").cast("string"), lit("/"),
          date_format(col("ts"), "yyyy-MM-dd"))),
        substring(md5(col("event_id").cast("string")), 1, 16),
        // the k8s namespace every real OTel resource carries — the
        // attribute the resource_attributes extraction query filters on
        extraResourceAttrs =
          Seq("k8s.namespace.name" -> concat(lit("ns-"), col("user_id") % 3))).as("payload"))

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (idempotently, once per sf-dir) the registered lake and
    * return its root. A `_built` marker (underscore: invisible to data
    * scans) skips the rebuild across JVMs; the in-process map skips
    * the FS check across queries.
    */
  private[graft] def lakeRoot(spark: SparkSession, dir: String): String =
    built.computeIfAbsent(dir, _ => {
      // v5: envelopes now carry trace/span context and numeric
      // severity — bump the path so a pre-trace lake is rebuilt
      val root = s"/tmp/graft_lake_v5_${Integer.toHexString(dir.hashCode & 0x7fffffff)}"
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new Path(s"$root/_built")
      if (!fs.exists(marker)) {
        fs.delete(rootPath, true)
        // day-granularity layout: partition granularity sized to the
        // data volume. The reference's hourly cells are right at
        // 100 TB; at test scale they hold ~a dozen rows each, and the
        // resulting thousands of tiny files make every full-lake query
        // pay per-file open cost. `hour` remains a row column.
        LogWriter.write(OtlpLogs.parse(payloads(spark, dir), col("payload")), root,
          layout = LogWriter.DailyLayout)
        LogSync.sync(spark, root)
        fs.create(marker).close()
      }
      root
    })

  /** Severity count by service over the registered lake (the README
    * "Severity count by service" query, run where the reference runs
    * it: on the lake, not the ingest stream).
    */
  def severityByService(spark: SparkSession, dir: String): DataFrame =
    LogSync.table(spark, lakeRoot(spark, dir))
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))

  /** [[severityByService]] read through the EXPORTED ICEBERG METADATA
    * ([[IcebergExport.readTable]]: version-hint → metadata.json →
    * Avro manifest chain) instead of the live manifest — the
    * interop-certification query: its hash-match against the same
    * events-derived oracle proves the exported Iceberg chain describes
    * exactly the registered table, every round, at sf0.01.
    */
  def icebergSeverity(spark: SparkSession, dir: String): DataFrame = {
    val root = lakeRoot(spark, dir)
    graft.sources.IcebergExport.ensureExport(spark, root)
    graft.sources.IcebergExport.readTable(spark, root)
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))
  }

  private val restServers =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, graft.serving.IceRestCatalog.Server]()

  /** [[severityByService]] THROUGH A LIVE REST CATALOG — the full
    * reference topology in one query: the lake's Iceberg export is
    * registered in an in-process [[graft.serving.IceRestCatalog]]
    * server (the reference's `ice-rest-catalog`), and the read side
    * discovers it the way ClickHouse's `DataLakeCatalog` does —
    * `loadTable` over HTTP → metadata-location → spec chain walk →
    * distributed scan. The hash-match against the same events oracle
    * certifies the whole catalog round-trip, live, every round. The
    * server is session-memoized (one listener, stopped with the
    * session); registration re-points at the current export each call
    * (control-plane: one map put + one GET).
    */
  def icebergRestSeverity(spark: SparkSession, dir: String): DataFrame = {
    val root = lakeRoot(spark, dir)
    graft.sources.IcebergExport.ensureExport(spark, root)
    val srv = restServers.computeIfAbsent(spark, { s =>
      val started = graft.serving.IceRestCatalog.start(s)
      graft.SessionCaches.register(s)(() => {
        restServers.remove(s); started.stop()
      })
      started
    })
    // point otel.logs at the newest metadata version (version-hint)
    val metaDir = new Path(s"$root/_iceberg/metadata")
    val fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(metaDir, "version-hint.text"))
    val v = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
    srv.put(Seq("otel"), "logs", s"$root/_iceberg/metadata/v$v.metadata.json")
    graft.serving.IceRestCatalog.load(spark, srv.uri, Seq("otel"), "logs")
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))
  }

  /** [[icebergSeverity]] over a lake built in TWO sync+export rounds
    * ([[graft.sources.IcebergExport]]'s incremental path): the first
    * half of the month lands and exports, then the rest lands and the
    * second export writes ONE delta manifest, carrying the first
    * snapshot's manifest forward with `parent-snapshot-id` chaining —
    * O(new files) per export. The builder REQUIRES the chain actually
    * formed (a silent fallback to restatement would pass the count),
    * and the oracle hash-match then certifies that reading through the
    * two-manifest chain surfaces exactly the full table.
    */
  def icebergIncSeverity(spark: SparkSession, dir: String): DataFrame =
    graft.sources.IcebergExport.readTable(spark, incRoot(spark, dir))
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))

  /** TIME TRAVEL over the incremental fixture: the same severity
    * aggregate read at the FIRST retained snapshot (the oldest entry
    * of the exported history) — the Iceberg `snapshot-id` /
    * `as-of-timestamp` read every warehouse client offers. The first
    * export covered exactly the day ≤ 15 half of the month, so the
    * oracle is the same events aggregate WITH that predicate: the
    * hash-match certifies that anchoring a historic snapshot walks
    * that snapshot's manifest chain, not the current one, and that
    * tombstone-free historic files stay readable. Snapshot selection
    * is control-plane (one metadata read, no data cost).
    */
  def icebergTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val root = incRoot(spark, dir)
    // the chain root = the parentless snapshot (same-millisecond
    // exports make timestamp order ambiguous; parentage is not)
    val first = graft.sources.IcebergExport.snapshots(spark, root)
      .find(_._3.isEmpty)
      .getOrElse(sys.error("no parentless snapshot in the incremental fixture"))
    graft.sources.IcebergExport.readTable(spark, root,
        Some(graft.sources.IcebergExport.BySnapshotId(first._1)))
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))
  }

  private val builtInc = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Two-phase lake fixture for [[icebergIncSeverity]]: day ≤ 15 lands
    * first (sync + export #1), the rest second (sync + export #2 —
    * the DELTA export). Marker-idempotent like [[lakeRoot]].
    */
  private def incRoot(spark: SparkSession, dir: String): String =
    builtInc.computeIfAbsent(dir, _ => {
      val root = s"/tmp/graft_lake_inc_v1_${Integer.toHexString(dir.hashCode & 0x7fffffff)}"
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new Path(s"$root/_built")
      if (!fs.exists(marker)) {
        fs.delete(rootPath, true)
        val logs = OtlpLogs.parse(payloads(spark, dir), col("payload")).cache()
        LogWriter.write(logs.filter(dayofmonth(col("timestamp")) <= 15), root,
          layout = LogWriter.DailyLayout)
        LogSync.sync(spark, root)
        graft.sources.IcebergExport.export(spark, root)
        LogWriter.write(logs.filter(dayofmonth(col("timestamp")) > 15), root,
          layout = LogWriter.DailyLayout)
        logs.unpersist()
        LogSync.sync(spark, root)
        val md2 = graft.sources.IcebergExport.export(spark, root)
        val in = fs.open(new Path(md2))
        val mdText = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        require(mdText.contains("\"parent-snapshot-id\""),
          "second export must be an incremental delta chained to the first snapshot")
        fs.create(marker).close()
      }
      root
    })

  /** Per-region counts over an EXTERNALLY-written Iceberg v1 table
    * ([[graft.sources.IcebergFixture]]: independent writer shape —
    * bare v1 schema, typed manifest-only partition values, stale
    * snapshot listed first, no version-hint) read through
    * [[graft.sources.IcebergExport.readExternal]]. The oracle runs on
    * the ORIGINAL `nation` parquet, so the hash-match certifies the
    * whole foreign-table walk: metadata fallback, snapshot anchoring,
    * v1 manifests, and manifest-sourced partition-column attach.
    */
  def icebergExternalRegions(spark: SparkSession, dir: String): DataFrame =
    graft.sources.IcebergExport.readExternal(spark,
        graft.sources.IcebergFixture.externalNationTable(spark, dir))
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n"), min(col("n_name")).as("mn"))
      .orderBy(col("n_regionkey"))

  /** Daily aggregate over the DAY-TRANSFORM fixture
    * ([[graft.sources.IcebergFixture.externalDayPartitionedTable]]: a
    * standard writer's `PARTITIONED BY (days(ts))` layout — the
    * source column stays in the data files, manifests carry epoch-day
    * ints). The oracle runs on the ORIGINAL events parquet filtered
    * to the fixture's two days, so the hash-match certifies that
    * non-identity transforms resolve, do NOT attach phantom columns,
    * and surface exactly the snapshot's rows.
    */
  def icebergExternalDays(spark: SparkSession, dir: String): DataFrame =
    graft.sources.IcebergExport.readExternal(spark,
        graft.sources.IcebergFixture.externalDayPartitionedTable(spark, dir))
      .groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("sum_c"),
        countDistinct(col("user_id")).as("users"))
      .orderBy(col("day"))

  /** Per-region counts over the v2 MERGE-ON-READ fixture
    * ([[graft.sources.IcebergFixture.externalNationMorTable]]: one
    * data file plus position, equality, and sequence-stale equality
    * delete files). The oracle is nation minus the deleted keys, so
    * the hash-match certifies position deletes by (file, row ordinal),
    * null-safe equality deletes, and the strictly-greater sequence
    * rule (the stale delete must NOT drop key 20) — the read half of
    * upsert-writing Iceberg engines the reference's catalog serves.
    */
  def icebergMorRegions(spark: SparkSession, dir: String): DataFrame =
    graft.sources.IcebergExport.readExternal(spark,
        graft.sources.IcebergFixture.externalNationMorTable(spark, dir))
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n"), min(col("n_name")).as("mn"))
      .orderBy(col("n_regionkey"))

  /** Hourly series for one service over a 10-day window — the Grafana
    * "Logs by Service" panel with its `$timeFilter`, expressed on the
    * partition columns so the scan prunes to
    * service_name=svc-3/…/day∈[10,19] directories only.
    */
  def timeseries(spark: SparkSession, dir: String): DataFrame =
    LogSync.table(spark, lakeRoot(spark, dir))
      .filter(col("service_name") === "svc-3" &&
        col("year") === 2024 && col("month") === 1 && col("day").between(10, 19))
      .groupBy(col("day"), col("hour"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("day"), col("hour"), col("severity_text"))

  /** Severity counts for a 2-day window via [[LogSync.tableBetween]]:
    * the manifest's per-file timestamp zone-maps prune the file set
    * BEFORE the scan — data skipping that works with or without a
    * partition layout (and inside partitions), the Iceberg
    * manifest-stats behavior. The spec asserts the skipped-file count;
    * the oracle hash-match certifies pruning never drops a row.
    */
  def windowSeverity(spark: SparkSession, dir: String): DataFrame =
    LogSync.tableBetween(spark, lakeRoot(spark, dir), "2024-01-12", "2024-01-14")
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))

  /** Per-(service, k8s namespace) counts extracting from the
    * `resource_attributes` JSON column (reference README schema row 12;
    * the filter every k8s operator runs daily). The JSON column is
    * parsed ONCE per row into a string map — `from_json` is codegen'd,
    * stays inside the scan stage, and at 100 TB the aggregate still
    * shuffles one row per (service, namespace) per partition.
    */
  def resourceAttrs(spark: SparkSession, dir: String): DataFrame =
    LogSync.table(spark, lakeRoot(spark, dir))
      .withColumn("namespace",
        try_element_at(
          from_json(col("resource_attributes"), "map<string,string>",
            Map.empty[String, String]),
          lit("k8s.namespace.name")))
      .groupBy(col("service_name"), col("namespace"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("namespace"))

  /** The MAINTAINED severity rollup ([[graft.sources.Rollup]]):
    * refresh folds any newly-registered files into the persisted
    * aggregate, then the rollup is read back — maintenance cost ∝
    * arrival rate, not lake size. The oracle is the FULL recompute on
    * `events`, so the hash-match certifies that incremental merge ==
    * recompute-from-scratch.
    */
  def rollup(spark: SparkSession, dir: String): DataFrame = {
    val root = lakeRoot(spark, dir)
    graft.sources.Rollup.refresh(spark, root)
    graft.sources.Rollup.read(spark, root)
  }

  /** The Grafana "Logs" panel on the REGISTERED LAKE: time-filtered
    * newest-first tail selecting body/scope/severity (reference
    * grafana logs.json "Logs" target: `$timeFilter ORDER BY timestamp
    * DESC LIMIT 1000` with body + scope_name columns). The time bound
    * lands on the partition columns, so the scan reads only the
    * matching day directories (spec asserts PartitionFilters); the
    * sort+limit executes as per-partition top-K. Every ordering column
    * is selected, so boundary ties are row-identical and the LIMIT cut
    * is deterministic.
    */
  def tail(spark: SparkSession, dir: String, limit: Int = 1000): DataFrame =
    LogSync.table(spark, lakeRoot(spark, dir))
      .filter(col("year") === 2024 && col("month") === 1 && col("day").between(25, 31))
      .select(
        date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
        col("service_name"), col("severity_text"), col("scope_name"), col("body"))
      .orderBy(col("ts_str").desc, col("service_name"), col("severity_text"), col("body"))
      .limit(limit)

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private val indexed = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** Trace point lookup over the registered lake THROUGH the per-file
    * bloom sidecar ([[graft.sources.LakeIndex]]) — the needle query the
    * reference schema's trace_id column exists for, on a lake whose
    * directory layout (service/time) cannot encode the key. A
    * hash-match certifies the whole chain: encode → write → register →
    * index build → bloom file pruning → scan. `expectedItemsPerFile`
    * is sized to the day-grain test files; the 100 TB default is the
    * writer's records-per-file cap.
    */
  def needle(spark: SparkSession, dir: String,
             traceId: String = md5Hex("7/2024-01-15")): DataFrame = {
    val root = lakeRoot(spark, dir)
    indexed.computeIfAbsent(root, _ => {
      LakeIndex.build(spark, root, "trace_id", expectedItemsPerFile = 4096); true
    })
    LakeIndex.lookup(spark, root, "trace_id", Seq(traceId))
      .select(col("trace_id"), col("span_id"),
        date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
        col("service_name"), col("severity_text"), col("body"))
      .orderBy(col("ts_str"), col("span_id"))
  }

  /** Span point lookup through the GENERIC sidecar surface
    * ([[graft.sources.LakeIndex.on]]) — the proof that a NON-trace
    * high-cardinality column routes through the same bloom file
    * pruning as [[needle]]: span_id's sidecar is built independently
    * of trace_id's (one `_index/<column>` dir per column), and the
    * lookup scans only the files whose bloom might hold the span.
    * kept<total is spec-asserted (LakeSpec). The hash-match against
    * the events synthesis certifies the whole chain on the second
    * column, not just the one the reference schema was designed
    * around.
    */
  def spanLookup(spark: SparkSession, dir: String,
                 eventId: Long = 5L): DataFrame = {
    val root = lakeRoot(spark, dir)
    val bySpan = LakeIndex.on(spark, root, "span_id",
      expectedItemsPerFile = 4096)
    bySpan(Seq(md5Hex(eventId.toString).take(16)))
      .select(col("trace_id"), col("span_id"),
        date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
        col("service_name"), col("severity_text"), col("body"))
      .orderBy(col("ts_str"), col("span_id"))
  }

  private val tokIndexed = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** Keyword search over the registered lake THROUGH the per-file
    * token-bloom sidecar ([[graft.sources.LakeIndex.buildTokens]]) —
    * the "which logs mention X" query the reference serves with
    * ClickHouse's full-scan `body LIKE` (README.md "Search in log
    * body"), re-expressed so a 100 TB lake scans only the files whose
    * token vocabulary might contain every search term. A hash-match
    * certifies encode → write → register → token-index build → bloom
    * file pruning → row-level token match.
    */
  def grep(spark: SparkSession, dir: String,
           terms: Seq[String] = Seq("69")): DataFrame = {
    val root = lakeRoot(spark, dir)
    tokIndexed.computeIfAbsent(root, _ => {
      // day-grain test files hold ~hundreds of rows over a ~100-token
      // vocabulary; the 100 TB default sizes for a full file's vocab
      LakeIndex.buildTokens(spark, root, "body", expectedTokensPerFile = 4096); true
    })
    LakeIndex.grep(spark, root, "body", terms)
      .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
        col("service_name"), col("severity_text"), col("body"))
      .orderBy(col("ts_str"), col("service_name"), col("severity_text"), col("body"))
  }

  private val dmlBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A second lake that has LIVED: built from the same payloads, then a
    * copy-on-write DELETE ([[graft.sources.LakeDml]]) of one service's
    * 'view' logs — the GDPR-style redaction pass. Queries run against
    * the post-DML manifest, so a hash-match against the
    * events-minus-deleted oracle certifies the delete end-to-end
    * (affected-file detection, complement rewrite, tombstoned manifest
    * swap, reader semantics).
    */
  private[graft] def dmlRoot(spark: SparkSession, dir: String): String =
    dmlBuilt.computeIfAbsent(dir, _ => {
      val root = s"/tmp/graft_lakedml_v1_${Integer.toHexString(dir.hashCode & 0x7fffffff)}"
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new Path(s"$root/_built")
      if (!fs.exists(marker)) {
        fs.delete(rootPath, true)
        LogWriter.write(OtlpLogs.parse(payloads(spark, dir), col("payload")), root,
          layout = LogWriter.DailyLayout)
        LogSync.sync(spark, root)
        graft.sources.LakeDml.delete(spark, root,
          col("service_name") === "svc-3" && col("severity_text") === "view")
        fs.create(marker).close()
      }
      root
    })

  /** Severity counts over the post-DELETE lake ([[dmlRoot]]). */
  def dmlSeverity(spark: SparkSession, dir: String): DataFrame =
    LogSync.table(spark, dmlRoot(spark, dir))
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))

  private val sqlDmlBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A lake whose ENTIRE post-ingest lifecycle ran through the SQL
    * dialect's command plans — registration (`MAINTAIN ... SYNC`), a
    * copy-on-write redaction (`DELETE FROM LAKE ... WHERE`), two
    * merge-on-read redactions (`DELETE ... MOR WHERE`), the
    * position-delete fold (`MAINTAIN ... COMPACT DELETES`) and the
    * inert-file sweep (`MAINTAIN ... VACUUM DELETES`). Each statement
    * goes through [[graft.GraftSqlParser.command]] — the same regex
    * parse and RunnableCommand a `spark.sql` session executes — so
    * the `lake_sql_dml` oracle hash-match certifies the SQL surface
    * end-to-end, not just the Scala API underneath it.
    */
  private[graft] def sqlDmlRoot(spark: SparkSession, dir: String): String =
    graft.sources.FixtureBuild.once(sqlDmlBuilt, dir, "graft_lakesqldml", spark) { root =>
      LogWriter.write(OtlpLogs.parse(payloads(spark, dir), col("payload")), root,
        layout = LogWriter.DailyLayout)
      def sql(text: String): Unit = {
        graft.GraftSqlParser.command(text)
          .getOrElse(sys.error(s"lake dialect must parse: $text"))
          .asInstanceOf[org.apache.spark.sql.execution.command.LeafRunnableCommand]
          .run(spark)
        ()
      }
      sql(s"MAINTAIN LAKE '$root' SYNC")
      sql(s"DELETE FROM LAKE '$root' WHERE service_name = 'svc-3' AND severity_text = 'view'")
      sql(s"DELETE FROM LAKE '$root' MOR WHERE service_name = 'svc-7' AND severity_text = 'signup'")
      sql(s"DELETE FROM LAKE '$root' MOR WHERE service_name = 'svc-5' AND severity_text = 'click'")
      sql(s"MAINTAIN LAKE '$root' COMPACT DELETES")
      sql(s"MAINTAIN LAKE '$root' VACUUM DELETES")
    }

  /** Severity counts over the SQL-lifecycle lake ([[sqlDmlRoot]]):
    * one CoW delete's rewritten manifest + two MOR deletes read
    * through their FOLDED position-delete commit.
    */
  def sqlDmlSeverity(spark: SparkSession, dir: String): DataFrame =
    LogSync.table(spark, sqlDmlRoot(spark, dir))
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))

  /** [[sqlDmlSeverity]] read ENTIRELY from SQL — the
    * `graft_lake('<root>')` snapshot TVF
    * ([[graft.GraftTableFunctions]]) over the SQL-mutated lake, so
    * the hash-match against the events-minus-deleted oracle certifies
    * the last missing edge of the SQL lifecycle: a pure-SQL session
    * that registered, mutated, compacted and vacuumed a root can now
    * SELECT its current state (mutate→observe symmetry; before this,
    * `graft_changes` from epoch was the closest read and silently
    * loses rewrite commits by design). The TVF expands to
    * [[graft.sources.LogSync.table]]'s plan at analysis time, so the
    * scan, pruning, and MOR delete semantics are byte-identical to
    * the Scala API the `lake_sql_dml` twin uses.
    */
  def sqlReadSeverity(spark: SparkSession, dir: String): DataFrame = {
    val root = sqlDmlRoot(spark, dir)
    graft.GraftTableFunctions.ensureRegistered(spark)
    spark.sql(
      s"""SELECT service_name, severity_text, count(1) AS n
         |FROM graft_lake('$root')
         |GROUP BY service_name, severity_text
         |ORDER BY service_name, severity_text""".stripMargin)
  }

  /** SQL TIME TRAVEL, oracle-certified: the same aggregate as
    * [[sqlReadSeverity]] but through `graft_lake_at('<root>', t)` with
    * `t` = the last APPEND registration instant — the moment after
    * registration and before any of the lifecycle's three deletes
    * landed, derived from the lake's own manifest (control-plane read;
    * append commits and DML commits are distinct statements seconds
    * apart in the fixture, so the instant is unambiguous). The oracle
    * is the FULL events synthesis — a hash-match proves the travel
    * read resurrects every deleted row exactly: the CoW rewrite's
    * tombstones bound by `removed_at`, the MOR delete files bound by
    * their registration, all THROUGH the SQL TVF. Together with
    * `lake_sql_read` (current state) the pair certifies both ends of
    * the SQL read story against independent oracles on one fixture.
    */
  def sqlTravelSeverity(spark: SparkSession, dir: String): DataFrame = {
    val root = sqlDmlRoot(spark, dir)
    graft.GraftTableFunctions.ensureRegistered(spark)
    val preDml = LogSync.manifest(spark, root)
      .filter(col("op").isNull || col("op") === "append")
      .agg(max(col("registered_at"))).head().getTimestamp(0)
    // render the literal in the SESSION zone — the TVF parses it back
    // in the same zone, so the instant round-trips under any session
    // timeZone (a hardcoded zone, or Timestamp.toString's JVM default,
    // would silently shift the travel point elsewhere)
    val lit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneId.of(
        spark.sessionState.conf.sessionLocalTimeZone))
      .format(preDml.toInstant)
    spark.sql(
      s"""SELECT service_name, severity_text, count(1) AS n
         |FROM graft_lake_at('$root', TIMESTAMP '$lit')
         |GROUP BY service_name, severity_text
         |ORDER BY service_name, severity_text""".stripMargin)
  }

  /** [[spanLookup]] from PURE SQL: the `graft_lake_lookup` TVF routes
    * the point lookup through span_id's bloom sidecar — the
    * reference's most common interactive query (trace/span/user
    * needle reads) reachable without the library API. Expands at
    * analysis time to [[graft.sources.LakeIndex.on]]'s plan, so bloom
    * file pruning (kept<total, plan-asserted in ExtensionsSpec) and
    * the MOR-delete/evolution semantics are identical to the Scala
    * handle; the hash-match against the same events synthesis as
    * `lake_span_lookup` certifies the SQL route end to end.
    */
  def sqlSpanLookup(spark: SparkSession, dir: String,
                    eventId: Long = 5L): DataFrame = {
    val root = lakeRoot(spark, dir)
    graft.GraftTableFunctions.ensureRegistered(spark)
    val span = md5Hex(eventId.toString).take(16)
    spark.sql(
      s"""SELECT trace_id, span_id,
         | date_format(timestamp, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts_str,
         | service_name, severity_text, body
         |FROM graft_lake_lookup('$root', 'span_id', '$span')
         |ORDER BY ts_str, span_id""".stripMargin)
  }

  private val streamReadBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val streamReadRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  /** A lake whose history a THIRD-PARTY STREAMING job must
    * reconstruct: the payloads land over TWO sync rounds (two distinct
    * manifest offsets the stream must drain in order), then a
    * merge-on-read retraction and a compaction commit — the two
    * channels the append stream must NOT surface (MOR deletes are
    * deliberately unapplied on the incremental-append surface, and the
    * compaction's restated files register `op="rewrite"`).
    */
  private[graft] def streamLakeRoot(spark: SparkSession, dir: String): String =
    graft.sources.FixtureBuild.once(streamReadBuilt, dir, "graft_lakestream", spark) { root =>
      val all = OtlpLogs.parse(payloads(spark, dir), col("payload"))
      val firstHalf = col("service_name").isin("svc-0", "svc-1", "svc-2", "svc-3", "svc-4")
      LogWriter.write(all.filter(firstHalf), root, layout = LogWriter.DailyLayout)
      LogSync.sync(spark, root)
      LogWriter.write(all.filter(!firstHalf), root, layout = LogWriter.DailyLayout)
      LogSync.sync(spark, root)
      graft.sources.LakeDml.deleteMor(spark, root,
        col("service_name") === "svc-3" && col("severity_text") === "view")
      graft.sources.LogCompact.compact(spark, root)
    }

  /** `lake_stream_read`: the streaming façade under the ORACLE gate —
    * `spark.readStream.format("graft")` ([[graft.sources.GraftLakeSource]])
    * drains [[streamLakeRoot]] with `Trigger.AvailableNow` into a
    * memory sink, then severity counts over the collected rows. The
    * oracle is the FULL events synthesis: a hash-match certifies the
    * append-stream contract end to end — both sync rounds surface
    * exactly once (manifest-position offsets, batch = a `(start, end]`
    * registration window), while the MOR delete and the compaction
    * rewrite stay invisible (tableSince semantics: an appended row
    * surfaces exactly once even if later deleted; restated files are
    * `op="rewrite"`). Each call is a FRESH query instance on a fresh
    * ephemeral checkpoint, so the result is a pure function of the
    * fixture — Bench re-runs re-drain from the epoch deterministically.
    */
  def streamReadSeverity(spark: SparkSession, dir: String): DataFrame = {
    val root = streamLakeRoot(spark, dir)
    val sink = s"graft_stream_read_${streamReadRuns.incrementAndGet()}"
    val q = spark.readStream.format("graft").load(root)
      .select(col("service_name"), col("severity_text"))
      .writeStream.format("memory").queryName(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))
  }

  private val morBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A lake whose redaction ran MERGE-ON-READ: the same payloads, then
    * [[graft.sources.LakeDml.deleteMor]] of one service's 'signup'
    * logs — NO data file rewritten, the matched row positions recorded
    * as Iceberg v2-shaped position-delete files — then a fresh
    * [[graft.sources.IcebergExport.export]] chaining them as a real v2
    * DELETE snapshot. The `lake_iceberg_dml` query reads the table
    * back THROUGH that exported chain ([[IcebergExport.readTable]]'s
    * merge-on-read path: scan + per-file sequence attach + position
    * anti-join), so its hash-match against the events-minus-deleted
    * oracle certifies write-side deletes end-to-end: position capture,
    * delete-file write, sidecar registration, delete-manifest export,
    * spec-rule application on read. At 100 TB this is the path that
    * makes a one-row redaction O(1 row), not O(file): the CoW twin
    * ([[dmlRoot]]) rewrites whole files; this one writes bytes
    * proportional to the deleted rows and defers materialization to
    * the next compaction.
    */
  private[graft] def morRoot(spark: SparkSession, dir: String): String =
    graft.sources.FixtureBuild.once(morBuilt, dir, "graft_lakemor", spark) { root =>
      LogWriter.write(OtlpLogs.parse(payloads(spark, dir), col("payload")), root,
        layout = LogWriter.DailyLayout)
      LogSync.sync(spark, root)
      graft.sources.IcebergExport.export(spark, root)
      val stats = graft.sources.LakeDml.deleteMor(spark, root,
        col("service_name") === "svc-7" && col("severity_text") === "signup")
      require(stats.filesRemoved == 0 && stats.rowsChanged > 0,
        s"MOR fixture must delete rows without rewriting files: $stats")
      graft.sources.IcebergExport.export(spark, root)
    }

  /** Severity counts read through the graft-WRITTEN v2 delete
    * snapshot ([[morRoot]]) — the merge-on-read interop certification.
    */
  def morSeverity(spark: SparkSession, dir: String): DataFrame =
    graft.sources.IcebergExport.readTable(spark, morRoot(spark, dir))
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))

  private val mergeMorBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A lake corrected by MERGE-ON-READ upsert
    * ([[graft.sources.LakeDml.upsertMor]]): svc-2's 'signup' rows are
    * RECLASSIFIED to severity 'converted' — keyed on span_id, the
    * matched originals position-deleted (no data file rewritten), the
    * corrected rows appended — then exported, so the chain carries a
    * MIXED delta snapshot (delete manifest + data manifest in one
    * commit). The update frame derives from the PAYLOADS, not the
    * live table, so the fixture is deterministic and the DuckDB
    * oracle replays it as a CASE on the events synthesis.
    */
  private[graft] def mergeMorRoot(spark: SparkSession, dir: String): String =
    graft.sources.FixtureBuild.once(mergeMorBuilt, dir, "graft_lakemerge", spark) { root =>
      LogWriter.write(OtlpLogs.parse(payloads(spark, dir), col("payload")), root,
        layout = LogWriter.DailyLayout)
      LogSync.sync(spark, root)
      graft.sources.IcebergExport.export(spark, root)
      val updates = OtlpLogs.parse(payloads(spark, dir), col("payload"))
        .filter(col("service_name") === "svc-2" && col("severity_text") === "signup")
        .withColumn("severity_text", lit("converted"))
        // the registered table carries the layout-derived columns —
        // update rows must supply them the way LogWriter derives them
        .withColumn("year", year(col("timestamp")))
        .withColumn("month", month(col("timestamp")))
        .withColumn("day", dayofmonth(col("timestamp")))
        .withColumn("hour", hour(col("timestamp")))
      val stats = graft.sources.LakeDml.upsertMor(spark, root, updates, Seq("span_id"))
      require(stats.filesRemoved == 0 && stats.rowsChanged > 0,
        s"MOR merge fixture must replace rows without rewriting files: $stats")
      graft.sources.IcebergExport.export(spark, root)
    }

  /** `lake_iceberg_merge`: severity counts through the exported chain
    * of [[mergeMorRoot]] — hash-matching the reclassified oracle
    * certifies the WRITE half of MOR merge (position capture on the
    * matched keys, delete-file write, update append, mixed-delta
    * export, spec-rule application on read) end-to-end.
    */
  def mergeMorSeverity(spark: SparkSession, dir: String): DataFrame =
    graft.sources.IcebergExport.readTable(spark, mergeMorRoot(spark, dir))
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))

  private val eqMorBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A lake corrected by EQUALITY-delete DML — the streaming-CDC
    * shape ([[graft.sources.LakeDml.upsertEq]]/
    * [[graft.sources.LakeDml.deleteEq]]): svc-3's 'view' rows are
    * reclassified to 'vip' by an equality-delete upsert (ONE commit,
    * keyed retraction + appended replacements at the SAME sequence
    * number — O(batch), no lake scan, no position lookup), then
    * svc-6's 'error' rows are retracted outright by a keyed
    * [[graft.sources.LakeDml.deleteEq]], then the chain re-exports.
    * The second export carries the interleaving: data files at the
    * upsert's sequence plus TWO equality deletes, which the export's
    * snapshot grouping splits into sequence-consistent snapshots —
    * the upsert's inserts share their delete's sequence (and so
    * survive it, strictly-below), the later delete sits strictly
    * above them (and so applies).
    */
  private[graft] def eqMorRoot(spark: SparkSession, dir: String): String =
    graft.sources.FixtureBuild.once(eqMorBuilt, dir, "graft_lakeeq", spark) { root =>
      LogWriter.write(OtlpLogs.parse(payloads(spark, dir), col("payload")), root,
        layout = LogWriter.DailyLayout)
      LogSync.sync(spark, root)
      graft.sources.IcebergExport.export(spark, root)
      val updates = OtlpLogs.parse(payloads(spark, dir), col("payload"))
        .filter(col("service_name") === "svc-3" && col("severity_text") === "view")
        .withColumn("severity_text", lit("vip"))
        .withColumn("year", year(col("timestamp")))
        .withColumn("month", month(col("timestamp")))
        .withColumn("day", dayofmonth(col("timestamp")))
        .withColumn("hour", hour(col("timestamp")))
      val up = graft.sources.LakeDml.upsertEq(spark, root, updates, Seq("span_id"))
      require(up.filesRemoved == 0 && up.rowsChanged > 0,
        s"equality-merge fixture must retract by key without touching files: $up")
      val victims = OtlpLogs.parse(payloads(spark, dir), col("payload"))
        .filter(col("service_name") === "svc-6" && col("severity_text") === "error")
        .select(col("span_id"))
      val del = graft.sources.LakeDml.deleteEq(spark, root, victims)
      require(del.filesRemoved == 0 && del.rowsChanged > 0,
        s"equality-delete fixture must retract rows: $del")
      graft.sources.IcebergExport.export(spark, root)
    }

  /** `lake_iceberg_eqdml`: severity counts through the exported chain
    * of [[eqMorRoot]] — hash-matching the reclassified-minus-retracted
    * oracle certifies the EQUALITY-delete write path end-to-end:
    * keyed delete parquet with export field ids, explicit sequence
    * numbers, strictly-below application in graft's own read,
    * same-sequence insert survival, interleaving-consistent snapshot
    * export (content=2 entries with equality_ids), and the external
    * MOR read-back.
    */
  def eqMorSeverity(spark: SparkSession, dir: String): DataFrame =
    graft.sources.IcebergExport.readTable(spark, eqMorRoot(spark, dir))
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))

  private val cdcApplyBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A lake MAINTAINED BY A CDC CHANGELOG —
    * [[graft.streaming.CdcApply.applyBatch]], the batch entry point of
    * the streaming upsert sink, driven with a deterministic two-batch
    * changelog that exercises every changelog rule the sink promises:
    *
    *  - batch 1 (LSN-ordered): svc-5 'view' rows get TWO updates per
    *    key — a decoy at lsn 1 ('tmp') and the winner at lsn 2
    *    ('flagged'); latest-wins resolution must land only 'flagged'.
    *    svc-8 'purchase' rows are deleted by key; svc-9 'signup' rows
    *    insert novel 'replayed' twins (fresh `cdc-` keys).
    *  - batch 2 (key-unique, no LSN): the even-event half of the
    *    'flagged' keys is deleted — a retraction of rows batch 1
    *    itself upserted, which only works if batch 2's equality
    *    delete sequences strictly above batch 1's inserts — and
    *    svc-0 'error' reclassifies to 'triaged'.
    *
    * Then the accumulated equality deletes (two per batch: the
    * upsert's internal retraction + the genuine delete) are retired by
    * [[graft.sources.LakeDml.convertEqDeletes]] — the CDC steady
    * state's maintenance step, NO data rewrite — and the chain
    * re-exports. The final read goes through the exported Iceberg
    * metadata, so the hash-match certifies the whole CDC apply →
    * eq-DML → conversion → export → external-read pipeline in one
    * number.
    */
  private[graft] def cdcApplyRoot(spark: SparkSession, dir: String): String =
    graft.sources.FixtureBuild.once(cdcApplyBuilt, dir, "graft_lakecdc", spark) { root =>
      LogWriter.write(OtlpLogs.parse(payloads(spark, dir), col("payload")), root,
        layout = LogWriter.DailyLayout)
      LogSync.sync(spark, root)
      graft.sources.IcebergExport.export(spark, root)
      val parsed = OtlpLogs.parse(payloads(spark, dir), col("payload"))
        .withColumn("year", year(col("timestamp")))
        .withColumn("month", month(col("timestamp")))
        .withColumn("day", dayofmonth(col("timestamp")))
        .withColumn("hour", hour(col("timestamp")))
      def tagged(df: DataFrame, op: String, lsn: Long): DataFrame =
        df.withColumn("op", lit(op)).withColumn("lsn", lit(lsn))
      val sv5view = parsed.filter(col("service_name") === "svc-5" &&
        col("severity_text") === "view")
      val batch1 = tagged(sv5view.withColumn("severity_text", lit("tmp")), "U", 1L)
        .unionByName(tagged(
          sv5view.withColumn("severity_text", lit("flagged")), "U", 2L))
        .unionByName(tagged(parsed.filter(col("service_name") === "svc-8" &&
          col("severity_text") === "purchase"), "D", 1L))
        .unionByName(tagged(parsed.filter(col("service_name") === "svc-9" &&
            col("severity_text") === "signup")
          .withColumn("span_id", concat(lit("cdc-"), col("span_id")))
          .withColumn("severity_text", lit("replayed")), "I", 1L))
      graft.streaming.CdcApply.applyBatch(batch1, root, Seq("span_id"), "op",
        Some("lsn"))
      // batch 2 keys derive from the EVENTS side (span_id is
      // md5(event_id) — the same derivation [[payloads]] encodes), so
      // the oracle can replay the even-half split in SQL
      val delKeys = Tables.events(spark, dir)
        .filter(col("user_id") % 10 === 5 && col("event_type") === "view" &&
          col("event_id") % 2 === 0)
        .select(substring(md5(col("event_id").cast("string")), 1, 16).as("span_id"))
      val batch2 = sv5view.join(delKeys, Seq("span_id"), "left_semi")
        .withColumn("op", lit("D"))
        .unionByName(parsed.filter(col("service_name") === "svc-0" &&
            col("severity_text") === "error")
          .withColumn("severity_text", lit("triaged"))
          .withColumn("op", lit("U")))
      graft.streaming.CdcApply.applyBatch(batch2, root, Seq("span_id"), "op", None)
      val t = LogSync.table(spark, root)
      require(t.filter(col("severity_text") === "tmp").count() == 0,
        "lsn resolution must drop the decoy update entirely")
      require(t.filter(col("severity_text") === "flagged").count() > 0 &&
        t.filter(col("severity_text") === "replayed").count() > 0,
        "CDC fixture must land upserts and inserts")
      // the steady-state retirement: all four eq deletes (two
      // upsert-born, two genuine) convert to position deletes — no
      // data file rewritten — before the certified export
      val (retired, posRows) = graft.sources.LakeDml.convertEqDeletes(spark, root)
      require(retired == 4 && posRows > 0,
        s"conversion must retire all CDC eq deletes: ($retired, $posRows)")
      graft.sources.IcebergExport.export(spark, root)
    }

  /** `lake_cdc_apply`: severity counts through the exported chain of
    * [[cdcApplyRoot]] — hash-matching the SQL-replayed changelog
    * certifies the streaming CDC sink's batch semantics (latest-wins
    * LSN resolution, upsert/delete disjointness, cross-batch
    * sequencing) AND the equality→position delete conversion, through
    * the external read.
    */
  def cdcApplySeverity(spark: SparkSession, dir: String): DataFrame =
    graft.sources.IcebergExport.readTable(spark, cdcApplyRoot(spark, dir))
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))

  private val evolveBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A lake whose schema EVOLVED mid-chain, id-bound
    * ([[graft.sources.LakeEvolve]]): export #1 under the original
    * schema, then `severity_text` RENAMES to `severity` (metadata-only,
    * same field id) and `severity_number` PROMOTES int → long
    * (widening), then a post-evolution batch (svc-0/1/2 twins, severity
    * 'evolved', `ev2-` keys, severity_number written wide) lands under
    * the new shape, then export #2 — a DELTA that mints schema-id 1,
    * keeps snapshot history, and aliases the retired name in the
    * spec's name-mapping. No data file is rewritten at any point: the
    * pre-rename files keep `severity_text`/int32 physically forever.
    */
  private[graft] def evolveRoot(spark: SparkSession, dir: String): String =
    graft.sources.FixtureBuild.once(evolveBuilt, dir, "graft_lakeevolve", spark) { root =>
      LogWriter.write(OtlpLogs.parse(payloads(spark, dir), col("payload")), root,
        layout = LogWriter.DailyLayout)
      LogSync.sync(spark, root)
      graft.sources.IcebergExport.export(spark, root)
      graft.sources.LakeEvolve.renameColumn(spark, root, "severity_text", "severity")
      graft.sources.LakeEvolve.promoteColumn(spark, root, "severity_number",
        org.apache.spark.sql.types.LongType)
      val batch2 = OtlpLogs.parse(payloads(spark, dir), col("payload"))
        .filter(col("service_name").isin("svc-0", "svc-1", "svc-2"))
        .withColumnRenamed("severity_text", "severity")
        .withColumn("severity", lit("evolved"))
        .withColumn("severity_number", col("severity_number").cast("long"))
        .withColumn("span_id", concat(lit("ev2-"), col("span_id")))
      LogWriter.write(batch2, root, layout = LogWriter.DailyLayout)
      LogSync.sync(spark, root)
      graft.sources.IcebergExport.export(spark, root)
    }

  /** `lake_evolve`: severity counts AND the promoted column's sum,
    * through the exported chain of [[evolveRoot]] — both the CURRENT
    * read (old + new generations folded under the renamed column, the
    * int32 generation widening into the long sum) and the
    * PRE-EVOLUTION snapshot, which reads under ITS OWN schema-id
    * (snapshot-schema time travel: the old name `severity_text` and
    * the narrow int — the query aligns them to the current shape only
    * to union the two phases). One hash certifies: the metadata-only
    * rename, the widening promotion, forward writes under the new
    * shape, the schema-history delta export, snapshot-schema
    * resolution, and both external reads.
    */
  def evolveSeverity(spark: SparkSession, dir: String): DataFrame = {
    val root = evolveRoot(spark, dir)
    val snaps = graft.sources.IcebergExport.snapshots(spark, root)
    val first = snaps.find(_._3.isEmpty).getOrElse(snaps.minBy(_._2))
    def agg(df: DataFrame, phase: String): DataFrame =
      df.groupBy(col("service_name"), col("severity"))
        .agg(count(lit(1)).as("n"), sum(col("severity_number")).as("sum_sev"))
        .withColumn("phase", lit(phase))
    agg(graft.sources.IcebergExport.readTable(spark, root), "cur")
      .unionByName(agg(graft.sources.IcebergExport.readTable(spark, root,
        Some(graft.sources.IcebergExport.BySnapshotId(first._1)))
        .withColumnRenamed("severity_text", "severity"), "pre"))
      .select(col("phase"), col("service_name"), col("severity"),
        col("n"), col("sum_sev"))
      .orderBy(col("phase"), col("service_name"), col("severity"))
  }

  private val specEvolveBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A lake whose DIRECTORY LAYOUT flipped mid-chain — hourly
    * (`service/year/month/day/hour` dirs) to daily (`hour` kept as a
    * data column), the exact knob [[LogWriter.DailyLayout]] exposes:
    * export #1 describes the hourly generation under spec-id 0;
    * the daily batch (svc-0/1 'daily' twins, `ev2-` keys) lands at a
    * different directory depth, and export #2 mints spec-id 2 for it
    * (partition-spec EVOLUTION: the carried manifests keep spec 0,
    * partition-field ids are reused by name, `default-spec-id` moves
    * to the newest generation) while retaining snapshot history — no
    * restatement, no data rewrite. The mixed root is structurally
    * unreadable by Spark's own directory discovery (conflicting
    * depths), so the chain read is manifest-driven end to end.
    */
  private[graft] def specEvolveRoot(spark: SparkSession, dir: String): String =
    graft.sources.FixtureBuild.once(specEvolveBuilt, dir, "graft_lakespecs", spark) { root =>
      // one service × a 5-day window: the hourly generation is
      // ≤120 partition cells — enough to exercise every multi-spec
      // mechanism while the per-query chain read stays file-count
      // bounded at any sf (hourly cells only make sense when they
      // hold file-sized data; see LogWriter.DailyLayout's note)
      val two = OtlpLogs.parse(payloads(spark, dir), col("payload"))
        .filter(col("service_name") === "svc-0" &&
          year(col("timestamp")) === 2024 && month(col("timestamp")) === 1 &&
          dayofmonth(col("timestamp")).between(10, 14))
      LogWriter.write(two, root, layout = LogWriter.HourlyLayout)
      LogSync.sync(spark, root)
      graft.sources.IcebergExport.export(spark, root)
      val daily = two
        .withColumn("severity_text", lit("daily"))
        .withColumn("span_id", concat(lit("ev2-"), col("span_id")))
      LogWriter.write(daily, root, layout = LogWriter.DailyLayout)
      LogSync.sync(spark, root)
      graft.sources.IcebergExport.export(spark, root)
    }

  /** `lake_spec_evolve`: severity counts BY HOUR through the exported
    * two-spec chain of [[specEvolveRoot]] — the hour value comes from
    * the MANIFEST partition record for the hourly generation and from
    * the DATA column for the daily one (coalesced per file by the
    * multi-spec reader), so the hash-match certifies partition-spec
    * evolution end to end: per-manifest spec resolution, the
    * dir-vs-data coalesce, default-spec movement, and
    * history-retaining delta export across a layout flip.
    */
  def specEvolveSeverity(spark: SparkSession, dir: String): DataFrame =
    graft.sources.IcebergExport.readTable(spark, specEvolveRoot(spark, dir))
      .groupBy(col("service_name"), col("hour").cast("int").as("hour"),
        col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("hour"), col("severity_text"))

  /** `lake_native_specs`: the SAME severity-by-hour aggregate as
    * [[specEvolveSeverity]] but through the NATIVE read path
    * ([[graft.sources.LogSync.table]]) — no export detour. The mixed
    * root defeats Spark's own directory discovery, so the read
    * re-plans through the per-generation multi-spec scan (one glob-
    * anchored scan per directory-key generation, unioned by name):
    * `hour` comes from the partition DIRECTORY for the hourly
    * generation and from the DATA column for the daily one, and the
    * hash-match against the identical oracle as `lake_spec_evolve`
    * certifies the native union equals the exported chain's
    * per-manifest spec resolution row-for-row.
    */
  def specEvolveNativeSeverity(spark: SparkSession, dir: String): DataFrame =
    LogSync.table(spark, specEvolveRoot(spark, dir))
      .groupBy(col("service_name"), col("hour").cast("int").as("hour"),
        col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("hour"), col("severity_text"))

  private val retentionBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A lake aged past its retention policy and expired
    * ([[graft.sources.LakeDml.expireBefore]] at a MID-DAY cutoff): the
    * daily-partitioned payloads lake loses every row before
    * Jan 16 12:00 — the fully-covered day files drop METADATA-ONLY
    * (one manifest swap, zone-map + null-count proof, no data byte
    * read), the straddling Jan 16 files shed their morning rows
    * through a position-delete commit — then the chain re-exports.
    * The `require`s pin BOTH paths firing: a fixture where everything
    * went through the row path (or everything dropped) would certify
    * only half the operator. At 100 TB this is the nightly TTL job:
    * O(manifest) planning + a scan of the handful of cutoff-straddling
    * files, never the lake.
    */
  private[graft] def retentionRoot(spark: SparkSession, dir: String): String =
    graft.sources.FixtureBuild.once(retentionBuilt, dir, "graft_lakeret", spark) { root =>
      LogWriter.write(OtlpLogs.parse(payloads(spark, dir), col("payload")), root,
        layout = LogWriter.DailyLayout)
      LogSync.sync(spark, root)
      graft.sources.IcebergExport.export(spark, root)
      val stats = graft.sources.LakeDml.expireBefore(spark, root,
        java.sql.Timestamp.valueOf("2024-01-16 12:00:00"))
      require(stats.filesRemoved > 0,
        s"retention fixture must drop whole files by metadata: $stats")
      require(stats.filesAdded > 0,
        s"retention fixture must split the cutoff day by rows: $stats")
      graft.sources.IcebergExport.export(spark, root)
    }

  /** `lake_retention`: severity counts through the exported chain of
    * [[retentionRoot]] — hash-matching the ts-filtered oracle
    * certifies the retention delete end-to-end: the metadata-only
    * file drops (manifest restatement in the export), the boundary
    * position deletes, and the external read-back, in one number.
    */
  def retentionSeverity(spark: SparkSession, dir: String): DataFrame =
    graft.sources.IcebergExport.readTable(spark, retentionRoot(spark, dir))
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))

  private val evolveStatsBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A FLAT lake (no partition dirs — the shape where the manifest's
    * zone-map stats ARE the pruning story) whose BOTH stat axes were
    * renamed mid-life: `service_name` → `service`, `timestamp` →
    * `event_time` ([[graft.sources.LakeEvolve]] stat-axis renames —
    * metadata-only; the recorded min/max are the fields' values, so
    * not one zone-map bound moves). A post-rename batch (svc-0/1
    * 'statted' twins under the NEW names) lands and syncs, proving
    * registration keeps computing stats through the renamed axis.
    */
  private[graft] def evolveStatsRoot(spark: SparkSession, dir: String): String =
    graft.sources.FixtureBuild.once(evolveStatsBuilt, dir, "graft_lakeevstats", spark) { root =>
      val base = OtlpLogs.parse(payloads(spark, dir), col("payload"))
        .select(col("timestamp"), col("service_name"), col("severity_text"),
          col("span_id"), col("body"))
      base.coalesce(4).write.mode("append").parquet(root)
      LogSync.sync(spark, root)
      graft.sources.LakeEvolve.renameColumn(spark, root, "service_name", "service")
      graft.sources.LakeEvolve.renameColumn(spark, root, "timestamp", "event_time")
      val twins = base.filter(col("service_name").isin("svc-0", "svc-1"))
        .select(col("timestamp").as("event_time"),
          col("service_name").as("service"),
          lit("statted").as("severity_text"),
          concat(lit("ev2-"), col("span_id")).as("span_id"), col("body"))
      twins.coalesce(1).write.mode("append").parquet(root)
      LogSync.sync(spark, root)
      // the post-rename round must have statted its files through the
      // renamed axes — a null here would mean pruning silently died
      val freshStats = LogSync.manifest(spark, root)
        .orderBy(col("registered_at").desc).limit(1).collect().head
      require(freshStats.getAs[java.sql.Timestamp]("min_ts") != null,
        "post-rename sync lost the time zone-map")
    }

  /** `lake_evolve_stats`: severity counts over a zone-map-pruned TIME
    * WINDOW read ([[LogSync.tableBetween]]) of [[evolveStatsRoot]] —
    * the window filter binds the RENAMED time axis and the grouping
    * the renamed service axis, so the hash certifies stat-axis
    * renames end to end: axis resolution through the schema log, the
    * unchanged manifest zone maps, post-rename stat computation, and
    * the alias fold on pre-rename files.
    */
  def evolveStatsSeverity(spark: SparkSession, dir: String): DataFrame = {
    val root = evolveStatsRoot(spark, dir)
    LogSync.tableBetween(spark, root, "2024-01-05", "2024-01-25")
      .groupBy(col("service"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service"), col("severity_text"))
  }

  private val evolveLayoutBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A PARTITIONED lake in the reference's directory shape
    * (`service_name/year/month/day` dirs — README's layout at day
    * granularity) whose DIRECTORY-KEY column was renamed mid-life:
    * `service_name` → `service` ([[graft.sources.LakeEvolve]] layout
    * alias — metadata-only; the tree keeps its `service_name=` keys
    * forever, exactly like data files keep their physical column
    * names). A post-rename batch (svc-0/1 'relaid' twins, still
    * landing under the PHYSICAL key) syncs normally, proving forward
    * writes and stat registration survive the rename.
    */
  private[graft] def evolveLayoutRoot(spark: SparkSession, dir: String): String =
    graft.sources.FixtureBuild.once(evolveLayoutBuilt, dir, "graft_lakeevlayout", spark) { root =>
      val base = OtlpLogs.parse(payloads(spark, dir), col("payload"))
        .select(col("timestamp"), col("service_name"), col("severity_text"),
          col("span_id"), col("body"))
      LogWriter.write(base, root, layout = LogWriter.DailyLayout)
      LogSync.sync(spark, root)
      graft.sources.LakeEvolve.renameColumn(spark, root, "service_name", "service")
      val twins = base.filter(col("service_name").isin("svc-0", "svc-1"))
        .select(col("timestamp"), col("service_name"),
          lit("relaid").as("severity_text"),
          concat(lit("ev2-"), col("span_id")).as("span_id"), col("body"))
      LogWriter.write(twins, root, layout = LogWriter.DailyLayout)
      LogSync.sync(spark, root)
    }

  /** `lake_evolve_layout`: severity counts for two services selected
    * BY THE RENAMED LAYOUT COLUMN (`service`, physically still the
    * `service_name=` directory key) — the hash certifies the layout
    * alias end to end: dir-key resolution through the schema log, the
    * alias fold, post-rename syncs, and the equality filter that the
    * optimizer pushes through the alias into PartitionFilters (the
    * pruning itself is asserted plan-level in LakeEvolveSpec).
    */
  def evolveLayoutSeverity(spark: SparkSession, dir: String): DataFrame = {
    val root = evolveLayoutRoot(spark, dir)
    LogSync.table(spark, root)
      .filter(col("service").isin("svc-0", "svc-3"))
      .groupBy(col("service"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service"), col("severity_text"))
  }

  private val travelSchemaBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A lake whose `body` column was DROPPED mid-life (metadata-only,
    * [[graft.sources.LakeEvolve.dropColumn]]) and then grew a
    * post-drop batch (svc-0 'afterdrop' twins, written without the
    * retired column). The schema log records the drop instant, so a
    * time-travel anchor BEFORE it reads under the pre-drop schema.
    */
  private[graft] def travelSchemaRoot(spark: SparkSession, dir: String): String =
    graft.sources.FixtureBuild.once(travelSchemaBuilt, dir, "graft_laketravel", spark) { root =>
      val base = OtlpLogs.parse(payloads(spark, dir), col("payload"))
        .select(col("timestamp"), col("service_name"), col("severity_text"),
          col("span_id"), col("body"))
      base.coalesce(4).write.mode("append").parquet(root)
      LogSync.sync(spark, root)
      Thread.sleep(20) // clock separation: registration < drop instant
      graft.sources.LakeEvolve.dropColumn(spark, root, "body")
      val twins = base.filter(col("service_name") === "svc-0")
        .select(col("timestamp"), col("service_name"),
          lit("afterdrop").as("severity_text"),
          concat(lit("ev2-"), col("span_id")).as("span_id"))
      twins.coalesce(1).write.mode("append").parquet(root)
      LogSync.sync(spark, root)
    }

  /** `lake_travel_schema`: SNAPSHOT-SCHEMA time travel on the native
    * lake — the 'pre' phase anchors just before the drop recorded in
    * the schema log and still reads the dropped `body` column (its
    * per-row values counted into `n_body`), the 'cur' phase reads the
    * post-drop schema (body gone, the twins visible). One hash
    * certifies the as-of schema resolution, the drop's metadata-only
    * nature (the old bytes still serve the anchor), and the retired
    * name's absence from current reads.
    */
  def travelSchemaSeverity(spark: SparkSession, dir: String): DataFrame = {
    val root = travelSchemaRoot(spark, dir)
    // anchor at the DROP entry specifically — the fixture's sync may
    // legitimately record add entries around it, and `entries.head`
    // would silently move the anchor (and the certified hash) if one
    // ever preceded the drop
    val dropAt = graft.sources.LakeEvolve.state(spark, root)
      .flatMap(_.entries.find(_.op == "drop").map(_.at))
      .getOrElse(sys.error("travel fixture lost its schema log's drop entry"))
    val mark = new java.sql.Timestamp(dropAt - 1)
    val pre = LogSync.tableAsOf(spark, root, mark)
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"), count(col("body")).as("n_body"))
      .withColumn("phase", lit("pre"))
    val cur = LogSync.table(spark, root)
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_body", lit(null).cast("long"))
      .withColumn("phase", lit("cur"))
    pre.unionByName(cur)
      .select(col("phase"), col("service_name"), col("severity_text"),
        col("n"), col("n_body"))
      .orderBy(col("phase"), col("service_name"), col("severity_text"), col("n"))
  }

  private val clusterBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A lake that grew WITHOUT a useful layout and was then re-clustered
    * in place: the same payloads written FLAT (no partition dirs,
    * arrival-shuffled so no file is service- or time-local — the shape
    * of a lake ingested before anyone thought about query patterns),
    * synced, then rewritten once by [[LogCompact.compact]] with
    * `clusterBy = (service_name, timestamp)`. After the rewrite each
    * file covers one service's contiguous time slice, and the
    * manifest's dual zone maps make [[LogSync.tableFor]] prune like a
    * partition layout would — the Iceberg clustered-rewrite story for
    * the 100 TB lake you cannot afford to re-partition by directory.
    * File size is capped small here so the test-scale lake has enough
    * files for pruning to be observable.
    */
  private[graft] def clusteredRoot(spark: SparkSession, dir: String): String =
    clusterBuilt.computeIfAbsent(dir, _ => {
      val root = s"/tmp/graft_lakeclu_v1_${Integer.toHexString(dir.hashCode & 0x7fffffff)}"
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new Path(s"$root/_built")
      if (!fs.exists(marker)) {
        fs.delete(rootPath, true)
        OtlpLogs.parse(payloads(spark, dir), col("payload"))
          .repartition(24) // deliberate arrival-order interleave
          .write.parquet(root)
        LogSync.sync(spark, root)
        graft.sources.LogCompact.compact(spark, root,
          maxRecordsPerFile = 1000, layout = Some(Seq.empty),
          clusterBy = Some(Seq("service_name", "timestamp")))
        fs.create(marker).close()
      }
      root
    })

  /** Severity counts for one service × 10-day window on the
    * RE-CLUSTERED flat lake via [[LogSync.tableFor]] — both zone maps
    * (service and time) prune the file set before the scan; the
    * hash-match certifies pruning never drops a row, the spec asserts
    * the kept-file fraction actually fell.
    */
  def clusterWindow(spark: SparkSession, dir: String): DataFrame =
    LogSync.tableFor(spark, clusteredRoot(spark, dir),
        "svc-3", "2024-01-10", "2024-01-20")
      .groupBy(col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("severity_text"))

  private val rewriteManBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A lake whose REGISTRIES were consolidated mid-life
    * ([[graft.sources.LogCompact.rewriteManifests]] — Iceberg's
    * `rewrite_manifests` for this lake's control plane): three sync
    * rounds each APPEND manifest part-files (the reference's
    * converter lands a batch every ~10 s — ~8 640 rounds/day, and an
    * append-only lake never rewrites, so planning-time listing grows
    * without bound), plus a MOR delete so the DELETE registry has
    * rows too; then both registries rewrite into consolidated files,
    * row-preserving (tombstones and delete entries included).
    */
  private[graft] def rewriteManRoot(spark: SparkSession, dir: String): String =
    graft.sources.FixtureBuild.once(rewriteManBuilt, dir, "graft_lakerwman", spark) { root =>
      val logs = OtlpLogs.parse(payloads(spark, dir), col("payload"))
      Seq((1, 10), (11, 20), (21, 31)).foreach { case (lo, hi) =>
        LogWriter.write(logs.filter(dayofmonth(col("timestamp")).between(lo, hi)),
          root, layout = LogWriter.DailyLayout)
        LogSync.sync(spark, root)
      }
      graft.sources.LakeDml.deleteMor(spark, root,
        col("service_name") === "svc-2" && col("severity_text") === "click")
      val st = graft.sources.LogCompact.rewriteManifests(spark, root)
      require(st.dataPartsAfter < st.dataPartsBefore,
        s"fixture expected a real consolidation, got $st")
    }

  /** `lake_rewrite_manifests`: severity counts over the lake AFTER
    * both registries were consolidated — the hash-match certifies the
    * rewrite is row-preserving end to end (every registration
    * survives, the MOR delete still applies through the rewritten
    * delete registry); the spec asserts the part-file counts actually
    * fell and time travel still resolves.
    */
  def rewriteManSeverity(spark: SparkSession, dir: String): DataFrame = {
    LogSync.table(spark, rewriteManRoot(spark, dir))
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))
  }

  private val mergedBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A lake whose schema EVOLVED mid-life: the first half (days ≤ 15)
    * written before `scope_version` existed (the column is absent from
    * those parquet files entirely), the second half with the full
    * 15-column schema — the Iceberg add-column story on raw parquet.
    */
  private[graft] def mergedRoot(spark: SparkSession, dir: String): String =
    mergedBuilt.computeIfAbsent(dir, _ => {
      val root = s"/tmp/graft_lakemrg_v1_${Integer.toHexString(dir.hashCode & 0x7fffffff)}"
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new Path(s"$root/_built")
      if (!fs.exists(marker)) {
        fs.delete(rootPath, true)
        val logs = OtlpLogs.parse(payloads(spark, dir), col("payload"))
        LogWriter.write(logs.filter(dayofmonth(col("timestamp")) <= 15)
          .drop("scope_version"), root, layout = LogWriter.DailyLayout)
        LogSync.sync(spark, root)
        LogWriter.write(logs.filter(dayofmonth(col("timestamp")) >= 16), root,
          layout = LogWriter.DailyLayout)
        LogSync.sync(spark, root)
        fs.create(marker).close()
      }
      root
    })

  /** SCHEMA-EVOLUTION READ ([[LogSync.tableMerged]]): severity counts
    * split by the evolved column's presence. Pre-evolution files have
    * no `scope_version` column at all; the merged read NULL-fills them
    * while post-evolution rows carry the value — the hash-match
    * certifies that a column added mid-life reads correctly across the
    * whole history (the Iceberg add-column semantics, without a
    * catalog). Nulls are labeled so the output is null-free and the
    * ordering engine-independent.
    */
  def mergedSchema(spark: SparkSession, dir: String): DataFrame =
    LogSync.tableMerged(spark, mergedRoot(spark, dir))
      .groupBy(col("severity_text"),
        coalesce(col("scope_version"), lit("(pre-evolution)")).as("ver"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("severity_text"), col("ver"))

  private val changesBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A lake with HISTORY, for the incremental-read query: the first
    * half (days ≤ 15) written and synced (append commit 1), the
    * consumer's high-water mark captured, the second half written and
    * synced (append commit 2), then the whole lake COMPACTED (a rewrite
    * commit that tombstones both appends). The mark is persisted in
    * `_incmark` so the build is reusable across JVMs.
    */
  private[graft] def changesRoot(spark: SparkSession, dir: String): String =
    changesBuilt.computeIfAbsent(dir, _ => {
      val root = s"/tmp/graft_lakeinc_v3_${Integer.toHexString(dir.hashCode & 0x7fffffff)}"
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new Path(s"$root/_built")
      if (!fs.exists(marker)) {
        fs.delete(rootPath, true)
        val logs = OtlpLogs.parse(payloads(spark, dir), col("payload"))
        LogWriter.write(logs.filter(dayofmonth(col("timestamp")) <= 15), root,
          layout = LogWriter.DailyLayout)
        LogSync.sync(spark, root)
        val mark = LogSync.highWaterMark(spark, root).get
        val out = fs.create(new Path(s"$root/_incmark"))
        // Timestamp.toString keeps the sub-millisecond digits —
        // getTime (millis) would truncate below registered_at's µs
        // precision and re-admit the boundary file
        out.write(mark.toString.getBytes("UTF-8")); out.close()
        // zero-copy pin of the first-half state; survives the later
        // append and compaction untouched
        LogSync.branch(spark, root, "pre2")
        Thread.sleep(100) // registration clock must advance past the mark
        LogWriter.write(logs.filter(dayofmonth(col("timestamp")) >= 16), root,
          layout = LogWriter.DailyLayout)
        LogSync.sync(spark, root)
        // the rewrite commit the incremental reader must NOT re-consume
        graft.sources.LogCompact.compact(spark, root)
        fs.create(marker).close()
      }
      root
    })

  private def incMark(spark: SparkSession, root: String): java.sql.Timestamp = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(s"$root/_incmark"))
    val bytes = new Array[Byte](64)
    val n = in.read(bytes); in.close()
    java.sql.Timestamp.valueOf(new String(bytes, 0, n, "UTF-8").trim)
  }

  /** INCREMENTAL CONSUMPTION ([[LogSync.tableSince]]): severity counts
    * over exactly the rows appended after the consumer's mark — here
    * the second half of the data. The lake was compacted AFTER the
    * mark, so the hash-match (oracle: events from day 16 on) certifies
    * all three incremental-read guarantees at once: append commits
    * after the mark are consumed, the interleaved REWRITE commit's
    * files are skipped (else every pre-mark row would reappear), and
    * tombstoned append files remain readable until vacuum.
    */
  def changes(spark: SparkSession, dir: String): DataFrame = {
    val root = changesRoot(spark, dir)
    LogSync.tableSince(spark, root, incMark(spark, root))
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))
  }

  /** BRANCH READ ([[LogSync.branch]]/[[LogSync.tableBranch]]): severity
    * counts over the zero-copy "pre2" branch pinned before the second
    * append and the compaction — the hash-match (oracle: events through
    * day 15) certifies the branch is a consistent first-half snapshot
    * that later appends and rewrites cannot disturb, reading tombstoned
    * files as time travel does.
    */
  def branchSeverity(spark: SparkSession, dir: String): DataFrame = {
    val root = changesRoot(spark, dir)
    LogSync.tableBranch(spark, root, "pre2")
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("service_name"), col("severity_text"))
  }
}
