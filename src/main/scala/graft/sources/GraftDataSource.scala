package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.execution.streaming.{Sink => StreamingSinkV1, Source => StreamingSourceV1}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graft").load(root)` — the DataSourceV2 façade
  * that makes a registered lake readable by Spark code that has never
  * heard of the graft library (a third-party job, a BI connector's
  * generic reader). The provider is deliberately THIN: it answers
  * schema questions from [[LogSync.table]]'s resolved plan, and the
  * [[GraftLakeResolution]] rule (installed by
  * [[graft.GraftExtensions]]) swaps the analyzed `DataSourceV2Relation`
  * for that SAME plan during analysis — semi-join-pruned scan, MOR
  * delete application, evolution projection, partition pruning, all
  * byte-identical to the Scala API and the `graft_lake` TVF, because
  * it IS the same logical plan. Options: `path` (the lake root,
  * required), `asOf` (optional timestamp literal → [[LogSync.tableAsOf]]
  * time travel).
  *
  * Honest boundary: the delegation needs the extensions' resolution
  * rule. A session built WITHOUT GraftExtensions still resolves the
  * schema (so `load(root).schema` works anywhere) but refuses the scan
  * LOUDLY at execution with the fix named, rather than shipping a
  * second, drift-prone reimplementation of the read path behind the
  * DSv2 Scan interface.
  *
  * SESSION BINDING (the conventional DSv2 compromise): `TableProvider`
  * hands the provider no session, so [[inferSchema]]/`asOf` parsing
  * resolve through `SparkSession.active` — in a multi-session JVM a
  * read built on one session but EXECUTED on a thread whose active
  * session is another binds schema inference and the travel zone to
  * that other session. The resolution rule itself always uses its
  * INJECTED session, so only the inference/parse step is exposed;
  * single-session processes (the overwhelming norm) never see it.
  *
  * STREAMING ([[StreamSourceProvider]]): `spark.readStream
  * .format("graft").load(root)` resolves to [[GraftLakeSource]] via
  * Spark's V1 streaming fallback (the table declares no streaming
  * capability) — incremental append consumption whose offsets are
  * manifest `registered_at` positions checkpointed in the engine's
  * own WAL (exact because sync rounds are atomically visible with
  * monotone stamps), rewrites invisible; see the source's Scaladoc
  * for the contract. Like the sink, it needs no extensions.
  *
  * STREAMING WRITE ([[StreamSinkProvider]]): `df.writeStream
  * .format("graft").start(root)` resolves to [[GraftLakeSink]] —
  * per-micro-batch write+register with [[graft.streaming.BatchMarkers]]
  * replay idempotence (LakeIngest's protocol, no imports needed); see
  * [[createSink]].
  */
class GraftDataSource extends TableProvider with DataSourceRegister
    with CreatableRelationProvider with StreamSourceProvider
    with StreamSinkProvider {
  override def shortName(): String = "graft"

  /** `df.write.format("graft").mode("append").save(root)` — the write
    * half of the façade: one call performs the reference's manual
    * write-then-register flow ([[LogWriter.write]] partitioned layout
    * + [[LogSync.sync]] manifest registration), so third-party Spark
    * code can PRODUCE a registered lake as easily as it reads one.
    * This rides Spark's V1 sink fallback (the table exposes no
    * BATCH_WRITE capability), which conveniently needs no extensions —
    * writes work in ANY session. Options: `layout` = `hourly`
    * (default, the reference's full layout) | `daily`;
    * `maxRecordsPerFile`. Modes: Append appends + registers;
    * ErrorIfExists (writer default) refuses a root that already has a
    * manifest; Ignore no-ops there; Overwrite refuses LOUDLY — a lake
    * is an append-only log with row-level DML, not a replaceable
    * directory (use LakeDml / SQL `DELETE/MERGE INTO LAKE` to mutate,
    * or write to a fresh root).
    */
  override def createRelation(ctx: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    // the writer hands V1 sinks an original-case map — normalize so
    // .option("Layout", ...) behaves like the DSv2 read options
    val opts = new CaseInsensitiveStringMap(
      scala.jdk.CollectionConverters.MapHasAsJava(parameters).asJava)
    val root = Option(opts.get("path")).getOrElse(sys.error(
      "graft sink needs a lake root: df.write.format(\"graft\").save(<root>)"))
    val spark = ctx.sparkSession
    if (mode == SaveMode.Overwrite) sys.error(
      s"graft sink: Overwrite is refused — $root is an append-only lake " +
        "with row-level DML (LakeDml / DELETE FROM LAKE / MERGE INTO " +
        "LAKE); append to it, mutate it, or write a fresh root")
    // the manifest probe and the mode arm it picks resolve INSIDE the
    // sink lease ([[LogSync.withSinkLease]]): a bare check-then-write
    // let two concurrent ErrorIfExists writers both observe "no
    // manifest" and both land — with the lease, exactly one wins and
    // the loser's re-read sees the winner's manifest and refuses (or
    // no-ops, under Ignore)
    LogSync.withSinkLease(spark, root) {
      val registered = LogSync.hasManifest(spark, root)
      mode match {
        case SaveMode.ErrorIfExists if registered => sys.error(
          s"graft sink: $root is already a registered lake (writer mode " +
            "defaults to ErrorIfExists) — use .mode(\"append\"), or " +
            "SaveMode.Ignore to no-op")
        case SaveMode.Ignore if registered => ()
        case _ =>
          // the schema contract binds only the arms that WRITE — an
          // Ignore no-op (or the refusals above) must not demand the
          // lake schema of a frame it will never touch
          require(data.columns.contains("timestamp") &&
            data.columns.contains("service_name"),
            "the graft sink writes the reference's partitioned log layout " +
              "and needs `timestamp` and `service_name` columns; " +
              "project/rename before writing")
          LogWriter.write(data, root, maxRecOf(opts), layoutOf(opts))
          LogSync.sync(spark, root)
          ()
      }
    }
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = data.schema
    }
  }

  // DSv2 options are case-insensitive by convention — every lookup
  // goes through CaseInsensitiveStringMap, so .option("asof", ...) is
  // time travel, not a silently-ignored key reading the wrong snapshot
  // shared by the batch write and the streaming sink
  private def layoutOf(opts: CaseInsensitiveStringMap): Seq[String] =
    Option(opts.get("layout")) match {
      case Some("daily") => LogWriter.DailyLayout
      case Some("hourly") | None => LogWriter.HourlyLayout
      case Some(other) => sys.error(
        s"graft sink: unknown layout '$other' (hourly | daily)")
    }

  private def maxRecOf(opts: CaseInsensitiveStringMap): Long =
    Option(opts.get("maxRecordsPerFile")).map(_.toLong)
      .getOrElse(LogWriter.DefaultMaxRecordsPerFile)

  private def rootOf(options: CaseInsensitiveStringMap): String = {
    val r = Option(options.get("path")).getOrElse(sys.error(
      "graft source needs a lake root: spark.read.format(\"graft\").load(<root>)"))
    r
  }

  /** Parse `asOf` in the SESSION time zone (Spark's own timestamp
    * parser), so the façade's travel instant agrees with the same
    * literal through `graft_lake_at` / `tableAsOf` — a
    * `Timestamp.valueOf` would bind it to the driver JVM's default
    * zone and silently resolve a different snapshot.
    */
  private def asOfOf(options: CaseInsensitiveStringMap): Option[java.sql.Timestamp] =
    Option(options.get("asOf")).map { s =>
      val zone = org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(
        SparkSession.active.sessionState.conf.sessionLocalTimeZone)
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .stringToTimestamp(org.apache.spark.unsafe.types.UTF8String.fromString(s), zone)
        .map(org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp)
        .getOrElse(sys.error(s"graft source: cannot parse asOf '$s' as a timestamp"))
    }

  private def planFor(options: CaseInsensitiveStringMap) = {
    val spark = SparkSession.active
    val root = rootOf(options)
    asOfOf(options) match {
      case Some(ts) => LogSync.tableAsOf(spark, root, ts)
      case None => LogSync.table(spark, root)
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // the WRITE path probes the table before Spark's V1-sink fallback
    // fires — a fresh (unregistered) root has no schema yet, and
    // refusing here would block the very write that creates it. An
    // empty schema satisfies the probe; a READ of the unregistered
    // root still refuses downstream with LogSync's own "run sync
    // first" when the resolution rule expands the real plan.
    if (!LogSync.hasManifest(SparkSession.active, rootOf(options)))
      new StructType()
    else planFor(options).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    GraftLakeTable(rootOf(opts), asOfOf(opts), schema)
  }

  // ---- streaming read (V1 Source fallback — see class doc) ----------

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val opts = new CaseInsensitiveStringMap(
      scala.jdk.CollectionConverters.MapHasAsJava(parameters).asJava)
    val root = rootOf(opts)
    // unlike the batch read (whose empty-schema probe the write path
    // needs), a STREAM of an unregistered root can refuse up front —
    // there is no stream-writer probe to serve
    require(LogSync.hasManifest(ctx.sparkSession, root),
      s"graft stream source: no manifest under $root — run sync (or write " +
        "through the graft sink) first")
    ("graft", LogSync.table(ctx.sparkSession, root).schema)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): StreamingSourceV1 = {
    val opts = new CaseInsensitiveStringMap(
      scala.jdk.CollectionConverters.MapHasAsJava(parameters).asJava)
    val root = rootOf(opts)
    val maxFiles = Option(opts.get("maxFilesPerTrigger")).map(_.toInt)
      .getOrElse(10000)
    new GraftLakeSource(ctx.sparkSession, root, metadataPath, maxFiles)
  }

  // ---- streaming write (V1 Sink fallback) ---------------------------

  /** `df.writeStream.format("graft").start(root)` — the streaming
    * write half: each micro-batch runs the same write-then-register
    * flow as the batch sink ([[LogWriter.write]] + [[LogSync.sync]]),
    * made idempotent against engine replays by the per-batch marker
    * protocol [[graft.streaming.LakeIngest]] pioneered
    * ([[graft.streaming.BatchMarkers]], shared `_batches/` dir) — a
    * replayed batchId is a no-op, so `Trigger.AvailableNow`/restart
    * cycles land every batch exactly once (the residual window — a
    * crash between sync and the marker write — re-appends one batch,
    * the reference shell loop's own at-least-once boundary; see
    * LakeIngest's doc). Append-only by construction: Update/Complete
    * are refused loudly — a lake is an append log with row-level DML,
    * aggregate on read (or maintain a [[Rollup]]) instead. One
    * streaming writer per root (batchIds are only meaningful against
    * one checkpoint's sequence), same single-writer rule as
    * LakeIngest; LakeIngest remains the library-API surface with
    * rollup maintenance, this is the no-import route.
    */
  override def createSink(ctx: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): StreamingSinkV1 = {
    val opts = new CaseInsensitiveStringMap(
      scala.jdk.CollectionConverters.MapHasAsJava(parameters).asJava)
    val root = rootOf(opts)
    require(outputMode == OutputMode.Append(),
      s"graft streaming sink: OutputMode $outputMode is refused — a lake " +
        "is an append-only log; stream appends and aggregate on read " +
        "(LogSync.table / graft_lake), or maintain a rollup via " +
        "graft.streaming.LakeIngest")
    val retain = Option(opts.get("markerRetain")).map(_.toLong)
      .getOrElse(graft.streaming.BatchMarkers.DefaultRetain)
    new GraftLakeSink(ctx.sparkSession, root, layoutOf(opts), maxRecOf(opts),
      retain)
  }
}

/** The V1 streaming sink [[GraftDataSource.createSink]] returns: the
  * [[graft.streaming.LakeIngest]] foreachBatch body behind the
  * engine's `Sink` interface. The micro-batch frame arrives flagged
  * streaming, so it re-wraps as a batch frame
  * ([[GraftSqlBridge.asBatch]], the Delta V1-sink technique) before
  * the partitioned write.
  */
private[graft] class GraftLakeSink(spark: SparkSession, root: String,
                                   layout: Seq[String], maxRec: Long,
                                   markerRetain: Long) extends StreamingSinkV1 {
  import org.apache.spark.sql.graft.GraftSqlBridge

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val dir = s"$root/_batches"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!graft.streaming.BatchMarkers.exists(fs, dir, batchId)) {
      val batch = GraftSqlBridge.asBatch(data)
      require(batch.columns.contains("timestamp") &&
        batch.columns.contains("service_name"),
        "the graft streaming sink writes the reference's partitioned log " +
          "layout and needs `timestamp` and `service_name` columns; " +
          "project/rename before writing")
      LogWriter.write(batch, root, maxRec, layout)
      LogSync.sync(spark, root)
      graft.streaming.BatchMarkers.commit(fs, dir, batchId, markerRetain)
    }
  }

  override def toString: String = s"GraftLakeSink[$root]"
}

/** The analysis-time handle [[GraftLakeResolution]] resolves. Its
  * `newScanBuilder` is the loud no-extensions boundary, never the read
  * path.
  */
private[graft] final case class GraftLakeTable(root: String,
                                               asOf: Option[java.sql.Timestamp],
                                               tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft.`$root`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    sys.error("the graft DSv2 source delegates to the library's read plan " +
      "through a resolution rule this session does not have — start the " +
      "session with spark.sql.extensions=graft.GraftExtensions (or " +
      ".withExtensions(new GraftExtensions)), or call " +
      "graft.sources.LogSync.table directly")
}

/** Swap every analyzed `DataSourceV2Relation(GraftLakeTable)` for the
  * library's own resolved read plan, aliasing the real plan's output
  * onto the relation's attribute ids so parent operators' references
  * survive the splice. Runs at resolution, so downstream optimization
  * (filter pushdown into the pruned scan, AQE) sees only the real
  * plan — the façade costs nothing at execution.
  */
private[graft] class GraftLakeResolution(spark: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftLakeTable] =>
        val t = r.table.asInstanceOf[GraftLakeTable]
        val real = (t.asOf match {
          case Some(ts) => LogSync.tableAsOf(spark, t.root, ts)
          case None => LogSync.table(spark, t.root)
        }).queryExecution.analyzed
        val byName = real.output.map(a => a.name -> a).toMap
        Project(r.output.map { o =>
          val src = byName.getOrElse(o.name, sys.error(
            s"graft source: column '${o.name}' vanished from ${t.root} " +
              "between schema inference and resolution — the lake evolved " +
              "mid-query; re-plan"))
          Alias(src, o.name)(exprId = o.exprId)
        }, real)
    }
}
