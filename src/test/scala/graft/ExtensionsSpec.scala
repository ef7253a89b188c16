package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions: graft_dot/graft_minhash usable from plain SQL") {
    val prior = spark // force shared-suite session creation first
    assert(prior != null)
    // getOrCreate reuses an existing session and would skip extensions,
    // so detach the default/active session before building
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val d = s2.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect()(0).getDouble(0)
      assert(d == 11.0)
      val sig = s2.sql("SELECT graft_minhash(array(5L, 7L)) AS s")
        .collect()(0).getSeq[Long](0)
      assert(sig.length == 64 && sig.forall(_ >= 0))
      val bits = s2.sql("SELECT graft_simhash(array('alpha', 'beta')) AS b")
        .collect()(0).getLong(0)
      val same = s2.sql("SELECT graft_simhash(array('alpha', 'beta')) AS b")
        .collect()(0).getLong(0)
      assert(bits == same, "simhash must be deterministic")
      val bk = s2.sql("SELECT graft_hyperplanes(array(1.0d, -2.0d), 5, 3) AS b")
        .collect()(0).getSeq[Int](0)
      assert(bk.length == 3 && bk.forall(b => b >= 0 && b < 32))
      // the extension path applies the same guards as the registry path:
      // wrong arity / non-literal parameters fail with a clear message
      val arity = intercept[Exception](s2.sql("SELECT graft_topk_idx(array(1.0d))").collect())
      assert(arity.getMessage.contains("takes 2 arguments"), arity.getMessage)
      val nonLit = intercept[Exception](
        s2.sql("SELECT graft_hyperplanes(array(1.0d), 5, cast(rand()*3 as int))").collect())
      assert(nonLit.getMessage.contains("must be a literal"), nonLit.getMessage)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("LogSync.tableAsOf: snapshot excludes files registered later") {
    val root = Files.createTempDirectory("graft_tt").toString
    val ev = graft.sources.Tables.events(spark, sf).limit(100)
      .select(col("ts").as("timestamp"), col("event_type").as("service_name"),
              col("props").as("body"))
    graft.sources.LogWriter.write(ev, root)
    graft.sources.LogSync.sync(spark, root)
    val cut = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(1100)
    graft.sources.LogWriter.write(ev, root)
    graft.sources.LogSync.sync(spark, root)
    assert(graft.sources.LogSync.table(spark, root).count() == 200)
    assert(graft.sources.LogSync.tableAsOf(spark, root, cut).count() == 100,
      "snapshot must only see the first batch")
  }

  test("ALTER LAKE from plain SQL: rename + promote land, guards apply, reads resolve") {
    val prior = spark
    assert(prior != null)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val root = Files.createTempDirectory("graft_sqlalter").toString
      graft.sources.Tables.events(s2, sf).limit(60)
        .select(col("ts").as("timestamp"),
          col("event_type").as("severity_text"),
          (col("event_id") % 100).cast("int").as("severity_number"),
          col("props").as("body"))
        .coalesce(2).write.mode("append").parquet(root)
      graft.sources.LogSync.sync(s2, root)
      // the SQL dialect drives the SAME LakeEvolve entry points the
      // Scala API uses — one guard set, one commit protocol
      s2.sql(s"ALTER LAKE '$root' RENAME COLUMN severity_text TO severity")
      s2.sql(s"ALTER LAKE '$root' ALTER COLUMN severity_number TYPE BIGINT")
      graft.sources.LogSync.table(s2, root).createOrReplaceTempView("sql_lake")
      val rows = s2.sql(
        "SELECT severity, count(*) AS n FROM sql_lake GROUP BY severity").collect()
      assert(rows.map(_.getLong(1)).sum == 60)
      assert(graft.sources.LogSync.table(s2, root)
        .schema("severity_number").dataType ==
          org.apache.spark.sql.types.LongType)
      // the guards flow through: a stat-axis drop refuses from SQL too
      val e = intercept[Exception](
        s2.sql(s"ALTER LAKE '$root' DROP COLUMN timestamp"))
      assert(e.getMessage.contains("stat axis"), e.getMessage)
      // everything non-graft still parses through the delegate
      assert(s2.sql("SELECT 1 + 1 AS x").collect()(0).getInt(0) == 2)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("MAINTAIN LAKE from plain SQL: compact, rewrite manifests, vacuum — stats as rows") {
    val prior = spark
    assert(prior != null)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val root = Files.createTempDirectory("graft_sqlmaint").toString
      def write(n: Int, skip: Int): Unit = graft.sources.Tables.events(s2, sf)
        .orderBy(col("event_id")).offset(skip).limit(n)
        .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
          col("props").as("body"))
        .repartition(3).write.mode("append").parquet(root)
      // registration itself drives through SQL — the full lifecycle
      // (sync -> maintain -> export) without a line of Scala
      write(40, 0)
      val n1 = s2.sql(s"MAINTAIN LAKE '$root' SYNC").collect()
      assert(n1.head.getString(0) == "files_registered" && n1.head.getLong(1) > 0)
      write(40, 40)
      assert(s2.sql(s"MAINTAIN LAKE '$root' SYNC").collect().head.getLong(1) > 0)
      // registry rewrite: part counts surface as (stat, value) rows
      val rw = s2.sql(s"MAINTAIN LAKE '$root' REWRITE MANIFESTS").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rw("data_parts_before") > rw("data_parts_after"),
        s"SQL rewrite must consolidate: $rw")
      // small-file compaction through SQL — same op as LogCompact.compact
      val c = s2.sql(s"MAINTAIN LAKE '$root' COMPACT").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(c("files_before") > c("files_after"), s"SQL compact must consolidate: $c")
      assert(graft.sources.LogSync.table(s2, root).count() == 80)
      // vacuum runs (default grace keeps the fresh tombstones' files —
      // 0 removed is the CORRECT answer seconds after a compaction)
      val v = s2.sql(s"MAINTAIN LAKE '$root' VACUUM").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(v.get("files_removed").exists(_ >= 0L))
      assert(graft.sources.LogSync.table(s2, root).count() == 80)
      // the Iceberg export from SQL returns the committed metadata
      // location, and the exported chain serves the same table
      val loc = s2.sql(s"MAINTAIN LAKE '$root' EXPORT ICEBERG").collect()
        .head.getString(0)
      assert(loc.contains("metadata"), loc)
      assert(graft.sources.IcebergExport.readTable(s2, root).count() == 80)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("row-level DML from plain SQL: DELETE/MERGE/UPSERT + MOR-delete maintenance verbs") {
    val prior = spark
    assert(prior != null)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val root = Files.createTempDirectory("graft_sqldml").toString
      graft.sources.Tables.events(s2, sf).orderBy(col("event_id")).limit(60)
        .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
          col("event_id"), col("props").as("body"))
        .coalesce(2).write.mode("append").parquet(root)
      s2.sql(s"MAINTAIN LAKE '$root' SYNC").collect()
      def stats(rows: Array[org.apache.spark.sql.Row]): Map[String, Long] =
        rows.map(r => r.getString(0) -> r.getLong(1)).toMap
      // copy-on-write DELETE: the WHERE text goes through Spark's own
      // expression parser, so the full SQL predicate language applies
      val del = stats(s2.sql(
        s"DELETE FROM LAKE '$root' WHERE event_id >= 50 AND event_id % 2 = 0").collect())
      assert(del("rows_changed") == 5 && del("files_removed") >= 1, del.toString)
      assert(graft.sources.LogSync.table(s2, root).count() == 55)
      // MOR DELETE: no data file rewritten, a position-delete commit
      val mor = stats(s2.sql(
        s"DELETE FROM LAKE '$root' MOR WHERE event_id = 7").collect())
      assert(mor("files_removed") == 0 && mor("rows_changed") == 1, mor.toString)
      assert(graft.sources.LogSync.table(s2, root).count() == 54)
      // equality-delete UPSERT (the CDC shape) reading its update rows
      // from any SQL query over a registered view
      graft.sources.LogSync.table(s2, root).createOrReplaceTempView("sqldml_lake")
      val up = stats(s2.sql(
        s"UPSERT INTO LAKE '$root' BY (event_id) USING " +
          "SELECT timestamp, service_name, event_id, 'restated' AS body " +
          "FROM sqldml_lake WHERE event_id = 5").collect())
      assert(up("rows_changed") == 1, up.toString)
      val t = graft.sources.LogSync.table(s2, root)
      assert(t.count() == 54)
      assert(t.filter(col("event_id") === 5L).select("body").head.getString(0) == "restated")
      // CoW MERGE with a novel key: one replacement + one insert
      val mg = stats(s2.sql(
        s"MERGE INTO LAKE '$root' BY (event_id) USING " +
          "SELECT timestamp, service_name, event_id + 1000 AS event_id, 'fresh' AS body " +
          "FROM sqldml_lake WHERE event_id = 11").collect())
      assert(mg("rows_changed") == 0 && mg("files_added") >= 1, mg.toString)
      assert(graft.sources.LogSync.table(s2, root).count() == 55)
      // the MOR-delete maintenance verbs: convert the upsert's equality
      // delete to positions, then the registry lifecycle stats surface
      val conv = stats(s2.sql(s"MAINTAIN LAKE '$root' CONVERT DELETES").collect())
      assert(conv("eq_files_retired") >= 1, conv.toString)
      val cd = stats(s2.sql(s"MAINTAIN LAKE '$root' COMPACT DELETES").collect())
      assert(cd.contains("delete_files_before"), cd.toString)
      val vd = stats(s2.sql(s"MAINTAIN LAKE '$root' VACUUM DELETES").collect())
      assert(vd("delete_files_tombstoned") >= 0L)
      // reads unchanged through the whole maintenance pass
      val t2 = graft.sources.LogSync.table(s2, root)
      assert(t2.count() == 55)
      assert(t2.filter(col("event_id") === 5L).select("body").head.getString(0) == "restated")
      assert(t2.filter(col("event_id") === 7L).count() == 0)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("lake_sql_dml: the SQL-lifecycle fixture equals the events-derived truth; MOR deletes folded") {
    val got = graft.operators.LakeAnalytics.sqlDmlSeverity(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = graft.sources.Tables.events(spark, sf)
      .select(concat(lit("svc-"), col("user_id") % 10).as("s"),
        col("event_type").as("t"))
      .filter(!(col("s") === "svc-3" && col("t") === "view") &&
        !(col("s") === "svc-7" && col("t") === "signup") &&
        !(col("s") === "svc-5" && col("t") === "click"))
      .groupBy("s", "t").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
    // the two MOR commits were folded by the SQL COMPACT DELETES verb:
    // one active position-delete file remains, carrying both commits'
    // rows under op="fold"
    val root = graft.operators.LakeAnalytics.sqlDmlRoot(spark, sf)
    val pos = graft.sources.LogSync.deleteEntries(spark, root).filterNot(_.isEq)
    assert(pos.length == 1 && pos.head.op == "fold",
      s"expected one folded position-delete file, got $pos")
  }

  test("CDC from plain SQL: poll-advance-poll over graft_watermark/changes/upserts/deletes") {
    val prior = spark
    assert(prior != null)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val root = Files.createTempDirectory("graft_sqlcdc").toString
      def write(n: Int, skip: Int): Unit = graft.sources.Tables.events(s2, sf)
        .orderBy(col("event_id")).offset(skip).limit(n)
        .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
          col("event_id"), col("props").as("body"))
        .coalesce(1).write.mode("append").parquet(root)
      // the consumer's mark store: one UTC-formatted literal per poll
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
        .withZone(java.time.ZoneOffset.UTC)
      def pollMark(): String = fmt.format(
        s2.sql(s"SELECT append_hwm FROM graft_watermark('$root')")
          .head.getTimestamp(0).toInstant)
      write(40, 0)
      s2.sql(s"MAINTAIN LAKE '$root' SYNC").collect()
      val mark1 = pollMark()
      // ...new data arrives...
      write(20, 40)
      s2.sql(s"MAINTAIN LAKE '$root' SYNC").collect()
      // poll 2: exactly the 20 fresh appends since the stored mark
      val changed = s2.sql(
        s"SELECT * FROM graft_changes('$root', TIMESTAMP '$mark1')")
      assert(changed.count() == 20)
      assert(changed.agg(min(col("event_id"))).head.getLong(0) == 40L)
      val mark2 = pollMark()
      // an upsert's new values surface on the upsert stream, not the
      // append stream; a genuine retraction on the delete stream
      val cols = graft.sources.LogSync.table(s2, root).columns
      graft.sources.LakeDml.upsertEq(s2, root,
        graft.sources.LogSync.table(s2, root)
          .filter(col("event_id") === 3L).withColumn("body", lit("restated"))
          .select(cols.map(col): _*), Seq("event_id"))
      import s2.implicits._
      graft.sources.LakeDml.deleteEq(s2, root, Seq(7L).toDF("event_id"))
      assert(s2.sql(
        s"SELECT * FROM graft_changes('$root', TIMESTAMP '$mark2')").count() == 0,
        "upserted/deleted rows must not surface as appends")
      val ups = s2.sql(
        s"SELECT * FROM graft_upserts('$root', TIMESTAMP '$mark2')").collect()
      assert(ups.length == 1 &&
        ups.head.getAs[String]("body") == "restated")
      val dels = s2.sql(
        s"SELECT event_id, __delete_kind FROM graft_deletes('$root', TIMESTAMP '$mark2')")
        .collect()
      assert(dels.length == 1 && dels.head.getLong(0) == 7L &&
        dels.head.getString(1) == "eq")
      // poll 3 from the ADVANCED mark: quiescent lake, empty streams
      val mark3 = pollMark()
      assert(s2.sql(
        s"SELECT * FROM graft_changes('$root', TIMESTAMP '$mark3')").count() == 0)
      assert(s2.sql(
        s"SELECT * FROM graft_upserts('$root', TIMESTAMP '$mark3')").count() == 0)
      // guards: wrong arity and genuinely non-foldable marks refuse
      // with a clear message (the mark parameterizes manifest pruning
      // at analysis time; current_timestamp() is constant-folded by
      // the analyzer before the builder sees it, so it works as a mark)
      val arity = intercept[Exception](s2.sql(
        s"SELECT * FROM graft_changes('$root')").collect())
      assert(arity.getMessage.contains("2 arguments"), arity.getMessage)
      val e = intercept[Exception](s2.sql(
        s"SELECT * FROM graft_changes('$root', cast(rand() as timestamp))").collect())
      assert(e.getMessage.contains("literal"), e.getMessage)
      // a NULL mark must refuse loudly, not silently read since epoch
      val n = intercept[Exception](s2.sql(
        s"SELECT * FROM graft_changes('$root', CAST(NULL AS TIMESTAMP))").collect())
      assert(n.getMessage.contains("NULL"), n.getMessage)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("SQL lifecycle symmetry: a SQL-only session can SELECT the state it mutated (graft_lake / graft_lake_at)") {
    val prior = spark
    assert(prior != null)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val root = Files.createTempDirectory("graft_sqlread").toString
      graft.sources.Tables.events(s2, sf).orderBy(col("event_id")).limit(40)
        .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
          col("event_id"), col("event_type").as("severity_text"),
          col("props").as("body"))
        .coalesce(1).write.mode("append").parquet(root)
      // the whole lifecycle from spark.sql: register, snapshot-read,
      // mutate (CoW + MOR), maintain — then read the RESULT, which no
      // incremental TVF can surface (rewrites are excluded there)
      s2.sql(s"MAINTAIN LAKE '$root' SYNC").collect()
      assert(s2.sql(s"SELECT * FROM graft_lake('$root')").count() == 40)
      val preDml = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.now())
      Thread.sleep(1100) // travel instants resolve at registration granularity
      s2.sql(s"DELETE FROM LAKE '$root' WHERE event_id < 5").collect()
      s2.sql(s"DELETE FROM LAKE '$root' MOR WHERE event_id >= 35").collect()
      s2.sql(s"MAINTAIN LAKE '$root' COMPACT DELETES").collect()
      // the current state: 40 - 5 CoW-deleted - 5 MOR-deleted
      val now = s2.sql(
        s"""SELECT severity_text, count(1) AS n FROM graft_lake('$root')
           |GROUP BY severity_text ORDER BY severity_text""".stripMargin)
      assert(now.agg(sum(col("n"))).head.getLong(0) == 30)
      // ...and it agrees row-for-row with the Scala API's read
      val api = graft.sources.LogSync.table(s2, root)
        .groupBy(col("severity_text")).agg(count(lit(1)).as("n"))
        .orderBy(col("severity_text"))
      assert(now.collect().toSeq == api.collect().toSeq,
        "graft_lake must expand to exactly the Scala read's plan")
      // time travel from SQL: the pre-DML snapshot still holds all 40
      assert(s2.sql(
        s"SELECT * FROM graft_lake_at('$root', TIMESTAMP '$preDml')")
        .count() == 40)
      // guards: arity and non-literal roots refuse with clear messages
      val arity = intercept[Exception](s2.sql(
        s"SELECT * FROM graft_lake('$root', TIMESTAMP '$preDml')").collect())
      assert(arity.getMessage.contains("1 argument"), arity.getMessage)
      val nonLit = intercept[Exception](s2.sql(
        "SELECT * FROM graft_lake(cast(rand() as string))").collect())
      assert(nonLit.getMessage.contains("literal"), nonLit.getMessage)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("DSv2 facade: spark.read.format(\"graft\") delegates to the library's read plan; pruning and deletes intact") {
    val prior = spark
    assert(prior != null)
    // the fixture lake is session-independent (on-disk root); build it
    // with the shared session first so s2 only reads
    val root = graft.operators.LakeAnalytics.lakeRoot(spark, sf)
    val dmlRoot = graft.operators.LakeAnalytics.dmlRoot(spark, sf)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // third-party shape: no graft import needed beyond the format name
      val df = s2.read.format("graft").load(root)
      assert(df.count() == graft.sources.LogSync.table(s2, root).count())
      // the spliced plan IS the library plan: partition predicates
      // reach the scan through the facade
      val q = df.filter(col("service_name") === "svc-3" && col("year") === 2024)
        .groupBy(col("severity_text")).count()
      val plan = q.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val pf = plan.linesIterator.find(_.trim.startsWith("PartitionFilters:"))
        .getOrElse(fail(s"partition filters never reached the scan:\n$plan"))
      assert(pf.contains("service_name") && pf.contains("year"), pf)
      // DML semantics ride along (a CoW-deleted lake reads post-delete)
      assert(s2.read.format("graft").load(dmlRoot)
        .filter(col("service_name") === "svc-3" && col("severity_text") === "view")
        .count() == 0, "the facade must read through the DML manifest")
      // time travel via option — and DSv2 options are case-insensitive,
      // so a differently-cased key must reach the same snapshot (a
      // dropped key here would silently read the CURRENT state)
      val hwm = graft.sources.LogSync.highWaterMark(s2, root).get
      val hwmLit = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
        .withZone(java.time.ZoneId.of(
          s2.sessionState.conf.sessionLocalTimeZone))
        .format(hwm.toInstant)
      assert(s2.read.format("graft").option("asOf", hwmLit).load(root)
        .count() == df.count())
      assert(s2.read.format("graft").option("asof", hwmLit).load(root)
        .count() == df.count())
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
    // honest boundary: an extension-less session resolves the schema
    // but refuses the scan loudly with the fix named
    val bare = spark.read.format("graft").load(root)
    assert(bare.schema.fieldNames.contains("service_name"))
    val e = intercept[Exception](bare.count())
    assert(e.getMessage != null && e.getMessage.contains("GraftExtensions"),
      s"expected the no-extensions refusal, got: ${e.getMessage}")
  }

  test("facade write: df.write.format(\"graft\") writes the layout AND registers; save modes honored") {
    // the V1 sink fallback needs no extensions — the shared session is
    // deliberately extension-less here
    val root = Files.createTempDirectory("graft_sinkfacade").toString + "/lake"
    def batch(n: Int, skip: Int) = graft.sources.Tables.events(spark, sf)
      .orderBy(col("event_id")).offset(skip).limit(n)
      .select(col("ts").as("timestamp"),
        concat(lit("svc-"), col("user_id") % 3).as("service_name"),
        col("event_type").as("severity_text"), col("props").as("body"))
    batch(40, 0).write.format("graft").option("layout", "daily")
      .mode("append").save(root)
    // one call = write + register: the lake reads back immediately
    assert(graft.sources.LogSync.table(spark, root).count() == 40)
    // ...with the partitioned layout on disk (daily: no hour dirs)
    val part = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("service_name="))
    assert(part.nonEmpty, "the sink must write the partitioned layout")
    // writer-default ErrorIfExists refuses a registered root loudly
    val e = intercept[Exception](
      batch(10, 40).write.format("graft").save(root))
    assert(e.getMessage.contains("already a registered lake"), e.getMessage)
    // Ignore no-ops; append accumulates; Overwrite refuses with the fix
    batch(10, 40).write.format("graft").mode("ignore").save(root)
    assert(graft.sources.LogSync.table(spark, root).count() == 40)
    // Ignore's no-op contract holds even for a frame the sink could
    // never write — the schema require binds only the writing arms
    spark.range(3).toDF("x").write.format("graft").mode("ignore").save(root)
    assert(graft.sources.LogSync.table(spark, root).count() == 40)
    batch(10, 40).write.format("graft").option("layout", "daily")
      .mode("append").save(root)
    assert(graft.sources.LogSync.table(spark, root).count() == 50)
    val o = intercept[Exception](
      batch(5, 0).write.format("graft").mode("overwrite").save(root))
    assert(o.getMessage.contains("append-only lake"), o.getMessage)
    // the schema contract refuses loudly, naming the missing columns
    val bad = intercept[Exception](spark.range(3).toDF("x")
      .write.format("graft").mode("append").save(root + "2"))
    assert(bad.getMessage.contains("service_name"), bad.getMessage)
  }

  test("facade write: two concurrent ErrorIfExists writers — exactly one wins, the loser errors, the lake is the winner's batch") {
    import scala.concurrent._
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // the check-then-write race the sink lease closes: both writers
    // observe "no manifest" before either lands; unleased, BOTH would
    // write and the mode contract is violated silently
    val root = Files.createTempDirectory("graft_sinkrace").toString + "/lake"
    def batch(n: Int, skip: Int) = graft.sources.Tables.events(spark, sf)
      .orderBy(col("event_id")).offset(skip).limit(n)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"), col("props").as("body"))
    val gate = new java.util.concurrent.CountDownLatch(1)
    def attempt(n: Int, skip: Int): Future[Option[String]] = Future {
      gate.await()
      try { batch(n, skip).write.format("graft").mode("errorifexists").save(root); None }
      catch { case e: Exception => Some(String.valueOf(e.getMessage)) }
    }
    val (a, b) = (attempt(17, 0), attempt(23, 17))
    gate.countDown()
    val results = Seq(Await.result(a, 300.seconds), Await.result(b, 300.seconds))
    val failures = results.flatten
    assert(failures.size == 1,
      s"exactly one ErrorIfExists writer must lose, got ${failures.size}: $failures")
    assert(failures.head.contains("already a registered lake"), failures.head)
    // the lake equals the WINNER's batch — 17 or 23 rows, never 40
    val n = graft.sources.LogSync.table(spark, root).count()
    assert(n == 17 || n == 23, s"the lake must hold exactly one batch, got $n")
    // two concurrent IGNORE writers on a fresh root: one writes, the
    // other no-ops against the winner's manifest — never a double batch
    val root2 = Files.createTempDirectory("graft_sinkrace2").toString + "/lake"
    val gate2 = new java.util.concurrent.CountDownLatch(1)
    def ignoreAttempt(n: Int, skip: Int) = Future {
      gate2.await()
      batch(n, skip).write.format("graft").mode("ignore").save(root2)
    }
    val (c, d) = (ignoreAttempt(11, 0), ignoreAttempt(13, 11))
    gate2.countDown()
    Await.result(c, 300.seconds); Await.result(d, 300.seconds)
    val n2 = graft.sources.LogSync.table(spark, root2).count()
    assert(n2 == 11 || n2 == 13, s"Ignore raced to a double batch: $n2")
  }

  test("graft_lake_lookup: the SQL needle routes through the bloom sidecar (kept<total) and equals graft_lake WHERE IN row-for-row") {
    GraftTableFunctions.ensureRegistered(spark)
    val root = graft.operators.LakeAnalytics.lakeRoot(spark, sf)
    // two spans from different files, one absent value (the absent one
    // must prune hardest and change nothing in the result)
    val spans = graft.sources.LogSync.table(spark, root)
      .select("span_id").orderBy("span_id").limit(2)
      .collect().map(_.getString(0)).toSeq :+ "deadbeefdeadbeef"
    val inList = spans.map(s => s"'$s'").mkString(", ")
    val viaLookup = spark.sql(
      s"""SELECT span_id, trace_id, body FROM graft_lake_lookup('$root', 'span_id', $inList)
         |ORDER BY span_id""".stripMargin).collect().toSeq
    val viaScan = spark.sql(
      s"""SELECT span_id, trace_id, body FROM graft_lake('$root')
         |WHERE span_id IN ($inList) ORDER BY span_id""".stripMargin).collect().toSeq
    assert(viaLookup.nonEmpty && viaLookup == viaScan,
      s"lookup(${viaLookup.size}) != scan(${viaScan.size})")
    // the sidecar the TVF built prunes: the lookup scans strictly fewer
    // files than the lake registers (the shared keep-predicate
    // observable — the same plan the TVF expanded)
    val (kept, total) = graft.sources.LakeIndex.pruneCounts(
      spark, root, "span_id", spans)
    assert(kept < total && kept >= 1, s"no bloom pruning: kept=$kept total=$total")
    // literal-argument guard, same contract as every graft TVF
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_lake_lookup('$root', 'span_id')"))
    assert(e.getMessage.contains("at least 3"), e.getMessage)
  }

  test("streaming facade: readStream.format(\"graft\") consumes appends exactly-once across restarts; rewrites invisible") {
    val base = Files.createTempDirectory("graft_streamfacade").toString
    val root = s"$base/lake"
    val ckpt = s"$base/ckpt"
    def batch(n: Int, skip: Int) = graft.sources.Tables.events(spark, sf)
      .orderBy(col("event_id")).offset(skip).limit(n)
      .select(col("ts").as("timestamp"),
        concat(lit("svc-"), col("user_id") % 3).as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit("e"), col("event_id")).as("span_id"),
        col("props").as("body"))
    batch(30, 0).coalesce(2).write.mode("append").parquet(root)
    graft.sources.LogSync.sync(spark, root)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    // each run is a FRESH query instance on the SAME checkpoint — i.e.
    // a restart; offsets live in the checkpoint's graft_marks store
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").load(root)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen ++= df.select("span_id").collect().map(_.getString(0))
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(seen.size == 30 && seen.toSet.size == 30,
      s"first run must emit exactly the first batch: ${seen.size}")
    // append a second batch AND compact: the rewrite restates batch-1
    // rows in fresh files — a registered-file diff without the
    // op="rewrite" rule would re-emit all of them
    batch(25, 30).coalesce(2).write.mode("append").parquet(root)
    graft.sources.LogSync.sync(spark, root)
    graft.sources.LogCompact.compact(spark, root)
    runOnce()
    assert(seen.size == 55 && seen.toSet.size == 55,
      s"restart must emit ONLY the new batch (rewrites invisible): ${seen.size}")
    // idle restart: nothing new, nothing re-emitted
    runOnce()
    assert(seen.size == 55, s"an idle restart re-emitted rows: ${seen.size}")
    // the stream refuses an unregistered root LOUDLY at load
    val e = intercept[Exception](
      spark.readStream.format("graft").load(s"$base/absent"))
    assert(e.getMessage.contains("sync"), e.getMessage)
  }

  test("streaming facade sink: writeStream.format(\"graft\") registers per batch, exactly-once across restarts; lake-to-lake round trip") {
    val base = Files.createTempDirectory("graft_sinkstream").toString
    val src = s"$base/src"
    val root = s"$base/lake"
    val ckpt = s"$base/ckpt"
    def batch(n: Int, skip: Int) = graft.sources.Tables.events(spark, sf)
      .orderBy(col("event_id")).offset(skip).limit(n)
      .select(col("ts").as("timestamp"),
        concat(lit("svc-"), col("user_id") % 3).as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit("e"), col("event_id")).as("span_id"),
        col("props").as("body"))
    batch(30, 0).coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    // each run is a fresh query on the SAME checkpoint — a restart;
    // replay idempotence rides the _batches markers
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt).option("layout", "daily")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(root)
      q.awaitTermination()
    }
    runOnce()
    assert(graft.sources.LogSync.table(spark, root).count() == 30,
      "first run must write AND register the first batch")
    // a second source batch; the restart drains ONLY it (no re-append)
    batch(25, 30).coalesce(1).write.mode("append").parquet(src)
    runOnce()
    assert(graft.sources.LogSync.table(spark, root)
      .select("span_id").distinct().count() == 55,
      "restart must land only the new batch, no duplicates")
    // idle restart: nothing new, nothing re-appended
    runOnce()
    assert(graft.sources.LogSync.table(spark, root).count() == 55)
    // the NO-IMPORT round trip: graft source → graft sink, lake to
    // lake — asBatch over an asStreaming'd plan, both facades at once
    val q2 = spark.readStream.format("graft").load(root)
      .writeStream.format("graft")
      .option("checkpointLocation", s"$base/ckpt2").option("layout", "daily")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(s"$base/lake2")
    q2.awaitTermination()
    assert(graft.sources.LogSync.table(spark, s"$base/lake2").count() == 55,
      "lake-to-lake streaming copy must land every row")
    // aggregated streams are refused loudly: a lake is append-only
    val agg = spark.readStream.schema(schema).parquet(src)
      .groupBy("service_name").count()
    val e = intercept[Exception](
      agg.writeStream.format("graft").outputMode("complete")
        .option("checkpointLocation", s"$base/ckpt3")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(s"$base/lake3"))
    assert(e.getMessage.contains("append-only"), e.getMessage)
  }

  test("streaming facade: offsets are manifest positions — replay is deterministic past newer syncs, chunking bounds batches") {
    val base = Files.createTempDirectory("graft_streamreplay").toString
    val root = s"$base/lake"
    val meta = s"$base/meta"
    def batch(n: Int, skip: Int) = graft.sources.Tables.events(spark, sf)
      .orderBy(col("event_id")).offset(skip).limit(n)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit("e"), col("event_id")).as("span_id"),
        col("props").as("body"))
    // getBatch returns a STREAMING-flagged LogicalRDD (the engine
    // requires the flag and refuses direct actions on it); the spec
    // unwraps it back to a batch frame over the same RDD
    def ids(df: org.apache.spark.sql.DataFrame): Set[String] = {
      val l = df.queryExecution.logical
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
      val plan = org.apache.spark.sql.execution.LogicalRDD(l.output, l.rdd)(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
      org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark, plan)
        .select("span_id").collect().map(_.getString(0)).toSet
    }
    batch(12, 0).coalesce(1).write.mode("append").parquet(root)
    graft.sources.LogSync.sync(spark, root)
    val first = graft.sources.LogSync.table(spark, root)
      .select("span_id").collect().map(_.getString(0)).toSet
    val s1 = new graft.sources.GraftLakeSource(spark, root, meta, 10000)
    val off1 = s1.getOffset.get
    // CRASH here: s1 is dropped, and the lake moves on — the offered
    // offset must keep naming EXACTLY the first round's rows
    batch(9, 12).coalesce(1).write.mode("append").parquet(root)
    graft.sources.LogSync.sync(spark, root)
    val s2 = new graft.sources.GraftLakeSource(spark, root, meta, 10000)
    assert(ids(s2.getBatch(None, off1)) == first,
      "the replayed window must exclude the newer sync")
    // replay is idempotent by construction: the window's manifest rows
    // are immutable, so any number of replays return the same batch
    assert(ids(s2.getBatch(None, off1)) == first)
    // the remainder surfaces on the next offset, exactly once
    val off2 = s2.getOffset.get
    assert(off2.json.toLong > off1.json.toLong)
    assert(ids(s2.getBatch(Some(off1), off2)) ==
      graft.sources.LogSync.table(spark, root)
        .select("span_id").collect().map(_.getString(0)).toSet -- first)
    // drained: the cursor re-offers itself (never None — a pre-WAL
    // crash may leave the engine behind it)
    assert(s2.getOffset.map(_.json) == Some(off2.json))
    // chunking: three 1-file rounds drain one offset per trigger under
    // maxFilesPerTrigger = 1, whole rounds at a time
    val root2 = s"$base/lake2"
    (0 until 3).foreach { i =>
      batch(4, 21 + i * 4).coalesce(1).write.mode("append").parquet(root2)
      assert(graft.sources.LogSync.sync(spark, root2) == 1)
    }
    val s3 = new graft.sources.GraftLakeSource(spark, root2, s"$base/meta2", 1)
    val offA = s3.getOffset.get
    val offB = s3.getOffset.get
    val offC = s3.getOffset.get
    assert(offA.json.toLong < offB.json.toLong && offB.json.toLong < offC.json.toLong)
    assert(ids(s3.getBatch(None, offA)).size == 4)
    assert(ids(s3.getBatch(Some(offA), offB)).size == 4)
    assert(ids(s3.getBatch(Some(offB), offC)).size == 4)
    assert(ids(s3.getBatch(None, offC)).size == 12)
  }

  test("graft_lake prunes partitions through the TVF (and ensureRegistered serves extension-less sessions)") {
    // the shared suite session was built WITHOUT GraftExtensions — the
    // programmatic registration path (what Verify/Bench and notebook
    // sessions use) must provide the same TVFs
    graft.GraftTableFunctions.ensureRegistered(spark)
    val root = graft.operators.LakeAnalytics.lakeRoot(spark, sf)
    val q = spark.sql(
      s"""SELECT severity_text, count(1) AS n FROM graft_lake('$root')
         |WHERE service_name = 'svc-3' AND year = 2024 AND month = 1
         |GROUP BY severity_text ORDER BY severity_text""".stripMargin)
    // the partition predicates must reach the SCAN through the TVF
    // expansion — a residual Filter above it would read the whole lake
    val plan = formattedPlan(q)
    val pf = plan.linesIterator.find(_.trim.startsWith("PartitionFilters:"))
      .getOrElse(fail(s"partition filters never reached the scan:\n$plan"))
    assert(pf.contains("service_name") && pf.contains("year"),
      s"service_name/year must prune the scan through the TVF, got: $pf")
    assert(q.collect().nonEmpty)
  }
}
