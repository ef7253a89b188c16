package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{LakeFollow, MetricFollow, TraceFollow}

/** The trace/metric members of the follow family: streamed service-map
  * edges and streamed reset-corrected increase over the signal lakes
  * the OTLP edge writes — each spec drives the REAL intake (HTTP POST
  * → flush → lake files) and holds the streams to the follow family's
  * twin-equality bar: the union of all increments' outputs equals the
  * one-shot batch operator over the full lake.
  */
class FollowSignalsSpec extends SparkSpec {

  private def post(client: java.net.http.HttpClient, port: Int,
                   path: String, body: String): Int =
    client.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()

  private def metricEnv(svc: String, name: String,
                        points: Seq[(Long, Long)], baseNs: Long): String = {
    val dps = points.map { case (s, v) =>
      s"""{"timeUnixNano":"${baseNs + s * 1000000000L}","asInt":"$v","attributes":[]}"""
    }.mkString(",")
    s"""{"resourceMetrics":[{"resource":{"attributes":[
       |{"key":"service.name","value":{"stringValue":"$svc"}}]},
       |"scopeMetrics":[{"scope":{"name":"g","version":"1"},"metrics":[
       |{"name":"$name","unit":"{req}","sum":{"dataPoints":[$dps],
       |"aggregationTemporality":2,"isMonotonic":true}}]}]}]}"""
      .stripMargin.replace("\n", "")
  }

  private def spanEnv(sid: String, pid: String, svc: String,
                      startUs: Long, durUs: Long): String =
    spark.range(1).select(graft.sources.OtlpTraces.toOtlpJson(
      lit(startUs), lit(startUs + durUs), lit(svc),
      lit("11111111111111111111111111111111"), lit(sid),
      if (pid == null) lit(null).cast("string") else lit(pid),
      lit("op"), lit(2), lit(0)).as("env")).head.getString(0)

  test("MetricFollow: summed increment deltas equal batch increase, reset across the poll boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft_mfollow").toString
    val marks = java.nio.file.Files.createTempDirectory("graft_mfollow_marks").toString
    val server = graft.serving.OtlpHttp.start(spark, root)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val baseNs = 1705060800000000000L // 2024-01-12T12:00:00Z
      val lake = s"$root/_metrics"
      val emitted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

      def drain(): Unit = LakeFollow.poll(spark, lake, marks).foreach { inc =>
        val out = MetricFollow.incrementIncrease(spark, lake, marks, inc, "requests")
        // pre-commit crash replay: the same increment emits identically
        val replay = MetricFollow.incrementIncrease(spark, lake, marks, inc, "requests")
        assert(out.collect().toSeq == replay.collect().toSeq,
          "replay before commit must emit the identical deltas")
        emitted += out
        LakeFollow.commit(spark, lake, marks, inc)
      }

      // poll 1: two samples in hour 12 (10 → 25)
      assert(post(client, server.port, "/v1/metrics",
        metricEnv("svc-c", "requests", Seq((0L, 10L), (600L, 25L)), baseNs)) == 200)
      server.flush(); drain()
      // poll 2: 40 still in hour 12, then a RESET (40 → 5) landing in
      // hour 13 ACROSS the poll boundary, then 9
      assert(post(client, server.port, "/v1/metrics",
        metricEnv("svc-c", "requests", Seq((1200L, 40L), (3700L, 5L), (3900L, 9L)), baseNs)) == 200)
      server.flush(); drain()

      assert(emitted.size == 2, "two flushes, two increments")
      val streamed = emitted.reduce(_ unionByName _)
        .groupBy(col("service_name"), col("metric_name"), col("bucket"))
        .agg(sum(col("increase")).as("increase"))
      val batch = graft.operators.MetricAnalytics
        .increaseFromLake(spark, lake, "requests")
        .select(col("service_name"), col("metric_name"), col("bucket"), col("increase"))
      assert(streamed.collect().toSet == batch.collect().toSet,
        "stream-of-deltas and batch disagree")
      // the boundary seam specifically: poll 2 lagged 40 against the
      // CARRIED 25, not from zero
      val h12 = emitted(1).filter(col("bucket") === lit("2024-01-12 12:00:00").cast("timestamp"))
        .collect()
      assert(h12.length == 1 && h12.head.getAs[Double]("increase") == 15.0,
        s"second poll must contribute 40-25=15 to hour 12: ${h12.toSeq}")
    } finally server.stop()
  }

  test("MetricFollow: out-of-order samples are rejected, not folded in") {
    val root = java.nio.file.Files.createTempDirectory("graft_mfollow_ooo").toString
    val marks = java.nio.file.Files.createTempDirectory("graft_mfollow_ooo_marks").toString
    val server = graft.serving.OtlpHttp.start(spark, root)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val baseNs = 1705060800000000000L
      val lake = s"$root/_metrics"
      assert(post(client, server.port, "/v1/metrics",
        metricEnv("svc-o", "requests", Seq((0L, 10L), (600L, 25L)), baseNs)) == 200)
      server.flush()
      val i1 = LakeFollow.poll(spark, lake, marks).get
      MetricFollow.incrementIncrease(spark, lake, marks, i1, "requests").collect()
      LakeFollow.commit(spark, lake, marks, i1)
      // a sample BEHIND the carry (ts 300 < carried 600) must be
      // refused by the Prometheus rule and surfaced in __rejected
      assert(post(client, server.port, "/v1/metrics",
        metricEnv("svc-o", "requests", Seq((300L, 17L), (1200L, 31L)), baseNs)) == 200)
      server.flush()
      val i2 = LakeFollow.poll(spark, lake, marks).get
      val out = MetricFollow.incrementIncrease(spark, lake, marks, i2, "requests").collect()
      LakeFollow.commit(spark, lake, marks, i2)
      assert(out.forall(_.getAs[Long]("__rejected") == 1L),
        s"the late sample must be counted rejected: ${out.toSeq}")
      assert(out.map(_.getAs[Double]("increase")).sum == 6.0,
        s"only 31-25=6 may land; the late 17 must not contribute: ${out.toSeq}")
      // an ALL-late increment emits no increase rows — the rejection
      // count must still surface, on one all-null sentinel row
      assert(post(client, server.port, "/v1/metrics",
        metricEnv("svc-o", "requests", Seq((450L, 19L), (900L, 28L)), baseNs)) == 200)
      server.flush()
      val i3 = LakeFollow.poll(spark, lake, marks).get
      val out3 = MetricFollow.incrementIncrease(spark, lake, marks, i3, "requests")
        .collect()
      LakeFollow.commit(spark, lake, marks, i3)
      assert(out3.length == 1 && out3.head.isNullAt(0) &&
        out3.head.getAs[Double]("increase") == 0.0 &&
        out3.head.getAs[Long]("__rejected") == 2L,
        s"all-late increment must surface __rejected on a sentinel: ${out3.toSeq}")
    } finally server.stop()
  }

  test("MetricFollow: delta-histogram bucket deltas are stateless and fold to the batch table") {
    val root = java.nio.file.Files.createTempDirectory("graft_hfollow").toString
    val marks = java.nio.file.Files.createTempDirectory("graft_hfollow_marks").toString
    val server = graft.serving.OtlpHttp.start(spark, root)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val baseNs = 1705060800000000000L
      val lake = s"$root/_metrics"
      def histEnv(svc: String, offsetS: Long, counts: Seq[Long]): String = {
        val cs = counts.map(c => "\"" + c + "\"").mkString(",")
        s"""{"resourceMetrics":[{"resource":{"attributes":[
           |{"key":"service.name","value":{"stringValue":"$svc"}}]},
           |"scopeMetrics":[{"scope":{"name":"g"},"metrics":[
           |{"name":"lat","unit":"ms","histogram":{"dataPoints":[
           |  {"timeUnixNano":"${baseNs + offsetS * 1000000000L}","count":"${counts.sum}",
           |   "sum":1.0,"bucketCounts":[$cs],"explicitBounds":[1.0,5.0],
           |   "attributes":[]}],"aggregationTemporality":1}}]}]}]}"""
          .stripMargin.replace("\n", "")
      }
      def post(body: String): Int = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${server.port}/v1/metrics"))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
      val emitted = scala.collection.mutable.ArrayBuffer.empty[MetricFollow.HistDeltas]
      def drain(): Unit = LakeFollow.poll(spark, lake, marks).foreach { inc =>
        emitted += MetricFollow.incrementHistBuckets(inc, "lat")
        LakeFollow.commit(spark, lake, marks, inc)
      }
      // two flushes: the deltas must fold across increments — no state
      assert(post(histEnv("svc-h", 0L, Seq(3, 2, 1))) == 200)
      server.flush(); drain()
      assert(post(histEnv("svc-h", 600L, Seq(4, 0, 2))) == 200)
      // a CUMULATIVE point must be excluded from the delta fold
      assert(post(histEnv("svc-h", 700L, Seq(9, 9, 9))
        .replace(""""aggregationTemporality":1""", """"aggregationTemporality":2""")) == 200)
      server.flush(); drain()
      assert(emitted.size == 2)
      // the exclusion is observable, not silent — and OUT-OF-BAND:
      // increment 2 dropped exactly one cumulative point, with no
      // per-row denormalization a store could double-count
      assert(emitted(0).droppedCumulative == 0L)
      assert(emitted(1).droppedCumulative == 1L)
      val folded = emitted.map(_.buckets).reduce(_ unionByName _)
        .groupBy(col("service_name"), col("le"))
        .agg(sum(col("bucket_n")).as("n")).collect()
        .map(r => (Option(r.get(r.fieldIndex("le"))).map(_.asInstanceOf[Double]),
          r.getAs[Long]("n"))).toMap
      // le=1: 3+4, le=5: 2+0, +Inf (null le): 1+2 — cumulative excluded
      assert(folded == Map(Some(1.0) -> 7L, Some(5.0) -> 2L, None -> 3L), folded.toString)
      // an ALL-cumulative increment emits nothing foldable — the drop
      // count still surfaces beside the EMPTY frame (a
      // cumulative-exporting fleet is distinguishable from no-data),
      // with no null-keyed sentinel row for a store to ingest
      assert(post(histEnv("svc-h", 800L, Seq(5, 5, 5))
        .replace(""""aggregationTemporality":1""", """"aggregationTemporality":2""")) == 200)
      server.flush(); drain()
      assert(emitted.size == 3)
      assert(emitted(2).buckets.count() == 0 && emitted(2).droppedCumulative == 1L,
        "all-dropped increment must surface the count out-of-band")
    } finally server.stop()
  }

  test("TraceFollow: child-before-parent across polls; edge-delta union equals the batch map") {
    val root = java.nio.file.Files.createTempDirectory("graft_tfollow").toString
    val marks = java.nio.file.Files.createTempDirectory("graft_tfollow_marks").toString
    val server = graft.serving.OtlpHttp.start(spark, root)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val baseUs = 1705060800000000L
      val lake = s"$root/_traces"
      val emitted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

      def drain(): Unit = LakeFollow.poll(spark, lake, marks).foreach { inc =>
        emitted += TraceFollow.incrementEdges(spark, lake, marks, inc)
        LakeFollow.commit(spark, lake, marks, inc)
      }

      // poll 1: the CHILD ships first (its exporter flushed early);
      // no edge can complete yet
      assert(post(client, server.port, "/v1/traces",
        spanEnv("child00000000001", "root000000000000", "svc-auth",
          baseUs + 1, 200000L)) == 200)
      server.flush(); drain()
      assert(emitted.head.count() == 0, "no parent yet — no edge")

      // poll 2: the parent arrives, plus a same-poll pair
      // (auth → backend), so both completion orders are exercised
      assert(post(client, server.port, "/v1/traces",
        spanEnv("root000000000000", null, "svc-web", baseUs, 500000L)) == 200)
      assert(post(client, server.port, "/v1/traces",
        spanEnv("child00000000002", "child00000000001", "svc-backend",
          baseUs + 2, 100000L)) == 200)
      server.flush(); drain()

      assert(emitted.size == 2)
      val streamed = emitted.reduce(_ unionByName _)
        .groupBy(col("parent_service"), col("service"))
        .agg(sum(col("calls")).as("calls"), sum(col("callee_ms")).as("callee_ms"))
      val batch = graft.operators.TraceAnalytics.serviceGraphFromLake(spark, lake)
      assert(streamed.collect().toSet == batch.collect().toSet,
        "edge-delta union and the batch service map disagree")
      // the pending store drains once state advances to the consumed
      // set: the once-pending child resolved
      assert(LakeFollow.poll(spark, lake, marks).isEmpty)
      val (_, pend) = TraceFollow.refreshedState(spark, lake, marks, 3600L * 1000)
      assert(pend.count() == 0,
        "every child's parent is consumed — pending must be empty")
    } finally server.stop()
  }

  test("TraceFollow: a child whose parent never arrives expires past the horizon") {
    val root = java.nio.file.Files.createTempDirectory("graft_tfollow_exp").toString
    val marks = java.nio.file.Files.createTempDirectory("graft_tfollow_exp_marks").toString
    val server = graft.serving.OtlpHttp.start(spark, root)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val baseUs = 1705060800000000L
      val lake = s"$root/_traces"
      val horizonMs = 60L * 1000
      // an orphan child, then (next poll) an unrelated span two
      // horizons later: the orphan is expired, not resolved
      assert(post(client, server.port, "/v1/traces",
        spanEnv("orphan0000000001", "never000arriving", "svc-a",
          baseUs, 1000L)) == 200)
      server.flush()
      val i1 = LakeFollow.poll(spark, lake, marks).get
      val e1 = TraceFollow.incrementEdges(spark, lake, marks, i1, horizonMs)
      assert(e1.count() == 0)
      LakeFollow.commit(spark, lake, marks, i1)

      assert(post(client, server.port, "/v1/traces",
        spanEnv("late000000000001", null, "svc-b",
          baseUs + 3 * horizonMs * 1000, 1000L)) == 200)
      server.flush()
      val i2 = LakeFollow.poll(spark, lake, marks).get
      val e2 = TraceFollow.incrementEdges(spark, lake, marks, i2, horizonMs)
        .collect()
      // the late span is a root — no edge — but the horizon advance
      // expires the orphan, and the count must survive a zero-edge
      // increment: one all-null sentinel row carries it
      assert(e2.length == 1 && e2.head.isNullAt(0) && e2.head.isNullAt(1) &&
        e2.head.getAs[Long]("calls") == 0L &&
        e2.head.getAs[Long]("__expired") == 1L,
        s"zero-edge increment must surface __expired on a sentinel: ${e2.toSeq}")
      LakeFollow.commit(spark, lake, marks, i2)
      val (_, pend) = TraceFollow.refreshedState(spark, lake, marks, horizonMs)
      assert(pend.filter(col("parent_span_id") === "never000arriving").count() == 0,
        "the orphan must have been horizon-expired from the pending store")
    } finally server.stop()
  }

  test("SignalLakeMaintenance: a flush-grown signal lake compacts in steady state; twins unchanged") {
    val root = java.nio.file.Files.createTempDirectory("graft_maint").toString
    val server = graft.serving.OtlpHttp.start(spark, root)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val baseNs = 1705060800000000000L
      // six flushes = six append commits of small files (the shape a
      // 10 s-interval edge produces all day)
      for (i <- 0 until 6) {
        assert(post(client, server.port, "/v1/metrics",
          metricEnv(s"svc-m${i % 2}", "requests",
            Seq((i * 60L, 10L + i), (i * 60L + 30L, 12L + i)), baseNs)) == 200)
        server.flush()
      }
      val lake = s"$root/_metrics"
      graft.sources.IcebergExport.export(spark, lake)
      val filesBefore = graft.sources.LogSync.manifest(spark, lake)
        .filter(col("removed_at").isNull).count()
      assert(filesBefore >= 6, s"each flush must append files: $filesBefore")
      def results() = graft.sources.LogSync.table(spark, lake)
        .groupBy(col("service_name"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"),
          max(col("timestamp")).as("mx"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDouble(2), r.getTimestamp(3))).sortBy(_._1).toSeq
      val want = results()
      val stats = graft.streaming.SignalLakeMaintenance.run(spark, lake,
        minFilesToCompact = 2, vacuumGraceMs = 0L)
      assert(stats.compacted.nonEmpty, "past the threshold the round must compact")
      assert(stats.vacuumed > 0, "zero-grace vacuum must reclaim the replaced files")
      assert(stats.expired.nonEmpty, "an exported lake must get metadata expiry")
      val filesAfter = graft.sources.LogSync.manifest(spark, lake)
        .filter(col("removed_at").isNull).count()
      assert(filesAfter < filesBefore,
        s"file count must be bounded: $filesBefore -> $filesAfter")
      assert(results() == want, "maintenance must not change the table")
      // an idle second round pays nothing: below the threshold, no
      // compaction, nothing to vacuum
      val again = graft.streaming.SignalLakeMaintenance.run(spark, lake,
        minFilesToCompact = 64, vacuumGraceMs = 0L)
      assert(again.compacted.isEmpty)
      // and the increase twin still answers off the compacted lake
      val inc = graft.operators.MetricAnalytics.increaseFromLake(
        spark, lake, "requests")
      assert(inc.count() > 0)
    } finally server.stop()
  }

  test("maintenance under DML: delete commits fold while a follower stays exactly-once") {
    import graft.sources.{LakeDml, LogSync, Tables}
    val root = java.nio.file.Files.createTempDirectory("graft_dmlmaint").toString
    val marks = java.nio.file.Files.createTempDirectory("graft_dmlmaint_marks").toString
    def batch(n: Int, tag: String) = Tables.events(spark, sf)
      .orderBy(col("event_id")).limit(n)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit(tag), lit("-"), col("event_id")).as("span_id"),
        col("props").as("body"))
    val consumed = scala.collection.mutable.ArrayBuffer.empty[String]
    def drain(): Unit = LakeFollow.poll(spark, root, marks).foreach { inc =>
      consumed ++= inc.rows.select("span_id").collect().map(_.getString(0))
      LakeFollow.commit(spark, root, marks, inc)
    }
    batch(60, "b0").write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    drain()
    assert(consumed.size == 60)
    // a DML-heavy interval: many tiny keyed deletions, each its own
    // delete commit — the shape a GDPR/redaction queue produces
    val victims = consumed.take(LakeDml.DeleteCompactionThreshold)
    victims.foreach { v =>
      LakeDml.deleteMor(spark, root, col("span_id") === v)
    }
    assert(LogSync.posDeleteEntries(spark, root).length == victims.length)
    // maintenance with data compaction OUT of reach: the delete-side
    // fold alone must trigger (SignalLakeMaintenance's compactDeletes
    // branch), and the zero-grace vacuum rides the same round
    val stats = graft.streaming.SignalLakeMaintenance.run(spark, root,
      minFilesToCompact = 100000, vacuumGraceMs = 0L)
    assert(stats.compacted.isEmpty, "data compaction must not have run")
    assert(LogSync.posDeleteEntries(spark, root).length == 1,
      "the delete commits must fold into one file")
    assert(LogSync.table(spark, root).count() == 60 - victims.length)
    assert(LogSync.table(spark, root)
      .filter(col("span_id").isin(victims.toSeq: _*)).count() == 0)
    // the follower crosses the fold exactly-once: a fresh append is
    // the ONLY thing the next polls deliver — the fold's rewritten
    // delete file, the tombstoned originals, and the DML commits are
    // all invisible to the append-only increment stream
    batch(40, "b1").write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    drain(); drain()
    assert(consumed.size == 100, s"expected 60+40 rows once each, got ${consumed.size}")
    assert(consumed.distinct.size == consumed.size,
      "no row may be delivered twice across the fold")
    assert(consumed.count(_.startsWith("b1-")) == 40)

    // an EQUALITY-delete pileup (the CDC retraction stream) cannot
    // fold — maintenance retires it by CONVERSION to position deletes
    // (no data rewrite), and the follower must stay exactly-once
    // across that too
    import spark.implicits._
    val eqVictims = consumed.filter(_.startsWith("b1-"))
      .take(LakeDml.DeleteCompactionThreshold)
    eqVictims.foreach(v =>
      LakeDml.deleteEq(spark, root, Seq(v).toDF("span_id")))
    val want = LogSync.table(spark, root).count()
    val dataBefore = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).select("path")
      .collect().map(_.getString(0)).toSet
    val stats2 = graft.streaming.SignalLakeMaintenance.run(spark, root,
      minFilesToCompact = 100000, vacuumGraceMs = 0L)
    assert(stats2.compacted.isEmpty,
      "equality deletes must retire WITHOUT a forced data compaction")
    assert(LogSync.deleteEntries(spark, root).count(_.isEq) == 0,
      "conversion must retire the equality deletes")
    val dataAfter = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).select("path")
      .collect().map(_.getString(0)).toSet
    assert(dataAfter == dataBefore,
      "conversion must not rewrite, add, or drop any data file")
    assert(LogSync.table(spark, root).count() == want)
    drain()
    assert(consumed.size == 100,
      "the conversion must deliver nothing new to the follower")
  }
}
