package graft

import org.apache.spark.sql.functions._

import graft.operators.TraceAnalytics

class TraceAnalyticsSpec extends SparkSpec {

  test("span synthesis: contiguous heap ranks, one root per trace, log and span ids correlate") {
    val s = TraceAnalytics.spans(spark, sf).cache()
    // ranks are 1..n per trace (contiguous: max == count), exactly one root
    val byTrace = s.groupBy("trace_id")
      .agg(count(lit(1)).as("n"), max(col("idx")).as("mx"),
        sum(when(col("idx") === 1, 1).otherwise(0)).as("roots"))
    assert(byTrace.filter(col("n") =!= col("mx") || col("roots") =!= 1).count() == 0)
    // trace key equals the log side's md5(user/day) convention: the
    // lookup trace exists on both surfaces
    val logTrace = graft.operators.LogAnalytics.traceLookup(spark, sf)
      .select("trace_id").distinct().collect().map(_.getString(0))
    assert(logTrace.length == 1)
    assert(s.filter(col("trace_id") === logTrace.head).count() > 0,
      "the span table must contain the trace the log lookup returns")
    s.unpersist()
    ()
  }

  test("traceSpans: every non-root has a parent at idx div 2; tree is well-formed") {
    val t = TraceAnalytics.traceSpans(spark, sf).collect()
    assert(t.nonEmpty)
    val byIdx = t.map(r => r.getAs[Int]("idx") -> r).toMap
    t.foreach { r =>
      val idx = r.getAs[Int]("idx")
      if (idx == 1) assert(r.getAs[String]("parent_span_id") == null)
      else assert(r.getAs[String]("parent_span_id")
        == byIdx(idx / 2).getAs[String]("span_id"))
    }
  }

  test("serviceGraph: edge call total equals non-root span count; tiers partition operations") {
    val edges = TraceAnalytics.serviceGraph(spark, sf).collect()
    val s = TraceAnalytics.spans(spark, sf)
    val nonRoot = s.filter(col("idx") > 1).count()
    assert(edges.map(_.getAs[Long]("calls")).sum == nonRoot,
      "every non-root span is exactly one caller->callee edge")
    val tiers = edges.flatMap(r =>
      Seq(r.getAs[String]("parent_service"), r.getAs[String]("service"))).toSet
    assert(tiers.subsetOf(Set("web", "auth", "checkout", "backend")))
  }

  test("criticalPath: bounded by total work, at least the deepest single span") {
    val cp = TraceAnalytics.criticalPath(spark, sf)
    val sm = TraceAnalytics.traceSummary(spark, sf)
    val joined = cp.join(sm, "trace_id")
      .select(col("trace_id"), col("critical_ms"), col("total_ms"),
        cp("n_spans").as("na"), sm("n_spans").as("nb")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("critical_ms") <= r.getAs[Long]("total_ms"),
        "a root-to-span path can never exceed the trace's total work")
      assert(r.getAs[Long]("na") == r.getAs[Long]("nb"),
        "the walk must retain every span exactly once")
    }
    // single-span traces: critical path == the root's own duration
    val single = TraceAnalytics.spans(spark, sf)
      .groupBy("trace_id").agg(count(lit(1)).as("n"), sum("dur_ms").as("d"))
      .filter(col("n") === 1)
      .join(cp, "trace_id")
    assert(single.filter(col("critical_ms") =!= col("d")).count() == 0)
  }

  test("serviceGraphFromLake: OTLP-ingested spans drive the same service map") {
    val root = java.nio.file.Files.createTempDirectory("graft_trace_lake").toString
    val server = graft.serving.OtlpHttp.start(spark, root)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val baseUs = 1705060800000000L
      // web root → auth child → auth grandchild: expect web→auth(1), auth→auth(1)
      val spans = Seq(
        ("root000000000000", null, "svc-web", 500000L),
        ("child00000000001", "root000000000000", "svc-auth", 200000L),
        ("child00000000002", "child00000000001", "svc-auth", 100000L))
      import spark.implicits._
      spans.zipWithIndex.foreach { case ((sid, pid, svc, durUs), i) =>
        val env = spark.range(1).select(graft.sources.OtlpTraces.toOtlpJson(
          lit(baseUs + i), lit(baseUs + i + durUs), lit(svc),
          lit("11111111111111111111111111111111"), lit(sid),
          if (pid == null) lit(null).cast("string") else lit(pid),
          lit("op"), lit(2), lit(0)).as("env")).head.getString(0)
        val resp = client.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:${server.port}/v1/traces"))
            .header("Content-Type", "application/json")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(env)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 200)
      }
      server.flush()
      val edges = graft.operators.TraceAnalytics
        .serviceGraphFromLake(spark, s"$root/_traces").collect()
        .map(r => (r.getAs[String]("parent_service"), r.getAs[String]("service"),
          r.getAs[Long]("calls"), r.getAs[Long]("callee_ms"))).toSet
      assert(edges == Set(("svc-web", "svc-auth", 1L, 200L),
        ("svc-auth", "svc-auth", 1L, 100L)), edges.toString)
    } finally server.stop()
  }

  test("traceLogs: WARN+ log rows land on exactly their spans; join never amplifies") {
    val tl = TraceAnalytics.traceLogs(spark, sf).cache()
    val events = graft.sources.Tables.events(spark, sf)
    // join amplification check: span totals must survive the left join
    val nSpans = tl.agg(sum(col("n_spans"))).head().getLong(0)
    assert(nSpans == events.count(), "every event is a span exactly once")
    // every WARN+ event (error=17, signup=13) correlates: the global
    // n_warn equals the severity-filtered event count
    val nWarn = tl.agg(sum(col("n_warn"))).head().getLong(0)
    val direct = events.filter(col("event_type").isin("error", "signup")).count()
    assert(nWarn == direct, s"warn correlation lost rows: $nWarn != $direct")
    // warn_ms only counts matched spans
    assert(tl.filter(col("warn_ms") =!= 0 && col("n_warn") === 0).count() == 0)
    tl.unpersist()
    ()
  }

  test("tailSample: every error/slow trace kept, hash leg deterministic, reasons prioritized") {
    val kept = TraceAnalytics.tailSample(spark, sf).cache()
    val all = TraceAnalytics.spans(spark, sf)
      .groupBy("trace_id")
      .agg(sum(col("dur_ms")).as("total_ms"),
        sum(when(col("operation") === "error", 1L).otherwise(0L)).as("n_errors"))
      .cache()
    // completeness: no error or slow trace may be dropped
    val mustKeep = all.filter(col("n_errors") > 0 || col("total_ms") >= 3000)
    assert(mustKeep.join(kept, Seq("trace_id"), "left_anti").count() == 0)
    // reason priority: an error trace is never labeled slow/prob
    assert(kept.join(all.filter(col("n_errors") > 0), "trace_id")
      .filter(col("reason") =!= "error").count() == 0)
    // determinism: a second evaluation keeps the identical trace set
    val again = TraceAnalytics.tailSample(spark, sf)
    assert(kept.select("trace_id").except(again.select("trace_id")).count() == 0)
    assert(again.select("trace_id").except(kept.select("trace_id")).count() == 0)
    // the hash leg keeps a strict, plausible subset (rate ~16%)
    val probKept = kept.filter(col("reason") === "prob").count()
    val probPool = all.filter(col("n_errors") === 0 && col("total_ms") < 3000).count()
    assert(probKept > 0 && probKept < probPool,
      s"hash sample kept $probKept of $probPool")
    kept.unpersist(); all.unpersist()
    ()
  }

  test("selfTime: per-service self+children reconciles — global self sum equals root-only work") {
    val st = TraceAnalytics.selfTime(spark, sf).collect()
    val spansDf = TraceAnalytics.spans(spark, sf)
    // Σ self over all services == Σ dur − Σ (non-root dur) == since every
    // non-root span's duration is subtracted exactly once from its parent
    val totals = spansDf.agg(sum(col("dur_ms")),
      sum(when(col("idx") > 1, col("dur_ms")).otherwise(0L))).head()
    val expectSelf = totals.getLong(0) - totals.getLong(1)
    assert(st.map(_.getAs[Long]("self_ms")).sum == expectSelf)
    assert(st.map(_.getAs[Long]("total_ms")).sum == totals.getLong(0))
  }

  test("plan shape: the point lookup filters before ranking; graph joins are not nested-loop") {
    // traceSpans: the trace filter must run BELOW the window (the
    // rank covers one trace's rows, not the corpus). In the bottom-up
    // numbered formatted plan the Filter node carrying the md5
    // predicate gets a HIGHER node id than the Window it feeds.
    val plan = formattedPlan(TraceAnalytics.traceSpans(spark, sf))
    val filterId = "\\((\\d+)\\) Filter".r.findAllMatchIn(plan)
      .map(_.group(1).toInt).toSeq
    val windowId = "\\((\\d+)\\) Window".r.findFirstMatchIn(plan)
      .map(_.group(1).toInt).getOrElse(fail("no Window node"))
    assert(filterId.exists(_ < windowId),
      s"trace filter must sit below the window (filters=$filterId window=$windowId)")
    // serviceGraph: parent edge attach is an equi-join (hash or
    // sort-merge), never a nested loop over span pairs
    val g = planString(TraceAnalytics.serviceGraph(spark, sf))
    assert(!g.contains("NestedLoop"), "service graph must join on equi keys")
  }

  test("lake twins: all five trace operators run off OTLP-ingested spans") {
    val root = java.nio.file.Files.createTempDirectory("graft_trace_twins").toString
    val server = graft.serving.OtlpHttp.start(spark, root)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val baseUs = 1705060800000000L
      val tA = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"
      val tB = "bbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb"
      val tC = "cccccccccccccccccccccccccccccccc"
      // (trace, span, parent, service, op, durUs, status)
      val fixture = Seq(
        (tA, "ra00000000000000", null, "svc-web", "GET /", 500000L, 0),
        (tA, "ca00000000000001", "ra00000000000000", "svc-auth", "verify", 200000L, 0),
        (tA, "ca00000000000002", "ca00000000000001", "svc-db", "select", 100000L, 0),
        (tA, "ca00000000000003", "ra00000000000000", "svc-auth", "verify", 50000L, 2),
        (tB, "rb00000000000000", null, "svc-batch", "run", 4000000L, 0),
        // orphan: parent never exported — partial chains must be honest
        (tC, "cc00000000000001", "missing000000000", "svc-web", "GET /x", 70000L, 0))
      fixture.zipWithIndex.foreach { case ((tid, sid, pid, svc, op, durUs, status), i) =>
        val env = spark.range(1).select(graft.sources.OtlpTraces.toOtlpJson(
          lit(baseUs + i), lit(baseUs + i + durUs), lit(svc), lit(tid), lit(sid),
          if (pid == null) lit(null).cast("string") else lit(pid),
          lit(op), lit(2), lit(status)).as("env")).head.getString(0)
        val resp = client.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:${server.port}/v1/traces"))
            .header("Content-Type", "application/json")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(env)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 200)
      }
      server.flush()
      val lake = s"$root/_traces"

      val summary = TraceAnalytics.traceSummaryFromLake(spark, lake).collect()
        .map(r => r.getAs[String]("trace_id") ->
          ((r.getAs[Long]("n_spans"), r.getAs[Long]("total_ms"),
            r.getAs[String]("root_service"), r.getAs[Long]("n_errors")))).toMap
      assert(summary(tA) == ((4L, 850L, "svc-web", 1L)))
      assert(summary(tB) == ((1L, 4000L, "svc-batch", 0L)))
      assert(summary(tC) == ((1L, 70L, null, 0L)), "an orphan trace has no root")

      val lat = TraceAnalytics.latencyFromLake(spark, lake).collect()
        .map(r => (r.getAs[String]("service"), r.getAs[String]("operation")) ->
          ((r.getAs[Double]("p50_ms"), r.getAs[Long]("calls")))).toMap
      assert(lat(("svc-auth", "verify")) == ((125.0, 2L)))
      assert(lat(("svc-batch", "run")) == ((4000.0, 1L)))

      val self = TraceAnalytics.selfTimeFromLake(spark, lake).collect()
        .map(r => r.getAs[String]("service") ->
          ((r.getAs[Long]("total_ms"), r.getAs[Long]("self_ms")))).toMap
      // web root: 500 − (200 + 50) = 250; orphan web span: 70 self
      assert(self("svc-web") == ((570L, 320L)))
      // auth: 200 − 100 (db child) + 50 = 150
      assert(self("svc-auth") == ((250L, 150L)))
      assert(self("svc-db") == ((100L, 100L)))

      val kept = TraceAnalytics.tailSampleFromLake(spark, lake,
          slowMs = 3000, hexCut = "00").collect()
        .map(r => r.getAs[String]("trace_id") -> r.getAs[String]("reason")).toMap
      assert(kept == Map(tA -> "error", tB -> "slow"),
        s"error + slow kept, the orphan dropped by the 0-rate hash leg: $kept")

      val crit = TraceAnalytics.criticalPathFromLake(spark, lake).collect()
        .map(r => r.getAs[String]("trace_id") ->
          ((r.getAs[Long]("critical_ms"), r.getAs[Long]("n_spans")))).toMap
      // A: 500 + 200 + 100 = 800 beats the error path 500 + 50
      assert(crit(tA) == ((800L, 4L)))
      assert(crit(tB) == ((4000L, 1L)))
      assert(crit(tC) == ((70L, 1L)), "the torn chain answers its partial path")
    } finally server.stop()
  }

  test("criticalPathOf: pointer jumping equals the heap walk on the whole synthesis") {
    // the general-parent-pointer algorithm and the contract's
    // heap-index walk must agree trace for trace
    val viaHeap = TraceAnalytics.criticalPath(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaJump = TraceAnalytics.criticalPathOf(TraceAnalytics.synthModel(spark, sf))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaJump == viaHeap)
  }

  test("otlpProtoRoundtrip: the wire path loses nothing vs the direct synthesis aggregate") {
    import org.apache.spark.sql.functions._
    val viaWire = TraceAnalytics.otlpProtoRoundtrip(spark, sf).collect()
    val direct = graft.sources.Tables.events(spark, sf)
      .withColumn("service_name",
        when(col("event_type").isin("view", "click"), "web")
          .when(col("event_type") === "signup", "auth")
          .when(col("event_type") === "purchase", "checkout")
          .otherwise("backend"))
      .groupBy(col("service_name"))
      .agg(count(lit(1)).as("n_spans"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long") * 1000000L).as("total_dur_ns"),
        countDistinct(md5(concat(col("user_id").cast("string"), lit("/"),
          date_format(col("ts"), "yyyy-MM-dd")))).as("n_traces"))
      .orderBy(col("service_name")).collect()
    assert(viaWire.length == direct.length)
    viaWire.zip(direct).foreach { case (w, d) =>
      assert(w.getAs[String]("service_name") == d.getAs[String]("service_name"))
      assert(w.getAs[Long]("n_spans") == d.getAs[Long]("n_spans"))
      assert(w.getAs[Long]("total_dur_ns") == d.getAs[Long]("total_dur_ns"))
      assert(w.getAs[Long]("n_traces") == d.getAs[Long]("n_traces"))
    }
  }

  test("trace_lake_spans: the bloom sidecar prunes files; lookup equals the direct filter") {
    val root = TraceAnalytics.tracesLakeRoot(spark, sf)
    val got = TraceAnalytics.lakeTraceSpans(spark, sf).collect() // builds the index
    assert(got.nonEmpty)
    val traceId = java.security.MessageDigest.getInstance("MD5")
      .digest("7/2024-01-15".getBytes("UTF-8")).map("%02x".format(_)).mkString
    // bloom-negative files never reach the scan
    val (kept, total) = graft.sources.LakeIndex.pruneCounts(
      spark, root, "trace_id", Seq(traceId))
    assert(kept < total,
      s"the point lookup must prune the file set, kept $kept of $total")
    // and pruning never changes the answer
    val want = graft.sources.LogSync.table(spark, root)
      .filter(col("trace_id") === traceId).count()
    assert(got.length.toLong == want)
  }

  test("span events and links survive BOTH wire transports into the lake") {
    val root = TraceAnalytics.tracesLakeRoot(spark, sf)
    val t = graft.sources.LogSync.table(spark, root)
    val ev = graft.sources.OtlpTraces.spanEvents(t)
      .filter(col("event_name") === "exception")
    assert(ev.count() > 0, "the fixture must land exception events")
    // the transport split is by span-id hash, so both wires must have
    // contributed events (crc32 parity partitions the id space)
    val sides = ev.select((crc32(col("span_id")) % 2).as("side")).distinct().count()
    assert(sides == 2, "exception events must arrive via BOTH transports")
    // links: every root span carries exactly one link; non-roots none
    val links = t.filter(col("span_links").isNotNull)
    assert(links.filter(col("parent_span_id").isNotNull).count() == 0,
      "only root spans link to the previous-day trace")
    assert(links.count() == t.filter(col("parent_span_id").isNull).count(),
      "every root span must carry its link")
  }
}
