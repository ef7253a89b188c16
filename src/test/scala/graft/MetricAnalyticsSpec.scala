package graft

import org.apache.spark.sql.functions._

import graft.operators.MetricAnalytics

class MetricAnalyticsSpec extends SparkSpec {

  test("rate: increases follow the exact PromQL reset model, day for day") {
    // The PromQL reset rule is precise, including its documented
    // limitation: a day whose FIRST sample is below the previous
    // day's closing total is a DETECTED reset and conserves the day's
    // true sum exactly; a first sample at-or-above it is an
    // UNDETECTED reset and undercounts by exactly that previous
    // total. Replay the model locally and require equality per
    // (service, day) — and that detection is the overwhelming case.
    import org.apache.spark.sql.expressions.Window
    val perDay = graft.sources.Tables.events(spark, sf)
      .withColumn("service", concat(lit("svc-"), (col("user_id") % 10).cast("string")))
      .withColumn("day", dayofmonth(col("ts")))
      .withColumn("vi", floor(col("value") * 100 + lit(0.5)).cast("long"))
      .groupBy(col("service"), col("day"))
      .agg(sum(col("vi")).as("want"),
        min_by(col("vi"), struct(col("ts"), col("event_id"))).as("first_vi"))
      .withColumn("prev_total", lag(col("want"), 1).over(
        Window.partitionBy(col("service")).orderBy(col("day"))))
      .collect()
      .map(r => (r.getAs[String]("service"), r.getAs[Int]("day")) ->
        (r.getAs[Long]("want"), r.getAs[Long]("first_vi"),
          Option(r.get(r.fieldIndex("prev_total"))).map(_.asInstanceOf[Long])))
      .toMap
    val got = MetricAnalytics.rate(spark, sf)
      .groupBy(col("service"), col("day"))
      .agg(sum(col("increase_c")).as("got")).collect()
      .map(r => (r.getAs[String]("service"), r.getAs[Int]("day")) -> r.getAs[Long]("got"))
      .toMap
    assert(got.keySet == perDay.keySet)
    var undetected = 0
    got.foreach { case (key, g) =>
      val (want, firstVi, prevTotal) = perDay(key)
      val expected = prevTotal match {
        case Some(p) if firstVi >= p => undetected += 1; want - p // undetected reset
        case _ => want // first day, or detected reset
      }
      assert(g == expected, s"$key: got $g, model says $expected (want=$want)")
    }
    // density sanity: detection dominates even on the sparse sf0.001
    // corpus (~17% of day boundaries have a tiny previous-day total);
    // at production sample rates the undetected case vanishes
    assert(undetected < got.size / 4,
      s"undetected resets must be the minority case ($undetected of ${got.size})")
  }

  test("histogram: cumulative-le counts are monotone and equal direct threshold counts") {
    val h = MetricAnalytics.histogram(spark, sf).collect()
    val events = graft.sources.Tables.events(spark, sf)
      .withColumn("service", concat(lit("svc-"), (col("user_id") % 10).cast("string")))
    h.groupBy(_.getAs[String]("service")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Double]("le"))
      assert(sorted.map(_.getAs[Long]("cum_n")).toSeq ==
        sorted.map(_.getAs[Long]("cum_n")).sorted.toSeq, "cum_n must be monotone in le")
    }
    // spot-check one (service, le) cell against a direct count
    val cell = h.find(r => r.getAs[Double]("le") == 100.0).get
    val direct = events.filter(col("service") === cell.getAs[String]("service") &&
      col("value") <= 100.0).count()
    assert(cell.getAs[Long]("cum_n") == direct)
  }

  test("histogramQuantile: the estimate lands in the bucket holding the exact order statistic") {
    val p95 = MetricAnalytics.histogramQuantile(spark, sf).collect()
      .map(r => r.getAs[String]("service") -> r.getAs[Double]("p95")).toMap
    val events = graft.sources.Tables.events(spark, sf)
      .withColumn("service", concat(lit("svc-"), (col("user_id") % 10).cast("string")))
      .select(col("service"), col("value")).collect()
      .groupBy(_.getAs[String]("service"))
    events.foreach { case (svc, rows) =>
      val vs = rows.map(_.getAs[Double]("value")).sorted
      val exact = vs((math.ceil(0.95 * vs.length) - 1).toInt.max(0))
      val bs = MetricAnalytics.Boundaries
      def bucketOf(v: Double): Int = bs.indexWhere(v <= _) match {
        case -1 => bs.length; case i => i
      }
      assert(bucketOf(p95(svc)) == bucketOf(exact).min(bs.length - 1),
        s"$svc: estimate ${p95(svc)} not in the exact statistic's bucket ($exact)")
    }
  }

  test("increaseFromLake: OTLP-ingested cumulative counters yield reset-corrected increases") {
    val root = java.nio.file.Files.createTempDirectory("graft_metric_lake").toString
    val server = graft.serving.OtlpHttp.start(spark, root)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val baseNs = 1705060800000000000L // 2024-01-12T12:00:00Z
      // cumulative monotonic sum: 10, 25 in hour 12; RESET (40 -> 5),
      // then 9 in hour 13. Expect hour12: 10 + 15 + 15 = 40? No —
      // samples land where they are: h12 = [10, 25, 40], h13 = [5, 9]
      // → inc h12 = 10+15+15 = 40, h13 = 5 (reset) + 4 = 9
      val points = Seq((0L, 10L), (600L, 25L), (1200L, 40L),
        (3700L, 5L), (3900L, 9L))
      val dps = points.map { case (s, v) =>
        s"""{"timeUnixNano":"${baseNs + s * 1000000000L}","asInt":"$v","attributes":[]}"""
      }.mkString(",")
      val env =
        s"""{"resourceMetrics":[{"resource":{"attributes":[
           |{"key":"service.name","value":{"stringValue":"svc-c"}}]},
           |"scopeMetrics":[{"scope":{"name":"g","version":"1"},"metrics":[
           |{"name":"requests","unit":"{req}","sum":{"dataPoints":[$dps],
           |"aggregationTemporality":2,"isMonotonic":true}}]}]}]}"""
          .stripMargin.replace("\n", "")
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${server.port}/v1/metrics"))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(env)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      server.flush()
      val inc = graft.operators.MetricAnalytics
        .increaseFromLake(spark, s"$root/_metrics", "requests").collect()
        .map(r => r.getAs[java.sql.Timestamp]("bucket").toInstant.toString ->
          r.getAs[Double]("increase")).toMap
      assert(inc == Map("2024-01-12T12:00:00Z" -> 40.0, "2024-01-12T13:00:00Z" -> 9.0),
        inc.toString)
    } finally server.stop()
  }

  test("exemplars: the surfaced trace holds the bucket's peak sample and resolves cross-signal") {
    val ex = MetricAnalytics.exemplars(spark, sf).cache()
    val events = graft.sources.Tables.events(spark, sf)
      .withColumn("service", concat(lit("svc-"), (col("user_id") % 10).cast("string")))
      .withColumn("vi", floor(col("value") * 100 + lit(0.5)).cast("long"))
      .withColumn("trace_id",
        md5(concat(col("user_id").cast("string"), lit("/"),
          date_format(col("ts"), "yyyy-MM-dd"))))
      .select(col("service"), dayofmonth(col("ts")).as("day"),
        hour(col("ts")).as("hour"), col("vi"), col("trace_id"))
    // the exemplar trace must contain a sample equal to the bucket max
    // in ITS OWN bucket (the exemplar is in-bucket, not global)
    val bad = ex.join(events,
        Seq("service", "day", "hour"))
      .filter(col("trace_id") === col("exemplar_trace_id") &&
        col("vi") === col("max_c"))
      .groupBy(col("service"), col("day"), col("hour")).count()
      .join(ex, Seq("service", "day", "hour"), "right_outer")
      .filter(col("count").isNull)
    assert(bad.count() == 0, "every exemplar must hold its bucket's peak")
    // the exemplar id resolves in the span model — the metrics→traces hop
    val spanTraces = graft.operators.TraceAnalytics.spans(spark, sf)
      .select(col("trace_id")).distinct()
    assert(ex.join(spanTraces,
      ex("exemplar_trace_id") === spanTraces("trace_id"), "left_anti").count() == 0,
      "every exemplar trace id must exist on the traces surface")
    ex.unpersist()
    ()
  }

  test("otlpProtoRoundtrip: the metrics wire path loses nothing vs the direct aggregate") {
    val viaWire = MetricAnalytics.otlpProtoRoundtrip(spark, sf).collect()
    val direct = graft.sources.Tables.events(spark, sf)
      .withColumn("service_name",
        concat(lit("svc-"), (col("user_id") % 10).cast("string")))
      .groupBy(col("service_name"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("sum_c"))
      .orderBy(col("service_name")).collect()
    assert(viaWire.length == direct.length)
    viaWire.zip(direct).foreach { case (w, d) =>
      assert(w.getAs[String]("service_name") == d.getAs[String]("service_name"))
      assert(w.getAs[Long]("n") == d.getAs[Long]("n"))
      assert(w.getAs[Long]("sum_c") == d.getAs[Long]("sum_c"))
    }
  }

  test("plan shape: counter windows stay series-keyed — no single-partition global sort") {
    val plan = planString(MetricAnalytics.rate(spark, sf))
    assert(!plan.contains("SinglePartition"),
      "rate must window per series (service/day keys), never one global partition")
    // every CORPUS-SCALED window (the ones ordering by event_id) must
    // partition on (service, day) — a service-only lag window passes
    // the SinglePartition check while still pinning partition count at
    // service cardinality (10 giant single-task sorts at 100×). The
    // day-chunk + halo design keeps the sample-ordered windows
    // series×day-keyed; the only service-partitioned window left is
    // the lag over the series×day-cardinality halo frame (orders by
    // day, not event_id).
    val corpusWindows = plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .filter(_.contains("event_id")).toSeq
    assert(corpusWindows.nonEmpty, "expected sample-ordered windows in the rate plan")
    corpusWindows.foreach { l =>
      assert(l.contains("windowspecdefinition(service") &&
        l.replaceAll("windowspecdefinition\\(service#\\d+, day#\\d+.*", "OK").endsWith("OK"),
        s"every sample-ordered window must partition on (service, day), got: $l")
    }
  }
}
