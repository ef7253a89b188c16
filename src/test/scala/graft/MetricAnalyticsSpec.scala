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

  test("delta temporality: windowless-sum increase equals the cumulative twin on the same stream") {
    val root = java.nio.file.Files.createTempDirectory("graft_metric_delta").toString
    val server = graft.serving.OtlpHttp.start(spark, root)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val baseNs = 1705060800000000000L
      // one underlying increment stream exported BOTH ways: cumulative
      // samples (with a reset) and the equivalent per-sample deltas
      val cum = Seq((0L, 10L), (600L, 25L), (1200L, 40L), (3700L, 5L), (3900L, 9L))
      val deltas = Seq((0L, 10L), (600L, 15L), (1200L, 15L), (3700L, 5L), (3900L, 4L))
      def env(name: String, temp: Int, pts: Seq[(Long, Long)]): String = {
        val dps = pts.map { case (s, v) =>
          s"""{"timeUnixNano":"${baseNs + s * 1000000000L}","asInt":"$v","attributes":[]}"""
        }.mkString(",")
        s"""{"resourceMetrics":[{"resource":{"attributes":[
           |{"key":"service.name","value":{"stringValue":"svc-d"}}]},
           |"scopeMetrics":[{"scope":{"name":"g","version":"1"},"metrics":[
           |{"name":"$name","unit":"{req}","sum":{"dataPoints":[$dps],
           |"aggregationTemporality":$temp,"isMonotonic":true}}]}]}]}"""
          .stripMargin.replace("\n", "")
      }
      def post(body: String): Int = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${server.port}/v1/metrics"))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
      assert(post(env("req.cum", 2, cum)) == 200)
      assert(post(env("req.delta", 1, deltas)) == 200)
      server.flush()
      def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[java.sql.Timestamp]("bucket").toInstant.toString ->
          r.getAs[Double]("increase")).toMap
      val viaCum = asMap(graft.operators.MetricAnalytics
        .increaseFromLake(spark, s"$root/_metrics", "req.cum"))
      val viaDelta = asMap(graft.operators.MetricAnalytics
        .increaseFromLakeDelta(spark, s"$root/_metrics", "req.delta"))
      assert(viaCum == viaDelta, s"cum=$viaCum delta=$viaDelta")
      assert(viaDelta == Map("2024-01-12T12:00:00Z" -> 40.0, "2024-01-12T13:00:00Z" -> 9.0))
      // the delta path must NOT consume cumulative points or vice versa
      assert(graft.operators.MetricAnalytics
        .increaseFromLakeDelta(spark, s"$root/_metrics", "req.cum").count() == 0)
      assert(graft.operators.MetricAnalytics
        .increaseFromLake(spark, s"$root/_metrics", "req.delta").count() == 0)
    } finally server.stop()
  }

  test("expQuantileOf: multi-scale points merge at the min scale; estimate lands in its bucket") {
    import spark.implicits._
    // series svc-x: a scale-2 point and a scale-1 point — the scale-2
    // indexes must pair-merge (idx >> 1) before the rank walk.
    // scale-1 buckets: (2^(idx/2), 2^((idx+1)/2)]. Merged counts:
    // coarse idx2 = 20, idx3 = 20, idx4 = 2 (cum 20/40/42); rank =
    // 0.95 × 42 = 39.9 → target bucket coarse idx 3 = (2.83, 4].
    val rows = Seq(
      // scale 2, offset 4: idx 4..7 → coarse (scale1) idx 2..3: 20 samples
      ("svc-x", 20L,
        """{"scale":2,"zeroCount":0,"positive":{"offset":4,"bucketCounts":[5,5,5,5]},"negative":{"offset":0,"bucketCounts":[]}}"""),
      // scale 1, offset 2: idx 2,3 → 20 samples; idx 4 → 2 samples
      ("svc-x", 22L,
        """{"scale":1,"zeroCount":0,"positive":{"offset":2,"bucketCounts":[10,10,2]},"negative":{"offset":0,"bucketCounts":[]}}"""))
      .toDF("service_name", "point_count", "bucket_counts")
    val out = graft.operators.MetricAnalytics.expQuantileOf(rows, 0.95).collect()
    assert(out.length == 1)
    val p95 = out.head.getAs[Double]("p95")
    assert(p95 > math.pow(2, 1.5) && p95 <= 4.0,
      s"p95 $p95 must interpolate inside coarse bucket idx 3 (2.83, 4]")
    // a zero-heavy series answers 0 for ranks inside the zero bucket
    val zeroRows = Seq(("svc-z", 100L,
      """{"scale":0,"zeroCount":99,"positive":{"offset":0,"bucketCounts":[1]},"negative":{"offset":0,"bucketCounts":[]}}"""))
      .toDF("service_name", "point_count", "bucket_counts")
    val z = graft.operators.MetricAnalytics.expQuantileOf(zeroRows, 0.95).head
    assert(z.getAs[Double]("p95") == 0.0)
  }

  test("expQuantileOf: negative buckets join the rank walk in real line order") {
    import spark.implicits._
    // scale 0: negative offset 1, counts [10] → 10 samples in [−4, −2);
    // positive offset 0, counts [10] → 10 samples in (1, 2]
    val rows = Seq(("svc-n", 20L,
      """{"scale":0,"zeroCount":0,"positive":{"offset":0,"bucketCounts":[10]},"negative":{"offset":1,"bucketCounts":[10]}}"""))
      .toDF("service_name", "point_count", "bucket_counts")
    def p(q: Double) = graft.operators.MetricAnalytics.expQuantileOf(rows, q)
      .head.getDouble(1)
    val p25 = p(0.25) // rank 5: inside the negative bucket
    assert(p25 > -4.0 && p25 < -2.0, s"rank 5 must land in [−4, −2): $p25")
    val p75 = p(0.75) // rank 15: inside the positive bucket
    assert(p75 > 1.0 && p75 <= 2.0, s"rank 15 must land in (1, 2]: $p75")
    // a count/sum-only histogram point (empty bounds) must not crash
    // the explicit-bucket walk and answers null for an all-+Inf series
    val emptyBounds = Seq(("svc-e", 5L, """["5"]""", "[]"))
      .toDF("service_name", "point_count", "bucket_counts", "explicit_bounds")
    val e = graft.operators.MetricAnalytics.histQuantileOf(emptyBounds, 0.95).head
    assert(e.isNullAt(1), "an all-+Inf series has no estimable quantile")
  }

  test("histQuantileOf: cumulative-temporality points take the latest, never sum") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-12T12:00:00Z"))
    val t1 = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-12T13:00:00Z"))
    // a cumulative series: the later point CONTAINS the earlier one;
    // summing would double-count — only the latest stands. A delta
    // series alongside must still sum.
    val rows = Seq(
      ("svc-c", t0, 10L, """["8","2"]""", "[1.0,5.0]", 2),
      ("svc-c", t1, 20L, """["15","5"]""", "[1.0,5.0]", 2),
      ("svc-d", t0, 10L, """["8","2"]""", "[1.0,5.0]", 1),
      ("svc-d", t1, 10L, """["7","3"]""", "[1.0,5.0]", 1))
      .toDF("service_name", "timestamp", "point_count", "bucket_counts",
        "explicit_bounds", "temporality")
    val out = graft.operators.MetricAnalytics.histQuantileOf(rows, 0.5).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // cumulative: latest point only → total 20, rank 10 ≤ 15 at le=1
    assert(out("svc-c") > 0.0 && out("svc-c") <= 1.0,
      s"latest cumulative point's rank 10 lands in (0,1]: ${out("svc-c")}")
    // delta: merged 15 at le=1, total 20 → rank 10 in the first bucket
    assert(out("svc-d") > 0.0 && out("svc-d") <= 1.0, out.toString)
    // proof the cumulative path did NOT sum: p95 rank = 19 of total 20
    // → still inside the latest point's finite buckets (cum 20 ≥ 19)
    val p95 = graft.operators.MetricAnalytics.histQuantileOf(
      rows.filter(col("service_name") === "svc-c"), 0.95)
      .head.getDouble(1)
    assert(p95 > 1.0 && p95 <= 5.0,
      s"summed cumulative counts would push rank past the finite buckets: $p95")
  }

  test("histQuantileOf: null/UNSPECIFIED temporality takes the cumulative rule, like the sum paths") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-12T12:00:00Z"))
    val t1 = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-12T13:00:00Z"))
    // an exporter that omits temporality (proto3 unset enum = 0;
    // OTLP SDKs default histograms to CUMULATIVE): the later point
    // CONTAINS the earlier one. Summing would inflate every sample —
    // the null/0 cases must take the latest-point rule, agreeing with
    // increaseFromLake's null ⇒ cumulative default on the same lake.
    for (temp <- Seq(null.asInstanceOf[Integer], Integer.valueOf(0))) {
      val rows = Seq(
        ("svc-u", t0, 10L, """["8","2"]""", "[1.0,5.0]", temp),
        ("svc-u", t1, 20L, """["15","5"]""", "[1.0,5.0]", temp))
        .toDF("service_name", "timestamp", "point_count", "bucket_counts",
          "explicit_bounds", "temporality")
      // latest point only: total 20, p95 rank 19 ≤ 20 finite cum →
      // inside (1, 5]. A summed path would see total 30, rank 28.5
      // past the finite cum 30... use p50 too: rank 10 ≤ 15 at le=1
      val p50 = graft.operators.MetricAnalytics.histQuantileOf(rows, 0.5)
        .head.getDouble(1)
      assert(p50 > 0.0 && p50 <= 1.0,
        s"temporality=$temp must take the latest point (rank 10 in (0,1]): $p50")
      // and the point-count total proves no summing: p95 of the latest
      // point (total 20, rank 19) interpolates inside (1,5]
      val p95 = graft.operators.MetricAnalytics.histQuantileOf(rows, 0.95)
        .head.getDouble(1)
      assert(p95 > 1.0 && p95 <= 5.0,
        s"temporality=$temp summed would distort the rank walk: $p95")
    }
  }

  test("histQuantileOf: per-point runs merge; +Inf-heavy series clamp to the top bound") {
    import spark.implicits._
    val rows = Seq(
      // two points of one series: counts merge bucket for bucket
      ("svc-h", 10L, """["4","4","2"]""", "[1.0,5.0]"),
      ("svc-h", 10L, """["6","2","2"]""", "[1.0,5.0]"),
      // a series whose p95 rank falls in the +Inf overflow: clamp to 5.0
      ("svc-inf", 100L, """["1","1","98"]""", "[1.0,5.0]"))
      .toDF("service_name", "point_count", "bucket_counts", "explicit_bounds")
    val out = graft.operators.MetricAnalytics.histQuantileOf(rows, 0.95).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // svc-h merged: le1=10, le5=6, inf=4; total 20, rank 19 > 16 finite
    // cum → clamp 5.0
    assert(out("svc-inf") == 5.0, s"rank in +Inf must clamp to the top bound: $out")
    assert(out("svc-h") == 5.0,
      s"merged finite cum (16) below rank 19 must clamp too: $out")
    // and a series where the rank lands inside a finite bucket
    val mid = Seq(("svc-m", 20L, """["10","9","1"]""", "[1.0,5.0]"))
      .toDF("service_name", "point_count", "bucket_counts", "explicit_bounds")
    val m = graft.operators.MetricAnalytics.histQuantileOf(mid, 0.95).head.getDouble(1)
    // rank 19, bucket (1,5]: 1 + 4*(19-10)/9 = 5.0 boundary; use 0.5:
    val m50 = graft.operators.MetricAnalytics.histQuantileOf(mid, 0.5).head.getDouble(1)
    assert(m50 > 0.0 && m50 <= 1.0, s"rank 10 lands in the first bucket: $m50")
    assert(m > 1.0 && m <= 5.0, s"rank 19 lands in the second bucket: $m")
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
