package graft

import org.apache.spark.sql.functions._

import graft.operators.LogAnalytics

class LogAnalyticsSpec extends SparkSpec {

  test("recent: newest-first tail, limited, time filter pushed") {
    val df = LogAnalytics.recent(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val ts = rows.map(_.getAs[String]("ts_str"))
    assert(ts.sameElements(ts.sorted.reverse), "must be newest first")
  }

  test("recent/search: time bound reaches the parquet scan as a raw-ns filter") {
    for (df <- Seq(LogAnalytics.recent(spark, sf), LogAnalytics.search(spark, sf))) {
      val plan = formattedPlan(df)
      val pushed = plan.linesIterator.find(_.contains("PushedFilters:")).getOrElse("")
      assert(pushed.contains("GreaterThanOrEqual(ts,"),
        s"expected pushed raw-ns ts filter, got: $pushed")
    }
  }

  test("severityByService: covers all severities present") {
    val rows = LogAnalytics.severityByService(spark, sf).collect()
    val sevs = rows.map(_.getAs[String]("event_type")).toSet
    assert(sevs == Set("error", "signup", "purchase", "view", "click"))
  }

  test("timeseries: bucket counts sum to table size") {
    val total = LogAnalytics.timeseries(spark, sf).agg(org.apache.spark.sql.functions.sum("n"))
      .collect()(0).getLong(0)
    assert(total == spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("search: every hit matches the substring and range") {
    val rows = LogAnalytics.search(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("props").contains("\"k\": 7")))
    assert(rows.forall { r =>
      val t = r.getAs[String]("ts_str"); t >= "2024-01-10" && t < "2024-01-20"
    })
  }

  test("errorRate: rates within [0,1]") {
    val rows = LogAnalytics.errorRate(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val x = r.getAs[Double]("error_rate"); x >= 0 && x <= 1
    })
  }

  test("sessionize: session count bounded by event count; durations non-negative") {
    val rows = LogAnalytics.sessionize(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("duration_us") >= 0))
    val n = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == n, "sessions partition all events")
  }

  test("approxDau: HLL estimate within 10% of exact") {
    val exact = LogAnalytics.dau(spark, sf).collect()
      .map(r => r.getAs[String]("day") -> r.getAs[Long]("dau")).toMap
    val approx = LogAnalytics.approxDau(spark, sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val d = r.getAs[String]("day"); val est = r.getAs[Long]("approx_dau")
      val ex = exact(d).toDouble
      assert(math.abs(est - ex) / ex <= 0.10, s"day $d: approx $est vs exact $ex")
    }
  }

  test("approxP95: sketch within 5% of exact percentile") {
    val exact = LogAnalytics.p95Value(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("p95")).toMap
    LogAnalytics.approxP95(spark, sf).collect().foreach { r =>
      val t = r.getAs[String]("event_type")
      val got = r.getAs[Double]("p95_approx")
      assert(math.abs(got - exact(t)) / exact(t) <= 0.05, s"$t: $got vs ${exact(t)}")
    }
  }

  test("salted aggregation is exactly the direct aggregate") {
    val salted = graft.operators.Skew.saltedEventAgg(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toMap
    val direct = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2))), 2)
          .cast("double").as("s"))
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Double]("s"))).toMap
    assert(salted == direct)
  }

  test("salted join equals the plain join on a skewed dataset") {
    import spark.implicits._
    // 10k rows of one hot key + a tail, joined to a 100-row dim
    val left = ((1 to 10000).map(i => (7L, i.toLong)) ++
      (1 to 500).map(i => ((i % 100).toLong, -i.toLong))).toDF("k", "payload")
    val right = (0 until 100).map(i => (i.toLong, s"dim-$i")).toDF("k", "name")
    val salted = graft.operators.Skew.saltedJoin(left, right, "k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("payload"), r.getAs[String]("name"))).sorted
    val plain = left.join(right, Seq("k")).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("payload"), r.getAs[String]("name"))).sorted
    assert(salted.length == plain.length && salted.sameElements(plain))
  }

  test("sample: bottom-k aggregate is invariant to partitioning") {
    graft.functions.VectorFunctions.register(spark)
    val base = graft.sources.Tables.events(spark, sf)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.agg(expr("graft_sample(event_id, 50)")).collect()(0).getSeq[Long](0).toSet
    val a = ids(base.repartition(1))
    val b = ids(base.repartition(13, col("user_id")))
    assert(a.size == 50 && a == b, "sample must not depend on physical layout")
  }

  test("exemplars: aggregate plan (no row-cardinality window), matches local bottom-k replay") {
    val df = LogAnalytics.exemplars(spark, sf)
    // the scale contract: per-bucket evidence sampling must be the
    // mergeable bottom-k aggregate, never a window shuffling every
    // event row to one task per (event_type, day)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"exemplars must not use a window plan:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the TypedImperativeAggregate bottom-k plan:\n$plan")
    assert(plan.contains("partial_graft_sample") || plan.contains("partial graft_sample") ||
      plan.toLowerCase.contains("partial"), "partial (map-side) aggregation expected")
    // semantics: bottom-k by md5(event_id) within each bucket, rank by hash
    val got = df.collect().map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"),
      r.getAs[Int]("rk"), r.getAs[Long]("event_id")))
    assert(got.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getAs[Long]("event_id")))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = ev.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((t, d), es) =>
      es.map(_._3).sortBy(id => (md5hex(id.toString), id)).take(3)
        .zipWithIndex.map { case (id, i) => (t, d, i + 1, id) }
    }.sortBy(e => (e._1, e._2, e._3))
    assert(got.sortBy(e => (e._1, e._2, e._3)).toSeq == want,
      "exemplars must equal the local bottom-k-by-md5 replay")
  }

  test("p95Value: p50 <= p95 per severity") {
    val rows = LogAnalytics.p95Value(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getAs[Double]("p50") <= r.getAs[Double]("p95")))
  }

  test("dauSketch: two-level sketch union within 5% of exact; merge is lossless") {
    val exact = LogAnalytics.dau(spark, sf).collect()
      .map(r => r.getAs[String]("day") -> r.getAs[Long]("dau")).toMap
    val got = LogAnalytics.dauSketch(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val d = r.getAs[String]("day"); val est = r.getAs[Long]("dau_est")
      val ex = exact(d).toDouble
      assert(math.abs(est - ex) / ex <= 0.05, s"day $d: est $est vs exact $ex")
      assert(r.getAs[Long]("n_partials") >= 1)
    }
    // merging per-service partials must equal sketching the day directly
    // (HLL union at the same lgK is lossless)
    import org.apache.spark.sql.functions._
    val single = graft.sources.Tables.events(spark, sf)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("e"))
      .collect().map(r => r.getAs[String]("day") -> r.getAs[Long]("e")).toMap
    got.foreach { r =>
      assert(r.getAs[Long]("dau_est") == single(r.getAs[String]("day")),
        s"union of partials must equal the single-level sketch on ${r.getAs[String]("day")}")
    }
  }

  test("anomaly: verdicts replay from the emitted series with integer arithmetic") {
    val rows = LogAnalytics.anomaly(spark, sf).collect()
      .map(r => (r.getAs[String]("bucket"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Long]("trailing_n"), r.getAs[Boolean]("is_anomaly")))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, series) =>
      val s = series.sortBy(_._1)
      s.zipWithIndex.foreach { case ((_, _, n, tn, anom), i) =>
        val prev = s.slice(math.max(0, i - 6), i).map(_._3)
        assert(tn == prev.sum, "trailing_n must be the previous-6 sum")
        val want = prev.length == 6 && n * 6 > tn * 2
        assert(anom == want, s"verdict mismatch at index $i")
      }
    }
  }

  test("scopeAttrs: scope_version/scope_attributes carry data end-to-end") {
    val rows = LogAnalytics.scopeAttrs(spark, sf).collect()
    assert(rows.nonEmpty)
    val versions = rows.map(_.getAs[String]("scope_version")).toSet
    val modules = rows.map(_.getAs[String]("module")).toSet
    assert(versions == Set("1.0", "1.1"), s"got $versions")
    assert(modules.subsetOf((0 until 4).map(i => s"mod-$i").toSet) && modules.size == 4, s"got $modules")
  }

  test("compareWindows: prev-day and pct change match a local lag replay") {
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[String]("day"), r.getAs[String]("event_type")) -> r.getAs[Long]("n"))
      .toMap
    val got = LogAnalytics.compareWindows(spark, sf).collect()
    assert(got.length == daily.size)
    val byType = daily.toSeq.groupBy(_._1._2)
      .view.mapValues(_.sortBy(_._1._1)).toMap
    got.foreach { r =>
      val (d, t, n) = (r.getAs[String]("day"), r.getAs[String]("event_type"), r.getAs[Long]("n"))
      assert(n == daily((d, t)))
      val series = byType(t)
      val idx = series.indexWhere(_._1._1 == d)
      if (idx == 0) {
        assert(r.isNullAt(r.fieldIndex("prev_n")) && r.isNullAt(r.fieldIndex("pct_change")),
          s"first day of $t must have null prev")
      } else {
        val prev = series(idx - 1)._2
        assert(r.getAs[Long]("prev_n") == prev)
        val pct = BigDecimal((n - prev).toDouble / prev * 100)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getAs[Double]("pct_change") == pct, s"($d,$t)")
      }
    }
  }

  test("alertBursts: gap-and-island grouping of the anomaly series matches local replay") {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    def epoch(s: String) = java.time.LocalDateTime.parse(s, fmt)
      .toEpochSecond(java.time.ZoneOffset.UTC)
    val anomalies = LogAnalytics.anomaly(spark, sf).collect()
      .filter(_.getAs[Boolean]("is_anomaly"))
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("bucket"), r.getAs[Long]("n")))
    assume(anomalies.nonEmpty, "need anomalies at this sf to test grouping")
    val want = anomalies.groupBy(_._1).flatMap { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      val bursts = collection.mutable.ArrayBuffer.empty[collection.mutable.ArrayBuffer[(String, Long)]]
      var prev: Option[String] = None
      sorted.foreach { case (_, b, n) =>
        if (prev.isEmpty || (epoch(b) - epoch(prev.get)) / 3600 > 3)
          bursts += collection.mutable.ArrayBuffer((b, n))
        else bursts.last += ((b, n))
        prev = Some(b)
      }
      bursts.zipWithIndex.map { case (bs, i) =>
        (t, i + 1L) -> (bs.head._1, bs.last._1, bs.length.toLong, bs.map(_._2).max)
      }
    }
    val got = LogAnalytics.alertBursts(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("burst")) ->
        (r.getAs[String]("burst_start"), r.getAs[String]("burst_end"),
          r.getAs[Long]("n_buckets"), r.getAs[Long]("peak_n"))).toMap
    assert(got == want, "burst grouping must equal the local gap-and-island replay")
    // one alert per burst: never more alerts than anomalies (at tiny sf
    // anomalies may all be isolated, so equality is legitimate)
    assert(got.size <= anomalies.length)
  }

  test("histogram: bins partition each type's events; edges and counts consistent") {
    val rows = LogAnalytics.histogram(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(r.getAs[Double]("lo") == bin * 25.0 && r.getAs[Double]("hi") == (bin + 1) * 25.0)
      assert(r.getAs[Long]("n") > 0)
    }
    // per type, the bin counts sum to the type's event count, and a local
    // rebinning of the raw values agrees bin for bin
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val want = ev.groupBy { case (t, v) => (t, math.floor(v / 25.0).toLong) }
      .view.mapValues(_.length.toLong).toMap
    val got = rows.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bin")) -> r.getAs[Long]("n")).toMap
    assert(got == want, "histogram bins must match a local recomputation")
  }

  test("transitions: matrix equals the local lag replay; rows stochastic") {
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Long]("event_id")))
    val want = ev.groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._3.getTime, e._3.getNanos, e._4))
      ordered.sliding(2).collect { case Array(a, b) => (a._2, b._2) }
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = LogAnalytics.transitions(spark, sf).collect()
    val got = rows.map(r => (r.getAs[String]("prev_type"), r.getAs[String]("event_type"))
      -> r.getAs[Long]("n")).toMap
    assert(got == want, "transition counts must match the local replay")
    rows.groupBy(_.getAs[String]("prev_type")).values.foreach { rs =>
      val psum = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-9, s"row must be stochastic, got $psum")
    }
  }

  test("sloBurn: page verdicts equal the local multi-window replay; selective") {
    val rows = LogAnalytics.sloBurn(spark, sf).collect()
      .sortBy(_.getAs[String]("bucket"))
    assert(rows.nonEmpty)
    val totals = rows.map(_.getAs[Long]("total"))
    val errors = rows.map(_.getAs[Long]("errors"))
    rows.zipWithIndex.foreach { case (r, i) =>
      def winSum(xs: Array[Long], h: Int) = xs.slice(math.max(0, i - h + 1), i + 1).sum
      val errS = winSum(errors, 1); val totS = winSum(totals, 1)
      val errL = winSum(errors, 6); val totL = winSum(totals, 6)
      val want = i >= 5 && errS * 4 >= totS && errL * 4 >= totL
      assert(r.getAs[Boolean]("page") == want, s"bucket ${r.getAs[String]("bucket")}")
    }
    val pages = rows.count(_.getAs[Boolean]("page"))
    assert(pages > 0, "the corpus has >=25% error hours; some page must fire")
    assert(pages < rows.length, "paging everywhere means the thresholds are vacuous")
  }

  test("trend: ewma equals the local lag-polynomial replay, bit-exact") {
    val rows = LogAnalytics.trend(spark, sf).collect()
    assert(rows.nonEmpty)
    // replay per type from the n series itself
    val series = rows.groupBy(_.getAs[String]("event_type"))
    series.foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[String]("bucket"))
      ordered.zipWithIndex.foreach { case (r, i) =>
        var num = r.getAs[Long]("n").toDouble
        var den = 1.0
        (1 to 5).foreach { k =>
          if (i - k >= 0) {
            num += ordered(i - k).getAs[Long]("n").toDouble * math.pow(0.5, k)
            den += math.pow(0.5, k)
          }
        }
        assert(r.getAs[Double]("ewma") == num / den,
          s"bit-exact ewma expected at ${r.getAs[String]("bucket")}")
      }
    }
    // smoothing property: ewma of the first bucket equals its own count
    val firsts = series.values.map(_.minBy(_.getAs[String]("bucket")))
    firsts.foreach(r => assert(r.getAs[Double]("ewma") == r.getAs[Long]("n").toDouble))
  }
}
