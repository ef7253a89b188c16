package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.serving.OtlpHttp
import graft.sources.{LogSync, OtlpLogs}

/** The live OTLP/HTTP edge driven by a REAL HTTP client (the JDK
  * exporter-side API): protocol codes, both transports, quarantine,
  * and the landed lake matching what was posted.
  */
class OtlpHttpSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: Array[Byte],
                   contentType: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", contentType)
        .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def jsonEnvelope(us: Long, svc: String, sev: String, body: String): String =
    s"""{"resourceLogs":[{"resource":{"attributes":[
       |{"key":"service.name","value":{"stringValue":"$svc"}}]},
       |"scopeLogs":[{"scope":{"name":"graft-test","version":"1"},
       |"logRecords":[{"timeUnixNano":"${us * 1000}","severityText":"$sev",
       |"severityNumber":9,"body":{"stringValue":"$body"},
       |"traceId":"0af7651916cd43dd8448eb211c80319c","spanId":"b7ad6b7169203331",
       |"attributes":[]}]}]}]}""".stripMargin.replace("\n", "")

  test("OTLP/HTTP endpoint: both transports land in the lake; protocol codes correct") {
    val root = Files.createTempDirectory("graft_otlp_http").toString
    val server = OtlpHttp.start(spark, root)
    try {
      val port = server.port
      // protocol edges first
      assert(post(port, "/v1/nope", "{}".getBytes, "application/json").statusCode() == 404)
      val get = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/v1/logs")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode() == 405)
      assert(post(port, "/v1/logs", "not json at all".getBytes, "application/json")
        .statusCode() == 400, "garbage JSON must be rejected at request time")
      assert(post(port, "/v1/logs", Array[Byte](0x7f, 0x00, 0x13),
        "application/x-protobuf").statusCode() == 400,
        "undecodable protobuf must be rejected at request time")
      // valid JSON transport
      val baseUs = 1705060800000000L // 2024-01-12T12:00:00Z in micros
      for (i <- 0 until 5)
        assert(post(port, "/v1/logs",
          jsonEnvelope(baseUs + i * 1000000L, s"svc-${i % 2}", "INFO", s"json row $i").getBytes,
          "application/json").statusCode() == 200)
      // valid protobuf transport: encode with the engine's own wire codec
      graft.functions.VectorFunctions.register(spark)
      val protoBytes = spark.range(3)
        .select(OtlpLogs.toOtlpProtoTraced(
          lit(baseUs + 100000000L) + col("id") * 1000000L, lit("svc-proto"), lit("WARN"),
          lit(13), concat(lit("proto row "), col("id")),
          lit("0af7651916cd43dd8448eb211c80319c"), lit("b7ad6b7169203331"),
          lit("1"), lit("graft.test")).as("bin"))
        .collect().map(_.getAs[Array[Byte]]("bin"))
      protoBytes.foreach { b =>
        assert(post(port, "/v1/logs", b, "application/x-protobuf").statusCode() == 200)
      }
      // shape-invalid but request-time-passable JSON → quarantined, not dropped
      assert(post(port, "/v1/logs", """{"resourceLogs":[]}""".getBytes,
        "application/json").statusCode() == 200)
      assert(server.pending == 9)
      val (rows, quarantined) = server.flush()
      assert(rows == 8, s"5 json + 3 proto rows must land, got $rows")
      assert(quarantined == 1, "the empty-envelope payload must be quarantined")
      assert(server.pending == 0)
      assert(server.flush() == ((0L, 0L)), "empty flush is a no-op")
      // the lake agrees with what was posted, via the normal read path
      val t = LogSync.table(spark, root)
      assert(t.count() == 8)
      val bySvc = t.groupBy(col("service_name")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySvc == Map("svc-0" -> 3L, "svc-1" -> 2L, "svc-proto" -> 3L))
      assert(t.filter(col("severity_text") === "WARN").count() == 3)
      // quarantine holds exactly the rejected payload bytes
      val q = spark.read.parquet(s"$root/_quarantine/http").collect()
      assert(q.length == 1)
      assert(new String(q.head.getAs[Array[Byte]]("payload"), "UTF-8")
        == """{"resourceLogs":[]}""")
    } finally server.stop()
  }

  private def gzipBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  test("traces intake: /v1/traces spans land in their own lake; the log lake is untouched") {
    val root = Files.createTempDirectory("graft_otlp_traces").toString
    val server = OtlpHttp.start(spark, root)
    try {
      val port = server.port
      // protocol edges: method guard, garbage, spec-legal empty
      // export, protobuf scope honesty
      val get = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/v1/traces")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode() == 405)
      assert(post(port, "/v1/traces", "no spans here".getBytes, "application/json")
        .statusCode() == 400)
      assert(post(port, "/v1/traces", "{}".getBytes, "application/json").statusCode() == 200)
      assert(post(port, "/v1/traces", Array[Byte](0x0a, 0x02),
        "application/x-protobuf").statusCode() == 400,
        "framing-invalid protobuf traces must be rejected at request time")
      // real span envelopes through the engine's own generator —
      // a 3-span trace: root + two children
      val baseUs = 1705060800000000L
      val envs = spark.range(3)
        .select(graft.sources.OtlpTraces.toOtlpJson(
          lit(baseUs) + col("id") * 1000000L,
          lit(baseUs) + col("id") * 1000000L + lit(500000L) + col("id") * 1000L,
          lit("svc-traced"),
          lit("0af7651916cd43dd8448eb211c80319c"),
          concat(lit("span000000000000"), col("id")),
          when(col("id") === 0, lit(null).cast("string"))
            .otherwise(lit("span0000000000000")),
          concat(lit("op-"), col("id") % 2), lit(2), lit(0)).as("env"))
        .collect().map(_.getString(0))
      envs.init.foreach { e =>
        assert(post(port, "/v1/traces", e.getBytes, "application/json").statusCode() == 200)
      }
      // the last one arrives gzipped — same contract as the log side
      val gz = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/v1/traces"))
          .header("Content-Type", "application/json")
          .header("Content-Encoding", "gzip")
          .POST(HttpRequest.BodyPublishers.ofByteArray(gzipBytes(envs.last.getBytes)))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(gz.statusCode() == 200)
      // shape-invalid but request-passable: quarantined at flush
      assert(post(port, "/v1/traces", """{"resourceSpans":[]}""".getBytes,
        "application/json").statusCode() == 200)
      // one LOG envelope too: both signals drain in one flush, each
      // into its own lake
      assert(post(port, "/v1/logs",
        jsonEnvelope(baseUs, "svc-logside", "INFO", "log row").getBytes,
        "application/json").statusCode() == 200)
      val (rows, quarantined) = server.flush()
      assert(rows == 4, s"1 log row + 3 spans must land, got $rows")
      assert(quarantined == 1)
      // span lake: flattened schema, durations, parent chain
      val spans = LogSync.table(spark, s"$root/_traces")
      assert(spans.count() == 3)
      val byId = spans.collect().map(r => r.getAs[String]("span_id") -> r).toMap
      assert(byId.keySet == Set("span0000000000000", "span0000000000001", "span0000000000002"))
      assert(byId("span0000000000000").getAs[String]("parent_span_id") == null)
      assert(byId("span0000000000001").getAs[String]("parent_span_id")
        == "span0000000000000")
      assert(byId("span0000000000001").getAs[Long]("duration_ns") == 501000000L)
      assert(spans.select("service_name").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("svc-traced"))
      // the LOG lake holds only the log row — span files are invisible
      // to it (underscore-prefixed subdir)
      val logs = LogSync.table(spark, root)
      assert(logs.count() == 1)
      assert(logs.head.getAs[String]("service_name") == "svc-logside")
      // span quarantine is separate from the log quarantine
      val q = spark.read.parquet(s"$root/_traces/_quarantine/http").collect()
      assert(q.length == 1)
      assert(new String(q.head.getAs[Array[Byte]]("payload"), "UTF-8")
        == """{"resourceSpans":[]}""")
    } finally server.stop()
  }

  test("metrics intake: gauge, sum, and histogram points flatten into the metric lake") {
    val root = Files.createTempDirectory("graft_otlp_metrics").toString
    val server = OtlpHttp.start(spark, root)
    try {
      val port = server.port
      assert(post(port, "/v1/metrics", "nope".getBytes, "application/json")
        .statusCode() == 400)
      assert(post(port, "/v1/metrics", "{}".getBytes, "application/json")
        .statusCode() == 200)
      assert(post(port, "/v1/metrics", Array[Byte](0x0a),
        "application/x-protobuf").statusCode() == 400,
        "framing-invalid protobuf metrics must be rejected at request time")
      val baseNs = 1705060800000000000L
      val env =
        s"""{"resourceMetrics":[{"resource":{"attributes":[
           |{"key":"service.name","value":{"stringValue":"svc-m"}}]},
           |"scopeMetrics":[{"scope":{"name":"graft-test","version":"1"},"metrics":[
           |{"name":"cpu.load","unit":"1","gauge":{"dataPoints":[
           |  {"timeUnixNano":"$baseNs","asDouble":0.75,
           |   "exemplars":[{"timeUnixNano":"$baseNs","asDouble":0.9,
           |     "traceId":"0af7651916cd43dd8448eb211c80319c",
           |     "spanId":"b7ad6b7169203331"}],"attributes":[]},
           |  {"timeUnixNano":"${baseNs + 1000000000L}","asDouble":0.5,"attributes":[]}]}},
           |{"name":"requests","unit":"{req}","sum":{"dataPoints":[
           |  {"timeUnixNano":"$baseNs","asInt":"42","attributes":[]}],
           |  "aggregationTemporality":2,"isMonotonic":true}},
           |{"name":"latency","unit":"ms","histogram":{"dataPoints":[
           |  {"timeUnixNano":"$baseNs","count":"7","sum":35.5,
           |   "bucketCounts":["3","3","1"],"explicitBounds":[1.0,5.0],
           |   "attributes":[]}],"aggregationTemporality":2}}
           |]}]}]}""".stripMargin.replace("\n", "")
      assert(post(port, "/v1/metrics", env.getBytes, "application/json").statusCode() == 200)
      // shape-invalid but request-passable → quarantined at flush
      assert(post(port, "/v1/metrics", """{"resourceMetrics":[]}""".getBytes,
        "application/json").statusCode() == 200)
      val (rows, quarantined) = server.flush()
      assert(rows == 4, s"2 gauge + 1 sum + 1 histogram points must land, got $rows")
      assert(quarantined == 1)
      val m = LogSync.table(spark, s"$root/_metrics")
      assert(m.count() == 4)
      val byKind = m.groupBy(col("kind")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byKind == Map("gauge" -> 2L, "sum" -> 1L, "histogram" -> 1L))
      val sum = m.filter(col("kind") === "sum").head
      assert(sum.getAs[Double]("value") == 42.0, "asInt points must coalesce to value")
      assert(sum.getAs[Boolean]("is_monotonic"))
      assert(sum.getAs[String]("metric_name") == "requests")
      val hist = m.filter(col("kind") === "histogram").head
      assert(hist.getAs[Long]("point_count") == 7L)
      assert(hist.getAs[String]("bucket_counts") == """["3","3","1"]""")
      assert(hist.getAs[String]("explicit_bounds") == "[1.0,5.0]")
      assert(m.select("service_name").distinct().head.getString(0) == "svc-m")
      // the gauge point's EXEMPLAR lands as the canonical JSON array
      // and re-reads typed — the metrics→traces hop on real data
      val ex = m.filter(col("kind") === "gauge" && col("exemplars").isNotNull)
        .select(explode(from_json(col("exemplars"),
          graft.sources.OtlpMetrics.exemplarSchema)).as("e"))
        .select(col("e.traceId"), col("e.spanId"), col("e.value")).collect()
      assert(ex.length == 1)
      assert(ex.head.getString(0) == "0af7651916cd43dd8448eb211c80319c")
      assert(ex.head.getString(1) == "b7ad6b7169203331")
      assert(ex.head.getDouble(2) == 0.9)
    } finally server.stop()
  }

  test("protobuf transport: traces and metrics land end-to-end, incl. packed + exponential histograms") {
    val root = Files.createTempDirectory("graft_otlp_pb").toString
    val server = OtlpHttp.start(spark, root)
    try {
      val port = server.port
      graft.functions.VectorFunctions.register(spark)
      val baseUs = 1705060800000000L
      // spans over the wire — one plain, one gzipped (the stock
      // exporter default: http/protobuf + gzip)
      val spanBins = spark.range(2).select(graft.sources.OtlpTraces.toOtlpProto(
          lit(baseUs) + col("id") * 1000000L,
          lit(baseUs) + col("id") * 1000000L + lit(250000L),
          lit("svc-pb"), lit("0af7651916cd43dd8448eb211c80319c"),
          concat(lit("bb0000000000000"), col("id")),
          when(col("id") === 0, lit(null).cast("string"))
            .otherwise(lit("bb00000000000000")),
          concat(lit("op-"), col("id")), lit(2), lit(0)).as("bin"))
        .collect().map(_.getAs[Array[Byte]]("bin"))
      assert(post(port, "/v1/traces", spanBins(0), "application/x-protobuf")
        .statusCode() == 200)
      val gzr = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/v1/traces"))
          .header("Content-Type", "application/x-protobuf")
          .header("Content-Encoding", "gzip")
          .POST(HttpRequest.BodyPublishers.ofByteArray(gzipBytes(spanBins(1)))).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(gzr.statusCode() == 200)
      // a cumulative monotonic sum point over the wire
      val sumBin = spark.range(1).select(graft.sources.OtlpMetrics.toOtlpProtoSum(
          lit(baseUs), lit("svc-pb"), lit("requests"), lit("{req}"),
          lit(41.5), lit(true), lit(2)).as("bin")).head.getAs[Array[Byte]]("bin")
      assert(post(port, "/v1/metrics", sumBin, "application/x-protobuf")
        .statusCode() == 200)
      // hand-assembled MetricsData in the shapes a conforming proto3
      // writer emits: PACKED bucket counts/bounds, and an exponential
      // histogram with ZIGZAG scale/offset
      import graft.sources.OtlpProtoOps
      def packedFixed64(vs: Seq[Long]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 * vs.size)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        vs.foreach(bb.putLong); bb.array
      }
      def zz(n: Int): Long = ((n << 1) ^ (n >> 31)).toLong
      def metricsData(build: OtlpProtoOps.W => Unit): Array[Byte] = {
        val top = new OtlpProtoOps.W
        top.msg(1) { rm =>
          rm.msg(1)(res => OtlpProtoOps.strAttr(res, 1, "service.name", "svc-pb"))
          rm.msg(2) { sm => sm.msg(1)(_.str(1, "graft")); sm.msg(2)(build) }
        }
        top.result
      }
      val timeNs = baseUs * 1000L
      val histBin = metricsData { m =>
        m.str(1, "latency"); m.str(3, "ms")
        m.msg(9) { h =>
          h.msg(1) { dp =>
            dp.fixed64(3, timeNs)
            dp.fixed64(4, 7L)
            dp.fixed64(5, java.lang.Double.doubleToLongBits(35.5))
            dp.bytes(6, packedFixed64(Seq(3L, 3L, 1L)))
            dp.bytes(7, packedFixed64(Seq(
              java.lang.Double.doubleToLongBits(1.0),
              java.lang.Double.doubleToLongBits(5.0))))
          }
          h.tag(2, 0); h.vint(2L)
        }
      }
      assert(post(port, "/v1/metrics", histBin, "application/x-protobuf")
        .statusCode() == 200)
      val expBin = metricsData { m =>
        m.str(1, "latency.exp"); m.str(3, "ms")
        m.msg(10) { e =>
          e.msg(1) { dp =>
            dp.fixed64(3, timeNs)
            dp.fixed64(4, 9L)
            dp.fixed64(5, java.lang.Double.doubleToLongBits(12.5))
            dp.tag(6, 0); dp.vint(zz(2))  // scale = 2
            dp.fixed64(7, 1L)             // zero_count
            dp.msg(8) { b =>
              b.tag(1, 0); b.vint(zz(-3)) // offset = -3
              b.bytes(2, Array[Byte](1, 2, 3)) // packed varints 1,2,3
            }
          }
          e.tag(2, 0); e.vint(2L)
        }
      }
      assert(post(port, "/v1/metrics", expBin, "application/x-protobuf")
        .statusCode() == 200)
      // valid framing, corrupt interior: enqueued, then QUARANTINED
      // at flush (decode failure is a data fact, not a crash)
      assert(post(port, "/v1/metrics", Array[Byte](0x0a, 0x03, 0x0a, 0xff.toByte, 0x01),
        "application/x-protobuf").statusCode() == 200)
      val (rows, quarantined) = server.flush()
      assert(rows == 5, s"2 spans + sum + hist + exp points must land, got $rows")
      assert(quarantined == 1, "the corrupt-interior payload must be quarantined")
      // span lake: wire fields survived
      val spans = LogSync.table(spark, s"$root/_traces")
      assert(spans.count() == 2)
      val byId = spans.collect().map(r => r.getAs[String]("span_id") -> r).toMap
      assert(byId.keySet == Set("bb00000000000000", "bb00000000000001"))
      assert(byId("bb00000000000000").getAs[String]("parent_span_id") == null)
      assert(byId("bb00000000000001").getAs[String]("parent_span_id") == "bb00000000000000")
      assert(byId("bb00000000000001").getAs[Long]("duration_ns") == 250000000L)
      assert(byId("bb00000000000000").getAs[String]("trace_id")
        == "0af7651916cd43dd8448eb211c80319c")
      assert(byId("bb00000000000000").getAs[Int]("span_kind") == 2)
      assert(spans.select("service_name").distinct().head.getString(0) == "svc-pb")
      // metric lake: all three kinds, packed runs decoded, zigzag right
      val m = LogSync.table(spark, s"$root/_metrics")
      assert(m.count() == 3)
      val s = m.filter(col("kind") === "sum").head
      assert(s.getAs[Double]("value") == 41.5 && s.getAs[Boolean]("is_monotonic") &&
        s.getAs[Int]("temporality") == 2)
      val h = m.filter(col("kind") === "histogram").head
      assert(h.getAs[Long]("point_count") == 7L)
      assert(h.getAs[String]("bucket_counts") == """["3","3","1"]""")
      assert(h.getAs[String]("explicit_bounds") == "[1.0,5.0]")
      val e = m.filter(col("kind") === "exp_histogram")
        .select(col("point_count"), col("point_sum"), col("temporality"),
          from_json(col("bucket_counts"),
            graft.sources.OtlpMetrics.expStructSchema).as("x"))
        .select(col("point_count"), col("point_sum"), col("temporality"),
          col("x.scale"), col("x.zeroCount"),
          col("x.positive.offset").as("p_off"),
          col("x.positive.bucketCounts").as("p_counts"),
          col("x.negative.bucketCounts").as("n_counts")).head
      assert(e.getAs[Long]("point_count") == 9L)
      assert(e.getAs[Double]("point_sum") == 12.5)
      assert(e.getAs[Int]("temporality") == 2)
      assert(e.getAs[Int]("scale") == 2)
      assert(e.getAs[Long]("zeroCount") == 1L)
      assert(e.getAs[Int]("p_off") == -3)
      assert(e.getAs[scala.collection.Seq[Long]]("p_counts").toSeq == Seq(1L, 2L, 3L))
      assert(e.getAs[scala.collection.Seq[Long]]("n_counts").isEmpty)
      // quarantine holds the corrupt wire bytes
      val q = spark.read.parquet(s"$root/_metrics/_quarantine/http").collect()
      assert(q.length == 1 &&
        q.head.getAs[Array[Byte]]("payload").toSeq ==
          Seq[Byte](0x0a, 0x03, 0x0a, 0xff.toByte, 0x01))
    } finally server.stop()
  }

  test("span events and links land from both transports; spanEvents serves the log-like view") {
    val root = Files.createTempDirectory("graft_otlp_ev").toString
    val server = OtlpHttp.start(spark, root)
    try {
      val port = server.port
      val baseNs = 1705060800000000000L
      // JSON transport: one span carrying an exception EVENT and a
      // causal LINK to another trace
      val jsonEnv =
        s"""{"resourceSpans":[{"resource":{"attributes":[
           |{"key":"service.name","value":{"stringValue":"svc-ev"}}]},
           |"scopeSpans":[{"scope":{"name":"graft"},"spans":[
           |{"traceId":"aa000000000000000000000000000001","spanId":"aa00000000000001",
           |"name":"op-json","kind":2,
           |"startTimeUnixNano":"$baseNs","endTimeUnixNano":"${baseNs + 1000000L}",
           |"events":[{"timeUnixNano":"${baseNs + 500000L}","name":"exception",
           |  "attributes":[{"key":"exception.type","value":{"stringValue":"IOException"}}]}],
           |"links":[{"traceId":"bb000000000000000000000000000002","spanId":"bb00000000000002"}],
           |"attributes":[]}]}]}]}""".stripMargin.replace("\n", "")
      assert(post(port, "/v1/traces", jsonEnv.getBytes, "application/json")
        .statusCode() == 200)
      // WIRE transport: the same shapes hand-assembled (Event field 11,
      // Link field 13 of the Span message)
      import graft.sources.OtlpProtoOps
      val top = new OtlpProtoOps.W
      top.msg(1) { rs =>
        rs.msg(1)(res => OtlpProtoOps.strAttr(res, 1, "service.name", "svc-ev"))
        rs.msg(2) { ss =>
          ss.msg(1)(_.str(1, "graft"))
          ss.msg(2) { sp =>
            sp.bytes(1, OtlpProtoOps.hexBytes("cc000000000000000000000000000003"))
            sp.bytes(2, OtlpProtoOps.hexBytes("cc00000000000003"))
            sp.str(5, "op-wire")
            sp.fixed64(7, baseNs + 2000000L)
            sp.fixed64(8, baseNs + 3000000L)
            sp.msg(11) { ev =>
              ev.fixed64(1, baseNs + 2500000L)
              ev.str(2, "retry")
              OtlpProtoOps.strAttr(ev, 3, "retry.count", "2")
            }
            sp.msg(13) { l =>
              l.bytes(1, OtlpProtoOps.hexBytes("dd000000000000000000000000000004"))
              l.bytes(2, OtlpProtoOps.hexBytes("dd00000000000004"))
            }
          }
        }
      }
      assert(post(port, "/v1/traces", top.result, "application/x-protobuf")
        .statusCode() == 200)
      // and one span WITHOUT events/links — absence must land as NULL
      // columns, not empty arrays
      val bare = spark.range(1).select(graft.sources.OtlpTraces.toOtlpJson(
        lit(baseNs / 1000L + 9000000L), lit(baseNs / 1000L + 9500000L),
        lit("svc-ev"), lit("ee000000000000000000000000000005"),
        lit("ee00000000000005"), lit(null).cast("string"),
        lit("op-bare"), lit(2), lit(0)).as("env")).head.getString(0)
      assert(post(port, "/v1/traces", bare.getBytes, "application/json")
        .statusCode() == 200)
      assert(server.flush()._1 == 3)
      val spans = LogSync.table(spark, s"$root/_traces")
      val byOp = spans.collect().map(r => r.getAs[String]("span_name") -> r).toMap
      // links re-read typed from both transports
      def links(op: String) = spark.range(1)
        .select(from_json(lit(byOp(op).getAs[String]("span_links")),
          graft.sources.OtlpTraces.linkSchema).as("l"))
        .select(explode(col("l")).as("x"))
        .select(col("x.traceId"), col("x.spanId")).head
      assert(links("op-json").getString(0) == "bb000000000000000000000000000002")
      assert(links("op-wire").getString(0) == "dd000000000000000000000000000004")
      assert(links("op-wire").getString(1) == "dd00000000000004")
      // the log-like span-events view: one row per event, span context
      // attached, event time from the event's own nanos
      val ev = graft.sources.OtlpTraces.spanEvents(spans).collect()
        .map(r => r.getAs[String]("event_name") -> r).toMap
      assert(ev.keySet == Set("exception", "retry"))
      assert(ev("exception").getAs[String]("span_id") == "aa00000000000001")
      assert(ev("exception").getAs[String]("event_attributes")
        .contains("IOException"))
      assert(ev("retry").getAs[String]("service_name") == "svc-ev")
      assert(ev("retry").getAs[java.sql.Timestamp]("timestamp").toInstant
        .toEpochMilli == (baseNs + 2500000L) / 1000000L)
      // spans WITHOUT events/links land null, not empty arrays
      assert(byOp("op-bare").getAs[String]("span_events") == null)
      assert(byOp("op-bare").getAs[String]("span_links") == null)
      // ...and the log-like view skips them rather than exploding
      // zero-length arrays (only the two event-carrying spans emit)
      assert(ev.size == 2)
    } finally server.stop()
  }

  test("metrics intake: exponential histogram points land from the JSON transport too") {
    val root = Files.createTempDirectory("graft_otlp_expjson").toString
    val server = OtlpHttp.start(spark, root)
    try {
      val baseNs = 1705060800000000000L
      val env =
        s"""{"resourceMetrics":[{"resource":{"attributes":[
           |{"key":"service.name","value":{"stringValue":"svc-ej"}}]},
           |"scopeMetrics":[{"scope":{"name":"graft-test"},"metrics":[
           |{"name":"latency.exp","unit":"ms","exponentialHistogram":{"dataPoints":[
           |  {"timeUnixNano":"$baseNs","count":"4","sum":6.5,"scale":1,
           |   "zeroCount":"0","positive":{"offset":2,"bucketCounts":["1","3"]},
           |   "attributes":[]}],"aggregationTemporality":2}}
           |]}]}]}""".stripMargin.replace("\n", "")
      assert(post(server.port, "/v1/metrics", env.getBytes, "application/json")
        .statusCode() == 200)
      assert(server.flush()._1 == 1)
      val e = LogSync.table(spark, s"$root/_metrics")
        .filter(col("kind") === "exp_histogram")
        .select(col("metric_name"), col("point_count"),
          from_json(col("bucket_counts"),
            graft.sources.OtlpMetrics.expStructSchema).as("x"))
        .select(col("metric_name"), col("point_count"), col("x.scale"),
          col("x.positive.offset").as("p_off"),
          col("x.positive.bucketCounts").as("p_counts")).head
      assert(e.getAs[String]("metric_name") == "latency.exp")
      assert(e.getAs[Long]("point_count") == 4L)
      assert(e.getAs[Int]("scale") == 1)
      assert(e.getAs[Int]("p_off") == 2)
      assert(e.getAs[scala.collection.Seq[Long]]("p_counts").toSeq == Seq(1L, 3L))
    } finally server.stop()
  }

  test("metrics intake: SUMMARY points land from BOTH transports; quantile reader answers") {
    val root = Files.createTempDirectory("graft_otlp_summary").toString
    val server = OtlpHttp.start(spark, root)
    try {
      val baseNs = 1705060800000000000L
      // JSON transport: a legacy prometheus-bridge summary with
      // pre-computed quantiles
      val env =
        s"""{"resourceMetrics":[{"resource":{"attributes":[
           |{"key":"service.name","value":{"stringValue":"svc-sj"}}]},
           |"scopeMetrics":[{"scope":{"name":"graft-test"},"metrics":[
           |{"name":"rpc.latency","unit":"ms","summary":{"dataPoints":[
           |  {"timeUnixNano":"$baseNs","count":"100","sum":512.5,
           |   "quantileValues":[{"quantile":0.5,"value":3.25},
           |                     {"quantile":0.95,"value":9.75}],
           |   "attributes":[]},
           |  {"timeUnixNano":"${baseNs + 1000000000L}","count":"120","sum":600.0,
           |   "quantileValues":[{"quantile":0.5,"value":3.5},
           |                     {"quantile":0.95,"value":11.25}],
           |   "attributes":[]}
           |]}}]}]}]}""".stripMargin.replace("\n", "")
      assert(post(server.port, "/v1/metrics", env.getBytes, "application/json")
        .statusCode() == 200)
      // WIRE transport: the same shape hand-assembled (Summary =
      // Metric field 11; SummaryDataPoint time=3/count=4/sum=5,
      // ValueAtQuantile quantile=1/value=2)
      import graft.sources.OtlpProtoOps
      val sumBin = {
        val top = new OtlpProtoOps.W
        top.msg(1) { rm =>
          rm.msg(1)(res => OtlpProtoOps.strAttr(res, 1, "service.name", "svc-sw"))
          rm.msg(2) { sm =>
            sm.msg(1)(_.str(1, "graft"))
            sm.msg(2) { m =>
              m.str(1, "rpc.latency"); m.str(3, "ms")
              m.msg(11) { s =>
                s.msg(1) { dp =>
                  dp.fixed64(3, baseNs)
                  dp.fixed64(4, 40L)
                  dp.fixed64(5, java.lang.Double.doubleToLongBits(80.0))
                  dp.msg(6) { qv =>
                    qv.fixed64(1, java.lang.Double.doubleToLongBits(0.95))
                    qv.fixed64(2, java.lang.Double.doubleToLongBits(7.5))
                  }
                }
              }
            }
          }
        }
        top.result
      }
      assert(post(server.port, "/v1/metrics", sumBin, "application/x-protobuf")
        .statusCode() == 200)
      assert(server.flush()._1 == 3, "2 JSON + 1 wire summary points must land")
      val t = LogSync.table(spark, s"$root/_metrics").filter(col("kind") === "summary")
      assert(t.count() == 3)
      val wire = t.filter(col("service_name") === "svc-sw").head
      assert(wire.getAs[Long]("point_count") == 40L)
      assert(wire.getAs[Double]("point_sum") == 80.0)
      // the reader surfaces the LATEST snapshot's value at the asked
      // quantile, per series
      val p95 = graft.operators.MetricAnalytics.summaryQuantileFromLake(
        spark, s"$root/_metrics", "rpc.latency", 0.95).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(p95 == Map("svc-sj" -> 11.25, "svc-sw" -> 7.5),
        s"latest-point quantile extraction: $p95")
      // an unexported quantile answers null, not a fabricated value
      val p99 = graft.operators.MetricAnalytics.summaryQuantileFromLake(
        spark, s"$root/_metrics", "rpc.latency", 0.99).collect()
      assert(p99.forall(_.isNullAt(1)),
        "a summary only answers the quantiles its exporter chose")
    } finally server.stop()
  }

  private def postGz(port: Int, body: Array[Byte], contentType: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/v1/logs"))
        .header("Content-Type", contentType)
        .header("Content-Encoding", "gzip")
        .POST(HttpRequest.BodyPublishers.ofByteArray(gzipBytes(body))).build(),
      HttpResponse.BodyHandlers.ofString())

  test("gzip transport: Content-Encoding: gzip bodies land on both transports") {
    val root = Files.createTempDirectory("graft_otlp_gz").toString
    val server = OtlpHttp.start(spark, root)
    try {
      val port = server.port
      val baseUs = 1705060800000000L
      // gzipped JSON
      assert(postGz(port, jsonEnvelope(baseUs, "svc-gz", "INFO", "gzipped json").getBytes,
        "application/json").statusCode() == 200)
      // gzipped protobuf, encoded with the engine's own wire codec
      graft.functions.VectorFunctions.register(spark)
      val protoBytes = spark.range(2)
        .select(OtlpLogs.toOtlpProtoTraced(
          lit(baseUs + 1000000L) + col("id") * 1000000L, lit("svc-gz"), lit("WARN"),
          lit(13), concat(lit("gz proto "), col("id")),
          lit("0af7651916cd43dd8448eb211c80319c"), lit("b7ad6b7169203331"),
          lit("1"), lit("graft.test")).as("bin"))
        .collect().map(_.getAs[Array[Byte]]("bin"))
      protoBytes.foreach { b =>
        assert(postGz(port, b, "application/x-protobuf").statusCode() == 200)
      }
      // corrupt gzip stream → client error, not a buffered payload
      val corrupt = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/v1/logs"))
          .header("Content-Type", "application/json")
          .header("Content-Encoding", "gzip")
          .POST(HttpRequest.BodyPublishers.ofByteArray("not gzip".getBytes)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(corrupt.statusCode() == 400)
      // spec-legal empty export request: full success, nothing buffered
      assert(post(port, "/v1/logs", "{}".getBytes, "application/json").statusCode() == 200)
      assert(server.pending == 3, "empty envelope and corrupt gzip must not buffer")
      val (rows, quarantined) = server.flush()
      assert(rows == 3 && quarantined == 0)
      val t = LogSync.table(spark, root)
      assert(t.count() == 3)
      assert(t.filter(col("severity_text") === "WARN").count() == 2)
    } finally server.stop()
  }

  test("flush durability: a failed write re-enqueues acked payloads; stop() drains them") {
    val tmp = Files.createTempDirectory("graft_otlp_dur")
    val root = s"$tmp/lake"
    // a regular FILE at the lake root blocks parquet dir creation —
    // the flush's write step throws before anything is durable
    Files.createFile(java.nio.file.Paths.get(root))
    val server = OtlpHttp.start(spark, root)
    try {
      assert(post(server.port, "/v1/logs",
        jsonEnvelope(1705060800000000L, "svc-dur", "INFO", "must not vanish").getBytes,
        "application/json").statusCode() == 200)
      assert(server.pending == 1)
      intercept[Throwable] { server.flush() }
      assert(server.pending == 1,
        "the 200-acked payload must be re-enqueued after a failed flush")
      // heal the lake path; stop() must drain the re-enqueued payload
      Files.delete(java.nio.file.Paths.get(root))
    } finally server.stop()
    assert(LogSync.table(spark, root).count() == 1,
      "the acked payload must land once the path heals")
  }

  test("backpressure: over the pending-bytes bound the endpoint 429s until a flush drains") {
    val root = Files.createTempDirectory("graft_otlp_bp").toString
    val env = jsonEnvelope(1705060800000000L, "svc-bp", "INFO", "x" * 200)
    // bound sized to admit exactly two of these envelopes
    val server = OtlpHttp.start(spark, root,
      maxPendingBytes = 2L * env.getBytes("UTF-8").length)
    try {
      assert(post(server.port, "/v1/logs", env.getBytes, "application/json").statusCode() == 200)
      assert(post(server.port, "/v1/logs", env.getBytes, "application/json").statusCode() == 200)
      val over = post(server.port, "/v1/logs", env.getBytes, "application/json")
      assert(over.statusCode() == 429,
        "the third payload must be pushed back, not buffered")
      assert(over.headers().firstValue("Retry-After").isPresent,
        "429 must carry the spec's Retry-After throttle signal")
      assert(server.pending == 2)
      assert(server.flush()._1 == 2)
      // the drain released the budget: intake resumes
      assert(post(server.port, "/v1/logs", env.getBytes, "application/json").statusCode() == 200)
      assert(server.flush()._1 == 1)
    } finally server.stop()
  }

  test("HTTP intake feeds the CDC follow path: each flush is one consumable increment") {
    // the full reference pipeline live: exporter POST → lake →
    // downstream incremental consumer (collector → parquet →
    // ClickHouse-consumer analog), with exactly-once increments
    val root = Files.createTempDirectory("graft_otlp_cdc").toString
    val marks = Files.createTempDirectory("graft_otlp_cdc_marks").toString
    val server = OtlpHttp.start(spark, root)
    try {
      val baseUs = 1705060800000000L
      for (i <- 0 until 3)
        assert(post(server.port, "/v1/logs",
          jsonEnvelope(baseUs + i * 1000000L, "svc-a", "INFO", s"batch1 $i").getBytes,
          "application/json").statusCode() == 200)
      assert(server.flush()._1 == 3)
      val inc1 = graft.streaming.LakeFollow.poll(spark, root, marks)
        .getOrElse(fail("first flush must surface as an increment"))
      assert(inc1.rows.count() == 3)
      graft.streaming.LakeFollow.commit(spark, root, marks, inc1)
      // second batch: the next poll sees ONLY the new rows
      for (i <- 0 until 2)
        assert(post(server.port, "/v1/logs",
          jsonEnvelope(baseUs + 100000000L + i * 1000000L, "svc-b", "WARN", s"batch2 $i").getBytes,
          "application/json").statusCode() == 200)
      assert(server.flush()._1 == 2)
      val inc2 = graft.streaming.LakeFollow.poll(spark, root, marks)
        .getOrElse(fail("second flush must surface as an increment"))
      assert(inc2.rows.count() == 2)
      assert(inc2.rows.select("service_name").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("svc-b"),
        "the second increment carries only the second batch")
      graft.streaming.LakeFollow.commit(spark, root, marks, inc2)
      assert(graft.streaming.LakeFollow.poll(spark, root, marks).isEmpty,
        "a committed follow has nothing new to consume")
    } finally server.stop()
  }

  test("auto-flush timer lands posted rows without an explicit flush call") {
    val root = Files.createTempDirectory("graft_otlp_http_auto").toString
    val server = OtlpHttp.start(spark, root, autoFlushMillis = 300L)
    try {
      assert(post(server.port, "/v1/logs",
        jsonEnvelope(1705060800000000L, "svc-a", "INFO", "auto").getBytes,
        "application/json").statusCode() == 200)
      val deadline = System.currentTimeMillis() + 30000
      var landed = false
      while (!landed && System.currentTimeMillis() < deadline) {
        // LogSync.table refuses until the first sync registered the
        // manifest, and a poll can also sample the root mid-commit
        // (manifest dir visible, data rename not yet) — both read as
        // "not landed yet" and the next sample sees the final state
        landed = try LogSync.table(spark, root).count() == 1
                 catch {
                   case _: IllegalArgumentException => false
                   case _: org.apache.spark.sql.AnalysisException => false
                 }
        if (!landed) Thread.sleep(200)
      }
      assert(landed, "timer flush must register the posted row")
    } finally server.stop()
  }
}
