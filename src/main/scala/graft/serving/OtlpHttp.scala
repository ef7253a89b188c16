package graft.serving

import java.net.InetSocketAddress
import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{LogSync, LogWriter, OtlpLogs}

/** LIVE OTLP/HTTP intake — the reference's listening edge
  * (docker-compose.yaml:93-101: otel-collector accepts OTLP over HTTP
  * on :4318 and batches to parquet): a socket that speaks the PUBLIC
  * OTLP/HTTP protocol (opentelemetry-proto; POST /v1/logs with
  * `application/json` or `application/x-protobuf` — the
  * `ExportLogsServiceRequest` wire shape is field-compatible with
  * `LogsData`, so the same hand-rolled codec decodes both), buffers
  * payloads in memory, and FLUSHES them through the existing lake
  * pipeline: quarantined parse ([[OtlpLogs.parseWithInvalid]] /
  * [[OtlpLogs.parseProtoWithInvalid]]) → partitioned
  * [[LogWriter.write]] → [[LogSync.sync]] (one atomic manifest
  * registration per flush — readers never see a half-written batch,
  * exactly like [[graft.streaming.LakeIngest]]'s micro-batches).
  *
  * Protocol behavior (the part a real exporter sees):
  *  - 200 + `{}` on accepted payloads (export-level acceptance; OTLP
  *    allows asynchronous processing after acknowledgment);
  *  - 400 on payloads that cannot possibly decode (non-JSON body on
  *    the JSON transport, undecodable bytes on the protobuf one);
  *  - 404/405 for wrong path/method.
  * Envelope-shape rejects that pass the cheap request-time check are
  * quarantined at flush (written under `_quarantine/http/`), never
  * silently dropped — the same discipline as the batch intake.
  *
  * Scale honesty: this is the SINGLE-NODE listening edge, exactly what
  * the reference runs (one collector container) — the buffer is
  * driver-resident and bounded by flush cadence × arrival rate, and
  * flush cost is one Spark job over that buffer. A 100 TB/day
  * deployment runs a fleet of collectors in front and lands files for
  * [[LogSync.sync]] instead; this endpoint exists so a stock OTLP
  * exporter can point at a graft lake with no extra moving parts.
  *
  * JDK `com.sun.net.httpserver` only (a supported public JDK module) —
  * no new dependencies.
  */
object OtlpHttp {

  final class Server private[OtlpHttp] (spark: SparkSession, root: String,
                                        server: HttpServer,
                                        scheduler: Option[java.util.concurrent.ScheduledExecutorService],
                                        maxPendingBytes: Long) {
    private val jsonQ = new ConcurrentLinkedQueue[String]()
    private val protoQ = new ConcurrentLinkedQueue[Array[Byte]]()
    // BACKPRESSURE: the buffer is driver-resident, so it must be
    // BOUNDED — above the high-water mark the endpoint answers 429
    // (retryable per the OTLP/HTTP spec; a conforming exporter backs
    // off and retries, losing nothing) instead of growing until OOM
    private val pendingBytes = new java.util.concurrent.atomic.AtomicLong(0L)

    def port: Int = server.getAddress.getPort
    def pending: Int = jsonQ.size + protoQ.size

    private def admit(n: Long): Boolean = {
      val after = pendingBytes.addAndGet(n)
      if (after > maxPendingBytes) { pendingBytes.addAndGet(-n); false }
      else true
    }

    private[OtlpHttp] def handle(ex: HttpExchange): Unit = {
      try {
        val resp: (Int, String) =
          if (ex.getRequestURI.getPath != "/v1/logs") (404, """{"error":"unknown path"}""")
          else if (ex.getRequestMethod != "POST") (405, """{"error":"POST only"}""")
          else {
            val body = ex.getRequestBody.readAllBytes()
            val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
            if (ct.contains("protobuf")) {
              // cheap STRUCTURAL gate only (outer framing: field-1
              // length-delimited tag + a varint length that fits the
              // body) — a full wire decode per POST would run on one
              // of 4 handler threads and then run AGAIN at flush;
              // deeper corruption is caught there and quarantined,
              // never silently dropped
              if (!protoFraming(body))
                (400, """{"error":"undecodable protobuf payload"}""")
              else if (!admit(body.length.toLong))
                (429, """{"error":"intake buffer full, retry later"}""")
              else { protoQ.add(body); (200, "{}") }
            } else {
              val s = new String(body, "UTF-8")
              // cheap request-time gate; full envelope validation (and
              // quarantine) happens at flush
              if (!s.contains("resourceLogs"))
                (400, """{"error":"not an OTLP logs envelope"}""")
              // measure the DECODED string's UTF-8 size so admit and
              // the flush-side release use the same number even for
              // payloads with invalid byte sequences
              else if (!admit(s.getBytes("UTF-8").length.toLong))
                (429, """{"error":"intake buffer full, retry later"}""")
              else { jsonQ.add(s); (200, "{}") }
            }
          }
        val bytes = resp._2.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(resp._1, bytes.length)
        ex.getResponseBody.write(bytes)
      } finally ex.close()
    }

    /** Drain the buffer through parse → write → sync. Returns
      * (valid rows landed, payloads quarantined). Serialized: OTLP
      * exporters keep POSTing while a flush runs; their payloads land
      * in the next one.
      */
    def flush(): (Long, Long) = synchronized {
      import spark.implicits._
      val js = Iterator.continually(jsonQ.poll()).takeWhile(_ != null).toSeq
      val ps = Iterator.continually(protoQ.poll()).takeWhile(_ != null).toSeq
      if (js.isEmpty && ps.isEmpty) return (0L, 0L)
      // release the drained payloads' budget — new POSTs are admitted
      // again while this flush's Spark job runs
      pendingBytes.addAndGet(
        -(js.map(_.getBytes("UTF-8").length.toLong).sum + ps.map(_.length.toLong).sum))
      val parsed = Seq(
        if (js.nonEmpty) Some(OtlpLogs.parseWithInvalid(js.toDF("payload"), col("payload")))
        else None,
        if (ps.nonEmpty) Some(OtlpLogs.parseProtoWithInvalid(ps.toDF("bin"), col("bin")))
        else None).flatten
      val valid = parsed.map(_._1).reduce(_ unionByName _).cache()
      val nValid = valid.count()
      if (nValid > 0) {
        LogWriter.write(valid, root, layout = LogWriter.DailyLayout)
        LogSync.sync(spark, root)
      }
      valid.unpersist()
      // shape-invalid envelopes: quarantined as their raw bytes, the
      // batch intake's no-silent-drop rule
      val badN = parsed.map { case (_, bad) =>
        val badBin = bad.select(
          (if (bad.schema("payload").dataType == org.apache.spark.sql.types.StringType)
             encode(col("payload"), "UTF-8") else col("payload")).as("payload"))
        val n = badBin.count()
        if (n > 0)
          badBin.write.mode(SaveMode.Append).parquet(s"$root/_quarantine/http")
        n
      }.sum
      (nValid, badN)
    }

    /** Close the socket WAITING for in-flight handlers (a payload the
      * server 200-acked must land — `stop(0)` would let a dispatched
      * handler enqueue after the final drain and silently lose it),
      * then flush whatever they enqueued, then release the pools.
      */
    def stop(): Unit = {
      scheduler.foreach { s => s.shutdown(); s.awaitTermination(5, TimeUnit.SECONDS); () }
      server.stop(1) // seconds to let dispatched exchanges finish
      flush()
      server.getExecutor match {
        case e: java.util.concurrent.ExecutorService => e.shutdown()
        case _ =>
      }
      ()
    }
  }

  /** Minimal OTLP `LogsData`/`ExportLogsServiceRequest` outer framing:
    * tag 0x0a (field 1, length-delimited) followed by a varint length
    * that fits inside the body. O(1), no allocation.
    */
  private def protoFraming(b: Array[Byte]): Boolean = {
    if (b.length < 2 || b(0) != 0x0a) return false
    var pos = 1
    var len = 0L
    var shift = 0
    while (pos < b.length && shift <= 35) {
      val x = b(pos) & 0xff
      len |= (x & 0x7fL) << shift
      pos += 1
      if ((x & 0x80) == 0) return len <= b.length - pos
      shift += 7
    }
    false
  }

  /** Start listening on `port` (0 = ephemeral, read it back from
    * [[Server.port]]). `autoFlushMillis > 0` flushes on a daemon timer
    * (the collector's batch interval); 0 leaves flushing to the
    * caller. `maxPendingBytes` bounds the driver-resident buffer —
    * above it the endpoint answers 429 until a flush drains
    * (backpressure, not OOM).
    */
  def start(spark: SparkSession, root: String, port: Int = 0,
            autoFlushMillis: Long = 0L,
            maxPendingBytes: Long = 256L * 1024 * 1024): Server = {
    val http = HttpServer.create(new InetSocketAddress(port), 0)
    val scheduler =
      if (autoFlushMillis > 0)
        Some(Executors.newSingleThreadScheduledExecutor { r =>
          val t = new Thread(r, "otlp-http-flush"); t.setDaemon(true); t
        })
      else None
    val server = new Server(spark, root, http, scheduler, maxPendingBytes)
    http.createContext("/", (ex: HttpExchange) => server.handle(ex))
    http.setExecutor(Executors.newFixedThreadPool(4, { r =>
      val t = new Thread(r, "otlp-http"); t.setDaemon(true); t
    }))
    http.start()
    scheduler.foreach(_.scheduleWithFixedDelay(
      () => { try { server.flush(); () } catch { case t: Throwable =>
        System.err.println(s"[otlp-http] flush failed: ${t.getMessage}") } },
      autoFlushMillis, autoFlushMillis, TimeUnit.MILLISECONDS))
    server
  }
}
