package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentHashMap, Executors}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{IcebergExport, IcebergJson}

/** An Iceberg REST CATALOG edge (server + client) speaking the public
  * Iceberg REST catalog OpenAPI subset the reference stack exercises:
  * its sync loop registers parquet-backed Iceberg tables in
  * `ice-rest-catalog` and ClickHouse discovers them through the same
  * REST protocol (docker-compose.yaml:38-49 `ice-rest-catalog`,
  * :146-160 `DataLakeCatalog('http://ice-rest-catalog:5000')`,
  * scripts/sync-logs.sh:35-80). graft previously spoke only the
  * FileSystem-table convention (version-hint walk); this closes the
  * catalog half in BOTH directions:
  *
  *  - [[start]] serves graft-exported (or any spec-compliant) table
  *    metadata over REST so a catalog client can discover and load a
  *    graft lake by name — namespaces, table listing, `register`,
  *    `loadTable`, `dropTable`;
  *  - [[load]] consumes any REST catalog: `loadTable` →
  *    `metadata-location` → the standard metadata chain walk
  *    ([[IcebergExport.resolveChainAt]]) → distributed scan with
  *    identity partitions and v2 merge-on-read deletes applied
  *    ([[IcebergExport.readChain]]).
  *
  * Scale shape: the catalog is pure CONTROL PLANE — requests carry
  * table *pointers* (a metadata-location string), never data; the
  * registry is table-cardinality driver state; all data movement
  * happens in the Spark scan the client builds from the chain. The
  * server is a JDK `HttpServer` like [[OtlpHttp]] (no new
  * dependencies), suitable for wiring tests and single-node serving;
  * a production deployment would put the same handler behind a real
  * catalog store.
  *
  * Protocol notes (iceberg REST spec): multi-level namespaces join
  * their levels with the `%1F` unit separator in URLs; errors use the
  * `{"error":{"message","type","code"}}` envelope; `loadTable`
  * returns `metadata-location` plus the full metadata object.
  */
object IceRestCatalog {

  private def jstr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  private def err(code: Int, tpe: String, msg: String): (Int, String) =
    (code, s"""{"error":{"message":${jstr(msg)},"type":${jstr(tpe)},"code":$code}}""")

  private val NsSep = "\u001f"

  final class Server(spark: SparkSession, http: HttpServer) {

    /** Live namespaces (key = levels joined by the unit separator). */
    private val namespaces = ConcurrentHashMap.newKeySet[String]()
    /** (namespace key, table name) → metadata-location. */
    private val tables = new ConcurrentHashMap[(String, String), String]()

    def port: Int = http.getAddress.getPort
    def uri: String = s"http://127.0.0.1:$port"

    def stop(): Unit = http.stop(0)

    /** Register `name` under `ns` pointing at `metadataLocation`,
      * replacing any existing registration — the server-side helper
      * the reference's sync loop shape needs (each sync re-points the
      * table at the newest metadata version). The REST `register`
      * endpoint itself keeps the spec's 409-on-exists semantics.
      */
    def put(ns: Seq[String], name: String, metadataLocation: String): Unit = {
      namespaces.add(ns.mkString(NsSep))
      tables.put((ns.mkString(NsSep), name), metadataLocation)
      ()
    }

    private def readBody(ex: HttpExchange): String =
      new String(ex.getRequestBody.readAllBytes(), UTF_8)

    // RFC-3986 percent-decoding: URLDecoder speaks the form-encoding
    // dialect where '+' means space, but URL path segments keep '+'
    // literal (pyiceberg/trino clients percent-encode spaces as %20) —
    // protect literal plus before delegating
    private def decode(seg: String): String =
      java.net.URLDecoder.decode(seg.replace("+", "%2B"), UTF_8)

    private def nsJson(key: String): String =
      key.split(NsSep(0)).toSeq.map(jstr).mkString("[", ",", "]")

    /** Interpret the request body; any failure (unparsable JSON,
      * missing field, wrong shape) is the client's 400.
      */
    private def fromBody[T](body: String)(f: IcebergJson.V => T): Either[(Int, String), T] =
      try Right(f(IcebergJson.parse(body)))
      catch {
        case scala.util.control.NonFatal(t) =>
          Left(err(400, "BadRequestException", s"undecodable request: ${t.getMessage}"))
      }

    private def loadTableJson(loc: String): Either[(Int, String), String] = {
      val p = new Path(loc)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p))
        Left(err(404, "NoSuchTableException", s"metadata vanished: $loc"))
      else {
        val in = fs.open(p)
        val raw = try new String(in.readAllBytes(), UTF_8) finally in.close()
        // pass the metadata through verbatim (it is already valid
        // JSON); parse it first so a corrupt file 500s loudly here
        // instead of poisoning the client
        IcebergJson.parse(raw)
        Right(s"""{"metadata-location":${jstr(loc)},"metadata":$raw,"config":{}}""")
      }
    }

    private[serving] def route(method: String, path: String,
                               body: String): (Int, String) = {
      val segs = path.stripPrefix("/").split("/").toList.filter(_.nonEmpty)
      (method, segs) match {
        case ("GET", List("v1", "config")) =>
          (200, """{"defaults":{},"overrides":{}}""")

        case ("GET", List("v1", "namespaces")) =>
          val all = namespaces.toArray(Array.empty[String]).toSeq.sorted
          (200, s"""{"namespaces":[${all.map(nsJson).mkString(",")}]}""")

        case ("POST", List("v1", "namespaces")) =>
          // a body the CLIENT got wrong (unparsable JSON, missing
          // fields) is a 400; failures past this point are 500s
          fromBody(body)(req => req("namespace").arr.map(_.str)) match {
            case Left(e) => e
            case Right(levels) =>
              if (levels.isEmpty) err(400, "BadRequestException", "empty namespace")
              else if (!namespaces.add(levels.mkString(NsSep)))
                err(409, "AlreadyExistsException",
                  s"namespace ${levels.mkString(".")} already exists")
              else (200, s"""{"namespace":${nsJson(levels.mkString(NsSep))},"properties":{}}""")
          }

        case ("GET", List("v1", "namespaces", ns)) =>
          val key = decode(ns)
          if (namespaces.contains(key))
            (200, s"""{"namespace":${nsJson(key)},"properties":{}}""")
          else err(404, "NoSuchNamespaceException", s"namespace not found: $key")

        case ("DELETE", List("v1", "namespaces", ns)) =>
          val key = decode(ns)
          if (!namespaces.contains(key))
            err(404, "NoSuchNamespaceException", s"namespace not found: $key")
          else if (tables.keySet.toArray(Array.empty[(String, String)]).exists(_._1 == key))
            err(409, "NamespaceNotEmptyException", s"namespace not empty: $key")
          else { namespaces.remove(key); (204, "") }

        case ("GET", List("v1", "namespaces", ns, "tables")) =>
          val key = decode(ns)
          if (!namespaces.contains(key))
            err(404, "NoSuchNamespaceException", s"namespace not found: $key")
          else {
            val ids = tables.keySet.toArray(Array.empty[(String, String)]).toSeq
              .filter(_._1 == key).map(_._2).sorted
              .map(n => s"""{"namespace":${nsJson(key)},"name":${jstr(n)}}""")
            (200, s"""{"identifiers":[${ids.mkString(",")}]}""")
          }

        case ("POST", List("v1", "namespaces", ns, "register")) =>
          val key = decode(ns)
          if (!namespaces.contains(key))
            err(404, "NoSuchNamespaceException", s"namespace not found: $key")
          else fromBody(body)(req => (req("name").str, req("metadata-location").str)) match {
            case Left(e) => e
            case Right((name, loc)) =>
              if (tables.putIfAbsent((key, name), loc) != null)
                err(409, "AlreadyExistsException", s"table exists: $name")
              else loadTableJson(loc) match {
                case Right(ok) => (200, ok)
                case Left(e) => tables.remove((key, name)); e
              }
          }

        case ("GET", List("v1", "namespaces", ns, "tables", t)) =>
          Option(tables.get((decode(ns), decode(t)))) match {
            case None => err(404, "NoSuchTableException", s"table not found: ${decode(t)}")
            case Some(loc) => loadTableJson(loc) match {
              case Right(ok) => (200, ok)
              case Left(e) => e
            }
          }

        // updateTable COMMIT (the spec's CommitTableRequest): validate
        // requirements against the CURRENT metadata, apply the updates
        // structurally, write the next metadata version, swap the
        // pointer — atomically (one commit at a time per server), so a
        // losing concurrent writer gets the spec's 409 and retries on
        // fresh state. The catalog stays control-plane: the snapshot's
        // data/manifest files were written by the CLIENT; only the
        // few-KB metadata document is produced here.
        case ("POST", List("v1", "namespaces", ns, "tables", t)) =>
          val key = decode(ns); val name = decode(t)
          // the metadata-location must be read INSIDE the lock: a
          // lookup outside it would let the loser of a concurrent
          // commit validate requirements against the pre-winner
          // metadata, pass them, and silently overwrite the winner's
          // snapshot instead of getting its 409
          commitLock.synchronized {
            Option(tables.get((key, name))) match {
              case None => err(404, "NoSuchTableException", s"table not found: $name")
              case Some(loc) =>
                fromBody(body) { req =>
                  (req.opt("requirements").map(_.arr).getOrElse(Vector.empty),
                    req("updates").arr)
                } match {
                  case Left(e) => e
                  case Right((reqs, updates)) =>
                    try commitTable(key, name, loc, reqs, updates)
                    catch {
                      case e: CommitFailed => err(409, "CommitFailedException", e.getMessage)
                      case e: BadUpdate => err(400, "BadRequestException", e.getMessage)
                    }
                }
            }
          }

        case ("HEAD", List("v1", "namespaces", ns, "tables", t)) =>
          if (tables.containsKey((decode(ns), decode(t)))) (204, "")
          else (404, "")

        case ("DELETE", List("v1", "namespaces", ns, "tables", t)) =>
          if (tables.remove((decode(ns), decode(t))) != null) (204, "")
          else err(404, "NoSuchTableException", s"table not found: ${decode(t)}")

        case ("GET" | "HEAD", _) => err(404, "NotFoundException", s"no route: $path")
        case _ => err(405, "MethodNotAllowed", s"$method not supported on $path")
      }
    }

    private val commitLock = new Object
    private final class CommitFailed(msg: String) extends RuntimeException(msg)
    private final class BadUpdate(msg: String) extends RuntimeException(msg)

    /** Apply one CommitTableRequest under [[commitLock]]: requirements
      * → update application → next `v<N>.metadata.json` beside the
      * current one → pointer swap. Supported requirements:
      * `assert-table-uuid`, `assert-ref-snapshot-id` (branch `main` =
      * the current snapshot; absent snapshot-id asserts no current).
      * Supported updates: `add-snapshot`, `set-snapshot-ref` (main
      * branch), `set-properties`, `remove-properties`. Anything else
      * is the client's 400 — silently ignoring an update would commit
      * state the writer didn't ask for.
      */
    private def commitTable(key: String, name: String, loc: String,
                            reqs: Vector[IcebergJson.V],
                            updates: Vector[IcebergJson.V]): (Int, String) = {
      import IcebergJson.{JArr, JNum, JObj, JStr, V}
      val p = new Path(loc)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      val raw = try new String(in.readAllBytes(), UTF_8) finally in.close()
      val md = IcebergJson.parse(raw)

      reqs.foreach { r =>
        r("type").str match {
          case "assert-table-uuid" =>
            val want = r("uuid").str
            val have = md("table-uuid").str
            if (want != have)
              throw new CommitFailed(s"table-uuid is $have, requirement asserts $want")
          case "assert-ref-snapshot-id" =>
            val ref = r("ref").str
            if (ref != "main")
              throw new BadUpdate(s"only the main branch is served, got ref '$ref'")
            val current = md.opt("current-snapshot-id").map(_.long).filter(_ != -1L)
            val want = r.opt("snapshot-id").map(_.long)
            if (current != want)
              throw new CommitFailed(
                s"ref main is at ${current.getOrElse("absent")}, " +
                  s"requirement asserts ${want.getOrElse("absent")}")
          case other => throw new BadUpdate(s"unsupported requirement type '$other'")
        }
      }

      var out: V = md
      updates.foreach { u =>
        u("action").str match {
          case "add-snapshot" =>
            val snap = u("snapshot")
            val snaps = out.opt("snapshots").getOrElse(JArr(Vector.empty))
            out = IcebergJson.set(out, "snapshots", IcebergJson.append(snaps, snap))
            // v2 bookkeeping rides the snapshot itself
            snap.opt("sequence-number").foreach { sq =>
              val last = out.opt("last-sequence-number").map(_.long).getOrElse(0L)
              if (sq.long > last)
                out = IcebergJson.set(out, "last-sequence-number", JNum(sq.long.toString))
            }
            snap.opt("timestamp-ms").foreach { ts =>
              out = IcebergJson.set(out, "last-updated-ms", JNum(ts.long.toString))
            }
          case "set-snapshot-ref" =>
            if (u("ref-name").str != "main")
              throw new BadUpdate("only the main branch is served")
            val id = u("snapshot-id").long
            require(out.opt("snapshots").exists(_.arr.exists(_("snapshot-id").long == id)),
              s"set-snapshot-ref names unknown snapshot $id")
            out = IcebergJson.set(out, "current-snapshot-id", JNum(id.toString))
            val ts = out("snapshots").arr.find(_("snapshot-id").long == id)
              .flatMap(_.opt("timestamp-ms")).map(_.long)
              .getOrElse(System.currentTimeMillis())
            val logEntry = IcebergJson.set(
              IcebergJson.set(JObj(Map.empty), "snapshot-id", JNum(id.toString)),
              "timestamp-ms", JNum(ts.toString))
            val log = out.opt("snapshot-log").getOrElse(JArr(Vector.empty))
            out = IcebergJson.set(out, "snapshot-log", IcebergJson.append(log, logEntry))
          case "set-properties" =>
            val props = out.opt("properties").getOrElse(JObj(Map.empty))
            var np = props
            u("updates") match {
              case o: JObj => o.fields.foreach { case (k, v) =>
                np = IcebergJson.set(np, k, v)
              }
              case _ => throw new BadUpdate("set-properties.updates must be an object")
            }
            out = IcebergJson.set(out, "properties", np)
          case "remove-properties" =>
            val props = out.opt("properties").getOrElse(JObj(Map.empty))
            var np: JObj = props match {
              case o: JObj => o
              case _ => JObj(Map.empty)
            }
            u("removals").arr.foreach(k => np = IcebergJson.remove(np, k.str))
            out = IcebergJson.set(out, "properties", np)
          case other =>
            throw new BadUpdate(s"unsupported update action '$other' — " +
              "this catalog applies add-snapshot/set-snapshot-ref/" +
              "set-properties/remove-properties")
        }
      }

      // next metadata version beside the current document
      val dir = p.getParent
      val Re = "v([0-9]+)\\.metadata\\.json".r
      val cur = p.getName match { case Re(n) => n.toInt; case _ => 0 }
      var next = cur + 1
      while (fs.exists(new Path(dir, s"v$next.metadata.json"))) next += 1
      val newLoc = new Path(dir, s"v$next.metadata.json")
      val os = fs.create(newLoc, false)
      os.write(IcebergJson.render(out).getBytes(UTF_8))
      os.close()
      // FileSystem-convention readers walking the directory see the
      // committed version too
      val hint = fs.create(new Path(dir, "version-hint.text"), true)
      hint.write(next.toString.getBytes(UTF_8))
      hint.close()
      // preserve the registered scheme/authority (s3a://, hdfs://, …) —
      // hardcoding file:// would repoint a remote table at a local path
      val locStr = fs.makeQualified(newLoc).toUri.toString
      tables.put((key, name), locStr)
      (200, s"""{"metadata-location":${jstr(locStr)},"metadata":${IcebergJson.render(out)}}""")
    }

    private[serving] def handle(ex: HttpExchange): Unit = {
      try {
        val (code, resp) =
          try route(ex.getRequestMethod, ex.getRequestURI.getRawPath, readBody(ex))
          catch {
            // malformed percent-encoding in a path segment is the
            // client's error (URLDecoder throws IllegalArgumentException)
            case t: IllegalArgumentException =>
              err(400, "BadRequestException", s"bad request: ${t.getMessage}")
            // 400 is reserved for requests the CLIENT got wrong (the
            // route marks those itself); anything else that escapes
            // route() — corrupt registered metadata, FS errors, bugs —
            // is a SERVER failure and must say so, or a spec-conforming
            // client treats it as its own non-retryable mistake
            case scala.util.control.NonFatal(t) =>
              err(500, "InternalServerError", s"${t.getClass.getSimpleName}: ${t.getMessage}")
          }
        val bytes = resp.getBytes(UTF_8)
        if (code == 204 || bytes.isEmpty || ex.getRequestMethod == "HEAD") {
          ex.sendResponseHeaders(code, -1)
        } else {
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseHeaders(code, bytes.length)
          ex.getResponseBody.write(bytes)
        }
      } finally ex.close()
    }
  }

  /** Start a catalog server on `port` (0 = ephemeral; read it back
    * from [[Server.port]]). Binds loopback only by default — the
    * endpoints mutate catalog state (commit/drop) with no auth, so a
    * non-loopback bind must be an explicit opt-in via `bindHost`.
    */
  def start(spark: SparkSession, port: Int = 0,
            bindHost: String = "127.0.0.1"): Server = {
    val http = HttpServer.create(new InetSocketAddress(bindHost, port), 0)
    val server = new Server(spark, http)
    http.createContext("/", (ex: HttpExchange) => server.handle(ex))
    http.setExecutor(Executors.newFixedThreadPool(2, { r =>
      val t = new Thread(r, "ice-rest"); t.setDaemon(true); t
    }))
    http.start()
    server
  }

  // ---- client ----

  private def get(uri: String): (Int, String) = {
    val client = java.net.http.HttpClient.newHttpClient()
    val resp = client.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(uri)).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** RFC-3986 segment encoding: URLEncoder's form dialect writes
    * spaces as '+', which a percent-decoding server reads back as a
    * literal plus — emit %20 instead.
    */
  private def encodeSeg(s: String): String =
    java.net.URLEncoder.encode(s, UTF_8).replace("+", "%20")

  private def nsPath(ns: Seq[String]): String = encodeSeg(ns.mkString(NsSep))

  /** `loadTable` against any REST catalog at `catalogUri`, returning
    * the table's `metadata-location`. Control-plane: one HTTP GET.
    */
  def metadataLocation(catalogUri: String, ns: Seq[String], table: String): String = {
    val uri = s"$catalogUri/v1/namespaces/${nsPath(ns)}/tables/" + encodeSeg(table)
    val (code, body) = get(uri)
    require(code == 200, s"loadTable $uri failed: HTTP $code $body")
    IcebergJson.parse(body)("metadata-location").str
  }

  /** Load a table from a REST catalog as a DataFrame: `loadTable` →
    * metadata-location → spec chain walk → distributed scan (identity
    * partitions attached, v2 merge-on-read deletes applied). The REST
    * leg is one GET; everything heavy stays in the Spark scan.
    */
  def load(spark: SparkSession, catalogUri: String, ns: Seq[String],
           table: String): DataFrame = {
    val loc = metadataLocation(catalogUri, ns, table)
    IcebergExport.readChain(spark,
      IcebergExport.resolveChainAt(spark, new Path(loc)))
  }

  private def post(uri: String, body: String): (Int, String) = {
    val client = java.net.http.HttpClient.newHttpClient()
    val resp = client.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(uri))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** Raw `updateTable` commit: POST requirements + updates (JSON
    * fragments) to the catalog; returns the committed
    * metadata-location, or throws with the catalog's error (409 =
    * CommitFailedException — a concurrent writer won; re-resolve and
    * retry).
    */
  def commit(catalogUri: String, ns: Seq[String], table: String,
             requirementsJson: String, updatesJson: String): String = {
    val uri = s"$catalogUri/v1/namespaces/${nsPath(ns)}/tables/" + encodeSeg(table)
    val (code, body) = post(uri,
      s"""{"requirements":$requirementsJson,"updates":$updatesJson}""")
    require(code == 200, s"commit $uri failed: HTTP $code $body")
    IcebergJson.parse(body)("metadata-location").str
  }

  /** Commit a lake's NEWEST exported snapshot THROUGH the catalog —
    * the reference's `ice insert` flow (scripts/sync-logs.sh:67: each
    * sync commits the new state via the catalog) instead of the
    * FileSystem version-hint convention: read the local export's
    * current snapshot ([[IcebergExport.export]] has already written
    * the manifests/manifest list — data-plane stays client-side),
    * then POST the spec's CommitTableRequest — requirements pin the
    * table uuid and the parent snapshot (optimistic concurrency: a
    * racing commit 409s), updates are `add-snapshot` +
    * `set-snapshot-ref main`. The CATALOG writes the canonical next
    * metadata document and answers its location.
    */
  def commitExportedSnapshot(spark: SparkSession, catalogUri: String,
                             ns: Seq[String], table: String,
                             root: String): String = {
    val chain = IcebergExport.resolveChain(spark,
      new Path(s"$root/_iceberg/metadata"))
    val snapId = chain.snapshotId.getOrElse(
      sys.error(s"no current snapshot under $root — export first"))
    val snap = chain.md("snapshots").arr.find(_("snapshot-id").long == snapId)
      .getOrElse(sys.error(s"snapshot $snapId missing from the export metadata"))
    val uuid = chain.md("table-uuid").str
    val parent = snap.opt("parent-snapshot-id").map(_.long)
    val reqs =
      s"""[{"type":"assert-table-uuid","uuid":${jstr(uuid)}},
         |{"type":"assert-ref-snapshot-id","ref":"main"${
        parent.map(p => s""","snapshot-id":$p""").getOrElse("")}}]"""
        .stripMargin.replace("\n", "")
    val updates =
      s"""[{"action":"add-snapshot","snapshot":${IcebergJson.render(snap)}},
         |{"action":"set-snapshot-ref","ref-name":"main","type":"branch",
         |"snapshot-id":$snapId}]""".stripMargin.replace("\n", "")
    commit(catalogUri, ns, table, reqs, updates)
  }
}
