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
    * from [[Server.port]]).
    */
  def start(spark: SparkSession, port: Int = 0): Server = {
    val http = HttpServer.create(new InetSocketAddress(port), 0)
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
}
