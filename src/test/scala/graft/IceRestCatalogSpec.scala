package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import graft.serving.IceRestCatalog
import graft.sources.{IcebergExport, IcebergFixture, IcebergJson, Tables}

/** Drives the REST catalog with a real `java.net.http` client over a
  * live socket — the protocol walk a catalog consumer (the
  * reference's ClickHouse `DataLakeCatalog`, pyiceberg, trino)
  * performs: config → namespace CRUD → register → loadTable → scan.
  */
class IceRestCatalogSpec extends SparkSpec {

  private lazy val server = {
    val s = IceRestCatalog.start(spark)
    SessionCaches.register(spark)(() => s.stop())
    s
  }
  private lazy val client = HttpClient.newHttpClient()

  private def send(method: String, path: String, body: String = ""): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(s"${server.uri}$path"))
    val req = method match {
      case "GET" => b.GET()
      case "HEAD" => b.method("HEAD", HttpRequest.BodyPublishers.noBody())
      case "DELETE" => b.DELETE()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body))
        .header("Content-Type", "application/json")
    }
    val resp = client.send(req.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("protocol walk: config, namespace CRUD, list, 404s, method guard") {
    assert(send("GET", "/v1/config") == (200, """{"defaults":{},"overrides":{}}"""))
    // create + duplicate
    assert(send("POST", "/v1/namespaces", """{"namespace":["walk"]}""")._1 == 200)
    val dup = send("POST", "/v1/namespaces", """{"namespace":["walk"]}""")
    assert(dup._1 == 409 && dup._2.contains("AlreadyExists"))
    // multi-level namespaces URL-join with %1F
    assert(send("POST", "/v1/namespaces", """{"namespace":["walk","sub"]}""")._1 == 200)
    assert(send("GET", "/v1/namespaces/walk%1Fsub")._1 == 200)
    val listed = IcebergJson.parse(send("GET", "/v1/namespaces")._2)
    assert(listed("namespaces").arr.map(_.arr.map(_.str))
      .contains(Vector("walk", "sub")))
    // empty namespace list for a fresh ns; 404 for a missing one
    assert(send("GET", "/v1/namespaces/walk/tables")._2 == """{"identifiers":[]}""")
    assert(send("GET", "/v1/namespaces/ghost/tables")._1 == 404)
    assert(send("GET", "/v1/namespaces/ghost")._1 == 404)
    // delete: empty ok (sub first), 404 after
    assert(send("DELETE", "/v1/namespaces/walk%1Fsub")._1 == 204)
    assert(send("DELETE", "/v1/namespaces/walk%1Fsub")._1 == 404)
    // malformed body is a client error, not a 500
    assert(send("POST", "/v1/namespaces", """{"nope"""")._1 == 400)
    // unsupported method on a known route
    assert(send("POST", "/v1/config", "{}")._1 == 405)
  }

  test("register + loadTable round-trip serves the metadata a client can scan from") {
    val loc = IcebergFixture.externalNationTable(spark, sf)
    assert(send("POST", "/v1/namespaces", """{"namespace":["ext"]}""")._1 == 200)
    // fixture has no version-hint; register points at its v1 metadata
    val mdLoc = s"$loc/metadata/v1.metadata.json"
    val reg = send("POST", "/v1/namespaces/ext/register",
      s"""{"name":"nation","metadata-location":"$mdLoc"}""")
    assert(reg._1 == 200, reg.toString)
    val regJson = IcebergJson.parse(reg._2)
    assert(regJson("metadata-location").str == mdLoc)
    // duplicate register: 409 per spec
    assert(send("POST", "/v1/namespaces/ext/register",
      s"""{"name":"nation","metadata-location":"$mdLoc"}""")._1 == 409)
    // list + HEAD see it
    assert(IcebergJson.parse(send("GET", "/v1/namespaces/ext/tables")._2)("identifiers")
      .arr.map(_("name").str) == Vector("nation"))
    assert(send("HEAD", "/v1/namespaces/ext/tables/nation")._1 == 204)
    // loadTable: metadata-location + the metadata object itself
    val lt = send("GET", "/v1/namespaces/ext/tables/nation")
    assert(lt._1 == 200)
    val loaded = IcebergJson.parse(lt._2)
    assert(loaded("metadata-location").str == mdLoc)
    assert(loaded("metadata")("format-version").int == 1)
    // the CLIENT end: load() == readExternal row-for-row
    val viaRest = IceRestCatalog.load(spark, server.uri, Seq("ext"), "nation")
      .collect().map(_.toSeq.toString).sorted.toSeq
    val direct = IcebergExport.readExternal(spark, loc)
      .collect().map(_.toSeq.toString).sorted.toSeq
    assert(viaRest == direct)
    // registering a table whose metadata file is missing must fail
    // and roll the registration back
    assert(send("POST", "/v1/namespaces/ext/register",
      """{"name":"ghost","metadata-location":"/tmp/nope.metadata.json"}""")._1 == 404)
    assert(send("HEAD", "/v1/namespaces/ext/tables/ghost")._1 == 404)
    // drop
    assert(send("DELETE", "/v1/namespaces/ext/tables/nation")._1 == 204)
    assert(send("HEAD", "/v1/namespaces/ext/tables/nation")._1 == 404)
    assert(send("GET", "/v1/namespaces/ext/tables/nation")._1 == 404)
  }

  test("merge-on-read tables keep their delete semantics through the catalog path") {
    val loc = IcebergFixture.externalNationMorTable(spark, sf)
    server.put(Seq("mor"), "nation", s"$loc/metadata/v1.metadata.json")
    val keys = IceRestCatalog.load(spark, server.uri, Seq("mor"), "nation")
      .select("n_nationkey").collect().map(_.getInt(0)).toSet
    val all = Tables.nation(spark, sf)
      .select("n_nationkey").collect().map(_.getInt(0)).toSet
    assert(keys == all -- Set(2, 7, 11, 14))
  }

  test("updateTable commit: export → commit → loadTable → read round-trip over HTTP") {
    import graft.sources.LogSync
    val root = java.nio.file.Files.createTempDirectory("graft_rest_commit").toString
    def append(n: Int, tag: String): Unit = {
      Tables.events(spark, sf).limit(n)
        .select(col("ts").as("timestamp"),
          concat(lit(tag), col("user_id") % 2).as("service_name"),
          col("props").as("body"))
        .write.partitionBy("service_name").mode("append").parquet(root)
      assert(LogSync.sync(spark, root) >= 1)
    }
    append(100, "c")
    IcebergExport.export(spark, root)
    assert(send("POST", "/v1/namespaces", """{"namespace":["commit"]}""")._1 == 200)
    // register the INITIAL export through the REST register endpoint
    val hint = java.nio.file.Files.readString(
      java.nio.file.Path.of(s"$root/_iceberg/metadata/version-hint.text")).trim.toInt
    assert(send("POST", "/v1/namespaces/commit/register",
      s"""{"name":"logs","metadata-location":"$root/_iceberg/metadata/v$hint.metadata.json"}""")
      ._1 == 200)
    val n1 = IceRestCatalog.load(spark, server.uri, Seq("commit"), "logs").count()
    assert(n1 == 100)

    // grow the lake, export the delta snapshot locally, COMMIT it
    // through the catalog (the `ice insert` flow)
    append(60, "d")
    IcebergExport.export(spark, root)
    val committedLoc = IceRestCatalog.commitExportedSnapshot(
      spark, server.uri, Seq("commit"), "logs", root)
    // the catalog wrote the canonical next version and re-pointed
    assert(committedLoc != s"$root/_iceberg/metadata/v$hint.metadata.json")
    val lt = IcebergJson.parse(send("GET", "/v1/namespaces/commit/tables/logs")._2)
    assert(lt("metadata-location").str == committedLoc)
    // loadTable → scan sees the appended rows
    assert(IceRestCatalog.load(spark, server.uri, Seq("commit"), "logs").count() == 160)
    // the committed metadata retains history: old + new snapshot
    assert(lt("metadata")("snapshots").arr.length == 2)
    assert(lt("metadata").opt("snapshot-log").exists(_.arr.nonEmpty))

    // optimistic concurrency: replaying the SAME commit must 409 —
    // ref main moved past the asserted parent
    val e = intercept[IllegalArgumentException] {
      IceRestCatalog.commitExportedSnapshot(
        spark, server.uri, Seq("commit"), "logs", root)
    }
    assert(e.getMessage.contains("409"), s"replayed commit must 409: ${e.getMessage}")

    // unknown update actions are the client's 400, never silently applied
    val bad = send("POST", "/v1/namespaces/commit/tables/logs",
      """{"requirements":[],"updates":[{"action":"upgrade-format-version","format-version":3}]}""")
    assert(bad._1 == 400 && bad._2.contains("unsupported update action"), bad.toString)
    // unknown requirement types likewise
    val badReq = send("POST", "/v1/namespaces/commit/tables/logs",
      """{"requirements":[{"type":"assert-default-spec-id","default-spec-id":0}],"updates":[]}""")
    assert(badReq._1 == 400, badReq.toString)
  }

  test("the contract query topology: lake export registered and re-read live") {
    val df = graft.operators.LakeAnalytics.icebergRestSeverity(spark, sf)
    val direct = graft.operators.LakeAnalytics.severityByService(spark, sf)
    assert(df.collect().map(_.toSeq).toSeq == direct.collect().map(_.toSeq).toSeq,
      "REST-catalog read must equal the direct lake aggregate row-for-row")
  }
}
