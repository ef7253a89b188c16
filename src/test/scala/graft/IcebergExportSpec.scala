package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.functions._

import graft.sources.{IcebergExport, IcebergJson, LogSync, Tables}

/** The exported Iceberg metadata is validated at the FORMAT level by
  * reading the Avro manifests back with the independent Avro library
  * (container framing, schemas, field-ids) and cross-checking every
  * count/path/partition value against the lake's own manifest — the
  * strongest check available without an Iceberg client in the
  * container (zero egress).
  */
class IcebergExportSpec extends SparkSpec {

  private def avroRecords(path: String): (Seq[GenericRecord], Map[String, String]) = {
    val f = new java.io.File(path.replaceFirst("^file:/+", "/"))
    val r = new DataFileReader[GenericRecord](f, new GenericDatumReader[GenericRecord]())
    try {
      val metaKeys = r.getMetaKeys.asScala.toSeq
        .filterNot(_.startsWith("avro.")) // container-internal keys
      val meta = metaKeys.map(k => k -> r.getMetaString(k)).toMap
      (Iterator.continually(r).takeWhile(_ => r.hasNext).map(_.next()).toList, meta)
    } finally r.close()
  }

  private def readText(p: org.apache.hadoop.fs.Path): String = {
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private def buildLake(): String = {
    val root = Files.createTempDirectory("graft_iceberg").toString
    Tables.events(spark, sf).limit(300)
      .select(col("ts").as("timestamp"),
        concat(lit("s"), col("user_id") % 3).as("service_name"),
        col("props").as("body"))
      .write.partitionBy("service_name").mode("append").parquet(root)
    assert(LogSync.sync(spark, root) >= 1)
    root
  }

  test("export writes spec-shaped v2 metadata; avro manifests round-trip and match the lake") {
    val root = buildLake()
    val mdPath = IcebergExport.export(spark, root)
    val fsRoot = new java.io.File(root)
    val metaDir = new java.io.File(fsRoot, "_iceberg/metadata")
    // version pointer (HadoopCatalog convention)
    val hint = new String(Files.readAllBytes(
      new java.io.File(metaDir, "version-hint.text").toPath), "UTF-8")
    assert(hint == "1")
    val md = new String(Files.readAllBytes(
      new java.io.File(metaDir, "v1.metadata.json").toPath), "UTF-8")
    assert(mdPath.endsWith("v1.metadata.json"))
    assert(md.contains("\"format-version\":2"))
    assert(md.contains("\"current-snapshot-id\""))
    assert(md.contains("schema.name-mapping.default"),
      "Spark parquet has no field-ids; the name mapping is mandatory for real readers")
    assert(md.contains("\"transform\":\"identity\"") && md.contains("\"service_name\""),
      "hive service_name= dirs must export as an identity partition field")
    // follow the snapshot's manifest list
    val listPath = "\"manifest-list\":\"([^\"]+)\"".r
      .findFirstMatchIn(md).map(_.group(1)).getOrElse(fail("no manifest-list in metadata"))
    val (listEntries, listMeta) = avroRecords(listPath)
    assert(listMeta("format-version") == "2")
    assert(listEntries.length == 1)
    val activeFiles = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).collect()
    assert(listEntries.head.get("added_data_files_count").asInstanceOf[Int]
      == activeFiles.length)
    val tableRows = LogSync.table(spark, root).count()
    assert(listEntries.head.get("added_rows_count").asInstanceOf[Long] == tableRows,
      "manifest-list row count must equal the actual table count")
    // follow the manifest: one ADDED entry per active file, paths and
    // partition values matching the lake manifest
    val manifestPath = listEntries.head.get("manifest_path").toString
    val (entries, mMeta) = avroRecords(manifestPath)
    assert(mMeta("format-version") == "2" && mMeta("content") == "data")
    assert(mMeta("schema").contains("\"schema-id\":0"))
    assert(entries.length == activeFiles.length)
    val wantPaths = activeFiles.map(r =>
      r.getAs[String]("path").replaceFirst("^[a-zA-Z0-9.+-]+:/+", "/")).toSet
    var rowSum = 0L
    entries.foreach { e =>
      assert(e.get("status").asInstanceOf[Int] == 1) // ADDED
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      val p = df.get("file_path").toString.replaceFirst("^file:/+", "/")
      assert(wantPaths.contains(p), s"exported $p not an active lake file")
      assert(df.get("file_format").toString == "PARQUET")
      val part = df.get("partition").asInstanceOf[GenericRecord]
      val svc = part.get("service_name").toString
      assert(p.contains(s"service_name=$svc"),
        "identity partition value must equal the file's hive dir value")
      rowSum += df.get("record_count").asInstanceOf[Long]
    }
    assert(rowSum == tableRows, "per-file footer row counts must sum to the table count")
    // re-export bumps the metadata version, pointer follows
    IcebergExport.export(spark, root)
    assert(new String(Files.readAllBytes(
      new java.io.File(metaDir, "version-hint.text").toPath), "UTF-8") == "2")
    assert(new java.io.File(metaDir, "v2.metadata.json").exists())
    // the export dir is invisible to graft's own readers
    assert(LogSync.table(spark, root).count() == tableRows)
    assert(LogSync.sync(spark, root) == 0,
      "export metadata must never be re-registered as data")
  }

  test("schema evolution: export carries the UNION schema, not the first file's") {
    val root = buildLake()
    // evolve: later files gain a column the originals lack
    Tables.events(spark, sf).limit(50)
      .select(col("ts").as("timestamp"), lit("s9").as("service_name"),
        col("props").as("body"), lit("zone-a").as("deployment_zone"))
      .write.partitionBy("service_name").mode("append").parquet(root)
    assert(LogSync.sync(spark, root) >= 1)
    IcebergExport.export(spark, root)
    val metaDir = new java.io.File(new java.io.File(root), "_iceberg/metadata")
    val v = new String(Files.readAllBytes(
      new java.io.File(metaDir, "version-hint.text").toPath), "UTF-8").trim
    val md = new String(Files.readAllBytes(
      new java.io.File(metaDir, s"v$v.metadata.json").toPath), "UTF-8")
    assert(md.contains("\"deployment_zone\""),
      "a column added by later files must appear in the exported schema")
    assert(md.contains("\"body\""), "original columns stay present")
    // and the read-back path surfaces it (null for pre-evolution rows)
    val t = IcebergExport.readTable(spark, root)
    assert(t.columns.contains("body"))
    assert(t.count() == 350)
  }

  test("incremental export: an append adds one delta manifest and reuses the previous one") {
    val root = buildLake()
    IcebergExport.export(spark, root)
    val metaDir = new java.io.File(new java.io.File(root), "_iceberg/metadata")
    def readMd(v: Int) = new String(Files.readAllBytes(
      new java.io.File(metaDir, s"v$v.metadata.json").toPath), "UTF-8")
    val md1 = readMd(1)
    val list1 = "\"manifest-list\":\"([^\"]+)\"".r
      .findFirstMatchIn(md1).get.group(1)
    val manifest1 = avroRecords(list1)._1.head.get("manifest_path").toString
    val snap1 = "\"current-snapshot-id\":(\\d+)".r.findFirstMatchIn(md1).get.group(1)
    // append new files and re-export
    Tables.events(spark, sf).limit(50)
      .select(col("ts").as("timestamp"), lit("s9").as("service_name"),
        col("props").as("body"))
      .write.partitionBy("service_name").mode("append").parquet(root)
    val added = LogSync.sync(spark, root)
    assert(added >= 1)
    IcebergExport.export(spark, root)
    val md2 = readMd(2)
    // parent chain + retained history
    assert(md2.contains(s""""parent-snapshot-id":$snap1"""),
      "the delta snapshot must chain to the previous one")
    assert("\"snapshot-id\":(\\d+)".r.findAllMatchIn(md2).size >= 2,
      "prior snapshot history must be retained")
    // the CURRENT snapshot's list: the v1 manifest carried verbatim +
    // exactly one new delta manifest holding only the new files
    val lists2 = "\"manifest-list\":\"([^\"]+)\"".r
      .findAllMatchIn(md2).map(_.group(1)).toSeq
    val (entries2, _) = avroRecords(lists2.last)
    assert(entries2.length == 2, "one carried + one delta manifest")
    assert(entries2.head.get("manifest_path").toString == manifest1,
      "the previous manifest must be REUSED, not rewritten")
    assert(entries2.last.get("added_data_files_count").asInstanceOf[Int] == added,
      "the delta manifest must hold only the newly-registered files")
    // read-back through the chain is still the full table
    assert(IcebergExport.readTable(spark, root).count() == 350)
    // a no-change export re-points a new version at the SAME snapshot
    IcebergExport.export(spark, root)
    val md3 = readMd(3)
    def cur(s: String) = "\"current-snapshot-id\":(\\d+)".r.findFirstMatchIn(s).get.group(1)
    assert(cur(md3) == cur(md2), "no-change export must not mint a snapshot")
    assert(new String(Files.readAllBytes(
      new java.io.File(metaDir, "version-hint.text").toPath), "UTF-8") == "3")
    // a REMOVAL (DML rewrite drops files) falls back to a restatement
    assert(graft.sources.LakeDml.delete(spark, root,
      col("service_name") === "s9").filesRemoved >= 1)
    IcebergExport.export(spark, root)
    val md4 = readMd(4)
    assert(md4.contains("\"operation\":\"overwrite\""),
      "file removal must surface as a restated overwrite snapshot")
    assert(IcebergExport.readTable(spark, root).count()
      == LogSync.table(spark, root).count())
  }

  test("partition-spec evolution: a layout flip mints a new spec, keeps history, reads coalesced") {
    import graft.sources.LogWriter
    val root = Files.createTempDirectory("graft_specevo").toString
    val base = Tables.events(spark, sf).orderBy("event_id").limit(120)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit("e"), col("event_id")).as("span_id"),
        col("props").as("body"))
    LogWriter.write(base, root, layout = LogWriter.HourlyLayout)
    LogSync.sync(spark, root)
    IcebergExport.export(spark, root)
    val nHourly = IcebergExport.readTable(spark, root).count()
    assert(nHourly == 120)
    // the layout flip: hour becomes a DATA column, day stays a dir
    LogWriter.write(base.withColumn("span_id", concat(lit("d"), col("span_id")))
        .withColumn("severity_text", lit("daily")),
      root, layout = LogWriter.DailyLayout)
    LogSync.sync(spark, root)
    IcebergExport.export(spark, root)

    val hint = new org.apache.hadoop.fs.Path(s"$root/_iceberg/metadata/version-hint.text")
    val md = IcebergJson.parse(readText(new org.apache.hadoop.fs.Path(
      s"$root/_iceberg/metadata/v${readText(hint).trim.toInt}.metadata.json")))
    val specs = md("partition-specs").arr
      .map(s => s("spec-id").long.toInt -> s("fields").arr.map(_("name").str))
    // spec 0 = hourly generation; spec 2 = daily (1 is reserved for
    // deletes); default moved to the newest generation
    assert(specs.toMap.get(0).exists(_.contains("hour")),
      s"hourly spec must survive: $specs")
    assert(specs.toMap.get(2).exists(ns => !ns.contains("hour") && ns.contains("day")),
      s"daily spec must mint id 2: $specs")
    assert(md("default-spec-id").long.toInt == 2)
    // partition-field ids are REUSED by name across specs
    val fieldIdOf = md("partition-specs").arr.flatMap(s =>
      s("fields").arr.map(f => (s("spec-id").long.toInt, f("name").str) -> f("field-id").long))
      .toMap
    assert(fieldIdOf((0, "day")) == fieldIdOf((2, "day")),
      "the same column keeps its partition-field id in every spec")
    // history retained: the flip was a DELTA, not a restatement
    assert(md("snapshots").arr.length == 2)

    // the mixed chain reads as one table; hour resolves from DIRS for
    // the hourly generation and from the DATA column for the daily one
    val t = IcebergExport.readTable(spark, root)
    assert(t.count() == 240)
    val wrongHour = t.filter(
      col("hour").cast("int") =!= hour(col("timestamp"))).count()
    assert(wrongHour == 0, s"hour must coalesce correctly per generation: $wrongHour")
    assert(t.filter(col("severity_text") === "daily").count() == 120)
    // time travel to the pre-flip snapshot still resolves spec 0
    val first = IcebergExport.snapshots(spark, root).find(_._3.isEmpty).get
    assert(IcebergExport.readTable(spark, root,
      Some(IcebergExport.BySnapshotId(first._1))).count() == 120)

    // MULTI-SPEC + OVER-CAP: the hardest plan shape — no driver file
    // list, per-manifest specs resolved in the distributed walk, the
    // hour column coalesced map-over-data per generation, and the
    // identity-completion footer probed via a manifest whose spec
    // doesn't bind it. Must agree row-for-row with the explicit plan.
    def rows() = IcebergExport.readTable(spark, root)
      .select(col("timestamp"), col("severity_text"), col("hour").cast("int"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val explicitRows = rows()
    spark.conf.set("graft.chain.explicitFileCap", "0")
    try assert(rows() == explicitRows,
      "the over-cap multi-spec plan must equal the explicit-path plan")
    finally spark.conf.unset("graft.chain.explicitFileCap")
  }

  test("expireMetadata: bounded metadata, trimmed history, current chain untouched") {
    val root = buildLake()
    IcebergExport.export(spark, root)
    // three more incremental exports, each after an append
    for (i <- 0 until 3) {
      Tables.events(spark, sf).limit(20)
        .select(col("ts").as("timestamp"), lit(s"sx$i").as("service_name"),
          col("props").as("body"))
        .write.partitionBy("service_name").mode("append").parquet(root)
      assert(LogSync.sync(spark, root) >= 1)
      IcebergExport.export(spark, root)
    }
    val metaDir = new java.io.File(new java.io.File(root), "_iceberg/metadata")
    def versions = metaDir.listFiles.map(_.getName)
      .filter(_.matches("v[0-9]+\\.metadata\\.json")).sorted.toSeq
    def avros = metaDir.listFiles.map(_.getName).count(_.endsWith(".avro"))
    assert(versions.size == 4 && IcebergExport.snapshots(spark, root).size == 4)
    val totalBefore = IcebergExport.readTable(spark, root).count()
    val avrosBefore = avros

    val stats = IcebergExport.expireMetadata(spark, root,
      keepMetadataVersions = 1, keepSnapshots = 1)
    // snapshot trim wrote v5; expiry keeps only it
    assert(stats.snapshotsDropped == 3)
    assert(versions == Seq("v5.metadata.json"), versions.toString)
    assert(IcebergExport.snapshots(spark, root).size == 1)
    // the current snapshot's manifest-list carries every DATA manifest
    // forward (incremental chain), so the manifests all survive; the
    // three superseded snapshots' manifest-LISTS are the orphans
    assert(stats.avroDeleted == 3, stats.toString)
    assert(avros == avrosBefore - stats.avroDeleted)
    // the data surface is untouched
    assert(IcebergExport.readTable(spark, root).count() == totalBefore)
    assert(LogSync.table(spark, root).count() == totalBefore)
    // the export lifecycle continues: another append lands as a DELTA
    // on the trimmed chain
    Tables.events(spark, sf).limit(10)
      .select(col("ts").as("timestamp"), lit("sx9").as("service_name"),
        col("props").as("body"))
      .write.partitionBy("service_name").mode("append").parquet(root)
    assert(LogSync.sync(spark, root) >= 1)
    IcebergExport.export(spark, root)
    assert(IcebergExport.readTable(spark, root).count() == totalBefore + 10)
    assert(IcebergExport.snapshots(spark, root).size == 2,
      "post-expiry export must chain a delta onto the trimmed history")
  }

  test("partition transforms: the spec set resolves; unknown transforms reject loudly") {
    def mdFor(transform: String): String = {
      val loc = Files.createTempDirectory("graft_ice_tr").toString
      new java.io.File(s"$loc/metadata").mkdirs()
      val md =
        s"""{"format-version":1,"table-uuid":"u","location":"file://$loc",
           |"last-updated-ms":1,"last-column-id":1,
           |"schema":{"type":"struct","fields":[
           |{"id":1,"name":"k","required":false,"type":"int"}]},
           |"partition-spec":[{"name":"k_p","transform":"$transform",
           |"source-id":1,"field-id":1000}],
           |"properties":{},"current-snapshot-id":-1,"snapshots":[]}""".stripMargin
      Files.write(new java.io.File(s"$loc/metadata/v1.metadata.json").toPath,
        md.getBytes("UTF-8"))
      loc
    }
    // the whole spec transform set resolves (empty tables read as
    // zero typed rows — the transform no longer gates the open)
    Seq("identity", "day", "hour", "month", "year", "bucket[4]",
        "truncate[10]", "void").foreach { tr =>
      assert(IcebergExport.readExternal(spark, mdFor(tr)).count() == 0,
        s"transform '$tr' must resolve")
    }
    // an unknown transform would surface wrong rows — loud rejection
    val e = intercept[Exception] { IcebergExport.readExternal(spark, mdFor("zorder")) }
    assert(e.getMessage.contains("unknown partition transform"),
      s"unknown transform must reject loudly, got: ${e.getMessage}")
  }

  test("day-transform table: no phantom partition column; exactly the snapshot's rows") {
    val loc = graft.sources.IcebergFixture.externalDayPartitionedTable(spark, sf)
    val t = IcebergExport.readExternal(spark, loc)
    assert(!t.columns.contains("ts_day"),
      "a transformed field must NOT attach as a data column")
    val direct = Tables.events(spark, sf)
      .filter(to_date(col("ts")).between("2024-01-12", "2024-01-13"))
    assert(t.count() == direct.count())
    assert(t.select(sum(col("event_id"))).head.getLong(0) ==
      direct.select(sum(col("event_id"))).head.getLong(0))
  }

  test("bucket transform: the spec's murmur3 vectors; the expression buckets rows") {
    import graft.sources.IcebergBucketOps
    // the Iceberg spec's published hash vectors (Appendix B)
    assert(IcebergBucketOps.hashLong(34L) == 2017239379)
    assert(IcebergBucketOps.murmur3("iceberg".getBytes("UTF-8")) == 1210000089)
    assert(IcebergBucketOps.hashLong(
      java.time.LocalDate.parse("2017-11-16").toEpochDay) == -653330422)
    assert(IcebergBucketOps.hashLong(1510871468000000L) == -2047944441)
    // the codegen'd expression over int/long/string columns
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    val r = Seq((34, 34L, "iceberg")).toDF("i", "l", "s")
      .selectExpr("graft_iceberg_bucket(i, 16) AS bi",
        "graft_iceberg_bucket(l, 16) AS bl",
        "graft_iceberg_bucket(s, 16) AS bs").head
    assert(r.getInt(0) == (2017239379 & Int.MaxValue) % 16)
    assert(r.getInt(1) == r.getInt(0), "int and long 34 must land in one bucket")
    assert(r.getInt(2) == (1210000089 & Int.MaxValue) % 16)
  }

  test("readExternalPruned: partition values prune files before the scan") {
    val loc = graft.sources.IcebergFixture.externalDayPartitionedTable(spark, sf)
    val day1 = java.time.LocalDate.parse("2024-01-12").toEpochDay.toInt
    val pruned = IcebergExport.readExternalPruned(spark, loc,
      keep = pv => pv.get("ts_day").forall(_ == day1))
    val direct = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === lit("2024-01-12"))
    assert(pruned.count() == direct.count(),
      "pruning to day 1 must surface exactly day 1's rows")
    assert(pruned.select(to_date(col("ts"))).distinct().count() == 1)
    // pruning everything reads as an empty, correctly-typed frame
    assert(IcebergExport.readExternalPruned(spark, loc, _ => false).count() == 0)
  }

  test("merge-on-read: a delete scoped on a day-transform partition evaluates the transform") {
    val loc = graft.sources.IcebergFixture.externalDayScopedDeleteTable(spark)
    val rows = IcebergExport.readExternal(spark, loc)
      .select(col("id"), to_date(col("ts")).cast("string").as("day"))
      .collect().map(r => (r.getAs[String]("day"), r.getAs[Int]("id"))).toSet
    // the delete (id=2, scoped ts_day=2024-01-12) removes only day 1's
    // id=2; day 2's id=2 must survive
    assert(rows == Set(("2024-01-12", 1), ("2024-01-12", 3),
      ("2024-01-13", 1), ("2024-01-13", 2), ("2024-01-13", 3)),
      s"day-scoped delete applied wrongly: $rows")
  }

  test("readExternal: an empty table (current-snapshot-id -1) reads as zero typed rows") {
    val loc = Files.createTempDirectory("graft_ice_empty").toString
    new java.io.File(s"$loc/metadata").mkdirs()
    val md =
      s"""{"format-version":2,"table-uuid":"u","location":"file://$loc",
         |"last-sequence-number":0,"last-updated-ms":1,"last-column-id":2,
         |"current-schema-id":0,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"k","required":false,"type":"long"},
         |{"id":2,"name":"v","required":false,"type":"string"}]}],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
         |"last-partition-id":999,"properties":{},
         |"current-snapshot-id":-1,"snapshots":[]}""".stripMargin
    Files.write(new java.io.File(s"$loc/metadata/v1.metadata.json").toPath,
      md.getBytes("UTF-8"))
    val t = IcebergExport.readExternal(spark, loc)
    assert(t.count() == 0)
    assert(t.schema.map(f => f.name -> f.dataType.typeName).toSeq
      == Seq("k" -> "long", "v" -> "string"))
  }

  test("time travel: a retained snapshot reads its own file set; bad anchors reject") {
    val root = buildLake()
    IcebergExport.export(spark, root)
    val n1 = LogSync.table(spark, root).count()
    // grow the lake; second export is an incremental delta snapshot
    Tables.events(spark, sf).limit(50)
      .select(col("ts").as("timestamp"), lit("s9").as("service_name"),
        col("props").as("body"))
      .write.partitionBy("service_name").mode("append").parquet(root)
    assert(LogSync.sync(spark, root) >= 1)
    IcebergExport.export(spark, root)
    val snaps = IcebergExport.snapshots(spark, root)
    assert(snaps.length == 2)
    val first = snaps.find(_._3.isEmpty).get
    val second = snaps.find(_._3.nonEmpty).get
    assert(second._3.contains(first._1), "delta must chain to the root snapshot")
    // anchored read at the old snapshot = the pre-append table
    assert(IcebergExport.readTable(spark, root,
      Some(IcebergExport.BySnapshotId(first._1))).count() == n1)
    // current read (and the explicit current id) = the grown table
    assert(IcebergExport.readTable(spark, root).count() == n1 + 50)
    assert(IcebergExport.readTable(spark, root,
      Some(IcebergExport.BySnapshotId(second._1))).count() == n1 + 50)
    // timestamp anchor: at-or-after the second commit = current
    assert(IcebergExport.readTable(spark, root,
      Some(IcebergExport.AsOfTimestampMs(second._2))).count() == n1 + 50)
    // unknown snapshot id and a too-early timestamp reject loudly
    assert(intercept[Exception] {
      IcebergExport.readTable(spark, root, Some(IcebergExport.BySnapshotId(42L)))
    }.getMessage.contains("not retained"))
    assert(intercept[Exception] {
      IcebergExport.readTable(spark, root,
        Some(IcebergExport.AsOfTimestampMs(first._2 - 1)))
    }.getMessage.contains("no snapshot at or before"))
  }

  test("merge-on-read: position, equality, and sequence-stale deletes apply per spec") {
    val loc = graft.sources.IcebergFixture.externalNationMorTable(spark, sf)
    val t = IcebergExport.readExternal(spark, loc)
    // helper columns never leak into the surfaced schema
    assert(t.columns.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    val keys = t.select("n_nationkey").collect().map(_.getInt(0)).toSet
    val all = Tables.nation(spark, sf)
      .select("n_nationkey").collect().map(_.getInt(0)).toSet
    assert(keys == all -- Set(2, 7, 11, 14),
      s"expected exactly keys {2,7,11,14} deleted; got ${(all -- keys).toSeq.sorted}")
    // the stale equality delete (sequence == data sequence) names key
    // 20: the strictly-greater rule must keep it
    assert(keys.contains(20), "stale equality delete wrongly applied")
    // position deletes are FILE-scoped: file B (keys >= 13) holds rows
    // at the same ordinals the delete names in file A — all of file B
    // except the equality-deleted key 14 must survive
    assert((all.filter(_ >= 13) - 14).subsetOf(keys),
      "position deletes leaked beyond their target file")
    // surviving rows are untouched (no column corruption through the
    // anti-join chain)
    val row = t.filter(col("n_nationkey") === 20).collect()
    assert(row.length == 1 && row.head.getAs[String]("n_name").startsWith("NATION"))
  }

  test("merge-on-read: a partition-scoped equality delete touches only its partition") {
    val loc = graft.sources.IcebergFixture.externalScopedDeleteTable(spark)
    val rows = IcebergExport.readExternal(spark, loc)
      .collect().map(r => (r.getAs[Int]("grp"), r.getAs[Int]("id"))).toSet
    // the delete (id=2, scoped grp=1) must remove (1,2) and NOTHING in grp=2
    assert(rows == Set((1, 1), (1, 3), (2, 1), (2, 2), (2, 3)),
      s"partition-scoped delete leaked: $rows")
  }

  test("readTable: the Iceberg-metadata read path surfaces exactly the registered table") {
    val root = buildLake()
    IcebergExport.export(spark, root)
    val viaIceberg = IcebergExport.readTable(spark, root)
    val direct = LogSync.table(spark, root)
    assert(viaIceberg.count() == direct.count())
    val a = viaIceberg.select("timestamp", "service_name", "body")
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = direct.select("timestamp", "service_name", "body")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq, "iceberg-chain read must equal the manifest read row-for-row")
    // partition columns survive the read path (basePath discovery)
    assert(viaIceberg.columns.contains("service_name"))
  }

  test("field-id sidecar: steady-state eq commits resolve ids and types with no footer merge") {
    import graft.sources.LakeDml
    import spark.implicits._
    val root = Files.createTempDirectory("graft_sidecarfast").toString
    Tables.events(spark, sf).orderBy(col("event_id")).limit(50)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit("e"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .coalesce(2).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    // no sidecar yet — the fast path must decline, not guess
    assert(IcebergExport.fieldInfoFromSidecar(spark, root, Seq("span_id")).isEmpty)
    // the first commit takes the merged-schema fallback and leaves a
    // typed sidecar behind
    val ids = LogSync.table(spark, root)
      .select("span_id").as[String].collect().sorted.toSeq
    LakeDml.deleteEq(spark, root, Seq(ids.head).toDF("span_id"))
    val info = IcebergExport.fieldInfoFromSidecar(spark, root,
      Seq("span_id", "timestamp"))
    assert(info.nonEmpty, "one commit must populate the typed sidecar")
    assert(info.get("span_id")._1 ==
      IcebergExport.exportFieldIds(spark, root)("span_id"),
      "sidecar ids must equal the merged-schema assignment")
    assert(info.get("span_id")._2 ==
      org.apache.spark.sql.types.StringType)
    assert(info.get("timestamp")._2 ==
      org.apache.spark.sql.types.TimestampType)
    // an unknown column still declines to the fallback
    assert(IcebergExport.fieldInfoFromSidecar(spark, root, Seq("nope")).isEmpty)
    // the steady-state commit (sidecar path) behaves identically
    LakeDml.deleteEq(spark, root, Seq(ids(1)).toDF("span_id"))
    assert(LogSync.table(spark, root).count() == 48)
    assert(LogSync.table(spark, root)
      .filter(col("span_id").isin(ids.take(2): _*)).count() == 0)
  }

  test("schema evolution: delta export bumps schema-id, old snapshots keep theirs, ids never move") {
    val root = Files.createTempDirectory("graft_schemaevo").toString
    Tables.events(spark, sf).limit(100)
      .select(col("ts").as("timestamp"), lit("s0").as("service_name"),
        col("props").as("body"))
      .coalesce(1).write.mode("append").parquet(root)
    assert(LogSync.sync(spark, root) >= 1)
    IcebergExport.export(spark, root)
    // the converter starts emitting a new column; the next export is
    // an incremental DELTA over an evolved union schema
    Tables.events(spark, sf).limit(60)
      .select(col("ts").as("timestamp"), lit("s1").as("service_name"),
        col("props").as("body"), lit("v2").as("deploy_id"))
      .coalesce(1).write.mode("append").parquet(root)
    assert(LogSync.sync(spark, root) >= 1)
    IcebergExport.export(spark, root)

    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readText(p: org.apache.hadoop.fs.Path): String = {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    val metaDir = new org.apache.hadoop.fs.Path(s"$root/_iceberg/metadata")
    val hint = readText(new org.apache.hadoop.fs.Path(metaDir, "version-hint.text")).trim
    val md = IcebergJson.parse(readText(
      new org.apache.hadoop.fs.Path(metaDir, s"v$hint.metadata.json")))

    // the schema HISTORY: two entries, the evolved one current
    val schemas = md("schemas").arr
    assert(schemas.length == 2, s"expected a schemas history, got ${schemas.length}")
    assert(md("current-schema-id").long == 1L)
    def idsOf(s: IcebergJson.V): Map[String, Long] =
      s("fields").arr.map(f => f("name").str -> f("id").long).toMap
    val bySid = schemas.map(s => s("schema-id").long -> idsOf(s)).toMap
    assert(!bySid(0L).contains("deploy_id") && bySid(1L).contains("deploy_id"))
    // ids of the shared columns are IDENTICAL across entries — the
    // sidecar guarantee an id-binding delete reader depends on
    bySid(0L).foreach { case (n, id) =>
      assert(bySid(1L)(n) == id, s"field id of '$n' moved across evolution")
    }
    // each snapshot claims the schema it was exported under
    val snapSchemaIds = md("snapshots").arr
      .sortBy(_("sequence-number").long).map(_("schema-id").long)
    assert(snapSchemaIds == Vector(0L, 1L),
      s"old snapshots must keep their schema-id: $snapSchemaIds")
    // time travel through the pre-evolution snapshot reads exactly
    // the old rows; the current read carries the union schema
    val first = IcebergExport.snapshots(spark, root).find(_._3.isEmpty).get
    assert(IcebergExport.readTable(spark, root,
      Some(IcebergExport.BySnapshotId(first._1))).count() == 100)
    val cur = IcebergExport.readTable(spark, root)
    assert(cur.count() == 160 && cur.columns.contains("deploy_id"))
    assert(cur.filter(col("deploy_id").isNull).count() == 100,
      "pre-evolution rows surface null for the late column")
    // the sidecar itself is append-only on disk
    val sidecar = readText(IcebergExport.fieldIdSidecarCurrent(spark, root)._2)
    assert(sidecar.contains("deploy_id\t"),
      s"late column must be appended to the persisted id map: $sidecar")
  }

  test("explicitFileCap 0: the over-cap plan (root scan + distributed attach join) agrees row-for-row") {
    val root = buildLake()
    IcebergExport.export(spark, root)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("timestamp", "service_name", "body")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val explicit = rows(IcebergExport.readTable(spark, root))
    assert(explicit.nonEmpty)
    spark.conf.set("graft.chain.explicitFileCap", "0")
    try {
      // over-cap: no driver-side path list, no forced broadcast — the
      // scan is the table location restricted by the attach inner join
      assert(rows(IcebergExport.readTable(spark, root)) == explicit,
        "over-cap chain read must equal the explicit-path read row-for-row")
      // the pruned read ships its predicate INTO the distributed walk
      // (no driver file list to filter) and agrees with the explicit
      // driver-side prune
      val loc = graft.sources.IcebergFixture.externalDayPartitionedTable(spark, sf)
      val day1 = java.time.LocalDate.parse("2024-01-12").toEpochDay.toInt
      def prunedCount() = IcebergExport.readExternalPruned(spark, loc,
        keep = pv => pv.get("ts_day").forall(_ == day1)).count()
      val overCapPruned = prunedCount()
      spark.conf.unset("graft.chain.explicitFileCap")
      assert(prunedCount() == overCapPruned,
        "distributed over-cap prune must equal the driver-side prune")
      spark.conf.set("graft.chain.explicitFileCap", "0")
      // prune-everything at over-cap reads as an empty typed frame
      assert(IcebergExport.readExternalPruned(spark, loc, _ => false).count() == 0)
    } finally spark.conf.unset("graft.chain.explicitFileCap")
  }

  test("over-cap pruned read opens ONLY the kept files once the kept set fits prunedKeptFileCap") {
    val loc = graft.sources.IcebergFixture.externalDayPartitionedTable(spark, sf)
    val day1 = java.time.LocalDate.parse("2024-01-12").toEpochDay.toInt
    def keep(pv: Map[String, Any]): Boolean = pv.get("ts_day").forall(_ == day1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "ts").collect().map(_.toSeq).sortBy(_.toString).toSeq
    // reference: the under-cap plan (driver-side prune, explicit paths)
    val expected = rows(IcebergExport.readExternalPruned(spark, loc, keep))
    assert(expected.nonEmpty)
    spark.conf.set("graft.chain.explicitFileCap", "0")
    try {
      // prunedKeptFileCap defaults to the file cap (0 here): the kept
      // set cannot come back to the driver, so the read stays the
      // row-correct location scan — it OPENS both day files
      val fallback = IcebergExport.readExternalPruned(spark, loc, keep)
      assert(fallback.inputFiles.count(_.endsWith(".parquet")) == 2,
        "past both caps the scan is the location root: row-correct, unpruned I/O")
      assert(rows(fallback) == expected)
      // with room for the kept set, the SAME read becomes an
      // explicit-path scan of exactly the kept files — real I/O pruning
      spark.conf.set("graft.chain.prunedKeptFileCap", "10")
      val ioPruned = IcebergExport.readExternalPruned(spark, loc, keep)
      val opened = ioPruned.inputFiles.filter(_.endsWith(".parquet"))
      assert(opened.length == 1 && opened.head.contains("d2024-01-12.parquet"),
        s"kept-set scan must open only day 1's file, opened: ${opened.toSeq}")
      assert(rows(ioPruned) == expected,
        "the I/O-pruned plan must agree row-for-row with the explicit-path prune")
      // prune-everything: an empty kept set is a typed empty frame
      // that opens nothing
      val none = IcebergExport.readExternalPruned(spark, loc, _ => false)
      assert(none.count() == 0 && none.inputFiles.isEmpty)
      assert(none.columns.contains("event_id"))
    } finally {
      spark.conf.unset("graft.chain.explicitFileCap")
      spark.conf.unset("graft.chain.prunedKeptFileCap")
    }
  }

  test("explicitFileCap 0: export's delta diff resolves the previous chain UNCAPPED — no re-chaining") {
    val root = buildLake()
    IcebergExport.export(spark, root)
    // grow the lake and export the delta while the READ cap is 0: the
    // diff against the previous snapshot must still see its full file
    // set (an over-cap prev would read as "everything is new" and the
    // delta would list every old file twice — every row duplicated)
    Tables.events(spark, sf).limit(40)
      .select(col("ts").as("timestamp"), lit("s9").as("service_name"),
        col("props").as("body"))
      .write.partitionBy("service_name").mode("append").parquet(root)
    assert(LogSync.sync(spark, root) >= 1)
    spark.conf.set("graft.chain.explicitFileCap", "0")
    try {
      IcebergExport.export(spark, root)
      val direct = LogSync.table(spark, root).count()
      assert(IcebergExport.readTable(spark, root).count() == direct,
        "a delta exported under the read cap must not duplicate rows")
      // and it stayed a DELTA (history retained), not a restatement
      assert(IcebergExport.snapshots(spark, root).length == 2)
    } finally spark.conf.unset("graft.chain.explicitFileCap")
  }

  test("explicitFileCap 0 + merge-on-read: deletes apply identically on the over-cap plan") {
    val loc = graft.sources.IcebergFixture.externalNationMorTable(spark, sf)
    def keys() = IcebergExport.readExternal(spark, loc)
      .select("n_nationkey").collect().map(_.getInt(0)).toSet
    val explicit = keys()
    spark.conf.set("graft.chain.explicitFileCap", "0")
    try assert(keys() == explicit,
      "over-cap MOR read must surface exactly the explicit-path survivors")
    finally spark.conf.unset("graft.chain.explicitFileCap")
  }

  test("attach-map broadcast is seqBroadcastRowCap-guarded: the shuffle-join plan agrees") {
    val root = buildLake()
    IcebergExport.export(spark, root)
    // readChain directly: readTable's lake-scan fast path never builds
    // the attach map, and this test is about that join's sizing
    def rows() = IcebergExport.readChain(spark, IcebergExport.resolveChain(
        spark, new org.apache.hadoop.fs.Path(s"$root/_iceberg/metadata")))
      .select("timestamp", "service_name", "body")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val viaBroadcast = rows()
    spark.conf.set("graft.lake.seqBroadcastRowCap", "0")
    try assert(rows() == viaBroadcast,
      "shuffle-join attach must equal the broadcast attach row-for-row")
    finally spark.conf.unset("graft.lake.seqBroadcastRowCap")
  }

  test("a registry rewrite between exports does not force a restatement — deltas keep chaining") {
    // rewriteManifests swaps the LAKE's registry versions but touches
    // no DATA file: the export's carried state binds data-file URIs,
    // so the next export must see zero removed files and chain a
    // plain delta (an O(lake) restatement per registry rewrite would
    // make routine maintenance unaffordable at 100 TB)
    val root = buildLake()
    IcebergExport.export(spark, root)
    assert(IcebergExport.snapshots(spark, root).length == 1)
    val st = graft.sources.LogCompact.rewriteManifests(spark, root)
    assert(st.dataPartsAfter <= st.dataPartsBefore)
    Tables.events(spark, sf).orderBy(col("event_id")).offset(300).limit(50)
      .select(col("ts").as("timestamp"),
        concat(lit("s"), col("user_id") % 3).as("service_name"),
        col("props").as("body"))
      .write.partitionBy("service_name").mode("append").parquet(root)
    assert(LogSync.sync(spark, root) >= 1)
    IcebergExport.export(spark, root)
    assert(IcebergExport.snapshots(spark, root).length == 2,
      "the post-rewrite export must chain as a delta, not restate")
    assert(IcebergExport.readTable(spark, root).count() ==
      LogSync.table(spark, root).count())
  }
}
