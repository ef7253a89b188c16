package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{IcebergExport, LakeDml, LakeEvolve, LogSync, LogWriter, Tables}

/** Id-bound schema evolution: metadata-only rename + widening type
  * promotion, across the native read, DML, CDC and the exported
  * Iceberg chain.
  */
class LakeEvolveSpec extends SparkSpec {

  /** A small 2-file lake shaped like the OTel surface: (severity_text
    * string, severity_number int) are the columns the tests evolve.
    */
  private def freshLake(prefix: String): String = {
    import spark.implicits._
    val root = Files.createTempDirectory(prefix).toString
    Tables.events(spark, sf).orderBy("event_id").limit(80)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"),
        (col("event_id") % 100).cast("int").as("severity_number"),
        concat(lit("e"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .coalesce(2).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    root
  }

  test("rename + promote: metadata-only, values preserved, old files fold in") {
    val root = freshLake("graft_evolve")
    val before = LogSync.table(spark, root)
      .select(col("span_id"), col("severity_text"), col("severity_number"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val dataBefore = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).select("path")
      .collect().map(_.getString(0)).toSet

    LakeEvolve.renameColumn(spark, root, "severity_text", "severity")
    LakeEvolve.promoteColumn(spark, root, "severity_number", LongType)

    val t = LogSync.table(spark, root)
    assert(!t.columns.contains("severity_text") && t.columns.contains("severity"))
    assert(t.schema("severity_number").dataType == LongType)
    val after = t.select(col("span_id"), col("severity"), col("severity_number"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2).toInt)).toSet
    assert(after == before, "evolution must not change a single value")
    // METADATA-ONLY: no data file touched
    val dataAfter = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).select("path")
      .collect().map(_.getString(0)).toSet
    assert(dataAfter == dataBefore, "rename/promote must not rewrite data")

    // forward writes use the new shape; both generations read as one
    import spark.implicits._
    Tables.events(spark, sf).orderBy("event_id").limit(20)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity"),
        (col("event_id") % 100).cast("long").as("severity_number"),
        concat(lit("n"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .coalesce(1).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    val merged = LogSync.table(spark, root)
    assert(merged.count() == 100)
    assert(merged.filter(col("severity").isNull).count() == 0,
      "old files' values must fold into the renamed column")
    // time travel under the current schema (Iceberg's simplification)
    val asOf = LogSync.tableAsOf(spark, root,
      new java.sql.Timestamp(System.currentTimeMillis()))
    assert(asOf.columns.contains("severity"))
  }

  test("guards: layout columns, stat-axis drops, collisions, retired names, narrowing refuse") {
    val root = freshLake("graft_evguard")
    // the zone-map stat axes may RENAME (the binding is the field;
    // see the stat-axis test) but never DROP — retention/pruning
    // would lose their axis
    val d = intercept[IllegalArgumentException] {
      LakeEvolve.dropColumn(spark, root, "timestamp")
    }
    assert(d.getMessage.contains("stat axis"))
    intercept[IllegalArgumentException] {
      LakeEvolve.dropColumn(spark, root, "service_name")
    }
    intercept[IllegalArgumentException] {
      LakeEvolve.renameColumn(spark, root, "severity_text", "body")
    }
    intercept[IllegalArgumentException] {
      LakeEvolve.promoteColumn(spark, root, "severity_number", StringType)
    }
    intercept[IllegalArgumentException] { // narrowing
      LakeEvolve.promoteColumn(spark, root, "severity_number", ShortType)
    }
    // active equality delete binds the column → evolve refuses with
    // the convert-first instruction
    import spark.implicits._
    LakeDml.deleteEq(spark, root, Seq("e1").toDF("span_id"))
    val e = intercept[IllegalArgumentException] {
      LakeEvolve.renameColumn(spark, root, "span_id", "span")
    }
    assert(e.getMessage.contains("convertEqDeletes"))
    // retire it, then the rename goes through — and the RETIRED name
    // stays reserved
    LakeDml.convertEqDeletes(spark, root)
    LakeEvolve.renameColumn(spark, root, "span_id", "span")
    intercept[IllegalArgumentException] {
      LakeEvolve.renameColumn(spark, root, "body", "span_id")
    }
  }

  test("CDC on a renamed column: eq deletes/upserts bind new-name keys to pre-rename rows") {
    import spark.implicits._
    val root = freshLake("graft_evcdc")
    LakeEvolve.renameColumn(spark, root, "severity_text", "severity")
    // keyed retraction via the NEW name must hide rows whose values
    // physically live under the old name
    LakeDml.deleteEq(spark, root, Seq("e3", "e7").toDF("span_id"))
    val t = LogSync.table(spark, root)
    assert(t.filter(col("span_id").isin("e3", "e7")).count() == 0)
    // an upsert keyed on span_id replaces a pre-rename row's severity
    val up = t.filter(col("span_id") === "e5")
      .withColumn("severity", lit("REVISED"))
    LakeDml.upsertEq(spark, root, up, Seq("span_id"))
    val got = LogSync.table(spark, root).filter(col("span_id") === "e5")
      .select("severity").collect().map(_.getString(0)).toSeq
    assert(got == Seq("REVISED"))
    // the changelog surfaces retraction keys under the CURRENT schema
    val dels = LogSync.deletesSince(spark, root,
      new java.sql.Timestamp(0L))
    assert(dels.columns.contains("severity") && !dels.columns.contains("severity_text"))
    assert(dels.filter(col("__delete_kind") === "eq")
      .select("span_id").collect().map(_.getString(0)).toSet == Set("e3", "e7"))
  }

  test("CoW rewrite materializes the evolution; conversion scans fold aliases") {
    import spark.implicits._
    val root = freshLake("graft_evcow")
    LakeEvolve.renameColumn(spark, root, "severity_text", "severity")
    LakeEvolve.promoteColumn(spark, root, "severity_number", LongType)
    val nBefore = LogSync.table(spark, root).count()
    val gone = LogSync.table(spark, root).filter(col("severity") === "error").count()
    assert(gone > 0)
    // CoW delete: the complement re-writes through the evolved read,
    // so the restated files physically carry the new shape
    LakeDml.delete(spark, root, col("severity") === "error")
    val t = LogSync.table(spark, root)
    assert(t.count() == nBefore - gone)
    assert(t.filter(col("severity") === "error").count() == 0)
    val restated = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull && col("op") === "rewrite")
      .select("path").collect().map(_.getString(0))
    assert(restated.nonEmpty)
    val physical = spark.read.parquet(restated: _*).schema
    assert(physical.fieldNames.contains("severity") &&
      !physical.fieldNames.contains("severity_text"),
      "a CoW rewrite must materialize the rename physically")
    assert(physical("severity_number").dataType == LongType)
  }

  test("rename chain a->b->c: every generation's physical name folds into the final") {
    import spark.implicits._
    val root = freshLake("graft_evchain")
    LakeEvolve.renameColumn(spark, root, "severity_text", "sev")
    // a file written under the INTERMEDIATE name — three physical
    // generations now coexist
    Tables.events(spark, sf).orderBy("event_id").limit(10)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        lit("mid-gen").as("sev"),
        (col("event_id") % 100).cast("int").as("severity_number"),
        concat(lit("m"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .coalesce(1).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    LakeEvolve.renameColumn(spark, root, "sev", "severity")
    val t = LogSync.table(spark, root)
    assert(t.columns.contains("severity") &&
      !t.columns.contains("sev") && !t.columns.contains("severity_text"))
    assert(t.count() == 90 && t.filter(col("severity").isNull).count() == 0,
      "all three physical generations must fold into the final name")
    assert(t.filter(col("severity") === "mid-gen").count() == 10)
    // both retired names stay reserved
    intercept[IllegalArgumentException] {
      LakeEvolve.renameColumn(spark, root, "body", "sev")
    }
  }

  test("bloom/token indexes move with a rename — value hashes are rename-invariant") {
    import graft.sources.LakeIndex
    val root = freshLake("graft_evindex")
    // a second single-file batch with a disjoint key prefix, so the
    // bloom probe has something to prune
    Tables.events(spark, sf).orderBy("event_id").limit(20)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"),
        (col("event_id") % 100).cast("int").as("severity_number"),
        concat(lit("z"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .coalesce(1).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    LakeIndex.build(spark, root, "span_id")
    LakeIndex.buildTokens(spark, root, "body")
    val probe = LogSync.table(spark, root).filter(col("span_id") === "e9")
      .count()
    assert(probe == 1)
    LakeEvolve.renameColumn(spark, root, "span_id", "span")
    LakeEvolve.renameColumn(spark, root, "body", "payload")
    // the moved index serves the NEW name: pruning intact, rows found
    val (kept, total) = LakeIndex.pruneCounts(spark, root, "span", Seq("e9"))
    assert(kept < total && kept >= 1,
      s"the moved bloom index must still prune: $kept of $total")
    val hit = LakeIndex.lookup(spark, root, "span", Seq("e9"))
    assert(hit.count() == 1 && hit.columns.contains("span"))
    // token index too: grep by the renamed text column
    val term = LogSync.table(spark, root).select("payload")
      .limit(1).collect()(0).getString(0)
      .toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).head
    assert(LakeIndex.grep(spark, root, "payload", Seq(term)).count() > 0)
  }

  test("historic eq deletes recorded under a retired name still apply to time travel") {
    import spark.implicits._
    val root = freshLake("graft_evhist")
    LakeDml.deleteEq(spark, root, Seq("e2", "e4").toDF("span_id"))
    Thread.sleep(20)
    val mark = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(20)
    // retire the eq delete (conversion tombstones it), THEN rename the
    // key column — the tombstoned entry still binds the OLD name for
    // any time-travel read inside its window
    LakeDml.convertEqDeletes(spark, root)
    LakeEvolve.renameColumn(spark, root, "span_id", "span")
    // SNAPSHOT-SCHEMA semantics: the anchor predates the rename, so
    // the read resolves under the pre-rename schema — the column
    // surfaces as span_id (Iceberg time travel; the deletes still
    // apply through the as-of name map)
    val asOf = LogSync.tableAsOf(spark, root, mark)
    assert(asOf.columns.contains("span_id") && !asOf.columns.contains("span"),
      s"a pre-rename anchor must read the pre-rename schema: ${asOf.columns.toSeq}")
    assert(asOf.filter(col("span_id").isin("e2", "e4")).count() == 0,
      "the eq delete must keep applying at its own-era anchor")
    assert(asOf.count() == 78)
    // an anchor AFTER the rename reads the renamed schema
    val asOfNow = LogSync.tableAsOf(spark, root,
      new java.sql.Timestamp(System.currentTimeMillis()))
    assert(asOfNow.columns.contains("span") && !asOfNow.columns.contains("span_id"))
    // and the current read agrees (position deletes bind by path)
    assert(LogSync.table(spark, root)
      .filter(col("span").isin("e2", "e4")).count() == 0)
    // deletedRowsSince MATERIALIZES the retired-name retraction under
    // the current schema: the pre-delete snapshot (evolved, "span")
    // semi-joins the delete parquet's physical "span_id" keys
    val materialized = LogSync.deletedRowsSince(spark, root,
      new java.sql.Timestamp(0L))
    assert(materialized.columns.contains("span"))
    assert(materialized.filter(col("__delete_kind") === "eq")
      .select("span").collect().map(_.getString(0)).toSet == Set("e2", "e4"))
    assert(materialized.filter(col("body").isNull).count() == 0,
      "materialized retractions carry full pre-delete rows")
  }

  test("dropColumn: metadata-only, name reserved forever, re-adds ignored, registry guard") {
    import spark.implicits._
    val root = freshLake("graft_evdrop")
    val dataBefore = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).select("path")
      .collect().map(_.getString(0)).toSet
    LakeEvolve.dropColumn(spark, root, "body")
    val t = LogSync.table(spark, root)
    assert(!t.columns.contains("body") && t.count() == 80)
    assert(LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).select("path")
      .collect().map(_.getString(0)).toSet == dataBefore,
      "a drop must not touch any data file")
    // time travel reads under the current schema too (the documented
    // Iceberg simplification)
    assert(!LogSync.tableAsOf(spark, root,
      new java.sql.Timestamp(System.currentTimeMillis())).columns.contains("body"))
    // a later file RE-ADDING the name is ignored — old files' stale
    // values must not resurrect through the union
    Tables.events(spark, sf).orderBy("event_id").limit(10)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        lit("late").as("severity_text"),
        (col("event_id") % 100).cast("int").as("severity_number"),
        concat(lit("r"), col("event_id")).as("span_id"),
        lit("REBORN").as("body"))
      .coalesce(1).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    val t2 = LogSync.table(spark, root)
    assert(!t2.columns.contains("body") && t2.count() == 90,
      "a re-added dropped name stays retired")
    // and the name can't come back via rename either
    intercept[IllegalArgumentException] {
      LakeEvolve.renameColumn(spark, root, "severity_text", "body")
    }
    // a drop composes with a rename: dropping the RENAMED column
    // retires its whole chain
    LakeEvolve.renameColumn(spark, root, "severity_text", "severity")
    LakeEvolve.dropColumn(spark, root, "severity")
    val t3 = LogSync.table(spark, root)
    assert(!t3.columns.contains("severity") && !t3.columns.contains("severity_text"))
    assert(t3.count() == 90)
    // registry guard: a lake holding eq-delete rows (even if retired
    // later, they serve time travel until vacuum) refuses the drop
    LakeDml.deleteEq(spark, root, Seq("e1").toDF("span_id"))
    LakeDml.convertEqDeletes(spark, root) // tombstoned, not vacuumed
    val e = intercept[IllegalArgumentException] {
      LakeEvolve.dropColumn(spark, root, "span_id")
    }
    assert(e.getMessage.contains("vacuum"))
  }

  test("exported chain: schema history, name-mapping aliases, external read + time travel") {
    import spark.implicits._
    val root = freshLake("graft_evexport")
    IcebergExport.export(spark, root)
    val firstIds = IcebergExport.exportFieldIds(spark, root)
    LakeEvolve.renameColumn(spark, root, "severity_text", "severity")
    LakeEvolve.promoteColumn(spark, root, "severity_number", LongType)
    // post-evolution append so the delta export carries new files
    Tables.events(spark, sf).orderBy("event_id").limit(20)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity"),
        (col("event_id") % 100).cast("long").as("severity_number"),
        concat(lit("n"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .coalesce(1).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    IcebergExport.export(spark, root)

    // the field id NEVER moved
    val ids = IcebergExport.exportFieldIds(spark, root)
    assert(ids("severity") == firstIds("severity_text"),
      "a rename must keep the field id")
    // two schemas retained; old snapshot keeps the old schema-id; the
    // name-mapping aliases the retired name onto the same id
    val mdPath = IcebergExport.snapshots(spark, root) // forces chain resolution
    assert(mdPath.length == 2)
    val hint = new org.apache.hadoop.fs.Path(s"$root/_iceberg/metadata/version-hint.text")
    val fs = hint.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readText(p: org.apache.hadoop.fs.Path): String = {
      val in = fs.open(p); try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    val md = readText(new org.apache.hadoop.fs.Path(
      s"$root/_iceberg/metadata/v${readText(hint).trim.toInt}.metadata.json"))
    assert(md.contains(""""schema-id":1"""), "evolution must mint a new schema id")
    assert(md.contains("severity_text"), "name-mapping must alias the retired name")

    // current external read: both generations under the new schema
    val cur = IcebergExport.readTable(spark, root)
    assert(cur.count() == 100 && cur.columns.contains("severity"))
    assert(cur.filter(col("severity").isNull).count() == 0)
    assert(cur.schema("severity_number").dataType == LongType)
    // pre-evolution snapshot: SNAPSHOT-SCHEMA time travel — it reads
    // under the schema-id it was exported with (old name, narrow int),
    // not the current one
    val first = mdPath.minBy(_._2)
    val old = IcebergExport.readTable(spark, root,
      Some(IcebergExport.BySnapshotId(first._1)))
    assert(old.count() == 80 && old.columns.contains("severity_text") &&
      !old.columns.contains("severity"),
      s"a pre-rename snapshot must read its own schema: ${old.columns.toSeq}")
    assert(old.filter(col("severity_text").isNull).count() == 0)
    assert(old.schema("severity_number").dataType == IntegerType,
      "a pre-promotion snapshot keeps its narrow type")
  }

  test("legacy (pre-v2) schema log: in-place upgrade keeps pre-upgrade adds visible, next ALTER bakes them") {
    import spark.implicits._
    val root = freshLake("graft_evlegacy")
    // a post-evolution file carrying a NEW column, registered while
    // the (simulated) old release ran — its add was never recorded
    Tables.events(spark, sf).orderBy("event_id").limit(10)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"),
        (col("event_id") % 100).cast("int").as("severity_number"),
        concat(lit("l"), col("event_id")).as("span_id"),
        col("props").as("body"), lit("LATE").as("late_col"))
      .coalesce(1).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    // handcraft the OLD log format (entries + one trailing schema, no
    // schema0, no timestamps) recording a severity_text rename whose
    // stored schema predates late_col — exactly what an old-release
    // lake carries after an upgrade
    val renamed = org.apache.spark.sql.types.StructType(
      LogSync.table(spark, root).schema.fields
        .filter(_.name != "late_col")
        .map(f => if (f.name == "severity_text")
          org.apache.spark.sql.types.StructField("severity", f.dataType, f.nullable)
        else f))
    val legacyLog = s"rename\t1\tseverity_text\tseverity\nschema\t${renamed.toDDL}"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$root/_schema_log_v1"), true)
    try out.write(legacyLog.getBytes("UTF-8")) finally out.close()
    // the upgraded reader preserves the old newest-footer union: the
    // unrecorded add stays visible, the rename folds
    val t = LogSync.table(spark, root)
    assert(t.columns.contains("late_col") && t.columns.contains("severity"),
      s"pre-upgrade adds must stay visible on legacy logs: ${t.columns.toSeq}")
    assert(t.filter(col("late_col") === "LATE").count() == 10)
    // the next ALTER bakes the union into the upgraded (v2) log —
    // visibility survives and the probe retires
    graft.sources.IcebergExport.exportFieldIds(spark, root) // seed sidecar
    LakeEvolve.promoteColumn(spark, root, "severity_number",
      org.apache.spark.sql.types.LongType)
    val t2 = LogSync.table(spark, root)
    assert(t2.columns.contains("late_col") &&
      t2.filter(col("late_col") === "LATE").count() == 10,
      "the upgrade ALTER must bake pre-upgrade adds into the stored schema")
  }

  test("promote-ONLY history: a pre-promotion anchor reads the narrow type (names alone can't route)") {
    val root = freshLake("graft_evpromo")
    IcebergExport.export(spark, root)
    LakeEvolve.promoteColumn(spark, root, "severity_number",
      org.apache.spark.sql.types.LongType)
    import spark.implicits._
    Tables.events(spark, sf).orderBy("event_id").limit(10)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"),
        (col("event_id") % 100).cast("long").as("severity_number"),
        concat(lit("w"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .coalesce(1).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    IcebergExport.export(spark, root)
    val first = IcebergExport.snapshots(spark, root).find(_._3.isEmpty).get
    // every column NAME matches the current schema here — only the
    // TYPE differs, which the lake-scan fast path's name-subset check
    // cannot see; the anchored read must still resolve the snapshot's
    // own schema-id
    val pre = IcebergExport.readTable(spark, root,
      Some(IcebergExport.BySnapshotId(first._1)))
    assert(pre.schema("severity_number").dataType == IntegerType,
      s"pre-promotion anchor must keep the narrow type: ${pre.schema}")
    assert(pre.count() == 80)
    assert(IcebergExport.readTable(spark, root)
      .schema("severity_number").dataType == LongType)
  }

  test("stat-axis rename: zone-map pruning intact, new syncs keep statting, windows resolve") {
    import spark.implicits._
    val root = freshLake("graft_evstat")
    val (kept0, total0) = LogSync.statsPruneCounts(spark, root,
      "2024-01-10", "2024-01-12")
    assert(total0 > 0)
    // the axes are FIELD-bound: renaming their names is metadata-only
    LakeEvolve.renameColumn(spark, root, "service_name", "service")
    LakeEvolve.renameColumn(spark, root, "timestamp", "event_time")
    // recorded min/max are the fields' VALUES — pruning unchanged
    assert(LogSync.statsPruneCounts(spark, root,
      "2024-01-10", "2024-01-12") == ((kept0, total0)),
      "a stat-axis rename must not move a single zone-map bound")
    // reads fold both generations under the new names
    val t = LogSync.table(spark, root)
    assert(t.columns.contains("service") && t.columns.contains("event_time") &&
      !t.columns.contains("service_name") && !t.columns.contains("timestamp"))
    assert(t.filter(col("event_time").isNull || col("service").isNull).count() == 0)
    // a post-rename sync round (files under the NEW names) still
    // computes zone-map stats — the axis resolves through the log
    Tables.events(spark, sf).orderBy("event_id").limit(30)
      .select(col("ts").as("event_time"), lit("svc2").as("service"),
        col("event_type").as("severity_text"),
        (col("event_id") % 100).cast("int").as("severity_number"),
        concat(lit("p"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .coalesce(1).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    val fresh = LogSync.manifest(spark, root)
      .orderBy(col("registered_at").desc).limit(1).collect().head
    assert(fresh.getAs[java.sql.Timestamp]("min_ts") != null &&
      fresh.getAs[String]("min_svc") == "svc2",
      s"post-rename syncs must still stat the axes: $fresh")
    // the windowed readers bind the CURRENT axis names
    val w = LogSync.tableBetween(spark, root, "2024-01-10", "2024-01-12")
    assert(w.count() == t.filter(col("event_time") >= lit("2024-01-10").cast("timestamp") &&
      col("event_time") < lit("2024-01-12").cast("timestamp")).count())
    val f = LogSync.tableFor(spark, root, "svc2", "2000-01-01", "2100-01-01")
    assert(f.count() == 30)
  }

  test("divergent adds: two writers' DIFFERENT new columns both surface after their syncs") {
    import spark.implicits._
    val root = freshLake("graft_evadds")
    // evolution first, so the lake reads under the stored schema
    LakeEvolve.renameColumn(spark, root, "severity_text", "severity")
    def extraBatch(colName: String, tag: String) =
      Tables.events(spark, sf).orderBy("event_id").limit(10)
        .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
          col("event_type").as("severity"),
          (col("event_id") % 100).cast("int").as("severity_number"),
          concat(lit(tag), col("event_id")).as("span_id"),
          col("props").as("body"))
        .withColumn(colName, lit(tag))
    // writer A adds column xa, lands and syncs; writer B adds a
    // DIFFERENT column xb in a separate file and syncs later — the
    // newest-footer probe this replaced would surface only xb
    extraBatch("xa", "a").coalesce(1).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    extraBatch("xb", "b").coalesce(1).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    val t = LogSync.table(spark, root)
    assert(t.columns.contains("xa") && t.columns.contains("xb"),
      s"both divergent adds must surface: ${t.columns.toSeq}")
    assert(t.filter(col("xa") === "a").count() == 10 &&
      t.filter(col("xb") === "b").count() == 10,
      "each add carries its writer's values, null elsewhere")
    assert(t.count() == 100)
    // the export's logical schema carries both too
    IcebergExport.export(spark, root)
    val ids = IcebergExport.exportFieldIds(spark, root)
    assert(ids.contains("xa") && ids.contains("xb"))
  }

  test("snapshot-schema travel on the native lake: a pre-drop anchor still reads the column") {
    val root = freshLake("graft_evtravel")
    val before = LogSync.table(spark, root).count()
    Thread.sleep(20)
    val mark = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(20)
    LakeEvolve.dropColumn(spark, root, "body")
    // current read: gone
    assert(!LogSync.table(spark, root).columns.contains("body"))
    // pre-drop anchor: the column is part of that snapshot's schema
    val asOf = LogSync.tableAsOf(spark, root, mark)
    assert(asOf.columns.contains("body"),
      s"a pre-drop anchor must surface the dropped column: ${asOf.columns.toSeq}")
    assert(asOf.filter(col("body").isNull).count() == 0 && asOf.count() == before,
      "the dropped column's values must read back intact at the anchor")
  }

  test("Rollup over a renamed dimension: refresh migrates state and equals a full recompute") {
    import graft.sources.Rollup
    val root = freshLake("graft_evrollup")
    def fullAgg(svcCol: String, sevCol: String) = LogSync.table(spark, root)
      .groupBy(col(svcCol), col(sevCol))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    assert(Rollup.refresh(spark, root) > 0)
    // rename BOTH dimensions between refreshes (service_name is a
    // stat axis — rename now supported — and severity_text a plain
    // column)
    LakeEvolve.renameColumn(spark, root, "service_name", "service")
    LakeEvolve.renameColumn(spark, root, "severity_text", "severity")
    // new arrivals under the new shape
    import spark.implicits._
    Tables.events(spark, sf).orderBy("event_id").limit(20)
      .select(col("ts").as("timestamp"), lit("svcN").as("service"),
        col("event_type").as("severity"),
        (col("event_id") % 100).cast("int").as("severity_number"),
        concat(lit("n"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .coalesce(1).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    // refresh succeeds (no manual rebuild), folds the new files, and
    // the migrated rollup equals a full recompute under the new names
    assert(Rollup.refresh(spark, root) > 0,
      "refresh after a dimension rename must not require a manual rebuild")
    val got = Rollup.read(spark, root).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    assert(got == fullAgg("service", "severity"),
      "migrated rollup must equal the full recompute over the renamed dims")
    assert(Rollup.read(spark, root).columns.take(2).toSeq == Seq("service", "severity"))
  }

  test("two-writer evolution race: losers fail loudly, the surviving log is intact") {
    import scala.concurrent._
    import scala.concurrent.duration._
    import ExecutionContext.Implicits.global
    val root = freshLake("graft_evrace")
    // pre-seed the field-id sidecar so the race below is exactly the
    // schema-log commit race, not a first-seeding collision
    IcebergExport.exportFieldIds(spark, root)
    // two writers plan against the same v0 state and commit
    // concurrently: the version-targeted rename is the single commit
    // point — at most one claims each version, the other refuses
    // loudly (each stages through its own uuid'd tmp, so neither can
    // clobber the other's staged bytes)
    val results = Await.result(Future.sequence(Seq(
      Future(scala.util.Try(
        LakeEvolve.renameColumn(spark, root, "severity_text", "severity"))),
      Future(scala.util.Try(
        LakeEvolve.renameColumn(spark, root, "body", "payload"))))), 120.seconds)
    assert(results.exists(_.isSuccess), "at least one writer must win")
    results.collect { case scala.util.Failure(e) => e }.foreach { e =>
      assert(e.getMessage.contains("another writer won"),
        s"a racing loser must fail loudly, got: ${e.getMessage}")
    }
    // whatever interleaving happened, the surviving log parses and
    // serves reads (no torn/corrupted state), with every row intact
    val t = LogSync.table(spark, root)
    assert(t.count() == 80)
    assert(t.columns.contains("severity") || t.columns.contains("severity_text"))
    // no stale tmp litter from any refused commit
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmps = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName)
      .filter(n => n.startsWith("_schema_log_tmp") ||
        n.startsWith("_schema_log_claim"))
    assert(tmps.isEmpty,
      s"refused commits must clean their tmp and claim: ${tmps.toSeq}")
  }

  test("log-first recovery: a crash between log and sidecar re-derives the id binding") {
    val root = freshLake("graft_evcrash")
    IcebergExport.export(spark, root)
    val idsBefore = IcebergExport.exportFieldIds(spark, root)
    LakeEvolve.renameColumn(spark, root, "severity_text", "severity")
    // simulate the crash window: strip the sidecar's new-name binding
    // (the log entry committed first and survives)
    val (_, sidecar) = IcebergExport.fieldIdSidecarCurrent(spark, root)
    val fs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val txt = { val in = fs.open(sidecar)
      try new String(in.readAllBytes(), "UTF-8") finally in.close() }
    assert(txt.contains("severity\t"))
    val stripped = txt.split('\n').filterNot(_.startsWith("severity\t")).mkString("\n")
    val out = fs.create(sidecar, true)
    try out.write(stripped.getBytes("UTF-8")) finally out.close()
    // recovery: the export path re-derives severity → severity_text's
    // OLD id from the log's rename entry — never a fresh id
    val ids = IcebergExport.exportFieldIds(spark, root)
    assert(ids("severity") == idsBefore("severity_text"),
      s"recovered binding must reuse the old id: $ids vs $idsBefore")
  }

  test("deletesSince on an evolved lake: position deletes against pre-rename files resolve") {
    import spark.implicits._
    val root = freshLake("graft_evdsince")
    Thread.sleep(20)
    val mark = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(20)
    // position deletes target PRE-RENAME files, then the rename lands
    // (legal: only ACTIVE EQUALITY deletes block a rename)
    LakeDml.deleteMor(spark, root, col("span_id").isin("e3", "e5"))
    LakeEvolve.renameColumn(spark, root, "severity_text", "severity")
    LakeEvolve.promoteColumn(spark, root, "severity_number",
      org.apache.spark.sql.types.LongType)
    val since = LogSync.deletesSince(spark, root, mark)
    assert(since.columns.contains("severity") && !since.columns.contains("severity_text"))
    val rows = since.filter(col("__delete_kind") === "pos")
      .select("span_id", "severity").collect()
    assert(rows.map(_.getString(0)).toSet == Set("e3", "e5"),
      s"the retracted rows must surface: ${rows.toSeq}")
    assert(rows.forall(_.getString(1) != null),
      "pre-rename physical values must fold into the current name")
  }

  test("dropping a maintained rollup's dimension refuses loudly; non-dims still drop") {
    import graft.sources.Rollup
    val root = freshLake("graft_evrolldrop")
    Rollup.refresh(spark, root)
    // severity_text is a rollup dimension but NOT a stat axis — this
    // isolates the rollup guard from the axis guard
    val e = intercept[IllegalArgumentException](
      LakeEvolve.dropColumn(spark, root, "severity_text"))
    assert(e.getMessage.contains("rollup"), e.getMessage)
    // a column no consumer binds still drops fine
    LakeEvolve.dropColumn(spark, root, "body")
    assert(!LogSync.table(spark, root).columns.contains("body"))
    // and the rollup keeps refreshing/reading after the unrelated drop
    assert(Rollup.refresh(spark, root) == 0)
    assert(Rollup.read(spark, root).count() > 0)
  }

  test("layout-column rename: alias reads, partition pruning intact, writers keep the dir key") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_evlayout").toString
    def batch(tag: String) = Tables.events(spark, sf).orderBy("event_id").limit(80)
      .select(col("ts").as("timestamp"),
        concat(lit("svc-"), col("user_id") % 4).as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit(tag), col("event_id")).as("span_id"))
    LogWriter.write(batch("e"), root, layout = Seq("service_name"))
    LogSync.sync(spark, root)
    val before = LogSync.table(spark, root)
      .select("span_id", "service_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

    LakeEvolve.renameColumn(spark, root, "service_name", "service")

    // the rename is a read-side alias of the directory key: same
    // values under the new name, old name gone
    val t = LogSync.table(spark, root)
    assert(t.columns.contains("service") && !t.columns.contains("service_name"))
    val after = t.select("span_id", "service").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(after == before, "layout rename must not change a single value")
    // THE point of the layout-alias design: an equality filter on the
    // RENAMED name still reaches the scan as a PartitionFilter on the
    // physical directory key — a coalesce fold would lose this
    val plan = formattedPlan(LogSync.table(spark, root)
      .filter(col("service") === "svc-1"))
    val pf = plan.linesIterator.filter(_.trim.startsWith("PartitionFilters:"))
      .find(_.contains("service_name"))
      .getOrElse(fail(s"service filter never reached PartitionFilters:\n$plan"))
    assert(pf.contains("svc-1"), s"expected the literal in the partition filter: $pf")

    // forward writers keep emitting the PHYSICAL key; the new batch
    // folds in under the renamed name
    val twins = batch("n").filter(col("service_name") === "svc-0")
    val nTwins = twins.count()
    assert(nTwins > 0)
    LogWriter.write(twins, root, layout = Seq("service_name"))
    LogSync.sync(spark, root)
    assert(LogSync.table(spark, root)
      .filter(col("service") === "svc-0" && col("span_id").startsWith("n"))
      .count() == nTwins)

    // a CoW DML rewrite keeps the directory shape: the rewritten file
    // lands back under a service_name= dir, and the read stays whole
    LakeDml.delete(spark, root, col("span_id") === "e1")
    assert(LogSync.table(spark, root).count() == 80 + nTwins - 1)
    val stray = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull)
      .select("path").as[String].collect()
      .filterNot(_.contains("service_name="))
    assert(stray.isEmpty, s"rewrites must keep the physical key: ${stray.toSeq}")

    // promote/drop of a layout column stay refused; the rename chains
    val ed = intercept[IllegalArgumentException](
      LakeEvolve.dropColumn(spark, root, "service"))
    assert(ed.getMessage.contains("partition-layout"), ed.getMessage)

    // Iceberg export of the layout-renamed lake: the spec binds the
    // CURRENT logical name (dirs untouched), and the exported chain
    // serves the same rows under it
    def keyed(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(col("span_id"), col(c)).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    IcebergExport.export(spark, root)
    val exp1 = IcebergExport.readTable(spark, root)
    assert(exp1.columns.contains("service") && !exp1.columns.contains("service_name"))
    assert(keyed(exp1, "service") == keyed(LogSync.table(spark, root), "service"))

    // a SECOND rename retires the exported spec's name: the next
    // export RESTATES (carried manifests bound a retired name),
    // binding `svc` throughout — paid once per rename, not per export
    LakeEvolve.renameColumn(spark, root, "service", "svc")
    val chained = LogSync.table(spark, root)
    assert(chained.columns.contains("svc") && !chained.columns.contains("service"))
    assert(chained.filter(col("svc") === "svc-2").count() > 0)
    IcebergExport.export(spark, root)
    assert(IcebergExport.snapshots(spark, root).length == 1,
      "a rename-invalidated export must restate (history dropped)")
    val exp2 = IcebergExport.readTable(spark, root)
    assert(exp2.columns.contains("svc") &&
      !exp2.columns.exists(Set("service", "service_name")),
      s"restated export must bind only the logical name: ${exp2.columns.toSeq}")
    assert(keyed(exp2, "svc") == keyed(chained, "svc"))

    // exports AFTER the restatement see consistent names → delta again
    val d = batch("d").filter(col("service_name") === "svc-3")
    val nD = d.count()
    LogWriter.write(d, root, layout = Seq("service_name"))
    LogSync.sync(spark, root)
    IcebergExport.export(spark, root)
    assert(IcebergExport.snapshots(spark, root).length == 2,
      "post-restatement exports must chain as deltas")
    assert(IcebergExport.readTable(spark, root).count() ==
      80 + nTwins - 1 + nD)

    // a producer that naturally holds the RENAMED name (frame column
    // `svc`, layout arg `svc` — the CHAINED alias at this point) must
    // not mint `svc=` dirs beside `service_name=`: LogWriter resolves
    // both the frame and the requested layout back through the chain
    // to the physical key, or every later root scan would die in
    // partition discovery
    val logical = batch("l").filter(col("service_name") === "svc-2")
      .withColumnRenamed("service_name", "svc")
    val nLog = logical.count()
    assert(nLog > 0)
    LogWriter.write(logical, root, layout = Seq("svc"))
    LogSync.sync(spark, root)
    assert(LogSync.table(spark, root)
      .filter(col("svc") === "svc-2" && col("span_id").startsWith("l"))
      .count() == nLog)
    val strayDirs = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).select("path").as[String].collect()
      .filterNot(_.contains("service_name="))
    assert(strayDirs.isEmpty,
      s"a logical-name write must land under the physical key: ${strayDirs.toSeq}")
  }

  test("two-thread sync race: the lease admits one writer — no path registers twice") {
    import scala.concurrent._
    import scala.concurrent.duration._
    import ExecutionContext.Implicits.global
    import spark.implicits._
    // a root with UNREGISTERED files: both racers see the same fresh
    // set, so without the lease both would append it to the manifest
    val root = Files.createTempDirectory("graft_syncrace").toString
    Tables.events(spark, sf).orderBy("event_id").limit(40)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit("e"), col("event_id")).as("span_id"))
      .coalesce(4).write.mode("append").parquet(root)
    val results = Await.result(Future.sequence(Seq(
      Future(scala.util.Try(LogSync.sync(spark, root))),
      Future(scala.util.Try(LogSync.sync(spark, root))))), 120.seconds)
    assert(results.exists(_.isSuccess), "at least one sync must win")
    results.collect { case scala.util.Failure(e) => e }.foreach { e =>
      assert(e.getMessage.contains("sync lease conflict"),
        s"a racing sync must refuse loudly, got: ${e.getMessage}")
    }
    // the invariant the lease exists for: every path registered at
    // most once (a duplicate would double rows through the eq-delete
    // seq attach LEFT join and surface twice in tableSince)
    val m = LogSync.manifest(spark, root).select("path").as[String].collect()
    assert(m.length == m.distinct.length,
      s"no path may register twice: ${m.toSeq.diff(m.distinct.toSeq)}")
    assert(LogSync.table(spark, root).count() == 40)
    // serialized syncs still work (the lease releases)
    assert(LogSync.sync(spark, root) == 0)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/_sync_lease")),
      "a finished sync must release its lease")
  }

  test("schema-log claim janitor: a stale crashed claim reclaims, a fresh one refuses loudly") {
    val root = freshLake("graft_evjan")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a FRESH foreign claim (another writer mid-commit) blocks the
    // ALTER loudly — the loud-loser contract
    val claim = new org.apache.hadoop.fs.Path(s"$root/_schema_log_claim_v1")
    fs.create(claim, false).close()
    val e = intercept[RuntimeException](
      LakeEvolve.renameColumn(spark, root, "severity_text", "severity"))
    assert(e.getMessage.contains("claimed"), e.getMessage)
    // age it past the grace with its target absent: crash residue —
    // the next ALTER reclaims it and commits normally
    fs.setTimes(claim, System.currentTimeMillis() - 16L * 60 * 1000, -1)
    LakeEvolve.renameColumn(spark, root, "severity_text", "severity")
    assert(LogSync.table(spark, root).columns.contains("severity"))
    assert(!fs.exists(claim), "the committed ALTER must release the claim")
  }

  test("native tableAsOf anchored before a promotion reads through post-promotion wide files") {
    import spark.implicits._
    val root = freshLake("graft_evwide")
    Thread.sleep(20)
    val anchor = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(20)
    // rename first so the anchored read exercises the alias fold AND
    // the promotion widening together
    LakeEvolve.renameColumn(spark, root, "severity_text", "severity")
    LakeEvolve.promoteColumn(spark, root, "severity_number", LongType)
    // a post-promotion file PHYSICALLY carrying long — before the
    // widest-type request this made the anchored root scan throw a
    // parquet conversion error (it requested int over this file)
    Tables.events(spark, sf).orderBy("event_id").limit(10)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity"),
        (col("event_id") % 100 + 1000000000L * 3).cast("long").as("severity_number"),
        concat(lit("w"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .coalesce(1).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    val pre = LogSync.tableAsOf(spark, root, anchor)
    // snapshot-schema semantics: the anchor predates BOTH alters —
    // old name, narrow type — and only the pre-promotion rows
    assert(pre.columns.contains("severity_text") && !pre.columns.contains("severity"))
    assert(pre.schema("severity_number").dataType == IntegerType,
      s"pre-promotion anchor must surface the narrow type: ${pre.schema}")
    val rows = pre.select("span_id", "severity_number").collect()
    assert(rows.length == 80)
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 100),
      "anchored values must be the original narrow ones")
    // the current read still sees everything wide
    val cur = LogSync.table(spark, root)
    assert(cur.schema("severity_number").dataType == LongType)
    assert(cur.count() == 90)
    assert(cur.filter(col("severity_number") >= 1000000000L * 3).count() == 10)
  }

  test("keep-set semi-join is seqBroadcastRowCap-guarded: shuffled read equals broadcast read") {
    import spark.implicits._
    // the hardest shape through keepOnly: an EVOLVED lake (rename +
    // promote → request-schema scan + alias fold) carrying BOTH MOR
    // delete kinds (position + equality), plus a CoW rewrite whose
    // tombstoned file stays on disk until vacuum — so the keep-set is
    // a strict subset of the files the root scan discovers and a
    // wrong join shape would resurrect replaced rows
    val root = freshLake("graft_keepcap")
    LakeDml.delete(spark, root, col("span_id") === "e2")
    LakeDml.deleteMor(spark, root, col("span_id").isin("e3", "e5"))
    LakeEvolve.renameColumn(spark, root, "severity_text", "severity")
    LakeEvolve.promoteColumn(spark, root, "severity_number", LongType)
    LakeDml.deleteEq(spark, root, Seq("e7", "e11").toDF("span_id"))
    def readAll(): Seq[(String, String, Long)] = LogSync.table(spark, root)
      .select("span_id", "severity", "severity_number")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted
    val viaBroadcast = readAll()
    assert(viaBroadcast.size == 75, s"80 - 1 CoW - 2 pos - 2 eq, got ${viaBroadcast.size}")
    // cap 0 forces the registered-path keep-set past its broadcast
    // cap: the semi-join must shuffle and produce the identical table
    spark.conf.set("graft.lake.seqBroadcastRowCap", "0")
    try {
      assert(readAll() == viaBroadcast,
        "the shuffled keep-set semi-join must agree row-for-row with the broadcast one")
      // the DML scan path (tableWithSrc) shares the guard: a delete
      // planned under the shuffled keep-set still resolves its targets
      val stats = LakeDml.deleteMor(spark, root, col("span_id") === "e13")
      assert(stats.rowsChanged == 1)
      assert(LogSync.table(spark, root).count() == 74)
    } finally spark.conf.unset("graft.lake.seqBroadcastRowCap")
  }

  test("vacuum sweeps committed-claim residue; target-absent claims survive (loud-loser gate)") {
    val root = freshLake("graft_claimres")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def residue(name: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(s"$root/$name")
      val o = fs.create(p, true); o.write("crashed".getBytes("UTF-8")); o.close()
      // age it past the vacuum grace — the sweep treats claims like
      // every other crash leftover
      fs.setTimes(p, System.currentTimeMillis() - 16L * 60 * 1000, -1)
      p
    }
    // mint real targets: a rename lands _schema_log_v1, a CoW delete
    // swaps _manifest_v1
    LakeEvolve.renameColumn(spark, root, "severity_text", "severity")
    LakeDml.delete(spark, root, col("span_id") === "e2")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/_schema_log_v1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/_manifest_v1")))
    // committed-claim residue (target EXISTS): crash fell between the
    // commit rename and the claim release — vacuum sweeps these
    val deadSchema = residue("_schema_log_claim_v1")
    val deadSwap = residue("_manifest_v1_claim")
    // target-ABSENT claim: the loud-loser gate a live (or crashed
    // pre-commit) writer relies on — vacuum must NOT touch it, only
    // the next writer's own grace janitor may
    val gate = residue("_schema_log_claim_v99")
    graft.sources.LogCompact.vacuum(spark, root)
    assert(!fs.exists(deadSchema), "committed schema-log claim must sweep")
    assert(!fs.exists(deadSwap), "committed manifest-swap claim must sweep")
    assert(fs.exists(gate), "a target-absent claim is a live gate, not residue")
    // the lake stayed whole
    assert(LogSync.table(spark, root).count() == 79)
    fs.delete(gate, false)
  }

  test("manifestRowCount: listing-keyed cache tracks appends, tombstones, version swaps") {
    import spark.implicits._
    // the broadcast-vs-shuffle bound must never serve a stale count
    // after the manifest changes — each mutation class below changes
    // the manifest DIRECTORY LISTING (append round: new part files;
    // CoW delete: tombstone rewrite or append; compaction/vacuum:
    // whole-version swap), which is the cache key
    val root = freshLake("graft_mcount")
    def actual(): Long = LogSync.manifest(spark, root).count()
    val n0 = LogSync.manifestRowCount(spark, root)
    assert(n0 == actual() && n0 > 0)
    assert(LogSync.manifestRowCount(spark, root) == n0, "repeat read: cache hit")
    // append round → new manifest part files
    Tables.events(spark, sf).orderBy("event_id").limit(10)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"),
        (col("event_id") % 100).cast("int").as("severity_number"),
        concat(lit("x"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .coalesce(1).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    assert(LogSync.manifestRowCount(spark, root) == actual(),
      "an append round must invalidate the cached count")
    assert(LogSync.manifestRowCount(spark, root) > n0)
    // CoW delete → tombstone + replacement rows
    LakeDml.delete(spark, root, col("span_id") === "e2")
    assert(LogSync.manifestRowCount(spark, root) == actual(),
      "a DML rewrite must invalidate the cached count")
  }
}
