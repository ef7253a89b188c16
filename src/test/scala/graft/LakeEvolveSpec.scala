package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{IcebergExport, LakeDml, LakeEvolve, LogSync, Tables}

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

  test("guards: layout/stat columns, collisions, retired names, narrowing all refuse") {
    val root = freshLake("graft_evguard")
    intercept[IllegalArgumentException] {
      LakeEvolve.renameColumn(spark, root, "timestamp", "ts2")
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
    val asOf = LogSync.tableAsOf(spark, root, mark)
    assert(asOf.columns.contains("span"))
    assert(asOf.filter(col("span").isin("e2", "e4")).count() == 0,
      "a retired-name eq delete must keep applying through the rename map")
    assert(asOf.count() == 78)
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
    // pre-evolution snapshot, read under the current schema
    val first = mdPath.minBy(_._2)
    val old = IcebergExport.readTable(spark, root,
      Some(IcebergExport.BySnapshotId(first._1)))
    assert(old.count() == 80 && old.columns.contains("severity"))
    assert(old.filter(col("severity").isNull).count() == 0,
      "pre-rename files must resolve through the alias map")
  }
}
