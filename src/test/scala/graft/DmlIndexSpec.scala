package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{LakeDml, LakeIndex, LogSync, Tables}

/** File-level bloom index ([[graft.sources.LakeIndex]]) and
  * copy-on-write DML ([[graft.sources.LakeDml]]) over the registered
  * lake.
  */
class DmlIndexSpec extends SparkSpec {

  /** A small partitioned lake: `batches` appends of `n` rows each,
    * service `svc` per batch — every append creates its own files, so
    * per-file assertions have files to distinguish.
    */
  private def mkLake(batches: Seq[(Int, String)]): String = {
    val root = Files.createTempDirectory("graft_dml").toString
    batches.foreach { case (n, svc) =>
      Tables.events(spark, sf).limit(n)
        .select(col("ts").as("timestamp"), lit(svc).as("service_name"),
          col("event_type").as("severity_text"),
          // svc prefix: batches draw overlapping event rows, and a
          // per-service prefix keeps the upsert/lookup key unique
          concat(lit(svc), lit("-"), col("event_id")).as("span_id"),
          col("props").as("body"))
        .write.mode("append").partitionBy("service_name").parquet(root)
    }
    LogSync.sync(spark, root)
    root
  }

  test("LakeIndex: lookup equals direct filter, scans a strict subset of files") {
    val root = mkLake(Seq((200, "s0"), (200, "s1"), (150, "s2")))
    val indexed = LakeIndex.build(spark, root, "span_id")
    assert(indexed > 0, "first build must index every registered file")
    assert(LakeIndex.build(spark, root, "span_id") == 0,
      "second build must be incremental (nothing new to index)")

    val needles = LogSync.table(spark, root).filter(col("service_name") === "s2")
      .select("span_id").limit(2).collect().map(_.getString(0)).toSeq
    val got = LakeIndex.lookup(spark, root, "span_id", needles)
      .select("span_id", "service_name", "body").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = LogSync.table(spark, root).filter(col("span_id").isin(needles: _*))
      .select("span_id", "service_name", "body").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == want, "bloom pruning must never change the answer")
    assert(want.nonEmpty)

    val (kept, total) = LakeIndex.pruneCounts(spark, root, "span_id", needles)
    assert(kept < total,
      s"the sidecar must prune files for a needle lookup, kept $kept of $total")
  }

  test("LakeIndex: files registered after the last build survive pruning (soundness)") {
    val root = mkLake(Seq((150, "s0")))
    LakeIndex.build(spark, root, "span_id")
    // new files, synced but NOT indexed
    Tables.events(spark, sf).orderBy(col("event_id").desc).limit(50)
      .select(col("ts").as("timestamp"), lit("s9").as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit("s9-"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .write.mode("append").partitionBy("service_name").parquet(root)
    LogSync.sync(spark, root)
    val fresh = LogSync.table(spark, root).filter(col("service_name") === "s9")
      .select("span_id").limit(1).collect()(0).getString(0)
    assert(LakeIndex.lookup(spark, root, "span_id", Seq(fresh)).count() >= 1,
      "unindexed files must always survive pruning")
    assert(LakeIndex.build(spark, root, "span_id") > 0,
      "incremental build must pick up exactly the new files")
  }

  test("LakeIndex.grep: equals the direct token filter, prunes files, survives fresh appends") {
    val root = mkLake(Seq((200, "s0"), (200, "s1"), (150, "s2")))
    // one batch whose bodies carry a vocabulary no other file has — the
    // rare-term case token pruning exists for (the 150-row batches all
    // draw the same event head, so every numeric token repeats per file)
    Tables.events(spark, sf).limit(40)
      .select(col("ts").as("timestamp"), lit("s3").as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit("s3-"), col("event_id")).as("span_id"),
        lit("""{"marker": rareterm}""").as("body"))
      .write.mode("append").partitionBy("service_name").parquet(root)
    LogSync.sync(spark, root)
    assert(LakeIndex.buildTokens(spark, root, "body", expectedTokensPerFile = 1024) > 0)
    assert(LakeIndex.buildTokens(spark, root, "body") == 0,
      "second token build must be incremental (nothing new to index)")

    // a term that lives in few bodies: one specific k value's digits
    val term = "69"
    val got = LakeIndex.grep(spark, root, "body", Seq(term))
      .select("span_id", "body").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val tokenized = array_distinct(split(lower(col("body")), "[^a-z0-9]+"))
    val want = LogSync.table(spark, root).filter(array_contains(tokenized, term))
      .select("span_id", "body").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want, "token-bloom pruning must never change the answer")
    assert(want.nonEmpty, "the spec term must actually occur")

    val (kept, total) = LakeIndex.grepPruneCounts(spark, root, "body", Seq("rareterm"))
    assert(kept < total,
      s"the token sidecar must skip files for a rare term, kept $kept of $total")
    assert(LakeIndex.grep(spark, root, "body", Seq("rareterm")).count() == 40)

    // multi-term AND: intersection semantics on both index and row side
    val and = LakeIndex.grep(spark, root, "body", Seq("k", term))
      .select("span_id").collect().map(_.getString(0)).toSet
    assert(and == want.map(_._1), "'k' occurs in every numeric body, so AND with it is a no-op")

    // absent term: zero rows, and (modulo bloom false positives) zero files
    assert(LakeIndex.grep(spark, root, "body", Seq("zzznope")).count() == 0)

    // fresh files registered after the build survive pruning (soundness)
    Tables.events(spark, sf).orderBy(col("event_id").desc).limit(25)
      .select(col("ts").as("timestamp"), lit("s9").as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit("s9-"), col("event_id")).as("span_id"),
        lit("""{"needle": freshterm}""").as("body"))
      .write.mode("append").partitionBy("service_name").parquet(root)
    LogSync.sync(spark, root)
    assert(LakeIndex.grep(spark, root, "body", Seq("freshterm")).count() == 25,
      "unindexed files must always survive token pruning")
    assert(LakeIndex.buildTokens(spark, root, "body") > 0,
      "incremental token build must pick up exactly the new files")
  }

  test("LakeDml.delete: matching rows gone, untouched files keep their manifest entries") {
    val root = mkLake(Seq((200, "s0"), (200, "s1")))
    val t0 = LogSync.table(spark, root)
    val before = t0.count()
    val toDie = t0.filter(col("service_name") === "s1" && col("severity_text") === "view").count()
    assert(toDie > 0)
    val untouched = graft.sources.LogSync.manifest(spark, root)
      .filter(!col("path").contains("service_name=s1"))
      .select("path").collect().map(_.getString(0)).toSet

    val stats = LakeDml.delete(spark, root,
      col("service_name") === "s1" && col("severity_text") === "view")
    assert(stats.rowsChanged == toDie, s"expected $toDie deleted, got $stats")

    val t1 = LogSync.table(spark, root)
    assert(t1.count() == before - toDie)
    assert(t1.filter(col("service_name") === "s1" && col("severity_text") === "view").count() == 0)
    val after = graft.sources.LogSync.manifest(spark, root)
      .select("path").collect().map(_.getString(0)).toSet
    assert(untouched.subsetOf(after),
      "files without matching rows must keep their manifest entries (copy-on-write)")
    // the resurrection guard: replaced files are still on disk, and a
    // sync round BEFORE vacuum must not re-register them (tombstones)
    assert(LogSync.sync(spark, root) == 0, "post-DML lake is fully registered")
    assert(LogSync.table(spark, root).count() == before - toDie,
      "sync must not resurrect deleted rows")
    // replaced files are vacuum fodder, never reader-visible; vacuum
    // also purges their tombstones
    assert(graft.sources.LogCompact.vacuum(spark, root, graceMs = 0L) == stats.filesRemoved.toInt)
    assert(graft.sources.LogSync.manifest(spark, root)
      .filter(col("removed_at").isNotNull).count() == 0,
      "vacuum purges aged tombstones")
    assert(LogSync.sync(spark, root) == 0, "vacuum must not unregister live files")
    assert(LogSync.table(spark, root).count() == before - toDie)
  }

  test("LakeDml: a commit matching more files than maxRewriteFiles refuses loudly") {
    val root = mkLake(Seq((100, "s0"), (100, "s1")))
    val before = LogSync.table(spark, root).count()
    val nFiles = graft.sources.LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).count()
    assert(nFiles > 1)
    val e = intercept[IllegalStateException] {
      LakeDml.delete(spark, root, lit(true), maxRewriteFiles = 1)
    }
    assert(e.getMessage.contains("maxRewriteFiles"),
      s"refusal must name the bound, got: ${e.getMessage}")
    assert(LogSync.table(spark, root).count() == before,
      "a refused commit must leave the lake untouched")
  }

  test("LakeDml.delete: NULL predicate keeps the row (SQL DELETE semantics)") {
    val root = mkLake(Seq((100, "s0")))
    val before = LogSync.table(spark, root).count()
    // body = null-producing predicate: nullif never matches but yields NULL
    val stats = LakeDml.delete(spark, root, nullif(lit("x"), lit("x")) === "y")
    assert(stats.rowsChanged == 0 && LogSync.table(spark, root).count() == before)
  }

  test("LakeDml.upsert: replaces matched keys, inserts novel ones, index path agrees") {
    val root = mkLake(Seq((200, "s0"), (200, "s1")))
    val before = LogSync.table(spark, root).cache()
    val n0 = before.count()
    val victims = before.filter(col("service_name") === "s0")
      .orderBy("span_id").limit(3).collect().map(_.getAs[String]("span_id")).toSeq

    import spark.implicits._
    val updates = before.filter(col("span_id").isin(victims: _*))
      .withColumn("body", lit("REDACTED"))
      .union(
        Seq(("2030-01-01 00:00:00", "s7", "error", "novel-span-1", "hello"))
          .toDF("ts_s", "service_name", "severity_text", "span_id", "body")
          .select(col("ts_s").cast("timestamp").as("timestamp"), col("service_name"),
            col("severity_text"), col("span_id"), col("body"))
          .select(before.columns.map(col): _*))

    val stats = LakeDml.upsert(spark, root, updates, Seq("span_id"))
    assert(stats.rowsChanged == victims.size, s"3 matched, got $stats")
    val t1 = LogSync.table(spark, root)
    assert(t1.count() == n0 + 1, "3 replaced in place + 1 inserted")
    assert(t1.filter(col("span_id").isin(victims: _*))
      .select("body").collect().forall(_.getString(0) == "REDACTED"))
    assert(t1.filter(col("span_id") === "novel-span-1").count() == 1)

    // the same upsert through the bloom sidecar must agree
    val root2 = mkLake(Seq((200, "s0"), (200, "s1")))
    LakeIndex.build(spark, root2, "span_id")
    val before2 = LogSync.table(spark, root2)
    val updates2 = before2.filter(col("span_id").isin(victims: _*))
      .withColumn("body", lit("REDACTED"))
    val stats2 = LakeDml.upsert(spark, root2, updates2, Seq("span_id"), useIndex = true)
    assert(stats2.rowsChanged == victims.size)
    assert(LogSync.table(spark, root2).filter(col("span_id").isin(victims: _*))
      .select("body").collect().forall(_.getString(0) == "REDACTED"))
    before.unpersist()
  }

  test("LakeDml.upsert(useIndex): both probe caps force the scan fallback and agree") {
    import spark.implicits._
    def redact(root: String, capKey: String): Unit = {
      LakeIndex.build(spark, root, "span_id")
      val before = LogSync.table(spark, root)
      val victims = before.filter(col("service_name") === "s0")
        .orderBy("span_id").limit(3).collect().map(_.getAs[String]("span_id")).toSeq
      val updates = before.filter(col("span_id").isin(victims: _*))
        .withColumn("body", lit("REDACTED"))
      spark.conf.set(capKey, "0")
      try {
        val stats = LakeDml.upsert(spark, root, updates, Seq("span_id"), useIndex = true)
        assert(stats.rowsChanged == victims.size, s"$capKey fallback: $stats")
      } finally spark.conf.unset(capKey)
      assert(LogSync.table(spark, root).filter(col("span_id").isin(victims: _*))
        .select("body").collect().forall(_.getString(0) == "REDACTED"),
        s"$capKey fallback must still replace every matched key")
    }
    // cap 0 on the KEY count: the hash list never crosses the driver
    redact(mkLake(Seq((200, "s0"), (200, "s1"))), "graft.lake.indexProbeMaxKeys")
    // cap 0 on the bloom-positive PATH count: the path list never does
    redact(mkLake(Seq((200, "s0"), (200, "s1"))), "graft.lake.indexProbePathCap")
  }
}
