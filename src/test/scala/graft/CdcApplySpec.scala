package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{LogSync, Tables}
import graft.streaming.CdcApply

/** [[CdcApply]] — the streaming CDC upsert sink over the
  * equality-delete DML primitives.
  */
class CdcApplySpec extends SparkSpec {

  private val tableSchema = StructType(Seq(
    StructField("timestamp", TimestampType), StructField("service_name", StringType),
    StructField("severity_text", StringType), StructField("span_id", StringType),
    StructField("body", StringType)))
  private val changeSchema = StructType(
    StructField("op", StringType) +: tableSchema.fields.toSeq)

  private def seedLake(n: Int): String = {
    val root = Files.createTempDirectory("graft_cdcsink").toString
    Tables.events(spark, sf).orderBy(col("event_id")).limit(n)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit("e"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .coalesce(2).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    root
  }

  test("changelog stream maintains the lake; restart replays nothing; CDC channels fire") {
    import spark.implicits._
    val root = seedLake(40)
    val src = Files.createTempDirectory("graft_cdcsrc").toString
    val ckpt = Files.createTempDirectory("graft_cdcckpt").toString
    val base = LogSync.table(spark, root).persist()
    val ids = base.select("span_id").as[String].collect().sorted.toSeq
    val mark0 = LogSync.highWaterMark(spark, root).get
    val dmark0 = new Timestamp(System.currentTimeMillis())
    Thread.sleep(20)

    // batch 1: update 3 keys, insert 2 novel keys, delete 2 keys
    val upd = base.filter(col("span_id").isin(ids.take(3): _*))
      .select(lit("U").as("op"), col("timestamp"), col("service_name"),
        col("severity_text"), col("span_id"), lit("UPD").as("body"))
    val ins = base.limit(2)
      .select(lit("I").as("op"), col("timestamp"), col("service_name"),
        col("severity_text"),
        concat(lit("novel-"), col("span_id")).as("span_id"),
        lit("NEW").as("body"))
    val del = ids.slice(3, 5).map(k => ("d", k)).toDF("op", "key")
      .select(col("op"), lit(null).cast(TimestampType).as("timestamp"),
        lit(null).cast(StringType).as("service_name"),
        lit(null).cast(StringType).as("severity_text"),
        col("key").as("span_id"), lit(null).cast(StringType).as("body"))
    upd.unionByName(ins).unionByName(del)
      .write.mode("append").parquet(src)

    val q = CdcApply.start(
      spark.readStream.schema(changeSchema).parquet(src),
      root, Seq("span_id"), ckpt)
    try q.processAllAvailable() finally q.stop()

    val t1 = LogSync.table(spark, root)
    assert(t1.count() == 40 - 2 + 2)
    assert(t1.filter(col("body") === "UPD").count() == 3)
    assert(t1.filter(col("span_id").isin(ids.slice(3, 5): _*)).count() == 0)
    assert(t1.filter(col("body") === "NEW").count() == 2)

    // the CDC triple on the way OUT: replacements on upsertsSince
    // (not on tableSince), retraction keys on deletesSince
    assert(LogSync.tableSince(spark, root, mark0).count() == 0)
    assert(LogSync.upsertsSince(spark, root, mark0).count() == 5)
    val dels = LogSync.deletesSince(spark, root, dmark0)
    assert(dels.select("span_id").as[String].collect().toSet ==
      ids.slice(3, 5).toSet)

    // batch 2 arrives; a RESTARTED query (same checkpoint) applies it
    // once and replays nothing from batch 1
    base.filter(col("span_id") === ids.head)
      .select(lit("D").as("op"), col("timestamp"), col("service_name"),
        col("severity_text"), col("span_id"), col("body"))
      .write.mode("append").parquet(src)
    val q2 = CdcApply.start(
      spark.readStream.schema(changeSchema).parquet(src),
      root, Seq("span_id"), ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val t2 = LogSync.table(spark, root)
    assert(t2.count() == 40 - 3 + 2)
    assert(t2.filter(col("span_id") === ids.head).count() == 0)
    assert(t2.filter(col("body") === "UPD").count() == 2,
      "batch-1 updates must not double-apply on restart")
    base.unpersist()
  }

  test("CDC steady state: maintenance bounds per-scan delete work, no data rewrite, reads exact") {
    import spark.implicits._
    val root = seedLake(30)
    // an immutable twin of the seeded rows (recomputable from the
    // events parquet — the lake itself mutates under the stream)
    val base = Tables.events(spark, sf).orderBy(col("event_id")).limit(30)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit("e"), col("event_id")).as("span_id"),
        col("props").as("body"))
    val allKeys = base.select("span_id").as[String].collect().sorted.toSeq
    val expected = scala.collection.mutable.Map[String, String]()
    base.select("span_id", "body").collect()
      .foreach(r => expected(r.getString(0)) = r.getString(1))

    (0 until 12).foreach { b =>
      val delKey = allKeys(b)
      val updKey = allKeys(12 + b)
      val upd = base.filter(col("span_id") === updKey)
        .select(lit("U").as("op"), col("timestamp"), col("service_name"),
          col("severity_text"), col("span_id"), lit(s"U$b").as("body"))
      val ins = base.limit(1)
        .select(lit("I").as("op"), col("timestamp"), col("service_name"),
          col("severity_text"), lit(s"novel-$b").as("span_id"),
          lit(s"N$b").as("body"))
      val del = base.filter(col("span_id") === delKey)
        .select(lit("D").as("op"), col("timestamp"), col("service_name"),
          col("severity_text"), col("span_id"), col("body"))
      CdcApply.applyBatch(upd.unionByName(ins).unionByName(del), root,
        Seq("span_id"), "op", None)
      expected -= delKey
      expected(updKey) = s"U$b"
      expected(s"novel-$b") = s"N$b"
      // the owner's maintenance cadence: every 4 batches (8 eq
      // commits — the conversion threshold) the accumulated equality
      // deletes retire with NO data rewrite
      if (b % 4 == 3) {
        graft.streaming.SignalLakeMaintenance.run(spark, root,
          minFilesToCompact = 100000, vacuumGraceMs = 0L)
        assert(LogSync.deleteEntries(spark, root).count(_.isEq) == 0,
          s"maintenance after batch $b must convert the eq backlog")
      }
    }
    // bounded between maintenance rounds, zero right after the last
    assert(LogSync.deleteEntries(spark, root).count(_.isEq) == 0)
    // the table equals the driver-replayed changelog exactly
    val got = LogSync.table(spark, root).select("span_id", "body").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == expected.toMap,
      s"diverged keys: ${(got.keySet diff expected.keySet) ++ (expected.keySet diff got.keySet)}")
    // no maintenance round rewrote a data file (op="rewrite" would
    // mark compaction output; only appends and upsert values exist)
    assert(LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull && col("op") === "rewrite").count() == 0)
  }

  test("seqCol picks each key's latest change; delete-then-update survives") {
    import spark.implicits._
    val root = seedLake(20)
    val ids = LogSync.table(spark, root)
      .select("span_id").as[String].collect().sorted.toSeq
    val (kDies, kLives) = (ids.head, ids(1))
    val row = LogSync.table(spark, root).filter(col("span_id").isin(kDies, kLives))
    // kDies: U@1 then D@2 (dies); kLives: D@1 then U@2 (lives, body=WINS)
    val changes = row.select(lit("U").as("op"), col("timestamp"),
        col("service_name"), col("severity_text"), col("span_id"),
        lit("WINS").as("body"),
        when(col("span_id") === kDies, lit(1L)).otherwise(lit(2L)).as("lsn"))
      .unionByName(row.select(lit("D").as("op"), col("timestamp"),
        col("service_name"), col("severity_text"), col("span_id"),
        col("body"),
        when(col("span_id") === kDies, lit(2L)).otherwise(lit(1L)).as("lsn")))
    CdcApply.applyBatch(changes, root, Seq("span_id"), "op", Some("lsn"))
    val t = LogSync.table(spark, root)
    assert(t.filter(col("span_id") === kDies).count() == 0, "U@1 < D@2: dies")
    assert(t.filter(col("span_id") === kLives).head.getAs[String]("body") == "WINS",
      "D@1 < U@2: the update wins")
    assert(t.count() == 19)
  }

  test("a TIE at the winning seq is refused — the ordering column cannot resolve it") {
    import spark.implicits._
    val root = seedLake(10)
    val k = LogSync.table(spark, root).select("span_id").as[String].head()
    val row = LogSync.table(spark, root).filter(col("span_id") === k)
    def change(op: String, body: String, lsn: Long) =
      row.select(lit(op).as("op"), col("timestamp"), col("service_name"),
        col("severity_text"), col("span_id"), lit(body).as("body"),
        lit(lsn).as("lsn"))
    // lsn 1 is superseded (harmless); the U/D pair at lsn 2 ties
    val tied = change("U", "A", 2L)
      .unionByName(change("D", "x", 2L))
      .unionByName(change("U", "B", 1L))
    val e = intercept[IllegalArgumentException] {
      CdcApply.applyBatch(tied, root, Seq("span_id"), "op", Some("lsn"))
    }
    assert(e.getMessage.contains("unresolvable"))
    // a BYTE-IDENTICAL redelivery at the same LSN is NOT a conflict —
    // an at-least-once source must not wedge the stream
    val redelivered = change("U", "DUP", 3L).unionByName(change("U", "DUP", 3L))
    CdcApply.applyBatch(redelivered, root, Seq("span_id"), "op", Some("lsn"))
    assert(LogSync.table(spark, root).filter(col("span_id") === k)
      .head.getAs[String]("body") == "DUP")
    // a superseded old-seq duplicate alone is NOT a conflict either
    val fine = change("U", "WINS", 4L).unionByName(change("D", "x", 1L))
    CdcApply.applyBatch(fine, root, Seq("span_id"), "op", Some("lsn"))
    assert(LogSync.table(spark, root).filter(col("span_id") === k)
      .head.getAs[String]("body") == "WINS")
  }

  test("map-typed changelog metadata survives duplicate collapse (maps are unorderable)") {
    import spark.implicits._
    val root = seedLake(10)
    val k = LogSync.table(spark, root).select("span_id").as[String].head()
    val row = LogSync.table(spark, root).filter(col("span_id") === k)
      .select(lit("U").as("op"), col("timestamp"), col("service_name"),
        col("severity_text"), col("span_id"), lit("MAPPED").as("body"))
      .withColumn("attrs", map(lit("source"), lit("debezium")))
    // a bare dropDuplicates() would throw on the map column; the
    // fingerprint path must both collapse the redelivery AND apply
    CdcApply.applyBatch(row.unionByName(row), root, Seq("span_id"), "op", None)
    assert(LogSync.table(spark, root).filter(col("span_id") === k)
      .head.getAs[String]("body") == "MAPPED")
    assert(!LogSync.table(spark, root).columns.contains("attrs"),
      "changelog metadata columns never land in the table")
  }

  test("a conflicted batch without seqCol is refused, not resolved arbitrarily") {
    import spark.implicits._
    val root = seedLake(10)
    val k = LogSync.table(spark, root).select("span_id").as[String].head()
    val row = LogSync.table(spark, root).filter(col("span_id") === k)
    val conflicted = row.select(lit("U").as("op"), col("timestamp"),
        col("service_name"), col("severity_text"), col("span_id"),
        lit("A").as("body"))
      .unionByName(row.select(lit("D").as("op"), col("timestamp"),
        col("service_name"), col("severity_text"), col("span_id"), col("body")))
    val e = intercept[IllegalArgumentException] {
      CdcApply.applyBatch(conflicted, root, Seq("span_id"), "op", None)
    }
    assert(e.getMessage.contains("seqCol"))
  }

  test("Debezium envelopes drive applyBatch end-to-end: c/u/d, redelivery, tie refusal") {
    import spark.implicits._
    import graft.streaming.CdcDebezium
    val root = seedLake(20)
    val before = LogSync.table(spark, root)

    // envelopes built as REAL Debezium JSON strings (payload-wrapped
    // like the connector with inline schemas): an update for e1 with
    // a decoy at a lower lsn, a delete for e2 (before-image only), an
    // insert of a novel key, a REDELIVERED byte-identical copy of the
    // update (at-least-once), and a Kafka tombstone (null-ish payload)
    def rowJson(df: org.apache.spark.sql.DataFrame): String =
      df.select(to_json(struct(df.columns.map(col): _*))).as[String].head()
    val e1 = rowJson(before.filter(col("span_id") === "e1"))
    val e1New = rowJson(before.filter(col("span_id") === "e1")
      .withColumn("body", lit("DBZ-UPDATED")))
    val e1Decoy = rowJson(before.filter(col("span_id") === "e1")
      .withColumn("body", lit("DBZ-DECOY")))
    val e2 = rowJson(before.filter(col("span_id") === "e2"))
    val novel = rowJson(before.filter(col("span_id") === "e3")
      .withColumn("span_id", lit("dbz-new")).withColumn("body", lit("DBZ-NEW")))
    def env(op: String, beforeJ: String, afterJ: String, lsn: Long): String =
      s"""{"payload":{"before":${Option(beforeJ).getOrElse("null")},""" +
        s""""after":${Option(afterJ).getOrElse("null")},"op":"$op",""" +
        s""""ts_ms":1700000000000,"source":{"lsn":$lsn}}}"""
    val batch = Seq(
      env("u", e1, e1Decoy, 10L),
      env("u", e1, e1New, 11L),
      env("u", e1, e1New, 11L), // redelivery: byte-identical, collapses
      env("d", e2, null, 12L),
      env("c", null, novel, 13L),
      """{"payload":null}""" // tombstone: dropped
    ).toDF("value")
    val changes = CdcDebezium.parse(batch, col("value"), tableSchema)
    CdcApply.applyBatch(changes, root, Seq("span_id"), "op", Some("lsn"))

    val t = LogSync.table(spark, root)
    assert(t.filter(col("span_id") === "e1").select("body")
      .as[String].collect().toSeq == Seq("DBZ-UPDATED"),
      "latest-lsn update wins; the decoy and the redelivery collapse")
    assert(t.filter(col("span_id") === "e2").count() == 0,
      "a d envelope retracts by the before-image's key")
    assert(t.filter(col("span_id") === "dbz-new").count() == 1)
    assert(t.count() == before.count(), "one delete + one insert nets zero")

    // a TIE of two DIFFERENT changes at one lsn refuses (the ordering
    // column cannot resolve it) — straight through the parser
    val tied = Seq(env("u", e1, e1Decoy, 99L), env("u", e1, e1New, 99L))
      .toDF("value")
    val e = intercept[IllegalArgumentException] {
      CdcApply.applyBatch(CdcDebezium.parse(tied, col("value"), tableSchema),
        root, Seq("span_id"), "op", Some("lsn"))
    }
    assert(e.getMessage.contains("lsn"))

    // BARE (schema-less connector) envelopes parse identically
    val bare = Seq(s"""{"before":null,"after":$novel,"op":"r","ts_ms":5}""")
      .toDF("value")
    val parsedBare = CdcDebezium.parse(bare, col("value"), tableSchema)
    assert(parsedBare.count() == 1 &&
      parsedBare.select("op").as[String].head() == CdcApply.OpInsert &&
      parsedBare.select("lsn").as[Long].head() == 5L,
      "bare envelopes fall back to ts_ms ordering")
  }

  test("Debezium MySQL ordering: (binlog file, pos) compose — rotation cannot flip latest-wins") {
    import spark.implicits._
    import graft.streaming.CdcDebezium
    val root = seedLake(20)
    val before = LogSync.table(spark, root)
    def rowJson(df: org.apache.spark.sql.DataFrame): String =
      df.select(to_json(struct(df.columns.map(col): _*))).as[String].head()
    val oldBody = rowJson(before.filter(col("span_id") === "e1")
      .withColumn("body", lit("PRE-ROTATION")))
    val newBody = rowJson(before.filter(col("span_id") === "e1")
      .withColumn("body", lit("POST-ROTATION")))
    // MySQL source: no lsn, (file, pos) instead. The LATER change sits
    // in the NEXT binlog file at a SMALLER pos — bare-pos ordering
    // (the old fallback) would prefer the stale change
    def env(afterJ: String, file: String, pos: Long): String =
      s"""{"payload":{"before":null,"after":$afterJ,"op":"u",""" +
        s""""ts_ms":1700000000000,"source":{"file":"$file","pos":$pos}}}"""
    val batch = Seq(
      env(oldBody, "mysql-bin.000001", 900L),
      env(newBody, "mysql-bin.000002", 5L)).toDF("value")
    val parsed = CdcDebezium.parse(batch, col("value"), tableSchema)
    // the composed order is strictly increasing across the rotation
    val lsns = parsed.orderBy("lsn").select("lsn").as[Long].collect()
    assert(lsns.length == 2 && lsns(0) == (1L << 40) + 900L &&
      lsns(1) == (2L << 40) + 5L, s"composed lsns: ${lsns.toSeq}")
    CdcApply.applyBatch(parsed, root, Seq("span_id"), "op", Some("lsn"))
    assert(LogSync.table(spark, root).filter(col("span_id") === "e1")
      .select("body").as[String].collect().toSeq == Seq("POST-ROTATION"),
      "the post-rotation change must win despite its smaller pos")
    // an OVERSIZED numeric suffix (epoch-named log) would overflow the
    // shift into a wrapped sequence, and ANY fallback scale would
    // inter-order wrongly against composed values — it must REFUSE
    // loudly, never silently corrupt latest-wins
    val epoch = Seq(env(newBody, "binlog.1700000000", 7L)).toDF("value")
    val err = intercept[Exception] {
      CdcDebezium.parse(epoch, col("value"), tableSchema)
        .select("lsn").as[Long].head()
    }
    assert(err.getMessage.contains("binlog ordinal") ||
      Option(err.getCause).exists(_.getMessage.contains("binlog ordinal")),
      s"oversized ordinals must refuse loudly: ${err.getMessage}")
  }
}
