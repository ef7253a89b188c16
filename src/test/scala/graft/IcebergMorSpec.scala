package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{IcebergExport, LakeDml, LogCompact, LogSync, Tables}

/** Merge-on-read position deletes: [[graft.sources.LakeDml.deleteMor]]
  * writes Iceberg v2-shaped position-delete files instead of
  * copy-on-write rewrites; [[graft.sources.LogSync.table]] applies
  * them; [[graft.sources.IcebergExport.export]] chains them as a real
  * v2 delete snapshot readable via the MOR reader.
  */
class IcebergMorSpec extends SparkSpec {

  private def mkLake(batches: Seq[(Int, String)]): String = {
    val root = Files.createTempDirectory("graft_mor").toString
    batches.foreach { case (n, svc) =>
      Tables.events(spark, sf).limit(n)
        .select(col("ts").as("timestamp"), lit(svc).as("service_name"),
          col("event_type").as("severity_text"),
          concat(lit(svc), lit("-"), col("event_id")).as("span_id"),
          col("props").as("body"))
        .write.mode("append").partitionBy("service_name").parquet(root)
    }
    LogSync.sync(spark, root)
    root
  }

  test("deleteMor: no data file rewritten; table() excludes exactly the matched rows") {
    val root = mkLake(Seq((200, "s0"), (150, "s1")))
    val before = LogSync.table(spark, root).count()
    val toDelete = LogSync.table(spark, root)
      .filter(col("severity_text") === "view" && col("service_name") === "s0").count()
    assert(toDelete > 0, "fixture must have rows to delete")
    val filesBefore = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).count()

    val stats = LakeDml.deleteMor(spark, root,
      col("severity_text") === "view" && col("service_name") === "s0")
    assert(stats.rowsChanged == toDelete)
    assert(stats.filesRemoved == 0, "MOR must not touch any data file")
    assert(stats.filesAdded >= 1, "must register at least one delete file")

    val filesAfter = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).count()
    assert(filesAfter == filesBefore, "the data manifest must be untouched")
    assert(LogSync.table(spark, root).count() == before - toDelete)
    assert(LogSync.table(spark, root)
      .filter(col("severity_text") === "view" && col("service_name") === "s0")
      .count() == 0)
    // other services' rows untouched
    assert(LogSync.table(spark, root)
      .filter(col("severity_text") === "view" && col("service_name") === "s1")
      .count() > 0)

    // idempotence: the matched rows are already invisible, so a second
    // identical deleteMor records nothing
    val again = LakeDml.deleteMor(spark, root,
      col("severity_text") === "view" && col("service_name") === "s0")
    assert(again.rowsChanged == 0 && again.filesAdded == 0)
  }

  test("deleteMor: time travel crosses the delete like a data commit") {
    val root = mkLake(Seq((150, "s0")))
    val before = LogSync.table(spark, root).count()
    val preTs = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(20)
    LakeDml.deleteMor(spark, root, col("severity_text") === "view")
    Thread.sleep(20)
    val postTs = new java.sql.Timestamp(System.currentTimeMillis())
    assert(LogSync.tableAsOf(spark, root, preTs).count() == before,
      "a pre-delete snapshot must still answer the deleted rows")
    assert(LogSync.tableAsOf(spark, root, postTs).count() ==
      LogSync.table(spark, root).count())
  }

  test("deleteMor then CoW: the complement rewrite must not resurrect MOR-deleted rows") {
    val root = mkLake(Seq((200, "s0")))
    LakeDml.deleteMor(spark, root, col("severity_text") === "view")
    val afterMor = LogSync.table(spark, root).count()
    val purchases = LogSync.table(spark, root)
      .filter(col("severity_text") === "purchase").count()
    // CoW delete on a DIFFERENT predicate rewrites the same files the
    // MOR delete targeted — the complement must be MOR-applied
    val stats = LakeDml.delete(spark, root, col("severity_text") === "purchase")
    assert(stats.rowsChanged == purchases)
    assert(LogSync.table(spark, root).count() == afterMor - purchases)
    assert(LogSync.table(spark, root).filter(col("severity_text") === "view").count() == 0,
      "CoW rewrite resurrected MOR-deleted rows")
  }

  test("compact materializes MOR deletes; vacuum reclaims the delete files") {
    val root = mkLake(Seq((200, "s0"), (150, "s1")))
    LakeDml.deleteMor(spark, root, col("severity_text") === "view")
    val want = LogSync.table(spark, root)
      .groupBy(col("service_name"), col("severity_text")).count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    LogCompact.compact(spark, root)
    val got = LogSync.table(spark, root)
      .groupBy(col("service_name"), col("severity_text")).count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want, "compaction must preserve the MOR-applied table")
    // the registry is tombstoned: no active delete files remain
    assert(graft.sources.LogSync.posDeleteEntries(spark, root).isEmpty)
    // vacuum with no grace removes the tombstoned delete files
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/_deletes")))
    LogCompact.vacuum(spark, root, graceMs = 0L)
    val remaining = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/_deletes"))
      .flatMap(d => if (d.isDirectory) fs.listStatus(d.getPath).toSeq else Seq(d))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(remaining == 0, s"vacuum must reclaim tombstoned delete files, $remaining left")
    assert(got == LogSync.table(spark, root)
      .groupBy(col("service_name"), col("severity_text")).count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet)
  }

  test("branch pins the delete state: later deleteMor does not leak into the branch") {
    val root = mkLake(Seq((150, "s0")))
    val before = LogSync.table(spark, root).count()
    LogSync.branch(spark, root, "pre")
    LakeDml.deleteMor(spark, root, col("severity_text") === "view")
    assert(LogSync.tableBranch(spark, root, "pre").count() == before,
      "a branch created before the delete must still answer all rows")
    // and a branch created AFTER pins the post-delete state
    LogSync.branch(spark, root, "post")
    assert(LogSync.tableBranch(spark, root, "post").count() ==
      LogSync.table(spark, root).count())
    LogSync.dropBranch(spark, root, "pre")
    LogSync.dropBranch(spark, root, "post")
  }

  test("export chains a v2 delete snapshot; readTable applies it merge-on-read") {
    val root = mkLake(Seq((200, "s0"), (150, "s1")))
    val totalRows = LogSync.table(spark, root).count()
    // export BEFORE the delete so the delete rides a DELTA snapshot
    IcebergExport.export(spark, root)
    LakeDml.deleteMor(spark, root, col("severity_text") === "view")
    IcebergExport.export(spark, root)

    val chain = IcebergExport.snapshots(spark, root)
    assert(chain.length == 2, s"delta export must retain history: $chain")
    assert(chain.last._3.contains(chain.head._1), "parent-snapshot-id must chain")

    // the current snapshot's summary says delete, not overwrite
    val mdDir = new org.apache.hadoop.fs.Path(s"$root/_iceberg/metadata")
    val fs = mdDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hint = new String(fs.open(new org.apache.hadoop.fs.Path(mdDir, "version-hint.text"))
      .readAllBytes(), "UTF-8").trim
    val mdTxt = new String(fs.open(
      new org.apache.hadoop.fs.Path(mdDir, s"v$hint.metadata.json")).readAllBytes(), "UTF-8")
    assert(mdTxt.contains(""""operation":"delete""""),
      "a deletes-only commit must say operation=delete")
    assert(mdTxt.contains(""""added-position-deletes""""))

    // readTable (MOR path) equals the live post-delete table
    val want = LogSync.table(spark, root)
      .groupBy(col("service_name"), col("severity_text")).count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val got = IcebergExport.readTable(spark, root)
      .groupBy(col("service_name"), col("severity_text")).count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want, "exported MOR chain must read back the post-delete table")

    // TIME TRAVEL to the pre-delete snapshot still answers every row
    val preTotal = IcebergExport.readTable(spark, root,
      Some(IcebergExport.BySnapshotId(chain.head._1))).count()
    assert(preTotal == totalRows,
      "the pre-delete snapshot must still answer the deleted rows")
    assert(LogSync.table(spark, root).count() ==
      totalRows - LogSync.posDeleteEntries(spark, root).map(_.rows).sum)
  }

  test("upsertMor: matched rows position-deleted, updates appended, no file rewritten") {
    val root = mkLake(Seq((200, "s0")))
    val before = LogSync.table(spark, root).count()
    val filesBefore = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).count()
    // update 5 existing keys (body changes) + 2 novel keys
    val existing = LogSync.table(spark, root).limit(5)
      .select(col("timestamp"), col("service_name"), col("severity_text"),
        col("span_id"), lit("UPDATED").as("body"))
    val novel = LogSync.table(spark, root).limit(2)
      .select(col("timestamp"), col("service_name"), col("severity_text"),
        concat(lit("novel-"), col("span_id")).as("span_id"),
        lit("NEW").as("body"))
    val ups = existing.unionByName(novel)
    val stats = LakeDml.upsertMor(spark, root, ups, Seq("span_id"))
    assert(stats.rowsChanged == 5, s"$stats")
    assert(stats.filesRemoved == 0, "MOR merge must not rewrite any data file")
    val t = LogSync.table(spark, root)
    assert(t.count() == before - 5 + 7)
    assert(t.filter(col("body") === "UPDATED").count() == 5,
      "matched keys must answer the update row")
    assert(t.filter(col("body") === "NEW").count() == 2)
    // replaced files are NOT tombstoned — they live on, minus positions
    val tombstoned = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNotNull).count()
    assert(tombstoned == 0, "MOR merge must not tombstone data files")
    assert(LogSync.manifest(spark, root).filter(col("removed_at").isNull).count()
      > filesBefore, "the appended update files must register")
    // and the export chains the mixed commit; readTable agrees
    graft.sources.IcebergExport.export(spark, root)
    assert(graft.sources.IcebergExport.readTable(spark, root).count() == t.count())
  }

  test("bloom lookup and grep apply MOR deletes — no side-door resurrection") {
    val root = mkLake(Seq((200, "s0")))
    graft.sources.LakeIndex.build(spark, root, "span_id")
    graft.sources.LakeIndex.buildTokens(spark, root, "body")
    val victim = LogSync.table(spark, root)
      .filter(col("severity_text") === "view").limit(1)
      .select("span_id").head.getString(0)
    assert(graft.sources.LakeIndex.lookup(spark, root, "span_id", Seq(victim))
      .count() == 1)
    LakeDml.deleteMor(spark, root, col("span_id") === victim)
    assert(graft.sources.LakeIndex.lookup(spark, root, "span_id", Seq(victim))
      .count() == 0, "a deleteMor'd row must not resurrect through the bloom lookup")
    // grep: pick a token that appeared only in the victim row? tokens
    // repeat; assert set equality with the MOR-applied table instead
    val term = "k"
    val viaGrep = graft.sources.LakeIndex.grep(spark, root, "body", Seq(term))
      .select("span_id").collect().map(_.getString(0)).toSet
    val direct = LogSync.table(spark, root)
      .filter(array_contains(
        graft.sources.LakeIndex.tokensOf(col("body")), term))
      .select("span_id").collect().map(_.getString(0)).toSet
    assert(viaGrep == direct, "grep must equal the MOR-applied direct filter")
    assert(!viaGrep.contains(victim))
  }

  test("property: deleteMor equals the logical filter for layered predicates") {
    // three stacked deletes on one lake must compose exactly like the
    // conjunction of their negations — including positions shifting
    // meaning as earlier deletes hide rows
    val root = mkLake(Seq((200, "s0"), (150, "s1")))
    val original = LogSync.table(spark, root)
      .select("span_id").collect().map(_.getString(0)).toSet
    val preds = Seq(
      col("severity_text") === "view" && col("service_name") === "s0",
      col("severity_text").isin("purchase", "signup"),
      col("span_id").substr(-1, 1).isin("0", "4", "8"))
    var expected = original
    preds.foreach { p =>
      val toGo = LogSync.table(spark, root).filter(p)
        .select("span_id").collect().map(_.getString(0)).toSet
      LakeDml.deleteMor(spark, root, p)
      expected = expected -- toGo
      val got = LogSync.table(spark, root)
        .select("span_id").collect().map(_.getString(0)).toSet
      assert(got == expected,
        s"layered MOR deletes must equal the logical filter; diff=${
          (got -- expected).take(3)} / ${(expected -- got).take(3)}")
    }
    // and the whole stack survives a fold + a compaction
    LakeDml.compactDeletes(spark, root)
    assert(LogSync.table(spark, root)
      .select("span_id").collect().map(_.getString(0)).toSet == expected)
    LogCompact.compact(spark, root)
    assert(LogSync.table(spark, root)
      .select("span_id").collect().map(_.getString(0)).toSet == expected)
  }

  test("compactDeletes folds delete commits into one file; table and history unchanged") {
    val root = mkLake(Seq((200, "s0")))
    LakeDml.deleteMor(spark, root, col("severity_text") === "view")
    LakeDml.deleteMor(spark, root, col("severity_text") === "purchase")
    LakeDml.deleteMor(spark, root, col("severity_text") === "signup")
    assert(LogSync.posDeleteEntries(spark, root).length == 3)
    val want = LogSync.table(spark, root).count()
    val preTs = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(20)
    val (before, after) = LakeDml.compactDeletes(spark, root)
    assert(before == 3 && after == 1, s"3 delete commits must fold to 1: $before -> $after")
    assert(LogSync.posDeleteEntries(spark, root).length == 1)
    assert(LogSync.table(spark, root).count() == want,
      "folding delete files must not change the table")
    // a historic read still applies the ORIGINAL delete files
    assert(LogSync.tableAsOf(spark, root, preTs).count() == want)
    // idempotent below the threshold
    assert(LakeDml.compactDeletes(spark, root) == (1, 1))
  }

  test("delete files carry the spec's reserved parquet field ids (external engines bind by id)") {
    val root = mkLake(Seq((100, "s0")))
    LakeDml.deleteMor(spark, root, col("severity_text") === "view")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delFile = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/_deletes"))
      .flatMap(d => fs.listStatus(d.getPath)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      delFile, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val schema = try r.getFooter.getFileMetaData.getSchema finally r.close()
    def idOf(name: String): Int =
      schema.getType(Seq(name): _*).getId.intValue
    assert(idOf("file_path") == 2147483546 && idOf("pos") == 2147483545,
      s"position-delete columns must carry the spec's reserved field ids: $schema")
  }

  test("branch-pinned delete files survive vacuum; dropBranch releases them") {
    val root = mkLake(Seq((150, "s0")))
    LakeDml.deleteMor(spark, root, col("severity_text") === "view")
    val postDelete = LogSync.table(spark, root).count()
    LogSync.branch(spark, root, "keepme")
    // compaction materializes + tombstones the registry; a zero-grace
    // vacuum must NOT reclaim the branch-pinned delete file nor purge
    // its manifest row
    graft.sources.LogCompact.compact(spark, root)
    graft.sources.LogCompact.vacuum(spark, root, graceMs = 0L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def delFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/_deletes"))
      .flatMap(d => if (d.isDirectory) fs.listStatus(d.getPath).toSeq else Seq(d))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(delFiles() > 0, "the pinned delete file must survive vacuum")
    assert(LogSync.deleteManifestDf(spark, root).count() > 0,
      "the pinned delete file's manifest row must survive the purge")
    assert(LogSync.tableBranch(spark, root, "keepme").count() == postDelete,
      "the branch must still answer the post-delete table")
    // releasing the pin lets the next vacuum reclaim file AND row
    LogSync.dropBranch(spark, root, "keepme")
    graft.sources.LogCompact.vacuum(spark, root, graceMs = 0L)
    assert(delFiles() == 0, "after dropBranch the delete file is reclaimable")
    assert(LogSync.deleteManifestDf(spark, root)
      .filter(col("removed_at").isNotNull).count() == 0,
      "reclaimed delete files' tombstone rows are purged")
  }

  test("the exported delete manifest round-trips through a plain Avro reader") {
    val root = mkLake(Seq((150, "s0")))
    val stats = LakeDml.deleteMor(spark, root, col("severity_text") === "view")
    IcebergExport.export(spark, root)
    val mdDir = new org.apache.hadoop.fs.Path(s"$root/_iceberg/metadata")
    val fs = mdDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delManifest = fs.listStatus(mdDir).map(_.getPath)
      .find(_.getName.matches("graft-d\\d+-\\d+\\.avro"))
      .getOrElse(fail("export must write a delete manifest"))
    // a generic Avro reader (no graft code) must see spec-shaped
    // entries: ADDED status, content=1 (position deletes), an EMPTY
    // partition record (global — an all-null partitioned record would
    // scope to the null partition), and the registered stats
    val reader = new org.apache.avro.file.DataFileReader(
      new org.apache.avro.mapred.FsInput(delManifest,
        spark.sparkContext.hadoopConfiguration),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    try {
      assert(reader.getMetaString("content") == "deletes")
      assert(reader.getMetaString("partition-spec-id") == "1")
      val entries = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.avro.generic.GenericRecord]
      while (reader.hasNext) entries += reader.next()
      assert(entries.nonEmpty)
      var totalRows = 0L
      entries.foreach { e =>
        assert(e.get("status").asInstanceOf[Int] == 1)
        val d = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
        assert(d.get("content").asInstanceOf[Int] == 1)
        assert(d.get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]
          .getSchema.getFields.isEmpty, "delete partition record must be EMPTY")
        assert(d.get("file_path").toString.startsWith("file://"))
        totalRows += d.get("record_count").asInstanceOf[Long]
      }
      assert(totalRows == stats.rowsChanged,
        "manifest record counts must equal the deleted rows")
    } finally reader.close()
  }

  test("exception events without a message land identically on both transports") {
    import graft.sources.OtlpTraces
    val base = 1705060800000000L
    def row(enc: org.apache.spark.sql.Column) = spark.range(1).select(enc.as("p"))
    val json = OtlpTraces.parse(row(OtlpTraces.toOtlpJson(
      lit(base), lit(base + 1000L), lit("svc"), lit("a" * 32), lit("b" * 16),
      lit(null).cast("string"), lit("op"), lit(2), lit(2),
      lit("TimeoutError"), lit(null).cast("string"),
      lit(null).cast("string"), lit(null).cast("string"))), col("p"))
    graft.functions.VectorFunctions.register(spark)
    val proto = OtlpTraces.parseProto(row(OtlpTraces.toOtlpProtoEvents(
      lit(base), lit(base + 1000L), lit("svc"), lit("a" * 32), lit("b" * 16),
      lit(null).cast("string"), lit("op"), lit(2), lit(2),
      lit("TimeoutError"), lit(null).cast("string"),
      lit(null).cast("string"), lit(null).cast("string"))), col("p"))
    val j = json.select("span_events").head.getString(0)
    val w = proto.select("span_events").head.getString(0)
    assert(j == w, s"transports must land byte-identical events:\nJSON:  $j\nwire: $w")
    assert(!j.contains("exception.message"),
      "an absent message must not land a phantom attribute key")
  }

  test("plan shape: delete-free lakes scan clean; small delete sets broadcast the anti-join") {
    val root = mkLake(Seq((200, "s0")))
    // no delete manifest → the read plan carries NO anti-join at all
    // (every existing lake pays zero for the MOR capability)
    val clean = LogSync.table(spark, root).queryExecution.executedPlan.toString
    assert(!clean.contains("LeftAnti"),
      s"a delete-free lake must not pay the anti-join:\n$clean")
    LakeDml.deleteMor(spark, root, col("severity_text") === "view")
    // small delete set → BROADCAST anti-join (the common case at any
    // scale: deletes ≪ data), never a corpus shuffle
    val plan = LogSync.table(spark, root).queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"deletes must apply:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop") ||
      plan.contains("broadcast"),
      s"a small delete set must ride a broadcast anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the delete anti-join must not shuffle the corpus for a tiny delete set:\n$plan")
  }

  test("deleteEq: keyed retraction; data appended AFTER the delete survives (strictly-below)") {
    val root = mkLake(Seq((200, "s0")))
    val victims = LogSync.table(spark, root)
      .filter(col("severity_text") === "view").select("span_id")
    val nVictims = victims.count()
    val before = LogSync.table(spark, root).count()
    val filesBefore = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).count()

    val stats = LakeDml.deleteEq(spark, root, victims)
    assert(stats.filesRemoved == 0, "equality delete must not touch any data file")
    assert(stats.rowsChanged == nVictims, "rowsChanged counts distinct keys")
    assert(LogSync.manifest(spark, root).filter(col("removed_at").isNull).count()
      == filesBefore, "the data manifest must be untouched")
    assert(LogSync.table(spark, root).count() == before - nVictims)
    assert(LogSync.table(spark, root)
      .filter(col("severity_text") === "view").count() == 0)

    // a row RE-ADDED after the delete shares a deleted key but a
    // strictly higher data sequence — the v2 rule keeps it visible
    val one = victims.limit(1).head.getString(0)
    Tables.events(spark, sf).limit(1)
      .select(col("ts").as("timestamp"), lit("s0").as("service_name"),
        lit("view").as("severity_text"), lit(one).as("span_id"),
        lit("REBORN").as("body"))
      .write.mode("append").partitionBy("service_name").parquet(root)
    LogSync.sync(spark, root)
    val reborn = LogSync.table(spark, root).filter(col("span_id") === one)
    assert(reborn.count() == 1 && reborn.head.getAs[String]("body") == "REBORN",
      "a re-added key must survive an EARLIER equality delete")
  }

  test("upsertEq: one keyed commit; inserts survive their own delete (tie sequence)") {
    val root = mkLake(Seq((200, "s0")))
    val before = LogSync.table(spark, root).count()
    val existing = LogSync.table(spark, root).limit(5)
      .select(col("timestamp"), col("service_name"), col("severity_text"),
        col("span_id"), lit("UPDATED").as("body"))
    val novel = LogSync.table(spark, root).limit(2)
      .select(col("timestamp"), col("service_name"), col("severity_text"),
        concat(lit("novel-"), col("span_id")).as("span_id"),
        lit("NEW").as("body"))
    val keys = existing.unionByName(novel).select("span_id")
      .collect().map(_.getString(0)).toSet

    val stats = LakeDml.upsertEq(spark, root, existing.unionByName(novel), Seq("span_id"))
    assert(stats.filesRemoved == 0, "equality merge must not rewrite any data file")
    assert(stats.rowsChanged == 7, "rowsChanged counts distinct retraction keys")
    val t = LogSync.table(spark, root)
    assert(t.count() == before - 5 + 7)
    assert(t.filter(col("body") === "UPDATED").count() == 5,
      "matched keys must answer exactly the update rows")
    assert(t.filter(col("body") === "NEW").count() == 2)
    // the tie rule, directly: the delete and the inserted files share
    // one sequence number, and the inserts are visible
    val delSeqs = LogSync.deleteEntries(spark, root).filter(_.isEq).map(_.seq)
    assert(delSeqs.nonEmpty)
    val insSeqs = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull && col("op") === "upsert")
      .select("seq").collect().map(_.getLong(0)).toSet
    assert(delSeqs.toSet.subsetOf(insSeqs),
      s"upsertEq's delete (${delSeqs}) and inserts ($insSeqs) must share a sequence")
    // each updated key answers EXACTLY one row (old retracted, new kept)
    val dup = t.filter(col("span_id").isin(keys.toSeq: _*))
      .groupBy("span_id").count().filter(col("count") > 1).count()
    assert(dup == 0, "no key may answer both the old and the new row")
  }

  test("deleteEq is null-safe: a null key row retracts rows whose key IS NULL") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_mor").toString
    Tables.events(spark, sf).limit(50)
      .select(col("ts").as("timestamp"), lit("s0").as("service_name"),
        col("event_type").as("severity_text"),
        when(col("event_id") % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("e"), col("event_id"))).as("span_id"),
        col("props").as("body"))
      .write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    val nullRows = LogSync.table(spark, root).filter(col("span_id").isNull).count()
    assert(nullRows > 0, "fixture must carry null keys")
    LakeDml.deleteEq(spark, root, Seq(Option.empty[String]).toDF("span_id"))
    assert(LogSync.table(spark, root).filter(col("span_id").isNull).count() == 0,
      "a null equality key must retract null-keyed rows (<=> semantics)")
    assert(LogSync.table(spark, root).count() == 50 - nullRows,
      "non-null keys must be untouched by a null retraction")
  }

  test("deleteEq: time travel crosses the delete; compaction materializes it") {
    val root = mkLake(Seq((150, "s0")))
    val before = LogSync.table(spark, root).count()
    val preTs = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(20)
    val victims = LogSync.table(spark, root)
      .filter(col("severity_text") === "purchase").select("span_id")
    LakeDml.deleteEq(spark, root, victims)
    val after = LogSync.table(spark, root).count()
    assert(after < before)
    assert(LogSync.tableAsOf(spark, root, preTs).count() == before,
      "a pre-delete snapshot must still answer the retracted rows")
    // compaction materializes the equality delete and retires it
    LogCompact.compact(spark, root)
    assert(LogSync.deleteEntries(spark, root).isEmpty,
      "compaction must tombstone the materialized equality delete")
    assert(LogSync.table(spark, root).count() == after)
    assert(LogSync.table(spark, root)
      .filter(col("severity_text") === "purchase").count() == 0,
      "restated files must not resurrect equality-deleted rows")
  }

  test("deleteEq then CoW on another predicate: no resurrection through the complement") {
    val root = mkLake(Seq((200, "s0")))
    val victims = LogSync.table(spark, root)
      .filter(col("severity_text") === "view").select("span_id")
    LakeDml.deleteEq(spark, root, victims)
    val afterEq = LogSync.table(spark, root).count()
    val purchases = LogSync.table(spark, root)
      .filter(col("severity_text") === "purchase").count()
    LakeDml.delete(spark, root, col("severity_text") === "purchase")
    assert(LogSync.table(spark, root).count() == afterEq - purchases)
    assert(LogSync.table(spark, root).filter(col("severity_text") === "view").count() == 0,
      "CoW rewrite resurrected equality-deleted rows")
    // the restated files carry a sequence ABOVE the equality delete's,
    // so the (still-active) delete no longer applies to them — yet the
    // rows it retracted stay gone because the rewrite materialized it
    val eqSeq = LogSync.deleteEntries(spark, root).filter(_.isEq).map(_.seq).max
    val restatedSeqs = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull && col("op") === "rewrite")
      .select("seq").collect().map(_.getLong(0))
    assert(restatedSeqs.nonEmpty && restatedSeqs.forall(_ > eqSeq),
      s"restated files (seq $restatedSeqs) must sit strictly above the delete ($eqSeq)")
  }

  test("export groups interleaved commits into sequence-consistent snapshots") {
    import spark.implicits._
    val root = mkLake(Seq((200, "s0")))
    IcebergExport.export(spark, root)
    val preChain = IcebergExport.snapshots(spark, root).length
    // delete K, then APPEND a batch re-adding one key of K — one
    // export must carry both, and the re-added row must survive the
    // (sequence-earlier) delete both internally and externally
    val victims = LogSync.table(spark, root)
      .filter(col("severity_text") === "view").select("span_id")
    val one = victims.limit(1).head.getString(0)
    LakeDml.deleteEq(spark, root, victims)
    Tables.events(spark, sf).limit(1)
      .select(col("ts").as("timestamp"), lit("s0").as("service_name"),
        lit("view").as("severity_text"), lit(one).as("span_id"),
        lit("REBORN").as("body"))
      .write.mode("append").partitionBy("service_name").parquet(root)
    LogSync.sync(spark, root)
    IcebergExport.export(spark, root)

    val want = LogSync.table(spark, root)
      .groupBy(col("service_name"), col("severity_text")).count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val ext = IcebergExport.readTable(spark, root)
    val got = ext.groupBy(col("service_name"), col("severity_text")).count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want, "exported chain must equal the live table")
    assert(ext.filter(col("span_id") === one).count() == 1,
      "the re-added key must survive the earlier equality delete externally")

    // now the REVERSE interleaving: append data, THEN equality-delete
    // over it — the export must START A NEW SNAPSHOT for the delete
    // (folding it into the data's snapshot would un-apply it)
    val two = LogSync.table(spark, root)
      .filter(col("severity_text") === "purchase").limit(1)
      .select("span_id").head.getString(0)
    Tables.events(spark, sf).limit(3)
      .select(col("ts").as("timestamp"), lit("s0").as("service_name"),
        lit("late").as("severity_text"),
        concat(lit("late-"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .write.mode("append").partitionBy("service_name").parquet(root)
    LogSync.sync(spark, root)
    LakeDml.deleteEq(spark, root, Seq(two).toDF("span_id"))
    IcebergExport.export(spark, root)
    val chain = IcebergExport.snapshots(spark, root)
    assert(chain.length >= preChain + 3,
      s"data-then-eq-delete must split into separate snapshots: ${chain.length}")
    val want2 = LogSync.table(spark, root)
      .groupBy(col("service_name"), col("severity_text")).count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val got2 = IcebergExport.readTable(spark, root)
      .groupBy(col("service_name"), col("severity_text")).count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got2 == want2, "reverse interleaving must read back exactly")
    assert(IcebergExport.readTable(spark, root)
      .filter(col("span_id") === two).count() == 0,
      "the later equality delete must apply to the earlier data externally")
  }

  test("equality delete files carry the EXPORT's field ids; manifests carry content=2 + equality_ids") {
    val root = mkLake(Seq((100, "s0")))
    val victims = LogSync.table(spark, root)
      .filter(col("severity_text") === "view").select("span_id")
    LakeDml.deleteEq(spark, root, victims)
    IcebergExport.export(spark, root)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    // the delete parquet's span_id column carries the export's id
    val wantId = graft.sources.IcebergExport.exportFieldIds(spark, root)("span_id")
    val delFile = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/_deletes"))
      .filter(_.getPath.getName.startsWith("e"))
      .flatMap(d => fs.listStatus(d.getPath)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(delFile, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val schema = try r.getFooter.getFileMetaData.getSchema finally r.close()
    assert(schema.getType(Seq("span_id"): _*).getId.intValue == wantId,
      s"equality-delete column must carry the export's field id $wantId: $schema")
    // a plain Avro reader sees a content=2 entry naming that id
    val mdDir = new org.apache.hadoop.fs.Path(s"$root/_iceberg/metadata")
    val eqEntries = fs.listStatus(mdDir).map(_.getPath)
      .filter(_.getName.matches("graft-d\\d+-\\d+\\.avro"))
      .flatMap { p =>
        val reader = new org.apache.avro.file.DataFileReader(
          new org.apache.avro.mapred.FsInput(p, conf),
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        try {
          val buf = scala.collection.mutable.ArrayBuffer
            .empty[org.apache.avro.generic.GenericRecord]
          while (reader.hasNext) buf += reader.next()
          buf.toSeq
        } finally reader.close()
      }
      .map(_.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord])
      .filter(_.get("content").asInstanceOf[Int] == 2)
    assert(eqEntries.nonEmpty, "export must write a content=2 equality-delete entry")
    eqEntries.foreach { d =>
      val ids = d.get("equality_ids").asInstanceOf[java.util.List[Int]]
      assert(ids != null && ids.size == 1 && ids.get(0) == wantId,
        s"equality_ids must name the export's field id $wantId: $ids")
    }
  }

  test("pos-delete maintenance leaves equality deletes alone; they retire via compaction") {
    val root = mkLake(Seq((200, "s0")))
    LakeDml.deleteMor(spark, root, col("severity_text") === "view")
    LakeDml.deleteMor(spark, root, col("severity_text") === "signup")
    val victims = LogSync.table(spark, root)
      .filter(col("severity_text") === "purchase").select("span_id")
    LakeDml.deleteEq(spark, root, victims)
    val want = LogSync.table(spark, root).count()
    // compactDeletes folds the two position commits, never the eq one
    val (nb, na) = LakeDml.compactDeletes(spark, root)
    assert(nb == 2 && na == 1, s"pos-delete fold: $nb -> $na")
    assert(LogSync.deleteEntries(spark, root).count(_.isEq) == 1,
      "equality deletes must survive a position-delete fold")
    assert(LogSync.table(spark, root).count() == want)
    // vacuumDeletes (target-file based) must not tombstone eq entries
    LakeDml.vacuumDeletes(spark, root)
    assert(LogSync.deleteEntries(spark, root).count(_.isEq) == 1)
    assert(LogSync.table(spark, root).count() == want)
  }

  test("vacuumDeletes tombstones delete files whose targets were all rewritten") {
    val root = mkLake(Seq((200, "s0")))
    LakeDml.deleteMor(spark, root, col("severity_text") === "view")
    assert(LakeDml.vacuumDeletes(spark, root) == 0,
      "live targets: nothing to tombstone yet")
    // CoW delete rewrites every file containing purchases — which in a
    // one-service lake is every file the MOR delete targeted too
    LakeDml.delete(spark, root, col("severity_text") === "purchase")
    val want = LogSync.table(spark, root).count()
    assert(LakeDml.vacuumDeletes(spark, root) >= 1)
    assert(LogSync.posDeleteEntries(spark, root).isEmpty)
    assert(LogSync.table(spark, root).count() == want,
      "tombstoning inert delete files must not change the table")
  }
}
