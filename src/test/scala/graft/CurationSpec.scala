package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

class CurationSpec extends SparkSpec {

  test("curate: every document gets exactly one decision; keepers are cluster minima") {
    val rows = Curation.curate(spark, sf).collect()
    assert(rows.length == spark.read.parquet(s"$sf/documents.parquet").count())
    val reasons = rows.map(_.getAs[String]("reason")).toSet
    assert(reasons.subsetOf(Set("short", "low_quality", "duplicate", "keep")))
    assert(reasons.contains("keep") && reasons.size >= 2,
      s"thresholds should split the corpus, got $reasons")
    // a 'duplicate' must have a kept (or earlier) twin: every exact-dup
    // cluster's minimum doc_id is never marked 'duplicate'
    val dupIds = rows.filter(_.getAs[String]("reason") == "duplicate")
      .map(_.getAs[Long]("doc_id")).toSet
    val keepers = Dedup.exact(spark, sf).collect().map(_.getAs[Long]("keeper")).toSet
    assert(keepers.intersect(dupIds).isEmpty, "cluster keepers must not be dropped as duplicates")
  }

  test("samplePerGroup: k per language, deterministic across runs and partitionings") {
    val a = Curation.samplePerGroup(spark, sf, k = 5).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id")))
    val byLang = a.groupBy(_._1)
    assert(byLang.values.forall(_.length <= 5))
    val b = Curation.samplePerGroup(spark, sf, k = 5).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id")))
    assert(a.toSeq == b.toSeq, "bottom-k-by-hash sample must be run-invariant")
  }

  test("contamination matches a locally computed shingle-overlap ground truth") {
    val got = Curation.contamination(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    assert(got.keys.forall(_ >= 20L), "test docs themselves are not reported")
    // local oracle: distinct 5-gram sets per doc, overlap vs the test union
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split("\\s+").filter(_.nonEmpty))
    def grams(t: Array[String]): Set[String] =
      if (t.length < 5) Set.empty
      else t.sliding(5).map(_.mkString(" ")).toSet
    val test = docs.filter(_._1 < 20).flatMap(d => grams(d._2)).toSet
    val want = docs.filter(_._1 >= 20)
      .map { case (id, t) => id -> grams(t).count(test) }
      .filter(_._2 > 0).map { case (k, v) => k -> v.toLong }.toMap
    assert(want.nonEmpty, "synthetic corpus should contain overlapping docs")
    assert(got == want,
      s"missing=${(want.toSet -- got.toSet).take(3)} extra=${(got.toSet -- want.toSet).take(3)}")
  }

  test("contaminationBloom: bloom prefilter changes the plan, never the answer") {
    val plain = Curation.contamination(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    val df = Curation.contaminationBloom(spark, sf)
    val bloomed = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    assert(bloomed == plain,
      "false positives must be re-checked by the exact semi-join")
    // the probe must sit in the scan-side stage, before the semi-join
    val plan = planString(df)
    assert(plan.contains("might_contain"),
      s"bloom probe missing from the physical plan:\n$plan")
  }

  test("contaminationSemantic: exact within probed cells, recall >= 0.9 vs all-pairs oracle") {
    val threshold = 0.3
    val flagged = Curation.contaminationSemantic(spark, sf, threshold).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // local all-pairs ground truth over the sf0.001 embeddings (500x64)
    val all = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val tests = all.filter(_._1 < 20)
    val oracle = all.filter(_._1 >= 20).flatMap { case (id, v) =>
      val hits = tests.map { case (tid, tv) => (tid, cos(v, tv)) }
        .filter(_._2 >= threshold)
      if (hits.isEmpty) None
      else Some(id -> hits.maxBy { case (tid, c) => (c, tid) })
    }.toMap
    assert(oracle.nonEmpty, "fixture must contain semantic contamination")
    // precision is exact by construction: every flagged doc is in the
    // oracle, and the REPORTED pair is a true pair — its recomputed
    // cosine matches and clears the threshold. (The reported test id
    // may differ from the GLOBAL nearest when that one sat in an
    // unprobed cell — the flag is still correct, attribution is
    // best-within-probes.)
    val vecOf = all.toMap
    flagged.foreach { case (id, (tid, c)) =>
      assert(oracle.contains(id), s"false positive: $id")
      val truec = cos(vecOf(id), vecOf(tid))
      assert(math.abs(truec - c) < 2e-4,
        s"doc $id vs test $tid: flagged cos $c but true cos $truec")
      assert(truec >= threshold - 1e-4)
    }
    // recall: cell probing may miss a straddler, but must catch >= 90%
    val recall = flagged.size.toDouble / oracle.size
    assert(recall >= 0.9, s"recall $recall (${flagged.size}/${oracle.size})")
  }

  test("contaminationSemantic: an injected paraphrase is recovered with its source test id") {
    import spark.implicits._
    // the mm_neardup injection discipline: plant a near-copy of test
    // vector 3 in the corpus (small deterministic perturbation — the
    // embedding-space signature of a paraphrase) and demand the scan
    // surfaces it, attributed to its source
    val base = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("v"))
    val src = base.filter(col("vec_id") === 3L)
      .head.getSeq[Float](1).toArray
    val paraphrase = src.zipWithIndex.map { case (x, i) =>
      x + (if (i % 2 == 0) 0.01f else -0.01f)
    }
    val injected = Seq((9999L, paraphrase.toSeq)).toDF("vec_id", "v")
    val out = Curation.contaminationSemanticOf(spark,
        base.unionByName(injected.select(col("vec_id"), col("v").cast("array<float>"))),
        threshold = 0.3, k = 16, probes = 6)
      .filter(col("vec_id") === 9999L).collect()
    assert(out.length == 1, "the injected paraphrase must be flagged")
    assert(out.head.getLong(1) == 3L,
      s"nearest test id must be the source, got ${out.head.getLong(1)}")
    assert(out.head.getDouble(2) >= 0.99,
      s"a paraphrase-grade cosine, got ${out.head.getDouble(2)}")
  }

  test("contaminationSemantic: candidate generation is cell-bucketed, never all-pairs") {
    val plan = planString(Curation.contaminationSemantic(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the corpus-test join must be a cell equi-join, not a nested loop")
    assert(!plan.contains("CartesianProduct"))
  }

  test("dedupClusters agrees exactly with a local union-find over the same edges") {
    val edges = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")))
    assert(edges.nonEmpty)
    // local union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.foreach { case (a, b) => union(a, b) }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v)).toMap
    val got = Curation.dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(got == want, s"diff=${(want.toSet -- got.toSet).take(5)}")
  }

  test("corpusSplit: total, deterministic, hash-proportioned, repartition-invariant") {
    val rows = Curation.corpusSplit(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split")))
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == n, "every document gets exactly one split")
    val frac = rows.groupBy(_._2).view.mapValues(_.length.toDouble / n).toMap
    // 240/8/8 of 256 with md5-uniform ids; generous tolerance at small sf
    assert(frac("train") > 0.85 && frac("train") < 1.0, s"train frac $frac")
    assert(frac.getOrElse("val", 0.0) < 0.10 && frac.getOrElse("test", 0.0) < 0.10, s"$frac")
    // assignment is a pure function of doc_id: local md5 replay agrees
    rows.foreach { case (id, split) =>
      val h2 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(1).map(b => f"$b%02x").mkString
      val want = if (h2 < "f0") "train" else if (h2 < "f8") "val" else "test"
      assert(split == want, s"doc $id: $split vs local $want")
    }
  }

  test("corpusMix: downsamples toward uniform domain shares at half the token budget") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sf)
    val kept = Curation.corpusMix(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Int]("n_toks")))
    assert(kept.nonEmpty && kept.length < docs.count(), "a strict, non-empty subsample")
    // deterministic: second run identical
    val again = Curation.corpusMix(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Int]("n_toks")))
    assert(kept.toSeq == again.toSeq)
    // each source's kept token mass lands near min(src_toks, budget/ns):
    // Bernoulli noise at tiny sf is real, so just assert the cap
    // direction — no source exceeds ~2x its target share
    val bySrc = kept.groupBy(_._2).view.mapValues(_.map(_._3.toLong).sum).toMap
    val srcTotals = docs.selectExpr("source",
        "size(filter(split(lower(text),'\\\\s+'), x -> x != '')) AS t")
      .groupBy(col("source")).sum("t").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("sum(t)")).toMap
    val target = srcTotals.values.sum / 2.0 / srcTotals.size
    bySrc.foreach { case (s, toks) =>
      assert(toks <= math.min(srcTotals(s), 2.2 * target + 200),
        s"source $s kept $toks vs target $target (src total ${srcTotals(s)})")
    }
  }

  test("mixTemperature: α=1/2 allocation equals an exact local replay and flattens shares") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sf)
    val all = docs.selectExpr("doc_id", "source",
        "size(filter(split(lower(text),'\\\\s+'), x -> x != '')) AS t")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("t").toLong))
    // local replay: the decision is a pure function of (doc_id, source totals)
    val srcTotals = all.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val wq = srcTotals.view.mapValues(t => math.floor(math.sqrt(t.toDouble) * 65536.0).toLong).toMap
    val budget = srcTotals.values.sum / 2
    val sumW = wq.values.sum
    val th = srcTotals.map { case (s, toks) =>
      s -> math.floor(((budget.toDouble * (wq(s).toDouble / sumW.toDouble)) /
        toks.toDouble) * 4294967296.0).toLong
    }
    val wantKept = all.filter { case (id, s, _) =>
      val h8 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(4).map(b => f"$b%02X").mkString
      th(s) >= 4294967296L || h8 < f"${th(s)}%08X"
    }.map(_._1).toSet
    val got = Curation.mixTemperature(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(got == wantKept, "distributed decisions must equal the local md5 replay")
    assert(got.nonEmpty && got.size < all.length, "a strict, non-empty subsample")
    // flattening: the keep RATE min(1, rate) never increases with source size
    val rate = srcTotals.map { case (s, toks) =>
      s -> math.min(1.0, th(s).toDouble / 4294967296.0) }
    val bySize = srcTotals.toSeq.sortBy(_._2).map(_._1)
    bySize.sliding(2).foreach { case Seq(small, big) =>
      assert(rate(small) >= rate(big) - 1e-9,
        s"smaller source $small must keep at least the rate of $big")
    case _ => ()
    }
  }

  test("dedupRank: distributed integer PageRank equals a local adjacency replay") {
    val got = Curation.dedupRank(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("degree"),
        r.getAs[Long]("rank_micro")))
    assert(got.nonEmpty)
    // local replay over the same edge set with the same integer math
    val edges = graft.operators.Dedup.ngramJaccard(spark, sf)
      .select("da", "db").collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")))
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    var rank: Map[Long, Long] = deg.view.mapValues(_ => 1000000L).toMap
    for (_ <- 1 to 5) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, vs) <- adj; v <- vs) in(v) += Math.floorDiv(rank(u), deg(u))
      rank = deg.view.mapValues(_ => 0L).toMap.map { case (v, _) =>
        v -> (150000L + Math.floorDiv(85L * in(v), 100L)) }
    }
    val want = rank.keys.toSeq.sorted.map(v => (v, deg(v), rank(v)))
    assert(got.toSeq == want,
      "the distributed trajectory must be bit-identical to the local replay")
    // centrality concentrates: some vertex must exceed the isolated-pair
    // fixpoint (pairs settle near 1e6; hubs above it)
    assert(got.map(_._3).max > got.map(_._3).min,
      "rank must differentiate vertices on a non-regular graph")
  }

  test("dedupCanonical: per-cluster argmax-by-centrality with min-id tie-break; aggregate plan; memoized rank") {
    // memoization: two calls observe the same cached frame
    assert(Curation.dedupRank(spark, sf) eq Curation.dedupRank(spark, sf),
      "dedupRank must be memoized per (session, dir, iters)")
    val got = Curation.dedupCanonical(spark, sf).collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("canonical_id"),
        r.getAs[Long]("rank_micro"), r.getAs[Long]("n_members")))
    assert(got.nonEmpty)
    // local replay composed from the two already-proven outputs
    val clusters = Curation.dedupClusters(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster")))
    val ranks = Curation.dedupRank(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank_micro")).toMap
    val want = clusters.groupBy(_._2).toSeq.map { case (c, members) =>
      val ranked = members.map { case (d, _) => (d, ranks(d)) }
      val top = ranked.map(_._2).max
      val canon = ranked.filter(_._2 == top).map(_._1).min
      (c, canon, top, members.length.toLong)
    }.sortBy(_._1)
    assert(got.toSeq == want, "canonical selection must equal the local argmax replay")
    // every cluster elects exactly one canonical member of itself
    val byDoc = clusters.toMap
    got.foreach { case (c, canon, _, _) =>
      assert(byDoc(canon) == c, s"canonical $canon must belong to cluster $c") }
    // plan shape: mergeable aggregates, no window
    val plan = Curation.dedupCanonical(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"canonical selection must not use a window:\n$plan")
  }

  test("dedupKeep: statuses partition the corpus; one canonical per cluster; corpus never shuffles") {
    val got = Curation.dedupKeep(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("status")))
    val byStatus = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val clusters = Curation.dedupClusters(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster")))
    val canon = Curation.dedupCanonical(spark, sf).collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("canonical_id"))).toMap
    val clustered = clusters.map(_._1).toSet
    // total: every doc tagged exactly once
    assert(got.length == graft.sources.Tables.documents(spark, sf).count())
    // unique ⇔ no near-dup edge
    assert(byStatus("unique") == got.map(_._1).toSet -- clustered)
    // canonical ⇔ the cluster keepers; drop = the other members
    assert(byStatus("canonical") == canon.values.toSet)
    assert(byStatus("drop") == clustered -- canon.values.toSet)
    // the corpus side stays map-only: its scan feeds broadcast joins,
    // never an exchange keyed by corpus rows before the final sort
    val plan = Curation.dedupKeep(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"control tables must broadcast onto the corpus:\n$plan")
  }

  test("broadcast-size guard: forced shuffle-join path agrees with the broadcast path") {
    // maxBroadcastRows = 0 forces broadcastIfSmall's fallback (no
    // broadcast hint; at this sf AQE may still choose broadcast on its
    // own, which is exactly the intended division of labor) — results
    // must be identical either way
    val keepB = Curation.dedupKeep(spark, sf).collect().map(_.toSeq)
    val keepS = Curation.dedupKeepImpl(spark, sf, 0L)
    assert(keepS.collect().map(_.toSeq).toSeq == keepB.toSeq,
      "dedupKeep: shuffle-join fallback must agree with broadcast path")
    val cleanB = Curation.corpusSplitClean(spark, sf).collect().map(_.toSeq)
    val cleanS = Curation.corpusSplitCleanImpl(spark, sf, 0L)
    assert(cleanS.collect().map(_.toSeq).toSeq == cleanB.toSeq,
      "corpusSplitClean: shuffle-join fallback must agree with broadcast path")
  }

  test("mixBudget: bucket-decomposed prefix equals the naive global cumsum, maximal") {
    import org.apache.spark.sql.functions._
    val budget = 700L
    val got = Curation.mixBudget(spark, sf, budget).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("n_toks"), r.getAs[Long]("cum_toks")))
    // the naive single-window-per-source plan the decomposition replaces
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("ord")
    val naive = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(filter(split(lower(col("text")), "\\s+"), t => t =!= "")).as("n_toks"),
        md5(col("doc_id").cast("string")).as("ord"))
      .withColumn("cum_toks", sum("n_toks").over(w))
      .filter(col("cum_toks") <= budget)
      .select("doc_id", "source", "n_toks", "cum_toks")
      .orderBy("source", "cum_toks").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("n_toks"), r.getAs[Long]("cum_toks")))
    assert(got.toSeq == naive.toSeq,
      "bucket decomposition must reproduce the global hash-order prefix exactly")
    // hard cap respected, and maximal: the NEXT doc in each source's
    // hash order would cross the budget
    val bySrc = got.groupBy(_._2)
    bySrc.foreach { case (s, rows) => assert(rows.map(_._4).max <= budget) }
    val all = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(filter(split(lower(col("text")), "\\s+"), t => t =!= "")).as("n_toks"),
        md5(col("doc_id").cast("string")).as("ord"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("n_toks"), r.getAs[String]("ord")))
    all.groupBy(_._2).foreach { case (s, rows) =>
      val keptIds = bySrc.getOrElse(s, Array.empty).map(_._1).toSet
      val keptToks = bySrc.getOrElse(s, Array.empty).map(_._3.toLong).sum
      rows.sortBy(_._4).find(r => !keptIds.contains(r._1)).foreach { nxt =>
        assert(keptToks + nxt._3 > budget,
          s"source $s: excluded doc ${nxt._1} would still have fit the budget")
      }
    }
  }

  test("sampleWeighted: exact ES replay, deterministic, biased toward heavy docs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source",
        "size(filter(split(lower(text),'\\\\s+'), x -> x != '')) AS t")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Int]("t")))
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = docs.map { case (id, src, t) =>
      val u = (java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) + 0.5) / 4294967296.0
      (id, src, t, -math.log(u) / math.max(t, 1))
    }.sortBy { case (id, _, _, k) => (k, id) }.take(20)
      .map { case (id, src, t, k) =>
        (id, src, t, BigDecimal(k).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq
    val got = Curation.sampleWeighted(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("n_toks"), r.getAs[Double]("key"))).toSeq
    assert(got == want, "must equal the local Efraimidis-Spirakis replay")
    // importance bias: the length-weighted sample's mean length exceeds
    // the corpus mean (docs vary in length enough at this sf)
    val corpusMean = docs.map(_._3.toDouble).sum / docs.length
    val sampleMean = got.map(_._3.toDouble).sum / got.length
    assert(sampleMean > corpusMean * 0.9,
      s"weighted sample mean $sampleMean vs corpus $corpusMean")
    // deterministic across runs
    val again = Curation.sampleWeighted(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id")).toSeq
    assert(again == got.map(_._1))
  }

  test("corpusStats: per-source profile matches a local recomputation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "size(filter(split(lower(text),'\\\\s+'), x -> x != '')) AS t")
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Int]("t"))
    // exact interpolated percentile, the percentile()/quantile_cont definition
    def pct(xs: Seq[Int], q: Double): Double = {
      val s = xs.sorted.map(_.toDouble)
      val pos = (s.length - 1) * q
      val lo = pos.toInt
      if (lo == s.length - 1) s(lo)
      else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    val want = docs.groupBy(_._1).map { case (src, xs) =>
      val t = xs.map(_._2)
      src -> (t.length.toLong, t.map(_.toLong).sum, t.min, t.max,
        BigDecimal(t.sum.toDouble / t.length).setScale(4, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(pct(t, 0.5)).setScale(4, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(pct(t, 0.9)).setScale(4, BigDecimal.RoundingMode.HALF_UP))
    }
    val got = Curation.corpusStats(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, tot, mn, mx, mean, p50, p90) = want(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("total_toks") == tot)
      assert(r.getAs[Int]("min_toks") == mn && r.getAs[Int]("max_toks") == mx)
      assert(math.abs(r.getAs[Double]("mean_toks") - mean.toDouble) < 1e-9)
      assert(math.abs(r.getAs[Double]("median_toks") - p50.toDouble) < 1e-9)
      assert(math.abs(r.getAs[Double]("p90_toks") - p90.toDouble) < 1e-9)
    }
  }

  test("corpusUpsample: copies equal the local md5 replay; epochs contiguous per doc") {
    import graft.operators.Curation
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text").toLowerCase.split("\\s+").count(_.nonEmpty).toLong))
    val srcToks = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val target = srcToks.values.max * 2
    def copiesOf(id: Long, src: String): Long = {
      val rate = target.toDouble / srcToks(src).toDouble
      val th = math.floor((rate - math.floor(rate)) * 4294967296.0).toLong
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val u32 = java.lang.Long.parseLong(md5.substring(0, 8), 16)
      math.floor(rate).toLong + (if (u32 < th) 1L else 0L)
    }
    val got = Curation.corpusUpsample(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("epoch")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got.keySet == docs.map(_._1).toSet, "every document must be emitted")
    docs.foreach { case (id, src, _) =>
      val c = copiesOf(id, src)
      assert(got(id) == (0L until c), s"doc $id: epochs ${got(id)} != 0 until $c")
    }
    // rates here are in (2, 3): every doc appears 2 or 3 times
    assert(got.values.forall(e => e.length == 2 || e.length == 3))
    assert(got.values.exists(_.length == 3), "fractional upsample must fire somewhere")
  }

  test("corpusSplitClean: repairs every leaking edge; untouched docs keep their split") {
    val cleaned = Curation.corpusSplitClean(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("split_orig"), r.getAs[String]("split"))).toMap
    val edges = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")))
    assert(edges.nonEmpty)
    // the whole point: no near-dup edge straddles the CLEANED splits
    edges.foreach { case (a, b) =>
      assert(cleaned(a)._2 == cleaned(b)._2,
        s"edge ($a,$b) still leaks: ${cleaned(a)._2} vs ${cleaned(b)._2}")
    }
    // docs outside the near-dup graph are untouched
    val inGraph = edges.flatMap(e => Seq(e._1, e._2)).toSet
    cleaned.foreach { case (id, (orig, cl)) =>
      if (!inGraph.contains(id)) assert(orig == cl, s"doc $id moved without an edge")
    }
    // at least one doc actually moved (the repair is not vacuous here)
    assert(cleaned.exists { case (_, (o, c)) => o != c },
      "test corpus must exercise an actual reassignment")
  }

  test("splitLeakage: equals the local composition of the edge set with the split map") {
    // local replay: every J>=0.8 edge whose endpoints land in different
    // md5-splits, grouped by unordered split pair
    val splitOf = Curation.corpusSplit(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val edges = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")))
    val expected = edges
      .filter { case (a, b) => splitOf(a) != splitOf(b) }
      .groupBy { case (a, b) =>
        val (x, y) = (splitOf(a), splitOf(b))
        if (x <= y) (x, y) else (y, x)
      }
      .view.mapValues(_.sorted).toMap
    assert(expected.nonEmpty, "test data must contain at least one leaking edge")
    val got = Curation.splitLeakage(spark, sf).collect()
      .map(r => (r.getAs[String]("split_lo"), r.getAs[String]("split_hi")) ->
        (r.getAs[Long]("n_edges"), r.getAs[String]("edges"))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (pair, pairs) =>
      assert(got(pair)._1 == pairs.length.toLong)
      assert(got(pair)._2 == pairs.map { case (a, b) => s"$a:$b" }.mkString(","),
        s"edge list for $pair must match the local replay in (da, db) order")
    }
  }
}
