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
}
