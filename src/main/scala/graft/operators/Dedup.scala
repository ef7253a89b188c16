package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deduplication suite over `documents` — the operators a 100 TB
  * training-data pipeline needs. Design notes per operator:
  *
  *  - exact: hash-groupBy on a canonical fingerprint. One shuffle keyed
  *    by the 128-bit hash; map-side partial counts.
  *  - n-gram Jaccard: inverted-index candidate join (explode shingles →
  *    equi-join on shingle) — shuffles O(docs × shingles), never the
  *    O(docs²) cross product. This is the exact-correctness baseline.
  *  - MinHash+LSH: fixed-size signatures (64 perms → 16 bands × 4 rows)
  *    so the candidate join keys on band hashes; candidate pairs are
  *    then verified against exact Jaccard. The 100 TB path: per-doc
  *    state is constant-size regardless of document length.
  *  - SimHash: 64-bit signature, banded buckets, hamming-distance
  *    verification. Same constant-state scaling argument.
  *  - embedding cosine: exact all-pairs baseline (N is small for the
  *    test corpus); the LSH-bucketed scale path lives in
  *    [[Similarity.annLsh]].
  */
object Dedup {

  import TextAnalysis.toks

  /** distinct 3-token shingles per document. */
  private def shingleArr(t: Column): Column =
    when(size(t) >= 3,
      array_distinct(transform(sequence(lit(0), size(t) - 3),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))))
      .otherwise(array().cast("array<string>"))

  /** (doc_id, shingle) inverted index, distinct. */
  private def shingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(shingleArr(toks(col("text")))).as("s"))

  /** Exact dedup on the canonical fingerprint: clusters with >1 doc. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.fingerprintExpr(col("text")).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .filter(col("n_docs") > 1)
      .orderBy(col("h"))

  /** Exact 3-gram Jaccard near-dup pairs (J ≥ 0.8) via inverted-index
    * join: |A∩B| from the shingle equi-join, |A∪B| = |A|+|B|−|A∩B|.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir).cache()
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    val jac = col("inter").cast("double") /
      (col("na") + col("nb") - col("inter"))
    inter
      .join(broadcast(sz.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na")), "da")
      .join(broadcast(sz.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb")), "db")
      .filter(jac >= 0.8)
      .select(col("da"), col("db"), round(jac, 4).as("j"))
      .orderBy(col("da"), col("db"))
  }

  // 64 deterministic (a,b) pairs for the universal-hash permutations.
  private val P = 2147483647L // 2^31 - 1
  private val perms: Seq[(Long, Long)] =
    (1 to 64).map(k => ((1103515245L * k + 12345L) % P, (214013L * k + 2531011L) % P))

  /** MinHash(64) + LSH(16 bands × 4 rows) candidate generation, then
    * exact-Jaccard verification of candidates (J ≥ 0.7). No SQL oracle:
    * signatures depend on Spark's xxhash64; the spec instead checks
    * that every exact J ≥ 0.8 pair from [[ngramJaccard]] is recalled.
    */
  def minhash(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir).cache()
    val hashed = sh.withColumn("h", pmod(xxhash64(col("s")), lit(P)))
    val sigCols = perms.zipWithIndex.map { case ((a, b), k) =>
      min(pmod(col("h") * a + b, lit(P))).as(s"sig_$k")
    }
    val sigs = hashed.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val bands = (0 until 16).map { bIdx =>
      struct(lit(bIdx).as("band"),
        xxhash64((0 until 4).map(r => col(s"sig_${bIdx * 4 + r}")): _*).as("bh"))
    }
    val buckets = sigs
      .select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    // exact-Jaccard verification restricted to candidates
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
      .join(cand, Seq("da", "db"), "left_semi")
    val jac = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
    inter
      .join(broadcast(sz.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na")), "da")
      .join(broadcast(sz.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb")), "db")
      .filter(jac >= 0.7)
      .select(col("da"), col("db"), round(jac, 4).as("j"))
      .orderBy(col("da"), col("db"))
  }

  /** 64-bit SimHash near-dup pairs: banded buckets (4 × 16 bits) for
    * candidates, hamming ≤ 3 on the full signature to verify. No SQL
    * oracle (xxhash64-dependent); spec checks hamming bounds and that
    * high-Jaccard pairs collide.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val tokens = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"bit_$b")
    }
    val sigs = tokens.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        array((0 until 64).map(b => when(col(s"bit_$b") > 0, 1).otherwise(0)): _*).as("bits"))
    val bandVal = (k: Int) =>
      (0 until 16).map(j => element_at(col("bits"), k * 16 + j + 1) * (1 << j))
        .reduce(_ + _)
    val buckets = sigs.select(col("doc_id"), col("bits"),
        explode(array((0 until 4).map(k => struct(lit(k).as("band"), bandVal(k).as("bv"))): _*)).as("bb"))
      .select(col("doc_id"), col("bits"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    val hamming = aggregate(
      zip_with(col("a.bits"), col("b.bits"), (x, y) => when(x =!= y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"), hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("da"), col("db"))
  }

  /** Embedding-cosine near-dup pairs (cos ≥ 0.45 — the synthetic
    * embeddings are random, so 0.45 marks the far tail). Exact
    * all-pairs baseline in double precision; mirrored in the oracle.
    */
  def embeddingPairs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
    val dot = aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val cosc = dot / (col("a.nrm") * col("b.nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(cosc >= 0.45)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"), round(cosc, 4).as("cos"))
      .orderBy(col("va"), col("vb"))
  }
}
