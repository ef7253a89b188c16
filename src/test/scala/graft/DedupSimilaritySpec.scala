package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}

class DedupSimilaritySpec extends SparkSpec {

  test("dedup_exact: clusters have >1 doc and a min-doc keeper") {
    val rows = Dedup.exact(spark, sf).collect()
    assert(rows.nonEmpty, "synthetic corpus should contain canonical duplicates")
    assert(rows.forall(_.getAs[Long]("n_docs") > 1))
  }

  test("ngramJaccard: pairs are symmetric-free, j in [0.8, 1]") {
    val rows = Dedup.ngramJaccard(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("da") < r.getAs[Long]("db")))
    assert(rows.forall { r => val j = r.getAs[Double]("j"); j >= 0.8 && j <= 1.0 })
  }

  test("IvfIndex: disk-backed query equals annIvf exactly; scan prunes to probed cells") {
    import graft.operators.IvfIndex
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("cos"))).toSeq
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val k = IvfIndex.cellCount(n)
    assert(k >= 8, s"√N cells expected, got k=$k for n=$n")
    val got = rows(IvfIndex.query(spark, sf))
    val want = rows(Similarity.annIvf(spark, sf, nprobe = 3, k = k))
    assert(got == want, "index read must not change the IVF answer at the same cells")
    // the probed-cell IN list must reach the scan as a partition filter
    val plan = formattedPlan(IvfIndex.query(spark, sf))
    val pf = plan.linesIterator.filter(_.trim.startsWith("PartitionFilters:"))
      .find(_.contains("cell"))
      .getOrElse(fail(s"cell filter never reached a scan's PartitionFilters:\n$plan"))
    assert(pf.contains("IN") || pf.contains("in("), s"expected an IN partition filter: $pf")
  }

  test("IvfIndex: a single query probes nprobe/√N cells — real pruning, query set from outside") {
    import org.apache.spark.sql.functions.col
    import graft.operators.IvfIndex
    val k = IvfIndex.cellCount(spark.read.parquet(s"$sf/embeddings.parquet").count())
    val one = spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") === 0)
    val df = IvfIndex.query(spark, sf, nprobe = 3, querySet = Some(one))
    assert(df.count() == 5, "top-5 for the single query")
    // the IN list on the scan must carry exactly nprobe cell ids — the
    // scanned fraction is 3/k of the corpus, k ≈ √N
    val pf = formattedPlan(df).linesIterator
      .filter(_.trim.startsWith("PartitionFilters:")).find(_.contains("cell"))
      .getOrElse(fail("cell filter missing from PartitionFilters"))
    val inList = "IN \\(([^)]*)\\)".r.findFirstMatchIn(pf).map(_.group(1)).getOrElse("")
    val nIds = inList.split(",").count(_.trim.nonEmpty)
    assert(nIds > 0 && nIds <= 3, s"single query must probe <= nprobe cells, got: $pf")
    assert(3 < k / 2, s"probe set must be well under half the $k cells")
  }

  test("IvfIndex.append: new vectors join their nearest cell, queryable immediately") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions.col
    import graft.operators.IvfIndex
    // isolated corpus dir so the shared per-dir index is untouched
    val tmp = Files.createTempDirectory("graft_ivf_inc").toString
    Files.copy(Paths.get(s"$sf/embeddings.parquet"), Paths.get(s"$tmp/embeddings.parquet"))
    IvfIndex.ensure(spark, tmp)
    val base = spark.read.parquet(s"$tmp/embeddings.parquet")
    val n0 = spark.read.parquet(IvfIndex.activePath(spark, tmp)).count()
    // twins of the first five vectors, new ids — arrival-batch stand-in
    val twins = base.filter(col("vec_id") < 5)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    assert(IvfIndex.append(spark, tmp, twins) == 5)
    val idx = spark.read.parquet(IvfIndex.activePath(spark, tmp))
    assert(idx.count() == n0 + 5, "inverted lists grew by the batch size")
    // identical embedding => identical nearest centroid => same cell
    val cellOf = idx.select("vec_id", "cell").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    (0 until 5).foreach(i =>
      assert(cellOf(i + 10000L) == cellOf(i.toLong), s"twin of $i in the wrong cell"))
    // queryable with no rebuild: each original's twin surfaces at cos 1.0
    val res = IvfIndex.query(spark, tmp,
      querySet = Some(base.filter(col("vec_id") < 5))).collect()
    (0 until 5).foreach { i =>
      val hits = res.filter(_.getAs[Long]("q_id") == i.toLong)
      assert(hits.exists(r => r.getAs[Long]("vec_id") == i + 10000L &&
        r.getAs[Double]("cos") == 1.0), s"appended twin of $i not found")
    }
    // a PQ code mirror must grow with the inverted lists it mirrors:
    // build codes, append more twins, codes cover them too
    val (_, codesPath) = IvfIndex.ensurePq(spark, tmp)
    val nCodes0 = spark.read.parquet(codesPath).count()
    assert(nCodes0 == n0 + 5, "codes cover the whole index at build time")
    val more = base.filter(col("vec_id") >= 5 && col("vec_id") < 8)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    assert(IvfIndex.append(spark, tmp, more) == 3)
    val codes = spark.read.parquet(codesPath)
    assert(codes.count() == n0 + 8, "appended vectors are PQ-coded too")
    val codedIds = codes.select("vec_id").collect().map(_.getLong(0)).toSet
    (5 until 8).foreach(i => assert(codedIds.contains(i + 10000L), s"twin of $i uncoded"))
  }

  test("IvfIndex.retrain: versioned rewrite folds appended data in; old version survives until dropped") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions.col
    import graft.operators.IvfIndex
    val tmp = Files.createTempDirectory("graft_ivf_rt").toString
    Files.copy(Paths.get(s"$sf/embeddings.parquet"), Paths.get(s"$tmp/embeddings.parquet"))
    val (v1, _) = IvfIndex.ensure(spark, tmp)
    assert(v1 == 1)
    val base = spark.read.parquet(s"$tmp/embeddings.parquet")
    val twins = base.filter(col("vec_id") < 8)
      .select((col("vec_id") + 20000).as("vec_id"), col("embedding"), col("label"))
    IvfIndex.append(spark, tmp, twins)
    val statsBefore = IvfIndex.cellStats(spark, tmp).collect()
    val total = statsBefore.map(_.getAs[Long]("n")).sum
    val v1Path = IvfIndex.activePath(spark, tmp)

    val v2 = IvfIndex.retrain(spark, tmp)
    assert(v2 == 2)
    // every vector (source + appended) survives the rewrite
    val after = IvfIndex.cellStats(spark, tmp).collect()
    assert(after.map(_.getAs[Long]("n")).sum == total)
    // the superseded version keeps serving in-flight readers until dropped
    assert(spark.read.parquet(v1Path).count() == total)
    IvfIndex.dropVersion(spark, tmp, 1)
    assert(!new java.io.File(v1Path.stripPrefix("file:")).exists)
    // queries on the retrained index still find the appended twins exactly
    val res = IvfIndex.query(spark, tmp,
      querySet = Some(base.filter(col("vec_id") < 8))).collect()
    (0 until 8).foreach { i =>
      val hits = res.filter(_.getAs[Long]("q_id") == i.toLong)
      assert(hits.exists(r => r.getAs[Long]("vec_id") == i + 20000L &&
        r.getAs[Double]("cos") == 1.0), s"twin of $i lost by retrain")
    }
    // dropping the active version must be refused
    intercept[IllegalArgumentException] { IvfIndex.dropVersion(spark, tmp, 2) }
  }

  test("annPq: product-quantized ADC + exact rerank recalls >= 0.9 of exact top-5") {
    import graft.operators.Similarity
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val exact = top(Similarity.annTopk(spark, sf))
    val pq = top(Similarity.annPq(spark, sf))
    assert(pq.size == exact.size, "same (query, k) result shape")
    val recall = (exact & pq).size.toDouble / exact.size
    info(s"PQ recall@5 = $recall (16 code bytes per 64-float vector)")
    assert(recall >= 0.9, s"recall@5 $recall")
    // reranked scores are EXACT cosines: every common pair's cos matches
    val exactCos = Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos")).toMap
    Similarity.annPq(spark, sf).collect().foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      exactCos.get(k).foreach(c => assert(c == r.getAs[Double]("cos"), s"cos mismatch $k"))
    }
  }

  test("annIvfPq: IVF-pruned ADC + exact rerank recalls >= 0.9 of exact top-5") {
    import graft.operators.Similarity
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val exact = top(Similarity.annTopk(spark, sf))
    val ivfpq = top(Similarity.annIvfPq(spark, sf))
    assert(ivfpq.size == exact.size, "same (query, k) result shape")
    val recall = (exact & ivfpq).size.toDouble / exact.size
    info(s"IVFPQ recall@5 = $recall (nprobe=6 cells, 16 code bytes/vector)")
    assert(recall >= 0.9, s"recall@5 $recall")
    // reranked scores are EXACT cosines: every common pair's cos matches
    val exactCos = Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos")).toMap
    Similarity.annIvfPq(spark, sf).collect().foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      exactCos.get(k).foreach(c => assert(c == r.getAs[Double]("cos"), s"cos mismatch $k"))
    }
  }

  test("ANN query-set parameter: a non-contract query frame works across the family") {
    import graft.operators.Opq
    import graft.sources.Tables
    import org.apache.spark.sql.functions.col
    // a query set the contract never uses: 10 corpus vectors far from
    // the vec_id<10 demo set. Every operator must accept it, return
    // one top-5 block per query, and the approximate ones must recall
    // the exact results computed over the SAME set.
    val qs = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 40 && col("vec_id") < 50)
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val exact = top(Similarity.annTopk(spark, sf, queries = Some(qs)))
    assert(exact.map(_._1) == (40L until 50L).toSet,
      "exact top-k must answer for exactly the provided queries")
    assert(exact.size == 50)
    def recallOf(df: org.apache.spark.sql.DataFrame, tag: String,
                 floor: Double): Unit = {
      val got = top(df)
      assert(got.map(_._1) == (40L until 50L).toSet, s"$tag answers wrong queries")
      val recall = (exact & got).size.toDouble / exact.size
      info(s"$tag recall@5 on the non-contract set = $recall")
      assert(recall >= floor, s"$tag recall $recall < $floor")
    }
    recallOf(Similarity.annQuantized(spark, sf, queries = Some(qs)), "int8", 0.9)
    recallOf(Similarity.annPq(spark, sf, queries = Some(qs)), "pq", 0.8)
    // harder queries probe more cells — the standard recall/cost knob
    recallOf(Similarity.annIvfPq(spark, sf, nprobe = 12, queries = Some(qs)), "ivfpq", 0.8)
    recallOf(Opq.annOpq(spark, sf, queries = Some(qs)), "opq", 0.8)
    recallOf(Similarity.annLsh(spark, sf, queries = Some(qs)), "lsh", 0.2)
    recallOf(Similarity.annIvf(spark, sf, queries = Some(qs)), "ivf", 0.2)
    // the filtered variant restricts to the query's own label stripe
    val filt = Similarity.annFiltered(spark, sf, queries = Some(qs)).collect()
    val labelOf = Tables.embeddings(spark, sf).filter(col("vec_id") < 60)
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    assert(filt.map(_.getAs[Long]("q_id")).toSet == (40L until 50L).toSet)
    filt.foreach { r =>
      assert(r.getAs[Int]("label") == labelOf(r.getAs[Long]("q_id")),
        "filtered results must stay in the query's label stripe")
    }
  }

  test("annIvfPq: probed scan prunes via PartitionFilters and evaluates no float dot") {
    import graft.operators.Similarity
    val scored = Similarity.ivfPqScores(spark, sf)
    val plan = formattedPlan(scored)
    // the probe-cell IN list must land in the codes scan's partition
    // pruning — the non-probed (k - nprobe)/k of the corpus is never read
    val pf = plan.linesIterator.filter(_.trim.startsWith("PartitionFilters:"))
      .find(_.contains("cell"))
      .getOrElse(fail(s"cell filter never reached PartitionFilters:\n$plan"))
    assert(pf.contains("IN") || pf.contains("in("), s"expected an IN partition filter: $pf")
    // the heavy pass is pure table lookups — a float dot in this plan
    // means the 16x compression bought nothing
    assert(!plan.contains("graft_dot"), s"probed scan must not evaluate a float dot:\n$plan")
    assert(scored.count() > 0)
  }

  test("ANN family plans: bounded-heap TopK everywhere, no Window, no rank sort") {
    import graft.operators.Similarity
    // every candidate cut and final ranking runs through the custom
    // bounded-heap operator: a Window(row_number) would sort each
    // query's ENTIRE candidate list in one task — the per-q_id plan
    // the round-6 verdict flagged as the family's scale-killer. The
    // candidate set also stays a DataFrame end-to-end (no driver
    // collect into an isin literal), which the TopK node's presence
    // INSIDE one connected plan certifies: a collect would split the
    // lineage into two separate plans.
    for ((name, df) <- Seq(
        "ann_topk" -> Similarity.annTopk(spark, sf),
        "ann_ivf" -> Similarity.annIvf(spark, sf),
        "ann_lsh" -> Similarity.annLsh(spark, sf),
        "ann_quantized" -> Similarity.annQuantized(spark, sf),
        "ann_pq" -> Similarity.annPq(spark, sf),
        "ann_ivfpq" -> Similarity.annIvfPq(spark, sf),
        "ann_ivf_index" -> graft.operators.IvfIndex.query(spark, sf),
        "ann_opq" -> graft.operators.Opq.annOpq(spark, sf),
        "ann_filtered" -> Similarity.annFiltered(spark, sf))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$name: Window node in plan:\n$plan")
      assert(plan.contains("TopKPerGroup"), s"$name: expected TopKPerGroupExec:\n$plan")
    }
    // the rerank'd variants carry TWO TopK nodes in ONE plan:
    // candidate cut + final ranking, with no lineage break between
    for ((name, df) <- Seq(
        "ann_quantized" -> Similarity.annQuantized(spark, sf),
        "ann_pq" -> Similarity.annPq(spark, sf),
        "ann_ivfpq" -> Similarity.annIvfPq(spark, sf),
        "ann_opq" -> graft.operators.Opq.annOpq(spark, sf))) {
      val plan = df.queryExecution.executedPlan.toString
      val n = plan.sliding("TopKPerGroup".length).count(_ == "TopKPerGroup")
      assert(n >= 2, s"$name: candidate cut + rerank must BOTH be TopK nodes (got $n):\n$plan")
    }
  }

  test("annQuantized: int8 scan + exact rerank recalls >= 0.95 of exact top-5") {
    import graft.operators.Similarity
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val exact = top(Similarity.annTopk(spark, sf))
    val quant = top(Similarity.annQuantized(spark, sf))
    assert(quant.size == exact.size, "same (query, k) result shape")
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall@5 $recall")
    // reranked scores are EXACT cosines: every common pair's cos matches
    val exactCos = Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos")).toMap
    Similarity.annQuantized(spark, sf).collect().foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      exactCos.get(k).foreach(c => assert(c == r.getAs[Double]("cos"), s"cos mismatch $k"))
    }
  }

  test("ann_opq: rotated PQ recalls >= 0.9 of exact top-5; allocation balances variance") {
    import graft.operators.{Opq, Similarity}
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val exact = top(Similarity.annTopk(spark, sf))
    val opq = top(Opq.annOpq(spark, sf))
    assert(opq.size == exact.size, "same (query, k) result shape")
    val recall = (exact & opq).size.toDouble / exact.size
    info(s"OPQ recall@5 = $recall (PCA rotation + eigenvalue allocation, 16 bytes/vec)")
    assert(recall >= 0.9, s"recall@5 $recall")
    // reranked scores are EXACT cosines in the ORIGINAL space
    val exactCos = Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos")).toMap
    Opq.annOpq(spark, sf).collect().foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      exactCos.get(k).foreach(c => assert(c == r.getAs[Double]("cos"), s"cos mismatch $k"))
    }
    // the rotation is the permuted orthonormal PCA basis, and the
    // greedy allocation spreads per-subspace log-variance sums
    // STRICTLY tighter than the naive contiguous chunking of the
    // descending spectrum (which parks the top-sub directions in one
    // codebook — the imbalance OPQ's allocation exists to avoid)
    val m = Opq.model(spark, sf)
    val dim = m.rot.length
    val sub = dim / 16
    def lg(v: Double) = math.log(math.max(v, 1e-12))
    val sums = m.eigvals.grouped(sub).map(_.map(lg).sum).toSeq
    val contiguous = graft.operators.Pca.fit(spark, sf).eigvals
      .grouped(sub).map(_.map(lg).sum).toSeq
    info(f"allocation log-variance spread: greedy ${sums.max - sums.min}%.2f vs contiguous ${contiguous.max - contiguous.min}%.2f")
    assert(sums.max - sums.min < contiguous.max - contiguous.min,
      "greedy allocation must balance better than contiguous chunking")
    for (i <- 0 until dim; j <- i until dim) {
      val d = m.rot(i).zip(m.rot(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("jacobi: diagonalizes the equal-diagonal 45-degree block (signum(0) regression)") {
    // [[v,v],[v,v]] has equal diagonal entries: theta = 0, and a
    // signum-based rotation sign would make every pivot a no-op
    val (vals, vecs) = graft.operators.Pca.jacobi(
      Array(Array(2.0, 2.0), Array(2.0, 2.0)))
    assert(vals.sorted.zip(Seq(0.0, 4.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 },
      s"eigenvalues ${vals.toSeq} must be {0, 4}")
    // columns are orthonormal eigenvectors
    val dot01 = (0 until 2).map(i => vecs(i)(0) * vecs(i)(1)).sum
    assert(math.abs(dot01) < 1e-12)
  }

  test("emb_pca: orthonormal basis, eigenvalues = projected variance, beats uniform spread") {
    import graft.operators.Pca
    val m = Pca.fit(spark, sf)
    val dim = m.mean.length
    // orthonormal components
    for (i <- m.comps.indices; j <- i until m.comps.length) {
      val d = m.comps(i).zip(m.comps(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"comp $i · comp $j = $d")
    }
    // eigenvalues descending, non-negative (to fp noise)
    m.eigvals.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-9) }
    assert(m.eigvals.forall(_ > -1e-9))
    // LOCAL REPLAY: the variance of the data projected on component j
    // IS eigenvalue j — checked from the collected vectors
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    for (j <- 0 until 4) {
      val c = m.comps(j)
      val projs = vecs.map(v => v.zip(c).map { case (a, b) => a * b }.sum)
      val mu = projs.sum / projs.length
      val varj = projs.map(p => (p - mu) * (p - mu)).sum / projs.length
      assert(math.abs(varj - m.eigvals(j)) <= 1e-6 * math.max(1.0, m.eigvals(j)),
        s"eigval $j ${m.eigvals(j)} vs replay variance $varj")
    }
    // top-8 capture >= uniform 8/dim of total variance (PCA optimality
    // floor; equality only for perfectly isotropic data)
    val total = m.eigvals.sum
    val top8 = m.eigvals.take(8).sum
    info(f"top-8/total variance = ${top8 / total}%.3f (uniform floor ${8.0 / dim}%.3f)")
    assert(top8 / total >= 8.0 / dim - 1e-12)
    // the contract query agrees with a local projection of the model
    val rows = Pca.embPca(spark, sf).collect()
    assert(rows.length == vecs.length)
    val byId = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    rows.take(50).foreach { r =>
      val v = byId(r.getAs[Long]("vec_id"))
      val got = r.getSeq[Double](2)
      m.comps.take(8).zip(got).foreach { case (c, g) =>
        val want = v.zip(c).map { case (a, b) => a * b }.sum -
          c.zip(m.mean).map { case (a, b) => a * b }.sum
        assert(math.abs(want - g) < 1e-9, s"projection mismatch: $want vs $g")
      }
    }
  }

  test("quantize8/dot8: self-dot positive, symmetric, bounded by 127^2*dim") {
    import org.apache.spark.sql.functions._
    graft.functions.VectorFunctions.register(spark)
    val rows = spark.read.parquet(s"$sf/embeddings.parquet").limit(20)
      .select(call_function("graft_quantize8", col("embedding")).as("b"),
        size(col("embedding")).as("dim"))
      .select(call_function("graft_dot8", col("b"), col("b")).as("dd"), col("dim"))
      .collect()
    rows.foreach { r =>
      val dd = r.getAs[Long]("dd")
      assert(dd > 0 && dd <= 127L * 127L * r.getAs[Int]("dim"), s"self-dot $dd")
    }
  }

  test("incremental: bipartite batch-vs-corpus pairs match a local replay") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def sh(t: String): Set[String] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val shs = docs.map { case (id, t) => id -> sh(t) }.toMap
    val (batch, corpus) = docs.map(_._1).partition(_ % 5 == 4)
    val want = (for {
      a <- batch; b <- corpus
      inter = (shs(a) & shs(b)).size
      union = shs(a).size + shs(b).size - inter
      if union > 0 && inter.toDouble / union >= 0.8
    } yield (a, b)).toSet
    val got = Dedup.incremental(spark, sf).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("old_id"))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty, "synthetic corpus should have cross-batch near-dups")
  }

  test("minhash LSH recalls every exact J>=0.8 pair") {
    val exact = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    val mh = Dedup.minhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(exact.nonEmpty)
    val missed = exact -- mh
    assert(missed.isEmpty, s"minhash missed high-similarity pairs: $missed")
  }

  test("simhash: hamming <= 3 and near-identical docs collide") {
    val rows = Dedup.simhash(spark, sf).collect()
    assert(rows.forall(_.getAs[Int]("hamming") <= 3))
    // the most similar exact pair should also be a simhash pair
    val top = Dedup.ngramJaccard(spark, sf).collect()
      .maxBy(_.getAs[Double]("j"))
    val pairs = rows.map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(pairs.contains((top.getAs[Long]("da"), top.getAs[Long]("db"))),
      s"simhash should catch the J=${top.getAs[Double]("j")} pair")
  }

  test("embeddingPairs: cos in [0.45, 1], ordered pairs") {
    val rows = Dedup.embeddingPairs(spark, sf).collect()
    assert(rows.forall { r => val c = r.getAs[Double]("cos"); c >= 0.45 && c <= 1.0 })
    assert(rows.forall(r => r.getAs[Long]("va") < r.getAs[Long]("vb")))
  }

  test("embeddingPairs: LSH-bucketed result equals the exact all-pairs oracle") {
    def toSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb"), r.getAs[Double]("cos"))).toSet
    val lsh = toSet(Dedup.embeddingPairs(spark, sf).collect())
    val exact = toSet(Dedup.embeddingPairsAllPairs(spark, sf).collect())
    assert(exact.nonEmpty)
    assert(lsh == exact,
      s"banded LSH must recall every >=0.45 pair here; missed ${exact -- lsh}, extra ${lsh -- exact}")
  }

  test("embeddingPairs: plan has no BroadcastNestedLoopJoin") {
    val plan = planString(Dedup.embeddingPairs(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "candidate generation must be an equi-join on (band, bucket), not an all-pairs join")
  }

  test("ngram df-cap prunes stop-shingle buckets but keeps true near-dups") {
    import spark.implicits._
    val hot = "common boilerplate header phrase repeated verbatim in every single document"
    val hotDocs = (0L until 30L).map(i => (i, s"$hot unique$i filler${i}a filler${i}b"))
    val dupPair = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val docs = (hotDocs ++ dupPair).toDF("doc_id", "text")
    // capped: the df=30 stop-shingles generate no candidates at all
    val pairs = Dedup.ngramJaccardOn(docs, dfCap = 10).collect()
    assert(pairs.map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSeq == Seq((100L, 101L)))
    assert(pairs.head.getAs[Double]("j") == 1.0)
    // bucket-size bound: 1 candidate pair capped vs ~465 pairs uncapped
    val shingled = Dedup.docShinglesOf(docs)
    val capped = Dedup.ngramCandidates(shingled, dfCap = 10).count()
    val uncapped = Dedup.ngramCandidates(shingled, dfCap = 1000).count()
    assert(capped == 1L, s"capped index must yield only the true pair, got $capped")
    assert(uncapped > 400L, s"uncapped hot shingle should create a quadratic bucket, got $uncapped")
  }

  test("annLsh: recall holds when planes scale to 256 buckets") {
    val exact = Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val lsh = Similarity.annLsh(spark, sf, planes = 8).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    info(s"LSH recall@5 at 256 buckets = $recall (scans ~9/256 of corpus)")
    assert(recall >= 0.05, s"recall $recall too low for 256-bucket multiprobe")
    assert(lsh.nonEmpty)
  }

  test("annIvf: unsupervised kmeans cells also recover neighbors") {
    val exact = Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Similarity.annIvf(spark, sf, nprobe = 6, k = 24).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@5 (kmeans nprobe=6/24) = $recall")
    assert(recall >= 0.2, s"recall $recall too low")
  }

  test("annTopk: plan broadcasts the query side, streams the corpus") {
    val plan = planString(Similarity.annTopk(spark, sf))
    // e.join(broadcast(q)) => the 10-row query set is the (right) build
    // side; broadcasting the corpus instead would OOM at scale
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"),
      s"expected query side as broadcast build side, plan:\n$plan")
  }

  test("annTopk: 5 ranked neighbors per query, cos non-increasing") {
    val rows = Similarity.annTopk(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 5))
    byQ.values.foreach { rs =>
      val cs = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("annLsh: multiprobe recall@5 >= 0.2 vs brute force") {
    val exact = Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val lsh = Similarity.annLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    info(s"LSH recall@5 = $recall (scans ~5/16 of corpus)")
    assert(recall >= 0.2, s"recall $recall too low")
  }

  test("annIvf: probing 3/10 cells recovers most true neighbors") {
    val exact = Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Similarity.annIvf(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@5 (nprobe=3/10) = $recall")
    assert(recall >= 0.3, s"recall $recall too low")
  }

  test("streaming enrichment joins the static dimension per batch") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_enrich").toString
    graft.sources.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val streamed = graft.streaming.EventStream.enriched(
      graft.streaming.EventStream.read(spark, dir),
      graft.sources.Tables.customer(spark, sf))
    val q = streamed.writeStream.format("memory").queryName("enriched_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val out = spark.table("enriched_out")
    assert(out.count() == graft.sources.Tables.events(spark, sf).count())
    assert(out.columns.contains("c_nationkey"))
  }

  test("text stats: quality in [0,1]; tokens consistent with stats") {
    val st = TextAnalysis.stats(spark, sf).collect()
    assert(st.forall { r => val q = r.getAs[Double]("quality"); q >= 0 && q <= 1 })
    val tk = TextAnalysis.tokens(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tokens")).toMap
    assert(st.forall(r => tk(r.getAs[Long]("doc_id")) == r.getAs[Int]("n_tokens")))
  }

  test("graft_topk_idx: NaN scores are never selected; all-NaN yields empty, not a crash") {
    val rows = spark.sql(
      """SELECT graft_topk_idx(array(1.0d, cast('NaN' as double), 3.0d), 2) AS a,
        |       graft_topk_idx(array(cast('NaN' as double), cast('NaN' as double)), 2) AS b,
        |       graft_topk_idx(array(cast('-Infinity' as double), 5.0d), 2) AS c
        |""".stripMargin).collect()(0)
    assert(rows.getSeq[Int](0) == Seq(2, 0), "NaN must be skipped, not ranked")
    assert(rows.getSeq[Int](1) == Seq.empty, "all-NaN input returns no indices")
    assert(rows.getSeq[Int](2) == Seq(1, 0), "-Infinity is still selectable")
  }

  test("annFiltered: pre-filter honors the predicate and beats post-filtering") {
    val got = Similarity.annFiltered(spark, sf).collect()
    // the query's own label is echoed: every neighbor satisfies the predicate
    val qLabels = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.get(r.fieldIndex("label"))).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.get(r.fieldIndex("label")) == qLabels(r.getAs[Long]("q_id")),
        s"neighbor label must equal query label for q ${r.get(0)}")
      assert(qLabels(r.getAs[Long]("vec_id")) == r.get(r.fieldIndex("label")))
    }
    // per query: ranks contiguous from 1, scores non-increasing
    got.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length))
      val cs = byRank.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"q=$q scores not sorted")
    }
    // pre-filter == post-filter-with-big-k: restricting annTopk's pool
    // to same-label rows gives the same top-5 set per query
    val sameLabelTop = {
      import org.apache.spark.sql.functions._
      val e = spark.read.parquet(s"$sf/embeddings.parquet").collect()
        .map(r => (r.getAs[Long]("vec_id"), r.get(r.fieldIndex("label")),
          r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray))
      def cos(a: Array[Double], b: Array[Double]): Double = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      e.filter(_._1 < 10).flatMap { case (q, ql, qv) =>
        e.filter(c => c._2 == ql && c._1 != q)
          .map(c => (q, c._1, cos(qv, c._3)))
          .sortBy { case (_, id, c) => (-c, id) }
          .take(5).map { case (qq, id, _) => (qq, id) }
      }.toSet
    }
    assert(got.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet == sameLabelTop,
      "filtered top-5 must equal the local same-label brute force")
  }

  test("embProject: deterministic, linear, and JL-distance-preserving on average") {
    val a = Similarity.embProject(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](r.fieldIndex("proj")))
    val b = Similarity.embProject(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](r.fieldIndex("proj")))
    assert(a.toSeq == b.toSeq, "seeded projection must be bit-identical across runs")
    assert(a.forall(_._2.length == 8))
    // JL: projected squared distances are unbiased for the originals —
    // check the AVERAGE distortion over sampled pairs is near 1 (individual
    // pairs can distort a lot at outDim=8; the mean cannot)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray).toMap
    val proj = a.toMap
    def d2(x: Seq[Double], y: Seq[Double]): Double =
      x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
    val ids = vecs.keys.toSeq.sorted.take(30)
    val ratios = for {
      i <- ids; j <- ids if i < j
      orig = d2(vecs(i).toSeq, vecs(j).toSeq) if orig > 1e-12
    } yield d2(proj(i), proj(j)) / orig
    val meanRatio = ratios.sum / ratios.size
    assert(meanRatio > 0.5 && meanRatio < 2.0,
      s"mean JL distortion $meanRatio out of range over ${ratios.size} pairs")
  }

  test("langId: every document classified; zh only when CJK present") {
    val rows = TextAnalysis.langId(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == spark.read.parquet(s"$sf/documents.parquet").count())
    assert(!rows.exists(_.getAs[String]("pred_lang") == "zh"),
      "ASCII-only synthetic corpus must not be classified zh")
  }

  test("semantic dedup: dropped set equals the local SemDeDup replay; summary consistent") {
    import graft.operators.Clustering
    val k = 16
    val tau = 0.45
    // the same control-plane centroids the operator uses
    val cents = Clustering.centroids(spark, sf, k)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def norm(a: Array[Double]) = math.sqrt(dot(a, a))
    // replay assignment: max cosine to centroid (row norm is constant per
    // row, so it can be skipped). maxBy keeps the FIRST max, matching
    // graft_topk_idx's earlier-index tie preference.
    val cn = cents.map { case (_, c) => norm(c.toArray) }
    def cellOf(v: Array[Double]): Int =
      cents.indices.maxBy(i => dot(v, cents(i)._2.toArray) / cn(i))
    val byCell = vecs.groupBy { case (_, v) => cellOf(v) }
    val expectedDropped = byCell.values.flatMap { members =>
      val sorted = members.sortBy(_._1)
      for {
        j <- sorted.indices
        if sorted.indices.take(j).exists { i =>
          val (_, a) = sorted(i); val (_, b) = sorted(j)
          dot(a, b) / (norm(a) * norm(b)) >= tau
        }
      } yield sorted(j)._1
    }.toSet
    val gotDropped = Dedup.semanticDropped(spark, sf, tau, k).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(gotDropped == expectedDropped,
      s"missed ${expectedDropped -- gotDropped}, extra ${gotDropped -- expectedDropped}")
    // summary: occupancy sums to corpus size, drops sum to the dropped set
    val summary = Dedup.semantic(spark, sf, tau, k).collect()
    assert(summary.map(_.getAs[Long]("n")).sum == vecs.length)
    assert(summary.map(_.getAs[Long]("n_dropped")).sum == expectedDropped.size)
    assert(expectedDropped.nonEmpty, "corpus has >=0.45 pairs; some must be dropped")
  }

  test("semantic dedup: pair generation is an equi-join on cell, no all-pairs join") {
    val plan = planString(Dedup.semantic(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "within-cluster pairs must come from an equi-join on the cell id")
  }
}
