package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Unigram, Wordpiece}

/** BPE training vs a from-first-principles local reference: same
  * tokenization, same greedy single-pass merge rule, same
  * (count desc, pair asc) tie-break — the distributed result must match
  * the local one symbol-for-symbol.
  */
class BpeSpec extends SparkSpec {

  /** Local reference: word histogram → iterated (pair count, argmax,
    * greedy merge), entirely in Scala collections.
    */
  private def localTrain(texts: Seq[String], nMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[List[String], Long] = texts
      .flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w.map(_.toString).toList -> ws.size.toLong }
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 0 until nMerges) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- vocab; Seq(a, b) <- syms.sliding(2))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + cnt
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((l, r, n))
        def mergeWord(syms: List[String]): List[String] = syms match {
          case a :: b :: rest if a == l && b == r => (a + b) :: mergeWord(rest)
          case a :: rest => a :: mergeWord(rest)
          case Nil => Nil
        }
        vocab = vocab.groupMapReduce { case (syms, _) => mergeWord(syms) } { case (_, c) => c }(_ + _)
      }
    }
    merges.result()
  }

  private def texts: Seq[String] =
    graft.sources.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0)).toSeq

  test("bpe_train matches the local reference merge-for-merge") {
    val distributed = Bpe.train(spark, sf, nMerges = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val local = localTrain(texts, 8).zipWithIndex
      .map { case ((l, r, n), i) => (i, l, r, n) }
    assert(distributed.toSeq == local)
  }

  test("bpe_pairs equals the round-0 pair histogram of the reference") {
    val local = {
      val counts = collection.mutable.Map.empty[String, Long]
      for (w <- texts.flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)))
        for (p <- w.sliding(2) if p.length == 2)
          counts(p) = counts.getOrElse(p, 0L) + 1L
      counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(50)
    }
    val distributed = Bpe.pairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(distributed == local)
  }

  test("later merges can involve earlier merged symbols") {
    // multi-char symbols appear on either side once ranks progress —
    // the property that distinguishes BPE from bigram counting
    val merges = Bpe.train(spark, sf, nMerges = 12).collect()
    assert(merges.exists(r => r.getString(1).length > 1 || r.getString(2).length > 1))
    // counts are non-increasing in rank is NOT guaranteed by BPE, but
    // every merge must have been the round's argmax: count > 0
    assert(merges.forall(_.getLong(3) > 0))
  }

  /** Local reference encode: apply `merges` in rank order with the
    * same greedy single-pass rule.
    */
  private def localSegment(word: String, merges: Seq[(String, String)]): List[String] = {
    var syms = word.map(_.toString).toList
    for ((l, r) <- merges) {
      def pass(s: List[String]): List[String] = s match {
        case a :: b :: rest if a == l && b == r => (a + b) :: pass(rest)
        case a :: rest => a :: pass(rest)
        case Nil => Nil
      }
      syms = pass(syms)
    }
    syms
  }

  test("wordSegments: concatenation invariant and agreement with the local reference") {
    val nMerges = 8
    val merges = Bpe.train(spark, sf, nMerges).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val segs = Bpe.wordSegments(spark, sf, nMerges).collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val word = r.getString(0)
      val syms = r.getSeq[String](1).toList
      assert(syms.mkString == word, s"merging must preserve concatenation: $word")
      assert(syms == localSegment(word, merges), s"segmentation of '$word'")
      assert(r.getAs[Int]("n_sub") == syms.length)
    }
    // merges actually fired: some word holds a multi-char symbol
    assert(segs.exists(_.getSeq[String](1).exists(_.length > 1)))
  }

  // ---- unigram (SentencePiece-style) tokenizer ----

  /** Local reference Viterbi with the expression's exact contract:
    * min cost, UNK single chars at 20e6 micro-nats, ties prefer the
    * longer final piece (scan l ascending, replace on < or == with
    * larger l).
    */
  private def localViterbi(word: String, costs: Map[String, Long]): List[String] = {
    val maxLen = (1 +: costs.keys.map(_.length).toSeq).max
    val n = word.length
    val inf = Long.MaxValue / 4
    val best = Array.fill(n + 1)(inf); best(0) = 0L
    val back = Array.fill(n + 1)(0)
    for (i <- 1 to n; l <- 1 to math.min(maxLen, i)) {
      val piece = word.substring(i - l, i)
      val pc = costs.get(piece) match {
        case Some(c) => c
        case None => if (l == 1) 20000000L else inf
      }
      if (pc < inf && best(i - l) < inf) {
        val cand = best(i - l) + pc
        if (cand < best(i) || (cand == best(i) && l > back(i))) {
          best(i) = cand; back(i) = l
        }
      }
    }
    var pos = n; var out = List.empty[String]
    while (pos > 0) { val l = back(pos); out = word.substring(pos - l, pos) :: out; pos -= l }
    out
  }

  /** Local reference trainer: identical seed, hard-EM, pruning and
    * micro-nat arithmetic as [[graft.operators.Unigram]].
    */
  private def localUnigram(texts: Seq[String]): Seq[(String, Long, Long)] = {
    val words = texts.flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    def micro(total: Long, n: Long): Long =
      Math.round(1e6 * (StrictMath.log(total.toDouble) - StrictMath.log(n.toDouble)))
    def costsOf(counts: Seq[(String, Long)]): Map[String, (Long, Long)] = {
      val total = counts.map(_._2).sum
      counts.map { case (p, n) => p -> (n, micro(total, n)) }.toMap
    }
    val subCounts = collection.mutable.Map.empty[String, Long]
    for ((w, cnt) <- words; i <- 0 until w.length; l <- 1 to math.min(6, w.length - i))
      subCounts(w.substring(i, i + l)) = subCounts.getOrElse(w.substring(i, i + l), 0L) + cnt
    val chars = subCounts.filter(_._1.length == 1).toSeq
    val multi = subCounts.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(300)
    var pieces = costsOf(chars ++ multi)
    for (round <- 1 to 3) {
      val usage = collection.mutable.Map.empty[String, Long]
      val costs = pieces.map { case (p, (_, c)) => p -> c }
      for ((w, cnt) <- words; piece <- localViterbi(w, costs))
        usage(piece) = usage.getOrElse(piece, 0L) + cnt
      val kept =
        if (round < 3) usage.toSeq
        else {
          val (cs, ms) = usage.toSeq.partition(_._1.length == 1)
          cs ++ ms.sortBy { case (p, n) => (-n, p) }.take(150)
        }
      pieces = costsOf(kept)
    }
    pieces.toSeq.map { case (p, (n, c)) => (p, n, c) }
      .sortBy { case (p, n, _) => (-n, p) }
  }

  test("unigram_train matches the local Viterbi-EM replay piece-for-piece") {
    val distributed = Unigram.train(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val local = localUnigram(texts)
    assert(distributed.nonEmpty)
    assert(distributed == local,
      s"distributed head=${distributed.take(5)} local head=${local.take(5)}")
    // the model kept something longer than a character
    assert(distributed.exists(_._1.length > 1))
  }

  test("unigram segmentation is total and concatenates back to every vocabulary word") {
    graft.functions.VectorFunctions.register(spark)
    val pieces = Unigram.train(spark, sf).collect()
    val ps = pieces.map(_.getString(0)).toSeq
    val cs = pieces.map(_.getLong(2)).toSeq
    val segs = graft.sources.Tables.documents(spark, sf)
      .select(explode(filter(split(lower(col("text")), "[^a-z]+"),
        w => length(w) > 0)).as("word")).distinct()
      .select(col("word"),
        call_function("graft_unigram_segment", col("word"), typedlit(ps), typedlit(cs))
          .as("pieces"))
      .collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      assert(r.getSeq[String](1).mkString == r.getString(0),
        s"segmentation must concatenate to '${r.getString(0)}'")
    }
  }

  test("unigram_encode: word count <= subword count <= char count, deterministic") {
    val rows = Unigram.encode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, c, s) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_subwords"))
      assert(w <= s && s <= c, s"doc ${r.getAs[Long]("doc_id")}: $w <= $s <= $c")
    }
    val again = Unigram.encode(spark, sf).collect().map(_.toSeq)
    assert(again.toSeq == rows.map(_.toSeq).toSeq, "encode must be deterministic")
  }

  // ---- WordPiece (BERT-style) tokenizer ----

  /** Local reference trainer with the operator's exact contract:
    * ##-prefixed symbols, likelihood score n/(cl·cr) decided by BigInt
    * cross-multiplication, ties (left, right) ascending, greedy
    * single-pass merge.
    */
  private def localWordpiece(texts: Seq[String],
                             nMerges: Int): Seq[(Int, String, String, String, Long)] = {
    def toSyms(w: String): List[String] =
      w.zipWithIndex.map { case (c, i) => if (i == 0) c.toString else "##" + c }.toList
    var vocab: Map[List[String], Long] = texts
      .flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => toSyms(w) -> ws.size.toLong }
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val symCnt = collection.mutable.Map.empty[String, Long]
      for ((syms, cnt) <- vocab; s <- syms)
        symCnt(s) = symCnt.getOrElse(s, 0L) + cnt
      val pairCnt = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- vocab; Seq(a, b) <- syms.sliding(2))
        pairCnt((a, b)) = pairCnt.getOrElse((a, b), 0L) + cnt
      if (pairCnt.isEmpty) exhausted = true
      else {
        case class C(l: String, r: String, n: Long, cl: Long, cr: Long)
        val cands = pairCnt.toSeq.map { case ((l, r), n) => C(l, r, n, symCnt(l), symCnt(r)) }
        def pref(a: C, b: C): Boolean = {
          val lhs = BigInt(a.n) * BigInt(b.cl) * BigInt(b.cr)
          val rhs = BigInt(b.n) * BigInt(a.cl) * BigInt(a.cr)
          if (lhs != rhs) lhs > rhs
          else if (a.l != b.l) a.l < b.l else a.r < b.r
        }
        val top = cands.reduceLeft((x, y) => if (pref(y, x)) y else x)
        val piece = top.l + top.r.stripPrefix("##")
        merges += ((rank, top.l, top.r, piece, top.n))
        def mergeWord(syms: List[String]): List[String] = syms match {
          case a :: b :: rest if a == top.l && b == top.r => piece :: mergeWord(rest)
          case a :: rest => a :: mergeWord(rest)
          case Nil => Nil
        }
        vocab = vocab.groupMapReduce { case (syms, _) => mergeWord(syms) } { case (_, c) => c }(_ + _)
        rank += 1
      }
    }
    merges.result()
  }

  test("wordpiece_train matches the local likelihood-argmax replay merge-for-merge") {
    val distributed = Wordpiece.train(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val local = localWordpiece(texts, 30)
    assert(distributed.nonEmpty)
    assert(distributed.toSeq == local,
      s"distributed head=${distributed.take(5).toSeq} local head=${local.take(5)}")
    // continuation pieces exist (the ##-prefix discipline is real)
    assert(distributed.exists(_._4.startsWith("##")))
  }

  test("wordpiece greedy segmentation concatenates back to every vocabulary word") {
    graft.functions.VectorFunctions.register(spark)
    val vocabLit = typedlit(Wordpiece.trainModel(spark, sf).vocab.toSeq)
    val segs = graft.sources.Tables.documents(spark, sf)
      .select(explode(filter(split(lower(col("text")), "[^a-z]+"),
        w => length(w) > 0)).as("word")).distinct()
      .select(col("word"),
        call_function("graft_wordpiece_segment", col("word"), vocabLit).as("pieces"))
      .collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val pieces = r.getSeq[String](1)
      assert(pieces.head != "[UNK]",
        s"corpus word '${r.getString(0)}' must never UNK (alphabet covers it)")
      val rebuilt = pieces.head + pieces.tail.map(_.stripPrefix("##")).mkString
      assert(rebuilt == r.getString(0),
        s"segmentation must concatenate to '${r.getString(0)}', got $pieces")
      // every non-initial piece carries the continuation prefix
      pieces.tail.foreach(p => assert(p.startsWith("##"), s"'$p' in $pieces"))
    }
  }

  test("wordpiece_encode: word count <= subword count <= char count, deterministic") {
    val rows = Wordpiece.encode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, c, s) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_subwords"))
      assert(w <= s && s <= c, s"doc ${r.getAs[Long]("doc_id")}: $w <= $s <= $c")
    }
    // merges actually compress: some document beats the char encoding
    assert(rows.exists(r => r.getAs[Long]("n_subwords") < r.getAs[Long]("n_chars")))
    val again = Wordpiece.encode(spark, sf).collect().map(_.toSeq)
    assert(again.toSeq == rows.map(_.toSeq).toSeq, "encode must be deterministic")
  }

  test("encode: zero merges = letter counts; more merges never increase token count") {
    val zero = Bpe.encode(spark, sf, nMerges = 0).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars"), r.getAs[Long]("n_subwords"))).toMap
    zero.values.foreach { case (chars, subs) =>
      assert(chars == subs, "with no merges every letter is a token")
    }
    val eight = Bpe.encode(spark, sf, nMerges = 8).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_subwords")).toMap
    assert(eight.keySet == zero.keySet)
    eight.foreach { case (id, subs) =>
      assert(subs <= zero(id)._2, s"doc $id: merges must not grow the encoding")
    }
    // compression happened somewhere (the corpus repeats words heavily)
    assert(eight.exists { case (id, subs) => subs < zero(id)._2 })
  }

  test("trainer doc cap: bounded deterministic sample; default cap leaves test corpora whole") {
    val n = graft.sources.Tables.documents(spark, sf).count()
    // the default cap exceeds every test corpus → the trainers read the
    // FULL corpus, so trained-on-"sample" == trained-on-full by
    // construction (no filter in the plan)
    assert(n < Bpe.DefaultTrainDocCap)
    assert(Bpe.trainingDocs(spark, sf).count() == n)
    // above the cap: exactly `cap` documents, and the bottom-k-by-hash
    // selection is stable across calls (the graft_sample contract)
    val cap = n / 2
    def ids() = Bpe.trainingDocs(spark, sf, cap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = ids()
    assert(s1.size == cap, s"sample must hold exactly $cap docs, got ${s1.size}")
    assert(ids() == s1, "the training sample must be deterministic")
    // a capped trainer still learns a well-formed merge table, and it
    // equals the local reference trained on the SAME sampled docs —
    // sampling bounds the input, it does not change the algorithm
    val texts = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id").isInCollection(s1)).select("text")
      .collect().map(_.getString(0)).toSeq
    val want = localTrain(texts, 5)
    val got = Bpe.train(spark, sf, 5, maxTrainDocs = cap).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"), r.getAs[Long]("n"))).toSeq
    assert(got == want, "capped training must equal the local replay on the sampled docs")
  }
}
