package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainPrep
import graft.sources.Tables

/** Specs for the training-corpus preparation operators. The DuckDB
  * oracle certifies exact values at sf0.01; these tests pin the
  * SEMANTICS (local recomputation on the real corpus) and the plan
  * shapes that matter at scale.
  */
class TrainPrepSpec extends SparkSpec {

  private def localToks(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  test("chunk: stride/overlap layout and chunk content match a local replay") {
    val budget = 128; val stride = 96
    val byDoc = TrainPrep.chunk(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.sortBy(_.getAs[Long]("chunk_id"))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> localToks(r.getAs[String]("text"))).toMap
    assert(byDoc.keySet == docs.filter(_._2.nonEmpty).keySet, "every non-empty doc chunks")
    byDoc.foreach { case (id, chunks) =>
      val t = docs(id); val n = t.length
      assert(chunks.map(_.getAs[Long]("chunk_id")).toSeq == (0L until chunks.length.toLong),
        s"doc $id: chunk ids must be contiguous from 0")
      assert(chunks.length == (n - 1) / stride + 1, s"doc $id: chunk count")
      chunks.foreach { c =>
        val start = c.getAs[Long]("start_tok").toInt
        assert(start == c.getAs[Long]("chunk_id").toInt * stride)
        assert(c.getAs[Long]("n_tok") == math.min(budget, n - start), s"doc $id chunk len")
        val want = t.slice(start, math.min(n, start + budget)).mkString(" ")
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(want.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        assert(c.getAs[String]("chunk_md5") == md5, s"doc $id chunk $start content")
      }
      // the layout covers the whole document: last chunk ends at n
      val last = chunks.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_tok") == n.toLong)
    }
    // overlap actually occurs: some doc has >= 2 chunks sharing 32 tokens
    assert(byDoc.values.exists(_.length >= 2), "corpus must exercise multi-chunk docs")
  }

  test("qualityRules: signals and verdict match a local recomputation") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val got = TrainPrep.qualityRules(spark, sf).collect()
    assert(got.length == docs.size)
    val stops = Seq("the", "a", "of", "to", "and", "in")
    got.foreach { r =>
      val t = localToks(docs(r.getAs[Long]("doc_id")))
      val chars = docs(r.getAs[Long]("doc_id")).toLowerCase.replaceAll("\\s+", "").length
      val stopHits = stops.count(t.contains)
      assert(r.getAs[Int]("n_words") == t.length)
      assert(r.getAs[Int]("stop_hits") == stopHits)
      val meanW = chars.toDouble / t.length
      val keep = t.length >= 50 && t.length <= 100000 &&
        meanW >= 2.0 && meanW <= 10.0 && stopHits >= 2
      assert(r.getAs[Boolean]("keep") == keep, s"doc ${r.get(0)}")
    }
    // pure projection: no exchange anywhere before the final sort
    val plan = planString(TrainPrep.qualityRules(spark, sf))
    assert(plan.indexOf("Exchange") == plan.lastIndexOf("Exchange"),
      s"qualityRules must be shuffle-free except the output sort:\n$plan")
  }

  test("repetition: a doc that is one word repeated is flagged; fractions bounded") {
    val rows = TrainPrep.repetition(spark, sf).collect()
    rows.foreach { r =>
      val twf = r.getAs[Double]("top_word_frac")
      val dbg = r.getAs[Double]("dup_2gram_frac")
      assert(twf > 0.0 && twf <= 1.0, s"top_word_frac $twf")
      assert(dbg >= 0.0 && dbg <= 1.0, s"dup_2gram_frac $dbg")
      assert(r.getAs[Boolean]("keep") == (twf <= 0.2 && dbg <= 0.3))
    }
    // synthetic pathological doc: "spam spam ... spam" must fail both gates
    import spark.implicits._
    val bad = Seq((1L, Seq.fill(50)("spam").mkString(" "))).toDF("doc_id", "text")
    bad.createOrReplaceTempView("__rep_bad")
    val t = bad.select(col("doc_id"),
      posexplode(graft.operators.TextAnalysis.toks(col("text"))).as(Seq("i", "w")))
    val wc = t.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val row = wc.groupBy("doc_id")
      .agg((max(col("c")) / sum(col("c"))).as("twf")).head()
    assert(row.getAs[Double]("twf") == 1.0)
  }

  test("piiScrub: injected docs are detected, scrubbed text carries no raw PII") {
    val got = TrainPrep.piiScrub(spark, sf).collect()
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 7 == 0) {
        assert(r.getAs[Int]("n_emails") >= 1, s"doc $id email missed")
        assert(r.getAs[Int]("n_ips") >= 1, s"doc $id ip missed")
      }
    }
    assert(got.count(r => r.getAs[Long]("doc_id") % 7 == 0) > 0)
  }

  test("dedupPhrases: every reported 5-gram occurs in >= 2 docs (local replay)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def grams(t: String): Set[String] =
      localToks(t).sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    val byDoc = docs.map { case (id, t) => id -> grams(t) }
    val got = TrainPrep.dedupPhrases(spark, sf).collect()
    assert(got.nonEmpty, "synthetic corpus repeats sentences across docs")
    got.foreach { r =>
      val s = r.getAs[String]("s")
      val n = byDoc.count(_._2.contains(s))
      assert(n.toLong == r.getAs[Long]("n_docs"), s"'$s': local=$n spark=${r.get(1)}")
      assert(n >= 2)
    }
  }

  test("unigramLogprob: exact local replay of the micro-nat arithmetic") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> localToks(r.getAs[String]("text")))
    val tf = docs.map { case (id, t) => id -> t.groupBy(identity).view.mapValues(_.size.toLong).toMap }
    val freq = tf.flatMap(_._2).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val n = freq.values.sum.toDouble
    def microNats(cw: Long): Long =
      BigDecimal(math.log(cw / n) * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val want = tf.map { case (id, counts) =>
      val sn = counts.map { case (w, c) => c * microNats(freq(w)) }.sum
      val nTok = counts.values.sum
      id -> (nTok,
        BigDecimal(sn.toDouble / (nTok.toDouble * 1e6))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = TrainPrep.unigramLogprob(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logprob"))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (nt, lp)) =>
      assert(nt == want(id)._1, s"doc $id token count")
      assert(math.abs(lp - want(id)._2) < 1e-9, s"doc $id: got $lp want ${want(id)._2}")
    }
    // scores are negative log-probs: all strictly below zero
    assert(got.values.forall(_._2 < 0.0))
  }

  test("packSequences: bins partition each shard; token totals conserved") {
    val got = TrainPrep.packSequences(spark, sf).collect()
    val totalGot = got.map(_.getAs[Long]("n_tokens")).sum
    val totalWant = Tables.documents(spark, sf)
      .select(size(graft.operators.TextAnalysis.toks(col("text"))).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(totalGot == totalWant, "packing must not drop or double-count tokens")
    // each shard starts at bin 0; bins are strictly increasing (a doc
    // longer than the budget legitimately skips bins)
    got.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val bins = rows.map(_.getAs[Long]("bin")).sorted
      assert(bins.head == 0, s"$src first bin")
      assert(bins.distinct.length == bins.length, s"$src duplicate bins")
    }
  }

  test("packManifest: span lists replay the exact concat-and-chunk layout") {
    val budget = 512
    // local replay: per-source prefix sums in doc_id order
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        localToks(r.getAs[String]("text")).length.toLong))
    val want = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._1).toSeq.map { case (id, _, toks) =>
        val start = cum; cum += toks
        ((src, start / budget), (id, start - (start / budget) * budget, toks))
      }
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sortBy(_._1) }
    val got = TrainPrep.packManifest(spark, sf).collect().map { r =>
      val spans = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("spans"))
        .map(s => (s.getAs[Long]("doc_id"), s.getAs[Long]("offset"), s.getAs[Int]("toks").toLong))
      ((r.getAs[String]("source"), r.getAs[Long]("bin")), spans)
    }.toMap
    assert(got.keySet == want.keySet, "bin sets differ from local replay")
    got.foreach { case (k, spans) =>
      assert(spans == want(k), s"spans differ for $k: got $spans want ${want(k)}")
      // every document starts inside its bin's budget window
      assert(spans.forall { case (_, off, _) => off >= 0 && off < budget }, s"offset range $k")
    }
  }

  test("epochOrder: each epoch is a full permutation in exact md5 order; epochs differ") {
    val rows = TrainPrep.epochOrder(spark, sf).collect()
      .map(r => (r.getAs[Int]("epoch"), r.getAs[Long]("position"), r.getAs[Long]("doc_id")))
    val n = graft.sources.Tables.documents(spark, sf).count()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0, 1, 2))
    byEpoch.foreach { case (e, rs) =>
      // positions are exactly 1..N and every doc appears once
      assert(rs.map(_._2).sorted.toSeq == (1L to n).toSeq, s"epoch $e positions")
      assert(rs.map(_._3).distinct.length == n, s"epoch $e docs")
      // the bucket-decomposed position equals the LOCAL naive rank
      val md = java.security.MessageDigest.getInstance("MD5")
      def ord(id: Long) = md.digest(s"$e:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val naive = rs.map(_._3).sortBy(id => (ord(id), id)).zipWithIndex
        .map { case (id, i) => id -> (i + 1L) }.toMap
      rs.foreach { case (_, pos, id) =>
        assert(naive(id) == pos, s"epoch $e doc $id: $pos vs naive ${naive(id)}")
      }
    }
    // distinct epochs produce genuinely different orders
    val o0 = byEpoch(0).sortBy(_._2).map(_._3).toSeq
    val o1 = byEpoch(1).sortBy(_._2).map(_._3).toSeq
    assert(o0 != o1, "epoch permutations must differ")
    // the LIBRARY path (sorted = false, the default) pays no GLOBAL
    // range sort — the only Sort nodes are the window's local
    // per-partition sorts; the contract path (sorted = true) keeps it
    val globalSort = "Sort \\[[^\\]]*\\], true".r
    val lib = planString(TrainPrep.epochOrder(spark, sf))
    assert(globalSort.findFirstIn(lib).isEmpty,
      s"library epochOrder must not globally sort:\n$lib")
    val contract = planString(TrainPrep.epochOrder(spark, sf, sorted = true))
    assert(globalSort.findFirstIn(contract).nonEmpty,
      "contract epochOrder keeps the presentation sort")
  }

  test("packBestFit: block-local FFD replayed exactly; bins respect the budget") {
    val budget = 512; val blockSize = 64
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        localToks(r.getAs[String]("text")).length))
    val got = TrainPrep.packBestFit(spark, sf, budget, blockSize).collect().map { r =>
      ((r.getAs[String]("source"), r.getAs[Long]("block"), r.getAs[Long]("bin")),
        (r.getSeq[Long](r.fieldIndex("doc_ids")).toList,
          r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
    }.toMap
    // local replay of the exact same block assignment + FFD
    val want = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.sortBy(_._1).zipWithIndex.map { case ((id, _, t), i) =>
        (src, (i / blockSize).toLong, id, t)
      }.groupBy { case (s, b, _, _) => (s, b) }.toSeq.flatMap { case ((s, b), rows) =>
        val sorted = rows.map { case (_, _, id, t) => (id, t) }.sortBy { case (id, t) => (-t, id) }
        val binT = scala.collection.mutable.ArrayBuffer.empty[Int]
        val binD = scala.collection.mutable.ArrayBuffer.empty[List[Long]]
        sorted.foreach { case (id, t) =>
          binT.indices.find(i => binT(i) + t <= budget) match {
            case Some(i) => binT(i) += t; binD(i) = id :: binD(i)
            case None    => binT += t;    binD += List(id)
          }
        }
        binT.indices.map(i => ((s, b, i.toLong),
          (binD(i).sorted, binD(i).length.toLong, binT(i).toLong)))
      }
    }.toMap
    assert(got.keySet == want.keySet, "bin keys differ from local FFD replay")
    got.foreach { case (k, v) => assert(v == want(k), s"bin $k: got $v want ${want(k)}") }
    // every multi-doc bin fits the budget (singleton overflow allowed)
    got.foreach { case (k, (ids, _, toks)) =>
      assert(toks <= budget || ids.length == 1, s"overfull multi-doc bin $k: $toks")
    }
    // all documents packed exactly once
    val packed = got.values.flatMap(_._1).toSeq
    assert(packed.length == docs.length && packed.toSet.size == docs.length)
  }

  test("bigramLogprob: scores match a local bigram LM over the same corpus") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> localToks(r.getAs[String]("text")))
    val allBigrams = docs.flatMap { case (_, t) => t.zip(t.tail) }
    val c2 = allBigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = allBigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val got = TrainPrep.bigramLogprob(spark, sf).collect()
    assert(got.length == docs.count(_._2.length >= 2))
    got.foreach { r =>
      val t = docs.toMap.apply(r.getAs[Long]("doc_id"))
      val bgs = t.zip(t.tail)
      assert(r.getAs[Long]("n_bigrams") == bgs.length)
      val micro = bgs.map { b =>
        math.round(math.log(c2(b).toDouble / c1(b._1)) * 1e6)
      }.sum
      val want = BigDecimal(micro.toDouble / (bgs.length * 1e6))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("avg_logprob") == want, s"doc ${r.get(0)}")
      // a bigram LM over its own corpus: probabilities <= 1, so scores <= 0
      assert(r.getAs[Double]("avg_logprob") <= 0.0)
    }
  }

  test("trigramLogprob: held-out stupid-backoff replayed exactly; backoff fires") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> localToks(r.getAs[String]("text")))
    def tris(t: Seq[String]) = t.indices.dropRight(2).map(i => (t(i), t(i + 1), t(i + 2)))
    val trainTris = docs.filter(_._1 % 2 == 0).flatMap { case (_, t) => tris(t) }.toSeq
    val c3 = trainTris.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n3 = trainTris.groupBy(t => (t._1, t._2)).view.mapValues(_.length.toLong).toMap
    val b2 = trainTris.groupBy(t => (t._2, t._3)).view.mapValues(_.length.toLong).toMap
    val n1 = trainTris.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val u1 = trainTris.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val nn = trainTris.length.toLong
    val got = TrainPrep.trigramLogprob(spark, sf).collect()
    assert(got.length == docs.count(_._2.length >= 3))
    var anyBackoff = false
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val ts = tris(docs.toMap.apply(id))
      assert(r.getAs[Long]("n_trigrams") == ts.length)
      val lps = ts.map { tr =>
        if (c3.contains(tr))
          math.round(math.log(c3(tr).toDouble / n3((tr._1, tr._2))) * 1e6)
        else if (b2.contains((tr._2, tr._3)))
          math.round(math.log(0.5 * b2((tr._2, tr._3)).toDouble / n1(tr._2)) * 1e6)
        else
          math.round(math.log(0.25 * u1.getOrElse(tr._3, 1L).toDouble / nn) * 1e6)
      }
      val backoff = ts.count(tr => !c3.contains(tr)).toLong
      assert(r.getAs[Long]("n_backoff") == backoff, s"doc $id backoff count")
      if (id % 2 == 0) assert(backoff == 0L, s"train doc $id must never back off")
      else if (backoff > 0) anyBackoff = true
      val want = BigDecimal(lps.sum.toDouble / (ts.length * 1e6))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("avg_logprob") == want, s"doc $id")
      assert(r.getAs[Double]("avg_logprob") <= 0.0)
    }
    assert(anyBackoff, "held-out docs must exercise the backoff path")
  }

  test("pipeline: composition equals intersecting the individual verified stages") {
    import org.apache.spark.sql.functions._
    val quality = TrainPrep.qualityRules(spark, sf).collect()
      .filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id")).toSet
    val tox = TrainPrep.toxicity(spark, sf).collect()
      .filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id")).toSet
    val rep = TrainPrep.repetition(spark, sf).collect()
      .filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id")).toSet
    val fps = graft.operators.TextAnalysis.fingerprint(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp"))
    val keepers = fps.groupBy(_._2).values.map(_.map(_._1).min).toSet
    val meta = Tables.documents(spark, sf)
      .selectExpr("doc_id", "source",
        "size(filter(split(lower(text),'\\\\s+'), x -> x != '')) AS n_toks")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("source"), r.getAs[Int]("n_toks")))
      .toMap
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val kept = quality & tox & rep & keepers
    assert(kept.nonEmpty, "some documents must survive the full pipeline")
    val want = kept.toSeq.map { id =>
      val h2 = md5hex(id.toString).take(2)
      val split = if (h2 < "f0") "train" else if (h2 < "f8") "val" else "test"
      (split, meta(id)._1, id, meta(id)._2.toLong)
    }.groupBy { case (s, src, _, _) => (s, src) }
      .map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._4).sum) }
    val got = TrainPrep.pipeline(spark, sf).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[String]("source")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(got == want, s"pipeline must equal the stage intersection\n got=$got\nwant=$want")
  }

  test("qualityScore: sigmoid scorer matches local math; map-only plan") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val stops = Seq("the", "a", "of", "to", "and", "in")
    val got = TrainPrep.qualityScore(spark, sf).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val t = localToks(docs(r.getAs[Long]("doc_id")))
      val chars = docs(r.getAs[Long]("doc_id")).toLowerCase.replaceAll("\\s+", "").length
      val sr = t.count(stops.contains).toDouble / t.length
      val mw = chars.toDouble / t.length
      val z = -1.0 + 0.35 * math.log(t.length) + 4.0 * sr - 0.6 * (mw - 5.0)
      val s = 1.0 / (1.0 + math.exp(-z))
      assert(r.getAs[Int]("n_tokens") == t.length)
      assert(math.abs(r.getAs[Double]("score") - s) < 5e-5, s"doc ${r.get(0)}")
      assert(r.getAs[Boolean]("keep") == (s >= 0.5))
    }
    val plan = planString(TrainPrep.qualityScore(spark, sf))
    assert(plan.indexOf("Exchange") == plan.lastIndexOf("Exchange"),
      s"qualityScore must be shuffle-free except the output sort:\n$plan")
  }

  test("toxicity: flagged counts match local recomputation; pure projection") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val got = TrainPrep.toxicity(spark, sf).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val t = localToks(docs(r.getAs[Long]("doc_id")))
      val flagged = t.count(TrainPrep.BlockWords.contains)
      assert(r.getAs[Int]("n_tokens") == t.length)
      assert(r.getAs[Int]("n_flagged") == flagged, s"doc ${r.get(0)}")
      val frac = flagged.toDouble / math.max(t.length, 1)
      assert(r.getAs[Boolean]("keep") == (frac <= 0.02))
    }
    val plan = planString(TrainPrep.toxicity(spark, sf))
    assert(plan.indexOf("Exchange") == plan.lastIndexOf("Exchange"),
      s"toxicity must be shuffle-free except the output sort:\n$plan")
  }

  test("lineDedup: exact agreement with a local replay; heavy-line join broadcasts") {
    val lineTokens = 5
    val minDocs = 3
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // local replay: inject, chunk into 5-token lines, df over distinct
    // (doc, line), drop lines with df >= minDocs, md5 the reassembly
    val localLines: Map[Long, Seq[String]] = docs.map { case (id, text) =>
      val aug = if (id % 3 == 0) text + " please subscribe to our newsletter today" else text
      id -> localToks(aug).grouped(lineTokens).map(_.mkString(" ")).toSeq
    }
    val df = localLines.toSeq.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
    val heavy = df.filter(_._2 >= minDocs).keys.toSet
    assert(heavy.nonEmpty, "injected boilerplate must produce at least one heavy line")
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = TrainPrep.lineDedup(spark, sf, lineTokens, minDocs).collect()
    assert(got.length == docs.size)
    var totalDropped = 0L
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val ls = localLines(id)
      val kept = ls.filterNot(heavy)
      assert(r.getAs[Int]("n_lines") == ls.length, s"doc $id n_lines")
      assert(r.getAs[Long]("n_dropped") == (ls.length - kept.length).toLong, s"doc $id n_dropped")
      assert(r.getAs[String]("scrub_md5") == md5hex(kept.mkString(" ")), s"doc $id md5")
      totalDropped += r.getAs[Long]("n_dropped")
    }
    assert(totalDropped > 0, "the aligned injected lines must be dropped somewhere")
    // the heavy-line removal must be a broadcast join (tiny build side)
    val plan = planString(TrainPrep.lineDedup(spark, sf, lineTokens, minDocs))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"heavy-line anti-join must broadcast:\n$plan")
  }

  test("lineDedup broadcast guard: forced shuffle-join path agrees with the broadcast path") {
    // maxBroadcastRows = 0 forces broadcastIfSmall's fallback (no
    // broadcast hint; AQE may still pick broadcast at this sf, which
    // is the intended division of labor) — results must be identical
    val b = TrainPrep.lineDedup(spark, sf).collect().map(_.toSeq).toSeq
    val s = TrainPrep.lineDedupImpl(spark, sf, maxBroadcastRows = 0L)
      .collect().map(_.toSeq).toSeq
    assert(s == b, "lineDedup: shuffle-join fallback must agree with broadcast path")
  }

  test("spanDedup: injected spans scrub everywhere; untouched docs keep their exact text") {
    val boiler = "limited time offer click here to claim your free bonus now"
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = TrainPrep.spanDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Long]("n_removed"), r.getAs[String]("scrub_md5")))
      .toMap
    assert(rows.nonEmpty)
    // local replay: same tokenization + injection + 5-gram coverage
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val toks = docs.map { case (id, text) =>
      val aug = if (id % 4 == 1) s"$text $boiler" else text
      id -> aug.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val df = scala.collection.mutable.Map.empty[String, Set[Long]]
    toks.foreach { case (id, t) =>
      t.sliding(5).filter(_.length == 5).map(_.mkString(" "))
        .foreach(g => df(g) = df.getOrElse(g, Set.empty) + id)
    }
    val dup = df.collect { case (g, ids) if ids.size >= 2 => g }.toSet
    toks.foreach { case (id, t) =>
      val covered = t.sliding(5).zipWithIndex
        .collect { case (w, i) if w.length == 5 && dup(w.mkString(" ")) => i }
        .flatMap(i => i until i + 5).toSet
      val kept = t.zipWithIndex.collect { case (w, i) if !covered(i) => w }
      val (nTok, nRem, md) = rows(id)
      assert(nTok == t.length, s"doc $id token count")
      assert(nRem == covered.size.toLong, s"doc $id removed count")
      assert(md == md5hex(kept.mkString(" ")), s"doc $id scrub hash")
    }
    // the injected boilerplate is duplicated across all %4==1 docs, so
    // its 11 tokens (at least) must be removed from every one of them
    toks.keys.filter(_ % 4 == 1).foreach { id =>
      assert(rows(id)._2 >= 11L, s"doc $id must lose the injected span, lost ${rows(id)._2}")
    }
    // and some document keeps its text verbatim (no duplicated grams)
    assert(toks.keys.exists(id => rows(id)._2 == 0L &&
      rows(id)._3 == md5hex(toks(id).mkString(" "))),
      "a clean doc must survive byte-identical")
  }

  test("text_entropy: micro-nat value equals the local integer replay; map-only plan") {
    import graft.operators.TextAnalysis
    def replay(s: String): Long = {
      val counts = s.codePoints().toArray.groupBy(identity).view.mapValues(_.length.toLong)
      val n = s.codePoints().count()
      val t = counts.values.map(c => c * Math.round(1e6 * Math.log(c.toDouble))).sum
      (Math.round(1e6 * Math.log(n.toDouble)) * n - t) / n
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
    val rows = TextAnalysis.entropy(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val want = replay(docs(id))
      assert(r.getAs[Long]("ent_unats") == want, s"doc $id")
      assert(r.getAs[Boolean]("keep") == (want >= 2000000L && want <= 4800000L))
    }
    // uniform text has zero entropy
    assert(graft.functions.TextOps.entropyMicroNats(
      org.apache.spark.unsafe.types.UTF8String.fromString("aaaaaaaa")) == 0L)
    val plan = planString(TextAnalysis.entropy(spark, sf))
    assert(plan.indexOf("Exchange") == plan.lastIndexOf("Exchange"),
      s"entropy must be a single map pass plus the output sort:\n$plan")
    // the generated static call must actually COMPILE — with fallback
    // disabled a Janino error would throw instead of silently dropping
    // the stage to interpreted mode
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try TextAnalysis.entropy(spark, sf).count()
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
