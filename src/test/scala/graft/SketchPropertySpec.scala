package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SpaceSavingTopK

/** Property-based check of the SpaceSaving merge math, driven at the
  * aggregate-buffer level (no Spark jobs): for ANY stream, ANY
  * capacity, and ANY way of splitting the stream into partial buffers,
  * the mergeable-summaries contract must hold —
  * `est - err <= true <= est` for every tracked item, and every item
  * with true frequency > n/m tracked. This is exactly the invariant a
  * 1000-executor partial aggregation relies on.
  */
class SketchPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, rng.Seed(seed)).get

  // zipf-flavored streams: small item ids are far more frequent
  private val streamGen: Gen[List[Int]] =
    Gen.chooseNum(50, 2000).flatMap { n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.chooseNum(0, 3),
        4 -> Gen.chooseNum(4, 12),
        1 -> Gen.chooseNum(13, 60)))
    }

  private val caseGen: Gen[(List[Int], Int, Int)] = for {
    stream <- streamGen
    m <- Gen.chooseNum(4, 32)
    parts <- Gen.chooseNum(1, 8)
  } yield (stream, m, parts)

  private def runCase(stream: List[Int], m: Int, parts: Int): Unit = {
    val agg = SpaceSavingTopK(BoundReference(0, StringType, nullable = true), m)
    // split the stream into `parts` chunks, build a partial buffer per
    // chunk, then fold-merge — the distributed partial-agg shape
    val chunks = stream.grouped(math.max(1, stream.length / parts)).toSeq
    val buffers = chunks.map { chunk =>
      val b = agg.createAggregationBuffer()
      chunk.foreach { v =>
        agg.update(b, InternalRow(UTF8String.fromString(s"i$v")))
      }
      // round-trip through serialization like a real shuffle would
      agg.deserialize(agg.serialize(b))
    }
    val merged = buffers.reduceLeft { (a, b) => agg.merge(a, b) }
    val out = agg.eval(merged).asInstanceOf[ArrayData]
    val rows = (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
    }
    val trueCounts = stream.groupBy(v => s"i$v").view.mapValues(_.size.toLong).toMap
    val n = stream.length.toLong
    rows.foreach { case (item, est, err) =>
      val t = trueCounts.getOrElse(item, 0L)
      assert(t <= est, s"m=$m parts=$parts $item: true=$t > est=$est")
      assert(est - err <= t, s"m=$m parts=$parts $item: lower=${est - err} > true=$t")
    }
    val guaranteed = trueCounts.filter(_._2 > n / m).keySet
    val present = rows.map(_._1).toSet
    assert(guaranteed.subsetOf(present),
      s"m=$m parts=$parts missing guaranteed items: ${guaranteed -- present}")
  }

  test("SpaceSaving bounds hold for 60 random (stream, m, split) cases") {
    (1 to 60).foreach { i =>
      val (stream, m, parts) = sample(caseGen, 0xC0FFEE + i)
      runCase(stream, m, parts)
    }
  }

  test("SpaceSaving degenerate cases: tiny streams, m larger than distinct items") {
    runCase(List(1), 8, 4)          // fewer values than chunks
    runCase(List.fill(500)(7), 4, 3) // single-item stream
    runCase((1 to 3).toList, 16, 1)  // all distinct, under capacity -> exact
    val agg = SpaceSavingTopK(BoundReference(0, StringType, nullable = true), 4)
    val empty = agg.eval(agg.deserialize(agg.serialize(agg.createAggregationBuffer())))
    assert(empty.asInstanceOf[ArrayData].numElements() == 0)
  }
}
