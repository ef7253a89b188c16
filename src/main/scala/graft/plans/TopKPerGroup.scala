package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.GraftSqlBridge

/** Whole-operator custom plan: top-K rows per key by a double score.
  *
  * The built-in formulation (`row_number().over(Window.partitionBy(
  * keys).orderBy(score))` + filter ≤ k) sorts EVERY group's rows; this
  * operator keeps a bounded k-element heap per key, so per-partition
  * work is O(n log k) and memory is O(keys × k) — the difference
  * between sorting 100 TB and scanning it.
  *
  * Wiring: logical node → [[TopKStrategy]] (planner strategy injected
  * by [[graft.GraftExtensions]] or used directly via [[TopK.perGroup]])
  * → [[TopKPerGroupExec]] physical node, which declares
  * `ClusteredDistribution(keys)` so Catalyst inserts the single hash
  * exchange.
  *
  * Determinism: rows are ordered by (score DESC, tiebreak ASC); the
  * tiebreak must be a unique long per row within a key group.
  */
case class TopKPerGroup(keys: Seq[Expression], score: Expression, tiebreak: Expression,
                        k: Int, child: LogicalPlan,
                        rankAttr: Option[Attribute] = None) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  // rank is PRODUCED here, not read from the child — without this the
  // Option[Attribute] constructor arg lands in `references` and
  // CheckAnalysis rejects the plan as "missing from input"
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup = copy(child = c)
}

case class TopKPerGroupExec(keys: Seq[Expression], score: Expression, tiebreak: Expression,
                            k: Int, child: SparkPlan,
                            rankAttr: Option[Attribute] = None) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val scoreExpr = score
    val tieExpr = tiebreak
    val childOutput = child.output
    val outAttrs = output
    val withRank = rankAttr.isDefined
    val limit = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val scoreProj = UnsafeProjection.create(Seq(scoreExpr, tieExpr), childOutput)
      // per key: min-heap of (score, tie, row) — evict the WORST kept
      // entry, i.e. lowest score / highest tie
      implicit val ord: Ordering[(Double, Long, UnsafeRow)] =
        Ordering.by[(Double, Long, UnsafeRow), (Double, Long)](e => (-e._1, e._2))
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[(Double, Long, UnsafeRow)]]
      it.foreach { row =>
        val st = scoreProj(row)
        val s = st.getDouble(0)
        val t = st.getLong(1)
        val keyRow = keyProj(row) // reused buffer: copy only on first sight
        val heap = heaps.get(keyRow) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[(Double, Long, UnsafeRow)]
            heaps.put(keyRow.copy(), h)
            h
        }
        if (heap.size < limit) {
          heap.enqueue((s, t, row.asInstanceOf[UnsafeRow].copy()))
        } else {
          val worst = heap.head
          if (s > worst._1 || (s == worst._1 && t < worst._2)) {
            heap.dequeue()
            heap.enqueue((s, t, row.asInstanceOf[UnsafeRow].copy()))
          }
        }
      }
      if (!withRank)
        heaps.iterator.flatMap { case (_, heap) =>
          heap.toArray.sortBy(e => (-e._1, e._2)).iterator.map(_._3: InternalRow)
        }
      else {
        // append rank 1..k per key during the final per-heap k-sort —
        // ranking comes free from the heap, no Window/sort downstream
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        heaps.iterator.flatMap { case (_, heap) =>
          heap.toArray.sortBy(e => (-e._1, e._2)).iterator.zipWithIndex.map {
            case (e, i) =>
              rankRow.update(0, i + 1)
              proj(joined(e._3, rankRow)): InternalRow
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec = copy(child = c)
}

/** Planner strategy mapping the logical node to the exec node. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(keys, score, tie, k, child, rankAttr) =>
      TopKPerGroupExec(keys, score, tie, k, planLater(child), rankAttr) :: Nil
    case _ => Nil
  }
}

/** Public DataFrame API for the operator. */
object TopK {
  /** Top-k rows of `df` per `keys`, ranked by the double column `score`
    * (desc) with the long column `tiebreak` (asc, unique per row within
    * a key) for determinism. Columns are referenced by name and bound
    * against the analyzed child — computed scores should be projected
    * into a column first.
    */
  def perGroup(df: DataFrame, keys: Seq[String], score: String, tiebreak: String,
               k: Int): DataFrame =
    build(df, keys, score, tiebreak, k, rankCol = None)

  /** [[perGroup]] plus an appended IntegerType `rankCol` (1..k per key,
    * by score desc / tiebreak asc) — the rank falls out of the
    * operator's own final per-heap k-sort, so consumers that need it
    * (the ANN contract queries) pay NO Window node and no extra sort.
    */
  def perGroupRanked(df: DataFrame, keys: Seq[String], score: String, tiebreak: String,
                     k: Int, rankCol: String = "rank"): DataFrame =
    build(df, keys, score, tiebreak, k, rankCol = Some(rankCol))

  private def build(df: DataFrame, keys: Seq[String], score: String, tiebreak: String,
                    k: Int, rankCol: Option[String]): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val childPlan = GraftSqlBridge.analyzed(df)
    def attr(name: String): Expression =
      childPlan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${childPlan.output.map(_.name).mkString(", ")}"))
    // fail at analysis, not with garbage ordering at runtime: doExecute
    // reads the projection with getDouble/getLong unconditionally
    val scoreType = attr(score).dataType
    require(scoreType == org.apache.spark.sql.types.DoubleType,
      s"TopK.perGroup score column '$score' must be DoubleType, got $scoreType")
    val tieType = attr(tiebreak).dataType
    require(tieType == org.apache.spark.sql.types.LongType,
      s"TopK.perGroup tiebreak column '$tiebreak' must be LongType, got $tieType")
    val rankAttr = rankCol.map(n =>
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        n, org.apache.spark.sql.types.IntegerType, nullable = false)())
    GraftSqlBridge.ofRows(spark,
      TopKPerGroup(keys.map(attr), attr(score), attr(tiebreak), k, childPlan, rankAttr))
  }
}
