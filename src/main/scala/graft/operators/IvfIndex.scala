package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.Tables

/** DISK-BACKED IVF index: the build-once / query-many shape of
  * similarity search over a corpus too large to re-scan per query.
  *
  * [[Similarity.annIvf]] assigns cells inside one query; at 100 TB the
  * assignment pass itself is the dominant cost and must not repeat per
  * query batch. `build` pays it once, writing the corpus PARTITIONED
  * BY CELL (`cell=<id>/` directories, exactly a Faiss/SCaNN inverted
  * list as a parquet layout); `query` then reads ONLY the probed
  * cells — the cell filter is a literal IN over partition values, so
  * it lands in the scan's `PartitionFilters` and the non-probed
  * ~ (k-nprobe)/k of the corpus is never opened (spec-asserted).
  *
  * Cell count scales with the corpus: k ≈ √N (the standard IVF
  * sizing), built unsupervised via [[Clustering.centroids]] — so the
  * probed fraction nprobe/√N SHRINKS as the corpus grows instead of
  * being pinned to a handful of label cells. Centroids are
  * deterministic (Lloyd's from the first-k seed), so each session
  * recomputes the k×dim control-plane table instead of persisting it;
  * a production index would store it beside the data.
  */
object IvfIndex {

  private val built =
    new ConcurrentHashMap[(SparkSession, String), Array[(Int, Seq[Double])]]()

  private[graft] def root(dir: String): String =
    s"/tmp/graft_ivf_${Integer.toHexString(dir.hashCode & 0x7fffffff)}"

  /** √N clamped to [8, 256]: the IVF cell count for an N-vector corpus. */
  private[graft] def cellCount(n: Long): Int =
    math.min(256, math.max(8, math.sqrt(n.toDouble).toInt))

  /** Idempotently build the cell-partitioned index for `dir`; returns
    * the centroid table (cell id = array index).
    */
  def ensure(spark: SparkSession, dir: String): Array[(Int, Seq[Double])] =
    built.computeIfAbsent((spark, dir), { _ =>
      VectorFunctions.register(spark)
      val k = cellCount(Tables.embeddings(spark, dir).count())
      val cents = Clustering.centroids(spark, dir, k)
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").as("v"), col("label"))
        .withColumn("nrm", sqrt(call_function("graft_dot", col("v"), col("v"))))
        .withColumn("cell",
          element_at(Similarity.topCellsExpr(cents)(col("v"), 1), 1))
        .write.mode("overwrite").partitionBy("cell").parquet(root(dir))
      cents
    })

  /** INCREMENTAL index maintenance: assign `newVectors` (vec_id,
    * embedding, label) to their nearest EXISTING centroid and append
    * them to the cell partitions — the standard IVF update (inverted
    * lists grow; centroids stay fixed until a deliberate rebuild, so
    * the index never needs retraining on arrival). Cost ∝ new data:
    * assignment is a map-only pass against the broadcast centroid
    * literals, the write appends only the touched `cell=` partitions,
    * and queries see the new vectors immediately — the same
    * steady-state economics as [[graft.sources.LogSync.sync]] for the
    * lake. Returns the number of vectors appended.
    */
  def append(spark: SparkSession, dir: String, newVectors: DataFrame): Long = {
    val cents = ensure(spark, dir)
    VectorFunctions.register(spark)
    val assigned = newVectors
      .select(col("vec_id"), col("embedding").as("v"), col("label"))
      .withColumn("nrm", sqrt(call_function("graft_dot", col("v"), col("v"))))
      .withColumn("cell",
        element_at(Similarity.topCellsExpr(cents)(col("v"), 1), 1))
    val n = assigned.count()
    assigned.write.mode("append").partitionBy("cell").parquet(root(dir))
    n
  }

  /** Top-5 cosine neighbors for a QUERY SET (a DataFrame with vec_id +
    * embedding columns — by default the standard vec_id < 10 set read
    * from the SOURCE table, never by scanning the index), reading only
    * the probed cell partitions. Ranking is identical to
    * [[Similarity.annIvf]] at the same nprobe and cell count — the
    * spec asserts exact agreement plus the PartitionFilters pruning.
    */
  def query(spark: SparkSession, dir: String, nprobe: Int = 3,
            querySet: Option[DataFrame] = None): DataFrame = {
    val cents = ensure(spark, dir)
    val q = querySet.getOrElse(Tables.embeddings(spark, dir).filter(col("vec_id") < 10))
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      .withColumn("qn", sqrt(call_function("graft_dot", col("qv"), col("qv"))))
      .withColumn("cell", explode(Similarity.topCellsExpr(cents)(col("qv"), nprobe)))
    // the probe set crosses the driver (|Q|×nprobe ints — control
    // plane) so it can prune as a LITERAL partition filter; a join
    // would read every cell and filter after the fact
    val probedCells = q.select(col("cell")).distinct().collect().map(_.getInt(0)).sorted
    val pruned = spark.read.parquet(root(dir))
      .filter(col("cell").isin(probedCells.map(Integer.valueOf): _*))
    val cosc = call_function("graft_dot", col("qv"), col("v")) / (col("qn") * col("nrm"))
    pruned.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosc.as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id"), col("rank"), round(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }
}
