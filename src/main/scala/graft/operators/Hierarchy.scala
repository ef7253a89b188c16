package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Recursive-hierarchy traversal — Spark's answer to `WITH RECURSIVE`.
  *
  * Spark has no recursive CTE; the engine capability a user actually
  * needs from one (org charts, category trees, BOM rollups, thread
  * ancestry) is "give every node its depth/root/ancestor", and that is
  * computable in O(log depth) self-join rounds by POINTER JUMPING:
  * each round every node's known-ancestor pointer jumps twice as far
  * (`anc ← anc.anc`, accumulating the hop distance), so a chain of
  * depth d resolves in ⌈log₂ d⌉ rounds instead of d. Each round is one
  * equi-join keyed on the ancestor id plus a localCheckpoint to
  * truncate lineage — the same discipline as
  * [[Curation.dedupClusters]]. At 100 TB the edge table shuffles by
  * node id; no round ever materializes paths (only (node, anc, dist)
  * triples), so state stays one row per node.
  *
  * The demo hierarchy derives a binary org tree from customer keys
  * (the heap convention: `parent(c) = (c − 1) / 2`, root = 0) — a pure
  * function of the key, so DuckDB rebuilds the identical tree and its
  * `WITH RECURSIVE` depth computation is an exact oracle for the
  * pointer-jumping result.
  */
object Hierarchy {

  /** Per-node depth for an edge table `(id, parent)` with roots
    * signalled by `parent IS NULL`. Pointer jumping: rounds =
    * ⌈log₂ max-depth⌉; convergence when every pointer reaches a root.
    */
  def depths(edges: DataFrame): DataFrame = {
    // the open-row count rides the materializing localCheckpoint action
    // itself (the dedupClusters lesson): exactly ONE driver job per
    // jump round
    def checkpointWithOpen(df: DataFrame, tag: String): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation(tag)
      val out = df
        .observe(obs, sum(when(col("done"), 0L).otherwise(1L)).as("open"))
        .localCheckpoint()
      (out, obs.get("open").asInstanceOf[Long])
    }
    // (id, anc, dist): anc = furthest known ancestor, dist = hops to it.
    // Roots start resolved at depth 0.
    var (cur, open) = checkpointWithOpen(
      edges.select(col("id"), col("parent").as("anc"),
        when(col("parent").isNull, 0L).otherwise(1L).as("dist"),
        col("parent").isNull.as("done")), "seed")
    var round = 0
    while (open > 0) {
      // distance doubles per round, so 64 rounds resolve any acyclic
      // chain; still-open rows after that can only mean a parent CYCLE
      // in the edge data — fail instead of spinning forever
      require(round < 64,
        s"$open rows unresolved after 64 pointer-jump rounds — the edge table contains a cycle")
      // jump: follow my anc's pointer — my new anc is anc.anc, my new
      // dist adds anc's dist; rows whose anc is already a root finish.
      // (coalesce guards a dangling parent id: treated as a root so the
      // loop cannot spin on it.)
      val ptr = cur.select(col("id").as("p_id"), col("anc").as("p_anc"),
        col("dist").as("p_dist"), col("done").as("p_done"))
      val next = cur.as("c")
        .join(ptr, col("c.anc") === col("p_id"), "left")
        .select(
          col("c.id").as("id"),
          when(col("c.done"), col("c.anc")).otherwise(col("p_anc")).as("anc"),
          when(col("c.done"), col("c.dist"))
            .otherwise(col("c.dist") + coalesce(col("p_dist"), lit(0L))).as("dist"),
          (col("c.done") || coalesce(col("p_done"), lit(true))).as("done"))
      val r = checkpointWithOpen(next, s"jump$round")
      cur = r._1; open = r._2; round += 1
    }
    cur.select(col("id"), col("dist").as("depth"))
  }

  /** Contract query: depth histogram of the key-derived customer org
    * tree — `(depth, n, min/max customer key at that depth)`. Exact
    * integers; DuckDB's `WITH RECURSIVE` over the same derived edges is
    * the oracle.
    */
  def customerTree(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables.customer(spark, dir)
      .select(col("c_custkey").as("id"),
        when(col("c_custkey") === 0, lit(null).cast("long"))
          .otherwise(((col("c_custkey") - 1) / 2).cast("long")).as("parent"))
    depths(edges)
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n"),
        min(col("id")).as("min_key"), max(col("id")).as("max_key"))
      .orderBy(col("depth"))
  }
}
