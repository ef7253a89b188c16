package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorFunctions

/** Session-extension registration for graft's native expressions, so
  * any session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) gets every `graft_*`
  * function in SQL without per-session registry calls. Builders are
  * shared with [[VectorFunctions.register]] so both registration
  * paths apply the same arity/literal-argument guards.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private val usage = Map(
    "graft_dot" -> "graft_dot(a, b) - dot product of two float/double arrays",
    "graft_minhash" -> "graft_minhash(hashes) - 64-perm MinHash signature",
    "graft_simhash" -> "graft_simhash(tokens) - 64-bit SimHash packed into a BIGINT",
    "graft_topk_idx" -> "graft_topk_idx(arr, k) - 0-based indices of the k largest doubles, descending",
    "graft_hyperplanes" -> "graft_hyperplanes(vec, planesPerBand, bands) - banded hyperplane-LSH bucket ids",
    "graft_sample" -> "graft_sample(col, k) - deterministic bottom-k-by-hash sample aggregate",
    "graft_heavy_hitters" -> "graft_heavy_hitters(col, m) - SpaceSaving top-item summary with error bounds",
    "graft_bloom" -> "graft_bloom(longCol, expectedItems) - bloom-filter aggregate over 64-bit hashes",
    "graft_bloom_contains" -> "graft_bloom_contains(bloom, longCol) - membership probe against a bloom literal",
    "graft_bloom_any" -> "graft_bloom_any(bloom, hashArray) - does a per-row bloom contain any of the hashes",
    "graft_quantize8" -> "graft_quantize8(vec) - int8 scalar quantization of a float/double array to BINARY",
    "graft_dot8" -> "graft_dot8(a, b) - exact integer dot product of two int8-quantized BINARY vectors")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // the lake-evolution dialect (ALTER LAKE ... RENAME/ALTER/DROP
    // COLUMN) — everything else falls through to Spark's parser
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    VectorFunctions.builders.foreach { case (name, build) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage.getOrElse(name, name), ""),
        (exprs: Seq[Expression]) => build(exprs)))
    }
    // incremental-consumption TVFs (graft_changes / graft_upserts /
    // graft_deletes / graft_watermark) + the graft_lake/graft_lake_at
    // snapshot reads — the SQL changelog loop and its mutate→observe
    // symmetry
    GraftTableFunctions.builders.foreach(ext.injectTableFunction)
    // the DSv2 façade's delegation: spark.read.format("graft") resolves
    // to the library's own read plan (see GraftDataSource)
    ext.injectResolutionRule(s => new graft.sources.GraftLakeResolution(s))
  }
}
