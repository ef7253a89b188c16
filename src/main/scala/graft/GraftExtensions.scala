package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, HyperplaneBuckets, MinHashSignature, SimHashBits}

/** Session-extension registration for graft's native expressions, so
  * any session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) gets `graft_dot`,
  * `graft_minhash` and `graft_simhash` in SQL without per-session
  * registry calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float/double arrays"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(hashes) - 64-perm MinHash signature"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - 64-bit SimHash packed into a BIGINT"),
      (exprs: Seq[Expression]) => SimHashBits(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_topk_idx"),
      info("graft_topk_idx",
        "graft_topk_idx(arr, k) - 0-based indices of the k largest doubles, descending"),
      (exprs: Seq[Expression]) => graft.functions.TopKIndices(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("graft_hyperplanes"),
      info("graft_hyperplanes",
        "graft_hyperplanes(vec, planesPerBand, bands) - banded hyperplane-LSH bucket ids"),
      (exprs: Seq[Expression]) => HyperplaneBuckets(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue())))
  }
}
