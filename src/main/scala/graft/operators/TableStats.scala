package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** ANALYZE-style table statistics: per-column row count, null count,
  * distinct count, and min/max — the stats a lakehouse keeps per
  * table/file for CBO and zone-map pruning (the manifest zone-maps in
  * [[graft.sources.LogSync]] are the per-file form of the same idea).
  *
  * Shape: ONE aggregate pass computes every metric, then the single
  * result row is exploded into one output row per column — the table
  * is scanned once no matter how many columns are profiled. Numeric
  * min/max are emitted as doubles (`min_num`/`max_num`), temporal and
  * string min/max as strings (`min_str`/`max_str`) — raw data values,
  * no cross-engine float formatting.
  *
  * Scale note: multiple exact `countDistinct`s rewrite into one
  * Expand (one shuffled pass at |cols|× width). At 100 TB profile with
  * `exact = false`: `approx_count_distinct` keeps the pass Expand-free
  * with one fixed-size HLL sketch per column (then the result is
  * rows-only, not oracle-exact).
  */
object TableStats {

  private case class Col(name: String, numeric: Boolean, str: Column => Column)

  def lineitemStats(spark: SparkSession, dir: String, exact: Boolean = true): DataFrame = {
    val cols = Seq(
      Col("l_quantity", numeric = true, identity),
      Col("l_extendedprice", numeric = true, identity),
      Col("l_linenumber", numeric = true, identity),
      Col("l_returnflag", numeric = false, identity),
      Col("l_shipdate", numeric = false, c => date_format(c, "yyyy-MM-dd HH:mm:ss")))
    val ndv: Column => Column =
      if (exact) c => countDistinct(c) else c => approx_count_distinct(c)
    val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
      val x = col(c.name)
      Seq(
        sum(when(x.isNull, 1L).otherwise(0L)).as(s"null_${c.name}"),
        ndv(x).as(s"ndv_${c.name}"),
        (if (c.numeric) min(x).cast("double") else lit(null).cast("double"))
          .as(s"minn_${c.name}"),
        (if (c.numeric) max(x).cast("double") else lit(null).cast("double"))
          .as(s"maxn_${c.name}"),
        (if (c.numeric) lit(null).cast("string") else min(c.str(x)))
          .as(s"mins_${c.name}"),
        (if (c.numeric) lit(null).cast("string") else max(c.str(x)))
          .as(s"maxs_${c.name}"))
    }
    Tables.lineitem(spark, dir)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(
          lit(c.name).as("col_name"), col("n"),
          col(s"null_${c.name}").as("n_null"),
          col(s"ndv_${c.name}").as("n_distinct"),
          col(s"minn_${c.name}").as("min_num"),
          col(s"maxn_${c.name}").as("max_num"),
          col(s"mins_${c.name}").as("min_str"),
          col(s"maxs_${c.name}").as("max_str"))
      }: _*)).as("s"))
      .select(col("s.*"))
      .orderBy(col("col_name"))
  }
}
