package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types.{StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.LogSync

/** TABLE-VALUED FUNCTIONS over lake roots — the SQL face of the
  * [[LogSync]] read surface, registered through [[GraftExtensions]]'
  * `injectTableFunction` so a SQL-only session can both CONSUME
  * increments (the poll-advance-poll changelog loop, what the
  * reference's users get from Iceberg's `table_changes`-style TVFs)
  * and SNAPSHOT-READ the current or a historic table state:
  *
  * {{{
  *   SELECT * FROM graft_lake('<root>')               -- CURRENT snapshot
  *   SELECT * FROM graft_lake_at('<root>', TIMESTAMP '<t>')  -- time travel
  *   SELECT * FROM graft_lake_lookup('<root>', '<col>', v, ...) -- bloom-routed needle
  *   SELECT * FROM graft_watermark('<root>')          -- (append_hwm, delete_hwm)
  *   SELECT * FROM graft_changes('<root>', TIMESTAMP '<mark>')  -- appends
  *   SELECT * FROM graft_upserts('<root>', TIMESTAMP '<mark>')  -- upsert new values
  *   SELECT * FROM graft_deletes('<root>', TIMESTAMP '<mark>')  -- retracted rows
  * }}}
  *
  * `graft_lake` is the piece that makes the SQL lifecycle symmetric:
  * the dialect can register (`MAINTAIN ... SYNC`), mutate
  * (`DELETE/MERGE/UPSERT INTO LAKE`), maintain and evolve a root —
  * and with this TVF it can also SELECT the resulting state, which
  * none of the incremental TVFs provide (`graft_changes` from epoch
  * is NOT a snapshot: rewrite commits are excluded by design, so a
  * compacted-then-vacuumed lake loses rows on that path). It expands
  * to exactly [[LogSync.table]]'s plan — semi-join-pruned scan,
  * MOR delete application, evolution projection — so partition
  * pruning and delete semantics are identical to the Scala API's.
  *
  * The consumer polls `graft_watermark`, reads each stream since its
  * last mark, stores the new watermark, repeats — the same contract
  * as the Scala API, marks included. Arguments must be literals
  * (root: string; mark: TIMESTAMP or a string parsed in the session
  * time zone): the functions expand to the underlying scan plan at
  * analysis time, so the mark parameterizes PLANNING — manifest
  * pruning by `registered_at` — which a runtime-valued argument could
  * not. The expansion itself is control-plane only (manifest reads);
  * the data plane stays the distributed plan the Scala API builds.
  */
object GraftTableFunctions {

  private def evalLiteralString(e: Expression, fn: String, what: String): String = {
    require(e.foldable, s"$fn: $what must be a literal")
    e.eval() match {
      case s: UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be a literal string, got $other")
    }
  }

  private def evalMark(e: Expression, fn: String): java.sql.Timestamp = {
    require(e.foldable, s"$fn: the mark must be a literal")
    // a NULL mark refuses LOUDLY: null.asInstanceOf[Long] would unbox
    // to epoch 0 and silently turn an "incremental" poll into a
    // full-table batch (double-applied downstream)
    val v = e.eval()
    require(v != null, s"$fn: the mark must not be NULL — a changelog " +
      "consumer with no stored mark should pass its bootstrap instant " +
      "explicitly (epoch for a genuine full read)")
    e.dataType match {
      case TimestampType =>
        DateTimeUtils.toJavaTimestamp(v.asInstanceOf[Long])
      case StringType =>
        val zone = DateTimeUtils.getZoneId(
          SparkSession.active.sessionState.conf.sessionLocalTimeZone)
        val s = v.asInstanceOf[UTF8String]
        DateTimeUtils.stringToTimestamp(s, zone)
          .map(DateTimeUtils.toJavaTimestamp)
          .getOrElse(throw new IllegalArgumentException(
            s"$fn: cannot parse mark '$s' as a timestamp"))
      case dt => throw new IllegalArgumentException(
        s"$fn: the mark must be a TIMESTAMP or string literal, got $dt")
    }
  }

  private def twoArg(fn: String)(body: (SparkSession, String, java.sql.Timestamp)
      => org.apache.spark.sql.DataFrame): Seq[Expression] => LogicalPlan =
    exprs => {
      require(exprs.length == 2,
        s"$fn takes 2 arguments: (root string, mark timestamp), got ${exprs.length}")
      val spark = SparkSession.active
      val root = evalLiteralString(exprs.head, fn, "the lake root")
      body(spark, root, evalMark(exprs(1), fn)).queryExecution.logical
    }

  private def oneArg(fn: String)(body: (SparkSession, String)
      => org.apache.spark.sql.DataFrame): Seq[Expression] => LogicalPlan =
    exprs => {
      require(exprs.length == 1,
        s"$fn takes 1 argument (root string), got ${exprs.length}")
      val spark = SparkSession.active
      body(spark, evalLiteralString(exprs.head, fn, "the lake root"))
        .queryExecution.logical
    }

  /** Idempotently register every graft TVF into `spark`'s session
    * registry — the programmatic twin of [[GraftExtensions]]'
    * `injectTableFunction` for sessions built without
    * `spark.sql.extensions` (a notebook attaching to an existing
    * session, the Verify/Bench mains). Safe to call per query.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    builders.foreach { case (ident, info, builder) =>
      val reg = spark.sessionState.tableFunctionRegistry
      if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
    }

  /** (name, info, builder) triples for [[GraftExtensions]]. */
  private[graft] def builders: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    (FunctionIdentifier("graft_lake"),
      new ExpressionInfo("graft", null, "graft_lake",
        "graft_lake(root) - the lake's CURRENT state: the registered, " +
          "non-tombstoned files with row-level deletes applied - the " +
          "snapshot read graft_changes cannot provide (rewrites excluded " +
          "there by design)", ""),
      oneArg("graft_lake")((s, r) => LogSync.table(s, r))),
    (FunctionIdentifier("graft_lake_at"),
      new ExpressionInfo("graft", null, "graft_lake_at",
        "graft_lake_at(root, t) - time travel: the table as of instant t " +
          "(files registered and not tombstoned by then); horizon is the " +
          "vacuum retention", ""),
      twoArg("graft_lake_at")((s, r, ts) => LogSync.tableAsOf(s, r, ts))),
    (FunctionIdentifier("graft_changes"),
      new ExpressionInfo("graft", null, "graft_changes",
        "graft_changes(root, mark) - rows APPENDED to the lake after mark " +
          "(rewrites and upserts excluded - the incremental-append stream)", ""),
      twoArg("graft_changes")((s, r, ts) => LogSync.tableSince(s, r, ts))),
    (FunctionIdentifier("graft_upserts"),
      new ExpressionInfo("graft", null, "graft_upserts",
        "graft_upserts(root, mark) - new values written by upsert commits after mark", ""),
      twoArg("graft_upserts")((s, r, ts) => LogSync.upsertsSince(s, r, ts))),
    (FunctionIdentifier("graft_deletes"),
      new ExpressionInfo("graft", null, "graft_deletes",
        "graft_deletes(root, mark) - rows RETRACTED by genuine delete commits " +
          "after mark, with __delete_kind/__delete_op provenance columns", ""),
      twoArg("graft_deletes")((s, r, ts) => LogSync.deletedRowsSince(s, r, ts))),
    (FunctionIdentifier("graft_lake_lookup"),
      new ExpressionInfo("graft", null, "graft_lake_lookup",
        "graft_lake_lookup(root, column, value, ...) - point lookup routed " +
          "through the column's bloom sidecar (LakeIndex.on: incremental " +
          "build, then scan only the files whose bloom might hold a wanted " +
          "value; unindexed files always survive). Equals " +
          "graft_lake(root) WHERE column IN (values) row-for-row - the " +
          "needle path (trace/span/user point lookups) from pure SQL", ""),
      exprs => {
        require(exprs.length >= 3, "graft_lake_lookup takes at least 3 " +
          s"arguments: (root string, column string, value, ...), got ${exprs.length}")
        val spark = SparkSession.active
        val root = evalLiteralString(exprs.head, "graft_lake_lookup", "the lake root")
        val column = evalLiteralString(exprs(1), "graft_lake_lookup", "the indexed column")
        val values = exprs.drop(2).map(
          evalLiteralString(_, "graft_lake_lookup", "a lookup value"))
        // the handle ensures the sidecar covers every registered file
        // (incremental — a no-op when current) and expands to the
        // bloom-pruned keep-set read; like every graft TVF the
        // expansion is analysis-time control-plane, the scan stays the
        // distributed plan
        graft.sources.LakeIndex.on(spark, root, column)(values)
          .queryExecution.logical
      }),
    (FunctionIdentifier("graft_watermark"),
      new ExpressionInfo("graft", null, "graft_watermark",
        "graft_watermark(root) - one row (append_hwm, delete_hwm): the marks a " +
          "changelog consumer stores between polls", ""),
      exprs => {
        require(exprs.length == 1,
          s"graft_watermark takes 1 argument (root string), got ${exprs.length}")
        val spark = SparkSession.active
        val root = evalLiteralString(exprs.head, "graft_watermark", "the lake root")
        import spark.implicits._
        Seq((LogSync.highWaterMark(spark, root).orNull,
          LogSync.deleteHighWaterMark(spark, root).orNull))
          .toDF("append_hwm", "delete_hwm")
          .queryExecution.logical
      }))
}
