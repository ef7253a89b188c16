package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructType}

import graft.sources.LakeEvolve

/** The SQL surface for lake evolution — what the reference's users get
  * from `ALTER TABLE ... RENAME COLUMN` on their Iceberg catalog
  * (README.md:100-115 drives everything through SQL), here as a tiny
  * dialect the session parser intercepts BEFORE delegating everything
  * else to Spark's own parser (the standard `injectParser` extension
  * shape):
  *
  * {{{
  *   ALTER LAKE '<root>' RENAME COLUMN <old> TO <new>
  *   ALTER LAKE '<root>' ALTER COLUMN <name> TYPE BIGINT|DOUBLE
  *   ALTER LAKE '<root>' DROP COLUMN <name>
  *   MAINTAIN LAKE '<root>' SYNC
  *   MAINTAIN LAKE '<root>' COMPACT
  *   MAINTAIN LAKE '<root>' VACUUM
  *   MAINTAIN LAKE '<root>' REWRITE MANIFESTS
  *   MAINTAIN LAKE '<root>' COMPACT DELETES
  *   MAINTAIN LAKE '<root>' CONVERT DELETES
  *   MAINTAIN LAKE '<root>' VACUUM DELETES
  *   MAINTAIN LAKE '<root>' EXPORT ICEBERG
  *   DELETE FROM LAKE '<root>' WHERE <predicate>          -- copy-on-write
  *   DELETE FROM LAKE '<root>' MOR WHERE <predicate>      -- position deletes
  *   MERGE INTO LAKE '<root>' BY (k1[, k2...]) USING <query>   -- CoW upsert
  *   UPSERT INTO LAKE '<root>' BY (k1[, k2...]) USING <query>  -- equality-delete upsert (CDC shape)
  * }}}
  *
  * Row-level DML statements delegate to [[graft.sources.LakeDml]]
  * (same leases, same sequence allocation, same commit protocol as
  * the Scala API) and return the commit's DmlStats as (stat, value)
  * rows. The DELETE predicate is parsed by Spark's own expression
  * parser against the lake's columns; MERGE/UPSERT read their update
  * rows from any SQL query (a view registered via
  * [[graft.sources.Tables.registerViews]], a VALUES list, a SELECT
  * over another lake) — the updates must carry every table column.
  *
  * Each statement plans to a driver-side command that calls the same
  * [[LakeEvolve]] entry points the Scala API uses — every guard
  * (layout routing, retired-name reservation, eq-delete binding,
  * stat-axis drop refusal, claim protocol) applies identically, and
  * so does the commit protocol: the command is metadata-only and
  * returns no rows. With [[GraftExtensions]] +
  * [[graft.sources.Tables.registerViews]] the whole engine — queries
  * AND schema evolution — is drivable from plain `spark.sql`.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    command(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}

object GraftSqlParser {

  // deliberately narrow: a quoted root (lake roots are paths, not
  // catalog identifiers) and bare column names — anything that does
  // not match falls through to Spark's parser untouched
  private val Rename =
    """(?is)\s*ALTER\s+LAKE\s+'([^']+)'\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*""".r
  private val Promote =
    """(?is)\s*ALTER\s+LAKE\s+'([^']+)'\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+(\w+)\s*;?\s*""".r
  private val Drop =
    """(?is)\s*ALTER\s+LAKE\s+'([^']+)'\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*""".r
  // maintenance: the OPTIMIZE/VACUUM surface (what the reference's
  // SQL-first user gets from their warehouse) over the same ops the
  // Scala API exposes — each returns its stats as rows so a SQL
  // session can see what happened
  private val Compact =
    """(?is)\s*MAINTAIN\s+LAKE\s+'([^']+)'\s+COMPACT\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*MAINTAIN\s+LAKE\s+'([^']+)'\s+VACUUM\s*;?\s*""".r
  private val RewriteMan =
    """(?is)\s*MAINTAIN\s+LAKE\s+'([^']+)'\s+REWRITE\s+MANIFESTS\s*;?\s*""".r
  private val Sync =
    """(?is)\s*MAINTAIN\s+LAKE\s+'([^']+)'\s+SYNC\s*;?\s*""".r
  private val ExportIce =
    """(?is)\s*MAINTAIN\s+LAKE\s+'([^']+)'\s+EXPORT\s+ICEBERG\s*;?\s*""".r
  // the MOR-delete maintenance verbs (fold position deletes, convert
  // equality deletes, retire inert delete files)
  private val CompactDel =
    """(?is)\s*MAINTAIN\s+LAKE\s+'([^']+)'\s+COMPACT\s+DELETES\s*;?\s*""".r
  private val ConvertDel =
    """(?is)\s*MAINTAIN\s+LAKE\s+'([^']+)'\s+CONVERT\s+DELETES\s*;?\s*""".r
  private val VacuumDel =
    """(?is)\s*MAINTAIN\s+LAKE\s+'([^']+)'\s+VACUUM\s+DELETES\s*;?\s*""".r
  // row-level DML: the WHERE text / USING query parse through Spark's
  // own parsers at execution (expr() for predicates, session.sql for
  // update sources), so the full SQL expression language applies
  private val DeleteCow =
    """(?is)\s*DELETE\s+FROM\s+LAKE\s+'([^']+)'\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val DeleteMor =
    """(?is)\s*DELETE\s+FROM\s+LAKE\s+'([^']+)'\s+MOR\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val MergeCow =
    """(?is)\s*MERGE\s+INTO\s+LAKE\s+'([^']+)'\s+BY\s*\(([^)]+)\)\s+USING\s+(.+?)\s*;?\s*""".r
  private val UpsertEq =
    """(?is)\s*UPSERT\s+INTO\s+LAKE\s+'([^']+)'\s+BY\s*\(([^)]+)\)\s+USING\s+(.+?)\s*;?\s*""".r

  private def keys(csv: String): Seq[String] =
    csv.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  private[graft] def command(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case Rename(root, from, to) => Some(GraftLakeAlter(root, "rename", from, to))
      case Promote(root, name, tpe) => Some(GraftLakeAlter(root, "promote", name, tpe))
      case Drop(root, name) => Some(GraftLakeAlter(root, "drop", name, ""))
      case Compact(root) => Some(GraftLakeMaintain(root, "compact"))
      case VacuumDel(root) => Some(GraftLakeMaintain(root, "vacuum_deletes"))
      case Vacuum(root) => Some(GraftLakeMaintain(root, "vacuum"))
      case RewriteMan(root) => Some(GraftLakeMaintain(root, "rewrite_manifests"))
      case CompactDel(root) => Some(GraftLakeMaintain(root, "compact_deletes"))
      case ConvertDel(root) => Some(GraftLakeMaintain(root, "convert_deletes"))
      case Sync(root) => Some(GraftLakeMaintain(root, "sync"))
      case ExportIce(root) => Some(GraftLakeExport(root))
      case DeleteMor(root, pred) => Some(GraftLakeDml(root, "delete_mor", pred, Seq.empty))
      case DeleteCow(root, pred) => Some(GraftLakeDml(root, "delete", pred, Seq.empty))
      case MergeCow(root, ks, q) => Some(GraftLakeDml(root, "merge", q, keys(ks)))
      case UpsertEq(root, ks, q) => Some(GraftLakeDml(root, "upsert_eq", q, keys(ks)))
      case _ => None
    }
}

/** Driver-side evolution command: runs at `spark.sql` execution (the
  * standard RunnableCommand shape — no executor ever evaluates it),
  * delegating to the [[LakeEvolve]] API so SQL and Scala share one
  * guard set and one commit protocol.
  */
case class GraftLakeAlter(root: String, op: String, a: String, b: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq.empty

  override def run(session: SparkSession): Seq[Row] = {
    op match {
      case "rename" => LakeEvolve.renameColumn(session, root, a, b)
      case "promote" =>
        val t = b.toUpperCase match {
          case "BIGINT" | "LONG" => LongType
          case "DOUBLE" => DoubleType
          case other => throw new IllegalArgumentException(
            s"unsupported promotion target '$other': only BIGINT and DOUBLE " +
              "are widening-safe (int->bigint, float->double)")
        }
        LakeEvolve.promoteColumn(session, root, a, t)
      case "drop" => LakeEvolve.dropColumn(session, root, a)
      case other => throw new IllegalStateException(s"unknown lake ALTER '$other'")
    }
    Seq.empty
  }
}

/** Driver-side maintenance command (`MAINTAIN LAKE '<root>' COMPACT |
  * VACUUM | REWRITE MANIFESTS`) — same ops as the Scala API
  * ([[graft.sources.LogCompact]]), with the op's stats surfaced as
  * result rows so a SQL session sees what happened.
  */
case class GraftLakeMaintain(root: String, op: String)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.LongType

  override def output: Seq[Attribute] = Seq(
    AttributeReference("stat", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("value", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = op match {
    case "sync" =>
      val n = graft.sources.LogSync.sync(session, root)
      Seq(Row("files_registered", n.toLong))
    case "compact" =>
      val st = graft.sources.LogCompact.compact(session, root)
      Seq(Row("files_before", st.filesBefore), Row("files_after", st.filesAfter))
    case "vacuum" =>
      val n = graft.sources.LogCompact.vacuum(session, root)
      Seq(Row("files_removed", n.toLong))
    case "rewrite_manifests" =>
      val st = graft.sources.LogCompact.rewriteManifests(session, root)
      Seq(Row("data_parts_before", st.dataPartsBefore.toLong),
        Row("data_parts_after", st.dataPartsAfter.toLong),
        Row("delete_parts_before", st.deletePartsBefore.toLong),
        Row("delete_parts_after", st.deletePartsAfter.toLong))
    case "compact_deletes" =>
      val (before, after) = graft.sources.LakeDml.compactDeletes(session, root)
      Seq(Row("delete_files_before", before.toLong),
        Row("delete_files_after", after.toLong))
    case "convert_deletes" =>
      val (retired, posRows) = graft.sources.LakeDml.convertEqDeletes(session, root)
      Seq(Row("eq_files_retired", retired.toLong),
        Row("position_rows_written", posRows))
    case "vacuum_deletes" =>
      val n = graft.sources.LakeDml.vacuumDeletes(session, root)
      Seq(Row("delete_files_tombstoned", n.toLong))
    case other => throw new IllegalStateException(s"unknown lake MAINTAIN '$other'")
  }
}

/** Row-level DML from SQL (`DELETE FROM LAKE`, `MERGE INTO LAKE`,
  * `UPSERT INTO LAKE`) — the same [[graft.sources.LakeDml]] commits
  * the Scala API makes (leases, sequence allocation, CAS retries all
  * identical), with the commit's DmlStats surfaced as (stat, value)
  * rows. `arg` is the WHERE text for deletes (parsed by Spark's
  * expression parser) or the USING query for merges/upserts (any SQL
  * producing the table's columns).
  */
case class GraftLakeDml(root: String, op: String, arg: String, keys: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.LongType

  override def output: Seq[Attribute] = Seq(
    AttributeReference("stat", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("value", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    import graft.sources.LakeDml
    val stats = op match {
      case "delete" =>
        LakeDml.delete(session, root, org.apache.spark.sql.functions.expr(arg))
      case "delete_mor" =>
        LakeDml.deleteMor(session, root, org.apache.spark.sql.functions.expr(arg))
      case "merge" => LakeDml.upsert(session, root, session.sql(arg), keys)
      case "upsert_eq" => LakeDml.upsertEq(session, root, session.sql(arg), keys)
      case other => throw new IllegalStateException(s"unknown lake DML '$other'")
    }
    Seq(Row("files_removed", stats.filesRemoved),
      Row("files_added", stats.filesAdded),
      Row("rows_changed", stats.rowsChanged))
  }
}

/** `MAINTAIN LAKE '<root>' EXPORT ICEBERG`: run the Iceberg metadata
  * export ([[graft.sources.IcebergExport.export]]) and return the
  * committed metadata location — the same value the Scala API hands a
  * catalog registration.
  */
case class GraftLakeExport(root: String) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference

  override def output: Seq[Attribute] = Seq(
    AttributeReference("metadata_location",
      org.apache.spark.sql.types.StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(graft.sources.IcebergExport.export(session, root)))
}
