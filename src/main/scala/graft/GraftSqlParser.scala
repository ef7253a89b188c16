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
  * }}}
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

  private[graft] def command(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case Rename(root, from, to) => Some(GraftLakeAlter(root, "rename", from, to))
      case Promote(root, name, tpe) => Some(GraftLakeAlter(root, "promote", name, tpe))
      case Drop(root, name) => Some(GraftLakeAlter(root, "drop", name, ""))
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
