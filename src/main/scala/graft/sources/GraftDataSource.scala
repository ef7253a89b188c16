package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graft").load(root)` — the DataSourceV2 façade
  * that makes a registered lake readable by Spark code that has never
  * heard of the graft library (a third-party job, a BI connector's
  * generic reader). The provider is deliberately THIN: it answers
  * schema questions from [[LogSync.table]]'s resolved plan, and the
  * [[GraftLakeResolution]] rule (installed by
  * [[graft.GraftExtensions]]) swaps the analyzed `DataSourceV2Relation`
  * for that SAME plan during analysis — semi-join-pruned scan, MOR
  * delete application, evolution projection, partition pruning, all
  * byte-identical to the Scala API and the `graft_lake` TVF, because
  * it IS the same logical plan. Options: `path` (the lake root,
  * required), `asOf` (optional timestamp literal → [[LogSync.tableAsOf]]
  * time travel).
  *
  * Honest boundary: the delegation needs the extensions' resolution
  * rule. A session built WITHOUT GraftExtensions still resolves the
  * schema (so `load(root).schema` works anywhere) but refuses the scan
  * LOUDLY at execution with the fix named, rather than shipping a
  * second, drift-prone reimplementation of the read path behind the
  * DSv2 Scan interface.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  private def rootOf(options: JMap[String, String]): String = {
    val r = Option(options.get("path")).getOrElse(sys.error(
      "graft source needs a lake root: spark.read.format(\"graft\").load(<root>)"))
    r
  }

  private def asOfOf(options: JMap[String, String]): Option[java.sql.Timestamp] =
    Option(options.get("asOf")).map(java.sql.Timestamp.valueOf)

  private def planFor(options: JMap[String, String]) = {
    val spark = SparkSession.active
    val root = rootOf(options)
    asOfOf(options) match {
      case Some(ts) => LogSync.tableAsOf(spark, root, ts)
      case None => LogSync.table(spark, root)
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    planFor(options.asCaseSensitiveMap()).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    GraftLakeTable(rootOf(properties), asOfOf(properties), schema)
}

/** The analysis-time handle [[GraftLakeResolution]] resolves. Its
  * `newScanBuilder` is the loud no-extensions boundary, never the read
  * path.
  */
private[graft] final case class GraftLakeTable(root: String,
                                               asOf: Option[java.sql.Timestamp],
                                               tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft.`$root`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    sys.error("the graft DSv2 source delegates to the library's read plan " +
      "through a resolution rule this session does not have — start the " +
      "session with spark.sql.extensions=graft.GraftExtensions (or " +
      ".withExtensions(new GraftExtensions)), or call " +
      "graft.sources.LogSync.table directly")
}

/** Swap every analyzed `DataSourceV2Relation(GraftLakeTable)` for the
  * library's own resolved read plan, aliasing the real plan's output
  * onto the relation's attribute ids so parent operators' references
  * survive the splice. Runs at resolution, so downstream optimization
  * (filter pushdown into the pruned scan, AQE) sees only the real
  * plan — the façade costs nothing at execution.
  */
private[graft] class GraftLakeResolution(spark: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftLakeTable] =>
        val t = r.table.asInstanceOf[GraftLakeTable]
        val real = (t.asOf match {
          case Some(ts) => LogSync.tableAsOf(spark, t.root, ts)
          case None => LogSync.table(spark, t.root)
        }).queryExecution.analyzed
        val byName = real.output.map(a => a.name -> a).toMap
        Project(r.output.map { o =>
          val src = byName.getOrElse(o.name, sys.error(
            s"graft source: column '${o.name}' vanished from ${t.root} " +
              "between schema inference and resolution — the lake evolved " +
              "mid-query; re-plan"))
          Alias(src, o.name)(exprId = o.exprId)
        }, real)
    }
}
