package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ID-BOUND SCHEMA EVOLUTION — column RENAME, numeric type
  * PROMOTION (int → long, float → double) and column DROP over the
  * raw-parquet lake, with Iceberg's contract: a rename is
  * METADATA-ONLY (the field id never moves, no data byte is rewritten
  * — old files keep their old physical column name forever), a
  * promotion is a WIDENING read (old files keep their narrow physical
  * type; the scan requests the wide one and the parquet reader
  * up-casts), and a drop retires the name (id reserved forever, bytes
  * untouched until natural rewrite). Adds need no API at all — the
  * lake's union-schema reads admit new columns forward. This is what the
  * reference gets from `ALTER TABLE ... RENAME COLUMN` on its Iceberg
  * catalog; here re-expressed over the manifest + sidecar pair.
  *
  * MECHANICS. Evolutions append to a versioned `_schema_log_v<N>`
  * sidecar (newest wins, write-then-rename into a fresh version — the
  * same crash-atomic discipline as the `_field_ids_v<N>` map). Each
  * entry records the op and the full LOGICAL schema after it, so the
  * read side never re-merges physical footers (which Spark cannot do
  * across a promotion — int vs long footers fail its schema merge).
  * Every lake read ([[LogSync.table]] and friends, DML scans,
  * conversion scans) then:
  *
  *  1. requests an EXPLICIT schema = stored logical schema ∪ columns
  *     newer files added since the last evolution (one newest-footer
  *     probe, memoized) ∪ each renamed column's OLD names at the
  *     final type — absent columns read null, narrow columns widen;
  *  2. projects `coalesce(newName, oldName…)` into the final name and
  *     drops the old names — per row exactly one source is non-null
  *     (a file carries the column under exactly one name).
  *
  * A lake with no schema log pays ONE `fs.exists` per read and takes
  * the historical path untouched.
  *
  * INTEROP. The field-id sidecar gains the new name at the SAME id
  * (rename) / the widened type (promote), so equality-delete parquet
  * written after the evolution stamps ids consistent with every
  * earlier export; [[IcebergExport]] exports the renamed schema under
  * a fresh schema-id (history retained, prior snapshots keep theirs)
  * and lists the old names as ALIASES in the spec's
  * `schema.name-mapping.default` property — the standard mechanism by
  * which engines binding by name resolve pre-rename files — and its
  * own [[IcebergExport.readChain]] honors those aliases the same way.
  *
  * GUARDS (all refusals, never silent): the partition-layout columns
  * and the zone-map stat columns (`timestamp`, `service_name` — the
  * manifest binds them by name) cannot evolve; a rename target must
  * not collide with a live column (and a retired old name is reserved
  * forever — re-adding it would make old files' physical columns
  * ambiguous); a column with ACTIVE equality deletes cannot evolve
  * (the registered delete parquet binds the old name/type — run
  * [[LakeDml.convertEqDeletes]] or compact first); only the two
  * spec-legal widenings are accepted.
  *
  * 100 TB: an evolution is one control-plane sidecar swap. Reads pay
  * one newest-footer open (memoized per lake state) and one extra
  * projection — no shuffle, no extra scan; pushdown survives because
  * the coalesce is a plain projection over the same single root scan.
  */
object LakeEvolve {

  /** One recorded evolution. For renames `from`/`to` are the names;
    * for promotes `from == to == name` and only the type changed.
    */
  final case class Evo(op: String, id: Int, from: String, to: String)

  /** The resolved evolution state of a lake: ordered entries, the
    * stored LOGICAL schema after the last entry, final-name → old
    * physical names (newest alias first), any-name → final name, and
    * the DROPPED names (a dropped column's every physical name —
    * reserved forever: old files still carry the bytes, and a
    * re-added same-named column would silently resurrect them, so the
    * read side ignores the name for the lake's whole life).
    */
  final case class EvoState(version: Int, entries: Seq[Evo],
                            stored: StructType,
                            aliasesOf: Map[String, Seq[String]],
                            finalOf: Map[String, String],
                            dropped: Set[String] = Set.empty) {
    def currentName(n: String): String = finalOf.getOrElse(n, n)
    def supersededNames: Set[String] = aliasesOf.values.flatten.toSet ++ dropped
  }

  private val SchemaLogVersionRe = "_schema_log_v([0-9]+)".r

  private[graft] def schemaLogCurrent(spark: SparkSession,
                                      root: String): (Int, Path) = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions =
      if (!fs.exists(new Path(root))) Seq.empty
      else fs.listStatus(new Path(root)).toSeq.flatMap(_.getPath.getName match {
        case SchemaLogVersionRe(v) => Some(v.toInt)
        case _ => None
      })
    if (versions.isEmpty) (0, new Path(s"$root/_schema_log_v0"))
    else (versions.max, new Path(s"$root/_schema_log_v${versions.max}"))
  }

  /** Schema-log version token for cache keys that must invalidate on
    * evolution (export memos): 0 = never evolved.
    */
  private[graft] def logVersion(spark: SparkSession, root: String): Int =
    schemaLogCurrent(spark, root)._1

  private def parseLog(txt: String): (Seq[Evo], StructType) = {
    var stored: Option[StructType] = None
    val entries = txt.split('\n').toSeq.map(_.trim).filter(_.nonEmpty).flatMap { l =>
      l.split('\t') match {
        case Array("rename", id, from, to) => Some(Evo("rename", id.toInt, from, to))
        case Array("promote", id, name, _, _) => Some(Evo("promote", id.toInt, name, name))
        case Array("drop", id, name) => Some(Evo("drop", id.toInt, name, name))
        case Array("schema", ddl) =>
          stored = Some(StructType.fromDDL(ddl)); None
        case _ => sys.error(s"malformed _schema_log line: '$l'")
      }
    }
    (entries, stored.getOrElse(sys.error("schema log carries no stored schema")))
  }

  private def renderLog(entries: Seq[String], stored: StructType): String =
    (entries :+ s"schema\t${stored.toDDL}").mkString("\n")

  /** The evolution state, or None for a never-evolved lake (the
    * zero-cost common case: one fs.exists).
    */
  private[graft] def state(spark: SparkSession, root: String): Option[EvoState] = {
    val (v, p) = schemaLogCurrent(spark, root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val (entries, stored) = parseLog(txt)
    // fold renames into alias chains; promotes don't alias (same
    // physical name, narrower physical type — widening handles it);
    // drops retire the name AND its whole alias chain
    var aliases = Map.empty[String, Seq[String]]
    var finals = Map.empty[String, String]
    var dropped = Set.empty[String]
    entries.foreach {
      case Evo("rename", _, from, to) =>
        val chain = from +: aliases.getOrElse(from, Seq.empty)
        aliases = (aliases - from) + (to -> chain)
        finals = finals.map { case (k, v) => k -> (if (v == from) to else v) } +
          (from -> to)
      case Evo("drop", _, name, _) =>
        dropped ++= (name +: aliases.getOrElse(name, Seq.empty)).toSet
        aliases -= name
        finals = finals.filterNot(_._2 == name)
      case _ => ()
    }
    Some(EvoState(v, entries, stored, aliases, finals, dropped))
  }

  private def writeLog(spark: SparkSession, root: String,
                       content: String): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (curV, _) = schemaLogCurrent(spark, root)
    val target = new Path(s"$root/_schema_log_v${curV + 1}")
    val tmp = new Path(s"$root/_schema_log_tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    require(!fs.exists(target) && fs.rename(tmp, target),
      s"schema-log swap conflict under $root: version ${curV + 1} already " +
        "exists or the rename failed — another writer won; re-plan")
    val old = new Path(s"$root/_schema_log_v$curV")
    if (fs.exists(old)) { fs.delete(old, false); () }
  }

  /** The current logical LOAD schema (data + partition-dir columns):
    * the stored one when a log exists, else one mergeSchema load —
    * the pre-evolution baseline an evolution op starts from.
    */
  private def currentLogical(spark: SparkSession, root: String,
                             st: Option[EvoState]): StructType = st match {
    case Some(s) => unionWithNewest(spark, root, s)
    case None => spark.read.option("basePath", root)
      .option("mergeSchema", "true").parquet(root).schema
  }

  /** Stored schema ∪ columns the newest registered file added after
    * the last evolution (forward add-column evolution keeps working on
    * an evolved lake) — excluding retired old names.
    */
  private def unionWithNewest(spark: SparkSession, root: String,
                              st: EvoState): StructType = {
    val newest = LogSync.activeManifest(spark, root)
      .orderBy(col("registered_at").desc, col("path").desc)
      .select("path").limit(1).collect().headOption.map(_.getString(0))
    val extra = newest.toSeq.flatMap { p =>
      spark.read.parquet(p).schema.fields.toSeq.filter(f =>
        !st.stored.fieldNames.contains(f.name) &&
          !st.supersededNames.contains(f.name))
    }
    StructType(st.stored.fields ++ extra)
  }

  /** The EXPLICIT scan schema for an evolved lake: logical columns at
    * their final (possibly widened) types, plus every retired old name
    * at the final column's type — parquet fills null where a file
    * lacks a name and widens where it is narrow.
    */
  private[graft] def requestSchema(spark: SparkSession, root: String,
                                   st: EvoState): StructType = {
    val logical = unionWithNewest(spark, root, st)
    val aliasFields = st.aliasesOf.toSeq.sortBy(_._1).flatMap { case (fin, olds) =>
      val t = logical.find(_.name == fin).map(_.dataType)
        .getOrElse(sys.error(s"renamed column '$fin' missing from logical schema"))
      olds.map(o => StructField(o, t, nullable = true))
    }
    StructType(logical.fields ++ aliasFields)
  }

  /** Fold each renamed column's alias chain into its final name and
    * drop the old names. Any extra columns on `df` (`__src`, row
    * ordinals) pass through untouched; alias columns absent from `df`
    * are skipped (callers that request [[requestSchema]] always have
    * them).
    */
  private[graft] def project(df: DataFrame, st: EvoState): DataFrame = {
    st.aliasesOf.toSeq.sortBy(_._1).foldLeft(df) { case (acc, (fin, olds)) =>
      val present = olds.filter(acc.columns.contains)
      if (present.isEmpty || !acc.columns.contains(fin)) acc
      else acc.withColumn(fin, coalesce((fin +: present).map(col): _*))
        .drop(present: _*)
    }
  }

  /** Names a lake read must materialize from `_metadata` BEFORE
    * [[project]] runs (a projection ends `_metadata` resolution).
    */
  private[graft] def hasLog(spark: SparkSession, root: String): Boolean =
    state(spark, root).nonEmpty

  // the zone-map stat columns the manifest binds by NAME
  private val StatBound = Set("timestamp", "service_name")

  private def commonGuards(spark: SparkSession, root: String,
                           name: String): Unit = {
    require(LogSync.hasManifest(spark, root),
      s"no manifest under $root — run sync first")
    val layout = LogCompact.inferLayout(spark, root)
    require(!layout.contains(name),
      s"cannot evolve partition-layout column '$name': the directory " +
        "structure binds it by name; re-layout is a separate operation")
    require(!StatBound.contains(name),
      s"cannot evolve '$name': the manifest's zone-map stats bind it by " +
        "name (every registered file's min/max entries would go stale)")
    val activeEq = LogSync.deleteEntries(spark, root)
      .filter(e => e.isEq && e.eqCols.contains(name))
    require(activeEq.isEmpty,
      s"cannot evolve '$name': ${activeEq.length} active equality-delete " +
        "file(s) bind it by name/type — run LakeDml.convertEqDeletes (or " +
        "compact) first, then evolve")
  }

  /** METADATA-ONLY column rename: `from` becomes `to`, keeping its
    * field id; no data file is touched. Old files keep the old
    * physical name forever — every read path coalesces it in, and
    * exports alias it via name-mapping.
    */
  def renameColumn(spark: SparkSession, root: String,
                   from: String, to: String): Unit = {
    commonGuards(spark, root, from)
    val st = state(spark, root)
    val logical = currentLogical(spark, root, st)
    require(logical.fieldNames.contains(from), s"no column '$from' to rename")
    require(!logical.fieldNames.contains(to),
      s"rename target '$to' already exists")
    require(st.forall(s => !s.supersededNames.contains(to) &&
        !s.aliasesOf.contains(to)),
      s"rename target '$to' is a retired name — reserved forever (old " +
        "files still carry it physically)")
    // the id is pinned BEFORE the log entry lands: the sidecar refresh
    // below reads the pre-rename state
    val fid = IcebergExport.exportFieldIds(spark, root)
    require(fid.contains(from), s"column '$from' resolves no field id")
    val id = fid(from)
    val t = logical(from).dataType
    IcebergExport.recordEvolvedField(spark, root, to, id, t.catalogString)
    val newStored = StructType(logical.fields.map(f =>
      if (f.name == from) StructField(to, f.dataType, f.nullable) else f))
    val prior = st.map(_.entries).getOrElse(Seq.empty).map(renderEntry)
    writeLog(spark, root, renderLog(prior :+ s"rename\t$id\t$from\t$to", newStored))
    // a LakeIndex bloom sidecar on the renamed column stays VALID —
    // it stores xxhash64 of the column's VALUES, which a rename does
    // not touch — so it moves with the name (one dir rename); without
    // this, index-pruned probes on the new name would silently lose
    // their pruning and conversion scans would pay full candidates
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldIdx = new Path(s"$root/_index/$from")
    if (fs.exists(oldIdx)) {
      require(fs.rename(oldIdx, new Path(s"$root/_index/$to")),
        s"bloom index move failed for rename $from -> $to under $root")
    }
    // same rule for the token (grep) sidecar: token sets of the values
    val oldTok = new Path(s"$root/_index/tok_$from")
    if (fs.exists(oldTok)) {
      require(fs.rename(oldTok, new Path(s"$root/_index/tok_$to")),
        s"token index move failed for rename $from -> $to under $root")
    }
  }

  /** WIDENING type promotion (int → long, float → double; the v2
    * spec's legal set for this lake's primitive surface): old files
    * keep their narrow physical type, the scan requests the wide one.
    */
  def promoteColumn(spark: SparkSession, root: String,
                    name: String, toType: DataType): Unit = {
    commonGuards(spark, root, name)
    val st = state(spark, root)
    val logical = currentLogical(spark, root, st)
    require(logical.fieldNames.contains(name), s"no column '$name' to promote")
    val fromType = logical(name).dataType
    val legal = (fromType, toType) match {
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
    require(legal,
      s"unsupported promotion ${fromType.catalogString} -> " +
        s"${toType.catalogString}: only int->bigint and float->double " +
        "are widening-safe for every reader of this lake")
    val fid = IcebergExport.exportFieldIds(spark, root)
    require(fid.contains(name), s"column '$name' resolves no field id")
    val id = fid(name)
    IcebergExport.recordEvolvedField(spark, root, name, id, toType.catalogString)
    val newStored = StructType(logical.fields.map(f =>
      if (f.name == name) StructField(name, toType, f.nullable) else f))
    val prior = st.map(_.entries).getOrElse(Seq.empty).map(renderEntry)
    writeLog(spark, root, renderLog(prior :+
      (s"promote\t$id\t$name\t${fromType.catalogString}\t" +
        toType.catalogString), newStored))
  }

  /** METADATA-ONLY column drop: the column vanishes from every read
    * (including — the current-schema simplification — time travel);
    * no data file is touched, old files keep the bytes until natural
    * rewrite. The name and its whole rename chain stay RESERVED
    * forever: a later file re-adding the name is IGNORED by the read
    * side (old files' stale values would otherwise resurrect through
    * the union), and rename targets may not reuse it. Refused while
    * ANY delete-registry row — active or tombstoned-but-unvacuumed —
    * binds the column (a historic equality delete must keep resolving
    * for time travel inside the vacuum horizon; drop after vacuum).
    */
  def dropColumn(spark: SparkSession, root: String, name: String): Unit = {
    commonGuards(spark, root, name)
    val st = state(spark, root)
    val logical = currentLogical(spark, root, st)
    require(logical.fieldNames.contains(name), s"no column '$name' to drop")
    // every registry row, tombstones included: historic reads apply
    // them until vacuum purges, and they bind key columns by name
    if (LogSync.hasDeleteManifest(spark, root)) {
      val chain = (name +: st.map(_.aliasesOf.getOrElse(name, Seq.empty))
        .getOrElse(Seq.empty)).toSet
      val bound = LogSync.deleteManifestDf(spark, root)
        .select("eq_cols").collect()
        .flatMap(r => Option(r.getString(0)).toSeq.flatMap(_.split(',')))
        .toSet
      require(chain.intersect(bound).isEmpty,
        s"cannot drop '$name': delete-registry rows (possibly tombstoned, " +
          "still applied by time travel until vacuum) bind it by name — " +
          "vacuum past them first, then drop")
    }
    val fid = IcebergExport.exportFieldIds(spark, root)
    require(fid.contains(name), s"column '$name' resolves no field id")
    val newStored = StructType(logical.fields.filterNot(_.name == name))
    require(newStored.fields.nonEmpty, "cannot drop the last column")
    val prior = st.map(_.entries).getOrElse(Seq.empty).map(renderEntry)
    writeLog(spark, root,
      renderLog(prior :+ s"drop\t${fid(name)}\t$name", newStored))
  }

  private def renderEntry(e: Evo): String = e.op match {
    case "rename" => s"rename\t${e.id}\t${e.from}\t${e.to}"
    // promote entries re-render without the original types (the stored
    // schema carries the final type; the entry only marks that the
    // column's physical types vary across files)
    case "promote" => s"promote\t${e.id}\t${e.from}\t-\t-"
    case "drop" => s"drop\t${e.id}\t${e.from}"
    case other => sys.error(s"unknown evolution op '$other'")
  }
}
