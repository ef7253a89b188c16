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
  * untouched until natural rewrite). Adds need no API: the sync that
  * registers a file RECORDS any new columns its footer carries into
  * the schema log ([[recordAdds]]), so the logical schema is always
  * stored — no read ever probes footers. This is what the reference
  * gets from `ALTER TABLE ... RENAME COLUMN` on its Iceberg catalog;
  * here re-expressed over the manifest + sidecar pair.
  *
  * MECHANICS. Evolutions append to a versioned `_schema_log_v<N>`
  * sidecar (newest wins, write-then-rename into a fresh version — the
  * same crash-atomic discipline as the `_field_ids_v<N>` map). The
  * log records the BASELINE schema (pre-evolution), then each entry
  * with its commit instant and the full LOGICAL schema after it, so
  * (a) the read side never re-merges physical footers (which Spark
  * cannot do across a promotion — int vs long footers fail its schema
  * merge) and (b) TIME TRAVEL resolves the schema as of any instant
  * ([[stateAt]] — Iceberg's snapshot-schema semantics: a pre-drop
  * anchor still surfaces the dropped column, a pre-rename anchor the
  * old name). Every lake read ([[LogSync.table]] and friends, DML
  * scans, conversion scans) then:
  *
  *  1. requests an EXPLICIT schema = the as-of stored logical schema
  *     ∪ each renamed column's OLD names at the final type — absent
  *     columns read null, narrow columns widen;
  *  2. projects `coalesce(newName, oldName…)` into the final name and
  *     drops the old names — per row exactly one source is non-null
  *     (a file carries the column under exactly one name).
  *
  * A lake with no schema log pays ONE `fs.exists` per read and takes
  * the historical path untouched; evolved lakes resolve their state
  * from a per-(root, log-version) memo — one log read per evolution,
  * not per query.
  *
  * INTEROP. The field-id sidecar gains the new name at the SAME id
  * (rename) / the widened type (promote), so equality-delete parquet
  * written after the evolution stamps ids consistent with every
  * earlier export; [[IcebergExport]] exports the renamed schema under
  * a fresh schema-id (history retained, prior snapshots keep theirs
  * and time-travel reads resolve under them) and lists the old names
  * as ALIASES in the spec's `schema.name-mapping.default` property —
  * the standard mechanism by which engines binding by name resolve
  * pre-rename files — and its own [[IcebergExport.readChain]] honors
  * those aliases the same way. COMMIT ORDER is log-first: the schema
  * log is the root of trust, and a crash before the sidecar binding
  * lands self-heals ([[IcebergExport.schemaFieldsFor]] re-derives the
  * binding from the log's rename entry); the reverse order left an
  * orphaned name→id row that a later same-named add would silently
  * inherit, minting invalid two-names-one-id metadata.
  *
  * GUARDS (all refusals, never silent): the partition-layout columns
  * cannot evolve (the directory structure binds them by name); the
  * zone-map stat axes (`timestamp`, `service_name` originally) CAN be
  * RENAMED — the manifest's recorded min/max VALUES are the field's
  * values, untouched by a rename, and every axis consumer resolves
  * the field's current name through [[timeAxis]]/[[svcAxis]] — but
  * cannot be DROPPED (retention planning and zone-map pruning would
  * lose their axis); a rename target must not collide with a live
  * column (and a retired old name is reserved forever — re-adding it
  * would make old files' physical columns ambiguous); a column with
  * ACTIVE equality deletes cannot evolve (the registered delete
  * parquet binds the old name/type — run [[LakeDml.convertEqDeletes]]
  * or compact first); only the two spec-legal widenings are accepted.
  *
  * 100 TB: an evolution is one control-plane sidecar swap. Reads pay
  * one memoized log parse and one extra projection — no footer probe,
  * no shuffle, no extra scan; pushdown survives because the coalesce
  * is a plain projection over the same single root scan.
  */
object LakeEvolve {

  /** One recorded evolution at commit instant `at` (epoch millis; 0 =
    * a legacy pre-timestamp entry, always considered in-window). For
    * renames `from`/`to` are the names; for promotes
    * `from == to == name` and only the type changed; for adds (sync-
    * recorded new columns) `from == to == name` and `id` is -1 — the
    * export assigns the real id when it first sees the column. A
    * `layout` entry is a rename of a PARTITION-LAYOUT column: the
    * directory tree keeps the physical key forever (like data files
    * keep their physical column names); reads resolve it as a plain
    * column alias so partition pruning survives (`id` is -1 — layout
    * ids live in the export's partition-field namespace).
    */
  final case class Evo(op: String, id: Int, from: String, to: String,
                       at: Long = 0L)

  /** The resolved evolution state of a lake (at some instant):
    * ordered entries with their post-entry schemas, the BASELINE
    * (pre-evolution) schema, the stored LOGICAL schema after the last
    * entry, final-name → old physical names (newest alias first),
    * any-name → final name, and the DROPPED names (a dropped column's
    * every physical name — reserved forever: old files still carry
    * the bytes, and a re-added same-named column would silently
    * resurrect them, so the read side ignores the name for the lake's
    * whole life).
    */
  final case class EvoState(version: Int, entries: Seq[Evo],
                            stored: StructType,
                            aliasesOf: Map[String, Seq[String]],
                            finalOf: Map[String, String],
                            dropped: Set[String] = Set.empty,
                            baseline: StructType = new StructType(),
                            history: Seq[(Evo, StructType)] = Seq.empty,
                            // true = parsed from a pre-v2 log (no
                            // schema0/per-entry schemas): adds were
                            // never recorded, so reads preserve the
                            // old newest-footer union (legacyUnion)
                            legacy: Boolean = false,
                            // LAYOUT-RENAMED columns: current logical
                            // name → its prior names, newest first —
                            // the LAST element is the physical
                            // directory key the tree is built on
                            layoutOf: Map[String, Seq[String]] = Map.empty) {
    def currentName(n: String): String = finalOf.getOrElse(n, n)
    def supersededNames: Set[String] =
      aliasesOf.values.flatten.toSet ++ dropped ++ layoutOf.values.flatten
    /** Physical directory key of a (possibly layout-renamed) current
      * name — identity for everything else.
      */
    def dirKeyOf(n: String): String =
      layoutOf.get(n).flatMap(_.lastOption).getOrElse(n)
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

  /** Parsed log: (baseline if recorded, entries each with its
    * post-entry schema when recorded, legacy trailing schema). The
    * CURRENT format writes `schema0` + one `schema` line per entry;
    * logs written before per-entry schemas existed carry one trailing
    * `schema` line and no timestamps — they parse with `at = 0` and
    * every per-entry schema = the final one (time travel on such a
    * lake degrades to the old current-schema behavior, never errors).
    */
  private def parseLog(txt: String):
      (Option[StructType], Seq[(Evo, Option[StructType])], Option[StructType]) = {
    var baseline: Option[StructType] = None
    var trailing: Option[StructType] = None
    var pending: Option[Evo] = None
    val hist = Seq.newBuilder[(Evo, Option[StructType])]
    def pend(e: Evo): Unit = {
      pending.foreach(p => hist += (p -> None))
      pending = Some(e)
    }
    txt.split('\n').toSeq.map(_.trim).filter(_.nonEmpty).foreach { l =>
      l.split('\t') match {
        case Array("rename", id, from, to) => pend(Evo("rename", id.toInt, from, to))
        case Array("rename", id, from, to, at) =>
          pend(Evo("rename", id.toInt, from, to, at.toLong))
        case Array("layout", id, from, to, at) =>
          pend(Evo("layout", id.toInt, from, to, at.toLong))
        case Array("promote", id, name, _, _) =>
          pend(Evo("promote", id.toInt, name, name))
        case Array("promote", id, name, _, _, at) =>
          pend(Evo("promote", id.toInt, name, name, at.toLong))
        case Array("drop", id, name) => pend(Evo("drop", id.toInt, name, name))
        case Array("drop", id, name, at) =>
          pend(Evo("drop", id.toInt, name, name, at.toLong))
        case Array("add", name, at) => pend(Evo("add", -1, name, name, at.toLong))
        case Array("schema0", ddl) => baseline = Some(StructType.fromDDL(ddl))
        case Array("schema", ddl) =>
          val s = StructType.fromDDL(ddl)
          pending match {
            case Some(p) => hist += (p -> Some(s)); pending = None
            case None => trailing = Some(s)
          }
        case _ => sys.error(s"malformed _schema_log line: '$l'")
      }
    }
    pending.foreach(p => hist += (p -> None))
    (baseline, hist.result(), trailing)
  }

  private def renderEntry(e: Evo): String = e.op match {
    case "rename" => s"rename\t${e.id}\t${e.from}\t${e.to}\t${e.at}"
    case "layout" => s"layout\t${e.id}\t${e.from}\t${e.to}\t${e.at}"
    // promote entries re-render without the original types (the stored
    // schema carries the final type; the entry only marks that the
    // column's physical types vary across files)
    case "promote" => s"promote\t${e.id}\t${e.from}\t-\t-\t${e.at}"
    case "drop" => s"drop\t${e.id}\t${e.from}\t${e.at}"
    case "add" => s"add\t${e.from}\t${e.at}"
    case other => sys.error(s"unknown evolution op '$other'")
  }

  private def render(baseline: StructType,
                     hist: Seq[(Evo, StructType)]): String =
    (s"schema0\t${baseline.toDDL}" +: hist.flatMap { case (e, s) =>
      Seq(renderEntry(e), s"schema\t${s.toDDL}")
    }).mkString("\n")

  /** alias chains / final-name map / retired names / layout chains
    * from an entry sequence: renames fold into chains; promotes don't
    * alias (same physical name, narrower physical type — widening
    * handles it); drops retire the name AND its whole alias chain;
    * adds are pure schema growth; LAYOUT renames fold into their own
    * chains (the read side treats them as a plain column alias of the
    * directory key, never a per-file coalesce — that would kill
    * partition pruning) while still participating in `finals`.
    */
  private def resolveNames(entries: Seq[Evo]):
      (Map[String, Seq[String]], Map[String, String], Set[String],
        Map[String, Seq[String]]) = {
    var aliases = Map.empty[String, Seq[String]]
    var finals = Map.empty[String, String]
    var dropped = Set.empty[String]
    var layouts = Map.empty[String, Seq[String]]
    entries.foreach {
      case Evo("rename", _, from, to, _) =>
        val chain = from +: aliases.getOrElse(from, Seq.empty)
        aliases = (aliases - from) + (to -> chain)
        finals = finals.map { case (k, v) => k -> (if (v == from) to else v) } +
          (from -> to)
      case Evo("layout", _, from, to, _) =>
        val chain = from +: layouts.getOrElse(from, Seq.empty)
        layouts = (layouts - from) + (to -> chain)
        finals = finals.map { case (k, v) => k -> (if (v == from) to else v) } +
          (from -> to)
      case Evo("drop", _, name, _, _) =>
        dropped ++= (name +: aliases.getOrElse(name, Seq.empty)).toSet
        aliases -= name
        finals = finals.filterNot(_._2 == name)
      case _ => ()
    }
    (aliases, finals, dropped, layouts)
  }

  // one parse per (root, log version) — a version's content is
  // immutable (write-then-rename into a FRESH version), so the memo
  // never serves stale state; bounded so a long test session's many
  // throwaway roots can't grow it unboundedly
  private val stateMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), EvoState]()

  /** The CURRENT evolution state, or None for a never-evolved lake
    * (the zero-cost common case: one fs.exists).
    */
  private[graft] def state(spark: SparkSession, root: String): Option[EvoState] = {
    val (v, p) = schemaLogCurrent(spark, root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    if (stateMemo.size > 512) stateMemo.clear()
    Some(stateMemo.computeIfAbsent((root, v), { _ =>
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val (baseline0, hist0, trailing) = parseLog(txt)
      val stored = hist0.reverseIterator.flatMap(_._2).nextOption()
        .orElse(trailing)
        .getOrElse(sys.error("schema log carries no stored schema"))
      // legacy logs lack per-entry schemas/baseline: fill with the
      // final schema (current-schema behavior, the old contract)
      val hist = hist0.map { case (e, s) => e -> s.getOrElse(stored) }
      val baseline = baseline0.getOrElse(stored)
      val (aliases, finals, dropped, layouts) = resolveNames(hist.map(_._1))
      EvoState(v, hist.map(_._1), stored, aliases, finals, dropped,
        baseline, hist, legacy = baseline0.isEmpty, layoutOf = layouts)
    }))
  }

  /** The evolution state AS OF an instant — the schema a time-travel
    * read resolves under (Iceberg's snapshot-schema semantics over
    * the native lake): only entries committed at-or-before `asOf`
    * apply, so a pre-drop anchor still surfaces the column and a
    * pre-rename anchor the old name. `asOf = None` = current state.
    * Legacy entries without timestamps (`at = 0`) are always
    * in-window — the documented pre-upgrade behavior.
    */
  private[graft] def stateAt(spark: SparkSession, root: String,
                             asOf: Option[java.sql.Timestamp]): Option[EvoState] =
    state(spark, root).map { full =>
      asOf match {
        case None => full
        case Some(ts) =>
          // PREFIX cut, not a filter: entry stamps are forced monotone
          // at append time ([[nextAt]]), and a prefix can never keep a
          // later entry's post-schema while dropping the entry itself
          val hist = full.history.takeWhile(_._1.at <= ts.getTime)
          if (hist.length == full.history.length) full
          else {
            val (aliases, finals, dropped, layouts) = resolveNames(hist.map(_._1))
            full.copy(entries = hist.map(_._1),
              stored = hist.lastOption.map(_._2).getOrElse(full.baseline),
              aliasesOf = aliases, finalOf = finals, dropped = dropped,
              history = hist, layoutOf = layouts)
          }
      }
    }

  /** Commit `content` as version `baseVersion + 1`. `baseVersion` is
    * the version the caller's content was DERIVED FROM — never
    * re-read here: a writer that planned against v but commits after
    * another landed v+1 must fail loudly, not claim v+2 with content
    * missing the v+1 entry (and then delete the winner's file).
    */
  private def writeLog(spark: SparkSession, root: String,
                       content: String, baseVersion: Int): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(s"$root/_schema_log_v${baseVersion + 1}")
    // uuid'd tmp: two concurrent evolvers each stage their own file —
    // neither can clobber the other's staged bytes
    val tmp = new Path(s"$root/_schema_log_tmp_${
      java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    // the version CLAIM is a no-overwrite create (atomic where the FS
    // gives one; far narrower than exists-then-rename everywhere):
    // POSIX rename(2) silently REPLACES an existing target, so on a
    // local FS two racers' exists-checks could both pass and the
    // second rename would swallow the first writer's committed log —
    // exactly the lost-evolution the loud-loser contract forbids. A
    // crashed writer's stale claim blocks later evolutions LOUDLY
    // (message says what to check), never silently.
    val claim = new Path(s"$root/_schema_log_claim_v${baseVersion + 1}")
    // the claim carries a WRITER-UNIQUE token through the shared
    // primitive ([[ClaimFile]]): ATOMIC create where the FS provides
    // it (O_EXCL locally — Hadoop's no-overwrite create is
    // exists-then-create there; server-side on HDFS), token re-read
    // as the last line of defense on object stores without
    // conditional create, where the window is narrowed, not closed
    val token = java.util.UUID.randomUUID().toString
    def tryClaim(): Boolean = ClaimFile.tryClaim(fs, claim, token)
    // CRASHED-WRITER JANITOR (vacuum's grace pattern): a claim older
    // than the grace whose TARGET never landed is crash residue — its
    // writer would have either committed (target exists → genuine
    // conflict) or released. Retirement goes through the SHARED
    // rename-gate ([[LogSync.retireStaleClaim]]): a bare
    // delete-then-reclaim let two janitors that both observed the
    // stale claim interleave so the slower one deleted the faster
    // one's fresh claim — the double-claim the gate closes for the
    // manifest swaps and the leases; the schema log claims the same
    // way. A FRESH claim still fails loudly (the loud-loser contract).
    val claimed = tryClaim() || {
      val cutoff = System.currentTimeMillis() -
        spark.conf.getOption("graft.lake.claimGraceMs")
          .map(_.toLong).getOrElse(15L * 60 * 1000)
      val stale =
        try fs.exists(claim) && !fs.exists(target) &&
          ClaimFile.livenessMs(fs, claim) < cutoff
        catch { case _: java.io.IOException => false }
      stale && LogSync.retireStaleClaim(fs, claim, cutoff) && tryClaim()
    }
    if (!claimed) {
      fs.delete(tmp, false)
      sys.error(s"schema-log swap conflict under $root: version " +
        s"${baseVersion + 1} is claimed — another writer won; re-plan (a " +
        s"CRASHED writer leaves $claim behind: it is auto-reclaimed after " +
        "graft.lake.claimGraceMs of inactivity, or verify " +
        s"${target.getName} is absent, remove the claim, retry)")
    }
    try {
      // base-version verification INSIDE the claim: a writer stalled
      // since its planning read could otherwise re-claim a version
      // whose slot was already used AND cleaned up (claim released by
      // its committer, the log file deleted by the NEXT version's
      // cleanup) and commit stale content as an invisible orphan while
      // reporting success. With the claim held, any racer planning now
      // reads this same current version and targets OUR claimed slot —
      // blocked until we release — so current-version == base here is
      // stable through the rename below.
      val (curV, _) = schemaLogCurrent(spark, root)
      if (curV != baseVersion) {
        fs.delete(tmp, false)
        sys.error(s"schema-log swap conflict under $root: planned against " +
          s"version $baseVersion but $curV is current — another writer " +
          "won; re-plan")
      }
      if (fs.exists(target) || !fs.rename(tmp, target)) {
        fs.delete(tmp, false)
        sys.error(s"schema-log swap conflict under $root: version " +
          s"${baseVersion + 1} already exists or the rename failed — " +
          "another writer won; re-plan")
      }
    // token-checked release (not a bare delete): it never removes a
    // reclaimer's live claim after an extreme stall, and it sweeps the
    // claim's liveness beats with it
    } finally ClaimFile.release(fs, claim, token)
    val old = new Path(s"$root/_schema_log_v$baseVersion")
    if (fs.exists(old)) { fs.delete(old, false); () }
  }

  /** Append one evolution entry (with its post-entry schema) to the
    * log — the single commit point of every ALTER. `baselineIfFirst`
    * is the pre-evolution logical schema recorded as `schema0` when
    * this is the lake's first evolution.
    */
  /** Commit instant for a new entry: wall clock, forced STRICTLY
    * ABOVE the previous entry (clock skew between writers must not
    * produce a non-monotone history — [[stateAt]] cuts a prefix, and
    * an out-of-order stamp would let an as-of anchor keep an entry's
    * post-schema while dropping the entry itself).
    */
  private def nextAt(st: Option[EvoState]): Long = {
    val prev = st.flatMap(_.history.lastOption).map(_._1.at).getOrElse(0L)
    math.max(System.currentTimeMillis(), prev + 1)
  }

  private def appendEntry(spark: SparkSession, root: String,
                          st: Option[EvoState], baselineIfFirst: StructType,
                          e: Evo, after: StructType): Unit = {
    val base = st.map(_.baseline).getOrElse(baselineIfFirst)
    val hist = st.map(_.history).getOrElse(Seq.empty) :+ (e -> after)
    writeLog(spark, root, render(base, hist), st.map(_.version).getOrElse(0))
  }

  /** Record columns a sync round's NEW FILES added (footer fields not
    * in the stored schema and not retired) into the schema log — the
    * add-column half of evolution, automatic because [[LogSync.sync]]
    * already touches the new files. Recording at REGISTRATION time is
    * what makes divergent adds safe: two writers adding DIFFERENT
    * columns in separate files both land in the log, where the old
    * newest-footer probe would silently surface only the newer file's
    * column. No-op on never-evolved lakes (their union semantics come
    * from [[LogSync.tableMerged]]) and on rounds with no new columns.
    */
  private[graft] def recordAdds(spark: SparkSession, root: String,
                                paths: Seq[String]): Unit = {
    if (paths.isEmpty) return
    state(spark, root).foreach { st =>
      // one distributed footer-merge job over THIS ROUND's files. A
      // mixed narrow/wide round (a lagging writer still emitting the
      // pre-promotion type) fails Spark's merge — ONLY that failure
      // falls back to a per-file footer walk, bounded by the round's
      // arrivals (already a driver-resident list), recording each name
      // at the WIDEST spec-legal type seen (first-seen would persist
      // `int` for a column whose other files carry `long`, and every
      // later evolved read of those files would fail the parquet
      // conversion) and refusing loudly on a non-widening conflict.
      // Any OTHER error (transient FS failure, corrupt footer)
      // propagates and leaves the round's files UNREGISTERED (the
      // caller appends the manifest after this), so the rerun retries
      // — swallowing it would register the files with their new
      // column silently lost forever.
      def isMergeConflict(e: Throwable): Boolean =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
          .exists(t => String.valueOf(t.getMessage).toLowerCase
            .matches("(?s).*failed.*merg.*"))
      val merged: Seq[StructField] =
        try spark.read.option("mergeSchema", "true").parquet(paths: _*)
          .schema.fields.toSeq
        catch {
          case e: Throwable if isMergeConflict(e) =>
            paths.flatMap(p => spark.read.parquet(p).schema.fields.toSeq)
              .foldLeft(Seq.empty[StructField]) { (acc, f) =>
                acc.indexWhere(_.name == f.name) match {
                  case -1 => acc :+ f
                  case i =>
                    val prev = acc(i)
                    if (isWidening(prev.dataType, f.dataType)) acc.updated(i, f)
                    else if (prev.dataType == f.dataType ||
                      isWidening(f.dataType, prev.dataType)) acc
                    else sys.error(s"sync round under $root adds column " +
                      s"'${f.name}' at incompatible types " +
                      s"${prev.dataType.catalogString} vs ${f.dataType.catalogString}" +
                      " — fix the writers to agree (or to differ only by a " +
                      "legal widening: int->bigint, float->double) and re-sync")
                }
              }
        }
      val known = st.stored.fieldNames.toSet ++ st.supersededNames
      val extra = merged.filterNot(f => known.contains(f.name))
      if (extra.nonEmpty) {
        // one commit instant for the whole round's adds, strictly
        // above the previous entry (monotone history — see nextAt)
        val now = nextAt(Some(st))
        var stored = st.stored
        var hist = st.history
        extra.sortBy(_.name).foreach { f =>
          stored = StructType(stored.fields :+
            StructField(f.name, f.dataType, nullable = true))
          hist = hist :+ (Evo("add", -1, f.name, f.name, now) -> stored)
        }
        writeLog(spark, root, render(st.baseline, hist), st.version)
      }
    }
  }

  /** A LEGACY (pre-v2 log) lake recorded no adds: columns its files
    * gained after the last evolution surface via the old
    * newest-footer probe, preserved here so an IN-PLACE UPGRADE never
    * hides a column that was visible before (new-format lakes never
    * take this path — sync records their adds). The next ALTER bakes
    * this union into the upgraded log and retires the probe for that
    * lake. Known old-contract caveat, unchanged: the single-newest
    * probe can miss a divergent add — the very bug the recorded-adds
    * design fixes for new-format lakes.
    */
  private def legacyUnion(spark: SparkSession, root: String,
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

  /** The state's logical schema: stored for new-format lakes (adds
    * land there at sync time), the newest-footer union for legacy.
    */
  private def logicalOf(spark: SparkSession, root: String,
                        st: EvoState): StructType =
    if (st.legacy) legacyUnion(spark, root, st) else st.stored

  /** The current logical LOAD schema (data + partition-dir columns):
    * the state's logical when a log exists, else one mergeSchema load
    * — the pre-evolution baseline an evolution op starts from.
    */
  private def currentLogical(spark: SparkSession, root: String,
                             st: Option[EvoState]): StructType = st match {
    case Some(s) => logicalOf(spark, root, s)
    case None => spark.read.option("basePath", root)
      .option("mergeSchema", "true").parquet(root).schema
  }

  /** The EXPLICIT scan schema for an evolved lake: the state's stored
    * logical columns at their final (possibly widened) types, plus
    * every retired old name at the final column's type — parquet
    * fills null where a file lacks a name and widens where it is
    * narrow. Pure function of the state for new-format lakes (no
    * footer probe, no job); legacy pre-v2 logs pay the old
    * newest-footer probe until their next ALTER upgrades them.
    */
  /** The widest physical type the as-of name `n` (typed `t0` at the
    * anchor) ever appears at on disk: walk the entries AFTER the
    * anchor's prefix, following renames, taking each later promote's
    * post-entry type. Post-drop files never carry the name, so a drop
    * ends the walk with whatever width it reached.
    */
  private def widestAfter(full: EvoState, prefixLen: Int,
                          n: String, t0: DataType): DataType = {
    var cur = n
    var t = t0
    full.history.drop(prefixLen).foreach { case (e, after) =>
      e.op match {
        case "rename" if e.from == cur => cur = e.to
        case "promote" if e.from == cur =>
          t = after.find(_.name == cur).map(_.dataType).getOrElse(t)
        case _ => ()
      }
    }
    t
  }

  /** True when `wide` is a spec-legal widening of `narrow` (the only
    * promotions [[promoteColumn]] admits) — the pair where an up-cast
    * read and a post-filter down-cast are both value-preserving.
    */
  private[graft] def isWidening(narrow: DataType, wide: DataType): Boolean =
    (narrow, wide) match {
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }

  private[graft] def requestSchema(spark: SparkSession, root: String,
                                   st: EvoState): StructType = {
    val logical = logicalOf(spark, root, st)
    // An AS-OF state (prefix cut) may hold a column at its
    // pre-promotion NARROW type while files written after the
    // promotion physically carry the wide one; requesting the narrow
    // type over the whole-root scan makes the parquet reader throw a
    // conversion error at scan time even though the keep-set filter
    // would drop those files' rows. The request therefore carries
    // every field at the WIDEST type its name-chain ever reaches —
    // the up-cast read of a narrow file is always legal — and
    // [[project]] casts the kept rows back to the anchor's type
    // (value-preserving: every kept row predates the promotion).
    val full = state(spark, root)
    val prefixLen = st.history.length
    def finalType(n: String, t: DataType): DataType = full match {
      case Some(f) if !f.legacy && f.history.length > prefixLen =>
        widestAfter(f, prefixLen, n, t)
      case _ => t
    }
    val widened = StructType(logical.fields.map(f =>
      f.copy(dataType = finalType(f.name, f.dataType))))
    // LAYOUT-renamed columns scan under their physical DIRECTORY key
    // (partition discovery binds the dir name; [[project]] renames it
    // — a plain alias the optimizer pushes filters through, so a
    // predicate on the current name still reaches PartitionFilters; a
    // coalesce fold here would kill partition pruning). They never
    // promote, so the widening above was a no-op for them.
    val withDirKeys = StructType(widened.fields.map { f =>
      st.layoutOf.get(f.name) match {
        case Some(chain) => StructField(chain.last, f.dataType, f.nullable)
        case None => f
      }
    })
    val aliasFields = st.aliasesOf.toSeq.sortBy(_._1).flatMap { case (fin, olds) =>
      val t = widened.find(_.name == fin).map(_.dataType)
        .getOrElse(sys.error(s"renamed column '$fin' missing from logical schema"))
      olds.map(o => StructField(o, t, nullable = true))
    }
    StructType(withDirKeys.fields ++ aliasFields)
  }

  /** Fold each renamed column's alias chain into its final name and
    * drop the old names. Any extra columns on `df` (`__src`, row
    * ordinals) pass through untouched; alias columns absent from `df`
    * are skipped (callers that request [[requestSchema]] always have
    * them).
    */
  private[graft] def project(df: DataFrame, st: EvoState): DataFrame = {
    // layout fold FIRST: a plain rename of the directory key to the
    // current logical name (every row carries the dir value — no
    // per-file coalesce — and filters on the new name push through
    // the alias into PartitionFilters)
    val laid = st.layoutOf.toSeq.sortBy(_._1).foldLeft(df) {
      case (acc, (fin, chain)) =>
        val dirKey = chain.last
        if (acc.columns.contains(dirKey) && !acc.columns.contains(fin))
          acc.withColumnRenamed(dirKey, fin)
        else acc
    }
    val folded = st.aliasesOf.toSeq.sortBy(_._1).foldLeft(laid) {
      case (acc, (fin, olds)) =>
        val present = olds.filter(acc.columns.contains)
        if (present.isEmpty || !acc.columns.contains(fin)) acc
        else acc.withColumn(fin, coalesce((fin +: present).map(col): _*))
          .drop(present: _*)
    }
    // inverse of [[requestSchema]]'s widening: an as-of read scanned
    // promoted columns at their FINAL wide type (the only legal
    // request over a root holding post-promotion files); the keep-set
    // already dropped those files, so every surviving value fits the
    // anchor's narrow type and the down-cast is exact. Only the
    // spec-legal widening pairs cast — any other mismatch is not ours
    // to touch. Legacy states have no per-entry schemas (stored IS
    // final), so the fold above was already the whole job.
    if (st.legacy) folded
    else st.stored.fields.foldLeft(folded) { (acc, f) =>
      val cur = acc.schema.fields.find(_.name == f.name)
      if (cur.exists(c => isWidening(f.dataType, c.dataType)))
        acc.withColumn(f.name, col(f.name).cast(f.dataType))
      else acc
    }
  }

  /** Rename a frame's LAYOUT-RENAMED columns back to their physical
    * directory keys before a partitioned write: the directory tree
    * never rewrites under a layout rename, so rewriters (DML commits,
    * compaction) keep emitting the physical `key=value` dirs — the
    * inverse of [[project]]'s layout fold.
    */
  private[sources] def toPhysicalLayout(df: DataFrame,
                                        st: Option[EvoState]): DataFrame =
    st.map(_.layoutOf).getOrElse(Map.empty).foldLeft(df) {
      case (acc, (fin, chain)) =>
        if (acc.columns.contains(fin) && !acc.columns.contains(chain.last))
          acc.withColumnRenamed(fin, chain.last)
        else acc
    }

  /** Names a lake read must materialize from `_metadata` BEFORE
    * [[project]] runs (a projection ends `_metadata` resolution).
    */
  private[graft] def hasLog(spark: SparkSession, root: String): Boolean =
    state(spark, root).nonEmpty

  // the zone-map stat axes the manifest records (min_ts/max_ts/
  // null_ts come from the field originally named `timestamp`,
  // min_svc/max_svc from `service_name`) — the BINDING is the field,
  // so these resolve the field's CURRENT name through the schema log
  private val TimeAxisOrigin = "timestamp"
  private val SvcAxisOrigin = "service_name"

  // The Of-variants take an ALREADY-RESOLVED state so an operation
  // that needs several axis facts (statsFor needs all four) resolves
  // the state ONCE — each state() pays a directory LIST on the log
  // version, the expensive control-plane op on an object store.
  private[graft] def timeAxisOf(st: Option[EvoState]): String =
    st.map(_.currentName(TimeAxisOrigin)).getOrElse(TimeAxisOrigin)

  private[graft] def svcAxisOf(st: Option[EvoState]): String =
    st.map(_.currentName(SvcAxisOrigin)).getOrElse(SvcAxisOrigin)

  /** Every physical name the time axis has carried (current first) —
    * what a stats probe coalesces over, since a sync round can mix
    * files written before and after a rename.
    */
  // every name the axis has had, newest first — footer-alias chains
  // AND layout chains (a layout-renamed axis keeps its physical name
  // in the directory key, which is where new files' stat probes see it)
  private[graft] def timeAxisNamesOf(st: Option[EvoState]): Seq[String] = {
    val cur = timeAxisOf(st)
    cur +: st.toSeq.flatMap(s => s.aliasesOf.getOrElse(cur, Seq.empty) ++
      s.layoutOf.getOrElse(cur, Seq.empty))
  }

  private[graft] def svcAxisNamesOf(st: Option[EvoState]): Seq[String] = {
    val cur = svcAxisOf(st)
    cur +: st.toSeq.flatMap(s => s.aliasesOf.getOrElse(cur, Seq.empty) ++
      s.layoutOf.getOrElse(cur, Seq.empty))
  }

  /** Current name of the manifest's TIME stat axis (the field
    * originally named `timestamp`): what [[LogSync.statsFor]] computes
    * min_ts/max_ts from and what range readers/retention filter on.
    * One state resolution; callers needing several axis facts should
    * resolve [[state]] once and use the Of-variants.
    */
  private[graft] def timeAxis(spark: SparkSession, root: String): String =
    timeAxisOf(state(spark, root))

  /** Current name of the SERVICE stat axis (originally
    * `service_name`) — min_svc/max_svc's source field.
    */
  private[graft] def svcAxis(spark: SparkSession, root: String): String =
    svcAxisOf(state(spark, root))

  private def commonGuards(spark: SparkSession, root: String,
                           name: String, st: Option[EvoState],
                           forDrop: Boolean = false,
                           forRename: Boolean = false): Unit = {
    require(LogSync.hasManifest(spark, root),
      s"no manifest under $root — run sync first")
    // RENAME of a layout column is supported (renameColumn routes it
    // through a layout-alias entry; the directory tree never
    // rewrites); promote and drop remain refused — the directory
    // parsing binds the key's type, and a dropped dir key has no
    // spec-correct read shape short of a physical re-layout
    if (!forRename) {
      val layout = LogCompact.inferLayout(spark, root)
      require(!layout.contains(name) && !st.exists(_.layoutOf.contains(name)),
        s"cannot promote/drop partition-layout column '$name': the " +
          "directory structure binds it; rename IS supported " +
          "(metadata-only layout alias); re-layout physically via " +
          "LogCompact.compact for anything else")
    }
    // stat axes RENAME freely (the manifest's recorded min/max are the
    // FIELD's values — a rename moves the name, not the binding, and
    // every axis consumer resolves through timeAxis/svcAxis) but must
    // not DROP: retention planning and zone-map pruning would lose
    // their axis while the manifest still carries its stats
    if (forDrop)
      require(name != timeAxisOf(st) && name != svcAxisOf(st),
        s"cannot drop '$name': it is a zone-map stat axis (retention and " +
          "pruning plan on it); rename is supported, drop is not")
    val activeEq = LogSync.deleteEntries(spark, root, capped = false)
      .filter(e => e.isEq && e.eqCols.contains(name))
    require(activeEq.isEmpty,
      s"cannot evolve '$name': ${activeEq.length} active equality-delete " +
        "file(s) bind it by name/type — run LakeDml.convertEqDeletes (or " +
        "compact) first, then evolve")
  }

  /** METADATA-ONLY column rename: `from` becomes `to`, keeping its
    * field id; no data file is touched. Old files keep the old
    * physical name forever — every read path coalesces it in, and
    * exports alias it via name-mapping. Commit order is LOG-FIRST
    * (see the class doc's INTEROP note).
    */
  def renameColumn(spark: SparkSession, root: String,
                   from: String, to: String): Unit = {
    val st = state(spark, root)
    commonGuards(spark, root, from, st, forRename = true)
    val logical = currentLogical(spark, root, st)
    require(logical.fieldNames.contains(from), s"no column '$from' to rename")
    require(!logical.fieldNames.contains(to),
      s"rename target '$to' already exists")
    require(st.forall(s => !s.supersededNames.contains(to) &&
        !s.aliasesOf.contains(to)),
      s"rename target '$to' is a retired name — reserved forever (old " +
        "files still carry it physically)")
    // a rename of a PARTITION-LAYOUT column (the directory key, or a
    // prior layout-rename's current name) commits a `layout` entry:
    // metadata-only like any rename, but the read side resolves it as
    // a plain alias of the dir key — never a per-file coalesce, so
    // partition pruning survives. No field-id pinning: layout ids
    // live in the export's partition-field namespace — the export
    // binds the CURRENT logical name at the dir key's unchanged
    // fixed-base id (an Iceberg-legal column rename), restating once
    // when prior manifests still bind a retired name.
    val isLayout = LogCompact.inferLayout(spark, root).contains(from) ||
      st.exists(_.layoutOf.contains(from))
    if (isLayout) {
      val newStored = StructType(logical.fields.map(f =>
        if (f.name == from) StructField(to, f.dataType, f.nullable) else f))
      appendEntry(spark, root, st, logical,
        Evo("layout", -1, from, to, nextAt(st)), newStored)
      return
    }
    // the id is pinned BEFORE the log entry lands: the sidecar refresh
    // below reads the pre-rename state
    val fid = IcebergExport.exportFieldIds(spark, root)
    require(fid.contains(from), s"column '$from' resolves no field id")
    val id = fid(from)
    val t = logical(from).dataType
    val newStored = StructType(logical.fields.map(f =>
      if (f.name == from) StructField(to, f.dataType, f.nullable) else f))
    appendEntry(spark, root, st, logical,
      Evo("rename", id, from, to, nextAt(st)), newStored)
    // sidecar binding AFTER the log: a crash here self-heals — the
    // export re-derives to→id from the rename entry
    IcebergExport.recordEvolvedField(spark, root, to, id, t.catalogString)
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
    val st = state(spark, root)
    commonGuards(spark, root, name, st)
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
    val newStored = StructType(logical.fields.map(f =>
      if (f.name == name) StructField(name, toType, f.nullable) else f))
    appendEntry(spark, root, st, logical,
      Evo("promote", id, name, name, nextAt(st)), newStored)
    IcebergExport.recordEvolvedField(spark, root, name, id, toType.catalogString)
  }

  /** METADATA-ONLY column drop: the column vanishes from every
    * CURRENT read; a time-travel read anchored BEFORE the drop still
    * surfaces it ([[stateAt]] — snapshot-schema semantics); no data
    * file is touched, old files keep the bytes until natural rewrite.
    * The name and its whole rename chain stay RESERVED forever: a
    * later file re-adding the name is IGNORED by the read side (old
    * files' stale values would otherwise resurrect through the
    * union), and rename targets may not reuse it. Refused while ANY
    * delete-registry row — active or tombstoned-but-unvacuumed —
    * binds the column (a historic equality delete must keep resolving
    * for time travel inside the vacuum horizon; drop after vacuum),
    * and refused outright for the zone-map stat axes.
    */
  def dropColumn(spark: SparkSession, root: String, name: String): Unit = {
    val st = state(spark, root)
    commonGuards(spark, root, name, st, forDrop = true)
    val logical = currentLogical(spark, root, st)
    require(logical.fieldNames.contains(name), s"no column '$name' to drop")
    // a maintained ROLLUP aggregating by this column would not fail
    // here — it would fail at its NEXT refresh/read, long after the
    // drop committed. Refuse now, with the way out (renames are fine:
    // refresh auto-migrates them).
    require(!Rollup.dimensionBound(spark, root, name),
      s"cannot drop '$name': the maintained rollup under $root/_rollup " +
        "aggregates by it — delete the rollup dir (and rebuild without " +
        "the dimension) first; renames auto-migrate, drops do not")
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
    appendEntry(spark, root, st, logical,
      Evo("drop", fid(name), name, name, nextAt(st)), newStored)
  }
}
