package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The shared no-overwrite CLAIM primitive behind every single-writer
  * gate in the lake machinery (the schema-log version claim, the sync
  * lease, the DML lease): create a file carrying a writer-unique
  * token, and hold the claim only when the surviving content is YOUR
  * token.
  *
  * The create must be ATOMIC where the filesystem can provide it, and
  * WHICH mechanism provides it is a per-scheme decision — the
  * conditional-create STRATEGY. Claim semantics by scheme:
  *
  * | scheme      | create mechanism                  | atomic?             | owned-failure cleanup |
  * |-------------|-----------------------------------|---------------------|-----------------------|
  * | `file`      | NIO `Files.createFile` (O_EXCL)   | yes (POSIX)         | yes — create success proves ownership |
  * | `hdfs`      | `create(overwrite=false)`         | yes (server-side)   | yes — stream acquisition proves ownership |
  * | plain `s3a` | `create(overwrite=false)`         | NO — exists-then-create; window NARROWED by the token re-read, not closed | no — ownership unprovable, a failure-path delete could retire ANOTHER racer's claim |
  * | stores with conditional PUT (S3 If-None-Match) | [[register]] a strategy | per strategy | per strategy |
  * | `cond` (test-only simulated conditional-PUT store, CondStoreSpec) | registered strategy over `create(overwrite=false)` | yes — the FS's non-overwrite create IS the conditional PUT, with injectable post-create latency | yes — provesOwnership=true, TESTED: N-racer claim rounds + the concurrent-deleteEq DML race both hold on the scheme |
  *
  * Why the scheme matters: Hadoop's RawLocalFileSystem implements
  * `create(overwrite = false)` as exists-then-create — two racers can
  * BOTH pass the exists check, then interleave create/write/close so
  * that each re-reads the file at a different instant and each sees
  * its own token: a double claim, which for the sync lease means two
  * concurrent manifest APPEND jobs sharing one `_temporary` dir (one
  * commit deletes it under the other). Local paths therefore claim
  * through O_EXCL; HDFS through its server-side atomic create. For
  * object stores without conditional create the token re-read stays
  * as the last line of defense — documented at the call sites. Stores
  * that DO support conditional create (S3 now has If-None-Match PUT)
  * can close the window by [[register]]ing a strategy for their
  * scheme. No real object-store connector exists in this sandbox
  * (zero egress, no s3a jars), but the STRATEGY PATH itself is
  * certified against a simulated conditional-create store:
  * CondStoreSpec's `cond://` FileSystem honors If-None-Match
  * semantics with injectable create latency, and both the N-racer
  * claim rounds and the two-thread DML-lease race pass through a
  * registered ownership-proving strategy on it — what remains
  * untested is the concrete S3 binding, not the seam's semantics.
  */
private[graft] object ClaimFile {

  // ---- liveness beats -----------------------------------------------------
  //
  // Staleness used to be judged by claim-file MTIME alone, which binds
  // the whole janitor/heartbeat mechanism to an mtime-FAITHFUL store:
  // on copy-rename object stores a rename refreshes mtime (a crashed
  // claim never ages) and `setTimes` may be a no-op (a live holder's
  // heartbeat is inert, so it is reclaimed mid-commit). The liveness
  // signal therefore ALSO lives in content the holder writes:
  // `<claim>.hb_<n>` sidecar files carrying `<token>\n<wallclockMs>`,
  // written once at claim time (beat 0, inside [[tryClaim]]) and then
  // by [[LogSync]]'s lease heartbeat every quarter grace window. A
  // claim's liveness instant is max(mtime, newest matching-token
  // beat) — on faithful stores the mtime path keeps working unchanged,
  // on mtime-unfaithful ones the beats carry the contract alone
  // (certified against the frozen-mtime `cond://` store variant in
  // CondStoreSpec). Beats are cleaned with their claim (release /
  // stale retire); each beat write drops the beat two generations
  // back, so a live holder keeps current+previous on disk — a reader
  // listing between a delete and the new beat's visibility still
  // finds one.

  private def hbPrefix(claimName: String) = claimName + ".hb_"

  /** Write liveness beat `n` for `claim` (held under `token`); prune
    * the beat two generations back. Best-effort: a transient write
    * failure is skipped (the next beat retries), exactly like the
    * mtime heartbeat's setTimes.
    */
  def writeBeat(fs: FileSystem, claim: Path, token: String, n: Long): Unit =
    try {
      val f = new Path(claim.getParent, hbPrefix(claim.getName) + n)
      val out = fs.create(f, true)
      try out.write(s"$token\n${System.currentTimeMillis()}".getBytes("UTF-8"))
      finally out.close()
      if (n >= 2) {
        try fs.delete(new Path(claim.getParent, hbPrefix(claim.getName) + (n - 2)), false)
        catch { case _: java.io.IOException => () }
      }
      ()
    } catch { case _: java.io.IOException => () }

  /** Delete every beat sidecar of `claimName` whose token matches —
    * the companion of a released or retired claim. Only MATCHING
    * beats: a new holder may already have claimed the freed path and
    * written its own beat 0, which a blanket sweep would destroy
    * (reverting that holder to mtime-only liveness — the frozen-mtime
    * early-retire hazard the beats exist to close).
    */
  def cleanupBeats(fs: FileSystem, dir: Path, claimName: String,
                   token: String): Unit =
    try fs.listStatus(dir).iterator
      .filter(s => s.isFile && s.getPath.getName.startsWith(hbPrefix(claimName)))
      .foreach { s =>
        val matches =
          try {
            val in = fs.open(s.getPath)
            val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
            txt.split('\n').headOption.contains(token)
          } catch { case _: java.io.IOException => false }
        if (matches) {
          try fs.delete(s.getPath, false) catch { case _: java.io.IOException => () }
        }
      }
    catch { case _: java.io.IOException => () }

  /** The newest liveness instant of `claim`: max of its mtime and the
    * newest beat sidecar carrying its current token. `hbName` names
    * the beat family when the claim file itself has been RENAMED ASIDE
    * (the stale-retire gate) — beats stay under the original name.
    * Conservative on failure: a claim whose content cannot be read
    * right now is judged FRESH (Long.MaxValue) — a torn read means an
    * active writer or a transient store error, and a janitor must
    * never retire on either.
    */
  def livenessMs(fs: FileSystem, claim: Path,
                 hbName: Option[String] = None): Long = {
    val mtime =
      try fs.getFileStatus(claim).getModificationTime
      catch { case _: java.io.IOException => return Long.MaxValue }
    val token =
      try {
        val in = fs.open(claim)
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      } catch { case _: java.io.IOException => return Long.MaxValue }
    val prefix = hbPrefix(hbName.getOrElse(claim.getName))
    val beats =
      try fs.listStatus(claim.getParent).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith(prefix))
      catch { case _: java.io.IOException => Seq.empty }
    beats.foldLeft(mtime) { (acc, s) =>
      val beatMs =
        try {
          val in = fs.open(s.getPath)
          val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
          val lines = txt.split('\n')
          if (lines.length >= 2 && lines(0) == token)
            scala.util.Try(lines(1).trim.toLong).getOrElse(0L)
          else 0L
        } catch { case _: java.io.IOException => 0L }
      math.max(acc, beatMs)
    }
  }

  /** A per-scheme conditional create: write `token` to `claim` iff the
    * file does not exist; return true only when THIS caller created
    * and fully wrote it. A strategy that can prove ownership (atomic
    * create) must remove the claim on a failed write before returning
    * false — a half-written husk it provably owns would otherwise
    * block every claimer for the full `claimGraceMs` window with a
    * misleading "another writer won". A strategy that cannot prove
    * ownership must NOT delete on failure (it might retire another
    * racer's live claim) — it narrows, the token re-read decides.
    */
  type Strategy = (FileSystem, Path, Array[Byte]) => Boolean

  private val strategies =
    new java.util.concurrent.ConcurrentHashMap[String, (Strategy, Boolean)]()

  /** Plug a conditional-create strategy for a scheme (e.g. an
    * If-None-Match PUT binding for a versioned object store). Wins
    * over the built-in default for that scheme. `provesOwnership`
    * declares whether the strategy's create is genuinely atomic
    * (conditional PUT): only then may the verify-failure path delete
    * the claim — a narrowing-only strategy (exists-then-create) must
    * pass false, or a failed verify would retire ANOTHER racer's
    * live claim, the exact double-claim the primitive exists to
    * prevent.
    */
  def register(scheme: String, s: Strategy,
               provesOwnership: Boolean = true): Unit = {
    strategies.put(scheme, (s, provesOwnership)); ()
  }

  /** Remove a registered strategy — the scheme falls back to its
    * built-in default (spec hygiene; production strategies are
    * process-lifetime).
    */
  private[graft] def unregister(scheme: String): Unit = { strategies.remove(scheme); () }

  /** O_EXCL via NIO — genuinely atomic on POSIX. Create success proves
    * ownership, so any later failure deletes the claim before
    * reporting false (the failure path must not strand a husk).
    */
  private val localStrategy: Strategy = (_, claim, bytes) => {
    val p = java.nio.file.Paths.get(claim.toUri.getPath)
    val created =
      try { java.nio.file.Files.createFile(p); true }
      catch { case _: java.io.IOException => false }
    created && {
      try { java.nio.file.Files.write(p, bytes); true }
      catch { case _: java.io.IOException =>
        try java.nio.file.Files.deleteIfExists(p)
        catch { case _: java.io.IOException => false }
        false
      }
    }
  }

  /** `create(overwrite = false)` with owned-failure cleanup — correct
    * where the create is atomic server-side (HDFS): acquiring the
    * stream proves ownership.
    */
  private val ownedCreateStrategy: Strategy = (fs, claim, bytes) => {
    val out =
      try Some(fs.create(claim, false))
      catch { case _: java.io.IOException => None }
    out.exists { o =>
      try { o.write(bytes); o.close(); true }
      catch { case _: java.io.IOException =>
        try o.close() catch { case _: java.io.IOException => () }
        try fs.delete(claim, false) catch { case _: java.io.IOException => () }
        false
      }
    }
  }

  /** `create(overwrite = false)` WITHOUT failure cleanup — the
    * conservative default for schemes where the create may be
    * exists-then-create (plain S3A): ownership is unprovable, so a
    * failure-path delete could retire another racer's claim. The
    * token re-read downstream is the arbiter.
    */
  private val unownedCreateStrategy: Strategy = (fs, claim, bytes) => {
    try {
      val o = fs.create(claim, false)
      try o.write(bytes) finally o.close()
      true
    } catch { case _: java.io.IOException => false }
  }

  private def strategyFor(scheme: String): Strategy =
    Option(strategies.get(scheme)).map(_._1).getOrElse(scheme match {
      case "file" => localStrategy
      case "hdfs" => ownedCreateStrategy
      case _ => unownedCreateStrategy
    })

  /** Whether `scheme`'s create proves ownership — i.e. a verify
    * failure after a successful create may safely delete the claim
    * (it is provably ours). Registered strategies carry their own
    * declaration; a narrowing-only registration must not inherit the
    * delete-on-failure right.
    */
  private def ownedScheme(scheme: String): Boolean =
    Option(strategies.get(scheme)).map(_._2)
      .getOrElse(scheme == "file" || scheme == "hdfs")

  /** Release `claim` only while it still carries `token`. An
    * unconditional delete would let a holder that STALLED past the
    * grace window (and was legitimately reclaimed) delete the
    * reclaimer's live claim on its way out — handing a third writer
    * a double claim, the cascade version of the race the claim
    * prevents. A token mismatch means the claim was reclaimed; the
    * stalled holder simply leaves it alone (its own work having
    * raced the reclaimer is the documented grace-window trade).
    *
    * The delete goes through RENAME-ASIDE, not verify-then-delete:
    * a bare read-match-delete leaves a gap in which a reclaimer can
    * retire this claim and a fresh writer re-claim the path — the
    * stalled holder's delete would then land on the NEW holder's
    * live claim. The rename is the one-winner arbiter (only one
    * mover of the same source path succeeds, the same gate stale
    * reclaim uses): the token is re-verified in the renamed file and
    * only a match is deleted; a mismatch renames the file straight
    * back. The `.reclaim_` aside name keeps any crash/rename-back
    * residue inside the janitor's existing aging sweep
    * ([[LogCompact.vacuum]]). Residual (documented, not closed): if
    * the rename-back itself loses to a third claim of the freed
    * path, the aside file stays as residue and the DISPLACED holder
    * keeps running unprotected — a body mid-critical-section cannot
    * be recovered, only surfaced: its lease heartbeat counts the
    * consecutive missing reads, warns, and stops beating, degrading
    * the hold to the grace-window trade. Strictly narrower than the
    * read-delete gap this replaces, because the arbiter is now an
    * atomic rename instead of a racy read.
    */
  def release(fs: FileSystem, claim: Path, token: String): Unit =
    try {
      // cheap pre-read keeps the common reclaimed-holder no-op from
      // disturbing the live claim at all
      val in = fs.open(claim)
      val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      if (got == token) {
        val aside = new Path(claim.getParent, claim.getName +
          ".reclaim_rel" + java.util.UUID.randomUUID().toString.take(8))
        if (fs.rename(claim, aside)) {
          val in2 = fs.open(aside)
          val got2 = try new String(in2.readAllBytes(), "UTF-8") finally in2.close()
          if (got2 == token) {
            fs.delete(aside, false)
            cleanupBeats(fs, claim.getParent, claim.getName, token)
          }
          else if (fs.exists(claim)) {
            // a third claim won the freed path first — renaming back
            // would REPLACE it (POSIX/S3A rename clobbers an existing
            // target); leave the aside file as aged residue, its
            // displaced owner re-enters the lost-claim path
            ()
          } else { fs.rename(aside, claim); () }
        }
      }
    } catch { case _: java.io.IOException => () }

  /** Attempt to claim `claim` with `token`; true only when this
    * caller holds it afterwards. Never throws on a lost race — any
    * IO failure (including exists) is `false`; the caller decides
    * between loud refusal and stale-claim reclaim.
    */
  def tryClaim(fs: FileSystem, claim: Path, token: String): Boolean = {
    val scheme = Option(claim.toUri.getScheme).getOrElse(fs.getScheme)
    val created =
      try strategyFor(scheme)(fs, claim, token.getBytes("UTF-8"))
      catch { case _: java.io.IOException => false }
    created && {
      val verified =
        try {
          val in = fs.open(claim)
          val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
          got == token
        } catch { case _: java.io.IOException => false }
      // a failed VERIFY on an ownership-proving scheme still holds the
      // claim this caller created — release it rather than blocking
      // every claimer until the grace window (same rationale as the
      // strategies' owned-failure cleanup)
      if (!verified && ownedScheme(scheme)) {
        try fs.delete(claim, false) catch { case _: java.io.IOException => () }
      }
      // beat 0 the moment the claim is verifiably ours: on an
      // mtime-unfaithful store (frozen/zeroed mtimes) a beat-less fresh
      // claim would read as instantly stale to a janitor's liveness
      // check — the creation instant must live in content from the
      // first moment, not only once a lease heartbeat starts
      if (verified) writeBeat(fs, claim, token, 0L)
      verified
    }
  }
}
