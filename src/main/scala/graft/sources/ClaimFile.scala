package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The shared no-overwrite CLAIM primitive behind every single-writer
  * gate in the lake machinery (the schema-log version claim, the sync
  * lease): create a file carrying a writer-unique token, and hold the
  * claim only when the surviving content is YOUR token.
  *
  * The create must be ATOMIC where the filesystem can provide it.
  * Hadoop's RawLocalFileSystem implements `create(overwrite = false)`
  * as exists-then-create — two racers can BOTH pass the exists check,
  * then interleave create/write/close so that each re-reads the file
  * at a different instant and each sees its own token: a double
  * claim, which for the sync lease means two concurrent manifest
  * APPEND jobs sharing one `_temporary` dir (one commit deletes it
  * under the other). Local paths therefore claim through NIO's
  * `Files.createFile` — O_EXCL, genuinely atomic on POSIX — and HDFS
  * through `create(overwrite = false)`, atomic server-side. The
  * token re-read stays as the last line of defense for object stores
  * without conditional create (plain S3A), where the window is
  * narrowed, not closed — documented at both call sites.
  */
private[graft] object ClaimFile {

  /** Attempt to claim `claim` with `token`; true only when this
    * caller holds it afterwards. Never throws on a lost race — any
    * IO failure (including exists) is `false`; the caller decides
    * between loud refusal and stale-claim reclaim.
    */
  def tryClaim(fs: FileSystem, claim: Path, token: String): Boolean =
    try {
      val scheme = Option(claim.toUri.getScheme).getOrElse(fs.getScheme)
      if (scheme == "file") {
        val p = java.nio.file.Paths.get(claim.toUri.getPath)
        java.nio.file.Files.createFile(p) // atomic O_EXCL: loser throws
        java.nio.file.Files.write(p, token.getBytes("UTF-8"))
      } else {
        val o = fs.create(claim, false)
        try o.write(token.getBytes("UTF-8")) finally o.close()
      }
      val in = fs.open(claim)
      val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      got == token
    } catch { case _: java.io.IOException => false }
}
