package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The marker-idempotent /tmp fixture scaffold every memoized lake
  * builder shares (trace/metric ingest lakes, and the shape
  * `LakeAnalytics`' roots follow): one build per (cache, key), one
  * directory per key hash, rebuilt only when the `_built` marker is
  * absent — so a pattern fix (naming, marker semantics) lives in ONE
  * place instead of a copy per builder.
  */
object FixtureBuild {
  /** Bump when any memoized builder's output closure changes shape —
    * part of the directory key, so stale fixtures from an older build
    * rebuild instead of silently serving the old lake.
    */
  // v12: schema-log format v2 (per-entry timestamps + schemas,
  // schema0 baseline) and log-first evolution commits — evolved-lake
  // fixtures built under v11 carry legacy logs that would mask the
  // snapshot-schema semantics the round-14 queries certify
  private val BuilderVersion = "v12"

  private def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(32)
  }

  def once(cache: java.util.concurrent.ConcurrentHashMap[String, String],
           key: String, prefix: String, spark: SparkSession)
          (build: String => Unit): String =
    cache.computeIfAbsent(key, _ => {
      // full content hash (not 32-bit hashCode — collisions between sf
      // dirs would cross-serve lakes) under a per-user subdir, so a
      // foreign user's marker can't shadow ours on a shared /tmp
      val user = sys.props.getOrElse("user.name", "unknown")
      val digest = sha256Hex(s"$BuilderVersion|$prefix|$key")
      val root = s"/tmp/graft_$user/${prefix}_$digest"
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new Path(s"$root/_built")
      if (!fs.exists(marker)) {
        fs.delete(rootPath, true)
        build(root)
        fs.create(marker).close()
      }
      root
    })
}
