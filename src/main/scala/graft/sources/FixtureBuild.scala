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
  def once(cache: java.util.concurrent.ConcurrentHashMap[String, String],
           key: String, prefix: String, spark: SparkSession)
          (build: String => Unit): String =
    cache.computeIfAbsent(key, _ => {
      val root = s"/tmp/${prefix}_${Integer.toHexString(key.hashCode & 0x7fffffff)}"
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
