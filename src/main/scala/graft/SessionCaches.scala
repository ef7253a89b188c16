package graft

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Lifecycle for the build-once session caches (near-dup edge set, OTLP
  * parses, PQ codebooks, bucketed-table markers, …): each cache entry
  * registers a cleanup here, and the cleanups run when the owning
  * session's application ends — so a long-lived JVM cycling through
  * many sessions/dirs neither accumulates persisted executor storage
  * indefinitely nor pins dead SparkSession references in static maps.
  * This makes the documented immutable-corpus-PER-SESSION contract an
  * actual lifecycle instead of a leak.
  *
  * One listener per session (installed on first registration); cleanup
  * failures are swallowed — at application end the storage is going
  * away anyway, the point is dropping the static references.
  */
object SessionCaches {

  private val cleanups =
    new ConcurrentHashMap[SparkSession, ConcurrentLinkedQueue[() => Unit]]()

  /** Run `cleanup` when `spark`'s application ends. */
  def register(spark: SparkSession)(cleanup: () => Unit): Unit =
    cleanups.computeIfAbsent(spark, { s =>
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          val q = cleanups.remove(s)
          if (q != null) q.forEach { f => try f() catch { case _: Throwable => () } }
        }
      })
      new ConcurrentLinkedQueue[() => Unit]()
    }).add(cleanup)

  /** Number of sessions currently holding registered cleanups (spec
    * observable).
    */
  private[graft] def trackedSessions: Int = cleanups.size

  /** The build-once PERSISTED-FRAME memo every session cache shares
    * (OTLP parses, proto round-trip frames, …): compute + persist on
    * first use per (session, key), register the unpersist cleanup,
    * serve the cached frame afterwards — one copy of the pattern
    * instead of a hand-rolled block per cache (the persisted twin of
    * [[graft.sources.FixtureBuild.once]]).
    */
  def memoPersist[K](cache: ConcurrentHashMap[(SparkSession, K),
                       org.apache.spark.sql.DataFrame],
                     spark: SparkSession, k: K)
                    (build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    cache.computeIfAbsent((spark, k), { key =>
      register(spark) { () =>
        Option(cache.remove(key)).foreach(_.unpersist(false))
      }
      build.persist()
    })
}
