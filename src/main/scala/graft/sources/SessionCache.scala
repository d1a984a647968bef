package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoization for built-once artifacts (CTAS-style
  * dims, partitioned warehouse tables). Entries hang off the
  * SparkSession through a WEAK key: when a session is discarded its
  * cached plans become collectable — a plain map keyed by
  * (session, name) would pin every session's DataFrames for the JVM
  * lifetime, a leak in a long-lived service.
  */
object SessionCache {
  private val caches = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[String, DataFrame]]()

  def getOrElseUpdate(s: SparkSession, key: String)(mk: => DataFrame): DataFrame = {
    val perSession = caches.synchronized {
      val existing = caches.get(s)
      if (existing != null) existing
      else {
        val fresh = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        caches.put(s, fresh)
        fresh
      }
    }
    perSession.getOrElseUpdate(key, mk)
  }

  /** Drop every cached frame (all sessions) — profiling hook so a
    * repeated pass re-pays construction instead of hitting the cache. */
  def clear(): Unit = caches.synchronized { caches.clear() }
}
