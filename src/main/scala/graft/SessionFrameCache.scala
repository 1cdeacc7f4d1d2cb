package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped keyed cache for context-bound values.
  *
  * A persisted DataFrame (or anything holding one — index trees, temp
  * view registrations) is bound to ONE SparkContext/SparkSession:
  * serving a cached value to a later session in the same JVM fails on
  * dead block / stopped-context references. Every such cache therefore
  * keys its entries by applicationId, and entries of a different
  * (dead) application are evicted on first touch by a new session so a
  * long-lived JVM cycling sessions doesn't accrete one value per
  * session (the convention Bpe.scala established for its
  * checkpoint-backed Model).
  *
  * Builds run under a PER-KEY lock: racing first-touch callers of the
  * same key share one (multi-job) build instead of leaking the losers'
  * persisted frames, while different keys — different index parameter
  * sets, different datasets — still build concurrently (a single
  * cache-wide lock would serialize Bench's concurrent pass). Nested
  * builds that consult OTHER caches (layout → userRoles, layout →
  * closure) take locks in one direction only, so no cycle exists.
  *
  * Driver-side sidecars (centroid arrays, grids, codebooks, eigen
  * models) deliberately do NOT use this: plain JVM data survives
  * session cycling, and reusing it across sessions is valid — only
  * context-bound values need app scoping.
  */
final class SessionCache[K, V] {
  private val m = TrieMap.empty[(String, K), V]
  private val locks = TrieMap.empty[(String, K), Object]

  private def evictStale(appId: String): Unit = {
    m.keys.filter(_._1 != appId).foreach(m.remove)
    locks.keys.filter(_._1 != appId).foreach(locks.remove)
  }

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => V): V = {
    val appId = spark.sparkContext.applicationId
    evictStale(appId)
    val kk = (appId, key)
    m.get(kk) match {
      case Some(v) => v
      case None =>
        // TrieMap.getOrElseUpdate is atomic, so every racer of kk sees
        // ONE lock object; the winner builds, the rest block then read
        val lock = locks.getOrElseUpdate(kk, new Object)
        lock.synchronized(m.getOrElseUpdate(kk, build))
    }
  }

  /** Replace the entry unconditionally, returning the previous value
    * (so the caller can unpersist it).
    */
  def put(spark: SparkSession, key: K, value: V): Option[V] = {
    val appId = spark.sparkContext.applicationId
    evictStale(appId)
    m.put((appId, key), value)
  }

  /** Entry count for the CURRENT application (test observability). */
  def liveSize(spark: SparkSession): Int = {
    val appId = spark.sparkContext.applicationId
    m.keys.count(_._1 == appId)
  }
}

/** The common case: a session-scoped cache of persisted DataFrames. */
final class SessionFrameCache[K] {
  private val c = new SessionCache[K, DataFrame]
  def getOrElseUpdate(spark: SparkSession, key: K)(build: => DataFrame): DataFrame =
    c.getOrElseUpdate(spark, key)(build)
  def put(spark: SparkSession, key: K, value: DataFrame): Option[DataFrame] =
    c.put(spark, key, value)
  def liveSize(spark: SparkSession): Int = c.liveSize(spark)
}
