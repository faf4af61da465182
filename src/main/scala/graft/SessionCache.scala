package graft

import org.apache.spark.sql.SparkSession

/** A (session, key)-scoped memo for driver-side artifacts that are
  * expensive to rebuild per query (logical plans, index paths, query
  * parameters). Entries of stopped sessions are evicted on every
  * access so repeated getOrCreate/stop cycles in one JVM can't pin
  * dead sessions (or their plans) in memory — the one cache-lifecycle
  * bug this pattern kept re-growing when hand-rolled at each use site.
  */
final class SessionCache[V] {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), V]

  def get(spark: SparkSession, key: String)(build: => V): V = {
    cache.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    cache.getOrElseUpdate((spark, key), build)
  }

  /** Overwrite an entry — for producers that re-materialize the
    * artifact behind a key (e.g. an index rebuilt in place) and must
    * not leave a stale memo behind.
    */
  def put(spark: SparkSession, key: String, value: V): Unit =
    cache.update((spark, key), value)
}
