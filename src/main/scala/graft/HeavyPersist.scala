package graft

import org.apache.spark.sql.DataFrame

/** Heavy persisted intermediates (featurized corpora, term-frequency
  * frames), one live set per session: starting a new heavy computation
  * releases the previous call's caches, so a long-lived session that
  * processes corpus after corpus holds at most ONE heavy copy — not
  * one per call forever (the unbounded-cache leak) — and the frames
  * stay LAZY, so downstream filters/projections still push through the
  * operator's plan (eagerly materializing here was measured to defeat
  * pushdown 5-25× on filtered consumers). A caller that interleaves
  * actions over two concurrently-built heavy frames will silently
  * recompute the earlier one's intermediates — correct, just uncached;
  * persist externally for that pattern.
  *
  * Shared by the near-dup pipelines (Dedup) and the corpus-statistics
  * operators (TextAnalysis): "latest pipeline wins" is one registry's
  * property, so it must be ONE registry.
  */
private[graft] object HeavyPersist {

  private val caches = scala.collection.concurrent.TrieMap
    .empty[org.apache.spark.sql.SparkSession, List[DataFrame]]

  def apply(df: DataFrame, freshScope: Boolean = true): DataFrame =
    caches.synchronized {
      // synchronized: the read-evict-update sequence must be atomic or
      // two concurrent calls race on the registry and the loser's frame
      // stays persisted with no owner — the exact leak this prevents
      caches.filterInPlace((k, _) => !k.sparkContext.isStopped)
      val prev =
        if (freshScope) {
          caches.getOrElse(df.sparkSession, Nil)
            .foreach(_.unpersist(blocking = false))
          Nil
        } else caches.getOrElse(df.sparkSession, Nil)
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      caches.update(df.sparkSession, p :: prev)
      p
    }

  /** Drop every frame this session has registered, now. Inter-query
    * isolation for the bench/verify loops: "latest pipeline wins"
    * evicts only at the NEXT apply(), so the last pipeline's multi-GB
    * frame otherwise squats the protected storage region
    * (spark.memory.storageFraction) across every unrelated query that
    * follows, starving their execution memory (measured: q186 8 s
    * isolated vs 39-46 s mid-suite with q157's frames still live).
    */
  def clear(spark: org.apache.spark.sql.SparkSession): Unit =
    caches.synchronized {
      caches.remove(spark).toList.flatten
        .foreach(_.unpersist(blocking = false))
    }
}
