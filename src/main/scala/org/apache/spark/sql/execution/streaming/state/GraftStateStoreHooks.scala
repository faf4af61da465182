package org.apache.spark.sql.execution.streaming.state

/** Package-placed shim over `private[sql]` state-store lifecycle.
  *
  * Why it exists: a STOPPED streaming query does not release its
  * executor-side state immediately — `StateStore.loadedProviders` is a
  * JVM-global registry, and each HDFS-backed provider retains the last
  * `spark.sql.streaming.maxBatchesToRetainInMemory` (default 2)
  * versions of its state map IN MEMORY until the background
  * maintenance task (60 s interval) notices the query is gone. For a
  * bounded [[graft.streaming.StreamReplay]] replay whose first
  * micro-batch buffers the whole input in state (e.g. sessionization
  * buffering every event until the watermark passes), that's GBs of
  * dead heap parked across the next minute of work — measured 4-17×
  * slowdowns on the queries that happen to run next (q186 2.7 s
  * standalone vs 46 s right after q184/q185 at 100×).
  *
  * `unloadProviders()` closes and unregisters every loaded provider
  * right away. Safe between queries: a later streaming query lazily
  * reloads what it needs from the checkpoint.
  */
object GraftStateStoreHooks {

  def unloadProviders(): Unit = StateStore.unloadAll()
}
