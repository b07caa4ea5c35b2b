package org.apache.spark.sql.execution.streaming.state

/** Package-placed shim exposing [[StateStore]]'s maintenance hooks
  * (`private[sql]`) to graft's single-JVM bench/verify mains.
  *
  * Why it exists: every stopped streaming query leaves its
  * HDFS-backed state store providers in the executor-side
  * loaded-providers map (holding the retained versions of each
  * partition's state as in-heap maps) until the maintenance thread
  * happens to unload them. A 196-entry bench run with dozens of
  * streaming entries accumulates hundreds of such providers whose
  * checkpoint dirs are already deleted — pure heap residue that
  * degrades later, unrelated queries (r5: 2.6x slowdown on unchanged
  * entries). The bench calls this between entries, OUTSIDE the timed
  * region. Production topologies never need it: a long-lived query's
  * providers are live state, not residue.
  */
object GraftStateStoreHygiene {
  /** Close and forget every loaded state store provider in this JVM. */
  def unloadAll(): Unit = StateStore.unloadAll()
}
