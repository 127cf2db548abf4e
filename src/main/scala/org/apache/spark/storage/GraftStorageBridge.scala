package org.apache.spark.storage

import java.io.File

import org.apache.spark.SparkEnv

/** Bridge into the `private[spark]` block-manager disk layout. The drain
  * GC gate (`graft.streaming.Events`) sizes THIS app's leftover
  * `shuffle_*` files before deciding whether a full-heap GC nudge pays;
  * walking every `blockmgr-*` dir under `spark.local.dir` instead would
  * also count stale dirs from dead JVMs and concurrent JVMs sharing
  * /tmp, whose mass a GC in this JVM can never free — re-triggering the
  * nudge fleet-wide, the exact cost the gate exists to avoid. Lives in
  * `org.apache.spark.storage` solely for access; contains no logic. */
object GraftStorageBridge {
  /** This SparkContext's own block-manager local directories (one
    * `blockmgr-<uuid>` dir per configured local dir). */
  def blockManagerDirs: Array[File] =
    SparkEnv.get.blockManager.diskBlockManager.localDirs
}
