package graft.streaming

import java.io.File

/** The drain-GC nudge gate, extracted from `Events.drainToParquet` so
  * its two load-bearing decisions are pinned by a spec instead of
  * exercised only incidentally by stream gates:
  *
  *  1. Only `shuffle_*` files count toward the reclaimable disk mass.
  *     Block-manager dirs also hold `rdd_*` blocks — live
  *     localCheckpoints of OTHER operators in the same JVM, which a GC
  *     cannot free — and counting those would re-trigger the nudge
  *     fleet-wide, undoing the round-15 gating win.
  *  2. The nudge fires only when checkpoint + shuffle dead mass reaches
  *     1 GiB combined. Below that, the r14 sf0.1 fleet measured the
  *     full-heap GC (~0.3-0.5 s on a 32-core JVM) as pure cost; at sf10
  *     either term passes the gate alone.
  *
  * The walk is scoped to THIS SparkContext's own block-manager dirs
  * (via `GraftStorageBridge.blockManagerDirs`), not every `blockmgr-*`
  * under `spark.local.dir` — stale dirs from dead JVMs and concurrent
  * fleet JVMs sharing /tmp would otherwise push the sum past the
  * threshold with mass this JVM's GC can never free. */
private[graft] object DrainGc {
  /** Combined (checkpoint + shuffle) dead-mass floor below which the
    * full-heap GC nudge is pure cost. */
  val thresholdBytes: Long = 1L << 30

  /** Recursive size of `shuffle_*` files under `dir` (data + index);
    * `rdd_*` blocks and unrelated files are excluded — they are live
    * pins a GC cannot free. Read-only, costs ms. */
  def shuffleBytes(dir: File): Long = {
    val kids = dir.listFiles()
    (if (kids == null) 0L else kids.map(shuffleBytes).sum) +
      (if (dir.isFile && dir.getName.startsWith("shuffle_")) dir.length()
       else 0L)
  }

  /** Total `shuffle_*` mass across this app's block-manager dirs. */
  def shuffleBytes(dirs: Seq[File]): Long = dirs.map(shuffleBytes).sum

  /** true when the measured DEAD disk mass — the state-store checkpoint
    * just deleted plus the stopped query's leftover shuffle files —
    * justifies the GC nudge. */
  def shouldNudge(chkBytes: Long, shuffleBytes: Long): Boolean =
    chkBytes + shuffleBytes >= thresholdBytes
}
