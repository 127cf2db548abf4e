package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Fan-out materialization strategy for the dedup/similarity pipelines
  * (`spark.graft.materialize`), round-16 verdict ask #3.
  *
  * Multi-consumer intermediates (gram groups, the ppjoin prefix frame,
  * band/simhash signatures, LSH buckets) are computed once and read by
  * 2-4 downstream subtrees whose exchanges do NOT canonicalize to a
  * ReusedExchange (measured, round 15) — without a materialization the
  * whole upstream pipeline runs once per consumer. Two ways to pin it,
  * with a real trade:
  *
  *  - `localCheckpoint` (default, the behavior every measured number
  *    in SCALING_r* was taken under): blocks in the executors' block
  *    managers, lineage TRUNCATED. Space self-reclaims (the
  *    ContextCleaner releases blocks once the result frame is
  *    unreachable) and downstream plans are flat — but a LOST block
  *    (executor death, preemptible/spot node) fails the job, because
  *    there is no lineage left to recompute from.
  *  - `persistDisk`: `persist(DISK_ONLY)` — blocks on executor disk,
  *    lineage RETAINED, so a lost block recomputes from source and the
  *    job survives preemption. The costs: cached plans are pinned in
  *    the session's CacheManager until unpersist/session end (a
  *    long-lived session accumulates disk), and physical plans carry
  *    the cached subtree under InMemoryTableScan nodes (the plan
  *    audits strip those before asserting).
  *
  * Scope: every LAZY, non-iterative fan-out point in the pipeline
  * package (`Dedup`, `Similarity`, `Sampling`, `Retrieval`,
  * `LangModel`, `QualityClassifier`). Exempt, deliberately:
  *  - the EAGER `localCheckpoint(true, DISK_ONLY)` calls in the
  *    winnow slicing family — disk-footprint SEQUENCING barriers
  *    (compute slice, release, next slice) whose bounded-disk
  *    contract needs blocks dropped at precise points, which a
  *    pinned cache defeats;
  *  - iterative operators (`Graph.pageRank`, label propagation,
  *    PCA's NIPALS loop) — they checkpoint to TRUNCATE LINEAGE, and
  *    under `persistDisk` a deep loop would rebuild the very plan
  *    explosion the checkpoint exists to stop;
  *  - the streaming parity harnesses (`StreamText`) — their batch
  *    side frames live for a stream's lifetime, a different
  *    lifecycle from a one-job fan-out. */
private[graft] object Materialize {
  private def mode(df: DataFrame): String = df.sparkSession.conf
    .get("spark.graft.materialize", "localCheckpoint")

  private def at(df: DataFrame, level: StorageLevel): DataFrame =
    mode(df) match {
      case "localCheckpoint" => df.localCheckpoint(eager = false, level)
      case "persistDisk"     => df.persist(StorageLevel.DISK_ONLY)
      case other => throw new IllegalArgumentException(
        s"spark.graft.materialize=$other; expected localCheckpoint " +
          "(lineage truncated, self-reclaiming — the default) or " +
          "persistDisk (lineage retained, survives executor loss)")
    }

  /** Default fan-out pin: memory-first blocks under `localCheckpoint`,
    * executor disk under `persistDisk`. */
  def fanout(df: DataFrame): DataFrame = at(df, StorageLevel.MEMORY_AND_DISK)

  /** Disk-backed fan-out pin for similarity-scaled intermediates whose
    * memory-first materialization OOM'd the 48g single-JVM fleet at
    * sf10 (candidate pair sets — see winnowContamination). */
  def fanoutDisk(df: DataFrame): DataFrame = at(df, StorageLevel.DISK_ONLY)
}
