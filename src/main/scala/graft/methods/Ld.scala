package graft.methods

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.{MatrixTable, Table}
import graft.functions.Calls

/** Linkage-disequilibrium operations (reference `statgen.py:3836`
  * `ld_matrix`, `:4708` `ld_prune` + `is/hail/methods/LocalLDPrune.scala`,
  * `StreamLocalLDPrune` IR node). */
object Ld {

  /** Per-variant mean-imputed, unit-length-standardized dosage rows
    * (`__norm` array; the reference's `ld_matrix` normalization). Rows
    * with near-zero variance dropped. */
  private def normRows(mt: MatrixTable): DataFrame = {
    // one fused codegen'd pass for the dose statistics and one for the
    // normalized vector (GenotypeFolds) — the HOF formulation ran three
    // interpreted folds plus a per-element transform
    val st = graft.functions.GenotypeFolds.doseStats(mt.entries)
    mt.rows.withColumn("__st", st)
      .withColumn("__ac", col("__st")("ac"))
      .withColumn("__acsq", col("__st")("acsq"))
      .withColumn("__nc", col("__st")("nc").cast("double"))
      .filter(col("__nc") > 0)
      // divisions guarded by when(): ANSI throws on double /0 and merged
      // projections can evaluate past the nc>0 filter speculatively
      .withColumn("__len", when(col("__nc") > 0,
        sqrt(col("__acsq") - col("__ac") * col("__ac") / col("__nc"))))
      .filter(col("__len") > 1e-6)
      .withColumn("__norm", graft.functions.GenotypeFolds.doseNorm(
        mt.entries,
        when(col("__nc") > 0, col("__ac") / col("__nc")), col("__len")))
      .drop("__st", "__ac", "__acsq", "__nc", "__len")
  }

  /** Windowed LD matrix: Pearson r between all variant pairs within
    * `window` bp on the same contig (the scalable banded form of the
    * reference's `ld_matrix`; a full m×m matrix at 100 TB is never the
    * right plan — the reference's own `ld_prune` also windows).
    *
    * Plan: positions are binned to window-width buckets; the left side is
    * emitted into its own bin AND the next one, the right side only into
    * its own, and the join key is `(contig, bin, sample)`. Every in-window
    * pair (pos_i < pos_j <= pos_i + window) meets in exactly one bin, so
    * the per-group join fan-out is bounded by variants-per-window², not
    * variants-per-contig² — the equi-join stays an ordinary shuffled hash
    * join at any contig size. The window predicate is a residual filter.
    *
    * Variants are identified by the full (position, ref, alt) key — two
    * variants at the same position (common after split_multi) stay
    * distinct pairs; same-position pairs are ordered by allele string. */
  def ldMatrix(mt: MatrixTable, window: Int): DataFrame = {
    val vid = concat_ws("_", col("ref"), concat_ws(",", col("alt")))
    // Materialize the parsed+normalized coordinates before the self-join
    // (lazy local checkpoint: first action computes it once). Without
    // this the whole source subtree — for VCF input, the full typed
    // parse — is duplicated under BOTH join sides: double codegen/
    // planning cost and double execution. The reference's ld_matrix
    // likewise materializes the standardized matrix (a BlockMatrix)
    // before multiplying.
    val coords = normRows(mt)
      .select(col("contig"), col("position"), vid.as("__vid"),
        posexplode(col("__norm")).as(Seq("__cidx", "__n")))
      .localCheckpoint(false)
    val l = coords.select(col("contig"), col("position").as("pos_i"),
        col("__vid").as("__vid_i"), col("__cidx"), col("__n").as("__ni"))
      .withColumn("__bin", explode(array(
        floor(col("pos_i").cast("long") / window),
        floor(col("pos_i").cast("long") / window) + 1)))
    val r = coords.select(col("contig"), col("position").as("pos_j"),
        col("__vid").as("__vid_j"), col("__cidx"), col("__n").as("__nj"))
      .withColumn("__bin", floor(col("pos_j").cast("long") / window))
    l.join(r, Seq("contig", "__bin", "__cidx"))
      .filter((col("pos_i") < col("pos_j") ||
        (col("pos_i") === col("pos_j") &&
          col("__vid_i") < col("__vid_j"))) &&
        col("pos_j") <= col("pos_i") + window)
      .groupBy(col("contig"), col("pos_i"), col("__vid_i"),
        col("pos_j"), col("__vid_j"))
      .agg(sum(col("__ni") * col("__nj")).as("r"))
      .withColumnRenamed("__vid_i", "vid_i")
      .withColumnRenamed("__vid_j", "vid_j")
  }

  /** ld_prune (reference `statgen.py:4708`, local pass
    * `LocalLDPrune.scala`): greedy in key order — keep a variant unless
    * its r² with a previously-KEPT variant within `window` bp exceeds
    * `r2Threshold`. Implemented exactly like the reference's local stage:
    * range-partition + sort by (contig, position), then a per-partition
    * streaming scan holding only the in-window kept variants (bounded
    * buffer). Like the reference's first pass, pruning is local to a
    * partition (cross-boundary pairs are not re-checked; the reference
    * follows with a global MIS step for those). Returns the kept
    * variant-key Table. */
  /** Full two-stage ld_prune (reference `statgen.py:4708`): the local
    * per-partition streaming pass, then the GLOBAL stage the reference
    * runs afterwards — pairwise r² among the locally-kept variants via
    * the banded `ldMatrix` join (catches cross-partition-boundary
    * pairs), a maximal-independent-set over the above-threshold edges,
    * and removal of the MIS-rejected variants. */
  def ldPruneGlobal(mt: MatrixTable, r2Threshold: Double = 0.2,
      window: Int = 1000000, numPartitions: Int = 0): Table = {
    val local = ldPrune(mt, r2Threshold, window, numPartitions)
    // semi-join (not a collected id list): the locally-kept set is large
    val keptMt = mt.copy(rows = mt.rows.join(
      local.df.select(mt.rowKey.map(col): _*), mt.rowKey, "left_semi"))
    val edges = ldMatrix(keptMt, window)
      .filter(col("r") * col("r") > r2Threshold)
      .select(
        concat_ws(":", col("contig"), col("pos_i"), col("vid_i")).as("i"),
        concat_ws(":", col("contig"), col("pos_j"), col("vid_j")).as("j"))
    // ONE action: collect the (few, by construction) cross-boundary edge
    // pairs and run MIS + vertex-set driver-side on the same list — no
    // persist, no second distinct/collect job over the edge frame
    val es = edges.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val keep = Misc.maximalIndependentSetLocal(es)
    val edgeVerts = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
    // rejected ⊆ edge vertices — few by construction (only correlated
    // cross-boundary pairs survive the local pass), so a literal list
    // filter is safe at any input size
    val rejected = (edgeVerts -- keep).toSeq
    val vidKey = concat_ws(":", col("contig"), col("position"),
      concat_ws("_", col("ref"), concat_ws(",", col("alt"))))
    Table(
      if (rejected.isEmpty) local.df
      else local.df.filter(!vidKey.isin(rejected: _*)), mt.rowKey)
  }

  /** `numPartitions = 0` uses the session shuffle-partition default;
    * pass an explicit count when the locally-pruned set must be
    * reproducible across cluster sizes (partition boundaries are part
    * of the local pass's semantics, as in the reference). */
  def ldPrune(mt: MatrixTable, r2Threshold: Double = 0.2,
      window: Int = 1000000, numPartitions: Int = 0): Table = {
    val base = normRows(mt)
      .select(col("contig"), col("position"), col("ref"), col("alt"),
        col("__norm"))
    val sorted = (if (numPartitions > 0)
      base.repartitionByRange(numPartitions, col("contig"), col("position"))
    else base.repartitionByRange(col("contig"), col("position")))
      .sortWithinPartitions(col("contig"), col("position"))
    val schema = sorted.drop("__norm").schema
    val kept = sorted.mapPartitions { it =>
      val buf = scala.collection.mutable.ArrayDeque
        .empty[(String, Int, Array[Double])]
      it.flatMap { row =>
        val contig = row.getString(0)
        val pos = row.getInt(1)
        val norm = row.getSeq[Double](4).toArray
        while (buf.nonEmpty && (buf.head._1 != contig ||
            buf.head._2 < pos - window))
          buf.removeHead()
        val pruned = buf.exists { case (_, _, other) =>
          var dot = 0.0
          var i = 0
          while (i < norm.length) { dot += norm(i) * other(i); i += 1 }
          dot * dot > r2Threshold
        }
        if (pruned) None
        else {
          buf.append((contig, pos, norm))
          Some(Row(contig, pos, row.get(2), row.get(3)))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    Table(kept.toDF(), mt.rowKey)
  }
}
