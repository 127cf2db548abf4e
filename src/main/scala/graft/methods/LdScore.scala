package graft.methods

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.MatrixTable

/** ld_score (reference `python/hail/experimental/ldscore.py`): per-variant
  * LD scores — the windowed sum of bias-adjusted squared correlations
  * `adj(r²) = ((n-1)/(n-2))·r² − 1/(n-2)` over all variants within
  * `radius` of the variant (same contig), for the univariate annotation
  * (all variants) and any per-variant numeric row annotations
  * (partitioned LD scores, Finucane 2015).
  *
  * Spark shape: the reference materializes the full n×n row-correlation
  * BlockMatrix, sparsifies row intervals, writes it to disk and
  * multiplies by an annotation matrix. Here the in-window pairs come
  * straight from the same radius-binned self-join as `Ld.ldMatrix` — a
  * plain shuffled equi-join bounded by variants-per-window², with
  * nothing n²-sized ever materialized — then one groupBy sums each
  * variant's adjusted-r² contributions (each pair contributes to both
  * endpoints; the diagonal contributes exactly 1 because adj(1) = 1). */
object LdScore {

  /** `annotations` are numeric row-field names; the returned frame keeps
    * the row key plus one score column per annotation and `univariate`.
    * `coordExpr` windows by a custom coordinate (e.g. cM) instead of
    * base-pair position. */
  def ldScore(mt: MatrixTable, entryExpr: Column => Column, radius: Double,
      coordExpr: Option[Column] = None,
      annotations: Seq[String] = Nil): DataFrame = {
    val n = mt.nCols
    require(n > 2, s"ld_score needs more than 2 samples, got $n")
    val adjA = (n - 1.0) / (n - 2.0)
    val adjB = 1.0 / (n - 2.0)
    val coordCol = coordExpr.getOrElse(col("position").cast("double"))
    val vid = concat_ws("_", col("position"), col("ref"),
      concat_ws(",", col("alt")))
    val annotArr = array(annotations.map(a => col(a).cast("double")): _*)
    // normalized vectors materialize once: consumed by both join sides
    // (via the explode below) and by the final score join
    val base = Pca.unitNormalized(mt.rows, mt.entries, entryExpr)
      .withColumn("__coord", coordCol)
      .withColumn("__vid", vid)
      .withColumn("__ann", annotArr)
      .localCheckpoint(false)
    val flat = base.select(col("contig"), col("__coord"), col("__vid"),
      col("__ann"), posexplode(col("__v")).as(Seq("__cidx", "__n")))
    // radius-binned self-join (Ld.ldMatrix's shape): the left side lands
    // in its own bin and the next, the right only in its own, so every
    // ordered in-window pair meets in exactly one bin
    val l = flat.select(col("contig"), col("__coord").as("c_i"),
        col("__vid").as("v_i"), col("__ann").as("a_i"), col("__cidx"),
        col("__n").as("__ni"))
      .withColumn("__bin", explode(array(floor(col("c_i") / radius),
        floor(col("c_i") / radius) + 1)))
    val r = flat.select(col("contig"), col("__coord").as("c_j"),
        col("__vid").as("v_j"), col("__ann").as("a_j"), col("__cidx"),
        col("__n").as("__nj"))
      .withColumn("__bin", floor(col("c_j") / radius))
    val pairs = l.join(r, Seq("contig", "__bin", "__cidx"))
      .filter((col("c_i") < col("c_j") ||
          (col("c_i") === col("c_j") && col("v_i") < col("v_j"))) &&
        col("c_j") <= col("c_i") + radius)
      .groupBy(col("contig"), col("v_i"), col("v_j"))
      .agg(sum(col("__ni") * col("__nj")).as("__r"),
        first(col("a_i")).as("a_i"), first(col("a_j")).as("a_j"))
      .withColumn("__adj",
        lit(adjA) * col("__r") * col("__r") - lit(adjB))
    // each unordered pair contributes its adj(r²) to BOTH endpoints,
    // weighted by the OTHER endpoint's annotation values
    val contrib = pairs
      .select(col("contig"), col("v_i").as("__vid"), col("__adj"),
        col("a_j").as("__oann"))
      .unionByName(pairs.select(col("contig"), col("v_j").as("__vid"),
        col("__adj"), col("a_i").as("__oann")))
    val headAgg = sum(col("__adj")).as("__l2o")
    val annAggs = annotations.indices.map(i =>
      sum(col("__adj") * element_at(col("__oann"), i + 1)).as(s"__s$i"))
    val scores = contrib.groupBy(col("contig"), col("__vid"))
      .agg(headAgg, annAggs: _*)
    val keyCols = mt.rowKey.map(col)
    val annOut = annotations.zipWithIndex.map { case (a, i) =>
      (element_at(col("__ann"), i + 1) +
        coalesce(col(s"__s$i"), lit(0.0))).as(a)
    }
    // diagonal term: adj(r_ii²) = adj(1) = 1 exactly, annotation-weighted
    // by the variant's own value
    base.select((keyCols :+ col("__vid") :+ col("__ann")): _*)
      .join(scores, Seq("contig", "__vid"), "left")
      .withColumn("univariate",
        lit(1.0) + coalesce(col("__l2o"), lit(0.0)))
      .select((keyCols ++ annOut :+ col("univariate")): _*)
  }
}
