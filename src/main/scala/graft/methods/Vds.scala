package graft.methods

import org.apache.spark.sql.functions._

import graft.MatrixTable

/** VariantDataset: the sparse gVCF pair representation (reference
  * `python/hail/vds/variant_dataset.py` — `{reference_data,
  * variant_data}` — and `vds/methods.py` `to_dense_mt`).
  *
  * `referenceData` rows are reference blocks: keyed (contig, position)
  * with an `END: int` entry field per sample — the block asserts
  * hom-ref from `position` to `END` inclusive. `variantData` is an
  * ordinary variant matrix. */
final case class VariantDataset(
    referenceData: MatrixTable,
    variantData: MatrixTable) {

  /** to_dense_mt (reference `vds/methods.py`): fill each missing variant
    * entry from the reference block covering that (sample, position) —
    * a per-sample interval join of variant coordinates into reference
    * blocks. Spark shape: both sides in coordinate space, range-predicate
    * join keyed (contig, sample); block counts per sample are bounded by
    * genome size / block length, and the join output is one row per
    * filled cell. Filled entries get GT hom-ref (0) and the block's
    * fields; present variant entries win. */
  def toDenseMt(): MatrixTable = {
    val vd = variantData
    val spark = vd.spark
    // FULL (variant x sample) grid — entriesTable drops missing cells,
    // which are exactly the ones the reference blocks must fill
    val colsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        vd.colValues.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row(i, r.getString(0)) }.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("col_idx",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType))))
    val varCoord = vd.rows
      .select(vd.rowKey.map(col) :+
        posexplode(vd.entries).as(Seq("col_idx", "__e")): _*)
      .withColumn("__v_gt", col("__e")("GT"))
      .drop("__e")
      .join(broadcast(colsDf), Seq("col_idx"))
    // the right side is renamed wholesale BEFORE the join: when both
    // sides descend from the same parsed plan their attribute ids can
    // coincide, and drop(refCoord("contig")) would remove the LEFT key
    // (nulling it for unmatched rows)
    val refCoord = referenceData.entriesTable.df
      .select(col("contig").as("__r_contig"),
        col("position").as("__r_start"),
        col("s").as("__r_s"), col("END").as("__r_end"),
        col("DP").as("__r_dp"))
    val filled = varCoord
      .join(refCoord,
        col("contig") === col("__r_contig") &&
          col("s") === col("__r_s") &&
          col("position") >= col("__r_start") &&
          col("position") <= col("__r_end"),
        "left")
      .drop("__r_contig", "__r_s")
      .withColumn("GT", coalesce(col("__v_gt"),
        when(col("__r_end").isNotNull, lit(0))))
      .withColumn("DP", when(col("__v_gt").isNull, col("__r_dp")))
      .drop("__v_gt", "__r_start", "__r_end", "__r_dp")
    MatrixTable.fromCoordinates(
      coord = filled.filter(col("GT").isNotNull),
      rowKey = vd.rowKey,
      colIdx = col("col_idx"),
      entryFields = Seq("GT" -> col("GT"), "DP" -> col("DP")),
      colValues = vd.colValues,
      colSchema = vd.colSchema,
      colKey = vd.colKey)
  }

  /** interval_coverage (reference `vds/methods.py:759`): per
    * (interval, sample) base-coverage statistics computed — like the
    * reference — from REFERENCE BLOCKS only. Intervals are 1-based
    * half-open (contig, start, end); a block [position, END] contributes
    * `overlap = min(END+1, end) − max(position, start)` bases at its DP.
    *
    * Spark shape: the (small) interval list broadcasts; the join is a
    * broadcast hash join on contig with the range condition as residual,
    * then one hash aggregation on (interval, sample) — no sort, no
    * range shuffle, scales with blocks × avg-overlapping-intervals.
    * Samples with no covering block in an interval are absent (join
    * semantics); the reference emits zeros there. */
  def intervalCoverage(intervals: Seq[(String, Int, Int)],
      dpThresholds: Seq[Int] = Seq(0, 1, 10, 20, 30))
      : org.apache.spark.sql.DataFrame = {
    val spark = referenceData.spark
    val e = referenceData.entriesTable.df
      .filter(col("END").isNotNull)
      .select(col("contig"), col("position"), col("s"),
        col("END"), col("DP"))
    val iv = spark.createDataFrame(intervals)
      .toDF("__ic", "__is", "__ie")
    val j = e.join(broadcast(iv),
      col("contig") === col("__ic") &&
        col("position") < col("__ie") && col("END") >= col("__is"))
    val ov = (least(col("END") + 1, col("__ie")) -
      greatest(col("position"), col("__is"))).cast("long")
    j.withColumn("__ov", ov)
      .groupBy(col("__ic").as("contig"), col("__is").as("start"),
        col("__ie").as("end"), col("s"))
      .agg(
        sum(col("__ov") * col("DP")).as("sum_dp"),
        array(dpThresholds.map(t =>
          coalesce(sum(when(col("DP") >= t, col("__ov"))), lit(0L))): _*)
          .as("bases_over_dp_threshold"))
      .withColumn("interval_size", col("end") - col("start"))
      .withColumn("mean_dp", col("sum_dp") / col("interval_size"))
      .withColumn("fraction_over_dp_threshold",
        transform(col("bases_over_dp_threshold"),
          b => b / col("interval_size")))
  }
}
