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
}
