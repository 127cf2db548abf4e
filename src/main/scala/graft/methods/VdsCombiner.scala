package graft.methods

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

import graft.MatrixTable

/** VDS combiner (reference `python/hail/vds/combiner/` —
  * `combine_variant_datasets` / `combine_references` plus the
  * hierarchical driver in `variant_dataset_combiner.py`): merge many
  * gVCF-shaped VariantDatasets into one, column-concatenating samples
  * and outer-merging the row (variant / reference-block) keys.
  *
  * Spark shape: one tagged union + ONE grouped shuffle per merge level
  * (the multiWayZipJoin plan) — n-way merge cost is linear in total
  * input, never iterated pairwise joins. The hierarchical driver exists
  * to bound plan depth and lineage (the reference writes intermediate
  * VDSes for the same reason); each round optionally persists. */
object VdsCombiner {

  private def entrySchema(mt: MatrixTable): StructType =
    mt.rows.schema(MatrixTable.EntriesField).dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  /** n-way outer merge of like-typed MatrixTables on the row key:
    * one output row per key present in ANY input; entries arrays are
    * concatenated in input order with typed-null padding where an input
    * lacks the key; non-key row fields come from the first input
    * carrying the key. Inputs must be key-distinct (gVCF rows are). */
  def combineMts(mts: Seq[MatrixTable]): MatrixTable = {
    require(mts.nonEmpty)
    val head = mts.head
    val key = head.rowKey
    require(mts.forall(_.rowKey == key), "row keys must match")
    val es = entrySchema(head)
    val rowFields = head.rows.columns
      .filterNot(c => key.contains(c) || c == MatrixTable.EntriesField)
      .toSeq
    val tagged = mts.zipWithIndex.map { case (mt, i) =>
      mt.rows.select((key.map(col) :+ lit(i).as("__i") :+
        col(MatrixTable.EntriesField).as("__e") :+
        struct(rowFields.map(col): _*).as("__rf")): _*)
    }
    val unioned = tagged.reduce(_ unionByName _)
    val nullEntry = lit(null).cast(es)
    def inputAt(i: Int) = get(org.apache.spark.sql.functions.filter(
      col("__all"), x => x("__i") === i), lit(0))
    val mergedEntries = concat(mts.zipWithIndex.map { case (mt, i) =>
      coalesce(inputAt(i)("__e"),
        array_repeat(nullEntry, mt.nCols))
    }: _*)
    val mergedRf = coalesce(mts.indices.map(i => inputAt(i)("__rf")): _*)
    val merged = unioned.groupBy(key.map(col): _*)
      .agg(collect_list(struct(col("__i"), col("__e"), col("__rf")))
        .as("__all"))
      .select((key.map(col) ++
        rowFields.map(f => mergedRf(f).as(f)) :+
        mergedEntries.as(MatrixTable.EntriesField)): _*)
    head.copy(
      rows = merged,
      colValues = mts.flatMap(_.colValues).toIndexedSeq)
  }

  /** Merge a batch of VDSes: reference blocks and variant rows each get
    * the n-way outer merge. */
  def combine(vdss: Seq[VariantDataset]): VariantDataset =
    VariantDataset(
      combineMts(vdss.map(_.referenceData)),
      combineMts(vdss.map(_.variantData)))

  /** Hierarchical combine (the reference's combiner driver loop): merge
    * in rounds of `branchFactor` until one VDS remains, persisting each
    * round's outputs to keep plan depth bounded at log_b(n). */
  def combineHierarchical(vdss: Seq[VariantDataset],
      branchFactor: Int = 8, persistRounds: Boolean = true)
      : VariantDataset = {
    require(vdss.nonEmpty && branchFactor >= 2)
    var level = vdss
    while (level.length > 1) {
      level = level.grouped(branchFactor).map { batch =>
        val merged = combine(batch)
        if (persistRounds && level.length > branchFactor)
          VariantDataset(
            merged.referenceData.copy(
              rows = merged.referenceData.rows.persist()),
            merged.variantData.copy(
              rows = merged.variantData.rows.persist()))
        else merged
      }.toSeq
    }
    level.head
  }
}
