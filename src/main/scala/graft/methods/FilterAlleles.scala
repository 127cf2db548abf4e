package graft.methods

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

import graft.MatrixTable
import graft.functions.{Alleles, Calls}

/** filter_alleles / filter_alleles_hts (reference
  * `python/hail/methods/statgen.py:4295,4405`): drop alternate alleles by
  * a per-allele predicate, re-deriving the variant key via multi-allele
  * minimal representation, with optional GATK entry-field recoding.
  *
  * Spark shape: the inclusion mask, index maps, and min_rep are per-row
  * expression work; the hts GT/AD/GQ/PL recode is ONE fused kernel
  * expression (`functions/HtsRecode.scala`) over the entries column —
  * a single plan node, no shuffle, per-row index tables shared across
  * entries. */
object FilterAlleles {

  /** filter_alleles (statgen.py:4295): keep alt allele i (1-based) iff
    * `pred(allele, i)`; rows with no surviving alt are dropped. Adds
    * `old_position`/`old_ref`/`old_alt`, `old_to_new` (0-based over
    * [ref]+alts, missing = filtered) and `new_to_old`. Entry fields are
    * NOT touched (the reference's documented contract) — use
    * `filterAllelesHts` for GT/AD/GQ/PL recoding. */
  def apply(mt: MatrixTable, pred: (Column, Column) => Column)
      : MatrixTable = {
    // batched withColumns: each withColumn call re-analyzes the whole
    // plan eagerly, and with entry expression trees attached that
    // analysis is the dominant driver cost — batch the independent
    // groups so the plan is analyzed a constant number of times
    val rows = mt.rows
      .withColumns(Map(
        "old_position" -> col("position"),
        "old_ref" -> col("ref"),
        "old_alt" -> col("alt"),
        "__incl" -> transform(sequence(lit(1), size(col("alt"))),
          i => coalesce(pred(element_at(col("alt"), i), i), lit(false)))))
      .withColumns(Map(
        "new_to_old" -> concat(array(lit(0)),
          filter(sequence(lit(1), size(col("alt"))),
            i => element_at(col("__incl"), i))),
        "old_to_new" -> concat(array(lit(0)),
          transform(sequence(lit(1), size(col("alt"))), i =>
            when(element_at(col("__incl"), i),
              size(filter(slice(col("__incl"), lit(1), i), x => x)))))))
      .filter(size(col("new_to_old")) > 1)
      .withColumn("__newAlts", transform(
        slice(col("new_to_old"), lit(2), size(col("new_to_old")) - 1),
        oi => element_at(col("old_alt"), oi)))
      .withColumn("__mr",
        Alleles.minRepMulti(col("position"), col("ref"), col("__newAlts")))
      .withColumns(Map(
        "position" -> col("__mr")("position"),
        "ref" -> col("__mr")("ref"),
        "alt" -> col("__mr")("alt")))
      .drop("__incl", "__newAlts", "__mr")
    mt.copy(rows = rows)
  }

  /** filter_alleles_hts (statgen.py:4405): filter_alleles plus the GATK
    * entry recode. `subset=false` downcodes filtered alleles to ref
    * (AD depths fold into ref, PL is the min over merged genotypes, GT
    * remaps); `subset=true` drops the filtered alleles' AD/PL slots,
    * shifts PL so the minimum is 0, and sets GT to the unique argmin PL
    * (missing on ties). DP passes through; GQ re-derives from the new
    * PL in both modes. */
  def hts(mt: MatrixTable, pred: (Column, Column) => Column,
      subset: Boolean = false): MatrixTable = {
    val es = mt.rows.schema(MatrixTable.EntriesField).dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    require(Seq("GT", "AD", "DP", "GQ", "PL").forall(es.fieldNames.contains),
      s"filter_alleles_hts needs the HTS entry schema GT/AD/DP/GQ/PL; " +
        s"found ${es.fieldNames.mkString(",")} — use filterAlleles for " +
        "non-HTS entries")
    val filtered = apply(mt, pred)
    // The recode is ONE fused kernel expression (HtsRecodeExpr): the
    // pure-Column formulation it replaces was re-inlined by the
    // optimizer's extract-value simplification into every consumer of
    // the new PL (PL, GQ, and the subset GT argmin), growing the
    // optimized plan 13x and making analysis + codegen the dominant
    // cost (~8 s per query pair at ANY data size). The kernel is a
    // single plan node; per-row index machinery and the per-entry
    // recode run as a tight JVM loop with identical null semantics
    // (pinned by the geno_filter_alleles_hts gate in both modes).
    val recoded = filtered.rows.withColumn(MatrixTable.EntriesField,
      graft.functions.HtsRecode(col(MatrixTable.EntriesField),
        col("old_to_new"), col("new_to_old"), subset))
    filtered.copy(rows = recoded)
  }
}
