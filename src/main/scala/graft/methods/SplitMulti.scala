package graft.methods

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

import graft.MatrixTable
import graft.functions.{Alleles, Calls}

/** split_multi: split multiallelic variants into biallelic rows (reference
  * `python/hail/methods/statgen.py:3132` `split_multi`, `:3312`
  * `split_multi_hts`).
  *
  * One row per (variant, alt allele): alleles become [ref, alt_i] in
  * minimal representation, annotated `a_index` (1-based original alt
  * index) and `was_split`. Entry fields are recoded hts-style:
  *   - GT is downcoded to ref-vs-this-alt (`hl.downcode(GT, a_index)`)
  *   - AD (if present) collapses to [sum(AD) - AD[a_index], AD[a_index]]
  *   - other entry fields pass through unchanged
  *
  * Spark shape: `posexplode` of the alt array — a narrow per-row flatMap,
  * no shuffle; the minRep/downcode arithmetic is per-entry expression
  * work inside the same stage. Star alleles are dropped unless
  * `keepStar`. */
object SplitMulti {

  def apply(mt: MatrixTable, keepStar: Boolean = false): MatrixTable = {
    val es = mt.rows.schema(MatrixTable.EntriesField).dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    val otherEntryFields = es.fieldNames.filterNot(_ == "GT").toSeq
    val exploded = mt.rows
      .withColumn("was_split", size(col("alt")) > 1)
      .select(
        (mt.rows.columns.filterNot(_ == "alt").map(col).toSeq :+
          col("was_split") :+
          posexplode(col("alt")).as(Seq("__ai0", "__allele"))): _*)
      .withColumn("a_index", col("__ai0") + 1)
      .drop("__ai0")
    val filtered =
      if (keepStar) exploded else exploded.filter(col("__allele") =!= "*")
    val mr = Alleles.minRep(col("position"), col("ref"), col("__allele"))
    val recoded = filtered
      .withColumn("__mr", mr)
      .withColumn(MatrixTable.EntriesField,
        transform(col(MatrixTable.EntriesField), e => {
          val gt = Calls.downcode(e("GT"), col("a_index"))
          // PL downcode (split_multi_hts `statgen.py:3312`): the new
          // biallelic PL[k] is the minimum over all original diploid
          // genotypes carrying k copies of this alt; GQ re-derives from
          // the recoded PL. Linear PL index idx = j(j+1)/2 + i (i<=j);
          // j recovers by inverting the triangular number (exact in
          // double for any real allele count).
          val newPl: Option[org.apache.spark.sql.Column] =
            if (!es.fieldNames.contains("PL")) None
            else Some {
              val pl = e("PL")
              val withIdx = zip_with(pl,
                sequence(lit(0), size(pl) - 1),
                (v, i) => struct(v.as("v"), i.as("i")))
              def cnt(idx: org.apache.spark.sql.Column) = {
                val j = floor((sqrt(idx.cast("double") * 8 + 1) - 1) / 2)
                  .cast("int")
                val ii = idx - j * (j + 1) / 2
                (ii === col("a_index")).cast("int") +
                  (j === col("a_index")).cast("int")
              }
              def minAt(k: Int) = array_min(transform(
                filter(withIdx, p => cnt(p("i")) === k), p => p("v")))
              when(pl.isNotNull, array(minAt(0), minAt(1), minAt(2)))
            }
          val fields = otherEntryFields.map {
            case "AD" =>
              val adTot = aggregate(e("AD"), lit(0),
                (a, v) => a + coalesce(v, lit(0)))
              val adAlt = element_at(e("AD"), col("a_index") + 1)
              when(e("AD").isNotNull,
                array(adTot - adAlt, adAlt)).as("AD")
            case "PL" => newPl.get.as("PL")
            case "GQ" if newPl.isDefined =>
              coalesce(Calls.gqFromPl(newPl.get), e("GQ")).as("GQ")
            case f => e(f).as(f)
          }
          when(e.isNotNull, struct((gt.as("GT") +: fields): _*))
        }))
      .withColumn("position", col("__mr")("position"))
      .withColumn("ref", col("__mr")("ref"))
      .withColumn("alt", array(col("__mr")("alt")))
      .drop("__mr", "__allele")
    mt.copy(rows = recoded)
  }
}
