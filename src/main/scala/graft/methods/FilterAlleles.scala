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
  * Spark shape: everything is per-row expression work — the inclusion
  * mask, index maps, and min_rep run in row space; the hts GT/AD/PL
  * recode compiles to higher-order array functions inside the one
  * entries `transform`, so the 100 TB entry column streams through a
  * single codegen'd stage with no shuffle. The genotype-index mapping
  * table (`__gtmap`) is staged once per ROW, not per entry. */
object FilterAlleles {

  private def triangle(n: Column): Column =
    (n * (n + 1) / 2).cast("int")

  /** Invert the unphased-diploid genotype index: g -> (i, j), i <= j,
    * g = j(j+1)/2 + i. Exact in double for any real allele count. */
  private def gtPair(g: Column): (Column, Column) = {
    val j = floor((sqrt(g.cast("double") * 8 + 1) - 1) / 2).cast("int")
    ((g - j * (j + 1) / 2).cast("int"), j)
  }

  /** filter_alleles (statgen.py:4295): keep alt allele i (1-based) iff
    * `pred(allele, i)`; rows with no surviving alt are dropped. Adds
    * `old_position`/`old_ref`/`old_alt`, `old_to_new` (0-based over
    * [ref]+alts, missing = filtered) and `new_to_old`. Entry fields are
    * NOT touched (the reference's documented contract) — use
    * `filterAllelesHts` for GT/AD/GQ/PL recoding. */
  def apply(mt: MatrixTable, pred: (Column, Column) => Column)
      : MatrixTable = {
    val rows = mt.rows
      .withColumn("old_position", col("position"))
      .withColumn("old_ref", col("ref"))
      .withColumn("old_alt", col("alt"))
      .withColumn("__incl",
        transform(sequence(lit(1), size(col("alt"))),
          i => coalesce(pred(element_at(col("alt"), i), i), lit(false))))
      .withColumn("new_to_old", concat(array(lit(0)),
        filter(sequence(lit(1), size(col("alt"))),
          i => element_at(col("__incl"), i))))
      .withColumn("old_to_new", concat(array(lit(0)),
        transform(sequence(lit(1), size(col("alt"))), i =>
          when(element_at(col("__incl"), i),
            size(filter(slice(col("__incl"), lit(1), i), x => x))))))
      .filter(size(col("new_to_old")) > 1)
      .withColumn("__newAlts", transform(
        slice(col("new_to_old"), lit(2), size(col("new_to_old")) - 1),
        oi => element_at(col("old_alt"), oi)))
      .withColumn("__mr",
        Alleles.minRepMulti(col("position"), col("ref"), col("__newAlts")))
      .withColumn("position", col("__mr")("position"))
      .withColumn("ref", col("__mr")("ref"))
      .withColumn("alt", col("__mr")("alt"))
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

    val nOldAll = size(col("old_alt")) + 1
    val nNewAll = size(col("alt")) + 1
    val o2nNoNa = transform(col("old_to_new"), x => coalesce(x, lit(0)))
    // old genotype index -> downcoded new genotype index, one small
    // array per row
    val gtMap = transform(sequence(lit(0), triangle(nOldAll) - 1), og => {
      val (oi, oj) = gtPair(og)
      val ni = element_at(col("__o2n"), oi + 1)
      val nj = element_at(col("__o2n"), oj + 1)
      val lo = least(ni, nj); val hi = greatest(ni, nj)
      (hi * (hi + 1) / 2 + lo).cast("int")
    })

    val staged = filtered.rows
      .withColumn("__o2n", o2nNoNa)
      .withColumn("__tNew", triangle(nNewAll))
      .withColumn("__tOld", triangle(nOldAll))
      .withColumn("__gtmap", gtMap)

    def recode(e: Column): Column = {
      val pl = e("PL")
      val newPl: Column =
        if (subset) {
          val unnorm = transform(sequence(lit(0), col("__tNew") - 1), g => {
            val (i, j) = gtPair(g)
            val oi = element_at(col("new_to_old"), i + 1)
            val oj = element_at(col("new_to_old"), j + 1)
            // new_to_old is increasing, so oi <= oj
            element_at(pl, (oj * (oj + 1) / 2 + oi + 1).cast("int"))
          })
          val m = array_min(unnorm)
          transform(unnorm, v => v - m)
        } else {
          transform(sequence(lit(0), col("__tNew") - 1), g =>
            array_min(transform(
              filter(sequence(lit(0), col("__tOld") - 1),
                og => element_at(col("__gtmap"), og + 1) === g),
              og => element_at(pl, og + 1))))
        }
      val newGt: Column =
        if (subset) {
          // unique argmin of the shifted PL (zero after shift)
          val zeros = filter(sequence(lit(0), col("__tNew") - 1),
            g => element_at(newPl, g + 1) === 0)
          val (i, j) = gtPair(element_at(zeros, 1))
          when(pl.isNotNull && size(zeros) === 1, Calls.diploid(i, j))
        } else {
          val a1 = element_at(col("__o2n"), Calls.allele1(e("GT")) + 1)
          when(e("GT").isNotNull,
            when(Calls.ploidy(e("GT")) === 1, Calls.haploid(a1))
              .otherwise {
                val a2 =
                  element_at(col("__o2n"), Calls.allele2(e("GT")) + 1)
                Calls.diploid(least(a1, a2), greatest(a1, a2))
              })
        }
      val newAd: Column =
        if (subset)
          when(e("AD").isNotNull,
            transform(sequence(lit(0), size(col("alt"))), i =>
              element_at(e("AD"), element_at(col("new_to_old"), i + 1) + 1)))
        else
          when(e("AD").isNotNull,
            transform(sequence(lit(0), size(col("alt"))), newi =>
              aggregate(
                filter(sequence(lit(0), size(col("old_alt"))),
                  oldi => element_at(col("__o2n"), oldi + 1) === newi),
                lit(0), (a, oldi) => a + element_at(e("AD"), oldi + 1))))
      val guardedPl = when(pl.isNotNull, newPl)
      val fields = es.fieldNames.toSeq.map {
        case "GT" => newGt.as("GT")
        case "AD" => newAd.as("AD")
        case "PL" => guardedPl.as("PL")
        case "GQ" => Calls.gqFromPl(guardedPl).as("GQ")
        case f => e(f).as(f)
      }
      when(e.isNotNull, struct(fields: _*))
    }

    val recoded = staged
      .withColumn(MatrixTable.EntriesField,
        transform(col(MatrixTable.EntriesField), recode(_)))
      .drop("__o2n", "__tNew", "__tOld", "__gtmap")
    filtered.copy(rows = recoded)
  }
}
