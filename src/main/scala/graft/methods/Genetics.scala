package graft.methods

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{MatrixTable, Table}
import graft.functions.{Calls, ReferenceGenome, StatTests}

/** Genetics method library: impute_sex, mendel_errors, concordance
  * (reference `python/hail/methods/statgen.py:73` `impute_sex`,
  * `family_methods.py:130` `mendel_errors`, `qc.py:360` `concordance`). */
object Genetics {

  /** impute_sex (reference `statgen.py:73`): per-sample inbreeding
    * coefficient F on X-chromosome non-PAR biallelic variants;
    * F = (observed_homs - expected_homs) / (n_called - expected_homs)
    * with E[homs] = Σ (1 - 2 af (1-af)) (reference `aggregators.py:1272`
    * `inbreeding`). is_female: F < femaleThreshold → true,
    * F > maleThreshold → false, else missing. One coordinate-space
    * shuffle, like sample_qc. */
  def imputeSex(mt: MatrixTable, aafThreshold: Double = 0.0,
      femaleThreshold: Double = 0.2, maleThreshold: Double = 0.8)
      (implicit rg: ReferenceGenome): Table = {
    val xRows = mt.rows
      .filter(rg.xContigs.map(col("contig") === _).reduce(_ || _))
      .filter(!rg.par.map { case (c, s0, e0) =>
        col("contig") === c && col("position") >= s0 &&
          col("position") < e0
      }.foldLeft(lit(false))(_ || _))
      .filter(size(col("alt")) === 1)
    val withAf = xRows
      .withColumn("__cs", Qc.callStatsFold(
        col(MatrixTable.EntriesField), size(col("alt")) + 1))
      .withColumn("__an",
        aggregate(col("__cs")("ac"), lit(0L), (a, v) => a + v))
      .withColumn("__af",
        when(col("__an") > 0,
          element_at(col("__cs")("ac"), 2).cast("double") /
            col("__an").cast("double")))
      .filter(col("__af") >= aafThreshold && col("__af").isNotNull)
      .drop("__cs", "__an")
    val e = mt.copy(rows = withAf).entriesTable.df
      .filter(col("GT").isNotNull && Calls.ploidy(col("GT")) === 2)
    val hom = Calls.allele1(col("GT")) === Calls.allele2(col("GT"))
    val perSample = e.groupBy(mt.colKey.map(col): _*)
      .agg(
        count(lit(1)).as("n_called"),
        sum(lit(1.0) - lit(2.0) * col("__af") * (lit(1.0) - col("__af")))
          .as("expected_homs"),
        count(when(hom, 1)).as("observed_homs"))
    val denom = col("n_called").cast("double") - col("expected_homs")
    val f = when(denom =!= 0.0,
      (col("observed_homs").cast("double") - col("expected_homs")) / denom)
    val out = mt.colsTable.df
      .join(perSample, mt.colKey, "left")
      .withColumn("f_stat", f)
      .withColumn("is_female",
        when(col("f_stat") < femaleThreshold, true)
          .when(col("f_stat") > maleThreshold, false))
    Table(out, mt.colKey, mt.globals)
  }

  private def gtClass(gt: Column): Column =
    when(gt.isNull, 1) // no call
      .when(Calls.isHomRef(gt), 2)
      .when(Calls.isHet(gt), 3)
      .otherwise(4) // hom var

  /** mendel_errors (reference `family_methods.py:130`; code table
    * `functions.py:6415` `mendel_error_code`): per (trio, variant) Mendel
    * violation codes. Trios are (kid, dad, mom, kidIsFemale). Copy state:
    * Auto (autosome/PAR/X-female), HemiX (X non-PAR male kid), HemiY
    * (Y non-PAR male kid). Assumes biallelic rows (split_multi first).
    * Implementation: the per-variant (kid, dad, mom) genotype triple is
    * assembled with three broadcast-filtered coordinate joins, then the
    * code table is one codegen'd CASE chain. */
  def mendelErrors(mt: MatrixTable,
      trios: Seq[(String, String, String, Boolean)])
      (implicit rg: ReferenceGenome): Table = {
    val e = mt.entriesTable.df
    val keyCols = mt.rowKey
    def side(id: String, role: String): DataFrame =
      e.filter(col("s") === id)
        .select((keyCols.map(col) :+ col("GT").as(s"__gt_$role")): _*)
    val joined = trios.map { case (kid, dad, mom, isF) =>
      side(kid, "kid")
        .join(side(dad, "dad"), keyCols, "left")
        .join(side(mom, "mom"), keyCols, "left")
        .withColumn("__s_kid", lit(kid))
        .withColumn("__kid_female", lit(isF))
    }.reduce(_ unionByName _)
    val k = gtClass(col("__gt_kid"))
    val d = gtClass(col("__gt_dad"))
    val m = gtClass(col("__gt_mom"))
    val inPar = rg.par.map { case (c, s0, e0) =>
      col("contig") === c && col("position") >= s0 && col("position") < e0
    }.foldLeft(lit(false))(_ || _)
    val inX = rg.xContigs.map(col("contig") === _).reduce(_ || _)
    val inY = rg.yContigs.map(col("contig") === _).reduce(_ || _)
    val isAuto = (!inX && !inY) || inPar || (inX && col("__kid_female"))
    val hemiX = inX && !inPar && !col("__kid_female")
    val hemiY = inY && !inPar && !col("__kid_female")
    val code =
      when(isAuto && d === 4 && m === 4 && k === 3, 1)
        .when(isAuto && d === 2 && m === 2 && k === 3, 2)
        .when(isAuto && d === 2 && m =!= 2 && m =!= 1 && k === 4, 3)
        .when(isAuto && d =!= 2 && d =!= 1 && m === 2 && k === 4, 4)
        .when(isAuto && d === 2 && m === 2 && k === 4, 5)
        .when(isAuto && d === 4 && m =!= 4 && m =!= 1 && k === 2, 6)
        .when(isAuto && d =!= 4 && d =!= 1 && m === 4 && k === 2, 7)
        .when(isAuto && d === 4 && m === 4 && k === 2, 8)
        .when(hemiX && m === 4 && k === 2, 9)
        .when(hemiX && m === 2 && k === 4, 10)
        .when(hemiY && d === 4 && k === 2, 11)
        .when(hemiY && d === 2 && k === 4, 12)
    Table(joined
      .withColumn("mendel_code", code)
      .filter(col("mendel_code").isNotNull)
      .select((keyCols.map(col) :+ col("__s_kid").as("s") :+
        col("mendel_code")): _*),
      keyCols :+ "s", mt.globals)
  }

  /** transmission_disequilibrium_test (reference
    * `statgen.py` `transmission_disequilibrium_test`): per variant, counts
    * of alt alleles transmitted (t) vs untransmitted (u) from
    * heterozygous parents across complete trios, chi² = (t-u)²/(t+u)
    * (1 dof). Counting rule: every hom-var parent transmits alt
    * obligately, so t = kidAltAlleles − #homVarParents and
    * u = #hetParents − t; Mendel-inconsistent triples are skipped.
    * Autosomes only (standard TDT). */
  def tdt(mt: MatrixTable, trios: Seq[(String, String, String)])
      (implicit rg: ReferenceGenome): Table = {
    val e = mt.entriesTable.df
    val keyCols = mt.rowKey
    def side(id: String, role: String) =
      e.filter(col("s") === id)
        .select((keyCols.map(col) :+ col("GT").as(s"__gt_$role")): _*)
    val joined = trios.map { case (kid, dad, mom) =>
      side(kid, "kid")
        .join(side(dad, "dad"), keyCols, "inner")
        .join(side(mom, "mom"), keyCols, "inner")
    }.reduce(_ unionByName _)
    val autosomal = joined.filter(
      !(rg.xContigs ++ rg.yContigs ++ rg.mtContigs)
        .map(col("contig") === _).reduce(_ || _))
      .filter(col("__gt_kid").isNotNull && col("__gt_dad").isNotNull &&
        col("__gt_mom").isNotNull)
    def nAlt(c: Column) = Calls.nNonRefAlleles(c)
    def isHet(c: Column) = Calls.isHet(c)
    def isHomVar(c: Column) = Calls.isHomVar(c)
    val hetP = isHet(col("__gt_dad")).cast("int") +
      isHet(col("__gt_mom")).cast("int")
    val homVarP = isHomVar(col("__gt_dad")).cast("int") +
      isHomVar(col("__gt_mom")).cast("int")
    val t = nAlt(col("__gt_kid")) - homVarP
    val u = hetP - t
    val counted = autosomal
      .withColumn("__t", t).withColumn("__u", u)
      .filter(col("__t") >= 0 && col("__u") >= 0 &&
        (col("__t") + col("__u")) > 0) // consistent + informative
    val perVariant = counted.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__t")).as("t"), sum(col("__u")).as("u"))
      .withColumn("chi_sq",
        pow(col("t") - col("u"), 2).cast("double") /
          (col("t") + col("u")).cast("double"))
      .withColumn("p_value",
        StatTests.chiSqTail(col("chi_sq"), lit(1.0)))
    Table(perVariant, keyCols, mt.globals)
  }

  /** concordance (reference `qc.py:360`): full-outer join of two matrix
    * tables in coordinate space; each cell classified into hail's 5
    * states (0 = no data, 1 = no call, 2 = hom ref, 3 = het,
    * 4 = hom var). Returns the (left_state, right_state, n) global
    * counts; per-sample/per-variant views are one groupBy away from
    * `concordanceCells`. */
  def concordanceCells(left: MatrixTable, right: MatrixTable): DataFrame = {
    val keyCols = left.rowKey ++ left.colKey
    val l = left.entriesTable.df
      .select((keyCols.map(col) :+ gtClass(col("GT")).as("__l")): _*)
    val r = right.entriesTable.df
      .select((keyCols.map(col) :+ gtClass(col("GT")).as("__r")): _*)
    l.join(r, keyCols, "full_outer")
      .withColumn("left_state", coalesce(col("__l"), lit(0)))
      .withColumn("right_state", coalesce(col("__r"), lit(0)))
      .drop("__l", "__r")
  }

  def concordance(left: MatrixTable, right: MatrixTable): DataFrame =
    concordanceCells(left, right)
      .groupBy(col("left_state"), col("right_state"))
      .agg(count(lit(1)).as("n"))

  /** KING-robust kinship (reference
    * `methods/relatedness/king.py:9`): for each sample pair over their
    * shared called sites,
    * phi = (N_AaAa - 2 N_opposing_hom) / (N_het_i + N_het_j).
    * Coordinate self-join on the variant key — one shuffle, cost linear
    * in (variants × sample pairs); the reference's BlockMatrix matmul is
    * the same arithmetic batched. */
  def king(mt: MatrixTable): DataFrame = {
    val e = mt.entriesTable.df
      .filter(col("GT").isNotNull)
      .select((mt.rowKey.map(col) :+ col("s") :+
        gtClass(col("GT")).as("__c")): _*)
    val l = e.select((mt.rowKey.map(col) :+ col("s").as("s_i") :+
      col("__c").as("__ci")): _*)
    val r = e.select((mt.rowKey.map(col) :+ col("s").as("s_j") :+
      col("__c").as("__cj")): _*)
    val pairs = l.join(r, mt.rowKey).filter(col("s_i") < col("s_j"))
    val ci = col("__ci"); val cj = col("__cj")
    pairs.groupBy(col("s_i"), col("s_j"))
      .agg(
        count(lit(1)).as("n_shared"),
        sum((ci === 3).cast("long")).as("n_het_i"),
        sum((cj === 3).cast("long")).as("n_het_j"),
        sum((ci === 3 && cj === 3).cast("long")).as("n_het_het"),
        sum(((ci === 2 && cj === 4) || (ci === 4 && cj === 2)).cast("long"))
          .as("n_opp_hom"))
      .withColumn("phi",
        when(col("n_het_i") + col("n_het_j") > 0,
          (col("n_het_het").cast("double") - col("n_opp_hom") * 2.0) /
            (col("n_het_i") + col("n_het_j")).cast("double")))
  }
}
