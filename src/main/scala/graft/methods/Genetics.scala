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

  /** identity_by_descent (reference `is/hail/methods/IBD.scala`,
    * implementing PLINK's method-of-moments estimators): per sample pair,
    * IBS0/1/2 counts over shared called biallelic sites plus the PLINK
    * expected-IBS coefficients (small-sample-corrected, computed per
    * variant from the REF allele frequency and averaged over non-missing
    * variants), solved for Z0/Z1/Z2 and PI_HAT = Z1/2 + Z2. `bounded`
    * clamps the estimates into the simplex (PLINK's default).
    *
    * Spark shape: coefficients are one narrow row-space pass + a scalar
    * aggregate; IBS counts are a coordinate self-join on the variant key
    * (one shuffle, linear in variants × pairs). */
  def identityByDescent(mt: MatrixTable, bounded: Boolean = true)
      : DataFrame = {
    // per-variant PLINK expectation coefficients from ref-allele counts
    val cs = Qc.callStatsFold(col(MatrixTable.EntriesField),
      size(col("alt")) + 1)
    val withCoef = mt.rows
      .filter(size(col("alt")) === 1)
      .withColumn("__cs", cs)
      .withColumn("__x", element_at(col("__cs")("ac"), 1).cast("double"))
      .withColumn("__y", element_at(col("__cs")("ac"), 2).cast("double"))
      .withColumn("__na", col("__x") + col("__y"))
    val x = col("__x"); val y = col("__y"); val na = col("__na")
    val p = x / na; val q = y / na
    val corr3 = (na / (na - 1)) * (na / (na - 2)) * (na / (na - 3))
    val corr2 = (na / (na - 1)) * (na / (na - 2))
    val ok = x > 0 && y > 0 && na > 3
    val a00 = when(ok,
      lit(2) * p * p * q * q * ((x - 1) / x) * ((y - 1) / y) * corr3)
    val a10 = when(ok,
      lit(4) * p * p * p * q * ((x - 1) / x) * ((x - 2) / x) * corr3 +
      lit(4) * p * q * q * q * ((y - 1) / y) * ((y - 2) / y) * corr3)
    val a20 = when(ok,
      q * q * q * q * ((y - 1) / y) * ((y - 2) / y) * ((y - 3) / y) * corr3 +
      p * p * p * p * ((x - 1) / x) * ((x - 2) / x) * ((x - 3) / x) * corr3 +
      lit(4) * p * p * q * q * ((x - 1) / x) * ((y - 1) / y) * corr3)
    val a11 = when(ok,
      lit(2) * p * p * q * ((x - 1) / x) * corr2 +
      lit(2) * p * q * q * ((y - 1) / y) * corr2)
    val a21 = when(ok,
      p * p * p * ((x - 1) / x) * ((x - 2) / x) * corr2 +
      q * q * q * ((y - 1) / y) * ((y - 2) / y) * corr2 +
      p * p * q * ((x - 1) / x) * corr2 +
      p * q * q * ((y - 1) / y) * corr2)
    val coefMeans = withCoef
      .select(a00.as("a00"), a10.as("a10"), a20.as("a20"),
        a11.as("a11"), a21.as("a21"))
      .agg(avg(col("a00")).as("e00"), avg(col("a10")).as("e10"),
        avg(col("a20")).as("e20"), avg(col("a11")).as("e11"),
        avg(col("a21")).as("e21"))
      .head()
    val (e00m, e10m, e20m, e11m, e21m) = (coefMeans.getDouble(0),
      coefMeans.getDouble(1), coefMeans.getDouble(2),
      coefMeans.getDouble(3), coefMeans.getDouble(4))
    // pairwise IBS counts (biallelic: IBS = 2 - |dose_i - dose_j|)
    val e = mt.copy(rows = mt.rows.filter(size(col("alt")) === 1))
      .entriesTable.df
      .filter(col("GT").isNotNull && Calls.ploidy(col("GT")) === 2)
      .select((mt.rowKey.map(col) :+ col("s") :+
        Calls.nNonRefAlleles(col("GT")).as("__d")): _*)
    val l = e.select((mt.rowKey.map(col) :+ col("s").as("s_i") :+
      col("__d").as("__di")): _*)
    val r = e.select((mt.rowKey.map(col) :+ col("s").as("s_j") :+
      col("__d").as("__dj")): _*)
    val ibs = lit(2) - abs(col("__di") - col("__dj"))
    val counts = l.join(r, mt.rowKey).filter(col("s_i") < col("s_j"))
      .groupBy(col("s_i"), col("s_j"))
      .agg(
        count(when(ibs === 0, 1)).as("ibs0"),
        count(when(ibs === 1, 1)).as("ibs1"),
        count(when(ibs === 2, 1)).as("ibs2"))
    val n = (col("ibs0") + col("ibs1") + col("ibs2")).cast("double")
    val z0r = col("ibs0") / (lit(e00m) * n)
    val z1r = (col("ibs1") - z0r * lit(e10m) * n) / (lit(e11m) * n)
    val z2r = (col("ibs2") - z0r * lit(e20m) * n - z1r * lit(e21m) * n) / n
    val withRaw = counts
      .withColumn("__z0", z0r).withColumn("__z1", z1r)
      .withColumn("__z2", z2r)
    val (bz0, bz1, bz2) =
      if (!bounded) (col("__z0"), col("__z1"), col("__z2"))
      else {
        val z0 = col("__z0"); val z1 = col("__z1"); val z2 = col("__z2")
        val c0 = when(z0 > 1, 1.0).when(z1 > 1 || z2 > 1, 0.0)
          .when(z0 < 0, 0.0)
          .when(z1 < 0, z0 / (z0 + z2)).when(z2 < 0, z0 / (z0 + z1))
          .otherwise(z0)
        val c1 = when(z0 > 1 || z2 > 1, 0.0).when(z1 > 1, 1.0)
          .when(z0 < 0, z1 / (z1 + z2)).when(z1 < 0, 0.0)
          .when(z2 < 0, z1 / (z0 + z1)).otherwise(z1)
        val c2 = when(z0 > 1 || z1 > 1, 0.0).when(z2 > 1, 1.0)
          .when(z0 < 0, z2 / (z1 + z2)).when(z1 < 0, z2 / (z0 + z2))
          .when(z2 < 0, 0.0).otherwise(z2)
        (c0, c1, c2)
      }
    withRaw
      .withColumn("Z0", bz0).withColumn("Z1", bz1).withColumn("Z2", bz2)
      .withColumn("PI_HAT", col("Z1") / 2 + col("Z2"))
      .drop("__z0", "__z1", "__z2")
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
