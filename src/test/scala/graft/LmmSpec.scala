package graft

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.functions._
import graft.methods.{Lmm, Regression}
import graft.sources.Vcf

class LmmSpec extends SparkSpec {

  private def fixtureMt(): MatrixTable = Vcf.read(spark,
    "/root/repo/src/test/resources/oracle_sample.vcf")

  test("identity kinship collapses the LMM to OLS") {
    val mt = fixtureMt()
    val pheno = mt.colsTable.df
      .withColumn("y", substring(col("s"), 2, 10).cast("double"))
    val lmm = Lmm.linearMixedRegressionRows(mt, pheno, "y",
      kinship = Some(BDM.eye[Double](mt.nCols))).df
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    val ols = Regression.linearRegressionRows(mt, pheno, "y").df
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    assert(lmm.nonEmpty && lmm.keySet == ols.keySet)
    for ((k, lr) <- lmm) {
      val or = ols(k)
      assert(math.abs(lr.getAs[Double]("beta") -
        or.getAs[Double]("beta")) < 1e-7, s"$k beta")
      val t = or.getAs[Double]("t_stat")
      assert(math.abs(lr.getAs[Double]("chi_sq") - t * t) < 1e-6,
        s"$k chi_sq vs t^2")
    }
  }

  test("REML fit recovers a sensible h2 on simulated structured data") {
    val rng = new scala.util.Random(1)
    val n = 60
    // block kinship: two clans of 30 with within-clan correlation
    val kin = BDM.tabulate(n, n)((i, j) =>
      if (i == j) 1.0 else if (i / 30 == j / 30) 0.5 else 0.0)
    // y = clan effect (the g term) + noise
    val clanEff = Array.fill(2)(rng.nextGaussian() * 2.0)
    val y = BDV.tabulate(n)(i => clanEff(i / 30) + rng.nextGaussian())
    val x = BDM.ones[Double](n, 1)
    val f = Lmm.fit(kin, y, x)
    assert(f.h2 > 0.05 && f.h2 < 1.0, s"h2=${f.h2}")
    assert(f.logReml.isFinite && f.sigmaG2 > 0)
    // null-structure phenotype drives h2 toward 0 (large delta)
    val yFlat = BDV.tabulate(n)(_ => rng.nextGaussian())
    val f0 = Lmm.fit(kin, yFlat, x)
    assert(f0.h2 < f.h2)
  }

  test("default kinship path (GRM) runs end to end") {
    val mt = fixtureMt()
    val pheno = mt.colsTable.df
      .withColumn("y", substring(col("s"), 2, 10).cast("double"))
    val out = Lmm.linearMixedRegressionRows(mt, pheno, "y").df.collect()
    assert(out.length == mt.rows.count())
    assert(out.exists(r => !r.isNullAt(r.fieldIndex("p_value"))))
  }
}
