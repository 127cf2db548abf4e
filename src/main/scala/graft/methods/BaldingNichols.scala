package graft.methods

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.MatrixTable
import graft.functions.{Calls, Rand}

/** balding_nichols_model (reference `statgen.py:3984`,
  * `stats/BaldingNicholsModel.scala`): simulate a K-population
  * structured genotype matrix — per variant an ancestral frequency
  * p0 ~ U(afMin, afMax); per (variant, pop) a drifted frequency
  * p_k ~ Beta(p0 (1−F_k)/F_k, (1−p0)(1−F_k)/F_k); per (variant, sample)
  * a Binomial(2, p_{pop(sample)}) genotype.
  *
  * Spark shape: rows come from `spark.range(nVariants)` (no data
  * movement); every random draw is the counter-based seeded hash stream
  * (`Rand`) keyed by (variant, stream) — reproducible under any
  * partitioning, exactly the property the reference gets from its
  * threefry RNG. The Beta draw inverts the CDF at a hash uniform
  * (commons-math, per variant × pop — row space, off the entry hot
  * path); Bernoulli pairs give the binomial genotype as pure codegen'd
  * expressions. */
object BaldingNichols {

  private val betaInv = udf { (u: Double, a: Double, b: Double) =>
    new org.apache.commons.math3.distribution.BetaDistribution(a, b)
      .inverseCumulativeProbability(math.min(math.max(u, 1e-12), 1 - 1e-12))
  }

  def baldingNicholsModel(spark: org.apache.spark.sql.SparkSession,
      nPopulations: Int, nSamples: Int, nVariants: Int,
      popDist: Seq[Double] = Nil, fst: Seq[Double] = Nil,
      afMin: Double = 0.1, afMax: Double = 0.9,
      seed: Long = 0L): MatrixTable = {
    val pd =
      if (popDist.nonEmpty) popDist
      else Seq.fill(nPopulations)(1.0 / nPopulations)
    val fs = if (fst.nonEmpty) fst else Seq.fill(nPopulations)(0.1)
    require(pd.length == nPopulations && fs.length == nPopulations)
    // per-sample population assignment: driver-side seeded draw (cols are
    // the driver-size dimension), matching the reference's sample_pops
    val rng = new scala.util.Random(seed)
    val cum = pd.scanLeft(0.0)(_ + _).tail
    val pops = IndexedSeq.fill(nSamples) {
      val u = rng.nextDouble() * cum.last
      cum.indexWhere(u <= _) max 0
    }
    val rows = spark.range(nVariants.toLong).toDF("__v")
    val vkey = col("__v")
    val p0 = Rand.runifStream(seed, 0, vkey) * (afMax - afMin) + afMin
    val withAf = rows.withColumn("__p0", p0)
      .withColumn("__pk", array((0 until nPopulations).map { k =>
        val f = fs(k)
        if (f <= 0 || f >= 1) col("__p0") // F=0: no drift
        else betaInv(Rand.runifStream(seed, 1000 + k, vkey),
          col("__p0") * (1 - f) / f,
          (lit(1.0) - col("__p0")) * (1 - f) / f)
      }: _*))
    val entries = array((0 until nSamples).map { s =>
      val pk = element_at(col("__pk"), pops(s) + 1)
      val d = (Rand.runifStream(seed, 2 * s + 2, vkey) < pk).cast("int") +
        (Rand.runifStream(seed, 2 * s + 3, vkey) < pk).cast("int")
      struct(Calls.diploid(when(d === 2, 1).otherwise(0),
        when(d >= 1, 1).otherwise(0)).as("GT"))
    }: _*)
    val mtRows = withAf
      .withColumn("contig", lit("1"))
      .withColumn("position", (col("__v") + 1).cast("int"))
      .withColumn("ref", lit("A"))
      .withColumn("alt", array(lit("C")))
      .withColumn("ancestral_af", col("__p0"))
      .withColumn("af", col("__pk"))
      .withColumn(MatrixTable.EntriesField, entries)
      .drop("__v", "__p0", "__pk")
    MatrixTable(
      rows = mtRows,
      rowKey = Seq("contig", "position", "ref", "alt"),
      colValues = (0 until nSamples)
        .map(i => Row(s"sample_$i", pops(i))).toIndexedSeq,
      colSchema = StructType(Seq(
        StructField("s", StringType, false),
        StructField("pop", IntegerType, false))),
      colKey = Seq("s"),
      globals = Map("bn_n_populations" -> nPopulations,
        "bn_seed" -> seed))
  }
}
