package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Sampling

class SamplingSpec extends SparkSpec {

  private def corpus(n: Int) = {
    val rows = (0 until n).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "de", s"text $i"))
    spark.createDataFrame(rows).toDF("doc_id", "lang", "text")
  }

  test("stratifiedSample: deterministic, rate-proportional, salt-sensitive") {
    val df = corpus(2000)
    val rates = Map("en" -> 700, "de" -> 200)
    val s1 = Sampling.stratifiedSample(df, "doc_id", "lang", rates)
    val s2 = Sampling.stratifiedSample(df, "doc_id", "lang", rates)
    val got1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got1 === s2.select("doc_id").collect().map(_.getLong(0)).toSet,
      "same salt must reproduce the same membership")
    val byLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 docs per lang; binomial(1000, rate) stays well within ±80
    assert(math.abs(byLang("en") - 700L) < 80, s"en ${byLang("en")}")
    assert(math.abs(byLang("de") - 200L) < 80, s"de ${byLang("de")}")
    val other = Sampling.stratifiedSample(df, "doc_id", "lang", rates,
      salt = "mix2").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other !== got1, "a different salt must draw a different sample")
    // unknown stratum defaults to 0: no leakage
    val none = Sampling.stratifiedSample(df, "doc_id", "lang",
      Map("fr" -> 1000)).count()
    assert(none === 0L)
  }

  test("packSequences: contiguous concat-and-chunk window assignment") {
    import org.apache.spark.sql.functions.{col, lit}
    // doc token counts 300, 300, 300 with window 512:
    // doc 0 -> [0, 300)   start w0 end w0 offset 0
    // doc 1 -> [300, 600) start w0 end w1 offset 300 (straddles)
    // doc 2 -> [600, 900) start w1 end w1 offset 88
    val df = spark.createDataFrame(Seq(
      (0L, 300L), (1L, 300L), (2L, 300L))).toDF("doc_id", "n")
    val got = Sampling.packSequences(df, "doc_id", col("n"), 512)
      .orderBy("doc_id")
      .select("doc_id", "window_start", "window_end", "window_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq((0L, 0L, 0L, 0L), (1L, 0L, 1L, 300L),
      (2L, 1L, 1L, 88L)))
    // empty doc clamps to its start window
    val empty = Sampling.packSequences(
      spark.createDataFrame(Seq((0L, 512L), (1L, 0L), (2L, 5L)))
        .toDF("doc_id", "n"), "doc_id", col("n"), 512)
      .orderBy("doc_id")
      .select("window_start", "window_end").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(empty === Seq((0L, 0L), (1L, 1L), (1L, 1L)))
  }

  test("membership and ranks are partitioning-invariant") {
    import org.apache.spark.sql.functions.col
    val df = corpus(1500)
    val re = df.repartition(7)
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(
      ids(Sampling.stratifiedSample(df, "doc_id", "lang",
        Map("en" -> 400, "de" -> 300))) ===
      ids(Sampling.stratifiedSample(re, "doc_id", "lang",
        Map("en" -> 400, "de" -> 300))))
    def splits(d: org.apache.spark.sql.DataFrame) =
      Sampling.assignSplit(d, "doc_id",
        Seq("train" -> 980, "val" -> 10, "test" -> 10))
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(splits(df) === splits(re))
    def ranks(d: org.apache.spark.sql.DataFrame) =
      Sampling.shuffleRank(d, "doc_id")
        .select("doc_id", "shuffle_rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r1 = ranks(df)
    assert(r1 === ranks(re))
    // ranks form an exact permutation of 1..n
    assert(r1.values.toSeq.sorted === (1L to 1500L))
  }

  test("repeatByWeight: floor copies + deterministic fractional copy") {
    val df = corpus(1000)
    val out = Sampling.repeatByWeight(df, "doc_id", "lang",
      Map("en" -> 230, "de" -> 0))
    val rows = out.select("doc_id", "lang", "rep").collect()
    assert(!rows.exists(_.getString(1) == "de"), "weight 0 drops the stratum")
    val perDoc = rows.filter(_.getString(1) == "en")
      .groupBy(_.getLong(0)).map { case (_, rs) =>
        rs.map(_.getLong(2)).sorted.toSeq }
    // every en doc appears 2 or 3 times with dense rep indices
    assert(perDoc.forall(r => r == Seq(0L, 1L) || r == Seq(0L, 1L, 2L)))
    val total = rows.count(_.getString(1) == "en")
    assert(math.abs(total - 1150) < 60, s"total $total vs expected ~1150")
  }

  test("tripletMine: negatives exclude the anchor and its pair partners") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(0, 40).toDF("doc_id")
    val pairs = spark.createDataFrame(Seq(
      (1L, 2L), (1L, 3L), (5L, 6L))).toDF("id_a", "id_b")
    val got = graft.pipeline.Sampling.tripletMine(pairs, docs, "doc_id",
      nNeg = 3, poolMod = 1) // pool = everything: exclusion is the test
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // every pair row mines exactly nNeg triplets
    assert(got.length === 9)
    got.foreach { case (a, p, n, rk) =>
      assert(n != a && n != p, s"negative $n collides for ($a,$p)")
      assert(rk >= 1 && rk <= 3)
      // partner of the SAME anchor is never a negative (adjacency)
      if (a == 1L) assert(n != 2L && n != 3L)
    }
    // determinism: same inputs, same triplets
    val again = graft.pipeline.Sampling.tripletMine(pairs, docs,
      "doc_id", nNeg = 3, poolMod = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSet === again.toSet)
  }

  test("lengthBucketBatches: bucket edges, in-bucket rank, batch split") {
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(Seq(
      (1L, 10L), (2L, 39L), (3L, 40L), (4L, 59L), (5L, 60L),
      (6L, 80L), (7L, 45L), (8L, 41L)
    )).toDF("id", "n").repartition(3)
    val got = graft.pipeline.Sampling.lengthBucketBatches(
      df, "id", col("n"), bounds = Seq(40L, 60L, 80L), batchSize = 2)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("bucket"), r.getAs[Long]("rank_in_bucket"),
          r.getAs[Long]("batch_id")))).toMap
    assert(got(1L) === ((0L, 0L, 0L)))
    assert(got(2L) === ((0L, 1L, 0L)))  // 39 < 40 stays in bucket 0
    assert(got(3L) === ((1L, 0L, 0L)))  // boundary value opens bucket 1
    assert(got(4L) === ((1L, 1L, 0L)))  // rank follows id order
    assert(got(7L) === ((1L, 2L, 1L)))  // third of bucket 1 -> batch 1
    assert(got(8L) === ((1L, 3L, 1L)))
    assert(got(5L) === ((2L, 0L, 0L)))
    assert(got(6L) === ((3L, 0L, 0L)))
  }

  test("weightedSample: without replacement, weight-proportional, deterministic") {
    val rows = (0L until 1000L).map(i =>
      (i, if (i < 100) 1000.0 else 1.0))
    val df = spark.createDataFrame(rows).toDF("id", "w").repartition(4)
    val got = Sampling.weightedSample(df, "id", col("w"), k = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length === 50)
    assert(got.map(_._1).distinct.length === 50, "without replacement")
    // 100 rows carry 1000x the weight of the other 900: the sample
    // must be dominated by them (E[heavy] ≈ 47/50 under A-ES)
    val heavy = got.count(_._1 < 100L)
    assert(heavy >= 35, s"only $heavy/50 heavy rows sampled")
    // keys descend; determinism
    val keys = got.map(_._3).toSeq
    assert(keys === keys.sorted.reverse)
    assert(Sampling.weightedSample(df, "id", col("w"), k = 50)
      .collect().map(_.getLong(0)).toSeq === got.map(_._1).toSeq)
    // zero/negative weights are never selected
    val z = Sampling.weightedSample(
      df.withColumn("w", when(col("id") < 990L, lit(0.0))
        .otherwise(lit(-1.0))), "id", col("w"), k = 5).count()
    assert(z === 0L)
  }

  test("powUnits(alpha=0.5): Newton-corrected isqrt grid is exact vs a BigDecimal model") {
    // the engine value must equal round_half_up(sqrt(n) * 1e6) computed
    // at 60-digit precision — for every n, including perfect squares
    // and their neighbours (where the double-sqrt seed is most likely
    // to land on the wrong side of the grid line)
    val squares = (1L to 2000L).flatMap(i => Seq(i * i - 1, i * i, i * i + 1))
    val rnd = new scala.util.Random(13)
    val big = (1 to 300).map(_ => 1L + (rnd.nextLong(4000000000000L)))
    val ns = ((1L to 3000L) ++ squares ++ big).distinct.filter(_ > 0)
    val df = spark.createDataFrame(ns.map(Tuple1(_))).toDF("__n")
    val got = Sampling.powUnits(df, 0.5)
      .select(col("__n"), col("__pu").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mc = new java.math.MathContext(60)
    ns.foreach { n =>
      val exact = new java.math.BigDecimal(n).sqrt(mc)
        .movePointRight(6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      assert(got(n) === exact, s"n=$n")
    }
  }

  test("powUnits(rational alpha): exact q-th-root grid; irrational " +
      "alpha refuses the exact contract") {
    import java.math.BigInteger
    // every finitely-typed alpha routes through the BigInteger q-th
    // root: verify the DEFINING half-up inequality directly —
    // pu = half_up(n^(p/q)·1e6) iff (2pu−1)^q <= n^p·(2e6)^q < (2pu+1)^q
    // — an independent model, no shared code with the implementation
    val cases = Seq(0.7 -> (7, 10), 0.25 -> (1, 4), 0.75 -> (3, 4),
      (1.0 / 3.0) -> (1, 3), 0.6 -> (3, 5))
    val rnd = new scala.util.Random(29)
    val ns = ((1L to 400L) ++
      (1 to 60).map(_ => 1L + rnd.nextLong(100000000000L))).distinct
    val df = spark.createDataFrame(ns.map(Tuple1(_))).toDF("__n")
    cases.foreach { case (alpha, (p, q)) =>
      assert(Sampling.asRational(alpha) === Some((p.toLong, q.toLong)),
        s"alpha=$alpha")
      val got = Sampling.powUnits(df, alpha)
        .select(col("__n"), col("__pu").cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val scaleQ = BigInteger.valueOf(2000000L).pow(q)
      ns.foreach { n =>
        val twoY = BigInteger.valueOf(n).pow(p).multiply(scaleQ)
        val pu = BigInteger.valueOf(got(n))
        val lo = pu.shiftLeft(1).subtract(BigInteger.ONE).pow(q)
        val hi = pu.shiftLeft(1).add(BigInteger.ONE).pow(q)
        assert(lo.compareTo(twoY) <= 0 && twoY.compareTo(hi) < 0,
          s"alpha=$alpha n=$n pu=${got(n)}")
      }
    }
    // pi/4 encodes no rational with q <= 1e6 inside 4 ulps: the exact
    // path must REFUSE (never silently fall back to a libm double)...
    val err = intercept[IllegalArgumentException] {
      Sampling.powUnits(df, 0.7853981633974483)
    }
    assert(err.getMessage.contains("temperatureSampleEstimator"))
    // ...while the explicitly estimator-named surface carries it
    val rows = (0L until 400L).map(i =>
      (i, if (i < 300) "big" else "small"))
    val sdf = spark.createDataFrame(rows).toDF("id", "s")
    val est = Sampling.temperatureSampleEstimator(sdf, "id", "s",
      k = 100, alpha = 0.7853981633974483)
    assert(est.count() > 0)
  }

  test("asRational: total function contract on random + adversarial " +
      "doubles (round-15 overflow bail)") {
    // Contract: for ANY alpha in (0,1], the result is None or a
    // genuine reduced-denominator reconstruction — (p, q) with
    // 0 < q <= 1e6 and |p/q - alpha| <= 4 ulps. The round-15 bail
    // (a partial quotient > maxDen returns None before the convergent
    // multiply) makes Long overflow unreachable; this property pins
    // that no input produces a garbage Some or an exception, incl.
    // near-cutoff fractional parts the old loop continued through.
    val rnd = new scala.util.Random(31)
    val adversarial = Seq(
      1.0 / 3.0, 2.0 / 3.0, 1.0 / 7.0, 355.0 / 113.0 / 4.0,
      0.3141582 + 1e-12, 0.123456789, 1e-9, 1 - 1e-9,
      math.nextUp(0.5), math.nextDown(0.5), 31415.0 / 99991.0 + 1e-12,
      1.0 / 44.0 + 1e-13, 5.0 / 23.0 + 3e-16)
    val grid = (1 to 200).map(_ => (1 + rnd.nextInt(999999)).toDouble /
      1000000) :+ 123456.0 / 1000000
    val alphas = adversarial ++ (1 to 2000).map(_ => rnd.nextDouble())
    (alphas ++ grid).filter(a => a > 0 && a <= 1).foreach { a =>
      Sampling.asRational(a) match {
        case Some((p, q)) =>
          assert(q > 0 && q <= 1000000L && p > 0, s"alpha=$a -> ($p,$q)")
          assert(math.abs(p.toDouble / q.toDouble - a) <=
            4 * math.ulp(a), s"alpha=$a -> ($p,$q)")
        case None => // refusal is always allowed for NON-grid alphas
      }
    }
    // …but the 1e6-grid doubles must ALL reconstruct (each is within
    // half an ulp of its rational, whose reduced q <= 1e6 and whose
    // continued fraction has every partial quotient <= its own
    // denominator — the convergent is reached before any bail)
    grid.foreach { a =>
      assert(Sampling.asRational(a).nonEmpty, s"grid alpha=$a -> None")
    }
  }

  test("temperature ppt: integer half-up division matches a BigInteger model") {
    // ppt = (2000·k·pu + z·n) div (2·z·n) must equal
    // round_half_up(1000·k·pu / (z·n)) for magnitudes up to the
    // documented bounds (k ≤ 1e15, pu ≤ 1e15, z ≤ 1e19) — pin the
    // Spark decimal expression against exact BigInteger arithmetic
    val rnd = new scala.util.Random(29)
    val cases = (1 to 200).map { _ =>
      val n = 1L + rnd.nextLong(1000000000000L)
      val pu = 1L + rnd.nextLong(1000000000000000L)
      val z = pu + rnd.nextLong(1000000000000000L)
      val k = 1L + rnd.nextLong(1000000000000000L)
      (n, pu, z, k)
    }
    val df = spark.createDataFrame(cases).toDF("__n", "__pu", "__z", "__k")
    val got = df.select(col("__n"), col("__pu"), col("__z"), col("__k"),
      expr("(CAST(2000 AS DECIMAL(4,0)) * CAST(__k AS DECIMAL(16,0))" +
        " * CAST(__pu AS DECIMAL(17,0))" +
        " + CAST(__z AS DECIMAL(19,0)) * CAST(__n AS DECIMAL(18,0)))" +
        " div (2 * CAST(__z AS DECIMAL(19,0))" +
        " * CAST(__n AS DECIMAL(18,0)))").as("ppt")).collect()
    got.foreach { r =>
      val (n, pu, z, k) =
        (BigInt(r.getLong(0)), BigInt(r.getLong(1)),
          BigInt(r.getLong(2)), BigInt(r.getLong(3)))
      val expect = (2000 * k * pu + z * n) / (2 * z * n)
      assert(BigInt(r.getLong(4)) === expect,
        s"n=$n pu=$pu z=$z k=$k")
    }
  }

  test("temperatureSampleBudgetDiv equals temperatureSample at k = total div d") {
    val df = corpus(3000)
    val a = Sampling.temperatureSample(df, "doc_id", "lang",
      k = 300, alpha = 0.5).collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.temperatureSampleBudgetDiv(df, "doc_id", "lang",
      budgetDiv = 10, alpha = 0.5).collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("temperatureSample: alpha flattens head strata toward the tail; deterministic") {
    // head stratum 10x the tail: natural sampling (alpha=1) keeps the
    // 10:1 ratio; alpha=0.5 targets sqrt(10):1 ≈ 3.2, so the tail's
    // absolute cut must RISE at the same budget
    val rows = (0L until 1100L).map(i =>
      (i, if (i < 1000) "big" else "small"))
    val df = spark.createDataFrame(rows).toDF("id", "s").repartition(4)
    def byStratum(alpha: Double) =
      Sampling.temperatureSample(df, "id", "s", k = 300, alpha = alpha)
        .groupBy("s").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nat = byStratum(1.0)   // ppt 273 for BOTH strata: ~10:1 rows
    val flat = byStratum(0.5)  // ppt big 228, small 721
    assert(nat("big") > 4 * nat("small"))
    assert(flat("small") > nat("small"))
    assert(flat("big") < nat("big"))
    // same salt -> same membership
    val a = Sampling.temperatureSample(df, "id", "s", 300, 0.5)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.temperatureSample(df, "id", "s", 300, 0.5)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("weightedSample: scale-invariant — heavy raw weights don't collapse the key grid") {
    // pre-fix, ln(u)/w rounded at 6 ABSOLUTE decimals: for w >= ~1.45e7
    // every key rounds to 0.000000 and selection degenerates to
    // ascending id. Selection ∝ w is invariant under a positive scalar
    // on all weights, so the sample at w*1e7 must EQUAL the sample at w.
    val rows = (0L until 1000L).map(i =>
      (i, if (i < 100) 1000.0 else 1.0))
    val df = spark.createDataFrame(rows).toDF("id", "w").repartition(4)
    val base = Sampling.weightedSample(df, "id", col("w"), k = 50)
      .collect().map(_.getLong(0)).toSeq
    val scaled = Sampling.weightedSample(
      df.withColumn("w", col("w") * 1.0e7), "id", col("w"), k = 50)
      .collect().map(_.getLong(0)).toSeq
    assert(scaled === base, "sample must be invariant to weight scaling")
    assert(scaled !== (0L until 50L).toSeq, "not lowest-id degenerate")
  }

  test("dsirSelect: target-like docs outweigh off-target docs") {
    // two disjoint vocabularies: target docs speak "alpha beta gamma",
    // off-target docs speak "zeta eta theta"; two probe docs (never in
    // the target) speak one vocabulary each — DSIR must weight the
    // target-vocabulary probe above the off-target-vocabulary probe
    val rows =
      (0 until 20).map(i => (i.toLong, true, "alpha beta gamma delta")) ++
      (100 until 120).map(i => (i.toLong, false, "zeta eta theta iota")) ++
      Seq((200L, false, "alpha beta gamma delta"),
          (201L, false, "zeta eta theta iota"))
    val df = spark.createDataFrame(rows).toDF("doc_id", "t", "text")
      .repartition(4)
    val got = Sampling.dsirSelect(df, "doc_id", "text", col("t"),
      k = 42, numBuckets = 256)
    val byId = got.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(200L) > byId(201L),
      s"target-vocab probe ${byId(200L)} must outweigh ${byId(201L)}")
    assert(byId(200L) > 0 && byId(201L) < 0,
      s"log-ratios must split by vocabulary: $byId")
    // all 20 target-vocab docs share one weight; same for off-target
    assert((0 until 20).map(i => byId(i.toLong)).distinct.size === 1)
    // deterministic: the Gumbel draw replays exactly
    val again = Sampling.dsirSelect(df, "doc_id", "text", col("t"),
      k = 42, numBuckets = 256).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(again.toSeq === got.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq)
    // sel_key ordering is descending with id tiebreak
    val keys = again.map(_._3).toSeq
    assert(keys === keys.sorted.reverse)
  }
}
