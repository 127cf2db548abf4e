package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.functions.{Calls, Intervals, Loci, TextKernels}

/** Randomized law tests: each law evaluates the Spark kernel over a
  * few hundred generated inputs in ONE job and compares against an
  * independent naive Scala model written here (not a second Spark
  * formulation — the model is the spec). Generation is scalacheck with
  * a fixed seed, so failures reproduce. */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate((rng.Seed(seed), Option.empty[A])) { case (s, _) =>
      (s.next, g.apply(params, s))
    }.map(_._2).flatten.take(n).toSeq
  }

  // ---- minRep -------------------------------------------------------------

  /** The reference semantics (`is/hail/variant/package` min_rep): trim
    * the longest shared suffix keeping >=1 base, then the longest
    * shared prefix keeping >=1 base, advancing pos by the prefix. */
  private def naiveMinRep(pos: Int, ref: String, alt: String)
      : (Int, String, String) = {
    var suf = 0
    while (suf < math.min(ref.length, alt.length) - 1 &&
        ref(ref.length - 1 - suf) == alt(alt.length - 1 - suf)) suf += 1
    val r1 = ref.substring(0, ref.length - suf)
    val a1 = alt.substring(0, alt.length - suf)
    var pre = 0
    while (pre < math.min(r1.length, a1.length) - 1 &&
        r1(pre) == a1(pre)) pre += 1
    (pos + pre, r1.substring(pre), a1.substring(pre))
  }

  test("minRep matches the naive model and is idempotent (random alleles)") {
    val base = Gen.oneOf("A", "C", "G", "T")
    val seqG = for {
      n <- Gen.choose(1, 6)
      s <- Gen.listOfN(n, base)
    } yield s.mkString
    // bias toward shared prefixes/suffixes: wrap both alleles in a
    // common context so trimming actually triggers
    val g = for {
      ctxL <- seqG; ctxR <- seqG; r <- seqG; a <- seqG
      pos <- Gen.choose(1, 1000000)
    } yield (pos, ctxL + r + ctxR, ctxL + a + ctxR)
    val cases = samples(g, 300, seed = 7L)
    val df = spark.createDataFrame(cases).toDF("pos", "ref", "alt")
    val got = df.select(
        col("pos"), col("ref"), col("alt"),
        Loci.minRep(col("pos"), col("ref"), col("alt")).as("mr"))
      .collect()
    got.foreach { row =>
      val (pos, ref, alt) =
        (row.getInt(0), row.getString(1), row.getString(2))
      val mr = row.getStruct(3)
      val exp = naiveMinRep(pos, ref, alt)
      assert((mr.getInt(0), mr.getString(1), mr.getString(2)) === exp,
        s"minRep($pos, $ref, $alt)")
      // idempotence
      assert(naiveMinRep(exp._1, exp._2, exp._3) === exp,
        s"minRep not a fixpoint on ($pos, $ref, $alt)")
    }
  }

  // ---- packed calls -------------------------------------------------------

  test("diploid call packing laws (exhaustive alleles 0..7, both phasings)") {
    val cases = for {
      a1 <- 0 to 7; a2 <- 0 to 7; ph <- Seq(false, true)
    } yield (a1, a2, ph)
    val df = spark.createDataFrame(cases).toDF("a1", "a2", "ph")
      .withColumn("c", Calls.diploid(col("a1"), col("a2"), col("ph")))
    val got = df.select(
        col("a1"), col("a2"), col("ph"),
        Calls.allele1(col("c")), Calls.allele2(col("c")),
        Calls.isPhased(col("c")), Calls.ploidy(col("c")),
        Calls.isHet(col("c")), Calls.nNonRefAlleles(col("c")),
        Calls.unphasedDiploidGtIndex(col("c")))
      .collect()
    got.foreach { r =>
      val (a1, a2, ph) = (r.getInt(0), r.getInt(1), r.getBoolean(2))
      assert(r.getInt(3) === a1, s"allele1($a1|$a2)")
      assert(r.getInt(4) === a2, s"allele2($a1|$a2)")
      assert(r.getBoolean(5) === ph, s"isPhased($a1|$a2|$ph)")
      assert(r.getInt(6) === 2)
      assert(r.getBoolean(7) === (a1 != a2), s"isHet($a1|$a2)")
      assert(r.getInt(8) === Seq(a1, a2).count(_ != 0))
      val (lo, hi) = (math.min(a1, a2), math.max(a1, a2))
      assert(r.getInt(9) === hi * (hi + 1) / 2 + lo, s"gtIndex($a1|$a2)")
    }
  }

  // ---- intervals ----------------------------------------------------------

  test("interval overlaps/contains laws (random endpoints)") {
    val g = for {
      s1 <- Gen.choose(0, 50); l1 <- Gen.choose(1, 30)
      s2 <- Gen.choose(0, 50); l2 <- Gen.choose(1, 30)
      p <- Gen.choose(0, 90)
    } yield (s1, s1 + l1, s2, s2 + l2, p)
    val cases = samples(g, 300, seed = 11L)
    val df = spark.createDataFrame(cases).toDF("s1", "e1", "s2", "e2", "p")
      .withColumn("i1", Intervals.interval(col("s1"), col("e1")))
      .withColumn("i2", Intervals.interval(col("s2"), col("e2")))
    val got = df.select(
        col("s1"), col("e1"), col("s2"), col("e2"), col("p"),
        Intervals.overlaps(col("i1"), col("i2")),
        Intervals.contains(col("i1"), col("p")))
      .collect()
    got.foreach { r =>
      val (s1, e1, s2, e2, p) =
        (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      // half-open [start, end): overlap iff each starts before the
      // other ends
      assert(r.getBoolean(5) === (s1 < e2 && s2 < e1),
        s"overlaps([$s1,$e1), [$s2,$e2))")
      assert(r.getBoolean(6) === (p >= s1 && p < e1),
        s"contains([$s1,$e1), $p)")
    }
  }

  // ---- minhash signature kernel ------------------------------------------

  /** Independent md5 model: unsigned big-endian 32-bit chunks of
    * md5(shingle + "|j"), minimum per hash index over the shingle set —
    * the contract the DuckDB oracle reproduces. */
  private def naiveMd5Sigs(shingles: Seq[String], numHashes: Int)
      : Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val minima = Array.fill(numHashes)(Long.MaxValue)
    shingles.foreach { sh =>
      var j = 0
      while (j * 4 < numHashes) {
        md.reset()
        val dig = md.digest(
          (sh + "|" + j).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var k = 0
        while (k < 4 && j * 4 + k < numHashes) {
          val off = k * 4
          val v = ((dig(off) & 0xffL) << 24) | ((dig(off + 1) & 0xffL) << 16) |
            ((dig(off + 2) & 0xffL) << 8) | (dig(off + 3) & 0xffL)
          val i = j * 4 + k
          if (v < minima(i)) minima(i) = v
          k += 1
        }
        j += 1
      }
    }
    minima.toSeq
  }

  // ---- VCF write/read roundtrip ------------------------------------------

  test("VCF roundtrip law: write(read(v)) re-reads identically (random VCFs)") {
    val base = Gen.oneOf("A", "C", "G", "T")
    val allele = for {
      n <- Gen.frequency(4 -> Gen.const(1), 1 -> Gen.choose(2, 4))
      s <- Gen.listOfN(n, base)
    } yield s.mkString
    val gtG: Gen[String] = for {
      nAlt <- Gen.const(2) // up to 2 alts; allele indices 0..2
      a1 <- Gen.choose(0, nAlt)
      a2 <- Gen.choose(0, nAlt)
      sep <- Gen.oneOf("/", "|")
      missing <- Gen.frequency(5 -> Gen.const(false), 1 -> Gen.const(true))
    } yield if (missing) "./." else s"$a1$sep$a2"
    val rowG = for {
      ref <- allele
      alt1 <- allele.suchThat(_ != ref)
      alt2 <- allele.suchThat(a => a != ref && a != alt1)
      gts <- Gen.listOfN(3, gtG)
      dps <- Gen.listOfN(3, Gen.choose(1, 99))
    } yield (ref, s"$alt1,$alt2", gts, dps)
    val rows = samples(rowG, 25, seed = 17L)
    val body = rows.zipWithIndex.map { case ((ref, alts, gts, dps), i) =>
      val cells = gts.zip(dps).map { case (g, d) => s"$g:$d" }
      (Seq(s"chr${1 + i % 2}", s"${100 + i * 37}", ".", ref, alts, "50",
        "PASS", s"DP=${dps.sum}", "GT:DP") ++ cells).mkString("\t")
    }.mkString("\n")
    val header =
      """##fileformat=VCFv4.2
        |##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
        |##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Depth">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	P1	P2	P3""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft_vcf_prop")
    java.nio.file.Files.writeString(dir.resolve("in.vcf"),
      header + "\n" + body + "\n")
    val mt1 = sources.Vcf.read(spark, s"$dir/in.vcf")
    sources.Vcf.write(mt1, s"$dir/out")
    // reassemble the written header+parts into one importable file
    val h = java.nio.file.Files.readString(dir.resolve("out/header.vcf"))
    val parts = java.nio.file.Files.list(dir.resolve("out/parts"))
      .toArray.map(_.toString).filter(_.endsWith(".txt")).sorted
      .map(p => java.nio.file.Files.readString(
        java.nio.file.Paths.get(p))).mkString
    java.nio.file.Files.writeString(dir.resolve("rt.vcf"), h + parts)
    val mt2 = sources.Vcf.read(spark, s"$dir/rt.vcf")
    def dump(mt: MatrixTable) = mt.entriesTable.df
      .select(col("contig"), col("position"), col("ref"),
        concat_ws(",", col("alt")).as("alts"), col("s"),
        col("GT"), col("DP"))
      .collect().map(_.toSeq).toSet
    assert(mt2.colValues === mt1.colValues)
    assert(dump(mt2) === dump(mt1))
  }

  test("native encode/decode round-trips random nested values") {
    import graft.sources.{HailNative, HailNativeWrite}
    import HailNative._
    // random virtual types (depth-bounded) + random values of those
    // types, through the writer's canonical encoding and the reader's
    // independent decoder — missing bits, varint lengths, dict
    // ordering, framing all exercised byte-level (no Spark jobs)
    def vGen(depth: Int): Gen[VType] = {
      val leaf = Gen.oneOf(VBool, VInt32, VInt64, VFloat32, VFloat64,
        VString)
      if (depth <= 0) leaf
      else Gen.frequency(
        4 -> leaf,
        2 -> vGen(depth - 1).map(VArray),
        1 -> (for {
          n <- Gen.choose(1, 3)
          ts <- Gen.listOfN(n, vGen(depth - 1))
        } yield VStruct(ts.zipWithIndex.map { case (t, i) =>
          s"f$i" -> t }.toIndexedSeq)))
    }
    def valGen(v: VType): Gen[Any] = v match {
      case VBool => Gen.oneOf(true, false)
      case VInt32 => Gen.choose(Int.MinValue, Int.MaxValue)
      case VInt64 => Gen.choose(Long.MinValue, Long.MaxValue)
      case VFloat32 => Gen.choose(-1e30f, 1e30f)
      case VFloat64 => Gen.choose(-1e300, 1e300)
      case VString => Gen.alphaNumStr.map(_.take(12))
      case VArray(e) => for {
        n <- Gen.choose(0, 4)
        xs <- Gen.listOfN(n, Gen.frequency(
          3 -> valGen(e), 1 -> Gen.const(null)))
      } yield xs
      case VStruct(fs) =>
        Gen.sequence[Seq[Any], Any](fs.map(f => Gen.frequency(
          3 -> valGen(f._2), 1 -> Gen.const(null))))
          .map(Row.fromSeq)
      case x => throw new IllegalArgumentException(x.toString)
    }
    val caseG = for {
      n <- Gen.choose(1, 4)
      fts <- Gen.listOfN(n, vGen(2))
      vt = VStruct(fts.zipWithIndex.map { case (t, i) =>
        s"c$i" -> t }.toIndexedSeq)
      nRows <- Gen.choose(0, 5)
      rows <- Gen.listOfN(nRows, valGen(vt))
    } yield (vt, rows.map(_.asInstanceOf[Row]))
    samples(caseG, 60, seed = 20260814L).foreach { case (vt, rows) =>
      val et = HailNativeWrite.writeEType(vt)
      // sanity: declared strings parse back to the same types
      assert(parseEType(HailNativeWrite.eTypeString(et)) == et)
      assert(parseVType(HailNativeWrite.vTypeString(vt)) == vt)
      val bos = new java.io.ByteArrayOutputStream()
      HailNativeWrite.encodePart(rows.iterator, et, bos)
      val got = decodePart(
        new java.io.ByteArrayInputStream(bos.toByteArray),
        HailNativeWrite.WriteBufSpec, et, vt).toSeq
      // decoded seqs render as ArraySeq, generated ones as List —
      // normalize the collection name, values must be identical
      def norm(r: Row): String =
        r.toString.replace("ArraySeq(", "List(")
      assert(got.map(norm) == rows.map(norm),
        s"round-trip mismatch for $vt")
    }
  }

  test("minhashSigs md5 kernel matches an independent JVM model") {
    val word = Gen.oneOf("lorem", "ipsum", "dolor", "sit", "amet", "processo",
      "naturale", "linguaggio", "ueber", "daten", "文書")
    val g = for {
      n <- Gen.choose(1, 12)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    val docs = samples(g, 200, seed = 13L).distinct
    val df = spark.createDataFrame(docs.map(Tuple1(_))).toDF("text")
      .withColumn("sh", TextKernels.shinglesOfTokens(
        split(lower(col("text")), "\\s+"), 2))
      .filter(size(col("sh")) > 0)
    val got = df.select(col("sh"),
        TextKernels.minhashSigs(col("sh"), 8, "md5").as("sig"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val shingles = r.getSeq[String](0)
      val sig = r.getSeq[Long](1)
      assert(sig === naiveMd5Sigs(shingles, 8), s"sigs of $shingles")
    }
  }

  // ---- bag n-gram kernels ---------------------------------------------------

  test("token n-gram kernels match independent JVM md5 models (random unicode)") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h60(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(15), 16)
    def ngrams(ts: Seq[String], n: Int): Seq[String] =
      if (ts.length >= n)
        (0 to ts.length - n).map(i => ts.slice(i, i + n).mkString(" "))
      else Seq.empty
    val tokG = Gen.frequency(
      6 -> Gen.choose(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)),
      1 -> Gen.oneOf("é", "日本語", "", "ß", "é́", "🙂"))
    val arrG = for {
      n <- Gen.choose(0, 9); ts <- Gen.listOfN(n, tokG)
    } yield ts
    val arrs = samples(arrG, 300, 11L)
    val df = spark.createDataFrame(
      arrs.zipWithIndex.map { case (ts, i) => (i.toLong, ts) })
      .toDF("i", "w")
    val got = df.select(col("i"),
        TextKernels.tokenNgrams(col("w"), 3).as("tng"),
        TextKernels.tokenNgramHashes(col("w"), 3, "decon").as("tnh"),
        TextKernels.dsirBuckets(col("w"), 257, "dsir-feat").as("db"))
      .orderBy("i").collect()
    got.zip(arrs).foreach { case (r, ts) =>
      assert(r.getSeq[String](1) === ngrams(ts, 3), s"tng of $ts")
      assert(r.getSeq[Long](2) ===
        ngrams(ts, 3).map(g => h60(s"decon|$g")), s"tnh of $ts")
      assert(r.getSeq[Long](3) ===
        (ngrams(ts, 1) ++ ngrams(ts, 2))
          .map(g => h60(s"dsir-feat|$g") % 257), s"db of $ts")
    }
  }

  test("token n-gram kernels compact null tokens — defined for ANY caller") {
    // the kernels declare containsNull=false output; a null input token
    // contributes no gram (compacted before gram formation) instead of
    // NPE-ing — result equals the kernel over the null-free compaction
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h60(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(15), 16)
    def ngrams(ts: Seq[String], n: Int): Seq[String] =
      if (ts.length >= n)
        (0 to ts.length - n).map(i => ts.slice(i, i + n).mkString(" "))
      else Seq.empty
    val rows = Seq(
      (0L, Seq[String]("a", null, "b", "c", "d")),
      (1L, Seq[String](null, null)),
      (2L, Seq[String]("x", "y", null, "z", "w")),
      (3L, Seq[String]("p", "q", "r")))
    val df = spark.createDataFrame(rows).toDF("i", "w")
    val got = df.select(col("i"),
        TextKernels.tokenNgrams(col("w"), 2).as("tng"),
        TextKernels.tokenNgramHashes(col("w"), 2, "decon").as("tnh"),
        TextKernels.dsirBuckets(col("w"), 257, "dsir-feat").as("db"))
      .orderBy("i").collect()
    got.zip(rows).foreach { case (r, (_, ts0)) =>
      val ts = ts0.filter(_ != null)
      assert(r.getSeq[String](1) === ngrams(ts, 2), s"tng of $ts0")
      assert(r.getSeq[Long](2) ===
        ngrams(ts, 2).map(g => h60(s"decon|$g")), s"tnh of $ts0")
      assert(r.getSeq[Long](3) ===
        (ngrams(ts, 1) ++ ngrams(ts, 2))
          .map(g => h60(s"dsir-feat|$g") % 257), s"db of $ts0")
    }
  }
}
