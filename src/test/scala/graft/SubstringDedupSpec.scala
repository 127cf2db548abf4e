package graft

import org.apache.spark.sql.functions._
import graft.functions.WinnowKernel
import graft.pipeline.Dedup

/** Exact duplicated-substring span detection + removal
  * (`Dedup.duplicatedSpans` / `substringDedup`): kernel invariants, a
  * hand-computed fixture covering cross-doc, within-doc, and
  * overlapping-span merge cases, and set parity with an independent
  * gram-STRING SQL formulation (no shared hash code) on real data. */
class SubstringDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(rows.toSeq).toDF("doc_id", "text")

  test("kernel: gramHashes positions match per-substring direct hashing") {
    val s = "the quick brown fox jumps over the lazy dog"
    val k = 7
    val rolled = WinnowKernel.gramHashes(s, k)
    assert(rolled.length === s.length - k + 1)
    // independent check: each position's hash equals hashing that
    // substring alone (rolling update vs fresh polynomial)
    (0 until rolled.length).foreach { i =>
      val direct = WinnowKernel.gramHashes(s.substring(i, i + k), k)
      assert(direct.length === 1 && direct(0) === rolled(i), s"pos $i")
    }
    assert(WinnowKernel.gramHashes("abc", 4).isEmpty)
    assert(WinnowKernel.gramHashes("", 1).isEmpty)
  }

  test("spans: hand-computed fixture (cross-doc, within-doc, keep-first)") {
    val L = 5
    val df = docs(
      1L -> "abcdefghij",    // canonical copy of the shared run
      2L -> "xxabcdefghyy",  // shares "abcdefgh" (8 chars) with doc 1
      3L -> "zzzzzzzzzz",    // one gram duplicated at 6 positions in-doc
      4L -> "qwerty")        // nothing duplicated
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text", minLen = L)
      .orderBy("doc", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSeq
    // doc 1 holds every canonical occurrence -> no spans; doc 2's
    // positions 2..5 merge to chars [2, 10); doc 3's positions 1..5
    // (pos 0 is canonical) merge to chars [1, 10)
    assert(spans === Seq((2L, 2, 8, 4L), (3L, 1, 9, 5L)))

    val clean = Dedup.substringDedup(df, "doc_id", "text", minLen = L)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text")))
      .toSeq
    assert(clean === Seq(
      1L -> "abcdefghij", // untouched: canonical copies survive
      2L -> "xxyy",       // duplicated run cut, flanks rejoin
      3L -> "z",          // keep-first gram's chars [1,5) die with the span
      4L -> "qwerty"))
  }

  test("spans: two islands with a gap > minLen stay separate spans") {
    val L = 5
    val gap = "0123456789ABCDEF" // 16 distinct chars, no dup grams
    val df = docs(
      1L -> ("aaaaa" + "bcdefghjklmnpqrs" + "wwwww"),
      2L -> ("aaaaa" + gap + "wwwww"))
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text", minLen = L)
      .orderBy("doc", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .toSeq
    // doc 1 is canonical for both runs; doc 2 loses both, as two spans
    // (positions 0 and 21 differ by > L so the islands do not merge)
    assert(spans === Seq((2L, 0, 5), (2L, 21, 5)))
  }

  test("parity: spans match an independent gram-string SQL formulation") {
    val L = 30
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    df.createOrReplaceTempView("__ss_docs")
    val brute = spark.sql(s"""
      WITH pos AS (
        SELECT doc_id, text, explode(sequence(0, length(text) - $L)) AS p
        FROM __ss_docs WHERE length(text) >= $L),
      g AS (SELECT doc_id, p, substring(text, p + 1, $L) AS gram FROM pos),
      occ AS (SELECT doc_id, p,
               row_number() OVER (PARTITION BY gram ORDER BY doc_id, p) AS rn,
               count(*)     OVER (PARTITION BY gram) AS c
              FROM g),
      rem AS (SELECT doc_id, p FROM occ WHERE c > 1 AND rn > 1),
      fl AS (SELECT doc_id, p,
              CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > $L
                   THEN 1 ELSE 0 END AS f
             FROM rem),
      isl AS (SELECT doc_id, p,
               sum(f) OVER (PARTITION BY doc_id ORDER BY p) AS grp
              FROM fl)
      SELECT doc_id, min(p) AS span_start,
             max(p) + $L - min(p) AS span_len,
             count(*) AS n_positions
      FROM isl GROUP BY doc_id, grp""")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    val mine = Dedup.duplicatedSpans(df, "doc_id", "text", minLen = L)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(mine === brute)
    assert(mine.nonEmpty, "no duplicated spans at sf0.001 — weak test")
  }

  test("clean: fold output equals a driver-side cut from the spans") {
    val L = 30
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text", minLen = L)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    val expected = df.collect().map { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val sb = new StringBuilder
      var cur = 0
      spans.getOrElse(id, Array.empty[(Int, Int)]).foreach {
        case (s, l) => sb.append(text.substring(cur, s)); cur = s + l
      }
      sb.append(text.substring(cur))
      id -> sb.toString
    }.toMap
    val got = Dedup.substringDedup(df, "doc_id", "text", minLen = L)
      .select("doc_id", "clean_text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(got === expected)
    val orig = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.exists { case (id, t) => t != orig(id) },
      "no document changed — weak test")
  }
}
