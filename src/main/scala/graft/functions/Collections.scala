package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Set / dict / string helper surface (reference
  * `functions/SetFunctions.scala`, `DictFunctions.scala`,
  * `StringFunctions.scala:291-774`).
  *
  * Sets follow the engine's canonical encoding: a SORTED DISTINCT array
  * (reference `TSet` encodes the same way), so equality/hash semantics
  * line up with the oracle. All helpers normalize their outputs. */
object Sets {

  /** Canonicalize any array into set encoding. */
  def toSet(a: Column): Column = array_sort(array_distinct(a))

  def add(s: Column, v: Column): Column = toSet(array_union(s, array(v)))
  def remove(s: Column, v: Column): Column = array_remove(s, v)
  def contains(s: Column, v: Column): Column = array_contains(s, v)
  def isEmpty(s: Column): Column = size(s) === 0
  def union(a: Column, b: Column): Column = toSet(array_union(a, b))
  def intersection(a: Column, b: Column): Column =
    toSet(array_intersect(a, b))
  def difference(a: Column, b: Column): Column = toSet(array_except(a, b))
  def isSubset(a: Column, b: Column): Column =
    size(array_except(a, b)) === 0

  /** LowerBoundOnOrderedCollection (ir-gen `Main.scala:738`): index of
    * the first element >= v in a sorted array (0-based; == size when all
    * elements are smaller). Declarative linear-count form — stays in
    * codegen, and per-row collections are small by contract. */
  def lowerBound(arr: Column, v: Column): Column =
    size(filter(arr, x => x < v))
}

/** Dict helpers over Spark MapType (reference `DictFunctions.scala`). */
object Dicts {
  def get(d: Column, k: Column): Column = element_at(d, k)
  def contains(d: Column, k: Column): Column = map_contains_key(d, k)
  def keys(d: Column): Column = array_sort(map_keys(d))
  def values(d: Column): Column = map_values(d)
  def keySet(d: Column): Column = array_sort(map_keys(d))
  def items(d: Column): Column = map_entries(d)
  def isEmpty(d: Column): Column = size(d) === 0
  def fromEntries(e: Column): Column = map_from_entries(e)

  /** GroupByKey (ir-gen `Main.scala:725`): array of (key, value) structs
    * → map key → array of values, duplicate keys grouped (unlike
    * `fromEntries`, which throws on duplicates). Quadratic in the
    * per-row entry count — per-row collections are small by contract. */
  def groupByKey(entries: Column): Column =
    map_from_entries(transform(
      array_distinct(transform(entries, e => e("key"))),
      k => struct(k.as("key"),
        transform(filter(entries, e => e("key") === k),
          e => e("value")).as("value"))))
}

/** String helpers the reference adds over SQL built-ins
  * (`StringFunctions.scala`: hamming, strftime/strptime over Unix
  * seconds, firstMatchIn, escaping). */
object Strings {

  /** Hamming distance of equal-length strings; null if lengths differ
    * (reference `hamming`). */
  def hamming(a: Column, b: Column): Column =
    when(length(a) === length(b),
      size(filter(zip_with(split(a, ""), split(b, ""),
        (x, y) => x =!= y), d => d)))

  /** strftime: format Unix seconds with a strftime-style pattern —
    * implemented over Spark's from_unixtime (Java pattern). Callers pass
    * Java patterns (the reference exposes C strftime; the engine contract
    * here is the JVM pattern language, documented divergence). */
  def strftime(seconds: Column, javaPattern: String): Column =
    from_unixtime(seconds, javaPattern)

  /** strptime: parse to Unix seconds. */
  def strptime(s: Column, javaPattern: String): Column =
    unix_timestamp(s, javaPattern)

  /** First regex match (null if none) — reference `firstMatchIn`. */
  def firstMatchIn(s: Column, regex: String): Column = {
    val m = regexp_extract(s, regex, 0)
    when(m =!= "", m)
  }

  /** Reversible string escape of backslash + control whitespace
    * (reference `escapeString`). */
  def escape(s: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      s, "\\\\", "\\\\\\\\"), "\n", "\\\\n"), "\t", "\\\\t"),
      "\r", "\\\\r")
}
