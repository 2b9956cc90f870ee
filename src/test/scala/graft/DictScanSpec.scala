package graft

import org.apache.spark.sql.functions._

import graft.functions.DictScan

/** Aho–Corasick multi-pattern scan: the automaton's hard paths —
  * self-overlapping terms, term-is-prefix/suffix-of-term (fail-link
  * output folding), same-end-position tie-breaks, unicode — plus a
  * brute-force reference scan over corpus text.
  */
class DictScanSpec extends SparkSpec {
  import spark.implicits._

  private def scan(text: String, terms: Seq[String]): (Long, Long, String) = {
    val r = Seq(Tuple1(text)).toDF("t")
      .select(DictScan(col("t"), terms).as("d"))
      .select(col("d.n_terms_present"), col("d.n_hits"), col("d.first_term"))
      .head()
    (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2))
  }

  test("overlapping occurrences of a self-overlapping term all count") {
    // "aa" in "aaaa": ends at positions 2,3,4 → 3 overlapping hits
    assert(scan("aaaa", Seq("aa")) === ((1L, 3L, "aa")))
    // period-2 overlap: "a a" in "a a a" → 2 hits
    assert(scan("a a a", Seq("a a")) === ((1L, 2L, "a a")))
  }

  test("term-is-prefix-of-term: both terms fire, prefix does not mask") {
    // "ab" ends at 2; "abc" ends at 3; "ab" fires again inside "abc"? no —
    // second "ab" would need another occurrence. Text "abcab": "ab" at
    // ends 2 and 5, "abc" at end 3 → present 2, hits 3
    assert(scan("abcab", Seq("ab", "abc")) === ((2L, 3L, "ab")))
    // first_term: "ab" ends earliest (position 2), before "abc" (3)
  }

  test("fail-link outputs: suffix term fires inside a longer match") {
    // "b" is a suffix of "ab" — at the end of "ab" BOTH fire (the output
    // set of the "ab" node folds "b" via the dictionary-suffix link)
    assert(scan("ab", Seq("ab", "b")) === ((2L, 2L, "ab")))
    // tie at end position 2: "ab" (len 2) beats "b" (len 1)
  }

  test("same end, same length is impossible: length is a total tie-break") {
    // "ba" and "ab" both length 2; in "aba" the first match END is at
    // position 2 ("ab"); "ba" ends at 3 — so "ab" simply ends first
    assert(scan("aba", Seq("ba", "ab")) === ((2L, 2L, "ab")))
    // the invariant bestOf relies on: two DISTINCT terms of equal length
    // ending at the same position would be the same substring of the
    // text, hence the same string — and the constructor rejects
    // duplicates. Assert it exhaustively over a small universe: for
    // every pair of distinct terms and every text position, equal length
    // implies different end positions.
    val terms = for {
      a <- Seq("a", "b"); b <- Seq("a", "b")
    } yield s"$a$b"
    val text = "aabbabba"
    for {
      t1 <- terms; t2 <- terms if t1 != t2 && t1.length == t2.length
      e <- 1 to text.length
    } {
      val ends1 = t1.length <= e && text.substring(e - t1.length, e) == t1
      val ends2 = t2.length <= e && text.substring(e - t2.length, e) == t2
      assert(!(ends1 && ends2),
        s"distinct same-length terms $t1/$t2 both end at $e — bestOf's total-order invariant broken")
    }
  }

  test("unicode terms and text") {
    val (p, h, f) = scan("préfix pré", Seq("pré", "fix"))
    assert((p, h, f) === ((2L, 3L, "pré")))
  }

  test("no match, empty text, null text") {
    assert(scan("zzz", Seq("ab")) === ((0L, 0L, null)))
    assert(scan("", Seq("ab")) === ((0L, 0L, null)))
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(DictScan(col("t"), Seq("ab")).as("d")).head()
    assert(r.isNullAt(0))
  }

  test("empty dictionary, empty term, and duplicate terms are analysis errors") {
    intercept[Exception] {
      Seq(Tuple1("x")).toDF("t").select(DictScan(col("t"), Seq.empty)).head()
    }
    intercept[Exception] {
      Seq(Tuple1("x")).toDF("t").select(DictScan(col("t"), Seq("a", ""))).head()
    }
    // a duplicate would register two automaton ids for one string and
    // double-count every match
    intercept[Exception] {
      Seq(Tuple1("x")).toDF("t").select(DictScan(col("t"), Seq("a", "a"))).head()
    }
    // ...but the SQL comma-list form dedupes as a convenience
    graft.functions.GraftExtensions.register(spark)
    // whitespace around commas trims away ('a, b' means a and b — but
    // interior whitespace, as in 'a a', stays significant)
    val t = spark.sql("SELECT dict_scan('b c', 'x , b c ') AS d").head().getStruct(0)
    assert((t.getLong(0), t.getString(2)) === ((1L, "b c")))
    val r = spark.sql("SELECT dict_scan('aaa', 'a,a') AS d").head().getStruct(0)
    assert((r.getLong(0), r.getLong(1)) === ((1L, 3L)))
  }

  test("matches a brute-force scan on corpus text") {
    val terms = Seq("a", "a a", "scan slow", "table", "agg")
    val docs = graft.core.Tables.documents(spark, sf("sf0.001")).limit(200)
    val got = docs
      .select(col("doc_id"), DictScan(col("text"), terms).as("d"))
      .select(col("doc_id"), col("d.n_terms_present"), col("d.n_hits"), col("d.first_term"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))).toMap
    val want = docs.select("doc_id", "text").collect().map { r =>
      val text = r.getString(1)
      val present = terms.count(text.contains(_))
      val hits = terms.map { t =>
        (0 to text.length - t.length).count(i => text.regionMatches(i, t, 0, t.length)).toLong
      }.sum
      val first = terms.filter(text.contains(_))
        .map(t => (text.indexOf(t) + t.length, -t.length, t))
        .sorted.headOption.map(_._3).orNull
      r.getLong(0) -> ((present.toLong, hits, first))
    }.toMap
    assert(got === want)
  }

  test("map-only codegen'd projection and SQL registration") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
    val plan = docs.select(DictScan(col("text"), Seq("table", "agg")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("Exchange"), plan)
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql("SELECT dict_scan('aaaa', 'aa').n_hits AS h").head().getLong(0)
    assert(r === 3L)
  }
}
