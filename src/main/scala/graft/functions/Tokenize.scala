package graft.functions

/** THE tokenizer for fused text expressions — one shared implementation of
  * Spark's `split(trim(text), "\\s+")` semantics (which DuckDB's
  * `string_split_regex` matches), used by [[WordNgramHashes]] and
  * [[MinHashSignatureMd5]] so the two can never drift apart:
  *
  *   - trim strips 0x20 spaces only;
  *   - separators are Java-regex `\s` exactly ([ \t\n\\x0B\f\r]) — NOT
  *     `Character.isWhitespace`, whose extras (U+2028 …) do not split in
  *     `split`;
  *   - Spark's split uses limit -1: ONE leading empty token when the
  *     trimmed text starts with a separator, ONE trailing empty token when
  *     it ends with one, and `[""]` for empty text (Java's default
  *     `String.split` drops the trailing ones — a parity trap).
  */
private[functions] object Tokenize {

  def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Token boundaries of `s` as parallel (starts, ends) offset arrays,
    * after trimming 0x20 from both ends. `starts(i) == ends(i)` marks an
    * empty token (the split edge cases above).
    */
  def boundaries(s: String): (Array[Int], Array[Int]) = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1

    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    if (lo == hi) {
      // empty trimmed text → [""] (split of "" is one empty token)
      starts += lo; ends += lo
    } else {
      if (isWs(s.charAt(lo))) { starts += lo; ends += lo } // leading empty
      var i = lo
      var inTok = false
      while (i < hi) {
        val ws = isWs(s.charAt(i))
        if (!ws && !inTok) { starts += i; inTok = true }
        if (ws && inTok) { ends += i; inTok = false }
        i += 1
      }
      if (inTok) ends += hi
      if (isWs(s.charAt(hi - 1))) { starts += hi; ends += hi } // trailing empty
    }
    (starts.toArray, ends.toArray)
  }
}
