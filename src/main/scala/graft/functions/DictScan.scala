package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern dictionary scan — Aho–Corasick over a term list that is
  * too large for regex alternation (a 10k-term blocklist compiles to a
  * pathological regex and re-scans per alternative; the automaton is ONE
  * pass over the text regardless of dictionary size).
  *
  *   (n_terms_present, n_hits, first_term)
  *
  *   - `n_terms_present`: how many DISTINCT dictionary terms occur in the
  *     text at least once (substring semantics, case-sensitive) — the
  *     blocklist-filter verdict (`> 0` ⇒ flagged);
  *   - `n_hits`: total number of match END positions across all terms,
  *     counting overlaps (each (position, term) pair once) — the density
  *     signal;
  *   - `first_term`: the dictionary term whose first occurrence ends
  *     earliest; ties (several terms ending at one position) go to the
  *     LONGER match — two distinct same-length terms cannot end at the
  *     same position, so that rule is total ("why was this flagged",
  *     deterministic).
  *
  * The automaton is built ONCE per expression instance (lazily, on the
  * executor that first evaluates it) from the reference-object term list
  * and shared across rows — the build is O(Σ|term|·σ) and amortizes over
  * the partition like the decontaminate shingle set. Matching is over
  * UTF-16 chars (Java String), so any unicode term works; callers wanting
  * case folding lower both sides upstream (the FilterLines convention).
  *
  * Oracle parity: `n_terms_present` is exactly
  * `len(list_filter(dict, t -> contains(text, t)))` and `n_hits` is the
  * sum over terms of OVERLAPPING occurrence counts — both expressible in
  * DuckDB for an inline dictionary, so the operator is hash-gateable
  * (q_dict_scan) even though its reason to exist is dictionaries far too
  * large to inline.
  */
case class DictScan(child: Expression, terms: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = DictScan.schema
  override def nullable: Boolean = true
  override def prettyName: String = "dict_scan"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dict_scan expects string, got ${child.dataType.catalogString}")
    else if (terms.isEmpty || terms.exists(_.isEmpty))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "dict_scan needs a non-empty dictionary of non-empty terms")
    else if (terms.distinct.length != terms.length)
      // a duplicate registers two automaton ids for one string and
      // double-counts every match — reject loudly (the SQL registration
      // dedupes its comma list as a convenience)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "dict_scan dictionary contains duplicate terms")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  @transient private lazy val automaton = new DictScan.Automaton(terms)

  override def nullSafeEval(input: Any): Any =
    automaton.scan(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("automaton", automaton, classOf[DictScan.Automaton].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $acRef.scan($v.toString());")
  }

  override protected def withNewChildInternal(c: Expression): DictScan =
    copy(child = c)
}

object DictScan {

  val schema: StructType = StructType(Seq(
    StructField("n_terms_present", LongType, nullable = false),
    StructField("n_hits", LongType, nullable = false),
    StructField("first_term", StringType, nullable = true)))

  /** Classic Aho–Corasick with hash-map goto edges (dictionaries are
    * words over arbitrary unicode — a dense σ-array per node would be
    * memory-hostile). Each node carries the list of term ids ending
    * there (its own outputs plus, via the dictionary-suffix link chain,
    * folded at build time into one array).
    */
  final class Automaton(terms: Seq[String]) extends Serializable {
    private val dict: Array[String] = terms.toArray

    // nodes grow in an array-of-maps trie; node 0 is the root
    private val children = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Int]())
    private val fail = scala.collection.mutable.ArrayBuffer(0)
    private val outs = scala.collection.mutable.ArrayBuffer[Array[Int]](Array.empty)

    locally {
      // trie
      dict.zipWithIndex.foreach { case (t, id) =>
        var node = 0
        var i = 0
        while (i < t.length) {
          val c = t.charAt(i)
          node =
            if (children(node).containsKey(c)) children(node).get(c)
            else {
              children += new java.util.HashMap[Char, Int]()
              fail += 0
              outs += Array.empty
              val n = children.length - 1
              children(node).put(c, n)
              n
            }
          i += 1
        }
        outs(node) = outs(node) :+ id
      }
      // BFS failure links; outputs folded through the fail chain
      val queue = new java.util.ArrayDeque[Int]()
      children(0).forEach((_, child) => { fail(child) = 0; queue.add(child) })
      while (!queue.isEmpty) {
        val u = queue.poll()
        if (outs(fail(u)).nonEmpty) outs(u) = outs(u) ++ outs(fail(u))
        children(u).forEach { (c, v) =>
          var f = fail(u)
          while (f != 0 && !children(f).containsKey(c)) f = fail(f)
          fail(v) = if (children(f).containsKey(c) && children(f).get(c) != v)
            children(f).get(c) else 0
          queue.add(v)
        }
      }
    }

    def scan(text: String): InternalRow = {
      val seen = new Array[Boolean](dict.length)
      var present = 0L
      var hits = 0L
      var first = -1 // term id of the best first match
      var node = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (node != 0 && !children(node).containsKey(c)) node = fail(node)
        if (children(node).containsKey(c)) node = children(node).get(c)
        val out = outs(node)
        if (out.nonEmpty) {
          hits += out.length
          var j = 0
          while (j < out.length) {
            val id = out(j)
            if (!seen(id)) { seen(id) = true; present += 1 }
            j += 1
          }
          // matches stream in end-position order: the first non-empty
          // output set decides first_term (tie at that position → the
          // longest term, whose match started earliest; length is a total
          // order here — see bestOf)
          if (first == -1) first = bestOf(out)
        }
        i += 1
      }
      new GenericInternalRow(Array[Any](
        present, hits,
        if (first == -1) null else UTF8String.fromString(dict(first))))
    }

    /** Among term ids ending at the same position: the longest wins.
      * Length alone is total here: two DISTINCT terms of the same length
      * ending at the same position would have to be the same substring —
      * impossible (the constructor rejects duplicates), so no further
      * tie-break clause exists. DictScanSpec asserts the invariant. */
    private def bestOf(out: Array[Int]): Int = {
      var best = out(0)
      var j = 1
      while (j < out.length) {
        val id = out(j)
        if (dict(id).length > dict(best).length) best = id
        j += 1
      }
      best
    }
  }

  def apply(text: Column, terms: Seq[String]): Column =
    ColumnBridge.toColumn(DictScan(ColumnBridge.toExpression(text), terms))
}
