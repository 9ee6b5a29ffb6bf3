package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen-callable text-fingerprint kernels. The Column-HOF formulation of
 * winnowing was quadratic AND interpreted: `slice(hashes, i, w)` embeds the
 * whole shingle-hash subtree inside the window lambda, so every window
 * recomputed every shingle hash of the document through CodegenFallback
 * lambdas (~150 s/run over 250 small docs at sf0.1). The kernel computes
 * the hash sequence once and keeps a flat two-loop shape — the same
 * interpreted-HOF-to-native migration that took n4's ISO parsing from
 * 255 s to 1.6 s.
 */
object TextEval {

  // the SAME constants the Column fingerprint family uses — referenced,
  // not copied, so tuning them cannot desynchronize the two
  private val FpPrime = graft.operators.TextAnalysis.FpPrime
  private val FpBase = graft.operators.TextAnalysis.FpBase

  /**
   * Winnowing fingerprints of lower(trim(text)): polynomial rolling hash of
   * every k-codepoint shingle (h = Σ 31^i·cp mod 2^31−1, accumulated in
   * source order exactly like the Column/DuckDB formulation), then the
   * minimum of each `window`-wide frame, deduplicated and sorted.
   * Texts with fewer than k codepoints hash their whole remainder; fewer
   * shingles than a window keep the global minimum.
   *
   * Lowercasing follows `UTF8String.toLowerCase`: ASCII maps locale-free;
   * non-ASCII goes through the JVM default locale (Spark's own semantics
   * for `lower()`). The engine-parity guarantee is therefore pinned for
   * ASCII corpora — non-ASCII case folding can differ from an oracle on a
   * non-English-locale JVM, as it would for any `lower()`-based pipeline.
   */
  def winnow(str: UTF8String, k: Int, window: Int): ArrayData = {
    val t = str.trim().toLowerCase.toString
    val cps = t.codePoints().toArray
    val m = math.max(cps.length - (k - 1), 1)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = i
      val end = math.min(i + k, cps.length)
      while (j < end) { acc = (acc * FpBase + cps(j)) % FpPrime; j += 1 }
      hs(i) = acc
      i += 1
    }
    val w = math.max(m - (window - 1), 1)
    val mins = new Array[Long](w)
    var x = 0
    while (x < w) {
      var mn = Long.MaxValue
      var y = x
      val e = math.min(x + window, m)
      while (y < e) { if (hs(y) < mn) mn = hs(y); y += 1 }
      mins(x) = mn
      x += 1
    }
    java.util.Arrays.sort(mins)
    // dedupe in place over the sorted minima
    var out = 0
    var r = 0
    while (r < w) {
      if (r == 0 || mins(r) != mins(r - 1)) { mins(out) = mins(r); out += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(mins, out))
  }

  /**
   * Token n-gram multiset statistics of lower(trim(text)) in one pass:
   * `[top, distinct, total]` — the highest single n-gram multiplicity,
   * the distinct n-gram count, and the total n-gram count. Tokenization
   * matches the Column family exactly (trim spaces, lowercase, split on
   * `\s+`, drop empties); n-grams join with a single space, as
   * [[graft.operators.TextAnalysis.ngramArray]] does. Fewer than n
   * tokens → `[0, 0, 0]`.
   *
   * Replaces the t8 hot path's array_sort + interpreted `aggregate` fold
   * (the longest-equal-run formulation): one tokenize + one hash-count
   * per document instead of four CodegenFallback lambda trees — the same
   * migration that fixed t7 and n4.
   */
  def ngramStats(str: UTF8String, n: Int): ArrayData = {
    val t = str.trim().toLowerCase.toString
    val toks0 = t.split("\\s+")
    var nToks = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) nToks += 1; i += 1 }
    val toks = if (nToks == toks0.length) toks0 else {
      val a = new Array[String](nToks)
      var o = 0; i = 0
      while (i < toks0.length) { if (toks0(i).nonEmpty) { a(o) = toks0(i); o += 1 }; i += 1 }
      a
    }
    val total = toks.length - (n - 1)
    if (total <= 0 || toks.length == 0)
      return UnsafeArrayData.fromPrimitiveArray(Array(0L, 0L, 0L))
    val counts = new java.util.HashMap[String, java.lang.Long](total * 2)
    var top = 0L
    i = 0
    val sb = new java.lang.StringBuilder
    while (i < total) {
      val g = if (n == 1) toks(i) else {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        sb.toString
      }
      val prev = counts.get(g)
      val c = if (prev == null) 1L else prev.longValue() + 1L
      counts.put(g, c)
      if (c > top) top = c
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(top, counts.size.toLong, total.toLong))
  }

  private val InvLn2 = 1.0 / math.log(2.0)

  /**
   * Lexical-diversity statistics of lower(trim(text)) in one pass:
   * `[entropy, ttr, distinct, total]` — Shannon entropy of the token
   * unigram distribution in bits (H = log2(n) − (Σ c·log2 c)/n, the
   * algebraic form the DuckDB oracle states verbatim so both engines sum
   * the same per-term series), type-token ratio (distinct/total), and the
   * raw counts as exact doubles. Tokenization matches [[ngramStats]]
   * (trim, lowercase, split `\s+`, drop empties). Empty input →
   * `[0, 0, 0, 0]`.
   *
   * log2 is evaluated as ln·(1/ln 2) on both engines' IEEE doubles; the
   * query layer rounds to 6 decimals (the t6 discipline) so cross-libm
   * ulp drift can never reach the compared value.
   */
  def lexicalStats(str: UTF8String): ArrayData = {
    val t = str.trim().toLowerCase.toString
    val toks = t.split("\\s+")
    val counts = new java.util.HashMap[String, java.lang.Long](toks.length * 2)
    var n = 0L
    var i = 0
    while (i < toks.length) {
      val tok = toks(i)
      if (tok.nonEmpty) {
        val prev = counts.get(tok)
        counts.put(tok, if (prev == null) 1L else prev.longValue() + 1L)
        n += 1
      }
      i += 1
    }
    if (n == 0L)
      return UnsafeArrayData.fromPrimitiveArray(Array(0.0, 0.0, 0.0, 0.0))
    var sumClog = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue()
      if (c > 1L) sumClog += c * (math.log(c.toDouble) * InvLn2)
    }
    val entropy = math.log(n.toDouble) * InvLn2 - sumClog / n
    UnsafeArrayData.fromPrimitiveArray(
      Array(entropy, counts.size.toDouble / n, counts.size.toDouble, n.toDouble))
  }

  /** Jaro–Winkler similarity as a data-plane kernel: delegates to the
    * driver-side scorer ([[graft.functions.JaroWinkler]]) so the mapping
    * engine and the record-linkage operator can never disagree on the
    * algorithm (match window, 0.7 boost threshold, 4-char/0.1 prefix). */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double =
    graft.functions.JaroWinkler.similarity(a.toString, b.toString)
}

/** Winnowing kernel: `string → array<bigint>` of selected fingerprints. */
case class WinnowFingerprintsExpr(child: Expression, k: Int, window: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow requires a STRING input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any =
    TextEval.winnow(input.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextEval.winnow($c, $k, $window)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintsExpr =
    copy(child = newChild)
}

/** N-gram statistics kernel: `string → array<bigint>` of
  * `[top multiplicity, distinct count, total count]` for order-`n` token
  * n-grams ([[TextEval.ngramStats]]). */
case class NgramStatsExpr(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ngram_stats requires a STRING input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextEval.ngramStats(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextEval.ngramStats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramStatsExpr =
    copy(child = newChild)
}

/** Lexical-diversity kernel: `string → array<double>` of
  * `[entropy bits, type-token ratio, distinct tokens, total tokens]`
  * ([[TextEval.lexicalStats]]). */
case class LexicalStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lexical_stats requires a STRING input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_lexical_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextEval.lexicalStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextEval.lexicalStats($c)")

  override protected def withNewChildInternal(newChild: Expression): LexicalStatsExpr =
    copy(child = newChild)
}

/** Jaro–Winkler kernel: `(string, string) → double` similarity in [0, 1]
  * ([[TextEval.jaroWinkler]]) — codegen-friendly, stays inside
  * whole-stage codegen on the linkage hot path. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler requires STRING inputs, got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextEval.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.TextEval.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}
