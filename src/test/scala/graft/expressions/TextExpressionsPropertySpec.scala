package graft.expressions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based equivalence of the native winnowing kernel against a
 * straightforward Scala reference model (the semantics the Column-HOF
 * formulation and the DuckDB oracle both implement): positional k-gram
 * rolling hashes of lower(trim(text)), window minima, dedup, sort.
 * Random texts, whitespace edges, and random (k, window) shapes must
 * agree exactly — any divergence is a kernel-loop bug the two fixed
 * spec cases might not cover. Spark-free: the kernel is a pure function
 * of a UTF8String.
 */
class TextExpressionsPropertySpec extends AnyFunSuite {

  private def model(text: String, k: Int, window: Int): Seq[Long] = {
    // SQL trim semantics (Spark, DuckDB, and UTF8String.trim alike):
    // ASCII SPACE only — Java's String.trim also strips tabs/controls and
    // would DIVERGE (this property run caught exactly that)
    val t = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
      .reverse.toLowerCase(java.util.Locale.ROOT)
    val cps = t.codePoints().toArray
    def hash(from: Int): Long = {
      var acc = 0L
      var j = from
      val end = math.min(from + k, cps.length)
      while (j < end) { acc = (acc * 31L + cps(j)) % 2147483647L; j += 1 }
      acc
    }
    val m = math.max(cps.length - (k - 1), 1)
    val hs = (0 until m).map(hash)
    val w = math.max(m - (window - 1), 1)
    (0 until w).map(i => hs.slice(i, math.min(i + window, m)).min).distinct.sorted
  }

  private def kernel(text: String, k: Int, window: Int): Seq[Long] =
    TextEval.winnow(UTF8String.fromString(text), k, window).toLongArray().toSeq

  private val genText: Gen[String] = Gen.oneOf(
    // realistic prose-ish
    Gen.listOfN(40, Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))).map(_.mkString),
    // short/edge: around the k and window boundaries
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString)),
    // whitespace padding and mixed case (trim/lower must match the model)
    Gen.listOfN(20, Gen.oneOf(Gen.alphaUpperChar, Gen.const(' '), Gen.const('\t')))
      .map(cs => "  " + cs.mkString + "  "),
    // punctuation-heavy
    Gen.listOfN(30, Gen.oneOf("a b.,;:!?-_'\"()".toSeq)).map(_.mkString))

  test("winnow kernel ≡ reference model on 3000 random (text, k, window) shapes") {
    val gen = for {
      t <- genText
      k <- Gen.chooseNum(1, 8)
      w <- Gen.chooseNum(1, 6)
    } yield (t, k, w)
    val params = Gen.Parameters.default
    var seed = Seed(1234L)
    var i = 0
    var evaluated = 0
    while (i < 3000) {
      gen.apply(params, seed).foreach { case (t, k, w) =>
        assert(kernel(t, k, w) == model(t, k, w),
          s"divergence on text='$t' k=$k window=$w")
        evaluated += 1
      }
      seed = seed.next
      i += 1
    }
    // a filtered generator returning None would silently skip draws and
    // leave the suite green while testing nothing — the count keeps the
    // claim honest
    assert(evaluated == 3000, s"only $evaluated of 3000 draws evaluated")
  }

  // ---- ngram stats kernel ----------------------------------------------------

  private def ngramModel(text: String, n: Int): Seq[Long] = {
    val toks = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
      .reverse.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).toSeq
    val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    if (grams.isEmpty) Seq(0L, 0L, 0L)
    else Seq(grams.groupBy(identity).values.map(_.size).max.toLong,
      grams.distinct.size.toLong, grams.size.toLong)
  }

  test("ngramStats kernel ≡ reference model on 3000 random (text, n) shapes") {
    val gen = for {
      t <- genText
      n <- Gen.chooseNum(1, 4)
    } yield (t, n)
    val params = Gen.Parameters.default
    var seed = Seed(5678L)
    var i = 0
    var evaluated = 0
    while (i < 3000) {
      gen.apply(params, seed).foreach { case (t, n) =>
        val got = TextEval.ngramStats(UTF8String.fromString(t), n).toLongArray().toSeq
        assert(got == ngramModel(t, n), s"divergence on text='$t' n=$n")
        evaluated += 1
      }
      seed = seed.next
      i += 1
    }
    assert(evaluated == 3000, s"only $evaluated of 3000 draws evaluated")
  }
}
