package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based equivalence of the exception-free duration parser against
 * a model built from the original try/catch implementation, over the
 * duration grammar's input space (bare numerics, number-unit pairs,
 * combined tokens, ISO pass-through, garbage). Out-of-grammar exotica the
 * old `toDouble` accepted by accident — "Infinity", hex floats, "5f" type
 * suffixes — are intentionally excluded: the new parser treats them as
 * unparseable (preserved), which is the documented behavior change.
 */
class IsoDurationPropertySpec extends AnyFunSuite {

  // ---- the reference model: original exception-based parsing --------------
  // minus Java's parseDouble quirks (trailing d/D/f/F type suffixes, hex
  // floats, Infinity/NaN spellings): the reference's Rust f64 parse rejects
  // those, so the new parser's rejection is the FAITHFUL behavior — e.g.
  // "-3589d" routes to the text grammar on both sides (→ P-3589D), where
  // Java's toDouble accident made the old Scala emit -P3589D

  private def oldParseF64(s: String): Option[Double] = {
    if (s.isEmpty) return None
    if ("dDfF".indexOf(s.charAt(s.length - 1)) >= 0) return None
    if (s.exists(c => "xXnNiI".indexOf(c) >= 0)) return None
    try Some(s.toDouble) catch { case _: Exception => None }
  }

  private def modelNormalize(value: String): String = {
    if (value == null) return ""
    val t = value.trim
    if (t.isEmpty) return value // preserve-original applies to blanks too
    if (IsoDuration.isIsoDuration(t)) return t
    oldParseF64(t.replace(",", "")) match {
      case Some(d) => IsoDuration.fromDays(d)
      case None =>
        // the text grammar is unchanged — reuse it via normalize on inputs
        // that are guaranteed not to hit the numeric fast path
        IsoDuration.normalize(t)
    }
  }

  // ---- generators over the duration grammar --------------------------------

  private val units = Seq("years", "year", "months", "month", "weeks", "week",
    "days", "day", "hours", "hour", "hrs", "hr", "h", "minutes", "minute",
    "mins", "min", "m", "seconds", "second", "secs", "sec", "s", "d", "w")

  private val genInput: Gen[String] = {
    val num = Gen.choose(-9999L, 99999L)
    val frac = for (a <- Gen.choose(0L, 999L); b <- Gen.choose(0, 99))
      yield s"$a.$b"
    Gen.oneOf(
      num.map(_.toString),
      frac,
      for (n <- num; u <- Gen.oneOf(units)) yield s"$n $u",
      for (n <- num; u <- Gen.oneOf(units)) yield s"$n$u",
      for {
        n1 <- Gen.choose(0L, 99L); u1 <- Gen.oneOf(units)
        n2 <- Gen.choose(0L, 99L); u2 <- Gen.oneOf(units)
      } yield s"$n1 $u1 $n2 $u2",
      Gen.oneOf("P1D", "P2W", "PT12H", "P1DT12H", "P1Y2M3DT4H5M6S", "P", "PX"),
      Gen.oneOf("soon", "never", "about a week", "", "   ", "1,000", "3.5.1",
        "1e3", "2E2", "-0.5", "+7"))
  }

  test("duration parser ≡ exception-based model on 3000 grammar inputs") {
    val params = Gen.Parameters.default
    var seed = Seed(11L)
    var i = 0
    while (i < 3000) {
      genInput.apply(params, seed).foreach { v =>
        assert(IsoDuration.normalize(v) == modelNormalize(v),
          s"divergence on input '$v': " +
            s"parser=${IsoDuration.normalize(v)} model=${modelNormalize(v)}")
      }
      seed = seed.next
      i += 1
    }
  }
}
