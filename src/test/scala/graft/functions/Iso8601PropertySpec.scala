package graft.functions

import java.time.{LocalDate, LocalDateTime}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder, ResolverStyle}
import java.util.Locale

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based equivalence of the hand-rolled token parser against a
 * formatter-based reference model — the exact `DateTimeFormatter` cascade
 * the parser replaced (same formats, same priority order, STRICT
 * resolution). Random well-formed dates, near-misses, and garbage must
 * normalize identically; any divergence is a cascade-semantics regression
 * the matrix tests might not cover. Deterministic seed walk (scalacheck
 * Gen without the scalatest bridge).
 */
class Iso8601PropertySpec extends AnyFunSuite {

  // ---- the reference model: the original 30-formatter cascade -------------

  private def fmt(pattern: String): DateTimeFormatter =
    new DateTimeFormatterBuilder().parseCaseInsensitive().appendPattern(pattern)
      .toFormatter(Locale.ENGLISH).withResolverStyle(ResolverStyle.STRICT)

  private def fracFmt(base: String): DateTimeFormatter =
    new DateTimeFormatterBuilder().parseCaseInsensitive().appendPattern(base)
      .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 1, 9, true)
      .toFormatter(Locale.ENGLISH).withResolverStyle(ResolverStyle.STRICT)

  private val dateTimeFormats: Array[DateTimeFormatter] = Array(
    fracFmt("uuuu-M-d'T'H:m:s")) ++ Array(
    "uuuu-M-d'T'H:m:s", "uuuu-M-d'T'H:m", "uuuu-M-d H:m:s", "uuuu-M-d H:m",
    "uuuu/M/d H:m:s", "uuuu/M/d H:m", "d-MMM-uuuu H:m:s", "d-MMM-uuuu H:m",
    "d/M/uuuu H:m:s", "d/M/uuuu H:m", "M/d/uuuu H:m:s", "M/d/uuuu H:m").map(fmt)

  private val dateFormats: Array[DateTimeFormatter] = Array(
    "uuuu-M-d", "uuuu/M/d", "d-MMM-uuuu", "d-MMMM-uuuu", "d/M/uuuu",
    "M/d/uuuu", "d.M.uuuu", "uuuuMMdd", "MMM d, uuuu", "MMMM d, uuuu",
    "d MMM uuuu", "d MMMM uuuu", "uuuu-MMM-d", "d-M-uuuu").map(fmt)

  private val monthYearFormats: Array[DateTimeFormatter] =
    Array("MMM uuuu", "MMMM uuuu", "M/uuuu").map(p => fmt(p + " d"))

  private def tryAll[T](v: String, fs: Array[DateTimeFormatter],
      parse: (String, DateTimeFormatter) => T): Option[T] =
    fs.iterator.flatMap { f =>
      try Some(parse(v, f)) catch { case _: Exception => None }
    }.nextOption()

  private val YyyyMm = "^(\\d{4})-(\\d{2})$".r

  /** The original formatter-cascade semantics, verbatim. */
  private def modelToIso(value: String): String = {
    if (value == null) return ""
    val t = value.trim
    if (t.isEmpty) return ""
    if (Iso8601.isValidIsoShape(t)) return t
    tryAll(t, dateTimeFormats, LocalDateTime.parse)
      .map(_.format(DateTimeFormatter.ofPattern("uuuu-MM-dd'T'HH:mm:ss")))
      .orElse(tryAll(t, dateFormats, LocalDate.parse)
        .map(_.format(DateTimeFormatter.ISO_LOCAL_DATE)))
      .orElse {
        t match {
          case YyyyMm(y, m) if m.toInt >= 1 && m.toInt <= 12 =>
            Some(f"${y.toInt}%04d-${m.toInt}%02d")
          case _ =>
            tryAll(t + " 1", monthYearFormats, LocalDate.parse)
              .map(d => f"${d.getYear}%04d-${d.getMonthValue}%02d")
        }
      }
      .getOrElse(t)
  }

  // ---- generators ----------------------------------------------------------

  private val monthNames = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec", "January", "February", "March",
    "September", "sept", "JAN", "december", "Xyz")

  private val genShaped: Gen[String] = for {
    y <- Gen.choose(1900, 2100)
    m <- Gen.choose(0, 13)   // includes invalid 0/13
    d <- Gen.choose(0, 32)   // includes invalid 0/32
    h <- Gen.choose(0, 24)
    mi <- Gen.choose(0, 60)
    s <- Gen.choose(0, 60)
    mn <- Gen.oneOf(monthNames)
    pad <- Gen.oneOf(true, false)
    ms = if (pad) f"$m%02d" else m.toString
    ds = if (pad) f"$d%02d" else d.toString
    v <- Gen.oneOf(
      s"$y-$ms-$ds", s"$y/$ms/$ds", s"$ds-$mn-$y", s"$ds/$ms/$y",
      s"$ms/$ds/$y", s"$ds.$ms.$y", f"$y%04d$m%02d$d%02d", s"$mn $ds, $y",
      s"$ds $mn $y", s"$y-$mn-$ds", s"$ds-$ms-$y", s"$mn $y", s"$ms/$y",
      s"$y-$ms-${ds}T$h:$mi:$s", s"$y-$ms-$ds $h:$mi", s"$y/$ms/$ds $h:$mi:$s",
      s"$ds-$mn-$y $h:$mi", s"$ds/$ms/$y $h:$mi:$s", s"$ms/$ds/$y $h:$mi",
      s"$y-$ms-${ds}T$h:$mi:$s.123", s"$y-$ms-${ds}T$h:$mi:$s.1",
      s"$y", s"$y-$ms")
  } yield v

  private val genGarbage: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(24)),
    Gen.listOfN(8, Gen.oneOf("0123456789-/.:T ,abcxyz".toSeq)).map(_.mkString),
    Gen.oneOf("", "   ", "not a date", "9999-99-99", "2024--01", "//",
      "12:30", "2024-01-15T25:00", "15//2024", "Jan 2024 extra"))

  private def check(gen: Gen[String], n: Int, seed0: Long): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(seed0)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach { v =>
        assert(Iso8601.toIso8601(v) == modelToIso(v),
          s"divergence on input '$v': " +
            s"parser=${Iso8601.toIso8601(v)} model=${modelToIso(v)}")
      }
      seed = seed.next
      i += 1
    }
  }

  test("token parser ≡ formatter cascade on 4000 structured inputs") {
    check(genShaped, 4000, seed0 = 42L)
  }

  test("token parser ≡ formatter cascade on 1000 garbage inputs") {
    check(genGarbage, 1000, seed0 = 7L)
  }
}
