package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Duration grammar matrix ported from the reference
  * (`normalization/duration.rs:285-351`). */
class IsoDurationSpec extends AnyFunSuite {

  test("valid ISO durations pass through") {
    for (v <- Seq("P1D", "P2W", "PT12H", "P1DT12H", "P1Y2M3DT4H5M6S"))
      assert(IsoDuration.normalize(v) == v)
  }

  test("bare numerics are days; fractions become hours") {
    assert(IsoDuration.normalize("1") == "P1D")
    assert(IsoDuration.normalize("1.5") == "P1DT12H")
    assert(IsoDuration.normalize("0.5") == "PT12H")
    assert(IsoDuration.normalize("0") == "P0D")
    assert(IsoDuration.normalize("-2") == "-P2D")
  }

  test("text grammar: number-space-unit pairs") {
    assert(IsoDuration.normalize("2 hours 30 minutes") == "PT2H30M")
    assert(IsoDuration.normalize("1 day 6 hours") == "P1DT6H")
    assert(IsoDuration.normalize("3 weeks") == "P3W")
  }

  test("text grammar: combined tokens") {
    assert(IsoDuration.normalize("5d") == "P5D")
    assert(IsoDuration.normalize("30min") == "PT30M")
    assert(IsoDuration.normalize("2h") == "PT2H")
  }

  test("mixed weeks become days") {
    assert(IsoDuration.normalize("1 week 2 days") == "P9D")
  }

  test("unparseable preserves original") {
    assert(IsoDuration.normalize("soon") == "soon")
    assert(IsoDuration.normalize("P") == "P")
  }

  test("null and empty → empty") {
    assert(IsoDuration.normalize(null) == "")
    assert(IsoDuration.normalize("") == "")
  }

  test("negative text components keep the reference's component format") {
    // duration.rs formats signed component values directly (i64 grammar):
    // bare numerics get the leading-sign form, text components the inline
    // sign — both reference-faithful
    assert(IsoDuration.normalize("-2") == "-P2D")
    assert(IsoDuration.normalize("-2 days") == "P-2D")
    assert(IsoDuration.normalize("-3589d") == "P-3589D")
  }

  test("19-digit integers parse to the Long limit; 20 digits preserve") {
    assert(IsoDuration.normalize("9223372036854775807 seconds") ==
      "PT9223372036854775807S")
    assert(IsoDuration.normalize("9223372036854775808 seconds") ==
      "9223372036854775808 seconds") // Long.MaxValue + 1 must not throw
    assert(IsoDuration.normalize("99999999999999999999 seconds") ==
      "99999999999999999999 seconds")
  }
}
