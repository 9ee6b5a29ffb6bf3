package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Numeric parse/format semantics (`normalization/numeric.rs:15-51`,
  * `polars.rs:63-91`). */
class NumericsSpec extends AnyFunSuite {

  test("plain and separator-laden numerics parse") {
    assert(Numerics.parse("42").contains(42.0))
    assert(Numerics.parse("1,234.5").contains(1234.5))
    assert(Numerics.parse("1 234").contains(1234.0))
    assert(Numerics.parse("1 234").contains(1234.0))
    assert(Numerics.parse("-3.25e2").contains(-325.0))
    assert(Numerics.parse(".5").contains(0.5))
  }

  test("special spellings") {
    assert(Numerics.parse("NaN").exists(_.isNaN))
    assert(Numerics.parse("inf").contains(Double.PositiveInfinity))
    assert(Numerics.parse("-Infinity").contains(Double.NegativeInfinity))
    // signed variants Rust's f64 parser accepts
    assert(Numerics.parse("+inf").contains(Double.PositiveInfinity))
    assert(Numerics.parse("+Infinity").contains(Double.PositiveInfinity))
    assert(Numerics.parse("-nan").exists(_.isNaN))
  }

  test("failures yield None") {
    for (v <- Seq("abc", "1.2.3", "12abc", "", null))
      assert(Numerics.parse(v).isEmpty, s"for input $v")
  }

  test("format drops trailing zeros and integral decimals") {
    assert(Numerics.format(40.0) == "40")
    assert(Numerics.format(40.5) == "40.5")
    assert(Numerics.format(0.25) == "0.25")
    assert(Numerics.format(-7.0) == "-7")
  }

  test("parse-format round trip on integral doubles") {
    assert(Numerics.parse(Numerics.format(123.0)).contains(123.0))
  }
}
