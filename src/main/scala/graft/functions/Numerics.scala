package graft.functions

/**
 * Numeric parsing / formatting with SDTM semantics.
 *
 * Studied from the reference (`crates/tss-submit/src/normalize/normalization/
 * numeric.rs:15-51` and `crates/tss-standards/src/polars.rs:63-91`):
 *  - parse strips thousands separators (comma, space, NBSP), honors
 *    nan/inf/infinity spellings case-insensitively, else strict float parse;
 *  - failure → None (numeric conversion is the one transform that nulls);
 *  - formatting renders doubles without trailing zeros (`40.0` → `"40"`),
 *    which matters for QVAL / Dataset-XML ItemData / XPT char derivations.
 */
object Numerics {

  private val FloatShape =
    "^[+-]?((\\d+\\.?\\d*)|(\\.\\d+))([eE][+-]?\\d+)?$".r

  def parse(value: String): Option[Double] = {
    if (value == null) return None
    val t = value.trim
    if (t.isEmpty) return None
    val cleaned = t.replace(",", "").replace(" ", "").replace(" ", "")
    val lower = cleaned.toLowerCase
    lower match {
      // signed spellings included: Rust's f64::from_str (the reference's
      // parser) accepts them all
      case "nan" | "+nan" | "-nan"             => Some(Double.NaN)
      case "inf" | "infinity" | "+inf" | "+infinity" => Some(Double.PositiveInfinity)
      case "-inf" | "-infinity"                => Some(Double.NegativeInfinity)
      case _ =>
        if (FloatShape.matches(cleaned))
          try Some(cleaned.toDouble) catch { case _: Exception => None }
        else None
    }
  }

  def isNumeric(value: String): Boolean = parse(value).isDefined

  /** Double → text without trailing zeros; integral values print as
    * integers (`40.0` → `"40"`); avoids scientific notation. */
  def format(v: Double): String = {
    if (v.isNaN) return "NaN"
    if (v.isInfinite) return if (v > 0) "inf" else "-inf"
    if (v == math.floor(v) && math.abs(v) < 1e15) return v.toLong.toString
    val s = new java.math.BigDecimal(java.lang.Double.toString(v)).toPlainString
    if (s.contains('.')) {
      val trimmed = s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      if (trimmed.isEmpty) "0" else trimmed
    } else s
  }
}
