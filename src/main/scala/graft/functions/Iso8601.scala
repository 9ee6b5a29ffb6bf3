package graft.functions

import java.time.{LocalDate, LocalDateTime}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder, ResolverStyle}
import java.util.Locale

/**
 * ISO-8601 date/time normalization with partial-precision preservation.
 *
 * Semantics studied from the reference engine
 * (`crates/tss-submit/src/normalize/normalization/datetime.rs:10-302`):
 *  - values already in (loose) ISO-8601 form are preserved verbatim;
 *  - otherwise a cascade of datetime, date, and partial (year-month / year)
 *    formats is tried in a fixed order;
 *  - partial precision survives (`2003-12` stays `2003-12`, never `2003-12-01`);
 *  - unparseable input is returned unchanged (never nulled) so downstream
 *    validation can flag it while the data is preserved.
 *
 * Pure Scala (driver- and executor-safe); wrapped as a Spark UDF in
 * [[graft.operators.Normalize]].
 */
object Iso8601 {

  sealed trait Precision { def toIso: String }
  final case class AtDateTime(dt: LocalDateTime) extends Precision {
    def toIso: String = dt.format(DateTimeFormatter.ofPattern("uuuu-MM-dd'T'HH:mm:ss"))
  }
  final case class AtDate(d: LocalDate) extends Precision {
    def toIso: String = d.format(DateTimeFormatter.ISO_LOCAL_DATE)
  }
  final case class AtYearMonth(year: Int, month: Int) extends Precision {
    def toIso: String = f"$year%04d-$month%02d"
  }
  final case class AtYear(year: Int) extends Precision {
    def toIso: String = f"$year%04d"
  }
  final case class AlreadyIso(s: String) extends Precision { def toIso: String = s }
  final case class Unknown(s: String) extends Precision { def toIso: String = s }

  private def fmt(pattern: String): DateTimeFormatter =
    new DateTimeFormatterBuilder()
      .parseCaseInsensitive()
      .appendPattern(pattern)
      .toFormatter(Locale.ENGLISH)
      // STRICT: '31/04/2024' must fail (and be preserved for validation to
      // flag), not be silently adjusted to 2024-04-30 as SMART would
      .withResolverStyle(ResolverStyle.STRICT)

  /** Seconds-with-fraction formatter: accepts 1-9 fractional digits like
    * the reference's `%.f` (an exact-width `.SSS` would reject `.12`). */
  private def fracFmt(base: String): DateTimeFormatter =
    new DateTimeFormatterBuilder()
      .parseCaseInsensitive()
      .appendPattern(base)
      .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 1, 9, true)
      .toFormatter(Locale.ENGLISH)
      .withResolverStyle(ResolverStyle.STRICT)

  // Full datetime formats, in reference priority order
  // (datetime.rs:186-201). Single-letter fields accept 1-2 digits.
  // Only the T-separated form accepts fractional seconds: the reference
  // cascade has %.f on "%Y-%m-%dT%H:%M:%S" only, so '2024-01-15 10:30:45.5'
  // must be preserved-as-unknown, not normalized (cascade parity).
  private val dateTimeFormats: Array[DateTimeFormatter] = Array(
    fracFmt("uuuu-M-d'T'H:m:s")) ++ Array(
    "uuuu-M-d'T'H:m:s",
    "uuuu-M-d'T'H:m",
    "uuuu-M-d H:m:s",
    "uuuu-M-d H:m",
    "uuuu/M/d H:m:s",
    "uuuu/M/d H:m",
    "d-MMM-uuuu H:m:s", // 15-Jan-2024 10:30:00
    "d-MMM-uuuu H:m",
    "d/M/uuuu H:m:s",   // European
    "d/M/uuuu H:m",
    "M/d/uuuu H:m:s",   // US
    "M/d/uuuu H:m"
  ).map(fmt)

  // Date-only formats (datetime.rs:214-231).
  private val dateFormats: Array[DateTimeFormatter] = Array(
    "uuuu-M-d",
    "uuuu/M/d",
    "d-MMM-uuuu",   // 15-Jan-2024
    "d-MMMM-uuuu",  // 15-January-2024
    "d/M/uuuu",     // European: 15/01/2024
    "M/d/uuuu",     // US: 01/15/2024
    "d.M.uuuu",     // German: 15.01.2024
    "uuuuMMdd",     // Compact: 20240115
    "MMM d, uuuu",  // Jan 15, 2024
    "MMMM d, uuuu", // January 15, 2024
    "d MMM uuuu",   // 15 Jan 2024
    "d MMMM uuuu",  // 15 January 2024
    "uuuu-MMM-d",   // 2024-Jan-15
    "d-M-uuuu"      // 15-01-2024
  ).map(fmt)

  // Month-year partials (datetime.rs:255-270).
  private val monthYearFormats: Array[DateTimeFormatter] =
    Array("MMM uuuu", "MMMM uuuu", "M/uuuu").map(p => fmt(p + " d"))

  /**
   * Loose structural ISO-8601 check (digit positions only, no range
   * validation) — mirrors `is_valid_iso8601` (datetime.rs:100-182): values
   * that *look* ISO are preserved untouched, even `2024-13`.
   */
  def isValidIsoShape(v: String): Boolean = {
    val len = v.length
    @inline def digit(i: Int) = Character.isDigit(v.charAt(i))
    if (len < 4 || !(digit(0) && digit(1) && digit(2) && digit(3))) return false
    if (len == 4) return true
    if (len < 5 || v.charAt(4) != '-') return false
    if (len == 7) return digit(5) && digit(6)
    if (len < 10) return false
    if (!(digit(5) && digit(6) && v.charAt(7) == '-' && digit(8) && digit(9))) return false
    if (len == 10) return true
    if (len >= 16 && v.charAt(10) == 'T' &&
        digit(11) && digit(12) && v.charAt(13) == ':' && digit(14) && digit(15)) {
      if (len == 16) return true
      if (len >= 19 && v.charAt(16) == ':' && digit(17) && digit(18)) return true
    }
    false
  }

  private def tryParse[T](v: String, f: DateTimeFormatter, parse: (String, DateTimeFormatter) => T): Option[T] =
    try Some(parse(v, f)) catch { case _: Exception => None }

  def tryParseDateTime(v: String): Option[LocalDateTime] =
    dateTimeFormats.iterator.flatMap(f => tryParse(v, f, LocalDateTime.parse)).nextOption()

  def tryParseDate(v: String): Option[LocalDate] =
    dateFormats.iterator.flatMap(f => tryParse(v, f, LocalDate.parse)).nextOption()

  private val YyyyMm = "^(\\d{4})-(\\d{2})$".r

  def tryParseYearMonth(v: String): Option[Precision] = {
    v match {
      case YyyyMm(y, m) if m.toInt >= 1 && m.toInt <= 12 =>
        return Some(AtYearMonth(y.toInt, m.toInt))
      case _ =>
    }
    if (v.length == 4 && v.forall(Character.isDigit)) {
      val y = v.toInt
      if (y >= 1900 && y <= 2100) return Some(AtYear(y))
    }
    monthYearFormats.iterator
      .flatMap(f => tryParse(v + " 1", f, LocalDate.parse))
      .nextOption()
      .map(d => AtYearMonth(d.getYear, d.getMonthValue))
  }

  /** Full-precision parse, the reference's `parse_date_precision`. */
  def parsePrecision(value: String): Precision = {
    val t = value.trim
    if (t.isEmpty) Unknown("")
    else if (isValidIsoShape(t)) AlreadyIso(t)
    else tryParseDateTime(t).map(AtDateTime.apply)
      .orElse(tryParseDate(t).map(AtDate.apply))
      .orElse(tryParseYearMonth(t))
      .getOrElse(Unknown(t))
  }

  /** Main transform: normalize to ISO-8601, preserving precision and
    * preserving the original value when unparseable. Total function. */
  def toIso8601(value: String): String =
    if (value == null) "" else parsePrecision(value).toIso

  /** Date component for study-day math; only full-day precision counts
    * (studyday.rs:62-78). Partial dates yield None. */
  def dateForStudyDay(value: String): Option[LocalDate] =
    if (value == null) None
    else parsePrecision(value) match {
      case AtDateTime(dt) => Some(dt.toLocalDate)
      case AtDate(d)      => Some(d)
      case AlreadyIso(s)  =>
        if (s.length >= 10)
          tryParse(s.substring(0, 10), DateTimeFormatter.ISO_LOCAL_DATE, LocalDate.parse)
        else None
      case _ => None
    }

  /** Study day: (event - ref) + 1 when on/after reference, else (event - ref);
    * there is no day 0 (studyday.rs:38-48). */
  def studyDay(eventDtc: String, refDtc: String): Option[Int] =
    for {
      ev  <- dateForStudyDay(eventDtc)
      ref <- dateForStudyDay(refDtc)
    } yield {
      val days = java.time.temporal.ChronoUnit.DAYS.between(ref, ev).toInt
      if (days >= 0) days + 1 else days
    }
}
