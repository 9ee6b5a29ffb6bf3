package graft.functions

import java.time.{LocalDate, LocalDateTime}

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
 * The cascade is a single hand-rolled, exception-free character-level parser:
 * the input is tokenized once (digit runs, letter runs, separator chars) and
 * dispatched to the one or two candidate formats whose token shape it
 * matches, in the reference's priority order. The previous implementation
 * walked up to 30 `java.time.DateTimeFormatter`s, each miss raising a
 * `DateTimeParseException` (~100 µs/value on anything past the first format —
 * this is the engine's hottest path: every `--DTC` of every domain). The
 * token parser does no exception control flow and no allocation on the miss
 * path.
 *
 * Pure Scala (driver- and executor-safe); wrapped as a native Catalyst
 * expression in [[graft.expressions.IsoNormalize]].
 */
object Iso8601 {

  sealed trait Precision { def toIso: String }
  final case class AtDateTime(dt: LocalDateTime) extends Precision {
    def toIso: String = {
      val sb = new java.lang.StringBuilder(19)
      pad4(sb, dt.getYear).append('-'); pad2(sb, dt.getMonthValue).append('-')
      pad2(sb, dt.getDayOfMonth).append('T'); pad2(sb, dt.getHour).append(':')
      pad2(sb, dt.getMinute).append(':'); pad2(sb, dt.getSecond)
      sb.toString
    }
  }
  final case class AtDate(d: LocalDate) extends Precision {
    def toIso: String = {
      val sb = new java.lang.StringBuilder(10)
      pad4(sb, d.getYear).append('-'); pad2(sb, d.getMonthValue).append('-')
      pad2(sb, d.getDayOfMonth)
      sb.toString
    }
  }
  final case class AtYearMonth(year: Int, month: Int) extends Precision {
    def toIso: String = {
      val sb = new java.lang.StringBuilder(7)
      pad4(sb, year).append('-'); pad2(sb, month)
      sb.toString
    }
  }
  final case class AtYear(year: Int) extends Precision {
    def toIso: String = pad4(new java.lang.StringBuilder(4), year).toString
  }
  final case class AlreadyIso(s: String) extends Precision { def toIso: String = s }
  final case class Unknown(s: String) extends Precision { def toIso: String = s }

  private def pad2(sb: java.lang.StringBuilder, v: Int): java.lang.StringBuilder = {
    if (v < 10) sb.append('0')
    sb.append(v)
  }
  private def pad4(sb: java.lang.StringBuilder, v: Int): java.lang.StringBuilder = {
    if (v < 1000) sb.append('0'); if (v < 100) sb.append('0'); if (v < 10) sb.append('0')
    sb.append(v)
  }

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

  // ---- month-name lookup (English, case-insensitive — the cascade's
  //      formatters were Locale.ENGLISH + parseCaseInsensitive) --------------

  private val monthIndex: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](48)
    val short = Array("jan", "feb", "mar", "apr", "may", "jun",
      "jul", "aug", "sep", "oct", "nov", "dec")
    val full = Array("january", "february", "march", "april", "may", "june",
      "july", "august", "september", "october", "november", "december")
    var i = 0
    while (i < 12) { m.put(short(i), i + 1); m.put(full(i), i + 1); i += 1 }
    m
  }

  // ---- tokenizer -----------------------------------------------------------

  // Longest valid shape: 2024-01-15T10:30:45.123 = 13 tokens
  // (5 digit runs + 'T' + 4 separators + time digits).
  private val MaxToks = 13

  /** Token stream over one value: digit runs (parsed value + width), letter
    * runs (bounds into the source string), single separator chars. */
  private final class Toks {
    val kind = new Array[Char](MaxToks) // 'D', 'A', or the separator itself
    val a = new Array[Int](MaxToks)     // D: numeric value; A: start offset
    val b = new Array[Int](MaxToks)     // D: digit width;   A: end offset
    var n = 0
  }

  /** Single-pass tokenize; false when the string contains characters outside
    * the cascade's alphabet, a >9-digit run, or more tokens than any format
    * uses — all of which mean "no format can match" without trying any. */
  private def tokenize(s: String, tk: Toks): Boolean = {
    val len = s.length
    var i = 0
    var n = 0
    while (i < len) {
      if (n >= MaxToks) return false
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var v = 0
        var w = 0
        var ch = c
        while (ch >= '0' && ch <= '9') {
          v = v * 10 + (ch - '0'); w += 1; i += 1
          ch = if (i < len) s.charAt(i) else 'x'
        }
        if (w > 9) return false
        tk.kind(n) = 'D'; tk.a(n) = v; tk.b(n) = w; n += 1
      } else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) {
        val st = i
        var ch = c
        while ((ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')) {
          i += 1
          ch = if (i < len) s.charAt(i) else '0'
        }
        tk.kind(n) = 'A'; tk.a(n) = st; tk.b(n) = i; n += 1
      } else if (c == '-' || c == '/' || c == '.' || c == ':' || c == ',' || c == ' ') {
        tk.kind(n) = c; n += 1; i += 1
      } else return false
    }
    tk.n = n
    true
  }

  // ---- field validation (STRICT: '31/04/2024' must fail and be preserved
  //      for validation to flag, never adjusted to 2024-04-30) ---------------

  @inline private def isYear(tk: Toks, i: Int): Boolean =
    tk.kind(i) == 'D' && tk.b(i) == 4
  @inline private def isF2(tk: Toks, i: Int): Boolean = // 1-2 digit field
    tk.kind(i) == 'D' && tk.b(i) <= 2

  private def leapYear(y: Int): Boolean =
    (y % 4 == 0 && y % 100 != 0) || y % 400 == 0
  private def daysInMonth(y: Int, m: Int): Int = m match {
    case 2              => if (leapYear(y)) 29 else 28
    case 4 | 6 | 9 | 11 => 30
    case _              => 31
  }
  private def validDate(y: Int, m: Int, d: Int): Boolean =
    m >= 1 && m <= 12 && d >= 1 && d <= daysInMonth(y, m)

  /** Month number of an alpha token: 3-letter abbreviation or full English
    * name, any case; -1 when not a month. */
  private def monthOf(s: String, tk: Toks, i: Int): Int = {
    if (tk.kind(i) != 'A') return -1
    val w = tk.b(i) - tk.a(i)
    if (w != 3 && (w < 4 || w > 9)) return -1
    val m = monthIndex.get(
      s.substring(tk.a(i), tk.b(i)).toLowerCase(java.util.Locale.ENGLISH))
    if (m == null) -1 else m.intValue
  }

  /** Parse `H:m`, `H:m:s`, or (when `allowFrac`) `H:m:s.f` from token `j` to
    * the end of the stream. Returns `h*10000 + m*100 + s` or -1. Fractional
    * seconds (1-9 digits) are accepted and dropped — the cascade's `%.f` is
    * on the T-separated form only. */
  private def timeTail(tk: Toks, j: Int, allowFrac: Boolean): Int = {
    val n = tk.n
    if (j + 3 > n || !isF2(tk, j) || tk.kind(j + 1) != ':' || !isF2(tk, j + 2))
      return -1
    val h = tk.a(j)
    val mi = tk.a(j + 2)
    if (h > 23 || mi > 59) return -1
    if (n == j + 3) return h * 10000 + mi * 100
    if (tk.kind(j + 3) != ':' || j + 5 > n || !isF2(tk, j + 4)) return -1
    val s = tk.a(j + 4)
    if (s > 59) return -1
    if (n == j + 5) return h * 10000 + mi * 100 + s
    if (allowFrac && n == j + 7 && tk.kind(j + 5) == '.' && tk.kind(j + 6) == 'D')
      return h * 10000 + mi * 100 + s
    -1
  }

  @inline private def atDT(y: Int, m: Int, d: Int, packed: Int): Precision =
    AtDateTime(LocalDateTime.of(y, m, d, packed / 10000, packed / 100 % 100, packed % 100))

  /** Single-letter 'T' token (case-insensitive, as parseCaseInsensitive was). */
  @inline private def isTsep(s: String, tk: Toks, i: Int): Boolean =
    tk.kind(i) == 'A' && tk.b(i) - tk.a(i) == 1 &&
      (s.charAt(tk.a(i)) == 'T' || s.charAt(tk.a(i)) == 't')

  /**
   * The format cascade over the token stream, in reference priority order
   * (datetime.rs:186-270): datetimes, then dates, then month-year partials.
   * Token shapes are mutually disjoint across the datetime/date/partial
   * groups (times require ':', partials have fewer tokens), so dispatching
   * by shape preserves the cascade order exactly; within a shared shape
   * (`d/M/uuuu` vs `M/d/uuuu`) the cascade's day-first preference is kept.
   * Returns null when nothing matches (caller preserves the original).
   */
  private def parseTokens(s: String, tk: Toks): Precision = {
    val n = tk.n

    // ---- datetime family (shape: date tokens + sep + H:m[:s][.f]) ----------
    if (n >= 9 && n <= MaxToks) {
      val k1 = tk.kind(1)
      if (k1 == '-' && tk.kind(3) == '-' && isYear(tk, 0) && isF2(tk, 2) && isF2(tk, 4)) {
        // uuuu-M-d'T'H:m:s(.f) | uuuu-M-d'T'H:m | uuuu-M-d H:m[:s]
        val tSep = isTsep(s, tk, 5)
        if (tSep || tk.kind(5) == ' ') {
          val t = timeTail(tk, 6, allowFrac = tSep)
          if (t >= 0 && validDate(tk.a(0), tk.a(2), tk.a(4)))
            return atDT(tk.a(0), tk.a(2), tk.a(4), t)
        }
      } else if (k1 == '/' && tk.kind(3) == '/' && tk.kind(5) == ' ') {
        val t = timeTail(tk, 6, allowFrac = false)
        if (t >= 0) {
          // uuuu/M/d H:m[:s] first, then d/M/uuuu (European), then M/d (US)
          if (isYear(tk, 0) && isF2(tk, 2) && isF2(tk, 4) &&
              validDate(tk.a(0), tk.a(2), tk.a(4)))
            return atDT(tk.a(0), tk.a(2), tk.a(4), t)
          if (isF2(tk, 0) && isF2(tk, 2) && isYear(tk, 4)) {
            if (validDate(tk.a(4), tk.a(2), tk.a(0)))
              return atDT(tk.a(4), tk.a(2), tk.a(0), t)
            if (validDate(tk.a(4), tk.a(0), tk.a(2)))
              return atDT(tk.a(4), tk.a(0), tk.a(2), t)
          }
        }
      } else if (k1 == '-' && tk.kind(3) == '-' && tk.kind(5) == ' ' &&
          isF2(tk, 0) && isYear(tk, 4) && tk.kind(2) == 'A' &&
          tk.b(2) - tk.a(2) == 3) {
        // d-MMM-uuuu H:m[:s] — the datetime cascade has only the 3-letter
        // abbreviation form (the full-name d-MMMM-uuuu exists date-only)
        val mo = monthOf(s, tk, 2)
        val t = timeTail(tk, 6, allowFrac = false)
        if (mo > 0 && t >= 0 && validDate(tk.a(4), mo, tk.a(0)))
          return atDT(tk.a(4), mo, tk.a(0), t)
      }
    }

    // ---- date family (datetime.rs:214-231) ----------------------------------
    if (n == 5) {
      val k1 = tk.kind(1)
      val k3 = tk.kind(3)
      if (k1 == '-' && k3 == '-') {
        if (tk.kind(2) == 'D') {
          // uuuu-M-d, then d-M-uuuu
          if (isYear(tk, 0) && isF2(tk, 2) && isF2(tk, 4) &&
              validDate(tk.a(0), tk.a(2), tk.a(4)))
            return AtDate(LocalDate.of(tk.a(0), tk.a(2), tk.a(4)))
          if (isF2(tk, 0) && isF2(tk, 2) && isYear(tk, 4) &&
              validDate(tk.a(4), tk.a(2), tk.a(0)))
            return AtDate(LocalDate.of(tk.a(4), tk.a(2), tk.a(0)))
        } else {
          // d-MMM-uuuu / d-MMMM-uuuu (abbrev or full), then uuuu-MMM-d
          // (the year-first form exists with the 3-letter abbreviation only)
          val mo = monthOf(s, tk, 2)
          if (mo > 0) {
            if (isF2(tk, 0) && isYear(tk, 4) && validDate(tk.a(4), mo, tk.a(0)))
              return AtDate(LocalDate.of(tk.a(4), mo, tk.a(0)))
            if (isYear(tk, 0) && isF2(tk, 4) && tk.b(2) - tk.a(2) == 3 &&
                validDate(tk.a(0), mo, tk.a(4)))
              return AtDate(LocalDate.of(tk.a(0), mo, tk.a(4)))
          }
        }
      } else if (k1 == '/' && k3 == '/') {
        // uuuu/M/d, then d/M/uuuu (European), then M/d/uuuu (US)
        if (isYear(tk, 0) && isF2(tk, 2) && isF2(tk, 4) &&
            validDate(tk.a(0), tk.a(2), tk.a(4)))
          return AtDate(LocalDate.of(tk.a(0), tk.a(2), tk.a(4)))
        if (isF2(tk, 0) && isF2(tk, 2) && isYear(tk, 4)) {
          if (validDate(tk.a(4), tk.a(2), tk.a(0)))
            return AtDate(LocalDate.of(tk.a(4), tk.a(2), tk.a(0)))
          if (validDate(tk.a(4), tk.a(0), tk.a(2)))
            return AtDate(LocalDate.of(tk.a(4), tk.a(0), tk.a(2)))
        }
      } else if (k1 == '.' && k3 == '.' &&
          isF2(tk, 0) && isF2(tk, 2) && isYear(tk, 4) &&
          validDate(tk.a(4), tk.a(2), tk.a(0))) {
        // d.M.uuuu (German)
        return AtDate(LocalDate.of(tk.a(4), tk.a(2), tk.a(0)))
      } else if (k1 == ' ' && k3 == ' ' && isF2(tk, 0) && isYear(tk, 4)) {
        // d MMM uuuu / d MMMM uuuu
        val mo = monthOf(s, tk, 2)
        if (mo > 0 && validDate(tk.a(4), mo, tk.a(0)))
          return AtDate(LocalDate.of(tk.a(4), mo, tk.a(0)))
      }
    } else if (n == 1 && tk.kind(0) == 'D' && tk.b(0) == 8) {
      // uuuuMMdd compact
      val v = tk.a(0)
      val y = v / 10000
      val mo = v / 100 % 100
      val d = v % 100
      if (validDate(y, mo, d)) return AtDate(LocalDate.of(y, mo, d))
    } else if (n == 6 && tk.kind(1) == ' ' && isF2(tk, 2) && tk.kind(3) == ',' &&
        tk.kind(4) == ' ' && isYear(tk, 5)) {
      // MMM d, uuuu / MMMM d, uuuu
      val mo = monthOf(s, tk, 0)
      if (mo > 0 && validDate(tk.a(5), mo, tk.a(2)))
        return AtDate(LocalDate.of(tk.a(5), mo, tk.a(2)))
    }

    // ---- month-year partials (datetime.rs:255-270) --------------------------
    if (n == 3) {
      if (tk.kind(1) == ' ' && isYear(tk, 2)) {
        // MMM uuuu / MMMM uuuu
        val mo = monthOf(s, tk, 0)
        if (mo > 0) return AtYearMonth(tk.a(2), mo)
      } else if (tk.kind(1) == '/' && isF2(tk, 0) && isYear(tk, 2) &&
          tk.a(0) >= 1 && tk.a(0) <= 12) {
        // M/uuuu
        return AtYearMonth(tk.a(2), tk.a(0))
      }
    }
    null
  }

  /** Full-precision parse, the reference's `parse_date_precision`. */
  def parsePrecision(value: String): Precision = {
    val t = value.trim
    if (t.isEmpty) return Unknown("")
    if (isValidIsoShape(t)) return AlreadyIso(t)
    val tk = new Toks
    if (!tokenize(t, tk)) return Unknown(t)
    val p = parseTokens(t, tk)
    if (p == null) Unknown(t) else p
  }

  /** Main transform: normalize to ISO-8601, preserving precision and
    * preserving the original value when unparseable. Total function. */
  def toIso8601(value: String): String =
    if (value == null) "" else parsePrecision(value).toIso

  @inline private def dig2(s: String, i: Int): Int =
    (s.charAt(i) - '0') * 10 + (s.charAt(i + 1) - '0')

  /** Date component for study-day math; only full-day precision counts
    * (studyday.rs:62-78). Partial dates yield None. */
  def dateForStudyDay(value: String): Option[LocalDate] =
    if (value == null) None
    else parsePrecision(value) match {
      case AtDateTime(dt) => Some(dt.toLocalDate)
      case AtDate(d)      => Some(d)
      case AlreadyIso(s)  =>
        // the ISO shape guarantees digits at 0-3/5-6/8-9 with '-' at 4/7;
        // range-validate here (the shape check deliberately does not)
        if (s.length >= 10) {
          val y = dig2(s, 0) * 100 + dig2(s, 2)
          val m = dig2(s, 5)
          val d = dig2(s, 8)
          if (validDate(y, m, d)) Some(LocalDate.of(y, m, d)) else None
        } else None
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
