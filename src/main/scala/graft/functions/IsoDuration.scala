package graft.functions

/**
 * ISO-8601 duration normalization (`PnYnMnDTnHnMnS` / `PnW`).
 *
 * Semantics studied from the reference engine
 * (`crates/tss-submit/src/normalize/normalization/duration.rs:20-283`):
 *  - valid ISO durations pass through verbatim;
 *  - bare numerics are interpreted as days, fractional days become hours
 *    (`1.5` → `P1DT12H`);
 *  - free-text ("2 hours 30 minutes", "5d", "30min") is parsed with a small
 *    unit grammar; weeks-only collapses to `PnW`, mixed weeks become days;
 *  - anything unparseable yields None (caller preserves the original).
 */
object IsoDuration {

  /** Structural ISO-duration check (duration.rs:46-66). */
  def isIsoDuration(v: String): Boolean = {
    if (!v.startsWith("P")) return false
    val rest = v.substring(1)
    if (rest.isEmpty) return false
    if (rest.endsWith("W"))
      return parseF64(rest.dropRight(1)).isDefined
    rest.forall(c => c.isDigit || c == '.' || c == 'T' || "YMDHMS".contains(c))
  }

  // Exception-free numeric parses: validate the shape with one char scan,
  // then hand off to the JDK parser only when it cannot throw. (The previous
  // try/catch versions threw once per non-numeric token — measurable on the
  // n6 hot path, where every free-text duration started with a failed
  // full-string toDouble.)

  /** Plain decimal with optional sign/fraction/exponent — the subset of
    * `Double.parseDouble`'s language the duration grammar means ("Infinity",
    * "NaN", hex floats, and trailing d/f type suffixes are not durations). */
  private def parseF64(s: String): Option[Double] = {
    val len = s.length
    var i = 0
    if (len > 0 && (s.charAt(0) == '+' || s.charAt(0) == '-')) i = 1
    if (i >= len) return None
    var digits = 0
    var dots = 0
    var ok = true
    var j = i
    while (ok && j < len) {
      val c = s.charAt(j)
      if (c >= '0' && c <= '9') { digits += 1; j += 1 }
      else if (c == '.' && dots == 0) { dots = 1; j += 1 }
      else if ((c == 'e' || c == 'E') && digits > 0 && j + 1 < len) {
        var k = j + 1
        val ec = s.charAt(k)
        if (ec == '+' || ec == '-') k += 1
        ok = k < len
        while (ok && k < len) {
          val d = s.charAt(k); ok = d >= '0' && d <= '9'; k += 1
        }
        j = len
      } else ok = false
    }
    if (ok && digits > 0) Some(java.lang.Double.parseDouble(s)) else None
  }

  /** Digits with optional sign; 19-digit values are range-checked against
    * Long.MaxValue lexicographically so no parse can throw. */
  private def parseI64(s: String): Option[Long] = {
    val len = s.length
    val i = if (len > 0 && (s.charAt(0) == '+' || s.charAt(0) == '-')) 1 else 0
    val digits = len - i
    if (i >= len || digits > 19) return None
    var j = i
    while (j < len) {
      val c = s.charAt(j)
      if (c < '0' || c > '9') return None
      j += 1
    }
    if (digits == 19) {
      // |Long.MinValue| = Long.MaxValue + 1, so the negative bound differs
      val limit = if (len > 0 && s.charAt(0) == '-') "9223372036854775808"
                  else "9223372036854775807"
      if (s.substring(i).compareTo(limit) > 0) return None
    }
    Some(java.lang.Long.parseLong(s))
  }

  /** Decimal days → ISO duration (duration.rs:79-104). */
  def fromDays(days: Double): String = {
    if (days == 0.0) return "P0D"
    val sign = if (days < 0) "-" else ""
    val abs = math.abs(days)
    if (abs == math.floor(abs)) return s"${sign}P${abs.toLong}D"
    val whole = math.floor(abs).toLong
    val hours = math.round((abs - math.floor(abs)) * 24.0)
    if (whole == 0) s"${sign}PT${hours}H"
    else if (hours == 0) s"${sign}P${whole}D"
    else s"${sign}P${whole}DT${hours}H"
  }

  // Suffix grammar for combined tokens like "5days", "2h", "30min"
  // (duration.rs:178-230). Longest suffixes first.
  private val suffixes: Seq[(String, Char)] = Seq(
    "years" -> 'Y', "year" -> 'Y',
    "months" -> 'O', "month" -> 'O',
    "weeks" -> 'W', "week" -> 'W',
    "days" -> 'D', "day" -> 'D',
    "hours" -> 'H', "hour" -> 'H', "hrs" -> 'H', "hr" -> 'H', "h" -> 'H',
    "minutes" -> 'M', "minute" -> 'M', "mins" -> 'M', "min" -> 'M', "m" -> 'M',
    "seconds" -> 'S', "second" -> 'S', "secs" -> 'S', "sec" -> 'S', "s" -> 'S',
    "d" -> 'D', "w" -> 'W'
  )

  private final class Parts {
    var y, mo, w, d, h, mi, s = 0L
    def add(unit: Char, n: Long): Unit = unit match {
      case 'Y' => y += n;  case 'O' => mo += n; case 'W' => w += n
      case 'D' => d += n;  case 'H' => h += n;  case 'M' => mi += n
      case 'S' => s += n;  case _   =>
    }
    def set(unit: Char, n: Long): Unit = unit match {
      case 'Y' => y = n;  case 'O' => mo = n; case 'W' => w = n
      case 'D' => d = n;  case 'H' => h = n;  case 'M' => mi = n
      case 'S' => s = n;  case _   =>
    }
  }

  private def unitOfWord(u: String): Option[Char] =
    if (u.startsWith("year")) Some('Y')
    else if (u.startsWith("month")) Some('O')
    else if (u.startsWith("week")) Some('W')
    else if (u.startsWith("day")) Some('D')
    else if (u.startsWith("hour") || u == "h" || u == "hr" || u == "hrs") Some('H')
    else if (u.startsWith("minute") || u == "min" || u == "mins") Some('M')
    else if (u.startsWith("second") || u == "sec" || u == "secs" || u == "s") Some('S')
    else None

  private def parseCombined(part: String): Option[(Char, Long)] =
    suffixes.iterator.flatMap { case (suf, unit) =>
      if (part.endsWith(suf)) parseI64(part.dropRight(suf.length)).map(n => (unit, n))
      else None
    }.nextOption()

  /** Lower-cased whitespace split without the per-call regex compile of
    * `split("\\s+")`. */
  private def words(value: String): Array[String] = {
    val lower = value.toLowerCase(java.util.Locale.ENGLISH)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val len = lower.length
    var i = 0
    while (i < len) {
      while (i < len && Character.isWhitespace(lower.charAt(i))) i += 1
      val st = i
      while (i < len && !Character.isWhitespace(lower.charAt(i))) i += 1
      if (i > st) out += lower.substring(st, i)
    }
    out.toArray
  }

  private def parseText(value: String): Option[String] = {
    val parts = words(value)
    val acc = new Parts
    var i = 0
    var progressed = false
    while (i < parts.length) {
      val part = parts(i)
      parseI64(part) match {
        case Some(num) if i + 1 < parts.length =>
          unitOfWord(parts(i + 1)).foreach { u => acc.set(u, num); progressed = true }
          i += 2
        case _ =>
          parseCombined(part).foreach { case (u, n) => acc.add(u, n); progressed = true }
          i += 1
      }
    }
    if (!progressed) None else build(acc)
  }

  private def build(p: Parts): Option[String] = {
    import p._
    if (w != 0 && y == 0 && mo == 0 && d == 0 && h == 0 && mi == 0 && s == 0)
      return Some(s"P${w}W")
    val hasDate = y != 0 || mo != 0 || d != 0 || w != 0
    val hasTime = h != 0 || mi != 0 || s != 0
    if (!hasDate && !hasTime) return None
    val sb = new StringBuilder("P")
    if (y != 0) sb.append(y).append('Y')
    if (mo != 0) sb.append(mo).append('M')
    val totalDays = d + w * 7
    if (totalDays != 0) sb.append(totalDays).append('D')
    if (hasTime) {
      sb.append('T')
      if (h != 0) sb.append(h).append('H')
      if (mi != 0) sb.append(mi).append('M')
      if (s != 0) sb.append(s).append('S')
    }
    Some(sb.toString)
  }

  /** Main transform: None = unparseable (caller preserves original). */
  def toIso8601(value: String): Option[String] = {
    if (value == null) return None
    val t = value.trim
    if (t.isEmpty) None
    else if (isIsoDuration(t)) Some(t)
    else parseF64(t.replace(",", "")).map(fromDays)
      .orElse(parseText(t))
  }

  /** Total variant used by the normalization operator: preserve original
    * on failure (executor.rs:259-297). */
  def normalize(value: String): String =
    if (value == null) "" else toIso8601(value).getOrElse(value)
}
