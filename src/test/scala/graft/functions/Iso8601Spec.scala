package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Format-cascade matrix ported from the reference's datetime tests
  * (`normalization/datetime.rs:304-369`) plus precision-preservation and
  * preserve-original-on-failure pins. */
class Iso8601Spec extends AnyFunSuite {

  test("already-ISO values pass through verbatim") {
    for (v <- Seq("2024", "2024-01", "2024-01-15", "2024-01-15T10:30",
        "2024-01-15T10:30:45"))
      assert(Iso8601.toIso8601(v) == v)
  }

  test("loose ISO shapes are preserved even when out of range") {
    // structural check only — 2024-13 looks ISO and is kept (datetime.rs:100)
    assert(Iso8601.toIso8601("2024-13") == "2024-13")
  }

  test("date format cascade") {
    val expect = "2024-01-15"
    for (v <- Seq("2024/01/15", "15-Jan-2024", "15-January-2024",
        "15/01/2024", "15.01.2024", "20240115", "Jan 15, 2024",
        "January 15, 2024", "15 Jan 2024", "15 January 2024",
        "2024-Jan-15", "15-01-2024"))
      assert(Iso8601.toIso8601(v) == expect, s"for input $v")
  }

  test("US format when unambiguous (month > 12 on euro read)") {
    assert(Iso8601.toIso8601("01/15/2024") == "2024-01-15")
  }

  test("European day-first wins on ambiguous dates") {
    assert(Iso8601.toIso8601("05/03/2024") == "2024-03-05")
  }

  test("datetime formats") {
    assert(Iso8601.toIso8601("2024-01-15 10:30:45") == "2024-01-15T10:30:45")
    assert(Iso8601.toIso8601("15-Jan-2024 10:30") == "2024-01-15T10:30:00")
    assert(Iso8601.toIso8601("2024/01/15 10:30") == "2024-01-15T10:30:00")
  }

  test("partial precision is preserved, never padded") {
    assert(Iso8601.toIso8601("Jan 2024") == "2024-01")
    assert(Iso8601.toIso8601("January 2024") == "2024-01")
    assert(Iso8601.toIso8601("01/2024") == "2024-01")
    assert(Iso8601.toIso8601("2003-12") == "2003-12")
    assert(Iso8601.toIso8601("1999") == "1999")
  }

  test("invalid calendar dates are preserved, never silently adjusted") {
    // SMART resolution would fabricate 2024-04-30 / 2024-02-29 here
    assert(Iso8601.toIso8601("31/04/2024") == "31/04/2024")
    assert(Iso8601.toIso8601("30.02.2024") == "30.02.2024")
  }

  test("fractional seconds of any width normalize (T-separated only)") {
    assert(Iso8601.toIso8601("2024-1-5T10:30:45.12") == "2024-01-05T10:30:45")
    assert(Iso8601.toIso8601("2024-1-5T10:30:45.123456") == "2024-01-05T10:30:45")
    // reference cascade has %.f only on the T form — space+fraction is
    // preserved-as-unknown (datetime.rs parity)
    assert(Iso8601.toIso8601("2024-1-5 10:30:45.123456") == "2024-1-5 10:30:45.123456")
  }

  test("unparseable input is preserved, not nulled") {
    for (v <- Seq("not a date", "99/99/9999", "tomorrow"))
      assert(Iso8601.toIso8601(v) == v)
  }

  test("month names are case-insensitive, abbreviation or full only") {
    assert(Iso8601.toIso8601("15-JAN-2024") == "2024-01-15")
    assert(Iso8601.toIso8601("15-january-2024") == "2024-01-15")
    assert(Iso8601.toIso8601("SEP 15, 2024") == "2024-09-15")
    // 'Sept' is neither the 3-letter abbreviation nor the full name
    assert(Iso8601.toIso8601("15-Sept-2024") == "15-Sept-2024")
  }

  test("lowercase 't' separator is accepted in the cascade") {
    assert(Iso8601.toIso8601("2024-1-5t10:30") == "2024-01-05T10:30:00")
  }

  test("leap-year day validation is exact") {
    assert(Iso8601.toIso8601("29.02.2024") == "2024-02-29") // leap
    assert(Iso8601.toIso8601("29.02.2023") == "29.02.2023") // not leap
    assert(Iso8601.toIso8601("29.02.1900") == "29.02.1900") // century, not leap
    assert(Iso8601.toIso8601("29.02.2000") == "2000-02-29") // 400-year leap
  }

  test("datetime slash forms keep the day-first preference") {
    assert(Iso8601.toIso8601("05/03/2024 10:30") == "2024-03-05T10:30:00")
    assert(Iso8601.toIso8601("01/15/2024 10:30:45") == "2024-01-15T10:30:45")
  }

  test("out-of-range time fields fail the cascade") {
    for (v <- Seq("2024-1-5 24:00", "2024-1-5 10:60", "2024-1-5 10:30:61"))
      assert(Iso8601.toIso8601(v) == v)
  }

  test("month 13 fails the month-year partial") {
    assert(Iso8601.toIso8601("13/2024") == "13/2024")
  }

  test("doubled separators and stray text fail, like the strict formatters") {
    for (v <- Seq("15  Jan 2024", "Jan 15,2024", "2024-01-15extra",
        "024-01-15", "2024-001-15"))
      assert(Iso8601.toIso8601(v) == v)
  }

  test("outer whitespace is trimmed before the cascade") {
    assert(Iso8601.toIso8601(" 15/01/2024 ") == "2024-01-15")
  }

  test("null and empty → empty") {
    assert(Iso8601.toIso8601(null) == "")
    assert(Iso8601.toIso8601("") == "")
    assert(Iso8601.toIso8601("  ") == "")
  }

  test("study day has no day zero") {
    assert(Iso8601.studyDay("2024-01-10", "2024-01-10").contains(1))
    assert(Iso8601.studyDay("2024-01-11", "2024-01-10").contains(2))
    assert(Iso8601.studyDay("2024-01-09", "2024-01-10").contains(-1))
  }

  test("partial dates yield no study day") {
    assert(Iso8601.studyDay("2024-01", "2024-01-10").isEmpty)
    assert(Iso8601.studyDay("2024-01-15", "2024-01").isEmpty)
    assert(Iso8601.studyDay("garbage", "2024-01-10").isEmpty)
  }

  test("datetime prefix contributes its date to study day") {
    assert(Iso8601.studyDay("2024-01-15T08:00", "2024-01-10").contains(6))
  }
}
