package graft

import java.time.LocalDate

import graft.calendar.CalendarBuilder

class CalendarSpec extends SparkSpec {

  // FIXTURES.md F4: 2025 with New Year / July 4 / Christmas holidays
  private val holidays =
    Seq(LocalDate.of(2025, 1, 1), LocalDate.of(2025, 7, 4), LocalDate.of(2025, 12, 25))

  private lazy val cal = CalendarBuilder
    .build(spark, LocalDate.of(2025, 1, 1), LocalDate.of(2025, 12, 31), holidays)
    .collect()
    .map(r =>
      r.getDate(0).toLocalDate ->
        (r.getInt(1), r.getString(2), r.getBoolean(3), r.getBoolean(4),
          Option(r.getDate(5)).map(_.toLocalDate))
    )
    .toMap

  test("spine covers the full year") {
    assert(cal.size == 365)
  }

  test("day-of-week numbering is ISO (Monday=1)") {
    // 2025-01-06 is a Monday
    assert(cal(LocalDate.of(2025, 1, 6))._1 == 1)
    assert(cal(LocalDate.of(2025, 1, 6))._2 == "Monday")
    // 2025-01-05 is a Sunday
    assert(cal(LocalDate.of(2025, 1, 5))._1 == 7)
  }

  test("holidays and weekends are not business days") {
    assert(cal(LocalDate.of(2025, 7, 4))._3)        // holiday flag
    assert(!cal(LocalDate.of(2025, 7, 4))._4)       // not a busday
    assert(!cal(LocalDate.of(2025, 7, 5))._4)       // Saturday
    assert(cal(LocalDate.of(2025, 7, 3))._4)        // Thursday
  }

  test("previous business date skips weekends AND holidays (golden: Mon 2025-07-07 -> Thu 2025-07-03)") {
    // FIXTURES.md F4 golden check: Fri Jul 4 is a holiday, so the
    // previous business day before Monday Jul 7 is Thursday Jul 3.
    assert(cal(LocalDate.of(2025, 7, 7))._5.contains(LocalDate.of(2025, 7, 3)))
    // plain Tuesday -> Monday
    assert(cal(LocalDate.of(2025, 3, 11))._5.contains(LocalDate.of(2025, 3, 10)))
    // first day of span has no previous business date
    assert(cal(LocalDate.of(2025, 1, 1))._5.isEmpty)
  }
}
