package graft.calendar

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar dimension builder — the Spark-native analog of
  * `dba.tcalendardays` + `dba.tholidays` (reference:
  * onboarding/sql/dataset_setup.sql:385-437,460-498): one row per day
  * with ISO day-of-week, day name, business-day flag (weekday and not
  * a holiday), and the previous business date.
  *
  * The previous-business-date computation is the reference's correlated
  * scalar subquery (`dataset_setup.sql:486-493`) re-expressed as a
  * window: `last(businessday, ignoreNulls) over rows unbounded
  * preceding`. The spine is a dimension (≤ a few thousand rows for any
  * realistic span), so the unpartitioned window is deliberate — it
  * never grows with data scale.
  */
object CalendarBuilder {

  def build(
      spark: SparkSession,
      start: LocalDate,
      end: LocalDate,
      holidays: Seq[LocalDate]
  ): DataFrame = {
    val days = spark.sql(
      s"SELECT explode(sequence(to_date('$start'), to_date('$end'), interval 1 day)) AS fulldate"
    )
    val holidayCols = holidays.map(h => java.sql.Date.valueOf(h))
    val flagged = days
      // PG DOW differs from Spark's dayofweek (1=Sunday); expose ISO
      // numbering (1=Monday..7=Sunday) which is unambiguous.
      .withColumn("downum", ((dayofweek(col("fulldate")) + 5) % 7 + 1).cast("int"))
      .withColumn("downame", date_format(col("fulldate"), "EEEE"))
      .withColumn(
        "isholiday",
        if (holidayCols.isEmpty) lit(false) else col("fulldate").isin(holidayCols: _*)
      )
      .withColumn("isbusday", col("downum") <= 5 && !col("isholiday"))
    val w = Window.orderBy("fulldate").rowsBetween(Window.unboundedPreceding, -1)
    flagged.withColumn(
      "previous_business_date",
      last(when(col("isbusday"), col("fulldate")), ignoreNulls = true).over(w)
    )
  }

  /** Default span matching the reference's populated range
    * (dataset_setup.sql:466: 2020-01-01..2030-12-31).
    */
  def default(spark: SparkSession, holidays: Seq[LocalDate] = Seq.empty): DataFrame =
    build(spark, LocalDate.of(2020, 1, 1), LocalDate.of(2030, 12, 31), holidays)
}
