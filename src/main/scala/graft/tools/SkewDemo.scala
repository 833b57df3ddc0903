package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.Skew

/** CLI demo of the skew utilities: a hot-key join computed plain vs
  * salted, asserting equality and showing the spread.
  * `sbt "runMain graft.tools.SkewDemo"`.
  */
object SkewDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "graft-skew-demo")
    import spark.implicits._
    val big = spark.range(0, 200000)
      .select(
        when(col("id") % 3 === 0, lit("HOT"))
          .otherwise(concat(lit("k"), col("id") % 50)).as("k"),
        col("id").as("v"))
    val small = (Seq(("HOT", 1)) ++ (0 until 50).map(i => (s"k$i", i))).toDF("k", "w")
    val plain = big.join(small, Seq("k")).agg(sum("v").as("s"), count(lit(1)).as("n")).head()
    val salted = Skew.saltedJoin(big, small, "k", salt = 16)
      .agg(sum("v").as("s"), count(lit(1)).as("n")).head()
    println(s"[demo] plain=$plain salted=$salted equal=${plain == salted}")
    val twoPhase = Skew.twoPhaseAgg(
      big, "k", salt = 16,
      agg = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      merge = Seq(sum("ps").as("s"), sum("pn").as("n")))
    val direct = big.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
    val diff = twoPhase.except(direct).count() + direct.except(twoPhase).count()
    println(s"[demo] two-phase vs direct agg diff rows: $diff")
    spark.stop()
  }
}
