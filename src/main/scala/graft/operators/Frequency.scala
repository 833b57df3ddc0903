package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MixedHash64

/** Frequency estimation over token streams: Count-Min sketch heavy
  * hitters (Cormode & Muthukrishnan, J. Algorithms 2005) and
  * vocabulary-based OOV scoring.
  *
  * Scale design: the exact term-frequency table is the one real
  * shuffle (unavoidable — it IS the aggregation); the CM sketch is
  * d×w integer counters — a few KB — so the estimate join broadcasts.
  * On a 100 TB corpus you would keep only the sketch (built with one
  * map-side-combined groupBy over (row, position)) and probe candidate
  * terms against it; here the exact counts are also produced so the
  * oracle can verify estimate ≥ exact and pin every counter value.
  *
  * Determinism: position hashing is `mixed_hash64("cm<r>:" + term)`
  * reduced by signed pmod — replayed exactly in the DuckDB oracle
  * (same HUGEINT fold/fmix as the other sketches).
  */
object Frequency {

  /** Non-empty whitespace tokens with their exact corpus counts. */
  def termCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term")
      .count()
      .withColumnRenamed("count", "n")

  /** Count-Min counters from a term-frequency table: row r ∈ [0,d),
    * position = pmod(mixed_hash64('cm' r ':' term), w). Aggregating
    * the tf table (not the raw token stream) is equivalent — the
    * counter sums the same occurrences — and touches d·|vocab| rows
    * instead of d·|tokens|.
    */
  def countMinCounters(tf: DataFrame, d: Int, w: Int): DataFrame = {
    MixedHash64.register(tf.sparkSession)
    tf.select(col("term"), col("n"), explode(array((0 until d).map(lit): _*)).as("r"))
      .withColumn("pos",
        pmod(MixedHash64(concat(lit("cm"), col("r").cast("string"), lit(":"), col("term"))),
          lit(w.toLong)))
      .groupBy("r", "pos")
      .agg(sum("n").as("c"))
  }

  /** Top-k terms by exact count with their CM estimates (min over the
    * d row counters — always ≥ the exact count; the gap is collision
    * error, deterministic here).
    */
  def heavyHitters(df: DataFrame, textCol: String, d: Int, w: Int, topK: Int): DataFrame = {
    val tf = termCounts(df, textCol)
    val counters = countMinCounters(tf, d, w)
    val probed = tf
      .select(col("term"), col("n"), explode(array((0 until d).map(lit): _*)).as("r"))
      .withColumn("pos",
        pmod(MixedHash64(concat(lit("cm"), col("r").cast("string"), lit(":"), col("term"))),
          lit(w.toLong)))
      .join(broadcast(counters), Seq("r", "pos"))
      .groupBy("term")
      .agg(max("n").as("exact_count"), min("c").as("cm_estimate"))
    probed
      .orderBy(desc("exact_count"), asc("term"))
      .limit(topK)
  }

  /** Out-of-vocabulary ratio per document: vocabulary = terms with
    * corpus count ≥ minCount; a high OOV share flags gibberish /
    * non-linguistic text (the deterministic sibling of LM-perplexity
    * quality filtering). Keeps empty documents (ratio 0.0).
    */
  def oovRatio(df: DataFrame, idCol: String, textCol: String, minCount: Long): DataFrame = {
    val toks = df
      .select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val vocab = toks.groupBy("term").count().filter(col("count") >= minCount).select("term")
    val tot = toks.groupBy(idCol).agg(count(lit(1)).as("n_tokens"))
    val oov = toks
      .join(vocab, Seq("term"), "left_anti")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_oov"))
    df.select(col(idCol))
      .join(tot, Seq(idCol), "left")
      .join(oov, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          coalesce(col("n_oov"), lit(0L)).cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)).as("oov_ratio"))
  }
}
