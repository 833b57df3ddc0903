package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Learned quality classifier — the CCNet/GPT-3-style curation scorer:
  * a linear model trained on cheap lexical features against weak
  * labels (a heuristic gate, or membership in a curated reference
  * slice), producing a SMOOTH quality score for threshold sweeps and
  * importance sampling where the hard gate (td22) yields only a bit.
  *
  * Training is batch gradient descent made BIT-REPRODUCIBLE across
  * engines and partitionings:
  *
  *  - the link is the algebraic sigmoid σ̃(z) = 0.5 + z / (2·(1+|z|))
  *    — rational arithmetic only. IEEE 754 specifies +,−,×,÷,|·|
  *    exactly, so every engine computes bit-identical doubles; `exp`
  *    is NOT so specified, and its ulp drift across libm
  *    implementations would break cross-engine replay (the same
  *    reason td43/td45 bucket their log-domain outputs);
  *  - per-row gradient contributions are rounded to integer 1e-9
  *    grains and summed EXACTLY (decimal sums): order-independent, so
  *    the learned weights are invariant under any repartitioning — a
  *    naive double sum is aggregation-order-dependent;
  *  - each iteration is ONE map-side-partial aggregate over the
  *    checkpointed feature frame; the k weight vectors live on the
  *    driver (control-plane: k × (d+1) doubles, the BPE-merge
  *    pattern).
  *
  * Scale note: grain sums stay exact in the final grains→double
  * conversion while |Σ| < 2^53 — ~9e6 docs per aggregate at the 1e-9
  * grain. A 100 TB corpus keeps bit-exactness by coarsening the grain
  * (1e-6 ⇒ ~9e9 docs) — the decimal sum itself is exact at any size.
  */
object QualityModel {

  /** σ̃(z) — the rational logistic link (see object doc). */
  def link(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** Left-associated affine combination w0 + Σ w(i+1)·x_i — the
    * association order is part of the replay contract (double
    * addition does not associate).
    */
  private def affine(w: IndexedSeq[Double], xCols: Seq[String]): Column =
    xCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (c, i)) => acc + lit(w(i + 1)) * col(c)
    }

  /** Result of [[trainScore]]: the learned weights (bias first) and
    * the feature frame extended with the final `score` column.
    */
  final case class Trained(weights: Seq[Double], scored: DataFrame)

  /** Train `iters` gradient steps of the linear scorer on `xCols`
    * (bias implicit) against a 0/1 `yCol`, then score every row.
    *
    * `features` is checkpointed once; every iteration re-reads the
    * materialized rows. Contributions: bias grain = round(r·1e9),
    * feature grain = round((r·x)·1e9) with r = σ̃(z) − y — the exact
    * expression (and its association order) the DuckDB oracle replays.
    */
  def trainScore(
      features: DataFrame,
      xCols: Seq[String],
      yCol: String,
      iters: Int = 8,
      lr: Double = 4.0
  ): Trained = {
    val f = features.localCheckpoint()
    val grain = lit(1e9)
    val w = Array.fill(xCols.size + 1)(0.0)
    // row count rides the FIRST gradient aggregate (one extra count
    // column in the same job) instead of a separate count() pass —
    // n is loop-invariant, so later iterations reuse it
    var n = -1.0
    for (_ <- 1 to iters) {
      val r = link(affine(w.toIndexedSeq, xCols)) - col(yCol)
      val grains =
        (sum(round(r * grain).cast(DecimalType(38, 0))).as("g0") +:
          xCols.zipWithIndex.map { case (c, i) =>
            sum(round((r * col(c)) * grain).cast(DecimalType(38, 0))).as(s"g${i + 1}")
          }) :+ count(org.apache.spark.sql.functions.lit(1)).as("n")
      val sums = f.agg(grains.head, grains.tail: _*).head()
      if (n < 0) {
        n = sums.getLong(xCols.size + 1).toDouble
        require(n > 0, "quality classifier: empty feature frame")
      }
      for (j <- w.indices) {
        val g = sums.getDecimal(j).doubleValue() / 1e9 / n
        w(j) = w(j) - lr * g
      }
    }
    Trained(w.toSeq, f.withColumn("score", link(affine(w.toIndexedSeq, xCols))))
  }
}
