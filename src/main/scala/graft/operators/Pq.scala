package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze & Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): split the vector into
  * `m` subspaces, k-means each subspace independently, store one byte
  * (k ≤ 256) per subspace per vector — 64 dims × float32 compress to
  * `m` bytes (64× at m=4) — and search in the COMPRESSED domain via
  * ADC (asymmetric distance): per query, precompute the k×m table of
  * subspace distances, then a corpus vector's distance is m table
  * lookups, no float vectors touched.
  *
  * Spark shape: training reuses [[Ivf.train]]'s deterministic Lloyd
  * (decimal-exact means, smallest-id init) per subspace slice, so the
  * WHOLE pipeline — codebooks, codes, ADC ranking — replays bit-exact
  * in the DuckDB oracle. Encoding and search are map-only passes with
  * the codebooks broadcast (a few KB).
  */
object Pq {

  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def subDim: Int = codebooks(0)(0).length
  }

  private def dist2(a: Array[Double], b: Array[Double], aOff: Int): Double = {
    var s = 0.0; var i = 0
    while (i < b.length) { val d = a(aOff + i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Per-subspace deterministic Lloyd via [[Ivf.train]] on the slice. */
  def train(
      df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int, dim: Int): Model = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val d = dim / m
    val books = (0 until m).map { s =>
      val sub = df.select(col(idCol),
        slice(transform(col(vecCol), _.cast("double")), s * d + 1, d).as("subv"))
      Ivf.train(sub, idCol, "subv", k, iters).centroids
    }.toArray
    Model(books)
  }

  /** (id, codes array<int>) — one nearest-centroid index per
    * subspace; map-only with the model broadcast.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val mod = bc.value
        val d = mod.subDim
        rows.map { case (id, v) =>
          val codes = new Array[Int](mod.m)
          var s = 0
          while (s < mod.m) {
            val cb = mod.codebooks(s)
            var best = 0; var bestD = Double.MaxValue; var c = 0
            while (c < cb.length) {
              val dd = dist2(v, cb(c), s * d)
              if (dd < bestD) { bestD = dd; best = c }
              c += 1
            }
            codes(s) = best
            s += 1
          }
          (id, codes)
        }
      }
      .toDF(idCol, "codes")
  }

  /** ADC top-k: for each query, distance to a corpus vector =
    * Σ_s dist2(query_sub_s, codebook_s(code_s)) — subspace terms
    * summed in subspace order (fixed association; the oracle replays
    * it). Codes + codebooks broadcast; queries stream map-only.
    */
  def adcSearch(
      encoded: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      model: Model, k: Int, roundTo: Int = 4): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val codes = encoded.select(col(idCol).cast("long"), col("codes"))
      .as[(Long, Array[Int])].collect().sortBy(_._1)
    val bcCodes = spark.sparkContext.broadcast(codes)
    val bcModel = spark.sparkContext.broadcast(model)
    queries.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val mod = bcModel.value
        val cs = bcCodes.value
        val d = mod.subDim
        rows.flatMap { case (qid, qv) =>
          // ADC table: per (subspace, centroid) distance for THIS query
          val table = Array.tabulate(mod.m, mod.codebooks(0).length) { (s, c) =>
            dist2(qv, mod.codebooks(s)(c), s * d)
          }
          val scored = cs.iterator
            .filter(_._1 != qid)
            .map { case (cid, code) =>
              var dist = 0.0
              var s = 0
              while (s < mod.m) { dist += table(s)(code(s)); s += 1 }
              val r = BigDecimal(dist)
                .setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble
              (r, cid)
            }
            .toArray
          scala.util.Sorting.quickSort(scored)(Ordering.Tuple2[Double, Long])
          scored.take(k).zipWithIndex.map { case ((dist, cid), i) =>
            (qid, cid, dist, i + 1)
          }
        }
      }
      .toDF("query_id", "corpus_id", "adc_dist", "rank")
  }
}
