package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Bloom-filter n-gram membership — the constant-memory variant of
  * the decontamination semi-join (cf. `td13_contamination`): instead
  * of shuffling the benchmark gram set into a join, the benchmark is
  * compressed into a fixed-size bit array that ships to every task as
  * a literal. At 100 TB that is the difference between a distributed
  * join against the benchmark grams and a map-only scan with a
  * few-MB broadcast — the standard production shape for "does this
  * training document contain any benchmark n-gram".
  *
  * Determinism: positions are Kirsch–Mitzenmacher double hashes
  * ("Less Hashing, Same Performance", ESA 2006) of the gram's rolling
  * hash (`Sketches.bloomPositions`), `mBits` a power of two, so the
  * DuckDB oracle replays the filter — including its false positives —
  * bit-for-bit. (Bloom, CACM 1970.)
  */
object Bloom {

  /** Build the packed filter (little-endian 64-bit words) from the
    * corpus's distinct word k-grams. The collect is sketch-sized:
    * at most mBits distinct positions regardless of corpus size.
    */
  def buildFilter(
      corpus: DataFrame, textCol: String,
      k: Int, numHashes: Int, mBits: Int): Array[Long] = {
    val positions = corpus
      .select(explode(Sketches.bloomPositionsCol(col(textCol), k, numHashes, mBits)).as("pos"))
      .distinct()
      .collect()
      .map(_.getLong(0))
    val words = new Array[Long](mBits / 64)
    positions.foreach(p => words((p >>> 6).toInt) |= (1L << (p & 63).toInt))
    words
  }

  /** Column: struct(n_grams, n_maybe) — distinct k-grams of `text`
    * and how many of them the filter (maybe-)contains.
    */
  def probe(text: Column, filter: Array[Long], k: Int, numHashes: Int, mBits: Int): Column = {
    require(filter.length == mBits / 64, s"filter must carry ${mBits / 64} words")
    Sketches.bloomProbeCol(text, typedLit(filter.toSeq), k, numHashes, mBits)
  }
}
