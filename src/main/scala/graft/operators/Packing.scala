package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing — the pretraining batch-prep step: concatenate
  * documents in a deterministic order into fixed token-capacity bins
  * (greedy fill: a document that would overflow the current bin
  * starts the next one; an oversized document gets a bin to itself).
  *
  * Parallelism: packing is inherently sequential WITHIN a bin stream,
  * so the operator packs independently per group (source shard, date,
  * …) — groups pack in parallel via `flatMapSortedGroups`, the
  * intra-group scan is a single ordered pass. That is exactly how a
  * 100 TB corpus packs in production: per-shard streams, never a
  * global sequential pass. Determinism: (group, doc_id) ordering
  * fixes every bin assignment; the DuckDB oracle replays the greedy
  * scan with a recursive CTE.
  */
object Packing {

  final case class Packed(
      group: String, doc_id: Long, n_tokens: Int, bin_id: Int, bin_offset: Int)

  /** @param tokens (group, doc_id, n_tokens) rows.
    * @return one row per document with its bin and token offset.
    */
  def packSequences(tokens: DataFrame, capacity: Int): Dataset[Packed] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens
      .select(col("group").cast("string"), col("doc_id").cast("long"),
        col("n_tokens").cast("int"))
      .as[(String, Long, Int)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"doc_id") { (g, it) =>
        // sequential greedy scan; the lazy map is consumed in order
        var started = false
        var bin = 0
        var fill = 0
        it.map { case (_, id, n) =>
          var offset = 0
          if (!started) { started = true; fill = n }
          else if (fill + n <= capacity) { offset = fill; fill += n }
          else { bin += 1; fill = n }
          Packed(g, id, n, bin, offset)
        }
      }
  }
}
