package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Bounded, plan-deduplicated persistence for operator-internal reuse
 * frames (shingle tables, IVF assignments).
 *
 * Operators like near-dup Jaccard scan their shingle frame three times in
 * one query; persisting it is a 2-5× win. But an implicit `.cache()` with
 * no owner leaks: in a long-lived session every distinct corpus adds an
 * entry to Spark's CacheManager that nothing ever unpersists. This
 * registry keeps the win and bounds the lifecycle:
 *
 *  - semantically identical plans (same corpus, same params) share ONE
 *    cached frame — repeat invocations warm instead of accumulate;
 *  - at most [[MaxEntries]] distinct frames stay persisted, LRU-evicted
 *    with an explicit `unpersist`, so memory use is bounded by design;
 *  - [[clear]] drops everything deterministically (tests, teardown).
 *
 * At 100 TB this in-memory path is the wrong tool regardless — iterating
 * pipelines materialize the shingle frame to a zone table once and read
 * it back; this registry exists for the interactive/benchmark shape where
 * the reuse frame fits the cluster's storage memory.
 */
object BoundedCache {

  private val MaxEntries = 16
  private val entries = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` (memory-and-disk), deduplicating by semantic plan
    * equality against live entries and LRU-evicting beyond capacity.
    * Returns the frame to build on (the existing entry on a hit). */
  def cached(df: DataFrame): DataFrame = synchronized {
    val plan = df.queryExecution.analyzed
    // sameResult canonicalizes AWAY output aliases, so two frames with the
    // same computation but different column names would otherwise alias
    // into one entry and break the later caller's column resolution —
    // require the field names to match too
    val hit = entries.indexWhere(e =>
      e.queryExecution.analyzed.sameResult(plan)
        && java.util.Arrays.equals(
          e.schema.fieldNames.asInstanceOf[Array[AnyRef]],
          df.schema.fieldNames.asInstanceOf[Array[AnyRef]]))
    if (hit >= 0) {
      val existing = entries.remove(hit)
      entries += existing // promote to most-recently-used
      existing
    } else {
      val c = df.persist(StorageLevel.MEMORY_AND_DISK)
      entries += c
      if (entries.size > MaxEntries) entries.remove(0).unpersist(blocking = false)
      c
    }
  }

  /** Unpersist every registered frame (deterministic teardown). */
  def clear(): Unit = synchronized {
    entries.foreach(_.unpersist(blocking = false))
    entries.clear()
  }
}
