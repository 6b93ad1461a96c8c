package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * MERGE-style table maintenance as pure relational plans — the curated-zone
 * twin of the reference's idempotent full-rebuild write (job.py:63,
 * README.md:307): instead of recomputing the whole table, fold a change
 * batch into the previous snapshot and write the result to the next zone
 * path. Every operator here is a single declarative plan (no driver loops,
 * no RDDs), so Catalyst chooses the join strategy — broadcast when the
 * change batch is small (the common ingest shape), shuffled hash join
 * otherwise — and AQE re-plans at runtime.
 *
 * At 100 TB the upsert's cost profile is one shuffle of the change batch
 * plus one scan of the target: the anti-join side carries only the keys of
 * the batch, so with a broadcast-sized batch the target is never shuffled
 * at all. SCD2 history rebuilds touch only the affected keys for the same
 * reason.
 */
object Merge {

  /**
   * Upsert (`MERGE WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN
   * INSERT`): rows of `updates` replace same-key rows of `target`;
   * unmatched update rows are appended. Last-writer-wins within one batch
   * is the caller's contract (`updates` must be key-unique — enforce with
   * [[graft.ext.Dedup.keepFirstByKey]] upstream).
   *
   * Shape: target ⟕̸ updates (left_anti on the key) ∪ updates — the target
   * is scanned once and only its non-matching rows flow on; no window, no
   * full outer join, no driver state.
   */
  def upsert(target: DataFrame, updates: DataFrame, key: String): DataFrame =
    target.join(updates, Seq(key), "left_anti").unionByName(updates)

  /**
   * Delete-where-matched (`MERGE WHEN MATCHED THEN DELETE`): remove target
   * rows whose key appears in `tombstones` — the GDPR/right-to-erasure
   * shape. One anti join; at scale this is the operation run as a periodic
   * compaction over the curated zone.
   */
  def deleteMatching(target: DataFrame, tombstones: DataFrame, key: String): DataFrame =
    target.join(tombstones.select(key).distinct(), Seq(key), "left_anti")

  /**
   * Changelog generation — the inverse of [[upsert]]: diff two snapshots
   * of a keyed table into (op, row) change records, `op` ∈ I/U/D. A full
   * outer join on the key with null-safe struct comparison of the
   * attributes: present-only-in-new → I, present-in-both-and-different →
   * U (carrying the new attributes), present-only-in-old → D. Identical
   * rows produce nothing, so `diffSnapshots(s, upsert(s, b), k)` returns
   * exactly the effective changes of `b`. This is the CDC feed a
   * downstream consumer replays to stay in sync without rescanning
   * either snapshot.
   */
  def diffSnapshots(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      key: String): DataFrame = {
    val attrs = oldSnap.columns.filterNot(_ == key).toSeq
    val o = oldSnap.select(col(key),
      struct(attrs.map(col): _*).as("__old"))
    val n = newSnap.select(col(key),
      struct(attrs.map(col): _*).as("__new"))
    o.join(n, Seq(key), "full_outer")
      .withColumn("op",
        when(col("__old").isNull, lit("I"))
          .when(col("__new").isNull, lit("D"))
          .when(!(col("__old") <=> col("__new")), lit("U")))
      .filter(col("op").isNotNull)
      // branch on WHICH side exists, not coalesce per attribute — an
      // update that legitimately nulls a field must carry the null, or
      // replaying the feed resurrects the old value
      .select(col("op") +: col(key) +:
        attrs.map(a =>
          when(col("__new").isNotNull, col(s"__new.$a"))
            .otherwise(col(s"__old.$a")).as(a)): _*)
  }

  /**
   * SCD Type-2 apply: fold a change batch into a versioned dimension.
   *
   * `dim` rows carry (`key`, attributes..., `valid_from`, `valid_to`,
   * `is_current`); `changes` carries (`key`, attributes...) effective at
   * `batchTs`. Semantics:
   *
   *  - current rows whose key is in the batch AND whose attributes differ
   *    are CLOSED: `valid_to` = batchTs, `is_current` = false;
   *  - a new current row (valid_from = batchTs, valid_to = null) is
   *    inserted for every such changed key;
   *  - current rows with identical attributes are untouched (idempotent
   *    re-application of the same batch is a no-op);
   *  - historical (already-closed) rows pass through unchanged;
   *  - keys new to the dimension insert their first version.
   *
   * The change detector compares the attribute columns as a struct —
   * null-safe, column-order-fixed — so adding attributes to the dimension
   * automatically extends the comparison. Two joins total — current⟕batch
   * (the branches below all project from this ONE joined frame, so
   * Spark's exchange reuse shares its shuffle across them) and a
   * batch-anti-current for first-version keys; history rows are never
   * joined, which is what keeps cost proportional to |current| + |batch|,
   * not |history|. Callers folding very large batches repeatedly should
   * persist `dim`'s current slice across applications.
   */
  def scd2Apply(
      dim: DataFrame,
      changes: DataFrame,
      key: String,
      attrs: Seq[String],
      batchTs: Long): DataFrame = {
    val hist = dim.filter(!col("is_current"))
    val cur = dim.filter(col("is_current"))
    val ch = changes.select(
      col(key),
      struct(attrs.map(col): _*).as("__new_attrs"))

    val curJoined = cur.join(ch, Seq(key), "left")
      .withColumn("__changed",
        col("__new_attrs").isNotNull &&
          !(struct(attrs.map(col): _*) <=> col("__new_attrs")))

    // current rows: untouched (no batch row, or identical attrs) vs closed
    val untouched = curJoined.filter(!col("__changed"))
      .drop("__new_attrs", "__changed")
    val closed = curJoined.filter(col("__changed"))
      .drop("__new_attrs", "__changed")
      .withColumn("valid_to", lit(batchTs))
      .withColumn("is_current", lit(false))

    // new versions for changed keys: the attrs ride along in the joined
    // frame's struct — no join back to the change batch
    val insertsChanged = curJoined.filter(col("__changed"))
      .select(col(key) +: attrs.map(a => col(s"__new_attrs.$a").as(a)): _*)
    // first versions for keys the dimension has never seen
    val insertsNew = ch.join(cur.select(col(key)), Seq(key), "left_anti")
      .select(col(key) +: attrs.map(a => col(s"__new_attrs.$a").as(a)): _*)
    val inserts = insertsChanged.unionByName(insertsNew)
      .withColumn("valid_from", lit(batchTs))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))

    hist.unionByName(untouched).unionByName(closed).unionByName(inserts)
  }
}
