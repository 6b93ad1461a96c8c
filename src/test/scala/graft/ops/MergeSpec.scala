package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  test("upsert replaces matched keys and appends unmatched ones") {
    val target = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val updates = Seq((2, "B"), (9, "Z")).toDF("k", "v")
    val out = Merge.upsert(target, updates, "k")
      .orderBy("k").as[(Int, String)].collect()
    assert(out === Array((1, "a"), (2, "B"), (3, "c"), (9, "Z")))
  }

  test("deleteMatching removes exactly the tombstoned keys") {
    val target = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val tombs = Seq(2, 2, 4).toDF("k")
    val out = Merge.deleteMatching(target, tombs, "k")
      .orderBy("k").as[(Int, String)].collect()
    assert(out === Array((1, "a"), (3, "c")))
  }

  test("scd2Apply closes changed rows, inserts new versions, is idempotent") {
    val dim = Seq(
      (1, "x", 0L, Option.empty[Long], true),
      (2, "y", 0L, Option.empty[Long], true),
      (2, "old", -5L, Some(0L), false) // pre-existing history
    ).toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val changes = Seq((1, "x2"), (2, "y"), (7, "new")).toDF("k", "attr")

    val out = Merge.scd2Apply(dim, changes, "k", Seq("attr"), batchTs = 10L)
    val rows = out.orderBy("k", "valid_from")
      .as[(Int, String, Long, Option[Long], Boolean)].collect()
    assert(rows === Array(
      (1, "x", 0L, Some(10L), false),   // closed
      (1, "x2", 10L, None, true),       // new version
      (2, "old", -5L, Some(0L), false), // history untouched
      (2, "y", 0L, None, true),         // same attrs -> untouched
      (7, "new", 10L, None, true)))     // first version

    // re-applying the same batch on the result changes nothing
    val again = Merge.scd2Apply(out, changes, "k", Seq("attr"), batchTs = 20L)
    assert(again.count() === out.count())
    assert(again.exceptAll(out).count() === 0)
  }

  test("diffSnapshots emits I/U/D and round-trips with upsert") {
    val oldSnap = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val newSnap = Seq((1, "a"), (2, "B"), (9, "z")).toDF("k", "v") // 3 deleted
    val diff = Merge.diffSnapshots(oldSnap, newSnap, "k")
      .orderBy("k").as[(String, Int, String)].collect()
    assert(diff === Array(("U", 2, "B"), ("D", 3, "c"), ("I", 9, "z")))

    // diff(s, upsert(s, b)) = the effective changes of b (no-op rows vanish)
    val batch = Seq((1, "a"), (2, "B2")).toDF("k", "v") // (1,"a") is a no-op
    val effective = Merge.diffSnapshots(oldSnap, Merge.upsert(oldSnap, batch, "k"), "k")
      .as[(String, Int, String)].collect()
    assert(effective === Array(("U", 2, "B2")))

    // an update that NULLs a field must carry the null — not resurrect
    // the old value through attribute-wise coalescing
    val oldNn = Seq((1, Option("x"))).toDF("k", "v")
    val newNn = Seq((1, Option.empty[String])).toDF("k", "v")
    val nulled = Merge.diffSnapshots(oldNn, newNn, "k")
      .as[(String, Int, Option[String])].collect()
    assert(nulled === Array(("U", 1, None)))
  }

  test("operators tolerate empty inputs") {
    val t = Seq((1, "a")).toDF("k", "v")
    val empty = t.limit(0)
    assert(Merge.upsert(t, empty, "k").count() === 1)
    assert(Merge.upsert(empty, t, "k").count() === 1)
    assert(Merge.deleteMatching(empty, t, "k").count() === 0)
    assert(Merge.diffSnapshots(empty, empty, "k").count() === 0)
    assert(Merge.scd2Apply(
      empty.withColumn("valid_from", lit(0L))
        .withColumn("valid_to", lit(null).cast("long"))
        .withColumn("is_current", lit(true))
        .select("k", "v", "valid_from", "valid_to", "is_current"),
      t, "k", Seq("v"), 1L).count() === 1)
  }

  test("scd2Apply treats null attributes null-safely (no spurious close)") {
    val dim = Seq((1, Option.empty[String], 0L, Option.empty[Long], true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val changes = Seq((1, Option.empty[String])).toDF("k", "attr")
    val out = Merge.scd2Apply(dim, changes, "k", Seq("attr"), 10L)
    assert(out.count() === 1)
    assert(out.filter(col("is_current")).count() === 1)
  }
}
