package graft.io

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Proves the Avro writers' two-phase commit against OBJECT-STORE rename
  * semantics (the [[ObjectStoreFS]] mock: PUT-at-close visibility, no
  * rename onto an existing key) — the claim "same job-commit contract as
  * io/Manifest" as a test, not prose. Covers both the library writer
  * ([[AvroIO.writeAvro]]) and the DSv2 write face. */
class ObjectStoreAvroSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestBase.session
    s.sparkContext.hadoopConfiguration
      .set("fs.s3mock.impl", classOf[ObjectStoreFS].getName)
    s.sparkContext.hadoopConfiguration.set("fs.s3mock.impl.disable.cache", "true")
    s
  }
  import spark.implicits._

  private def freshDir(): String = {
    val local = Files.createTempDirectory("s3mock-avro").toString
    s"s3mock:$local/t"
  }

  test("library writer: staged PUTs + fresh-key renames only; round-trip intact") {
    ObjectStoreFS.reset()
    val dir = freshDir()
    AvroIO.writeAvro((1 to 500).toDF("v").repartition(3), dir)
    // every commit rename landed on a never-existing key (S3-safe)
    assert(ObjectStoreFS.renames.asScala.count(_._3) === 0,
      "a rename targeted an existing key — delete-then-rename is not atomic on S3")
    assert(AvroIO.readAvro(spark, dir).as[Int].collect().sorted.toSeq == (1 to 500))
    // overwrite: old objects deleted first, then fresh-key renames again
    AvroIO.writeAvro((1 to 10).toDF("v").coalesce(1), dir)
    assert(ObjectStoreFS.renames.asScala.count(_._3) === 0)
    assert(AvroIO.readAvro(spark, dir).count() === 10)
  }

  test("DSv2 write face: V2 commit protocol holds under object-store semantics") {
    ObjectStoreFS.reset()
    val dir = freshDir()
    (1 to 300).toDF("v").repartition(2)
      .write.format("graft.sources.AvroSourceV2").mode("append").save(dir)
    assert(ObjectStoreFS.renames.asScala.count(_._3) === 0)
    val back = spark.read.format("graft.sources.AvroSourceV2").load(dir)
    assert(back.as[Int].collect().sorted.toSeq == (1 to 300))
    (1 to 40).toDF("v").coalesce(1)
      .write.format("graft.sources.AvroSourceV2").mode("overwrite").save(dir)
    assert(spark.read.format("graft.sources.AvroSourceV2").load(dir).count() === 40)
  }
}
