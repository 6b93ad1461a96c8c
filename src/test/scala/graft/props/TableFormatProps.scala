package graft.props

import java.nio.file.Files

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestBase
import graft.io.{DeltaLog, IcebergExport, Manifest}

/** Property-based coverage for BOTH table-format exports: ANY generated
  * commit history (overwrite/append mix, arbitrary row batches,
  * optional trailing vacuum for the Delta checkpoint path) must export
  * to a log/metadata tree whose reader-side reconstruction equals the
  * Manifest's own view — per retained snapshot, files AND rows. Spark
  * jobs per trial → few trials, rich histories. */
object TableFormatProps extends Properties("tableformat") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(4)

  private lazy val spark = SparkTestBase.session

  private sealed trait Op
  private case class Write(rows: Int) extends Op
  private case class Append(rows: Int) extends Op

  private val opGen: Gen[Op] = Gen.oneOf(
    Gen.choose(1, 40).map(Write(_)), Gen.choose(1, 40).map(Append(_)))

  // first commit must be a Write; 2–5 commits total
  private val historyGen: Gen[List[Op]] = for {
    first <- Gen.choose(1, 40).map(Write(_))
    rest <- Gen.listOfN(3, opGen).map(_.take(4))
    n <- Gen.choose(1, 3)
  } yield first :: rest.take(n)

  private def runHistory(ops: List[Op]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("tfprops").toString
    ops.zipWithIndex.foreach {
      case (Write(n), i) =>
        Manifest.write((1 to n).map(v => v + i * 1000).toDF("v"), dir, s"c$i")
      case (Append(n), i) =>
        Manifest.append((1 to n).map(v => v + i * 1000).toDF("v"), dir, s"c$i")
    }
    dir
  }

  private def manifestRows(dir: String, snapshot: String): Seq[Int] = {
    import spark.implicits._
    Manifest.readAt(spark, dir, snapshot).as[Int].collect().sorted.toSeq
  }

  property("delta export reconstructs every retained snapshot") =
    forAll(historyGen, Gen.oneOf(false, true)) { (ops, vacuumFirst) =>
      import spark.implicits._
      val dir = runHistory(ops)
      if (vacuumFirst && ops.size > 2) {
        // exercise the checkpoint path: truncate history, then export
        Manifest.vacuum(spark, dir, keepLast = 2)
      }
      DeltaLog.exportLog(spark, dir)
      val hist = Manifest.history(spark, dir)
      hist.forall { m =>
        DeltaLog.activeFiles(spark, dir, Some(m.seq)).sorted == m.files.sorted &&
          DeltaLog.readVersion(spark, dir, m.seq).as[Int].collect().sorted.toSeq ==
            manifestRows(dir, m.snapshot)
      } && DeltaLog.read(spark, dir).as[Int].collect().sorted.toSeq ==
        Manifest.read(spark, dir).as[Int].collect().sorted.toSeq
    }

  property("incremental delta re-export after more commits stays consistent") =
    forAll(historyGen, Gen.choose(1, 30)) { (ops, extra) =>
      import spark.implicits._
      val dir = runHistory(ops)
      DeltaLog.exportLog(spark, dir)
      Manifest.append((1 to extra).map(_ + 90000).toDF("v"), dir, "late")
      DeltaLog.exportLog(spark, dir)
      DeltaLog.read(spark, dir).as[Int].collect().sorted.toSeq ==
        Manifest.read(spark, dir).as[Int].collect().sorted.toSeq &&
        DeltaLog.versions(spark, dir).size == ops.size + 1
    }

  property("iceberg export reconstructs every retained snapshot") =
    forAll(historyGen) { ops =>
      import spark.implicits._
      val dir = runHistory(ops)
      IcebergExport.exportTable(spark, dir)
      val hist = Manifest.history(spark, dir)
      hist.forall { m =>
        IcebergExport.activeFiles(spark, dir, Some(m.seq))
          .map(_.split('/').takeRight(2).mkString("/")).sorted ==
          m.files.sorted &&
          IcebergExport.readSnapshot(spark, dir, m.seq)
            .as[Int].collect().sorted.toSeq == manifestRows(dir, m.snapshot)
      } && IcebergExport.read(spark, dir).as[Int].collect().sorted.toSeq ==
        Manifest.read(spark, dir).as[Int].collect().sorted.toSeq
    }
}
