package graft.pipeline

import java.nio.file.Files
import java.time.{DayOfWeek, LocalDateTime, LocalTime}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Retry / backfill / catchup / env-dispatch — the scheduler-layer
  * semantics the reference delegates to Airflow + Docker
  * (dags/example_etl_dag.py:30-32 weekly catchup=False;
  * Dockerfile:13 env-var job selection), proven engine-side. */
class SchedulingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session

  private def ctx(conf: Map[String, String] = Map.empty) =
    PipelineContext(spark, conf, log = _ => ())

  private final case class Flaky(failures: Int) extends Stage {
    val name = "flaky"
    private var n = 0
    def run(c: PipelineContext): Unit = {
      n += 1
      if (n <= failures) throw new RuntimeException(s"boom $n")
    }
  }

  test("a stage retries up to maxRetries with the configured delay, then succeeds") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val p = new Pipeline(Seq(Flaky(failures = 2)), maxRetries = 3,
      retryDelayMs = 10, sleep = slept += _)
    val r = p.run(ctx())
    assert(r.succeeded)
    assert(r.reports.head.attempts === 3)
    assert(slept.toSeq === Seq(10L, 10L))
  }

  test("retry budget exhausted: the run fails with the last error, later stages skipped") {
    var ran = false
    val after = new Stage {
      val name = "after"; def run(c: PipelineContext): Unit = ran = true
    }
    val p = new Pipeline(Seq(Flaky(failures = 5), after), maxRetries = 2,
      retryDelayMs = 0)
    val r = p.run(ctx())
    assert(!r.succeeded)
    assert(r.reports.head.attempts === 3) // 1 + 2 retries
    assert(r.reports.head.error.get.getMessage === "boom 3")
    assert(r.reports.map(_.stage) === Seq("flaky")) // fail-fast
    assert(!ran)
  }

  test("backfill runs once per ds, marks completion, and a re-run skips done dates") {
    val state = Files.createTempDirectory("backfill").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    var outage = true // fails 2026-08-09 once, then recovers
    val record = new Stage {
      val name = "record"
      def run(c: PipelineContext): Unit = {
        val ds = c("ds")
        seen += ds
        if (ds == "2026-08-09" && outage) {
          outage = false
          throw new RuntimeException("transient outage")
        }
      }
    }
    val p = new Pipeline(Seq(record))
    val dates = Seq("2026-08-02", "2026-08-09", "2026-08-16")
    val r1 = p.backfill(ctx(), dates, state)
    assert(r1("2026-08-02").succeeded && r1("2026-08-16").succeeded)
    assert(!r1("2026-08-09").succeeded)
    assert(seen.toSeq === dates)
    // restart: only the failed date re-executes (markers gate the rest)
    seen.clear()
    val r2 = p.backfill(ctx(), dates, state)
    assert(seen.toSeq === Seq("2026-08-09"))
    assert(r2("2026-08-09").succeeded)
    assert(r2("2026-08-02").reports.isEmpty) // skipped, not re-run
  }

  test("weeklyRuns reproduces the reference cadence (Sunday 13:30) over a window") {
    // window: Fri 2026-07-24 .. Fri 2026-08-14 covers 3 Sundays
    val runs = Scheduler.weeklyRuns(
      LocalDateTime.parse("2026-07-24T00:00:00"),
      LocalDateTime.parse("2026-08-14T00:00:00"),
      DayOfWeek.SUNDAY, LocalTime.of(13, 30))
    assert(runs.map(_.toString) === Seq(
      "2026-07-26T13:30", "2026-08-02T13:30", "2026-08-09T13:30"))
    // a fire time exactly at the window start is excluded (already ran)
    val runs2 = Scheduler.weeklyRuns(
      LocalDateTime.parse("2026-07-26T13:30:00"),
      LocalDateTime.parse("2026-08-03T00:00:00"),
      DayOfWeek.SUNDAY, LocalTime.of(13, 30))
    assert(runs2.map(_.toString) === Seq("2026-08-02T13:30"))
  }

  test("catchup=false collapses a backlog to the single latest run (reference DAG :32)") {
    val missed = Seq(
      LocalDateTime.parse("2026-07-26T13:30"),
      LocalDateTime.parse("2026-08-02T13:30"),
      LocalDateTime.parse("2026-08-09T13:30"))
    assert(Scheduler.dueRuns(missed, catchup = true) === missed)
    assert(Scheduler.dueRuns(missed, catchup = false) ===
      Seq(LocalDateTime.parse("2026-08-09T13:30")))
    assert(Scheduler.dueRuns(Seq.empty, catchup = false) === Seq.empty)
  }

  private def daemonFixture(catchup: Boolean,
      fired: scala.collection.mutable.Buffer[LocalDateTime],
      clock: () => LocalDateTime,
      stateDir: String = Files.createTempDirectory("sched").toString,
      fire: Option[LocalDateTime => Unit] = None): SchedulerDaemon =
    new SchedulerDaemon(DayOfWeek.SUNDAY, LocalTime.of(13, 30), catchup,
      stateDir, spark.sparkContext.hadoopConfiguration,
      fire.getOrElse(t => fired += t), clock, sleep = _ => ())

  test("daemon fires on the clock: boot is silent, a due Sunday fires exactly once") {
    var now = LocalDateTime.parse("2026-07-24T09:00:00") // Friday
    val fired = scala.collection.mutable.ArrayBuffer.empty[LocalDateTime]
    val d = daemonFixture(catchup = false, fired, () => now)
    assert(d.tick() === Seq.empty) // first boot: watermark set, no storm
    now = LocalDateTime.parse("2026-07-25T09:00:00") // Saturday: not due
    assert(d.tick() === Seq.empty)
    now = LocalDateTime.parse("2026-07-26T13:31:00") // Sunday 13:31: due
    assert(d.tick().map(_.toString) === Seq("2026-07-26T13:30"))
    assert(d.tick() === Seq.empty) // same instant again: accounted for
    assert(fired.map(_.toString) === Seq("2026-07-26T13:30"))
  }

  test("a missed week under catchup=false fires ONLY the collapsed latest run") {
    var now = LocalDateTime.parse("2026-07-24T09:00:00")
    val fired = scala.collection.mutable.ArrayBuffer.empty[LocalDateTime]
    val d = daemonFixture(catchup = false, fired, () => now)
    d.tick() // boot
    // the daemon host was down across TWO Sundays; it wakes Tue Aug 4
    now = LocalDateTime.parse("2026-08-04T08:00:00")
    assert(d.tick().map(_.toString) === Seq("2026-08-02T13:30"))
    assert(fired.map(_.toString) === Seq("2026-08-02T13:30")) // Jul 26 collapsed
    // the collapsed run is accounted: nothing re-fires later that week
    now = LocalDateTime.parse("2026-08-08T08:00:00")
    assert(d.tick() === Seq.empty)
  }

  test("the same missed week under catchup=true replays every run in order") {
    var now = LocalDateTime.parse("2026-07-24T09:00:00")
    val fired = scala.collection.mutable.ArrayBuffer.empty[LocalDateTime]
    val d = daemonFixture(catchup = true, fired, () => now)
    d.tick()
    now = LocalDateTime.parse("2026-08-04T08:00:00")
    assert(d.tick().map(_.toString) ===
      Seq("2026-07-26T13:30", "2026-08-02T13:30"))
    assert(fired.size === 2)
  }

  test("daemon restart resumes from the persisted watermark — no refires") {
    val stateDir = Files.createTempDirectory("sched").toString
    var now = LocalDateTime.parse("2026-07-24T09:00:00")
    val fired = scala.collection.mutable.ArrayBuffer.empty[LocalDateTime]
    val d1 = daemonFixture(catchup = false, fired, () => now, stateDir)
    d1.tick()
    now = LocalDateTime.parse("2026-07-26T14:00:00")
    d1.tick()
    assert(fired.size === 1)
    // process restart: a NEW daemon over the same state dir
    val d2 = daemonFixture(catchup = false, fired, () => now, stateDir)
    assert(d2.tick() === Seq.empty) // watermark survived; run not replayed
    now = LocalDateTime.parse("2026-08-02T13:30:00")
    assert(d2.tick().map(_.toString) === Seq("2026-08-02T13:30"))
  }

  test("a throwing fire leaves the watermark put: the run replays next tick") {
    var now = LocalDateTime.parse("2026-07-24T09:00:00")
    val fired = scala.collection.mutable.ArrayBuffer.empty[LocalDateTime]
    var boom = true
    val d = daemonFixture(catchup = false, fired, () => now,
      fire = Some { t =>
        if (boom) throw new RuntimeException("downstream outage")
        fired += t
      })
    d.tick()
    now = LocalDateTime.parse("2026-07-26T14:00:00")
    intercept[RuntimeException] { d.tick() }
    assert(fired.isEmpty)
    boom = false
    assert(d.tick().map(_.toString) === Seq("2026-07-26T13:30")) // at-least-once
    assert(d.tick() === Seq.empty)
  }

  test("runLoop polls on the injected sleep until stopped") {
    var now = LocalDateTime.parse("2026-07-24T09:00:00")
    val fired = scala.collection.mutable.ArrayBuffer.empty[LocalDateTime]
    var ticks = 0
    val loop = new SchedulerDaemon(DayOfWeek.SUNDAY, LocalTime.of(13, 30),
      false, Files.createTempDirectory("sched").toString,
      spark.sparkContext.hadoopConfiguration, fired += _, () => now,
      sleep = _ => {
        ticks += 1
        // each poll interval the fake wall clock advances half a week
        now = now.plusDays(3).plusHours(12)
        if (ticks >= 4) throw new InterruptedException("test stop")
      })
    intercept[InterruptedException] { loop.runLoop() }
    // 4 sleeps ≈ two weeks of fake time: both Sundays fired on the clock
    assert(fired.map(_.toString) ===
      Seq("2026-07-26T13:30", "2026-08-02T13:30"))
  }

  test("JobRunner dispatches on GRAFT_JOB and translates GRAFT_* env to conf") {
    val c = JobRunner.contextFromEnv(spark, Map(
      "GRAFT_JOB" -> "reference_etl",
      "GRAFT_VERSION" -> "v9",
      "GRAFT_SNAPSHOT_DATE" -> "2026-08-12",
      "GRAFT_LAND" -> "/tmp/land",
      "GRAFT_CUSTOM_THING" -> "x",
      "UNRELATED" -> "ignored"))
    assert(c.version === "v9")
    assert(c(ReferencePipeline.SnapshotDateKey) === "2026-08-12")
    assert(c(ReferencePipeline.LandKey) === "/tmp/land")
    assert(c("CUSTOM_THING") === "x")
    intercept[NoSuchElementException](c("UNRELATED"))
    // unknown job name fails loudly with the known set
    val e = intercept[IllegalArgumentException](
      JobRunner.dispatch(spark, Map("GRAFT_JOB" -> "nope")))
    assert(e.getMessage.contains("reference_etl"))
    intercept[IllegalArgumentException](JobRunner.dispatch(spark, Map.empty))
  }

  test("JobRunner runs the full reference pipeline from env alone") {
    val base = Files.createTempDirectory("jobrunner").toString
    graft.pipeline.ReferencePipelineSpec.writeMeta(s"$base/meta")
    val env = Map(
      "GRAFT_JOB" -> "reference_etl",
      "GRAFT_VERSION" -> "vENV",
      "GRAFT_LAND" -> s"$base/land",
      "GRAFT_RAW_HIST" -> s"$base/raw_hist",
      "GRAFT_CURATED" -> s"$base/curated",
      "GRAFT_META_DIR" -> s"$base/meta",
      "GRAFT_TABLE" -> "random_postcodes",
      "GRAFT_LAND_TS" -> "1700000000",
      "GRAFT_SNAPSHOT_DATE" -> "2026-08-12",
      "GRAFT_ROWS" -> "200")
    val r = JobRunner.dispatch(spark, env)
    assert(r.succeeded,
      r.reports.flatMap(_.error).map(_.toString).mkString("; "))
    assert(r.reports.map(_.stage) ===
      Seq("extract", "test-extract", "run-curated", "deploy-database"))
  }
}
