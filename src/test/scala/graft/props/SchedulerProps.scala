package graft.props

import java.time.{DayOfWeek, LocalDateTime, LocalTime}

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.pipeline.Scheduler

/** Laws of the weekly-schedule arithmetic (SchedulingSpec pins the
  * reference cadence; these pin the algebra on arbitrary windows). */
object SchedulerProps extends Properties("Scheduler") {

  private val dowGen = Gen.oneOf(DayOfWeek.values.toSeq)
  private val timeGen = for {
    h <- Gen.choose(0, 23); m <- Gen.choose(0, 59)
  } yield LocalTime.of(h, m)
  private val startGen = for {
    day <- Gen.choose(0L, 3650L); sec <- Gen.choose(0L, 86399L)
  } yield LocalDateTime.parse("2020-01-01T00:00:00").plusDays(day).plusSeconds(sec)
  private val spanGen = Gen.choose(0L, 120L * 24 * 3600) // up to ~17 weeks

  property("every run lands on the schedule's day+time, inside the window") =
    forAll(startGen, spanGen, dowGen, timeGen) { (start, span, dow, at) =>
      val now = start.plusSeconds(span)
      val runs = Scheduler.weeklyRuns(start, now, dow, at)
      runs.forall { r =>
        r.getDayOfWeek == dow && r.toLocalTime == at &&
          r.isAfter(start) && !r.isAfter(now)
      }
    }

  property("consecutive runs are exactly 7 days apart and count matches the window") =
    forAll(startGen, spanGen, dowGen, timeGen) { (start, span, dow, at) =>
      val now = start.plusSeconds(span)
      val runs = Scheduler.weeklyRuns(start, now, dow, at)
      val spaced = runs.sliding(2).forall {
        case Seq(a, b) => a.plusWeeks(1) == b
        case _ => true
      }
      // a window of w whole weeks contains exactly w fires of any weekly
      // schedule (no off-by-one at either boundary)
      val weeks = span / (7L * 24 * 3600)
      spaced && (runs.size == weeks || runs.size == weeks + 1)
    }

  property("catchup=false yields the latest missed run; catchup=true is identity") =
    forAll(Gen.listOf(startGen)) { missed =>
      val collapsed = Scheduler.dueRuns(missed, catchup = false)
      Scheduler.dueRuns(missed, catchup = true) == missed &&
        (missed.isEmpty && collapsed.isEmpty ||
          collapsed.sizeIs == 1 && missed.forall(!_.isAfter(collapsed.head)))
    }
}
