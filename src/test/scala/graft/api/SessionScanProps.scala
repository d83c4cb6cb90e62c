package graft.api

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/**
 * Property tests for the session-assignment core (SURVEY.md §5.2): for
 * arbitrary event sets and gaps, sessions must partition the input,
 * chain-connect internally (every consecutive gap < timeout), and be
 * separated by ≥ timeout — the invariants the reference's store tests pin
 * with examples (/root/reference/src/lib.rs:1188-1255), checked here over
 * randomized inputs. Pure function — no Spark session needed, so the
 * whole property suite runs in milliseconds.
 */
object SessionScanProps extends Properties("SessionScan") {

  private val genEvents: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 3600L * 1000000L)) // µs offsets within an hour

  private val genGap: Gen[Long] = Gen.chooseNum(1L, 900L * 1000000L)

  private def mkEvents(times: List[Long]): List[Event[Long]] =
    times.sorted.zipWithIndex.map { case (us, i) =>
      Event.at(i.toLong, new Timestamp(us / 1000L)) // ms precision is fine here
    }

  private def micros(e: Event[Long]): Long = e.eventTimeOrThrow.getTime * 1000L

  property("sessions partition the input in order") = forAll(genEvents, genGap) { (ts, gap) =>
    val evs = mkEvents(ts)
    val sessions = SessionScan.sessions(evs.iterator, gap).toList
    sessions.flatMap(_._2) == evs
  }

  property("within a session, consecutive gaps are < timeout") = forAll(genEvents, genGap) { (ts, gap) =>
    val sessions = SessionScan.sessions(mkEvents(ts).iterator, gap).toList
    Prop.all(sessions.map { case (_, evs) =>
      Prop(evs.zip(evs.tail).forall { case (a, b) => micros(b) - micros(a) < gap })
    }: _*)
  }

  property("consecutive sessions are separated by >= timeout") = forAll(genEvents, genGap) { (ts, gap) =>
    val sessions = SessionScan.sessions(mkEvents(ts).iterator, gap).toList
    sessions.zip(sessions.drop(1)).forall { case ((a, _), (b, _)) =>
      micros(Event.at(0L, b.start)) - micros(Event.at(0L, a.lastEventTime)) >= gap
    }
  }

  property("bounds equal first/last event times") = forAll(genEvents, genGap) { (ts, gap) =>
    val sessions = SessionScan.sessions(mkEvents(ts).iterator, gap).toList
    sessions.forall { case (b, evs) =>
      b.start == evs.head.eventTimeOrThrow && b.lastEventTime == evs.last.eventTimeOrThrow
    }
  }
}
