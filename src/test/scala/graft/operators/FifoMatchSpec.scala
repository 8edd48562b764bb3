package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class FifoMatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(events: Seq[(Long, Long, Long, String)]): Set[(Long, Long, Long)] = {
    import spark.implicits._
    FifoMatch.pairs(events.map(TimelineEvent.tupled).toDS())
      .collect().map(p => (p.user_id, p.view_event, p.purchase_event)).toSet
  }

  test("each purchase consumes the oldest unconsumed earlier view") {
    val got = run(Seq(
      (1L, 10L, 100L, "view"), (1L, 11L, 200L, "view"),
      (1L, 20L, 300L, "purchase"), (1L, 21L, 400L, "purchase")))
    assert(got == Set((1L, 10L, 20L), (1L, 11L, 21L)))
  }

  test("a purchase before any view goes unmatched and does NOT shift later pairs") {
    val got = run(Seq(
      (1L, 20L, 100L, "purchase"),              // nothing to consume
      (1L, 10L, 200L, "view"),
      (1L, 21L, 300L, "purchase")))
    assert(got == Set((1L, 10L, 21L)))
  }

  test("views outnumbering purchases leave the newest views unconsumed") {
    val got = run(Seq(
      (1L, 10L, 100L, "view"), (1L, 11L, 200L, "view"), (1L, 12L, 300L, "view"),
      (1L, 20L, 400L, "purchase")))
    assert(got == Set((1L, 10L, 20L)))
  }

  test("keys never interleave") {
    val got = run(Seq(
      (1L, 10L, 100L, "view"), (2L, 20L, 200L, "purchase"),
      (2L, 11L, 300L, "view"), (1L, 21L, 400L, "purchase")))
    assert(got == Set((1L, 10L, 21L)))
  }

  test("ties on timestamp break by event id, deterministically") {
    val got = run(Seq(
      (1L, 11L, 100L, "view"), (1L, 10L, 100L, "view"),
      (1L, 20L, 200L, "purchase")))
    assert(got == Set((1L, 10L, 20L))) // lower event_id enqueued first
  }

  test("other event kinds are ignored") {
    val got = run(Seq(
      (1L, 10L, 100L, "view"), (1L, 30L, 150L, "click"),
      (1L, 20L, 200L, "purchase")))
    assert(got == Set((1L, 10L, 20L)))
  }
}
