package graft.send

import java.util.concurrent.ConcurrentLinkedQueue
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Recording fake Moodle API: per-call failure schedules keyed by
  * username and call kind, static journals so executor-side state is
  * visible to the test (local mode = same JVM).
  */
object FakeMoodle {
  val calls: ConcurrentLinkedQueue[String] = new ConcurrentLinkedQueue[String]()
  val sleeps: ConcurrentLinkedQueue[Long]  = new ConcurrentLinkedQueue[Long]()
  @volatile var failUserFirstN: Map[String, Int]  = Map.empty
  @volatile var failEnrolFirstN: Map[String, Int] = Map.empty
  val userAttempts  = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  val enrolAttempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  @volatile var opened = 0
  @volatile var closedCount = 0
  def reset(failUser: Map[String, Int] = Map.empty,
            failEnrol: Map[String, Int] = Map.empty): Unit = {
    calls.clear(); sleeps.clear()
    userAttempts.clear(); enrolAttempts.clear()
    failUserFirstN = failUser; failEnrolFirstN = failEnrol
    opened = 0; closedCount = 0
  }
}

class RecordingMoodleFactory extends MoodleApiFactory {
  def create(): MoodleApi = new MoodleApi {
    override def open(): Unit = FakeMoodle.synchronized { FakeMoodle.opened += 1 }
    override def close(): Unit = FakeMoodle.synchronized { FakeMoodle.closedCount += 1 }
    def upsertUser(a: EnrolAction): Unit = {
      val n = FakeMoodle.userAttempts.merge(a.username, 1, (x, y) => x + y)
      if (n <= FakeMoodle.failUserFirstN.getOrElse(a.username, 0))
        throw new RuntimeException(s"user-boom-$n")
      FakeMoodle.calls.add(s"user:${a.username}")
    }
    def enrol(a: EnrolAction): Unit = {
      val n = FakeMoodle.enrolAttempts.merge(a.username, 1, (x, y) => x + y)
      if (n <= FakeMoodle.failEnrolFirstN.getOrElse(a.username, 0))
        throw new RuntimeException(s"enrol-boom-$n")
      FakeMoodle.calls.add(s"enrol:${a.course_id}:${a.username}")
    }
  }
}

/** Throws an EMPTY-message exception from the user phase — the ladder
  * must report failure on the done flag, not an error-string test.
  */
class EmptyBoomFactory extends MoodleApiFactory {
  def create(): MoodleApi = new MoodleApi {
    def upsertUser(a: EnrolAction): Unit = throw new RuntimeException("")
    def enrol(a: EnrolAction): Unit =
      throw new IllegalStateException("enrol must not run after a failed upsert")
  }
}

class MoodleApiSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val recordSleep: Long => Unit = ms => FakeMoodle.sleeps.add(ms)

  private def plan(n: Int, course: Long = 3L) = (1 to n).map(i =>
    EnrolAction(course, i.toLong, s"user$i", s"user$i@x.cl", s"$i-0"))
    .toDS().coalesce(1)

  test("uploads user-then-enrol per row, in seat order, with throttle") {
    FakeMoodle.reset()
    val res = MoodleApiSink.uploadAll(plan(5), new RecordingMoodleFactory,
      SendPolicy(throttleMillis = 5), sleeper = recordSleep).collect()
    assert(res.forall(r => r.status == "enrolled"
      && r.user_attempts == 1 && r.enrol_attempts == 1))
    // strict interleaving user:u1, enrol:3:u1, user:u2, ...
    val expected = (1 to 5).flatMap(i => Seq(s"user:user$i", s"enrol:3:user$i"))
    assert(FakeMoodle.calls.toArray.toSeq == expected)
    assert(FakeMoodle.sleeps.toArray.count(_ == 5L) == 5)
    assert(FakeMoodle.opened == 1 && FakeMoodle.closedCount >= 1)
  }

  test("retry with linear backoff then success, per call site") {
    FakeMoodle.reset(failUser = Map("user2" -> 2), failEnrol = Map("user3" -> 1))
    val res = MoodleApiSink.uploadAll(plan(3), new RecordingMoodleFactory,
      SendPolicy(backoffMillisPerAttempt = 7, throttleMillis = 0),
      sleeper = recordSleep).collect().sortBy(_.username)
    assert(res(1).status == "enrolled" && res(1).user_attempts == 3
      && res(1).enrol_attempts == 1)
    assert(res(2).status == "enrolled" && res(2).user_attempts == 1
      && res(2).enrol_attempts == 2)
    // backoffs: user2 attempts 1,2 → 7,14ms; user3 enrol attempt 1 → 7ms
    assert(FakeMoodle.sleeps.toArray.map(_.asInstanceOf[Long]).sorted.toSeq
      == Seq(7L, 7L, 14L))
  }

  test("user-phase terminal failure short-circuits enrol; batch continues") {
    FakeMoodle.reset(failUser = Map("user2" -> 99))
    val res = MoodleApiSink.uploadAll(plan(3), new RecordingMoodleFactory,
      SendPolicy(maxRetries = 3, backoffMillisPerAttempt = 0, throttleMillis = 0),
      sleeper = recordSleep).collect().sortBy(_.username)
    assert(res(1).status == "failed_user" && res(1).user_attempts == 3
      && res(1).enrol_attempts == 0 && res(1).error == "user-boom-3")
    // user2's enrol was never attempted; the other two rows landed
    assert(!FakeMoodle.calls.toArray.toSeq.contains("enrol:3:user2"))
    assert(res(0).status == "enrolled" && res(2).status == "enrolled")
  }

  test("enrol-phase terminal failure reports failed_enrol with the error") {
    FakeMoodle.reset(failEnrol = Map("user1" -> 99))
    val res = MoodleApiSink.uploadAll(plan(1), new RecordingMoodleFactory,
      SendPolicy(maxRetries = 2, backoffMillisPerAttempt = 0, throttleMillis = 0),
      sleeper = recordSleep).collect()
    assert(res.head.status == "failed_enrol" && res.head.user_attempts == 1
      && res.head.enrol_attempts == 2 && res.head.error == "enrol-boom-2")
  }

  test("an exception with an EMPTY message still reports failed_user — " +
       "success is the done flag, not an error-string test") {
    val res = MoodleApiSink.uploadAll(plan(1), new EmptyBoomFactory,
      SendPolicy(maxRetries = 2, backoffMillisPerAttempt = 0, throttleMillis = 0),
      sleeper = recordSleep).collect()
    assert(res.head.status == "failed_user" && res.head.user_attempts == 2)
    assert(res.head.error.nonEmpty) // the ladder substitutes a marker
  }

  test("maxRetries = 0 reports failure with zero attempts, never a " +
       "phantom enrolment") {
    FakeMoodle.reset()
    val res = MoodleApiSink.uploadAll(plan(2), new RecordingMoodleFactory,
      SendPolicy(maxRetries = 0, throttleMillis = 0),
      sleeper = recordSleep).collect()
    assert(res.forall(r => r.status == "failed_user" && r.user_attempts == 0))
    assert(FakeMoodle.calls.isEmpty) // the API was never touched
  }

  test("duplicate-delivery replay: the done ledger keeps the API untouched") {
    // run 1: everything lands
    FakeMoodle.reset()
    val first = MoodleApiSink.uploadAll(plan(4), new RecordingMoodleFactory,
      SendPolicy(throttleMillis = 0), sleeper = recordSleep).collect()
    assert(first.count(_.status == "enrolled") == 4)
    val callsAfterFirst = FakeMoodle.calls.size()
    // run 2 (crash-and-rerun): same plan, ledger = run 1's successes →
    // the anti-join removes every row; the API sees ZERO new calls
    val ledger = first.toSeq.filter(_.status == "enrolled")
      .toDF().select("course_id", "username")
    val second = MoodleApiSink.uploadAllDeduped(plan(4),
      new RecordingMoodleFactory, ledger,
      SendPolicy(throttleMillis = 0), sleeper = recordSleep).collect()
    assert(second.isEmpty)
    assert(FakeMoodle.calls.size() == callsAfterFirst)
    // partial ledger: only the missing row is re-delivered
    val third = MoodleApiSink.uploadAllDeduped(plan(4),
      new RecordingMoodleFactory, ledger.filter("username <> 'user3'"),
      SendPolicy(throttleMillis = 0), sleeper = recordSleep).collect()
    assert(third.map(_.username).toSeq == Seq("user3")
      && third.head.status == "enrolled")
  }
}
