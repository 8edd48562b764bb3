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
  /** usernames whose first N enrol calls throw a fatal Error (task
    * death, not a retryable call failure) — with TestSpark's
    * `local[4, 2]` (2 task attempts), N = 1 exercises Spark's own task
    * retry and N = 2 kills the job. */
  @volatile var fatalEnrolFirstN: Map[String, Int] = Map.empty
  val fatalFired = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  val userAttempts  = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  val enrolAttempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  @volatile var opened = 0
  @volatile var closedCount = 0
  def reset(failUser: Map[String, Int] = Map.empty,
            failEnrol: Map[String, Int] = Map.empty): Unit = {
    calls.clear(); sleeps.clear()
    userAttempts.clear(); enrolAttempts.clear()
    failUserFirstN = failUser; failEnrolFirstN = failEnrol
    fatalEnrolFirstN = Map.empty; fatalFired.clear()
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
      if (FakeMoodle.fatalEnrolFirstN.getOrElse(a.username, 0) > 0) {
        val f = FakeMoodle.fatalFired.merge(a.username, 1, (x, y) => x + y)
        if (f <= FakeMoodle.fatalEnrolFirstN(a.username))
          throw new Error(s"partition-killed-at-${a.username}-$f")
      }
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

  test("partition killed by Spark task retry: the re-attempt replays the " +
       "partition (at-least-once within a run), the result frame stays " +
       "consistent") {
    // ONE fatal Error on user3's enrol: attempt 1 dies mid-partition
    // AFTER user1/user2 fully landed; TestSpark's local[4, 2] re-runs
    // the task from the start — user1/user2's API calls land TWICE.
    // That duplication is Spark's task-retry at-least-once, the exact
    // exposure the seam's idempotence contract exists for.
    FakeMoodle.reset()
    FakeMoodle.fatalEnrolFirstN = Map("user3" -> 1)
    val res = MoodleApiSink.uploadAll(plan(5), new RecordingMoodleFactory,
      SendPolicy(throttleMillis = 0), sleeper = recordSleep).collect()
    // the retried attempt completes: one result row per action, no dups
    assert(res.map(_.username).sorted.toSeq == (1 to 5).map(i => s"user$i"))
    assert(res.forall(_.status == "enrolled"))
    val enrols = FakeMoodle.calls.toArray.toSeq.collect {
      case s: String if s.startsWith("enrol:") => s }
    assert(enrols.count(_ == "enrol:3:user1") == 2) // replayed rows
    assert(enrols.count(_ == "enrol:3:user3") == 1)
  }

  test("partition killed mid-batch on BOTH attempts (job death): the " +
       "ledger-guarded rerun is exactly-once-per-ledger, at-least-once " +
       "only on the ambiguous row") {
    // Both task attempts die with a fatal Error on user3's enrol — an
    // executor death, NOT a retryable call failure (Error bypasses
    // Retry's Exception catch) — so the JOB fails (local[4, 2] = 2
    // attempts). Server-side state at the crash: user1/user2 landed
    // (twice, once per attempt), user3's upsert landed but its enrol
    // did not, user4/user5 untouched (seat order).
    FakeMoodle.reset()
    FakeMoodle.fatalEnrolFirstN = Map("user3" -> 2)
    val boom = intercept[Throwable] {
      MoodleApiSink.uploadAll(plan(5), new RecordingMoodleFactory,
        SendPolicy(throttleMillis = 0), sleeper = recordSleep).collect()
    }
    assert(Iterator.iterate(boom)(_.getCause).takeWhile(_ != null).take(8)
      .exists(t => String.valueOf(t.getMessage).contains("partition-killed")),
      s"job must die on the planted Error, got: $boom")
    val landedEnrols = FakeMoodle.calls.toArray.toSeq.collect {
      case s: String if s.startsWith("enrol:") => s }
    assert(landedEnrols.toSet == Set("enrol:3:user1", "enrol:3:user2"))
    val enrolCountsAfterCrash =
      (1 to 5).map(i => s"user$i" -> landedEnrols.count(_.endsWith(s"user$i")))
    // The rerun ledger is what the registrar can actually reconstruct:
    // the server's landed ENROLMENTS (run 1's result frame died with
    // the job). user3 is NOT in it — its outcome is ambiguous, so it
    // MUST be retried: the documented at-least-once exposure, made safe
    // by the seam's idempotent upsert + no-op re-enrol contract.
    import spark.implicits._
    val ledger = landedEnrols.distinct.map { s =>
      val p = s.split(":"); (p(1).toLong, p(2)) }
      .toDF("course_id", "username")
    val second = MoodleApiSink.uploadAllDeduped(plan(5),
      new RecordingMoodleFactory, ledger,
      SendPolicy(throttleMillis = 0), sleeper = recordSleep).collect()
    assert(second.map(_.username).sorted.toSeq == Seq("user3", "user4", "user5"))
    assert(second.forall(_.status == "enrolled"))
    // exactly-once-per-ledger: rows in the ledger were NEVER re-touched
    // by the rerun (their enrol counts did not move), and every
    // un-ledgered action landed exactly once in run 2
    val finalEnrols = FakeMoodle.calls.toArray.toSeq.collect {
      case s: String if s.startsWith("enrol:") => s }
    for ((u, c) <- enrolCountsAfterCrash if c > 0)
      assert(finalEnrols.count(_.endsWith(u)) == c,
        s"ledgered row $u was re-touched on rerun")
    for (u <- Seq("user3", "user4", "user5"))
      assert(finalEnrols.count(_.endsWith(u)) == 1, s"$u must land exactly once")
    // the one at-least-once row: user3's upsert ran in run 1 (both
    // attempts) AND run 2; user4/user5 were never reached in run 1
    assert(FakeMoodle.userAttempts.get("user3") == 3)
    assert(Seq("user4", "user5").forall(u => FakeMoodle.userAttempts.get(u) == 1))
  }
}
