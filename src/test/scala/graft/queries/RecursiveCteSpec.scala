package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Spark 4's WITH RECURSIVE support, pinned — and scoped: each recursion
  * level executes as a separate driver-iterated job (UnionLoopExec), so
  * recursion fits shallow hierarchies (closure depth ~10s), NOT series
  * generation (a 344-level date spine measured ~60 s). Series belong to
  * `sequence()`/explode — see `calendar_fill` and SURVEY §7.3.
  */
class RecursiveCteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("recursive CTE computes a bounded transitive closure") {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
      .createOrReplaceTempView("edges_rec")
    // Spark supports only UNION ALL in the recursive member (plain UNION
    // raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE) — acyclic input keeps
    // it terminating; dedup happens in the outer SELECT
    val got = spark.sql("""
      WITH RECURSIVE reach(n) AS (
        SELECT CAST(1 AS BIGINT)
        UNION ALL
        SELECT e.dst FROM reach r JOIN edges_rec e ON e.src = r.n
      ) SELECT DISTINCT n FROM reach ORDER BY n""")
      .collect().map(_.getLong(0)).toList
    assert(got == List(1L, 2L, 3L, 4L))
  }

  test("recursion depth cap fails fast with the documented error") {
    val e = intercept[Exception] {
      spark.sql("""
        WITH RECURSIVE r(n) AS (
          SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 1000
        ) SELECT count(*) FROM r""").head()
    }
    assert(e.getMessage.contains("RECURSION_LEVEL_LIMIT_EXCEEDED"), e.getMessage)
  }
}
