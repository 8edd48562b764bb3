package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Planted-skew audits for the byte-proportional score joins in
  * `hits_rank` and `doc_logprob_jm`/`doc_logprob2`. Both are
  * fact × per-key-single-row joins where a hot key (a part bought by
  * everyone; a boilerplate bigram) concentrates one SMJ reducer — and
  * AQE's skew split structurally CANNOT fire on them: the dim child is
  * Sort(HashAggregate(ShuffleQueryStage)), never the bare
  * Sort(ShuffleQueryStage) that OptimizeSkewedJoin's pattern requires
  * (verified empirically on the finalized adaptive plans — the same
  * restriction GraphSkewSpec documents for the iterative pagerank
  * join). So the queries ship with [[graft.operators.Relational
  * .saltedDimJoin]], and this spec runs a planted hot key in the
  * at-scale regime (auto-broadcast off, SMJ forced) and pins:
  *
  *  1. the hot key's fact rows genuinely spread (their spread-column
  *     salts hit several lanes);
  *  2. the join exchange is keyed (key..., salt) — the physical shape
  *     the defense consists of;
  *  3. results equal an exact driver-side integer replay — salting
  *     must be invisible in the values.
  */
class QuerySkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def forcedSmj[A](body: => A): A = {
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // the SMJ regime salts exist for
      body
    } finally saved match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("hits_rank with a planted hot part: the score joins are salted, " +
       "path counts stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hitskew").toString
    // 20k customers; each buys hot part 0 plus one of 50 cold parts.
    // Part 0's 20k edge rows would land on ONE reducer of the e ⋈ a1
    // SMJ without the salt.
    val nC = 20000
    (1 to nC).map(c => (c.toLong, c.toLong))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    (1 to nC).flatMap(c => Seq((c.toLong, 0L), (c.toLong, 1L + c % 50)))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    // 1. the hot part's 20k fact rows (spread by customer) cover every
    // salt lane
    val lanes = (1 to nC).map(c => c.toLong)
      .toDF("c").select(pmod(hash(col("c")), lit(InsightQueries.HitsSalt)))
      .distinct().count()
    assert(lanes == InsightQueries.HitsSalt,
      s"20k distinct customers should cover all ${InsightQueries.HitsSalt} lanes, got $lanes")

    forcedSmj {
      // plan must be read from the SAME Dataset that ran, after it ran —
      // AQE only finalizes the executed queryExecution
      val ds = InsightQueries.hitsRank(spark, dir)
        .select("rk", "partkey", "a1", "a2").as[(Long, Long, Long, Long)]
      val got = ds.collect().toList
      val plan = ds.queryExecution.executedPlan.toString
      // 2. both score joins exchange on (key, salt)
      assert("hashpartitioning\\(p#\\d+L?, salt#\\d+".r.findFirstIn(plan).isDefined,
        s"expected the part-scored join keyed (p, salt); plan:\n${plan.take(4000)}")
      assert("hashpartitioning\\(c#\\d+L?, salt#\\d+".r.findFirstIn(plan).isDefined,
        s"expected the customer-scored join keyed (c, salt); plan:\n${plan.take(4000)}")
      // 3. exact replay: a1(0)=20000, a1(p)=400; h1(c)=20400 for all c;
      // a2(0)=20000*20400, a2(p)=400*20400 — ties rank by partkey asc
      assert(got.head == (1L, 0L, nC.toLong, nC.toLong * 20400L))
      assert(got.tail == (2 to 20).map(rk =>
        (rk.toLong, rk.toLong - 1, 400L, 400L * 20400L)).toList)
    }
  }

  test("doc_logprob_jm with a planted boilerplate bigram: the bigram " +
       "join is salted, scores stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jmskew").toString
    // 10k docs of the SAME two-token text → one bigram key would carry
    // 10k rows of the bi ⋈ cab SMJ; 500 cold docs with distinct vocab
    val hot = (1 to 10000).map(i => (i.toLong, "aaaa bbbb"))
    val cold = (1 to 500).map(i => (20000L + i, s"w${i}a w${i}b w${i}c"))
    (hot ++ cold).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // 1. the hot bigram's rows (spread by doc_id) cover every salt lane
    val lanes = (1 to 10000).map(i => i.toLong)
      .toDF("doc_id").select(pmod(hash(col("doc_id")), lit(RetrievalQueries.LmSalt)))
      .distinct().count()
    assert(lanes == RetrievalQueries.LmSalt)

    forcedSmj {
      val ds = RetrievalQueries.docLogprobInterp(spark, dir)
        .as[(Long, Long, Double)]
      val got = ds.collect().toList
      val plan = ds.queryExecution.executedPlan.toString
      // 2. the bigram join exchanges on (a, b, salt)
      assert("hashpartitioning\\(a#\\d+, b#\\d+, salt#\\d+".r.findFirstIn(plan).isDefined,
        s"expected the bigram join keyed (a, b, salt); plan:\n${plan.take(4000)}")
      // 3. exact replay for a hot doc: c_ab = c_a = c_b = 10000,
      // N = 2*10000 + 3*500 tokens; one transition per doc
      val n = 2L * 10000 + 3L * 500
      val cAb = 10000L
      val expHot = BigDecimal(-math.log(
        (7.0 * cAb * n + 3.0 * cAb * cAb) / (10.0 * cAb * n)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got.size == 10000 + 500)
      assert(got.take(3) == List(
        (1L, 1L, expHot), (2L, 1L, expHot), (3L, 1L, expHot)))
      // cold docs: every bigram/unigram count is 1 →
      // mix = (7N + 3)/(10N), two transitions per doc
      val expCold = BigDecimal(-math.log((7.0 * n + 3.0) / (10.0 * n)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got.last == (20500L, 2L, expCold))
    }
  }
}
