package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.queries.CorpusQueries

/** A 100×-scale co-purchase graph has power-law degree: one hub part
  * appears with a large share of others, so the per-iteration contrib
  * join concentrates the hub's edges on one reducer once the rank side
  * is past broadcast scale (an SMJ on src). AQE's skew-join split
  * cannot fire on that SMJ (one join child is always a prior
  * iteration's join output — never the bare shuffle stage the rule
  * pattern requires; verified empirically, including under
  * forceOptimizeSkewedJoin), so [[CorpusQueries.pagerankOn]] takes a
  * `salts` fan-out: edges carry salt = hash(dst) % salts and the
  * rank side replicates, splitting a hub across `salts` reducers BY
  * CONSTRUCTION. This spec runs the planted hub in that at-scale
  * regime (auto-broadcast off, salts = PrSalt) and pins:
  *
  *  1. the hub's edge rows genuinely spread (their dst-derived salts
  *     hit several lanes);
  *  2. the contrib exchange is keyed (src, salt) and the dst
  *     aggregation keeps its map-side partial (the two physical shapes
  *     the defense consists of);
  *  3. ranks equal a driver-side integer replay — salting must be
  *     invisible in the results.
  */
class GraphSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pagerank with a planted hub node: salt spreads the hub, ranks stay exact") {
    val conf = spark.conf
    val savedBroadcast = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // the SMJ regime salts exist for
    try {
    // hub: part 0 co-purchased with every part 1..600 (one order each);
    // cold tail: (90000+2i, 90001+2i) pairs. Hub out-degree 600 vs 2.
    val hot = (1 to 600).map(i => (i.toLong, 0L)) ++
      (1 to 600).map(i => (i.toLong, i.toLong))
    val cold = (0 until 50).flatMap { i =>
      Seq((100000L + i, 90000L + 2 * i), (100000L + i, 90001L + 2 * i))
    }
    val li = (hot ++ cold).toDF("l_orderkey", "l_partkey")
    val nodeIds = (0L to 600L) ++ (90000L to 90099L)
    val nodes = nodeIds.toDF("node")

    // 1. the hub's 600 out-edges carry many distinct salt lanes
    val hubSalts = li.groupBy("l_orderkey").agg(collect_set("l_partkey").as("ps"))
      .select(explode(col("ps")).as("src"), col("ps"))
      .select(col("src"), explode(col("ps")).as("dst"))
      .filter(col("src") === 0 && col("dst") =!= 0)
      .select(pmod(hash(col("dst")), lit(CorpusQueries.PrSalt)))
      .distinct().count()
    assert(hubSalts == CorpusQueries.PrSalt,
      s"600 distinct dsts should cover all ${CorpusQueries.PrSalt} salt lanes, got $hubSalts")

    // 2 + 3. physical shape and exact ranks from one execution
    val ds = CorpusQueries
      .pagerankOn(li, nodes, salts = CorpusQueries.PrSalt).as[(Long, Long)]
    val got = ds.collect().toList
    val plan = ds.queryExecution.executedPlan.toString
    assert(plan.contains("src") && plan.contains("salt"),
      s"expected the contrib join keyed by (src, salt); plan:\n$plan")
    assert("hashpartitioning\\(src#\\d+L, salt#\\d+".r.findFirstIn(plan).isDefined,
      s"expected a salted src exchange; plan:\n$plan")
    assert(plan.contains("partial_sum"),
      s"expected a map-side partial aggregate for the dst contrib sum; plan:\n$plan")

    val byOrder = (hot ++ cold).groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.toList).toMap
    val edges = byOrder.values.flatMap { parts =>
      for (a <- parts; b <- parts if a != b) yield (a, b)
    }.toSet
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodeIds.map(_ -> 1000000L).toMap
    for (_ <- 1 to CorpusQueries.PrIters) {
      val cs = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) cs(d) += pr(s) / outdeg(s)
      pr = nodeIds.map(n => n -> (150000L + 85L * cs(n) / 100L)).toMap
    }
    val want = pr.toSeq.sortBy { case (n, p) => (-p, n) }.take(100).toList
    assert(got == want)
    } finally savedBroadcast match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("label_prop with a planted hub node: salted adoption join, labels stay exact") {
    val conf = spark.conf
    val savedBroadcast = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // hub: part 0 co-purchased with parts 1..400; cold pairs besides
      val hot = (1 to 400).map(i => (i.toLong, 0L)) ++
        (1 to 400).map(i => (i.toLong, i.toLong))
      val cold = (0 until 30).flatMap { i =>
        Seq((100000L + i, 90000L + 2 * i), (100000L + i, 90001L + 2 * i))
      }
      val li = (hot ++ cold).toDF("l_orderkey", "l_partkey")

      val ds = graft.queries.CommunityQueries
        .labelPropOn(li, salts = graft.queries.CorpusQueries.PrSalt)
        .as[(Long, Long)]
      val got = ds.collect().toList
      val plan = ds.queryExecution.executedPlan.toString
      assert("hashpartitioning\\(dst#\\d+L, salt#\\d+".r.findFirstIn(plan).isDefined,
        s"expected a salted dst exchange in the adoption join; plan:\n$plan")

      // driver replay: seed lab = node id; each round node adopts the
      // MODE of its neighbors' labels, smallest label on ties
      val byOrder = (hot ++ cold).groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.toList).toMap
      val edges = byOrder.values.flatMap { parts =>
        for (a <- parts; b <- parts if a != b) yield (a, b)
      }.toSet
      val nodes = edges.map(_._1)
      var lab = nodes.map(n => n -> n).toMap
      for (_ <- 1 to graft.queries.CommunityQueries.LpIters) {
        lab = nodes.map { n =>
          val counts = edges.toSeq.filter(_._1 == n).map(e => lab(e._2))
            .groupBy(identity).view.mapValues(_.size).toSeq
          val best = counts.minBy { case (l, c) => (-c, l) }._1
          n -> best
        }.toMap
      }
      val want = lab.toSeq.sortBy(_._1).toList
      assert(got == want)
    } finally savedBroadcast match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
