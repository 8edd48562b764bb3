package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.Similarity

/** Online semantics of the streaming semantic-dedup admission filter:
  * an exact semantic copy is dropped within and across micro-batches,
  * sufficiently-different vectors in the same bucket pass, and FIFO
  * eviction re-admits an evicted vector's copy (the bounded-state
  * recall contract shared with StreamingNearDup).
  *
  * Bucket co-location is seed-dependent, so the spec derives the
  * colliding companions from the SAME deterministic bucket function the
  * operator uses (batch evaluation of Similarity.lshBucket over a
  * rotation grid) instead of hard-coding vectors.
  */
class StreamingSemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Dim = 4
  private val Planes = 2 // 4 buckets: collisions easy to find, still real banding

  private def bucketOf(vs: Seq[Seq[Float]]): Seq[Int] = {
    import spark.implicits._
    vs.zipWithIndex.map(_.swap).toDF("i", "embedding")
      .select(col("i"),
        Similarity.lshBucket(col("embedding"), Dim, Planes, 0).cast("int").as("b"))
      .orderBy("i").as[(Int, Int)].collect().map(_._2).toSeq
  }

  private def jsonLine(id: Long, v: Seq[Float]): String =
    s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}""" + "\n"

  test("exact copy dropped across batches; distinct same-bucket vectors pass; " +
       "FIFO eviction re-admits") {
    import spark.implicits._
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val v1 = Seq(1f, 0f, 0f, 0f)
    // rotation grids in the (x,y) and (x,z) planes: cos(v1, c_a) = cos(a)
    val grid = (for {
      plane <- Seq(1, 2)
      a <- (-150 to 150 by 10) if math.abs(a) >= 30
    } yield {
      val r = math.toRadians(a)
      val v = Array(math.cos(r).toFloat, 0f, 0f, 0f)
      v(plane) = math.sin(r).toFloat
      ((plane, a), v.toSeq)
    })
    val buckets = bucketOf(v1 +: grid.map(_._2))
    val b1 = buckets.head
    // two companions in v1's bucket, every pairwise angle ≥ 30°, so all
    // three pairwise cosines < cos(30°) ≈ 0.87 < τ = 0.9 (vectors from
    // different grids are ≥ as far apart as their x-angles suggest)
    val inBucket = grid.zip(buckets.tail).filter(_._2 == b1).map(_._1)
    val picks = inBucket.foldLeft(Vector.empty[((Int, Int), Seq[Float])]) {
      case (acc, (key @ (_, a), v)) =>
        if (acc.size < 2 && acc.forall(p => math.abs(p._1._2 - a) >= 30))
          acc :+ (key, v)
        else acc
    }
    assert(picks.size == 2,
      s"seeded hyperplanes put only ${inBucket.size} grid vectors in v1's bucket")
    val (w1, w2) = (picks(0)._2, picks(1)._2)

    val dir = Files.createTempDirectory("semdedup")
    val raw = spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .json(dir.toString)
    val out = StreamingSemDedup(raw.toDF(), dim = Dim, tau = 0.9,
      planes = Planes, ringCapacity = 2)
    val query = out.writeStream.format("memory").queryName("semdedup")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sdck").toString)
      .start()
    try {
      // batch 1: v1 admitted; its exact copy in the same batch dropped
      Files.writeString(dir.resolve("b1.json"),
        jsonLine(1, v1) + jsonLine(2, v1))
      query.processAllAvailable()
      val t1 = spark.table("semdedup").as[SemAdmitOut].collect()
        .map(r => r.vec_id -> r).toMap
      assert(t1(1L).admitted && !t1(2L).admitted)
      assert(t1(2L).max_cos > 0.999) // the drop carries its evidence

      // batch 2: same-bucket but < τ companions both admitted; the
      // capacity-2 ring now holds (w1, w2) and v1 is evicted
      Files.writeString(dir.resolve("b2.json"),
        jsonLine(3, w1) + jsonLine(4, w2))
      query.processAllAvailable()
      val t2 = spark.table("semdedup").as[SemAdmitOut].collect()
        .map(r => r.vec_id -> r.admitted).toMap
      assert(t2(3L) && t2(4L))

      // batch 3: v1's copy RE-admits — its original aged out of the ring
      Files.writeString(dir.resolve("b3.json"), jsonLine(5, v1))
      query.processAllAvailable()
      val t3 = spark.table("semdedup").as[SemAdmitOut].collect()
        .map(r => r.vec_id -> r.admitted).toMap
      assert(t3(5L), "evicted vector must no longer block its copy")
    } finally {
      query.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
