package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Concat-then-chunk sequence packing: offset contiguity (the two-pass
  * prefix sum equals the window-prefix definition), the
  * packing-wastes-nothing fill invariant, and doc↔chunk span agreement
  * between the two halves.
  */
class PackChunksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val offs = PipelineQueries.packOffsets(spark, dir).collect()
  private lazy val chunks = PipelineQueries.packChunks(spark, dir).collect()

  test("offsets are a contiguous prefix sum in doc_id order") {
    var expected = 0L
    offs.foreach { r =>
      assert(r.getAs[Long]("start_off") == expected,
        s"doc ${r.getLong(0)} offset")
      expected += r.getAs[Long]("n_tok")
      val first = r.getAs[Long]("chunk_first")
      val last  = r.getAs[Long]("chunk_last")
      assert(first == r.getAs[Long]("start_off") / PipelineQueries.SeqLen)
      assert(last >= first && r.getAs[Long]("n_chunks") == last - first + 1)
    }
  }

  test("decon_chunks re-derives from the bad-doc set and the offset map") {
    // independent bad set: train docs dropped by the membership gate
    val trainIds = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 97 != 0).toSet
    val kept = PipelineQueries.decontaminate(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val bad = trainIds -- kept
    assert(bad.nonEmpty, "the planted contamination must fire")
    val B = PipelineQueries.SeqLen.toLong
    // expected per-chunk sums from the doc-level offsets of bad docs
    val expect = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    offs.filter(r => bad(r.getLong(0))).foreach { r =>
      val (s, n) = (r.getAs[Long]("start_off"), r.getAs[Long]("n_tok"))
      (r.getAs[Long]("chunk_first") to r.getAs[Long]("chunk_last")).foreach { c =>
        val tok = math.min((c + 1) * B, s + n) - math.max(c * B, s)
        val (d, t) = expect.getOrElse(c, (0L, 0L))
        expect(c) = (d + 1, t + tok)
      }
    }
    val got = PipelineQueries.deconChunks(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect.toMap)
  }

  test("every sequence is exactly full except the last; ids are dense") {
    val total = offs.map(_.getAs[Long]("n_tok")).sum
    val lastChunk = (total - 1) / PipelineQueries.SeqLen
    val byId = chunks.map(r => r.getAs[Long]("chunk_id") -> r).toMap
    assert(byId.keySet == (0L to lastChunk).toSet, "chunk ids must be dense")
    byId.foreach { case (id, r) =>
      val fill = r.getAs[Long]("n_tokens")
      if (id < lastChunk)
        assert(fill == PipelineQueries.SeqLen.toLong, s"chunk $id fill $fill")
      else
        assert(fill == total - lastChunk * PipelineQueries.SeqLen)
      assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"))
    }
    // chunk-level doc counts re-derive from the doc-level spans
    val spanCount = offs.flatMap(r =>
      r.getAs[Long]("chunk_first") to r.getAs[Long]("chunk_last"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    chunks.foreach { r =>
      assert(r.getAs[Long]("n_docs") == spanCount(r.getAs[Long]("chunk_id")))
    }
  }
}
