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
