package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** The fused kernel's distinct count equals the semantic reference —
  * distinct TOKEN-SEQUENCE slices (tails clamped like concat_ws) — on
  * random arrays: chained-hash identity and token-sequence identity
  * induce the same equality classes (whitespace-free tokens, no
  * collisions at these sizes).
  */
object NgramDistinctProps extends Properties("NgramDistinct.kernel") {

  private val tokens: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "ab", "bc", "ca", "x"))

  private def reference(ts: List[String], n: Int): Long = {
    val k = math.max(ts.length - n, 0) + 1
    (0 until k).map(i => ts.slice(i, i + n)).distinct.size.toLong
  }

  private def kernel(ts: List[String], n: Int): Long =
    NgramDistinctKernels.distinctGrams(
      new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any]), n)

  property("equals distinct token-slice count") =
    Prop.forAll(tokens, Gen.chooseNum(1, 4)) { (ts, n) =>
      kernel(ts, n) == reference(ts, n)
    }
}
