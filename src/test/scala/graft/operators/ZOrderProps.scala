package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** Properties of the production Morton-code Column: bijectivity (a pure
  * Scala de-interleave recovers both inputs exactly — no collisions, no
  * dropped bits) and the quadrant invariant (the code's top two bits are
  * the inputs' top bits), which is WHY range-partitioning the code
  * recursively subdivides (a, b) space into rectangles.
  */
object ZOrderProps extends Properties("ZOrder.morton") {

  private lazy val spark = TestSpark.spark

  private val pairs: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      a <- Gen.chooseNum(0L, 65535L)
      b <- Gen.chooseNum(0L, 65535L)
    } yield (a, b))

  private def codes(ps: List[(Long, Long)]): List[(Long, Long, Long)] = {
    import spark.implicits._
    ps.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.mortonCode(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect().toList
  }

  private def deinterleave(z: Long): (Long, Long) = {
    var a = 0L; var b = 0L
    var i = 0
    while (i < 16) {
      a |= ((z >> (2 * i)) & 1L) << i
      b |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (a, b)
  }

  property("bijective: de-interleave recovers both inputs") =
    Prop.forAllNoShrink(pairs) { ps =>
      codes(ps).forall { case (a, b, z) => deinterleave(z) == (a, b) }
    }

  property("quadrant invariant: top two code bits are the inputs' top bits") =
    Prop.forAllNoShrink(pairs) { ps =>
      codes(ps).forall { case (a, b, z) =>
        (z >>> 30) == (((b >> 15) & 1L) << 1 | ((a >> 15) & 1L))
      }
    }
}
