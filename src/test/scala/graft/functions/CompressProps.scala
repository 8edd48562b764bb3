package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.unsafe.types.UTF8String

/** Property coverage for the deflate kernel's STRUCTURAL invariants —
  * the exact bounds the `compress_ratio` tolerance oracle asserts:
  * deflated length never exceeds zlib's deflateBound-style worst case
  * (raw + raw/1000 + 13) and never beats deflate's 1032:1 maximum
  * compression, on arbitrary strings: runs, unicode, binary-ish noise,
  * empty.
  */
object CompressProps extends Properties("Compress") {

  private val text: Gen[String] = Gen.oneOf(
    // highly repetitive: short seed repeated many times
    for {
      seed <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))
      reps <- Gen.chooseNum(1, 4000)
    } yield seed * reps,
    // arbitrary unicode (includes surrogate-free BMP chars)
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('ñ', '€', '漢', ' ', '\n')))
      .map(_.mkString),
    // LCG pseudo-noise: high entropy, length up to ~16k
    Gen.chooseNum(0, 16000).map { n =>
      var x = 0x9e3779b97f4a7c15L
      (0 until n).map { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        (((x >>> 40) & 63) + 33).toChar
      }.mkString
    },
    Gen.const(""))

  property("deflated length obeys deflateBound and the 1032:1 floor") =
    Prop.forAllNoShrink(text) { s =>
      val u = UTF8String.fromString(s)
      val raw = u.numBytes().toLong
      val dl = Compress.deflatedLength(u)
      val upper = dl <= raw + raw / 1000 + 13
      val lower = dl * 1032L >= raw
      val empty = raw != 0L || dl == 0L
      (upper && lower && empty) :| s"raw=$raw dl=$dl"
    }

  property("ratio kernel is consistent with deflatedLength") =
    Prop.forAllNoShrink(text) { s =>
      val u = UTF8String.fromString(s)
      val raw = u.numBytes()
      val r = Compress.ratio(u)
      if (raw == 0) (r == 1.0) :| "empty ratio"
      else (math.abs(r - Compress.deflatedLength(u).toDouble / raw) < 1e-12) :| s"r=$r"
    }
}
