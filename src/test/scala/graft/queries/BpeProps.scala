package graft.queries

import org.scalacheck.{Gen, Prop, Properties}

/** The BPE trainer's core trick: a symbol sequence spelled as the
  * space-wrapped string " s1  s2 ... " turns the merge (x, y) into the
  * LITERAL substring rewrite " x  y " → " xy ", because `replace`
  * rewrites non-overlapping occurrences left-to-right — which is
  * exactly greedy BPE merge order. `java.lang.String.replace` has the
  * same contract as both engines' SQL replace() (the oracle gate pins
  * engine equivalence; this property pins the MATH): for ANY symbol
  * sequence and ANY merge pair — including overlap chains ("b b b"),
  * boundary look-alikes ("ba","b" vs the ("a","b") pattern), and
  * symbols that are prefixes/suffixes of each other — the string
  * rewrite equals a reference greedy merge on the symbol list.
  */
object BpeProps extends Properties("BpeMerge") {

  private def greedy(syms: List[String], m1: String, m2: String): List[String] =
    syms match {
      case a :: b :: rest if a == m1 && b == m2 =>
        (a + b) :: greedy(rest, m1, m2)
      case a :: rest => a :: greedy(rest, m1, m2)
      case Nil       => Nil
    }

  private def wrap(syms: Seq[String]): String =
    if (syms.isEmpty) "" else syms.mkString(" ", "  ", " ")

  // symbols shaped like real BPE state: nonempty concatenations over a
  // TINY alphabet, so collisions/overlaps/prefix-relations are common
  private val genSym: Gen[String] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
  private val genSyms: Gen[List[String]] = Gen.choose(0, 12).flatMap(Gen.listOfN(_, genSym))

  property("wrapped replace == greedy symbol merge") =
    Prop.forAll(genSyms, genSym, genSym) { (syms, m1, m2) =>
      val viaString = wrap(syms).replace(s" $m1  $m2 ", s" $m1$m2 ")
      viaString == wrap(greedy(syms, m1, m2))
    }

  property("rewrite preserves the wrap invariant (rounds compose)") =
    Prop.forAll(genSyms, genSym, genSym) { (syms, m1, m2) =>
      val after = wrap(syms).replace(s" $m1  $m2 ", s" $m1$m2 ")
      // re-split on the double-space separator reconstructs a valid
      // symbol list whose wrap is the string itself
      val resyms =
        if (after.isEmpty) Nil else after.trim.split("  ").toList
      wrap(resyms) == after && resyms.forall(_.nonEmpty)
    }
}
