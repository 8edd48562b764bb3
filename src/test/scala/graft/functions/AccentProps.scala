package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property-based coverage for the pure JVM kernels (SURVEY.md §5.3).
  * Runs under sbt's native ScalaCheck support alongside the ScalaTest
  * suites.
  */
object AccentProps extends Properties("Accent.strip") {

  private val accented = Gen.oneOf(
    "áéíóúñüÁÉÍÓÚÑÜàèìòùâêîôûäëïöç".toSeq.map(_.toString))
  private val mixed: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(3)), accented, Gen.const(" ")))
      .map(_.mkString)

  property("idempotent") = Prop.forAll(mixed) { s =>
    Accent.strip(Accent.strip(s)) == Accent.strip(s)
  }

  property("ascii fixpoint") = Prop.forAll(Gen.asciiPrintableStr) { s =>
    Accent.strip(s) == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
  }

  property("no combining marks in output") = Prop.forAll(mixed) { s =>
    Accent.strip(s).codePoints().toArray
      .forall(cp => com.ibm.icu.lang.UCharacter.getCombiningClass(cp) == 0)
  }

  property("length never grows for Latin input") = Prop.forAll(mixed) { s =>
    Accent.strip(s).length <= java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFKD).length
  }
}

object TemplateProps extends Properties("Template") {

  private val varName = Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
  private val literal = Gen.asciiPrintableStr.map(_.replace("$", "").replace("{", "").replace("}", ""))

  property("dollar render substitutes every var") =
    Prop.forAll(varName, literal, literal) { (v, pre, value) =>
      val t = Template.dollar(s"$pre$${$v}")
      t.render(Map(v -> value)) == pre + value
    }

  property("braces render substitutes every var") =
    Prop.forAll(varName, literal, literal) { (v, pre, value) =>
      val t = Template.braces(s"$pre{$v}")
      t.render(Map(v -> value)) == pre + value
    }

  property("sqlStringLiteral round-trips quotes") =
    Prop.forAll(literal) { s =>
      // the literal, re-parsed by unescaping '' back to ', equals s when
      // there are no newlines involved
      val lit = Template.sqlStringLiteral(s)
      !s.contains("\n") ==> {
        val inner = lit.stripPrefix("'").stripSuffix("'").replace("''", "'")
        inner == s
      }
    }
}
