package graft

import graft.kg._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based robustness: at 10^12 turns every malformed input WILL
  * occur, and one uncaught exception in the row-local kernels kills a whole
  * task (and, with retries, the job). The extraction path must be total and
  * deterministic over arbitrary text — no parser/matcher/linker crash, same
  * output on repeat evaluation.
  */
class RobustnessSpec extends AnyFunSuite {

  // scalacheck generators sampled with fixed seeds (deterministic CI; the
  // scalatestplus forAll bridge is not on the offline classpath)
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private lazy val trie = Annotate.buildTrie(Lexicon.nerLexicon)

  // adversarial alphabet: biomedical-ish tokens, entity names, connectives,
  // brackets/punct runs, unicode, digits, empty-ish segments
  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.oneOf("MEK1", "ERK2", "AKT1", "Ras", "p53", "phosphorylates",
      "phosphorylated", "ubiquitinated", "binds", "activates", "inhibits",
      "which", "that", "it", "they", "both", "of", "and", "or", "not",
      "once", "when", "if", "while", "had", "been", "was", "is", "to",
      "the", "a", "("   , ")", ",", ".", ";", "-", "/", "@", "%"),
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf("α", "β", "κ", "Δ", "±", "µM", "…", "\"", "'", "\\", "\t"),
    Gen.numStr.map(_.take(6)),
    Gen.const(""))

  private val textGen: Gen[String] =
    Gen.listOfN(25, tokenGen).map(_.mkString(" "))

  test("annotate + parse + extract are total and deterministic over " +
       "arbitrary text") {
    samples(textGen, 400).foreach { text =>
      val sents = Annotate.annotateText(trie, text) // must not throw
      sents.foreach { s =>
        val deps = DepParser.parse(s) // must not throw
        // graph helpers stay in-bounds
        if (s.words.nonEmpty) {
          deps.headOfSpan(0, s.words.length)
          deps.neighborhood(s.words.indices, 2)
        }
        val m1 = BioRules.extractSentence("r", 0, s) // must not throw
        val m2 = BioRules.extractSentence("r", 0, s)
        assert(m1.map(_.mention_id) == m2.map(_.mention_id),
          s"nondeterministic extraction on: $text")
      }
    }
  }

  test("grounding link is total over arbitrary surface forms") {
    val kb = new Link.KbIndex(Lexicon.kb)
    samples(Gen.listOfN(3, tokenGen).map(_.mkString(" ")), 300).foreach { surface =>
      val g = kb.resolve(surface, "Gene_or_gene_product", "")
      assert(g != null && g.id != null) // failsafe path always grounds
    }
  }

  test("edge cases: empty, whitespace, punctuation-only, giant token") {
    for (t <- Seq("", " ", "\n\t ", "...", "(((((", ")))", ",,,,",
        "a" * 5000, ". . . .", "( MEK1", "MEK1 )", "which which which",
        "once once , , if when", "both of which", "had been been had")) {
      val sents = Annotate.annotateText(trie, t)
      sents.foreach { s =>
        DepParser.parse(s)
        BioRules.extractSentence("e", 0, s)
      }
    }
  }
}
