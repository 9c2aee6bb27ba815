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

  test("the full conversation fold is total and deterministic over " +
       "arbitrary multi-turn conversations") {
    // the fold carries the most state (context engine, coref sieves, alias
    // maps, co-argument exclusion) — run it over adversarial conversations
    // end-to-end: extractTurn feeds ConvProcessor.process exactly as the
    // pipeline's stage-b does
    val kb = new Link.KbIndex(Lexicon.kb)
    val convGen = Gen.listOfN(4, textGen)
    samples(convGen, 120).foreach { texts =>
      val mentions = texts.zipWithIndex.flatMap { case (t, i) =>
        BioRules.extractTurn(graft.model.AnnotatedTurn("f", i, "user",
          Annotate.annotateText(trie, t)))
      }
      val r1 = ConvProcessor.process("f", mentions, kb) // must not throw
      val r2 = ConvProcessor.process("f",
        scala.util.Random.shuffle(mentions.toList), kb)
      assert(r1.flatMap(_.triple).toSet == r2.flatMap(_.triple).toSet,
        s"order-sensitive fold on: ${texts.mkString(" || ")}")
      // Policy4 must be total on the same inputs
      ConvProcessor.process("f", mentions, kb,
        ConvProcessor.PolicyBidirectional)
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
