package graft

import graft.kg.{Annotate, DepParser, Lexicon}
import org.scalatest.funsuite.AnyFunSuite

/** Hand-traced dependency parses over the grammar's target constructions.
  * Expected arcs follow the collapsed-Stanford conventions the reference's
  * syntax grammars pattern over (simple-event_template.yml:16-52).
  */
class DepParserSpec extends AnyFunSuite {

  private val trie = Annotate.buildTrie(Lexicon.nerLexicon)

  /** Parse one sentence; returns (words, set of (govWord, depWord, label)). */
  private def arcs(text: String): (Array[String], Set[(String, String, String)]) = {
    val sents = Annotate.annotateText(trie, text)
    assert(sents.length == 1, s"expected one sentence in: $text")
    val s = sents(0)
    val g = DepParser.parse(s)
    (s.words, g.edges.map(e => (s.words(e.gov), s.words(e.dep), e.label)).toSet)
  }

  private def assertArcs(text: String, expected: (String, String, String)*): Unit = {
    val (_, got) = arcs(text)
    expected.foreach { e =>
      assert(got.contains(e), s"missing arc $e in: $text\n  got: ${got.toList.sortBy(_._2)}")
    }
  }

  test("active transitive") {
    assertArcs("MEK1 phosphorylates ERK2.",
      ("phosphorylates", "MEK1", "nsubj"),
      ("phosphorylates", "ERK2", "dobj"))
  }

  test("passive with agent and site PP") {
    assertArcs("ERK2 is phosphorylated by MEK1 at Ser29.",
      ("phosphorylated", "ERK2", "nsubjpass"),
      ("phosphorylated", "is", "auxpass"),
      ("phosphorylated", "MEK1", "agent"),
      ("phosphorylated", "Ser29", "prep_at"))
  }

  test("nominal chain: of-theme, by-cause on the nominal head") {
    assertArcs("The phosphorylation of ERK2 by MEK1 increases.",
      ("phosphorylation", "ERK2", "prep_of"),
      ("phosphorylation", "MEK1", "prep_by"),
      ("increases", "phosphorylation", "nsubj"))
  }

  test("NP coordination under dobj") {
    assertArcs("AKT1 binds GSK3 and BAD.",
      ("binds", "AKT1", "nsubj"),
      ("binds", "GSK3", "dobj"),
      ("GSK3", "BAD", "conj_and"))
  }

  test("appositive is skipped for subjecthood") {
    assertArcs("MEK1, a dual-specificity kinase, phosphorylates ERK2.",
      ("MEK1", "kinase", "appos"),
      ("phosphorylates", "MEK1", "nsubj"),
      ("phosphorylates", "ERK2", "dobj"))
  }

  test("which-relative: passive relcl plus main clause subject") {
    assertArcs("ERK2, which is phosphorylated by MEK1, binds AKT1.",
      ("ERK2", "phosphorylated", "rcmod"),
      ("phosphorylated", "ERK2", "nsubjpass"),
      ("phosphorylated", "MEK1", "agent"),
      ("binds", "ERK2", "nsubj"),
      ("binds", "AKT1", "dobj"))
  }

  test("object relative with bare that") {
    assertArcs("The kinase that MEK1 phosphorylates binds ERK2.",
      ("kinase", "phosphorylates", "rcmod"),
      ("phosphorylates", "MEK1", "nsubj"),
      ("phosphorylates", "kinase", "dobj"),
      ("binds", "kinase", "nsubj"),
      ("binds", "ERK2", "dobj"))
  }

  test("complement clause after epistemic verb") {
    assertArcs("We hypothesize that JAK3 ubiquitinates HuR.",
      ("hypothesize", "We", "nsubj"),
      ("hypothesize", "ubiquitinates", "ccomp"),
      ("ubiquitinates", "JAK3", "nsubj"),
      ("ubiquitinates", "HuR", "dobj"))
  }

  test("clause coordination links the two predicates") {
    assertArcs(
      "MEK1 phosphorylates ERK2, and we hypothesize that JAK3 ubiquitinates HuR.",
      ("phosphorylates", "MEK1", "nsubj"),
      ("phosphorylates", "ERK2", "dobj"),
      ("phosphorylates", "hypothesize", "conj_and"),
      ("hypothesize", "ubiquitinates", "ccomp"))
  }

  test("epistemic verb takes the nominal event as dobj") {
    assertArcs("RAS suggests the phosphorylation of MEK.",
      ("suggests", "RAS", "nsubj"),
      ("suggests", "phosphorylation", "dobj"),
      ("phosphorylation", "MEK", "prep_of"))
  }

  test("prenominal theme via nn") {
    assertArcs("AKT1 phosphorylation increases.",
      ("phosphorylation", "AKT1", "nn"),
      ("increases", "phosphorylation", "nsubj"))
  }

  test("reduced participle keeps the NP as main-clause subject") {
    assertArcs("ERK2 phosphorylated by MEK1 binds BAD.",
      ("ERK2", "phosphorylated", "vmod"),
      ("phosphorylated", "MEK1", "agent"),
      ("binds", "ERK2", "nsubj"),
      ("binds", "BAD", "dobj"))
  }

  test("determiner blocks spurious verb reading") {
    assertArcs("These results suggest that MEK1 phosphorylates ERK2.",
      ("suggest", "results", "nsubj"),
      ("suggest", "phosphorylates", "ccomp"),
      ("phosphorylates", "MEK1", "nsubj"),
      ("phosphorylates", "ERK2", "dobj"))
  }

  test("shortest path and neighborhood") {
    val sents = Annotate.annotateText(trie,
      "MEK1 phosphorylates ERK2, and we hypothesize that JAK3 ubiquitinates HuR.")
    val s = sents(0)
    val g = DepParser.parse(s)
    val w = s.words
    def idx(word: String) = w.indexOf(word)
    // path MEK1 -> ERK2 goes through the verb
    val p = g.shortestPath(idx("MEK1"), idx("ERK2"))
    assert(p.isDefined && p.get.contains(idx("phosphorylates")))
    // 2-hop neighborhood of the first trigger reaches "hypothesize" via conj
    val nbh = g.neighborhood(Seq(idx("phosphorylates")), 2)
    assert(nbh.contains(idx("hypothesize")))
    // but not "ubiquitinates"'s object (3+ hops away)
    assert(!nbh.contains(idx("HuR")))
  }

  test("TestDependencyUtils vectors: NP-with-PP head, verb dominates the " +
       "widened span, empty interval is safe") {
    // reference: findHeadStrict("the substrates of Shp2") == "substrates";
    // widening over the verb makes the verb the head
    // (TestDependencyUtils.scala:17-25)
    val sents = Annotate.annotateText(trie, "The substrates of AKT1 bind ERK2.")
    val s = sents(0)
    val g = DepParser.parse(s)
    assert(s.words(g.headOfSpan(0, 4)) == "substrates",
      s"head of 'The substrates of AKT1' (tags ${s.words.zip(g.tags).toList})")
    assert(s.words(g.headOfSpan(0, 5)) == "bind")
    // an empty interval returns a clamped index without crashing (the
    // reference returns None; callers here always pass non-empty spans)
    assert(g.headOfSpan(2, 2) == 2)
    // a head is never governed from inside its own span (findHeadStrict's
    // defining property, DependencyUtils.scala:22)
    val h = g.headOfSpan(0, 4)
    assert(!g.incoming(h).exists { case (gov, _) => gov >= 0 && gov < 4 && gov != h })
  }

  test("span head finding") {
    val sents = Annotate.annotateText(trie, "The Cyclin D1 protein binds AKT1.")
    val s = sents(0)
    val g = DepParser.parse(s)
    // head of "The Cyclin D1 protein" is "protein"
    assert(s.words(g.headOfSpan(0, 4)) == "protein")
  }
}
