package graft

import graft.kg._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-Scala (no Spark) specs for the annotate + rule-match kernels —
  * mirrors the reference's sentence-level behavioral suites
  * (TestTemplaticSimpleEvents, TestBindingEvents, NegationTests, ...).
  */
class MatcherSpec extends AnyFunSuite {

  private lazy val trie = Annotate.buildTrie(Lexicon.nerLexicon)

  private def extract(text: String): Seq[graft.model.MentionRow] = {
    val sents = Annotate.annotateText(trie, text)
    sents.flatMap(s => BioRules.extractSentence("c", 0, s)).toSeq
  }
  private def events(text: String) = extract(text).filter(_.is_event)

  test("tokenizer keeps biomedical tokens intact") {
    val toks = Annotate.Tokenizer.tokenize(
      "beta-catenin binds IRS-1 (also known as X). Y63,").map(_._1)
    assert(toks.toSeq == Seq("beta-catenin", "binds", "IRS-1", "(", "also",
      "known", "as", "X", ")", ".", "Y63", ","))
  }

  test("NER stop list: common-word case variants never become entities " +
       "(TestNERStopList — every stop-list entry yields no mention)") {
    // each stop-list entry alone must produce NO mentions, the reference
    // suite's exact per-entry assertion
    Lexicon.nerStopList.foreach { entry =>
      assert(extract(entry).isEmpty, s"stop-list entry '$entry' matched")
      assert(extract(entry.capitalize).isEmpty,
        s"title-case stop-list entry '$entry' matched")
    }
    // "Bad" the word stays a word; "BAD" the registered symbol stays the
    // protein (ner_stoplist.txt semantics encoded in the trie case rules)
    assert(extract("Bad weather is common.").isEmpty)
    val bad = Annotate.annotateText(trie, "BAD binds AKT1.")(0)
    assert(bad.ner(0) == "B-Gene_or_gene_product")
    // non-stop-listed symbols DO accept their title-case variant
    val akt = Annotate.annotateText(trie, "Akt binds GSK3.")(0)
    assert(akt.ner(0) == "B-Gene_or_gene_product")
  }

  test("trie NER: longest match and case handling") {
    val s = Annotate.annotateText(trie, "The cyclin D1 protein and AKT1 bind.")(0)
    assert(s.ner.toSeq.count(_.startsWith("B-")) == 2)
    // short gene symbols are case-sensitive: "akt1" must NOT match
    val s2 = Annotate.annotateText(trie, "the akt1 text")(0)
    assert(!s2.ner.exists(_ != "O"))
    // lowercase dictionary words match any case
    val s3 = Annotate.annotateText(trie, "Optineurin was seen.")(0)
    assert(s3.ner(0) == "B-Gene_or_gene_product")
  }

  test("modification label from trigger, de- prefix first") {
    assert(BioRules.modLabel("phosphorylates") == "Phosphorylation")
    assert(BioRules.modLabel("dephosphorylation") == "Dephosphorylation")
    assert(BioRules.modLabel("Deubiquitination") == "Deubiquitination")
    assert(BioRules.modLabel("ubiquitinated") == "Ubiquitination")
    assert(BioRules.modLabel("sumoylation") == "Sumoylation")
    // positive stems match by contains (getModificationLabel:386-408):
    // prefixed participles keep the right label (TestModifications sent13)
    assert(BioRules.modLabel("monoubiquitinated") == "Ubiquitination")
    assert(BioRules.modLabel("polyubiquitinated") == "Ubiquitination")
    // unknown trigger -> "" (the reference's UNKNOWN: no PTM attached)
    assert(BioRules.modLabel("acylated") == "")
  }

  test("templatic simple event with cause splits into event + regulation") {
    val ev = events("MEK1 phosphorylates ERK2.")
    val labels = ev.map(_.labels.head).sorted
    assert(labels == Seq("Phosphorylation", "Positive_regulation"))
    val phos = ev.find(_.labels.head == "Phosphorylation").get
    assert(phos.args.length == 1) // cause stripped by split
  }

  test("deubiquitination does not also yield ubiquitination") {
    val ev = events("The deubiquitination of ASPP2 is promoted by optineurin.")
    assert(ev.exists(_.labels.head == "Deubiquitination"))
    assert(!ev.exists(_.labels.head == "Ubiquitination"))
  }

  test("ubiquitination with ubiquitin theme is dropped (mkUbiquitination guard)") {
    val ev = events("MEK1 ubiquitinates ubiquitin.")
    assert(!ev.exists(_.labels.contains("Ubiquitination")))
  }

  test("binding pair expansion over coordination") {
    val ev = events("AKT1 binds GSK3 and BAD.").filter(_.labels.head == "Binding")
    assert(ev.size == 2)
    ev.foreach(b => assert(b.args.count(_.role == "theme") == 2))
  }

  test("site list yields one event per site") {
    val ev = events("JAK3 phosphorylates three HuR residues (Y63, Y68, Y200).")
    assert(ev.count(_.labels.head == "Phosphorylation") == 3)
    assert(ev.count(_.labels.head == "Positive_regulation") == 3)
  }

  test("negation scope + parity: evidence inside the event interval only; " +
       "even count cancels") {
    // NegationTests sen1-4 semantics: "not" is inside the regulation's span
    // but NOT inside the inner event's (which starts at the trigger)
    val ev1 = events("MEK does not phosphorylate ERK2.")
    val reg1 = ev1.filter(_.labels.head == "Positive_regulation")
    val inner1 = ev1.filter(_.labels.head == "Phosphorylation")
    assert(reg1.nonEmpty && reg1.forall(_.negated))
    assert(inner1.nonEmpty && inner1.forall(!_.negated))
    // "Without" sits OUTSIDE the passive event's interval: only the inner
    // "not" counts, so the event IS negated
    val ev2 = events("Without MEK, ERK2 is not phosphorylated.")
    assert(ev2.nonEmpty && ev2.forall(_.negated))
    // two negatives inside one interval cancel (handleNegations parity)
    val ev3 = events("MEK1 does not fail to phosphorylate ERK2.")
    assert(ev3.nonEmpty && ev3.forall(!_.negated))
  }

  test("hypothesis hints mark events") {
    val ev = events("These results suggest that MEK1 phosphorylates ERK2.")
    assert(ev.nonEmpty && ev.forall(_.hypothesis))
    val ev2 = events("MEK1 phosphorylates ERK2.")
    assert(ev2.forall(!_.hypothesis))
  }

  test("semantic negative flips regulation polarity") {
    val ev = events("Loss of PTEN promotes phosphorylation of AKT1.")
    assert(ev.exists(_.labels.head == "Negative_regulation"))
    assert(!ev.exists(_.labels.head == "Positive_regulation"))
  }

  test("activation subsumed by regulation is dropped") {
    val ev = events("The ubiquitination of ASPP2 is promoted by optineurin.")
    assert(!ev.exists(_.labels.contains("ActivationEvent")))
  }

  test("distinct controller/controlled guard on activations") {
    val ev = events("AKT1 activates AKT1.")
    assert(!ev.exists(_.labels.contains("ActivationEvent")))
  }

  test("most-complete filter drops siteless variant when site variant exists") {
    val ev = events("MEK1 phosphorylates ERK2 at T669.")
    val phos = ev.filter(_.labels.head == "Phosphorylation")
    assert(phos.size == 1)
    assert(phos.head.args.exists(_.role == "site"))
  }

  test("mention ids are deterministic content hashes") {
    val a = extract("MEK1 phosphorylates ERK2.")
    val b = extract("MEK1 phosphorylates ERK2.")
    assert(a.map(_.mention_id).sorted.sameElements(b.map(_.mention_id).sorted))
  }
}
