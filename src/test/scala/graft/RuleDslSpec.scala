package graft

import graft.kg._
import graft.kg.BioRules.{Grammar, Rule, SimpleModK}
import graft.kg.Matcher._
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** The data-driven rule grammar (RuleReader.reload / ApiRuler analogue):
  * exact round-trip of the built-in grammar through the DSL text form, and a
  * NEW event rule defined purely as data extracting a triple no built-in
  * rule produces — through the full Spark pipeline via the reloadable
  * grammar broadcast.
  */
class RuleDslSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val trie = Annotate.buildTrie(Lexicon.nerLexicon)
  private lazy val kb = new Link.KbIndex(Lexicon.kb)

  test("built-in grammar round-trips exactly through the DSL text form") {
    val text = RuleDsl.render(BioRules.default)
    val parsed = RuleDsl.parse(text)
    // case-class equality covers every regex, capture, group, flag and
    // priority of all rules — identical Grammar means identical extraction,
    // so kg_pipeline_edges is unchanged by construction
    assert(parsed.rules.size == BioRules.default.rules.size)
    parsed.rules.zip(BioRules.default.rules).foreach { case (p, b) =>
      assert(p == b, s"surface rule '${b.name}' did not round-trip")
    }
    assert(parsed.depRules.size == BioRules.default.depRules.size)
    parsed.depRules.zip(BioRules.default.depRules).foreach { case (p, b) =>
      assert(p == b, s"dep rule '${b.name}' did not round-trip")
    }
    assert(parsed == BioRules.default)
    // second generation is a fixpoint
    assert(RuleDsl.render(parsed) == text)
  }

  // the demo corpus: no built-in rule matches "hyperphosphorylates" (the
  // quantity prefixes are mono/poly/di/multi only and trigger regexes are
  // token-anchored), so the built-in grammar extracts nothing from it
  private val newRuleDsl =
    """# a brand-new event rule, defined purely as data
      |rule dsl_hyperphos
      |  priority: 7
      |  kind: simplemod
      |  pattern: m:cause:BioChemicalEntity t:/hyper-?phosphorylat(e|es|ed|ing)/ m:theme:BioChemicalEntity
      |""".stripMargin

  test("a NEW event rule defined as data extracts a triple no built-in " +
       "rule produces (extractSentence level)") {
    val sent = Annotate.annotateText(trie, "MEK1 hyperphosphorylates ERK2.")
    val builtin = sent.flatMap(s => BioRules.extractSentence("c", 0, s))
    assert(!builtin.exists(_.is_event), builtin.map(_.text))

    val g = BioRules.default.withRules(RuleDsl.parse(newRuleDsl).rules)
    val withDsl = sent.flatMap(s =>
      BioRules.extractSentence("c", 0, s, Nil, g))
    // SimpleModK derives the label from the trigger (getModificationLabel
    // semantics) and splitSimpleEvents wraps the cause in a regulation
    assert(withDsl.exists(m => m.is_event &&
      m.labels.head == "Phosphorylation"))
    assert(withDsl.exists(m => m.is_event &&
      m.labels.head == "Positive_regulation"))
  }

  test("reloadRules rebuilds the broadcast matcher tables and the full " +
       "pipeline emits the golden-pinned data-rule triple") {
    import spark.implicits._
    val turns = Seq(
      Turn("dslconv", 0, "user", "MEK1 hyperphosphorylates ERK2.", "", null))
      .toDS()
    // built-in grammar: nothing
    Pipeline.resetRules(spark)
    val before = Pipeline.extract(spark, turns).edges.collect()
    assert(before.isEmpty, before.map(_.toString).toSeq)
    try {
      // grammar reload from data — the ApiRuler per-request analogue
      Pipeline.reloadRules(spark, newRuleDsl)
      val after = Pipeline.extract(spark, turns).edges
        .select("subj", "pred", "obj", "conv_id").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      // golden pin: exact triples for the data-defined rule
      assert(after == Set(
        ("", "Phosphorylation", "uniprot:P28482"),
        ("uniprot:Q02750", "Positive_regulation",
          "Phosphorylation(uniprot:P28482)")), after)
    } finally Pipeline.resetRules(spark)
    // after reset the built-in behavior is restored
    assert(Pipeline.extract(spark, turns).edges.count() == 0)
  }

  test("DSL errors are reported with line numbers; duplicates rejected") {
    val bad = "rule r1\n  priority: 7\n  kind: simplemod\n  pattern: q:/x/\n"
    val e = intercept[RuleDsl.DslError](RuleDsl.parse(bad))
    assert(e.getMessage.contains("unknown pattern element"))
    intercept[RuleDsl.DslError](RuleDsl.parse("rule r1\n  priority: 1\n"))
    intercept[RuleDsl.DslError](RuleDsl.parse(
      "rule r1\n  priority: 2\n  kind: entity Site\n  pattern: /a/\n" +
        "rule r1\n  priority: 2\n  kind: entity Site\n  pattern: /b/\n"))
    // unterminated regex
    intercept[RuleDsl.DslError](RuleDsl.parse(
      "rule r2\n  priority: 2\n  kind: entity Site\n  pattern: /a\n"))
  }

  test("slash escaping round-trips regexes containing literal slashes") {
    val g = Grammar(List(Rule("slashy", 7, SimpleModK,
      List(W("a/b|c"), T("x"), M("theme", "BioChemicalEntity")))), Nil)
    val t = RuleDsl.render(g)
    assert(t.contains("a\\/b|c"))
    assert(RuleDsl.parse(t) == g)
  }
}
