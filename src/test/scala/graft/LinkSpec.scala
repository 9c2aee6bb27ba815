package graft

import graft.kg._
import org.scalatest.funsuite.AnyFunSuite

/** Link-stage semantics (no Spark): key-transform cascade, first-hit-wins
  * ordering, species re-rank, deterministic failsafe — pins the semantics the
  * DataFrame variant and the SQL oracle must both reproduce
  * (reference: TestKBKeyTransforms, TestIMKB, TestReachGrounder).
  */
class LinkSpec extends AnyFunSuite {
  private lazy val kb = new Link.KbIndex(Lexicon.kb)

  test("candidate key cascade covers the reference transforms") {
    assert(Link.candidateKeys("AKT1").head == "akt1")
    assert(Link.candidateKeys("AKT1-GFP").contains("akt1"))
    assert(Link.candidateKeys("p53 protein").contains("p53"))
    assert(Link.candidateKeys("phosphorylated ERK2").contains("erk2"))
    assert(Link.candidateKeys("RAF family").contains("raf"))
    assert(Link.candidateKeys("ERK2 T669A mutant").contains("erk2"))
    assert(Link.candidateKeys("cyclin D1").head == "cyclind1")
    // raw key always first (rank 0)
    assert(Link.candidateKeys("p53 protein").head == "p53protein")
  }

  test("first-hit-wins: protein KB before family fallback") {
    // Ras as Gene_or_gene_product: no uniprot entry, pfam at kb_rank 1
    val g = kb.resolve("Ras", "Gene_or_gene_product", "")
    assert(g.namespace == "pfam" && g.id == "PF00071")
    // AKT1: uniprot human beats mouse without context
    val a = kb.resolve("AKT1", "Gene_or_gene_product", "")
    assert(a.id == "P31749" && a.species == "human")
  }

  test("species context re-ranks candidates") {
    val human = kb.resolve("ERK2", "Gene_or_gene_product", "")
    assert(human.id == "P28482")
    val mouse = kb.resolve("ERK2", "Gene_or_gene_product", "mouse")
    assert(mouse.id == "P63085" && mouse.species == "mouse")
    // context with no matching candidate falls back to human
    val yeast = kb.resolve("ERK2", "Gene_or_gene_product", "yeast")
    assert(yeast.id == "P28482")
  }

  test("key rank beats species rank within a KB") {
    // raw key hit (rank 0) must beat a transformed key hit even if the
    // transformed key's entry is human
    val g = kb.resolve("AKT1-GFP", "Gene_or_gene_product", "")
    assert(g.id == "P31749")
  }

  test("override KB (kb_rank -1) beats every standard KB (TestOverrides)") {
    val g = kb.resolve("p38", "Gene_or_gene_product", "")
    assert(g.namespace == "uniprot" && g.id == "Q16539",
      s"override must win over the rank-0 family entry; got $g")
  }

  test("failsafe grounding is deterministic and content-derived") {
    val f1 = kb.resolve("XYZ123", "Gene_or_gene_product", "")
    val f2 = kb.resolve("xyz123 ", "Gene_or_gene_product", "")
    assert(f1.namespace == "uaz" && f1.id == "UAZ:xyz123")
    assert(f1 == f2)
  }

  test("label routing: same text, different label, different KB") {
    val fam = kb.resolve("Ras", "Family", "")
    assert(fam.namespace == "pfam")
    val sp = kb.resolve("mouse", "Species", "")
    assert(sp.namespace == "taxonomy" && sp.id == "10090")
  }
}
