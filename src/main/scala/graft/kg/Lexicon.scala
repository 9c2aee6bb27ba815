package graft.kg

import graft.model.KBEntry

/** Deterministic, embedded fixture knowledge: NER lexicon, grounding KB, and the
  * label taxonomy. Stand-ins for the reference's bioresources TSV KBs
  * (reference: main/.../grounding/ReachKBConstants.scala:46-97, loaded by
  * TsvIMKBFactory.scala:32-51) and the YAML taxonomy
  * (reference: biogrammar/taxonomy.yml via package.scala:10-22).
  *
  * Everything here is broadcast once per session — small dimension data, never
  * shuffled (SURVEY.md J1: broadcast hash join is the scale-correct shape).
  */
object Lexicon {

  /** Label taxonomy: child -> parents (single inheritance here). A mention carries
    * its full hypernym closure in `labels`, so `m matches L` in the reference
    * becomes `labels.contains(L)` / `array_contains`.
    */
  val taxonomyParents: Map[String, String] = Map(
    "Gene_or_gene_product" -> "BioChemicalEntity",
    "Generic_entity" -> "BioChemicalEntity",
    // generic (anaphoric) simple-event NPs — "this phosphorylation" — are
    // text-bound mentions whose closure reaches Event/PossibleController so
    // regulation/activation rules can capture them as arguments (reference:
    // taxonomy.yml Generic_event; DarpaLinks.simpleEventMatch:364-427)
    "Generic_event" -> "Event",
    "Family" -> "BioChemicalEntity",
    "Complex" -> "BioChemicalEntity",
    "Simple_chemical" -> "BioChemicalEntity",
    // BioEntity sits between the entity kinds and PossibleController, as in
    // the reference taxonomy (biogrammar/taxonomy.yml:65-77): "any BioEntity
    // may appear as the controlled in an Activation" — including BioProcess
    // ("RAS1 activates apoptosis")
    "BioChemicalEntity" -> "BioEntity",
    "BioEntity" -> "PossibleController",
    "PossibleController" -> "Entity",
    "Site" -> "Entity",
    "BioProcess" -> "BioEntity",
    "Species" -> "Context",
    "CellLine" -> "Context",
    "CellType" -> "Context",
    "Organ" -> "Context",
    "TissueType" -> "Context",
    "Cellular_component" -> "Context",
    "Context" -> "Entity",
    // events
    // auto-modifications ("EGFR autophosphorylates") specialize their base
    // modification (reference: taxonomy.yml Auto* entries;
    // TestTemplaticAutoEvents semantics)
    "AutoPhosphorylation" -> "Phosphorylation",
    "AutoUbiquitination" -> "Ubiquitination",
    "AutoHydroxylation" -> "Hydroxylation",
    "AutoSumoylation" -> "Sumoylation",
    "AutoGlycosylation" -> "Glycosylation",
    "AutoAcetylation" -> "Acetylation",
    "AutoFarnesylation" -> "Farnesylation",
    "AutoRibosylation" -> "Ribosylation",
    "AutoMethylation" -> "Methylation",
    "Phosphorylation" -> "AddModification",
    "Dephosphorylation" -> "RemoveModification",
    "Ubiquitination" -> "AddModification",
    "Deubiquitination" -> "RemoveModification",
    "Hydroxylation" -> "AddModification",
    "Dehydroxylation" -> "RemoveModification",
    "Sumoylation" -> "AddModification",
    "Desumoylation" -> "RemoveModification",
    "Glycosylation" -> "AddModification",
    "Deglycosylation" -> "RemoveModification",
    "Acetylation" -> "AddModification",
    "Deacetylation" -> "RemoveModification",
    "Farnesylation" -> "AddModification",
    "Defarnesylation" -> "RemoveModification",
    "Ribosylation" -> "AddModification",
    "Deribosylation" -> "RemoveModification",
    "Methylation" -> "AddModification",
    "Demethylation" -> "RemoveModification",
    // reference taxonomy.yml:39,51 — Hydrolysis is an AdditionEvent,
    // Dehydrolysis a RemovalEvent; without these the closure misses Event
    // and regulations cannot capture hydrolysis events as controlled args
    "Hydrolysis" -> "AddModification",
    "Dehydrolysis" -> "RemoveModification",
    "AddModification" -> "ModificationEvent",
    "RemoveModification" -> "ModificationEvent",
    "ModificationEvent" -> "SimpleEvent",
    "Binding" -> "SimpleEvent",
    "Transcription" -> "SimpleEvent",
    "Translocation" -> "SimpleEvent",
    "IncreaseAmount" -> "Amount",
    "DecreaseAmount" -> "Amount",
    "Amount" -> "SimpleEvent",
    "SimpleEvent" -> "Event",
    "Positive_regulation" -> "Regulation",
    "Negative_regulation" -> "Regulation",
    "Regulation" -> "ComplexEvent",
    "Positive_activation" -> "ActivationEvent",
    "Negative_activation" -> "ActivationEvent",
    "ActivationEvent" -> "ComplexEvent",
    "ComplexEvent" -> "Event",
    "Event" -> "PossibleController"
  )

  /** The built-in taxonomy as a [[Taxonomy]] value (the default carried by
    * every [[BioRules.Grammar]]).
    */
  lazy val builtinTaxonomy: Taxonomy = Taxonomy(taxonomyParents)

  /** Active-taxonomy override for the current thread. The taxonomy rides the
    * grammar broadcast ([[BioRules.Grammar.taxonomy]] — the reference keeps
    * taxonomy.yml IN the grammar directory and loads it with the rules,
    * reach/package.scala:10-22); the extraction entry points install it here
    * for the duration of one turn/group so the deep mention-construction
    * call sites keep their zero-argument [[labelClosure]] signature while
    * remaining cluster-correct (the value always comes from a broadcast
    * captured at plan time, never from driver-side singletons).
    */
  private val tlTax = new ThreadLocal[Taxonomy]
  def withTaxonomy[T](t: Taxonomy)(f: => T): T = {
    val prev = tlTax.get
    tlTax.set(t)
    try f
    finally tlTax.set(prev)
  }

  /** Full hypernym closure for a head label, head first — from the
    * thread-installed taxonomy when one is active, else the built-in.
    */
  def labelClosure(head: String): Array[String] = {
    val t = tlTax.get
    (if (t == null) builtinTaxonomy else t).closure(head)
  }

  private def g(names: String*): Seq[(String, String)] =
    names.map(_ -> "Gene_or_gene_product")

  /** Head tokens of multi-word BioChemicalEntity lexicon surfaces — the
    * word set the strict-head anaphora rule may pick up after a determiner
    * ("Cyclin D1 ... the cyclin"; reference: DarpaLinks.strictHeadMatch:120-162
    * matches a generic NP's syntactic head against a prior mention's words).
    * Only alphabetic tokens of length >= 4 qualify (residue/number suffixes
    * like "D1" would be spurious heads).
    */
  lazy val multiwordHeads: Set[String] = multiwordHeadsOf(nerLexicon)

  /** Same computation over an arbitrary (possibly data-loaded) lexicon —
    * [[KbLoader]] rebuilds the strict-head generic rule from the merged
    * lexicon so a data-added multi-word surface gets anaphora support too.
    */
  def multiwordHeadsOf(lexicon: Seq[(String, String)]): Set[String] = {
    val bioLabels = Set("Gene_or_gene_product", "Family", "Complex",
      "Simple_chemical")
    lexicon.iterator
      .filter { case (surface, label) =>
        bioLabels.contains(label) && surface.contains(" ") }
      .flatMap(_._1.split(" "))
      .map(_.toLowerCase)
      .filter(t => t.length >= 4 && t.forall(_.isLetter))
      .toSet
  }

  /** NER stop list (reference: bioresources ner_stoplist.txt, consumed by
    * TestNERStopList): lowercase forms that are common words — the trie must
    * not accept auto-generated title-case variants for these ("Bad" the word
    * vs "BAD" the protein).
    */
  val nerStopList: Set[String] = Set("cell", "cells", "bad", "was", "not")

  /** NER dictionary: surface phrase -> head label. Multi-token phrases allowed
    * (matched by the longest-match trie scan in Annotate).
    */
  val nerLexicon: Seq[(String, String)] =
    g(
      "AKT1", "AKT", "AKT2", "JAK3", "JAK1", "HuR", "ASPP1", "ASPP2", "53BP2",
      "optineurin", "OPTN", "MEK", "MEK1", "ERK", "ERK2", "p53", "TP53", "BRAF",
      "KRAS", "K-Ras", "HRAS", "H-Ras", "mTOR", "STAT3", "EGFR", "HER2",
      "SRC", "Src", "JNK",
      "GSK3", "PI3K", "PTEN", "MAPK1", "cortactin", "Gab1", "Grb2",
      "SOS", "SAF-1", "Mad-Max", "cyclin D1", "SMAD2", "SMAD4", "TGFBR2", "p38",
      "IGF-1R", "IRS-1", "Shc", "RhoA", "Rac1", "CDC42", "PLC-gamma",
      "paxillin", "talin", "vinculin", "BAD", "BAX", "BCL2", "caspase-3",
      "NF-kappaB", "IkB", "IKK", "TRAF2", "TRAF6", "RIP1", "FADD",
      "beta-catenin", "GSK3beta", "APC", "axin", "LRP6", "DVL1",
      // multi-word GGPs for the inhibitor-lookahead contrast (TestEntities
      // sent9c/9d): a protein FOLLOWED by "inhibitor" is absorbed into a
      // chemical; a protein whose own name ENDS in "inhibitor" stays a GGP
      "adenylate cyclase", "vascular endothelial cell growth inhibitor",
      "SRC-3", "ER"
      // GGP-labeled surface whose ONLY grounding is a family KB — the
      // resolveDisplay "Family" disambiguation fixture (ReachSystem.scala:
      // 249-293 + ReachKBUtils.isFamilyGrounded)
      , "MAPK"
      // homolog-alias surface set (TestCoreference sent62/63: "the Pax6
      // homologs eyeless and eyegone"): the fly genes are KNOWN mentions in
      // the reference KB; only Pax6 carries a grounding here, so the alias
      // share is observable (failsafe ids collapse onto Pax6's id in CC)
      , "Pax6", "eyeless", "eyegone", "eyefull"
      // GGP surface ALSO present in the complex KB — the complex-before-
      // protein sequence collision vector (TestComplexResolutions)
      , "AMPK"
      // nucleotide-bound Ras forms: the reference CRF NER tags these as
      // proteins with no KB entry (AzFailsafeKB grounding) — the hydrolysis
      // matrix themes, TestTemplaticSimpleEvents testHydrolysis*
      , "Ras-GDP", "Ras-GTP"
      // MEK2: the Ser221/Ser217 multi-theme cross-product vector
      // (TestRegulationEvents sent29); histone 2B: multi-word CRF-only
      // surface, no KB entry (sent23 overmatch guard)
      , "MEK2", "histone 2B"
      // ERBB3/ErbB3: the following-regulation + amount-levels vectors
      // (TestRegulationEvents sent15/42-44/58) — both case spellings are
      // reference-dictionary surfaces
      , "ERBB3", "ErbB3", "EGF"
      // promoter-binding vectors (TestBindingEvents sent34)
      , "p21", "PUMA"
    ) ++ Seq(
      // Complex-labeled surfaces grounded through the bepc KB
      "Activin A" -> "Complex",
      "9-1-1" -> "Complex",
      "Ras" -> "Family",
      "RAF" -> "Family",
      "Rho" -> "Family",
      "STAT" -> "Family",
      "SMAD" -> "Family",
      "Wnt" -> "Family",
      "ERK1/2" -> "Family",
      "14-3-3" -> "Family",
      "ubiquitin" -> "Simple_chemical",
      "E2" -> "Simple_chemical",
      // named protein domains/regions are Sites (the reference's bio_sites
      // dictionary KB; TestModifications sent2 "the RBD of PI3KC2β" -> a
      // "site of protein" EventSite mod, TestEntities sent3 "JM domains")
      "RBD" -> "Site",
      "JM domain" -> "Site",
      "JM domains" -> "Site",
      "SH2 domain" -> "Site",
      "SH3 domain" -> "Site",
      "kinase domain" -> "Site",
      "PH domain" -> "Site",
      "RING domain" -> "Site",
      "ATP" -> "Simple_chemical",
      "GTP" -> "Simple_chemical",
      "rapamycin" -> "Simple_chemical",
      // "retinoic acid induced apoptosis" premod-activation vector
      // (TestRegulationEvents sent57)
      "retinoic acid" -> "Simple_chemical",
      // radiolabeled nucleotides: CRF-only chemical surfaces, no KB entry
      // (TestBindingEvents sent33)
      "32P-GDP" -> "Simple_chemical",
      "32P-GTP" -> "Simple_chemical",
      "wortmannin" -> "Simple_chemical",
      "staurosporine" -> "Simple_chemical",
      "LY294002" -> "Simple_chemical",
      "calcium" -> "Simple_chemical",
      // chemical alias pair (TestCoreference sent49-54): both surfaces are
      // KB chemicals; the alias templates must share grounding between them
      // but never across types (sent50 Akt/diacylglycerol, sent51 S135)
      "diacylglycerol" -> "Simple_chemical",
      "DAG" -> "Simple_chemical",
      "human" -> "Species",
      "mouse" -> "Species",
      "murine" -> "Species",
      "rat" -> "Species",
      "yeast" -> "Species",
      "HeLa" -> "CellLine",
      "HEK293" -> "CellLine",
      "MCF-7" -> "CellLine",
      "NIH-3T3" -> "CellLine",
      "fibroblast" -> "CellType",
      "lymphocyte" -> "CellType",
      "liver" -> "Organ",
      "brain" -> "Organ",
      "pancreas" -> "Organ",
      "nucleus" -> "Cellular_component",
      "cytoplasm" -> "Cellular_component",
      "plasma membrane" -> "Cellular_component",
      "nuclear membrane" -> "Cellular_component",
      "membrane" -> "Cellular_component",
      "cytosol" -> "Cellular_component",
      "mitochondria" -> "Cellular_component",
      "endoplasmic reticulum" -> "Cellular_component",
      "Golgi" -> "Cellular_component",
      "apoptosis" -> "BioProcess",
      // bioprocess-controller-over-bioprocess vector
      // (TestActivationEvents sent37)
      "cell aging" -> "BioProcess",
      "autophagy" -> "BioProcess",
      "cell cycle" -> "BioProcess",
      "proliferation" -> "BioProcess"
    )

  /** Grounding KB. Per-label KB search sequence encoded by kb_rank — first KB
    * (lowest kb_rank) with a hit wins (reference: ReachEntityLookup.scala:58-69,
    * InMemoryKB.scala:121-143). Within a KB, species ordering prefers
    * human > no-species > non-human (ReachKBUtils.scala:107-108).
    */
  val kb: Seq[KBEntry] = {
    def up(t: String, id: String, sp: String = "human") =
      KBEntry(t, id, sp, "uniprot", 0, "Gene_or_gene_product", true, false)
    def fam(t: String, id: String, forLabel: String = "Family", rank: Int = 0) =
      KBEntry(t, id, "", "pfam", rank, forLabel, false, true)
    def chem(t: String, id: String) =
      KBEntry(t, id, "", "pubchem", 0, "Simple_chemical", false, false)
    def sp(t: String, id: String) =
      KBEntry(t, id, "", "taxonomy", 0, "Species", false, false)
    def go(t: String, id: String, label: String) =
      KBEntry(t, id, "", "go", 0, label, false, false)
    def cl(t: String, id: String, label: String, ns: String) =
      KBEntry(t, id, "", ns, 0, label, false, false)

    // Override KB (reference: adHoc/override NER-grounding KBs consulted
    // BEFORE the standard per-label sequence — application.conf:72-76,
    // TestOverrides semantics): kb_rank = -2 entries win over every standard
    // KB through the same deterministic first-hit ordering — no special
    // casing in the lookup path.
    val overrides = Seq(
      KBEntry("p38", "Q16539", "human", "uniprot", -2,
        "Gene_or_gene_product", true, false))

    // Bioentities protein-complex KB (reference: StaticProteinComplex,
    // ReachEntityLookup.scala:117-121 — the protein search sequence checks
    // the complex KB BEFORE uniprot, for both Complex- and GGP-labeled
    // mentions; TestComplexResolutions). Encoded as kb_rank = -1 entries
    // under both labels, so a GGP surface present in both KBs (AMPK) takes
    // the complex grounding, matching the reference order. Family key
    // transforms are NOT applicable to complexes (bePC.resolve("pthr2
    // family") is empty) — the per-label transform wiring in Link already
    // gives Complex the protein transforms only.
    def pcBoth(t: String, id: String): Seq[KBEntry] = Seq(
      KBEntry(t, id, "", "bepc", -1, "Gene_or_gene_product", false, false),
      KBEntry(t, id, "", "bepc", -1, "Complex", false, false))
    val complexes =
      pcBoth("AMPK", "AMPK") ++ pcBoth("Activin A", "ACTIVIN_A") ++
      pcBoth("9-1-1", "9_1_1")

    overrides ++ complexes ++ Seq(
      // without the override, "p38" would fall through to the family KB
      fam("p38", "PF00069", "Gene_or_gene_product"),
      up("AKT1", "P31749"), up("AKT1", "P31750", "mouse"),
      up("AKT", "P31749"), up("AKT2", "P31751"),
      up("JAK3", "P52333"), up("JAK1", "P23458"),
      up("HuR", "Q15717"), up("ASPP1", "Q96KQ4"),
      up("ASPP2", "Q13625"), up("53BP2", "Q13625"),
      up("optineurin", "Q96CV9"), up("MEK", "Q02750"), up("MEK1", "Q02750"),
      up("MEK2", "P36507"),
      up("ERBB3", "P21860"), up("ErbB3", "P21860"), up("EGF", "P01133"),
      up("ERK", "P28482"), up("ERK2", "P28482"), up("ERK2", "P63085", "mouse"),
      up("p53", "P04637"), up("p53", "P02340", "mouse"), up("TP53", "P04637"),
      up("BRAF", "P15056"), up("KRAS", "P01116"), up("K-Ras", "P01116"),
      up("HRAS", "P01112"), up("H-Ras", "P01112"),
      up("mTOR", "P42345"), up("STAT3", "P40763"), up("EGFR", "P00533"),
      up("HER2", "P04626"), up("SRC", "P12931"), up("JNK", "P45983"),
      up("GSK3", "P49840"), up("PI3K", "P42336"), up("PTEN", "P60484"),
      up("MAPK1", "P28482"), up("cortactin", "Q14247"), up("Gab1", "Q13480"),
      up("Grb2", "P62993"), up("SOS", "Q07889"), up("SAF-1", "P84090"),
      up("cyclin D1", "P24385"), up("SMAD2", "Q15796"), up("SMAD4", "Q13485"),
      up("TGFBR2", "P37173"), up("IGF-1R", "P08069"), up("IRS-1", "P35568"),
      up("Shc", "P29353"), up("RhoA", "P61586"), up("Rac1", "P63000"),
      up("CDC42", "P60953"), up("PLC-gamma", "P19174"), up("paxillin", "P49023"),
      up("talin", "Q9Y490"), up("vinculin", "P18206"), up("BAD", "Q92934"),
      up("BAX", "Q07812"), up("BCL2", "P10415"), up("caspase-3", "P42574"),
      up("NF-kappaB", "P19838"), up("IkB", "P25963"), up("IKK", "O15111"),
      up("TRAF2", "Q12933"), up("TRAF6", "Q9Y4K3"), up("RIP1", "Q13546"),
      up("FADD", "Q13158"), up("beta-catenin", "P35222"), up("GSK3beta", "P49841"),
      up("APC", "P25054"), up("axin", "O15169"), up("LRP6", "O75581"),
      up("DVL1", "O14640"), up("Mad-Max", "Q05195"),
      up("adenylate cyclase", "Q08828"),
      up("vascular endothelial cell growth inhibitor", "O95150"),
      up("SRC-3", "Q9Y6Q9"), up("ER", "P03372"),
      // deliberately shadowed by the bepc complex entry (rank -1 < 0):
      // the protein sequence consults the complex KB first
      up("AMPK", "Q13131"),
      // homolog-alias anchor: the fly homolog surfaces (eyeless/eyegone/
      // eyefull) carry NO KB row on purpose — their failsafe ids merge onto
      // this grounding through the homolog alias edges (sent62/63)
      up("Pax6", "P26367"),
      // Ras is BOTH a protein-KB miss and a family-KB hit; as a
      // Gene_or_gene_product label its search sequence falls through to pfam
      // at rank 1 (family-vs-protein overlap fixture, FIXTURES.md §2)
      fam("Ras", "PF00071", "Gene_or_gene_product", 1),
      // MAPK: GGP label, family-KB-only grounding -> displays "Family"
      fam("MAPK", "PF00069", "Gene_or_gene_product"),
      fam("Ras", "PF00071"), fam("RAF", "PF02196"),
      fam("RAF", "PF02196", "Gene_or_gene_product", 1),
      fam("Rho", "PF00071"), fam("STAT", "PF01017"),
      // "the MEK family" relabels the GGP mention as Family (decodeIob
      // lookahead, TestEntities mekText) — ground it to the kinase family
      fam("MEK", "PF00069"),
      fam("SMAD", "PF03165"), fam("Wnt", "PF00110"),
      fam("ERK1/2", "PF00069"), fam("14-3-3", "PF00244"),
      chem("ubiquitin", "CID3081416"), chem("ATP", "CID5957"),
      chem("E2", "CID5757"),
      chem("GTP", "CID6830"), chem("rapamycin", "CID5284616"),
      chem("retinoic acid", "CID444795"),
      chem("wortmannin", "CID312145"), chem("staurosporine", "CID44259"),
      chem("LY294002", "CID3973"), chem("calcium", "CID271"),
      // distinct ids so the alias-driven grounding share is observable:
      // the CC representative (rank-key min) is diacylglycerol's id, matching
      // the reference's "apply diacylglycerol grounding to DAG" direction
      chem("diacylglycerol", "CID5283480"), chem("DAG", "CID73265"),
      sp("human", "9606"), sp("mouse", "10090"), sp("murine", "10090"),
      sp("rat", "10116"), sp("yeast", "4932"),
      go("nucleus", "GO:0005634", "Cellular_component"),
      go("cytoplasm", "GO:0005737", "Cellular_component"),
      go("plasma membrane", "GO:0005886", "Cellular_component"),
      go("nuclear membrane", "GO:0031965", "Cellular_component"),
      go("membrane", "GO:0016020", "Cellular_component"),
      go("cytosol", "GO:0005829", "Cellular_component"),
      go("mitochondria", "GO:0005739", "Cellular_component"),
      go("endoplasmic reticulum", "GO:0005783", "Cellular_component"),
      go("Golgi", "GO:0005794", "Cellular_component"),
      go("apoptosis", "GO:0006915", "BioProcess"),
      go("autophagy", "GO:0006914", "BioProcess"),
      go("cell cycle", "GO:0007049", "BioProcess"),
      go("proliferation", "GO:0008283", "BioProcess"),
      cl("HeLa", "CVCL_0030", "CellLine", "cellosaurus"),
      cl("HEK293", "CVCL_0045", "CellLine", "cellosaurus"),
      cl("MCF-7", "CVCL_0031", "CellLine", "cellosaurus"),
      cl("NIH-3T3", "CVCL_0594", "CellLine", "cellosaurus"),
      cl("fibroblast", "CL:0000057", "CellType", "cl"),
      cl("lymphocyte", "CL:0000542", "CellType", "cl"),
      cl("liver", "UBERON:0002107", "Organ", "uberon"),
      cl("brain", "UBERON:0000955", "Organ", "uberon"),
      cl("pancreas", "UBERON:0001264", "Organ", "uberon")
    )
  }

  // failsafe grounding for strings absent from every KB lives in
  // Link.failsafe (one scheme only — a second id scheme here would break the
  // canon rank-key's "uaz:" detection; ADVICE r1)
}
