package graft

import graft.kg._

/** Scratch debug main (not part of the contract): prints mentions extracted
  * from sentences passed as args.
  */
object DebugExtract {
  def main(args: Array[String]): Unit = {
    val texts = if (args.nonEmpty) args.toSeq else Seq(
      "RAF and PI3K bind to ubiquitinated Ras.",
      "Grb2 and SOS form a complex.")
    val trie = Annotate.buildTrie(Lexicon.nerLexicon)
    texts.foreach { tx =>
      println(s"== $tx")
      val sents = Annotate.annotateText(trie, tx)
      sents.foreach { s =>
        println("  toks: " + s.words.mkString("|"))
        println("  ner : " + s.ner.mkString("|"))
        val deps = DepParser.parse(s)
        println("  tags: " + deps.tags.mkString("|"))
        (0 until s.words.length).foreach { i =>
          deps.outgoing(i).foreach { case (j, l) =>
            println(s"  dep ${l}(${s.words(i)}/$i -> ${s.words(j)}/$j)")
          }
        }
        BioRules.extractSentence("dbg", 0, s).foreach { m =>
          println(s"  M ${m.labels.head} '${m.text}' [${m.start_tok},${m.end_tok}) by=${m.found_by} args=" +
            m.args.map(a => a.role + ":" + a.mention_id).mkString(",") +
            (if (m.mods.isEmpty) ""
             else " mods=" + m.mods.map(mo =>
               s"${mo.kind}(${mo.label},site=${mo.site_text})").mkString(";")))
        }
      }
    }
  }
}
