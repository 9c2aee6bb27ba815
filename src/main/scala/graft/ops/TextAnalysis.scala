package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  * Entirely Catalyst expressions (no UDFs) — each op is a narrow projection
  * over the scan, so at 100 TB these run at parquet-read speed with column
  * pruning (only `doc_id`, `text` are read).
  */
object TextAnalysis {

  private def ws(text: Column): Column =
    split(trim(text), "\\s+")

  /** Whitespace token count + BPE-ish subword count (letter runs, digit runs,
    * punctuation singles — a cheap proxy for BPE token count).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(ws(col("text"))).as("ws_tokens"),
      // RE2-compatible pattern (no lookaround) so the DuckDB oracle matches
      size(expr("regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
        .as("subword_tokens"),
      length(col("text")).as("chars"))

  // ---- tokenizer-aware (BPE) token counting ------------------------------

  /** Parse a BPE merges file: one `left right` pair per line, rank = line
    * position — the public merges.txt format of Sennrich et al. 2016
    * ("Neural Machine Translation of Rare Words with Subword Units") and
    * the GPT-2 vocabulary release. `#` comments and blank lines skipped.
    * Merges are DATA, like the rule grammar and the KB bundle: a user
    * points at their tokenizer's merges file, no recompilation.
    */
  def parseBpeMerges(text: String): Seq[(String, String)] =
    text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        l.split("\\s+") match {
          case Array(a, b) => (a, b)
          case _ => throw new IllegalArgumentException(
            s"merges line must be 'left right': '$l'")
        }
      }.toSeq

  /** True greedy BPE over one word: repeatedly merge ALL occurrences of the
    * lowest-rank adjacent symbol pair present (the reference algorithm —
    * NOT a single sequential replace pass per merge, which diverges when a
    * merge's output enables an earlier-ranked pair; OpsSpec pins the
    * counterexample). Starts from characters, word-internal merges only
    * (word boundaries come from the shared [[Dedup.normTokens]]
    * whitespace tokenization; no end-of-word marker — a simplification
    * over Sennrich's `</w>`, documented and irrelevant for counting when
    * the merges data follows the same convention).
    */
  def bpeTokenizeWord(word: String,
                      ranks: Map[(String, String), Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms: Array[String] = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // merge every (left-to-right, non-overlapping) occurrence of the
        // best pair in one pass
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 &&
              ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
                == bestRank) {
            out += syms(j) + syms(j + 1); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        done = syms.length < 2
      }
    }
    syms
  }

  /** Per-document BPE token counts for training-data budgeting: `n_words`
    * (whitespace words via the shared normalization) and `bpe_tokens`
    * (sum of per-word BPE symbol counts under the given merges).
    *
    * Scale shape: the merges table is dimension data (MBs for a 50k-merge
    * vocabulary) shipped once per executor via broadcast; the count itself
    * is a narrow one-pass map over the scan — no shuffle at all.
    */
  def bpeTokenCounts(docs: DataFrame,
                     merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bRanks = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) =>
        val words = Dedup.normTokens(t).filter(_.nonEmpty)
        var n = 0L
        words.foreach(w => n += bpeTokenizeWord(w, bRanks.value).length)
        (id, words.length.toLong, n)
      }
      .toDF("doc_id", "n_words", "bpe_tokens")
  }

  /** Quality heuristics: length, mean word length, alpha ratio, punctuation
    * ratio, stopword ratio, repetition ratio; composite score in [0,1].
    */
  def quality(docs: DataFrame): DataFrame = {
    val t = col("text")
    val toks = ws(t)
    val nTok = size(toks).cast("double")
    val nChar = length(t).cast("double")
    val alpha = length(regexp_replace(t, "[^A-Za-z]", "")).cast("double")
    val punct = length(regexp_replace(t, "[^.,;:!?]", "")).cast("double")
    val stop = size(filter(toks, w =>
      lower(w).isin("the", "a", "an", "of", "to", "and", "in", "is", "it",
        "that", "for", "on", "with", "as"))).cast("double")
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
    val meanWordLen = (nChar - (nTok - 1)) / nTok
    val score =
      least(lit(1.0), nTok / 100.0) * 0.3 +
        least(lit(1.0), distinctRatio * 2.0) * 0.3 +
        least(lit(1.0), (alpha / nChar) * 1.25) * 0.2 +
        least(lit(1.0), stop / nTok * 5.0) * 0.1 +
        (lit(1.0) - least(lit(1.0), punct / nChar * 10.0)) * 0.1
    docs.select(col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      round(meanWordLen, 4).as("mean_word_len"),
      round(alpha / nChar, 4).as("alpha_ratio"),
      round(stop / nTok, 4).as("stopword_ratio"),
      round(distinctRatio, 4).as("distinct_ratio"),
      round(score, 4).as("quality_score"))
  }

  // ---- model-based quality filtering (weights as data) -------------------

  /** Feature columns the quality classifier scores over — the rounded-4dp
    * outputs of [[quality]] plus the clamped length feature. Rounded inputs
    * + a fixed left-to-right accumulation order make the linear score
    * bit-reproducible by any IEEE SQL engine (the oracle requirement).
    */
  val qualityFeatures: Seq[String] = Seq("len_norm", "mean_word_len",
    "alpha_ratio", "stopword_ratio", "distinct_ratio")

  /** Parse a weights file: one `feature<ws>weight` per line, `#` comments;
    * the special name `bias` is the intercept. Unknown feature names are
    * rejected (a typo must not silently zero a weight). Like the rule
    * grammar, the KB bundle, and the BPE merges, the quality model is
    * DATA — a trainer emits it, a user edits it, nothing recompiles.
    */
  def parseQualityWeights(text: String): (Double, Map[String, Double]) = {
    val entries = text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        l.split("\\s+") match {
          case Array(n, v) =>
            try n -> v.toDouble
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"weight must be a number: '$l'") }
          case _ => throw new IllegalArgumentException(
            s"weights line must be 'feature weight': '$l'")
        }
      }.toSeq
    val unknown = entries.map(_._1).filterNot(n =>
      n == "bias" || qualityFeatures.contains(n))
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"unknown feature(s): ${unknown.mkString(", ")} " +
          s"(known: bias, ${qualityFeatures.mkString(", ")})")
    // same fail-loudly stance as the unknown-name check: a duplicated
    // feature line (trainer bug, merge artifact) must not silently keep
    // only the last value
    val dups = entries.groupBy(_._1).collect {
      case (n, vs) if vs.size > 1 => n }
    if (dups.nonEmpty)
      throw new IllegalArgumentException(
        s"duplicate feature line(s): ${dups.toSeq.sorted.mkString(", ")}")
    val m = entries.toMap
    (m.getOrElse("bias", 0.0), m - "bias")
  }

  /** Linear quality classifier — the model-based quality-filter step of a
    * curation pipeline (fastText/CCNet-style learned filters) reduced to
    * its deterministic core: `q_score = bias + Σ w_f · f` over
    * [[qualityFeatures]], `q_keep = q_score >= threshold` (NaN-guarded
    * identically on both engines). Scale shape: identical to [[quality]] —
    * a narrow projection over the scan, zero shuffles; the weights are a
    * handful of doubles baked into the plan as literals.
    */
  def qualityClassify(docs: DataFrame, bias: Double,
                      weights: Map[String, Double],
                      threshold: Double = 0.5): DataFrame = {
    val unknown = weights.keys.filterNot(qualityFeatures.contains)
    require(unknown.isEmpty, s"unknown feature(s): ${unknown.mkString(", ")}")
    val q = quality(docs).withColumn("len_norm",
      round(least(lit(1.0), col("n_tokens") / 100.0), 4))
    val score = qualityFeatures.foldLeft(lit(bias)) { (acc, f) =>
      acc + lit(weights.getOrElse(f, 0.0)) * col(f)
    }
    q.withColumn("q_score", round(score, 6))
      .withColumn("q_keep",
        when(isnan(col("q_score")), false)
          .otherwise(col("q_score") >= threshold))
      .select("doc_id", "q_score", "q_keep")
  }

  /** Marker-word language-ID heuristic: per-language stopword lists; score =
    * count of marker hits; argmax wins (deterministic tie-break by language
    * code). A real system would use char n-gram profiles; the *shape* (score
    * columns + greatest + chained when) is identical.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es" -> Seq("el", "la", "los", "las", "es", "en", "que", "una", "por"),
    "fr" -> Seq("le", "la", "les", "est", "et", "dans", "que", "une", "pour"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有"))

  def langId(docs: DataFrame): DataFrame = {
    val toks = ws(lower(col("text")))
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, w => w.isin(markers: _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // argmax with deterministic order (first language in list order wins ties)
    val pred = scores.reverse.foldLeft(lit("unknown")) {
      case (acc, (lang, s)) => when(s === best && best > 0, lang).otherwise(acc)
    }
    docs.select((col("doc_id") +: scores.map { case (l, s) =>
      s.as(s"score_$l") } :+ pred.as("pred_lang")): _*)
  }

  /** PII / link redaction — the scrub pass every LLM training corpus runs
    * before tokenization. URLs, emails, and IPv4 literals are counted and
    * replaced with stable placeholder tokens. Pure Catalyst `regexp_replace`
    * / `regexp_extract_all` chains (whole-stage codegen, narrow projection
    * over the scan), and every pattern is written in the RE2-compatible
    * subset (no lookaround, no backrefs) so the DuckDB oracle runs the
    * literally identical regexes.
    *
    * Order matters and is part of the contract: URLs first (an email-shaped
    * substring inside a URL path must count as URL, not email), then emails,
    * then bare IPv4s; each category is counted on the text AFTER the previous
    * category's redaction so no span is double-counted.
    */
  val urlRe = "https?://[^\\s]+"
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def redact(docs: DataFrame): DataFrame = {
    def cnt(c: Column, re: String): Column =
      size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
    val t0 = col("text")
    val t1 = regexp_replace(t0, urlRe, "<URL>")
    val t2 = regexp_replace(t1, emailRe, "<EMAIL>")
    val t3 = regexp_replace(t2, ipv4Re, "<IP>")
    docs.select(col("doc_id"),
      cnt(t0, urlRe).as("n_urls"),
      cnt(t1, emailRe).as("n_emails"),
      cnt(t2, ipv4Re).as("n_ips"),
      t3.as("redacted"))
  }

  /** Gopher-style repetition metrics (Rae et al. 2021, "Scaling Language
    * Models", table A1): per document, the character coverage of the most
    * frequent word n-gram (n=2,3,4) and of all duplicated word n-grams
    * (n=5,10), plus a pass/fail against the published thresholds. All
    * outputs are INTEGER character covers (numerators) over `norm_chars`
    * (denominator) — no floating division anywhere, so the DuckDB oracle and
    * the threshold booleans are exact (`top2*5 <= denom` ⇔ top2/denom ≤ 0.20).
    *
    * Scale shape: generate (n, gram) structs row-locally, explode, then two
    * keyed aggregations — groupBy (doc, n, gram) with map-side partial
    * aggregation (repeated grams collapse before the exchange), then a
    * conditional-agg rollup to one row per doc. Both shuffles key on doc_id
    * prefixes, so AQE coalesces them; no window sort, no driver state. A
    * sentinel (n=0) gram per doc keeps docs shorter than every n in the
    * aggregation, so no restore-join (which at 100 TB would be a second
    * full-size scan joined to a non-broadcastable one-row-per-doc side).
    */
  def repetition(docs: DataFrame,
                 topNs: Seq[Int] = Seq(2, 3, 4),
                 dupNs: Seq[Int] = Seq(5, 10)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ns = (topNs ++ dupNs).distinct.sorted
    // gram generation in a JIT'd kernel flatMap — one pass over the tokens
    // for all window sizes, replacing |ns| interpreted Catalyst
    // transform∘sequence∘slice∘concat_ws pipelines per document (same
    // windowing: full n-windows only when the doc has >= n tokens, plus the
    // n=0 sentinel keeping short docs in the aggregation)
    val rows = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = Dedup.normTokens(text)
        val normChars = toks.mkString(" ").length.toLong
        val out = scala.collection.mutable.ArrayBuffer.empty[
          (Long, Long, Int, String)]
        out += ((id, normChars, 0, ""))
        ns.foreach { n =>
          var i = 0
          val nSh = toks.length - n + 1
          while (i < nSh) {
            out += ((id, normChars, n, toks.slice(i, i + n).mkString(" ")))
            i += 1
          }
        }
        out
      }
      .toDF("doc_id", "norm_chars", "n", "gram")
    val counts = rows
      .groupBy(col("doc_id"), col("norm_chars"), col("n"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val cover = col("cnt") * length(col("gram")).cast("long")
    val aggs =
      topNs.map(n => max(when(col("n") === n, cover)).as(s"top${n}_cov")) ++
        dupNs.map(n => sum(when(col("n") === n && col("cnt") > 1, cover)
          .otherwise(lit(0L))).as(s"dup${n}_cov"))
    val out = counts
      .groupBy("doc_id", "norm_chars")
      .agg(aggs.head, aggs.tail: _*)
    val z = (c: String) => coalesce(col(c), lit(0L))
    out.select(
      (col("doc_id") +: col("norm_chars") +:
        (topNs.map(n => z(s"top${n}_cov").as(s"top${n}_cov")) ++
          dupNs.map(n => z(s"dup${n}_cov").as(s"dup${n}_cov")))): _*)
      // exact integer forms of Gopher's 0.20 / 0.18 / 0.16 / 0.15 / 0.10
      .withColumn("gopher_pass",
        z("top2_cov") * 5 <= col("norm_chars") &&
          z("top3_cov") * 50 <= col("norm_chars") * 9 &&
          z("top4_cov") * 25 <= col("norm_chars") * 4 &&
          z("dup5_cov") * 20 <= col("norm_chars") * 3 &&
          z("dup10_cov") * 10 <= col("norm_chars"))
  }

  /** Corpus-level n-gram heavy hitters — the boilerplate detector: top-k
    * word n-grams by total occurrences with the count of distinct documents
    * containing each. One explode + one partially-aggregated shuffle +
    * TakeOrderedAndProject; deterministic order (count desc, doc count desc,
    * gram asc). At 100 TB the map-side combine collapses the long tail
    * before the exchange and top-k never materializes the full gram table.
    */
  def ngramTopK(docs: DataFrame, n: Int = 5, k: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // kernel gram windows (same rationale and windowing as repetition)
    val grams = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = Dedup.normTokens(text)
        (0 until toks.length - n + 1).iterator
          .map(i => (id, toks.slice(i, i + n).mkString(" ")))
      }
      .toDF("doc_id", "gram")
    grams.groupBy("gram")
      .agg(count(lit(1)).as("occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("occurrences").desc, col("n_docs").desc, col("gram").asc)
      .limit(k)
  }

  /** Stratified systematic subsample: keep every `every(stratum)`-th
    * document by `doc_id % every == 0` within its stratum column. No RNG, no
    * per-stratum window sort (a row_number over a mega-stratum would be a
    * single-partition sort at 100 TB) — a pure narrow filter over the scan,
    * reproducible bit-for-bit by any SQL engine. Strata missing from the
    * map fall back to `defaultEvery`.
    */
  def sampleStratified(docs: DataFrame, stratum: String,
                       every: Map[String, Int],
                       defaultEvery: Int = 10): DataFrame = {
    val k = every.foldLeft(lit(defaultEvery)) { case (acc, (s, e)) =>
      when(col(stratum) === s, lit(e)).otherwise(acc)
    }
    docs.where(pmod(col("doc_id"), k) === 0)
  }

  /** Rolling-hash document fingerprint (winnowing-lite): hash every k-gram of
    * tokens, take the min hash in each window of w consecutive k-grams; the
    * distinct set of selected hashes is the fingerprint.
    */
  def fingerprint(docs: DataFrame, k: Int = 4, w: Int = 6): DataFrame = {
    val toks = ws(lower(col("text")))
    val grams = filter(
      transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(k))))),
      h => h.isNotNull)
    val windows = transform(
      sequence(lit(0), greatest(size(grams) - w, lit(0))),
      i => array_min(slice(grams, i + 1, lit(w))))
    docs.select(col("doc_id"),
      array_sort(array_distinct(windows)).as("fingerprint"))
      .withColumn("fp_size", size(col("fingerprint")))
  }
}
