package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines
  * (driver mandate; SURVEY.md §2.4 X5). All pure Catalyst column
  * expressions — codegen'd, no UDFs, fully distributed.
  *
  * Design note: hashes are MD5-based because MD5 is bit-identical across
  * engines (the DuckDB oracle mirrors every expression here 1:1), unlike
  * engine-specific murmur/xxhash builtins.
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Canonicalize text before hash-based dedup: Unicode NFC (composition
    * variants of the same glyphs hash differently — see
    * [[graft.functions.NfcNormalize]]), optional casefold, whitespace
    * runs collapsed to single spaces, trimmed. Two crawls of the same
    * page that differ only in encoding form, case, or layout whitespace
    * fingerprint identically after this; compose with [[Dedup.exact]] /
    * minhash as `dedup(normalize(text))`.
    *
    * Pure projection — sits on the scan, no shuffle. The DuckDB oracle
    * mirrors it 1:1 (`nfc_normalize`, `lower`, `regexp_replace`, `trim`).
    */
  def normalize(text: Column, casefold: Boolean = true): Column = {
    val nfc = graft.functions.NfcNormalize.nfcNormalize(text)
    val cased = if (casefold) lower(nfc) else nfc
    trim(regexp_replace(cased, "\\s+", " "))
  }

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** The 27 printable characters Windows-1252 places at 0x80–0x9F (€ ‚ ƒ
    * „ … † ‡ ˆ ‰ Š ‹ Œ Ž ‘ ’ “ ” • – — ˜ ™ š › œ ž Ÿ) and, position for
    * position, the C1 code points carrying those byte VALUES — the
    * `translate` pair that turns a cp1252 misdecode back into its
    * original byte sequence. */
  private val Cp1252High: String =
    "\u20AC\u201A\u0192\u201E\u2026\u2020\u2021\u02C6\u2030\u0160" +
      "\u2039\u0152\u017D\u2018\u2019\u201C\u201D\u2022\u2013\u2014" +
      "\u02DC\u2122\u0161\u203A\u0153\u017E\u0178"
  private val C1Bytes: String =
    "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008A" +
      "\u008B\u008C\u008E\u0091\u0092\u0093\u0094\u0095\u0096\u0097" +
      "\u0098\u0099\u009A\u009B\u009C\u009E\u009F"
  // a UTF-8 continuation byte misdecoded as latin-1 (U+0080–U+00BF) or
  // as one of cp1252's printable high characters
  private val MojiCont = "[\u0080-\u00BF" + Cp1252High + "]"

  /** Count of mojibake marker sequences — UTF-8 lead-byte characters
    * (2-byte leads U+00C2-U+00DF, 3-byte leads U+00E0-U+00EF as
    * latin-1/cp1252 misreads)
    * followed by the right number of continuation-shaped characters
    * ("Ã©", "â€™"). Non-overlapping count; 0 on clean text, null on
    * null. The detection half of the ftfy primitive. */
  def mojibakeHits(text: Column): Column =
    regexp_count(text, lit("(?:[\u00C2-\u00DF]" + MojiCont +
      ")|(?:[\u00E0-\u00EF]" + MojiCont + "{2})")).cast("int")

  /** Single-pass mojibake repair (the ftfy recipe, Spark-native): undo
    * one UTF-8-read-as-latin-1/cp1252 misdecode by mapping cp1252's
    * high characters back to their byte values (`translate`), encoding
    * the string as latin-1 (now byte-identical to the original
    * corruption) and reinterpreting those bytes as UTF-8. Applied only
    * when (a) [[mojibakeHits]] fires, (b) every character survives the
    * latin-1 round trip — mixed-script strings (real CJK plus a stray
    * marker) stay UNTOUCHED rather than half-repaired — and (c) the
    * recovered bytes are valid UTF-8 (`is_valid_utf8` on the
    * reinterpreted binary; no decode that could raise). Everything else
    * passes through unchanged; null stays null. Double-encoded text
    * needs one call per encoding layer.
    *
    * Pure scan projection: translate + encode + cast + regexes, all
    * codegen'd built-ins, no UDF, branch values evaluated lazily per
    * row (`CaseWhen`), so the latin-1 encoder never sees a
    * non-latin-1 string. */
  def fixMojibake(text: Column): Column = {
    val translated = translate(text, Cp1252High, C1Bytes)
    // binary→string cast reinterprets the bytes as UTF-8 WITHOUT
    // validation — is_valid_utf8 then vets exactly those bytes
    val candidate = encode(translated, "ISO-8859-1").cast("string")
    when(mojibakeHits(text) > 0 &&
        translated.rlike("^[\u0000-\u00FF]*$") &&
        is_valid_utf8(candidate),
      candidate).otherwise(text)
  }

  /** [[mojibakeHits]] + [[fixMojibake]] as columns `mojibake_hits` and
    * `<textCol>_fixed` — the scrub-then-count ingest step. */
  def withMojibake(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("mojibake_hits", mojibakeHits(col(textCol)))
      .withColumn(textCol + "_fixed", fixMojibake(col(textCol)))

  /** Flesch–Kincaid grade level (Kincaid et al. 1975) under the
    * standard corpus-scale approximations: words = whitespace tokens,
    * sentences = runs of `.!?` (floored at 1 — a fragment is one
    * sentence), syllables = vowel-group count over the lowercased text
    * (`[aeiouy]+` — vowel runs cannot cross whitespace, so the global
    * count equals the per-word sum). Grade = 0.39·(W/S) +
    * 11.8·(Syl/W) − 15.59, round-6; null/empty/whitespace text → null
    * (no words to grade). A quality-scoring feature (too-high =
    * run-on boilerplate, negative = fragment soup), one more column on
    * the same scan as the other gates — pure projection, regex
    * builtins, SQL-replayable 1:1. */
  def fleschKincaid(text: Column): Column = {
    val words = size(tokens(text)).cast("double")
    val sentences = greatest(regexp_count(text, lit("[.!?]+")), lit(1))
      .cast("double")
    val syllables = regexp_count(lower(text), lit("[aeiouy]+"))
      .cast("double")
    when(trim(text) =!= "",
      round(lit(0.39) * words / sentences +
        lit(11.8) * syllables / words - lit(15.59), 6))
  }

  /** Characters matching a regex, as a count (quality-scoring feature). */
  def regexCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")

  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val DeStop: Seq[String] = Seq("der", "die", "und", "ist", "das", "nicht")
  val FrStop: Seq[String] = Seq("le", "la", "et", "les", "des", "une")
  val EsStop: Seq[String] = Seq("el", "los", "las", "de", "y", "una")

  /** Tokens belonging to a fixed word list, as a count. Native one-probe-
    * per-token expression ([[graft.functions.CountInSet]]); language ID
    * runs five lists over every doc, so the HOF form paid ~5·tokens
    * interpreted lambda calls per doc at the curation pipelines' first
    * gate. Spec-pinned identical to [[stopwordCountHof]]. */
  def stopwordCount(toks: Column, stop: Seq[String]): Column =
    graft.functions.CountInSet.countInSet(toks, stop)

  /** Composable HOF reference form of [[stopwordCount]], kept as the
    * cross-checkable twin (interpreted lambda per token — not for the
    * hot path). */
  def stopwordCountHof(toks: Column, stop: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stop))).cast("long")

  /** DISTINCT set members present in the token array — the required-
    * stopword presence probe of [[withGopherQuality]]. Native one-pass
    * bitmask expression ([[graft.functions.DistinctInSet]]): the fold
    * form re-scans the tokens once per set member, so a long required-
    * word list multiplies the gate's only per-token cost. Spec-pinned
    * identical to [[stopHitsFold]]; null array → null (callers
    * coalesce). */
  def stopHits(toks: Column, words: Seq[String]): Column =
    graft.functions.DistinctInSet.distinctInSet(toks, words)

  /** Composable per-word `array_contains` fold, kept as the
    * cross-checkable twin of [[stopHits]] (one array scan PER WORD —
    * not for long lists). The explicit isNotNull guard gives a null
    * array → null, matching the native form (the raw fold would give
    * 0: each per-word `when` lands in its `otherwise`). */
  def stopHitsFold(toks: Column, words: Seq[String]): Column =
    when(toks.isNotNull, words.distinct.sorted.map(w =>
        when(array_contains(toks, w), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _))

  /** Linear lexicon score: Σ weight(token) for a driver-known term→weight
    * lexicon — the linear layer of a fastText-style shallow classifier.
    * Native one-probe-per-token expression
    * ([[graft.functions.LexiconScore]]); spec-pinned bit-identical to
    * [[lexiconScoreHof]]. Misses and null tokens add 0.0; a null array
    * scores null. */
  def lexiconScore(toks: Column, lexicon: Seq[(String, Double)]): Column =
    graft.functions.LexiconScore.lexiconScore(toks, lexicon)

  /** Composable HOF twin of [[lexiconScore]] (interpreted lambda + map
    * probe per token — the cross-checkable reference, not the hot path). */
  def lexiconScoreHof(toks: Column, lexicon: Seq[(String, Double)]): Column =
    aggregate(toks, lit(0.0),
      (acc, t) => acc + coalesce(element_at(typedlit(lexicon.toMap), t),
        lit(0.0)))

  /** fastText-style shallow quality classifier:
    * `sigmoid(bias + lexiconScore / n_tokens)` (mean pooling, so long
    * documents aren't favored just for repeating lexicon hits). One
    * map-only pass over the corpus — no exchange, ScaleSpec-pinned.
    * Null text yields a null probability (gate or coalesce downstream);
    * thresholding into keep/drop labels composes on top. */
  def withLexiconQuality(df: DataFrame, textCol: String,
      lexicon: Seq[(String, Double)], bias: Double = 0.0,
      out: String = "quality_p"): DataFrame = {
    require(!df.columns.contains(out),
      s"withLexiconQuality: column '$out' already exists; pass out=")
    val toks = tokens(col(textCol))
    df.withColumn(out, lit(1.0) / (lit(1.0) +
      exp(-(lit(bias) + lexiconScore(toks, lexicon) / size(toks)))))
  }

  /** Quality features: length, token count, punctuation/digit counts,
    * stopword ratio, mean token length. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val nStop = stopwordCount(toks, EnStop)
    Seq(
      "n_chars" -> length(text).cast("long"),
      "n_tokens" -> nTok,
      "n_punct" -> regexCount(text, "[.,!?;:]"),
      "n_digit" -> regexCount(text, "[0-9]"),
      "stop_ratio" -> nStop.cast("double") / nTok.cast("double"),
      "mean_tok_len" ->
        length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
          nTok.cast("double"))
  }

  /** Language decision over pre-computed hit counts: strict argmax with a
    * fixed tie order (zh by CJK presence, then de > fr > es > en).
    * Deterministic; mirrored exactly by the oracle. */
  def langDecision(en: Column, de: Column, fr: Column, es: Column,
      zh: Column): Column =
    when(zh > 0, "zh")
      .when(de > en && de > fr && de > es, "de")
      .when(fr > en && fr >= de && fr > es, "fr")
      .when(es > en && es >= de && es >= fr, "es")
      .otherwise("en")

  /** n-gram-free heuristic language ID. Tokens AND per-language counts are
    * staged as attributes before the CASE: conditional branches are outside
    * Spark's subexpression elimination, so an inlined count would re-run
    * its (interpreted, HOF) token filter once per WHEN that mentions it —
    * measured 3× slower on the fixture corpus. Adds `outCol` to `df`. */
  def withLangId(df: org.apache.spark.sql.DataFrame, textCol: String,
      outCol: String = "pred"): org.apache.spark.sql.DataFrame = {
    val tmp = Seq("__toks", "__en", "__de", "__fr", "__es", "__zh")
    df.withColumn("__toks", tokens(lower(col(textCol))))
      .withColumn("__en", stopwordCount(col("__toks"), EnStop))
      .withColumn("__de", stopwordCount(col("__toks"), DeStop))
      .withColumn("__fr", stopwordCount(col("__toks"), FrStop))
      .withColumn("__es", stopwordCount(col("__toks"), EsStop))
      .withColumn("__zh", regexp_count(col(textCol), lit("[一-鿿]")))
      .withColumn(outCol, langDecision(col("__en"), col("__de"),
        col("__fr"), col("__es"), col("__zh")))
      .drop(tmp: _*)
  }

  /** Character-level Shannon entropy (X5 quality signal: gibberish and
    * boilerplate both sit far from natural-language entropy). Uses the
    * count identity H = log2(n) − Σ cnt·log2(cnt) / n and folds the
    * per-char counts in SORTED char order — a deterministic IEEE
    * operation sequence, so the DuckDB oracle (same sorted fold)
    * reproduces the double bit-for-bit before the 6-decimal round.
    * A zero-exchange scan projection (the counts are native, see below);
    * empty text is the caller's edge (Spark splits "" into [""], DuckDB
    * into []). */
  def withCharEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    // the sorted (ch, cnt) table comes from the native one-pass
    // [[graft.functions.CharCounts]] — a pure scan projection where the
    // explode twin ([[withCharEntropyViaExplode]], spec-pinned identical)
    // shuffled one row per CHARACTER twice; the entropy FORMULA below is
    // the twin's expression tree verbatim, so the IEEE fold is
    // structurally identical. The null filter mirrors the twin's explode
    // (null text drops the row).
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        graft.functions.CharCounts.charCounts(col(textCol)).as("cc"))
      .select(col(idCol), col("cc"),
        expr("aggregate(cc, 0L, (a, x) -> a + x.cnt)").as("n"))
      .select(col(idCol),
        round(expr("log2(n) - aggregate(cc, 0D," +
          " (acc, x) -> acc + x.cnt * log2(x.cnt)) / n"), 6).as("entropy"),
        col("n").cast("long").as("n_chars"))

  /** Composable reference form of [[withCharEntropy]] (explode per char →
    * two keyed aggregations, (doc,char) then doc). Kept as the
    * cross-checkable twin; not for production use — it exchanges the
    * corpus as single-character rows, twice. */
  def withCharEntropyViaExplode(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .groupBy(idCol, "ch").agg(count(lit(1)).as("cnt"))
      .groupBy(idCol).agg(
        sort_array(collect_list(struct(col("ch"), col("cnt")))).as("cc"),
        sum(col("cnt")).as("n"))
      .select(col(idCol),
        round(expr("log2(n) - aggregate(cc, 0D," +
          " (acc, x) -> acc + x.cnt * log2(x.cnt)) / n"), 6).as("entropy"),
        col("n").cast("long").as("n_chars"))

  /** BPE-style pre-tokenizer regex (GPT-2 family): contraction suffixes,
    * space-prefixed letter runs, digit runs, punctuation runs. Restricted
    * to constructs both Java regex (Spark) and RE2 (DuckDB) support — the
    * original GPT-2 pattern's `\s+(?!\S)` lookahead is RE2-inexpressible,
    * so trailing whitespace is simply not emitted (token counts for
    * LLM-budget estimation don't count whitespace anyway). */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s']+"

  /** BPE-ish tokens (X5 token counting, the budget-estimation flavor):
    * every match of [[BpePattern]], in order, leading space attached —
    * the shape a byte-pair-encoder's pre-tokenizer feeds its merges. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  def bpeTokenCount(text: Column): Column =
    size(bpeTokens(text)).cast("long")

  /** Repetition signal (X5): the Gopher-style quality gate that catches
    * machine-generated and boilerplate text — the fraction of token
    * n-gram OCCURRENCES that are repeats of an earlier occurrence,
    * `1 − distinct/total` (0 for docs shorter than `n` tokens, and for
    * null text). Runs in the native one-pass
    * [[graft.functions.DupNgramRatio]] — the composable form is kept as
    * [[withDupNgramRatioHof]] and spec-pinned equal, but as a FILTER it
    * falls to predicate-pushdown alias substitution (the inlined split
    * re-evaluates per lambda element; measured 2.4× on the gated
    * curation pipeline). No shuffle, embarrassingly parallel,
    * integer-derived double division deterministic across engines.
    * Adds `outCol` to `df`. */
  def withDupNgramRatio(df: org.apache.spark.sql.DataFrame, textCol: String,
      n: Int, outCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn(outCol,
      coalesce(graft.functions.DupNgramRatio.ratio(col(textCol), n),
        lit(0.0)))

  /** Built-in-only reference form of [[withDupNgramRatio]] (identical
    * output; the semantics documentation the native expression is
    * checked against). */
  private[graft] def withDupNgramRatioHof(df: org.apache.spark.sql.DataFrame,
      textCol: String, n: Int, outCol: String)
      : org.apache.spark.sql.DataFrame = {
    require(n >= 2, "n must be >= 2 (unigram 'repetition' is vocabulary)")
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("__grams", Dedup.shingles(col("__toks"), n))
      .withColumn(outCol,
        when(size(col("__grams")) > 0,
          (size(col("__grams")) - size(array_distinct(col("__grams"))))
            .cast("double") / size(col("__grams")).cast("double"))
          .otherwise(lit(0.0)))
      .drop("__toks", "__grams")
  }

  /** Gopher-style composite quality gate (X5): the document-level rule
    * filter of Rae et al. 2021 (Gopher, appendix A1.1), the standard
    * first-pass web-corpus gate — token-count bounds, mean-token-length
    * bounds, a minimum fraction of words containing an alphabetic
    * character, and required-stopword presence (≥ `minStopHits` distinct
    * words from `requiredStop` must appear).
    *
    * Output adds `n_tokens`, `mean_tok_len`, `alpha_frac`, `stop_hits`,
    * and `gopher_pass` to `df`. All ratios are integer-derived IEEE
    * divisions — deterministic and engine-bit-identical, so the DuckDB
    * oracle replays the gate exactly. Null text scores 0 everywhere and
    * fails the gate (a doc with nothing in it is not trainable text);
    * the symbol-ratio rule of the paper is folded into `alpha_frac`
    * (a symbol "word" has no letter, so it lowers the fraction).
    *
    * Scale shape: a pure scan projection — zero exchanges; the stopword
    * presence probe is ONE pass over the tokens whatever the list size
    * ([[stopHits]], a codegen'd bitmask expression — the per-word
    * `array_contains` fold re-scanned the array once per required
    * word), the alpha probe one regex per token. Composes with
    * [[graft.operators.Pipelines]] gates at the scan.
    */
  def withGopherQuality(df: org.apache.spark.sql.DataFrame, textCol: String,
      minTokens: Long = 50, maxTokens: Long = 100000,
      minMeanTokLen: Double = 3.0, maxMeanTokLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopHits: Int = 2,
      requiredStop: Seq[String] = EnStop)
      : org.apache.spark.sql.DataFrame = {
    require(requiredStop.nonEmpty, "requiredStop must not be empty")
    require(minTokens <= maxTokens, "minTokens must be <= maxTokens")
    require(minStopHits <= requiredStop.distinct.size,
      s"minStopHits=$minStopHits can never be met: only " +
        s"${requiredStop.distinct.size} distinct required stopwords — " +
        "the gate would silently fail every document")
    // tokens staged as a real attribute (withLangId precedent): inlined,
    // each conditional branch would re-run the split per reference
    val out = df
      .withColumn("__toks",
        when(col(textCol).isNotNull, tokens(col(textCol))))
      .withColumn("n_tokens",
        coalesce(size(col("__toks")).cast("long"), lit(0L)))
      .withColumn("mean_tok_len",
        when(col("n_tokens") > 0,
          length(regexp_replace(trim(col(textCol)), "\\s+", ""))
            .cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("alpha_frac",
        when(col("n_tokens") > 0,
          size(filter(col("__toks"), t => t.rlike("[a-zA-Z]")))
            .cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("stop_hits",
        coalesce(stopHits(col("__toks"), requiredStop), lit(0L)))
    out
      .withColumn("gopher_pass",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
          col("mean_tok_len") >= minMeanTokLen &&
          col("mean_tok_len") <= maxMeanTokLen &&
          col("alpha_frac") >= minAlphaFrac &&
          col("stop_hits") >= minStopHits)
      .drop("__toks")
  }

  /** Gopher LINE-level rules (Rae et al. 2021, appendix A1.1 — the two
    * rules [[withGopherQuality]]'s document-level pass cannot see): a
    * document fails when more than `maxBulletFrac` of its lines start
    * with a bullet marker or more than `maxEllipsisFrac` end with an
    * ellipsis — the listicle/truncated-crawl signature. Output adds
    * `n_lines` (non-blank lines), `bullet_frac`, `ellipsis_frac`,
    * `line_rules_pass`.
    *
    * Blank lines (whitespace-only) are excluded from both numerator
    * and denominator — paragraph spacing is formatting, not content,
    * and counting it would dilute the listicle signal in proportion to
    * how airy the layout is. Null text has 0 lines and fails (the
    * [[withGopherQuality]] convention). Fractions are integer-count
    * IEEE divisions — engine-bit-identical, oracle-exact. Pure scan
    * projection: zero exchanges, composes with the document-level gate
    * at the scan. */
  def withGopherLineRules(df: org.apache.spark.sql.DataFrame,
      textCol: String, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3)
      : org.apache.spark.sql.DataFrame = {
    require(maxBulletFrac > 0.0 && maxBulletFrac <= 1.0,
      s"maxBulletFrac must be in (0, 1], got $maxBulletFrac")
    require(maxEllipsisFrac > 0.0 && maxEllipsisFrac <= 1.0,
      s"maxEllipsisFrac must be in (0, 1], got $maxEllipsisFrac")
    val bullets = Seq("- ", "* ", "•") // '•' needs no space: "•item"
    val isBullet = (l: Column) =>
      bullets.map(b => ltrim(l).startsWith(b)).reduce(_ || _)
    val isEllipsis = (l: Column) =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…")
    val out = df
      .withColumn("__lines", when(col(textCol).isNotNull,
        filter(split(col(textCol), "\n"), l => length(trim(l)) > 0)))
      .withColumn("n_lines",
        coalesce(size(col("__lines")).cast("long"), lit(0L)))
      .withColumn("bullet_frac",
        when(col("n_lines") > 0,
          size(filter(col("__lines"), isBullet)).cast("double") /
            col("n_lines").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("ellipsis_frac",
        when(col("n_lines") > 0,
          size(filter(col("__lines"), isEllipsis)).cast("double") /
            col("n_lines").cast("double"))
          .otherwise(lit(0.0)))
    out
      .withColumn("line_rules_pass",
        col("n_lines") > 0 &&
          col("bullet_frac") <= maxBulletFrac &&
          col("ellipsis_frac") <= maxEllipsisFrac)
      .drop("__lines")
  }

  /** C4 document rules (X5): the cleaning pass of Raffel et al. 2020
    * (§2.2, the "Colossal Clean Crawled Corpus" heuristics) — the
    * LINE filter keeps only lines that end in a terminal punctuation
    * mark (`.` `!` `?` `"`), carry at least `minLineWords` words, and
    * do not mention "javascript" (case-insensitive); the DOCUMENT
    * filter then drops pages with fewer than `minSentences` sentences
    * in the cleaned text, pages containing "lorem ipsum", and pages
    * containing a curly brace (the paper's code-page signal).
    *
    * Output adds `c4_text` (the kept lines re-joined with newlines;
    * null text stays null), `n_sentences` (terminal-punctuation runs in
    * the cleaned text — the deterministic stand-in for the paper's
    * sentence splitter, which is model-dependent), `has_lorem`,
    * `has_brace`, and `c4_pass`. The sibling of [[withGopherQuality]]:
    * Gopher gates on token statistics, C4 edits the text itself —
    * production corpora run both.
    *
    * Null text has 0 sentences and fails (the [[withGopherQuality]]
    * convention). All counts are integers; no floats anywhere — every
    * column is engine-exact. Pure scan projection: zero exchanges;
    * the line predicates run inside one `filter` lambda per doc.
    */
  /** The C4 §2.2 LINE-keep predicate (terminal punctuation mark,
    * ≥ `minLineWords` words, no "javascript") — the SINGLE definition
    * behind [[withC4Rules]] and [[Dedup.dedupLinesC4]]; their
    * fused≡two-pass parity is spec-pinned, so the rule must never
    * fork. */
  private[operators] def c4KeepLine(minLineWords: Int)
      : Column => Column = { l =>
    val r = rtrim(l)
    Seq(".", "!", "?", "\"").map(t => r.endsWith(t)).reduce(_ || _) &&
      size(tokens(l)) >= minLineWords &&
      !lower(l).contains("javascript")
  }

  def withC4Rules(df: org.apache.spark.sql.DataFrame, textCol: String,
      minSentences: Int = 5, minLineWords: Int = 3)
      : org.apache.spark.sql.DataFrame = {
    require(minSentences >= 0, s"minSentences must be >= 0, got $minSentences")
    require(minLineWords >= 1, s"minLineWords must be >= 1, got $minLineWords")
    val keepLine = c4KeepLine(minLineWords)
    val out = df
      .withColumn("c4_text",
        when(col(textCol).isNotNull,
          array_join(filter(split(col(textCol), "\n"), keepLine), "\n")))
      // sentence count = terminal-punctuation RUNS ("end..." is one
      // sentence boundary, not three): split on [.!?]+ yields runs+1
      // fields, minus a trailing empty field when the text ends in
      // punctuation — counting non-empty remainders is exact for both.
      .withColumn("n_sentences",
        coalesce(size(filter(split(col("c4_text"), "[.!?]+"),
          s => length(trim(s)) > 0)).cast("long"), lit(0L)))
      .withColumn("has_lorem",
        coalesce(lower(col(textCol)).contains("lorem ipsum"), lit(false)))
      .withColumn("has_brace",
        coalesce(col(textCol).contains("{"), lit(false)))
    out.withColumn("c4_pass",
      col("n_sentences") >= minSentences &&
        !col("has_lorem") && !col("has_brace"))
  }

  /** HTML boilerplate strip (X5 ingestion hygiene): drop script/style
    * blocks and comments, replace every remaining tag with a space,
    * decode the common entities, collapse whitespace. The regexes live
    * in the Java-regex/RE2 common subset (no lookarounds, no
    * backreferences — script and style close-tags are spelled out
    * rather than back-referenced) so the DuckDB oracle replays the
    * exact chain. Entity order is load-bearing: `&amp;` decodes LAST,
    * else `&amp;lt;` would double-decode to `<`. Pure projection —
    * codegen'd, zero shuffle, sits at the scan. */
  def stripHtml(text: Column): Column = {
    val noScript =
      regexp_replace(text, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    val amp = regexp_replace(decoded, "&amp;", "&")
    trim(regexp_replace(amp, "\\s+", " "))
  }

  /** Document fingerprint: MD5 of whitespace-normalized lowercase text.
    * The exact-dedup key (X1). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** First 8 hex chars of `md5(key)` as a non-negative long — the
    * library's deterministic pseudo-random source ([[splitBucket]],
    * [[spanCorrupt]], [[prefixLmSplit]] all mod it; no RNG state, so
    * every engine/run/cluster draws identically and SQL oracles replay
    * the exact arithmetic). */
  private[operators] def md5Head(key: Column): Column =
    conv(substring(md5(key), 1, 8), 16, 10).cast("long")

  /** Deterministic train/val/test assignment: bucket = the first 8 hex
    * chars of md5(salt + id) mod the weight total, mapped through the
    * cumulative weights. Pure projection (no shuffle, no RNG state):
    * every engine, run, and cluster size assigns each id identically —
    * the property a reproducible corpus split actually needs, which
    * `sample()`'s partition-dependent RNG does not give. */
  def splitBucket(id: Column, weights: Seq[Int], salt: String = "split")
      : Column = {
    require(weights.nonEmpty && weights.forall(_ > 0))
    val total = weights.sum
    val h = md5Head(concat(lit(salt), lit("|"),
      id.cast("string"))) % total
    val cum = weights.scanLeft(0)(_ + _).tail // cumulative upper bounds
    cum.zipWithIndex.init.foldRight(lit(weights.size - 1): Column) {
      case ((bound, i), acc) => when(h < bound, i).otherwise(acc)
    }
  }

  /** PII redaction (X5, the scrubbing pass every pretraining corpus
    * runs): emails, then bare IPv4s, then phone-like digit groups are
    * replaced with typed placeholder tags. Order is load-bearing and
    * pinned: emails contain digit runs, and an IPv4 *is* a phone-shaped
    * digit group (digits with separators), so phones go LAST; patterns
    * live in the Java-regex/RE2 common subset so the oracle replays
    * them. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9() .-]{7,}[0-9]"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    regexp_replace(noIp, PhoneRe, "<PHONE>")
  }

  /** Luhn mod-10 check (Luhn 1960, ISO/IEC 7812) over a digit string —
    * TRUE iff the string checksums as a payment-card / IMEI-class
    * identifier. The digit-shape regexes above flag anything
    * phone-shaped; Luhn is what separates an actual card number from a
    * random digit run, cutting the false-positive flood that makes
    * naive card-PII filters useless. Pure array arithmetic (split →
    * indexed transform → integer fold) — no UDF, and the fold is
    * integer so it replays exactly on any engine. Null/empty/non-digit
    * input yields null (cast-to-int null-propagates through the sum). */
  def luhnValid(digits: Column): Column = {
    // index from the RIGHT: position 0 (the check digit) counts plain,
    // every second digit leftward doubles (minus 9 past 9)
    val terms = transform(reverse(split(digits, "")), (ch, i) => {
      val d = ch.cast("int")
      when(i % 2 === 0, d)
        .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
    })
    when(length(digits) > 0,
      aggregate(terms, lit(0), (a, b) => a + b) % 10 === 0)
  }

  /** Card-number audit: maximal digit runs of 13–19 characters (the
    * ISO/IEC 7812 PAN length range) found in `textCol`, and how many of
    * them Luhn-validate. Adds `n_card_candidates`, `n_valid_cards`,
    * `card_pii` (any valid hit). Runs as one scan projection; the
    * candidate regex avoids lookaround (RE2-portable) by extracting
    * maximal `[0-9]+` runs and length-filtering, so separators inside a
    * formatted card ("4111 1111 ...") split it — normalize separators
    * upstream if the corpus formats cards that way. */
  def withCardAudit(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val runs = filter(
      regexp_extract_all(col(textCol), lit("[0-9]+"), lit(0)),
      r => length(r) >= 13 && length(r) <= 19)
    val valid = filter(runs, r => luhnValid(r))
    df.withColumn("n_card_candidates", size(runs).cast("long"))
      .withColumn("n_valid_cards", size(valid).cast("long"))
      .withColumn("card_pii", size(valid) > 0)
  }

  /** Token-window chunking (X5): split the whitespace-token stream into
    * chunks of `chunkTokens` with `overlap` tokens carried over — the
    * context-window packing shape. One row per (doc, chunk): explode of
    * a pure projection, so chunking is embarrassingly parallel and the
    * downstream shuffle (if any) carries chunks, not documents. */
  def chunkTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, chunkTokens: Int = 32, overlap: Int = 8)
      : org.apache.spark.sql.DataFrame = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val stride = chunkTokens - overlap
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), explode(sequence(lit(0),
        floor(greatest(size(col("__toks")) - 1 - overlap, lit(0))
          / stride).cast("int"))).as("__c"))
      .select(col(idCol), col("__c").cast("long").as("chunk_id"),
        array_join(slice(col("__toks"), col("__c") * stride + 1,
          lit(chunkTokens)), " ").as("chunk"),
        least(size(col("__toks")) - col("__c") * stride,
          lit(chunkTokens)).cast("long").as("n_tokens"))
  }

  /** Winnowing-style rolling fingerprints (X5): hash every k-char gram of
    * the normalized text, then keep the minimum hash of each w-gram
    * window — the classic local document fingerprint (robust to small
    * edits, position-independent). Adds `n_fp` (distinct fingerprint
    * count) and `fp_min` (global minimum) to `df`.
    *
    * The window-min pass runs in the native one-pass
    * [[graft.functions.WinnowWins]] expression (sliding-deque minimum; the
    * two-interpreted-lambdas-per-character HOF form was half the sf0.1
    * bench on its own). [[withWinnowFingerprintHof]] keeps the composable
    * form as the semantics reference — a spec pins them equal — and the
    * DuckDB oracle replays the HOF shape 1:1. */
  def withWinnowFingerprint(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, k: Int = 8, w: Int = 4)
      : org.apache.spark.sql.DataFrame =
    df.withColumn("__wins", graft.functions.WinnowWins.wins(
        regexp_replace(lower(trim(col(textCol))), "\\s+", " "), k, w))
      .select(col(idCol),
        size(array_distinct(col("__wins"))).cast("long").as("n_fp"),
        array_min(col("__wins")).as("fp_min"))

  /** Built-in-only reference implementation of [[withWinnowFingerprint]]
    * (bit-identical output, ~two orders of magnitude slower on long text:
    * interpreted `transform`/`slice` lambdas per character position). */
  def withWinnowFingerprintHof(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, k: Int = 8, w: Int = 4)
      : org.apache.spark.sql.DataFrame =
    df.withColumn("__nrm",
        regexp_replace(lower(trim(col(textCol))), "\\s+", " "))
      .withColumn("__grams", expr(
        s"""CASE WHEN length(__nrm) < $k THEN cast(array() AS array<string>)
           |ELSE transform(sequence(1, length(__nrm) - ${k - 1}),
           |  i -> substr(md5(substr(__nrm, i, $k)), 1, 8)) END""".stripMargin))
      .withColumn("__wins", expr(
        s"""CASE WHEN size(__grams) < $w THEN cast(array() AS array<string>)
           |ELSE transform(sequence(1, size(__grams) - ${w - 1}),
           |  i -> array_min(slice(__grams, i, $w))) END""".stripMargin))
      .select(col(idCol),
        size(array_distinct(col("__wins"))).cast("long").as("n_fp"),
        array_min(col("__wins")).as("fp_min"))

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4): turn each
    * document into a masked `(input_text, target_text)` pretraining
    * pair — masked spans become `<extra_id_k>` sentinels in the input,
    * and the target lists each sentinel followed by the tokens it
    * hides. DETERMINISTIC where the paper samples: token position `p`
    * (1-based) opens a span iff
    * `md5(salt|id|p) % startEvery == 0` (the [[splitBucket]] hash
    * convention — no RNG state, so every engine/run/cluster masks the
    * same spans and the oracle replays them bit-identically); a span
    * covers `spanLen` tokens and adjacent/overlapping spans merge into
    * one sentinel, so the masked fraction ≈ `spanLen/startEvery` and
    * mean span length ≥ `spanLen` — the T5 knobs (15%, mean 3) are
    * `startEvery=20, spanLen=3`.
    *
    * Output: `(doc_id, n_tokens, n_masked, n_spans, input_text,
    * target_text)`. Null text passes through as null texts with zero
    * counts; a doc whose every token masks still emits its pair (one
    * sentinel input). Tokens are the non-empty whitespace tokens.
    *
    * Scale shape: pure scan projection — the start flags, the
    * windowed-OR mask, and the single O(n) `aggregate` fold that
    * builds both texts all run inside the row. Zero exchanges, zero
    * joins, stream-composable. */
  def spanCorrupt(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, startEvery: Int = 20, spanLen: Int = 3,
      salt: String = "t5"): org.apache.spark.sql.DataFrame = {
    require(startEvery >= 2, s"startEvery must be >= 2, got $startEvery")
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    val withMask = df
      .select(col(idCol).as("doc_id"), col(textCol).isNull.as("__null"),
        when(col(textCol).isNotNull, toks)
          .otherwise(array().cast("array<string>")).as("__ts"))
      .withColumn("__st", transform(col("__ts"), (_, i) =>
        md5Head(concat(lit(salt), lit("|"),
          col("doc_id").cast("string"), lit("|"),
          (i + 1).cast("string"))) % startEvery === 0))
      .withColumn("__m", transform(col("__ts"), (_, i) =>
        (0 until spanLen).map(j =>
          i >= lit(j) && element_at(col("__st"), i - lit(j) + 1))
          .reduce(_ || _)))
      .withColumn("__rs", transform(col("__ts"), (_, i) =>
        element_at(col("__m"), i + 1) &&
          (i === 0 || !element_at(col("__m"), i))))
    val push = (acc: Column, piece: Column) =>
      when(acc === "", piece).otherwise(concat(acc, lit(" "), piece))
    val folded = withMask
      .withColumn("__zip",
        arrays_zip(col("__ts"), col("__m"), col("__rs")))
      .withColumn("__acc", aggregate(col("__zip"),
        struct(lit(0).as("k"), lit("").as("inp"), lit("").as("tgt")),
        (acc, x) => {
          val tok = x.getField("__ts")
          val m = x.getField("__m")
          val rs = x.getField("__rs")
          val sent = concat(lit("<extra_id_"),
            acc.getField("k").cast("string"), lit(">"))
          struct(
            (acc.getField("k") + when(rs, 1).otherwise(0)).as("k"),
            when(rs, push(acc.getField("inp"), sent))
              .when(m, acc.getField("inp"))
              .otherwise(push(acc.getField("inp"), tok)).as("inp"),
            when(rs, push(push(acc.getField("tgt"), sent), tok))
              .when(m, push(acc.getField("tgt"), tok))
              .otherwise(acc.getField("tgt")).as("tgt"))
        }))
    folded.select(col("doc_id"),
      size(col("__ts")).cast("long").as("n_tokens"),
      size(filter(col("__m"), b => b)).cast("long").as("n_masked"),
      col("__acc.k").cast("long").as("n_spans"),
      when(col("__null"), lit(null).cast("string"))
        .otherwise(col("__acc.inp")).as("input_text"),
      when(col("__null"), lit(null).cast("string"))
        .otherwise(col("__acc.tgt")).as("target_text"))
  }

  /** Character n-gram re-texting: `outCol` = the space-joined char
    * n-grams of the lowercase text with whitespace runs collapsed to
    * `_` (the fastText word-boundary marker — and it keeps every gram
    * whitespace-free, so the downstream word tokenizer never splits a
    * gram): "der die" → "der er_ r_d _di die". The adapter that turns
    * the WORD-feature training stack into a CHARACTER-feature one:
    * feed `outCol` to
    * [[QualityFilter.trainLda]]/[[scoreWith]] and its word-unigram+
    * bigram features become char n-grams and n-gram pairs — the
    * fastText-style feature space language ID actually needs (word
    * features barely transfer across languages; character shapes do).
    * Null text stays null; text shorter than `n` chars becomes `""`
    * (featureless → absent from scores, the [[QualityFilter]]
    * convention). Pure zero-exchange projection. */
  def withCharGrams(df: org.apache.spark.sql.DataFrame, textCol: String,
      outCol: String, n: Int = 3): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column — withCharGrams would " +
        "silently overwrite it; pick another outCol")
    require(!df.columns.contains("__cg_nrm"),
      "input already has a '__cg_nrm' column — withCharGrams stages " +
        "its normalization there and would clobber then drop it")
    df.withColumn("__cg_nrm",
        regexp_replace(lower(trim(col(textCol))), "\\s+", "_"))
      .withColumn(outCol,
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(graft.functions.CharGramText
            .charGramText(col("__cg_nrm"), n)))
      .drop("__cg_nrm")
  }

  /** Built-in-only reference twin of [[withCharGrams]] (bit-identical
    * output; one interpreted `substr` lambda per character position —
    * the [[withWinnowFingerprintHof]] convention, not the hot path:
    * the native form removed ~17 s from the q130 entry at sf0.1). */
  def withCharGramsHof(df: org.apache.spark.sql.DataFrame,
      textCol: String, outCol: String, n: Int = 3)
      : org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    df.withColumn("__cg_nrm",
        regexp_replace(lower(trim(col(textCol))), "\\s+", "_"))
      .withColumn(outCol,
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(array_join(expr(
            s"""CASE WHEN length(__cg_nrm) < $n
               |THEN cast(array() AS array<string>)
               |ELSE transform(sequence(1, length(__cg_nrm) - ${n - 1}),
               |  i -> substr(__cg_nrm, i, $n)) END""".stripMargin), " ")))
      .drop("__cg_nrm")
  }

  /** Prefix-LM pair generation (the UL2 "S-denoiser", Tay et al. 2022;
    * also the PrefixLM objective of Raffel et al. §3.2.1): split each
    * document's token stream at a DETERMINISTIC point into
    * `(input_text, target_text)` — the model conditions on the prefix
    * and learns to continue. Where the papers sample the split
    * uniformly, the split here is `minPrefix + md5(salt|id) %
    * (n − minPrefix)` (the [[splitBucket]] hash convention), so both
    * sides are non-empty, every engine/run splits identically, and a
    * SQL oracle replays the pair bit-for-bit. The sibling of
    * [[spanCorrupt]] — production mixtures (UL2) train on both.
    *
    * Docs with fewer than `minPrefix + 1` tokens can't split and are
    * ABSENT (gate upstream; they carry no continuation signal). Output:
    * `(doc_id, n_tokens, split_pos, input_text, target_text)` with
    * `split_pos` = prefix length in tokens. Pure scan projection —
    * zero exchanges, stream-composable. */
  def prefixLmSplit(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minPrefix: Int = 1, salt: String = "plm")
      : org.apache.spark.sql.DataFrame = {
    require(minPrefix >= 1, s"minPrefix must be >= 1, got $minPrefix")
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    df.select(col(idCol).as("doc_id"), toks.as("__ts"))
      .withColumn("__n", size(col("__ts")))
      .filter(col("__n") > minPrefix)
      .withColumn("__p", (lit(minPrefix) +
        md5Head(concat(lit(salt), lit("|"),
          col("doc_id").cast("string")))
          % (col("__n") - minPrefix)).cast("int"))
      .select(col("doc_id"), col("__n").cast("long").as("n_tokens"),
        col("__p").cast("long").as("split_pos"),
        array_join(slice(col("__ts"), lit(1), col("__p")), " ")
          .as("input_text"),
        array_join(slice(col("__ts"), col("__p") + 1,
          col("__n") - col("__p")), " ").as("target_text"))
  }

  /** Flesch reading ease (Flesch 1948; Kincaid et al. 1975's
    * coefficients) — the classic cheap readability gate a curation
    * recipe runs alongside [[qualityColumns]]: `206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words)` with the
    * standard machine heuristics — sentences = terminal-punctuation
    * runs `[.!?]+` (min 1), syllables per word = lowercase vowel
    * groups `[aeiouy]+` (min 1, the hyphenation-dictionary-free
    * approximation every readability library ships).
    *
    * Pure per-row projection: three regex counts over the token array
    * fold — zero shuffles beyond the caller's, the [[fingerprint]]
    * per-row-CPU contract. Counts are integers; the score is one
    * fixed-order double expression (round-6) — engine-bit-identical.
    * Empty/whitespace-only text reports 0 words and a null score
    * (loud, not a fake grade). Output: `(id, words, sentences,
    * syllables, flesch)`. */
  def readability(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = filter(tokens(col(textCol)), w => w =!= "")
    val words = size(toks).cast("long")
    val sentences = greatest(
      regexp_count(col(textCol), lit("[.!?]+")), lit(1)).cast("long")
    val syllables = aggregate(toks, lit(0L), (acc, w) =>
      acc + greatest(regexp_count(lower(w), lit("[aeiouy]+")),
        lit(1)).cast("long"))
    val flesch = lit(206.835) -
      lit(1.015) * (col("words").cast("double") /
        col("sentences").cast("double")) -
      lit(84.6) * (col("syllables").cast("double") /
        col("words").cast("double"))
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"), words.as("words"),
        sentences.as("sentences"), syllables.as("syllables"))
      .select(col("id"), col("words"), col("sentences"),
        col("syllables"),
        when(col("words") > 0, round(flesch, 6)).as("flesch"))
  }

  /** Mixed-script (homoglyph) audit — the confusable-spoofing gate a
    * crawl pipeline runs on tokens and URLs: a single token mixing
    * Latin with Cyrillic or Greek letters is the classic phishing /
    * SEO-spam signature ("pаypal" with U+0430), and it also breaks
    * every downstream exact-match dedup key. Per row: token count,
    * tokens mixing Latin+Cyrillic or Latin+Greek, and the ratio —
    * gate on `mixed_ratio > 0` for ASCII-expected corpora. Detection
    * is two character-class regex probes per token (a token "mixes"
    * when BOTH classes match); [[normalize]]'s NFC runs upstream so
    * composition variants can't hide a script. Pure per-row
    * projection — zero shuffles, codegen'd regexes.
    *
    * Output: `(id, n_tokens, mixed_tokens, mixed_ratio)` (round 6;
    * ratio null for token-less rows). */
  /** Heuristic code-vs-prose score — the mixture-balance detector a
    * pretraining pipeline runs when "how much of this crawl is source
    * code?" decides sampling rates (StarCoder/The-Stack-style corpus
    * accounting without a trained classifier): four replayable
    * signals — code-symbol character ratio (`{}[]();=<>`), indented-
    * line ratio, semicolon-terminated-line ratio, code-keyword token
    * ratio — combined by a FIXED documented weighting into [0, 1].
    * Thresholds are the caller's (≥ 0.5 is solidly code-shaped on
    * real corpora); the four raw ratios ride along so downstream can
    * re-weight without re-scanning. Pure per-row projection of
    * codegen'd regex/array builtins; every expression has a 1:1
    * DuckDB replay.
    *
    * Output: `(id, symbol_ratio, indent_ratio, semi_ratio, kw_ratio,
    * code_score)` (each round 6; null text rows are dropped, empty
    * text scores null). */
  def codeScore(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    val chars = length(t)
    val sym = chars -
      length(regexp_replace(t, "[{}\\[\\]();=<>]", ""))
    val lines = filter(split(t, "\n"), l => l =!= "")
    val nLines = size(lines)
    val indented = size(filter(lines, l => l.rlike("^(  |\\t)")))
    val semi = size(filter(lines, l => l.rlike(";\\s*$")))
    val toks = filter(tokens(t), w => w =!= "")
    val nToks = size(toks)
    val kws = Seq("def", "return", "import", "class", "void",
      "function", "var", "const", "if", "else", "for", "while")
    val kw = size(filter(toks, w => w.isInCollection(kws)))
    def ratio(n: Column, d: Column): Column =
      when(d > 0, n.cast("double") / d.cast("double")).otherwise(lit(0.0))
    val symR = ratio(sym, chars)
    val indR = ratio(indented, nLines)
    val semR = ratio(semi, nLines)
    val kwR = ratio(kw, nToks)
    val score = least(lit(1.0),
      lit(3.0) * symR + lit(0.25) * indR + lit(0.25) * semR +
        lit(1.5) * kwR)
    df.filter(t.isNotNull)
      .select(col(idCol).as("id"),
        round(symR, 6).as("symbol_ratio"),
        round(indR, 6).as("indent_ratio"),
        round(semR, 6).as("semi_ratio"),
        round(kwR, 6).as("kw_ratio"),
        when(chars > 0, round(score, 6)).as("code_score"))
  }

  /** DEFLATE compression ratio per document — the parameter-free
    * quality/repetition signal real curation stacks run next to the
    * Gopher rules (boilerplate, template floods, and degenerate
    * repetition compress far below natural prose; random noise and
    * encrypted blobs compress above it): `compression_ratio` =
    * deflated bytes / UTF-8 bytes at zlib level 6, plus the raw
    * `utf8_bytes`. Gate on BOTH tails (ratio < ~0.2 is repetition,
    * > ~1.0 is noise).
    *
    * This is the repo's one per-row native-codec operator outside
    * [[graft.operators.Multimodal]] and follows the same boundary
    * rules: `mapPartitions` with ONE reused `Deflater` per partition
    * (allocating per row thrashes native memory), null text → null
    * metrics, empty text → ratio null (0/0 has no meaning). JVM zlib
    * is deterministic for fixed input+level, so results are stable
    * across partitionings and runs; deflate itself is not
    * SQL-expressible, so the catalog oracle recomputes the ratio from
    * PINNED per-text deflate lengths (`fixtures/deflate_lengths
    * .parquet`, md5-keyed, generated through this same `Deflater`
    * path) and the spec carries the behavioral contracts.
    *
    * Output: `(id, utf8_bytes, compression_ratio)` (ratio round 6);
    * `idCol` must be castable to long. */
  def withCompressionRatio(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](8192)
        it.map { case (id, text) =>
          if (text == null) (id, None: Option[Long], None: Option[Double])
          else {
            val bytes = text.getBytes(
              java.nio.charset.StandardCharsets.UTF_8)
            if (bytes.isEmpty) (id, Some(0L), None: Option[Double])
            else {
              deflater.reset()
              deflater.setInput(bytes)
              deflater.finish()
              var n = 0L
              while (!deflater.finished()) n += deflater.deflate(buf)
              (id, Some(bytes.length.toLong),
                Some(n.toDouble / bytes.length))
            }
          }
        }
      }
      .toDF("id", "utf8_bytes", "compression_ratio")
    out.withColumn("compression_ratio",
      round(col("compression_ratio"), 6))
  }

  /** Fold the common Cyrillic/Greek homoglyphs onto their Latin
    * lookalikes — the cleanup companion to [[scriptMixAudit]]: run it
    * on the DEDUP KEY (never the published text — folding is lossy
    * and wrong for genuine Cyrillic/Greek prose) so "pаypal" and
    * "paypal" collapse to one key. Covers the confusables an actual
    * spam corpus contains (the UTS #39 core set for these two
    * scripts): Cyrillic а е о р с у х ѕ і ј ԁ ѡ + uppercase
    * А В Е З К М Н О Р С Т У Х, Greek ο ν Α Β Ε Ζ Η Ι Κ Μ Ν Ο Ρ Τ
    * Υ Χ. One codegen'd `translate` — pure projection. */
  def foldConfusables(text: Column): Column =
    translate(text,
      "аеорсухѕіјԁѡАВЕЗКМНОРСТУХοενΑΒΕΖΗΙΚΜΝΟΡΤΥΧ",
      "aeopcyxsijdwABE3KMHOPCTYXoevABEZHIKMNOPTYX")

  def scriptMixAudit(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = filter(tokens(col(textCol)), t => t =!= "")
    def mixes(t: Column): Column =
      t.rlike("[A-Za-z]") && t.rlike("[Ѐ-ӿͰ-Ͽ]")
    val mixed = size(filter(toks, t => mixes(t)))
    val n = size(toks)
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), n.as("n_tokens"),
        mixed.cast("long").as("mixed_tokens"),
        when(n > 0, round(mixed.cast("double") / n.cast("double"), 6))
          .as("mixed_ratio"))
      .withColumn("n_tokens", col("n_tokens").cast("long"))
  }
}
