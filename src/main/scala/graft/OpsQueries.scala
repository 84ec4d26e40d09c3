package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Checkpoints.PinOps
import graft.operators.{AsOfJoin, Checks, Connected, Decontaminate, Dedup, EntityResolution, Dsir, Embeddings, FooterStats, Funnel, Graph, Metrics, Multimodal, Pipelines, Profiles, Quantize, QualityFilter, RangeJoin, Rank, Sampling, Sketches, Similarity, TextAnalysis, Urls, Valuation, Vocab}

/** Catalog entries for the LLM-data-pipeline operators (dedup, similarity
  * search, text analysis, multimodal) over the `documents` / `embeddings`
  * fixtures. Every oracle mirrors the Spark expression 1:1 in DuckDB SQL —
  * MD5-based hashing keeps both engines bit-identical, decimal-exact sums
  * and rounded cosine scores keep floats reproducible (see Queries scaladoc).
  *
  * Near-dup fixtures: the synthetic corpus has no duplicates, so the dedup
  * entries plant them deterministically — every doc with `doc_id % 5 = 0`
  * gains a copy at `doc_id + 1000000` (exact copy for exact-dedup; a copy
  * with the last 3 tokens dropped for near-dup).
  */
object OpsQueries {
  import Queries.{t, events, Entry}

  /** Path of a committed fixture, resolved at SQL-dump time: the
    * working directory if the file is there, else the nearest ancestor
    * holding it (covers launchers whose cwd is a subdir or a wrapper
    * dir above the repo root). When resolution falls through entirely,
    * emit the bare CWD-RELATIVE `fixtures/<name>` rather than baking
    * this machine's absolute path into the dumped SQL — a replayer on
    * another machine whose cwd holds `fixtures/` then resolves it at
    * REPLAY time; one without it fails LOUDLY with a missing-file
    * error and the CorpusOpsSpec fixture-sync test names the remedy. */
  private def fixturePath(name: String): String = {
    val rel = java.nio.file.Paths.get("fixtures", name)
    var d = java.nio.file.Paths.get("").toAbsolutePath
    var found: Option[java.nio.file.Path] = None
    var hops = 0
    while (found.isEmpty && d != null && hops < 8) {
      val cand = d.resolve(rel)
      if (java.nio.file.Files.exists(cand)) found = Some(cand)
      d = d.getParent; hops += 1
    }
    found.getOrElse(rel).toString
  }

  // Shared SQL fragments (DuckDB side).
  private val TOKS = """regexp_split_to_array(trim(text), '\s+')"""
  private def stopIn(words: Seq[String]) =
    words.map(w => s"'$w'").mkString("(", ", ", ")")
  private def stopCnt(toksSql: String, words: Seq[String]) =
    s"len(list_filter($toksSql, t -> t IN ${stopIn(words)}))"

  /** fastText-style demo lexicon over the corpus vocabulary (shared by
    * the q90 entry and its oracle so the two can never drift). */
  private val QualityLex: Seq[(String, Double)] = Seq(
    "fast" -> 1.2, "merge" -> 0.9, "spark" -> 0.8, "big" -> 0.6,
    "scan" -> -0.3, "small" -> -0.5, "the" -> -0.1, "slow" -> -1.4)
  private def lexCaseSql: String =
    QualityLex.map { case (t, w) =>
      s"WHEN t = '${t.replace("'", "''")}' THEN $w"
    }.mkString("CASE ", " ", " ELSE 0.0 END")

  /** MinHash oracle-SQL builders shared by the fuzzy-decon entries
    * (q104, q109): the k=8 seeded-md5 signature mins and the
    * rowsPerBand=2 band projection with the shingle set carried. */
  private val MinhashMinsSql: String =
    (0 until 8).map(i => s"min(md5('$i|' || s)) AS m$i").mkString(", ")
  private def minhashShBandsSql(sig: String): String =
    (0 until 4).map(b =>
      s"SELECT doc_id, sh, $b AS band, md5(m${2 * b} || m${2 * b + 1})" +
        s" AS bv FROM $sig").mkString(" UNION ALL ")

  /** ISO-BMFF fixture fragments shared by the q142 entry and its
    * oracle so the two can never drift: ftyp box ('isom' brand), the
    * v0 mvhd box through its modification time (timescale/duration
    * follow), and the trak+tkhd v0 prefix through the unity matrix
    * (16.16 width/height follow). `Mp4ATrak` is a complete audio trak
    * (zero dimensions). */
  private val Mp4Ftyp = "000000106674797069736f6d00000000"
  private val Mp4MvhdPre = "0000006c6d766864" + "00000000" * 3
  private val Mp4TrakPre = "000000647472616b" + "0000005c746b6864" +
    "00000007" + "00000000" * 2 + "00000001" + "00000000" + "00000000" +
    "00" * 8 + "0000" * 4 +
    "00010000" + "00000000" * 3 + "00010000" + "00000000" * 3 + "40000000"
  private val Mp4ATrak = Mp4TrakPre + "00000000" * 2

  /** Canonical 54-byte BITMAPINFOHEADER BMP header as lowercase hex
    * (24-bit, zero reserved/compression/resolution fields) — shared by
    * the q158 fixture and its oracle. */
  private def bmpHdrHex(w: Int, h: Int, dataLen: Int): String = {
    def le32(v: Int) = f"${v & 0xff}%02x${(v >> 8) & 0xff}%02x" +
      f"${(v >> 16) & 0xff}%02x${(v >> 24) & 0xff}%02x"
    "424d" + le32(54 + dataLen) + "00000000" + le32(54) + le32(40) +
      le32(w) + le32(h) + "0100" + "1800" + "00000000" + le32(dataLen) +
      "00000000" * 4
  }

  /** Planted exact-duplicate corpus (SQL side). */
  private val DupDocsSql =
    """docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |  WHERE doc_id % 5 = 0)""".stripMargin

  /** Planted near-duplicate corpus: copies drop their last 3 tokens. */
  private val NearDupDocsSql =
    s"""docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    array_to_string(w[1:greatest(len(w)-3, 1)], ' ') AS text
      |  FROM (SELECT doc_id, $TOKS AS w FROM documents
      |        WHERE doc_id % 5 = 0))""".stripMargin

  /** SQL twin of `Dedup.minhashCandidates(k=8, rowsPerBand=2, shingleN=3)`
    * as a CTE chain ending in `pairs(doc_a, doc_b)`; expects a `docs`
    * CTE in scope. Shared by q25 (the pairs themselves) and q54 (their
    * transitive closure). */
  private val MinhashPairsSql = {
    val mins = (0 until 8)
      .map(i => s"min(md5('$i|' || s)) AS m$i").mkString(", ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, md5(m${2 * b} || m${2 * b + 1}) AS bv FROM sig")
      .mkString(" UNION ALL ")
    s"""toks AS (SELECT doc_id, $TOKS AS w FROM docs),
       |sh AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
       |  FROM toks, unnest(CASE WHEN len(w) >= 3
       |    THEN generate_series(1, len(w)-2) ELSE [] END) AS u(i)),
       |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |bands AS ($bands),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** Input-split fan-out ahead of CPU-dense per-row stages (winnowing,
    * minhash, shingling). The test corpus ships as ONE parquet row group,
    * so the scan yields one task regardless of partition-size confs and a
    * single core would run every hash. The repartition triggers ONLY when
    * the scan is under-split relative to the cluster — at production
    * scale a corpus arrives in thousands of splits and this is a no-op
    * plan-wise; when it does trigger, it round-robins raw text that is by
    * construction small (few splits ⇒ few hundred MB). */
  private def fanOut(s: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    // shared logic (r16): operators apply the same discipline at their
    // own CPU-dense stages — see graft.operators.Fan for the rationale
    // (RDD-partition probe, not inputFiles; no-op at production splits)
    graft.operators.Fan.out(df)

  /** CPU-dense documents scan (see [[fanOut]]). */
  private def docsFan(s: org.apache.spark.sql.SparkSession, dir: String) =
    fanOut(s, t(s, dir, "documents"))

  /** Planted copies of every doc with `doc_id % mod = 0`, re-idd at
    * `+offset`; `dropTokens > 0` makes them NEAR copies (last tokens
    * removed, token array staged as its own attribute so the split
    * runs once per row). The single definition behind every planted
    * fixture (exact q24-family, near q25-family, and q109's dual
    * plant). Offsets (1e6, 2e6) must sit above the fixture's real id
    * range or synthetic ids collide with real ones and multiply
    * through every unique-id-contract join — ScaleSpec pins
    * `max(doc_id) < 1e6` for every shipped scale factor. */
  private def plantedCopies(d: org.apache.spark.sql.DataFrame, mod: Int,
      offset: Long, dropTokens: Int): org.apache.spark.sql.DataFrame = {
    val base = d.filter(col("doc_id") % mod === 0)
    if (dropTokens == 0)
      base.select((col("doc_id") + offset).as("doc_id"), col("text"))
    else
      base.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__w"))
        .select((col("doc_id") + offset).as("doc_id"),
          array_join(slice(col("__w"), lit(1),
            greatest(size(col("__w")) - dropTokens, lit(1))), " ")
            .as("text"))
  }

  /** Spark twins of the planted corpora. */
  private def dupDocs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = docsFan(s, dir).select(col("doc_id"), col("text"))
    d.union(plantedCopies(d, mod = 5, offset = 1000000L, dropTokens = 0))
  }

  private def nearDupDocs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = docsFan(s, dir).select(col("doc_id"), col("text"))
    d.union(plantedCopies(d, mod = 5, offset = 1000000L, dropTokens = 3))
  }

  /** q42's full DuckDB oracle (curation pipeline: lang gate → quality
    * gate → exact dedup → LSH near-dup removal), shared with q79 which
    * splices decontamination CTEs into the same chain. */
  private lazy val Q42Sql: String = {
    val lt = """regexp_split_to_array(trim(lower(text)), '\s+')"""
    val mins = (0 until 8)
      .map(i => s"min(md5('$i|' || s)) AS m$i").mkString(", ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, md5(m${2 * b} || m${2 * b + 1}) AS bv FROM sig")
      .mkString(" UNION ALL ")
    s"""WITH $NearDupDocsSql,
       |lid AS (SELECT doc_id, text, CASE WHEN zh > 0 THEN 'zh'
       |    WHEN de > en AND de > fr AND de > es THEN 'de'
       |    WHEN fr > en AND fr >= de AND fr > es THEN 'fr'
       |    WHEN es > en AND es >= de AND es >= fr THEN 'es'
       |    ELSE 'en' END AS pred, ntok
       |  FROM (SELECT doc_id, text,
       |    ${stopCnt(lt, TextAnalysis.EnStop)} AS en,
       |    ${stopCnt(lt, TextAnalysis.DeStop)} AS de,
       |    ${stopCnt(lt, TextAnalysis.FrStop)} AS fr,
       |    ${stopCnt(lt, TextAnalysis.EsStop)} AS es,
       |    len(regexp_extract_all(text, '[一-鿿]')) AS zh,
       |    len($TOKS) AS ntok
       |    FROM docs)),
       |kept AS (SELECT doc_id, text, pred, ntok FROM lid
       |  WHERE pred = 'en' AND ntok >= 10),
       |ded AS (SELECT doc_id, text, pred, ntok FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY
       |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
       |    ORDER BY doc_id) AS rn FROM kept) WHERE rn = 1),
       |toks AS (SELECT doc_id, $TOKS AS w FROM ded),
       |shing AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
       |  FROM toks, unnest(CASE WHEN len(w) >= 3
       |    THEN generate_series(1, len(w)-2) ELSE [] END) AS u(i)),
       |sig AS (SELECT doc_id, $mins FROM shing GROUP BY doc_id),
       |bands AS ($bands),
       |cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3 THEN
       |    [array_to_string(w[i:i+2], ' ')
       |     for i in generate_series(1, len(w)-2)] ELSE [] END) AS sh
       |  FROM toks),
       |jac AS (SELECT doc_a, doc_b,
       |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
       |  (CAST(len(sa.sh) AS DOUBLE) + CAST(len(sb.sh) AS DOUBLE)
       |   - CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)) AS j
       |  FROM cands JOIN sets sa ON cands.doc_a = sa.doc_id
       |    JOIN sets sb ON cands.doc_b = sb.doc_id),
       |dropids AS (SELECT DISTINCT doc_b FROM jac WHERE j >= 0.5)
       |SELECT doc_id, pred, CAST(ntok AS BIGINT) AS n_tokens FROM ded
       |WHERE doc_id NOT IN (SELECT doc_b FROM dropids)
       |ORDER BY doc_id""".stripMargin
  }

  val catalog: Seq[(String, Entry)] = Seq(

    // ----- X5 text analysis ------------------------------------------------

    "q20_doc_tokens" -> Entry(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_calc"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, CAST(len($TOKS) AS BIGINT) AS n_tokens,
              |CAST(length(text) AS BIGINT) AS n_chars_calc
              |FROM documents ORDER BY doc_id""".stripMargin)),

    "q21_doc_quality" -> Entry(
      (s, dir) => {
        val cols = TextAnalysis.qualityColumns(col("text"))
          .map { case (n, c) => c.as(n) }
        docsFan(s, dir).select(col("doc_id") +: cols: _*)
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
              |CAST(length(text) AS BIGINT) AS n_chars,
              |CAST(len($TOKS) AS BIGINT) AS n_tokens,
              |CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
              |CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
              |CAST(${stopCnt(TOKS, TextAnalysis.EnStop)} AS DOUBLE)
              |  / CAST(len($TOKS) AS DOUBLE) AS stop_ratio,
              |CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
              |  / CAST(len($TOKS) AS DOUBLE) AS mean_tok_len
              |FROM documents ORDER BY doc_id""".stripMargin)),

    "q22_lang_id" -> Entry(
      (s, dir) => TextAnalysis.withLangId(docsFan(s, dir), "text")
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred"),
      Some {
        val lt = """regexp_split_to_array(trim(lower(text)), '\s+')"""
        s"""SELECT lang, CASE WHEN zh > 0 THEN 'zh'
           |  WHEN de > en AND de > fr AND de > es THEN 'de'
           |  WHEN fr > en AND fr >= de AND fr > es THEN 'fr'
           |  WHEN es > en AND es >= de AND es >= fr THEN 'es'
           |  ELSE 'en' END AS pred, COUNT(*) AS n
           |FROM (SELECT lang,
           |  ${stopCnt(lt, TextAnalysis.EnStop)} AS en,
           |  ${stopCnt(lt, TextAnalysis.DeStop)} AS de,
           |  ${stopCnt(lt, TextAnalysis.FrStop)} AS fr,
           |  ${stopCnt(lt, TextAnalysis.EsStop)} AS es,
           |  len(regexp_extract_all(text, '[一-鿿]')) AS zh
           |  FROM documents)
           |GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin
      }),

    "q23_doc_fingerprint" -> Entry(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Gopher-style repetition gate: fraction of 2-/3-gram occurrences
    // that repeat an earlier occurrence. Integer-derived double division
    // is deterministic in both engines; round(6) is belt-and-braces.
    "q56_repetition" -> Entry(
      (s, dir) => {
        val r = TextAnalysis.withDupNgramRatio(
          TextAnalysis.withDupNgramRatio(docsFan(s, dir), "text", 2, "__r2"),
          "text", 3, "__r3")
        r.select(col("doc_id"),
          round(col("__r2"), 6).as("dup2_ratio"),
          round(col("__r3"), 6).as("dup3_ratio"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $TOKS AS w FROM documents),
           |g AS (SELECT doc_id,
           |  CASE WHEN len(w) >= 2 THEN [array_to_string(w[i:i+1], ' ')
           |    for i in generate_series(1, len(w)-1)] ELSE [] END AS g2,
           |  CASE WHEN len(w) >= 3 THEN [array_to_string(w[i:i+2], ' ')
           |    for i in generate_series(1, len(w)-2)] ELSE [] END AS g3
           |  FROM toks)
           |SELECT doc_id,
           |  round(CASE WHEN len(g2) > 0 THEN
           |    (len(g2) - len(list_distinct(g2)))::DOUBLE
           |      / len(g2)::DOUBLE ELSE 0.0 END, 6) AS dup2_ratio,
           |  round(CASE WHEN len(g3) > 0 THEN
           |    (len(g3) - len(list_distinct(g3)))::DOUBLE
           |      / len(g3)::DOUBLE ELSE 0.0 END, 6) AS dup3_ratio
           |FROM g ORDER BY doc_id""".stripMargin)),

    "q34_winnow_fingerprint" -> Entry(
      (s, dir) => TextAnalysis.withWinnowFingerprint(
        docsFan(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH n AS (SELECT doc_id,
             |  regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nrm
             |  FROM documents),
             |g AS (SELECT doc_id, CASE WHEN length(nrm) < 8 THEN []
             |  ELSE [substr(md5(nrm[i:i+7]), 1, 8)
             |        for i in generate_series(1, length(nrm)-7)] END AS grams
             |  FROM n),
             |w AS (SELECT doc_id, CASE WHEN len(grams) < 4 THEN []
             |  ELSE [list_min(grams[i:i+3])
             |        for i in generate_series(1, len(grams)-3)] END AS wins
             |  FROM g)
             |SELECT doc_id, CAST(len(list_distinct(wins)) AS BIGINT) AS n_fp,
             |  list_min(wins) AS fp_min
             |FROM w ORDER BY doc_id""".stripMargin)),

    // ----- X5 BPE-ish token counting (LLM-budget estimation flavor) --------
    // The token array is staged as an attribute so the regex runs once per
    // row; the md5 over the joined tokens verifies the full tokenization,
    // not just the count.
    "q38_bpe_tokens" -> Entry(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.bpeTokens(col("text")).as("__bt"))
        .select(col("doc_id"),
          size(col("__bt")).cast("long").as("n_bpe"),
          md5(concat_ws("|", col("__bt"))).as("toks_md5"))
        .orderBy("doc_id"),
      Some(s"""WITH b AS (SELECT doc_id, regexp_extract_all(text,
              |  '${TextAnalysis.BpePattern.replace("'", "''")}') AS bt
              |  FROM documents)
              |SELECT doc_id, CAST(len(bt) AS BIGINT) AS n_bpe,
              |  md5(array_to_string(bt, '|')) AS toks_md5
              |FROM b ORDER BY doc_id""".stripMargin)),

    // ----- X5 deterministic corpus split -----------------------------------
    // Hash-bucket assignment (80/10/10): pure projection, identical on
    // every engine/run/cluster size — what a reproducible split needs,
    // unlike sample()'s partition-dependent RNG.
    "q43_corpus_split" -> Entry(
      (s, dir) => t(s, dir, "documents")
        .select(TextAnalysis.splitBucket(col("doc_id"), Seq(8, 1, 1))
          .cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some("""SELECT CAST(CASE WHEN h < 8 THEN 0 WHEN h < 9 THEN 1 ELSE 2
             |  END AS BIGINT) AS bucket, COUNT(*) AS n
             |FROM (SELECT CAST(('0x' || substr(md5('split|' ||
             |  CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 10 AS h
             |  FROM documents)
             |GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ----- X5 PII redaction ------------------------------------------------
    // The corpus has no planted PII, so adversarial strings are appended
    // per row; the md5 over the redacted text verifies every replacement.
    "q44_pii_redact" -> Entry(
      // docsFan: the PII regex battery is per-row CPU over a
      // single-task scan (r16 fan-out sweep)
      (s, dir) => docsFan(s, dir)
        .select(col("doc_id"), concat(col("text"),
          lit(" mail bob.smith+x@corp.example.org or +1 (415) 555-0199" +
            " at 10.0.42.7 ok")).as("__t"))
        .select(col("doc_id"),
          md5(TextAnalysis.redactPii(col("__t"))).as("red_md5"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, md5(
              |  regexp_replace(
              |    regexp_replace(
              |      regexp_replace(
              |        text || ' mail bob.smith+x@corp.example.org or' ||
              |          ' +1 (415) 555-0199 at 10.0.42.7 ok',
              |        '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
              |      '${TextAnalysis.Ipv4Re}', '<IP>', 'g'),
              |    '${TextAnalysis.PhoneRe}', '<PHONE>', 'g')) AS red_md5
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ----- X5 token-window chunking ----------------------------------------
    "q45_chunking" -> Entry(
      (s, dir) => TextAnalysis.chunkTokens(t(s, dir, "documents"),
        "doc_id", "text", chunkTokens = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_id"),
          md5(col("chunk")).as("chunk_md5"), col("n_tokens"))
        .orderBy("doc_id", "chunk_id"),
      Some(s"""WITH tk AS (SELECT doc_id, $TOKS AS w FROM documents),
              |c AS (SELECT doc_id, w, unnest(generate_series(0,
              |    CAST(floor(greatest(len(w) - 1 - 8, 0) / 24) AS INT)))
              |  AS c FROM tk)
              |SELECT doc_id, CAST(c AS BIGINT) AS chunk_id,
              |  md5(array_to_string(w[c*24+1:c*24+32], ' ')) AS chunk_md5,
              |  CAST(least(len(w) - c*24, 32) AS BIGINT) AS n_tokens
              |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // ----- X5 char-entropy quality signal ----------------------------------
    "q46_char_entropy" -> Entry(
      (s, dir) => TextAnalysis.withCharEntropy(
        t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, ''))
             |  AS ch FROM documents),
             |cc AS (SELECT doc_id, ch, COUNT(*) AS cnt
             |  FROM ch GROUP BY 1, 2),
             |agg AS (SELECT doc_id,
             |  list_sort(list(struct_pack(ch := ch, cnt := cnt))) AS cc,
             |  CAST(SUM(cnt) AS BIGINT) AS n FROM cc GROUP BY 1)
             |SELECT doc_id,
             |  round(log2(n) - list_sum([x.cnt * log2(x.cnt) for x in cc])
             |    / n, 6) AS entropy,
             |  n AS n_chars
             |FROM agg ORDER BY doc_id""".stripMargin)),

    // ----- corpus profiling (ANALYZE-style, one scan for all columns) ------
    "q48_profile" -> Entry(
      (s, dir) => graft.operators.Profiles.summarize(
        t(s, dir, "documents"), Seq("doc_id", "text", "lang"))
        .withColumnRenamed("column", "col_name")
        .orderBy("col_name"),
      Some {
        def one(c: String) =
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
             |CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |  AS n_nulls,
             |COUNT(DISTINCT $c) AS n_distinct,
             |CAST(MIN($c) AS VARCHAR) AS min_val,
             |CAST(MAX($c) AS VARCHAR) AS max_val
             |FROM documents""".stripMargin
        Seq("doc_id", "text", "lang").map(one)
          .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }),

    // ----- per-shard token packing (pretraining-stream binning) ------------
    "q49_token_packing" -> Entry(
      (s, dir) => graft.operators.Profiles.packTokens(
        t(s, dir, "documents").select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("ntok")),
        "doc_id", "ntok", budget = 512, nShards = 8)
        .orderBy("doc_id"),
      Some(s"""WITH tk AS (SELECT doc_id, len($TOKS) AS tok,
              |  doc_id % 8 AS shard FROM documents),
              |c AS (SELECT doc_id, shard, tok, SUM(tok) OVER (
              |  PARTITION BY shard ORDER BY doc_id
              |  ROWS UNBOUNDED PRECEDING) AS cum FROM tk)
              |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
              |  CAST(floor((cum - tok) / 512) AS BIGINT) AS bin,
              |  CAST(tok AS BIGINT) AS n_tokens
              |FROM c ORDER BY doc_id""".stripMargin)),

    // ----- X1 exact dedup --------------------------------------------------

    "q24_dedup_exact" -> Entry(
      (s, dir) => Dedup.exact(dupDocs(s, dir), "doc_id", "text")
        .orderBy("keep_id"),
      Some(s"""WITH $DupDocsSql
              |SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
              |  AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
              |FROM docs GROUP BY 1 ORDER BY keep_id""".stripMargin)),

    // ----- X2 MinHash + LSH near-dup candidates ----------------------------

    "q25_dedup_minhash" -> Entry(
      (s, dir) => Dedup.minhashCandidates(nearDupDocs(s, dir),
        "doc_id", "text", k = 8, rowsPerBand = 2, shingleN = 3)
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH $NearDupDocsSql,
              |$MinhashPairsSql
              |SELECT doc_a, doc_b FROM pairs
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // ----- X2 SimHash signatures -------------------------------------------

    "q26_dedup_simhash" -> Entry(
      (s, dir) => Dedup.simhash(docsFan(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some {
        val votes = (0 until 32)
          .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
          .mkString(", ")
        val sig = (0 until 32)
          .map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END")
          .mkString(" + ")
        s"""WITH tok AS (SELECT doc_id, unnest($TOKS) AS tok FROM documents),
           |h AS (SELECT doc_id,
           |  CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) AS BIGINT)
           |  AS h FROM tok),
           |v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id)
           |SELECT doc_id, CAST($sig AS BIGINT) AS simhash
           |FROM v ORDER BY doc_id""".stripMargin
      }),

    // ----- X2 SimHash banding: candidates without a pair space -------------
    // Band pigeonhole over the 32-bit signature (4 × 8-bit bands): every
    // pair within hamming 3 shares a band, so bucketing finds them all;
    // exact bit_count(xor) verification filters the rest.
    "q58_simhash_neardup" -> Entry(
      (s, dir) => Dedup.simhashCandidates(
        nearDupDocs(s, dir), "doc_id", "text")
        .orderBy("doc_a", "doc_b"),
      Some {
        val votes = (0 until 32)
          .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
          .mkString(", ")
        val sig = (0 until 32)
          .map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END")
          .mkString(" + ")
        s"""WITH $NearDupDocsSql,
           |tok AS (SELECT doc_id, unnest($TOKS) AS tok FROM docs),
           |h AS (SELECT doc_id,
           |  CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) AS BIGINT)
           |  AS h FROM tok),
           |v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id),
           |sg AS (SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM v),
           |bands AS (SELECT doc_id, simhash, b.band,
           |  (simhash >> (b.band * 8)) & 255 AS bv
           |  FROM sg, (SELECT unnest(generate_series(0, 3)) AS band) b),
           |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |  a.simhash AS sa, b.simhash AS sb
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
           |SELECT doc_a, doc_b,
           |  CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
           |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
           |ORDER BY doc_a, doc_b""".stripMargin
      }),

    // ----- X2 exact n-gram Jaccard verification ----------------------------

    "q27_ngram_jaccard" -> Entry(
      (s, dir) => {
        val base = docsFan(s, dir)
          .filter(col("doc_id") % 5 === 0).select(col("doc_id"), col("text"))
        val w = TextAnalysis.tokens(col("text"))
        val pert = base.select((col("doc_id") + 1000000).as("doc_b"),
          array_join(slice(w, lit(1), greatest(size(w) - 3, lit(1))), " ")
            .as("text_b"))
        base.join(pert, col("doc_id") + 1000000 === col("doc_b"))
          .select(col("doc_id").as("doc_a"), col("doc_b"),
            Dedup.jaccard(
              Dedup.shingles(TextAnalysis.tokens(col("text")), 3),
              Dedup.shingles(TextAnalysis.tokens(col("text_b")), 3))
              .as("jac"))
          .orderBy("doc_a")
      },
      Some(s"""WITH base AS (SELECT doc_id, $TOKS AS w FROM documents
              |  WHERE doc_id % 5 = 0),
              |pair AS (SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b,
              |  w AS wa, w[1:greatest(len(w)-3, 1)] AS wb FROM base),
              |sh AS (SELECT doc_a, doc_b,
              |  list_distinct(CASE WHEN len(wa) >= 3 THEN
              |    [array_to_string(wa[i:i+2], ' ')
              |     for i in generate_series(1, len(wa)-2)] ELSE [] END) AS sa,
              |  list_distinct(CASE WHEN len(wb) >= 3 THEN
              |    [array_to_string(wb[i:i+2], ' ')
              |     for i in generate_series(1, len(wb)-2)] ELSE [] END) AS sb
              |  FROM pair)
              |SELECT doc_a, doc_b,
              |  CAST(len(list_intersect(sa, sb)) AS DOUBLE) /
              |  (CAST(len(sa) AS DOUBLE) + CAST(len(sb) AS DOUBLE)
              |   - CAST(len(list_intersect(sa, sb)) AS DOUBLE)) AS jac
              |FROM sh ORDER BY doc_a""".stripMargin)),

    // ----- X2 end-to-end: LSH candidates → exact Jaccard verification ------
    // The canonical near-dup shape at scale: exact similarity only runs on
    // the candidate set, never the n² pair space.
    "q29_neardup_verified" -> Entry(
      (s, dir) => Dedup.verifiedNearDups(nearDupDocs(s, dir),
        "doc_id", "text", threshold = 0.5)
        .orderBy("doc_a", "doc_b"),
      Some {
        val mins = (0 until 8)
          .map(i => s"min(md5('$i|' || s)) AS m$i").mkString(", ")
        val bands = (0 until 4).map(b =>
          s"SELECT doc_id, $b AS band, md5(m${2 * b} || m${2 * b + 1}) AS bv FROM sig")
          .mkString(" UNION ALL ")
        s"""WITH $NearDupDocsSql,
           |toks AS (SELECT doc_id, $TOKS AS w FROM docs),
           |sh AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
           |  FROM toks, unnest(CASE WHEN len(w) >= 3
           |    THEN generate_series(1, len(w)-2) ELSE [] END) AS u(i)),
           |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
           |bands AS ($bands),
           |cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
           |sets AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3 THEN
           |    [array_to_string(w[i:i+2], ' ')
           |     for i in generate_series(1, len(w)-2)] ELSE [] END) AS sh
           |  FROM toks)
           |SELECT doc_a, doc_b,
           |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
           |  (CAST(len(sa.sh) AS DOUBLE) + CAST(len(sb.sh) AS DOUBLE)
           |   - CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)) AS jac
           |FROM cands JOIN sets sa ON cands.doc_a = sa.doc_id
           |  JOIN sets sb ON cands.doc_b = sb.doc_id
           |WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
           |  (CAST(len(sa.sh) AS DOUBLE) + CAST(len(sb.sh) AS DOUBLE)
           |   - CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)) >= 0.5
           |ORDER BY doc_a, doc_b""".stripMargin
      }),

    // ----- X1+X2+X5 end-to-end curation pipeline ---------------------------
    // The whole training-data pass as ONE plan: language gate → token
    // quality gate → exact dedup → MinHash/LSH near-dup removal. The
    // oracle replays every stage in SQL.
    "q42_curation_pipeline" -> Entry(
      (s, dir) => graft.operators.Pipelines.curate(
        nearDupDocs(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some(Q42Sql)),


    // ----- X-pipe curation with the repetition gate ------------------------
    // q42's pipeline plus the Gopher-style dup-2-gram gate between the
    // quality gate and the dedup window — still a row-local projection,
    // so it reaches the scan like the other gates.
    "q63_curation_rep" -> Entry(
      (s, dir) => graft.operators.Pipelines.curate(
        nearDupDocs(s, dir), "doc_id", "text",
        maxDupNgramRatio = Some(0.2))
        .orderBy("doc_id"),
      Some {
        val lt = """regexp_split_to_array(trim(lower(text)), '\s+')"""
        val mins = (0 until 8)
          .map(i => s"min(md5('$i|' || s)) AS m$i").mkString(", ")
        val bands = (0 until 4).map(b =>
          s"SELECT doc_id, $b AS band, md5(m${2 * b} || m${2 * b + 1}) AS bv FROM sig")
          .mkString(" UNION ALL ")
        s"""WITH $NearDupDocsSql,
           |lid AS (SELECT doc_id, text, CASE WHEN zh > 0 THEN 'zh'
           |    WHEN de > en AND de > fr AND de > es THEN 'de'
           |    WHEN fr > en AND fr >= de AND fr > es THEN 'fr'
           |    WHEN es > en AND es >= de AND es >= fr THEN 'es'
           |    ELSE 'en' END AS pred, ntok,
           |  CASE WHEN len(w) >= 2 THEN
           |    (len(w) - 1 - CAST(len(list_distinct(
           |      [array_to_string(w[i:i+1], ' ')
           |       for i in generate_series(1, len(w)-1)])) AS BIGINT))::DOUBLE
           |    / (len(w) - 1)::DOUBLE ELSE 0.0 END AS r2
           |  FROM (SELECT doc_id, text,
           |    ${stopCnt(lt, TextAnalysis.EnStop)} AS en,
           |    ${stopCnt(lt, TextAnalysis.DeStop)} AS de,
           |    ${stopCnt(lt, TextAnalysis.FrStop)} AS fr,
           |    ${stopCnt(lt, TextAnalysis.EsStop)} AS es,
           |    len(regexp_extract_all(text, '[一-鿿]')) AS zh,
           |    len($TOKS) AS ntok, $TOKS AS w
           |    FROM docs)),
           |kept AS (SELECT doc_id, text, pred, ntok FROM lid
           |  WHERE pred = 'en' AND ntok >= 10 AND r2 <= 0.2),
           |ded AS (SELECT doc_id, text, pred, ntok FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY
           |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
           |    ORDER BY doc_id) AS rn FROM kept) WHERE rn = 1),
           |toks AS (SELECT doc_id, $TOKS AS w FROM ded),
           |shing AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
           |  FROM toks, unnest(CASE WHEN len(w) >= 3
           |    THEN generate_series(1, len(w)-2) ELSE [] END) AS u(i)),
           |sig AS (SELECT doc_id, $mins FROM shing GROUP BY doc_id),
           |bands AS ($bands),
           |cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
           |sets AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3 THEN
           |    [array_to_string(w[i:i+2], ' ')
           |     for i in generate_series(1, len(w)-2)] ELSE [] END) AS sh
           |  FROM toks),
           |jac AS (SELECT doc_a, doc_b,
           |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
           |  (CAST(len(sa.sh) AS DOUBLE) + CAST(len(sb.sh) AS DOUBLE)
           |   - CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)) AS j
           |  FROM cands JOIN sets sa ON cands.doc_a = sa.doc_id
           |    JOIN sets sb ON cands.doc_b = sb.doc_id),
           |dropids AS (SELECT DISTINCT doc_b FROM jac WHERE j >= 0.5)
           |SELECT doc_id, pred, CAST(ntok AS BIGINT) AS n_tokens FROM ded
           |WHERE doc_id NOT IN (SELECT doc_b FROM dropids)
           |ORDER BY doc_id""".stripMargin
      }),

    // ----- X2/X3 embedding cosine ------------------------------------------

    "q28_embed_neardup" -> Entry(
      (s, dir) => Similarity.nearDupPairs(
        t(s, dir, "embeddings").filter(col("vec_id") % 20 === 0),
        "vec_id", "embedding", threshold = -1.0, assumeSmall = true)
        .orderBy("id_a", "id_b"),
      Some("""WITH sub AS (SELECT vec_id, embedding FROM embeddings
             |  WHERE vec_id % 20 = 0)
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  round(
             |    list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
             |      for i in generate_series(1, len(a.embedding))]) /
             |    (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
             |      for i in generate_series(1, len(a.embedding))])) *
             |     sqrt(list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
             |      for i in generate_series(1, len(b.embedding))]))), 6)
             |  AS score
             |FROM sub a, sub b WHERE a.vec_id < b.vec_id
             |ORDER BY id_a, id_b""".stripMargin)),

    "q30_cosine_topk" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.cosineTopK(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", k = 10)
          .withColumnRenamed("rank", "rnk")
          .orderBy("query_id", "rnk")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
             |  FROM embeddings WHERE vec_id < 5),
             |c AS (SELECT vec_id AS corpus_id, embedding AS cv
             |  FROM embeddings),
             |s AS (SELECT query_id, corpus_id,
             |  round(
             |    list_sum([qv[i]::DOUBLE * cv[i]::DOUBLE
             |      for i in generate_series(1, len(qv))]) /
             |    (sqrt(list_sum([qv[i]::DOUBLE * qv[i]::DOUBLE
             |      for i in generate_series(1, len(qv))])) *
             |     sqrt(list_sum([cv[i]::DOUBLE * cv[i]::DOUBLE
             |      for i in generate_series(1, len(cv))]))), 6) AS score
             |  FROM q, c WHERE query_id <> corpus_id),
             |r AS (SELECT query_id, corpus_id, score,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             |    ORDER BY score DESC, corpus_id) AS BIGINT) AS rnk FROM s)
             |SELECT query_id, corpus_id, score, rnk FROM r
             |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin)),

    // ----- X2 scale path: bucketed embedding near-dup (no cross join) ------
    "q33_embed_neardup_lsh" -> Entry(
      (s, dir) => Similarity.nearDupPairsLsh(t(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = -1.0)
        .orderBy("id_a", "id_b"),
      Some("""WITH pl AS (
             |  SELECT p.plane, j.j,
             |    CAST(CAST(('0x' || substr(md5(p.plane::VARCHAR || '_'
             |      || j.j::VARCHAR), 1, 8)) AS UBIGINT) AS DOUBLE)
             |      / 4294967296.0 - 0.5 AS r
             |  FROM (SELECT unnest(generate_series(0, 7)) AS plane) p,
             |       (SELECT unnest(generate_series(1, 64)) AS j) j),
             |comp AS (SELECT vec_id, j, embedding[j]::DOUBLE AS x
             |  FROM embeddings, unnest(generate_series(1, len(embedding)))
             |    AS u(j)),
             |dots AS (SELECT vec_id, plane, SUM(x * r) AS d
             |  FROM comp JOIN pl USING (j) GROUP BY 1, 2),
             |bkt AS (SELECT vec_id, CAST(SUM(CASE WHEN d > 0
             |    THEN (1::BIGINT << plane) ELSE 0 END) AS BIGINT) AS bucket
             |  FROM dots GROUP BY 1),
             |v AS (SELECT b.vec_id, e.embedding, b.bucket
             |  FROM bkt b JOIN embeddings e USING (vec_id))
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  round(
             |    list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
             |      for i in generate_series(1, len(a.embedding))]) /
             |    (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
             |      for i in generate_series(1, len(a.embedding))])) *
             |     sqrt(list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
             |      for i in generate_series(1, len(b.embedding))]))), 6)
             |  AS score
             |FROM v a JOIN v b ON a.bucket = b.bucket
             |  AND a.vec_id < b.vec_id
             |ORDER BY id_a, id_b""".stripMargin)),

    // ----- X3 scale path: sign-LSH bucketed ANN ----------------------------
    // Buckets come from MD5-derived pseudo-random hyperplanes, so both
    // engines compute identical projections; only same-bucket candidates
    // are scored (the join is an equi-join on bucket id — the shape that
    // replaces the brute-force corpus scan at scale).
    "q31_ann_lsh" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.annTopK(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", k = 10, nPlanes = 8)
          .withColumnRenamed("rank", "rnk")
          .orderBy("query_id", "rnk")
      },
      Some("""WITH pl AS (
             |  SELECT p.plane, j.j,
             |    CAST(CAST(('0x' || substr(md5(p.plane::VARCHAR || '_'
             |      || j.j::VARCHAR), 1, 8)) AS UBIGINT) AS DOUBLE)
             |      / 4294967296.0 - 0.5 AS r
             |  FROM (SELECT unnest(generate_series(0, 7)) AS plane) p,
             |       (SELECT unnest(generate_series(1, 64)) AS j) j),
             |comp AS (SELECT vec_id, j, embedding[j]::DOUBLE AS x
             |  FROM embeddings, unnest(generate_series(1, len(embedding)))
             |    AS u(j)),
             |dots AS (SELECT vec_id, plane, SUM(x * r) AS d
             |  FROM comp JOIN pl USING (j) GROUP BY 1, 2),
             |bkt AS (SELECT vec_id, CAST(SUM(CASE WHEN d > 0
             |    THEN (1::BIGINT << plane) ELSE 0 END) AS BIGINT) AS bucket
             |  FROM dots GROUP BY 1),
             |qb AS (SELECT b.vec_id AS query_id, e.embedding AS qv, b.bucket
             |  FROM bkt b JOIN embeddings e USING (vec_id)
             |  WHERE b.vec_id < 5),
             |cb AS (SELECT b.vec_id AS corpus_id, e.embedding AS cv, b.bucket
             |  FROM bkt b JOIN embeddings e USING (vec_id)),
             |s AS (SELECT query_id, corpus_id,
             |  round(
             |    list_sum([qv[i]::DOUBLE * cv[i]::DOUBLE
             |      for i in generate_series(1, len(qv))]) /
             |    (sqrt(list_sum([qv[i]::DOUBLE * qv[i]::DOUBLE
             |      for i in generate_series(1, len(qv))])) *
             |     sqrt(list_sum([cv[i]::DOUBLE * cv[i]::DOUBLE
             |      for i in generate_series(1, len(cv))]))), 6) AS score
             |  FROM qb JOIN cb USING (bucket) WHERE query_id <> corpus_id),
             |r AS (SELECT query_id, corpus_id, score,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             |    ORDER BY score DESC, corpus_id) AS BIGINT) AS rnk FROM s)
             |SELECT query_id, corpus_id, score, rnk FROM r
             |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin)),

    // ----- X3 IVF-style ANN (the inverted-file counterpart of q31) ---------
    // Centroids are a deterministic subset (lowest 4 ids; a k-means
    // refinement would slot in unchanged); every vector is assigned to
    // its nearest centroid via a broadcast of the tiny centroid set, and
    // only same-cluster pairs are scored — the partition-pruning shape of
    // a real IVF index.
    "q39_ann_ivf" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(emb.filter(col("vec_id") % 100 === 0), emb,
          emb.filter(col("vec_id") < 4), "vec_id", "embedding", k = 5,
          "vec_id", "embedding")
          .withColumnRenamed("rank", "rnk")
          .orderBy("query_id", "rnk")
      },
      Some {
        def cos(a: String, b: String) =
          s"""round(
             |    list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($a))]) /
             |    (sqrt(list_sum([$a[i]::DOUBLE * $a[i]::DOUBLE
             |      for i in generate_series(1, len($a))])) *
             |     sqrt(list_sum([$b[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($b))]))), 6)""".stripMargin
        s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv
           |  FROM embeddings WHERE vec_id < 4),
           |sc AS (SELECT e.vec_id, e.embedding, c.cid,
           |  ${cos("e.embedding", "c.cv")} AS cs
           |  FROM embeddings e, c),
           |asgn AS (SELECT vec_id, embedding, cid AS cluster FROM (
           |  SELECT vec_id, embedding, cid, ROW_NUMBER() OVER (
           |    PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn FROM sc)
           |  WHERE rn = 1),
           |q AS (SELECT vec_id AS query_id, embedding AS qv, cluster
           |  FROM asgn WHERE vec_id % 100 = 0),
           |s AS (SELECT query_id, a.vec_id AS corpus_id,
           |  ${cos("qv", "a.embedding")} AS score
           |  FROM q JOIN asgn a USING (cluster) WHERE query_id <> a.vec_id),
           |r AS (SELECT query_id, corpus_id, score,
           |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY score DESC, corpus_id) AS BIGINT) AS rnk FROM s)
           |SELECT query_id, corpus_id, score, rnk FROM r
           |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
      }),

    // ----- X3 IVF multi-probe (the nprobe recall knob) ---------------------
    // Same shape as q39 but each query searches its TWO nearest clusters;
    // corpus rows still live in exactly one, so pairs never duplicate.
    "q57_ivf_multiprobe" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(emb.filter(col("vec_id") % 100 === 0), emb,
          emb.filter(col("vec_id") < 4), "vec_id", "embedding", k = 5,
          "vec_id", "embedding", probe = 2)
          .withColumnRenamed("rank", "rnk")
          .orderBy("query_id", "rnk")
      },
      Some {
        def cos(a: String, b: String) =
          s"""round(
             |    list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($a))]) /
             |    (sqrt(list_sum([$a[i]::DOUBLE * $a[i]::DOUBLE
             |      for i in generate_series(1, len($a))])) *
             |     sqrt(list_sum([$b[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($b))]))), 6)""".stripMargin
        s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv
           |  FROM embeddings WHERE vec_id < 4),
           |sc AS (SELECT e.vec_id, e.embedding, c.cid,
           |  ${cos("e.embedding", "c.cv")} AS cs
           |  FROM embeddings e, c),
           |rn AS (SELECT vec_id, embedding, cid, ROW_NUMBER() OVER (
           |    PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn FROM sc),
           |asgn AS (SELECT vec_id, embedding, cid AS cluster FROM rn
           |  WHERE rn = 1),
           |q AS (SELECT vec_id AS query_id, embedding AS qv,
           |  cid AS cluster FROM rn WHERE rn <= 2 AND vec_id % 100 = 0),
           |s AS (SELECT query_id, a.vec_id AS corpus_id,
           |  ${cos("qv", "a.embedding")} AS score
           |  FROM q JOIN asgn a USING (cluster) WHERE query_id <> a.vec_id),
           |r AS (SELECT query_id, corpus_id, score,
           |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY score DESC, corpus_id) AS BIGINT) AS rnk FROM s)
           |SELECT query_id, corpus_id, score, rnk FROM r
           |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
      }),

    // ----- X3 IVF with k-means-refined centroids ---------------------------
    // One Lloyd iteration (spherical k-means) over q39's deterministic
    // seed centroids, then the same cluster-pruned top-k. Means fold as
    // exact decimal sums (order-independent) divided as double → float,
    // so centroids are bit-stable and the oracle replays the identical
    // arithmetic; assignments use the usual round-6 cosine.
    "q55_ivf_kmeans" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val refined = Similarity.kmeansRefine(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 4), "vec_id", "embedding", iters = 1)
        Similarity.ivfTopK(emb.filter(col("vec_id") % 100 === 0), emb,
          refined, "vec_id", "embedding", k = 5, "vec_id", "embedding")
          .withColumnRenamed("rank", "rnk")
          .orderBy("query_id", "rnk")
      },
      Some {
        def cos(a: String, b: String) =
          s"""round(
             |    list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($a))]) /
             |    (sqrt(list_sum([$a[i]::DOUBLE * $a[i]::DOUBLE
             |      for i in generate_series(1, len($a))])) *
             |     sqrt(list_sum([$b[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($b))]))), 6)""".stripMargin
        s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cv
           |  FROM embeddings WHERE vec_id < 4),
           |sc0 AS (SELECT e.vec_id, e.embedding, c0.cid,
           |  ${cos("e.embedding", "c0.cv")} AS cs
           |  FROM embeddings e, c0),
           |a0 AS (SELECT vec_id, embedding, cid AS cluster FROM (
           |  SELECT vec_id, embedding, cid, ROW_NUMBER() OVER (
           |    PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn FROM sc0)
           |  WHERE rn = 1),
           |comp AS (SELECT cluster, j, embedding[j] AS x
           |  FROM a0, unnest(generate_series(1, len(embedding))) AS u(j)),
           |m AS (SELECT cluster, j,
           |  CAST(CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE)
           |    / CAST(COUNT(*) AS BIGINT)::DOUBLE AS REAL) AS mu
           |  FROM comp GROUP BY 1, 2),
           |c1 AS (SELECT cluster AS cid, list(mu ORDER BY j) AS cv
           |  FROM m GROUP BY 1),
           |sc1 AS (SELECT e.vec_id, e.embedding, c1.cid,
           |  ${cos("e.embedding", "c1.cv")} AS cs
           |  FROM embeddings e, c1),
           |a1 AS (SELECT vec_id, embedding, cid AS cluster FROM (
           |  SELECT vec_id, embedding, cid, ROW_NUMBER() OVER (
           |    PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn FROM sc1)
           |  WHERE rn = 1),
           |q AS (SELECT vec_id AS query_id, embedding AS qv, cluster
           |  FROM a1 WHERE vec_id % 100 = 0),
           |s AS (SELECT query_id, a.vec_id AS corpus_id,
           |  ${cos("qv", "a.embedding")} AS score
           |  FROM q JOIN a1 a USING (cluster) WHERE query_id <> a.vec_id),
           |r AS (SELECT query_id, corpus_id, score,
           |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY score DESC, corpus_id) AS BIGINT) AS rnk FROM s)
           |SELECT query_id, corpus_id, score, rnk FROM r
           |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
      }),

    // ----- X3 PQ + ADC (the compression half of IVF-PQ) --------------------
    // Corpus vectors compress to 4 codeword ids (argmin squared-L2 per
    // 16-dim subspace, MD5-derived codebooks); queries keep full distance
    // tables; approximate distance = 4 ordered table lookups. All
    // arithmetic is a deterministic IEEE sequence both engines replay.
    "q59_pq_adc" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.pqTopK(emb.filter(col("vec_id") % 100 === 0), emb,
          "vec_id", "embedding", k = 5, Similarity.pqCodebooks())
          .withColumnRenamed("rank", "rnk")
          .orderBy("query_id", "rnk")
      },
      Some {
        val encCols = (0 until 4).map(mi =>
          s"any_value(CASE WHEN m = $mi THEN" +
            s" list_position(dists, list_min(dists)) END) AS c$mi")
          .mkString(",\n           |  ")
        val qtCols = (0 until 4).map(mi =>
          s"any_value(CASE WHEN m = $mi THEN dists END) AS dt$mi")
          .mkString(",\n           |  ")
        s"""WITH cbraw AS (SELECT m.m, k.k, j.j,
           |  CAST(CAST(('0x' || substr(md5('pq_' || m.m || '_' || k.k
           |    || '_' || j.j), 1, 8)) AS UBIGINT) AS DOUBLE)
           |    / 4294967296.0 - 0.5 AS c
           |  FROM (SELECT unnest(generate_series(0, 3)) AS m) m,
           |       (SELECT unnest(generate_series(0, 15)) AS k) k,
           |       (SELECT unnest(generate_series(1, 16)) AS j) j),
           |cb AS (SELECT m, k, list(c ORDER BY j) AS cv
           |  FROM cbraw GROUP BY 1, 2),
           |d AS (SELECT e.vec_id, cb.m, cb.k,
           |  list_sum([(e.embedding[cb.m*16+j]::DOUBLE - cv[j])
           |    * (e.embedding[cb.m*16+j]::DOUBLE - cv[j])
           |    for j in generate_series(1, 16)]) AS dist
           |  FROM embeddings e, cb),
           |dl AS (SELECT vec_id, m, list(dist ORDER BY k) AS dists
           |  FROM d GROUP BY 1, 2),
           |enc AS (SELECT vec_id,
           |  $encCols
           |  FROM dl GROUP BY vec_id),
           |qt AS (SELECT vec_id AS query_id,
           |  $qtCols
           |  FROM dl WHERE vec_id % 100 = 0 GROUP BY 1),
           |s AS (SELECT query_id, e.vec_id AS corpus_id,
           |  round(dt0[c0] + dt1[c1] + dt2[c2] + dt3[c3], 6) AS adist
           |  FROM qt, enc e WHERE query_id <> e.vec_id),
           |r AS (SELECT query_id, corpus_id, adist,
           |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY adist ASC, corpus_id) AS BIGINT) AS rnk FROM s)
           |SELECT query_id, corpus_id, adist, rnk FROM r
           |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
      }),

    // ----- X3 two-stage ANN: ADC shortlist → exact cosine re-rank ----------
    // PQ/ADC proposes 50 candidates per query; only those pairs get the
    // exact cosine. Oracle = q59's chain with rnk <= 50, joined back to
    // raw vectors for the re-rank.
    "q61_pq_rerank" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.pqTopKReranked(emb.filter(col("vec_id") % 100 === 0),
          emb, "vec_id", "embedding", k = 5, Similarity.pqCodebooks(),
          shortlist = 50)
          .withColumnRenamed("rank", "rnk")
          .orderBy("query_id", "rnk")
      },
      Some {
        def cos(a: String, b: String) =
          s"""round(
             |    list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($a))]) /
             |    (sqrt(list_sum([$a[i]::DOUBLE * $a[i]::DOUBLE
             |      for i in generate_series(1, len($a))])) *
             |     sqrt(list_sum([$b[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($b))]))), 6)""".stripMargin
        val encCols = (0 until 4).map(mi =>
          s"any_value(CASE WHEN m = $mi THEN" +
            s" list_position(dists, list_min(dists)) END) AS c$mi")
          .mkString(",\n           |  ")
        val qtCols = (0 until 4).map(mi =>
          s"any_value(CASE WHEN m = $mi THEN dists END) AS dt$mi")
          .mkString(",\n           |  ")
        s"""WITH cbraw AS (SELECT m.m, k.k, j.j,
           |  CAST(CAST(('0x' || substr(md5('pq_' || m.m || '_' || k.k
           |    || '_' || j.j), 1, 8)) AS UBIGINT) AS DOUBLE)
           |    / 4294967296.0 - 0.5 AS c
           |  FROM (SELECT unnest(generate_series(0, 3)) AS m) m,
           |       (SELECT unnest(generate_series(0, 15)) AS k) k,
           |       (SELECT unnest(generate_series(1, 16)) AS j) j),
           |cb AS (SELECT m, k, list(c ORDER BY j) AS cv
           |  FROM cbraw GROUP BY 1, 2),
           |d AS (SELECT e.vec_id, cb.m, cb.k,
           |  list_sum([(e.embedding[cb.m*16+j]::DOUBLE - cv[j])
           |    * (e.embedding[cb.m*16+j]::DOUBLE - cv[j])
           |    for j in generate_series(1, 16)]) AS dist
           |  FROM embeddings e, cb),
           |dl AS (SELECT vec_id, m, list(dist ORDER BY k) AS dists
           |  FROM d GROUP BY 1, 2),
           |enc AS (SELECT vec_id,
           |  $encCols
           |  FROM dl GROUP BY vec_id),
           |qt AS (SELECT vec_id AS query_id,
           |  $qtCols
           |  FROM dl WHERE vec_id % 100 = 0 GROUP BY 1),
           |s AS (SELECT query_id, e.vec_id AS corpus_id,
           |  round(dt0[c0] + dt1[c1] + dt2[c2] + dt3[c3], 6) AS adist
           |  FROM qt, enc e WHERE query_id <> e.vec_id),
           |shortl AS (SELECT query_id, corpus_id FROM (
           |  SELECT query_id, corpus_id, ROW_NUMBER() OVER (
           |    PARTITION BY query_id ORDER BY adist ASC, corpus_id) AS rnk
           |  FROM s) WHERE rnk <= 50),
           |ex AS (SELECT sl.query_id, sl.corpus_id,
           |  ${cos("qe.embedding", "ce.embedding")} AS score
           |  FROM shortl sl
           |    JOIN embeddings qe ON qe.vec_id = sl.query_id
           |    JOIN embeddings ce ON ce.vec_id = sl.corpus_id),
           |r AS (SELECT query_id, corpus_id, score,
           |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY score DESC, corpus_id) AS BIGINT) AS rnk FROM ex)
           |SELECT query_id, corpus_id, score, rnk FROM r
           |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
      }),

    // ----- X3 trained PQ: one Lloyd iteration over the codebooks -----------
    // pqTrain(iters=1) refines the MD5 seed codebooks on the corpus
    // (decimal-exact per-(subspace, codeword, component) means), then the
    // same ADC top-k runs under the trained books. The oracle replays
    // assignment → means → re-encode → ADC end to end.
    "q62_pq_trained" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val trained = Similarity.pqTrain(emb, "vec_id", "embedding",
          Similarity.pqCodebooks(), iters = 1)
        Similarity.pqTopK(emb.filter(col("vec_id") % 100 === 0), emb,
          "vec_id", "embedding", k = 5, trained)
          .withColumnRenamed("rank", "rnk")
          .orderBy("query_id", "rnk")
      },
      Some {
        val encCols = (0 until 4).map(mi =>
          s"any_value(CASE WHEN m = $mi THEN" +
            s" list_position(dists, list_min(dists)) END) AS c$mi")
          .mkString(",\n           |  ")
        val enc2Cols = (0 until 4).map(mi =>
          s"any_value(CASE WHEN m = $mi THEN" +
            s" list_position(dists, list_min(dists)) END) AS c$mi")
          .mkString(",\n           |  ")
        val qtCols = (0 until 4).map(mi =>
          s"any_value(CASE WHEN m = $mi THEN dists END) AS dt$mi")
          .mkString(",\n           |  ")
        val codesUnion = (0 until 4).map(mi =>
          s"SELECT vec_id, $mi AS mi, c$mi AS code FROM enc")
          .mkString("\n           |  UNION ALL ")
        s"""WITH cbraw AS (SELECT m.m, k.k, j.j,
           |  CAST(CAST(('0x' || substr(md5('pq_' || m.m || '_' || k.k
           |    || '_' || j.j), 1, 8)) AS UBIGINT) AS DOUBLE)
           |    / 4294967296.0 - 0.5 AS c
           |  FROM (SELECT unnest(generate_series(0, 3)) AS m) m,
           |       (SELECT unnest(generate_series(0, 15)) AS k) k,
           |       (SELECT unnest(generate_series(1, 16)) AS j) j),
           |cb AS (SELECT m, k, list(c ORDER BY j) AS cv
           |  FROM cbraw GROUP BY 1, 2),
           |d AS (SELECT e.vec_id, cb.m, cb.k,
           |  list_sum([(e.embedding[cb.m*16+j]::DOUBLE - cv[j])
           |    * (e.embedding[cb.m*16+j]::DOUBLE - cv[j])
           |    for j in generate_series(1, 16)]) AS dist
           |  FROM embeddings e, cb),
           |dl AS (SELECT vec_id, m, list(dist ORDER BY k) AS dists
           |  FROM d GROUP BY 1, 2),
           |enc AS (SELECT vec_id,
           |  $encCols
           |  FROM dl GROUP BY vec_id),
           |codes AS ($codesUnion),
           |comp AS (SELECT vec_id, (j-1) // 16 AS mi,
           |  ((j-1) % 16) + 1 AS jj, embedding[j]::DOUBLE AS x
           |  FROM embeddings, unnest(generate_series(1, 64)) AS u(j)),
           |mn AS (SELECT c.mi, c.code, comp.jj,
           |  CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE)
           |    / CAST(COUNT(*) AS BIGINT)::DOUBLE AS mu
           |  FROM comp JOIN codes c
           |    ON comp.vec_id = c.vec_id AND comp.mi = c.mi
           |  GROUP BY 1, 2, 3),
           |cb2 AS (SELECT cbraw.m, cbraw.k,
           |  list(COALESCE(mn.mu, cbraw.c) ORDER BY cbraw.j) AS cv
           |  FROM cbraw LEFT JOIN mn ON mn.mi = cbraw.m
           |    AND mn.code = cbraw.k + 1 AND mn.jj = cbraw.j
           |  GROUP BY 1, 2),
           |d2 AS (SELECT e.vec_id, cb2.m, cb2.k,
           |  list_sum([(e.embedding[cb2.m*16+j]::DOUBLE - cv[j])
           |    * (e.embedding[cb2.m*16+j]::DOUBLE - cv[j])
           |    for j in generate_series(1, 16)]) AS dist
           |  FROM embeddings e, cb2),
           |dl2 AS (SELECT vec_id, m, list(dist ORDER BY k) AS dists
           |  FROM d2 GROUP BY 1, 2),
           |enc2 AS (SELECT vec_id,
           |  $enc2Cols
           |  FROM dl2 GROUP BY vec_id),
           |qt2 AS (SELECT vec_id AS query_id,
           |  $qtCols
           |  FROM dl2 WHERE vec_id % 100 = 0 GROUP BY 1),
           |s AS (SELECT query_id, e.vec_id AS corpus_id,
           |  round(dt0[c0] + dt1[c1] + dt2[c2] + dt3[c3], 6) AS adist
           |  FROM qt2, enc2 e WHERE query_id <> e.vec_id),
           |r AS (SELECT query_id, corpus_id, adist,
           |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY adist ASC, corpus_id) AS BIGINT) AS rnk FROM s)
           |SELECT query_id, corpus_id, adist, rnk FROM r
           |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
      }),

    // ----- X3 IVF-PQ: cluster pruning × code compression -------------------
    // The full approximate-index composition: queries fan to their 2
    // nearest centroids, candidates are same-cluster pairs, scores are
    // PQ/ADC table lookups. Oracle = q57's assignment CTEs + q59's
    // codebook CTEs, joined.
    "q60_ivf_pq" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfPqTopK(emb.filter(col("vec_id") % 100 === 0), emb,
          emb.filter(col("vec_id") < 4), "vec_id", "embedding", k = 5,
          "vec_id", "embedding", Similarity.pqCodebooks(), probe = 2)
          .withColumnRenamed("rank", "rnk")
          .orderBy("query_id", "rnk")
      },
      Some {
        def cos(a: String, b: String) =
          s"""round(
             |    list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($a))]) /
             |    (sqrt(list_sum([$a[i]::DOUBLE * $a[i]::DOUBLE
             |      for i in generate_series(1, len($a))])) *
             |     sqrt(list_sum([$b[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($b))]))), 6)""".stripMargin
        val encCols = (0 until 4).map(mi =>
          s"any_value(CASE WHEN m = $mi THEN" +
            s" list_position(dists, list_min(dists)) END) AS c$mi")
          .mkString(",\n           |  ")
        val qtCols = (0 until 4).map(mi =>
          s"any_value(CASE WHEN m = $mi THEN dists END) AS dt$mi")
          .mkString(",\n           |  ")
        s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cv
           |  FROM embeddings WHERE vec_id < 4),
           |sc AS (SELECT e.vec_id, e.embedding, cen.cid,
           |  ${cos("e.embedding", "cen.cv")} AS cs
           |  FROM embeddings e, cen),
           |rnk0 AS (SELECT vec_id, cid, ROW_NUMBER() OVER (
           |    PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn FROM sc),
           |asgn AS (SELECT vec_id, cid AS cluster FROM rnk0 WHERE rn = 1),
           |q AS (SELECT vec_id AS query_id, cid AS cluster FROM rnk0
           |  WHERE rn <= 2 AND vec_id % 100 = 0),
           |cbraw AS (SELECT m.m, k.k, j.j,
           |  CAST(CAST(('0x' || substr(md5('pq_' || m.m || '_' || k.k
           |    || '_' || j.j), 1, 8)) AS UBIGINT) AS DOUBLE)
           |    / 4294967296.0 - 0.5 AS c
           |  FROM (SELECT unnest(generate_series(0, 3)) AS m) m,
           |       (SELECT unnest(generate_series(0, 15)) AS k) k,
           |       (SELECT unnest(generate_series(1, 16)) AS j) j),
           |cb AS (SELECT m, k, list(c ORDER BY j) AS cv
           |  FROM cbraw GROUP BY 1, 2),
           |d AS (SELECT e.vec_id, cb.m, cb.k,
           |  list_sum([(e.embedding[cb.m*16+j]::DOUBLE - cv[j])
           |    * (e.embedding[cb.m*16+j]::DOUBLE - cv[j])
           |    for j in generate_series(1, 16)]) AS dist
           |  FROM embeddings e, cb),
           |dl AS (SELECT vec_id, m, list(dist ORDER BY k) AS dists
           |  FROM d GROUP BY 1, 2),
           |enc AS (SELECT vec_id,
           |  $encCols
           |  FROM dl GROUP BY vec_id),
           |qt AS (SELECT vec_id AS query_id,
           |  $qtCols
           |  FROM dl WHERE vec_id % 100 = 0 GROUP BY 1),
           |s AS (SELECT q.query_id, a.vec_id AS corpus_id,
           |  round(dt0[c0] + dt1[c1] + dt2[c2] + dt3[c3], 6) AS adist
           |  FROM q JOIN asgn a USING (cluster)
           |    JOIN qt ON qt.query_id = q.query_id
           |    JOIN enc e ON e.vec_id = a.vec_id
           |  WHERE q.query_id <> a.vec_id),
           |r AS (SELECT query_id, corpus_id, adist,
           |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY adist ASC, corpus_id) AS BIGINT) AS rnk FROM s)
           |SELECT query_id, corpus_id, adist, rnk FROM r
           |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
      }),

    // ----- X3 the COMPLETE serving chain as one entry ----------------------
    // IVF cluster pruning → PQ/ADC shortlist (50) → exact cosine re-rank:
    // the three approximate-index stages composed end to end, the
    // architecture a production vector index actually serves. Oracle =
    // q60's IVF+ADC CTEs cut at rnk <= 50, finished with q61's exact
    // re-rank tail.
    "q64_ivfpq_rerank" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfPqTopKReranked(emb.filter(col("vec_id") % 100 === 0),
          emb, emb.filter(col("vec_id") < 4), "vec_id", "embedding", k = 5,
          "vec_id", "embedding", Similarity.pqCodebooks(), probe = 2,
          shortlist = 50)
          .withColumnRenamed("rank", "rnk")
          .orderBy("query_id", "rnk")
      },
      Some {
        def cos(a: String, b: String) =
          s"""round(
             |    list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($a))]) /
             |    (sqrt(list_sum([$a[i]::DOUBLE * $a[i]::DOUBLE
             |      for i in generate_series(1, len($a))])) *
             |     sqrt(list_sum([$b[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($b))]))), 6)""".stripMargin
        val encCols = (0 until 4).map(mi =>
          s"any_value(CASE WHEN m = $mi THEN" +
            s" list_position(dists, list_min(dists)) END) AS c$mi")
          .mkString(",\n           |  ")
        val qtCols = (0 until 4).map(mi =>
          s"any_value(CASE WHEN m = $mi THEN dists END) AS dt$mi")
          .mkString(",\n           |  ")
        s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cv
           |  FROM embeddings WHERE vec_id < 4),
           |sc AS (SELECT e.vec_id, e.embedding, cen.cid,
           |  ${cos("e.embedding", "cen.cv")} AS cs
           |  FROM embeddings e, cen),
           |rnk0 AS (SELECT vec_id, cid, ROW_NUMBER() OVER (
           |    PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn FROM sc),
           |asgn AS (SELECT vec_id, cid AS cluster FROM rnk0 WHERE rn = 1),
           |q AS (SELECT vec_id AS query_id, cid AS cluster FROM rnk0
           |  WHERE rn <= 2 AND vec_id % 100 = 0),
           |cbraw AS (SELECT m.m, k.k, j.j,
           |  CAST(CAST(('0x' || substr(md5('pq_' || m.m || '_' || k.k
           |    || '_' || j.j), 1, 8)) AS UBIGINT) AS DOUBLE)
           |    / 4294967296.0 - 0.5 AS c
           |  FROM (SELECT unnest(generate_series(0, 3)) AS m) m,
           |       (SELECT unnest(generate_series(0, 15)) AS k) k,
           |       (SELECT unnest(generate_series(1, 16)) AS j) j),
           |cb AS (SELECT m, k, list(c ORDER BY j) AS cv
           |  FROM cbraw GROUP BY 1, 2),
           |d AS (SELECT e.vec_id, cb.m, cb.k,
           |  list_sum([(e.embedding[cb.m*16+j]::DOUBLE - cv[j])
           |    * (e.embedding[cb.m*16+j]::DOUBLE - cv[j])
           |    for j in generate_series(1, 16)]) AS dist
           |  FROM embeddings e, cb),
           |dl AS (SELECT vec_id, m, list(dist ORDER BY k) AS dists
           |  FROM d GROUP BY 1, 2),
           |enc AS (SELECT vec_id,
           |  $encCols
           |  FROM dl GROUP BY vec_id),
           |qt AS (SELECT vec_id AS query_id,
           |  $qtCols
           |  FROM dl WHERE vec_id % 100 = 0 GROUP BY 1),
           |s AS (SELECT q.query_id, a.vec_id AS corpus_id,
           |  round(dt0[c0] + dt1[c1] + dt2[c2] + dt3[c3], 6) AS adist
           |  FROM q JOIN asgn a USING (cluster)
           |    JOIN qt ON qt.query_id = q.query_id
           |    JOIN enc e ON e.vec_id = a.vec_id
           |  WHERE q.query_id <> a.vec_id),
           |shortl AS (SELECT query_id, corpus_id FROM (
           |  SELECT query_id, corpus_id, ROW_NUMBER() OVER (
           |    PARTITION BY query_id ORDER BY adist ASC, corpus_id) AS rnk
           |  FROM s) WHERE rnk <= 50),
           |ex AS (SELECT sl.query_id, sl.corpus_id,
           |  ${cos("qe.embedding", "ce.embedding")} AS score
           |  FROM shortl sl
           |    JOIN embeddings qe ON qe.vec_id = sl.query_id
           |    JOIN embeddings ce ON ce.vec_id = sl.corpus_id),
           |r AS (SELECT query_id, corpus_id, score,
           |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY score DESC, corpus_id) AS BIGINT) AS rnk FROM ex)
           |SELECT query_id, corpus_id, score, rnk FROM r
           |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
      }),

    // ----- X4 multimodal ---------------------------------------------------

    "q40_multimodal_meta" -> Entry(
      (s, dir) => Multimodal.payloadMeta(
        Multimodal.withPayload(t(s, dir, "documents"), "doc_id", "text"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |CASE WHEN length(text) % 2 = 0 THEN 'image' ELSE 'audio' END
             |  AS kind,
             |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |md5(text) AS digest
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ----- as-of join: for each error event, the user's most recent click.
    // Spark has no native as-of join; AsOfJoin composes it from a union +
    // running window (one shuffle). DuckDB's native ASOF JOIN is the oracle.
    "q52_asof_join" -> Entry(
      (s, dir) => {
        val ev = Queries.events(s, dir)
        // micros, not nanos: DuckDB's parquet reader truncates
        // TIMESTAMP(NANOS) to microsecond TIMESTAMP, so the oracle can
        // only see µs — both sides compare/subtract at µs precision
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000").as("t"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            expr("ts div 1000").as("ct"))
        AsOfJoin.asofJoin(errors, clicks, "user_id", "t", "ct", "click_id")
          .select(col("left.event_id").as("event_id"),
            col("left.user_id").as("user_id"),
            col("right.click_id").as("click_id"),
            (col("left.t") - col("right.ct")).as("gap_us"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t
             |  FROM events WHERE event_type = 'error'),
             |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS ct
             |  FROM events WHERE event_type = 'click')
             |SELECT e.event_id, e.user_id, c.click_id, e.t - c.ct AS gap_us
             |FROM e ASOF JOIN c ON e.user_id = c.user_id AND e.t >= c.ct
             |ORDER BY e.event_id""".stripMargin)),

    // ----- range join: orders landing in each ship date's 7-day lookback.
    // Catalyst plans `p >= lo AND p < hi` as a nested loop; RangeJoin
    // rewrites containment as an equi-join on a bucketized day axis
    // (each 7-day interval explodes to at most 2 width-7 buckets).
    // DuckDB's native inequality join is the oracle.
    "q89_range_join" -> Entry(
      (s, dir) => {
        def day(c: org.apache.spark.sql.Column) =
          datediff(c.cast("date"), lit("1970-01-01").cast("date"))
            .cast("long")
        val ship = Queries.t(s, dir, "lineitem")
          .select(day(col("l_shipdate")).as("ship_day")).distinct()
          .select(col("ship_day"), (col("ship_day") - 7).as("lo"),
            col("ship_day").as("hi"))
        val ord = Queries.t(s, dir, "orders")
          .select(day(col("o_orderdate")).as("od"))
        RangeJoin.pointInRange(ord, ship, "od", "lo", "hi", bucketWidth = 7)
          .groupBy(col("range.ship_day").as("ship_day"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("ship_day")
      },
      Some("""WITH sd AS (SELECT DISTINCT CAST(CAST(l_shipdate AS DATE)
             |    - DATE '1970-01-01' AS BIGINT) AS ship_day FROM lineitem),
             |od AS (SELECT CAST(CAST(o_orderdate AS DATE)
             |    - DATE '1970-01-01' AS BIGINT) AS od FROM orders)
             |SELECT sd.ship_day, count(*) AS n_orders FROM sd JOIN od
             |ON od.od >= sd.ship_day - 7 AND od.od < sd.ship_day
             |GROUP BY ship_day ORDER BY ship_day""".stripMargin)),

    // ----- X5 lexicon quality classifier -----------------------------------
    // fastText-style shallow linear classifier: sigmoid(bias + mean token
    // weight) under a driver-known lexicon. One map-only corpus pass (the
    // native one-probe-per-token LexiconScore expression); the oracle
    // replays the linear layer as an in-order list_sum over a CASE-mapped
    // token list, so both engines fold the same doubles in the same order.
    "q90_lexicon_quality" -> Entry(
      (s, dir) => {
        val d = Queries.t(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        TextAnalysis.withLexiconQuality(d, "text", QualityLex, bias = -0.2)
          .select(col("doc_id"), round(col("quality_p"), 6).as("quality_p"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, $TOKS AS w FROM documents)
             |SELECT doc_id, round(1.0 / (1.0 + exp(-(-0.2 +
             |  list_sum(list_transform(w, t -> $lexCaseSql)) / len(w)))), 6)
             |  AS quality_p
             |FROM tk ORDER BY doc_id""".stripMargin)),

    // ----- X3 int8 scalar quantization -------------------------------------
    // Per-dimension global [lo, hi] affine mapping to 256 levels — 4×
    // smaller than float32 before ANN serving. Floor-based level
    // assignment: the same IEEE sub/mul/div tree in the same order on
    // both engines, no rounding-tie ambiguity. Stats collapse to one
    // broadcast row; the corpus never re-shuffles (ScaleSpec-pinned).
    // Output is unpivoted to fixed-width (vec_id, pos, code) rows: the
    // driver's differ cannot canonicalize array cells (the q74 lesson),
    // and the oracle gets SHORTER (unnest instead of a comprehension).
    "q91_int8_quant" -> Entry(
      (s, dir) => {
        val emb = Queries.t(s, dir, "embeddings")
        Quantize.int8Encode(emb, "vec_id", "embedding",
            Quantize.int8Stats(emb, "embedding"))
          .select(col("vec_id"), posexplode(col("codes")).as(Seq("pos", "code")))
          .orderBy("vec_id", "pos")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |x AS (SELECT vec_id, unnest(v) AS val,
             |  generate_subscripts(v, 1) AS i FROM e),
             |st AS (SELECT i, min(val) AS lo, max(val) AS hi FROM x
             |  GROUP BY i)
             |SELECT x.vec_id, CAST(x.i - 1 AS INT) AS pos,
             |  CAST(CASE WHEN st.hi = st.lo THEN 0.0
             |    ELSE greatest(0.0, least(255.0, floor((x.val - st.lo)
             |      * 256.0 / (st.hi - st.lo)))) END - 128.0 AS INT) AS code
             |FROM x JOIN st USING (i) ORDER BY vec_id, pos""".stripMargin)),

    // ----- X3 random-projection dimensionality reduction -------------------
    // Johnson–Lindenstrauss-style cheap projection to 8 dims using the
    // deterministic seeded plane family the LSH bucketer signs; the
    // oracle carries the SAME plane constants as double literals
    // (shortest-repr printing round-trips exactly) and sums products in
    // index order. Unpivoted to (vec_id, plane, value) rows for the
    // driver's differ (see q91).
    "q92_random_projection" -> Entry(
      (s, dir) => {
        val planes = Similarity.planeVectors(8, 64)
        Quantize.randomProject(
            Queries.t(s, dir, "embeddings"), "embedding", planes)
          .select(col("vec_id"),
            posexplode(col("proj")).as(Seq("plane", "value")))
          .select(col("vec_id"), col("plane"),
            round(col("value"), 6).as("value"))
          .orderBy("vec_id", "plane")
      },
      Some {
        val planes = Similarity.planeVectors(8, 64)
        val lits = planes.map(_.mkString("[", ", ", "]"))
          .mkString("[", ", ", "]")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           |  FROM embeddings),
           |p AS (SELECT $lits AS planes)
           |SELECT vec_id, CAST(j - 1 AS INT) AS plane,
           |  round(list_sum([v[i] * planes[j][i]
           |    FOR i IN generate_series(1, len(v))]), 6) AS value
           |FROM e, p, generate_series(1, ${planes.length}) AS g(j)
           |ORDER BY vec_id, plane""".stripMargin
      }),

    // ----- X3 compressed-corpus serving ------------------------------------
    // The compression payoff end-to-end: cosine top-k where the corpus
    // side is the 4×-smaller int8 codes table, dequantized on the fly.
    // Scores stay comparable with q30 (same round-6 / tiebreak shape),
    // so recallAtK measures the quantization cost directly. The oracle
    // re-derives codes exactly (floor arithmetic, q91) and ranks over
    // the same dequantized doubles.
    "q93_int8_topk" -> Entry(
      (s, dir) => {
        val emb = Queries.t(s, dir, "embeddings")
        val stats = Quantize.int8Stats(emb, "embedding")
        val codes = Quantize.int8Encode(emb, "vec_id", "embedding", stats)
        Quantize.int8TopK(emb.filter(col("vec_id") < 5), "vec_id",
            "embedding", codes, "vec_id", stats, k = 10)
          .withColumnRenamed("rank", "rnk")
          .orderBy("query_id", "rnk")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |x AS (SELECT unnest(v) AS val, generate_subscripts(v, 1) AS i
             |  FROM e),
             |st AS (SELECT i, min(val) AS lo, max(val) AS hi FROM x
             |  GROUP BY i),
             |a AS (SELECT list(lo ORDER BY i) AS los,
             |  list(hi ORDER BY i) AS his FROM st),
             |cd AS (SELECT vec_id, [CAST(CASE WHEN a.his[i] = a.los[i]
             |    THEN 0.0 ELSE greatest(0.0, least(255.0,
             |      floor((v[i] - a.los[i]) * 256.0
             |        / (a.his[i] - a.los[i])))) END - 128.0 AS INT)
             |  FOR i IN generate_series(1, len(v))] AS c FROM e, a),
             |rec AS (SELECT vec_id AS corpus_id,
             |  [a.los[i] + (c[i] + 128.5) * (a.his[i] - a.los[i]) / 256.0
             |    FOR i IN generate_series(1, len(c))] AS cv FROM cd, a),
             |q AS (SELECT vec_id AS query_id,
             |  CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings WHERE vec_id < 5),
             |s AS (SELECT query_id, corpus_id,
             |  round(list_sum([qv[i] * cv[i]
             |      FOR i IN generate_series(1, len(qv))]) /
             |    (sqrt(list_sum([qv[i] * qv[i]
             |      FOR i IN generate_series(1, len(qv))])) *
             |     sqrt(list_sum([cv[i] * cv[i]
             |      FOR i IN generate_series(1, len(cv))]))), 6) AS score
             |  FROM q, rec WHERE query_id <> corpus_id),
             |r AS (SELECT query_id, corpus_id, score,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             |    ORDER BY score DESC, corpus_id) AS BIGINT) AS rnk FROM s)
             |SELECT query_id, corpus_id, score, rnk FROM r
             |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin)),

    // ----- X5 temperature mixture ------------------------------------------
    // The mT5 sampling rule: keep probability ∝ n_source^(α-1), scaled
    // to a document budget — flattens head-source dominance. α = 0.5
    // routes through IEEE-exact sqrt and the Z fold is sorted-source
    // ordered, so the realized per-source rates are bit-identical in
    // both engines.
    "q94_temperature_mixture" -> Entry(
      (s, dir) => Sampling.temperatureMixture(
          Queries.t(s, dir, "documents").select(col("doc_id"),
            col("source")),
          col("doc_id"), "source", targetDocs = 300, alpha = 0.5,
          salt = "tmix")
        .orderBy("doc_id"),
      Some("""WITH c AS (SELECT source, count(*) AS n FROM documents
             |  GROUP BY source),
             |z AS (SELECT list_sum(list(sqrt(n) ORDER BY source)) AS z
             |  FROM c),
             |r AS (SELECT source, CAST(LEAST(10000.0,
             |    round(300 * 10000.0 * sqrt(n) / (z.z * n))) AS BIGINT)
             |  AS bp FROM c, z)
             |SELECT d.doc_id, d.source FROM documents d
             |JOIN r ON d.source = r.source
             |WHERE CAST(('0x' || substr(md5('tmix|' ||
             |    CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 10000
             |  < GREATEST(0, LEAST(10000, r.bp))
             |ORDER BY d.doc_id""".stripMargin)),

    // ----- X3 int8 shortlist + exact re-rank -------------------------------
    // The two-stage serving shape at the int8 compression point: codes
    // produce the shortlist (q93's plan), the wide float corpus is
    // touched only for |Q|·shortlist candidate pairs. Oracle = q93's
    // CTEs cut at rnk <= 20, finished with the exact-cosine re-rank
    // tail over float vectors.
    "q95_int8_rerank" -> Entry(
      (s, dir) => {
        val emb = Queries.t(s, dir, "embeddings")
        val stats = Quantize.int8Stats(emb, "embedding")
        val codes = Quantize.int8Encode(emb, "vec_id", "embedding", stats)
        Quantize.int8TopKReranked(emb.filter(col("vec_id") < 5), "vec_id",
            "embedding", codes, "vec_id", stats, corpus = emb, k = 10,
            shortlist = 20)
          .withColumnRenamed("rank", "rnk")
          .orderBy("query_id", "rnk")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |x AS (SELECT unnest(v) AS val, generate_subscripts(v, 1) AS i
             |  FROM e),
             |st AS (SELECT i, min(val) AS lo, max(val) AS hi FROM x
             |  GROUP BY i),
             |a AS (SELECT list(lo ORDER BY i) AS los,
             |  list(hi ORDER BY i) AS his FROM st),
             |cd AS (SELECT vec_id, [CAST(CASE WHEN a.his[i] = a.los[i]
             |    THEN 0.0 ELSE greatest(0.0, least(255.0,
             |      floor((v[i] - a.los[i]) * 256.0
             |        / (a.his[i] - a.los[i])))) END - 128.0 AS INT)
             |  FOR i IN generate_series(1, len(v))] AS c FROM e, a),
             |rec AS (SELECT vec_id AS corpus_id,
             |  [a.los[i] + (c[i] + 128.5) * (a.his[i] - a.los[i]) / 256.0
             |    FOR i IN generate_series(1, len(c))] AS cv FROM cd, a),
             |q AS (SELECT vec_id AS query_id,
             |  CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings WHERE vec_id < 5),
             |s AS (SELECT query_id, corpus_id,
             |  round(list_sum([qv[i] * cv[i]
             |      FOR i IN generate_series(1, len(qv))]) /
             |    (sqrt(list_sum([qv[i] * qv[i]
             |      FOR i IN generate_series(1, len(qv))])) *
             |     sqrt(list_sum([cv[i] * cv[i]
             |      FOR i IN generate_series(1, len(cv))]))), 6) AS score
             |  FROM q, rec WHERE query_id <> corpus_id),
             |r AS (SELECT query_id, corpus_id,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             |    ORDER BY score DESC, corpus_id) AS BIGINT) AS rnk FROM s),
             |cand AS (SELECT query_id, corpus_id FROM r WHERE rnk <= 20),
             |rr AS (SELECT cand.query_id, cand.corpus_id,
             |  round(list_sum([qe.v[i] * ce.v[i]
             |      FOR i IN generate_series(1, len(qe.v))]) /
             |    (sqrt(list_sum([qe.v[i] * qe.v[i]
             |      FOR i IN generate_series(1, len(qe.v))])) *
             |     sqrt(list_sum([ce.v[i] * ce.v[i]
             |      FOR i IN generate_series(1, len(ce.v))]))), 6) AS score
             |  FROM cand JOIN e qe ON qe.vec_id = cand.query_id
             |  JOIN e ce ON ce.vec_id = cand.corpus_id),
             |r2 AS (SELECT query_id, corpus_id, score,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             |    ORDER BY score DESC, corpus_id) AS BIGINT) AS rnk FROM rr)
             |SELECT query_id, corpus_id, score, rnk FROM r2
             |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin)),

    // Codec-free byte-profile triage pass (deterministic byte arithmetic).
    // The profile outputs are pure byte arithmetic over encode(text), so the
    // oracle replays them in SQL: byte i of the payload is read out of the
    // hex rendering ('0x' || substr(hex(blob), 2i-1, 2)), widths/heights
    // are modular arithmetic on the byte count.
    "q41_multimodal_decode" -> Entry(
      (s, dir) => {
        import s.implicits._
        val media = Multimodal
          .withPayload(t(s, dir, "documents"), "doc_id", "text")
          .as[Multimodal.MediaRecord]
        Multimodal.byteProfile(media).toDF().orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id,
             |  CASE WHEN length(text) % 2 = 0 THEN 'image' ELSE 'audio' END
             |    AS kind,
             |  hex(encode(text)) AS h, octet_length(encode(text)) AS n
             |  FROM documents)
             |SELECT doc_id, kind, CAST(n AS BIGINT) AS n_bytes,
             |  CAST(16 + n % 64 AS INT) AS width,
             |  CAST(16 + (n // 64) % 64 AS INT) AS height,
             |  CASE WHEN n = 0 THEN 0.0 ELSE
             |    CAST(list_sum([('0x' || substr(h, 2*i-1, 2))::INT
             |      for i in generate_series(1, n)]) AS DOUBLE)
             |    / CAST(n AS DOUBLE) END AS mean_byte
             |FROM b ORDER BY doc_id""".stripMargin)),

    // ----- X2 duplicate clustering (transitive closure of near-dup pairs) --
    // LSH pairs only relate docs pairwise; duplication is transitive. The
    // oracle computes the same components as a recursive reachability
    // closure — tractable because the pair graph is tiny relative to the
    // corpus (which is also why the Spark iteration is cheap).

    "q54_dup_clusters" -> Entry(
      (s, dir) => {
        val pairs = Dedup.minhashCandidates(nearDupDocs(s, dir),
          "doc_id", "text", k = 8, rowsPerBand = 2, shingleN = 3)
        Connected.components(pairs, "doc_a", "doc_b")
          .select(col("id").as("doc_id"), col("comp").as("cluster"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $NearDupDocsSql,
              |$MinhashPairsSql,
              |e AS (SELECT doc_a AS eu, doc_b AS ev FROM pairs
              |  UNION SELECT doc_b, doc_a FROM pairs),
              |reach(id, r) AS (
              |  SELECT eu, eu FROM e
              |  UNION
              |  SELECT reach.id, e.ev FROM reach JOIN e ON e.eu = reach.r)
              |SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster
              |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin)),

    // ----- X5 benchmark decontamination ------------------------------------
    // Docs with doc_id % 97 = 0 stand in for the eval set; their own rows
    // score 1.0 by construction, everything else measures natural 5-gram
    // overlap with them. The benchmark side broadcasts (see Decontaminate
    // scaladoc); the only corpus shuffle is the per-doc count.

    "q65_decontaminate" -> Entry(
      (s, dir) => {
        val docs = docsFan(s, dir)
        Decontaminate.overlap(docs, "doc_id", "text",
            docs.filter(col("doc_id") % 97 === 0), "text",
            shingleN = 5, flagAt = 0.5)
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $TOKS AS w FROM documents),
              |shs AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 5 THEN
              |    [array_to_string(w[i:i+4], ' ')
              |     for i in generate_series(1, len(w)-4)] ELSE [] END) AS sh
              |  FROM toks),
              |bench AS (SELECT list(DISTINCT s) AS bs
              |  FROM (SELECT unnest(sh) AS s FROM shs WHERE doc_id % 97 = 0)),
              |m AS (SELECT doc_id, len(sh) AS n_sh,
              |    len(list_intersect(sh, bs)) AS n_hit FROM shs, bench)
              |SELECT doc_id, CAST(n_sh AS BIGINT) AS n_shingles,
              |  CAST(n_hit AS BIGINT) AS n_overlap,
              |  CASE WHEN n_sh = 0 THEN 0.0
              |    ELSE CAST(n_hit AS DOUBLE) / CAST(n_sh AS DOUBLE)
              |  END AS overlap_ratio,
              |  (CASE WHEN n_sh = 0 THEN 0.0
              |    ELSE CAST(n_hit AS DOUBLE) / CAST(n_sh AS DOUBLE)
              |  END) >= 0.5 AS contaminated
              |FROM m ORDER BY doc_id""".stripMargin)),

    // ----- X5 deterministic stratified sampling ----------------------------
    // Downsample the over-represented language (the corpus-mixing move):
    // en keeps 50%, de 25%, every other lang 10% — membership decided by
    // md5 of the doc's own id, so the sample is a pure scan-level filter
    // reproducible across engines, runs, and cluster sizes.

    "q66_stratified_sample" -> Entry(
      (s, dir) => Sampling.stratified(t(s, dir, "documents"),
          col("doc_id"), col("lang"),
          Map("en" -> 5000, "de" -> 2500), defaultBp = 1000)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE CAST(('0x' || substr(md5('sample|' ||
             |    CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 10000
             |  < CASE WHEN lang = 'en' THEN 5000
             |         WHEN lang = 'de' THEN 2500 ELSE 1000 END
             |ORDER BY doc_id""".stripMargin)),

    // ----- X5 corpus vocabulary --------------------------------------------

    "q67_vocab" -> Entry(
      (s, dir) => Vocab.vocabulary(docsFan(s, dir), "doc_id", "text",
          minDf = 25)
        .orderBy(col("tf_total").desc, col("term"))
        .limit(40),
      Some(s"""SELECT t AS term, COUNT(*) AS tf_total,
              |  COUNT(DISTINCT doc_id) AS df
              |FROM (SELECT doc_id, unnest($TOKS) AS t FROM documents)
              |GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 25
              |ORDER BY tf_total DESC, term LIMIT 40""".stripMargin)),

    // ----- X5 TF-IDF top terms ---------------------------------------------
    // linearIdf (n/df) keeps the score a chain of exactly-rounded IEEE
    // ops so both engines produce bit-identical doubles; the ranking it
    // induces is the same as log IDF's (both strictly decrease in df).

    "q68_tfidf" -> Entry(
      (s, dir) => Vocab.tfIdfTopTerms(docsFan(s, dir), "doc_id", "text",
          k = 3, idf = Vocab.linearIdf)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("term"), col("score"))
        .orderBy("doc_id", "rank"),
      Some(s"""WITH tok AS (SELECT doc_id, $TOKS AS w FROM documents),
              |dt AS (SELECT doc_id, len(w) AS doclen, unnest(w) AS term
              |  FROM tok),
              |cnts AS (SELECT doc_id, doclen, term, COUNT(*) AS cnt
              |  FROM dt GROUP BY 1, 2, 3),
              |tdf AS (SELECT term, COUNT(DISTINCT doc_id) AS df
              |  FROM cnts GROUP BY 1),
              |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
              |scored AS (SELECT doc_id, term,
              |    CAST(cnt AS DOUBLE) / CAST(doclen AS DOUBLE) *
              |      (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS score
              |  FROM cnts JOIN tdf USING (term), n),
              |rk AS (SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id
              |    ORDER BY score DESC, term) AS rank, term, score
              |  FROM scored)
              |SELECT doc_id, rank, term, score FROM rk
              |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // ----- X1 incremental dedup --------------------------------------------
    // The production shape: a new batch (the planted-dup corpus) dedups
    // against the accumulated seen-index (docs with doc_id % 3 = 0)
    // instead of re-deduping the world. Copies of seen docs carry the
    // same text, so they drop with their originals.

    "q71_incremental_dedup" -> Entry(
      (s, dir) => {
        val seen = docsFan(s, dir).filter(col("doc_id") % 3 === 0)
        Dedup.dedupAgainst(dupDocs(s, dir), "text", seen, "text")
          .select(col("doc_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $DupDocsSql,
              |seen AS (SELECT md5(regexp_replace(lower(trim(text)),
              |    '\\s+', ' ', 'g')) AS fp
              |  FROM documents WHERE doc_id % 3 = 0)
              |SELECT doc_id FROM docs
              |WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.fp =
              |  md5(regexp_replace(lower(trim(docs.text)), '\\s+', ' ', 'g')))
              |ORDER BY doc_id""".stripMargin)),

    // ----- X2 MinHash Jaccard estimation -----------------------------------
    // Similarity from signatures alone — no text access — scored on the
    // planted (original, truncated-copy) pairs. k=8 keeps the estimator
    // coarse (stderr ~0.35) but every component is engine-bit-identical,
    // so the estimates hash-match exactly.

    "q72_minhash_est" -> Entry(
      (s, dir) => {
        val k = 8
        val sigs = Dedup.minhashSignatures(nearDupDocs(s, dir),
          "doc_id", "text", k = k, shingleN = 3)
        val a = sigs.select(col("doc_id").as("doc_a") +:
          (0 until k).map(i => col(s"m$i").as(s"a$i")): _*)
        val b = sigs.select(col("doc_id").as("doc_b") +:
          (0 until k).map(i => col(s"m$i").as(s"b$i")): _*)
        a.join(b, col("doc_b") === col("doc_a") + 1000000)
          .select(col("doc_a"), col("doc_b"),
            Dedup.minhashEstimate(
              (0 until k).map(i => col(s"a$i")),
              (0 until k).map(i => col(s"b$i"))).as("jaccard_est"))
          .orderBy("doc_a")
      },
      Some {
        val agree = (0 until 8)
          .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH $NearDupDocsSql,
           |$MinhashPairsSql
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |  CAST($agree AS DOUBLE) / CAST(8 AS DOUBLE) AS jaccard_est
           |FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1000000
           |ORDER BY doc_a""".stripMargin
      }),

    // ----- X5 quantile-calibrated quality gate ----------------------------
    // Keep the top length quartile without hand-picking a threshold.
    // exact=true for the oracle (quantile interpolation lands on f=.25
    // over integer scores — bit-exact in both engines); production uses
    // the default percentile_approx sketch.

    "q73_quantile_gate" -> Entry(
      (s, dir) => {
        val scored = t(s, dir, "documents").select(col("doc_id"),
          col("lang"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        Pipelines.keepTopQuantile(scored, "n_tokens", 0.75, exact = true)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"), min("n_tokens").as("min_tokens"))
          .orderBy("lang")
      },
      Some(s"""WITH scored AS (SELECT doc_id, lang,
              |    CAST(len($TOKS) AS BIGINT) AS n_tokens FROM documents),
              |cut AS (SELECT quantile_cont(n_tokens, 0.75) AS c FROM scored)
              |SELECT lang, COUNT(*) AS n, MIN(n_tokens) AS min_tokens
              |FROM scored, cut WHERE CAST(n_tokens AS DOUBLE) >= c
              |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ----- X3 per-label embedding centroids --------------------------------

    // The catalog entry unpivots the array<float> centroid to fixed-width
    // (label, pos, mu, n_vectors) rows: the driver's pandas differ cannot
    // sort/factorize array cells, and the oracle's `m` CTE already computes
    // exactly this shape. The labelCentroids API itself still returns the
    // assembled array (partition-invariance spec unchanged).
    "q74_label_centroids" -> Entry(
      (s, dir) => Similarity.labelCentroids(
          t(s, dir, "embeddings"), "label", "embedding")
        .select(col("label"),
          posexplode(col("centroid")).as(Seq("pos", "mu")),
          col("n_vectors"))
        .select(col("label"), col("pos").cast("long").as("pos"),
          col("mu"), col("n_vectors"))
        .orderBy("label", "pos"),
      Some("""WITH comp AS (SELECT label, j, embedding[j] AS x
             |  FROM embeddings,
             |    unnest(generate_series(1, len(embedding))) AS u(j)),
             |m AS (SELECT label, j,
             |    CAST(list_reduce(list_sort(list(CAST(x AS DOUBLE))),
             |        (a, b) -> a + b)
             |      / CAST(COUNT(*) AS BIGINT)::DOUBLE AS REAL) AS mu,
             |    COUNT(*) AS n
             |  FROM comp GROUP BY 1, 2)
             |SELECT label, j - 1 AS pos, mu, n AS n_vectors
             |FROM m ORDER BY label, pos""".stripMargin)),

    // ----- X2 keep-best representative per duplicate cluster ---------------
    // q54 labels the near-dup clusters; this picks the member to KEEP —
    // longest copy wins (min id on ties) instead of arbitrary min-id.
    // Docs never paired keep themselves as singleton clusters.

    "q75_keep_best" -> Entry(
      (s, dir) => {
        val docs = nearDupDocs(s, dir)
        val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
          k = 8, rowsPerBand = 2, shingleN = 3)
        val clusters = Connected.components(pairs, "doc_a", "doc_b")
        Dedup.keepBest(
            docs.withColumn("n_tokens",
              TextAnalysis.tokenCount(col("text"))),
            "doc_id", "n_tokens", clusters, "id", "comp")
          .orderBy("cluster")
      },
      Some(s"""WITH RECURSIVE $NearDupDocsSql,
              |$MinhashPairsSql,
              |e AS (SELECT doc_a AS eu, doc_b AS ev FROM pairs
              |  UNION SELECT doc_b, doc_a FROM pairs),
              |reach(id, r) AS (
              |  SELECT eu, eu FROM e
              |  UNION
              |  SELECT reach.id, e.ev FROM reach JOIN e ON e.eu = reach.r),
              |comp AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
              |labeled AS (SELECT COALESCE(comp.cluster, d.doc_id) AS cluster,
              |    d.doc_id, CAST(len($TOKS) AS BIGINT) AS n_tokens
              |  FROM docs d LEFT JOIN comp ON comp.id = d.doc_id),
              |rk AS (SELECT cluster, doc_id, n_tokens,
              |    ROW_NUMBER() OVER (PARTITION BY cluster
              |      ORDER BY n_tokens DESC, doc_id) AS rn,
              |    COUNT(*) OVER (PARTITION BY cluster) AS cluster_size
              |  FROM labeled)
              |SELECT cluster, doc_id AS keep_id, n_tokens AS score,
              |  cluster_size
              |FROM rk WHERE rn = 1 ORDER BY cluster""".stripMargin)),

    // ----- X5 unigram LM quality score ("perplexity filter") ---------------
    // Mean log2 p(token) under the corpus's own unigram distribution.
    // round(6) absorbs engine libm log2 ulps (the q46 precedent); the
    // per-doc sum folds over the SORTED (term, cnt, tf) list so both
    // engines perform the identical IEEE addition sequence.

    "q76_unigram_logprob" -> Entry(
      (s, dir) => Vocab.unigramLogProb(docsFan(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH dt AS (SELECT doc_id, unnest($TOKS) AS term
              |  FROM documents),
              |cnts AS (SELECT doc_id, term, COUNT(*) AS cnt
              |  FROM dt GROUP BY 1, 2),
              |vocab AS (SELECT term, SUM(cnt) AS tf FROM cnts GROUP BY 1),
              |tot AS (SELECT CAST(SUM(tf) AS DOUBLE) AS n_total FROM vocab),
              |per AS (SELECT doc_id, n_total,
              |    list_sort(list(struct_pack(term := term, cnt := cnt,
              |      tf := tf))) AS xs,
              |    CAST(SUM(cnt) AS BIGINT) AS n_tokens
              |  FROM cnts JOIN vocab USING (term), tot
              |  GROUP BY doc_id, n_total)
              |SELECT doc_id, n_tokens,
              |  round(list_reduce(
              |    [CAST(x.cnt AS DOUBLE) *
              |       log2(CAST(x.tf AS DOUBLE) / n_total) for x in xs],
              |    (a, b) -> a + b) / CAST(n_tokens AS DOUBLE), 6)
              |    AS logprob
              |FROM per ORDER BY doc_id""".stripMargin)),

    // ----- X5 quality-weighted sampling ------------------------------------
    // Keep rate proportional to doc length (capped at 100%): the
    // quality-weighted resampling move, deterministic per doc id.

    "q77_weighted_sample" -> Entry(
      (s, dir) => Sampling.weighted(t(s, dir, "documents"),
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")) * lit(25))
        .select(col("doc_id"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id FROM documents
              |WHERE CAST(('0x' || substr(md5('sample|' ||
              |    CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 10000
              |  < GREATEST(0, LEAST(10000, len($TOKS) * 25))
              |ORDER BY doc_id""".stripMargin)),

    // ----- X2 cross-document repeated passages -----------------------------
    // The substring-dedup signal: 10-gram windows shared by ≥2 docs.
    // The planted-copy corpus guarantees repeats; fixed-width output per
    // passage keeps a million-doc boilerplate block as cheap as a pair.

    "q78_repeated_passages" -> Entry(
      (s, dir) => Dedup.repeatedPassages(dupDocs(s, dir),
          "doc_id", "text", n = 10, minDocs = 2)
        .orderBy("passage"),
      Some(s"""WITH $DupDocsSql,
              |toks AS (SELECT doc_id, $TOKS AS w FROM docs),
              |sh AS (SELECT DISTINCT doc_id,
              |    array_to_string(w[i:i+9], ' ') AS s
              |  FROM toks, unnest(CASE WHEN len(w) >= 10
              |    THEN generate_series(1, len(w)-9) ELSE [] END) AS u(i)),
              |g AS (SELECT s, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc,
              |    MAX(doc_id) AS last_doc
              |  FROM sh GROUP BY s HAVING COUNT(*) >= 2)
              |SELECT md5(s) AS passage, s AS passage_text, n_docs,
              |  first_doc, last_doc
              |FROM g ORDER BY passage""".stripMargin)),

    // ----- X-pipe full curation: gates → dedup → near-dup → decon ----------
    // q42's pipeline with benchmark decontamination as the final stage
    // (eval set = original docs with doc_id % 97 = 0, 5-gram overlap).

    "q79_curation_decon" -> Entry(
      // corpus pinned: curate references its input twice when a
      // benchmark is set (gate chain + the gate-independent decon
      // verdict over the RAW corpus) — unpinned, the planted-copy
      // union and its tokenize-and-slice replay per reference
      (s, dir) => graft.operators.Pipelines.curate(
          nearDupDocs(s, dir).pinned, "doc_id", "text",
          benchmark = Some(docsFan(s, dir)
            .filter(col("doc_id") % 97 === 0).select(col("text"))),
          deconShingleN = 5, deconFlagAt = 0.5)
        .orderBy("doc_id"),
      Some {
        val deconCtes =
          s""",bt AS (SELECT $TOKS AS w FROM documents WHERE doc_id % 97 = 0),
             |bench AS (SELECT list(DISTINCT s) AS bs FROM (
             |  SELECT array_to_string(w[i:i+4], ' ') AS s FROM bt,
             |    unnest(CASE WHEN len(w) >= 5
             |      THEN generate_series(1, len(w)-4) ELSE [] END) AS u(i))),
             |dsh AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 5 THEN
             |    [array_to_string(w[i:i+4], ' ')
             |     for i in generate_series(1, len(w)-4)] ELSE [] END) AS sh
             |  FROM (SELECT doc_id, $TOKS AS w FROM docs)),
             |contam AS (SELECT doc_id FROM dsh, bench
             |  WHERE len(sh) > 0 AND CAST(len(list_intersect(sh, bs)) AS
             |    DOUBLE) / CAST(len(sh) AS DOUBLE) >= 0.5)
             |SELECT""".stripMargin
        // splice: reuse q42's CTE chain verbatim, add the decon CTEs
        // before its final SELECT and the NOT-IN-contaminated predicate
        Q42Sql
          .replace("\nSELECT doc_id, pred,", deconCtes + " doc_id, pred,")
          .replace("WHERE doc_id NOT IN (SELECT doc_b FROM dropids)",
            "WHERE doc_id NOT IN (SELECT doc_b FROM dropids)\n" +
              "  AND doc_id NOT IN (SELECT doc_id FROM contam)")
      }),

    // ----- X5 profiling: fixed-width histogram -----------------------------
    // Distribution shape in one aggregation; 500-char bins over n_chars,
    // outliers clamped into the edge buckets. Integer-valued data with
    // power-of-two-friendly width keeps the bin arithmetic IEEE-identical
    // across engines.

    "q80_histogram" -> Entry(
      (s, dir) => graft.operators.Profiles.histogram(
          t(s, dir, "documents"), "n_chars", lo = 0.0, hi = 5000.0,
          bins = 10)
        .orderBy("bin"),
      Some("""SELECT bin, 0.0 + bin * 500.0 AS bin_lo,
             |  0.0 + (bin + 1) * 500.0 AS bin_hi, COUNT(*) AS n
             |FROM (SELECT CAST(LEAST(GREATEST(
             |    FLOOR((CAST(n_chars AS DOUBLE) - 0.0) / 500.0),
             |    0.0), 9.0) AS BIGINT) AS bin
             |  FROM documents WHERE n_chars IS NOT NULL)
             |GROUP BY bin ORDER BY bin""".stripMargin)),

    // ----- X5 profiling: key-skew heavy hitters ----------------------------
    // The pre-shuffle measurement behind the q32 salted path: which keys
    // dominate, and by how much. Exact fraction = long/long in double.

    "q81_key_skew" -> Entry(
      (s, dir) => graft.operators.Profiles.keySkew(
          events(s, dir), "user_id", k = 15), // events(): ts normalized to nanos
      Some("""WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key,
             |    COUNT(*) AS n FROM events GROUP BY 1),
             |t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM events)
             |SELECT key, n, CAST(n AS DOUBLE) / total AS fraction
             |FROM c, t ORDER BY n DESC, key LIMIT 15""".stripMargin)),

    // ----- X3 ANN recall diagnostic ----------------------------------------
    // recall@10 of the sign-LSH ANN (q31's exact configuration) against
    // brute-force truth (q30's), per query — the measurement that turns
    // probe/nPlanes/maxBucket tuning from guesswork into observation.
    // Membership-counted, not rank-agreement; queries whose bucket gated
    // every neighbor away surface at recall 0 instead of vanishing.

    "q82_ann_recall" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 5)
        Similarity.recallAtK(
            Similarity.annTopK(queries, emb, "vec_id", "embedding",
              k = 10, nPlanes = 8),
            Similarity.cosineTopK(queries, emb, "vec_id", "embedding",
              k = 10),
            k = 10)
          .orderBy("query_id")
      },
      Some {
        def cos(a: String, b: String) =
          s"""round(
             |    list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($a))]) /
             |    (sqrt(list_sum([$a[i]::DOUBLE * $a[i]::DOUBLE
             |      for i in generate_series(1, len($a))])) *
             |     sqrt(list_sum([$b[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($b))]))), 6)""".stripMargin
        s"""WITH pl AS (
           |  SELECT p.plane, j.j,
           |    CAST(CAST(('0x' || substr(md5(p.plane::VARCHAR || '_'
           |      || j.j::VARCHAR), 1, 8)) AS UBIGINT) AS DOUBLE)
           |      / 4294967296.0 - 0.5 AS r
           |  FROM (SELECT unnest(generate_series(0, 7)) AS plane) p,
           |       (SELECT unnest(generate_series(1, 64)) AS j) j),
           |comp AS (SELECT vec_id, j, embedding[j]::DOUBLE AS x
           |  FROM embeddings, unnest(generate_series(1, len(embedding)))
           |    AS u(j)),
           |dots AS (SELECT vec_id, plane, SUM(x * r) AS d
           |  FROM comp JOIN pl USING (j) GROUP BY 1, 2),
           |bkt AS (SELECT vec_id, CAST(SUM(CASE WHEN d > 0
           |    THEN (1::BIGINT << plane) ELSE 0 END) AS BIGINT) AS bucket
           |  FROM dots GROUP BY 1),
           |qb AS (SELECT b.vec_id AS query_id, e.embedding AS qv, b.bucket
           |  FROM bkt b JOIN embeddings e USING (vec_id)
           |  WHERE b.vec_id < 5),
           |cb AS (SELECT b.vec_id AS corpus_id, e.embedding AS cv, b.bucket
           |  FROM bkt b JOIN embeddings e USING (vec_id)),
           |sa AS (SELECT query_id, corpus_id, ${cos("qv", "cv")} AS score
           |  FROM qb JOIN cb USING (bucket) WHERE query_id <> corpus_id),
           |ra AS (SELECT query_id, corpus_id,
           |  ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY score DESC, corpus_id) AS rnk FROM sa),
           |a AS (SELECT query_id, corpus_id FROM ra WHERE rnk <= 10),
           |q AS (SELECT vec_id AS query_id, embedding AS qv
           |  FROM embeddings WHERE vec_id < 5),
           |c AS (SELECT vec_id AS corpus_id, embedding AS cv
           |  FROM embeddings),
           |se AS (SELECT query_id, corpus_id, ${cos("qv", "cv")} AS score
           |  FROM q, c WHERE query_id <> corpus_id),
           |re AS (SELECT query_id, corpus_id,
           |  ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY score DESC, corpus_id) AS rnk FROM se),
           |e AS (SELECT query_id, corpus_id FROM re WHERE rnk <= 10),
           |h AS (SELECT e.query_id, COUNT(*) AS n_hit
           |  FROM e JOIN a USING (query_id, corpus_id) GROUP BY 1),
           |tt AS (SELECT query_id, COUNT(*) AS n_exact FROM e GROUP BY 1)
           |SELECT tt.query_id, tt.n_exact, COALESCE(h.n_hit, 0) AS n_hit,
           |  COALESCE(h.n_hit, 0)::DOUBLE / tt.n_exact::DOUBLE AS recall
           |FROM tt LEFT JOIN h USING (query_id) ORDER BY query_id""".stripMargin
      }),

    // ----- X5 per-domain quota cap -----------------------------------------
    // Keep the 30 highest-quality (longest) docs per source — the
    // cap-per-host move that stops boilerplate farms from dominating a
    // crawl. Deterministic survivors: n_chars DESC, md5 hash tie-break.
    // ScaleSpec pins the WindowGroupLimit (map-side top-n per key before
    // the exchange).

    "q83_domain_cap" -> Entry(
      (s, dir) => Sampling.perKeyCap(t(s, dir, "documents"),
          col("source"), col("doc_id"), n = 30, score = col("n_chars"))
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id"),
      Some("""WITH rk AS (SELECT doc_id, source, n_chars,
             |    ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY n_chars DESC NULLS LAST,
             |        md5('cap|' || CAST(doc_id AS VARCHAR))) AS rn
             |  FROM documents)
             |SELECT doc_id, source, n_chars FROM rk
             |WHERE rn <= 30 ORDER BY doc_id""".stripMargin)),

    // ----- X5 corpus mixture -----------------------------------------------
    // Assemble a training mix: 30% of the "web" sources, 80% of the rest,
    // one reproducible plan with provenance tags. Each source's rate
    // filter sits on its own scan (no-exchange pin shared with q66's
    // sampler family); draws are decorrelated across sources by the
    // per-tag salt.

    "q84_corpus_mixture" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val web = docs.filter(col("source").isin("src0", "src1"))
        val other = docs.filter(!col("source").isin("src0", "src1"))
        Sampling.mixture(Seq(("web", web, 3000), ("other", other, 8000)),
            "doc_id")
          .select(col("doc_id"), col("lang"), col("source"),
            col("source_tag"))
          .orderBy("source_tag", "doc_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, lang, source, 'web' AS source_tag
             |  FROM documents WHERE source IN ('src0', 'src1')
             |    AND CAST(('0x' || substr(md5('mix|web|' ||
             |      CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
             |      % 10000 < 3000
             |  UNION ALL
             |  SELECT doc_id, lang, source, 'other' AS source_tag
             |  FROM documents WHERE source NOT IN ('src0', 'src1')
             |    AND CAST(('0x' || substr(md5('mix|other|' ||
             |      CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
             |      % 10000 < 8000)
             |SELECT doc_id, lang, source, source_tag FROM m
             |ORDER BY source_tag, doc_id""".stripMargin)),

    // ----- X2 incremental near-dup dedup -----------------------------------
    // The fuzzy member of the incremental family: a "new batch" of
    // planted last-3-tokens-dropped variants (which MUST band-collide
    // with their sources and drop) plus reversed-token docs (disjoint
    // shingles — fresh content that MUST survive) deduped against the
    // base corpus's SIGNATURE index (no text on the seen side).

    "q88_neardup_against" -> Entry(
      (s, dir) => {
        val base = docsFan(s, dir).select(col("doc_id"), col("text"))
        val seenSigs = Dedup.minhashSignatures(base, "doc_id", "text", 8)
        val w = TextAnalysis.tokens(col("text"))
        val variants = base.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            array_join(slice(w, lit(1), greatest(size(w) - 3, lit(1))), " ")
              .as("text"))
        val fresh = base.filter(col("doc_id") % 7 === 3)
          .select((col("doc_id") + 2000000).as("doc_id"),
            array_join(reverse(w), " ").as("text"))
        Dedup.nearDupAgainst(variants.union(fresh), "doc_id", "text",
            seenSigs)
          .select(col("doc_id"), md5(col("text")).as("fp"))
          .orderBy("doc_id")
      },
      Some {
        val mins = (0 until 8)
          .map(i => s"min(md5('$i|' || s)) AS m$i").mkString(", ")
        def bandsSql(sig: String) = (0 until 4).map(b =>
          s"SELECT doc_id, $b AS band, md5(m${2 * b} || m${2 * b + 1}) " +
            s"AS bv FROM $sig").mkString(" UNION ALL ")
        s"""WITH tk AS (SELECT doc_id, $TOKS AS w FROM documents),
           |shs AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
           |  FROM tk, unnest(CASE WHEN len(w) >= 3
           |    THEN generate_series(1, len(w)-2) ELSE [] END) AS u(i)),
           |sgs AS (SELECT doc_id, $mins FROM shs GROUP BY doc_id),
           |bs AS (${bandsSql("sgs")}),
           |inc AS (SELECT doc_id + 1000000 AS doc_id,
           |    array_to_string(w[1:greatest(len(w)-3, 1)], ' ') AS text
           |  FROM tk WHERE doc_id % 5 = 0
           |  UNION ALL
           |  SELECT doc_id + 2000000 AS doc_id,
           |    array_to_string(list_reverse(w), ' ') AS text
           |  FROM tk WHERE doc_id % 7 = 3),
           |ti AS (SELECT doc_id,
           |    regexp_split_to_array(trim(text), '\\s+') AS w FROM inc),
           |shi AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
           |  FROM ti, unnest(CASE WHEN len(w) >= 3
           |    THEN generate_series(1, len(w)-2) ELSE [] END) AS u(i)),
           |sgi AS (SELECT doc_id, $mins FROM shi GROUP BY doc_id),
           |bi AS (${bandsSql("sgi")}),
           |dup AS (SELECT DISTINCT bi.doc_id FROM bi JOIN bs
           |  ON bi.band = bs.band AND bi.bv = bs.bv)
           |SELECT inc.doc_id, md5(inc.text) AS fp FROM inc
           |LEFT JOIN dup ON dup.doc_id = inc.doc_id
           |WHERE dup.doc_id IS NULL ORDER BY inc.doc_id""".stripMargin
      }),

    // ----- X2/X3 semantic dedup (SemDeDup) ---------------------------------
    // End-to-end: LSH near-dup pairs at cosine ≥ 0.3 → transitive
    // closure → min-id representative survives per cluster, unpaired
    // vectors self-keep. The oracle replays the full q33 chain, then the
    // q54-style recursive closure, then the survivor filter. (0.3 is
    // calibrated to the synthetic fixture: its in-bucket cosines top out
    // at 0.45, and 0.3 yields ~24 pairs so the closure and survivor
    // stages genuinely collapse clusters instead of passing everything.)

    "q87_semantic_dedup" -> Entry(
      (s, dir) => Similarity.semanticDedup(t(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.3)
        .select(col("vec_id"), col("label"))
        .orderBy("vec_id"),
      Some("""WITH RECURSIVE pl AS (
             |  SELECT p.plane, j.j,
             |    CAST(CAST(('0x' || substr(md5(p.plane::VARCHAR || '_'
             |      || j.j::VARCHAR), 1, 8)) AS UBIGINT) AS DOUBLE)
             |      / 4294967296.0 - 0.5 AS r
             |  FROM (SELECT unnest(generate_series(0, 7)) AS plane) p,
             |       (SELECT unnest(generate_series(1, 64)) AS j) j),
             |cmp AS (SELECT vec_id, j, embedding[j]::DOUBLE AS x
             |  FROM embeddings, unnest(generate_series(1, len(embedding)))
             |    AS u(j)),
             |dots AS (SELECT vec_id, plane, SUM(x * r) AS d
             |  FROM cmp JOIN pl USING (j) GROUP BY 1, 2),
             |bkt AS (SELECT vec_id, CAST(SUM(CASE WHEN d > 0
             |    THEN (1::BIGINT << plane) ELSE 0 END) AS BIGINT) AS bucket
             |  FROM dots GROUP BY 1),
             |v AS (SELECT b.vec_id, e.embedding, b.bucket
             |  FROM bkt b JOIN embeddings e USING (vec_id)),
             |prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
             |  FROM v a JOIN v b ON a.bucket = b.bucket
             |    AND a.vec_id < b.vec_id
             |  WHERE round(
             |    list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
             |      for i in generate_series(1, len(a.embedding))]) /
             |    (sqrt(list_sum([a.embedding[i]::DOUBLE
             |        * a.embedding[i]::DOUBLE
             |      for i in generate_series(1, len(a.embedding))])) *
             |     sqrt(list_sum([b.embedding[i]::DOUBLE
             |        * b.embedding[i]::DOUBLE
             |      for i in generate_series(1, len(b.embedding))]))), 6)
             |    >= 0.3),
             |e AS (SELECT id_a AS eu, id_b AS ev FROM prs
             |  UNION SELECT id_b, id_a FROM prs),
             |reach(id, r) AS (
             |  SELECT eu, eu FROM e
             |  UNION
             |  SELECT reach.id, e.ev FROM reach JOIN e ON e.eu = reach.r),
             |cl AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
             |SELECT em.vec_id, em.label FROM embeddings em
             |LEFT JOIN cl ON cl.id = em.vec_id
             |WHERE cl.comp IS NULL OR cl.comp = em.vec_id
             |ORDER BY vec_id""".stripMargin)),

    // ----- X5 token-budget mixture -----------------------------------------
    // The mix specified the way training recipes specify it: token
    // TARGETS per source, rates calibrated in-plan from each source's
    // token total (broadcast 1-row aggregate — q73's shape). The "web"
    // branch lands near its 20k-char budget; "other"'s 1M target
    // exceeds its total, so the rate caps at 10000 bp = keep-all.

    "q86_budget_mixture" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val web = docs.filter(col("source").isin("src0", "src1"))
        val other = docs.filter(!col("source").isin("src0", "src1"))
        Sampling.mixtureByBudget(
            Seq(("web", web, 20000L), ("other", other, 1000000L)),
            "doc_id", "n_chars")
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("source_tag"))
          .orderBy("source_tag", "doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, source, n_chars FROM documents
             |  WHERE source IN ('src0', 'src1')),
             |o AS (SELECT doc_id, source, n_chars FROM documents
             |  WHERE source NOT IN ('src0', 'src1')),
             |wt AS (SELECT CAST(SUM(n_chars) AS DOUBLE) AS total FROM w),
             |ot AS (SELECT CAST(SUM(n_chars) AS DOUBLE) AS total FROM o),
             |m AS (
             |  SELECT doc_id, source, n_chars, 'web' AS source_tag
             |  FROM w, wt
             |  WHERE CAST(('0x' || substr(md5('mix|web|' ||
             |      CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 10000
             |    < greatest(0, least(10000,
             |        CASE WHEN total > 0
             |          THEN round(20000 * 10000.0 / total) ELSE 0 END))
             |  UNION ALL
             |  SELECT doc_id, source, n_chars, 'other' AS source_tag
             |  FROM o, ot
             |  WHERE CAST(('0x' || substr(md5('mix|other|' ||
             |      CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 10000
             |    < greatest(0, least(10000,
             |        CASE WHEN total > 0
             |          THEN round(1000000 * 10000.0 / total) ELSE 0 END)))
             |SELECT doc_id, source, n_chars, source_tag FROM m
             |ORDER BY source_tag, doc_id""".stripMargin)),

    // ----- X5 Unicode canonicalization before dedup ------------------------
    // The corpus is ASCII, so the entry plants two variants per 7th doc:
    // one with a precomposed-accent suffix (é = U+00E9), one with the
    // SAME text in decomposed form (e + U+0301) plus case/whitespace
    // noise. fingerprint() alone folds case and whitespace but NOT
    // composition — only the NFC step makes the pair collapse; the
    // oracle replays chr(233)/chr(769) byte-for-byte.

    "q85_normalize_dedup" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val sev = d.filter(col("doc_id") % 7 === 0)
        val composedV = sev.select(
          (col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" résumé café"))
            .as("text"))
        val decomposedV = sev.select(
          (col("doc_id") + 3000000).as("doc_id"),
          concat(col("text"),
            lit("  RÉSUMÉ   café ")).as("text"))
        val all = d.union(composedV).union(decomposedV)
        Dedup.exact(
            all.withColumn("text", TextAnalysis.normalize(col("text"))),
            "doc_id", "text")
          .orderBy("keep_id")
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 2000000,
             |    text || ' r' || chr(233) || 'sum' || chr(233) ||
             |      ' caf' || chr(233)
             |  FROM documents WHERE doc_id % 7 = 0
             |  UNION ALL
             |  SELECT doc_id + 3000000,
             |    text || '  RE' || chr(769) || 'SUME' || chr(769) ||
             |      '   cafe' || chr(769) || ' '
             |  FROM documents WHERE doc_id % 7 = 0),
             |norm AS (SELECT doc_id,
             |    trim(regexp_replace(lower(nfc_normalize(text)),
             |      '\s+', ' ', 'g')) AS text
             |  FROM docs)
             |SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
             |    AS fp,
             |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
             |FROM norm GROUP BY 1 ORDER BY keep_id""".stripMargin)),

    // ----- X5 per-source score normalization -------------------------------
    // percent_rank within source over (n_chars, doc_id) — the id
    // tiebreak makes ranks unique (the fixture has 15 tied
    // (source, n_chars) groups), and (rank-1)/(n-1) is a pure integer
    // ratio, engine-bit-identical with no rounding needed. NULLS FIRST
    // is explicit in the oracle: DuckDB defaults ASC to nulls LAST,
    // Spark to nulls first.
    "q96_rank_normalize" -> Entry(
      (s, dir) => {
        val d = Queries.t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Sampling.rankNormalize(d, col("source"), col("doc_id"),
            col("n_chars"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source, n_chars,
             |  percent_rank() OVER (PARTITION BY source
             |    ORDER BY n_chars ASC NULLS FIRST, doc_id) AS pct
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ----- X5 per-source quality gate --------------------------------------
    // Keep each source's top quarter BY ITS OWN length distribution —
    // the per-source-percentile curation gate (a global cutoff would
    // over-prune short-doc sources and under-prune long-doc ones;
    // contrast q73's global keepTopQuantile).
    "q97_per_source_gate" -> Entry(
      (s, dir) => {
        val d = Queries.t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Sampling.perKeyQuantileGate(d, col("source"), col("doc_id"),
            col("n_chars"), minPct = 0.75)
          .select(col("doc_id"), col("source"))
          .orderBy("doc_id")
      },
      Some("""WITH r AS (SELECT doc_id, source,
             |  percent_rank() OVER (PARTITION BY source
             |    ORDER BY n_chars ASC, doc_id) AS p
             |  FROM documents WHERE n_chars IS NOT NULL)
             |SELECT doc_id, source FROM r WHERE p >= 0.75
             |ORDER BY doc_id""".stripMargin)),

    // ----- X5 bigram LM perplexity gate ------------------------------------
    // CCNet-style self-trained perplexity scoring, one order above q76's
    // unigram: add-0.5-smoothed p(w2|w1). The per-doc fold runs in
    // sorted (w1, w2) order on both engines (the q76 convention); log2
    // is libm so the output rounds to 6.
    "q98_bigram_lm" -> Entry(
      (s, dir) => Vocab.bigramLogProb(docsFan(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH tk AS (SELECT doc_id, $TOKS AS t FROM documents
              |  WHERE text IS NOT NULL),
              |bg AS (SELECT doc_id,
              |  unnest([struct_pack(w1 := t[i], w2 := t[i + 1])
              |    FOR i IN generate_series(1, len(t) - 1)]) AS p
              |  FROM tk),
              |dp AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2,
              |    COUNT(*) AS cnt
              |  FROM bg GROUP BY 1, 2, 3),
              |bf AS (SELECT w1, w2, SUM(cnt) AS bf FROM dp GROUP BY 1, 2),
              |wf AS (SELECT w1, SUM(bf) AS wf FROM bf GROUP BY 1),
              |v AS (SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v
              |  FROM (SELECT unnest(t) AS term FROM tk)),
              |per AS (SELECT doc_id, v,
              |    list_sort(list(struct_pack(w1 := w1, w2 := w2,
              |      cnt := cnt, bf := bf, wf := wf))) AS xs,
              |    CAST(SUM(cnt) AS BIGINT) AS n_bigrams
              |  FROM dp JOIN bf USING (w1, w2) JOIN wf USING (w1), v
              |  GROUP BY doc_id, v)
              |SELECT doc_id, n_bigrams,
              |  round(list_reduce(
              |    [CAST(x.cnt AS DOUBLE) *
              |       log2((CAST(x.bf AS DOUBLE) + 0.5) /
              |            (CAST(x.wf AS DOUBLE) + 0.5 * v)) for x in xs],
              |    (a, b) -> a + b) / CAST(n_bigrams AS DOUBLE), 6)
              |    AS logprob
              |FROM per ORDER BY doc_id""".stripMargin)),

    // ----- X5 exact-count proportional sampling ----------------------------
    // Largest-remainder apportionment: EXACTLY 123 docs, source
    // proportions preserved. The fixture makes the remainder tie-break
    // real: 20 sources × 25 docs all tie at remainder 75, so the three
    // +1 top-ups land on the lexicographically-first sources — pinned
    // identically on both engines.
    "q99_apportioned_sample" -> Entry(
      (s, dir) => Sampling.apportionedSample(
          Queries.t(s, dir, "documents").select(col("doc_id"),
            col("source")),
          col("source"), col("doc_id"), totalN = 123, salt = "ap")
        .orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, source FROM documents
             |  WHERE source IS NOT NULL AND doc_id IS NOT NULL),
             |c AS (SELECT source, COUNT(*) AS n FROM d GROUP BY 1),
             |t AS (SELECT SUM(n) AS tot FROM c),
             |b AS (SELECT source, n, (123 * n) // tot AS base,
             |    123 * n - ((123 * n) // tot) * tot AS rem FROM c, t),
             |sb AS (SELECT SUM(base) AS sb FROM b),
             |q AS (SELECT source, least(base + CASE WHEN
             |    ROW_NUMBER() OVER (ORDER BY rem DESC, source)
             |      <= 123 - sb THEN 1 ELSE 0 END, n) AS quota
             |  FROM b, sb),
             |r AS (SELECT doc_id, source, ROW_NUMBER() OVER (
             |    PARTITION BY source
             |    ORDER BY md5('ap|' || CAST(doc_id AS VARCHAR)), doc_id)
             |    AS rn FROM d)
             |SELECT doc_id, source FROM r JOIN q USING (source)
             |WHERE rn <= quota ORDER BY doc_id""".stripMargin)),

    // ----- X5 distribution drift (PSI) -------------------------------------
    // Population Stability Index between the even- and odd-id halves of
    // the corpus over n_chars, fixed [0, 400) × 8 bins. Shares are
    // single exact divisions; only ln is libm, rounded inside psi_term.
    "q100_psi_drift" -> Entry(
      (s, dir) => {
        val d = Queries.t(s, dir, "documents")
        Profiles.psi(d.filter(col("doc_id") % 2 === 0),
            d.filter(col("doc_id") % 2 === 1), "n_chars",
            lo = 0.0, hi = 400.0, bins = 8)
          .orderBy("bin")
      },
      Some("""WITH ha AS (SELECT CAST(least(greatest(
             |    floor((CAST(n_chars AS DOUBLE) - 0.0) / 50.0), 0), 7)
             |    AS BIGINT) AS bin, COUNT(*) AS n_a
             |  FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL
             |  GROUP BY 1),
             |hb AS (SELECT CAST(least(greatest(
             |    floor((CAST(n_chars AS DOUBLE) - 0.0) / 50.0), 0), 7)
             |    AS BIGINT) AS bin, COUNT(*) AS n_b
             |  FROM documents WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL
             |  GROUP BY 1),
             |ta AS (SELECT CAST(SUM(n_a) AS DOUBLE) AS ta FROM ha),
             |tb AS (SELECT CAST(SUM(n_b) AS DOUBLE) AS tb FROM hb),
             |sp AS (SELECT unnest(generate_series(0, 7)) AS bin),
             |j AS (SELECT sp.bin,
             |    COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
             |  FROM sp LEFT JOIN ha USING (bin) LEFT JOIN hb USING (bin))
             |SELECT bin, n_a, n_b,
             |  greatest(n_a / ta, 1e-6) AS share_a,
             |  greatest(n_b / tb, 1e-6) AS share_b,
             |  round((greatest(n_a / ta, 1e-6) - greatest(n_b / tb, 1e-6))
             |    * ln(greatest(n_a / ta, 1e-6)
             |      / greatest(n_b / tb, 1e-6)), 6) AS psi_term
             |FROM j, ta, tb ORDER BY bin""".stripMargin)),

    // ----- X5 Gopher-rules composite gate -----------------------------------
    // The Rae et al. 2021 document filter: token-count bounds,
    // mean-token-length bounds, alpha-word fraction, required-stopword
    // presence. Every ratio is an integer-derived IEEE division —
    // engine-bit-identical, no rounding needed. Thresholds calibrated
    // to discriminate on this corpus: the length floor and the
    // two-distinct-stopword rule both genuinely split it.
    "q101_gopher_rules" -> Entry(
      (s, dir) => TextAnalysis.withGopherQuality(
          t(s, dir, "documents").select(col("doc_id"), col("text")),
          "text", minTokens = 50, maxTokens = 100000,
          minMeanTokLen = 3.0, maxMeanTokLen = 10.0,
          minAlphaFrac = 0.8, minStopHits = 2)
        .select(col("doc_id"), col("n_tokens"), col("mean_tok_len"),
          col("alpha_frac"), col("stop_hits"), col("gopher_pass"))
        .orderBy("doc_id"),
      Some(s"""WITH tok AS (SELECT doc_id, text, $TOKS AS w
              |  FROM documents),
              |m AS (SELECT doc_id,
              |  CASE WHEN text IS NULL THEN 0
              |    ELSE len(w) END AS n_tokens,
              |  CASE WHEN text IS NULL OR len(w) = 0 THEN 0.0
              |    ELSE CAST(length(regexp_replace(trim(text), '\\s+', '',
              |      'g')) AS DOUBLE) / CAST(len(w) AS DOUBLE)
              |  END AS mean_tok_len,
              |  CASE WHEN text IS NULL OR len(w) = 0 THEN 0.0
              |    ELSE CAST(len(list_filter(w,
              |        t -> regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)
              |      / CAST(len(w) AS DOUBLE)
              |  END AS alpha_frac,
              |  CASE WHEN text IS NULL THEN 0 ELSE
              |    (CASE WHEN list_contains(w, 'a') THEN 1 ELSE 0 END) +
              |    (CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END) +
              |    (CASE WHEN list_contains(w, 'in') THEN 1 ELSE 0 END) +
              |    (CASE WHEN list_contains(w, 'is') THEN 1 ELSE 0 END) +
              |    (CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END) +
              |    (CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END) +
              |    (CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END)
              |  END AS stop_hits
              |  FROM tok)
              |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
              |  mean_tok_len, alpha_frac,
              |  CAST(stop_hits AS BIGINT) AS stop_hits,
              |  (n_tokens >= 50 AND n_tokens <= 100000
              |    AND mean_tok_len >= 3.0 AND mean_tok_len <= 10.0
              |    AND alpha_frac >= 0.8 AND stop_hits >= 2) AS gopher_pass
              |FROM m ORDER BY doc_id""".stripMargin)),

    // ----- X5 out-of-vocabulary rate ----------------------------------------
    // Self-trained OOV gate: rate of token occurrences outside the
    // corpus's own top-20 vocabulary. The vocab is a bounded driver
    // codebook (topTerms collect, KB-scale — the PQ-centroid precedent);
    // scoring is then a zero-join scan projection via the native
    // CountInSet probe. Ties at the cutoff break by term on both
    // engines.
    "q102_oov_rate" -> Entry(
      // docsFan: per-row token fold against the vocab list (r16 fan-out)
      (s, dir) => {
        val docs = docsFan(s, dir).select(col("doc_id"), col("text"))
        val vocab = Vocab.topTerms(docs, "doc_id", "text", n = 20)
        Vocab.withOovRate(docs, "text", vocab)
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            col("oov_rate"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, $TOKS AS w FROM documents),
              |top AS (SELECT t FROM (SELECT unnest(w) AS t FROM tok)
              |  GROUP BY t ORDER BY COUNT(*) DESC, t LIMIT 20),
              |vl AS (SELECT list(t) AS vl FROM top)
              |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
              |  CAST(CASE WHEN len(w) = 0 THEN 0 ELSE
              |    len(list_filter(w, t -> NOT list_contains(vl, t)))
              |  END AS BIGINT) AS n_oov,
              |  CASE WHEN len(w) = 0 THEN 0.0 ELSE
              |    CAST(len(list_filter(w, t -> NOT list_contains(vl, t)))
              |      AS DOUBLE) / CAST(len(w) AS DOUBLE)
              |  END AS oov_rate
              |FROM tok, vl ORDER BY doc_id""".stripMargin)),

    // ----- X5 HTML boilerplate strip ----------------------------------------
    // The ingestion-hygiene pass: the fixture wraps each doc's real text
    // in deterministic HTML (script + style + comment + tags +
    // entities), strips it, and must recover the whitespace-collapsed
    // text plus the decoded entity tail — both engines run the
    // IDENTICAL regex chain (Java∩RE2 subset), so any divergence in
    // order-of-operations (e.g. &amp; decoded too early) breaks the
    // hash.
    "q103_html_strip" -> Entry(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.stripHtml(concat(
            lit("<html><head><script type=\"text/javascript\">var x = " +
              "1 &amp;&amp; 2;</script><style>p { color: red; }</style>" +
              "</head><body><p class=\""), col("source"), lit("\">"),
            col("text"),
            lit("</p><!-- lang="), col("lang"),
            lit(" --><br/>Tom &amp; Jerry say &quot;hi&quot; &lt;3" +
              "</body></html>"))).as("clean_text"))
        .orderBy("doc_id"),
      Some {
        // the replace chain is BUILT, not hand-nested (a hand-nested
        // 11-deep call slipped one close paren — the builder cannot):
        // innermost-first order mirrors stripHtml exactly, &amp; last
        val chain = Seq(
          ("'(?is)<script[^>]*>.*?</script>'", "' '"),
          ("'(?is)<style[^>]*>.*?</style>'", "' '"),
          ("'(?s)<!--.*?-->'", "' '"),
          ("'<[^>]+>'", "' '"),
          ("'&lt;'", "'<'"),
          ("'&gt;'", "'>'"),
          ("'&quot;'", "'\"'"),
          ("'&#39;'", "''''"),
          ("'&nbsp;'", "' '"),
          ("'&amp;'", "'&'"),
          ("'\\s+'", "' '"))
          .foldLeft("html") { case (e, (pat, rep)) =>
            s"regexp_replace($e, $pat, $rep, 'g')"
          }
        s"""WITH h AS (SELECT doc_id,
           |  '<html><head><script type="text/javascript">var x = ' ||
           |  '1 &amp;&amp; 2;</script><style>p { color: red; }</style>' ||
           |  '</head><body><p class="' || source || '">' || text ||
           |  '</p><!-- lang=' || lang ||
           |  ' --><br/>Tom &amp; Jerry say &quot;hi&quot; &lt;3' ||
           |  '</body></html>' AS html FROM documents)
           |SELECT doc_id, trim($chain) AS clean_text
           |FROM h ORDER BY doc_id""".stripMargin
      }),

    // ----- X5 fuzzy (MinHash) decontamination -------------------------------
    // Near-duplicate eval leakage: the corpus is the near-dup-planted
    // fixture, the benchmark the doc_id % 97 originals. Exact-copy
    // benchmark docs score jaccard 1.0; their planted near-dup copies
    // (last 3 tokens dropped) land well above 0.5 only via banding +
    // verification — the operator's whole point. MD5 minhash arithmetic
    // replays exactly; jaccard is an integer-ratio double.
    "q104_fuzzy_decon" -> Entry(
      // corpus pinned: fuzzyOverlap re-references it for the id
      // re-attach, and the planted-copy union otherwise replays per
      // reference (10 scans → 3 in the r16 plan pair)
      (s, dir) => Decontaminate.fuzzyOverlap(
          nearDupDocs(s, dir).pinned, "doc_id", "text",
          docsFan(s, dir).filter(col("doc_id") % 97 === 0),
          "doc_id", "text",
          k = 8, rowsPerBand = 2, shingleN = 3, flagAt = 0.5)
        .orderBy("doc_id"),
      Some {
        val mins = MinhashMinsSql
        def bandsSql(sig: String) = minhashShBandsSql(sig)
        s"""WITH $NearDupDocsSql,
           |ct AS (SELECT doc_id, $TOKS AS w FROM docs),
           |csh AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
           |  FROM ct, unnest(CASE WHEN len(w) >= 3
           |    THEN generate_series(1, len(w)-2) ELSE [] END) AS u(i)),
           |csig AS (SELECT doc_id, list(DISTINCT s) AS sh, $mins
           |  FROM csh GROUP BY doc_id),
           |cbands AS (${bandsSql("csig")}),
           |bt AS (SELECT doc_id, $TOKS AS w FROM documents
           |  WHERE doc_id % 97 = 0),
           |bsh AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
           |  FROM bt, unnest(CASE WHEN len(w) >= 3
           |    THEN generate_series(1, len(w)-2) ELSE [] END) AS u(i)),
           |bsig AS (SELECT doc_id, list(DISTINCT s) AS sh, $mins
           |  FROM bsh GROUP BY doc_id),
           |bbands AS (${bandsSql("bsig")}),
           |mt AS (SELECT c.doc_id, b.doc_id AS bench_id,
           |    CAST(len(list_intersect(c.sh, b.sh)) AS DOUBLE) /
           |      (CAST(len(c.sh) AS DOUBLE) + CAST(len(b.sh) AS DOUBLE)
           |        - CAST(len(list_intersect(c.sh, b.sh)) AS DOUBLE))
           |    AS jac
           |  FROM cbands c JOIN bbands b
           |  ON c.band = b.band AND c.bv = b.bv),
           |v AS (SELECT doc_id, max(jac) AS best_jaccard,
           |    COUNT(DISTINCT CASE WHEN jac >= 0.5 THEN bench_id END)
           |      AS n_bench_matches
           |  FROM mt GROUP BY doc_id)
           |SELECT d.doc_id,
           |  COALESCE(best_jaccard, 0.0) AS best_jaccard,
           |  CAST(COALESCE(n_bench_matches, 0) AS BIGINT)
           |    AS n_bench_matches,
           |  COALESCE(best_jaccard >= 0.5, false) AS contaminated
           |FROM (SELECT doc_id FROM docs) d LEFT JOIN v USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      }),

    // ----- X2 repeated-span REMOVAL (exact substring dedup) -----------------
    // Lee et al. 2022's removal form over the near-dup fixture: planted
    // copies (shared 10-grams) are stripped to empty, their originals
    // keep exactly the 3-token tail the copies dropped (grams touching
    // it occur once), untouched docs pass through verbatim — three
    // genuinely different outcomes in one run. Integer/string
    // arithmetic only.
    "q105_repeated_spans" -> Entry(
      // corpus pinned: removeRepeatedSpans scans its input three times
      // (gram frequency, covered-start semi-join, reassembly) — the
      // planted-copy union replayed per scan (12 scans → 3)
      (s, dir) => Dedup.removeRepeatedSpans(nearDupDocs(s, dir).pinned,
          "doc_id", "text", n = 10, minDocs = 2)
        .orderBy("doc_id"),
      Some(s"""WITH $NearDupDocsSql,
              |tk AS (SELECT doc_id, $TOKS AS w FROM docs),
              |g AS (SELECT doc_id, i - 1 AS pos,
              |    array_to_string(w[i:i+9], ' ') AS s
              |  FROM tk, unnest(CASE WHEN len(w) >= 10
              |    THEN generate_series(1, len(w)-9) ELSE [] END) AS u(i)),
              |f AS (SELECT s FROM g GROUP BY s
              |  HAVING COUNT(DISTINCT doc_id) >= 2),
              |st AS (SELECT doc_id, list(pos) AS starts FROM g
              |  WHERE s IN (SELECT s FROM f) GROUP BY doc_id),
              |p AS (SELECT doc_id, i - 1 AS p, w[i] AS t
              |  FROM tk, unnest(generate_series(1, len(w))) AS u(i)),
              |kept AS (SELECT p.doc_id, p.p, p.t
              |  FROM p LEFT JOIN st USING (doc_id)
              |  WHERE len(list_filter(COALESCE(st.starts, []),
              |    s -> p.p >= s AND p.p <= s + 9)) = 0),
              |o AS (SELECT doc_id, COUNT(*) AS n_kept,
              |    string_agg(t, ' ' ORDER BY p) AS clean_text
              |  FROM kept GROUP BY doc_id)
              |SELECT tk.doc_id,
              |  CAST(COALESCE(len(w), 0) AS BIGINT) AS n_tokens,
              |  CAST(COALESCE(len(w), 0) - COALESCE(n_kept, 0) AS BIGINT)
              |    AS n_removed,
              |  CASE WHEN w IS NULL THEN NULL
              |    ELSE COALESCE(o.clean_text, '') END AS clean_text
              |FROM tk LEFT JOIN o USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    // ----- X3 Matryoshka prefix-dimension two-stage serving -----------------
    // Shortlist on the first 16 of 64 dims (q30's ranking shape over
    // the sliced prefix), exact full-dim re-rank of the 20-candidate
    // shortlist — the dimension-truncation sibling of q95. Scores
    // round to 6 with the corpus-id tiebreak, so ranks are
    // engine-deterministic.
    "q106_prefix_rerank" -> Entry(
      (s, dir) => {
        val emb = Queries.t(s, dir, "embeddings")
        Quantize.prefixTopK(emb.filter(col("vec_id") < 5), emb,
            "vec_id", "embedding", dPrefix = 16, k = 10, shortlist = 20)
          .withColumnRenamed("rank", "rnk")
          .orderBy("query_id", "rnk")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id,
             |  embedding[1:16] AS pv FROM embeddings WHERE vec_id < 5),
             |c AS (SELECT vec_id AS corpus_id, embedding[1:16] AS pv
             |  FROM embeddings),
             |s AS (SELECT query_id, corpus_id,
             |  round(
             |    list_sum([q.pv[i]::DOUBLE * c.pv[i]::DOUBLE
             |      for i in generate_series(1, len(q.pv))]) /
             |    (sqrt(list_sum([q.pv[i]::DOUBLE * q.pv[i]::DOUBLE
             |      for i in generate_series(1, len(q.pv))])) *
             |     sqrt(list_sum([c.pv[i]::DOUBLE * c.pv[i]::DOUBLE
             |      for i in generate_series(1, len(c.pv))]))), 6) AS score
             |  FROM q, c WHERE query_id <> corpus_id),
             |r AS (SELECT query_id, corpus_id,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             |    ORDER BY score DESC, corpus_id) AS BIGINT) AS rnk FROM s),
             |cand AS (SELECT query_id, corpus_id FROM r WHERE rnk <= 20),
             |rr AS (SELECT cand.query_id, cand.corpus_id,
             |  round(list_sum([qe.embedding[i]::DOUBLE *
             |        ce.embedding[i]::DOUBLE
             |      FOR i IN generate_series(1, len(qe.embedding))]) /
             |    (sqrt(list_sum([qe.embedding[i]::DOUBLE *
             |        qe.embedding[i]::DOUBLE
             |      FOR i IN generate_series(1, len(qe.embedding))])) *
             |     sqrt(list_sum([ce.embedding[i]::DOUBLE *
             |        ce.embedding[i]::DOUBLE
             |      FOR i IN generate_series(1, len(ce.embedding))]))), 6)
             |    AS score
             |  FROM cand JOIN embeddings qe ON qe.vec_id = cand.query_id
             |  JOIN embeddings ce ON ce.vec_id = cand.corpus_id),
             |r2 AS (SELECT query_id, corpus_id, score,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             |    ORDER BY score DESC, corpus_id) AS BIGINT) AS rnk FROM rr)
             |SELECT query_id, corpus_id, score, rnk FROM r2
             |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin)),

    // ----- X5 BPE tokenizer training ----------------------------------------
    // Sennrich-style merge learning over the corpus's word-frequency
    // table; the oracle replays all 10 merge iterations as a GENERATED
    // CTE chain — per layer: pair counts, the (freq DESC, lhs, rhs)
    // argmax, and the same greedy left-to-right list_reduce fold the
    // Spark side applies. All integer/string arithmetic: exact.
    "q107_bpe_train" -> Entry(
      (s, dir) => {
        val merges = Vocab.bpeTrain(t(s, dir, "documents"), "text",
          numMerges = 10)
        s.createDataFrame(merges)
          .select(col("merge_rank"), col("lhs"), col("rhs"), col("freq"))
          .orderBy("merge_rank")
      },
      Some(bpeOracleSql(10))),

    // ----- X5 trained-tokenizer budget estimation ---------------------------
    // Subword counts under the LEARNED merges (q107's training replayed,
    // then the per-word segmentation cache joined against the corpus
    // token stream) — the real token-cost number, where q38's regex
    // count is the untrained approximation.
    "q108_bpe_tokens_trained" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = Vocab.bpeTrain(docs, "text", numMerges = 10)
        Vocab.withBpeTokenCount(docs, "doc_id", "text", merges)
          .orderBy("doc_id")
      },
      Some {
        // concatenate, never re-stripMargin a string with the chain
        // interpolated (its `|| ['</w>']` line would lose a pipe to the
        // second margin strip)
        val tail =
          s"""tokd AS (SELECT doc_id, unnest($TOKS) AS word
             |  FROM documents),
             |tok AS (SELECT doc_id, word FROM tokd WHERE word <> '')
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
             |  CAST(SUM(len(syms)) AS BIGINT) AS n_bpe_tokens
             |FROM tok JOIN w10 USING (word)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin
        s"WITH ${bpeChainSql(10)},\n$tail"
      }),

    // ----- X-pipe curation v3: gopher gate → exact dedup → fuzzy decon ------
    "q109_curation_gopher" -> Q109Entry,

    // ----- X2 C4-style global line dedup ------------------------------------
    // Raffel et al. 2020 §2.2: a line occurring anywhere else in the
    // corpus survives only at its first (doc_id, pos); short lines are
    // exempt. Fixture: sentences become lines ('. ' → '.\n') over the
    // planted-exact-copy corpus, so every copy's lines duplicate its
    // original's and the copies shed all long lines (most die whole).
    // Strings + integer comparisons only — fully oracle-exact.
    "q110_line_dedup" -> Entry(
      (s, dir) => {
        val lined = dupDocs(s, dir).select(col("doc_id"),
          regexp_replace(col("text"), lit("\\. "), lit(".\n")).as("text"))
        Dedup.dedupLines(lined, "doc_id", "text", minLineChars = 10)
          .orderBy("doc_id")
      },
      Some(s"""WITH $DupDocsSql,
              |ld AS (SELECT doc_id, string_split(regexp_replace(text,
              |  '\\. ', '.' || chr(10), 'g'), chr(10)) AS ln FROM docs),
              |l AS (SELECT doc_id, u.i AS pos, ln[u.i] AS line FROM ld,
              |  unnest(generate_series(1, len(ln))) AS u(i)),
              |k AS (SELECT doc_id, pos, line FROM l
              |  QUALIFY length(line) < 10
              |    OR ROW_NUMBER() OVER (PARTITION BY line
              |         ORDER BY doc_id, pos) = 1)
              |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos)
              |  AS text
              |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ----- X5 Gopher line-level rules ---------------------------------------
    // The two A1.1 rules the document-level gate (q101) cannot see:
    // bullet-started and ellipsis-ended line fractions. Fixture plants
    // the failure modes deterministically: doc_id%3 → every line
    // bulleted ('- '), else doc_id%5 → every line ellipsis-ended.
    // Fractions are integer-count IEEE divisions — engine-exact.
    "q111_gopher_line_rules" -> Entry(
      (s, dir) => {
        val lined = docsFan(s, dir).select(col("doc_id"),
          regexp_replace(col("text"), lit("\\. "), lit(".\n")).as("text"))
        val planted = lined.select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            array_join(transform(split(col("text"), "\n"),
              l => concat(lit("- "), l)), "\n"))
          .when(col("doc_id") % 5 === 0,
            array_join(transform(split(col("text"), "\n"),
              l => concat(l, lit("..."))), "\n"))
          .otherwise(col("text")).as("text"))
        TextAnalysis.withGopherLineRules(planted, "text",
            maxBulletFrac = 0.9, maxEllipsisFrac = 0.3)
          .select(col("doc_id"), col("n_lines"), col("bullet_frac"),
            col("ellipsis_frac"), col("line_rules_pass"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ld AS (SELECT doc_id, regexp_replace(text, '\\. ',
              |  '.' || chr(10), 'g') AS t0 FROM documents),
              |pl AS (SELECT doc_id, CASE
              |  WHEN doc_id % 3 = 0 THEN array_to_string(list_transform(
              |    string_split(t0, chr(10)), l -> '- ' || l), chr(10))
              |  WHEN doc_id % 5 = 0 THEN array_to_string(list_transform(
              |    string_split(t0, chr(10)), l -> l || '...'), chr(10))
              |  ELSE t0 END AS t FROM ld),
              |ln AS (SELECT doc_id, CASE WHEN t IS NULL THEN NULL
              |  ELSE list_filter(string_split(t, chr(10)),
              |    l -> length(trim(l)) > 0) END AS ls FROM pl),
              |m AS (SELECT doc_id,
              |  CASE WHEN ls IS NULL THEN 0 ELSE len(ls) END AS n_lines,
              |  CASE WHEN ls IS NULL OR len(ls) = 0 THEN 0.0
              |    ELSE CAST(len(list_filter(ls, l ->
              |      starts_with(ltrim(l), '- ')
              |      OR starts_with(ltrim(l), '* ')
              |      OR starts_with(ltrim(l), '•'))) AS DOUBLE)
              |      / CAST(len(ls) AS DOUBLE) END AS bullet_frac,
              |  CASE WHEN ls IS NULL OR len(ls) = 0 THEN 0.0
              |    ELSE CAST(len(list_filter(ls, l ->
              |      ends_with(rtrim(l), '...')
              |      OR ends_with(rtrim(l), '…'))) AS DOUBLE)
              |      / CAST(len(ls) AS DOUBLE) END AS ellipsis_frac
              |  FROM ln)
              |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
              |  bullet_frac, ellipsis_frac,
              |  (n_lines > 0 AND bullet_frac <= 0.9
              |    AND ellipsis_frac <= 0.3) AS line_rules_pass
              |FROM m ORDER BY doc_id""".stripMargin)),

    // ----- X5 C4 document rules ---------------------------------------------
    // Raffel et al. 2020 §2.2: the line filter (terminal punctuation,
    // ≥3 words, no "javascript") plus the page filters (≥minSentences,
    // no "lorem ipsum", no curly brace). The fixture plants each
    // failure mode on its own doc_id residue class: %11 → a javascript
    // line (line dropped, page survives), %13 → lorem ipsum (page
    // dies), %17 → a braced code line (page dies).
    "q112_c4_rules" -> Entry(
      (s, dir) => {
        val lined = docsFan(s, dir).select(col("doc_id"),
          regexp_replace(col("text"), lit("\\. "), lit(".\n")).as("text"))
        val planted = lined.select(col("doc_id"),
          when(col("doc_id") % 11 === 0,
            concat(col("text"), lit("\nplease enable javascript to view.")))
          .when(col("doc_id") % 13 === 0,
            concat(col("text"), lit("\nlorem ipsum dolor sit amet.")))
          .when(col("doc_id") % 17 === 0,
            concat(col("text"), lit("\nif (x) { return y; }")))
          .otherwise(col("text")).as("text"))
        TextAnalysis.withC4Rules(planted, "text", minSentences = 3)
          .select(col("doc_id"), col("c4_text"), col("n_sentences"),
            col("has_lorem"), col("has_brace"), col("c4_pass"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ld AS (SELECT doc_id, regexp_replace(text, '\\. ',
              |  '.' || chr(10), 'g') AS t0 FROM documents),
              |pl AS (SELECT doc_id, CASE
              |  WHEN doc_id % 11 = 0 THEN t0 || chr(10) ||
              |    'please enable javascript to view.'
              |  WHEN doc_id % 13 = 0 THEN t0 || chr(10) ||
              |    'lorem ipsum dolor sit amet.'
              |  WHEN doc_id % 17 = 0 THEN t0 || chr(10) ||
              |    'if (x) {{ return y; }}'
              |  ELSE t0 END AS t FROM ld),
              |c AS (SELECT doc_id, t, CASE WHEN t IS NULL THEN NULL
              |  -- coalesce: DuckDB's array_to_string([]) is NULL, Spark's
              |  -- array_join([]) is '' — an all-lines-rejected doc is ''
              |  ELSE coalesce(
              |    array_to_string(list_filter(string_split(t, chr(10)),
              |    l -> (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!')
              |        OR ends_with(rtrim(l), '?')
              |        OR ends_with(rtrim(l), '"'))
              |      AND len(regexp_split_to_array(trim(l), '\\s+')) >= 3
              |      AND NOT contains(lower(l), 'javascript')), chr(10)), '')
              |  END AS c4_text FROM pl),
              |m AS (SELECT doc_id, t, c4_text,
              |  coalesce(CAST(len(list_filter(regexp_split_to_array(
              |    c4_text, '[.!?]+'), x -> length(trim(x)) > 0))
              |    AS BIGINT), 0) AS n_sentences,
              |  coalesce(contains(lower(t), 'lorem ipsum'), FALSE)
              |    AS has_lorem,
              |  coalesce(contains(t, '{{'), FALSE) AS has_brace
              |  FROM c)
              |SELECT doc_id, c4_text, n_sentences, has_lorem, has_brace,
              |  (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace)
              |    AS c4_pass
              |FROM m ORDER BY doc_id""".stripMargin)),

    // ----- X5 DSIR importance weights ---------------------------------------
    // Xie et al. 2023: hashed-n-gram importance weights of every raw
    // doc against a target slice (here: the English docs). The oracle
    // replays the full chain — md5-hashed unigram+bigram buckets, both
    // smoothed models on the complete bucket spine, and the per-doc
    // sorted-bucket fold.
    "q113_dsir_weights" -> Entry(
      (s, dir) => {
        val raw = docsFan(s, dir)
        val target = raw.filter(col("lang") === "en")
        Dsir.importanceWeights(raw, "doc_id", "text", target, "text",
            numBuckets = 4096)
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, list_filter(
              |    regexp_split_to_array(trim(lower(text)), '\\s+'),
              |    x -> length(x) > 0) AS ts FROM documents),
              |feats AS (
              |  SELECT doc_id, u.x AS f FROM tk, unnest(ts) AS u(x)
              |  UNION ALL
              |  SELECT doc_id, ts[g.i] || ' ' || ts[g.i + 1] AS f
              |  FROM tk, unnest(generate_series(1, len(ts) - 1)) AS g(i)),
              |fb AS (SELECT doc_id, CAST(('0x' || substr(md5('dsir|' || f),
              |    1, 8)) AS UBIGINT) % 4096 AS bucket FROM feats),
              |tb AS (SELECT bucket, count(*) AS t_cnt FROM fb
              |  JOIN documents USING (doc_id) WHERE lang = 'en'
              |  GROUP BY 1),
              |rb AS (SELECT bucket, count(*) AS r_cnt FROM fb GROUP BY 1),
              |tot AS (SELECT (SELECT coalesce(sum(t_cnt), 0) FROM tb)
              |    AS t_tot,
              |  (SELECT coalesce(sum(r_cnt), 0) FROM rb) AS r_tot),
              |model AS (SELECT g.b AS bucket,
              |  log2((coalesce(t_cnt, 0) + 0.5) /
              |      (t_tot + 0.5 * 4096)) -
              |  log2((coalesce(r_cnt, 0) + 0.5) /
              |      (r_tot + 0.5 * 4096)) AS llr
              |  FROM generate_series(0, 4095) AS g(b)
              |  LEFT JOIN tb ON tb.bucket = g.b
              |  LEFT JOIN rb ON rb.bucket = g.b
              |  CROSS JOIN tot),
              |db AS (SELECT doc_id, bucket, count(*) AS cnt FROM fb
              |  GROUP BY 1, 2)
              |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_feats,
              |  round(list_sum(list(cnt * llr ORDER BY bucket)), 6)
              |    AS logw
              |FROM db JOIN model USING (bucket)
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ----- X3 hard-negative mining ------------------------------------------
    // Contrastive-training pairs: each anchor's k most-similar
    // DIFFERENT-label vectors (same broadcastTopK shape as q30, plus
    // the null-safe label-mismatch rule).
    "q114_hard_negatives" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.hardNegatives(emb.filter(col("vec_id") < 5), emb,
            "vec_id", "embedding", "label", k = 10)
          .withColumnRenamed("rank", "rnk")
          .orderBy("anchor_id", "rnk")
      },
      Some("""WITH q AS (SELECT vec_id AS anchor_id, embedding AS qv,
             |  label AS al FROM embeddings WHERE vec_id < 5),
             |c AS (SELECT vec_id AS neg_id, embedding AS cv, label AS nl
             |  FROM embeddings),
             |s AS (SELECT anchor_id, neg_id,
             |  round(
             |    list_sum([qv[i]::DOUBLE * cv[i]::DOUBLE
             |      for i in generate_series(1, len(qv))]) /
             |    (sqrt(list_sum([qv[i]::DOUBLE * qv[i]::DOUBLE
             |      for i in generate_series(1, len(qv))])) *
             |     sqrt(list_sum([cv[i]::DOUBLE * cv[i]::DOUBLE
             |      for i in generate_series(1, len(cv))]))), 6) AS score
             |  FROM q, c WHERE anchor_id <> neg_id
             |    AND al IS DISTINCT FROM nl),
             |r AS (SELECT anchor_id, neg_id, score,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY anchor_id
             |    ORDER BY score DESC, neg_id) AS BIGINT) AS rnk FROM s)
             |SELECT anchor_id, neg_id, score, rnk FROM r
             |WHERE rnk <= 10 ORDER BY anchor_id, rnk""".stripMargin)),

    // ----- X5 trained quality classifier ------------------------------------
    // The discriminative quality-filter recipe (GPT-3/CCNet/LLaMA): a
    // diagonal-LDA head on DSIR's hashed tf features, fitted
    // target-vs-rest in ONE distributed pass — the catalog's third
    // TRAINING query (q107/q108 trained a tokenizer; this trains a
    // scorer). Target = five sources (the fixture's sources have
    // genuinely different word distributions; lang does not). The
    // oracle replays the whole fit: rational sigmoid (IEEE-exact — no
    // libm), DECIMAL(38,15) moment sums (order-independent), so both
    // engines derive the same head. Separation is real: target docs'
    // median prob ≈ 0.74 vs rest ≈ 0.23 at sf0.01.
    "q115_quality_classifier" -> Entry(
      // fused fit+score (r16): one pinned feature pass instead of two
      // trainer-class passes plus a scoring pass — bit-identical head
      (s, dir) => QualityFilter.trainLdaAndScore(docsFan(s, dir),
          "doc_id", "text",
          posPred = col("source").isin(QfTargetSources: _*),
          numBuckets = 256)
        .orderBy("doc_id"),
      Some(s"WITH ${qfChainSql(numBuckets = 256)}\n" +
        """SELECT doc_id, n_feats, round(z, 6) AS logit,
          |  round(0.5 * (1 + z / (1 + abs(z))), 6) AS prob
          |FROM sc ORDER BY doc_id""".stripMargin)),

    // ----- X5 classifier gate (q115's model as a corpus filter) -------------
    // The serving form: keep crawl docs the trained head scores
    // target-like (prob ≥ ½ ⇔ closer to the target centroid).
    // classifierGate is a LEFT SEMI join against the corpus-sized
    // keep-list — ids only, no row duplication, no broadcast of a
    // corpus-sized side.
    "q116_classifier_gate" -> Entry(
      // fused fit+gate (r16): one pinned feature pass — see q115
      (s, dir) => QualityFilter.trainLdaAndGate(docsFan(s, dir),
          "doc_id", "text",
          posPred = col("source").isin(QfTargetSources: _*),
          numBuckets = 256, minProb = 0.5)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id"),
      Some(s"WITH ${qfChainSql(numBuckets = 256)}\n" +
        """SELECT d.doc_id, d.source, d.n_chars
          |FROM documents d JOIN sc USING (doc_id)
          |WHERE round(0.5 * (1 + z / (1 + abs(z))), 6) >= 0.5
          |ORDER BY doc_id""".stripMargin)),

    // ----- X-pipe curation v4: gopher gate -> exact dedup -> TRAINED gate ---
    // The FineWeb/LLaMA-era recipe: mechanical cleaning first, then a
    // classifier FITTED ON THE CORPUS BEING CURATED picks the
    // target-like slice. Fixture plants exact copies (doc_id%5 ->
    // +1e6, source inherited) so the dedup stage does real work before
    // training — a copy surviving to the training set would double its
    // text's moment contributions. The oracle replays all three
    // stages: the q109 gopher/dedup SQL (carrying source) feeds the
    // full q115 LDA chain retargeted at the `kept` CTE.
    "q117_curation_classifier" -> Entry(
      (s, dir) => {
        val d = docsFan(s, dir)
          .select(col("doc_id"), col("source"), col("text"))
        val copies = d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            col("source"), col("text"))
        Pipelines.curateWithClassifier(d.union(copies), "doc_id",
            "text", "source", QfTargetSources, minTokens = 50,
            minStopHits = 2, numBuckets = 256, minProb = 0.5)
          .select(col("doc_id"), col("source"), col("n_tokens"))
          .orderBy("doc_id")
      },
      Some {
        val head =
          s"""corp AS (SELECT doc_id, source, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000 AS doc_id, source, text
             |  FROM documents WHERE doc_id % 5 = 0),
             |tok AS (SELECT doc_id, source, text, $TOKS AS w FROM corp),
             |gk AS (SELECT doc_id, source, text,
             |    CAST(len(w) AS BIGINT) AS n_tokens
             |  FROM tok
             |  WHERE text IS NOT NULL AND len(w) >= 50 AND len(w) <= 100000
             |    AND CAST(length(regexp_replace(trim(text), '\\s+', '', 'g'))
             |        AS DOUBLE) / CAST(len(w) AS DOUBLE) >= 3.0
             |    AND CAST(length(regexp_replace(trim(text), '\\s+', '', 'g'))
             |        AS DOUBLE) / CAST(len(w) AS DOUBLE) <= 10.0
             |    AND CAST(len(list_filter(w,
             |        t -> regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)
             |      / CAST(len(w) AS DOUBLE) >= 0.8
             |    AND (CASE WHEN list_contains(w, 'a') THEN 1 ELSE 0 END) +
             |        (CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END) +
             |        (CASE WHEN list_contains(w, 'in') THEN 1 ELSE 0 END) +
             |        (CASE WHEN list_contains(w, 'is') THEN 1 ELSE 0 END) +
             |        (CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END) +
             |        (CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END) +
             |        (CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END)
             |      >= 2),
             |dd AS (SELECT doc_id, source, text, n_tokens,
             |    ROW_NUMBER() OVER (
             |    PARTITION BY md5(regexp_replace(lower(trim(text)),
             |      '\\s+', ' ', 'g'))
             |    ORDER BY doc_id) AS rn FROM gk),
             |kept AS MATERIALIZED (SELECT doc_id, source, text, n_tokens
             |  FROM dd WHERE rn = 1)""".stripMargin
        s"WITH $head,\n${qfChainSql(numBuckets = 256, corpus = "kept")}\n" +
          """SELECT k.doc_id, k.source, k.n_tokens
            |FROM kept k JOIN sc USING (doc_id)
            |WHERE round(0.5 * (1 + z / (1 + abs(z))), 6) >= 0.5
            |ORDER BY doc_id""".stripMargin
      }),

    // ----- X1 corpus snapshot diff ------------------------------------------
    // "What changed between crawl N and N+1": added/removed/changed/
    // unchanged per id, judged by the library's normalized content
    // fingerprint so a reflowed-but-identical doc reads unchanged.
    // Fixture: %7 removed, %5 (not %7) whitespace-reflowed (must read
    // UNCHANGED — the fingerprint point), %3 (neither) genuinely
    // edited, %11 re-idd additions.
    "q118_corpus_diff" -> Entry(
      (s, dir) => {
        val d = docsFan(s, dir).select(col("doc_id"), col("text"))
        val newSnap = d.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 5 === 0,
              concat(lit("  "), regexp_replace(col("text"),
                lit(" "), lit("   "))))
            .when(col("doc_id") % 3 === 0,
              concat(col("text"), lit(" edited marker")))
            .otherwise(col("text")).as("text"))
          .union(d.filter(col("doc_id") % 11 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        Dedup.corpusDiff(d, newSnap, "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("""WITH o AS (SELECT doc_id,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
             |    AS fp, 1 AS in_old FROM documents),
             |ns AS (
             |  SELECT doc_id, CASE
             |    WHEN doc_id % 5 = 0 THEN '  ' ||
             |      regexp_replace(text, ' ', '   ', 'g')
             |    WHEN doc_id % 3 = 0 THEN text || ' edited marker'
             |    ELSE text END AS text
             |  FROM documents WHERE doc_id % 7 <> 0
             |  UNION ALL
             |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
             |  WHERE doc_id % 11 = 0),
             |n AS (SELECT doc_id,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
             |    AS fp, 1 AS in_new FROM ns)
             |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, CASE
             |  WHEN in_old IS NULL THEN 'added'
             |  WHEN in_new IS NULL THEN 'removed'
             |  WHEN o.fp IS NOT DISTINCT FROM n.fp THEN 'unchanged'
             |  ELSE 'changed' END AS status
             |FROM o FULL JOIN n ON o.doc_id = n.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // ----- X5 per-source epoch repeats --------------------------------------
    // The up-weighting half of a training recipe ("Wikipedia x3"):
    // each source's rows emit repeat-many times with an epoch tag for
    // shard-scattering. Pure projection — the repeat table folds into
    // a literal CASE, no join, no shuffle.
    "q119_source_repeats" -> Entry(
      (s, dir) => {
        val d = docsFan(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars"))
        Sampling.repeatBySource(d, "source",
            Map("src0" -> 3, "src1" -> 2, "src2" -> 0))
          .select(col("doc_id"), col("source"),
            col("epoch").cast("long").as("epoch"), col("n_chars"))
          .orderBy("doc_id", "epoch")
      },
      Some("""SELECT doc_id, source, CAST(u.e AS BIGINT) AS epoch,
             |  n_chars
             |FROM documents, unnest(generate_series(0, CASE source
             |  WHEN 'src0' THEN 2 WHEN 'src1' THEN 1
             |  WHEN 'src2' THEN -1 ELSE 0 END)) AS u(e)
             |ORDER BY doc_id, epoch""".stripMargin)),

    // ----- X5 deterministic corpus shuffle key ------------------------------
    // Training wants a GLOBAL reproducible permutation — orderBy(rand())
    // does not survive a task retry, md5 does. Stacked on the epoch
    // repeats so a doc's copies scatter: key = md5('shuffle|id:epoch').
    // The key VALUES prove the cross-engine order; no window, no sort
    // in the entry itself (writeShards does the total-order write).
    "q120_shuffle_key" -> Entry(
      (s, dir) => {
        val d = docsFan(s, dir).select(col("doc_id"), col("source"))
        val rep = Sampling.repeatBySource(d, "source", Map("src0" -> 2))
        Sampling.withShuffleKey(rep,
            concat_ws(":", col("doc_id"), col("epoch")))
          .select(col("doc_id"), col("epoch").cast("long").as("epoch"),
            col("shuffle_key"))
          .orderBy("doc_id", "epoch")
      },
      Some("""SELECT doc_id, CAST(u.e AS BIGINT) AS epoch,
             |  md5('shuffle|' || CAST(doc_id AS VARCHAR) || ':' ||
             |    CAST(u.e AS VARCHAR)) AS shuffle_key
             |FROM documents, unnest(generate_series(0,
             |  CASE source WHEN 'src0' THEN 1 ELSE 0 END)) AS u(e)
             |ORDER BY doc_id, epoch""".stripMargin)),

    // ----- X5 per-source contamination report -------------------------------
    // q65's per-doc verdicts rolled up to the number a pipeline
    // PUBLISHES before training: per source, docs / contaminated docs /
    // fraction / decimal-exact mean overlap vs the benchmark.
    "q121_contamination_report" -> Entry(
      (s, dir) => {
        val docs = docsFan(s, dir)
        Decontaminate.contaminationReport(docs, "doc_id", "text",
            "source", docs.filter(col("doc_id") % 97 === 0), "text",
            shingleN = 5, flagAt = 0.5)
          .orderBy("group")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $TOKS AS w FROM documents),
              |shs AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 5 THEN
              |    [array_to_string(w[i:i+4], ' ')
              |     for i in generate_series(1, len(w)-4)] ELSE [] END) AS sh
              |  FROM toks),
              |-- coalesce: over an EMPTY benchmark, list(DISTINCT s) is
              |-- NULL and would null every ratio; Spark's empty
              |-- broadcast set scores 0.0 per doc — [] agrees
              |bench AS (SELECT coalesce(list(DISTINCT s), []) AS bs
              |  FROM (SELECT unnest(sh) AS s FROM shs WHERE doc_id % 97 = 0)),
              |m AS (SELECT doc_id, len(sh) AS n_sh,
              |    len(list_intersect(sh, bs)) AS n_hit FROM shs, bench),
              |verdicts AS (SELECT doc_id,
              |  CASE WHEN n_sh = 0 THEN 0.0
              |    ELSE CAST(n_hit AS DOUBLE) / CAST(n_sh AS DOUBLE)
              |  END AS ratio FROM m)
              |SELECT d.source AS "group",
              |  COUNT(*) AS n_docs,
              |  CAST(SUM(CASE WHEN ratio >= 0.5 THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_contaminated,
              |  CAST(SUM(CASE WHEN ratio >= 0.5 THEN 1 ELSE 0 END)
              |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS contam_frac,
              |  round(CAST(SUM(CAST(ratio AS DECIMAL(38,15))) AS DOUBLE)
              |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_overlap
              |FROM verdicts v JOIN documents d USING (doc_id)
              |GROUP BY d.source ORDER BY "group"""".stripMargin)),

    // ----- X5 corpus KL drift ----------------------------------------------
    // KL(target || raw) in bits over the hashed-feature models — the
    // one-number text-drift report (PSI q100 watches a numeric column;
    // this watches the text). Target = the en slice, raw = everything:
    // the same fit as q113 reduced to its divergence.
    "q122_corpus_kl" -> Entry(
      (s, dir) => {
        val raw = docsFan(s, dir)
        Dsir.klDivergence(raw, "text",
          raw.filter(col("lang") === "en"), "text", numBuckets = 4096)
      },
      Some("""WITH tk AS (SELECT doc_id, list_filter(
             |    regexp_split_to_array(trim(lower(text)), '\s+'),
             |    x -> length(x) > 0) AS ts FROM documents),
             |feats AS (
             |  SELECT doc_id, u.x AS f FROM tk, unnest(ts) AS u(x)
             |  UNION ALL
             |  SELECT doc_id, ts[g.i] || ' ' || ts[g.i + 1] AS f
             |  FROM tk, unnest(generate_series(1, len(ts) - 1)) AS g(i)),
             |fb AS (SELECT doc_id, CAST(('0x' || substr(md5('dsir|' || f),
             |    1, 8)) AS UBIGINT) % 4096 AS bucket FROM feats),
             |tb AS (SELECT bucket, count(*) AS t_cnt FROM fb
             |  JOIN documents USING (doc_id) WHERE lang = 'en'
             |  GROUP BY 1),
             |rb AS (SELECT bucket, count(*) AS r_cnt FROM fb GROUP BY 1),
             |tot AS (SELECT (SELECT coalesce(sum(t_cnt), 0) FROM tb)
             |    AS t_tot,
             |  (SELECT coalesce(sum(r_cnt), 0) FROM rb) AS r_tot),
             |model AS (SELECT g.b AS bucket,
             |  (coalesce(t_cnt, 0) + 0.5) / (t_tot + 0.5 * 4096) AS p_t,
             |  log2((coalesce(t_cnt, 0) + 0.5) /
             |      (t_tot + 0.5 * 4096)) -
             |  log2((coalesce(r_cnt, 0) + 0.5) /
             |      (r_tot + 0.5 * 4096)) AS llr
             |  FROM generate_series(0, 4095) AS g(b)
             |  LEFT JOIN tb ON tb.bucket = g.b
             |  LEFT JOIN rb ON rb.bucket = g.b
             |  CROSS JOIN tot)
             |SELECT round(CAST(SUM(CAST(p_t * llr AS DECIMAL(38,15)))
             |  AS DOUBLE), 6) AS kl_bits FROM model""".stripMargin)),

    // ----- X2/X5 composed C4 line filter + global line dedup ----------------
    // The actual C4 recipe order (Raffel et al. 2020 §2.2): line-level
    // cleaning first, THEN cross-corpus dedup of surviving lines — as
    // ONE text pass ([[Dedup.dedupLinesC4]]): the C4 predicate runs at
    // the explode, below every exchange, so doomed lines never shuffle.
    // Fixture: the unpunctuated corpus is sentence-lined every 5 words
    // with a terminal '.' (the small vocabulary makes 5-gram lines
    // collide naturally across docs, plus the planted exact copies);
    // the sub-5-word remainder line keeps no period and C4-deletes, so
    // both rules do real work. Strings + integer comparisons only —
    // fully oracle-exact.
    "q123_c4_line_dedup" -> Entry(
      (s, dir) => {
        val lined = dupDocs(s, dir).select(col("doc_id"),
          regexp_replace(col("text"),
            lit("(\\w+ \\w+ \\w+ \\w+ \\w+) "), lit("$1.\n")).as("text"))
        Dedup.dedupLinesC4(lined, "doc_id", "text",
            minLineChars = 10, minLineWords = 3)
          .orderBy("doc_id")
      },
      Some(s"""WITH $DupDocsSql,
              |ld AS (SELECT doc_id, string_split(regexp_replace(text,
              |  '(\\w+ \\w+ \\w+ \\w+ \\w+) ', '\\1.' || chr(10), 'g'),
              |  chr(10)) AS ln FROM docs),
              |l AS (SELECT doc_id, u.i AS pos, ln[u.i] AS line FROM ld,
              |  unnest(generate_series(1, len(ln))) AS u(i)),
              |c AS (SELECT doc_id, pos, line FROM l
              |  WHERE (ends_with(rtrim(line), '.')
              |      OR ends_with(rtrim(line), '!')
              |      OR ends_with(rtrim(line), '?')
              |      OR ends_with(rtrim(line), '"'))
              |    AND len(regexp_split_to_array(trim(line), '\\s+')) >= 3
              |    AND NOT contains(lower(line), 'javascript')),
              |k AS (SELECT doc_id, pos, line FROM c
              |  QUALIFY length(line) < 10
              |    OR ROW_NUMBER() OVER (PARTITION BY line
              |         ORDER BY doc_id, pos) = 1)
              |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos)
              |  AS text
              |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ----- X4 REAL image header decode --------------------------------------
    // Synthesizes structurally-valid JPEG and PNG byte payloads per doc
    // (JPEG: SOI + a variable-length COM segment the marker scan must
    // skip + SOF0 carrying the dims; PNG: signature + IHDR), plus
    // planted malformed blobs, then recovers width/height/channels with
    // Multimodal.parseImageHeader — an actual byte-level parse, not
    // stub arithmetic. The oracle builds the SAME hex image and
    // extracts the dims at the same computed byte offsets (the COM
    // length arithmetic replayed in SQL), nulls for the malformed ids.
    "q124_image_headers" -> Entry(
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents").select(col("doc_id"))
        def hxp(c: org.apache.spark.sql.Column, w: Int) =
          lpad(lower(hex(c)), w, "0")
        val k = (col("doc_id") % 7).cast("int")
        val jw = (lit(160) + col("doc_id") % 480).cast("int")
        val jh = (lit(120) + col("doc_id") % 360).cast("int")
        val ct = when(col("doc_id") % 3 === 0, 0)
          .when(col("doc_id") % 3 === 1, 2).otherwise(6)
        val jpegHex = concat(lit("ffd8fffe"), hxp(k + 2, 4),
          expr("repeat('00', CAST(doc_id % 7 AS INT))"),
          lit("ffc0001108"), hxp(jh, 4), hxp(jw, 4),
          lit("03012200021101031101ffd9"))
        val pngHex = concat(lit("89504e470d0a1a0a0000000d49484452"),
          hxp(jw, 8), hxp(jh, 8), lit("08"), hxp(ct, 2),
          lit("00000000000000"))
        val payloadHex = when(col("doc_id") % 19 === 0, lit("ffd8ff"))
          .when(col("doc_id") % 23 === 0, lit("00112233"))
          .when(col("doc_id") % 2 === 0, jpegHex)
          .otherwise(pngHex)
        val media = d.select(col("doc_id"),
            unhex(payloadHex).as("payload"), lit("image").as("kind"))
          .as[Multimodal.MediaRecord]
        Multimodal.decodeImageHeaders(media).toDF().orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id,
             |  CAST(doc_id % 7 AS INT) AS k,
             |  CAST(160 + doc_id % 480 AS INT) AS jw,
             |  CAST(120 + doc_id % 360 AS INT) AS jh,
             |  CASE WHEN doc_id % 3 = 0 THEN 0
             |       WHEN doc_id % 3 = 1 THEN 2 ELSE 6 END AS ct
             |  FROM documents),
             |hx AS (SELECT doc_id, k, ct,
             |  CASE
             |  WHEN doc_id % 19 = 0 THEN 'ffd8ff'
             |  WHEN doc_id % 23 = 0 THEN '00112233'
             |  WHEN doc_id % 2 = 0 THEN 'ffd8fffe' ||
             |    lpad(lower(to_hex(k + 2)), 4, '0') || repeat('00', k) ||
             |    'ffc0001108' || lpad(lower(to_hex(jh)), 4, '0') ||
             |    lpad(lower(to_hex(jw)), 4, '0') ||
             |    '03012200021101031101ffd9'
             |  ELSE '89504e470d0a1a0a0000000d49484452' ||
             |    lpad(lower(to_hex(jw)), 8, '0') ||
             |    lpad(lower(to_hex(jh)), 8, '0') || '08' ||
             |    lpad(lower(to_hex(ct)), 2, '0') || '00000000000000'
             |  END AS h FROM b)
             |SELECT doc_id,
             |  CASE WHEN doc_id % 19 = 0 OR doc_id % 23 = 0 THEN NULL
             |       WHEN doc_id % 2 = 0 THEN 'jpeg' ELSE 'png' END
             |    AS format,
             |  CASE WHEN doc_id % 19 = 0 OR doc_id % 23 = 0 THEN NULL
             |       WHEN doc_id % 2 = 0 THEN
             |         CAST(('0x' || substr(h, 2*(13+k)+1, 4)) AS INT)
             |       ELSE CAST(('0x' || substr(h, 33, 8)) AS INT) END
             |    AS width,
             |  CASE WHEN doc_id % 19 = 0 OR doc_id % 23 = 0 THEN NULL
             |       WHEN doc_id % 2 = 0 THEN
             |         CAST(('0x' || substr(h, 2*(11+k)+1, 4)) AS INT)
             |       ELSE CAST(('0x' || substr(h, 41, 8)) AS INT) END
             |    AS height,
             |  CASE WHEN doc_id % 19 = 0 OR doc_id % 23 = 0 THEN NULL
             |       WHEN doc_id % 2 = 0 THEN
             |         CAST(('0x' || substr(h, 2*(15+k)+1, 2)) AS INT)
             |       ELSE CASE ct WHEN 0 THEN 1 WHEN 2 THEN 3
             |            ELSE 4 END END AS channels
             |FROM hx ORDER BY doc_id""".stripMargin)),

    // ----- X4 REAL WAV audio header decode ----------------------------------
    // Synthesizes structurally-valid RIFF/WAVE payloads per doc with a
    // variable-length LIST chunk the scan must skip before 'fmt ' and
    // 'data' (all multi-byte fields little-endian, as RIFF mandates),
    // plus planted malformed blobs; Multimodal.parseWavHeader recovers
    // channels/rate/bits/samples by an actual chunk scan. The oracle
    // rebuilds the same hex payload and extracts each LE field by
    // byte-pair reversal at the same computed offsets.
    "q125_audio_headers" -> Entry(
      (s, dir) => {
        import s.implicits._
        def le16(c: org.apache.spark.sql.Column) = {
          val h = lpad(lower(hex(c)), 4, "0")
          concat(substring(h, 3, 2), substring(h, 1, 2))
        }
        def le32(c: org.apache.spark.sql.Column) = {
          val h = lpad(lower(hex(c)), 8, "0")
          concat(substring(h, 7, 2), substring(h, 5, 2),
            substring(h, 3, 2), substring(h, 1, 2))
        }
        val d = t(s, dir, "documents").select(col("doc_id"))
        val lst = (col("doc_id") % 4).cast("int") * 2 // even: no pad byte
        val ch = (lit(1) + col("doc_id") % 2).cast("int")
        val rate = (lit(8000) * (lit(1) + col("doc_id") % 5)).cast("int")
        val bits = when(col("doc_id") % 3 === 0, 8).otherwise(16)
        val ba = (ch * bits / 8).cast("int")
        val nsamp = (lit(1000) + col("doc_id") % 9000).cast("int")
        val dataSize = (nsamp * ba).cast("int")
        val wavHex = concat(lit("52494646"),
          le32(lit(44) + lst + dataSize), lit("57415645"),
          lit("4c495354"), le32(lst),
          expr("repeat('00', CAST((doc_id % 4) * 2 AS INT))"),
          lit("666d7420"), le32(lit(16)), le16(lit(1)), le16(ch),
          le32(rate), le32(rate * ba), le16(ba), le16(bits),
          lit("64617461"), le32(dataSize))
        val payloadHex = when(col("doc_id") % 19 === 0, lit("52494646"))
          .when(col("doc_id") % 23 === 0,
            lit("524946462400000041564920")) // RIFF size then 'AVI '
          .otherwise(wavHex)
        val media = d.select(col("doc_id"),
            unhex(payloadHex).as("payload"), lit("audio").as("kind"))
          .as[Multimodal.MediaRecord]
        Multimodal.decodeAudioHeaders(media).toDF().orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id,
             |  CAST((doc_id % 4) * 2 AS INT) AS lst,
             |  CAST(1 + doc_id % 2 AS INT) AS ch,
             |  CAST(8000 * (1 + doc_id % 5) AS INT) AS rate,
             |  CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits
             |  FROM documents),
             |c AS (SELECT *, CAST(ch * bits / 8 AS INT) AS ba,
             |  CAST(1000 + doc_id % 9000 AS INT) AS nsamp FROM b),
             |hx AS (SELECT doc_id, lst, CASE
             |  WHEN doc_id % 19 = 0 THEN '52494646'
             |  WHEN doc_id % 23 = 0 THEN '524946462400000041564920'
             |  ELSE '52494646' ||
             |    substr(lpad(lower(to_hex(44 + lst + nsamp * ba)), 8,
             |      '0'), 7, 2) ||
             |    substr(lpad(lower(to_hex(44 + lst + nsamp * ba)), 8,
             |      '0'), 5, 2) ||
             |    substr(lpad(lower(to_hex(44 + lst + nsamp * ba)), 8,
             |      '0'), 3, 2) ||
             |    substr(lpad(lower(to_hex(44 + lst + nsamp * ba)), 8,
             |      '0'), 1, 2) ||
             |    '57415645' || '4c495354' ||
             |    substr(lpad(lower(to_hex(lst)), 8, '0'), 7, 2) ||
             |    substr(lpad(lower(to_hex(lst)), 8, '0'), 5, 2) ||
             |    substr(lpad(lower(to_hex(lst)), 8, '0'), 3, 2) ||
             |    substr(lpad(lower(to_hex(lst)), 8, '0'), 1, 2) ||
             |    repeat('00', lst) || '666d7420' || '10000000' ||
             |    '0100' ||
             |    substr(lpad(lower(to_hex(ch)), 4, '0'), 3, 2) ||
             |    substr(lpad(lower(to_hex(ch)), 4, '0'), 1, 2) ||
             |    substr(lpad(lower(to_hex(rate)), 8, '0'), 7, 2) ||
             |    substr(lpad(lower(to_hex(rate)), 8, '0'), 5, 2) ||
             |    substr(lpad(lower(to_hex(rate)), 8, '0'), 3, 2) ||
             |    substr(lpad(lower(to_hex(rate)), 8, '0'), 1, 2) ||
             |    substr(lpad(lower(to_hex(rate * ba)), 8, '0'), 7, 2) ||
             |    substr(lpad(lower(to_hex(rate * ba)), 8, '0'), 5, 2) ||
             |    substr(lpad(lower(to_hex(rate * ba)), 8, '0'), 3, 2) ||
             |    substr(lpad(lower(to_hex(rate * ba)), 8, '0'), 1, 2) ||
             |    substr(lpad(lower(to_hex(ba)), 4, '0'), 3, 2) ||
             |    substr(lpad(lower(to_hex(ba)), 4, '0'), 1, 2) ||
             |    substr(lpad(lower(to_hex(bits)), 4, '0'), 3, 2) ||
             |    substr(lpad(lower(to_hex(bits)), 4, '0'), 1, 2) ||
             |    '64617461' ||
             |    substr(lpad(lower(to_hex(nsamp * ba)), 8, '0'), 7, 2) ||
             |    substr(lpad(lower(to_hex(nsamp * ba)), 8, '0'), 5, 2) ||
             |    substr(lpad(lower(to_hex(nsamp * ba)), 8, '0'), 3, 2) ||
             |    substr(lpad(lower(to_hex(nsamp * ba)), 8, '0'), 1, 2)
             |  END AS h FROM c),
             |-- extract each LE field back out of the hex payload at the
             |-- LIST-shifted offsets (fmt chunk starts at byte 20+lst)
             |ex AS (SELECT doc_id, lst, h,
             |  2*(20 + lst) + 1 AS fb -- hex char pos of 'fmt ' chunk id
             |  FROM hx)
             |SELECT doc_id,
             |  CASE WHEN doc_id % 19 = 0 OR doc_id % 23 = 0 THEN NULL
             |       ELSE 'wav' END AS format,
             |  CASE WHEN doc_id % 19 = 0 OR doc_id % 23 = 0 THEN NULL
             |  ELSE CAST(('0x' || substr(h, fb + 2*10 + 2, 2) ||
             |    substr(h, fb + 2*10, 2)) AS INT) END AS channels,
             |  CASE WHEN doc_id % 19 = 0 OR doc_id % 23 = 0 THEN NULL
             |  ELSE CAST(('0x' || substr(h, fb + 2*12 + 6, 2) ||
             |    substr(h, fb + 2*12 + 4, 2) || substr(h, fb + 2*12 + 2, 2)
             |    || substr(h, fb + 2*12, 2)) AS INT) END AS sample_rate,
             |  CASE WHEN doc_id % 19 = 0 OR doc_id % 23 = 0 THEN NULL
             |  ELSE CAST(('0x' || substr(h, fb + 2*22 + 2, 2) ||
             |    substr(h, fb + 2*22, 2)) AS INT) END AS bits_per_sample,
             |  CASE WHEN doc_id % 19 = 0 OR doc_id % 23 = 0 THEN NULL
             |  ELSE CAST(CAST(('0x' || substr(h, fb + 2*28 + 6, 2) ||
             |    substr(h, fb + 2*28 + 4, 2) || substr(h, fb + 2*28 + 2, 2)
             |    || substr(h, fb + 2*28, 2)) AS BIGINT) //
             |    CAST(('0x' || substr(h, fb + 2*20 + 2, 2) ||
             |      substr(h, fb + 2*20, 2)) AS BIGINT) AS BIGINT)
             |  END AS n_samples
             |FROM ex ORDER BY doc_id""".stripMargin)),

    // ----- X5 BM25 retrieval-based data selection ---------------------------
    // Okapi BM25 of every doc against a seed-term set — the lexical
    // "find my domain in the crawl" selector (sparse sibling of the
    // embedding top-k and the trained heads). Per-term double scores
    // carry libm log2, so the oracle replays the identical arithmetic
    // and both engines sum the terms through DECIMAL(38,15) (order-
    // exact) before the 6-digit round.
    "q126_bm25_selection" -> Entry(
      (s, dir) => {
        Vocab.bm25Scores(docsFan(s, dir), "doc_id", "text",
            Seq("spark", "window", "stream", "query"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, list_filter(
             |    regexp_split_to_array(trim(lower(text)), '\s+'),
             |    x -> length(x) > 0) AS ts FROM documents),
             |lens AS (SELECT doc_id, len(ts) AS dl FROM tk
             |  WHERE ts IS NOT NULL),
             |st AS (SELECT COUNT(*) AS n_docs,
             |  SUM(CAST(dl AS DECIMAL(38,15))) AS sum_dl FROM lens),
             |dt AS (SELECT doc_id, u.x AS term, COUNT(*) AS tf
             |  FROM tk, unnest(ts) AS u(x)
             |  WHERE u.x IN ('spark', 'window', 'stream', 'query')
             |  GROUP BY 1, 2),
             |dfx AS (SELECT term, COUNT(*) AS dfc FROM dt GROUP BY 1),
             |sc AS (SELECT dt.doc_id, dt.tf, dfx.dfc, lens.dl
             |  FROM dt JOIN dfx USING (term) JOIN lens USING (doc_id))
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
             |  round(CAST(SUM(CAST(
             |    log2(1 + (n_docs - dfc + 0.5) / (dfc + 0.5)) *
             |    (tf * (1.2 + 1.0)) /
             |    (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl /
             |      (CAST(sum_dl AS DOUBLE) / n_docs)))
             |    AS DECIMAL(38,15))) AS DOUBLE), 6) AS bm25
             |FROM sc CROSS JOIN st
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ----- X5 T5 span corruption --------------------------------------------
    // Deterministic masked (input, target) pretraining pairs: position
    // p opens a span iff md5('t5'|id|p) % 20 == 0, spans cover 3
    // tokens and merge when adjacent — the T5 (15%, mean-3) knobs with
    // the hash standing in for the paper's RNG. The oracle recomputes
    // the start flags, the windowed-OR mask, the run starts, and both
    // sentinel texts with list comprehensions over the same hashes;
    // Spark builds them with one O(n) aggregate fold — identical
    // strings either way.
    "q127_span_corrupt" -> Entry(
      (s, dir) => {
        TextAnalysis.spanCorrupt(docsFan(s, dir), "doc_id", "text",
            startEvery = 20, spanLen = 3, salt = "t5")
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, text, CASE WHEN text IS NULL
             |  THEN [] ELSE list_filter(regexp_split_to_array(trim(text),
             |    '\s+'), x -> length(x) > 0) END AS ts FROM documents),
             |nn AS (SELECT doc_id, text, ts, len(ts) AS n FROM tk),
             |st AS (SELECT *, [CAST(('0x' || substr(md5('t5|' || doc_id
             |    || '|' || i), 1, 8)) AS UBIGINT) % 20 = 0
             |  for i in generate_series(1, n)] AS s FROM nn),
             |mk AS (SELECT *, [(s[i] OR (i >= 2 AND s[i-1])
             |    OR (i >= 3 AND s[i-2]))
             |  for i in generate_series(1, n)] AS m FROM st),
             |rr AS (SELECT *, [(m[i] AND (i = 1 OR NOT m[i-1]))
             |  for i in generate_series(1, n)] AS r FROM mk),
             |px AS (SELECT *,
             |  [CASE WHEN r[i] THEN '<extra_id_' ||
             |      CAST(len(list_filter(generate_series(1, i-1),
             |        q -> r[q])) AS VARCHAR) || '>'
             |    WHEN m[i] THEN NULL ELSE ts[i] END
             |   for i in generate_series(1, n)] AS inp,
             |  [CASE WHEN r[i] THEN '<extra_id_' ||
             |      CAST(len(list_filter(generate_series(1, i-1),
             |        q -> r[q])) AS VARCHAR) || '> ' || ts[i]
             |    WHEN m[i] THEN ts[i] ELSE NULL END
             |   for i in generate_series(1, n)] AS tgt FROM rr)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             |  CAST(len(list_filter(m, x -> x)) AS BIGINT) AS n_masked,
             |  CAST(len(list_filter(r, x -> x)) AS BIGINT) AS n_spans,
             |  CASE WHEN text IS NULL THEN NULL ELSE coalesce(
             |    array_to_string(list_filter(inp, p -> p IS NOT NULL),
             |      ' '), '') END AS input_text,
             |  CASE WHEN text IS NULL THEN NULL ELSE coalesce(
             |    array_to_string(list_filter(tgt, p -> p IS NOT NULL),
             |      ' '), '') END AS target_text
             |FROM px ORDER BY doc_id""".stripMargin)),

    // ----- X5 prefix-LM split (UL2 S-denoiser) ------------------------------
    // Deterministic continuation pairs: split at minPrefix +
    // md5('plm'|id) % (n - minPrefix), both sides non-empty. Strings +
    // integer arithmetic only — fully oracle-exact.
    "q128_prefix_lm" -> Entry(
      (s, dir) => {
        TextAnalysis.prefixLmSplit(docsFan(s, dir), "doc_id", "text",
            minPrefix = 1, salt = "plm")
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, list_filter(
             |    regexp_split_to_array(trim(text), '\s+'),
             |    x -> length(x) > 0) AS ts FROM documents),
             |nn AS (SELECT doc_id, ts, len(ts) AS n FROM tk
             |  WHERE len(ts) > 1),
             |sp AS (SELECT doc_id, ts, n, 1 +
             |  CAST(('0x' || substr(md5('plm|' || doc_id), 1, 8))
             |    AS UBIGINT) % (n - 1) AS p FROM nn)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             |  CAST(p AS BIGINT) AS split_pos,
             |  array_to_string(ts[1:p], ' ') AS input_text,
             |  array_to_string(ts[p+1:n], ' ') AS target_text
             |FROM sp ORDER BY doc_id""".stripMargin)),

    // ----- X3/X5 hybrid retrieval: reciprocal-rank fusion -------------------
    // BM25 lexical top-100 fused with dense cosine top-100 (query =
    // vec 0) by RRF — rank-based, so no score calibration; each rrf
    // term is one IEEE division and the two-term sum is fixed-order,
    // so the fused scores are engine-bit-exact with NO rounding.
    "q129_hybrid_rrf" -> Entry(
      (s, dir) => {
        val a = Vocab.bm25TopK(docsFan(s, dir), "doc_id", "text",
          Seq("spark", "window", "stream", "query"), k = 100)
        val emb = t(s, dir, "embeddings")
        val bcos = Similarity.cosineTopK(emb.filter(col("vec_id") === 0),
            emb, "vec_id", "embedding", k = 100)
          .select(col("corpus_id"), col("rank"))
        Similarity.rrfFuse(a, "doc_id", "rank", bcos, "corpus_id", "rank")
          .orderBy("fused_rank")
      },
      Some("""WITH tk AS (SELECT doc_id, list_filter(
             |    regexp_split_to_array(trim(lower(text)), '\s+'),
             |    x -> length(x) > 0) AS ts FROM documents),
             |lens AS (SELECT doc_id, len(ts) AS dl FROM tk
             |  WHERE ts IS NOT NULL),
             |st AS (SELECT COUNT(*) AS n_docs,
             |  SUM(CAST(dl AS DECIMAL(38,15))) AS sum_dl FROM lens),
             |dt AS (SELECT doc_id, u.x AS term, COUNT(*) AS tf
             |  FROM tk, unnest(ts) AS u(x)
             |  WHERE u.x IN ('spark', 'window', 'stream', 'query')
             |  GROUP BY 1, 2),
             |dfx AS (SELECT term, COUNT(*) AS dfc FROM dt GROUP BY 1),
             |sc AS (SELECT dt.doc_id, dt.tf, dfx.dfc, lens.dl
             |  FROM dt JOIN dfx USING (term) JOIN lens USING (doc_id)),
             |bm AS (SELECT doc_id,
             |  round(CAST(SUM(CAST(
             |    log2(1 + (n_docs - dfc + 0.5) / (dfc + 0.5)) *
             |    (tf * (1.2 + 1.0)) /
             |    (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl /
             |      (CAST(sum_dl AS DOUBLE) / n_docs)))
             |    AS DECIMAL(38,15))) AS DOUBLE), 6) AS bm25
             |  FROM sc CROSS JOIN st GROUP BY doc_id),
             |la AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
             |    ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank_a
             |  FROM bm ORDER BY bm25 DESC, doc_id LIMIT 100),
             |q AS (SELECT embedding AS qv FROM embeddings
             |  WHERE vec_id = 0),
             |cs AS (SELECT vec_id AS doc_id,
             |  round(
             |    list_sum([qv[i]::DOUBLE * embedding[i]::DOUBLE
             |      for i in generate_series(1, len(qv))]) /
             |    (sqrt(list_sum([qv[i]::DOUBLE * qv[i]::DOUBLE
             |      for i in generate_series(1, len(qv))])) *
             |     sqrt(list_sum([embedding[i]::DOUBLE *
             |        embedding[i]::DOUBLE
             |      for i in generate_series(1, len(embedding))]))), 6)
             |    AS score
             |  FROM embeddings, q WHERE vec_id <> 0),
             |lb AS (SELECT doc_id, rank_b FROM (SELECT doc_id,
             |    CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
             |      AS BIGINT) AS rank_b FROM cs)
             |  WHERE rank_b <= 100),
             |fused AS (SELECT coalesce(la.doc_id, lb.doc_id) AS doc_id,
             |  rank_a, rank_b,
             |  coalesce(1.0 / (CAST(60 AS DOUBLE) + CAST(rank_a
             |    AS DOUBLE)), 0.0) +
             |  coalesce(1.0 / (CAST(60 AS DOUBLE) + CAST(rank_b
             |    AS DOUBLE)), 0.0) AS rrf
             |  FROM la FULL OUTER JOIN lb ON la.doc_id = lb.doc_id)
             |SELECT doc_id, rank_a, rank_b, rrf,
             |  CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id)
             |    AS BIGINT) AS fused_rank
             |FROM fused ORDER BY fused_rank""".stripMargin)),

    // ----- X5 TRAINED language ID (char n-grams through the LDA head) -------
    // withCharGrams re-texts each doc as its char trigrams, so the
    // EXISTING word-feature training stack becomes a fastText-style
    // character-feature classifier with zero new model machinery —
    // trained en-vs-rest on the corpus itself, served by the same
    // scoreWith. The oracle re-texts identically and replays the full
    // LDA chain over the char-gram corpus with lang='en' as the
    // positive predicate.
    "q130_trained_langid" -> Entry(
      (s, dir) => {
        // fused fit+score (r16): the char-gram projection and the md5
        // feature explode run ONCE (pinned) instead of per trainer
        // class plus scoring — bit-identical head
        val cg = TextAnalysis.withCharGrams(docsFan(s, dir), "text",
          "cg_text", n = 3)
        QualityFilter.trainLdaAndScore(cg, "doc_id", "cg_text",
            posPred = col("lang") === "en", numBuckets = 256)
          .orderBy("doc_id")
      },
      Some {
        val cgSql =
          """cgn AS (SELECT doc_id, lang, regexp_replace(lower(trim(
            |    text)), '\s+', '_', 'g') AS nrm FROM documents),
            |cg AS MATERIALIZED (SELECT doc_id, lang,
            |  CASE WHEN nrm IS NULL THEN NULL ELSE coalesce(
            |    array_to_string([substr(nrm, i, 3)
            |      for i in generate_series(1, length(nrm) - 2)], ' '),
            |    '') END AS text
            |  FROM cgn)""".stripMargin
        s"WITH $cgSql,\n" +
          s"${qfChainSql(numBuckets = 256, corpus = "cg",
            posPred = Some("lang = 'en'"))}\n" +
          """SELECT doc_id, n_feats, round(z, 6) AS logit,
            |  round(0.5 * (1 + z / (1 + abs(z))), 6) AS prob
            |FROM sc ORDER BY doc_id""".stripMargin
      }),

    // ----- X2 paragraph-level FUZZY global dedup ----------------------------
    // The tier between exact line dedup (q110) and document near-dup:
    // boilerplate BLOCKS repeated with small edits. Paragraphs (8-word
    // lined fixture over the planted near-copy corpus) run the full
    // exact stage (min-pid representative per distinct paragraph,
    // partial-agg skew-safe) then the MinHash->LSH->exact-Jaccard flow
    // over distinct representatives; later family members are removed
    // in place. The oracle replays both stages.
    "q131_para_fuzzy_dedup" -> Entry(
      (s, dir) => {
        val lined = nearDupDocs(s, dir).select(col("doc_id"),
          regexp_replace(col("text"), lit("((\\w+ ){7}\\w+) "),
            lit("$1\n\n")).as("text"))
        Dedup.dedupParagraphsFuzzy(lined, "doc_id", "text",
            threshold = 0.6, minParaTokens = 5)
          .orderBy("doc_id")
      },
      Some {
        val mins = (0 until 8)
          .map(i => s"min(md5('$i|' || s)) AS m$i").mkString(", ")
        val bands = (0 until 4).map(b =>
          s"SELECT doc_id, $b AS band, md5(m${2 * b} || m${2 * b + 1})" +
            s" AS bv FROM sigq").mkString(" UNION ALL ")
        s"""WITH $NearDupDocsSql,
           |pd AS (SELECT doc_id, string_split(regexp_replace(text,
           |  '((\\w+ ){7}\\w+) ', '\\1' || chr(10) || chr(10), 'g'),
           |  chr(10) || chr(10)) AS ps FROM docs),
           |pr AS (SELECT doc_id AS did, u.i - 1 AS pos, ps[u.i] AS para
           |  FROM pd, unnest(generate_series(1, len(ps))) AS u(i)),
           |pp AS (SELECT did * 1048576 + pos AS pid, did, pos, para
           |  FROM pr),
           |cand AS (SELECT pid, para FROM pp
           |  WHERE len(list_filter(regexp_split_to_array(trim(para),
           |    '\\s+'), x -> length(x) > 0)) >= 5),
           |-- exact stage: min-pid representative per distinct paragraph
           |reps AS (SELECT min(pid) AS doc_id, para AS text FROM cand
           |  GROUP BY para),
           |toksq AS (SELECT doc_id,
           |  regexp_split_to_array(trim(text), '\\s+') AS w FROM reps),
           |shq AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
           |  FROM toksq, unnest(CASE WHEN len(w) >= 3
           |    THEN generate_series(1, len(w)-2) ELSE [] END) AS u(i)),
           |sigq AS (SELECT doc_id, $mins FROM shq GROUP BY doc_id),
           |bandsq AS ($bands),
           |candsq AS (SELECT DISTINCT a.doc_id AS doc_a,
           |    b.doc_id AS doc_b
           |  FROM bandsq a JOIN bandsq b
           |    ON a.band = b.band AND a.bv = b.bv
           |    AND a.doc_id < b.doc_id),
           |setsq AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
           |  THEN [array_to_string(w[i:i+2], ' ')
           |    for i in generate_series(1, len(w)-2)] ELSE [] END) AS sh
           |  FROM toksq),
           |dropp AS (SELECT DISTINCT doc_b AS pid FROM candsq
           |  JOIN setsq sa ON candsq.doc_a = sa.doc_id
           |  JOIN setsq sb ON candsq.doc_b = sb.doc_id
           |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
           |    (CAST(len(sa.sh) AS DOUBLE) + CAST(len(sb.sh) AS DOUBLE)
           |     - CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE))
           |    >= 0.6),
           |keeprep AS (SELECT doc_id AS pid FROM reps
           |  WHERE doc_id NOT IN (SELECT pid FROM dropp)),
           |keep AS (SELECT did, pos, para FROM pp
           |  WHERE pid IN (SELECT pid FROM keeprep)
           |    OR len(list_filter(regexp_split_to_array(trim(para),
           |      '\\s+'), x -> length(x) > 0)) < 5)
           |SELECT did AS doc_id,
           |  string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text
           |FROM keep GROUP BY did ORDER BY doc_id""".stripMargin
      }),

    // ----- X-pipe UL2 mixture of denoisers ----------------------------------
    // Tay et al. 2022: every doc routes deterministically (splitBucket
    // 2:1:1) to regular span corruption, extreme span corruption, or a
    // prefix-LM pair. Three zero-exchange projection branches over one
    // corpus; the oracle replays the router and all three generator
    // chains (the span chain twice at different knobs).
    "q132_ul2_mixture" -> Entry(
      (s, dir) => {
        Pipelines.denoisingMixture(docsFan(s, dir), "doc_id", "text")
          .orderBy("objective", "doc_id")
      },
      Some {
        val rChain = spanPairChainSql("_r", "rsrc", "ul2-r", 20, 3)
        val xChain = spanPairChainSql("_x", "xsrc", "ul2-x", 8, 4)
        s"""WITH rt AS (SELECT doc_id, text,
           |  CASE WHEN h < 2 THEN 0 WHEN h < 3 THEN 1 ELSE 2 END AS obj
           |  FROM (SELECT doc_id, text,
           |    CAST(('0x' || substr(md5('ul2|' || doc_id), 1, 8))
           |      AS UBIGINT) % 4 AS h FROM documents)),
           |rsrc AS (SELECT doc_id, text FROM rt WHERE obj = 0),
           |xsrc AS (SELECT doc_id, text FROM rt WHERE obj = 1),
           |ssrc AS (SELECT doc_id, text FROM rt WHERE obj = 2),
           |$rChain,
           |$xChain,
           |stk AS (SELECT doc_id, list_filter(
           |    regexp_split_to_array(trim(text), '\\s+'),
           |    x -> length(x) > 0) AS ts FROM ssrc),
           |snn AS (SELECT doc_id, ts, len(ts) AS n FROM stk
           |  WHERE len(ts) > 1),
           |ssp AS (SELECT doc_id, ts, n, 1 +
           |  CAST(('0x' || substr(md5('ul2-s|' || doc_id), 1, 8))
           |    AS UBIGINT) % (n - 1) AS p FROM snn)
           |SELECT doc_id, 'r' AS objective, input_text, target_text
           |  FROM out_r WHERE n > 0
           |UNION ALL
           |SELECT doc_id, 'x' AS objective, input_text, target_text
           |  FROM out_x WHERE n > 0
           |UNION ALL
           |SELECT doc_id, 's' AS objective,
           |  array_to_string(ts[1:p], ' ') AS input_text,
           |  array_to_string(ts[p+1:n], ' ') AS target_text
           |FROM ssp
           |ORDER BY objective, doc_id""".stripMargin
      }),

    // ----- X5 corpus data card ----------------------------------------------
    // The per-slice composition report (Datasheets practice; the
    // number tables in the Pile/RedPajama/FineWeb papers): ROLLUP over
    // (source, lang) — every prefix plus the grand total — in ONE
    // aggregation. Integer counts/sums + one rounded division.
    "q133_data_card" -> Entry(
      (s, dir) => {
        Profiles.dataCard(t(s, dir, "documents"), "text",
            Seq("source", "lang"))
          .orderBy(col("source").asc_nulls_first,
            col("lang").asc_nulls_first)
      },
      Some("""WITH tk AS (SELECT source, lang,
             |  CASE WHEN text IS NULL THEN 0 ELSE
             |    len(list_filter(regexp_split_to_array(trim(text),
             |      '\s+'), x -> length(x) > 0)) END AS ntok,
             |  coalesce(length(text), 0) AS nch,
             |  CASE WHEN text IS NULL THEN 1 ELSE 0 END AS nultx
             |  FROM documents)
             |SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
             |  CAST(SUM(nch) AS BIGINT) AS n_chars,
             |  CAST(SUM(nultx) AS BIGINT) AS n_null_text,
             |  round(CAST(SUM(ntok) AS DOUBLE) / COUNT(*), 6)
             |    AS mean_tokens
             |FROM tk GROUP BY ROLLUP (source, lang)
             |ORDER BY source NULLS FIRST, lang NULLS FIRST""".stripMargin)),

    // ----- semi-structured: JSON property extraction ------------------------
    // events.props is a JSON string column (the universal event-stream
    // pattern). Spark parses it with a SCHEMA'D from_json — typed
    // struct at the scan, codegen'd, no UDF — then aggregates per
    // event type. The oracle extracts the same integer with a regex
    // (equivalent on integer-valued fields and engine-exact, no JSON
    // extension dependency). Ints + one rounded division.
    "q134_json_props" -> Entry(
      (s, dir) => {
        Queries.events(s, dir)
          .select(col("event_type"),
            from_json(col("props"), "k INT", Map.empty[String, String])
              .getField("k").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(col("k")).cast("long").as("sum_k"),
            round(sum(col("k")).cast("double") /
              count(col("k")).cast("double"), 6).as("mean_k"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1)
             |    AS INT)) AS BIGINT) AS sum_k,
             |  round(CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)',
             |    1) AS INT)) AS DOUBLE) /
             |    COUNT(CAST(regexp_extract(props, '"k": (\d+)', 1)
             |      AS INT)), 6) AS mean_k
             |FROM events GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ----- event analytics: ordered funnel ----------------------------------
    // view -> click -> purchase greedy-earliest completion per user
    // (strictly increasing times; ties don't advance). The Spark side
    // is ONE user-keyed exchange + a sorted per-user fold; the oracle
    // is the equivalent stepwise-min construction (greedy-earliest ==
    // stepwise min over strictly-later events). µs epoch both sides.
    "q135_funnel" -> Entry(
      (s, dir) => {
        val ev = Queries.events(s, dir)
          .select(col("user_id"), col("event_type"),
            expr("ts div 1000").as("t"))
        Funnel.funnel(ev, "user_id", "t", "event_type",
            Seq("view", "click", "purchase"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t
             |  FROM events),
             |s1 AS (SELECT user_id, min(t) AS t1 FROM e
             |  WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(t) AS t2 FROM e
             |  JOIN s1 USING (user_id)
             |  WHERE event_type = 'click' AND t > t1 GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(t) AS t3 FROM e
             |  JOIN s2 USING (user_id)
             |  WHERE event_type = 'purchase' AND t > t2 GROUP BY 1),
             |u AS (SELECT DISTINCT user_id FROM e)
             |SELECT u.user_id,
             |  CAST(CASE WHEN t3 IS NOT NULL THEN 3
             |    WHEN t2 IS NOT NULL THEN 2
             |    WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             |    AS reached,
             |  t1 AS t_view, t2 AS t_click, t3 AS t_purchase
             |FROM u LEFT JOIN s1 USING (user_id)
             |  LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
             |ORDER BY user_id""".stripMargin)),

    // ----- event analytics: retention cohorts -------------------------------
    // Cohort = day of first event; each later active day counts the
    // user at its offset. One user-keyed aggregation carrying min +
    // the distinct-day set, then one (cohort, offset) count — no
    // joins, no second event-log scan. Pure integer arithmetic.
    "q136_retention_cohorts" -> Entry(
      (s, dir) => {
        val ev = Queries.events(s, dir)
          .select(col("user_id"), expr("ts div 1000").as("t"))
        Funnel.retentionCohorts(ev, "user_id", "t",
            periodLen = 86400000000L) // µs per day
          .orderBy("cohort", "period_offset")
      },
      Some("""WITH e AS (SELECT user_id,
             |  epoch_us(ts) // 86400000000 AS p FROM events),
             |c AS (SELECT user_id, min(p) AS cohort,
             |  list_distinct(list(p)) AS days FROM e GROUP BY 1),
             |a AS (SELECT cohort, u.d - cohort AS period_offset
             |  FROM c, unnest(days) AS u(d))
             |SELECT cohort, period_offset,
             |  CAST(COUNT(*) AS BIGINT) AS n_users
             |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ----- incremental corpus: latest-wins upsert merge ---------------------
    // MERGE semantics without a table format: accumulated corpus +
    // update batch -> one row per id, highest version wins, new side
    // wins ties. Fixture: every %7 doc re-crawled at version 2
    // (uppercased), every %11 doc brand-new at +1e6. One id-keyed
    // struct-max aggregation; the oracle is the equivalent
    // row_number-over-(ver, side) pick.
    "q137_upsert_latest" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val oldDf = d.withColumn("ver", lit(1L))
        val newDf = d.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), upper(col("text")).as("text"),
            lit(2L).as("ver"))
          .unionByName(d.filter(col("doc_id") % 11 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              col("text"), lit(2L).as("ver")))
        Dedup.upsertLatest(oldDf, newDf, "doc_id", "ver")
          .orderBy("doc_id")
      },
      Some("""WITH oldd AS (SELECT doc_id, text, CAST(1 AS BIGINT)
             |    AS ver, 0 AS src FROM documents),
             |newd AS (SELECT doc_id, upper(text) AS text,
             |    CAST(2 AS BIGINT) AS ver, 1 AS src FROM documents
             |  WHERE doc_id % 7 = 0
             |  UNION ALL
             |  SELECT doc_id + 1000000, text, CAST(2 AS BIGINT), 1
             |  FROM documents WHERE doc_id % 11 = 0),
             |u AS (SELECT * FROM oldd UNION ALL SELECT * FROM newd)
             |SELECT doc_id, text, ver FROM u
             |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
             |  ORDER BY ver DESC, src DESC) = 1
             |ORDER BY doc_id""".stripMargin)),

    // ----- scalable global ordering: curriculum ntile + global rank --------
    // Both pin Rank's range-partitioned decomposition bit-exactly
    // against DuckDB's true single-window NTILE / ROW_NUMBER: the
    // distributed rank must agree with the sequential definition on
    // every row. (doc_id tiebreak makes the order total, so the
    // comparison is deterministic.)
    "q138_curriculum_ntile" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        Rank.globalNtile(d, Seq(col("n_tokens").asc, col("doc_id").asc),
            n = 4)
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, CAST(len($TOKS) AS BIGINT) AS n_tokens,
              |CAST(NTILE(4) OVER (ORDER BY CAST(len($TOKS) AS BIGINT),
              |  doc_id) AS INT) AS stage
              |FROM documents ORDER BY doc_id""".stripMargin)),

    "q139_global_rank" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"),
          col("n_chars"))
        Rank.globalRank(d,
            Seq(col("n_chars").desc, col("doc_id").asc), "rk")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_chars,
             |CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)
             |  AS BIGINT) AS rk
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ----- metadata-only ops: footer row count ------------------------------
    // The count comes from parquet footers alone (one ~KB ranged read
    // per file, fanned out as a Spark job) — zero data pages touched.
    // The oracle's count(*) scans; both must land on the same number.
    "q140_footer_count" -> Entry(
      (s, dir) => FooterStats.totalRows(s, s"$dir/lineitem.parquet"),
      Some("SELECT CAST(count(*) AS BIGINT) AS total_rows FROM lineitem")),

    // ----- mergeable sketches: per-source distinct audit --------------------
    // The corpus is unioned with itself so distinct != count. est_ok
    // pins the HLL estimate within 5% of exact THROUGH the oracle
    // hash-compare (the sketch fold is deterministic, so the boolean
    // is a stable value, and DuckDB replays exact + literal true).
    "q141_hll_audit" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("source"), col("doc_id"))
        Sketches.distinctAudit(d.unionByName(d), col("source"),
            col("doc_id"))
          .withColumnRenamed("group", "source")
          .orderBy("source")
      },
      Some("""WITH u AS (SELECT source, doc_id FROM documents
             |  UNION ALL SELECT source, doc_id FROM documents)
             |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT)
             |  AS n_exact, true AS est_ok
             |FROM u GROUP BY source ORDER BY source""".stripMargin)),

    // ----- X4 REAL MP4/ISO-BMFF video header decode -------------------------
    // Synthesizes structurally-valid MP4 box trees per doc: ftyp, a
    // variable-length free box the top-level scan must skip, moov with
    // v0 mvhd (timescale/duration) and one-or-two trak/tkhd children
    // (audio-only files keep metadata but surface null dimensions),
    // plus planted malformed blobs. Multimodal.parseMp4Header recovers
    // brand/timescale/duration/tracks/dims by an actual box-tree walk.
    // The oracle rebuilds the same hex payload and extracts every BE
    // field at its k-shifted byte offset, proving the layout
    // arithmetic, then replays duration_ms = units·1000/timescale in
    // integer math.
    "q142_video_headers" -> Entry(
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents").select(col("doc_id"))
        def hxp(c: org.apache.spark.sql.Column, w: Int) =
          lpad(lower(hex(c)), w, "0")
        val k = (col("doc_id") % 7).cast("int")
        val ts = (lit(600) + col("doc_id") % 1000).cast("long")
        val dur = (lit(1000) + col("doc_id") % 100000).cast("long")
        val w = (lit(160) + col("doc_id") % 480).cast("int")
        val h = (lit(120) + col("doc_id") % 360).cast("int")
        val freeHex = concat(hxp(k + 8, 8), lit("66726565"),
          expr("repeat('00', CAST(doc_id % 7 AS INT))"))
        val mvhdHex = concat(lit(Mp4MvhdPre), hxp(ts, 8), hxp(dur, 8),
          lit("00" * 80))
        val vtrakHex = concat(lit(Mp4TrakPre), hxp(w, 4), lit("0000"),
          hxp(h, 4), lit("0000"))
        val audioOnly = col("doc_id") % 13 === 0
        val moovHex = when(audioOnly,
          concat(lit("000000d86d6f6f76"), mvhdHex, lit(Mp4ATrak)))
          .otherwise(concat(lit("0000013c6d6f6f76"), mvhdHex, vtrakHex,
            lit(Mp4ATrak)))
        val payloadHex = when(col("doc_id") % 19 === 0,
            lit("0000001066747970"))
          .when(col("doc_id") % 23 === 0, lit("00112233"))
          .otherwise(concat(lit(Mp4Ftyp), freeHex, moovHex))
        val media = d.select(col("doc_id"),
            unhex(payloadHex).as("payload"), lit("video").as("kind"))
          .as[Multimodal.MediaRecord]
        Multimodal.decodeVideoHeaders(media).toDF().orderBy("doc_id")
      },
      Some(s"""WITH b AS (SELECT doc_id,
             |  CAST(doc_id % 7 AS INT) AS k,
             |  doc_id % 13 = 0 AS aonly,
             |  doc_id % 19 = 0 OR doc_id % 23 = 0 AS bad
             |  FROM documents),
             |hx AS (SELECT doc_id, k, aonly, bad,
             |  '$Mp4Ftyp' ||
             |  lpad(lower(to_hex(k + 8)), 8, '0') || '66726565' ||
             |  repeat('00', k) ||
             |  CASE WHEN aonly THEN '000000d8' ELSE '0000013c' END ||
             |  '6d6f6f76' || '$Mp4MvhdPre' ||
             |  lpad(lower(to_hex(600 + doc_id % 1000)), 8, '0') ||
             |  lpad(lower(to_hex(1000 + doc_id % 100000)), 8, '0') ||
             |  repeat('00', 80) ||
             |  CASE WHEN aonly THEN '' ELSE '$Mp4TrakPre' ||
             |    lpad(lower(to_hex(160 + doc_id % 480)), 4, '0') ||
             |    '0000' ||
             |    lpad(lower(to_hex(120 + doc_id % 360)), 4, '0') ||
             |    '0000' END ||
             |  '$Mp4ATrak' AS h FROM b),
             |f AS (SELECT doc_id, k, aonly, bad,
             |  CAST(('0x' || substr(h, 2*(52+k)+1, 8)) AS BIGINT) AS ts,
             |  CAST(('0x' || substr(h, 2*(56+k)+1, 8)) AS BIGINT) AS dur,
             |  CAST(('0x' || substr(h, 2*(232+k)+1, 4)) AS INT) AS w,
             |  CAST(('0x' || substr(h, 2*(236+k)+1, 4)) AS INT) AS hh
             |  FROM hx)
             |SELECT doc_id,
             |  CASE WHEN bad THEN NULL ELSE 'mp4' END AS format,
             |  CASE WHEN bad THEN NULL ELSE 'isom' END AS brand,
             |  CASE WHEN bad THEN NULL ELSE ts END AS timescale,
             |  CASE WHEN bad THEN NULL ELSE dur * 1000 // ts END
             |    AS duration_ms,
             |  CASE WHEN bad THEN NULL WHEN aonly THEN 1 ELSE 2 END
             |    AS n_tracks,
             |  CASE WHEN bad OR aonly THEN NULL ELSE w END AS width,
             |  CASE WHEN bad OR aonly THEN NULL ELSE hh END AS height
             |FROM f ORDER BY doc_id""".stripMargin)),

    // ----- iterative graph: PageRank ----------------------------------------
    // Synthetic 53-vertex link graph derived from doc ids; 3 damped
    // sweeps of the simplified (dangling-mass-dropped) PageRank. The
    // oracle unrolls the iterations as CTEs with the SAME double
    // arithmetic ((1.0 - 0.85) evaluated in IEEE doubles, not as a
    // decimal literal), so both engines walk identical float paths;
    // ranks round to 6 places for the hash compare (the cosine-score
    // convention).
    "q143_pagerank" -> Entry(
      (s, dir) => {
        val edges = t(s, dir, "documents")
          .select((col("doc_id") % 53).as("src"),
            ((col("doc_id") * 7 + 11) % 53).as("dst"))
        Graph.pagerank(edges, "src", "dst", iterations = 3)
          .select(col("id"), round(col("rank"), 6).as("rank_r"))
          .orderBy("id")
      },
      Some {
        def iter(prev: String, cur: String): String =
          s"""$cur AS (SELECT v.id,
             |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
             |    / (SELECT n FROM n)
             |  + CAST(0.85 AS DOUBLE) * COALESCE(c.s, 0) AS rank
             |  FROM v LEFT JOIN (
             |    SELECT e.dst AS id, SUM($prev.rank / deg.d) AS s
             |    FROM e JOIN $prev ON $prev.id = e.src
             |    JOIN deg ON deg.id = e.src
             |    GROUP BY e.dst) c ON c.id = v.id)""".stripMargin
        s"""WITH e AS (SELECT DISTINCT doc_id % 53 AS src,
           |    (doc_id * 7 + 11) % 53 AS dst FROM documents
           |  WHERE doc_id % 53 <> (doc_id * 7 + 11) % 53),
           |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
           |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
           |deg AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY 1),
           |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM n)
           |  AS rank FROM v),
           |${iter("r0", "r1")},
           |${iter("r1", "r2")},
           |${iter("r2", "r3")}
           |SELECT id, round(rank, 6) AS rank_r FROM r3
           |ORDER BY id""".stripMargin
      }),

    // ----- embedding hygiene: vector quality report + per-dim moments -------
    // q144 plants one pathology family over the embeddings fixture
    // (nulls, truncated dims, NaN, zero vectors, ×100 norm blowups) and
    // pins the verdict CASE — including the norm-outlier z-gate whose
    // mean/std both engines compute over the same valid-norm set. The
    // report is integer counts, so the float z only has to agree on
    // which side of 3σ each planted norm falls (margins are huge by
    // construction).
    "q144_vector_quality" -> Entry(
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val planted = e.select(col("vec_id"),
          when(col("vec_id") % 29 === 0, lit(null))
            .when(col("vec_id") % 31 === 0, slice(col("embedding"), 1, 32))
            .when(col("vec_id") % 37 === 0,
              concat(slice(col("embedding"), 1, 63),
                array(lit(Float.NaN))))
            .when(col("vec_id") % 41 === 0,
              transform(col("embedding"), _ => lit(0.0f)))
            .when(col("vec_id") % 43 === 0,
              transform(col("embedding"), x => x * lit(100.0f)))
            .otherwise(col("embedding")).as("vec"))
        graft.operators.Embeddings
          .vectorQualityReport(planted, "vec", dim = 64)
          .orderBy("verdict")
      },
      Some("""WITH pl AS (SELECT vec_id,
             |  CASE WHEN vec_id % 29 = 0 THEN NULL
             |    WHEN vec_id % 31 = 0 THEN embedding[1:32]
             |    WHEN vec_id % 37 = 0 THEN
             |      list_append(embedding[1:63], 'NaN'::FLOAT)
             |    WHEN vec_id % 41 = 0 THEN
             |      list_transform(embedding, x -> 0.0::FLOAT)
             |    WHEN vec_id % 43 = 0 THEN
             |      list_transform(embedding, x -> CAST(x * 100.0 AS FLOAT))
             |    ELSE embedding END AS v FROM embeddings),
             |nm AS (SELECT vec_id, v,
             |  CASE WHEN v IS NOT NULL AND len(v) = 64 AND
             |    len(list_filter(v, x -> isnan(x) OR isinf(x))) = 0
             |  THEN sqrt(list_sum(list_transform(v,
             |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             |  ELSE NULL END AS nrm FROM pl),
             |st AS (SELECT avg(nrm) AS mu, stddev_pop(nrm) AS sd
             |  FROM nm WHERE nrm IS NOT NULL AND nrm > 0)
             |SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n FROM (
             |  SELECT CASE WHEN v IS NULL THEN 'missing'
             |    WHEN len(v) <> 64 THEN 'bad_dim'
             |    WHEN len(list_filter(v, x -> isnan(x) OR isinf(x)))
             |      > 0 THEN 'nonfinite'
             |    WHEN nrm = 0 THEN 'zero_norm'
             |    WHEN (SELECT sd FROM st) > 0 AND
             |      abs(nrm - (SELECT mu FROM st)) >
             |        3.0 * (SELECT sd FROM st) THEN 'norm_outlier'
             |    ELSE 'ok' END AS verdict FROM nm)
             |GROUP BY verdict ORDER BY verdict""".stripMargin)),

    // q145: per-dimension population moments (the feature-scaling
    // table `standardize` consumes), rounded 6dp with the +0.0
    // negative-zero kill; oracle unnests with 1-based subscripts
    // shifted to match posexplode's 0-based dims.
    "q145_dim_moments" -> Entry(
      (s, dir) => graft.operators.Embeddings
        .dimMoments(t(s, dir, "embeddings"), "embedding")
        .select(col("dim"),
          (round(col("mean"), 6) + lit(0.0)).as("mean_r"),
          (round(col("std"), 6) + lit(0.0)).as("std_r"))
        .orderBy("dim"),
      Some("""SELECT CAST(i - 1 AS INT) AS dim,
             |  round(avg(CAST(v AS DOUBLE)), 6) + 0.0 AS mean_r,
             |  round(stddev_pop(CAST(v AS DOUBLE)), 6) + 0.0 AS std_r
             |FROM (SELECT unnest(embedding) AS v,
             |  generate_subscripts(embedding, 1) AS i FROM embeddings)
             |GROUP BY i ORDER BY dim""".stripMargin)),

    // ----- declarative data-quality checks (ingest gate) --------------------
    // A Deequ-style suite over lineitem compiled to one aggregation
    // pass. Fractions are exact across engines: numerator and
    // denominator are integer-valued double sums (exact ≤ 2^53), the
    // division is one IEEE op, so even the deliberately-failing and
    // fractional rows hash-match. The duplicate-orderkey Unique row
    // FAILS by design (lineitem repeats orderkeys) — the report must
    // say so, not hide it.
    "q146_quality_checks" -> Entry(
      (s, dir) => {
        import graft.operators.Checks._
        graft.operators.Checks.run(t(s, dir, "lineitem"), Seq(
            NotNull("l_orderkey"),
            Unique("l_orderkey"),
            InRange("l_quantity", 1, 50),
            InRange("l_discount", 0.0, 0.05, minFrac = 0.5),
            AcceptedValues("l_returnflag", Seq("A", "N", "R")),
            MinRows(1000)))
          .orderBy("check", "column", "threshold")
      },
      Some("""WITH m AS (SELECT
             |  SUM(CASE WHEN l_orderkey IS NOT NULL THEN
             |    CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
             |    / SUM(CAST(1.0 AS DOUBLE)) AS nn,
             |  CAST(COUNT(l_orderkey) AS DOUBLE)
             |    - CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS dup,
             |  SUM(CASE WHEN l_orderkey IS NOT NULL THEN CASE WHEN
             |    CAST(l_quantity AS DOUBLE) BETWEEN 1 AND 50 THEN
             |    CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END END)
             |    / SUM(CASE WHEN l_quantity IS NOT NULL THEN
             |      CAST(1.0 AS DOUBLE) END) AS qr,
             |  SUM(CASE WHEN l_discount IS NOT NULL THEN CASE WHEN
             |    CAST(l_discount AS DOUBLE) BETWEEN 0.0 AND 0.05 THEN
             |    CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END END)
             |    / SUM(CASE WHEN l_discount IS NOT NULL THEN
             |      CAST(1.0 AS DOUBLE) END) AS dr,
             |  SUM(CASE WHEN l_returnflag IS NOT NULL THEN CASE WHEN
             |    l_returnflag IN ('A','N','R') THEN CAST(1.0 AS DOUBLE)
             |    ELSE CAST(0.0 AS DOUBLE) END END)
             |    / SUM(CASE WHEN l_returnflag IS NOT NULL THEN
             |      CAST(1.0 AS DOUBLE) END) AS av,
             |  CAST(COUNT(*) AS DOUBLE) AS nr
             |  FROM lineitem)
             |SELECT * FROM (
             |  SELECT 'not_null' AS "check", 'l_orderkey' AS "column",
             |    round(nn, 9) AS observed, CAST(1.0 AS DOUBLE)
             |    AS threshold, nn >= 1.0 AS passed FROM m
             |  UNION ALL SELECT 'unique', 'l_orderkey', round(dup, 9),
             |    CAST(0.0 AS DOUBLE), dup = 0.0 FROM m
             |  UNION ALL SELECT 'in_range', 'l_quantity', round(qr, 9),
             |    CAST(1.0 AS DOUBLE), COALESCE(qr >= 1.0, true) FROM m
             |  UNION ALL SELECT 'in_range', 'l_discount', round(dr, 9),
             |    CAST(0.5 AS DOUBLE), COALESCE(dr >= 0.5, true) FROM m
             |  UNION ALL SELECT 'accepted_values', 'l_returnflag',
             |    round(av, 9), CAST(1.0 AS DOUBLE),
             |    COALESCE(av >= 1.0, true) FROM m
             |  UNION ALL SELECT 'min_rows', '', round(nr, 9),
             |    CAST(1000.0 AS DOUBLE), nr >= 1000.0 FROM m)
             |ORDER BY "check", "column", threshold""".stripMargin)),

    // ----- record linkage: cross-source fuzzy join --------------------------
    // Corpus B re-publishes every %5 doc with its last 3 tokens
    // dropped UNDER THE SAME ID — the id-collision case the side tag
    // exists for. The oracle replays the side-tagged union through the
    // q29 MinHash/band/verify chain with side-crossing candidates
    // only.
    "q147_fuzzy_join" -> Entry(
      (s, dir) => {
        val a = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val b = plantedCopies(a, mod = 5, offset = 0L, dropTokens = 3)
        Dedup.fuzzyJoin(a, "doc_id", "text", b, "doc_id", "text",
            threshold = 0.5)
          .orderBy("id_a", "id_b")
      },
      Some {
        val bands = (0 until 4).map(b =>
          s"SELECT side, doc_id, $b AS band, " +
            s"md5(m${2 * b} || m${2 * b + 1}) AS bv FROM sig")
          .mkString(" UNION ALL ")
        val jacExpr =
          """CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
            |  (CAST(len(sa.sh) AS DOUBLE) + CAST(len(sb.sh) AS DOUBLE)
            |   - CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE))"""
            .stripMargin
        s"""WITH db AS (SELECT doc_id,
           |    array_to_string(w[1:greatest(len(w)-3, 1)], ' ') AS text
           |  FROM (SELECT doc_id, $TOKS AS w FROM documents
           |        WHERE doc_id % 5 = 0)),
           |u AS (SELECT 0 AS side, doc_id, text FROM documents
           |  UNION ALL SELECT 1, doc_id, text FROM db),
           |toks AS (SELECT side, doc_id, $TOKS AS w FROM u),
           |shr AS (SELECT side, doc_id, array_to_string(w[i:i+2], ' ')
           |    AS s
           |  FROM toks, unnest(CASE WHEN len(w) >= 3
           |    THEN generate_series(1, len(w)-2) ELSE [] END) AS u2(i)),
           |sig AS (SELECT side, doc_id, $MinhashMinsSql FROM shr
           |  GROUP BY side, doc_id),
           |bands AS ($bands),
           |cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.bv = b.bv
           |  WHERE a.side = 0 AND b.side = 1),
           |sets AS (SELECT side, doc_id,
           |  list_distinct(CASE WHEN len(w) >= 3 THEN
           |    [array_to_string(w[i:i+2], ' ')
           |     for i in generate_series(1, len(w)-2)] ELSE [] END) AS sh
           |  FROM toks)
           |SELECT id_a, id_b, $jacExpr AS jac
           |FROM cands JOIN sets sa
           |    ON sa.side = 0 AND cands.id_a = sa.doc_id
           |  JOIN sets sb ON sb.side = 1 AND cands.id_b = sb.doc_id
           |WHERE $jacExpr >= 0.5
           |ORDER BY id_a, id_b""".stripMargin
      }),

    // ----- semantic (embedding-level) decontamination -----------------------
    // Benchmark = every %17 embedding; those rows flag themselves at
    // sim 1.0, paraphrase-near rows flag if any cosine ≥ 0.95. Per-pair
    // round-6 cosines (the q30 convention) then max — monotone round
    // commutes with max, so both engines agree bit-wise.
    "q148_semantic_decon" -> Entry(
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Decontaminate.semanticOverlap(
            e.select(col("vec_id"), col("embedding")), "vec_id",
            "embedding",
            e.filter(col("vec_id") % 17 === 0), "embedding",
            threshold = 0.95)
          .select("vec_id", "max_sim", "flagged")
          .orderBy("vec_id")
      },
      Some("""WITH b AS (SELECT embedding AS bv FROM embeddings
             |  WHERE vec_id % 17 = 0),
             |s AS (SELECT c.vec_id,
             |  max(round(
             |    list_sum([cv[i]::DOUBLE * bv[i]::DOUBLE
             |      for i in generate_series(1, len(cv))]) /
             |    (sqrt(list_sum([cv[i]::DOUBLE * cv[i]::DOUBLE
             |      for i in generate_series(1, len(cv))])) *
             |     sqrt(list_sum([bv[i]::DOUBLE * bv[i]::DOUBLE
             |      for i in generate_series(1, len(bv))]))), 6))
             |    AS max_sim
             |  FROM (SELECT vec_id, embedding AS cv FROM embeddings) c, b
             |  GROUP BY c.vec_id)
             |SELECT vec_id, max_sim, max_sim >= 0.95 AS flagged
             |FROM s ORDER BY vec_id""".stripMargin)),

    // ----- equi-depth histogram (quantile bins via the Rank primitive) ------
    // Eight near-equal-population bins over a skew-prone money column;
    // the synthetic unique id (orderkey·8 + linenumber, linenumber ≤ 7)
    // makes the order total so bucket membership is deterministic.
    // Min/max are raw values (no float arithmetic) and counts are
    // exact, so the hash compare is airtight.
    "q149_equidepth_hist" -> Entry(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_extendedprice"),
            (col("l_orderkey") * 8 + col("l_linenumber")).as("rid"))
        Profiles.equiDepthHistogram(li, "l_extendedprice", "rid",
          buckets = 8)
      },
      Some("""WITH r AS (SELECT
             |  CAST(l_extendedprice AS DOUBLE) AS x,
             |  CAST(NTILE(8) OVER (ORDER BY
             |    CAST(l_extendedprice AS DOUBLE),
             |    l_orderkey * 8 + l_linenumber) AS INT) AS bucket
             |  FROM lineitem)
             |SELECT bucket, min(x) AS lo, max(x) AS hi,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // ----- exact global quantiles without a global buffer -------------------
    // Spark's exact `percentile` buffers the whole column per group;
    // this path ranks (one range exchange) and interpolates from the
    // two straddling rows per probability. Oracle = DuckDB's native
    // quantile_cont (same type-7 definition), both rounded 6dp.
    "q150_exact_quantiles" -> Entry(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_extendedprice"),
            (col("l_orderkey") * 8 + col("l_linenumber")).as("rid"))
        Rank.exactQuantiles(li, "l_extendedprice", "rid",
            Seq(0.25, 0.5, 0.9, 0.99))
          .orderBy("p")
      },
      Some {
        // quantile_cont demands a CONSTANT probability — unroll
        Seq(0.25, 0.5, 0.9, 0.99).map(p =>
          s"""SELECT CAST($p AS DOUBLE) AS p,
             |  round(quantile_cont(CAST(l_extendedprice AS DOUBLE),
             |    $p), 6) AS q FROM lineitem""".stripMargin)
          .mkString("", "\nUNION ALL ", "\nORDER BY p")
      }),

    // ----- SQL surface: arbitrary GROUPING SETS + grouping_id ---------------
    // ROLLUP/CUBE (q16/q53) are the structured forms; this is the
    // arbitrary-set form with the grouping_id disambiguator (a NULL
    // group key vs a subtotal row are different things). Spark's
    // grouping_id bit order (first column = MSB) is replayed as
    // explicit GROUPING() arithmetic.
    "q151_grouping_sets" -> Entry(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")),
              Seq(col("l_returnflag")), Seq()),
            col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("sum_qty"),
            count(lit(1)).as("n"),
            grouping_id().cast("long").as("gid"))
          .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_qty,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
             |    AS BIGINT) AS gid
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
             |  (l_returnflag), ())
             |ORDER BY gid, l_returnflag ASC NULLS FIRST,
             |  l_linestatus ASC NULLS FIRST""".stripMargin)),

    // ----- SQL surface: RANGE window frame (value-based moving sum) ---------
    // 30-day trailing spend per customer. RANGE frames are VALUE-based
    // (all day-peers join the frame), so the sum is deterministic with
    // no tiebreak gymnastics; decimal-exact accumulation per the q15
    // convention (engines disagree on double add/retract trees).
    "q152_range_frame" -> Entry(
      (s, dir) => {
        val day = expr("timestampdiff(SECOND, " +
          "TIMESTAMP_NTZ'1970-01-01 00:00:00', o_orderdate) div 86400")
        val w = Window.partitionBy("o_custkey").orderBy("day")
          .rangeBetween(-30, 0)
        t(s, dir, "orders")
          .filter(col("o_custkey") % 31 === 0)
          .select(col("o_custkey"), col("o_orderkey"), day.as("day"),
            col("o_totalprice").cast("decimal(18,2)").as("tp"))
          .withColumn("spend_30d",
            sum(col("tp")).over(w).cast("double"))
          .select("o_custkey", "o_orderkey", "day", "spend_30d")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  epoch(o_orderdate)::BIGINT // 86400 AS day,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |    PARTITION BY o_custkey
             |    ORDER BY epoch(o_orderdate)::BIGINT // 86400
             |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
             |    AS spend_30d
             |FROM orders WHERE o_custkey % 31 = 0
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ----- SQL surface: navigation + distribution window functions ---------
    // lag/lead (with defaults), percent_rank, cume_dist in one frame
    // family; the four-column ORDER makes the order total so the
    // navigation offsets are engine-deterministic.
    "q153_window_nav" -> Entry(
      (s, dir) => {
        val w = Window.partitionBy("l_orderkey")
          .orderBy("ln", "qty", "l_partkey", "l_suppkey")
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") % 97 === 0)
          .select(col("l_orderkey"), col("l_linenumber").as("ln"),
            col("l_quantity").cast("double").as("qty"),
            col("l_partkey"), col("l_suppkey"))
          .withColumn("prev_qty",
            lag(col("qty"), 1, -1.0).over(w))
          .withColumn("next_qty",
            lead(col("qty"), 1, -1.0).over(w))
          .withColumn("pr", round(percent_rank().over(w), 6))
          .withColumn("cd", round(cume_dist().over(w), 6))
          .select("l_orderkey", "ln", "qty", "prev_qty", "next_qty",
            "pr", "cd")
          .orderBy("l_orderkey", "ln", "qty", "pr")
      },
      Some("""SELECT l_orderkey, l_linenumber AS ln,
             |  CAST(l_quantity AS DOUBLE) AS qty,
             |  COALESCE(LAG(CAST(l_quantity AS DOUBLE), 1) OVER w, -1.0)
             |    AS prev_qty,
             |  COALESCE(LEAD(CAST(l_quantity AS DOUBLE), 1) OVER w, -1.0)
             |    AS next_qty,
             |  round(PERCENT_RANK() OVER w, 6) AS pr,
             |  round(CUME_DIST() OVER w, 6) AS cd
             |FROM lineitem WHERE l_orderkey % 97 = 0
             |WINDOW w AS (PARTITION BY l_orderkey
             |  ORDER BY l_linenumber, l_quantity, l_partkey, l_suppkey)
             |ORDER BY l_orderkey, ln, qty, pr""".stripMargin)),

    // ----- leakage-free GROUP split (GroupShuffleSplit semantics) -----------
    // q43 splits per DOCUMENT; near-duplicates within one site then
    // leak across train/val. Hashing the GROUP key instead keeps every
    // source atomic — same splitBucket machinery, group column as the
    // draw key. The entry proves atomicity through the oracle: one
    // (source, split) row per source, never two.
    "q154_group_split" -> Entry(
      (s, dir) => t(s, dir, "documents")
        .select(col("source"),
          TextAnalysis.splitBucket(col("source"), Seq(8, 1, 1),
            salt = "gsplit").cast("long").as("split"))
        .groupBy("source", "split").agg(count(lit(1)).as("n"))
        .orderBy("source", "split"),
      Some("""SELECT source, CAST(CASE WHEN h < 8 THEN 0 WHEN h < 9
             |  THEN 1 ELSE 2 END AS BIGINT) AS split, COUNT(*) AS n
             |FROM (SELECT source, CAST(('0x' || substr(md5('gsplit|' ||
             |  source), 1, 8)) AS UBIGINT) % 10 AS h FROM documents)
             |GROUP BY 1, 2 ORDER BY source, split""".stripMargin)),

    // ----- CCNet perplexity buckets (head/middle/tail per language) ---------
    // The CCNet recipe (Wenzek et al. 2020): score each doc with the
    // LM (q98's smoothed bigram log-prob — higher = more fluent),
    // rank WITHIN its language, split into terciles. Composed from
    // bigramLogProb + Rank.perKeyPercentRank — the (key, bucket)
    // two-phase per-key rank (bit-identical to the window form the
    // oracle replays, spec-pinned): languages are the canonical
    // FEW-HUGE-KEYS case, where the dominant language would serialize
    // a Window.partitionBy(lang) on one task at 100×. Docs too short
    // to score (no bigrams) are excluded by both machines' null-score
    // contracts.
    "q155_ccnet_buckets" -> Entry(
      (s, dir) => {
        val d = docsFan(s, dir)
        // the two-phase rank scans its input three times (cutoffs,
        // bucket counts, rank) — checkpoint the TINY scored frame
        // (3 columns/doc) so the LM-training lineage above it runs
        // once, not three times (the perKeyPercentRank scaladoc's
        // expensive-lineage contract)
        val scored = Vocab.bigramLogProb(
            d.select(col("doc_id"), col("text")), "doc_id", "text")
          .join(d.select(col("doc_id"), col("lang")), "doc_id")
          .pinned
        Rank.perKeyPercentRank(scored, col("lang"), col("doc_id"),
            col("logprob"))
          .withColumn("bucket",
            when(col("pct") >= lit(2.0 / 3), "head")
              .when(col("pct") >= lit(1.0 / 3), "middle")
              .otherwise("tail"))
          .groupBy("lang", "bucket")
          .agg(count(lit(1)).as("n"),
            round(avg(col("logprob")), 6).as("mean_lp"))
          .orderBy("lang", "bucket")
      },
      Some(s"""WITH tk AS (SELECT doc_id, $TOKS AS t FROM documents
              |  WHERE text IS NOT NULL),
              |bg AS (SELECT doc_id,
              |  unnest([struct_pack(w1 := t[i], w2 := t[i + 1])
              |    FOR i IN generate_series(1, len(t) - 1)]) AS p
              |  FROM tk),
              |dp AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2,
              |    COUNT(*) AS cnt
              |  FROM bg GROUP BY 1, 2, 3),
              |bf AS (SELECT w1, w2, SUM(cnt) AS bf FROM dp GROUP BY 1, 2),
              |wf AS (SELECT w1, SUM(bf) AS wf FROM bf GROUP BY 1),
              |v AS (SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v
              |  FROM (SELECT unnest(t) AS term FROM tk)),
              |per AS (SELECT doc_id, v,
              |    list_sort(list(struct_pack(w1 := w1, w2 := w2,
              |      cnt := cnt, bf := bf, wf := wf))) AS xs,
              |    CAST(SUM(cnt) AS BIGINT) AS n_bigrams
              |  FROM dp JOIN bf USING (w1, w2) JOIN wf USING (w1), v
              |  GROUP BY doc_id, v),
              |lp AS (SELECT doc_id,
              |  round(list_reduce(
              |    [CAST(x.cnt AS DOUBLE) *
              |       log2((CAST(x.bf AS DOUBLE) + 0.5) /
              |            (CAST(x.wf AS DOUBLE) + 0.5 * v)) for x in xs],
              |    (a, b) -> a + b) / CAST(n_bigrams AS DOUBLE), 6)
              |    AS logprob
              |  FROM per),
              |r AS (SELECT d.lang, lp.doc_id, lp.logprob,
              |  PERCENT_RANK() OVER (PARTITION BY d.lang
              |    ORDER BY lp.logprob ASC, lp.doc_id ASC) AS pct
              |  FROM lp JOIN documents d USING (doc_id))
              |SELECT lang,
              |  CASE WHEN pct >= CAST(2.0 AS DOUBLE) / 3 THEN 'head'
              |       WHEN pct >= CAST(1.0 AS DOUBLE) / 3 THEN 'middle'
              |       ELSE 'tail' END AS bucket,
              |  CAST(COUNT(*) AS BIGINT) AS n,
              |  round(avg(logprob), 6) AS mean_lp
              |FROM r GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin)),

    // ----- SCD-2 validity intervals from the event change log ---------------
    // Each user's event_type sequence becomes a slowly-changing-
    // dimension table: state valid from its timestamp until the next
    // observation (null = current). µs integer timestamps; the
    // (ts, state) tie order is pinned on both sides.
    "q156_scd_intervals" -> Entry(
      (s, dir) => {
        val ev = Queries.events(s, dir)
          .filter(col("user_id") % 23 === 0)
          .select(col("user_id"), col("event_type"),
            expr("ts div 1000").as("t"))
        Funnel.scdIntervals(ev, "user_id", "event_type", "t")
          .orderBy("user_id", "valid_from", "event_type")
      },
      Some("""SELECT user_id, event_type,
             |  epoch_us(ts) AS valid_from,
             |  LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id
             |    ORDER BY epoch_us(ts), event_type) AS valid_to
             |FROM events WHERE user_id % 23 = 0
             |ORDER BY user_id, valid_from, event_type""".stripMargin)),

    // ----- string similarity: edit distance (record-linkage verifier) -------
    // Levenshtein is the character-level verify for near-identical
    // SHORT strings (names, titles) where shingle Jaccard is too
    // coarse; both engines implement the classic DP — integer-exact
    // parity. Buckets the part catalog by distance to a probe name.
    "q157_edit_distance" -> Entry(
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          levenshtein(col("p_name"), lit("forest green metallic"))
            .cast("long").as("dist"))
        .groupBy("dist").agg(count(lit(1)).as("n"))
        .orderBy("dist"),
      Some("""SELECT CAST(levenshtein(p_name, 'forest green metallic')
             |  AS BIGINT) AS dist, CAST(COUNT(*) AS BIGINT) AS n
             |FROM part GROUP BY 1 ORDER BY dist""".stripMargin)),

    // ----- X4 REAL BMP resize, oracle-checked at the byte level -------------
    // Per doc, a 2×2 24-bit BMP with id-derived pixels upscales 4×4;
    // the oracle REBUILDS the exact expected output (each source pixel
    // becomes a 2×2 block, rows bottom-up, canonical re-emitted
    // header) and both sides digest the lowercase hex.
    "q158_bmp_resize" -> Entry(
      (s, dir) => {
        import s.implicits._
        def hxp(c: org.apache.spark.sql.Column, w: Int) =
          lpad(lower(hex(c)), w, "0")
        def byteHex(k: Int) =
          hxp((col("doc_id") * (k + 3) + k) % 256, 2)
        def pxHex(i: Int) =
          concat(byteHex(3 * i), byteHex(3 * i + 1), byteHex(3 * i + 2))
        val srcHex = concat(lit(bmpHdrHex(2, 2, 16)),
          pxHex(0), pxHex(1), lit("0000"),
          pxHex(2), pxHex(3), lit("0000"))
        val media = t(s, dir, "documents").select(col("doc_id"),
            unhex(srcHex).as("payload"), lit("image").as("kind"))
          .as[Multimodal.MediaRecord]
        Multimodal.resizeBmpImages(media, 4, 4)
          .select(col("doc_id"),
            length(col("payload")).cast("long").as("out_len"),
            md5(lower(hex(col("payload")))).as("digest"))
          .orderBy("doc_id")
      },
      Some {
        def byteHex(k: Int) =
          s"lpad(lower(to_hex((doc_id * ${k + 3} + $k) % 256)), 2, '0')"
        def pxHex(i: Int) =
          s"${byteHex(3 * i)} || ${byteHex(3 * i + 1)} || " +
            byteHex(3 * i + 2)
        val p0 = pxHex(0); val p1 = pxHex(1)
        val p2 = pxHex(2); val p3 = pxHex(3)
        val row01 = s"$p0 || $p0 || $p1 || $p1"
        val row23 = s"$p2 || $p2 || $p3 || $p3"
        s"""SELECT doc_id, CAST(102 AS BIGINT) AS out_len,
           |  md5('${bmpHdrHex(4, 4, 48)}' ||
           |    $row01 || $row01 || $row23 || $row23) AS digest
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // ----- X4 REAL WAV decimation, oracle-checked at the byte level ---------
    // Per doc, a mono 16-bit 8 kHz WAV with six id-derived samples
    // decimates by 2; the oracle rebuilds the canonical 4 kHz output
    // (samples 1, 3, 5 in LE) and both sides digest the hex.
    "q159_wav_decimate" -> Entry(
      (s, dir) => {
        import s.implicits._
        def hxp(c: org.apache.spark.sql.Column, w: Int) =
          lpad(lower(hex(c)), w, "0")
        def sampleHex(i: Int) = {
          val lo = expr(s"(event_id * $i) % 65536 % 256")
          val hi = expr(s"((event_id * $i) % 65536) div 256")
          concat(hxp(lo, 2), hxp(hi, 2))
        }
        val srcHex = concat(
          lit("524946463000000057415645666d7420100000000100" +
            "0100401f0000803e00000200100064617461" + "0c000000"),
          (1 to 6).map(sampleHex).reduce(concat(_, _)))
        val media = t(s, dir, "events")
          .filter(col("event_id") % 11 === 0)
          .select(col("event_id").as("doc_id"),
            unhex(srcHex).as("payload"), lit("audio").as("kind"))
          .as[Multimodal.MediaRecord]
        Multimodal.decimateWavAudio(media, 2)
          .select(col("doc_id"),
            length(col("payload")).cast("long").as("out_len"),
            md5(lower(hex(col("payload")))).as("digest"))
          .orderBy("doc_id")
      },
      Some {
        def sampleHex(i: Int) =
          s"(lpad(lower(to_hex((event_id * $i) % 65536 % 256)), 2, '0')" +
            s" || lpad(lower(to_hex(((event_id * $i) % 65536) // 256))," +
            " 2, '0'))"
        s"""SELECT event_id AS doc_id, CAST(50 AS BIGINT) AS out_len,
           |  md5('524946462a00000057415645666d7420100000000100' ||
           |    '0100a00f0000401f00000200100064617461' || '06000000' ||
           |    ${sampleHex(1)} || ${sampleHex(3)} || ${sampleHex(5)})
           |    AS digest
           |FROM events WHERE event_id % 11 = 0
           |ORDER BY doc_id""".stripMargin
      }),

    // ----- DSv2 generator source: zero-storage reproducible corpus ----------
    // The custom DataSource V2 table provider generates its rows; the
    // oracle REGENERATES the identical table from generate_series +
    // md5 (the content derivation is engine-portable by design). Every
    // cell of every row must match.
    "q160_synth_source" -> Entry(
      (s, dir) => s.read.format("synthdocs")
        .option("rows", "500").option("seed", "q160").load()
        .orderBy("doc_id"),
      Some("""SELECT i AS doc_id,
             |  'src' || CAST(i % 20 AS VARCHAR) AS source,
             |  array_to_string([substr(md5('q160|' || i || '|' || j),
             |    1, 8) for j in generate_series(0, 2 + i % 4)], ' ')
             |    AS text
             |FROM generate_series(0, 499) t(i)
             |ORDER BY doc_id""".stripMargin)),

    // ----- DoReMi multiplicative-weights mixture step -------------------------
    // Group-DRO data mixing: per-source mean length stands in for the
    // proxy loss, the corpus mean for the reference; domains with
    // excess loss gain weight, smoothed with uniform mass. Numerators
    // quantize at 1e6 before the normalization sum (a 1-ulp engine
    // difference in exp flips a quantized long w.p. ~1e-10, vs
    // certainty for order-varying double sums).
    "q234_doremi_reweight" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents")
        def meanK(df: org.apache.spark.sql.DataFrame) =
          sum("n_chars").cast("double") / count(lit(1)).cast("double") /
            lit(1000.0)
        val per = d.groupBy(col("source").as("domain"))
          .agg(meanK(d).as("loss"))
        val ref = d.agg(meanK(d).as("ref"))
        val mix = per.crossJoin(broadcast(ref))
          .withColumn("weight", lit(0.05))
        Sampling.mixtureReweight(mix, "domain", "weight", "loss",
          "ref", eta = 0.5, smoothing = 0.125)
      },
      Some("""WITH per AS (SELECT source AS domain,
             |    CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             |      / CAST(1000 AS DOUBLE) AS loss
             |  FROM documents GROUP BY 1),
             |r AS (SELECT
             |    CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             |      / CAST(1000 AS DOUBLE) AS ref
             |  FROM documents),
             |e AS (SELECT domain,
             |    round(greatest(loss - ref, CAST(0 AS DOUBLE)), 6)
             |      AS excess
             |  FROM per, r),
             |q AS (SELECT domain, excess,
             |    CAST(floor(CAST(0.05 AS DOUBLE)
             |      * exp(CAST(0.5 AS DOUBLE) * excess)
             |      * 1e6 + 0.5) AS BIGINT) AS qn
             |  FROM e),
             |t0 AS (SELECT SUM(qn) AS tot, COUNT(*) AS k FROM q)
             |SELECT domain, excess,
             |  round(CAST(0.875 AS DOUBLE)
             |    * (CAST(qn AS DOUBLE) / CAST(tot AS DOUBLE))
             |    + CAST(0.125 AS DOUBLE) / CAST(k AS DOUBLE), 6)
             |    AS weight_new
             |FROM q, t0 ORDER BY domain""".stripMargin)),

    // ----- Goertzel spectral band power (audio content signal) ---------------
    // Single-bin DFT energies at 1 kHz / 2 kHz over the q159 lossless
    // WAV fixture: the recursion s = x + coef·s1 − s2 folds once over
    // the samples in both engines in the SAME order with the SAME
    // JVM-computed coefficient literal, so the powers replay
    // bit-for-bit — the byte-replay oracle class, now in the DECODED
    // sample domain. The oracle unrolls the 6-step recursion as a CTE
    // chain (expression-DAG-safe: each step references the previous
    // CTE's columns once — no tree doubling).
    "q233_spectral_bands" -> Entry(
      (s, dir) => {
        import s.implicits._
        def hxp(c: org.apache.spark.sql.Column, w: Int) =
          lpad(lower(hex(c)), w, "0")
        def sampleHex(i: Int) = {
          val lo = expr(s"(event_id * $i) % 65536 % 256")
          val hi = expr(s"((event_id * $i) % 65536) div 256")
          concat(hxp(lo, 2), hxp(hi, 2))
        }
        val srcHex = concat(
          lit("524946463000000057415645666d7420100000000100" +
            "0100401f0000803e00000200100064617461" + "0c000000"),
          (1 to 6).map(sampleHex).reduce(concat(_, _)))
        val media = t(s, dir, "events")
          .filter(col("event_id") % 11 === 0)
          .select(col("event_id").as("doc_id"),
            unhex(srcHex).as("payload"), lit("audio").as("kind"))
          .as[Multimodal.MediaRecord]
        Multimodal.spectralBands(media, Seq(1000.0, 2000.0))
          .orderBy("doc_id", "band")
      },
      Some {
        val freqs = Seq(1000.0, 2000.0)
        val coefs = freqs.map(f =>
          2.0 * math.cos(2.0 * math.Pi * f / 8000.0))
        def x(i: Int) =
          s"(CAST(CASE WHEN (event_id * $i) % 65536 < 32768 " +
            s"THEN (event_id * $i) % 65536 " +
            s"ELSE (event_id * $i) % 65536 - 65536 END AS DOUBLE) " +
            "/ CAST(32768 AS DOUBLE))"
        // one CTE per recursion step; band b's step-i state is s{b}_{i}
        // with s{b}_{i-1} carried through under its own (unique) name —
        // no alias shadowing, and each value is referenced once per
        // step (expression-DAG-safe)
        val steps = (1 to 6).map { i =>
          val cols = coefs.zipWithIndex.map { case (c, b) =>
            if (i == 1)
              s"${x(i)} + CAST($c AS DOUBLE) * CAST(0 AS DOUBLE) " +
                s"- CAST(0 AS DOUBLE) AS s${b}_1, " +
                s"CAST(0 AS DOUBLE) AS s${b}_0"
            else
              s"${x(i)} + CAST($c AS DOUBLE) * s${b}_${i - 1} " +
                s"- s${b}_${i - 2} AS s${b}_$i, s${b}_${i - 1}"
          }.mkString(",\n    ")
          if (i == 1)
            s"g1 AS (SELECT event_id,\n    $cols\n  FROM events " +
              "WHERE event_id % 11 = 0)"
          else
            s"g$i AS (SELECT event_id,\n    $cols\n  FROM g${i - 1})"
        }.mkString(",\n")
        val bandRows = coefs.zipWithIndex.map { case (c, b) =>
          s"""SELECT event_id AS doc_id, CAST($b AS INT) AS band,
             |  CAST(${freqs(b)} AS DOUBLE) AS freq,
             |  round(s${b}_6 * s${b}_6 + s${b}_5 * s${b}_5
             |    - CAST($c AS DOUBLE) * s${b}_6 * s${b}_5, 6) AS power
             |FROM g6""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"WITH $steps\n$bandRows\nORDER BY doc_id, band"
      }),

    // ----- DSv2 filter pushdown: id-range slice of the generator -------------
    // The partition-pruning analog for a zero-storage source: a doc_id
    // BETWEEN slice of a 100k-row generator (10 B at soak) generates
    // exactly the slice — the scan's id range narrows to [90000,
    // 90500), pinned by SynthDocsSpec. The oracle regenerates the
    // slice cell-for-cell (the q160 replay).
    "q232_synth_filter_pushdown" -> Entry(
      (s, dir) => s.read.format("synthdocs")
        .option("rows", "100000").option("seed", "q232").load()
        .filter(col("doc_id") >= 90000L && col("doc_id") < 90500L)
        .select(col("doc_id"), col("source"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id"),
      Some("""SELECT i AS doc_id,
             |  'src' || CAST(i % 20 AS VARCHAR) AS source,
             |  md5(array_to_string([substr(md5('q232|' || i || '|' || j),
             |    1, 8) for j in generate_series(0, 2 + i % 4)], ' '))
             |    AS text_md5
             |FROM generate_series(90000, 90499) t(i)
             |ORDER BY doc_id""".stripMargin)),

    // ----- packed training sequences (the loader's actual input) ------------
    // q49 assigns bins; this materializes the concatenated sequences
    // with id-ordered boundary lists. The md5 of each packed text pins
    // concatenation order and separators exactly.
    "q161_packed_sequences" -> Entry(
      (s, dir) => Profiles.packSequences(
          t(s, dir, "documents").select(col("doc_id"), col("text")),
          "doc_id", "text", budget = 512, nShards = 8)
        .select(col("shard"), col("bin"), col("n_docs"),
          col("n_tokens"),
          md5(concat_ws(",", col("doc_ids"))).as("ids_md5"),
          md5(col("text")).as("text_md5"))
        .orderBy("shard", "bin"),
      Some(s"""WITH tk AS (SELECT doc_id, text, len($TOKS) AS tok,
              |  doc_id % 8 AS shard FROM documents),
              |c AS (SELECT doc_id, text, shard, tok, SUM(tok) OVER (
              |  PARTITION BY shard ORDER BY doc_id
              |  ROWS UNBOUNDED PRECEDING) AS cum FROM tk)
              |SELECT CAST(shard AS BIGINT) AS shard,
              |  CAST(floor((cum - tok) / 512) AS BIGINT) AS bin,
              |  CAST(COUNT(*) AS BIGINT) AS n_docs,
              |  CAST(SUM(tok) AS BIGINT) AS n_tokens,
              |  md5(string_agg(CAST(doc_id AS VARCHAR), ','
              |    ORDER BY doc_id)) AS ids_md5,
              |  md5(string_agg(text, chr(10) || chr(10)
              |    ORDER BY doc_id)) AS text_md5
              |FROM c GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin)),

    // ----- robust (median/MAD) vector gate ----------------------------------
    // One third of the embeddings blow up ×100 — enough to inflate a
    // moment z-gate's own σ and mask itself; the median/MAD bound has
    // a 50% breakdown point and drops every outlier. Both engines
    // compute the exact type-7 median and MAD (round-6, the q150
    // contract) and the kept-count must agree.
    "q162_robust_gate" -> Entry(
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
        val planted = e.select(col("vec_id"),
          when(col("vec_id") % 3 === 0,
            transform(col("embedding"), x => x * lit(100.0f)))
            .otherwise(col("embedding")).as("vec"))
        val nValid = planted.count()
        val kept = graft.operators.Embeddings
          .robustVectorGate(planted, "vec", dim = 64).count()
        Seq((nValid, kept)).toDF("n_valid", "n_kept")
      },
      Some("""WITH pl AS (SELECT vec_id,
             |  CASE WHEN vec_id % 3 = 0 THEN
             |    list_transform(embedding, x -> CAST(x * 100.0 AS FLOAT))
             |  ELSE embedding END AS v FROM embeddings),
             |nm AS (SELECT vec_id, sqrt(list_sum(list_transform(v,
             |  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
             |  FROM pl),
             |m AS (SELECT round(quantile_cont(nrm, 0.5), 6) AS med
             |  FROM nm),
             |d AS (SELECT round(quantile_cont(
             |    abs(nrm - (SELECT med FROM m)), 0.5), 6) AS mad
             |  FROM nm)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_valid,
             |  CAST(SUM(CASE WHEN abs(nrm - (SELECT med FROM m)) <=
             |    4.45 * (SELECT mad FROM d) THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_kept
             |FROM nm""".stripMargin)),

    // ----- correlated scalar subquery (Catalyst decorrelation) --------------
    // Orders above their own customer's average: the textbook
    // correlated scalar subquery, which Catalyst must decorrelate into
    // an aggregate + join (a per-row re-execution would be O(n²)).
    // Exercised through spark.sql so the SQL surface itself is under
    // test; both engines run the same statement.
    "q163_correlated_scalar" -> Entry(
      (s, dir) => {
        graft.QuackIO.registerTables(s, dir)
        s.sql("""SELECT o_custkey, o_orderkey,
                |  CAST(o_totalprice AS DOUBLE) AS price
                |FROM orders o
                |WHERE o_totalprice > 1.5 * (
                |  SELECT avg(o_totalprice) FROM orders i
                |  WHERE i.o_custkey = o.o_custkey)
                |ORDER BY o_custkey, o_orderkey""".stripMargin)
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(o_totalprice AS DOUBLE) AS price
             |FROM orders o
             |WHERE o_totalprice > 1.5 * (
             |  SELECT avg(o_totalprice) FROM orders i
             |  WHERE i.o_custkey = o.o_custkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ----- LATERAL join (per-row dependent subquery) ------------------------
    // Top-2 orders per nation's customers via LATERAL — the dependent
    // subquery form Catalyst rewrites into a ranked join. Same
    // statement on both engines; the (totalprice, orderkey) order is
    // total so the limit-2 pick is deterministic.
    "q164_lateral_topk" -> Entry(
      (s, dir) => {
        graft.QuackIO.registerTables(s, dir)
        s.sql("""SELECT c.c_custkey, t.o_orderkey,
                |  CAST(t.o_totalprice AS DOUBLE) AS price
                |FROM customer c,
                |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                |  WHERE o_custkey = c.c_custkey
                |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
                |WHERE c.c_custkey % 19 = 0
                |ORDER BY c.c_custkey, price DESC, t.o_orderkey"""
          .stripMargin)
      },
      Some("""SELECT c.c_custkey, t.o_orderkey,
             |  CAST(t.o_totalprice AS DOUBLE) AS price
             |FROM customer c,
             |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             |  WHERE o_custkey = c.c_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
             |WHERE c.c_custkey % 19 = 0
             |ORDER BY c.c_custkey, price DESC, t.o_orderkey"""
        .stripMargin)),

    // ----- recursive CTE (bounded-hop reachability) -------------------------
    // WITH RECURSIVE over the q143 synthetic link graph: min-hop
    // distance from node 0 within two hops — the iterate-until-guard
    // SQL surface (new in this engine generation), same statement on
    // both engines, bag-semantics recursion bounded by the hop guard.
    "q165_recursive_reach" -> Entry(
      (s, dir) => {
        graft.QuackIO.registerTables(s, dir)
        s.sql("""WITH RECURSIVE e AS (
                |  SELECT DISTINCT doc_id % 53 AS src,
                |    (doc_id * 7 + 11) % 53 AS dst FROM documents
                |  WHERE doc_id % 53 <> (doc_id * 7 + 11) % 53),
                |r(id, hops) AS (
                |  SELECT CAST(0 AS BIGINT) AS id, 0 AS hops
                |  UNION ALL
                |  SELECT e.dst, r.hops + 1 FROM r JOIN e
                |    ON e.src = r.id WHERE r.hops < 2)
                |SELECT id, CAST(min(hops) AS BIGINT) AS hops
                |FROM r GROUP BY id ORDER BY id""".stripMargin)
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT DISTINCT doc_id % 53 AS src,
             |    (doc_id * 7 + 11) % 53 AS dst FROM documents
             |  WHERE doc_id % 53 <> (doc_id * 7 + 11) % 53),
             |r(id, hops) AS (
             |  SELECT CAST(0 AS BIGINT) AS id, 0 AS hops
             |  UNION ALL
             |  SELECT e.dst, r.hops + 1 FROM r JOIN e
             |    ON e.src = r.id WHERE r.hops < 2)
             |SELECT id, CAST(min(hops) AS BIGINT) AS hops
             |FROM r GROUP BY id ORDER BY id""".stripMargin)),

    // ----- bag-semantics set operators (INTERSECT ALL / EXCEPT ALL) ---------
    // q19_setops covers the distinct forms; the ALL forms keep
    // multiplicities (min for intersect, difference for except) — the
    // semantics dedup bookkeeping actually needs when counting copies.
    "q166_setops_all" -> Entry(
      (s, dir) => {
        val a = t(s, dir, "documents")
          .select((col("doc_id") % 40).as("k"))
        val b = t(s, dir, "documents")
          .select((col("doc_id") % 60).as("k"))
        val inter = a.intersectAll(b).groupBy(lit("intersect_all")
          .as("op")).agg(count(lit(1)).as("n"))
        val exc = a.exceptAll(b).groupBy(lit("except_all").as("op"))
          .agg(count(lit(1)).as("n"))
        inter.unionByName(exc).orderBy("op")
      },
      Some("""WITH a AS (SELECT doc_id % 40 AS k FROM documents),
             |b AS (SELECT doc_id % 60 AS k FROM documents),
             |i AS (SELECT 'intersect_all' AS op,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |  FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)),
             |e AS (SELECT 'except_all' AS op,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |  FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b))
             |SELECT * FROM e UNION ALL SELECT * FROM i
             |ORDER BY op""".stripMargin)),

    // ----- forward-fill (last_value IGNORE NULLS) ---------------------------
    // Carry each user's last seen non-null value forward in event-time
    // order — the gap-filling pass sensor/state streams need before
    // aggregation. Spark's last(_, ignoreNulls) over a running frame ≡
    // SQL LAST_VALUE ... IGNORE NULLS; nulls planted every third event.
    "q167_forward_fill" -> Entry(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("t", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Queries.events(s, dir)
          .filter(col("user_id") % 29 === 0)
          .select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("t"),
            when(col("event_id") % 3 === 0, lit(null))
              .otherwise(col("value")).as("v"))
          .withColumn("v_filled",
            last(col("v"), ignoreNulls = true).over(w))
          .select("user_id", "event_id", "v", "v_filled")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |  CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v,
             |  LAST_VALUE(CASE WHEN event_id % 3 = 0 THEN NULL
             |    ELSE value END IGNORE NULLS) OVER (
             |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS v_filled
             |FROM events WHERE user_id % 29 = 0
             |ORDER BY user_id, event_id""".stripMargin)),

    // ----- dup-cluster size distribution (the publishable dedup stat) -------
    // q54 labels clusters; this rolls them into "how many clusters of
    // size k" — the number a dedup report actually quotes (docs with
    // no near-dup edges are absent by construction: the distribution
    // describes the DUPLICATED mass).
    "q168_dup_size_dist" -> Entry(
      (s, dir) => {
        val pairs = Dedup.minhashCandidates(nearDupDocs(s, dir),
          "doc_id", "text", k = 8, rowsPerBand = 2, shingleN = 3)
        Connected.components(pairs, "doc_a", "doc_b")
          .groupBy("comp").agg(count(lit(1)).as("size"))
          .groupBy("size").agg(count(lit(1)).as("n_clusters"))
          .orderBy("size")
      },
      Some(s"""WITH RECURSIVE $NearDupDocsSql,
              |$MinhashPairsSql,
              |e AS (SELECT doc_a AS eu, doc_b AS ev FROM pairs
              |  UNION SELECT doc_b, doc_a FROM pairs),
              |reach(id, r) AS (
              |  SELECT eu, eu FROM e
              |  UNION
              |  SELECT reach.id, e.ev FROM reach JOIN e ON e.eu = reach.r),
              |comp AS (SELECT id, MIN(r) AS cluster FROM reach
              |  GROUP BY id),
              |sz AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS size
              |  FROM comp GROUP BY cluster)
              |SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters
              |FROM sz GROUP BY size ORDER BY size""".stripMargin)),

    // ----- MAP-typed column surface (parse → explode → per-key rollup) ------
    // props parsed as MAP<STRING, INT> (schema-free: keys are data,
    // not schema — the shape crawl metadata actually has), exploded to
    // (key, value) pairs, rolled up per key. Exercises the MAP type
    // end-to-end where q134 used a fixed struct.
    "q169_map_props" -> Entry(
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), "map<string,int>",
            Map.empty[String, String]).as("m"))
        .select(col("event_type"), explode(col("m"))
          .as(Seq("k", "v")))
        .groupBy("event_type", "k")
        .agg(count(lit(1)).as("n"), sum(col("v")).cast("long")
          .as("sum_v"), max(col("v")).cast("long").as("max_v"))
        .orderBy("event_type", "k"),
      Some("""SELECT event_type, u.k AS k,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(u.v) AS BIGINT) AS sum_v,
             |  CAST(MAX(u.v) AS BIGINT) AS max_v
             |FROM (SELECT event_type,
             |  unnest([{'k': kk, 'v': CAST(json_extract(props,
             |    '$.' || kk) AS INT)} for kk in json_keys(props)]) AS u
             |  FROM events)
             |GROUP BY 1, 2 ORDER BY event_type, k""".stripMargin)),

    // ----- array set-function surface (distinct/sort/intersect/except) ------
    // Per doc: distinct-token set size, stopword intersection size,
    // non-stop size, and the md5 of the SORTED distinct tokens (sort
    // canonicalizes order, so the digest is engine-stable — both
    // engines sort strings by binary collation).
    "q170_array_ops" -> Entry(
      (s, dir) => {
        val stop = TextAnalysis.EnStop
        t(s, dir, "documents")
          .select(col("doc_id"),
            array_distinct(TextAnalysis.tokens(col("text")))
              .as("__d"))
          .select(col("doc_id"),
            size(col("__d")).cast("long").as("n_distinct"),
            size(array_intersect(col("__d"),
              lit(stop.toArray))).cast("long").as("n_stop"),
            size(array_except(col("__d"),
              lit(stop.toArray))).cast("long").as("n_rest"),
            md5(array_join(array_sort(col("__d")), " ")).as("digest"))
          .orderBy("doc_id")
      },
      Some {
        val stopList = TextAnalysis.EnStop
          .map(w => s"'$w'").mkString("[", ", ", "]")
        s"""SELECT doc_id,
           |  CAST(len(d) AS BIGINT) AS n_distinct,
           |  CAST(len(list_intersect(d, $stopList)) AS BIGINT)
           |    AS n_stop,
           |  CAST(len(list_filter(d, t -> NOT list_contains($stopList,
           |    t))) AS BIGINT) AS n_rest,
           |  md5(array_to_string(list_sort(d), ' ')) AS digest
           |FROM (SELECT doc_id, list_distinct($TOKS) AS d
           |      FROM documents)
           |ORDER BY doc_id""".stripMargin
      }),

    // ----- predicate aggregates (count_if / bool_and / bool_or) -------------
    // The filtered-aggregate surface: per order priority, how many
    // orders clear a price bar, whether ALL do, whether ANY do —
    // integer/boolean outputs, bit-exact cross-engine.
    "q171_bool_aggs" -> Entry(
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count_if(col("o_totalprice") > 200000).as("n_big"),
          bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
          bool_or(col("o_totalprice") > 400000).as("any_over_400k"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
             |  bool_and(o_totalprice > 1000) AS all_over_1k,
             |  bool_or(o_totalprice > 400000) AS any_over_400k,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM orders GROUP BY 1
             |ORDER BY o_orderpriority""".stripMargin)),

    // ----- temperature mixture at a GENERIC alpha (0.3) ---------------------
    // q94 pins alpha=0.5 (sqrt — libm-free on both engines); this pins
    // the pow() path the mT5 recipe actually sweeps. Cross-engine pow
    // differs by ~1 ulp, but every rate QUANTIZES to integer basis
    // points via round() before any row decision — a flip needs the
    // pre-round value within ~1e-10 of a .5 boundary, and a flip would
    // surface as a loud hash mismatch, never silent drift.
    "q172_temperature_generic" -> Entry(
      (s, dir) => Sampling.temperatureMixture(
          Queries.t(s, dir, "documents").select(col("doc_id"),
            col("source")),
          col("doc_id"), "source", targetDocs = 300, alpha = 0.3,
          salt = "tmix3")
        .orderBy("doc_id"),
      Some("""WITH c AS (SELECT source, count(*) AS n FROM documents
             |  GROUP BY source),
             |z AS (SELECT list_sum(list(pow(n, 0.3) ORDER BY source))
             |  AS z FROM c),
             |r AS (SELECT source, CAST(LEAST(10000.0,
             |    round(300 * 10000.0 * pow(n, 0.3) / (z.z * n)))
             |  AS BIGINT) AS bp FROM c, z)
             |SELECT d.doc_id, d.source FROM documents d
             |JOIN r ON d.source = r.source
             |WHERE CAST(('0x' || substr(md5('tmix3|' ||
             |    CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 10000
             |  < GREATEST(0, LEAST(10000, r.bp))
             |ORDER BY d.doc_id""".stripMargin)),

    // ----- X4 REAL compressed-pixel decode (javax.imageio) ------------------
    // Plants a genuine zlib-compressed PNG per doc (encodePng: real
    // Deflater + CRC32, striped rows in two doc-derived colors) plus
    // malformed blobs, then FULLY DECODES the pixels with ImageIO and
    // reports per-channel means. The oracle replays the stripe
    // arithmetic in closed form: mean_r = (⌈h/2⌉·r1 + ⌊h/2⌋·r2)/h —
    // the width cancels, and both engines divide the same exact
    // integers, so the doubles agree bit-for-bit before the round-6.
    // This closes the pixel gap: the bytes cross a real inflate +
    // unfilter + raster pass, not stub arithmetic.
    "q173_image_pixels" -> Entry(
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents").select(col("doc_id")).as[Long]
        val media = ids.map { id =>
          if (id % 19 == 0) // truncated signature
            Multimodal.MediaRecord(id,
              Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte), "image")
          else if (id % 23 == 0) // junk bytes
            Multimodal.MediaRecord(id,
              Array(0x00, 0x11, 0x22, 0x33).map(_.toByte), "image")
          else {
            val w = (8 + id % 24).toInt; val h = (4 + id % 12).toInt
            val r1 = (id % 256).toInt; val g1 = (id * 7 % 256).toInt
            val b1 = (id * 13 % 256).toInt
            val r2 = (id * 3 % 256).toInt; val g2 = (id * 5 % 256).toInt
            val b2 = (id * 11 % 256).toInt
            Multimodal.MediaRecord(id, Multimodal.encodePng(w, h,
              (_, y) => if (y % 2 == 0) (r1, g1, b1) else (r2, g2, b2)),
              "image")
          }
        }
        Multimodal.decodeImages(media).toDF()
          .select(col("doc_id"), col("format"), col("width"),
            col("height"), col("bands"),
            round(col("mean_r"), 6).as("mean_r"),
            round(col("mean_g"), 6).as("mean_g"),
            round(col("mean_b"), 6).as("mean_b"))
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id,
             |  CAST(8 + doc_id % 24 AS INT) AS w,
             |  CAST(4 + doc_id % 12 AS INT) AS h,
             |  doc_id % 256 AS r1, doc_id * 7 % 256 AS g1,
             |  doc_id * 13 % 256 AS b1,
             |  doc_id * 3 % 256 AS r2, doc_id * 5 % 256 AS g2,
             |  doc_id * 11 % 256 AS b2,
             |  (doc_id % 19 = 0 OR doc_id % 23 = 0) AS bad
             |  FROM documents)
             |SELECT doc_id,
             |  CASE WHEN bad THEN NULL ELSE 'png' END AS format,
             |  CASE WHEN bad THEN NULL ELSE w END AS width,
             |  CASE WHEN bad THEN NULL ELSE h END AS height,
             |  CASE WHEN bad THEN NULL ELSE CAST(3 AS INT) END AS bands,
             |  CASE WHEN bad THEN NULL ELSE round(
             |    (CAST((h + 1) // 2 AS DOUBLE) * r1 +
             |     CAST(h // 2 AS DOUBLE) * r2) / h, 6) END AS mean_r,
             |  CASE WHEN bad THEN NULL ELSE round(
             |    (CAST((h + 1) // 2 AS DOUBLE) * g1 +
             |     CAST(h // 2 AS DOUBLE) * g2) / h, 6) END AS mean_g,
             |  CASE WHEN bad THEN NULL ELSE round(
             |    (CAST((h + 1) // 2 AS DOUBLE) * b1 +
             |     CAST(h // 2 AS DOUBLE) * b2) / h, 6) END AS mean_b
             |FROM b ORDER BY doc_id""".stripMargin)),

    // ----- X4 REAL MP4 sample-table walk (frame index without a codec) ------
    // Synthesizes a full moov/trak/mdia/minf/stbl box tree per doc —
    // two stts runs, a two-entry stsc chunk map (2 samples/chunk for
    // chunks 1–2, 3 after), per-sample stsz sizes, stco offsets — and
    // recovers every sample's byte range + pts with the REAL
    // sample-table walker. Malformed plants: a truncated box and an
    // stsz/stts count mismatch (table ops emit zero rows for those).
    // The oracle replays the chunk-map and run-length arithmetic in
    // closed form per (doc, sample).
    "q174_mp4_frame_index" -> Entry(
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents").select(col("doc_id"))
        val ns = (lit(4) + col("doc_id") % 9).cast("int")
        val fileHex = mp4FileHex(ns, plants = true)
        val media = d.select(col("doc_id"),
            unhex(fileHex).as("payload"), lit("video").as("kind"))
          .as[Multimodal.MediaRecord]
        Multimodal.frameIndex(media).toDF()
          .select(col("doc_id"), col("sample_idx"), col("chunk_idx"),
            col("offset").as("byte_offset"), col("size").as("n_bytes"),
            col("pts_units"), col("timescale"))
          .orderBy("doc_id", "sample_idx")
      },
      Some("""WITH b AS (SELECT doc_id, CAST(4 + doc_id % 9 AS INT) AS ns,
             |  1000 * (1 + doc_id % 3) AS tsc,
             |  100 + doc_id % 50 AS d1, 200 + doc_id % 30 AS d2
             |  FROM documents
             |  WHERE doc_id % 19 <> 0 AND doc_id % 23 <> 0),
             |s AS (SELECT doc_id, ns, tsc, d1, d2, u.i AS i
             |  FROM b, unnest(generate_series(0, ns - 1)) AS u(i)),
             |c AS (SELECT doc_id, tsc, i,
             |  CASE WHEN i < 4 THEN i // 2 ELSE 2 + (i - 4) // 3 END
             |    AS chunk0,
             |  CASE WHEN i < 4 THEN i % 2 ELSE (i - 4) % 3 END AS within,
             |  50 + ((doc_id + i) % 7) * 10 AS sz,
             |  CASE WHEN i < 2 THEN i * d1
             |       ELSE 2 * d1 + (i - 2) * d2 END AS pts
             |  FROM s)
             |SELECT doc_id, CAST(i AS INT) AS sample_idx,
             |  CAST(chunk0 + 1 AS INT) AS chunk_idx,
             |  CAST(1000 + chunk0 * 5000
             |    + CASE WHEN within >= 1
             |        THEN 50 + ((doc_id + i - 1) % 7) * 10 ELSE 0 END
             |    + CASE WHEN within >= 2
             |        THEN 50 + ((doc_id + i - 2) % 7) * 10 ELSE 0 END
             |    AS BIGINT) AS byte_offset,
             |  CAST(sz AS BIGINT) AS n_bytes,
             |  CAST(pts AS BIGINT) AS pts_units,
             |  CAST(tsc AS BIGINT) AS timescale
             |FROM c ORDER BY doc_id, sample_idx""".stripMargin)),

    // ----- codec-free keyframe selection plan ---------------------------------
    // One frame per presentation second, chosen by the no-decode
    // I-frame heuristic (largest sample in the bucket, ties earliest)
    // over the q174 sample-table fixture — the byte ranges a
    // thumbnail pipeline fetches without a codec. The oracle replays
    // the frame table AND the bucket argmax.
    "q235_keyframes" -> Entry(
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents").select(col("doc_id"))
        val ns = (lit(4) + col("doc_id") % 9).cast("int")
        val fileHex = mp4FileHex(ns, plants = true)
        val media = d.select(col("doc_id"),
            unhex(fileHex).as("payload"), lit("video").as("kind"))
          .as[Multimodal.MediaRecord]
        Multimodal.keyframePlan(media)
          .orderBy("doc_id", "bucket")
      },
      Some("""WITH b AS (SELECT doc_id, CAST(4 + doc_id % 9 AS INT) AS ns,
             |  1000 * (1 + doc_id % 3) AS tsc,
             |  100 + doc_id % 50 AS d1, 200 + doc_id % 30 AS d2
             |  FROM documents
             |  WHERE doc_id % 19 <> 0 AND doc_id % 23 <> 0),
             |s AS (SELECT doc_id, ns, tsc, d1, d2, u.i AS i
             |  FROM b, unnest(generate_series(0, ns - 1)) AS u(i)),
             |c AS (SELECT doc_id, tsc, i,
             |  CASE WHEN i < 4 THEN i // 2 ELSE 2 + (i - 4) // 3 END
             |    AS chunk0,
             |  CASE WHEN i < 4 THEN i % 2 ELSE (i - 4) % 3 END AS within,
             |  50 + ((doc_id + i) % 7) * 10 AS sz,
             |  CASE WHEN i < 2 THEN i * d1
             |       ELSE 2 * d1 + (i - 2) * d2 END AS pts
             |  FROM s),
             |k AS (SELECT doc_id, pts // tsc AS bucket, i, chunk0,
             |    within, sz, pts
             |  FROM c
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id, pts // tsc
             |    ORDER BY sz DESC, i) = 1)
             |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
             |  CAST(i AS INT) AS sample_idx,
             |  CAST(1000 + chunk0 * 5000
             |    + CASE WHEN within >= 1
             |        THEN 50 + ((doc_id + i - 1) % 7) * 10 ELSE 0 END
             |    + CASE WHEN within >= 2
             |        THEN 50 + ((doc_id + i - 2) % 7) * 10 ELSE 0 END
             |    AS BIGINT) AS byte_offset,
             |  CAST(sz AS BIGINT) AS n_bytes,
             |  CAST(pts AS BIGINT) AS pts_units
             |FROM k ORDER BY doc_id, bucket""".stripMargin)),

    // ----- chrF: character n-gram F-score (generation eval) ------------------
    // The q229 pair fixture (12-token prefix, every 3rd token → 'zz')
    // scored at the CHARACTER level: corpus-pooled clipped char-n-gram
    // matches for n = 1..3, macro-averaged P/R, F with β = 2. Counts
    // are integers; the only float math is the fixed-order final
    // expression both engines evaluate identically.
    "q236_chrf" -> Entry(
      (s, dir) => {
        // stripped-direct path (chrFStripped): tokens are
        // whitespace-free, so joining them with an EMPTY separator is
        // exactly chrF's whitespace-stripped form — one scan, one pin,
        // no strip-regex pass
        val trimmed = t(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__w"))
          .select(col("doc_id"),
            array_join(slice(col("__w"), 1, 12), "").as("ref_s"),
            array_join(transform(slice(col("__w"), 1, 12),
              (w, i) => when((i + 1) % 3 === 0, lit("zz")).otherwise(w)),
              "").as("cand_s"))
        Metrics.chrFStripped(trimmed, "doc_id", "cand_s", "ref_s",
          maxN = 3)
      },
      Some {
        def cgrams(src: String, n: Int) =
          s"[substr($src, i, $n) for i in generate_series(1, len($src) - ${n - 1})]"
        val perN = (1 to 3).map { n =>
          s"""cg$n AS (SELECT doc_id, g, COUNT(*) AS cn FROM (
             |  SELECT doc_id, unnest(${cgrams("cs", n)}) AS g FROM t)
             |  GROUP BY 1, 2),
             |rg$n AS (SELECT doc_id, g, COUNT(*) AS rn FROM (
             |  SELECT doc_id, unnest(${cgrams("rs", n)}) AS g FROM t)
             |  GROUP BY 1, 2),
             |s$n AS (SELECT
             |  SUM(least(coalesce(cn, 0), coalesce(rn, 0))) AS m,
             |  SUM(coalesce(cn, 0)) AS ct, SUM(coalesce(rn, 0)) AS rt
             |  FROM cg$n FULL JOIN rg$n USING (doc_id, g))""".stripMargin
        }.mkString(",\n")
        def pn(n: Int) =
          s"""CASE WHEN (SELECT ct FROM s$n) > 0
             |  THEN CAST((SELECT m FROM s$n) AS DOUBLE)
             |    / CAST((SELECT ct FROM s$n) AS DOUBLE)
             |  ELSE CAST(0 AS DOUBLE) END""".stripMargin
        def rn(n: Int) =
          s"""CASE WHEN (SELECT rt FROM s$n) > 0
             |  THEN CAST((SELECT m FROM s$n) AS DOUBLE)
             |    / CAST((SELECT rt FROM s$n) AS DOUBLE)
             |  ELSE CAST(0 AS DOUBLE) END""".stripMargin
        s"""WITH t0 AS (SELECT doc_id, ($TOKS)[1:12] AS rw
           |  FROM documents),
           |t AS (SELECT doc_id, array_to_string(rw, '') AS rs,
           |    array_to_string([CASE WHEN i % 3 = 0 THEN 'zz'
           |      ELSE rw[i] END
           |      for i in generate_series(1, len(rw))], '') AS cs
           |  FROM t0),
           |$perN,
           |fin AS (SELECT
           |  ((${pn(1)}) + (${pn(2)}) + (${pn(3)}))
           |    / CAST(3 AS DOUBLE) AS p,
           |  ((${rn(1)}) + (${rn(2)}) + (${rn(3)}))
           |    / CAST(3 AS DOUBLE) AS r)
           |SELECT CAST(3 AS INT) AS orders, round(p, 6) AS chr_p,
           |  round(r, 6) AS chr_r,
           |  CASE WHEN CAST(4 AS DOUBLE) * p + r > 0 THEN
           |    round(CAST(5 AS DOUBLE) * p * r
           |      / (CAST(4 AS DOUBLE) * p + r), 6) END AS chrf
           |FROM fin""".stripMargin
      }),

    // ----- Fleiss' kappa: multi-rater labeling agreement ---------------------
    // Three deterministic pseudo-raters label each doc's length bucket:
    // rater j flips to an md5-drawn bucket with probability j·20%
    // (rater 0 is truth), so agreement is high but imperfect. All
    // integer aggregates until the one-row P̄/P_e/κ expression.
    "q237_fleiss_kappa" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val trueCat = when(col("n_chars") < 200, "short")
          .when(col("n_chars") < 400, "mid").otherwise("long")
        val assigns = d.select(col("doc_id"), trueCat.as("__tc"),
            explode(sequence(lit(0), lit(2))).as("__j"))
          .select(col("doc_id"), col("__j"),
            (conv(substring(md5(concat(lit("fl"),
              col("__j").cast("string"), lit("|"),
              col("doc_id").cast("string"))), 1, 8), 16, 10)
              .cast("long") % 10).as("__flip"),
            (conv(substring(md5(concat(lit("fc"),
              col("__j").cast("string"), lit("|"),
              col("doc_id").cast("string"))), 1, 8), 16, 10)
              .cast("long") % 3).as("__alt"), col("__tc"))
          .select(col("doc_id"),
            when(col("__flip") < col("__j") * 2,
              element_at(array(lit("short"), lit("mid"), lit("long")),
                (col("__alt") + 1).cast("int")))
              .otherwise(col("__tc")).as("cat"))
        Metrics.fleissKappa(assigns, "doc_id", "cat", nRaters = 3)
      },
      Some("""WITH d AS (SELECT doc_id,
             |    CASE WHEN n_chars < 200 THEN 'short'
             |      WHEN n_chars < 400 THEN 'mid' ELSE 'long' END AS tc
             |  FROM documents),
             |a AS (SELECT doc_id, j,
             |    CAST(('0x' || substr(md5('fl' || CAST(j AS VARCHAR)
             |      || '|' || CAST(doc_id AS VARCHAR)), 1, 8))
             |      AS UBIGINT) % 10 AS flip,
             |    CAST(('0x' || substr(md5('fc' || CAST(j AS VARCHAR)
             |      || '|' || CAST(doc_id AS VARCHAR)), 1, 8))
             |      AS UBIGINT) % 3 AS alt, tc
             |  FROM d, unnest(generate_series(0, 2)) AS u(j)),
             |asg AS (SELECT doc_id,
             |    CASE WHEN flip < j * 2
             |      THEN ['short', 'mid', 'long'][CAST(alt AS INT) + 1]
             |      ELSE tc END AS cat
             |  FROM a),
             |cell AS (SELECT doc_id AS i, cat AS j, COUNT(*) AS nij
             |  FROM asg GROUP BY 1, 2),
             |per AS (SELECT i, SUM(nij * nij) AS sq FROM cell
             |  GROUP BY 1),
             |agg AS (SELECT COUNT(*) AS n_items, SUM(sq) AS sumsq
             |  FROM per),
             |cat AS (SELECT SUM(cj * cj) AS c2, SUM(cj) AS ctot FROM (
             |  SELECT j, SUM(nij) AS cj FROM cell GROUP BY 1)),
             |fin AS (SELECT n_items,
             |    (CAST(sumsq AS DOUBLE) - CAST(n_items AS DOUBLE)
             |      * CAST(3 AS DOUBLE))
             |    / (CAST(n_items AS DOUBLE) * CAST(3 AS DOUBLE)
             |      * (CAST(3 AS DOUBLE) - CAST(1 AS DOUBLE))) AS p_bar,
             |    CAST(c2 AS DOUBLE)
             |    / (CAST(ctot AS DOUBLE) * CAST(ctot AS DOUBLE)) AS p_e
             |  FROM agg, cat)
             |SELECT CAST(n_items AS BIGINT) AS n_items,
             |  CAST(3 AS INT) AS n_raters, round(p_bar, 6) AS p_bar,
             |  round(p_e, 6) AS p_e,
             |  CASE WHEN p_e < 1 THEN
             |    round((p_bar - p_e) / (CAST(1 AS DOUBLE) - p_e), 6)
             |  END AS kappa
             |FROM fin""".stripMargin)),

    // ----- KNN-Shapley data valuation (Jia et al. 2019) ----------------------
    // Exact per-training-row Shapley values for the 3-NN classifier of
    // 4 validation embeddings: nearest-first ranking by the repo-
    // standard round-6 cosine, then the closed-form suffix recursion
    // with every term quantized to a 1e-12 long BEFORE the running sum
    // (running-window doubles diverge between Spark's sequential fold
    // and DuckDB's segment tree — integer sums cannot).
    "q238_knn_shapley" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Valuation.knnShapley(
            emb.filter(col("vec_id") >= 4), emb.filter(col("vec_id") < 4),
            "vec_id", "embedding", "label", k = 3)
          .orderBy("query_id", "rank")
      },
      Some {
        val cos =
          """round(
            |    list_sum([qv[i]::DOUBLE * cv[i]::DOUBLE
            |      for i in generate_series(1, len(qv))]) /
            |    (sqrt(list_sum([qv[i]::DOUBLE * qv[i]::DOUBLE
            |      for i in generate_series(1, len(qv))])) *
            |     sqrt(list_sum([cv[i]::DOUBLE * cv[i]::DOUBLE
            |      for i in generate_series(1, len(cv))]))), 6)""".stripMargin
        s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
           |    label AS qy FROM embeddings WHERE vec_id < 4),
           |c AS (SELECT vec_id AS train_id, embedding AS cv, label AS cy
           |  FROM embeddings WHERE vec_id >= 4),
           |p AS (SELECT query_id, train_id, $cos AS score,
           |    CASE WHEN cy = qy THEN 1 ELSE 0 END AS ind
           |  FROM q, c WHERE query_id <> train_id),
           |r AS (SELECT query_id, train_id, score, ind,
           |    ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY score DESC, train_id) AS rank,
           |    COUNT(*) OVER (PARTITION BY query_id) AS n,
           |    LEAD(ind) OVER (PARTITION BY query_id
           |      ORDER BY score DESC, train_id) AS nind
           |  FROM p),
           |tm AS (SELECT query_id, train_id, rank, score,
           |    CASE WHEN rank = n THEN ind * CAST(floor(
           |        CAST(1 AS DOUBLE) / CAST(n AS DOUBLE) * 1e12 + 0.5)
           |        AS BIGINT)
           |      ELSE (ind - nind) * CAST(floor(
           |        CAST(least(3, rank) AS DOUBLE)
           |        / (CAST(3 AS DOUBLE) * CAST(rank AS DOUBLE))
           |        * 1e12 + 0.5) AS BIGINT)
           |    END AS term
           |  FROM r)
           |SELECT query_id, train_id, CAST(rank AS BIGINT) AS rank,
           |  score,
           |  CAST(SUM(term) OVER (PARTITION BY query_id ORDER BY rank
           |    DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS shapley_q,
           |  round(CAST(CAST(SUM(term) OVER (PARTITION BY query_id
           |    ORDER BY rank DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
           |    AS DOUBLE) / 1e12, 6) + 0 AS shapley
           |FROM tm ORDER BY query_id, rank""".stripMargin
      }),

    // ----- label-propagation communities (Raghavan et al. 2007) --------------
    // Three synchronous sweeps over the q143 affine 53-vertex graph,
    // smallest-label ties — integer labels and counts end-to-end, so
    // the oracle's CTE unroll matches bit-for-bit with no float
    // anywhere.
    "q239_label_prop" -> Entry(
      (s, dir) => {
        val edges = t(s, dir, "documents")
          .select((col("doc_id") % 53).as("src"),
            ((col("doc_id") * 7 + 11) % 53).as("dst"))
        Graph.labelPropagation(edges, "src", "dst", sweeps = 3)
          .orderBy("id")
      },
      Some {
        def sweep(prev: String, cur: String): String =
          s"""$cur AS (SELECT id, label FROM (
             |  SELECT adj.a AS id, p.label AS label, COUNT(*) AS c
             |  FROM adj JOIN $prev p ON p.id = adj.b
             |  GROUP BY 1, 2)
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY id
             |    ORDER BY c DESC, label) = 1)""".stripMargin
        s"""WITH d AS (SELECT doc_id % 53 AS src,
           |    (doc_id * 7 + 11) % 53 AS dst FROM documents
           |  WHERE doc_id % 53 <> (doc_id * 7 + 11) % 53),
           |adj AS (SELECT DISTINCT a, b FROM (
           |  SELECT src AS a, dst AS b FROM d
           |  UNION ALL SELECT dst, src FROM d)),
           |l0 AS (SELECT DISTINCT a AS id, a AS label FROM adj),
           |${sweep("l0", "l1")},
           |${sweep("l1", "l2")},
           |${sweep("l2", "l3")}
           |SELECT id, label FROM l3 ORDER BY id""".stripMargin
      }),

    // ----- paired sign-flip permutation test ---------------------------------
    // Two engineered per-doc metric variants whose delta is the exact
    // rational (3 − doc_id % 7)/1000: 64 deterministic md5 sign
    // patterns, replicate means as single divisions of exact long
    // sums, add-one two-sided p-value.
    "q240_perm_test" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"),
          (col("n_chars").cast("double") / lit(1000.0)).as("a"),
          ((col("n_chars") + col("doc_id") % 7 - lit(3)).cast("double")
            / lit(1000.0)).as("b"))
        Metrics.permutationTest(d, "doc_id", "a", "b",
          replicates = 64, scale = 6, salt = "perm")
      },
      Some("""WITH base AS (SELECT CAST(doc_id AS VARCHAR) AS id,
             |    CAST(floor((CAST(n_chars AS DOUBLE)
             |        / CAST(1000 AS DOUBLE)
             |      - CAST(n_chars + doc_id % 7 - 3 AS DOUBLE)
             |        / CAST(1000 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
             |      AS d
             |  FROM documents),
             |obs AS (SELECT COUNT(*) AS n, SUM(d) AS s FROM base),
             |reps AS (SELECT unnest(generate_series(0, 63)) AS rep),
             |f AS (SELECT rep, CASE WHEN CAST(('0x' ||
             |      substr(md5('perm' || CAST(rep AS VARCHAR) || '|'
             |      || id), 1, 8)) AS UBIGINT) % 2 = 0
             |    THEN d ELSE -d END AS sd
             |  FROM base, reps),
             |ps AS (SELECT rep, SUM(sd) AS ps FROM f GROUP BY 1),
             |x AS (SELECT SUM(CASE WHEN
             |      abs(CAST(ps AS DOUBLE) / CAST(n AS DOUBLE))
             |      >= abs(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             |    THEN 1 ELSE 0 END) AS ne
             |  FROM ps, obs)
             |SELECT CAST(n AS BIGINT) AS n,
             |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6, 6)
             |    AS obs_diff,
             |  CAST(ne AS BIGINT) AS n_extreme,
             |  round((CAST(1 AS DOUBLE) + CAST(ne AS DOUBLE))
             |    / CAST(65 AS DOUBLE), 6) AS p_value
             |FROM x, obs""".stripMargin)),

    // ----- priority sampling: exact-k weighted sample + estimator ------------
    // Top-50 order rows by the integer priority wq·2³² div u (pure
    // BIGINT floor division — the double form would shed mantissa),
    // τ = the 51st priority, est_weight = max(w, τ) (Duffield et al.
    // 2007's unbiased subset-sum estimator).
    "q241_priority_sample" -> Entry(
      (s, dir) => Sampling.prioritySample(t(s, dir, "orders"),
        "o_orderkey", "o_totalprice", k = 50, salt = "prio", scale = 2),
      Some("""WITH base AS (SELECT o_orderkey AS id,
             |    CAST(o_totalprice AS DOUBLE) AS w,
             |    CAST(floor(CAST(o_totalprice AS DOUBLE)
             |      * CAST(100 AS DOUBLE) + 0.5) AS BIGINT) AS wq,
             |    CAST(CAST(('0x' || substr(md5('prio|'
             |      || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT)
             |      AS BIGINT) + 1 AS u
             |  FROM orders
             |  WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL),
             |p AS (SELECT id, w, wq, (wq * 4294967296) // u AS pq
             |  FROM base WHERE wq > 0),
             |top AS (SELECT id, w, pq,
             |    ROW_NUMBER() OVER (ORDER BY pq DESC, id) AS rn
             |  FROM p QUALIFY rn <= 51),
             |tau AS (SELECT MAX(pq) AS tq FROM top WHERE rn = 51)
             |SELECT id, w AS weight, CAST(pq AS BIGINT) AS priority_q,
             |  round(greatest(w, CAST(tq AS DOUBLE)
             |    / CAST(100 AS DOUBLE)), 6) AS est_weight
             |FROM top, tau WHERE rn <= 50 ORDER BY pq DESC, id"""
        .stripMargin)),

    // ----- split-conformal calibration threshold -----------------------------
    // The exact ⌈(n+1)(1−α)⌉-th smallest nonconformity score (order
    // statistic, NOT an interpolated percentile — interpolation voids
    // the finite-sample coverage guarantee) + the empirical coverage
    // it achieves. The rank rides Rank.globalRank — no corpus window.
    "q242_conformal" -> Entry(
      (s, dir) => Metrics.conformalThreshold(
        t(s, dir, "documents")
          .select(col("doc_id"),
            (col("n_chars").cast("double") / lit(1000.0)).as("score")),
        "score", "doc_id", alpha = 0.1),
      Some("""WITH base AS (SELECT
             |    CAST(n_chars AS DOUBLE) / CAST(1000 AS DOUBLE) AS s,
             |    doc_id AS id FROM documents
             |  WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL),
             |nn AS (SELECT COUNT(*) AS n FROM base),
             |kk AS (SELECT n, CAST(ceil((CAST(n AS DOUBLE)
             |    + CAST(1 AS DOUBLE)) * CAST(0.9 AS DOUBLE)) AS BIGINT)
             |    AS k FROM nn),
             |r AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s, id) AS rn
             |  FROM base),
             |thr AS (SELECT MAX(s) AS qhat FROM r, kk WHERE rn = k),
             |cov AS (SELECT SUM(CASE WHEN s <= qhat THEN 1 ELSE 0 END)
             |    AS c FROM base, thr)
             |SELECT CAST(n AS BIGINT) AS n, k, qhat,
             |  CASE WHEN qhat IS NULL THEN CAST(1 AS DOUBLE)
             |    ELSE round(CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 6)
             |  END AS coverage
             |FROM kk, thr, cov""".stripMargin)),

    // ----- memorization scan (verbatim n-gram overlap, generation side) ------
    // Candidates are the %17 docs with every 6th token corrupted, so
    // 4-gram windows clear of a corruption match their own original in
    // the corpus and windows spanning one don't — real mixed rates and
    // run lengths. The candidate window set broadcasts; the corpus
    // streams one scan (zero corpus exchange).
    "q243_memorization" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val cand = d.filter(col("doc_id") % 17 === 0)
          .select(col("doc_id"),
            array_join(transform(TextAnalysis.tokens(col("text")),
              (w, i) => when((i + 1) % 6 === 0, lit("zz")).otherwise(w)),
              " ").as("text"))
        Decontaminate.memorizationScan(cand, d, "doc_id", "text", n = 4)
          .orderBy("id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, $TOKS AS w FROM documents
              |  WHERE doc_id % 17 = 0 AND text IS NOT NULL),
              |cand AS (SELECT doc_id, [CASE WHEN i % 6 = 0 THEN 'zz'
              |    ELSE w[i] END for i in generate_series(1, len(w))]
              |    AS cw FROM tk),
              |cw AS (SELECT doc_id, i AS pos,
              |    array_to_string(cw[i:i+3], ' ') AS g
              |  FROM cand, unnest(generate_series(1, len(cw) - 3))
              |    AS u(i)),
              |cg AS (SELECT DISTINCT array_to_string(w2[i:i+3], ' ')
              |    AS g
              |  FROM (SELECT $TOKS AS w2 FROM documents
              |    WHERE text IS NOT NULL),
              |    unnest(generate_series(1, len(w2) - 3)) AS u(i)),
              |m AS (SELECT DISTINCT cw.g FROM cw JOIN cg ON cg.g = cw.g),
              |fl AS (SELECT doc_id, pos,
              |    CASE WHEN m.g IS NOT NULL THEN 1 ELSE 0 END AS mm
              |  FROM cw LEFT JOIN m ON m.g = cw.g),
              |cnts AS (SELECT doc_id, COUNT(*) AS n_windows,
              |    SUM(mm) AS n_matched FROM fl GROUP BY 1),
              |runs AS (SELECT doc_id, MAX(cnt) AS max_run FROM (
              |  SELECT doc_id, grp, COUNT(*) AS cnt FROM (
              |    SELECT doc_id, pos, pos - ROW_NUMBER() OVER (
              |      PARTITION BY doc_id ORDER BY pos) AS grp
              |    FROM fl WHERE mm = 1) GROUP BY 1, 2) GROUP BY 1)
              |SELECT tk.doc_id AS id,
              |  CAST(coalesce(n_windows, 0) AS BIGINT) AS n_windows,
              |  CAST(coalesce(n_matched, 0) AS BIGINT) AS n_matched,
              |  CASE WHEN coalesce(n_windows, 0) > 0 THEN
              |    round(CAST(n_matched AS DOUBLE)
              |      / CAST(n_windows AS DOUBLE), 6) END AS mem_rate,
              |  CAST(coalesce(max_run, 0) AS BIGINT) AS max_run,
              |  CAST(CASE WHEN coalesce(max_run, 0) > 0
              |    THEN max_run + 3 ELSE 0 END AS BIGINT)
              |    AS max_span_tokens
              |FROM tk LEFT JOIN cnts ON cnts.doc_id = tk.doc_id
              |LEFT JOIN runs ON runs.doc_id = tk.doc_id
              |ORDER BY id""".stripMargin)),

    // ----- Zipf rank-frequency fit -------------------------------------------
    // Log-log OLS over the top-100 terms: each ln quantizes to a 1e-6
    // long (1-ulp libm divergence absorbed — the q234 discipline), the
    // OLS sums are pure BIGINT, slope/intercept/r² are fixed-order
    // double expressions of those longs.
    "q244_zipf_fit" -> Entry(
      (s, dir) => Profiles.zipfFit(t(s, dir, "documents"), "text", 100),
      Some("""WITH tk AS (SELECT unnest(regexp_split_to_array(
             |    trim(text), '\s+')) AS t FROM documents
             |  WHERE text IS NOT NULL),
             |c AS (SELECT t, COUNT(*) AS c FROM tk WHERE t <> ''
             |  GROUP BY 1 ORDER BY c DESC, t LIMIT 100),
             |r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t)
             |    AS rk FROM c),
             |q AS (SELECT CAST(floor(ln(CAST(rk AS DOUBLE)) * 1e6
             |      + 0.5) AS BIGINT) AS x,
             |    CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6 + 0.5)
             |      AS BIGINT) AS y FROM r),
             |s AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
             |    CAST(SUM(y) AS BIGINT) AS sy,
             |    CAST(SUM(x * y) AS BIGINT) AS sxy,
             |    CAST(SUM(x * x) AS BIGINT) AS sxx,
             |    CAST(SUM(y * y) AS BIGINT) AS syy FROM q),
             |f AS (SELECT n, n * sxy - sx * sy AS cov,
             |    n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy,
             |    sx, sy FROM s)
             |SELECT CAST(n AS BIGINT) AS n_terms,
             |  CASE WHEN vx <> 0 THEN round(CAST(cov AS DOUBLE)
             |    / CAST(vx AS DOUBLE), 6) END AS slope,
             |  CASE WHEN vx <> 0 THEN round((CAST(sy AS DOUBLE)
             |    - CAST(cov AS DOUBLE) / CAST(vx AS DOUBLE)
             |      * CAST(sx AS DOUBLE))
             |    / CAST(n AS DOUBLE) / 1e6, 6) END AS intercept,
             |  CASE WHEN vx <> 0 AND vy <> 0 THEN
             |    round(CAST(cov AS DOUBLE) * CAST(cov AS DOUBLE)
             |      / (CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)), 6)
             |  END AS r2
             |FROM f""".stripMargin)),

    // ----- simplified-silhouette cluster quality -----------------------------
    // Per-vector cohesion/separation against the q231 8-centroid
    // codebook, rolled up per cluster; per-row s quantizes to a 1e-6
    // long before the mean (sum-of-doubles association order differs
    // across engines; integer sums cannot).
    "q245_cluster_quality" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.clusterQuality(emb, "vec_id", "embedding",
            emb.filter(col("vec_id") < 8), "vec_id", "embedding")
          .orderBy("cluster")
      },
      Some {
        val cos =
          """round(
            |    list_sum([e.embedding[i]::DOUBLE * c.cv[i]::DOUBLE
            |      for i in generate_series(1, len(e.embedding))]) /
            |    (sqrt(list_sum([e.embedding[i]::DOUBLE
            |        * e.embedding[i]::DOUBLE
            |      for i in generate_series(1, len(e.embedding))])) *
            |     sqrt(list_sum([c.cv[i]::DOUBLE * c.cv[i]::DOUBLE
            |      for i in generate_series(1, len(c.cv))]))), 6)"""
            .stripMargin
        s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv
           |  FROM embeddings WHERE vec_id < 8),
           |sc AS (SELECT e.vec_id AS id, c.cid, $cos AS cs
           |  FROM embeddings e, c),
           |rk AS (SELECT id, cid, cs, ROW_NUMBER() OVER (
           |    PARTITION BY id ORDER BY cs DESC, cid) AS rn FROM sc),
           |ab AS (SELECT t1.id, t1.cid AS cluster,
           |    CAST(1 AS DOUBLE) - t1.cs AS a,
           |    CAST(1 AS DOUBLE) - t2.cs AS b
           |  FROM (SELECT * FROM rk WHERE rn = 1) t1
           |  JOIN (SELECT * FROM rk WHERE rn = 2) t2 USING (id)),
           |sq AS (SELECT cluster, CAST(floor((CASE
           |    WHEN greatest(a, b) = 0 THEN CAST(0 AS DOUBLE)
           |    ELSE (b - a) / greatest(a, b) END) * 1e6 + 0.5)
           |    AS BIGINT) AS sq FROM ab)
           |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n,
           |  round(CAST(SUM(sq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           |    / 1e6, 6) AS mean_silhouette
           |FROM sq GROUP BY 1 ORDER BY cluster""".stripMargin
      }),

    // ----- token↔label mutual information ------------------------------------
    // Which tokens mark English: per-token 2×2 presence×label counts,
    // each cell's pointwise term quantized to a 1e-9 long, ranked by
    // the quantized MI with a term tiebreak so top-k membership
    // cannot drift on a 1-ulp log2 difference.
    "q246_token_mi" -> Entry(
      (s, dir) => Vocab.tokenLabelMi(t(s, dir, "documents"), "doc_id",
        "text", col("lang") === "en", minDf = 5L, topK = 30),
      Some {
        def cell(nij: String, ni: String, nj: String) =
          s"""CASE WHEN $nij > 0 THEN CAST(floor(
             |    CAST($nij AS DOUBLE) / CAST(N AS DOUBLE)
             |    * log2(CAST(N AS DOUBLE) * CAST($nij AS DOUBLE)
             |      / (CAST($ni AS DOUBLE) * CAST($nj AS DOUBLE)))
             |    * 1e9 + 0.5) AS BIGINT) ELSE 0 END""".stripMargin
        s"""WITH base AS (SELECT doc_id, text, (lang = 'en') AS y
           |  FROM documents WHERE doc_id IS NOT NULL
           |    AND text IS NOT NULL AND lang IS NOT NULL),
           |tot AS (SELECT COUNT(*) AS N,
           |    SUM(CASE WHEN y THEN 1 ELSE 0 END) AS N1 FROM base),
           |tk AS (SELECT y, unnest(list_distinct(
           |    regexp_split_to_array(trim(text), '\\s+'))) AS term
           |  FROM base),
           |pt AS (SELECT term, COUNT(*) AS df,
           |    SUM(CASE WHEN y THEN 1 ELSE 0 END) AS d1
           |  FROM tk WHERE term <> '' GROUP BY 1
           |  HAVING COUNT(*) >= 5),
           |sc AS (SELECT term, df, d1,
           |    CAST(N AS BIGINT) - CAST(N1 AS BIGINT) AS n0,
           |    df - d1 AS d0, N, N1 FROM pt, tot),
           |mi AS (SELECT term, df, d1,
           |    ${cell("d1", "df", "N1")}
           |    + ${cell("d0", "df", "n0")}
           |    + ${cell("(N1 - d1)", "(N - df)", "N1")}
           |    + ${cell("(n0 - d0)", "(N - df)", "n0")} AS miq
           |  FROM sc)
           |SELECT term, CAST(df AS BIGINT) AS df,
           |  CAST(d1 AS BIGINT) AS d1,
           |  round(CAST(miq AS DOUBLE) / 1e9, 6) AS mi
           |FROM mi ORDER BY miq DESC, term LIMIT 30""".stripMargin
      }),

    // ----- Flesch readability -------------------------------------------------
    // Machine-heuristic Flesch reading ease per doc: terminal-
    // punctuation sentences (min 1), vowel-group syllables (min 1 per
    // word), one fixed-order score expression. Pure projection.
    "q247_readability" -> Entry(
      (s, dir) => TextAnalysis.readability(t(s, dir, "documents"),
        "doc_id", "text").orderBy("id"),
      Some(s"""WITH tk AS (SELECT doc_id AS id,
              |    list_filter($TOKS, w -> w <> '') AS w, text
              |  FROM documents
              |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
              |m AS (SELECT id, CAST(len(w) AS BIGINT) AS words,
              |    CAST(greatest(len(regexp_extract_all(text,
              |      '[.!?]+')), 1) AS BIGINT) AS sentences,
              |    CAST(coalesce(list_sum([greatest(
              |      len(regexp_extract_all(lower(x), '[aeiouy]+')), 1)
              |      for x in w]), 0) AS BIGINT) AS syllables
              |  FROM tk)
              |SELECT id, words, sentences, syllables,
              |  CASE WHEN words > 0 THEN round(CAST(206.835 AS DOUBLE)
              |    - CAST(1.015 AS DOUBLE) * (CAST(words AS DOUBLE)
              |      / CAST(sentences AS DOUBLE))
              |    - CAST(84.6 AS DOUBLE) * (CAST(syllables AS DOUBLE)
              |      / CAST(words AS DOUBLE)), 6) END AS flesch
              |FROM m ORDER BY id""".stripMargin)),

    // ----- vocabulary richness -------------------------------------------------
    // Types/tokens/hapax/dis + TTR and hapax share — all integers to
    // one summary row, two single-division ratios.
    "q248_vocab_richness" -> Entry(
      (s, dir) => Profiles.vocabRichness(t(s, dir, "documents"), "text"),
      Some(s"""WITH tk AS (SELECT unnest($TOKS) AS t FROM documents
              |  WHERE text IS NOT NULL),
              |c AS (SELECT t, COUNT(*) AS c FROM tk WHERE t <> ''
              |  GROUP BY 1),
              |a AS (SELECT COUNT(*) AS types,
              |    CAST(SUM(c) AS BIGINT) AS tokens,
              |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
              |      AS BIGINT) AS hapax,
              |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)
              |      AS BIGINT) AS dis FROM c)
              |SELECT CAST(types AS BIGINT) AS types, tokens, hapax, dis,
              |  round(CAST(types AS DOUBLE) / CAST(tokens AS DOUBLE), 6)
              |    AS ttr,
              |  round(CAST(hapax AS DOUBLE) / CAST(types AS DOUBLE), 6)
              |    AS hapax_rate
              |FROM a""".stripMargin)),

    // ----- per-key trimmed mean -------------------------------------------------
    // 10%-each-tail trimmed mean of order totals per priority class —
    // rides the bucketed two-phase exact per-key rank (one corpus
    // exchange, no per-key window); the mean is a ratio of quantized
    // longs.
    "q249_trimmed_mean" -> Entry(
      (s, dir) => Profiles.trimmedMeanByKey(t(s, dir, "orders"),
          "o_orderpriority", "o_orderkey", "o_totalprice",
          trimBp = 1000, scale = 2)
        .withColumnRenamed("key", "o_orderpriority")
        .orderBy("o_orderpriority"),
      Some("""WITH base AS (SELECT o_orderpriority AS key,
             |    o_orderkey AS id, CAST(o_totalprice AS DOUBLE) AS v
             |  FROM orders
             |  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL),
             |r AS (SELECT key, id, v,
             |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY v, id)
             |      AS rn,
             |    COUNT(*) OVER (PARTITION BY key) AS n FROM base),
             |p AS (SELECT key, v, CASE WHEN n <= 1
             |    THEN CAST(0 AS DOUBLE)
             |    ELSE CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
             |    END AS pct FROM r),
             |k AS (SELECT key, COUNT(*) AS n_kept,
             |    CAST(SUM(CAST(floor(v * CAST(100 AS DOUBLE) + 0.5)
             |      AS BIGINT)) AS BIGINT) AS s
             |  FROM p WHERE pct >= CAST(0.1 AS DOUBLE)
             |    AND pct <= CAST(1 AS DOUBLE) - CAST(0.1 AS DOUBLE)
             |  GROUP BY 1),
             |tot AS (SELECT key, COUNT(*) AS n FROM base GROUP BY 1)
             |SELECT tot.key AS o_orderpriority,
             |  CAST(tot.n AS BIGINT) AS n,
             |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
             |  round(CAST(s AS DOUBLE) / CAST(k.n_kept AS DOUBLE)
             |    / CAST(100 AS DOUBLE), 6) AS trimmed_mean
             |FROM tot LEFT JOIN k ON k.key = tot.key
             |ORDER BY o_orderpriority""".stripMargin)),

    // ----- distinct-n generation diversity -------------------------------------
    // Corpus-pooled distinct/total n-gram ratios for n = 1..3 — the
    // mode-collapse alarm; two-phase distinct aggregation, one
    // division per order.
    "q250_distinct_n" -> Entry(
      (s, dir) => Metrics.distinctN(t(s, dir, "documents"), "text",
        maxN = 3).orderBy("n"),
      Some {
        val per = (1 to 3).map { n =>
          s"""SELECT $n AS n, COUNT(*) AS n_total,
             |  COUNT(DISTINCT g) AS n_distinct FROM (
             |  SELECT array_to_string(w[i:i + ${n - 1}], ' ') AS g
             |  FROM (SELECT $TOKS AS w FROM documents
             |    WHERE text IS NOT NULL AND trim(text) <> ''),
             |  unnest(generate_series(1, len(w) - ${n - 1})) AS u(i))"""
            .stripMargin
        }.mkString("\nUNION ALL\n")
        s"""SELECT CAST(n AS INT) AS n, CAST(n_total AS BIGINT)
           |    AS n_total,
           |  CAST(n_distinct AS BIGINT) AS n_distinct,
           |  CASE WHEN n_total > 0 THEN
           |    round(CAST(n_distinct AS DOUBLE)
           |      / CAST(n_total AS DOUBLE), 6) END AS distinct_ratio
           |FROM ($per) ORDER BY n""".stripMargin
      }),

    // ----- k-core peeling ------------------------------------------------------
    // Three synchronous peels at k = 6 over the dense q176 4-family
    // graph (k=6 leaves a 19-vertex core with 3 vertices genuinely
    // peeled; k=8 cascades to empty — a 0-row oracle checks nothing).
    // Integer degrees end-to-end; the oracle unrolls each peel as
    // HAVING + two joins.
    "q251_kcore" -> Entry(
      (s, dir) => {
        val base = t(s, dir, "documents").select(col("doc_id"))
        def fam(m: Int, c: Int) =
          struct((col("doc_id") % 23).as("s"),
            ((col("doc_id") * m + c) % 23).as("t"))
        val edges = base.select(explode(array(
            fam(7, 3), fam(5, 1), fam(3, 11), fam(9, 2))).as("e"))
          .select(col("e.s").as("s"), col("e.t").as("t"))
        Graph.kCore(edges, "s", "t", k = 6, sweeps = 3).orderBy("id")
      },
      Some {
        def sweep(prev: String, i: Int): String =
          s"""k$i AS (SELECT a AS id FROM $prev GROUP BY a
             |  HAVING COUNT(*) >= 6),
             |e$i AS (SELECT e.a, e.b FROM $prev e
             |  JOIN k$i x ON x.id = e.a JOIN k$i y ON y.id = e.b)"""
            .stripMargin
        s"""WITH r AS (
           |  SELECT doc_id % 23 AS s, (doc_id * 7 + 3) % 23 AS t
           |    FROM documents
           |  UNION ALL
           |  SELECT doc_id % 23, (doc_id * 5 + 1) % 23 FROM documents
           |  UNION ALL
           |  SELECT doc_id % 23, (doc_id * 3 + 11) % 23 FROM documents
           |  UNION ALL
           |  SELECT doc_id % 23, (doc_id * 9 + 2) % 23 FROM documents),
           |e0 AS (SELECT DISTINCT a, b FROM (
           |  SELECT s AS a, t AS b FROM r WHERE s <> t
           |  UNION ALL SELECT t, s FROM r WHERE s <> t)),
           |${sweep("e0", 1)},
           |${sweep("e1", 2)},
           |${sweep("e2", 3)}
           |SELECT a AS id, CAST(COUNT(*) AS BIGINT) AS degree
           |FROM e3 GROUP BY a ORDER BY id""".stripMargin
      }),

    // ----- degree assortativity ------------------------------------------------
    // Newman's degree-correlation r over the q143 affine graph — all
    // integer sums over oriented edge-endpoints, one fixed-order
    // final expression.
    "q252_assortativity" -> Entry(
      (s, dir) => Graph.assortativity(
        t(s, dir, "documents")
          .select((col("doc_id") % 53).as("src"),
            ((col("doc_id") * 7 + 11) % 53).as("dst")),
        "src", "dst"),
      Some("""WITH d AS (SELECT doc_id % 53 AS a,
             |    (doc_id * 7 + 11) % 53 AS b FROM documents
             |  WHERE doc_id % 53 <> (doc_id * 7 + 11) % 53),
             |sym AS (SELECT DISTINCT a, b FROM (
             |  SELECT a, b FROM d UNION ALL SELECT b, a FROM d)),
             |deg AS (SELECT a AS id, COUNT(*) AS dg FROM sym
             |  GROUP BY 1),
             |j AS (SELECT da.dg AS ja, db.dg AS jb FROM sym
             |  JOIN deg da ON da.id = sym.a
             |  JOIN deg db ON db.id = sym.b),
             |s AS (SELECT COUNT(*) AS m2,
             |    CAST(SUM(ja * jb) AS BIGINT) AS sjk,
             |    CAST(SUM(ja) AS BIGINT) AS sj,
             |    CAST(SUM(ja * ja) AS BIGINT) AS sjj FROM j),
             |f AS (SELECT m2, CAST(sj AS DOUBLE) / CAST(m2 AS DOUBLE)
             |    AS mean, sjk, sjj FROM s)
             |SELECT CAST(m2 / 2 AS BIGINT) AS m_edges,
             |  CASE WHEN CAST(sjj AS DOUBLE) / CAST(m2 AS DOUBLE)
             |      - mean * mean <> 0 THEN
             |    round((CAST(sjk AS DOUBLE) / CAST(m2 AS DOUBLE)
             |        - mean * mean)
             |      / (CAST(sjj AS DOUBLE) / CAST(m2 AS DOUBLE)
             |        - mean * mean), 6) END AS assortativity
             |FROM f""".stripMargin)),

    // ----- Gini key concentration ----------------------------------------------
    // Lorenz rank-form Gini over the per-language row counts — the
    // keySkew one-number summary; integer sums, NULLS FIRST pinned on
    // the key tiebreak.
    "q253_gini" -> Entry(
      (s, dir) => Profiles.giniConcentration(
        t(s, dir, "documents"), "lang"),
      Some("""WITH c AS (SELECT CAST(lang AS VARCHAR) AS k,
             |    COUNT(*) AS x FROM documents GROUP BY 1),
             |r AS (SELECT x, ROW_NUMBER() OVER (
             |    ORDER BY x, k NULLS FIRST) AS i FROM c),
             |s AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS tot,
             |    CAST(SUM(i * x) AS BIGINT) AS ix FROM r)
             |SELECT CAST(n AS BIGINT) AS n_keys, tot AS total,
             |  CASE WHEN n >= 2 THEN round((CAST(2 AS DOUBLE)
             |      * CAST(ix AS DOUBLE)
             |    - CAST(n + 1 AS DOUBLE) * CAST(tot AS DOUBLE))
             |    / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)), 6)
             |  END AS gini
             |FROM s""".stripMargin)),

    // ----- two-sample Kolmogorov–Smirnov drift -------------------------------
    // Length drift between the 'en' slice and the rest: integer running
    // counts (range-decomposed on the Spark side, window on the
    // oracle's — both exact over integers), one division per observed
    // value, order-insensitive max.
    "q254_ks_test" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents")
        Profiles.ksTest(
          d.filter(col("lang") === "en"),
          d.filter(col("lang").isNotNull && col("lang") =!= "en"),
          "n_chars")
      },
      Some("""WITH a AS (SELECT CAST(n_chars AS DOUBLE) AS v
             |    FROM documents WHERE lang = 'en' AND n_chars IS NOT NULL),
             |b AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
             |  WHERE lang IS NOT NULL AND lang <> 'en'
             |    AND n_chars IS NOT NULL),
             |c AS (SELECT v, SUM(ca) AS ca, SUM(cb) AS cb FROM (
             |    SELECT v, 1 AS ca, 0 AS cb FROM a
             |    UNION ALL SELECT v, 0, 1 FROM b) GROUP BY v),
             |r AS (SELECT SUM(ca) OVER (ORDER BY v) AS ra,
             |    SUM(cb) OVER (ORDER BY v) AS rb FROM c),
             |t AS (SELECT (SELECT COUNT(*) FROM a) AS na,
             |    (SELECT COUNT(*) FROM b) AS nb)
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  round(MAX(abs(CAST(ra AS DOUBLE) / CAST(na AS DOUBLE)
             |    - CAST(rb AS DOUBLE) / CAST(nb AS DOUBLE))), 6) AS d_stat
             |FROM r, t GROUP BY na, nb""".stripMargin)),

    // ----- Cramér's V categorical association --------------------------------
    // source × lang association — per-cell χ² terms quantized to longs
    // (floor(t·1e9 + 0.5), the coOccurrence convention) so the cell sum
    // is association-order-exact; both engines evaluate the identical
    // fixed-order double expression per cell.
    "q255_cramers_v" -> Entry(
      (s, dir) => Profiles.cramersV(
        t(s, dir, "documents"), "source", "lang"),
      Some("""WITH base AS (SELECT CAST(source AS VARCHAR) AS a,
             |    CAST(lang AS VARCHAR) AS b FROM documents
             |  WHERE source IS NOT NULL AND lang IS NOT NULL),
             |cells AS (SELECT a, b, COUNT(*) AS o FROM base GROUP BY a, b),
             |ra AS (SELECT a, COUNT(*) AS ra FROM base GROUP BY a),
             |cb AS (SELECT b, COUNT(*) AS cb FROM base GROUP BY b),
             |t AS (SELECT COUNT(*) AS n, COUNT(DISTINCT a) AS ka,
             |    COUNT(DISTINCT b) AS kb FROM base),
             |terms AS (SELECT
             |    CAST(coalesce(o, 0) AS DOUBLE)
             |      - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
             |        / CAST(n AS DOUBLE) AS d,
             |    CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
             |      / CAST(n AS DOUBLE) AS e
             |  FROM ra CROSS JOIN cb
             |    LEFT JOIN cells USING (a, b)
             |    CROSS JOIN t),
             |f AS (SELECT (SELECT MAX(n) FROM t) AS n,
             |    (SELECT MAX(ka) FROM t) AS ka,
             |    (SELECT MAX(kb) FROM t) AS kb,
             |    SUM(CAST(floor(d * d / e * CAST(1e9 AS DOUBLE)
             |      + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS chi9
             |  FROM terms)
             |SELECT CAST(coalesce(n, 0) AS BIGINT) AS n,
             |  CAST(coalesce(ka, 0) AS BIGINT) AS categories_a,
             |  CAST(coalesce(kb, 0) AS BIGINT) AS categories_b,
             |  round(CAST(coalesce(chi9, 0) AS DOUBLE)
             |    / CAST(1e9 AS DOUBLE), 6) AS chi2,
             |  CASE WHEN ka >= 2 AND kb >= 2 THEN
             |    round(sqrt(CAST(chi9 AS DOUBLE) / CAST(1e9 AS DOUBLE)
             |      / (CAST(n AS DOUBLE)
             |        * CAST(LEAST(ka, kb) - 1 AS DOUBLE))), 6)
             |  END AS cramers_v
             |FROM f""".stripMargin)),

    // ----- HITS hubs & authorities -------------------------------------------
    // Two sweeps of the UNNORMALIZED integer form over the dense q176
    // 4-family graph — all-ones init, auth-then-hub per sweep, pure
    // integer sums end-to-end (normalization is a positive per-sweep
    // scalar: dropping it keeps the ranking and makes the oracle plain
    // unrolled SQL).
    "q256_hits" -> Entry(
      (s, dir) => {
        val base = t(s, dir, "documents").select(col("doc_id"))
        def fam(m: Int, c: Int) =
          struct((col("doc_id") % 23).as("s"),
            ((col("doc_id") * m + c) % 23).as("t"))
        val edges = base.select(explode(array(
            fam(7, 3), fam(5, 1), fam(3, 11), fam(9, 2))).as("e"))
          .select(col("e.s").as("s"), col("e.t").as("t"))
        Graph.hits(edges, "s", "t", sweeps = 2).orderBy("id")
      },
      Some {
        def sweep(ph: String, pa: String, i: Int): String =
          s"""a$i AS (SELECT v.id, COALESCE(x.s, 0) AS auth FROM v
             |  LEFT JOIN (SELECT e.dst AS id, SUM($ph.hub) AS s
             |    FROM e JOIN $ph ON $ph.id = e.src GROUP BY e.dst) x
             |  ON x.id = v.id),
             |h$i AS (SELECT v.id, COALESCE(x.s, 0) AS hub FROM v
             |  LEFT JOIN (SELECT e.src AS id, SUM(a$i.auth) AS s
             |    FROM e JOIN a$i ON a$i.id = e.dst GROUP BY e.src) x
             |  ON x.id = v.id)""".stripMargin
        s"""WITH r AS (
           |  SELECT doc_id % 23 AS s, (doc_id * 7 + 3) % 23 AS t
           |    FROM documents
           |  UNION ALL
           |  SELECT doc_id % 23, (doc_id * 5 + 1) % 23 FROM documents
           |  UNION ALL
           |  SELECT doc_id % 23, (doc_id * 3 + 11) % 23 FROM documents
           |  UNION ALL
           |  SELECT doc_id % 23, (doc_id * 9 + 2) % 23 FROM documents),
           |e AS (SELECT DISTINCT s AS src, t AS dst FROM r WHERE s <> t),
           |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
           |h0 AS (SELECT id, 1 AS hub FROM v),
           |${sweep("h0", "a0", 1)},
           |${sweep("h1", "a1", 2)}
           |SELECT v.id, CAST(h2.hub AS BIGINT) AS hub,
           |  CAST(a2.auth AS BIGINT) AS auth
           |FROM v JOIN h2 ON h2.id = v.id JOIN a2 ON a2.id = v.id
           |ORDER BY v.id""".stripMargin
      }),

    // ----- exact edit-distance join (FastSS deletion neighborhoods) ----------
    // Typo-grade near-dup pairs among the distinct 3-word text prefixes
    // at distance ≤ 2 — lossless deletion-neighborhood blocking + real
    // levenshtein verification on the Spark side; the oracle brute-
    // forces the quadratic join with a length prefilter. Two different
    // algorithms agreeing on the exact pair set is the pin.
    "q257_edit_join" -> Entry(
      (s, dir) => {
        val phrases = t(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(array_join(
            slice(split(col("text"), " "), 1, 3), " ").as("phrase"))
        Dedup.editDistanceJoin(phrases, "phrase", maxDist = 2)
          .select(col("a"), col("b"), col("dist").cast("long").as("dist"))
          .orderBy("a", "b")
      },
      Some("""WITH s AS (SELECT DISTINCT array_to_string(
             |    list_slice(string_split(text, ' '), 1, 3), ' ') AS v
             |  FROM documents WHERE text IS NOT NULL)
             |SELECT a.v AS a, b.v AS b,
             |  CAST(levenshtein(a.v, b.v) AS BIGINT) AS dist
             |FROM s a JOIN s b ON a.v < b.v
             |  AND abs(length(a.v) - length(b.v)) <= 2
             |  AND levenshtein(a.v, b.v) <= 2
             |ORDER BY a, b""".stripMargin)),

    // ----- inactivity-gap sessionization --------------------------------------
    // 12-hour-gap sessions for the first 30 users (events are sparse —
    // median inter-event gap ~7 h — so 12 h splits real sessions
    // instead of one-event confetti). Integer-nano walk, integer
    // running session index; both engines window per user.
    "q258_sessionize" -> Entry(
      (s, dir) => Funnel.sessionize(
        Queries.events(s, dir).filter(col("user_id") < 30),
        "user_id", "ts", "event_id", gapNanos = 43200000000000L)
        .orderBy("user_id", "session_idx"),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) * 1000 AS ts,
             |    event_id FROM events
             |  WHERE user_id < 30 AND user_id IS NOT NULL
             |    AND ts IS NOT NULL),
             |f AS (SELECT user_id, ts, event_id,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |      OR ts - lag(ts) OVER w > 43200000000000
             |      THEN 1 ELSE 0 END AS nw
             |  FROM e WINDOW w AS (
             |    PARTITION BY user_id ORDER BY ts, event_id)),
             |g AS (SELECT user_id, ts,
             |    SUM(nw) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS session_idx
             |  FROM f)
             |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             |  MIN(ts) AS start_ts, MAX(ts) AS end_ts,
             |  CAST(COUNT(*) AS BIGINT) AS n_events
             |FROM g GROUP BY user_id, session_idx
             |ORDER BY user_id, session_idx""".stripMargin)),

    // ----- Markov event-type transitions --------------------------------------
    // First-order per-user transition matrix over the full event log —
    // integer pair counts, row-normalized by one exact division.
    "q259_transitions" -> Entry(
      (s, dir) => Funnel.transitionMatrix(
        Queries.events(s, dir), "user_id", "ts", "event_id", "event_type")
        .orderBy("from_type", "to_type"),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) * 1000 AS ts,
             |    event_id, event_type FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |    AND event_type IS NOT NULL),
             |p AS (SELECT event_type AS from_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS to_type
             |  FROM e),
             |c AS (SELECT from_type, to_type, COUNT(*) AS n FROM p
             |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
             |  FROM c GROUP BY 1)
             |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
             |  round(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS p
             |FROM c JOIN t USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    // ----- Herfindahl-Hirschman key concentration ------------------------------
    // HHI + normalized HHI of the per-source row distribution —
    // decimal-exact Σx² (operands cast to DECIMAL(18,0) BEFORE the
    // square; the decimal never reaches the wire), one fixed-order
    // final division.
    "q260_hhi" -> Entry(
      (s, dir) => Profiles.hhi(t(s, dir, "documents"), "source"),
      Some("""WITH c AS (SELECT CAST(source AS VARCHAR) AS k,
             |    COUNT(*) AS x FROM documents GROUP BY 1),
             |s AS (SELECT COUNT(*) AS n_keys,
             |    CAST(SUM(x) AS BIGINT) AS total,
             |    SUM(CAST(x AS DECIMAL(18, 0))
             |      * CAST(x AS DECIMAL(18, 0))) AS sx2 FROM c)
             |SELECT CAST(n_keys AS BIGINT) AS n_keys, total,
             |  CASE WHEN total > 0 THEN
             |    round(CAST(sx2 AS DOUBLE)
             |      / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)), 6)
             |  END AS hhi,
             |  CASE WHEN n_keys >= 2 THEN
             |    round((CAST(sx2 AS DOUBLE)
             |        / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE))
             |      - CAST(1.0 AS DOUBLE) / CAST(n_keys AS DOUBLE))
             |      / (CAST(1.0 AS DOUBLE)
             |        - CAST(1.0 AS DOUBLE) / CAST(n_keys AS DOUBLE)), 6)
             |  END AS hhi_norm
             |FROM s""".stripMargin)),

    // ----- Wasserstein-1 drift --------------------------------------------------
    // Earth mover's distance over the same en-vs-rest n_chars split as
    // q254 — KS reports the worst CDF gap, W1 the total transport.
    // Integer cumulatives, per-segment |gap|·width quantized to 1e-6
    // longs; the oracle's LEAD replays the rank+1 self-join.
    "q261_wasserstein" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents")
        Profiles.wasserstein1(
          d.filter(col("lang") === "en"),
          d.filter(col("lang").isNotNull && col("lang") =!= "en"),
          "n_chars")
      },
      Some("""WITH a AS (SELECT CAST(n_chars AS DOUBLE) AS v
             |    FROM documents WHERE lang = 'en' AND n_chars IS NOT NULL),
             |b AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
             |  WHERE lang IS NOT NULL AND lang <> 'en'
             |    AND n_chars IS NOT NULL),
             |c AS (SELECT v, SUM(ca) AS ca, SUM(cb) AS cb FROM (
             |    SELECT v, 1 AS ca, 0 AS cb FROM a
             |    UNION ALL SELECT v, 0, 1 FROM b) GROUP BY v),
             |r AS (SELECT v, SUM(ca) OVER w AS ra, SUM(cb) OVER w AS rb,
             |    LEAD(v) OVER w AS vn FROM c
             |  WINDOW w AS (ORDER BY v)),
             |t AS (SELECT (SELECT COUNT(*) FROM a) AS na,
             |    (SELECT COUNT(*) FROM b) AS nb),
             |s AS (SELECT SUM(CAST(floor(
             |      abs(CAST(ra AS DOUBLE) / CAST(na AS DOUBLE)
             |        - CAST(rb AS DOUBLE) / CAST(nb AS DOUBLE))
             |      * (vn - v) * CAST(1e6 AS DOUBLE)
             |      + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS tq
             |  FROM r, t WHERE vn IS NOT NULL)
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  round(CAST(coalesce(tq, 0) AS DOUBLE)
             |    / CAST(1e6 AS DOUBLE), 6) AS w1
             |FROM s, t""".stripMargin)),

    // ----- multi-source BFS seed expansion --------------------------------------
    // Min-hop distance from seeds {0, 7} over a 2-family directed
    // 53-vertex graph, 3 hops — the frontier-carrying DataFrame twin
    // of q165's WITH RECURSIVE (which re-derives every path; this
    // carries frontiers). Integer hops; the oracle bounds the same
    // walk by depth and takes MIN over the multiplied paths.
    "q262_bfs_reach" -> Entry(
      (s, dir) => {
        val base = t(s, dir, "documents").select(col("doc_id"))
        def fam(m: Int, c: Int) =
          struct((col("doc_id") % 53).as("s"),
            ((col("doc_id") * m + c) % 53).as("t"))
        val edges = base.select(explode(array(
            fam(7, 11), fam(5, 1))).as("e"))
          .select(col("e.s").as("s"), col("e.t").as("t"))
        val seeds = s.range(2).select((col("id") * 7).as("seed"))
        Graph.bfsFrom(edges, "s", "t", seeds, "seed", maxHops = 3)
          .orderBy("id")
      },
      Some("""WITH RECURSIVE e AS (SELECT DISTINCT src, dst FROM (
             |    SELECT doc_id % 53 AS src, (doc_id * 7 + 11) % 53
             |      AS dst FROM documents
             |    UNION ALL
             |    SELECT doc_id % 53, (doc_id * 5 + 1) % 53
             |      FROM documents) u
             |  WHERE src <> dst),
             |r(id, hops) AS (
             |  SELECT CAST(unnest([0, 7]) AS BIGINT) AS id, 0 AS hops
             |  UNION ALL
             |  SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.id
             |  WHERE r.hops < 3)
             |SELECT id, CAST(min(hops) AS BIGINT) AS hops
             |FROM r GROUP BY id ORDER BY id""".stripMargin)),

    // ----- mixed-script homoglyph audit -----------------------------------------
    // Plants Cyrillic 'а' (U+0430) into every 13th doc's text — the
    // classic confusable-spoofing signature — and pins per-doc token /
    // mixed-token counts; both engines plant identically, so the
    // regex-class probes must agree token-for-token.
    "q263_script_mix" -> Entry(
      (s, dir) => {
        val planted = t(s, dir, "documents")
          .filter(col("text").isNotNull && col("doc_id") < 400)
          .select(col("doc_id"),
            when(col("doc_id") % 13 === 0,
              translate(col("text"), "a", "а"))
              .otherwise(col("text")).as("text"))
        TextAnalysis.scriptMixAudit(planted, "doc_id", "text")
          .orderBy("id")
      },
      Some("""WITH p AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0
             |    THEN replace(text, 'a', 'а') ELSE text END AS text
             |  FROM documents WHERE text IS NOT NULL AND doc_id < 400),
             |t AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'),
             |      x -> x <> '') AS tk FROM p),
             |m AS (SELECT doc_id, tk,
             |    list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')
             |      AND regexp_matches(x, '[Ѐ-ӿͰ-Ͽ]')) AS mx FROM t)
             |SELECT doc_id AS id, CAST(len(tk) AS BIGINT) AS n_tokens,
             |  CAST(len(mx) AS BIGINT) AS mixed_tokens,
             |  CASE WHEN len(tk) > 0 THEN
             |    round(CAST(len(mx) AS DOUBLE)
             |      / CAST(len(tk) AS DOUBLE), 6) END AS mixed_ratio
             |FROM m ORDER BY id""".stripMargin)),

    // ----- F1-optimal decision threshold ----------------------------------------
    // Sweeps every observed n_chars value as a >= threshold against a
    // noisily-correlated label — integer cumulative TP/FP over the
    // descending order, quantized-F1 argmax with the highest-threshold
    // tie-break; the oracle windows the same integer cumulatives.
    "q264_best_threshold" -> Entry(
      (s, dir) => Metrics.bestThreshold(
        t(s, dir, "documents").filter(col("n_chars").isNotNull),
        col("n_chars"),
        col("n_chars") + col("doc_id") % 97 > 250),
      Some("""WITH b AS (SELECT CAST(n_chars AS DOUBLE) AS v,
             |    CASE WHEN n_chars + doc_id % 97 > 250 THEN 1 ELSE 0
             |      END AS y
             |  FROM documents WHERE n_chars IS NOT NULL),
             |c AS (SELECT v, CAST(SUM(y) AS BIGINT) AS p,
             |    CAST(SUM(1 - y) AS BIGINT) AS q FROM b GROUP BY v),
             |r AS (SELECT v, SUM(p) OVER w AS tp, SUM(q) OVER w AS fp
             |  FROM c WINDOW w AS (ORDER BY v DESC)),
             |t AS (SELECT CAST(SUM(p) AS BIGINT) AS pt,
             |    CAST(SUM(q) AS BIGINT) AS nt FROM c),
             |cand AS (SELECT v, tp, fp, pt - tp AS fn, nt - fp AS tn,
             |    pt, CAST(floor(CAST(2.0 AS DOUBLE) * CAST(tp AS DOUBLE)
             |      / CAST(2 * tp + fp + (pt - tp) AS DOUBLE)
             |      * CAST(1e12 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             |      AS BIGINT) AS f1q
             |  FROM r, t),
             |m AS (SELECT MAX(f1q) AS m FROM cand),
             |pick AS (SELECT MAX(v) AS bv FROM cand, m WHERE f1q = m.m)
             |SELECT v AS threshold, CAST(tp AS BIGINT) AS tp,
             |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
             |  CAST(tn AS BIGINT) AS tn,
             |  round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6)
             |    AS precision,
             |  round(CAST(tp AS DOUBLE) / CAST(pt AS DOUBLE), 6)
             |    AS recall,
             |  round(CAST(2.0 AS DOUBLE) * CAST(tp AS DOUBLE)
             |    / CAST(2 * tp + fp + fn AS DOUBLE), 6) AS f1
             |FROM cand, pick WHERE v = pick.bv""".stripMargin)),

    // ----- leakage-free K-fold assignment ----------------------------------------
    // q219's GroupShuffleSplit generalized to 5 cross-validation
    // folds: near-dup groups draw the fold, so no candidate pair
    // crosses a fold boundary; the oracle replays closure + md5 % 5.
    "q265_kfold" -> Entry(
      (s, dir) => Pipelines.kFoldSplit(nearDupDocs(s, dir),
          "doc_id", "text", folds = 5)
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $NearDupDocsSql,
              |$MinhashPairsSql,
              |e AS (SELECT doc_a AS eu, doc_b AS ev FROM pairs
              |  UNION SELECT doc_b, doc_a FROM pairs),
              |reach(id, r) AS (
              |  SELECT eu, eu FROM e
              |  UNION
              |  SELECT reach.id, e.ev FROM reach JOIN e ON e.eu = reach.r),
              |comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
              |g AS (SELECT d.doc_id,
              |    CAST(COALESCE(comp.comp, d.doc_id) AS BIGINT) AS "group"
              |  FROM docs d LEFT JOIN comp ON comp.id = d.doc_id)
              |SELECT doc_id, "group",
              |  CAST(CAST(('0x' || substr(md5('kfold|' ||
              |      "group"::VARCHAR), 1, 8)) AS UBIGINT) % 5 AS BIGINT)
              |    AS fold
              |FROM g ORDER BY doc_id""".stripMargin)),

    // ----- per-key AUC (sliced discrimination) ----------------------------------
    // q182's exact midrank algebra per LANGUAGE — the slice eval that
    // catches "coin-flips on one language" before the global number
    // averages it away. Ranks ride the per-key cumulative over the
    // (key, distinct score) aggregated table — integer end-to-end.
    "q266_auc_by_key" -> Entry(
      (s, dir) => Metrics.aucByKey(
        t(s, dir, "documents").filter(col("n_chars").isNotNull),
        col("lang"), col("n_chars"),
        col("n_chars") + col("doc_id") % 97 > 250)
        .orderBy("key"),
      Some("""WITH b AS (SELECT CAST(lang AS VARCHAR) AS key,
             |    CAST(n_chars AS DOUBLE) AS s,
             |    CASE WHEN n_chars + doc_id % 97 > 250 THEN 1 ELSE 0
             |      END AS y
             |  FROM documents WHERE n_chars IS NOT NULL),
             |g AS (SELECT key, s, COUNT(*) AS n,
             |    CAST(SUM(y) AS BIGINT) AS np FROM b GROUP BY key, s),
             |o AS (SELECT key, n, np, SUM(n) OVER (PARTITION BY key
             |    ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND
             |    CURRENT ROW) AS cum FROM g),
             |a AS (SELECT key, SUM(np * (2 * cum - n + 1)) AS sum2,
             |    SUM(np) AS p, SUM(n) AS tot FROM o GROUP BY key)
             |SELECT key, CAST(p AS BIGINT) AS n_pos,
             |  CAST(tot - p AS BIGINT) AS n_neg,
             |  CASE WHEN p > 0 AND tot - p > 0 THEN
             |    round(CAST(sum2 - p * (p + 1) AS DOUBLE) /
             |      CAST(2 * p * (tot - p) AS DOUBLE), 6) END AS auc
             |FROM a ORDER BY key""".stripMargin)),

    // ----- URL harvest from text -------------------------------------------------
    // Plants outlinks into every 11th doc (both engines plant the same
    // bytes) and pins the exploded (id, url, domain) rows — the
    // outlink-graph feed for pagerank/per-domain caps.
    "q267_extract_urls" -> Entry(
      (s, dir) => {
        val planted = t(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"),
            when(col("doc_id") % 11 === 0,
              concat(col("text"), lit(" see https://ex"),
                col("doc_id") % 7, lit(".com/p/"), col("doc_id"),
                lit(" and http://www.ref"), col("doc_id") % 3,
                lit(".org/x?utm_source=t")))
              .otherwise(col("text")).as("text"))
        Urls.extractUrls(planted, "doc_id", "text")
          .orderBy("doc_id", "url")
      },
      Some("""WITH p AS (SELECT doc_id, CASE WHEN doc_id % 11 = 0
             |    THEN text || ' see https://ex' || (doc_id % 7)
             |      || '.com/p/' || doc_id || ' and http://www.ref'
             |      || (doc_id % 3) || '.org/x?utm_source=t'
             |    ELSE text END AS text
             |  FROM documents WHERE text IS NOT NULL),
             |u AS (SELECT doc_id, unnest(regexp_extract_all(text,
             |    'https?://[^\s]+')) AS url FROM p),
             |h AS (SELECT doc_id, url,
             |    lower(regexp_extract(regexp_extract(url,
             |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)', 2),
             |      '([^@]*)$', 1)) AS auth,
             |    lower(regexp_extract(url,
             |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch
             |  FROM u),
             |d AS (SELECT doc_id, url,
             |    CASE WHEN sch = 'http' THEN regexp_replace(auth,
             |        ':80$', '')
             |      WHEN sch = 'https' THEN regexp_replace(auth,
             |        ':443$', '')
             |      ELSE auth END AS host
             |  FROM h)
             |SELECT doc_id, url,
             |  CASE WHEN host <> '' THEN
             |    regexp_replace(host, '^www\.', '') END AS domain
             |FROM d ORDER BY doc_id, url""".stripMargin)),

    // ----- confusable folding ------------------------------------------------------
    // q263's cleanup companion: fold the planted Cyrillic 'а' back
    // onto Latin and pin (changed?, folded prefix) per doc. The base
    // corpus is ASCII and the plant is the single homoglyph, so the
    // oracle's one-char translate replays the full 42-char fold map
    // exactly on this fixture.
    "q268_fold_confusables" -> Entry(
      (s, dir) => {
        val planted = t(s, dir, "documents")
          .filter(col("text").isNotNull && col("doc_id") < 400)
          .select(col("doc_id"),
            when(col("doc_id") % 13 === 0,
              translate(col("text"), "a", "а"))
              .otherwise(col("text")).as("text"))
        val folded = TextAnalysis.foldConfusables(col("text"))
        planted.select(col("doc_id"),
            (folded =!= col("text")).as("changed"),
            substring(folded, 1, 24).as("folded_prefix"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0
             |    THEN replace(text, 'a', 'а') ELSE text END AS text
             |  FROM documents WHERE text IS NOT NULL AND doc_id < 400)
             |SELECT doc_id,
             |  translate(text, 'а', 'a') <> text AS changed,
             |  substring(translate(text, 'а', 'a'), 1, 24)
             |    AS folded_prefix
             |FROM p ORDER BY doc_id""".stripMargin)),

    // ----- empirical-Bayes shrunk rates ---------------------------------------------
    // Per-source "long document" rates pulled toward the global rate
    // by 50 pseudo-counts — integer (n, k) per key, p0 and the shrunk
    // point as fixed-order double expressions.
    "q269_shrunk_rates" -> Entry(
      (s, dir) => Profiles.shrunkRates(
        t(s, dir, "documents"), "source", col("n_chars") > 250,
        priorStrength = 50.0)
        .orderBy("key"),
      Some("""WITH b AS (SELECT CAST(source AS VARCHAR) AS key,
             |    CASE WHEN COALESCE(n_chars > 250, FALSE) THEN 1
             |      ELSE 0 END AS y FROM documents),
             |p AS (SELECT key, COUNT(*) AS n,
             |    CAST(SUM(y) AS BIGINT) AS k FROM b GROUP BY 1),
             |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
             |    CAST(SUM(k) AS BIGINT) AS tk FROM p)
             |SELECT key, CAST(n AS BIGINT) AS n, k,
             |  round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
             |  round((CAST(k AS DOUBLE) + CAST(50.0 AS DOUBLE)
             |      * (CAST(tk AS DOUBLE) / CAST(tn AS DOUBLE)))
             |    / (CAST(n AS DOUBLE) + CAST(50.0 AS DOUBLE)), 6)
             |    AS shrunk_rate
             |FROM p, t ORDER BY key""".stripMargin)),

    // ----- cross-source quantile normalization -----------------------------------
    // Each doc's length mapped onto the POOLED length distribution at
    // its within-source percentile — the batch-effect corrector. The
    // normalized value is a rank-keyed JOIN result (nothing to round);
    // pct is the integer ratio percent_rank evaluates.
    "q270_quantile_normalize" -> Entry(
      (s, dir) => Profiles.quantileNormalize(
        t(s, dir, "documents"), "source", "doc_id", "n_chars")
        .orderBy("id"),
      Some("""WITH s AS (SELECT CAST(source AS VARCHAR) AS k, doc_id,
             |    CAST(n_chars AS DOUBLE) AS v FROM documents
             |  WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL),
             |p AS (SELECT k, doc_id, v, percent_rank() OVER (
             |    PARTITION BY k ORDER BY v, doc_id) AS pct FROM s),
             |n AS (SELECT COUNT(*) AS nn FROM s),
             |g AS (SELECT v AS pv,
             |    ROW_NUMBER() OVER (ORDER BY v, doc_id) AS r FROM s),
             |t AS (SELECT doc_id AS id, k AS key, v AS value, pct,
             |    CAST(floor(pct * CAST(nn - 1 AS DOUBLE)
             |      + CAST(0.5 AS DOUBLE)) AS BIGINT) + 1 AS tr
             |  FROM p, n)
             |SELECT id, key, value, pct, g.pv AS normalized
             |FROM t JOIN g ON g.r = t.tr ORDER BY id""".stripMargin)),

    // ----- DEFLATE compression-ratio quality signal --------------------------------
    // zlib is not SQL-expressible, so the oracle reads PINNED deflate
    // lengths from a committed fixture (fixtures/deflate_lengths
    // .parquet: md5(text) -> level-6 deflated bytes for every doc_id <
    // 400 text at sf0.001/0.01/0.1, generated once through
    // java.util.zip.Deflater — the engine's own codec; JVM zlib is
    // deterministic for fixed input+level) and recomputes the ratio
    // independently from octet_length. Content-addressed join: SF- and
    // id-layout-agnostic, and a fixture miss surfaces as a null-vs-
    // value hash FAIL, never a silent pass. The behavioral contracts
    // (partitioning determinism, repetition < prose < noise ordering,
    // null/empty handling) stay spec-pinned.
    "q271_compression_ratio" -> Entry(
      (s, dir) => TextAnalysis.withCompressionRatio(
        t(s, dir, "documents").filter(col("doc_id") < 400),
        "doc_id", "text")
        .orderBy("id"),
      // fixture path resolved at SQL-dump time (cwd or nearest
      // ancestor holding fixtures/) — no hardcoded repo location;
      // graft.GenDeflateFixture regenerates the file
      Some(s"""WITH f AS (SELECT h, deflated FROM read_parquet(
             |    '${fixturePath("deflate_lengths.parquet")}')),
             |d AS (SELECT CAST(doc_id AS BIGINT) AS id, text
             |  FROM documents WHERE doc_id < 400)
             |SELECT d.id,
             |  CASE WHEN d.text IS NULL THEN NULL
             |    ELSE CAST(octet_length(encode(d.text)) AS BIGINT) END
             |    AS utf8_bytes,
             |  CASE WHEN d.text IS NULL OR octet_length(encode(d.text)) = 0
             |    THEN NULL
             |    ELSE round(CAST(f.deflated AS DOUBLE)
             |      / CAST(octet_length(encode(d.text)) AS DOUBLE), 6) END
             |    AS compression_ratio
             |FROM d LEFT JOIN f ON f.h = md5(d.text)
             |ORDER BY id""".stripMargin)),

    // ----- per-key categorical entropy ----------------------------------------------
    // Language diversity per source in nats — per-category terms
    // quantized to 1e-12 longs (the ln convention), association-order
    // exact.
    "q272_key_entropy" -> Entry(
      (s, dir) => Profiles.categoricalEntropy(
        t(s, dir, "documents"), "source", "lang")
        .orderBy("key"),
      Some("""WITH cells AS (SELECT CAST(source AS VARCHAR) AS key,
             |    CAST(lang AS VARCHAR) AS c, COUNT(*) AS cn
             |  FROM documents GROUP BY 1, 2),
             |t AS (SELECT key, CAST(SUM(cn) AS BIGINT) AS n,
             |    CAST(COUNT(*) AS BIGINT) AS k FROM cells GROUP BY 1),
             |q AS (SELECT cells.key, t.n, t.k,
             |    CAST(floor(CAST(cn AS DOUBLE) / CAST(n AS DOUBLE)
             |      * ln(CAST(n AS DOUBLE) / CAST(cn AS DOUBLE))
             |      * CAST(1e12 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             |      AS BIGINT) AS tq
             |  FROM cells JOIN t USING (key))
             |SELECT key, MAX(n) AS n, MAX(k) AS n_cats,
             |  round(CAST(SUM(tq) AS DOUBLE) / CAST(1e12 AS DOUBLE), 6)
             |    AS entropy
             |FROM q GROUP BY key ORDER BY key""".stripMargin)),

    // ----- code-vs-prose heuristic score ------------------------------------------
    // Plants code-shaped suffixes into every 9th doc and pins all four
    // raw ratios + the fixed-weight score; every expression replays
    // 1:1 (regexp_replace needs the explicit 'g' flag in DuckDB).
    "q273_code_score" -> Entry(
      (s, dir) => {
        val planted = t(s, dir, "documents")
          .filter(col("text").isNotNull && col("doc_id") < 400)
          .select(col("doc_id"),
            when(col("doc_id") % 9 === 0,
              concat(col("text"),
                lit("\nif (x == 1) {\n  return y;\n}\n\tvar z = 2;")))
              .otherwise(col("text")).as("text"))
        TextAnalysis.codeScore(planted, "doc_id", "text").orderBy("id")
      },
      Some("""WITH p AS (SELECT doc_id, CASE WHEN doc_id % 9 = 0
             |    THEN text || chr(10) || 'if (x == 1) {' || chr(10)
             |      || '  return y;' || chr(10) || '}' || chr(10)
             |      || chr(9) || 'var z = 2;'
             |    ELSE text END AS text
             |  FROM documents WHERE text IS NOT NULL AND doc_id < 400),
             |m AS (SELECT doc_id, length(text) AS chars,
             |    length(text) - length(regexp_replace(text,
             |      '[{}\[\]();=<>]', '', 'g')) AS sym,
             |    list_filter(string_split(text, chr(10)),
             |      l -> l <> '') AS lines,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'),
             |      w -> w <> '') AS toks
             |  FROM p),
             |r AS (SELECT doc_id, chars, sym,
             |    len(lines) AS nl,
             |    len(list_filter(lines,
             |      l -> regexp_matches(l, '^(  |\t)'))) AS ind,
             |    len(list_filter(lines,
             |      l -> regexp_matches(l, ';\s*$'))) AS smi,
             |    len(toks) AS nt,
             |    len(list_filter(toks, w -> list_contains(
             |      ['def', 'return', 'import', 'class', 'void',
             |       'function', 'var', 'const', 'if', 'else', 'for',
             |       'while'], w))) AS kw
             |  FROM m),
             |x AS (SELECT doc_id,
             |    CASE WHEN chars > 0 THEN CAST(sym AS DOUBLE)
             |      / CAST(chars AS DOUBLE) ELSE CAST(0.0 AS DOUBLE)
             |      END AS sr,
             |    CASE WHEN nl > 0 THEN CAST(ind AS DOUBLE)
             |      / CAST(nl AS DOUBLE) ELSE CAST(0.0 AS DOUBLE)
             |      END AS ir,
             |    CASE WHEN nl > 0 THEN CAST(smi AS DOUBLE)
             |      / CAST(nl AS DOUBLE) ELSE CAST(0.0 AS DOUBLE)
             |      END AS mr,
             |    CASE WHEN nt > 0 THEN CAST(kw AS DOUBLE)
             |      / CAST(nt AS DOUBLE) ELSE CAST(0.0 AS DOUBLE)
             |      END AS kr,
             |    chars
             |  FROM r)
             |SELECT doc_id AS id, round(sr, 6) AS symbol_ratio,
             |  round(ir, 6) AS indent_ratio, round(mr, 6) AS semi_ratio,
             |  round(kr, 6) AS kw_ratio,
             |  CASE WHEN chars > 0 THEN round(LEAST(
             |    CAST(1.0 AS DOUBLE),
             |    CAST(3.0 AS DOUBLE) * sr + CAST(0.25 AS DOUBLE) * ir
             |      + CAST(0.25 AS DOUBLE) * mr
             |      + CAST(1.5 AS DOUBLE) * kr), 6) END AS code_score
             |FROM x ORDER BY id""".stripMargin)),

    // ----- cross-snapshot vocabulary drift ------------------------------------------
    // Top-20 term tables of the even- and odd-id halves full-outer
    // joined into new/lost/common rows — the term-level drift view.
    "q274_vocab_drift" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents")
        Vocab.vocabDrift(
          d.filter(col("doc_id") % 2 === 0),
          d.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", k = 20)
          .orderBy("term")
      },
      Some(s"""WITH ea AS (SELECT t AS term, COUNT(*) AS cnt
              |  FROM (SELECT doc_id, unnest($TOKS) AS t FROM documents
              |    WHERE doc_id % 2 = 0)
              |  GROUP BY 1 ORDER BY cnt DESC, term LIMIT 20),
              |ra AS (SELECT term, CAST(cnt AS BIGINT) AS cnt_a,
              |  CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term)
              |    AS BIGINT) AS rank_a FROM ea),
              |eb AS (SELECT t AS term, COUNT(*) AS cnt
              |  FROM (SELECT doc_id, unnest($TOKS) AS t FROM documents
              |    WHERE doc_id % 2 = 1)
              |  GROUP BY 1 ORDER BY cnt DESC, term LIMIT 20),
              |rb AS (SELECT term, CAST(cnt AS BIGINT) AS cnt_b,
              |  CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term)
              |    AS BIGINT) AS rank_b FROM eb)
              |SELECT COALESCE(ra.term, rb.term) AS term,
              |  CASE WHEN cnt_a IS NULL THEN 'new'
              |       WHEN cnt_b IS NULL THEN 'lost'
              |       ELSE 'common' END AS status,
              |  cnt_a, cnt_b, rank_a, rank_b
              |FROM ra FULL JOIN rb ON rb.term = ra.term
              |ORDER BY term""".stripMargin)),

    // ----- Kaplan-Meier survival ------------------------------------------------
    // Censoring-aware retention over a thinned per-user event stream
    // (event_id % 29 keeps durations varied and ~half the users
    // error-free = censored). Integer at-risk/event counts, ln terms
    // quantized to 1e-12 longs, log-space output (exp diverges 1 ulp
    // across engines — the q234 measurement).
    "q275_kaplan_meier" -> Entry(
      (s, dir) => {
        val perUser = Queries.events(s, dir)
          .filter(col("event_id") % 29 === 0 &&
            col("user_id").isNotNull && col("ts").isNotNull)
          .groupBy("user_id")
          .agg(expr("(max(ts) - min(ts)) div 86400000000000")
            .as("dur_days"),
            (max(when(col("event_type") === "error", 1L)
              .otherwise(0L)) === 1L).as("errored"))
        Funnel.kaplanMeier(perUser, "dur_days", "errored").orderBy("t")
      },
      Some("""WITH u AS (SELECT user_id,
             |    (MAX(epoch_us(ts) * 1000) - MIN(epoch_us(ts) * 1000))
             |      // 86400000000000 AS t,
             |    MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             |      AS e
             |  FROM events WHERE event_id % 29 = 0
             |    AND user_id IS NOT NULL AND ts IS NOT NULL
             |  GROUP BY user_id),
             |c AS (SELECT t, COUNT(*) AS m, CAST(SUM(e) AS BIGINT) AS d
             |  FROM u GROUP BY t),
             |r AS (SELECT t, m, d, SUM(m) OVER (ORDER BY t) AS cum
             |  FROM c),
             |nn AS (SELECT CAST(SUM(m) AS BIGINT) AS N FROM c),
             |st AS (SELECT t, m, d, N - (cum - m) AS nr,
             |    CASE WHEN d < N - (cum - m) THEN CAST(floor(
             |      ln(CAST((N - (cum - m)) - d AS DOUBLE)
             |        / CAST(N - (cum - m) AS DOUBLE))
             |      * CAST(1e12 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             |      AS BIGINT) ELSE 0 END AS lnq,
             |    CASE WHEN d = N - (cum - m) THEN 1 ELSE 0 END AS zf
             |  FROM r, nn),
             |f AS (SELECT t, nr, d, m - d AS cens,
             |    SUM(lnq) OVER (ORDER BY t) AS lncum,
             |    SUM(zf) OVER (ORDER BY t) AS zcum FROM st)
             |SELECT t, CAST(nr AS BIGINT) AS n_at_risk,
             |  d AS d_events, CAST(cens AS BIGINT) AS censored,
             |  CASE WHEN zcum = 0 THEN round(CAST(lncum AS DOUBLE)
             |    / CAST(1e12 AS DOUBLE), 6) END AS log_survival
             |FROM f ORDER BY t""".stripMargin)),

    // ----- log-rank survival comparison ------------------------------------------
    // q275's A/B companion: even- vs odd-id users' error-survival
    // curves; per-time hypergeometric E/V terms quantized to 1e-9
    // longs, one χ² expression at the end.
    "q276_logrank" -> Entry(
      (s, dir) => {
        val perUser = Queries.events(s, dir)
          .filter(col("event_id") % 29 === 0 &&
            col("user_id").isNotNull && col("ts").isNotNull)
          .groupBy("user_id")
          .agg(expr("(max(ts) - min(ts)) div 86400000000000")
            .as("dur_days"),
            (max(when(col("event_type") === "error", 1L)
              .otherwise(0L)) === 1L).as("errored"))
          .withColumn("grp", col("user_id") % 2 === 0)
        Funnel.logrank(perUser, "dur_days", "errored", "grp")
      },
      Some("""WITH u AS (SELECT user_id,
             |    (MAX(epoch_us(ts) * 1000) - MIN(epoch_us(ts) * 1000))
             |      // 86400000000000 AS t,
             |    MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             |      AS e,
             |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g
             |  FROM events WHERE event_id % 29 = 0
             |    AND user_id IS NOT NULL AND ts IS NOT NULL
             |  GROUP BY user_id),
             |c AS (SELECT t, CAST(SUM(g) AS BIGINT) AS m1,
             |    CAST(SUM(1 - g) AS BIGINT) AS m2,
             |    CAST(SUM(e * g) AS BIGINT) AS d1,
             |    CAST(SUM(e * (1 - g)) AS BIGINT) AS d2
             |  FROM u GROUP BY t),
             |r AS (SELECT t, m1, m2, d1, d2,
             |    SUM(m1) OVER (ORDER BY t) AS c1,
             |    SUM(m2) OVER (ORDER BY t) AS c2 FROM c),
             |tt AS (SELECT CAST(SUM(m1) AS BIGINT) AS na,
             |    CAST(SUM(m2) AS BIGINT) AS nb FROM c),
             |st AS (SELECT d1, d2, na, nb,
             |    na - (c1 - m1) AS n1, nb - (c2 - m2) AS n2
             |  FROM r, tt),
             |q AS (SELECT d1, na, nb,
             |    CASE WHEN d1 + d2 > 0 THEN
             |      CAST(floor(CAST(d1 + d2 AS DOUBLE)
             |        * CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
             |        * CAST(1e9 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             |        AS BIGINT) ELSE 0 END AS e1q,
             |    CASE WHEN n1 + n2 > 1 AND d1 + d2 > 0 THEN
             |      CAST(floor(CAST(d1 + d2 AS DOUBLE)
             |        * (CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
             |        * (CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
             |        * (CAST(n1 + n2 AS DOUBLE)
             |          - CAST(d1 + d2 AS DOUBLE))
             |        / (CAST(n1 + n2 AS DOUBLE) - CAST(1.0 AS DOUBLE))
             |        * CAST(1e9 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             |        AS BIGINT) ELSE 0 END AS vq
             |  FROM st),
             |f AS (SELECT MAX(na) AS n_a, MAX(nb) AS n_b,
             |    CAST(SUM(d1) AS BIGINT) AS observed_a,
             |    CAST(SUM(e1q) AS BIGINT) AS se1,
             |    CAST(SUM(vq) AS BIGINT) AS sv FROM q)
             |SELECT n_a, n_b, observed_a,
             |  round(CAST(se1 AS DOUBLE) / CAST(1e9 AS DOUBLE), 6)
             |    AS expected_a,
             |  CASE WHEN sv > 0 THEN round(
             |    (CAST(observed_a AS DOUBLE)
             |      - CAST(se1 AS DOUBLE) / CAST(1e9 AS DOUBLE))
             |    * (CAST(observed_a AS DOUBLE)
             |      - CAST(se1 AS DOUBLE) / CAST(1e9 AS DOUBLE))
             |    / (CAST(sv AS DOUBLE) / CAST(1e9 AS DOUBLE)), 6)
             |  END AS chi2
             |FROM f""".stripMargin)),

    // ----- per-key PSI drift -----------------------------------------------------
    // Per-language length drift, even vs odd halves with the odd
    // half's zh long-docs removed — zh spikes, the others sit near 0.
    // Per-(key, bin) terms quantized to 1e-12 longs; one-sided keys
    // report null psi with counts, never eps-floored fake drift.
    "q277_psi_by_key" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents")
        Profiles.psiByKey(
          d.filter(col("doc_id") % 2 === 0),
          d.filter(col("doc_id") % 2 === 1 &&
            !(col("lang") === "zh" && col("n_chars") > 200)),
          "lang", "n_chars", lo = 0.0, hi = 500.0, bins = 10)
          .orderBy("key")
      },
      Some("""WITH pa AS (SELECT CAST(lang AS VARCHAR) AS key,
             |    LEAST(GREATEST(floor((CAST(n_chars AS DOUBLE)
             |      - CAST(0.0 AS DOUBLE)) / CAST(50.0 AS DOUBLE)),
             |      CAST(0.0 AS DOUBLE)), CAST(9.0 AS DOUBLE)) AS b
             |  FROM documents
             |  WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
             |pb AS (SELECT CAST(lang AS VARCHAR) AS key,
             |    LEAST(GREATEST(floor((CAST(n_chars AS DOUBLE)
             |      - CAST(0.0 AS DOUBLE)) / CAST(50.0 AS DOUBLE)),
             |      CAST(0.0 AS DOUBLE)), CAST(9.0 AS DOUBLE)) AS b
             |  FROM documents
             |  WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL
             |    AND NOT (lang = 'zh' AND n_chars > 200)),
             |ca AS (SELECT key, CAST(b AS BIGINT) AS bin, COUNT(*) AS na
             |  FROM pa GROUP BY 1, 2),
             |cb AS (SELECT key, CAST(b AS BIGINT) AS bin, COUNT(*) AS nb
             |  FROM pb GROUP BY 1, 2),
             |ks AS (SELECT DISTINCT key FROM (SELECT key FROM ca
             |  UNION ALL SELECT key FROM cb)),
             |sp AS (SELECT ks.key, g.bin FROM ks,
             |  (SELECT unnest(generate_series(0, 9)) AS bin) g),
             |cl AS (SELECT sp.key, sp.bin,
             |    COALESCE(ca.na, 0) AS na, COALESCE(cb.nb, 0) AS nb
             |  FROM sp LEFT JOIN ca ON ca.key = sp.key
             |    AND ca.bin = sp.bin
             |  LEFT JOIN cb ON cb.key = sp.key AND cb.bin = sp.bin),
             |tt AS (SELECT key, CAST(SUM(na) AS BIGINT) AS ta,
             |    CAST(SUM(nb) AS BIGINT) AS tb FROM cl GROUP BY 1),
             |q AS (SELECT cl.key, tt.ta, tt.tb,
             |    CASE WHEN ta > 0 AND tb > 0 THEN CAST(floor(
             |      (GREATEST(CAST(na AS DOUBLE) / CAST(ta AS DOUBLE),
             |          CAST(0.000001 AS DOUBLE))
             |        - GREATEST(CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE),
             |          CAST(0.000001 AS DOUBLE)))
             |      * ln(GREATEST(CAST(na AS DOUBLE) / CAST(ta AS DOUBLE),
             |          CAST(0.000001 AS DOUBLE))
             |        / GREATEST(CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE),
             |          CAST(0.000001 AS DOUBLE)))
             |      * CAST(1e12 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             |      AS BIGINT) ELSE 0 END AS tq
             |  FROM cl JOIN tt USING (key))
             |SELECT key, MAX(ta) AS n_a, MAX(tb) AS n_b,
             |  CASE WHEN MAX(ta) > 0 AND MAX(tb) > 0 THEN
             |    round(CAST(SUM(tq) AS DOUBLE) / CAST(1e12 AS DOUBLE), 6)
             |  END AS psi
             |FROM q GROUP BY key ORDER BY key""".stripMargin)),

    // ----- per-key freshness audit -------------------------------------------------
    // Event-type feed freshness against a pinned 'now' (2024-02-01)
    // with error events cut after Jan 16 — the silently-stopped feed
    // the content checks cannot see. Integer nanos end-to-end.
    "q278_freshness" -> Entry(
      (s, dir) => Checks.freshness(
        Queries.events(s, dir)
          .filter(!(col("event_type") === "error" &&
            col("ts") > 1705363200000000000L)),
        "event_type", "ts",
        nowNanos = 1706745600000000000L,
        staleAfterNanos = 432000000000000L)
        .orderBy("key"),
      Some("""WITH e AS (SELECT event_type,
             |    epoch_us(ts) * 1000 AS tsn FROM events
             |  WHERE ts IS NOT NULL
             |    AND NOT (event_type = 'error'
             |      AND epoch_us(ts) * 1000 > 1705363200000000000))
             |SELECT CAST(event_type AS VARCHAR) AS key,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(MAX(tsn) AS BIGINT) AS last_ts,
             |  CAST(1706745600000000000 - MAX(tsn) AS BIGINT) AS lag,
             |  1706745600000000000 - MAX(tsn) > 432000000000000
             |    AS stale
             |FROM e GROUP BY 1 ORDER BY key""".stripMargin)),

    // ----- per-key odds ratios ----------------------------------------------------
    // Even- vs odd-id docs' long-document odds per language, log-space
    // Wald CIs; Haldane +0.5 on all four cells when any is zero. The
    // 1.96 literal is DECIMAL in DuckDB — CAST it.
    "q279_odds_ratios" -> Entry(
      (s, dir) => Metrics.oddsRatios(
        t(s, dir, "documents").filter(col("n_chars").isNotNull),
        "lang", col("doc_id") % 2 === 0, col("n_chars") > 250)
        .orderBy("key"),
      Some("""WITH b AS (SELECT CAST(lang AS VARCHAR) AS key,
             |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS g,
             |    CASE WHEN n_chars > 250 THEN 1 ELSE 0 END AS y
             |  FROM documents WHERE n_chars IS NOT NULL),
             |c AS (SELECT key,
             |    CAST(SUM(g * y) AS BIGINT) AS g1_pos,
             |    CAST(SUM(g * (1 - y)) AS BIGINT) AS g1_neg,
             |    CAST(SUM((1 - g) * y) AS BIGINT) AS g0_pos,
             |    CAST(SUM((1 - g) * (1 - y)) AS BIGINT) AS g0_neg
             |  FROM b GROUP BY 1),
             |x AS (SELECT key, g1_pos, g1_neg, g0_pos, g0_neg,
             |    CASE WHEN g1_pos = 0 OR g1_neg = 0 OR g0_pos = 0
             |        OR g0_neg = 0
             |      THEN CAST(g1_pos AS DOUBLE) + CAST(0.5 AS DOUBLE)
             |      ELSE CAST(g1_pos AS DOUBLE) END AS a,
             |    CASE WHEN g1_pos = 0 OR g1_neg = 0 OR g0_pos = 0
             |        OR g0_neg = 0
             |      THEN CAST(g1_neg AS DOUBLE) + CAST(0.5 AS DOUBLE)
             |      ELSE CAST(g1_neg AS DOUBLE) END AS bb,
             |    CASE WHEN g1_pos = 0 OR g1_neg = 0 OR g0_pos = 0
             |        OR g0_neg = 0
             |      THEN CAST(g0_pos AS DOUBLE) + CAST(0.5 AS DOUBLE)
             |      ELSE CAST(g0_pos AS DOUBLE) END AS cc,
             |    CASE WHEN g1_pos = 0 OR g1_neg = 0 OR g0_pos = 0
             |        OR g0_neg = 0
             |      THEN CAST(g0_neg AS DOUBLE) + CAST(0.5 AS DOUBLE)
             |      ELSE CAST(g0_neg AS DOUBLE) END AS dd
             |  FROM c),
             |f AS (SELECT key, g1_pos, g1_neg, g0_pos, g0_neg,
             |    ln(a * dd / (bb * cc)) AS lo,
             |    sqrt(CAST(1.0 AS DOUBLE) / a + CAST(1.0 AS DOUBLE) / bb
             |      + CAST(1.0 AS DOUBLE) / cc
             |      + CAST(1.0 AS DOUBLE) / dd) AS se
             |  FROM x)
             |SELECT key, g1_pos, g1_neg, g0_pos, g0_neg,
             |  round(lo, 6) AS log_or, round(se, 6) AS se,
             |  round(lo - CAST(1.96 AS DOUBLE) * se, 6) AS lo95,
             |  round(lo + CAST(1.96 AS DOUBLE) * se, 6) AS hi95
             |FROM f ORDER BY key""".stripMargin)),

    // ----- pairwise source vocabulary similarity -----------------------------------
    // Top-15 vocab Jaccard between every source pair — the dedup
    // triage matrix; per-key top-k via the map-side WindowGroupLimit,
    // integer set arithmetic.
    "q280_source_similarity" -> Entry(
      (s, dir) => Vocab.sourceSimilarity(
        t(s, dir, "documents"), "source", "doc_id", "text", k = 15)
        .orderBy("key_a", "key_b"),
      Some(s"""WITH c AS (SELECT CAST(source AS VARCHAR) AS k, t AS term,
              |    COUNT(*) AS cnt
              |  FROM (SELECT source, unnest($TOKS) AS t FROM documents
              |    WHERE text IS NOT NULL)
              |  WHERE t <> '' GROUP BY 1, 2),
              |r AS (SELECT k, term, ROW_NUMBER() OVER (PARTITION BY k
              |    ORDER BY cnt DESC, term) AS rn FROM c),
              |tp AS (SELECT k, term FROM r WHERE rn <= 15),
              |sz AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n
              |  FROM tp GROUP BY 1),
              |sh AS (SELECT a.k AS key_a, b.k AS key_b,
              |    CAST(COUNT(*) AS BIGINT) AS shared
              |  FROM tp a JOIN tp b ON a.term = b.term AND a.k < b.k
              |  GROUP BY 1, 2)
              |SELECT key_a, key_b, sa.n AS n_a, sb.n AS n_b, shared,
              |  round(CAST(shared AS DOUBLE)
              |    / CAST(sa.n + sb.n - shared AS DOUBLE), 6) AS jaccard
              |FROM sh JOIN sz sa ON sa.k = key_a
              |  JOIN sz sb ON sb.k = key_b
              |ORDER BY key_a, key_b""".stripMargin)),

    // ----- X6 Count-Min sketch: frequency estimates, cell-exact -------------
    // Builds a deliberately TIGHT 4×16 grid over the document token
    // stream (the ~31-term vocabulary forces real cell collisions) with
    // deterministic md5 row-hashes, then estimates the whole vocabulary
    // against the exact counts. Cell-for-cell integer arithmetic — the
    // oracle rebuilds the identical grid in SQL, so estimates INCLUDING
    // the collision overcounts hash-match exactly. `overcount >= 0` is
    // the CMS never-undercount guarantee.
    "q175_count_min" -> Entry(
      // fanned + pinned: the token stream feeds THREE consumers (sketch
      // build, estimate's distinct, exact truth) — unpinned each replays
      // the scan+explode; the sketch's depth-way md5 hashing is per-row
      // CPU over a single-task scan (r16 fan-out sweep)
      (s, dir) => {
        val toks = docsFan(s, dir).filter(col("text").isNotNull)
          .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .pinned
        val sketch = Sketches.countMinBuild(toks, col("tok"),
          depth = 4, width = 16)
        val est = Sketches.countMinEstimate(sketch, toks.distinct(),
          col("tok"), depth = 4, width = 16)
        val truth = toks.groupBy(col("tok").as("term"))
          .agg(count(lit(1)).as("exact"))
        est.join(truth, Seq("term"))
          .select(col("term"), col("estimate"), col("exact"),
            (col("estimate") - col("exact")).as("overcount"))
          .orderBy("term")
      },
      Some(s"""WITH tk AS (SELECT unnest($TOKS) AS tok FROM documents
              |  WHERE text IS NOT NULL),
              |dd AS (SELECT unnest(generate_series(0, 3)) AS d),
              |g AS (SELECT dd.d,
              |    CAST(('0x' || substr(md5('cms|' || dd.d || '|' || tok),
              |      1, 8)) AS UBIGINT) % 16 AS cell, COUNT(*) AS cnt
              |  FROM tk, dd GROUP BY 1, 2),
              |v AS (SELECT tok, COUNT(*) AS exact FROM tk GROUP BY tok),
              |e AS (SELECT v.tok AS term, MIN(coalesce(g.cnt, 0))
              |    AS estimate
              |  FROM v CROSS JOIN dd LEFT JOIN g ON g.d = dd.d
              |    AND g.cell = CAST(('0x' || substr(md5('cms|' || dd.d
              |      || '|' || v.tok), 1, 8)) AS UBIGINT) % 16
              |  GROUP BY 1)
              |SELECT term, CAST(estimate AS BIGINT) AS estimate,
              |  CAST(v.exact AS BIGINT) AS exact,
              |  CAST(estimate - v.exact AS BIGINT) AS overcount
              |FROM e JOIN v ON v.tok = e.term
              |ORDER BY term""".stripMargin)),

    // ----- X6 degree-oriented triangle count ---------------------------------
    // A dense 23-vertex modular graph (four affine edge families per
    // doc, ~90 of the 253 possible edges) — the Spark side counts via
    // degree-oriented wedge enumeration (hub-proof at scale); the
    // oracle counts the SAME triangles with the textbook canonical
    // three-way self-join. Two different algorithms agreeing on an
    // integer is the strongest cheap pin.
    "q176_triangles" -> Entry(
      (s, dir) => {
        val base = t(s, dir, "documents").select(col("doc_id"))
        def fam(m: Int, c: Int) =
          struct((col("doc_id") % 23).as("s"),
            ((col("doc_id") * m + c) % 23).as("t"))
        val edges = base.select(explode(array(
            fam(7, 3), fam(5, 1), fam(3, 11), fam(9, 2))).as("e"))
          .select(col("e.s").as("s"), col("e.t").as("t"))
        Graph.triangleCount(edges, "s", "t")
      },
      Some("""WITH r AS (
             |  SELECT doc_id % 23 AS s, (doc_id * 7 + 3) % 23 AS t
             |    FROM documents
             |  UNION ALL
             |  SELECT doc_id % 23, (doc_id * 5 + 1) % 23 FROM documents
             |  UNION ALL
             |  SELECT doc_id % 23, (doc_id * 3 + 11) % 23 FROM documents
             |  UNION ALL
             |  SELECT doc_id % 23, (doc_id * 9 + 2) % 23 FROM documents),
             |e AS (SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
             |  FROM r WHERE s <> t)
             |SELECT CAST(COUNT(*) AS BIGINT) AS triangles
             |FROM e e1
             |JOIN e e2 ON e2.a = e1.b
             |JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin)),

    // ----- linear-regression aggregates (regr_* family) ---------------------
    // The one-pass sufficient-statistics regression both engines ship
    // (slope/intercept/r2/avgx/avgy/count) — how a pipeline fits
    // quality-score ~ length trends without leaving SQL. Ratios and
    // means round-6; both engines fold the same moments.
    "q177_regr" -> Entry(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6)
            .as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")),
            6).as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6)
            .as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity"))
            .cast("long").as("n"),
          round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 6)
            .as("avgx"),
          round(regr_avgy(col("l_extendedprice"), col("l_quantity")), 6)
            .as("avgy"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  round(regr_slope(l_extendedprice, l_quantity), 6)
             |    AS slope,
             |  round(regr_intercept(l_extendedprice, l_quantity), 6)
             |    AS intercept,
             |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
             |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
             |    AS n,
             |  round(regr_avgx(l_extendedprice, l_quantity), 6) AS avgx,
             |  round(regr_avgy(l_extendedprice, l_quantity), 6) AS avgy
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ----- string similarity: Jaro-Winkler (record-linkage verifier) --------
    // The transposition-tolerant companion to q157's Levenshtein —
    // Spark ships no Jaro-Winkler, so this is the native
    // graft.functions.JaroWinkler expression scored against DuckDB's
    // built-in (whose exact variant — integer-halved transpositions,
    // empty→0 — the expression pins empirically; see its scaladoc).
    // ASCII fixture keeps byte-vs-codepoint indexing out of the
    // picture.
    "q178_jaro_winkler" -> Entry(
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          round(graft.functions.JaroWinkler.sim(col("p_name"),
            lit("forest green metallic")), 6).as("jw"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  round(jaro_winkler_similarity(p_name,
             |    'forest green metallic'), 6) AS jw
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ----- time-series OHLC downsample (min_by/max_by surface) --------------
    // Per-series hourly open/high/low/close — the resample every
    // metrics pipeline runs. open/close ride min_by/max_by over the
    // TOTAL order (ts, event_id) (DuckDB: arg_min/arg_max over the
    // same list key), so ties cannot flip rows between engines; the
    // values pass through untouched — float-exact.
    "q179_ohlc" -> Entry(
      (s, dir) => {
        val ev = Queries.events(s, dir)
          .filter(col("value").isNotNull)
          .select((col("user_id") % 7).as("series"),
            expr("ts div 1000").as("tus"), col("event_id"), col("value"))
        // composite total order packed into ONE numeric key (DuckDB's
        // arg_min takes scalar keys only): µs·10^12 + event_id, exact
        // in decimal(38,0)/HUGEINT on both engines
        val key = col("tus").cast("decimal(38,0)") *
          lit(1000000000000L) + col("event_id")
        ev.groupBy(col("series"),
            expr("tus div 3600000000").as("hour"))
          .agg(
            min_by(col("value"), key).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max_by(col("value"), key).as("close"),
            count(lit(1)).as("n"))
          .orderBy("series", "hour")
      },
      Some("""SELECT user_id % 7 AS series,
             |  epoch_us(ts) // 3600000000 AS hour,
             |  arg_min(value, CAST(epoch_us(ts) AS HUGEINT)
             |    * 1000000000000 + event_id) AS open,
             |  max(value) AS high, min(value) AS low,
             |  arg_max(value, CAST(epoch_us(ts) AS HUGEINT)
             |    * 1000000000000 + event_id) AS close,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM events WHERE value IS NOT NULL
             |GROUP BY 1, 2 ORDER BY series, hour""".stripMargin)),

    // ----- ordered-set aggregates (WITHIN GROUP surface) ---------------------
    // The ANSI ordered-set aggregate family Spark 4 grew: listagg with
    // a declared order (DuckDB spells it string_agg ... ORDER BY),
    // interpolated/discrete percentiles, and mode with a deterministic
    // tie order. The mode fixture is tie-free by construction
    // (l_linenumber counts strictly decrease), and listagg's order is
    // total (linestatus, orderkey, linenumber), so every result is
    // engine-deterministic. SURFACE pin, deliberately bounded (the %7
    // subset): Spark's exact percentile_cont buffers every group value
    // in executor memory — the cliff Rank.exactQuantiles /
    // perKeyQuantileGateApprox exist to avoid; route real corpora
    // through those.
    "q180_ordered_set_aggs" -> Entry(
      (s, dir) => {
        graft.QuackIO.registerTables(s, dir)
        s.sql("""SELECT l_returnflag,
                |  listagg(l_linestatus, ',') WITHIN GROUP (
                |    ORDER BY l_linestatus, l_orderkey, l_linenumber)
                |    FILTER (WHERE l_orderkey % 997 = 0) AS statuses,
                |  round(percentile_cont(0.25) WITHIN GROUP (
                |    ORDER BY CAST(l_extendedprice AS DOUBLE)), 6) AS p25,
                |  round(percentile_cont(0.75) WITHIN GROUP (
                |    ORDER BY CAST(l_extendedprice AS DOUBLE)), 6) AS p75,
                |  CAST(percentile_disc(0.5) WITHIN GROUP (
                |    ORDER BY CAST(l_extendedprice AS DOUBLE)) AS DOUBLE)
                |    AS med_disc,
                |  CAST(mode() WITHIN GROUP (ORDER BY l_linenumber)
                |    AS BIGINT) AS mode_ln
                |FROM lineitem WHERE l_orderkey % 7 = 0
                |GROUP BY l_returnflag
                |ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  string_agg(l_linestatus, ','
             |    ORDER BY l_linestatus, l_orderkey, l_linenumber)
             |    FILTER (WHERE l_orderkey % 997 = 0) AS statuses,
             |  round(percentile_cont(0.25) WITHIN GROUP (
             |    ORDER BY CAST(l_extendedprice AS DOUBLE)), 6) AS p25,
             |  round(percentile_cont(0.75) WITHIN GROUP (
             |    ORDER BY CAST(l_extendedprice AS DOUBLE)), 6) AS p75,
             |  CAST(quantile_disc(CAST(l_extendedprice AS DOUBLE), 0.5)
             |    AS DOUBLE) AS med_disc,
             |  CAST(mode(l_linenumber) AS BIGINT) AS mode_ln
             |FROM lineitem WHERE l_orderkey % 7 = 0
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ----- time-series linear interpolation onto a 6-hour grid --------------
    // The resample-with-interpolation q167's forward-fill cannot
    // express (it carries the PREVIOUS value; interpolation also looks
    // at the NEXT). Grid = every 6 h across the observed span, per
    // series; exact hits pass through, gaps interpolate with one
    // fixed-order float expression, edges stay null. (event_id
    // tiebreaks simultaneous observations on both engines.)
    "q181_interpolate" -> Entry(
      (s, dir) => {
        val step = 21600000000L // 6 h in µs
        // null-value events carry no observation: the grid's series
        // list and lo/hi bounds must derive from the same observation
        // set the oracle's `WHERE value IS NOT NULL` sees, or an
        // only-null series (or a null-value extremal timestamp) skews
        // the two grids apart
        val obs = Queries.events(s, dir)
          .filter(col("value").isNotNull)
          .select((col("user_id") % 5).as("series"),
            expr("ts div 1000").as("tus"), col("event_id"), col("value"))
        val b = obs.agg(min(col("tus")).as("lo"), max(col("tus")).as("hi"))
        val grid = obs.select(col("series")).distinct()
          .crossJoin(broadcast(b))
          .select(col("series"),
            explode(sequence(col("lo"), col("hi"), lit(step))).as("gt"))
        AsOfJoin.interpolateAt(obs, grid, "series", "tus", "value",
            "event_id", "gt")
          .select(col("series"), col("t"), round(col("v"), 6).as("v"))
          .orderBy("series", "t")
      },
      Some("""WITH o AS (SELECT user_id % 5 AS k, epoch_us(ts) AS t,
             |    0 AS side, event_id AS tb, value AS v
             |  FROM events WHERE value IS NOT NULL),
             |bounds AS (SELECT min(t) AS lo, max(t) AS hi FROM o),
             |g AS (SELECT k, lo + i * 21600000000 AS t, 1 AS side,
             |    CAST(NULL AS BIGINT) AS tb, CAST(NULL AS DOUBLE) AS v
             |  FROM (SELECT DISTINCT k FROM o), bounds,
             |    unnest(generate_series(0,
             |      CAST((hi - lo) // 21600000000 AS BIGINT))) AS u(i)),
             |w AS (SELECT k, t, side,
             |  last_value(v IGNORE NULLS) OVER (PARTITION BY k
             |    ORDER BY t, side, tb ROWS BETWEEN UNBOUNDED PRECEDING
             |    AND CURRENT ROW) AS pv,
             |  last_value(CASE WHEN v IS NOT NULL THEN t END
             |    IGNORE NULLS) OVER (PARTITION BY k
             |    ORDER BY t, side, tb ROWS BETWEEN UNBOUNDED PRECEDING
             |    AND CURRENT ROW) AS pt,
             |  first_value(v IGNORE NULLS) OVER (PARTITION BY k
             |    ORDER BY t, side, tb ROWS BETWEEN CURRENT ROW
             |    AND UNBOUNDED FOLLOWING) AS nv,
             |  first_value(CASE WHEN v IS NOT NULL THEN t END
             |    IGNORE NULLS) OVER (PARTITION BY k
             |    ORDER BY t, side, tb ROWS BETWEEN CURRENT ROW
             |    AND UNBOUNDED FOLLOWING) AS nt
             |  FROM (SELECT * FROM o UNION ALL SELECT * FROM g))
             |SELECT k AS series, t, round(CASE WHEN pt = t THEN pv
             |  WHEN pt IS NOT NULL AND nt IS NOT NULL THEN
             |    pv + (nv - pv) * ((t - pt) / (nt - pt)) END, 6) AS v
             |FROM w WHERE side = 1 ORDER BY series, t""".stripMargin)),

    // ----- X5 exact tie-corrected ROC AUC ------------------------------------
    // Classifier discrimination measured exactly (Mann-Whitney
    // midranks, ties at half credit). The score fixture deliberately
    // overlaps the classes AND plants cross-class score ties (the
    // 0.005 grid + 0.1 offset), so the midrank tie correction does
    // real work. Spark rides Rank.globalRank (no corpus window — the
    // distinct-score cumulative the ORACLE uses would be corpus-sized
    // for continuous scores); everything stays integer until the one
    // final division, so both engines agree bit-for-bit pre-round.
    "q182_auc" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val scored = d.select(col("doc_id"),
          ((col("doc_id") * 37 % 100).cast("double") / 200.0 +
            when(col("lang") === "en", lit(0.3)).otherwise(lit(0.2)))
            .as("score"),
          (col("lang") === "en").as("y"))
        Metrics.auc(scored, col("score"), col("y"), col("doc_id"))
      },
      Some("""WITH s AS (SELECT
             |    CAST(doc_id * 37 % 100 AS DOUBLE) / CAST(200 AS DOUBLE)
             |      + CASE WHEN lang = 'en' THEN CAST(0.3 AS DOUBLE)
             |             ELSE CAST(0.2 AS DOUBLE) END AS score,
             |    lang = 'en' AS y FROM documents),
             |g AS (SELECT score, COUNT(*) AS n, count_if(y) AS np
             |  FROM s GROUP BY score),
             |o AS (SELECT score, n, np, SUM(n) OVER (ORDER BY score
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS cum FROM g),
             |a AS (SELECT SUM(np * (2 * cum - n + 1)) AS sum2,
             |  SUM(np) AS p, SUM(n) AS tot FROM o)
             |SELECT round(CAST(sum2 - p * (p + 1) AS DOUBLE) /
             |    CAST(2 * p * (tot - p) AS DOUBLE), 6) AS auc,
             |  CAST(p AS BIGINT) AS n_pos,
             |  CAST(tot - p AS BIGINT) AS n_neg
             |FROM a""".stripMargin)),

    // ----- X5 calibration report (reliability diagram table) ----------------
    // Per-confidence-bucket mean score vs observed positive rate — the
    // table whose weighted |gap| sum is ECE. Bucketing floors the SAME
    // double on both engines; the mean rides a decimal-exact sum.
    "q183_calibration" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val scored = d.select(
          ((col("doc_id") * 37 % 100).cast("double") / 200.0 +
            when(col("lang") === "en", lit(0.3)).otherwise(lit(0.2)))
            .as("score"),
          (col("lang") === "en").as("y"))
        Metrics.calibrationReport(scored, col("score"), col("y"),
          bins = 10)
      },
      Some("""WITH s AS (SELECT
             |    CAST(doc_id * 37 % 100 AS DOUBLE) / CAST(200 AS DOUBLE)
             |      + CASE WHEN lang = 'en' THEN CAST(0.3 AS DOUBLE)
             |             ELSE CAST(0.2 AS DOUBLE) END AS score,
             |    lang = 'en' AS y FROM documents),
             |b AS (SELECT LEAST(CAST(floor(score * 10) AS INT), 9)
             |    AS bucket,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  round(CAST(SUM(CAST(score AS DECIMAL(38,15))) AS DOUBLE)
             |    / COUNT(*), 6) AS mean_score,
             |  round(CAST(count_if(y) AS DOUBLE) / COUNT(*), 6)
             |    AS frac_pos
             |  FROM s GROUP BY 1)
             |SELECT bucket, n, mean_score, frac_pos,
             |  round(abs(mean_score - frac_pos), 6) AS abs_gap
             |FROM b ORDER BY bucket""".stripMargin)),

    // ----- X3 exact covariance matrix (the PCA input) ------------------------
    // Upper-triangle population covariance of the 64-d embeddings —
    // ORDER-INDEPENDENT scaled-long sums (floor(x·1e12 + 0.5) per term;
    // floor is IEEE-exact, so any summation order on any engine yields
    // the same bits — round-6 hash parity is structural, not
    // tolerance). The oracle's final round(...) gets '+ 0': DuckDB's
    // round preserves the sign of zero while Spark's BigDecimal round
    // cannot, so a tiny-negative cell would render -0.0 vs 0.0 and
    // hash-diverge despite value equality (the r12 driver-gate fail;
    // -0.0 + 0 = +0.0 in IEEE, non-zeros unchanged). The one-corpus-
    // pass statistic Embeddings.pca
    // eigendecomposes driver-side. The (i, j) fan-out explodes UNDER a
    // map-combined aggregation: the exchange ships D(D+1)/2 cells per
    // task, never corpus rows.
    "q184_covariance" -> Entry(
      // fanOut: the dim·(dim+1)/2 triangle explode (2080 quantized
      // products per row) runs inside the scan stage (r16 fan-out)
      (s, dir) => Embeddings.covarianceMatrix(
          fanOut(s, t(s, dir, "embeddings").select(col("embedding"))),
          "embedding", dim = 64)
        .orderBy("i", "j"),
      Some("""WITH e AS (SELECT embedding AS v FROM embeddings
             |  WHERE embedding IS NOT NULL AND len(embedding) = 64
             |    AND NOT list_contains([isnan(x) FOR x IN embedding],
             |      true)),
             |m AS (SELECT d.d AS d,
             |    (CAST(SUM(CAST(floor(CAST(v[d.d] AS DOUBLE) * 1e12
             |        + 0.5) AS BIGINT)) AS DOUBLE) / 1e12)
             |      / CAST(COUNT(*) AS DOUBLE) AS mu
             |  FROM e, generate_series(1, 64) d(d) GROUP BY 1),
             |p AS (SELECT gi.i AS i, gj.j AS j,
             |    CAST(floor(CAST(v[gi.i] AS DOUBLE)
             |      * CAST(v[gj.j] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)
             |      AS xy
             |  FROM e, generate_series(1, 64) gi(i),
             |    generate_series(1, 64) gj(j)
             |  WHERE gj.j >= gi.i)
             |SELECT CAST(p.i - 1 AS INT) AS i, CAST(p.j - 1 AS INT) AS j,
             |  round((CAST(SUM(xy) AS DOUBLE) / 1e12)
             |    / CAST(COUNT(*) AS DOUBLE)
             |    - ANY_VALUE(mi.mu) * ANY_VALUE(mj.mu), 6) + 0 AS cov
             |FROM p JOIN m mi ON mi.d = p.i JOIN m mj ON mj.d = p.j
             |GROUP BY 1, 2 ORDER BY i, j""".stripMargin)),

    // ----- Zipf slope per source (vocabulary power-law fit) -----------------
    // Corpus-health heuristic: log-log regression of term frequency on
    // frequency rank per source — a natural-text vocabulary slopes
    // near −1; synthetic/templated text flattens. Composes the token
    // explode, a per-source rank over the BOUNDED per-source
    // vocabulary, and regr_slope.
    "q185_zipf" -> Entry(
      (s, dir) => {
        val tk = t(s, dir, "documents").filter(col("text").isNotNull)
          .select(col("source"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("freq"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source")
          .orderBy(col("freq").desc, col("tok"))
        tk.withColumn("rnk", row_number().over(w))
          .groupBy("source")
          .agg(round(regr_slope(log(col("freq").cast("double")),
            log(col("rnk").cast("double"))), 6).as("zipf_slope"),
            count(lit(1)).as("n_terms"))
          .orderBy("source")
      },
      Some(s"""WITH tk AS (SELECT source, unnest($TOKS) AS tok
              |  FROM documents WHERE text IS NOT NULL),
              |f AS (SELECT source, tok, COUNT(*) AS freq FROM tk
              |  GROUP BY 1, 2),
              |r AS (SELECT source, freq, ROW_NUMBER() OVER (
              |    PARTITION BY source ORDER BY freq DESC, tok) AS rnk
              |  FROM f)
              |SELECT source,
              |  round(regr_slope(ln(CAST(freq AS DOUBLE)),
              |    ln(CAST(rnk AS DOUBLE))), 6) AS zipf_slope,
              |  CAST(COUNT(*) AS BIGINT) AS n_terms
              |FROM r GROUP BY source ORDER BY source""".stripMargin)),

    // ----- Kolmogorov-Smirnov drift between two halves ----------------------
    // Exact two-sample KS statistic over the n_chars distribution of
    // even- vs odd-id docs — the distribution-drift alarm PSI (q100)
    // complements (KS needs no binning choice). The cumulative walks
    // the DISTINCT value domain (bounded for length-like columns);
    // every ratio is an exact long/long double division.
    "q186_ks_drift" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("n_chars"), (col("doc_id") % 2 === 0).as("__a"))
        val g = d.groupBy("n_chars").agg(
          sum(when(col("__a"), 1L).otherwise(0L)).as("__ca"),
          sum(when(!col("__a"), 1L).otherwise(0L)).as("__cb"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("__nc"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        val tot = g.agg(sum(col("__ca")).as("__ta"),
          sum(col("__cb")).as("__tb"))
        g.select(col("n_chars").as("__nc"), col("__ca"), col("__cb"))
          .withColumn("__cuma", sum(col("__ca")).over(w))
          .withColumn("__cumb", sum(col("__cb")).over(w))
          .crossJoin(broadcast(tot))
          .agg(round(max(abs(
            col("__cuma").cast("double") / col("__ta").cast("double") -
              col("__cumb").cast("double") / col("__tb").cast("double"))),
            6).as("ks"),
            max(col("__ta")).cast("long").as("n_a"),
            max(col("__tb")).cast("long").as("n_b"))
      },
      Some("""WITH d AS (SELECT n_chars, doc_id % 2 = 0 AS a
             |  FROM documents),
             |g AS (SELECT n_chars, count_if(a) AS ca,
             |    count_if(NOT a) AS cb FROM d GROUP BY 1),
             |c AS (SELECT n_chars,
             |  SUM(ca) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED
             |    PRECEDING AND CURRENT ROW) AS cuma,
             |  SUM(cb) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED
             |    PRECEDING AND CURRENT ROW) AS cumb
             |  FROM g),
             |tt AS (SELECT SUM(ca) AS ta, SUM(cb) AS tb FROM g)
             |SELECT round(MAX(ABS(CAST(cuma AS DOUBLE)
             |    / CAST(ta AS DOUBLE)
             |  - CAST(cumb AS DOUBLE) / CAST(tb AS DOUBLE))), 6) AS ks,
             |  CAST(MAX(ta) AS BIGINT) AS n_a,
             |  CAST(MAX(tb) AS BIGINT) AS n_b
             |FROM c, tt""".stripMargin)),

    // ----- calendar/date function surface ------------------------------------
    // The date-part family over the shipdate domain, one row per
    // distinct date: extraction (year/quarter/month/day), boundary ops
    // (month start via date_trunc, last_day), arithmetic (+30 days,
    // day diff to a pin date), and ISO day-of-week — Spark's weekday()
    // is 0=Monday, DuckDB's isodow() 1=Monday, so weekday+1 == isodow
    // (the kind of off-by-one engine trap this pin exists to catch).
    // All integer/date-exact.
    "q187_date_funcs" -> Entry(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_shipdate").as("d"))
        .agg(count(lit(1)).as("n"))
        .select(col("d"), year(col("d")).as("y"),
          quarter(col("d")).as("q"), month(col("d")).as("m"),
          dayofmonth(col("d")).as("dom"),
          date_trunc("month", col("d")).cast("date").as("m_start"),
          last_day(col("d")).as("m_end"),
          date_add(col("d"), 30).as("plus30"),
          (expr("weekday(d)") + 1).cast("int").as("iso_dow"),
          datediff(lit("2025-01-01").cast("date"), col("d"))
            .as("days_to_2025"),
          col("n"))
        .orderBy("d"),
      Some("""SELECT l_shipdate AS d,
             |  CAST(year(l_shipdate) AS INT) AS y,
             |  CAST(quarter(l_shipdate) AS INT) AS q,
             |  CAST(month(l_shipdate) AS INT) AS m,
             |  CAST(day(l_shipdate) AS INT) AS dom,
             |  CAST(date_trunc('month', l_shipdate) AS DATE) AS m_start,
             |  last_day(l_shipdate) AS m_end,
             |  CAST(l_shipdate + INTERVAL 30 DAY AS DATE) AS plus30,
             |  CAST(isodow(l_shipdate) AS INT) AS iso_dow,
             |  CAST(date_diff('day', l_shipdate, DATE '2025-01-01')
             |    AS INT) AS days_to_2025,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY l_shipdate ORDER BY d""".stripMargin)),

    // ----- bitwise aggregate surface -----------------------------------------
    // bit_and/bit_or/bit_xor folds — the flag-mask aggregation both
    // engines ship; integer-exact by construction.
    "q188_bit_aggs" -> Entry(
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(expr("bit_and(o_orderkey % 4096)").as("mask_and"),
          expr("bit_or(o_orderkey % 4096)").as("mask_or"),
          expr("bit_xor(o_orderkey % 4096)").as("mask_xor"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  bit_and(o_orderkey % 4096) AS mask_and,
             |  bit_or(o_orderkey % 4096) AS mask_or,
             |  bit_xor(o_orderkey % 4096) AS mask_xor,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ----- k-anonymity audit (release-side privacy check) -------------------
    // Every (status, priority, year, month, customer-bucket) tuple
    // describing fewer than k rows is re-identifiable by an outside
    // join on those columns — the audit returns exactly those groups
    // (empty = safe to publish); the fixture has BOTH classes at both
    // scales. The releaseCorpus-family governance gate,
    // integer-exact.
    "q189_k_anonymity" -> Entry(
      (s, dir) => graft.operators.Checks.kAnonymityViolations(
          t(s, dir, "orders").select(col("o_orderstatus"),
            col("o_orderpriority"),
            year(col("o_orderdate")).as("o_year"),
            month(col("o_orderdate")).as("o_month"),
            (col("o_custkey") % 10).as("cust_bucket")),
          Seq("o_orderstatus", "o_orderpriority", "o_year", "o_month",
            "cust_bucket"), k = 5L),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(year(o_orderdate) AS INT) AS o_year,
             |  CAST(month(o_orderdate) AS INT) AS o_month,
             |  o_custkey % 10 AS cust_bucket,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM orders GROUP BY 1, 2, 3, 4, 5
             |HAVING COUNT(*) < 5
             |ORDER BY n, o_orderstatus, o_orderpriority, o_year,
             |  o_month, cust_bucket"""
        .stripMargin)),

    // ----- l-diversity audit (homogeneity-attack check) ----------------------
    // k-anonymity's companion: a quasi-id group may be k-large yet
    // leak if every member shares the same status. Groups whose status
    // column carries < l distinct values are exactly what an outside
    // joiner learns for free. countDistinct is exact and integer; both
    // classes present at both scales (33 violating groups of 3985 at
    // sf0.1).
    "q190_l_diversity" -> Entry(
      (s, dir) => graft.operators.Checks.lDiversityViolations(
          t(s, dir, "orders").select(col("o_orderpriority"),
            year(col("o_orderdate")).as("o_year"),
            month(col("o_orderdate")).as("o_month"),
            (col("o_custkey") % 10).as("cust_bucket"),
            col("o_orderstatus")),
          Seq("o_orderpriority", "o_year", "o_month", "cust_bucket"),
          "o_orderstatus", l = 3L),
      Some("""SELECT o_orderpriority,
             |  CAST(year(o_orderdate) AS INT) AS o_year,
             |  CAST(month(o_orderdate) AS INT) AS o_month,
             |  o_custkey % 10 AS cust_bucket,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)
             |    AS n_distinct
             |FROM orders GROUP BY 1, 2, 3, 4
             |HAVING COUNT(DISTINCT o_orderstatus) < 3
             |ORDER BY n_distinct, n, o_orderpriority, o_year,
             |  o_month, cust_bucket""".stripMargin)),

    // ----- t-closeness audit (skewness-attack check) -------------------------
    // The triad's third rung: a group can be k-large and l-diverse yet
    // leak when its sensitive DISTRIBUTION diverges from the table's.
    // The synthetic tables are uniform (no natural skew survives
    // scale-up), so the fixture PLANTS it — q109's planted-copies
    // precedent: two sources forced language-homogeneous sit at
    // TVD ≈ 0.5 at every scale, while honest sources' sampling noise
    // is ≤ 0.23 (sf0.01) / ≤ 0.09 (sf0.1); t = 0.3 splits them with
    // wide float margin on both engines.
    "q191_t_closeness" -> Entry(
      (s, dir) => graft.operators.Checks.tClosenessViolations(
          t(s, dir, "documents").select(col("source"),
            when(col("source").isin("src0", "src7"), lit("en"))
              .otherwise(col("lang")).as("lang_v")),
          Seq("source"), "lang_v", t = 0.3),
      Some("""WITH nn AS (
             |  SELECT source,
             |    CASE WHEN source IN ('src0', 'src7') THEN 'en'
             |         ELSE lang END AS v
             |  FROM documents
             |  WHERE (CASE WHEN source IN ('src0', 'src7') THEN 'en'
             |              ELSE lang END) IS NOT NULL),
             |gv AS (SELECT source, v, COUNT(*) AS n_gv
             |       FROM nn GROUP BY source, v),
             |gl AS (SELECT v, SUM(n_gv) AS n_v FROM gv GROUP BY v),
             |tot AS (SELECT SUM(n_v) AS n_tot FROM gl),
             |j AS (SELECT gv.source, gv.n_gv,
             |        CAST(gl.n_v AS DOUBLE) / tot.n_tot AS p_glob,
             |        SUM(gv.n_gv) OVER (PARTITION BY gv.source) AS n_g
             |      FROM gv, gl, tot WHERE gv.v = gl.v)
             |SELECT source, CAST(MAX(n_g) AS BIGINT) AS n,
             |  ROUND(0.5 * (SUM(ABS(CAST(n_gv AS DOUBLE) / n_g - p_glob))
             |    + 1.0 - SUM(p_glob)), 6) AS distance
             |FROM j GROUP BY source
             |HAVING ROUND(0.5 * (SUM(ABS(CAST(n_gv AS DOUBLE) / n_g
             |    - p_glob)) + 1.0 - SUM(p_glob)), 6) > 0.3
             |ORDER BY distance DESC, n, source""".stripMargin)),

    // ----- DSv2 complete aggregate pushdown ---------------------------------
    // The synthdocs ScanBuilder answers group-less COUNT / MIN(doc_id)
    // / MAX(doc_id) from the id spine (SupportsPushDownAggregates,
    // complete): 50 M rows aggregate without generating ONE — the plan
    // is a one-row BatchScan, spec-pinned via its PushedAggregates
    // marker. The oracle pays full price: DuckDB aggregates the same
    // 50 M-id generate_series spine the q160 oracle replays.
    "q192_synth_agg_pushdown" -> Entry(
      (s, dir) => s.read.format("synthdocs")
        .option("rows", "50000000").option("seed", "q192").load()
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
          max("doc_id").as("max_id")),
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(MIN(i) AS BIGINT) AS min_id,
             |  CAST(MAX(i) AS BIGINT) AS max_id
             |FROM generate_series(0, 49999999) t(i)""".stripMargin)),

    // ----- χ² categorical drift -------------------------------------------
    // PSI (q100) watches numeric bins; this is its categorical twin —
    // the snapshot-over-snapshot homogeneity test for sources/langs/
    // labels. The cur snapshot thins zh to a third (a feed losing one
    // language — the real incident shape), so zh carries the dominant
    // contribution at every scale while the other languages absorb
    // proportional mass. Two-sample expecteds keep new-category cells
    // finite; oracle replays the full contingency arithmetic.
    "q193_chi_drift" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents")
        Profiles.chiSquaredDrift(d.select("lang"),
          d.filter(col("lang") =!= "zh" || col("doc_id") % 3 === 0)
            .select("lang"), "lang")
      },
      Some("""WITH r AS (SELECT lang AS category, COUNT(*) AS n_ref
             |          FROM documents GROUP BY 1),
             |c AS (SELECT lang AS category, COUNT(*) AS n_cur
             |      FROM documents
             |      WHERE lang <> 'zh' OR doc_id % 3 = 0 GROUP BY 1),
             |j AS (SELECT COALESCE(r.category, c.category) AS category,
             |        COALESCE(n_ref, 0) AS n_ref,
             |        COALESCE(n_cur, 0) AS n_cur
             |      FROM r FULL OUTER JOIN c
             |        ON r.category IS NOT DISTINCT FROM c.category),
             |t AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
             |      FROM j),
             |e AS (SELECT category, n_ref, n_cur,
             |        CAST(n_ref + n_cur AS DOUBLE) * t_ref
             |          / (t_ref + t_cur) AS e_ref,
             |        CAST(n_ref + n_cur AS DOUBLE) * t_cur
             |          / (t_ref + t_cur) AS e_cur
             |      FROM j, t)
             |SELECT category, CAST(n_ref AS BIGINT) AS n_ref,
             |  CAST(n_cur AS BIGINT) AS n_cur,
             |  ROUND(e_ref, 6) AS exp_ref, ROUND(e_cur, 6) AS exp_cur,
             |  ROUND((CAST(n_ref AS DOUBLE) - e_ref)
             |      * (CAST(n_ref AS DOUBLE) - e_ref) / e_ref
             |    + (CAST(n_cur AS DOUBLE) - e_cur)
             |      * (CAST(n_cur AS DOUBLE) - e_cur) / e_cur, 6)
             |    AS contrib
             |FROM e ORDER BY category NULLS FIRST""".stripMargin)),

    // ----- Benford first-digit audit ----------------------------------------
    // Fraud/forensics staple: natural multi-scale quantities lead with
    // digit d at log10(1+1/d). TPC-H prices are uniform, NOT Benford —
    // exactly what the report shows (n/share/expected/deviation per
    // digit; the audit measures, it does not assume). First digits come
    // from integer-cents arithmetic, never double→string rendering
    // (Spark flips to scientific at 1e7; see scaladoc).
    "q194_benford" -> Entry(
      (s, dir) => graft.operators.Checks.benford(
        t(s, dir, "lineitem"), "l_extendedprice", scale = 2),
      Some("""WITH v AS (SELECT CAST(round(l_extendedprice * 100)
             |      AS BIGINT) AS cents FROM lineitem
             |    WHERE l_extendedprice IS NOT NULL
             |      AND round(l_extendedprice * 100) > 0),
             |d AS (SELECT CAST(floor(cents / power(10,
             |        floor(log10(cents)))) AS INT) AS digit FROM v),
             |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
             |t AS (SELECT SUM(n) AS tot FROM c)
             |SELECT CAST(s.digit AS INT) AS digit,
             |  CAST(COALESCE(n, 0) AS BIGINT) AS n,
             |  ROUND(CAST(COALESCE(n, 0) AS DOUBLE) / tot, 6) AS share,
             |  ROUND(log10(1 + CAST(1.0 AS DOUBLE) / s.digit), 6)
             |    AS expected,
             |  ROUND(ABS(CAST(COALESCE(n, 0) AS DOUBLE) / tot
             |    - log10(1 + CAST(1.0 AS DOUBLE) / s.digit)), 6)
             |    AS deviation
             |FROM generate_series(1, 9) s(digit)
             |LEFT JOIN c ON s.digit = c.digit CROSS JOIN t
             |ORDER BY digit""".stripMargin)),

    // ----- PMI collocations -------------------------------------------------
    // Church & Hanks 1990: adjacent-word pairs ranked by pointwise
    // mutual information over the corpus — the multi-word-unit miner
    // behind phrase tables and tokenizer audits. minCount floors away
    // the hapax pairs whose PMI is maximal by accident; ordering is on
    // the ROUNDED pmi (then the pair) so the top-K cut is
    // engine-portable. Oracle replays bigram slots, token slots and
    // the log2 ratio.
    "q195_pmi_collocations" -> Entry(
      (s, dir) => Vocab.pmiCollocations(t(s, dir, "documents"), "text",
        minCount = 10, topK = 50),
      Some(s"""WITH tk AS (SELECT $TOKS AS t FROM documents
              |  WHERE text IS NOT NULL),
              |bg AS (SELECT unnest([struct_pack(w1 := t[i],
              |    w2 := t[i + 1])
              |    FOR i IN generate_series(1, len(t) - 1)]) AS p
              |  FROM tk),
              |bf AS (SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS n
              |  FROM bg GROUP BY 1, 2),
              |uni AS (SELECT w, COUNT(*) AS uf
              |  FROM (SELECT unnest(t) AS w FROM tk) GROUP BY 1),
              |tot AS (SELECT (SELECT SUM(n) FROM bf) AS bsum,
              |  (SELECT SUM(uf) FROM uni) AS tsum)
              |SELECT w1, w2, CAST(n AS BIGINT) AS n,
              |  ROUND(log2((CAST(n AS DOUBLE) / bsum) /
              |    ((CAST(u1.uf AS DOUBLE) / tsum) *
              |     (CAST(u2.uf AS DOUBLE) / tsum))), 6) AS pmi
              |FROM bf JOIN uni u1 ON bf.w1 = u1.w
              |JOIN uni u2 ON bf.w2 = u2.w CROSS JOIN tot
              |WHERE n >= 10
              |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin)),

    // ----- mojibake detection + repair --------------------------------------
    // The ftfy primitive, Spark-native: crawl text whose UTF-8 was once
    // read as latin-1/cp1252 ("cafÃ©", "donâ€™t") is detected by
    // lead+continuation marker counting and repaired by
    // translate(cp1252→bytes) → encode(latin-1) → reinterpret-as-UTF-8,
    // all codegen'd builtins. The fixture PLANTS both corruption
    // families on the ASCII corpus (one marker each) and keeps every
    // third doc clean; the oracle PREDICTS the repaired text from the
    // clean original — the operator must byte-exactly reconstruct what
    // was corrupted, md5-pinned.
    "q196_mojibake" -> Entry(
      // docsFan: the repair/detection regex battery is per-row CPU over
      // a single-task scan (r16 fan-out sweep)
      (s, dir) => {
        val planted = docsFan(s, dir).select(col("doc_id"),
          when(col("doc_id") % 3 === 1,
            concat(col("text"), lit(" cafÃ©")))
            .when(col("doc_id") % 3 === 2,
              concat(col("text"), lit(" donâ€™t")))
            .otherwise(col("text")).as("text"))
        TextAnalysis.withMojibake(planted, "text")
          .select(col("doc_id"), col("mojibake_hits"),
            md5(col("text_fixed")).as("fixed_md5"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS INT)
             |    AS mojibake_hits,
             |  md5(CASE WHEN doc_id % 3 = 1
             |        THEN text || ' caf' || chr(233)
             |      WHEN doc_id % 3 = 2
             |        THEN text || ' don' || chr(8217) || 't'
             |      ELSE text END) AS fixed_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ----- URL canonicalization ---------------------------------------------
    // The first dedup key of every crawl pipeline (C4/CommonCrawl
    // practice: pages dedupe by URL before any content fingerprint).
    // The fixture plants four transport-noise families — default port,
    // tracking-only query, unsorted params + tracking, fragment — and
    // the oracle PREDICTS the canonical form from first principles
    // rather than replaying the regex chain: the operator must erase
    // exactly the noise and nothing else.
    "q197_url_canonical" -> Entry(
      // docsFan: canonicalization regex chain per row (r16 fan-out sweep)
      (s, dir) => {
        val planted = docsFan(s, dir).select(col("doc_id"),
          concat(lit("HTTPS://WWW."), upper(col("source")),
            lit(".Example.COM"),
            when(col("doc_id") % 4 === 0, lit(":443")).otherwise(lit("")),
            lit("/Page/"), col("doc_id"),
            when(col("doc_id") % 4 === 1,
              lit("?utm_source=feed&gclid=g#top"))
              .when(col("doc_id") % 4 === 2, lit("?b=2&utm_campaign=c&a=1"))
              .when(col("doc_id") % 4 === 3, lit("#frag"))
              .otherwise(lit(""))).as("url"))
        graft.operators.Urls.withCanonicalUrl(planted, "url")
          .select(col("doc_id"), col("url_canonical"), col("url_domain"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  'https://www.' || source || '.example.com/Page/' ||
             |    doc_id || CASE WHEN doc_id % 4 = 2 THEN '?a=1&b=2'
             |      ELSE '' END AS url_canonical,
             |  source || '.example.com' AS url_domain
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ----- mergeable profile state (incremental ANALYZE) --------------------
    // Stats maintenance at lake scale: profile each snapshot ONCE,
    // persist KB-sized state, fold states instead of rescanning old
    // data. The entry builds states over the two orderkey-parity
    // halves, merges, and reports the EXACT fields (counts, nulls,
    // numerically-merged min/max as their original string renderings);
    // the oracle aggregates the whole table directly — merge
    // arithmetic must be invisible. The HLL distinct estimate is
    // engine-specific and spec-pinned instead (within sketch error of
    // exact; the summarizeApprox precedent).
    "q198_mergeable_profile" -> Entry(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val cols = Seq("o_orderkey", "o_orderpriority", "o_orderdate",
          "o_totalprice")
        val sA = Profiles.summarizeState(
          o.filter(col("o_orderkey") % 2 === 0), cols)
        val sB = Profiles.summarizeState(
          o.filter(col("o_orderkey") % 2 === 1), cols)
        Profiles.summaryReport(Profiles.mergeSummaryStates(sA.union(sB)))
          .select(col("column").as("col_name"), col("n_rows"),
            col("n_nulls"), col("min_val"), col("max_val"))
          .orderBy("col_name")
      },
      Some("""SELECT 'o_orderkey' AS col_name,
             |  CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_nulls,
             |  CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
             |  CAST(MAX(o_orderkey) AS VARCHAR) AS max_val FROM orders
             |UNION ALL
             |SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
             |  CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1
             |    ELSE 0 END) AS BIGINT),
             |  MIN(o_orderpriority), MAX(o_orderpriority) FROM orders
             |UNION ALL
             |SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
             |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT),
             |  CAST(MIN(o_orderdate) AS VARCHAR),
             |  CAST(MAX(o_orderdate) AS VARCHAR) FROM orders
             |UNION ALL
             |SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
             |  CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT),
             |  CAST(MIN(o_totalprice) AS VARCHAR),
             |  CAST(MAX(o_totalprice) AS VARCHAR) FROM orders
             |ORDER BY col_name""".stripMargin)),

    // ----- c-TF-IDF distinctive terms per source ----------------------------
    // BERTopic's class-TF-IDF: each source's concatenated text as one
    // super-document, terms weighted by within-source rate ×
    // ln(nSources / sourcesWithTerm) — "what does src7 talk about that
    // the others don't". Top-5 per source, WindowGroupLimit-shaped cut
    // on (rounded score, term). Oracle replays explode → class counts
    // → idf → per-source ROW_NUMBER.
    "q199_ctfidf_terms" -> Entry(
      (s, dir) => Vocab.cTfIdfTopTerms(t(s, dir, "documents"),
        "source", "text", k = 5),
      Some(s"""WITH tk AS (SELECT source, unnest($TOKS) AS term
              |  FROM documents
              |  WHERE text IS NOT NULL AND source IS NOT NULL),
              |ctf AS (SELECT source AS key, term, COUNT(*) AS n
              |  FROM tk GROUP BY 1, 2),
              |l AS (SELECT key, SUM(n) AS lt FROM ctf GROUP BY 1),
              |kw AS (SELECT term, COUNT(*) AS kn FROM ctf GROUP BY 1),
              |nk AS (SELECT COUNT(*) AS nkeys FROM l),
              |sc AS (SELECT c.key, c.term, c.n,
              |    ROUND((CAST(c.n AS DOUBLE) / l.lt) *
              |      ln(CAST(nkeys AS DOUBLE) / kn), 6) AS score
              |  FROM ctf c JOIN l USING (key) JOIN kw USING (term)
              |  CROSS JOIN nk),
              |r AS (SELECT key, term, CAST(n AS BIGINT) AS n, score,
              |    ROW_NUMBER() OVER (PARTITION BY key
              |      ORDER BY score DESC, term) AS rn FROM sc)
              |SELECT key, term, n, score FROM r WHERE rn <= 5
              |ORDER BY key, score DESC, term""".stripMargin)),

    // ----- struct flattening (semi-structured → columnar) -------------------
    // The step after a schema'd from_json / nested-parquet read: lift
    // nested struct fields to flat `parent_child` columns so pruning /
    // pushdown / codegen see plain names. The entry nests orders
    // columns two levels deep, flattens, and aggregates BY the
    // flattened names; the oracle computes the same aggregate from the
    // original flat columns — flattening must be exactly a renaming.
    "q200_flatten_structs" -> Entry(
      (s, dir) => {
        val nested = t(s, dir, "orders").select(col("o_orderkey"),
          struct(col("o_orderpriority").as("priority"),
            struct(year(col("o_orderdate")).as("y"),
              month(col("o_orderdate")).as("m")).as("date"),
            col("o_totalprice").as("amount")).as("meta"))
        QuackIO.flattenStructs(nested)
          .groupBy("meta_priority", "meta_date_y")
          .agg(count(lit(1)).as("n"),
            // decimal-exact sum, DOUBLE on the wire — a raw decimal
            // aggregate renders at engine-specific precision
            // (Spark decimal(28,2) vs DuckDB decimal(38,2)) and the
            // driver hash sees the rendering, not the value (the
            // q05/dsum convention)
            sum(col("meta_amount").cast("decimal(18,2)"))
              .cast("double").as("total"))
          .orderBy("meta_priority", "meta_date_y")
      },
      Some("""SELECT o_orderpriority AS meta_priority,
             |  CAST(year(o_orderdate) AS INT) AS meta_date_y,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |    AS total
             |FROM orders GROUP BY 1, 2
             |ORDER BY meta_priority, meta_date_y""".stripMargin)),

    // ----- perceptual image hash (dHash) ------------------------------------
    // The q142 byte-replay pattern applied to PIXELS: each doc gets a
    // LOSSLESS 16×8 BMP whose channels are a closed-form function of
    // (doc_id, x, y); the operator decodes through javax.imageio and
    // dHashes (area-averaged 9×8 gray grid, relative comparisons); the
    // oracle reconstructs every pixel from the same function and
    // replays grid sums → integer means → comparison bits in SQL. The
    // hash travels as its 64-char bit string (no int64 sign games).
    // Pins the whole chain: BMP write, ImageIO decode, ITU gray,
    // integer area averaging, bit order.
    "q201_image_dhash" -> Entry(
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents")
          .filter(col("doc_id") % 20 === 0)
          .select(col("doc_id")).as[Long]
        val media = ids.map { id =>
          Multimodal.MediaRecord(id, Multimodal.encodeBmp24(16, 8,
            (x, y) => (((id * 7 + x * 16) % 241).toInt,
              ((y * 29 + id) % 241).toInt,
              ((x * y + id * 3) % 241).toInt)), "image")
        }
        Multimodal.dHashes(media).toDF()
          .select(col("doc_id"),
            lpad(bin(col("dhash")), 64, "0").as("bits"))
          .orderBy("doc_id")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents
             |  WHERE doc_id % 20 = 0),
             |px AS (SELECT doc_id, x, y,
             |    (299 * ((doc_id * 7 + x * 16) % 241)
             |     + 587 * ((y * 29 + doc_id) % 241)
             |     + 114 * ((x * y + doc_id * 3) % 241)) // 1000 AS g
             |  FROM ids
             |  CROSS JOIN generate_series(0, 15) gx(x)
             |  CROSS JOIN generate_series(0, 7) gy(y)),
             |cells AS (SELECT doc_id, y AS cy,
             |    LEAST(x * 9 // 16, 8) AS cx,
             |    SUM(g) // COUNT(*) AS avg_g
             |  FROM px GROUP BY 1, 2, 3),
             |bits AS (SELECT l.doc_id, l.cy, l.cx,
             |    CASE WHEN l.avg_g < r.avg_g THEN '1' ELSE '0' END AS b
             |  FROM cells l JOIN cells r ON l.doc_id = r.doc_id
             |    AND l.cy = r.cy AND r.cx = l.cx + 1
             |  WHERE l.cx < 8)
             |SELECT doc_id,
             |  string_agg(b, '' ORDER BY cy DESC, cx DESC) AS bits
             |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ----- audio energy-envelope fingerprint --------------------------------
    // The audio dHash, same byte-replay contract as q201: per doc a
    // closed-form 400-sample PCM16 WAV; the operator walks RIFF,
    // extracts LE samples, folds |s| into 65 integer mean-energy
    // windows and compares neighbors; the oracle replays sample
    // values → window means → comparison bits from the generating
    // function alone. Pins RIFF walk, LE decode, window mapping and
    // bit order.
    "q202_audio_fingerprint" -> Entry(
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents")
          .filter(col("doc_id") % 20 === 0)
          .select(col("doc_id")).as[Long]
        val media = ids.map { id =>
          Multimodal.MediaRecord(id, Multimodal.encodeWavPcm16(8000,
            Array.tabulate(400)(i =>
              ((id * 13 + i * 37) % 1009 - 504).toShort)), "audio")
        }
        Multimodal.audioHashes(media).toDF()
          .select(col("doc_id"),
            lpad(bin(col("dhash")), 64, "0").as("bits"))
          .orderBy("doc_id")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents
             |  WHERE doc_id % 20 = 0),
             |sm AS (SELECT doc_id, i,
             |    ABS((doc_id * 13 + i * 37) % 1009 - 504) AS a,
             |    LEAST(i * 65 // 400, 64) AS k
             |  FROM ids CROSS JOIN generate_series(0, 399) g(i)),
             |win AS (SELECT doc_id, k, SUM(a) // COUNT(*) AS e
             |  FROM sm GROUP BY 1, 2),
             |bits AS (SELECT l.doc_id, l.k,
             |    CASE WHEN l.e < r.e THEN '1' ELSE '0' END AS b
             |  FROM win l JOIN win r ON l.doc_id = r.doc_id
             |    AND r.k = l.k + 1
             |  WHERE l.k < 64)
             |SELECT doc_id, string_agg(b, '' ORDER BY k DESC) AS bits
             |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ----- Flesch-Kincaid readability ---------------------------------------
    // The classic readability grade as a quality-scoring feature,
    // under the standard corpus-scale approximations (whitespace
    // words, [.!?]+ sentence runs floored at 1, vowel-group
    // syllables). Pure regex projection; the oracle replays every
    // count 1:1.
    "q203_readability" -> Entry(
      // docsFan: syllable/sentence regex counting per row (r16 fan-out)
      (s, dir) => docsFan(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select(col("doc_id"),
          TextAnalysis.fleschKincaid(col("text")).as("fk_grade"))
        .orderBy("doc_id"),
      Some("""WITH c AS (SELECT doc_id,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
             |      AS DOUBLE) AS w,
             |    CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')),
             |      1) AS DOUBLE) AS sn,
             |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
             |      AS DOUBLE) AS syl
             |  FROM documents
             |  WHERE text IS NOT NULL AND trim(text) <> '')
             |SELECT doc_id,
             |  ROUND(CAST(0.39 AS DOUBLE) * w / sn
             |    + CAST(11.8 AS DOUBLE) * syl / w
             |    - CAST(15.59 AS DOUBLE), 6) AS fk_grade
             |FROM c ORDER BY doc_id""".stripMargin)),

    // ----- classifier eval: confusion matrix + per-class P/R/F1 -------------
    // The standard eval pair for the engine's trained classifiers.
    // Fixture: a "classifier" that over-predicts en on every 7th doc —
    // real off-diagonal mass in every language row. q205's report
    // keeps undefined metrics NULL (a never-predicted class has no
    // precision) instead of a silent 0 that would drag macro averages.
    "q204_confusion_matrix" -> Entry(
      (s, dir) => Metrics.confusionMatrix(
        t(s, dir, "documents").select(col("lang"),
          when(col("doc_id") % 7 === 0, lit("en")).otherwise(col("lang"))
            .as("pred")),
        "lang", "pred"),
      Some("""SELECT lang AS label,
             |  CASE WHEN doc_id % 7 = 0 THEN 'en' ELSE lang END AS pred,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM documents WHERE lang IS NOT NULL
             |GROUP BY 1, 2 ORDER BY label, pred""".stripMargin)),

    "q205_class_report" -> Entry(
      (s, dir) => Metrics.classReport(
        t(s, dir, "documents").select(col("lang"),
          when(col("doc_id") % 7 === 0, lit("en")).otherwise(col("lang"))
            .as("pred")),
        "lang", "pred"),
      Some("""WITH cells AS (SELECT lang AS label,
             |    CASE WHEN doc_id % 7 = 0 THEN 'en' ELSE lang END
             |      AS pred, COUNT(*) AS n
             |  FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2),
             |sup AS (SELECT label AS clazz, SUM(n) AS support
             |  FROM cells GROUP BY 1),
             |prd AS (SELECT pred AS clazz, SUM(n) AS predicted
             |  FROM cells GROUP BY 1),
             |tp AS (SELECT label AS clazz, n AS tp FROM cells
             |  WHERE label = pred),
             |j AS (SELECT COALESCE(s.clazz, p.clazz) AS clazz,
             |    COALESCE(support, 0) AS support,
             |    COALESCE(predicted, 0) AS predicted,
             |    COALESCE(tp, 0) AS tp
             |  FROM sup s FULL OUTER JOIN prd p ON s.clazz = p.clazz
             |  LEFT JOIN tp t ON COALESCE(s.clazz, p.clazz) = t.clazz)
             |SELECT clazz, CAST(support AS BIGINT) AS support,
             |  CAST(predicted AS BIGINT) AS predicted,
             |  CAST(tp AS BIGINT) AS tp,
             |  CASE WHEN predicted > 0 THEN
             |    ROUND(CAST(tp AS DOUBLE) / predicted, 6) END
             |    AS "precision",
             |  CASE WHEN support > 0 THEN
             |    ROUND(CAST(tp AS DOUBLE) / support, 6) END AS recall,
             |  CASE WHEN predicted > 0 AND support > 0
             |      AND (CAST(tp AS DOUBLE) / predicted
             |        + CAST(tp AS DOUBLE) / support) > 0 THEN
             |    ROUND(2.0 * (CAST(tp AS DOUBLE) / predicted)
             |      * (CAST(tp AS DOUBLE) / support)
             |      / (CAST(tp AS DOUBLE) / predicted
             |        + CAST(tp AS DOUBLE) / support), 6) END AS f1
             |FROM j ORDER BY clazz""".stripMargin)),

    // ----- Cohen's kappa ----------------------------------------------------
    // Chance-corrected agreement between two raters (here: truth lang
    // vs the q204 fixture classifier) — the labeling-pipeline QA
    // number. κ = (po − pe)/(1 − pe); oracle replays diag, marginal
    // products and the correction.
    "q206_cohens_kappa" -> Entry(
      (s, dir) => Metrics.cohensKappa(
        t(s, dir, "documents").select(col("lang"),
          when(col("doc_id") % 7 === 0, lit("en")).otherwise(col("lang"))
            .as("pred")),
        "lang", "pred"),
      Some("""WITH cells AS (SELECT lang AS a,
             |    CASE WHEN doc_id % 7 = 0 THEN 'en' ELSE lang END AS b,
             |    COUNT(*) AS n
             |  FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2),
             |r AS (SELECT a AS c, SUM(n) AS ra FROM cells GROUP BY 1),
             |cl AS (SELECT b AS c, SUM(n) AS cb FROM cells GROUP BY 1),
             |m AS (SELECT SUM(COALESCE(ra, 0) * COALESCE(cb, 0))
             |    AS sum_rc
             |  FROM r FULL OUTER JOIN cl ON r.c = cl.c),
             |t AS (SELECT SUM(n) AS n,
             |    SUM(CASE WHEN a = b THEN n ELSE 0 END) AS diag
             |  FROM cells)
             |SELECT CAST(t.n AS BIGINT) AS n,
             |  ROUND(CAST(diag AS DOUBLE) / t.n, 6) AS po,
             |  ROUND(CAST(sum_rc AS DOUBLE)
             |    / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)), 6)
             |    AS pe,
             |  CASE WHEN CAST(sum_rc AS DOUBLE)
             |      / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)) < 1.0
             |    THEN ROUND((CAST(diag AS DOUBLE) / t.n
             |        - CAST(sum_rc AS DOUBLE) / (CAST(t.n AS DOUBLE)
             |          * CAST(t.n AS DOUBLE)))
             |      / (1.0 - CAST(sum_rc AS DOUBLE)
             |        / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE))), 6)
             |    END AS kappa
             |FROM t CROSS JOIN m""".stripMargin)),

    // ----- Bradley-Terry preference ranking ---------------------------------
    // The pairwise-preference strength model (MM sweeps, q143's
    // unrolled-iteration oracle pattern): synthetic comparisons where
    // the lexicographically smaller priority always wins — a strict
    // ground-truth order the scores must recover, with 5-LOW (never a
    // winner) pinned at exactly 0. Three sweeps, each CTE layer
    // replaying denominator → update → renormalize.
    "q207_bradley_terry" -> Entry(
      (s, dir) => {
        val pri = array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"),
          lit("4-NOT SPECIFIED"), lit("5-LOW"))
        val pairs = t(s, dir, "orders")
          .select(col("o_orderpriority").as("a"),
            element_at(pri, (col("o_orderkey") % 5 + 1).cast("int"))
              .as("b"))
          .filter(col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("winner"),
            greatest(col("a"), col("b")).as("loser"))
        Metrics.bradleyTerry(pairs, "winner", "loser", sweeps = 3)
      },
      Some("""WITH p AS (SELECT LEAST(a, b) AS winner,
             |    GREATEST(a, b) AS loser
             |  FROM (SELECT o_orderpriority AS a,
             |      (['1-URGENT', '2-HIGH', '3-MEDIUM',
             |        '4-NOT SPECIFIED', '5-LOW'])[(o_orderkey % 5) + 1]
             |        AS b FROM orders)
             |  WHERE a <> b),
             |wins AS (SELECT winner AS item, COUNT(*) AS w
             |  FROM p GROUP BY 1),
             |sym AS (SELECT winner AS i, loser AS j, COUNT(*) AS m
             |  FROM p GROUP BY 1, 2),
             |edges AS (SELECT i AS item, j AS opp, m FROM sym
             |  UNION ALL SELECT j, i, m FROM sym),
             |pi0 AS (SELECT DISTINCT item, CAST(1.0 AS DOUBLE) AS pi
             |  FROM edges),
             |d1 AS (SELECT e.item,
             |    SUM(CAST(m AS DOUBLE) / (x.pi + y.pi)) AS d
             |  FROM edges e JOIN pi0 x ON e.item = x.item
             |  JOIN pi0 y ON e.opp = y.item GROUP BY 1),
             |u1 AS (SELECT d1.item,
             |    CAST(COALESCE(w, 0) AS DOUBLE) / d AS pr
             |  FROM d1 LEFT JOIN wins ON d1.item = wins.item),
             |pi1 AS (SELECT item, pr / (SELECT SUM(pr) FROM u1) AS pi
             |  FROM u1),
             |d2 AS (SELECT e.item,
             |    SUM(CAST(m AS DOUBLE) / (x.pi + y.pi)) AS d
             |  FROM edges e JOIN pi1 x ON e.item = x.item
             |  JOIN pi1 y ON e.opp = y.item GROUP BY 1),
             |u2 AS (SELECT d2.item,
             |    CAST(COALESCE(w, 0) AS DOUBLE) / d AS pr
             |  FROM d2 LEFT JOIN wins ON d2.item = wins.item),
             |pi2 AS (SELECT item, pr / (SELECT SUM(pr) FROM u2) AS pi
             |  FROM u2),
             |d3 AS (SELECT e.item,
             |    SUM(CAST(m AS DOUBLE) / (x.pi + y.pi)) AS d
             |  FROM edges e JOIN pi2 x ON e.item = x.item
             |  JOIN pi2 y ON e.opp = y.item GROUP BY 1),
             |u3 AS (SELECT d3.item,
             |    CAST(COALESCE(w, 0) AS DOUBLE) / d AS pr
             |  FROM d3 LEFT JOIN wins ON d3.item = wins.item),
             |pi3 AS (SELECT item, pr / (SELECT SUM(pr) FROM u3) AS pi
             |  FROM u3)
             |SELECT item, ROUND(pi, 6) AS score FROM pi3
             |ORDER BY score DESC, item""".stripMargin)),

    // ----- referential-integrity audit --------------------------------------
    // The fact↔dimension foreign-key check: the fixture THINS the
    // parent (every 7th order dropped) so lineitem has real orphans;
    // the report is one row of exact counts + the round-6 orphan rate.
    "q208_ref_integrity" -> Entry(
      (s, dir) => graft.operators.Checks.referentialIntegrity(
        t(s, dir, "lineitem"), "l_orderkey",
        t(s, dir, "orders").filter(col("o_orderkey") % 7 =!= 0),
        "o_orderkey"),
      Some("""WITH par AS (SELECT o_orderkey FROM orders
             |  WHERE o_orderkey % 7 <> 0),
             |tot AS (SELECT COUNT(*) AS n_child,
             |    SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
             |      AS n_null FROM lineitem),
             |orp AS (SELECT COUNT(DISTINCT l_orderkey) AS nk,
             |    COUNT(*) AS nr FROM lineitem
             |  WHERE l_orderkey IS NOT NULL
             |    AND l_orderkey NOT IN (SELECT o_orderkey FROM par))
             |SELECT CAST(n_child AS BIGINT) AS n_child,
             |  CAST(n_null AS BIGINT) AS n_null_keys,
             |  CAST(nk AS BIGINT) AS n_orphan_keys,
             |  CAST(nr AS BIGINT) AS n_orphan_rows,
             |  ROUND(CAST(nr AS DOUBLE)
             |    / GREATEST(n_child - n_null, 1), 6) AS orphan_rate
             |FROM tot, orp""".stripMargin)),

    // ----- per-key monotonicity audit ---------------------------------------
    // The out-of-order-event check: per customer, order ids should be
    // issued in date order — the generator's random dates give real
    // inversions at every scale. The seq key (o_orderkey) is UNIQUE,
    // so the lag order is total on both engines (lineitem's
    // l_linenumber is NOT unique per order in this generator — an
    // ambiguous seq makes the audit itself nondeterministic).
    "q209_monotonicity" -> Entry(
      (s, dir) => graft.operators.Checks.monotonicityViolations(
          t(s, dir, "orders"), "o_custkey", "o_orderkey",
          "o_orderdate")
        .limit(500),
      Some("""WITH l AS (SELECT o_custkey, o_orderdate AS v,
             |    LAG(o_orderdate) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderkey) AS prev
             |  FROM orders)
             |SELECT o_custkey, CAST(COUNT(*) AS BIGINT)
             |    AS n_inversions
             |  FROM l WHERE v < prev GROUP BY 1
             |ORDER BY n_inversions DESC, o_custkey LIMIT 500"""
        .stripMargin)),

    // ----- video size-envelope fingerprint ----------------------------------
    // The VIDEO member of the perceptual-hash family, fully codec-free:
    // q174's box-tree fixture (here 130-190 samples, no malformed
    // plants) → the real frameIndex walk → the relational envelope
    // hash over per-sample byte sizes. The oracle replays stsz size
    // arithmetic → window integer means → comparison bits with no
    // byte handling at all — every stage of the chain is pinned.
    "q210_video_fingerprint" -> Entry(
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents")
          .filter(col("doc_id") % 20 === 0).select(col("doc_id"))
        val ns = (lit(130) + col("doc_id") % 60).cast("int")
        val media = d.select(col("doc_id"),
            unhex(mp4FileHex(ns, plants = false)).as("payload"),
            lit("video").as("kind"))
          .as[Multimodal.MediaRecord]
        Multimodal.sizeEnvelopeHash(
            Multimodal.frameIndex(media).toDF(),
            "doc_id", "sample_idx", "size")
          .select(col("doc_id"),
            lpad(bin(col("dhash")), 64, "0").as("bits"))
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id,
             |    CAST(130 + doc_id % 60 AS INT) AS ns
             |  FROM documents WHERE doc_id % 20 = 0),
             |s AS (SELECT doc_id, ns, u.i AS i,
             |    50 + ((doc_id + u.i) % 7) * 10 AS sz
             |  FROM b, unnest(generate_series(0, ns - 1)) AS u(i)),
             |w AS (SELECT doc_id, LEAST(i * 65 // ns, 64) AS k,
             |    SUM(sz) // COUNT(*) AS e
             |  FROM s GROUP BY 1, 2),
             |bits AS (SELECT l.doc_id, l.k,
             |    CASE WHEN l.e < r.e THEN '1' ELSE '0' END AS bt
             |  FROM w l JOIN w r ON l.doc_id = r.doc_id
             |    AND r.k = l.k + 1
             |  WHERE l.k < 64)
             |SELECT doc_id, string_agg(bt, '' ORDER BY k DESC) AS bits
             |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ----- CUSUM change-point alarms ----------------------------------------
    // Page's sequential S_t = max(0, S_{t-1} + z_t) folded to TWO
    // running window frames (S_t = P_t − min(0, prefix-min P)) — no
    // recursion, no UDAF, bit-replayable because running frames fold
    // in identical seq order on both engines. The fixture sets the
    // target below the mean so every priority drifts into alarm —
    // first alarm point, peak, and alarm count all exact.
    "q211_cusum" -> Entry(
      (s, dir) => graft.operators.Checks.cusumAlarms(
        t(s, dir, "orders"), "o_orderpriority", "o_orderkey",
        "o_totalprice", target = 100000.0, slack = 0.0,
        threshold = 500000.0),
      Some("""WITH z AS (SELECT o_orderpriority AS k,
             |    o_orderkey AS seq,
             |    CAST(o_totalprice AS DECIMAL(24,6))
             |      - CAST(100000 AS DECIMAL(24,6))
             |      - CAST(0 AS DECIMAL(24,6)) AS z
             |  FROM orders),
             |p AS (SELECT k, seq, CAST(SUM(z) OVER (PARTITION BY k
             |    ORDER BY seq ROWS UNBOUNDED PRECEDING)
             |    AS DECIMAL(37,6)) AS pp
             |  FROM z),
             |mn AS (SELECT k, seq, pp, CAST(MIN(pp) OVER (
             |    PARTITION BY k ORDER BY seq
             |    ROWS UNBOUNDED PRECEDING) AS DECIMAL(37,6)) AS m
             |  FROM p),
             |sc AS (SELECT k, seq,
             |    pp - (CASE WHEN m < CAST(0 AS DECIMAL(37,6)) THEN m
             |      ELSE CAST(0 AS DECIMAL(37,6)) END) AS sv
             |  FROM mn)
             |SELECT k AS o_orderpriority,
             |  CAST(MIN(seq) AS BIGINT) AS first_alarm_seq,
             |  CAST(ROUND(MAX(sv), 6) AS DOUBLE) AS max_cusum,
             |  CAST(COUNT(*) AS BIGINT) AS n_alarms
             |FROM sc WHERE sv > CAST(500000 AS DECIMAL(38,6))
             |GROUP BY 1
             |ORDER BY o_orderpriority""".stripMargin)),

    // ----- type-widening union (schema evolution) ---------------------------
    // The drifted-snapshot case unionByName refuses: January wrote
    // int ids + float prices, March long ids + double prices + a new
    // column. unionWiden lifts both sides losslessly and null-fills
    // the gap; the oracle reproduces the widened values from the
    // original table — float→double widening is IEEE-identical on
    // both engines, so even the float-rounded comparisons agree
    // bit-for-bit.
    "q212_union_widen" -> Entry(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val jan = o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey").cast("int").as("id"),
            col("o_totalprice").cast("float").as("price"))
        val mar = o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey").as("id"),
            col("o_totalprice").as("price"),
            col("o_orderpriority").as("priority"))
        QuackIO.unionWiden(jan, mar)
          .agg(count(lit(1)).as("n"), min("id").as("min_id"),
            max("id").as("max_id"),
            sum(when(col("priority").isNull, 1L).otherwise(0L))
              .as("n_null_priority"),
            sum(when(col("price") > 200000.0, 1L).otherwise(0L))
              .as("n_big"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(MIN(o_orderkey) AS BIGINT) AS min_id,
             |  CAST(MAX(o_orderkey) AS BIGINT) AS max_id,
             |  CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_null_priority,
             |  CAST(SUM(CASE WHEN (CASE WHEN o_orderkey % 2 = 0
             |      THEN CAST(CAST(o_totalprice AS REAL) AS DOUBLE)
             |      ELSE o_totalprice END) > 200000.0
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_big
             |FROM orders""".stripMargin)),

    // ----- token-budget quality gate ----------------------------------------
    // keepTopQuantile keeps a fraction of DOCUMENTS, which
    // over-represents short docs; training recipes budget TOKENS. The
    // gate fills greedily by score (n_chars as the quality proxy, id
    // tiebreak) until 30% of the corpus's tokens are retained,
    // including the crossing doc; membership is all-integer
    // arithmetic on Rank.globalRunningSum, so both engines keep the
    // identical set — md5 of the kept ids pins it.
    "q213_token_budget_gate" -> Entry(
      (s, dir) => {
        val d = t(s, dir, "documents").filter(col("text").isNotNull)
          .select(col("doc_id"), col("n_chars"),
            TextAnalysis.tokenCount(col("text")).as("w"))
        Pipelines.keepTopTokenBudget(d, "doc_id", "n_chars", "w",
            keepBp = 3000)
          .agg(count(lit(1)).as("n_kept"),
            sum("w").as("tokens_kept"),
            md5(concat_ws(",",
              sort_array(collect_list(col("doc_id")))))
              .as("ids_md5"))
      },
      Some(s"""WITH d AS (SELECT doc_id, n_chars, len($TOKS) AS w
              |  FROM documents
              |  WHERE text IS NOT NULL AND n_chars IS NOT NULL),
              |r AS (SELECT doc_id, w, SUM(w) OVER (
              |    ORDER BY n_chars DESC, doc_id
              |    ROWS UNBOUNDED PRECEDING) AS run FROM d),
              |t AS (SELECT SUM(w) AS tot FROM d),
              |k AS (SELECT doc_id, w FROM r, t
              |  WHERE (run - w) * 10000 < 3000 * tot)
              |SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
              |  CAST(SUM(w) AS BIGINT) AS tokens_kept,
              |  md5(string_agg(CAST(doc_id AS VARCHAR), ','
              |    ORDER BY doc_id)) AS ids_md5
              |FROM k""".stripMargin)),

    // ----- image near-dup PAIRING, end to end -------------------------------
    // q201 pins the hashes; this pins the PAIRING: docs share one
    // image per doc_id-century (groups of five identical BMPs), and
    // with 8 bands over 64 bits the pigeonhole guarantees recall
    // through hamming 7 — so candidates ≡ ALL pairs at hamming ≤ 6,
    // which the oracle computes as the exact per-position diff count
    // over the replayed bit tables. Decode → hash → band → join →
    // verify, every stage SQL-checked.
    "q214_image_neardup_pairs" -> Entry(
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents")
          .filter(col("doc_id") % 20 === 0)
          .select(col("doc_id")).as[Long]
        val media = ids.map { id =>
          val g = id - id % 100 // five docs share each image
          Multimodal.MediaRecord(id, Multimodal.encodeBmp24(16, 8,
            (x, y) => (((g * 7 + x * 16) % 241).toInt,
              ((y * 29 + g) % 241).toInt,
              ((x * y + g * 3) % 241).toInt)), "image")
        }
        Multimodal.nearDupImages(media, maxHamming = 6)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH ids AS (SELECT doc_id,
             |    doc_id - doc_id % 100 AS g FROM documents
             |  WHERE doc_id % 20 = 0),
             |px AS (SELECT doc_id, x, y,
             |    (299 * ((g * 7 + x * 16) % 241)
             |     + 587 * ((y * 29 + g) % 241)
             |     + 114 * ((x * y + g * 3) % 241)) // 1000 AS gr
             |  FROM ids
             |  CROSS JOIN generate_series(0, 15) gx(x)
             |  CROSS JOIN generate_series(0, 7) gy(y)),
             |cells AS (SELECT doc_id, y AS cy,
             |    LEAST(x * 9 // 16, 8) AS cx,
             |    SUM(gr) // COUNT(*) AS avg_g
             |  FROM px GROUP BY 1, 2, 3),
             |bits AS (SELECT l.doc_id, l.cy * 8 + l.cx AS pos,
             |    CASE WHEN l.avg_g < r.avg_g THEN 1 ELSE 0 END AS b
             |  FROM cells l JOIN cells r ON l.doc_id = r.doc_id
             |    AND l.cy = r.cy AND r.cx = l.cx + 1
             |  WHERE l.cx < 8),
             |ham AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    SUM(CASE WHEN a.b <> b.b THEN 1 ELSE 0 END) AS hamming
             |  FROM bits a JOIN bits b ON a.pos = b.pos
             |    AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
             |FROM ham WHERE hamming <= 6
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // ----- NDCG@k retrieval eval --------------------------------------------
    // The graded companion to recall@k: a deterministic md5-ranked run
    // (the metric under test doesn't care where the ranking came
    // from) against a judged pool with 0-3 grades. Unjudged results
    // gain 0, no-relevant queries stay null. Oracle replays the run
    // ranking and both DCG sums.
    "q215_ndcg" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val q = docs.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("query_id"))
        val pool = docs.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").as("corpus_id"))
        val w = Window.partitionBy("query_id").orderBy(
          md5(concat(lit("run|"), col("query_id"), lit("|"),
            col("corpus_id"))), col("corpus_id"))
        // the query set is 1% of the corpus by construction — the
        // explicit broadcast declares the bounded side (and is the
        // CartesianProductGuard's sanctioned shape)
        val run = broadcast(q).crossJoin(pool)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
        val judged = docs.filter(col("doc_id") % 15 === 0)
          .select(col("doc_id").as("corpus_id"))
        val relevance = broadcast(q).crossJoin(judged)
          .select(col("query_id"), col("corpus_id"),
            ((expr("query_id div 100") + expr("corpus_id div 15")) % 4)
              .cast("double").as("rel"))
        Metrics.ndcgAtK(run, relevance, k = 10)
      },
      Some("""WITH q AS (SELECT doc_id AS query_id FROM documents
             |  WHERE doc_id % 100 = 0),
             |c AS (SELECT doc_id AS corpus_id FROM documents
             |  WHERE doc_id % 5 = 0),
             |runr AS (SELECT query_id, corpus_id,
             |    ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY md5('run|' || query_id || '|' || corpus_id),
             |        corpus_id) AS rnk
             |  FROM q CROSS JOIN c),
             |run AS (SELECT * FROM runr WHERE rnk <= 10),
             |rel AS (SELECT query_id, corpus_id,
             |    CAST((query_id // 100 + corpus_id // 15) % 4
             |      AS DOUBLE) AS rel
             |  FROM q CROSS JOIN (SELECT doc_id AS corpus_id
             |    FROM documents WHERE doc_id % 15 = 0)),
             |d AS (SELECT run.query_id,
             |    SUM((POWER(2, COALESCE(rel, 0)) - 1)
             |      / log2(rnk + 1)) AS dcg
             |  FROM run LEFT JOIN rel USING (query_id, corpus_id)
             |  GROUP BY 1),
             |i0 AS (SELECT query_id, rel, ROW_NUMBER() OVER (
             |    PARTITION BY query_id ORDER BY rel DESC, corpus_id)
             |    AS ir FROM rel WHERE rel > 0),
             |i AS (SELECT query_id,
             |    SUM((POWER(2, rel) - 1) / log2(ir + 1)) AS idcg
             |  FROM i0 WHERE ir <= 10 GROUP BY 1)
             |SELECT query_id, ROUND(COALESCE(dcg, 0), 6) AS dcg,
             |  ROUND(COALESCE(idcg, 0), 6) AS idcg,
             |  CASE WHEN COALESCE(idcg, 0) > 0
             |    THEN ROUND(COALESCE(dcg, 0) / idcg, 6) END AS ndcg
             |FROM d FULL OUTER JOIN i USING (query_id)
             |ORDER BY query_id""".stripMargin)),

    // ----- Spearman rank correlation ----------------------------------------
    // "Does the cheap score order the corpus like the expensive one" —
    // here n_chars vs token count (near-perfect but not exact: ties
    // and word-length variance do real midrank work). Rides
    // globalRank's midrank machinery; both engines compute the same
    // closed-form Pearson over the midrank vectors.
    "q216_spearman" -> Entry(
      (s, dir) => Metrics.spearman(
        t(s, dir, "documents").filter(col("text").isNotNull)
          .select(col("doc_id"), col("n_chars"),
            TextAnalysis.tokenCount(col("text")).as("ntok")),
        "n_chars", "ntok", "doc_id"),
      Some(s"""WITH d AS (SELECT doc_id,
              |    CAST(n_chars AS DOUBLE) AS x,
              |    CAST(len($TOKS) AS DOUBLE) AS y FROM documents
              |  WHERE text IS NOT NULL AND n_chars IS NOT NULL),
              |rx AS (SELECT doc_id, AVG(rn) OVER (PARTITION BY x)
              |    AS mx
              |  FROM (SELECT doc_id, x, CAST(ROW_NUMBER() OVER (
              |    ORDER BY x, doc_id) AS DOUBLE) AS rn FROM d)),
              |ry AS (SELECT doc_id, AVG(rn) OVER (PARTITION BY y)
              |    AS my
              |  FROM (SELECT doc_id, y, CAST(ROW_NUMBER() OVER (
              |    ORDER BY y, doc_id) AS DOUBLE) AS rn FROM d)),
              |j AS (SELECT mx, my FROM rx JOIN ry USING (doc_id)),
              |sums AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
              |    SUM(mx) AS sx, SUM(my) AS sy, SUM(mx * my) AS sxy,
              |    SUM(mx * mx) AS sxx, SUM(my * my) AS syy FROM j)
              |SELECT CAST(n AS BIGINT) AS n,
              |  ROUND((n * sxy - sx * sy)
              |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
              |    AS rho
              |FROM sums""".stripMargin)),

    // ----- X3 margin-based bitext mining (Artetxe & Schwenk 2019) -----------
    // The LASER/CCMatrix parallel-corpus miner: pairs between the two
    // vector sets score by cosine over the average cosine of each
    // side's own k-NN neighborhood (hubness cancellation), and only
    // MUTUAL margin-best pairs above threshold survive. The even/odd
    // vec_id halves stand in for the two languages. k-NN averages sum
    // quantized longs, so they are association-order-exact.
    "q217_margin_mining" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.marginMining(emb.filter(col("vec_id") % 2 === 0),
            emb.filter(col("vec_id") % 2 === 1),
            "vec_id", "embedding", k = 4, threshold = 1.0)
          .orderBy("x_id", "y_id")
      },
      Some("""WITH x AS (SELECT vec_id AS x_id, embedding AS xv
             |  FROM embeddings WHERE vec_id % 2 = 0),
             |y AS (SELECT vec_id AS y_id, embedding AS yv
             |  FROM embeddings WHERE vec_id % 2 = 1),
             |s AS (SELECT x_id, y_id,
             |  round(
             |    list_sum([xv[i]::DOUBLE * yv[i]::DOUBLE
             |      for i in generate_series(1, len(xv))]) /
             |    (sqrt(list_sum([xv[i]::DOUBLE * xv[i]::DOUBLE
             |      for i in generate_series(1, len(xv))])) *
             |     sqrt(list_sum([yv[i]::DOUBLE * yv[i]::DOUBLE
             |      for i in generate_series(1, len(yv))]))), 6) AS score
             |  FROM x, y),
             |f AS (SELECT x_id, y_id, score, ROW_NUMBER() OVER (
             |    PARTITION BY x_id ORDER BY score DESC, y_id) AS r
             |  FROM s),
             |b AS (SELECT x_id, y_id, score, ROW_NUMBER() OVER (
             |    PARTITION BY y_id ORDER BY score DESC, x_id) AS r
             |  FROM s),
             |ax AS (SELECT x_id,
             |    (CAST(SUM(CAST(round(score * 1e6) AS BIGINT))
             |      AS DOUBLE) / 1e6) / CAST(COUNT(*) AS DOUBLE) AS ax
             |  FROM f WHERE r <= 4 GROUP BY 1),
             |ay AS (SELECT y_id,
             |    (CAST(SUM(CAST(round(score * 1e6) AS BIGINT))
             |      AS DOUBLE) / 1e6) / CAST(COUNT(*) AS DOUBLE) AS ay
             |  FROM b WHERE r <= 4 GROUP BY 1),
             |cand AS (SELECT x_id, y_id, MAX(score) AS score FROM (
             |    SELECT x_id, y_id, score FROM f WHERE r <= 4
             |    UNION ALL
             |    SELECT x_id, y_id, score FROM b WHERE r <= 4)
             |  GROUP BY 1, 2),
             |m AS (SELECT c.x_id, c.y_id, c.score,
             |    CASE WHEN (ax.ax + ay.ay) / 2.0 > 0 THEN
             |      round(c.score / ((ax.ax + ay.ay) / 2.0), 6)
             |      END AS margin
             |  FROM cand c JOIN ax USING (x_id) JOIN ay USING (y_id)),
             |mm AS (SELECT x_id, y_id, score, margin,
             |    ROW_NUMBER() OVER (PARTITION BY x_id
             |      ORDER BY margin DESC, y_id) AS bx,
             |    ROW_NUMBER() OVER (PARTITION BY y_id
             |      ORDER BY margin DESC, x_id) AS b2
             |  FROM m)
             |SELECT x_id, y_id, score, margin FROM mm
             |WHERE bx = 1 AND b2 = 1 AND margin >= 1.0
             |ORDER BY x_id, y_id""".stripMargin)),

    // ----- Fellegi-Sunter entity resolution ----------------------------------
    // Probabilistic record linkage without a shared key: B is a
    // deterministically perturbed re-issue of the customer file
    // (uppercased names, occasional name typo / segment corruption /
    // balance drift / broken block), blocking on (nation, name's last
    // character) — a COMPOSITE block: nation alone makes the candidate
    // fan-out |A_b|·|B_b| 10x larger for zero extra recall here, and
    // blocking on a name-derived character demonstrates the classic
    // linkage trade: the %7 name-typo records fall out of their block
    // and go unlinked (they scored below the possible band anyway —
    // same visible output, a tenth of the pair work). The weights are
    // exact binary fractions so the score chain is bit-identical on
    // any engine; the oracle rebuilds B and replays the scoring from
    // first principles. Diagonal pairs classify match/possible; every
    // within-block noise pair scores below the possible band and is
    // dropped, so the output is linkage-sized, not block-product-sized.
    "q218_entity_resolution" -> Entry(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val a = c.select(col("c_custkey").as("a_id"),
          concat(col("c_nationkey").cast("string"), lit("|"),
            lower(substring(col("c_name"), -1, 1))).as("a_block"),
          col("c_name").as("a_name"),
          col("c_mktsegment").as("a_seg"),
          floor(col("c_acctbal") / 100.0).cast("long").as("a_balb"))
        val bName = when(col("c_custkey") % 7 === 0,
          concat(upper(col("c_name")), lit("X")))
          .otherwise(upper(col("c_name")))
        val b = c.select((col("c_custkey") + 100000L).as("b_id"),
          concat(when(col("c_custkey") % 11 === 0,
            (col("c_nationkey") + 1) % 25)
            .otherwise(col("c_nationkey")).cast("string"), lit("|"),
            lower(substring(bName, -1, 1))).as("b_block"),
          bName.as("b_name"),
          when(col("c_custkey") % 5 === 0, lit("PERTURBED"))
            .otherwise(col("c_mktsegment")).as("b_seg"),
          when(col("c_custkey") % 3 === 0,
            floor(col("c_acctbal") / 100.0).cast("long") + 1L)
            .otherwise(floor(col("c_acctbal") / 100.0).cast("long"))
            .as("b_balb"))
        EntityResolution.linkage(a, b, "a_id", "b_id", "a_block",
            "b_block", Seq(
              EntityResolution.FieldRule("a_name", "b_name", 8.0, -5.0),
              EntityResolution.FieldRule("a_seg", "b_seg", 2.0, -1.5),
              EntityResolution.FieldRule("a_balb", "b_balb", 3.0, -2.0)),
            matchAt = 10.0, possibleAt = 4.0)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH a AS (SELECT c_custkey AS id_a,
             |    CAST(c_nationkey AS VARCHAR) || '|'
             |      || lower(substr(c_name, -1, 1)) AS blk,
             |    lower(trim(c_name)) AS nm,
             |    lower(trim(c_mktsegment)) AS seg,
             |    CAST(floor(c_acctbal / 100.0) AS BIGINT) AS balb
             |  FROM customer),
             |b0 AS (SELECT *, CASE WHEN c_custkey % 7 = 0
             |    THEN upper(c_name) || 'X'
             |    ELSE upper(c_name) END AS bname FROM customer),
             |b AS (SELECT c_custkey + 100000 AS id_b,
             |    CAST(CASE WHEN c_custkey % 11 = 0
             |      THEN (c_nationkey + 1) % 25
             |      ELSE c_nationkey END AS VARCHAR) || '|'
             |      || lower(substr(bname, -1, 1)) AS blk,
             |    lower(trim(bname)) AS nm,
             |    lower(trim(CASE WHEN c_custkey % 5 = 0
             |      THEN 'PERTURBED' ELSE c_mktsegment END)) AS seg,
             |    CASE WHEN c_custkey % 3 = 0
             |      THEN CAST(floor(c_acctbal / 100.0) AS BIGINT) + 1
             |      ELSE CAST(floor(c_acctbal / 100.0) AS BIGINT)
             |      END AS balb
             |  FROM b0),
             |p AS (SELECT id_a, id_b, round(
             |    (CASE WHEN a.nm IS NULL OR b.nm IS NULL
             |       THEN CAST(0 AS DOUBLE)
             |       WHEN a.nm = b.nm THEN CAST(8 AS DOUBLE)
             |       ELSE CAST(-5 AS DOUBLE) END
             |     + CASE WHEN a.seg IS NULL OR b.seg IS NULL
             |       THEN CAST(0 AS DOUBLE)
             |       WHEN a.seg = b.seg THEN CAST(2 AS DOUBLE)
             |       ELSE CAST(-1.5 AS DOUBLE) END
             |     + CASE WHEN a.balb IS NULL OR b.balb IS NULL
             |       THEN CAST(0 AS DOUBLE)
             |       WHEN a.balb = b.balb THEN CAST(3 AS DOUBLE)
             |       ELSE CAST(-2 AS DOUBLE) END), 6) AS score
             |  FROM a JOIN b USING (blk))
             |SELECT id_a, id_b, score,
             |  CASE WHEN score >= 10 THEN 'match'
             |    WHEN score >= 4 THEN 'possible' END AS decision
             |FROM p WHERE score >= 4
             |ORDER BY id_a, id_b""".stripMargin)),

    // ----- leakage-free train/eval split -------------------------------------
    // Near-dup GROUPS, not documents, draw the split bucket — the eval
    // hygiene that stops "held-out" rows the model saw near-verbatim.
    // Groups are the q54 transitive closure over the planted near-dup
    // corpus; the oracle replays closure + md5 draw. By construction
    // no candidate pair crosses the boundary (the spec pins zero
    // leakage pairs).
    "q219_leakage_split" -> Entry(
      (s, dir) => Pipelines.leakageFreeSplit(nearDupDocs(s, dir),
          "doc_id", "text", evalBp = 2000)
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $NearDupDocsSql,
              |$MinhashPairsSql,
              |e AS (SELECT doc_a AS eu, doc_b AS ev FROM pairs
              |  UNION SELECT doc_b, doc_a FROM pairs),
              |reach(id, r) AS (
              |  SELECT eu, eu FROM e
              |  UNION
              |  SELECT reach.id, e.ev FROM reach JOIN e ON e.eu = reach.r),
              |comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
              |g AS (SELECT d.doc_id,
              |    CAST(COALESCE(comp.comp, d.doc_id) AS BIGINT) AS "group"
              |  FROM docs d LEFT JOIN comp ON comp.id = d.doc_id)
              |SELECT doc_id, "group",
              |  CASE WHEN CAST(('0x' || substr(md5('split|' ||
              |      "group"::VARCHAR), 1, 8)) AS UBIGINT) % 10000 < 2000
              |    THEN 'eval' ELSE 'train' END AS split
              |FROM g ORDER BY doc_id""".stripMargin)),

    // ----- X3 MRR retrieval metric -------------------------------------------
    // First-relevant-hit eval over the q215 deterministic run fixture:
    // per query, the rank of the first judged-relevant doc in the
    // top-10 and its reciprocal; queries with no relevant hit score 0
    // (the anti-inflation contract). Integer ranks, one reciprocal.
    "q220_mrr" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val q = docs.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("query_id"))
        val pool = docs.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").as("corpus_id"))
        val w = Window.partitionBy("query_id").orderBy(
          md5(concat(lit("run|"), col("query_id"), lit("|"),
            col("corpus_id"))), col("corpus_id"))
        val run = broadcast(q).crossJoin(pool)
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 10)
        val relevance = broadcast(q)
          .crossJoin(docs.filter(col("doc_id") % 15 === 0)
            .select(col("doc_id").as("corpus_id")))
        Metrics.mrr(run, relevance, k = 10)
      },
      Some("""WITH q AS (SELECT doc_id AS query_id FROM documents
             |  WHERE doc_id % 100 = 0),
             |c AS (SELECT doc_id AS corpus_id FROM documents
             |  WHERE doc_id % 5 = 0),
             |runr AS (SELECT query_id, corpus_id,
             |    ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY md5('run|' || query_id || '|' || corpus_id),
             |        corpus_id) AS rnk
             |  FROM q CROSS JOIN c),
             |run AS (SELECT * FROM runr WHERE rnk <= 10),
             |rel AS (SELECT query_id, corpus_id
             |  FROM q CROSS JOIN (SELECT doc_id AS corpus_id
             |    FROM documents WHERE doc_id % 15 = 0)),
             |hit AS (SELECT query_id, MIN(rnk) AS fr
             |  FROM run JOIN rel USING (query_id, corpus_id)
             |  GROUP BY 1)
             |SELECT q.query_id, fr AS first_rel_rank,
             |  round(COALESCE(CAST(1 AS DOUBLE) / CAST(fr AS DOUBLE),
             |    CAST(0 AS DOUBLE)), 6) AS rr
             |FROM q LEFT JOIN hit USING (query_id)
             |ORDER BY query_id""".stripMargin)),

    // ----- X5 Luhn-validated card-number PII ---------------------------------
    // The digit-shape regexes flag anything phone-shaped; the Luhn
    // mod-10 checksum is what separates an actual card number from a
    // random digit run. Fixture plants ISO test PANs (valid and
    // check-digit-broken) by doc_id residue; the oracle PREDICTS the
    // counts from first principles (the q197 convention) — the
    // operator must validate exactly the planted valid numbers and
    // nothing else (the corpus itself is digit-free, verified).
    "q221_luhn_cards" -> Entry(
      // docsFan: digit-run extraction + Luhn fold per row (r16 fan-out)
      (s, dir) => {
        val planted = docsFan(s, dir).select(col("doc_id"),
          concat(
            when(col("doc_id") % 3 === 0,
              concat(col("text"), lit(" pay 4111111111111111 now")))
              .when(col("doc_id") % 3 === 1,
                concat(col("text"), lit(" ref 4111111111111112 code")))
              .otherwise(col("text")),
            when(col("doc_id") % 9 === 0,
              lit(" amex 378282246310005")).otherwise(lit("")))
            .as("text"))
        TextAnalysis.withCardAudit(planted, "text")
          .select(col("doc_id"), col("n_card_candidates"),
            col("n_valid_cards"), col("card_pii"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 9 = 0 THEN 2
             |    WHEN doc_id % 3 IN (0, 1) THEN 1
             |    ELSE 0 END AS BIGINT) AS n_card_candidates,
             |  CAST(CASE WHEN doc_id % 9 = 0 THEN 2
             |    WHEN doc_id % 3 = 0 THEN 1
             |    ELSE 0 END AS BIGINT) AS n_valid_cards,
             |  (CASE WHEN doc_id % 9 = 0 THEN 2
             |    WHEN doc_id % 3 = 0 THEN 1
             |    ELSE 0 END) > 0 AS card_pii
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ----- X5 corpus BLEU -----------------------------------------------------
    // Generation eval: candidates are the references with every 7th
    // token replaced, so all four clipped n-gram precisions do real
    // work while lengths stay equal (bp = 1 through the min branch —
    // no transcendental in the hash path). Counts are integers
    // end-to-end; bleu = bp·sqrt(sqrt(p1·p2·p3·p4)).
    "q222_bleu" -> Entry(
      (s, dir) => {
        // tokens-direct path (bleuTokens): the candidate IS a
        // transform of the reference tokens, so building token arrays
        // in ONE scan and letting bleuTokens pin them once replaces
        // the old two-pin shape (pin text pairs, re-tokenize, pin
        // again) — measured cold head 9.8 s → scan+pin once
        val pairs = t(s, dir, "documents")
          .select(col("doc_id"),
            TextAnalysis.tokens(col("text")).as("rtoks"))
          .select(col("doc_id"), col("rtoks"),
            transform(col("rtoks"),
              (w, i) => when((i + 1) % 7 === 0, lit("xxx")).otherwise(w))
              .as("ctoks"))
        Metrics.bleuTokens(pairs, "doc_id", "ctoks", "rtoks")
      },
      Some(s"""WITH t0 AS (SELECT doc_id, $TOKS AS rw FROM documents),
              |t AS (SELECT doc_id, rw,
              |    [CASE WHEN i % 7 = 0 THEN 'xxx' ELSE rw[i] END
              |     for i in generate_series(1, len(rw))] AS cw
              |  FROM t0),
              |grams AS (SELECT doc_id, n.n AS n,
              |    CASE WHEN len(cw) >= n.n THEN
              |      [array_to_string(cw[i:i+n.n-1], ' ')
              |       for i in generate_series(1, len(cw)-n.n+1)]
              |      ELSE [] END AS cg,
              |    CASE WHEN len(rw) >= n.n THEN
              |      [array_to_string(rw[i:i+n.n-1], ' ')
              |       for i in generate_series(1, len(rw)-n.n+1)]
              |      ELSE [] END AS rg
              |  FROM t, (SELECT unnest(generate_series(1, 4)) AS n) n),
              |cc AS (SELECT doc_id, n, g, COUNT(*) AS cn
              |  FROM (SELECT doc_id, n, unnest(cg) AS g FROM grams)
              |  GROUP BY 1, 2, 3),
              |rc AS (SELECT doc_id, n, g, COUNT(*) AS rn
              |  FROM (SELECT doc_id, n, unnest(rg) AS g FROM grams)
              |  GROUP BY 1, 2, 3),
              |pn AS (SELECT n,
              |    CAST(SUM(LEAST(cn, COALESCE(rn, 0))) AS DOUBLE)
              |      / CAST(SUM(cn) AS DOUBLE) AS p
              |  FROM cc LEFT JOIN rc USING (doc_id, n, g) GROUP BY n),
              |lens AS (SELECT SUM(len(cw)) AS c_len,
              |    SUM(len(rw)) AS r_len FROM t),
              |w AS (SELECT
              |    (SELECT p FROM pn WHERE n = 1) AS p1,
              |    (SELECT p FROM pn WHERE n = 2) AS p2,
              |    (SELECT p FROM pn WHERE n = 3) AS p3,
              |    (SELECT p FROM pn WHERE n = 4) AS p4,
              |    c_len, r_len,
              |    CASE WHEN c_len >= r_len THEN CAST(1 AS DOUBLE)
              |      ELSE exp(CAST(1 AS DOUBLE)
              |        - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE))
              |      END AS bp
              |  FROM lens)
              |SELECT CAST(c_len AS BIGINT) AS c_len,
              |  CAST(r_len AS BIGINT) AS r_len,
              |  round(p1, 6) AS p1, round(p2, 6) AS p2,
              |  round(p3, 6) AS p3, round(p4, 6) AS p4,
              |  round(bp, 6) AS bp,
              |  CASE WHEN p1 > 0 AND p2 > 0 AND p3 > 0 AND p4 > 0
              |    THEN round(bp * sqrt(sqrt(p1 * p2 * p3 * p4)), 6)
              |    END AS bleu
              |FROM w""".stripMargin)),

    // ----- mergeable histogram state (incremental ANALYZE, shape) ------------
    // The q198 merge discipline applied to DISTRIBUTION shape: fixed
    // [0, 600000)×12 bins built per orderkey-parity snapshot, states
    // merged by integer addition — the oracle histograms the whole
    // table directly, so the merge must be invisible.
    "q223_mergeable_hist" -> Entry(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val sA = Profiles.histogram(o.filter(col("o_orderkey") % 2 === 0),
          "o_totalprice", 0.0, 600000.0, 12)
        val sB = Profiles.histogram(o.filter(col("o_orderkey") % 2 === 1),
          "o_totalprice", 0.0, 600000.0, 12)
        Profiles.mergeHistogramStates(sA.unionByName(sB))
          .orderBy("bin")
      },
      Some("""WITH h AS (SELECT CAST(least(greatest(
             |    floor((CAST(o_totalprice AS DOUBLE) - 0.0) / 50000.0),
             |    0.0), 11.0) AS BIGINT) AS bin, COUNT(*) AS n
             |  FROM orders
             |  WHERE o_totalprice IS NOT NULL
             |    AND NOT isnan(CAST(o_totalprice AS DOUBLE))
             |  GROUP BY 1)
             |SELECT bin,
             |  CAST(bin AS DOUBLE) * CAST(50000 AS DOUBLE) AS bin_lo,
             |  (CAST(bin AS DOUBLE) + 1) * CAST(50000 AS DOUBLE)
             |    AS bin_hi,
             |  CAST(n AS BIGINT) AS n
             |FROM h ORDER BY bin""".stripMargin)),

    // ----- tokenizer fertility by language ------------------------------------
    // The multilingual-tokenizer fairness audit (Ács 2019): subwords
    // per word and bytes per subword by lang under the SAME 10-merge
    // trained BPE as q107/q108 — a tokenizer trained on a mixed corpus
    // fragments its minority languages, and this is the report that
    // shows by how much. Integer sums, two final divisions.
    "q224_fertility" -> Entry(
      // docsFan: the word-count explode and the per-distinct-word BPE
      // segmentation fold are CPU-dense (r16 fan-out sweep)
      (s, dir) => {
        val docs = docsFan(s, dir)
        val merges = Vocab.bpeTrain(docs, "text", numMerges = 10)
        Vocab.fertilityByKey(docs, "lang", "text", merges)
          .withColumnRenamed("key", "lang")
      },
      Some {
        val tail =
          s"""tokd AS (SELECT lang, unnest($TOKS) AS word
             |  FROM documents),
             |tok AS (SELECT lang, word FROM tokd WHERE word <> ''),
             |pk AS (SELECT lang, COUNT(*) AS n_words,
             |    SUM(len(syms)) AS n_subwords
             |  FROM tok JOIN w10 USING (word) GROUP BY lang),
             |pd AS (SELECT lang, COUNT(*) AS n_docs,
             |    SUM(strlen(text)) AS n_bytes
             |  FROM documents GROUP BY lang)
             |SELECT pd.lang, CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(COALESCE(n_words, 0) AS BIGINT) AS n_words,
             |  CAST(COALESCE(n_subwords, 0) AS BIGINT) AS n_subwords,
             |  CAST(COALESCE(n_bytes, 0) AS BIGINT) AS n_bytes,
             |  CASE WHEN COALESCE(n_words, 0) > 0
             |    THEN round(CAST(n_subwords AS DOUBLE)
             |      / CAST(n_words AS DOUBLE), 6) END AS fertility,
             |  CASE WHEN COALESCE(n_subwords, 0) > 0
             |    THEN round(CAST(n_bytes AS DOUBLE)
             |      / CAST(n_subwords AS DOUBLE), 6) END
             |    AS bytes_per_subword
             |FROM pd LEFT JOIN pk USING (lang)
             |ORDER BY lang""".stripMargin
        s"WITH ${bpeChainSql(10)},\n$tail"
      }),

    // ----- co-purchase graph: Adamic-Adar item affinity -----------------------
    // Market-basket link prediction over the order-part bipartite
    // relation: co-occurrence support + the degree-discounted AA score
    // (sharing a 2-item order is strong evidence; a 17-item order is
    // weak). Per-order weights quantize to longs, so the pair sums
    // replay exactly; the per-group fan-out is basket-bounded.
    "q225_copurchase" -> Entry(
      (s, dir) => Graph.coOccurrence(
          t(s, dir, "lineitem").select(col("l_orderkey"),
            col("l_partkey")),
          "l_orderkey", "l_partkey", minSupport = 2L)
        .orderBy("item_a", "item_b"),
      Some("""WITH li AS (SELECT DISTINCT l_orderkey AS g,
             |    l_partkey AS i FROM lineitem),
             |d AS (SELECT g, COUNT(*) AS deg FROM li GROUP BY g),
             |wd AS (SELECT li.g, li.i, d.deg FROM li JOIN d USING (g)
             |  WHERE d.deg >= 2),
             |p AS (SELECT a.i AS item_a, b.i AS item_b,
             |    CAST(floor(1e12 / ln(CAST(a.deg AS DOUBLE)) + 0.5)
             |      AS BIGINT) AS w
             |  FROM wd a JOIN wd b ON a.g = b.g AND a.i < b.i),
             |c AS (SELECT item_a, item_b, COUNT(*) AS n_groups,
             |    SUM(w) AS sw FROM p GROUP BY 1, 2)
             |SELECT item_a, item_b, CAST(n_groups AS BIGINT) AS n_groups,
             |  round(CAST(sw AS DOUBLE) / 1e12, 6) AS aa_score
             |FROM c WHERE n_groups >= 2
             |ORDER BY item_a, item_b""".stripMargin)),

    // ----- Fellegi-Sunter EM iteration ----------------------------------------
    // Where the q218 weights COME from: one unsupervised EM step over
    // the block-candidate pairs' agreement vectors (Winkler 1988).
    // Every parameter is an exact dyadic so 1-x literals are
    // bit-identical on both engines; the E-step posterior is one
    // fixed-order rational expression; M-step sums quantize to longs.
    // The oracle replays the identical arithmetic.
    "q226_linkage_em" -> Entry(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val bal = floor(col("c_acctbal") / 100.0).cast("long")
        val a = c.select(
          concat(col("c_nationkey").cast("string"), lit("|"),
            lower(substring(col("c_name"), -1, 1))).as("blk"),
          lower(trim(col("c_name"))).as("a_nm"),
          lower(trim(col("c_mktsegment"))).as("a_seg"),
          bal.as("a_bal"))
        val emName = when(col("c_custkey") % 7 === 0,
          concat(upper(col("c_name")), lit("X")))
          .otherwise(upper(col("c_name")))
        val b = c.select(
          concat(when(col("c_custkey") % 11 === 0,
            (col("c_nationkey") + 1) % 25)
            .otherwise(col("c_nationkey")).cast("string"), lit("|"),
            lower(substring(emName, -1, 1))).as("blk"),
          lower(trim(emName)).as("b_nm"),
          lower(trim(when(col("c_custkey") % 5 === 0, lit("PERTURBED"))
            .otherwise(col("c_mktsegment")))).as("b_seg"),
          when(col("c_custkey") % 3 === 0, bal + 1L).otherwise(bal)
            .as("b_bal"))
        val pairs = a.join(b, "blk").select(
          (col("a_nm") === col("b_nm")).as("g_name"),
          (col("a_seg") === col("b_seg")).as("g_seg"),
          (col("a_bal") === col("b_bal")).as("g_bal"))
        EntityResolution.emStep(pairs, Seq("g_name", "g_seg", "g_bal"),
          p = 0.03125,
          m = Seq(0.875, 0.75, 0.75), u = Seq(0.03125, 0.25, 0.375))
      },
      Some("""WITH a AS (SELECT
             |    CAST(c_nationkey AS VARCHAR) || '|'
             |      || lower(substr(c_name, -1, 1)) AS blk,
             |    lower(trim(c_name)) AS a_nm,
             |    lower(trim(c_mktsegment)) AS a_seg,
             |    CAST(floor(c_acctbal / 100.0) AS BIGINT) AS a_bal
             |  FROM customer),
             |b0 AS (SELECT *, CASE WHEN c_custkey % 7 = 0
             |    THEN upper(c_name) || 'X'
             |    ELSE upper(c_name) END AS bname FROM customer),
             |b AS (SELECT CAST(CASE WHEN c_custkey % 11 = 0
             |      THEN (c_nationkey + 1) % 25
             |      ELSE c_nationkey END AS VARCHAR) || '|'
             |      || lower(substr(bname, -1, 1)) AS blk,
             |    lower(trim(bname)) AS b_nm,
             |    lower(trim(CASE WHEN c_custkey % 5 = 0
             |      THEN 'PERTURBED' ELSE c_mktsegment END)) AS b_seg,
             |    CASE WHEN c_custkey % 3 = 0
             |      THEN CAST(floor(c_acctbal / 100.0) AS BIGINT) + 1
             |      ELSE CAST(floor(c_acctbal / 100.0) AS BIGINT)
             |      END AS b_bal
             |  FROM b0),
             |g AS (SELECT a_nm = b_nm AS g0, a_seg = b_seg AS g1,
             |    a_bal = b_bal AS g2
             |  FROM a JOIN b USING (blk)),
             |e AS (SELECT
             |    CAST(0.03125 AS DOUBLE) * ((CASE WHEN g0
             |        THEN CAST(0.875 AS DOUBLE)
             |        ELSE CAST(0.125 AS DOUBLE) END
             |      * CASE WHEN g1 THEN CAST(0.75 AS DOUBLE)
             |        ELSE CAST(0.25 AS DOUBLE) END)
             |      * CASE WHEN g2 THEN CAST(0.75 AS DOUBLE)
             |        ELSE CAST(0.25 AS DOUBLE) END) AS num,
             |    CAST(0.96875 AS DOUBLE) * ((CASE WHEN g0
             |        THEN CAST(0.03125 AS DOUBLE)
             |        ELSE CAST(0.96875 AS DOUBLE) END
             |      * CASE WHEN g1 THEN CAST(0.25 AS DOUBLE)
             |        ELSE CAST(0.75 AS DOUBLE) END)
             |      * CASE WHEN g2 THEN CAST(0.375 AS DOUBLE)
             |        ELSE CAST(0.625 AS DOUBLE) END) AS du,
             |    g0, g1, g2 FROM g),
             |wt AS (SELECT num / (num + du) AS w, g0, g1, g2 FROM e),
             |q0 AS (SELECT COUNT(*) AS n,
             |    SUM(CAST(floor(w * 1e9 + 0.5) AS BIGINT)) AS sw,
             |    SUM(CAST(floor((CASE WHEN g0 THEN w
             |      ELSE CAST(0 AS DOUBLE) END) * 1e9 + 0.5) AS BIGINT))
             |      AS swg0,
             |    SUM(CAST(floor((CASE WHEN g1 THEN w
             |      ELSE CAST(0 AS DOUBLE) END) * 1e9 + 0.5) AS BIGINT))
             |      AS swg1,
             |    SUM(CAST(floor((CASE WHEN g2 THEN w
             |      ELSE CAST(0 AS DOUBLE) END) * 1e9 + 0.5) AS BIGINT))
             |      AS swg2,
             |    SUM(CAST(floor((CASE WHEN g0 THEN CAST(1 AS DOUBLE) - w
             |      ELSE CAST(0 AS DOUBLE) END) * 1e9 + 0.5) AS BIGINT))
             |      AS svg0,
             |    SUM(CAST(floor((CASE WHEN g1 THEN CAST(1 AS DOUBLE) - w
             |      ELSE CAST(0 AS DOUBLE) END) * 1e9 + 0.5) AS BIGINT))
             |      AS svg1,
             |    SUM(CAST(floor((CASE WHEN g2 THEN CAST(1 AS DOUBLE) - w
             |      ELSE CAST(0 AS DOUBLE) END) * 1e9 + 0.5) AS BIGINT))
             |      AS svg2,
             |    SUM(CAST(floor((CAST(1 AS DOUBLE) - w) * 1e9 + 0.5)
             |      AS BIGINT)) AS sv
             |  FROM wt)
             |SELECT param, field, value FROM (
             |  SELECT 'p' AS param, CAST(NULL AS VARCHAR) AS field,
             |    round((CAST(sw AS DOUBLE) / 1e9)
             |      / CAST(n AS DOUBLE), 6) AS value FROM q0
             |  UNION ALL SELECT 'm', 'g_name',
             |    round(CAST(swg0 AS DOUBLE) / CAST(sw AS DOUBLE), 6)
             |    FROM q0
             |  UNION ALL SELECT 'm', 'g_seg',
             |    round(CAST(swg1 AS DOUBLE) / CAST(sw AS DOUBLE), 6)
             |    FROM q0
             |  UNION ALL SELECT 'm', 'g_bal',
             |    round(CAST(swg2 AS DOUBLE) / CAST(sw AS DOUBLE), 6)
             |    FROM q0
             |  UNION ALL SELECT 'u', 'g_name',
             |    round(CAST(svg0 AS DOUBLE) / CAST(sv AS DOUBLE), 6)
             |    FROM q0
             |  UNION ALL SELECT 'u', 'g_seg',
             |    round(CAST(svg1 AS DOUBLE) / CAST(sv AS DOUBLE), 6)
             |    FROM q0
             |  UNION ALL SELECT 'u', 'g_bal',
             |    round(CAST(svg2 AS DOUBLE) / CAST(sv AS DOUBLE), 6)
             |    FROM q0)
             |ORDER BY param, field""".stripMargin)),

    // ----- one-pass Poisson bootstrap CI ---------------------------------------
    // The data-parallel bootstrap (Binomial(N,1/N) → Poisson(1)): each
    // row draws a deterministic md5 Poisson weight per replicate, so a
    // replicate is a weighted one-pass aggregate — no resample
    // materialization. Fixed-point cents keep every replicate mean a
    // ratio of integer sums; the CI is the type-7 percentile over the
    // 32 replicate means. Oracle replays draws, weights, and both
    // percentiles.
    "q227_bootstrap_ci" -> Entry(
      (s, dir) => Sampling.poissonBootstrapCI(t(s, dir, "orders"),
        "o_totalprice", "o_orderkey", replicates = 32, alpha = 0.05,
        scale = 2, salt = "boot"),
      Some {
        val cum = Sampling.PoissonCum
          .map(c => s"CAST($c AS DOUBLE)")
        val wSql = cum.map(c => s"CASE WHEN u >= $c THEN 1 ELSE 0 END")
          .mkString("(", " + ", ")")
        s"""WITH base AS (SELECT o_orderkey AS id,
           |    CAST(floor(CAST(o_totalprice AS DOUBLE)
           |      * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE))
           |      AS BIGINT) AS v
           |  FROM orders WHERE o_totalprice IS NOT NULL),
           |whole AS (SELECT COUNT(*) AS n,
           |    CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           |      / CAST(100 AS DOUBLE) AS est FROM base),
           |reps AS (SELECT unnest(generate_series(0, 31)) AS rep),
           |draws AS (SELECT rep, v,
           |    CAST(CAST(('0x' || substr(md5('boot' ||
           |      CAST(rep AS VARCHAR) || '|' || CAST(id AS VARCHAR)),
           |      1, 8)) AS UBIGINT) AS DOUBLE) / 4294967296.0 AS u
           |  FROM base, reps),
           |wt AS (SELECT rep, v, $wSql AS w FROM draws),
           |means AS (SELECT rep,
           |    CAST(SUM(w * v) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
           |      / CAST(100 AS DOUBLE) AS m
           |  FROM wt GROUP BY rep)
           |SELECT CAST(whole.n AS BIGINT) AS n,
           |  round(whole.est, 6) AS est_mean,
           |  round(quantile_cont(m, 0.025), 6) AS ci_lo,
           |  round(quantile_cont(m, 0.975), 6) AS ci_hi
           |FROM means, whole GROUP BY whole.n, whole.est""".stripMargin
      }),

    // ----- Wilson lower-bound source ranking -----------------------------------
    // "Sort by lower bound, not raw rate": per-source quality pass
    // rates with Wilson score intervals, so a 3-doc source cannot
    // outrank a 1000-doc one on luck. Two integer aggregates + one
    // fixed-order expression with a single hardware sqrt.
    "q228_wilson_bounds" -> Entry(
      (s, dir) => Profiles.proportionBounds(t(s, dir, "documents"),
          "source", col("n_chars") >= 300, z = 1.96)
        .withColumnRenamed("key", "source"),
      Some {
        val z2 = 1.96 * 1.96
        s"""WITH a AS (SELECT source AS key, COUNT(*) AS n,
           |    SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS k
           |  FROM documents GROUP BY 1),
           |e AS (SELECT key, n, k,
           |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
           |    CAST(1 AS DOUBLE) + CAST($z2 AS DOUBLE)
           |      / CAST(n AS DOUBLE) AS denom FROM a),
           |w AS (SELECT key, n, k, p,
           |    (p + CAST($z2 AS DOUBLE)
           |      / (CAST(2 AS DOUBLE) * CAST(n AS DOUBLE))) / denom
           |      AS center,
           |    (CAST(1.96 AS DOUBLE) * sqrt(p * (CAST(1 AS DOUBLE) - p)
           |        / CAST(n AS DOUBLE)
           |      + CAST($z2 AS DOUBLE) / (CAST(4 AS DOUBLE)
           |        * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) / denom
           |      AS half
           |  FROM e)
           |SELECT key AS source, CAST(n AS BIGINT) AS n,
           |  CAST(k AS BIGINT) AS k, round(p, 6) AS rate,
           |  round(center - half, 6) AS wilson_lo,
           |  round(center + half, 6) AS wilson_hi
           |FROM w ORDER BY wilson_lo DESC, source""".stripMargin
      }),

    // ----- ROUGE-L (LCS-based generation eval) ---------------------------------
    // The in-order-at-any-gap companion to q222 BLEU: candidates are
    // 12-token prefixes with every 3rd token corrupted, so the LCS
    // (native two-row DP expression) does real work. The ORACLE runs
    // the same DP in SQL — the row carried as a csv string through
    // nested list_reduce folds (the bpe-chain accumulator trick;
    // list_reduce requires acc type == element type).
    "q229_rouge_l" -> Entry(
      // docsFan: the LCS DP expression is per-row CPU (r16 fan-out)
      (s, dir) => {
        val trimmed = docsFan(s, dir)
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__w"))
          .select(col("doc_id"),
            array_join(slice(col("__w"), 1, 12), " ").as("ref"),
            array_join(transform(slice(col("__w"), 1, 12),
              (w, i) => when((i + 1) % 3 === 0, lit("zz")).otherwise(w)),
              " ").as("cand"))
        Metrics.rougeL(trimmed, "doc_id", "cand", "ref")
          .orderBy("doc_id")
      },
      Some(s"""WITH t0 AS (SELECT doc_id, ($TOKS)[1:12] AS rw
              |  FROM documents),
              |t AS (SELECT doc_id, rw,
              |    [CASE WHEN i % 3 = 0 THEN 'zz' ELSE rw[i] END
              |     for i in generate_series(1, len(rw))] AS cw
              |  FROM t0),
              |dp AS (SELECT doc_id, cw, rw,
              |  list_reduce(
              |    [array_to_string([0 for j in
              |      generate_series(0, len(rw))], ',')] || cw,
              |    (old, ct) -> (
              |      list_reduce(
              |        ['0'] || [CAST(j AS VARCHAR)
              |          for j in generate_series(1, len(rw))],
              |        (acc, jj) -> acc || ',' || CAST(greatest(
              |            CAST(string_split(old, ',')[CAST(jj AS INT) + 1]
              |              AS INT),
              |            CAST(string_split(acc, ',')[-1] AS INT),
              |            CAST(string_split(old, ',')[CAST(jj AS INT)]
              |              AS INT)
              |              + CASE WHEN rw[CAST(jj AS INT)] = ct
              |                THEN 1 ELSE 0 END
              |          ) AS VARCHAR)
              |      )
              |    )
              |  ) AS lastrow
              |  FROM t),
              |m AS (SELECT doc_id, len(cw) AS n_cand, len(rw) AS n_ref,
              |    CAST(string_split(lastrow, ',')[-1] AS INT) AS lcs
              |  FROM dp),
              |f AS (SELECT doc_id, n_cand, n_ref, lcs,
              |    CAST(lcs AS DOUBLE) / CAST(n_cand AS DOUBLE) AS p,
              |    CAST(lcs AS DOUBLE) / CAST(n_ref AS DOUBLE) AS r
              |  FROM m)
              |SELECT doc_id, CAST(n_cand AS BIGINT) AS n_cand,
              |  CAST(n_ref AS BIGINT) AS n_ref, CAST(lcs AS BIGINT) AS lcs,
              |  round(p, 6) AS p, round(r, 6) AS r,
              |  CASE WHEN lcs > 0 THEN
              |    round(CAST(2 AS DOUBLE) * p * r / (p + r), 6) END AS f1
              |FROM f ORDER BY doc_id""".stripMargin)),

    // ----- embedding-space JS divergence (MAUVE-family corpus eval) ----------
    // Quantize-then-diverge: both label-halves assign to one shared
    // 8-centroid codebook and their cluster-occupancy distributions
    // compare by Jensen-Shannon. No eps floor — a zero share
    // contributes 0 to its own KL half and M stays positive wherever
    // either side lives. Oracle replays assignment, counts, and the
    // JS arithmetic.
    "q231_embedding_js" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Embeddings.embeddingJsDivergence(
          emb.filter(col("label") % 2 === 0),
          emb.filter(col("label") % 2 === 1),
          emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", "vec_id", "embedding")
      },
      Some {
        def cos(a: String, b: String) =
          s"""round(
             |    list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($a))]) /
             |    (sqrt(list_sum([$a[i]::DOUBLE * $a[i]::DOUBLE
             |      for i in generate_series(1, len($a))])) *
             |     sqrt(list_sum([$b[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($b))]))), 6)""".stripMargin
        s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv
           |  FROM embeddings WHERE vec_id < 8),
           |scc AS (SELECT e.vec_id, e.label, c.cid,
           |  ${cos("e.embedding", "c.cv")} AS cs
           |  FROM embeddings e, c),
           |asgn AS (SELECT vec_id, label, cid AS cluster FROM (
           |  SELECT vec_id, label, cid, ROW_NUMBER() OVER (
           |    PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
           |  FROM scc) WHERE rn = 1),
           |ha AS (SELECT cluster, COUNT(*) AS n_a FROM asgn
           |  WHERE label % 2 = 0 GROUP BY 1),
           |hb AS (SELECT cluster, COUNT(*) AS n_b FROM asgn
           |  WHERE label % 2 = 1 GROUP BY 1),
           |sp AS (SELECT cid AS cluster, COALESCE(n_a, 0) AS n_a,
           |    COALESCE(n_b, 0) AS n_b
           |  FROM c LEFT JOIN ha ON ha.cluster = c.cid
           |  LEFT JOIN hb ON hb.cluster = c.cid),
           |tt AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM sp),
           |sh AS (SELECT cluster, n_a, n_b,
           |    CAST(n_a AS DOUBLE) / CAST(ta AS DOUBLE) AS sa,
           |    CAST(n_b AS DOUBLE) / CAST(tb AS DOUBLE) AS sb
           |  FROM sp, tt)
           |SELECT CAST(cluster AS BIGINT) AS cluster,
           |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           |  sa AS share_a, sb AS share_b,
           |  round(CAST(0.5 AS DOUBLE) * (CASE WHEN sa > 0
           |      THEN sa * ln(sa / ((sa + sb) / 2.0))
           |      ELSE CAST(0 AS DOUBLE) END)
           |    + CAST(0.5 AS DOUBLE) * (CASE WHEN sb > 0
           |      THEN sb * ln(sb / ((sa + sb) / 2.0))
           |      ELSE CAST(0 AS DOUBLE) END), 6) AS js_term
           |FROM sh ORDER BY cluster""".stripMargin
      }),

    // ----- X3 margin mining at scale: IVF candidates ---------------------------
    // The q217 miner with cluster-bucketed candidate generation — the
    // 100 TB form (pairs exist only within shared IVF clusters, never
    // |X|·|Y|); the margin/mutual logic is byte-identical code
    // (marginMiningFrom reads only ranked (query, corpus, score)
    // rows). The oracle replays assignment, in-cluster ranking, and
    // the same margin arithmetic.
    "q230_margin_ivf" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.marginMiningIvf(
            emb.filter(col("vec_id") % 2 === 0),
            emb.filter(col("vec_id") % 2 === 1),
            emb.filter(col("vec_id") < 4),
            "vec_id", "embedding", k = 4, "vec_id", "embedding",
            threshold = 1.0)
          .orderBy("x_id", "y_id")
      },
      Some {
        def cos(a: String, b: String) =
          s"""round(
             |    list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($a))]) /
             |    (sqrt(list_sum([$a[i]::DOUBLE * $a[i]::DOUBLE
             |      for i in generate_series(1, len($a))])) *
             |     sqrt(list_sum([$b[i]::DOUBLE * $b[i]::DOUBLE
             |      for i in generate_series(1, len($b))]))), 6)""".stripMargin
        s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv
           |  FROM embeddings WHERE vec_id < 4),
           |scc AS (SELECT e.vec_id, e.embedding, c.cid,
           |  ${cos("e.embedding", "c.cv")} AS cs
           |  FROM embeddings e, c),
           |asgn AS (SELECT vec_id, embedding, cid AS cluster FROM (
           |  SELECT vec_id, embedding, cid, ROW_NUMBER() OVER (
           |    PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
           |  FROM scc) WHERE rn = 1),
           |x AS (SELECT vec_id AS x_id, embedding AS xv, cluster
           |  FROM asgn WHERE vec_id % 2 = 0),
           |y AS (SELECT vec_id AS y_id, embedding AS yv, cluster
           |  FROM asgn WHERE vec_id % 2 = 1),
           |s AS (SELECT x_id, y_id, ${cos("xv", "yv")} AS score
           |  FROM x JOIN y USING (cluster)),
           |f AS (SELECT x_id, y_id, score, ROW_NUMBER() OVER (
           |    PARTITION BY x_id ORDER BY score DESC, y_id) AS r
           |  FROM s),
           |b AS (SELECT x_id, y_id, score, ROW_NUMBER() OVER (
           |    PARTITION BY y_id ORDER BY score DESC, x_id) AS r
           |  FROM s),
           |ax AS (SELECT x_id,
           |    (CAST(SUM(CAST(round(score * 1e6) AS BIGINT))
           |      AS DOUBLE) / 1e6) / CAST(COUNT(*) AS DOUBLE) AS ax
           |  FROM f WHERE r <= 4 GROUP BY 1),
           |ay AS (SELECT y_id,
           |    (CAST(SUM(CAST(round(score * 1e6) AS BIGINT))
           |      AS DOUBLE) / 1e6) / CAST(COUNT(*) AS DOUBLE) AS ay
           |  FROM b WHERE r <= 4 GROUP BY 1),
           |cand AS (SELECT x_id, y_id, MAX(score) AS score FROM (
           |    SELECT x_id, y_id, score FROM f WHERE r <= 4
           |    UNION ALL
           |    SELECT x_id, y_id, score FROM b WHERE r <= 4)
           |  GROUP BY 1, 2),
           |m AS (SELECT cand.x_id, cand.y_id, cand.score,
           |    CASE WHEN (ax.ax + ay.ay) / 2.0 > 0 THEN
           |      round(cand.score / ((ax.ax + ay.ay) / 2.0), 6)
           |      END AS margin
           |  FROM cand JOIN ax USING (x_id) JOIN ay USING (y_id)),
           |mm AS (SELECT x_id, y_id, score, margin,
           |    ROW_NUMBER() OVER (PARTITION BY x_id
           |      ORDER BY margin DESC, y_id) AS bx,
           |    ROW_NUMBER() OVER (PARTITION BY y_id
           |      ORDER BY margin DESC, x_id) AS b2
           |  FROM m)
           |SELECT x_id, y_id, score, margin FROM mm
           |WHERE bx = 1 AND b2 = 1 AND margin >= 1.0
           |ORDER BY x_id, y_id""".stripMargin
      })
  )

  /** Round-7 curation composition: Gopher gate → exact dedup (min id)
    * → FUZZY decontamination, over a corpus planted with BOTH exact
    * copies (doc_id%5 → +1e6) and near copies (doc_id%7, last 3 tokens
    * dropped → +2e6) so each stage does real work: the gate prunes
    * short/stopword-poor docs at the scan, dedup kills the exact
    * copies, and the fuzzy stage drops benchmark members AND their
    * planted near-duplicates (exact-overlap decon would only certainly
    * catch verbatim members). */
  /** The q174 MP4 fixture, parameterized: a structurally-valid
    * ftyp+moov box tree whose stts/stsc/stsz/stco arithmetic is
    * closed-form in (doc_id, ns) so oracles replay it; `plants`
    * additionally mis-declares stsz on doc_id%23 and swaps in a
    * moov-less mdat on doc_id%19 (the malformed contracts). */
  private def mp4FileHex(ns: org.apache.spark.sql.Column,
      plants: Boolean): org.apache.spark.sql.Column = {
    def hxp(c: org.apache.spark.sql.Column, w: Int) =
      lpad(lower(hex(c)), w, "0")
    def asc(t: String): String =
      t.getBytes("US-ASCII").map(b => f"$b%02x").mkString
    // box lengths are CLOSED-FORM in (ns, nchunks), never derived
    // from length(contentHex): a boxh that embeds its content twice
    // (once under length(), once in the body) DOUBLES the subtree
    // per nesting level — six levels deep that is a 2^6 expression
    // blowup, observed as a 19 s entry before this form
    def boxh(typ: String, contentBytes: org.apache.spark.sql.Column,
        contentHex: org.apache.spark.sql.Column) =
      concat(hxp((lit(8) + contentBytes).cast("int"), 8),
        lit(asc(typ)), contentHex)
    val tsc = (lit(1000) * (lit(1) + col("doc_id") % 3)).cast("int")
    val d1 = (lit(100) + col("doc_id") % 50).cast("int")
    val d2 = (lit(200) + col("doc_id") % 30).cast("int")
    val stts = boxh("stts", lit(24), concat(lit("00000000"),
      hxp(lit(2), 8), hxp(lit(2), 8), hxp(d1, 8), hxp(ns - 2, 8),
      hxp(d2, 8)))
    val stsc = boxh("stsc", lit(32), concat(lit("00000000"),
      hxp(lit(2), 8), hxp(lit(1), 8), hxp(lit(2), 8), hxp(lit(1), 8),
      hxp(lit(3), 8), hxp(lit(3), 8), hxp(lit(1), 8)))
    val sizesHex = concat_ws("", transform(sequence(lit(0), ns - 1),
      i => hxp(lit(50) + ((col("doc_id") + i) % 7) * 10, 8)))
    // the %23 plant declares ONE MORE sample than stts provides
    val stszCount = if (plants) {
      when(col("doc_id") % 23 === 0, ns + 1).otherwise(ns)
    } else ns
    val stsz = boxh("stsz", lit(12) + ns * 4,
      concat(lit("00000000"), hxp(lit(0), 8), hxp(stszCount, 8),
        sizesHex))
    val nchunks = (lit(2) +
      floor((ns - lit(2)).cast("double") / 3.0).cast("int"))
    val offsHex = concat_ws("", transform(sequence(lit(0),
      nchunks - 1), c => hxp(lit(1000) + c * 5000, 8)))
    val stco = boxh("stco", lit(8) + nchunks * 4,
      concat(lit("00000000"), hxp(nchunks, 8), offsHex))
    val mdhd = boxh("mdhd", lit(24), concat(lit("00000000" * 3),
      hxp(tsc, 8), lit("00000000" * 2)))
    // cumulative box sizes: stbl = 4 boxes, each +8 header
    val stblB = lit(24 + 8) + lit(32 + 8) + (lit(12) + ns * 4) +
      lit(8) + (lit(8) + nchunks * 4) + lit(8)
    val minfB = stblB + 8
    val mdiaB = lit(24 + 8) + minfB + 8
    val trakB = mdiaB + 8
    val moov = boxh("moov", trakB + 8, boxh("trak", mdiaB + 8,
      boxh("mdia", mdiaB, concat(mdhd,
        boxh("minf", minfB, boxh("stbl", stblB,
          concat(stts, stsc, stsz, stco)))))))
    val ftypHex = "00000010" + asc("ftyp") + asc("isom") + "00000000"
    val fileHex = if (plants) {
      when(col("doc_id") % 19 === 0, lit("0000000a6d646174"))
        .otherwise(concat(lit(ftypHex), moov))
    } else concat(lit(ftypHex), moov)
    fileHex
  }

  private lazy val Q109Entry: Entry = Entry(
    (s, dir) => {
      val d = docsFan(s, dir).select(col("doc_id"), col("text"))
      val corp = d
        .union(plantedCopies(d, mod = 5, offset = 1000000L, dropTokens = 0))
        .union(plantedCopies(d, mod = 7, offset = 2000000L, dropTokens = 3))
      val bench = docsFan(s, dir).filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"), col("text"))
      val gated = TextAnalysis.withGopherQuality(corp, "text",
          minTokens = 50, minStopHits = 2)
        .filter(col("gopher_pass"))
        .select(col("doc_id"), col("text"), col("n_tokens"))
      // pinned: fuzzyDecontaminate references its corpus three times
      // (signature pass, id re-attach, final semi join) — unpinned, the
      // union→gopher-gate→dedup chain replayed per reference (20 corpus
      // scans / 18 exchanges in the r16 before-plan; pinned it runs once)
      val deduped = Dedup.exactKeepMinId(gated, "doc_id", "text").pinned
      Decontaminate.fuzzyDecontaminate(deduped, "doc_id", "text",
          bench, "doc_id", "text", flagAt = 0.5)
        .select(col("doc_id"), col("n_tokens"))
        .orderBy("doc_id")
    },
    Some {
      val mins = MinhashMinsSql
      def bandsSql(sig: String) = minhashShBandsSql(sig)
      s"""WITH corp AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
         |  WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 2000000 AS doc_id,
         |    array_to_string(w[1:greatest(len(w)-3, 1)], ' ') AS text
         |  FROM (SELECT doc_id, $TOKS AS w FROM documents
         |        WHERE doc_id % 7 = 0)),
         |tok AS (SELECT doc_id, text, $TOKS AS w FROM corp),
         |gk AS (SELECT doc_id, text, CAST(len(w) AS BIGINT) AS n_tokens
         |  FROM tok
         |  WHERE text IS NOT NULL AND len(w) >= 50 AND len(w) <= 100000
         |    AND CAST(length(regexp_replace(trim(text), '\\s+', '', 'g'))
         |        AS DOUBLE) / CAST(len(w) AS DOUBLE) >= 3.0
         |    AND CAST(length(regexp_replace(trim(text), '\\s+', '', 'g'))
         |        AS DOUBLE) / CAST(len(w) AS DOUBLE) <= 10.0
         |    AND CAST(len(list_filter(w,
         |        t -> regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)
         |      / CAST(len(w) AS DOUBLE) >= 0.8
         |    AND (CASE WHEN list_contains(w, 'a') THEN 1 ELSE 0 END) +
         |        (CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END) +
         |        (CASE WHEN list_contains(w, 'in') THEN 1 ELSE 0 END) +
         |        (CASE WHEN list_contains(w, 'is') THEN 1 ELSE 0 END) +
         |        (CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END) +
         |        (CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END) +
         |        (CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END)
         |      >= 2),
         |dd AS (SELECT doc_id, text, n_tokens, ROW_NUMBER() OVER (
         |    PARTITION BY md5(regexp_replace(lower(trim(text)),
         |      '\\s+', ' ', 'g'))
         |    ORDER BY doc_id) AS rn FROM gk),
         |kept AS (SELECT doc_id, text, n_tokens FROM dd WHERE rn = 1),
         |ksh AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
         |  FROM (SELECT doc_id, $TOKS AS w FROM kept) kt,
         |    unnest(CASE WHEN len(w) >= 3
         |      THEN generate_series(1, len(w)-2) ELSE [] END) AS u(i)),
         |ksig AS (SELECT doc_id, list(DISTINCT s) AS sh, $mins
         |  FROM ksh GROUP BY doc_id),
         |kbands AS (${bandsSql("ksig")}),
         |bt AS (SELECT doc_id, $TOKS AS w FROM documents
         |  WHERE doc_id % 97 = 0),
         |bsh AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
         |  FROM bt, unnest(CASE WHEN len(w) >= 3
         |    THEN generate_series(1, len(w)-2) ELSE [] END) AS u(i)),
         |bsig AS (SELECT doc_id, list(DISTINCT s) AS sh, $mins
         |  FROM bsh GROUP BY doc_id),
         |bbands AS (${bandsSql("bsig")}),
         |contam AS (SELECT DISTINCT c.doc_id
         |  FROM kbands c JOIN bbands b
         |  ON c.band = b.band AND c.bv = b.bv
         |  WHERE CAST(len(list_intersect(c.sh, b.sh)) AS DOUBLE) /
         |    (CAST(len(c.sh) AS DOUBLE) + CAST(len(b.sh) AS DOUBLE)
         |      - CAST(len(list_intersect(c.sh, b.sh)) AS DOUBLE)) >= 0.5)
         |SELECT doc_id, n_tokens FROM kept
         |WHERE doc_id NOT IN (SELECT doc_id FROM contam)
         |ORDER BY doc_id""".stripMargin
    })

  /** Generated DuckDB twin of `Vocab.bpeTrain(numMerges = k)` as a CTE
    * chain ending in segmentation `w_k`: layer r derives pair counts
    * `p_r` from `w_{r-1}`, picks the deterministic argmax `m_r`, and
    * re-segments into `w_r` with the same leading-space greedy fold the
    * Spark expression runs. An exhausted pair table emits a NULL
    * sentinel from `m_r` (the fold's `ch = NULL` condition never
    * fires), so `w_r` stays `w_{r-1}` instead of the cross join
    * emptying every later layer — mirroring `bpeTrain`'s early stop. */
  private def bpeChainSql(k: Int): String = {
    // AS MATERIALIZED is load-bearing: DuckDB inlines CTEs by default,
    // and every layer references w_{r-1} twice (pair counts + the
    // re-segmentation), so inlining doubles the expression tree per
    // layer — 2^k scans of the documents parquet at k=10, which
    // exhausted the harness's file descriptors before it exhausted
    // patience. Materialization makes the chain linear.
    val init =
      s"""w0 AS MATERIALIZED (SELECT word, cnt,
         |  [substr(word, i, 1) FOR i IN generate_series(1, len(word))]
         |    || ['</w>'] AS syms
         |  FROM (SELECT t AS word, COUNT(*) AS cnt
         |    FROM (SELECT unnest($TOKS) AS t FROM documents)
         |    WHERE t <> '' GROUP BY t))""".stripMargin
    val layers = (1 to k).map { r =>
      s"""p$r AS MATERIALIZED (SELECT syms[i] AS lhs, syms[i+1] AS rhs,
         |    SUM(cnt) AS freq
         |  FROM w${r - 1}, unnest(CASE WHEN len(syms) >= 2
         |    THEN generate_series(1, len(syms)-1) ELSE [] END) AS u(i)
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED ((SELECT lhs, rhs, freq FROM p$r
         |    ORDER BY freq DESC, lhs, rhs LIMIT 1)
         |  UNION ALL
         |  (SELECT NULL, NULL, NULL
         |    WHERE (SELECT COUNT(*) FROM p$r) = 0)),
         |w$r AS MATERIALIZED (SELECT word, cnt, string_split(substr(
         |    list_reduce([''] || syms, (acc, ch) -> CASE
         |      WHEN ch = m$r.rhs AND ends_with(acc, ' ' || m$r.lhs)
         |      THEN left(acc, len(acc) - len(m$r.lhs)) || m$r.lhs || m$r.rhs
         |      ELSE acc || ' ' || ch END), 2), ' ') AS syms
         |  FROM w${r - 1}, m$r)""".stripMargin
    }
    s"$init,\n${layers.mkString(",\n")}"
  }

  /** [[bpeChainSql]] finished with the merge-table select (q107). The
    * `lhs IS NOT NULL` filter drops the exhaustion sentinels, matching
    * `bpeTrain`'s early stop. */
  /** Target sources for the q115/q116 classifier fixture — the five
    * whose docs form the "curated" slice. The fixture's sources have
    * genuinely different word distributions (each draws from its own
    * topic mixture); `lang` is assigned independently of text and
    * carries no signal. */
  // lazy: referenced from the queries map's strict initializer above
  private lazy val QfTargetSources =
    Seq("src0", "src1", "src2", "src3", "src4")

  /** The q115/q116 oracle chain: replay [[QualityFilter.trainLda]] in
    * DuckDB. CTE names: `dc` per-doc tf triples, `tr` labelled
    * training rows, `cnts` per-class doc counts, `mom` per-(y, bucket)
    * decimal moments, `st`/`wt` the fitted per-bucket stats and
    * weights, `bs` the bias, `sc` the final per-doc score frame
    * (`doc_id`, `n_feats`, raw `z`). Every cross-row sum routes
    * through DECIMAL(38,15) per-term casts and the link is the
    * rational sigmoid, so both engines derive the same head to well
    * under the differ's 1e-6 (see the QualityFilter scaladoc).
    * Multiply-referenced CTEs are AS MATERIALIZED — DuckDB otherwise
    * inlines each reference and the tree grows combinatorially (the
    * q107/q108 lesson, BASELINE.md). */
  private def qfChainSql(numBuckets: Int, eps: Double = 1e-8,
      corpus: String = "documents", posPred: Option[String] = None)
      : String = {
    val nb = numBuckets
    val pos = posPred.getOrElse(QfTargetSources.map(x => s"'$x'")
      .mkString("source IN (", ", ", ")"))
    val nP = "(SELECT nc FROM cnts WHERE y = 1)"
    val nN = "(SELECT nc FROM cnts WHERE y = 0)"
    s"""tk AS MATERIALIZED (SELECT doc_id, list_filter(
       |    regexp_split_to_array(trim(lower(text)), '\\s+'),
       |    x -> length(x) > 0) AS ts FROM $corpus),
       |fx AS (
       |  SELECT doc_id, u.x AS f FROM tk, unnest(ts) AS u(x)
       |  UNION ALL
       |  SELECT doc_id, ts[g.i] || ' ' || ts[g.i + 1] AS f
       |  FROM tk, unnest(generate_series(1, len(ts) - 1)) AS g(i)),
       |fb AS (SELECT doc_id, CAST(('0x' || substr(md5('qf|' || f),
       |    1, 8)) AS UBIGINT) % $nb AS bucket FROM fx),
       |dc0 AS MATERIALIZED (SELECT doc_id, bucket, count(*) AS cnt
       |  FROM fb GROUP BY 1, 2),
       |dc AS MATERIALIZED (SELECT doc_id, bucket, cnt,
       |    CAST(cnt AS DOUBLE) /
       |      CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS DOUBLE) AS x
       |  FROM dc0),
       |tr AS MATERIALIZED (
       |  SELECT 1 AS y, dc.doc_id, bucket, x FROM dc
       |    JOIN $corpus USING (doc_id) WHERE $pos
       |  UNION ALL
       |  SELECT 0 AS y, dc.doc_id, bucket, x FROM dc
       |    JOIN $corpus USING (doc_id) WHERE NOT ($pos)),
       |cnts AS MATERIALIZED (SELECT y,
       |    CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS nc
       |  FROM tr GROUP BY y),
       |mom AS MATERIALIZED (SELECT y, bucket,
       |    CAST(SUM(CAST(x AS DECIMAL(38,15))) AS DOUBLE) AS sx,
       |    SUM(CAST(x * x AS DECIMAL(38,15))) AS sxx
       |  FROM tr GROUP BY 1, 2),
       |sp AS (SELECT g.b AS bucket
       |  FROM generate_series(0, ${nb - 1}) AS g(b)),
       |st AS MATERIALIZED (SELECT s.bucket,
       |    coalesce(p.sx, 0) / $nP AS mp,
       |    coalesce(q.sx, 0) / $nN AS mn,
       |    CAST(coalesce(p.sxx, CAST(0 AS DECIMAL(38,15)))
       |      + coalesce(q.sxx, CAST(0 AS DECIMAL(38,15))) AS DOUBLE)
       |      AS sxx
       |  FROM sp s
       |    LEFT JOIN (SELECT * FROM mom WHERE y = 1) p
       |      ON p.bucket = s.bucket
       |    LEFT JOIN (SELECT * FROM mom WHERE y = 0) q
       |      ON q.bucket = s.bucket),
       |wt AS MATERIALIZED (SELECT bucket, mp, mn,
       |    (mp - mn) / ((sxx - $nP * mp * mp - $nN * mn * mn)
       |      / (SELECT SUM(nc) FROM cnts) + $eps) AS w
       |  FROM st),
       |bs AS MATERIALIZED (SELECT
       |    -CAST(SUM(CAST(w * (mp + mn) * 0.5 AS DECIMAL(38,15)))
       |      AS DOUBLE) AS bias FROM wt),
       |sc AS MATERIALIZED (SELECT d.doc_id,
       |    CAST(SUM(d.cnt) AS BIGINT) AS n_feats,
       |    (SELECT bias FROM bs) +
       |    CAST(SUM(CAST(d.x * w.w AS DECIMAL(38,15))) AS DOUBLE) AS z
       |  FROM dc d JOIN wt w USING (bucket) GROUP BY d.doc_id)"""
      .stripMargin
  }

  /** Span-corruption pair chain (q127's oracle, parameterized) over a
    * `(doc_id, text)` source CTE: start-flag / windowed-OR mask / run
    * starts / sentinel texts, ending in `out$sfx(doc_id, n,
    * input_text, target_text)`. Shared by q127 and the q132 UL2
    * mixture (two differently-knobbed instances). */
  private def spanPairChainSql(sfx: String, src: String, salt: String,
      m: Int, l: Int): String = {
    val orTerms = (0 until l).map {
      case 0 => "s[i]"
      case j => s"(i >= ${j + 1} AND s[i-$j])"
    }.mkString(" OR ")
    s"""tk$sfx AS (SELECT doc_id, text, CASE WHEN text IS NULL THEN []
       |  ELSE list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |    x -> length(x) > 0) END AS ts FROM $src),
       |nn$sfx AS (SELECT doc_id, ts, len(ts) AS n FROM tk$sfx),
       |st$sfx AS (SELECT *, [CAST(('0x' || substr(md5('$salt|' ||
       |    doc_id || '|' || i), 1, 8)) AS UBIGINT) % $m = 0
       |  for i in generate_series(1, n)] AS s FROM nn$sfx),
       |mk$sfx AS (SELECT *, [($orTerms)
       |  for i in generate_series(1, n)] AS m FROM st$sfx),
       |rr$sfx AS (SELECT *, [(m[i] AND (i = 1 OR NOT m[i-1]))
       |  for i in generate_series(1, n)] AS r FROM mk$sfx),
       |px$sfx AS (SELECT *,
       |  [CASE WHEN r[i] THEN '<extra_id_' ||
       |      CAST(len(list_filter(generate_series(1, i-1),
       |        q -> r[q])) AS VARCHAR) || '>'
       |    WHEN m[i] THEN NULL ELSE ts[i] END
       |   for i in generate_series(1, n)] AS inp,
       |  [CASE WHEN r[i] THEN '<extra_id_' ||
       |      CAST(len(list_filter(generate_series(1, i-1),
       |        q -> r[q])) AS VARCHAR) || '> ' || ts[i]
       |    WHEN m[i] THEN ts[i] ELSE NULL END
       |   for i in generate_series(1, n)] AS tgt FROM rr$sfx),
       |out$sfx AS (SELECT doc_id, n,
       |  coalesce(array_to_string(list_filter(inp,
       |    p -> p IS NOT NULL), ' '), '') AS input_text,
       |  coalesce(array_to_string(list_filter(tgt,
       |    p -> p IS NOT NULL), ' '), '') AS target_text
       |  FROM px$sfx)""".stripMargin
  }

  private def bpeOracleSql(k: Int): String = {
    val sel = (1 to k).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, lhs, rhs, " +
        s"CAST(freq AS BIGINT) AS freq FROM m$r WHERE lhs IS NOT NULL")
      .mkString("\nUNION ALL\n")
    s"WITH ${bpeChainSql(k)}\n$sel\nORDER BY merge_rank"
  }
}
