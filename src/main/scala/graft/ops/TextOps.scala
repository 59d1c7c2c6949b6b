package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ColSyntax._
import graft.queries.Tables.t

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  * All are pure column expressions (whole-stage codegen, no UDFs) — at
  * 100 TB these run as a single scan with no shuffle.
  */
object TextOps {

  /** Whitespace tokenizer count (the BPE-ish regex variant is
    * [[tokenCountBpe]]). */
  def tokenCountCol(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish sub-word segment count: each run of letters, digits, or
    * punctuation is one segment — an upper-bound proxy for BPE token counts
    * without a vocab file (regex kept lookaround-free so the DuckDB/RE2
    * oracle computes the identical quantity). */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"), lit(0)))

  /** Language-ID marker words per language (n-gram/stopword heuristic).
    * Deterministic tie-break: the language list order. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "is"),
    "fr" -> Seq("le", "la", "les", "et"),
    "es" -> Seq("el", "los", "las", "es"),
    "de" -> Seq("der", "die", "und", "ist"),
    "zh" -> Seq("de", "shi", "zhe", "he"))

  /** Marker hits as one alternation-regex count per language.
    *
    * STAY INSIDE WHOLE-STAGE CODEGEN: an array-filter formulation
    * (`filter(split(text, ...), w => w IN (...))`) reads nicer but
    * higher-order functions fall back to INTERPRETED evaluation, which
    * also forfeits codegen's common-subexpression elimination — and the
    * optimizer's project-collapse + filter-pushdown inline these hit
    * expressions many times over (q_curation references each one from
    * the filter AND the projection). Measured: the HOF form took
    * q_curation from ~3 s to ~9 s at sf0.1; the regex form is CSE'd back
    * to one evaluation per site. */
  private def markerHits(text: Column, words: Seq[String]): Column =
    regexp_count(text, lit(s"\\b(${words.mkString("|")})\\b"))

  /** Adds lang_pred + marker_hits columns (argmax of marker-word hits,
    * 'und' when all zero) — reused by [[langId]] and [[curation]].
    *
    * The argmax is array-based (array_max + array_position), NOT a
    * when-chain fold: a fold referencing its accumulator twice per step
    * doubles the inlined expression tree per language (2^5 copies once
    * the optimizer collapses projections); the array form references
    * each per-language count exactly once per site. */
  private def withLangPred(docs: DataFrame): DataFrame = {
    val withHits = langMarkers.foldLeft(docs) {
      case (df, (lang, words)) =>
        df.withColumn(s"hits_$lang", markerHits($"text", words))
    }
    val hitArr = array(langMarkers.map(m => col(s"hits_${m._1}")): _*)
    val langArr = array(langMarkers.map(m => lit(m._1)): _*)
    val maxHits = array_max(hitArr)
    withHits
      .withColumn("lang_pred",
        when(maxHits > 0,
          element_at(langArr, array_position(hitArr, maxHits).cast("int")))
          .otherwise(lit("und")))
      .withColumn("marker_hits", maxHits)
      .drop(langMarkers.map(m => s"hits_${m._1}"): _*)
  }

  /** q_lang_id — argmax of marker-word hits, 'und' when all zero. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    withLangPred(t(spark, dir, "documents"))
      .select($"doc_id", $"lang_pred", $"marker_hits")

  /** Adds n_tokens/avg_token_len/punct_ratio/stopword_ratio/quality
    * columns — reused by [[qualityScore]] and [[curation]]. */
  private def withQuality(docs: DataFrame): DataFrame = {
    val nTokens = tokenCountCol($"text")
    val nChars = length($"text")
    // count, don't rebuild: regexp_count scans once; the previous
    // regexp_replace allocated a full stripped copy of every document
    val punct = regexp_count($"text", lit("[^a-zA-Z0-9\\s]"))
    val stop = markerHits($"text", Seq("the", "a", "of", "and", "le", "la"))
    docs
      .withColumn("n_tokens", nTokens)
      .withColumn("avg_token_len", round(nChars.cast("double") / nTokens, 4))
      .withColumn("punct_ratio", round(punct.cast("double") / nChars, 6))
      .withColumn("stopword_ratio", round(stop.cast("double") / nTokens, 6))
      .withColumn("quality", round(
        least(nTokens.cast("double") / 50.0, lit(1.0)) * 0.5
          + least(stop.cast("double") / nTokens * 5.0, lit(1.0)) * 0.3
          + (lit(1.0) - least(punct.cast("double") / nChars * 10.0, lit(1.0))) * 0.2,
        6))
  }

  /** q_quality_score — length / punctuation / stopword-ratio features and a
    * composite score (the shape of pretraining quality filters). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    withQuality(t(spark, dir, "documents"))
      .select($"doc_id", $"n_tokens", $"avg_token_len", $"punct_ratio",
        $"stopword_ratio", $"quality")

  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      $"doc_id",
      tokenCountCol($"text").as("n_tokens"),
      tokenCountBpe($"text").as("n_bpe_segments"))

  /** q_fingerprint — 64-bit content fingerprint over whitespace-normalized
    * text (xxhash64; the rolling-hash document signature). DuckDB lacks
    * xxhash64, so the hard oracle row checks CLASS STRUCTURE instead: the
    * exported fingerprint classes must coincide exactly with
    * md5(normalized text) classes computed independently in SQL (see the
    * q_fingerprint entry in [[oracle]]). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      $"doc_id",
      xxhash64(regexp_replace(trim($"text"), "\\s+", " ")).as("fingerprint"))

  /** F8 — entity unescape, the pure-Scala kernel
    * (wikipedia_images.py:524-529 uses Python's `html.unescape`): ONE
    * left-to-right pass over `&(named|#dec|#xhex);` — single-pass matters:
    * "&amp;#51;" must decode to "&#51;", not "3". Named coverage is the
    * subset the caption/HTML paths emit (the common six); numeric
    * references follow the WHATWG HTML numeric-charref rules that
    * html.unescape implements: C1 codepoints 0x80-0x9F map through the
    * windows-1252 table, 0x00/out-of-range/surrogates → U+FFFD, 0x0D → CR. */
  private val EntityRe =
    "&(?:(amp|lt|gt|quot|nbsp)|#([0-9]+)|#[xX]([0-9a-fA-F]+));".r

  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "nbsp" -> " ")

  /** WHATWG numeric-charref replacement table (C1 → windows-1252), the
    * `_invalid_charrefs` quirk html.unescape applies. */
  private val c1Charrefs: Map[Int, String] = Map(
    0x80 -> "€", 0x82 -> "‚", 0x83 -> "ƒ", 0x84 -> "„",
    0x85 -> "…", 0x86 -> "†", 0x87 -> "‡", 0x88 -> "ˆ",
    0x89 -> "‰", 0x8a -> "Š", 0x8b -> "‹", 0x8c -> "Œ",
    0x8e -> "Ž", 0x91 -> "‘", 0x92 -> "’", 0x93 -> "“",
    0x94 -> "”", 0x95 -> "•", 0x96 -> "–", 0x97 -> "—",
    0x98 -> "˜", 0x99 -> "™", 0x9a -> "š", 0x9b -> "›",
    0x9c -> "œ", 0x9e -> "ž", 0x9f -> "Ÿ")

  private def decodeCodepoint(cp: Int): String =
    if (cp == 0x0d) "\r"
    else if (cp == 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) "�"
    else c1Charrefs.getOrElse(cp, new String(Character.toChars(cp)))

  def unescapeHtml(s: String): String =
    if (s == null || s.indexOf('&') < 0) s
    else EntityRe.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        if (m.group(1) != null) namedEntities(m.group(1))
        else if (m.group(2) != null) {
          val d = m.group(2)
          decodeCodepoint(if (d.length > 7) 0x110000 else d.toInt)
        } else {
          val h = m.group(3)
          decodeCodepoint(if (h.length > 6) 0x110000 else Integer.parseInt(h, 16))
        }))

  private val unescapeUdf = udf(unescapeHtml _)

  /** F8 — HTML tag strip + entity unescape as a column: tag removal stays a
    * codegen'd regexp_replace; the unescape is the single-pass Scala kernel
    * above (a udf — numeric charrefs have no built-in column form, and this
    * runs only on caption-sized strings, never in a scan hot path). */
  def stripHtml(html: Column): Column =
    trim(unescapeUdf(regexp_replace(html, "<[^>]+>", "")))

  /** F9 — lang-tagged fragment extraction (wikipedia_images.py:531-549):
    * pull the text of elements explicitly tagged lang="xx", newline-joined.
    * Tag-strip + trim run per fragment inside the codegen'd HOF lambda (a
    * udf cannot reference a lambda variable); the entity unescape runs once
    * on the joined result — entities never span fragments, so the result
    * is identical. */
  def extractLangText(html: Column, lang: String): Column = {
    // backreference \1 closes the SAME tag that opened (the reference's
    // (?P=tag) group, wikipedia_images.py:539-542)
    val re = "(?is)<([^\\s>/]+)[^>]*\\blang=['\"]" +
      java.util.regex.Pattern.quote(lang) + "['\"][^>]*>(.*?)</\\1>"
    unescapeUdf(array_join(
      transform(regexp_extract_all(html, lit(re), lit(2)),
        f => trim(regexp_replace(f, "<[^>]+>", ""))), "\n"))
  }

  /** q_html_strip — F8+F9 under the driver signal: synthetic HTML built
    * around each document's text, stripped + lang-extracted; the DuckDB
    * twin decodes the (constant) entities with chr() and recomputes both
    * columns from the raw text. */
  def htmlStrip(spark: SparkSession, dir: String): DataFrame = {
    val html = concat(
      lit("<p lang=\"en\">"), $"text",
      lit("</p><span class=\"x\">note &amp; &#233;tude &#x2014; fin&nbsp;ok</span>"))
    t(spark, dir, "documents").select(
      $"doc_id",
      stripHtml(html).as("stripped"),
      extractLangText(html, "en").as("en_text"))
  }

  /** q_curation — the composed training-data curation pipeline: exact
    * dedup (keep each content group's min doc_id) → language gate
    * (marker-based ID, drop 'und') → quality gate (composite ≥ 0.5). One
    * pass over documents + one dedup shuffle + two broadcast-joinable
    * derived columns — the shape of a pretraining data filter at 100 TB
    * (every stage is scan-local except the dedup groupBy). */
  def curation(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val keepers = docs
      .groupBy(md5($"text").as("fp")).agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    // lang + quality are derived COLUMNS on the one scan — no self-joins
    // (an earlier join-per-feature shape cost 3 extra shuffles of the
    // documents table; measured 4.3s → ~1s at sf0.1)
    withQuality(withLangPred(docs))
      .join(keepers, Seq("doc_id"), "left_semi")
      .filter($"lang_pred" =!= "und" && $"quality" >= 0.5)
      .select($"doc_id", $"source", $"lang_pred", $"n_tokens", $"quality")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curation" -> (curation _),
    "q_lang_id" -> (langId _),
    "q_quality_score" -> (qualityScore _),
    "q_token_count" -> (tokenCount _),
    "q_fingerprint" -> (fingerprint _),
    "q_html_strip" -> (htmlStrip _))

  private val oracleLangId: String = {
    val hits = langMarkers.map { case (lang, ws) =>
      s"len(regexp_extract_all(text, '\\b(${ws.mkString("|")})\\b')) AS hits_$lang"
    }.mkString(",\n    ")
    val bestExpr = langMarkers.map(_._1).foldLeft(("'und'", "0")) {
      case ((bl, bh), lang) =>
        (s"CASE WHEN hits_$lang > ($bh) THEN '$lang' ELSE ($bl) END",
          s"CASE WHEN hits_$lang > ($bh) THEN hits_$lang ELSE ($bh) END")
    }
    s"""SELECT doc_id, ${bestExpr._1} AS lang_pred, ${bestExpr._2} AS marker_hits
       |FROM (SELECT doc_id,
       |    $hits
       |  FROM documents)""".stripMargin
  }

  private val oracleQuality: String =
    """SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |  round(n_chars2 / n_tokens, 4) AS avg_token_len,
        |  round(punct / n_chars2, 6) AS punct_ratio,
        |  round(stop / n_tokens, 6) AS stopword_ratio,
        |  round(least(n_tokens / 50.0, 1.0) * 0.5
        |      + least(stop / n_tokens * 5.0, 1.0) * 0.3
        |      + (1.0 - least(punct / n_chars2 * 10.0, 1.0)) * 0.2, 6) AS quality
        |FROM (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS n_tokens,
        |    CAST(length(text) AS DOUBLE) AS n_chars2,
        |    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE) AS punct,
        |    CAST(len(regexp_extract_all(text, '\b(the|a|of|and|le|la)\b')) AS DOUBLE) AS stop
        |  FROM documents)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_lang_id" -> oracleLangId,
    "q_quality_score" -> oracleQuality,
    "q_token_count" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+'))
        |    AS n_bpe_segments
        |FROM documents""".stripMargin,
    "q_curation" -> {
      val langSub = oracleLangId.linesIterator.mkString("\n  ")
      val qualSub = oracleQuality.linesIterator.mkString("\n  ")
      s"""SELECT d.doc_id, d.source, l.lang_pred, q.n_tokens, q.quality
         |FROM documents d
         |JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)) k
         |  ON d.doc_id = k.doc_id
         |JOIN ($langSub) l ON l.doc_id = d.doc_id
         |JOIN ($qualSub) q ON q.doc_id = d.doc_id
         |WHERE l.lang_pred <> 'und' AND q.quality >= 0.5""".stripMargin
    },
    // q_fingerprint's hard row WITHOUT xxhash64 in SQL: the oracle
    // re-emits the exported fingerprints ONLY IF their equality classes
    // coincide exactly (both directions) with the classes of
    // md5(whitespace-normalized text), which DuckDB computes
    // independently from the raw documents. Class coincidence over n docs
    // is O(n): with F = #distinct fingerprints, M = #distinct md5 keys,
    // P = #distinct (fingerprint, md5) pairs, the partitions are equal
    // iff F = P (fingerprint determines md5 class) and M = P (and vice
    // versa) — a bijection between the two partitions. The guard also
    // requires one exported row per document (inner join + count), so a
    // wrong normalization, an xxhash64 collision, or a missing/duplicated
    // row each poison the output → hash mismatch → red.
    "q_fingerprint" ->
      """WITH f AS (
        |  SELECT doc_id, fingerprint
        |  FROM read_parquet('__EXPORT__/export_fingerprint/*.parquet')
        |), j AS (
        |  SELECT f.doc_id, f.fingerprint,
        |    md5(regexp_replace(trim(d.text), '\s+', ' ', 'g')) AS nfp
        |  FROM f JOIN documents d USING (doc_id)
        |), chk AS (
        |  SELECT count(DISTINCT fingerprint) = count(DISTINCT (fingerprint, nfp))
        |     AND count(DISTINCT nfp) = count(DISTINCT (fingerprint, nfp))
        |     AND count(*) = (SELECT count(*) FROM documents) AS ok
        |  FROM j
        |)
        |SELECT doc_id,
        |  CASE WHEN (SELECT ok FROM chk) THEN fingerprint END AS fingerprint
        |FROM f""".stripMargin,
    // the twin decodes the query's constant entities with chr():
    // &amp;→&, &#233;→é(233), &#x2014;→—(8212), &nbsp;→NBSP(160)
    "q_html_strip" ->
      """SELECT doc_id,
        |  trim(text || 'note & ' || chr(233) || 'tude ' || chr(8212)
        |       || ' fin' || chr(160) || 'ok') AS stripped,
        |  trim(text) AS en_text
        |FROM documents""".stripMargin)
}
