package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines, built from
  * codegen'd Catalyst functions wherever expressible (no UDFs on the hot
  * path): token counting, quality scoring, language ID, fingerprinting.
  */
object TextOps {

  /** Whitespace token count — matches the DuckDB oracle
    * `len(regexp_split_to_array(trim(text), '\s+'))`.
    */
  def tokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish subword count: the class-based pretokenization BPE
    * vocabularies split on — letter runs, single digits, single
    * non-alphanumeric marks. Deliberately lookaround-free, and the
    * whitespace class is spelled out instead of `\s` (Java's \s includes
    * vertical tab, RE2's does not) so the Java regex and the oracle's
    * RE2 (DuckDB regexp_extract_all) agree match-for-match.
    */
  val SubwordPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\f\\r\\x0B]"

  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(SubwordPattern), lit(0)))

  /** Quality features per document, all codegen'd. */
  def qualityFeatures(df: DataFrame, text: Column): DataFrame = {
    val toks = split(trim(text), "\\s+")
    df.withColumn("n_chars_q", length(text))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_uniq_tokens", size(array_distinct(toks)))
      .withColumn("avg_token_len",
        length(regexp_replace(trim(text), "\\s+", "")).cast("double") / size(toks))
      .withColumn("uniq_ratio", size(array_distinct(toks)).cast("double") / size(toks))
      .withColumn("punct_ratio",
        (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
          / greatest(length(text), lit(1)))
  }

  /** Tiny per-language stopword profiles for the n-gram/stopword-vote
    * language-ID heuristic.
    */
  val StopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "de", "que", "por"))

  /** Language ID: per-language stopword hit counts via codegen'd array
    * intersection; winner by highest hit count, 'und' when no hits.
    */
  def languageId(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val scores = StopwordProfiles.toSeq.map { case (lang, words) =>
      struct(size(array_intersect(array_distinct(toks),
        array(words.map(lit): _*))).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Rolling document fingerprint over tokens — deterministic,
    * order-sensitive md5 chain, expressed with aggregate() so it stays
    * inside codegen. md5 (not xxhash64) so the DuckDB oracle can replay
    * the chain with list_reduce — both engines emit lowercase hex.
    */
  def fingerprint(text: Column): Column =
    aggregate(split(trim(text), "\\s+"), lit("graft"),
      (acc, tok) => md5(concat(acc, lit("|"), tok)))

}
