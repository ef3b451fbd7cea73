package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data curation: normalization,
  * tokenization, token counting, quality scoring, language ID,
  * fingerprinting. All native expressions (codegen'd, no UDFs); every
  * hash is md5-derived so results are portable to the SQL oracle
  * (SURVEY §4).
  */
object TextFunctions {

  /** Canonical text normalization: lowercase, collapse whitespace, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace tokens of normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** BPE-ish subword segmentation: letter runs, single digits, or single
    * non-alphanumeric marks — the classic pre-tokenizer shape. Counted via
    * `regexp_extract_all` (same RE2-safe char-class pattern in DuckDB).
    */
  val bpeishPattern = "[a-z]+|[0-9]|[^a-z0-9 ]"

  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(normalize(text), lit(bpeishPattern), lit(0)))

  /** 60-bit integer hash of a string via md5 — identical in DuckDB as
    * ('0x' || substr(md5(s), 1, 15))::BIGINT.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Document fingerprint: md5 of normalized text — content-addressed
    * identity for exact dedup and change detection.
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Language-ID stopword profiles. Tiny on purpose: language ID at scale
    * is a per-row map-side score against broadcast profiles; these are the
    * profile seeds.
    */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "es", "en", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "you", "wo"))

  /** Count of tokens that appear in `words` (multiplicity counted). */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Language with the highest stopword-profile score; ties break to the
    * alphabetically-first language. Scores are computed map-side per row —
    * no shuffle, no UDF.
    */
  def langId(text: Column): Column =
    // Let.bind the token array, then the score tuple: the decision tree
    // references every score ~4× and each score scans the tokens —
    // unbound, the tokenize+filter trees re-inline per reference
    // (interpreted lambdas; measured ~20×)
    Let.bind(tokens(text)) { toks =>
      Let.bind(struct(stopwordProfiles.map { case (lang, words) =>
        stopwordHits(toks, words).as(s"s_$lang")
      }: _*)) { sc =>
        val scores = stopwordProfiles.map { case (lang, _) =>
          lang -> sc.getField(s"s_$lang")
        }
        // lang wins iff it strictly beats every alphabetically-earlier
        // lang and ties-or-beats every later one — exactly one branch true
        scores.foldRight(lit("und")) { case ((lang, score), elseCol) =>
          val wins = scores.filter(_._1 != lang)
            .map { case (other, s) => if (other < lang) score > s else score >= s }
            .reduce(_ && _)
          when(wins, lit(lang)).otherwise(elseCol)
        }
      }
    }

  /** Non-distinct token bigrams ("a b", "b c", …); empty below 2 tokens. */
  def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array())

  /** Repeated-bigram ratio 1 − distinct/total (0 for <2 tokens) — the
    * standard within-document repetition quality signal.
    */
  def repetitionRatio(toks: Column): Column =
    Let.bind(bigrams(toks)) { bi =>
      when(size(bi) > 0,
        round(lit(1.0) - size(array_distinct(bi)) / size(bi).cast("double"), 6))
        .otherwise(lit(0.0))
    }
}
