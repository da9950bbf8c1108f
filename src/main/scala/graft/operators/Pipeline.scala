package graft.operators

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data pipeline operators over `documents` — the assembly steps an
  * LLM data pipeline runs after dedup/quality filtering: deterministic
  * train/valid/test splitting, text normalization, and sequence packing.
  * (The reference had no such plane; these extend SURVEY.md §2.5.)
  *
  * Scale design: p01/p02 are narrow per-row projections in whole-stage
  * codegen (no shuffle); p03 is one window (shuffle on `lang`) + one
  * aggregation — the same shape at any corpus size, with the partition key
  * chosen so bins never span executors.
  *
  * Cross-engine determinism: the split key is the content fingerprint (an
  * explicit integer polynomial, t04's arithmetic), token counts are integer,
  * and the packing cumsum is an integer window sum over a total order —
  * nothing floats.
  */
object Pipeline {

  /** Deterministic content-hash split: fingerprint % 100 -> <80 train,
    * <90 valid, else test. Hashing CONTENT (not doc_id) keeps the split
    * stable under re-ingestion and id reshuffles — the property a training
    * pipeline actually needs. */
  def p01TrainTestSplit(t: T): DataFrame = {
    import t.spark.implicits._
    graft.functions.Registry.ensure(t.spark)
    t.documents
      .withColumn("bucket",
        pmod(expr("weighted_fingerprint(shingle_hashes(text, 4, false))"), lit(100)))
      .withColumn("split",
        when($"bucket" < 80, "train").when($"bucket" < 90, "valid").otherwise("test"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split($"text", " ")).cast("long")).as("n_tokens"))
      .orderBy($"split", $"lang")
  }

  /** t04's fingerprint arithmetic (DuckDB side). */
  private val fpDuck =
    """(list_sum(list_transform(range(1, length(text) - 2),
         i -> (((ascii(substr(text, i::INT, 1)) * 31 + ascii(substr(text, i::INT + 1, 1))) * 31
                + ascii(substr(text, i::INT + 2, 1))) * 31 + ascii(substr(text, i::INT + 3, 1)))
              * ((i - 1) % 31 + 1))) % 2147483647)::BIGINT"""

  val p01Oracle: String =
    s"""WITH fp AS (SELECT lang, text, $fpDuck % 100 AS bucket FROM documents)
       SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid'
                   ELSE 'test' END AS split,
              lang, COUNT(*) AS n_docs,
              SUM(len(string_split(text, ' ')))::BIGINT AS n_tokens
       FROM fp GROUP BY 1, 2 ORDER BY split, lang"""

  /** Text normalization: drop the boilerplate stopwords ('a', 'the'),
    * collapse whitespace, trim — reporting before/after token and char
    * counts per doc (the redaction/cleanup stage; swap the pattern for
    * PII regexes on a real corpus). */
  def p02TextNormalize(t: T): DataFrame = {
    import t.spark.implicits._
    t.documents
      .withColumn("cleaned",
        trim(regexp_replace(regexp_replace($"text", "\\b(a|the)\\b", " "), "\\s+", " ")))
      .select($"doc_id",
        size(split($"text", " ")).cast("long").as("n_tokens_before"),
        size(split($"cleaned", " ")).cast("long").as("n_tokens_after"),
        length($"cleaned").cast("long").as("n_chars_after"))
      .orderBy($"doc_id")
  }

  val p02Oracle: String =
    """WITH cl AS (SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(text, '\b(a|the)\b', ' ', 'g'),
                             '\s+', ' ', 'g')) AS cleaned
       FROM documents)
       SELECT doc_id,
              len(string_split(text, ' '))::BIGINT AS n_tokens_before,
              len(string_split(cleaned, ' '))::BIGINT AS n_tokens_after,
              length(cleaned)::BIGINT AS n_chars_after
       FROM cl ORDER BY doc_id"""

  /** Sequence packing: concatenate docs per language in doc_id order and cut
    * at 2048-token boundaries (the streaming pack an LLM pre-training
    * pipeline uses to fill context windows); bin = tokens-before DIV 2048.
    * One integer window cumsum + one aggregate. */
  def p03SequencePacking(t: T): DataFrame = {
    import t.spark.implicits._
    val toks = t.documents.select($"doc_id", $"lang",
      size(split($"text", " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("cum_before", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .withColumn("bin", expr("cum_before DIV 2048"))
      .groupBy($"lang", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("bin_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"lang", $"bin")
  }

  val p03Oracle: String =
    """WITH toks AS (
         SELECT doc_id, lang, len(string_split(text, ' '))::BIGINT AS n_tokens
         FROM documents),
       cum AS (
         SELECT doc_id, lang, n_tokens,
                COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         FROM toks)
       SELECT lang, (cum_before // 2048)::BIGINT AS bin, COUNT(*) AS n_docs,
              SUM(n_tokens)::BIGINT AS bin_tokens,
              MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       FROM cum GROUP BY 1, 2 ORDER BY lang, bin"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_train_test_split" -> ((s, d) => p01TrainTestSplit(T(s, d))),
    "p02_text_normalize"   -> ((s, d) => p02TextNormalize(T(s, d))),
    "p03_sequence_packing" -> ((s, d) => p03SequencePacking(T(s, d))),
  )

  val oracles: Map[String, String] = Map(
    "p01_train_test_split" -> p01Oracle,
    "p02_text_normalize"   -> p02Oracle,
    "p03_sequence_packing" -> p03Oracle,
  )
}
