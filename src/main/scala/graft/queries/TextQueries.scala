package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.t

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: language-ID, quality scoring, token counting,
  * fingerprinting. All pure Column expressions / higher-order functions —
  * single scan, codegen'd, no UDFs; ratios are emitted as integer
  * "millis" (integer math is evaluation-order-independent, so results
  * are exact in any engine at any parallelism).
  */
object TextQueries {

  /** Token counting: whitespace tokens + a BPE-ish regex tokenizer
    * (letter runs / digit runs / single punctuation).
    */
  val tokens = Q(
    "text_token_count",
    """SELECT doc_id, n_chars, length(text) AS len_chars,
      |  len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        length(col("text")).cast(LongType).as("len_chars"),
        size(split(col("text"), " ")).cast(LongType).as("ws_tokens"),
        expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
          .cast(LongType).as("re_tokens"))
      .orderBy("doc_id")
  }

  /** Quality scoring: stopword ratio, mean token length, alphabetic
    * ratio — the length/punct/stopword heuristics of C4-style filters,
    * in integer millis.
    */
  val quality = Q(
    "text_quality_score",
    """SELECT doc_id, n_tok, n_stop,
      |  CAST((1000 * n_stop) // n_tok AS BIGINT) AS stop_millis,
      |  CAST((1000 * tok_chars) // n_tok AS BIGINT) AS mean_len_millis,
      |  CAST((1000 * alpha_chars) // length(text) AS BIGINT) AS alpha_millis
      |FROM (
      |  SELECT doc_id, text,
      |    len(string_split(text, ' ')) AS n_tok,
      |    len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS n_stop,
      |    CAST(list_sum(list_transform(string_split(text, ' '),
      |      x -> length(x))) AS BIGINT) AS tok_chars,
      |    length(regexp_replace(text, '[^a-z]', '', 'g')) AS alpha_chars
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).as("n_tok"),
        expr("""size(filter(split(text, ' '),
          x -> x IN ('the','a','of','and','to','in','is','on','for','with')))""")
          .as("n_stop"),
        expr("aggregate(transform(split(text, ' '), x -> length(x)), 0L, (acc, v) -> acc + v)")
          .as("tok_chars"),
        length(regexp_replace(col("text"), "[^a-z]", "")).as("alpha_chars"))
      .select(col("doc_id"), col("n_tok").cast(LongType).as("n_tok"),
        col("n_stop").cast(LongType).as("n_stop"),
        expr("(1000 * n_stop) div n_tok").cast(LongType).as("stop_millis"),
        expr("(1000 * tok_chars) div n_tok").cast(LongType).as("mean_len_millis"),
        expr("(1000 * alpha_chars) div length(text)").cast(LongType)
          .as("alpha_millis"))
      .orderBy("doc_id")
  }

  /** Language-ID by n-gram/vocabulary heuristic: count hits against
    * per-class token lists, argmax with a fixed precedence for ties.
    * (The synthetic corpus shares one vocabulary, so predictions are a
    * deterministic function of content, not a real language model — the
    * operator shape is what's exercised.)
    */
  val langid = Q(
    "text_lang_id",
    """SELECT doc_id, lang,
      |  CASE WHEN c_sql >= c_spark AND c_sql >= c_time THEN 'sqlish'
      |       WHEN c_spark >= c_time THEN 'sparkish'
      |       ELSE 'timing' END AS predicted,
      |  c_sql, c_spark, c_time
      |FROM (
      |  SELECT doc_id, lang,
      |    len(list_filter(string_split(text, ' '),
      |      x -> x IN ('table','scan','join','merge','hash','sort','key','order','index','filter'))) AS c_sql,
      |    len(list_filter(string_split(text, ' '),
      |      x -> x IN ('spark','group','query','row','data','batch','value','line','customer','window'))) AS c_spark,
      |    len(list_filter(string_split(text, ' '),
      |      x -> x IN ('fast','slow','small','the','part'))) AS c_time
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        expr("""size(filter(split(text, ' '),
          x -> x IN ('table','scan','join','merge','hash','sort','key','order','index','filter')))""")
          .as("c_sql"),
        expr("""size(filter(split(text, ' '),
          x -> x IN ('spark','group','query','row','data','batch','value','line','customer','window')))""")
          .as("c_spark"),
        expr("""size(filter(split(text, ' '),
          x -> x IN ('fast','slow','small','the','part')))""").as("c_time"))
      .select(col("doc_id"), col("lang"),
        when(col("c_sql") >= col("c_spark") && col("c_sql") >= col("c_time"),
          "sqlish")
          .when(col("c_spark") >= col("c_time"), "sparkish")
          .otherwise("timing").as("predicted"),
        col("c_sql").cast(LongType).as("c_sql"),
        col("c_spark").cast(LongType).as("c_spark"),
        col("c_time").cast(LongType).as("c_time"))
      .select("doc_id", "lang", "predicted", "c_sql", "c_spark", "c_time")
      .orderBy("doc_id")
  }

  /** Document fingerprinting: content-defined hash of the sorted
    * distinct token set (a bag-of-words fingerprint — robust to word
    * order, the cheap first stage before MinHash).
    */
  val fingerprint = Q(
    "text_fingerprint",
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(
      |    string_split(lower(text), ' '))), ' ')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"),
        md5(array_join(array_sort(array_distinct(
          split(lower(col("text")), " "))), " ")).as("fp"))
      .orderBy("doc_id")
  }

  /** Vocabulary builder: global token→frequency table (the first step
    * of any tokenizer training) — explode + hash-groupBy, map-side
    * combinable; top terms by (count DESC, token ASC).
    */
  val vocabulary = Q(
    "text_vocabulary",
    """SELECT token, count(*) AS freq,
      |  count(DISTINCT doc_id) AS doc_freq
      |FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      |      FROM documents)
      |GROUP BY 1 ORDER BY freq DESC, token ASC LIMIT 200""".stripMargin) {
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("freq"), countDistinct("doc_id").as("doc_freq"))
        .orderBy(col("freq").desc, col("token").asc)
        .limit(200)
  }

  val all: Seq[Q] = Seq(tokens, quality, langid, fingerprint, vocabulary)
}
