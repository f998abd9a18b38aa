package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over a `documents`
  * table: tokenization, token counting, quality scoring, language-ID
  * (marker-word n-gram heuristic), document fingerprinting. Everything is a
  * codegen-friendly column expression — no UDFs — so the ops fuse into the
  * scan's whole-stage-codegen and scale as a pure map (+ one partial-agg
  * shuffle where a groupBy is inherent).
  */
object TextStats {

  /** ASCII word tokens of lower(text); RE2/Java-regex-portable so the DuckDB
    * oracle tokenizes identically. */
  val tokens: Column = expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for")

  /** Marker stopwords per language (the classic n-gram/stopword-hit heuristic);
    * zh is scored by CJK codepoint count instead (its tokens never match
    * `[a-z0-9]+`). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
    "de" -> Seq("der", "die", "und", "ist", "nicht"))

  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(tokens).as("n_tokens"))

  /** Corpus vocabulary: top-k tokens by term frequency (ties broken by token
    * asc) with exact document frequency — the vocab-building pass of a
    * training-data pipeline. The global top-k executes as
    * TakeOrderedAndProject over the partially-aggregated (token, tf, df)
    * table — per-partition heaps, no single-partition window and no full
    * sort, so the shape survives a 10⁹-document corpus (the shuffle carries
    * one row per distinct token, not per occurrence). */
  def vocab(docs: DataFrame, k: Int = 100): DataFrame =
    docs.select(col("doc_id"), explode(tokens).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
      .orderBy(desc("tf"), asc("tok")).limit(k)

  /** Length / punctuation / stopword-ratio quality features, rounded to 6
    * decimals for cross-engine float parity. */
  def qualityScores(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("text"), explode_outer(tokens).as("tok"))
      .groupBy("doc_id")
      .agg(
        count(col("tok")).as("n_tokens"),
        sum(when(col("tok").isin(stopwords: _*), 1L).otherwise(0L)).as("n_stop"),
        sum(length(col("tok"))).as("tok_chars"))
    docs.select(col("doc_id"), length(col("text")).as("n_chars"),
        length(regexp_replace(col("text"), "[^.,;:!?]", "")).as("n_punct"))
      .join(toks, "doc_id")
      .select(
        col("doc_id"),
        col("n_chars"),
        col("n_tokens"),
        round(col("n_punct").cast("double") / col("n_chars"), 6).as("punct_ratio"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("n_stop").cast("double") / col("n_tokens"), 6)).as("stop_ratio"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("tok_chars").cast("double") / col("n_tokens"), 6)).as("avg_token_len"))
  }

  /** Language ID: argmax over per-language marker-hit scores (tie → smaller
    * language code), 'und' when every score is 0. */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val markers = langMarkers.toSeq.flatMap { case (l, ws) => ws.map(w => (l, w)) }
      .toDF("lang", "tok")
    val tokScores = docs.select(col("doc_id"), explode(tokens).as("tok"))
      .join(broadcast(markers), "tok")
      .groupBy("doc_id", "lang").agg(count(lit(1)).as("score"))
    val zh = docs.select(col("doc_id"), lit("zh").as("lang"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[\\x{4e00}-\\x{9fff}]", ""))).cast("long").as("score"))
    // argmax score, tie → min lang: min of struct(-score, lang)
    val best = tokScores.unionByName(zh)
      .where(col("score") > 0)
      .groupBy("doc_id")
      .agg(min(struct((-col("score")).as("negscore"), col("lang"))).as("top"))
    docs.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("top.lang"), lit("und")).as("lang_pred"))
  }

  /** Per-document top-k tf-idf terms: score = tf · ln(N/df), k best terms
    * per doc (ties → token asc). The corpus stats are two partial-agg
    * shuffles (doc×token tf, then token df); N arrives as a broadcast
    * one-row crossJoin so no driver-side action sits in the plan. The top-k
    * window partitions BY DOC — per-group heaps, never a single-partition
    * global sort — so the shape survives a 10⁹-document corpus. Score
    * arithmetic is one division + one ln + one multiply over exact integers:
    * bit-portable to the SQL oracle. */
  def tfidf(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(tokens).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("tok").asc)
    tf.join(df, "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("tok"), col("score"))
  }

  /** Token repetition ratio, the cheap boilerplate/spam signal: 1 −
    * |distinct tokens| / |tokens| (0 for empty docs). Pure scan-fused map —
    * no shuffle, no explode; the distinct runs inside the array column. */
  def repetition(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(tokens).as("n_tokens"),
        size(array_distinct(tokens)).as("n_distinct"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(lit(1.0) -
            col("n_distinct").cast("double") / col("n_tokens"), 6)).as("rep_ratio"))

  /** Content fingerprint: md5 of the text plus a 64-bit-ish integer digest
    * derived from the md5 hex (portable to any SQL engine with ascii()/md5).
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text").cast("binary")).as("content_md5"))
      .withColumn("fp",
        (0 until 8).map(i =>
            ascii(substring(col("content_md5"), i + 1, 1)) * lit(1L << (7 * i)))
          .reduce(_ + _) % lit(1000000007L))
      .select(col("doc_id"), col("content_md5"), col("fp").cast("long").as("fp"))
}
