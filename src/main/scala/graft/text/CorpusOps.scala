package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Corpus-curation operators a training-data pipeline runs after the
  * per-document stats: stratified sampling and benchmark-contamination
  * screening. Both are deterministic (portable md5-derived draws, fixed
  * eval-set predicate) so the DuckDB oracle replays them exactly, and both
  * keep the 100-TB shape: sampling is a pure map over the scan (zero
  * shuffles beyond the language-ID join it reuses), contamination is a
  * bucketed semi-join on shingle hashes — never an all-pairs comparison.
  */
object CorpusOps {

  /** Per-stratum keep rates for [[stratifiedSample]] — the classic
    * language-rebalancing mix (keep all English, half the other
    * marker-scored languages, a quarter of CJK, a sliver of unidentified).
    * Thresholds are precomputed INTEGER cutoffs over the [0, P) draw space:
    * `floor(rate·P)` evaluated once in Scala, so engine SQL and oracle SQL
    * compare against the identical literal (a float `rate·P` comparison
    * would fork on cast-vs-round semantics between engines). */
  val strataRates: Seq[(String, Double)] = Seq(
    "en" -> 1.0, "es" -> 0.5, "fr" -> 0.5, "de" -> 0.5, "zh" -> 0.25, "und" -> 0.1)

  def strataThresholds: Seq[(String, Long)] =
    strataRates.map { case (l, r) => (l, (r * PortableHash.P).toLong) }

  val sampleSalt: String = "graft-strat-v1"

  /** Portable per-document draw in [0, P): md5-nibble hash of
    * "doc_id:salt". */
  def sampleDraw(docId: Column, salt: String = sampleSalt): Column =
    PortableHash.md5PackMod(concat(docId.cast("string"), lit(":" + salt)))

  /** Deterministic stratified corpus sample: stratum = predicted language
    * ([[TextStats.langId]]), keep iff draw < threshold(stratum). The rate
    * table is a broadcast literal; everything else rides the langId plan —
    * at scale this is a scan-fused map + the one marker-join langId already
    * pays. Returns (doc_id, stratum, draw) for kept documents. */
  def stratifiedSample(
      docs: DataFrame,
      thresholds: Seq[(String, Long)] = strataThresholds,
      salt: String = sampleSalt): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = broadcast(thresholds.toDF("lang_pred", "threshold"))
    TextStats.langId(docs)
      .join(t, "lang_pred")
      .withColumn("draw", sampleDraw(col("doc_id"), salt))
      .where(col("draw") < col("threshold"))
      .select(col("doc_id"), col("lang_pred").as("stratum"), col("draw"))
  }

  /** Deterministic stand-in for a held-out benchmark/eval corpus: every
    * 97th document. A real pipeline would read the eval set from its own
    * table; the operator below only sees a doc_id predicate either way. */
  val defaultEvalPred: Column = pmod(col("doc_id"), lit(97L)) === 0L

  /** Benchmark-contamination screen: for every non-eval document, the count
    * and fraction of its distinct `n`-token shingles that also occur in the
    * eval set — the standard n-gram-overlap decontamination pass run before
    * training. Shape at 100 TB: shingles are (doc, shingle) rows with
    * map-side distinct, the eval shingle set is a semi-join side keyed by
    * shingle (broadcastable when the benchmark is small — Catalyst decides;
    * the corpus side never self-joins), and the two aggregations are
    * partial-agg shuffles keyed by doc. Documents with fewer than `n`
    * tokens have no shingles and are (deterministically) absent.
    *
    * @return (doc_id, n_sh, n_hit, frac) for all non-eval docs with ≥ 1
    *         shingle, including zero-overlap rows (frac = 0) so the screen's
    *         output is a total audit table, not just the flagged tail. */
  def contamination(
      docs: DataFrame,
      evalPred: Column = defaultEvalPred,
      n: Int = 8): DataFrame = {
    // lazy leaf: the shingle table feeds three consumers below
    val sh = graft.dedup.Dedup.shingles(docs, n).localCheckpoint(false)
    val evalIds = docs.where(evalPred).select(col("doc_id"))
    val evalSh = sh.join(evalIds, Seq("doc_id"), "left_semi")
      .select(col("shingle")).distinct()
    val corpus = sh.join(evalIds, Seq("doc_id"), "left_anti")
    val sizes = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val hits = corpus.join(evalSh, Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    sizes.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_sh"), 6).as("frac"))
  }
}
