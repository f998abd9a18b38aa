package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path (buckets bound the candidate set,
  * so the quadratic self-join never materializes at 100 TB).
  *
  * Dot products are `aggregate(zip_with(...))` column expressions in Double —
  * codegen'd, no UDF.
  */
object Similarity {

  /** Σ a_i·b_i in Double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  private def normalized(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))

  /** Exact cosine top-k neighbors (self excluded):
    * (query_id, rnk, neighbor_id, cosine). O(|queries|·n) — the correctness
    * baseline; use [[annTopK]] at scale. `queryPred` restricts the query side
    * (all vectors stay candidates). */
  def bruteTopK(embeddings: DataFrame, k: Int = 10, queryPred: Column = lit(true)): DataFrame = {
    val v = normalized(embeddings)
    val pairs = v.where(queryPred).as("a")
      .join(v.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("query_id"),
        col("b.vec_id").as("neighbor_id"),
        (dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")))
          .as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    pairs.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id", "cosine")
  }

  /** Deterministic random hyperplanes: plane j's component i is a
    * hash-derived pseudo-gaussian-ish value in [-1, 1). */
  private def planeComponent(j: Int, i: Column): Column =
    pmod(xxhash64(lit(j), i, lit("plane")), lit(2000003L)).cast("double") / lit(1000001.5) - lit(1.0)

  /** Sign-of-projection bit signature (numBits hyperplanes). */
  def rpSignatures(embeddings: DataFrame, numBits: Int = 16): DataFrame = {
    val sig = (0 until numBits).map { j =>
      val proj = aggregate(
        zip_with(col("embedding"),
          transform(sequence(lit(0), size(col("embedding")) - 1), i => planeComponent(j, i)),
          (x, p) => x.cast("double") * p),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L) * (1L << j)).otherwise(0L)
    }.reduce(_ + _)
    embeddings.select(col("vec_id"), col("embedding"), sig.as("rp_sig"))
  }

  /** ANN top-k: candidates = pairs sharing any band of the RP signature
    * (bands of bandBits each), then exact cosine within candidates. Recall
    * is tested against [[bruteTopK]] in SimilaritySpec. */
  def annTopK(
      embeddings: DataFrame,
      k: Int = 10,
      numBits: Int = 16,
      bandBits: Int = 4): DataFrame = {
    require(numBits % bandBits == 0)
    val bands = numBits / bandBits
    val v = rpSignatures(embeddings, numBits)
      .withColumn("nrm", norm(col("embedding")))
    val banded = v.select(col("vec_id"), col("embedding"), col("nrm"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("rp_sig"), b * bandBits).bitwiseAND((1L << bandBits) - 1)): _*))
        .as(Seq("band", "bh")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
        col("a.embedding").as("ea"), col("b.embedding").as("eb"),
        col("a.nrm").as("na"), col("b.nrm").as("nb"))
      .distinct()
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id", "cosine")
  }

  /** Embedding-cosine near-dup pairs (vec_a < vec_b, cosine >= minCosine). */
  def cosinePairs(embeddings: DataFrame, minCosine: Double): DataFrame = {
    val v = normalized(embeddings)
    v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")))
          .as("cosine"))
      .where(col("cosine") >= minCosine)
  }
}
