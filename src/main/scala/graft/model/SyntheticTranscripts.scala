package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic transcript generator (no wall clock, no RNG state —
  * every cell is a pure function of (seed, conv_id, turn_idx), so the table is
  * identical across runs, partitionings and parallelism levels).
  *
  * Shapes follow FIXTURES.md §1: `conv_id` zero-padded, dense 0-based
  * `turn_idx`, role cycle user/assistant/tool, `tool` nullable and drawn from a
  * Zipf-like popularity distribution (to create genuine hub vertices — the
  * skew the reference's degree-ordered edge sort exists for,
  * `graph-algo/.../framework/Edge.scala:62-91`), `text` with multi-byte UTF-8
  * so the byte-identity invariant is meaningful, `ts` = base epoch + derived
  * increments.
  *
  * Built entirely from `spark.range` + column functions: generation is
  * distributed and scales linearly with cores — at 10^12 turns this is a
  * parallel scan with no shuffle.
  */
object SyntheticTranscripts {

  private val Vocab: Array[String] =
    ("the quick brown fox jumps over lazy dog spark graph vertex edge rank label " +
      "merge join shuffle partition skew hub salt checkpoint iterate converge " +
      "消息 图 顶点 合并 ранг παράδειγμα émigré naïve").split(" ")

  /** Deterministic uniform in [0, 1) from hashed columns. */
  private def unif(cols: org.apache.spark.sql.Column*) =
    pmod(xxhash64(cols: _*), lit(1000003L)).cast("double") / lit(1000003.0)

  /** @param nConvs   number of conversations
    * @param maxTurns turns per conversation in [3, maxTurns]
    * @param nTools   size of the tool universe (Zipf-ish popularity)
    */
  def generate(
      spark: SparkSession,
      nConvs: Long,
      maxTurns: Int = 20,
      nTools: Int = 100,
      seed: Long = 42L): DataFrame = {
    require(maxTurns >= 3 && nTools >= 1)
    val s = lit(seed)
    val convs = spark
      .range(nConvs)
      .withColumn("conv_id", concat(lit("c"), lpad(col("id").cast("string"), 8, "0")))
      .withColumn(
        "n_turns",
        (pmod(xxhash64(s, col("id"), lit("nturns")), lit((maxTurns - 2).toLong)) + 3L)
          .cast("int"))

    val turns = convs
      .select(col("id").as("cid"), col("conv_id"),
        explode(sequence(lit(0), col("n_turns") - 1)).as("turn_idx"))

    // Zipf-ish tool rank: r = floor(exp(u * ln(nTools))) gives P(r) ~ 1/r.
    val u = unif(s, col("cid"), col("turn_idx"), lit("tool"))
    val toolRank = floor(exp(u * lit(math.log(nTools.toDouble)))).cast("long")
    val vocabCol = lit(Vocab)
    val wordIdx = (i: org.apache.spark.sql.Column) =>
      pmod(xxhash64(s, col("cid"), col("turn_idx"), i), lit(Vocab.length.toLong)).cast("int")

    turns
      .withColumn("role",
        element_at(lit(Array("user", "assistant", "tool")), pmod(col("turn_idx"), lit(3)).cast("int") + 1))
      .withColumn("tool",
        when(col("role") === "tool",
          concat(lit("tool"), lpad(toolRank.cast("string"), 4, "0"))))
      .withColumn("text",
        concat(
          concat_ws(" ",
            transform(sequence(lit(0), pmod(xxhash64(s, col("cid"), col("turn_idx"), lit("len")), lit(9L)).cast("int") + 3),
              i => element_at(vocabCol, wordIdx(i) + 1))),
          lit(" ✓図")))
      .withColumn("ts",
        timestamp_micros(
          lit(1704067200000000L) + // 2024-01-01T00:00:00Z
            col("cid") * 60000000L + col("turn_idx").cast("long") * 1000000L))
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }
}
