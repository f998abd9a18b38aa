package graft

import org.apache.spark.sql.functions._

import graft.algo.RandomWalks
import graft.multimodal.MediaPipeline

class RandomWalksSpec extends SparkTestBase {

  private def edgeSet: Set[(Long, Long)] = GraphFixture.edgeList
    .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet

  test("deepWalk paths follow real edges and are reproducible") {
    val w1 = RandomWalks.deepWalk(GraphFixture.graph.edges, 1, 6)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toList).toMap
    val w2 = RandomWalks.deepWalk(GraphFixture.graph.edges, 1, 6)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toList).toMap
    assert(w1 == w2, "walks must be deterministic")
    val es = edgeSet
    for ((_, path) <- w1) {
      assert(path.length == 6)
      path.sliding(2).foreach { case List(a, b) => assert(es.contains((a, b)), s"($a,$b) not an edge") }
    }
  }

  test("node2vec paths follow real edges") {
    val walks = RandomWalks.node2vec(GraphFixture.graph.edges, p = 1.0, q = 0.8, pathLength = 5)
      .collect().map(r => r.getSeq[Long](2).toList)
    val es = edgeSet
    assert(walks.nonEmpty)
    walks.foreach { path =>
      assert(path.length == 5)
      path.sliding(2).foreach { case List(a, b) => assert(es.contains((a, b))) }
    }
  }

  test("metaPath2Vec alternates vertex kinds per the meta path") {
    val g = GraphFixture.graph
    val kinds = g.vertices.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val walks = RandomWalks.metaPath2Vec(g.edges, g.vertices, Seq("conv", "tool"), pathLength = 5)
      .collect().map(r => r.getSeq[Long](2).toList)
    assert(walks.nonEmpty)
    walks.foreach { path =>
      path.zipWithIndex.foreach { case (v, i) =>
        assert(kinds(v) == (if (i % 2 == 0) "conv" else "tool"), s"$path kind mismatch at $i")
      }
    }
  }
}

class MediaPipelineSpec extends SparkTestBase {

  test("media pipeline: deterministic stub decode, correct shapes, frame offsets") {
    val media = MediaPipeline.syntheticMedia(spark, 30)
    val f1 = MediaPipeline.extractFeatures(media, dim = 16, frames = 4).collect()
    val f2 = MediaPipeline.extractFeatures(media.repartition(7), dim = 16, frames = 4).collect()
    assert(f1.map(x => (x.media_id, x.features.toList)).sortBy(_._1).toSeq ==
      f2.map(x => (x.media_id, x.features.toList)).sortBy(_._1).toSeq)
    f1.foreach { f =>
      assert(f.features.length == 16)
      if (f.kind == "video") assert(f.frame_offsets.length == 4 && f.frame_offsets.head == 0L)
      else assert(f.frame_offsets.isEmpty)
    }
  }

  test("resize plan computes scales without touching bytes") {
    import spark.implicits._
    val got = MediaPipeline.resizePlan(
      Seq((1L, 2000, 1000), (2L, 100, 50)).toDF("media_id", "width", "height"), 512)
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))).toMap
    assert(got(1L) == (512, 256))
    assert(got(2L) == (100, 50))
  }
}

class StreamingSpec extends SparkTestBase {

  test("streaming conv-tool counts match the batch derivation on the same data") {
    import graft.streaming.TranscriptStream
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val t = GraphFixture.transcripts
    t.write.mode("overwrite").parquet(dir)
    // duplicate a slice to exercise the dedup stage
    t.limit(50).write.mode("append").parquet(dir)

    val stream = TranscriptStream.readTranscripts(spark, dir)
    val q = TranscriptStream.convToolCounts(stream)
      .writeStream.outputMode("update").format("memory").queryName("ct").start()
    q.processAllAvailable(); q.stop()

    val got = spark.sql("SELECT conv_id, tool, max(weight) AS weight FROM ct GROUP BY 1,2")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exp = t.where(col("tool").isNotNull).groupBy("conv_id", "tool").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == exp)
  }
}
