package graft.model

import java.sql.Timestamp

/** Core row types of the engine.
  *
  * The input contract (BASELINE.json `input_hint`) is a table of multi-turn
  * conversation / agent transcripts; everything else is derived from it.
  *
  * The reference models a property graph as `Graph[VD,ED](psVertices, edges)`
  * (`graph-algo/.../framework/Graph.scala:24-28`) with `VertexId = Long`
  * (`graph-core/.../package.scala:13`). We keep dense Long vertex ids, but the
  * master vertex store is a plain Dataset instead of a parameter-server matrix.
  */
final case class Transcript(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: Timestamp)

/** Dictionary row: dense vertex id for a string key (`conv:<id>` / `tool:<name>`). */
final case class VertexKey(vid: Long, key: String, kind: String)

/** Canonical undirected edge: src < dst, no self loops (the reference drops
  * self loops at load, `GraphLoader.scala:45-49`, and canonicalizes with
  * `srcId > dstId` flips, `GraphLoader.scala:41-44`). Weight = co-occurrence
  * count (default weight 1 mirrors `EdgePartitionBuilder.scala:16-21`).
  */
final case class Edge(src: Long, dst: Long, weight: Long)

/** Per-vertex iteration state for the message-pass loop (the Spark analog of
  * the reference's PS-resident `attrs` + `message` + `mask`,
  * `graph-core/.../core/data/PSPartition.scala:11-27`).
  */
final case class VertexState(vid: Long, value: Double, active: Boolean)
