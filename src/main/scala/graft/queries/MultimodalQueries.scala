package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing queries (rows-only driver checks — the decode
  * step is a deterministic stub, see [[graft.operators.Multimodal]];
  * per-kind aggregates of the corpus metadata DO carry an oracle since
  * they never touch the stub). */
object MultimodalQueries {

  /** Typed-metadata aggregate over the media corpus (oracle-checkable:
    * pure column logic, no stub involved). */
  val q35 = QueryDef.sql("q35_media_meta",
    """SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |            ELSE 'video' END AS kind,
      |  COUNT(*) AS n, SUM(length(text)) AS total_bytes
      |FROM documents GROUP BY 1""")(
    (s, dir) => Multimodal.corpusFromDocuments(Tables.documents(s, dir))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum(col("meta.n_bytes")).as("total_bytes")))

  /** Partition-wise decode-stub features (rows-only: stub output). */
  val q36 = QueryDef.rowsOnly("q36_media_decode")(
    (s, dir) => Multimodal.decodeStub(
      Multimodal.corpusFromDocuments(Tables.documents(s, dir))).toDF())

  /** Frame sampling of video payloads (rows-only). */
  val q37 = QueryDef.rowsOnly("q37_media_frames")(
    (s, dir) => Multimodal.frameSample(
      Multimodal.corpusFromDocuments(Tables.documents(s, dir)), stride = 4))

  val all: Seq[QueryDef] = Seq(q35, q36, q37)
}
