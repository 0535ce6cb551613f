package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Spatial ε-neighborhood queries via grid-cell blocking — the 2-D
  * sibling of the catalog's band joins (q13/q38) and LSH banding (q30):
  * quantize each point to a cell the size of the search radius, join
  * candidate pairs only within the 3×3 neighbor-cell stencil, then
  * verify with the exact predicate. The naive form is an O(n²) cross
  * join; cell blocking makes the join key (cx, cy) a plain shuffle key
  * with per-cell occupancy n·ε²/W² — at 1000 executors each cell pair
  * lands on one task and no task sees more than its stencil.
  *
  * Coordinates are md5-derived 24-bit integers (deterministic, no
  * testdata dependency), so every distance is EXACT integer arithmetic
  * — the oracle replays bit-for-bit in DuckDB; no floating point
  * anywhere in the predicate path.
  */
object SpatialQueries {

  /** World is [0, 2^24)²; ε = 2^18 (64×64 grid, cell edge = ε). */
  private val CoordHex = 6              // 24-bit coordinates
  private val CellShift = 18            // cell edge 2^18 = ε
  private val Eps2 = (1L << CellShift) * (1L << CellShift)

  private def coordSql(axis: String, key: String) =
    s"('0x' || substring(md5('$axis|' || CAST($key AS VARCHAR)), 1, $CoordHex))::BIGINT"

  /** All customer pairs within ε in the derived plane — the spatial
    * self-join every geo dedup / co-location audit starts from. One
    * point table, a 9-cell stencil explode on the probe side, an equi
    * join on the cell id, and the exact integer distance check; the
    * `a < b` residual keeps each unordered pair exactly once (each
    * pair is produced by both probe directions; the filter kills one).
    * No cross join, no doubles; the only shuffle is on the cell key. */
  val q218 = QueryDef.sql("q218_grid_eps_join",
    s"""WITH p AS (SELECT c_custkey AS k,
       |    ${coordSql("x", "c_custkey")} AS x,
       |    ${coordSql("y", "c_custkey")} AS y
       |  FROM customer),
       |c AS (SELECT k, x, y, x >> $CellShift AS cx, y >> $CellShift AS cy
       |  FROM p),
       |probe AS (SELECT k, x, y, cx + dx.d AS pcx, cy + dy.d AS pcy
       |  FROM c, (VALUES (-1), (0), (1)) dx(d),
       |       (VALUES (-1), (0), (1)) dy(d))
       |SELECT a.k AS k_a, b.k AS k_b,
       |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
       |FROM probe a JOIN c b ON a.pcx = b.cx AND a.pcy = b.cy
       |WHERE a.k < b.k
       |  AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       |    <= $Eps2""")(
    (s, dir) => graft.operators.Spatial.epsPairs(
      graft.operators.Spatial.derivePoints(
        Tables.customer(s, dir), "c_custkey"), CellShift))

  /** DBSCAN point labelling (ε as above, minPts = 5): core = ≥ 4
    * ε-neighbors, border = non-core with a core neighbor, noise =
    * the rest. Exactly the q218 pair machinery run symmetrically
    * (both directions kept, so a per-point neighbor count is one
    * groupBy), then ONE more broadcast-sized join against the core
    * set for the border test — the full cluster assignment would be
    * the alternating-star CC of q56 over the core-core pairs; the
    * labelling pass here is what decides which points even enter it.
    * At sf0.01 the derived plane is sparse (E[nbr] ≈ 1.2, almost all
    * noise); at sf0.1 it is dense (E[nbr] ≈ 11, almost all core) —
    * the query exercises both regimes with no parameter change. */
  val q219 = QueryDef.sql("q219_dbscan_core",
    s"""WITH p AS (SELECT c_custkey AS k,
       |    ${coordSql("x", "c_custkey")} AS x,
       |    ${coordSql("y", "c_custkey")} AS y
       |  FROM customer),
       |c AS (SELECT k, x, y, x >> $CellShift AS cx, y >> $CellShift AS cy
       |  FROM p),
       |probe AS (SELECT k, x, y, cx + dx.d AS pcx, cy + dy.d AS pcy
       |  FROM c, (VALUES (-1), (0), (1)) dx(d),
       |       (VALUES (-1), (0), (1)) dy(d)),
       |nbr AS (SELECT a.k AS k_a, b.k AS k_b
       |  FROM probe a JOIN c b ON a.pcx = b.cx AND a.pcy = b.cy
       |  WHERE a.k <> b.k
       |    AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       |      <= $Eps2),
       |cnt AS (SELECT p.k, (SELECT count(*) FROM nbr WHERE nbr.k_a = p.k)
       |    AS n_nbr FROM p),
       |core AS (SELECT k FROM cnt WHERE n_nbr >= 4)
       |SELECT cnt.k AS c_custkey, CAST(cnt.n_nbr AS BIGINT) AS n_nbr,
       |  CASE WHEN cnt.n_nbr >= 4 THEN 'core'
       |    WHEN EXISTS (SELECT 1 FROM nbr JOIN core
       |      ON nbr.k_b = core.k WHERE nbr.k_a = cnt.k)
       |    THEN 'border' ELSE 'noise' END AS label
       |FROM cnt""")(
    (s, dir) => graft.operators.Spatial.dbscanLabels(
        graft.operators.Spatial.derivePoints(
          Tables.customer(s, dir), "c_custkey"), CellShift, minPts = 5)
      .withColumnRenamed("k", "c_custkey"))

  def all: Seq[QueryDef] = Seq(q218, q219)
}
