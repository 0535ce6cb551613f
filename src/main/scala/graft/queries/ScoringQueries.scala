package graft.queries

import graft.Tables
import graft.operators.Rank
import org.apache.spark.sql.functions._

/** Curation scoring and robust statistics: the hashed linear quality
  * classifier (the fastText-shaped filter every web corpus is sieved
  * through), greedy max-cover source selection (which sources buy the
  * most vocabulary coverage per unit of data), the Theil–Sen robust
  * trend estimator, and mutual information for feature relevance.
  *
  * Contract stance shared with the rest of the catalog: decisions are
  * made on INTEGERS (milli-weights, token counts, integer day deltas),
  * doubles appear only in reported ratios rounded to 6 — so the greedy
  * argmax, the classifier's sign and the median-rank selection cannot
  * flip between engines on a last-ulp disagreement.
  */
object ScoringQueries {

  /** Weighted-Gini floor-ppm expressions shared by q308/q312. Row-count
    * SQUARES ride DECIMAL(38,0): `nl*nl*1e6` leaves BIGINT past ~3e9
    * rows in principle and the 6M-row sf1 lineitem already trips
    * Spark's ANSI overflow check at `(tp+tq)^2 * 1e6` (3.6e19 > 2^63) —
    * measured in the round-12 second-decade bench. DECIMAL(38,0)
    * intermediates are exact to 1e38 (~1e12-row fact tables at ppm
    * scale) and `DIV` lands the quotient back in BIGINT (≤ 2e6 ppm),
    * so the output schema and every value are unchanged — the DuckDB
    * oracle (exact BIGINT at oracle SFs) stays green untouched. */
  // sq's expansion is self-parenthesized: `DIV` and `*` share
  // precedence left-associatively, so an unwrapped `DIV CAST(..) * (..)`
  // would parse as `(.. DIV CAST(..)) * (..)` and silently drop the
  // denominator's second factor (caught by RankMetricsSpec's
  // brute-force parity case)
  private def sq(c: String) = s"(CAST($c AS DECIMAL(38,0)) * ($c))"

  private val giniPpm: String =
    s"((${sq("nl")} - ${sq("cp")} - ${sq("cq")}) * 1000000)" +
      s" DIV (CAST(nl AS DECIMAL(38,0)) * (tp + tq))" +
      s" + ((${sq("nr")} - ${sq("tp - cp")} - ${sq("tq - cq")}) * 1000000)" +
      s" DIV (CAST(nr AS DECIMAL(38,0)) * (tp + tq))"

  private val parentGiniPpm: String =
    s"((${sq("tp + tq")} - ${sq("tp")} - ${sq("tq")}) * 1000000)" +
      s" DIV ${sq("tp + tq")}"

  /** Hashed-feature linear text-quality scorer: token → 12-bit md5
    * bucket → deterministic integer weight in [-1000, 1000] milli
    * units; a document's score is the exact integer sum, its label the
    * exact sign. This is the serving shape of a fastText/linear-SVM
    * quality filter (hashing trick, no vocabulary table — the weight
    * VECTOR is 4096 ints, broadcast-free because it's derived in the
    * expression itself). One explode + one groupBy(doc) at fact scale;
    * at 100 TB the per-token work is a codegen'd md5+conv, no join
    * against a model table at all. */
  val q221 = QueryDef.sql("q221_quality_linear_score",
    """WITH tk AS (SELECT doc_id, tok FROM (
      |    SELECT doc_id,
      |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |    FROM documents) t WHERE length(tok) > 0),
      |w AS (SELECT doc_id,
      |    ('0x' || substring(md5('w|' || CAST(
      |      ('0x' || substring(md5(tok), 1, 3))::BIGINT AS VARCHAR)),
      |      1, 6))::BIGINT % 2001 - 1000 AS w_milli
      |  FROM tk)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(w_milli) AS BIGINT) AS score_milli,
      |  CAST(floor(CAST(sum(w_milli) * 1000 AS DOUBLE) / count(*))
      |    AS BIGINT) AS mean_score_micro,
      |  sum(w_milli) > 0 AS keep
      |FROM w GROUP BY doc_id""")(
    (s, dir) => {
      val tk = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0)
      val bucket = conv(substring(md5(col("tok")), 1, 3), 16, 10)
        .cast("long")
      val wMilli = conv(substring(
          md5(concat(lit("w|"), bucket.cast("string"))), 1, 6), 16, 10)
        .cast("long") % 2001 - 1000
      tk.select(col("doc_id"), wMilli.as("w_milli"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum("w_milli").as("score_milli"))
        .select(col("doc_id"), col("n_tokens"), col("score_milli"),
          // int/int quotient → exact floor micro-units, not round()
          // (the q128 6-decimal-tie stance; milli sum × 1000 / n)
          floor((col("score_milli") * 1000).cast("double") /
            col("n_tokens")).cast("long").as("mean_score_micro"),
          (col("score_milli") > 0).as("keep"))
    })

  private val CoverRounds = 5

  /** Greedy max-cover source selection: pick 5 of the corpus's sources
    * maximizing cumulative distinct-vocabulary coverage — the
    * submodular data-mixing question ("which crawls buy the most new
    * tokens?") answered with the classic (1 − 1/e) greedy. Each round
    * is ONE distributed aggregate (remaining sources × uncovered
    * tokens, map-side combined) followed by a 1-row argmax to the
    * driver — k driver decisions over k rounds is the textbook lazy-
    * greedy shape, NOT a collect of data (the covered set stays a
    * DataFrame, anti-joined next round). Ties break lexicographically;
    * gains are integer token counts, so the argmax is exact. The
    * oracle replays the same 5 rounds as chained CTEs. */
  val q222 = QueryDef.sql("q222_coverage_greedy", {
    val rounds = (1 to CoverRounds).map { r =>
      val prevP = (1 until r).map(i => s"SELECT source FROM p$i")
        .mkString(" UNION ALL ")
      val notPicked =
        if (r == 1) "" else s" WHERE source NOT IN ($prevP)"
      val uncovered =
        if (r == 1) "st"
        else s"(SELECT source, tok FROM st WHERE tok NOT IN (SELECT tok FROM c${r - 1}))"
      val g =
        s"""g$r AS (SELECT s.source, CAST(count(u.tok) AS BIGINT) AS gain
           |  FROM (SELECT DISTINCT source FROM st$notPicked) s
           |  LEFT JOIN $uncovered u ON s.source = u.source
           |  GROUP BY 1),
           |p$r AS (SELECT source, gain FROM g$r
           |  ORDER BY gain DESC, source LIMIT 1),
           |c$r AS (${if (r == 1) "" else s"SELECT tok FROM c${r - 1} UNION "}
           |  SELECT DISTINCT st.tok FROM st JOIN p$r USING (source))"""
      g
    }.mkString(",\n")
    val sel = (1 to CoverRounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS pick, p$r.source, p$r.gain,
         |  (SELECT CAST(count(*) AS BIGINT) FROM c$r) AS cum_covered,
         |  CAST(floor((SELECT count(*) FROM c$r) * 1000000.0 /
         |    (SELECT v FROM tot)) AS BIGINT) AS coverage_ppm
         |FROM p$r"""
    }.mkString(" UNION ALL ")
    s"""WITH st AS (SELECT DISTINCT source, tok FROM (
       |    SELECT source,
       |      unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       |    FROM documents) t WHERE length(tok) > 0),
       |tot AS (SELECT count(DISTINCT tok) AS v FROM st),
       |$rounds
       |$sel"""
  })(
    (s, dir) => {
      val st = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0)
        .distinct()
        .cache()
      val totalV = st.select("tok").distinct().count()
      var covered: org.apache.spark.sql.DataFrame = null
      var picked = Set.empty[String]
      var cumCovered = 0L
      val out = Seq.newBuilder[(Long, String, Long, Long, Long)]
      for (r <- 1 to CoverRounds) {
        val remaining = st.select("source").distinct()
          .where(!col("source").isInCollection(picked.toSeq :+ ""))
        val unc = if (covered == null) st
          else st.join(covered, Seq("tok"), "left_anti")
        val gains = remaining.join(unc, Seq("source"), "left")
          .groupBy("source").agg(count(col("tok")).as("gain"))
        val top = gains.orderBy(col("gain").desc, col("source")).limit(1)
          .collect()(0)
        val (src, gain) = (top.getString(0), top.getLong(1))
        picked += src
        cumCovered += gain
        covered = st.where(col("source").isInCollection(picked.toSeq))
          .select("tok").distinct().cache()
        // exact integer floor-ppm (int/int quotient — q128 tie stance)
        out += ((r.toLong, src, gain, cumCovered,
          cumCovered * 1000000L / totalV))
      }
      st.unpersist(blocking = false)
      s.createDataFrame(out.result())
        .toDF("pick", "source", "gain", "cum_covered", "coverage_ppm")
    })

  /** Theil–Sen robust trend of daily order revenue: the exact lower
    * median of all C(n_days, 2) pairwise slopes — the outlier-immune
    * answer to q127's OLS. The pair table is quadratic in DAYS (a few
    * million rows from 2.4k days), never in orders: the fact table
    * reduces to one integer-cents daily aggregate first. Median
    * selection is by integer rank over [[graft.operators.Rank]]'s
    * two-pass globalRank — no single-task window; slope doubles are
    * int64/int64 IEEE divisions, identical in both engines, and the
    * selection rank itself is an integer. */
  val q223 = QueryDef.sql("q223_theil_sen",
    """WITH daily AS (SELECT
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      AS d,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS rev
      |  FROM orders GROUP BY 1),
      |p AS (SELECT (b.rev - a.rev) / CAST(b.d - a.d AS DOUBLE) AS slope
      |  FROM daily a JOIN daily b ON b.d > a.d),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(CASE WHEN slope > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_pos FROM p),
      |r AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn
      |  FROM p)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
      |  m.n_pairs,
      |  CAST(floor((SELECT slope FROM r, m
      |    WHERE rn = (m.n_pairs + 1) // 2) * 1000000.0) AS BIGINT)
      |    AS ts_slope_micro,
      |  CAST(floor(CAST(m.n_pos AS DOUBLE) * 1000000.0 / m.n_pairs)
      |    AS BIGINT) AS pos_share_ppm
      |FROM m""")(
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(unix_date(col("o_orderdate").cast("date")).as("d"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).cast("long").as("rev"))
        .cache()
      val nDays = daily.count()
      val p = daily.toDF("da", "ra").join(daily.toDF("db", "rb"),
          col("db") > col("da"))
        .select(((col("rb") - col("ra")) /
          (col("db") - col("da")).cast("double")).as("slope"),
          col("da"), col("db"))
      val m = p.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("slope") > 0, 1L).otherwise(0L)).as("n_pos"))
      val ranked = Rank.globalRank(p, "rn", col("slope"), col("da"),
        col("db"))
      val med = ranked.crossJoin(broadcast(m))
        .where(col("rn") === expr("(n_pairs + 1) DIV 2"))
        .select(col("slope"), col("n_pairs"), col("n_pos"))
      // int/int quotients ship as exact floor micro-units (q128 tie
      // stance); slope×1e6 floor is IEEE-identical across engines.
      val res = med.select(lit(nDays).as("n_days"), col("n_pairs"),
        floor(col("slope") * 1000000.0).cast("long")
          .as("ts_slope_micro"),
        floor(col("n_pos").cast("double") * 1000000.0 / col("n_pairs"))
          .cast("long").as("pos_share_ppm"))
      daily.unpersist(blocking = false)
      res
    })

  /** Mutual information (and NMI) between customer market segment and
    * order priority — the feature-relevance number behind every
    * "should this column enter the model?" decision, computed from the
    * exact 5×5 contingency of the orders⋈customer join. The join
    * broadcasts nothing here (both sides fact-scale at 100 TB,
    * custkey-co-partitioned); all logs run on the 25-cell table. NMI
    * normalizes by √(H(X)·H(Y)). */
  val q224 = QueryDef.sql("q224_mutual_info",
    """WITH j AS (SELECT c.c_mktsegment AS x, o.o_orderpriority AS y
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |cxy AS (SELECT x, y, count(*) AS nxy FROM j GROUP BY 1, 2),
      |cx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM cxy GROUP BY 1),
      |cy AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM cxy GROUP BY 1),
      |n AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cxy),
      |mi AS (SELECT sum((CAST(nxy AS DOUBLE) / n.n) *
      |      ln(CAST(nxy AS DOUBLE) * n.n / (cx.nx * cy.ny))) AS mi
      |  FROM cxy JOIN cx USING (x) JOIN cy USING (y), n),
      |hx AS (SELECT -sum((CAST(nx AS DOUBLE) / n.n) *
      |      ln(CAST(nx AS DOUBLE) / n.n)) AS h FROM cx, n),
      |hy AS (SELECT -sum((CAST(ny AS DOUBLE) / n.n) *
      |      ln(CAST(ny AS DOUBLE) / n.n)) AS h FROM cy, n)
      |SELECT n.n AS n_rows, round(mi.mi, 6) AS mi_nats,
      |  round(mi.mi / sqrt(hx.h * hy.h), 6) AS nmi
      |FROM mi, hx, hy, n""")(
    (s, dir) => {
      val j = Tables.orders(s, dir).join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("x"), col("o_orderpriority").as("y"))
      val cxy = j.groupBy("x", "y").agg(count(lit(1)).as("nxy"))
      val cx = cxy.groupBy("x").agg(sum("nxy").as("nx"))
      val cy = cxy.groupBy("y").agg(sum("nxy").as("ny"))
      val n = cxy.agg(sum("nxy").as("n"))
      val t = cxy.join(cx, "x").join(cy, "y").crossJoin(broadcast(n))
      val mi = t.agg(
        sum((col("nxy").cast("double") / col("n")) *
          log(col("nxy").cast("double") * col("n") /
            (col("nx") * col("ny")))).as("mi"))
      val hx = cx.crossJoin(broadcast(n)).agg(
        (lit(-1) * sum((col("nx").cast("double") / col("n")) *
          log(col("nx").cast("double") / col("n")))).as("hx"))
      val hy = cy.crossJoin(broadcast(n)).agg(
        (lit(-1) * sum((col("ny").cast("double") / col("n")) *
          log(col("ny").cast("double") / col("n")))).as("hy"))
      n.crossJoin(broadcast(mi)).crossJoin(broadcast(hx))
        .crossJoin(broadcast(hy))
        .select(col("n").as("n_rows"), round(col("mi"), 6).as("mi_nats"),
          round(col("mi") / sqrt(col("hx") * col("hy")), 6).as("nmi"))
    })

  /** Curriculum staging: order the corpus by per-token unigram
    * surprisal (q172's integer-bits LM-fluency proxy) and cut exact
    * terciles — easy/medium/hard training phases, the schedule a
    * curriculum-learning run feeds from. Corpus-RELATIVE staging (rank
    * terciles, not fixed thresholds) because absolute surprisal moves
    * with corpus composition — the q74-funnel dial stance. Ranking is
    * the two-pass [[graft.operators.Rank.globalRank]] over per-doc
    * aggregates (never a single-task window); stage assignment is the
    * exact integer ntile formula; per-stage means ship as floor
    * micro-units. */
  val q227 = QueryDef.sql("q227_curriculum_stages",
    """WITH tk AS (SELECT doc_id, tok FROM (
      |    SELECT doc_id,
      |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |    FROM documents) t WHERE length(tok) > 0),
      |cnt AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1),
      |tv AS (SELECT count(*) AS t, count(DISTINCT tok) AS v FROM tk),
      |b AS (SELECT tok,
      |        CAST(length(bin((t + v) // (c + 1))) - 1 AS BIGINT) AS bits
      |      FROM cnt, tv),
      |d AS (SELECT doc_id, count(*) AS n_tokens,
      |    CAST(sum(bits) AS BIGINT) AS sbits
      |  FROM tk JOIN b USING (tok) GROUP BY doc_id),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM d),
      |r AS (SELECT doc_id, n_tokens, sbits,
      |    row_number() OVER (ORDER BY CAST(sbits AS DOUBLE) / n_tokens,
      |      doc_id) AS rn
      |  FROM d),
      |st AS (SELECT ((rn - 1) * 3) // n.nd AS stage, n_tokens, sbits
      |  FROM r, n),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS all_toks FROM d)
      |SELECT CAST(stage AS BIGINT) AS stage,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(floor(sum(sbits) * 1000000.0 / sum(n_tokens)) AS BIGINT)
      |    AS stage_mean_bits_micro,
      |  CAST(floor(sum(n_tokens) * 1000000.0 / tot.all_toks) AS BIGINT)
      |    AS token_share_ppm
      |FROM st, tot GROUP BY stage, tot.all_toks""")(
    (s, dir) => {
      import graft.operators.{Rank, TextAnalysis}
      val d = TextAnalysis.unigramSurprisalBits(
          Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          col("surprisal_bits").as("sbits"))
        .cache()
      val nd = d.count()
      val ranked = Rank.globalRank(d, "rn",
        col("sbits").cast("double") / col("n_tokens"), col("doc_id"))
      val tot = d.agg(sum("n_tokens").as("all_toks"))
      val res = ranked
        .select(expr(s"((rn - 1) * 3) DIV $nd").as("stage"),
          col("n_tokens"), col("sbits"))
        .groupBy("stage")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
          sum("sbits").as("ssb"))
        .crossJoin(broadcast(tot))
        .select(col("stage"), col("n_docs"), col("n_tokens"),
          floor(col("ssb") * lit(1000000.0) / col("n_tokens"))
            .cast("long").as("stage_mean_bits_micro"),
          floor(col("n_tokens") * lit(1000000.0) / col("all_toks"))
            .cast("long").as("token_share_ppm"))
      d.unpersist(blocking = false)
      res
    })

  /** Token-budget waterfilling: allocate a corpus-wide sampling budget
    * (half the total tokens) across sources, equalizing allocations
    * subject to per-source supply caps — the canonical max-min-fair
    * solution to "upsample the small sources without inventing data",
    * complementing q90's proportional apportionment. ENTIRELY integer:
    * sort sources by supply (ascending, name tiebreak), prefix-sum,
    * a source is capped iff its supply fits the budget left for it and
    * everything above it (P_{i−1} + s_i·(n−i+1) ≤ B — a prefix
    * property under ascending order), uncapped sources get the floor
    * water level with the mod-remainder distributed one token each to
    * the first remainder sources. Σalloc = B exactly, asserted by the
    * spec. The sources frame is tiny — all windows run post-aggregate
    * (q209 stance); supplies come from the one fact-scale scan. */
  val q230 = QueryDef.sql("q230_budget_waterfill",
    """WITH sup AS (SELECT source,
      |    CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
      |      ELSE length(string_split_regex(trim(text), '\s+')) END)
      |      AS BIGINT) AS supply
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(supply) AS BIGINT) AS tot,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(supply) // 2 AS BIGINT) AS b FROM sup),
      |r AS (SELECT source, supply,
      |    row_number() OVER (ORDER BY supply, source) AS rn,
      |    sum(supply) OVER (ORDER BY supply, source
      |      ROWS UNBOUNDED PRECEDING) - supply AS p_below
      |  FROM sup),
      |cap AS (SELECT r.*, t.b, t.n,
      |    p_below + supply * (t.n - rn + 1) <= t.b AS capped
      |  FROM r, t),
      |k AS (SELECT CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END)
      |      AS BIGINT) AS k,
      |    CAST(sum(CASE WHEN capped THEN supply ELSE 0 END) AS BIGINT)
      |      AS p_k
      |  FROM cap)
      |SELECT source, supply,
      |  CAST(CASE WHEN capped THEN supply
      |    ELSE (cap.b - k.p_k) // (cap.n - k.k) +
      |      (CASE WHEN rn - k.k <= (cap.b - k.p_k) % (cap.n - k.k)
      |        THEN 1 ELSE 0 END) END AS BIGINT) AS alloc,
      |  capped,
      |  CAST(floor(CAST(CASE WHEN capped THEN supply
      |    ELSE (cap.b - k.p_k) // (cap.n - k.k) +
      |      (CASE WHEN rn - k.k <= (cap.b - k.p_k) % (cap.n - k.k)
      |        THEN 1 ELSE 0 END) END AS DOUBLE) * 1000000.0 / supply)
      |    AS BIGINT) AS fill_ppm
      |FROM cap, k""")(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sup = Tables.documents(s, dir)
        .groupBy("source")
        .agg(sum(when(length(trim(col("text"))) === 0, 0)
          .otherwise(size(split(trim(col("text")), "\\s+"))))
          .cast("long").as("supply"))
      val t = sup.agg(sum("supply").as("tot"), count(lit(1)).as("n"),
        (sum("supply") / 2).cast("long").as("b"))
      val w = Window.orderBy("supply", "source")
      // post-aggregate frame (|sources| rows) — bounded global window
      val r = sup.select(col("source"), col("supply"),
        row_number().over(w).as("rn"),
        (sum("supply").over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)) - col("supply")).as("p_below"))
      val cap = r.crossJoin(broadcast(t))
        .withColumn("capped",
          col("p_below") + col("supply") * (col("n") - col("rn") + 1)
            <= col("b"))
      val k = cap.agg(
        sum(when(col("capped"), 1L).otherwise(0L)).as("k"),
        sum(when(col("capped"), col("supply")).otherwise(0L)).as("p_k"))
      val level = expr("(b - p_k) DIV (n - k)")
      val rem = expr("(b - p_k) % (n - k)")
      val alloc = when(col("capped"), col("supply"))
        .otherwise(level +
          when(col("rn") - col("k") <= rem, 1L).otherwise(0L))
      cap.crossJoin(broadcast(k))
        .select(col("source"), col("supply"),
          alloc.cast("long").as("alloc"), col("capped"),
          floor(alloc.cast("double") * lit(1000000.0) / col("supply"))
            .cast("long").as("fill_ppm"))
    })

  /** Quantile normalization across sources — map every document's
    * length onto the POOLED length distribution at its within-source
    * rank quantile (the batch-effect correction that makes "long doc"
    * mean the same thing in every crawl before length-based filters
    * run). ENTIRELY rank arithmetic: within-source rank r of n_s maps
    * to pooled rank 1 + ⌊(r−1)(N−1)/(n_s−1)⌋ (exact integers), and the
    * normalized value is the pooled order statistic at that rank — no
    * floats anywhere. Pooled ranking is the two-pass
    * [[graft.operators.Rank.globalRank]]; within-source ranks shard by
    * source; the final lookup is an equi join on the pooled rank. */
  val q237 = QueryDef.sql("q237_quantile_normalize",
    """WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v
      |  FROM documents),
      |p AS (SELECT v AS pv, row_number() OVER (ORDER BY v, doc_id)
      |    AS pr FROM d),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
      |s AS (SELECT doc_id, source, v,
      |    row_number() OVER (PARTITION BY source ORDER BY v, doc_id)
      |      AS r,
      |    count(*) OVER (PARTITION BY source) AS ns
      |  FROM d),
      |t AS (SELECT s.doc_id, s.source, s.v,
      |    CASE WHEN s.ns = 1 THEN (n.n + 1) // 2
      |      ELSE 1 + ((s.r - 1) * (n.n - 1)) // (s.ns - 1) END AS ti
      |  FROM s, n)
      |SELECT t.doc_id, t.source, t.v AS n_chars,
      |  p.pv AS normalized
      |FROM t JOIN p ON t.ti = p.pr""")(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          col("n_chars").cast("long").as("v"))
      val p = Rank.globalRank(d.select(col("v"), col("doc_id")), "pr",
          col("v"), col("doc_id"))
        .select(col("v").as("pv"), col("pr"))
      val n = d.agg(count(lit(1)).as("n"))
      val ws = Window.partitionBy("source").orderBy("v", "doc_id")
      val sdf = d.select(col("doc_id"), col("source"), col("v"),
        row_number().over(ws).as("r"),
        count(lit(1)).over(Window.partitionBy("source")).as("ns"))
      val t = sdf.crossJoin(broadcast(n))
        .withColumn("ti", when(col("ns") === 1,
            expr("(n + 1) DIV 2"))
          .otherwise(lit(1) + expr("((r - 1) * (n - 1)) DIV (ns - 1)")))
      t.join(p, col("ti") === col("pr"))
        .select(col("doc_id"), col("source"), col("v").as("n_chars"),
          col("pv").as("normalized"))
    })

  /** Distinct-n-gram diversity per source (distinct-1 / distinct-2 —
    * the repetitiveness metric generation-quality reports lead with):
    * unique unigram and adjacent-bigram ratios over each source's
    * pooled token stream. One explode, one per-doc LEAD (co-
    * partitioned with the explode), two aggregates; ratios floor-ppm.
    * Low distinct-2 with normal distinct-1 is the template-corpus
    * signature (q59's repetition flag at source granularity). */
  val q238 = QueryDef.sql("q238_distinct_ngrams",
    """WITH tk AS (SELECT source, doc_id, pos, tok FROM (
      |    SELECT source, doc_id,
      |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok,
      |      unnest(range(len(string_split_regex(lower(trim(text)),
      |        '\s+')))) AS pos
      |    FROM documents) s WHERE length(tok) > 0),
      |bg AS (SELECT source, tok || ' ' || lead(tok)
      |    OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
      |  FROM tk),
      |u AS (SELECT source, CAST(count(*) AS BIGINT) AS n_uni,
      |    CAST(count(DISTINCT tok) AS BIGINT) AS d_uni
      |  FROM tk GROUP BY 1),
      |b AS (SELECT source, CAST(count(bigram) AS BIGINT) AS n_bi,
      |    CAST(count(DISTINCT bigram) AS BIGINT) AS d_bi
      |  FROM bg GROUP BY 1)
      |SELECT u.source, n_uni, d_uni,
      |  CAST(floor(d_uni * 1000000.0 / n_uni) AS BIGINT)
      |    AS distinct1_ppm,
      |  n_bi, d_bi,
      |  CAST(floor(d_bi * 1000000.0 / n_bi) AS BIGINT) AS distinct2_ppm
      |FROM u JOIN b ON u.source = b.source""")(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tk = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
          posexplode(split(lower(trim(col("text"))), "\\s+"))
            .as(Seq("pos", "tok")))
        .where(length(col("tok")) > 0)
      val bg = tk.select(col("source"),
        concat(col("tok"), lit(" "), lead(col("tok"), 1).over(
          Window.partitionBy("doc_id").orderBy("pos"))).as("bigram"))
      val u = tk.groupBy("source").agg(count(lit(1)).as("n_uni"),
        count_distinct(col("tok")).as("d_uni"))
      val b = bg.groupBy("source").agg(count(col("bigram")).as("n_bi"),
        count_distinct(col("bigram")).as("d_bi"))
      u.join(b, "source")
        .select(col("source"), col("n_uni"), col("d_uni"),
          floor(col("d_uni") * lit(1000000.0) / col("n_uni")).cast("long")
            .as("distinct1_ppm"),
          col("n_bi"), col("d_bi"),
          floor(col("d_bi") * lit(1000000.0) / col("n_bi")).cast("long")
            .as("distinct2_ppm"))
    })

  private val BtIters = 12

  /** Bradley–Terry preference aggregation over sources — the reward-
    * model arithmetic of RLHF applied to corpus curation: per
    * language, sources "play" pairwise matches decided by their
    * lower-median q221 quality score; the directed win matrix then
    * fits BT strengths with 12 Zermelo/MM iterations. The fixed-point
    * is INTEGER micro-units after every iteration (the q213 stance:
    * round state, then iterate — raw-double chains drift per engine),
    * and each iteration's denominator folds its terms in ascending
    * opponent order via an explicit left fold (DuckDB `list_reduce`,
    * Spark driver fold over the collected bounded matrix — #sources²
    * rows, a model artifact, not data). Ties contribute no win in
    * either direction; sources with zero games drop out. Output:
    * games/wins (integers) and the BT strength with its rank. */
  val q239 = QueryDef.sql("q239_bradley_terry", {
    val iters = (1 to BtIters).map { k =>
      s"""it$k AS MATERIALIZED (SELECT nm.i,
         |    CAST(floor(max(ww.w) * 1000000.0 / list_reduce(
         |      list(nm.n * 1000000.0 / (a.x + b.x) ORDER BY nm.j),
         |      (p, q) -> p + q)) AS BIGINT) AS x
         |  FROM nm JOIN it${k - 1} a ON nm.i = a.i
         |    JOIN it${k - 1} b ON nm.j = b.i
         |    JOIN ww ON nm.i = ww.i
         |  GROUP BY nm.i)"""
    }.mkString(",\n")
    s"""WITH tk AS (SELECT doc_id, tok FROM (
       |    SELECT doc_id,
       |      unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       |    FROM documents) t WHERE length(tok) > 0),
       |wm AS MATERIALIZED (SELECT doc_id,
       |    CAST(sum(('0x' || substring(md5('w|' || CAST(
       |      ('0x' || substring(md5(tok), 1, 3))::BIGINT AS VARCHAR)),
       |      1, 6))::BIGINT % 2001 - 1000) AS BIGINT) AS s
       |  FROM tk GROUP BY doc_id),
       |sc AS (SELECT d.doc_id, d.source, d.lang, coalesce(wm.s, 0) AS s
       |  FROM documents d LEFT JOIN wm ON d.doc_id = wm.doc_id),
       |med AS MATERIALIZED (SELECT source, lang,
       |    list(s ORDER BY s, doc_id)[CAST((count(*) + 1) // 2 AS INT)]
       |      AS m
       |  FROM sc GROUP BY 1, 2),
       |pw AS MATERIALIZED (SELECT a.source AS i, b.source AS j,
       |    CAST(sum(CASE WHEN a.m > b.m THEN 1 ELSE 0 END) AS BIGINT)
       |      AS wins
       |  FROM med a JOIN med b ON a.lang = b.lang
       |    AND a.source <> b.source
       |  GROUP BY 1, 2),
       |nm AS MATERIALIZED (SELECT p.i, p.j, p.wins + q.wins AS n FROM pw p
       |  JOIN pw q ON p.i = q.j AND p.j = q.i WHERE p.wins + q.wins > 0),
       |ww AS MATERIALIZED (SELECT i, CAST(sum(wins) AS BIGINT) AS w FROM pw
       |  WHERE i IN (SELECT i FROM nm) GROUP BY 1),
       |it0 AS MATERIALIZED (SELECT i, CAST(1000000 AS BIGINT) AS x FROM ww),
       |$iters,
       |fin AS (SELECT ww.i AS source, ww.w AS wins,
       |    (SELECT CAST(sum(n) AS BIGINT) FROM nm WHERE nm.i = ww.i)
       |      AS games,
       |    it$BtIters.x AS bt_micro
       |  FROM ww JOIN it$BtIters ON ww.i = it$BtIters.i)
       |SELECT source, games, wins, bt_micro,
       |  CAST(row_number() OVER (ORDER BY bt_micro DESC, source)
       |    AS BIGINT) AS rank
       |FROM fin"""
  })(
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val tk = docs.select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0)
      val bucket = conv(substring(md5(col("tok")), 1, 3), 16, 10)
        .cast("long")
      val wMilli = conv(substring(
          md5(concat(lit("w|"), bucket.cast("string"))), 1, 6), 16, 10)
        .cast("long") % 2001 - 1000
      val wm = tk.select(col("doc_id"), wMilli.as("w_milli"))
        .groupBy("doc_id").agg(sum("w_milli").as("s"))
      val sc = docs.select(col("doc_id"), col("source"), col("lang"))
        .join(wm, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"), col("lang"),
          coalesce(col("s"), lit(0L)).as("s"))
      val med = sc.groupBy("source", "lang")
        .agg(expr("element_at(sort_array(collect_list(struct(s, doc_id)))," +
          " CAST((count(1) + 1) DIV 2 AS INT)).s").as("m"))
      val pw = med.toDF("i", "lang", "mi")
        .join(med.toDF("j", "lang", "mj"), "lang")
        .where(col("i") =!= col("j"))
        .groupBy("i", "j")
        .agg(sum(when(col("mi") > col("mj"), 1L).otherwise(0L)).as("wins"))
      // bounded model fit: the pairwise matrix is #sources² — collect,
      // iterate in ascending-opponent order (the oracle's list_reduce
      // fold, same IEEE left fold), round to micro ints per iteration
      val dir0 = pw.collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      val games = dir0.toSeq.flatMap { case ((i, j), w) =>
        val n = w + dir0.getOrElse((j, i), 0L)
        if (n > 0) Some((i, j, n)) else None
      }
      if (games.isEmpty) {
        s.createDataFrame(
            s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("source",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("games",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("wins",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("bt_micro",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("rank",
                org.apache.spark.sql.types.LongType))))
      } else {
        val srcs = games.flatMap(g => Seq(g._1, g._2)).distinct.sorted
        val winsOf = srcs.map(i => i ->
          dir0.collect { case ((a, _), w) if a == i => w }.sum).toMap
        val gamesOf = srcs.map(i => i ->
          games.collect { case (a, _, n) if a == i => n }.sum).toMap
        var x = srcs.map(_ -> 1000000L).toMap
        for (_ <- 1 to BtIters) {
          x = srcs.map { i =>
            val terms = games.filter(_._1 == i).sortBy(_._2)
              .map { case (_, j, n) => n * 1000000.0 / (x(i) + x(j)) }
            val d = terms.foldLeft(0.0)(_ + _)
            i -> math.floor(winsOf(i) * 1000000.0 / d).toLong
          }.toMap
        }
        val ranked = srcs.map(i => (i, gamesOf(i), winsOf(i), x(i)))
          .sortBy { case (i, _, _, b) => (-b, i) }
          .zipWithIndex
          .map { case ((i, g, w, b), r) => (i, g, w, b, (r + 1).toLong) }
        s.createDataFrame(ranked)
          .toDF("source", "games", "wins", "bt_micro", "rank")
      }
    })

  /** Leave-one-source-out data valuation: how much does each source's
    * removal hurt a fixed held-out set's fluency under the q172
    * integer-bits unigram model? The Shapley-lite influence number
    * behind "which crawl is actually pulling its weight". The trick
    * that makes 20 counterfactual models ONE pass: removal is pure
    * count subtraction — c₋ₛ = c − cₛ, T₋ₛ = T − Tₛ, V₋ₛ = #{tok :
    * c₋ₛ > 0} — so global counts + per-(source, token) counts answer
    * every counterfactual, and the eval join fans out |eval tokens| ×
    * |sources| rows (bounded, never corpus × sources). Training half
    * = md5 sixteenths 0–7, eval = sixteenth 15 (the q243 split).
    * Everything integer; influence ships floor-micro per eval token.
    * Positive delta = the source was helping. */
  val q244 = QueryDef.sql("q244_loso_influence",
    """WITH hd AS (SELECT doc_id, source, text,
      |    ('0x' || substring(md5('s|' || CAST(doc_id AS VARCHAR)),
      |      1, 15))::BIGINT % 16 AS h
      |  FROM documents),
      |tok AS (SELECT doc_id, source, h, tok FROM (
      |    SELECT doc_id, source, h,
      |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |    FROM hd) t WHERE length(tok) > 0),
      |tr AS MATERIALIZED (SELECT source, tok FROM tok WHERE h < 8),
      |c AS MATERIALIZED (SELECT tok, CAST(count(*) AS BIGINT) AS c
      |  FROM tr GROUP BY 1),
      |cs AS MATERIALIZED (SELECT source, tok,
      |    CAST(count(*) AS BIGINT) AS c FROM tr GROUP BY 1, 2),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS t,
      |    CAST(count(*) AS BIGINT) AS v FROM c),
      |ts AS (SELECT source, CAST(sum(c) AS BIGINT) AS t_s
      |  FROM cs GROUP BY 1),
      |vmin AS (SELECT cs.source,
      |    CAST(sum(CASE WHEN c.c = cs.c THEN 1 ELSE 0 END) AS BIGINT)
      |      AS v_gone
      |  FROM cs JOIN c USING (tok) GROUP BY 1),
      |ev AS MATERIALIZED (SELECT tok FROM tok WHERE h = 15),
      |en AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev),
      |full_bits AS (SELECT
      |    CAST(sum(length(bin((t.t + t.v) // (coalesce(c.c, 0) + 1))))
      |      - count(*) AS BIGINT) AS bits
      |  FROM ev CROSS JOIN t LEFT JOIN c USING (tok)),
      |srcs AS (SELECT DISTINCT source FROM tr),
      |eb AS (SELECT s.source,
      |    CAST(sum(length(bin(
      |      ((t.t - ts.t_s) + (t.v - vm.v_gone)) //
      |      (coalesce(c.c, 0) - coalesce(cs.c, 0) + 1))))
      |      - count(*) AS BIGINT) AS bits_minus
      |  FROM ev CROSS JOIN srcs s
      |    CROSS JOIN t
      |    JOIN ts ON ts.source = s.source
      |    JOIN vmin vm ON vm.source = s.source
      |    LEFT JOIN c USING (tok)
      |    LEFT JOIN cs ON cs.source = s.source AND cs.tok = ev.tok
      |  GROUP BY 1)
      |SELECT eb.source, ts.t_s AS removed_tokens,
      |  fb.bits AS bits_full, eb.bits_minus,
      |  eb.bits_minus - fb.bits AS delta_bits,
      |  CAST(floor((eb.bits_minus - fb.bits) * 1000000.0 / en.n)
      |    AS BIGINT) AS influence_micro,
      |  CAST(row_number() OVER (ORDER BY eb.bits_minus - fb.bits DESC,
      |    eb.source) AS BIGINT) AS rk
      |FROM eb JOIN ts ON eb.source = ts.source, full_bits fb, en""")(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hd = Tables.documents(s, dir).select(col("doc_id"),
        col("source"), col("text"),
        (conv(substring(md5(concat(lit("s|"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
          % 16).as("h"))
      val tok = hd.select(col("doc_id"), col("source"), col("h"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0)
      val tr = tok.where(col("h") < 8).select("source", "tok").cache()
      val c = tr.groupBy("tok").agg(count(lit(1)).as("c")).cache()
      val cs = tr.groupBy("source", "tok").agg(count(lit(1)).as("cs"))
      val t = c.agg(sum("c").as("t"), count(lit(1)).as("v"))
      val ts = cs.groupBy("source").agg(sum("cs").as("t_s"))
      val vmin = cs.join(c, "tok")
        .groupBy("source")
        .agg(sum(when(col("c") === col("cs"), 1L).otherwise(0L))
          .as("v_gone"))
      val ev = tok.where(col("h") === 15).select("tok").cache()
      val evN = ev.count()
      val fullBits = ev.join(c, Seq("tok"), "left").crossJoin(broadcast(t))
        .agg((sum(length(bin(expr("(t + v) DIV (coalesce(c, 0) + 1)"))))
          - count(lit(1))).cast("long").as("bits"))
      val srcs = tr.select("source").distinct()
      val eb = ev.crossJoin(broadcast(srcs))
        .join(c, Seq("tok"), "left")
        .join(cs, Seq("source", "tok"), "left")
        .crossJoin(broadcast(t))
        .join(broadcast(ts), "source")
        .join(broadcast(vmin), "source")
        .groupBy("source")
        .agg((sum(length(bin(expr(
          "((t - t_s) + (v - v_gone)) DIV " +
            "(coalesce(c, 0) - coalesce(cs, 0) + 1)"))))
          - count(lit(1))).cast("long").as("bits_minus"))
      eb.join(broadcast(ts), "source")
        .crossJoin(broadcast(fullBits.toDF("bits_full")))
        .select(col("source"), col("t_s").as("removed_tokens"),
          col("bits_full"), col("bits_minus"),
          (col("bits_minus") - col("bits_full")).as("delta_bits"),
          floor((col("bits_minus") - col("bits_full")) * lit(1000000.0) /
            lit(evN.toDouble)).cast("long").as("influence_micro"),
          row_number().over(Window.orderBy(
            (col("bits_minus") - col("bits_full")).desc, col("source")))
            .cast("long").as("rk"))
    })

  /** Temperature-smoothed mixture weights (α = ½): sampling shares
    * ∝ T_s^α — the multilingual-training upsampling rule that keeps
    * big sources from drowning small ones without the hard equality
    * of q230's waterfill (α = 1 is q90's proportional, α → 0 is
    * uniform; ½ is the published sweet spot). The smoothed weight
    * integerizes as ⌊√T_s · 10³⌋ (one sqrt in fixed op order) and
    * seats come from the q90 largest-remainder apportionment — exact
    * integers end to end, with both the raw and smoothed shares
    * reported so the flattening is visible in the output itself. */
  val q251 = QueryDef.sql("q251_temperature_mixture",
    """WITH sup AS (SELECT source,
      |    CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
      |      ELSE length(string_split_regex(trim(text), '\s+')) END)
      |      AS BIGINT) AS t_s
      |  FROM documents GROUP BY 1),
      |w AS (SELECT source, t_s,
      |    CAST(floor(sqrt(CAST(t_s AS DOUBLE)) * 1000) AS BIGINT) AS wt
      |  FROM sup),
      |t AS (SELECT CAST(sum(t_s) AS BIGINT) AS tot,
      |    CAST(sum(wt) AS BIGINT) AS tw FROM w),
      |q AS (SELECT source, t_s, wt,
      |    (wt * 10000) // t.tw AS base, (wt * 10000) % t.tw AS rem
      |  FROM w, t),
      |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source)
      |    AS rr FROM q),
      |s AS (SELECT CAST(sum(base) AS BIGINT) AS sb FROM q)
      |SELECT source, t_s,
      |  CAST(floor(t_s * 1000000.0 / t.tot) AS BIGINT) AS raw_ppm,
      |  CAST(base + CASE WHEN rr <= 10000 - s.sb THEN 1 ELSE 0 END
      |    AS BIGINT) AS seats
      |FROM r, s, t""")(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sup = Tables.documents(s, dir)
        .groupBy("source")
        .agg(sum(when(length(trim(col("text"))) === 0, 0)
          .otherwise(size(split(trim(col("text")), "\\s+"))))
          .cast("long").as("t_s"))
      val w = sup.withColumn("wt",
        floor(sqrt(col("t_s").cast("double")) * 1000).cast("long"))
      val t = w.agg(sum("t_s").as("tot"), sum("wt").as("tw"))
      val q = w.crossJoin(broadcast(t))
        .select(col("source"), col("t_s"), col("wt"), col("tot"),
          expr("(wt * 10000) DIV tw").as("base"),
          expr("(wt * 10000) % tw").as("rem"))
      val sb = q.agg(sum("base").as("sb"))
      // sources frame — bounded global window (q90 idiom)
      q.withColumn("rr", row_number().over(
          Window.orderBy(col("rem").desc, col("source"))))
        .crossJoin(broadcast(sb))
        .select(col("source"), col("t_s"),
          floor(col("t_s") * lit(1000000.0) / col("tot")).cast("long")
            .as("raw_ppm"),
          (col("base") + when(col("rr") <= lit(10000) - col("sb"), 1L)
            .otherwise(0L)).cast("long").as("seats"))
    })

  /** Exact CART decision stump: the single best Gini split of
    * extended price (integer cents) predicting a returned line —
    * the first node every tree ensemble grows, computed exactly at
    * fact scale. Candidate thresholds are DISTINCT SCORES (the
    * q210/q281 marginal compression: cumulative class counts per
    * distinct value via one window — |distinct prices| rows, never
    * |rows| splits), and each split's weighted Gini impurity ships
    * as the sum of two per-side floor-ppm terms (normalized by the
    * total n, so splits compare on identical denominators;
    * deterministic threshold tiebreak). Output: the winning
    * threshold, its child distribution, parent and child impurity —
    * the information a tree builder needs to decide whether the
    * split is worth it. */
  val q308 = QueryDef.sql("q308_gini_stump",
    """WITH b AS (SELECT
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS sc,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem),
      |g AS (SELECT sc, CAST(sum(y) AS BIGINT) AS p,
      |    CAST(count(*) - sum(y) AS BIGINT) AS q
      |  FROM b GROUP BY 1),
      |t AS (SELECT CAST(sum(p) AS BIGINT) AS tp,
      |    CAST(sum(q) AS BIGINT) AS tq FROM g),
      |c AS (SELECT sc,
      |    CAST(sum(p) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cp,
      |    CAST(sum(q) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cq
      |  FROM g),
      |s AS (SELECT c.sc, c.cp, c.cq, t.tp, t.tq,
      |    c.cp + c.cq AS nl, (t.tp - c.cp) + (t.tq - c.cq) AS nr
      |  FROM c, t WHERE c.cp + c.cq > 0
      |    AND (t.tp - c.cp) + (t.tq - c.cq) > 0),
      |i AS (SELECT sc, cp, cq, nl, nr, tp, tq,
      |    ((nl * nl - cp * cp - cq * cq) * 1000000)
      |      // (nl * (tp + tq))
      |    + ((nr * nr - (tp - cp) * (tp - cp) - (tq - cq) * (tq - cq))
      |      * 1000000) // (nr * (tp + tq)) AS gini_ppm
      |  FROM s)
      |SELECT sc AS threshold_cents, nl AS n_left, cp AS pos_left,
      |  nr AS n_right, tp - cp AS pos_right, gini_ppm AS child_gini_ppm,
      |  ((tp + tq) * (tp + tq) - tp * tp - tq * tq) * 1000000
      |    // ((tp + tq) * (tp + tq)) AS parent_gini_ppm
      |FROM i ORDER BY gini_ppm, sc LIMIT 1""")(
    (s, dir) => {
      val b = Tables.lineitem(s, dir).select(
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("sc"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val g = b.groupBy("sc").agg(sum("y").as("p"),
        (count(lit(1)) - sum("y")).as("q"))
      val t = g.agg(sum("p").as("tp"), sum("q").as("tq"))
      // fused two-pass distributed prefix sums (the q210 stance — no
      // single-task window over the distinct-score frame; both running
      // class counts ride ONE range exchange instead of chaining two
      // full globalPrefixSum invocations)
      val c = Rank.globalOrderStats(g,
          Seq("cp" -> "p", "cq" -> "q"), None, col("sc"))
        .select("sc", "cp", "cq")
      val sdf = c.crossJoin(broadcast(t))
        .where(col("cp") + col("cq") > 0 &&
          (col("tp") - col("cp")) + (col("tq") - col("cq")) > 0)
        .withColumn("nl", col("cp") + col("cq"))
        .withColumn("nr",
          (col("tp") - col("cp")) + (col("tq") - col("cq")))
      val i = sdf.withColumn("gini_ppm", expr(giniPpm))
      // argmin as a single struct-min aggregate (field order = the
      // (gini, sc) tiebreak), not a global row_number window
      i.agg(min(struct(col("gini_ppm"), col("sc"), col("nl"),
          col("cp"), col("nr"), (col("tp") - col("cp")).as("pr"),
          expr(parentGiniPpm).as("pg"))).as("b"))
        .select(col("b.sc").as("threshold_cents"),
          col("b.nl").as("n_left"), col("b.cp").as("pos_left"),
          col("b.nr").as("n_right"), col("b.pr").as("pos_right"),
          col("b.gini_ppm").as("child_gini_ppm"),
          col("b.pg").as("parent_gini_ppm"))
    })

  /** One-pass 1R feature ranking — q308's exact Gini stump swept
    * over FOUR numeric features simultaneously (price, quantity,
    * discount, tax, all exact integer-scaled): the fact table is
    * unpivoted once to (feature, score, label), the distinct-score
    * marginals and cumulative class counts run PER FEATURE
    * (feature-partitioned windows — this is the shape that scales to
    * hundreds of features in one pass, where q308's global two-pass
    * handles one giant feature), and each feature reports its best
    * split and impurity decrease. The ranking — which feature would
    * a depth-1 tree pick — is Holte's 1R baseline, exact. */
  val q312 = QueryDef.sql("q312_feature_ranking",
    """WITH b AS (SELECT f.feature, f.sc,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem, LATERAL (VALUES
      |    ('price', CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)),
      |    ('quantity', CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
      |      AS BIGINT)),
      |    ('discount', CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000
      |      AS BIGINT)),
      |    ('tax', CAST(CAST(l_tax AS DECIMAL(18,4)) * 10000
      |      AS BIGINT))) f(feature, sc)),
      |g AS (SELECT feature, sc, CAST(sum(y) AS BIGINT) AS p,
      |    CAST(count(*) - sum(y) AS BIGINT) AS q
      |  FROM b GROUP BY 1, 2),
      |t AS (SELECT feature, CAST(sum(p) AS BIGINT) AS tp,
      |    CAST(sum(q) AS BIGINT) AS tq FROM g GROUP BY 1),
      |c AS (SELECT feature, sc,
      |    CAST(sum(p) OVER o AS BIGINT) AS cp,
      |    CAST(sum(q) OVER o AS BIGINT) AS cq
      |  FROM g WINDOW o AS (PARTITION BY feature ORDER BY sc
      |    ROWS UNBOUNDED PRECEDING)),
      |s AS (SELECT c.feature, c.sc, c.cp, c.cq, t.tp, t.tq,
      |    c.cp + c.cq AS nl, (t.tp - c.cp) + (t.tq - c.cq) AS nr
      |  FROM c JOIN t ON c.feature = t.feature
      |  WHERE c.cp + c.cq > 0
      |    AND (t.tp - c.cp) + (t.tq - c.cq) > 0),
      |i AS (SELECT feature, sc, nl, nr, tp, tq,
      |    ((nl * nl - cp * cp - cq * cq) * 1000000)
      |      // (nl * (tp + tq))
      |    + ((nr * nr - (tp - cp) * (tp - cp) - (tq - cq) * (tq - cq))
      |      * 1000000) // (nr * (tp + tq)) AS gini_ppm
      |  FROM s),
      |best AS (SELECT feature, min(gini_ppm) AS child_gini_ppm,
      |    min(CASE WHEN gini_ppm = mg THEN sc END) AS threshold
      |  FROM (SELECT i.*, min(gini_ppm) OVER (PARTITION BY feature)
      |      AS mg FROM i)
      |  GROUP BY 1),
      |pg AS (SELECT feature,
      |    ((tp + tq) * (tp + tq) - tp * tp - tq * tq) * 1000000
      |      // ((tp + tq) * (tp + tq)) AS parent_gini_ppm
      |  FROM t)
      |SELECT best.feature, best.threshold, best.child_gini_ppm,
      |  pg.parent_gini_ppm,
      |  pg.parent_gini_ppm - best.child_gini_ppm AS decrease_ppm,
      |  CAST(row_number() OVER (ORDER BY
      |    pg.parent_gini_ppm - best.child_gini_ppm DESC, best.feature)
      |    AS BIGINT) AS rk
      |FROM best JOIN pg ON best.feature = pg.feature""")(
    (s, dir) => {
      val b = Tables.lineitem(s, dir).select(
        expr("stack(4," +
          " 'price', CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)," +
          " 'quantity', CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)," +
          " 'discount', CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)," +
          " 'tax', CAST(CAST(l_tax AS DECIMAL(18,4)) * 10000 AS BIGINT)" +
          ") AS (feature, sc)"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val g = b.groupBy("feature", "sc").agg(sum("y").as("p"),
        (count(lit(1)) - sum("y")).as("q"))
      val t = g.groupBy("feature")
        .agg(sum("p").as("tp"), sum("q").as("tq"))
      // keyed two-pass prefix sums: a per-feature window puts EACH
      // feature's whole distinct-score frame through one task (the
      // `price` feature's frame grows with the corpus — ~460k rows at
      // sf0.1, serialized exactly like the partitionless windows this
      // catalog bans); range-exchanging on (feature, sc) spreads a hot
      // feature over many partitions and carries the per-feature
      // offsets through a bounded driver pass
      val c = Rank.keyedPrefixSums(g, Seq("cp" -> "p", "cq" -> "q"),
          Seq("feature"), col("sc"))
        .select("feature", "sc", "cp", "cq")
      val sdf = c.join(broadcast(t), "feature")
        .where(col("cp") + col("cq") > 0 &&
          (col("tp") - col("cp")) + (col("tq") - col("cq")) > 0)
        .withColumn("nl", col("cp") + col("cq"))
        .withColumn("nr",
          (col("tp") - col("cp")) + (col("tq") - col("cq")))
      val i = sdf.withColumn("gini_ppm", expr(giniPpm))
      val best = i.groupBy("feature")
        .agg(min(struct(col("gini_ppm"), col("sc"))).as("bm"))
        .select(col("feature"), col("bm.sc").as("threshold"),
          col("bm.gini_ppm").as("child_gini_ppm"))
      val pg = t.select(col("feature"),
        expr(parentGiniPpm).as("parent_gini_ppm"))
      best.join(pg, "feature")
        .withColumn("decrease_ppm",
          col("parent_gini_ppm") - col("child_gini_ppm"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("decrease_ppm").desc, col("feature")))
          .cast("long"))
    })

  def all: Seq[QueryDef] = Seq(q221, q222, q223, q224, q227, q230, q237,
    q238, q239, q244, q251, q308, q312)
}
