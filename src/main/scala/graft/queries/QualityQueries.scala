package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Entity-resolution blocking ([[graft.operators.Linkage]]) and
  * declared data-quality constraints ([[graft.operators.Profile]]). */
object QualityQueries {

  /** Sorted-neighborhood duplicate-account candidates: customers
    * ordered by (balance, key), each compared to its 5 successors,
    * kept when they share a nation and sit within 1.00 of balance —
    * the classic merge/purge blocking pass at O(n·w) candidate pairs
    * instead of the O(n²) cross join. Distributed form: two-pass
    * global rank (no single-task window) + an EQUI-join on rank slots;
    * the DuckDB oracle replays the neighborhood with a row_number
    * window and a rank-band self-join. Balances compare in exact
    * DECIMAL cents, so the boundary predicate can't straddle an IEEE
    * rounding difference between engines. */
  val q165 = QueryDef.sql("q165_sorted_neighborhood",
    """WITH r AS (SELECT c_custkey, c_nationkey,
      |    CAST(c_acctbal AS DECIMAL(12,2)) AS bal,
      |    row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn
      |  FROM customer)
      |SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
      |  b.rn - a.rn AS rank_gap,
      |  CAST(b.bal * 100 - a.bal * 100 AS BIGINT) AS gap_cents
      |FROM r a JOIN r b
      |  ON b.rn - a.rn BETWEEN 1 AND 5
      |WHERE a.c_nationkey = b.c_nationkey
      |  AND b.bal - a.bal <= CAST(1.00 AS DECIMAL(12,2))""")(
    (s, dir) => {
      import graft.operators.Linkage
      val c = Tables.customer(s, dir).select(
        col("c_custkey"), col("c_nationkey"),
        col("c_acctbal").cast("decimal(12,2)").as("bal"),
        col("c_acctbal"))
      Linkage.sortedNeighborhood(c, 5, col("c_acctbal"), col("c_custkey"))
        .where(col("a_c_nationkey") === col("b_c_nationkey") &&
          col("b_bal") - col("a_bal") <= lit(1.00).cast("decimal(12,2)"))
        .select(col("a_c_custkey").as("a_id"), col("b_c_custkey").as("b_id"),
          col("rank_gap"),
          (col("b_bal") * 100 - col("a_bal") * 100).cast("long")
            .as("gap_cents"))
    })

  /** Declared-constraint evaluation (the Deequ shape): the warehouse
    * intake contract for `orders` — completeness, key uniqueness,
    * value ranges, status domain, date bounds — each a
    * violation-counting aggregate in ONE pass over one scan, plus the
    * cross-table referential check as its own anti-join frame. Output
    * is the audit table a 100 TB intake gate writes per batch:
    * `(constraint, metric, passed)`, all-integer so every cell is
    * exact on any engine. */
  val q166 = QueryDef.sql("q166_constraint_suite",
    """WITH o AS (
      |  SELECT 'orders.o_orderkey.complete' AS "constraint",
      |      count(*) - count(o_orderkey) AS metric FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_orderkey.unique',
      |      count(*) - count(DISTINCT o_orderkey) FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_totalprice.positive',
      |      sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_orderstatus.domain',
      |      sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
      |               THEN 1 ELSE 0 END) FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_orderdate.bounds',
      |      sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
      |               OR o_orderdate >= TIMESTAMP '2000-01-01'
      |               THEN 1 ELSE 0 END) FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_custkey.in.customer',
      |      (SELECT count(*) FROM orders o
      |       WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
      |         (SELECT 1 FROM customer c
      |          WHERE c.c_custkey = o.o_custkey)))
      |SELECT "constraint", CAST(metric AS BIGINT) AS metric,
      |  CAST(CASE WHEN metric <= 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
      |FROM o""")(
    (s, dir) => {
      import graft.operators.Profile
      import graft.operators.Profile.MetricCheck
      val orders = Tables.orders(s, dir)
      val suite = Profile.checkSuite(orders, Seq(
        MetricCheck("orders.o_orderkey.complete",
          count(lit(1)) - count(col("o_orderkey"))),
        MetricCheck("orders.o_orderkey.unique",
          count(lit(1)) - count_distinct(col("o_orderkey"))),
        MetricCheck("orders.o_totalprice.positive",
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))),
        MetricCheck("orders.o_orderstatus.domain",
          sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
            .otherwise(0L))),
        MetricCheck("orders.o_orderdate.bounds",
          sum(when(col("o_orderdate") < to_timestamp(lit("1992-01-01")) ||
            col("o_orderdate") >= to_timestamp(lit("2000-01-01")), 1L)
            .otherwise(0L)))))
      suite.unionByName(Profile.referentialCheck(
        "orders.o_custkey.in.customer",
        orders, "o_custkey",
        broadcast(Tables.customer(s, dir)), "c_custkey"))
    })

  /** Fellegi–Sunter probabilistic record-linkage scoring over a
    * corpus with deterministic re-entered clones (every 4th customer
    * re-appears under a shifted id with a one-character name typo;
    * every 8th additionally drifts its segment — the q28 synthetic-
    * clone stance applied to linkage). Candidates come from the
    * sorted-neighborhood blocking already oracled as q165; each pair
    * is scored by the classic FS log₂(m/u) agreement weights with m
    * fixed at 0.9 and u ESTIMATED FROM THE DATA as the exact chance-
    * agreement rational Σc_v²/n² per field (integer cross products —
    * the u-estimation pass is one value-frequency aggregate, no EM).
    * Name agreement tolerates the suffix typo (levenshtein ≤ 1 AND
    * unequal lengths — sorted neighbors are numerically adjacent
    * `Customer#…` names at levenshtein 1 with EQUAL lengths, so the
    * length clause is what separates typo from neighbor). The match
    * decision is the integer pattern (name ∧ nation agree); the
    * floating score is display-only, rounded to 6. */
  val q228 = QueryDef.sql("q228_fellegi_sunter",
    """WITH c0 AS (SELECT c_custkey AS id, c_name AS name,
      |    c_nationkey AS nat, c_mktsegment AS seg FROM customer),
      |corpus AS (SELECT * FROM c0
      |  UNION ALL
      |  SELECT id + 10000000, name || 'x', nat,
      |    CASE WHEN id % 8 = 0 THEN 'DRIFTED' ELSE seg END
      |  FROM c0 WHERE id % 4 = 0),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM corpus),
      |un AS (SELECT CAST(sum(c * c) AS BIGINT) AS s2 FROM (
      |  SELECT count(*) AS c FROM corpus GROUP BY name)),
      |ut AS (SELECT CAST(sum(c * c) AS BIGINT) AS s2 FROM (
      |  SELECT count(*) AS c FROM corpus GROUP BY nat)),
      |us AS (SELECT CAST(sum(c * c) AS BIGINT) AS s2 FROM (
      |  SELECT count(*) AS c FROM corpus GROUP BY seg)),
      |r AS (SELECT *, row_number() OVER (ORDER BY name, id) AS rn
      |  FROM corpus),
      |p AS (SELECT a.id AS id_a, b.id AS id_b,
      |    (a.name = b.name OR (levenshtein(a.name, b.name) <= 1
      |      AND length(a.name) <> length(b.name))) AS ag_name,
      |    a.nat = b.nat AS ag_nat, a.seg = b.seg AS ag_seg
      |  FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 2)
      |SELECT id_a, id_b, ag_name, ag_nat, ag_seg,
      |  round(
      |    (CASE WHEN ag_name THEN log2(0.9 * n.n * n.n / un.s2)
      |      ELSE log2(0.1 * n.n * n.n / (n.n * n.n - un.s2)) END) +
      |    (CASE WHEN ag_nat THEN log2(0.9 * n.n * n.n / ut.s2)
      |      ELSE log2(0.1 * n.n * n.n / (n.n * n.n - ut.s2)) END) +
      |    (CASE WHEN ag_seg THEN log2(0.9 * n.n * n.n / us.s2)
      |      ELSE log2(0.1 * n.n * n.n / (n.n * n.n - us.s2)) END), 6)
      |    AS fs_score,
      |  (ag_name AND ag_nat) AS is_match
      |FROM p, n, un, ut, us""")(
    (s, dir) => {
      import graft.operators.Linkage
      val c0 = Tables.customer(s, dir).select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"))
      val corpus = c0.unionByName(c0.where(col("id") % 4 === 0).select(
        (col("id") + 10000000L).as("id"),
        concat(col("name"), lit("x")).as("name"), col("nat"),
        when(col("id") % 8 === 0, "DRIFTED").otherwise(col("seg"))
          .as("seg"))).cache()
      val n = corpus.agg(count(lit(1)).as("n"))
      def u(c: String) = corpus.groupBy(col(c)).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as(s"s2_$c"))
      val pairs = Linkage.sortedNeighborhood(corpus, 2,
          col("name"), col("id"))
        .select(col("a_id").as("id_a"), col("b_id").as("id_b"),
          (col("a_name") === col("b_name") ||
            (levenshtein(col("a_name"), col("b_name")) <= 1 &&
              length(col("a_name")) =!= length(col("b_name"))))
            .as("ag_name"),
          (col("a_nat") === col("b_nat")).as("ag_nat"),
          (col("a_seg") === col("b_seg")).as("ag_seg"))
      val n2 = col("n") * col("n")
      def w(flag: String, s2: org.apache.spark.sql.Column) =
        when(col(flag), log2(lit(0.9) * n2 / s2))
          .otherwise(log2(lit(0.1) * n2 / (n2 - s2)))
      val res = pairs.crossJoin(broadcast(n))
        .crossJoin(broadcast(u("name"))).crossJoin(broadcast(u("nat")))
        .crossJoin(broadcast(u("seg")))
        .select(col("id_a"), col("id_b"),
          col("ag_name"), col("ag_nat"), col("ag_seg"),
          round(w("ag_name", col("s2_name")) + w("ag_nat", col("s2_nat")) +
            w("ag_seg", col("s2_seg")), 6).as("fs_score"),
          (col("ag_name") && col("ag_nat")).as("is_match"))
      res
    })

  /** The dataset card ("datasheet") rollup a training corpus publishes
    * per source: document/token/char volumes, language mix (majority
    * language and its share), and the exact-duplicate footprint
    * against the WHOLE corpus (cross-source duplicates count — the
    * number that q181 decomposes). One scan for the per-doc signals;
    * the dup flag is a corpus-wide md5 group count; shares in exact
    * floor-ppm. The composition query every mixture decision (q90/
    * q171/q177/q230) reads first. */
  val q229 = QueryDef.sql("q229_dataset_card",
    """WITH d AS (SELECT source, doc_id, lang, n_chars,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |      ELSE length(string_split_regex(trim(text), '\s+')) END
      |      AS toks,
      |    md5(text) AS h
      |  FROM documents),
      |dup AS (SELECT h, count(*) AS c FROM d GROUP BY h),
      |lg AS (SELECT source, lang, count(*) AS c FROM d GROUP BY 1, 2),
      |top AS (SELECT source, lang AS top_lang, c AS top_c,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY c DESC, lang) AS rk
      |  FROM lg),
      |agg AS (SELECT d.source,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(d.toks) AS BIGINT) AS n_tokens,
      |    CAST(sum(d.n_chars) AS BIGINT) AS n_chars,
      |    CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
      |    CAST(sum(CASE WHEN dup.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS dup_docs
      |  FROM d JOIN dup USING (h) GROUP BY 1)
      |SELECT agg.source, n_docs, n_tokens, n_chars, n_langs,
      |  t.top_lang,
      |  CAST(floor(t.top_c * 1000000.0 / n_docs) AS BIGINT)
      |    AS top_lang_ppm,
      |  dup_docs,
      |  CAST(floor(dup_docs * 1000000.0 / n_docs) AS BIGINT) AS dup_ppm
      |FROM agg JOIN (SELECT * FROM top WHERE rk = 1) t
      |  ON agg.source = t.source""")(
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val d = docs.select(col("source"), col("doc_id"), col("lang"),
        col("n_chars"),
        when(length(trim(col("text"))) === 0, 0)
          .otherwise(size(split(trim(col("text")), "\\s+"))).as("toks"),
        md5(col("text").cast("binary")).as("h")).cache()
      val dup = d.groupBy("h").agg(count(lit(1)).as("c"))
      val lg = d.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      val top = lg.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("source")
            .orderBy(col("c").desc, col("lang"))))
        .where(col("rk") === 1)
        .select(col("source"), col("lang").as("top_lang"),
          col("c").as("top_c"))
      val agg = d.join(dup, "h").groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"),
          sum("n_chars").as("n_chars"),
          count_distinct(col("lang")).as("n_langs"),
          sum(when(col("c") > 1, 1L).otherwise(0L)).as("dup_docs"))
      agg.join(broadcast(top), "source")
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_chars"), col("n_langs"), col("top_lang"),
          floor(col("top_c") * lit(1000000.0) / col("n_docs"))
            .cast("long").as("top_lang_ppm"),
          col("dup_docs"),
          floor(col("dup_docs") * lit(1000000.0) / col("n_docs"))
            .cast("long").as("dup_ppm"))
    })

  /** Character-class (script) mix audit per language slice — the
    * quality gate that catches mislabeled languages, digit dumps and
    * markup-heavy docs before tokenization: per doc, exact counts of
    * Latin letters, digits, whitespace and everything else via
    * length-difference of class-stripped text (pure regexp on
    * codegen'd strings — no per-char explode), then corpus-level
    * ratios per language in floor-ppm of the exact summed counts.
    * Also ships how many docs per slice are digit-heavy (> 20% digits)
    * — the per-doc flag a curation funnel (q74) would gate on. One
    * scan, one aggregate; the regexp work rides the scan. */
  val q294 = QueryDef.sql("q294_script_mix",
    """WITH c AS (SELECT lang,
      |    CAST(length(text) AS BIGINT) AS n,
      |    CAST(length(text) -
      |      length(regexp_replace(text, '[A-Za-z]', '', 'g'))
      |      AS BIGINT) AS latin,
      |    CAST(length(text) -
      |      length(regexp_replace(text, '[0-9]', '', 'g'))
      |      AS BIGINT) AS digits,
      |    CAST(length(text) -
      |      length(regexp_replace(text, '[ \t\n\r]', '', 'g'))
      |      AS BIGINT) AS ws
      |  FROM documents),
      |d AS (SELECT lang, n, latin, digits, ws,
      |    n - latin - digits - ws AS other,
      |    CASE WHEN digits * 5 > n THEN 1 ELSE 0 END AS digit_heavy
      |  FROM c WHERE n > 0)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n) AS BIGINT) AS n_chars,
      |  (CAST(sum(latin) AS BIGINT) * 1000000) // CAST(sum(n) AS BIGINT)
      |    AS latin_ppm,
      |  (CAST(sum(digits) AS BIGINT) * 1000000) // CAST(sum(n) AS BIGINT)
      |    AS digit_ppm,
      |  (CAST(sum(ws) AS BIGINT) * 1000000) // CAST(sum(n) AS BIGINT)
      |    AS ws_ppm,
      |  (CAST(sum(other) AS BIGINT) * 1000000) // CAST(sum(n) AS BIGINT)
      |    AS other_ppm,
      |  CAST(sum(digit_heavy) AS BIGINT) AS digit_heavy_docs
      |FROM d GROUP BY 1""")(
    (s, dir) => {
      val t = col("text")
      def stripped(re: String) =
        (length(t) - length(regexp_replace(t, re, ""))).cast("long")
      val c = Tables.documents(s, dir).select(col("lang"),
          length(t).cast("long").as("n"),
          stripped("[A-Za-z]").as("latin"),
          stripped("[0-9]").as("digits"),
          stripped("[ \t\n\r]").as("ws"))
        .where(col("n") > 0)
        .withColumn("other",
          col("n") - col("latin") - col("digits") - col("ws"))
        .withColumn("digit_heavy",
          when(col("digits") * 5 > col("n"), 1L).otherwise(0L))
      c.groupBy("lang").agg(
        count(lit(1)).as("n_docs"), sum("n").as("n_chars"),
        expr("(sum(latin) * 1000000) DIV sum(n)").as("latin_ppm"),
        expr("(sum(digits) * 1000000) DIV sum(n)").as("digit_ppm"),
        expr("(sum(ws) * 1000000) DIV sum(n)").as("ws_ppm"),
        expr("(sum(other) * 1000000) DIV sum(n)").as("other_ppm"),
        sum("digit_heavy").as("digit_heavy_docs"))
    })

  /** Metadata-conflict audit over exact-duplicate clusters — the
    * survivorship (q93) pre-flight: byte-identical texts SHOULD agree
    * on their metadata; clusters that disagree on source or language
    * are where "keep the canonical doc" silently picks a winner. Per
    * multi-doc md5 cluster: sizes and distinct source/lang counts;
    * plus a single summary row (cluster = 'TOTAL') with corpus-level
    * conflict rates in floor-ppm. One scan, one md5 groupBy, one
    * bounded summary — the cheap audit a curation funnel runs before
    * committing a dedup pass. */
  val q303 = QueryDef.sql("q303_cluster_conflicts",
    """WITH c AS (SELECT md5(text) AS h,
      |    CAST(count(*) AS BIGINT) AS sz,
      |    CAST(count(DISTINCT source) AS BIGINT) AS n_src,
      |    CAST(count(DISTINCT lang) AS BIGINT) AS n_lang,
      |    min(doc_id) AS canon
      |  FROM documents GROUP BY 1),
      |multi AS (SELECT * FROM c WHERE sz >= 2),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS n_multi,
      |    CAST(coalesce(sum(CASE WHEN n_src > 1 THEN 1 ELSE 0 END), 0)
      |      AS BIGINT) AS src_conf,
      |    CAST(coalesce(sum(CASE WHEN n_lang > 1 THEN 1 ELSE 0 END), 0)
      |      AS BIGINT) AS lang_conf
      |  FROM multi)
      |SELECT CAST(canon AS VARCHAR) AS cluster, sz, n_src, n_lang
      |FROM multi
      |UNION ALL
      |SELECT 'TOTAL', s.n_multi,
      |  CASE WHEN s.n_multi = 0 THEN 0
      |    ELSE (s.src_conf * 1000000) // s.n_multi END,
      |  CASE WHEN s.n_multi = 0 THEN 0
      |    ELSE (s.lang_conf * 1000000) // s.n_multi END
      |FROM s""")(
    (s, dir) => {
      val c = Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("sz"),
          countDistinct(col("source")).as("n_src"),
          countDistinct(col("lang")).as("n_lang"),
          min("doc_id").as("canon"))
      val multi = c.where(col("sz") >= 2)
      val sm = multi.agg(count(lit(1)).as("n_multi"),
        coalesce(sum(when(col("n_src") > 1, 1L).otherwise(0L)), lit(0L))
          .as("src_conf"),
        coalesce(sum(when(col("n_lang") > 1, 1L).otherwise(0L)),
          lit(0L)).as("lang_conf"))
      multi.select(col("canon").cast("string").as("cluster"),
          col("sz"), col("n_src"), col("n_lang"))
        .unionByName(sm.select(lit("TOTAL").as("cluster"),
          col("n_multi").as("sz"),
          when(col("n_multi") === 0, 0L)
            .otherwise(expr("(src_conf * 1000000) DIV n_multi"))
            .as("n_src"),
          when(col("n_multi") === 0, 0L)
            .otherwise(expr("(lang_conf * 1000000) DIV n_multi"))
            .as("n_lang")))
    })

  val all: Seq[QueryDef] = Seq(q165, q166, q228, q229, q294, q303)
}
