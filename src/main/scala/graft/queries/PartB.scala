package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining SURVEY §2 Part B operators: approximate distinct counts,
  * map functions (the TOAST-absent-key detection shape), right/full
  * outer joins, and the DBLog stream∪dump merge exercised through
  * [[graft.cdc.CdcApply.mergeSnapshot]].
  */
object PartB {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Per-user next-event pairs (cur, nxt, nxt_us) off one user-keyed
    * lead window — shared by q240 (calibration) and q262 (ECE) so the
    * sequence model's training data cannot drift between them. */
  private def nextTypePairs(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, d, "events")
      .select(col("event_type").as("cur"),
        lead(col("event_type"), 1).over(w).as("nxt"),
        lead(unix_micros(col("ts")), 1).over(w).as("nxt_us"))
      .filter(col("nxt").isNotNull)
      .localCheckpoint() // feeds the train and test aggs
  }

  /** DuckDB CTE twin of [[nextTypePairs]] + the trained per-type
    * purchase-probability table: defines `pairs(cur, nxt, nxt_us)`
    * and `pm(cur, n_train, p_pred_micro)` (train = first half-month,
    * the q240 temporal split). */
  private val nextPairsCte: String =
    """seq AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS nxt,
      |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS nxt_us
      |  FROM events),
      |pairs AS (SELECT event_type AS cur, nxt, nxt_us FROM seq
      |  WHERE nxt IS NOT NULL),
      |tr AS (SELECT cur, CAST(count(*) AS BIGINT) AS n_train,
      |    CAST(sum(CASE WHEN nxt = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS k_tr
      |  FROM pairs WHERE nxt_us < 1705363200000000 GROUP BY cur),
      |pm AS (SELECT cur, n_train,
      |    CAST(k_tr * 1000000 // n_train AS BIGINT) AS p_pred_micro
      |  FROM tr)""".stripMargin

  /** Undirected user co-occurrence edges (x < y, distinct) from shared
    * (event_type, `bucketUs`) buckets — 10-minute buckets give the
    * dense graph q126/q137 analyze; q164's BFS uses 1-minute buckets
    * (a sparse graph with real multi-hop structure). Pairs come from
    * the all_pairs kernel over per-bucket sorted user sets (in-list
    * combinatorics, no bucket self-join). */
  private def coocEdges(s: SparkSession, d: String,
      bucketUs: Long = 600000000L): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, d, "events")
      .select(col("event_type").as("et"),
        expr(s"unix_micros(ts) div $bucketUs").as("b"),
        col("user_id").as("u"))
      .distinct()
      .groupBy(col("et"), col("b"))
      .agg(sort_array(collect_set(col("u"))).as("us"))
      .filter(size(col("us")) >= 2)
      .select(explode(expr("all_pairs(us)")).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .distinct()
  }

  /** DuckDB CTE chain for the z-order bit ladder — shared by the
    * q125 (layout) and q158 (skip-payoff) oracles. Defines
    * `dims(o_orderkey, ck, dy)`, `b(ck0, ck1, dy0, dy1)` and
    * `zz(o_orderkey, ck, dy, z)`. */
  private val zorderZzCte: String =
    """dims AS (SELECT o_orderkey, o_custkey AS ck,
      |    epoch_us(o_orderdate) // 86400000000 AS dy FROM orders),
      |b AS (SELECT min(ck) AS ck0, max(ck) AS ck1,
      |    min(dy) AS dy0, max(dy) AS dy1 FROM dims),
      |sc AS (SELECT o_orderkey, ck, dy,
      |    ((ck - b.ck0) * 65535) // greatest(1, b.ck1 - b.ck0) AS x,
      |    ((dy - b.dy0) * 65535) // greatest(1, b.dy1 - b.dy0) AS y
      |  FROM dims, b),
      |a1 AS (SELECT *, (x|(x<<8))&16711935 AS x1,
      |    (y|(y<<8))&16711935 AS y1 FROM sc),
      |a2 AS (SELECT *, (x1|(x1<<4))&252645135 AS x2,
      |    (y1|(y1<<4))&252645135 AS y2 FROM a1),
      |a3 AS (SELECT *, (x2|(x2<<2))&858993459 AS x3,
      |    (y2|(y2<<2))&858993459 AS y3 FROM a2),
      |a4 AS (SELECT *, (x3|(x3<<1))&1431655765 AS x4,
      |    (y3|(y3<<1))&1431655765 AS y4 FROM a3),
      |zz AS (SELECT o_orderkey, ck, dy, x4 | (y4 << 1) AS z FROM a4)"""
      .stripMargin

  /** Synthetic media payloads over `documents` (magic-byte prefix by
    * doc_id%4 + the text bytes) — shared by q48 (per-row decode) and
    * q174 (frame sampling) so the two multimodal queries exercise the
    * same binary column. Columns: (doc_id, payload). */
  private def mediaPayloads(docs: DataFrame): DataFrame = {
    def magic(bytes: Int*) = lit(bytes.map(_.toByte).toArray)
    docs.select(col("doc_id"),
      concat(
        when(col("doc_id") % 4 === 0, magic(0x89, 'P', 'N', 'G'))
          .when(col("doc_id") % 4 === 1, magic(0xFF, 0xD8, 0xFF))
          .when(col("doc_id") % 4 === 2, magic('R', 'I', 'F', 'F'))
          .otherwise(magic(0x1A, 0x45, 0xDF, 0xA3)),
        col("text").cast("binary")).as("payload"))
  }

  /** DuckDB CTE twin of [[mediaPayloads]] (+ the mime each magic
    * class sniffs to): defines `p(doc_id, payload, mime)`. */
  private val mediaCte: String =
    """p AS (SELECT doc_id,
      |    (CASE CAST(doc_id % 4 AS INTEGER)
      |       WHEN 0 THEN '\x89PNG'::BLOB WHEN 1 THEN '\xFF\xD8\xFF'::BLOB
      |       WHEN 2 THEN 'RIFF'::BLOB ELSE '\x1A\x45\xDF\xA3'::BLOB
      |       END) || encode(text) AS payload,
      |    CASE CAST(doc_id % 4 AS INTEGER)
      |      WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
      |      WHEN 2 THEN 'audio/wav' ELSE 'video/webm' END AS mime
      |  FROM documents)""".stripMargin

  /** DuckDB CTE text for [[coocEdges]] — shared by the q126/q137/q164
    * oracles so the graphs can never drift apart. Defines `e(x,y)`.
    */
  private def coocEdgesCte(bucketUs: Long = 600000000L): String =
    s"""ev AS (SELECT event_type AS et,
      |    epoch_us(ts) // $bucketUs AS b, user_id AS u FROM events),
      |bu AS (SELECT DISTINCT et, b, u FROM ev),
      |e AS (SELECT DISTINCT l.u AS x, r.u AS y FROM bu l
      |  JOIN bu r ON l.et = r.et AND l.b = r.b AND l.u < r.u)""".stripMargin

  /** DuckDB oracle for q186: the k-iteration integer HITS loop
    * unrolled into chained CTEs over the high-volume supplier→part
    * supply graph ([[graft.operators.Hits]]'s max-rescaled fixed-point
    * update, spelled in SQL). */
  private def hitsOracleSql(k: Int): String = {
    val S = graft.operators.PageRank.Scale
    val iters = (1 to k).map { i =>
      s"""a${i}r AS (SELECT e.p, sum(CAST(h.h AS HUGEINT)) AS a
         |  FROM e JOIN h${i - 1} h ON h.s = e.s GROUP BY e.p),
         |a${i}m AS (SELECT max(a) AS m FROM a${i}r),
         |a$i AS (SELECT r.p, CAST((r.a * ${S}) // m.m AS BIGINT) AS a
         |  FROM a${i}r r, a${i}m m),
         |h${i}r AS (SELECT e.s, sum(CAST(a.a AS HUGEINT)) AS h
         |  FROM e JOIN a$i a ON a.p = e.p GROUP BY e.s),
         |h${i}m AS (SELECT max(h) AS m FROM h${i}r),
         |h$i AS (SELECT r.s, CAST((r.h * ${S}) // m.m AS BIGINT) AS h
         |  FROM h${i}r r, h${i}m m)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
       |  FROM lineitem WHERE l_quantity >= 45),
       |h0 AS (SELECT DISTINCT s, CAST($S AS BIGINT) AS h FROM e),
       |$iters
       |SELECT * FROM (
       |  SELECT 'hub' AS side, s AS node, h AS score FROM h$k
       |  ORDER BY h DESC, s LIMIT 10)
       |UNION ALL
       |SELECT * FROM (
       |  SELECT 'auth' AS side, p AS node, a AS score FROM a$k
       |  ORDER BY a DESC, p LIMIT 10)
       |ORDER BY side, score DESC, node""".stripMargin
  }

  /** DuckDB oracle for q137: the 5-iteration integer PageRank loop
    * unrolled into chained CTEs over [[coocEdgesCte]]'s graph. */
  /** DuckDB oracle for q272: the k-round integer PPR loop unrolled —
    * [[pageRankOracleSql]]'s discipline with the teleport vector
    * (seed-restricted, CASE-guarded |S| division) replacing the
    * uniform damping term. */
  private def pprOracleSql(k: Int): String = {
    val S = graft.operators.PageRank.Scale
    val iters = (1 to k).map { i =>
      s"""s$i AS (SELECT d.dst AS u,
         |    CAST((85 * sum(p.r // dg.deg)) // 100 AS BIGINT) AS pr
         |  FROM dir d JOIN p${i - 1} p ON p.u = d.src
         |  JOIN deg dg ON dg.u = d.src
         |  GROUP BY d.dst),
         |p$i AS (SELECT t.u, t.tel + s$i.pr AS r FROM tel t
         |  JOIN s$i ON s$i.u = t.u)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${coocEdgesCte()},
       |dir AS (SELECT x AS src, y AS dst FROM e
       |  UNION ALL SELECT y AS src, x AS dst FROM e),
       |deg AS (SELECT src AS u, CAST(count(*) AS BIGINT) AS deg
       |  FROM dir GROUP BY src),
       |tops AS (SELECT user_id AS u FROM events GROUP BY user_id
       |  ORDER BY count(*) DESC, user_id LIMIT 5),
       |sd AS (SELECT tops.u FROM tops JOIN deg ON deg.u = tops.u),
       |ns AS (SELECT count(*) AS ns FROM sd),
       |tel AS (SELECT deg.u, CASE WHEN sd.u IS NOT NULL
       |    THEN CAST((15 * $S) // (100 * ns) AS BIGINT)
       |    ELSE CAST(0 AS BIGINT) END AS tel
       |  FROM deg CROSS JOIN ns LEFT JOIN sd ON sd.u = deg.u),
       |p0 AS (SELECT u, tel AS r FROM tel),
       |$iters
       |SELECT u, r AS ppr FROM p$k ORDER BY r DESC, u LIMIT 10""".stripMargin
  }

  private def pageRankOracleSql(k: Int): String = {
    val S = 1000000000000L
    val iters = (1 to k).map { i =>
      s"""r$i AS (SELECT d.dst AS u,
         |    CAST((15 * ${S}) // 100
         |      + (85 * sum(r.r // dg.deg)) // 100 AS BIGINT) AS r
         |  FROM dir d JOIN r${i - 1} r ON r.u = d.src
         |  JOIN deg dg ON dg.u = d.src
         |  GROUP BY d.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${coocEdgesCte()},
       |dir AS (SELECT x AS src, y AS dst FROM e
       |  UNION ALL SELECT y AS src, x AS dst FROM e),
       |deg AS (SELECT src AS u, CAST(count(*) AS BIGINT) AS deg
       |  FROM dir GROUP BY src),
       |r0 AS (SELECT u, CAST($S AS BIGINT) AS r FROM deg),
       |$iters
       |SELECT u, r AS rank FROM r$k
       |ORDER BY r DESC, u LIMIT 20""".stripMargin
  }

  val queries: Seq[QueryDef] = Seq(

    // ---- Z-order data layout (Delta/Iceberg OPTIMIZE ZORDER
    //      semantics): min-max-scale two dimensions to 16-bit codes,
    //      interleave them with the native codegen z_interleave16
    //      kernel, and radix-bucket rows by the TOP 4 bits of the
    //      curve — static tiling, fully parallel, NO global sort (a
    //      real layout write is repartitionByRange(z) + sortWithin-
    //      Partitions, whose range sampling this radix report
    //      approximates deterministically). The per-tile min/max
    //      report IS the point of z-order: every tile bounds BOTH
    //      dimensions, which is what makes multi-column file skipping
    //      work. All-integer arithmetic (scaling uses `div`), so the
    //      oracle — the same bit ladder spelled as shift/mask SQL —
    //      matches bit-exactly. Bounds come from one O(1) broadcast
    //      agg, never a driver collect. ----
    QueryDef.sql("q125_zorder_layout",
      s"""WITH $zorderZzCte
        |SELECT CAST(z >> 28 AS INTEGER) AS tile,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(ck) AS min_cust, max(ck) AS max_cust,
        |  min(dy) AS min_day, max(dy) AS max_day,
        |  max(ck) - min(ck) AS cust_width, max(dy) - min(dy) AS day_width
        |FROM zz GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val dims = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("ck"),
          // NTZ → TS is identity under the UTC session TZ
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            .as("dy"))
      val bounds = dims.agg(min(col("ck")).as("ck0"), max(col("ck")).as("ck1"),
        min(col("dy")).as("dy0"), max(col("dy")).as("dy1"))
      dims.crossJoin(broadcast(bounds))
        .select(col("ck"), col("dy"), expr(
          // greatest(1,…): a constant dimension (degenerate input)
          // maps every row to coordinate 0 instead of ANSI-erroring
          """z_interleave16(
            |  ((ck - ck0) * 65535) div greatest(1L, ck1 - ck0),
            |  ((dy - dy0) * 65535) div greatest(1L, dy1 - dy0))"""
            .stripMargin).as("z"))
        .groupBy(shiftright(col("z"), 28).cast("int").as("tile"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("ck")).as("min_cust"), max(col("ck")).as("max_cust"),
          min(col("dy")).as("min_day"), max(col("dy")).as("max_day"))
        .select(col("tile"), col("n_rows"), col("min_cust"), col("max_cust"),
          col("min_day"), col("max_day"),
          (col("max_cust") - col("min_cust")).as("cust_width"),
          (col("max_day") - col("min_day")).as("day_width"))
        .orderBy(col("tile"))
    },

    // ---- Z-order skip-payoff audit — the question q125's layout
    //      exists to answer: for a 2-D range predicate, how many
    //      tiles does min-max pruning actually skip, and what read
    //      amplification remains? The probe is the data-derived
    //      middle quartile of each dimension; tiles touch when their
    //      (min,max) box overlaps it. rows_scanned comes from the
    //      tile stats (NO second corpus scan — exactly how a lake
    //      prunes from footer metadata); rows_matching is the exact
    //      predicate count; read_amp is their exact micro ratio. All
    //      integer arithmetic on positives. ----
    QueryDef.sql("q158_zorder_skip_audit",
      s"""WITH $zorderZzCte,
        |tl AS (SELECT z >> 28 AS tile, CAST(count(*) AS BIGINT) AS n_rows,
        |    min(ck) AS c0, max(ck) AS c1, min(dy) AS d0, max(dy) AS d1
        |  FROM zz GROUP BY 1),
        |pr AS (SELECT b.ck0 + (b.ck1 - b.ck0) // 4 AS clo,
        |    b.ck0 + 3 * (b.ck1 - b.ck0) // 4 AS chi,
        |    b.dy0 + (b.dy1 - b.dy0) // 4 AS dlo,
        |    b.dy0 + 3 * (b.dy1 - b.dy0) // 4 AS dhi FROM b),
        |tt AS (SELECT tl.*, CASE WHEN c1 < pr.clo OR c0 > pr.chi
        |    OR d1 < pr.dlo OR d0 > pr.dhi THEN 0 ELSE 1 END AS touched
        |  FROM tl, pr),
        |mt AS (SELECT CAST(count(*) AS BIGINT) AS rows_matching
        |  FROM dims, pr WHERE ck BETWEEN pr.clo AND pr.chi
        |    AND dy BETWEEN pr.dlo AND pr.dhi)
        |SELECT CAST(count(*) AS BIGINT) AS n_tiles,
        |  CAST(sum(touched) AS BIGINT) AS n_touched,
        |  CAST(sum(n_rows) AS BIGINT) AS rows_total,
        |  CAST(sum(touched * n_rows) AS BIGINT) AS rows_scanned,
        |  (SELECT rows_matching FROM mt) AS rows_matching,
        |  CAST(sum(touched * n_rows) * 1000000
        |    // greatest(1, (SELECT rows_matching FROM mt)) AS BIGINT)
        |    AS read_amp_micro
        |FROM tt""".stripMargin) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val dims = t(s, d, "orders")
        .select(col("o_custkey").as("ck"),
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            .as("dy"))
      val bounds = dims.agg(min(col("ck")).as("ck0"), max(col("ck")).as("ck1"),
        min(col("dy")).as("dy0"), max(col("dy")).as("dy1"))
      val tiles = dims.crossJoin(broadcast(bounds))
        .select(col("ck"), col("dy"), expr(
          """z_interleave16(
            |  ((ck - ck0) * 65535) div greatest(1L, ck1 - ck0),
            |  ((dy - dy0) * 65535) div greatest(1L, dy1 - dy0))"""
            .stripMargin).as("z"))
        .groupBy(shiftright(col("z"), 28).as("tile"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("ck")).as("c0"), max(col("ck")).as("c1"),
          min(col("dy")).as("d0"), max(col("dy")).as("d1"))
      val probe = bounds.select(
        expr("ck0 + (ck1 - ck0) div 4").as("clo"),
        expr("ck0 + 3 * (ck1 - ck0) div 4").as("chi"),
        expr("dy0 + (dy1 - dy0) div 4").as("dlo"),
        expr("dy0 + 3 * (dy1 - dy0) div 4").as("dhi"))
      val mt = dims.crossJoin(broadcast(probe))
        .filter(col("ck").between(col("clo"), col("chi")) &&
          col("dy").between(col("dlo"), col("dhi")))
        .agg(count(lit(1)).as("rows_matching"))
      tiles.crossJoin(broadcast(probe))
        .select(col("n_rows"),
          when(col("c1") < col("clo") || col("c0") > col("chi") ||
            col("d1") < col("dlo") || col("d0") > col("dhi"), 0L)
            .otherwise(1L).as("touched"))
        .agg(count(lit(1)).as("n_tiles"),
          sum(col("touched")).cast("long").as("n_touched"),
          sum(col("n_rows")).cast("long").as("rows_total"),
          sum(col("touched") * col("n_rows")).cast("long")
            .as("rows_scanned"))
        .crossJoin(broadcast(mt))
        .select(col("n_tiles"), col("n_touched"), col("rows_total"),
          col("rows_scanned"), col("rows_matching"),
          expr("""cast(rows_scanned * 1000000
                |div greatest(1L, rows_matching) as bigint)""".stripMargin)
            .as("read_amp_micro"))
    },

    // ---- Relational → corpus document assembly: the denormalized
    //      export that turns OLTP tables into training documents —
    //      each order's lineitems collect into ONE canonical string
    //      (sorted by line number with the full line string as the
    //      tie-break — the synthetic lineitem has duplicate
    //      l_linenumber within an order, so number alone is
    //      nondeterministic; every field exact-integer or verbatim),
    //      and the md5 proves byte-identical assembly
    //      cross-engine. One order-keyed agg + one key join; the
    //      document string is built row-locally and only its hash
    //      and length ship in the report. The CorpusSink export of
    //      these docs is the partitioned-write leg (CorpusSinkSpec).
    //      ----
    QueryDef.sql("q160_doc_assembly",
      """WITH li AS (SELECT l_orderkey, l_linenumber,
        |    'L' || l_linenumber || ':p' || l_partkey
        |      || ':q' || CAST(floor(l_quantity) AS BIGINT)
        |      || ':' || l_returnflag || l_linestatus AS line FROM lineitem),
        |ag AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items,
        |    string_agg(line, '|' ORDER BY l_linenumber, line) AS body
        |  FROM li GROUP BY l_orderkey),
        |dc AS (SELECT o.o_orderkey, ag.n_items,
        |    'O' || o.o_orderkey || ':'
        |      || strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d')
        |      || ':' || o.o_orderpriority || '#' || ag.body AS doc
        |  FROM orders o JOIN ag ON ag.l_orderkey = o.o_orderkey)
        |SELECT o_orderkey, n_items, CAST(length(doc) AS BIGINT)
        |  AS doc_len, md5(doc) AS h
        |FROM dc ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          concat(lit("L"), col("l_linenumber").cast("string"),
            lit(":p"), col("l_partkey").cast("string"),
            lit(":q"), floor(col("l_quantity")).cast("long").cast("string"),
            lit(":"), col("l_returnflag"), col("l_linestatus")).as("line"))
      val ag = li.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          array_join(expr(
            "transform(array_sort(collect_list(struct(l_linenumber, line))), p -> p.line)"),
            "|").as("body"))
      t(s, d, "orders")
        .select(col("o_orderkey").as("l_orderkey"),
          col("o_orderdate"), col("o_orderpriority"))
        .join(ag, "l_orderkey")
        .select(col("l_orderkey").as("o_orderkey"), col("n_items"),
          concat(lit("O"), col("l_orderkey").cast("string"), lit(":"),
            date_format(to_date(col("o_orderdate")), "yyyy-MM-dd"),
            lit(":"), col("o_orderpriority"), lit("#"), col("body"))
            .as("doc"))
        .select(col("o_orderkey"), col("n_items"),
          length(col("doc")).cast("long").as("doc_len"),
          md5(col("doc").cast("binary")).as("h"))
        .orderBy(col("o_orderkey"))
    },

    // ---- k-anonymity audit over quasi-identifiers (nation ×
    //      order-month-of-year × priority) — the privacy gate that
    //      complements q104's PII redaction: any quasi-id group
    //      smaller than k = 10 re-identifies its members and must be
    //      suppressed or generalized before release. Exact counting:
    //      one quasi-id agg + one per-nation rollup. At sf0.01 ≈ 40%
    //      of rows sit in small groups (the counting path is
    //      non-vacuous); at sf0.1 risk goes to ~zero — that contrast
    //      IS the generalization-granularity lesson the audit exists
    //      to teach. ----
    QueryDef.sql("q159_k_anonymity",
      """WITH q AS (SELECT c.c_nationkey AS nat,
        |    CAST(month(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS mo,
        |    o.o_orderpriority AS pri
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |g AS (SELECT nat, mo, pri, CAST(count(*) AS BIGINT) AS n
        |  FROM q GROUP BY nat, mo, pri)
        |SELECT nat, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_small_groups,
        |  CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk,
        |  CAST(sum(n) AS BIGINT) AS n_rows
        |FROM g GROUP BY nat ORDER BY nat""".stripMargin) { (s, d) =>
      val q = t(s, d, "orders")
        .join(t(s, d, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
          "o_custkey")
        .select(col("c_nationkey").as("nat"),
          month(to_date(col("o_orderdate"))).cast("long").as("mo"),
          col("o_orderpriority").as("pri"))
      q.groupBy(col("nat"), col("mo"), col("pri"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("nat"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("n") < 10, 1L).otherwise(0L)).cast("long")
            .as("n_small_groups"),
          sum(when(col("n") < 10, col("n")).otherwise(0L)).cast("long")
            .as("rows_at_risk"),
          sum(col("n")).cast("long").as("n_rows"))
        .orderBy(col("nat"))
    },

    // ---- Declarative data-quality gate (the Deequ-style contract
    //      check a lake runs before promoting a load): five rule
    //      families — null check, domain membership, range, key
    //      uniqueness, referential integrity — evaluated in the
    //      CHEAPEST plan each admits: the row-local rules fold into
    //      ONE conditional-sum scan pass (no per-rule scans), the
    //      uniqueness rule is one key agg, and the FK rule is one
    //      broadcast-able anti-join. Violation counts are exact
    //      BIGINTs. error-severity rules hold 0 on this clean corpus;
    //      the two warn-severity rules FIRE (≈20% each), so the
    //      counting path is non-vacuous by construction. ----
    QueryDef.sql("q140_dq_rules",
      """WITH rowr AS (SELECT
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS r_null,
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS r_domain,
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS r_range,
        |    CAST(sum(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS w_price,
        |    CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS w_prio
        |  FROM orders),
        |uq AS (SELECT CAST(COALESCE(sum(c - 1), 0) AS BIGINT) AS r_unique
        |  FROM (SELECT o_orderkey, count(*) AS c FROM orders
        |    GROUP BY o_orderkey) WHERE c > 1),
        |fk AS (SELECT CAST(count(*) AS BIGINT) AS r_fk FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c
        |    WHERE c.c_custkey = o.o_custkey))
        |SELECT rule, severity, n_violations FROM (
        |  SELECT 'null_custkey' AS rule, 'error' AS severity,
        |    r_null AS n_violations FROM rowr
        |  UNION ALL SELECT 'domain_status', 'error', r_domain FROM rowr
        |  UNION ALL SELECT 'range_totalprice', 'error', r_range FROM rowr
        |  UNION ALL SELECT 'unique_orderkey', 'error', r_unique FROM uq
        |  UNION ALL SELECT 'fk_custkey', 'error', r_fk FROM fk
        |  UNION ALL SELECT 'price_over_400k', 'warn', w_price FROM rowr
        |  UNION ALL SELECT 'priority_unspecified', 'warn', w_prio FROM rowr)
        |ORDER BY rule""".stripMargin) { (s, d) =>
      val orders = t(s, d, "orders")
      val rowr = orders.agg(
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("r_null"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
          .otherwise(0L)).as("r_domain"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("r_range"),
        sum(when(col("o_totalprice") > 400000, 1L).otherwise(0L))
          .as("w_price"),
        sum(when(col("o_orderpriority") === "4-NOT SPECIFIED", 1L)
          .otherwise(0L)).as("w_prio"))
      val uq = orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .agg(coalesce(sum(col("c") - 1), lit(0L)).as("r_unique"))
      val fk = orders.join(t(s, d, "customer")
          .select(col("c_custkey").as("o_custkey")), Seq("o_custkey"),
          "left_anti")
        .agg(count(lit(1)).as("r_fk"))
      val r = rowr.crossJoin(broadcast(uq)).crossJoin(broadcast(fk))
      Seq(("null_custkey", "error", "r_null"),
        ("domain_status", "error", "r_domain"),
        ("range_totalprice", "error", "r_range"),
        ("unique_orderkey", "error", "r_unique"),
        ("fk_custkey", "error", "r_fk"),
        ("price_over_400k", "warn", "w_price"),
        ("priority_unspecified", "warn", "w_prio"))
        .map { case (name, sev, c) => r.select(lit(name).as("rule"),
          lit(sev).as("severity"), col(c).cast("long").as("n_violations")) }
        .reduce(_ unionAll _)
        .orderBy(col("rule"))
    },

    // ---- 3σ anomaly detection in EXACT integer arithmetic: the
    //      monitoring gate every ingest pipeline runs, made oracle-
    //      checkable by clearing the float seam — values floor to
    //      micro-units, and the outlier test (v−μ)² > 9σ² is cross-
    //      multiplied to (v·n − S)² > 9·(n·Q − S²) over DECIMAL(38,0):
    //      no division, no float variance, bit-identical verdicts on
    //      any engine or summation order. One scan-wide agg per group
    //      + a broadcast join back — two passes, the standard shape
    //      (a streaming variant folds S/Q/n as running state). ----
    QueryDef.sql("q139_value_outliers",
      """WITH v AS (SELECT event_id, event_type,
        |    CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(vm AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
        |    CAST(sum(CAST(vm AS DECIMAL(38,0)) * vm) AS DECIMAL(38,0)) AS q
        |  FROM v GROUP BY event_type),
        |o AS (SELECT v.event_type, v.event_id, v.vm, st.n, st.s
        |  FROM v JOIN st ON v.event_type = st.event_type
        |  WHERE CAST((v.vm * st.n - st.s) AS DECIMAL(38,0))
        |      * CAST((v.vm * st.n - st.s) AS DECIMAL(38,0))
        |    > 9 * (st.n * st.q - st.s * st.s))
        |SELECT st.event_type, st.n,
        |  CAST(CAST(st.s AS HUGEINT) // CAST(st.n AS HUGEINT) AS BIGINT)
        |    AS mean_micro,
        |  CAST(COALESCE(oc.n_out, 0) AS BIGINT) AS n_outliers,
        |  COALESCE(oc.out_id_sum, 0) AS out_id_sum
        |FROM st LEFT JOIN (SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS n_out,
        |    CAST(sum(event_id) AS BIGINT) AS out_id_sum
        |  FROM o GROUP BY event_type) oc
        |  ON oc.event_type = st.event_type
        |ORDER BY st.event_type""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .select(col("event_id"), col("event_type"),
          floor(col("value") * 1000000).cast("long").as("vm"))
      val st = v.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("vm").cast("decimal(38,0)")).cast("decimal(38,0)").as("s"),
          sum(col("vm").cast("decimal(38,0)") * col("vm"))
            .cast("decimal(38,0)").as("q"))
      val o = v.join(broadcast(st), "event_type")
        .filter(expr(
          """cast(vm * n - s as decimal(38,0)) * cast(vm * n - s as decimal(38,0))
            |  > 9 * (n * q - s * s)""".stripMargin))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_out"),
          sum(col("event_id")).cast("long").as("out_id_sum"))
      st.join(o, Seq("event_type"), "left")
        .select(col("event_type"), col("n"),
          expr("cast(s div n as bigint)").as("mean_micro"),
          coalesce(col("n_out"), lit(0L)).as("n_outliers"),
          coalesce(col("out_id_sum"), lit(0L)).as("out_id_sum"))
        .orderBy(col("event_type"))
    },

    // ---- Ordered funnel analysis (view → click → purchase): the
    //      event-sequence-matching family (MATCH_RECOGNIZE's most
    //      common instance) computed the scalable way — earliest-
    //      completion semantics as a chain of per-user min-aggs and
    //      user-keyed joins (agg → join ts-after → agg → join), never
    //      a per-user ordered scan. Strictly-after steps (ts >); all
    //      timestamps exact integer µs. Output is the 3-row funnel
    //      report: users reaching each stage and the total time-to-
    //      stage mass. ----
    QueryDef.sql("q135_funnel",
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(epoch_us(ts)) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
        |  GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(epoch_us(ts)) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
        |  GROUP BY e.user_id)
        |SELECT stage, n_users, lag_us_sum FROM (
        |  SELECT 1 AS stage, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(0 AS BIGINT) AS lag_us_sum FROM v
        |  UNION ALL
        |  SELECT 2, CAST(count(*) AS BIGINT),
        |    CAST(sum(c.t2 - v.t1) AS BIGINT)
        |  FROM c JOIN v ON c.user_id = v.user_id
        |  UNION ALL
        |  SELECT 3, CAST(count(*) AS BIGINT),
        |    CAST(sum(p.t3 - v.t1) AS BIGINT)
        |  FROM p JOIN v ON p.user_id = v.user_id)
        |ORDER BY stage""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      def stageMin(tpe: String, after: DataFrame, tCol: String, outCol: String) =
        ev.filter(col("event_type") === tpe)
          .join(after, "user_id")
          .filter(col("us") > col(tCol))
          .groupBy(col("user_id")).agg(min(col("us")).as(outCol))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      val c = stageMin("click", v, "t1", "t2")
      val p = stageMin("purchase", c.select(col("user_id"), col("t2")), "t2", "t3")
      val s1 = v.agg(count(lit(1)).as("n_users"))
        .select(lit(1).as("stage"), col("n_users"),
          lit(0L).as("lag_us_sum"))
      val s2 = c.join(v, "user_id")
        .agg(count(lit(1)).as("n_users"),
          sum(col("t2") - col("t1")).cast("long").as("lag_us_sum"))
        .select(lit(2).as("stage"), col("n_users"), col("lag_us_sum"))
      val s3 = p.join(v, "user_id")
        .agg(count(lit(1)).as("n_users"),
          sum(col("t3") - col("t1")).cast("long").as("lag_us_sum"))
        .select(lit(3).as("stage"), col("n_users"), col("lag_us_sum"))
      s1.unionAll(s2).unionAll(s3).orderBy(col("stage"))
    },

    // ---- Cohort retention matrix: users grouped by first-seen day,
    //      activity counted at each day offset — the longitudinal
    //      engagement report. Two aggs and one join, all user-keyed:
    //      cohort = min-day agg; activity = the (day, user) distinct;
    //      the matrix agg is O(cohorts × offsets) rows. n_active at
    //      offset 0 equals the cohort size by construction. ----
    QueryDef.sql("q136_cohort_retention",
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events),
        |ch AS (SELECT user_id, min(day) AS cohort FROM du GROUP BY user_id),
        |m AS (SELECT ch.cohort, CAST(du.day - ch.cohort AS BIGINT)
        |    AS offset_days, du.user_id
        |  FROM du JOIN ch ON du.user_id = ch.user_id)
        |SELECT cohort, offset_days, CAST(count(*) AS BIGINT) AS n_active
        |FROM m GROUP BY cohort, offset_days
        |ORDER BY cohort, offset_days""".stripMargin) { (s, d) =>
      val du = t(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val ch = du.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
      du.join(ch, "user_id")
        .select(col("cohort"),
          datediff(col("day"), col("cohort")).cast("long").as("offset_days"),
          col("user_id"))
        .groupBy(col("cohort"), col("offset_days"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy(col("cohort"), col("offset_days"))
    },

    // ---- Stream-stream interval join (view → purchase attribution
    //      within 30 minutes per user): Spark's watermarked two-stream
    //      join — each side's state is retained only inside the
    //      watermark horizon and the TIME-RANGE predicate is what lets
    //      the engine evict it (an unbounded-condition stream join
    //      would grow state forever; this is the documented contract).
    //      Inner joins emit matches as they arrive, so no sentinel
    //      flush is needed; the span-derived delay guarantees no
    //      arrival order can late-drop. Two file-source streams over
    //      the same feed (2 files/trigger ⇒ genuinely cross-batch
    //      matches); the oracle is the equivalent BATCH interval join
    //      — the q124 stream-equals-batch discipline applied to the
    //      q66 operator family. ----
    QueryDef.sql("q132_stream_stream_join",
      """WITH v AS (SELECT user_id, event_id AS vid, epoch_us(ts) AS vus
        |  FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS pid, epoch_us(ts) AS pus
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT v.user_id, vid, pid FROM v JOIN p
        |  ON v.user_id = p.user_id AND pus >= vus
        |    AND pus <= vus + 1800000000)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(vid + pid) AS BIGINT) AS id_sum
        |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      val feedDir = graft.bench.BenchFeeds.feed(s, d, "eventssjfeed",
        idCol = "event_id", checkSpan = false)(ev)
      // span-derived watermark delay (the q124 discipline): no file
      // arrival order may drop rows; inner-join emission never waits
      val Array(spanRow) = ev
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).collect()
      val delayUs = (spanRow.getLong(1) - spanRow.getLong(0)) + 3600000000L
      def side(tpe: String, idAs: String, tsAs: String) = s.readStream
        .schema(s.read.parquet(feedDir).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(feedDir)
        .filter(col("event_type") === tpe)
        .select(col("user_id").as(s"${idAs}_u"), col("event_id").as(idAs),
          col("ts").as(tsAs))
        .withWatermark(tsAs, s"$delayUs microseconds")
      // FILE sink (r14 ask #3): joined (view, purchase) pairs are
      // corpus-proportional — they land distributed, not on the driver
      val outDir = graft.bench.BenchFeeds.scratchDir("q132_out")
      val ckDir = graft.bench.BenchFeeds.scratchDir("q132_ck")
      graft.streaming.StreamRun.withStatePartitions(s, 8) {
        val q = side("view", "vid", "vts")
          .join(side("purchase", "pid", "pts"),
            expr("""vid_u = pid_u AND pts >= vts
                   |AND pts <= vts + interval 30 minutes""".stripMargin))
          .select(col("vid_u").as("user_id"), col("vid"), col("pid"))
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckDir)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.read.parquet(outDir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("vid") + col("pid")).cast("long").as("id_sum"))
        .orderBy(col("user_id"))
    },

    // ---- Corpus snapshot diff — the release-over-release audit every
    //      managed lake runs before publishing: full outer join of two
    //      snapshots on the stable key, rows classified added /
    //      removed / changed / unchanged by comparing CONTENT HASHES
    //      (never the text itself across the wire — the md5 rides the
    //      shuffle, not the payload; at 100 TB that is the difference
    //      between a metadata-sized diff and re-shipping the corpus).
    //      Snapshots are simulated deterministically from the corpus:
    //      A = doc_id % 7 != 0, B = everything, with every doc_id % 5
    //      == 0 "revised" in B. One join + one O(status×source) agg.
    //      ----
    QueryDef.sql("q131_snapshot_diff",
      """WITH a AS (SELECT doc_id, source, md5(text) AS h FROM documents
        |  WHERE doc_id % 7 <> 0),
        |b AS (SELECT doc_id, source,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
        |        ELSE text END) AS h FROM documents),
        |j AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        |    COALESCE(a.source, b.source) AS source,
        |    CASE WHEN a.doc_id IS NULL THEN 'added'
        |         WHEN b.doc_id IS NULL THEN 'removed'
        |         WHEN a.h <> b.h THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT source, status, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM j GROUP BY source, status ORDER BY source, status""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val a = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("source"),
          md5(col("text").cast("binary")).as("h"))
      val b = docs.select(col("doc_id"), col("source"),
        md5(when(col("doc_id") % 5 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")).cast("binary")).as("h"))
      a.as("a").join(b.as("b"), col("a.doc_id") === col("b.doc_id"),
          "full_outer")
        .select(
          coalesce(col("a.doc_id"), col("b.doc_id")).as("doc_id"),
          coalesce(col("a.source"), col("b.source")).as("source"),
          when(col("a.doc_id").isNull, "added")
            .when(col("b.doc_id").isNull, "removed")
            .when(col("a.h") =!= col("b.h"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy(col("source"), col("status"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).cast("long").as("id_sum"))
        .orderBy(col("source"), col("status"))
    },

    // ---- Triangle counting on the user co-occurrence graph —
    //      graph analytics over the activity feed (who shares
    //      (event_type, 10-min window) buckets with whom). Edges come
    //      from per-bucket sorted user sets through the all_pairs
    //      kernel (in-list combinatorics, no bucket self-join); the
    //      count is the degree-ORDERED forward algorithm
    //      ([[graft.operators.Triangles]]) whose wedge fan-out is
    //      O(m^1.5) by arboricity instead of Σ deg² — the difference
    //      between finishing and not on power-law co-occurrence
    //      graphs. The oracle is an INDEPENDENT formulation (3-way
    //      a<b<c edge self-join), so the green hash proves the
    //      oriented algorithm exact, not just self-consistent. ----
    QueryDef.sql("q126_triangle_count",
      s"""WITH ${coocEdgesCte()},
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS dg FROM (
        |    SELECT x AS u FROM e UNION ALL SELECT y AS u FROM e)
        |  GROUP BY u),
        |tri AS (SELECT CAST(count(*) AS BIGINT) AS t FROM e e1
        |  JOIN e e2 ON e2.x = e1.y
        |  JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
        |wed AS (SELECT CAST(sum((dg * (dg - 1)) // 2) AS BIGINT) AS w
        |  FROM deg)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        |  (SELECT w FROM wed) AS n_wedges,
        |  (SELECT t FROM tri) AS n_triangles,
        |  round(3.0 * (SELECT t FROM tri) / (SELECT w FROM wed), 6)
        |    AS global_cc""".stripMargin) { (s, d) =>
      graft.operators.Triangles.stats(coocEdges(s, d))
    },

    // ---- PageRank over the co-occurrence graph, 5 fixed iterations
    //      in EXACT INTEGER arithmetic: ranks live in 1e12-unit fixed
    //      point, per-edge contributions are `r div deg` and the damp
    //      is `(15·S) div 100 + (85·Σ) div 100` — integer sums are
    //      associative, so any shuffle order, partitioning, or engine
    //      computes the IDENTICAL ranks (float PageRank cannot be
    //      oracle-checked across engines; this can, bit for bit). The
    //      undirected graph has no dangling nodes (every node has an
    //      edge), so no dangling-mass term. Each iteration is one
    //      edge-keyed join + one dst-keyed agg — the Pregel shape;
    //      plan depth grows linearly over the 5 fixed rounds (an
    //      open-ended solver would checkpoint per round like q69's
    //      CC). ----
    QueryDef.sql("q137_pagerank", pageRankOracleSql(5)) { (s, d) =>
      graft.operators.PageRank.ranks(coocEdges(s, d), 5)
        .orderBy(col("r").desc, col("u")).limit(20)
        .select(col("u"), col("r").as("rank"))
    },

    // ---- approx_count_distinct (HLL++). The sketch is estimator-
    //      specific, so the oracle pins the exact count plus the
    //      estimator's error contract (|apx−exact| ≤ 5·rsd·exact — the
    //      hash check fails if the sketch ever drifts out of bound).
    //      At 100 TB the approx plan aggregates a fixed-size sketch
    //      map-side where count(DISTINCT) would shuffle every key. ----
    QueryDef.sql("q43_approx_distinct",
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS exact_custs,
        |  true AS apx_ok
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      // pre-aggregate to distinct (group, key) pairs map-side, then the
      // exact count is a cheap count(*) and the HLL sketch sees each
      // key once (duplicates never change an HLL estimate) — one wide
      // shuffle instead of count(DISTINCT)'s expand
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"), col("o_custkey")).agg(count(lit(1)))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("exact_custs"),
          approx_count_distinct(col("o_custkey"), 0.01).as("apx"))
        .select(col("o_orderpriority"), col("exact_custs"),
          (abs(col("apx") - col("exact_custs"))
            <= lit(5 * 0.01) * col("exact_custs")).as("apx_ok"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- Mergeable sketch rollup (Apache DataSketches HLL): build
    //      per-(event_type, day) PARTIAL sketches once, then answer
    //      the per-type distinct-user rollup by UNIONING the partials
    //      — never rescanning the raw rows. This is THE incremental
    //      lake pattern for distinct counts: daily partitions
    //      materialize fixed-size sketch binaries, and any coarser
    //      rollup (week, month, all-time) is a cheap union over them.
    //      The checks are estimator-deterministic: apx_ok pins the
    //      flat sketch's error contract against the exact count the
    //      oracle recomputes, merge_ok pins the SAME contract for the
    //      union-of-partials estimate (union is a valid estimator,
    //      not bit-equal to a flat build — at low cardinality the
    //      flat sketch may still answer from coupon mode while the
    //      union has densified, so their estimates legitimately
    //      differ inside the bound). ----
    QueryDef.sql("q95_hll_rollup",
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  true AS merge_ok, true AS apx_ok
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val e = t(s, d, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      val partials = e.groupBy(col("event_type"), col("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = partials.groupBy(col("event_type"))
        .agg(round(hll_sketch_estimate(hll_union_agg(col("sk"))), 6)
          .as("merged_apx"))
      // exact via two-level distinct (the q43 shape) + a flat sketch
      // over the same rows for the merge-consistency check
      val flat = e.groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("exact_users"),
          round(hll_sketch_estimate(hll_sketch_agg(col("user_id"))), 6)
            .as("flat_apx"))
      merged.join(flat, "event_type")
        .select(col("event_type"), col("exact_users"),
          (abs(col("merged_apx") - col("exact_users"))
            <= lit(5 * 0.02) * col("exact_users")).as("merge_ok"),
          (abs(col("flat_apx") - col("exact_users"))
            <= lit(5 * 0.02) * col("exact_users")).as("apx_ok"))
        .orderBy(col("event_type"))
    },

    // ---- Sliding-window distinct users from daily HLL partials —
    //      the mergeable-sketch window trick: a 7-day sliding distinct
    //      NEVER rescans raw rows; it unions the 7 daily partials per
    //      window position. The spine join is O(days×7) SKETCH rows —
    //      metadata-sized at any corpus scale; the raw-row direct leg
    //      exists here only as the audit baseline. Both estimates are
    //      pinned to the exact windowed distinct with q95's error
    //      contract (merge_ok / apx_ok) — NOT to each other:
    //      DataSketches HLL's union result is deterministic but need
    //      not byte-equal a direct sketch once the sparse→dense mode
    //      transition kicks in (observed at sf0.1, 1500 users — the
    //      scale sweep caught an equality assertion here). ----
    QueryDef.sql("q134_sliding_distinct",
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM du),
        |w AS (SELECT d.day, du.user_id FROM days d JOIN du
        |  ON du.day BETWEEN d.day - 6 AND d.day),
        |x AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS exact_users FROM w GROUP BY day)
        |SELECT day, exact_users, true AS merge_ok, true AS apx_ok
        |FROM x ORDER BY day""".stripMargin) { (s, d) =>
      val du = t(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val partials = du.groupBy(col("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val spine = partials.select(col("day").as("wday"))
      val merged = partials.join(spine,
          col("day") >= date_sub(col("wday"), 6) && col("day") <= col("wday"))
        .groupBy(col("wday"))
        .agg(round(hll_sketch_estimate(hll_union_agg(col("sk"))), 6)
          .as("merged_apx"))
      val windowRows = du.join(spine,
        col("day") >= date_sub(col("wday"), 6) && col("day") <= col("wday"))
      val direct = windowRows
        .groupBy(col("wday"), col("user_id")).agg(count(lit(1)))
        .groupBy(col("wday")).agg(count(lit(1)).as("exact_users"))
      val directApx = windowRows.groupBy(col("wday"))
        .agg(round(hll_sketch_estimate(hll_sketch_agg(col("user_id"))), 6)
          .as("direct_apx"))
      merged.join(direct, "wday").join(directApx, "wday")
        .select(col("wday").as("day"), col("exact_users"),
          (abs(col("merged_apx") - col("exact_users"))
            <= lit(5 * 0.02) * col("exact_users")).as("merge_ok"),
          (abs(col("direct_apx") - col("exact_users"))
            <= lit(5 * 0.02) * col("exact_users")).as("apx_ok"))
        .orderBy(col("day"))
    },

    // ---- q95's point is that partials PERSIST: here the per-(type,
    //      day) sketch binaries go through parquet and the rollup runs
    //      over the re-read partials ([[graft.operators.SketchLake]]).
    //      roundtrip_ok pins byte-stability — the union over persisted
    //      partials estimates EXACTLY what the in-plan union does (the
    //      stored sketch is the same bytes) — and merge_ok re-pins the
    //      estimator's error contract against the exact count the
    //      oracle recomputes from raw rows. ----
    QueryDef.sql("q96_hll_persisted",
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  true AS roundtrip_ok, true AS merge_ok
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      import graft.operators.SketchLake
      val e = t(s, d, "events")
        .select(col("event_type"), col("ts"), col("user_id"))
      val dir = graft.bench.BenchFeeds.materialize(s, d, "hllparts")(
        SketchLake.partials(e, Seq("event_type"), "ts", "user_id"))
      val persisted = SketchLake.rollup(s.read.parquet(dir), Seq("event_type"))
        .withColumnRenamed("apx_users", "disk_apx")
      val inPlan = SketchLake.rollup(
        SketchLake.partials(e, Seq("event_type"), "ts", "user_id"),
        Seq("event_type"))
        .withColumnRenamed("apx_users", "mem_apx")
      val exact = e.groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("exact_users"))
      persisted.join(inPlan, "event_type").join(exact, "event_type")
        .select(col("event_type"), col("exact_users"),
          (col("disk_apx") === col("mem_apx")).as("roundtrip_ok"),
          (abs(col("disk_apx") - col("exact_users"))
            <= lit(5 * 0.02) * col("exact_users")).as("merge_ok"))
        .orderBy(col("event_type"))
    },

    // ---- The STREAMING leg of the sketch lake: the events table
    //      replayed as a micro-batched stream, each batch APPENDING
    //      its partial sketches to the partials directory
    //      (SketchLake.streamPartials via foreachBatch), then one
    //      rollup over the persisted partials answers per-type
    //      distinct users. The estimate rides only through a bound
    //      check (the estimator value is partial-granularity-specific;
    //      the CONTRACT is what both engines agree on), so the
    //      oracle-checked claim is: incrementally folded, persisted,
    //      union-rolled-up counts land within the error bound of the
    //      exact answer the oracle recomputes from raw rows. ----
    QueryDef.sql("q97_stream_hll_lake",
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  true AS apx_ok
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      import graft.operators.SketchLake
      val feedDir = graft.bench.BenchFeeds.feed(s, d, "eventfeed",
        idCol = "event_id", checkSpan = false)(
        t(s, d, "events").select(col("event_id"), col("ts"),
          col("event_type"), col("user_id")))
      val partsDir = graft.bench.BenchFeeds.scratchDir("q97_parts")
      val ckDir = graft.bench.BenchFeeds.scratchDir("q97_ck")
      val stream = s.readStream
        .schema(s.read.parquet(feedDir).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(feedDir)
      val q = SketchLake.streamPartials(stream, Seq("event_type"), "ts",
          "user_id", partsDir)
        .option("checkpointLocation", ckDir)
        .start()
      try q.processAllAvailable() finally q.stop()
      val rolled = SketchLake.rollup(s.read.parquet(partsDir),
        Seq("event_type"))
      val exact = t(s, d, "events")
        .groupBy(col("event_type"), col("user_id")).agg(count(lit(1)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("exact_users"))
      rolled.join(exact, "event_type")
        .select(col("event_type"), col("exact_users"),
          (abs(col("apx_users") - col("exact_users"))
            <= lit(5 * 0.02) * col("exact_users")).as("apx_ok"))
        .orderBy(col("event_type"))
    },

    // ---- One-scan column profiling (operators/Profile): the ingest
    //      data-quality gate. Every column's null count, exact
    //      distinct count, min/max and an order-independent DECIMAL
    //      sum come out of ONE aggregate over the table (the
    //      count-distincts share a single Expand), then unpivot to a
    //      row per column — profiling cost is the scan, output is
    //      O(columns). ----
    QueryDef.sql("q101_profile", {
      val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
      cols.map(c =>
        s"""SELECT '$c' AS col_name,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  min($c) AS vmin, max($c) AS vmax,
           |  CAST(sum(CAST($c AS DECIMAL(28,4))) AS DOUBLE) AS vsum
           |FROM lineitem""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    }) { (s, d) =>
      graft.operators.Profile.numeric(t(s, d, "lineitem"),
        Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
        .orderBy(col("col_name"))
    },

    // ---- Quantile sketch lake ([[graft.operators.QuantileLake]]):
    //      SketchLake's sibling for p50/p95 drift monitoring. Per-
    //      (returnflag, ship-day) bottom-k-by-hash partials go through
    //      parquet; the rollup merges the RE-READ partials. The sample
    //      is a deterministic semilattice (bottom-k of a union ==
    //      bottom-k of partial bottom-k's, any merge order), so
    //      roundtrip_ok pins the disk rollup EXACTLY equal to the
    //      in-plan one — the byte-stability KLL/t-digest could not
    //      give. Estimates ride through rank checks: each estimated
    //      quantile's exact straddle rank in the raw data must sit
    //      within DKW ε of its probe (ok_* flags; deterministic, so
    //      green once is green forever). The oracle recomputes the
    //      exact group counts and expects every flag true. ----
    QueryDef.sql("q102_quantile_lake",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  true AS roundtrip_ok,
        |  true AS ok_p25, true AS ok_p50, true AS ok_p75, true AS ok_p95
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      import graft.operators.QuantileLake
      val probes = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75,
        "p95" -> 0.95)
      val eps = 0.06 // DKW bound at k=1024 (see QuantileLake scaladoc)
      val li = t(s, d, "lineitem")
      val dir = graft.bench.BenchFeeds.materialize(s, d, "qlakeparts")(
        QuantileLake.partials(li, Seq("l_returnflag"), "l_shipdate",
          "l_extendedprice", Seq("l_orderkey", "l_linenumber")))
      val disk = QuantileLake.rollup(s.read.parquet(dir),
        Seq("l_returnflag"), probes)
      val mem = QuantileLake.rollup(
        QuantileLake.partials(li, Seq("l_returnflag"), "l_shipdate",
          "l_extendedprice", Seq("l_orderkey", "l_linenumber")),
        Seq("l_returnflag"), probes)
        .select(col("l_returnflag") +:
          probes.map { case (p, _) => col(p).as(s"mem_$p") }: _*)
      // exact straddle ranks of the 4 estimates per flag, one raw scan:
      // the 3×(1+4)-col estimate row broadcasts onto the scan, flags
      // computed as conditional aggregates
      val est = disk.join(mem, "l_returnflag")
      val ranked = li.select(col("l_returnflag"),
          col("l_extendedprice").cast("double").as("v"))
        .join(broadcast(est), "l_returnflag")
        .groupBy(col("l_returnflag"), col("n_sample"))
        .agg(count(lit(1)).as("n"), probes.flatMap { case (p, _) => Seq(
          (sum(when(col("v") < col(p), 1L).otherwise(0L)) /
            count(lit(1))).as(s"lo_$p"),
          (sum(when(col("v") <= col(p), 1L).otherwise(0L)) /
            count(lit(1))).as(s"hi_$p"),
          first(col(p) === col(s"mem_$p")).as(s"rt_$p"))
        }: _*)
      // ok: the estimate's value straddles the probe rank within ε —
      // count(v < est)/n ≤ q+ε and count(v ≤ est)/n ≥ q−ε (two-sided
      // so ties, e.g. a discrete value mass at the quantile, pass
      // exactly when a correct estimator should)
      ranked.select(col("l_returnflag") +: col("n") +:
          probes.map { case (p, _) => col(s"rt_$p") }
            .reduce(_ && _).as("roundtrip_ok") +:
          probes.map { case (p, q) =>
            ((col(s"lo_$p") <= lit(q + eps)) &&
              (col(s"hi_$p") >= lit(q - eps))).as(s"ok_$p") }: _*)
        .orderBy(col("l_returnflag"))
    },

    // ---- The STREAMING leg of the quantile lake (q97's analog for
    //      q102): events replayed as a micro-batched stream, each
    //      batch APPENDING its bottom-k partials
    //      (QuantileLake.streamPartials via foreachBatch), then one
    //      rollup over the persisted partials answers per-type value
    //      quantiles. Because the sample is a deterministic
    //      semilattice, the oracle-checked claim is STRONGER than
    //      q97's error bound: stream_eq_batch pins the streamed rollup
    //      EXACTLY equal to a flat batch build over raw rows (batches
    //      cover disjoint ids, so the merged sample is bit-identical),
    //      and the ok_* flags re-pin the DKW rank contract against
    //      exact straddle ranks. ----
    QueryDef.sql("q103_stream_quantile_lake",
      """SELECT event_type, CAST(count(value) AS BIGINT) AS n,
        |  true AS stream_eq_batch, true AS ok_p50, true AS ok_p95
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      import graft.operators.QuantileLake
      val probes = Seq("p50" -> 0.5, "p95" -> 0.95)
      val eps = 0.06 // DKW bound at k=1024 (see QuantileLake scaladoc)
      val ev = t(s, d, "events")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      val feedDir = graft.bench.BenchFeeds.feed(s, d, "eventvfeed",
        idCol = "event_id", checkSpan = false)(ev)
      val partsDir = graft.bench.BenchFeeds.scratchDir("q103_parts")
      val ckDir = graft.bench.BenchFeeds.scratchDir("q103_ck")
      val stream = s.readStream
        .schema(s.read.parquet(feedDir).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(feedDir)
      val q = QuantileLake.streamPartials(stream, Seq("event_type"), "ts",
          "value", Seq("event_id"), partsDir)
        .option("checkpointLocation", ckDir)
        .start()
      try q.processAllAvailable() finally q.stop()
      val streamed = QuantileLake.rollup(s.read.parquet(partsDir),
        Seq("event_type"), probes)
      val batch = QuantileLake.rollup(
        QuantileLake.partials(ev, Seq("event_type"), "ts", "value",
          Seq("event_id")),
        Seq("event_type"), probes)
        .select(col("event_type") +:
          probes.map { case (p, _) => col(p).as(s"b_$p") }: _*)
      val est = streamed.join(batch, "event_type")
      val ranked = ev.filter(col("value").isNotNull)
        .select(col("event_type"), col("value").as("v"))
        .join(broadcast(est), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), probes.flatMap { case (p, _) => Seq(
          (sum(when(col("v") < col(p), 1L).otherwise(0L)) /
            count(lit(1))).as(s"lo_$p"),
          (sum(when(col("v") <= col(p), 1L).otherwise(0L)) /
            count(lit(1))).as(s"hi_$p"),
          first(col(p) === col(s"b_$p")).as(s"eq_$p"))
        }: _*)
      ranked.select(col("event_type") +: col("n") +:
          probes.map { case (p, _) => col(s"eq_$p") }
            .reduce(_ && _).as("stream_eq_batch") +:
          probes.map { case (p, q0) =>
            ((col(s"lo_$p") <= lit(q0 + eps)) &&
              (col(s"hi_$p") >= lit(q0 - eps))).as(s"ok_$p") }: _*)
        .orderBy(col("event_type"))
    },

    // ---- Map functions: build a column-map per row and detect
    //      present/absent keys — exactly how a consumer detects
    //      unchanged-TOAST columns in the CDC envelope (absent key ≠
    //      null value; SURVEY §1.3 nulls & TOAST). ----
    QueryDef.sql("q44_map_funcs",
      """SELECT event_id,
        |  CAST(cardinality(m) AS INTEGER) AS n_cols,
        |  list_contains(map_keys(m), 'value') AS has_value,
        |  m['type'][1] AS type_val
        |FROM (SELECT event_id,
        |        CASE WHEN value >= 10
        |          THEN map(['type','uid','value'],
        |               [event_type, CAST(user_id AS VARCHAR), CAST(value AS VARCHAR)])
        |          ELSE map(['type','uid'],
        |               [event_type, CAST(user_id AS VARCHAR)]) END AS m
        |      FROM events)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .withColumn("m",
          when(col("value") >= 10,
            map(lit("type"), col("event_type"), lit("uid"),
              col("user_id").cast("string"), lit("value"),
              col("value").cast("string")))
            .otherwise(map(lit("type"), col("event_type"), lit("uid"),
              col("user_id").cast("string"))))
        .select(col("event_id"),
          size(col("m")).as("n_cols"),
          array_contains(map_keys(col("m")), "value").as("has_value"),
          element_at(col("m"), "type").as("type_val"))
        .orderBy(col("event_id"))
    },

    // ---- Right outer join (kept right-shaped in the plan; Catalyst
    //      may flip build sides but null-extension semantics are the
    //      oracle-checked part) ----
    QueryDef.sql("q45_right_outer",
      """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_mktsegment
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    },

    // ---- Full outer join: table diff across two filtered change sets
    //      (sync-verification shape from SURVEY §2B set ops) ----
    QueryDef.sql("q46_full_outer",
      """WITH u AS (SELECT o_custkey AS k, count(*) AS c FROM orders
        |           WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        |l AS (SELECT o_custkey AS k, count(*) AS c FROM orders
        |      WHERE o_orderpriority = '5-LOW' GROUP BY 1)
        |SELECT coalesce(u.k, l.k) AS custkey,
        |  coalesce(u.c, 0) AS urgent_cnt, coalesce(l.c, 0) AS low_cnt
        |FROM u FULL OUTER JOIN l ON u.k = l.k
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders")
      val u = o.filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey").as("uk")).agg(count(lit(1)).as("uc"))
      val l = o.filter(col("o_orderpriority") === "5-LOW")
        .groupBy(col("o_custkey").as("lk")).agg(count(lit(1)).as("lc"))
      u.join(l, col("uk") === col("lk"), "full_outer")
        .select(coalesce(col("uk"), col("lk")).as("custkey"),
          coalesce(col("uc"), lit(0)).as("urgent_cnt"),
          coalesce(col("lc"), lit(0)).as("low_cnt"))
        .orderBy(col("custkey"))
    },

    // ---- Sliding event-time windows (2h length, 1h slide): each event
    //      lands in two overlapping windows — Spark's window() with a
    //      slide duration; the oracle materializes the same assignment
    //      by unioning both candidate window starts per event. ----
    QueryDef.sql("q51_sliding_window",
      """WITH w AS (
        |  SELECT CAST(ws AS TIMESTAMP) AS window_start, event_type, value
        |  FROM events, unnest([date_trunc('hour', ts),
        |                       date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS u(ws))
        |SELECT window_start, event_type, count(*) AS cnt,
        |  round(sum(value), 2) AS sum_value
        |FROM w GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").cast("timestamp_ntz").as("window_start"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    },

    // ---- Multimodal: binary payload column + typed metadata; mime
    //      sniffed from magic bytes inside the scan projection; the
    //      (stubbed, deterministic) decode kernel runs per-partition
    //      through the batched mapPartitions path — the oracle pins the
    //      whole pipeline end to end. ----
    QueryDef.sql("q48_multimodal",
      s"""WITH $mediaCte
        |SELECT doc_id, mime,
        |  CAST(octet_length(payload) AS INTEGER) AS n_bytes,
        |  CAST(16 + octet_length(payload) % 64 AS INTEGER) AS width,
        |  CAST(16 + (octet_length(payload) // 64) % 64 AS INTEGER) AS height,
        |  CAST(CAST((CASE CAST(doc_id % 4 AS INTEGER)
        |    WHEN 0 THEN 137 WHEN 1 THEN 255
        |    WHEN 2 THEN 82 ELSE 26 END) / 255.0 AS FLOAT) AS DOUBLE) AS feat0
        |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.multimodal.Multimodal
      val media = mediaPayloads(t(s, d, "documents"))
      val meta = media.select(col("doc_id"),
        Multimodal.sniffMime(col("payload")).as("mime"),
        octet_length(col("payload")).as("n_bytes"))
      val feats = Multimodal.extractFeatures(media.as[Multimodal.MediaRow])
        .toDF().select(col("doc_id"), col("width"), col("height"),
          element_at(col("features"), 1).cast("double").as("feat0"))
      meta.join(feats, "doc_id")
        .select(col("doc_id"), col("mime"), col("n_bytes"), col("width"),
          col("height"), col("feat0"))
        .orderBy(col("doc_id"))
    },

    // ---- Multimodal frame sampling (the ONE-TO-MANY media transform
    //      q48's per-row decode doesn't exercise): every payload emits
    //      4 stride-sampled 16-byte frames through the REAL
    //      Multimodal.sampleFrames operator — the explode-per-sample
    //      plumbing a video pipeline runs, with the frame content
    //      itself pinned (hex digests, so the oracle checks the BYTES
    //      extracted, not just the counts). DuckDB cannot slice BLOBs,
    //      so the oracle slices the hex expansion at 2·offset — the
    //      same bytes by construction. Frames near the payload tail
    //      run short; frame_bytes counts what was actually read. ----
    QueryDef.sql("q174_frame_sample",
      s"""WITH $mediaCte,
        |f AS (SELECT doc_id, mime,
        |    CAST(floor(fn * greatest(octet_length(payload), 1) / 4)
        |      AS BIGINT) AS off, payload
        |  FROM p, (SELECT unnest(range(4)) AS fn)),
        |fr AS (SELECT mime,
        |    substring(hex(payload), CAST(2 * off + 1 AS INTEGER), 32) AS fh
        |  FROM f)
        |SELECT mime, CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(count(DISTINCT fh) AS BIGINT) AS n_distinct_frames,
        |  CAST(sum(length(fh) // 2) AS BIGINT) AS frame_bytes
        |FROM fr GROUP BY mime ORDER BY mime""".stripMargin) { (s, d) =>
      import graft.multimodal.Multimodal
      Multimodal.sampleFrames(mediaPayloads(t(s, d, "documents")),
          "payload", nFrames = 4)
        .select(Multimodal.sniffMime(col("payload")).as("mime"),
          hex(col("frame")).as("fh"))
        .groupBy(col("mime"))
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(col("fh")).as("n_distinct_frames"),
          sum(length(col("fh")).cast("long") / 2).cast("long")
            .as("frame_bytes"))
        .orderBy(col("mime"))
    },

    // ---- DBLog stream∪dump merge (A25/A27): a full dump of the
    //      customer table rides in as op=UPDATE rows with lsn=0, the
    //      live events feed carries real checkpoints; latest-wins per
    //      key with DELETE dropping the row — dump rows only surface
    //      for keys with no live change (gateway semantics,
    //      pkg/dblog/gateway.go:113-217). ----
    QueryDef.sql("q47_merge_snapshot",
      """WITH live AS (
        |  SELECT user_id, event_id + 1 AS lsn, value,
        |    CASE event_type WHEN 'signup' THEN 'INSERT'
        |                    WHEN 'error' THEN 'DELETE'
        |                    ELSE 'UPDATE' END AS op
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) = 1)
        |SELECT c.c_custkey AS key, coalesce(l.lsn, 0) AS lsn,
        |  round(CASE WHEN l.user_id IS NULL THEN c.c_acctbal
        |        ELSE l.value END, 2) AS value
        |FROM customer c LEFT JOIN live l ON c.c_custkey = l.user_id
        |WHERE l.op IS NULL OR l.op <> 'DELETE'
        |ORDER BY key""".stripMargin) { (s, d) =>
      val dump = t(s, d, "customer").select(
        col("c_custkey").as("key"), lit("UPDATE").as("op"),
        col("c_acctbal").as("value"), lit(0L).as("lsn"), lit(0).as("seq"))
      val live = t(s, d, "events").select(
        col("user_id").as("key"),
        when(col("event_type") === "signup", "INSERT")
          .when(col("event_type") === "error", "DELETE")
          .otherwise("UPDATE").as("op"),
        col("value"), (col("event_id") + 1).as("lsn"), lit(1).as("seq"))
      graft.cdc.CdcApply.mergeSnapshot(dump, live,
          keyCols = Seq("key"), orderCols = Seq("lsn", "seq"))
        .select(col("key"), col("lsn"), round(col("value"), 2).as("value"))
        .orderBy(col("key"))
    },

    // ---- Exact percentiles (median / p90), linear interpolation on
    //      both engines; rounding rides the decimal path (q27 rule).
    //      Exactness is the oracle contract here — at lake scale the
    //      plan swaps percentile() for approx_percentile(), which
    //      aggregates a fixed-size sketch map-side instead of
    //      buffering every group value. ----
    QueryDef.sql("q53_percentiles",
      """SELECT l_returnflag,
        |  CAST(round(CAST(quantile_cont(l_extendedprice, 0.5) AS DECIMAL(25,10)), 4) AS DOUBLE) AS p50,
        |  CAST(round(CAST(quantile_cont(l_extendedprice, 0.9) AS DECIMAL(25,10)), 4) AS DOUBLE) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)").cast("decimal(25,10)"), 4)
            .cast("double").as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)").cast("decimal(25,10)"), 4)
            .cast("double").as("p90"))
        .orderBy(col("l_returnflag"))
    },

    // ---- approx_percentile, the lake-scale swap q53 documents, made
    //      oracle-checkable the q43 way: the sketch value is estimator-
    //      specific, so the result carries the EXACT percentiles plus a
    //      boolean asserting the approximation landed inside its rank-
    //      error contract (accuracy 100 ⇒ rank error ≤ n/100 ⇒ value
    //      within the exact quantiles at p ± 0.02). The approx plan
    //      aggregates a fixed-size sketch map-side — no per-group value
    //      buffering, which is what kills exact percentile at 100 TB. ----
    QueryDef.sql("q65_approx_percentile",
      """SELECT l_returnflag,
        |  CAST(round(CAST(quantile_cont(l_extendedprice, 0.5) AS DECIMAL(25,10)), 4) AS DOUBLE) AS p50_exact,
        |  true AS p50_ok, true AS p90_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // ONE exact-percentile buffer (array form: one sort, five reads)
      // and ONE approx sketch — not seven independent aggregates
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, array(0.5, 0.48, 0.52, 0.88, 0.92))").as("ex"),
          expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 100)").as("ap"))
        .select(col("l_returnflag"),
          round(element_at(col("ex"), 1).cast("decimal(25,10)"), 4)
            .cast("double").as("p50_exact"),
          element_at(col("ap"), 1)
            .between(element_at(col("ex"), 2), element_at(col("ex"), 3)).as("p50_ok"),
          element_at(col("ap"), 2)
            .between(element_at(col("ex"), 4), element_at(col("ex"), 5)).as("p90_ok"))
        .orderBy(col("l_returnflag"))
    },

    // ---- Edit distance (levenshtein is a built-in on both engines —
    //      integer-exact, no rounding concerns): the fuzzy-string leg
    //      of text dedup alongside the n-gram/sketch paths. ----
    QueryDef.sql("q54_edit_distance",
      """SELECT event_type,
        |  CAST(levenshtein(event_type, 'signup') AS INTEGER) AS dist,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"),
          levenshtein(col("event_type"), lit("signup")).as("dist"), col("n"))
        .orderBy(col("event_type"))
    },

    // ---- Pivot (wide aggregation): one column per event type with an
    //      EXPLICIT value list — the values-known form compiles to a
    //      single pass of conditional aggregates (exactly the oracle's
    //      CASE sums), no extra distinct-values job and no shuffle
    //      beyond the group-by. coalesce(0) because pivot leaves empty
    //      cells null where the CASE sum yields 0. ----
    QueryDef.sql("q55_pivot",
      """SELECT CAST(user_id % 4 AS BIGINT) AS cohort,
        |  CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = t(s, d, "events")
        .groupBy((col("user_id") % 4).as("cohort"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      wide.select(col("cohort") +:
        types.map(tp => coalesce(col(tp), lit(0L)).as(tp)): _*)
        .orderBy(col("cohort"))
    },

    // ---- Distribution window functions: ntile / percent_rank /
    //      cume_dist (rank-based, frame-free) and first/nth value over
    //      an explicit running frame. percent_rank and cume_dist are
    //      exact integer ratios, so the doubles match bit-for-bit
    //      across engines without rounding games. ----
    QueryDef.sql("q56_window_distribution",
      """SELECT o_orderkey, o_orderpriority,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  first_value(o_orderkey) OVER wf AS first_k,
        |  nth_value(o_orderkey, 3) OVER wf AS third_k
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey),
        |  wf AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first(col("o_orderkey")).over(wf).as("first_k"),
          nth_value(col("o_orderkey"), 3).over(wf).as("third_k"))
        .orderBy(col("o_orderkey"))
    },

    // ---- AS-OF join, Spark-first: tag both sides, union, and take the
    //      last right-side value at or before each left row with an
    //      ignoreNulls last() over a (key, time)-ordered running frame.
    //      ONE shuffle on the key, one in-partition sort — no range
    //      join, no per-row probe, and unlike a windowed range join the
    //      state per key is a single running value. The oracle is
    //      DuckDB's native ASOF LEFT JOIN, so the semantics (greatest
    //      right time <= left time, per key; unmatched -> NULL) are
    //      pinned by an independent implementation. Event times are
    //      synthesized into the orders era deterministically so the
    //      two time lines genuinely interleave. ----
    QueryDef.sql("q57_asof_join",
      """WITH od AS (SELECT o_custkey AS k, CAST(o_orderdate AS TIMESTAMP) AS t,
        |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,10))), 2) AS DOUBLE) AS day_total
        |  FROM orders GROUP BY 1, 2),
        |ev AS (SELECT event_id, user_id,
        |    CAST(DATE '1995-01-01' + CAST(event_id % 2400 AS INTEGER) AS TIMESTAMP) AS t
        |  FROM events)
        |SELECT ev.event_id, ev.user_id, od.day_total AS asof_total
        |FROM ev ASOF LEFT JOIN od ON ev.user_id = od.k AND ev.t >= od.t
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val od = t(s, d, "orders")
        .groupBy(col("o_custkey").as("k"),
          col("o_orderdate").cast("timestamp_ntz").as("t"))
        .agg(round(sum(col("o_totalprice").cast("decimal(25,10)")), 2)
          .cast("double").as("day_total"))
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id").as("k"),
          date_add(lit("1995-01-01").cast("date"),
            (col("event_id") % 2400).cast("int"))
            .cast("timestamp_ntz").as("t"))
      graft.operators.AsOfJoin
        .lastAtOrBefore(ev, od, keyCol = "k", timeCol = "t",
          valueCols = Seq("day_total"))
        .select(col("event_id"), col("k").as("user_id"),
          col("day_total").as("asof_total"))
        .orderBy(col("event_id"))
    },

    // ---- String aggregation + regexp extraction: ordered string_agg
    //      of a top-k-per-group (sorted collect on the Spark side =
    //      ORDER BY inside DuckDB's string_agg), and regexp_extract of
    //      the numeric id embedded in c_name. ----
    QueryDef.sql("q58_string_agg",
      """WITH r AS (SELECT c_mktsegment AS seg,
        |    CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS name_id,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |SELECT seg, CAST(count(*) AS BIGINT) AS n,
        |  string_agg(CAST(name_id AS VARCHAR), ',' ORDER BY name_id) AS top_ids
        |FROM r WHERE rn <= 5 GROUP BY seg ORDER BY seg""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .select(col("c_mktsegment").as("seg"),
          regexp_extract(col("c_name"), "Customer#(\\d+)", 1)
            .cast("long").as("name_id"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 5)
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"),
          concat_ws(",",
            sort_array(collect_list(col("name_id"))).cast("array<string>"))
            .as("top_ids"))
        .orderBy(col("seg"))
    },

    // ---- Correlated subqueries through Spark SQL itself: a scalar
    //      subquery (per-order max line price) plus a correlated EXISTS
    //      — Catalyst decorrelates both into aggregate+join shapes (the
    //      scalar one becomes a left outer join on a pre-aggregated
    //      lineitem, EXISTS a left semi join), so the executed plan has
    //      NO per-row probing: two shuffles on l_orderkey at any scale.
    //      The oracle runs the very same SQL text on DuckDB. ----
    QueryDef.sql("q60_correlated_subquery",
      """SELECT o.o_orderkey, o.o_totalprice,
        |  (SELECT max(l.l_extendedprice) FROM lineitem l
        |     WHERE l.l_orderkey = o.o_orderkey) AS max_line_price
        |FROM orders o
        |WHERE o.o_totalprice > 400000
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = o.o_orderkey AND l2.l_returnflag = 'R')
        |ORDER BY o.o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders").createOrReplaceTempView("orders_q60")
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_q60")
      s.sql("""SELECT o.o_orderkey, o.o_totalprice,
        (SELECT max(l.l_extendedprice) FROM lineitem_q60 l
           WHERE l.l_orderkey = o.o_orderkey) AS max_line_price
      FROM orders_q60 o
      WHERE o.o_totalprice > 400000
        AND EXISTS (SELECT 1 FROM lineitem_q60 l2
          WHERE l2.l_orderkey = o.o_orderkey AND l2.l_returnflag = 'R')
      ORDER BY o.o_orderkey""")
    },

    // ---- Dense date spine (calendar fill): sequence() + explode
    //      generates the day dimension from the data's own bounds, then
    //      a left join zero-fills gap days. The fact side aggregates
    //      BEFORE the join to one row per day, and THAT side broadcasts
    //      (a LeftOuter join can only build/broadcast its right side —
    //      hinting the preserved spine would be silently ignored), so
    //      the only wide shuffle is the per-day group-by. DuckDB's
    //      generate_series is the oracle. ----
    QueryDef.sql("q61_date_spine",
      """WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo,
        |    CAST(max(o_orderdate) AS DATE) AS hi FROM orders),
        |days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |per AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n,
        |    round(sum(CAST(o_totalprice AS DECIMAL(25,10))), 2) AS rev FROM orders GROUP BY 1)
        |SELECT d.day, CAST(coalesce(p.n, 0) AS BIGINT) AS n_orders,
        |  CAST(coalesce(p.rev, 0) AS DOUBLE) AS revenue
        |FROM days d LEFT JOIN per p ON d.day = p.day ORDER BY d.day""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders")
        .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      val days = o.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val per = o.groupBy(col("day"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(25,10)")), 2).as("rev"))
      days.join(broadcast(per), Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n_orders"),
          coalesce(col("rev"), lit(0)).cast("double").as("revenue"))
        .orderBy(col("day"))
    },

    // ---- Time-RANGE window frames: a rolling 1-hour per-user window
    //      keyed on exact epoch microseconds — value-based (RANGE)
    //      frames, unlike q11's row-based ones: peers at the same
    //      instant share a frame, and the frame width is wall-clock,
    //      not row count. One shuffle on user_id; running-frame sums
    //      are incremental per partition. The rolling sum rides the
    //      decimal path (q27 rounding rule). ----
    QueryDef.sql("q64_range_frame",
      """SELECT event_id, user_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(round(sum(CAST(value AS DECIMAL(25,10))) OVER w, 4) AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600000000L, 0L)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          unix_micros(col("ts")).as("us"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_1h"),
          round(sum(col("value").cast("decimal(25,10)")).over(w), 4)
            .cast("double").as("sum_1h"))
        .orderBy(col("event_id"))
    },

    // ---- UNPIVOT (melt): wide per-measure aggregates back to long
    //      (measure, value) rows — q55's inverse. Spark's unpivot is a
    //      Generate over the aggregated (tiny) side: the wide shuffle
    //      is the group-by; the melt itself is a projection. ----
    QueryDef.sql("q67_unpivot",
      """WITH agg AS (SELECT l_returnflag,
        |    CAST(round(sum(CAST(l_quantity AS DECIMAL(25,10))), 2) AS DOUBLE) AS quantity,
        |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,10))), 2) AS DOUBLE) AS extendedprice,
        |    CAST(round(sum(CAST(l_discount AS DECIMAL(25,10))), 2) AS DOUBLE) AS discount,
        |    CAST(round(sum(CAST(l_tax AS DECIMAL(25,10))), 2) AS DOUBLE) AS tax
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, measure, total
        |FROM (UNPIVOT agg ON quantity, extendedprice, discount, tax
        |      INTO NAME measure VALUE total)
        |ORDER BY l_returnflag, measure""".stripMargin) { (s, d) =>
      def m(c: String) = round(sum(col(c).cast("decimal(25,10)")), 2)
        .cast("double").as(c.stripPrefix("l_"))
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(m("l_quantity"), m("l_extendedprice"), m("l_discount"), m("l_tax"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("quantity"), col("extendedprice"), col("discount"), col("tax")),
          "measure", "total")
        .orderBy(col("l_returnflag"), col("measure"))
    },

    // ---- Interval (point-in-range) join through operators/IntervalJoin:
    //      events matched to the 7-day window after each same-user
    //      order. The operator bands time into buckets (width = the
    //      interval length, so each order explodes to ≤ 2 rows), sends
    //      each point to its single bucket, and equi-joins on
    //      (key, bucket) + exact verify — no per-key cross product, no
    //      BroadcastNestedLoop, duplicates impossible by construction.
    //      Oracle: the plain inequality join, which DuckDB runs as an
    //      IEJoin. Event times ride q57's deterministic mapping into
    //      the orders era. ----
    QueryDef.sql("q66_interval_join",
      """WITH ev AS (SELECT event_id, user_id,
        |    CAST(DATE '1995-01-01' + CAST(event_id % 2400 AS INTEGER) AS TIMESTAMP) AS t
        |  FROM events)
        |SELECT o.o_orderkey, ev.event_id, o.o_custkey AS user_id
        |FROM orders o JOIN ev
        |  ON ev.user_id = o.o_custkey
        | AND ev.t >= o.o_orderdate AND ev.t < o.o_orderdate + INTERVAL 7 DAY
        |ORDER BY o.o_orderkey, ev.event_id""".stripMargin) { (s, d) =>
      val SevenDaysUs = 7L * 24 * 3600 * 1000 * 1000
      val ev = t(s, d, "events").select(col("event_id"),
        col("user_id").as("k"),
        date_add(lit("1995-01-01").cast("date"),
          (col("event_id") % 2400).cast("int")).cast("timestamp").as("t"))
      val ords = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey").as("k"),
        col("o_orderdate").cast("timestamp").as("w_start"),
        (col("o_orderdate").cast("timestamp") + expr("interval 7 days"))
          .as("w_end"))
      graft.operators.IntervalJoin.pointInInterval(ev, ords,
          keyCol = "k", timeCol = "t", startCol = "w_start", endCol = "w_end",
          bucketMicros = SevenDaysUs)
        .select(col("o_orderkey"), col("event_id"), col("k").as("user_id"))
        .orderBy(col("o_orderkey"), col("event_id"))
    },

    // ---- Multiset set-ops: EXCEPT ALL / INTERSECT ALL preserve
    //      duplicate counts (bag semantics) — a different operator from
    //      q17/q18's distinct forms; Spark's exceptAll/intersectAll
    //      compile to count-matching anti/semi shapes, no distinct. ----
    QueryDef.sql("q59_multiset_ops",
      """WITH a AS (SELECT l_orderkey % 100 AS k FROM lineitem WHERE l_linenumber <= 2),
        |b AS (SELECT l_orderkey % 100 AS k FROM lineitem WHERE l_linenumber = 1),
        |ex AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b),
        |ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
        |SELECT op, k, CAST(c AS BIGINT) AS c FROM (
        |  SELECT 'except_all' AS op, k, count(*) AS c FROM ex GROUP BY k
        |  UNION ALL
        |  SELECT 'intersect_all' AS op, k, count(*) AS c FROM ia GROUP BY k)
        |ORDER BY op, k""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem")
      val a = li.filter(col("l_linenumber") <= 2)
        .select((col("l_orderkey") % 100).as("k"))
      val b = li.filter(col("l_linenumber") === 1)
        .select((col("l_orderkey") % 100).as("k"))
      val ex = a.exceptAll(b).groupBy(col("k"))
        .agg(count(lit(1)).as("c")).withColumn("op", lit("except_all"))
      val ia = a.intersectAll(b).groupBy(col("k"))
        .agg(count(lit(1)).as("c")).withColumn("op", lit("intersect_all"))
      ex.unionByName(ia)
        .select(col("op"), col("k"), col("c"))
        .orderBy(col("op"), col("k"))
    },

    // ---- Multi-source BFS reach (hop-distance labeling) — the graph
    //      primitive the CC / PageRank / triangle / k-core suite was
    //      missing: from the 5 heaviest users, label every user with
    //      its first-discovery hop count over the SPARSE 1-minute
    //      co-occurrence graph (the 10-minute graph is near-complete —
    //      1 hop reaches ~everything — so BFS is only meaningful at
    //      the tighter bucket). Three unrolled frontier rounds, each =
    //      one edge join + one min-agg, ONLY the newest layer expands
    //      (the frontier trick — re-expanding settled nodes is the
    //      naive O(V·E) mistake); per-round localCheckpoint bounds
    //      lineage exactly like q69's CC. Report = per-hop histogram
    //      with exact sum_u; unreached users (-1) stay in the report
    //      — reachability coverage IS the audit. ----
    QueryDef.sql("q164_bfs_reach", {
      val rounds = (1 to 3).map { i =>
        s"""f$i AS (SELECT DISTINCT ed.y AS u FROM l${i - 1}
           |  JOIN ed ON ed.x = l${i - 1}.u WHERE l${i - 1}.d = ${i - 1}),
           |l$i AS (SELECT u, min(d) AS d FROM (SELECT u, d FROM l${i - 1}
           |  UNION ALL SELECT u, CAST($i AS BIGINT) FROM f$i) GROUP BY u)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${coocEdgesCte(60000000L)},
         |ed AS (SELECT x, y FROM e UNION SELECT y AS x, x AS y FROM e),
         |pop AS (SELECT DISTINCT user_id AS u FROM events),
         |l0 AS (SELECT u, CAST(0 AS BIGINT) AS d
         |  FROM (SELECT user_id AS u, count(*) AS c
         |  FROM events GROUP BY 1 ORDER BY c DESC, u LIMIT 5)),
         |$rounds
         |SELECT d, CAST(count(*) AS BIGINT) AS n_users,
         |  CAST(sum(u) AS BIGINT) AS sum_u
         |FROM (SELECT pop.u, CAST(coalesce(l3.d, -1) AS BIGINT) AS d
         |  FROM pop LEFT JOIN l3 ON l3.u = pop.u)
         |GROUP BY d ORDER BY d""".stripMargin
    }) { (s, d) =>
      val e = coocEdges(s, d, 60000000L)
      val ed = e.select(col("x"), col("y"))
        .union(e.select(col("y").as("x"), col("x").as("y")))
        .localCheckpoint()
      val pop = t(s, d, "events").select(col("user_id").as("u")).distinct()
      var dist = t(s, d, "events").groupBy(col("user_id").as("u"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("u")).limit(5)
        .select(col("u"), lit(0L).as("d"))
        .localCheckpoint()
      for (i <- 1 to 3) {
        val frontier = dist.filter(col("d") === (i - 1).toLong)
        val nbrs = frontier.join(ed, frontier("u") === ed("x"))
          .select(ed("y").as("u"), lit(i.toLong).as("d"))
        dist = dist.union(nbrs).groupBy(col("u"))
          .agg(min(col("d")).as("d")).localCheckpoint()
      }
      pop.join(dist, Seq("u"), "left")
        .withColumn("d", coalesce(col("d"), lit(-1L)))
        .groupBy(col("d"))
        .agg(count(lit(1)).as("n_users"), sum(col("u")).cast("long").as("sum_u"))
        .orderBy(col("d"))
    },

    // ---- RFM segmentation (recency / frequency / monetary): the
    //      product-analytics read-out that buckets each purchasing
    //      user into quintiles per dimension and rolls the (r, f)
    //      matrix up into named segments. Every ntile rides a total
    //      order ((metric DESC, user_id) — ties can never straddle a
    //      bucket edge differently across engines), and monetary sums
    //      are exact micros. SCALE: the per-user agg reduces the
    //      corpus to O(users) rows BEFORE any global window — the
    //      ntile sorts users, never events; at the 1e8-user mark the
    //      exact ntile swaps for QuantileLake cutoffs broadcast as a
    //      bucket map, same downstream plan. ----
    QueryDef.sql("q166_rfm_segments",
      """WITH u AS (SELECT user_id, max(epoch_us(ts)) AS r,
        |    CAST(count(*) AS BIGINT) AS f,
        |    sum(CAST(CAST(floor(value * 1000000) AS BIGINT)
        |      AS DECIMAL(38,0))) AS m
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |q AS (SELECT user_id, m,
        |    CAST(ntile(5) OVER (ORDER BY r DESC, user_id) AS BIGINT) AS r_q,
        |    CAST(ntile(5) OVER (ORDER BY f DESC, user_id) AS BIGINT) AS f_q
        |  FROM u),
        |lab AS (SELECT r_q, f_q, m, CASE
        |    WHEN r_q <= 2 AND f_q <= 2 THEN 'champion'
        |    WHEN r_q >= 4 AND f_q <= 2 THEN 'at_risk'
        |    WHEN r_q <= 2 AND f_q >= 4 THEN 'fresh'
        |    ELSE 'other' END AS segment FROM q)
        |SELECT segment, r_q, f_q, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(m) AS BIGINT) AS m_micro_sum
        |FROM lab GROUP BY 1, 2, 3 ORDER BY segment, r_q, f_q""".stripMargin) {
      (s, d) =>
      val u = t(s, d, "events").filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(unix_micros(col("ts"))).as("r"),
          count(lit(1)).as("f"),
          sum(floor(col("value") * 1000000).cast("long")
            .cast("decimal(38,0)")).as("m"))
      val q = u.select(col("user_id"), col("m"),
        ntile(5).over(Window.orderBy(col("r").desc, col("user_id")))
          .cast("long").as("r_q"),
        ntile(5).over(Window.orderBy(col("f").desc, col("user_id")))
          .cast("long").as("f_q"))
      q.withColumn("segment",
          when(col("r_q") <= 2 && col("f_q") <= 2, "champion")
            .when(col("r_q") >= 4 && col("f_q") <= 2, "at_risk")
            .when(col("r_q") <= 2 && col("f_q") >= 4, "fresh")
            .otherwise("other"))
        .groupBy(col("segment"), col("r_q"), col("f_q"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("m")).cast("long").as("m_micro_sum"))  // decimal Σ, long at the edge
        .orderBy(col("segment"), col("r_q"), col("f_q"))
    },

    // ---- Gaps-and-islands streaks: consecutive purchase-day runs per
    //      user via the classic day-number − row-number grouping key
    //      (constant within a consecutive run, jumps across a gap) —
    //      pure window arithmetic, no self-join, no recursion. The
    //      report is the longest-streak histogram with exact streak /
    //      active-day mass per bin. Purchase days (not any-event days)
    //      because every user is active nearly every day at this
    //      density — streaks over the full feed are degenerate
    //      (measured: all-30s). One user-keyed window exchange; the
    //      day dedup and both rollups reuse its partitioning. ----
    QueryDef.sql("q168_streaks",
      """WITH ad AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase'),
        |nr AS (SELECT user_id, day,
        |    CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS dn,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS BIGINT) AS rn FROM ad),
        |st AS (SELECT user_id, dn - rn AS grp, CAST(count(*) AS BIGINT) AS len
        |  FROM nr GROUP BY user_id, dn - rn),
        |pu AS (SELECT user_id, max(len) AS longest,
        |    CAST(count(*) AS BIGINT) AS n_streaks,
        |    CAST(sum(len) AS BIGINT) AS n_days FROM st GROUP BY user_id)
        |SELECT longest AS longest_streak, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(n_streaks) AS BIGINT) AS sum_streaks,
        |  CAST(sum(n_days) AS BIGINT) AS sum_active_days
        |FROM pu GROUP BY longest ORDER BY longest""".stripMargin) { (s, d) =>
      val ad = t(s, d, "events").filter(col("event_type") === "purchase")
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .distinct()
      val nr = ad.select(col("user_id"),
          datediff(col("day"), to_date(lit("1970-01-01"))).cast("long").as("dn"),
          row_number().over(
            Window.partitionBy(col("user_id")).orderBy(col("day")))
            .cast("long").as("rn"))
      nr.groupBy(col("user_id"), (col("dn") - col("rn")).as("grp"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(max(col("len")).as("longest"), count(lit(1)).as("n_streaks"),
          sum(col("len")).cast("long").as("n_days"))
        .groupBy(col("longest").as("longest_streak"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("n_streaks")).cast("long").as("sum_streaks"),
          sum(col("n_days")).cast("long").as("sum_active_days"))
        .orderBy(col("longest_streak"))
    },

    // ---- χ² independence audit (lang × source contingency): the
    //      categorical twin of q165's Welch t — does document language
    //      depend on ingest source? Observed counts are exact BIGINTs
    //      over the FULL r×c grid (zero cells contribute their
    //      expected mass — dropping them understates χ², measured
    //      68.8 vs the honest 79.3 here); each cell term
    //      (O·N − R·C)²/(N·R·C) is computed in identical double op
    //      order from exact integers, quantized to DECIMAL(28,6), and
    //      summed as DECIMALS — so the statistic is independent of
    //      aggregation order, which a raw double Σ is not. Cramér's V
    //      normalizes it to [0,1]. One (lang, source) agg; margins are
    //      O(r)+O(c) broadcasts; the grid is r×c rows. ----
    QueryDef.sql("q170_chi2_independence",
      """WITH o0 AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM o0 GROUP BY lang),
        |c AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct
        |  FROM o0 GROUP BY source),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o0),
        |grid AS (SELECT r.lang, c.source, r.rt, c.ct, coalesce(o0.o, 0) AS o
        |  FROM r CROSS JOIN c
        |  LEFT JOIN o0 ON o0.lang = r.lang AND o0.source = c.source),
        |cells AS (SELECT g.*, n.n,
        |    CAST(round(CAST((g.o * n.n - g.rt * g.ct) AS DOUBLE)
        |        * (g.o * n.n - g.rt * g.ct)
        |      / (CAST(n.n AS DOUBLE) * g.rt * g.ct), 6) AS DECIMAL(28,6))
        |      AS term
        |  FROM grid g CROSS JOIN n)
        |SELECT CAST(max(n) AS BIGINT) AS n_docs,
        |  CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
        |    AS BIGINT) AS dof,
        |  CAST(sum(term) AS DOUBLE) AS chi2,
        |  CASE WHEN least(count(DISTINCT lang) - 1,
        |      count(DISTINCT source) - 1) = 0 THEN NULL
        |    ELSE round(sqrt(CAST(sum(term) AS DOUBLE) / (max(n)
        |      * least(count(DISTINCT lang) - 1,
        |        count(DISTINCT source) - 1))), 4) END AS cramers_v
        |FROM cells""".stripMargin) { (s, d) =>
      // localCheckpoint: the contingency table is O(r·c) rows; without
      // it the four margin/grid consumers would each rescan the corpus
      val o0 = t(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("o"))
        .localCheckpoint()
      val r = o0.groupBy(col("lang")).agg(sum(col("o")).cast("long").as("rt"))
      val c = o0.groupBy(col("source")).agg(sum(col("o")).cast("long").as("ct"))
      val n = o0.agg(sum(col("o")).cast("long").as("n"))
      val grid = broadcast(r).crossJoin(broadcast(c))
        .join(o0, Seq("lang", "source"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .crossJoin(broadcast(n))
      val dev = (col("o") * col("n") - col("rt") * col("ct"))
      val cells = grid.withColumn("term",
        round(dev.cast("double") * dev /
          (col("n").cast("double") * col("rt") * col("ct")), 6)
          .cast("decimal(28,6)"))
      cells.agg(max(col("n")).as("n_docs"),
          ((countDistinct(col("lang")) - 1) *
            (countDistinct(col("source")) - 1)).cast("long").as("dof"),
          sum(col("term")).cast("double").as("chi2"),
          // a 1×c or r×1 table has no Cramér's V (min dof 0): 0/0
          // would be IEEE NaN here vs the oracle's NULL
          when(least(countDistinct(col("lang")) - 1,
            countDistinct(col("source")) - 1) > 0,
            round(sqrt(sum(col("term")).cast("double") /
              (max(col("n")) * least(countDistinct(col("lang")) - 1,
                countDistinct(col("source")) - 1))), 4))
            .as("cramers_v"))
    },

    // ---- CBO cardinality-estimation audit: what the optimizer's
    //      statistics predict for a skewed equi-join vs the truth.
    //      The NDV-only formula (n₁·n₂ / max(d₁,d₂) — what every CBO
    //      falls back to without histograms) is measured 26% low on
    //      the lang self-join because en's frequency breaks the
    //      uniform-key assumption; a 2-entry most-common-values list
    //      (the PostgreSQL stats shape) closes it to 0.06%. That gap
    //      is WHY engines collect MCV/histogram stats, quantified
    //      in exact micro units — estimates are integer div, never a
    //      float. One per-key agg feeds everything; stats rows are
    //      O(d) and the top-k MCV is a 2-row heap. ----
    QueryDef.sql("q172_cbo_estimate_audit",
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY lang),
        |s AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
        |    CAST(count(*) AS BIGINT) AS d,
        |    CAST(sum(n * n) AS BIGINT) AS exact FROM c),
        |m AS (SELECT CAST(sum(n) AS BIGINT) AS mtot,
        |    CAST(sum(n * n) AS BIGINT) AS msq,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM (SELECT n FROM c ORDER BY n DESC, lang LIMIT 2)),
        |est AS (SELECT s.exact, (s.tot * s.tot) // s.d AS est_ndv,
        |    m.msq + CASE WHEN s.d > m.k
        |      THEN ((s.tot - m.mtot) * (s.tot - m.mtot)) // (s.d - m.k)
        |      ELSE 0 END AS est_mcv
        |  FROM s, m)
        |SELECT exact AS exact_rows, est_ndv, est_mcv,
        |  CAST(CAST(est_ndv AS HUGEINT) * 1000000 // exact AS BIGINT)
        |    AS err_ndv_micro,
        |  CAST(CAST(est_mcv AS HUGEINT) * 1000000 // exact AS BIGINT)
        |    AS err_mcv_micro
        |FROM est""".stripMargin) { (s, d) =>
      val c = t(s, d, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n")).localCheckpoint()
      val st = c.agg(sum(col("n")).cast("long").as("tot"),
        count(lit(1)).as("d"),
        sum(col("n") * col("n")).cast("long").as("exact"))
      val m = c.orderBy(col("n").desc, col("lang")).limit(2)
        .agg(sum(col("n")).cast("long").as("mtot"),
          sum(col("n") * col("n")).cast("long").as("msq"),
          count(lit(1)).as("k"))
      val estNdv = expr("(tot * tot) div d")
      val estMcv = col("msq") + when(col("d") > col("k"),
        expr("((tot - mtot) * (tot - mtot)) div (d - k)")).otherwise(0L)
      st.crossJoin(broadcast(m))
        .select(col("exact"), estNdv.as("est_ndv"), estMcv.as("est_mcv"))
        // err in decimal-widened integer division: est·10⁶ can pass
        // 2⁶³ on a lake-sized corpus before the divide brings it back
        .select(col("exact").as("exact_rows"), col("est_ndv"),
          col("est_mcv"),
          expr("CAST((CAST(est_ndv AS DECIMAL(38,0)) * 1000000)" +
            " div exact AS BIGINT)").as("err_ndv_micro"),
          expr("CAST((CAST(est_mcv AS DECIMAL(38,0)) * 1000000)" +
            " div exact AS BIGINT)").as("err_mcv_micro"))
    },

    // ---- Session-path mining: top event-type TRIGRAMS along each
    //      user-day journey — the sequence extension of q143's 1-step
    //      Markov transitions (a transition matrix cannot distinguish
    //      view>click>purchase from view>click>error; the trigram
    //      table can). Paths come from two lead() calls over ONE
    //      (user, day)-keyed window ordered by the total (us,
    //      event_id) order; counts are exact, top-20 tie-broken by
    //      path. User-day journeys (not 30-min sessions) because this
    //      corpus's inter-event gaps make gap-sessions ~singletons —
    //      every trigram count would be 1 (measured). ----
    QueryDef.sql("q173_path_mining",
      """WITH s AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |tri AS (SELECT event_type || '>' ||
        |    lead(event_type, 1) OVER w2 || '>' ||
        |    lead(event_type, 2) OVER w2 AS path,
        |    lead(event_type, 2) OVER w2 AS e3
        |  FROM s WINDOW w2 AS (PARTITION BY user_id, day
        |    ORDER BY us, event_id))
        |SELECT path, CAST(count(*) AS BIGINT) AS n FROM tri
        |WHERE e3 IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin) { (s, d) =>
      val w2 = Window
        .partitionBy(col("user_id"),
          date_trunc("day", col("ts")).cast("date"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
      t(s, d, "events")
        .select(col("event_type"),
          lead(col("event_type"), 1).over(w2).as("e2"),
          lead(col("event_type"), 2).over(w2).as("e3"))
        .filter(col("e3").isNotNull)
        .select(concat(col("event_type"), lit(">"), col("e2"),
          lit(">"), col("e3")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(20)
    },

    // ---- Cohort retention matrix: users cohort on the DAY of their
    //      first high-value action (value ≥ 90 — the qualifying-event
    //      idiom; day granularity because the synthetic stream spans
    //      30 days), then each (cohort, weeks-since) cell counts the
    //      distinct users still producing high-value actions — the
    //      classic triangular retention report every growth/curation
    //      dashboard runs. All integer: day cohorts are DATE-exact,
    //      week offsets are datediff-div-7 on Monday-aligned day
    //      arithmetic, and the retention ratio is the decimal-widened
    //      micro division (q175's discipline). The qualifying stream
    //      and the first-seen table are localCheckpointed: each feeds
    //      two consumers, and without the cut both re-scan events.
    //      Scale: hv is one pushed-filter scan, f is O(users), every
    //      later stage is keyed on (cohort[, wk]) — O(days·weeks)
    //      output rows at any corpus size. ----
    QueryDef.sql("q183_cohort_retention",
      """WITH hv AS (SELECT user_id, CAST(ts AS DATE) AS dd
        |  FROM events WHERE value >= 90.0),
        |f AS (SELECT user_id, min(dd) AS cohort FROM hv GROUP BY user_id),
        |act AS (SELECT DISTINCT hv.user_id, f.cohort,
        |    CAST(datediff('day', f.cohort, hv.dd) // 7 AS BIGINT) AS wk
        |  FROM hv JOIN f ON f.user_id = hv.user_id),
        |siz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_n
        |  FROM f GROUP BY cohort),
        |m AS (SELECT cohort, wk, CAST(count(*) AS BIGINT) AS n_active
        |  FROM act GROUP BY cohort, wk)
        |SELECT m.cohort, m.wk, siz.cohort_n, m.n_active,
        |  CAST(CAST(m.n_active AS HUGEINT) * 1000000 // siz.cohort_n
        |    AS BIGINT) AS retention_micro
        |FROM m JOIN siz ON siz.cohort = m.cohort
        |ORDER BY m.cohort, m.wk""".stripMargin) { (s, d) =>
      val hv = t(s, d, "events").filter(col("value") >= 90.0)
        .select(col("user_id"), col("ts").cast("date").as("dd"))
        .localCheckpoint()
      val f = hv.groupBy(col("user_id")).agg(min(col("dd")).as("cohort"))
        .localCheckpoint()
      val act = hv.join(f, "user_id")
        .select(col("user_id"), col("cohort"),
          expr("datediff(dd, cohort) div 7").cast("long").as("wk"))
        .distinct()
      val siz = f.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_n"))
      val m = act.groupBy(col("cohort"), col("wk"))
        .agg(count(lit(1)).as("n_active"))
      m.join(siz, "cohort")
        .select(col("cohort"), col("wk"), col("cohort_n"), col("n_active"),
          expr("CAST(CAST(n_active AS DECIMAL(38,0)) * 1000000" +
            " div cohort_n AS BIGINT)").as("retention_micro"))
        .orderBy(col("cohort"), col("wk"))
    },

    // ---- Blocked record linkage (entity resolution): candidate pairs
    //      form ONLY inside a blocking key — (nation, segment,
    //      name-length band) here; real deployments add name-prefix /
    //      phonetic keys to the same slot — and each in-block pair is
    //      scored with edit distance; pairs at lev ≤ 2 are duplicate
    //      candidates. This is THE scalable linkage shape: the
    //      all-pairs explosion is confined to Σ|block|² with the block
    //      key chosen to keep blocks bounded (a skewed block would get
    //      a salted sub-key, q73's discipline); nothing global ever
    //      materializes. levenshtein is the same classic DP edit
    //      distance in both engines, so the per-block match counts
    //      hash-compare exactly. One block-keyed self-join + one
    //      block-keyed agg — two exchanges at any scale. ----
    QueryDef.sql("q184_record_linkage",
      """WITH b AS (SELECT c_custkey AS k, c_name AS nm, c_nationkey AS nk,
        |    c_mktsegment AS seg, CAST(length(c_name) // 4 AS BIGINT) AS lb
        |  FROM customer),
        |p AS (SELECT a.nk, a.seg, CAST(levenshtein(a.nm, b2.nm) AS BIGINT) AS lev
        |  FROM b a JOIN b b2 ON a.nk = b2.nk AND a.seg = b2.seg
        |    AND a.lb = b2.lb AND a.k < b2.k)
        |SELECT nk AS nation, seg AS segment,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN lev <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
        |  CAST(min(lev) AS BIGINT) AS min_lev,
        |  CAST(sum(CASE WHEN lev <= 2 THEN lev ELSE 0 END) AS BIGINT)
        |    AS sum_match_lev
        |FROM p GROUP BY nk, seg ORDER BY nation, segment""".stripMargin) {
      (s, d) =>
      val b = t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_name").as("nm"),
          col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
          expr("CAST(length(c_name) div 4 AS BIGINT)").as("lb"))
      val p = b.as("a").join(b.as("b2"),
          col("a.nk") === col("b2.nk") && col("a.seg") === col("b2.seg") &&
            col("a.lb") === col("b2.lb") && col("a.k") < col("b2.k"))
        .select(col("a.nk").as("nation"), col("a.seg").as("segment"),
          levenshtein(col("a.nm"), col("b2.nm")).cast("long").as("lev"))
      p.groupBy(col("nation"), col("segment"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("lev") <= 2, 1L).otherwise(0L)).as("n_match"),
          min(col("lev")).as("min_lev"),
          sum(when(col("lev") <= 2, col("lev")).otherwise(0L))
            .as("sum_match_lev"))
        .orderBy(col("nation"), col("segment"))
    },

    // ---- HITS hubs & authorities over the high-volume supplier→part
    //      supply graph (a supplier is a hub when it supplies many
    //      strong parts; a part is an authority when strong suppliers
    //      carry it) — the directed/bipartite complement to q137's
    //      PageRank, 3 fixed iterations in EXACT INTEGER arithmetic:
    //      scores in 1e12 fixed point, each half-iteration max-
    //      rescaled by integer division (float HITS L2-normalizes,
    //      which no cross-engine hash could check; this is bit-exact).
    //      The quantity gate thins the edge list at the SCAN (pushed
    //      filter); the distinct edge agg is the only corpus-sized
    //      exchange and is localCheckpointed because 6 half-iteration
    //      joins consume it. Per-round cost = one edge join + one
    //      node agg + a 1-row broadcast max — the Pregel shape. ----
    QueryDef.sql("q186_hits", hitsOracleSql(3)) { (s, d) =>
      val e = t(s, d, "lineitem").filter(col("l_quantity") >= 45)
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
        .distinct()
        .localCheckpoint()
      val (h, a) = graft.operators.Hits.scores(e, 3)
      val hubs = h.orderBy(col("h").desc, col("s")).limit(10)
        .select(lit("hub").as("side"), col("s").as("node"),
          col("h").as("score"))
      val auths = a.orderBy(col("a").desc, col("p")).limit(10)
        .select(lit("auth").as("side"), col("p").as("node"),
          col("a").as("score"))
      hubs.unionAll(auths)
        .orderBy(col("side"), col("score").desc, col("node"))
    },

    // ---- Exponentially time-decayed engagement score: each event
    //      contributes value·2^(−age_weeks) against the stream's
    //      horizon — the recency weighting every feed-ranking /
    //      user-scoring pipeline applies. The decay is EXACT integer
    //      arithmetic: age buckets to whole weeks (capped at 40 so
    //      the shift stays in range), the per-event contribution is
    //      vm div 2^k — a row-local integer shift both engines
    //      reproduce — and the per-user score is a plain integer sum
    //      (float pow/sums would be aggregation-order-dependent).
    //      The horizon is a 1-row agg riding a broadcast, never a
    //      driver collect. One corpus-sized user agg — at 100 TB the
    //      natural incremental form keeps per-(user, week) partial
    //      sums and decays them at read, the q95 sketch-lake shape.
    //      ----
    QueryDef.sql("q187_decayed_engagement",
      """WITH h AS (SELECT max(CAST(ts AS DATE)) AS hz FROM events),
        |e AS (SELECT user_id,
        |    CAST(floor(value * 1000000) AS BIGINT) AS vm,
        |    least(CAST(datediff('day', CAST(ts AS DATE), (SELECT hz FROM h))
        |      AS BIGINT) // 7, 40) AS k
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(vm // (CAST(1 AS BIGINT) << k)) AS BIGINT) AS score_micro,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val hz = ev.agg(max(col("ts").cast("date")).as("hz"))
      ev.crossJoin(broadcast(hz))
        .select(col("user_id"),
          floor(col("value") * 1000000).cast("long").as("vm"),
          least(expr("datediff(hz, cast(ts as date)) div 7").cast("long"),
            lit(40L)).as("k"))
        .groupBy(col("user_id"))
        .agg(sum(expr("vm div shiftleft(cast(1 as bigint), cast(k as int))"))
            .cast("long").as("score_micro"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    // ---- STREAMING twin of the recency scoring — the exact
    //      incremental form q187's scale note prescribes: the decay
    //      reference (the stream horizon) is unknowable at arrival,
    //      so the stream folds (user, day) PARTIAL sums — a plain
    //      associative aggregation, O(users · active-days) state rows
    //      (a lake deployment compacts closed days into the partials
    //      table, q97's shape) — and the decay is applied AT READ
    //      against the horizon the folded table itself yields. The
    //      day-level semantics (decay the day's sum, not each event)
    //      is the natural partial-sum contract; the oracle computes
    //      the identical day-partial form directly over the table, so
    //      the green hash proves stream ≡ batch. All integer: the
    //      fold sums micro values, the read is a row-local shift and
    //      an integer sum. ----
    QueryDef.sql("q188_stream_decayed_engagement",
      """WITH p AS (SELECT user_id, CAST(ts AS DATE) AS dd,
        |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS vm,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
        |h AS (SELECT max(dd) AS hz FROM p),
        |e AS (SELECT user_id, vm, cnt,
        |    least(CAST(datediff('day', dd, (SELECT hz FROM h)) AS BIGINT) // 7,
        |      40) AS k
        |  FROM p)
        |SELECT user_id,
        |  CAST(sum(vm // (CAST(1 AS BIGINT) << k)) AS BIGINT) AS score_micro,
        |  CAST(sum(cnt) AS BIGINT) AS n_events
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val feedDir = graft.bench.BenchFeeds.feed(s, d, "evuserfeed",
        idCol = "event_id", checkSpan = false)(
        t(s, d, "events").select(col("event_id"), col("ts"),
          col("user_id"), col("value")))
      // complete-mode output is (user × active-day)-proportional — too
      // big for a driver memory table (r14 ask #3). The file-sink
      // equivalent for complete mode is foreachBatch + overwrite: each
      // trigger re-lands the full partials table distributed, exactly
      // the compact-into-partials lake shape the scale note describes.
      val outDir = graft.bench.BenchFeeds.scratchDir("q188_out")
      graft.streaming.StreamRun.withStatePartitions(s, 8) {
        val q = s.readStream
          .schema(s.read.parquet(feedDir).schema)
          .option("maxFilesPerTrigger", 2)
          .parquet(feedDir)
          .groupBy(col("user_id"), col("ts").cast("date").as("dd"))
          .agg(sum(floor(col("value") * 1000000).cast("long"))
              .cast("long").as("vm"),
            count(lit(1)).as("cnt"))
          .writeStream
          .option("checkpointLocation",
            graft.bench.BenchFeeds.scratchDir("q188_ck"))
          .outputMode("complete")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("overwrite").parquet(outDir); ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      val p = s.read.parquet(outDir)
      val hz = p.agg(max(col("dd")).as("hz"))
      p.crossJoin(broadcast(hz))
        .select(col("user_id"), col("vm"), col("cnt"),
          least(expr("datediff(hz, dd) div 7").cast("long"), lit(40L))
            .as("k"))
        .groupBy(col("user_id"))
        .agg(sum(expr("vm div shiftleft(cast(1 as bigint), cast(k as int))"))
            .cast("long").as("score_micro"),
          sum(col("cnt")).cast("long").as("n_events"))
        .orderBy(col("user_id"))
    },

    // ---- Resource-Allocation link prediction (Zhou/Lü/Zhang 2009 —
    //      the integer-exact sibling of Adamic–Adar): suppliers are
    //      linked through shared parts, and a candidate pair (s1,s2)
    //      scores Σ 1/deg(p) over shared parts — common neighbors
    //      down-weighted by their promiscuity. Hub parts (deg > 30)
    //      are dropped BEFORE the pair expansion — the df-cap
    //      discipline every posting-list operator here uses: they
    //      dominate the O(Σ deg²) fan-out while contributing the
    //      least signal (1/deg → 0), so the cap bounds exchange
    //      volume at any corpus size. Degrees are corpus-derived
    //      integers and the score is Σ (10⁶ div deg) — exact integer
    //      arithmetic, no ln() (Adamic–Adar's 1/ln d) whose libm
    //      rounding could diverge between engines. Top-50 by score
    //      rides TakeOrdered (no global sort). ----
    QueryDef.sql("q226_ra_link_prediction",
      """WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
        |  FROM lineitem),
        |d AS (SELECT p, count(*) AS deg FROM sp GROUP BY p),
        |dc AS (SELECT p, deg FROM d WHERE deg BETWEEN 2 AND 30),
        |pairs AS (SELECT a.s AS s1, b.s AS s2, dc.deg
        |  FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
        |  JOIN dc ON dc.p = a.p)
        |SELECT s1, s2, CAST(sum(1000000 // deg) AS BIGINT) AS ra_micro,
        |  CAST(count(*) AS BIGINT) AS n_common
        |FROM pairs GROUP BY s1, s2
        |ORDER BY ra_micro DESC, s1, s2 LIMIT 50""".stripMargin) { (s, d) =>
      val sp = t(s, d, "lineitem")
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
        .distinct()
      val dc = sp.groupBy(col("p")).agg(count(lit(1)).as("deg"))
        .filter(col("deg").between(2, 30))
      sp.select(col("s").as("s1"), col("p"))
        .join(dc, "p") // part-typed side; AQE broadcasts when it fits
        .join(sp.select(col("s").as("s2"), col("p")), "p")
        .filter(col("s1") < col("s2"))
        .groupBy(col("s1"), col("s2"))
        .agg(sum(expr("1000000 div deg")).cast("long").as("ra_micro"),
          count(lit(1)).as("n_common"))
        .orderBy(col("ra_micro").desc, col("s1"), col("s2"))
        .limit(50)
    },

    // ---- Per-node local clustering coefficient over the supplier
    //      co-purchase graph (edge = ≥2 shared high-quantity parts,
    //      hub parts df-capped before the expansion — q226's rule).
    //      Per-node triangle counts come from the degree-ordered
    //      enumeration ([[graft.operators.Triangles.perNode]] —
    //      O(m^1.5) exchange, each triangle found once and credited
    //      to its three corners), NOT the Σ deg² wedge join the
    //      oracle can afford at DuckDB scale. The coefficient
    //      2T/(d(d−1)) is emitted in integer micro units — exact on
    //      both engines. The edge list feeds degree + triangle legs →
    //      localCheckpoint (q186's rule: compute the graph once). ----
    QueryDef.sql("q227_local_clustering",
      """WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
        |  FROM lineitem WHERE l_quantity >= 48),
        |d AS (SELECT p FROM sp GROUP BY p
        |  HAVING count(*) BETWEEN 2 AND 30),
        |e0 AS (SELECT a.s AS s1, b.s AS s2
        |  FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
        |  JOIN d ON d.p = a.p
        |  GROUP BY a.s, b.s HAVING count(*) >= 2),
        |adj AS (SELECT s1 AS u, s2 AS v FROM e0
        |  UNION ALL SELECT s2, s1 FROM e0),
        |deg AS (SELECT u, count(*) AS dg FROM adj GROUP BY u),
        |tri AS (SELECT a.u, count(*) AS tr FROM adj a
        |  JOIN adj b ON a.u = b.u AND a.v < b.v
        |  JOIN e0 e ON e.s1 = a.v AND e.s2 = b.v GROUP BY a.u)
        |SELECT deg.u AS node, CAST(deg.dg AS BIGINT) AS degree,
        |  CAST(coalesce(tri.tr, 0) AS BIGINT) AS triangles,
        |  CAST((2 * coalesce(tri.tr, 0) * 1000000)
        |    // (deg.dg * (deg.dg - 1)) AS BIGINT) AS lcc_micro
        |FROM deg LEFT JOIN tri ON deg.u = tri.u
        |WHERE deg.dg >= 2
        |ORDER BY lcc_micro DESC, node LIMIT 40""".stripMargin) { (s, d) =>
      val sp = t(s, d, "lineitem").filter(col("l_quantity") >= 48)
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
        .distinct()
      val dc = sp.groupBy(col("p")).agg(count(lit(1)).as("pd"))
        .filter(col("pd").between(2, 30)).select(col("p"))
      val spc = sp.join(dc, "p")
      val e0 = spc.select(col("s").as("x"), col("p"))
        .join(spc.select(col("s").as("y"), col("p")), "p")
        .filter(col("x") < col("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2).select(col("x"), col("y"))
        .localCheckpoint()
      val deg = e0.select(col("x").as("node"))
        .unionAll(e0.select(col("y").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      val tri = graft.operators.Triangles.perNode(e0)
      deg.join(tri.select(col("node"), col("tri").as("triangles")),
          Seq("node"), "left")
        .filter(col("degree") >= 2)
        .select(col("node"), col("degree"),
          coalesce(col("triangles"), lit(0L)).as("triangles"),
          expr("(2 * coalesce(triangles, 0L) * 1000000) div " +
            "(degree * degree - degree)").as("lcc_micro"))
        .orderBy(col("lcc_micro").desc, col("node"))
        .limit(40)
    },

    // ---- RFM segmentation: per-user Recency (days before the stream
    //      horizon), Frequency (events), Monetary (integer cents),
    //      each ntile(5)-scored on a TOTAL order (metric, user_id) —
    //      the classic 555-cell customer/contributor segmentation,
    //      deterministic because every ntile key is a corpus-derived
    //      integer with an id tie-break. Output is the cell census
    //      (125 rows max), so the windows are the only wide ops; at
    //      100 TB ntile swaps for bucketing against the q103 quantile
    //      lake's boundaries — the cell semantics are unchanged. ----
    QueryDef.sql("q234_rfm_cells",
      """WITH h AS (SELECT max(CAST(ts AS DATE)) AS hz FROM events),
        |u AS (SELECT user_id,
        |    datediff('day', max(CAST(ts AS DATE)), (SELECT hz FROM h))
        |      AS rec,
        |    count(*) AS freq,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |      AS mon_c
        |  FROM events GROUP BY 1),
        |sc AS (SELECT user_id, rec, freq, mon_c,
        |    ntile(5) OVER (ORDER BY rec DESC, user_id) AS r_score,
        |    ntile(5) OVER (ORDER BY freq, user_id) AS f_score,
        |    ntile(5) OVER (ORDER BY mon_c, user_id) AS m_score FROM u)
        |SELECT CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER)
        |    AS rfm_cell,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(min(user_id) AS BIGINT) AS sample_user,
        |  CAST(sum(mon_c) AS BIGINT) AS cell_monetary_c
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
      val hz = ev.agg(max(col("ts").cast("date")).as("hz"))
      val u = ev.groupBy(col("user_id"))
        .agg(max(col("ts").cast("date")).as("last_d"),
          count(lit(1)).as("freq"),
          sum(floor(col("value") * 100).cast("long")).cast("long")
            .as("mon_c"))
        .crossJoin(broadcast(hz))
        .select(col("user_id"), expr("datediff(hz, last_d)").as("rec"),
          col("freq"), col("mon_c"))
      u.select(col("user_id"), col("mon_c"),
          ntile(5).over(Window.orderBy(col("rec").desc, col("user_id")))
            .as("r_score"),
          ntile(5).over(Window.orderBy(col("freq"), col("user_id")))
            .as("f_score"),
          ntile(5).over(Window.orderBy(col("mon_c"), col("user_id")))
            .as("m_score"))
        .groupBy((col("r_score") * 100 + col("f_score") * 10
          + col("m_score")).as("rfm_cell"))
        .agg(count(lit(1)).as("n_users"),
          min(col("user_id")).as("sample_user"),
          sum(col("mon_c")).cast("long").as("cell_monetary_c"))
        .orderBy(col("rfm_cell"))
    },

    // ---- First-order Markov transition matrix over per-user event
    //      sequences: lead() within (user ORDER BY ts, event_id)
    //      yields each consecutive pair once, the transition count
    //      fold is the only corpus-sized shuffle (keyed by the
    //      type×type matrix — O(|types|²) output), and row
    //      probabilities are integer micro (count·10⁶ div row total).
    //      The per-user sequence window partitions by user — no
    //      global ordering anywhere, the sequence-model-ready shape
    //      for behavioural pretraining corpora. ----
    QueryDef.sql("q235_markov_transitions",
      """WITH s AS (SELECT user_id, event_type AS et,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt FROM events),
        |c AS (SELECT et, nxt, count(*) AS n FROM s
        |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT et, sum(n) AS t FROM c GROUP BY 1)
        |SELECT c.et AS src, c.nxt AS dst, CAST(c.n AS BIGINT) AS n,
        |  CAST((1000000 * c.n) // tot.t AS BIGINT) AS p_micro
        |FROM c JOIN tot ON c.et = tot.et
        |ORDER BY src, dst""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val c = t(s, d, "events")
        .select(col("user_id"), col("event_type").as("et"),
          lead(col("event_type"), 1).over(w).as("nxt"))
        .filter(col("nxt").isNotNull)
        .groupBy(col("et"), col("nxt")).agg(count(lit(1)).as("n"))
      val tot = c.groupBy(col("et")).agg(sum(col("n")).as("t"))
      c.join(tot, "et") // |types|-row side — AQE broadcasts it
        .select(col("et").as("src"), col("nxt").as("dst"),
          col("n").cast("long").as("n"),
          expr("CAST((1000000 * n) div t AS BIGINT)").as("p_micro"))
        .orderBy(col("src"), col("dst"))
    },

    // ---- Multimodal near-dup: perceptual-hash frame matching across
    //      media payloads. Each payload emits 4 stride-sampled frames
    //      (q174's REAL sampleFrames operator); each frame gets a
    //      60-bit locality-sensitive fingerprint (low nibble of each
    //      of its first 15 bytes — the pHash stand-in: byte edits
    //      flip nibbles, so Hamming distance tracks frame drift);
    //      candidates come from 4×15-bit SimHash-style banding (a
    //      Hamming-(≤3-nibble) pair shares ≥1 band) and verify with
    //      one codegen'd xor+bit_count — the near-exact-frame dedup
    //      a video corpus runs, the whole pipeline riding the banded
    //      LSH shape q93/q138 audit. Band buckets bound the pair
    //      fan-out exactly like posting df-caps at 100 TB. ----
    QueryDef.sql("q236_frame_phash_neardup",
      s"""WITH $mediaCte,
        |f AS (SELECT doc_id,
        |    CAST(floor(fn * greatest(octet_length(payload), 1) / 4)
        |      AS BIGINT) AS off, payload
        |  FROM p, (SELECT unnest(range(4)) AS fn)),
        |fr AS (SELECT doc_id,
        |    substring(hex(payload), CAST(2 * off + 1 AS INTEGER), 32)
        |      AS fh FROM f),
        |ph AS (SELECT doc_id,
        |    ${Sketches.hexSql("fh", from = 2, width = 15,
               digits = "0123456789ABCDEF", stride = 2)} AS h
        |  FROM fr WHERE length(fh) = 32),
        |bands AS (SELECT doc_id, h, b, (h >> (15 * b)) & 32767 AS bv
        |  FROM ph, (SELECT unnest(range(4)) AS b)),
        |cand AS (SELECT DISTINCT l.doc_id AS da, r.doc_id AS db,
        |    l.h AS ha, r.h AS hb
        |  FROM bands l JOIN bands r
        |    ON l.b = r.b AND l.bv = r.bv AND l.doc_id < r.doc_id),
        |close AS (SELECT da, db, bit_count(xor(ha, hb)) AS hd
        |  FROM cand WHERE bit_count(xor(ha, hb)) <= 4)
        |SELECT da AS doc_a, db AS doc_b,
        |  CAST(count(*) AS BIGINT) AS n_close_frames,
        |  CAST(min(hd) AS BIGINT) AS min_hamming
        |FROM close GROUP BY da, db ORDER BY doc_a, doc_b""".stripMargin) {
      (s, d) =>
      import graft.multimodal.Multimodal
      val frames = Multimodal.sampleFrames(
          mediaPayloads(t(s, d, "documents")), "payload", nFrames = 4)
        .select(col("doc_id"), hex(col("frame")).as("fh"))
        .filter(length(col("fh")) === 32)
      val nib = (1 to 15).map(i => substring(col("fh"), 2 * i, 1))
      val ph = frames
        .select(col("doc_id"),
          conv(concat(nib: _*), 16, 10).cast("long").as("h"))
      val bands = ph.select(col("doc_id"), col("h"),
          explode(sequence(lit(0), lit(3))).as("b"))
        .withColumn("bv",
          expr("shiftright(h, cast(15 * b AS int))")
            .bitwiseAND(lit(32767L)))
      val cand = bands.select(col("doc_id").as("da"), col("b"),
          col("bv"), col("h").as("ha"))
        .join(bands.select(col("doc_id").as("db"), col("b"), col("bv"),
          col("h").as("hb")), Seq("b", "bv"))
        .filter(col("da") < col("db"))
        .select(col("da"), col("db"), col("ha"), col("hb"))
        .distinct()
      cand
        .withColumn("hd", bit_count(col("ha").bitwiseXOR(col("hb"))))
        .filter(col("hd") <= 4)
        .groupBy(col("da").as("doc_a"), col("db").as("doc_b"))
        .agg(count(lit(1)).as("n_close_frames"),
          min(col("hd")).cast("long").as("min_hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- Sequence-model calibration: the q235 Markov family's
    //      predicted P(next = purchase | current type), TRAINED on the
    //      first half of the month (pair assigned by its NEXT event's
    //      timestamp, split at an absolute epoch so no engine-local
    //      date math can drift) and EVALUATED on the second — per-type
    //      predicted-vs-observed reliability plus the Brier score, the
    //      standard probability-forecast loss. Everything is exact:
    //      predictions are count ratios in integer micro, and Brier
    //      needs no per-row float at all — Σ(p−y)² over a cell with k
    //      positives of n is k(1−p)² + (n−k)p², assembled from the
    //      same integer counts (one DECIMAL(38,0) product tree, one
    //      final rounded division). Two O(types) aggs off one
    //      lead-window pass (user-partitioned — sequences bound per
    //      user, never corpus-long); test types unseen in training
    //      surface with NULL prediction via the left join (guard). ----
    QueryDef.sql("q240_seq_calibration",
      s"""WITH $nextPairsCte,
        |te AS (SELECT cur, CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(sum(CASE WHEN nxt = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k_te
        |  FROM pairs WHERE nxt_us >= 1705363200000000 GROUP BY cur)
        |SELECT te.cur AS cur_type, pm.n_train, pm.p_pred_micro,
        |  te.n_test,
        |  CAST(te.k_te * 1000000 // te.n_test AS BIGINT) AS p_obs_micro,
        |  CASE WHEN pm.p_pred_micro IS NULL THEN NULL
        |    ELSE round(CAST(te.k_te
        |        * CAST(1000000 - pm.p_pred_micro AS HUGEINT)
        |        * (1000000 - pm.p_pred_micro)
        |      + (te.n_test - te.k_te)
        |        * CAST(pm.p_pred_micro AS HUGEINT) * pm.p_pred_micro
        |      AS DOUBLE) / (CAST(te.n_test AS DOUBLE) * 1e12), 6) END
        |    AS brier
        |FROM te LEFT JOIN pm ON te.cur = pm.cur
        |ORDER BY cur_type""".stripMargin) { (s, d) =>
      val pairs = nextTypePairs(s, d)
      def half(f: org.apache.spark.sql.Column, n: String, kc: String) =
        pairs.filter(f).groupBy(col("cur"))
          .agg(count(lit(1)).as(n),
            sum(when(col("nxt") === "purchase", 1).otherwise(0))
              .cast("long").as(kc))
      val pm = half(col("nxt_us") < 1705363200000000L, "n_train", "k_tr")
        .select(col("cur"), col("n_train"),
          expr("CAST(k_tr * 1000000 div n_train AS BIGINT)")
            .as("p_pred_micro"))
      val te = half(col("nxt_us") >= 1705363200000000L, "n_test", "k_te")
      te.join(pm, Seq("cur"), "left")
        .select(col("cur").as("cur_type"), col("n_train"),
          col("p_pred_micro"), col("n_test"),
          expr("CAST(k_te * 1000000 div n_test AS BIGINT)")
            .as("p_obs_micro"),
          // a test-only type has no trained prediction — NULL, not a
          // null-arithmetic seam
          when(col("p_pred_micro").isNull, lit(null).cast("double"))
            .otherwise(round(
              (col("k_te")
                * (lit(1000000) - col("p_pred_micro")).cast("decimal(38,0)")
                * (lit(1000000) - col("p_pred_micro"))
              + (col("n_test") - col("k_te"))
                * col("p_pred_micro").cast("decimal(38,0)")
                * col("p_pred_micro")).cast("double")
              / (col("n_test").cast("double") * lit(1e12)), 6))
            .as("brier"))
        .orderBy(col("cur_type"))
    },

    // ---- Deadline-windowed funnel (view → click ≤24h → purchase
    //      ≤24h): q135's earliest-completion chain with a per-step
    //      DEADLINE — the production funnel semantics (ClickHouse's
    //      windowFunnel, Amplitude's conversion windows) where an
    //      unwindowed funnel on a long-lived corpus converts everyone
    //      eventually (q135 here reads 150/150/150; this reads
    //      150/60/25 — the deadline is what creates drop-off). Same
    //      scalable shape: per-user min-aggs chained through user-
    //      keyed joins (agg → join (t, t+W] → agg), never a per-user
    //      ordered scan; the report is 1-row broadcast aggs. The
    //      completion median rides the doubled-median trick (2× the
    //      interpolated median of integer µs is an exactly-
    //      representable integer double — CAST truncation can't
    //      diverge cross-engine where a .5 could). ----
    QueryDef.sql("q241_windowed_funnel",
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
        |    AND epoch_us(e.ts) <= v.t1 + 86400000000
        |  GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
        |    AND epoch_us(e.ts) <= c.t2 + 86400000000
        |  GROUP BY e.user_id),
        |b AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n1,
        |  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n2,
        |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n3,
        |  (SELECT CAST(2 * quantile_cont(p.t3 - v.t1, 0.5) AS BIGINT)
        |    FROM p JOIN v ON p.user_id = v.user_id) AS med2)
        |SELECT n1 AS step1_users, n2 AS step2_users, n3 AS step3_users,
        |  CAST(CASE WHEN n1 > 0 THEN n2 * 1000000 // n1 END AS BIGINT)
        |    AS conv12_micro,
        |  CAST(CASE WHEN n2 > 0 THEN n3 * 1000000 // n2 END AS BIGINT)
        |    AS conv23_micro,
        |  CAST(CASE WHEN n1 > 0 THEN n3 * 1000000 // n1 END AS BIGINT)
        |    AS conv13_micro,
        |  med2 AS median2_complete_us
        |FROM b""".stripMargin) { (s, d) =>
      val W = 86400000000L
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      def stage(tpe: String, after: DataFrame, tCol: String, out: String) =
        ev.filter(col("event_type") === tpe)
          .join(after, "user_id")
          .filter(col("us") > col(tCol) && col("us") <= col(tCol) + W)
          .groupBy(col("user_id")).agg(min(col("us")).as(out))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
        .localCheckpoint() // anchors step 2 and the completion median
      val c = stage("click", v, "t1", "t2")
        .localCheckpoint() // feeds step 3 and its own count
      val p = stage("purchase", c, "t2", "t3")
        .localCheckpoint() // feeds the count and the median join
      val n1 = v.agg(count(lit(1)).cast("long").as("step1_users"))
      val n2 = c.agg(count(lit(1)).cast("long").as("step2_users"))
      val n3 = p.agg(count(lit(1)).cast("long").as("step3_users"))
      val med = p.join(v, "user_id")
        .agg(expr("CAST(2 * percentile(t3 - t1, 0.5D) AS BIGINT)")
          .as("median2_complete_us"))
      n1.crossJoin(broadcast(n2)).crossJoin(broadcast(n3))
        .crossJoin(broadcast(med))
        .select(col("step1_users"), col("step2_users"), col("step3_users"),
          when(col("step1_users") > 0,
            expr("CAST(step2_users * 1000000 div step1_users AS BIGINT)"))
            .as("conv12_micro"),
          when(col("step2_users") > 0,
            expr("CAST(step3_users * 1000000 div step2_users AS BIGINT)"))
            .as("conv23_micro"),
          when(col("step1_users") > 0,
            expr("CAST(step3_users * 1000000 div step1_users AS BIGINT)"))
            .as("conv13_micro"),
          col("median2_complete_us"))
    },

    // ---- Cumulative gains / lift curve: rank users by an engagement
    //      score (view count) and read, at every score threshold, how
    //      much of the heavy-buyer population (≥ 15 purchases) the
    //      targeted slice captures vs random targeting — the standard
    //      model-evaluation readout behind "top 20 % of scores holds
    //      34 % of buyers". The curve is evaluated at score
    //      THRESHOLDS, not row-level deciles, so it assembles from
    //      the O(distinct scores) support table (score, users,
    //      positives): no per-row global rank exists anywhere — the
    //      cumulative window is post-aggregation (q239/q244) and the
    //      corpus only pays one user-keyed agg. Depth/recall/lift are
    //      exact integer micro (floor div on provably nonnegative
    //      operands). A corpus with zero positives ⇒ NULL recall and
    //      lift at every threshold (DegenerateInputSpec). ----
    QueryDef.sql("q245_gains_curve",
      """WITH u AS (SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS score,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase'
        |      THEN 1 ELSE 0 END) >= 15 THEN 1 ELSE 0 END AS y
        |  FROM events GROUP BY user_id),
        |sup AS (SELECT score, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(y) AS BIGINT) AS cp FROM u GROUP BY score),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(cp) AS BIGINT) AS b FROM sup),
        |cw AS (SELECT score,
        |    CAST(sum(c) OVER (ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS targeted,
        |    CAST(sum(cp) OVER (ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS captured FROM sup)
        |SELECT score AS score_threshold, targeted, captured,
        |  CAST(targeted * 1000000 // n AS BIGINT) AS depth_micro,
        |  CAST(CASE WHEN b > 0 THEN captured * 1000000 // b END
        |    AS BIGINT) AS recall_micro,
        |  CAST(CASE WHEN b > 0 THEN
        |    (CAST(captured AS HUGEINT) * n * 1000000)
        |      // (CAST(targeted AS HUGEINT) * b) END AS BIGINT)
        |    AS lift_micro
        |FROM cw, tot ORDER BY score_threshold DESC""".stripMargin) {
      (s, d) =>
      val u = t(s, d, "events").groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("score"),
          when(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)) >= 15, 1L).otherwise(0L).as("y"))
      val sup = u.groupBy(col("score"))
        .agg(count(lit(1)).as("c"), sum(col("y")).cast("long").as("cp"))
        .localCheckpoint() // feeds the 1-row total and the curve
      val tot = sup.agg(sum(col("c")).cast("long").as("n"),
        sum(col("cp")).cast("long").as("b"))
      val w = Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cw = sup.select(col("score"),
        sum(col("c")).over(w).as("targeted"),
        sum(col("cp")).over(w).as("captured"))
      cw.crossJoin(broadcast(tot)) // 1-row population totals
        .select(col("score").as("score_threshold"),
          col("targeted"), col("captured"),
          expr("CAST(targeted * 1000000 div n AS BIGINT)")
            .as("depth_micro"),
          // a zero-positive population ⇒ NULL, mirrored in the oracle
          when(col("b") > 0,
            expr("CAST(captured * 1000000 div b AS BIGINT)"))
            .as("recall_micro"),
          when(col("b") > 0,
            expr("""CAST(CAST(captured AS DECIMAL(38,0)) * n * 1000000
              |  div (CAST(targeted AS DECIMAL(38,0)) * b)
              |  AS BIGINT)""".stripMargin)).as("lift_micro"))
        .orderBy(col("score_threshold").desc)
    },

    // ---- Kendall τ-b between per-user view and purchase counts —
    //      the ordinal association test Spearman (q208) approximates:
    //      do heavier viewers buy more, judged by every PAIR of
    //      users? The O(N²) pair space never materializes: with
    //      small-integer scores the concordant/discordant counts are
    //      exact functions of the (x, y) CONTINGENCY CELLS — a
    //      domain-bounded cell table (distinct views × distinct
    //      purchases, independent of user count) crossed with itself
    //      under strict-order predicates, each side a few hundred
    //      rows broadcast. Tie terms come from the two marginals.
    //      C, D, and both tie-corrected denominators are exact
    //      integers; τ-b is one float op chain at the very end
    //      (q165's fence), NULL when either marginal is constant. ----
    QueryDef.sql("q246_kendall_tau",
      """WITH u AS (SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY user_id),
        |cell AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n
        |  FROM u GROUP BY x, y),
        |cd AS (SELECT
        |    CAST(coalesce(sum(CAST(a.n AS HUGEINT) * b.n) FILTER (
        |      WHERE b.x > a.x AND b.y > a.y), 0) AS HUGEINT) AS c2,
        |    CAST(coalesce(sum(CAST(a.n AS HUGEINT) * b.n) FILTER (
        |      WHERE b.x > a.x AND b.y < a.y), 0) AS HUGEINT) AS d2
        |  FROM cell a, cell b),
        |tx AS (SELECT CAST(sum(CAST(n AS HUGEINT) * (n - 1)) AS HUGEINT)
        |    AS txx FROM (SELECT x, CAST(sum(n) AS BIGINT) AS n
        |    FROM cell GROUP BY x)),
        |ty AS (SELECT CAST(sum(CAST(n AS HUGEINT) * (n - 1)) AS HUGEINT)
        |    AS tyy FROM (SELECT y, CAST(sum(n) AS BIGINT) AS n
        |    FROM cell GROUP BY y)),
        |nn AS (SELECT CAST(sum(n) AS HUGEINT) AS n FROM cell)
        |SELECT CAST(n AS BIGINT) AS n_users,
        |  CAST(c2 AS BIGINT) AS concordant, CAST(d2 AS BIGINT) AS discordant,
        |  CASE WHEN n * (n - 1) - txx > 0 AND n * (n - 1) - tyy > 0 THEN
        |    round((CAST(c2 AS DOUBLE) - CAST(d2 AS DOUBLE))
        |      / sqrt(CAST(n * (n - 1) - txx AS DOUBLE))
        |      / sqrt(CAST(n * (n - 1) - tyy AS DOUBLE)) * 2, 4)
        |  END AS tau_b
        |FROM cd, tx, ty, nn""".stripMargin) { (s, d) =>
      val u = t(s, d, "events").groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      val cell = u.groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
        .localCheckpoint() // feeds the pair fold, both marginals and
                           // the population count
      val a = cell.select(col("x").as("ax"), col("y").as("ay"),
        col("n").as("an"))
      val b = cell.select(col("x").as("bx"), col("y").as("by"),
        col("n").as("bn"))
      // domain-bounded cell² fold (distinct-score products, NOT user
      // pairs) — the broadcast side is the whole cell table
      val cd = a.crossJoin(broadcast(b))
        .agg(coalesce(sum(when(col("bx") > col("ax") &&
            col("by") > col("ay"),
            col("an").cast("decimal(38,0)") * col("bn"))), lit(0)
            .cast("decimal(38,0)")).as("c2"),
          coalesce(sum(when(col("bx") > col("ax") &&
            col("by") < col("ay"),
            col("an").cast("decimal(38,0)") * col("bn"))), lit(0)
            .cast("decimal(38,0)")).as("d2"))
      val tx = cell.groupBy(col("x")).agg(sum(col("n")).as("n"))
        .agg(sum(col("n").cast("decimal(38,0)") * (col("n") - 1))
          .as("txx"))
      val ty = cell.groupBy(col("y")).agg(sum(col("n")).as("n"))
        .agg(sum(col("n").cast("decimal(38,0)") * (col("n") - 1))
          .as("tyy"))
      val nn = cell.agg(sum(col("n")).cast("decimal(38,0)").as("n"))
      cd.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
        .crossJoin(broadcast(nn)) // 1-row folds
        .select(col("n").cast("long").as("n_users"),
          col("c2").cast("long").as("concordant"),
          col("d2").cast("long").as("discordant"),
          // a constant marginal ⇒ zero tie-corrected variance ⇒ NULL
          when(col("n") * (col("n") - 1) - col("txx") > 0 &&
            col("n") * (col("n") - 1) - col("tyy") > 0,
            round((col("c2").cast("double") - col("d2").cast("double"))
              / sqrt((col("n") * (col("n") - 1) - col("txx"))
                .cast("double"))
              / sqrt((col("n") * (col("n") - 1) - col("tyy"))
                .cast("double")) * 2, 4)).as("tau_b"))
    },

    // ---- Degree assortativity of the co-occurrence graph: do
    //      high-degree users co-occur with other high-degree users
    //      (r > 0, social-network-like) or with leaves (r < 0,
    //      hub-and-spoke)? The Newman coefficient is the Pearson
    //      correlation over EDGE ENDPOINTS, and on an undirected
    //      graph the symmetrized endpoint list makes both marginals
    //      identical — so r = (M·Σxy − (Σx)²)/(M·Σx² − (Σx)²), three
    //      exact DECIMAL(38,0) sums over the doubled edge list, one
    //      float division at the end (q165's fence). Shapes: q137's
    //      audited edge derivation, one union-all degree count, two
    //      user-keyed joins — no new shuffle family. A degree-regular
    //      graph ⇒ zero variance ⇒ NULL r (DegenerateInputSpec). ----
    QueryDef.sql("q247_assortativity",
      s"""WITH ${coocEdgesCte()},
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM
        |  (SELECT x AS u FROM e UNION ALL SELECT y AS u FROM e)
        |  GROUP BY u),
        |de AS (SELECT dx.d AS a, dy.d AS b2 FROM e
        |  JOIN deg dx ON e.x = dx.u JOIN deg dy ON e.y = dy.u),
        |sym AS (SELECT a, b2 FROM de UNION ALL SELECT b2, a FROM de),
        |agg AS (SELECT CAST(count(*) AS HUGEINT) AS m,
        |    CAST(sum(a) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(a AS HUGEINT) * a) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(a AS HUGEINT) * b2) AS HUGEINT) AS sxy
        |  FROM sym)
        |SELECT CAST(m // 2 AS BIGINT) AS n_edges,
        |  CAST(m * sxy - sx * sx AS BIGINT) AS cov_num,
        |  CAST(m * sxx - sx * sx AS BIGINT) AS var_num,
        |  CASE WHEN m * sxx - sx * sx > 0 THEN
        |    round(CAST(m * sxy - sx * sx AS DOUBLE)
        |      / CAST(m * sxx - sx * sx AS DOUBLE), 4)
        |  END AS assortativity
        |FROM agg""".stripMargin) { (s, d) =>
      val e = coocEdges(s, d)
        .localCheckpoint() // feeds the degree count and both hops
      val deg = e.select(col("x").as("u"))
        .unionAll(e.select(col("y").as("u")))
        .groupBy(col("u")).agg(count(lit(1)).as("d"))
      val de = e.join(deg.select(col("u").as("x"), col("d").as("a")), "x")
        .join(deg.select(col("u").as("y"), col("d").as("b2")), "y")
        .select(col("a"), col("b2"))
      val sym = de.unionAll(de.select(col("b2").as("a"), col("a").as("b2")))
      sym.agg(count(lit(1)).cast("decimal(38,0)").as("m"),
          sum(col("a")).cast("decimal(38,0)").as("sx"),
          sum(col("a").cast("decimal(38,0)") * col("a")).as("sxx"),
          sum(col("a").cast("decimal(38,0)") * col("b2")).as("sxy"))
        .select(expr("CAST(m div 2 AS BIGINT)").as("n_edges"),
          (col("m") * col("sxy") - col("sx") * col("sx")).cast("long")
            .as("cov_num"),
          (col("m") * col("sxx") - col("sx") * col("sx")).cast("long")
            .as("var_num"),
          // a degree-regular graph has zero endpoint variance ⇒ NULL
          when(col("m") * col("sxx") - col("sx") * col("sx") > 0,
            round((col("m") * col("sxy") - col("sx") * col("sx"))
              .cast("double")
              / (col("m") * col("sxx") - col("sx") * col("sx"))
              .cast("double"), 4)).as("assortativity"))
    },

    // ---- Community detection: 4 rounds of SYNCHRONOUS label
    //      propagation over q164's sparse 1-minute co-occurrence
    //      graph (the 10-minute graph is one dense component — LPA
    //      collapses it to a single community; the 1-minute graph
    //      has real structure). Deterministic by construction: every
    //      node adopts its neighbors' modal label with min-label
    //      tie-break, all ranks integer — the oracle unrolls the 4
    //      rounds into chained CTEs (q186's discipline) so a green
    //      hash proves the Spark loop replays the exact fixed-point
    //      walk. Report = community sizes. Scale notes on
    //      [[graft.operators.LabelPropagation]]: per-round Pregel
    //      joins + map-side-combining argmax, no window sort, plan
    //      depth O(1) via per-round localCheckpoint. ----
    QueryDef.sql("q253_label_propagation", {
      val rounds = (1 to 4).map { i =>
        s"""c$i AS (SELECT s.v, l.lab, count(*) AS cnt FROM sym s
           |  JOIN l${i - 1} l ON l.v = s.n GROUP BY s.v, l.lab),
           |l$i AS (SELECT v, lab FROM (SELECT v, lab, row_number()
           |    OVER (PARTITION BY v ORDER BY cnt DESC, lab) AS rn
           |  FROM c$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${coocEdgesCte(60000000L)},
         |sym AS (SELECT x AS v, y AS n FROM e
         |  UNION ALL SELECT y AS v, x AS n FROM e),
         |l0 AS (SELECT DISTINCT v, v AS lab FROM sym),
         |$rounds
         |SELECT CAST(lab AS BIGINT) AS community,
         |  CAST(count(*) AS BIGINT) AS n_members
         |FROM l4 GROUP BY lab
         |ORDER BY n_members DESC, community""".stripMargin
    }) { (s, d) =>
      graft.operators.LabelPropagation
        .labels(coocEdges(s, d, 60000000L), 4)
        .groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("community"))
    },

    // ---- Association rules (market-basket): {a, b} → c over
    //      per-(user, day) behavior baskets with support ≥ 5 —
    //      support / confidence / lift, the classic Apriori readout
    //      (per-day baskets because the all-time baskets are complete
    //      sets here: every rule would be trivially 1.0). The type
    //      domain bounds everything: a basket emits ≤ C(5,2) pairs
    //      and ≤ 30 triples (row-bounded fan-out, never quadratic in
    //      events), and the rule table is ≤ 30 rows. lift cross-
    //      multiplies in DECIMAL(38,0)/HUGEINT (n_abc·N·1e6 overflows
    //      BIGINT at lake-scale basket counts); all divisions are
    //      provably-nonnegative floor divs. Scale: three basket-keyed
    //      joins/aggs (u, dy) + type-sized assembly on broadcasts. ----
    QueryDef.sql("q258_assoc_rules",
      """WITH ut AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE)
        |    AS dy, event_type AS ty FROM events),
        |n AS (SELECT count(*) AS nu FROM (SELECT DISTINCT u, dy FROM ut)),
        |nc AS (SELECT ty, count(*) AS n_c FROM ut GROUP BY ty),
        |up AS (SELECT a.u, a.dy, a.ty AS ta, b.ty AS tb FROM ut a
        |  JOIN ut b ON a.u = b.u AND a.dy = b.dy AND a.ty < b.ty),
        |nab AS (SELECT ta, tb, count(*) AS n_ab FROM up GROUP BY ta, tb),
        |tri AS (SELECT up.u, up.ta, up.tb, c.ty AS tc FROM up JOIN ut c
        |  ON c.u = up.u AND c.dy = up.dy AND c.ty <> up.ta
        |    AND c.ty <> up.tb),
        |nabc AS (SELECT ta, tb, tc, count(*) AS n_abc FROM tri
        |  GROUP BY ta, tb, tc)
        |SELECT nabc.ta AS ant_a, nabc.tb AS ant_b, nabc.tc AS cons,
        |  CAST(n_abc AS BIGINT) AS n_baskets,
        |  CAST(n_abc * 1000000 // nu AS BIGINT) AS support_micro,
        |  CAST(n_abc * 1000000 // n_ab AS BIGINT) AS confidence_micro,
        |  CAST(CAST(n_abc AS HUGEINT) * nu * 1000000
        |    // (CAST(n_ab AS HUGEINT) * n_c) AS BIGINT) AS lift_micro
        |FROM nabc JOIN nab ON nabc.ta = nab.ta AND nabc.tb = nab.tb
        |JOIN nc ON nc.ty = nabc.tc, n
        |WHERE n_abc >= 5
        |ORDER BY lift_micro DESC, ant_a, ant_b, cons""".stripMargin) {
      (s, d) =>
      val ut = t(s, d, "events")
        .select(col("user_id").as("u"), to_date(col("ts")).as("dy"),
          col("event_type").as("ty"))
        .distinct()
        .localCheckpoint() // basket-sized (≪ events); feeds 4 consumers
      val n = ut.select(col("u"), col("dy")).distinct()
        .agg(count(lit(1)).as("nu"))
      val nc = ut.groupBy(col("ty")).agg(count(lit(1)).as("n_c"))
      val up = ut.select(col("u"), col("dy"), col("ty").as("ta"))
        .join(ut.select(col("u"), col("dy"), col("ty").as("tb")),
          Seq("u", "dy"))
        .filter(col("ta") < col("tb"))
      val nab = up.groupBy(col("ta"), col("tb"))
        .agg(count(lit(1)).as("n_ab"))
      val tri = up
        .join(ut.select(col("u"), col("dy"), col("ty").as("tc")),
          Seq("u", "dy"))
        .filter(col("tc") =!= col("ta") && col("tc") =!= col("tb"))
      val nabc = tri.groupBy(col("ta"), col("tb"), col("tc"))
        .agg(count(lit(1)).as("n_abc"))
      nabc.filter(col("n_abc") >= 5)
        .join(broadcast(nab), Seq("ta", "tb"))
        .join(broadcast(nc.withColumnRenamed("ty", "tc")), "tc")
        .crossJoin(broadcast(n))
        .select(col("ta").as("ant_a"), col("tb").as("ant_b"),
          col("tc").as("cons"), col("n_abc").cast("long").as("n_baskets"),
          expr("CAST(n_abc * 1000000 div nu AS BIGINT)")
            .as("support_micro"),
          expr("CAST(n_abc * 1000000 div n_ab AS BIGINT)")
            .as("confidence_micro"),
          expr("""CAST((CAST(n_abc AS DECIMAL(38,0)) * nu * 1000000)
            |  div (CAST(n_ab AS DECIMAL(38,0)) * n_c) AS BIGINT)"""
            .stripMargin).as("lift_micro"))
        .orderBy(col("lift_micro").desc, col("ant_a"), col("ant_b"),
          col("cons"))
    },

    // ---- Multi-touch attribution: every purchase credits the LAST
    //      and the FIRST touch (non-purchase event) by the same user
    //      in the strictly-prior 24 h window — the two classic
    //      marketing models side by side, plus the '(none)' bucket
    //      for unattributed purchases. The window join runs through
    //      [[graft.operators.IntervalJoin]] (bucket banding: each
    //      touch meets a purchase in ONE (user, 24 h-bucket) cell —
    //      no per-user cross product, skew spread over time buckets);
    //      per-purchase credit is an integer argmax/argmin on the
    //      TOTAL (tts, tid) order, so both engines pick the same
    //      touch. Money is exact integer cents. ----
    QueryDef.sql("q260_attribution",
      """WITH pur AS (SELECT user_id AS u, event_id AS pid, ts AS pts,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |tch AS (SELECT user_id AS u, event_id AS tid, ts AS tts,
        |    event_type AS ty
        |  FROM events WHERE event_type <> 'purchase'),
        |m AS (SELECT pur.pid, tch.tts, tch.tid, tch.ty FROM pur
        |  JOIN tch ON pur.u = tch.u
        |    AND tch.tts >= pur.pts - INTERVAL 24 HOURS
        |    AND tch.tts < pur.pts),
        |lastm AS (SELECT pid, ty FROM (SELECT pid, ty, row_number()
        |    OVER (PARTITION BY pid ORDER BY tts DESC, tid DESC) rn
        |  FROM m) WHERE rn = 1),
        |firstm AS (SELECT pid, ty FROM (SELECT pid, ty, row_number()
        |    OVER (PARTITION BY pid ORDER BY tts ASC, tid ASC) rn
        |  FROM m) WHERE rn = 1),
        |pp AS (SELECT pur.pid, pur.cents,
        |    COALESCE(l.ty, '(none)') AS lty,
        |    COALESCE(f.ty, '(none)') AS fty
        |  FROM pur LEFT JOIN lastm l ON l.pid = pur.pid
        |  LEFT JOIN firstm f ON f.pid = pur.pid),
        |lr AS (SELECT lty AS channel, CAST(count(*) AS BIGINT)
        |      AS n_last, CAST(sum(cents) AS BIGINT) AS value_last_cents
        |  FROM pp GROUP BY lty),
        |fr AS (SELECT fty AS channel, CAST(count(*) AS BIGINT)
        |      AS n_first, CAST(sum(cents) AS BIGINT)
        |      AS value_first_cents
        |  FROM pp GROUP BY fty)
        |SELECT COALESCE(lr.channel, fr.channel) AS channel,
        |  CAST(COALESCE(n_last, 0) AS BIGINT) AS n_last,
        |  CAST(COALESCE(value_last_cents, 0) AS BIGINT)
        |    AS value_last_cents,
        |  CAST(COALESCE(n_first, 0) AS BIGINT) AS n_first,
        |  CAST(COALESCE(value_first_cents, 0) AS BIGINT)
        |    AS value_first_cents
        |FROM lr FULL OUTER JOIN fr ON lr.channel = fr.channel
        |ORDER BY channel""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("u"), col("event_id").as("pid"),
          col("ts").as("pts"),
          expr("pts - INTERVAL 24 HOURS").as("wstart"),
          round(col("value") * 100).cast("long").as("cents"))
      val tch = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id").as("u"), col("event_id").as("tid"),
          col("ts").as("tts"), col("event_type").as("ty"))
      // one (user, day-bucket) banded join: a 24 h window spans ≤ 2
      // buckets, so fan-out is bounded and no per-user cross exists
      val m = graft.operators.IntervalJoin.pointInInterval(
          tch, pur, "u", "tts", "wstart", "pts", 86400000000L)
        .groupBy(col("pid"))
        .agg(max(struct(col("tts"), col("tid"), col("ty"))).as("lt"),
          min(struct(col("tts"), col("tid"), col("ty"))).as("ft"))
        .select(col("pid"), col("lt.ty").as("lty0"),
          col("ft.ty").as("fty0"))
      val pp = pur.join(m, Seq("pid"), "left")
        .select(col("cents"),
          coalesce(col("lty0"), lit("(none)")).as("lty"),
          coalesce(col("fty0"), lit("(none)")).as("fty"))
        .localCheckpoint() // per-purchase credits feed both reports
      val lr = pp.groupBy(col("lty").as("channel"))
        .agg(count(lit(1)).as("n_last"),
          sum(col("cents")).cast("long").as("value_last_cents"))
      val fr = pp.groupBy(col("fty").as("channel"))
        .agg(count(lit(1)).as("n_first"),
          sum(col("cents")).cast("long").as("value_first_cents"))
      lr.join(fr, Seq("channel"), "full")
        .select(col("channel"),
          coalesce(col("n_last"), lit(0L)).as("n_last"),
          coalesce(col("value_last_cents"), lit(0L))
            .as("value_last_cents"),
          coalesce(col("n_first"), lit(0L)).as("n_first"),
          coalesce(col("value_first_cents"), lit(0L))
            .as("value_first_cents"))
        .orderBy(col("channel"))
    },

    // ---- Expected calibration error (ECE, 10 equal-width bins) of
    //      the q240 sequence model — the standard "is the model's
    //      confidence honest" gate, computed WITHOUT any float: the
    //      per-bin identity |acc−conf|·n = |k·1e6 − Σp| makes every
    //      gap an exact integer, and the bin = −1 summary row is one
    //      HUGEINT/DECIMAL floor division. Shares [[nextTypePairs]] /
    //      the trained pm table with q240 verbatim, so the model under
    //      audit is provably the one q240 scored. Scale: one user-
    //      keyed lead window + type-sized broadcasts + an O(bins) agg.
    //      ----
    QueryDef.sql("q262_ece",
      s"""WITH $nextPairsCte,
        |tev AS (SELECT pairs.cur,
        |    CASE WHEN nxt = 'purchase' THEN 1 ELSE 0 END AS y,
        |    pm.p_pred_micro AS p
        |  FROM pairs JOIN pm ON pm.cur = pairs.cur
        |  WHERE nxt_us >= 1705363200000000),
        |bins AS (SELECT p // 100000 AS bin, CAST(count(*) AS BIGINT)
        |      AS n, CAST(sum(y) AS BIGINT) AS k,
        |    CAST(sum(p) AS BIGINT) AS sump
        |  FROM tev GROUP BY 1),
        |pb AS (SELECT CAST(bin AS BIGINT) AS bin, n,
        |    CAST(sump // n AS BIGINT) AS conf_micro,
        |    CAST(k * 1000000 // n AS BIGINT) AS acc_micro,
        |    CAST(abs(k * 1000000 - sump) // n AS BIGINT) AS gap_micro
        |  FROM bins)
        |SELECT * FROM pb
        |UNION ALL
        |SELECT -1, CAST(sum(n) AS BIGINT), NULL, NULL,
        |  CAST(sum(CAST(abs(k * 1000000 - sump) AS HUGEINT))
        |    // sum(n) AS BIGINT)
        |FROM bins
        |ORDER BY bin""".stripMargin) { (s, d) =>
      val pairs = nextTypePairs(s, d)
      val pm = pairs.filter(col("nxt_us") < 1705363200000000L)
        .groupBy(col("cur"))
        .agg(count(lit(1)).as("n_train"),
          sum(when(col("nxt") === "purchase", 1).otherwise(0))
            .cast("long").as("k_tr"))
        .select(col("cur"),
          expr("CAST(k_tr * 1000000 div n_train AS BIGINT)").as("p"))
      val bins = pairs.filter(col("nxt_us") >= 1705363200000000L)
        .join(broadcast(pm), "cur") // type-sized model table
        .select(when(col("nxt") === "purchase", 1L).otherwise(0L)
            .as("y"), col("p"))
        .groupBy(expr("p div 100000").as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("k"),
          sum(col("p")).cast("long").as("sump"))
        .localCheckpoint() // O(bins) rows feed both output legs
      bins.select(col("bin").cast("long").as("bin"), col("n"),
          expr("CAST(sump div n AS BIGINT)").as("conf_micro"),
          expr("CAST(k * 1000000 div n AS BIGINT)").as("acc_micro"),
          expr("CAST(abs(k * 1000000 - sump) div n AS BIGINT)")
            .as("gap_micro"))
        .unionAll(bins.agg(lit(-1L).as("bin"),
          sum(col("n")).cast("long").as("n"),
          lit(null).cast("long").as("conf_micro"),
          lit(null).cast("long").as("acc_micro"),
          expr("""CAST(sum(CAST(abs(k * 1000000 - sump)
            |  AS DECIMAL(38,0))) div sum(n) AS BIGINT)""".stripMargin)
            .as("gap_micro")))
        .orderBy(col("bin"))
    },

    // ---- Isotonic (PAV) recalibration of a sequence model — the FIX
    //      to the miscalibration q262's ECE only MEASURES: learn the
    //      monotone map raw-score → calibrated probability. The model
    //      is q240's next=purchase predictor crossed with hour-of-day
    //      (richer score distribution ⇒ a real reliability diagram;
    //      trained on the first half-month, evaluated on the second).
    //      The isotonic fit uses the exact MINIMAX characterization
    //      fit(b) = max_{j≤b} min_{k≥b} mean(j..k) — every segment
    //      mean is one integer floor division of cumulative (k, n)
    //      sums (micro units, all non-negative, so Spark div ≡ DuckDB
    //      // — no negative-truncation seam), and min/max over
    //      integers is engine-exact, so the pooled fit hashes
    //      bit-for-bit. PAV's O(B) stack walk is sequential; minimax
    //      is its closed form over the O(B²) segment grid — B = score
    //      bins (≤ 50), so the grid is constant-sized and fully
    //      parallel. Output is monotone by construction (the max's
    //      j-set only grows with b). Scale: one user-keyed lead
    //      window + an O(types·24) model broadcast; everything past
    //      the bin agg is O(B²) rows. ----
    QueryDef.sql("q281_isotonic_calibration",
      """WITH seq AS (SELECT user_id, event_type,
        |    CAST(epoch_us(ts) // 3600000000 % 24 AS BIGINT) AS hod,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt_us
        |  FROM events),
        |pairs AS (SELECT event_type AS cur, hod, nxt, nxt_us FROM seq
        |  WHERE nxt IS NOT NULL),
        |tr AS (SELECT cur, hod, CAST(count(*) AS BIGINT) AS n_train,
        |    CAST(sum(CASE WHEN nxt = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k_tr
        |  FROM pairs WHERE nxt_us < 1705363200000000 GROUP BY cur, hod),
        |pm AS (SELECT cur, hod,
        |    CAST(k_tr * 1000000 // n_train AS BIGINT) AS p FROM tr),
        |tev AS (SELECT CASE WHEN nxt = 'purchase' THEN 1 ELSE 0 END
        |      AS y, pm.p
        |  FROM pairs JOIN pm ON pm.cur = pairs.cur AND pm.hod = pairs.hod
        |  WHERE nxt_us >= 1705363200000000),
        |bins AS (SELECT p // 20000 AS bin, CAST(count(*) AS BIGINT)
        |      AS n, CAST(sum(y) AS BIGINT) AS k FROM tev GROUP BY 1),
        |ix AS (SELECT bin, n, k, row_number() OVER (ORDER BY bin) AS i
        |  FROM bins),
        |cum AS (SELECT i, bin, n, k, sum(n) OVER (ORDER BY i) AS cn,
        |    sum(k) OVER (ORDER BY i) AS ck FROM ix),
        |seg AS (SELECT lo.i AS j, hi.i AS kk,
        |    CAST((hi.ck - COALESCE(lo2.ck, 0)) * 1000000
        |      // (hi.cn - COALESCE(lo2.cn, 0)) AS BIGINT) AS m
        |  FROM cum lo JOIN cum hi ON lo.i <= hi.i
        |  LEFT JOIN cum lo2 ON lo2.i = lo.i - 1),
        |mn AS (SELECT b.i, s.j, min(s.m) AS mn
        |  FROM cum b JOIN seg s ON s.j <= b.i AND s.kk >= b.i
        |  GROUP BY b.i, s.j),
        |fit AS (SELECT i, max(mn) AS fit_micro FROM mn GROUP BY i)
        |SELECT c.bin, c.n, c.k,
        |  CAST(c.k * 1000000 // c.n AS BIGINT) AS raw_micro,
        |  CAST(f.fit_micro AS BIGINT) AS fit_micro
        |FROM cum c JOIN fit f ON f.i = c.i
        |ORDER BY c.bin""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      // own lead window (not nextTypePairs): the hour-of-day feature
      // rides the same pass
      val pairs = t(s, d, "events")
        .select(col("event_type").as("cur"),
          expr("unix_micros(ts) div 3600000000 % 24").as("hod"),
          lead(col("event_type"), 1).over(w).as("nxt"),
          lead(unix_micros(col("ts")), 1).over(w).as("nxt_us"))
        .filter(col("nxt").isNotNull)
        .localCheckpoint() // feeds the train agg AND the test scoring
      val pm = pairs.filter(col("nxt_us") < 1705363200000000L)
        .groupBy(col("cur"), col("hod"))
        .agg(count(lit(1)).as("n_train"),
          sum(when(col("nxt") === "purchase", 1).otherwise(0))
            .cast("long").as("k_tr"))
        .select(col("cur"), col("hod"),
          expr("CAST(k_tr * 1000000 div n_train AS BIGINT)").as("p"))
      val bins = pairs.filter(col("nxt_us") >= 1705363200000000L)
        .join(broadcast(pm), Seq("cur", "hod")) // O(types·24) model
        .select(when(col("nxt") === "purchase", 1L).otherwise(0L)
          .as("y"), col("p"))
        .groupBy(expr("p div 20000").as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("k"))
      val cum = bins
        .withColumn("i", row_number().over(Window.orderBy(col("bin"))))
        .withColumn("cn",
          sum(col("n")).over(Window.orderBy(col("i"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("ck",
          sum(col("k")).over(Window.orderBy(col("i"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .localCheckpoint() // O(bins) rows feed seg + anchor + output
      val seg = cum.select(col("i").as("j"), col("cn").as("cnj"),
          col("ck").as("ckj"))
        .join(cum.select(col("i").as("kk"), col("cn").as("cnk"),
          col("ck").as("ckk")), col("j") <= col("kk"))
        .join(cum.select((col("i") + 1).as("j"), col("cn").as("cnp"),
          col("ck").as("ckp")), Seq("j"), "left")
        .select(col("j"), col("kk"), expr(
          """CAST((ckk - COALESCE(ckp, CAST(0 AS BIGINT))) * 1000000
            |  div (cnk - COALESCE(cnp, CAST(0 AS BIGINT))) AS BIGINT)"""
            .stripMargin).as("m"))
      val fit = cum.select(col("i"))
        .join(seg, col("j") <= col("i") && col("kk") >= col("i"))
        .groupBy(col("i"), col("j")).agg(min(col("m")).as("mn"))
        .groupBy(col("i")).agg(max(col("mn")).as("fit_micro"))
      cum.join(fit, "i")
        .select(col("bin"), col("n"), col("k"),
          expr("CAST(k * 1000000 div n AS BIGINT)").as("raw_micro"),
          col("fit_micro").cast("long").as("fit_micro"))
        .orderBy(col("bin"))
    },

    // ---- Local clustering coefficient distribution over the sparse
    //      1-minute co-occurrence graph: per-node lcc = 2·tri(v) /
    //      (deg·(deg−1)) in exact integer micro, reported as a decile
    //      histogram (decile −1 = degree-<2 nodes, 10 = perfect
    //      cliques) plus a decile-100 mean row — the per-node
    //      refinement of q126's global triangle count and the
    //      standard small-world readout. Per-node triangle counts
    //      come from the SAME oriented a<b<c edge self-join as q126's
    //      oracle (each triangle credits its three corners once).
    //      Scale: the wedge join is O(m^(3/2))-bounded like q126, the
    //      per-node fold and degree agg are node-keyed, the histogram
    //      O(11). ----
    QueryDef.sql("q265_lcc_histogram",
      s"""WITH ${coocEdgesCte(60000000L)},
        |tri AS (SELECT e1.x AS a, e1.y AS b2, e2.y AS c FROM e e1
        |  JOIN e e2 ON e2.x = e1.y
        |  JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
        |tv AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM (
        |    SELECT a AS v FROM tri UNION ALL SELECT b2 FROM tri
        |    UNION ALL SELECT c FROM tri) GROUP BY v),
        |deg AS (SELECT u AS v, CAST(count(*) AS BIGINT) AS d FROM
        |  (SELECT x AS u FROM e UNION ALL SELECT y FROM e) GROUP BY u),
        |lcc AS (SELECT deg.v, CASE WHEN d < 2 THEN NULL
        |    ELSE CAST(2 * COALESCE(t, 0) * 1000000 // (d * (d - 1))
        |      AS BIGINT) END AS l
        |  FROM deg LEFT JOIN tv ON tv.v = deg.v),
        |hist AS (SELECT CAST(COALESCE(l // 100000, -1) AS BIGINT)
        |      AS decile, CAST(count(*) AS BIGINT) AS n_nodes
        |  FROM lcc GROUP BY 1)
        |SELECT decile, n_nodes FROM hist
        |UNION ALL
        |SELECT 100, CASE WHEN count(l) = 0 THEN NULL
        |  ELSE CAST(sum(l) // count(l) AS BIGINT) END FROM lcc
        |ORDER BY decile""".stripMargin) { (s, d) =>
      val e = coocEdges(s, d, 60000000L)
        .localCheckpoint() // feeds the wedge join (3×) and the degrees
      val tri = e.select(col("x").as("a"), col("y").as("b2"))
        .join(e.select(col("x").as("b2"), col("y").as("c")), "b2")
        .join(e.select(col("x").as("a"), col("y").as("c")),
          Seq("a", "c"))
      val tv = tri.select(col("a").as("v"))
        .unionAll(tri.select(col("b2").as("v")))
        .unionAll(tri.select(col("c").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("t"))
      val deg = e.select(col("x").as("v"))
        .unionAll(e.select(col("y").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
      val lcc = deg.join(tv, Seq("v"), "left")
        .select(when(col("d") < 2, lit(null).cast("long"))
          .otherwise(expr("""CAST(2 * COALESCE(t, CAST(0 AS BIGINT))
            |  * 1000000 div (d * (d - 1)) AS BIGINT)""".stripMargin))
          .as("l"))
        .localCheckpoint() // O(nodes) rows feed histogram + mean
      lcc.groupBy(coalesce(expr("l div 100000"), lit(-1L)).as("decile"))
        .agg(count(lit(1)).as("n_nodes"))
        .unionAll(lcc.agg(lit(100L).as("decile"),
          when(count(col("l")) === 0, lit(null).cast("long"))
            .otherwise(expr("CAST(sum(l) div count(l) AS BIGINT)"))
            .as("n_nodes")))
        .orderBy(col("decile"))
    },

    // ---- Sliding DAU / trailing-7-day WAU + stickiness (DAU/WAU) —
    //      the product-health ratio, with the EXACT sliding distinct
    //      the naive per-day re-count can't afford: each (user, day)
    //      active cell fans out to the ≤ 7 windows it belongs to
    //      (bounded explode, the banding idea), distinct-per-window,
    //      then a plain count — no count(DISTINCT) expand, no per-day
    //      rescan. Stickiness is one nonneg integer floor division
    //      (WAU ≥ DAU > 0 on every reported day by construction). ----
    QueryDef.sql("q268_dau_wau",
      """WITH ud AS (SELECT DISTINCT user_id AS u,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dy
        |  FROM events),
        |span AS (SELECT max(dy) AS d1 FROM ud),
        |dau AS (SELECT dy, CAST(count(*) AS BIGINT) AS dau FROM ud
        |  GROUP BY dy),
        |uw AS (SELECT DISTINCT u, dy + r AS w FROM ud, range(0, 7) t(r)),
        |wau AS (SELECT w AS dy, CAST(count(*) AS BIGINT) AS wau
        |  FROM uw, span WHERE w <= d1 GROUP BY w)
        |SELECT dau.dy AS day_idx, dau.dau, wau.wau,
        |  CAST(dau.dau * 1000000 // wau.wau AS BIGINT)
        |    AS stickiness_micro
        |FROM dau JOIN wau ON dau.dy = wau.dy
        |ORDER BY day_idx""".stripMargin) { (s, d) =>
      val ud = t(s, d, "events")
        .select(col("user_id").as("u"),
          datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
            .as("dy"))
        .distinct()
        .localCheckpoint() // activity cells feed dau, wau, and span
      val span = ud.agg(max(col("dy")).as("d1"))
      val dau = ud.groupBy(col("dy")).agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("u"), explode(sequence(col("dy"), col("dy") + 6))
          .as("w"))
        .distinct()
        .crossJoin(broadcast(span)).filter(col("w") <= col("d1"))
        .groupBy(col("w").as("dy")).agg(count(lit(1)).as("wau"))
      dau.join(wau, "dy")
        .select(col("dy").as("day_idx"), col("dau"), col("wau"),
          expr("CAST(dau * 1000000 div wau AS BIGINT)")
            .as("stickiness_micro"))
        .orderBy(col("day_idx"))
    },

    // ---- Shapley-value attribution over the q260 touch windows —
    //      the game-theoretic credit split (the fair division between
    //      first- and last-touch's extremes), EXACT because the
    //      channel domain bounds the game: journeys collapse to a
    //      4-bit mask histogram (16 cells), coalition values v(S) are
    //      submask sums, and φ·4! is an INTEGER (the |S|!(n−1−|S|)!
    //      weights {6,2,2,6} stay integral at n = 4) — both engines
    //      replay the whole game bit-for-bit; Σφ·24 = 24·v(full) by
    //      efficiency, which the oracle hash implicitly pins. Scale:
    //      the corpus pays the q260 banded interval join + one pid
    //      mask agg; the game itself is 16-row algebra. ----
    QueryDef.sql("q269_shapley_attribution",
      """WITH pur AS (SELECT user_id AS u, event_id AS pid, ts AS pts
        |  FROM events WHERE event_type = 'purchase'),
        |tch AS (SELECT user_id AS u, event_id AS tid, ts AS tts,
        |    event_type AS ty
        |  FROM events WHERE event_type <> 'purchase'),
        |m AS (SELECT pur.pid, tch.ty FROM pur JOIN tch
        |  ON pur.u = tch.u AND tch.tts >= pur.pts - INTERVAL 24 HOURS
        |    AND tch.tts < pur.pts),
        |jm AS (SELECT pid,
        |    max(CASE WHEN ty = 'click' THEN 1 ELSE 0 END)
        |    + 2 * max(CASE WHEN ty = 'error' THEN 1 ELSE 0 END)
        |    + 4 * max(CASE WHEN ty = 'signup' THEN 1 ELSE 0 END)
        |    + 8 * max(CASE WHEN ty = 'view' THEN 1 ELSE 0 END) AS mask
        |  FROM m GROUP BY pid),
        |cnt AS (SELECT mask, CAST(count(*) AS BIGINT) AS c FROM jm
        |  GROUP BY mask),
        |masks AS (SELECT range AS s FROM range(0, 16)),
        |v AS (SELECT s, CAST(COALESCE(sum(CASE WHEN (cnt.mask & s)
        |      = cnt.mask THEN c END), 0) AS BIGINT) AS v
        |  FROM masks LEFT JOIN cnt ON TRUE GROUP BY s),
        |ch(channel, bit) AS (VALUES ('click', 1), ('error', 2),
        |  ('signup', 4), ('view', 8)),
        |wts(pc, w) AS (VALUES (0, 6), (1, 2), (2, 2), (3, 6)),
        |phi AS (SELECT ch.channel,
        |    CAST(sum(wts.w * (vi.v - vs.v)) AS BIGINT) AS shapley_x24
        |  FROM ch JOIN v vs ON (vs.s & ch.bit) = 0
        |  JOIN v vi ON vi.s = (vs.s | ch.bit)
        |  JOIN wts ON wts.pc = CAST(bit_count(CAST(vs.s AS BIT))
        |    AS INTEGER)
        |  GROUP BY ch.channel),
        |tot AS (SELECT v AS vfull FROM v WHERE s = 15)
        |SELECT channel, shapley_x24,
        |  CASE WHEN vfull = 0 THEN NULL
        |    ELSE CAST(shapley_x24 * 1000000 // (24 * vfull) AS BIGINT)
        |    END AS share_micro
        |FROM phi, tot ORDER BY channel""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("u"), col("event_id").as("pid"),
          col("ts").as("pts"),
          expr("pts - INTERVAL 24 HOURS").as("wstart"))
      val tch = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id").as("u"), col("event_id").as("tid"),
          col("ts").as("tts"), col("event_type").as("ty"))
      val cnt = graft.operators.IntervalJoin.pointInInterval(
          tch, pur, "u", "tts", "wstart", "pts", 86400000000L)
        .groupBy(col("pid"))
        .agg((max(when(col("ty") === "click", 1).otherwise(0))
          + max(when(col("ty") === "error", 1).otherwise(0)) * 2
          + max(when(col("ty") === "signup", 1).otherwise(0)) * 4
          + max(when(col("ty") === "view", 1).otherwise(0)) * 8)
          .as("mask"))
        .groupBy(col("mask")).agg(count(lit(1)).as("c"))
      val v = s.range(0, 16).select(col("id").cast("int").as("s"))
        .join(broadcast(cnt), expr("(mask & s) = mask"), "left")
        .groupBy(col("s"))
        .agg(coalesce(sum(col("c")), lit(0L)).cast("long").as("v"))
        .localCheckpoint() // the 16-row game table feeds three legs
      val ch = s.range(0, 4).select(
        element_at(array(lit("click"), lit("error"), lit("signup"),
          lit("view")), col("id").cast("int") + 1).as("channel"),
        expr("CAST(shiftleft(1, CAST(id AS INT)) AS INT)").as("bit"))
      val wArr = "array(6L, 2L, 2L, 6L)"
      val phi = broadcast(ch)
        .join(v.withColumnRenamed("v", "vs"), expr("(s & bit) = 0"))
        .join(broadcast(v.select(col("s").as("si"), col("v").as("vi"))),
          expr("si = (s | bit)"))
        .select(col("channel"),
          (expr(s"element_at($wArr, CAST(bit_count(s) AS INT) + 1)")
            * (col("vi") - col("vs"))).as("term"))
        .groupBy(col("channel"))
        .agg(sum(col("term")).cast("long").as("shapley_x24"))
      val tot = v.filter(col("s") === 15).select(col("v").as("vfull"))
      phi.crossJoin(broadcast(tot))
        .select(col("channel"), col("shapley_x24"),
          when(col("vfull") === 0, lit(null).cast("long"))
            .otherwise(expr(
              "CAST(shapley_x24 * 1000000 div (24 * vfull) AS BIGINT)"))
            .as("share_micro"))
        .orderBy(col("channel"))
    },

    // ---- Personalized PageRank (random walk with restart) from the
    //      5 most active users — the "users like these" similarity
    //      that seeds recommendations and influence audits; q137's
    //      exact-integer fixed point with the teleport mass landing
    //      on the seed set instead of uniformly (seed-restricted |S|,
    //      CASE-guarded division — see
    //      [[graft.operators.PageRank.personalized]]). The oracle
    //      unrolls the 4 rounds, so the green hash proves the whole
    //      walk including the teleport algebra. Per round: one
    //      edge-keyed join + one dst agg + the O(nodes) teleport
    //      join — the Pregel shape. ----
    QueryDef.sql("q272_personalized_pagerank", pprOracleSql(4)) {
      (s, d) =>
      val seeds = t(s, d, "events").groupBy(col("user_id").as("u"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("u")).limit(5)
        .select(col("u"))
      graft.operators.PageRank.personalized(coocEdges(s, d), seeds, 4)
        .orderBy(col("r").desc, col("u")).limit(10)
        .select(col("u"), col("r").as("ppr"))
    },

    // ---- G-test (log-likelihood ratio) of lang × source
    //      independence — q170's χ² twin with the opposite zero-cell
    //      behavior: O = 0 contributes NOTHING to G (0·ln(0/E) → 0)
    //      where χ² charges the expected mass, which is why both
    //      statistics ship (they disagree exactly on sparse grids).
    //      Same determinism ladder as q170: the contingency table is
    //      exact integers, each cell's O·ln(O·N/(rt·ct)) is ONE
    //      identical double tree whose 6-dp round absorbs ln ulp
    //      (q90's fence), and the grid sums as DECIMAL(28,6) —
    //      aggregation-order-independent. One corpus groupBy, O(r·c)
    //      everything after. ----
    QueryDef.sql("q276_g_test",
      """WITH o0 AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM o0
        |  GROUP BY lang),
        |c AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct FROM o0
        |  GROUP BY source),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o0),
        |grid AS (SELECT r.lang, c.source, r.rt, c.ct,
        |    coalesce(o0.o, 0) AS o
        |  FROM r CROSS JOIN c
        |  LEFT JOIN o0 ON o0.lang = r.lang AND o0.source = c.source),
        |cells AS (SELECT g.*, n.n,
        |    CASE WHEN g.o = 0 THEN CAST(0 AS DECIMAL(28,6))
        |      ELSE CAST(round(g.o * ln(CAST(g.o AS DOUBLE) * n.n
        |        / (CAST(g.rt AS DOUBLE) * g.ct)), 6)
        |        AS DECIMAL(28,6)) END AS term
        |  FROM grid g CROSS JOIN n)
        |SELECT CAST(max(n) AS BIGINT) AS n_docs,
        |  CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
        |    AS BIGINT) AS dof,
        |  CAST(2 * sum(term) AS DOUBLE) AS g_stat
        |FROM cells""".stripMargin) { (s, d) =>
      val o0 = t(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("o"))
        .localCheckpoint() // O(r·c) table feeds margins and the grid
      val r = o0.groupBy(col("lang"))
        .agg(sum(col("o")).cast("long").as("rt"))
      val c = o0.groupBy(col("source"))
        .agg(sum(col("o")).cast("long").as("ct"))
      val n = o0.agg(sum(col("o")).cast("long").as("n"))
      val grid = broadcast(r).crossJoin(broadcast(c))
        .join(o0, Seq("lang", "source"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .crossJoin(broadcast(n))
      val cells = grid.withColumn("term",
        when(col("o") === 0, lit(0).cast("decimal(28,6)"))
          .otherwise(round(col("o") * log(col("o").cast("double")
              * col("n") / (col("rt").cast("double") * col("ct"))), 6)
            .cast("decimal(28,6)")))
      cells.agg(max(col("n")).as("n_docs"),
        ((countDistinct(col("lang")) - 1)
          * (countDistinct(col("source")) - 1)).cast("long").as("dof"),
        (lit(2) * sum(col("term"))).cast("double").as("g_stat"))
    },

    // ---- Jackknife standard error of each event type's traffic
    //      share (leave-one-DAY-out): the assumption-free error bar a
    //      metrics pipeline puts on a ratio — days are the natural
    //      exchangeable blocks (within-day events correlate, the
    //      i.i.d. bootstrap would understate the variance, and
    //      deterministic day blocks need no RNG). θ₍ᵢ₎ = share with
    //      day i removed, exact integer micro via one guarded floor
    //      division (all non-negative); the variance moves through
    //      the EXACT integer identity D = (J−1)·(J·Σθ² − (Σθ)²) and
    //      meets float only at the final sqrt — IEEE-correctly-rounded
    //      on both engines, so the rounded SE is deterministic (the
    //      q198 libm rule: sqrt is the one transcendental-free escape
    //      hatch). Scale: ONE corpus-sized (etype, day) cell agg
    //      (checkpointed — margins, totals, and the leave-one-out
    //      grid all read it); everything after is O(types·days).
    //      Single-day corpus ⇒ the loo denominator is 0 for its only
    //      row ⇒ guarded NULL θ ⇒ SE NULL, J<2 (DegenerateInputSpec).
    QueryDef.sql("q282_jackknife_se", jackknifeOracle) { (s, d) =>
      val cell = t(s, d, "events")
        .select(col("event_type").as("etype"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy(col("etype"), col("day"))
        .agg(count(lit(1)).as("k"))
        .localCheckpoint() // O(types·days) feeds all four readers
      jackknifeTail(cell)
    },

    // ---- Streaming jackknife twin: the (etype, day) cell counts are
    //      a plain associative complete-mode aggregation (q220's
    //      shape — O(types·days) state, closed days compactable), and
    //      the WHOLE leave-one-out analysis applies AT READ through
    //      the SHARED jackknifeTail against q282's VERBATIM oracle —
    //      one green hash proves the error-bar report streamable with
    //      no batch recompute. ----
    QueryDef.sql("q284_stream_jackknife", jackknifeOracle) { (s, d) =>
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"), col("ts"))
      val feedDir = graft.bench.BenchFeeds.feed(s, d, "evdayfeed",
        idCol = "event_id", checkSpan = false)(ev)
      val sink = graft.bench.BenchFeeds.sinkName("q284_jackknife")
      graft.streaming.StreamRun.withStatePartitions(s, 8) {
        val q = s.readStream
          .schema(s.read.parquet(feedDir).schema)
          .option("maxFilesPerTrigger", 2)
          .parquet(feedDir)
          .select(col("event_type").as("etype"),
            expr("CAST(ts AS BIGINT) div 86400").as("day"))
          .groupBy(col("etype"), col("day"))
          .agg(count(lit(1)).as("k"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
      }
      jackknifeTail(s.table(sink)
        .select(col("etype"), col("day"), col("k").cast("long").as("k"))
        .localCheckpoint())
    },

    // ---- Mann-Kendall trend test (tie-corrected): is daily event
    //      volume trending per type, assuming no distribution shape?
    //      The significance companion to q232's Theil-Sen slope (that
    //      one says HOW steep, this one says WHETHER to believe it).
    //      All integer until the last row: S = Σ_{i<j} sign(c_j−c_i)
    //      and the tie-corrected variance numerator var18 =
    //      n(n−1)(2n+5) − Σ t(t−1)(2t+5) are exact integers off the
    //      checkpointed O(types·days) daily table; the day-pair fold
    //      is O(types·days²) — days are bounded by the calendar, not
    //      the corpus, so 100× the data widens only the daily agg.
    //      z applies the continuity correction (S∓1)/√(var18/18);
    //      sqrt + one division are the only float ops (q165's fence),
    //      NULL when var18 = 0 (a constant series has no trend to
    //      test). ----
    QueryDef.sql("q290_mann_kendall",
      """WITH daily AS (SELECT event_type AS etype,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT a.etype,
        |    CAST(sum(CASE WHEN b.c > a.c THEN 1
        |      WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM daily a JOIN daily b
        |    ON b.etype = a.etype AND b.day > a.day
        |  GROUP BY a.etype),
        |n AS (SELECT etype, CAST(count(*) AS BIGINT) AS n
        |  FROM daily GROUP BY etype),
        |ties AS (SELECT etype,
        |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
        |  FROM (SELECT etype, c, CAST(count(*) AS BIGINT) AS t
        |    FROM daily GROUP BY etype, c) GROUP BY etype)
        |SELECT n.etype AS etype, n.n AS n_days,
        |  COALESCE(s.s_stat, 0) AS s_stat,
        |  n.n * (n.n - 1) * (2 * n.n + 5) - ties.tt AS var18,
        |  CASE WHEN n.n * (n.n - 1) * (2 * n.n + 5) - ties.tt > 0 THEN
        |    round((COALESCE(s.s_stat, 0)
        |        - CASE WHEN COALESCE(s.s_stat, 0) > 0 THEN 1
        |          WHEN COALESCE(s.s_stat, 0) < 0 THEN -1 ELSE 0 END)
        |      / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tt
        |        AS DOUBLE) / 18), 6)
        |  END AS z
        |FROM n JOIN ties ON ties.etype = n.etype
        |LEFT JOIN s ON s.etype = n.etype
        |ORDER BY etype""".stripMargin) { (s, d) =>
      val daily = t(s, d, "events")
        .select(col("event_type").as("etype"),
          expr("CAST(ts AS BIGINT) div 86400").as("day"))
        .groupBy(col("etype"), col("day"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // O(types·days): feeds the pair fold, the
                           // tie table and the day count
      val a = daily.select(col("etype"), col("day").as("da"),
        col("c").as("ca"))
      val b = daily.select(col("etype"), col("day").as("db"),
        col("c").as("cb"))
      // calendar-bounded pair fold: the broadcast side is the whole
      // aggregated daily table (types·days rows at any corpus size)
      val sS = a.join(broadcast(b), Seq("etype"))
        .filter(col("db") > col("da"))
        .groupBy(col("etype"))
        .agg(sum(when(col("cb") > col("ca"), 1L)
            .when(col("cb") < col("ca"), -1L).otherwise(0L))
          .cast("long").as("s_stat"))
      val n = daily.groupBy(col("etype"))
        .agg(count(lit(1)).as("n"))
      val ties = daily.groupBy(col("etype"), col("c"))
        .agg(count(lit(1)).as("t"))
        .groupBy(col("etype"))
        .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5))
          .cast("long").as("tt"))
      n.join(ties, "etype").join(sS, Seq("etype"), "left")
        .select(col("etype"), col("n").as("n_days"),
          coalesce(col("s_stat"), lit(0L)).as("s_stat"),
          (col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tt"))
            .as("var18"))
        .withColumn("z",
          when(col("var18") > 0,
            round((col("s_stat") - signum(col("s_stat")).cast("long"))
              / sqrt(col("var18").cast("double") / 18), 6)))
        .orderBy(col("etype"))
    },

    // ---- Cliff's delta between source pairs: the ordinal effect
    //      size δ = P(X>Y) − P(X<Y) on document lengths — q182's
    //      Mann-Whitney says WHETHER two feeds differ, this says HOW
    //      MUCH, on a [−1, 1] scale that survives any monotone
    //      transform. Exact integers end to end: the greater/less
    //      pair counts are products of VALUE-CELL counts (the q246
    //      discipline — distinct-length cells, never document pairs),
    //      so the fold is O(cells²) where cells are bounded by the
    //      length domain, not the corpus; δ lands as sign·(abs·10⁶
    //      div n₁n₂) — abs before div because Spark truncates and
    //      DuckDB floors negative integer division. ----
    QueryDef.sql("q293_cliffs_delta",
      """WITH cell AS (SELECT source, n_chars AS v,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY source, n_chars),
        |n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
        |  FROM cell GROUP BY source),
        |pairs AS (SELECT a.source AS s1, b.source AS s2,
        |    CAST(sum(CASE WHEN a.v > b.v
        |      THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS BIGINT)
        |      AS gt,
        |    CAST(sum(CASE WHEN a.v < b.v
        |      THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS BIGINT)
        |      AS lt
        |  FROM cell a JOIN cell b ON a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT p.s1 AS s1, p.s2 AS s2, n1.n AS n1, n2.n AS n2,
        |  p.gt AS gt, p.lt AS lt,
        |  (CASE WHEN p.gt >= p.lt THEN 1 ELSE -1 END)
        |    * ((abs(p.gt - p.lt) * 1000000) // (n1.n * n2.n))
        |    AS delta_micro
        |FROM pairs p JOIN n n1 ON n1.source = p.s1
        |JOIN n n2 ON n2.source = p.s2
        |ORDER BY s1, s2""".stripMargin) { (s, d) =>
      val cell = t(s, d, "documents")
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // O(sources·distinct lengths): feeds the
                           // grid, the cumulative table, both margins
      val n = cell.groupBy(col("source"))
        .agg(sum(col("c")).cast("long").as("n"))
      // O(cells·sources) pair fold (guide §1.2 — fix the algorithm):
      // gt(s1,s2) = Σ_{va>vb} c1·c2 = Σ_v c1(v)·below2(v) with
      // below2/above2 the counterpart's STRICTLY-below/above
      // cumulative counts over the GLOBAL value grid (cum-minus-self
      // excludes ties from both, exactly like the va>vb / va<vb
      // predicates). This replaces the cells² nested-loop fold
      // (distinct-length cells squared — quadratic in the length
      // domain) with one window over the densified grid plus one
      // v-keyed equi-join. Exact integers throughout: cumulative
      // counts are longs, products decimal(38,0) like the fold they
      // replace, and integer sums commute — bit-identical results.
      val dense = cell.select(col("v")).distinct()
        .crossJoin(broadcast(n)) // n doubles as the source list
        .join(broadcast(cell), Seq("source", "v"), "left")
        .select(col("source"), col("v"), col("n"),
          coalesce(col("c"), lit(0L)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("v"))
      val other = dense.withColumn("cum", sum(col("c")).over(w))
        .select(col("source").as("s2"), col("v"),
          (col("cum") - col("c")).as("below"),
          (col("n") - col("cum")).as("above"),
          col("n").as("n2"))
      // both margins fall out of the SAME aggregate: within a (s1,s2)
      // group each s1 cell appears exactly once (the v-join matches
      // every source at every grid value), so Σ ca IS n1, and n2 is
      // constant per group — no margin joins, no re-read of `n`
      cell
        .select(col("source").as("s1"), col("v"), col("c").as("ca"))
        .join(broadcast(other), Seq("v"))
        .filter(col("s1") < col("s2"))
        .groupBy(col("s1"), col("s2"))
        .agg(sum(col("ca")).cast("long").as("n1"),
          max(col("n2")).as("n2"),
          sum(col("ca").cast("decimal(38,0)") * col("below"))
            .cast("long").as("gt"),
          sum(col("ca").cast("decimal(38,0)") * col("above"))
            .cast("long").as("lt"))
        .select(col("s1"), col("s2"), col("n1"), col("n2"),
          col("gt"), col("lt"),
          (when(col("gt") >= col("lt"), 1L).otherwise(-1L)
            * expr("(abs(gt - lt) * 1000000) div (n1 * n2)"))
            .as("delta_micro"))
        .orderBy(col("s1"), col("s2"))
    },

    // ---- Newman modularity of q253's LPA communities: are the
    //      detected communities BETTER than chance? The quality
    //      metric every community detection needs before anyone acts
    //      on it. Exact integers end to end: Q·4m² = Σ_c (4m·l_c −
    //      d_c²) over intra-edge counts l_c and degree sums d_c —
    //      products in DECIMAL/HUGEINT, one sign-guarded micro
    //      division at the end (Q ∈ [−½, 1] can be negative; abs
    //      before div for the trunc/floor seam). The oracle replays
    //      the SAME 4-round min-label LPA walk (q253's unrolled CTEs)
    //      so a green hash proves labels AND quality together. Scale:
    //      LPA's per-round Pregel joins; the modularity read-out adds
    //      two label-keyed joins on the edge table + O(communities)
    //      algebra. ----
    QueryDef.sql("q296_modularity", {
      val rounds = (1 to 4).map { i =>
        s"""c$i AS (SELECT s.v, l.lab, count(*) AS cnt FROM sym s
           |  JOIN l${i - 1} l ON l.v = s.n GROUP BY s.v, l.lab),
           |l$i AS (SELECT v, lab FROM (SELECT v, lab, row_number()
           |    OVER (PARTITION BY v ORDER BY cnt DESC, lab) AS rn
           |  FROM c$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${coocEdgesCte(60000000L)},
         |sym AS (SELECT x AS v, y AS n FROM e
         |  UNION ALL SELECT y AS v, x AS n FROM e),
         |l0 AS (SELECT DISTINCT v, v AS lab FROM sym),
         |$rounds,
         |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
         |intra AS (SELECT la.lab AS community,
         |    CAST(count(*) AS BIGINT) AS l_c
         |  FROM e JOIN l4 la ON la.v = e.x JOIN l4 lb ON lb.v = e.y
         |  WHERE la.lab = lb.lab GROUP BY la.lab),
         |deg AS (SELECT l4.lab AS community,
         |    CAST(count(*) AS BIGINT) AS d_c
         |  FROM sym JOIN l4 ON l4.v = sym.v GROUP BY l4.lab),
         |mem AS (SELECT lab AS community, CAST(count(*) AS BIGINT)
         |    AS n_members FROM l4 GROUP BY lab),
         |con AS (SELECT deg.community, mem.n_members,
         |    COALESCE(intra.l_c, 0) AS l_c, deg.d_c,
         |    4 * CAST(m.m AS HUGEINT) * COALESCE(intra.l_c, 0)
         |      - CAST(deg.d_c AS HUGEINT) * deg.d_c AS contrib
         |  FROM deg JOIN mem ON mem.community = deg.community
         |  LEFT JOIN intra ON intra.community = deg.community, m),
         |tot AS (SELECT CAST(sum(contrib) AS HUGEINT) AS tc FROM con)
         |SELECT c.community AS community, c.n_members, c.l_c, c.d_c,
         |  CAST(c.contrib AS BIGINT) AS contrib,
         |  CAST((CASE WHEN t.tc >= 0 THEN 1 ELSE -1 END)
         |    * ((abs(t.tc) * 1000000)
         |      // (4 * CAST(m.m AS HUGEINT) * m.m)) AS BIGINT)
         |    AS q_total_micro
         |FROM con c, tot t, m
         |ORDER BY community""".stripMargin
    }) { (s, d) =>
      val edges = coocEdges(s, d, 60000000L).localCheckpoint()
      val lab = graft.operators.LabelPropagation.labels(edges, 4)
      val m = edges.agg(count(lit(1)).as("m"))
      val intra = edges
        .join(lab.select(col("v").as("x"), col("lab").as("labx")), "x")
        .join(lab.select(col("v").as("y"), col("lab").as("laby")), "y")
        .filter(col("labx") === col("laby"))
        .groupBy(col("labx").as("community"))
        .agg(count(lit(1)).as("l_c"))
      val sym = edges.select(col("x").as("v"))
        .unionAll(edges.select(col("y").as("v")))
      val deg = sym.join(lab, "v")
        .groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("d_c"))
      val mem = lab.groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("n_members"))
      val con = deg.join(mem, "community")
        .join(intra, Seq("community"), "left")
        .crossJoin(broadcast(m))
        .select(col("community"), col("n_members"),
          coalesce(col("l_c"), lit(0L)).as("l_c"), col("d_c"),
          (lit(4).cast("decimal(38,0)") * col("m")
            * coalesce(col("l_c"), lit(0L))
            - col("d_c").cast("decimal(38,0)") * col("d_c"))
            .as("contrib"))
        .localCheckpoint() // O(communities): feeds the total AND the
                           // report rows
      val tot = con.agg(sum(col("contrib")).as("tc"))
      con.crossJoin(broadcast(tot)).crossJoin(broadcast(m))
        .select(col("community"), col("n_members"), col("l_c"),
          col("d_c"), col("contrib").cast("long").as("contrib"),
          (when(col("tc") >= 0, 1L).otherwise(-1L)
            * expr("""CAST((abs(tc) * 1000000)
              |  div (4 * CAST(m AS DECIMAL(38,0)) * m)
              |  AS BIGINT)""".stripMargin))
            .as("q_total_micro"))
        .orderBy(col("community"))
    },

    // ---- Krippendorff's alpha (nominal): chance-corrected agreement
    //      for the labeling pipelines behind every supervised filter
    //      — q195's kappa handles TWO raters; alpha generalizes to
    //      any panel (here 3 deterministic md5-perturbed annotators
    //      per doc) and to missing data. Exact integers: per-unit
    //      ordered disagreeing pairs D2_u = m² − Σ_c n_uc², category
    //      marginals n_c, and α = 1 − D2(n−1)/(2(n² − Σn_c²)) as ONE
    //      nonneg micro floor division (Do/De ≥ 0 always). The corpus
    //      pays the 3× annotation fan-out + a (unit, label) agg;
    //      everything after is O(categories). A single-category
    //      panel (n² = Σn_c²) has no chance-disagreement to correct
    //      against — NULL, not a 0/0 (DegenerateInputSpec). ----
    QueryDef.sql("q297_krippendorff_alpha",
      """WITH r AS (SELECT d.doc_id AS u,
        |    CASE WHEN substring(md5(CAST(d.doc_id AS VARCHAR) || ':'
        |        || CAST(k.k AS VARCHAR)), 1, 2) < '20'
        |      THEN 'zz' ELSE d.lang END AS c
        |  FROM documents d CROSS JOIN (VALUES (1), (2), (3)) k(k)),
        |uc AS (SELECT u, c, CAST(count(*) AS BIGINT) AS nuc
        |  FROM r GROUP BY u, c),
        |du AS (SELECT u, 9 - CAST(sum(nuc * nuc) AS BIGINT) AS d2u
        |  FROM uc GROUP BY u),
        |d2 AS (SELECT CAST(sum(d2u) AS BIGINT) AS d2,
        |    CAST(count(*) AS BIGINT) AS n_units FROM du),
        |marg AS (SELECT c, CAST(sum(nuc) AS BIGINT) AS nc
        |  FROM uc GROUP BY c),
        |nn AS (SELECT CAST(sum(nc) AS BIGINT) AS n,
        |    CAST(sum(CAST(nc AS HUGEINT) * nc) AS HUGEINT) AS sq
        |  FROM marg)
        |SELECT d2.n_units AS n_units, nn.n AS n_ratings, d2.d2 AS d2,
        |  CAST(CAST(nn.n AS HUGEINT) * nn.n - nn.sq AS BIGINT)
        |    AS de_den,
        |  CASE WHEN CAST(nn.n AS HUGEINT) * nn.n - nn.sq > 0 THEN
        |    1000000 - CAST((CAST(d2.d2 AS HUGEINT) * (nn.n - 1)
        |      * 1000000)
        |      // (2 * (CAST(nn.n AS HUGEINT) * nn.n - nn.sq))
        |      AS BIGINT)
        |  END AS alpha_micro
        |FROM d2, nn""".stripMargin) { (s, d) =>
      val r = t(s, d, "documents")
        .crossJoin(broadcast(s.range(1, 4).select(col("id").as("k"))))
        .select(col("doc_id").as("u"),
          when(substring(md5(concat(col("doc_id").cast("string"),
              lit(":"), col("k").cast("string")).cast("binary")),
            1, 2) < "20", "zz").otherwise(col("lang")).as("c"))
      val uc = r.groupBy(col("u"), col("c"))
        .agg(count(lit(1)).as("nuc"))
        .localCheckpoint() // (unit, label) support: feeds the per-unit
                           // disagreement AND the category marginals
      val d2 = uc.groupBy(col("u"))
        .agg((lit(9L) - sum(col("nuc") * col("nuc"))).as("d2u"))
        .agg(sum(col("d2u")).cast("long").as("d2"),
          count(lit(1)).as("n_units"))
      val nn = uc.groupBy(col("c"))
        .agg(sum(col("nuc")).cast("long").as("nc"))
        .agg(sum(col("nc")).cast("long").as("n"),
          sum(col("nc").cast("decimal(38,0)") * col("nc")).as("sq"))
      d2.crossJoin(broadcast(nn))
        .select(col("n_units"), col("n").as("n_ratings"), col("d2"),
          (col("n").cast("decimal(38,0)") * col("n") - col("sq"))
            .cast("long").as("de_den"),
          when(col("n").cast("decimal(38,0)") * col("n") - col("sq") > 0,
            lit(1000000L) - expr(
              """CAST((CAST(d2 AS DECIMAL(38,0)) * (n - 1) * 1000000)
                |  div (2 * (CAST(n AS DECIMAL(38,0)) * n - sq))
                |  AS BIGINT)""".stripMargin))
            .as("alpha_micro"))
    },

    // ---- Cochran-Armitage trend test: does a BINARY outcome rise
    //      monotonically with an ORDERED dose? q170's χ² sees "some
    //      association"; CA spends its one degree of freedom on the
    //      trend, which is what dose-response questions actually ask.
    //      Dose = user activity quintile (exact rank bucket, q193's
    //      (r−1)·5 div N discipline with a deterministic tie-break);
    //      outcome = purchase-over-indexed (5·purchases > events).
    //      All integers until the last row: the trend numerator
    //      A·N − B·R and the variance pieces R(N−R)(C·N − B²) are
    //      DECIMAL-exact cross-multiplications; χ²·1000 is one
    //      integer division (numerator squared in DECIMAL), NULL when
    //      the outcome or dose is constant. One per-user agg, one
    //      quintile window over the O(users) table, O(5) algebra. ----
    QueryDef.sql("q303_cochran_armitage",
      """WITH u AS (SELECT user_id,
        |    CAST(count(*) AS BIGINT) AS ev,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS pur
        |  FROM events GROUP BY user_id),
        |rk AS (SELECT ev, pur, row_number()
        |    OVER (ORDER BY ev, user_id) AS r,
        |    count(*) OVER () AS nu FROM u),
        |dosed AS (SELECT ((r - 1) * 5) // nu + 1 AS dose,
        |    CASE WHEN 5 * pur > ev THEN 1 ELSE 0 END AS y FROM rk),
        |cell AS (SELECT dose, CAST(count(*) AS BIGINT) AS n_i,
        |    CAST(sum(y) AS BIGINT) AS r_i FROM dosed GROUP BY dose),
        |agg AS (SELECT CAST(sum(n_i) AS BIGINT) AS n,
        |    CAST(sum(r_i) AS BIGINT) AS r,
        |    CAST(sum(dose * r_i) AS BIGINT) AS a,
        |    CAST(sum(dose * n_i) AS BIGINT) AS b,
        |    CAST(sum(dose * dose * n_i) AS BIGINT) AS c
        |  FROM cell)
        |SELECT n AS n_users, r AS n_positive,
        |  CAST(CAST(a AS HUGEINT) * n - CAST(b AS HUGEINT) * r
        |    AS BIGINT) AS trend_num,
        |  CASE WHEN r > 0 AND r < n
        |      AND CAST(c AS HUGEINT) * n - CAST(b AS HUGEINT) * b > 0
        |    THEN CAST(((CAST(a AS HUGEINT) * n - CAST(b AS HUGEINT)
        |        * r) * (CAST(a AS HUGEINT) * n - CAST(b AS HUGEINT)
        |        * r) * n * 1000)
        |      // (CAST(r AS HUGEINT) * (n - r)
        |        * (CAST(c AS HUGEINT) * n - CAST(b AS HUGEINT) * b))
        |      AS BIGINT)
        |  END AS chi2_milli
        |FROM agg""".stripMargin) { (s, d) =>
      val u = t(s, d, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("ev"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("pur"))
      // O(users): the rank window and total run here, never on events
      val rk = u
        .withColumn("r", row_number().over(
          Window.orderBy(col("ev"), col("user_id"))).cast("long"))
        .withColumn("nu", count(lit(1)).over(
          Window.partitionBy()).cast("long"))
      val cell = rk
        .select(expr("((r - 1) * 5) div nu + 1").as("dose"),
          when(col("pur") * 5 > col("ev"), 1L).otherwise(0L).as("y"))
        .groupBy(col("dose"))
        .agg(count(lit(1)).as("n_i"), sum(col("y")).cast("long").as("r_i"))
      cell.agg(sum(col("n_i")).cast("long").as("n"),
          sum(col("r_i")).cast("long").as("r"),
          sum(col("dose") * col("r_i")).cast("long").as("a"),
          sum(col("dose") * col("n_i")).cast("long").as("b"),
          sum(col("dose") * col("dose") * col("n_i")).cast("long").as("c"))
        .select(col("n").as("n_users"), col("r").as("n_positive"),
          (col("a").cast("decimal(38,0)") * col("n")
            - col("b").cast("decimal(38,0)") * col("r"))
            .cast("long").as("trend_num"),
          when(col("r") > 0 && col("r") < col("n")
              && col("c").cast("decimal(38,0)") * col("n")
                - col("b").cast("decimal(38,0)") * col("b") > 0,
            expr("""CAST(((CAST(a AS DECIMAL(38,0)) * n
              |    - CAST(b AS DECIMAL(38,0)) * r)
              |    * (CAST(a AS DECIMAL(38,0)) * n
              |    - CAST(b AS DECIMAL(38,0)) * r) * n * 1000)
              |  div (CAST(r AS DECIMAL(38,0)) * (n - r)
              |    * (CAST(c AS DECIMAL(38,0)) * n
              |      - CAST(b AS DECIMAL(38,0)) * b))
              |  AS BIGINT)""".stripMargin))
            .as("chi2_milli"))
    },

    // ---- Inverse-propensity-weighted ATE: the confounder-adjusted
    //      treatment effect q165's raw A/B difference cannot give
    //      when treatment is NOT randomized. Treatment = click-heavy
    //      user (clicks > views), outcome = purchase-over-indexed,
    //      confounder = activity quintile (the same exact rank
    //      buckets as q303 — heavy users click more AND buy more, so
    //      the raw difference is confounded by construction).
    //      Propensity per stratum is the exact rational t_x/n_x;
    //      Horvitz-Thompson clears it to integers per stratum:
    //      Σ_x y1_x·n_x·10⁶ div t_x − Σ_x y0_x·n_x·10⁶ div (n_x−t_x),
    //      each a nonneg floor division, divided once by N. Strata
    //      violating positivity (t_x = 0 or t_x = n_x) are DROPPED
    //      and counted — the honest IPW answer, never a div-by-zero
    //      (DegenerateInputSpec: a fixture where every stratum
    //      violates yields NULL ATE and n_valid_strata = 0). ----
    QueryDef.sql("q304_ipw_ate",
      """WITH u AS (SELECT user_id,
        |    CAST(count(*) AS BIGINT) AS ev,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS pur,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
        |      END) AS BIGINT) AS clk,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0
        |      END) AS BIGINT) AS vw
        |  FROM events GROUP BY user_id),
        |rk AS (SELECT *, row_number() OVER (ORDER BY ev, user_id) AS r,
        |    count(*) OVER () AS nu FROM u),
        |lab AS (SELECT ((r - 1) * 5) // nu + 1 AS x,
        |    CASE WHEN clk > vw THEN 1 ELSE 0 END AS t,
        |    CASE WHEN 5 * pur > ev THEN 1 ELSE 0 END AS y FROM rk),
        |st AS (SELECT x, CAST(count(*) AS BIGINT) AS n_x,
        |    CAST(sum(t) AS BIGINT) AS t_x,
        |    CAST(sum(t * y) AS BIGINT) AS y1_x,
        |    CAST(sum((1 - t) * y) AS BIGINT) AS y0_x
        |  FROM lab GROUP BY x),
        |agg AS (SELECT CAST(sum(n_x) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN t_x > 0 AND t_x < n_x THEN 1 END)
        |      AS BIGINT) AS n_valid,
        |    CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(COALESCE(sum(CASE WHEN t_x > 0 AND t_x < n_x
        |      THEN n_x END), 0) AS BIGINT) AS n_used,
        |    CAST(COALESCE(sum(CASE WHEN t_x > 0 AND t_x < n_x
        |      THEN (y1_x * n_x * 1000000) // t_x END), 0) AS BIGINT)
        |      AS s1,
        |    CAST(COALESCE(sum(CASE WHEN t_x > 0 AND t_x < n_x
        |      THEN (y0_x * n_x * 1000000) // (n_x - t_x) END), 0)
        |      AS BIGINT) AS s0
        |  FROM st)
        |SELECT n AS n_users, n_strata, n_valid AS n_valid_strata,
        |  CASE WHEN n_used > 0 THEN
        |    (CASE WHEN s1 >= s0 THEN 1 ELSE -1 END)
        |      * (abs(s1 - s0) // n_used)
        |  END AS ate_ipw_micro
        |FROM agg""".stripMargin) { (s, d) =>
      val u = t(s, d, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("ev"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("pur"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("clk"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("long").as("vw"))
      val rk = u
        .withColumn("r", row_number().over(
          Window.orderBy(col("ev"), col("user_id"))).cast("long"))
        .withColumn("nu", count(lit(1)).over(
          Window.partitionBy()).cast("long"))
      val st = rk
        .select(expr("((r - 1) * 5) div nu + 1").as("x"),
          when(col("clk") > col("vw"), 1L).otherwise(0L).as("t"),
          when(col("pur") * 5 > col("ev"), 1L).otherwise(0L).as("y"))
        .groupBy(col("x"))
        .agg(count(lit(1)).as("n_x"),
          sum(col("t")).cast("long").as("t_x"),
          sum(col("t") * col("y")).cast("long").as("y1_x"),
          sum((lit(1L) - col("t")) * col("y")).cast("long").as("y0_x"))
      val valid = col("t_x") > 0 && col("t_x") < col("n_x")
      st.agg(sum(col("n_x")).cast("long").as("n"),
          count(when(valid, 1)).as("n_valid"),
          count(lit(1)).as("n_strata"),
          coalesce(sum(when(valid, col("n_x"))), lit(0L)).cast("long")
            .as("n_used"),
          coalesce(sum(when(valid,
            expr("(y1_x * n_x * 1000000) div t_x"))), lit(0L))
            .cast("long").as("s1"),
          coalesce(sum(when(valid,
            expr("(y0_x * n_x * 1000000) div (n_x - t_x)"))), lit(0L))
            .cast("long").as("s0"))
        .select(col("n").as("n_users"), col("n_strata"),
          col("n_valid").as("n_valid_strata"),
          when(col("n_used") > 0,
            (when(col("s1") >= col("s0"), 1L).otherwise(-1L))
              * expr("abs(s1 - s0) div n_used")).as("ate_ipw_micro"))
    },

    // ---- Markov next-event accuracy: q143/q235 BUILD the transition
    //      matrix; this evaluates it — train the modal-next-event
    //      predictor on the md5 train users, score it on held-out
    //      users' consecutive pairs, against the global-mode baseline
    //      every sequence model must beat. Deterministic end to end:
    //      consecutive pairs come from user-partitioned lead windows
    //      with the (ts, event_id) total order; the per-state argmax
    //      ties break to the lexicographically smallest event (q253's
    //      row_number discipline, on the O(types²) table); accuracy
    //      is one integer micro division per state. The corpus pays
    //      two user-keyed window passes; everything else is
    //      type-domain algebra. A state never seen in training
    //      predicts NOTHING — its test pairs score 0 hits with a NULL
    //      prediction, never a silent drop. ----
    QueryDef.sql("q309_markov_accuracy",
      """WITH ev AS (SELECT user_id, event_type AS a,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS b,
        |    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 2)
        |      < '80' THEN 0 ELSE 1 END AS fold
        |  FROM events),
        |pairs AS (SELECT a, b, fold FROM ev WHERE b IS NOT NULL),
        |tr AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n
        |  FROM pairs WHERE fold = 0 GROUP BY a, b),
        |pred AS (SELECT a, b AS pb FROM (SELECT a, b, row_number()
        |    OVER (PARTITION BY a ORDER BY n DESC, b) AS rn FROM tr)
        |  WHERE rn = 1),
        |gm AS (SELECT b AS gb FROM (SELECT b, row_number()
        |    OVER (ORDER BY count(*) DESC, b) AS rn
        |  FROM pairs WHERE fold = 0 GROUP BY b) WHERE rn = 1),
        |tst AS (SELECT p.a, pred.pb, gm.gb,
        |    CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(sum(CASE WHEN p.b = pred.pb THEN 1 ELSE 0 END)
        |      AS BIGINT) AS hits,
        |    CAST(sum(CASE WHEN p.b = gm.gb THEN 1 ELSE 0 END)
        |      AS BIGINT) AS base_hits
        |  FROM pairs p LEFT JOIN pred ON pred.a = p.a, gm
        |  WHERE p.fold = 1 GROUP BY p.a, pred.pb, gm.gb)
        |SELECT a AS state, pb AS predicted, n_test, hits,
        |  (hits * 1000000) // n_test AS acc_micro,
        |  (base_hits * 1000000) // n_test AS baseline_micro
        |FROM tst ORDER BY state""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type").as("a"),
          lead(col("event_type"), 1).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts"), col("event_id"))).as("b"),
          when(substring(md5(col("user_id").cast("string")
            .cast("binary")), 1, 2) < "80", 0).otherwise(1).as("fold"))
        .filter(col("b").isNotNull)
        .localCheckpoint() // one window pass feeds train AND test
      val tr = ev.filter(col("fold") === 0)
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      val pred = tr
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("a")).orderBy(col("n").desc, col("b"))))
        .filter(col("rn") === 1)
        .select(col("a"), col("b").as("pb"))
      val gm = ev.filter(col("fold") === 0)
        .groupBy(col("b")).agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("n").desc, col("b"))))
        .filter(col("rn") === 1)
        .select(col("b").as("gb"))
      ev.filter(col("fold") === 1)
        .join(broadcast(pred), Seq("a"), "left")
        .crossJoin(broadcast(gm))
        .groupBy(col("a"), col("pb"), col("gb"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("b") === col("pb"), 1L).otherwise(0L))
            .cast("long").as("hits"),
          sum(when(col("b") === col("gb"), 1L).otherwise(0L))
            .cast("long").as("base_hits"))
        .select(col("a").as("state"), col("pb").as("predicted"),
          col("n_test"), col("hits"),
          expr("(hits * 1000000) div n_test").as("acc_micro"),
          expr("(base_hits * 1000000) div n_test").as("baseline_micro"))
        .orderBy(col("state"))
    },

    // ---- Distribution-free median CI: the median document length
    //      with an exact order-statistic 95% interval — ranks
    //      (n ∓ ⌈1.96√n⌉)/2 bracket the median with ~95% coverage for
    //      ANY distribution (the binomial argument), which is the
    //      honest interval to put on a skewed length distribution
    //      where a t-interval lies. Everything is an EXACT order
    //      statistic via the cum ≥ rank test on the distinct-value
    //      support (q287's idiom, never an interpolated percentile);
    //      the only float ops are one sqrt (correctly rounded) and
    //      one rounding. One corpus agg; the support window runs on
    //      O(distinct lengths). n < 2 leaves the interval NULL —
    //      brackets need something to bracket (DegenerateInputSpec).
    //      ----
    QueryDef.sql("q313_median_ci",
      """WITH sup AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT)
        |    AS c FROM documents GROUP BY n_chars),
        |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sup),
        |rk AS (SELECT nn.n,
        |    CAST(round(1.959964 * sqrt(CAST(nn.n AS DOUBLE)))
        |      AS BIGINT) AS d FROM nn),
        |bounds AS (SELECT n, (n + 1) // 2 AS med_rank,
        |    greatest(1, (n - d) // 2) AS lo_rank,
        |    least(n, (n + d) // 2 + 1) AS hi_rank FROM rk),
        |cum AS (SELECT v, sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
        |  FROM sup)
        |SELECT b.n AS n_docs, b.lo_rank, b.hi_rank,
        |  CASE WHEN b.n >= 2 THEN
        |    min(CASE WHEN cum.cc >= b.med_rank THEN cum.v END) END
        |    AS median,
        |  CASE WHEN b.n >= 2 THEN
        |    min(CASE WHEN cum.cc >= b.lo_rank THEN cum.v END) END
        |    AS ci_lo,
        |  CASE WHEN b.n >= 2 THEN
        |    min(CASE WHEN cum.cc >= b.hi_rank THEN cum.v END) END
        |    AS ci_hi
        |FROM cum, bounds b
        |GROUP BY b.n, b.med_rank, b.lo_rank, b.hi_rank""".stripMargin) { (s, d) =>
      val sup = t(s, d, "documents")
        .groupBy(col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // O(distinct lengths): feeds total + window
      val nn = sup.agg(sum(col("c")).cast("long").as("n"))
      val bounds = nn
        .withColumn("d",
          round(lit(1.959964) * sqrt(col("n").cast("double")))
            .cast("long"))
        .select(col("n"), expr("(n + 1) div 2").as("med_rank"),
          greatest(lit(1L), expr("(n - d) div 2")).as("lo_rank"),
          least(col("n"), expr("(n + d) div 2 + 1")).as("hi_rank"))
      val wC = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sup.withColumn("cc", sum(col("c")).over(wC))
        .crossJoin(broadcast(bounds))
        .groupBy(col("n"), col("med_rank"), col("lo_rank"),
          col("hi_rank"))
        .agg(
          min(when(col("cc") >= col("med_rank"), col("v"))).as("med"),
          min(when(col("cc") >= col("lo_rank"), col("v"))).as("lo"),
          min(when(col("cc") >= col("hi_rank"), col("v"))).as("hi"))
        .select(col("n").as("n_docs"), col("lo_rank"), col("hi_rank"),
          when(col("n") >= 2, col("med")).as("median"),
          when(col("n") >= 2, col("lo")).as("ci_lo"),
          when(col("n") >= 2, col("hi")).as("ci_hi"))
    })

  /** The q282 leave-one-day-out assembly from an (etype, day, k) cell
    * table — shared by the q284 streaming twin so batch and stream
    * cannot drift. Expects `cell` materialized (both margin aggs, the
    * grid, and the totals read it). */
  private def jackknifeTail(cell: DataFrame): DataFrame = {
    val dayn = cell.groupBy(col("day"))
      .agg(sum(col("k")).cast("long").as("n"))
    val tote = cell.groupBy(col("etype"))
      .agg(sum(col("k")).cast("long").as("ke"))
    val nn = dayn.agg(sum(col("n")).cast("long").as("nn"))
    val loo = tote.crossJoin(broadcast(dayn)).crossJoin(broadcast(nn))
      .join(cell, Seq("etype", "day"), "left")
      .select(col("etype"),
        when(col("nn") > col("n"),
          expr("""CAST((ke - COALESCE(k, CAST(0 AS BIGINT))) * 1000000
            |  div (nn - n) AS BIGINT)""".stripMargin)).as("th"))
    val mn = loo.groupBy(col("etype"))
      .agg(count(col("th")).as("j"),
        sum(col("th")).cast("long").as("sth"),
        sum(col("th").cast("decimal(38,0)") * col("th")).as("sth2"))
    mn.join(tote, "etype").crossJoin(broadcast(nn))
      .select(col("etype"), col("j"),
        expr("CAST(ke * 1000000 div nn AS BIGINT)").as("theta_micro"),
        when(col("j") < 2, lit(null).cast("long"))
          .otherwise(round(sqrt(((col("j") - 1)
              * (col("j") * col("sth2")
                - col("sth").cast("decimal(38,0)") * col("sth")))
              .cast("double")) / col("j")).cast("long"))
          .as("se_micro"))
      .orderBy(col("etype"))
  }

  /** Shared oracle for q282 and its streaming twin q284 — one SQL
    * text, so the two QueryDefs are provably the same computation. */
  private lazy val jackknifeOracle: String =
    """WITH d AS (SELECT event_type AS etype,
      |    epoch_us(ts) // 86400000000 AS day FROM events),
      |cell AS (SELECT etype, day, CAST(count(*) AS BIGINT) AS k
      |  FROM d GROUP BY 1, 2),
      |dayn AS (SELECT day, CAST(sum(k) AS BIGINT) AS n FROM cell
      |  GROUP BY day),
      |tote AS (SELECT etype, CAST(sum(k) AS BIGINT) AS ke FROM cell
      |  GROUP BY etype),
      |nn AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM dayn),
      |loo AS (SELECT te.etype,
      |    CASE WHEN nn.nn > dn.n THEN
      |      CAST((te.ke - COALESCE(c.k, 0)) * 1000000 // (nn.nn - dn.n)
      |        AS BIGINT) END AS th
      |  FROM tote te CROSS JOIN dayn dn CROSS JOIN nn
      |  LEFT JOIN cell c ON c.etype = te.etype AND c.day = dn.day),
      |mn AS (SELECT etype, CAST(count(th) AS BIGINT) AS j,
      |    CAST(sum(th) AS BIGINT) AS sth,
      |    sum(CAST(th AS HUGEINT) * th) AS sth2
      |  FROM loo GROUP BY etype)
      |SELECT m.etype, m.j,
      |  CAST(te.ke * 1000000 // nn.nn AS BIGINT) AS theta_micro,
      |  CASE WHEN m.j < 2 THEN NULL
      |    ELSE CAST(round(sqrt(CAST((m.j - 1)
      |      * (m.j * m.sth2 - CAST(m.sth AS HUGEINT) * m.sth)
      |      AS DOUBLE)) / m.j) AS BIGINT) END AS se_micro
      |FROM mn m JOIN tote te ON te.etype = m.etype CROSS JOIN nn
      |ORDER BY m.etype""".stripMargin
}
