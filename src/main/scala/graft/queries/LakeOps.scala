package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lake-lifecycle operators layered on the CDC/curation engine: SCD
  * Type 2 dimension builds, snapshot→delta inversion (the reverse of
  * the q131 diff audit — generate a CDC feed FROM two snapshots and
  * prove applying it reconstructs the target), session transition
  * matrices, RefinedWeb-style line-level boilerplate removal, the
  * streaming twin of the q139 anomaly gate, and robust per-dimension
  * embedding statistics (median/MAD) for feature-scaling audits.
  *
  * Reference scope: the reference's apply pipeline materializes
  * current-state tables (pkg/sink/postgres.go); SCD2 and the
  * delta-inversion round trip are the two lake-side derivations of
  * that same change history. Everything here follows the repo's exact
  * arithmetic discipline — integer µs, micro-units, decimal sums — so
  * every oracle is a bit-exact hash match, never a tolerance.
  */
object LakeOps {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Dense per-type hourly count series (etype, hidx, x) on each
    * type's own [min, max] hour span — missing hours are REAL zeros
    * (an occupied-hours-only series aliases gaps into the signal).
    * Shared by q194 (ACF), q212 (seasonality), q213 (changepoint) so
    * the series definition can never drift between the three. */
  private def hourlySeries(events: DataFrame): DataFrame =
    seriesFromCounts(events.select(col("event_type").as("etype"),
        expr("CAST(ts AS BIGINT) div 3600").as("hidx"))
      .groupBy(col("etype"), col("hidx"))
      .agg(count(lit(1)).as("x")))

  /** Spine-fill half of [[hourlySeries]], factored so the q220
    * STREAMING fold (whose (etype, hidx, x) counts arrive from a
    * complete-mode aggregation) reuses the identical densification. */
  private def seriesFromCounts(cnt: DataFrame): DataFrame =
    cnt.groupBy(col("etype"))
      .agg(min(col("hidx")).as("h0"), max(col("hidx")).as("h1"))
      .select(col("etype"),
        explode(sequence(col("h0"), col("h1"))).as("hidx"))
      .join(cnt, Seq("etype", "hidx"), "left")
      .select(col("etype"), col("hidx"),
        coalesce(col("x"), lit(0L)).as("x"))

  /** The q261 MASE assembly from a dense series — shared by the q273
    * streaming twin so batch and stream cannot drift: two lag windows
    * (seasonal-24 and naive-1), integer absolute-error sums, one
    * DECIMAL cross-multiplied floor division. */
  private def maseTail(ser: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("etype")).orderBy(col("hidx"))
    ser
      .select(col("etype"), col("x"),
        lag(col("x"), 24).over(w).as("x24"),
        lag(col("x"), 1).over(w).as("x1"))
      .groupBy(col("etype"))
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("x") - col("x24"))).cast("long").as("sase"),
        count(col("x24")).as("nf"),
        sum(abs(col("x") - col("x1"))).cast("long").as("sae1"),
        count(col("x1")).as("n1"))
      .select(col("etype"), col("n_hours"), col("sase"), col("sae1"),
        when(col("sae1") === 0 || col("nf") === 0,
          lit(null).cast("long"))
          .otherwise(expr("""CAST((CAST(sase AS DECIMAL(38,0)) * n1
            |  * 1000000) div (CAST(sae1 AS DECIMAL(38,0)) * nf)
            |  AS BIGINT)""".stripMargin)).as("mase_micro"))
      .orderBy(col("etype"))
  }

  /** Shared oracle for q261 and its streaming twin q273 — one SQL
    * text, so the two QueryDefs are provably the same computation. */
  private lazy val maseOracle: String =
    s"""WITH $hourlySeriesCte,
      |lg AS (SELECT etype, x, lag(x, 24) OVER w AS x24,
      |    lag(x, 1) OVER w AS x1
      |  FROM ser WINDOW w AS (PARTITION BY etype ORDER BY hidx)),
      |agg AS (SELECT etype, CAST(count(*) AS BIGINT) AS n_hours,
      |    CAST(sum(abs(x - x24)) AS BIGINT) AS sase,
      |    CAST(count(x24) AS BIGINT) AS nf,
      |    CAST(sum(abs(x - x1)) AS BIGINT) AS sae1,
      |    CAST(count(x1) AS BIGINT) AS n1
      |  FROM lg GROUP BY etype)
      |SELECT etype, n_hours, sase, sae1,
      |  CASE WHEN sae1 = 0 OR nf = 0 THEN NULL
      |    ELSE CAST(CAST(sase AS HUGEINT) * n1 * 1000000
      |      // (CAST(sae1 AS HUGEINT) * nf) AS BIGINT) END
      |    AS mase_micro
      |FROM agg ORDER BY etype""".stripMargin

  /** The q219 Fano assembly from a dense series — shared by the q220
    * streaming twin so batch and stream cannot drift. */
  private def fanoTail(ser: DataFrame): DataFrame =
    ser.groupBy(col("etype"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("decimal(38,0)").as("s1"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("s2"))
      .select(col("etype"), col("n").cast("long").as("n_hours"),
        when(col("s1") === 0, lit(null).cast("long"))
          .otherwise(expr("""CAST(((n * s2 - s1 * s1) * 1000000)
            |  div (n * s1) AS BIGINT)""".stripMargin))
          .as("fano_micro"))
      .orderBy(col("etype"))

  /** Shared oracle for q219 and its streaming twin q220 — one SQL
    * text, so the two QueryDefs are provably the same computation. */
  // lazy: declared before hourlySeriesCte in file order, so a strict
  // val would interpolate null at object init
  private lazy val fanoOracle: String =
    s"""WITH $hourlySeriesCte,
      |mo AS (SELECT etype, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS s1, sum(CAST(x AS HUGEINT) * x) AS s2
      |  FROM ser GROUP BY etype)
      |SELECT etype, n AS n_hours,
      |  CASE WHEN s1 = 0 THEN NULL
      |    ELSE CAST((CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
      |      * 1000000 // (CAST(n AS HUGEINT) * s1) AS BIGINT) END
      |    AS fano_micro
      |FROM mo ORDER BY etype""".stripMargin

  /** DuckDB CTE twin of [[hourlySeries]]: defines `ser(etype, hidx,
    * x)` off `events`. */
  private val hourlySeriesCte: String =
    """h AS (SELECT event_type AS etype,
      |    CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hidx FROM events),
      |cnt AS (SELECT etype, hidx, CAST(count(*) AS BIGINT) AS x
      |  FROM h GROUP BY etype, hidx),
      |bounds AS (SELECT etype, min(hidx) AS h0, max(hidx) AS h1
      |  FROM cnt GROUP BY etype),
      |spine AS (SELECT etype, unnest(range(h0, h1 + 1)) AS hidx
      |  FROM bounds),
      |ser AS (SELECT s.etype, s.hidx, COALESCE(c.x, 0) AS x
      |  FROM spine s LEFT JOIN cnt c
      |    ON c.etype = s.etype AND c.hidx = s.hidx)""".stripMargin

  /** SCD2 validity intervals from the event stream (the q141/q153
    * shape): per user, consecutive identical event-type states
    * collapse and the survivors close each other's intervals —
    * (user_id, state, valid_from_us, valid_to_us[null=open]). Both
    * window passes share one user-keyed exchange. */
  private def scd2Intervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val v = events.select(col("user_id"), col("event_type").as("st"),
      unix_micros(col("ts")).as("us"), col("event_id"))
    v.withColumn("pst", lag(col("st"), 1).over(w))
      .filter(col("pst").isNull || col("pst") =!= col("st"))
      .withColumn("vto", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("st").as("state"),
        col("us").as("valid_from_us"), col("vto").as("valid_to_us"))
  }

  /** The q141 interval-build CTE chain as DuckDB SQL — shared by the
    * q141 and q153 oracles so the two derivations can never drift.
    * Defines `iv(user_id, st, us, vto)`. */
  private val scd2Cte: String =
    """v AS (SELECT user_id, event_type AS st, epoch_us(ts) AS us,
      |    event_id FROM events),
      |o AS (SELECT user_id, st, us, event_id,
      |    lag(st) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |      AS pst FROM v),
      |c AS (SELECT user_id, st, us, event_id FROM o
      |  WHERE pst IS NULL OR pst <> st),
      |iv AS (SELECT user_id, st, us,
      |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |      AS vto FROM c)""".stripMargin

  /** Sweep-line peak concurrency over closed intervals
    * `(et, u, sid, t0, t1)`: per `et`, the maximum number of intervals
    * alive at one instant (inclusive at both ends) and the earliest
    * instant it is reached — ±1 boundary deltas, a running sum over
    * the total order (t, delta ASC, u, sid), then max. Exercised by
    * q157; pinned against a brute-force reference in LakeOpsSpec. */
  private[queries] def peakConcurrency(iv: DataFrame): DataFrame = {
    val dl = iv.select(col("et"), col("t0").as("t"),
        lit(1L).as("delta"), col("u"), col("sid"))
      .unionAll(iv.select(col("et"), (col("t1") + 1).as("t"),
        lit(-1L).as("delta"), col("u"), col("sid")))
    // delta ASC at equal t: a shifted −1 at tick t belongs to an
    // interval that ended at t−1 and must leave the count BEFORE a
    // +1 starting at t joins it — processing +1 first would let the
    // running sum transiently overcount exactly when one interval
    // starts one tick after another ends (LakeOpsSpec's brute-force
    // collisions catch the inverted order)
    val rn = dl.withColumn("run", sum(col("delta")).over(
      Window.partitionBy(col("et"))
        .orderBy(col("t"), col("delta"), col("u"), col("sid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val pk = rn.groupBy(col("et")).agg(max(col("run")).as("peak"))
    val first = rn.join(broadcast(pk), "et")
      .filter(col("run") === col("peak"))
      .groupBy(col("et")).agg(min(col("t")).as("peak_first_us"))
    pk.join(first, "et")
  }

  /** CUSUM via the prefix-min identity: adds a `cusum` column equal to
    * the sequential fold C_t = max(0, C_{t-1} + dev_t) over each
    * `part`-partition ordered by `ord` — computed as
    * C_t = S_t − min(0, min_{j≤t} S_j) with two window scans (running
    * sum, running min) sharing one exchange. Exact over integral
    * `dev`; see q149 for the drift-gate application. */
  def cusum(df: DataFrame, part: Seq[String], ord: Seq[String],
      dev: String): DataFrame = {
    val w = Window.partitionBy(part.map(col): _*)
      .orderBy(ord.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("srun", sum(col(dev)).over(w))
      .withColumn("smin", min(col("srun")).over(w))
      .withColumn("cusum", col("srun") - least(lit(0L), col("smin")))
      .drop("srun", "smin")
  }

  /** DuckDB oracle for q270 + the shared column list: every BIGINT
    * key column in the relational schema, qualified `table.column`. */
  private val keyColumns: Seq[(String, String)] = Seq(
    ("customer", "c_custkey"), ("customer", "c_nationkey"),
    ("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"), ("nation", "n_nationkey"),
    ("nation", "n_regionkey"), ("orders", "o_custkey"),
    ("orders", "o_orderkey"), ("part", "p_partkey"),
    ("region", "r_regionkey"), ("supplier", "s_nationkey"),
    ("supplier", "s_suppkey"))

  private lazy val joinKeyOracleSql: String = {
    val kv = keyColumns.map { case (tbl, c) =>
      s"""SELECT '$tbl.$c' AS cn, CAST($c AS BIGINT) AS v FROM $tbl
         |  WHERE $c IS NOT NULL""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH kv AS (SELECT DISTINCT cn, v FROM ($kv)),
       |card AS (SELECT cn, CAST(count(*) AS BIGINT) AS n FROM kv
       |  GROUP BY cn),
       |inter AS (SELECT a.cn AS ca, b.cn AS cb,
       |    CAST(count(*) AS BIGINT) AS ab
       |  FROM kv a JOIN kv b ON a.v = b.v AND a.cn <> b.cn
       |  GROUP BY a.cn, b.cn),
       |sc AS (SELECT ca AS col_a, cb AS col_b, ab AS n_shared,
       |    na.n AS n_distinct_a,
       |    CAST(ab * 1000000 // na.n AS BIGINT) AS inclusion_micro,
       |    CAST(ab * 1000000 // (na.n + nb.n - ab) AS BIGINT)
       |      AS jaccard_micro
       |  FROM inter JOIN card na ON na.cn = inter.ca
       |  JOIN card nb ON nb.cn = inter.cb)
       |SELECT * FROM sc
       |WHERE inclusion_micro >= 950000 AND jaccard_micro >= 950000
       |ORDER BY col_a, col_b""".stripMargin
  }

  /** The q271 functional-dependency audit list: (table, determinant,
    * dependent) — a mix of FDs that hold and FDs that fail, so the
    * report exercises both verdicts. */
  private val fdChecks: Seq[(String, String, String)] = Seq(
    ("documents", "doc_id", "lang"),
    ("documents", "source", "lang"),
    ("events", "event_id", "event_type"),
    ("events", "user_id", "event_type"),
    ("lineitem", "l_orderkey", "l_suppkey"),
    ("nation", "n_name", "n_nationkey"),
    ("nation", "n_nationkey", "n_name"),
    ("orders", "o_custkey", "o_orderstatus"),
    ("orders", "o_orderkey", "o_custkey"))

  private lazy val fdOracleSql: String =
    fdChecks.map { case (tbl, det, dep) =>
      s"""SELECT '$tbl: $det -> $dep' AS fd,
         |  (SELECT CAST(count(DISTINCT $det) AS BIGINT) FROM $tbl)
         |    AS n_det,
         |  (SELECT CAST(count(*) AS BIGINT) FROM
         |    (SELECT DISTINCT $det, $dep FROM $tbl)) AS n_det_dep,
         |  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT $det FROM
         |    (SELECT DISTINCT $det, $dep FROM $tbl) GROUP BY $det
         |    HAVING count(*) > 1)) AS n_violating,
         |  (SELECT count(DISTINCT $det) FROM $tbl) = (SELECT count(*)
         |    FROM (SELECT DISTINCT $det, $dep FROM $tbl)) AS holds"""
        .stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY fd")


  val queries: Seq[QueryDef] = Seq(

    // ---- SCD Type 2 dimension build from the event stream: collapse
    //      each user's event-type sequence into validity intervals
    //      [valid_from, valid_to) with an is_current flag — the
    //      standard dimension-table derivation of a CDC change
    //      history. Two window passes over ONE user-keyed shuffle
    //      (lag to detect state changes, lead over the survivors to
    //      close intervals); timestamps are exact integer µs and ties
    //      break on event_id, so the intervals are deterministic on
    //      any engine. State rows ≈ change count — never wider than
    //      the input. ----
    QueryDef.sql("q141_scd2_intervals",
      s"""WITH $scd2Cte
        |SELECT user_id, st AS state, us AS valid_from_us,
        |  vto AS valid_to_us,
        |  CAST(CASE WHEN vto IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_current
        |FROM iv ORDER BY user_id, valid_from_us, state""".stripMargin) {
      (s, d) =>
        scd2Intervals(t(s, d, "events"))
          .withColumn("is_current",
            when(col("valid_to_us").isNull, 1L).otherwise(0L))
          .orderBy(col("user_id"), col("valid_from_us"), col("state"))
    },

    // ---- CDC delta INVERSION round trip: diff two snapshots into an
    //      I/U/D event feed (comparing content HASHES — the md5 rides
    //      the shuffle, never the text), then APPLY that feed back to
    //      the old snapshot. The oracle computes the target snapshot
    //      DIRECTLY, so the green hash proves diff∘apply = identity —
    //      the invariant a lake's change-data-feed export rests on.
    //      Snapshots are simulated deterministically: A drops
    //      doc_id%7==0, B drops doc_id%3==0 and revises doc_id%5==0,
    //      so the feed genuinely contains all three op kinds. One
    //      full-outer join + one anti-join + one union, all
    //      doc_id-keyed. ----
    QueryDef.sql("q142_cdc_invert",
      """SELECT doc_id, source,
        |  md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
        |      ELSE text END) AS h
        |FROM documents WHERE doc_id % 3 <> 0
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      def h(c: Column) = md5(c.cast("binary"))
      val a = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("source"), h(col("text")).as("h"))
      val b = docs.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id"), col("source"),
          h(when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text"))).as("h"))
      // diff → the delta feed (op, key, new image for I/U)
      val ev = a.as("a").join(b.as("b"),
          col("a.doc_id") === col("b.doc_id"), "full_outer")
        .select(
          when(col("a.doc_id").isNull, "insert")
            .when(col("b.doc_id").isNull, "delete")
            .when(col("a.h") =!= col("b.h"), "update").as("op"),
          coalesce(col("b.doc_id"), col("a.doc_id")).as("doc_id"),
          col("b.source").as("source"), col("b.h").as("h"))
        .filter(col("op").isNotNull)
      // apply the feed to A: drop deleted/updated keys, add new images
      a.join(ev.filter(col("op").isin("delete", "update"))
          .select(col("doc_id")), Seq("doc_id"), "left_anti")
        .unionByName(ev.filter(col("op").isin("insert", "update"))
          .select(col("doc_id"), col("source"), col("h")))
        .orderBy(col("doc_id"))
    },

    // ---- Markov transition matrix over sessionized activity: within
    //      each 30-minute-gap session, count event-type bigrams and
    //      report exact transition probabilities in integer
    //      micro-units (n·10⁶ div total — no float seam). The
    //      gaps-and-islands session id is the lag+cumsum pattern;
    //      everything runs in ONE user-keyed shuffle (three window
    //      passes share the partitioning) + an O(types²) agg. ----
    QueryDef.sql("q143_markov_transitions",
      """WITH v AS (SELECT user_id, event_type AS et, epoch_us(ts) AS us,
        |    event_id FROM events),
        |b AS (SELECT user_id, et, us, event_id,
        |    CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |g AS (SELECT user_id, et, us, event_id,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid FROM b),
        |tr AS (SELECT lag(et) OVER (PARTITION BY user_id, sid
        |      ORDER BY us, event_id) AS prev_et, et AS next_et FROM g),
        |c AS (SELECT prev_et, next_et, CAST(count(*) AS BIGINT) AS n
        |  FROM tr WHERE prev_et IS NOT NULL GROUP BY prev_et, next_et),
        |tot AS (SELECT prev_et, CAST(sum(n) AS BIGINT) AS t FROM c
        |  GROUP BY prev_et)
        |SELECT c.prev_et, c.next_et, c.n,
        |  CAST(c.n * 1000000 // tot.t AS BIGINT) AS p_micro
        |FROM c JOIN tot ON c.prev_et = tot.prev_et
        |ORDER BY c.prev_et, c.next_et""".stripMargin) { (s, d) =>
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val v = t(s, d, "events")
        .select(col("user_id"), col("event_type").as("et"),
          unix_micros(col("ts")).as("us"), col("event_id"))
      val g = v
        .withColumn("brk",
          when(lag(col("us"), 1).over(wu).isNull ||
            col("us") - lag(col("us"), 1).over(wu) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(
          wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tr = g.withColumn("prev_et",
          lag(col("et"), 1).over(Window
            .partitionBy(col("user_id"), col("sid"))
            .orderBy(col("us"), col("event_id"))))
        .filter(col("prev_et").isNotNull)
      val c = tr.groupBy(col("prev_et"), col("et").as("next_et"))
        .agg(count(lit(1)).as("n"))
      val tot = c.groupBy(col("prev_et")).agg(sum(col("n")).as("t"))
      c.join(broadcast(tot), "prev_et")
        .select(col("prev_et"), col("next_et"), col("n"),
          expr("n * 1000000L div t").as("p_micro"))
        .orderBy(col("prev_et"), col("next_et"))
    },

    // ---- Line-level boilerplate removal (the RefinedWeb/C4 line
    //      dedup stage): split each doc into fixed 4-word lines, drop
    //      every line whose document frequency ≥ 3 from EVERY doc, and
    //      reassemble the survivors in order. Exactly two shuffles at
    //      any scale: the line-keyed df agg (same shape as the q121
    //      gram report) and the doc-keyed reassembly — the boilerplate
    //      list itself is corpus-small and BROADCAST back, so flagging
    //      costs no third shuffle. Output proves the reconstruction
    //      (md5 of the reassembled text), not just the counts. ----
    QueryDef.sql("q144_line_dedup",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |li AS (SELECT doc_id, ws,
        |    unnest(generate_series(0,
        |      CAST(ceil(len(ws)/4.0) AS BIGINT) - 1)) AS pos FROM w),
        |l AS (SELECT doc_id, pos,
        |    array_to_string(ws[(pos*4+1):(pos*4+4)], ' ') AS line FROM li),
        |d AS (SELECT line FROM l GROUP BY line
        |  HAVING count(DISTINCT doc_id) >= 3),
        |f AS (SELECT l.doc_id, l.pos, l.line,
        |    CASE WHEN d.line IS NULL THEN 0 ELSE 1 END AS dropf
        |  FROM l LEFT JOIN d ON l.line = d.line),
        |r AS (SELECT doc_id,
        |    CAST(sum(1 - dropf) AS BIGINT) AS n_kept,
        |    CAST(sum(dropf) AS BIGINT) AS n_dropped,
        |    string_agg(CASE WHEN dropf = 0 THEN line END, ' '
        |      ORDER BY pos) AS txt
        |  FROM f GROUP BY doc_id)
        |SELECT doc_id, n_kept, n_dropped,
        |  CASE WHEN n_kept = 0 THEN NULL ELSE md5(txt) END AS h
        |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
      val lines = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), posexplode(expr(
          """CASE WHEN size(ws) = 0 THEN array()
            |ELSE transform(sequence(0, cast(ceil(size(ws)/4.0) as int) - 1),
            |  i -> array_join(slice(ws, i*4+1, 4), ' ')) END"""
            .stripMargin)).as(Seq("pos", "line")))
      val boiler = lines.groupBy(col("line"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 3)
        .select(col("line"), lit(1L).as("dropf"))
      lines.join(broadcast(boiler), Seq("line"), "left")
        .withColumn("dropf", coalesce(col("dropf"), lit(0L)))
        .groupBy(col("doc_id"))
        .agg(sum(lit(1L) - col("dropf")).as("n_kept"),
          sum(col("dropf")).as("n_dropped"),
          array_sort(collect_list(when(col("dropf") === 0L,
            struct(col("pos"), col("line"))))).as("kept"))
        .select(col("doc_id"), col("n_kept"), col("n_dropped"),
          when(col("n_kept") === 0L, lit(null))
            .otherwise(md5(array_join(
              expr("transform(kept, p -> p.line)"), " ").cast("binary")))
            .as("h"))
        .orderBy(col("doc_id"))
    },

    // ---- Streaming twin of the q139 anomaly gate: the per-type
    //      moments (n, Σv, Σv²) fold INCREMENTALLY as a streaming
    //      aggregation over the event feed — state is O(event types)
    //      rows forever, the complete-mode sink republishes the tiny
    //      moment table each trigger — and the verdict pass then joins
    //      the folded moments back exactly as the batch gate does.
    //      Same exact cross-multiplied integer test, same output, SAME
    //      oracle as q139 — the stream-equals-batch discipline applied
    //      to the monitoring gate. ----
    QueryDef.sql("q145_stream_anomaly",
      PartB.queries.find(_.name == "q139_value_outliers").get.oracle.get) {
      (s, d) =>
        val ev = t(s, d, "events")
          .select(col("event_id"), col("event_type"), col("value"))
        val feedDir = graft.bench.BenchFeeds.feed(s, d, "evvalfeed",
          idCol = "event_id", checkSpan = false)(ev)
        val sink = graft.bench.BenchFeeds.sinkName("q145_anom")
        graft.streaming.StreamRun.withStatePartitions(s, 8) {
          val q = s.readStream
            .schema(s.read.parquet(feedDir).schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(feedDir)
            .select(col("event_type"),
              floor(col("value") * 1000000).cast("long").as("vm"))
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("vm").cast("decimal(38,0)")).cast("decimal(38,0)")
                .as("s"),
              sum(col("vm").cast("decimal(38,0)") * col("vm"))
                .cast("decimal(38,0)").as("q"))
            .writeStream.format("memory").queryName(sink)
            .outputMode("complete").start()
          try q.processAllAvailable() finally q.stop()
        }
        val st = s.table(sink)
        val v = t(s, d, "events")
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 1000000).cast("long").as("vm"))
        val o = v.join(broadcast(st), "event_type")
          .filter(expr(
            """cast(vm * n - s as decimal(38,0))
              |  * cast(vm * n - s as decimal(38,0))
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

    // ---- Robust per-dimension embedding statistics (median + MAD in
    //      micro-units): the feature-scaling audit run before
    //      whitening/normalizing an embedding column. Exact-percentile
    //      medians interpolate halves of integers — exactly
    //      representable doubles, so the cross-engine hash is exact.
    //      Two dim-keyed aggs over the exploded (dim, value) pairs;
    //      the 64-row median table broadcasts back for the deviation
    //      pass. ----
    QueryDef.sql("q146_dim_robust_stats",
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |x AS (SELECT unnest(emb) AS v,
        |    generate_subscripts(emb, 1) AS dim FROM e),
        |m AS (SELECT CAST(dim AS BIGINT) AS dim,
        |    CAST(floor(v * 1000000) AS BIGINT) AS vm FROM x),
        |md AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |    min(vm) AS min_micro, max(vm) AS max_micro,
        |    quantile_cont(vm, 0.5) AS med_micro FROM m GROUP BY dim),
        |ad AS (SELECT m.dim, abs(m.vm - md.med_micro) AS dev
        |  FROM m JOIN md ON m.dim = md.dim),
        |mad AS (SELECT dim, quantile_cont(dev, 0.5) AS mad_micro
        |  FROM ad GROUP BY dim)
        |SELECT md.dim, md.n, md.min_micro, md.max_micro, md.med_micro,
        |  mad.mad_micro
        |FROM md JOIN mad ON md.dim = mad.dim
        |ORDER BY md.dim""".stripMargin) { (s, d) =>
      val m = t(s, d, "embeddings")
        .select(posexplode(col("embedding")).as(Seq("p", "v")))
        .select((col("p") + 1).cast("long").as("dim"),
          floor(col("v").cast("double") * 1000000).cast("long").as("vm"))
      val md = m.groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), min(col("vm")).as("min_micro"),
          max(col("vm")).as("max_micro"),
          expr("percentile(vm, 0.5D)").as("med_micro"))
      val mad = m.join(broadcast(md.select(col("dim"), col("med_micro"))),
          "dim")
        .select(col("dim"), abs(col("vm") - col("med_micro")).as("dev"))
        .groupBy(col("dim"))
        .agg(expr("percentile(dev, 0.5D)").as("mad_micro"))
      md.join(mad, "dim")
        .select(col("dim"), col("n"), col("min_micro"), col("max_micro"),
          col("med_micro"), col("mad_micro"))
        .orderBy(col("dim"))
    },

    // ---- CUSUM drift detection via the prefix-min identity: the
    //      sequential recurrence C_t = max(0, C_{t-1} + dev_t) looks
    //      unparallelizable, but C_t = S_t − min(0, min_{j≤t} S_j)
    //      (S = running sum of deviations) turns it into two window
    //      scans — running sum + running min — over ONE type-keyed
    //      exchange. All arithmetic exact integer micro-units: the
    //      reference mean is the integer div of the decimal sum, the
    //      alarm threshold is 3× the integer mean absolute deviation,
    //      and no division ever sees a negative operand (trunc-vs-
    //      floor div is the one cross-engine seam this family has).
    //      Output: per-type peak drift and alarm count. ----
    QueryDef.sql("q149_cusum_drift",
      """WITH v AS (SELECT event_type AS et, epoch_us(ts) AS us, event_id,
        |    CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events),
        |st AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
        |    CAST(CAST(sum(CAST(vm AS DECIMAL(38,0))) AS HUGEINT)
        |      // count(*) AS BIGINT) AS mu FROM v GROUP BY et),
        |dv AS (SELECT v.et, v.us, v.event_id, v.vm - st.mu AS dev
        |  FROM v JOIN st ON v.et = st.et),
        |th AS (SELECT et, CAST(3 * (CAST(sum(abs(dev)) AS HUGEINT)
        |      // count(*)) AS BIGINT) AS thr FROM dv GROUP BY et),
        |cs AS (SELECT et, us, event_id, sum(dev) OVER (PARTITION BY et
        |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS srun
        |  FROM dv),
        |cm AS (SELECT et, srun, min(srun) OVER (PARTITION BY et
        |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS smin
        |  FROM cs),
        |cu AS (SELECT et, srun - least(0, smin) AS cusum FROM cm)
        |SELECT st.et AS event_type, st.n, st.mu AS mean_micro, th.thr,
        |  CAST(max(cu.cusum) AS BIGINT) AS peak_cusum,
        |  CAST(sum(CASE WHEN cu.cusum > th.thr THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_alarms
        |FROM cu JOIN st ON cu.et = st.et JOIN th ON cu.et = th.et
        |GROUP BY st.et, st.n, st.mu, th.thr
        |ORDER BY st.et""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .select(col("event_type").as("et"), unix_micros(col("ts")).as("us"),
          col("event_id"),
          floor(col("value") * 1000000).cast("long").as("vm"))
      val st = v.groupBy(col("et"))
        .agg(count(lit(1)).as("n"),
          expr("cast(sum(cast(vm as decimal(38,0))) div count(1) as bigint)")
            .as("mu"))
      val dv = v.join(broadcast(st), "et")
        .select(col("et"), col("us"), col("event_id"),
          (col("vm") - col("mu")).as("dev"))
      val th = dv.groupBy(col("et"))
        .agg(expr("cast(3 * (sum(abs(dev)) div count(1)) as bigint)")
          .as("thr"))
      val cu = cusum(dv, Seq("et"), Seq("us", "event_id"), "dev")
        .select(col("et"), col("cusum"))
      cu.join(broadcast(st), "et").join(broadcast(th), "et")
        .groupBy(col("et").as("event_type"), col("n"),
          col("mu").as("mean_micro"), col("thr"))
        .agg(max(col("cusum")).cast("long").as("peak_cusum"),
          sum(when(col("cusum") > col("thr"), 1L).otherwise(0L))
            .cast("long").as("n_alarms"))
        .orderBy(col("event_type"))
    },

    // ---- Deterministic negative sampling for contrastive training
    //      sets: each anchor draws 4 pseudo-random corpus rows via
    //      md5-derived indexes — exactly reproducible on any engine,
    //      append-stable, no RNG state. The sampled ids resolve
    //      through ONE vec_id-keyed join (at lake scale the probe side
    //      is |corpus|·k rows of two longs — shuffle-light), and the
    //      report audits the two things a sampler must bound: label
    //      collisions (the "negative" shares the anchor's label) and
    //      self-draws. ----
    QueryDef.sql("q150_negative_sampling",
      s"""WITH e AS (SELECT vec_id, label FROM embeddings),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM e),
        |s AS (SELECT a.vec_id AS anchor, a.label AS a_label,
        |    CAST(${Sketches.hexSql("md5(CAST(a.vec_id AS VARCHAR) || '#'" +
               " || CAST(gs.j AS VARCHAR))", 1, 12)} % nn.cnt
        |      AS BIGINT) AS neg_id
        |  FROM e a CROSS JOIN nn
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) gs),
        |j AS (SELECT s.anchor, s.a_label, s.neg_id, b.label AS n_label
        |  FROM s JOIN e b ON s.neg_id = b.vec_id)
        |SELECT a_label, CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(CASE WHEN n_label = a_label THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_label_collisions,
        |  CAST(sum(CASE WHEN neg_id = anchor THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_self
        |FROM j GROUP BY a_label ORDER BY a_label""".stripMargin) { (s, d) =>
      val e = t(s, d, "embeddings").select(col("vec_id"), col("label"))
      val nn = e.agg(count(lit(1)).as("cnt"))
      val samples = e.crossJoin(broadcast(nn))
        .select(col("vec_id").as("anchor"), col("label").as("a_label"),
          col("cnt"))
        .select(col("anchor"), col("a_label"), explode(expr(
          """transform(sequence(0, 3), j ->
            |  cast(conv(substring(md5(cast(concat(cast(anchor as string),
            |    '#', cast(j as string)) as binary)), 1, 12), 16, 10)
            |    as bigint) % cnt)""".stripMargin)).as("neg_id"))
      samples.join(e.select(col("vec_id").as("neg_id"),
          col("label").as("n_label")), "neg_id")
        .groupBy(col("a_label"))
        .agg(count(lit(1)).as("n_samples"),
          sum(when(col("n_label") === col("a_label"), 1L).otherwise(0L))
            .cast("long").as("n_label_collisions"),
          sum(when(col("neg_id") === col("anchor"), 1L).otherwise(0L))
            .cast("long").as("n_self"))
        .orderBy(col("a_label"))
    },

    // ---- Last-touch attribution THROUGH the AsOfJoin operator: each
    //      purchase finds its user's latest preceding view with
    //      [[graft.operators.AsOfJoin.lastAtOrBefore]] (one key-keyed
    //      shuffle, constant running state — never a range-predicate
    //      pair explosion), then a 7-day tolerance filter makes it
    //      windowed attribution. Views are pre-deduped to one row per
    //      (user, instant) with max(event_id), which makes BOTH
    //      engines' tie choice identical by construction. Revenue in
    //      exact micro-units. ----
    QueryDef.sql("q151_last_touch_attribution",
      """WITH p AS (SELECT user_id, event_id AS pid, epoch_us(ts) AS pus,
        |    CAST(floor(value * 1000000) AS BIGINT) AS rev FROM events
        |  WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, epoch_us(ts) AS vus,
        |    CAST(max(event_id) AS BIGINT) AS vid FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, epoch_us(ts)),
        |a AS (SELECT p.user_id, p.pus, p.rev, v.vus
        |  FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.pus >= v.vus)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(CASE WHEN vus IS NOT NULL
        |      AND pus - vus <= 604800000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_attributed,
        |  CAST(sum(CASE WHEN vus IS NOT NULL
        |      AND pus - vus <= 604800000000 THEN pus - vus ELSE 0 END)
        |    AS BIGINT) AS lag_us_sum,
        |  CAST(sum(CASE WHEN vus IS NOT NULL
        |      AND pus - vus <= 604800000000 THEN rev ELSE 0 END)
        |    AS BIGINT) AS rev_micro_sum
        |FROM a GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("k"), unix_micros(col("ts")).as("t"),
          floor(col("value") * 1000000).cast("long").as("rev"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id").as("k"), unix_micros(col("ts")).as("t"))
        .agg(max(col("event_id")).cast("long").as("vid"))
        .withColumn("vt", col("t"))
      val attributed = graft.operators.AsOfJoin
        .lastAtOrBefore(p, v, keyCol = "k", timeCol = "t",
          valueCols = Seq("vid", "vt"))
        .withColumn("hit", col("vt").isNotNull &&
          col("t") - col("vt") <= 604800000000L)
      attributed.groupBy(col("k").as("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(col("hit"), 1L).otherwise(0L)).cast("long")
            .as("n_attributed"),
          sum(when(col("hit"), col("t") - col("vt")).otherwise(0L))
            .cast("long").as("lag_us_sum"),
          sum(when(col("hit"), col("rev")).otherwise(0L)).cast("long")
            .as("rev_micro_sum"))
        .orderBy(col("user_id"))
    },

    // ---- Join-key skew audit: the pre-shuffle diagnosis a 100 TB
    //      pipeline runs before deciding to salt (q73's operator is
    //      the cure; this report is the diagnosis). Per-key counts,
    //      the top-20 heaviest keys, and each key's load factor vs
    //      the mean in exact micro-units ((n·n_keys·10⁶) div n_rows
    //      over DECIMAL — overflow-proof at any corpus size). One
    //      key agg + a 1-row broadcast + a TakeOrdered heap. ----
    QueryDef.sql("q152_key_skew_audit",
      """WITH k AS (SELECT o_custkey AS key, CAST(count(*) AS BIGINT)
        |    AS n FROM orders GROUP BY o_custkey),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(n) AS BIGINT) AS n_rows FROM k)
        |SELECT k.key, k.n,
        |  CAST(CAST(k.n AS HUGEINT) * st.n_keys * 1000000 // st.n_rows
        |    AS BIGINT) AS load_micro
        |FROM k CROSS JOIN st
        |ORDER BY k.n DESC, k.key LIMIT 20""".stripMargin) { (s, d) =>
      val k = t(s, d, "orders")
        .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("n"))
      val st = k.agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"))
      k.crossJoin(broadcast(st))
        .select(col("key"), col("n"), expr(
          """cast((cast(n as decimal(38,0)) * n_keys * 1000000)
            |  div n_rows as bigint)""".stripMargin).as("load_micro"))
        .orderBy(col("n").desc, col("key")).limit(20)
    },

    // ---- Time-in-state (dwell) report over the SCD2 intervals —
    //      the ops-analytics consumer of q141's dimension build,
    //      sharing the interval builder (and its oracle CTE) so the
    //      two derivations cannot drift. Closed intervals contribute
    //      exact µs dwell; the open interval per user is counted, not
    //      extrapolated. One O(states) agg over the interval rows. ----
    QueryDef.sql("q153_state_dwell",
      s"""WITH $scd2Cte
        |SELECT st AS state, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(CASE WHEN vto IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_open,
        |  CAST(sum(CASE WHEN vto IS NOT NULL THEN vto - us ELSE 0 END)
        |    AS BIGINT) AS dwell_us_sum,
        |  CAST(CAST(sum(CASE WHEN vto IS NOT NULL THEN vto - us ELSE 0
        |      END) AS HUGEINT)
        |    // greatest(1, sum(CASE WHEN vto IS NOT NULL THEN 1 ELSE 0
        |      END)) AS BIGINT) AS mean_dwell_us
        |FROM iv GROUP BY st ORDER BY st""".stripMargin) { (s, d) =>
      scd2Intervals(t(s, d, "events"))
        .groupBy(col("state"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(when(col("valid_to_us").isNull, 1L).otherwise(0L))
            .cast("long").as("n_open"),
          sum(when(col("valid_to_us").isNotNull,
            col("valid_to_us") - col("valid_from_us")).otherwise(0L))
            .cast("long").as("dwell_us_sum"),
          expr("""cast(sum(case when valid_to_us is not null
                |  then valid_to_us - valid_from_us else 0 end)
                |div greatest(1L, sum(case when valid_to_us is not null
                |  then 1L else 0L end)) as bigint)""".stripMargin)
            .as("mean_dwell_us"))
        .orderBy(col("state"))
    },

    // ---- Late-data audit: how late do events arrive relative to
    //      each user-partition's ingest high-water mark — the
    //      measurement that SIZES a watermark delay before anyone
    //      picks one (too short and these counts are your dropped
    //      rows; q93/q124 derive delays from spans for exactly this
    //      reason). The corpus's event_ids are assigned in timestamp
    //      order, so arrival disorder is simulated with a
    //      DETERMINISTIC md5-derived network delay (0-1 h per event —
    //      same on any engine, append-stable); lateness =
    //      high-water-mark-before-me − my event time, exact µs, via
    //      ONE user-keyed running-max window. O(types) report. ----
    QueryDef.sql("q154_late_data_audit",
      s"""WITH v AS (SELECT user_id, event_type AS et, event_id,
        |    epoch_us(ts) AS us, epoch_us(ts)
        |      + ${Sketches.hexSql("md5(CAST(event_id AS VARCHAR))", 1, 8)}
        |        % 3600000000 AS arr
        |  FROM events),
        |r AS (SELECT et, us, max(us) OVER (PARTITION BY user_id
        |    ORDER BY arr, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw
        |  FROM v),
        |l AS (SELECT et, CASE WHEN hw IS NULL OR hw <= us THEN 0
        |    ELSE hw - us END AS late_us FROM r)
        |SELECT et AS event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN late_us > 300000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS late_5m,
        |  CAST(sum(CASE WHEN late_us > 900000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS late_15m,
        |  CAST(sum(CASE WHEN late_us > 2700000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS late_45m,
        |  CAST(max(late_us) AS BIGINT) AS max_late_us
        |FROM l GROUP BY et ORDER BY et""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("arr"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, d, "events")
        .select(col("user_id"), col("event_type").as("et"),
          col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("arr", col("us") +
          conv(substring(md5(col("event_id").cast("string")
            .cast("binary")), 1, 8), 16, 10).cast("long") % 3600000000L)
        .withColumn("hw", max(col("us")).over(w))
        .select(col("et"), when(col("hw").isNull || col("hw") <= col("us"),
          0L).otherwise(col("hw") - col("us")).as("late_us"))
        .groupBy(col("et").as("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("late_us") > 300000000L, 1L).otherwise(0L))
            .cast("long").as("late_5m"),
          sum(when(col("late_us") > 900000000L, 1L).otherwise(0L))
            .cast("long").as("late_15m"),
          sum(when(col("late_us") > 2700000000L, 1L).otherwise(0L))
            .cast("long").as("late_45m"),
          max(col("late_us")).as("max_late_us"))
        .orderBy(col("event_type"))
    },

    // ---- Stream-STATIC enrichment join: the canonical streaming
    //      dimension lookup — the event stream joins a broadcast
    //      static dimension INSIDE the streaming plan (no state for
    //      the static side; each micro-batch joins map-side), then
    //      folds a per-(nation, type) aggregate whose state is
    //      O(nations × types) rows forever. The q124/q132 discipline:
    //      the oracle is the equivalent BATCH join+agg. ----
    QueryDef.sql("q155_stream_enrich",
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events),
        |j AS (SELECT n.n_name, e.event_type, e.vm FROM e
        |  JOIN customer c ON c.c_custkey = e.user_id + 1
        |  JOIN nation n ON n.n_nationkey = c.c_nationkey)
        |SELECT n_name, event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(vm) AS BIGINT) AS vm_sum
        |FROM j GROUP BY n_name, event_type
        |ORDER BY n_name, event_type""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val feedDir = graft.bench.BenchFeeds.feed(s, d, "evenrichfeed",
        idCol = "event_id", checkSpan = false)(ev)
      val dim = t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
        .join(t(s, d, "nation")
          .select(col("n_nationkey").as("c_nationkey"), col("n_name")),
          "c_nationkey")
        .select(col("c_custkey"), col("n_name"))
      val sink = graft.bench.BenchFeeds.sinkName("q155_enrich")
      graft.streaming.StreamRun.withStatePartitions(s, 8) {
        val q = s.readStream
          .schema(s.read.parquet(feedDir).schema)
          .option("maxFilesPerTrigger", 2)
          .parquet(feedDir)
          .select(col("user_id"), col("event_type"),
            floor(col("value") * 1000000).cast("long").as("vm"))
          .join(broadcast(dim), col("c_custkey") === col("user_id") + 1)
          .groupBy(col("n_name"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("vm").cast("decimal(38,0)")).cast("long")
              .as("vm_sum"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).orderBy(col("n_name"), col("event_type"))
    },

    // ---- k-core peel profile on the user co-occurrence graph: three
    //      unrolled rounds of "drop every node with degree < k, then
    //      every edge touching a dropped node" at k = ¾ of the mean
    //      degree (data-derived — the report self-scales with the
    //      graph). The per-round (nodes, edges) profile is the
    //      community-degeneracy audit (bot/spam subgraph detection
    //      runs exactly this peel); each round is a degree agg + two
    //      semi-joins, all node-keyed. A production solver iterates
    //      to fixpoint with per-round localCheckpoint (the q69 CC
    //      pattern); the 3-round unroll keeps the oracle expressible.
    //      Oracle CTEs MATERIALIZED (the q302 lesson, r13): DuckDB
    //      inlines plain CTEs, and the peel chain re-computed the
    //      quadratic co-occurrence join per reference — 80 s at
    //      sf0.01 measured, 0.04 s materialized, identical rows. ----
    QueryDef.sql("q156_kcore_profile",
      """WITH ev AS (SELECT event_type AS et,
        |    epoch_us(ts) // 600000000 AS b, user_id AS u FROM events),
        |bu AS MATERIALIZED (SELECT DISTINCT et, b, u FROM ev),
        |e0 AS MATERIALIZED (SELECT DISTINCT l.u AS x, r.u AS y FROM bu l
        |  JOIN bu r ON l.et = r.et AND l.b = r.b AND l.u < r.u),
        |kk AS MATERIALIZED (SELECT CAST(3 * ((2 * (SELECT count(*) FROM e0))
        |    // greatest(1, (SELECT count(DISTINCT u) FROM (SELECT x AS u
        |        FROM e0 UNION ALL SELECT y FROM e0)))) // 4 AS BIGINT) AS k),
        |d0 AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS dg FROM (
        |    SELECT x AS u FROM e0 UNION ALL SELECT y FROM e0) GROUP BY u),
        |k0 AS MATERIALIZED (SELECT u FROM d0 WHERE dg >= (SELECT k FROM kk)),
        |e1 AS MATERIALIZED (SELECT x, y FROM e0 WHERE x IN (SELECT u FROM k0)
        |  AND y IN (SELECT u FROM k0)),
        |d1 AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS dg FROM (
        |    SELECT x AS u FROM e1 UNION ALL SELECT y FROM e1) GROUP BY u),
        |k1 AS MATERIALIZED (SELECT u FROM d1 WHERE dg >= (SELECT k FROM kk)),
        |e2 AS MATERIALIZED (SELECT x, y FROM e1 WHERE x IN (SELECT u FROM k1)
        |  AND y IN (SELECT u FROM k1)),
        |d2 AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS dg FROM (
        |    SELECT x AS u FROM e2 UNION ALL SELECT y FROM e2) GROUP BY u),
        |k2 AS MATERIALIZED (SELECT u FROM d2 WHERE dg >= (SELECT k FROM kk)),
        |e3 AS MATERIALIZED (SELECT x, y FROM e2 WHERE x IN (SELECT u FROM k2)
        |  AND y IN (SELECT u FROM k2))
        |SELECT round, k, n_nodes, n_edges FROM (
        |  SELECT 0 AS round, (SELECT k FROM kk) AS k,
        |    (SELECT count(*) FROM d0) AS n_nodes,
        |    (SELECT count(*) FROM e0) AS n_edges
        |  UNION ALL SELECT 1, (SELECT k FROM kk),
        |    (SELECT count(*) FROM d1), (SELECT count(*) FROM e1)
        |  UNION ALL SELECT 2, (SELECT k FROM kk),
        |    (SELECT count(*) FROM d2), (SELECT count(*) FROM e2)
        |  UNION ALL SELECT 3, (SELECT k FROM kk),
        |    (SELECT count(DISTINCT u) FROM (SELECT x AS u FROM e3
        |      UNION ALL SELECT y FROM e3)),
        |    (SELECT count(*) FROM e3))
        |ORDER BY round""".stripMargin) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val e0 = t(s, d, "events")
        .select(col("event_type").as("et"),
          expr("unix_micros(ts) div 600000000").as("b"),
          col("user_id").as("u"))
        .distinct()
        .groupBy(col("et"), col("b"))
        .agg(sort_array(collect_set(col("u"))).as("us"))
        .filter(size(col("us")) >= 2)
        .select(explode(expr("all_pairs(us)")).as("p"))
        .select(col("p.x").as("x"), col("p.y").as("y"))
        .distinct()
        // the peel re-reads each round's edge relation several times
        // (degree agg, two semi-joins, the profile counts) — pin each
        // round once (the q69 CC localCheckpoint pattern)
        .localCheckpoint()
      def degrees(e: DataFrame): DataFrame = e.select(col("x").as("u"))
        .unionAll(e.select(col("y").as("u")))
        .groupBy(col("u")).agg(count(lit(1)).as("dg"))
      val e0n = degrees(e0).count()
      val e0e = e0.count()
      val k = 3L * ((2L * e0e) / math.max(1L, e0n)) / 4L
      var rounds = Vector((0, e0n, e0e))
      var e = e0
      for (r <- 1 to 3) {
        val keep = degrees(e).filter(col("dg") >= k).select(col("u"))
        e = e.join(keep.withColumnRenamed("u", "x"), Seq("x"), "left_semi")
          .join(keep.withColumnRenamed("u", "y"), Seq("y"), "left_semi")
          .select(col("x"), col("y"))
          .localCheckpoint()
        val nn = degrees(e).count()
        rounds = rounds :+ ((r, nn, e.count()))
      }
      import s.implicits._
      rounds.map { case (r, nn, ne) => (r, k, nn, ne) }
        .toDF("round", "k", "n_nodes", "n_edges")
        .orderBy(col("round"))
    },

    // ---- Peak-concurrency sweep line: sessions (30-min gap, per
    //      (user, type)) become ±1 boundary events; a running sum
    //      over each type's time-ordered boundaries is the live
    //      session count, and its max is the capacity answer. The
    //      non-associative-looking "concurrent at time t" is two
    //      window scans over ONE type-keyed exchange (the q149
    //      prefix trick's sibling); the tie order (t, delta ASC,
    //      user) is total, so the running values are bit-identical
    //      cross-engine. At 100 TB the sweep shards per (type, day)
    //      with boundary merge — same operator, finer partition key.
    //      ----
    QueryDef.sql("q157_peak_concurrency",
      """WITH v AS (SELECT user_id AS u, event_type AS et,
        |    epoch_us(ts) AS us, event_id FROM events),
        |b AS (SELECT u, et, us, event_id,
        |    CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM v WINDOW w AS (PARTITION BY u, et ORDER BY us, event_id)),
        |g AS (SELECT u, et, us,
        |    sum(brk) OVER (PARTITION BY u, et ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid FROM b),
        |iv AS (SELECT u, et, sid, min(us) AS t0, max(us) AS t1
        |  FROM g GROUP BY u, et, sid),
        |dl AS (SELECT et, t0 AS t, CAST(1 AS BIGINT) AS delta, u, sid
        |    FROM iv
        |  UNION ALL SELECT et, t1 + 1, CAST(-1 AS BIGINT), u, sid FROM iv),
        |rn AS (SELECT et, t, sum(delta) OVER (PARTITION BY et
        |    ORDER BY t, delta, u, sid
        |    ROWS UNBOUNDED PRECEDING) AS run FROM dl),
        |pk AS (SELECT et, CAST(max(run) AS BIGINT) AS peak FROM rn
        |  GROUP BY et),
        |ns AS (SELECT et, CAST(count(*) AS BIGINT) AS n_sessions
        |  FROM iv GROUP BY et)
        |SELECT ns.et AS event_type, ns.n_sessions, pk.peak,
        |  CAST((SELECT min(t) FROM rn WHERE rn.et = pk.et
        |    AND rn.run = pk.peak) AS BIGINT) AS peak_first_us
        |FROM ns JOIN pk ON ns.et = pk.et ORDER BY ns.et""".stripMargin) {
      (s, d) =>
        val wu = Window.partitionBy(col("u"), col("et"))
          .orderBy(col("us"), col("event_id"))
        val v = t(s, d, "events")
          .select(col("user_id").as("u"), col("event_type").as("et"),
            unix_micros(col("ts")).as("us"), col("event_id"))
        val iv = v
          .withColumn("brk",
            when(lag(col("us"), 1).over(wu).isNull ||
              col("us") - lag(col("us"), 1).over(wu) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("sid", sum(col("brk")).over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("u"), col("et"), col("sid"))
          .agg(min(col("us")).as("t0"), max(col("us")).as("t1"))
        val ns = iv.groupBy(col("et")).agg(count(lit(1)).as("n_sessions"))
        ns.join(broadcast(peakConcurrency(iv)), "et")
          .select(col("et").as("event_type"), col("n_sessions"),
            col("peak"), col("peak_first_us"))
          .orderBy(col("event_type"))
    },

    // ---- Compaction planner: the lake-maintenance stage that turns a
    //      small-file manifest into target-size output groups READING
    //      ONLY FILE METADATA. The manifest here is the hourly ingest
    //      shape (one "file" per (event_type, day, hour), size = byte
    //      estimate from the rows it carries — exactly what a
    //      per-trigger streaming sink produces); the planner packs
    //      files in hour order into 512-byte bins by exclusive-prefix-
    //      sum division — the same deterministic packing Spark's own
    //      file-coalescing (maxPartitionBytes) uses, expressible as
    //      one window scan, no sequential driver loop. Per-partition
    //      report: file counts before/after, small-file counts
    //      before/after (< half target), bytes, fattest output. At
    //      100 TB the planner's input is O(files) manifest rows —
    //      corpus bytes are never read; the one exchange is the
    //      (etype, day) manifest window, and the actual rewrite is
    //      CorpusSink's pre-shuffled partitioned write. ----
    QueryDef.sql("q161_compaction_plan",
      """WITH f AS (
        |  SELECT event_type AS etype,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
        |    CAST(sum(length(props)) + 16*count(*) AS BIGINT) AS bytes
        |  FROM events GROUP BY 1,2,3),
        |b AS (
        |  SELECT etype, day, bytes,
        |    (sum(bytes) OVER (PARTITION BY etype, day ORDER BY hr
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - bytes) // 512 AS bin
        |  FROM f),
        |g AS (SELECT etype, day, bin, CAST(sum(bytes) AS BIGINT) AS bin_bytes,
        |    CAST(count(*) AS BIGINT) AS nf,
        |    CAST(sum(CASE WHEN bytes < 256 THEN 1 ELSE 0 END) AS BIGINT) AS sm
        |  FROM b GROUP BY 1,2,3)
        |SELECT etype, day, CAST(sum(nf) AS BIGINT) AS in_files,
        |  CAST(count(*) AS BIGINT) AS out_files,
        |  CAST(sum(sm) AS BIGINT) AS small_in,
        |  CAST(sum(CASE WHEN bin_bytes < 256 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS small_out,
        |  CAST(sum(bin_bytes) AS BIGINT) AS total_bytes,
        |  CAST(max(bin_bytes) AS BIGINT) AS max_out_bytes
        |FROM g GROUP BY 1,2 ORDER BY etype, day""".stripMargin) { (s, d) =>
      val f = t(s, d, "events")
        .groupBy(col("event_type").as("etype"),
          date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hr"))
        .agg((sum(length(col("props"))) + lit(16L) * count(lit(1)))
          .cast("long").as("bytes"))
      val w = Window.partitionBy(col("etype"), col("day")).orderBy(col("hr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val g = f
        .withColumn("cum", sum(col("bytes")).over(w))
        .withColumn("bin", expr("(cum - bytes) div 512"))
        .groupBy(col("etype"), col("day"), col("bin"))
        .agg(sum(col("bytes")).as("bin_bytes"), count(lit(1)).as("nf"),
          sum(when(col("bytes") < 256L, 1L).otherwise(0L)).as("sm"))
      g.groupBy(col("etype"), col("day"))
        .agg(sum(col("nf")).as("in_files"), count(lit(1)).as("out_files"),
          sum(col("sm")).as("small_in"),
          sum(when(col("bin_bytes") < 256L, 1L).otherwise(0L)).as("small_out"),
          sum(col("bin_bytes")).as("total_bytes"),
          max(col("bin_bytes")).as("max_out_bytes"))
        .orderBy(col("etype"), col("day"))
    },

    // ---- Time-weighted average over an irregular series (the IoT /
    //      finance resample): each event's value holds until the next
    //      observation (LOCF), so the day's mean weighs every value by
    //      its µs holding duration — an event-count mean would let
    //      burst periods dominate. Only observed inter-event segments
    //      count (no synthetic midnight extension — the contract is
    //      "time the value was provably held"). All weights are exact:
    //      micro-value × µs-duration in DECIMAL(38,0), summed across
    //      users BEFORE one final double division (identical op order
    //      both engines → 4-dp round is bit-stable). ONE (user, day)
    //      window exchange + an O(days) agg; the (ts, event_id) order
    //      is total, so same-instant ties carry forward
    //      deterministically. ----
    QueryDef.sql("q167_time_weighted_avg",
      """WITH e AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
        |    AS day, epoch_us(ts) AS t, event_id,
        |    CAST(floor(value * 1000000) AS BIGINT) AS v FROM events),
        |seg AS (SELECT user_id, day, v, t,
        |    lead(t) OVER (PARTITION BY user_id, day ORDER BY t, event_id)
        |      AS tn FROM e),
        |c AS (SELECT day, user_id,
        |    CAST(v AS DECIMAL(38,0)) * (tn - t) AS num, tn - t AS dur
        |  FROM seg WHERE tn IS NOT NULL)
        |SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(dur) AS BIGINT) AS total_dur_us,
        |  CASE WHEN sum(dur) = 0 THEN NULL
        |    ELSE round(CAST(sum(num) AS DOUBLE)
        |      / CAST(sum(dur) AS DOUBLE), 4) END AS twa_micro
        |FROM c GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("t"), col("event_id"))
      val seg = t(s, d, "events")
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
          unix_micros(col("ts")).as("t"), col("event_id"),
          floor(col("value") * 1000000).cast("long").as("v"))
        .withColumn("tn", lead(col("t"), 1).over(w))
        .filter(col("tn").isNotNull)
      seg.select(col("day"), col("user_id"),
          (col("v").cast("decimal(38,0)") * (col("tn") - col("t"))).as("num"),
          (col("tn") - col("t")).as("dur"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          // µs durations sum in decimal (a lake-sized day crosses 2⁶³
          // under ANSI long sums; DuckDB's HUGEINT sum never does)
          sum(col("dur").cast("decimal(38,0)")).cast("long")
            .as("total_dur_us"),
          // all-zero gaps (every event of a day at one timestamp)
          // would be 0/0 → IEEE NaN here vs the oracle's NULL — an
          // undefined average has no value in either engine
          when(sum(col("dur").cast("decimal(38,0)")) > 0,
            round(sum(col("num")).cast("double") /
              sum(col("dur").cast("decimal(38,0)")).cast("double"), 4))
            .as("twa_micro"))
        .orderBy(col("day"))
    },

    // ---- Incremental JOIN-view maintenance (the delta rule a lake's
    //      materialized views live by): the revenue-by-segment view
    //      over orders⋈customer is NOT recomputed when new orders
    //      land — the delta joins the dimension alone and its partial
    //      aggregate MERGES into the standing view state
    //      (V(A∪ΔA ⋈ B) = merge(V(A⋈B), V(ΔA⋈B)) — sums and counts
    //      are commutative monoids, so the merge is exact). The
    //      oracle computes the full join DIRECTLY, so the green hash
    //      proves the delta rule, not just self-consistency. Base =
    //      orders with o_orderkey%10 ≠ 0, delta = the held-out 10% —
    //      both legs genuinely non-empty at any SF. Money rides
    //      micro-DECIMAL (lake-safe); at 100 TB the delta leg touches
    //      only new files and the merge is O(|view|). ----
    QueryDef.sql("q176_incremental_join",
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 1000000) AS BIGINT))
        |    AS BIGINT) AS price_micro_sum
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      def leg(f: Column): DataFrame =
        t(s, d, "orders").filter(f)
          .select(col("o_custkey"),
            floor(col("o_totalprice") * 1000000).cast("long")
              .cast("decimal(38,0)").as("pm"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), sum(col("pm")).as("sp"))
      val base = leg(col("o_orderkey") % 10 =!= 0)
      val delta = leg(col("o_orderkey") % 10 === 0)
      base.unionByName(delta)
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("n")).cast("long").as("n_orders"),
          sum(col("sp")).cast("long").as("price_micro_sum"))
        .orderBy(col("c_mktsegment"))
    },

    // ---- Hourly autocorrelation function (seasonality audit): ACF at
    //      lags 1..24 over each event type's hourly arrival counts —
    //      the readout that says whether a feed has a daily cycle
    //      (acf peaks at lag 24) BEFORE anyone fits a forecast to it.
    //      The series lives on a dense integer hour spine (missing
    //      hours are real zeros, not absent rows — an ACF over the
    //      occupied hours only would alias the gaps into the signal).
    //      Exact everywhere but the last division: centering is done
    //      n-scaled (c_t = n·x_t − Σx, integers — no float mean), both
    //      Σ c_t·c_{t+k} and Σ c_t² are DECIMAL(38,0) sums, and the
    //      one float op is the final ratio, rounded 6 dp. Every stage
    //      past the (etype, hour) count is O(types·hours) — the lag
    //      self-join expands 24× over SPINE rows, never corpus rows;
    //      a year of hourly series is 8 760 rows per type. Constant
    //      series ⇒ Σc² = 0 ⇒ NULL (guarded both engines). ----
    QueryDef.sql("q194_hourly_acf",
      s"""WITH $hourlySeriesCte,
        |st AS (SELECT etype, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx FROM ser GROUP BY etype),
        |cen AS (SELECT ser.etype, ser.hidx,
        |    CAST(st.n AS HUGEINT) * ser.x - st.sx AS c
        |  FROM ser JOIN st ON st.etype = ser.etype),
        |den AS (SELECT etype, sum(c * c) AS d2 FROM cen GROUP BY etype),
        |lags AS (SELECT unnest(range(1, 25)) AS lag),
        |num AS (SELECT a.etype, l.lag, sum(a.c * b.c) AS nk
        |  FROM cen a JOIN lags l ON true
        |  JOIN cen b ON b.etype = a.etype AND b.hidx = a.hidx + l.lag
        |  GROUP BY a.etype, l.lag)
        |SELECT n.etype, CAST(n.lag AS INTEGER) AS lag, st.n AS n_hours,
        |  CASE WHEN den.d2 = 0 THEN NULL
        |    ELSE round(CAST(n.nk AS DOUBLE) / CAST(den.d2 AS DOUBLE), 6)
        |  END AS acf
        |FROM num n JOIN den ON den.etype = n.etype
        |JOIN st ON st.etype = n.etype
        |ORDER BY n.etype, lag""".stripMargin) { (s, d) =>
      val ser = hourlySeries(t(s, d, "events"))
      val st = ser.groupBy(col("etype"))
        .agg(count(lit(1)).as("n"), sum(col("x")).cast("long").as("sx"))
      // the centered series is O(types·hours) — checkpointed once, it
      // feeds the denominator agg and BOTH legs of the lag self-join
      val cen = ser.join(broadcast(st), "etype")
        .select(col("etype"), col("hidx"),
          (col("n").cast("decimal(38,0)") * col("x") - col("sx")).as("c"))
        .localCheckpoint()
      val den = cen.groupBy(col("etype")).agg(sum(col("c") * col("c")).as("d2"))
      val num = cen
        .withColumn("lag", explode(sequence(lit(1L), lit(24L)))).as("a")
        .join(cen.as("b"),
          col("b.etype") === col("a.etype")
            && col("b.hidx") === col("a.hidx") + col("a.lag"))
        .groupBy(col("a.etype").as("etype"), col("a.lag").as("lag"))
        .agg(sum(col("a.c") * col("b.c")).as("nk"))
      num.join(broadcast(den), "etype").join(broadcast(st), "etype")
        .select(col("etype"), col("lag").cast("int").as("lag"),
          col("n").as("n_hours"),
          when(col("d2") === 0, lit(null).cast("double"))
            .otherwise(round(col("nk").cast("double")
              / col("d2").cast("double"), 6)).as("acf"))
        .orderBy(col("etype"), col("lag"))
    },

    // ---- Streaming twin of the q200 Benford audit (the q145/q181
    //      discipline applied to forensics): the (type, digit) counts
    //      fold INCREMENTALLY over the event feed — a plain
    //      associative complete-mode aggregation whose state is
    //      O(types·9) rows FOREVER — and the χ² assembly runs AT READ
    //      off the folded table through the SHARED benfordTail, so
    //      batch and stream cannot drift. This is the operational
    //      form: the fraud monitor watches digits as events arrive,
    //      not in a nightly batch. Oracle = q200's oracle verbatim;
    //      the green hash proves stream ≡ batch. ----
    QueryDef.sql("q205_stream_benford",
      TrainingOps.queries.find(_.name == "q200_benford_audit").get
        .oracle.get) { (s, d) =>
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val feedDir = graft.bench.BenchFeeds.feed(s, d, "evvalfeed",
        idCol = "event_id", checkSpan = false)(ev)
      val sink = graft.bench.BenchFeeds.sinkName("q205_benford")
      graft.streaming.StreamRun.withStatePartitions(s, 8) {
        val q = s.readStream
          .schema(s.read.parquet(feedDir).schema)
          .option("maxFilesPerTrigger", 2)
          .parquet(feedDir)
          .select(col("event_type").as("etype"),
            floor(col("value") * 1000000).cast("long").as("vm"))
          .filter(col("vm") > 0)
          .select(col("etype"),
            substring(col("vm").cast("string"), 1, 1).cast("int")
              .as("digit"))
          .groupBy(col("etype"), col("digit"))
          .agg(count(lit(1)).as("obs"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
      }
      // checkpoint snapshots the memory sink AND breaks the lineage so
      // the tail's n-rollup⋈counts self-join resolves unambiguously
      TrainingOps.benfordTail(
        s.table(sink).select(col("etype"), col("digit"),
          col("obs").cast("long").as("obs")).localCheckpoint())
    },

    // ---- Cross-correlation between event-type pairs at lags −12..+12
    //      hours — the LEAD–LAG discovery q194's ACF can't see: a ccf
    //      peak at lag +2 on (click, error) says errors FOLLOW click
    //      surges by two hours, the causal breadcrumb an on-call team
    //      wants. The two series must share ONE GLOBAL spine (per-type
    //      spans would misalign t), so both are centered against the
    //      same n; q194's exact-integer discipline otherwise —
    //      n-scaled centering, DECIMAL(38,0) cross-products, the
    //      final normalized ratio is the one float (√(Σa²·Σb²)
    //      denominator). O(pairs·hours·lags) work past the hourly
    //      count, never corpus rows. Either series constant ⇒ NULL
    //      (guarded both engines). ----
    QueryDef.sql("q211_crosscorr_leadlag",
      """WITH h AS (SELECT event_type AS etype,
        |    CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hidx FROM events),
        |cnt AS (SELECT etype, hidx, CAST(count(*) AS BIGINT) AS x
        |  FROM h GROUP BY etype, hidx),
        |gb AS (SELECT min(hidx) AS h0, max(hidx) AS h1 FROM cnt),
        |tys AS (SELECT DISTINCT etype FROM cnt),
        |spine AS (SELECT tys.etype, unnest(range(gb.h0, gb.h1 + 1))
        |    AS hidx FROM tys, gb),
        |ser AS (SELECT s.etype, s.hidx, COALESCE(c.x, 0) AS x
        |  FROM spine s LEFT JOIN cnt c
        |    ON c.etype = s.etype AND c.hidx = s.hidx),
        |st AS (SELECT etype, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx FROM ser GROUP BY etype),
        |cen AS (SELECT ser.etype, ser.hidx,
        |    CAST(st.n AS HUGEINT) * ser.x - st.sx AS c
        |  FROM ser JOIN st ON st.etype = ser.etype),
        |den AS (SELECT etype, sum(c * c) AS d2 FROM cen GROUP BY etype),
        |lags AS (SELECT unnest(range(-12, 13)) AS lag),
        |num AS (SELECT a.etype AS ta, b.etype AS tb, l.lag,
        |    sum(a.c * b.c) AS nk
        |  FROM cen a JOIN lags l ON true
        |  JOIN cen b ON b.hidx = a.hidx + l.lag AND a.etype < b.etype
        |  GROUP BY a.etype, b.etype, l.lag)
        |SELECT n.ta, n.tb, CAST(n.lag AS INTEGER) AS lag,
        |  CASE WHEN da.d2 = 0 OR db.d2 = 0 THEN NULL
        |    ELSE round(CAST(n.nk AS DOUBLE)
        |      / sqrt(CAST(da.d2 AS DOUBLE) * CAST(db.d2 AS DOUBLE)), 6)
        |  END AS ccf
        |FROM num n JOIN den da ON da.etype = n.ta
        |JOIN den db ON db.etype = n.tb
        |ORDER BY n.ta, n.tb, lag""".stripMargin) { (s, d) =>
      val cnt = t(s, d, "events")
        .select(col("event_type").as("etype"),
          expr("CAST(ts AS BIGINT) div 3600").as("hidx"))
        .groupBy(col("etype"), col("hidx"))
        .agg(count(lit(1)).as("x"))
      val gb = cnt.agg(min(col("hidx")).as("h0"), max(col("hidx")).as("h1"))
      val ser = cnt.select(col("etype")).distinct()
        .crossJoin(broadcast(gb))
        .select(col("etype"),
          explode(sequence(col("h0"), col("h1"))).as("hidx"))
        .join(cnt, Seq("etype", "hidx"), "left")
        .select(col("etype"), col("hidx"),
          coalesce(col("x"), lit(0L)).as("x"))
      val st = ser.groupBy(col("etype"))
        .agg(count(lit(1)).as("n"), sum(col("x")).cast("long").as("sx"))
      val cen = ser.join(broadcast(st), "etype")
        .select(col("etype"), col("hidx"),
          (col("n").cast("decimal(38,0)") * col("x") - col("sx")).as("c"))
        .localCheckpoint() // feeds den and both legs of the lag join
      val den = cen.groupBy(col("etype"))
        .agg(sum(col("c") * col("c")).as("d2"))
      val num = cen
        .withColumn("lag", explode(sequence(lit(-12L), lit(12L)))).as("a")
        .join(cen.as("b"),
          col("b.hidx") === col("a.hidx") + col("a.lag")
            && col("a.etype") < col("b.etype"))
        .groupBy(col("a.etype").as("ta"), col("b.etype").as("tb"),
          col("a.lag").as("lag"))
        .agg(sum(col("a.c") * col("b.c")).as("nk"))
      num
        .join(broadcast(den.select(col("etype").as("ta"),
          col("d2").as("da"))), "ta")
        .join(broadcast(den.select(col("etype").as("tb"),
          col("d2").as("db"))), "tb")
        .select(col("ta"), col("tb"), col("lag").cast("int").as("lag"),
          when(col("da") === 0 || col("db") === 0,
            lit(null).cast("double"))
            .otherwise(round(col("nk").cast("double")
              / sqrt(col("da").cast("double") * col("db").cast("double")),
              6)).as("ccf"))
        .orderBy(col("ta"), col("tb"), col("lag"))
    },

    // ---- Seasonality strength per event type: 1 − SSE_within(hour-
    //      of-day) / SST — the fraction of hourly variance the daily
    //      cycle explains (the one number that says whether q194's
    //      lag-24 peak is worth modeling). Group and total sums of
    //      squares are exact integer moments off the SHARED
    //      hourlySeries; each group's SSE lands in integer micro by
    //      per-group integer division (identical op order both
    //      engines), so the strength ratio is integer arithmetic end
    //      to end. Constant series ⇒ SST = 0 ⇒ NULL (guarded). ----
    QueryDef.sql("q212_seasonality_strength",
      s"""WITH $hourlySeriesCte,
        |hod AS (SELECT etype, hidx % 24 AS hd, x FROM ser),
        |grp AS (SELECT etype, hd, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(x) AS BIGINT) AS s1, sum(CAST(x AS HUGEINT) * x) AS s2
        |  FROM hod GROUP BY etype, hd),
        |ssw AS (SELECT etype, CAST(sum((s2 * ng - CAST(s1 AS HUGEINT) * s1)
        |    * 1000000 // ng) AS HUGEINT) AS ssew_micro
        |  FROM grp GROUP BY etype),
        |tot AS (SELECT etype, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s1, sum(CAST(x AS HUGEINT) * x) AS s2
        |  FROM hod GROUP BY etype),
        |sst AS (SELECT etype, n,
        |    CAST((s2 * n - CAST(s1 AS HUGEINT) * s1) * 1000000 // n
        |      AS HUGEINT) AS sst_micro FROM tot)
        |SELECT sst.etype, sst.n AS n_hours,
        |  CASE WHEN sst.sst_micro = 0 THEN NULL
        |    ELSE CAST(1000000 - ssw.ssew_micro * 1000000 // sst.sst_micro
        |      AS BIGINT) END AS seasonality_micro
        |FROM sst JOIN ssw ON ssw.etype = sst.etype
        |ORDER BY sst.etype""".stripMargin) { (s, d) =>
      val hod = hourlySeries(t(s, d, "events"))
        .select(col("etype"), (col("hidx") % 24).as("hd"), col("x"))
        .localCheckpoint() // O(types·hours) rows feed both moment aggs
      val ssw = hod.groupBy(col("etype"), col("hd"))
        .agg(count(lit(1)).as("ng"),
          sum(col("x")).cast("decimal(38,0)").as("s1"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("s2"))
        .groupBy(col("etype"))
        .agg(sum(expr("(s2 * ng - s1 * s1) * 1000000 div ng"))
          .cast("decimal(38,0)").as("ssew_micro"))
      val sst = hod.groupBy(col("etype"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("decimal(38,0)").as("s1"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("s2"))
        .select(col("etype"), col("n"),
          expr("(s2 * n - s1 * s1) * 1000000 div n")
            .cast("decimal(38,0)").as("sst_micro"))
      sst.join(broadcast(ssw), "etype")
        .select(col("etype"), col("n").as("n_hours"),
          when(col("sst_micro") === 0, lit(null).cast("long"))
            .otherwise(expr("""CAST(1000000 - (ssew_micro * 1000000)
              |  div sst_micro AS BIGINT)""".stripMargin))
            .as("seasonality_micro"))
        .orderBy(col("etype"))
    },

    // ---- Exact single-changepoint fit per event type: the hour that
    //      best splits the series into two level segments — q149's
    //      CUSUM says drift EXISTS, this says WHERE and by how much
    //      (the before/after means). Minimizing two-segment SSE ⇔
    //      maximizing between-group sum of squares A1²/n_l + B1²/n_r
    //      (SST is fixed), evaluated for every candidate break off
    //      ONE cumulative window over the SHARED hourlySeries — the
    //      score is exact integer micro (DECIMAL(38,0) numerator,
    //      one integer division per candidate), the argmax is a rank
    //      window with hidx tie-break, and a 24 h MINIMUM SEGMENT
    //      keeps the known small-segment bias of the between-SS
    //      criterion from electing a 1-point "regime". Series shorter
    //      than 48 h ⇒ no candidates ⇒ empty (DegenerateInputSpec).
    //      ----
    QueryDef.sql("q213_changepoint_fit",
      s"""WITH $hourlySeriesCte,
        |cum AS (SELECT etype, hidx,
        |    sum(x) OVER (PARTITION BY etype ORDER BY hidx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a1,
        |    CAST(row_number() OVER (PARTITION BY etype ORDER BY hidx)
        |      AS BIGINT) AS na
        |  FROM ser),
        |tot AS (SELECT etype, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s1 FROM ser GROUP BY etype),
        |sc AS (SELECT c.etype, c.hidx, c.na, tot.n - c.na AS nb, c.a1,
        |    tot.s1 - c.a1 AS b1,
        |    CAST((CAST(c.a1 AS HUGEINT) * c.a1 * (tot.n - c.na)
        |      + CAST(tot.s1 - c.a1 AS HUGEINT) * (tot.s1 - c.a1) * c.na)
        |      * 1000000 // (CAST(c.na AS HUGEINT) * (tot.n - c.na))
        |      AS BIGINT) AS score
        |  FROM cum c JOIN tot ON tot.etype = c.etype
        |  WHERE c.na >= 24 AND tot.n - c.na >= 24),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY etype
        |    ORDER BY score DESC, hidx) AS rr FROM sc)
        |SELECT etype, hidx AS break_hidx, na AS n_left, nb AS n_right,
        |  CAST(CAST(a1 AS HUGEINT) * 1000000 // na AS BIGINT)
        |    AS mean_left_micro,
        |  CAST(CAST(b1 AS HUGEINT) * 1000000 // nb AS BIGINT)
        |    AS mean_right_micro
        |FROM rk WHERE rr = 1 ORDER BY etype""".stripMargin) { (s, d) =>
      val ser = hourlySeries(t(s, d, "events"))
      val wCum = Window.partitionBy(col("etype")).orderBy(col("hidx"))
      val cum = ser
        .withColumn("a1", sum(col("x"))
          .over(wCum.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .withColumn("na", row_number().over(wCum).cast("long"))
      val tot = ser.groupBy(col("etype"))
        .agg(count(lit(1)).as("n"), sum(col("x")).cast("long").as("s1"))
      val sc = cum.join(broadcast(tot), "etype")
        .filter(col("na") >= 24 && col("n") - col("na") >= 24)
        .select(col("etype"), col("hidx"), col("na"),
          (col("n") - col("na")).as("nb"), col("a1"),
          (col("s1") - col("a1")).as("b1"),
          expr("""CAST((CAST(a1 AS DECIMAL(38,0)) * a1 * (n - na)
            |  + CAST(s1 - a1 AS DECIMAL(38,0)) * (s1 - a1) * na)
            |  * 1000000 div (CAST(na AS DECIMAL(38,0)) * (n - na))
            |  AS BIGINT)""".stripMargin).as("score"))
      val wRk = Window.partitionBy(col("etype"))
        .orderBy(col("score").desc, col("hidx"))
      sc.withColumn("rr", row_number().over(wRk))
        .filter(col("rr") === 1)
        .select(col("etype"), col("hidx").as("break_hidx"),
          col("na").as("n_left"), col("nb").as("n_right"),
          expr("CAST((CAST(a1 AS DECIMAL(38,0)) * 1000000) div na"
            + " AS BIGINT)").as("mean_left_micro"),
          expr("CAST((CAST(b1 AS DECIMAL(38,0)) * 1000000) div nb"
            + " AS BIGINT)").as("mean_right_micro"))
        .orderBy(col("etype"))
    },

    // ---- Fano factor (index of dispersion) per event type: hourly
    //      variance-to-mean off the SHARED hourlySeries — the one
    //      number that says whether arrivals are Poisson (≈1, this
    //      corpus), BURSTY (≫1 — batch jobs, scrapers, incident
    //      storms), or quota-regularized (≪1). The complement to
    //      q212: seasonality explains variance, Fano says how much
    //      raw variance there is to explain. Exact integer micro:
    //      (n·Σx² − (Σx)²)·10⁶ div (n·Σx), DECIMAL(38,0) moments;
    //      an all-empty series (Σx = 0) ⇒ NULL. ----
    QueryDef.sql("q219_fano_burstiness", fanoOracle) { (s, d) =>
      fanoTail(hourlySeries(t(s, d, "events")))
    },

    // ---- Streaming twin of the q219 Fano monitor: the (type, hour)
    //      counts fold incrementally as a complete-mode streaming
    //      aggregation — the canonical time-bounded state (O(types ×
    //      elapsed hours), growing with TIME not corpus size; closed
    //      hours are compactable à la q97) — and the spine fill +
    //      dispersion assembly run AT READ through the SHARED
    //      seriesFromCounts/fanoTail, so the whole hourly-series
    //      family (q194/q211/q212/q213/q219) is proven streamable by
    //      this one green hash against q219's verbatim oracle. ----
    QueryDef.sql("q220_stream_hourly_fano", fanoOracle) { (s, d) =>
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"), col("ts"))
      val feedDir = graft.bench.BenchFeeds.feed(s, d, "evhrfeed",
        idCol = "event_id", checkSpan = false)(ev)
      val sink = graft.bench.BenchFeeds.sinkName("q220_fano")
      graft.streaming.StreamRun.withStatePartitions(s, 8) {
        val q = s.readStream
          .schema(s.read.parquet(feedDir).schema)
          .option("maxFilesPerTrigger", 2)
          .parquet(feedDir)
          .select(col("event_type").as("etype"),
            expr("CAST(ts AS BIGINT) div 3600").as("hidx"))
          .groupBy(col("etype"), col("hidx"))
          .agg(count(lit(1)).as("x"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
      }
      fanoTail(seriesFromCounts(
        s.table(sink).select(col("etype"), col("hidx"),
          col("x").cast("long").as("x")).localCheckpoint()))
    },

    // ---- Inter-arrival CV² per event type: the EVENT-granularity
    //      burstiness twin of q219's hourly Fano — CV² = var/mean² of
    //      the gaps, 1 for a Poisson process (this corpus), ≫1 for
    //      machine-gun batches, ≪1 for metronome schedulers. Gaps are
    //      exact integer µs from a lag window PARTITIONED BY
    //      (type, day) — never one partition per type (which would
    //      serialize a year of events); the day-boundary gap is
    //      dropped, a bounded bias every streaming-window estimator
    //      shares. Moments are DECIMAL(38,0); zero mean gap or a
    //      single gap ⇒ NULL (guarded both engines). ----
    QueryDef.sql("q223_interarrival_cv2",
      """WITH e AS (SELECT event_type AS etype, CAST(ts AS DATE) AS dy,
        |    epoch_us(ts) AS us, event_id FROM events),
        |g AS (SELECT etype, us - lag(us) OVER (PARTITION BY etype, dy
        |    ORDER BY us, event_id) AS gap FROM e),
        |mo AS (SELECT etype, CAST(count(gap) AS BIGINT) AS n,
        |    sum(CAST(gap AS HUGEINT)) AS s1,
        |    sum(CAST(gap AS HUGEINT) * gap) AS s2
        |  FROM g WHERE gap IS NOT NULL GROUP BY etype)
        |SELECT etype, n AS n_gaps,
        |  CAST(CAST(s1 AS HUGEINT) // n AS BIGINT) AS mean_gap_us,
        |  CASE WHEN s1 = 0 OR n <= 1 THEN NULL
        |    ELSE CAST((CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
        |      * 1000000 // (CAST(s1 AS HUGEINT) * s1) AS BIGINT) END
        |    AS cv2_micro
        |FROM mo ORDER BY etype""".stripMargin) { (s, d) =>
      val wG = Window.partitionBy(col("etype"), col("dy"))
        .orderBy(col("us"), col("event_id"))
      t(s, d, "events")
        .select(col("event_type").as("etype"),
          col("ts").cast("date").as("dy"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(wG))
        .filter(col("gap").isNotNull)
        .groupBy(col("etype"))
        .agg(count(lit(1)).as("n"),
          sum(col("gap").cast("decimal(38,0)")).as("s1"),
          sum(col("gap").cast("decimal(38,0)") * col("gap")).as("s2"))
        .select(col("etype"), col("n").as("n_gaps"),
          expr("CAST(s1 div n AS BIGINT)").as("mean_gap_us"),
          when(col("s1") === 0 || col("n") <= 1,
            lit(null).cast("long"))
            .otherwise(expr("""CAST(((n * s2 - s1 * s1) * 1000000)
              |  div (s1 * s1) AS BIGINT)""".stripMargin))
            .as("cv2_micro"))
        .orderBy(col("etype"))
    },

    // ---- Schema-driven table profiler: per column of `orders`,
    //      null count and exact distinct count in ONE pass — the
    //      data-quality fingerprint a lake catalog records per
    //      snapshot. The Spark side derives the aggregate list from
    //      df.columns (dynamic schema — no column is named in the
    //      code), then unpivots via stack(); the multi-distinct agg
    //      is Catalyst's expand (one shuffle carrying an n_cols×
    //      row expansion of only the profiled columns). At 100 TB
    //      the distinct legs swap to HLL partials (the q95 sketch
    //      lake) — exact here so the oracle can pin the counts. ----
    QueryDef.sql("q230_table_profile",
      """SELECT 'o_custkey' AS col_name,
        |  CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
        |    AS n_null,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
        |FROM orders
        |UNION ALL SELECT 'o_orderdate',
        |  CAST(count(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT),
        |  CAST(count(DISTINCT o_orderdate) AS BIGINT) FROM orders
        |UNION ALL SELECT 'o_orderkey',
        |  CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT),
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders
        |UNION ALL SELECT 'o_orderpriority',
        |  CAST(count(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT),
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders
        |UNION ALL SELECT 'o_orderstatus',
        |  CAST(count(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT),
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders
        |UNION ALL SELECT 'o_totalprice',
        |  CAST(count(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT),
        |  CAST(count(DISTINCT o_totalprice) AS BIGINT) FROM orders
        |ORDER BY col_name""".stripMargin) { (s, d) =>
      val df = t(s, d, "orders")
      val cols = df.columns.sorted.toSeq
      val aggs = cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
          countDistinct(col(c)).as(s"${c}__nd"))
      }
      val stackArgs = cols
        .map(c => s"'$c', ${c}__nn, ${c}__nd").mkString(", ")
      df.agg(aggs.head, aggs.tail: _*)
        .select(expr(s"stack(${cols.length}, $stackArgs) " +
          "AS (col_name, n_null, n_distinct)"))
        .orderBy(col("col_name"))
    },

    // ---- Robust outlier gate: median/MAD per event type (the
    //      3.5σ-equivalent rule x > med + 3.5·1.4826·MAD — Iglewicz
    //      & Hoaglin's modified z-score), the heavy-tail-safe
    //      replacement for q139's mean/stddev gate. Exact medians
    //      (percentile ↔ quantile_cont, the q53 pairing), each
    //      ROUNDED to 4 dp before re-entering arithmetic so both
    //      engines branch on bit-identical thresholds (the decimal
    //      discipline). Two grouped exact-percentile passes — the
    //      100 TB swap is approx_percentile / the q103 quantile
    //      lake; the gate logic is unchanged. ----
    QueryDef.sql("q231_mad_outliers",
      """WITH m AS (SELECT event_type,
        |    CAST(round(CAST(quantile_cont(value, 0.5) AS DECIMAL(25,10)),
        |      4) AS DOUBLE) AS med FROM events GROUP BY 1),
        |a AS (SELECT e.event_type, e.value, m.med,
        |    abs(e.value - m.med) AS ad FROM events e JOIN m USING (event_type)),
        |md AS (SELECT event_type,
        |    CAST(round(CAST(quantile_cont(ad, 0.5) AS DECIMAL(25,10)),
        |      4) AS DOUBLE) AS mad FROM a GROUP BY 1)
        |SELECT a.event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (WHERE a.ad > 5.1891 * md.mad) AS BIGINT)
        |    AS outliers,
        |  max(a.med) AS med, max(md.mad) AS mad
        |FROM a JOIN md ON a.event_type = md.event_type
        |GROUP BY a.event_type ORDER BY a.event_type""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val m = ev.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)").cast("decimal(25,10)"), 4)
          .cast("double").as("med"))
      val a = ev.join(m, "event_type")
        .withColumn("ad", abs(col("value") - col("med")))
      val md = a.groupBy(col("event_type"))
        .agg(round(expr("percentile(ad, 0.5)").cast("decimal(25,10)"), 4)
          .cast("double").as("mad"))
      a.join(md, "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("ad") > lit(5.1891) * col("mad"), 1L).otherwise(0L))
            .cast("long").as("outliers"),
          max(col("med")).as("med"), max(col("mad")).as("mad"))
        .orderBy(col("event_type"))
    },

    // ---- Theil–Sen robust trend: per event type, the median of all
    //      pairwise slopes of the DAILY INTEGER totals (micro units)
    //      — the estimator that shrugs off the outlier days that
    //      wreck OLS (q213's fit). Each slope is one integer-by-
    //      integer IEEE division — bit-identical on both engines, no
    //      order-dependent float accumulation — and only the final
    //      median is rounded. The day fold is the corpus-sized agg;
    //      the O(days²) pair join is bounded by the series length
    //      (365·years rows per type), never by corpus size. ----
    QueryDef.sql("q232_theilsen_slope",
      """WITH dly AS (SELECT event_type,
        |    epoch(CAST(CAST(ts AS DATE) AS TIMESTAMP)) // 86400 AS dn,
        |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
        |      AS vm
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    CAST(b.vm - a.vm AS DOUBLE) / (b.dn - a.dn) AS slope
        |  FROM dly a JOIN dly b
        |    ON a.event_type = b.event_type AND a.dn < b.dn)
        |SELECT event_type,
        |  CAST(round(CAST(quantile_cont(slope, 0.5) AS DECIMAL(38,10)),
        |    4) AS DOUBLE) AS ts_slope_micro_4,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val dly = t(s, d, "events")
        .groupBy(col("event_type"),
          expr("unix_date(cast(ts as date))").cast("long").as("dn"))
        .agg(sum(floor(col("value") * 1000000).cast("long")).cast("long")
          .as("vm"))
      val a = dly.select(col("event_type"), col("dn").as("dna"),
        col("vm").as("vma"))
      val b = dly.select(col("event_type"), col("dn").as("dnb"),
        col("vm").as("vmb"))
      a.join(b, Seq("event_type")).filter(col("dna") < col("dnb"))
        .withColumn("slope",
          (col("vmb") - col("vma")).cast("double") / (col("dnb") - col("dna")))
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(slope, 0.5)").cast("decimal(38,10)"), 4)
            .cast("double").as("ts_slope_micro_4"),
          count(lit(1)).as("n_pairs"))
        .orderBy(col("event_type"))
    },

    // ---- Shard-rebalance audit: rendezvous (highest-random-weight)
    //      hashing vs mod-hashing when the lake grows 8 → 9 shards.
    //      HRW's monotonicity means docs only ever move INTO the new
    //      shard (~1/9 of the corpus); mod-hash reshuffles ~8/9 — the
    //      report PROVES it per shard, which is the decision gate
    //      before resharding a 100 TB lake. Assignment is pure
    //      MAP-SIDE algebra: the 9-entry md5 weight array is built
    //      per row (`transform(sequence(...))`) and argmax'd by
    //      struct ordering with an (h, s) total tie-break — no
    //      corpus×shards row explosion, no per-doc window, no join;
    //      the only exchanges are the two 9-group aggregates. ----
    QueryDef.sql("q257_shard_rebalance",
      s"""WITH sh AS (SELECT range AS s FROM range(0, 9)),
        |hw AS (SELECT doc_id, s,
        |    ${Sketches.hexSql("md5(CAST(doc_id AS VARCHAR) || ':'" +
               " || CAST(s AS VARCHAR))", 1, 15)} AS h
        |  FROM documents, sh),
        |a8 AS (SELECT doc_id, s AS old FROM (SELECT doc_id, s,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY h DESC, s DESC) AS rn
        |  FROM hw WHERE s < 8) WHERE rn = 1),
        |a9 AS (SELECT doc_id, s AS snew FROM (SELECT doc_id, s,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY h DESC, s DESC) AS rn
        |  FROM hw) WHERE rn = 1),
        |hrw AS (SELECT 'rendezvous' AS policy, CAST(snew AS BIGINT)
        |      AS shard, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN old <> snew THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_moved
        |  FROM a8 JOIN a9 USING (doc_id) GROUP BY snew),
        |md AS (SELECT 'mod' AS policy, CAST(doc_id % 9 AS BIGINT)
        |      AS shard, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN doc_id % 8 <> doc_id % 9 THEN 1 ELSE 0
        |      END) AS BIGINT) AS n_moved
        |  FROM documents GROUP BY doc_id % 9)
        |SELECT * FROM hrw UNION ALL SELECT * FROM md
        |ORDER BY policy, shard""".stripMargin) { (s, d) =>
      def hrwShard(n: Int): String =
        s"""CAST(array_max(transform(sequence(0, ${n - 1}),
           |  sx -> struct(CAST(conv(substring(md5(CAST(concat(
           |    CAST(doc_id AS STRING), ':', CAST(sx AS STRING))
           |    AS BINARY)), 1, 15), 16, 10) AS BIGINT) AS h, sx AS s)
           |  )).s AS BIGINT)""".stripMargin
      val docs = t(s, d, "documents").select(col("doc_id"),
        expr(hrwShard(8)).as("old"), expr(hrwShard(9)).as("snew"))
      val hrw = docs.groupBy(col("snew").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("old") =!= col("snew"), 1L).otherwise(0L))
            .cast("long").as("n_moved"))
        .select(lit("rendezvous").as("policy"), col("shard"),
          col("n_docs"), col("n_moved"))
      val md = t(s, d, "documents")
        .groupBy((col("doc_id") % 9).as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") % 8 =!= col("doc_id") % 9, 1L)
            .otherwise(0L)).cast("long").as("n_moved"))
        .select(lit("mod").as("policy"), col("shard").cast("long"),
          col("n_docs"), col("n_moved"))
      hrw.unionAll(md).orderBy(col("policy"), col("shard"))
    },

    // ---- MASE forecast audit (seasonal-naive vs naive-1): can the
    //      24-hour-ago value forecast this hour better than the
    //      last-hour value? MASE < 1 = daily seasonality is real
    //      signal; ≈ 1 (what this corpus honestly reads) = no
    //      exploitable cycle — the go/no-go gate before shipping a
    //      seasonal model. Built ON the SHARED dense hourly series
    //      ([[hourlySeries]] — q194/q212/q213/q219's spine, so the
    //      series definition cannot drift); absolute errors are exact
    //      integers off two lag windows, MASE one HUGEINT/DECIMAL
    //      cross-multiplied floor division (all terms nonnegative).
    //      Scale: one (etype, hour) agg + an etype-keyed lag window
    //      over O(types·hours) rows. ----
    QueryDef.sql("q261_mase_forecast", maseOracle) { (s, d) =>
      maseTail(hourlySeries(t(s, d, "events")))
    },

    // ---- Streaming MASE twin: the forecast audit folding ON the
    //      live feed — the (etype, hidx) counts accumulate as a
    //      complete-mode streaming aggregation (state O(types·elapsed
    //      hours), q220's bound) and the spine fill + lag/MASE
    //      assembly run AT READ through the SHARED seriesFromCounts/
    //      maseTail, against q261's verbatim oracle: one green hash
    //      proves the forecast-audit family streamable end to end. ----
    QueryDef.sql("q273_stream_mase", maseOracle) { (s, d) =>
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"), col("ts"))
      val feedDir = graft.bench.BenchFeeds.feed(s, d, "evhrfeed",
        idCol = "event_id", checkSpan = false)(ev)
      val sink = graft.bench.BenchFeeds.sinkName("q273_mase")
      graft.streaming.StreamRun.withStatePartitions(s, 8) {
        val q = s.readStream
          .schema(s.read.parquet(feedDir).schema)
          .option("maxFilesPerTrigger", 2)
          .parquet(feedDir)
          .select(col("event_type").as("etype"),
            expr("CAST(ts AS BIGINT) div 3600").as("hidx"))
          .groupBy(col("etype"), col("hidx"))
          .agg(count(lit(1)).as("x"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
      }
      maseTail(seriesFromCounts(
        s.table(sink).select(col("etype"), col("hidx"),
          col("x").cast("long").as("x")).localCheckpoint()))
    },

    // ---- k-anonymity release audit over the quasi-identifier tuple
    //      (lang, source, length-bucket): how many documents sit in
    //      QI groups smaller than k for k ∈ {2, 5, 10} — the privacy
    //      gate a corpus release runs BEFORE publishing metadata
    //      columns. risk@k = share of docs re-identifiable at group
    //      size < k; this corpus honestly reads ~35 %@2 → 100 %@10
    //      (fine-grained QI on a small corpus — exactly what the
    //      audit exists to catch). Pure integer counts and one
    //      nonneg floor division. Scale: ONE corpus-sized QI groupBy
    //      (map-side combined); the per-k report crosses the O(groups)
    //      table with a 3-row constant — never re-scans the corpus.
    //      ----
    QueryDef.sql("q263_k_anonymity",
      """WITH g AS (SELECT lang, source, n_chars // 100 AS lb,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2, 3),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nd,
        |    CAST(count(*) AS BIGINT) AS ng FROM g),
        |ks(k) AS (VALUES (2), (5), (10))
        |SELECT CAST(k AS BIGINT) AS k,
        |  CAST(count(CASE WHEN n < k THEN 1 END) AS BIGINT)
        |    AS n_small_groups,
        |  CAST(COALESCE(sum(CASE WHEN n < k THEN n END), 0) AS BIGINT)
        |    AS n_docs_at_risk,
        |  CAST(COALESCE(sum(CASE WHEN n < k THEN n END), 0) * 1000000
        |    // nd AS BIGINT) AS risk_micro,
        |  ng AS n_groups
        |FROM g, tot, ks GROUP BY k, nd, ng ORDER BY k""".stripMargin) {
      (s, d) =>
      val g = t(s, d, "documents")
        .groupBy(col("lang"), col("source"),
          expr("n_chars div 100").as("lb"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint() // O(groups) rows feed the total and the ks
      val tot = g.agg(sum(col("n")).cast("long").as("nd"),
        count(lit(1)).as("ng"))
      val ks = s.range(1, 4)
        .select(when(col("id") === 1, 2L).when(col("id") === 2, 5L)
          .otherwise(10L).as("k"))
      g.crossJoin(broadcast(tot)).crossJoin(broadcast(ks))
        .groupBy(col("k"), col("nd"), col("ng"))
        .agg(count(when(col("n") < col("k"), 1)).as("n_small_groups"),
          coalesce(sum(when(col("n") < col("k"), col("n"))), lit(0L))
            .cast("long").as("n_docs_at_risk"))
        .select(col("k"), col("n_small_groups"), col("n_docs_at_risk"),
          expr("CAST(n_docs_at_risk * 1000000 div nd AS BIGINT)")
            .as("risk_micro"),
          col("ng").as("n_groups"))
        .orderBy(col("k"))
    },

    // ---- Referential-integrity audit: orphan and NULL-FK counts for
    //      every foreign-key edge of the relational schema — the lake
    //      constraint-validation pass (Spark enforces nothing at
    //      write time, so ingestion pipelines RUN this). The 0s ARE
    //      the report: a nonzero row names the broken edge. Each edge
    //      is one LEFT ANTI join + two counts; the 7 one-row reports
    //      union. Parent sides carry NO broadcast hint: only nation /
    //      region are fixed-cardinality — customer, part, supplier
    //      all scale with the lake, so pinning them broadcast would
    //      OOM at 100× (the q215 lesson). The stats-driven planner
    //      broadcasts every small-enough parent at any given SF and
    //      falls back to a key shuffle when one outgrows the
    //      threshold — exactly the adaptive behavior wanted. ----
    QueryDef.sql("q264_fk_integrity", fkIntegrityOracleSql) { (s, d) =>
      def edge(name: String, child: DataFrame, fk: String,
          parent: DataFrame, pk: String): DataFrame = {
        val c = child.select(col(fk).as("fk"))
        val p = parent.select(col(pk).as("fk"))
        val orphans = c.filter(col("fk").isNotNull)
          .join(p, Seq("fk"), "left_anti")
        c.agg(count(lit(1)).as("n_child"),
            sum(when(col("fk").isNull, 1L).otherwise(0L)).cast("long")
              .as("n_null_fk"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(name).as("fk_edge"), col("n_child"),
            col("n_orphans"), col("n_null_fk"))
      }
      val li = t(s, d, "lineitem")
      edge("customer.c_nationkey->nation", t(s, d, "customer"),
          "c_nationkey", t(s, d, "nation"), "n_nationkey")
        .unionAll(edge("lineitem.l_orderkey->orders", li, "l_orderkey",
          t(s, d, "orders"), "o_orderkey"))
        .unionAll(edge("lineitem.l_partkey->part", li, "l_partkey",
          t(s, d, "part"), "p_partkey"))
        .unionAll(edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
          t(s, d, "supplier"), "s_suppkey"))
        .unionAll(edge("nation.n_regionkey->region", t(s, d, "nation"),
          "n_regionkey", t(s, d, "region"), "r_regionkey"))
        .unionAll(edge("orders.o_custkey->customer", t(s, d, "orders"),
          "o_custkey", t(s, d, "customer"), "c_custkey"))
        .unionAll(edge("supplier.s_nationkey->nation",
          t(s, d, "supplier"), "s_nationkey", t(s, d, "nation"),
          "n_nationkey"))
        .orderBy(col("fk_edge"))
    },

    // ---- Join-key discovery (schema profiling à la Aurum / LSH
    //      Ensemble, exact at this scale): which column pairs share a
    //      value domain? ALL candidate columns union into ONE
    //      (column, value) table and a single value-keyed self-join
    //      scores every pair at once — never 13² pairwise joins.
    //      Inclusion alone is blind to dense surrogate ranges (1..N ⊂
    //      1..M makes everything "joinable"), so the report co-gates
    //      on JACCARD ≥ 0.95 — which keeps exactly the true shared
    //      domains (FK↔PK both ways, sibling FKs) and drops the
    //      range-nesting noise. The scale path swaps the exact
    //      distinct for KMV sketches (q133's lake); the pair algebra
    //      is identical. ----
    QueryDef.sql("q270_joinkey_discovery", joinKeyOracleSql) { (s, d) =>
      val kv = keyColumns.map { case (tbl, c) =>
          t(s, d, tbl).filter(col(c).isNotNull)
            .select(lit(s"$tbl.$c").as("cn"), col(c).cast("long").as("v"))
        }.reduce(_ unionAll _)
        .distinct()
        .localCheckpoint() // (column, value) domain feeds both legs
      val card = kv.groupBy(col("cn")).agg(count(lit(1)).as("n"))
      val inter = kv.select(col("cn").as("ca"), col("v"))
        .join(kv.select(col("cn").as("cb"), col("v")), "v")
        .filter(col("ca") =!= col("cb"))
        .groupBy(col("ca"), col("cb")).agg(count(lit(1)).as("ab"))
      inter
        .join(broadcast(card.select(col("cn").as("ca"), col("n").as("na"))),
          "ca")
        .join(broadcast(card.select(col("cn").as("cb"), col("n").as("nb"))),
          "cb")
        .select(col("ca").as("col_a"), col("cb").as("col_b"),
          col("ab").as("n_shared"), col("na").as("n_distinct_a"),
          expr("CAST(ab * 1000000 div na AS BIGINT)")
            .as("inclusion_micro"),
          expr("CAST(ab * 1000000 div (na + nb - ab) AS BIGINT)")
            .as("jaccard_micro"))
        .filter(col("inclusion_micro") >= 950000
          && col("jaccard_micro") >= 950000)
        .orderBy(col("col_a"), col("col_b"))
    },

    // ---- Functional-dependency audit: does determinant → dependent
    //      hold, and over how many violating keys? FD(A→B) holds iff
    //      |distinct A| = |distinct (A,B)| — two map-side-combined
    //      distinct aggregates per check, plus the violating-key
    //      count off the same (A,B) distinct; the audited list mixes
    //      holding and failing FDs so both verdicts are exercised.
    //      This is the data-contract discovery pass (profilers like
    //      Deequ/metanome run exactly this) — at 100 TB each check is
    //      one groupBy over its table, checks independent. ----
    QueryDef.sql("q271_fd_audit", fdOracleSql) { (s, d) =>
      // The 9 checks are independent, but each one's eager
      // localCheckpoint is a separate Spark job — launched from one
      // driver thread they serialize, leaving the cluster idle in
      // every job's tail (guide §2.6: overlap independent jobs). A
      // small pool launches the checkpoint jobs concurrently; the
      // assembled frames and the final union are unchanged, and
      // distinct counts are deterministic, so the result is identical.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      // job-group tag so a timed-out wait can CANCEL the outstanding
      // checkpoint jobs instead of leaving them running (ADVICE r16 #2)
      val grp = s"q271_fd_audit_${java.util.UUID.randomUUID()}"
      val frames = fdChecks.map { case (tbl, det, dep) =>
        scala.concurrent.Future {
          s.sparkContext.setJobGroup(grp, "q271 fd check")
          val ab = t(s, d, tbl).select(col(det).as("a"), col(dep).as("b"))
            .distinct()
            .localCheckpoint() // the (A,B) domain feeds all three counts
          val perA = ab.groupBy(col("a")).agg(count(lit(1)).as("nb"))
            .agg(count(lit(1)).as("n_det"),
              // coalesce: an empty table must read (0, 0, 0, true) like
              // the oracle's scalar counts, not NULL sums
              coalesce(sum(col("nb")), lit(0L)).cast("long")
                .as("n_det_dep"),
              coalesce(sum(when(col("nb") > 1, 1L).otherwise(0L)),
                lit(0L)).cast("long").as("n_violating"))
          perA.select(lit(s"$tbl: $det -> $dep").as("fd"), col("n_det"),
            col("n_det_dep"), col("n_violating"),
            (col("n_det") === col("n_det_dep")).as("holds"))
        }
      }
      // generous finite patience: the checks run in seconds — a wait
      // this long means a wedged job, which must FAIL the query (and
      // cancel its siblings), not hang the bench loop (ADVICE r16 #2)
      try scala.concurrent.Await
        .result(scala.concurrent.Future.sequence(frames),
          scala.concurrent.duration.Duration(10, "min"))
        .reduce(_ unionAll _).orderBy(col("fd"))
      catch { case e: java.util.concurrent.TimeoutException =>
        s.sparkContext.cancelJobGroup(grp)
        throw e
      }
      finally { pool.shutdown(); () }
    },

    // ---- Bitemporal as-of audit: the two-clock extension of q141's
    //      SCD2 (valid time only) and q57's as-of join (transaction
    //      time only). Each event is a REVISION of (user, valid_day)
    //      state: transaction time = ts (when recorded), valid day =
    //      ts's day minus event_id % 11 days (late-arriving
    //      corrections up to 10 days stale — the reality bitemporal
    //      modeling exists for). The belief AS OF transaction cutoff T
    //      for a key is its arg-max revision by (tx_us, event_id)
    //      among rows with tx_us ≤ T — event_id is globally unique,
    //      so the struct max is tie-free on both engines. The report
    //      compares the CURRENT reconstruction against the one a week
    //      ago per valid day: keys that did not exist yet (n_new),
    //      keys whose believed value changed (n_revised), and the
    //      total absolute value drift in exact integer micros — the
    //      late-data correction monitor that tells a training-data
    //      pipeline how far back a re-snapshot must reach. Scale: the
    //      horizon is a 1-row broadcast; BOTH cutoff beliefs come out
    //      of ONE (user, valid_day)-keyed aggregation (conditional
    //      struct max — no second shuffle, no self-join); the day
    //      report is O(days). ----
    QueryDef.sql("q277_bitemporal_asof",
      """WITH r AS (SELECT user_id,
        |    epoch_us(ts) // 86400000000 - event_id % 11 AS valid_day,
        |    epoch_us(ts) AS tx_us, event_id,
        |    CAST(round(value * 1000000) AS BIGINT) AS vm FROM events),
        |hz AS (SELECT max(tx_us) AS t2 FROM r),
        |k AS (SELECT user_id, valid_day,
        |    max(struct_pack(a := tx_us, b := event_id, c := vm))
        |      AS now_rev,
        |    max(CASE WHEN tx_us <= hz.t2 - 604800000000
        |      THEN struct_pack(a := tx_us, b := event_id, c := vm) END)
        |      AS then_rev
        |  FROM r, hz GROUP BY user_id, valid_day)
        |SELECT valid_day, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(CASE WHEN then_rev IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_new,
        |  CAST(sum(CASE WHEN then_rev IS NOT NULL
        |      AND now_rev.c <> then_rev.c THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_revised,
        |  CAST(sum(CASE WHEN then_rev IS NOT NULL
        |      THEN abs(now_rev.c - then_rev.c) ELSE 0 END) AS BIGINT)
        |    AS drift_micro
        |FROM k GROUP BY valid_day ORDER BY valid_day""".stripMargin) {
      (s, d) =>
        val r = t(s, d, "events").select(col("user_id"),
          expr("unix_micros(ts) div 86400000000 - event_id % 11")
            .as("valid_day"),
          unix_micros(col("ts")).as("tx_us"), col("event_id"),
          round(col("value") * 1000000).cast("long").as("vm"))
        val hz = r.agg(max(col("tx_us")).as("t2"))
        val rev = struct(col("tx_us"), col("event_id"), col("vm"))
        val k = r.crossJoin(broadcast(hz))
          .groupBy(col("user_id"), col("valid_day"))
          .agg(max(rev).as("now_rev"),
            max(when(col("tx_us") <= col("t2") - 604800000000L, rev))
              .as("then_rev"))
        k.groupBy(col("valid_day"))
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("then_rev").isNull, 1L).otherwise(0L))
              .cast("long").as("n_new"),
            sum(when(col("then_rev").isNotNull &&
                col("now_rev.vm") =!= col("then_rev.vm"), 1L)
              .otherwise(0L)).cast("long").as("n_revised"),
            sum(when(col("then_rev").isNotNull,
                abs(col("now_rev.vm") - col("then_rev.vm")))
              .otherwise(0L)).cast("long").as("drift_micro"))
          .orderBy(col("valid_day"))
    },

    // ---- Kleinberg 2-state burst detection per event type: the
    //      classic "enumerating bursts" automaton (base rate λ₀ = N/T
    //      vs burst rate λ₁ = 2λ₀, Poisson costs, γ·ln T with γ = ¼
    //      to ENTER the burst state — γ picked so a near-Poisson
    //      corpus like this one still surfaces its rate-fluctuation
    //      episodes) run over each type's dense hourly series — the
    //      episode detector behind trend surfacing and incident
    //      forensics, stricter than q219's Fano (which says HOW bursty,
    //      not WHEN). The Viterbi DP is sequential — the classic
    //      excuse for not distributing it — but it is a LEFT FOLD:
    //      the per-type series collapses to one array row and the
    //      two-state (cost₀, cost₁, path₀, path₁) accumulator folds
    //      across it in ONE aggregate() expression. Determinism: the
    //      ln(λ)/ln(T) constants quantize to integer micros ONCE per
    //      type (the q90 round seam — never inside the fold), so the
    //      DP itself is pure integer min/plus with fixed tie-breaks
    //      (ties prefer the non-burst predecessor in state 0 and the
    //      stay-in-burst predecessor in state 1) — both engines walk
    //      the identical path (pinned against a BigInt reference in
    //      KleinbergFoldSpec). n! terms are state-independent per
    //      hour and cancel out of every comparison, so they are
    //      dropped. The ORACLE runs the same recurrence as a
    //      recursive CTE, NOT list_reduce: DuckDB 1.0's list_reduce
    //      mis-folds struct accumulators holding ≥1e9 integers (extra
    //      applications, measured — the recursion is the reliable
    //      sequential form there). Burst islands come off the path
    //      string with the gaps-and-islands window and join back to
    //      the (checkpointed) series for exact per-burst event
    //      counts. Scale: one corpus-sized (etype, hidx) count agg;
    //      everything after is O(types·hours); path strings are
    //      span-length (~10³ chars per year-type). A quiet corpus
    //      yields ZERO rows — that IS the report. ----
    QueryDef.sql("q280_kleinberg_bursts",
      s"""WITH RECURSIVE $hourlySeriesCte,
        |agg AS MATERIALIZED (SELECT etype, min(hidx) AS h0,
        |    list(x ORDER BY hidx) AS arr,
        |    CAST(sum(x) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS t
        |  FROM ser GROUP BY etype),
        |par AS MATERIALIZED (SELECT etype, h0, arr, t,
        |    CAST(round(CAST(n AS DOUBLE) / t * 1000000) AS BIGINT) AS lm0,
        |    CAST(round(CAST(n AS DOUBLE) / t * 2000000) AS BIGINT) AS lm1,
        |    CAST(round(ln(CAST(n AS DOUBLE) / t) * 1000000) AS BIGINT)
        |      AS l0,
        |    CAST(round(ln(CAST(n AS DOUBLE) / t * 2) * 1000000) AS BIGINT)
        |      AS l1,
        |    CAST(round(ln(CAST(t AS DOUBLE)) * 250000) AS BIGINT) AS g
        |  FROM agg),
        |dp AS (
        |  SELECT etype, CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS c0,
        |    CAST(1000000000000000 AS BIGINT) AS c1, '' AS p0, '' AS p1
        |  FROM par
        |  UNION ALL
        |  SELECT d.etype, d.i + 1,
        |    least(d.c0, d.c1) + p.lm0
        |      - p.arr[CAST(d.i + 1 AS INTEGER)] * p.l0,
        |    least(d.c0 + p.g, d.c1) + p.lm1
        |      - p.arr[CAST(d.i + 1 AS INTEGER)] * p.l1,
        |    (CASE WHEN d.c1 < d.c0 THEN d.p1 ELSE d.p0 END) || '0',
        |    (CASE WHEN d.c0 + p.g < d.c1 THEN d.p0 ELSE d.p1 END) || '1'
        |  FROM dp d JOIN par p ON p.etype = d.etype WHERE d.i < p.t),
        |pth AS (SELECT dp.etype, p.h0,
        |    CASE WHEN dp.c0 <= dp.c1 THEN dp.p0 ELSE dp.p1 END AS path
        |  FROM dp JOIN par p ON p.etype = dp.etype WHERE dp.i = p.t),
        |ones AS (SELECT etype, h0 + i AS hidx,
        |    row_number() OVER (PARTITION BY etype ORDER BY i) AS rn
        |  FROM (SELECT etype, h0, unnest(range(len(path))) AS i, path
        |    FROM pth)
        |  WHERE substring(path, CAST(i + 1 AS INTEGER), 1) = '1')
        |SELECT o.etype, min(o.hidx) AS burst_start,
        |  max(o.hidx) AS burst_end, CAST(count(*) AS BIGINT) AS n_hours,
        |  CAST(sum(ser.x) AS BIGINT) AS n_events
        |FROM ones o JOIN ser ON ser.etype = o.etype AND ser.hidx = o.hidx
        |GROUP BY o.etype, o.hidx - o.rn
        |ORDER BY o.etype, burst_start""".stripMargin) { (s, d) =>
      val ser = hourlySeries(t(s, d, "events"))
        .localCheckpoint() // feeds the fold AND the island count join
      val agg = ser.groupBy(col("etype"))
        .agg(min(col("hidx")).as("h0"),
          expr("transform(array_sort(collect_list(struct(hidx, x))), p -> p.x)")
            .as("arr"),
          sum(col("x")).cast("long").as("n"),
          count(lit(1)).as("t"))
      val par = agg.select(col("etype"), col("h0"), col("arr"),
        round(col("n").cast("double") / col("t") * 1000000)
          .cast("long").as("lm0"),
        round(col("n").cast("double") / col("t") * 2000000)
          .cast("long").as("lm1"),
        round(log(col("n").cast("double") / col("t")) * 1000000)
          .cast("long").as("l0"),
        round(log(col("n").cast("double") / col("t") * 2) * 1000000)
          .cast("long").as("l1"),
        round(log(col("t").cast("double")) * 250000)
          .cast("long").as("g"))
      val dp = par.withColumn("f", expr(
        """aggregate(arr,
          |  named_struct('c0', CAST(0 AS BIGINT),
          |    'c1', CAST(1000000000000000 AS BIGINT), 'p0', '', 'p1', ''),
          |  (a, v) -> named_struct(
          |    'c0', least(a.c0, a.c1) + lm0 - v * l0,
          |    'c1', least(a.c0 + g, a.c1) + lm1 - v * l1,
          |    'p0', concat(CASE WHEN a.c1 < a.c0 THEN a.p1 ELSE a.p0 END,
          |      '0'),
          |    'p1', concat(CASE WHEN a.c0 + g < a.c1 THEN a.p0 ELSE a.p1
          |      END, '1')))""".stripMargin))
      val pth = dp.select(col("etype"), col("h0"),
        when(col("f.c0") <= col("f.c1"), col("f.p0"))
          .otherwise(col("f.p1")).as("path"))
      val ones = pth
        .select(col("etype"), col("h0"),
          posexplode(split(col("path"), "")).as(Seq("i", "ch")))
        .filter(col("ch") === "1")
        .select(col("etype"), (col("h0") + col("i")).as("hidx"),
          row_number().over(Window.partitionBy(col("etype"))
            .orderBy(col("i"))).as("rn"))
      ones.join(ser, Seq("etype", "hidx"))
        .groupBy(col("etype"), (col("hidx") - col("rn")).as("grp"))
        .agg(min(col("hidx")).as("burst_start"),
          max(col("hidx")).as("burst_end"),
          count(lit(1)).as("n_hours"),
          sum(col("x")).cast("long").as("n_events"))
        .select(col("etype"), col("burst_start"), col("burst_end"),
          col("n_hours"), col("n_events"))
        .orderBy(col("etype"), col("burst_start"))
    },

    // ---- Daily top-k churn: Jaccard between consecutive days'
    //      top-20 item sets (items = the props.k payload key) — the
    //      trending-surface stability audit: a leaderboard that turns
    //      over 90 % per day (this corpus reads 2–25 %) is noise, not
    //      trend, and a cache/feature-store keyed on "today's top k"
    //      needs exactly this number to size its churn. Determinism:
    //      top-20 by (count DESC, item) is a total order; the
    //      intersection is an equi-join on (day−1, item); Jaccard is
    //      one exact division with the EXACT |A|+|B|−∩ denominator —
    //      a day with fewer than 20 distinct items (sf0.001 has them)
    //      must not pretend to a 40-item union. Days without a
    //      predecessor (the first) are not reported. Scale: one
    //      corpus-sized (day, item) count agg; top-k via per-day rank
    //      windows on the O(days·items) table; everything after is
    //      O(days·k). ----
    QueryDef.sql("q286_topk_churn",
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events WHERE props IS NOT NULL),
        |c AS (SELECT day, item, CAST(count(*) AS BIGINT) AS n
        |  FROM e GROUP BY 1, 2),
        |tk AS (SELECT day, item FROM (SELECT day, item,
        |    row_number() OVER (PARTITION BY day ORDER BY n DESC, item)
        |      AS r FROM c)
        |  WHERE r <= 20),
        |sz AS (SELECT day, CAST(count(*) AS BIGINT) AS na FROM tk
        |  GROUP BY day),
        |ix AS (SELECT t.day, CAST(count(p.item) AS BIGINT) AS inter
        |  FROM tk t LEFT JOIN tk p ON p.day = t.day - 1
        |    AND p.item = t.item
        |  GROUP BY t.day)
        |SELECT s.day, s.na AS n_today, pv.na AS n_prev, i.inter,
        |  CAST(i.inter * 1000000 // (s.na + pv.na - i.inter) AS BIGINT)
        |    AS jaccard_micro
        |FROM sz s JOIN sz pv ON pv.day = s.day - 1
        |JOIN ix i ON i.day = s.day
        |ORDER BY s.day""".stripMargin) { (s, d) =>
      val tk = t(s, d, "events")
        .filter(col("props").isNotNull)
        .select(expr("unix_micros(ts) div 86400000000").as("day"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .groupBy(col("day"), col("item"))
        .agg(count(lit(1)).as("n"))
        .withColumn("r", row_number().over(Window.partitionBy(col("day"))
          .orderBy(col("n").desc, col("item"))))
        .filter(col("r") <= 20)
        .select(col("day"), col("item"))
        .localCheckpoint() // O(days·k) rows feed sizes + both join legs
      val sz = tk.groupBy(col("day")).agg(count(lit(1)).as("na"))
      val ix = tk
        .join(tk.select((col("day") + 1).as("day"),
          col("item").as("pitem")),
          Seq("day"), "left")
        .select(col("day"),
          when(col("pitem") === col("item"), 1L).otherwise(0L).as("hit"))
        .groupBy(col("day"))
        .agg(sum(col("hit")).cast("long").as("inter"))
      sz.join(sz.select((col("day") + 1).as("day"), col("na").as("nprev")),
          "day")
        .join(ix, "day")
        .select(col("day"), col("na").as("n_today"),
          col("nprev").as("n_prev"), col("inter"),
          expr("""CAST(inter * 1000000 div (na + nprev - inter)
            |  AS BIGINT)""".stripMargin).as("jaccard_micro"))
        .orderBy(col("day"))
    },

    // ---- l-diversity audit: q263's k-anonymity counts how many
    //      records share a quasi-identifier group; this asks the
    //      question k-anonymity famously misses — do the records in a
    //      group DIFFER on the sensitive attribute, or can an
    //      attacker who finds the group read the secret off any row?
    //      QI = (lang, length-bucket), sensitive = source (which feed
    //      a document came from). A group is l-diverse iff it holds
    //      ≥ l distinct sensitive values; the report sweeps l ∈
    //      {2, 3, 5}. Pure integer counts + one nonneg floor
    //      division. Scale: ONE corpus-sized (QI, sensitive) agg
    //      (map-side combined), then O(groups) algebra crossed with a
    //      3-row constant. A single-source corpus is the worst case —
    //      every group fails every l ≥ 2 and risk reads 100 %
    //      (DegenerateInputSpec). ----
    QueryDef.sql("q298_l_diversity",
      """WITH gs AS (SELECT lang, n_chars // 100 AS lb, source,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2, 3),
        |g AS (SELECT lang, lb, CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(sum(n) AS BIGINT) AS n
        |  FROM gs GROUP BY lang, lb),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nd,
        |    CAST(count(*) AS BIGINT) AS ng FROM g),
        |ls(l) AS (VALUES (2), (3), (5))
        |SELECT CAST(l AS BIGINT) AS l,
        |  CAST(count(CASE WHEN n_distinct < l THEN 1 END) AS BIGINT)
        |    AS n_undiverse_groups,
        |  CAST(COALESCE(sum(CASE WHEN n_distinct < l THEN n END), 0)
        |    AS BIGINT) AS n_docs_at_risk,
        |  CAST(COALESCE(sum(CASE WHEN n_distinct < l THEN n END), 0)
        |    * 1000000 // nd AS BIGINT) AS risk_micro,
        |  ng AS n_groups
        |FROM g, tot, ls GROUP BY l, nd, ng ORDER BY l""".stripMargin) {
      (s, d) =>
      val gs = t(s, d, "documents")
        .groupBy(col("lang"), expr("n_chars div 100").as("lb"),
          col("source"))
        .agg(count(lit(1)).as("n"))
      val g = gs.groupBy(col("lang"), col("lb"))
        .agg(count(lit(1)).as("n_distinct"),
          sum(col("n")).cast("long").as("n"))
        .localCheckpoint() // O(groups) rows feed the total and the ls
      val tot = g.agg(sum(col("n")).cast("long").as("nd"),
        count(lit(1)).as("ng"))
      val ls = s.range(1, 4)
        .select(when(col("id") === 1, 2L).when(col("id") === 2, 3L)
          .otherwise(5L).as("l"))
      g.crossJoin(broadcast(tot)).crossJoin(broadcast(ls))
        .groupBy(col("l"), col("nd"), col("ng"))
        .agg(count(when(col("n_distinct") < col("l"), 1))
            .as("n_undiverse_groups"),
          coalesce(sum(when(col("n_distinct") < col("l"), col("n"))),
            lit(0L)).cast("long").as("n_docs_at_risk"))
        .select(col("l"), col("n_undiverse_groups"),
          col("n_docs_at_risk"),
          expr("CAST(n_docs_at_risk * 1000000 div nd AS BIGINT)")
            .as("risk_micro"),
          col("ng").as("n_groups"))
        .orderBy(col("l"))
    },

    // ---- Storage-encoding audit: per column, what would RLE and
    //      dictionary encoding buy in the table's CLUSTER order
    //      (l_orderkey, l_linenumber)? The compaction/layout planner
    //      reads this BEFORE rewriting a petabyte: run counts say
    //      which columns reward run-length (sorted keys, low-card
    //      flags), dict_bits says the dictionary width. Runs are
    //      counted EXACTLY with NO single-partition pass over the
    //      corpus — the q111 two-level discipline: a 33-bucket split
    //      of the key range (width (max−min) div 32 + 1) counts
    //      intra-bucket changes under a PARTITIONED window, and the
    //      33 bucket-boundary rows settle cross-bucket changes in an
    //      O(33) window. All integer; quantity/date normalize to
    //      BIGINT so equality is engine-exact (never raw double
    //      compares). ----
    QueryDef.sql("q306_encoding_audit", {
      val cols = Seq("ok", "sk", "rf", "ls", "qt", "sd")
      val names = Map("ok" -> "l_orderkey", "sk" -> "l_suppkey",
        "rf" -> "l_returnflag", "ls" -> "l_linestatus",
        "qt" -> "l_quantity_int", "sd" -> "l_shipday")
      val chg = cols.map(c =>
        s"""CASE WHEN lag($c) OVER w IS NOT NULL
           |      AND lag($c) OVER w <> $c THEN 1 ELSE 0 END
           |      AS chg_$c""".stripMargin).mkString(",\n|    ")
      val wsum = cols.map(c =>
        s"CAST(sum(chg_$c) AS BIGINT) AS w_$c").mkString(", ")
      val fl = cols.map(c => s"$c AS f_$c").mkString(", ")
      val ll = cols.map(c => s"$c AS l_$c").mkString(", ")
      val pl = cols.map(c =>
        s"lag(l_$c) OVER (ORDER BY bkt) AS p_$c").mkString(",\n|    ")
      val bsum = cols.map(c =>
        s"""CAST(sum(CASE WHEN p_$c IS NOT NULL AND p_$c <> f_$c
           |      THEN 1 ELSE 0 END) AS BIGINT) AS b_$c"""
          .stripMargin).mkString(",\n|    ")
      val dsum = cols.map(c =>
        s"CAST(count(DISTINCT $c) AS BIGINT) AS d_$c").mkString(", ")
      val rows = cols.map(c =>
        s"""SELECT '${names(c)}' AS col, nn.n,
           |    dist.d_$c AS n_distinct,
           |    wc.w_$c + bd2.b_$c + 1 AS n_runs
           |  FROM nn, dist, wc, bd2""".stripMargin)
        .mkString("\n|  UNION ALL\n|  ")
      s"""WITH b0 AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
         |    l_suppkey AS sk, l_returnflag AS rf, l_linestatus AS ls,
         |    CAST(l_quantity AS BIGINT) AS qt,
         |    epoch_us(l_shipdate) // 86400000000 AS sd FROM lineitem),
         |mm AS (SELECT min(ok) AS mn,
         |    (max(ok) - min(ok)) // 32 + 1 AS bw FROM b0),
         |bb AS (SELECT b0.*, (ok - mm.mn) // mm.bw AS bkt FROM b0, mm),
         |lg AS (SELECT bkt, ok, ln, sk, rf, ls, qt, sd,
         |    $chg,
         |    row_number() OVER w AS rn,
         |    count(*) OVER (PARTITION BY bkt) AS bn
         |  FROM bb WINDOW w AS (PARTITION BY bkt
         |    ORDER BY ok, ln, sk, rf, ls, qt, sd)),
         |wc AS (SELECT $wsum FROM lg),
         |fst AS (SELECT bkt, $fl FROM lg WHERE rn = 1),
         |lst AS (SELECT bkt, $ll FROM lg WHERE rn = bn),
         |bd AS (SELECT f.*, ${cols.map(c => s"l.l_$c").mkString(", ")}
         |  FROM fst f JOIN lst l ON l.bkt = f.bkt),
         |bd1 AS (SELECT *,
         |    $pl
         |  FROM bd),
         |bd2 AS (SELECT $bsum FROM bd1),
         |dist AS (SELECT $dsum FROM b0),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b0),
         |st AS ($rows),
         |sp(k) AS (SELECT unnest(range(41)))
         |SELECT st.col AS col, st.n AS n_rows, st.n_distinct,
         |  st.n_runs,
         |  CAST(st.n * 1000000 // st.n_runs AS BIGINT)
         |    AS rle_ratio_micro,
         |  CAST(min(CASE WHEN (CAST(1 AS BIGINT) << k) >= st.n_distinct
         |    THEN k END) AS BIGINT) AS dict_bits
         |FROM st CROSS JOIN sp
         |GROUP BY st.col, st.n, st.n_distinct, st.n_runs
         |ORDER BY col""".stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val cols = Seq("ok", "sk", "rf", "ls", "qt", "sd")
      val names = Map("ok" -> "l_orderkey", "sk" -> "l_suppkey",
        "rf" -> "l_returnflag", "ls" -> "l_linestatus",
        "qt" -> "l_quantity_int", "sd" -> "l_shipday")
      val b0 = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          col("l_suppkey").as("sk"), col("l_returnflag").as("rf"),
          col("l_linestatus").as("ls"),
          col("l_quantity").cast("long").as("qt"),
          expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
            .as("sd"))
      val mm = b0.agg(min(col("ok")).as("mn"),
        expr("(max(ok) - min(ok)) div 32 + 1").as("bw"))
      val bb = b0.crossJoin(broadcast(mm))
        .withColumn("bkt", expr("(ok - mn) div bw"))
        .localCheckpoint() // feeds the window pass AND the distincts
      val w = Window.partitionBy(col("bkt")).orderBy(col("ok"),
        col("ln"), col("sk"), col("rf"), col("ls"), col("qt"),
        col("sd")) // the synthetic PK is NOT unique; ordering by
                   // every audited column makes remaining ties
                   // FULL duplicates, so run counts are invariant
      val lg = cols.foldLeft(
          bb.withColumn("rn", row_number().over(w))
            .withColumn("bn",
              count(lit(1)).over(Window.partitionBy(col("bkt"))))) {
          (df, c) =>
        df.withColumn(s"chg_$c",
          when(lag(col(c), 1).over(w).isNotNull
            && lag(col(c), 1).over(w) =!= col(c), 1L).otherwise(0L))
      }.localCheckpoint() // ONE partitioned window pass carries all
                          // six lag columns; three consumers below
      val wc = lg.agg(cols.map(c => sum(col(s"chg_$c")).cast("long")
        .as(s"w_$c")).head, cols.tail.map(c =>
        sum(col(s"chg_$c")).cast("long").as(s"w_$c")): _*)
      val fst = lg.filter(col("rn") === 1)
        .select(col("bkt") +: cols.map(c => col(c).as(s"f_$c")): _*)
      val lst = lg.filter(col("rn") === col("bn"))
        .select(col("bkt") +: cols.map(c => col(c).as(s"l_$c")): _*)
      val wB = Window.orderBy(col("bkt")) // O(33) bucket-boundary rows
      val bd1 = cols.foldLeft(fst.join(lst, "bkt")) { (df, c) =>
        df.withColumn(s"p_$c", lag(col(s"l_$c"), 1).over(wB))
      }
      val bd2 = bd1.agg(cols.map(c =>
        sum(when(col(s"p_$c").isNotNull
          && col(s"p_$c") =!= col(s"f_$c"), 1L).otherwise(0L))
          .cast("long").as(s"b_$c")).head,
        cols.tail.map(c => sum(when(col(s"p_$c").isNotNull
          && col(s"p_$c") =!= col(s"f_$c"), 1L).otherwise(0L))
          .cast("long").as(s"b_$c")): _*)
      val dist = bb.agg(
        countDistinct(col(cols.head)).cast("long").as(s"d_${cols.head}"),
        cols.tail.map(c =>
          countDistinct(col(c)).cast("long").as(s"d_$c")): _*)
      val nn = bb.agg(count(lit(1)).as("n"))
      // ONE combined 1-row stats frame, checkpointed — a per-column
      // union would re-execute all four aggregate subtrees per branch
      // (measured: 25 exchanges); stack() fans the row out for free
      val stats = wc.crossJoin(broadcast(bd2)).crossJoin(broadcast(dist))
        .crossJoin(broadcast(nn)).localCheckpoint()
      val st = stats.select(col("n"), expr(
        "stack(6, " + cols.map(c =>
          s"'${names(c)}', d_$c, w_$c + b_$c + CAST(1 AS BIGINT)")
          .mkString(", ") + ") AS (col, n_distinct, n_runs)"))
      val sp = s.range(0, 41).select(col("id").as("k"))
      st.crossJoin(broadcast(sp))
        .groupBy(col("col"), col("n"), col("n_distinct"), col("n_runs"))
        .agg(min(when(expr("(CAST(1 AS BIGINT) << CAST(k AS INT))")
          >= col("n_distinct"), col("k"))).cast("long").as("dict_bits"))
        .select(col("col"), col("n").as("n_rows"), col("n_distinct"),
          col("n_runs"),
          expr("CAST(n * 1000000 div n_runs AS BIGINT)")
            .as("rle_ratio_micro"),
          col("dict_bits"))
        .orderBy(col("col"))
    }
  )

  /** DuckDB oracle for q264: one NOT-EXISTS/NULL-count report per FK
    * edge, unioned — generated from the same edge list the Spark plan
    * walks (alphabetical, matching the final ORDER BY). */
  private lazy val fkIntegrityOracleSql: String = {
    val edges = Seq(
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("nation", "n_regionkey", "region", "r_regionkey"),
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("supplier", "s_nationkey", "nation", "n_nationkey"))
    edges.map { case (ct, fk, pt, pk) =>
      s"""SELECT '$ct.$fk->$pt' AS fk_edge,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $ct) AS n_child,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $ct c
         |    WHERE c.$fk IS NOT NULL AND NOT EXISTS
         |      (SELECT 1 FROM $pt p WHERE p.$pk = c.$fk)) AS n_orphans,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $ct WHERE $fk IS NULL)
         |    AS n_null_fk""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY fk_edge")
  }
}
