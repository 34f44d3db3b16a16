package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data export operators beyond the reference's surface:
  * deterministic mixture sampling and sequence (token-bin) packing —
  * the two steps between "deduplicated corpus" and "training shards".
  *
  * Both are built to the 100 TB rule: no global single-partition
  * window, no driver-side loops over data, every shuffle keyed and
  * bounded. Determinism comes from content hashes (md5) and document
  * ids, never from RNG state — so reruns, retried tasks, and the
  * DuckDB oracle all agree bit-for-bit.
  */
object TrainingOps {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** The q200 Benford χ² assembly from a (etype, digit, obs) count
    * table — shared by the q205 STREAMING twin so batch and stream
    * can never drift: dense digit spine, per-cell contribution
    * floored to integer micro in one fixed float op order, per-type
    * total as an INTEGER window sum. */
  private[queries] def benfordTail(o: DataFrame): DataFrame = {
    val n = o.groupBy(col("etype")).agg(sum(col("obs")).cast("long").as("n"))
    val ex = n.select(col("etype"), col("n"),
        explode(sequence(lit(1), lit(9))).as("digit"))
      .withColumn("p", log10(lit(1.0) + lit(1.0) / col("digit")))
    val j = ex.join(o, Seq("etype", "digit"), "left")
      .select(col("etype"), col("digit"),
        coalesce(col("obs"), lit(0L)).as("obs"),
        floor(col("n") * col("p") * 1000000).cast("long").as("exp_micro"),
        floor((coalesce(col("obs"), lit(0L)) - col("n") * col("p"))
          * (coalesce(col("obs"), lit(0L)) - col("n") * col("p"))
          / (col("n") * col("p")) * 1000000).cast("long")
          .as("contrib_micro"))
    j.withColumn("chi2_micro",
        sum(col("contrib_micro"))
          .over(Window.partitionBy(col("etype"))).cast("long"))
      .select(col("etype"), col("digit"), col("obs"), col("exp_micro"),
        col("contrib_micro"), col("chi2_micro"))
      .orderBy(col("etype"), col("digit"))
  }

  /** First two hex chars of md5(doc_id) — a uniform draw in [0, 256)
    * that any engine reproduces from the row alone. */
  private def hashBucket(c: org.apache.spark.sql.Column) =
    substring(md5(c.cast("string").cast("binary")), 1, 2)

  /** Deterministic 50/50 A/B arm assignment over events (md5 bucket of
    * user_id, the q82 idiom) with micro-unit values — shared by q165
    * (Welch t) and q175 (KS) so the experiment population can never
    * drift between the two read-outs. Columns: (etype, arm, v). */
  private def armedEvents(events: DataFrame): DataFrame =
    events.select(col("event_type").as("etype"),
      when(hashBucket(col("user_id")) < "80", "A").otherwise("B").as("arm"),
      floor(col("value") * 1000000).cast("long").as("v"))

  /** DuckDB CTE twin of [[armedEvents]]: defines `a(etype, arm, v)`. */
  private val armedCte: String =
    """a AS (SELECT event_type AS etype,
      |    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
      |      THEN 'A' ELSE 'B' END AS arm,
      |    CAST(floor(value * 1000000) AS BIGINT) AS v FROM events)"""
      .stripMargin

  /** Per-language keep-rate thresholds in 256ths, as 2-hex-char upper
    * bounds for [[hashBucket]]: en 32 (down to 12.5%), de/fr 128,
    * es/zh 64, everything else 16. Shared by q62 and q68 — one table,
    * or the two queries silently drift apart. */
  private val langThresh = when(col("lang") === "en", "20")
    .when(col("lang") === "de", "80").when(col("lang") === "fr", "80")
    .when(col("lang") === "es", "40").when(col("lang") === "zh", "40")
    .otherwise("10")

  /** The q294 split-conformal assembly from a (lang, v, fold, c)
    * count support — shared by the q305 STREAMING twin so batch and
    * stream can never drift: integer-micro train mean, EXACT
    * calibration order statistic at k = ⌈0.9(n+1)⌉ (q287's cum·10
    * test on the distinct-score support), one integer coverage
    * division. Expects `f` materialized (three fold consumers). */
  private def conformalTail(f: DataFrame): DataFrame = {
    val mu = f.filter(col("fold") === 0).groupBy(col("lang"))
      .agg(expr("CAST(sum(v * c) * 1000000 div sum(c) AS BIGINT)")
        .as("mu_micro"))
    val csup = f.filter(col("fold") === 1).join(broadcast(mu), "lang")
      .select(col("lang"),
        abs(col("v") * 1000000 - col("mu_micro")).as("sc"), col("c"))
      .groupBy(col("lang"), col("sc"))
      .agg(sum(col("c")).cast("long").as("c"))
      .localCheckpoint() // O(langs·distinct scores): feeds the count
                         // margin and the cumulative window
    val ncal = csup.groupBy(col("lang"))
      .agg(sum(col("c")).cast("long").as("n_calib"))
    val wc = Window.partitionBy(col("lang")).orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qh = csup.withColumn("cc", sum(col("c")).over(wc))
      .join(broadcast(ncal), "lang")
      .groupBy(col("lang"), col("n_calib"))
      .agg(min(when(
        expr("(9 * (n_calib + 1) + 9) div 10") <= col("n_calib")
          && col("cc") * 10 >= (col("n_calib") + 1) * 9,
        col("sc"))).as("qhat"))
    val tst = f.filter(col("fold") === 2)
      .join(broadcast(mu), "lang").join(broadcast(qh), "lang")
      .groupBy(col("lang"))
      .agg(sum(col("c")).cast("long").as("n_test"),
        sum(when(abs(col("v") * 1000000 - col("mu_micro"))
          <= col("qhat"), col("c")).otherwise(0L)).cast("long")
          .as("covered"))
    qh.join(broadcast(mu), "lang").join(broadcast(tst), "lang")
      .select(col("lang"), col("n_calib"), col("n_test"),
        col("mu_micro"), col("qhat"),
        when(col("qhat").isNotNull && col("n_test") > 0,
          expr("(covered * 1000000) div n_test")).as("coverage_micro"))
      .orderBy(col("lang"))
  }

  /** Shared oracle for q294 and its streaming twin q305 — one SQL
    * text, so the two QueryDefs are provably the same computation. */
  private lazy val conformalOracle: String =
    """WITH f AS (SELECT lang, n_chars,
      |    CASE
      |      WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '60'
      |        THEN 0
      |      WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'b0'
      |        THEN 1
      |      ELSE 2 END AS fold
      |  FROM documents),
      |mu AS (SELECT lang,
      |    CAST(sum(n_chars) * 1000000 // count(*) AS BIGINT)
      |      AS mu_micro
      |  FROM f WHERE fold = 0 GROUP BY lang),
      |cal AS (SELECT f.lang,
      |    abs(f.n_chars * 1000000 - mu.mu_micro) AS sc
      |  FROM f JOIN mu ON mu.lang = f.lang WHERE f.fold = 1),
      |csup AS (SELECT lang, sc, CAST(count(*) AS BIGINT) AS c
      |  FROM cal GROUP BY lang, sc),
      |ncal AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_calib
      |  FROM csup GROUP BY lang),
      |cum AS (SELECT lang, sc,
      |    sum(c) OVER (PARTITION BY lang ORDER BY sc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      |  FROM csup),
      |qh AS (SELECT cum.lang, ncal.n_calib,
      |    min(CASE WHEN (9 * (ncal.n_calib + 1) + 9) // 10
      |        <= ncal.n_calib
      |      AND cum.cc * 10 >= 9 * (ncal.n_calib + 1)
      |      THEN cum.sc END) AS qhat
      |  FROM cum JOIN ncal ON ncal.lang = cum.lang
      |  GROUP BY cum.lang, ncal.n_calib),
      |tst AS (SELECT f.lang, CAST(count(*) AS BIGINT) AS n_test,
      |    CAST(sum(CASE WHEN abs(f.n_chars * 1000000 - mu.mu_micro)
      |      <= qh.qhat THEN 1 ELSE 0 END) AS BIGINT) AS covered
      |  FROM f JOIN mu ON mu.lang = f.lang
      |  JOIN qh ON qh.lang = f.lang WHERE f.fold = 2
      |  GROUP BY f.lang)
      |SELECT qh.lang AS lang, qh.n_calib, tst.n_test,
      |  mu.mu_micro AS mu_micro, qh.qhat AS qhat,
      |  CASE WHEN qh.qhat IS NOT NULL AND tst.n_test > 0
      |    THEN (tst.covered * 1000000) // tst.n_test END
      |    AS coverage_micro
      |FROM qh JOIN mu ON mu.lang = qh.lang
      |JOIN tst ON tst.lang = qh.lang
      |ORDER BY lang""".stripMargin

  /** (doc_id, n_tokens, cum) — the global token prefix sum in doc_id
    * order, all-distributed via the classic two-level scheme (q63's
    * discipline, shared with the q319 sweep): contiguous doc_id range
    * buckets (pure projection) → running sum WITHIN each bucket
    * (partitioned window) → per-bucket totals prefix-summed into
    * offsets (the only unpartitioned window — over ≤ Buckets rows,
    * never data) broadcast back. The totals branch re-reads the table
    * with a map-side partial agg (32 output rows); it does
    * re-tokenize, which at lake scale you avoid by carrying a
    * precomputed n_tokens column in the corpus metadata (standard
    * practice) or persisting the staged slice. Empty corpus → empty
    * frame, not an NPE. */
  private def tokenPrefix(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val Buckets = 32 // at lake scale: O(executors), still tiny driver-side
    val toks = docs.select(col("doc_id"),
      size(split(lower(trim(col("text"))), "\\s+")).cast("long")
        .as("n_tokens"))
    val bounds = toks
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi")).head()
    if (bounds.isNullAt(0))
      toks.filter(lit(false)).withColumn("cum", lit(0L))
    else {
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val width = math.max(1L, (hi - lo) / Buckets + 1)
      val staged = toks.withColumn("pid",
        ((col("doc_id") - lit(lo)) / lit(width)).cast("int"))
      val wIn = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val within = staged.withColumn("cum_in",
        coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      val wOff = Window.orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = staged.groupBy(col("pid"))
        .agg(sum(col("n_tokens")).as("part_total"))
        .withColumn("offset",
          coalesce(sum(col("part_total")).over(wOff), lit(0L)))
        .select(col("pid"), col("offset"))
      within.join(broadcast(offsets), "pid")
        .select(col("doc_id"), col("n_tokens"),
          (col("offset") + col("cum_in")).as("cum"))
    }
  }


  /** The q327 KS assembly from a (source, v, c) count support —
    * shared by the q328 STREAMING twin so batch and stream can never
    * drift: dense source×support grid, per-source integer CDF
    * windows, cross-multiplied DECIMAL gaps, max-then-min-v argmax,
    * NULL on an empty rest side. Expects `c` materialized (four
    * consumers). */
  private def ksTail(c: DataFrame): DataFrame = {
    val sup = c.groupBy(col("v")).agg(sum(col("c")).cast("long").as("ct"))
    val ns = c.groupBy(col("source")).agg(sum(col("c")).cast("long")
      .as("na"))
    val nn = sup.agg(sum(col("ct")).cast("long").as("n"))
    val grid = ns.crossJoin(sup)
      .join(c, Seq("source", "v"), "left")
      .select(col("source"), col("v"), col("ct"), col("na"),
        coalesce(col("c"), lit(0L)).as("ca"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap = grid
      .withColumn("cuma", sum(col("ca")).over(wCum))
      .withColumn("cumt", sum(col("ct")).over(wCum))
      .crossJoin(broadcast(nn))
      .select(col("source"), col("v"), col("na"), col("n"),
        abs(col("cuma").cast("decimal(38,0)") * (col("n") - col("na"))
          - (col("cumt") - col("cuma")).cast("decimal(38,0)")
            * col("na")).as("g"))
    gap.groupBy(col("source"))
      .agg(max(col("na")).as("na"), max(col("n")).as("n"),
        min_by(col("v"), struct((-col("g")).as("ng"), col("v")))
          .as("ks_at"),
        max(col("g")).as("g"))
      .select(col("source"), col("na").as("n_src"),
        (col("n") - col("na")).as("n_rest"),
        col("ks_at").cast("long").as("ks_at"),
        when(col("n") > col("na"),
          expr("CAST(g * 1000000 div (na * (n - na)) AS BIGINT)"))
          .as("ks_micro"))
      .orderBy(col("source"))
  }

  /** Shared oracle for q327 and its streaming twin q328 — one SQL
    * text, so the two QueryDefs are provably the same computation. */
  private lazy val ksOracle: String =
    """WITH c AS (SELECT source, n_chars AS v,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY source, n_chars),
        |sup AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM c GROUP BY v),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS na FROM c
        |  GROUP BY source),
        |nn AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM sup),
        |grid AS (SELECT ns.source, sup.v, sup.ct, ns.na,
        |    COALESCE(c.c, 0) AS ca
        |  FROM ns CROSS JOIN sup
        |  LEFT JOIN c ON c.source = ns.source AND c.v = sup.v),
        |cum AS (SELECT source, v, na,
        |    sum(ca) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |    sum(ct) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumt
        |  FROM grid),
        |gap AS (SELECT source, v, na,
        |    abs(CAST(cuma AS HUGEINT) * ((SELECT n FROM nn) - na)
        |      - CAST(cumt - cuma AS HUGEINT) * na) AS g
        |  FROM cum),
        |mg AS (SELECT source, max(na) AS na, max(g) AS g
        |  FROM gap GROUP BY source),
        |mx AS (SELECT mg.source, mg.na, mg.g,
        |    min(gap.v) AS ks_at
        |  FROM mg JOIN gap ON gap.source = mg.source AND gap.g = mg.g
        |  GROUP BY mg.source, mg.na, mg.g)
        |SELECT mx.source, mx.na AS n_src,
        |  (SELECT n FROM nn) - mx.na AS n_rest,
        |  CAST(mx.ks_at AS BIGINT) AS ks_at,
        |  CASE WHEN (SELECT n FROM nn) > mx.na THEN
        |    CAST(mx.g * 1000000 // (mx.na * ((SELECT n FROM nn) - mx.na))
        |      AS BIGINT) END AS ks_micro
        |FROM mx ORDER BY mx.source""".stripMargin

  val queries: Seq[QueryDef] = Seq(

    // ---- Deterministic weighted mixture sampling: each language gets
    //      a target keep-rate (upsample rare, downsample dominant) and
    //      a row is kept iff md5(doc_id)'s first byte falls under the
    //      language's threshold — a pure per-row filter pushed into the
    //      scan, no shuffle, no RNG, no coordination; identical sample
    //      on any cluster size, and the oracle re-derives it exactly.
    //      This is the "domain mixing" step of corpus assembly. ----
    QueryDef.sql("q62_mixture_sample",
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
        |    CASE lang WHEN 'en' THEN '20' WHEN 'de' THEN '80'
        |              WHEN 'fr' THEN '80' WHEN 'es' THEN '40'
        |              WHEN 'zh' THEN '40' ELSE '10' END AS thresh
        |  FROM documents) WHERE bucket < thresh
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          hashBucket(col("doc_id")).as("bucket"), langThresh.as("thresh"))
        .filter(col("bucket") < col("thresh"))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },

    // ---- Sequence packing: stream documents in doc_id order into
    //      fixed-capacity token bins (2048 tokens, documents may span a
    //      bin boundary — each doc's bin is where its first token
    //      lands). The naive plan is ONE global running sum = a single-
    //      partition window, dead at scale; instead this is the
    //      classic two-level prefix sum, all-distributed:
    //        1. contiguous range buckets by doc_id (pure projection);
    //        2. running sum WITHIN each bucket (partitioned window);
    //        3. per-bucket totals (tiny: one row per bucket) prefix-
    //           summed into bucket offsets and broadcast back;
    //        4. global offset = bucket offset + within-bucket sum.
    //      Only the final per-bin aggregate shuffles on data. ----
    QueryDef.sql("q63_sequence_packing",
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM t)
        |SELECT CAST(floor(cum / 2048.0) AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val Capacity = 2048
      tokenPrefix(t(s, d, "documents"))
        .withColumn("bin", expr(s"cum div $Capacity"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("bin"))
    },

    // ---- Context-length packing sweep: the planning artifact behind
    //      "which context size do we train at?" — for C ∈ {512, 1024,
    //      2048, 4096}, what does q63's concat-split packing COST at
    //      each C? Under concat-split there is no padding except the
    //      tail bin; the price is FRAGMENTATION — documents cut by a
    //      bin boundary lose cross-boundary attention. Exact from the
    //      ONE shared token prefix (tokenPrefix — q63's two-level
    //      prefix sum, one builder, two consumers): a doc with first
    //      token at cum and length n crosses ⌊(cum+n−1)/C⌋ − ⌊cum/C⌋
    //      boundaries; bins, split fractions, and tail fill are pure
    //      integer algebra on (cum, n). Scale: the prefix table is
    //      checkpointed once; the 4-rung sweep is a map-side explode
    //      + one O(4)-row agg — sweeping more sizes costs nothing
    //      corpus-shaped. ----
    QueryDef.sql("q319_packing_sweep",
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split_regex(lower(trim(text)), '\s+'))
        |      AS BIGINT) AS n FROM documents),
        |c AS (SELECT doc_id, n,
        |    COALESCE(sum(n) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum FROM t),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tt,
        |    CAST(count(*) AS BIGINT) AS nd FROM t),
        |cs(cap) AS (VALUES (512), (1024), (2048), (4096)),
        |per AS (SELECT cs.cap,
        |    CAST(count(CASE WHEN (c.cum + c.n - 1) // cs.cap
        |      > c.cum // cs.cap THEN 1 END) AS BIGINT) AS n_split,
        |    CAST(COALESCE(sum((c.cum + c.n - 1) // cs.cap
        |      - c.cum // cs.cap), 0) AS BIGINT) AS n_crossings
        |  FROM c, cs GROUP BY cs.cap)
        |SELECT CAST(per.cap AS BIGINT) AS cap, tot.nd AS n_docs,
        |  tot.tt AS total_tokens,
        |  CAST((tot.tt + per.cap - 1) // per.cap AS BIGINT) AS n_bins,
        |  per.n_split AS n_split_docs,
        |  per.n_crossings AS n_crossings,
        |  CAST(per.n_split * 1000000 // greatest(1, tot.nd) AS BIGINT)
        |    AS split_doc_micro,
        |  CAST(CASE WHEN tot.tt % per.cap = 0 THEN 1000000
        |    ELSE (tot.tt % per.cap) * 1000000 // per.cap END AS BIGINT)
        |    AS tail_fill_micro
        |FROM per, tot ORDER BY cap""".stripMargin) { (s, d) =>
      val pre = tokenPrefix(t(s, d, "documents"))
        .localCheckpoint() // one prefix build feeds the sweep AND totals
      val tot = pre.agg(coalesce(sum(col("n_tokens")), lit(0L)).as("tt"),
        count(lit(1)).as("nd"))
      val per = pre
        .withColumn("cap", explode(typedLit(Seq(512L, 1024L, 2048L, 4096L))))
        .groupBy(col("cap"))
        .agg(count(when(expr("(cum + n_tokens - 1) div cap")
            > expr("cum div cap"), 1)).as("n_split"),
          coalesce(sum(expr("(cum + n_tokens - 1) div cap")
            - expr("cum div cap")), lit(0L)).cast("long").as("n_crossings"))
      per.crossJoin(broadcast(tot))
        .select(col("cap"), col("nd").as("n_docs"),
          col("tt").as("total_tokens"),
          expr("(tt + cap - 1) div cap").as("n_bins"),
          col("n_split").as("n_split_docs"), col("n_crossings"),
          expr("n_split * 1000000 div greatest(1L, nd)")
            .as("split_doc_micro"),
          when(expr("tt % cap") === 0, lit(1000000L))
            .otherwise(expr("(tt % cap) * 1000000 div cap"))
            .as("tail_fill_micro"))
        .orderBy(col("cap"))
    },

    // ---- The corpus-build composition, end to end: exact dedup (md5
    //      groupBy, keep lowest doc_id) → quality gate → deterministic
    //      mixture sample (q62's thresholds) → per-language summary.
    //      Each stage is the scalable primitive proven on its own
    //      (q30 / q33 / q62); this pins that they COMPOSE — the whole
    //      chain is two hash shuffles (dedup group, final group), the
    //      gate and sample are scan-level filters. ----
    QueryDef.sql("q68_corpus_build",
      """WITH dedup AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |docs AS (SELECT d.doc_id, d.lang, d.n_chars, d.text
        |  FROM documents d JOIN dedup USING (doc_id)),
        |filt AS (SELECT doc_id, lang,
        |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_toks
        |  FROM docs WHERE n_chars >= 100),
        |samp AS (SELECT * FROM filt
        |  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |    CASE lang WHEN 'en' THEN '20' WHEN 'de' THEN '80' WHEN 'fr' THEN '80'
        |              WHEN 'es' THEN '40' WHEN 'zh' THEN '40' ELSE '10' END)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS tokens,
        |  min(doc_id) AS min_doc
        |FROM samp GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val keep = docs.groupBy(md5(col("text").cast("binary")))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      docs.join(keep, "doc_id")
        .filter(col("n_chars") >= 100)
        .filter(hashBucket(col("doc_id")) < langThresh)
        .select(col("lang"),
          size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n_toks"),
          col("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("tokens"),
          min(col("doc_id")).as("min_doc"))
        .orderBy(col("lang"))
    },

    // ---- Context-window chunking: slide a fixed token window (16
    //      tokens, stride 12 → 4-token overlap) over each document —
    //      the step that turns variable-length documents into training
    //      contexts. Pure per-row generate (sequence + posexplode):
    //      no shuffle at all before the output sort, chunk count per
    //      doc is ⌈n/stride⌉ — bounded fan-out. Each chunk carries a
    //      cross-engine md5 content hash, so downstream chunk-level
    //      dedup (q30's path) applies unchanged. ----
    QueryDef.sql("q75_chunking",
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |c AS (SELECT doc_id, toks, unnest(range(0, len(toks), 12)) AS start
        |  FROM t WHERE len(toks) >= 1)
        |SELECT doc_id, CAST(start // 12 AS INTEGER) AS chunk_idx,
        |  CAST(start AS INTEGER) AS start_tok,
        |  CAST(least(16, len(toks) - start) AS INTEGER) AS n_tok,
        |  md5(array_to_string(list_slice(toks, start + 1, start + 16), ' ')) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
        .filter(size(col("toks")) >= 1)
        .select(col("doc_id"), col("toks"),
          posexplode(expr("sequence(0, size(toks) - 1, 12)"))
            .as(Seq("chunk_idx", "start")))
        .select(col("doc_id"), col("chunk_idx"),
          col("start").as("start_tok"),
          least(lit(16), size(col("toks")) - col("start")).as("n_tok"),
          md5(concat_ws(" ", expr("slice(toks, start + 1, 16)")).cast("binary"))
            .as("chunk_hash"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // ---- Repetition filter (the Gopher/C4 quality-signal family):
    //      per-document top-token fraction and duplicate-trigram
    //      fraction, with a keep flag at the corpus-tuned thresholds.
    //      Scale shape: tokens/trigrams explode to (doc, gram) rows,
    //      counts come from two-level hash aggregates — partial
    //      map-side combine, shuffles keyed on (doc_id, gram) then
    //      doc_id, never a per-doc sort or window. The same shape
    //      extends to the full Gopher ladder (top 2-4-gram fraction,
    //      dup 5-10-gram char fraction) by swapping the gram
    //      generator. ----
    QueryDef.sql("q81_repetition_filter",
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
        |tc AS (SELECT doc_id, tk, count(*) AS c
        |  FROM (SELECT doc_id, unnest(toks) AS tk FROM f) GROUP BY 1, 2),
        |ta AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS max_tok,
        |    CAST(sum(c) AS BIGINT) AS n_tok FROM tc GROUP BY 1),
        |gc AS (SELECT doc_id, g, count(*) AS c
        |  FROM (SELECT doc_id, unnest(list_transform(range(len(toks)-2),
        |      i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS g
        |    FROM f) GROUP BY 1, 2),
        |ga AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_tri,
        |    CAST(sum(c) AS BIGINT) AS n_tri FROM gc GROUP BY 1)
        |SELECT ta.doc_id, ta.n_tok,
        |  round(max_tok / n_tok, 6) AS top_token_frac,
        |  round(dup_tri / n_tri, 6) AS dup_trigram_frac,
        |  (max_tok / n_tok <= 0.15 AND dup_tri / n_tri <= 0.02) AS keep
        |FROM ta JOIN ga ON ta.doc_id = ga.doc_id
        |ORDER BY ta.doc_id""".stripMargin) { (s, d) =>
      val f = Tables.wide(t(s, d, "documents"))
        .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
        .filter(size(col("toks")) >= 3)
      val ta = f.select(col("doc_id"), explode_outer(col("toks")).as("tk"))
        .groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("max_tok"), sum(col("c")).as("n_tok"))
      val ga = f.select(col("doc_id"), explode_outer(expr(
          "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
          .as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_tri"),
          sum(col("c")).as("n_tri"))
      ta.join(ga, "doc_id")
        .select(col("doc_id"), col("n_tok"),
          round(col("max_tok").cast("double") / col("n_tok"), 6).as("top_token_frac"),
          round(col("dup_tri").cast("double") / col("n_tri"), 6).as("dup_trigram_frac"),
          (col("max_tok").cast("double") / col("n_tok") <= 0.15
            && col("dup_tri").cast("double") / col("n_tri") <= 0.02).as("keep"))
        .orderBy(col("doc_id"))
    },

    // ---- Deterministic train/val/test split: the md5 bucket of the
    //      document id (q62's uniform draw) lands each row in
    //      train (< 0xcc: 79.7%), val (< 0xe6: 10.2%) or test — a pure
    //      per-row projection, no shuffle, no RNG, stable under
    //      reruns, retries, cluster resizes and corpus appends (a
    //      doc's split never changes when neighbors arrive, unlike
    //      any rank- or position-based split). ----
    QueryDef.sql("q82_train_split",
      """SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM (SELECT doc_id, n_chars,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |  FROM documents)
        |GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          when(hashBucket(col("doc_id")) < "cc", "train")
            .when(hashBucket(col("doc_id")) < "e6", "val")
            .otherwise("test").as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("split"))
    },

    // ---- Benchmark decontamination: drop every document containing a
    //      banned n-gram (the eval-set leak scan run before training).
    //      The ban list is a broadcast in-set test inside the gram
    //      generator's filter — contaminated doc ids come from one
    //      hash-distinct, the prune is a left-anti join keyed on
    //      doc_id. No posting-list shuffle of the clean 99.9%: only
    //      matching (doc, gram) rows leave the scan stage. At real
    //      scale the literal IN-list becomes a broadcast join against
    //      the benchmark-gram table — same plan shape. ----
    QueryDef.sql("q83_decontaminate",
      """WITH t AS (SELECT doc_id, lang,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(len(toks)-2),
        |    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS g
        |  FROM t WHERE len(toks) >= 3),
        |bad AS (SELECT DISTINCT doc_id FROM g
        |  WHERE g IN ('stream table hash', 'row column sort', 'window fast query')),
        |clean AS (SELECT t.doc_id, t.lang FROM t ANTI JOIN bad USING (doc_id))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_clean,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM clean GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val banned = Seq("stream table hash", "row column sort", "window fast query")
      val t0 = t(s, d, "documents")
        .select(col("doc_id"), col("lang"), split(lower(trim(col("text"))), "\\s+").as("toks"))
      val bad = t0.filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode_outer(expr(
          "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
          .as("g"))
        .filter(col("g").isin(banned: _*))
        .select(col("doc_id")).distinct()
      t0.join(bad, Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_clean"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("lang"))
    },

    // ---- Bloom-filter decontamination — the 100 TB shape of q83's
    //      exact pass. The benchmark set folds into a FIXED-SIZE bloom
    //      filter (`bloom_filter_agg`, 8 KB here; ~12 MB for a 10M-item
    //      benchmark) that probes the corpus MAP-SIDE via the
    //      registered `might_contain` — no corpus-wide shuffle or join
    //      against the benchmark table at all, the classic join-prune.
    //      Bloom semantics make the contract checkable across engines
    //      even though the bit array is engine-specific: NO FALSE
    //      NEGATIVES (every truly contaminated doc is dropped —
    //      all_contaminated_dropped) and a bounded false-positive
    //      over-drop (fp_ok). The oracle recomputes the exact clean
    //      count; the booleans are what both engines must agree on. ----
    QueryDef.sql("q98_bloom_decontam",
      """WITH bench AS (SELECT DISTINCT lower(trim(text)) AS bt
        |  FROM documents WHERE doc_id % 40 = 0),
        |clean AS (SELECT doc_id FROM documents
        |  WHERE lower(trim(text)) NOT IN (SELECT bt FROM bench))
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |    WHERE doc_id % 40 = 0) AS n_bench,
        |  CAST(count(*) AS BIGINT) AS n_exact_clean,
        |  true AS all_contaminated_dropped, true AS fp_ok
        |FROM clean""".stripMargin) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, d, "documents")
      val norm = lower(trim(col("text")))
      val bench = docs.filter(col("doc_id") % 40 === 0)
      // driver state = the serialized filter (bounded by numBits, not
      // by corpus size) — the same collect-tiny-state-then-embed
      // pattern as the IVF codebook
      val bloom = bench
        .agg(expr("bloom_filter_agg(xxhash64(lower(trim(text))), 4096L, 65536L)"))
        .head.getAs[Array[Byte]](0)
      val kept = docs.filter(
        !call_function("might_contain", lit(bloom), xxhash64(norm)))
      val benchTexts = bench.select(norm.as("bt")).distinct()
      val nBench = bench.agg(count(lit(1)).as("n_bench"))
      val nExactClean = docs.join(benchTexts, norm === col("bt"), "left_anti")
        .agg(count(lit(1)).as("n_exact_clean"))
      val contamKept = kept.join(benchTexts, norm === col("bt"), "left_semi")
        .agg(count(lit(1)).as("contam_kept"))
      val nKept = kept.agg(count(lit(1)).as("n_bloom_kept"))
      nBench.crossJoin(nExactClean).crossJoin(contamKept).crossJoin(nKept)
        .select(col("n_bench"), col("n_exact_clean"),
          (col("contam_kept") === 0).as("all_contaminated_dropped"),
          (col("n_exact_clean") - col("n_bloom_kept")
            <= greatest(lit(1), col("n_exact_clean") * lit(0.02)))
            .as("fp_ok"))
    },

    // ---- Deterministic training shuffle: every epoch/restart must
    //      see the SAME seeded permutation (reproducible runs, stable
    //      resume mid-epoch), so the order is md5(seed:doc_id) — no
    //      RNG state, any engine recomputes it. The naive plan is one
    //      global row_number = a single-partition sort, dead at scale;
    //      the md5 key is UNIFORM, so its leading hex byte is a
    //      deterministic, order-preserving range bucketing (hex string
    //      order == bucket int order) and the global position is q63's
    //      two-level prefix sum: within-bucket rank (partitioned
    //      window) + prefix-summed bucket counts (≤256 rows)
    //      broadcast back. Batch id then falls out arithmetically. ----
    QueryDef.sql("q100_train_shuffle",
      """WITH r AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)),
        |      doc_id) AS pos
        |  FROM documents)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |  CAST((pos - 1) // 32 AS BIGINT) AS batch
        |FROM r ORDER BY pos""".stripMargin) { (s, d) =>
      val BatchSize = 32
      val keyed = t(s, d, "documents")
        .select(col("doc_id"),
          md5(concat(lit("42:"), col("doc_id").cast("string"))).as("k"))
        .withColumn("pid",
          conv(substring(col("k"), 1, 2), 16, 10).cast("int"))
      val wIn = Window.partitionBy(col("pid")).orderBy(col("k"), col("doc_id"))
      val within = keyed.withColumn("rn", row_number().over(wIn).cast("long"))
      val wOff = Window.orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = keyed.groupBy(col("pid"))
        .agg(count(lit(1)).as("n"))
        .withColumn("offset", coalesce(sum(col("n")).over(wOff), lit(0L)))
        .select(col("pid"), col("offset"))
      within.join(broadcast(offsets), "pid")
        .select(col("doc_id"), (col("offset") + col("rn")).as("pos"))
        .withColumn("batch", expr(s"(pos - 1) div $BatchSize"))
        .orderBy(col("pos"))
    },

    // ---- Per-source quota cap (domain balancing): keep at most N
    //      documents per source, chosen by the deterministic md5-
    //      bucket order (NOT arrival order — append-stable). The rank
    //      is a window partitioned by source: each source's rows sort
    //      within their own partition, so one hot domain never
    //      serializes the cluster; with per-source top-N at lake
    //      scale the window swaps for the groupBy/min_by-heap pattern
    //      if sources are few and huge. ----
    QueryDef.sql("q84_source_quota",
      """WITH r AS (SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rk
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
        |FROM r WHERE rk <= 15 GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("source"))
        .orderBy(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
          col("doc_id"))
      t(s, d, "documents")
        .select(col("source"), col("doc_id"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= 15)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).cast("long").as("kept_id_sum"))
        .orderBy(col("source"))
    },

    // ---- Per-source quota via the bounded-heap aggregate — q84's
    //      documented monster-source fallback, as a real plan: the
    //      window formulation shuffles and SORTS every row of every
    //      source; `top_k_min` keeps a k-element heap per group,
    //      combined MAP-SIDE, so each partition ships ≤ k rows per
    //      source through the shuffle and nothing ever sorts a whole
    //      domain. Same deterministic md5-bucket order; the oracle is
    //      the independent window formulation — the hash check proves
    //      the heap path ≡ the sort path. ----
    QueryDef.sql("q86_quota_heap",
      """WITH r AS (SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rk
        |  FROM documents)
        |SELECT source, doc_id FROM r WHERE rk <= 12
        |ORDER BY source, doc_id""".stripMargin) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      t(s, d, "documents")
        .select(col("source"), struct(
          substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8)
            .as("bk"),
          col("doc_id")).as("p"))
        .groupBy(col("source"))
        .agg(expr("top_k_min(p, 12)").as("top"))
        .select(col("source"), explode(col("top")).as("t"))
        .select(col("source"), col("t.doc_id").as("doc_id"))
        .orderBy(col("source"), col("doc_id"))
    },

    // ---- Vocabulary growth curve (Heaps' law): cumulative distinct
    //      vocabulary vs cumulative token count in doc_id ingest
    //      order — the corpus-analysis curve that says when a source
    //      stops contributing new types (flattening curve = diminishing
    //      data value; a jump = a new domain arrived). "Cumulative
    //      distinct" is NOT computed by any running distinct-count:
    //      each token's contribution collapses to its FIRST document
    //      (one token-keyed min aggregate — q76's vocabulary shuffle),
    //      so the curve is just two prefix sums over per-doc counts
    //      (total tokens, first-seen tokens), each via q63's two-level
    //      scheme: partitioned within-bucket window + prefix-summed
    //      per-bucket totals broadcast back. No single-partition
    //      window, no state; output one row per doc. ----
    // ---- Temperature-rebalanced language mixture (the mT5/XLM-R
    //      sampling scheme, τ = 0.5): sample each language ∝ n^τ
    //      instead of ∝ n, flattening the head language's dominance
    //      while keeping ordering. Unlike q62's FIXED per-lang rates,
    //      the quotas here are DERIVED from the corpus counts —
    //      τ-scaled weights w = round(√n · 1e6) as exact BIGINTs, so
    //      quota = (⌊N/2⌋ · w) div Σw is pure integer arithmetic (no
    //      float-summation-order seam; the lone float op, √n, is one
    //      correctly-rounded IEEE call on identical inputs in both
    //      engines). Selection inside each language is the q84
    //      deterministic-hash rank (append-stable, engine-agnostic).
    //      Scale shape: the per-lang count agg is O(langs) rows, the
    //      quota table broadcasts back, and the rank is a per-lang
    //      window — the one per-row sort, keyed on the mixture key,
    //      same as q84 (monster-group fallback: q86's bounded heap).
    //      ----
    QueryDef.sql("q115_temperature_mix",
      """WITH n AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY lang),
        |w AS (SELECT lang, n_s,
        |    CAST(round(sqrt(n_s) * 1000000) AS BIGINT) AS w FROM n),
        |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n,
        |    CAST(sum(w) AS BIGINT) AS wsum FROM w),
        |q AS (SELECT lang, n_s, ((SELECT n FROM tot) // 2 * w)
        |      // (SELECT wsum FROM tot) AS quota FROM w),
        |r AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |    ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rk
        |  FROM documents)
        |SELECT r.lang, q.n_s AS n_total, q.quota,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(r.doc_id) AS BIGINT) AS kept_id_sum
        |FROM r JOIN q ON r.lang = q.lang AND r.rk <= q.quota
        |GROUP BY 1, 2, 3 ORDER BY r.lang""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val n = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_s"))
        .withColumn("w", expr("cast(round(sqrt(n_s) * 1000000) as bigint)"))
      val tots = n.agg(sum(col("n_s")).cast("long").as("n"),
        sum(col("w")).cast("long").as("wsum"))
      // one-row scalar broadcast (the repo's 1-row crossJoin pattern)
      val quotas = n.crossJoin(broadcast(tots))
        .withColumn("quota", expr("((n div 2) * w) div wsum"))
        .select(col("lang"), col("n_s").as("n_total"), col("quota"))
      val rk = Window.partitionBy(col("lang"))
        .orderBy(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
          col("doc_id"))
      docs.select(col("lang"), col("doc_id"), row_number().over(rk).as("rk"))
        .join(broadcast(quotas), Seq("lang"))
        .filter(col("rk") <= col("quota"))
        .groupBy(col("lang"), col("n_total"), col("quota"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("kept_id_sum"))
        .orderBy(col("lang"))
    },

    // ---- Epoch upsampling with replication — the other half of the
    //      mixture story (q62/q115 SUB-sample big sources; training
    //      runs UP-sample high-value small ones by repeating docs
    //      across epochs). Factors derive from the same sqrt-
    //      temperature rebalance as q115, normalized so the smallest
    //      factor is exactly 1.0 (pure upsampling), all in exact
    //      integer micro-units — no float seam anywhere. Each doc gets
    //      ⌊f⌋ copies plus one more iff a Knuth-multiplicative hash of
    //      doc_id falls under f's fractional part — deterministic,
    //      append-stable, and the expansion is a row-local
    //      explode(sequence(...)) (zero shuffles before the report
    //      agg). Arithmetic fits a long at corpus scale; a lake-scale
    //      run lifts the micro-unit products into DECIMAL(38,0) —
    //      same plan. ----
    QueryDef.sql("q130_epoch_upsample",
      """WITH n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_s
        |  FROM documents GROUP BY lang),
        |w AS (SELECT lang, n_s,
        |    CAST(round(sqrt(n_s) * 1000000) AS BIGINT) AS w FROM n),
        |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS nn,
        |    CAST(sum(w) AS BIGINT) AS wsum FROM w),
        |f AS (SELECT lang, n_s,
        |    (w * (SELECT nn FROM tot) * 1000000)
        |      // ((SELECT wsum FROM tot) * n_s) AS fm FROM w),
        |g AS (SELECT lang, n_s,
        |    (fm * 1000000) // (SELECT min(fm) FROM f) AS gm FROM f),
        |c AS (SELECT d.doc_id, d.lang, g.gm,
        |    (g.gm // 1000000)
        |      + CASE WHEN (d.doc_id * 2654435761) % 1000000
        |             < (g.gm % 1000000) THEN 1 ELSE 0 END AS copies
        |  FROM documents d JOIN g USING (lang)),
        |o AS (SELECT doc_id, lang, gm, unnest(range(copies)) AS copy
        |  FROM c)
        |SELECT lang, (SELECT n_s FROM g WHERE g.lang = o.lang)
        |    AS n_docs, gm AS factor_micro,
        |  CAST(count(*) AS BIGINT) AS n_out,
        |  (CAST(count(*) AS BIGINT) * 1000000)
        |    // (SELECT n_s FROM g WHERE g.lang = o.lang)
        |    AS achieved_micro
        |FROM o GROUP BY lang, gm ORDER BY lang""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val n = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_s"))
        .withColumn("w", expr("cast(round(sqrt(n_s) * 1000000) as bigint)"))
      val tots = n.agg(sum(col("n_s")).cast("long").as("nn"),
        sum(col("w")).cast("long").as("wsum"))
      val f = n.crossJoin(broadcast(tots))
        .withColumn("fm", expr("(w * nn * 1000000) div (wsum * n_s)"))
      val fmin = f.agg(min(col("fm")).as("fmin"))
      val g = f.crossJoin(broadcast(fmin))
        .select(col("lang"), col("n_s"),
          expr("(fm * 1000000) div fmin").as("gm"))
      docs.select(col("doc_id"), col("lang"))
        .join(broadcast(g), Seq("lang"))
        .withColumn("copies", expr(
          """(gm div 1000000) + (case when (doc_id * 2654435761) % 1000000
            |  < (gm % 1000000) then 1 else 0 end)""".stripMargin))
        .select(col("doc_id"), col("lang"), col("n_s"), col("gm"),
          explode(expr("sequence(0, copies - 1)")).as("copy"))
        .groupBy(col("lang"), col("n_s"), col("gm"))
        .agg(count(lit(1)).as("n_out"))
        .select(col("lang"), col("n_s").as("n_docs"),
          col("gm").as("factor_micro"), col("n_out"),
          expr("(n_out * 1000000) div n_docs").as("achieved_micro"))
        .orderBy(col("lang"))
    },

    QueryDef.sql("q111_vocab_growth",
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |pd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM t),
        |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |fd AS (SELECT tok, min(doc_id) AS fdoc FROM e GROUP BY tok),
        |nn AS (SELECT fdoc AS doc_id, CAST(count(*) AS BIGINT) AS n_new
        |       FROM fd GROUP BY fdoc),
        |j AS (SELECT pd.doc_id, pd.n_toks, COALESCE(nn.n_new, 0) AS n_new
        |      FROM pd LEFT JOIN nn USING (doc_id))
        |SELECT doc_id,
        |  CAST(sum(n_toks) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens,
        |  CAST(sum(n_new) OVER (ORDER BY doc_id) AS BIGINT) AS vocab
        |FROM j ORDER BY doc_id""".stripMargin) { (s, d) =>
      val Buckets = 32
      val toks = t(s, d, "documents")
        .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
      val perDoc = toks.select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"))
      // each distinct token contributes to exactly its first doc
      val firstSeen = toks
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("tok")).agg(min(col("doc_id")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_new"))
      val joined = perDoc.join(firstSeen, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_toks"),
          coalesce(col("n_new"), lit(0L)).as("n_new"))
      val bounds = joined.agg(min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi")).head()
      if (bounds.isNullAt(0)) {
        joined.filter(lit(false)).select(col("doc_id"),
          lit(0L).as("cum_tokens"), lit(0L).as("vocab"))
      } else {
        val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
        val width = math.max(1L, (hi - lo) / Buckets + 1)
        val staged = joined.withColumn("pid",
          ((col("doc_id") - lit(lo)) / lit(width)).cast("int"))
        // INCLUSIVE within-bucket running sums (the curve includes the
        // current doc); one window spec feeds both measures
        val wIn = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val within = staged
          .withColumn("ct_in", sum(col("n_toks")).over(wIn))
          .withColumn("cv_in", sum(col("n_new")).over(wIn))
        val wOff = Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = staged.groupBy(col("pid"))
          .agg(sum(col("n_toks")).as("tt"), sum(col("n_new")).as("tv"))
          .withColumn("t_off", coalesce(sum(col("tt")).over(wOff), lit(0L)))
          .withColumn("v_off", coalesce(sum(col("tv")).over(wOff), lit(0L)))
          .select(col("pid"), col("t_off"), col("v_off"))
        within.join(broadcast(offsets), "pid")
          .select(col("doc_id"),
            (col("t_off") + col("ct_in")).as("cum_tokens"),
            (col("v_off") + col("cv_in")).as("vocab"))
          .orderBy(col("doc_id"))
      }
    },

    // ---- Point-in-time feature assembly (the feature-store PIT
    //      join): every training label (purchase events) picks up,
    //      for each feature series, the value AS OF the label instant
    //      — never after it, the leakage a naive join-on-key invites.
    //      Two feature legs (running view count, running click spend
    //      in exact micros) chain through AsOfJoin.lastAtOrBefore:
    //      each leg is ONE user-keyed exchange with constant running
    //      state, never a time-range pair join. Feature series are
    //      made unique per (user, instant) via max_by(event_id) so
    //      both engines' tie choice is identical by construction; the
    //      *_age_us columns put the leak audit IN the output — any
    //      negative age would be future leakage, and the oracle hash
    //      pins every age exactly. ----
    QueryDef.sql("q163_pit_features",
      """WITH p AS (SELECT event_id AS lid, user_id, epoch_us(ts) AS t
        |  FROM events WHERE event_type = 'purchase'),
        |va0 AS (SELECT user_id, epoch_us(ts) AS t, event_id,
        |    count(*) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS cum
        |  FROM events WHERE event_type = 'view'),
        |va AS (SELECT user_id, t, CAST(max_by(cum, event_id) AS BIGINT)
        |    AS va_cnt FROM va0 GROUP BY user_id, t),
        |vb0 AS (SELECT user_id, epoch_us(ts) AS t, event_id,
        |    sum(CAST(floor(value * 1000000) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS cum
        |  FROM events WHERE event_type = 'click'),
        |vb AS (SELECT user_id, t, CAST(max_by(cum, event_id) AS BIGINT)
        |    AS vb_micro FROM vb0 GROUP BY user_id, t),
        |j1 AS (SELECT p.lid, p.user_id, p.t, va.va_cnt, va.t AS va_t
        |  FROM p ASOF LEFT JOIN va
        |  ON p.user_id = va.user_id AND p.t >= va.t),
        |j2 AS (SELECT j1.*, vb.vb_micro, vb.t AS vb_t
        |  FROM j1 ASOF LEFT JOIN vb
        |  ON j1.user_id = vb.user_id AND j1.t >= vb.t)
        |SELECT lid, user_id, t,
        |  CAST(coalesce(va_cnt, 0) AS BIGINT) AS views_so_far,
        |  CAST(coalesce(t - va_t, -1) AS BIGINT) AS views_age_us,
        |  CAST(coalesce(vb_micro, 0) AS BIGINT) AS clicks_micro_so_far,
        |  CAST(coalesce(t - vb_t, -1) AS BIGINT) AS clicks_age_us
        |FROM j2 ORDER BY lid""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("lid"), col("user_id").as("k"),
          unix_micros(col("ts")).as("t"))
      val wv = Window.partitionBy(col("k")).orderBy(col("t"), col("event_id"))
      // one shape for every feature leg: filter → running cum → dedup
      // per (user, instant) by latest event_id (Catalyst prunes the
      // micros column where the cum doesn't use it)
      def series(et: String, cum: org.apache.spark.sql.Column,
          vName: String, tName: String) =
        ev.filter(col("event_type") === et)
          .select(col("user_id").as("k"), unix_micros(col("ts")).as("t"),
            col("event_id"),
            floor(col("value") * 1000000).cast("long").as("micros"))
          .withColumn("cum", cum)
          .groupBy(col("k"), col("t"))
          .agg(max_by(col("cum"), col("event_id")).cast("long").as(vName))
          .withColumn(tName, col("t"))
      val va = series("view", count(lit(1)).over(wv), "va_cnt", "va_t")
      val vb = series("click", sum(col("micros")).over(wv), "vb_micro", "vb_t")
      val j1 = graft.operators.AsOfJoin.lastAtOrBefore(
        p, va, keyCol = "k", timeCol = "t", valueCols = Seq("va_cnt", "va_t"))
      val j2 = graft.operators.AsOfJoin.lastAtOrBefore(
        j1, vb, keyCol = "k", timeCol = "t", valueCols = Seq("vb_micro", "vb_t"))
      j2.select(col("lid"), col("k").as("user_id"), col("t"),
          coalesce(col("va_cnt"), lit(0L)).cast("long").as("views_so_far"),
          coalesce(col("t") - col("va_t"), lit(-1L)).cast("long")
            .as("views_age_us"),
          coalesce(col("vb_micro"), lit(0L)).cast("long")
            .as("clicks_micro_so_far"),
          coalesce(col("t") - col("vb_t"), lit(-1L)).cast("long")
            .as("clicks_age_us"))
        .orderBy(col("lid"))
    },

    // ---- A/B experiment read-out: deterministic 50/50 arm assignment
    //      by user-id hash (the q82 md5-bucket idiom — stable under
    //      re-runs, append-only data, and either engine), then per-
    //      event-type arm metrics and a Welch t statistic. All moment
    //      sums run EXACT (micros in DECIMAL(38,0); the variance
    //      numerator n·Σx² − (Σx)² stays decimal — no catastrophic
    //      float cancellation), and doubles appear only in the final
    //      identical-op-order division/sqrt, so the 4-dp round is
    //      bit-stable cross-engine. One (arm × type) agg + an O(types)
    //      pivot-style final agg — the whole read-out is two exchanges
    //      at any corpus size. ----
    QueryDef.sql("q165_abtest",
      s"""WITH $armedCte,
        |g AS (SELECT etype, arm, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v AS DECIMAL(38,0))) AS s1,
        |    sum(CAST(v AS DECIMAL(38,0)) * v) AS s2
        |  FROM a GROUP BY etype, arm),
        |w AS (SELECT etype,
        |    max(CASE WHEN arm = 'A' THEN n END) AS n_a,
        |    max(CASE WHEN arm = 'B' THEN n END) AS n_b,
        |    max(CASE WHEN arm = 'A' THEN s1 END) AS s1a,
        |    max(CASE WHEN arm = 'B' THEN s1 END) AS s1b,
        |    max(CASE WHEN arm = 'A' THEN s2 END) AS s2a,
        |    max(CASE WHEN arm = 'B' THEN s2 END) AS s2b
        |  FROM g GROUP BY etype)
        |SELECT etype, n_a, n_b,
        |  CAST(s1a AS BIGINT) AS sum_a_micro, CAST(s1b AS BIGINT) AS sum_b_micro,
        |  round(CAST(s1a AS DOUBLE) / n_a - CAST(s1b AS DOUBLE) / n_b, 4)
        |    AS mean_diff_micro,
        |  CASE WHEN n_a <= 1 OR n_b <= 1
        |      OR (n_a * s2a - s1a * s1a = 0 AND n_b * s2b - s1b * s1b = 0)
        |    THEN NULL
        |    ELSE round((CAST(s1a AS DOUBLE) / n_a - CAST(s1b AS DOUBLE) / n_b)
        |      / sqrt(CAST(n_a * s2a - s1a * s1a AS DOUBLE)
        |          / (CAST(n_a AS DOUBLE) * (n_a - 1)) / n_a
        |        + CAST(n_b * s2b - s1b * s1b AS DOUBLE)
        |          / (CAST(n_b AS DOUBLE) * (n_b - 1)) / n_b), 4) END AS t_stat
        |FROM w ORDER BY etype""".stripMargin) { (s, d) =>
      val g = armedEvents(t(s, d, "events")).groupBy(col("etype"), col("arm"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(38,0)")).as("s1"),
          sum(col("v").cast("decimal(38,0)") * col("v")).as("s2"))
      val w = g.groupBy(col("etype"))
        .agg(max(when(col("arm") === "A", col("n"))).as("n_a"),
          max(when(col("arm") === "B", col("n"))).as("n_b"),
          max(when(col("arm") === "A", col("s1"))).as("s1a"),
          max(when(col("arm") === "B", col("s1"))).as("s1b"),
          max(when(col("arm") === "A", col("s2"))).as("s2a"),
          max(when(col("arm") === "B", col("s2"))).as("s2b"))
      val meanDiff = col("s1a").cast("double") / col("n_a") -
        col("s1b").cast("double") / col("n_b")
      val varA = (col("n_a") * col("s2a") - col("s1a") * col("s1a"))
        .cast("double") / (col("n_a").cast("double") * (col("n_a") - 1))
      val varB = (col("n_b") * col("s2b") - col("s1b") * col("s1b"))
        .cast("double") / (col("n_b").cast("double") * (col("n_b") - 1))
      // degenerate-arm guard (mirrored in the oracle): an arm with
      // n<=1 or both variance numerators 0 would divide by zero —
      // doubles then go NaN/Inf, whose textual forms differ cross-
      // engine. The guard tests are exact integer/decimal compares.
      val degenerate = col("n_a") <= 1 || col("n_b") <= 1 ||
        ((col("n_a") * col("s2a") - col("s1a") * col("s1a")) === 0 &&
          (col("n_b") * col("s2b") - col("s1b") * col("s1b")) === 0)
      w.select(col("etype"), col("n_a"), col("n_b"),
          col("s1a").cast("long").as("sum_a_micro"),
          col("s1b").cast("long").as("sum_b_micro"),
          round(meanDiff, 4).as("mean_diff_micro"),
          when(degenerate, lit(null).cast("double"))
            .otherwise(
              round(meanDiff / sqrt(varA / col("n_a") + varB / col("n_b")), 4))
            .as("t_stat"))
        .orderBy(col("etype"))
    },

    // ---- Two-sample Kolmogorov–Smirnov distance between the A/B
    //      arms' VALUE DISTRIBUTIONS — the distribution-free
    //      complement to q165's mean test (equal means can hide a
    //      variance or shape shift; KS sees any CDF divergence). The
    //      statistic is EXACT: at every distinct micro-value the CDF
    //      gap |cumA·n_b − cumB·n_a| is an integer (cross-multiplied —
    //      no CDF division ever happens), the max is taken over the
    //      merged support inside one (etype)-keyed window pass, and
    //      only the final micro-ratio divides (decimal-widened integer
    //      division, lake-safe). One (etype, v) agg + one window +
    //      O(types) rollup. ----
    QueryDef.sql("q175_ks_test",
      s"""WITH $armedCte,
        |pts AS (SELECT etype, v,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM a GROUP BY etype, v),
        |cum AS (SELECT etype, v,
        |    sum(ca) OVER (PARTITION BY etype ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumA,
        |    sum(cb) OVER (PARTITION BY etype ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumB
        |  FROM pts),
        |n AS (SELECT etype, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM pts GROUP BY etype)
        |SELECT cum.etype, n.na AS n_a, n.nb AS n_b,
        |  CAST(max(abs(CAST(cumA AS HUGEINT) * n.nb
        |    - CAST(cumB AS HUGEINT) * n.na)) AS BIGINT) AS ks_num,
        |  CASE WHEN n.na = 0 OR n.nb = 0 THEN NULL
        |    ELSE CAST(CAST(max(abs(CAST(cumA AS HUGEINT) * n.nb
        |      - CAST(cumB AS HUGEINT) * n.na)) AS HUGEINT) * 1000000
        |      // (CAST(n.na AS HUGEINT) * n.nb) AS BIGINT) END AS ks_micro
        |FROM cum JOIN n ON n.etype = cum.etype
        |GROUP BY cum.etype, n.na, n.nb ORDER BY cum.etype""".stripMargin) {
      (s, d) =>
      // checkpointed: the support table is O(types · distinct v) and
      // feeds both the CDF window and the margin agg — without it each
      // consumer rescans the corpus (the q170/q172 discipline)
      val pts = armedEvents(t(s, d, "events"))
        .groupBy(col("etype"), col("v"))
        .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("ca"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("cb"))
        .localCheckpoint()
      val w = Window.partitionBy(col("etype")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = pts
        .withColumn("cumA", sum(col("ca")).over(w))
        .withColumn("cumB", sum(col("cb")).over(w))
      val n = pts.groupBy(col("etype"))
        .agg(sum(col("ca")).cast("long").as("na"),
          sum(col("cb")).cast("long").as("nb"))
      cum.join(n, "etype")
        .withColumn("gap",
          abs(col("cumA").cast("decimal(38,0)") * col("nb") -
            col("cumB").cast("decimal(38,0)") * col("na")))
        .groupBy(col("etype"), col("na"), col("nb"))
        .agg(max(col("gap")).cast("long").as("ks_num"),
          // an empty arm leaves the statistic undefined (na·nb = 0
          // would ANSI-error): NULL in both engines, like q165's
          // degenerate-arm guard
          expr("CASE WHEN na = 0 OR nb = 0 THEN NULL" +
            " ELSE CAST((CAST(max(gap) AS DECIMAL(38,0)) * 1000000)" +
            " div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT) END")
            .as("ks_micro"))
        .select(col("etype"), col("na").as("n_a"), col("nb").as("n_b"),
          col("ks_num"), col("ks_micro"))
        .orderBy(col("etype"))
    },

    // ---- Quantile treatment effect at the deciles: WHERE in the
    //      value distribution the A/B effect lives — equal means (q165)
    //      and even a small KS (q175) can hide a tail-only shift that
    //      a mean test averages away; the QTE row at p=9 is the tail
    //      story. Per (etype, arm): the p-th decile is the EXACT order
    //      statistic at rank ⌈p·n/10⌉, read off the same (etype, v)
    //      support table q175 uses via the integer test cum·10 ≥ p·n —
    //      never an interpolated float percentile, so both engines
    //      agree bit-for-bit. Empty arms leave the quantile NULL (the
    //      min-over-empty guard is explicit: an na = 0 arm must not
    //      satisfy cum·10 ≥ 0 vacuously). One corpus support agg +
    //      one window pass + an O(types·9) report. ----
    QueryDef.sql("q287_quantile_effect",
      s"""WITH $armedCte,
        |pts AS (SELECT etype, v,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM a GROUP BY etype, v),
        |cum AS (SELECT etype, v,
        |    sum(ca) OVER (PARTITION BY etype ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumA,
        |    sum(cb) OVER (PARTITION BY etype ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumB
        |  FROM pts),
        |n AS (SELECT etype, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM pts GROUP BY etype),
        |dec(p) AS (VALUES (CAST(1 AS BIGINT)), (2), (3), (4), (5),
        |  (6), (7), (8), (9)),
        |qs AS (SELECT cum.etype, d.p, n.na, n.nb,
        |    min(CASE WHEN n.na > 0 AND cum.cumA * 10 >= d.p * n.na
        |      THEN cum.v END) AS qa,
        |    min(CASE WHEN n.nb > 0 AND cum.cumB * 10 >= d.p * n.nb
        |      THEN cum.v END) AS qb
        |  FROM cum JOIN n ON n.etype = cum.etype CROSS JOIN dec d
        |  GROUP BY cum.etype, d.p, n.na, n.nb)
        |SELECT etype, p AS decile, qa AS q_a_micro, qb AS q_b_micro,
        |  qb - qa AS qte_micro
        |FROM qs ORDER BY etype, decile""".stripMargin) { (s, d) =>
      val pts = armedEvents(t(s, d, "events"))
        .groupBy(col("etype"), col("v"))
        .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("ca"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("cb"))
        .localCheckpoint() // O(types·distinct v) feeds window + margins
      val w = Window.partitionBy(col("etype")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = pts
        .withColumn("cumA", sum(col("ca")).over(w))
        .withColumn("cumB", sum(col("cb")).over(w))
      val n = pts.groupBy(col("etype"))
        .agg(sum(col("ca")).cast("long").as("na"),
          sum(col("cb")).cast("long").as("nb"))
      val dec = s.range(1, 10).select(col("id").as("p"))
      cum.join(n, "etype").crossJoin(broadcast(dec))
        .groupBy(col("etype"), col("p"), col("na"), col("nb"))
        .agg(min(when(col("na") > 0
            && col("cumA") * 10 >= col("p") * col("na"), col("v")))
            .as("qa"),
          min(when(col("nb") > 0
            && col("cumB") * 10 >= col("p") * col("nb"), col("v")))
            .as("qb"))
        .select(col("etype"), col("p").as("decile"),
          col("qa").as("q_a_micro"), col("qb").as("q_b_micro"),
          (col("qb") - col("qa")).as("qte_micro"))
        .orderBy(col("etype"), col("decile"))
    },

    // ---- Max-min fair budget allocation (progressive waterfilling):
    //      an 80%-of-corpus token budget splits across languages so
    //      that small languages keep their FULL demand and the
    //      surplus-hungry ones share the waterline equally — the fair
    //      alternative to q115's temperature mixture when the contract
    //      is "never downsample a language that fits". Closed-form,
    //      no iteration: sort demands ascending, one prefix-sum
    //      window gives each rank its hypothetical equal share of the
    //      remaining budget; the FIRST rank whose demand exceeds its
    //      share is the waterline, integer remainder spread +1 over
    //      the first capped ranks so Σalloc == budget EXACTLY. All
    //      integer math — both engines derive the identical
    //      allocation. The sort runs over O(groups) post-agg rows;
    //      the only corpus-sized exchange is the demand agg. ----
    QueryDef.sql("q169_fair_share",
      """WITH dem AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS d
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT CAST((8 * sum(d)) // 10 AS BIGINT) AS b,
        |    CAST(count(*) AS BIGINT) AS n FROM dem),
        |srt AS (SELECT lang, d,
        |    CAST(row_number() OVER (ORDER BY d, lang) AS BIGINT) AS i,
        |    CAST(sum(d) OVER (ORDER BY d, lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS p FROM dem),
        |sh AS (SELECT srt.*, tot.b, tot.n,
        |    (tot.b - (srt.p - srt.d)) // (tot.n - srt.i + 1) AS share,
        |    (tot.b - (srt.p - srt.d)) AS rem FROM srt, tot),
        |cr AS (SELECT min(i) AS crit FROM sh WHERE share < d),
        |cv AS (SELECT sh.share AS lam,
        |    sh.rem - sh.share * (sh.n - sh.i + 1) AS r, sh.i AS ci
        |  FROM sh, cr WHERE sh.i = cr.crit),
        |al AS (SELECT sh.lang, sh.d AS demand,
        |  CAST(CASE WHEN cv.ci IS NULL OR sh.i < cv.ci THEN sh.d
        |    ELSE cv.lam + CASE WHEN sh.i - cv.ci < cv.r THEN 1 ELSE 0 END
        |    END AS BIGINT) AS alloc
        |  FROM sh LEFT JOIN cv ON true)
        |SELECT lang, demand, alloc,
        |  CAST(CASE WHEN alloc < demand THEN 1 ELSE 0 END AS BIGINT)
        |    AS capped
        |FROM al ORDER BY lang""".stripMargin) { (s, d) =>
      val dem = t(s, d, "documents").groupBy(col("lang").as("key"))
        .agg(sum(col("n_chars")).cast("long").as("d"))
      graft.operators.FairShare.allocate(dem, 8L, 10L)
        .withColumnRenamed("key", "lang")
    },

    // ---- DSIR importance weights (Xie et al., "Data Selection via
    //      Importance Resampling"): score every raw document by how
    //      much its hashed-bigram profile looks like a TARGET
    //      distribution (here: the corpus' English slice) vs the raw
    //      corpus — log p̂(doc)/q̂(doc) under two bag-of-hashed-ngrams
    //      multinomials with add-one smoothing. The feature space is
    //      hashed to 256 buckets (md5 first byte — both engines hash
    //      identically), so the two fitted distributions are
    //      FIXED-SIZE tables whatever the corpus size: fitting is one
    //      corpus-keyed agg, λ_f = ln((cp_f+1)(Cq+256) /
    //      ((cq_f+1)(Cp+256))) lives on 256 rows, and scoring is a
    //      broadcast join + per-doc weighted sum — the whole selector
    //      is two corpus passes and O(1) model state at 100 TB. The
    //      per-doc feature table feeds both the fit and the scoring,
    //      so it is localCheckpointed once (the q170/q172 support-
    //      table discipline). Float path: one ln per feature computed
    //      in an IDENTICAL expression tree on 256 rows, weighted
    //      integer counts, 6-dp round on the sum (q90's precedent
    //      absorbs summation-order ulps). ----
    QueryDef.sql("q177_dsir_weights",
      """WITH t AS (SELECT doc_id, lang,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> len(x) > 0) AS toks
        |  FROM documents),
        |bg AS (SELECT doc_id, lang,
        |    substring(md5(unnest(list_transform(range(len(toks)-1),
        |      i -> toks[i+1] || ' ' || toks[i+2]))), 1, 2) AS f
        |  FROM t WHERE len(toks) >= 2),
        |dfc AS (SELECT doc_id, lang, f, CAST(count(*) AS BIGINT) AS n
        |  FROM bg GROUP BY 1, 2, 3),
        |fs AS (SELECT f, CAST(sum(n) AS BIGINT) AS cq,
        |    CAST(sum(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS BIGINT)
        |      AS cp
        |  FROM dfc GROUP BY f),
        |tot AS (SELECT CAST(sum(cq) AS BIGINT) AS tq,
        |    CAST(sum(cp) AS BIGINT) AS tp FROM fs),
        |lam AS (SELECT fs.f,
        |    ln(((fs.cp + 1.0) * (tot.tq + 256))
        |      / ((fs.cq + 1.0) * (tot.tp + 256))) AS l
        |  FROM fs CROSS JOIN tot),
        |sc AS (SELECT dfc.doc_id, CAST(sum(dfc.n) AS BIGINT) AS n_bigrams,
        |    round(sum(dfc.n * lam.l), 6) AS dsir_weight
        |  FROM dfc JOIN lam ON lam.f = dfc.f GROUP BY dfc.doc_id)
        |SELECT doc_id, n_bigrams, dsir_weight FROM sc
        |ORDER BY dsir_weight DESC, doc_id LIMIT 20""".stripMargin) {
      (s, d) =>
      val toksDf = Tables.wide(t(s, d, "documents"))
        .select(col("doc_id"), col("lang"), expr(
          "filter(split(lower(trim(text)), '\\\\s+'), x -> length(x) > 0)")
          .as("toks"))
        .filter(size(col("toks")) >= 2)
      val dfc = toksDf
        .select(col("doc_id"), col("lang"), explode(expr(
          """transform(sequence(0, size(toks)-2),
            |  i -> substring(md5(concat(toks[i], ' ', toks[i+1])), 1, 2))"""
            .stripMargin)).as("f"))
        .groupBy(col("doc_id"), col("lang"), col("f"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val fs = dfc.groupBy(col("f"))
        .agg(sum(col("n")).cast("long").as("cq"),
          sum(when(col("lang") === "en", col("n")).otherwise(0L))
            .cast("long").as("cp"))
      val tot = fs.agg(sum(col("cq")).cast("long").as("tq"),
        sum(col("cp")).cast("long").as("tp"))
      val lam = fs.crossJoin(broadcast(tot))
        .select(col("f"),
          log(((col("cp") + lit(1.0)) * (col("tq") + lit(256)))
            / ((col("cq") + lit(1.0)) * (col("tp") + lit(256)))).as("l"))
      dfc.join(broadcast(lam), Seq("f"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).cast("long").as("n_bigrams"),
          round(sum(col("n") * col("l")), 6).as("dsir_weight"))
        .orderBy(col("dsir_weight").desc, col("doc_id"))
        .limit(20)
        .select(col("doc_id"), col("n_bigrams"), col("dsir_weight"))
    },

    // ---- Mann–Whitney U (Wilcoxon rank-sum) between the A/B arms —
    //      the nonparametric complement to q165's Welch t (robust to
    //      outliers / non-normal value distributions, the usual state
    //      of engagement metrics). The rank algebra is EXACT: for a
    //      tied value group of size c starting after cb4 earlier rows,
    //      2·avg_rank = 2·cb4 + c + 1 is an INTEGER, so arm A's
    //      doubled rank-sum Σ ca·(2·cb4+c+1) and the doubled statistic
    //      U2 = 2R_A − 2·n_a(n_a+1)/2 are integers both engines
    //      reproduce bit-for-bit (float average ranks could not be
    //      hash-compared). The tie-corrected normal z divides only at
    //      the very end, identical-op-order, 4-dp rounded; an empty
    //      arm or an all-tied support (σ = 0) yields NULL in both
    //      engines. Same shape as q175: one (etype, v) support agg +
    //      one O(support) window + an O(types) rollup — nothing past
    //      the first agg is corpus-sized. ----
    QueryDef.sql("q182_mannwhitney",
      s"""WITH $armedCte,
        |pts AS (SELECT etype, v,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM a GROUP BY etype, v),
        |cum AS (SELECT etype, v, ca, c,
        |    sum(c) OVER (PARTITION BY etype ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS cb4
        |  FROM pts),
        |agg AS (SELECT etype,
        |    sum(CAST(ca AS HUGEINT) * (2*cb4 + c + 1)) AS r2a,
        |    CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(c) - sum(ca) AS BIGINT) AS nb,
        |    CAST(sum(CAST(c AS HUGEINT)*c*c - c) AS BIGINT) AS tie3
        |  FROM cum GROUP BY etype)
        |SELECT etype, na AS n_a, nb AS n_b,
        |  CAST(r2a - CAST(na AS HUGEINT)*(na+1) AS BIGINT) AS u2_a,
        |  CASE WHEN na = 0 OR nb = 0 OR (na + nb) < 2
        |      OR (na + nb + 1) - CAST(tie3 AS DOUBLE)
        |        / (CAST(na + nb AS DOUBLE) * (CAST(na + nb AS DOUBLE) - 1.0)) <= 0
        |    THEN NULL
        |    ELSE round(
        |      (CAST(r2a - CAST(na AS HUGEINT)*(na+1) AS DOUBLE) / 2
        |        - CAST(na AS DOUBLE) * nb / 2)
        |      / sqrt(CAST(na AS DOUBLE) * nb / 12.0
        |        * ((na + nb + 1) - CAST(tie3 AS DOUBLE)
        |          / (CAST(na + nb AS DOUBLE) * (CAST(na + nb AS DOUBLE) - 1.0)))), 4)
        |  END AS z_stat
        |FROM agg ORDER BY etype""".stripMargin) { (s, d) =>
      val pts = armedEvents(t(s, d, "events"))
        .groupBy(col("etype"), col("v"))
        .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("ca"),
          count(lit(1)).as("c"))
      val w = Window.partitionBy(col("etype")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = pts.withColumn("cb4", sum(col("c")).over(w) - col("c"))
      // doubled rank-sum and tie cube run in DECIMAL(38,0): cb4 and c
      // are corpus-sized counts, so the products overflow long at the
      // 100 TB row counts the q175 cross-products already widen for
      val agg = cum.groupBy(col("etype"))
        .agg(sum(col("ca").cast("decimal(38,0)")
            * (lit(2) * col("cb4") + col("c") + 1)).as("r2a"),
          sum(col("ca")).cast("long").as("na"),
          (sum(col("c")) - sum(col("ca"))).cast("long").as("nb"),
          sum(col("c").cast("decimal(38,0)") * col("c") * col("c")
            - col("c")).cast("long").as("tie3"))
      val u2 = col("r2a") - col("na").cast("decimal(38,0)") * (col("na") + 1)
      val nD = (col("na") + col("nb")).cast("double")
      val tieTerm = (col("na") + col("nb") + 1).cast("double") -
        col("tie3").cast("double") / (nD * (nD - 1.0))
      // degenerate guard mirrored in the oracle: an empty arm or an
      // all-tied support leaves σ = 0 — NULL, never NaN/Inf (whose
      // textual forms differ cross-engine)
      val degenerate = col("na") === 0 || col("nb") === 0 ||
        (col("na") + col("nb")) < 2 || tieTerm <= 0
      agg.select(col("etype"), col("na").as("n_a"), col("nb").as("n_b"),
          u2.cast("long").as("u2_a"),
          when(degenerate, lit(null).cast("double"))
            .otherwise(round(
              (u2.cast("double") / 2 - col("na").cast("double") * col("nb") / 2)
                / sqrt(col("na").cast("double") * col("nb") / lit(12.0) * tieTerm),
              4))
            .as("z_stat"))
        .orderBy(col("etype"))
    },

    // ---- Deterministic Poisson bootstrap: the standard error of each
    //      event-type's mean value from B = 32 resample replicates,
    //      where event e's multiplicity in replicate b is Poisson(1)
    //      drawn via md5(event_id # b) against fixed cumulative
    //      thresholds (6-hex-char string compares — the hashBucket
    //      idiom at 24-bit depth). This is the production-shape
    //      bootstrap: no RNG state, no sampling coordination — any
    //      cluster size, any retry, and the oracle reproduce the
    //      EXACT resamples. Replicate means are integer micro values
    //      (decimal sums, integer division), the spread is the exact
    //      integer variance numerator B·Σm²−(Σm)², and the only float
    //      is the final sqrt — so the SE hash-compares at 4 dp. The
    //      32× row expansion combines map-side into O(types·B) rows;
    //      an empty replicate yields NULL mean (excluded), B<2 yields
    //      NULL SE. ----
    QueryDef.sql("q191_bootstrap_se",
      """WITH bs AS (SELECT unnest(range(32)) AS bi),
        |e AS (SELECT event_type AS etype,
        |    CAST(floor(value * 1000000) AS BIGINT) AS vm,
        |    CAST(event_id AS VARCHAR) AS eid FROM events),
        |w AS (SELECT e.etype, e.vm, bs.bi,
        |    substring(md5(e.eid || '#' || CAST(bs.bi AS VARCHAR)), 1, 6) AS h
        |  FROM e, bs),
        |k AS (SELECT etype, bi, vm,
        |    CASE WHEN h < '5e2d58' THEN 0 WHEN h < 'bc5ab1' THEN 1
        |      WHEN h < 'eb715e' THEN 2 WHEN h < 'fb2397' THEN 3
        |      WHEN h < 'ff1025' THEN 4 WHEN h < 'ffd90f' THEN 5
        |      ELSE 6 END AS wt FROM w),
        |r AS (SELECT etype, bi, sum(CAST(wt AS HUGEINT) * vm) AS s,
        |    CAST(sum(wt) AS BIGINT) AS n FROM k GROUP BY etype, bi),
        |m AS (SELECT etype, bi,
        |    CASE WHEN n = 0 THEN NULL ELSE CAST(s // n AS BIGINT) END
        |      AS mean_micro FROM r),
        |agg AS (SELECT etype, CAST(count(mean_micro) AS BIGINT) AS b,
        |    sum(CAST(mean_micro AS HUGEINT)) AS sm,
        |    sum(CAST(mean_micro AS HUGEINT) * mean_micro) AS smm
        |  FROM m GROUP BY etype),
        |f AS (SELECT event_type AS etype,
        |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS HUGEINT)
        |      // count(*) AS est, CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY event_type)
        |SELECT f.etype, f.n_events, CAST(f.est AS BIGINT) AS est_micro,
        |  a.b AS n_boot,
        |  CASE WHEN a.b < 2 THEN NULL
        |    ELSE round(sqrt(CAST(a.b * a.smm - a.sm * a.sm AS DOUBLE)
        |      / (CAST(a.b AS DOUBLE) * (a.b - 1.0))), 4) END AS se_micro
        |FROM f JOIN agg a ON a.etype = f.etype
        |ORDER BY f.etype""".stripMargin) { (s, d) =>
      val e = t(s, d, "events").select(col("event_type").as("etype"),
        floor(col("value") * 1000000).cast("long").as("vm"),
        col("event_id").cast("string").as("eid"))
      val r = e
        .withColumn("bi", explode(sequence(lit(0), lit(31))))
        .withColumn("h", substring(md5(concat(col("eid"), lit("#"),
          col("bi").cast("string")).cast("binary")), 1, 6))
        .withColumn("wt",
          when(col("h") < "5e2d58", 0L).when(col("h") < "bc5ab1", 1L)
            .when(col("h") < "eb715e", 2L).when(col("h") < "fb2397", 3L)
            .when(col("h") < "ff1025", 4L).when(col("h") < "ffd90f", 5L)
            .otherwise(6L))
        .groupBy(col("etype"), col("bi"))
        .agg(sum(col("wt").cast("decimal(38,0)") * col("vm")).as("s"),
          sum(col("wt")).cast("long").as("n"))
      val m = r.select(col("etype"),
        when(col("n") === 0, lit(null))
          .otherwise(expr("CAST(s div n AS BIGINT)")).as("mean_micro"))
      val agg = m.groupBy(col("etype"))
        .agg(count(col("mean_micro")).as("b"),
          sum(col("mean_micro").cast("decimal(38,0)")).as("sm"),
          sum(col("mean_micro").cast("decimal(38,0)") * col("mean_micro"))
            .as("smm"))
      val f = t(s, d, "events").groupBy(col("event_type").as("etype"))
        .agg(expr("""CAST(sum(CAST(floor(value * 1000000) AS BIGINT))
              |  AS DECIMAL(38,0)) div count(*)""".stripMargin).as("est"),
          count(lit(1)).as("n_events"))
      f.join(agg, "etype")
        .select(col("etype"), col("n_events"),
          col("est").cast("long").as("est_micro"), col("b").as("n_boot"),
          when(col("b") < 2, lit(null).cast("double"))
            .otherwise(round(sqrt(
              (col("b") * col("smm") - col("sm") * col("sm")).cast("double")
                / (col("b").cast("double") * (col("b") - lit(1.0)))), 4))
            .as("se_micro"))
        .orderBy(col("etype"))
    },

    // ---- Benjamini–Hochberg FDR control over a FAMILY of A/B tests —
    //      one Welch t per (event_type, hour-of-day) cell, 120
    //      simultaneous hypotheses where q165 ran one: the multiple-
    //      testing read-out every experimentation platform needs (at
    //      α=0.05, 6 of 120 null tests "discover" uncorrected; BH
    //      caps the false-discovery RATE instead). The t statistics
    //      follow q165's exact-moment discipline; the normal tail
    //      pseudo-p comes from the Zelen–Severo polynomial computed
    //      per-row in an identical operation order (multiplication
    //      chains, no pow — libm pow is not cross-engine stable; exp
    //      is the one shared libm call, the q90 ln exposure) and is
    //      immediately floored to integer nano units. The BH step-up
    //      itself is EXACT integer arithmetic: significant ⇔ rank ≤
    //      k* where k* = max{i : 20·p_nano·m ≤ i·1e9} (α = 1/20) —
    //      no float compare at the decision boundary. The ranking
    //      window runs over O(m)=tests rows, never corpus rows; the
    //      adjusted q-value is the classic suffix-min. Degenerate
    //      cells (n≤1 / zero variance) are excluded from the family
    //      before m is counted. ----
    QueryDef.sql("q192_fdr_bh",
      s"""WITH ah AS (SELECT event_type AS etype,
        |    CAST(hour(ts) AS INTEGER) AS hr,
        |    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    CAST(floor(value * 1000000) AS BIGINT) AS v FROM events),
        |g AS (SELECT etype, hr, arm, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v AS HUGEINT)) AS s1, sum(CAST(v AS HUGEINT) * v) AS s2
        |  FROM ah GROUP BY etype, hr, arm),
        |w AS (SELECT etype, hr,
        |    max(CASE WHEN arm = 'A' THEN n END) AS n_a,
        |    max(CASE WHEN arm = 'B' THEN n END) AS n_b,
        |    max(CASE WHEN arm = 'A' THEN s1 END) AS s1a,
        |    max(CASE WHEN arm = 'B' THEN s1 END) AS s1b,
        |    max(CASE WHEN arm = 'A' THEN s2 END) AS s2a,
        |    max(CASE WHEN arm = 'B' THEN s2 END) AS s2b
        |  FROM g GROUP BY etype, hr),
        |tt AS (SELECT etype, hr, n_a, n_b,
        |    (CAST(s1a AS DOUBLE) / n_a - CAST(s1b AS DOUBLE) / n_b)
        |      / sqrt(CAST(n_a * s2a - s1a * s1a AS DOUBLE)
        |          / (CAST(n_a AS DOUBLE) * (n_a - 1)) / n_a
        |        + CAST(n_b * s2b - s1b * s1b AS DOUBLE)
        |          / (CAST(n_b AS DOUBLE) * (n_b - 1)) / n_b) AS t
        |  FROM w
        |  WHERE n_a > 1 AND n_b > 1
        |    AND NOT (n_a * s2a - s1a * s1a = 0
        |      AND n_b * s2b - s1b * s1b = 0)),
        |pp AS (SELECT etype, hr, n_a, n_b, round(t, 4) AS t_stat,
        |    CAST(round(2 * ((exp(-abs(t) * abs(t) / 2) / 2.5066282746310002)
        |      * (0.319381530 * (1 / (1 + 0.2316419 * abs(t)))
        |        - 0.356563782 * ((1 / (1 + 0.2316419 * abs(t)))
        |          * (1 / (1 + 0.2316419 * abs(t))))
        |        + 1.781477937 * ((1 / (1 + 0.2316419 * abs(t)))
        |          * (1 / (1 + 0.2316419 * abs(t)))
        |          * (1 / (1 + 0.2316419 * abs(t))))
        |        - 1.821255978 * ((1 / (1 + 0.2316419 * abs(t)))
        |          * (1 / (1 + 0.2316419 * abs(t)))
        |          * (1 / (1 + 0.2316419 * abs(t)))
        |          * (1 / (1 + 0.2316419 * abs(t))))
        |        + 1.330274429 * ((1 / (1 + 0.2316419 * abs(t)))
        |          * (1 / (1 + 0.2316419 * abs(t)))
        |          * (1 / (1 + 0.2316419 * abs(t)))
        |          * (1 / (1 + 0.2316419 * abs(t)))
        |          * (1 / (1 + 0.2316419 * abs(t)))))) * 1000000000)
        |      AS BIGINT) AS p_nano
        |  FROM tt),
        |rk AS (SELECT *, CAST(row_number() OVER (ORDER BY p_nano, etype, hr)
        |      AS BIGINT) AS rank,
        |    CAST(count(*) OVER () AS BIGINT) AS m FROM pp),
        |qv AS (SELECT *,
        |    round(min(CAST(p_nano AS DOUBLE) * m / rank / 1000000000)
        |      OVER (ORDER BY rank DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |      AS q_value,
        |    max(CASE WHEN 20 * CAST(p_nano AS HUGEINT) * m
        |        <= CAST(rank AS HUGEINT) * 1000000000
        |      THEN rank ELSE 0 END) OVER () AS kstar
        |  FROM rk)
        |SELECT etype, hr, n_a, n_b, t_stat, p_nano, rank, q_value,
        |  rank <= kstar AS significant
        |FROM qv ORDER BY rank""".stripMargin) { (s, d) =>
      val g = t(s, d, "events")
        .select(col("event_type").as("etype"),
          hour(col("ts")).cast("int").as("hr"),
          when(hashBucket(col("user_id")) < "80", "A").otherwise("B")
            .as("arm"),
          floor(col("value") * 1000000).cast("long").as("v"))
        .groupBy(col("etype"), col("hr"), col("arm"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(38,0)")).as("s1"),
          sum(col("v").cast("decimal(38,0)") * col("v")).as("s2"))
      val w = g.groupBy(col("etype"), col("hr"))
        .agg(max(when(col("arm") === "A", col("n"))).as("n_a"),
          max(when(col("arm") === "B", col("n"))).as("n_b"),
          max(when(col("arm") === "A", col("s1"))).as("s1a"),
          max(when(col("arm") === "B", col("s1"))).as("s1b"),
          max(when(col("arm") === "A", col("s2"))).as("s2a"),
          max(when(col("arm") === "B", col("s2"))).as("s2b"))
      val tcol = (col("s1a").cast("double") / col("n_a") -
        col("s1b").cast("double") / col("n_b")) /
        sqrt((col("n_a") * col("s2a") - col("s1a") * col("s1a"))
            .cast("double")
            / (col("n_a").cast("double") * (col("n_a") - 1)) / col("n_a")
          + (col("n_b") * col("s2b") - col("s1b") * col("s1b"))
            .cast("double")
            / (col("n_b").cast("double") * (col("n_b") - 1)) / col("n_b"))
      val tt = w
        .filter(col("n_a") > 1 && col("n_b") > 1 &&
          !((col("n_a") * col("s2a") - col("s1a") * col("s1a")) === 0 &&
            (col("n_b") * col("s2b") - col("s1b") * col("s1b")) === 0))
        .select(col("etype"), col("hr"), col("n_a"), col("n_b"),
          tcol.as("t"))
      val t1 = lit(1) / (lit(1) + lit(0.2316419) * abs(col("t")))
      val pdf = exp(-abs(col("t")) * abs(col("t")) / 2) /
        lit(2.5066282746310002)
      val poly = lit(0.319381530) * t1 -
        lit(0.356563782) * (t1 * t1) +
        lit(1.781477937) * (t1 * t1 * t1) -
        lit(1.821255978) * (t1 * t1 * t1 * t1) +
        lit(1.330274429) * (t1 * t1 * t1 * t1 * t1)
      val pp = tt.select(col("etype"), col("hr"), col("n_a"), col("n_b"),
        round(col("t"), 4).as("t_stat"),
        round(lit(2) * (pdf * poly) * 1000000000).cast("long").as("p_nano"))
      // the family is O(tests) rows — the global rank window and the
      // suffix-min both run post-agg, never on corpus rows
      val wRank = Window.orderBy(col("p_nano"), col("etype"), col("hr"))
      val rk = pp.withColumn("rank", row_number().over(wRank).cast("long"))
        .localCheckpoint() // feeds m/kstar aggs AND the final projection
      val mAgg = rk.agg(count(lit(1)).as("m"))
      val mk = rk.crossJoin(broadcast(mAgg))
        .agg(max(col("m")).as("m"),
          max(when(lit(20) * col("p_nano").cast("decimal(38,0)") * col("m")
              <= col("rank").cast("decimal(38,0)") * 1000000000L,
            col("rank")).otherwise(0L)).as("kstar"))
      val wSuf = Window.orderBy(col("rank").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rk.crossJoin(broadcast(mk))
        .withColumn("q_value",
          round(min(col("p_nano").cast("double") * col("m") / col("rank")
            / 1000000000L).over(wSuf), 6))
        .select(col("etype"), col("hr"), col("n_a"), col("n_b"),
          col("t_stat"), col("p_nano"), col("rank"), col("q_value"),
          (col("rank") <= col("kstar")).as("significant"))
        .orderBy(col("rank"))
    },

    // ---- Deterministic permutation test: the assumption-free twin of
    //      q192's parametric p (a Welch t trusts the normal tail; a
    //      permutation test asks the DATA how often a label shuffle
    //      beats the observed split). 64 user-level re-labelings drawn
    //      via md5(user#p) — the q191 discipline: no RNG state, any
    //      cluster size / retry / the oracle reproduce the EXACT
    //      permutations, and re-labeling the USER (not the event)
    //      preserves the within-user correlation the real assignment
    //      has. The statistic is the absolute difference of integer-
    //      micro means (decimal sums, integer div — NO float anywhere,
    //      so the ≥ comparisons at the p-value boundary are exact);
    //      p = (1 + #{perm ≥ obs}) / 65, the add-one form that never
    //      returns 0. The 64× expansion combines map-side into
    //      O(types·64) rows; an empty arm yields NULL stat (a NULL
    //      comparison counts 0; a NULL observed stat yields NULL p —
    //      DegenerateInputSpec). ----
    QueryDef.sql("q197_permutation_test",
      """WITH e AS (SELECT event_type AS etype, user_id,
        |    CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events),
        |obs AS (SELECT etype,
        |    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
        |      THEN 'A' ELSE 'B' END AS arm, vm FROM e),
        |og AS (SELECT etype,
        |    CAST(count(CASE WHEN arm = 'A' THEN 1 END) AS BIGINT) AS n_a,
        |    CAST(count(CASE WHEN arm = 'B' THEN 1 END) AS BIGINT) AS n_b,
        |    sum(CASE WHEN arm = 'A' THEN CAST(vm AS HUGEINT) ELSE 0 END)
        |      AS sa,
        |    sum(CASE WHEN arm = 'B' THEN CAST(vm AS HUGEINT) ELSE 0 END)
        |      AS sb
        |  FROM obs GROUP BY etype),
        |ostat AS (SELECT etype, n_a, n_b,
        |    CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
        |      ELSE abs(CAST(sa // n_a - sb // n_b AS BIGINT)) END
        |      AS obs_stat FROM og),
        |perms AS (SELECT unnest(range(64)) AS p),
        |pa AS (SELECT e.etype, perms.p,
        |    CAST(count(CASE WHEN substring(md5(CAST(e.user_id AS VARCHAR)
        |        || '#' || CAST(perms.p AS VARCHAR)), 1, 2) < '80'
        |      THEN 1 END) AS BIGINT) AS na,
        |    CAST(count(CASE WHEN substring(md5(CAST(e.user_id AS VARCHAR)
        |        || '#' || CAST(perms.p AS VARCHAR)), 1, 2) >= '80'
        |      THEN 1 END) AS BIGINT) AS nb,
        |    sum(CASE WHEN substring(md5(CAST(e.user_id AS VARCHAR)
        |        || '#' || CAST(perms.p AS VARCHAR)), 1, 2) < '80'
        |      THEN CAST(e.vm AS HUGEINT) ELSE 0 END) AS sa,
        |    sum(CASE WHEN substring(md5(CAST(e.user_id AS VARCHAR)
        |        || '#' || CAST(perms.p AS VARCHAR)), 1, 2) >= '80'
        |      THEN CAST(e.vm AS HUGEINT) ELSE 0 END) AS sb
        |  FROM e, perms GROUP BY e.etype, perms.p),
        |ps AS (SELECT etype, p,
        |    CASE WHEN na = 0 OR nb = 0 THEN NULL
        |      ELSE abs(CAST(sa // na - sb // nb AS BIGINT)) END AS stat
        |  FROM pa),
        |cnt AS (SELECT ps.etype,
        |    CAST(sum(CASE WHEN ps.stat >= o.obs_stat THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ge
        |  FROM ps JOIN ostat o ON o.etype = ps.etype GROUP BY ps.etype)
        |SELECT o.etype, o.n_a, o.n_b, o.obs_stat,
        |  CASE WHEN o.obs_stat IS NULL THEN NULL
        |    ELSE round((1.0 + cnt.ge) / 65.0, 6) END AS p_value
        |FROM ostat o JOIN cnt ON cnt.etype = o.etype
        |ORDER BY o.etype""".stripMargin) { (s, d) =>
      val e = t(s, d, "events").select(col("event_type").as("etype"),
        col("user_id"), floor(col("value") * 1000000).cast("long").as("vm"))
      // Every (re-)labeling is USER-level — md5(user) for the observed
      // split, md5(user#p) for permutation p — so all events of one
      // (etype, user) always land in the same arm together. Aggregate
      // per (etype, user) FIRST (guide §2.3: aggregate before you
      // shuffle), then label the ~13x smaller per-user table: the ×64
      // explode and its md5 run over O(etypes·users) rows instead of
      // O(events) rows, and count/sum over events = sum of per-user
      // counts/sums — bit-identical arithmetic (decimal sums commute).
      val eu = e.groupBy(col("etype"), col("user_id"))
        .agg(count(lit(1)).as("ne"),
          sum(col("vm").cast("decimal(38,0)")).as("sv"))
        .localCheckpoint() // feeds the observed split AND the 64 perms
      val og = eu
        .withColumn("isA", hashBucket(col("user_id")) < "80")
        .groupBy(col("etype"))
        .agg(sum(when(col("isA"), col("ne")).otherwise(0L)).as("n_a"),
          sum(when(!col("isA"), col("ne")).otherwise(0L)).as("n_b"),
          sum(when(col("isA"), col("sv"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("sa"),
          sum(when(!col("isA"), col("sv"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("sb"))
      val ostat = og.select(col("etype"), col("n_a"), col("n_b"),
        when(col("n_a") === 0 || col("n_b") === 0, lit(null).cast("long"))
          .otherwise(abs((expr("sa div n_a") - expr("sb div n_b"))
            .cast("long"))).as("obs_stat"))
        .localCheckpoint() // O(etypes) rows: feeds the ge-count
                           // broadcast AND the final projection
      val pa = eu
        .withColumn("p", explode(sequence(lit(0), lit(63))))
        .withColumn("isA",
          substring(md5(concat(col("user_id").cast("string"), lit("#"),
            col("p").cast("string")).cast("binary")), 1, 2) < "80")
        .groupBy(col("etype"), col("p"))
        .agg(sum(when(col("isA"), col("ne")).otherwise(0L)).as("na"),
          sum(when(!col("isA"), col("ne")).otherwise(0L)).as("nb"),
          sum(when(col("isA"), col("sv"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("sa"),
          sum(when(!col("isA"), col("sv"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("sb"))
      val ps = pa.select(col("etype"),
        when(col("na") === 0 || col("nb") === 0, lit(null).cast("long"))
          .otherwise(abs((expr("sa div na") - expr("sb div nb"))
            .cast("long"))).as("stat"))
      val cnt = ps.join(broadcast(ostat.select(col("etype"),
          col("obs_stat"))), "etype")
        .groupBy(col("etype"))
        .agg(sum(when(col("stat") >= col("obs_stat"), 1L).otherwise(0L))
          .cast("long").as("ge"))
      ostat.join(broadcast(cnt), "etype")
        .select(col("etype"), col("n_a"), col("n_b"), col("obs_stat"),
          when(col("obs_stat").isNull, lit(null).cast("double"))
            .otherwise(round((lit(1.0) + col("ge")) / 65.0, 6))
            .as("p_value"))
        .orderBy(col("etype"))
    },

    // ---- Kaplan–Meier retention curve: the product-limit estimate of
    //      "a user is still active after t hours", with users whose
    //      last event sits inside the final 24 h CENSORED (they are
    //      not churned — we just stopped looking; dropping them would
    //      bias retention down, counting them as churned would bias
    //      it up; KM is the estimator that gets this right). A user's
    //      lifetime is last−first event in whole hours (exact integer
    //      micros div). At-risk counts come from the duration SUPPORT
    //      table (O(distinct durations) post-agg rows, the q175/q193
    //      discipline, emitted standalone as q314 so any future
    //      divergence localizes to support vs fold): n_risk(t) =
    //      N − #{dur < t}. The survival product is an INTEGER
    //      FIXED-POINT LEFT FOLD over the dur-sorted step array —
    //      acc₀ = 10¹², accᵢ = accᵢ₋₁·(n_riskᵢ−dᵢ) div n_riskᵢ, every
    //      step one exact non-negative floor division, so the curve
    //      is BIT-STABLE BY CONSTRUCTION on any engine (the r10/r11
    //      lesson: first floor(ln·1e9) rode libm's 1-ulp license,
    //      then the IEEE double fold was exact per-step but its
    //      DuckDB mirror, list_reduce, folds differently across
    //      DuckDB versions — the oracle now runs the SAME integer
    //      recurrence as a recursive CTE, the q280 discipline, with
    //      a HUGEINT accumulator; Spark folds in DECIMAL(38,0)).
    //      survival_micro = acc div 10⁶: the 10¹² carry keeps the
    //      per-step floor loss below 1 output micro even after 10⁶
    //      death steps. The curve is O(distinct death durations) —
    //      array ops on one post-agg row. A step where everyone at
    //      risk dies zeroes acc exactly, forever. No deaths ⇒ empty
    //      curve (DegenerateInputSpec). The oracle's n_risk and step
    //      index come from O(k²) support self-joins, not windows —
    //      k = distinct durations, and boring correlated sums are
    //      the most version-proof SQL there is. ----
    QueryDef.sql("q198_kaplan_meier",
      """WITH RECURSIVE u AS (SELECT user_id,
        |    CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 3600000000
        |      AS BIGINT) AS dur,
        |    epoch_us(max(ts)) AS last_us FROM events GROUP BY user_id),
        |hz AS (SELECT max(last_us) AS h FROM u),
        |lab AS (SELECT u.dur,
        |    CASE WHEN u.last_us < hz.h - 86400000000 THEN 1 ELSE 0 END
        |      AS death FROM u, hz),
        |sup AS (SELECT dur, CAST(count(*) AS BIGINT) AS n_all,
        |    CAST(sum(death) AS BIGINT) AS d FROM lab GROUP BY dur),
        |dd AS (SELECT s.dur, s.d,
        |    (SELECT CAST(sum(s2.n_all) AS BIGINT) FROM sup s2
        |      WHERE s2.dur >= s.dur) AS n_risk
        |  FROM sup s WHERE s.d > 0),
        |idx AS (SELECT a.dur, a.d, a.n_risk,
        |    (SELECT CAST(count(*) AS BIGINT) FROM dd b
        |      WHERE b.dur <= a.dur) AS i
        |  FROM dd a),
        |rec AS (
        |  SELECT CAST(0 AS BIGINT) AS i,
        |    CAST(1000000000000 AS HUGEINT) AS acc
        |  UNION ALL
        |  SELECT r.i + 1, (r.acc * (x.n_risk - x.d)) // x.n_risk
        |  FROM rec r JOIN idx x ON x.i = r.i + 1)
        |SELECT x.dur AS t_hours, x.n_risk AS n_risk, x.d AS n_deaths,
        |  CAST(r.acc // 1000000 AS BIGINT) AS survival_micro
        |FROM idx x JOIN rec r ON r.i = x.i
        |ORDER BY t_hours""".stripMargin) { (s, d) =>
      // O(users) rows, checkpointed: feeds the horizon agg AND the
      // label projection, so the corpus is scanned exactly once
      val u = t(s, d, "events").groupBy(col("user_id"))
        .agg(expr("CAST((unix_micros(max(ts)) - unix_micros(min(ts)))"
          + " div 3600000000 AS BIGINT)").as("dur"),
          unix_micros(max(col("ts"))).as("last_us"))
        .localCheckpoint()
      val hz = u.agg(max(col("last_us")).as("h"))
      val sup = u.crossJoin(broadcast(hz))
        .select(col("dur"),
          when(col("last_us") < col("h") - 86400000000L, 1L).otherwise(0L)
            .as("death"))
        .groupBy(col("dur"))
        .agg(count(lit(1)).as("n_all"), sum(col("death")).cast("long").as("d"))
      val tot = sup.agg(sum(col("n_all")).cast("long").as("nu"))
      // the support table is O(distinct durations) post-agg rows — the
      // single-partition cumulative window runs there, never on users
      val wPrev = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val dd = sup.crossJoin(broadcast(tot))
        .withColumn("n_risk",
          col("nu") - coalesce(sum(col("n_all")).over(wPrev), lit(0L)))
        .filter(col("d") > 0)
      // dur is the group key ⇒ distinct ⇒ sort_array on the struct
      // (dur leads) is a TOTAL order; the prefix fold at index i is
      // the same integer recurrence the oracle's recursive CTE walks
      // — floor division per step, exact on both engines
      dd.agg(sort_array(collect_list(struct(col("dur"), col("n_risk"),
          col("d")))).as("a"))
        .select(explode(expr(
          """transform(a, (x, i) -> struct(
            |  x.dur AS t_hours, x.n_risk AS n_risk, x.d AS n_deaths,
            |  CAST(aggregate(slice(a, 1, i + 1),
            |      CAST(1000000000000 AS DECIMAL(38,0)),
            |      (acc, y) -> CAST((acc * (y.n_risk - y.d)) div y.n_risk
            |        AS DECIMAL(38,0)))
            |    div 1000000 AS BIGINT) AS survival_micro))""".stripMargin))
          .as("r"))
        .select(col("r.t_hours"), col("r.n_risk"), col("r.n_deaths"),
          col("r.survival_micro"))
        .orderBy(col("t_hours"))
    },

    // ---- Additive-smoothing rate shrinkage (empirical-Bayes-style):
    //      per-item purchase rates pulled toward the pooled rate with
    //      pseudo-count m = mean item volume — the de-noising pass a
    //      curation pipeline runs before thresholding on a per-slice
    //      rate (a 3-event item with 2 purchases is NOT a 67 % slice;
    //      shrinkage says how much of that is volume noise). All
    //      integer: pooled rate and m are exact floor divisions of
    //      corpus counts, the posterior (k·10⁶ + m·p̄)/(n + m) is one
    //      more — the shift column ranks items by how much smoothing
    //      moved them, and the count of >1 %-shifts falling with SF
    //      (90 → 61 → 9 across the test SFs) is the shrinkage story
    //      itself. One corpus (item) agg, O(items) after. ----
    QueryDef.sql("q289_rate_shrinkage",
      """WITH e AS (SELECT
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE props IS NOT NULL),
        |pi AS (SELECT item, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS k FROM e GROUP BY item),
        |gl AS (SELECT CAST(sum(k) * 1000000 // sum(n) AS BIGINT) AS pbar,
        |    CAST(sum(n) // count(*) AS BIGINT) AS m FROM pi)
        |SELECT pi.item, pi.n, pi.k,
        |  CAST(pi.k * 1000000 // pi.n AS BIGINT) AS raw_micro,
        |  CAST((pi.k * 1000000 + gl.m * gl.pbar) // (pi.n + gl.m)
        |    AS BIGINT) AS shrunk_micro,
        |  abs(CAST(pi.k * 1000000 // pi.n AS BIGINT)
        |    - CAST((pi.k * 1000000 + gl.m * gl.pbar) // (pi.n + gl.m)
        |      AS BIGINT)) AS shift_micro
        |FROM pi, gl ORDER BY pi.item""".stripMargin) { (s, d) =>
      val pi = t(s, d, "events")
        .filter(col("props").isNotNull)
        .select(get_json_object(col("props"), "$.k").cast("long")
            .as("item"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("y"))
        .groupBy(col("item"))
        .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("k"))
        .localCheckpoint() // O(items) feeds the prior agg AND the report
      val gl = pi.agg(
        expr("CAST(sum(k) * 1000000 div sum(n) AS BIGINT)").as("pbar"),
        expr("CAST(sum(n) div count(1) AS BIGINT)").as("m"))
      pi.crossJoin(broadcast(gl))
        .select(col("item"), col("n"), col("k"),
          expr("CAST(k * 1000000 div n AS BIGINT)").as("raw_micro"),
          expr("CAST((k * 1000000 + m * pbar) div (n + m) AS BIGINT)")
            .as("shrunk_micro"))
        .withColumn("shift_micro",
          abs(col("raw_micro") - col("shrunk_micro")))
        .orderBy(col("item"))
    },

    // ---- Nelson–Aalen cumulative hazard: q198's estimator twin on
    //      the SAME duration support table — Ĥ(t) = Σ_{t_i ≤ t} d_i /
    //      n_risk(t_i), the quantity whose exp(−Ĥ) approximates the
    //      KM curve but whose INCREMENTS are what hazard-based models
    //      (survival forests, proportional-hazards screening)
    //      actually consume. Unlike KM's product, the NA sum is
    //      CLOSED under integer quantization with no libm at all:
    //      each step's d·10⁶ div n_risk is one exact non-negative
    //      floor division and the cumulative sum is an integer window
    //      — bit-stable by construction (the lesson q198 had to learn
    //      the hard way, free here). Same censoring rule, same
    //      support-table scale shape: one corpus agg, O(distinct
    //      durations) rows after. No deaths ⇒ empty curve. The
    //      oracle computes n_risk and the cumulative sum as O(k²)
    //      support self-joins rather than frame windows — after the
    //      r11 driver-env hash divergence (red on a harness whose
    //      DuckDB version differs, green on 1.0.0 at both SFs), the
    //      oracle keeps only correlated integer sums, the SQL subset
    //      with no cross-version surface at all. ----
    QueryDef.sql("q285_nelson_aalen",
      """WITH u AS (SELECT user_id,
        |    CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 3600000000
        |      AS BIGINT) AS dur,
        |    epoch_us(max(ts)) AS last_us FROM events GROUP BY user_id),
        |hz AS (SELECT max(last_us) AS h FROM u),
        |lab AS (SELECT u.dur,
        |    CASE WHEN u.last_us < hz.h - 86400000000 THEN 1 ELSE 0 END
        |      AS death FROM u, hz),
        |sup AS (SELECT dur, CAST(count(*) AS BIGINT) AS n_all,
        |    CAST(sum(death) AS BIGINT) AS d FROM lab GROUP BY dur),
        |dd AS (SELECT s.dur, s.d,
        |    (SELECT CAST(sum(s2.n_all) AS BIGINT) FROM sup s2
        |      WHERE s2.dur >= s.dur) AS n_risk
        |  FROM sup s WHERE s.d > 0),
        |hq AS (SELECT dur, d, n_risk,
        |    CAST(d * 1000000 // n_risk AS BIGINT) AS hq FROM dd)
        |SELECT a.dur AS t_hours, a.n_risk AS n_risk, a.d AS n_deaths,
        |  (SELECT CAST(sum(b.hq) AS BIGINT) FROM hq b
        |    WHERE b.dur <= a.dur) AS cum_hazard_micro
        |FROM hq a ORDER BY t_hours""".stripMargin) { (s, d) =>
      val u = t(s, d, "events").groupBy(col("user_id"))
        .agg(expr("CAST((unix_micros(max(ts)) - unix_micros(min(ts)))"
          + " div 3600000000 AS BIGINT)").as("dur"),
          unix_micros(max(col("ts"))).as("last_us"))
        .localCheckpoint() // feeds the horizon agg AND the labels
      val hz = u.agg(max(col("last_us")).as("h"))
      val sup = u.crossJoin(broadcast(hz))
        .select(col("dur"),
          when(col("last_us") < col("h") - 86400000000L, 1L).otherwise(0L)
            .as("death"))
        .groupBy(col("dur"))
        .agg(count(lit(1)).as("n_all"), sum(col("death")).cast("long").as("d"))
      val tot = sup.agg(sum(col("n_all")).cast("long").as("nu"))
      val wPrev = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sup.crossJoin(broadcast(tot))
        .withColumn("n_risk",
          col("nu") - coalesce(sum(col("n_all")).over(wPrev), lit(0L)))
        .filter(col("d") > 0)
        .withColumn("hq", expr("CAST(d * 1000000 div n_risk AS BIGINT)"))
        .withColumn("cum_hazard_micro",
          sum(col("hq")).over(wCum).cast("long"))
        .select(col("dur").as("t_hours"), col("n_risk"),
          col("d").as("n_deaths"), col("cum_hazard_micro"))
        .orderBy(col("t_hours"))
    },

    // ---- Survival support table: the shared (duration, n_all,
    //      deaths, at-risk) spine q198 / q285 / q291 all fold over,
    //      emitted as its own oracle row set. This is INSTRUMENTATION
    //      with analytical value of its own (it is the life table a
    //      retention analyst reads raw), but its primary job is
    //      localization: if a survival-family hash ever diverges
    //      again in a foreign harness, this query says whether the
    //      divergence is in the support (durations / censoring /
    //      risk sets — shared) or in the downstream fold (per-query).
    //      Emits ALL durations, censored-only ones included, so the
    //      full lab → sup path is covered, not just death steps.
    //      Scale: one per-user corpus agg; O(distinct durations)
    //      after; the oracle's n_risk is an O(k²) self-join sum on
    //      the tiny support table (version-proof, no windows). ----
    QueryDef.sql("q314_survival_support",
      """WITH u AS (SELECT user_id,
        |    CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 3600000000
        |      AS BIGINT) AS dur,
        |    epoch_us(max(ts)) AS last_us FROM events GROUP BY user_id),
        |hz AS (SELECT max(last_us) AS h FROM u),
        |lab AS (SELECT u.dur,
        |    CASE WHEN u.last_us < hz.h - 86400000000 THEN 1 ELSE 0 END
        |      AS death FROM u, hz),
        |sup AS (SELECT dur, CAST(count(*) AS BIGINT) AS n_all,
        |    CAST(sum(death) AS BIGINT) AS d FROM lab GROUP BY dur)
        |SELECT s.dur AS t_hours, s.n_all AS n_all, s.d AS n_deaths,
        |  (SELECT CAST(sum(s2.n_all) AS BIGINT) FROM sup s2
        |    WHERE s2.dur >= s.dur) AS n_risk
        |FROM sup s ORDER BY t_hours""".stripMargin) { (s, d) =>
      val u = t(s, d, "events").groupBy(col("user_id"))
        .agg(expr("CAST((unix_micros(max(ts)) - unix_micros(min(ts)))"
          + " div 3600000000 AS BIGINT)").as("dur"),
          unix_micros(max(col("ts"))).as("last_us"))
        .localCheckpoint() // feeds the horizon agg AND the labels
      val hz = u.agg(max(col("last_us")).as("h"))
      val sup = u.crossJoin(broadcast(hz))
        .select(col("dur"),
          when(col("last_us") < col("h") - 86400000000L, 1L).otherwise(0L)
            .as("death"))
        .groupBy(col("dur"))
        .agg(count(lit(1)).as("n_all"), sum(col("death")).cast("long").as("d"))
      val tot = sup.agg(sum(col("n_all")).cast("long").as("nu"))
      val wPrev = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, -1)
      sup.crossJoin(broadcast(tot))
        .withColumn("n_risk",
          col("nu") - coalesce(sum(col("n_all")).over(wPrev), lit(0L)))
        .select(col("dur").as("t_hours"), col("n_all"),
          col("d").as("n_deaths"), col("n_risk"))
        .orderBy(col("t_hours"))
    },

    // ---- Benford first-digit audit: the fraud/instrumentation-bug
    //      forensic — organically-generated magnitudes follow
    //      P(d) = log10(1+1/d); a feed whose values were synthesized,
    //      truncated, or unit-mangled shows up as a fat χ² before any
    //      model ever trains on it. The first digit comes off the
    //      INTEGER micro value's string form (long→string is stable
    //      cross-engine; a double's text form is not). Each digit
    //      cell's χ² contribution is computed per-row in one fixed
    //      float op order against the shared log10 literal and
    //      immediately floored to integer micro — the per-type total
    //      is then an INTEGER window sum, so no 9-term float-add
    //      association can diverge. Zero-count digits enter through
    //      the dense digit spine (LEFT JOIN), contributing their full
    //      expected mass. O(types·9) rows past the digit count. ----
    QueryDef.sql("q200_benford_audit",
      """WITH v AS (SELECT event_type AS etype,
        |    CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events
        |  WHERE floor(value * 1000000) > 0),
        |dg AS (SELECT etype,
        |    CAST(substring(CAST(vm AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM v),
        |o AS (SELECT etype, digit, CAST(count(*) AS BIGINT) AS obs
        |  FROM dg GROUP BY etype, digit),
        |n AS (SELECT etype, CAST(sum(obs) AS BIGINT) AS n
        |  FROM o GROUP BY etype),
        |ben AS (SELECT unnest(range(1, 10)) AS digit),
        |ex AS (SELECT n.etype, ben.digit, n.n,
        |    log10(1.0 + 1.0 / ben.digit) AS p FROM n, ben),
        |j AS (SELECT ex.etype, ex.digit, COALESCE(o.obs, 0) AS obs,
        |    CAST(floor(ex.n * ex.p * 1000000) AS BIGINT) AS exp_micro,
        |    CAST(floor((COALESCE(o.obs, 0) - ex.n * ex.p)
        |      * (COALESCE(o.obs, 0) - ex.n * ex.p) / (ex.n * ex.p)
        |      * 1000000) AS BIGINT) AS contrib_micro
        |  FROM ex LEFT JOIN o ON o.etype = ex.etype AND o.digit = ex.digit)
        |SELECT etype, CAST(digit AS INTEGER) AS digit, obs, exp_micro,
        |  contrib_micro,
        |  CAST(sum(contrib_micro) OVER (PARTITION BY etype) AS BIGINT)
        |    AS chi2_micro
        |FROM j ORDER BY etype, digit""".stripMargin) { (s, d) =>
      val o = t(s, d, "events")
        .select(col("event_type").as("etype"),
          floor(col("value") * 1000000).cast("long").as("vm"))
        .filter(col("vm") > 0)
        .select(col("etype"),
          substring(col("vm").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("etype"), col("digit"))
        .agg(count(lit(1)).as("obs"))
      benfordTail(o)
    },

    // ---- Neyman allocation: design the stratified eval sample that
    //      minimizes the variance of the estimated mean — n_h ∝
    //      N_h·S_h, so big AND noisy strata get the budget (equal or
    //      proportional allocation wastes draws on homogeneous feeds).
    //      The weight is one sqrt of an exact integer:
    //      N_h·S_h = sqrt(N_h·Σx² − (Σx)²) — moments ride
    //      DECIMAL(38,0), and IEEE sqrt is CORRECTLY ROUNDED (unlike
    //      ln/exp), so floor(sqrt(·)) is bit-identical cross-engine.
    //      The B=10 000 budget then apportions by LARGEST REMAINDER:
    //      base = B·w div W, the B−Σbase leftovers go to the largest
    //      remainders (rank window over O(strata) rows, source
    //      tie-break) — Σ alloc = B EXACTLY, no float rounding can
    //      leak a unit. All-zero weights (every stratum variance-free)
    //      degenerate to PROPORTIONAL allocation — Neyman's own limit
    //      at equal variances, and the divisor stays nonzero. Output
    //      is all integers. ----
    QueryDef.sql("q202_neyman_allocation",
      """WITH st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_pop,
        |    sum(CAST(n_chars AS HUGEINT)) AS sx,
        |    sum(CAST(n_chars AS HUGEINT) * n_chars) AS sxx
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, n_pop,
        |    CAST(floor(sqrt(CAST(n_pop * sxx - sx * sx AS DOUBLE)))
        |      AS BIGINT) AS wgt FROM st),
        |tw AS (SELECT CAST(sum(wgt) AS BIGINT) AS tot,
        |    CAST(sum(n_pop) AS BIGINT) AS totn FROM w),
        |eff AS (SELECT w.source, w.n_pop, w.wgt,
        |    CASE WHEN tw.tot = 0 THEN w.n_pop ELSE w.wgt END AS we,
        |    CASE WHEN tw.tot = 0 THEN tw.totn ELSE tw.tot END AS te
        |  FROM w, tw),
        |base AS (SELECT source, n_pop, wgt,
        |    CAST(10000 * CAST(we AS HUGEINT) // te AS BIGINT) AS alloc0,
        |    CAST(10000 * CAST(we AS HUGEINT) % te AS BIGINT) AS rem
        |  FROM eff),
        |lo AS (SELECT CAST(10000 - sum(alloc0) AS BIGINT) AS left_over
        |  FROM base),
        |rk AS (SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source)
        |    AS BIGINT) AS rr FROM base)
        |SELECT rk.source, rk.n_pop, rk.wgt,
        |  CAST(rk.alloc0 + CASE WHEN rk.rr <= lo.left_over THEN 1 ELSE 0 END
        |    AS BIGINT) AS alloc
        |FROM rk, lo ORDER BY rk.source""".stripMargin) { (s, d) =>
      val w = t(s, d, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_pop"),
          sum(col("n_chars").cast("decimal(38,0)")).as("sx"),
          sum(col("n_chars").cast("decimal(38,0)") * col("n_chars"))
            .as("sxx"))
        .select(col("source"), col("n_pop"),
          floor(sqrt((col("n_pop") * col("sxx") - col("sx") * col("sx"))
            .cast("double"))).cast("long").as("wgt"))
      val tw = w.agg(sum(col("wgt")).cast("long").as("tot"),
        sum(col("n_pop")).cast("long").as("totn"))
      // all-zero weights (every stratum variance-free) degenerate
      // Neyman to PROPORTIONAL allocation — the mathematically right
      // fallback, and it keeps the divisor nonzero on both engines
      val base = w.crossJoin(broadcast(tw))
        .withColumn("we", when(col("tot") === 0, col("n_pop"))
          .otherwise(col("wgt")))
        .withColumn("te", when(col("tot") === 0, col("totn"))
          .otherwise(col("tot")))
        .select(col("source"), col("n_pop"), col("wgt"),
          expr("CAST((10000 * CAST(we AS DECIMAL(38,0))) div te AS BIGINT)")
            .as("alloc0"),
          expr("CAST((10000 * CAST(we AS DECIMAL(38,0))) % te AS BIGINT)")
            .as("rem"))
        .localCheckpoint() // O(strata) rows feed the leftover agg + rank
      val lo = base.agg((lit(10000L) - sum(col("alloc0"))).cast("long")
        .as("left_over"))
      val rk = base.withColumn("rr",
        row_number().over(Window.orderBy(col("rem").desc, col("source")))
          .cast("long"))
      rk.crossJoin(broadcast(lo))
        .select(col("source"), col("n_pop"), col("wgt"),
          (col("alloc0") + when(col("rr") <= col("left_over"), 1L)
            .otherwise(0L)).cast("long").as("alloc"))
        .orderBy(col("source"))
    },

    // ---- Trimmed + winsorized means: the robust per-type location
    //      estimates a value column with fat tails needs (q203's raw
    //      mean sits ~10% above its 5%-trimmed twin on this corpus —
    //      exactly the gap outliers carve). All EXACT integers via the
    //      value SUPPORT table: per (type, value) counts carry
    //      [lo, hi] rank ranges from one cumulative window, the kept
    //      mass per value is interval arithmetic
    //      max(0, min(hi, n−k) − max(lo, k+1) + 1), and the two
    //      winsor boundary values are the rows whose rank range covers
    //      k+1 / n−k — no per-row sort-and-slice of N values, and the
    //      windows PARTITION BY type (parallel across types; within a
    //      type the support is O(distinct micro values) — for a
    //      genuinely continuous column at extreme scale, pair with
    //      q65's approx thresholds). k = n div 20 per tail; n=1 ⇒
    //      k=0 ⇒ all three means coincide (no guard needed — the
    //      kept interval is never empty). ----
    QueryDef.sql("q203_trimmed_winsor_mean",
      """WITH v AS (SELECT event_type AS etype,
        |    CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events),
        |sup AS (SELECT etype, vm, CAST(count(*) AS BIGINT) AS c
        |  FROM v GROUP BY etype, vm),
        |cum AS (SELECT etype, vm, c,
        |    sum(c) OVER (PARTITION BY etype ORDER BY vm
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
        |    sum(c) OVER (PARTITION BY etype ORDER BY vm
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c + 1
        |      AS lo
        |  FROM sup),
        |nn AS (SELECT etype, CAST(sum(c) AS BIGINT) AS n,
        |    sum(CAST(vm AS HUGEINT) * c) AS s FROM sup GROUP BY etype),
        |kk AS (SELECT etype, n, s, n // 20 AS k FROM nn),
        |kept AS (SELECT c.etype, kk.n, kk.k, kk.s,
        |    greatest(0, least(c.hi, kk.n - kk.k)
        |      - greatest(c.lo, kk.k + 1) + 1) AS nc, c.vm
        |  FROM cum c JOIN kk ON kk.etype = c.etype),
        |tr AS (SELECT etype, max(n) AS n, max(k) AS k, max(s) AS s,
        |    sum(CAST(vm AS HUGEINT) * nc) AS ts,
        |    CAST(sum(nc) AS BIGINT) AS tn
        |  FROM kept GROUP BY etype),
        |blo AS (SELECT c.etype, c.vm AS v_lo
        |  FROM cum c JOIN kk ON kk.etype = c.etype
        |  WHERE kk.k + 1 BETWEEN c.lo AND c.hi),
        |bhi AS (SELECT c.etype, c.vm AS v_hi
        |  FROM cum c JOIN kk ON kk.etype = c.etype
        |  WHERE kk.n - kk.k BETWEEN c.lo AND c.hi)
        |SELECT tr.etype, tr.n, tr.k,
        |  CAST(CAST(tr.s AS HUGEINT) // tr.n AS BIGINT) AS mean_micro,
        |  CAST(tr.ts // tr.tn AS BIGINT) AS trimmed_mean_micro,
        |  CAST((tr.ts + CAST(tr.k AS HUGEINT) * blo.v_lo
        |    + CAST(tr.k AS HUGEINT) * bhi.v_hi) // tr.n AS BIGINT)
        |    AS winsor_mean_micro
        |FROM tr JOIN blo ON blo.etype = tr.etype
        |JOIN bhi ON bhi.etype = tr.etype
        |ORDER BY tr.etype""".stripMargin) { (s, d) =>
      val sup = t(s, d, "events")
        .select(col("event_type").as("etype"),
          floor(col("value") * 1000000).cast("long").as("vm"))
        .groupBy(col("etype"), col("vm"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // O(types·distinct values) rows feed all legs
      val wCum = Window.partitionBy(col("etype")).orderBy(col("vm"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = sup
        .withColumn("hi", sum(col("c")).over(wCum))
        .withColumn("lo", sum(col("c")).over(wCum) - col("c") + 1)
      val kk = sup.groupBy(col("etype"))
        .agg(sum(col("c")).cast("long").as("n"),
          sum(col("vm").cast("decimal(38,0)") * col("c")).as("s"))
        .withColumn("k", expr("n div 20"))
      val kept = cum.join(broadcast(kk), "etype")
        .select(col("etype"), col("n"), col("k"), col("s"), col("vm"),
          greatest(lit(0L), least(col("hi"), col("n") - col("k"))
            - greatest(col("lo"), col("k") + 1) + 1).as("nc"))
      val tr = kept.groupBy(col("etype"))
        .agg(max(col("n")).as("n"), max(col("k")).as("k"),
          max(col("s")).as("s"),
          sum(col("vm").cast("decimal(38,0)") * col("nc")).as("ts"),
          sum(col("nc")).cast("long").as("tn"))
      val blo = cum.join(broadcast(kk), "etype")
        .filter(col("k") + 1 >= col("lo") && col("k") + 1 <= col("hi"))
        .select(col("etype"), col("vm").as("v_lo"))
      val bhi = cum.join(broadcast(kk), "etype")
        .filter(col("n") - col("k") >= col("lo")
          && col("n") - col("k") <= col("hi"))
        .select(col("etype"), col("vm").as("v_hi"))
      tr.join(broadcast(blo), "etype").join(broadcast(bhi), "etype")
        .select(col("etype"), col("n"), col("k"),
          expr("CAST(s div n AS BIGINT)").as("mean_micro"),
          expr("CAST(ts div tn AS BIGINT)").as("trimmed_mean_micro"),
          expr("""CAST((ts + CAST(k AS DECIMAL(38,0)) * v_lo
            |  + CAST(k AS DECIMAL(38,0)) * v_hi) div n AS BIGINT)"""
            .stripMargin).as("winsor_mean_micro"))
        .orderBy(col("etype"))
    },

    // ---- Wald–Wolfowitz runs test of the q100 training shuffle: does
    //      the deterministic permutation actually MIX the sources, or
    //      do same-feed documents still clump (curriculum-poisoning a
    //      run that assumes i.i.d. batches)? The statistic is the run
    //      count R = 1 + #{adjacent pairs that differ}; under a random
    //      order E[R] = n+1 − Σn_i²/n — mix_ratio = R/E[R] ≈ 1
    //      certifies the shuffle (this corpus: 0.9979). EXACT integer
    //      arithmetic throughout (the ratio lands in micro). The
    //      adjacency scan never builds a global order: within-bucket
    //      neighbours come from 256 PARALLEL md5-prefix windows (the
    //      q100/q63 two-level discipline) and the 255 bucket seams are
    //      stitched from O(buckets) first/last rows. ----
    QueryDef.sql("q209_shuffle_runs_test",
      """WITH r AS (SELECT doc_id, source,
        |    row_number() OVER (ORDER BY md5('42:' || CAST(doc_id AS
        |      VARCHAR)), doc_id) AS pos FROM documents),
        |lg AS (SELECT source, lag(source) OVER (ORDER BY pos) AS prev
        |  FROM r),
        |adj AS (SELECT CAST(sum(CASE WHEN source <> prev THEN 1 ELSE 0
        |    END) AS BIGINT) AS diffs FROM lg),
        |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS c
        |  FROM r GROUP BY source),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sources FROM cnt),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    sum(CAST(c AS HUGEINT) * c) AS s2 FROM cnt)
        |SELECT tot.n, ns.n_sources, 1 + adj.diffs AS n_runs,
        |  CAST(((CAST(tot.n AS HUGEINT) + 1) * tot.n - tot.s2) * 1000000
        |    // tot.n AS BIGINT) AS expected_runs_micro,
        |  CASE WHEN (CAST(tot.n AS HUGEINT) + 1) * tot.n - tot.s2 = 0
        |    THEN NULL
        |    ELSE CAST(CAST(1 + adj.diffs AS HUGEINT) * tot.n * 1000000
        |      // ((CAST(tot.n AS HUGEINT) + 1) * tot.n - tot.s2)
        |      AS BIGINT) END AS mix_ratio_micro
        |FROM tot, ns, adj""".stripMargin) { (s, d) =>
      val keyed = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          md5(concat(lit("42:"), col("doc_id").cast("string"))).as("k"))
        .withColumn("pid",
          conv(substring(col("k"), 1, 2), 16, 10).cast("int"))
        .localCheckpoint() // feeds the window scan, seams, and counts
      val wIn = Window.partitionBy(col("pid"))
        .orderBy(col("k"), col("doc_id"))
      val diffsIn = keyed
        .withColumn("nxt", lead(col("source"), 1).over(wIn))
        .agg(sum(when(col("nxt").isNotNull && col("nxt") =!= col("source"),
          1L).otherwise(0L)).cast("long").as("din"))
      // bucket seams: O(buckets) rows, stitched in pid order (the hex
      // prefix IS the key order, so pid order = global key order)
      val bounds = keyed.groupBy(col("pid"))
        .agg(expr("min_by(source, struct(k, doc_id))").as("fsrc"),
          expr("max_by(source, struct(k, doc_id))").as("lsrc"))
      val wB = Window.orderBy(col("pid"))
      val diffsB = bounds
        .withColumn("prev", lag(col("lsrc"), 1).over(wB))
        .agg(sum(when(col("prev").isNotNull && col("fsrc") =!= col("prev"),
          1L).otherwise(0L)).cast("long").as("dbd"))
      val cnt = keyed.groupBy(col("source")).agg(count(lit(1)).as("c"))
      val ns = cnt.agg(count(lit(1)).as("n_sources"))
      val tot = cnt.agg(sum(col("c")).cast("long").as("n"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("s2"))
      tot.crossJoin(broadcast(ns)).crossJoin(broadcast(diffsIn))
        .crossJoin(broadcast(diffsB))
        .withColumn("runs", lit(1L) + col("din") + col("dbd"))
        .select(col("n"), col("n_sources"), col("runs").as("n_runs"),
          expr("""CAST((((CAST(n AS DECIMAL(38,0)) + 1) * n - s2)
            |  * 1000000) div n AS BIGINT)""".stripMargin)
            .as("expected_runs_micro"),
          when(expr("(CAST(n AS DECIMAL(38,0)) + 1) * n - s2") === 0,
            lit(null).cast("long"))
            .otherwise(expr("""CAST((CAST(runs AS DECIMAL(38,0)) * n
              |  * 1000000) div ((CAST(n AS DECIMAL(38,0)) + 1) * n - s2)
              |  AS BIGINT)""".stripMargin)).as("mix_ratio_micro"))
    },

    // ---- CUPED variance reduction: adjust each user's outcome by
    //      their PRE-period activity — Y' = Y − θ·X with θ =
    //      cov(X,Y)/var(X) — the standard trick that shrinks A/B
    //      confidence intervals for free (the pre-period is already
    //      logged). Pre = days 1–15, outcome = days 16–30, both
    //      integer micro sums per user. θ lands in integer micro by
    //      one exact division of DECIMAL(38,0) moments; each user's
    //      adjustment is then an integer div — no float anywhere, so
    //      arm means and the within-arm sum-of-squares ratio (the
    //      reported variance reduction) hash exactly. Zero pre-period
    //      variance degenerates θ to 0 — CUPED's own no-op limit, the
    //      q202 fallback discipline (adjusted ≡ raw, reduction 0, no
    //      division error). ----
    QueryDef.sql("q214_cuped_adjustment",
      """WITH u AS (SELECT user_id,
        |    CAST(sum(CASE WHEN day(ts) <= 15 THEN
        |      CAST(floor(value * 1000000) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN day(ts) > 15 THEN
        |      CAST(floor(value * 1000000) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS y,
        |    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 2)
        |      < '80' THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM u),
        |th AS (SELECT n, CASE WHEN n * sxx - sx * sx = 0 THEN 0
        |    ELSE CAST((n * sxy - sx * sy) * 1000000
        |      // (n * sxx - sx * sx) AS BIGINT) END AS theta_micro
        |  FROM mo),
        |adj AS (SELECT u.arm, u.y,
        |    u.y - CAST(th.theta_micro AS HUGEINT) * u.x // 1000000 AS yp
        |  FROM u, th),
        |am AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(y AS HUGEINT)) AS sy, sum(CAST(yp AS HUGEINT)) AS syp,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(yp AS HUGEINT) * yp) AS sypp
        |  FROM adj GROUP BY arm),
        |w AS (SELECT max(CASE WHEN arm = 'A' THEN n END) AS na,
        |    max(CASE WHEN arm = 'B' THEN n END) AS nb,
        |    max(CASE WHEN arm = 'A' THEN sy END) AS sya,
        |    max(CASE WHEN arm = 'B' THEN sy END) AS syb,
        |    max(CASE WHEN arm = 'A' THEN syp END) AS sypa,
        |    max(CASE WHEN arm = 'B' THEN syp END) AS sypb FROM am),
        |vv AS (SELECT
        |    CAST(sum(CAST(n AS HUGEINT) * syy)
        |      - sum(CAST(sy AS HUGEINT) * sy) AS HUGEINT) AS vy,
        |    CAST(sum(CAST(n AS HUGEINT) * sypp)
        |      - sum(CAST(syp AS HUGEINT) * syp) AS HUGEINT) AS vyp
        |  FROM am)
        |SELECT th.n AS n_users, th.theta_micro,
        |  CASE WHEN w.na IS NULL OR w.nb IS NULL OR w.na = 0 OR w.nb = 0
        |    THEN NULL
        |    ELSE CAST(w.sya // w.na - w.syb // w.nb AS BIGINT) END
        |    AS diff_raw_micro,
        |  CASE WHEN w.na IS NULL OR w.nb IS NULL OR w.na = 0 OR w.nb = 0
        |    THEN NULL
        |    ELSE CAST(w.sypa // w.na - w.sypb // w.nb AS BIGINT) END
        |    AS diff_cuped_micro,
        |  CASE WHEN vv.vy = 0 THEN NULL
        |    ELSE CAST(1000000 - vv.vyp * 1000000 // vv.vy AS BIGINT) END
        |    AS var_reduction_micro
        |FROM th, w, vv""".stripMargin) { (s, d) =>
      val u = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(sum(when(dayofmonth(col("ts")) <= 15,
            floor(col("value") * 1000000).cast("long")).otherwise(0L))
            .cast("long").as("x"),
          sum(when(dayofmonth(col("ts")) > 15,
            floor(col("value") * 1000000).cast("long")).otherwise(0L))
            .cast("long").as("y"))
        .withColumn("arm",
          when(hashBucket(col("user_id")) < "80", "A").otherwise("B"))
        .localCheckpoint() // O(users) rows feed θ, the adjust, and arms
      val mo = u.agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
      val th = mo.select(col("n"),
        when(col("n") * col("sxx") - col("sx") * col("sx") === 0, 0L)
          .otherwise(expr("""CAST(((n * sxy - sx * sy) * 1000000)
            |  div (n * sxx - sx * sx) AS BIGINT)""".stripMargin))
          .as("theta_micro"))
      val adj = u.crossJoin(broadcast(th))
        .select(col("arm"), col("y"),
          (col("y") - expr("""CAST((CAST(theta_micro AS DECIMAL(38,0))
            |  * x) div 1000000 AS BIGINT)""".stripMargin)).as("yp"))
      val am = adj.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(col("yp").cast("decimal(38,0)")).as("syp"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"),
          sum(col("yp").cast("decimal(38,0)") * col("yp")).as("sypp"))
        .localCheckpoint() // 2 rows feed the pivot and the SS ratio
      val w = am.agg(max(when(col("arm") === "A", col("n"))).as("na"),
        max(when(col("arm") === "B", col("n"))).as("nb"),
        max(when(col("arm") === "A", col("sy"))).as("sya"),
        max(when(col("arm") === "B", col("sy"))).as("syb"),
        max(when(col("arm") === "A", col("syp"))).as("sypa"),
        max(when(col("arm") === "B", col("syp"))).as("sypb"))
      val vv = am.agg(
        (sum(col("n").cast("decimal(38,0)") * col("syy"))
          - sum(col("sy") * col("sy"))).as("vy"),
        (sum(col("n").cast("decimal(38,0)") * col("sypp"))
          - sum(col("syp") * col("syp"))).as("vyp"))
      th.crossJoin(broadcast(w)).crossJoin(broadcast(vv))
        .select(col("n").as("n_users"), col("theta_micro"),
          when(col("na").isNull || col("nb").isNull || col("na") === 0
            || col("nb") === 0, lit(null).cast("long"))
            .otherwise(expr("CAST(sya div na - syb div nb AS BIGINT)"))
            .as("diff_raw_micro"),
          when(col("na").isNull || col("nb").isNull || col("na") === 0
            || col("nb") === 0, lit(null).cast("long"))
            .otherwise(expr("CAST(sypa div na - sypb div nb AS BIGINT)"))
            .as("diff_cuped_micro"),
          when(col("vy") === 0, lit(null).cast("long"))
            .otherwise(expr("""CAST(1000000 - (vyp * 1000000) div vy
              |  AS BIGINT)""".stripMargin)).as("var_reduction_micro"))
    },

    // ---- Power planning per event type: the minimum detectable
    //      effect at the CURRENT arm sizes (α = .05 two-sided, 80%
    //      power) and the per-arm n a 1%-of-mean lift would need —
    //      the two numbers that decide whether an experiment is worth
    //      launching. Moments are exact integers; the z constants are
    //      SHARED double literals, and MDE/n_req are computed per-row
    //      in one fixed float op order (sqrt is correctly rounded, so
    //      even it is bit-stable), rounded 4 dp. Degenerate cells —
    //      an empty arm, a single row, a zero mean — return NULL, not
    //      an error (DegenerateInputSpec). ----
    QueryDef.sql("q218_power_planning",
      """WITH e AS (SELECT event_type AS etype,
        |    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 2)
        |      < '80' THEN 'A' ELSE 'B' END AS arm,
        |    CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events),
        |g AS (SELECT etype, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN arm = 'A' THEN 1 END) AS BIGINT) AS na,
        |    CAST(count(CASE WHEN arm = 'B' THEN 1 END) AS BIGINT) AS nb,
        |    sum(CAST(vm AS HUGEINT)) AS s1,
        |    sum(CAST(vm AS HUGEINT) * vm) AS s2
        |  FROM e GROUP BY etype)
        |SELECT etype, na, nb,
        |  CAST(CAST(s1 AS HUGEINT) // n AS BIGINT) AS mean_micro,
        |  CASE WHEN na = 0 OR nb = 0 OR n <= 1 THEN NULL
        |    ELSE round((1.959963984540054 + 0.8416212335729143)
        |      * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / n / n
        |        * (1.0 / na + 1.0 / nb)), 4) END AS mde_micro,
        |  CASE WHEN s1 = 0 OR n <= 1 THEN NULL
        |    ELSE round(2 * (1.959963984540054 + 0.8416212335729143)
        |      * (1.959963984540054 + 0.8416212335729143)
        |      * (CAST(n * s2 - s1 * s1 AS DOUBLE) / n / n)
        |      / ((CAST(s1 AS DOUBLE) / n / 100)
        |        * (CAST(s1 AS DOUBLE) / n / 100)), 4) END
        |    AS n_req_per_arm
        |FROM g ORDER BY etype""".stripMargin) { (s, d) =>
      val zsum = lit(1.959963984540054) + lit(0.8416212335729143)
      val g = t(s, d, "events")
        .select(col("event_type").as("etype"),
          when(hashBucket(col("user_id")) < "80", "A").otherwise("B")
            .as("arm"),
          floor(col("value") * 1000000).cast("long").as("vm"))
        .groupBy(col("etype"))
        .agg(count(lit(1)).as("n"),
          count(when(col("arm") === "A", 1)).as("na"),
          count(when(col("arm") === "B", 1)).as("nb"),
          sum(col("vm").cast("decimal(38,0)")).as("s1"),
          sum(col("vm").cast("decimal(38,0)") * col("vm")).as("s2"))
      val varPop = (col("n") * col("s2") - col("s1") * col("s1"))
        .cast("double") / col("n") / col("n")
      val mean = col("s1").cast("double") / col("n")
      g.select(col("etype"), col("na"), col("nb"),
          expr("CAST(s1 div n AS BIGINT)").as("mean_micro"),
          when(col("na") === 0 || col("nb") === 0 || col("n") <= 1,
            lit(null).cast("double"))
            .otherwise(round(zsum * sqrt(varPop
              * (lit(1.0) / col("na") + lit(1.0) / col("nb"))), 4))
            .as("mde_micro"),
          when(col("s1") === 0 || col("n") <= 1,
            lit(null).cast("double"))
            .otherwise(round(lit(2) * zsum * zsum * varPop
              / ((mean / 100) * (mean / 100)), 4)).as("n_req_per_arm"))
        .orderBy(col("etype"))
    },

    // ---- User-cohort overlap between event types: exact Jaccard of
    //      the USER sets behind each pair of event types — the "are
    //      clickers also buyers" audience matrix (feature-correlation
    //      at the audience level; q189 does the same algebra over
    //      source token sets, this over behavior cohorts). Exact set
    //      algebra off ONE (user, type) distinct: intersections from
    //      a user-keyed self-join, union by inclusion–exclusion
    //      (never materialized), Jaccard in integer micro. A type
    //      seen by k users costs k·(k−1)/2... no — a USER with k
    //      types costs k·(k−1)/2 pair rows, bounded by types², so
    //      the self-join fan-out is CONSTANT per user. ----
    QueryDef.sql("q221_audience_overlap",
      """WITH ut AS (SELECT DISTINCT user_id, event_type AS etype
        |  FROM events),
        |nt AS (SELECT etype, CAST(count(*) AS BIGINT) AS nu
        |  FROM ut GROUP BY etype),
        |ix AS (SELECT a.etype AS t1, b.etype AS t2,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM ut a JOIN ut b ON b.user_id = a.user_id
        |    AND a.etype < b.etype
        |  GROUP BY a.etype, b.etype)
        |SELECT ix.t1, ix.t2, na.nu AS n1, nb.nu AS n2, ix.c AS n_common,
        |  CAST(CAST(ix.c AS HUGEINT) * 1000000 // (na.nu + nb.nu - ix.c)
        |    AS BIGINT) AS jaccard_micro
        |FROM ix JOIN nt na ON na.etype = ix.t1
        |JOIN nt nb ON nb.etype = ix.t2
        |ORDER BY ix.t1, ix.t2""".stripMargin) { (s, d) =>
      val ut = t(s, d, "events")
        .select(col("user_id"), col("event_type").as("etype")).distinct()
        .localCheckpoint() // feeds sizes and both self-join legs
      val nt = ut.groupBy(col("etype")).agg(count(lit(1)).as("nu"))
      val ix = ut.as("a")
        .join(ut.as("b"),
          col("b.user_id") === col("a.user_id")
            && col("a.etype") < col("b.etype"))
        .groupBy(col("a.etype").as("t1"), col("b.etype").as("t2"))
        .agg(count(lit(1)).as("c"))
      ix
        .join(broadcast(nt.select(col("etype").as("t1"),
          col("nu").as("n1"))), "t1")
        .join(broadcast(nt.select(col("etype").as("t2"),
          col("nu").as("n2"))), "t2")
        .select(col("t1"), col("t2"), col("n1"), col("n2"),
          col("c").as("n_common"),
          expr("""CAST((CAST(c AS DECIMAL(38,0)) * 1000000)
            |  div (n1 + n2 - c) AS BIGINT)""".stripMargin)
            .as("jaccard_micro"))
        .orderBy(col("t1"), col("t2"))
    },

    // ---- User specialization profile: each user's event-type-mix
    //      Shannon entropy (0 = single-purpose, ln 5 ≈ 1.609 = even
    //      generalist), profiled by how many types the user touches —
    //      the segmentation readout that decides whether per-type
    //      personalization is worth anything. Per-user entropies are
    //      exact integer micro (q190's quantized-ln on exact counts,
    //      one integer div per user); the profile aggregates them by
    //      type-count k with integer min/mean/max. Per-row work is
    //      one ln per (user, type) cell; everything downstream is
    //      O(users) then O(k) rows. ----
    QueryDef.sql("q222_user_entropy_profile",
      """WITH uc AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT)
        |    AS c FROM events GROUP BY user_id, event_type),
        |un AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k FROM uc GROUP BY user_id),
        |he AS (SELECT uc.user_id, un.k,
        |    CAST(sum(CAST(uc.c AS HUGEINT) *
        |      CAST(round(ln(CAST(un.n AS DOUBLE) / uc.c) * 1000000)
        |        AS BIGINT)) // un.n AS BIGINT) AS h_micro
        |  FROM uc JOIN un ON un.user_id = uc.user_id
        |  GROUP BY uc.user_id, un.k, un.n)
        |SELECT k AS n_types, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(CAST(sum(h_micro) AS HUGEINT) // count(*) AS BIGINT)
        |    AS mean_entropy_micro,
        |  CAST(min(h_micro) AS BIGINT) AS min_entropy_micro,
        |  CAST(max(h_micro) AS BIGINT) AS max_entropy_micro
        |FROM he GROUP BY k ORDER BY k""".stripMargin) { (s, d) =>
      val uc = t(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // O(users·types) cells feed sizes + entropy
      val un = uc.groupBy(col("user_id"))
        .agg(sum(col("c")).cast("long").as("n"), count(lit(1)).as("k"))
      val he = uc.join(un, "user_id")
        .groupBy(col("user_id"), col("k"), col("n"))
        .agg(sum(col("c").cast("decimal(38,0)") *
          round(log(col("n").cast("double") / col("c")) * 1000000)
            .cast("long")).as("hs"))
        .select(col("user_id"), col("k"),
          expr("CAST(hs div n AS BIGINT)").as("h_micro"))
      he.groupBy(col("k").as("n_types"))
        .agg(count(lit(1)).as("n_users"),
          expr("""CAST(CAST(sum(h_micro) AS DECIMAL(38,0)) div count(1)
            |  AS BIGINT)""".stripMargin).as("mean_entropy_micro"),
          min(col("h_micro")).cast("long").as("min_entropy_micro"),
          max(col("h_micro")).cast("long").as("max_entropy_micro"))
        .orderBy(col("n_types"))
    },

    // ---- Deterministic weighted sampling WITHOUT replacement
    //      (Efraimidis–Spiridakis A-ES): draw 20 docs per language
    //      with inclusion probability ∝ n_chars, by ranking on
    //      −ln(u)/w where u is the md5-derived uniform in (0,1) —
    //      the seeded-hash randomness every deterministic sampler
    //      here uses (q100's md5 discipline), so a re-run (or a
    //      backfill on another engine) draws the IDENTICAL sample.
    //      The key is rounded to nano units per row before the rank
    //      (q222's round-then-integer rule: float libm output never
    //      feeds an order-dependent float sum — here it only feeds a
    //      row-local rounding). One window per language partition —
    //      at 100 TB the rank is a per-group top-k (bounded heap),
    //      not a global sort; the window form here keeps the oracle
    //      expression identical. ----
    QueryDef.sql("q228_weighted_sample",
      s"""WITH k AS (SELECT doc_id, lang, n_chars,
        |    CAST(round(-ln((CAST(
        |        ${Sketches.hexSql("md5(CAST(doc_id AS VARCHAR))", 1, 8)}
        |        AS DOUBLE) + 0.5) / 4294967296.0)
        |      / greatest(1, n_chars) * 1000000000) AS BIGINT) AS key_nano
        |  FROM documents),
        |r AS (SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY key_nano, doc_id) AS rk FROM k)
        |SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars
        |FROM r WHERE rk <= 20 ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val k = t(s, d, "documents").select(col("doc_id"), col("lang"),
          col("n_chars"),
          round(-log((conv(substring(md5(col("doc_id").cast("string")
              .cast("binary")), 1, 8), 16, 10).cast("long")
              .cast("double") + 0.5) / 4294967296.0)
            // zero-length docs weigh as 1 — the degenerate-corpus
            // guard (a 0 weight is an IEEE inf key → long overflow)
            / greatest(lit(1), col("n_chars")) * 1e9).cast("long")
            .as("key_nano"))
      k.withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("key_nano"), col("doc_id"))))
        .filter(col("rk") <= 20)
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .orderBy(col("lang"), col("doc_id"))
    },

    // ---- k-anonymity audit (k = 5) over the quasi-identifier tuple
    //      (lang, source, length bucket): the privacy gate a corpus
    //      release runs before publishing per-document metadata. Per
    //      language: how many QI equivalence classes exist, how many
    //      are smaller than k, how many rows those small classes
    //      expose, and the worst-case class size. Two integer
    //      aggregations (QI-grouped then language-grouped) — the
    //      first is the only corpus-sized shuffle and its key space
    //      is the QI domain, so at 100 TB it map-side combines to
    //      O(|QI classes|) rows. ----
    QueryDef.sql("q229_k_anonymity",
      """WITH g AS (SELECT lang, source, n_chars // 200 AS len_bucket,
        |    count(*) AS grp_n FROM documents GROUP BY 1, 2, 3)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(count(*) FILTER (WHERE grp_n < 5) AS BIGINT)
        |    AS small_groups,
        |  CAST(coalesce(sum(grp_n) FILTER (WHERE grp_n < 5), 0)
        |    AS BIGINT) AS exposed_rows,
        |  CAST(min(grp_n) AS BIGINT) AS min_k
        |FROM g GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .groupBy(col("lang"), col("source"),
          expr("n_chars div 200").as("len_bucket"))
        .agg(count(lit(1)).as("grp_n"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("grp_n") < 5, 1L).otherwise(0L)).cast("long")
            .as("small_groups"),
          coalesce(sum(when(col("grp_n") < 5, col("grp_n"))), lit(0L))
            .cast("long").as("exposed_rows"),
          min(col("grp_n")).cast("long").as("min_k"))
        .orderBy(col("lang"))
    },

    // ---- One-way ANOVA F across sources (k-arm extension of q165's
    //      Welch t): does mean doc length differ by source at all,
    //      before any pairwise test? Everything is EXACT integer
    //      algebra: per-source (n, Σx, Σx²) in DECIMAL(38,0), the
    //      between-groups term Σ s_j²/n_j floor-quantized to micro
    //      per group (integer div — both engines floor identically on
    //      the provably-nonnegative operands), so SSB/SSW/F/η² are
    //      integers that hash bit-for-bit. One corpus-sized groupBy
    //      (map-side combine to O(sources) rows) then a 1-row fold —
    //      the report is source-count-sized forever. A corpus where
    //      every source is internally constant ⇒ SSW = 0 ⇒ NULL F
    //      (the guard DegenerateInputSpec pins); η² stays defined
    //      unless the whole corpus is one constant. ----
    QueryDef.sql("q243_anova_f",
      """WITH g AS (SELECT source, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(n_chars) AS HUGEINT) AS s,
        |    CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS ss
        |  FROM documents GROUP BY source),
        |agg AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
        |    CAST(sum(s) AS HUGEINT) AS st,
        |    CAST(sum(ss) AS HUGEINT) AS sst,
        |    CAST(count(*) AS HUGEINT) AS k,
        |    CAST(sum(s * s * 1000000 // n) AS HUGEINT) AS bterm
        |  FROM g)
        |SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n_total,
        |  CAST(bterm - st * st * 1000000 // nn AS BIGINT) AS ssb_micro,
        |  CAST(sst * 1000000 - bterm AS BIGINT) AS ssw_micro,
        |  CAST(CASE WHEN sst * 1000000 - bterm > 0 AND k > 1 AND nn > k
        |    THEN (bterm - st * st * 1000000 // nn) * (nn - k) * 1000000
        |      // ((sst * 1000000 - bterm) * (k - 1)) END AS BIGINT)
        |    AS f_micro,
        |  CAST(CASE WHEN sst * 1000000 - st * st * 1000000 // nn > 0
        |    THEN (bterm - st * st * 1000000 // nn) * 1000000
        |      // (sst * 1000000 - st * st * 1000000 // nn) END AS BIGINT)
        |    AS eta2_micro
        |FROM agg""".stripMargin) { (s, d) =>
      val g = t(s, d, "documents").groupBy(col("source"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("n_chars").cast("decimal(38,0)")).as("s"),
          sum(col("n_chars").cast("decimal(38,0)") * col("n_chars"))
            .as("ss"))
      g.agg(sum(col("n")).as("nn"), sum(col("s")).as("st"),
          sum(col("ss")).as("sst"),
          count(lit(1)).cast("decimal(38,0)").as("k"),
          sum(expr("CAST(s * s * 1000000 div n AS DECIMAL(38,0))"))
            .as("bterm"))
        .select(col("k").cast("long").as("k_groups"),
          col("nn").cast("long").as("n_total"),
          expr("CAST(bterm - st * st * 1000000 div nn AS BIGINT)")
            .as("ssb_micro"),
          (col("sst") * 1000000 - col("bterm")).cast("long")
            .as("ssw_micro"),
          // SSW = 0 (every source internally constant) or k <= 1 or
          // nn <= k would divide by zero — NULL, mirrored in the oracle
          expr("""CAST(CASE WHEN sst * 1000000 - bterm > 0 AND k > 1
            |    AND nn > k
            |  THEN (bterm - st * st * 1000000 div nn) * (nn - k)
            |    * 1000000 div ((sst * 1000000 - bterm) * (k - 1))
            |  END AS BIGINT)""".stripMargin).as("f_micro"),
          expr("""CAST(CASE WHEN sst * 1000000
            |    - st * st * 1000000 div nn > 0
            |  THEN (bterm - st * st * 1000000 div nn) * 1000000
            |    div (sst * 1000000 - st * st * 1000000 div nn)
            |  END AS BIGINT)""".stripMargin).as("eta2_micro"))
    },

    // ---- Kruskal–Wallis H across sources — the rank-based twin of
    //      q243 (robust to the heavy tails q242 measures): does the
    //      length DISTRIBUTION differ by source? Tie-corrected via
    //      the variance-ratio identity H = (N−1)(ΣR_j²/n_j − C) /
    //      (Σ_v c_v·m_v² − C) with C = N(N+1)²/4, which makes both
    //      numerator and denominator provably nonnegative — so the
    //      floor integer division is sign-safe in both engines (the
    //      greatest(0,·) clamp only absorbs ≤k µunits of quantization
    //      noise). Ranks never touch N rows: the (value, source) cell
    //      agg and the O(distinct lengths) support table carry q182's
    //      exact doubled-rank algebra (2·avg_rank = 2·cb + c + 1),
    //      and the cumulative window runs post-aggregation. An
    //      all-one-value corpus ⇒ denominator 0 ⇒ NULL
    //      (DegenerateInputSpec). ----
    QueryDef.sql("q244_kruskal_wallis",
      """WITH cell AS (SELECT n_chars AS v, source,
        |    CAST(count(*) AS BIGINT) AS cj
        |  FROM documents GROUP BY 1, 2),
        |sup AS (SELECT v, CAST(sum(cj) AS BIGINT) AS c
        |  FROM cell GROUP BY v),
        |cw AS (SELECT v, c,
        |    CAST(coalesce(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cb FROM sup),
        |r2 AS (SELECT cell.source,
        |    CAST(sum(CAST(cj AS HUGEINT) * (2 * cb + c + 1)) AS HUGEINT)
        |      AS r2j,
        |    CAST(sum(cj) AS HUGEINT) AS nj
        |  FROM cell JOIN cw ON cell.v = cw.v GROUP BY cell.source),
        |den AS (SELECT
        |    CAST(sum(CAST(c AS HUGEINT) * (2 * cb + c + 1)
        |      * (2 * cb + c + 1)) AS HUGEINT) AS s4,
        |    CAST(sum(c) AS HUGEINT) AS n FROM cw),
        |agg AS (SELECT
        |    CAST(sum(r2j * r2j * 1000000 // nj) AS HUGEINT) AS bterm,
        |    CAST(count(*) AS HUGEINT) AS k FROM r2)
        |SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n_total,
        |  CAST(CASE WHEN s4 - n * (n + 1) * (n + 1) > 0 THEN
        |    (n - 1) * greatest(0, bterm - n * (n + 1) * (n + 1) * 1000000)
        |      // (s4 - n * (n + 1) * (n + 1)) END AS BIGINT) AS h_micro
        |FROM agg, den""".stripMargin) { (s, d) =>
      val cell = t(s, d, "documents")
        .groupBy(col("n_chars").as("v"), col("source"))
        .agg(count(lit(1)).as("cj"))
        .localCheckpoint() // feeds both the support table and the
                           // per-source rank-sum join
      val sup = cell.groupBy(col("v")).agg(sum(col("cj")).as("c"))
      // O(distinct lengths) rows past the support agg — the single-
      // partition cumulative window is post-aggregation (q182/q239)
      val cw = sup.withColumn("cb",
          coalesce(sum(col("c")).over(Window.orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .localCheckpoint() // feeds the rank-sum join and the 1-row
                           // denominator fold
      val r2 = cell.join(cw, "v").groupBy(col("source"))
        .agg(sum(col("cj").cast("decimal(38,0)")
            * (lit(2) * col("cb") + col("c") + 1)).as("r2j"),
          sum(col("cj")).cast("decimal(38,0)").as("nj"))
      val den = cw.agg(
        sum(col("c").cast("decimal(38,0)")
          * (lit(2) * col("cb") + col("c") + 1)
          * (lit(2) * col("cb") + col("c") + 1)).as("s4"),
        sum(col("c")).cast("decimal(38,0)").as("n"))
      r2.agg(sum(expr("CAST(r2j * r2j * 1000000 div nj AS DECIMAL(38,0))"))
            .as("bterm"),
          count(lit(1)).cast("long").as("k_groups"))
        .crossJoin(broadcast(den)) // 1-row denominator fold
        .select(col("k_groups"), col("n").cast("long").as("n_total"),
          // one distinct value corpus-wide ⇒ rank variance 0 ⇒ NULL
          expr("""CAST(CASE WHEN s4 - n * (n + 1) * (n + 1) > 0 THEN
            |  (n - 1) * greatest(CAST(0 AS DECIMAL(38,0)),
            |    bterm - n * (n + 1) * (n + 1) * 1000000)
            |  div (s4 - n * (n + 1) * (n + 1)) END AS BIGINT)"""
            .stripMargin).as("h_micro"))
    },

    // ---- Decision-stump split finder: the Gini-optimal threshold on
    //      a per-user behavioral feature (view count) for a binary
    //      label (more purchases than errors) — the 1-D CART step and
    //      the simplest supervised primitive a curation pipeline
    //      runs. EXACT by construction: weighted Gini compares as the
    //      single integer ((nl²−l1²−l0²)·nr + (nr²−r1²−r0²)·nl)·1e6
    //      div (nl·nr·N) in DECIMAL(38,0)/HUGEINT — no float impurity
    //      anywhere, ties broken by threshold, so both engines pick
    //      identical split rankings. Scale: candidate thresholds come
    //      from the O(distinct x) SUPPORT table (q245's discipline —
    //      the cumulative window runs post-agg on domain-sized rows,
    //      never a per-user global sort); the corpus pays one
    //      user-keyed agg. Top-5 splits reported. ----
    QueryDef.sql("q259_decision_stump",
      """WITH ux AS (SELECT user_id AS u,
        |    CAST(count(CASE WHEN event_type = 'view' THEN 1 END)
        |      AS BIGINT) AS x,
        |    CASE WHEN count(CASE WHEN event_type = 'purchase' THEN 1
        |        END) > count(CASE WHEN event_type = 'error' THEN 1 END)
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
        |  FROM events GROUP BY user_id),
        |tot AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(y) AS HUGEINT) AS n1 FROM ux),
        |sup AS (SELECT x, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(y) AS BIGINT) AS c1 FROM ux GROUP BY x),
        |cum AS (SELECT x AS thr, CAST(sum(c) OVER w AS HUGEINT) AS nl,
        |    CAST(sum(c1) OVER w AS HUGEINT) AS l1
        |  FROM sup WINDOW w AS (ORDER BY x)),
        |sc AS (SELECT thr, nl, l1, n - nl AS nr, n1 - l1 AS r1, n
        |  FROM cum, tot WHERE nl < n),
        |g AS (SELECT thr, nl, nr, l1, r1,
        |    CAST(((nl*nl - l1*l1 - (nl-l1)*(nl-l1)) * nr
        |        + (nr*nr - r1*r1 - (nr-r1)*(nr-r1)) * nl) * 1000000
        |      // (nl * nr * n) AS BIGINT) AS gini_micro,
        |    CAST(l1 * 1000000 // nl AS BIGINT) AS p_left_micro,
        |    CAST(r1 * 1000000 // nr AS BIGINT) AS p_right_micro
        |  FROM sc)
        |SELECT CAST(row_number() OVER (ORDER BY gini_micro, thr)
        |    AS BIGINT) AS rank,
        |  CAST(thr AS BIGINT) AS threshold, gini_micro,
        |  CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
        |  p_left_micro, p_right_micro
        |FROM g ORDER BY gini_micro, thr LIMIT 5""".stripMargin) {
      (s, d) =>
      val ux = t(s, d, "events").groupBy(col("user_id").as("u"))
        .agg(count(when(col("event_type") === "view", 1)).cast("long")
            .as("x"),
          when(count(when(col("event_type") === "purchase", 1))
              > count(when(col("event_type") === "error", 1)), 1L)
            .otherwise(0L).as("y"))
      val sup = ux.groupBy(col("x"))
        .agg(count(lit(1)).as("c"), sum(col("y")).as("c1"))
      val tot = ux.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("y")).cast("decimal(38,0)").as("n1"))
      // cumulative window over the O(distinct x) support table only
      val w = Window.orderBy(col("x"))
      val cum = sup.select(col("x").as("thr"),
        sum(col("c")).over(w).cast("decimal(38,0)").as("nl"),
        sum(col("c1")).over(w).cast("decimal(38,0)").as("l1"))
      val g = cum.crossJoin(broadcast(tot))
        .filter(col("nl") < col("n"))
        .select(col("thr"), col("nl"), col("l1"),
          (col("n") - col("nl")).as("nr"),
          (col("n1") - col("l1")).as("r1"), col("n"))
        .select(col("thr"), col("nl"), col("nr"),
          expr("""CAST((((nl*nl - l1*l1 - (nl-l1)*(nl-l1)) * nr
            |    + (nr*nr - r1*r1 - (nr-r1)*(nr-r1)) * nl) * 1000000)
            |  div (nl * nr * n) AS BIGINT)""".stripMargin)
            .as("gini_micro"),
          expr("CAST((l1 * 1000000) div nl AS BIGINT)").as("p_left_micro"),
          expr("CAST((r1 * 1000000) div nr AS BIGINT)")
            .as("p_right_micro"))
      g.select(row_number().over(
            Window.orderBy(col("gini_micro"), col("thr")))
            .cast("long").as("rank"),
          col("thr").as("threshold"), col("gini_micro"),
          col("nl").cast("long").as("n_left"),
          col("nr").cast("long").as("n_right"),
          col("p_left_micro"), col("p_right_micro"))
        .orderBy(col("rank")).limit(5)
    },

    // ---- Log-rank test: do the two md5-armed user cohorts share one
    //      churn-survival curve? The hypothesis-test companion to
    //      q198's Kaplan-Meier and q285's Nelson-Aalen (those draw
    //      the curves; this one says whether A's and B's differ).
    //      Fully integer: at each death time the observed-minus-
    //      expected term (d·nA·1e6) div n and the hypergeometric
    //      variance term — factored as ((d·(n−d)·1e6) div (n−1)) then
    //      ·nA·nB div n², keeping every intermediate < 2⁶³ — are
    //      exact integer micro, so the cross-duration sums are
    //      order-independent; χ² is one integer milli division at the
    //      end (abs before div: Spark's `div` truncates toward zero,
    //      DuckDB's `//` floors — they agree only on non-negatives).
    //      The corpus pays one per-user agg; everything after runs on
    //      the O(distinct durations) support table, exactly q198's
    //      scale shape. n=1 risk sets contribute zero variance; a
    //      zero total variance yields NULL χ² (one arm empty, or no
    //      deaths — DegenerateInputSpec). ----
    QueryDef.sql("q291_logrank_test",
      """WITH u AS (SELECT user_id,
        |    CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 3600000000
        |      AS BIGINT) AS dur,
        |    epoch_us(max(ts)) AS last_us,
        |    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 2)
        |      < '80' THEN 1 ELSE 0 END AS a
        |  FROM events GROUP BY user_id),
        |hz AS (SELECT max(last_us) AS h FROM u),
        |lab AS (SELECT u.dur, u.a,
        |    CASE WHEN u.last_us < hz.h - 86400000000 THEN 1 ELSE 0 END
        |      AS death FROM u, hz),
        |sup AS (SELECT dur, CAST(count(*) AS BIGINT) AS n_all,
        |    CAST(sum(death) AS BIGINT) AS dd,
        |    CAST(sum(a) AS BIGINT) AS na_all,
        |    CAST(sum(a * death) AS BIGINT) AS da
        |  FROM lab GROUP BY dur),
        |tot AS (SELECT CAST(sum(n_all) AS BIGINT) AS nu,
        |    CAST(sum(na_all) AS BIGINT) AS nau FROM sup),
        |cum AS (SELECT dur, dd, da,
        |    tot.nu - COALESCE(sum(n_all) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk,
        |    tot.nau - COALESCE(sum(na_all) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS na_risk
        |  FROM sup, tot),
        |term AS (SELECT dur, da,
        |    (dd * na_risk * 1000000) // n_risk AS ea,
        |    CASE WHEN n_risk > 1 THEN
        |      (((dd * (n_risk - dd) * 1000000) // (n_risk - 1))
        |        * na_risk * (n_risk - na_risk)) // (n_risk * n_risk)
        |    ELSE 0 END AS v
        |  FROM cum WHERE dd > 0),
        |agg AS (SELECT CAST(COALESCE(sum(da), 0) AS BIGINT) AS o_a,
        |    CAST(COALESCE(sum(ea), 0) AS BIGINT) AS e_a_micro,
        |    CAST(COALESCE(sum(v), 0) AS BIGINT) AS var_micro
        |  FROM term)
        |SELECT tot.nau AS n_a, tot.nu - tot.nau AS n_b,
        |  agg.o_a AS o_a, agg.e_a_micro AS e_a_micro,
        |  agg.var_micro AS var_micro,
        |  CASE WHEN agg.var_micro >= 1000 THEN
        |    ((abs(agg.o_a * 1000000 - agg.e_a_micro) // 1000)
        |      * (abs(agg.o_a * 1000000 - agg.e_a_micro) // 1000))
        |      // (agg.var_micro // 1000)
        |  END AS chi2_milli
        |FROM agg, tot""".stripMargin) { (s, d) =>
      // O(users) rows, checkpointed: feeds the horizon agg AND the
      // label projection (q198's shape, plus the arm column)
      val u = t(s, d, "events").groupBy(col("user_id"))
        .agg(expr("CAST((unix_micros(max(ts)) - unix_micros(min(ts)))"
          + " div 3600000000 AS BIGINT)").as("dur"),
          unix_micros(max(col("ts"))).as("last_us"))
        .withColumn("a",
          when(substring(md5(col("user_id").cast("string")
            .cast("binary")), 1, 2) < "80", 1L).otherwise(0L))
        .localCheckpoint()
      val hz = u.agg(max(col("last_us")).as("h"))
      val sup = u.crossJoin(broadcast(hz))
        .select(col("dur"), col("a"),
          when(col("last_us") < col("h") - 86400000000L, 1L).otherwise(0L)
            .as("death"))
        .groupBy(col("dur"))
        .agg(count(lit(1)).as("n_all"),
          sum(col("death")).cast("long").as("dd"),
          sum(col("a")).cast("long").as("na_all"),
          sum(col("a") * col("death")).cast("long").as("da"))
        .localCheckpoint() // O(distinct durations): feeds the totals
                           // AND the risk-set windows
      val tot = sup.agg(sum(col("n_all")).cast("long").as("nu"),
        sum(col("na_all")).cast("long").as("nau"))
      val wPrev = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val term = sup.crossJoin(broadcast(tot))
        .withColumn("n_risk",
          col("nu") - coalesce(sum(col("n_all")).over(wPrev), lit(0L)))
        .withColumn("na_risk",
          col("nau") - coalesce(sum(col("na_all")).over(wPrev), lit(0L)))
        .filter(col("dd") > 0)
        .select(col("da"),
          expr("(dd * na_risk * 1000000) div n_risk").as("ea"),
          expr("""CASE WHEN n_risk > 1 THEN
            |  (((dd * (n_risk - dd) * 1000000) div (n_risk - 1))
            |    * na_risk * (n_risk - na_risk)) div (n_risk * n_risk)
            |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("v"))
      val agg = term.agg(
        coalesce(sum(col("da")), lit(0L)).cast("long").as("o_a"),
        coalesce(sum(col("ea")), lit(0L)).cast("long").as("e_a_micro"),
        coalesce(sum(col("v")), lit(0L)).cast("long").as("var_micro"))
      agg.crossJoin(broadcast(tot))
        .select(col("nau").as("n_a"), (col("nu") - col("nau")).as("n_b"),
          col("o_a"), col("e_a_micro"), col("var_micro"),
          when(col("var_micro") >= 1000,
            expr("""((abs(o_a * 1000000 - e_a_micro) div 1000)
              |  * (abs(o_a * 1000000 - e_a_micro) div 1000))
              |  div (var_micro div 1000)""".stripMargin))
            .as("chi2_milli"))
    },

    // ---- Split-conformal coverage audit: does the 90% prediction
    //      interval actually cover 90%? The distribution-free
    //      guarantee every curation-model consumer should demand
    //      before trusting a "confidence" column. Three md5 folds
    //      (train/calibrate/test, the q82 idiom); the per-lang train
    //      mean is an exact integer micro division; the calibration
    //      quantile is the EXACT order statistic at rank
    //      k = ⌈0.9·(n+1)⌉ via q287's integer test cum·10 ≥ 9·(n+1)
    //      on the distinct-score support table (never an interpolated
    //      percentile); test coverage is one integer micro division.
    //      The corpus pays one fold/lang projection + three
    //      lang-keyed aggs; everything else is O(langs·distinct
    //      scores). k > n_calib (too few calibration rows for the
    //      level) yields NULL q̂ and NULL coverage — the honest "not
    //      enough data" answer (DegenerateInputSpec). ----
    QueryDef.sql("q294_conformal_coverage", conformalOracle) { (s, d) =>
      // one corpus scan into the (lang, v, fold) count support; the
      // train mean, calibration quantile, and test coverage all
      // derive from it post-agg (assembly shared with the q305
      // STREAMING twin via conformalTail)
      conformalTail(t(s, d, "documents")
        .groupBy(col("lang"), col("n_chars").as("v"),
          when(substring(md5(col("doc_id").cast("string")
            .cast("binary")), 1, 2) < "60", 0)
          .when(substring(md5(col("doc_id").cast("string")
            .cast("binary")), 1, 2) < "b0", 1)
          .otherwise(2).as("fold"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint())
    },

    // ---- STREAMING twin of q294: the conformal-coverage monitor
    //      folding on the live document feed. The (lang, length,
    //      fold) count fold runs complete-mode with DOMAIN-sized
    //      state (langs·distinct lengths·3), and the train mean,
    //      exact calibration order statistic, and test coverage all
    //      assemble AT READ through the SHARED conformalTail against
    //      q294's VERBATIM oracle — the "does 90% still cover 90%?"
    //      alarm becomes a live metric with provably zero
    //      batch/stream divergence. ----
    QueryDef.sql("q305_stream_conformal", conformalOracle) { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val feedDir = graft.bench.BenchFeeds.feed(s, d, "doclangfeed",
        idCol = "doc_id", checkSpan = false)(docs)
      val sink = graft.bench.BenchFeeds.sinkName("q305_conf")
      graft.streaming.StreamRun.withStatePartitions(s, 8) {
        val q = s.readStream
          .schema(s.read.parquet(feedDir).schema)
          .option("maxFilesPerTrigger", 2)
          .parquet(feedDir)
          .select(col("lang"), col("n_chars").as("v"),
            when(substring(md5(col("doc_id").cast("string")
              .cast("binary")), 1, 2) < "60", 0)
            .when(substring(md5(col("doc_id").cast("string")
              .cast("binary")), 1, 2) < "b0", 1)
            .otherwise(2).as("fold"))
          .groupBy(col("lang"), col("v"), col("fold"))
          .agg(count(lit(1)).as("c"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
      }
      conformalTail(s.table(sink)
        .select(col("lang"), col("v"), col("fold"),
          col("c").cast("long").as("c"))
        .localCheckpoint())
    },

    // ---- Bradley-Terry preference strengths: the model behind every
    //      pairwise-preference pipeline (RLHF comparisons, judge
    //      panels, A/B doc battles) — given "i beat j" counts, what
    //      latent strength explains them? Comparisons are
    //      deterministic md5-bucket pairings of docs from different
    //      sources (longer doc wins, ties void); 4 minorize-maximize
    //      rounds run as INTEGER micro fixed points: each round
    //      s_i ← W_i·10¹² div Σ_j (n_ij·10¹²) div (s_i + s_j), then
    //      q186's max-rescale keeps the scale-invariant family pinned
    //      at max = 10⁶ — the oracle unrolls all 4 rounds so the hash
    //      proves the walk. Zero-denominator guards: a source with no
    //      comparisons carries its strength; an all-zero pair term
    //      contributes 0. nij·10¹² and w·10¹² ride HUGEINT /
    //      DECIMAL(38,0) (the q303 fence): a pair past ~9.2M
    //      comparisons widens instead of wrapping. Scale (r12 ask
    //      #2): the bucket count is CORPUS-DERIVED — B = max(16,
    //      N div 16), the autoCentroids discipline — so expected
    //      bucket size stays ~16 docs at ANY corpus and the duel
    //      join is Σ bucket² ≈ 16·N pair instances: LINEAR in the
    //      corpus, not the old fixed-256-bucket corpus²/256. Both
    //      engines derive B from the same count with the same floor
    //      division, and the bucket key is the same md5 prefix mod B
    //      (8 hex chars — 32 bits, exact in BIGINT), so the duel set
    //      is bit-identical. The MM rounds themselves run on the
    //      O(sources²) win matrix. Oracle CTEs are MATERIALIZED (the
    //      q248/q279 discipline): DuckDB inlines plain CTEs, and the
    //      duel→p→s₀→s₄ chain re-computed the corpus-sized bucket
    //      join 3⁴ times once bk carried the count subquery (14 min
    //      at sf0.01, measured; 0.06 s materialized). ----
    QueryDef.sql("q302_bradley_terry", {
      val iters = (1 to 4).map { i =>
        s"""d$i AS (SELECT p.i, sum(CASE WHEN a.s + b.s > 0
           |      THEN (CAST(p.nij AS HUGEINT) * 1000000000000)
           |        // (a.s + b.s)
           |      ELSE 0 END) AS den
           |  FROM p JOIN s${i - 1} a ON a.src = p.i
           |  JOIN s${i - 1} b ON b.src = p.j GROUP BY p.i),
           |r$i AS (SELECT d$i.i AS src,
           |    CASE WHEN d$i.den > 0
           |      THEN (CAST(COALESCE(w.w, 0) AS HUGEINT) * 1000000000000)
           |        // d$i.den
           |      ELSE s.s END AS s
           |  FROM d$i LEFT JOIN w ON w.i = d$i.i
           |  JOIN s${i - 1} s ON s.src = d$i.i),
           |m$i AS (SELECT max(s) AS m FROM r$i),
           |s$i AS MATERIALIZED (SELECT r.src, CASE WHEN m.m > 0
           |    THEN (r.s * 1000000) // m.m ELSE r.s END AS s
           |  FROM r$i r, m$i m)""".stripMargin
      }.mkString(",\n")
      s"""WITH nb AS MATERIALIZED (SELECT greatest(16, count(*) // 16)
         |  AS b FROM documents),
         |bk AS MATERIALIZED (SELECT
         |    ${Sketches.hexSql("md5(CAST(doc_id AS VARCHAR))", 1, 8)}
         |    % nb.b AS b, source, n_chars
         |  FROM documents, nb),
         |duel AS MATERIALIZED (SELECT a.source AS i, b.source AS j,
         |    CAST(count(*) AS BIGINT) AS wins
         |  FROM bk a JOIN bk b ON a.b = b.b AND a.source <> b.source
         |    AND a.n_chars > b.n_chars
         |  GROUP BY a.source, b.source),
         |p AS MATERIALIZED (SELECT COALESCE(d1.i, d2.j) AS i,
         |    COALESCE(d1.j, d2.i) AS j,
         |    COALESCE(d1.wins, 0) + COALESCE(d2.wins, 0) AS nij
         |  FROM duel d1 FULL JOIN duel d2
         |    ON d1.i = d2.j AND d1.j = d2.i),
         |w AS MATERIALIZED (SELECT i, CAST(sum(wins) AS BIGINT) AS w
         |  FROM duel GROUP BY i),
         |s0 AS (SELECT i AS src, CAST(1000000 AS BIGINT) AS s
         |  FROM (SELECT DISTINCT i FROM p)),
         |$iters
         |SELECT s4.src AS source, COALESCE(w.w, 0) AS wins,
         |  CAST(s4.s AS BIGINT) AS strength_micro
         |FROM s4 LEFT JOIN w ON w.i = s4.src
         |ORDER BY source""".stripMargin
    }) { (s, d) =>
      val docs = t(s, d, "documents")
      // corpus-derived bucket count (the autoCentroids discipline):
      // one footer-metadata count, never a column scan
      val nBuckets = math.max(16L, docs.count() / 16L)
      val bk = docs
        .select((conv(substring(md5(col("doc_id").cast("string")
            .cast("binary")), 1, 8), 16, 10).cast("long") % nBuckets)
          .as("b"), col("source"), col("n_chars"))
        .localCheckpoint() // bucket-blocked duel table feeds both legs
      val duel = bk.select(col("b"), col("source").as("i"),
          col("n_chars").as("ca"))
        .join(bk.select(col("b"), col("source").as("j"),
          col("n_chars").as("cb")), Seq("b"))
        .filter(col("i") =!= col("j") && col("ca") > col("cb"))
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("wins"))
        .localCheckpoint() // O(sources²): feeds p, w, and the rounds
      val p = duel.select(col("i"), col("j"), col("wins"))
        .join(duel.select(col("j").as("i"), col("i").as("j"),
          col("wins").as("wr")), Seq("i", "j"), "full")
        .select(col("i"), col("j"),
          (coalesce(col("wins"), lit(0L)) + coalesce(col("wr"), lit(0L)))
            .as("nij"))
        .localCheckpoint()
      val w = duel.groupBy(col("i"))
        .agg(sum(col("wins")).cast("long").as("w"))
      var sTab = p.select(col("i").as("src")).distinct()
        .select(col("src"), lit(1000000L).as("s"))
        .localCheckpoint()
      for (_ <- 1 to 4) {
        val den = p
          .join(sTab.select(col("src").as("i"), col("s").as("si")), "i")
          .join(sTab.select(col("src").as("j"), col("s").as("sj")), "j")
          .groupBy(col("i"))
          // nij·10¹² in DECIMAL(38,0) (HUGEINT in the oracle): the
          // q303 fence — a source pair past ~9.2M comparisons must
          // widen, not wrap (ADVICE r11)
          .agg(sum(when(col("si") + col("sj") > 0,
            expr("CAST((CAST(nij AS DECIMAL(38,0)) * 1000000000000)"
              + " div (si + sj) AS DECIMAL(38,0))"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("den"))
        val raw = den.join(w, Seq("i"), "left")
          .join(sTab.select(col("src").as("i"), col("s").as("sp")), "i")
          .select(col("i").as("src"),
            when(col("den") > 0,
              expr("(CAST(coalesce(w, 0) AS DECIMAL(38,0))"
                + " * 1000000000000) div den"))
              .otherwise(col("sp")).as("s"))
        val m = raw.agg(max(col("s")).as("m"))
        sTab = raw.crossJoin(broadcast(m))
          .select(col("src"),
            when(col("m") > 0, expr("(s * 1000000) div m"))
              .otherwise(col("s")).as("s"))
          .localCheckpoint()
      }
      sTab.join(w.select(col("i").as("src"), col("w")), Seq("src"), "left")
        .select(col("src").as("source"),
          coalesce(col("w"), lit(0L)).as("wins"),
          col("s").cast("long").as("strength_micro"))
        .orderBy(col("source"))
    },

    // ---- Raking / iterative proportional fitting: reweight the
    //      (lang × source) cell table so BOTH margins hit uniform
    //      targets — the survey-statistics workhorse that dataset
    //      rebalancing reinvents (q115's temperature mix fixes ONE
    //      margin; raking fixes two without destroying either). 3
    //      unrolled IPF rounds as INTEGER micro fixed points: row
    //      factor = target·10⁶ div achieved, w ← w·factor div 10⁶,
    //      then the column pass — every operand an exact integer, so
    //      the oracle's unrolled CTE chain is bit-identical (the
    //      q302/q186 loop discipline). Empty margins carry weight 1e6
    //      (guarded divisions). Scale: ONE corpus-sized (lang,
    //      source) agg; the rounds run on the O(langs·sources) cell
    //      table. ----
    QueryDef.sql("q310_raking_ipf",
      s"""WITH $rakingCte
         |SELECT lang, source, n, CAST(w AS BIGINT) AS weight_micro
         |FROM w3 ORDER BY lang, source""".stripMargin) { (s, d) =>
      rakedWeights(s, d)
        .select(col("lang"), col("source"), col("n"),
          col("w").cast("long").as("weight_micro"))
        .orderBy(col("lang"), col("source"))
    },

    // ---- Effective sample size of the raked weights: reweighting is
    //      never free — Kish's ESS = (Σ n·w)²/(Σ n·w²) says how many
    //      EFFECTIVE documents survive q310's two-margin fit, per
    //      language. An ESS ratio near 1 means the margins were
    //      nearly consistent; a small one means the raking bought its
    //      balance by concentrating mass on few cells — the number a
    //      training-mix reviewer reads BEFORE trusting any reweighted
    //      metric. Exact: numerator and denominator are DECIMAL sums
    //      over the same w3 table q310 emits (one shared rounds
    //      builder, so the two queries can never drift), one integer
    //      milli/micro division each. ----
    QueryDef.sql("q312_weight_ess",
      s"""WITH $rakingCte,
         |e AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_docs,
         |    CAST(sum(CAST(n AS HUGEINT) * w) AS HUGEINT) AS sw,
         |    CAST(sum(CAST(n AS HUGEINT) * w * w) AS HUGEINT) AS sw2
         |  FROM w3 GROUP BY lang)
         |SELECT lang, n_docs,
         |  CAST((sw * sw * 1000) // sw2 AS BIGINT) AS ess_milli,
         |  CAST((sw * sw * 1000) // sw2 // n_docs AS BIGINT)
         |    AS ess_ratio_milli
         |FROM e ORDER BY lang""".stripMargin) { (s, d) =>
      rakedWeights(s, d)
        .groupBy(col("lang"))
        .agg(sum(col("n")).cast("long").as("n_docs"),
          sum(col("n").cast("decimal(38,0)") * col("w")).as("sw"),
          sum(col("n").cast("decimal(38,0)") * col("w") * col("w"))
            .as("sw2"))
        .select(col("lang"), col("n_docs"),
          expr("CAST((sw * sw * 1000) div sw2 AS BIGINT)")
            .as("ess_milli"),
          expr("CAST((sw * sw * 1000) div sw2 div n_docs AS BIGINT)")
            .as("ess_ratio_milli"))
        .orderBy(col("lang"))
    },

    // ---- Winner's-curse audit (leaderboard regression to the mean):
    //      rank users by activity on an md5 HALF of their events, then
    //      measure the same users on the OTHER half — per rank decile,
    //      how much of the "top user" signal was selection noise? The
    //      audit behind every top-k list a pipeline promotes (power
    //      users, hot domains, best sources): the top decile's B/A
    //      ratio below 10⁶ IS the curse, and its size says how much
    //      shrinkage (q289) the metric needs before anyone acts on
    //      the ranking. Deterministic md5(event_id) split; ranks and
    //      deciles are exact integer order statistics ((rk−1)·10 div
    //      n — never a float quantile); the decile report is integer
    //      sums + one micro division. Scale: ONE per-user count agg;
    //      the rank is a single window over O(users) rows (at
    //      monster scale: the q63 two-level scheme on count buckets);
    //      output is 10 rows. ----
    QueryDef.sql("q326_winners_curse",
      """WITH e AS (SELECT user_id,
        |    CASE WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1)
        |      < '8' THEN 1 ELSE 0 END AS a
        |  FROM events),
        |u AS (SELECT user_id, CAST(sum(a) AS BIGINT) AS ca,
        |    CAST(count(*) - sum(a) AS BIGINT) AS cb
        |  FROM e GROUP BY user_id),
        |r AS (SELECT ca, cb,
        |    row_number() OVER (ORDER BY ca DESC, user_id) AS rk,
        |    CAST(count(*) OVER () AS BIGINT) AS n FROM u)
        |SELECT CAST((rk - 1) * 10 // n AS BIGINT) AS decile,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(ca) AS BIGINT) AS sum_a,
        |  CAST(sum(cb) AS BIGINT) AS sum_b,
        |  CASE WHEN sum(ca) > 0 THEN
        |    CAST(sum(cb) * 1000000 // sum(ca) AS BIGINT) END
        |    AS b_over_a_micro
        |FROM r GROUP BY 1 ORDER BY decile""".stripMargin) { (s, d) =>
      val u = t(s, d, "events")
        .select(col("user_id"),
          when(substring(md5(col("event_id").cast("string")
            .cast("binary")), 1, 1) < "8", 1L).otherwise(0L).as("a"))
        .groupBy(col("user_id"))
        .agg(sum(col("a")).cast("long").as("ca"),
          (count(lit(1)) - sum(col("a"))).cast("long").as("cb"))
      val wR = Window.orderBy(col("ca").desc, col("user_id"))
      val wN = Window.partitionBy()
      u.withColumn("rk", row_number().over(wR).cast("long"))
        .withColumn("n", count(lit(1)).over(wN))
        .groupBy(expr("CAST((rk - 1) * 10 div n AS BIGINT)").as("decile"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("ca")).cast("long").as("sum_a"),
          sum(col("cb")).cast("long").as("sum_b"))
        .select(col("decile"), col("n_users"), col("sum_a"), col("sum_b"),
          when(col("sum_a") > 0,
            expr("CAST(sum_b * 1000000 div sum_a AS BIGINT)"))
            .as("b_over_a_micro"))
        .orderBy(col("decile"))
    },

    // ---- Winner's-curse-CORRECTED leaderboard (r12 ask #7c): q326
    //      shows the curse (top-decile A-half winners regress in the
    //      B half); q289 supplies the cure (empirical-Bayes
    //      shrinkage). THIS composes them: rank users by their
    //      A-half purchase rate, shrink every rate toward the grand
    //      mean with the q289 prior (m = mean A-half exposure), and
    //      report the raw top-10 with raw rank, shrunk rank, and the
    //      HOLDOUT (B-half) rate — the truth proxy the raw rate
    //      overshoots and the shrunk rate should land nearer. The
    //      artifact every "top performers" dashboard should ship
    //      instead of the raw sort. All integer: rates are micro
    //      floor divisions, both rankings are row_number over (rate
    //      DESC, user_id) — deterministic total orders the engines
    //      share. Scale: one per-user agg; the rank windows run
    //      single-partition on the O(users) post-agg table (the q326
    //      note: monster scale swaps in the q63 two-level scheme);
    //      output is 10 rows. ----
    QueryDef.sql("q333_corrected_leaderboard",
      """WITH e AS (SELECT user_id,
        |    CASE WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1)
        |      < '8' THEN 1 ELSE 0 END AS a,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |u AS (SELECT user_id, CAST(sum(a) AS BIGINT) AS na,
        |    CAST(sum(a * y) AS BIGINT) AS ka,
        |    CAST(count(*) - sum(a) AS BIGINT) AS nb,
        |    CAST(sum((1 - a) * y) AS BIGINT) AS kb
        |  FROM e GROUP BY user_id),
        |uf AS (SELECT * FROM u WHERE na > 0 AND nb > 0),
        |gl AS (SELECT CAST(sum(ka) * 1000000 // sum(na) AS BIGINT)
        |      AS pbar,
        |    CAST(sum(na) // count(*) AS BIGINT) AS m FROM uf),
        |sc AS (SELECT uf.user_id, uf.na,
        |    CAST(uf.ka * 1000000 // uf.na AS BIGINT) AS raw_micro,
        |    CAST((uf.ka * 1000000 + gl.m * gl.pbar) // (uf.na + gl.m)
        |      AS BIGINT) AS shrunk_micro,
        |    CAST(uf.kb * 1000000 // uf.nb AS BIGINT) AS b_micro
        |  FROM uf, gl),
        |rk AS (SELECT *,
        |    row_number() OVER (ORDER BY raw_micro DESC, user_id)
        |      AS raw_rank,
        |    row_number() OVER (ORDER BY shrunk_micro DESC, user_id)
        |      AS shrunk_rank
        |  FROM sc)
        |SELECT CAST(raw_rank AS BIGINT) AS raw_rank, user_id,
        |  na AS n_a, raw_micro, shrunk_micro,
        |  CAST(shrunk_rank AS BIGINT) AS shrunk_rank, b_micro
        |FROM rk WHERE raw_rank <= 10 ORDER BY raw_rank""".stripMargin) {
      (s, d) =>
      val u = t(s, d, "events")
        .select(col("user_id"),
          when(substring(md5(col("event_id").cast("string")
            .cast("binary")), 1, 1) < "8", 1L).otherwise(0L).as("a"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("y"))
        .groupBy(col("user_id"))
        .agg(sum(col("a")).cast("long").as("na"),
          sum(col("a") * col("y")).cast("long").as("ka"),
          (count(lit(1)) - sum(col("a"))).cast("long").as("nb"),
          sum((lit(1L) - col("a")) * col("y")).cast("long").as("kb"))
        .filter(col("na") > 0 && col("nb") > 0)
        .localCheckpoint() // O(users): prior agg + the ranked report
      val gl = u.agg(
        expr("CAST(sum(ka) * 1000000 div sum(na) AS BIGINT)").as("pbar"),
        expr("CAST(sum(na) div count(1) AS BIGINT)").as("m"))
      val sc = u.crossJoin(broadcast(gl))
        .select(col("user_id"), col("na"),
          expr("CAST(ka * 1000000 div na AS BIGINT)").as("raw_micro"),
          expr("CAST((ka * 1000000 + m * pbar) div (na + m) AS BIGINT)")
            .as("shrunk_micro"),
          expr("CAST(kb * 1000000 div nb AS BIGINT)").as("b_micro"))
      val wRaw = Window.orderBy(col("raw_micro").desc, col("user_id"))
      val wShr = Window.orderBy(col("shrunk_micro").desc, col("user_id"))
      sc.withColumn("raw_rank", row_number().over(wRaw).cast("long"))
        .withColumn("shrunk_rank", row_number().over(wShr).cast("long"))
        .filter(col("raw_rank") <= 10)
        .select(col("raw_rank"), col("user_id"), col("na").as("n_a"),
          col("raw_micro"), col("shrunk_micro"), col("shrunk_rank"),
          col("b_micro"))
        .orderBy(col("raw_rank"))
    },

    // ---- STREAMING decontamination monitor: the live leg of the
    //      q83/q98 trio — q83 prunes the batch corpus exactly, q98 is
    //      its 100 TB Bloom shape, THIS is the alarm that watches the
    //      ingest stream and reports per-lang contamination rates as
    //      documents arrive. The benchmark probe is a PER-ROW
    //      map-side flag (an `exists` over the doc's own shingles vs
    //      the banned set — broadcastable at any benchmark size via
    //      q98's Bloom; no explode, no shuffle before the fold), so
    //      the complete-mode state is O(langs · 2) counters — the
    //      q220/q301 DOMAIN bound. Assembly at read is one integer
    //      division per lang. A contamination-rate step change on
    //      this monitor is what pages BEFORE a poisoned feed lands in
    //      the next training mix. ----
    QueryDef.sql("q335_stream_decontam",
      """WITH t AS (SELECT doc_id, lang,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |fl AS (SELECT lang, CASE WHEN len(toks) >= 3 AND
        |    len(list_filter(list_transform(range(len(toks)-2),
        |      i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]),
        |      g -> g IN ('stream table hash', 'row column sort',
        |        'window fast query'))) > 0
        |  THEN 1 ELSE 0 END AS bad FROM t)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(bad) AS BIGINT) AS n_contaminated,
        |  CAST(sum(bad) * 1000000 // count(*) AS BIGINT)
        |    AS contam_micro
        |FROM fl GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      // NOT "doclangfeed": q305 already caches that tag with a
      // (doc_id, lang, n_chars) schema — feeds cache per (tag, dir,
      // JVM), and the single-JVM bench run surfaces the collision
      // the per-query Verify subset cannot
      val feedDir = graft.bench.BenchFeeds.feed(s, d, "doctextfeed",
        idCol = "doc_id", checkSpan = false)(docs)
      val sink = graft.bench.BenchFeeds.sinkName("q335_decontam")
      graft.streaming.StreamRun.withStatePartitions(s, 8) {
        val q = s.readStream
          .schema(s.read.parquet(feedDir).schema)
          .option("maxFilesPerTrigger", 2)
          .parquet(feedDir)
          .select(col("lang"),
            split(lower(trim(col("text"))), "\\s+").as("toks"))
          .select(col("lang"),
            when(size(col("toks")) >= 3 && expr(
              """exists(transform(sequence(0, size(toks) - 3), i ->
                |  concat_ws(' ', toks[i], toks[i+1], toks[i+2])),
                |  g -> g IN ('stream table hash', 'row column sort',
                |    'window fast query'))""".stripMargin),
              1L).otherwise(0L).as("bad"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("bad")).as("nbad"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink)
        .select(col("lang"), col("n").cast("long").as("n_docs"),
          col("nbad").cast("long").as("n_contaminated"),
          expr("CAST(nbad * 1000000 div n AS BIGINT)")
            .as("contam_micro"))
        .orderBy(col("lang"))
    },

    // ---- Exact two-sample Kolmogorov–Smirnov drift per source: the
    //      distribution-free companion to PSI (q217 — binned, tuned)
    //      and Wasserstein (q221 — magnitude-weighted): KS reads the
    //      single worst CDF gap between a source's length
    //      distribution and the REST of the corpus, plus WHERE it
    //      opens (the split length — the actionable readout: "this
    //      feed diverges below 200 chars"). EXACT integers end to
    //      end: the gap at support value v is |cumA·nB − cumB·nA|
    //      (cross-multiplied — never a float CDF), maximized by ONE
    //      min_by over the dense source × support grid with the
    //      smallest-v tie-break; ks_micro divides once at the end
    //      (DECIMAL fence: cum·n products overflow BIGINT past ~3·10⁹
    //      rows). Scale: one (source, length) count agg; the grid is
    //      O(sources · distinct lengths) — domain-sized, the q217
    //      shape; output O(sources). ----
    QueryDef.sql("q327_ks_drift", ksOracle) { (s, d) =>
      // ONE corpus exchange: the (source, length) support; the grid,
      // CDF windows, and argmax all derive from it post-agg (assembly
      // shared with the q328 STREAMING twin via ksTail)
      ksTail(t(s, d, "documents")
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint())
    },

    // ---- STREAMING twin of q327: the KS drift monitor folding on
    //      the live document feed. The (source, length) count fold
    //      runs complete-mode with DOMAIN-sized state (sources ·
    //      distinct lengths — the q220/q301 bound), and the dense
    //      grid, integer CDF windows, cross-multiplied gaps, and
    //      argmax all assemble AT READ through the SHARED ksTail
    //      against q327's VERBATIM oracle — the worst-CDF-gap alarm
    //      becomes a live metric with zero batch/stream divergence.
    //      ----
    QueryDef.sql("q328_stream_ks_drift", ksOracle) { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val feedDir = graft.bench.BenchFeeds.feed(s, d, "doclenfeed",
        idCol = "doc_id", checkSpan = false)(docs)
      val sink = graft.bench.BenchFeeds.sinkName("q328_ks")
      graft.streaming.StreamRun.withStatePartitions(s, 8) {
        val q = s.readStream
          .schema(s.read.parquet(feedDir).schema)
          .option("maxFilesPerTrigger", 2)
          .parquet(feedDir)
          .groupBy(col("source"), col("n_chars").as("v"))
          .agg(count(lit(1)).as("c"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
      }
      ksTail(s.table(sink)
        .select(col("source"), col("v"), col("c").cast("long").as("c"))
        .localCheckpoint())
    })

  /** DuckDB CTE chain for q310's 3-round integer-micro IPF over the
    * (lang × source) cell table — shared by q312's ESS read-out so
    * the weights the two queries see are provably identical. Defines
    * `cell`, targets `tl`/`ts`, and rounds `w0`..`w3`. */
  private lazy val rakingCte: String = {
    val rounds = (1 to 3).map { i =>
      s"""r${i}m AS (SELECT w.lang, sum(w.n * w.w) AS cur
         |  FROM w${i - 1} w GROUP BY w.lang),
         |r$i AS (SELECT w.lang, w.source, w.n,
         |    CASE WHEN m.cur > 0
         |      THEN (w.w * ((tl.t * 1000000) // m.cur)) // 1000000
         |      ELSE w.w END AS w
         |  FROM w${i - 1} w JOIN r${i}m m ON m.lang = w.lang
         |  JOIN tl ON tl.lang = w.lang),
         |c${i}m AS (SELECT w.source, sum(w.n * w.w) AS cur
         |  FROM r$i w GROUP BY w.source),
         |w$i AS (SELECT w.lang, w.source, w.n,
         |    CASE WHEN m.cur > 0
         |      THEN (w.w * ((ts.t * 1000000) // m.cur)) // 1000000
         |      ELSE w.w END AS w
         |  FROM r$i w JOIN c${i}m m ON m.source = w.source
         |  JOIN ts ON ts.source = w.source)""".stripMargin
    }.mkString(",\n")
    s"""cell AS (SELECT lang, source,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM documents GROUP BY lang, source),
       |nn AS (SELECT CAST(sum(n) AS BIGINT) AS nd FROM cell),
       |nl AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS k
       |  FROM cell),
       |ns AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS k
       |  FROM cell),
       |tl AS (SELECT lang, (nn.nd * 1000000) // nl.k AS t
       |  FROM (SELECT DISTINCT lang FROM cell), nn, nl),
       |ts AS (SELECT source, (nn.nd * 1000000) // ns.k AS t
       |  FROM (SELECT DISTINCT source FROM cell), nn, ns),
       |w0 AS (SELECT lang, source, n,
       |    CAST(1000000 AS BIGINT) AS w FROM cell),
       |$rounds""".stripMargin
  }

  /** Spark twin of [[rakingCte]]: the 3-round IPF fixed point on the
    * checkpointed cell table (plan depth O(1) per round). Returns
    * (lang, source, n, w). */
  private def rakedWeights(s: SparkSession, d: String): DataFrame = {
    val cell = t(s, d, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // O(langs·sources): the rounds run here
    val nn = cell.agg(sum(col("n")).cast("long").as("nd"))
    val nl = cell.agg(countDistinct(col("lang")).as("k"))
    val ns = cell.agg(countDistinct(col("source")).as("k"))
    val tl = cell.select(col("lang")).distinct()
      .crossJoin(broadcast(nn)).crossJoin(broadcast(nl))
      .select(col("lang"), expr("(nd * 1000000) div k").as("t"))
      .localCheckpoint()
    val ts = cell.select(col("source")).distinct()
      .crossJoin(broadcast(nn)).crossJoin(broadcast(ns))
      .select(col("source"), expr("(nd * 1000000) div k").as("t"))
      .localCheckpoint()
    var w = cell.withColumn("w", lit(1000000L))
    for (_ <- 1 to 3) {
      val rm = w.groupBy(col("lang"))
        .agg(sum(col("n") * col("w")).cast("long").as("cur"))
      w = w.join(broadcast(rm), "lang").join(broadcast(tl), "lang")
        .select(col("lang"), col("source"), col("n"),
          when(col("cur") > 0,
            expr("(w * ((t * 1000000) div cur)) div 1000000"))
            .otherwise(col("w")).as("w"))
      val cm = w.groupBy(col("source"))
        .agg(sum(col("n") * col("w")).cast("long").as("cur"))
      w = w.join(broadcast(cm), "source").join(broadcast(ts), "source")
        .select(col("lang"), col("source"), col("n"),
          when(col("cur") > 0,
            expr("(w * ((t * 1000000) div cur)) div 1000000"))
            .otherwise(col("w")).as("w"))
        .localCheckpoint() // plan depth O(1) per round
    }
    w
  }
}
