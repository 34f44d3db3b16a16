package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input guard rails: queries whose denominators are
  * data-derived must stay DEFINED (NULL, not NaN / ANSI error) when
  * the data collapses — a constant Z-order dimension, a day whose
  * events all share one timestamp, an A/B population that hashes
  * entirely into one arm, a corpus whose doc ids are all odd. The
  * fixtures are the real sf0.001 tables with one column collapsed, so
  * schemas and everything else stay production-shaped. The DuckDB
  * oracles carry the same guards (div-by-zero is NULL there; here it
  * is an ANSI error or an IEEE NaN — either would diverge).
  */
class DegenerateInputSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("degen").toFile
    tmp.deleteOnExit()
    val d = tmp.getAbsolutePath
    // every order from ONE customer on ONE day: both Z-order ranges 0
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders
      .withColumn("o_custkey",
        lit(42L).cast(orders.schema("o_custkey").dataType))
      .withColumn("o_orderdate",
        lit("1995-06-15").cast(orders.schema("o_orderdate").dataType))
      .write.parquet(s"$d/orders.parquet")
    // one user, one instant: zero total duration; md5('1') starts
    // 'c4' >= '80' so the whole population hashes into arm B
    val events = spark.read.parquet(s"$sf/events.parquet")
    events
      .withColumn("user_id",
        lit(1L).cast(events.schema("user_id").dataType))
      .withColumn("ts",
        lit("2024-03-01 12:00:00").cast(events.schema("ts").dataType))
      .write.parquet(s"$d/events.parquet")
    // all doc ids odd (the doc_id%2=0 half of the corpus is empty)
    // and ONE source (the lang×source table collapses to one column)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs
      .withColumn("doc_id",
        (col("doc_id") * 2 + 1).cast(docs.schema("doc_id").dataType))
      .withColumn("source",
        lit("web").cast(docs.schema("source").dataType))
      .write.parquet(s"$d/documents.parquet")
    // vector 0 moved to its own label: a SINGLETON cluster whose only
    // member IS its centroid (own-distance exactly 0)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    emb
      .withColumn("label",
        when(col("vec_id") === 0L, lit(999))
          .otherwise(col("label")).cast(emb.schema("label").dataType))
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  test("q125: constant Z-order dimensions map to tile 0, no error") {
    val rows = run("q125_zorder_layout")
    assert(rows.length == 1 && rows(0).getInt(0) == 0,
      s"all rows must land in tile 0: ${rows.toSeq}")
    assert(rows(0).getLong(rows(0).fieldIndex("cust_width")) == 0L)
  }

  test("q158: degenerate layout scans everything, read_amp defined") {
    val r = run("q158_zorder_skip_audit")(0)
    assert(r.getLong(r.fieldIndex("rows_scanned")) ==
      r.getLong(r.fieldIndex("rows_total")))
    assert(!r.isNullAt(r.fieldIndex("read_amp_micro")))
  }

  test("q167: zero total duration yields NULL average, not NaN") {
    val rows = run("q167_time_weighted_avg")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("total_dur_us")) == 0L)
      assert(r.isNullAt(r.fieldIndex("twa_micro")),
        s"undefined TWA must be NULL: $r")
    }
  }

  test("q175: an empty arm yields NULL KS statistic, not an error") {
    val rows = run("q175_ks_test")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_a")) == 0L,
        s"the fixture must empty arm A: $r")
      assert(r.isNullAt(r.fieldIndex("ks_micro")),
        s"undefined KS must be NULL: $r")
    }
  }

  test("q165: an empty arm yields NULL t statistic, not an error") {
    val rows = run("q165_abtest")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("n_a")),
        s"the fixture must empty arm A: $r")
      assert(r.isNullAt(r.fieldIndex("t_stat")),
        s"undefined t must be NULL: $r")
    }
  }

  test("q117: an empty corpus half yields NULL drift, not NaN") {
    val rows = run("q117_token_drift")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("c_old")) == 0L)
      assert(r.isNullAt(r.fieldIndex("drift")),
        s"undefined drift must be NULL: $r")
    }
  }

  test("q170: a single-source corpus yields NULL Cramér's V") {
    val r = run("q170_chi2_independence")(0)
    assert(r.getLong(r.fieldIndex("dof")) == 0L)
    assert(r.isNullAt(r.fieldIndex("cramers_v")),
      s"V over a 1-column table must be NULL: $r")
  }

  test("q116: a singleton cluster yields NULL margin, not Infinity") {
    val rows = run("q116_embed_outliers")
    val solo = rows.filter(_.getInt(0) == 999)
    assert(solo.length == 1, s"label 999 must report its one vector")
    val r = solo(0)
    assert(r.isNullAt(r.fieldIndex("margin")),
      s"margin of a zero-own-distance vector must be NULL: $r")
    assert(rows.exists(r2 => !r2.isNullAt(r2.fieldIndex("margin"))),
      "non-degenerate clusters must keep a defined margin")
  }

  test("q180: single-doc sources yield NULL slopes, not an error") {
    // separate fixture dir: every source is a singleton (source =
    // the doc id), so NO source has the 2 points a slope needs
    val tmp = Files.createTempDirectory("degen180").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs
      .withColumn("source",
        col("doc_id").cast("string").cast(docs.schema("source").dataType))
      .write.parquet(s"$d2/documents.parquet")
    val rows = SparkEntry.queries("q180_quality_trend")(spark, d2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n")) == 1L)
      assert(r.isNullAt(r.fieldIndex("slope_milli_per_doc")),
        s"a 1-point regression must have NULL slope: $r")
    }
  }

  test("q126: an edgeless graph yields NULL clustering coefficient") {
    val r = run("q126_triangle_count")(0)
    assert(r.getLong(r.fieldIndex("n_edges")) == 0L)
    assert(r.isNullAt(r.fieldIndex("global_cc")))
  }

  test("q182: an empty arm yields NULL rank-sum z, not an error") {
    // the shared fixture hashes the whole population into arm B
    val rows = run("q182_mannwhitney")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_a")) == 0L)
      assert(r.isNullAt(r.fieldIndex("z_stat")),
        s"σ is undefined with an empty arm — z must be NULL: $r")
    }
  }

  test("q192: a one-arm population leaves an EMPTY test family") {
    // every (etype, hour) cell is missing arm A, so the n>1 family
    // filter drops all of them — the output is empty, never a
    // NULL-propagating t or a division error
    val rows = run("q192_fdr_bh")
    assert(rows.isEmpty, s"degenerate cells must leave the family: " +
      s"${rows.toSeq}")
  }

  test("q185: a single-token corpus yields NULL Zipf slope") {
    // separate fixture: every document is the SAME one-token text, so
    // each source's vocabulary is a single rank point (n_types = 1 —
    // and lr is constant 0, the denominator's other zero path)
    val tmp = Files.createTempDirectory("degen185").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.withColumn("text", lit("x").cast(docs.schema("text").dataType))
      .write.parquet(s"$d2/documents.parquet")
    val rows = SparkEntry.queries("q185_zipf_slope")(spark, d2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_types")) == 1L)
      assert(r.isNullAt(r.fieldIndex("zipf_slope")),
        s"a 1-point log-log fit must have NULL slope: $r")
    }
  }

  test("q186: an edgeless supply graph yields an empty scoreboard") {
    // separate fixture: no line item passes the quantity gate, so the
    // edge list is empty — every iteration's max-rescale runs over an
    // empty aggregate and must produce no rows, never a div-by-NULL
    val tmp = Files.createTempDirectory("degen186").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    li.withColumn("l_quantity",
        lit(1.0).cast(li.schema("l_quantity").dataType))
      .write.parquet(s"$d2/lineitem.parquet")
    val rows = SparkEntry.queries("q186_hits")(spark, d2).collect()
    assert(rows.isEmpty, s"an edgeless graph must score nothing: " +
      s"${rows.toSeq}")
  }

  test("q194: a single-hour series yields an empty ACF table") {
    // the shared fixture pins every event to one instant, so the hour
    // spine is one point — no (t, t+lag) pair exists and the output is
    // empty, never a div-by-zero on the all-zero-centered denominator
    val rows = run("q194_hourly_acf")
    assert(rows.isEmpty, s"one hour has no lagged pairs: ${rows.toSeq}")
  }

  test("q195: both raters constant on the same class yields NULL kappa") {
    // separate fixture: lang='en' everywhere AND text = pure English
    // stopwords, so pred='en' everywhere too — pe = 1 and the kappa
    // denominator N²−penum is exactly 0
    val tmp = Files.createTempDirectory("degen195").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.withColumn("lang", lit("en").cast(docs.schema("lang").dataType))
      .withColumn("text",
        lit("the of and").cast(docs.schema("text").dataType))
      .write.parquet(s"$d2/documents.parquet")
    val r = SparkEntry.queries("q195_langid_kappa")(spark, d2).collect()(0)
    assert(r.getDouble(r.fieldIndex("po")) == 1.0)
    assert(r.getDouble(r.fieldIndex("pe")) == 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa")),
      s"pe=1 leaves kappa undefined — must be NULL: $r")
  }

  test("q197: an empty observed arm yields NULL stat and NULL p") {
    // the shared fixture's single user hashes into arm B (md5('1')
    // starts 'c4'), so the observed statistic — and therefore the
    // p-value — is undefined; permutations that split the same way
    // contribute 0 to the count, never an error
    val rows = run("q197_permutation_test")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_a")) == 0L)
      assert(r.isNullAt(r.fieldIndex("obs_stat")), s"obs must be NULL: $r")
      assert(r.isNullAt(r.fieldIndex("p_value")), s"p must be NULL: $r")
    }
  }

  test("q198: a corpus with no churned users yields an empty curve") {
    // the shared fixture pins every event to one instant: the single
    // user's last event IS the horizon, so it is censored — zero
    // deaths means zero product-limit steps, never a ln(0)
    val rows = run("q198_kaplan_meier")
    assert(rows.isEmpty, s"no deaths ⇒ no steps: ${rows.toSeq}")
  }

  test("q200: an all-nonpositive value column yields an empty audit") {
    // separate fixture: every value is 0, so no row has a first digit
    // — the audit is empty, never a log-of-zero or a 0/0 cell
    val tmp = Files.createTempDirectory("degen200").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val ev = spark.read.parquet(s"$sf/events.parquet")
    ev.withColumn("value", lit(0.0).cast(ev.schema("value").dataType))
      .write.parquet(s"$d2/events.parquet")
    val rows = SparkEntry.queries("q200_benford_audit")(spark, d2).collect()
    assert(rows.isEmpty, s"no positive values ⇒ no digits: ${rows.toSeq}")
  }

  test("q201: a single-source corpus has MI 0 and H(source) 0") {
    // the shared fixture's one feed makes source a constant: zero
    // entropy, zero information shared with lang — exact zeros, not
    // NaNs (every ln argument is exactly 1)
    val r = run("q201_lang_source_mi")(0)
    assert(r.getDouble(r.fieldIndex("mi_nats")) == 0.0, s"mi: $r")
    assert(r.getDouble(r.fieldIndex("h_source_nats")) == 0.0, s"hs: $r")
    assert(r.getDouble(r.fieldIndex("h_lang_nats")) > 0.0, s"hl: $r")
  }

  test("q202: variance-free strata fall back to proportional shares") {
    // separate fixture: n_chars constant, so every Neyman weight is 0
    // — the divisor guard swaps in proportional allocation and the
    // budget still lands exactly
    val tmp = Files.createTempDirectory("degen202").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.withColumn("n_chars", lit(100L).cast(docs.schema("n_chars").dataType))
      .write.parquet(s"$d2/documents.parquet")
    val rows = SparkEntry.queries("q202_neyman_allocation")(spark, d2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("wgt")) == 0L, s"wgt must be 0: $r")
    }
    assert(rows.map(r => r.getLong(r.fieldIndex("alloc"))).sum == 10000L,
      "the budget must still apportion exactly")
  }

  test("q203: a constant value column makes all three means coincide") {
    // separate fixture: value = 1.0 everywhere, so trimming and
    // winsorizing change nothing — one support row covers every rank
    // and the kept interval is the whole population
    val tmp = Files.createTempDirectory("degen203").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val ev = spark.read.parquet(s"$sf/events.parquet")
    ev.withColumn("value", lit(1.0).cast(ev.schema("value").dataType))
      .write.parquet(s"$d2/events.parquet")
    val rows =
      SparkEntry.queries("q203_trimmed_winsor_mean")(spark, d2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("mean_micro")) == 1000000L)
      assert(r.getLong(r.fieldIndex("trimmed_mean_micro")) == 1000000L)
      assert(r.getLong(r.fieldIndex("winsor_mean_micro")) == 1000000L)
    }
  }

  test("q204: a one-token corpus has no bigrams and an empty table") {
    // reuse the q185-style fixture: every document is one token, so
    // no (w1, w2) pair exists — empty output, never a ln(0) or 0/0
    val tmp = Files.createTempDirectory("degen204").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.withColumn("text", lit("x").cast(docs.schema("text").dataType))
      .write.parquet(s"$d2/documents.parquet")
    val rows =
      SparkEntry.queries("q204_bigram_entropy_rate")(spark, d2).collect()
    assert(rows.isEmpty, s"one-token docs yield no bigrams: ${rows.toSeq}")
  }

  test("q206: a single-source corpus has exactly zero drift") {
    // the shared fixture's one feed IS the pooled distribution, so
    // every |F_s − F_pool| gap is exactly 0 — integer-exact zero,
    // not a rounding-small float
    val rows = run("q206_wasserstein_drift")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("w1_micro_chars")) == 0L, s"w1: $r")
    }
  }

  test("q207: an all-zero embedding table yields NULL anisotropy") {
    // separate fixture: every vector is the zero vector — both norms
    // are 0 and the ratio is undefined; the guard must emit NULL,
    // never a div-by-zero error or a 0/0 artifact
    val tmp = Files.createTempDirectory("degen207").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    emb.withColumn("embedding",
        expr("transform(embedding, x -> CAST(0.0 AS FLOAT))")
          .cast(emb.schema("embedding").dataType))
      .write.parquet(s"$d2/embeddings.parquet")
    val r = SparkEntry.queries("q207_embedding_isotropy")(spark, d2)
      .collect()(0)
    assert(r.isNullAt(r.fieldIndex("anisotropy_micro")),
      s"0/0 must be NULL: $r")
  }

  test("q208: a constant-text corpus has zero rank variance, NULL rho") {
    // every document scores identically, so the quality ranks are one
    // big tie — zero variance on the y side must yield NULL, never a
    // 0/0 NaN
    val tmp = Files.createTempDirectory("degen208").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.withColumn("text", lit("x").cast(docs.schema("text").dataType))
      .write.parquet(s"$d2/documents.parquet")
    val rows =
      SparkEntry.queries("q208_quality_length_spearman")(spark, d2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("spearman_rho")),
        s"all-tied ranks must yield NULL: $r")
    }
  }

  test("q209: a single-source corpus is exactly one run, ratio 1") {
    // the shared fixture's one feed means no adjacent pair can differ:
    // R = 1, E[R] = 1, and the mix ratio is EXACTLY 1.0 in micro —
    // integer identities, not approximations
    val r = run("q209_shuffle_runs_test")(0)
    assert(r.getLong(r.fieldIndex("n_runs")) == 1L)
    assert(r.getLong(r.fieldIndex("expected_runs_micro")) == 1000000L)
    assert(r.getLong(r.fieldIndex("mix_ratio_micro")) == 1000000L)
  }

  test("q210: a pairless corpus has NULL recalls and Chapman 0") {
    // separate fixture: every document is a unique single token, so
    // neither detector fires — both recall denominators are 0 (NULL)
    // while Chapman's +1 correction keeps ITS estimate defined at 0
    val tmp = Files.createTempDirectory("degen210").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.withColumn("text",
        concat(lit("tok"), col("doc_id").cast("string"))
          .cast(docs.schema("text").dataType))
      .write.parquet(s"$d2/documents.parquet")
    val r = SparkEntry.queries("q210_dedup_recall_capture")(spark, d2)
      .collect()(0)
    assert(r.getLong(r.fieldIndex("n_minhash")) == 0L, s"a: $r")
    assert(r.getLong(r.fieldIndex("n_simhash")) == 0L, s"b: $r")
    assert(r.getLong(r.fieldIndex("chapman_est")) == 0L, s"chapman: $r")
    assert(r.isNullAt(r.fieldIndex("recall_minhash_micro")), s"ra: $r")
    assert(r.isNullAt(r.fieldIndex("recall_simhash_micro")), s"rb: $r")
  }

  test("q211: a single-instant feed has only lag-0 rows, all NULL ccf") {
    // the shared fixture's one-hour global spine leaves no shifted
    // pair for lag ≠ 0, and the lag-0 centered products are all zero
    // (n = 1 ⇒ c = 0) — the zero-variance guard must say NULL
    val rows = run("q211_crosscorr_leadlag")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(r.fieldIndex("lag")) == 0, s"only lag 0 exists: $r")
      assert(r.isNullAt(r.fieldIndex("ccf")), s"0/0 must be NULL: $r")
    }
  }

  test("q212: a single-hour series has zero variance, NULL strength") {
    val rows = run("q212_seasonality_strength")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_hours")) == 1L)
      assert(r.isNullAt(r.fieldIndex("seasonality_micro")),
        s"SST = 0 must yield NULL: $r")
    }
  }

  test("q213: a series shorter than two min-segments fits no break") {
    val rows = run("q213_changepoint_fit")
    assert(rows.isEmpty,
      s"1 hour < 48 h of candidates ⇒ empty: ${rows.toSeq}")
  }

  test("q214: one censored user in one arm degenerates CUPED to no-op") {
    // the shared fixture: a single user, every event on day 1 — the
    // outcome period is empty (y = 0), pre-period variance is 0 with
    // n = 1, and arm A is empty: θ must fall back to 0, the arm
    // diffs and the variance ratio must be NULL, never errors
    val r = run("q214_cuped_adjustment")(0)
    assert(r.getLong(r.fieldIndex("n_users")) == 1L)
    assert(r.getLong(r.fieldIndex("theta_micro")) == 0L)
    assert(r.isNullAt(r.fieldIndex("diff_raw_micro")))
    assert(r.isNullAt(r.fieldIndex("diff_cuped_micro")))
    assert(r.isNullAt(r.fieldIndex("var_reduction_micro")))
  }

  test("q215/q216: a pairless corpus — empty matrix, NULL leak rate") {
    // unique-single-token documents fire neither detector (the q210
    // fixture): the duplication matrix is empty and the fold-leakage
    // observed fraction is NULL while its expectation stays defined
    val tmp = Files.createTempDirectory("degen215").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.withColumn("text",
        concat(lit("tok"), col("doc_id").cast("string"))
          .cast(docs.schema("text").dataType))
      .write.parquet(s"$d2/documents.parquet")
    val m = SparkEntry.queries("q215_crosssource_dups")(spark, d2).collect()
    assert(m.isEmpty, s"no pairs ⇒ empty matrix: ${m.toSeq}")
    val r = SparkEntry.queries("q216_fold_leakage")(spark, d2).collect()(0)
    assert(r.getLong(r.fieldIndex("n_pairs")) == 0L)
    assert(r.isNullAt(r.fieldIndex("cross_frac_micro")))
    assert(r.getLong(r.fieldIndex("expected_frac_micro")) > 0L,
      s"the expectation comes from fold sizes, not pairs: $r")
  }

  test("q218: an empty arm yields NULL MDE but a defined n_req") {
    // the shared fixture's population hashes entirely into arm B —
    // the current-design MDE is undefined (no arm A), while the
    // required-n planning number needs only the pooled moments
    val rows = run("q218_power_planning")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("na")) == 0L)
      assert(r.isNullAt(r.fieldIndex("mde_micro")), s"mde: $r")
      assert(!r.isNullAt(r.fieldIndex("n_req_per_arm")), s"n_req: $r")
    }
  }

  test("q219: a single-hour series has exactly zero dispersion") {
    // one spine point ⇒ variance numerator n·Σx²−(Σx)² is exactly 0
    // and the Fano factor is the integer 0, not a NULL or an error
    val rows = run("q219_fano_burstiness")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_hours")) == 1L)
      assert(r.getLong(r.fieldIndex("fano_micro")) == 0L, s"fano: $r")
    }
  }

  test("q221/q222: a single user collapses to identical cohorts") {
    // the shared fixture's one user belongs to every type's cohort:
    // all pairwise Jaccards are exactly 1 (denominator 1+1−1 = 1,
    // never 0 — a pair row exists only with c ≥ 1), and the entropy
    // profile is one k=5 row for one user
    val m = run("q221_audience_overlap")
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getLong(r.fieldIndex("jaccard_micro")) == 1000000L, s"$r")
    }
    val p = run("q222_user_entropy_profile")
    assert(p.length == 1 && p(0).getLong(p(0).fieldIndex("n_users")) == 1L)
  }

  test("q223: a single-instant feed has zero gaps and NULL CV²") {
    // every event shares one timestamp, so all intra-day gaps are 0:
    // the mean gap is exactly 0 and CV²'s mean² denominator is 0 —
    // NULL, never a division error
    val rows = run("q223_interarrival_cv2")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("mean_gap_us")) == 0L)
      assert(r.isNullAt(r.fieldIndex("cv2_micro")), s"cv2: $r")
    }
  }

  test("q224: a constant-length corpus has zero variance, NULL moments") {
    val tmp = Files.createTempDirectory("degen224").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.withColumn("n_chars", lit(100L).cast(docs.schema("n_chars").dataType))
      .write.parquet(s"$d2/documents.parquet")
    val r = SparkEntry.queries("q224_loglength_moments")(spark, d2)
      .collect()(0)
    assert(r.isNullAt(r.fieldIndex("skewness")), s"skew: $r")
    assert(r.isNullAt(r.fieldIndex("kurtosis")), s"kurt: $r")
  }

  test("q225: a closed one-token vocabulary has Heaps beta exactly 0") {
    // constant text ⇒ V = 1 at every prefix ⇒ ln V ≡ 0 ⇒ the fitted
    // slope is the exact integer-moment zero, not a near-zero float
    val tmp = Files.createTempDirectory("degen225").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.withColumn("text", lit("x").cast(docs.schema("text").dataType))
      .write.parquet(s"$d2/documents.parquet")
    val r = SparkEntry.queries("q225_heaps_exponent")(spark, d2)
      .collect()(0)
    assert(r.getDouble(r.fieldIndex("heaps_beta")) == 0.0, s"beta: $r")
  }

  test("q228/q233: an all-empty-doc corpus samples and reports NULL gini") {
    // n_chars ≡ 0 collapses BOTH new length-derived denominators: the
    // A-ES key's weight (0 ⇒ inf key ⇒ long overflow without the
    // greatest(1,·) guard) and the Gini total (0 ⇒ div-by-zero)
    val tmp = Files.createTempDirectory("degen228").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.withColumn("n_chars", lit(0L).cast(docs.schema("n_chars").dataType))
      .write.parquet(s"$d2/documents.parquet")
    val sampled = SparkEntry.queries("q228_weighted_sample")(spark, d2)
      .collect()
    assert(sampled.nonEmpty, "uniform fallback sample must still draw")
    val gini = SparkEntry.queries("q233_length_gini")(spark, d2).collect()
    assert(gini.nonEmpty)
    gini.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("gini_micro")), s"gini: $r")
    }
  }

  test("q239: a single-class outcome (all predictions wrong) has NULL AUC") {
    // lang ≡ 'xx' matches no classifier output ⇒ n_correct = 0 ⇒ the
    // rank-sum denominator n1·n0 is 0 — NULL, not a div-by-zero seam
    val tmp = Files.createTempDirectory("degen239").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.withColumn("lang", lit("xx").cast(docs.schema("lang").dataType))
      .write.parquet(s"$d2/documents.parquet")
    val r = SparkEntry.queries("q239_langid_auc")(spark, d2).collect()(0)
    assert(r.getLong(r.fieldIndex("n_correct")) == 0L, s"row: $r")
    assert(r.isNullAt(r.fieldIndex("auc_micro")), s"row: $r")
  }

  test("q240/q241: a single-instant feed — no trained model, no funnel") {
    // the shared fixture's events all share one post-split timestamp:
    // q240's training half is EMPTY (every pair lands in test ⇒ NULL
    // prediction and NULL Brier via the left join, observed still
    // defined); q241's strictly-after step chain can never advance
    // (equal timestamps ⇒ no click after the first view ⇒ 0/0 funnel
    // tail with NULL conv23 and NULL median, conv12 exactly 0)
    val cal = run("q240_seq_calibration")
    assert(cal.nonEmpty)
    cal.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("p_pred_micro")), s"row: $r")
      assert(r.isNullAt(r.fieldIndex("brier")), s"row: $r")
      assert(!r.isNullAt(r.fieldIndex("p_obs_micro")), s"row: $r")
    }
    val f = run("q241_windowed_funnel")(0)
    assert(f.getLong(f.fieldIndex("step2_users")) == 0L, s"row: $f")
    assert(f.getLong(f.fieldIndex("conv12_micro")) == 0L, s"row: $f")
    assert(f.isNullAt(f.fieldIndex("conv23_micro")), s"row: $f")
    assert(f.isNullAt(f.fieldIndex("median2_complete_us")), s"row: $f")
  }

  test("q242: a constant-length tail has zero excess mass, NULL alpha") {
    // n_chars ≡ 100 ⇒ every top-k ln equals ln x_(k+1) ⇒ the Hill sum
    // is exactly 0 and 1/H must be NULL, not an ANSI division error
    val tmp = Files.createTempDirectory("degen242").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.withColumn("n_chars", lit(100L).cast(docs.schema("n_chars").dataType))
      .write.parquet(s"$d2/documents.parquet")
    val rows = SparkEntry.queries("q242_hill_tail")(spark, d2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("hill_sum_micro")) == 0L, s"row: $r")
      assert(r.isNullAt(r.fieldIndex("alpha_micro")), s"row: $r")
    }
  }

  test("q243/q244: a constant-length corpus has NULL F and NULL H") {
    // n_chars ≡ 100 ⇒ SSW = SSB = 0 (q243's guard) and the rank
    // variance denominator s4 − n(n+1)² = 0 (q244's guard) — NULL,
    // never a division error; the exact integer counts stay defined
    val tmp = Files.createTempDirectory("degen243").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.withColumn("n_chars", lit(100L).cast(docs.schema("n_chars").dataType))
      .write.parquet(s"$d2/documents.parquet")
    val f = SparkEntry.queries("q243_anova_f")(spark, d2).collect()(0)
    assert(f.getLong(f.fieldIndex("ssb_micro")) == 0L, s"row: $f")
    assert(f.getLong(f.fieldIndex("ssw_micro")) == 0L, s"row: $f")
    assert(f.isNullAt(f.fieldIndex("f_micro")), s"row: $f")
    assert(f.isNullAt(f.fieldIndex("eta2_micro")), s"row: $f")
    val h = SparkEntry.queries("q244_kruskal_wallis")(spark, d2).collect()(0)
    assert(h.getLong(h.fieldIndex("n_total")) > 0L, s"row: $h")
    assert(h.isNullAt(h.fieldIndex("h_micro")), s"row: $h")
  }

  test("q245: a zero-positive population has NULL recall and lift") {
    // views-only feed ⇒ nobody reaches 15 purchases ⇒ B = 0: depth
    // stays defined, recall/lift are NULL — never a div-by-zero
    val tmp = Files.createTempDirectory("degen245").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "view")
      .write.parquet(s"$d2/events.parquet")
    val rows = SparkEntry.queries("q245_gains_curve")(spark, d2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("depth_micro")), s"row: $r")
      assert(r.isNullAt(r.fieldIndex("recall_micro")), s"row: $r")
      assert(r.isNullAt(r.fieldIndex("lift_micro")), s"row: $r")
    }
  }

  test("q246/q247: a one-user feed — constant marginals, empty graph") {
    // one user ⇒ a single contingency cell (both tie-corrected
    // variances are exactly 0 ⇒ NULL τ-b) and no co-occurrence pair
    // at all (0 edges ⇒ zero endpoint variance ⇒ NULL r)
    val kt = run("q246_kendall_tau")(0)
    assert(kt.getLong(kt.fieldIndex("n_users")) == 1L, s"row: $kt")
    assert(kt.isNullAt(kt.fieldIndex("tau_b")), s"row: $kt")
    val as = run("q247_assortativity")(0)
    assert(as.getLong(as.fieldIndex("n_edges")) == 0L, s"row: $as")
    assert(as.isNullAt(as.fieldIndex("assortativity")), s"row: $as")
  }

  test("q248: a pool smaller than k yields min(k, pool) ranks, no error") {
    // 5 vectors ⇒ a 4-candidate pool (the query vector is excluded):
    // the greedy walk must exhaust the pool and stop at rank 4 with
    // every later iteration contributing nothing
    val tmp = Files.createTempDirectory("degen248").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 5)
      .write.parquet(s"$d2/embeddings.parquet")
    val rows = SparkEntry.queries("q248_mmr_rerank")(spark, d2).collect()
    assert(rows.length == 4, s"rows: ${rows.toSeq}")
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
  }

  test("q249: a singleton label IS its centroid — silhouette exactly 1") {
    // the shared fixture moves vec 0 to its own label 999: a = 0 and
    // b > 0 force s = 1e6 with no division hazard
    val r = run("q249_silhouette").filter(_.getInt(0) == 999)
    assert(r.length == 1, s"rows: ${r.toSeq}")
    assert(r(0).getLong(r(0).fieldIndex("n_vecs")) == 1L)
    assert(r(0).getLong(r(0).fieldIndex("mean_sil_micro")) == 1000000L)
    assert(r(0).getLong(r(0).fieldIndex("n_negative")) == 0L)
  }

  test("q250: a 4-candidate corpus fuses to 4 ranks, both lists full") {
    // both retriever lists hold all 4 candidates, so every fused row
    // carries BOTH ranks and the output stops at the pool size
    val tmp = Files.createTempDirectory("degen250").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 5)
      .write.parquet(s"$d2/embeddings.parquet")
    val rows = SparkEntry.queries("q250_rrf_fusion")(spark, d2).collect()
    assert(rows.length == 4, s"rows: ${rows.toSeq}")
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("rank_full"))
      && !r.isNullAt(r.fieldIndex("rank_trunc"))), s"rows: ${rows.toSeq}")
  }

  private lazy val singleLabelCandidatesDir: String = {
    // candidates collapsed to ONE label (3): only the label-3 query
    // (qid 6 in sf0.001) can ever see gain > 0 / a relevant hit
    val tmp = Files.createTempDirectory("degen251").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 10 || col("label") === 3)
      .write.parquet(s"$d2/embeddings.parquet")
    d2
  }

  test("q251: a query whose label group misses the pool gets NULL nDCG") {
    // all candidates are label 3 ⇒ every query but qid 6 has
    // idcg = 0: the guard must emit NULL, never a division error
    val rows = SparkEntry.queries("q251_ndcg")(
      spark, singleLabelCandidatesDir).collect()
    assert(rows.length == 10, s"rows: ${rows.toSeq}")
    val (hit, miss) = rows.partition(_.getLong(0) == 6L)
    assert(hit.length == 1 &&
      hit(0).getLong(hit(0).fieldIndex("ndcg_micro")) == 1000000L,
      s"the label-3 query retrieves only gain-2 docs: ${hit.toSeq}")
    assert(miss.forall(r => r.isNullAt(r.fieldIndex("ndcg_micro"))),
      s"rows: ${miss.toSeq}")
  }

  test("q252: queries with no relevant candidate score rr 0, mean 1/10") {
    val rows = SparkEntry.queries("q252_mrr")(
      spark, singleLabelCandidatesDir).collect()
    assert(rows.length == 11, s"rows: ${rows.toSeq}")
    val byQid = rows.map(r => r.getLong(0) -> r).toMap
    assert(byQid(6L).getLong(2) == 1000000L, s"rows: ${rows.toSeq}")
    assert((0L to 9L).filter(_ != 6L).forall { q =>
      byQid(q).isNullAt(1) && byQid(q).getLong(2) == 0L
    }, s"rows: ${rows.toSeq}")
    assert(byQid(-1L).getLong(2) == 100000L, s"rows: ${rows.toSeq}")
  }

  test("q253: a pairless event log yields an empty community report") {
    // the shared fixture collapses events to ONE user: no co-occurrence
    // pair exists, the symmetrized edge list is empty, and all four
    // LPA rounds run over nothing without erroring
    assert(run("q253_label_propagation").isEmpty)
  }

  test("q254: a single-label corpus has no cluster pairs — summary NULL") {
    // all vectors one label ⇒ the centroid-pair table is empty, so no
    // per-label row survives and the label = −1 mean guard must emit
    // NULL rather than divide by count 0
    val tmp = Files.createTempDirectory("degen254").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("label", lit(7))
      .write.parquet(s"$d2/embeddings.parquet")
    val rows = SparkEntry.queries("q254_davies_bouldin")(spark, d2).collect()
    assert(rows.length == 1, s"rows: ${rows.toSeq}")
    assert(rows(0).getLong(0) == -1L && rows(0).isNullAt(1)
      && rows(0).isNullAt(2), s"rows: ${rows.toSeq}")
  }

  test("q255: 4-candidate lists still emit all 20 depths, overlap 4") {
    val tmp = Files.createTempDirectory("degen255").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 5)
      .write.parquet(s"$d2/embeddings.parquet")
    val rows = SparkEntry.queries("q255_rbo")(spark, d2).collect()
    assert(rows.length == 20, s"rows: ${rows.toSeq}")
    // past depth 4 both 4-row lists are exhausted: overlap pins at 4
    assert(rows.last.getLong(rows.last.fieldIndex("overlap")) == 4L,
      s"rows: ${rows.toSeq}")
  }

  test("q252/q256: an empty candidate pool yields only the NULL summary") {
    // vec_id < 5 ⇒ queries exist but candidates (vec_id >= 10) don't:
    // the per-query panel is empty and the mean row must be NULL, not
    // an ANSI division-by-zero error
    val tmp = Files.createTempDirectory("degen256").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 5)
      .write.parquet(s"$d2/embeddings.parquet")
    for (q <- Seq("q252_mrr", "q256_matryoshka_recall")) {
      val rows = SparkEntry.queries(q)(spark, d2).collect()
      assert(rows.length == 1, s"$q rows: ${rows.toSeq}")
      assert(rows(0).getLong(0) == -1L && rows(0).isNullAt(1)
        && rows(0).isNullAt(2), s"$q rows: ${rows.toSeq}")
    }
  }

  test("q257: both policies stay defined on a 1-document corpus") {
    val tmp = Files.createTempDirectory("degen257").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") === 0L)
      .write.parquet(s"$d2/documents.parquet")
    val rows = SparkEntry.queries("q257_shard_rebalance")(spark, d2).collect()
    // one row per policy: the single doc sits in exactly one shard each
    assert(rows.length == 2, s"rows: ${rows.toSeq}")
    assert(rows.forall(_.getLong(2) == 1L), s"rows: ${rows.toSeq}")
  }

  test("q258: a single-basket log clears no support threshold — empty") {
    // one user at one instant ⇒ exactly one (user, day) basket: every
    // triple has n_abc = 1 < 5, so the rule table is empty, not an
    // error (and no division ever sees the empty side)
    assert(run("q258_assoc_rules").isEmpty)
  }

  test("q259: a single-user population admits no split — empty") {
    // one user ⇒ one support row whose cumulative count equals N: the
    // nl < n guard leaves no candidate threshold and no gini division
    // runs against an empty side
    assert(run("q259_decision_stump").isEmpty)
  }

  test("q260: a same-instant log attributes every purchase to (none)") {
    // all events share one timestamp: no touch is STRICTLY prior, so
    // both models route all credit to the unattributed bucket
    val rows = run("q260_attribution")
    assert(rows.length == 1, s"rows: ${rows.toSeq}")
    assert(rows(0).getString(0) == "(none)", s"rows: ${rows.toSeq}")
    assert(rows(0).getLong(1) == rows(0).getLong(3), s"rows: ${rows.toSeq}")
  }

  test("q261: a one-hour series has no lag — NULL MASE, no error") {
    val rows = run("q261_mase_forecast")
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      r.getLong(r.fieldIndex("n_hours")) == 1L &&
        r.isNullAt(r.fieldIndex("mase_micro"))
    }, s"rows: ${rows.toSeq}")
  }

  test("q262: an empty training half leaves only a NULL summary row") {
    // the fixture instant falls in the TEST half: the model table is
    // empty, no test pair scores, and the summary divides nothing —
    // every field NULL, never a zero-division error
    val rows = run("q262_ece")
    assert(rows.length == 1, s"rows: ${rows.toSeq}")
    assert(rows(0).getLong(0) == -1L && (1 to 4).forall(rows(0).isNullAt),
      s"rows: ${rows.toSeq}")
  }

  test("q263: an empty corpus yields an empty risk report, no division") {
    val tmp = Files.createTempDirectory("degen263").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 0)
      .write.parquet(s"$d2/documents.parquet")
    assert(SparkEntry.queries("q263_k_anonymity")(spark, d2)
      .collect().isEmpty)
  }

  test("q264: injected orphans are counted on exactly the broken edge") {
    // halve orders: every lineitem pointing at a dropped order becomes
    // an orphan on lineitem->orders, and orders->customer loses rows
    // but stays consistent — the auditor must flag ONLY the first
    val tmp = Files.createTempDirectory("degen264").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    for (tbl <- Seq("region", "nation", "customer", "supplier", "part",
        "lineitem"))
      spark.read.parquet(s"$sf/$tbl.parquet")
        .write.parquet(s"$d2/$tbl.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.filter(col("o_orderkey") % 2 === 0)
      .write.parquet(s"$d2/orders.parquet")
    val rows = SparkEntry.queries("q264_fk_integrity")(spark, d2).collect()
    val byEdge = rows.map(r => r.getString(0) -> r).toMap
    val li = byEdge("lineitem.l_orderkey->orders")
    assert(li.getLong(li.fieldIndex("n_orphans")) > 0, s"rows: ${rows.toSeq}")
    assert(rows.filter(_.getString(0) != "lineitem.l_orderkey->orders")
      .forall(r => r.getLong(r.fieldIndex("n_orphans")) == 0),
      s"rows: ${rows.toSeq}")
  }

  test("q265: a pairless graph leaves only the NULL mean row") {
    val rows = run("q265_lcc_histogram")
    assert(rows.length == 1, s"rows: ${rows.toSeq}")
    assert(rows(0).getLong(0) == 100L && rows(0).isNullAt(1),
      s"rows: ${rows.toSeq}")
  }

  test("q266/q267: a 3-doc corpus yields a defined frontier and walk") {
    val tmp = Files.createTempDirectory("degen266").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 6) // doc ids are odd in no fixture here
      .limit(3)
      .write.parquet(s"$d2/documents.parquet")
    val sky = SparkEntry.queries("q266_pareto_skyline")(spark, d2).collect()
    assert(sky.nonEmpty && sky.length <= 3, s"rows: ${sky.toSeq}")
    // the greedy walk exhausts a pool smaller than k at min(k, pool)
    val cov = SparkEntry.queries("q267_max_coverage")(spark, d2).collect()
    assert(cov.length == 3, s"rows: ${cov.toSeq}")
    assert(cov.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L),
      s"rows: ${cov.toSeq}")
  }

  test("q268: a one-user one-day log reads DAU = WAU = stickiness 1") {
    val rows = run("q268_dau_wau")
    assert(rows.length == 1, s"rows: ${rows.toSeq}")
    assert(rows(0).getLong(1) == 1L && rows(0).getLong(2) == 1L
      && rows(0).getLong(3) == 1000000L, s"rows: ${rows.toSeq}")
  }

  test("q269: a touchless game is all-zero with a NULL share guard") {
    // same-instant events ⇒ no strictly-prior touch ⇒ every coalition
    // value is 0: shapley 0 everywhere and the v(full) = 0 share
    // division must emit NULL, not an error
    val rows = run("q269_shapley_attribution")
    assert(rows.length == 4, s"rows: ${rows.toSeq}")
    assert(rows.forall(r => r.getLong(1) == 0L && r.isNullAt(2)),
      s"rows: ${rows.toSeq}")
  }

  test("q270/q271: empty tables yield an empty / all-holds report") {
    val tmp = Files.createTempDirectory("degen270").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    for (tbl <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      spark.read.parquet(s"$sf/$tbl.parquet").limit(0)
        .write.parquet(s"$d2/$tbl.parquet")
    for (tbl <- Seq("documents", "events"))
      spark.read.parquet(s"$sf/$tbl.parquet").limit(0)
        .write.parquet(s"$d2/$tbl.parquet")
    // no value domain ⇒ no candidate pair, and no division ever runs
    assert(SparkEntry.queries("q270_joinkey_discovery")(spark, d2)
      .collect().isEmpty)
    // every FD holds vacuously with integer-zero counts (the oracle's
    // scalar subqueries read 0, so NULL sums would hash-diverge)
    val fds = SparkEntry.queries("q271_fd_audit")(spark, d2).collect()
    assert(fds.length == 9, s"rows: ${fds.toSeq}")
    assert(fds.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L
      && r.getLong(3) == 0L && r.getBoolean(4)), s"rows: ${fds.toSeq}")
  }

  test("q272: a pairless graph yields no ranks and never divides by |S|") {
    // one user ⇒ no co-occurrence edge ⇒ empty degree table: the
    // seed-teleport division is CASE-guarded behind seed rows that
    // cannot exist, so the result is empty, not an error
    assert(run("q272_personalized_pagerank").isEmpty)
  }

  test("q274: a 1-vector panel yields one pick from its 4 neighbors") {
    val tmp = Files.createTempDirectory("degen274").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 5)
      .write.parquet(s"$d2/embeddings.parquet")
    // vec 0 is the only unlabeled vector; its 5-NN truncates to the 4
    // labeled ones without erroring
    val rows = SparkEntry.queries("q274_uncertainty_sampling")(spark, d2)
      .collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 1L,
      s"rows: ${rows.toSeq}")
  }

  test("q275: a single-source corpus owns its entire vocabulary") {
    val rows = run("q275_source_contribution")
    assert(rows.length == 1, s"rows: ${rows.toSeq}")
    assert(rows(0).getLong(1) == rows(0).getLong(2)
      && rows(0).getLong(3) == 1000000L, s"rows: ${rows.toSeq}")
  }

  test("q276: a single-source grid has dof 0 and exactly zero G") {
    // one column ⇒ every cell IS its expected value: ln(1) = 0 per
    // cell, so G must be exactly 0.0, never a NaN or residue
    val rows = run("q276_g_test")
    assert(rows.length == 1, s"rows: ${rows.toSeq}")
    assert(rows(0).getLong(1) == 0L && rows(0).getDouble(2) == 0.0,
      s"rows: ${rows.toSeq}")
  }

  test("q196: a single-source corpus has gini 0 and hhi 1") {
    // the shared fixture collapses source to one feed: the Lorenz
    // identity degenerates to (2w−2w)/w = 0 and HHI to w²/w² = 1 —
    // both defined, no guard fires
    val rows = run("q196_source_concentration")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_sources")) == 1L)
      assert(r.getDouble(r.fieldIndex("gini")) == 0.0, s"gini: $r")
      assert(r.getDouble(r.fieldIndex("hhi")) == 1.0, s"hhi: $r")
    }
  }

  test("q277: a single-instant feed makes every belief brand-new") {
    // all transaction times collapse onto the horizon, so the week-ago
    // cutoff precedes every revision: then_rev is NULL for every key
    // (n_new == n_keys) and the drift integral is exactly 0 — never a
    // NULL-minus or a spurious revision
    val rows = run("q277_bitemporal_asof")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_new")) ==
        r.getLong(r.fieldIndex("n_keys")), s"new != keys: $r")
      assert(r.getLong(r.fieldIndex("n_revised")) == 0L, s"revised: $r")
      assert(r.getLong(r.fieldIndex("drift_micro")) == 0L, s"drift: $r")
    }
  }

  test("q280: a single-instant feed has no bursts and no errors") {
    // every event lands in ONE hour: T=1, g=round(ln(1)·250k)=0, and
    // the lone hour's Poisson cost favors the base state (λ₁ = 2λ₀
    // overshoots a count that EQUALS λ₀) — empty report, no div/ln
    // edge (λ₀ = N ≥ 1)
    val rows = run("q280_kleinberg_bursts")
    assert(rows.isEmpty, s"single-hour series cannot burst: ${rows.toSeq}")
  }

  test("q281: an empty training half yields an empty reliability table") {
    // the fixture's single instant (2024-03-01) is AFTER the temporal
    // split, so the model trains on nothing: no (cur, hod) cell exists,
    // the test join matches nothing, and the isotonic grid is empty —
    // never a div-by-zero on the segment means
    val rows = run("q281_isotonic_calibration")
    assert(rows.isEmpty, s"no training data ⇒ no bins: ${rows.toSeq}")
  }

  test("q282: a single-day corpus leaves the jackknife undefined, not 1/0") {
    // one day ⇒ every leave-one-out denominator is 0 ⇒ θ₍ᵢ₎ guarded
    // NULL ⇒ j = count(θ) = 0 and SE is NULL — never an ANSI division
    // error; the point estimate itself stays defined
    val rows = run("q282_jackknife_se")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("j")) == 0L, s"j: $r")
      assert(r.isNullAt(r.fieldIndex("se_micro")), s"se: $r")
      assert(!r.isNullAt(r.fieldIndex("theta_micro")))
    }
  }

  test("q283: panel audit is one row per qid; mutual edges reciprocate") {
    // panel-bound since r14: one exact-1-NN row per panel query, with
    // a mutuality flag. Invariants even with the fixture's singleton
    // label: qid unique (a vector has ONE nearest neighbor), flags in
    // {0,1}, and mutuality is symmetric — when both ends of a
    // mutual=1 edge sit in the panel, the counterpart row must point
    // straight back with mutual=1.
    val rows = run("q283_mutual_nn")
    assert(rows.nonEmpty)
    val qids = rows.map(_.getLong(0))
    assert(qids.distinct.length == qids.length, "duplicate qid")
    val byQid = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getInt(r.fieldIndex("mutual")))).toMap
    rows.foreach { r =>
      val (qid, cid) = (r.getLong(0), r.getLong(1))
      val m = r.getInt(r.fieldIndex("mutual"))
      assert(m == 0 || m == 1)
      assert(qid != cid)
      if (m == 1) byQid.get(cid).foreach { case (back, bm) =>
        assert(back == qid && bm == 1,
          s"mutual edge $qid->$cid not reciprocated: $back/$bm")
      }
    }
  }

  test("q315: a query with zero relevant candidates reads NULL nDCG") {
    // vec 0's singleton label matches no candidate: idcg = 0, so both
    // nDCG columns are NULL (never 0/0); τ stays defined — the orders
    // exist even when nothing is relevant
    val rows = run("q315_rerank_eval")
    assert(rows.length == 5)
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getLong(r0.fieldIndex("n_rel")) == 0L)
    assert(r0.isNullAt(r0.fieldIndex("ndcg_bi_milli")))
    assert(r0.isNullAt(r0.fieldIndex("ndcg_cross_milli")))
    assert(!r0.isNullAt(r0.fieldIndex("tau_milli")))
  }

  test("q316: a single-source corpus is 100% novel at every scale") {
    // with one source every gram type is exclusive by definition —
    // novel_micro reads exactly 1e6 on each ladder rung
    val rows = run("q316_novelty_profile")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(r.fieldIndex("source")) == "web")
      assert(r.getLong(r.fieldIndex("novel_micro")) == 1000000L,
        s"exclusivity must be total with one source: $r")
    }
  }

  test("q317: the release summary row is consistent with its gates") {
    // one source, collapsed columns — whatever the gates read, the
    // 'release' row must count exactly the failed ones and pass iff
    // zero failed; every value is defined (no NULL gate values)
    val rows = run("q317_release_report")
    assert(rows.length == 5)
    val gates = rows.filter(_.getString(0) != "release")
    val rel = rows.find(_.getString(0) == "release").get
    val failed = gates.count(_.getInt(3) == 0)
    assert(rel.getLong(rel.fieldIndex("value_micro")) == failed.toLong)
    assert(rel.getInt(rel.fieldIndex("pass")) ==
      (if (failed == 0) 1 else 0))
    gates.foreach(r => assert(!r.isNullAt(r.fieldIndex("value_micro"))))
  }

  test("q318: the k-center frontier is monotone and picks are distinct") {
    // greedy farthest-point invariant: each round removes the global
    // minimum and updates only via greatest(), so the frontier cosine
    // can never decrease — a violated monotonicity means the update
    // or the tie-break drifted
    val rows = run("q318_kcenter_select").sortBy(_.getLong(0))
    assert(rows.length == 8)
    assert(rows.head.isNullAt(rows.head.fieldIndex("frontier_cos_micro")))
    val fr = rows.tail.map(r => r.getLong(r.fieldIndex("frontier_cos_micro")))
    assert(fr.zip(fr.tail).forall { case (a, b) => a <= b },
      s"frontier must be non-decreasing: ${fr.toSeq}")
    val cids = rows.map(_.getLong(1))
    assert(cids.distinct.length == cids.length)
  }

  test("q319: packing sweep identities hold on the collapsed corpus") {
    // doubling the cap can only remove bin boundaries: crossings and
    // bins are non-increasing in cap, and the bin count is exactly
    // ceil(total/cap)
    val rows = run("q319_packing_sweep").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(512L, 1024L, 2048L, 4096L))
    rows.foreach { r =>
      val (cap, total) = (r.getLong(0), r.getLong(2))
      assert(r.getLong(r.fieldIndex("n_bins")) == (total + cap - 1) / cap)
      assert(r.getLong(r.fieldIndex("n_crossings")) >=
        r.getLong(r.fieldIndex("n_split_docs")))
    }
    val cr = rows.map(r => r.getLong(r.fieldIndex("n_crossings")))
    assert(cr.zip(cr.tail).forall { case (a, b) => a >= b },
      s"crossings must fall as cap doubles: ${cr.toSeq}")
  }

  test("q320: the shadow price is non-negative and the admitted mass " +
    "dominates quota × marginal") {
    // ranks are quality-descending, so the marginal admitted doc is
    // the worst admitted: gap ≥ 0 and every admitted ≥ marginal
    val rows = run("q320_quota_shadow_price")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("gap_q4")))
        assert(r.getLong(r.fieldIndex("gap_q4")) >= 0L, s"gap < 0: $r")
      val (quota, marg) = (r.getLong(r.fieldIndex("quota")),
        r.getLong(r.fieldIndex("marginal_q4")))
      assert(r.getLong(r.fieldIndex("admitted_q4_sum")) >= quota * marg)
    }
  }

  test("q321: tightness bounds hold — weak ≤ strong, density ≤ 1e6, " +
    "threshold respected") {
    val rows = run("q321_cluster_tightness")
    rows.foreach { r =>
      val (wk, st) = (r.getLong(r.fieldIndex("weakest_jm")),
        r.getLong(r.fieldIndex("strongest_jm")))
      assert(wk <= st && wk >= 300000L, s"edge outside [0.3, strong]: $r")
      assert(r.getLong(r.fieldIndex("density_micro")) <= 1000000L)
      val m = r.getLong(r.fieldIndex("n_members"))
      assert(r.getLong(r.fieldIndex("n_edges")) <= m * (m - 1) / 2)
    }
  }

  test("q322: a label present in one epoch only has no drift row") {
    // md5('0') starts 'c' ≥ '8': the singleton label 999 lands
    // entirely in epoch 1, so the epoch join drops it — absence IS
    // the correct answer, not a NULL-riddled row
    val rows = run("q322_embedding_drift")
    assert(!rows.exists(_.getInt(0) == 999), "singleton label leaked in")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("shift2")) >= 0L)
      if (!r.isNullAt(r.fieldIndex("drift_cos_micro")))
        assert(math.abs(r.getLong(r.fieldIndex("drift_cos_micro")))
          <= 1000000L, s"cosine out of range: $r")
    }
  }

  test("q323: the budget fill admits at least the budget and never " +
    "more than the source holds") {
    val rows = run("q323_token_budget_fill")
    assert(rows.nonEmpty)
    var admitted = 0L; var total = 0L
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("admitted_tokens")) <=
        r.getLong(r.fieldIndex("src_tokens")))
      assert(r.getLong(r.fieldIndex("n_admitted")) <=
        r.getLong(r.fieldIndex("n_src_docs")))
      admitted += r.getLong(r.fieldIndex("admitted_tokens"))
      total += r.getLong(r.fieldIndex("src_tokens"))
    }
    // the straddling doc is admitted whole, so the fill reaches the
    // budget exactly or overshoots by part of one document
    assert(admitted >= total / 2, s"fill $admitted below budget ${total / 2}")
  }

  test("q325: recall is monotone in nProbe and exact at full probe") {
    // superset candidates can only displace a true hit with another
    // true hit (total order on the same key), so recall never falls;
    // probing all 8 buckets IS the full scan, so recall@8 ≡ 1
    val rows = run("q325_ivf_probe_sweep").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    val rec = rows.map(r => r.getLong(r.fieldIndex("recall_micro")))
    assert(rec.zip(rec.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone: ${rec.toSeq}")
    assert(rec.last == 1000000L, s"full probe must be exact: ${rec.toSeq}")
    val cand = rows.map(r => r.getLong(r.fieldIndex("n_candidates")))
    assert(cand.zip(cand.tail).forall { case (a, b) => a <= b })
  }

  test("q326: one user collapses the leaderboard to a single decile") {
    // the fixture pins every event to user 1: one rank row, decile 0,
    // and the B/A read-out is defined (or NULL if half A is empty)
    val rows = run("q326_winners_curse")
    assert(rows.length == 1 && rows.head.getLong(0) == 0L)
    assert(rows.head.getLong(rows.head.fieldIndex("n_users")) == 1L)
  }

  test("q327: a single-source corpus has no rest side — NULL KS") {
    // the 'rest' is empty: the na·(n−na) denominator is 0, so the
    // statistic is NULL (the honest "nothing to compare against"),
    // never an ANSI divide-by-zero
    val rows = run("q327_ks_drift")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(r.fieldIndex("n_rest")) == 0L)
    assert(r.isNullAt(r.fieldIndex("ks_micro")), s"expected NULL KS: $r")
  }

  test("q285: a corpus with no churned users yields an empty hazard") {
    // same censoring rule as q198: the single instant IS the horizon,
    // zero deaths, zero steps — and the d/n_risk division never runs
    val rows = run("q285_nelson_aalen")
    assert(rows.isEmpty, s"no deaths ⇒ no hazard steps: ${rows.toSeq}")
  }

  test("q314: the support table still reports the censored row") {
    // unlike the curves, the life table is NOT empty on a no-death
    // corpus — it shows the single all-censored duration bucket, which
    // is exactly the instrumentation value (support present, fold
    // empty localizes a divergence to the fold)
    val rows = run("q314_survival_support")
    assert(rows.length == 1, s"one duration bucket: ${rows.toSeq}")
    val r = rows.head
    assert(r.getLong(r.fieldIndex("n_deaths")) == 0L)
    assert(r.getLong(r.fieldIndex("n_all")) ==
      r.getLong(r.fieldIndex("n_risk")))
  }

  test("q286: a single-day corpus has no predecessor to churn against") {
    val rows = run("q286_topk_churn")
    assert(rows.isEmpty, s"one day ⇒ no consecutive pair: ${rows.toSeq}")
  }

  test("q287: an empty arm leaves its quantiles NULL, not vacuous mins") {
    // md5('1') hashes every user into arm B: the A-side order
    // statistic must be NULL (the na=0 guard — without it cum·10 ≥ 0
    // is vacuously true and qa would read the global min)
    val rows = run("q287_quantile_effect")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("q_a_micro")), s"qa: $r")
      assert(!r.isNullAt(r.fieldIndex("q_b_micro")), s"qb: $r")
      assert(r.isNullAt(r.fieldIndex("qte_micro")), s"qte: $r")
    }
  }

  test("q288: a single-instant user is one session at every threshold") {
    val rows = run("q288_session_sweep")
    assert(rows.length == 4)
    rows.foreach(r =>
      assert(r.getLong(r.fieldIndex("n_sessions")) == 1L, s"$r"))
  }

  test("q289: shrinkage lands between the raw rate and the prior") {
    // the posterior is a weighted average of raw and pooled rates —
    // floor rounding can stray at most ~1 micro outside the bracket
    val rows = run("q289_rate_shrinkage")
    assert(rows.nonEmpty)
    val pbar = {
      val n = rows.map(r => r.getLong(r.fieldIndex("n"))).sum
      val k = rows.map(r => r.getLong(r.fieldIndex("k"))).sum
      k * 1000000L / n
    }
    rows.foreach { r =>
      val raw = r.getLong(r.fieldIndex("raw_micro"))
      val sh = r.getLong(r.fieldIndex("shrunk_micro"))
      val lo = math.min(raw, pbar) - 1
      val hi = math.max(raw, pbar) + 1
      assert(sh >= lo && sh <= hi, s"shrunk $sh outside [$lo,$hi]: $r")
    }
  }

  test("q279: a singleton label still merges cleanly (n=1 legs)") {
    // the fixture adds label 999 with exactly ONE member: 11 leaves ⇒
    // 10 merges, and the n_a·n_b denominators stay ≥ 1 throughout —
    // no div-by-zero, monotone merge sizes, ids stay within the label
    // vocabulary
    val rows = run("q279_label_dendrogram")
    assert(rows.length == 10, s"11 leaves need 10 merges: ${rows.length}")
    assert(rows.last.getLong(rows.last.fieldIndex("n_merged")) ==
      spark.read.parquet(s"$dir/embeddings.parquet").count(),
      "the final merge must swallow the whole corpus")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("dist2_pico")) >= 0L, s"dist2: $r")
      assert(r.getInt(r.fieldIndex("c1")) < r.getInt(r.fieldIndex("c2")))
    }
  }

  test("q290: a one-day series has no trend — var18 = 0, z NULL") {
    // one instant ⇒ every type's daily series is a single point:
    // zero pairs (S = 0 via the LEFT-join coalesce, not a dropped
    // row) and n(n−1)(2n+5) − Σt(t−1)(2t+5) = 0 ⇒ z undefined
    val rows = run("q290_mann_kendall")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_days")) == 1L, s"$r")
      assert(r.getLong(r.fieldIndex("s_stat")) == 0L, s"$r")
      assert(r.getLong(r.fieldIndex("var18")) == 0L, s"$r")
      assert(r.isNullAt(r.fieldIndex("z")), s"z must be NULL: $r")
    }
  }

  test("q291: no deaths and an empty arm yield NULL chi2, not 0/0") {
    // one instant ⇒ the single user's last event IS the horizon, so
    // nobody churns (no death times, zero variance), and md5('1')
    // hashes the whole population into arm B
    val r = run("q291_logrank_test")(0)
    assert(r.getLong(r.fieldIndex("n_a")) == 0L, s"$r")
    assert(r.getLong(r.fieldIndex("o_a")) == 0L, s"$r")
    assert(r.getLong(r.fieldIndex("var_micro")) == 0L, s"$r")
    assert(r.isNullAt(r.fieldIndex("chi2_milli")),
      s"chi2 on zero variance must be NULL: $r")
  }

  test("q292: a singleton-free source discounts nothing — NULL r*1") {
    // custom micro-fixture: every token appears exactly twice, so
    // N1 = 0 — the unseen mass is 0 and r*1 = 2·N2/N1 is undefined
    val tmp = Files.createTempDirectory("gtdegen").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    import spark.implicits._
    Seq((1L, "aa bb", "en", "web", 5L), (2L, "bb aa", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    val r = SparkEntry.queries("q292_good_turing")(spark, d2).collect()(0)
    assert(r.getLong(r.fieldIndex("n_tokens")) == 4L, s"$r")
    assert(r.getLong(r.fieldIndex("n1")) == 0L, s"$r")
    assert(r.getLong(r.fieldIndex("p0_micro")) == 0L, s"$r")
    assert(r.isNullAt(r.fieldIndex("rstar1_micro")),
      s"r*1 with no singletons must be NULL: $r")
    assert(r.getLong(r.fieldIndex("rstar2_micro")) == 0L,
      s"r*2 = 3·N3/N2 = 0 when N3 = 0: $r")
  }

  test("q293/q295: a single-source corpus has no pairs — empty, no error") {
    // the fixture collapses source to 'web': the s1 < s2 pair joins
    // must produce zero rows (not a self-pair, not a crash)
    assert(run("q293_cliffs_delta").isEmpty)
    assert(run("q295_js_divergence").isEmpty)
  }

  test("q294: a too-small calibration fold yields NULL q-hat + coverage") {
    // md5 folds: doc 6 → train (md5 '1679…'), doc 4 → calibrate
    // ('a87f…'), doc 1 → test ('c4ca…'); n_calib = 1 makes the 90%
    // rank k = ⌈0.9·2⌉ = 2 > 1 — the guard must answer "not enough
    // data" (NULL), never clamp to the max score
    val tmp = Files.createTempDirectory("confdegen").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    import spark.implicits._
    Seq((6L, "t", "en", "web", 10L), (4L, "t", "en", "web", 12L),
        (1L, "t", "en", "web", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    val rows = SparkEntry.queries("q294_conformal_coverage")(spark, d2)
      .collect()
    assert(rows.length == 1, s"${rows.toSeq}")
    val r = rows(0)
    assert(r.getLong(r.fieldIndex("n_calib")) == 1L, s"$r")
    assert(r.isNullAt(r.fieldIndex("qhat")), s"qhat must be NULL: $r")
    assert(r.isNullAt(r.fieldIndex("coverage_micro")),
      s"coverage must be NULL: $r")
  }

  test("q296: a single-user log has no co-occurrence graph — empty") {
    // the fixture collapses events to one user: every bucket holds
    // < 2 distinct users, so the edge table (and the report) is empty
    assert(run("q296_modularity").isEmpty)
  }

  test("q297: a unanimous single-category panel yields NULL alpha") {
    // doc ids 1/4/5/6 hash above '20' for all three annotators (no
    // 'zz' flip) and share one lang: D2 = 0 AND n² = Σn_c² — perfect
    // agreement on a constant label has no chance-disagreement to
    // correct against, so α is NULL (0/0), never 1.0
    val tmp = Files.createTempDirectory("kadegen").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    import spark.implicits._
    Seq(1L, 4L, 5L, 6L).map(i => (i, "t", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    val r = SparkEntry.queries("q297_krippendorff_alpha")(spark, d2)
      .collect()(0)
    assert(r.getLong(r.fieldIndex("d2")) == 0L, s"$r")
    assert(r.getLong(r.fieldIndex("de_den")) == 0L, s"$r")
    assert(r.isNullAt(r.fieldIndex("alpha_micro")),
      s"alpha on a constant panel must be NULL: $r")
  }

  test("q299: no pairs at the recall target — NULL recall, not 0/0") {
    // two docs whose only gram overlap sits at J = 1/3: the histogram
    // is non-empty but n_true (J ≥ 0.7) is 0 for every operating
    // point — recall must be NULL while exp_false stays positive
    val tmp = Files.createTempDirectory("lshopdegen").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    import spark.implicits._
    Seq((1L, "a b c d e f", "en", "web", 11L),
        (2L, "a b c d x y", "en", "web", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    val rows = SparkEntry.queries("q299_lsh_operating_point")(spark, d2)
      .collect()
    assert(rows.length == 6, s"${rows.toSeq}")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_true")) == 0L, s"$r")
      assert(r.isNullAt(r.fieldIndex("recall_micro")),
        s"recall with no target pairs must be NULL: $r")
      assert(r.getLong(r.fieldIndex("exp_false_micro")) >= 0L, s"$r")
    }
  }

  test("q300: a corpus containing no query term is empty, not ln(0)") {
    val tmp = Files.createTempDirectory("qldegen").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    import spark.implicits._
    Seq((1L, "aa bb cc dd", "en", "web", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    assert(SparkEntry.queries("q300_dirichlet_ql")(spark, d2)
      .collect().isEmpty)
  }

  test("q302: a single-source corpus has no duels — empty, no error") {
    assert(run("q302_bradley_terry").isEmpty)
  }

  test("q303: one user is one dose level — NULL chi2, not 0/0") {
    // a single user collapses the dose design to one level:
    // C·N − B² = 0 and the variance guard must answer NULL
    val r = run("q303_cochran_armitage")(0)
    assert(r.getLong(r.fieldIndex("n_users")) == 1L, s"$r")
    assert(r.isNullAt(r.fieldIndex("chi2_milli")),
      s"constant-dose chi2 must be NULL: $r")
  }

  test("q304: a 1-user stratum violates positivity — NULL ATE") {
    // n_x = 1 forces t_x ∈ {0, n_x}: every stratum is dropped, the
    // violation count says so, and the ATE is NULL, never 1/0
    val r = run("q304_ipw_ate")(0)
    assert(r.getLong(r.fieldIndex("n_valid_strata")) == 0L, s"$r")
    assert(r.isNullAt(r.fieldIndex("ate_ipw_micro")),
      s"no-valid-strata ATE must be NULL: $r")
  }

  test("q306: a one-row table is one run per column, 0 dict bits") {
    val tmp = Files.createTempDirectory("encdegen").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    import spark.implicits._
    Seq((1L, 2L, 3L, 1, 4.0, 5.0, 0.1, 0.2, "R", "F",
        java.sql.Timestamp.valueOf("1995-06-15 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$d2/lineitem.parquet")
    val rows = SparkEntry.queries("q306_encoding_audit")(spark, d2)
      .collect()
    assert(rows.length == 6, s"${rows.toSeq}")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_runs")) == 1L, s"$r")
      assert(r.getLong(r.fieldIndex("rle_ratio_micro")) == 1000000L,
        s"$r")
      assert(r.getLong(r.fieldIndex("dict_bits")) == 0L,
        s"a 1-value dictionary needs 0 bits: $r")
    }
  }

  test("q307: a pairless corpus keeps all 3 sweep rows at zero") {
    // docs under 3 tokens shingle to nothing: the dup graph is empty
    // at every threshold, and the LEFT JOIN must keep the sweep grid
    val tmp = Files.createTempDirectory("percdegen").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    import spark.implicits._
    Seq((1L, "aa bb", "en", "web", 5L), (2L, "cc dd", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    val rows = SparkEntry.queries("q307_percolation_sweep")(spark, d2)
      .collect()
    assert(rows.length == 3, s"${rows.toSeq}")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_nodes")) == 0L, s"$r")
      assert(r.getLong(r.fieldIndex("n_components")) == 0L, s"$r")
      assert(r.getLong(r.fieldIndex("max_frac_micro")) == 0L, s"$r")
    }
  }

  test("q308: equal lengths carry zero inequality — exact 0, not ε") {
    // every log argument is exactly 1 ⇒ every rounded term is exactly
    // 0 ⇒ within AND between components are integer zero
    val tmp = Files.createTempDirectory("theildegen").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    import spark.implicits._
    Seq((1L, "t", "en", "web", 100L), (2L, "t", "de", "web", 100L),
        (3L, "t", "en", "web", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    val rows = SparkEntry.queries("q308_theil_decomposition")(spark, d2)
      .collect()
    assert(rows.length == 1, s"${rows.toSeq}")
    val r = rows(0)
    assert(r.getLong(r.fieldIndex("t_within_micro")) == 0L, s"$r")
    assert(r.getLong(r.fieldIndex("between_log_micro")) == 0L, s"$r")
    assert(r.getLong(r.fieldIndex("w_micro")) == 1000000L, s"$r")
  }

  test("q309: an empty training fold evaluates nothing — empty") {
    // md5('1') puts the single user in the TEST fold: no transitions
    // to train on, so the honest answer is an empty evaluation
    assert(run("q309_markov_accuracy").isEmpty)
  }

  test("q310: raked lang margins land within rounding of uniform") {
    // the property IPF exists for: after 3 rounds, every language's
    // reweighted mass Σ n·w must sit within 0.5% of the uniform
    // target nd·10⁶/k — floor rounding eats a little each round, so
    // exact equality is not expected, drift is bounded
    val rows = run("q310_raking_ipf")
    assert(rows.nonEmpty)
    val nd = rows.map(r => r.getLong(r.fieldIndex("n"))).sum
    val byLang = rows.groupBy(_.getString(0)).map { case (l, rs) =>
      l -> rs.map(r => r.getLong(r.fieldIndex("n"))
        * r.getLong(r.fieldIndex("weight_micro"))).sum
    }
    val target = nd * 1000000L / byLang.size
    byLang.foreach { case (l, mass) =>
      assert(math.abs(mass - target) <= target / 200,
        s"lang $l mass $mass vs target $target")
    }
  }

  test("q311: a fully-duplicated split reads exactly zero novelty") {
    // doc 6 hashes to train ('16…'), doc 1 to test ('c4…'); identical
    // text ⇒ every held-out 5-gram is verbatim in training
    val tmp = Files.createTempDirectory("novdegen").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    import spark.implicits._
    val txt = "a b c d e f g h"
    Seq((6L, txt, "en", "web", 15L), (1L, txt, "en", "web", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    val r = SparkEntry.queries("q311_ngram_novelty")(spark, d2)
      .collect()(0)
    assert(r.getLong(r.fieldIndex("novel_types")) == 0L, s"$r")
    assert(r.getLong(r.fieldIndex("novel_type_micro")) == 0L, s"$r")
    assert(r.getLong(r.fieldIndex("novel_instance_micro")) == 0L, s"$r")
  }

  test("q312: Kish ESS never exceeds the nominal count") {
    // Cauchy–Schwarz: (Σnw)² ≤ (Σn)(Σnw²) ⇒ ESS ≤ N ⇒ ratio ≤ 1000‰
    val rows = run("q312_weight_ess")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ratio = r.getLong(r.fieldIndex("ess_ratio_milli"))
      assert(ratio > 0 && ratio <= 1000, s"ESS ratio out of (0,1]: $r")
      assert(r.getLong(r.fieldIndex("ess_milli")) <=
        r.getLong(r.fieldIndex("n_docs")) * 1000, s"$r")
    }
  }

  test("q313: a 1-doc corpus brackets nothing — NULL interval") {
    val tmp = Files.createTempDirectory("mcidegen").toFile
    tmp.deleteOnExit()
    val d2 = tmp.getAbsolutePath
    import spark.implicits._
    Seq((1L, "t", "en", "web", 42L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    val r = SparkEntry.queries("q313_median_ci")(spark, d2).collect()(0)
    assert(r.getLong(r.fieldIndex("n_docs")) == 1L, s"$r")
    assert(r.isNullAt(r.fieldIndex("median")), s"$r")
    assert(r.isNullAt(r.fieldIndex("ci_lo")), s"$r")
    assert(r.isNullAt(r.fieldIndex("ci_hi")), s"$r")
  }

  test("q298: a single-source corpus fails every l — risk reads 100%") {
    val rows = run("q298_l_diversity")
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_undiverse_groups")) ==
        r.getLong(r.fieldIndex("n_groups")), s"$r")
      assert(r.getLong(r.fieldIndex("risk_micro")) == 1000000L, s"$r")
    }
  }

  test("q331: a single-source corpus has NO cross-source cells — " +
    "empty matrix, not a self-pair") {
    // the grid is built from source PAIRS with a <> b; one source ⇒
    // zero rows on both engines (the oracle's g subquery is likewise
    // empty), never a degenerate self-containment row
    assert(run("q331_contamination_matrix").isEmpty)
  }

  test("q332: gates stay integer-defined on the collapsed corpus") {
    // single source: the PSI grid is one source wide, privacy groups
    // collapse — every gate must still read an integer value and an
    // integer pass, never NULL/NaN (the release row counts fails)
    val rows = run("q332_stream_release_gates")
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("value_micro")), s"$r")
      assert(!r.isNullAt(r.fieldIndex("pass")), s"$r")
    }
    val release = rows.find(_.getString(0) == "release").get
    val fails = rows.filter(_.getString(0) != "release")
      .count(_.getInt(3) == 0)
    assert(release.getLong(release.fieldIndex("value_micro")) ==
      fails.toLong, s"release row must count failed gates: $release")
  }

  test("q333: a one-user population is a one-row leaderboard with " +
    "both ranks 1 — shrinkage toward a self-mean stays defined") {
    // every event belongs to user 1, so the leaderboard is that user
    // alone: grand mean == the user's own A rate, prior m == the
    // user's own na — the shrinkage algebra runs against itself and
    // must stay integer-defined, with both rank orders trivially 1
    val rows = run("q333_corrected_leaderboard")
    assert(rows.length == 1, rows.mkString(";"))
    val r = rows(0)
    assert(r.getLong(r.fieldIndex("raw_rank")) == 1L, s"$r")
    assert(r.getLong(r.fieldIndex("shrunk_rank")) == 1L, s"$r")
    assert(!r.isNullAt(r.fieldIndex("shrunk_micro")), s"$r")
    assert(!r.isNullAt(r.fieldIndex("b_micro")), s"$r")
  }
}
