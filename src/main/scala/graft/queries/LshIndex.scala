package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH postings index — INCREMENTAL near-dup
  * screening for an append-only corpus. The batch q35 pass answers
  * "find all near-dup pairs in the landed corpus"; a live pipeline
  * also needs "does this incoming batch duplicate anything ALREADY
  * landed" without re-running all-pairs over history. The index is
  * that primitive:
  *
  *  - [[build]] materializes the corpus's band postings
  *    (doc_id, band, h1, h2 — the identical 32×2 banding q35 shuffles
  *    on) and the shingle-gram sidecar as BUCKETED tables, bucketed on
  *    the join keys;
  *  - [[screen]] computes the incoming batch's postings map-side and
  *    joins them against the index: because the index is bucketed on
  *    the band key, only the BATCH side shuffles — the corpus-sized
  *    posting table is read bucket-aligned, never re-exchanged
  *    (LshIndexSpec pins this in the plan). Candidates verify with
  *    exact Jaccard against the gram sidecar (bucketed on doc_id, same
  *    story);
  *  - [[append]] lands a screened batch's postings+grams into the
  *    index with the bucket layout preserved — the incremental loop.
  *
  * 100 TB arithmetic: screening cost is O(batch × bands) shuffle
  * volume plus bucket-pruned index reads; the index pays its one-time
  * build shuffle at ingest (the BucketedJoinSpec trade). Recall is
  * q35's: a J ≥ 0.8 pair misses all 32 bands with probability
  * (1−J²)³² ≤ 4e-15.
  */
object LshIndex {

  require(Sketches.BandRows == 2, "postings schema assumes 2-row bands")

  /** One posting row per (doc, band): (doc_id, band, h1, h2). Pure
    * map-side projection (shingle → codegen'd minhash_sig → band
    * slices). */
  def postings(docs: DataFrame): DataFrame =
    postingsFromShingled(Sketches.shingled(docs))

  /** [[postings]] from an already-shingled (doc_id, grams) frame — so
    * the ingest loop can compute the shingles ONCE per batch and feed
    * screen and append from the same (scoped-persisted) frame. */
  private[queries] def postingsFromShingled(sh: DataFrame): DataFrame = {
    val sig = Sketches.withMinHashSignature(sh)
      .select(col("doc_id"), col("sig"))
    val bands = (0 until Sketches.NumBands).map { j =>
      struct(lit(j).as("band"),
        expr(s"sig[${j * Sketches.BandRows}]").as("h1"),
        expr(s"sig[${j * Sketches.BandRows + 1}]").as("h2"))
    }
    sig.select(col("doc_id"), explode(array(bands: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"),
        col("b.h1").as("h1"), col("b.h2").as("h2"))
  }

  /** Build/overwrite the persisted index `name`: `<name>_postings`
    * bucketed on the band key, `<name>_grams` bucketed on doc_id.
    * Drops any prior table AND its warehouse location first — the
    * session catalog is in-memory, so a location left by a previous
    * JVM would otherwise block the managed-table create. */
  def build(corpus: DataFrame, name: String, buckets: Int = 8): Unit = {
    val s = corpus.sparkSession
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    for (t <- Seq(s"${name}_postings", s"${name}_grams")) {
      s.sql(s"drop table if exists $t")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(wh, t))
    }
    graft.Tables.bucketize(postings(corpus), s"${name}_postings", buckets,
      "band", "h1", "h2")
    graft.Tables.bucketize(Sketches.shingled(corpus), s"${name}_grams",
      buckets, "doc_id")
  }

  /** Append a landed batch into the index, preserving the bucket
    * layout (Spark validates the writer spec against the table's). */
  def append(docs: DataFrame, name: String, buckets: Int = 8): Unit = {
    val sh = Sketches.shingled(docs)
    appendPrepared(postingsFromShingled(sh), sh, name, buckets)
  }

  /** [[append]] from pre-computed postings + shingles (the ingest-loop
    * path: both frames are scoped-persisted by the caller, so the two
    * table writes don't recompute the minhash kernels). */
  private[queries] def appendPrepared(post: DataFrame, sh: DataFrame,
      name: String, buckets: Int = 8): Unit = {
    post.write.mode("append")
      .bucketBy(buckets, "band", "h1", "h2").sortBy("band", "h1", "h2")
      .format("parquet").saveAsTable(s"${name}_postings")
    sh.write.mode("append")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(s"${name}_grams")
  }

  /** Verified near-dup pairs (batch `doc1`, indexed `doc2`, jaccard ≥
    * `minJaccard`) between an incoming batch and the landed index. */
  def screen(newDocs: DataFrame, name: String,
      minJaccard: Double): DataFrame = {
    val sh = Sketches.shingled(newDocs)
    screenPrepared(postingsFromShingled(sh), sh, name, minJaccard)
  }

  /** [[screen]] from pre-computed postings + shingles (see
    * [[appendPrepared]]). */
  private[queries] def screenPrepared(post: DataFrame, sh: DataFrame,
      name: String, minJaccard: Double): DataFrame = {
    val s = post.sparkSession
    val cand = post
      .join(s.table(s"${name}_postings").withColumnRenamed("doc_id", "doc2"),
        Seq("band", "h1", "h2"))
      .filter(col("doc_id") =!= col("doc2"))
      .select(col("doc_id").as("doc1"), col("doc2")).distinct()
    val g1 = sh
      .select(col("doc_id").as("doc1"), col("grams").as("g1"))
    val g2 = s.table(s"${name}_grams")
      .select(col("doc_id").as("doc2"), col("grams").as("g2"))
    cand.join(g1, "doc1").join(g2, "doc2")
      .withColumn("jaccard", Sketches.exactJaccard)
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc1"), col("doc2"),
        round(col("jaccard"), 6).as("jaccard"))
  }
}
