package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the correctness baseline, and
  * an IVF (inverted-file) bucketed variant as the scale path.
  *
  * The per-pair kernel is [[graft.functions.CosineSimilarity]], a
  * codegen'd Catalyst expression — no UDF serialization. Query vectors
  * are broadcast; the candidate side streams, so brute force is a
  * single scan. IVF first assigns every vector to its nearest
  * centroid (one broadcast join), then probes only the nProbe closest
  * buckets per query: at 100 TB the scan is pruned to
  * nProbe/nCentroids of the corpus and the bucket assignment is a
  * cluster-wide partition key.
  */
object VectorOps {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  private def cos(a: String, b: String) = expr(s"cosine_sim($a, $b)")

  /** Brute-force top-k neighbors for each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("cid"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos_sim", round(cos("qv", "cv"), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("cid"), col("cos_sim"))
      .orderBy(col("qid"), col("cid"))
  }

  /** IVF: nearest-centroid bucket assignment + probe the nProbe
    * closest buckets per query. Centroids here are a deterministic
    * subset of the corpus (vec_id < nCentroids) standing in for a
    * k-means codebook.
    */
  def ivfTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      nCentroids: Int, nProbe: Int, k: Int): DataFrame = {
    val cent = corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    def nearest(df: DataFrame, idCol: String, vecCol: String, keep: Int) = {
      val w = Window.partitionBy(col(idCol)).orderBy(col("cs").desc, col("cent_id"))
      df.crossJoin(broadcast(cent))
        .withColumn("cs", cos(vecCol, "cv"))
        .withColumn("crn", row_number().over(w))
        .filter(col("crn") <= keep)
        .drop("cv", "cs", "crn")
    }
    val assigned = nearest(
      corpus.select(col("vec_id").as("cid"), col("embedding").as("cve")),
      "cid", "cve", 1).withColumnRenamed("cent_id", "bucket")
    val probes = nearest(
      queries.select(col("vec_id").as("qid"), col("embedding").as("qv")),
      "qid", "qv", nProbe).withColumnRenamed("cent_id", "bucket")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("cid"))
    probes.join(assigned, Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cos_sim", round(cos("qv", "cve"), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("cid"), col("cos_sim"))
      .orderBy(col("qid"), col("cid"))
  }

  val queries: Seq[QueryDef] = Seq(

    // ---- Brute-force cosine top-5 for the first 10 vectors (oracle:
    //      DuckDB list_cosine_similarity in double precision) ----
    QueryDef.sql("q38_cosine_topk",
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings)
        |SELECT qid, cid, cos_sim FROM (
        |  SELECT qid, cid,
        |    round(list_cosine_similarity(qv, cv), 4) AS cos_sim,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY round(list_cosine_similarity(qv, cv), 4) DESC, cid) AS rn
        |  FROM q JOIN c ON qid <> cid)
        |WHERE rn <= 5 ORDER BY qid, cid""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val e = t(s, d, "embeddings")
      bruteForceTopK(e.filter(col("vec_id") < 10), e, 5)
    },

    // ---- Embedding near-dup pairs above a cosine threshold ----
    QueryDef.sql("q39_embed_neardup",
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])) >= 0.45
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val e = t(s, d, "embeddings")
      val a = e.select(col("vec_id").as("id1"), col("embedding").as("v1"))
      val b = e.select(col("vec_id").as("id2"), col("embedding").as("v2"))
      a.join(b, col("id1") < col("id2"))
        .withColumn("raw", cos("v1", "v2"))
        .filter(col("raw") >= 0.45)
        .select(col("id1"), col("id2"), round(col("raw"), 4).as("cos_sim"))
        .orderBy(col("id1"), col("id2"))
    },

    // ---- IVF approximate top-k (scale path; rows-only check) ----
    QueryDef.rowsOnly("q40_ann_ivf") { (s, d) =>
      GraftFunctions.register(s)
      val e = t(s, d, "embeddings")
      ivfTopK(s, e, e.filter(col("vec_id") < 10), nCentroids = 8, nProbe = 2, k = 5)
    })
}
