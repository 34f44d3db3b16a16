package graft

import java.nio.file.Files

import graft.codec.{PgOutput, PgType}
import graft.codec.PgOutput.{Column => C, Relation => R}
import graft.streaming.{CdcPipeline, InMemoryTxStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ingest-stage row for the streaming dedup leg. */
case class E2eDoc(ts: java.sql.Timestamp, doc_id: Long, lang: String,
  text: String)

/** The product's whole story in one test: a PostgreSQL logical-
  * replication feed of a documents table is captured through the DSv2
  * source and applied exactly-once (INSERT/UPDATE/DELETE), the live
  * table state is re-ingested through the STREAMING exact dedup
  * (StreamDedup.byContent — the way a real pipeline screens appends on
  * the way in; the exact-dup copy arrives in a later micro-batch so
  * the drop proves cross-batch state), the surviving corpus flows into
  * the batch near-dup operators (MinHash-LSH pairs → connected
  * components → keep-min-id prune), and the curated corpus lands as
  * hive-partitioned parquet through CorpusSink. Every stage is
  * asserted: applied state, the ingest-dedup survivor set, the pruned
  * survivor set, and the exported layout/content. */
class EndToEndSpec extends AnyFunSuite {

  private val docRel = R(7, "public", "docs", 'd', Seq(
    C("doc_id", PgType.Int8, isKey = true),
    C("lang", PgType.Text, isKey = false),
    C("text", PgType.Text, isKey = false)))

  private def tx(lsn: Long, msgs: Array[Byte]*): Seq[Array[Byte]] =
    PgOutput.Encoder.begin(lsn, lsn * 1000, lsn.toInt) +:
      msgs.toSeq :+ PgOutput.Encoder.commit(lsn, lsn, lsn * 1000)
  private def ins(id: Long, lang: String, text: String) =
    PgOutput.Encoder.insert(docRel, Seq(PgType.encode(PgType.Int8, id),
      PgType.encode(PgType.Text, lang), PgType.encode(PgType.Text, text)))
  private def upd(id: Long, lang: String, text: String) =
    PgOutput.Encoder.update(docRel, None, Seq(PgType.encode(PgType.Int8, id),
      PgType.encode(PgType.Text, lang), PgType.encode(PgType.Text, text)))
  private def del(id: Long) =
    PgOutput.Encoder.delete(docRel, Seq(PgType.encode(PgType.Int8, id),
      null, null))

  test("CDC feed → exactly-once apply → near-dup prune → partitioned export") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val walDir = Files.createTempDirectory("e2ewal").toString
    val ckDir = Files.createTempDirectory("e2eck").toString
    val outDir = Files.createTempDirectory("e2eout").toString
    val store = new InMemoryTxStore

    val base = "the quick brown fox jumps over the lazy dog again and again"
    // doc 1/2: near-dups (2 appends one token → 3-gram Jaccard 10/11),
    // doc 3/4: exact dups, doc 5: unique, doc 6: inserted then deleted,
    // doc 2: first inserted with junk text, then UPDATEd to the near-dup
    graft.sources.WalFiles.writeSegment(walDir, 100L,
      PgOutput.Encoder.relation(docRel) +: (
        tx(100L,
          ins(1, "en", base),
          ins(2, "en", "placeholder junk row to be updated"),
          ins(3, "de", "der schnelle braune fuchs springt hier"),
          ins(4, "de", "der schnelle braune fuchs springt hier"),
          ins(5, "fr", "texte unique sans aucun doublon nulle part"),
          ins(6, "en", "short lived row")) ++
        tx(101L, upd(2, "en", base + " tail")) ++
        tx(102L, del(6))))

    // ---- stage 1: capture + exactly-once apply --------------------------
    assert(CdcPipeline.start(spark, walDir, ckDir, store, "e2e")
      .awaitTermination(60000), "CDC pipeline did not finish within 60s")
    val live = store.rows("public.docs")
      .map(m => (m("doc_id").asInstanceOf[Long],
        m("lang").toString, m("text").toString))
    assert(live.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L),
      s"applied state wrong: $live")
    assert(live.find(_._1 == 2L).exists(_._3 == base + " tail"),
      "UPDATE must have replaced doc 2's text")

    // ---- stage 1b: DDL mid-stream (schema drift + checkpoint resume) ----
    // a later WAL segment carries an ALTER through pgcapture.ddl_logs,
    // then re-sends the docs Relation WITH the new column and inserts a
    // row using it; the pipeline restarts from its checkpoint, replays
    // the DDL through the sink, refreshes the wire-schema registry from
    // the new Relation message, and applies the widened row
    val ddlRel = R(8, "pgcapture", "ddl_logs", 'd', Seq(
      C("query", PgType.Text, isKey = false)))
    val docRel2 = R(7, "public", "docs", 'd', Seq(
      C("doc_id", PgType.Int8, isKey = true),
      C("lang", PgType.Text, isKey = false),
      C("text", PgType.Text, isKey = false),
      C("score", PgType.Int4, isKey = false)))
    val alterSql = "ALTER TABLE docs ADD COLUMN score int4"
    graft.sources.WalFiles.writeSegment(walDir, 103L,
      (PgOutput.Encoder.relation(ddlRel) +:
        tx(103L, PgOutput.Encoder.insert(ddlRel,
          Seq(PgType.encode(PgType.Text, alterSql))))) ++
      (PgOutput.Encoder.relation(docRel2) +:
        tx(104L, PgOutput.Encoder.insert(docRel2,
          Seq(PgType.encode(PgType.Int8, 7L),
            PgType.encode(PgType.Text, "en"),
            PgType.encode(PgType.Text,
              "a freshly scored document unlike any other"),
            PgType.encode(PgType.Int4, 42))))))
    assert(CdcPipeline.start(spark, walDir, ckDir, store, "e2e")
      .awaitTermination(60000), "resumed CDC pipeline did not finish in 60s")
    assert(store.ddlLog == Seq(alterSql),
      s"the applier must replay the mid-stream DDL: ${store.ddlLog}")
    val live2 = store.rows("public.docs")
    assert(live2.map(_("doc_id")).toSet == Set(1L, 2L, 3L, 4L, 5L, 7L),
      s"post-DDL insert must apply: $live2")
    assert(live2.find(_("doc_id") == 7L)
      .exists(_.get("score").contains(42)),
      s"the widened row must carry the NEW column's value: $live2")
    // and a typed projection (batch backfill over the same WAL) carries
    // the new column end to end through the codegen decode path
    val typed = graft.cdc.TypedProjection.project(
      spark.read.format("pgcapture").option("path", walDir).load()
        .filter(col("table") === "docs" && col("lsn") >= 104L),
      docRel2)
    val typedRows = typed.select("doc_id", "lang", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(typedRows.toSeq == Seq((7L, "en", 42)),
      s"typed projection must surface the post-DDL column: ${typedRows.toSeq}")

    // ---- stage 2: ingest-time exact dedup (streaming) -------------------
    // the applied rows re-enter as an append stream; doc 4 (doc 3's
    // exact copy) arrives in a LATER micro-batch, so its drop proves
    // the dedup state carries across batches
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[E2eDoc]
    val dq = graft.streaming.StreamRun.withStatePartitions(spark, 2) {
      graft.streaming.StreamDedup.byContent(in.toDF(), "ts", "10 minutes")
        .select("doc_id", "lang", "text")
        .writeStream.format("memory").queryName("e2e_ingest_dedup")
        .outputMode("append").start()
    }
    def t0(m: Int) = new java.sql.Timestamp(3600000L + m * 60000L)
    val liveAll = live2
      .map(m => (m("doc_id").asInstanceOf[Long],
        m("lang").toString, m("text").toString))
    val (b1, b2) = liveAll.toSeq.sortBy(_._1).partition(_._1 <= 3)
    in.addData(b1.map { case (id, lang, tx) => E2eDoc(t0(id.toInt), id, lang, tx) })
    dq.processAllAvailable()
    in.addData(b2.map { case (id, lang, tx) => E2eDoc(t0(id.toInt), id, lang, tx) })
    dq.processAllAvailable()
    val ingested = spark.table("e2e_ingest_dedup")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    dq.stop()
    assert(ingested.map(_._1).toSet == Set(1L, 2L, 3L, 5L, 7L),
      s"ingest dedup must drop exactly the cross-batch copy (doc 4): " +
        s"${ingested.toSeq}")

    // ---- stage 3: near-dup prune (pairs → components → keep-min) --------
    val docs = ingested.toSeq.toDF("doc_id", "lang", "text")
    val pairs = graft.queries.Sketches.minHashPairs(docs, 0.8)
      .select(col("doc1"), col("doc2"))
    val cc = graft.operators.ConnectedComponents.run(pairs, "doc1", "doc2")
    val drop = cc.filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
    val curated = docs.join(drop, Seq("doc_id"), "left_anti")
    // cluster {1,2} is a near-dup pair → survivors 1, 3, 5, 7
    assert(curated.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 5L, 7L), "prune must keep each cluster's min id + uniques")

    // ---- stage 4: partitioned export ------------------------------------
    graft.sources.CorpusSink.write(curated, outDir,
      partitionCols = Seq("lang"), maxRecordsPerFile = 10,
      sortCols = Seq("doc_id"))
    val back = spark.read.parquet(outDir)
    assert(new java.io.File(outDir).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted.toSeq == Seq("lang=de", "lang=en", "lang=fr"))
    assert(back.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ==
      liveAll.filter(d => Set(1L, 3L, 5L, 7L)(d._1)).toSet,
      "export must round-trip exactly the curated survivors")

    // cleanup the export dir (wal/ck temp dirs are tiny)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(outDir))
  }
}
