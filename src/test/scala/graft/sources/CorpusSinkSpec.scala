package graft.sources

import java.nio.file.Files

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The curated-corpus export contract: hive-partitioned layout,
  * bounded shard sizes, lossless round-trip, and partition pruning
  * actually reaching the physical scan of the written output. */
class CorpusSinkSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("partitioned export: layout, shard cap, round-trip, pruning") {
    val docs = Tables.load(spark, dir, "documents")
    val out = Files.createTempDirectory("corpus_sink").toString
    try {
      CorpusSink.write(docs, out, partitionCols = Seq("lang"),
        maxRecordsPerFile = 7, sortCols = Seq("doc_id"))

      // hive layout: one directory per lang value, nothing else
      val langDirs = new java.io.File(out).listFiles()
        .filter(_.isDirectory).map(_.getName).sorted
      val langs = docs.select(col("lang")).distinct()
        .collect().map(_.getString(0)).sorted
      assert(langDirs.toSeq == langs.map(l => s"lang=$l").toSeq)

      // every shard respects the record cap (group by FULL path — the
      // same part-file basename recurs across partition directories)
      val back = spark.read.parquet(out)
      val perFile = back.select(expr("input_file_name()").as("f"))
        .groupBy(col("f")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      assert(perFile.nonEmpty && perFile.forall(_._2 <= 7),
        s"files over the 7-record cap: ${perFile.filter(_._2 > 7).toSeq}")

      // lossless round-trip (partition column comes back as a value)
      val want = docs.select(docs.columns.sorted.map(col): _*)
        .orderBy(col("doc_id")).collect().toSeq
      val got = back.select(docs.columns.sorted.map(col): _*)
        .orderBy(col("doc_id")).collect().toSeq
      assert(got == want)

      // a lang filter must prune at the PHYSICAL scan: the pushed
      // partition filter appears in the plan and the scan reads only
      // that directory's files
      val scan = back.filter(col("lang") === langs.head)
      val plan = scan.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("lang"),
        s"partition filter missing from scan:\n$plan")
      val filesRead = scan.select(
          expr("regexp_extract(input_file_name(), '(lang=[^/]+)', 1)").as("p"))
        .distinct().collect().map(_.getString(0)).toSeq
      assert(filesRead == Seq(s"lang=${langs.head}"),
        s"scan read beyond its partition: $filesRead")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(out))
    }
  }
}
