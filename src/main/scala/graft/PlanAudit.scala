package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the headline queries so
  * scan pushdown, broadcast choices, and whole-stage-codegen spans can
  * be audited (run: `sbt "runMain graft.PlanAudit <sfDir> [q...]"`). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q02_filter_project", "q04_region_revenue",
        "q31_ngram_jaccard", "q35_minhash_lsh", "q39_embed_neardup",
        "q40_ann_ivf", "q08_asof_latest", "q70_ann_srp_lsh", "q77_dedup_prune",
        "q79_prefix_jaccard", "q87_span_dedup", "q89_knn_classify",
        "q91_containment_dup")
    val spark = Tables.session("plan-audit", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
