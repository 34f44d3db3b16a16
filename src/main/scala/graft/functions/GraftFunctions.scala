package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's native expressions. After
  * `register(spark)`, `cosine_sim(a, b)` and `rolling_hash(s)` are
  * usable from `expr(...)` / `spark.sql(...)` and participate in
  * whole-stage codegen like any built-in.
  */
object GraftFunctions {

  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimilarity(es(0), es(1))),
    "rolling_hash" -> (es => RollingHash(es.head)),
    "srp_band_codes" -> (es => SrpSketch(es.head)),
    "minhash_sig" -> (es => MinHashSig(es.head)),
    "sorted_overlap" -> (es => SortedOverlap(es(0), es(1))),
    "all_pairs" -> (es => AllPairs(es.head)),
    "top_k_min" -> (es => TopKMin(es(0), es(1))),
    "z_interleave16" -> (es => ZInterleave16(es(0), es(1))),
    // pg_decode(datum, oid): oid must be a literal so the result type
    // is known at analysis time
    "pg_decode" -> (es => {
      require(es(1).foldable, "pg_decode oid must be a literal")
      PgDecode(es(0), es(1).eval().asInstanceOf[Number].intValue())
    }),
    // Spark ships its bloom-filter pair only for internal runtime
    // filters — surface both sides so a benchmark set can fold into a
    // fixed-size filter and a collected filter can be embedded as a
    // binary literal and probed map-side (q98's decontamination
    // shape). Codegen'd like the rest of this file.
    "bloom_filter_agg" -> (es => es.size match {
      case 1 => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(es(0))
      case 2 => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(es(0), es(1))
      case _ => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(es(0), es(1), es(2))
    }),
    "might_contain" -> (es =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        es(0), es(1))))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}

/** Cluster-wide registration without code changes (the library entry
  * point a deployment configures once):
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions …
  * }}}
  *
  * Every session then has the engine's functions from first use — no
  * per-session `register` call. The same mechanism is the hook for
  * future custom rules/strategies (`injectOptimizerRule` /
  * `injectPlannerStrategy`) if an operator ever outgrows expression
  * form.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), b))
    }
}
