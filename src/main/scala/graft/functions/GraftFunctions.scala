package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's native expressions. After
  * `register(spark)`, `cosine_sim(a, b)` and `rolling_hash(s)` are
  * usable from `expr(...)` / `spark.sql(...)` and participate in
  * whole-stage codegen like any built-in.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", es => CosineSimilarity(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "rolling_hash", es => RollingHash(es.head), "built-in")
    // pg_decode(datum, oid): oid must be a literal so the result type is
    // known at analysis time
    reg.createOrReplaceTempFunction(
      "pg_decode", es => {
        require(es(1).foldable, "pg_decode oid must be a literal")
        PgDecode(es(0), es(1).eval().asInstanceOf[Number].intValue())
      }, "built-in")
  }
}
