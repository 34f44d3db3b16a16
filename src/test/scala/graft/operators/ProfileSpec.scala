package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Profile contract q101 rides on: exact stats against a
  * hand-computed fixture, count(DISTINCT)-style null handling (nulls
  * excluded from n_distinct but counted in n_null, an all-null column
  * profiles to n_distinct=0 with null min/max/sum), and the DECIMAL
  * sum's order independence — the same values spread across many
  * partitions in different orders must produce the identical sum,
  * which a double sum does not guarantee. */
class ProfileSpec extends AnyFunSuite {

  test("hand-computed fixture: nulls, distincts, min/max/sum") {
    val spark = SparkTestSession.spark
    import spark.implicits._

    val df = Seq[(java.lang.Double, java.lang.Double, java.lang.Double)](
      (1.0, 5.5, null),
      (2.0, 5.5, null),
      (2.0, -3.0, null),
      (null, 0.25, null)
    ).toDF("a", "b", "c")

    val out = Profile.numeric(df, Seq("a", "b", "c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b", "c"))

    val a = out("a")
    assert(a.getLong(1) == 1L, "a: one null")
    assert(a.getLong(2) == 2L, "a: distincts exclude null")
    assert(a.getDouble(3) == 1.0 && a.getDouble(4) == 2.0)
    assert(a.getDouble(5) == 5.0)

    val b = out("b")
    assert(b.getLong(1) == 0L && b.getLong(2) == 3L)
    assert(b.getDouble(3) == -3.0 && b.getDouble(4) == 5.5)
    assert(b.getDouble(5) == 8.25)

    val c = out("c")
    assert(c.getLong(1) == 4L, "c: all rows null")
    assert(c.getLong(2) == 0L, "c: all-null column has 0 distincts")
    assert(c.isNullAt(3) && c.isNullAt(4) && c.isNullAt(5))
  }

  test("sum is order-independent across partitionings") {
    val spark = SparkTestSession.spark
    import spark.implicits._

    // Values chosen so a double fold's result depends on reduction
    // order (large magnitudes cancelling against small ones).
    val vals = (0 until 2000).map { i =>
      if (i % 2 == 0) 1e12 + i * 0.0625 else -1e12 + i * 0.0625
    }
    def profileOf(numParts: Int, sorted: Boolean) = {
      val base = if (sorted) vals.sorted else vals
      Profile.numeric(
        base.toDF("v").repartition(numParts), Seq("v"))
        .collect().head.getDouble(5)
    }
    val reference = profileOf(1, sorted = false)
    assert(profileOf(32, sorted = false) == reference)
    assert(profileOf(7, sorted = true) == reference)
  }
}
