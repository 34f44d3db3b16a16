package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** piiScrub (q104): detect/mask semantics on hand-built rows — the
  * zero-, single-, and multi-match paths, near-miss non-matches —
  * plus the structural guarantee the operator is sold on: a row-local
  * projection that adds NO shuffle exchange. */
class PiiScrubSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def scrub(rows: String*) = {
    val s = spark
    import s.implicits._
    TextOps.piiScrub(rows.toDF("txt"), "txt")
      .select("n_emails", "n_phones", "redacted")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
  }

  test("masks email and phone, leaves surrounding text intact") {
    val Array(r) = scrub("mail bob.smith+x@corp.example.com or 12-345-678-9012 now")
    assert(r == ((1, 1, "mail <EMAIL> or <PHONE> now")))
  }

  test("zero-match row passes through unchanged") {
    val Array(r) = scrub("no contact details here, just 42 plain words")
    assert(r == ((0, 0, "no contact details here, just 42 plain words")))
  }

  test("multiple matches of one family are all counted and masked") {
    val Array(r) = scrub("a@b.io then c.d@e.org and 10-200-300-4000 plus 99-888-777-6666")
    assert(r == ((2, 2, "<EMAIL> then <EMAIL> and <PHONE> plus <PHONE>")))
  }

  test("near-misses do not match: TLD-less email, wrong-shape phone") {
    val Array(r) = scrub("ping user@localhost re 123-45-6789 or 1-234-567-8901")
    assert(r._1 == 0 && r._2 == 0 && r._3.contains("user@localhost"))
  }

  test("phone boundary: digit-adjacent candidates are rejected") {
    // leading/trailing extra digit breaks the \b anchors
    val Array(r) = scrub("912-345-678-9012 and 12-345-678-90123")
    assert(r._2 == 0)
  }

  test("piiScrub adds no shuffle exchange (pure row-local projection)") {
    val s = spark
    import s.implicits._
    val plan = TextOps.piiScrub(Seq("x@y.zz").toDF("txt"), "txt")
      .queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"expected shuffle-free plan:\n$plan")
  }
}
