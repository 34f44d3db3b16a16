package graft.queries

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.security.MessageDigest

/** Pins [[TextOps.winnowedFingerprints]] against an independent plain-
  * Scala reference (MessageDigest md5, sliding windows — no Spark code
  * shared with the implementation), plus the winnowing coverage
  * guarantee the scheme is chosen for.
  */
class WinnowSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private def spark = SparkTestSession.spark

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Independent reference: K=3 token shingles in position order,
    * W=4 window minima over the md5 hex order, distinct. */
  private def reference(text: String): Set[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    if (toks.size < 6) Set.empty[String]
    else toks.sliding(3).map(g => md5hex(g.mkString(" ")))
      .sliding(4).map(_.min).toSet
  }

  test("winnowedFingerprints matches the independent reference on every corpus doc") {
    val docs = Tables.load(spark, dir, "documents")
    val got = TextOps.winnowedFingerprints(docs)
      .select(col("doc_id"), col("grams")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val expected = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> reference(r.getString(1)))
      .filter(_._2.nonEmpty).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, fps) =>
      assert(fps == expected(id), s"fingerprint mismatch on doc $id")
    }
  }

  test("a shared token run of >= K+W-1 tokens always shares a fingerprint") {
    // The winnowing guarantee (the reason to prefer it over uniform
    // sampling): any common substring of at least k + w - 1 = 6 tokens
    // yields at least one identical selected fingerprint in both docs,
    // regardless of the surrounding text shifting window alignment.
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    for (shift <- Seq("", "xx ", "xx yy ", "xx yy zz qq ")) {
      val a = shift + base + " tail1 tail2"
      val b = "p q r s " + base
      assert(reference(a).intersect(reference(b)).nonEmpty,
        s"no shared fingerprint at shift '$shift'")
    }
  }
}
