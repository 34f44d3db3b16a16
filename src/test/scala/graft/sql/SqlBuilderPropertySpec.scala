package graft.sql

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** SQL-generation properties over randomized (hostile) identifiers:
  * quoting must round-trip any name — including embedded quotes, the
  * case the reference's verbatim interpolation breaks on — and the
  * three statement shapes must emit exactly the placeholder sequence
  * the applier binds ($1..$N in order, sets before keys). */
class SqlBuilderPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(300)
      .withInitialSeed(Seed(99L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  /** Inverse of SqlBuilder.quote: strip the outer quotes, collapse
    * doubled inner quotes. Fails loudly on malformed input. */
  private def unquote(q: String): String = {
    assert(q.length >= 2 && q.head == '"' && q.last == '"', s"not quoted: $q")
    val body = q.substring(1, q.length - 1)
    // every '"' in the body must be part of a doubled pair
    assert("\"\"".r.replaceAllIn(body, "").indexOf('"') == -1,
      s"lone quote survives in $q")
    body.replace("\"\"", "\"")
  }

  private val hostileIdent = Gen.chooseNum(1, 12).flatMap(n =>
    Gen.stringOfN(n, Gen.frequency(6 -> Gen.alphaNumChar,
      2 -> Gen.const('"'), 1 -> Gen.const('.'), 1 -> Gen.const(' '),
      1 -> Gen.const('\''))))

  private def params(sql: String): Seq[Int] =
    "\\$(\\d+)".r.findAllMatchIn(sql).map(_.group(1).toInt).toSeq

  test("identifier quoting round-trips hostile names") {
    check("quote", Prop.forAll(hostileIdent) { id =>
      unquote(SqlBuilder.quote(id)) == id
    })
  }

  test("insertQuery: placeholders $1..$cols*count in order; clauses gated") {
    val gen = for {
      ns <- hostileIdent; t <- hostileIdent
      nCols <- Gen.chooseNum(1, 6)
      cols <- Gen.listOfN(nCols, hostileIdent)
      count <- Gen.chooseNum(1, 10)
      keys <- Gen.oneOf(Gen.const(Seq.empty[String]),
        Gen.listOfN(1, hostileIdent))
      ver <- Gen.oneOf(0L, 90600L, 100000L, 150000L)
    } yield (ns, t, cols, count, keys, ver)
    check("insert", Prop.forAll(gen) { case (ns, t, cols, count, keys0, ver) =>
      val sql = SqlBuilder.insertQuery(SqlBuilder.InsertOption(
        ns, t, cols, count, keys0, ver))
      params(sql) == (1 to cols.size * count) &&
        sql.contains(" ON CONFLICT (") == keys0.nonEmpty &&
        sql.contains(" OVERRIDING SYSTEM VALUE") == (ver >= 100000L) &&
        sql.startsWith("insert into " + SqlBuilder.quoted(ns, t))
    })
  }

  test("updateQuery: sets bind first, keys continue the numbering") {
    val gen = for {
      ns <- hostileIdent; t <- hostileIdent
      sets <- Gen.chooseNum(1, 6).flatMap(Gen.listOfN(_, hostileIdent))
      keys <- Gen.chooseNum(1, 4).flatMap(Gen.listOfN(_, hostileIdent))
    } yield (ns, t, sets, keys)
    check("update", Prop.forAll(gen) { case (ns, t, sets, keys) =>
      val sql = SqlBuilder.updateQuery(ns, t, sets, keys)
      val (setPart, keyPart) = sql.splitAt(sql.indexOf(" where "))
      params(sql) == (1 to sets.size + keys.size) &&
        params(setPart) == (1 to sets.size) &&
        params(keyPart) == (sets.size + 1 to sets.size + keys.size)
    })
  }

  test("deleteQuery: one conjunct per key, numbered from $1") {
    val gen = for {
      ns <- hostileIdent; t <- hostileIdent
      keys <- Gen.chooseNum(1, 5).flatMap(Gen.listOfN(_, hostileIdent))
    } yield (ns, t, keys)
    check("delete", Prop.forAll(gen) { case (ns, t, keys) =>
      val sql = SqlBuilder.deleteQuery(ns, t, keys)
      // conjunct count = placeholder count (a hostile identifier can
      // itself contain " and ", so splitting on the text would lie)
      params(sql) == (1 to keys.size)
    })
  }
}
