package graft.sql

import org.scalatest.funsuite.AnyFunSuite

/** String-level statement shapes, mirroring the reference's
  * pkg/sql/builder_test.go:1-66 fixtures (with this port's deliberate
  * divergence: identifiers in the ON CONFLICT key list are quoted). */
class SqlBuilderSpec extends AnyFunSuite {
  import SqlBuilder._

  test("multi-VALUES insert (TestInsertQuery)") {
    val q = insertQuery(InsertOption("public", "my_table",
      cols = Seq("f1", "f2"), count = 4))
    assert(q == """insert into "public"."my_table"("f1","f2")""" +
      """ values ($1,$2),($3,$4),($5,$6),($7,$8)""")
  }

  test("insert with conflict keys (TestInsertQueryConflict)") {
    val q = insertQuery(InsertOption("public", "my_table",
      cols = Seq("f1", "f2"), count = 4, keys = Seq("id", "name")))
    assert(q == """insert into "public"."my_table"("f1","f2")""" +
      """ values ($1,$2),($3,$4),($5,$6),($7,$8)""" +
      """ ON CONFLICT ("id","name") DO NOTHING""")
  }

  test("insert on PG >= 10 adds OVERRIDING SYSTEM VALUE (TestInsertQueryOverridingSystemValue)") {
    val q = insertQuery(InsertOption("public", "my_table",
      cols = Seq("f1", "f2"), count = 4, pgVersion = 100000L))
    assert(q == """insert into "public"."my_table"("f1","f2")""" +
      """ OVERRIDING SYSTEM VALUE values ($1,$2),($3,$4),($5,$6),($7,$8)""")
  }

  test("delete (TestDeleteQuery)") {
    val q = deleteQuery("public", "my_table", Seq("f1", "f2", "f3"))
    assert(q == """delete from "public"."my_table"""" +
      """ where "f1"=$1 and "f2"=$2 and "f3"=$3""")
  }

  test("update with key split (TestUpdateQuery)") {
    val q = updateQuery("public", "my_table", Seq("f1", "f2"), Seq("f3", "f4"))
    assert(q ==
      """update "public"."my_table" set "f1"=$1,"f2"=$2 where "f3"=$3 and "f4"=$4""")
  }

  test("JDBC parameter style emits ? placeholders") {
    assert(deleteQuery("s", "t", Seq("k"), JdbcParams) ==
      """delete from "s"."t" where "k"=?""")
    assert(insertQuery(InsertOption("s", "t", Seq("a", "b"), 2,
      style = JdbcParams)) ==
      """insert into "s"."t"("a","b") values (?,?),(?,?)""")
  }

  test("identifiers with embedded quotes are escaped, not injected") {
    assert(quote("""we"ird""") == "\"we\"\"ird\"")
    val q = updateQuery("public", """my"table""", Seq("""c"1"""), Seq("id"))
    assert(q ==
      "update \"public\".\"my\"\"table\" set \"c\"\"1\"=$1 where \"id\"=$2")
  }

  test("randomized placeholder alignment across shapes (seeded)") {
    val rnd = new scala.util.Random(7)
    val pRe = """\$(\d+)""".r
    def params(q: String): Seq[Int] =
      pRe.findAllMatchIn(q).map(_.group(1).toInt).toSeq
    for (_ <- 1 to 200) {
      val cols = (1 to 1 + rnd.nextInt(8)).map(i => s"c$i")
      val keys = (1 to 1 + rnd.nextInt(3)).map(i => s"k$i")
      val count = 1 + rnd.nextInt(6)
      // insert binds cols.size × count params, numbered 1..n in order
      assert(params(insertQuery(InsertOption("s", "t", cols, count, keys)))
        == (1 to cols.size * count))
      // update binds sets then keys, one continuous numbering
      assert(params(updateQuery("s", "t", cols, keys))
        == (1 to cols.size + keys.size))
      assert(params(deleteQuery("s", "t", keys)) == (1 to keys.size))
    }
  }

  test("degenerate shapes are rejected") {
    intercept[IllegalArgumentException](deleteQuery("s", "t", Seq.empty))
    intercept[IllegalArgumentException](updateQuery("s", "t", Seq.empty, Seq("k")))
    intercept[IllegalArgumentException](updateQuery("s", "t", Seq("c"), Seq.empty))
    intercept[IllegalArgumentException](
      insertQuery(InsertOption("s", "t", Seq("c"), count = 0)))
  }
}
