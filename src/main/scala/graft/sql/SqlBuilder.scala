package graft.sql

/** SQL generation for the JDBC apply sink (reference
  * pkg/sql/builder.go:10-122, string shapes locked by
  * pkg/sql/builder_test.go:1-66).
  *
  * Three statement shapes, exactly the reference's:
  *
  *  - multi-VALUES `INSERT … ON CONFLICT (keys) DO NOTHING` — the
  *    run-length INSERT batch lands as ONE statement with `count`
  *    value tuples (A17); `OVERRIDING SYSTEM VALUE` is appended for
  *    PG ≥ 10 so rows can carry values for GENERATED ALWAYS identity
  *    columns (builder.go:88-95);
  *  - key-split `UPDATE … SET sets WHERE keys` (A18);
  *  - `DELETE … WHERE keys` over the old-image columns.
  *
  * Two deliberate divergences from the reference strings: identifiers
  * are always quote-escaped (`"` doubled — the reference interpolates
  * names verbatim inside quotes, so a legal PG name containing `"`
  * breaks it), and the `ON CONFLICT` key list is quoted for the same
  * reason. Parameter style is pluggable: `$n` for a PostgreSQL wire
  * target, `?` for a JDBC [[JdbcTxStore]] target.
  */
object SqlBuilder {

  sealed trait ParamStyle { def param(i: Int): String }
  /** PostgreSQL positional parameters, 1-based: `$1`, `$2`, … */
  case object PgParams extends ParamStyle {
    def param(i: Int): String = "$" + i
  }
  /** JDBC placeholders: `?`. */
  case object JdbcParams extends ParamStyle {
    def param(i: Int): String = "?"
  }

  /** Quote one identifier, escaping embedded quotes. */
  def quote(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""

  def quoted(namespace: String, table: String): String =
    quote(namespace) + "." + quote(table)

  /** `delete from "ns"."t" where "k1"=$1 and "k2"=$2`
    * (reference DeleteQuery, builder.go:10-26). */
  def deleteQuery(namespace: String, table: String, keyCols: Seq[String],
      style: ParamStyle = PgParams): String = {
    require(keyCols.nonEmpty, s"DELETE on $namespace.$table with no key columns")
    keyCols.zipWithIndex
      .map { case (c, i) => quote(c) + "=" + style.param(i + 1) }
      .mkString(s"delete from ${quoted(namespace, table)} where ", " and ", "")
  }

  /** `update "ns"."t" set "s1"=$1,"s2"=$2 where "k1"=$3 and "k2"=$4`
    * (reference UpdateQuery, builder.go:28-60): set parameters first,
    * then key parameters — the applier binds (sets ++ keys) in order. */
  def updateQuery(namespace: String, table: String, setCols: Seq[String],
      keyCols: Seq[String], style: ParamStyle = PgParams): String = {
    require(setCols.nonEmpty, s"UPDATE on $namespace.$table with no SET columns")
    require(keyCols.nonEmpty, s"UPDATE on $namespace.$table with no key columns")
    val sets = setCols.zipWithIndex
      .map { case (c, i) => quote(c) + "=" + style.param(i + 1) }
      .mkString(",")
    val keys = keyCols.zipWithIndex
      .map { case (c, i) => quote(c) + "=" + style.param(setCols.size + i + 1) }
      .mkString(" and ")
    s"update ${quoted(namespace, table)} set $sets where $keys"
  }

  /** Options of one multi-VALUES insert (reference InsertOption,
    * builder.go:62-70). `keys` empty → no conflict clause (keyless
    * table); `pgVersion` in PG server_version_num form (100000 = 10.0). */
  final case class InsertOption(
      namespace: String,
      table: String,
      cols: Seq[String],
      count: Int,
      keys: Seq[String] = Seq.empty,
      pgVersion: Long = 0L,
      style: ParamStyle = PgParams)

  /** `insert into "ns"."t"("c1","c2")[ OVERRIDING SYSTEM VALUE] values
    * ($1,$2),($3,$4)[ ON CONFLICT ("k") DO NOTHING]`
    * (reference InsertQuery, builder.go:72-122). */
  def insertQuery(opt: InsertOption): String = {
    require(opt.cols.nonEmpty, s"INSERT into ${opt.namespace}.${opt.table} with no columns")
    require(opt.count > 0, "INSERT with no value tuples")
    val sb = new StringBuilder
    sb ++= "insert into " ++= quoted(opt.namespace, opt.table)
    sb ++= opt.cols.map(quote).mkString("(", ",", ")")
    if (opt.pgVersion >= 100000L) sb ++= " OVERRIDING SYSTEM VALUE"
    sb ++= " values "
    var p = 1
    for (j <- 0 until opt.count) {
      if (j > 0) sb ++= ","
      sb ++= (0 until opt.cols.size)
        .map { _ => val s = opt.style.param(p); p += 1; s }
        .mkString("(", ",", ")")
    }
    if (opt.keys.nonEmpty)
      sb ++= opt.keys.map(quote).mkString(" ON CONFLICT (", ",", ") DO NOTHING")
    sb.result()
  }
}
