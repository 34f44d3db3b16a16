package graft.cdc

import graft.codec.PgOutput

/** Schema catalog (A6, reference PGXSchemaLoader,
  * pkg/decode/schema.go:127-223): (schema, table) → column names, type
  * OIDs and key set. Under Spark the registry lives on the driver and
  * is rebuilt from the stream's own Relation messages (the pgoutput
  * protocol re-sends a Relation before first use per connection, and
  * after DDL), so no separate catalog connection is needed; a JDBC
  * deployment would seed it from pg_catalog the way the reference does.
  */
final class SchemaRegistry {
  @volatile private var tables =
    Map.empty[(String, String), PgOutput.Relation]
  @volatile private var infos =
    Map.empty[(String, String), ColumnInfo]

  def update(rel: PgOutput.Relation): Unit = synchronized {
    tables = tables + ((rel.namespace, rel.name) -> rel)
  }

  def get(schema: String, table: String): Option[PgOutput.Relation] =
    tables.get((schema, table))

  def keyColumns(schema: String, table: String): Seq[String] =
    get(schema, table).map(_.columns.filter(_.isKey).map(_.name))
      .getOrElse(Seq.empty)

  def oids(schema: String, table: String): Map[String, Int] =
    get(schema, table).map(_.columns.map(c => c.name -> c.oid).toMap)
      .getOrElse(Map.empty)

  /** Seed generated/identity column info for a table — the side channel
    * Relation messages cannot carry (the reference loads it from
    * pg_catalog, pkg/decode/schema.go:161-190 RefreshColumnInfo). */
  def setColumnInfo(schema: String, table: String, info: ColumnInfo): Unit =
    synchronized { infos = infos + ((schema, table) -> info) }

  /** Column info for the applier (reference GetColumnInfo,
    * pkg/decode/schema.go:205-213): the seeded catalog entry when
    * present, else keys derived from the Relation message with empty
    * generated/identity sets. */
  def columnInfo(schema: String, table: String): ColumnInfo =
    infos.getOrElse((schema, table),
      ColumnInfo(keyColumns(schema, table)))

  /** DDL invalidation (reference refreshes pg_catalog caches on DDL,
    * pkg/source/postgres.go:219-223): drop the entry so the next
    * Relation message re-establishes it. */
  def invalidate(schema: String, table: String): Unit = synchronized {
    tables = tables - ((schema, table))
    infos = infos - ((schema, table))
  }
}

/** Per-table apply metadata (reference decode.ColumnInfo,
  * pkg/decode/schema.go:30-90): identity key columns plus the two
  * column classes the sink must never write — `GENERATED ALWAYS AS
  * (…) STORED` columns (excluded from INSERT and UPDATE SET) and
  * `GENERATED ALWAYS AS IDENTITY` columns (excluded from UPDATE SET;
  * INSERTs keep them under `OVERRIDING SYSTEM VALUE`,
  * pkg/sink/postgres.go:400-404, 507-538).
  */
final case class ColumnInfo(
    keys: Seq[String],
    generated: Set[String] = Set.empty,
    identityGeneration: Set[String] = Set.empty) {
  def isKey(c: String): Boolean = keys.contains(c)
  def isGenerated(c: String): Boolean = generated.contains(c)
  def isIdentityGeneration(c: String): Boolean = identityGeneration.contains(c)
}

/** DDL detect / classify (A7, reference pkg/decode/decoder.go:48-54). */
object DdlClassifier {
  val PgCaptureSchema = "pgcapture"

  /** A change on pgcapture.ddl_logs IS a DDL event. */
  def isDdl(schema: String, table: String): Boolean =
    schema == PgCaptureSchema && table == "ddl_logs"

  /** Changes on pgcapture.sources are bookkeeping — never applied. */
  def ignore(schema: String, table: String): Boolean =
    schema == PgCaptureSchema && table == "sources"

  /** Relations whose row changes are duplicated by the DDL itself
    * (CTAS / SELECT INTO / DML-in-DDL) — subsequent same-transaction
    * changes on them must be suppressed (A20, reference
    * pkg/sink/postgres.go:296-393, which uses libpg_query; a regex
    * suffices for the statement shapes that embed DML). Returns
    * lowercase bare table names. */
  private val ctasRe =
    """(?is)\bcreate\s+(?:unlogged\s+|temp(?:orary)?\s+)?table\s+(?:if\s+not\s+exists\s+)?([\w."]+)\s+as\b""".r
  private val selectIntoRe = """(?is)\binto\s+([\w."]+)\s""".r
  private val dmlInDdlRe =
    """(?is)\b(?:insert\s+into|update|delete\s+from)\s+([\w."]+)""".r
  // TRUNCATE [TABLE] [ONLY] t [*] [, ...]: replaying the captured DDL
  // already clears these tables, so the same source tx's wire
  // op=TRUNCATE control rows must be suppressed (A20 interaction,
  // r14 ask #1)
  private val truncateRe =
    """(?is)\btruncate\s+(?:table\s+)?((?:only\s+)?[\w."]+(?:\s*\*)?(?:\s*,\s*(?:only\s+)?[\w."]+(?:\s*\*)?)*)""".r

  def touchedRelations(ddl: String): Set[String] = {
    def strip(n: String) = n.replace("\"", "").split('.').last.toLowerCase
    val ctas = ctasRe.findAllMatchIn(ddl).map(m => strip(m.group(1)))
    val into = if (ddl.toLowerCase.contains("select"))
      selectIntoRe.findAllMatchIn(ddl).map(m => strip(m.group(1)))
    else Iterator.empty
    val dml = dmlInDdlRe.findAllMatchIn(ddl).map(m => strip(m.group(1)))
    val trunc = truncateRe.findAllMatchIn(ddl).flatMap(_.group(1).split(',')
      .map(t => strip(t.replaceAll("(?i)^\\s*only\\s+", "")
        .replaceAll("\\*", "").trim)))
    (ctas ++ into ++ dml ++ trunc).toSet
  }

  /** Statements the sink must not replay (reference strips
    * REFRESH MATERIALIZED VIEW before executing). */
  def stripNonReplayable(ddl: String): Option[String] =
    if ("""(?is)^\s*refresh\s+materialized\s+view\b""".r
      .findFirstIn(ddl).isDefined) None
    else Some(ddl)
}
