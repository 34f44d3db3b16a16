package graft.cdc

import graft.codec.PgType
import graft.streaming.{CdcApplier, InMemoryTxStore}
import org.scalatest.funsuite.AnyFunSuite

/** DDL flow (A6-A8, A20): detection/classification, replay through the
  * sink, CTAS same-tx DML suppression, CRC dedup, and schema-registry
  * refresh — mirroring reference pkg/sink/postgres.go:296-393 scenarios.
  */
class DdlSpec extends AnyFunSuite {

  test("classifier: ddl_logs is DDL, sources is ignored") {
    assert(DdlClassifier.isDdl("pgcapture", "ddl_logs"))
    assert(!DdlClassifier.isDdl("public", "ddl_logs"))
    assert(DdlClassifier.ignore("pgcapture", "sources"))
    assert(!DdlClassifier.ignore("public", "sources"))
  }

  test("touchedRelations finds CTAS / SELECT INTO / DML-in-DDL targets") {
    assert(DdlClassifier.touchedRelations(
      "CREATE TABLE t2 AS SELECT * FROM t1") == Set("t2"))
    assert(DdlClassifier.touchedRelations(
      """CREATE TABLE IF NOT EXISTS "S"."Big" AS SELECT 1""").contains("big"))
    assert(DdlClassifier.touchedRelations(
      "SELECT * INTO archive FROM live WHERE old").contains("archive"))
    assert(DdlClassifier.touchedRelations(
      "INSERT INTO audit SELECT * FROM x").contains("audit"))
    assert(DdlClassifier.touchedRelations("ALTER TABLE t ADD COLUMN c int").isEmpty)
  }

  test("REFRESH MATERIALIZED VIEW is stripped, not replayed") {
    assert(DdlClassifier.stripNonReplayable("REFRESH MATERIALIZED VIEW mv").isEmpty)
    assert(DdlClassifier.stripNonReplayable("CREATE INDEX i ON t(c)").isDefined)
  }

  private val keys: CdcApplier.KeyResolver = (_, _) => Seq("id")
  private val oids = Map("id" -> PgType.Int8, "v" -> PgType.Int4,
    "query" -> PgType.Text)

  private def dml(op: String, table: String, lsn: Long, seq: Int, id: Long,
      v: Int) =
    CdcApplier.Change(op, "public", table,
      Map("id" -> PgType.encode(PgType.Int8, id),
        "v" -> PgType.encode(PgType.Int4, v)),
      Map.empty, oids, lsn, seq)

  private def ddl(lsn: Long, seq: Int, sql: String) =
    CdcApplier.Change("INSERT", "pgcapture", "ddl_logs",
      Map("query" -> PgType.encode(PgType.Text, sql)), Map.empty, oids, lsn, seq)

  private def src(lsn: Long, seq: Int) =
    CdcApplier.Change("UPDATE", "pgcapture", "sources",
      Map.empty, Map.empty, oids, lsn, seq)

  test("DDL replays through the sink; CTAS suppresses same-tx DML only") {
    val store = new InMemoryTxStore
    CdcApplier.applyBatch(store, "s", Seq(
      ddl(1, 1, "CREATE TABLE t2 AS SELECT * FROM t1"),
      dml("INSERT", "t2", 1, 2, 1, 10), // duplicated by CTAS → suppressed
      dml("INSERT", "t1", 1, 3, 5, 50), // different table → applied
      dml("INSERT", "t2", 2, 1, 2, 20)  // NEXT tx → applied
    ), keys)
    assert(store.ddlLog == Seq("CREATE TABLE t2 AS SELECT * FROM t1"))
    assert(store.rows("public.t2").map(_("id")) == Seq(2L))
    assert(store.rows("public.t1").map(_("id")) == Seq(5L))
  }

  test("consecutive identical DDL is CRC-deduplicated") {
    val store = new InMemoryTxStore
    CdcApplier.applyBatch(store, "s", Seq(
      ddl(1, 1, "CREATE INDEX i ON t(c)"),
      ddl(1, 2, "CREATE INDEX i ON t(c)"),
      ddl(2, 1, "DROP INDEX i")), keys)
    assert(store.ddlLog == Seq("CREATE INDEX i ON t(c)", "DROP INDEX i"))
  }

  test("touchedRelations finds TRUNCATE targets (r14 ask #1)") {
    assert(DdlClassifier.touchedRelations("TRUNCATE t1") == Set("t1"))
    assert(DdlClassifier.touchedRelations(
      "TRUNCATE TABLE ONLY public.t1 *, \"S\".\"Big\" RESTART IDENTITY CASCADE")
      == Set("t1", "big"))
  }

  test("captured TRUNCATE DDL suppresses the same tx's wire control row (A20)") {
    val store = new InMemoryTxStore
    def truncRow(table: String, lsn: Long, seq: Int) =
      CdcApplier.Change("TRUNCATE", "public", table,
        Map.empty, Map.empty, oids, lsn, seq)
    CdcApplier.applyBatch(store, "s", Seq(
      dml("INSERT", "t1", 1, 1, 1, 10),
      dml("INSERT", "t1", 1, 2, 2, 20),
      // source tx 2: the TRUNCATE statement was captured as DDL AND
      // the server emitted the wire 'T' frame — replaying the DDL
      // clears the table; the control row must be suppressed, not
      // double-applied
      ddl(2, 1, "TRUNCATE TABLE t1"),
      truncRow("t1", 2, 2),
      // NEXT tx: a bare wire truncate (no DDL capture) applies
      dml("INSERT", "t1", 3, 1, 3, 30),
      truncRow("t1", 4, 1),
      dml("INSERT", "t1", 5, 1, 4, 40)), keys)
    assert(store.ddlLog == Seq("TRUNCATE TABLE t1"))
    assert(store.truncations == 1, "DDL-covered control row suppressed, bare one applied")
    assert(store.rows("public.t1").map(_("id")) == Seq(4L))
  }

  test("pgcapture.sources rows are never applied") {
    val store = new InMemoryTxStore
    CdcApplier.applyBatch(store, "s", Seq(
      src(1, 1), dml("INSERT", "t1", 2, 1, 1, 1)), keys)
    assert(store.rows("pgcapture.sources").isEmpty)
    assert(store.rows("public.t1").size == 1)
  }

  test("schema registry: update, lookup, DDL invalidation") {
    import graft.codec.PgOutput.{Column => C, Relation => R}
    val reg = new SchemaRegistry
    val rel = R(9, "public", "t1", 'd', Seq(
      C("id", PgType.Int8, isKey = true), C("v", PgType.Int4, isKey = false)))
    reg.update(rel)
    assert(reg.keyColumns("public", "t1") == Seq("id"))
    assert(reg.oids("public", "t1") == Map("id" -> PgType.Int8, "v" -> PgType.Int4))
    reg.invalidate("public", "t1")
    assert(reg.get("public", "t1").isEmpty)
    assert(reg.keyColumns("public", "t1").isEmpty)
  }
}
