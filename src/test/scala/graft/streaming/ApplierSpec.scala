package graft.streaming

import graft.cdc.{Checkpoint, ColumnInfo}
import graft.codec.PgType

/** [[TxStoreContract]] over [[InMemoryTxStore]], plus the applier-level
  * column-info matrix: replica identity d/n/f/i × op, generated and
  * identity-generation column filtering (reference
  * pkg/sink/postgres.go:400-404, 507-545; pkg/decode/schema.go:30-90). */
class ApplierSpec extends TxStoreContract {

  private final class MemHarness extends Harness {
    val s = new InMemoryTxStore
    def store: CdcApplier.TxStore = s
    def commits: Int = s.commits
    def failNextCommit(): Unit = s.failOnCommit = s.commits
    def clearFailures(): Unit = s.failOnCommit = -1
    def rows(schemaTable: String): Seq[Map[String, Any]] = s.rows(schemaTable)
  }

  override def withHarness(f: Harness => Unit): Unit = f(new MemHarness)

  // ---- column-info matrix (SURVEY §7.3) -------------------------------

  private val allOids = Map("id" -> PgType.Int8, "v" -> PgType.Int4,
    "gen" -> PgType.Int4, "serial" -> PgType.Int8)
  private val colInfo = ColumnInfo(keys = Seq("id"),
    generated = Set("gen"), identityGeneration = Set("serial"))
  private val resolve: CdcApplier.InfoResolver = (_, _) => colInfo

  private def enc(m: Map[String, Any]): Map[String, Array[Byte]] = m.map {
    case (k, v: Long) => k -> PgType.encode(PgType.Int8, v)
    case (k, v: Int) => k -> PgType.encode(PgType.Int4, v)
    case (k, v) => sys.error(s"fixture type $k=$v")
  }

  private def change(op: String, nf: Map[String, Any], of: Map[String, Any],
      lsn: Long): CdcApplier.Change =
    CdcApplier.Change(op, "public", "t", enc(nf), enc(of), allOids, lsn, 1)

  test("INSERT drops generated columns, keeps identity columns") {
    val s = new InMemoryTxStore
    CdcApplier.applyWithInfo(s, "s", Seq(change("INSERT",
      Map("id" -> 1L, "v" -> 10, "gen" -> 99, "serial" -> 7L), Map.empty, 1)),
      resolve)
    // gen is computed by the target; serial rides OVERRIDING SYSTEM VALUE
    assert(s.rows("public.t") ==
      Seq(Map("id" -> 1L, "v" -> 10, "serial" -> 7L)))
  }

  test("per-change envelope keys beat the batch resolver (mid-batch replident change)") {
    val s = new InMemoryTxStore
    // the batch-level resolver reflects the batch's NEWEST catalog and
    // says key = v — wrong for rows captured before a mid-batch
    // replident change, whose own envelope still says key = id
    val newest: CdcApplier.InfoResolver = (_, _) => ColumnInfo(Seq("v"))
    CdcApplier.applyWithInfo(s, "s", Seq(
      change("INSERT", Map("id" -> 1L, "v" -> 10), Map.empty, 1)
        .copy(keys = Some(Seq("id"))),
      // UPDATE without old image resolves keys from the new image: with
      // the row's own keys (id=1, matches) — with the resolver's (v=12,
      // matches nothing) the update would silently vanish
      change("UPDATE", Map("id" -> 1L, "v" -> 12), Map.empty, 2)
        .copy(keys = Some(Seq("id")))), newest)
    assert(s.rows("public.t") == Seq(Map("id" -> 1L, "v" -> 12)))
  }

  test("UPDATE with old image: keys from old, sets exclude generated+identity") {
    val s = new InMemoryTxStore
    CdcApplier.applyWithInfo(s, "s", Seq(
      change("INSERT", Map("id" -> 1L, "v" -> 10, "serial" -> 7L), Map.empty, 1),
      // replident FULL: old image = entire row; WHERE matches all old cols
      change("UPDATE", Map("id" -> 1L, "v" -> 11, "gen" -> 5, "serial" -> 7L),
        Map("id" -> 1L, "v" -> 10, "serial" -> 7L), 2)), resolve)
    assert(s.rows("public.t") ==
      Seq(Map("id" -> 1L, "v" -> 11, "serial" -> 7L)))
  }

  test("UPDATE without old image: identity keys from new, keys leave SET") {
    val s = new InMemoryTxStore
    CdcApplier.applyWithInfo(s, "s", Seq(
      change("INSERT", Map("id" -> 1L, "v" -> 10), Map.empty, 1),
      // replident DEFAULT, key unchanged → no old image on the wire
      change("UPDATE", Map("id" -> 1L, "v" -> 12, "gen" -> 5), Map.empty, 2)),
      resolve)
    assert(s.rows("public.t") == Seq(Map("id" -> 1L, "v" -> 12)))
  }

  test("replident NOTHING: UPDATE with no resolvable key is skipped, stream advances") {
    val s = new InMemoryTxStore
    val noKeys: CdcApplier.InfoResolver = (_, _) => ColumnInfo(Seq.empty)
    CdcApplier.applyWithInfo(s, "s", Seq(
      change("INSERT", Map("id" -> 1L, "v" -> 10), Map.empty, 1),
      change("UPDATE", Map("id" -> 1L, "v" -> 99), Map.empty, 2)), noKeys)
    assert(s.rows("public.t") == Seq(Map("id" -> 1L, "v" -> 10)),
      "no identity → update must not guess a match")
    assert(s.readWatermark("s").contains(Checkpoint(2, 1)))
  }

  test("replident INDEX: old image carries index columns only") {
    val s = new InMemoryTxStore
    val idxInfo: CdcApplier.InfoResolver = (_, _) => ColumnInfo(Seq("v"))
    CdcApplier.applyWithInfo(s, "s", Seq(
      change("INSERT", Map("id" -> 1L, "v" -> 10), Map.empty, 1),
      // USING INDEX (v): wire old image = the index column
      change("UPDATE", Map("id" -> 2L, "v" -> 20), Map("v" -> 10), 2)), idxInfo)
    assert(s.rows("public.t") == Seq(Map("id" -> 2L, "v" -> 20)))
  }

  test("UPDATE whose SET would be empty is skipped") {
    val s = new InMemoryTxStore
    // every non-key column is generated → nothing writable remains
    val genOnly: CdcApplier.InfoResolver =
      (_, _) => ColumnInfo(Seq("id"), generated = Set("gen"))
    CdcApplier.applyWithInfo(s, "s", Seq(
      change("INSERT", Map("id" -> 1L), Map.empty, 1),
      change("UPDATE", Map("id" -> 1L, "gen" -> 9), Map.empty, 2)), genOnly)
    assert(s.rows("public.t") == Seq(Map("id" -> 1L)))
    assert(s.readWatermark("s").contains(Checkpoint(2, 1)))
  }

  test("unchanged-TOAST column absent from UPDATE must not be overwritten") {
    val s = new InMemoryTxStore
    val oids3 = Map("id" -> PgType.Int8, "v" -> PgType.Int4, "blob" -> PgType.Text)
    def c3(op: String, nf: Map[String, Any], lsn: Long) =
      CdcApplier.Change(op, "public", "t",
        nf.map {
          case (k, x: Long) => k -> PgType.encode(PgType.Int8, x)
          case (k, x: Int) => k -> PgType.encode(PgType.Int4, x)
          case (k, x: String) => k -> PgType.encode(PgType.Text, x)
          case (k, x) => sys.error(s"$k=$x")
        }, Map.empty, oids3, lsn, 1)
    CdcApplier.applyWithInfo(s, "s", Seq(
      c3("INSERT", Map("id" -> 1L, "v" -> 10, "blob" -> "big-toast-value"), 1),
      // UPDATE ships only changed columns; `blob` is ABSENT (unchanged
      // TOAST, pkg/decode/decoder.go:98-115) — the apply must merge,
      // never null it out
      c3("UPDATE", Map("id" -> 1L, "v" -> 11), 2)),
      (_, _) => ColumnInfo(Seq("id")))
    assert(s.rows("public.t") ==
      Seq(Map("id" -> 1L, "v" -> 11, "blob" -> "big-toast-value")))
  }

  test("replident FULL old image with NULL column: WHERE restricted to identity keys") {
    val s = new InMemoryTxStore
    val oids3 = Map("id" -> PgType.Int8, "v" -> PgType.Int4, "note" -> PgType.Text)
    // note is NULL: a full-row WHERE would emit `note = NULL` on a SQL
    // target and match nothing — the store must only see the key
    val nullNote = Map("id" -> PgType.encode(PgType.Int8, 1L),
      "v" -> PgType.encode(PgType.Int4, 10),
      "note" -> null.asInstanceOf[Array[Byte]])
    val keyProbe = scala.collection.mutable.Buffer.empty[Map[String, Any]]
    val inner = new InMemoryTxStore
    val probe = new CdcApplier.TxStore {
      def begin(): Unit = inner.begin()
      def commit(): Unit = inner.commit()
      def rollback(): Unit = inner.rollback()
      def insert(sc: String, t: String, row: Map[String, Any],
          k: Seq[String]): Unit = inner.insert(sc, t, row, k)
      def update(sc: String, t: String, keys: Map[String, Any],
          set: Map[String, Any]): Unit = {
        keyProbe += keys; inner.update(sc, t, keys, set)
      }
      def delete(sc: String, t: String, keys: Map[String, Any]): Unit = {
        keyProbe += keys; inner.delete(sc, t, keys)
      }
      def truncate(sc: String, t: String): Unit = inner.truncate(sc, t)
      def executeDdl(sql: String): Unit = inner.executeDdl(sql)
      def readWatermark(id: String): Option[Checkpoint] = inner.readWatermark(id)
      def writeWatermark(id: String, cp: Checkpoint): Unit =
        inner.writeWatermark(id, cp)
    }
    CdcApplier.applyWithInfo(probe, "s", Seq(
      CdcApplier.Change("INSERT", "public", "t", nullNote, Map.empty, oids3, 1, 1),
      CdcApplier.Change("DELETE", "public", "t", Map.empty, nullNote, oids3, 2, 1)),
      (_, _) => ColumnInfo(Seq("id")))
    assert(keyProbe == Seq(Map("id" -> 1L)),
      "identity keys only — no NULL columns in the WHERE key map")
    assert(inner.rows("public.t").isEmpty, "the delete must match")
  }

  test("store-level guard: empty-key update/delete fail loudly") {
    val s = new InMemoryTxStore
    s.begin()
    intercept[IllegalArgumentException](s.update("p", "t", Map.empty, Map("v" -> 1)))
    intercept[IllegalArgumentException](s.delete("p", "t", Map.empty))
  }

  test("run-length INSERT batching reaches the store as multi-row writes (A17)") {
    val s = new InMemoryTxStore
    val changes = (1 to 5).map(i =>
      change("INSERT", Map("id" -> i.toLong, "v" -> i), Map.empty, i.toLong))
    CdcApplier.applyWithInfo(s, "s", changes, resolve)
    assert(s.insertBatchSizes == Seq(5), "5 consecutive same-table inserts → one batch")
  }
}
