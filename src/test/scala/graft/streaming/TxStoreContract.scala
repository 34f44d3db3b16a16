package graft.streaming

import graft.cdc.Checkpoint
import graft.codec.PgType
import org.scalatest.funsuite.AnyFunSuite

/** Store-agnostic apply scenarios, mirroring the reference's
  * pkg/sink/postgres_test.go shapes (FIXTURES.md §2): ordered tx apply,
  * batch-tx boundaries, watermark-in-same-tx atomicity, crash/replay
  * idempotence, update key-split, conflict-skipping inserts.
  *
  * Runs against every [[CdcApplier.TxStore]]: [[InMemoryTxStore]]
  * (ApplierSpec) and the production JDBC store over embedded Derby
  * (JdbcTxStoreSpec) — proving the exactly-once contract holds on a
  * real database transaction boundary, not just the in-memory model.
  */
abstract class TxStoreContract extends AnyFunSuite {

  trait Harness extends AutoCloseable {
    def store: CdcApplier.TxStore
    def commits: Int
    /** Arrange for the next commit to throw (crash injection). */
    def failNextCommit(): Unit
    def clearFailures(): Unit
    /** Committed rows of `schema.table`, any order. */
    def rows(schemaTable: String): Seq[Map[String, Any]]
    override def close(): Unit = ()
  }

  def withHarness(f: Harness => Unit): Unit

  protected val keys: CdcApplier.KeyResolver = (_, _) => Seq("id")
  protected val oids = Map("id" -> PgType.Int8, "v" -> PgType.Int4)

  protected def ch(op: String, lsn: Long, seq: Int, id: Long,
      v: Option[Int] = None, old: Map[String, Array[Byte]] = Map.empty): CdcApplier.Change = {
    val nf = op match {
      case "DELETE" => Map.empty[String, Array[Byte]]
      case _ => Map("id" -> PgType.encode(PgType.Int8, id)) ++
        v.map(x => "v" -> PgType.encode(PgType.Int4, x))
    }
    val of = if (op == "DELETE") Map("id" -> PgType.encode(PgType.Int8, id)) else old
    CdcApplier.Change(op, "public", "test_table", nf, of, oids, lsn, seq)
  }

  test("ordered apply: insert, update, delete land in order") {
    withHarness { h =>
      val cp = CdcApplier.applyBatch(h.store, "src1", Seq(
        ch("INSERT", 1, 1, 1, Some(10)),
        ch("INSERT", 2, 1, 2, Some(20)),
        ch("UPDATE", 3, 1, 1, Some(11)),
        ch("DELETE", 4, 1, 2)), keys)
      assert(cp == Checkpoint(4, 1))
      assert(h.rows("public.test_table") == Seq(Map("id" -> 1L, "v" -> 11)))
      assert(h.store.readWatermark("src1").contains(Checkpoint(4, 1)))
    }
  }

  test("idempotent resume: redelivered slice is a no-op (A12)") {
    withHarness { h =>
      val slice = Seq(ch("INSERT", 1, 1, 1, Some(10)), ch("UPDATE", 2, 1, 1, Some(12)))
      CdcApplier.applyBatch(h.store, "s", slice, keys)
      val commitsAfterFirst = h.commits
      // full redelivery (e.g. foreachBatch retry) — watermark filters all
      CdcApplier.applyBatch(h.store, "s", slice, keys)
      assert(h.commits == commitsAfterFirst, "no store tx for stale slice")
      assert(h.rows("public.test_table") == Seq(Map("id" -> 1L, "v" -> 12)))
    }
  }

  test("partial overlap: only unseen suffix applies") {
    withHarness { h =>
      CdcApplier.applyBatch(h.store, "s",
        Seq(ch("INSERT", 1, 1, 1, Some(10))), keys)
      CdcApplier.applyBatch(h.store, "s", Seq(
        ch("INSERT", 1, 1, 1, Some(999)), // dup: must be skipped by watermark
        ch("INSERT", 2, 1, 2, Some(20))), keys)
      assert(h.rows("public.test_table").toSet == Set(
        Map("id" -> 1L, "v" -> 10), Map("id" -> 2L, "v" -> 20)))
    }
  }

  test("crash inside store tx rolls back data AND watermark together (A16)") {
    withHarness { h =>
      CdcApplier.applyBatch(h.store, "s", Seq(ch("INSERT", 1, 1, 1, Some(1))), keys)
      val wm0 = h.store.readWatermark("s")
      h.failNextCommit()
      intercept[RuntimeException] {
        CdcApplier.applyBatch(h.store, "s", Seq(ch("INSERT", 2, 1, 2, Some(2))), keys)
      }
      assert(h.rows("public.test_table") == Seq(Map("id" -> 1L, "v" -> 1)))
      assert(h.store.readWatermark("s") == wm0, "watermark must not outrun data")
      // replay after recovery applies exactly once
      h.clearFailures()
      CdcApplier.applyBatch(h.store, "s", Seq(ch("INSERT", 2, 1, 2, Some(2))), keys)
      assert(h.rows("public.test_table").map(_("id")).toSet == Set(1L, 2L))
    }
  }

  test("txBatch groups source txs per store tx (reference BatchTXSize)") {
    withHarness { h =>
      val changes = (1 to 10).map(i => ch("INSERT", i.toLong, 1, i.toLong, Some(i)))
      CdcApplier.applyBatch(h.store, "s", changes, keys, txBatch = 3)
      assert(h.rows("public.test_table").size == 10)
      assert(h.commits == 4, s"10 txs / batch 3 -> 4 store commits, got ${h.commits}")
      assert(h.store.readWatermark("s").contains(Checkpoint(10, 1)))
    }
  }

  test("source tx is never split across store txs") {
    withHarness { h =>
      // one source tx (lsn=1) with 5 changes, txBatch=1: still one commit
      val changes = (1 to 5).map(i => ch("INSERT", 1, i, i.toLong, Some(i)))
      CdcApplier.applyBatch(h.store, "s", changes, keys, txBatch = 1)
      assert(h.commits == 1)
      assert(h.rows("public.test_table").size == 5)
    }
  }

  test("update key-split: old image keys win over new-row keys (A18)") {
    withHarness { h =>
      CdcApplier.applyBatch(h.store, "s", Seq(ch("INSERT", 1, 1, 7, Some(70))), keys)
      // key change 7→8 ships old image {id:7}; row must be found by OLD key
      val keyChange = CdcApplier.Change("UPDATE", "public", "test_table",
        Map("id" -> PgType.encode(PgType.Int8, 8L), "v" -> PgType.encode(PgType.Int4, 80)),
        Map("id" -> PgType.encode(PgType.Int8, 7L)), oids, 2, 1)
      CdcApplier.applyBatch(h.store, "s", Seq(keyChange), keys)
      assert(h.rows("public.test_table") == Seq(Map("id" -> 8L, "v" -> 80)))
    }
  }

  test("insert is conflict-skipping (ON CONFLICT DO NOTHING, A17)") {
    withHarness { h =>
      CdcApplier.applyBatch(h.store, "a", Seq(ch("INSERT", 1, 1, 1, Some(1))), keys)
      // second source id replays the same row (e.g. dump overlap): skipped
      CdcApplier.applyBatch(h.store, "b", Seq(ch("INSERT", 5, 1, 1, Some(99))), keys)
      assert(h.rows("public.test_table") == Seq(Map("id" -> 1L, "v" -> 1)))
    }
  }

  test("unsigned LSN ordering in the apply sort") {
    withHarness { h =>
      val big = Long.MinValue // 2^63 unsigned — must apply AFTER MaxValue
      CdcApplier.applyBatch(h.store, "s", Seq(
        ch("UPDATE", big, 1, 1, Some(2)),
        ch("INSERT", Long.MaxValue, 1, 1, Some(1))), keys)
      assert(h.rows("public.test_table") == Seq(Map("id" -> 1L, "v" -> 2)))
      assert(h.store.readWatermark("s").contains(Checkpoint(big, 1)))
    }
  }

  test("keyless DELETE cannot truncate the table") {
    withHarness { h =>
      CdcApplier.applyBatch(h.store, "s", Seq(
        ch("INSERT", 1, 1, 1, Some(1)), ch("INSERT", 2, 1, 2, Some(2))), keys)
      // DELETE with an EMPTY old image (replident NOTHING / malformed):
      // must be skipped, never become a WHERE-less DELETE
      val keyless = CdcApplier.Change("DELETE", "public", "test_table",
        Map.empty, Map.empty, oids, 3, 1)
      CdcApplier.applyBatch(h.store, "s", Seq(keyless), keys)
      assert(h.rows("public.test_table").size == 2, "keyless DELETE must not match all rows")
      // the stream still advances past the skipped event
      assert(h.store.readWatermark("s").contains(Checkpoint(3, 1)))
    }
  }

  test("TRUNCATE control row clears the table; later inserts survive (r14 ask #1)") {
    withHarness { h =>
      def truncRow(lsn: Long) = CdcApplier.Change("TRUNCATE", "public",
        "test_table", Map.empty, Map.empty, oids, lsn, 1)
      val slice = Seq(
        ch("INSERT", 1, 1, 1, Some(10)),
        ch("INSERT", 2, 1, 2, Some(20)),
        truncRow(3),
        ch("INSERT", 4, 1, 3, Some(30)))
      val cp = CdcApplier.applyBatch(h.store, "srcT", slice, keys)
      assert(cp == Checkpoint(4, 1))
      assert(h.rows("public.test_table") == Seq(Map("id" -> 3L, "v" -> 30)),
        "pre-truncate rows cleared, post-truncate insert survives")
      // replay idempotence: the redelivered slice sits at or below the
      // watermark — the clear must NOT re-run over the live table
      CdcApplier.applyBatch(h.store, "srcT", slice, keys)
      assert(h.rows("public.test_table") == Seq(Map("id" -> 3L, "v" -> 30)))
    }
  }

  test("crash atomicity: an uncommitted truncate rolls back with its watermark") {
    withHarness { h =>
      CdcApplier.applyBatch(h.store, "srcT2", Seq(
        ch("INSERT", 1, 1, 1, Some(10))), keys)
      val trunc = CdcApplier.Change("TRUNCATE", "public", "test_table",
        Map.empty, Map.empty, oids, 2, 1)
      h.failNextCommit()
      intercept[RuntimeException](
        CdcApplier.applyBatch(h.store, "srcT2", Seq(trunc), keys))
      h.clearFailures()
      assert(h.rows("public.test_table") == Seq(Map("id" -> 1L, "v" -> 10)),
        "the clear must roll back with the failed store tx")
      assert(h.store.readWatermark("srcT2").contains(Checkpoint(1, 1)))
      // the replay applies it exactly once
      CdcApplier.applyBatch(h.store, "srcT2", Seq(trunc), keys)
      assert(h.rows("public.test_table").isEmpty)
      assert(h.store.readWatermark("srcT2").contains(Checkpoint(2, 1)))
    }
  }
}
