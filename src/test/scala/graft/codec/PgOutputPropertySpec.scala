package graft.codec

import graft.codec.PgOutput._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Message-framing property tests: encode→decode round-trips for
  * randomized B/C/R/I/U/D messages, asserting the IMAGE semantics the
  * applier depends on (nulls present-with-null in new images, dropped
  * from old images; unchanged TOAST absent unless replica-identity
  * FULL supplies the old value) against independently computed
  * expectations — not against the encoder's own bookkeeping. */
class PgOutputPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(Seed(777L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def sameImage(a: Map[String, Array[Byte]],
      b: Map[String, Array[Byte]]): Boolean =
    a.keySet == b.keySet && a.keySet.forall { k =>
      (a(k), b(k)) match {
        case (null, null) => true
        case (x, y) if x != null && y != null => java.util.Arrays.equals(x, y)
        case _ => false
      }
    }

  private val ident = Gen.chooseNum(1, 10).flatMap(n =>
    Gen.stringOfN(n, Gen.frequency(8 -> Gen.alphaNumChar,
      1 -> Gen.const('_'), 1 -> Gen.const('ß'))))

  private val relGen: Gen[Relation] = for {
    relId <- Gen.chooseNum(1, Int.MaxValue)
    nsp <- ident
    name <- ident
    replident <- Gen.oneOf('d', 'f')
    ncols <- Gen.chooseNum(1, 8)
    flags <- Gen.listOfN(ncols, Gen.oneOf(true, false))
    oids <- Gen.listOfN(ncols, Gen.oneOf(PgType.Int8, PgType.Text,
      PgType.Bool, PgType.Numeric, PgType.Timestamptz))
    base <- ident
  } yield Relation(relId, nsp, name, replident,
    flags.zip(oids).zipWithIndex.map { case ((k, o), i) =>
      Column(s"${base}_$i", o, k)
    })

  /** null → SQL NULL, Some(Toast) sentinel → unchanged TOAST,
    * bytes → 'b' datum. */
  private val datumGen: Gen[Array[Byte]] = Gen.frequency(
    2 -> Gen.const(null: Array[Byte]),
    1 -> Gen.const(Encoder.Toast),
    5 -> Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray)))

  private def datums(rel: Relation): Gen[Seq[Array[Byte]]] =
    Gen.sequence[Seq[Array[Byte]], Array[Byte]](rel.columns.map(_ => datumGen))

  /** Expected NEW image per the decoder contract. */
  private def newImage(rel: Relation, nd: Seq[Array[Byte]],
      old: Option[Seq[Array[Byte]]]): Map[String, Array[Byte]] = {
    val names = rel.columns.map(_.name)
    val base = names.zip(nd).collect {
      case (n, d) if d == null => n -> (null: Array[Byte])
      case (n, d) if !(d eq Encoder.Toast) => n -> d
    }.toMap
    val toastFill =
      if (rel.replicaIdentity == 'f' && old.isDefined)
        names.zip(nd).zip(old.get).collect {
          case ((n, d), od) if (d eq Encoder.Toast) &&
            od != null && !(od eq Encoder.Toast) => n -> od
        }.toMap
      else Map.empty[String, Array[Byte]]
    base ++ toastFill
  }

  /** Expected OLD image: non-null, non-TOAST datums only. */
  private def oldImage(rel: Relation,
      od: Seq[Array[Byte]]): Map[String, Array[Byte]] =
    rel.columns.map(_.name).zip(od).collect {
      case (n, d) if d != null && !(d eq Encoder.Toast) => n -> d
    }.toMap

  test("begin/commit/relation round-trip") {
    check("begin", Prop.forAll(Gen.long, Gen.long, Gen.posNum[Int]) {
      (lsn, ts, xid) =>
        new Decoder().decode(Encoder.begin(lsn, ts, xid)) == Begin(lsn, ts, xid)
    })
    check("commit", Prop.forAll(Gen.long, Gen.long, Gen.long) { (c, e, ts) =>
      new Decoder().decode(Encoder.commit(c, e, ts)) == Commit(c, e, ts)
    })
    check("relation", Prop.forAll(relGen) { rel =>
      new Decoder().decode(Encoder.relation(rel)) == RelationMsg(rel)
    })
  }

  test("insert image: nulls present-with-null, TOAST absent") {
    check("insert", Prop.forAll(relGen.flatMap(r =>
      datums(r).map(r -> _))) { case (rel, nd) =>
      val d = new Decoder()
      d.decode(Encoder.relation(rel))
      d.decode(Encoder.insert(rel, nd)) match {
        case Change("INSERT", r2, Some(img), None) =>
          r2 == rel && sameImage(img, newImage(rel, nd, None))
        case _ => false
      }
    })
  }

  test("update image: replident FULL back-fills TOAST from the old row") {
    val gen = for {
      rel <- relGen
      nd <- datums(rel)
      od <- datums(rel)
      kind <- Gen.oneOf('K', 'O')
      withOld <- Gen.oneOf(true, false)
    } yield (rel, nd, od, kind, withOld)
    check("update", Prop.forAll(gen) { case (rel, nd, od, kind, withOld) =>
      val d = new Decoder()
      d.decode(Encoder.relation(rel))
      val old = if (withOld) Some(od) else None
      d.decode(Encoder.update(rel, old, nd, kind)) match {
        case Change("UPDATE", r2, Some(img), oi) =>
          r2 == rel &&
            sameImage(img, newImage(rel, nd, old)) &&
            (old match {
              case None => oi.isEmpty
              case Some(o) => oi.exists(sameImage(_, oldImage(rel, o)))
            })
        case _ => false
      }
    })
  }

  test("truncate round-trip: relid order, flags, undeclared-relid fail-loud (r15)") {
    val gen = for {
      rels <- Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, relGen))
        .map(_.distinctBy(_.relId))
      bits <- Gen.chooseNum(0, 3)
    } yield (rels, bits)
    check("truncate", Prop.forAll(gen) { case (rels, bits) =>
      val d = new Decoder()
      rels.foreach(r => d.decode(Encoder.relation(r)))
      d.decode(Encoder.truncate(rels.map(_.relId), bits)) match {
        case Truncate(got, cascade, restart) =>
          got == rels && cascade == ((bits & 1) != 0) &&
            restart == ((bits & 2) != 0)
        case _ => false
      }
    })
    check("truncate-undeclared", Prop.forAll(relGen) { rel =>
      try { new Decoder().decode(Encoder.truncate(Seq(rel.relId))); false }
      catch { case _: CodecException => true }
    })
  }

  test("logical message round-trip: flags, lsn, prefix, content (r15)") {
    val gen = for {
      txn <- Gen.oneOf(true, false)
      lsn <- Gen.long
      prefix <- ident
      n <- Gen.chooseNum(0, 64)
      content <- Gen.listOfN(n,
        Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    } yield (txn, lsn, prefix, content)
    check("message", Prop.forAll(gen) { case (txn, lsn, prefix, content) =>
      new Decoder().decode(Encoder.message(txn, lsn, prefix, content)) match {
        case LogicalMessage(t2, l2, p2, c2) =>
          t2 == txn && l2 == lsn && p2 == prefix &&
            java.util.Arrays.equals(c2, content)
        case _ => false
      }
    })
  }

  test("fuzz: truncation and bit-flips fail loudly or parse — never crash") {
    // the decoder's robustness contract: any corruption of a valid
    // message either still parses to SOME Message (e.g. a flipped
    // identifier byte) or throws CodecException (underflow, corrupt
    // length, unknown relation) — never an out-of-bounds / NPE /
    // infinite loop. This is what lets the source treat a torn WAL
    // segment as a detectable error instead of silent garbage.
    def outcomeOk(d: Decoder, bytes: Array[Byte]): Boolean =
      try { d.decode(bytes); true }
      catch { case _: CodecException => true; case _: Throwable => false }
    val gen = for {
      rel <- relGen
      nd <- datums(rel)
      cut <- Gen.chooseNum(0, 100)
      flipAt <- Gen.chooseNum(0, 10000)
      flipBit <- Gen.chooseNum(0, 7)
    } yield (rel, nd, cut, flipAt, flipBit)
    check("fuzz", Prop.forAll(gen) { case (rel, nd, cut, flipAt, flipBit) =>
      val relMsg = Encoder.relation(rel)
      val ins = Encoder.insert(rel, nd)
      // truncation of both message kinds
      val d1 = new Decoder(); d1.decode(relMsg)
      val truncOk = outcomeOk(new Decoder(), relMsg.take(cut % relMsg.length)) &&
        outcomeOk(d1, ins.take(cut % ins.length))
      // single-bit flip of both message kinds
      def flipped(m: Array[Byte]): Array[Byte] = {
        val c = m.clone(); val i = flipAt % m.length
        c(i) = (c(i) ^ (1 << flipBit)).toByte; c
      }
      val d2 = new Decoder(); d2.decode(relMsg)
      val flipOk = outcomeOk(new Decoder(), flipped(relMsg)) &&
        outcomeOk(d2, flipped(ins))
      // the r15 first-class frames obey the same robustness contract
      val trunc = Encoder.truncate(Seq(rel.relId))
      val msg = Encoder.message(transactional = true, 42L, "p",
        Array[Byte](1, 2, 3))
      val d3 = new Decoder(); d3.decode(relMsg)
      val d4 = new Decoder(); d4.decode(relMsg)
      val tmOk = outcomeOk(d3, trunc.take(cut % trunc.length)) &&
        outcomeOk(d4, flipped(trunc)) &&
        outcomeOk(new Decoder(), msg.take(cut % msg.length)) &&
        outcomeOk(new Decoder(), flipped(msg))
      // same contract for the pglogical wire format (shared
      // BytesReader underflow discipline, independent framing)
      def plOk(d: PgLogical.Decoder, bytes: Array[Byte]): Boolean =
        try { d.decode(bytes); true }
        catch { case _: CodecException => true; case _: Throwable => false }
      val plRel = PgLogical.Encoder.relation(rel)
      val plIns = PgLogical.Encoder.insert(rel, nd)
      val p1 = new PgLogical.Decoder(); p1.decode(plRel)
      val p2 = new PgLogical.Decoder(); p2.decode(plRel)
      val plFuzzOk =
        plOk(new PgLogical.Decoder(), plRel.take(cut % plRel.length)) &&
        plOk(p1, plIns.take(cut % plIns.length)) &&
        plOk(new PgLogical.Decoder(), flipped(plRel)) &&
        plOk(p2, flipped(plIns))
      truncOk && flipOk && tmOk && plFuzzOk
    })
  }

  test("delete image: null columns dropped entirely") {
    val gen = for {
      rel <- relGen
      od <- datums(rel)
      kind <- Gen.oneOf('K', 'O')
    } yield (rel, od, kind)
    check("delete", Prop.forAll(gen) { case (rel, od, kind) =>
      val d = new Decoder()
      d.decode(Encoder.relation(rel))
      d.decode(Encoder.delete(rel, od, kind)) match {
        case Change("DELETE", r2, None, Some(oi)) =>
          r2 == rel && sameImage(oi, oldImage(rel, od))
        case _ => false
      }
    })
  }
}
