package graft.queries

import java.time.{Instant, LocalDate}

import graft.Tables
import graft.codec.{PgOutput, PgType}
import graft.codec.PgOutput.{Column => PgCol, Relation => PgRel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked exercises of the binary codec (graft.codec): every
  * row is encoded to real pgoutput wire bytes and decoded back *inside
  * the distributed plan* (mapPartitions — one stateful Decoder per
  * partition, seeded with its Relation message, exactly like one
  * replication-stream consumer). The DuckDB oracle recomputes the same
  * values straight from the parquet, so any drift in the wire codec
  * (endianness, epoch offsets, numeric digit groups, tuple framing)
  * breaks the hash compare.
  *
  * Wire formats follow the public pgoutput protocol; semantics mirror
  * reference pkg/decode/pgoutput.go:33-159 + pkg/decode/decoder.go:56-118.
  */
object CodecQueries {

  import PgType._

  /** Typed round-trip row: one field per wire format in the SURVEY §1.3
    * matrix (int2/int4/int8, float4/float8, bool, text, jsonb, uuid,
    * bytea, date, time, timestamptz, numeric, text[]). */
  final case class RtRow(event_id: Long, user_id: Long, event_type: String,
      value: Double, ts: Instant, props: String, uid: String, flag: Boolean,
      day: LocalDate, amount: java.math.BigDecimal, small: Short, mid: Int,
      fval: Float, time_us: Long, tags: Seq[String], payload: Array[Byte])

  private val rtRel = PgRel(1, "public", "codec_rt", 'd', Seq(
    PgCol("event_id", Int8, isKey = true), PgCol("user_id", Int8, isKey = false),
    PgCol("event_type", Text, isKey = false), PgCol("value", Float8, isKey = false),
    PgCol("ts", Timestamptz, isKey = false), PgCol("props", Jsonb, isKey = false),
    PgCol("uid", Uuid, isKey = false), PgCol("flag", Bool, isKey = false),
    PgCol("day", Date, isKey = false), PgCol("amount", Numeric, isKey = false),
    PgCol("small", Int2, isKey = false), PgCol("mid", Int4, isKey = false),
    PgCol("fval", Float4, isKey = false), PgCol("time_us", Time, isKey = false),
    PgCol("tags", elemToArray(Text), isKey = false),
    PgCol("payload", Bytea, isKey = false)))

  private def rtDatums(r: RtRow): Seq[Array[Byte]] = Seq(
    encode(Int8, r.event_id), encode(Int8, r.user_id),
    encode(Text, r.event_type), encode(Float8, r.value),
    encode(Timestamptz, r.ts), encode(Jsonb, r.props), encode(Uuid, r.uid),
    encode(Bool, r.flag), encode(Date, r.day), encode(Numeric, r.amount),
    encode(Int2, r.small), encode(Int4, r.mid), encode(Float4, r.fval),
    encode(Time, r.time_us), encode(elemToArray(Text), r.tags),
    encode(Bytea, r.payload))

  private def rtFromFields(f: Map[String, Array[Byte]]): RtRow = RtRow(
    decode(Int8, f("event_id")).asInstanceOf[Long],
    decode(Int8, f("user_id")).asInstanceOf[Long],
    decode(Text, f("event_type")).asInstanceOf[String],
    decode(Float8, f("value")).asInstanceOf[Double],
    decode(Timestamptz, f("ts")).asInstanceOf[Instant],
    decode(Jsonb, f("props")).asInstanceOf[String],
    decode(Uuid, f("uid")).asInstanceOf[String],
    decode(Bool, f("flag")).asInstanceOf[Boolean],
    decode(Date, f("day")).asInstanceOf[LocalDate],
    decode(Numeric, f("amount")).asInstanceOf[java.math.BigDecimal],
    decode(Int2, f("small")).asInstanceOf[Short],
    decode(Int4, f("mid")).asInstanceOf[Int],
    decode(Float4, f("fval")).asInstanceOf[Float],
    decode(Time, f("time_us")).asInstanceOf[Long],
    decode(elemToArray(Text), f("tags")).asInstanceOf[Seq[Any]].map(_.toString),
    decode(Bytea, f("payload")).asInstanceOf[Array[Byte]])

  /** Wire-encode then wire-decode every row of `ds` through pgoutput
    * INSERT messages. */
  def roundTrip(ds: org.apache.spark.sql.Dataset[RtRow]):
      org.apache.spark.sql.Dataset[RtRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val dec = new PgOutput.Decoder
      dec.decode(PgOutput.Encoder.relation(rtRel))
      it.map { row =>
        val wire = PgOutput.Encoder.insert(rtRel, rtDatums(row))
        dec.decode(wire) match {
          case PgOutput.Change("INSERT", _, Some(nf), None) => rtFromFields(nf)
          case other => throw new graft.codec.CodecException(s"bad decode: $other")
        }
      }
    }
  }

  // -------------------------------------------------- q42 transaction log

  final case class TxIn(event_id: Long, user_id: Long, op: String, value: Double)
  final case class TxOut(op: String, user_id: Long, lsn: Long,
      value: Option[Double])

  private val txRel = PgRel(2, "public", "tx_state", 'd', Seq(
    PgCol("user_id", Int8, isKey = true), PgCol("event_id", Int8, isKey = false),
    PgCol("value", Float8, isKey = false)))

  /** Encode each input row as a full Begin→Change→Commit transaction at
    * lsn = event_id, then decode the stream statefully and stamp each
    * change with its transaction's LSN (the reference's checkpoint
    * tracking, pkg/source/postgres.go:165-248). */
  def txLog(ds: org.apache.spark.sql.Dataset[TxIn]):
      org.apache.spark.sql.Dataset[TxOut] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val enc = PgOutput.Encoder
      val dec = new PgOutput.Decoder
      dec.decode(enc.relation(txRel))
      it.map { r =>
        val lsn = r.event_id + 1 // LSN 0 is reserved for dump rows (A25)
        val wire: Seq[Array[Byte]] = Seq(
          enc.begin(lsn, 0L, r.event_id.toInt),
          r.op match {
            case "INSERT" => enc.insert(txRel, Seq(
              encode(Int8, r.user_id), encode(Int8, r.event_id),
              encode(Float8, r.value)))
            case "DELETE" => enc.delete(txRel, Seq(
              encode(Int8, r.user_id), null, null))
            case _ => enc.update(txRel,
              Some(Seq(encode(Int8, r.user_id), null, null)),
              Seq(encode(Int8, r.user_id), encode(Int8, r.event_id),
                encode(Float8, r.value)))
          },
          enc.commit(lsn, lsn, 0L))
        var beginLsn = -1L
        var out: TxOut = null
        wire.foreach { msg =>
          dec.decode(msg) match {
            case PgOutput.Begin(fl, _, _) => beginLsn = fl
            case PgOutput.Change(op, _, nf, of) =>
              val fields = nf.orElse(of).get
              out = TxOut(op,
                decode(Int8, fields("user_id")).asInstanceOf[Long],
                beginLsn,
                nf.flatMap(m => Option(m.getOrElse("value", null)))
                  .map(d => decode(Float8, d).asInstanceOf[Double]))
            case _ => ()
          }
        }
        out
      }
    }
  }

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Generic CDC envelope row for the typed-projection exercise (A32):
    * the `new` image is a name→binary-datum map exactly as the
    * streaming source emits it. */
  final case class EnvRow(op: String, lsn: Long, seq: Int,
      newFields: Map[String, Array[Byte]], oldFields: Map[String, Array[Byte]])

  private[queries] val projRel = PgRel(3, "public", "events_t", 'd', Seq(
    PgCol("user_id", Int8, isKey = true), PgCol("event_type", Text, isKey = false),
    PgCol("value", Float8, isKey = false)))

  private val md5uuid =
    """concat(substring(h,1,8),'-',substring(h,9,4),'-',substring(h,13,4),
      |'-',substring(h,17,4),'-',substring(h,21,12))""".stripMargin.replace("\n", "")

  val queries: Seq[QueryDef] = Seq(

    QueryDef.sql("q41_codec_roundtrip",
      s"""WITH b AS (SELECT event_id, user_id, event_type, value,
         |    CAST(ts AS TIMESTAMP) AS ts, props,
         |    md5(CAST(event_id AS VARCHAR)) AS h FROM events)
         |SELECT event_id, user_id, event_type, value, ts, props,
         |  $md5uuid AS uid,
         |  (event_id % 2 = 0) AS flag,
         |  CAST(ts AS DATE) AS day,
         |  CAST(CAST(user_id * 0.015625 AS DECIMAL(18,6)) AS DOUBLE) AS amount,
         |  CAST(user_id % 100 AS INTEGER) AS small,
         |  CAST(event_id % 100000 AS INTEGER) AS mid,
         |  CAST(CAST(value AS FLOAT) AS DOUBLE) AS fval,
         |  epoch_us(ts) % 86400000000 AS time_us,
         |  event_type AS tag0, 2 AS n_tags,
         |  CAST(octet_length(encode(event_type)) AS INTEGER) AS payload_len
         |FROM b ORDER BY event_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val base = graft.Tables.wide(t(s, d, "events"))
        .withColumn("h", md5(col("event_id").cast("string").cast("binary")))
        .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("ts"), col("props"),
        expr(md5uuid).as("uid"),
        (col("event_id") % 2 === 0).as("flag"),
        col("ts").cast("date").as("day"),
        (col("user_id") * lit(0.015625)).cast("decimal(18,6)").as("amount"),
        (col("user_id") % 100).cast("smallint").as("small"),
        (col("event_id") % 100000).cast("int").as("mid"),
        col("value").cast("float").as("fval"),
        (unix_micros(col("ts")) % 86400000000L).as("time_us"),
        array(col("event_type"), col("user_id").cast("string")).as("tags"),
        col("event_type").cast("binary").as("payload"))
      roundTrip(base.as[RtRow]).toDF()
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          col("ts"), col("props"), col("uid"), col("flag"), col("day"),
          col("amount").cast("double").as("amount"),
          col("small").cast("int").as("small"), col("mid"),
          col("fval").cast("double").as("fval"), col("time_us"),
          element_at(col("tags"), 1).as("tag0"), size(col("tags")).as("n_tags"),
          octet_length(col("payload")).as("payload_len"))
        .orderBy(col("event_id"))
    },

    QueryDef.sql("q42_codec_txlog",
      """SELECT user_id, event_id + 1 AS applied_lsn, value AS current_value
        |FROM (SELECT user_id, event_id, value,
        |        CASE event_type WHEN 'signup' THEN 'INSERT'
        |                        WHEN 'error' THEN 'DELETE'
        |                        ELSE 'UPDATE' END AS op
        |      FROM events)
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |  AND op <> 'DELETE'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val changes = graft.Tables.wide(t(s, d, "events")).select(
        col("event_id"), col("user_id"),
        when(col("event_type") === "signup", "INSERT")
          .when(col("event_type") === "error", "DELETE")
          .otherwise("UPDATE").as("op"),
        col("value"))
      val decoded = txLog(changes.as[TxIn]).toDF()
      graft.cdc.CdcApply.latestSnapshot(decoded,
          keyCols = Seq("user_id"), orderCols = Seq("lsn"))
        .filter(col("op") =!= "DELETE")
        .select(col("user_id"), col("lsn").as("applied_lsn"),
          col("value").as("current_value"))
        .orderBy(col("user_id"))
    },

    // Typed projection of the generic envelope (A32): rows become
    // name→binary-datum maps (exactly the streaming source's `new`
    // image, with an every-3rd-row NULL for event_type), then
    // TypedProjection turns them back into typed columns via the
    // pg_decode expression — the oracle recomputes the same values
    // relationally, so the envelope → StructType path is hash-checked.
    QueryDef.sql("q49_typed_projection",
      """SELECT user_id,
        |  CASE WHEN event_id % 3 = 0 THEN NULL ELSE event_type END AS event_type,
        |  value, event_id AS lsn
        |FROM events ORDER BY lsn""".stripMargin) { (s, d) =>
      import s.implicits._
      val env = graft.Tables.wide(t(s, d, "events"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .as[(Long, Long, String, Double)]
        .map { case (eid, uid, et, v) =>
          EnvRow("INSERT", eid, 1, Map(
            "user_id" -> encode(Int8, uid),
            "event_type" -> (if (eid % 3 == 0) null else encode(Text, et)),
            "value" -> encode(Float8, v)), Map.empty)
        }.toDF()
      graft.cdc.TypedProjection.project(env, projRel, mapCol = "newFields")
        .select(col("user_id"), col("event_type"), col("value"),
          col("lsn"))
        .orderBy(col("lsn"))
    },

    // End-to-end batch backfill through the DSv2 source itself: a WAL
    // segment feed is generated DISTRIBUTED from the events table (one
    // tx per event at lsn = event_id, one segment per range partition,
    // real pgoutput wire bytes), then read back with
    // spark.read.format("pgcapture") — parallel decode, one partition
    // per segment — typed-projected and aggregated. The oracle
    // recomputes the aggregate straight from parquet, so the whole
    // write → frame → decode → project pipeline is hash-checked.
    QueryDef.sql("q52_wal_backfill",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(25,10))), 4) AS DOUBLE) AS sum_value,
        |  max(event_id) AS max_lsn
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val dir = ensureBackfillFeed(s, d)
      val env = s.read.format("pgcapture").option("path", dir).load()
      graft.cdc.TypedProjection.project(env, bfRel, mapCol = "new",
          keep = Seq("lsn"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(25,10)")), 4)
            .cast("double").as("sum_value"),
          max(col("lsn")).as("max_lsn"))
        .orderBy(col("event_type"))
    },

    // ---- TRUNCATE replay (r14 ask #1): the feed carries a real
    //      pgoutput 'T' frame mid-stream (its own tx at an odd lsn
    //      between the surrounding inserts' even lsns). The batch
    //      source decodes it into an op=TRUNCATE control row; the
    //      post-truncate snapshot is then RELATIONAL — survivors are
    //      inserts past the table's latest truncate lsn, a broadcast
    //      join against the (tiny) truncate set, distributed at any
    //      scale. The oracle recomputes the same snapshot straight
    //      from parquet with the same integer cutoff, so the encode →
    //      frame → decode → control-row → snapshot path is
    //      hash-checked end to end. ----
    QueryDef.sql("q337_truncate_replay",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(25,10))), 4) AS DOUBLE) AS sum_value,
        |  min(event_id) AS first_surviving
        |FROM events
        |WHERE event_id > (SELECT (max(event_id) * 3) // 5 FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val dir = ensureTruncateFeed(s, d)
      val env = s.read.format("pgcapture").option("path", dir).load()
      val tmax = env.filter(col("op") === "TRUNCATE")
        .groupBy(col("table")).agg(max(col("lsn")).as("trunc_lsn"))
      val live = env.filter(col("op") === "INSERT")
        .join(broadcast(tmax), Seq("table"), "left")
        .filter(col("trunc_lsn").isNull || col("lsn") > col("trunc_lsn"))
      graft.cdc.TypedProjection.project(live, bfRel, mapCol = "new",
          keep = Seq("lsn"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(25,10)")), 4)
            .cast("double").as("sum_value"),
          // insert lsn = 2 * event_id (the truncate tx took the odd
          // slot) — shift back to the id domain exactly
          shiftright(min(col("lsn")), 1).as("first_surviving"))
        .orderBy(col("event_type"))
    },

    // ---- Logical-decoding messages (r15, the 'M' twin of q337's
    //      'T'): pg_logical_emit_message payloads — audit markers,
    //      release gates, app watermarks — ride the WAL and surface
    //      as op=MESSAGE control rows with table = prefix. The feed
    //      carries a TRANSACTIONAL message inside every third event's
    //      tx (content = the event type) plus one NON-transactional
    //      'ctl'/'eof' message between transactions (stamped at the
    //      last tx's lsn — the dense-checkpoint contract). The query
    //      is one filter + one aggregate over the envelope; the
    //      oracle recomputes counts and max positions from parquet,
    //      so frame layout, tx-riding lsn stamping, and the
    //      out-of-tx stamp are all hash-checked. ----
    QueryDef.sql("q338_logical_messages",
      """SELECT 'audit' AS prefix, event_type AS content,
        |  CAST(count(*) AS BIGINT) AS n, max(event_id) AS max_lsn
        |FROM events WHERE event_id % 3 = 0 GROUP BY event_type
        |UNION ALL
        |SELECT 'ctl', 'eof', CAST(1 AS BIGINT),
        |  (SELECT max(event_id) FROM events)
        |ORDER BY prefix, content""".stripMargin) { (s, d) =>
      val dir = ensureMessageFeed(s, d)
      s.read.format("pgcapture").option("path", dir).load()
        .filter(col("op") === "MESSAGE")
        .select(col("table").as("prefix"),
          col("new")("content").cast("string").as("content"),
          col("lsn"))
        .groupBy(col("prefix"), col("content"))
        .agg(count(lit(1)).as("n"), max(col("lsn")).as("max_lsn"))
        .orderBy(col("prefix"), col("content"))
    },

    // ---- Incremental view maintenance from a CDC change stream: keep
    //      a per-bucket (count, sum) aggregate of a keyed table current
    //      WITHOUT rebuilding the table. Each change row becomes a
    //      delta against the key's previous state (lag over the key's
    //      lsn order — within a micro-batch; across batches the
    //      applier's keyed store supplies prev); deltas telescope, so
    //      summing them IS the aggregate of the final table state. The
    //      oracle rebuilds the final state from scratch (q42's
    //      latest-row QUALIFY) and aggregates it — hash equality proves
    //      delta maintenance ≡ recompute. Sums run in decimal so the
    //      proof is exact, not float-order luck. At 100 TB the view
    //      never scans the base table: per batch it shuffles only the
    //      changed keys, then merges |buckets| partials. ----
    QueryDef.sql("q74_incremental_agg",
      """WITH st AS (SELECT user_id, value,
        |    CASE event_type WHEN 'signup' THEN 'INSERT'
        |                    WHEN 'error' THEN 'DELETE'
        |                    ELSE 'UPDATE' END AS op
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1),
        |live AS (SELECT user_id, value FROM st WHERE op <> 'DELETE')
        |SELECT user_id % 10 AS bucket, CAST(count(*) AS BIGINT) AS n_live,
        |  CAST(round(sum(CAST(value AS DECIMAL(25,10))), 4) AS DOUBLE) AS total_value
        |FROM live GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val changes = t(s, d, "events").select(
        col("event_id"), col("user_id"),
        when(col("event_type") === "signup", "INSERT")
          .when(col("event_type") === "error", "DELETE")
          .otherwise("UPDATE").as("op"),
        col("value"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("event_id"))
      changes
        .withColumn("cur", when(col("op") === "DELETE", lit(null))
          .otherwise(col("value")).cast("decimal(25,10)"))
        .withColumn("prev", lag(col("cur"), 1).over(w))
        .select(col("user_id"),
          (coalesce(col("cur"), lit(0)) - coalesce(col("prev"), lit(0))).as("dv"),
          (when(col("cur").isNotNull, 1L).otherwise(0L)
            - when(col("prev").isNotNull, 1L).otherwise(0L)).as("dn"))
        .groupBy((col("user_id") % 10).as("bucket"))
        .agg(sum(col("dn")).as("n_live"),
          round(sum(col("dv")), 4).cast("double").as("total_value"))
        // a bucket whose keys are all deleted nets to zero; the
        // recompute oracle has no row for it — drop to align
        .filter(col("n_live") > 0)
        .orderBy(col("bucket"))
    })

  /** Relation of the generated backfill feed (q52). */
  private val bfRel = PgRel(7, "public", "events_cdc", 'd', Seq(
    PgCol("user_id", Int8, isKey = true),
    PgCol("event_type", Text, isKey = false),
    PgCol("value", Float8, isKey = false)))

  /** Write the q52 feed: executors each encode their range of events
    * into one segment (pgoutput frames, relation declared per segment),
    * named by its first lsn. Regenerated per run — it is a derived
    * fixture, not state; a real deployment's feed comes from the
    * capture agent. Local-FS write, which in local[n] lands in one dir
    * (on a cluster a backfill reads the agent's recorded feed from
    * shared storage instead of generating one). */
  // fixture dirs registered for deletion at JVM exit (once per dir)
  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def cleanupOnExit(dir: String): Unit =
    if (cleanupRegistered.add(dir))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        val f = new java.io.File(dir)
        Option(f.listFiles()).foreach(_.foreach(_.delete()))
        f.delete(); ()
      }))

  /** Shared feed writer for the wire-format fixture queries (q52,
    * q337, q338): executors each encode their range of events into one
    * segment — one tx per event at `lsnOf(event_id)`, relation
    * declared per segment, real pgoutput bytes — with `inTx` able to
    * append extra frames inside an event's transaction (q338's
    * transactional messages). Fixture name = readable path tail + md5
    * of the FULL path (so truncation can't collide two data dirs) +
    * this JVM's pid (two concurrent runs never share a feed); the dir
    * is removed on JVM exit. Write is skipped-overwrite-safe: task
    * retries re-write identical bytes. Regenerated per run — a derived
    * fixture, not state; a real deployment's feed comes from the
    * capture agent. Returns (dir, max event_id) — the max is a
    * single-row bounded collect the callers reuse for their
    * driver-written extra segment. */
  private def writeEventFeed(s: SparkSession, d: String, tag: String,
      lsnOf: Long => Long,
      inTx: (Long, String) => Seq[Array[Byte]] = (_, _) => Nil):
      (String, Long) = {
    val safe = d.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(60)
    val full = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val pid = ProcessHandle.current().pid()
    val dir = new java.io.File(
      s"/tmp/graft_${tag}_${safe}_${full}_$pid").getAbsolutePath
    CodecQueries.cleanupOnExit(dir)
    val f = new java.io.File(dir)
    if (f.isDirectory) f.listFiles().foreach(_.delete())
    import s.implicits._
    val rel = bfRel
    val events = Tables.load(s, d, "events")
    // bounded by construction: single-row max aggregate (null on an
    // empty table → 0)
    val maxRow = events.agg(max(col("event_id"))).collect()(0)
    val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, String, Double)]
      .repartitionByRange(16, col("event_id"))
      .sortWithinPartitions("event_id")
      .mapPartitions { it =>
        val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        var first = -1L
        it.foreach { case (eid, uid, et, v) =>
          val lsn = lsnOf(eid)
          if (first < 0) { first = lsn; frames += PgOutput.Encoder.relation(rel) }
          frames += PgOutput.Encoder.begin(lsn, lsn * 1000L, eid.toInt)
          frames += PgOutput.Encoder.insert(rel,
            Seq(encode(Int8, uid), encode(Text, et), encode(Float8, v)))
          frames ++= inTx(eid, et)
          frames += PgOutput.Encoder.commit(lsn, lsn, lsn * 1000L)
        }
        if (first >= 0) // overwrite: task retries re-write identical bytes
          graft.sources.WalFiles.writeSegment(dir, first, frames.toSeq,
            overwrite = true)
        Iterator.single(first)
      }.collect()
    (dir, maxId)
  }

  /** q337 feed: inserts at lsn = 2·event_id plus ONE driver-written
    * truncate transaction at the odd lsn 2·cutoff+1 (cutoff =
    * ⌊max(event_id)·3/5⌋, integer) — its own tiny segment, sorted
    * between the insert segments by the source's lsn ordering. */
  private def ensureTruncateFeed(s: SparkSession, d: String): String = {
    val (dir, maxId) = writeEventFeed(s, d, "waltr", _ * 2)
    val cutLsn = (maxId * 3 / 5) * 2 + 1
    graft.sources.WalFiles.writeSegment(dir, cutLsn, Seq(
      PgOutput.Encoder.relation(bfRel),
      PgOutput.Encoder.begin(cutLsn, cutLsn * 1000L, 0),
      PgOutput.Encoder.truncate(Seq(bfRel.relId)),
      PgOutput.Encoder.commit(cutLsn, cutLsn, cutLsn * 1000L)),
      overwrite = true)
    dir
  }

  /** q338 feed: inserts at lsn = event_id, a TRANSACTIONAL 'audit'
    * message inside every third event's tx, and one driver-written
    * NON-transactional 'ctl' message between transactions (its own
    * segment, sorted last — replay stamps it at the last tx's
    * (lsn, seq+1)). */
  private def ensureMessageFeed(s: SparkSession, d: String): String = {
    val (dir, maxId) = writeEventFeed(s, d, "walmsg", identity,
      inTx = (eid, et) =>
        if (eid % 3 == 0) // transactional: rides ITS tx, lsn = eid
          Seq(PgOutput.Encoder.message(transactional = true,
            eid, "audit", et.getBytes("UTF-8")))
        else Nil)
    graft.sources.WalFiles.writeSegment(dir, maxId + 1, Seq(
      PgOutput.Encoder.message(transactional = false, maxId + 1,
        "ctl", "eof".getBytes("UTF-8"))), overwrite = true)
    dir
  }

  /** q52 feed: plain inserts at lsn = event_id. */
  private def ensureBackfillFeed(s: SparkSession, d: String): String =
    writeEventFeed(s, d, "walbf", identity)._1
}
