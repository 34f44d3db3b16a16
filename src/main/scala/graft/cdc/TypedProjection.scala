package graft.cdc

import scala.jdk.CollectionConverters._

import graft.codec.PgOutput
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed projection of the CDC envelope (A32, reference
  * pkg/pgcapture/reflect.go:35-56 + consumer.go:144-185): turn the
  * generic `new/old: map<string,binary>` columns into a proper
  * per-table StructType DataFrame using the table's OIDs, so Tungsten/
  * whole-stage codegen take over downstream (SURVEY §1.2).
  *
  * TOAST semantics survive: an unchanged-TOAST column is an ABSENT map
  * key → `element_at` yields null; [[projectFilled]] coalesces it from
  * the old image the way replica-identity-FULL backfill does (A5), and
  * [[toJson]] keeps absent columns out of the JSON the way the
  * reference's TOAST-aware marshaller does (A35,
  * pkg/pgcapture/json.go:22-111).
  */
object TypedProjection {

  private def ensureRegistered(df: DataFrame): Unit =
    graft.functions.GraftFunctions.register(df.sparkSession)

  // Columns are built with the DSL (call_function + lit), never by
  // interpolating wire-supplied column names into SQL text: a legal PG
  // name containing a quote must round-trip, not break the parser.
  private def decodeCol(mapCol: String, c: PgOutput.Column): Column =
    call_function("pg_decode",
      element_at(col(mapCol), lit(c.name)), lit(c.oid)).as(c.name)

  /** Envelope rows → typed columns from the `new` image. */
  def project(df: DataFrame, rel: PgOutput.Relation,
      mapCol: String = "new", keep: Seq[String] = Seq("op", "lsn", "seq")): DataFrame = {
    ensureRegistered(df)
    df.select(keep.map(col) ++ rel.columns.map(c => decodeCol(mapCol, c)): _*)
  }

  /** Like [[project]] but back-fills unchanged-TOAST columns (absent in
    * `new`) from the `old` image when present. */
  def projectFilled(df: DataFrame, rel: PgOutput.Relation): DataFrame = {
    ensureRegistered(df)
    df.select(Seq(col("op"), col("lsn"), col("seq")) ++ rel.columns.map { c =>
      call_function("pg_decode",
        coalesce(element_at(col("new"), lit(c.name)),
          element_at(col("old"), lit(c.name))), lit(c.oid)).as(c.name)
    }: _*)
  }

  /** TOAST-aware JSON of the raw envelope image (A35): map keys absent
    * (unchanged TOAST) are simply not in the JSON; NULL columns are
    * explicit nulls — the exact contract of the reference's custom
    * MarshalJSON. Values are decoded to strings for readability. */
  def toJson(df: DataFrame, rel: PgOutput.Relation,
      mapCol: String = "new"): DataFrame = {
    ensureRegistered(df)
    val entries = rel.columns.map { c =>
      when(map_contains_key(col(mapCol), c.name),
        struct(lit(c.name).as("key"),
          call_function("pg_decode",
            element_at(col(mapCol), lit(c.name)), lit(c.oid))
            .cast("string").as("value")))
    }
    // ignoreNullFields=false: explicit SQL NULL renders as "col":null;
    // only ABSENT (unchanged TOAST) keys disappear — the A35 contract
    df.withColumn("js",
      to_json(map_from_entries(filter(array(entries: _*), _.isNotNull)),
        Map("ignoreNullFields" -> "false").asJava))
  }
}
