package graft.server

import graft.exec.QueryEngine
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Read-only pg_catalog introspection slice over the engine catalog —
  * enough for `psql \dt`/`\dv` and driver metadata probes to answer.
  *
  * Neither the reference server nor any earlier round served
  * pg_catalog (psql `\d` failed on BOTH engines), but it is the first
  * thing a real user types, so graft provides a superset: the wire
  * server routes any statement referencing pg_catalog names to this
  * layer, which (1) snapshots `pg_class` / `pg_namespace` /
  * `pg_attribute` / `pg_tables` / `pg_views` temp views from the
  * engine catalog (driver-side rows — the catalog is already
  * in-memory metadata, so this is O(tables + columns) with zero Spark
  * jobs), (2) registers the pg_* helper functions those queries call
  * (`pg_get_userbyid`, `pg_table_is_visible`, `format_type`, …), and
  * (3) rewrites the PostgreSQL-only syntax psql emits into Spark SQL
  * (`"ident"` → backticks, `~`/`!~` → [NOT] RLIKE,
  * `OPERATOR(pg_catalog.~)` → `~`, `::type` casts and
  * `COLLATE` clauses stripped, `pg_catalog.` prefix dropped). All
  * rewrites apply OUTSIDE single-quoted string literals only.
  *
  * Scope, stated honestly: `\dt`/`\dv`-class queries (pg_class ⋈
  * pg_namespace with regex filters) and direct pg_attribute shape
  * queries answer exactly; the deep `\d <table>` detail chain (pg_am,
  * reloptions array concatenation, regtype casts) is out of scope and
  * fails cleanly as an error response, never a hang. The pg_* names
  * are effectively reserved at the wire: an engine table named
  * `pg_class` would be shadowed for introspection queries only.
  */
object PgCatalog {

  private val CatalogTables = Seq("pg_class", "pg_namespace",
    "pg_attribute", "pg_tables", "pg_views", "pg_am")

  /** Does the statement reference the pg_catalog surface? Matched on
    * masked code (names inside string literals don't trigger), word
    * bounded (a user table `pg_class_audit` doesn't). */
  def isCatalogQuery(sql: String): Boolean = {
    val m = graft.sql.SqlText.maskNonCode(sql).toLowerCase
    m.contains("pg_catalog.") || CatalogTables.exists(n =>
      ("""(?<![\w.])""" + n + """(?![\w])""").r.findFirstIn(m).isDefined)
  }

  /** Answer one introspection statement: snapshot views, register
    * functions, rewrite, run through plain spark.sql (the engine's
    * temporal/DML machinery has no business here — these are
    * metadata-only reads). */
  def run(engine: QueryEngine, sql: String): DataFrame = {
    registerSnapshots(engine)
    registerFunctions(engine)
    engine.spark.sql(rewrite(sql))
  }

  /** (type oid, typlen, pg type name) for an engine column type —
    * the same oids the wire's RowDescription uses. */
  private def typeInfo(dt: DataType): (Long, Int, String) = dt match {
    case LongType => (20L, 8, "bigint")
    case IntegerType => (23L, 4, "integer")
    case ShortType => (21L, 2, "smallint")
    case DoubleType => (701L, 8, "double precision")
    case FloatType => (700L, 4, "real")
    case BooleanType => (16L, 1, "boolean")
    case DateType => (1082L, 4, "date")
    case _: TimestampType | _: TimestampNTZType =>
      (1114L, 8, "timestamp without time zone")
    case _: DecimalType => (1700L, -1, "numeric")
    case BinaryType => (17L, -1, "bytea")
    case _ => (25L, -1, "text")
  }

  private val typeNameByOid: Map[Long, String] = Seq(
    LongType, IntegerType, ShortType, DoubleType, FloatType, BooleanType,
    DateType, TimestampType, DecimalType.SYSTEM_DEFAULT, BinaryType,
    StringType).map(typeInfo).map(t => t._1 -> t._3).toMap

  /** Stable-for-the-snapshot relation oids: 16384 (the PG user-object
    * floor) + alphabetical index. Re-derived per query — introspection
    * compares oids WITHIN one query's joins, never across statements. */
  private def registerSnapshots(engine: QueryEngine): Unit = {
    import scala.jdk.CollectionConverters._
    val spark = engine.spark
    val tables = engine.catalog.tableNames.sorted
    val views = engine.catalog.viewNames.distinct.sorted
      .filterNot(tables.contains)
    val oidOf = (tables ++ views).zipWithIndex
      .map { case (n, i) => n -> (16384L + i) }.toMap
    def mk(rows: Seq[Row], fields: (String, DataType)*): DataFrame =
      spark.createDataFrame(rows.asJava, StructType(
        fields.map { case (n, t) => StructField(n, t) }))
    mk(Seq(Row(11L, "pg_catalog"), Row(2200L, "public"),
        Row(13000L, "information_schema")),
      "oid" -> LongType, "nspname" -> StringType)
      .createOrReplaceTempView("pg_namespace")
    val classRows =
      tables.map(t => Row(oidOf(t), t, 2200L, "r", 10L, 0L, false, 2L)) ++
        views.map { v =>
          val kind = if (engine.catalog.isMaterialized(v)) "m" else "v"
          Row(oidOf(v), v, 2200L, kind, 10L, 0L, false, 0L)
        }
    mk(classRows, "oid" -> LongType, "relname" -> StringType,
      "relnamespace" -> LongType, "relkind" -> StringType,
      "relowner" -> LongType, "reltuples" -> LongType,
      "relhasindex" -> BooleanType, "relam" -> LongType)
      .createOrReplaceTempView("pg_class")
    // \dt LEFT JOINs the access-method catalog for its footer; one
    // row ("heap") matches every table's relam, views carry 0 → null
    mk(Seq(Row(2L, "heap")), "oid" -> LongType, "amname" -> StringType)
      .createOrReplaceTempView("pg_am")
    val attRows = tables.flatMap { t =>
      engine.catalog.get(t).toSeq.flatMap { td =>
        td.columns.zipWithIndex.map { case (c, i) =>
          val (oid, len, _) = typeInfo(c.dataType)
          Row(oidOf(t), c.logical, oid, i + 1, c.logical == td.pk,
            false, -1, len)
        }
      }
    }
    mk(attRows, "attrelid" -> LongType, "attname" -> StringType,
      "atttypid" -> LongType, "attnum" -> IntegerType,
      "attnotnull" -> BooleanType, "attisdropped" -> BooleanType,
      "atttypmod" -> IntegerType, "attlen" -> IntegerType)
      .createOrReplaceTempView("pg_attribute")
    mk(tables.map(t => Row("public", t, "graft")),
      "schemaname" -> StringType, "tablename" -> StringType,
      "tableowner" -> StringType)
      .createOrReplaceTempView("pg_tables")
    mk(views.map(v => Row("public", v, "graft")),
      "schemaname" -> StringType, "viewname" -> StringType,
      "viewowner" -> StringType)
      .createOrReplaceTempView("pg_views")
  }

  /** The pg_* scalar functions introspection queries call. Registered
    * per call — registration is an in-memory map put, and re-binding
    * keeps the functions pointed at the live session. */
  private def registerFunctions(engine: QueryEngine): Unit = {
    val udf = engine.spark.udf
    udf.register("pg_get_userbyid", (_: Long) => "graft")
    udf.register("pg_table_is_visible", (_: Long) => true)
    udf.register("format_type",
      (oid: Long, _: java.lang.Integer) =>
        typeNameByOid.getOrElse(oid, "text"))
    udf.register("pg_get_expr",
      (_: String, _: Long) => null.asInstanceOf[String])
    udf.register("obj_description",
      (_: Long, _: String) => null.asInstanceOf[String])
    udf.register("col_description",
      (_: Long, _: java.lang.Integer) => null.asInstanceOf[String])
    udf.register("pg_encoding_to_char", (_: Long) => "UTF8")
  }

  /** Apply `f` to the code regions of `sql`, leaving single-quoted
    * string literals (with '' escapes) byte-identical. */
  private def mapCode(sql: String)(f: String => String): String = {
    val out = new StringBuilder
    val code = new StringBuilder
    var i = 0
    var inStr = false
    def flush(): Unit = { out.append(f(code.toString)); code.clear() }
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inStr && c == '\'') { flush(); inStr = true; out += c }
      else if (inStr) {
        out += c
        if (c == '\'') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
            out += '\''; i += 1
          } else inStr = false
        }
      } else code += c
      i += 1
    }
    flush()
    out.toString
  }

  /** PostgreSQL-isms → Spark SQL, code regions only. Order matters:
    * OPERATOR() unwraps before the bare-operator pass, `!~*`/`!~`
    * before `~*`/`~` (longest first), the cast/COLLATE strips before
    * the pg_catalog prefix drop (they may carry the prefix). The `*`
    * regex variants map to plain RLIKE — a case-sensitivity
    * divergence psql's own catalog patterns never exercise (they
    * anchor on lowercase relnames). */
  private[server] def rewrite(sql: String): String = mapCode(sql) { s0 =>
    var s = s0.replace('"', '`')
    s = s.replaceAll("""(?i)OPERATOR\s*\(\s*(?:pg_catalog\.)?(!?~\*?|=|<>)\s*\)""", " $1 ")
    s = s.replace("!~*", " NOT RLIKE ").replace("!~", " NOT RLIKE ")
    s = s.replaceAll("""(?<![\w!~])~\*(?!~)""", " RLIKE ")
    s = s.replaceAll("""(?<![\w!~])~(?![\w~*])""", " RLIKE ")
    s = s.replaceAll("""::(?:pg_catalog\.)?`?\w+`?(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?(?:\[\])?""", "")
    s = s.replaceAll("""(?i)\bCOLLATE\s+(?:pg_catalog\.)?[`\w]+""", " ")
    s = s.replaceAll("""(?i)pg_catalog\.""", "")
    s
  }
}
