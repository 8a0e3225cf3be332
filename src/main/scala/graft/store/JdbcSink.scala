package graft.store

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S11 — idempotent JDBC migration sink
  * (`services/rugs-feed/scripts/migrate_existing_data.py:40-80,130-160`):
  * the reference migrates derived game rows into a relational database with
  * `INSERT OR IGNORE` on the `game_id` primary key, so re-running a
  * migration never duplicates rows.
  *
  * Spark's `df.write.jdbc` has no upsert, so idempotency is composed
  * Spark-first: dedup the incoming batch on the key (keep-first, A7), then
  * anti-join (U2) against the keys already in the table, then append. Only
  * the KEY COLUMN of the existing table is read back (a pushed-down
  * one-column query, not the whole table), and at 100 TB both sides shuffle
  * only keys. A primary-key constraint on the table backstops the window
  * between read and write — racing writers degrade to a constraint error,
  * not silent duplication (the same guarantee the reference's PK gives its
  * INSERT OR IGNORE).
  */
object JdbcSink {

  /** Ensure `table` exists with a PRIMARY KEY on `key`, creating it from
    * the DataFrame's schema when absent (the reference's CREATE TABLE IF
    * NOT EXISTS + PK; Derby has no IF NOT EXISTS, so existence is probed
    * via the JDBC catalog).
    */
  def ensureTable(url: String, table: String, df: DataFrame, key: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      if (!tableExists(conn, table)) {
        val cols = df.schema.fields.map { f =>
          // a string PRIMARY KEY must be a comparable bounded type — the
          // dialect default for StringType is CLOB/TEXT, which most
          // databases (Derby included) refuse to index
          val typeDef =
            if (f.name == key && f.dataType == org.apache.spark.sql.types.StringType)
              "VARCHAR(255)"
            else org.apache.spark.sql.jdbc.JdbcDialects.get(url)
              .getJDBCType(f.dataType)
              .getOrElse(org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
                .getCommonJDBCType(f.dataType)
                .getOrElse(throw new IllegalArgumentException(
                  s"no JDBC type for ${f.name}: ${f.dataType}")))
              .databaseTypeDefinition
          val nullable = if (f.name == key) " NOT NULL" else ""
          s"${f.name} $typeDef$nullable"
        }
        val ddl = cols.mkString(s"CREATE TABLE $table (", ", ",
          s", PRIMARY KEY ($key))")
        conn.createStatement().executeUpdate(ddl)
      }
    } finally conn.close()
  }

  private def tableExists(conn: Connection, table: String): Boolean = {
    // getTables treats its name argument as a PATTERN ('_' matches any
    // char — "game_history" would match a stray GAME1HISTORY), so escape
    // wildcards with the driver's escape string; identifier case folding
    // is database-specific (Derby/H2 upper, PostgreSQL lower) — probe all
    // three spellings
    val esc = conn.getMetaData.getSearchStringEscape
    def escaped(n: String): String =
      n.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
    Seq(table, table.toUpperCase, table.toLowerCase).distinct.exists { n =>
      val rs = conn.getMetaData.getTables(null, null, escaped(n), null)
      try rs.next() finally rs.close()
    }
  }

  /** Append `df` to `table`, skipping rows whose `key` already exists.
    * Within the batch, duplicates of a key collapse to ONE row: when
    * `keepMinOf` names columns, the kept row is the one minimizing those
    * columns in order (deterministic regardless of partitioning — pass the
    * batch's sequence/timestamp column to reproduce the reference's
    * keep-first INSERT OR IGNORE); when empty, an arbitrary row of the key
    * wins (Spark's dropDuplicates). Returns the number of rows written.
    */
  def appendIdempotent(df: DataFrame, url: String, table: String,
      key: String, props: Properties = new Properties,
      keepMinOf: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    ensureTable(url, table, df, key)
    val deduped =
      if (keepMinOf.isEmpty) df.dropDuplicates(key)
      else {
        // the remaining columns break keepMinOf ties, so the window is a
        // TOTAL order on row content — without it, rows equal on keepMinOf
        // would win by shuffle arrival order, the nondeterminism this
        // parameter exists to eliminate (fully identical rows remain
        // interchangeable, which is harmless)
        val tiebreak = df.columns.toSeq.filterNot((keepMinOf :+ key).contains)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(key).orderBy((keepMinOf ++ tiebreak).map(col): _*)
        df.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    // only the key column crosses from the database — a pushed-down
    // single-column scan the JDBC source turns into SELECT key FROM table
    val existing = spark.read.jdbc(url, table, props).select(key)
    val fresh = deduped
      .join(existing, Seq(key), "left_anti")
      .persist() // one computation serves both the count and the write
    try {
      val n = fresh.count()
      if (n > 0) fresh.write.mode("append").jdbc(url, table, props)
      n
    } finally fresh.unpersist()
  }
}
