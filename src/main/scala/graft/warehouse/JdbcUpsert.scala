package graft.warehouse

import java.sql.{Connection, DriverManager}
import org.apache.spark.sql.{DataFrame, Row}

/** JDBC upsert/insert-ignore writers (K5/K6; reference
  * `database/__init__.py:92-127`).
  *
  * Spark has no native JDBC upsert: rows go out per partition over a
  * PreparedStatement batch running `INSERT … ON CONFLICT`. Each
  * executor partition opens one connection and flushes every
  * `batchSize` rows — the distributed analogue of the reference's
  * chunked `to_sql(method=upsert)`. (Against a lakehouse sink the same
  * call site would be a Delta `MERGE INTO`.)
  */
object JdbcUpsert {

  /** K5 — `INSERT … ON CONFLICT (pk…) DO UPDATE SET non-pk = EXCLUDED`. */
  def upsertSql(table: String, cols: Seq[String], pk: Seq[String]): String = {
    val nonPk = cols.filterNot(pk.contains)
    val updates = nonPk.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${pk.mkString(", ")}) DO UPDATE SET $updates"
  }

  /** K6 — `INSERT … ON CONFLICT (key) DO NOTHING` (dim-table dedup
    * across loads). */
  def insertIgnoreSql(table: String, cols: Seq[String], conflictKey: Seq[String]): String =
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${conflictKey.mkString(", ")}) DO NOTHING"

  /** Execute an upsert of `df` into `table`. One connection per
    * partition; `batchSize` mirrors the reference's chunksize=1024. */
  def write(
      df: DataFrame, jdbcUrl: String, table: String,
      pk: Seq[String], batchSize: Int = 1024,
      ignoreConflicts: Boolean = false,
      props: Map[String, String] = Map.empty): Unit = {
    val cols = df.columns.toSeq
    val sql =
      if (ignoreConflicts) insertIgnoreSql(table, cols, pk)
      else upsertSql(table, cols, pk)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn: Connection = {
          val p = new java.util.Properties()
          props.foreach { case (k, v) => p.setProperty(k, v) }
          DriverManager.getConnection(jdbcUrl, p)
        }
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { row =>
            cols.indices.foreach(i => st.setObject(i + 1, row.get(i)))
            st.addBatch()
            n += 1
            if (n % batchSize == 0) st.executeBatch()
          }
          st.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }
}
