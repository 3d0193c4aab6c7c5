package graft.warehouse

import java.sql.{Connection, DriverManager}
import org.apache.spark.sql.{DataFrame, Row}

/** JDBC upsert/insert-ignore writers (K5/K6; reference
  * `database/__init__.py:92-127`).
  *
  * Spark has no native JDBC upsert. Two writer shapes:
  *
  *  - [[write]] — per-row `INSERT … ON CONFLICT` batches (Postgres
  *    dialect, the reference's own statement shape): each executor
  *    partition opens one connection and flushes every `batchSize`
  *    rows — the distributed analogue of the reference's chunked
  *    `to_sql(method=upsert)`.
  *  - [[writeViaStage]] — per-partition stage table + one set-based
  *    ANSI `MERGE INTO`: the portable path (Derby/SQL Server/Oracle
  *    have no ON CONFLICT) and the shape that scales — the database
  *    applies one merge per partition instead of row-at-a-time
  *    conflict probes. (Against a lakehouse sink the same call site
  *    would be a Delta `MERGE INTO`.)
  *
  * Both roll back the partition's transaction on failure and rethrow,
  * so a task retry re-runs a clean partition (upsert/merge keeps the
  * retry idempotent as long as input keys are unique per partition —
  * MERGE semantics reject duplicate source keys by design).
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

  /** ANSI `MERGE INTO` from a staged batch: K5 with the update clause,
    * K6 (`insertOnly`) without it. */
  def mergeSql(
      table: String, stage: String, cols: Seq[String], pk: Seq[String],
      insertOnly: Boolean = false): String = {
    val on = pk.map(c => s"t.$c = s.$c").mkString(" AND ")
    val nonPk = cols.filterNot(pk.contains)
    val matched =
      if (insertOnly || nonPk.isEmpty) ""
      else s"WHEN MATCHED THEN UPDATE SET ${nonPk.map(c => s"$c = s.$c").mkString(", ")} "
    s"MERGE INTO $table t USING $stage s ON ($on) " + matched +
      s"WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(c => s"s.$c").mkString(", ")})"
  }

  private def connect(jdbcUrl: String, props: Map[String, String]): Connection = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    DriverManager.getConnection(jdbcUrl, p)
  }

  /** Run `body` in one transaction on a fresh connection; roll back
    * and rethrow on failure. */
  private def inTransaction(jdbcUrl: String, props: Map[String, String])(
      body: Connection => Unit): Unit = {
    val conn = connect(jdbcUrl, props)
    try {
      conn.setAutoCommit(false)
      try {
        body(conn)
        conn.commit()
      } catch {
        case e: Throwable =>
          try conn.rollback()
          catch { case re: Throwable => e.addSuppressed(re) }
          throw e
      }
    } finally conn.close()
  }

  private def batchInsert(
      conn: Connection, sql: String, cols: Seq[String],
      rows: Iterator[Row], batchSize: Int): Unit = {
    val st = conn.prepareStatement(sql)
    try {
      var n = 0
      rows.foreach { row =>
        cols.indices.foreach(i => st.setObject(i + 1, row.get(i)))
        st.addBatch()
        n += 1
        if (n % batchSize == 0) st.executeBatch()
      }
      st.executeBatch()
      ()
    } finally st.close()
  }

  /** Execute an upsert of `df` into `table` with per-row ON CONFLICT
    * statements (Postgres dialect). One connection + one transaction
    * per partition; `batchSize` mirrors the reference's chunksize=1024. */
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
      if (rows.nonEmpty) inTransaction(jdbcUrl, props) { conn =>
        batchInsert(conn, sql, cols, rows, batchSize)
      }
    }
  }

  /** Execute an upsert of `df` into `table` via a per-partition stage
    * table and one ANSI `MERGE INTO` (portable across engines without
    * ON CONFLICT; executed in tests against embedded Derby). The stage
    * is cloned from the target (`CREATE TABLE … AS SELECT … WITH NO
    * DATA`), batch-loaded, merged, dropped — all in the partition's
    * transaction. */
  def writeViaStage(
      df: DataFrame, jdbcUrl: String, table: String,
      pk: Seq[String], batchSize: Int = 1024,
      insertOnly: Boolean = false,
      props: Map[String, String] = Map.empty): Unit = {
    val cols = df.columns.toSeq
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // suffix keeps retried/concurrent attempts from colliding
        val stage = s"${table}_stg_${pid}_${java.util.UUID.randomUUID().toString.take(8)}"
        inTransaction(jdbcUrl, props) { conn =>
          val st = conn.createStatement()
          try {
            st.execute(s"CREATE TABLE $stage AS SELECT * FROM $table WITH NO DATA")
          } finally st.close()
          batchInsert(conn,
            s"INSERT INTO $stage (${cols.mkString(", ")}) " +
              s"VALUES (${cols.map(_ => "?").mkString(", ")})",
            cols, rows, batchSize)
          val st2 = conn.createStatement()
          try {
            st2.executeUpdate(mergeSql(table, stage, cols, pk, insertOnly))
            st2.execute(s"DROP TABLE $stage")
          } finally st2.close()
        }
      }
    }
  }
}
