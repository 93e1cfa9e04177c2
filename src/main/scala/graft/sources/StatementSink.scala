package graft.sources

import org.apache.spark.sql.DataFrame

/** S6: the reference's arbitrary-DML sink (`writeSQL(statement:)`,
  * SDF.swift:572-591): bind each frame row to the `?` parameters of any
  * INSERT/UPDATE/DELETE statement.
  *
  * Spark shape: `foreachPartition` + JDBC `PreparedStatement` batches in
  * a per-partition transaction — executors write in parallel, batched,
  * unlike the reference's single-threaded row-at-a-time autocommit loop
  * (a documented perf characteristic, SDF.swift:579-590).
  *
  * Needs a JDBC driver for the target URL on the executor classpath (no
  * sqlite-jdbc ships in this container — the partition-writer logic is
  * pure JDBC and unit-testable only against an in-memory JDBC source;
  * exercised end-to-end in environments that provide a driver).
  */
object StatementSink {

  /** Reference behavior: frame columns beyond the statement's parameter
    * count are silently dropped (SDF.swift:578). We default to strict
    * arity (silent truncation is a bug farm — SURVEY.md §7.4(5)); pass
    * `lenientArity = true` for bug-compatible truncation. */
  def writeStatement(
      df: DataFrame, url: String, dml: String,
      batchSize: Int = 1000, lenientArity: Boolean = false,
      props: java.util.Properties = new java.util.Properties): Unit = {
    val schema = df.schema
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        conn.setAutoCommit(false)
        val st = conn.prepareStatement(dml)
        val paramCount = st.getParameterMetaData.getParameterCount
        if (!lenientArity && paramCount != schema.length)
          throw new IllegalArgumentException(
            s"statement has $paramCount parameters but frame has ${schema.length} columns " +
            "(pass lenientArity=true for reference-compatible truncation)")
        val n = math.min(paramCount, schema.length)
        var inBatch = 0
        rows.foreach { row =>
          var i = 0
          while (i < n) {
            if (row.isNullAt(i)) st.setObject(i + 1, null)
            else st.setObject(i + 1, row.get(i))
            i += 1
          }
          st.addBatch()
          inBatch += 1
          if (inBatch >= batchSize) { st.executeBatch(); inBatch = 0 }
        }
        if (inBatch > 0) st.executeBatch()
        conn.commit()
        st.close()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally conn.close()
    }
  }
}
