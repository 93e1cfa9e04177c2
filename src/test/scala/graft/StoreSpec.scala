package graft

import org.apache.spark.sql.{AnalysisException, Row}
import graft.sources.ParquetStore
import graft.sources.SQLiteIO
import graft.sources.SQLiteIO.IfExists

/** S7 policy matrix ≈ Tests.swift:129-172; round-trip deep equality ≈
  * Tests.swift:175-198 (the reference's strongest oracle). */
class StoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): ParquetStore = {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    new ParquetStore(dir)
  }
  private def tasks() = Seq(
    ("write unit tests", false, "2022-01-01 10:00:00"),
    ("write docs", false, "2022-01-02 11:00:00"),
    ("ship", true, "2022-01-03 12:00:00")
  ).toDF("description", "done", "date")

  test("ifExists=Fail throws when table exists (≈ Tests.swift:131-139)") {
    val st = freshStore()
    st.write(tasks(), "tasks", IfExists.Fail)
    assertThrows[AnalysisException] {
      st.write(tasks(), "tasks", IfExists.Fail)
    }
  }

  test("ifExists=DoNothing leaves existing data (≈ Tests.swift:141-150)") {
    val st = freshStore()
    st.write(tasks(), "tasks", IfExists.Replace)
    st.write(tasks().limit(1), "tasks", IfExists.DoNothing)
    assert(st.read(spark, "tasks").count() == 3)
  }

  test("ifExists=Replace overwrites (≈ Tests.swift:152-161)") {
    val st = freshStore()
    st.write(tasks(), "tasks", IfExists.Replace)
    st.write(tasks().limit(1), "tasks", IfExists.Replace)
    assert(st.read(spark, "tasks").count() == 1)
  }

  test("ifExists=Append appends (≈ Tests.swift:163-172)") {
    val st = freshStore()
    st.write(tasks(), "tasks", IfExists.Append)
    st.write(tasks(), "tasks", IfExists.Append)
    assert(st.read(spark, "tasks").count() == 6)
  }

  test("round-trip deep equality (≈ Tests.swift:175-198)") {
    val st = freshStore()
    val d = tasks()
    st.write(d, "rt", IfExists.Replace)
    val d2 = st.read(spark, "rt")
    assert(d2.schema.map(f => (f.name, f.dataType)) ==
           d.schema.map(f => (f.name, f.dataType)))
    val a = d.orderBy("date").collect().toSeq
    val b = d2.orderBy("date").collect().toSeq
    assert(a == b)
  }

  test("exists probe (S8 ≈ SDF.swift:43-47)") {
    val st = freshStore()
    assert(!st.exists(spark, "nope"))
    st.write(tasks(), "yes", IfExists.Fail)
    assert(st.exists(spark, "yes"))
  }

  test("P2 lenient projection drops unknown names silently; strict throws (≈ Tests.swift:49-57)") {
    import graft.operators.Relational
    val df = Seq((1, "a")).toDF("id", "name")
    val kept = Relational.project(df, Seq("id", "bogus"), lenient = true)
    assert(kept.columns.toSeq == Seq("id"))
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Relational.project(df, Seq("id", "bogus")).collect()
    }
  }

  test("S4 appendByPosition matches by position, keeps existing names (≈ SDF readSQL)") {
    import graft.operators.Relational
    val a = Seq((1, "x")).toDF("id", "name")
    val b = Seq((2, "y")).toDF("other", "label") // different names, same shape
    val got = Relational.appendByPosition(a, b)
    assert(got.columns.toSeq == Seq("id", "name"))
    assert(got.count() == 2)
    assertThrows[IllegalArgumentException] {
      Relational.appendByPosition(a, Seq(1).toDF("only"))
    }
  }

  test("S1 scan SQL generation pushes projection by construction") {
    assert(SQLiteIO.tableScanSql("tasks") == "SELECT * FROM tasks")
    assert(SQLiteIO.tableScanSql("tasks", Seq("a", "b")) == "SELECT a, b FROM tasks")
  }

  test("dialect maps decltypes and write types per affinity") {
    import org.apache.spark.sql.types._
    val d = SQLiteIO.SQLiteDialect
    assert(d.canHandle("jdbc:sqlite:/tmp/x.db"))
    assert(d.getCatalystType(0, "VARCHAR(10)", 0, null).contains(StringType))
    assert(d.getCatalystType(0, "BIGINT", 0, null).contains(LongType))
    assert(d.getCatalystType(0, "DATETIME", 0, null).contains(TimestampType))
    assert(d.getJDBCType(StringType).map(_.databaseTypeDefinition).contains("TEXT"))
    assert(d.getJDBCType(ArrayType(FloatType)).isEmpty)
  }
}
