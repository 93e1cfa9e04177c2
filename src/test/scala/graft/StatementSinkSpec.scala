package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger
import graft.sources.StatementSink

/** S6 (`writeSQL(statement:)`, SDF.swift:572-591) exercised for real: no
  * JDBC driver ships in this container, but the partition-writer is pure
  * JDBC, so a reflective fake driver (java.sql interfaces proxied, binds
  * and lifecycle recorded) drives the full foreachPartition → prepare →
  * bind → addBatch → executeBatch → commit path, including NULL binds,
  * strict-arity failure and reference-compatible lenient truncation. */
object FakeJdbc {
  val url = "jdbc:graftfake:mem"
  val rows = new ConcurrentLinkedQueue[Seq[Any]]()
  val commits = new AtomicInteger
  val executeBatches = new AtomicInteger
  @volatile var paramCount = 2

  def reset(n: Int): Unit = {
    rows.clear(); commits.set(0); executeBatches.set(0); paramCount = n
  }

  private def proxy(iface: Class[_])(
      f: PartialFunction[(String, Seq[AnyRef]), AnyRef]): AnyRef =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = {
          val a: Seq[AnyRef] = if (args == null) Nil else args.toSeq
          if (f.isDefinedAt((m.getName, a))) f((m.getName, a))
          else m.getReturnType match {
            case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
            case java.lang.Integer.TYPE => Integer.valueOf(0)
            case _                      => null
          }
        }
      })

  private def mkStatement(): AnyRef = {
    // single-threaded per partition by construction
    val current = scala.collection.mutable.HashMap[Int, Any]()
    proxy(classOf[java.sql.PreparedStatement]) {
      case ("getParameterMetaData", _) =>
        proxy(classOf[java.sql.ParameterMetaData]) {
          case ("getParameterCount", _) => Integer.valueOf(paramCount)
        }
      case ("setObject", Seq(i, v)) =>
        current(i.asInstanceOf[Integer].intValue) = v; null
      case ("addBatch", _) =>
        rows.add(current.keys.toSeq.sorted.map(current(_))); null
      case ("executeBatch", _) =>
        executeBatches.incrementAndGet(); Array.empty[Int]
    }
  }

  private def mkConnection(): java.sql.Connection =
    proxy(classOf[java.sql.Connection]) {
      case ("prepareStatement", Seq(_)) => mkStatement()
      case ("commit", _)                => commits.incrementAndGet(); null
    }.asInstanceOf[java.sql.Connection]

  class FakeDriver extends java.sql.Driver {
    def connect(u: String, p: java.util.Properties): java.sql.Connection =
      if (acceptsURL(u)) mkConnection() else null
    def acceptsURL(u: String): Boolean = u != null && u.startsWith("jdbc:graftfake:")
    def getPropertyInfo(u: String, p: java.util.Properties) = Array.empty
    def getMajorVersion = 1
    def getMinorVersion = 0
    def jdbcCompliant() = false
    def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException
  }
  java.sql.DriverManager.registerDriver(new FakeDriver)
}

class StatementSinkSpec extends SparkSpec {
  import spark.implicits._

  test("S6: binds every row (incl. NULL cells) in batches and commits per partition") {
    FakeJdbc.reset(n = 2)
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "c"), (4L, "d"))
      .toDF("id", "v").repartition(2)
    StatementSink.writeStatement(df, FakeJdbc.url,
      "INSERT INTO t VALUES (?, ?)", batchSize = 2)
    val got = FakeJdbc.rows.toArray.map(_.asInstanceOf[Seq[Any]]).toSet
    assert(got == Set(Seq(1L, "a"), Seq(2L, null), Seq(3L, "c"), Seq(4L, "d")))
    assert(FakeJdbc.commits.get() == df.rdd.getNumPartitions)
    assert(FakeJdbc.executeBatches.get() >= 2, "batchSize=2 over 4 rows needs >=2 flushes")
  }

  test("S6: strict arity rejects a parameter-count mismatch; lenient truncates (SDF.swift:578)") {
    FakeJdbc.reset(n = 2)
    val wide = Seq((1L, "a", 9.9)).toDF("id", "v", "extra").coalesce(1)
    val e = intercept[Exception] {
      StatementSink.writeStatement(wide, FakeJdbc.url, "INSERT INTO t VALUES (?, ?)")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null)
      && causes(e).exists(c => c.getMessage != null && c.getMessage.contains("2 parameters")))
    FakeJdbc.reset(n = 2)
    StatementSink.writeStatement(wide, FakeJdbc.url,
      "INSERT INTO t VALUES (?, ?)", lenientArity = true)
    assert(FakeJdbc.rows.toArray.map(_.asInstanceOf[Seq[Any]]).toSet == Set(Seq(1L, "a")))
  }
}
