package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed views over the corpus — the Spark analogue of the reference's
  * codec-backed typed access (`Dataset[T]` with case-class Encoders gives
  * compile-time field checking; `SQLiteCodec` handles cell-level coercion
  * at the I/O boundary, SURVEY.md §2.9).
  *
  * Timestamps surface as java.sql.Timestamp via the session's UTC zone.
  */
object Typed {
  case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: java.time.LocalDateTime)
  case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.time.LocalDateTime,
      o_orderpriority: String)
  case class Customer(
      c_custkey: Long, c_name: String, c_nationkey: Int, c_acctbal: Double,
      c_mktsegment: String)
  case class Document(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)

  def lineitems(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem").as[Lineitem]
  }
  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.load(spark, dir, "orders").as[Order]
  }
  def customers(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables.load(spark, dir, "customer").as[Customer]
  }
  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").as[Document]
  }
  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.load(spark, dir, "embeddings").as[Embedding]
  }
}
