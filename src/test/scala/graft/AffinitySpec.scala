package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.types.SQLiteType._

/** Affinity rules ≈ SDF.swift:161-194 + README.md:62-74.
  * (Property tests sample ScalaCheck Gens directly: the scalatest+
  * scalacheck bridge artifact is not in the offline cache.) */
class AffinitySpec extends AnyFunSuite {
  private def samples[T](g: Gen[T], n: Int = 300): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  test("README examples map per the modified affinity table") {
    assert(fromDeclared("INT") == Int)
    assert(fromDeclared("INTEGER") == Int)
    assert(fromDeclared("TINYINT") == Int)
    assert(fromDeclared("BIGINT") == Int)
    assert(fromDeclared("CHARACTER(20)") == Text)
    assert(fromDeclared("VARCHAR(255)") == Text)
    assert(fromDeclared("NVARCHAR(100)") == Text)
    assert(fromDeclared("TEXT") == Text)
    assert(fromDeclared("CLOB") == Text)
    assert(fromDeclared("BLOB") == Blob)
    assert(fromDeclared("REAL") == Float)
    assert(fromDeclared("DOUBLE") == Float)
    assert(fromDeclared("DOUBLE PRECISION") == Float)
    assert(fromDeclared("FLOAT") == Float)
    assert(fromDeclared("BOOLEAN") == Bool)
    assert(fromDeclared("DATE") == Date)
    assert(fromDeclared("DATETIME") == Date)
    assert(fromDeclared("NUMERIC") == Any)
    assert(fromDeclared("DECIMAL(10,5)") == Any)
  }

  test("rule order: INT wins before REAL/CHAR families (POINT→Int like SQLite)") {
    assert(fromDeclared("POINT") == Int)       // contains INT
    assert(fromDeclared("FLOATING POINT") == Int) // INT rule fires first
  }

  test("case-insensitive substring semantics") {
    assert(fromDeclared("int") == Int)
    assert(fromDeclared("MyCustomInteger") == Int)
    assert(fromDeclared("charlie") == Text)
  }

  test("precedence: override > decltype > any (SDF.swift:364-374)") {
    assert(resolve("c", Some("INT"), Map("c" -> Text)) == Text)
    assert(resolve("c", Some("INT"), Map.empty) == Int)
    assert(resolve("c", None, Map.empty) == Any)
  }

  test("inference is total and never throws") {
    samples(Gen.asciiPrintableStr).foreach(s => fromDeclared(s))
  }

  test("inference is invariant under case changes") {
    samples(Gen.alphaNumStr).foreach { s =>
      assert(fromDeclared(s) == fromDeclared(s.toLowerCase))
    }
  }

  test("write mapping covers the reference table (SDF.swift:741-771)") {
    assert(declFor(StringType).contains("TEXT"))
    assert(declFor(BooleanType).contains("BOOLEAN"))
    assert(declFor(LongType).contains("INT"))
    assert(declFor(IntegerType).contains("INT"))
    assert(declFor(FloatType).contains("FLOAT"))
    assert(declFor(DoubleType).contains("DOUBLE"))
    assert(declFor(TimestampType).contains("DATE"))
    assert(declFor(BinaryType).contains("BLOB"))
    assert(declFor(ArrayType(FloatType)).isEmpty) // unknown → bare column
  }

  test("read/write mapping round-trips for the primitive types") {
    // decl produced on write must infer back to a type whose sparkType
    // can hold the original (Int widths widen to Long by design)
    for (dt <- Seq(StringType, BooleanType, LongType, DoubleType, BinaryType)) {
      val decl = declFor(dt).get
      val back = fromDeclared(decl).sparkType
      assert(back == dt || (dt == LongType && back == LongType))
    }
  }
}
