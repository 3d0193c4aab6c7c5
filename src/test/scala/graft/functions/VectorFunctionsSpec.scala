package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class VectorFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("FloatVecDot is bit-identical to the higher-order-function fold") {
    GraftFunctions.register(spark)
    val vs = (0 until 50).map { i =>
      (Array.tabulate(64)(j => (math.sin(i + j) * 3).toFloat),
        Array.tabulate(64)(j => (math.cos(i * j + 1) * 2).toFloat))
    }
    val df = vs.toDF("a", "b")
    val rows = df.select(
      VectorFunctions.dotProduct($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("GraftExtensions registers all native functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // parity with GraftFunctions.register: all functions resolvable
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_vec_dot(array(cast(1.0 as float)), array(cast(2.0 as float)))")
      .collect()(0).getDouble(0) == 2.0)
    assert(spark.sql("SELECT graft_bottom_k(h, 2) FROM (SELECT explode(array(3L, 1L, 2L)) AS h)")
      .collect()(0).getSeq[Long](0) == Seq(1L, 2L))
    // all bits set in both elements -> majority everywhere -> 60 ones
    assert(spark.sql("SELECT graft_simhash60(array(-1L, -1L))")
      .collect()(0).getLong(0) == (1L << 60) - 1)
  }

  test("Simhash60 native kernel matches the composed-expression form") {
    import graft.operators.Dedup
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta",
      "one two three four five six seven eight nine ten",
      "x", "a a a a a b",
      (0 until 200).map(i => s"w$i").mkString(" "))
    val df = texts.toDF("text")
      .withColumn("hs",
        org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.array_distinct(
            org.apache.spark.sql.functions.split($"text", " ")),
          x => Dedup.hash60(x)))
    GraftFunctions.register(spark)
    val rows = df.select(
      Dedup.simhashOfHashes($"hs").as("native"),
      Dedup.simhashOfHashesComposed($"hs").as("composed")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("ByteVecDot matches the higher-order-function fold and interpreted eval") {
    GraftFunctions.register(spark)
    // Seq[Byte], not Array[Byte]: the latter encodes as BINARY, and
    // the quantized codes in Similarity are genuine array<tinyint>
    val vs = (0 until 50).map { i =>
      (Seq.tabulate(64)(j => ((i * 31 + j * 7) % 255 - 127).toByte),
        Seq.tabulate(64)(j => ((i * 13 + j * 11) % 255 - 127).toByte))
    }
    val df = vs.toDF("a", "b")
    val rows = df.select(
      call_function("graft_byte_dot", $"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("long") * y.cast("long")),
        lit(0L), (acc, x) => acc + x).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // interpreted eval
    val e = ByteVecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq[Byte](127, -127, 3)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq[Byte](127, 127, 2)))
    assert(e.eval(null) == 127L * 127 - 127L * 127 + 6L)
    // SQL-surface registration (extensions path)
    assert(spark.sql(
      "SELECT graft_byte_dot(array(cast(2 as tinyint)), array(cast(3 as tinyint)))")
      .collect()(0).getLong(0) == 6L)
  }

  test("FloatVecDot interpreted eval agrees with codegen path") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1.5f, 2.5f), Array(2.0f, -1.0f))).toDF("a", "b")
    val v = df.select(VectorFunctions.dotProduct($"a", $"b")).collect()(0).getDouble(0)
    assert(v == 1.5 * 2.0 + 2.5 * -1.0)
    // direct expression eval (interpreted)
    val e = FloatVecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.5f, 2.5f)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(2.0f, -1.0f)))
    assert(e.eval(null) == 0.5)
  }
}
