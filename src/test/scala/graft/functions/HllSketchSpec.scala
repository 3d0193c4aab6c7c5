package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.Dedup

class HllSketchSpec extends SparkSuite {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, p: Int = 8) = {
    GraftFunctions.register(spark)
    df.groupBy($"g").agg(call_function("graft_hll", $"h", lit(p)).as("regs"))
  }

  test("registers are partitioning-invariant (1 vs 13 partitions, shuffled input)") {
    val rows = (1 to 3000).map(i => (i % 3, s"v$i"))
    def hashed(s: Seq[(Int, String)], n: Int) =
      s.toDF("g", "s").repartition(n).select($"g", Dedup.hash60($"s").as("h"))
    val a = sketch(hashed(rows, 1))
    val b = sketch(hashed(scala.util.Random.shuffle(rows), 13))
    assert(rowsOf(a) == rowsOf(b))
  }

  test("merge is union: sketch(A ∪ B) == zip_with(sketch(A), sketch(B), greatest)") {
    GraftFunctions.register(spark)
    val va = (1 to 1000).map(i => s"a$i")
    val vb = (500 to 1500).map(i => s"b$i") ++ (1 to 300).map(i => s"a$i")
    def sk(vs: Seq[String]) = vs.toDF("s")
      .select(lit(1).as("g"), Dedup.hash60($"s").as("h"))
    val union = sketch(sk(va) unionAll sk(vb)).select($"regs").collect()(0).getSeq[Int](0)
    val merged = sketch(sk(va)).select($"regs".as("ra"))
      .crossJoin(sketch(sk(vb)).select($"regs".as("rb")))
      .select(zip_with($"ra", $"rb", (a, b) => greatest(a, b)).as("r"))
      .collect()(0).getSeq[Int](0)
    assert(union == merged)
  }

  test("raw estimator lands within the m=256 error regime") {
    GraftFunctions.register(spark)
    val n = 20000
    val est = sketch(
      (1 to n).map(i => (1, s"item_$i")).toDF("g", "s")
        .select($"g", Dedup.hash60($"s").as("h")))
      .select(expr("aggregate(regs, CAST(0 AS BIGINT), " +
        "(acc, r) -> acc + shiftright(CAST(9007199254740992 AS BIGINT), r))").as("s_scaled"))
      .select((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0) *
        lit(9007199254740992.0) / $"s_scaled".cast("double")).as("est"))
      .collect()(0).getDouble(0)
    // 1.04/sqrt(256) ≈ 6.5% standard error; allow 3 sigma
    assert(math.abs(est - n) / n < 0.2, s"estimate $est vs $n")
  }

  test("nulls are ignored and empty input yields all-zero registers") {
    GraftFunctions.register(spark)
    val df = Seq((1, Some(42L)), (1, None), (1, Some(42L)))
      .toDF("g", "h")
    val regs = sketch(df.filter($"h".isNotNull || $"h".isNull))
      .select($"regs").collect()(0).getSeq[Int](0)
    assert(regs.size == 256 && regs.count(_ > 0) == 1)
    val empty = sketch(Seq.empty[(Int, Long)].toDF("g", "h"))
    assert(empty.count() == 0)
  }
}
