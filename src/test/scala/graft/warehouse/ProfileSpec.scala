package graft.warehouse

import java.sql.Timestamp
import graft.SparkSuite

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("profile: typed min/max, null and exact distinct counts") {
    val df = Seq(
      (1L, Some(2.5), Some("b"), Some(new Timestamp(1000000L))),
      (2L, None, Some("a"), Some(new Timestamp(2000000L))),
      (3L, Some(2.5), None, None),
      (3L, Some(7.0), Some("a"), Some(new Timestamp(1000000L)))
    ).toDF("k", "v", "s", "t")
    val got = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("k", "v", "s", "t"))
    val k = got("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 0 && k.getLong(3) == 3)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 3.0)
    assert(k.isNullAt(6) && k.isNullAt(7))
    val v = got("v")
    assert(v.getLong(2) == 1 && v.getLong(3) == 2) // distinct excludes null
    assert(v.getDouble(4) == 2.5 && v.getDouble(5) == 7.0)
    val s = got("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "a" && s.getString(7) == "b")
    val t = got("t")
    // timestamps profile as epoch microseconds
    assert(t.getDouble(4) == 1000000000.0 && t.getDouble(5) == 2000000000.0)
    assert(t.getLong(2) == 1 && t.getLong(3) == 2)
  }

  test("fkDiscovery: containment fractions; nulls reference nothing") {
    val child = Seq(Some(1L), Some(2L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Profile.fkDiscovery(Seq(
        ("c->p", child, "fk", parent, "pk"),
        ("p->c", parent, "pk", child, "fk")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // child distinct non-null = {1,2,9}; parent contains {1,2} → 2/3
    assert(got("c->p") == ((3L, 2L, 2.0 / 3.0)))
    // parent {1,2,3} vs child values {1,2,9} → 2/3
    assert(got("p->c") == ((3L, 2L, 2.0 / 3.0)))
    // empty child → NULL containment
    val empty = Profile.fkDiscovery(Seq(
      ("e", child.filter($"fk" > 100), "fk", parent, "pk"))).collect()(0)
    assert(empty.getLong(1) == 0 && empty.isNullAt(3))
  }

  test("profile: each branch prunes its scan to one column") {
    val dir = java.nio.file.Files.createTempDirectory("profile").toString
    Seq((1L, "x"), (2L, "y")).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    val prof = Profile.profile(spark.read.parquet(dir))
    // every parquet scan in the union reads exactly ONE column — the
    // union's total IO is one full-width pass, not n wide scans
    val scans = prof.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema:")).toSeq
      .map(_.split("ReadSchema:").last.trim)
    assert(scans.size == 2, s"expected one scan per column: $scans")
    assert(scans.forall(s => s.count(_ == ':') == 1),
      s"unpruned profile scans: $scans")
    assert(prof.count() == 2)
  }
}
