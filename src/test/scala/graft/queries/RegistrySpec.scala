package graft.queries

import graft.SparkSuite

class RegistrySpec extends SparkSuite {

  test("query names are unique and oracle keys are a subset") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(Registry.all.count(_.oracle.isDefined) >= 30)
  }

  test("EVERY query is oracle-checked — no silent rows-only entries") {
    // the driver records a weaker rows-only check for queries without
    // oracle SQL; this registry keeps the strong gate universal, so a
    // new entry without an oracle is a regression, not an option
    val missing = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    assert(Registry.all.size >= 104)
  }

  test("every query runs at sf0.001 and the flagship returns rows") {
    val dir = "/root/testdata/sf0.001"
    Registry.all.foreach { q =>
      val n = q.run(spark, dir).count()
      assert(n >= 0, q.name)
    }
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
