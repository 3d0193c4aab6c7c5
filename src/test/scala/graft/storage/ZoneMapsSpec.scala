package graft.storage

import org.apache.spark.sql.functions._
import graft.SparkSuite

class ZoneMapsSpec extends SparkSuite {
  import spark.implicits._

  test("zonePruningStats: clustered layout skips, scattered layout cannot") {
    // 100 rows, values 0..99; clustered files of 10 consecutive values
    // vs scattered round-robin files; predicate [20, 39]
    val df = (0L until 100L).map(i => (i, i)).toDF("k", "v")
    val clustered = ZoneMaps.zonePruningStats(df, "clustered",
      floor(col("v") / 10).cast("long"), "v", 20L, 39L).collect()(0)
    assert(clustered.getLong(1) == 10 && clustered.getLong(2) == 2,
      clustered.toString) // 2 of 10 files scanned
    assert(clustered.getLong(4) == 20 && clustered.getLong(5) == 20)
    val scattered = ZoneMaps.zonePruningStats(df, "scattered",
      col("k") % 10, "v", 20L, 39L).collect()(0)
    // every round-robin file spans [f, 90+f] → all overlap the range
    assert(scattered.getLong(2) == 10 && scattered.getLong(4) == 100,
      scattered.toString)
    assert(scattered.getLong(5) == 20)
  }

  test("zonePruningStats: all-null file never scans; nulls match nothing") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, None))
      .toDF("k", "v")
    val r = ZoneMaps.zonePruningStats(df, "l",
      col("k"), "v", 0L, 10L).collect()(0)
    // 3 files; only file 1 has a zone overlapping [0,10]
    assert(r.getLong(1) == 3 && r.getLong(2) == 1)
    assert(r.getLong(4) == 1 && r.getLong(5) == 1)
  }
}
