package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  private def refZ(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val (xm, ym) = (x & mask, y & mask)
    (0 until bits).map { b =>
      (((xm >> b) & 1L) << (2 * b)) | (((ym >> b) & 1L) << (2 * b + 1))
    }.reduce(_ | _)
  }

  test("zValue matches the reference interleave and round-trips") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue($"x", $"y", 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == refZ(x, y, 5), s"($x,$y)")
    }
    // bijective on the grid: 1024 points -> 1024 distinct z-values 0..1023
    assert(got.values.toSet == (0L until 1024L).toSet)
  }

  test("masking: high bits beyond `bits` are ignored") {
    val df = Seq((1027L, 5L)).toDF("x", "y") // 1027 & 1023 = 3
    val z = df.select(ZOrder.zValue($"x", $"y", 10)).head.getLong(0)
    assert(z == refZ(3L, 5L, 10))
  }

  test("z-clustered layout prunes a y-box predicate; x-sorted does not") {
    // 4096 points on a 64x64 grid, both dims uniform
    val pts = (0 until 4096).map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
      .toDF("id", "x", "y")
    def partitionYRanges(df: org.apache.spark.sql.DataFrame): Array[(Long, Long)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy($"pid").agg(min($"y").as("lo"), max($"y").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
    val nParts = 16
    val zClustered = ZOrder.clusterByZ(pts, "x", "y", bits = 6, nPartitions = nParts)
    val xSorted = pts.repartitionByRange(nParts, $"x").sortWithinPartitions($"x")
    // box predicate on y alone: y in [8, 15] (1/8 of the domain)
    def touching(ranges: Array[(Long, Long)]): Int =
      ranges.count { case (lo, hi) => hi >= 8 && lo <= 15 }
    val zTouch = touching(partitionYRanges(zClustered))
    val xTouch = touching(partitionYRanges(xSorted))
    assert(xTouch == nParts, s"x-sorted layout cannot prune on y (got $xTouch)")
    assert(zTouch <= nParts / 2,
      s"z-order should confine y-ranges to rectangles: $zTouch of $nParts touch")
    // and the data survives intact
    assert(zClustered.count() == 4096L)
  }
}
