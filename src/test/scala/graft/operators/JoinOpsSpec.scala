package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSuite

class JoinOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // trades/quotes — the canonical as-of fixture
  private val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0, 1L),
    ("A", ts("2024-01-01 10:05:00"), 101.0, 2L),
    ("A", ts("2024-01-01 10:10:00"), 102.0, 3L),
    ("B", ts("2024-01-01 10:02:00"), 50.0, 4L)
  ).toDF("sym", "qts", "quote", "qid")

  private val trades = Seq(
    ("A", ts("2024-01-01 09:59:00"), 1L), // before any quote -> null
    ("A", ts("2024-01-01 10:05:00"), 2L), // exactly at quote 2 -> 101
    ("A", ts("2024-01-01 10:07:30"), 3L), // between 2 and 3 -> 101
    ("A", ts("2024-01-01 11:00:00"), 4L), // after all -> 102
    ("B", ts("2024-01-01 10:03:00"), 5L), // B's only quote -> 50
    ("C", ts("2024-01-01 10:00:00"), 6L) // no quotes for key -> null
  ).toDF("sym", "tts", "tid")

  test("asofBackward matches latest quote at-or-before each trade") {
    val got = AsofJoin.asofBackward(
        trades, quotes, key = "sym", leftTs = "tts", rightTs = "qts",
        payload = Seq("quote"), rightTiebreak = Some("qid"))
      .select("tid", "quote").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      1L -> None, 2L -> Some(101.0), 3L -> Some(101.0),
      4L -> Some(102.0), 5L -> Some(50.0), 6L -> None))
  }

  test("asofBackward tolerance nulls out stale matches") {
    val got = AsofJoin.asofBackward(
        trades, quotes, key = "sym", leftTs = "tts", rightTs = "qts",
        payload = Seq("quote"), rightTiebreak = Some("qid"),
        toleranceSeconds = Some(600))
      .select("tid", "quote").as[(Long, Option[Double])].collect().toMap
    // trade 4 is 50 min after quote 3 -> stale
    assert(got(4L).isEmpty)
    assert(got(2L).contains(101.0) && got(3L).contains(101.0))
  }

  test("asofBackward right ties resolve by the greatest tiebreak") {
    val dupQuotes = quotes.union(
      Seq(("A", ts("2024-01-01 10:05:00"), 999.0, 9L))
        .toDF("sym", "qts", "quote", "qid"))
    val got = AsofJoin.asofBackward(
        trades, dupQuotes, key = "sym", leftTs = "tts", rightTs = "qts",
        payload = Seq("quote"), rightTiebreak = Some("qid"))
      .select("tid", "quote").as[(Long, Option[Double])].collect().toMap
    assert(got(2L).contains(999.0)) // qid 9 beats qid 2 at the same ts
  }

  test("asofBackward carries a null payload instead of an older row's value") {
    // the matched row's payload is genuinely NULL — the carry must not
    // skip past it to the older non-null quote
    val quotesWithNull = Seq(
      ("A", ts("2024-01-01 10:00:00"), Option(100.0), 1L),
      ("A", ts("2024-01-01 10:05:00"), Option.empty[Double], 2L)
    ).toDF("sym", "qts", "quote", "qid")
    val trade = Seq(("A", ts("2024-01-01 10:06:00"), 1L))
      .toDF("sym", "tts", "tid")
    val got = AsofJoin.asofBackward(
        trade, quotesWithNull, key = "sym", leftTs = "tts", rightTs = "qts",
        payload = Seq("quote"), rightTiebreak = Some("qid"))
      .select("tid", "quote").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).isEmpty, "must match the 10:05 null quote, not 10:00")
  }

  test("asofBackward rejects payload names that collide with left columns") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(trades, quotes, key = "sym",
        leftTs = "tts", rightTs = "qts", payload = Seq("sym"))
    }
  }

  test("asofForward matches earliest quote at-or-after each trade") {
    val got = AsofJoin.asofForward(
        trades, quotes, key = "sym", leftTs = "tts", rightTs = "qts",
        payload = Seq("quote"), rightTiebreak = Some("qid"))
      .select("tid", "quote").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      1L -> Some(100.0), // 09:59 -> first quote at 10:00
      2L -> Some(101.0), // equality matches forward too
      3L -> Some(102.0), // 10:07:30 -> next quote at 10:10
      4L -> None, // after the last quote
      5L -> None, // B's only quote is before the trade
      6L -> None))
  }

  test("asofForward tolerance nulls out matches too far ahead") {
    val got = AsofJoin.asofForward(
        trades, quotes, key = "sym", leftTs = "tts", rightTs = "qts",
        payload = Seq("quote"), rightTiebreak = Some("qid"),
        toleranceSeconds = Some(60))
      .select("tid", "quote").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(100.0)) // 1 min ahead: inside tolerance
    assert(got(3L).isEmpty) // 2.5 min ahead: outside
  }

  test("asofBackward plans one shuffle and no join node") {
    val df = AsofJoin.asofBackward(
      trades, quotes, key = "sym", leftTs = "tts", rightTs = "qts",
      payload = Seq("quote"))
    val plan = df.queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, "as-of must not plan a join")
  }

  test("bucketedRangeJoin equals the naive range join") {
    val facts = (0 until 200).map(i => (i.toLong, i * 0.7)).toDF("id", "v")
    val dim = Seq((0.0, 25.0, "t0"), (25.0, 60.0, "t1"), (60.0, 150.0, "t2"))
      .toDF("lo", "hi", "tier")
    val got = RangeJoin.bucketedRangeJoin(facts, dim, "v", "lo", "hi", 25.0)
      .select("id", "tier").as[(Long, String)].collect().toSet
    val want = facts.join(dim, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "tier").as[(Long, String)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("bucketedRangeJoin boundary values land in the upper interval") {
    val facts = Seq((1L, 25.0), (2L, 24.999), (3L, 59.999), (4L, 60.0))
      .toDF("id", "v")
    val dim = Seq((0.0, 25.0, "t0"), (25.0, 60.0, "t1"), (60.0, 150.0, "t2"))
      .toDF("lo", "hi", "tier")
    val got = RangeJoin.bucketedRangeJoin(facts, dim, "v", "lo", "hi", 25.0)
      .select("id", "tier").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "t1", 2L -> "t0", 3L -> "t1", 4L -> "t2"))
  }

  test("bucketedRangeJoin plans a broadcast hash join, not a nested loop") {
    val facts = (0 until 50).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    val dim = Seq((0.0, 25.0, "t0"), (25.0, 50.0, "t1")).toDF("lo", "hi", "tier")
    val df = RangeJoin.bucketedRangeJoin(facts, dim, "v", "lo", "hi", 25.0)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
  }
}
