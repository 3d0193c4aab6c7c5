package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class VocabTokenCountSpec extends SparkSuite {
  import spark.implicits._

  private def countOf(text: String, vocab: Seq[String]): Long = {
    GraftFunctions.register(spark)
    Seq(text).toDF("t")
      .select(call_function("graft_vocab_tokens", col("t"),
        typedLit(vocab)).as("n"))
      .collect()(0).getLong(0)
  }

  test("greedy longest-match: longest entry wins at every position") {
    // "abc" matches before "ab"/"a"; remaining "de" → "de"
    assert(countOf("abcde", Seq("a", "ab", "abc", "de")) == 2L)
    // without "abc": "ab" + "c"(unk) + "de"
    assert(countOf("abcde", Seq("a", "ab", "de")) == 3L)
  }

  test("tokens never cross spaces; spaces are not tokens") {
    // vocab contains the joined form, but the space splits it
    assert(countOf("ab cd", Seq("ab cd", "ab", "cd")) == 2L)
    // repeated/leading/trailing spaces contribute nothing
    assert(countOf("  ab   cd ", Seq("ab", "cd")) == 2L)
  }

  test("unmatched characters consume one position each (char fallback)") {
    // nothing matches: every char is one <unk> token
    assert(countOf("xyz", Seq("ab")) == 3L)
    // empty text → zero tokens
    assert(countOf("", Seq("ab")) == 0L)
  }

  test("driver replay agrees with the kernel on pseudo-random text") {
    val vocab = Seq("the", "th", "he", "cat", "ca", "at", "a", "t", "c", "h", "e")
    val rnd = new scala.util.Random(7)
    val alphabet = "thecax "
    (1 to 20).foreach { _ =>
      val s = (1 to 30).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      // reference implementation, naive and obviously-correct
      var total = 0L
      s.split(" ").filter(_.nonEmpty).foreach { w =>
        var p = 0
        while (p < w.length) {
          val l = (math.min(w.length - p, 3) to 1 by -1)
            .find(len => vocab.contains(w.substring(p, p + len)))
          total += 1
          p += l.getOrElse(1)
        }
      }
      assert(countOf(s, vocab) == total, s"text '$s'")
    }
  }
}
