package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match tokenization count against a vocab — the
  * in-engine BPE-style tokenizer feeding the pre-tokenized seam
  * ([[graft.operators.Packing.sequencePack]]'s `tokenCountCol`,
  * `TextAnalysis.tokenCount`'s override).
  *
  * Semantics (WordPiece-style greedy, no continuation markers): text
  * splits on single spaces into words (tokens never cross a space, a
  * space is not a token); within a word, repeatedly take the LONGEST
  * vocab entry prefixing the remaining suffix; if none matches,
  * consume one character as an <unk> (also one token). The vocab is
  * the right operand and must be FOLDABLE (a literal array<string> —
  * vocabularies are dictionary-sized and broadcast as a literal, the
  * [[graft.operators.Similarity]] centroid discipline); the lookup
  * set + max token length build once per plan, not per row, and
  * codegen references the prebuilt object directly.
  *
  * Deterministic and engine-replayable: greedy longest-match has no
  * ties (lengths are totally ordered), so a SQL oracle replaying
  * "advance by the longest matching vocab entry, else 1" produces
  * identical counts.
  */
case class VocabTokenCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_vocab_tokens"

  @transient private lazy val vocabRef: VocabTokenCount.Vocab = {
    require(right.foldable,
      "graft_vocab_tokens: vocab must be a literal (foldable) array<string>")
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val set = new java.util.HashSet[String](arr.numElements() * 2)
    var maxLen = 1
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        if (s.nonEmpty) {
          set.add(s)
          if (s.length > maxLen) maxLen = s.length
        }
      }
      i += 1
    }
    new VocabTokenCount.Vocab(set, maxLen)
  }

  override def nullSafeEval(t: Any, v: Any): Any =
    VocabTokenCount.count(t.asInstanceOf[UTF8String].toString, vocabRef)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocab", vocabRef,
      classOf[VocabTokenCount.Vocab].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.VocabTokenCount.count($t.toString(), $ref);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VocabTokenCount =
    copy(left = newLeft, right = newRight)
}

object VocabTokenCount {
  /** Prebuilt lookup state: the entry set and the longest entry length
    * (the greedy probe's upper bound). */
  final class Vocab(val set: java.util.HashSet[String], val maxTokLen: Int)
    extends Serializable

  /** The greedy count — static so generated code calls it directly. */
  def count(text: String, v: Vocab): Long = {
    var total = 0L
    var i = 0
    val n = text.length
    while (i < n) {
      if (text.charAt(i) == ' ') i += 1
      else {
        var e = i
        while (e < n && text.charAt(e) != ' ') e += 1
        var p = i
        while (p < e) {
          var l = math.min(v.maxTokLen, e - p)
          var advance = 1 // no match → one <unk> character
          var found = false
          while (l >= 1 && !found) {
            if (v.set.contains(text.substring(p, p + l))) {
              advance = l
              found = true
            }
            l -= 1
          }
          total += 1
          p += advance
        }
        i = e
      }
    }
    total
  }
}
