package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeVocab

class BpeVocabSpec extends SparkSpec {
  import spark.implicits._

  test("learns the classic merges on a textbook corpus") {
    // "low lower lowest newest widest": 'lo' and then 'low' should be
    // among the first merges ('w e'/'e s'/'s t' compete via the -est words)
    val docs = Seq(
      (1L, "low low low lower lower"),
      (2L, "newest newest widest lowest")).toDF("doc_id", "text")
    val (merges, words) = BpeVocab.learn(docs, "text", steps = 4)
    assert(merges.size === 4)
    assert(merges.head.left === "l" && merges.head.right === "o",
      s"first merge should be (l,o): ${merges.head}")
    // 'lo' weight = low(3) + lower(2) + lowest(1); ties with 'ow' at 6,
    // the (a, b) lexicographic tie-break picks (l, o)
    assert(merges.head.cnt === 6L)
    assert(merges(1).left === "lo" && merges(1).right === "w")
    // final reps stay sentinel-delimited and re-split cleanly
    val reps = words.select("word", "rep").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reps("low") === " low ")
  }

  test("merge application matches the delimited-replace semantics cross-checked with the oracle") {
    // one pass of ' a a ' -> ' aa ' over 5 a's gives 'aa a aa' (the
    // documented dialect); 4 passes reach the fixpoint
    val docs = Seq((1L, "aaaaa aaaaa aaaaa")).toDF("doc_id", "text")
    val (merges, words) = BpeVocab.learn(docs, "text", steps = 2)
    assert(merges.head.left === "a" && merges.head.right === "a")
    val rep = words.filter(col("word") === "aaaaa")
      .select("rep").collect().head.getString(0)
    // after merge 1 (a,a): ' aa a aa ' [dialect]; merge 2 is then the
    // argmax over the new symbols
    assert(!rep.contains(" a a "), "merge must reach fixpoint")
  }

  test("batched == sequential merge sets on conflict-free rounds") {
    // four symbol-disjoint pair families with well-separated counts: the
    // top-4 pairs never share a symbol and no merge creates a pair that
    // outranks a later pick, so one batch=4 round must reproduce the
    // batch=1 sequence exactly — same pairs, same order, same counts.
    val docs = Seq(
      (1L, ("ab " * 40) + ("cd " * 30) + ("ef " * 20) + ("gh " * 10)))
      .toDF("doc_id", "text")
    val (seq4, _) = BpeVocab.learn(docs, "text", steps = 4, batch = 1)
    val (bat4, _) = BpeVocab.learn(docs, "text", steps = 4, batch = 4)
    assert(bat4 === seq4)
  }

  test("batched rounds select only symbol-disjoint merges and still progress") {
    // every top pair shares the symbol 'a' ("a b", "a c", ... after the
    // char split), so each round can batch only one of them — batching
    // must degrade to sequential, not merge conflicting pairs together
    val docs = Seq(
      (1L, ("ab " * 40) + ("ac " * 30) + ("ad " * 20) + ("ae " * 10)))
      .toDF("doc_id", "text")
    val (seqM, _) = BpeVocab.learn(docs, "text", steps = 3, batch = 1)
    val (batM, _) = BpeVocab.learn(docs, "text", steps = 3, batch = 4)
    assert(batM === seqM)
    assert(batM.map(_.step) === Seq(1, 2, 3))
  }

  test("batched learning respects the total step budget") {
    val docs = Seq(
      (1L, ("ab " * 9) + ("cd " * 8) + ("ef " * 7) + ("gh " * 6)))
      .toDF("doc_id", "text")
    // budget 3 with batch 4: the round must truncate to 3 merges
    val (m, _) = BpeVocab.learn(docs, "text", steps = 3, batch = 4)
    assert(m.size === 3)
    assert(m.map(_.step) === Seq(1, 2, 3))
  }

  test("encode counts cover every doc and pieces never exceed chars") {
    val docs = Seq(
      (1L, "low lower"), (2L, "newest"), (3L, "")).toDF("doc_id", "text")
    val enc = BpeVocab.encodeCounts(docs, "doc_id", "text", steps = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.length === 3)
    val m = enc.map(t => t._1 -> t).toMap
    assert(m(3L)._2 === 0L && m(3L)._3 === 0L)
    assert(m(1L)._2 === 2L)
    // pieces per word: between 1 and word length
    assert(m(2L)._3 >= 1L && m(2L)._3 <= 6L)
    assert(m(1L)._3 >= 2L && m(1L)._3 <= 8L)
  }
}
