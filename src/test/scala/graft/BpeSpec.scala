package graft

import graft.llm.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** K18b BPE subword tokenization: leftmost-greedy merge semantics, the
  * trainer's determinism, and the general [[Bpe.encodeAny]] OOV path
  * against the same-corpus [[Bpe.encode]] fast path (the contract
  * queries additionally hash merges/vocab/encodings against DuckDB's
  * replay of the merge loop).
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("mergeOnce is leftmost-greedy; applyMerges replays ranks in order") {
    // same-symbol chain: aaa + (a,a) → [aa, a], never [a, aa]
    assert(Bpe.mergeOnce(Vector("a", "a", "a"), "a", "a") === Vector("aa", "a"))
    assert(Bpe.mergeOnce(Vector("a", "a", "a", "a"), "a", "a") === Vector("aa", "aa"))
    // non-overlapping pairs merge in one pass
    assert(Bpe.mergeOnce(Vector("a", "b", "a", "b"), "a", "b") === Vector("ab", "ab"))
    // a merge creating a new adjacency does NOT re-merge in the same pass
    assert(Bpe.mergeOnce(Vector("a", "b", "b"), "a", "b") === Vector("ab", "b"))
    assert(Bpe.applyMerges("abab", Seq(("a", "b"), ("ab", "ab"))) === Vector("abab"))
    // code-point split survives supplementary characters
    assert(Bpe.chars("a😀b") === Vector("a", "😀", "b"))
    // tie-breaks compare UTF-8 BYTES (the oracle's collation), not
    // UTF-16 code units: an emoji (UTF-8 F0..) sorts AFTER U+FB00
    // (UTF-8 EF..) even though its UTF-16 surrogate 0xD83D is smaller
    assert(Bpe.Utf8Ordering.compare("😀", "ﬀ") > 0,
      "UTF-8 byte order, not UTF-16 code-unit order")
    assert(Bpe.Utf8Ordering.compare("a", "ab") < 0)
    assert(Bpe.Utf8Ordering.compare("ab", "ab") === 0)
  }

  test("trainer is deterministic and merge counts are frequency-ordered") {
    val docs = core.Engine.table(spark, TestSpark.sf, "documents")
    val m1 = Bpe.train(docs, "text", numMerges = 10)
    val m2 = Bpe.train(docs, "text", numMerges = 10)
    assert(m1.merges === m2.merges, "same corpus, same parameters → same merges")
    assert(m1.merges.map(_.rank) === (1L to 10L), "ranks are dense from 1")
    // each recorded count is the argmax of its step — monotone within
    // the prefix where no new pair overtakes (not globally monotone),
    // but every count is positive and the table is non-empty
    assert(m1.merges.forall(_.c > 0))
    // early stop: asking for more merges than pairs exist terminates
    val tiny = spark.createDataFrame(Seq(Tuple1("ab ab"))).toDF("text")
    val mt = Bpe.train(tiny, "text", numMerges = 50)
    assert(mt.merges.size === 1, "one pair type → one merge, then exhausted")
    assert(mt.wordSyms.map(_._3) === Seq(Vector("ab")))
  }

  test("encodeAny equals encode on the training corpus and segments OOV words") {
    import spark.implicits._
    val docs = core.Engine.table(spark, TestSpark.sf, "documents")
    val model = Bpe.train(docs, "text", numMerges = 20)
    val fast = Bpe.encode(docs, model, "text", "doc_id")
      .orderBy(col("doc")).collect().toSeq
    val any = Bpe.encodeAny(docs, model, "text", "doc_id")
      .orderBy(col("doc")).collect().toSeq
    assert(any === fast, "the OOV-capable path must agree on in-vocab corpora")
    // an unseen word segments through the merge replay: its symbols map
    // to trained ids where they exist, 0 where they don't
    val oov = Seq((1L, "join hashjoin zzqz")).toDF("doc_id", "text")
    val enc = Bpe.encodeAny(oov, model, "text", "doc_id")
      .select("ids").as[String].head()
    val vocabIds = model.vocab.map { case (id, sym, _) => sym -> id }.toMap
    val expected = (Seq("join").flatMap(w => model.wordSyms.find(_._1 == w).get._3) ++
      Bpe.applyMerges("hashjoin", model.merges.map(m => (m.left, m.right))) ++
      Bpe.applyMerges("zzqz", model.merges.map(m => (m.left, m.right))))
      .map(sym => vocabIds.getOrElse(sym, 0L)).mkString(" ")
    assert(enc === expected)
  }
}
