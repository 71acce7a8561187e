package graft.llm

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenization (Sennrich et al., ACL'16 —
  * the merge-based vocabulary every modern LLM tokenizer trains; the
  * GPT-2 flavor: no end-of-word marker, tokens are whitespace-split
  * upstream) as a deterministic, oracle-checkable pipeline operator —
  * the K18b step past word-level [[TextAnalysis.buildVocab]].
  *
  * THE model is a MERGE LIST: rank-ordered (left, right) symbol pairs.
  * Training starts from each word type split into code points and
  * repeatedly merges the globally most frequent adjacent symbol pair
  * (count weighted by word-type corpus frequency, overlapping pairs
  * counted — the standard trainer's statistic); ties break to the
  * smallest (left, right) pair in binary string order, so the merge
  * sequence is a pure function of the corpus. Applying a merge is
  * LEFTMOST-GREEDY: scan the symbol sequence left to right, replacing
  * the first available (left, right) adjacency and continuing AFTER
  * the merged symbol — for a same-symbol chain `aaa` with merge (a,a)
  * that yields `[aa, a]`, never `[a, aa]`. The DuckDB oracle replays
  * the identical loop as chained SQL steps (pair count → argmax →
  * parity-greedy merge via gaps-and-islands), so merges, vocabulary
  * and encodings hash bit-for-bit: the arithmetic is all integers and
  * string concatenation — no rounding discipline needed anywhere.
  *
  * Scale shape: the corpus-scale work is ONE map-side-combined word
  * count shuffle; the trainer then runs on the top-`maxWordTypes`
  * word-type table (TakeOrdered — per-partition top-k, driver merge),
  * which is how production BPE trainers work too (they train on an
  * aggregated word-count table, not on raw text). Driver state is that
  * parameter-bounded table plus the merge list — the k-means-centroid
  * boundedness class, NOT corpus-proportional. Encoding broadcasts the
  * trained word→symbol rows (bounded by maxWordTypes × word length)
  * and the symbol vocabulary; out-of-vocabulary WORD TYPES (absent
  * from the trained table) are segmented by replaying the merge list
  * per distinct word ([[segmentUdf]] — a genuinely sequential
  * algorithm no built-in expresses; it runs once per DISTINCT new
  * word, never per occurrence).
  */
object Bpe {

  /** One trained merge: apply left||right at `rank` order. */
  final case class Merge(rank: Long, left: String, right: String, c: Long)

  /** UTF-8 BYTEWISE (unsigned) string ordering — the collation the
    * DuckDB oracle's `ORDER BY` and Spark's own UTF8String comparisons
    * use. Scala/Java's default String ordering compares UTF-16 code
    * units, which DISAGREES for supplementary-plane symbols vs
    * upper-BMP ones (an emoji's surrogate 0xD83D sorts before U+FB00
    * in UTF-16 but after it in UTF-8 bytes) — a tied pair count at such
    * a boundary would pick a different merge and diverge the whole
    * model from the oracle (round-12 review finding).
    */
  private[graft] val Utf8Ordering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val r = (x(i) & 0xff) - (y(i) & 0xff)
        if (r != 0) return r
        i += 1
      }
      x.length - y.length
    }
  }

  /** The trained model: the rank-ordered merge list plus each trained
    * word type's (corpus count, final symbol sequence). Bounded by
    * `maxWordTypes` — a trainer parameter, never corpus-proportional.
    */
  final case class Model(merges: Seq[Merge],
                         wordSyms: Seq[(String, Long, Vector[String])]) {
    /** (word, 1-based symbol position, symbol) rows — the broadcastable
      * encode-side lookup.
      */
    def symRows: Seq[(String, Long, String)] =
      wordSyms.flatMap { case (w, _, s) =>
        s.iterator.zipWithIndex.map { case (sym, i) => (w, (i + 1).toLong, sym) }.toSeq
      }

    /** (id, sym, cnt) — symbol ids by (occurrence-weighted count desc,
      * symbol), id 1 = heaviest; 0 is reserved for OOV symbols.
      */
    def vocab: Seq[(Long, String, Long)] = {
      val weights = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      wordSyms.foreach { case (_, c, s) =>
        s.foreach(sym => weights(sym) = weights.getOrElse(sym, 0L) + c)
      }
      weights.toSeq.sorted(new Ordering[(String, Long)] {
        def compare(a: (String, Long), b: (String, Long)): Int = {
          val c = java.lang.Long.compare(b._2, a._2) // cnt desc
          if (c != 0) c else Utf8Ordering.compare(a._1, b._1)
        }
      }).zipWithIndex.map { case ((sym, c), i) => ((i + 1).toLong, sym, c) }
    }
  }

  /** Code-point split (matches the oracle's character-based substr). */
  private[graft] def chars(w: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b.result()
  }

  /** Leftmost-greedy single-merge pass. */
  private[graft] def mergeOnce(syms: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** Replay the full merge list over one word — the OOV segmentation
    * path (and the reference implementation the oracle's SQL steps are
    * checked against in BpeSpec).
    */
  private[graft] def applyMerges(word: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(chars(word)) { case (s, (l, r)) => mergeOnce(s, l, r) }

  /** Train the merge list on `df`'s token stream. One corpus-scale
    * word-count shuffle; the merge loop runs on the collected
    * top-`maxWordTypes` (cnt desc, word) word-type table. Stops early
    * when no adjacent pair remains (merge ranks stay dense).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWordTypes: Int = 100000): Model = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    require(maxWordTypes > 0, s"maxWordTypes must be positive: $maxWordTypes")
    val wt: Seq[(String, Long)] = df
      .select(explode(tokens(normalizeText(col(textCol)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWordTypes)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    var syms = wt.map { case (w, c) => (w, c, chars(w)) }
    val merges = Seq.newBuilder[Merge]
    var rank = 0L
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (_, c, s) =>
        var i = 0
        while (i + 1 < s.length) {
          val k = (s(i), s(i + 1)); pc(k) = pc.getOrElse(k, 0L) + c; i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val ((l, r), c) = pc.toSeq.min(new Ordering[((String, String), Long)] {
          def compare(p: ((String, String), Long), q: ((String, String), Long)): Int = {
            val cc = java.lang.Long.compare(q._2, p._2) // cnt desc
            if (cc != 0) cc
            else {
              val lc = Utf8Ordering.compare(p._1._1, q._1._1)
              if (lc != 0) lc else Utf8Ordering.compare(p._1._2, q._1._2)
            }
          }
        })
        rank += 1
        merges += Merge(rank, l, r, c)
        syms = syms.map { case (w, cw, s) => (w, cw, mergeOnce(s, l, r)) }
      }
    }
    Model(merges.result(), syms)
  }

  /** The merge table as a frame: (rnk, lhs, rhs, c) — `lhs`/`rhs`
    * because LEFT/RIGHT/RANK are SQL keywords on the oracle side.
    */
  def mergesDf(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.merges.map(m => (m.rank, m.left, m.right, m.c))
      .toDF("rnk", "lhs", "rhs", "c")
  }

  /** The symbol vocabulary as a frame: (id, sym, cnt). */
  def vocabDf(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.vocab.toDF("id", "sym", "cnt")
  }

  /** Encode documents whose words are all IN the trained word-type
    * table (the train-and-encode-one-corpus path): (doc, n_subwords,
    * ids) with `ids` the space-joined subword id sequence — a flat
    * STRING (the driver harness cannot sort array cells). One
    * posexplode + two broadcast joins (model-bounded) + one doc-keyed
    * aggregation; order is carried by (token pos, symbol pos) structs
    * through the shuffle.
    */
  def encode(docs: DataFrame, model: Model, textCol: String,
             idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val symRows = model.symRows.toDF("word", "spos", "sym")
    val vocab = model.vocab.toDF("id", "sym", "cnt")
    // Coverage guard (r12 advice): the inner join below would SILENTLY
    // drop every occurrence of a word type outside the trained table —
    // exactly what happens when the trainer's maxWordTypes truncated the
    // corpus vocabulary — so n_subwords would undercount with no signal.
    // The guard probes only the DISTINCT word types (vocabulary-sized),
    // so the corpus-scale exploded frame stays LAZY — it is evaluated
    // once by the guard's aggregate and once by the encode job, never
    // pinned to storage (a localCheckpoint of the full (doc, pos, word)
    // frame would add corpus-sized memory/disk pressure to every encode
    // — round-13 review).
    val toks = docs
      .select(col(idCol).as("doc"),
        posexplode(tokens(normalizeText(col(textCol)))).as(Seq("pos", "word")))
    val missing = toks.select(col("word")).distinct()
      .join(broadcast(symRows.select(col("word")).distinct()), Seq("word"), "left_anti")
      .limit(5).collect().map(_.getString(0))
    require(missing.isEmpty,
      s"encode() requires every input word type in the trained table; " +
        s"uncovered word types found (first ${missing.length}): " +
        s"${missing.mkString(", ")} — the trainer likely hit maxWordTypes; " +
        "use encodeAny() for corpora with out-of-vocabulary words")
    toks
      .join(broadcast(symRows), Seq("word"))
      .join(broadcast(vocab.select(col("sym"), col("id"))), Seq("sym"), "left")
      .select(col("doc"), col("pos"), col("spos"),
        coalesce(col("id"), lit(0L)).as("tid"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_subwords"),
        sort_array(collect_list(struct(col("pos"), col("spos"), col("tid"))))
          .as("__s"))
      .select(col("doc"), col("n_subwords"),
        array_join(transform(col("__s"), s => s.getField("tid").cast("string")), " ")
          .as("ids"))
  }

  /** Encode an ARBITRARY corpus through a trained model — words absent
    * from the trained table are segmented by replaying the merge list
    * (once per DISTINCT word, then broadcast-joined back; their
    * symbols map to vocabulary ids, unseen symbols to 0). The general
    * serving path; [[encode]] is the same-corpus fast path.
    */
  def encodeAny(docs: DataFrame, model: Model, textCol: String,
                idCol: String,
                maxBroadcastWords: Long = TextAnalysis.DfreqBroadcastMaxVocab): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mergeList = model.merges.map(m => (m.left, m.right))
    val trained = model.wordSyms.map { case (w, _, s) => (w, s) }.toMap
    val bTrained = spark.sparkContext.broadcast(trained)
    val bMerges = spark.sparkContext.broadcast(mergeList)
    // distinct words of the INPUT corpus, segmented once each — the
    // sequential merge replay has no built-in expression; it runs on
    // the word-TYPE frame, never per occurrence
    val segment = udf { (w: String) =>
      bTrained.value.getOrElse(w, applyMerges(w, bMerges.value))
        .zipWithIndex.map { case (s, i) => ((i + 1).toLong, s) }
    }
    // the exploded token frame feeds the word-type distinct AND the
    // final id join — materialize it once (the shared-pass rule; a lazy
    // frame would re-tokenize the corpus for the second consumer)
    val toks = docs.select(col(idCol).as("doc"),
        posexplode(tokens(normalizeText(col(textCol)))).as(Seq("pos", "word")))
      .localCheckpoint(true)
    val wordTypes = toks.select(col("word")).distinct().localCheckpoint(true)
    val words = wordTypes
      .withColumn("__segs", segment(col("word")))
      .select(col("word"), explode(col("__segs")).as("__seg"))
      .select(col("word"), col("__seg._1").as("spos"), col("__seg._2").as("sym"))
    // the segmented word-type table is INPUT-corpus-derived, hence
    // unbounded at 100 TB — broadcast only under the shared gate
    val wSide =
      if (wordTypes.count() <= maxBroadcastWords) broadcast(words) else words
    val vocab = model.vocab.toDF("id", "sym", "cnt")
    toks
      .join(wSide, Seq("word"))
      .join(broadcast(vocab.select(col("sym"), col("id"))), Seq("sym"), "left")
      .select(col("doc"), col("pos"), col("spos"),
        coalesce(col("id"), lit(0L)).as("tid"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_subwords"),
        sort_array(collect_list(struct(col("pos"), col("spos"), col("tid"))))
          .as("__s"))
      .select(col("doc"), col("n_subwords"),
        array_join(transform(col("__s"), s => s.getField("tid").cast("string")), " ")
          .as("ids"))
  }
}
