package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct alongside. The Spark-side
  * mechanics — schema, batching via mapPartitions, partition sizing so one
  * media batch fits executor memory — are real; the actual codec calls are
  * STUBBED (this container ships no image/audio libraries) behind
  * `decodeStub`, a deterministic fake keyed on the payload hash. Swapping
  * in a real decoder is a one-function change; everything around it (the
  * 100 TB-relevant part) is tested.
  */
object Multimodal {

  /** Metadata carried with every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png, wav, ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("feat_dim", IntegerType),
    StructField("features", ArrayType(FloatType)),
    StructField("decode_ok", BooleanType)))

  /** Wrap a DataFrame with a synthetic binary media column derived
    * deterministically from an id column — the test-data generator for the
    * multimodal path (no external files needed).
    */
  def withSyntheticMedia(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("media_bytes",
        unhex(repeat(md5(col(idCol).cast("string")), 4))) // 64 deterministic bytes
      .withColumn("media_meta",
        struct(lit("image").as("media_type"), lit("png").as("format"),
          lit(8).as("width"), lit(8).as("height"),
          lit(null).cast(LongType).as("duration_ms")))

  /** STUB decoder: a real implementation would decode `bytes` with an
    * image/audio codec. The fake derives a fixed-dim feature vector from
    * the bytes deterministically, so downstream plumbing (similarity over
    * extracted features, batch shapes, null handling) is fully testable.
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return null
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      // cheap deterministic mix of the payload bytes. The /256 keeps every
      // feature an exact binary fraction (k/2^8), so the float here and a
      // double recomputation in any engine are bit-identical — which is
      // what lets the retrieval pipeline over these features hash-match a
      // SQL oracle end-to-end.
      val b = bytes(i % bytes.length) & 0xff
      val b2 = bytes((i * 7 + 3) % bytes.length) & 0xff
      out(i) = ((b * 31 + b2) % 256) / 256.0f
      i += 1
    }
    out
  }

  /** Typed output of the decode step — encodes to exactly
    * [[featureSchema]].
    */
  case class MediaFeature(feat_dim: Int, features: Seq[Float], decode_ok: Boolean)

  /** The decoder seam, TYPED: a real deployment implements this with an
    * image/audio codec (and does per-partition init in `open`, e.g. model
    * or codec handles — called once per partition before the first
    * decode). Must be Serializable: instances ship to executors inside
    * the mapPartitions closure.
    */
  trait MediaDecoder extends Serializable {
    /** Per-partition initialization hook (codec/model setup). */
    def open(): Unit = ()
    /** Decode one payload to a `dim`-length feature vector (null in/out ok). */
    def decode(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** The deterministic stand-in used when no codec library exists (this
    * container): see [[decodeStub]].
    */
  object StubDecoder extends MediaDecoder {
    override def decode(bytes: Array[Byte], dim: Int): Array[Float] =
      decodeStub(bytes, dim)
  }

  /** Size partitions for a decode pass: one shuffle so that
    * (rows per partition × avg payload bytes) ≈ `targetBytesPerPartition`
    * — the knob that keeps a media batch inside executor memory no matter
    * how the upstream scan chunked the table (a 100 MB-per-image corpus
    * needs hundreds× fewer rows per partition than thumbnails, and the
    * scan's input-split sizing knows nothing about either).
    *
    * Sizing cost: the row count is metadata-only (parquet count
    * pushdown, no payload bytes read), and the average payload size
    * comes from a bounded `sampleRows`-row head sample — a full
    * `avg(length(bytes))` would read every payload byte once just to
    * size the pass that reads them again (a doubled 100 TB scan). The
    * head sample is biased if payload sizes correlate with file order;
    * raise `sampleRows` (or pass a pre-shuffled frame) when they do.
    */
  def repartitionForMedia(df: DataFrame, bytesCol: String,
                          targetBytesPerPartition: Long = 256L << 20,
                          sampleRows: Int = 10000): DataFrame = {
    require(targetBytesPerPartition > 0, "targetBytesPerPartition must be positive")
    require(sampleRows > 0, "sampleRows must be positive")
    val rows = df.count() // parquet metadata count: no payload read
    if (rows == 0) return df
    val s = df.select(length(col(bytesCol)).cast("double").as("b"))
      .limit(sampleRows).agg(avg(col("b"))).head()
    val avgBytes =
      if (!s.isNullAt(0)) s.getDouble(0)
      else {
        // the head sample was ALL-null (e.g. payload-less rows sorted
        // first) — that says nothing about the rest of the corpus, and
        // skipping the repartition here is exactly the executor-OOM this
        // function exists to prevent. Pay the one full-length pass.
        val full = df.agg(avg(length(col(bytesCol)).cast("double"))).head()
        if (full.isNullAt(0)) return df // truly all-null payloads
        full.getDouble(0)
      }
    val totalBytes = rows * math.max(avgBytes, 1.0)
    val n = math.min(math.ceil(totalBytes / targetBytesPerPartition), 1 << 20).toInt
    df.repartition(math.max(n, 1))
  }

  /** Feature extraction over the binary column as a typed
    * `Dataset.mapPartitions` so a real decoder amortizes per-partition
    * init (model load, codec setup) — the same batching shape a
    * Pandas-UDF/Arrow path would have.
    *
    * The object-mode boundary carries ONLY the projected (id, bytes)
    * pair: every other column stays in the columnar/codegen plan and
    * rejoins on the id (an equi-join AQE broadcasts for bounded media
    * batches). Dropping the whole row through `df.rdd` instead would
    * deserialize everything out of Tungsten, kill column pruning
    * downstream, and re-verify rows in `createDataFrame` — the
    * anti-pattern this implementation replaces. Partition count should be
    * sized so (rows per partition × payload size) fits the executor:
    * callers repartition upstream for large media.
    *
    * PRECONDITION: `idCol` must be non-null and unique — it is the rejoin
    * key (validated; a null id would throw at the primitive encoder and a
    * duplicate would fan rows out). The rejoin is a LEFT join so a row
    * whose feature record went missing surfaces with a null `feat` rather
    * than silently disappearing.
    *
    * `decoder` is the typed codec seam ([[StubDecoder]] by default —
    * nothing else exists in this container); size partitions upstream
    * with [[repartitionForMedia]] when payloads are large.
    */
  def extractFeatures(df: DataFrame, bytesCol: String, idCol: String, dim: Int,
                      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
    val feats = pairs.mapPartitions { it =>
      decoder.open() // per-partition init (codec/model handles)
      it.map { case (id, bytes) =>
        val f = decoder.decode(bytes, dim)
        (id, MediaFeature(dim, if (f == null) null else f.toSeq, f != null))
      }
    }.toDF("__feat_id", "feat")
    df.join(feats, df(idCol) === feats("__feat_id"), "left").drop("__feat_id")
  }

  /** Deterministic frame sampling for video-like payloads: byte-range
    * slices standing in for frames; emits (frame_no, frame_bytes) rows.
    * The explode shape (one row per frame) is what matters at scale.
    */
  def sampleFrames(df: DataFrame, bytesCol: String, nFrames: Int): DataFrame =
    df.withColumn("frame_no", explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_bytes",
        col(bytesCol).substr(col("frame_no") * lit(8) + 1, lit(8)))
}
