package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder prompt): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode/feature-extract
  * runs batched inside partitions — the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage (same batch shape: N rows in, N rows out, model
  * loaded once per batch, columnar feature output).
  *
  * The actual media decoder is STUBBED (no image/audio libs in this
  * container): `decodeBatch` produces deterministic fake features derived
  * from the bytes. Everything around it — binary schema, metadata struct,
  * partition-preserving batched execution, feature array shape — is real
  * and tested; swapping the stub for a JNI/ONNX decoder changes no
  * plumbing.
  */
object MultimodalOps {
  import Tables.table

  val FeatureDim = 8
  val BatchSize = 64

  /** documents → opaque media rows: binary payload + typed metadata (the
    * shape a crawler would hand us; text bytes stand in for media bytes). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        length(encode(col("text"), "UTF-8")).cast(LongType).as("n_bytes"),
        col("source").as("origin"),
        lit("text/plain").as("mime")).as("meta"))

  // ================= STUB: media decode =================
  /** Deterministic fake per-batch "decoder": one call per batch of ≤
    * BatchSize rows (the model-inference shape). Feature r is the INTEGER
    * sum of the byte values at positions ≡ r (mod FeatureDim) — order-free
    * and exact in a Float up to 2^24 (a per-residue sum of 255-max bytes
    * would need a >500 KB payload to overflow; documents are KBs), so the
    * digest query below is SQL-expressible and rides the oracle gate.
    * Stable across runs, cheap, and obviously not a real decoder. Replace
    * with the real image/audio/frame decode; the call contract (batch in →
    * equal-length feature rows out) is what the pipeline depends on.
    */
  def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
    payloads.map { bytes =>
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        f(i % FeatureDim) += (bytes(i) & 0xFF)
        i += 1
      }
      f
    }
  // ======================================================

  /** Batched per-partition feature extraction: preserves partitioning (no
    * shuffle), groups rows into BatchSize chunks so the decoder amortizes
    * per-batch setup — the exact execution shape of mapInPandas with a
    * model handle. */
  def extractFeatures(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val payloadIdx = df.schema.fieldIndex("payload")
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        val feats = decodeBatch(batch.map(_.getAs[Array[Byte]](payloadIdx)))
        batch.zip(feats).map { case (r, f) =>
          Row.fromSeq(r.toSeq :+ f.toSeq)
        }
      }
    }(enc)
  }

  /** Frame sampling: split the opaque payload into fixed-size "frames"
    * and keep every Nth — the video-frame-extraction shape (chunking is
    * real; what a frame means is the stubbed decoder's concern). Runs as
    * a generator (posexplode) so one row fans out to its kept frames
    * without any shuffle. */
  def frameSample(df: DataFrame, frameBytes: Int, every: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast(DoubleType) / frameBytes).cast(IntegerType)
    // zero-length payloads have no frames; without this guard
    // sequence(0, -1) would DESCEND and emit a phantom empty frame
    df.filter(length(col("payload")) > 0)
      .select(col("doc_id"), col("payload"),
        posexplode(sequence(lit(0), nFrames - 1)).as(Seq("frame_idx", "f")))
      .filter(col("frame_idx") % every === 0)
      .select(col("doc_id"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"))
  }

  /** "Resize": deterministic byte-decimation of a frame to `targetBytes`
    * (stride sampling) — the stub standing in for an image resize; the
    * pipeline contract (binary in, smaller binary out, no shuffle) is the
    * real part. */
  def resize(frames: DataFrame, targetBytes: Int): DataFrame =
    frames.withColumn("resized",
      expr(s"""aggregate(
              |  transform(sequence(0, $targetBytes - 1),
              |    i -> substring(frame, CAST(i * length(frame) / $targetBytes AS INT) + 1, 1)),
              |  CAST('' AS BINARY), (acc, b) -> acc || b)""".stripMargin))

  // --- q_multimodal_meta: binary payload + metadata projection -----------
  // Oracle-checked: byte length and hex prefix agree with DuckDB's BLOB
  // handling, proving the binary column plumbing end-to-end.
  private def qMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.mime").as("mime"),
      lower(hex(encode(substring(col("meta.origin"), 1, 8), "UTF-8"))).as("origin_hex"))

  private val qMetaSql =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  'text/plain' AS mime,
      |  lower(hex(encode(substring(source, 1, 8)))) AS origin_hex
      |FROM documents""".stripMargin

  // --- q_multimodal_features: stub decode through the batched pipeline ---
  // Oracle-checked since the decoder's per-residue byte sums are integers:
  // the registered query projects scalar digests (dim, total byte sum, and
  // residue-0 sum) rather than the raw array<float> — the gate's comparator
  // needs hashable/sortable cells, and the digests exactly pin the batched
  // decode output. The DuckDB mirror exploits the corpus being ASCII
  // (octet_length == length, gate-checked by n_bytes), so ord(substring)
  // indexes the same bytes the Spark side decodes from the binary payload.
  private def qFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir)).select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      size(col("features")).cast(LongType).as("feature_dim"),
      expr("aggregate(features, CAST(0 AS BIGINT), (acc, f) -> acc + CAST(f AS BIGINT))")
        .as("feature_checksum"),
      element_at(col("features"), 1).cast(LongType).as("f0"))

  private val qFeaturesSql =
    s"""WITH b AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS i,
       |         ord(substring(text, CAST(i + 1 AS INT), 1)) AS v
       |  FROM documents, UNNEST(range(0, length(text))) r(i)),
       |s AS (
       |  SELECT doc_id, CAST(SUM(v) AS BIGINT) AS feature_checksum,
       |         CAST(SUM(CASE WHEN i % $FeatureDim = 0 THEN v ELSE 0 END) AS BIGINT) AS f0
       |  FROM b GROUP BY doc_id)
       |SELECT d.doc_id,
       |  octet_length(encode(d.text)) AS n_bytes,
       |  CAST($FeatureDim AS BIGINT) AS feature_dim,
       |  COALESCE(s.feature_checksum, 0) AS feature_checksum,
       |  COALESCE(s.f0, 0) AS f0
       |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin

  // --- q_frame_sample: frame extraction plumbing, oracle-checked ---------
  // Every-2nd 64-byte frame per payload; counting frames and surviving
  // bytes is pure arithmetic on the binary column, so DuckDB mirrors the
  // whole generator pipeline — proving the chunking math end-to-end.
  private val FrameBytes = 64
  private val Every = 2

  private def qFrameSample(spark: SparkSession, dir: String): DataFrame =
    frameSample(mediaTable(spark, dir), FrameBytes, Every)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame")).cast(LongType)).cast(LongType).as("n_bytes"))

  // DuckDB cannot substring a BLOB, so the oracle checks the chunking
  // arithmetic (a kept frame i spans min(FrameBytes, L - i*FrameBytes)
  // bytes) while the Spark side slices real binary frames — same totals.
  private val qFrameSampleSql =
    s"""WITH m AS (SELECT doc_id, octet_length(encode(text)) AS len FROM documents),
       |fr AS (
       |  SELECT doc_id, LEAST($FrameBytes, len - i * $FrameBytes) AS frame_len
       |  FROM m, UNNEST(range(0, CAST(ceil(len / $FrameBytes.0) AS BIGINT))) r(i)
       |  WHERE i % $Every = 0)
       |SELECT doc_id, COUNT(*) AS n_frames,
       |  CAST(SUM(frame_len) AS BIGINT) AS n_bytes
       |FROM fr GROUP BY doc_id""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_multimodal_meta", qMeta, Some(qMetaSql)),
    QueryDef("q_multimodal_features", qFeatures, Some(qFeaturesSql)),
    QueryDef("q_frame_sample", qFrameSample, Some(qFrameSampleSql)))
}
