package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: opaque binary payload + typed metadata. */
case class MediaAsset(doc_id: Long, modality: String, payload: Array[Byte])

/** Extracted (stub) features for one asset. */
case class MediaFeatures(doc_id: Long, modality: String, byte_len: Int,
                         width: Int, height: Int, n_frames: Int,
                         sample_frames: Seq[Int])

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch-decoded per partition.
  *
  * The decode step is a clearly-marked DETERMINISTIC FAKE (no
  * image/audio codecs in this container): it derives metadata from the
  * payload's hex digest. Everything around it is real and tested — the
  * binary schema, the typed Dataset, the mapPartitions batch shape
  * (decoder initialized once per partition, rows streamed through it),
  * and the frame-sampling arithmetic. Swapping in a real codec touches
  * only [[StubCodec.decode]].
  */
object MediaOps {

  /** Deterministic fake codec — STUB: replace with a real decoder. */
  object StubCodec {
    /** "Opens" a decoder; in a real impl this would load native libs.
      * Returns a closure so mapPartitions demonstrates init-once-per-
      * partition batching. */
    def open(): Array[Byte] => (Int, Int, Int) = { payload =>
      val hex = payload.map(b => f"${b & 0xff}%02x").mkString
      def nib(i: Int): Int =
        Integer.parseInt(hex.substring(i, i + 1), 16)
      // fake dimensions from digest nibbles — deterministic
      val width = 64 + (nib(0) * 16 + nib(1)) % 192
      val height = 64 + (nib(2) * 16 + nib(3)) % 192
      val frames = 1 + nib(4) % 8
      (width, height, frames)
    }
  }

  /** Synthesize media assets from documents: payload = md5 digest bytes
    * of the text (16-byte opaque binary), modality cycles by source.
    */
  def assets(spark: SparkSession, sfDir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        substring(col("source"), -1, 1).as("srcDigit"),
        unhex(md5(col("text"))).as("payload"))
      .withColumn("modality",
        when(col("srcDigit").cast("int") % 3 === 0, lit("image"))
          .when(col("srcDigit").cast("int") % 3 === 1, lit("audio"))
          .otherwise(lit("video")))
      .select(col("doc_id"), col("modality"), col("payload"))
      .as[MediaAsset]
  }

  /** Batch feature extraction: decoder opened ONCE per partition, rows
    * streamed through it (the Spark-side shape a real codec needs);
    * frame sampling = every ⌈n/4⌉-th frame index.
    */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val decode = StubCodec.open() // init once per partition
      it.map { a =>
        val (w, h, f) = decode(a.payload)
        val step = math.max(1, math.ceil(f / 4.0).toInt)
        MediaFeatures(a.doc_id, a.modality, a.payload.length, w, h, f,
          (0 until f by step).toSeq)
      }
    }
  }

  /** DataFrame surface for SparkEntry (arrays → size for stable
    * comparison; sample_frames length = ceil-div sampling count). */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(assets(spark, sfDir))
      .toDF()
      .select(col("doc_id"), col("modality"), col("byte_len"),
        col("width"), col("height"), col("n_frames"),
        size(col("sample_frames")).as("n_sampled"))

  /** Frame-sample + resize plumbing (the remaining multimodal verbs):
    * explode each asset into its sampled frame rows — frame payload =
    * a deterministic byte-slice of the binary (STUB standing in for a
    * real frame grab; the per-frame row shape, binary slicing, and
    * explode-join plumbing are the real Spark-side work) — plus
    * fit-into-64×64 resize arithmetic on the decoded dimensions
    * (integer math; a real resampler consumes these target dims).
    */
  def frameSamples(spark: SparkSession, sfDir: String): DataFrame = {
    val a = assets(spark, sfDir).toDF()
    val f = extractFeatures(assets(spark, sfDir)).toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("sample_frames"))
    a.join(f, "doc_id")
      .select(col("doc_id"), col("payload"), col("width"), col("height"),
        explode(col("sample_frames")).as("frame_idx"))
      .select(
        col("doc_id"), col("frame_idx"),
        // stub frame grab: 4-byte slice at a frame-dependent offset
        lower(hex(expr("substring(payload, frame_idx * 4 % 12 + 1, 4)")))
          .as("frame_hex"),
        // fit-in-64x64, aspect preserved, integer-exact
        greatest(floor(col("width") * 64 /
          greatest(col("width"), col("height"))), lit(1))
          .cast("int").as("resized_w"),
        greatest(floor(col("height") * 64 /
          greatest(col("width"), col("height"))), lit(1))
          .cast("int").as("resized_h"))
  }

  /** DuckDB mirror of [[frameSamples]] — same nibble-derived decode,
    * byte-slicing on unhex(md5(text)), and resize arithmetic. */
  val frameSamplesSql: String = {
    def nib(i: Int) =
      s"(CASE WHEN ascii(substring(md5(text), ${i + 1}, 1)) >= 97 " +
        s"THEN ascii(substring(md5(text), ${i + 1}, 1)) - 87 " +
        s"ELSE ascii(substring(md5(text), ${i + 1}, 1)) - 48 END)"
    val w = s"(64 + (${nib(0)} * 16 + ${nib(1)}) % 192)"
    val h = s"(64 + (${nib(2)} * 16 + ${nib(3)}) % 192)"
    val n = s"(1 + ${nib(4)} % 8)"
    s"""SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       |  substring(md5(text), ((frame_idx * 4) % 12) * 2 + 1, 8)
       |    AS frame_hex,
       |  CAST(greatest(floor($w * 64 / greatest($w, $h)), 1) AS INT)
       |    AS resized_w,
       |  CAST(greatest(floor($h * 64 / greatest($w, $h)), 1) AS INT)
       |    AS resized_h
       |FROM (
       |  SELECT doc_id, text,
       |    unnest(range(0, $n, CAST(ceil($n / 4.0) AS INT))) AS frame_idx
       |  FROM documents)""".stripMargin
  }

  /** DuckDB mirror of the stub decode: same nibble arithmetic on the
    * md5 HEX STRING (identical to the payload's hex digest).
    */
  val mediaFeaturesSql: String = {
    def nib(i: Int) = // hex char → value, engine-portable via ascii()
      s"(CASE WHEN ascii(substring(md5(text), ${i + 1}, 1)) >= 97 " +
        s"THEN ascii(substring(md5(text), ${i + 1}, 1)) - 87 " +
        s"ELSE ascii(substring(md5(text), ${i + 1}, 1)) - 48 END)"
    s"""SELECT doc_id,
       |  CASE WHEN CAST(substring(source, length(source), 1) AS INT) % 3 = 0
       |       THEN 'image'
       |       WHEN CAST(substring(source, length(source), 1) AS INT) % 3 = 1
       |       THEN 'audio' ELSE 'video' END AS modality,
       |  16 AS byte_len,
       |  CAST(64 + (${nib(0)} * 16 + ${nib(1)}) % 192 AS INT) AS width,
       |  CAST(64 + (${nib(2)} * 16 + ${nib(3)}) % 192 AS INT) AS height,
       |  CAST(1 + ${nib(4)} % 8 AS INT) AS n_frames,
       |  CAST(ceil((1 + ${nib(4)} % 8) /
       |    ceil((1 + ${nib(4)} % 8) / 4.0)) AS INT) AS n_sampled
       |FROM documents""".stripMargin
  }
}
