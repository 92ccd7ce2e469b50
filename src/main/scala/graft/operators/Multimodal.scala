package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode/feature-extract stages.
  *
  * The Spark-side shape is the real design: binary payloads stay columnar
  * (parquet BYTE_ARRAY with metadata pushdown on the typed columns), and
  * heavy per-item decode runs in [[decodeFeatures]]-style mapPartitions
  * stages — batched per partition so a decoder (JNI/FFmpeg/JPEG)
  * amortizes init cost across a partition, exactly how a Pandas-UDF
  * batch would.
  *
  * DECODE (r12): REAL for two public uncompressed containers — PPM
  * P5/P6 and 24-bit BMP, parsed pure-JVM by [[graft.plans.ImageCodec]]
  * (header grammar, comments, BMP bottom-up padded rows, integer
  * BT.601 luma). Every pixel-facing stage below ([[phashPairs]],
  * [[sceneCuts]], [[frameNearDupPairs]], [[sampleFrames]], audio
  * fingerprints) first runs the codegen'd `graft_gray_decode`: a
  * recognized container hashes its DECODED grayscale pixels; an
  * unrecognized payload keeps the documented byte-strip stand-in
  * (this sandbox has no JPEG/PNG/media libs — that boundary is the
  * retained stub, and ONLY that).
  *
  * Partitioning note for 100 TB of media: size partitions by
  * `spark.sql.files.maxPartitionBytes` against payload size (media rows
  * are MBs, not KBs — target O(100) rows per task), and never collect
  * binaries to the driver.
  */
object Multimodal {

  final case class MediaRow(id: Long, modality: String, payload: Array[Byte],
      width: Int, height: Int, format: String)
  final case class MediaFeatures(id: Long, modality: String, byte_len: Int,
      width: Int, height: Int, embedding: Array[Float])

  /** Wrap a text table as a media table whose payload is a REAL binary
    * P6 PPM: the utf-8 text bytes become gray pixels (r=g=b), shaped
    * h×(len/h) for the largest h ∈ {4,3,2,1} dividing the length (no
    * padding — see [[graft.plans.ImageCodec.encodePpmGray]]). Because
    * integer BT.601 luma is the identity on gray pixels, decode ∘
    * encode == the original text bytes EXACTLY, which keeps every
    * downstream hash oracle byte-exact while exercising a real
    * container round-trip. Width/height metadata are the real encoded
    * dims — derived from the UTF-8 BYTE length (octet_length of the
    * encoded payload), the same unit encodePpmGray shapes the
    * container from; `length(text)` (a CHARACTER count) would disagree
    * with the actual header for any non-ASCII text (r12 advice,
    * spec-pinned with a non-ASCII row). */
  def attachBinary(df: DataFrame, idCol: String, textCol: String,
      format: String = "ppm"): DataFrame = {
    require(Set("ppm", "bmp", "jpeg", "mixed")(format),
      s"attachBinary: format must be ppm | bmp | jpeg | mixed, got '$format'")
    val spark = df.sparkSession
    val enc = encode(col(textCol), "UTF-8")
    val len = octet_length(enc)
    val h = when(len === 0, lit(1))
      .when(len % 4 === 0, lit(4))
      .when(len % 3 === 0, lit(3))
      .when(len % 2 === 0, lit(2))
      .otherwise(lit(1))
    // `format`: "ppm" (default; 0-byte payloads encode as 0×1),
    // "bmp" (24-bit BITMAPINFOHEADER containers — note an EMPTY text
    // yields a w=0 header the decoder rejects by design), or "mixed"
    // (even ids PPM, odd ids BMP — one table exercising BOTH real
    // decoders, the mm_decode_bmp gate's shape)
    // "jpeg" routes through the r14 baseline codec — same shape rule,
    // lossy pixels (±2, the all-ones-quant floor) but EXACT header
    // dims, which is what the dims-pinning decode gates consume
    val kind = format match {
      case "ppm" => lit("ppm")
      case "bmp" => lit("bmp")
      case "jpeg" => lit("jpeg")
      case "mixed" =>
        when(col(idCol).cast("long") % 2 === 0, lit("ppm"))
          .otherwise(lit("bmp"))
    }
    df.select(
      col(idCol).cast("long").as("id"),
      lit("image").as("modality"),
      when(kind === "ppm", graft.plans.GraftFunctions.ppmEncode(spark, enc))
        .when(kind === "jpeg", graft.plans.GraftFunctions.jpegEncode(spark, enc))
        .otherwise(graft.plans.GraftFunctions.bmpEncode(spark, enc))
        .as("payload"),
      (len / h).cast("int").as("width"),
      h.cast("int").as("height"),
      concat(lit("image/"), kind).as("format"))
  }

  /** Expression-level (codegen'd) lightweight features — no decode.
    * content_md5 hashes the payload's HEX encoding (not the raw
    * bytes): byte-equivalent as a content fingerprint, and the form a
    * SQL oracle without a binary md5 (DuckDB 1.0 has md5(VARCHAR)
    * only) can reproduce byte-faithfully for ANY payload — hashing a
    * VARCHAR reconstruction of binary content breaks the moment a
    * byte sequence isn't valid UTF-8. */
  def byteFeatures(df: DataFrame): DataFrame =
    df.select(col("id"), col("modality"),
      octet_length(col("payload")).cast("int").as("byte_len"),
      hex(col("payload").substr(1, 8)).as("header_hex"),
      col("width"), col("height"),
      md5(hex(col("payload"))).as("content_md5"))

  /** Frame sampling: one row per fixed-size chunk of the DECODED
    * sample stream (gray pixels for recognized image containers via
    * `graft_gray_decode`, raw bytes otherwise) — the video →
    * frame-extraction plumbing; a keyframe-aware decoder would replace
    * fixed-size slicing, the explode/schema shape is identical.
    * Row-local posexplode — no shuffle; at 100 TB frame rows inherit
    * the scan's partitioning. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256): DataFrame =
    media
      .withColumn("payload", graft.plans.GraftFunctions.grayDecode(
        media.sparkSession, col("payload")))
      .withColumn("n_frames",
        ceil(octet_length(col("payload")) / lit(frameBytes.toDouble)).cast("int"))
      // empty payloads produce no frames: without the guard,
      // sequence(0, -1) takes Spark's implicit -1 step and yields [0, -1]
      // — two bogus frame rows per empty document
      .where(col("n_frames") > 0)
      .select(col("id"), col("modality"), col("payload"),
        posexplode(sequence(lit(0), col("n_frames") - 1)).as(Seq("pos", "frame_idx")))
      .select(col("id"), col("frame_idx").cast("int").as("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"))
      .select(col("id"), col("frame_idx"),
        octet_length(col("frame")).cast("int").as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))

  /** Scene-cut detection per video: perceptual hash per sampled frame
    * ([[sampleFrames]]' slicing, [[graft.plans.Sketches.phash60]] per
    * frame), then ONE keyed lag — a cut is an adjacent-frame pair
    * whose hash hamming distance reaches `minHamming`. Returns
    * (id, frame_idx, hamming) where frame_idx is the FIRST frame of
    * the new scene. A real deployment swaps byte-slices for decoded
    * keyframes; the hash + change-detection plumbing is the real thing
    * either way. Scale: hashing is scan-stage row-local; the only
    * shuffle is the per-video frame sort, state = one previous hash
    * per key — no frame ever joins another video's frames. */
  def sceneCuts(media: DataFrame, idCol: String = "id",
      payloadCol: String = "payload", frameBytes: Int = 256,
      minHamming: Int = 28): DataFrame = {
    require(frameBytes > 0, "frameBytes must be positive")
    require(minHamming >= 1 && minHamming <= 60,
      "minHamming must be in [1,60]")
    val spark = media.sparkSession
    val frames = media
      .withColumn("__p0",
        graft.plans.GraftFunctions.grayDecode(spark, col(payloadCol)))
      .withColumn("n_frames",
        ceil(octet_length(col("__p0")) / lit(frameBytes.toDouble)).cast("int"))
      .where(col("n_frames") > 1) // single-frame media cannot cut
      .select(col(idCol).as("id"), col("__p0").as("__p"),
        posexplode(sequence(lit(0), col("n_frames") - 1))
          .as(Seq("pos", "frame_idx")))
      .select(col("id"), col("frame_idx").cast("int").as("frame_idx"),
        expr(s"substring(__p, frame_idx * $frameBytes + 1, $frameBytes)")
          .as("frame"))
    val sigs = frames.select(col("id"), col("frame_idx"),
      graft.plans.GraftFunctions.phash60(spark, col("frame")).as("ph"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("frame_idx").asc)
    sigs.withColumn("prev", lag(col("ph"), 1).over(w))
      .where(col("prev").isNotNull)
      .withColumn("hamming", expr("CAST(bit_count(ph ^ prev) AS INT)"))
      .where(col("hamming") >= minHamming)
      .select(col("id"), col("frame_idx"), col("hamming"))
  }

  /** Perceptual hashes per media row: 60-bit aHash + dHash over the
    * DECODED grayscale pixels (PPM/BMP parse real, other payloads keep
    * the byte-strip stand-in — `graft_gray_decode`), all codegen'd,
    * row-local, scan-stage ([[graft.plans.Sketches.phash60]] /
    * [[Sketches.dhash60]]). */
  def phashFeatures(media: DataFrame, idCol: String = "id",
      payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    val gray = graft.plans.GraftFunctions.grayDecode(spark, col(payloadCol))
    media.select(col(idCol).as("id"),
      graft.plans.GraftFunctions.phash60(spark, gray).as("ahash"),
      graft.plans.GraftFunctions.dhash60(spark, gray).as("dhash"))
  }

  /** Image near-duplicate pairs by perceptual hash: exact-duplicate
    * payloads collapse to one representative (gid = md5(payload))
    * BEFORE 4×15-bit banding over the aHash — the
    * [[Dedup.simhashStages]] rep-collapse discipline, so a meme
    * reposted 10⁶ times costs one banding row, never 10¹² candidate
    * pairs. Output: (id_a, id_b, hamming) for pairs sharing ≥1 band
    * with aHash hamming ≤ maxHamming, plus hamming-0 rows for every
    * exact-duplicate pair (the documented small-multiplicity
    * expansion; cluster consumers should band on gids). */
  def phashPairs(media: DataFrame, idCol: String = "id",
      payloadCol: String = "payload", maxHamming: Int = 12): DataFrame = {
    val spark = media.sparkSession
    // gid + hash over the DECODED pixels: two containers of the same
    // image dedup as exact duplicates regardless of container bytes
    val gray = graft.plans.GraftFunctions.grayDecode(spark, col(payloadCol))
    val sigs = media
      .select(col(idCol).as("id"), gray.as("__g"))
      .where(octet_length(col("__g")) > 0)
      .select(col("id"), md5(col("__g")).as("gid"),
        graft.plans.GraftFunctions.phash60(spark, col("__g"))
          .as("simhash"))
    Dedup.expandSketchPairs(Dedup.bandedSketchStages(sigs, maxHamming))
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"),
        col("hamming"))
  }

  /** Landmark audio fingerprints per track (the Shazam shape): ONE
    * native codegen'd kernel call per row in the scan stage —
    * frame energies → interior peaks → peak-pair landmarks, all exact
    * integer arithmetic ([[graft.plans.Sketches.audioFp]]). Output
    * (id, fp), fingerprints already DISTINCT per track, so the
    * retrieval join never sees within-track multiplicity. A real
    * deployment inserts the audio decoder (codec → spectral frames)
    * before this; the landmark indexing is the real thing either
    * way. */
  def audioFingerprints(media: DataFrame, idCol: String = "id",
      payloadCol: String = "payload", frameBytes: Int = 64,
      fanout: Int = 3, maxDt: Int = 8): DataFrame = {
    val spark = media.sparkSession
    // landmarks index the DECODED sample stream (container-agnostic)
    media.select(col(idCol).as("id"),
      explode(graft.plans.GraftFunctions.audioFp(spark,
        graft.plans.GraftFunctions.grayDecode(spark, col(payloadCol)),
        frameBytes, fanout, maxDt, qDiv = frameBytes * 256 / 16)).as("fp"))
  }

  /** Audio retrieval over the landmark inverted index: count shared
    * fingerprints between each query track and every corpus track,
    * keep each query's top-k by (n_shared DESC, match_id) — the
    * candidate shortlist a verification aligner would consume.
    * Fingerprints whose document frequency (over queries ∪ corpus)
    * exceeds `maxDf` are dropped before the join — the stop-word
    * discipline of dedup_ngram's posting lists: without the cap one
    * ubiquitous landmark joins Q×C rows at corpus scale. Only
    * query/corpus fingerprint postings ever shuffle. */
  def audioMatches(queries: DataFrame, corpus: DataFrame,
      idCol: String = "id", payloadCol: String = "payload", k: Int = 3,
      maxDf: Int = 50): DataFrame = {
    val qf = audioFingerprints(queries, idCol, payloadCol)
      .withColumn("__q", lit(true))
    val cf = audioFingerprints(corpus, idCol, payloadCol)
      .withColumn("__q", lit(false))
    val all = qf.unionByName(cf)
    val dfc = all.groupBy("fp").agg(count(lit(1)).as("__df"))
    val kept = all.join(dfc, "fp").where(col("__df") <= maxDf)
    val pairs = kept.where(col("__q")).select(col("fp"), col("id").as("query_id"))
      .join(kept.where(!col("__q")).select(col("fp"), col("id").as("match_id")),
        "fp")
      .groupBy("query_id", "match_id")
      .agg(count(lit(1)).as("n_shared"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("n_shared").desc, col("match_id").asc)
    pairs.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("match_id"), col("rank"), col("n_shared"))
  }

  /** FRAME-level perceptual near-dup pairs ACROSS documents — the
    * shared-footage detector: video/image payloads are sliced into
    * fixed-byte frames ([[sampleFrames]]' slicing), each frame gets a
    * 60-bit perceptual hash, and frames from DIFFERENT documents
    * within `maxHamming` band-join into candidate pairs. Same-doc
    * pairs are excluded (adjacent frames of one clip are trivially
    * similar — reuse detection cares about cross-doc matches).
    *
    * The banding unit id packs (doc, frame) into ONE long
    * (`id << 20 | frame_idx` — the dedup_ngram packing contract:
    * id < 2^43, frame_idx < 2^20, range-checked), so the whole
    * rep-collapsed [[Dedup.bandedSketchStages]] machinery applies
    * unchanged: identical frames (stills, repeated intros) collapse
    * to one banding row no matter how many documents carry them.
    *
    * @return (id_a, frame_a, id_b, frame_b, hamming), id_a < id_b. */
  def frameNearDupPairs(media: DataFrame, idCol: String = "id",
      payloadCol: String = "payload", frameBytes: Int = 256,
      maxHamming: Int = 8): DataFrame = {
    require(frameBytes > 0)
    val spark = media.sparkSession
    val frames = media
      .select(col(idCol).as("mid"),
        graft.plans.GraftFunctions.grayDecode(spark, col(payloadCol))
          .as("payload"))
      .where(octet_length(col("payload")) > 0)
      .select(col("mid"), col("payload"),
        ceil(octet_length(col("payload")) / lit(frameBytes.toDouble))
          .cast("int").as("n_frames"))
      .select(col("mid"), col("payload"),
        posexplode(sequence(lit(0), col("n_frames") - 1))
          .as(Seq("pos", "fidx")))
      .select(col("mid"), col("fidx"),
        expr(s"substring(payload, fidx * $frameBytes + 1, $frameBytes)")
          .as("frame"))
    val sigs = frames.select(
      when(col("mid").isNull || col("mid") < 0L ||
           col("mid") >= (1L << 43) || col("fidx") >= (1 << 20),
        expr("raise_error('frameNearDupPairs: id/frame_idx out of packable range')")
          .cast("long"))
        .otherwise(shiftleft(col("mid").cast("long"), 20)
          .bitwiseOR(col("fidx").cast("long"))).as("id"),
      md5(col("frame")).as("gid"),
      graft.plans.GraftFunctions.phash60(spark, col("frame")).as("simhash"))
    Dedup.expandSketchPairs(Dedup.bandedSketchStages(sigs, maxHamming))
      .where(shiftrightunsigned(col("doc_a"), 20) =!=
        shiftrightunsigned(col("doc_b"), 20))
      .select(shiftrightunsigned(col("doc_a"), 20).as("id_a"),
        col("doc_a").bitwiseAND(lit((1L << 20) - 1)).cast("int").as("frame_a"),
        shiftrightunsigned(col("doc_b"), 20).as("id_b"),
        col("doc_b").bitwiseAND(lit((1L << 20) - 1)).cast("int").as("frame_b"),
        col("hamming"))
  }

  /** Image duplicate CLUSTERS: connected components over the
    * perceptual-hash near-dup graph — "keep one per meme family"
    * rather than per-pair decisions. Same gid-level discipline as
    * [[Dedup.simhashClusters]] (exact-duplicate payloads enter CC as
    * ONE node; membership expands once at the end) via the shared
    * [[Dedup.sketchClusters]] path. Returns (doc_id, cluster_id =
    * min member id). */
  def phashClusters(media: DataFrame, idCol: String = "id",
      payloadCol: String = "payload", maxHamming: Int = 12): DataFrame = {
    val spark = media.sparkSession
    val gray = graft.plans.GraftFunctions.grayDecode(spark, col(payloadCol))
    val sigs = media
      .select(col(idCol).as("id"), gray.as("__g"))
      .where(octet_length(col("__g")) > 0)
      .select(col("id"), md5(col("__g")).as("gid"),
        graft.plans.GraftFunctions.phash60(spark, col("__g"))
          .as("simhash"))
    Dedup.sketchClusters(Dedup.bandedSketchStages(sigs, maxHamming))
  }

  // ======================================================================
  // Decode stage: REAL pure-JVM parse for PPM (P5/P6) and 24-bit BMP
  // (graft.plans.ImageCodec); the deterministic byte-fold STUB survives
  // only for containers this sandbox cannot decode (no JPEG/PNG/FFmpeg
  // libs) and is clearly bounded to that branch.
  // ======================================================================
  private[graft] def decodeOne(r: MediaRow): MediaFeatures =
    graft.plans.ImageCodec.decode(r.payload) match {
      case Some(img) =>
        // REAL pixels: width/height from the container header, 4-d
        // embedding = mean intensity per image QUADRANT (top-left,
        // top-right, bottom-left, bottom-right) — an actual spatial
        // feature a downstream similarity search can use
        val emb = new Array[Float](4)
        val cnt = new Array[Int](4)
        val (w, h) = (img.width, img.height)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val q = (if (2 * y >= h) 2 else 0) + (if (2 * x >= w) 1 else 0)
            emb(q) += (img.pixels(y * w + x) & 0xff) / 255.0f
            cnt(q) += 1
            x += 1
          }
          y += 1
        }
        var q = 0
        while (q < 4) { if (cnt(q) > 0) emb(q) /= cnt(q); q += 1 }
        MediaFeatures(r.id, r.modality, r.payload.length, w, h, emb)
      case None =>
        // STUB branch (undecodable format): deterministic byte-sum
        // folds, decoder-shaped — the honest stand-in, nothing else
        val bytes = r.payload
        val emb = new Array[Float](4)
        var i = 0
        while (i < bytes.length) {
          emb(i % 4) += (bytes(i) & 0xff) / 255.0f
          i += 1
        }
        MediaFeatures(r.id, r.modality, bytes.length, r.width, r.height, emb)
    }

  /** Batched decode/feature-extract over media rows (mapPartitions so a
    * heavier decoder's per-JVM init happens once per task, not per
    * row; ImageCodec itself is allocation-only). */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.as(Encoders.product[MediaRow]).mapPartitions { it =>
      // a JNI/FFmpeg decoder would initialize here, once per partition
      it.map(decodeOne)
    }
  }
}
