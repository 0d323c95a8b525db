package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.C12-C14): media payloads
  * are opaque `binary` columns with typed metadata; decode/feature
  * extraction is batched per partition.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (`fakeDecode`) — it derives
  * "features" from the raw bytes. Everything around it — binary
  * schema, partition-batched iteration, metadata struct, frame
  * sampling — is the real Spark plumbing a codec-backed decoder would
  * plug into (swap `fakeDecode` for the JNI/Pandas-UDF call).
  */
object MultimodalOps {

  type QFn = (SparkSession, String) => DataFrame

  /** The test corpus carries no real media, so we materialize a binary
    * payload from the document text and assign a media kind
    * round-robin. At 100 TB the payload column comes straight from
    * parquet and this projection disappears.
    */
  /** Codepoints of `text` in Spark's length()/substring() units (one
    * slot per codepoint, surrogate pairs collapse to one) — the array
    * the dHash / VAD kernels index the way the declarative
    * `ascii(substring(text, j, 1))` chain does.
    */
  private def codepoints(text: String): Array[Int] = {
    val n = text.codePointCount(0, text.length)
    val cps = new Array[Int](n)
    var i = 0
    var k = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      cps(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    cps
  }

  /** 63-bit dHash over the 64-cell proportional grid — bit-identical
    * to the declarative transform/aggregate chain it replaced (r17:
    * the interpreted HOFs allocated one UTF8String per CHARACTER via
    * ascii(substring(text, j, 1)); ProfJobs measured the signature
    * stage at ~10 CPU-seconds at sf0.1 for work that is one linear
    * byte scan). Exact int64 cross-multiplied comparisons, no
    * division — the same bits both engines compute.
    */
  private[multimodal] def phash64(text: String): Long = {
    val cps = codepoints(text)
    val L = cps.length.toLong
    var ph = 0L
    var prevS = 0L
    var prevW = 0L
    var b = 0
    while (b < 64) {
      val from = (b * L / 64).toInt
      val until = ((b + 1) * L / 64).toInt
      var acc = 0L
      var j = from
      while (j < until) { acc += cps(j); j += 1 }
      val w = (until - from).toLong
      if (b > 0 && prevS * w > acc * prevW) ph |= (1L << (b - 1))
      prevS = acc
      prevW = w
      b += 1
    }
    ph
  }

  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("byte_len", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("hist", ArrayType(LongType)),
    StructField("n_frames", IntegerType)))

  final case class MediaFeatures(
      byteLen: Int, meanByte: Double, hist: Seq[Long], nFrames: Int)

  /** Pluggable decoder contract. One instance serves a whole PARTITION:
    * `open()` runs once before the first row (init the heavy codec
    * library there), `decode` streams rows, `close()` runs after the
    * last. Swap implementations — a JNI/FFI codec, a Pandas-UDF
    * bridge, the in-container StubCodec — without touching the
    * surrounding plumbing.
    */
  trait MediaCodec extends Serializable {
    def open(): Unit = ()
    def decode(kind: String, payload: Array[Byte]): MediaFeatures
    def close(): Unit = ()
  }

  /** DETERMINISTIC STUB codec: real decoders (JPEG/PCM/H264) are not
    * in this container; features are byte statistics. Everything
    * around it is the real partition-batched plumbing.
    */
  object StubCodec extends MediaCodec {
    def decode(kind: String, bytes: Array[Byte]): MediaFeatures = {
      val hist = new Array[Long](4)
      var sum = 0L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b
        hist(b / 64) += 1
        i += 1
      }
      val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
      val nFrames = if (kind == "video") bytes.length / 100 + 1 else 1
      MediaFeatures(bytes.length, mean, hist.toSeq, nFrames)
    }
  }

  /** Partition-batched decode through any MediaCodec. */
  def decode(media: DataFrame, codec: MediaCodec): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "kind", "payload").rdd.mapPartitions { it =>
      codec.open()
      new Iterator[Row] {
        def hasNext: Boolean = { val h = it.hasNext; if (!h) codec.close(); h }
        def next(): Row = {
          val r = it.next()
          val kind = r.getString(1)
          val f = codec.decode(kind, r.getAs[Array[Byte]](2))
          Row(r.getLong(0), kind, f.byteLen, f.meanByte, f.hist, f.nFrames)
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** The stub-backed decode (kept as the named entry point). */
  def fakeDecode(media: DataFrame): DataFrame = decode(media, StubCodec)

  val entries: Seq[(String, QFn, Option[String])] = Seq(

    // C12: binary column + typed metadata extraction (pure Columns).
    ("mm_binary_meta", (s: SparkSession, d: String) => {
      val media = asMedia(graft.Tables.documents(s, d))
      val h = md5(col("payload"))
      media.select(
        col("doc_id"), col("kind"),
        length(col("payload")).as("byte_len"),
        sha2(col("payload"), 256).as("sha"),
        (conv(substring(h, 1, 4), 16, 10).cast("int") % 240 + 16).as("width"),
        (conv(substring(h, 5, 4), 16, 10).cast("int") % 240 + 16).as("height"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
             sha256(text) AS sha,
             CAST(CAST('0x' || substr(md5(text), 1, 4) AS INTEGER) % 240 AS INTEGER) + 16 AS width,
             CAST(CAST('0x' || substr(md5(text), 5, 4) AS INTEGER) % 240 AS INTEGER) + 16 AS height
      FROM documents ORDER BY doc_id""")),

    // C12b: media shard manifest — pack media files whole into
    // byte-budget preprocessing shards (what a distributed decode
    // fleet consumes: each worker takes one shard, bounded memory).
    // The SAME spec'd greedy kernel as tx_seqpack (TextOps.packGreedy)
    // over (kind-shard, doc_id, byte_len); the recursive-CTE oracle
    // replays the loop per kind. Budget 8 KB ≈ tens of files per
    // shard at this corpus's payload sizes.
    ("mm_shard_manifest", (s: SparkSession, d: String) => {
      import s.implicits._
      // null payloads are NOT files (the null-doc universe contract,
      // SURVEY §3): without the filter the typed (Long,Long,Long)
      // decode asserts on the NULL byte length — found by the r16
      // adversarial media corpus
      val media = asMedia(graft.Tables.documents(s, d))
        .select((col("doc_id") % 3).as("shard"), col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"))
        .filter(col("n_bytes").isNotNull)
      media.as[(Long, Long, Long)]
        .repartition(col("shard"))
        .sortWithinPartitions("shard", "doc_id")
        .mapPartitions(graft.text.TextOps.packGreedy(_, 8192L))
        .toDF("kind_id", "pack_id", "n_files", "pack_bytes", "first_doc", "last_doc")
        .orderBy("kind_id", "pack_id")
    }, Some("""
      WITH RECURSIVE base AS (
        SELECT doc_id, doc_id % 3 AS shard,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents WHERE text IS NOT NULL),
      ord AS (
        SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        FROM base),
      packed AS (
        SELECT shard, rn, doc_id, n_bytes, CAST(0 AS BIGINT) AS pack_id, n_bytes AS fill
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.shard, o.rn, o.doc_id, o.n_bytes,
               CASE WHEN p.fill + o.n_bytes <= 8192 THEN p.pack_id ELSE p.pack_id + 1 END,
               CASE WHEN p.fill + o.n_bytes <= 8192 THEN p.fill + o.n_bytes ELSE o.n_bytes END
        FROM packed p JOIN ord o ON o.shard = p.shard AND o.rn = p.rn + 1)
      SELECT shard AS kind_id, pack_id, count(*) AS n_files,
             CAST(sum(n_bytes) AS BIGINT) AS pack_bytes,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM packed GROUP BY shard, pack_id ORDER BY kind_id, pack_id""")),

    // C84: exact binary dedup by content hash — the first pass of any
    // multimodal ingest (the same frame re-encoded into N shards, the
    // same image mirrored across N crawl sources). Only 16-byte md5
    // hashes + a length ever shuffle (payloads stay in place — at
    // 100 TB the bytes are the corpus; moving them to count them is
    // the bug); per-kind storage report with exact-int savings ratio.
    ("mm_dedup_bytes", (s: SparkSession, d: String) => {
      val media = asMedia(graft.Tables.documents(s, d))
        .select(col("kind"), md5(col("payload")).as("h"),
          length(col("payload")).cast("long").as("n_bytes"))
      media.groupBy("kind", "h")
        // identical hash ⇒ identical bytes ⇒ identical length
        .agg(count(lit(1)).as("copies"), max("n_bytes").as("n_bytes"))
        .groupBy("kind")
        .agg(sum("copies").cast("long").as("n_payloads"),
          count(lit(1)).as("n_distinct"),
          sum(col("copies") * col("n_bytes")).cast("long").as("bytes_total"),
          sum("n_bytes").cast("long").as("bytes_distinct"))
        .withColumn("savings4", graft.text.TextOps.ratio4(
          col("bytes_total") - col("bytes_distinct"), col("bytes_total")))
        .orderBy("kind")
    }, Some("""
      WITH h AS (
        SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               md5(text) AS h, count(*) AS copies,
               max(CAST(octet_length(encode(text)) AS BIGINT)) AS n_bytes
        FROM documents GROUP BY 1, 2)
      SELECT kind, CAST(sum(copies) AS BIGINT) AS n_payloads,
             count(*) AS n_distinct,
             CAST(sum(copies * n_bytes) AS BIGINT) AS bytes_total,
             CAST(sum(n_bytes) AS BIGINT) AS bytes_distinct,
             ((20000 * (sum(copies * n_bytes) - sum(n_bytes)) + sum(copies * n_bytes))
               // (2 * sum(copies * n_bytes))) / 10000.0 AS savings4
      FROM h GROUP BY kind ORDER BY kind""")),

    // C13: partition-batched decode via the stub (rows-only oracle —
    // the stub's features are engine-side by design).
    ("mm_decode_stub", (s: SparkSession, d: String) => {
      fakeDecode(asMedia(graft.Tables.documents(s, d)))
        .select(col("doc_id"), col("kind"), col("byte_len"),
          round(col("mean_byte"), 4).as("mean_byte"),
          col("hist")(0).as("h0"), col("hist")(1).as("h1"),
          col("hist")(2).as("h2"), col("hist")(3).as("h3"),
          col("n_frames"))
        .orderBy("doc_id")
    }, None),

    // C13b: media → embedding stub: a deterministic 16-dim "embedding"
    // from payload bytes (real impl: a vision/audio encoder), then
    // nearest media neighbors via the native cosine expression — the
    // multimodal→ANN composition path (rows-only oracle).
    ("mm_embed_ann", (s: SparkSession, d: String) => {
      graft.functions.GraftFunctions.register(s)
      import s.implicits._
      // null payloads are NOT files (the null-doc universe contract,
      // SURVEY §3): unfiltered they reach the typed encoder as a null
      // Array[Byte] (NPE), and a zero-histogram embedding would rank
      // NaN-cosine above every real neighbor — r17 adversarial rows
      val emb = asMedia(graft.Tables.documents(s, d))
        .filter(col("payload").isNotNull)
        .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
        .map { case (id, bytes) =>
          // STUB encoder: byte histogram folded into 16 dims, L2-normalized
          val v = new Array[Double](16)
          var i = 0
          while (i < bytes.length) { v((bytes(i) & 0xff) % 16) += 1.0; i += 1 }
          val n = math.sqrt(v.map(x => x * x).sum)
          (id, if (n == 0) v.toSeq else v.map(_ / n).toSeq)
        }.toDF("doc_id", "emb")
      val probes = broadcast(emb.filter(col("doc_id") < 8)
        .select(col("doc_id").as("probe"), col("emb").as("pe")))
      val rk = org.apache.spark.sql.expressions.Window
        .partitionBy("probe").orderBy(col("cos").desc, col("neighbor").asc)
      probes.join(emb.select(col("doc_id").as("neighbor"), col("emb").as("ne")),
          col("probe") =!= col("neighbor"))
        .selectExpr("probe", "neighbor", "cosine_sim(pe, ne) AS cos")
        .withColumn("rk", row_number().over(rk))
        .filter(col("rk") <= 5)
        .select(col("probe"), col("rk"), col("neighbor"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("probe", "rk")
    }, None),

    // C14: frame sampling for video payloads — every 2nd frame.
    ("mm_frame_sample", (s: SparkSession, d: String) => {
      // null payloads are NOT files (null-doc contract): previously
      // they fell out only incidentally (null n_frames → null
      // sequence → explode drops the row); the filter makes the
      // contract explicit and keeps the typed math null-free — r17
      val media = asMedia(graft.Tables.documents(s, d))
        .filter(col("kind") === "video" && col("payload").isNotNull)
        .withColumn("n_frames", (floor(length(col("payload")) / 100) + 1).cast("int"))
        .withColumn("sha", sha2(col("payload"), 256))
      media
        .select(col("doc_id"), col("sha"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(2))).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          md5(concat(col("sha"), lit(":"), col("frame_idx").cast("string"))).as("frame_sha"))
        .orderBy("doc_id", "frame_idx")
    }, Some("""
      WITH v AS (
        SELECT doc_id, sha256(text) AS sha,
               CAST(octet_length(encode(text)) // 100 + 1 AS INTEGER) AS n_frames
        FROM documents WHERE doc_id % 3 = 2 AND text IS NOT NULL)
      SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1, 2)) AS INTEGER) AS frame_idx,
             md5(sha || ':' || CAST(unnest(generate_series(0, n_frames - 1, 2)) AS VARCHAR)) AS frame_sha
      FROM v ORDER BY doc_id, frame_idx""")),

    // C51: CLIP-score pair filtering — the multimodal curation staple
    // (LAION-style): an (image, caption) pair survives only if the
    // two embeddings agree above a similarity floor. Pairing
    // construction: even vec_ids act as the image-encoder output, odd
    // vec_ids as the text-encoder output of the same pair (pair p =
    // vectors 2p, 2p+1). One equi-join on pair id co-locates each
    // pair — at corpus scale both sides come pre-bucketed by pair id
    // from the encoder jobs and the join is shuffle-free — then the
    // codegen cosine scores and the floor filters. label_match rides
    // along as the supervision-agreement signal. Threshold compares
    // the 4dp-rounded score (id-tiebreak precedent) so no raw double
    // decides a row's fate differently per engine.
    ("mm_pair_filter", (s: SparkSession, d: String) => {
      graft.functions.GraftFunctions.register(s)
      val e = graft.Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
          col("label"))
      val img = e.filter(col("vec_id") % 2 === 0)
        .select((col("vec_id") / 2).cast("long").as("pair_id"),
          col("vec_id").as("img_id"), col("v").as("iv"), col("label").as("il"))
      val txt = e.filter(col("vec_id") % 2 === 1)
        .select(floor(col("vec_id") / 2).cast("long").as("pair_id"),
          col("vec_id").as("txt_id"), col("v").as("tv"), col("label").as("tl"))
      img.join(txt, "pair_id")
        .selectExpr("pair_id", "img_id", "txt_id",
          "round(cosine_sim(iv, tv), 4) AS clip_sim", "il = tl AS label_match")
        .filter(col("clip_sim") >= 0.05)
        .orderBy("pair_id")
    }, Some("""
      WITH f AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
      n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM f GROUP BY vec_id),
      lab AS (SELECT vec_id, label FROM embeddings),
      dots AS (
        SELECT a.vec_id // 2 AS pair_id, a.vec_id AS img_id,
               b.vec_id AS txt_id, sum(a.v * b.v) AS dot
        FROM f a JOIN f b ON a.i = b.i AND b.vec_id = a.vec_id + 1
        WHERE a.vec_id % 2 = 0
        GROUP BY a.vec_id, b.vec_id),
      scored AS (
        SELECT pair_id, img_id, txt_id,
               round(dot / (na.nrm * nb.nrm), 4) AS clip_sim,
               la.label = lb.label AS label_match
        FROM dots
        JOIN n na ON na.vec_id = img_id JOIN n nb ON nb.vec_id = txt_id
        JOIN lab la ON la.vec_id = img_id JOIN lab lb ON lb.vec_id = txt_id)
      SELECT pair_id, img_id, txt_id, clip_sim, label_match
      FROM scored WHERE clip_sim >= 0.05 ORDER BY pair_id""")),

    // C66: container-format sniffing by magic bytes — the first gate
    // of any media ingest (the uploader's claimed MIME type is
    // untrusted; the bytes are). The corpus carries no real media, so
    // REAL magic headers are planted per kind (JPEG FF D8 FF E0,
    // RIFF/WAVE, ISO-BMFF ftyp box) with every 7th doc left raw to
    // exercise the unknown branch — the SNIFFER sees only bytes.
    // Detection is a prefix test over hex(payload) (both engines hex
    // identically), so the same CASE runs cross-engine byte-for-byte;
    // map-only single scan at any scale.
    ("mm_mime_sniff", (s: SparkSession, d: String) => {
      val media = asMedia(graft.Tables.documents(s, d))
      val jpeg = lit(Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte))
      val wav = lit(("RIFF" + "\u0000" * 4 + "WAVE").getBytes("ISO-8859-1"))
      val mp4 = lit((new String(Array[Char](0, 0, 0, 0x18)) + "ftypisom").getBytes("ISO-8859-1"))
      val framed = media.select(col("doc_id"), col("kind"),
        when(col("doc_id") % 7 === 0, col("payload"))
          .when(col("kind") === "image", concat(jpeg, col("payload")))
          .when(col("kind") === "audio", concat(wav, col("payload")))
          .otherwise(concat(mp4, col("payload"))).as("payload"))
      val h = hex(col("payload"))
      framed.select(col("doc_id"), col("kind"),
        when(substring(h, 1, 6) === "FFD8FF", "image/jpeg")
          .when(substring(h, 1, 8) === "89504E47", "image/png")
          .when(substring(h, 1, 8) === "47494638", "image/gif")
          .when(substring(h, 1, 8) === "52494646" &&
            substring(h, 17, 8) === "57415645", "audio/wav")
          .when(substring(h, 9, 8) === "66747970", "video/mp4")
          .otherwise("application/octet-stream").as("detected"))
        .orderBy("doc_id")
    }, Some("""
      WITH media AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               encode(text) AS payload
        FROM documents),
      framed AS (
        SELECT doc_id, kind,
               CASE WHEN doc_id % 7 = 0 THEN payload
                    WHEN kind = 'image' THEN '\xFF\xD8\xFF\xE0'::BLOB || payload
                    WHEN kind = 'audio' THEN 'RIFF'::BLOB || '\x00\x00\x00\x00'::BLOB || 'WAVE'::BLOB || payload
                    ELSE '\x00\x00\x00\x18'::BLOB || 'ftypisom'::BLOB || payload
               END AS payload
        FROM media),
      hx AS (SELECT doc_id, kind, hex(payload) AS h FROM framed)
      SELECT doc_id, kind,
             CASE WHEN substr(h, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
                  WHEN substr(h, 1, 8) = '89504E47' THEN 'image/png'
                  WHEN substr(h, 1, 8) = '47494638' THEN 'image/gif'
                  WHEN substr(h, 1, 8) = '52494646'
                       AND substr(h, 17, 8) = '57415645' THEN 'audio/wav'
                  WHEN substr(h, 9, 8) = '66747970' THEN 'video/mp4'
                  ELSE 'application/octet-stream'
             END AS detected
      FROM hx ORDER BY doc_id""")),

    // C75: resolution/aspect gate — the first metadata filter of an
    // image-training pipeline (LAION-style: drop tiny thumbnails and
    // extreme banners before paying for decode). Width/height come
    // from the same md5-derived typed-metadata stub as mm_binary_meta
    // (no codec in-container; a real pipeline reads them from EXIF /
    // the container header via the MediaCodec seam); every threshold
    // is an integer compare (aspect bound 2:1 as cross-multiplied
    // ints — no double ratio decides a boundary). Map-only single
    // scan with per-reason flags, tx_quality_gate's reporting shape.
    ("mm_res_filter", (s: SparkSession, d: String) => {
      val media = asMedia(graft.Tables.documents(s, d))
      val h = md5(col("payload"))
      media.filter(col("kind") === "image")
        .select(col("doc_id"),
          (conv(substring(h, 1, 4), 16, 10).cast("int") % 240 + 16).as("width"),
          (conv(substring(h, 5, 4), 16, 10).cast("int") % 240 + 16).as("height"))
        .withColumn("r_small", col("width") < 64 || col("height") < 64)
        .withColumn("r_aspect",
          col("width") > col("height") * 2 || col("height") > col("width") * 2)
        .withColumn("keep", !col("r_small") && !col("r_aspect"))
        .orderBy("doc_id")
    }, Some("""
      WITH m AS (
        SELECT doc_id,
               CAST(CAST('0x' || substr(md5(text), 1, 4) AS INTEGER) % 240 AS INTEGER) + 16 AS width,
               CAST(CAST('0x' || substr(md5(text), 5, 4) AS INTEGER) % 240 AS INTEGER) + 16 AS height
        FROM documents WHERE doc_id % 3 = 0)
      SELECT doc_id, width, height,
             (width < 64 OR height < 64) AS r_small,
             (width > height * 2 OR height > width * 2) AS r_aspect,
             NOT (width < 64 OR height < 64
                  OR width > height * 2 OR height > width * 2) AS keep
      FROM m ORDER BY doc_id""")),

    // C95 (r12): perceptual-hash near-dup over media payloads — the
    // LAION-style image-dedup step beyond exact byte hashing
    // (mm_dedup_bytes catches re-uploads; THIS catches re-encodes /
    // small edits). dHash shape (Krawetz's difference hash): the
    // payload "resamples" onto a fixed 64-cell grid (proportional
    // byte slices — the length-invariant resize analog), bit i =
    // mean(slice i) > mean(slice i+1) compared CROSS-MULTIPLIED in
    // exact int64 (no division anywhere), giving a 63-bit hash
    // (sign-safe in both engines). Candidates via the simhash tier's
    // machinery: 4×16-bit bands, one bucket exchange through the
    // capped native aggregate (mega-bucket guard 50), i<j pairs
    // exploded map-side with the full hash riding as the
    // collect_capped2 payload — hamming = bit_count(xor) computes off
    // the pair row, no join-back. Near-dup = hamming ≤ 6. Planted
    // one-byte edits (every 97th payload, first byte → 'z', id +
    // 10^7) perturb ONLY slice 0 ⇒ hamming ≤ 1 by construction, so
    // recall through the full band path is hash-asserted. Payloads
    // below the 64-cell grid are excluded (the mm_res_filter
    // thumbnail rule). Only (band, 16-bit key, id, hash) rows ever
    // shuffle — payload bytes never leave their scan.
    ("mm_phash_neardup", (s: SparkSession, d: String) => {
      graft.functions.GraftFunctions.register(s)
      val base = graft.Tables.documents(s, d)
        .select(col("doc_id"), col("text")).filter(length(col("text")) >= 64)
      val planted = base.filter(col("doc_id") % 97 === 0)
        .select((-col("doc_id") - 1L).as("doc_id"),
          concat(lit("z"), expr("substring(text, 2)")).as("text"))
      // r17: the signature is a typed one-scan kernel (phash64) —
      // bit-identical to the former transform/aggregate HOF chain,
      // which was interpreted per row and allocated one UTF8String
      // per character (the query's dominant CPU at every SF).
      val sigs = {
        import s.implicits._
        base.unionByName(planted)
          .as[(Long, String)]
          .mapPartitions(_.map { case (id, text) => (id, phash64(text)) })
          .toDF("doc_id", "ph")
      }
      val banded = sigs.select(col("doc_id"), col("ph"), explode(expr(
          """transform(sequence(0, 3), b ->
               struct(b AS band, shiftrightunsigned(ph, b * 16) & 65535 AS bh))""")).as("e"))
        .select(col("doc_id"), col("ph"), col("e.band").as("band"), col("e.bh").as("bh"))
      banded.groupBy("band", "bh")
        .agg(expr("collect_capped2(doc_id, ph, 50)").as("ms"))
        .filter(size(col("ms")).between(2, 50))
        .select(explode(expr(
          """flatten(transform(array_sort(ms), (x, i) ->
               transform(slice(array_sort(ms), i + 2, size(ms)), y ->
                 struct(x AS a, y AS b))))""")).as("p"))
        .select(col("p.a.k").as("a"), col("p.b.k").as("b"),
          bit_count(col("p.a.v").bitwiseXOR(col("p.b.v"))).cast("int").as("hamming"))
        .filter(col("hamming") <= 6)
        .distinct()
        .withColumn("planted", col("a") + col("b") === -1L)
        .orderBy("a", "b")
    }, Some("""
      WITH c0 AS (SELECT doc_id, text FROM documents WHERE length(text) >= 64),
      c AS (
        SELECT doc_id, text FROM c0
        UNION ALL
        SELECT -doc_id - 1, 'z' || substr(text, 2) FROM c0 WHERE doc_id % 97 = 0),
      sl AS (
        SELECT doc_id,
          list_transform(generate_series(0, 63), i ->
            CAST(coalesce(list_sum(list_transform(
              generate_series(CAST(i * length(text) // 64 AS INT) + 1,
                              CAST((i + 1) * length(text) // 64 AS INT)),
              j -> ascii(substr(text, j, 1)))), 0) AS BIGINT)) AS ss,
          list_transform(generate_series(0, 63), i ->
            CAST((i + 1) * length(text) // 64 - i * length(text) // 64 AS BIGINT)) AS ln
        FROM c),
      ph AS (
        SELECT doc_id,
          CAST(coalesce(list_sum(list_transform(generate_series(0, 62), i ->
            CASE WHEN ss[i + 1] * ln[i + 2] > ss[i + 2] * ln[i + 1]
                 THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS ph
        FROM sl),
      banded AS (
        SELECT doc_id, ph, b, (ph >> (b * 16)) & 65535 AS bh
        FROM ph, unnest(generate_series(0, 3)) AS t(b)),
      buckets AS (
        SELECT band_count.b, band_count.bh
        FROM (SELECT b, bh, count(*) AS n FROM banded GROUP BY b, bh) band_count
        WHERE n BETWEEN 2 AND 50),
      pairs AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
               CAST(bit_count(xor(x.ph, y.ph)) AS INTEGER) AS hamming
        FROM banded x
        JOIN banded y ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id
        JOIN buckets k ON k.b = x.b AND k.bh = x.bh)
      SELECT a, b, hamming, (a + b = -1) AS planted
      FROM pairs WHERE hamming <= 6 ORDER BY a, b""")),

    // C101 (r12): voice-activity segmentation over audio payloads —
    // the silence-trim / speech-extract pass of an audio ingest
    // pipeline (what WebRTC-VAD does per 10 ms frame, here per
    // 16-byte frame of the stub payload): a frame is ACTIVE when its
    // energy beats the doc's mean frame energy, compared
    // CROSS-MULTIPLIED in exact int64 (fr_i·nf > total — no division);
    // consecutive active frames merge into segments via an in-row
    // struct fold (segment count, current run, longest run in one
    // pass). Entirely map-only: one corpus scan, per-row HOFs, no
    // shuffle at any corpus size — the island-trick window the oracle
    // uses exists only in the SQL replay. Frames are the payload's
    // FULL 16-byte windows (the trailing partial frame is out of
    // scope, like the phash grid rule); docs below one frame drop.
    ("mm_vad_segments", (s: SparkSession, d: String) => {
      import s.implicits._
      // r17: frame energies + the segment fold run in ONE typed scan
      // (same exact int64 arithmetic as the former per-row HOF chain,
      // which was interpreted and allocated one UTF8String per
      // character). Filters stay declarative so null/short docs drop
      // before the kernel, as before.
      graft.Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 1 && length(col("text")) >= 16)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val cps = codepoints(text)
          val nf = cps.length / 16
          val fr = new Array[Long](nf)
          var total = 0L
          var i = 0
          while (i < nf) {
            var acc = 0L
            var j = i * 16
            val until = j + 16
            while (j < until) { acc += cps(j); j += 1 }
            fr(i) = acc
            total += acc
            i += 1
          }
          var nseg = 0L; var cur = 0L; var best = 0L; var nact = 0L
          i = 0
          while (i < nf) {
            if (fr(i) * nf > total) {
              if (cur == 0L) nseg += 1L
              cur += 1L
              if (cur > best) best = cur
              nact += 1L
            } else cur = 0L
            i += 1
          }
          val nfL = nf.toLong
          (id, nfL, nact, nseg, best, (nact * 20000L + nfL) / (nfL * 2L))
        })
        .toDF("doc_id", "n_frames", "n_active", "n_segments",
          "longest_run", "active_ratio4")
        .orderBy("doc_id")
    }, Some("""
      WITH a0 AS (
        SELECT doc_id, text, CAST(length(text) // 16 AS BIGINT) AS nf
        FROM documents WHERE doc_id % 3 = 1 AND length(text) >= 16),
      fr AS (
        SELECT doc_id, nf, i,
               CAST(list_sum(list_transform(generate_series(i * 16 + 1, i * 16 + 16),
                 j -> ascii(substr(text, j, 1)))) AS BIGINT) AS e
        FROM a0, unnest(generate_series(0, CAST(nf AS INT) - 1)) AS t(i)),
      tt AS (SELECT doc_id, CAST(sum(e) AS BIGINT) AS total FROM fr GROUP BY doc_id),
      act AS (
        SELECT fr.doc_id, fr.nf, fr.i, (fr.e * fr.nf > tt.total) AS a
        FROM fr JOIN tt USING (doc_id)),
      isl AS (
        SELECT doc_id, i, i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS island
        FROM act WHERE a),
      seg AS (
        SELECT doc_id, CAST(count(DISTINCT island) AS BIGINT) AS n_segments,
               CAST(max(run) AS BIGINT) AS longest_run,
               CAST(sum(run) AS BIGINT) AS n_active
        FROM (SELECT doc_id, island, count(*) AS run FROM isl GROUP BY doc_id, island)
        GROUP BY doc_id)
      SELECT a0.doc_id, a0.nf AS n_frames,
             coalesce(seg.n_active, 0) AS n_active,
             coalesce(seg.n_segments, 0) AS n_segments,
             coalesce(seg.longest_run, 0) AS longest_run,
             CAST((coalesce(seg.n_active, 0) * 20000 + a0.nf) // (a0.nf * 2) AS BIGINT) AS active_ratio4
      FROM a0 LEFT JOIN seg USING (doc_id)
      ORDER BY a0.doc_id""")),

    // C103 (r12): composed media-ingest gate report — the pre-decode
    // admission funnel in ONE plan (what C46 is for text): per
    // claimed kind, file/byte volume, exact duplicate files (md5
    // first-seer — the mm_dedup_bytes tier), magic-byte rejections
    // (the mm_mime_sniff tier: claimed kind is untrusted, bytes
    // aren't), and the files that actually proceed to the decode
    // fleet = first-occurrence AND known-magic. Composition adds no
    // shuffles beyond its parts: one scan, one 16-byte-fingerprint
    // window, one |kinds|-row groupBy — payloads never move.
    ("pipeline_media_ingest", (s: SparkSession, d: String) => {
      val media = asMedia(graft.Tables.documents(s, d))
      val jpeg = lit(Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte))
      val wav = lit(("RIFF" + "\u0000" * 4 + "WAVE").getBytes("ISO-8859-1"))
      val mp4 = lit((new String(Array[Char](0, 0, 0, 0x18)) + "ftypisom").getBytes("ISO-8859-1"))
      val framed = media.select(col("doc_id"), col("kind"),
        when(col("doc_id") % 7 === 0, col("payload"))
          .when(col("kind") === "image", concat(jpeg, col("payload")))
          .when(col("kind") === "audio", concat(wav, col("payload")))
          .otherwise(concat(mp4, col("payload"))).as("payload"))
      val h = hex(col("payload"))
      val known = substring(h, 1, 6) === "FFD8FF" ||
        substring(h, 1, 8) === "89504E47" ||
        substring(h, 1, 8) === "47494638" ||
        (substring(h, 1, 8) === "52494646" && substring(h, 17, 8) === "57415645") ||
        substring(h, 9, 8) === "66747970"
      framed
        .withColumn("nb", length(col("payload")).cast("long"))
        .withColumn("fp", md5(hex(col("payload"))))
        .withColumn("first", col("doc_id") ===
          min("doc_id").over(Window.partitionBy("fp")))
        .withColumn("known", known)
        .groupBy("kind")
        .agg(count(lit(1)).as("n_files"),
          sum("nb").as("n_bytes"),
          sum(when(!col("first"), 1L).otherwise(0L)).as("n_dup_files"),
          sum(when(!col("first"), col("nb")).otherwise(0L)).as("dup_bytes"),
          sum(when(!col("known"), 1L).otherwise(0L)).as("n_bad_magic"),
          sum(when(col("first") && col("known"), 1L).otherwise(0L)).as("n_decode"))
        .orderBy("kind")
    }, Some("""
      WITH media AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               encode(text) AS payload
        FROM documents),
      framed AS (
        SELECT doc_id, kind,
               CASE WHEN doc_id % 7 = 0 THEN payload
                    WHEN kind = 'image' THEN '\xFF\xD8\xFF\xE0'::BLOB || payload
                    WHEN kind = 'audio' THEN 'RIFF'::BLOB || '\x00\x00\x00\x00'::BLOB || 'WAVE'::BLOB || payload
                    ELSE '\x00\x00\x00\x18'::BLOB || 'ftypisom'::BLOB || payload
               END AS payload
        FROM media),
      x AS (
        SELECT doc_id, kind, payload, hex(payload) AS h,
               CAST(octet_length(payload) AS BIGINT) AS nb,
               md5(hex(payload)) AS fp
        FROM framed),
      y AS (
        SELECT kind, nb,
               doc_id = min(doc_id) OVER (PARTITION BY fp) AS fst,
               (substr(h, 1, 6) = 'FFD8FF'
                OR substr(h, 1, 8) = '89504E47'
                OR substr(h, 1, 8) = '47494638'
                OR (substr(h, 1, 8) = '52494646' AND substr(h, 17, 8) = '57415645')
                OR substr(h, 9, 8) = '66747970') AS known
        FROM x)
      SELECT kind, CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(nb) AS BIGINT) AS n_bytes,
             CAST(sum(CASE WHEN NOT fst THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_files,
             CAST(sum(CASE WHEN NOT fst THEN nb ELSE 0 END) AS BIGINT) AS dup_bytes,
             CAST(sum(CASE WHEN NOT known THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_magic,
             CAST(sum(CASE WHEN fst AND known THEN 1 ELSE 0 END) AS BIGINT) AS n_decode
      FROM y GROUP BY kind ORDER BY kind"""))
  )
}
