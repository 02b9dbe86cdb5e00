package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata structs, processed per-partition in batches.
  *
  * The Spark-side machinery here is real — schemas, batch iteration,
  * partition sizing, null handling — while the media codecs themselves are
  * STUBBED (this container has no image/audio libraries): [[StubCodec]] is a
  * deterministic fake that "decodes" a header from the first bytes. Swapping
  * in a real codec is a one-function change; nothing else moves.
  *
  * Scale notes: binary payloads dominate row size, so operators here
  *  - never shuffle the binary column (metadata is derived in a projection,
  *    feature extraction is mapPartitions — both narrow);
  *  - control partition granularity by bytes not rows
  *    (`repartitionForPayload`): 100 MB of 1 MB images is 100 rows/task.
  */
object Multimodal {

  /** Decoded-media metadata produced by the (stubbed) codec. */
  case class MediaMeta(width: Int, height: Int, channels: Int, format: String)

  /** Deterministic fake codec: derives pseudo-metadata from payload bytes.
    * Real implementation would parse actual container headers here.
    */
  object StubCodec {
    def decodeMeta(payload: Array[Byte]): MediaMeta = {
      if (payload == null || payload.length == 0) MediaMeta(0, 0, 0, "empty")
      else {
        val b0 = java.lang.Byte.toUnsignedInt(payload(0))
        val b1 = if (payload.length > 1) java.lang.Byte.toUnsignedInt(payload(1)) else 0
        MediaMeta(width = 16 + b0 % 241, height = 16 + b1 % 241,
          channels = 1 + b0 % 3, format = if (b0 % 2 == 0) "fake/png" else "fake/jpg")
      }
    }

    /** Fake feature vector: deterministic 8-dim float signature of payload
      * chunks (a real extractor would run the model here, batched).
      */
    def extractFeatures(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload != null) {
        var i = 0
        while (i < payload.length) {
          out(i % dim) += payload(i).toInt
          i += 1
        }
        var d = 0
        while (d < dim) { out(d) = out(d) / math.max(1, payload.length); d += 1 }
      }
      out
    }

    /** Difference-hash (dHash) bands: the classic perceptual image hash —
      * resize to a tiny luma grid, emit one bit per adjacent-cell
      * brightness comparison — expressed through the stub boundary: the
      * payload splits into 65 equal byte-chunks (the "grid"), each chunk's
      * mean byte value stands in for cell luma, and bit d is 1 iff chunk d
      * is brighter than chunk d+1. The comparison is the integer
      * cross-multiplication sum_d·n_{d+1} > sum_{d+1}·n_d, so truncated
      * and even empty chunks (payloads shorter than 65 bytes) are exact —
      * no float means. The 64 bits come back as 4×16-bit band values,
      * ready for pigeonhole banding (Hamming ≤ 3 ⇒ ≥ 1 equal band).
      */
    def dHashBands(payload: Array[Byte]): Seq[Int] = {
      val cells = 65
      val len = if (payload == null) 0 else payload.length
      val sums = new Array[Long](cells)
      val ns = new Array[Int](cells)
      var c = 0
      while (c < cells) {
        val a = (c.toLong * len / cells).toInt
        val b = ((c + 1).toLong * len / cells).toInt
        var s = 0L
        var j = a
        while (j < b) { s += java.lang.Byte.toUnsignedInt(payload(j)); j += 1 }
        sums(c) = s
        ns(c) = b - a
        c += 1
      }
      (0 until 4).map { band =>
        var v = 0
        var o = 0
        while (o < 16) {
          val d = band * 16 + o
          if (sums(d) * ns(d + 1) > sums(d + 1) * ns(d)) v |= (1 << o)
          o += 1
        }
        v
      }
    }

    /** Fake frame sampling: byte-ranges standing in for video frames. */
    def sampleFrames(payload: Array[Byte], every: Int): Seq[Array[Byte]] = {
      if (payload == null || payload.length == 0) Seq.empty
      else payload.grouped(math.max(1, payload.length / every)).take(every).toSeq
    }

    /** Overlapping analysis windows with per-window "energy" (sum of
      * unsigned byte values) — the audio-DSP stand-in: a real codec would
      * decode PCM and compute RMS per frame here; the windowing
      * arithmetic, overlap handling, and per-window reduction are the
      * Spark-relevant parts and are real. Returns (n_bytes, energy) per
      * window, windows starting every `stride` bytes, `win` bytes long
      * (last windows truncate).
      */
    def windowEnergies(payload: Array[Byte], win: Int,
                       stride: Int): Seq[(Int, Long)] = {
      if (payload == null || payload.length == 0) Seq.empty
      else (0 until payload.length by stride).map { start =>
        val n = math.min(win, payload.length - start)
        var e = 0L
        var i = 0
        while (i < n) {
          e += java.lang.Byte.toUnsignedInt(payload(start + i)); i += 1
        }
        (n, e)
      }
    }

    /** Fake resize: stride-subsample the payload down to ≤`target` bytes
      * (byte i*k for k = len/target) — a real codec would decode, scale,
      * and re-encode here; the *shape* (bounded output per row) is what the
      * Spark plumbing depends on.
      */
    def resize(payload: Array[Byte], target: Int = 64): Array[Byte] = {
      if (payload == null || payload.length == 0) Array.emptyByteArray
      else {
        val len = payload.length
        val k = math.max(1, len / target)
        val n = math.min(target, len)
        val out = new Array[Byte](n)
        var i = 0
        while (i < n) { out(i) = payload(i * k); i += 1 }
        out
      }
    }
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Cheap metadata projection that needs no codec: byte length + md5.
    * Pure expression — stays in codegen, binary never leaves the scan task.
    */
  def binaryStats(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast("long"))
      .withColumn("digest", md5(col(binCol)))

  /** Decode metadata per row via mapPartitions — the batch boundary where a
    * real codec (or model) would run; batch shape is one partition.
    */
  def decodeMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = df.schema.add(StructField("media", metaSchema, nullable = false))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = StubCodec.decodeMeta(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq :+ Row(m.width, m.height, m.channels, m.format))
      }
    }(enc)
  }

  /** Feature extraction to an `array<float>` column — the handoff into
    * [[Similarity]] ANN search.
    */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int = 8): DataFrame = {
    val schema = df.schema.add(StructField("features",
      ArrayType(FloatType, containsNull = false), nullable = false))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val f = StubCodec.extractFeatures(r.getAs[Array[Byte]](binIdx), dim)
        Row.fromSeq(r.toSeq :+ f.toSeq)
      }
    }(enc)
  }

  /** Stub resize per row via mapPartitions — same batch boundary as
    * [[decodeMeta]]; output payload size is bounded by `target`, so the
    * resized table is safely shufflable/collectable where the raw one
    * is not.
    */
  def resizePayload(df: DataFrame, binCol: String, target: Int = 64): DataFrame = {
    val schema = df.schema.add(StructField("resized", BinaryType, nullable = false))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ StubCodec.resize(r.getAs[Array[Byte]](binIdx), target))
      }
    }(enc)
  }

  /** Frame sampling: one output row per sampled frame (video → frames). */
  def sampleFrames(df: DataFrame, binCol: String, frames: Int): DataFrame = {
    val base = StructType(df.schema.fields)
    val schema = base
      .add(StructField("frame_idx", IntegerType, nullable = false))
      .add(StructField("frame", BinaryType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        StubCodec.sampleFrames(r.getAs[Array[Byte]](binIdx), frames)
          .zipWithIndex.map { case (fr, i) => Row.fromSeq(r.toSeq :+ i :+ fr) }
      }
    }(enc)
  }

  /** Byte-aware repartition: target ~`targetMB` per task so huge payloads
    * don't starve parallelism and tiny ones don't flood the scheduler.
    */
  def repartitionForPayload(df: DataFrame, binCol: String, totalBytes: Long,
                            targetMB: Int = 128): DataFrame = {
    val parts = math.max(1L, totalBytes / (targetMB.toLong << 20)).toInt
    df.repartition(parts)
  }

  /** Overlapping energy windows per payload (audio-frame shape): one
    * output row per window via the same `mapPartitions` codec boundary as
    * [[sampleFrames]] — overlap means rows share bytes, so this must
    * explode codec-side, never by duplicating the payload column.
    * Output: input columns + (win_idx, n_bytes, energy).
    */
  def audioWindows(df: DataFrame, binCol: String, win: Int = 256,
                   stride: Int = 128): DataFrame = {
    require(win >= 1 && stride >= 1, "win and stride must be >= 1")
    val schema = StructType(df.schema.fields)
      .add(StructField("win_idx", IntegerType, nullable = false))
      .add(StructField("n_bytes", IntegerType, nullable = false))
      .add(StructField("energy", LongType, nullable = false))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        StubCodec.windowEnergies(r.getAs[Array[Byte]](binIdx), win, stride)
          .zipWithIndex.map { case ((n, e), i) =>
            Row.fromSeq(r.toSeq :+ i :+ n :+ e)
          }
      }
    }(enc)
  }

  /** Perceptual-hash signatures through the codec boundary: input columns
    * + (b0..b3), the four 16-bit dHash bands of each payload. The binary
    * column never shuffles — the hash is derived in the same narrow
    * mapPartitions pass as the other codec ops, and all downstream dedup
    * joins carry only (id, 4 ints).
    */
  def perceptualHash(df: DataFrame, binCol: String): DataFrame = {
    val schema = (0 until 4).foldLeft(StructType(df.schema.fields)) {
      (st, i) => st.add(StructField(s"b$i", IntegerType, nullable = false))
    }
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq ++ StubCodec.dHashBands(r.getAs[Array[Byte]](binIdx)))
      }
    }(enc)
  }

  /** Banded perceptual-hash candidate pairs, verified: (doc_i, doc_j,
    * hamming) for every payload pair within `maxHamming` bits of dHash
    * distance. Hamming ≤ 3 over a 64-bit hash split into 4×16-bit bands
    * implies ≥ 1 equal band (pigeonhole — the simhash banding argument
    * applied to media), so candidates come from a band equi-join; exact
    * popcount-of-xor then verifies. Only (id, band, 16-bit value) ever
    * shuffles — the binary column stays in its scan-side mapPartitions
    * pass. `maxHamming` must stay ≤ 3 or the pigeonhole guarantee breaks
    * (4 bands tolerate at most 3 differing bits without one band
    * matching).
    */
  def phashPairs(df: DataFrame, idCol: String, binCol: String,
                 maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-band pigeonhole covers Hamming <= 3, got $maxHamming")
    val ph = perceptualHash(
        df.select(col(idCol).as("doc_id"), col(binCol).as("payload")),
        "payload")
      .select("doc_id", "b0", "b1", "b2", "b3").cache()
    val bands = ph.select(col("doc_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
      .toDF("doc_id", "band", "bv")
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_i"), col("y.doc_id").as("doc_j"))
      .distinct()
    def sig(t: String) = ph.select(
      col("doc_id").as(s"doc_$t"), col("b0").as(s"b0_$t"),
      col("b1").as(s"b1_$t"), col("b2").as(s"b2_$t"),
      col("b3").as(s"b3_$t"))
    val ham = (0 until 4)
      .map(i => bit_count(col(s"b${i}_i").bitwiseXOR(col(s"b${i}_j"))))
      .reduce(_ + _)
    cand.join(sig("i"), Seq("doc_i")).join(sig("j"), Seq("doc_j"))
      .select(col("doc_i"), col("doc_j"), ham.as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Cluster-representative survivors of perceptual-hash dedup: the
    * [[phashPairs]] matches feed star connected components and each
    * clique keeps its min-id member (the
    * [[Dedup.dropNearDuplicates]] shape) — the output a pipeline
    * actually consumes. The distinction matters at scale: the PAIR list
    * grows with clique size squared (measured ×90,000 pairs at ×100 data
    * on the sf10 fixture, BENCH_sf10 r8), while the survivor set only
    * shrinks — so this is the same banded join cost with
    * cluster-count-sized output instead of cliques-squared. Output: the
    * input rows of the surviving payloads, unchanged.
    */
  def phashDropNear(df: DataFrame, idCol: String, binCol: String,
                    maxHamming: Int = 3): DataFrame = {
    val pairs = phashPairs(df, idCol, binCol, maxHamming)
    val losers = Graph.starConnectedComponents(pairs, "doc_i", "doc_j")
      .filter(col("node") =!= col("cluster"))
      .select(col("node").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** ViT-style patch extraction: split each payload into a `grid`×`grid`
    * sequence of contiguous byte patches (row-major), one output row per
    * patch. Unlike the codec ops above this needs no batch boundary at
    * all, so it stays a pure codegen'd projection: explode a patch-index
    * sequence + binary `substring` — no UDF, no mapPartitions, whole-stage
    * codegen end to end. Patches are `len div grid²` bytes; the trailing
    * remainder when the payload doesn't divide evenly is dropped, the same
    * contract as a ViT dropping partial patches at the image edge.
    *
    * Output: input columns + (patch_row, patch_col, patch).
    */
  def patchGrid(df: DataFrame, binCol: String, grid: Int = 2): DataFrame = {
    require(grid >= 1, s"grid must be >= 1, got $grid")
    val nPatches = grid * grid
    df.withColumn("__c",
        greatest(lit(1), floor(length(col(binCol)) / lit(nPatches)).cast("int")))
      .withColumn("__pi", explode(sequence(lit(0), lit(nPatches - 1))))
      .filter(col("__pi") * col("__c") < length(col(binCol)))
      .withColumn("patch_row", (col("__pi") / lit(grid)).cast("int"))
      .withColumn("patch_col", pmod(col("__pi"), lit(grid)).cast("int"))
      .withColumn("patch",
        col(binCol).substr(col("__pi") * col("__c") + 1, col("__c")))
      .drop("__c", "__pi")
  }
}
