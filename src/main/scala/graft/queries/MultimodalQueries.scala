package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.t

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata. The real decode (image/audio libs) is stubbed with a
  * deterministic fake; the Spark-side plumbing — binary columns, schema,
  * batched partition-level processing, partitioning — is real and
  * oracle-checked where SQL-expressible.
  */
object MultimodalQueries {

  /** Binary ingestion + metadata extraction: text→utf8 bytes standing in
    * for a media blob; byte length, content digest, magic-header hex,
    * and a fake "feature" decoded from the header — all computable by
    * the oracle, proving the binary plumbing (encode/substr/hex/digest)
    * is byte-exact.
    */
  val binaryMeta = Q(
    "mm_binary_meta",
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  sha256(text) AS digest,
      |  lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
      |  ('0x' || lower(hex(encode(substr(text, 1, 4)))))::BIGINT AS fake_feature
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val bin = expr("encode(text, 'utf-8')")
    // Oracle slices the VARCHAR then encodes (DuckDB can't substr a
    // BLOB) — byte-identical because the corpus is ASCII.
    t(s, dir, "documents")
      .select(col("doc_id"),
        length(bin).cast(LongType).as("n_bytes"),
        sha2(bin, 256).as("digest"),
        lower(hex(substring(bin, 1, 4))).as("header_hex"),
        conv(hex(substring(bin, 1, 4)), 16, 10).cast(LongType)
          .as("fake_feature"))
      .orderBy("doc_id")
  }

  /** Batched partition-level decode — the Scala analog of a pandas-UDF
    * `mapInPandas` stage: rows flow through `mapPartitions` in batches,
    * the "decoder" (STUB: deterministic byte-sum features over the blob)
    * is called once per row inside the partition iterator, and the
    * output schema is declared up front. Swapping the stub for a real
    * image/audio codec changes only `decodeStub`. The stub's features
    * ARE relational for an ASCII corpus (byte-sum = Σ ascii codes,
    * header = big-endian first-4-bytes int), so DuckDB re-derives them
    * and the partition-iterator contract gets a full hash gate, not a
    * rows-only check.
    */
  val decodeBatch = Q(
    "mm_decode_batch",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  CAST(list_sum(list_transform(string_split(text, ''),
      |    c -> ascii(c))) AS BIGINT) AS feat_sum,
      |  CAST(CASE WHEN length(text) = 0 THEN 0
      |    ELSE CAST('0x' || lower(hex(encode(substr(text, 1, 4))))
      |      AS BIGINT) END AS BIGINT) AS feat_head
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), expr("encode(text, 'utf-8')").as("blob"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("feat_sum", LongType, nullable = false),
      StructField("feat_head", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    docs.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val blob = r.getAs[Array[Byte]](1)
        val (sum, head) = Multimodal.decodeStub(blob)
        Row(id, blob.length, sum, head)
      }
    }(enc).orderBy("doc_id").toDF()
  }

  /** Frame sampling — the video-pipeline shape: the blob splits into
    * fixed 16-byte "frames", every 4th frame is sampled (stride
    * sampling, the cheap first pass before any real decode), and each
    * sampled frame emits its digest + a stub feature. One explode per
    * doc, frame math is pure projection; a real codec replaces the
    *16-byte fake framing, nothing else. Spark's INCLUSIVE
    * sequence(0, nf−1, 4) and DuckDB's EXCLUSIVE range(0, nf, 4)
    * generate the same index set for nf ≥ 1.
    */
  val frameSample = Q(
    "mm_frame_sample",
    """WITH f AS (SELECT doc_id, text,
      |    CAST(floor(length(text)/16) AS BIGINT) AS nf FROM documents),
      |g AS (SELECT doc_id, text, unnest(range(0, nf, 4)) AS idx
      |  FROM f WHERE nf >= 1),
      |fr AS (SELECT doc_id, idx,
      |    substr(text, CAST(idx*16+1 AS INT), 16) AS frame FROM g)
      |SELECT doc_id, idx, md5(frame) AS frame_md5,
      |  CAST(list_sum(list_transform(string_split(frame, ''),
      |    c -> ascii(c))) AS BIGINT) AS frame_sum
      |FROM fr ORDER BY doc_id, idx""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        floor(length(col("text")) / 16).cast(LongType).as("nf"))
      .where(col("nf") >= 1)
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0L, nf - 1, 4L)")).as("idx"))
      .select(col("doc_id"), col("idx"),
        expr("substring(text, cast(idx*16+1 as int), 16)").as("frame"))
      .select(col("doc_id"), col("idx"), md5(col("frame")).as("frame_md5"),
        expr("aggregate(transform(split(frame, ''), c -> ascii(c)), 0L, (a, c) -> a + c)")
          .as("frame_sum"))
      .orderBy("doc_id", "idx")
  }

  val all: Seq[Q] = Seq(binaryMeta, decodeBatch, frameSample)
}

/** The pluggable decode seam for multimodal blobs. */
object Multimodal {
  /** STUB standing in for an image/audio decoder (codecs are not in
    * this container): deterministic features = (sum of unsigned bytes,
    * big-endian first-4-bytes int). Replace with a real codec without
    * touching the dataflow.
    */
  def decodeStub(blob: Array[Byte]): (Long, Long) = {
    var sum = 0L
    var i = 0
    while (i < blob.length) { sum += blob(i) & 0xff; i += 1 }
    var head = 0L
    var j = 0
    while (j < math.min(4, blob.length)) {
      head = (head << 8) | (blob(j) & 0xff); j += 1
    }
    (sum, head)
  }
}
