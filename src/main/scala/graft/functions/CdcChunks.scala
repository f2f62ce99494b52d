package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** CONTENT-DEFINED CHUNKING of a binary column — the storage-layer rung
  * of the dedup ladder (text shingles / perceptual hashes / embedding
  * cosine all detect SIMILAR content; CDC detects byte-identical
  * sub-regions across blobs, which is what a dedup-aware object store or
  * backup system actually stores once). Gear rolling hash
  * (`h = (h << 1) + gear(byte)`, boundary when `len ≥ minSize` and the
  * low `maskBits` of `h` are zero, forced at `maxSize`): boundaries
  * depend only on a sliding content window, so inserting bytes shifts
  * chunking LOCALLY — the defining CDC property a fixed-block splitter
  * lacks. Chunks carry a 64-bit FNV-1a content hash; equality joins on
  * `(hash, length)` find shared regions across blobs.
  *
  * Determinism is total: the gear table derives from splitmix64 of the
  * byte value (public constants), FNV-1a is public arithmetic, and the
  * boundary rule has no data-dependent tie — an independent driver loop
  * reproduces every boundary and hash bit-for-bit (the golden gate).
  *
  * A note on scope: CDC finds byte-level sharing in UNCOMPRESSED or
  * locally-repeating formats (BMP rasters, PCM audio, tar archives,
  * text). Compressed formats (PNG, JPEG, zstd) destroy byte equality by
  * design — chunk them for storage layout, not for cross-blob sharing.
  */
case class CdcChunks(child: org.apache.spark.sql.catalyst.expressions.Expression,
                     minSize: Int, maskBits: Int, maxSize: Int)
    extends UnaryExpression {

  require(minSize >= 1, "cdc_chunks: minSize must be >= 1")
  require(maskBits >= 1 && maskBits <= 48, "cdc_chunks: maskBits in [1, 48]")
  require(maxSize >= minSize, "cdc_chunks: maxSize must be >= minSize")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a binary column, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[Array[Byte]], minSize, maskBits, maxSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CdcChunks.compute($v, $minSize, $maskBits, $maxSize);")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(child = newChild)
}

object CdcChunks {

  /** splitmix64 — the public-domain mixer (Steele/Lea/Flood, JDK
    * SplittableRandom): the gear table is its output over byte values.
    */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** One 64-bit constant per byte value — deterministic, engine-free. */
  val gear: Array[Long] = Array.tabulate(256)(i => splitmix64(i.toLong))

  /** FNV-1a 64 over a byte range — the chunk's content hash. */
  def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Shared by interpreted eval and generated code: Gear-CDC boundaries
    * + per-chunk FNV-1a. Empty input → empty array; a blob shorter than
    * `minSize` is one chunk.
    */
  def compute(bytes: Array[Byte], minSize: Int, maskBits: Int,
              maxSize: Int): ArrayData = {
    val mask = (1L << maskBits) - 1L
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      val len = i - start + 1
      val cut = (len >= minSize && (h & mask) == 0L) || len == maxSize
      if (cut) {
        out += InternalRow(start.toLong, len.toLong, fnv1a64(bytes, start, i + 1))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length)
      out += InternalRow(start.toLong, (bytes.length - start).toLong,
        fnv1a64(bytes, start, bytes.length))
    new GenericArrayData(out.toArray[Any])
  }

  /** Column form. */
  def column(bin: Column, minSize: Int, maskBits: Int, maxSize: Int): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(bin),
      minSize, maskBits, maxSize))
}
