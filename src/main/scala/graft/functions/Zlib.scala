package graft.functions

import java.util.zip.Deflater

/** Raw-deflate helper for the compression-ratio quality signal. One
  * `Deflater` per thread, `reset()` per call — allocation-free on the
  * hot path and safe under Spark's one-thread-per-task execution. The
  * compressed size for a fixed input, level and strategy is a pure
  * function of the JDK's bundled zlib, so the ratio is deterministic
  * across runs and partitionings on one JVM build; it is NOT
  * cross-engine restatable (DuckDB has no deflate), which is why the
  * full output rides a rows-only row and the hard oracle states a
  * compression INVARIANT instead (x85b). */
object Zlib {

  private val local: ThreadLocal[Deflater] = new ThreadLocal[Deflater] {
    // nowrap=true: raw deflate, no zlib header/checksum — the ratio
    // measures the DATA, not container overhead
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, true)
  }

  def compressedSize(bytes: Array[Byte]): Int = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** compressed/raw byte ratio rounded @9; callers guard empty input. */
  def ratio(bytes: Array[Byte]): Double = {
    val r = compressedSize(bytes).toDouble / bytes.length
    java.math.BigDecimal.valueOf(r)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}
