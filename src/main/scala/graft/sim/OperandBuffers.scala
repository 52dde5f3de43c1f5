package graft.sim

import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Thread-local operand buffers shared by the string kernels
  * ([[JaroWinkler]], [[Levenshtein]]) — `UTF8String.getBytes`
  * allocates a fresh copy for any string that is a slice of a larger
  * page (every string read out of a columnar cache batch or an
  * UnsafeRow is), and at millions of kernel calls per task that
  * garbage throttles core-count scaling long before the ALUs do. The
  * kernels copy into these reusable buffers instead and run
  * allocation-free after warm-up.
  *
  * Sharing one instance per thread across kernels is safe because
  * each kernel call consumes its operands fully before returning and
  * no kernel calls another.
  */
private[sim] final class OperandBuffers {
  private var a: Array[Byte] = new Array[Byte](256)
  private var b: Array[Byte] = new Array[Byte](256)
  def bufA(n: Int): Array[Byte] = {
    if (a.length < n) a = new Array[Byte](n * 2); a
  }
  def bufB(n: Int): Array[Byte] = {
    if (b.length < n) b = new Array[Byte](n * 2); b
  }
  /** copy `s` into side-A/B buffer; returns the buffer (first
    * `s.numBytes()` bytes valid). */
  def copyA(s: UTF8String): Array[Byte] = {
    val buf = bufA(s.numBytes())
    s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET); buf
  }
  def copyB(s: UTF8String): Array[Byte] = {
    val buf = bufB(s.numBytes())
    s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET); buf
  }
}

private[sim] object OperandBuffers {
  val threadLocal: ThreadLocal[OperandBuffers] =
    new ThreadLocal[OperandBuffers] {
      override def initialValue(): OperandBuffers = new OperandBuffers
    }
  def isAscii(b: Array[Byte], n: Int): Boolean = {
    var i = 0
    while (i < n) { if (b(i) < 0) return false; i += 1 }
    true
  }
}
