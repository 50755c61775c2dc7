package graft

/** Fixed-capacity ring buffer behind the bounded probe seams (CcProbe,
  * PlanVolume): keeps the newest `max` entries with O(1) eviction, so a
  * long-running serve stream with a probe left on can never grow the
  * driver (ADVICE r15) and raising a cap can never inherit an O(n)
  * shift-per-record (VERDICT r15 #8). NOT thread-safe — every caller
  * wraps access in its own `synchronized`, as both probe objects do.
  */
private[graft] final class BoundedRing[T: scala.reflect.ClassTag](max: Int) {
  private val ring = new Array[T](max)
  private var start = 0
  private var n = 0

  def clear(): Unit = { start = 0; n = 0 }

  def add(t: T): Unit =
    if (n < max) { ring((start + n) % max) = t; n += 1 }
    else { ring(start) = t; start = (start + 1) % max }

  def toSeq: Seq[T] = (0 until n).map(i => ring((start + i) % max))
}
