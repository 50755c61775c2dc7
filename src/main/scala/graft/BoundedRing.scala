package graft

/** Fixed-capacity ring buffer behind the bounded probe seams (CcProbe,
  * PlanVolume): keeps the newest `max` entries with O(1) eviction, so a
  * long-running serve stream with a probe left on can never grow the
  * driver (ADVICE r15) and raising a cap can never inherit an O(n)
  * shift-per-record (VERDICT r15 #8). NOT thread-safe — every caller
  * wraps access in its own `synchronized`, as both probe objects do.
  */
private[graft] final class BoundedRing[T: scala.reflect.ClassTag](max: Int) {
  require(max > 0, s"BoundedRing capacity must be positive, got $max")
  private val ring = new Array[T](max)
  private var start = 0
  private var n = 0

  /** Reset to empty AND drop references to evicted elements: the rings sit
    * on long-lived probe singletons, so a cleared 4096-tuple PlanVolume ring
    * must not pin its last window of row objects (ADVICE r16).
    */
  def clear(): Unit = {
    (ring: Any) match { // primitive-element rings (e.g. Int) retain nothing
      case refs: Array[AnyRef] => java.util.Arrays.fill(refs, 0, refs.length, null)
      case _                   => ()
    }
    start = 0; n = 0
  }

  def add(t: T): Unit =
    if (n < max) { ring((start + n) % max) = t; n += 1 }
    else { ring(start) = t; start = (start + 1) % max }

  def toSeq: Seq[T] = (0 until n).map(i => ring((start + i) % max))
}
