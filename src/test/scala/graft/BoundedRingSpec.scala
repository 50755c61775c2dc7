package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared probe-buffer primitive behind CcProbe and PlanVolume: the
  * wrap-around arithmetic is exactly the code a future "raise the cap"
  * edit would touch, so pin it directly.
  */
class BoundedRingSpec extends AnyFunSuite {

  test("keeps everything under the cap, in insertion order") {
    val r = new BoundedRing[Int](4)
    assert(r.toSeq == Seq.empty)
    Seq(1, 2, 3).foreach(r.add)
    assert(r.toSeq == Seq(1, 2, 3))
  }

  test("evicts oldest-first past the cap; order survives many wraps") {
    val r = new BoundedRing[Int](4)
    (1 to 4).foreach(r.add)
    assert(r.toSeq == Seq(1, 2, 3, 4))
    r.add(5) // evicts 1
    assert(r.toSeq == Seq(2, 3, 4, 5))
    (6 to 11).foreach(r.add) // wraps the backing array repeatedly
    assert(r.toSeq == Seq(8, 9, 10, 11))
  }

  test("clear resets to empty and the ring refills correctly") {
    val r = new BoundedRing[Int](3)
    (1 to 5).foreach(r.add)
    r.clear()
    assert(r.toSeq == Seq.empty)
    (10 to 14).foreach(r.add)
    assert(r.toSeq == Seq(12, 13, 14))
  }
}
