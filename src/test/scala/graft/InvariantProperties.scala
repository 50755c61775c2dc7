package graft

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

import graft.operators.Dedup

/** Property tests for the two pure invariants the whole dedup family's
  * EXACTNESS rests on, against independent reference implementations —
  * no Spark session, so thousands of cases run in milliseconds.
  *
  *   1. The 7-band pigeonhole guarantee behind every banded join
  *      (dedup_simhash_pairs / dedup_incremental / SigStore probes /
  *      the contracted one-shot components): hamming ≤ 6 over 48 bits
  *      CANNOT touch all 7 bands, so qualifying pairs always collide on
  *      ≥ 1 (band_id, band_bits) equi-join key. The example-based specs
  *      exercise this through Spark on planted corpora; this pins the
  *      bit-level claim itself over the full signature space.
  *   2. The driver union-find fast path (path-halving union-by-min):
  *      labels must equal the distributed fixpoint's convention — min
  *      node id reachable in the undirected edge graph — for ANY edge
  *      list, including self-loop-free multigraphs with duplicate and
  *      both-orientation edges, which is exactly what the banded
  *      pipelines feed it.
  */
object InvariantProperties extends Properties("graft.invariants") {

  private val sig48: Gen[Long] =
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_ & ((1L << 48) - 1))

  /** Mirrors [[Dedup.banded7]]'s static posexplode expression:
    * shiftright(simhash, band*7) & 127.
    */
  private def bands(x: Long): Seq[Long] =
    (0 until 7).map(i => (x >> (i * 7)) & 127L)

  property("pigeonhole: any <=6-bit perturbation shares >=1 of the 7 bands") =
    forAll(sig48, Gen.chooseNum(0, 6).flatMap(k =>
        Gen.listOfN(k, Gen.chooseNum(0, 47)))) { (a, flips) =>
      // duplicate positions cancel pairwise, so hamming stays <= 6 either way
      val b = flips.foldLeft(a)((s, p) => s ^ (1L << p))
      java.lang.Long.bitCount(a ^ b) <= 6 &&
        bands(a).zip(bands(b)).exists { case (x, y) => x == y }
    }

  property("pigeonhole contrapositive: all 7 bands differing forces hamming >= 7") =
    forAll(sig48, sig48) { (a, b) =>
      val differing = bands(a).zip(bands(b)).count { case (x, y) => x != y }
      differing < 7 || java.lang.Long.bitCount(a ^ b) >= 7
    }

  private val smallGraph: Gen[(Int, List[(Long, Long)])] = for {
    n <- Gen.chooseNum(2, 40)
    m <- Gen.chooseNum(0, 80)
    es <- Gen.listOfN(m, for {
      u <- Gen.chooseNum(0, n - 1)
      v <- Gen.chooseNum(0, n - 1)
    } yield (u.toLong, v.toLong))
  } yield (n, es.filter(e => e._1 != e._2))

  property("driverFindMin == BFS min-reachable node, for any edge list") =
    forAll(smallGraph) { case (n, edges) =>
      val nodes = (0L until n.toLong).toArray
      val find = Dedup.driverFindMin(nodes, edges.toArray)
      val adj = Array.fill(n)(List.empty[Int])
      edges.foreach { case (u, v) =>
        adj(u.toInt) ::= v.toInt
        adj(v.toInt) ::= u.toInt
      }
      (0 until n).forall { s =>
        val seen = scala.collection.mutable.Set(s)
        val queue = scala.collection.mutable.Queue(s)
        while (queue.nonEmpty) {
          adj(queue.dequeue()).foreach(y => if (seen.add(y)) queue.enqueue(y))
        }
        find(s.toLong) == seen.min.toLong
      }
    }

  property("driverFindMin is orientation- and duplicate-insensitive") =
    forAll(smallGraph) { case (n, edges) =>
      val nodes = (0L until n.toLong).toArray
      val base = Dedup.driverFindMin(nodes, edges.toArray)
      val noisy = Dedup.driverFindMin(nodes,
        (edges ++ edges.map(_.swap) ++ edges).toArray)
      (0 until n).forall(s => base(s.toLong) == noisy(s.toLong))
    }
}
