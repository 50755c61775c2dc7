package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

import graft.functions.{KmvDistinct, PortableHash}

/** Property tests for the KMV sketch's buffer algebra — the claims the
  * SURVEY table makes ("merge-order-invariant", "degenerates to the exact
  * count below k", portable estimator arithmetic) pinned at the
  * TypedImperativeAggregate level against independent references, no
  * Spark session. Values go through the same update() path production
  * uses (child eval → toString → portable md5Int8), so the reference
  * computes expected results from the HASH multiset, exactly like the
  * DuckDB oracle twin does.
  */
object KmvProperties extends Properties("graft.kmv") {

  private def agg(k: Int) = KmvDistinct(BoundReference(0, LongType, false), k)

  private def sketch(k: Int, vs: Seq[Long]): java.util.TreeSet[java.lang.Long] = {
    val a = agg(k)
    val buf = a.createAggregationBuffer()
    vs.foreach(v => a.update(buf, InternalRow(v)))
    buf
  }

  private val values: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(-1000L, 1000L))
  private val kGen: Gen[Int] = Gen.chooseNum(2, 12)

  property("merge is order- and partitioning-invariant") =
    forAll(kGen, values, Gen.chooseNum(1, 5)) { (k, vs, parts) =>
      val a = agg(k)
      val sequential = sketch(k, vs)
      // split into `parts` round-robin partitions, sketch each, merge in
      // forward and reverse order — all three buffers must agree exactly
      val partitioned = vs.zipWithIndex.groupBy(_._2 % parts).values
        .map(p => sketch(k, p.map(_._1))).toList
      def mergeAll(bs: List[java.util.TreeSet[java.lang.Long]]) =
        bs.foldLeft(a.createAggregationBuffer())((acc, b) => a.merge(acc, b))
      val fwd = mergeAll(partitioned.map(b => a.deserialize(a.serialize(b))))
      val rev = mergeAll(partitioned.reverse.map(b => a.deserialize(a.serialize(b))))
      fwd == sequential && rev == sequential &&
        a.eval(fwd) == a.eval(sequential)
    }

  property("below k distinct hashes the sketch is the exact count") =
    forAll(kGen, values) { (k, vs) =>
      val hashes = vs.map(v => PortableHash.md5Int8(v.toString)).distinct
      hashes.size >= k || {
        val a = agg(k)
        a.eval(sketch(k, vs)) == hashes.size.toLong
      }
    }

  property("at or above k the eval matches the Bar-Yossef estimator on the k-th minimum") =
    forAll(kGen, values) { (k, vs) =>
      val hashes = vs.map(v => PortableHash.md5Int8(v.toString)).distinct.sorted
      hashes.size < k || {
        val a = agg(k)
        val expected =
          math.round((k - 1).toDouble * 4294967296.0 / hashes(k - 1).toDouble)
        a.eval(sketch(k, vs)) == expected
      }
    }

  property("serialize/deserialize is a buffer-identity") =
    forAll(kGen, values) { (k, vs) =>
      val a = agg(k)
      val buf = sketch(k, vs)
      a.deserialize(a.serialize(buf)) == buf
    }
}
