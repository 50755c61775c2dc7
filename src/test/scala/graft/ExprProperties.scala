package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

import graft.functions._

/** Property tests for the custom Catalyst expressions' evaluator loops,
  * against independent straight-line reference implementations — these
  * run the `compute`/`eval` paths directly (no Spark session), so they
  * cover the exact code whole-stage codegen calls through.
  */
object ExprProperties extends Properties("graft.functions") {

  private val word = Gen.oneOf("a", "bb", "ccc", "the", "x1", "", "qq", "Ωé")
  private val text: Gen[String] = Gen.listOf(word).map(_.mkString(" "))
  private val vec: Gen[Array[Double]] =
    Gen.listOfN(8, Gen.chooseNum(-5.0, 5.0)).map(_.toArray)

  private def utf8(s: String) = UTF8String.fromString(s)

  property("WordShingles == distinct sliding 3-windows") = forAll(text) { t =>
    val words = t.split(" ", -1)
    val expected =
      if (words.length < 3) null
      else words.sliding(3).map(_.mkString(" ")).toSeq.distinct
    WordShingles(Literal(t), 3).compute(utf8(t)) match {
      case null => expected == null
      case a => expected != null &&
        a.toObjectArray(StringType).map(_.toString).toSeq == expected
    }
  }

  property("SimHash48 == per-token bit-vote recurrence") = forAll(text) { t =>
    val acc = new Array[Int](48)
    t.split(" ", -1).foreach { w =>
      val h = PortableHash.md5Int12(w)
      var b = 0
      while (b < 48) {
        if (((h >> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    (0 until 48).foreach(b => if (acc(b) > 0) sig |= (1L << b))
    SimHash48(Literal(t)).hash(utf8(t)) == sig
  }

  private def dotRef(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
    s
  }

  property("DotDouble: sequential fold, symmetric, null on length mismatch") =
    forAll(vec, vec) { (a, b) =>
      val d = DotDouble(Literal(0.0), Literal(0.0))
      val (ga, gb) = (new GenericArrayData(a), new GenericArrayData(b))
      d.nullSafeEval(ga, gb) == dotRef(a, b) &&
      d.nullSafeEval(ga, gb) == d.nullSafeEval(gb, ga) &&
      d.nullSafeEval(new GenericArrayData(a :+ 1.0), gb) == null
    }

  property("IvfTopCells == explicit (cos DESC, cell DESC) ranking") =
    forAll(vec, Gen.listOfN(4, vec)) { (v, cs) =>
      val cents = cs.toArray
      val got = IvfTopCells(Literal(0.0), cents, 2)
        .cells(new GenericArrayData(v)).toIntArray().toSeq
      val sn = math.sqrt(dotRef(v, v))
      val cos = cents.map(c => dotRef(v, c) / (sn * math.sqrt(dotRef(c, c))))
      val order = cents.indices.sortWith { (x, y) =>
        val c = java.lang.Double.compare(cos(x), cos(y))
        c > 0 || (c == 0 && x > y)
      }
      got == order.take(2).toSeq
    }

  property("RollingHash == code-point fold (incl. supplementary planes)") =
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const("😀x")))
        .map(_.mkString(" "))) { t =>
      var h = 0L
      t.codePoints().forEach(cp => h = (h * 31L + cp) % 1000000007L)
      RollingHash(Literal(t)).nullSafeEval(utf8(t)) == h
    }

  property("PortableHash.planeComponent stays in [-1, 1) and is stable") =
    forAll(Gen.chooseNum(0, 15), Gen.chooseNum(0, 63)) { (p, i) =>
      val x = PortableHash.planeComponent(p, i)
      x >= -1.0 && x < 1.0 && x == PortableHash.planeComponent(p, i)
    }
}
