package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Winnow

/** Winnowing fingerprints vs a naive in-memory reimplementation on the
  * real sf0.001 fixture, plus the property the algorithm is FOR: any
  * shared substring of length ≥ GramLen + WinSize − 1 guarantees a
  * shared fingerprint (Schleimer et al., SIGMOD 2003, Theorem: every
  * window of w consecutive gram hashes contributes at least one
  * selected minimum).
  */
class WinnowSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  // --- naive reference (plain Scala): the portable md5-prefix hash,
  // every window's min, distinct set ---

  private def md5Int8(s: String): Long =
    graft.functions.PortableHash.md5Int8(s)

  private def naiveFpsP(text: String, gram: Int, win: Int): Set[Long] = {
    if (text.length < gram + win - 1) return Set.empty
    val gh = (0 to text.length - gram)
      .map(i => md5Int8(text.substring(i, i + gram)))
    gh.sliding(win).map(_.min).toSet
  }

  private def naiveFps(text: String): Set[Long] =
    naiveFpsP(text, Winnow.GramLen, Winnow.WinSize)

  private lazy val texts: Map[Long, String] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
  }

  test("fingerprints match the naive winnow on the real corpus") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val got = Winnow.fingerprints(spark, sf)
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    val want = texts.map { case (id, t) => id -> naiveFps(t) }
      .filter(_._2.nonEmpty)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, fps) => assert(fps === want(id), s"doc $id") }
  }

  test("native expression: codepoint boundaries, short strings, BMP non-ASCII") {
    def native(t: String): Set[Long] =
      graft.functions.WinnowFps.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t),
        Winnow.GramLen, Winnow.WinSize).toLongArray().toSet
    assert(native("") === Set.empty)
    assert(native("a" * (Winnow.MinLen - 1)) === Set.empty)
    assert(native("a" * Winnow.MinLen).size === 1)
    // multi-byte BMP codepoints: grams index by CODEPOINT, hash UTF-8
    // bytes — the naive model (UTF-16 substring + getBytes) agrees for
    // BMP text, so equality here proves the byte-offset walk
    val bmp = "héllo wörld 中文 grams tëst string φχψ " * 3
    assert(native(bmp) === naiveFps(bmp) && native(bmp).nonEmpty)
  }

  test("native expression == naive winnow on seeded random tie-heavy strings") {
    // tiny alphabets force repeated grams and equal window minima — the
    // deque's tie-handling and the distinct-set semantics under stress;
    // lengths sweep the no-window/one-window boundary
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ab", "abc", "abcdefgh", "aáβ中")
    for (_ <- 1 to 60; alpha <- alphabets) {
      val len = Winnow.MinLen - 2 + rnd.nextInt(120)
      val s = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      val native = graft.functions.WinnowFps.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        Winnow.GramLen, Winnow.WinSize).toLongArray().toSet
      assert(native === naiveFps(s), s"len=$len alpha=$alpha s=${s.take(40)}…")
    }
  }

  test("guarantee: a shared >= t-char substring always shares a fingerprint") {
    // two otherwise-unrelated texts sharing exactly a t = GramLen+WinSize-1
    // char span: winnowing MUST select a common fingerprint from that span
    // (mod-p sampling — dedup_substring — gives no such promise). Checked
    // across shift positions so the shared span lands in different window
    // phases on each side.
    val shared = "zqxjvkwpfy bgmhtrl".take(Winnow.MinLen)
    assert(shared.length == Winnow.MinLen)
    for (pad <- 0 until Winnow.WinSize) {
      val a = ("a" * (20 + pad)) + shared + ("b" * 17)
      val b = ("c" * 23) + shared + ("d" * (11 + pad))
      val common = naiveFps(a).intersect(naiveFps(b))
      assert(common.nonEmpty, s"pad=$pad: no shared fingerprint")
    }
  }

  test("decontam_winnow matches the naive eval-set fingerprint intersection") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val fps = texts.map { case (id, t) =>
      id -> naiveFpsP(t, Winnow.DecontamGramLen, Winnow.DecontamWinSize) }
    val evalFps = fps.filter(_._1 % 20 == 0).values.flatten.toSet
    val want = texts.keys.filter(_ % 20 != 0).map { id =>
      id -> fps(id).count(evalFps).toLong
    }.toMap
    val got = Winnow.queries("decontam_winnow")(spark, sf)
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, n, c) => assert(c === (n >= 1), s"doc $id"); id -> n }.toMap
    assert(got === want)
    // meaningful on the fixture: some contamination found, most docs clean
    val flagged = got.values.count(_ >= 1)
    assert(flagged >= 1 && flagged < got.size / 2,
      s"flagged $flagged of ${got.size} — signal drowned or vacuous")
  }

  test("dedup_winnow_pairs matches the naive capped pair count") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val fps = texts.map { case (id, t) => id -> naiveFps(t) }
      .filter(_._2.nonEmpty)
    val df = fps.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).map { case (fp, xs) => fp -> xs.size }
    val kept = fps.map { case (id, s) =>
      id -> s.filter(fp => df(fp) <= Winnow.DfCap) }
    val ids = kept.keys.toSeq.sorted
    val want = (for {
      i <- ids; j <- ids if i < j
      n = kept(i).intersect(kept(j)).size if n >= Winnow.MinShared
    } yield (i, j) -> n.toLong).toMap
    val got = Winnow.queries("dedup_winnow_pairs")(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(got === want)
    // non-vacuous on the fixture: the planted near-dups must surface
    assert(got.nonEmpty, "no winnow pairs found on the fixture corpus")
  }
}
