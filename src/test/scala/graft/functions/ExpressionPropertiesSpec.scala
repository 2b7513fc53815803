package graft.functions

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based specs for the native kernels and timestamp conversion
  * (SURVEY §5: properties for P4/P5 round-trips and the signature
  * algebra the LSH designs rely on). ScalaCheck generators sampled with
  * fixed seeds (the scalatest-scalacheck glue artifact is not in the
  * offline cache), so runs are deterministic.
  */
class ExpressionPropertiesSpec extends SparkTestBase {

  private def samples[A](g: Gen[A], n: Int = 60): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g(params, Seed(i.toLong)))
  }

  private val word: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val text: Gen[String] = Gen.choose(0, 30)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  test("word_shingles: distinct, 3-sized windows, count bounded by tokens-2") {
    samples(text).foreach { t =>
      val toks = t.split(' ').filter(_.nonEmpty)
      val sh = sparkShingles(t)
      assert(sh.distinct.length == sh.length, t)
      if (toks.length < 3) assert(sh.isEmpty, t)
      else {
        assert(sh.length <= toks.length - 2, t)
        assert(sh.forall(_.split(' ').length == 3), t)
      }
    }
  }

  test("minhash: signature of a superset is element-wise <= (min-stability)") {
    samples(Gen.zip(Gen.nonEmptyListOf(word), Gen.listOf(word)), 40).foreach {
      case (a, b) =>
        val sa = sig(a)
        val sab = sig(a ++ b)
        assert(sa.zip(sab).forall { case (x, y) => y <= x }, (a, b))
    }
  }

  test("minhash: signatures are order- and duplicate-insensitive") {
    samples(Gen.nonEmptyListOf(word), 40).foreach { ws =>
      val base = sig(ws)
      assert(sig(ws.reverse) == base, ws)
      assert(sig(ws ++ ws) == base, ws)
    }
  }

  test("rolling_hashes: O(n) rolling equals direct per-position Horner") {
    import org.apache.spark.unsafe.types.UTF8String
    // piece-wise strings so non-BMP code points (surrogate pairs) are hit
    val piece: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.oneOf("é", "ß", "中", "🎉"))
    val uni: Gen[String] = Gen.choose(0, 40)
      .flatMap(n => Gen.listOfN(n, piece).map(_.mkString))
    samples(uni, 80).foreach { s =>
      val k = 5
      val got = RollingHashes.compute(UTF8String.fromString(s), k)
      val cps = s.codePoints().toArray
      val expect = (0 to cps.length - k).map { i =>
        var h = 0L
        (0 until k).foreach(j => h = (h * 257 + cps(i + j)) % 2147483647L)
        h
      }
      assert(got.numElements() == math.max(0, cps.length - k + 1))
      assert((0 until got.numElements()).map(got.getLong) == expect, s"text=$s")
    }
  }

  test("simhash60: 60-bit range, set semantics ignore order, flip locality") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def sim(ws: Seq[String]): Long = SimHash60.compute(
      new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any]))
    samples(Gen.nonEmptyListOf(word), 40).foreach { ws =>
      val s = sim(ws)
      assert(s >= 0L && s < (1L << 60), ws) // top 4 bits always clear
      assert(sim(ws.reverse) == s, ws) // element order never matters
    }
    // single-element arrays: signature == the element's own 60-bit hash,
    // so two different words differ (md5 collision would be a miracle)
    val a = sim(Seq("alpha")); val b = sim(Seq("beta"))
    assert(a != b)
    // near-identical shingle sets land within small hamming distance:
    // overlapping majority vote flips only bits the minority disagrees on
    val base = (1 to 40).map(i => s"tok$i")
    val d = java.lang.Long.bitCount(sim(base) ^ sim(base.drop(1)))
    assert(d <= 12, s"hamming=$d for 39/40-overlap sets")
  }

  test("ms->timestamp truncates sub-second parts exactly (P5 // 1000)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val msGen = Gen.choose(1L, 4102444800000L) // up to year 2100
    val ms = samples(msGen, 50)
    val got = ms.toDF("ms")
      .select(col("ms"), graft.etl.ShiftNormalizer.msToTimestamp(col("ms")).as("ts"))
      .collect()
    got.foreach { r =>
      assert(r.getTimestamp(1).getTime == (r.getLong(0) / 1000L) * 1000L, r.getLong(0))
    }
  }

  test("cosine_sim is 1 for any nonzero vector against itself") {
    import spark.implicits._
    val vGen = Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0))
      .suchThat(_.exists(v => math.abs(v) > 1e-6))
    val vs = samples(vGen, 30)
    val rows = vs.map(v => (v, v)).toDF("a", "b")
      .select(functions.cosine_sim($"a", $"b")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("deflate_len: repetition compresses below noise; empty/null handled; SQL-callable") {
    import spark.implicits._
    // compressibility ordering — the property the quality signal relies
    // on: pure repetition ≪ natural-ish prose ≪ alphanumeric noise
    val rep = "the same phrase over and over " * 40
    val noise = samples(Gen.listOfN(rep.length, Gen.alphaNumChar).map(_.mkString), 1).head
    val rows = Seq(("rep", rep), ("noise", noise)).toDF("k", "t")
      .select($"k", functions.deflate_len($"t").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("rep") < rows("noise") / 4,
      s"repetitive text must compress far below noise: $rows")
    // interpreted eval must equal the codegen'd plan path
    import org.apache.spark.unsafe.types.UTF8String
    assert(rows("rep") == DeflateLen.compute(UTF8String.fromString(rep)))
    // empty string: a few bytes of stream framing, never negative/huge
    val empty = Seq("").toDF("t")
      .select(functions.deflate_len($"t")).head().getLong(0)
    assert(empty > 0 && empty < 16, s"empty-string deflate len: $empty")
    // null propagates (UnaryExpression default null-intolerance)
    val nul = Seq[Option[String]](None).toDF("t")
      .select(functions.deflate_len($"t")).head()
    assert(nul.isNullAt(0))
    // SQL registration path
    GraftFunctions.register(spark)
    val viaSql = spark.sql(s"SELECT deflate_len('${"ab " * 50}') AS n").head().getLong(0)
    assert(viaSql == DeflateLen.compute(UTF8String.fromString("ab " * 50)))
  }

  test("word_gram_hashes equals the HOF transform/slice/array_join formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, split}
    // pieces include doubled spaces (empty tokens), unicode, and
    // boundary lengths around n=3
    val piece: Gen[String] = Gen.oneOf(
      word, Gen.const(""), Gen.const("é中"), Gen.const("a b"))
    val texts: Seq[String] = samples(
      Gen.choose(0, 12).flatMap(k => Gen.listOfN(k, piece).map(_.mkString(" "))), 80)
    val df = texts.toDF("text")
      .withColumn("ws", split($"text", " "))
      .select(
        graft.functions.functions.word_gram_hashes($"text", 3).as("native"),
        // guarded: the HOF form ERRORS below 3 words (descending
        // sequence → slice(0)) — the old query needed a size filter the
        // kernel makes unnecessary
        expr("CASE WHEN size(ws) >= 3 THEN " +
          "transform(sequence(0, size(ws) - 3), i -> xxhash64(array_join(slice(ws, i + 1, 3), ' '))) " +
          "ELSE array() END").as("hof"),
        $"text")
    df.collect().foreach { r =>
      val native = r.getSeq[Long](0)
      // the HOF sequence(0, size-3) goes DESCENDING (and wraps) when the
      // doc has under 3 words — the kernel's contract there is simply
      // "empty", which the shipped query used to get from a size filter
      val words = r.getString(2).split(" ", -1).length
      if (words < 3) assert(native.isEmpty, r.getString(2))
      else assert(native == r.getSeq[Long](1), s"text='${r.getString(2)}'")
    }
    // SQL registration
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT word_gram_hashes('a b c d', 3) AS g")
      .head().getSeq[Long](0).length == 2)
  }

  test("winnow_fps: equals the md5-substring reference, incl. empty tokens") {
    import spark.implicits._
    def md5hex12(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.substring(0, 12)
    }
    def ref(t: String, k: Int, w: Int): Seq[String] = {
      val ws = t.split(" ", -1) // Spark split keeps trailing empties
      if (ws.length < k + w - 1) Seq.empty
      else {
        val hs = (0 to ws.length - k)
          .map(i => md5hex12(ws.slice(i, i + k).mkString(" ")))
        (0 to hs.length - w).map(j => hs.slice(j, j + w).min).distinct
      }
    }
    // words, plus occasional doubled/trailing spaces and unicode — the
    // empty-token and multi-byte paths of the byte-span hashing
    val piece: Gen[String] = Gen.oneOf(word, Gen.const(""), Gen.const("é中"))
    val t2: Gen[String] = Gen.choose(0, 24)
      .flatMap(n => Gen.listOfN(n, piece).map(_.mkString(" ")))
    samples(t2).foreach { t =>
      val got = Seq(t).toDF("text")
        .select(functions.winnow_fps($"text", 5, 4).as("f"))
        .head().getSeq[String](0)
      assert(got == ref(t, 5, 4), s"text=<$t>")
    }
  }

  test("word_blocks: equals the HOF slice reference, incl. empty tokens") {
    import spark.implicits._
    def ref(t: String, n: Int): Seq[String] = {
      val ws = t.split(" ", -1)
      (0 until ws.length / n).map(p => ws.slice(p * n, p * n + n).mkString(" "))
    }
    val piece: Gen[String] = Gen.oneOf(word, Gen.const(""), Gen.const("é中"))
    val t2: Gen[String] = Gen.choose(0, 30)
      .flatMap(k => Gen.listOfN(k, piece).map(_.mkString(" ")))
    samples(t2).foreach { t =>
      val got = Seq(t).toDF("text")
        .select(functions.word_blocks($"text", 8).as("b"))
        .head().getSeq[String](0)
      assert(got == ref(t, 8), s"text=<$t>")
    }
    // and the Spark-expression twin the kernel replaced
    samples(t2, 20).foreach { t =>
      val hof = Seq(t).toDF("text")
        .select(org.apache.spark.sql.functions.expr(
          """CASE WHEN size(split(text, ' ')) >= 8 THEN
            |  transform(sequence(0, cast(floor(size(split(text, ' ')) / 8) as int) - 1),
            |            j -> concat_ws(' ', slice(split(text, ' '), j*8+1, 8)))
            |ELSE array() END""".stripMargin).as("b"))
        .head().getSeq[String](0)
      val got = Seq(t).toDF("text")
        .select(functions.word_blocks($"text", 8).as("b"))
        .head().getSeq[String](0)
      assert(got == hof, s"text=<$t>")
    }
  }

  test("winnow_fps: registered SQL face and empty-for-short contract") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT winnow_fps('a b c d e f g h', 5, 4) AS f")
      .head().getSeq[String](0).length == 1)
    assert(spark.sql("SELECT winnow_fps('a b c', 5, 4) AS f")
      .head().getSeq[String](0).isEmpty)
  }

  // helpers run the actual Catalyst expressions through a real plan
  private def sparkShingles(t: String): Seq[String] = {
    import spark.implicits._
    Seq(t).toDF("text")
      .select(functions.word_shingles($"text", 3).as("sh"))
      .head().getSeq[String](0)
  }

  private def sig(ws: Seq[String]): Seq[Long] = {
    import spark.implicits._
    Seq(ws).toDF("sh")
      .select(functions.minhash_sig($"sh", 16).as("sig"))
      .head().getSeq[Long](0)
  }
}
