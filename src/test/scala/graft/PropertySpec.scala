package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.ValidatingTransform
import graft.warehouse.Warehouse

/** Property-based invariants (SURVEY.md §5.2):
  *  - routing partition: valid + rejected = input, for ANY input
  *  - audit identity: inserted + ignored = attempted
  *  - idempotence: load ∘ load ≡ load
  *  - exact Python string parity against a direct Scala model
  */
class PropertySpec extends SparkSpec {

  /** Deterministic draws from a Gen (no scalatest bridge in the offline
    * dependency cache — sampling directly keeps the property style).
    */
  private def draws[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  import spark.implicits._

  private val rawField: Gen[String] = Gen.oneOf(
    Gen.alphaStr.map(s => s"  $s "), Gen.numStr, Gen.const("error"),
    Gen.const(""), Gen.oneOf("MADRID", " san juan", "Querétaro", "x y z"))

  private val rawRow: Gen[(String, String, String)] =
    for { n <- rawField; e <- Gen.oneOf("26", "23", "52", "error", "", " 41 "); c <- rawField }
      yield (n, e, c)

  test("routing partitions every input; reasons come from the fixed set") {
    draws(Gen.listOfN(30, rawRow), 5).filter(_.nonEmpty).foreach { rows =>
      {
        val df = rows.toDF("nombre", "edad", "ciudad")
        val r = ValidatingTransform(df, 25)
        val v = r.valid.count()
        val j = r.rejected.count()
        assert(v + j == rows.length)
        val reasons = r.rejected.select("motivo").distinct().as[String].collect().toSet
        assert(reasons.forall(m => m == "Valor None en campo requerido" ||
          m == "Edad no convertible a int" || m == "Edad < 25"))
      }
    }
  }

  test("idempotent append: attempted = inserted + ignored; re-load inserts 0") {
    draws(Gen.listOfN(20, Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.choose(25, 90))), 3)
      .filter(_.nonEmpty).foreach {
      rows =>
        {
          val wh = new Warehouse(spark, tempDir("pwh"))
          val df = rows.map { case (n, e) => (n, e, 1L) }.toDF("nombre", "edad", "ciudad_id")
          val s1 = wh.idempotentAppend("t", df, Seq("nombre", "edad", "ciudad_id"))
          assert(s1.attempted == s1.inserted + s1.ignored)
          assert(s1.inserted == rows.map(r => (r._1, r._2)).distinct.size)
          val s2 = wh.idempotentAppend("t", df, Seq("nombre", "edad", "ciudad_id"))
          assert(s2.inserted == 0 && s2.ignored == rows.length)
          assert(wh.read("t").count() == s1.inserted)
        }
    }
  }

  test("asOf matches the brute-force range-join model on random event sets") {
    import org.apache.spark.sql.functions.col
    val ev: Gen[(String, Int, Double)] = for {
      k <- Gen.oneOf("u1", "u2", "u3")
      t <- Gen.choose(0, 50)     // small domain forces ts collisions ACROSS
      v <- Gen.choose(1, 9)      // sides (left==right ts must match)
    } yield (k, t, v.toDouble)
    draws(Gen.zip(Gen.listOfN(25, ev), Gen.listOfN(25, ev)), 4).foreach {
      case (lrows, rrows) =>
        // right (k, ts) pairs deduped: asOf's match among equal-ts rights
        // is tieBreak-ordered, while the brute-force model has no order —
        // dedup makes the expectation well-defined without weakening the
        // cross-side equal-ts case under test
        val rdd = rrows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        val left = lrows.zipWithIndex
          .map { case ((k, t, _), i) => (i.toLong, k, new java.sql.Timestamp(t * 1000L)) }
        val right = rdd.map { case (k, t, v) => (k, new java.sql.Timestamp(t * 1000L), v) }
        val got = graft.operators.AsOfJoin.asOf(
            left.toDF("id", "k", "t"), right.toDF("k", "t", "v"),
            Seq("k"), "t", "t", Seq("v"))
          .select(col("id"), col("asof_v")).as[(Long, Option[Double])]
          .collect().toMap
        val want = left.map { case (id, k, t) =>
          val m = rdd.filter(r => r._1 == k && r._2 * 1000L <= t.getTime)
          id -> (if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
        }.toMap
        assert(got == want)
    }
  }

  test("py_capitalize/py_title match the Python model on arbitrary strings") {
    // direct Scala transliteration of CPython's unicodeobject.c behavior
    // for ASCII+Latin1 inputs (the fixture domain)
    def pyCap(s: String): String =
      if (s.isEmpty) s
      else s.substring(0, 1).toUpperCase + s.substring(1).toLowerCase
    def pyTitle(s: String): String = {
      val sb = new StringBuilder; var prev = false
      s.foreach { ch =>
        val cased = ch.isLetter
        sb.append(if (cased && !prev) ch.toUpper else if (cased) ch.toLower else ch)
        prev = cased
      }
      sb.toString
    }
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaChar, 2 -> Gen.oneOf(' ', '\'', '-', '1', 'é', 'Ñ'))).map(_.mkString)
    draws(Gen.listOfN(40, strGen), 5).filter(_.nonEmpty).foreach { ss =>
      {
        import org.apache.spark.sql.functions.col
        val rows = ss.toDF("x").select(
          graft.functions.py_capitalize(col("x")),
          graft.functions.py_title(col("x"))).as[(String, String)].collect()
        rows.zip(ss).foreach { case ((gotCap, gotTitle), in) =>
          assert(gotCap == pyCap(in), s"capitalize($in)")
          assert(gotTitle == pyTitle(in), s"title($in)")
        }
      }
    }
  }

  test("stratified split: partition of the corpus with exact quotas for random fractions") {
    val fracGen = for {
      a <- Gen.choose(1, 8); b <- Gen.choose(1, 8); c <- Gen.choose(1, 8)
    } yield {
      val s = (a + b + c).toDouble
      // fractions as exact ratios of small ints; the op requires sum == 1
      Seq("s1" -> (a / s), "s2" -> (b / s), "s3" -> (1.0 - a / s - b / s))
    }
    val rows = (1 to 400).map(i => (i.toLong, s"k${i % 5}"))
    val df = rows.toDF("id", "stratum")
    draws(fracGen, 4).foreach { fr =>
      val out = graft.operators.CorpusOps
        .splitStratified(df, "id", "stratum", fr)
        .as[(Long, String, String)].collect()
      assert(out.length == rows.length) // complete
      assert(out.map(_._1).distinct.length == rows.length) // one label per row
      out.groupBy(_._2).foreach { case (_, g) =>
        val n = g.length.toDouble
        val c = g.groupBy(_._3).view.mapValues(_.length).toMap.withDefaultValue(0)
        val cum1 = fr(0)._2
        val cum2 = fr(0)._2 + fr(1)._2
        assert(c("s1") == math.ceil(cum1 * n).toLong, s"$fr -> $c of $n")
        assert(c("s1") + c("s2") == math.ceil(cum2 * n).toLong, s"$fr -> $c of $n")
      }
    }
  }

  test("containment: C(a,b)=1 whenever a's token stream appears inside b, any random docs") {
    val word = Gen.choose('a', 'z').map(_.toString)
    val docGen = Gen.choose(9, 20).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    draws(Gen.zip(docGen, docGen), 6).foreach { case (short, filler) =>
      val df = Seq((1L, short), (2L, s"$filler $short"))
        .toDF("doc_id", "text")
      val out = graft.operators.Dedup
        .ngramContainment(df, "text", "doc_id", k = 8, threshold = 0.999)
        .as[(Long, Long, Double)].collect()
      // every 8-shingle of doc 1 exists in doc 2 by construction
      assert(out.exists(r => r._1 == 1L && r._2 == 2L && r._3 == 1.0),
        s"short='$short' out=${out.toSeq}")
    }
  }

  test("equi-depth buckets: sizes within one of n/b, monotone in value, for random data") {
    val values = draws(Gen.chooseNum(-1000L, 1000L), 400)
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val b = 8
    val out = graft.operators.CorpusOps.equiDepthBuckets(df, "id", "v", b)
      .select("id", "v", "bucket").as[(Long, Long, Long)].collect()
    val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0L until b).toSet)
    val (lo, hi) = (values.length / b, values.length / b + 1)
    assert(sizes.values.forall(s => s >= lo && s <= hi), sizes)
    // monotone: a row in a higher bucket never has a smaller value than
    // any row in a lower bucket (ties may straddle by (v, id) order)
    val maxPerBucket = out.groupBy(_._3).view.mapValues(_.map(_._2).max).toMap
    val minPerBucket = out.groupBy(_._3).view.mapValues(_.map(_._2).min).toMap
    (0L until b - 1).foreach(k =>
      assert(maxPerBucket(k) <= minPerBucket(k + 1), s"bucket $k straddles"))
  }

  test("interleave_bits round-trips: de-interleaving recovers both inputs") {
    val pairs = draws(Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)), 200)
    val df = pairs.toDF("a", "b")
      .select(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b"),
        graft.functions.interleave_bits(
          org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    df.foreach { case (a, b, z) =>
      var (ra, rb) = (0L, 0L)
      for (i <- 0 until 16) {
        ra |= ((z >>> (2 * i)) & 1L) << i
        rb |= ((z >>> (2 * i + 1)) & 1L) << i
      }
      assert(ra == a && rb == b, s"($a,$b) -> $z -> ($ra,$rb)")
    }
  }

  test("incremental BM25 ingest-order invariance: ANY split of ANY corpus, " +
    "ingested in EITHER order, serves the one-shot result bit for bit") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Retrieval
    // random corpora over a small shared vocabulary (tf/df/dl all vary)
    // with a random per-doc side assignment — the property quantifies
    // over the split itself, not just the two fixed splits the unit
    // specs pin
    val word = Gen.oneOf("spark", "join", "hash", "merge", "stream",
      "window", "vector", "scan", "data", "the", "of", "a")
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    val corpus = Gen.listOfN(24, Gen.zip(doc, Gen.oneOf(true, false)))
    val terms = Seq((1L, "spark"), (1L, "join"), (2L, "the"), (2L, "data"))
      .toDF("query_id", "term")
    draws(corpus, 3).foreach { rows =>
      val docs = rows.zipWithIndex
        .map { case ((t, side), i) => (i.toLong, t, side) }
        .toDF("doc_id", "text", "side").localCheckpoint(true)
      val oneShot = Retrieval.bm25TopK(docs, "text", "doc_id", terms, 10)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      def ingested(firstSide: Boolean): Seq[(Long, Long, Long, Double)] = {
        val dir = tempDir("prop_bm25")
        // an empty side is a legal draw: the build commits nothing and
        // the append becomes the first ingest
        Retrieval.buildBm25Incremental(
          docs.filter(col("side") === firstSide), "text", "doc_id", dir)
        Retrieval.appendBm25Incremental(spark, dir,
          docs.filter(col("side") =!= firstSide), "text", "doc_id")
        Retrieval.bm25TopKFromIncremental(spark, dir, terms, 10)
          .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      }
      assert(ingested(firstSide = true) == oneShot)
      assert(ingested(firstSide = false) == oneShot)
    }
  }
}
