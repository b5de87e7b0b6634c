package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** LSH variants verified against their exact counterparts: the approximate
  * path may only miss pairs, never invent them, and at the test thresholds
  * on planted near-dups it must find what brute force finds.
  */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 6 docs: 0/1 near-dup (one word changed), 2/3 identical, rest unrelated
  private val docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
    (2L, "one two three four five six seven eight nine ten eleven twelve"),
    (3L, "one two three four five six seven eight nine ten eleven twelve"),
    (4L, "red orange yellow green blue indigo violet cyan magenta white black gray"),
    (5L, "spark scala catalyst tungsten parquet arrow shuffle broadcast join agg sort scan"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val r = Dedup.exact(docs, "text", "doc_id").collect()
    assert(r.length == 5) // 6 docs, one exact-dup pair
    assert(r.find(_.getLong(2) == 2L).get.getLong(1) == 2L) // keep_id = min id
  }

  test("ngram jaccard finds planted near-dups only") {
    val pairs = Dedup.ngramJaccard(docs, "text", "doc_id", k = 3, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (2L, 3L)))
  }

  test("containment catches a short doc embedded in a long one that jaccard misses") {
    val short = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val embedded = Seq(
      (0L, short),                      // 3 8-shingles, all inside doc 1
      (1L, s"$filler $short"),          // long doc containing the short one
      (2L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val cont = Dedup.ngramContainment(embedded, "text", "doc_id", k = 8,
        threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(cont == Set((0L, 1L, 1.0))) // short fully contained; NOT the reverse
    // the same pair is invisible to jaccard at any useful threshold: the
    // union is dominated by the long doc's shingles
    val jac = Dedup.ngramJaccard(embedded, "text", "doc_id", k = 8,
      threshold = 0.3).collect()
    assert(jac.isEmpty)
  }

  test("containment: direction-correct ratios on partial overlap") {
    // a: 5 shingles, b: 9 shingles, intersection 4 (one word changed at
    // the head, shared 12-token tail): C(a,b)=4/5=0.8 >= thr, C(b,a)=4/9 < thr
    val a = "x1 alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    val b = "y1 y2 y3 y4 y5 alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    val df = Seq((10L, a), (20L, b)).toDF("doc_id", "text")
    val out = Dedup.ngramContainment(df, "text", "doc_id", k = 8,
        threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((10L, 20L, 0.8)), out.toString)
  }

  test("window dedup removes repeated token windows, keeps first occurrence") {
    // W=4: doc 10 repeats its own first window; doc 11 opens with doc 10's
    // window (cross-doc repeat) then continues unique; doc 12 is a full
    // exact copy of doc 11 (all windows drop); doc 13 is short (one window)
    val d = Seq(
      (10L, "a b c d a b c d e f g h"),
      (11L, "a b c d p q r s t u v w"),
      (12L, "a b c d p q r s t u v w"),
      (13L, "x y z")).toDF("doc_id", "text")
    val r = Dedup.windowDedup(d, "text", "doc_id", windowTokens = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_windows", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    assert(r(0) == ((10L, 3L, 2L, "a b c d e f g h")))       // self-repeat dropped
    assert(r(1) == ((11L, 3L, 2L, "p q r s t u v w")))       // cross-doc repeat dropped
    assert(r(2) == ((12L, 3L, 0L, "")))                      // exact copy fully dropped
    assert(r(3) == ((13L, 1L, 1L, "x y z")))                 // short doc intact
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("span stats/mask: phase-shifted duplicated span that window tiling misses") {
    // docs 20/21 share a 10-token span at DIFFERENT offsets (3 vs 5) —
    // no 16-token tiling window repeats (each doc is one unique window),
    // but the sliding 8-gram stream sees 3 shared spans covering all 10
    // shared tokens. Docs 23/24 are identical but SHORTER than k: span
    // grain emits nothing for them (doc-grain dedup owns them).
    val span = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val d = Seq(
      (20L, s"p1 p2 p3 $span"),
      (21L, s"q1 q2 q3 q4 q5 $span"),
      (22L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"),
      (23L, "tiny little doc"),
      (24L, "tiny little doc")).toDF("doc_id", "text")
    // the tiling gap this operator exists to close: windowDedup(16) sees
    // nothing to drop on 20/21
    val w = Dedup.windowDedup(d.filter(col("doc_id") < 22L), "text", "doc_id",
        windowTokens = 16).orderBy("doc_id")
      .select("n_windows", "n_kept").as[(Long, Long)].collect()
    assert(w.forall { case (n, kept) => n == kept })
    val stats = Dedup.spanStats(d, "text", "doc_id", k = 8, minDocs = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "dup_spans", "dup_tokens", "dup_fraction")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(stats(0) == ((20L, 13L, 3L, 10L, 0.769231)))
    assert(stats(1) == ((21L, 15L, 3L, 10L, 0.666667)))
    assert(stats(2) == ((22L, 12L, 0L, 0L, 0.0)))
    assert(stats(3) == ((23L, 3L, 0L, 0L, 0.0))) // below k: no spans
    assert(stats(4) == ((24L, 3L, 0L, 0L, 0.0)))
    val mask = Dedup.spanMask(d, "text", "doc_id", k = 8, minDocs = 2)
      .orderBy("doc_id")
      .select("doc_id", "masked_tokens", "kept_tokens", "clean_hash")
      .as[(Long, Long, Long, String)].collect()
    // keeper = doc 20 (first by id): untouched; doc 21 loses the span
    assert(mask(0) == ((20L, 0L, 13L, md5hex(s"p1 p2 p3 $span"))))
    assert(mask(1) == ((21L, 10L, 5L, md5hex("q1 q2 q3 q4 q5"))))
    assert(mask(2)._2 == 0L && mask(3)._2 == 0L && mask(4)._2 == 0L)
    assert(mask(3)._4 == md5hex("tiny little doc"))
    // the corpus roll-up: 5 docs, 46 tokens, 19 spans (6+8+5+0+0), of
    // which 6 occurrences of 3 distinct cross-doc shingles, covering 20
    // tokens (10 per involved doc)
    val prof = Dedup.spanProfile(d, "text", "doc_id", k = 8, minDocs = 2)
      .as[(Long, Long, Long, Double, Long, Long, Long, Double)].head()
    assert(prof == ((5L, 19L, 6L, 0.315789, 3L, 20L, 46L, 0.434783)))
  }

  test("span mask: self-repeat of a cross-doc span masks non-keeper copies in the keeper doc too") {
    // the span appears twice in doc 30 and once in doc 31; keeper is
    // (30, 0) — doc 30's SECOND copy and doc 31's copy both mask
    val span = "a1 a2 a3 a4 a5 a6 a7 a8"
    val d = Seq(
      (30L, s"$span m1 m2 $span"),
      (31L, s"z1 z2 z3 $span"),
      (32L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10")).toDF("doc_id", "text")
    val mask = Dedup.spanMask(d, "text", "doc_id", k = 8, minDocs = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "masked_tokens", "kept_tokens", "clean_hash")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(mask(0) == ((30L, 18L, 8L, 10L, md5hex(s"$span m1 m2"))))
    assert(mask(1) == ((31L, 11L, 8L, 3L, md5hex("z1 z2 z3"))))
    assert(mask(2)._3 == 0L)
  }

  test("minhash LSH candidates cover what exact jaccard confirms") {
    val exact = Dedup.ngramJaccard(docs, "text", "doc_id", k = 3, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, "text", "doc_id", k = 3, threshold = 0.3,
      bands = 8, rowsPerBand = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // verification step guarantees no false positives; bands chosen so the
    // planted pairs (jaccard >= 0.5) are found with overwhelming probability
    assert(lsh == exact)
  }

  test("simhash: identical docs at distance 0; bound respected") {
    // The block-LSH guarantees finding every pair within hamming distance 3
    // (4 blocks of 16 bits — pigeonhole); identical docs are distance 0.
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap((2L, 3L)) == 0L)
    assert(pairs.forall(_._3 <= 3)) // no false positives past the bound
  }

  test("embedding near-dup LSH vs brute force on sf0.001") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val lsh = Dedup.embeddingNearDup(embs, "embedding", "vec_id",
      threshold = 0.35, bits = 4, tables = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force ground truth
    val e1 = embs.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val e2 = embs.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val bf = e1.join(e2, col("id_a") < col("id_b"))
      .withColumn("cos", graft.functions.cosine_similarity(col("va"), col("vb")))
      .filter(col("cos") >= 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(bf.nonEmpty)
    assert(lsh.subsetOf(bf)) // verification step: never invents pairs
    val recall = lsh.size.toDouble / bf.size
    assert(recall >= 0.4, s"recall $recall over ${bf.size} true pairs")
  }

  test("multi-probe SRP widens the candidate set: recall(probes=3) >= recall(0)") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = embs.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(embs, queries, "embedding", "vec_id", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recalls = Seq(0, 3).map { p =>
      val srp = Similarity.srpTopK(embs, queries, "embedding", "vec_id",
        k = 5, bits = 8, tables = 4, probes = p)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (bf intersect srp).size.toDouble / bf.size
    }
    assert(recalls(1) >= recalls(0), s"recalls $recalls")
    assert(recalls(1) > 0.3, s"probed recall ${recalls(1)}")
  }

  test("IVF top-k recall vs brute force for nprobe 1 and 2 on sf0.001") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = embs.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(embs, queries, "embedding", "vec_id", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recalls = Seq(1, 2).map { nprobe =>
      val ivf = Similarity.ivfTopK(embs, queries, "embedding", "vec_id",
        k = 3, nlist = 8, nprobe = nprobe)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (bf intersect ivf).size.toDouble / bf.size
    }
    // more probed cells may only widen the candidate set
    assert(recalls(1) >= recalls(0), s"recalls $recalls")
    assert(recalls(0) >= 0.2, s"nprobe=1 recall ${recalls(0)}")
    assert(recalls(1) >= 0.4, s"nprobe=2 recall ${recalls(1)}")
  }

  test("k-means-trained IVF: recall at least matches hash-pivot IVF at nprobe 2") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = embs.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(embs, queries, "embedding", "vec_id", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame) =
      (bf intersect df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet).size.toDouble / bf.size
    val hash = recall(Similarity.ivfTopK(embs, queries, "embedding", "vec_id",
      k = 3, nlist = 8, nprobe = 2))
    val trained = recall(Similarity.ivfTopKTrained(embs, queries, "embedding",
      "vec_id", k = 3, nlist = 8, iters = 5, nprobe = 2))
    // On 200 near-uniform synthetic vectors Lloyd training is not
    // guaranteed to beat hash-sampled pivots (measured: it oscillates with
    // iteration count) — assert the recall FLOOR, and that training at
    // this setting does not trail the hash pivots materially.
    assert(trained >= 0.4, s"trained recall $trained (hash pivots: $hash)")
    assert(trained >= hash - 0.15, s"trained $trained vs hash $hash")
  }

  test("IVF assignment agrees with per-row exact nearest pivot") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val assigned = Similarity.ivfAssign(embs, "embedding", "vec_id", spark, nlist = 8)
    // reference: window-ranked nearest pivot over the cross join
    val pivots = Similarity.ivfPivots(embs, "embedding", "vec_id", 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("pivot_id"))
    val ref = embs.crossJoin(pivots)
      .withColumn("sim", graft.functions.cosine_similarity(col("embedding"), col("pivot_vec")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("pivot_id").as("cell_id"))
    val got = assigned.select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    val want = ref.as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("cluster reps: chains collapse to the component min; isolated docs self-represent") {
    val corpus = (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // a 5-node CHAIN (diameter 4 — forces multi-round propagation), one
    // plain pair, and isolated docs
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (6L, 8L))
      .toDF("id_a", "id_b")
    // both execution paths: driver union-find (default at this size) and
    // the distributed propagation loop (cap 0 forces it)
    Seq(1L << 20, 0L).foreach { cap =>
      val reps = Dedup.clusterReps(corpus, pairs, "doc_id", driverEdgeCap = cap)
        .as[(Long, Long)].collect().toMap
      assert(reps == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
        5L -> 5L, 6L -> 6L, 7L -> 7L, 8L -> 6L, 9L -> 9L), s"cap=$cap")
    }
  }

  test("incremental minhash == full-corpus pairs restricted to batch-involving pairs") {
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val corpus = d.filter($"doc_id" % 3 =!= 0)
    val batch = d.filter($"doc_id" % 3 === 0)
    // maxDf large: per-side caps == global cap (nothing dropped), so the
    // full-corpus run is the exact reference for the incremental one
    val full = Dedup.minhashLsh(d, "text", "doc_id", k = 8, threshold = 0.3,
        maxDf = 100000, portable = true)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => a % 3 == 0 || b % 3 == 0 }
      .map { case (a, b, j) => (math.min(a, b), math.max(a, b), j) }.toSet
    val (cBands, cSh) = Dedup.minhashState(corpus, "text", "doc_id",
      k = 8, maxDf = 100000, portable = true)
    val inc = Dedup.minhashLshIncremental(batch, cBands, cSh, "text", "doc_id",
        k = 8, threshold = 0.3, maxDf = 100000, portable = true)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (math.min(a, b), math.max(a, b), j) }.toSet
    assert(inc == full)
    assert(inc.nonEmpty) // the fixture has batch-straddling near-dups
  }

  test("cluster reps: pair endpoints outside df never become (or relay) representatives") {
    // pairs computed before a filter on df: doc 3 was removed. Its id must
    // not surface as a rep, and 5-6 must not connect through it.
    val corpus = Seq((5L, "x"), (6L, "y"), (7L, "z")).toDF("doc_id", "text")
    val phantomRep = Seq((3L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val phantomRelay = Seq((5L, 3L), (3L, 6L)).toDF("id_a", "id_b")
    Seq(1L << 20, 0L).foreach { cap => // union-find path AND distributed path
      val got = Dedup.clusterReps(corpus, phantomRep, "doc_id", driverEdgeCap = cap)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 7L), s"cap=$cap")
      val got2 = Dedup.clusterReps(corpus, phantomRelay, "doc_id", driverEdgeCap = cap)
        .as[(Long, Long)].collect().toMap
      assert(got2 == Map(5L -> 5L, 6L -> 6L, 7L -> 7L), s"cap=$cap")
    }
  }

  test("cluster reps: 1000-node chain converges in O(log diameter) rounds") {
    // worst-case topology for label propagation: one path graph. The
    // neighbor step alone needs ~diameter rounds; pointer jumping must
    // finish inside the default 20-round budget (2^20 >> 1000), and the
    // whole component must collapse to node 0.
    val n = 1000
    val corpus = (0L until n.toLong).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // cap 0: force the distributed propagation loop (the property under test)
    val reps = Dedup.clusterReps(corpus, pairs, "doc_id", driverEdgeCap = 0L)
      .as[(Long, Long)].collect()
    assert(reps.length == n)
    assert(reps.forall(_._2 == 0L))
  }

  test("int8 quantization roundtrip preserves cosine geometry") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val deq = Similarity.dequantizeInt8(
      Similarity.quantizeInt8(embs, "embedding", "vec_id"), "vec_id")
    val sims = embs.select(col("vec_id"), col("embedding").as("orig"))
      .join(deq.select(col("vec_id"), col("embedding").as("back")), "vec_id")
      .select(graft.functions.cosine_similarity(col("orig"), col("back")))
      .as[Double].collect()
    assert(sims.nonEmpty)
    assert(sims.forall(_ > 0.9995), s"min ${sims.min}")
  }

  test("standardize: per-dim mean 0 / std 1, zero-variance guard, partition-invariant") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val z = Similarity.standardize(embs, "embedding", "vec_id")
      .select(posexplode(col("zvec")).as(Seq("d", "z")))
      .groupBy("d")
      .agg(avg("z").as("m"), stddev_pop(col("z")).as("s"))
      .as[(Int, Double, Double)].collect()
    assert(z.length == 64)
    z.foreach { case (d, m, s) =>
      assert(math.abs(m) < 1e-9, s"dim $d mean $m")
      assert(math.abs(s - 1.0) < 1e-9, s"dim $d std $s")
    }
    // constant dim standardizes to 0, not NaN
    val const = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val zc = Similarity.standardize(const, "embedding", "vec_id")
      .orderBy("vec_id").select("zvec").as[Seq[Double]].collect()
    assert(zc.forall(v => v.head == 0.0) && zc.flatten.forall(!_.isNaN))
    // identical output under any input partitioning
    val a = Similarity.standardize(embs, "embedding", "vec_id")
      .orderBy("vec_id").select("zvec").as[Seq[Double]].collect().toSeq
    val b = Similarity.standardize(embs.repartition(13), "embedding", "vec_id")
      .orderBy("vec_id").select("zvec").as[Seq[Double]].collect().toSeq
    assert(a == b)
  }

  test("SRP top-k recall vs brute force on sf0.001") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = embs.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(embs, queries, "embedding", "vec_id", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.srpTopK(embs, queries, "embedding", "vec_id", k = 3,
      bits = 4, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ann).size.toDouble / bf.size
    assert(recall >= 0.5, s"ANN recall $recall") // 4-bit buckets, 8 tables
  }

  test("hashEmbed: unit norm, hand-checked bucket/sign, chains into the ANN index") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.operators.Similarity.hashEmbed(docs, "text", "doc_id",
      dim = 32, salt = "t")
    // every non-cancelled vector is unit-norm; dims fixed
    val norms = emb.select(
        sqrt(aggregate(col("embedding"), lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double")))).as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5 || n == 0.0))
    assert(emb.select(size(col("embedding"))).distinct().as[Int].collect().toSeq == Seq(32))
    // determinism across partitionings
    val a = emb.orderBy("doc_id").collect().map(_.toString).toSeq
    val b = graft.operators.Similarity.hashEmbed(docs.repartition(13), "text",
      "doc_id", dim = 32, salt = "t").orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a == b)
    // hand-check one single-token doc against the md5 formula
    val one = Seq((1L, "alpha")).toDF("doc_id", "text")
    val v = graft.operators.Similarity.hashEmbed(one, "text", "doc_id", 32, "t")
      .select("embedding").as[Seq[Float]].head()
    val h = java.security.MessageDigest.getInstance("MD5")
    def hex(prefix: String) = h.digest(s"$prefix:t:alpha".getBytes("UTF-8"))
      .take(3).map("%02x".format(_)).mkString
    val bucket = (java.lang.Long.parseLong(hex("he"), 16) % 32).toInt
    val sign = if (java.lang.Long.parseLong(hex("hs").take(1), 16) % 2 == 0) 1f else -1f
    assert(v(bucket) == sign && v.count(_ != 0f) == 1)
    // empty docs emit no row
    assert(graft.operators.Similarity.hashEmbed(
      Seq((9L, "")).toDF("doc_id", "text"), "text", "doc_id", 32, "t").count() == 0)
    // fully-sign-cancelled docs emit no row either (a zero-norm vector
    // can never self-match, which would break replay idempotency in the
    // dedup ingest paths): construct one from two tokens sharing a
    // bucket with opposite signs under this salt
    def bs(tok: String): (Long, Int) = {
      def hx(prefix: String) = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$prefix:t:$tok".getBytes("UTF-8"))
          .take(3).map("%02x".format(_)).mkString, 16)
      // sign = first hex char of md5 mod 2 = bits 20-23 of the 6-char parse
      (hx("he") % 32, if ((hx("hs") >> 20) % 2 == 0) 1 else -1)
    }
    val toks = (0 until 400).map(i => s"w$i")
    val cancelPair = toks.combinations(2).collectFirst {
      case Seq(x, y) if bs(x)._1 == bs(y)._1 && bs(x)._2 != bs(y)._2 => (x, y)
    }.get
    assert(graft.operators.Similarity.hashEmbed(
      Seq((10L, s"${cancelPair._1} ${cancelPair._2}")).toDF("doc_id", "text"),
      "text", "doc_id", 32, "t").count() == 0)
    // the bridge composes: build + query a persisted ANN index on the
    // hashed embeddings of raw text
    val dir = tempDir("hashembidx")
    graft.operators.AnnIndex.buildIvf(emb, "embedding", "doc_id", dir,
      nlist = 8, iters = 3)
    val res = graft.operators.AnnIndex.queryIvf(spark, dir,
        emb.filter(col("doc_id") < 3), "embedding", "doc_id", k = 3, nprobe = 2)
      .collect()
    assert(res.nonEmpty)
  }

  test("textTopics: separated vocabularies yield pure clusters; deterministic") {
    import org.apache.spark.sql.functions._
    val zoo = Seq("cat", "dog", "bird", "fish", "horse")
    val db = Seq("sql", "query", "index", "join", "scan")
    // two disjoint-vocabulary groups; a unique token per doc keeps the
    // hashed vectors distinct so seeding cannot degenerate
    val docs = ((0 until 8).map(i => (i.toLong, s"${zoo.mkString(" ")} u$i")) ++
      (8 until 16).map(i => (i.toLong, s"${db.mkString(" ")} u$i")))
      .toDF("doc_id", "text")
    val out = graft.operators.Clustering.textTopics(docs, "text", "doc_id",
        dim = 32, k = 2, iters = 3, topn = 5, salt = "t")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byCell = out.groupBy(_._1)
    // ranks contiguous from 1, df bounded by the group size
    byCell.values.foreach { rows =>
      assert(rows.map(_._2).sorted.sameElements(1L to rows.length))
      assert(rows.forall(_._4 <= 8L))
    }
    // each cluster's label tokens come from ONE group's vocabulary
    byCell.values.foreach { rows =>
      val toks = rows.map(_._3).toSet
      assert(toks.subsetOf(zoo.toSet ++ (0 until 8).map("u" + _)) ||
        toks.subsetOf(db.toSet ++ (8 until 16).map("u" + _)), rows.mkString(","))
    }
    // both groups surface (the corpus separated)
    assert(byCell.size == 2)
    // deterministic across partitionings
    val again = graft.operators.Clustering.textTopics(docs.repartition(7),
        "text", "doc_id", dim = 32, k = 2, iters = 3, topn = 5, salt = "t")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.sortBy(x => (x._1, x._2)).toSeq == again.sortBy(x => (x._1, x._2)).toSeq)
  }
}
