package graft

import org.apache.spark.sql.functions._

/** Measures [[graft.operators.GraphStore]]'s scale shape — the claims
  * its scaladoc makes, priced: append cost tracks the BATCH (committed
  * labels load only for touched nodes), point lookups prune the
  * compacted base to touched buckets, and merges cost remap rows, not
  * label rewrites.
  *
  * Protocol: a synthetic star graph — node i attaches to hub
  * (i - i mod 10), giving N/10 ten-node components — built as 8 ingest
  * drains, then (1) append a 500-edge batch of NEW stars plus 5
  * bridges that merge committed components, (2) point-look-up 10 nodes,
  * (3) compact, (4) repeat both against the bucketed base. Sweep N.
  *
  *   sbt "runMain graft.ProbeGraphStore 1000000"
  */
object ProbeGraphStore {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = GraftSession.getOrCreate("graft-probe-graphstore")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_probe_gs").toString + "/store"
    def starEdges(lo: Long, hi: Long) =
      spark.range(lo, hi)
        .filter(col("id") % 10 =!= 0)
        .select(col("id").as("a"), (col("id") - col("id") % 10).as("b"))
    time(s"build graph store ($n nodes, 8 ingests)") {
      val chunk = n / 8L + 1L
      (0 until 8).foreach { i =>
        graft.operators.GraphStore.append(spark, dir,
          starEdges(i * chunk, math.min((i + 1) * chunk, n)))
      }
    }
    // bridge hub spacing derives from n (a fixed stride would fall
    // outside the committed node space on small sweeps and silently
    // measure fresh-node labeling instead of committed merges): hubs at
    // 0, s, 2s … 5s with 5s < n, each a committed star center
    val s = math.max(10L, n / 6L / 10L * 10L)
    val batch = starEdges(n + 10L, n + 510L)
      .unionByName(spark.range(5)
        .select((col("id") * s).as("a"), ((col("id") + 1L) * s).as("b")))
      .localCheckpoint(true)
    val probes = spark.range(10)
      .select((col("id") * (n / 10L)).as("node")).localCheckpoint(true)
    def lookup(label: String): Unit =
      time(label) {
        graft.operators.GraphStore.componentOf(spark, dir, probes).count()
      }
    lookup("point lookup x10 (flat, 8 ingests)")
    val (fresh, merges) = time(s"append (500 new edges + 5 bridges vs $n committed)") {
      graft.operators.GraphStore.append(spark, dir, batch)
    }
    println(s"  admitted: $fresh fresh, $merges merges")
    time("compact") {
      graft.operators.GraphStore.compact(spark, dir)
    }
    lookup("point lookup x10 (compacted, bucket-pruned)")
    val (f2, m2) = time(s"append (replay — natural no-op)") {
      graft.operators.GraphStore.append(spark, dir, batch)
    }
    println(s"  replay admitted: $f2 fresh, $m2 merges")
    // r15: the INCREMENTAL fold (r14 verdict #1) — with a bucketed base
    // in place, a further tail compact is ADDITIVE: the tail lands as
    // its own generation, so the fold must cost ∝ tail alone, NOT
    // ∝ corpus (the first compact above, which folds the whole flat
    // store, is the one-time full-aggregation price)
    val tail = starEdges(n + 1000L, n + 1500L)
      .unionByName(spark.range(2)
        .select((col("id") * s + 10L).as("a"),
          ((col("id") + 2L) * s + 10L).as("b")))
      .localCheckpoint(true)
    time("append (500-edge tail + 2 bridges, post-compact)") {
      graft.operators.GraphStore.append(spark, dir, tail)
    }
    time(s"compact (INCREMENTAL: O(tail) fold beside $n committed nodes)") {
      graft.operators.GraphStore.compact(spark, dir)
    }
    lookup("point lookup x10 (two generations + composed remap)")
    // r15: the TIER fold at the generation cap — size-aware selection
    // must retire the SMALL second generation, not the n-node base, so
    // its cost is ∝ (tail + small generation), corpus-independent
    val tail2 = starEdges(n + 2000L, n + 2500L).localCheckpoint(true)
    time("append (500-edge tail, pre-tier-fold)") {
      graft.operators.GraphStore.append(spark, dir, tail2)
    }
    time(s"compact (TIER FOLD at maxGens=2: small gen + tail, base kept)") {
      graft.operators.GraphStore.compact(spark, dir, maxGens = 2)
    }
    lookup("point lookup x10 (post tier fold)")
    spark.stop()
  }
}
