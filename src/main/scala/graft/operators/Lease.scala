package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Single-writer ENFORCEMENT for graft's persisted stores.
  *
  * Every maintenance operator (the append/compact/forget families, the
  * streaming ingest lanes) documents "single-writer" as a contract;
  * until now nothing MADE a misdeployed concurrent growth + takedown
  * pair fail instead of silently corrupting a store mid-swap — the same
  * silent-failure class the on-disk layout detection closed for index
  * formats. The lease is a sibling marker `<storeDir>__lease` (a
  * SIBLING, not a file inside the store: the whole-directory `__old`
  * swap protocol renames the store itself, and a lease riding inside
  * would vanish mid-operation) holding `holder \n expiresAtMillis`:
  *
  *  - absent → acquired (the marker lands by an atomic rename of a
  *    fully-written temp, so no reader ever sees a half-written lease)
  *  - held by the SAME holder → renewed (re-entrant: a lane's in-batch
  *    compact hook runs under the lane's own lease)
  *  - held by ANOTHER holder, unexpired → refused LOUDLY — the
  *    concurrent-drain misdeployment fails fast at the second acquire
  *  - held by another holder, EXPIRED → reclaimed: a crashed holder's
  *    lease must not wedge the store forever (the TTL is the
  *    heartbeat; lanes re-acquire per batch, so a live lane's lease is
  *    always fresh)
  *
  * Scope and honesty: this is a deployment-mistake guard on a
  * single-writer system, not a distributed lock service — a true
  * multi-writer deployment needs the coordination primitives a plain
  * filesystem cannot provide (the acquire's read-check-rename is not
  * one atomic step against a pathological simultaneous acquirer). What
  * it guarantees in practice: two graft lanes pointed at one store
  * conflict at batch granularity and the loser stops with the holder's
  * name in the message instead of interleaving directory swaps.
  */
object Lease {

  /** 30 min: generous against a slow micro-batch (a lane renews every
    * batch, so a live holder never approaches it) yet short enough that
    * a crashed drain's store is reclaimable the same operational hour.
    */
  val DefaultTtlMs: Long = 30L * 60L * 1000L

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def leasePath(storeDir: String): Path =
    new Path(storeDir.stripSuffix("/") + "__lease")

  /** Store leases the CURRENT THREAD's withLease windows hold (keyed by
    * the qualified lease path, so spelling variants of one dir agree) —
    * the re-entrancy fact the holder string cannot carry: see
    * [[withLease]].
    */
  private val heldByThread = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  /** (holder, expiresAtMillis) of the current lease, if any. */
  def holderOf(spark: SparkSession, storeDir: String): Option[(String, Long)] = {
    val p = leasePath(storeDir)
    val fs = fsFor(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val raw =
        try {
          // read to EOF in a loop: a single read() may legally return a
          // PREFIX on hdfs/object-store streams, and a truncated expiry
          // ("17554" of "1755400000000") parses as a tiny number that
          // makes a live lease look expired — the reclaim would put two
          // writers on one store, the exact corruption leases prevent
          val buf = new java.io.ByteArrayOutputStream(256)
          val chunk = new Array[Byte](4096)
          var n = in.read(chunk)
          while (n >= 0) {
            buf.write(chunk, 0, n)
            n = in.read(chunk)
          }
          new String(buf.toByteArray, "UTF-8")
        } finally in.close()
      raw.split("\n", 2) match {
        case Array(h, exp) => Some((h, exp.trim.toLong))
        case _ => throw new IllegalStateException(
          s"Lease: unparseable lease at $p — the marker is written by one " +
            "atomic rename, so this is foreign data; remove it manually")
      }
    }
  }

  /** Acquire (or renew) the store's lease for `holder`. Refuses loudly
    * when another holder's unexpired lease is present; reclaims an
    * expired one.
    */
  def acquire(spark: SparkSession, storeDir: String, holder: String,
              ttlMs: Long = DefaultTtlMs): Unit = {
    require(holder.nonEmpty && !holder.contains("\n"),
      s"Lease: holder must be a non-empty single-line name, got '$holder'")
    val p = leasePath(storeDir)
    val fs = fsFor(spark, p)
    val now = System.currentTimeMillis()
    holderOf(spark, storeDir) match {
      case Some((h, exp)) if h != holder && exp > now =>
        throw new IllegalStateException(
          s"Lease: $storeDir is held by '$h' for another ${exp - now} ms — " +
            "a second writer on one store is the corruption this lease " +
            "exists to prevent; run drains sequentially (or wait for the " +
            "expiry if the holder crashed)")
      case other =>
        // own lease (renew), expired foreign lease (reclaim), or absent:
        // stage the full content then rename — readers see old or new,
        // never a torn write
        val tmp = new Path(p.toString + s".tmp.${holder.hashCode.toHexString}")
        val out = fs.create(tmp, true)
        try out.write(s"$holder\n${now + ttlMs}".getBytes("UTF-8"))
        finally out.close()
        if (other.nonEmpty) fs.delete(p, true)
        if (!fs.rename(tmp, p)) {
          fs.delete(tmp, true)
          throw new IllegalStateException(
            s"Lease: lost the acquire race for $storeDir — another writer " +
              "claimed it concurrently; retry after it finishes")
        }
    }
  }

  /** Drop the lease if this holder still owns it (quietly leaves a
    * foreign lease alone — ours was reclaimed, and deleting the
    * reclaimer's would widen the hole this mechanism closes).
    */
  def release(spark: SparkSession, storeDir: String, holder: String): Unit =
    holderOf(spark, storeDir) match {
      case Some((h, _)) if h == holder =>
        val p = leasePath(storeDir)
        fsFor(spark, p).delete(p, true)
        ()
      case _ => ()
    }

  /** Run `f` under the store's lease — the ingest lanes' per-batch
    * window. Released on every exit path; a crash inside leaves the
    * lease to expire (reclaimable after `ttlMs`).
    *
    * A daemon HEARTBEAT renews the lease every `ttlMs / 3` while `f`
    * runs: without it, any single batch outliving the TTL (a
    * compactEvery fold of a large stack, a corpus-sized forget) would
    * let a competing lane reclaim mid-operation — the interleaving the
    * lease exists to prevent would return exactly on the heaviest
    * operations. A renewal failure (e.g. the lease was force-removed)
    * stops the heartbeat; `f` keeps running and the next conflicting
    * acquirer wins only after the last successful renewal expires.
    *
    * RE-ENTRANT within one control flow: when the calling thread is
    * already inside a `withLease` window for this same store (an ingest
    * lane's in-batch compact hook calling a lease-guarded operator),
    * the nested call runs `f` directly — the OUTER window owns the
    * heartbeat and the release; a nested release would drop the lease
    * out from under the still-running outer operation. The check is
    * thread-scoped, NOT holder-name-scoped, deliberately: a nested call
    * under a different operation name (the drain's compact hook) must
    * pass, while a DIRECT maintenance call from outside the drain's
    * control flow — even a copy-pasted holder string — must contest the
    * lease and refuse with the holder's name (r12 verdict #5). TTLs
    * under 3 s are refused (the ttl/3 heartbeat cannot renew a lease
    * that expires faster than it beats).
    */
  def withLease[T](spark: SparkSession, storeDir: String, holder: String,
                   ttlMs: Long = DefaultTtlMs)(f: => T): T = {
    // floor: the heartbeat renews every ttl/3; a TTL at or under the
    // renewal granularity would expire before the first renewal lands,
    // reopening the mid-operation reclaim window the heartbeat closes
    require(ttlMs >= 3000L,
      s"Lease.withLease: ttlMs=$ttlMs is below the 3000 ms floor — the " +
        "ttl/3 heartbeat cannot renew a lease that expires faster than " +
        "it beats")
    val key = {
      val p = leasePath(storeDir)
      fsFor(spark, p).makeQualified(p).toString
    }
    if (heldByThread.get.contains(key))
      return f // nested inside this thread's own window: the outer owns it
    acquire(spark, storeDir, holder, ttlMs)
    heldByThread.set(heldByThread.get + key)
    val beat = new Thread(() => {
      try {
        while (!Thread.interrupted()) {
          Thread.sleep(ttlMs / 3)
          // re-check AFTER the sleep: an interrupt delivered while the
          // renew below is blocked in FS I/O (which ignores interrupts)
          // is only observable here — without it the thread could renew
          // once more AFTER release() deleted the lease, stranding an
          // orphan that wedges every other lane for up to ttlMs
          if (Thread.interrupted()) throw new InterruptedException
          acquire(spark, storeDir, holder, ttlMs) // re-entrant renew
        }
      } catch {
        case _: InterruptedException => ()
        case _: IllegalStateException => () // lease lost: stop beating
      }
    }, s"graft-lease-heartbeat-$holder")
    beat.setDaemon(true)
    beat.start()
    try f finally {
      heldByThread.set(heldByThread.get - key)
      beat.interrupt()
      // the join can time out while the heartbeat is blocked inside an
      // FS call (interrupt-deaf); releasing once and walking away would
      // let that in-flight renew re-create the lease as an orphan. Loop
      // join+release until the thread is dead — the release after the
      // final join is the one that sticks.
      var tries = 0
      do {
        beat.join(2000L)
        release(spark, storeDir, holder)
        tries += 1
      } while (beat.isAlive && tries < 150)
      if (beat.isAlive)
        // a renew blocked >5 min inside an interrupt-deaf FS call can
        // still land after this release and strand an orphan lease for
        // up to ttlMs — say so instead of failing silent (the next
        // acquirer's error names this holder, and the TTL bounds it)
        recordOrphanRisk(spark, storeDir, holder, ttlMs)
    }
  }

  /** Sibling marker a stuck shutdown leaves behind. */
  private[graft] def orphanRiskPath(storeDir: String): Path =
    new Path(storeDir.stripSuffix("/") + "__lease_risk")

  /** Make the one failure mode [[withLease]] can only BOUND, not
    * prevent, OBSERVABLE (r13 verdict #7): when the heartbeat refuses
    * to die within the shutdown window, an in-flight renew may still
    * land after the release and strand an orphan lease for up to
    * `ttlMs`. That used to be a System.err line — correct, but the one
    * diagnostic in the codebase nothing could assert or query. Now it
    * ALSO writes a sibling marker `<storeDir>__lease_risk` holding
    * `holder \n ttlMs \n wallClockMillis` (overwriting an older one —
    * the latest risk is the live one), so an operator's monitoring can
    * list for it and a stuck lane's blast radius is a filesystem fact
    * rather than a lost log line. The marker is INERT to acquisition
    * (the TTL already bounds the orphan) and cheap to clear by hand;
    * the write itself is best-effort — ANY non-fatal failure here is
    * swallowed (Hadoop filesystems throw RuntimeExceptions, not just
    * IOExceptions), because this runs in withLease's finally path and
    * must never replace the exception the guarded operation failed
    * with.
    */
  private[graft] def recordOrphanRisk(spark: SparkSession, storeDir: String,
                                      holder: String, ttlMs: Long): Unit = {
    System.err.println(
      s"Lease.withLease: heartbeat for '$holder' on $storeDir did " +
        "not stop within the shutdown window — if its in-flight " +
        s"renew lands it strands an orphan lease for up to $ttlMs ms")
    try {
      val p = orphanRiskPath(storeDir)
      val fs = fsFor(spark, p)
      val out = fs.create(p, true)
      try out.write(
        s"$holder\n$ttlMs\n${System.currentTimeMillis()}".getBytes("UTF-8"))
      finally out.close()
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}
