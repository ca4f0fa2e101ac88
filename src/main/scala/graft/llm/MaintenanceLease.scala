package graft.llm

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Per-base maintenance LEASE (verdict-r18 Next #3) — the claimSeq
  * discipline extended one level up. [[graft.sources.ManifestFileSink]]'s
  * commit fence makes single-TABLE commits cross-process safe, but the
  * multi-table WAP transactions (ingest, takedown, curation epoch,
  * compaction, purge, incremental retrain) assume ONE maintenance
  * process per index base between stage and publish — previously a
  * documented quiescence contract, now fenced: a transaction CAS-creates
  * `<base>/_lease/holder` with `CREATE_NEW` (the same create-if-absent
  * primitive the commit fence uses, the one atomic filesystems actually
  * give you) and holds it for the transaction's span. A second
  * maintenance process finding the file REFUSES LOUDLY — it does not
  * queue, and it cannot corrupt, because it refuses before staging
  * anything.
  *
  * Liveness: a holder that crashed mid-transaction must not wedge the
  * base forever, so the lease carries a TTL measured from the file's
  * mtime — long transactions renew by [[heartbeat]] (touch), and an
  * acquirer finding a lease older than the TTL deletes it and re-runs
  * the CREATE_NEW race (losers re-read and refuse against the fresh
  * holder). The crashed transaction's staged-but-unpublished suffixes
  * are exactly what recoverTorn/wapAbort classify and repair on the next
  * verb, so takeover is safe — the lease guards CONCURRENCY, the
  * manifest layer guards ATOMICITY.
  *
  * Residual (documented, not hidden — README "Concurrency contract"): a
  * transaction that OVERRUNS its TTL without heartbeating can be taken
  * over mid-flight. The single-table commit fences still hold (no
  * duplicate seqs, staged-DV liveness validation at publish), so the
  * overrunner cannot corrupt table history, but two transactions'
  * table-level effects may interleave. [[release]] detects the takeover
  * (its token no longer owns the file) and says so on stderr instead of
  * deleting the new holder's lease. Production sizes the TTL to the
  * verb's span via `GRAFT_LEASE_TTL_MS` or heartbeats from a progress
  * listener; the default is generous for local-mode transactions.
  *
  * Reentrant WITHIN a driver: verbs nest (applyEpoch → ingestAppend,
  * curateEpoch → ingestAppend), so a base already held by THIS process
  * increments a depth counter instead of re-racing the filesystem. The
  * holder token is per-process state (a fresh static per driver world —
  * exactly what ConcurrentCommitSpec's child-first classloaders
  * simulate), never per-thread: intra-process writers already serialize
  * on the maintenance objects' monitors. */
object MaintenanceLease {

  /** Generous for local-mode verbs (seconds); production tunes it. */
  val DefaultTtlMs: Long =
    sys.env.get("GRAFT_LEASE_TTL_MS").map(_.toLong).getOrElse(120000L)

  /** This process's identity — one per driver world. */
  private val token: String =
    java.util.UUID.randomUUID().toString + "@" + ProcessHandle.current().pid()

  private final class State { var depth = 0 }
  private val held = new java.util.concurrent.ConcurrentHashMap[String, State]()

  private def leaseFile(base: String): Path =
    Paths.get(base, "_lease", "holder")

  private def key(base: String): String =
    new java.io.File(base).getAbsolutePath

  /** Run `body` holding the base's maintenance lease: acquire (refuse
    * loudly if held by another live process, take over if stale),
    * release on every exit path — a verb that throws its audit refusal
    * must not leak a lease the next verb would then refuse against. */
  def withLease[T](base: String, verb: String,
      ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    val k = key(base)
    acquire(k, verb, ttlMs)
    try body finally release(k)
  }

  /** Renew the TTL window mid-transaction (holder-checked touch). */
  def heartbeat(base: String): Unit = this.synchronized {
    val f = leaseFile(key(base))
    val mine = try new String(Files.readAllBytes(f), "UTF-8").startsWith(token)
      catch { case _: Exception => false }
    if (mine) Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
  }

  private def acquire(k: String, verb: String, ttlMs: Long): Unit =
    this.synchronized {
      val st = held.computeIfAbsent(k, _ => new State)
      if (st.depth > 0) { st.depth += 1; return } // reentrant nesting
      val f = leaseFile(k)
      Files.createDirectories(f.getParent)
      var attempts = 0
      while (attempts < 5) {
        try {
          Files.write(f, s"$token $verb".getBytes("UTF-8"),
            StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
          st.depth = 1
          return
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            val holder = try Some(new String(Files.readAllBytes(f), "UTF-8"))
              catch { case _: Exception => None } // vanished: re-race
            val ageMs =
              try System.currentTimeMillis() - Files.getLastModifiedTime(f).toMillis
              catch { case _: Exception => Long.MaxValue }
            holder match {
              case Some(h) if h.startsWith(token) =>
                // Our own marker with depth 0: a previous run of this
                // process crashed between write and release. Reclaim.
                Files.deleteIfExists(f)
              case Some(h) if ageMs <= ttlMs =>
                throw new IllegalStateException(
                  s"maintenance lease on $k is HELD by [$h] (age ${ageMs}ms, " +
                    s"ttl ${ttlMs}ms) — one maintenance transaction per base: " +
                    s"$verb refuses rather than interleave. Retry after the " +
                    "holder finishes, or raise GRAFT_LEASE_TTL_MS if it " +
                    "crashed and the TTL has not yet lapsed.")
              case _ =>
                // Stale (or unreadable-and-old): delete and re-race the
                // CREATE_NEW — a concurrent taker can win; we then re-read
                // the fresh holder and refuse above.
                Files.deleteIfExists(f)
            }
            attempts += 1
        }
      }
      throw new IllegalStateException(
        s"maintenance lease on $k: lost the takeover race $attempts times " +
          "— another maintenance process is live; refusing.")
    }

  private def release(k: String): Unit = this.synchronized {
    val st = held.get(k)
    if (st == null || st.depth == 0)
      throw new IllegalStateException(s"release without acquire on $k")
    st.depth -= 1
    if (st.depth == 0) {
      val f = leaseFile(k)
      val mine = try new String(Files.readAllBytes(f), "UTF-8").startsWith(token)
        catch { case _: Exception => false }
      if (mine) Files.deleteIfExists(f)
      else System.err.println(
        s"[lease] WARNING: lease on $k was taken over mid-transaction " +
          "(TTL overrun without heartbeat). Single-table commit fences " +
          "held, but quiesce concurrent maintenance — see README " +
          "Concurrency contract.")
    }
  }
}
