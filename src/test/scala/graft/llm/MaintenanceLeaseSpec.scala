package graft.llm

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The per-base maintenance LEASE (verdict-r18 Next #3) — the
  * ConcurrentCommitSpec discipline one level up: multi-table WAP
  * transactions take `<base>/_lease/holder` via CREATE_NEW, so two
  * DRIVERS (simulated as child-first-classloader worlds with
  * independent [[MaintenanceLease]] statics over one shared filesystem)
  * cannot interleave maintenance on one base — one transaction wins,
  * the loser REFUSES before staging anything. Stale leases (TTL lapsed
  * without heartbeat) are taken over; nested verbs re-enter. */
class MaintenanceLeaseSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-lease-dir").toString
    for (t <- Seq("documents", "embeddings"))
      spark.read.parquet(s"$sf/$t.parquet").write.parquet(s"$d/$t.parquet")
    d
  }

  private def maintainedBase(dir: String): String = {
    val base = IndexMaintenance.ensureBaseAt(spark, dir,
      Files.createTempDirectory("graft-lease-base").toString)
    IndexMaintenance.ingestAppend(spark, base,
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 13 === 6))
    base
  }

  /** Child-first loader: a fresh static world per instance (the
    * ConcurrentCommitSpec simulation of a second driver JVM). */
  private class IsolatedGraft extends ClassLoader(getClass.getClassLoader) {
    private val root = Paths.get(MaintenanceLease.getClass
      .getProtectionDomain.getCodeSource.getLocation.toURI)
    override def loadClass(name: String, resolve: Boolean): Class[_] =
      synchronized {
        val seen = findLoadedClass(name)
        if (seen != null) return seen
        if (name.startsWith("graft.")) {
          val f = root.resolve(name.replace('.', '/') + ".class")
          if (Files.isRegularFile(f)) {
            val bytes = Files.readAllBytes(f)
            val c = defineClass(name, bytes, 0, bytes.length)
            if (resolve) resolveClass(c)
            return c
          }
        }
        super.loadClass(name, resolve)
      }
  }

  /** A second driver's lease world: its own token, its own depth map. */
  private class OtherDriver {
    private val cls =
      new IsolatedGraft().loadClass("graft.llm.MaintenanceLease$")
    private val module = cls.getField("MODULE$").get(null)
    private val m = cls.getMethods.find(m =>
      m.getName == "withLease" && m.getParameterCount == 4).get
    def withLease[T](base: String, verb: String, ttlMs: Long)(body: => T): T =
      m.invoke(module, base, verb, Long.box(ttlMs),
        new scala.Function0[Any] { def apply(): Any = body })
        .asInstanceOf[T]
  }

  test("two lease worlds really have independent statics") {
    val other = new IsolatedGraft().loadClass("graft.llm.MaintenanceLease$")
    assert(other ne MaintenanceLease.getClass)
  }

  test("loser refuses, does not corrupt: deleteRange vs in-flight ingest from another driver") {
    val dir = freshDir()
    val base = maintainedBase(dir)
    val other = new OtherDriver
    val entered = new CountDownLatch(1)
    val finish = new CountDownLatch(1)
    // Driver B is mid-ingest (holds the lease across its transaction).
    val t = new Thread(() => other.withLease(base, "ingestAppend", 60000L) {
      entered.countDown()
      finish.await(60, TimeUnit.SECONDS)
      ()
    })
    t.start()
    assert(entered.await(30, TimeUnit.SECONDS))
    // Driver A's delete must refuse LOUDLY — before staging anything.
    val fmtName = classOf[graft.sources.ManifestFileSink].getName
    def tableState(p: String): (Long, Long) = {
      val n = spark.read.format(fmtName).option("path", p).load().count()
      (n, graft.sources.ManifestFileSink.publishedManifestCount(p))
    }
    val ct = IndexMaintenance.corpusTable(base)
    val pre = tableState(ct)
    val e = intercept[IllegalStateException](
      IndexMaintenance.deleteRange(spark, base, 100L, 300L))
    assert(e.getMessage.contains("lease"), e.getMessage)
    assert(e.getMessage.contains("HELD"), e.getMessage)
    assert(tableState(ct) === pre,
      "a refused verb must leave the corpus untouched (no staging)")
    // Driver B finishes; the verb now wins.
    finish.countDown()
    t.join(30000)
    assert(IndexMaintenance.deleteRange(spark, base, 100L, 300L) > 0)
    assert(!Files.exists(Paths.get(base, "_lease", "holder")),
      "completed transaction must release its lease")
  }

  test("the vector family refuses under the same fence") {
    val dir = freshDir()
    val base = VectorMaintenance.ensureBaseAt(spark, dir,
      Files.createTempDirectory("graft-lease-vecbase").toString)
    val other = new OtherDriver
    other.withLease(base, "deleteRanges", 60000L) {
      val e = intercept[IllegalStateException](
        VectorMaintenance.ingestAppend(spark, base,
          spark.read.parquet(s"$dir/embeddings.parquet")
            .filter(col("vec_id") % 13 === 6)))
      assert(e.getMessage.contains("lease"))
    }
    // Released by the holder: the same append now applies.
    VectorMaintenance.ingestAppend(spark, base,
      spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") % 13 === 6))
  }

  test("contended acquisition: never two holders, losers all refuse with the lease message") {
    val dir = Files.createTempDirectory("graft-lease-race").toString
    // ONE thread per world: the lease is per-PROCESS by design (two
    // threads of one driver re-enter; intra-driver serialization is the
    // maintenance objects' monitors), so the mutual-exclusion claim is
    // across WORLDS.
    val worlds: Seq[OtherDriver] =
      Seq(null, new OtherDriver, new OtherDriver, new OtherDriver)
    val inside = new AtomicInteger(0)
    val refused = new AtomicInteger(0)
    val won = new AtomicInteger(0)
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val start = new CountDownLatch(1)
    val threads = worlds.zipWithIndex.map { case (w, i) =>
      new Thread(() => {
        start.await()
        (1 to 5).foreach { _ =>
          def body(): Unit = {
            if (inside.incrementAndGet() != 1)
              violations.add("two holders at once")
            Thread.sleep(5)
            won.incrementAndGet()
            inside.decrementAndGet()
            ()
          }
          try {
            if (w == null) MaintenanceLease.withLease(dir, s"race$i")(body())
            else w.withLease(dir, s"race$i", 60000L)(body())
          } catch {
            case e: Throwable =>
              val root = e match {
                case ite: java.lang.reflect.InvocationTargetException => ite.getCause
                case x => x
              }
              if (root.isInstanceOf[IllegalStateException] &&
                  root.getMessage.contains("lease")) refused.incrementAndGet()
              else violations.add(s"unexpected: $root")
          }
        }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(60000))
    assert(violations.isEmpty, violations.toString)
    assert(won.get() + refused.get() === 20)
    assert(won.get() >= 1, "somebody must win")
    assert(!Files.exists(Paths.get(dir, "_lease", "holder")),
      "all races done: no lease leaked")
  }

  test("stale lease (TTL lapsed, holder crashed) is taken over; live lease is not") {
    val dir = freshDir()
    val base = maintainedBase(dir)
    val f = Paths.get(base, "_lease", "holder")
    Files.createDirectories(f.getParent)
    Files.write(f, "dead-driver@0 ingestAppend".getBytes("UTF-8"))
    Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 10 * 60 * 1000L))
    // 10 minutes old with a 2-minute default TTL: the takeover path.
    assert(IndexMaintenance.deleteRange(spark, base, 100L, 300L) > 0,
      "a crashed holder's stale lease must not wedge the base")
    assert(!Files.exists(f), "the verb released the taken-over lease")
  }

  test("a verb that throws its audit refusal releases the lease (no leak)") {
    val dir = freshDir()
    val base = maintainedBase(dir)
    // Replaying already-ingested docs violates the new-ids audit.
    val replay = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 13 === 6).limit(1)
    val e = intercept[IllegalStateException](
      IndexMaintenance.ingestAppend(spark, base, replay))
    assert(e.getMessage.contains("already in the corpus"))
    assert(!Files.exists(Paths.get(base, "_lease", "holder")),
      "audit refusal must release the lease for the next verb")
    // And the next verb proceeds normally.
    assert(IndexMaintenance.deleteRange(spark, base, 100L, 300L) > 0)
  }

  test("nested verbs re-enter (depth), never self-refuse") {
    val dir = Files.createTempDirectory("graft-lease-nest").toString
    var ran = false
    MaintenanceLease.withLease(dir, "outer") {
      MaintenanceLease.withLease(dir, "inner") { ran = true }
      assert(Files.exists(Paths.get(dir, "_lease", "holder")),
        "inner release must not drop the outer hold")
    }
    assert(ran)
    assert(!Files.exists(Paths.get(dir, "_lease", "holder")))
  }
}
