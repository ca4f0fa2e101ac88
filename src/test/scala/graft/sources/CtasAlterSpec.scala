package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Atomic CTAS/RTAS (StagingTableCatalog) and SQL schema evolution
  * (ALTER TABLE ADD/DROP COLUMN) over manifest tables. The staging
  * contract: nothing is visible until the whole query succeeds — a
  * failed CTAS leaves no table, a REPLACE is one retract-and-insert
  * manifest with history intact. */
class CtasAlterSpec extends SparkTestBase {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-ctas").toString
    spark.conf.set("spark.sql.catalog.graftc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftc.root", r)
    r
  }

  test("CTAS: CREATE TABLE AS SELECT lands query results as the first commit") {
    root
    spark.sql(
      """CREATE TABLE graftc.db.ct AS
        |SELECT id, CAST(id * 1.5 AS DOUBLE) AS v
        |FROM range(10)""".stripMargin)
    assert(spark.sql("SELECT count(*), sum(v) FROM graftc.db.ct").head()
      .toSeq === Seq(10L, 67.5))
    // Duplicate CTAS refuses; IF NOT EXISTS is a no-op.
    intercept[Exception](
      spark.sql("CREATE TABLE graftc.db.ct AS SELECT 1L AS id"))
    spark.sql("CREATE TABLE IF NOT EXISTS graftc.db.ct AS SELECT 1L AS id")
    assert(spark.sql("SELECT count(*) FROM graftc.db.ct").head().getLong(0) === 10)
  }

  test("failed CTAS is invisible: no table, no orphan directory") {
    root
    // Staging-time failure: a void-typed column is vetted BEFORE the
    // filesystem is touched — no directory ever appears.
    intercept[Exception](spark.sql(
      """CREATE TABLE graftc.db.boom AS
        |SELECT assert_true(id < 5, 'boom') AS chk, id FROM range(10)""".stripMargin))
    assert(!Files.isDirectory(Paths.get(root, "db", "boom")),
      "staging-time refusal must leave no directory")
    // Runtime failure: the query dies mid-job (ANSI division by zero) —
    // staged task files and the created directory are both reclaimed.
    intercept[Exception](spark.sql(
      "CREATE TABLE graftc.db.boom AS SELECT id, id div (id - 5) AS f FROM range(10)"))
    intercept[Exception](spark.sql("SELECT * FROM graftc.db.boom").collect())
    assert(!Files.isDirectory(Paths.get(root, "db", "boom")),
      "aborted CTAS must remove the directory it created")
    // And the name is reusable immediately.
    spark.sql("CREATE TABLE graftc.db.boom AS SELECT 1L AS id")
    assert(spark.sql("SELECT id FROM graftc.db.boom").head().getLong(0) === 1L)
  }

  test("RTAS: REPLACE TABLE AS SELECT is one atomic commit, history intact") {
    root
    spark.sql("CREATE TABLE graftc.db.rt AS SELECT id FROM range(5)")
    val path = s"$root/db/rt"
    val before = ManifestFileSink.manifests(path).length
    val pin = ManifestFileSink.latestManifest(path).get
    // Replace with a DIFFERENT schema — even a changed column type.
    spark.sql(
      """REPLACE TABLE graftc.db.rt AS
        |SELECT CAST(id AS STRING) AS id, id * 2 AS dbl FROM range(3)""".stripMargin)
    assert(spark.sql("SELECT * FROM graftc.db.rt").count() === 3)
    assert(spark.table("graftc.db.rt").schema.fieldNames.toSeq === Seq("id", "dbl"))
    // ONE manifest commit carries the whole replace.
    assert(ManifestFileSink.manifests(path).length === before + 1)
    // Time travel to the pre-replace snapshot still sees the old rows.
    val old = spark.read.format(classOf[ManifestFileSink].getName)
      .option("path", path).option("asOfManifest", pin).load()
    assert(old.count() === 5)
    // CREATE OR REPLACE routes to replace when present, create when not.
    spark.sql("CREATE OR REPLACE TABLE graftc.db.rt AS SELECT 9L AS k")
    assert(spark.sql("SELECT k FROM graftc.db.rt").head().getLong(0) === 9L)
    spark.sql("CREATE OR REPLACE TABLE graftc.db.rt2 AS SELECT 8L AS k")
    assert(spark.sql("SELECT k FROM graftc.db.rt2").head().getLong(0) === 8L)
    // REPLACE of a nonexistent table refuses.
    intercept[Exception](
      spark.sql("REPLACE TABLE graftc.db.nope AS SELECT 1L AS id"))
  }

  test("ALTER TABLE ADD COLUMN: schema-only commit, NULL backfill on old rows") {
    root
    spark.sql("CREATE TABLE graftc.db.ac (id BIGINT, name STRING)")
    spark.sql("INSERT INTO graftc.db.ac VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE graftc.db.ac ADD COLUMN score DOUBLE")
    // Old rows backfill NULL; new inserts carry the column.
    spark.sql("INSERT INTO graftc.db.ac VALUES (3, 'c', CAST(3.5 AS DOUBLE))")
    val rows = spark.sql("SELECT id, score FROM graftc.db.ac ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
      .toSeq === Seq((1L, null), (2L, null), (3L, 3.5)))
    // The predicate semantics over backfill: IS NULL finds old rows.
    assert(spark.sql("SELECT count(*) FROM graftc.db.ac WHERE score IS NULL")
      .head().getLong(0) === 2)
  }

  test("ALTER TABLE DROP COLUMN: column vanishes; rename/type-change refuse") {
    root
    spark.sql("CREATE TABLE graftc.db.dc (id BIGINT, tmp STRING, keep DOUBLE)")
    spark.sql("INSERT INTO graftc.db.dc VALUES (1, 'x', CAST(1.0 AS DOUBLE))")
    spark.sql("ALTER TABLE graftc.db.dc DROP COLUMN tmp")
    assert(spark.table("graftc.db.dc").schema.fieldNames.toSeq === Seq("id", "keep"))
    assert(spark.sql("SELECT * FROM graftc.db.dc").head().toSeq === Seq(1L, 1.0))
    // Pin the by-name semantics of re-ADD after DROP: without column
    // mapping, a re-added column of the same name and type RESURRECTS
    // the old files' bytes (they were never rewritten) — the documented
    // Delta-without-column-mapping behavior, asserted so a future
    // column-mapping change shows up as a deliberate semantic diff.
    spark.sql("ALTER TABLE graftc.db.dc ADD COLUMN tmp STRING")
    assert(spark.sql("SELECT tmp FROM graftc.db.dc").head().getString(0) === "x",
      "by-name evolution without column mapping resurrects same-name bytes")
    // Renames and type changes refuse loudly.
    intercept[Exception](
      spark.sql("ALTER TABLE graftc.db.dc RENAME COLUMN keep TO kept"))
    intercept[Exception](
      spark.sql("ALTER TABLE graftc.db.dc ALTER COLUMN id TYPE STRING"))
    // Nonexistent drop refuses without IF EXISTS, no-ops with it.
    intercept[Exception](
      spark.sql("ALTER TABLE graftc.db.dc DROP COLUMN ghost"))
    spark.sql("ALTER TABLE graftc.db.dc DROP COLUMN IF EXISTS ghost")
  }
}
