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
private[llm] object IndexFence {

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

  def clear(path: String): Unit = Files.deleteIfExists(fenceFile(path))

  /** Recursive delete of a stale index artifact directory. */
  def rmTree(p: Path): Unit =
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.delete(q))
      finally st.close()
    }
}
