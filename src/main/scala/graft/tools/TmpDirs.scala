package graft.tools

/** Shared temp-artifact cleanup for the soak tools: both replicate the
  * fixture to a multi-GB local parquet tree per run, and repeated soaks
  * would otherwise stack those in the temp filesystem.
  */
private[tools] object TmpDirs {
  def deleteRecursively(dir: String): Unit = {
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    finally walk.close()
  }
}
