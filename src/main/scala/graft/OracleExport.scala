package graft

/** Content-addressed oracle-export paths — ONE copy of the base-dir /
  * sanitization / digest rules shared by every model-artifact export
  * (IVF centroids, PQ codebooks, PCA components, BPE merges), so the
  * recipes can never drift (the one-copy discipline; extracted from
  * Similarity in round 14 when the BPE export became a second
  * consumer outside that file).
  *
  * The salt fully determines the file's CONTENT (training is
  * deterministic over immutable fixtures) and is folded into the NAME —
  * so the export is content-addressed and memoizing one write per salt
  * per JVM is sound. Pure path computation — the parent dir is created
  * at the write sites, so callers that merely BUILD oracle SQL strings
  * (dumps, tests) never touch the filesystem. */
private[graft] object OracleExport {

  def path(salt: String, prefix: String): String = {
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"),
      "graft-oracle-" + System.getProperty("user.name", "u")
        .replaceAll("[^A-Za-z0-9._-]", "-"))
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(salt.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    base.resolve(s"$prefix-$dig.parquet").toString
  }
}
