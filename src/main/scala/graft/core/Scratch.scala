package graft.core

import java.nio.file.{Files, Path, Paths}

/** The ONE scratch-location rule for per-corpus derived artifacts
  * (bucketed/clustered/z-order mirrors, the partitioned-corpus mirror,
  * the learned-centroid model): `target/<kind>/<corpus-hash>` when run
  * from the project root, falling back to the system temp dir so a
  * launcher with another cwd doesn't scatter mirrors (review r6). Was
  * four private copies that had already diverged — the learned-centroid
  * ORACLE glob hard-coded the target/ form while its mirror writer had
  * the fallback, so the two could disagree about where the model lives
  * (review r8); deriving every path and the glob from this object makes
  * them consistent by construction.
  *
  * The corpus hash keys on the NORMALIZED ABSOLUTE sfDir: two spellings
  * of the same directory (`sf0.1` vs `sf0.1/` vs a relative path) used
  * to hash to different mirror dirs — mostly wasted rebuilds, but for
  * the centroid model it produced two mirrors with the SAME content
  * signature, which doubled the oracle's centroid rows (review r8). */
object Scratch {

  def base(): Path = {
    val target = Paths.get("target")
    val b =
      if (Files.isDirectory(target)) target
      else Paths.get(sys.props("java.io.tmpdir"), "graft-scratch")
    b.toAbsolutePath
  }

  /** Scratch dir for one (artifact kind, corpus). */
  def dir(kind: String, sfDir: String, hashLen: Int = 8): Path =
    base().resolve(kind).resolve(corpusHash(sfDir, hashLen))

  def corpusHash(sfDir: String, hashLen: Int = 8): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(Paths.get(sfDir).toAbsolutePath.normalize().toString
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(hashLen)
}
