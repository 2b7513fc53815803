package graft.core

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Direct contract tests for the shared publish protocol — pure
  * filesystem, no Spark. The warehouse/mirror specs drive it
  * end-to-end; these pin the PROTOCOL semantics each caller relies on,
  * in particular the marker-aware rollback scope (review r8: a
  * destructive marker swap must never have its inputs deleted once it
  * has begun). */
class CommitProtocolSpec extends AnyFunSuite {

  private def tmp(): Path = Files.createTempDirectory("commit-protocol")

  private def stagedDir(root: Path, name: String, content: String): Path = {
    val d = root.resolve(name)
    Files.createDirectories(d)
    Files.writeString(d.resolve("data.txt"), content)
    d
  }

  test("success: dests in place, marker ran, staging gone") {
    val root = tmp()
    val staging = root.resolve("staging")
    val s1 = stagedDir(staging, "a", "one")
    val s2 = stagedDir(staging, "b", "two")
    val d1 = root.resolve("out/a")
    val d2 = root.resolve("out/b")
    var marked = false
    CommitProtocol.publish(staging, Seq(s1 -> d1, s2 -> d2)) { marked = true }
    assert(marked)
    assert(Files.readString(d1.resolve("data.txt")) == "one")
    assert(Files.readString(d2.resolve("data.txt")) == "two")
    assert(!Files.exists(staging), "staging root must be deleted")
  }

  test("failure before the marker rolls back every moved destination") {
    val root = tmp()
    val staging = root.resolve("staging")
    val s1 = stagedDir(staging, "a", "one")
    val d1 = root.resolve("out/a")
    // second move fails: its staged source does not exist
    val ghost = staging.resolve("ghost")
    val d2 = root.resolve("out/b")
    var marked = false
    intercept[java.nio.file.NoSuchFileException] {
      CommitProtocol.publish(staging, Seq(s1 -> d1, ghost -> d2)) { marked = true }
    }
    assert(!marked, "marker must not run after a failed move")
    assert(!Files.exists(d1), "the already-moved dest must be rolled back")
    assert(!Files.exists(staging), "staging root must be deleted on failure too")
  }

  test("failure INSIDE the marker leaves moved dirs as unmarked residue") {
    val root = tmp()
    val staging = root.resolve("staging")
    val s1 = stagedDir(staging, "a", "one")
    val d1 = root.resolve("out/a")
    intercept[RuntimeException] {
      CommitProtocol.publish(staging, Seq(s1 -> d1)) {
        // the marker may already have DESTROYED prior state (compaction
        // retires the old commit markers first) — deleting d1 here
        // could erase the only surviving copy
        throw new RuntimeException("marker swap failed halfway")
      }
    }
    assert(Files.readString(d1.resolve("data.txt")) == "one",
      "moved data must survive a marker failure")
  }

  test("destination residue from a crashed prior publish is cleared before the move") {
    val root = tmp()
    val d1 = root.resolve("out/a")
    Files.createDirectories(d1)
    Files.writeString(d1.resolve("stale.txt"), "crash residue")
    val staging = root.resolve("staging")
    val s1 = stagedDir(staging, "a", "fresh")
    CommitProtocol.publish(staging, Seq(s1 -> d1)) {}
    assert(Files.readString(d1.resolve("data.txt")) == "fresh")
    assert(!Files.exists(d1.resolve("stale.txt")), "residue must not leak into the publish")
  }
}
