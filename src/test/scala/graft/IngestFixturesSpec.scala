package graft

import graft.sources.IngestFixtures
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-root hygiene: [[IngestFixtures.path]] registers every
  * fixture directory this JVM touches, and [[IngestFixtures.gcStale]]
  * sweeps the rest — so stale generations (old testdata fingerprints'
  * stores, landing zones, checkpoints) stop accumulating under the
  * fixture root across rounds. Tested against a scratch root: the
  * real root is live state shared with the other suites in this JVM.
  */
class IngestFixturesSpec extends AnyFunSuite {

  test("gcStale sweeps untracked dirs and keeps tracked ones") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_fixture_gc").toString
    def mk(name: String): java.io.File = {
      val d = new java.io.File(root, name)
      d.mkdirs()
      java.nio.file.Files.write(new java.io.File(d, "part").toPath,
        "x".getBytes)
      d
    }
    val keep = mk("s99_store_deadbeef")
    val stale1 = mk("s99_store_oldfingerprint")
    val stale2 = mk("e99_ckpt_oldfingerprint")
    val live = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    live.add(keep.getAbsolutePath)
    val swept = IngestFixtures.gcStale(root, live)
    assert(swept.toSet === Set(stale1.getName, stale2.getName))
    assert(keep.exists() && new java.io.File(keep, "part").exists())
    assert(!stale1.exists() && !stale2.exists())
    // idempotent: a second sweep finds nothing
    assert(IngestFixtures.gcStale(root, live).isEmpty)
  }

  test("path() registers under the fixture root") {
    val p = IngestFixtures.path("spec_probe_key")
    assert(p == s"${IngestFixtures.Root}/spec_probe_key")
  }
}
