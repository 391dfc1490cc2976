package graft

import graft.sinks.ServingStore

/** The fit-once orchestration contract: ensure() runs the fit exactly
  * once per (inputs fingerprint, version), refits when either
  * changes, and keys distinct store roots for distinct keys even when
  * path sanitization collides. (The dim-level round-trip contracts
  * live in ModelStoreSpec; these are the lifecycle ones.) */
class ServingStoreSpec extends GraftSuite {

  test("ensure fits once per fingerprint; version bump and input change refit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-svs").toString
    val data = java.nio.file.Paths.get(dir, "data.txt")
    java.nio.file.Files.write(data, "abc".getBytes("UTF-8"))
    var fits = 0
    def ensure(v: String): String =
      ServingStore.ensure(dir + "#spec", Seq(data.toString), v) { _ => fits += 1 }
    val r1 = ensure("v1")
    assert(fits == 1)
    // Current store: the second ensure is a fingerprint no-op.
    assert(ensure("v1") == r1 && fits == 1)
    // A format-version bump must refit the same inputs (the
    // stale-cache-fails-on-missing-dim hazard the version exists for).
    ensure("v2")
    assert(fits == 2)
    // An input content change (size here — mtime granularity cannot
    // mask a byte-count change) must refit.
    java.nio.file.Files.write(data, "abcd".getBytes("UTF-8"))
    ensure("v2")
    assert(fits == 3)
    // A missing input is a distinct fingerprint state, not an error —
    // regenerated data refits rather than serving a stale store.
    java.nio.file.Files.delete(data)
    ensure("v2")
    assert(fits == 4)
  }

  test("a failed fit leaves no fingerprint — the next ensure retries") {
    val dir = java.nio.file.Files.createTempDirectory("graft-svs2").toString
    var attempts = 0
    def ensure(fail: Boolean): String =
      ServingStore.ensure(dir + "#retry", Seq(dir), "v1") { _ =>
        attempts += 1
        if (fail) sys.error("fit exploded mid-save")
      }
    intercept[RuntimeException] { ensure(fail = true) }
    assert(attempts == 1)
    // The crash contract: fingerprint is written LAST, so the failed
    // fit must not read as current.
    ensure(fail = false)
    assert(attempts == 2)
    ensure(fail = false)
    assert(attempts == 2)
  }

  test("distinct keys get distinct roots even when sanitization collides") {
    assert(ServingStore.rootFor("/d/sf0 1") != ServingStore.rootFor("/d/sf0_1"))
    // Same key, same root — the cache is reusable across sessions.
    assert(ServingStore.rootFor("/d/sf0.1") == ServingStore.rootFor("/d/sf0.1"))
  }
}
