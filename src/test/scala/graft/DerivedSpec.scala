package graft

import org.apache.spark.storage.StorageLevel
import graft.ext.Dedup

/** Derived-frame registry: build-once semantics, cache ownership
  * (resolveClusters must not evict a registry-owned frame), and
  * explicit lifecycle.
  */
class DerivedSpec extends SparkSpec {
  import spark.implicits._

  test("frame builds once, returns the cached instance, clear releases") {
    Derived.clear()
    var builds = 0
    def build = { builds += 1; Seq((1L, 2L)).toDF("a_id", "b_id") }
    val a = Derived.frame("derived-spec-key")(build)
    val b = Derived.frame("derived-spec-key")(build)
    assert(builds == 1, "second access must not rebuild")
    assert(a eq b)
    assert(a.storageLevel != StorageLevel.NONE, "registry frame is cached")
    assert(Derived.keys.contains("derived-spec-key"))
    Derived.clear()
    assert(a.storageLevel == StorageLevel.NONE, "clear unpersists")
    assert(Derived.keys.isEmpty)
  }

  test("resolveClusters leaves a registry-owned edge frame cached") {
    Derived.clear()
    val edges = Derived.frame("derived-spec-edges")(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id"))
    val out = Dedup.resolveClusters(edges).as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
    assert(edges.storageLevel != StorageLevel.NONE,
      "shared frame must survive resolveClusters")
    Derived.clear()
  }

  test("adopt hands an iteration result's cache to the registry") {
    Derived.clear()
    val ranks = graft.ext.Graph.pageRankOnEdges(
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), iters = 1)
    assert(ranks.storageLevel != StorageLevel.NONE,
      "final loop frame must stay cached for the caller")
    assert(Derived.keys.exists(_.startsWith("adopted:")))
    Derived.clear()
    assert(ranks.storageLevel == StorageLevel.NONE,
      "clear must release adopted frames too")
  }

  test("non-registry edge frames are still persist/unpersist managed") {
    val edges = Seq((1L, 2L)).toDF("a_id", "b_id")
    Dedup.resolveClusters(edges).collect()
    assert(edges.storageLevel == StorageLevel.NONE,
      "locally-owned frame is unpersisted after resolution")
  }
}
