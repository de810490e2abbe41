package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** Governance of shallow clones — the r17 verdict's GDPR-vs-clone gap:
  * clones must be ENUMERABLE ([[Snapshots.clones]] — registry +
  * legacy naming convention), the erase paths must fail loudly while
  * clone pins keep the purged bytes alive (override:
  * `ignoreClonePins`), vacuum/expire must keep exactly the pinned
  * frontier under N concurrent clones, and cloning a CLONE must carry
  * the first clone's already-absolute references verbatim (the ADVICE
  * r17 absolutize bug: single-slash `file:/...` URIs re-prefixed).
  */
class CloneGovernanceSpec extends SparkTestBase {
  import spark.implicits._

  private def fresh(name: String): String =
    Files.createTempDirectory(s"graft_clonegov_$name").toString + "/t"

  private def ids(t: String, v: Option[Int] = None): Set[Long] =
    Snapshots.read(spark, t, v).select("id").as[Long].collect().toSet

  test("clones() enumerates auto AND named pins with version + dst; " +
       "dropClone releases both tag and registry entry") {
    val src = fresh("enum")
    val d1 = fresh("enum_c1")
    val d2 = fresh("enum_c2")
    Snapshots.commitOverwrite(spark, src, Seq(1L, 2L).toDF("id"))
    Snapshots.commitAppend(spark, src, Seq(3L).toDF("id"))
    val c1 = Snapshots.cloneTable(spark, src, d1, version = Some(1))
    val c2 = Snapshots.cloneTable(spark, src, d2, pinTag = Some("exp-fork"))
    assert(c2.pinTag == "exp-fork")
    val pins = Snapshots.clones(spark, src)
    assert(pins.map(_.tag).toSet == Set(c1.pinTag, "exp-fork"))
    assert(pins.find(_.tag == c1.pinTag).get.version == 1)
    assert(pins.find(_.tag == "exp-fork").get.version == 2)
    // dst recorded for both (qualified URI of the clone root)
    assert(pins.forall(_.dst.nonEmpty))
    assert(pins.find(_.tag == c1.pinTag).get.dst.contains(d1.stripPrefix("/")))
    // a bare legacy clone-* tag (no registry) is still reported
    Snapshots.tagVersion(spark, src, "clone-legacy1", 1)
    assert(Snapshots.clones(spark, src).map(_.tag).toSet ==
      Set(c1.pinTag, "exp-fork", "clone-legacy1"))
    // dropClone releases the claim; the registry row dies with it
    Snapshots.dropClone(spark, src, c1.pinTag)
    Snapshots.dropTag(spark, src, "clone-legacy1")
    assert(Snapshots.clones(spark, src).map(_.tag) == Seq("exp-fork"))
    // a dangling registry row (tag dropped via dropTag, registry left)
    // is DEAD — filtered, never resurrects a pin
    Snapshots.dropTag(spark, src, "exp-fork")
    assert(Snapshots.clones(spark, src).isEmpty)
    // ... and dropClone is the documented debris cleanup: it removes
    // the leftover registry half instead of throwing on the gone tag
    Snapshots.dropClone(spark, src, "exp-fork")
    intercept[IllegalArgumentException] {
      Snapshots.dropClone(spark, src, "exp-fork") // nothing left: loud
    }
  }

  test("erasePurgeCommit / deleteWhereCommit refuse while clone pins " +
       "live, naming them; override + dropped pins both unblock") {
    val src = fresh("erase")
    val dst = fresh("erase_c")
    Snapshots.commitOverwrite(spark, src,
      (0L until 10L).map(i => (i, s"u$i")).toDF("id", "name"),
      statsCols = Seq("id"))
    val info = Snapshots.cloneTable(spark, src, dst)
    val e = intercept[IllegalArgumentException] {
      Snapshots.erasePurgeCommit(spark, src, "id", Seq(3L).toDF("k"))
    }
    assert(e.getMessage.contains(info.pinTag) &&
      e.getMessage.contains("not an erasure"),
      s"the refusal must NAME the pins: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.deleteWhereCommit(spark, src,
        Seq(Snapshots.LongRange("id", 0L, 4L)))
    }
    assert(e2.getMessage.contains(info.pinTag))
    // explicit acknowledgment: the purge lands, but the clone still
    // serves the pre-purge rows (exactly the hazard the guard names)
    Snapshots.erasePurgeCommit(spark, src, "id", Seq(3L).toDF("k"),
      ignoreClonePins = true)
    assert(ids(src) == (0L until 10L).toSet - 3L)
    assert(ids(dst) == (0L until 10L).toSet)
    // with the clone dropped, the guard is gone
    Snapshots.dropClone(spark, src, info.pinTag)
    Snapshots.erasePurgeCommit(spark, src, "id", Seq(4L).toDF("k"))
    assert(ids(src) == (0L until 10L).toSet -- Set(3L, 4L))
  }

  test("eraseMoRCommit — the GDPR protocol's entry point — refuses on a " +
       "cloned table too; the override lands the logical delete") {
    val src = fresh("mor")
    val dst = fresh("mor_c")
    Snapshots.commitOverwrite(spark, src,
      (0L until 10L).map(i => (i, s"u$i")).toDF("id", "name"))
    val info = Snapshots.cloneTable(spark, src, dst)
    val e = intercept[IllegalArgumentException] {
      Snapshots.eraseMoRCommit(spark, src, "id", Seq(3L).toDF("k"))
    }
    assert(e.getMessage.contains(info.pinTag))
    Snapshots.eraseMoRCommit(spark, src, "id", Seq(3L).toDF("k"),
      ignoreClonePins = true)
    assert(ids(src) == (0L until 10L).toSet - 3L)
    assert(ids(dst) == (0L until 10L).toSet) // the clone, untouched
  }

  test("re-using a released pinTag overwrites the dead registry row: " +
       "clones() reports the NEW clone's root, not the dropped one's") {
    val src = fresh("reuse")
    val dA = fresh("reuse_a")
    val dB = fresh("reuse_b")
    Snapshots.commitOverwrite(spark, src, Seq(1L, 2L).toDF("id"))
    Snapshots.cloneTable(spark, src, dA, pinTag = Some("exp"))
    // released with a BARE dropTag (the pre-registry API): the registry
    // row stays behind as dead debris
    Snapshots.dropTag(spark, src, "exp")
    assert(Snapshots.clones(spark, src).isEmpty)
    Snapshots.cloneTable(spark, src, dB, pinTag = Some("exp"))
    val pins = Snapshots.clones(spark, src)
    assert(pins.size == 1 && pins.head.tag == "exp")
    assert(pins.head.dst.contains(dB.stripPrefix("/")),
      s"the registry must name the LIVE clone's root, got ${pins.head.dst}")
    assert(!pins.head.dst.contains(dA.stripPrefix("/")))
  }

  test("vacuum/expire keep EXACTLY the clone-pinned frontier under N " +
       "clones; dropped pins release their versions") {
    val src = fresh("vac")
    val d1 = fresh("vac_c1")
    val d2 = fresh("vac_c2")
    for (i <- 1 to 5)
      if (i == 1) Snapshots.commitOverwrite(spark, src, Seq(i.toLong).toDF("id"))
      else Snapshots.commitOverwrite(spark, src,
        (1L to i.toLong).toDF("id")) // overwrites: each version has own files
    val c1 = Snapshots.cloneTable(spark, src, d1, version = Some(2))
    val c2 = Snapshots.cloneTable(spark, src, d2, version = Some(4))
    // a numeric horizon past everything keeps the pinned 2 and 4 (and
    // the head) — vacuumPlan and vacuum agree
    val plan = Snapshots.vacuumPlan(spark, src, keepFrom = 5)
    assert(plan.dropVersions == Seq(1, 3))
    Snapshots.vacuum(spark, src, keepFrom = 5)
    assert(Snapshots.versions(spark, src) == Seq(2, 4, 5))
    // both clones still read their full pinned snapshots (shared files
    // survived the vacuum)
    assert(ids(d1) == Set(1L, 2L))
    assert(ids(d2) == Set(1L, 2L, 3L, 4L))
    // drop one pin: its version becomes reclaimable, the other stays
    Snapshots.dropClone(spark, src, c1.pinTag)
    Snapshots.vacuum(spark, src, keepFrom = 5)
    assert(Snapshots.versions(spark, src) == Seq(4, 5))
    assert(ids(d2) == Set(1L, 2L, 3L, 4L)) // c2 untouched
    Snapshots.dropClone(spark, src, c2.pinTag)
    Snapshots.vacuum(spark, src, keepFrom = 5)
    assert(Snapshots.versions(spark, src) == Seq(5))
    assert(ids(src) == (1L to 5L).toSet)
  }

  test("clone of a CLONE: the first clone's absolute URI references " +
       "carry verbatim — reads of the second clone serve the rows " +
       "(ADVICE r17: single-slash file:/ URIs must not re-prefix)") {
    val base = fresh("cc")
    val c1 = fresh("cc_1")
    val c2 = fresh("cc_2")
    Snapshots.commitOverwrite(spark, base,
      (0L until 8L).map(i => (i, s"d$i")).toDF("id", "doc"))
    Snapshots.eraseMoRCommit(spark, base, "id", Seq(6L).toDF("k"))
    Snapshots.cloneTable(spark, base, c1)
    // c1's manifest lines are makeQualified URIs ("file:/..."): cloning
    // it BEFORE any compaction is exactly the re-prefix hazard
    Snapshots.cloneTable(spark, c1, c2)
    assert(ids(c2) == (0L until 8L).toSet - 6L,
      "clone-of-clone must read the shared bytes, not dangling " +
        "re-prefixed paths")
    assert(ids(c2) == ids(c1) && ids(c1) == ids(base))
    // divergence stays three-way independent
    Snapshots.commitAppend(spark, c2, Seq((100L, "x")).toDF("id", "doc"))
    assert(ids(c2).contains(100L) && !ids(c1).contains(100L) &&
      !ids(base).contains(100L))
    // and c2's pin lives on c1 (its source), not on base
    assert(Snapshots.clones(spark, c1).size == 1)
    assert(Snapshots.clones(spark, base).size == 1)
  }
}
