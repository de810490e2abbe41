package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FuzzyJoinSpec extends SparkTestBase {

  private def keys(s: String, d: Int): Set[String] = {
    val sp = spark
    import sp.implicits._
    Seq(s).toDF("s").select(FuzzyJoin.deletionKeys("s", d).as("k"))
      .collect().head.getSeq[String](0).toSet
  }

  test("deletion neighborhood: identity plus every d-deletion, empty-safe") {
    assert(keys("abc", 1) == Set("abc", "bc", "ac", "ab"))
    assert(keys("abc", 2) == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    assert(keys("", 1) == Set(""))
    assert(keys("aa", 1) == Set("aa", "a")) // distinct collapses equal deletions
  }

  private def joined(d: Int, lefts: Seq[(Long, String)], rights: Seq[String]) = {
    val sp = spark
    import sp.implicits._
    FuzzyJoin.fuzzyJoin(
        lefts.toDF("id", "name"), rights.toDF("cname"), "name", "cname", d)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(3))).toSet
  }

  test("d=1 finds exact, substitution, deletion and insertion matches; distance-2 pairs excluded") {
    val out = joined(1,
      Seq((1L, "martha"), (2L, "martho"), (3L, "marta"), (4L, "marthas"),
          (5L, "mxrthx"), (6L, "zzzzzz")),
      Seq("martha"))
    assert(out == Set((1L, "martha", 0), (2L, "martha", 1),
      (3L, "martha", 1), (4L, "martha", 1)))
  }

  test("d=2 is exact against brute-force levenshtein over all pairs") {
    val sp = spark
    import sp.implicits._
    // deterministic string soup: digit mutations of a seed pattern
    val lefts = (0 until 60).map { i =>
      val base = f"name-${i % 12}%03d"
      val p = i % base.length
      val s = i % 4 match {
        case 0 => base
        case 1 => base.substring(0, p) + base.substring(math.min(p + 1, base.length)) // delete
        case 2 => base.substring(0, p) + "x" + base.substring(math.min(p + 1, base.length)) // sub
        case 3 => base.substring(0, p) + "xy" + base.substring(p) // double insert
      }
      (i.toLong, s)
    }
    val rights = (0 until 12).map(k => f"name-$k%03d")
    val got = joined(2, lefts, rights)
    val want = (for {
      (id, s) <- lefts; c <- rights
      d = {
        // reference Levenshtein
        val m = Array.tabulate(s.length + 1, c.length + 1) { (a, b) =>
          if (a == 0) b else if (b == 0) a else 0 }
        for (a <- 1 to s.length; b <- 1 to c.length)
          m(a)(b) = math.min(math.min(m(a - 1)(b) + 1, m(a)(b - 1) + 1),
            m(a - 1)(b - 1) + (if (s(a - 1) == c(b - 1)) 0 else 1))
        m(s.length)(c.length)
      }
      if d <= 2
    } yield (id, c, d)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("duplicate input rows keep their multiplicity (no full-row collapse)") {
    val sp = spark
    import sp.implicits._
    // two identical left rows AND two value-equal left rows with distinct ids
    val out = FuzzyJoin.fuzzyJoin(
        Seq((1L, "ab"), (1L, "ab"), (2L, "ab")).toDF("id", "name"),
        Seq("ab").toDF("cname"), "name", "cname", 1)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(3)))
    assert(out.sorted.toSeq == Seq((1L, "ab", 0), (1L, "ab", 0), (2L, "ab", 0)))
  }

  test("small reference side broadcasts; shuffles carry only the narrow internal columns") {
    val sp = spark
    import sp.implicits._
    val big = sp.range(0L, 5000L)
      .select(col("id"), concat(lit("row-"), format_string("%05d", col("id") % 200)).as("name"))
    val small = (0 until 200).map(k => f"row-$k%05d").toDF("cname")
    val out = FuzzyJoin.fuzzyJoin(big, small, "name", "cname", 1)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"exploded small side must broadcast:\n$plan")
    // AQE may elide any subset of the narrow shuffles (distinct-strings,
    // pair-dedup) — so assert the absence of BAD shapes, not exact counts:
    // no sort-merge join anywhere, and every hash-partitioning that does
    // survive is keyed on an internal narrow column, never the big side's
    // payload attributes.
    assert(!plan.contains("SortMergeJoin"), s"no sort-merge join allowed:\n$plan")
    val badKeys = "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).flatMap(_.group(1).split(",\\s*")).map(_.trim)
      .filter(_.nonEmpty).filterNot(_.matches("\\d+")) // drop numPartitions
      .filterNot(k => k.startsWith("_graft_fj_") || k.startsWith("dist#"))
      .toSeq
    assert(badKeys.isEmpty,
      s"payload columns must never hash-shuffle, got keys $badKeys:\n$plan")
  }

  test("null strings never match") {
    val sp = spark
    import sp.implicits._
    val out = FuzzyJoin.fuzzyJoin(
      Seq((1L, null.asInstanceOf[String]), (2L, "ab")).toDF("id", "name"),
      Seq("ab").toDF("cname"), "name", "cname", 1)
    assert(out.collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("fuzzyStringPairs equals fuzzyJoin's pair set on distinct string sides") {
    val sp = spark
    import sp.implicits._
    // random-ish short strings, duplicates removed — the ER candidate shape
    val names = (0 until 60).map(i => s"nm${('a' + i % 7).toChar}${('a' + (i / 7) % 5).toChar}")
      .distinct
    val a = names.toDF("na")
    val b = names.toDF("nb")
    val ref = FuzzyJoin.fuzzyJoin(a, b, "na", "nb", 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val got = FuzzyJoin.fuzzyStringPairs(a, b, "na", "nb", 1, "na", "nb")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === ref)
    // dedup=false may repeat pairs but never adds or loses one, and the
    // repeats carry identical dist (dist is a function of the pair)
    val loose = FuzzyJoin.fuzzyStringPairs(a, b, "na", "nb", 1, "na", "nb",
      dedup = false).collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(loose.toSet === ref)
  }

  test("phoneticStringPairs equals phoneticJoin's pair set on distinct string sides") {
    val sp = spark
    import sp.implicits._
    val names = Seq("smith", "smyth", "philips", "phillips", "nmab", "nmaf",
      "jonson", "johnson", "x", "")
    val a = names.toDF("na")
    val b = names.toDF("nb")
    val ref = Phonetic.phoneticJoin(a, b, "na", "nb", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val got = Phonetic.phoneticStringPairs(a, b, "na", "nb", 2, "na", "nb")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === ref)
  }

  test("column names needing backticks work; reserved internal names are rejected") {
    val sp = spark
    import sp.implicits._
    val out = FuzzyJoin.fuzzyJoin(
        Seq((1L, "ab"), (2L, "zz")).toDF("id", "the name"),
        Seq("ac").toDF("match-to"), "the name", "match-to", 1)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(3))).toSet
    assert(out == Set((1L, "ac", 1)))
    val err = intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzyJoin(Seq((1L, "ab")).toDF("dist", "name"),
        Seq("ab").toDF("cname"), "name", "cname", 1)
    }
    assert(err.getMessage.contains("reserved"))
  }
}
