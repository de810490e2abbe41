package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

class PhoneticSpec extends SparkTestBase {

  private def check(n: Int)(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private def keys(names: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    names.toDF("n").select(Phonetic.key(col("n"))).collect().map(_.getString(0)).toSeq
  }

  test("classic sound-alike families share a key") {
    assert(keys("Phillips", "PHILIPS") == Seq("P412", "P412"))
    assert(keys("Smith", "Smyth") == Seq("S530", "S530"))
    assert(keys("Robert", "Rupert") == Seq("R163", "R163"))
  }

  test("degenerate inputs: no letters key to empty, NULL stays NULL") {
    assert(keys("", "123", "  -  ") == Seq("", "", ""))
    val s = spark
    import s.implicits._
    val r = Seq[Option[String]](None).toDF("n")
      .select(Phonetic.key(col("n"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("non-letter characters are stripped before coding") {
    // letters ABC -> code 012 -> tail "12" -> A120
    assert(keys("a b-c!") == Seq("A120"))
  }

  test("phoneticJoin blocks doubled consonants and vowel tails, verify bounds the distance") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "phillips"), (2L, "smyth"), (3L, "brown"))
      .toDF("id", "name")
    val right = Seq(("philips"), ("smith"), ("green")).toDF("cname")
    val out = Phonetic.phoneticJoin(left, right, "name", "cname", maxDist = 2)
      .select("id", "cname", "dist").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(out == Set((1L, "philips", 1), (2L, "smith", 1)))
  }

  test("maxDist < 0 disables the verify: pure phonetic equality") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "nmb")).toDF("id", "name")
    val right = Seq(("nmbaeio")).toDF("cname")
    assert(Phonetic.phoneticJoin(left, right, "name", "cname", maxDist = 2).isEmpty)
    val out = Phonetic.phoneticJoin(left, right, "name", "cname", maxDist = -1)
      .select("dist").collect().map(_.getInt(0)).toSeq
    assert(out == Seq(4))
  }

  test("input cardinality is preserved: duplicate rows each emit") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "smith"), (2L, "smith")).toDF("id", "name")
    val right = Seq(("smyth")).toDF("cname")
    val out = Phonetic.phoneticJoin(left, right, "name", "cname", maxDist = 2)
    assert(out.count() == 2)
  }

  test("property: key shape, doubling invariance, vowel-tail invariance") {
    // the two mutation classes the driver query stakes its blocking
    // guarantee on, checked over arbitrary letter strings in one
    // DataFrame pass per generated batch
    val s = spark
    import s.implicits._
    val letters = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaChar).map(_.mkString))
    val batch = Gen.listOfN(12, for {
      w <- letters
      pos <- Gen.chooseNum(0, 100)
      vowel <- Gen.oneOf("a", "e", "i", "o", "u", "y")
    } yield (w, pos, vowel))
    check(8)(Prop.forAll(batch) { rows =>
      val df = rows.map { case (w, pos, v) =>
        val p = pos % w.length
        val doubled = w.substring(0, p + 1) + w.substring(p)
        (w, doubled, w + v + v)
      }.toDF("w", "doubled", "tailed")
      val bad = df.select(
        Phonetic.key(col("w")).as("k"),
        Phonetic.key(col("doubled")).as("kd"),
        Phonetic.key(col("tailed")).as("kt"))
        .filter(col("k") =!= col("kd") || col("k") =!= col("kt") ||
          !col("k").rlike("^[A-Z][0-9]{3}$"))
        .count()
      bad == 0L
    })
  }

  test("segmented candidates are EXACT: phoneticJoin == brute-force " +
       "key-equality x levenshtein on random corpora") {
    val s = spark
    import s.implicits._
    // short words, tight alphabet and systematic variants so buckets are
    // hot, edit distances cluster around the budget, and string lengths
    // straddle the short-string (< d+1) fallback path
    val word = Gen.chooseNum(1, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd', 'm', 'n')).map(_.mkString))
    val corpus = Gen.listOfN(25, word)
    for (d <- Seq(1, 2, 3)) {
      check(6)(Prop.forAll(corpus) { ws =>
        val names = ws.distinct
        val left = names.zipWithIndex.map { case (w, i) => (i.toLong, w) }
          .toDF("lid", "lname")
        val right = names.zipWithIndex.map { case (w, i) => (i.toLong + 1000, w) }
          .toDF("rid", "rname")
        val got = Phonetic.phoneticJoin(left, right, "lname", "rname", d)
          .select("lname", "rname", "dist")
          .as[(String, String, Int)].collect().toSet
        // brute force over the same distinct universe
        val ref = left.select(col("lname")).distinct()
          .crossJoin(right.select(col("rname")).distinct())
          .filter(Phonetic.key(col("lname")) === Phonetic.key(col("rname")))
          .withColumn("dist", levenshtein(col("lname"), col("rname")))
          .filter(col("dist") <= d)
          .as[(String, String, Int)].collect().toSet
        // phoneticJoin re-attaches per input row; same universe on both
        // sides here, so pair sets must match exactly
        val gotPairs = got.map(t => (t._1, t._2, t._3))
        gotPairs == ref
      })
    }
  }

  test("reserved and overlapping columns are rejected") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "x")).toDF("id", "name")
    val b = Seq((1L, "x")).toDF("id", "cname")
    intercept[IllegalArgumentException] {
      Phonetic.phoneticJoin(a, b, "name", "cname", 1)
    }
    val c = Seq(("x", "y")).toDF("cname", "dist")
    intercept[IllegalArgumentException] {
      Phonetic.phoneticJoin(a.drop("id"), c, "name", "cname", 1)
    }
  }
}
