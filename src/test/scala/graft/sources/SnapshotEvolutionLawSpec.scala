package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** LAW property test for additive schema evolution: a RANDOM sequence of
  * commits — old-shape appends, evolved appends (each evolution step adds
  * one more trailing column), and overwrites that reset the shape — must
  * leave every version readable with exactly the rows and null-fill
  * pattern a trivial in-memory MODEL predicts. This pins the interaction
  * surface single-case tests cannot enumerate: evolution after
  * overwrite-reset, repeated old-shape appends straddling several
  * evolution levels, time travel into the middle of a shape run, and the
  * committed-schema read path under every interleaving.
  */
class SnapshotEvolutionLawSpec extends SparkTestBase {
  import spark.implicits._

  // shapes: level L = columns id, c1 .. cL (all long)
  private def cols(level: Int): Seq[String] = "id" +: (1 to level).map(i => s"c$i")

  private def batch(rows: Seq[Long], level: Int) = {
    val base = rows.toDF("id")
    cols(level).drop(1).foldLeft(base) { (df, c) =>
      df.withColumn(c, col("id") * c.drop(1).toInt)
    }
  }

  test("random commit sequences match the in-memory evolution model") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 5).foreach { trial =>
      val t = java.nio.file.Files.createTempDirectory("graft_evo").toString + "/t"
      // model: per version, (schema level, rows = Seq[(id, insertedAtLevel)])
      var modelRows = Vector.empty[(Long, Int)]
      var level = 1
      var nextId = 0L
      var versions = Vector.empty[(Int, Vector[(Long, Int)], Int)] // (v, rows, level)
      Snapshots.commitOverwrite(spark, t, batch(Seq(nextId), level))
      modelRows = Vector((nextId, level)); nextId += 1
      versions :+= ((1, modelRows, level))
      (0 until 12).foreach { _ =>
        val ids = Seq(nextId, nextId + 1); nextId += 2
        rnd.nextInt(4) match {
          case 0 => // old-shape append at SOME level <= current (null-fills)
            val lvl = 1 + rnd.nextInt(level)
            Snapshots.commitAppend(spark, t, batch(ids, lvl), evolve = true)
            modelRows ++= ids.map(i => (i, lvl))
          case 1 => // evolve: append with one more trailing column
            level += 1
            Snapshots.commitAppend(spark, t, batch(ids, level), evolve = true)
            modelRows ++= ids.map(i => (i, level))
          case 2 => // same-shape append
            Snapshots.commitAppend(spark, t, batch(ids, level), evolve = true)
            modelRows ++= ids.map(i => (i, level))
          case 3 => // overwrite resets shape AND rows to a fresh level
            level = 1 + rnd.nextInt(3)
            Snapshots.commitOverwrite(spark, t, batch(ids, level))
            modelRows = ids.map(i => (i, level)).toVector
        }
        versions :+= ((versions.last._1 + 1, modelRows, level))
      }
      // EVERY version must read back exactly per the model, under its
      // own committed schema
      versions.foreach { case (v, rows, lvl) =>
        val df = Snapshots.read(spark, t, Some(v))
        assert(df.columns.toSeq == cols(lvl),
          s"trial $trial v$v: schema ${df.columns.toSeq} != ${cols(lvl)}")
        val got = df.select(col("id") +:
            (1 to lvl).map(i => col(s"c$i")): _*)
          .collect()
          .map(r => (r.getLong(0),
            (1 to lvl).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))))
          .toMap
        assert(got.keySet == rows.map(_._1).toSet,
          s"trial $trial v$v: id set mismatch")
        rows.foreach { case (id, insLvl) =>
          val want = (1 to lvl).map(i =>
            if (i <= insLvl) Some(id * i) else None) // columns past the
          // row's insertion level were added later -> null-filled
          assert(got(id) == want,
            s"trial $trial v$v id $id (inserted at level $insLvl, read at " +
              s"level $lvl): got ${got(id)}, want $want")
        }
      }
    }
  }
}
