package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.icelite.IceLite

/** IceLite commit semantics (SURVEY.md §5.2 item 4): atomicity, crash
  * safety (orphan data never becomes visible), read-at-snapshot. */
class IceLiteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("append and replace snapshots; read-at-snapshot") {
    import spark.implicits._
    val root = Files.createTempDirectory("icelite").toString
    val ice = new IceLite(root)
    val s0 = ice.writeCommit(Seq(1, 2, 3).toDF("x"), "t", "a", append = false,
      props = Map("round" -> "0"))
    val s1 = ice.writeCommit(Seq(4, 5).toDF("x"), "t", "b", append = true,
      props = Map("round" -> "1"))
    assert(s0 === 0L && s1 === 1L)
    assert(ice.read(spark, "t").get.count() === 5)
    assert(ice.read(spark, "t", Some(0L)).get.count() === 3)
    val s2 = ice.writeCommit(Seq(9).toDF("x"), "t", "c", append = false)
    assert(ice.read(spark, "t").get.count() === 1)
    assert(ice.read(spark, "t", Some(1L)).get.count() === 5)
    assert(ice.currentSnapshotId("t") === Some(s2))
    assert(ice.props("t").get("round") === None) // replace wrote no round
    assert(ice.manifest("t", 1L).props("round") === "1")
  }

  test("crash between data write and manifest rename leaves old snapshot intact") {
    import spark.implicits._
    val root = Files.createTempDirectory("icelite2").toString
    val ice = new IceLite(root)
    ice.writeCommit(Seq(1, 2).toDF("x"), "t", "a", append = false)
    // simulate a crash: data written, tmp manifest written, no rename
    val orphan = ice.writeData(Seq(99).toDF("x"), "t", "crash")
    Files.writeString(Paths.get(root, "t", "snapshot-1.json.tmp"),
      "{\"snapshot\":1,\"files\":[\"" + orphan + "\"]}")
    // a fresh reader sees only the committed snapshot
    val ice2 = new IceLite(root)
    assert(ice2.currentSnapshotId("t") === Some(0L))
    assert(ice2.read(spark, "t").get.count() === 2)
    // recovery: the next commit gets id 1 and ignores the orphan
    val s1 = ice2.writeCommit(Seq(3).toDF("x"), "t", "b", append = true)
    assert(s1 === 1L)
    assert(ice2.read(spark, "t").get.count() === 3)
  }

  test("expireSnapshots removes old manifests, unreferenced + orphan data") {
    import spark.implicits._
    val root = Files.createTempDirectory("icelite4").toString
    val ice = new IceLite(root)
    ice.writeCommit(Seq(1).toDF("x"), "t", "a", append = false)
    ice.writeCommit(Seq(2).toDF("x"), "t", "b", append = false) // replaces
    ice.writeCommit(Seq(3).toDF("x"), "t", "c", append = false) // replaces
    ice.writeData(Seq(9).toDF("x"), "t", "orphan") // never committed
    val (expired, deleted) = ice.expireSnapshots("t", keepLast = 1)
    assert(expired === 2)
    assert(deleted === 3) // two expired replace-dirs + one orphan
    assert(ice.currentSnapshotId("t") === Some(2L))
    assert(ice.read(spark, "t").get.collect().map(_.getInt(0)).toSeq === Seq(3))
    // expired snapshots are gone
    intercept[Exception](ice.manifest("t", 0L))
  }

  test("empty table reads as None") {
    val root = Files.createTempDirectory("icelite3").toString
    val ice = new IceLite(root)
    assert(ice.read(spark, "missing") === None)
    assert(ice.currentSnapshotId("missing") === None)
  }
}
