package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Materialize

/** Build-once marker semantics: matching marker skips, changed tag
  * rebuilds, and — the crash-safety property — a build that THROWS leaves
  * no marker, so the next call rebuilds instead of trusting torn output. */
class MaterializeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("ERROR")
  override def afterAll(): Unit = spark.stop()

  test("onceAt: builds once per tag, rebuilds on tag change, skips on match") {
    val loc = new Path(Files.createTempDirectory("matspec").toString, "t1")
    var builds = 0
    assert(Materialize.onceAt(spark, loc, "src:a") { builds += 1 })
    assert(!Materialize.onceAt(spark, loc, "src:a") { builds += 1 })
    assert(builds == 1, "matching marker must skip the build")
    assert(Materialize.onceAt(spark, loc, "src:b") { builds += 1 })
    assert(builds == 2, "changed tag must rebuild")
    assert(!Materialize.onceAt(spark, loc, "src:b") { builds += 1 })
    assert(builds == 2)
  }

  test("onceAt: a throwing build leaves no marker — next call rebuilds") {
    val loc = new Path(Files.createTempDirectory("matspec").toString, "t2")
    intercept[RuntimeException] {
      Materialize.onceAt(spark, loc, "src:a") { sys.error("torn build") }
    }
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new Path(loc, "_graft_src")),
      "marker must only appear AFTER a successful build")
    var built = false
    assert(Materialize.onceAt(spark, loc, "src:a") { built = true })
    assert(built, "retry after a torn build must re-run the build")
  }
}
