package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for specs (one per suite, local[4]). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    Engine.session(appName = "graft-test", master = "local[4]",
      shufflePartitions = 4)
  val sfDir = "/root/testdata/sf0.001"
}
