package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.spark

class GraftExtensionsSpec extends AnyFunSuite {

  test("graft_dot is callable from SQL after registration and matches the manual sum") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(
        |  CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
        |  CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d""".stripMargin)
      .collect().head.getDouble(0)
    assert(r == 32.0)
  }

  test("graft_dot handles nulls and length mismatch like a native function") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<FLOAT>), CAST(array(1.0) AS ARRAY<FLOAT>)) AS d")
      .collect().head.isNullAt(0))
    // mismatched lengths: dot over the common prefix
    assert(spark.sql(
      """SELECT graft_dot(CAST(array(2.0, 9.0) AS ARRAY<FLOAT>),
        |                 CAST(array(3.0) AS ARRAY<FLOAT>)) AS d""".stripMargin)
      .collect().head.getDouble(0) == 6.0)
  }
}
