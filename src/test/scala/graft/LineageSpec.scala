package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}

/** [[Lineage.cut]] deployment switch: iterative loops must take the
  * RELIABLE checkpoint path when a checkpoint dir is configured (the
  * 100 TB-cluster conf, where localCheckpoint dies with any executor)
  * and fall back to localCheckpoint on bare local mode — with
  * identical results either way.
  */
class LineageSpec extends AnyFunSuite {

  /** setCheckpointDir has no public unset; restore None reflectively
    * so the shared session leaves other suites on the fast
    * localCheckpoint path. */
  private def withCheckpointDir[A](body: String => A): A = {
    val sc = spark.sparkContext
    require(sc.getCheckpointDir.isEmpty, "expected no checkpoint dir configured")
    val dir = java.nio.file.Files.createTempDirectory("graft_reliable_ckpt")
    sc.setCheckpointDir(dir.toString)
    try body(dir.toString)
    finally {
      val f = sc.getClass.getDeclaredField("checkpointDir")
      f.setAccessible(true)
      f.set(sc, None)
      assert(sc.getCheckpointDir.isEmpty, "failed to restore checkpoint dir")
    }
  }

  private def filesUnder(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
  }

  test("cut writes a reliable checkpoint (replayable files on the cluster FS) when a dir is configured") {
    import spark.implicits._
    val before = spark.range(1000).map(_ * 2).toDF("v")
    withCheckpointDir { dir =>
      val cut = Lineage.cut(before)
      assert(filesUnder(dir).exists(_.getName.startsWith("part-")),
        "no RDD checkpoint files were written — cut took the executor-pinned local path")
      assert(cut.as[Long].collect().sorted.toSeq == (0L until 1000L).map(_ * 2),
        "checkpointed data does not round-trip")
    }
  }

  test("pagerank result is identical on the localCheckpoint and reliable-checkpoint paths") {
    def run() = graft.operators.Graph.pagerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    val local = run()
    val reliable = withCheckpointDir { _ => run() }
    assert(local == reliable,
      "iterative loop diverged between lineage-cut implementations")
  }
}
