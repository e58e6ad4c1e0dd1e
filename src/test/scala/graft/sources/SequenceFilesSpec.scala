package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.spark

/** The reference's on-disk input format: SequenceFiles of
  * `<LongWritable, IntArrayWritable>`. Beyond the oracled roundtrip
  * query, the interop claim worth a dedicated proof is reading a file
  * whose header records MAHOUT's value-class name — which is what
  * every reference-written corpus carries — without Mahout on the
  * classpath.
  */
class SequenceFilesSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("seq_id", LongType),
    StructField("syms", ArrayType(IntegerType))))

  private val rows = Seq(
    Row(1L, Seq(3, 1, 4, 1, 5)),
    Row(2L, Seq.empty[Int]), // zero-length sequences must survive
    Row(7L, Seq(2, 7)),
    Row(9L, (0 until 200).map(_ % 5)))

  private def writeRows(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_seqf_$tag")
      .toFile.getAbsolutePath
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    new java.io.File(dir).delete() // saveAsHadoopFile wants to create it
    SequenceFiles.writeIntArray(df, dir)
    dir
  }

  private def readBack(dir: String): Seq[(Long, Seq[Int])] =
    SequenceFiles.readIntArray(spark, dir).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq.sortBy(_._1)

  test("write/read roundtrip preserves ids, symbols, order, and empty sequences") {
    val dir = writeRows("rt")
    assert(readBack(dir) == rows.map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1))
  }

  test("a header carrying Mahout's value-class name resolves through the WritableName alias, without Mahout on the classpath") {
    // precondition making the test meaningful: if the Mahout class
    // were loadable, Hadoop's conf.getClassByName fallback would mask
    // a broken alias
    assertThrows[ClassNotFoundException](
      Class.forName(SequenceFiles.MahoutValueClass))

    // forge a genuine reference-written file: rewrite each part
    // file's header value-class string (vint length + UTF-8 bytes;
    // both names are < 128 bytes so the vint is the single length
    // byte) from graft's name to Mahout's. Record payloads carry no
    // class names, so the splice is the only change needed.
    val dir = writeRows("mahout")
    val graftName = classOf[IntArrayWritable].getName
    val needle = graftName.length.toByte +: graftName.getBytes("UTF-8")
    val repl = SequenceFiles.MahoutValueClass.length.toByte +:
      SequenceFiles.MahoutValueClass.getBytes("UTF-8")
    val parts = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty)
    parts.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val idx = bytes.indexOfSlice(needle)
      assert(idx > 0, s"value-class name not found in ${f.getName} header")
      java.nio.file.Files.write(f.toPath,
        (bytes.take(idx) ++ repl ++ bytes.drop(idx + needle.length)).toArray)
    }
    // the splice (same length, different bytes) invalidates Hadoop
    // LocalFileSystem's `.part-*.crc` sidecars; a real reference-
    // written corpus has consistent checksums, so drop the stale ones
    // rather than let ChecksumException shadow the alias under test
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith(".") && f.getName.endsWith(".crc"))
      .foreach(f => assert(f.delete(), s"could not delete stale ${f.getName}"))
    assert(readBack(dir) == rows.map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1),
      "reference-format file did not read back identically")
  }
}
