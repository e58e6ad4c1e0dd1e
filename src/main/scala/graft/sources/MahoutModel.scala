package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{DoubleWritable, IntWritable, MapWritable, SequenceFile, Text, Writable}
import org.apache.spark.sql.SparkSession

import graft.hmm.HmmModel

/** Interop with the reference's trained-model directories: Hadoop
  * SequenceFiles of `<Text stripeKey, MapWritable>` under part-*
  * files (BaumWelchUtils.java:147-226 write, 56-125 read). A user
  * migrating from the reference has `model-N` dirs in exactly this
  * layout; this module loads them onto [[graft.hmm.HmmModel]] and can
  * write a model back so the reference can read it.
  *
  * Stripe layout (BaumWelchUtils.WriteModelToDirectory):
  *  - `INITIAL`   → MapWritable(IntWritable state → DoubleWritable π)
  *  - `TRANSIT_i` → MapWritable(IntWritable j → DoubleWritable A(i,j))
  *  - `EMIT_i`    → MapWritable(IntWritable j → DoubleWritable B(i,j))
  *
  * All value classes are plain Hadoop io (no Mahout class names in
  * the container header — unlike the corpus files, no WritableName
  * alias is needed). The reference's reader recovers the state id
  * from a SINGLE character (`key.charAt(8)` / `key.charAt(5)`,
  * BaumWelchUtils.java:100,111), which silently breaks at ≥ 10
  * hidden states; this reader parses the full `_`-suffix — a strict
  * superset that agrees with the reference on every model the
  * reference itself can round-trip.
  *
  * Models are tiny (K,M ≲ 100s → ≪ 1 MB), so IO is driver-side
  * single-file — the same shape as the reference's `part-randomSeed`.
  */
object MahoutModel {

  /** True iff `path` looks like a reference model dir: contains a
    * part-* file opening with the SequenceFile magic "SEQ". Used by
    * TrainHmm's --model-in to auto-route between this format and
    * ModelIO parquet.
    */
  def isMahoutModelDir(spark: SparkSession, path: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.getFileStatus(p).isDirectory && {
      val parts = partFiles(spark, path)
      parts.nonEmpty && {
        val in = fs.open(parts.head)
        // a truncated (<3 byte) part-* file is "not a Mahout dir", not a
        // crash: detection must degrade to the parquet loader's own error
        try {
          val magic = new Array[Byte](3)
          in.readFully(0, magic)
          new String(magic, "US-ASCII") == "SEQ"
        } catch {
          case _: java.io.IOException => false
        } finally in.close()
      }
    }
  }

  private def partFiles(spark: SparkSession, path: String): Seq[Path] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Nil
    else if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .map(_.getPath).sortBy(_.getName)
    else Seq(p)
  }

  /** Load a reference model dir. The format carries no name maps
    * (names live with the corpus vocabulary in the reference's
    * pipeline), so the result is unnamed — callers align symbols
    * positionally, exactly as the reference consumes it.
    */
  def read(spark: SparkSession, path: String): HmmModel = {
    val conf = spark.sparkContext.hadoopConfiguration
    val parts = partFiles(spark, path)
    require(parts.nonEmpty, s"no part-* model stripes under $path")
    val pi = scala.collection.mutable.Map.empty[Int, Double]
    val a = scala.collection.mutable.Map.empty[(Int, Int), Double]
    val b = scala.collection.mutable.Map.empty[(Int, Int), Double]
    parts.foreach { f =>
      val reader = new SequenceFile.Reader(conf, SequenceFile.Reader.file(f))
      try {
        val key = new Text()
        val value = new MapWritable()
        while (reader.next(key, value)) {
          def entries: Iterator[(Int, Double)] =
            value.entrySet().iterator().asInstanceOf[java.util.Iterator[
              java.util.Map.Entry[Writable, Writable]]].asScala.map { e =>
              (e.getKey.asInstanceOf[IntWritable].get,
                e.getValue.asInstanceOf[DoubleWritable].get)
            }
          val k = key.toString
          if (k == "INITIAL") entries.foreach { case (i, v) => pi(i) = v }
          else if (k.startsWith("TRANSIT_")) {
            val i = k.stripPrefix("TRANSIT_").toInt
            entries.foreach { case (j, v) => a((i, j)) = v }
          } else if (k.startsWith("EMIT_")) {
            val i = k.stripPrefix("EMIT_").toInt
            entries.foreach { case (j, v) => b((i, j)) = v }
          } else
            // reference behavior (BaumWelchUtils.java:118)
            throw new IllegalStateException(
              s"unrecognized model stripe key '$k' in $f")
        }
      } finally reader.close()
    }
    require(pi.nonEmpty && a.nonEmpty && b.nonEmpty,
      s"model dir $path is missing INITIAL/TRANSIT/EMIT stripes")
    val numStates = pi.keys.max + 1
    val numSymbols = b.keys.map(_._2).max + 1
    val model = HmmModel(
      numStates, numSymbols,
      Array.tabulate(numStates)(i => pi.getOrElse(i, 0.0)),
      Array.tabulate(numStates, numStates)((i, j) => a.getOrElse((i, j), 0.0)),
      Array.tabulate(numStates, numSymbols)((i, j) => b.getOrElse((i, j), 0.0)))
    model.validate(1e-6) // reference validates on load (HmmUtils.validate)
    model
  }

  /** Write a model as the reference's dir layout: one
    * `part-randomSeed` SequenceFile with the INITIAL stripe first,
    * then TRANSIT_i, then EMIT_i (BaumWelchUtils.java:203-217). The
    * reference can load the result with CreateHmmModel as-is (state
    * count ≤ 10 there — ITS single-char key parse, not a format
    * limit).
    */
  def write(spark: SparkSession, model: HmmModel, path: String): Unit = {
    // graft's reader parses the full TRANSIT_/EMIT_ suffix, but the
    // reference's charAt(8)/charAt(5) parser mis-reads stripe indices
    // >= 10 (TRANSIT_12 -> state 1): exports meant for the reference
    // must stay under 10 states, so warn loudly at write time
    if (model.numStates >= 10)
      System.err.println(
        s"[mahout-model] WARNING: writing ${model.numStates} states; the reference's " +
          "single-char stripe parser corrupts TRANSIT_10+/EMIT_10+ on load — " +
          "this dir is readable by graft but NOT safely by the reference")
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    val out = new Path(dir, "part-randomSeed")
    val writer = SequenceFile.createWriter(conf,
      SequenceFile.Writer.file(out),
      SequenceFile.Writer.keyClass(classOf[Text]),
      SequenceFile.Writer.valueClass(classOf[MapWritable]))
    try {
      def innerMap(row: Array[Double]): MapWritable = {
        val m = new MapWritable()
        row.zipWithIndex.foreach { case (v, j) =>
          m.put(new IntWritable(j), new DoubleWritable(v))
        }
        m
      }
      writer.append(new Text("INITIAL"), innerMap(model.pi))
      model.a.zipWithIndex.foreach { case (row, i) =>
        writer.append(new Text(s"TRANSIT_$i"), innerMap(row))
      }
      model.b.zipWithIndex.foreach { case (row, i) =>
        writer.append(new Text(s"EMIT_$i"), innerMap(row))
      }
    } finally writer.close()
  }
}
