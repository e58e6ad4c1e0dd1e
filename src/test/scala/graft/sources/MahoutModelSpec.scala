package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{DoubleWritable, IntWritable, MapWritable, SequenceFile, Text}
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}
import graft.hmm.{BaumWelch, HmmModel, ModelIO, Sequencer, TrainHmm}

/** Interop with the reference's trained-model dirs (SequenceFile of
  * Text → MapWritable stripes, BaumWelchUtils.java:147-226 / 56-125).
  * The forged dirs here are written with the RAW Hadoop API, stripe
  * for stripe as the reference writes them — not through
  * MahoutModel.write — so a green read proves format compatibility,
  * not self-consistency.
  */
class MahoutModelSpec extends AnyFunSuite {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toFile.getAbsolutePath

  /** Forge a model dir exactly as BaumWelchUtils.WriteModelToDirectory
    * does: one part-randomSeed SequenceFile, INITIAL first, then the
    * TRANSIT_i and EMIT_i stripes (insertion order irrelevant to the
    * reader, as in the reference).
    */
  private def forgeReferenceDir(m: HmmModel): String = {
    val dir = tmp("graft_mahout_forge")
    val conf = spark.sparkContext.hadoopConfiguration
    val writer = SequenceFile.createWriter(conf,
      SequenceFile.Writer.file(new Path(dir, "part-randomSeed")),
      SequenceFile.Writer.keyClass(classOf[Text]),
      SequenceFile.Writer.valueClass(classOf[MapWritable]))
    def mw(row: Array[Double]): MapWritable = {
      val v = new MapWritable()
      row.zipWithIndex.foreach { case (x, j) =>
        v.put(new IntWritable(j), new DoubleWritable(x))
      }
      v
    }
    try {
      writer.append(new Text("INITIAL"), mw(m.pi))
      m.a.zipWithIndex.foreach { case (r, i) => writer.append(new Text(s"TRANSIT_$i"), mw(r)) }
      m.b.zipWithIndex.foreach { case (r, i) => writer.append(new Text(s"EMIT_$i"), mw(r)) }
    } finally writer.close()
    dir
  }

  test("a forged reference-format model dir loads bit-exactly onto HmmModel") {
    val src = HmmModel.random(4, 6, seed = 13L)
    val dir = forgeReferenceDir(src)
    assert(MahoutModel.isMahoutModelDir(spark, dir))
    val got = MahoutModel.read(spark, dir)
    assert(got.numStates == 4 && got.numSymbols == 6)
    assert(got.pi.toSeq == src.pi.toSeq)
    assert(got.a.flatten[Double].toSeq == src.a.flatten[Double].toSeq)
    assert(got.b.flatten[Double].toSeq == src.b.flatten[Double].toSeq)
    assert(got.symbolNames.isEmpty, "the reference format carries no name maps")
  }

  test("MahoutModel.write emits the exact stripe layout the reference reader parses") {
    val src = HmmModel.random(3, 5, seed = 29L)
    val dir = s"${tmp("graft_mahout_w")}/model"
    MahoutModel.write(spark, src, dir)
    // independent raw read, parsing EXACTLY as BaumWelchUtils does:
    // single-char state id at charAt(8)/charAt(5) (valid for K <= 10)
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = new SequenceFile.Reader(conf,
      SequenceFile.Reader.file(new Path(dir, "part-randomSeed")))
    val pi = Array.ofDim[Double](3)
    val a = Array.ofDim[Double](3, 3)
    val b = Array.ofDim[Double](3, 5)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      val key = new Text(); val value = new MapWritable()
      while (reader.next(key, value)) {
        val k = key.toString
        seen += k
        val entries = value.entrySet().iterator()
        while (entries.hasNext) {
          val e = entries.next()
          val j = e.getKey.asInstanceOf[IntWritable].get
          val v = e.getValue.asInstanceOf[DoubleWritable].get
          if (k.charAt(0) == 'I') pi(j) = v
          else if (k.charAt(0) == 'T') a(Character.getNumericValue(k.charAt(8)))(j) = v
          else if (k.charAt(0) == 'E') b(Character.getNumericValue(k.charAt(5)))(j) = v
          else fail(s"unparseable stripe key $k")
        }
      }
    } finally reader.close()
    // INITIAL is written first, as the reference writes it
    assert(seen.head == "INITIAL")
    assert(seen.toSet == Set("INITIAL", "TRANSIT_0", "TRANSIT_1", "TRANSIT_2",
      "EMIT_0", "EMIT_1", "EMIT_2"))
    assert(pi.toSeq == src.pi.toSeq)
    assert(a.flatten.toSeq == src.a.flatten[Double].toSeq)
    assert(b.flatten.toSeq == src.b.flatten[Double].toSeq)
  }

  test("models with >= 10 states round-trip (full-suffix parse, beyond the reference's charAt)") {
    val src = HmmModel.random(12, 4, seed = 31L)
    val dir = s"${tmp("graft_mahout_big")}/model"
    MahoutModel.write(spark, src, dir)
    val got = MahoutModel.read(spark, dir)
    assert(got.numStates == 12)
    assert(got.frobeniusDistance(src) == 0.0)
    assert(got.pi.toSeq == src.pi.toSeq)
  }

  test("TrainHmm --model-in auto-detects a reference model dir and warm-starts from it") {
    import spark.implicits._
    val vocabSize = Sequencer.vocab(spark, sfDir).count().toInt
    val warm = HmmModel.random(3, vocabSize, seed = 17L)
    val dir = forgeReferenceDir(warm)
    val out = tmp("graft_mahout_cli")
    val res = TrainHmm.run(spark, TrainHmm.parse(Seq(
      "--input", sfDir, "--output", out,
      "--max-iterations", "2", "--model-in", dir)))
    // parity with a direct warm-start fit from the same model: proves
    // the CLI actually loaded the mahout dir (1e-9, never bitwise —
    // treeAggregate combine order is not FP-deterministic)
    val seqs = Sequencer.sequenceDs(spark, sfDir).map(_._2.toArray).rdd.cache()
    try {
      val direct = BaumWelch.fit(seqs, warm, maxIterations = 2, epsilon = 1e-4)
      assert(res.model.frobeniusDistance(direct.model) < 1e-9)
      res.logLikPerIter.zip(direct.logLikPerIter).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-6, s"warm-start loglik diverged: $x vs $y")
      }
    } finally seqs.unpersist()
    // and the trained result re-dumps/loads through ModelIO unchanged
    val (loaded, _) = ModelIO.load(spark, s"$out/model")
    assert(loaded.frobeniusDistance(res.model) == 0.0)
    // wrong symbol count still fails loudly through the same path
    val bad = forgeReferenceDir(HmmModel.random(3, vocabSize + 2, seed = 19L))
    val ex = intercept[IllegalArgumentException](TrainHmm.run(spark, TrainHmm.parse(Seq(
      "--input", sfDir, "--output", tmp("graft_mahout_bad"),
      "--model-in", bad))))
    assert(ex.getMessage.contains("symbols"))
  }

  test("graft model -> mahout dir -> reference-era consumer: full write/read/ModelIO loop") {
    // the migration loop in the OTHER direction: a graft-trained model
    // written for the reference, then read back and persisted via
    // ModelIO with names attached — byte-identical matrices throughout
    val src = HmmModel.random(2, 3, seed = 23L)
    val mdir = s"${tmp("graft_mahout_loop")}/model"
    MahoutModel.write(spark, src, mdir)
    val back = MahoutModel.read(spark, mdir)
    val named = back.withNames(Seq("s0", "s1"), Seq("x", "y", "z"))
    val pdir = s"${tmp("graft_mahout_loop_pq")}/model"
    ModelIO.save(spark, named, pdir)
    val (fin, _) = ModelIO.load(spark, pdir)
    assert(fin.frobeniusDistance(src) == 0.0)
    assert(fin.pi.toSeq == src.pi.toSeq)
    assert(fin.symbolNames.contains(IndexedSeq("x", "y", "z")))
  }
}
