package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.arrayDot

/** Shared distributed Lloyd k-means over an embedding relation
  * (vec_id, embedding: array<float>, nrm) — the clustering primitive
  * behind the IVF index (Similarity.knnIvf) and the cell-blocked
  * exact cosine join (Dedup.embeddingDedup).
  *
  * Scale shape: centroids travel as a broadcast RELATION (plan is
  * O(1) in K — no per-centroid expression literals); assignment is a
  * broadcast join whose K-fold row blowup collapses map-side via the
  * partial min(struct(d, cluster)) aggregate; the only driver
  * materialization is the K×dim centroid table per iteration.
  */
object KMeans {

  /** Centroid relation (cluster, cent float[], cnorm2). */
  def centDf(spark: SparkSession, cents: Array[Seq[Double]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) =>
      (i, c.map(_.toFloat), c.map(x => x * x).sum)
    }.toSeq.toDF("cluster", "cent", "cnorm2")
  }

  /** Nearest-centroid assignment: ||e−c||² = ||e||² − 2⟨e,c⟩ + ||c||²
    * argmin via broadcast join + partial min agg; ties break to the
    * lower cluster id through struct ordering. Output:
    * (vec_id, embedding, nrm, cluster).
    */
  def assign(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("d",
        col("nrm") * col("nrm") - lit(2.0) * arrayDot(col("embedding"), col("cent")) + col("cnorm2"))
      .groupBy("vec_id")
      .agg(
        min(struct(col("d"), col("cluster"))).as("best"),
        first(col("embedding")).as("embedding"),
        first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("best.cluster").as("cluster"))

  /** Deterministic pseudo-random seeds: the k rows with the smallest
    * xxhash64(vec_id) — a distributed top-k, no full sort at scale.
    */
  def hashSeeds(e: DataFrame, k: Int): Array[Seq[Double]] =
    e.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(k)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .collect().map(_.getSeq[Double](0))

  /** Lloyd iterations from explicit initial centroids. Empty clusters
    * keep their previous centroid. Returns the final centroids.
    */
  def lloyd(
      spark: SparkSession,
      e: DataFrame,
      init: Array[Seq[Double]],
      iters: Int): Array[Seq[Double]] = {
    var centroids = init
    for (_ <- 0 until iters) {
      val updated = assign(e, centDf(spark, centroids))
        .select(col("cluster"),
          posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos").agg(avg(col("x")).as("m"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      centroids = centroids.indices.map { i =>
        if (updated.contains((i, 0))) centroids(i).indices.map(p => updated((i, p)))
        else centroids(i)
      }.toArray
    }
    centroids
  }
}
