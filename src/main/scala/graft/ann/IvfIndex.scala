package graft.ann

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.cosine_similarity

/** IVF (inverted-file) similarity search — the centroid-bucketed scale path
  * next to [[Similarity.topKLsh]]: k-means centroids partition the items;
  * a query scans only its `nprobe` nearest centroid lists instead of the
  * whole table. Centroids train on a seeded sample via MLlib KMeans and
  * broadcast; list assignment and probing are single narrow passes.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]])

  /** Train `nlist` centroids on (a sample of) the item vectors. */
  def train(items: DataFrame, vecCol: String, nlist: Int,
            sampleTarget: Int = 100000, seed: Long = 42L): Model = {
    val n = items.count()
    val fraction = math.min(1.0, sampleTarget.toDouble / math.max(1, n))
    val toVec = udf((v: Seq[Float]) =>
      if (v == null) null else Vectors.dense(v.map(_.toDouble).toArray))
    val train = items.sample(withReplacement = false, fraction, seed)
      .select(toVec(col(vecCol)).as("features"))
      .where(col("features").isNotNull)
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(20)
    val model = km.fit(train)
    Model(model.clusterCenters.map(_.toArray))
  }

  private def nearestCentroids(model: Model, v: Seq[Float], n: Int): Array[Int] = {
    val scored = model.centroids.indices.map { ci =>
      val c = model.centroids(ci)
      var d = 0.0; var i = 0
      while (i < c.length && i < v.length) {
        val diff = c(i) - v(i); d += diff * diff; i += 1
      }
      (d, ci)
    }
    scored.sortBy(identity).take(n).map(_._2).toArray
  }

  /** Approximate top-k: items bucketed by nearest centroid; each query
    * probes its `nprobe` nearest centroid lists, scores exactly, windows to
    * top-k. Output schema matches [[Similarity.topKBrute]]. */
  def topK(items: DataFrame, itemId: String, itemVec: String,
           queries: DataFrame, queryId: String, queryVec: String,
           k: Int, model: Model, nprobe: Int = 4): DataFrame = {
    val spark = items.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val assign = udf { (v: Seq[Float]) =>
      if (v == null) -1 else nearestCentroids(bc.value, v, 1).head
    }
    val probes = udf { (v: Seq[Float]) =>
      if (v == null) Array.empty[Int] else nearestCentroids(bc.value, v, nprobe)
    }
    val bi = items.withColumn("__list", assign(col(itemVec)))
    val bq = queries.withColumn("__list", explode(probes(col(queryVec))))
    bq.join(bi.hint("shuffle_hash"), Seq("__list"))
      .where(col(queryId) =!= col(itemId))
      .withColumn("similarity", cosine_similarity(col(queryVec), col(itemVec)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryId))
          .orderBy(col("similarity").desc, col(itemId).asc)))
      .where(col("rank") <= k)
      .select(col(queryId), col(itemId), col("similarity"), col("rank"))
  }
}
