package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextSim
object NnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val emb = Tables.load(spark, dir, "embeddings")
    val exact = TextSim.knnJoin(emb, emb, 5)
      .select("probe_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    (0 to 4).foreach { it =>
      val t0 = System.nanoTime()
      val g = TextSim.nnDescentGraph(emb, 5, it)
        .select("vec_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val rec = exact.map { case (p, t) =>
        t.intersect(g.getOrElse(p, Set.empty)).size.toDouble / t.size }.sum / exact.size
      println(f"NN iters=$it recall=$rec%.3f time=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
