package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfBg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.extensions","graft.GraftExtensions")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables(spark, "/tmp/sf10gen").documents
    def time[T](l:String)(f: =>T):T={val t0=System.nanoTime();val r=f;println(f"[prof] $l%-30s ${(System.nanoTime()-t0)/1e9}%7.2f s");r}
    val bg = graft.operators.TextOps.bigrams(docs)
    time("bigrams noop")(bg.write.format("noop").mode("overwrite").save())
    val bgP = bg.persist()
    time("bigrams persist+count")(println("rows="+bgP.count()))
    val stats = graft.operators.TextOps.bigramStats(bgP).persist()
    time("stats persist+count")(println("pairs="+stats.count()))
    val model = stats.join(stats.groupBy(col("w1")).agg(sum(col("c12")).as("c1")), Seq("w1"))
    time("model noop")(model.write.format("noop").mode("overwrite").save())
    val joined = bgP.join(model, Seq("w1","w2"))
    time("score join noop")(joined.write.format("noop").mode("overwrite").save())
    time("full operator")(graft.operators.TextOps.bigramSurprisal(docs).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
