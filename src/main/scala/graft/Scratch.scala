package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(("abc def", 1)).toDF("t", "i")
    df.select(
      split($"t", "").as("chars"),
      expr("aggregate(filter(split('abc',''), x -> x != ''), 0L, (acc, c) -> (acc*31 + ascii(c)) % 2147483647)").as("polyhash_abc"),
      expr("transform(sequence(0, length(t)-5), i -> substring(t, i+1, 5))").as("grams5"),
      expr("size(regexp_extract_all(t, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))").as("ntok"),
      expr("aggregate(transform(split(t,' '), x -> length(x)), 0, (a,b)->a+b)").as("sumlen")
    ).show(false)
    df.select(expr("slice(split(t,' '), 1, 3)")).show(false)
    spark.stop()
  }
}
