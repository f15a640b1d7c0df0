package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

object DecProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount")))).as("s"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("s").cast("string").as("dec_str"),
        col("s").cast("double").cast("string").as("dbl_str"),
        col("s")).show(6, truncate = false)
    println("sum type: " + li.groupBy(col("l_returnflag")).agg(
      sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount")))).as("s"))
      .schema("s").dataType)
    spark.stop()
  }
}
