package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: is `new java.math.BigDecimal(Double.toString(v)).setScale(15,
  * HALF_UP)` bit-identical to Spark's float/double -> decimal(38,15) cast on
  * the real embedding values? (Parity gate for the exact vector-sum
  * aggregate.) */
object DecimalCastProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.engine.Tables.read(spark, "/root/testdata/sf0.01", "embeddings")
    // spark-side cast per element
    val sparkSide = emb.select(posexplode(col("embedding")))
      .select(col("col").cast("float").as("f"),
        col("col").cast("double").cast("decimal(38,15)").as("dec"))
      .collect()
    var mismatch = 0
    sparkSide.foreach { r =>
      val f = r.getFloat(0)
      val dec = r.getDecimal(1)
      val mine = new java.math.BigDecimal(java.lang.Double.toString(f.toDouble))
        .setScale(15, java.math.RoundingMode.HALF_UP)
      if (mine.compareTo(dec) != 0 || mine.scale != dec.scale) mismatch += 1
    }
    println(s"DECCAST rows=${sparkSide.length} mismatch=$mismatch")
    // also float -> decimal directly (the posexplode element is FLOAT typed)
    val sparkSide2 = emb.select(posexplode(col("embedding")))
      .select(col("col").as("f"), col("col").cast("decimal(38,15)").as("dec"))
      .collect()
    var mismatch2 = 0
    sparkSide2.foreach { r =>
      val f = r.getFloat(0)
      val dec = r.getDecimal(1)
      val mine = new java.math.BigDecimal(java.lang.Double.toString(f.toDouble))
        .setScale(15, java.math.RoundingMode.HALF_UP)
      if (mine.compareTo(dec) != 0 || mine.scale != dec.scale) mismatch2 += 1
    }
    println(s"DECCAST float-direct rows=${sparkSide2.length} mismatch=$mismatch2")
    // division parity: (decimal(38,15) / bigint).cast(double) vs BigDecimal math
    val div = spark.sql(
      "SELECT CAST(CAST(123.456789012345678 AS DECIMAL(38,15)) / CAST(7 AS BIGINT) AS DOUBLE) d," +
      " CAST(CAST(123.456789012345678 AS DECIMAL(38,15)) / CAST(7 AS BIGINT) AS DECIMAL(38,15)) raw")
      .collect()(0)
    println(s"DECCAST div=${div.getDouble(0)} raw=${div.getDecimal(1)}")
    spark.stop()
  }
}
