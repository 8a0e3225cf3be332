package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional third arg: comma-separated substrings — only run queries
    // whose name contains one (builder-side iteration aid; the driver
    // always passes two args)
    val only = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // r16 ADVICE (Int8Quantize): the native side maps NaN→null but the
    // q87 oracle SQL would emit engine-dependent bytes on NaN input — a
    // latent divergence no fixture currently exercises. Enforce that:
    // fail the dump loudly if the embeddings fixture ever carries NaN,
    // instead of letting the hash gate diverge mysteriously.
    try {
      import org.apache.spark.sql.functions.{col, exists, isnan}
      val nanVecs = Tables.embeddings(spark, sfDir)
        .filter(exists(col("embedding"), x => isnan(x))).count()
      require(nanVecs == 0L,
        s"embeddings fixture carries $nanVecs NaN vectors; the " +
          "int8_quantize oracle SQL has no NaN guard (see Int8Quantize)")
    } catch { case _: org.apache.spark.sql.AnalysisException => () } // table absent
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
