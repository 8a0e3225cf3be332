import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** A registered query: (session, scale-factor dir) => result DataFrame.
    * Matches the driver contract in SparkEntry.queries.
    */
  type Q = (SparkSession, String) => DataFrame
}
