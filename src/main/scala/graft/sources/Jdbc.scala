package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the drop-in for the reference's live database
  * storage (`db_utils.py:8-66`, `create_db.py:1-43`: SQLite tables
  * `conversions`, `session_sources`, `session_costs`,
  * `attribution_customer_journey`, `channel_reporting`). A user starting
  * from the reference's workflow starts from a DB; this maps that entry
  * point onto Spark's JDBC relation with the scale levers exposed:
  *
  *  - **Partitioned parallel reads** ([[readPartitioned]]): `numPartitions`
  *    concurrent range queries on a numeric column — the difference between
  *    one executor streaming a whole table and the cluster reading it. At
  *    warehouse scale bounds come from the DB's min/max, not a full scan.
  *  - **Predicate pushdown**: filters on the DataFrame compile into the
  *    remote `WHERE` clause (visible as `PushedFilters` in the scan node),
  *    so date-windowed extraction (`db_utils.py:80-99`) ships the predicate
  *    to the DB instead of the data to Spark.
  *  - **Batched writes** ([[write]]): `batchsize` rows per JDBC batch
  *    insert, `numPartitions` concurrent connections.
  *
  * Exercised end-to-end in JdbcSpec against embedded Derby (the one JDBC
  * engine shipped with Spark), including running the attribution pipeline
  * from DB-backed tables and writing the report back — the reference's
  * full DB round trip (`main.py:299-378`).
  */
object Jdbc {

  /** Whole-table (single-partition) read — for dimension-sized tables. */
  def read(
      spark: SparkSession, url: String, table: String,
      driver: Option[String] = None): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    driver.fold(r)(d => r.option("driver", d)).load()
  }

  /** Range-partitioned parallel read on a numeric column — the fact-table
    * path. Each of the `numPartitions` tasks issues its own bounded query,
    * so the read parallelizes across the cluster. */
  def readPartitioned(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, driver: Option[String] = None): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
    driver.fold(r)(d => r.option("driver", d)).load()
  }

  /** Batched write; `numPartitions` concurrent connections, `batchsize`
    * rows per batch insert. */
  def write(
      df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Overwrite,
      batchSize: Int = 1000,
      driver: Option[String] = None): Unit = {
    val props = new Properties()
    props.setProperty("batchsize", batchSize.toString)
    driver.foreach(d => props.setProperty("driver", d))
    df.write.mode(mode).jdbc(url, table, props)
  }
}
