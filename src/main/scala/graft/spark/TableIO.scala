package graft.spark

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The storage seam promised by BASELINE.md/SURVEY.md §7: every operator
  * reads its input tables and the resumable job reads/writes its
  * output + ledger through this trait, so the parquet-directory layout
  * used locally is a drop-in swap for a real lakehouse catalog (Iceberg /
  * Delta) on a cluster — register a scheme factory, change nothing else.
  *
  * Kept deliberately thin: named tables in, DataFrames out. Partitioned
  * writes are first-class because the resumable extraction sink depends
  * on dynamic partition overwrite for its exactly-once-per-bucket
  * contract ([[ExtractJob.runResumable]]).
  */
trait TableIO {
  /** Read a named table. */
  def read(table: String): DataFrame

  /** Whether the named table exists (used by resume logic for the
    * first-run case, where the ledger has never been written). */
  def exists(table: String): Boolean

  /** Write a named table. */
  def write(df: DataFrame, table: String, mode: SaveMode): Unit

  /** Write a table partitioned by `partitionCol` with DYNAMIC partition
    * overwrite: only partitions present in `df` are replaced, others are
    * untouched — the semantics Iceberg calls overwrite-by-filter and the
    * resumable sink's exactly-once-per-bucket contract requires. */
  def writePartitioned(df: DataFrame, table: String, partitionCol: String): Unit
}

/** Directory-of-parquet implementation: table `t` lives at
  * `root/t.parquet` — exactly the driver testdata layout. Works against
  * any Hadoop-visible filesystem (local, HDFS, s3a), so this is also the
  * production path until a catalog factory is registered. */
final case class ParquetDirIO(spark: SparkSession, root: String) extends TableIO {
  private def path(table: String): String = s"$root/$table.parquet"

  override def read(table: String): DataFrame = spark.read.parquet(path(table))

  override def exists(table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(table))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  override def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.mode(mode).parquet(path(table))

  override def writePartitioned(df: DataFrame, table: String, partitionCol: String): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path(table))
}

object TableIO {
  /** Guard against degenerate scan parallelism on small inputs (guide
    * §2.5 "input skew: one huge unsplittable file"): parquet assigns a
    * row group entirely to one split, so a table with few row groups
    * collapses to 1-2 non-empty tasks however many splits the planner
    * makes — and every downstream row-local kernel (DOM extraction,
    * signature hashing, tokenization) runs nearly single-threaded while
    * the rest of the cluster idles. When the optimizer's size estimate
    * says the whole input could not fill the cluster even at the
    * advisory partition size, round-robin it across
    * `defaultParallelism` (cluster-sized, not a constant); at scale the
    * estimate exceeds the bound and NO exchange is added — the corpus
    * is never shuffled for this. Results are unaffected: every caller's
    * downstream is per-row work or an order-independent exact
    * aggregate/total-order window. Shared by the ANN/embedding scans
    * (where it landed first) and the text-kernel operators. */
  def rebalanceSmall[T](ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] = {
    val spark = ds.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val advisory = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"))
    val est = ds.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(advisory) * par) ds.repartition(par) else ds
  }

  type Factory = (SparkSession, String) => TableIO

  private val schemes = new java.util.concurrent.ConcurrentHashMap[String, Factory]()

  /** Register a catalog implementation for roots of the form
    * `scheme://rest` (e.g. an Iceberg factory for `iceberg://db`).
    * Unregistered roots — including plain paths and hdfs:/s3a: URIs —
    * fall back to [[ParquetDirIO]], which handles them natively. */
  def registerScheme(scheme: String, factory: Factory): Unit =
    schemes.put(scheme, factory)

  def unregisterScheme(scheme: String): Unit = schemes.remove(scheme)

  /** Resolve the IO for a root string. This is the single entry point the
    * operator library uses, so a registered factory is honored by every
    * query without per-operator changes. */
  def apply(spark: SparkSession, root: String): TableIO = {
    val i = root.indexOf("://")
    val byScheme =
      if (i > 0) Option(schemes.get(root.substring(0, i)))
        .map(f => f(spark, root.substring(i + 3)))
      else None
    byScheme.getOrElse(ParquetDirIO(spark, root))
  }
}
