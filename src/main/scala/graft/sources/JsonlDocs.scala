package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) document ingestion — the wire format
  * crawl dumps, API exports, and annotation tools actually deliver. The
  * operator contract is the three things a 100 TB ingest job must get
  * right and `spark.read.json` alone does not enforce:
  *
  *  - **Explicit schema, always.** Schema inference READS THE DATA TWICE
  *    (one full pass just to guess types) and silently widens on dirty
  *    input; at ingest scale both are unacceptable, so `schema` is a
  *    required parameter, not an option.
  *  - **Corrupt lines are data, not exceptions.** PERMISSIVE mode with a
  *    named corrupt-record column: a broken line yields a row with NULL
  *    fields and the raw line preserved, the batch never aborts
  *    (FAILFAST) and never silently shrinks (DROPMALFORMED). [[clean]] /
  *    [[quarantine]] split the result; quarantined raw lines replay
  *    after the producer is fixed.
  *  - **Parallelism comes free.** JSONL is line-splittable, so the scan
  *    parallelizes by byte range like any text source — no per-file
  *    boundary (a single 1 TB JSONL file still fans out across
  *    executors).
  */
object JsonlDocs {

  val CorruptCol = "_corrupt"

  /** Read `path` with the given schema; malformed lines surface as rows
    * whose data fields are NULL and whose [[CorruptCol]] holds the raw
    * line.
    *
    * The parsed batch comes back PERSISTED (lazily — nothing computes
    * until first use): Spark refuses file-scan queries whose referenced
    * columns reduce to only the corrupt-record column (a pruned scan
    * would parse rows solely to learn they failed), and its documented
    * contract for corrupt-record work is cache-then-query — the cache
    * materializes with every column, so [[clean]], [[quarantine]], and
    * any `count()` downstream plan against the cached parse instead of
    * a re-pruned file scan. One parse serves all consumers; callers
    * `unpersist()` when the ingest batch is finished.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** The parsed rows (corrupt marker null), marker dropped. */
  def clean(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The raw text of every malformed line — append to a quarantine path
    * and replay once the producer is fixed.
    *
    * Persists the parsed batch first: Spark refuses corrupt-column-only
    * queries straight off a raw JSON scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the scan
    * would have to re-parse just to know what failed), and its
    * documented recipe is exactly this cache-then-filter. An ingest job
    * that calls [[clean]] AND [[quarantine]] on the same batch reuses
    * the one persisted parse for both.
    */
  def quarantine(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
}
