package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Curated-corpus export: the final leg of the training-data pipeline
  * (dedup → filter → mix → EXPORT), writing hive-partitioned parquet
  * with bounded shard sizes.
  *
  * 100 TB design:
  *  - partition columns become directory keys, so every downstream
  *    reader gets partition PRUNING for free (a `lang = 'en'` scan
  *    never lists the other languages' files);
  *  - rows are pre-shuffled onto their partition keys before the
  *    write — without this, every task holding a few rows of every
  *    key writes tasks × keys tiny files (the classic small-file
  *    explosion); with it, each output directory is written by the
  *    task(s) that own the key;
  *  - `maxRecordsPerFile` bounds each shard: an output file is a unit
  *    of downstream parallelism (and of retry/transfer), so shards of
  *    a few hundred MB beat one monolith per partition. A key hot
  *    enough to bottleneck its single writer task splits sequentially
  *    by the record cap — at true hot-key scale add a salt column to
  *    the repartition (q73's pattern) at the cost of more files;
  *  - optional `sortCols` sort rows WITHIN each file (doc_id order
  *    makes shards reproducible and delta-friendly); parquet min/max
  *    row-group stats on the sort key then let readers skip pages.
  */
object CorpusSink {

  def write(df: DataFrame, outDir: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long, sortCols: Seq[String] = Nil): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    val keyed = df.repartition(partitionCols.map(col): _*)
    val laidOut =
      if (sortCols.isEmpty) keyed
      else keyed.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    laidOut.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(outDir)
  }
}
