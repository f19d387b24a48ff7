package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source connectors — the reference's scan surface (SURVEY.md §2.1)
  * as thin, typed wrappers over Spark's readers.
  *
  * Schemas are declared, not inferred, on production paths: inference
  * reads the data twice and can drift between runs — at 100 TB the
  * second pass alone is disqualifying.
  */
object Sources {

  /** S1: JSON-lines scan with declared schema (the reference's
    * textFile + json.loads + field-pluck, Assignment1/task1.py:17-18).
    * Projection/filter pushdown reach the reader via Catalyst. */
  def jsonLines(s: SparkSession, path: String, schema: StructType)
  : DataFrame = s.read.schema(schema).json(path)

  /** S1 variant for exploration only — schema inferred. */
  def jsonLinesInferred(s: SparkSession, path: String): DataFrame =
    s.read.json(path)

  /** S2: CSV with header (replaces the reference's first()-capture
    * header rejection, Assignment2/task1.py:21-26). */
  def csvWithHeader(s: SparkSession, path: String): DataFrame =
    s.read.option("header", true).csv(path)

  /** S3: numeric point CSV — (index, d doubles), the BFR input shape
    * (Assignment5/bfr.py:40-42); all value columns cast to double and
    * packed into one vector column. */
  def numericCsv(s: SparkSession, path: String): DataFrame = {
    val raw = s.read.option("header", false).csv(path)
    val idCol = col(raw.columns.head).cast("long").as("vec_id")
    val vec = array(raw.columns.tail.toIndexedSeq.map(c => col(c).cast("double")): _*)
    raw.select(idCol, vec.as("vd"))
  }

  /** S4: chunked directory scan, batch form — one DataFrame with the
    * originating file tagged, so a driver loop can iterate files in
    * order (the reference's os.listdir + per-round textFile,
    * Assignment5/bfr.py:19-36). */
  def chunkedDir(s: SparkSession, dir: String, format: String = "parquet")
  : DataFrame =
    s.read.format(format).load(dir)
      .withColumn("_source_file", input_file_name())

  /** S4, streaming form: one file per micro-batch. */
  def chunkedDirStream(s: SparkSession, dir: String, schema: StructType,
      format: String = "parquet"): DataFrame =
    s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .format(format).load(dir)

  /** Incremental manifest-based ingest — the batch Auto-Loader shape:
    * scan `dir`, process only files NOT yet recorded in the manifest,
    * and append the newly-seen file names on commit. At 100 TB the
    * directory holds millions of files; the manifest is file-NAMES
    * (metadata-sized), the listing comes from the filesystem, and the
    * returned frame reads only the delta. Returns (newData,
    * commit-thunk): the caller processes the frame, then invokes the
    * thunk to mark those files done — crash before commit means
    * reprocessing, never loss (at-least-once, the standard contract).
    */
  def incrementalScan(s: SparkSession, dir: String, manifestPath: String,
      format: String = "parquet"): (DataFrame, () => Unit) = {
    // Hadoop FileSystem API, not java.io: the listing and the manifest
    // work identically on file://, hdfs:// and s3a:// — at 100 TB the
    // directory is an object-store prefix, never a local disk
    import org.apache.hadoop.fs.Path
    val conf = s.sparkContext.hadoopConfiguration
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val mf = new Path(manifestPath)
    val mfs = mf.getFileSystem(conf)
    val seen: Set[String] =
      if (mfs.exists(mf)) {
        val in = mfs.open(mf)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toSet
        finally in.close()
      } else Set.empty
    val all = fs.listStatus(dirPath)
      .filter(st => st.isFile && !st.getPath.getName.startsWith(".")
        && !st.getPath.getName.startsWith("_"))
      .map(_.getPath.toString).sorted
    val fresh = all.filterNot(seen)
    val df =
      if (fresh.isEmpty)
        s.read.format(format).load(dir).limit(0)
      else s.read.format(format).load(fresh.toIndexedSeq: _*)
    val commit = () => {
      val out = mfs.create(mf, true)
      try out.write(
        (seen ++ fresh).toSeq.sorted.mkString("", "\n", "\n")
          .getBytes("UTF-8"))
      finally out.close()
      ()
    }
    (df, commit)
  }

  /** Small-file compaction — the maintenance pass every long-running
    * ingest needs: rewrite a directory of many small files into
    * ⌈bytes/target⌉ files of ≈`targetBytes` each. Reads once, writes
    * once to a temp sibling, then swaps. The swap is crash-SAFE, not
    * atomic (no multi-file rename is, least of all on object stores):
    * originals are parked in a `._compact_bak` sibling first, the
    * compacted files renamed in, and the backup deleted only after
    * every rename succeeded — so a crash at any point leaves either
    * the originals (recoverable from the backup dir) or the full
    * compacted set on disk, never neither. Concurrent readers should
    * be fenced by the caller (e.g. manifest-gated discovery, as
    * [[manifestIngest]] provides); a reader listing mid-swap can see a
    * partial set. Row content is preserved; file count is the only
    * thing that changes. */
  def compact(s: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    // Hadoop FileSystem throughout — same code path on local, HDFS,
    // and object stores
    import org.apache.hadoop.fs.Path
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(dirPath).filter(_.isFile)
    val bytes = files
      .filterNot(_.getPath.getName.startsWith("_")).map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new Path(dir.stripSuffix("/") + "._compact_tmp")
    s.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap, originals-last: park originals in a backup sibling, move
    // compacted files in, delete the backup only once all renames
    // succeeded. A failed rename aborts with the data still on disk.
    val bak = new Path(dir.stripSuffix("/") + "._compact_bak")
    fs.delete(bak, true)
    require(fs.mkdirs(bak), s"compact: cannot create backup dir $bak")
    files.foreach { f =>
      require(fs.rename(f.getPath, new Path(bak, f.getPath.getName)),
        s"compact: failed to park ${f.getPath} — aborting, no data lost")
    }
    fs.listStatus(tmp).filter(_.isFile).foreach { st =>
      require(fs.rename(st.getPath, new Path(dirPath, st.getPath.getName)),
        s"compact: failed to move ${st.getPath} in — originals in $bak")
    }
    fs.delete(tmp, true)
    fs.delete(bak, true)
    nOut.toLong
  }

  /** S5: socket text stream (the reference's socketTextStream,
    * Assignment6/task2.py:88) — test rig only, not fault tolerant. */
  def socketLines(s: SparkSession, host: String, port: Int): DataFrame =
    s.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** S5 benchmark alternative: the rate source (rows/sec with event
    * time), for driving windowed operators without a network. */
  def rateStream(s: SparkSession, rowsPerSecond: Int): DataFrame =
    s.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()

  /** Hive-style partitioned parquet layout: one directory per value of
    * the partition column. Queries filtering on it prune whole
    * directories at planning time (`PartitionFilters` in the scan, no
    * file even opened) — with a date partition on 100 TB, a one-day
    * query reads one day, not the table. Partition columns should be
    * low-cardinality (date, source, region); high-cardinality keys
    * belong in [[writeBucketed]] buckets instead.
    * (SourcesSpec asserts the pruned scan.) */
  def writePartitioned(df: DataFrame, path: String,
      partitionCol: String): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Bucketed parquet table: pre-shuffle the data ONCE at write time
    * into `nBuckets` hash buckets on the join/agg key. Every later
    * equi-join or aggregation on that key is co-located — no Exchange
    * in the plan — which is the difference between re-shuffling 100 TB
    * per query and never shuffling it again. This is the engine's
    * answer to the reference's partitionBy(lambda) re-partitioning
    * (Assignment1/task3.py:60-66): declare the partitioning in the
    * table layout instead of hand-placing records per query.
    * (SourcesSpec asserts the exchange-free plan.) */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}

/** Sink connectors — the reference's output surface (SURVEY.md §2.1). */
object Sinks {

  /** K1: single JSON object file (the reference's driver json.dumps of
    * a result dict, Assignment1/task1.py:67-68) — for result frames
    * that are already summary-sized. */
  def jsonObject(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(path)

  /** K2: JSON-lines sink (Assignment3/task1.py:110-113). */
  def jsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** K3: text-lines sink with a custom per-row format — pass a
    * formatted single column (concat_ws/format_string upstream). */
  def textLines(df: DataFrame, path: String): Unit = {
    require(df.columns.length == 1,
      "textLines expects one pre-formatted string column")
    df.write.mode("overwrite").text(path)
  }

  /** K4: CSV with header (BFR intermediate stats shape,
    * Assignment5/bfr.py:427-432). */
  def csvWithHeader(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", true).csv(path)

  /** K4, streaming: per-micro-batch CSV append via foreachBatch (the
    * FM Time/Truth/Estimate log, Assignment6/task2.py:74-76). Caller
    * starts/stops the returned query. */
  def streamingCsvAppend(df: DataFrame, path: String, checkpoint: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.coalesce(1).write.mode("append")
          .option("header", true).csv(path)
      }
      .start()
}
