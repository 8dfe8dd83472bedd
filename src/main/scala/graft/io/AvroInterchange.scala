package graft.io

import java.io.File
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Avro object-container interchange for the documents corpus — the
  * fifth interchange format beside parquet/JSONL/ORC/CSV/XML, and the
  * round-13 park-list item unblocked WITHOUT the absent `spark-avro`
  * DataSource module: the core Avro library (avro-1.12) ships on
  * every Spark classpath (it is a Spark dependency), so the container
  * write/read is plain public Avro Java API driven from
  * `foreachPartition`/`flatMap` — one container file per input
  * partition, full partition parallelism on both legs, no driver-side
  * row ever materialized.
  *
  * Scale shape: on local[n] the files land on the shared local FS; on
  * a cluster the same per-task writer streams to the task's
  * distributed-FS output path (the container format and the
  * partition-grain parallelism are identical — only the stream
  * factory changes), and the reader maps one task per container file
  * exactly like Spark's own avro source. Avro containers are
  * block-compressed and sync-marker-splittable; file-grain tasks keep
  * this implementation dependency-free.
  *
  * The schema is pinned (no inference): five fields in declaration
  * order, `long`/`string` only, so a roundtrip is byte-exact and the
  * text-hash summary oracle can replay it from parquet truth.
  */
object AvroInterchange {
  /** Pinned writer/reader schema (Schema is not serializable across
    * all avro versions — tasks re-parse the JSON, which is cheap). */
  private val SchemaJson: String =
    """{"type":"record","name":"Doc","namespace":"graft","fields":[
      |{"name":"doc_id","type":"long"},
      |{"name":"text","type":"string"},
      |{"name":"lang","type":"string"},
      |{"name":"source","type":"string"},
      |{"name":"n_chars","type":"long"}]}""".stripMargin

  val readSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  /** Write `df` (documents shape) as Avro container files under
    * `path`, one `part-NNNNN.avro` per non-empty input partition.
    *
    * Commit protocol (ADVICE r14): tasks never write the final name
    * directly — each attempt streams to a `.inprogress-<attemptId>`
    * temp (attempt-unique, so a speculative or zombie retry running
    * CONCURRENTLY with the winner writes a different file) and
    * atomically renames onto `part-NNNNN.avro` only after its own
    * close() succeeds. Whichever attempt renames last wins whole —
    * ATOMIC_MOVE replaces the destination as a unit, so a reader can
    * never observe a torn container. Failed/killed attempts leave
    * only a temp, swept by the overwrite pass of the next write. */
  def write(df: DataFrame, path: String): Unit = {
    val dir = new File(path)
    // overwrite semantics, matching DataFrameWriter.mode("overwrite")
    // (also sweeps any .inprogress leftovers from failed attempts)
    if (dir.exists()) {
      Option(dir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    }
    dir.mkdirs()
    val json = SchemaJson
    df.select(col("doc_id").cast("long"), col("text"), col("lang"),
        col("source"), col("n_chars").cast("long"))
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val schema = new Schema.Parser().parse(json)
          val tc = TaskContext.get()
          val pid = tc.partitionId()
          val tmp = new File(path,
            f"part-$pid%05d.avro.inprogress-${tc.taskAttemptId()}")
          val out = new File(path, f"part-$pid%05d.avro")
          val w = new DataFileWriter(
            new GenericDatumWriter[GenericRecord](schema))
          w.create(schema, tmp)
          var ok = false
          try {
            it.foreach { r =>
              val rec = new GenericData.Record(schema)
              rec.put("doc_id", r.getLong(0))
              rec.put("text", r.getString(1))
              rec.put("lang", r.getString(2))
              rec.put("source", r.getString(3))
              rec.put("n_chars", r.getLong(4))
              w.append(rec)
            }
            w.close() // flush + sync marker BEFORE the commit rename
            ok = true
            java.nio.file.Files.move(tmp.toPath, out.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            ()
          } finally {
            if (!ok) { try w.close() catch { case _: Throwable => () }
                       tmp.delete(); () }
          }
        }
      }
  }

  /** Read the container files under `path` back as a DataFrame — one
    * task per file (the same grain Spark's avro source schedules).
    *
    * Streaming at partition grain (ADVICE r14): rows are decoded
    * lazily off `DataFileReader` as the task consumes the iterator —
    * per-task memory is O(one avro block), never O(file). The reader
    * closes on exhaustion AND on a task-completion listener, so a
    * short-circuited downstream (limit, take) cannot leak the file
    * handle. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = Option(new File(path).listFiles())
      .getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".avro"))
      .map(_.getAbsolutePath).sorted.toSeq
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { fp =>
        val rdr = new DataFileReader(
          new File(fp), new GenericDatumReader[GenericRecord]())
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](
          _ => try rdr.close() catch { case _: Throwable => () }))
        new Iterator[Row] {
          private var closed = false
          def hasNext: Boolean = {
            if (closed) false
            else if (rdr.hasNext) true
            else { closed = true
                   try rdr.close() catch { case _: Throwable => () }
                   false }
          }
          def next(): Row = {
            val rec = rdr.next()
            // Avro strings materialize as Utf8 — toString, not cast
            Row(rec.get("doc_id").asInstanceOf[Long],
              rec.get("text").toString, rec.get("lang").toString,
              rec.get("source").toString,
              rec.get("n_chars").asInstanceOf[Long])
          }
        }
      }
    spark.createDataFrame(rows, readSchema)
  }
}
