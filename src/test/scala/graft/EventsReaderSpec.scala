package graft

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.functions._

/** The test-data generator has emitted `events.parquet` with BOTH
  * TIMESTAMP(NANOS) and TIMESTAMP(MICROS) `ts` columns across rounds;
  * `Queries.events` must detect the unit from the parquet footer and land on
  * the same micros TIMESTAMP either way. This spec writes the same rows as a
  * native-micros file (Spark writer) and a nanos file (parquet-mr example
  * writer — Spark cannot write nanos) and asserts bit-identical results,
  * including through the sessionize operator that round 9's regression broke.
  */
class EventsReaderSpec extends SparkSpec {

  // TIMESTAMP(NANOS, isAdjustedToUTC=false) — the shape the generator
  // emitted in rounds ≤ 8, which Spark's vectorized reader rejects without
  // the nanosAsLong escape hatch.
  private val nanosSchema = MessageTypeParser.parseMessageType(
    """message events {
      |  required int64 event_id;
      |  required int64 ts (TIMESTAMP(NANOS,false));
      |  required int64 user_id;
      |  required binary event_type (UTF8);
      |  required double value;
      |  required binary props (UTF8);
      |}""".stripMargin)

  private def writeFixtures(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_events_units")
    val microsDir = base.resolve("micros").toString
    val nanosDir = base.resolve("nanos").toString

    // rows from the REAL driver file, so the spec also covers whatever
    // annotation the current generator emits
    val rows = Queries.events(spark, sf())
      .select(col("event_id"), expr("unix_micros(ts)").as("us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .orderBy("event_id").limit(500).collect()

    // micros fixture: Spark-written TIMESTAMP_MICROS
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      import spark.implicits._
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5)))
        .toSeq.toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(microsDir)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }

    // nanos fixture: parquet-mr example writer, ts in raw nanos
    new java.io.File(nanosDir).mkdirs()
    val conf = new Configuration()
    GroupWriteSupport.setSchema(nanosSchema, conf)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$nanosDir/part-0.parquet"))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val factory = new SimpleGroupFactory(nanosSchema)
    try rows.foreach { r =>
      val g = factory.newGroup()
      g.add("event_id", r.getLong(0))
      g.add("ts", r.getLong(1) * 1000L) // micros → nanos
      g.add("user_id", r.getLong(2))
      g.add("event_type", r.getString(3))
      g.add("value", r.getDouble(4))
      g.add("props", r.getString(5))
      writer.write(g)
    } finally writer.close()

    (microsDir, nanosDir)
  }

  test("footer unit detection: micros vs nanos") {
    val (microsDir, nanosDir) = writeFixtures()
    assert(!Queries.eventsTsIsNanos(spark, microsDir))
    assert(Queries.eventsTsIsNanos(spark, s"$nanosDir/part-0.parquet"))
    assert(Queries.eventsTsIsNanos(spark, nanosDir)) // directory form
  }

  test("micros and nanos fixtures read identically through Queries.eventsFrom") {
    val (microsDir, nanosDir) = writeFixtures()
    val m = Queries.eventsFrom(spark, microsDir)
    val n = Queries.eventsFrom(spark, nanosDir)
    assert(m.schema == n.schema)
    assert(m.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val mRows = m.orderBy("event_id").collect().toSeq
    val nRows = n.orderBy("event_id").collect().toSeq
    assert(mRows.size == 500 && mRows == nRows)
  }

  test("session counts identical across units (the r9 regression shape)") {
    val (microsDir, nanosDir) = writeFixtures()
    import graft.streaming.EventStreams
    def sessions(dir: String): Long =
      EventStreams.sessionizeBatch(Queries.eventsFrom(spark, dir), gapMinutes = 30).count()
    val (sm, sn) = (sessions(microsDir), sessions(nanosDir))
    assert(sm == sn && sm > 0)
  }

  test("in-place regeneration with a different unit is re-sniffed, not served stale") {
    // The generator regenerates testdata IN PLACE mid-round: a path-only
    // memo would keep serving the old unit to this JVM (micros read as
    // nanos ⇒ the r9 1000×-compressed timestamps). The cache keys on the
    // probed footer file's (path, length, mtime), so the swap below must
    // flip the answer.
    val (microsDir, nanosDir) = writeFixtures()
    val swapDir = java.nio.file.Files
      .createTempDirectory("graft_events_swap").toString
    def installFrom(src: String): Unit = {
      val dst = new java.io.File(swapDir)
      dst.listFiles().foreach(_.delete())
      new java.io.File(src).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .zipWithIndex.foreach { case (f, i) =>
          val out = new java.io.File(dst, s"part-$i.parquet").toPath
          java.nio.file.Files.copy(f.toPath, out)
          // ensure a visibly different mtime even on coarse filesystems
          out.toFile.setLastModified(System.currentTimeMillis() - i)
        }
    }
    installFrom(microsDir)
    assert(!Queries.eventsTsIsNanos(spark, swapDir))
    installFrom(nanosDir)
    new java.io.File(swapDir).listFiles()
      .foreach(_.setLastModified(System.currentTimeMillis() + 5000))
    assert(Queries.eventsTsIsNanos(spark, swapDir),
      "regenerated file served a stale cached unit")
  }

  test("the driver's real events file reads with sane timestamps") {
    val ev = Queries.events(spark, sf())
    val row = ev.agg(min("ts").as("lo"), max("ts").as("hi"), count("*").as("n"))
      .collect()(0)
    val (lo, hi) = (row.getTimestamp(0), row.getTimestamp(1))
    val spanDays = (hi.getTime - lo.getTime) / 86400000.0
    // generator emits one month of 2024 events; the r9 bug compressed the
    // whole table into ~43 minutes — guard against any unit mix-up
    assert(lo.toInstant.toString.startsWith("2024-"), s"min ts $lo")
    assert(spanDays > 5.0, s"events span $spanDays days — unit mis-decoded?")
  }
}
