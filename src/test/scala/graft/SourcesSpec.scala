package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("csv round-trips with explicit schema") {
    val tmp = Files.createTempDirectory("graftcsv").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
    df.write.option("header", "true").csv(s"$tmp/data")
    val back = Sources.csv(spark, s"$tmp/data", schema)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("json lines round-trips with explicit schema") {
    val tmp = Files.createTempDirectory("graftjson").toString
    Seq((1L, "x", 0.5)).toDF("id", "name", "score").write.json(s"$tmp/data")
    val back = Sources.jsonLines(spark, s"$tmp/data", schema)
    assert(back.count() == 1 && back.head().getAs[String]("name") == "x")
  }

  test("orc round-trips and pushes filters to the scan") {
    val tmp = Files.createTempDirectory("graftorc").toString
    val df = (1L to 100L).map(i => (i, s"n$i", i * 0.5)).toDF("id", "name", "score")
    Sources.writeOrc(df, s"$tmp/data")
    val back = Sources.orc(spark, s"$tmp/data").where(col("id") > 90L).select("id", "name")
    assert(back.count() == 10)
    val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)"),
      s"orc scan without pushdown: $scan")
  }

  test("binaryFile source ingests media bytes with glob + size guards") {
    val tmp = Files.createTempDirectory("graftbin").toString
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // the Multimodal spec's planted PNG (100×50) and GIF (12×34) headers
    val png = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0, 100, 0, 0, 0, 50, 8, 6, 0, 0, 0, 0x9a, 0x76, 0x82, 0x70)
    val gif = bytes('G', 'I', 'F', '8', '9', 'a', 12, 0, 34, 0, 0, 0, 0x3b)
    Files.write(java.nio.file.Paths.get(tmp, "a.png"), png)
    Files.write(java.nio.file.Paths.get(tmp, "b.gif"), gif)
    Files.write(java.nio.file.Paths.get(tmp, "c.txt"), "not media".getBytes("UTF-8"))
    // glob prunes non-matching files at listing time
    val pngs = Sources.binaryFiles(spark, tmp, glob = "*.png").collect()
    assert(pngs.length == 1)
    assert(pngs.head.getAs[Array[Byte]]("content").sameElements(png))
    assert(pngs.head.getAs[Long]("length") == png.length.toLong)
    // full read feeds the decode seam: planted headers parse to known dims
    val all = Sources.binaryFiles(spark, tmp)
    assert(all.count() == 3)
    val dims = all.select(col("path"), col("content")).collect()
      .map { r =>
        val name = r.getAs[String]("path").split('/').last
        val m = operators.Multimodal
          .parseHeader(r.getAs[Array[Byte]]("content"))
        name -> m
      }.toMap
    assert(dims("a.png").contains((100, 50)))
    assert(dims("b.gif").contains((12, 34)))
    assert(dims("c.txt").isEmpty) // text payload takes the fallback path
    // the oversize guard prunes before bytes reach the operator
    // (png 33 B and gif 13 B dropped; only the 9 B txt survives)
    assert(Sources.binaryFiles(spark, tmp, maxBytes = 10L).count() == 1)
  }

  test("partitioned write prunes partitions on read") {
    val tmp = Files.createTempDirectory("graftpart").toString
    val df = Seq((1L, "de"), (2L, "en"), (3L, "en")).toDF("id", "lang")
    Sources.writePartitioned(df, s"$tmp/docs", Seq("lang"))
    val pruned = Sources.parquet(spark, s"$tmp/docs").where(col("lang") === "en")
    assert(pruned.count() == 2)
    // physical proof of pruning: only the lang=en directory is scanned
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scan.contains("lang=de"), s"unpruned scan: $scan")
  }

  test("z-ordered write gives min/max-stat locality on BOTH cluster columns") {
    val tmp = Files.createTempDirectory("graftz").toString
    // uniform 256x256 grid: the worst case for 1-d sorting (the second
    // column is uniform within every first-column run)
    val grid = spark.range(256L * 256L)
      .select((col("id") / 256).cast("long").as("a"),
        (col("id") % 256).cast("long").as("b"))
    Sources.writeZOrdered(grid, s"$tmp/zorder", "a", "b", files = 64)
    // the 1-d baseline: same file count, range-clustered on `a` alone
    grid.repartitionByRange(64, col("a")).sortWithinPartitions("a")
      .write.parquet(s"$tmp/linear")

    // model exactly what a stats-aware reader does: a file is READ iff
    // its [min, max] footer range intersects the predicate range
    def filesRead(path: String, c: String, lo: Long, hi: Long): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg(min(c).as("mn"), max(c).as("mx"))
        .where(col("mx") >= lo && col("mn") <= hi)
        .count()

    // predicate on the non-sort dimension: the 1-d layout reads ALL 64
    // files (every file spans the full b range); z-order bounds each
    // file to a rectangle, so only the intersecting block-files read.
    // Ideal at this granularity: 64 files = 8x8 grid of 32x32 blocks, a
    // 16-wide band overlaps <=2 of 8 rows -> <=16 files; range-partition
    // boundaries come from SAMPLING, so unaligned files can straddle a
    // block edge and widen their box — allow a straddle margin, the
    // claim under test is the ~sqrt fraction vs ALL
    assert(filesRead(s"$tmp/linear", "b", 100L, 115L) == 64L)
    val zb = filesRead(s"$tmp/zorder", "b", 100L, 115L)
    assert(zb <= 24L, s"z-order read $zb/64 files on a 16/256-wide b range")
    // and the a dimension keeps locality too (balanced, not traded away)
    val za = filesRead(s"$tmp/zorder", "a", 100L, 115L)
    assert(za <= 24L, s"z-order read $za/64 files on a 16/256-wide a range")
    // layouts hold identical data
    assert(spark.read.parquet(s"$tmp/zorder")
      .where(col("b").between(100L, 115L)).count() ==
      spark.read.parquet(s"$tmp/linear")
        .where(col("b").between(100L, 115L)).count())
  }

  test("z-ordered write survives empty input; quantization is exact at wide ranges") {
    val tmp = Files.createTempDirectory("graftz2").toString
    // zero rows: min/max agg yields nulls — must write the empty table,
    // not NPE on Row.getLong
    val empty = spark.range(0).select(col("id").as("a"), col("id").as("b"))
    Sources.writeZOrdered(empty, s"$tmp/empty", "a", "b", files = 4)
    assert(spark.read.parquet(s"$tmp/empty").count() == 0)
    // near-full-long span (a multiply-then-divide quantizer overflows at
    // spans >= 2^(63-bits); IEEE-double division rounds across bucket
    // boundaries past 2^53): extremes and midpoint must land in
    // distinct, ordered, in-range buckets with min at z=0
    val mn = Long.MinValue / 2 + 1
    val mx = Long.MaxValue / 2
    val z = Seq(mn, mn + (mx - mn) / 2, mx).toDF("a").withColumn("b", col("a"))
      .select(Sources.zValue(col("a"), col("b"), mn, mx, mn, mx, 8).as("z"))
      .collect().map(_.getLong(0))
    assert(z(0) == 0L, s"min value must quantize to bucket 0, got ${z(0)}")
    assert(z.sameElements(z.sorted) && z.distinct.length == 3, z.mkString(","))
    assert(z.forall(v => v >= 0L && v < (1L << 16)), z.mkString(","))
  }

  test("bucketed table join plans without a shuffle on the bucket key") {
    // the in-memory catalog is fresh per JVM but the warehouse directory
    // persists on disk — clear both before re-creating the tables
    Seq("bucket_a", "bucket_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(loc)
      }
    }
    // force SMJ so the only possible exchange is a shuffle (a broadcast
    // join would trivially contain no shuffle Exchange)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val a = (1L to 100L).map(i => (i, s"n$i")).toDF("k", "va")
    val b = (1L to 100L).map(i => (i, i * 2)).toDF("k", "vb")
    Sources.writeBucketed(a, "bucket_a", "k", 4)
    Sources.writeBucketed(b, "bucket_b", "k", 4)
    val joined = spark.table("bucket_a").join(spark.table("bucket_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucket join still shuffles:\n$plan")
    assert(joined.count() == 100)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      (64L * 1024 * 1024).toString)
  }
}
