package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.storage.Segments

class ModelStorageSpec extends AnyFunSuite {
  import TestSpark._

  private val specJson =
    """{"name":"t1","columns":[
      |{"name":"id","dataType":"bigint"},
      |{"name":"name","dataType":"varchar","index":true,"default":"none"},
      |{"name":"score","dataType":"double","default":"1.5"},
      |{"name":"d","dataType":"date"},
      |{"name":"t","dataType":"time"},
      |{"name":"ts","dataType":"datetime"}],
      |"sort.columns":["id"],"grouping":true,"dims":["id"],
      |"metrics":[{"name":"score","agg":"sum"}]}""".stripMargin

  test("table spec JSON round-trip, types and TIME convention") {
    val spec = TableSpec.fromJson(specJson)
    assert(spec.structType.fields.map(_.dataType).toSeq == Seq(
      LongType, StringType, DoubleType, DateType, IntegerType, TimestampType))
    assert(spec.sortColumns == Seq("id") && spec.grouping && spec.dims == Seq("id"))
    assert(spec.metrics == Seq("score" -> "sum"))
    val again = TableSpec.fromJson(spec.toJson)
    assert(again == spec)
    assert(TimeCodec.parse("13:45:30") == 49530)
    assert(TimeCodec.format(49530) == "13:45:30")
  }

  test("catalog table_specs/*.json parse and match the parquet schemas") {
    val specDir = new java.io.File("table_specs")
    val files = specDir.listFiles().filter(_.getName.endsWith(".json"))
    assert(files.length == 10)
    files.foreach { f =>
      val spec = TableSpec.fromJson(Files.readString(f.toPath))
      val actual = Tables.df(spark, sf, spec.name).schema
      assert(spec.structType.fieldNames.toSeq == actual.fieldNames.toSeq,
        s"${spec.name}: column names")
      spec.structType.fields.zip(actual.fields).foreach { case (want, got) =>
        // events.ts: TIMESTAMP(NANOS) parquet is read as epoch-nano long
        // (nanosAsLong session setting) though the spec declares datetime
        val ok = want.dataType == got.dataType ||
          // datetime: parquet without isAdjustedToUTC reads as NTZ in Spark 4
          (want.dataType == TimestampType && got.dataType == TimestampNTZType) ||
          (spec.name == "events" && want.name == "ts" && got.dataType == LongType)
        assert(ok, s"${spec.name}.${want.name}: ${want.dataType} vs ${got.dataType}")
      }
    }
  }

  test("applyDefaults fills nulls with typed defaults (no-null parity)") {
    import spark.implicits._
    val spec = TableSpec.fromJson(specJson)
    val df = Seq((1L, null.asInstanceOf[String], null.asInstanceOf[java.lang.Double]))
      .toDF("id", "name", "score")
    val out = spec.applyDefaults(df).collect().head
    assert(out.getAs[String]("name") == "none")
    assert(out.getAs[Double]("score") == 1.5)
  }

  test("schema update: add / alter / delete column rewrite") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-schema").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").write.parquet(dir)
    SchemaUpdate.addColumn(spark, dir, ColumnSpec("flag", "int", default = Some("7")))
    assert(spark.read.parquet(dir).select("flag").collect().map(_.getInt(0)).toSeq == Seq(7, 7))
    SchemaUpdate.alterColumn(spark, dir, ColumnSpec("flag", "bigint"))
    assert(spark.read.parquet(dir).schema("flag").dataType == LongType)
    SchemaUpdate.deleteColumn(spark, dir, "flag")
    assert(!spark.read.parquet(dir).columns.contains("flag"))
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("ManifestFileIndex prunes segment files inside the Catalyst scan") {
    import graft.plans.ManifestFileIndex
    val dir = Files.createTempDirectory("graft-mfi").toString + "/li"
    val li = Tables.lineitem(spark, sf)
    Segments.write(li, dir, sortCols = Seq("l_orderkey"),
      indexedCols = Seq("l_orderkey"), numSegments = 8)

    val (df, index) = ManifestFileIndex.readWithIndex(spark, dir)
    // correctness: same rows as a plain read
    val n = df.filter(col("l_orderkey") <= 50L).count()
    assert(n == spark.read.parquet(dir).filter(col("l_orderkey") <= 50L).count())
    // pruning happened inside the real scan (resolved data filters reach
    // listFiles during execution)
    val keptFiltered = index.lastKept
    assert(keptFiltered >= 1 && keptFiltered < 8,
      s"index kept $keptFiltered of 8 files for the range predicate")
    assert(df.count() == li.count()) // unfiltered read keeps everything
    assert(index.lastKept == 8)
  }

  test("format(\"graft\") resolves by name to the manifest-pruned relation") {
    val dir = Files.createTempDirectory("graft-fmt").toString + "/li"
    val li = Tables.lineitem(spark, sf)
    Segments.write(li, dir, sortCols = Seq("l_orderkey"),
      indexedCols = Seq("l_orderkey"), numSegments = 8)
    // ServiceLoader resolves the short name — the reference's
    // format("indexr") registration shape (SURVEY.md §3.2)
    val df = spark.read.format("graft").load(dir)
    assert(df.count() == li.count())
    assert(df.filter(col("l_orderkey") <= 50L).count() ==
      spark.read.parquet(dir).filter(col("l_orderkey") <= 50L).count())
    // the relation really is manifest-backed (prunable), not a plain scan
    val idx = df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location
        }
    }
    assert(idx.exists(_.isInstanceOf[graft.plans.ManifestFileIndex]))
  }

  test("SQL DDL: CREATE TABLE ... USING graft serves the manifest-pruned relation") {
    // the reference's SQL-first table surface: a pure-SQL session defines
    // the table by format name + location and never touches the Scala API
    val dir = Files.createTempDirectory("graft-ddl").toString + "/li"
    val li = Tables.lineitem(spark, sf)
    Segments.write(li, dir, sortCols = Seq("l_orderkey"),
      indexedCols = Seq("l_orderkey"), numSegments = 8)
    spark.sql("DROP TABLE IF EXISTS li_ddl")
    spark.sql(s"CREATE TABLE li_ddl USING graft OPTIONS (path '$dir')")
    try {
      val n = spark.sql("SELECT count(*) AS n FROM li_ddl").head().getLong(0)
      assert(n == li.count())
      assert(spark.sql("SELECT count(*) FROM li_ddl WHERE l_orderkey <= 50")
        .head().getLong(0) ==
        spark.read.parquet(dir).filter(col("l_orderkey") <= 50L).count())
      // still the manifest-backed relation, not a plain parquet scan
      val idx = spark.table("li_ddl").queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location
          }
      }
      assert(idx.exists(_.isInstanceOf[graft.plans.ManifestFileIndex]))
    } finally spark.sql("DROP TABLE IF EXISTS li_ddl")
  }

  test("ManifestAggregates answers count/min/max from metadata, no scan") {
    import graft.plans.{ManifestAggregates, ManifestFileIndex}
    val dir = Files.createTempDirectory("graft-magg").toString + "/li"
    val li = Tables.lineitem(spark, sf)
    Segments.write(li, dir, sortCols = Seq("l_orderkey"),
      indexedCols = Seq("l_orderkey", "l_shipdate", "l_quantity"), numSegments = 8)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ManifestAggregates(spark)
    try {
      val df = ManifestFileIndex.read(spark, dir)
      val out = df.agg(
        count(lit(1)).as("n"),
        min(col("l_orderkey")).as("min_ok"), max(col("l_orderkey")).as("max_ok"),
        min(col("l_shipdate")).as("min_sd"), max(col("l_quantity")).as("max_q"))
      // the whole aggregate collapses to metadata: no scan in the plan
      val plan = out.queryExecution.optimizedPlan.toString()
      assert(plan.contains("LocalRelation"), s"expected metadata answer:\n$plan")
      assert(!plan.contains("Relation") || !plan.contains("parquet"),
        s"scan survived the rewrite:\n$plan")
      // and the metadata answer equals the scan answer exactly
      val expect = spark.read.parquet(dir).agg(
        count(lit(1)), min(col("l_orderkey")), max(col("l_orderkey")),
        min(col("l_shipdate")), max(col("l_quantity"))).collect().head
      assert(out.collect().head == expect)
      // shapes metadata can't answer are left alone: filters, count(col),
      // unindexed columns, and TZ-aware timestamps (manifest strings were
      // rendered under the build session's timezone — a session with a
      // different spark.sql.session.timeZone would get shifted bounds, so
      // they must take the always-correct scan path)
      val filtered = df.filter(col("l_orderkey") > 10L).agg(min(col("l_orderkey")))
      assert(!filtered.queryExecution.optimizedPlan.toString().contains("LocalRelation"))
      val countCol = df.agg(count(col("l_returnflag")))
      assert(!countCol.queryExecution.optimizedPlan.toString().contains("LocalRelation"))
      val unindexed = df.agg(min(col("l_extendedprice")))
      assert(!unindexed.queryExecution.optimizedPlan.toString().contains("LocalRelation"))
      // (l_shipdate above is TimestampNTZ in this parquet — TZ-independent
      // strings, legitimately collapsible; a TZ-AWARE timestamp must not be)
      val tsDir = Files.createTempDirectory("graft-magg-ts").toString + "/ts"
      val tsDf = spark.range(100).select(col("id"),
        timestamp_seconds(col("id") * 3600).as("ts"))
      Segments.write(tsDf, tsDir, sortCols = Seq("id"),
        indexedCols = Seq("id", "ts"), numSegments = 2)
      val tdf = ManifestFileIndex.read(spark, tsDir)
      assert(tdf.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
      val tzTimestamp = tdf.agg(min(col("ts")))
      assert(!tzTimestamp.queryExecution.optimizedPlan.toString().contains("LocalRelation"),
        "TZ-aware timestamp bounds depend on the build session timezone and " +
          "must take the scan path")
      // the fallback still computes the right value through the scan
      assert(tzTimestamp.collect().head ==
        spark.read.parquet(tsDir).agg(min(col("ts"))).collect().head)
      // while the TZ-independent columns of the same table still collapse
      assert(tdf.agg(min(col("id"))).queryExecution.optimizedPlan.toString()
        .contains("LocalRelation"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[ManifestAggregates])
    }
  }

  test("ManifestFileIndex prunes on LIKE-prefix predicates (CMap parity)") {
    import graft.plans.ManifestFileIndex
    val dir = Files.createTempDirectory("graft-mfi2").toString + "/part"
    Segments.write(Tables.part(spark, sf), dir, sortCols = Seq("p_name"),
      indexedCols = Seq("p_name"), numSegments = 6)
    val (df, index) = ManifestFileIndex.readWithIndex(spark, dir)
    val n = df.filter(col("p_name").like("s%")).count()
    assert(n == Tables.part(spark, sf).filter(col("p_name").like("s%")).count())
    assert(n > 0, "fixture assumption: some part names start with 's'")
    assert(index.lastKept >= 1 && index.lastKept < 6,
      s"LIKE-prefix kept ${index.lastKept} of 6 files")
    // a prefix past every name prunes all files
    assert(df.filter(col("p_name").like("zzz%")).count() == 0)
    assert(index.lastKept == 0)
  }

  test("z-ordered layout prunes box predicates on BOTH dimensions") {
    import graft.plans.ManifestFileIndex
    import spark.implicits._
    val base = Files.createTempDirectory("graft-zorder").toString
    // two independent uniform dims: a lexicographic sort on x leaves every
    // file's y-range spanning the whole domain, so a y-constraint prunes
    // nothing there — the z-order layout must prune on both
    val rnd = new scala.util.Random(54)
    val df = (0 until 4096).map { i =>
      (i.toLong, rnd.nextInt(10000).toLong, rnd.nextInt(10000).toLong)
    }.toDF("id", "x", "y")
    Segments.write(df, s"$base/lex", sortCols = Seq("x"),
      indexedCols = Seq("x", "y"), numSegments = 16)
    Segments.writeZOrdered(df, s"$base/z", zCols = Seq("x", "y"),
      numSegments = 16)

    // weakly selective on the lex leading dim (x: half the domain), highly
    // selective on the trailing one (y: 10%) — the shape where a leading-
    // column sort is useless and only a multi-dim layout prunes
    val box = col("x").between(0L, 4999L) && col("y").between(7000L, 7999L)
    val want = df.filter(box).select($"id").as[Long].collect().sorted.toSeq

    val (zRead, zIdx) = ManifestFileIndex.readWithIndex(spark, s"$base/z")
    val got = zRead.filter(box).select($"id").as[Long].collect().sorted.toSeq
    assert(got == want, "z-ordered read must return exactly the box rows")
    val zKept = zIdx.lastKept

    val (lexRead, lexIdx) = ManifestFileIndex.readWithIndex(spark, s"$base/lex")
    assert(lexRead.filter(box).count() == want.size)
    val lexKept = lexIdx.lastKept

    // the lex sort prunes on x only (half the files survive x, all survive
    // y); z-order must beat it by pruning on y too, and must prune at all
    assert(zKept < 16, s"z layout pruned nothing ($zKept of 16)")
    assert(zKept < lexKept,
      s"z layout kept $zKept files, lexicographic kept $lexKept — no 2-D gain")
    // unfiltered read stays complete
    assert(zRead.count() == 4096)
  }

  test("bloom manifest prunes string-equality probes min/max cannot") {
    import graft.plans.ManifestFileIndex
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bloom").toString + "/t"
    // high-cardinality string key scattered across id-sorted files: every
    // file's (min,max) spans nearly the whole hex space, so range pruning is
    // useless for point lookups — exactly the case the bloom exists for
    val df = spark.range(1000)
      .select($"id", md5(concat(lit("k"), $"id")).as("key"))
    Segments.write(df.toDF(), dir, sortCols = Seq("id"),
      indexedCols = Seq("id", "key"), numSegments = 8, bloomCols = Seq("key"))
    val m = Segments.readManifest(dir)
    assert(m.forall(_.blooms.contains("key")), "every file carries a key bloom")

    // present value: its own file is kept (no false negatives — checked for
    // every 50th key) and pruning beats the min/max-only answer (8 files)
    val keys = df.filter($"id" % 50 === 0).select($"key").as[String].collect()
    val (fullRead, index) = ManifestFileIndex.readWithIndex(spark, dir)
    keys.foreach { k =>
      assert(fullRead.filter($"key" === k).count() == 1, s"lost the row for $k")
      assert(index.lastKept < 8, s"bloom failed to prune any file for $k")
    }
    // absent values: expected-case prune to ~0 files (bloom false-positive
    // rate leaves a small tail), and never a phantom row
    val probes = (0 until 20).map(i => s"absent-$i")
    val keptCounts = probes.map { p =>
      val c = fullRead.filter($"key" === p).count()
      assert(c == 0)
      index.lastKept
    }
    assert(keptCounts.sum < 8, s"absent probes kept ${keptCounts.sum} files total")

    // IN-list pruning is per-value (disjunction of blooms), not min..max span
    val n = fullRead.filter($"key".isin(keys(0), "absent-x")).count()
    assert(n == 1 && index.lastKept < 8)

    // pack level: the parquet footer carries a native bloom filter for the
    // column (row-group skipping inside kept files — ExtIndex_Str_Hash
    // parity at pack scope; the reader consults it on pushed-down probes)
    import scala.jdk.CollectionConverters._
    val pf = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(pf.getPath),
        spark.sparkContext.hadoopConfiguration))
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns.asScala
      val keyCol = cols.find(_.getPath.toDotString == "key").get
      assert(keyCol.getBloomFilterOffset >= 0, "key column must carry a bloom filter")
      val idCol = cols.find(_.getPath.toDotString == "id").get
      assert(idCol.getBloomFilterOffset < 0, "non-bloom column stays bloom-free")
    } finally reader.close()
  }

  test("trigram manifest prunes substring-LIKE probes (CMap parity)") {
    import graft.plans.ManifestFileIndex
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ngram").toString + "/t"
    // 1000 id-sorted rows in 8 files; only ids < 100 (one range file)
    // contain the marker substring — min/max on txt can't express that
    val df = spark.range(1000).select($"id",
      concat(lit("plain text body "),
        when($"id" < 100, lit("xylophone ")).otherwise(lit("")),
        lit("tail"), $"id").as("txt"))
    Segments.write(df.toDF(), dir, sortCols = Seq("id"),
      indexedCols = Seq("id"), numSegments = 8, ngramCols = Seq("txt"))
    val m = Segments.readManifest(dir)
    assert(m.forall(_.ngrams.contains("txt")), "every file carries a txt trigram bloom")

    val (fullRead, index) = ManifestFileIndex.readWithIndex(spark, dir)
    // present substring: all matching rows survive, non-matching files skip
    assert(fullRead.filter($"txt".like("%xylophone%")).count() == 100)
    assert(index.lastKept <= 2, s"substring-LIKE kept ${index.lastKept} of 8 files")
    // absent substring: no rows, (near-)total prune — bloom FP tail allowed
    assert(fullRead.filter($"txt".like("%qqqzzz%")).count() == 0)
    assert(index.lastKept <= 2, s"absent needle kept ${index.lastKept} of 8 files")
    // general multi-wildcard LIKE: each literal chunk prunes independently
    assert(fullRead.filter($"txt".like("%xylo%hone%")).count() == 100)
    assert(index.lastKept <= 2, s"chunked LIKE kept ${index.lastKept} of 8 files")
    // sub-trigram needle can't prune but must stay correct
    assert(fullRead.filter($"txt".like("%xy%")).count() == 100)
  }

  test("csv bulk load applies spec types/defaults and round-trips via export") {
    import graft.sources.Csv
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,label,score\n1,a,2.5\n2,b,\n3,,9.0\n")
    val spec = TableSpec("csvt", Seq(
      ColumnSpec("id", "bigint", index = true),
      ColumnSpec("label", "varchar", default = Some("none")),
      ColumnSpec("score", "double", default = Some("-1")),
      ColumnSpec("extra", "int", default = Some("42"))),
      sortColumns = Seq("id"))
    Csv.load(spark, s"$dir/in.csv", spec, s"$dir/table", numSegments = 2)
    val t = spark.read.parquet(s"$dir/table").orderBy("id").collect()
    assert(t.length == 3)
    assert(t(1).getAs[Double]("score") == -1.0) // empty → default
    assert(t(2).getAs[String]("label") == "none")
    assert(t.forall(_.getAs[Int]("extra") == 42)) // missing col → default
    assert(Segments.readManifest(s"$dir/table").nonEmpty)
    Csv.exportCsv(spark, s"$dir/table", s"$dir/out")
    val back = spark.read.option("header", "true").csv(s"$dir/out")
    assert(back.count() == 3 && back.columns.toSeq ==
      Seq("id", "label", "score", "extra"))
  }

  test("ORC segments: write, manifest, pruned read (Parquet/ORC parity)") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/li"
    val li = Tables.lineitem(spark, sf)
    Segments.write(li, dir, sortCols = Seq("l_orderkey"),
      indexedCols = Seq("l_orderkey"), numSegments = 4, format = "orc")
    assert(Segments.manifestFormat(dir) == "orc")
    assert(spark.read.orc(dir).count() == li.count())
    // the Catalyst FileIndex path also honors the ORC format
    val (mdf, midx) = graft.plans.ManifestFileIndex.readWithIndex(spark, dir)
    assert(mdf.filter(col("l_orderkey") <= 100L).count() ==
      li.filter(col("l_orderkey") <= 100L).count())
    assert(midx.lastKept >= 1 && midx.lastKept < 4)
    val r = Segments.Range("l_orderkey", lo = None, hi = Some("100"))
    val (kept, total) = Segments.prunedFileCount(dir, Seq(r))
    assert(kept < total, s"expected ORC pruning, kept $kept of $total")
    val got = Segments.prunedRead(spark, dir, Seq(r))
      .filter(col("l_orderkey") <= 100L).count()
    assert(got == li.filter(col("l_orderkey") <= 100L).count())
  }

  test("segment write sorts by dims and manifest prunes file scans") {
    val dir = Files.createTempDirectory("graft-seg").toString + "/lineitem"
    val li = Tables.lineitem(spark, sf)
    Segments.write(li, dir, sortCols = Seq("l_shipdate"),
      indexedCols = Seq("l_shipdate", "l_orderkey"), numSegments = 8)

    // manifest exists with 8 entries and full row coverage
    val m = Segments.readManifest(dir)
    assert(m.size == 8)
    assert(m.map(_.rows).sum == li.count())

    // a narrow date range must prune most files…
    val r = Segments.Range("l_shipdate",
      lo = Some("1996-01-01 00:00:00"), hi = Some("1996-03-01 00:00:00"), numeric = false)
    val (kept, total) = Segments.prunedFileCount(dir, Seq(r))
    assert(kept < total, s"expected pruning, kept $kept of $total")

    // …and the pruned read must still return exactly the right rows
    val expected = li.filter(col("l_shipdate").between("1996-01-01", "1996-03-01")).count()
    val got = Segments.prunedRead(spark, dir, Seq(r))
      .filter(col("l_shipdate").between("1996-01-01", "1996-03-01")).count()
    assert(got == expected)

    // pruning must never lose rows outside the predicate either (tri-state
    // rough check is conservative): empty range keeps nothing
    val none = Segments.Range("l_orderkey", lo = Some("99999999"), hi = None)
    assert(Segments.prunedRead(spark, dir, Seq(none)).count() == 0)
  }

  test("manifestBounds answers from metadata alone (zero data files opened)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bounds").toString + "/t"
    val df = spark.range(1, 1001).select($"id".as("k"), ($"id" * 2.5).as("v"))
    Segments.write(df, dir, sortCols = Seq("k"), indexedCols = Seq("k", "v"),
      numSegments = 4)
    // histQuantilesAuto fed by the manifest equals the data-derived binning
    val fromData = graft.operators.Extended.histQuantilesAuto(
      spark.read.parquet(dir), "v", Seq(50, 95), bins = 128).collect().toSet
    // DELETE every data file: only the manifest remains — the bounds (and
    // thus the sketch's bin layout) must still derive, proving no data read
    val d = new java.io.File(dir)
    d.listFiles().filter(_.getName.endsWith(".parquet")).foreach(f =>
      assert(f.delete(), s"couldn't delete ${f.getName}"))
    val b = Segments.manifestBounds(dir, "v")
    assert(b.contains((2.5, 2500.0)), s"bounds from metadata: $b")
    assert(Segments.manifestBounds(dir, "nope").isEmpty)
    // the bounds seed the SAME bin layout the data-derived path used
    val fromMeta = graft.operators.Extended.histQuantilesAuto(
      df, "v", Seq(50, 95), bins = 128, bounds = b).collect().toSet
    assert(fromMeta == fromData)
  }

  test("manifestCountDrift reads ONLY the manifests (files deleted)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-segdrift").toString
    val docs = spark.range(0, 400).select($"id", ($"id" % 4).as("seg"))
    val o = s"$root/old"
    val n = s"$root/new"
    docs.write.partitionBy("seg").parquet(o)
    // new snapshot: drop every doc in seg 3, halve seg 0
    docs.filter($"seg" =!= 3 && !($"seg" === 0 && $"id" >= 200))
      .write.partitionBy("seg").parquet(n)
    Segments.buildManifest(spark, o, Nil)
    Segments.buildManifest(spark, n, Nil)
    // DELETE every data file on both sides: only the manifests remain —
    // the drift table must still derive, proving no data file is opened
    for (d <- Seq(o, n); p <- new java.io.File(d).listFiles();
         f <- Option(p.listFiles()).getOrElse(Array.empty[java.io.File])
         if f.getName.endsWith(".parquet"))
      assert(f.delete(), s"couldn't delete ${f.getName}")
    val drift = graft.operators.Curation.manifestCountDrift(spark, o, n)
    // and it is a LocalRelation: #segments rows the planner already held
    assert(drift.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    val rows = drift.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows == Map(
      "seg=0" -> ((100L, 50L, -50L)), "seg=1" -> ((100L, 100L, 0L)),
      "seg=2" -> ((100L, 100L, 0L)), "seg=3" -> ((100L, 0L, -100L))))
  }

  test("And/Or/Not rough-check algebra prunes conservatively") {
    import graft.plans.ManifestFileIndex
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bool").toString + "/t"
    // sorted by k so files hold disjoint k ranges; c is constant per file half
    val df = spark.range(800).select($"id".as("k"),
      when($"id" < 400, "lo").otherwise("hi").as("c"))
    Segments.write(df.toDF(), dir, sortCols = Seq("k"),
      indexedCols = Seq("k", "c"), numSegments = 8)
    val (read, index) = ManifestFileIndex.readWithIndex(spark, dir)
    // OR of two disjoint ranges keeps both ends, prunes the middle
    val n = read.filter($"k" < 50L || $"k" >= 750L).count()
    assert(n == 100 && index.lastKept >= 2 && index.lastKept < 8,
      s"OR kept ${index.lastKept} of 8")
    // NOT(=) prunes files whose column is constant at the value
    val m = read.filter($"c" =!= "lo").count()
    assert(m == 400 && index.lastKept < 8, s"NOT kept ${index.lastKept} of 8")
    // AND with one untranslatable side still prunes via the other
    val a = read.filter($"k" < 50L && length($"c") >= 0).count()
    assert(a == 50 && index.lastKept < 8, s"AND kept ${index.lastKept} of 8")
  }

  test("manifest string compares use UTF-8 byte order (UTF8String parity)") {
    // U+FFFD (3-byte UTF-8, high UTF-16 code unit) vs U+10400 (4-byte UTF-8,
    // surrogate pair): compareTo says FFFD > 10400, UTF-8 bytes say the
    // opposite — the order Spark's min/max used
    val bmp = "�"
    val supp = new String(Character.toChars(0x10400))
    assert(bmp.compareTo(supp) > 0)           // JVM order (wrong for stats)
    assert(Segments.utf8Cmp(bmp, supp) < 0)   // UTF8String order
    // a file whose min/max straddle the probe in UTF-8 order must be kept
    val fs = Segments.FileStats("f", 1, Map("s" -> (Some(bmp), Some(supp))))
    val probe = Segments.Range("s", lo = Some(supp), hi = Some(supp), numeric = false)
    assert(probe.mayMatch(fs), "UTF-8-order max bound wrongly pruned the file")
  }

  test("v1 manifests: literal \"null\" bounds are treated as absent stats") {
    val dir = Files.createTempDirectory("graft-v1m").toString
    // a version-less (v1) manifest where col s serialized all-null stats as
    // the string "null" — must NOT prune, even for probes far from "null"
    Files.writeString(java.nio.file.Paths.get(dir, Segments.ManifestFile),
      """{"format":"parquet","files":[
        |{"file":"f1","rows":10,"stats":{"s":{"min":"null","max":"null"}}}]}"""
        .stripMargin.replace("\n", ""))
    val m = Segments.readManifest(dir)
    assert(m.head.stats("s") == (None, None))
    val probe = Segments.Range("s", lo = Some("zzz"), hi = None, numeric = false)
    assert(m.count(fs => probe.mayMatch(fs)) == 1, "v1 \"null\" stats caused pruning")
    // v2 manifests keep a real "null" string bound distinguishable
    Files.writeString(java.nio.file.Paths.get(dir, Segments.ManifestFile),
      """{"version":2,"format":"parquet","files":[
        |{"file":"f1","rows":10,"stats":{"s":{"min":"null","max":"null"}}}]}"""
        .stripMargin.replace("\n", ""))
    assert(Segments.readManifest(dir).head.stats("s") == (Some("null"), Some("null")))
  }
}
