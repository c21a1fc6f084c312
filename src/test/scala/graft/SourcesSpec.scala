package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Bucketing, Loaders}

/** Loaders (csv/json-reviews/text-dir) + the bucketed co-located join
  * guarantee. */
class SourcesSpec extends GraftSuite {

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("Loaders.csv reads a header CSV with the declared schema") {
    val dir = tmpDir("csv")
    Files.writeString(Paths.get(dir, "data.csv"),
      "id,name,score\n1,alpha,0.5\n2,beta,1.5\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = Loaders.csv(spark, dir, schema)
    assert(df.schema == schema)
    assert(df.count() == 2)
    assert(df.where(col("name") === "beta").head().getDouble(2) == 1.5)
  }

  test("Loaders.cifar parses fixed-length binary records and feeds the image family") {
    // 5 records of 2x2x3: label byte + 12 channel-planar pixel bytes, with
    // pixel byte = (record * 50 + channel * 16 + pixel * 4) — distinct per
    // slot so any interleave/offset bug shows as a wrong value.
    val dir = tmpDir("cifar")
    val bytes = (0 until 5).flatMap { r =>
      (r % 10).toByte +: (for (ch <- 0 until 3; p <- 0 until 4)
        yield (r * 50 + ch * 16 + p * 4).toByte)
    }.toArray
    Files.write(Paths.get(dir, "batch.bin"), bytes)
    val df = Loaders.cifar(spark, dir, x = 2, y = 2, c = 3)
    assert(df.count() == 5)
    assert(df.columns.toSeq ==
      Seq("id", "label", "x_dim", "y_dim", "n_channels", "image"))
    assert(df.select("id").distinct().count() == 5, "ids must be unique")
    val r2 = df.where(col("label") === 2)
      .select(col("image")).head().getSeq[Double](0)
    // record 2, planar byte for (ch, p) = 100 + ch*16 + p*4, interleaved at
    // image(p*3 + ch), all /255
    for (p <- 0 until 4; ch <- 0 until 3)
      assert(math.abs(r2(p * 3 + ch) - (100 + ch * 16 + p * 4) / 255.0) < 1e-12,
        s"pixel ($p, $ch)")
    // integration: the loaded frame runs the image pipeline as-is
    val gray = graft.images.ImageOps.grayScale(
      df.select("id", "x_dim", "y_dim", "n_channels", "image"))
    val g2 = gray.where(col("id") === df.where(col("label") === 2)
      .select("id").head().getLong(0))
      .select(col("image")).head().getSeq[Double](0)
    assert(math.abs(g2(0) - (100 / 255.0 + 116 / 255.0 + 132 / 255.0) / 3) < 1e-12)
  }

  test("Loaders.jsonReviews maps ratings to binary labels") {
    val dir = tmpDir("json")
    Files.writeString(Paths.get(dir, "reviews.json"),
      """{"overall": 5.0, "reviewText": "great product"}
        |{"overall": 1.0, "reviewText": "terrible"}
        |{"overall": 4.0, "reviewText": "pretty good"}
        |""".stripMargin)
    val df = Loaders.jsonReviews(spark, dir)
    assert(df.columns.toSeq == Seq("label", "text"))
    assert(df.where(col("label") === 1).count() == 2)
    assert(df.where(col("label") === 0).count() == 1)
  }

  test("Loaders.textDirPerClass yields ONE row per file, labeled by directory") {
    val root = tmpDir("news")
    Files.createDirectories(Paths.get(root, "sci_space"))
    Files.createDirectories(Paths.get(root, "rec_autos"))
    Files.writeString(Paths.get(root, "sci_space", "a.txt"), "orbital mechanics\n")
    Files.writeString(Paths.get(root, "rec_autos", "b.txt"), "engine torque\ngearbox\n")
    val df = Loaders.textDirPerClass(spark, root)
    // NewsgroupsDataLoader semantics: a multi-line document is ONE row
    assert(df.count() == 2, "one row per FILE, not per line")
    val labels = df.select("label").distinct().collect().map(_.getString(0)).toSet
    assert(labels == Set("sci_space", "rec_autos"))
    val autos = df.where(col("label") === "rec_autos").collect()
    assert(autos.length == 1)
    assert(autos.head.getAs[String]("text").contains("torque\ngearbox"),
      "whole file content, newlines intact")
  }

  test("ORC round-trips with predicate pushdown and column pruning") {
    import graft.sources.Loaders
    val dir = tmpDir("orc") + "/nation"
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    nation.write.mode("overwrite").orc(dir)
    val back = Loaders.orc(spark, dir)
    assert(back.count() == nation.count())
    val q = back.where(col("n_nationkey") >= 10).select("n_name")
    assert(q.count() == nation.where(col("n_nationkey") >= 10).count())
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_nationkey), GreaterThanOrEqual(n_nationkey,10)]")
      || plan.contains("GreaterThanOrEqual(n_nationkey"),
      s"predicate must reach the ORC reader:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("n_regionkey"),
      s"unused columns must be pruned from the ORC scan:\n$readSchema")
  }

  test("saltedJoin equals the plain join on a skewed key distribution") {
    import spark.implicits._
    import graft.sources.Skew
    // 10k rows, 95% on one hot key
    val big = spark.range(10000)
      .select((when(col("id") % 20 =!= 0, 1L).otherwise(col("id") % 7 + 2))
        .as("k"), col("id").as("payload"))
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("k", "tag")
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
    assert(salted.count() == plain.count())
    val diff = salted.select("k", "payload", "tag")
      .exceptAll(plain.select("k", "payload", "tag")).count()
    assert(diff == 0, "salting must not change join semantics")
    // the shuffle must key on (k, __salt), not k alone
    salted.collect()
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt must appear in the join keys:\n$plan")
  }

  test("saltedSumCount matches the direct aggregation") {
    import graft.sources.Skew
    val events = spark.read.parquet(s"$sf/events.parquet")
    val direct = events.groupBy(col("event_type"))
      .agg(sum(col("value")).as("s"), count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(events, "event_type", "value", salt = 16)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("sum_value"), r.getAs[Long]("n_rows"))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (s, c)) =>
      assert(c == direct(k)._2)
      assert(math.abs(s - direct(k)._1) < 1e-6)
    }
  }

  test("partitioned sink enables partition pruning at the scan") {
    import graft.sources.Sinks
    val out = tmpDir("partitioned")
    Sinks.writePartitioned(spark.read.parquet(s"$sf/events.parquet"),
      out, Seq("event_type"))
    val pruned = spark.read.parquet(out).where(col("event_type") === "click")
    val expected = spark.read.parquet(s"$sf/events.parquet")
      .where(col("event_type") === "click").count()
    assert(pruned.count() == expected)
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).get
    assert(scanLine.contains("event_type"),
      s"partition filter must reach the scan:\n$scanLine")
  }

  test("bucketed join on the bucket key runs with ZERO shuffles") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4)
    // disable broadcast so the comparison is SortMergeJoin vs SortMergeJoin
    // (with broadcast on, AQE would hide the shuffle question entirely)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      assert(joined.count() == 6000)
      val shuffles = Bucketing.numShuffles(joined)
      assert(shuffles == 0,
        s"co-located bucketed join must not shuffle, found $shuffles exchanges:\n" +
          joined.queryExecution.executedPlan)
      // same join over the raw (unbucketed) parquet DOES shuffle — the
      // baseline the bucketing removes
      val raw = orders.join(lineitem, "o_orderkey")
      raw.count()
      assert(Bucketing.numShuffles(raw) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe.foreach(v =>
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v))
    }
  }

  test("Layout.zValue interleaves bits exactly; SQL spelling agrees") {
    import spark.implicits._
    import graft.sources.Layout
    // (x=3, y=1, bits=2): x bits land at positions 0/2, y at 1 → z = 7
    // (x=5, y=6, bits=3): x=101 → 1+16, y=110 → 8+32 → z = 57
    val df = Seq((3L, 1L), (5L, 6L), (0L, 0L)).toDF("x", "y")
    val got = df.select(Layout.zValue($"x", $"y", 3).as("z"))
      .as[Long].collect().toSeq
    assert(got == Seq(7L, 57L, 0L))
    val viaSql = df.selectExpr(Layout.zValueSql("x", "y", 3) + " AS z")
      .as[Long].collect().toSeq
    assert(viaSql == got, "Column and SQL spellings must agree bit-for-bit")
  }

  test("clusterByZ: a 2-d box touches fewer blocks than a 1-d sorted layout") {
    import spark.implicits._
    import graft.sources.Layout
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey")
    // per-partition (x, y) envelopes for a given layout
    def envelopes(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("pid", spark_partition_id())
      .groupBy($"pid")
      .agg(min($"l_partkey").as("pmin"), max($"l_partkey").as("pmax"),
        min($"l_suppkey").as("smin"), max($"l_suppkey").as("smax"))
      .collect()
    // box wide in partkey, narrow in suppkey (sf0.001 keys: p 0–199,
    // s 0–9) — the case a table sorted only by partkey can't serve
    val (pLo, pHi, sLo, sHi) = (0L, 199L, 2L, 3L)
    def touched(env: Array[org.apache.spark.sql.Row]): Int = env.count { r =>
      r.getAs[Long]("pmax") >= pLo && r.getAs[Long]("pmin") <= pHi &&
        r.getAs[Long]("smax") >= sLo && r.getAs[Long]("smin") <= sHi
    }
    val zLayout = envelopes(Layout.clusterByZ(li, "l_partkey", "l_suppkey",
      bits = 8, numRanges = 16))
    val oneDim = envelopes(li.repartitionByRange(16, $"l_partkey"))
    assert(zLayout.length == 16 && oneDim.length == 16)
    val (zt, ot) = (touched(zLayout), touched(oneDim))
    assert(zt < ot,
      s"z-order must prune better on a 2-d box: z touches $zt, 1-d sort $ot")
  }

  test("clusterByZ: wide long ranges (epoch millis) stay exact, no overflow") {
    import spark.implicits._
    import graft.sources.Layout
    // spans far past 2^53: the old (col-lo)*scale/span spelling overflowed
    // the multiply and lost exactness in the double-promoting divide
    val base = 1700000000000L // epoch millis
    val rows = (0 until 1000).map { i =>
      (base + i.toLong * 86400000L, (i % 50).toLong)
    }.toDF("ts", "key")
    val clustered = Layout.clusterByZ(rows, "ts", "key", bits = 8, numRanges = 8)
    assert(clustered.count() == 1000) // all rows survive, no overflow error
    // block envelopes in ts must be disjoint-ish: the layout is genuinely
    // range-clustered, which only happens if the wide-branch bucket ids
    // are monotone in ts
    val env = clustered.withColumn("pid", spark_partition_id())
      .groupBy($"pid").agg(min($"ts").as("lo"), max($"ts").as("hi"))
      .orderBy($"lo").collect()
    val spans = env.map(r => r.getAs[Long]("hi") - r.getAs[Long]("lo"))
    val full = 999L * 86400000L
    assert(spans.forall(_ < full),
      "every z-clustered block must cover a strict sub-range of ts")
  }

  test("Bloom filter: zero false negatives, strong pruning of non-members") {
    import spark.implicits._
    import graft.sources.Bloom
    val keys = (0L until 500L).map(_ * 7919L + 13L)
    val build = keys.toDF("k")
    val bitmap = Bloom.buildBitmap(build, col("k"), words = 64)
    // every inserted key MUST pass — the exact-join correctness hinges on it
    assert(build.where(Bloom.mightContain(col("k"), bitmap)).count() == 500)
    // non-members: 500 keys × 3 hashes in 4096 bits → fp ≈ (1500/4096)^3 ≈ 5%
    val probe = (0L until 20000L).map(_ + 1000000000L).toDF("k")
    val kept = probe.where(Bloom.mightContain(col("k"), bitmap)).count()
    assert(kept < 2500, s"expected ~5% false positives, kept $kept of 20000")
  }

  test("decodeImage decodes REAL PNG and JPEG bytes through javax.imageio") {
    import graft.images.MultimodalOps
    // PNG: lossless — every decoded byte must equal the generator formula
    val assets = MultimodalOps.encodedAssets(spark, n = 4, x = 8, y = 8)
    // the content column is genuinely compressed PNG, not raw pixels
    val first = assets.orderBy(col("asset_id")).head()
    val bytes = first.getAs[Array[Byte]]("content")
    assert(bytes.take(4).sameElements(Array(0x89.toByte, 'P'.toByte,
      'N'.toByte, 'G'.toByte)), "content must carry a PNG signature")
    val decoded = MultimodalOps.decodeImage(assets).collect()
    assert(decoded.length == 4)
    decoded.foreach { img =>
      assert(img.x_dim == 8 && img.y_dim == 8 && img.n_channels == 3)
      img.image.zipWithIndex.foreach { case (v, i) =>
        val expect = ((img.id * 31 + i * 7) % 256) / 255.0
        assert(v == expect, s"asset ${img.id} pixel $i: $v != $expect")
      }
    }
    // JPEG: lossy — assert the codec path works end-to-end (decodes to the
    // right shape with plausibly-close values), not bit equality
    import spark.implicits._
    val jpeg = spark.range(0, 2).map { id =>
      val buf = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) buf.setRGB(x, y, 0x808080)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(buf, "jpg", bos)
      (id, "image", 8, 8, 3, 1, bos.toByteArray)
    }.toDF("asset_id", "media_type", "x_dim", "y_dim", "n_channels",
      "n_frames", "content")
    val jdec = MultimodalOps.decodeImage(jpeg).collect()
    assert(jdec.length == 2 && jdec.forall(_.image.length == 8 * 8 * 3))
    assert(jdec.forall(_.image.forall(v => math.abs(v - 128.0 / 255) < 0.05)),
      "uniform gray must survive JPEG within tolerance")
  }

  test("decodeWav decodes REAL WAV bytes through javax.sound (lossless PCM16)") {
    import graft.images.MultimodalOps
    val assets = MultimodalOps.encodedWavAssets(spark, n = 3, nSamples = 32)
    // the content column is a genuine RIFF/WAVE container, not raw PCM
    val bytes = assets.orderBy(col("asset_id")).head().getAs[Array[Byte]]("content")
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF" &&
      new String(bytes.slice(8, 12), "US-ASCII") == "WAVE",
      "content must carry a RIFF/WAVE header")
    val decoded = MultimodalOps.decodeWav(assets).collect()
    assert(decoded.length == 3)
    decoded.foreach { w =>
      assert(w.sample_rate == 16000 && w.n_samples == 32)
      w.samples.zipWithIndex.foreach { case (v, s) =>
        val expect = ((w.id * 31 + s * 7) % 65536 - 32768).toInt
        assert(v == expect, s"asset ${w.id} sample $s: $v != $expect")
      }
    }
  }

  test("Tables.events normalizes both ts vintages to session TIMESTAMP") {
    import spark.implicits._
    // the generator has shipped events.ts as ns-longs AND as µs
    // TIMESTAMP_NTZ across rounds; the loader must canonicalize BOTH to
    // the same session-local TIMESTAMP (Tables.scala) — and must not
    // depend on which vintage some other suite loaded first
    val base = Files.createTempDirectory("graft-events-vintage").toString
    val epoch = 1718236800L // 2024-06-13T00:00:00Z
    spark.range(1)
      .select(lit(7L).as("user_id"), lit(epoch * 1000000000L).as("ts"))
      .write.mode("overwrite").parquet(s"$base/ns/events.parquet")
    spark.range(1)
      .select(lit(7L).as("user_id"),
        expr("TIMESTAMP_NTZ '2024-06-13 00:00:00'").as("ts"))
      .write.mode("overwrite").parquet(s"$base/ntz/events.parquet")
    Seq(s"$base/ns", s"$base/ntz").foreach { dir =>
      val df = tables.Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType, s"vintage $dir")
      assert(df.select(unix_timestamp(col("ts"))).head.getLong(0) == epoch,
        s"vintage $dir")
    }
  }

  test("Bloom.semiJoin equals the plain semi-join") {
    import graft.sources.Bloom
    val orders = tables.Tables.orders(spark, sf)
    val build = tables.Tables.customer(spark, sf)
      .where(col("c_acctbal") > 5000).select(col("c_custkey"))
    val fast = Bloom.semiJoin(orders, "o_custkey", build, "c_custkey")
    val plain = orders.join(
      build.withColumnRenamed("c_custkey", "o_custkey").distinct(),
      Seq("o_custkey"), "left_semi")
    assert(fast.count() == plain.count())
    assert(fast.exceptAll(plain).isEmpty && plain.exceptAll(fast).isEmpty)
  }
}
