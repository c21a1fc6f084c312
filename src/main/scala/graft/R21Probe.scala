package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21 stage-level breakdown for q_winsorize / q_spearman
  * (measurement instrument; same session config as Bench). */
object R21Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000).selectExpr("sum(id)").count()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r21] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    for (rnd <- 1 to 3) {
      println(s"[r21] --- round $rnd (winsorize)")
      val vc0 = graft.tables.Tables.lineitem(spark, sfDir)
        .select($"l_returnflag".as("flag"),
          round($"l_extendedprice" * 100).as("price_c"))
        .groupBy($"flag", $"price_c").agg(count(lit(1)).as("__c"))
      val ck = t("vc checkpoint(true)")(vc0.localCheckpoint(true))
      t("vc count")(ck.count())
      val flat = t("collect as[(S,D,L)]")(ck.as[(String, Double, Long)].collect())
      println(s"[r21] vc rows: ${flat.length}")
      t("driver groupBy+sort")({
        flat.groupBy(_._1).toSeq.map { case (f, xs) =>
          (f, xs.map(x => (x._2, x._3)).sortBy(_._1).length)
        }
      })
      // variant: rdd primitive collect
      val arr = t("collect rdd primitive")(
        ck.rdd.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).collect())
      println(s"[r21] rdd rows: ${arr.length}")
      // variant: per-flag sorted arrays via one agg
      val agg = t("collect sorted agg arrays")(
        ck.groupBy($"flag")
          .agg(sort_array(collect_list(struct($"price_c", $"__c"))).as("a"))
          .as[(String, Array[(Double, Long)])].collect())
      println(s"[r21] agg flags: ${agg.map(_._2.length).mkString(",")}")
      // variant: Spark-side sorted collect + linear run slicing
      val sortedFlat = t("sorted collect")(
        ck.orderBy($"flag", $"price_c").as[(String, Double, Long)].collect())
      t("slice runs")({
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[(Double, Long)])]
        var i = 0
        while (i < sortedFlat.length) {
          val flag = sortedFlat(i)._1
          val b = scala.collection.mutable.ArrayBuilder.make[(Double, Long)]
          while (i < sortedFlat.length && sortedFlat(i)._1 == flag) {
            b += ((sortedFlat(i)._2, sortedFlat(i)._3)); i += 1
          }
          out += ((flag, b.result()))
        }
        out.map(_._2.length).sum
      })
      // variant: driver bucket + in-place sort
      t("bucket+sortInPlace")({
        val m = scala.collection.mutable.LinkedHashMap
          .empty[String, scala.collection.mutable.ArrayBuffer[(Double, Long)]]
        flat.foreach { x =>
          m.getOrElseUpdate(x._1,
            new scala.collection.mutable.ArrayBuffer[(Double, Long)](262144)) +=
            ((x._2, x._3))
        }
        m.values.map { b =>
          val a = b.toArray
          java.util.Arrays.sort(a, Ordering.by[(Double, Long), Double](_._1))
          a.length
        }.sum
      })
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // noop-forced full-compute A/B: the NEW window spelling (production
    // qSpearman) vs an inline replica of the OLD checkpoint+rank-grid
    // spelling — count() prunes the new plan's window/moment columns, so
    // the honest operator-level comparison must force every column
    for (rnd <- 1 to 3) {
      println(s"[r21] --- round $rnd (spearman noop A/B)")
      t("NEW qSpearman noop")(
        graft.ops.Stats.qSpearman(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      t("OLD spelling noop")({
        import org.apache.spark.sql.expressions.Window
        val rowsDf = graft.tables.Tables.lineitem(spark, sfDir)
          .select($"l_returnflag".as("flag"),
            $"l_quantity".cast("long").as("x"),
            expr("CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(12,2))) AS BIGINT)")
              .as("y"))
        val vc = rowsDf.groupBy($"flag", $"x", $"y").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
        def rank2(col0: String) = {
          val c = col(col0)
          val wb = Window.partitionBy($"flag").orderBy(c)
            .rowsBetween(Window.unboundedPreceding, -1)
          vc.groupBy($"flag", c).agg(sum($"cnt").as("cnt"))
            .withColumn("ar2",
              lit(2L) * coalesce(sum($"cnt").over(wb), lit(0L)) + $"cnt" + 1L)
            .select($"flag", c, $"ar2")
        }
        val rx = rank2("x").withColumnRenamed("ar2", "ax")
        val ry = rank2("y").withColumnRenamed("ar2", "ay")
        vc.join(broadcast(rx), Seq("flag", "x"))
          .join(broadcast(ry), Seq("flag", "y"))
          .groupBy($"flag")
          .agg(sum($"cnt").as("n"),
            sum($"cnt".cast("decimal(38,0)") * $"ax").as("sx"),
            sum($"cnt".cast("decimal(38,0)") * $"ay").as("sy"),
            sum($"cnt".cast("decimal(38,0)") * $"ax" * $"ax").as("sxx"),
            sum($"cnt".cast("decimal(38,0)") * $"ay" * $"ay").as("syy"),
            sum($"cnt".cast("decimal(38,0)") * $"ax" * $"ay").as("sxy"))
          .select($"flag".as("l_returnflag"), $"n",
            (round(($"n".cast("double") * $"sxy".cast("double")
              - $"sx".cast("double") * $"sy".cast("double"))
              / (sqrt($"n".cast("double") * $"sxx".cast("double")
                - $"sx".cast("double") * $"sx".cast("double"))
                * sqrt($"n".cast("double") * $"syy".cast("double")
                  - $"sy".cast("double") * $"sy".cast("double"))), 6) + 0.0)
              .as("rho"))
          .orderBy($"l_returnflag")
          .write.format("noop").mode("overwrite").save()
      })
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    for (rnd <- 1 to 2) {
      println(s"[r21] --- round $rnd (spearman)")
      val rowsDf = graft.tables.Tables.lineitem(spark, sfDir)
        .select($"l_returnflag".as("flag"),
          $"l_quantity".cast("long").as("x"),
          expr("CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(12,2))) AS BIGINT)")
            .as("y"))
      val vc = t("vc build+checkpoint")(
        rowsDf.groupBy($"flag", $"x", $"y").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true))
      println(s"[r21] vc cells: ${vc.count()}")
      import org.apache.spark.sql.expressions.Window
      def rank2(col0: String) = {
        val c = col(col0)
        val wb = Window.partitionBy($"flag").orderBy(c)
          .rowsBetween(Window.unboundedPreceding, -1)
        vc.groupBy($"flag", c).agg(sum($"cnt").as("cnt"))
          .withColumn("ar2",
            lit(2L) * coalesce(sum($"cnt").over(wb), lit(0L)) + $"cnt" + 1L)
          .select($"flag", c, $"ar2")
      }
      val rx = rank2("x").withColumnRenamed("ar2", "ax")
      val ry = rank2("y").withColumnRenamed("ar2", "ay")
      t("rank grids count")(rx.count() + ry.count())
      t("joinback+agg")(
        vc.join(broadcast(rx), Seq("flag", "x"))
          .join(broadcast(ry), Seq("flag", "y"))
          .groupBy($"flag")
          .agg(sum($"cnt").as("n"),
            sum($"cnt".cast("decimal(38,0)") * $"ax").as("sx"),
            sum($"cnt".cast("decimal(38,0)") * $"ay").as("sy"),
            sum($"cnt".cast("decimal(38,0)") * $"ax" * $"ax").as("sxx"),
            sum($"cnt".cast("decimal(38,0)") * $"ay" * $"ay").as("syy"),
            sum($"cnt".cast("decimal(38,0)") * $"ax" * $"ay").as("sxy"))
          .count())
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
