package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Dataset
import graft.images.{ImageOps, MultimodalOps}
import graft.images.ImageOps.Img

/** Image operator family (ref: nodes.images) against hand-computed
  * expectations on deterministic synthetic images. */
class ImagesSpec extends GraftSuite {

  import spark.implicits._

  private def imgs = ImageOps.syntheticImages(spark, n = 4, x = 6, y = 4, c = 3)

  private def pix(id: Long, i: Int): Double = ((id * 31 + i * 7) % 256) / 255.0

  test("syntheticImages are deterministic and correctly sized") {
    val r = imgs.collect()
    assert(r.length == 4)
    r.foreach { row =>
      val arr = dArr(row, "image")
      assert(arr.size == 6 * 4 * 3)
      val id = row.getAs[Long]("id")
      assert(arr(5) == pix(id, 5))
    }
  }

  test("grayScale averages channels per pixel and sets n_channels=1") {
    val g = ImageOps.grayScale(imgs).collect()
    g.foreach { row =>
      val id = row.getAs[Long]("id")
      val arr = dArr(row, "image")
      assert(row.getAs[Int]("n_channels") == 1)
      assert(arr.size == 6 * 4)
      val expected0 = (pix(id, 0) + pix(id, 1) + pix(id, 2)) / 3.0
      assert(math.abs(arr.head - expected0) < 1e-12)
    }
  }

  test("crop extracts the right sub-rectangle") {
    val c = ImageOps.crop(imgs, x0 = 1, y0 = 1, w = 3, h = 2).collect()
    c.foreach { row =>
      val id = row.getAs[Long]("id")
      val arr = dArr(row, "image")
      assert(arr.size == 3 * 2 * 3)
      // out(0,0,c) = in(1,1,c); in-index = (1*6+1)*3 + c = 21 + c
      (0 until 3).foreach { ch =>
        assert(arr(ch) == pix(id, 21 + ch))
      }
    }
  }

  test("symmetricRectify doubles channels and splits signs") {
    val centered = imgs.withColumn("image",
      transform(col("image"), x => x - 0.5))
    val r = ImageOps.symmetricRectify(centered, alpha = 0.1).collect()
    r.foreach { row =>
      val arr = dArr(row, "image")
      assert(row.getAs[Int]("n_channels") == 6)
      assert(arr.size == 6 * 4 * 6)
      assert(arr.forall(_ >= 0.0), "rectified outputs are non-negative")
    }
    // positive and negative halves cannot both be nonzero for alpha >= 0
    val both = r.flatMap { row =>
      val arr = dArr(row, "image")
      arr.grouped(6).flatMap { g =>
        (0 until 3).map(c => g(c) > 0 && g(c + 3) > 0)
      }
    }
    assert(!both.contains(true))
  }

  test("max-pool 2x2 halves dims and dominates its window") {
    val p = ImageOps.pool(imgs, stride = 2, op = "max").collect()
    p.foreach { row =>
      val id = row.getAs[Long]("id")
      assert(row.getAs[Int]("x_dim") == 3 && row.getAs[Int]("y_dim") == 2)
      val arr = dArr(row, "image")
      assert(arr.size == 3 * 2 * 3)
      // out(0,0,0) = max of in{(0,0),(1,0),(0,1),(1,1)} channel 0
      val expected = Seq(0, 3, 18, 21).map(i => pix(id, i)).max
      assert(arr.head == expected)
    }
  }

  test("sum-pool matches hand-computed window sum") {
    val p = ImageOps.pool(imgs, stride = 2, op = "sum").collect()
    p.foreach { row =>
      val id = row.getAs[Long]("id")
      val arr = dArr(row, "image")
      val expected = Seq(0, 3, 18, 21).map(i => pix(id, i)).sum
      assert(math.abs(arr.head - expected) < 1e-12)
    }
  }

  test("centerCornerPatches emits 5 patches per image with correct content") {
    val p = ImageOps.centerCornerPatches(imgs, w = 2, h = 2)
    assert(p.count() == 4 * 5)
    val tl = p.where(col("id") === 1 && col("patch_id") === 0).head()
    val arr = dArr(tl, "image")
    assert(arr.size == 2 * 2 * 3)
    assert(arr.head == pix(1, 0))
    val center = p.where(col("id") === 1 && col("patch_id") === 4).head()
    // center patch origin: ((6-2)/2, (4-2)/2) = (2,1); idx = (1*6+2)*3 = 24
    assert(dArr(center, "image").head == pix(1, 24))
  }

  test("convolve (im2col + BLAS gemm) equals the naive reference") {
    val ds = imgs.select(col("id"), col("x_dim"), col("y_dim"),
      col("n_channels"), col("image")).as[Img]
    val f1 = Array.tabulate(2 * 2 * 3)(i => (i % 5) * 0.1 - 0.2)
    val f2 = Array.tabulate(2 * 2 * 3)(i => math.sin(i.toDouble))
    val out = ImageOps.convolve(ds, Array(f1, f2), fx = 2, fy = 2)
      .collect().map(im => im.id -> im).toMap
    assert(out(0L).x_dim == 5 && out(0L).y_dim == 3 && out(0L).n_channels == 2)
    val local = ds.collect().map(im => im.id -> im).toMap
    local.foreach { case (id, im) =>
      val n1 = ImageOps.convolveNaive(im, f1, 2, 2)
      val n2 = ImageOps.convolveNaive(im, f2, 2, 2)
      val got = out(id)
      n1.indices.foreach { p =>
        assert(math.abs(got.image(p * 2) - n1(p)) < 1e-10,
          s"img $id patch $p filter 0")
        assert(math.abs(got.image(p * 2 + 1) - n2(p)) < 1e-10,
          s"img $id patch $p filter 1")
      }
    }
  }

  test("keystone CIFAR shape: patches -> rectify -> pool -> vectorize composes") {
    val feats = ImageOps.vectorize(
      ImageOps.pool(
        ImageOps.symmetricRectify(
          ImageOps.grayScale(ImageOps.crop(imgs, 0, 0, 4, 4))), 2))
    val r = feats.collect()
    assert(r.length == 4)
    r.foreach { row =>
      // 4x4 gray (1ch) -> rectify (2ch) -> pool/2 (2x2) => 2*2*2 = 8 features
      assert(dArr(row, "features").size == 8)
    }
  }

  test("hog descriptor: cell grid, per-cell normalization, edge response") {
    // vertical step edge at x=8: gradient energy concentrates in the
    // horizontal-gradient orientation bin (theta ~ 0 / pi)
    val edge = spark.range(2).toDF("id")
      .withColumn("x_dim", lit(16)).withColumn("y_dim", lit(16))
      .withColumn("n_channels", lit(1))
      .withColumn("image", transform(sequence(lit(0), lit(16 * 16 - 1)),
        i => when(i % 16 < 8, 0.0).otherwise(1.0)))
    val ds = edge.select(col("id"), col("x_dim"), col("y_dim"),
      col("n_channels"), col("image")).as[Img]
    val out = ImageOps.hog(ds, cell = 4, bins = 9).collect()
    out.foreach { im =>
      assert(im.x_dim == 4 && im.y_dim == 4 && im.n_channels == 9)
      assert(im.image.length == 4 * 4 * 9)
      // cells covering the edge (cell column 1 and 2 border x=8): their
      // dominant bin must be bin 0 (horizontal gradient, unsigned)
      val edgeCell = im.image.slice((0 * 4 + 1) * 9, (0 * 4 + 1) * 9 + 9)
      assert(edgeCell(0) >= edgeCell.max - 1e-12,
        s"edge energy must land in bin 0: ${edgeCell.toSeq}")
      // all norms <= 1 + eps (per-cell L2 normalization)
      im.image.grouped(9).foreach { cellHist =>
        val n = math.sqrt(cellHist.map(v => v * v).sum)
        assert(n <= 1.0 + 1e-9)
      }
    }
    // flat image => zero descriptor
    val flat = edge.withColumn("image",
      transform(sequence(lit(0), lit(16 * 16 - 1)), _ => lit(0.5)))
      .select(col("id"), col("x_dim"), col("y_dim"), col("n_channels"),
        col("image")).as[Img]
    val zeros = ImageOps.hog(flat, cell = 4, bins = 9).collect()
    assert(zeros.forall(_.image.forall(_ == 0.0)))
  }

  test("sift descriptor: signed orientation, dense grid, two-stage norm") {
    // vertical step edge 0->1 at x=8: gx>0, gy=0 => theta=0 => bin 0
    // (+x direction; boundaries are half-bin-offset so 0 is a CENTER)
    def edgeImgs(rising: Boolean): Dataset[Img] = spark.range(2).toDF("id")
      .withColumn("x_dim", lit(16)).withColumn("y_dim", lit(16))
      .withColumn("n_channels", lit(1))
      .withColumn("image", transform(sequence(lit(0), lit(16 * 16 - 1)),
        i => {
          val left = if (rising) lit(0.0) else lit(1.0)
          val right = if (rising) lit(1.0) else lit(0.0)
          when(i % 16 < 8, left).otherwise(right)
        }))
      .select(col("id"), col("x_dim"), col("y_dim"), col("n_channels"),
        col("image")).as[Img]
    val up = ImageOps.sift(edgeImgs(rising = true)).collect()
    val down = ImageOps.sift(edgeImgs(rising = false)).collect()
    def binEnergy(im: Img, bin: Int): Double =
      im.image.grouped(8).map(_(bin)).sum
    up.foreach { im =>
      assert(im.x_dim == 1 && im.y_dim == 16 && im.n_channels == 8)
      assert(im.image.length == 128)
      // SIFT's signed orientation: the rising edge votes +x (bin 0) ...
      assert(binEnergy(im, 0) > 0 && binEnergy(im, 4) == 0.0)
      // two-stage normalization leaves a unit-L2 descriptor
      val n = math.sqrt(im.image.map(v => v * v).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
    // ... and the falling edge votes -x (bin 4) — the contrast with
    // HOG's unsigned bins, where both edges are indistinguishable
    down.foreach { im =>
      assert(binEnergy(im, 4) > 0 && binEnergy(im, 0) == 0.0)
    }
    // dense keypoint grid: 32x16 at patch=16, step=16 => 2 descriptors
    // (the canonical synthetic fixture — same pixel formula the
    // q_image_sift oracle hard-codes)
    val wide = ImageOps.syntheticImages(spark, n = 3, x = 32, y = 16, c = 1)
      .as[Img]
    val dense = ImageOps.sift(wide).collect()
    dense.foreach { im =>
      assert(im.x_dim == 2, "32x16 at patch=16 step=16 must yield 2 keypoints")
      assert(im.image.length == 2 * 128)
      im.image.grouped(128).foreach { d =>
        val n = math.sqrt(d.map(v => v * v).sum)
        assert(math.abs(n - 1.0) < 1e-9)
        assert(d.forall(_ >= 0.0))
      }
    }
    // flat image => zero descriptor (no gradient, norm guards hold)
    val flat = edgeImgs(rising = true).toDF()
      .withColumn("image",
        transform(sequence(lit(0), lit(16 * 16 - 1)), _ => lit(0.5)))
      .select(col("id"), col("x_dim"), col("y_dim"), col("n_channels"),
        col("image")).as[Img]
    assert(ImageOps.sift(flat).collect().forall(_.image.forall(_ == 0.0)))
  }

  test("lcs descriptor: per-cell channel mean/std match direct computation") {
    val ds = imgs.select(col("id"), col("x_dim"), col("y_dim"),
      col("n_channels"), col("image")).as[Img]
    // use 2x2 cells on the 6x4 image => 3x2 grid, 3 channels, 2 stats
    val out = ImageOps.lcs(ds, cell = 2).collect().map(im => im.id -> im).toMap
    assert(out(1L).image.length == 3 * 2 * 3 * 2)
    // cell (0,0) channel 0: pixels at (0,0),(1,0),(0,1),(1,1) ch0 =
    // flat idx 0, 3, 18, 21
    val vals = Seq(0, 3, 18, 21).map(i => pix(1L, i))
    val mu = vals.sum / 4.0
    val sd = math.sqrt(vals.map(v => (v - mu) * (v - mu)).sum / 4.0)
    assert(math.abs(out(1L).image(0) - mu) < 1e-12)
    assert(math.abs(out(1L).image(1) - sd) < 1e-12)
    // constant image => std exactly 0 everywhere
    val const = imgs.withColumn("image",
      transform(col("image"), _ => lit(0.25)))
      .select(col("id"), col("x_dim"), col("y_dim"), col("n_channels"),
        col("image")).as[Img]
    val cOut = ImageOps.lcs(const, cell = 2).collect()
    cOut.foreach { im =>
      im.image.grouped(2).foreach { case Array(m, s) =>
        assert(m == 0.25 && s == 0.0)
      }
    }
  }

  test("multimodal decodeStub -> featurize plumbing produces stable features") {
    val assets = MultimodalOps.syntheticAssets(spark, n = 3, x = 4, y = 4,
      c = 3, frames = 1)
    val f1 = MultimodalOps.featurize(assets).collect()
    val f2 = MultimodalOps.featurize(assets).collect()
    assert(f1.length == 3)
    f1.foreach(r => assert(dArr(r, "features").size == 2 * 2))
    val a = f1.map(r => dArr(r, "features")).toSeq
    val b = f2.map(r => dArr(r, "features")).toSeq
    assert(a == b, "decode stub must be deterministic")
  }

  test("frameSample slices video bytes per frame") {
    val assets = MultimodalOps.syntheticAssets(spark, n = 2, x = 2, y = 2,
      c = 1, frames = 6)
    val frames = MultimodalOps.frameSample(assets, step = 2)
    assert(frames.count() == 2 * 3, "6 frames step 2 => frames 0,2,4")
    val sizes = frames.select(length(col("content"))).distinct().collect()
    assert(sizes.length == 1 && sizes.head.getInt(0) == 2 * 2 * 1)
    val ids = frames.where(col("asset_id") === 0)
      .select("frame_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(0L, 2L, 4L))
  }

  test("resizeAvgPool halves decoded image dims by averaging") {
    val assets = MultimodalOps.syntheticAssets(spark, n = 1, x = 4, y = 4,
      c = 1, frames = 1)
    val img = MultimodalOps.decodeStub(assets).toDF()
    val small = MultimodalOps.resizeAvgPool(img, 2).head()
    assert(small.getAs[Int]("x_dim") == 2 && small.getAs[Int]("y_dim") == 2)
    val orig = dArr(img.head(), "image")
    val expected = (orig(0) + orig(1) + orig(4) + orig(5)) / 4.0
    assert(math.abs(dArr(small, "image").head - expected) < 1e-12)
  }

  test("q_image_pool matches the hand-computed pixel formula") {
    val r = graft.ops.Images.qImagePool(spark, SparkTestBase.sf).collect()
    assert(r.length == 20 * 4 * 4 * 2)
    // spot-check every row of image 7 against the direct window formula
    def p(id: Long, x: Long, y: Long, c: Long): Double =
      ((id * 31 + ((y * 8 + x) * 2 + c) * 7) % 256) / 255.0
    r.filter(_.getAs[Long]("id") == 7L).foreach { row =>
      val (py, px, ch) = (row.getAs[Long]("py"), row.getAs[Long]("px"),
        row.getAs[Long]("ch"))
      val w = Seq(p(7, px * 2, py * 2, ch), p(7, px * 2 + 1, py * 2, ch),
        p(7, px * 2, py * 2 + 1, ch), p(7, px * 2 + 1, py * 2 + 1, ch))
      assert(math.abs(row.getAs[Double]("sum_val") - w.sum) < 1e-6)
      assert(math.abs(row.getAs[Double]("max_val") - w.max) < 1e-6)
    }
  }

  test("q_image_grayscale_rectify: both rectifier halves fire and match") {
    val r = graft.ops.Images
      .qImageGrayscaleRectify(spark, SparkTestBase.sf).collect()
    assert(r.length == 20 * 16 * 2)
    def g(id: Long, p: Long): Double =
      (0 to 2).map(c => ((id * 31 + (p * 3 + c) * 7) % 256) / 255.0).sum / 3.0 - 0.5
    r.filter(_.getAs[Long]("id") == 3L).foreach { row =>
      val (pix, ch) = (row.getAs[Long]("pixel"), row.getAs[Long]("ch"))
      val expected = if (ch == 0) math.max(g(3, pix) - 0.1, 0.0)
                     else math.max(-g(3, pix) - 0.1, 0.0)
      assert(math.abs(row.getAs[Double]("val") - expected) < 1e-6)
    }
    // the centering guarantees both halves produce nonzero output somewhere
    assert(r.exists(x => x.getAs[Long]("ch") == 0 && x.getAs[Double]("val") > 0))
    assert(r.exists(x => x.getAs[Long]("ch") == 1 && x.getAs[Double]("val") > 0))
  }

  test("q_image_crop_window composes crop offsets into window pixels") {
    val r = graft.ops.Images.qImageCropWindow(spark, SparkTestBase.sf).collect()
    assert(r.length == 20 * 2 * 4, "20 images x 2 windows x 4 pixels")
    r.filter(_.getAs[Long]("id") == 5L).foreach { row =>
      val (wx, pos) = (row.getAs[Long]("win_x"), row.getAs[Long]("pos"))
      val (px, py) = (pos % 2, pos / 2)
      // crop origin (1,1) + window origin (wx,0) + local (px,py), x_dim=6
      val idx = (py + 1) * 6 + (wx + px + 1)
      val expected = ((5 * 31 + idx * 7) % 256) / 255.0 / 255.0
      assert(math.abs(row.getAs[Double]("val") - expected) < 1e-6)
    }
  }

  test("q_image_convolve matches the direct window-filter sum") {
    val r = graft.ops.Images.qImageConvolve(spark, SparkTestBase.sf).collect()
    assert(r.length == 20 * 4 * 3 * 2, "20 images x 4x3 outputs x 2 filters")
    val filters = Seq(Seq(1.0, -1.0, 2.0, -2.0), Seq(3.0, 1.0, -1.0, 2.0))
    def p(id: Long, x: Long, y: Long): Double = ((id * 31 + (y * 5 + x) * 7) % 256) / 255.0
    r.filter(_.getAs[Long]("id") == 11L).foreach { row =>
      val (py, px, ch) = (row.getAs[Long]("py"), row.getAs[Long]("px"),
        row.getAs[Long]("ch"))
      val w = Seq(p(11, px, py), p(11, px + 1, py), p(11, px, py + 1),
        p(11, px + 1, py + 1))
      val expected = w.zip(filters(ch.toInt)).map { case (v, f) => v * f }.sum
      assert(math.abs(row.getAs[Double]("val") - expected) < 1e-6)
    }
  }

  test("q_multimodal_resize pools the decoded bytes to [0,1] pixels") {
    val r = rows(graft.ops.Images.qMultimodalResize(spark, sf))
    assert(r.size == 8 * 4 * 4)
    r.foreach { x =>
      val v = x.getAs[Double]("val")
      assert(v >= 0.0 && v <= 1.0)
    }
    // spot-check one output against the byte formula (asset 3, py 1, px 2)
    def px(id: Long, i: Long): Double = ((id * 131 + i * 17) % 256) / 255.0
    val expected = (px(3, 2 * 8 + 4) + px(3, 2 * 8 + 5) +
      px(3, 3 * 8 + 4) + px(3, 3 * 8 + 5)) / 4.0
    val got = r.find(x => x.getAs[Long]("id") == 3 &&
      x.getAs[Long]("py") == 1 && x.getAs[Long]("px") == 2).get.getAs[Double]("val")
    assert(math.abs(got - expected) < 1e-6)
  }

  test("flipHorizontal mirrors pixels; randomTransform is keyed-deterministic") {
    import spark.implicits._
    val imgs = ImageOps.syntheticImages(spark, n = 4, x = 3, y = 2, c = 1)
    def px(id: Long, i: Long): Double = ((id * 31 + i * 7) % 256) / 255.0
    val f = ImageOps.flipHorizontal(imgs).where($"id" === 1)
      .select($"image").head.getSeq[Double](0)
    // row-major 3x2: flipped (x, y) reads original (2-x, y)
    for (y <- 0 until 2; x <- 0 until 3)
      assert(math.abs(f(y * 3 + x) - px(1, y * 3 + (2 - x))) < 1e-12,
        s"flip mismatch at ($x, $y)")
    // transform twice -> identical (pure function of id), and brightness
    // factor bounded by the jitter band
    val a = ImageOps.randomTransform(imgs).select($"id", $"image").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = ImageOps.randomTransform(imgs).select($"id", $"image").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b, "keyed transform must be run-to-run identical")
    a.values.flatten.foreach(v => assert(v >= 0.0 && v <= 1.06))
  }

  test("daisy descriptor: ring geometry, per-point unit norm, hand-checked center") {
    import spark.implicits._
    val imgs = ImageOps.syntheticImages(spark, n = 3, x = 16, y = 16, c = 1)
      .as[ImageOps.Img]
    val d = ImageOps.daisy(imgs, radii = Array(2, 4)).collect()
    assert(d.length == 3)
    d.foreach { img =>
      assert(img.x_dim == 9 && img.n_channels == 4 && img.image.length == 36)
      assert(img.image.forall(_ >= 0.0))
      (0 until 9).foreach { p =>
        val ss = (0 until 4).map(o => math.pow(img.image(p * 4 + o), 2)).sum
        assert(ss == 0.0 || math.abs(math.sqrt(ss) - 1.0) < 1e-9,
          s"point $p histogram not unit-norm: $ss")
      }
    }
    // independent naive recompute of image 1's center-point histogram
    def pix(id: Long, x: Int, y: Int): Long = (id * 31 + (y * 16 + x) * 7) % 256
    def cl(v: Int): Int = math.min(math.max(v, 0), 15)
    def ori(id: Long, o: Int, x: Int, y: Int): Long = {
      val gx = pix(id, cl(x + 1), y) - pix(id, cl(x - 1), y)
      val gy = pix(id, x, cl(y + 1)) - pix(id, x, cl(y - 1))
      o match {
        case 0 => math.max(gx, 0L)
        case 1 => math.max(gy, 0L)
        case 2 => math.max(-gx, 0L)
        case _ => math.max(-gy, 0L)
      }
    }
    val wts = Map(-1 -> 1L, 0 -> 2L, 1 -> 1L)
    def s1(id: Long, o: Int, x: Int, y: Int): Long =
      (for (dy <- -1 to 1; dx <- -1 to 1)
        yield wts(dy) * wts(dx) * ori(id, o, cl(x + dx), cl(y + dy))).sum
    val v = (0 until 4).map(o => s1(1, o, 8, 8))
    val nrm = math.sqrt(v.map(x => x.toDouble * x).sum) + 1e-12
    val got = d.find(_.id == 1).get.image
    (0 until 4).foreach(o =>
      assert(math.abs(got(o) - v(o) / nrm) < 1e-9,
        s"center orient $o: ${got(o)} vs ${v(o) / nrm}"))
  }

  test("q_multimodal_frames slices every 2nd frame with per-frame stats") {
    val r = rows(graft.ops.Images.qMultimodalFrames(spark, sf))
    assert(r.size == 8 * 3)
    r.foreach { x =>
      assert(Seq(0L, 2L, 4L).contains(x.getAs[Long]("frame_id")))
      assert(x.getAs[Double]("mean_px") <= x.getAs[Double]("max_px"))
    }
    // spot-check a sampled frame's stats against the byte formula — proves
    // the binary slice really advanced to frame 2's offset
    def px(id: Long, off: Long): Double = ((id * 131 + off * 17) % 256) / 255.0
    val vals = (0 until 16).map(i => px(5, 2 * 16 + i))
    val got = r.find(x => x.getAs[Long]("asset_id") == 5 &&
      x.getAs[Long]("frame_id") == 2).get
    assert(math.abs(got.getAs[Double]("mean_px") - vals.sum / 16.0) < 1e-6)
    assert(math.abs(got.getAs[Double]("max_px") - vals.max) < 1e-6)
  }
}
