package graft.images

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Image operator family (ref: nodes.images — GrayScaler, PixelScaler,
  * ImageVectorizer, Cropper, SymmetricRectifier, Pooler, Convolver,
  * CenterCornerPatcher; SURVEY §2.A images table).
  *
  * Representation: an image is four columns —
  * `(x_dim int, y_dim int, n_channels int, image array<double>)` with
  * row-major, channel-interleaved addressing
  * `idx(x, y, c) = (y * x_dim + x) * n_channels + c` (0-based). This is the
  * columnar re-expression of the reference's ChannelMajor/ColumnMajor
  * vectorized image classes: a flat numeric buffer + metadata, no opaque
  * object, so every per-pixel op is a Catalyst array expression and the
  * only `mapPartitions` escape is the BLAS convolution (the reference's
  * im2col + gemm trick, which is per-partition dense math by design).
  *
  * No image CODEC lives here (container has no image libs — the decode
  * stub in [[MultimodalOps]] fakes it deterministically); everything below
  * operates on decoded pixel buffers, which is exactly the reference's
  * contract too (its loaders decode before the pipeline runs).
  */
object ImageOps {

  /** Typed row for the mapPartitions (BLAS) path. */
  case class Img(id: Long, x_dim: Int, y_dim: Int, n_channels: Int,
      image: Array[Double])

  /** Deterministic synthetic images (test/demo source): pixel(i) of image
    * `id` = ((id * 31 + i * 7) mod 256) / 255.0. */
  def syntheticImages(spark: SparkSession, n: Int, x: Int, y: Int,
      c: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).toDF("id")
      .withColumn("x_dim", lit(x))
      .withColumn("y_dim", lit(y))
      .withColumn("n_channels", lit(c))
      .withColumn("image",
        transform(sequence(lit(0), lit(x * y * c - 1)),
          i => ((col("id") * 31 + i * 7) % 256).cast("double") / 255.0))
  }

  /** ref: GrayScaler — per-pixel channel mean; n_channels becomes 1. */
  def grayScale(df: DataFrame): DataFrame =
    df.withColumn("image",
        transform(sequence(lit(0), col("x_dim") * col("y_dim") - 1), p =>
          aggregate(sequence(lit(0), col("n_channels") - 1), lit(0.0),
            (acc, c) => acc + element_at(col("image"),
              p * col("n_channels") + c + 1)) / col("n_channels")))
      .withColumn("n_channels", lit(1))

  /** ref: PixelScaler — x/255 rescale. */
  def pixelScale(df: DataFrame): DataFrame =
    df.withColumn("image", transform(col("image"), x => x / 255.0))

  /** ref: ImageVectorizer — image to flat feature vector (drop metadata). */
  def vectorize(df: DataFrame, out: String = "features"): DataFrame =
    df.withColumn(out, col("image"))
      .drop("image", "x_dim", "y_dim", "n_channels")

  /** ref: Cropper — sub-rectangle [x0, x0+w) × [y0, y0+h), all channels. */
  def crop(df: DataFrame, x0: Int, y0: Int, w: Int, h: Int): DataFrame =
    df.withColumn("image",
        flatten(transform(sequence(lit(y0), lit(y0 + h - 1)), yy =>
          slice(col("image"),
            (yy * col("x_dim") + x0) * col("n_channels") + 1,
            lit(w) * col("n_channels")))))
      .withColumn("x_dim", lit(w))
      .withColumn("y_dim", lit(h))

  /** ref: SymmetricRectifier — [max(0, x−α) ; max(0, −x−α)]: doubles the
    * channel count (positive half then negative half, per pixel). */
  def symmetricRectify(df: DataFrame, alpha: Double = 0.0): DataFrame =
    df.withColumn("image",
        flatten(transform(sequence(lit(0), col("x_dim") * col("y_dim") - 1), p =>
          concat(
            transform(sequence(lit(0), col("n_channels") - 1), c =>
              greatest(element_at(col("image"), p * col("n_channels") + c + 1)
                - alpha, lit(0.0))),
            transform(sequence(lit(0), col("n_channels") - 1), c =>
              greatest(-element_at(col("image"), p * col("n_channels") + c + 1)
                - alpha, lit(0.0)))))))
      .withColumn("n_channels", col("n_channels") * 2)

  /** ref: Pooler — non-overlapping `stride`×`stride` spatial pooling with
    * max or sum, per channel. Output dims = floor(dim / stride). */
  def pool(df: DataFrame, stride: Int, op: String = "max"): DataFrame = {
    require(op == "max" || op == "sum")
    val xo = floor(col("x_dim") / stride).cast("int")
    val yo = floor(col("y_dim") / stride).cast("int")
    val pooled =
      flatten(transform(sequence(lit(0), yo - 1), py =>
        flatten(transform(sequence(lit(0), xo - 1), px =>
          transform(sequence(lit(0), col("n_channels") - 1), c => {
            val window = flatten(transform(sequence(lit(0), lit(stride - 1)), dy =>
              transform(sequence(lit(0), lit(stride - 1)), dx =>
                element_at(col("image"),
                  ((py * stride + dy) * col("x_dim") + px * stride + dx)
                    * col("n_channels") + c + 1))))
            if (op == "max") array_max(window)
            else aggregate(window, lit(0.0), (a, x) => a + x)
          })))))
    df.withColumn("image", pooled)
      .withColumn("x_dim", xo)
      .withColumn("y_dim", yo)
  }

  /** ref: CenterCornerPatcher — deterministic 5-patch extraction (four
    * corners + center), exploded to one row per patch with `patch_id`. */
  def centerCornerPatches(df: DataFrame, w: Int, h: Int): DataFrame = {
    val positions = Seq(
      (lit(0), lit(0)),                                          // top-left
      (col("x_dim") - w, lit(0)),                                // top-right
      (lit(0), col("y_dim") - h),                                // bottom-left
      (col("x_dim") - w, col("y_dim") - h),                      // bottom-right
      (((col("x_dim") - w) / 2).cast("int"),
        ((col("y_dim") - h) / 2).cast("int")))                   // center
    val patches = array(positions.zipWithIndex.map { case ((px, py), i) =>
      struct(lit(i).as("patch_id"),
        flatten(transform(sequence(py, py + h - 1), yy =>
          slice(col("image"),
            (yy * col("x_dim") + px) * col("n_channels") + 1,
            lit(w) * col("n_channels")))).as("image"))
    }: _*)
    df.withColumn("p", explode(patches))
      .withColumn("patch_id", col("p.patch_id"))
      .withColumn("image", col("p.image"))
      .withColumn("x_dim", lit(w))
      .withColumn("y_dim", lit(h))
      .drop("p")
  }

  /** ref: Windower/FastWindower — ALL strided sliding patches of size
    * w×h, exploded to one row per patch with (win_x, win_y) origin. Patch
    * count per image is ((x−w)/stride+1)·((y−h)/stride+1). */
  def windower(df: DataFrame, w: Int, h: Int, stride: Int): DataFrame = {
    val nx = ((col("x_dim") - w) / stride).cast("int") + 1
    val ny = ((col("y_dim") - h) / stride).cast("int") + 1
    df.withColumn("win", explode(flatten(
        transform(sequence(lit(0), ny - 1), wy =>
          transform(sequence(lit(0), nx - 1), wx =>
            struct((wx * stride).as("x"), (wy * stride).as("y"),
              flatten(transform(sequence(wy * stride, wy * stride + h - 1), yy =>
                slice(col("image"),
                  (yy * col("x_dim") + wx * stride) * col("n_channels") + 1,
                  lit(w) * col("n_channels")))).as("image")))))))
      .withColumn("win_x", col("win.x"))
      .withColumn("win_y", col("win.y"))
      .withColumn("image", col("win.image"))
      .withColumn("x_dim", lit(w))
      .withColumn("y_dim", lit(h))
      .drop("win")
  }

  /** ref: RandomPatcher — n patches at pseudo-random origins, deterministic
    * from (image id, patch index) via integer hashing so runs and engines
    * agree (the reference seeds an RNG; a keyed hash is the
    * partitioning-stable equivalent). */
  def randomPatches(df: DataFrame, n: Int, w: Int, h: Int): DataFrame = {
    val px = (abs(hash(col("id"), col("patch_id"), lit(17))) % (col("x_dim") - w + 1))
    val py = (abs(hash(col("id"), col("patch_id"), lit(31))) % (col("y_dim") - h + 1))
    df.withColumn("patch_id", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("image",
        flatten(transform(sequence(py, py + h - 1), yy =>
          slice(col("image"),
            (yy * col("x_dim") + px) * col("n_channels") + 1,
            lit(w) * col("n_channels")))))
      .withColumn("x_dim", lit(w))
      .withColumn("y_dim", lit(h))
  }

  /** The horizontally-mirrored image as a column expression: pixel
    * (x, y, c) reads from (x_dim−1−x, y, c). */
  private def flippedImageCol: Column =
    flatten(transform(sequence(lit(0), col("y_dim") - 1), yy =>
      flatten(transform(sequence(lit(0), col("x_dim") - 1), xx =>
        transform(sequence(lit(0), col("n_channels") - 1), c =>
          element_at(col("image"),
            (yy * col("x_dim") + (col("x_dim") - 1 - xx)) * col("n_channels")
              + c + 1))))))

  /** Horizontal mirror of every image — pure Catalyst array re-indexing
    * like [[crop]]. */
  def flipHorizontal(df: DataFrame): DataFrame =
    df.withColumn("image", flippedImageCol)

  /** ref: RandomImageTransformer — random flip + brightness perturbation,
    * in the deterministic keyed form every "random" op in this engine
    * uses (the reference seeds an RNG; a pure function of the image id is
    * the partitioning-stable, engine-portable equivalent — here the same
    * md5-digest family as the stratified split, NOT murmur, so a DuckDB
    * oracle can replay it): images with an even digest flip horizontally,
    * and every image's brightness scales by 1 + (digest mod
    * `jitterSteps` − jitterSteps/2)/100. */
  def randomTransform(df: DataFrame, jitterSteps: Int = 11): DataFrame = {
    // digest60 rides the graft_md5_split kernel — self-register so the
    // node works on sessions built without GraftExtensions
    graft.functions.GraftExtensions.ensureRegistered(df.sparkSession)
    val digest = graft.ops.Similarity.digest60(col("id").cast("string"))
    val factor = lit(1.0) +
      (digest % jitterSteps - lit(jitterSteps / 2)).cast("double") / 100.0
    df.withColumn("image",
        when(digest % 2 === 0, flippedImageCol).otherwise(col("image")))
      .withColumn("image", transform(col("image"), x => x * factor))
  }

  /** ref: Convolver — valid 2-D convolution of a filter bank, computed the
    * reference's way: per-image im2col then ONE level-3 BLAS gemm per image
    * (Breeze DenseMatrix multiply), run inside mapPartitions so the JVM
    * work is batched per partition and nothing touches the driver. Output:
    * x' = x−fx+1, y' = y−fy+1, channels = filters.length.
    *
    * @param filters each filter is fx*fy*n_channels doubles in the same
    *                row-major interleaved layout as the image. */
  def convolve(ds: Dataset[Img], filters: Array[Array[Double]], fx: Int,
      fy: Int): Dataset[Img] = {
    import ds.sparkSession.implicits._
    val bc = ds.sparkSession.sparkContext.broadcast(filters)
    ds.mapPartitions { it =>
      val fs = bc.value
      val k = fs.length
      val patchLen = fs.head.length
      // filter matrix: patchLen × k, column per filter
      val fMat = new DenseMatrix(patchLen, k,
        Array.concat(fs: _*))
      it.map { img =>
        val xo = img.x_dim - fx + 1
        val yo = img.y_dim - fy + 1
        val nc = img.n_channels
        require(patchLen == fx * fy * nc,
          s"filter length $patchLen != $fx*$fy*$nc")
        val nPatches = xo * yo
        val im2col = new DenseMatrix[Double](nPatches, patchLen)
        var p = 0
        var py = 0
        while (py < yo) {
          var px = 0
          while (px < xo) {
            var q = 0
            var dy = 0
            while (dy < fy) {
              val rowBase = ((py + dy) * img.x_dim + px) * nc
              var dxc = 0
              while (dxc < fx * nc) {
                im2col(p, q) = img.image(rowBase + dxc)
                q += 1; dxc += 1
              }
              dy += 1
            }
            p += 1; px += 1
          }
          py += 1
        }
        val out = im2col * fMat // nPatches × k gemm
        // interleave channels back into row-major layout
        val buf = new Array[Double](nPatches * k)
        var i = 0
        while (i < nPatches) {
          var c = 0
          while (c < k) { buf(i * k + c) = out(i, c); c += 1 }
          i += 1
        }
        Img(img.id, xo, yo, k, buf)
      }
    }
  }

  /** ref: HogExtractor — histogram-of-oriented-gradients descriptor, pure
    * JVM arithmetic per image (the reference's native JNI was for SIFT;
    * HOG is plain math): central-difference gradients on the grayscale
    * buffer, magnitude-weighted votes into `bins` unsigned-orientation
    * bins per `cell`×`cell` cell, L2-normalized per cell, concatenated
    * row-major. Runs in mapPartitions like the Convolver — per-row dense
    * math, batched per partition, nothing on the driver. Input must be
    * single-channel (run [[grayScale]] first). */
  def hog(ds: Dataset[Img], cell: Int = 4, bins: Int = 9): Dataset[Img] = {
    import ds.sparkSession.implicits._
    ds.map { img =>
      require(img.n_channels == 1, "hog expects a grayscale image")
      val w = img.x_dim
      val h = img.y_dim
      val cx = w / cell
      val cy = h / cell
      val out = new Array[Double](cx * cy * bins)
      var y = 0
      while (y < cy * cell) {
        var x = 0
        while (x < cx * cell) {
          val xm = if (x == 0) x else x - 1
          val xp = if (x == w - 1) x else x + 1
          val ym = if (y == 0) y else y - 1
          val yp = if (y == h - 1) y else y + 1
          val gx = img.image(y * w + xp) - img.image(y * w + xm)
          val gy = img.image(yp * w + x) - img.image(ym * w + x)
          val mag = math.sqrt(gx * gx + gy * gy)
          if (mag > 0) {
            // unsigned orientation in [0, pi)
            var theta = math.atan2(gy, gx)
            if (theta < 0) theta += math.Pi
            if (theta >= math.Pi) theta -= math.Pi
            val bin = math.min((theta / math.Pi * bins).toInt, bins - 1)
            val cellIdx = (y / cell) * cx + (x / cell)
            out(cellIdx * bins + bin) += mag
          }
          x += 1
        }
        y += 1
      }
      // L2 normalize per cell
      var c = 0
      while (c < cx * cy) {
        var s = 0.0
        var b = 0
        while (b < bins) { val v = out(c * bins + b); s += v * v; b += 1 }
        val n = math.sqrt(s) + 1e-12
        b = 0
        while (b < bins) { out(c * bins + b) /= n; b += 1 }
        c += 1
      }
      Img(img.id, cx, cy, bins, out)
    }
  }

  /** ref: DaisyExtractor — DAISY dense descriptor (Tola et al., PAMI 2010)
    * in its engine-portable fixed-point configuration: Gaussian-smoothed
    * oriented-gradient maps sampled on concentric rings around a center.
    *
    *  - The grayscale buffer is quantized back to integer levels
    *    (`rint(v·levels)` — exact for 8-bit-derived pixels), the same
    *    fixed-point trick as [[graft.ml.FisherVector]]'s quantizeUnits: it
    *    makes every convolution sum EXACT integer arithmetic, so the
    *    descriptor is bit-identical under any partitioning or engine.
    *  - 4 half-rectified, axis-aligned orientation maps max(0, ±gx),
    *    max(0, ±gy) from clamped central differences — DAISY's H=4
    *    configuration, chosen because the orientation projections are pure
    *    integer ops (no trig).
    *  - Gaussian smoothing via the separable 3×3 binomial kernel
    *    (1,2,1)⊗(1,2,1) (the standard discrete Gaussian approximation,
    *    integer weights): ring i's layer is smoothed i+1 times, giving the
    *    growing-σ pyramid of the paper.
    *  - Sample geometry: the center plus `radii.length` rings of 4 points
    *    at axis-aligned integer offsets (±r, 0), (0, ±r) — integer ring
    *    geometry needs no bilinear interpolation. Center and ring 0 read
    *    layer 0; ring i reads layer i.
    *  - Each sample point's 4-orientation histogram is L2-normalized
    *    (+1e-12 guard), as the paper normalizes each histogram
    *    independently.
    *
    * Output layout: x_dim = 1+4·rings sample points, y_dim = 1,
    * n_channels = 4; index = point·4 + orientation. Points: 0 = center,
    * then per ring in (+x, +y, −x, −y) order. Pure per-row JVM math like
    * [[hog]]/[[lcs]]: embarrassingly parallel, nothing on the driver. */
  def daisy(ds: Dataset[Img], radii: Array[Int] = Array(2, 4),
      levels: Int = 255): Dataset[Img] = {
    import ds.sparkSession.implicits._
    val rs = radii
    ds.map { img =>
      require(img.n_channels == 1, "daisy expects a grayscale image")
      val w = img.x_dim
      val h = img.y_dim
      val rMax = rs.max
      require(w / 2 + rMax < w && h / 2 + rMax < h &&
        w / 2 - rMax >= 0 && h / 2 - rMax >= 0,
        s"daisy ring radius $rMax does not fit a ${w}x$h image")
      val q = new Array[Long](w * h)
      var i = 0
      while (i < w * h) { q(i) = math.rint(img.image(i) * levels).toLong; i += 1 }
      val nOri = 4
      val m = Array.ofDim[Long](nOri, w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val xm = if (x == 0) x else x - 1
          val xp = if (x == w - 1) x else x + 1
          val ym = if (y == 0) y else y - 1
          val yp = if (y == h - 1) y else y + 1
          val gx = q(y * w + xp) - q(y * w + xm)
          val gy = q(yp * w + x) - q(ym * w + x)
          val idx = y * w + x
          m(0)(idx) = math.max(gx, 0L)
          m(1)(idx) = math.max(gy, 0L)
          m(2)(idx) = math.max(-gx, 0L)
          m(3)(idx) = math.max(-gy, 0L)
          x += 1
        }
        y += 1
      }
      val wgt = Array(1L, 2L, 1L)
      def smooth(src: Array[Long]): Array[Long] = {
        val out = new Array[Long](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var acc = 0L
            var dy = -1
            while (dy <= 1) {
              val yy = math.min(math.max(y + dy, 0), h - 1)
              var dx = -1
              while (dx <= 1) {
                val xx = math.min(math.max(x + dx, 0), w - 1)
                acc += wgt(dy + 1) * wgt(dx + 1) * src(yy * w + xx)
                dx += 1
              }
              dy += 1
            }
            out(y * w + x) = acc
            x += 1
          }
          y += 1
        }
        out
      }
      // layer k = orientation maps smoothed k+1 times (growing sigma)
      val pyramid = new Array[Array[Array[Long]]](rs.length)
      pyramid(0) = m.map(smooth)
      var lvl = 1
      while (lvl < rs.length) {
        pyramid(lvl) = pyramid(lvl - 1).map(smooth)
        lvl += 1
      }
      val cx = w / 2
      val cy = h / 2
      val points = (cx, cy, 0) +: rs.zipWithIndex.flatMap { case (r, ri) =>
        Seq((cx + r, cy, ri), (cx, cy + r, ri), (cx - r, cy, ri), (cx, cy - r, ri))
      }
      val out = new Array[Double](points.length * nOri)
      var p = 0
      while (p < points.length) {
        val (sx, sy, l) = points(p)
        val v = Array.tabulate(nOri)(o => pyramid(l)(o)(sy * w + sx))
        // 4-term integer sum of squares: exact, order-free
        val ss = v(0) * v(0) + v(1) * v(1) + v(2) * v(2) + v(3) * v(3)
        val nrm = math.sqrt(ss.toDouble) + 1e-12
        var o = 0
        while (o < nOri) { out(p * nOri + o) = v(o).toDouble / nrm; o += 1 }
        p += 1
      }
      Img(img.id, points.length, 1, nOri, out)
    }
  }

  /** ref: SIFTExtractor (the reference wraps VLFeat's dense SIFT behind
    * C++/JNI) — re-expressed as pure-JVM dense SIFT from the published
    * algorithm (Lowe, IJCV 2004; VLFeat dsift), which removes the JNI
    * dependency entirely: like [[hog]]/[[daisy]]/[[lcs]] it is per-row
    * dense math in a Dataset map, embarrassingly parallel, nothing on the
    * driver, no native library.
    *
    * Engine-portable configuration (the same discipline as [[daisy]]):
    *  - DENSE keypoint grid: patch windows of `patch`² pixels, top-left
    *    corners stepping by `step`; gradients are clamped central
    *    differences on the FULL image (patch-interior pixels see their
    *    true neighbors across patch seams).
    *  - SIGNED orientation over [0, 2π) in `bins` bins — SIFT's defining
    *    contrast with HOG's unsigned [0, π) — assigned hard with bin
    *    BOUNDARIES at odd multiples of π/bins (a half-bin offset, i.e.
    *    bin CENTERS at the axis/diagonal directions, as VLFeat centers
    *    them). The offset is what makes hard assignment engine-safe:
    *    diagonal gradients (|gx| = |gy|) land exactly ON a multiple of
    *    π/4, which with unshifted boundaries would sit on a bin edge an
    *    atan2 ulp could flip; against the shifted boundaries (tan of odd
    *    π/8 multiples is irrational) no rational gradient ratio comes
    *    within ~1e-6 of an edge.
    *  - Spatial weighting by the integer tent window
    *    w(x,y) = (min(x, patch−1−x)+1)·(min(y, patch−1−y)+1) — the
    *    separable integer approximation of SIFT's Gaussian window (the
    *    [[daisy]] binomial-kernel trick applied to windowing); the weight
    *    product is computed IN INTEGERS and applied in one double
    *    multiply, so the replay is associativity-proof.
    *  - `cells`×`cells` spatial bins per patch; Lowe's two-stage
    *    normalization per descriptor: L2-normalize, clip at 0.2,
    *    re-L2-normalize (+1e-12 guards).
    *
    * Output layout: x_dim = number of keypoints (row-major over the
    * keypoint grid), y_dim = cells², n_channels = bins;
    * index = (kp·cells² + cell)·bins + bin. */
  def sift(ds: Dataset[Img], patch: Int = 16, step: Int = 16,
      cells: Int = 4, bins: Int = 8): Dataset[Img] = {
    import ds.sparkSession.implicits._
    require(patch % cells == 0, "patch must divide evenly into cells")
    ds.map { img =>
      require(img.n_channels == 1, "sift expects a grayscale image")
      val w = img.x_dim
      val h = img.y_dim
      val cs = patch / cells
      val kpx = if (w >= patch) (w - patch) / step + 1 else 0
      val kpy = if (h >= patch) (h - patch) / step + 1 else 0
      val dLen = cells * cells * bins
      val out = new Array[Double](kpx * kpy * dLen)
      val twoPi = 2 * math.Pi
      val halfBin = math.Pi / bins
      var kY = 0
      while (kY < kpy) {
        var kX = 0
        while (kX < kpx) {
          val base = (kY * kpx + kX) * dLen
          val px = kX * step
          val py = kY * step
          var y = 0
          while (y < patch) {
            val gyy = py + y
            var x = 0
            while (x < patch) {
              val gxx = px + x
              val xm = if (gxx == 0) gxx else gxx - 1
              val xp = if (gxx == w - 1) gxx else gxx + 1
              val ym = if (gyy == 0) gyy else gyy - 1
              val yp = if (gyy == h - 1) gyy else gyy + 1
              val gx = img.image(gyy * w + xp) - img.image(gyy * w + xm)
              val gy = img.image(yp * w + gxx) - img.image(ym * w + gxx)
              val mag = math.sqrt(gx * gx + gy * gy)
              if (mag > 0) {
                var theta = math.atan2(gy, gx) + halfBin
                if (theta < 0) theta += twoPi
                val bin = math.min((theta / twoPi * bins).toInt, bins - 1)
                val wgt =
                  (math.min(x, patch - 1 - x) + 1) * (math.min(y, patch - 1 - y) + 1)
                out(base + ((y / cs) * cells + (x / cs)) * bins + bin) += mag * wgt
              }
              x += 1
            }
            y += 1
          }
          var s = 0.0
          var i = 0
          while (i < dLen) { val v = out(base + i); s += v * v; i += 1 }
          val n1 = math.sqrt(s) + 1e-12
          var s2 = 0.0
          i = 0
          while (i < dLen) {
            val u = math.min(out(base + i) / n1, 0.2)
            out(base + i) = u
            s2 += u * u
            i += 1
          }
          val n2 = math.sqrt(s2) + 1e-12
          i = 0
          while (i < dLen) { out(base + i) /= n2; i += 1 }
          kX += 1
        }
        kY += 1
      }
      Img(img.id, kpx * kpy, cells * cells, bins, out)
    }
  }

  /** ref: LCSExtractor — Local Color Statistics descriptor: per grid cell
    * and channel, the (mean, stddev) of the pixel values — 2·C·cells
    * doubles per image. Pure per-row arithmetic in mapPartitions. */
  def lcs(ds: Dataset[Img], cell: Int = 4): Dataset[Img] = {
    import ds.sparkSession.implicits._
    ds.map { img =>
      val w = img.x_dim
      val nc = img.n_channels
      val cx = img.x_dim / cell
      val cy = img.y_dim / cell
      val out = new Array[Double](cx * cy * nc * 2)
      var gy = 0
      while (gy < cy) {
        var gx = 0
        while (gx < cx) {
          var c = 0
          while (c < nc) {
            var s = 0.0
            var s2 = 0.0
            var dy = 0
            while (dy < cell) {
              var dx = 0
              while (dx < cell) {
                val v = img.image(((gy * cell + dy) * w + gx * cell + dx) * nc + c)
                s += v; s2 += v * v
                dx += 1
              }
              dy += 1
            }
            val n = (cell * cell).toDouble
            val mu = s / n
            val varr = math.max(s2 / n - mu * mu, 0.0)
            val base = ((gy * cx + gx) * nc + c) * 2
            out(base) = mu
            out(base + 1) = math.sqrt(varr)
            c += 1
          }
          gx += 1
        }
        gy += 1
      }
      Img(img.id, cx, cy, nc * 2, out)
    }
  }

  /** Naive reference convolution (driver-side, tests only). */
  private[graft] def convolveNaive(img: Img, filter: Array[Double], fx: Int,
      fy: Int): Array[Double] = {
    val xo = img.x_dim - fx + 1
    val yo = img.y_dim - fy + 1
    val nc = img.n_channels
    val out = new Array[Double](xo * yo)
    for (py <- 0 until yo; px <- 0 until xo) {
      var s = 0.0
      var q = 0
      for (dy <- 0 until fy; dx <- 0 until fx; c <- 0 until nc) {
        s += img.image(((py + dy) * img.x_dim + px + dx) * nc + c) * filter(q)
        q += 1
      }
      out(py * xo + px) = s
    }
    out
  }
}
