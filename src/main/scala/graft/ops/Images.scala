package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.images.{ImageOps, MultimodalOps}

/** Declared-query surface for the image operator family (ref: nodes.images —
  * SURVEY §2.A images table), pulling GrayScaler / SymmetricRectifier /
  * Pooler into the DuckDB correctness gate.
  *
  * Inputs are [[ImageOps.syntheticImages]]: pixel(i) of image `id` is the
  * pure-integer formula ((id*31 + i*7) mod 256)/255 — generated with
  * `sequence`/`transform` on the Spark side and mirrored with the same
  * scalar arithmetic in the oracle SQL, so no image testdata is needed and
  * both engines compute bit-identical doubles (same IEEE ops, same order).
  * Outputs are exploded to one scalar row per (image, pixel, channel):
  * array columns never cross the engine boundary.
  */
object Images {

  /** Sum- and max-pooling (ref: Pooler), stride 2, over 20 synthetic
    * 8×8×2 images → 4×4×2. Both pool ops run through [[ImageOps.pool]];
    * the two outputs join on (id, flat index) and the index is decomposed
    * to (py, px, ch) with the row-major interleaved addressing the family
    * documents. Per-image work is bounded (128 doubles in, 32 out), so the
    * operator scales embarrassingly: no shuffle until the final order-by. */
  def qImagePool(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val imgs = ImageOps.syntheticImages(spark, n = 20, x = 8, y = 8, c = 2)
    val summed = ImageOps.pool(imgs, stride = 2, op = "sum")
      .select($"id", posexplode($"image").as(Seq("i", "sum_raw")))
    val maxed = ImageOps.pool(imgs, stride = 2, op = "max")
      .select($"id", posexplode($"image").as(Seq("i", "max_raw")))
    summed.join(maxed, Seq("id", "i"))
      .select($"id",
        floor($"i" / 8).cast("long").as("py"),
        (floor($"i" / 2) % 4).cast("long").as("px"),
        ($"i" % 2).cast("long").as("ch"),
        round($"sum_raw", 6).as("sum_val"),
        round($"max_raw", 6).as("max_val"))
      .orderBy($"id", $"py", $"px", $"ch")
  }

  /** The oracle evaluates each 2×2 window term directly from the pixel
    * formula, summed in the Pooler's (dy, dx) traversal order so the
    * left-associated double addition matches Spark's `aggregate` fold. */
  val imagePoolSql: String =
    """WITH base AS (
      |  SELECT t.id AS id, py.py AS py, px.px AS px, c.c AS ch,
      |    CAST((t.id*31 + (((py.py*2  )*8 + px.px*2  )*2 + c.c)*7) % 256 AS DOUBLE)/255.0 AS v00,
      |    CAST((t.id*31 + (((py.py*2  )*8 + px.px*2+1)*2 + c.c)*7) % 256 AS DOUBLE)/255.0 AS v01,
      |    CAST((t.id*31 + (((py.py*2+1)*8 + px.px*2  )*2 + c.c)*7) % 256 AS DOUBLE)/255.0 AS v10,
      |    CAST((t.id*31 + (((py.py*2+1)*8 + px.px*2+1)*2 + c.c)*7) % 256 AS DOUBLE)/255.0 AS v11
      |  FROM range(0,20) t(id), range(0,4) py(py), range(0,4) px(px), range(0,2) c(c))
      |SELECT id, py, px, ch,
      |  round(v00 + v01 + v10 + v11, 6) AS sum_val,
      |  round(greatest(v00, v01, v10, v11), 6) AS max_val
      |FROM base ORDER BY id, py, px, ch""".stripMargin

  /** Luminance + symmetric rectification (ref: GrayScaler andThen
    * SymmetricRectifier), over 20 synthetic 4×4×3 images. The grayscale
    * values are centered at 0 (−0.5) before rectifying so BOTH halves of
    * the rectifier ([max(0, x−α); max(0, −x−α)], α = 0.1) produce nonzero
    * outputs on this data. Output channel 0 is the positive half, channel
    * 1 the negative half. */
  def qImageGrayscaleRectify(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val imgs = ImageOps.syntheticImages(spark, n = 20, x = 4, y = 4, c = 3)
    val gray = ImageOps.grayScale(imgs)
    val centered = gray.withColumn("image", transform($"image", x => x - 0.5))
    val rect = ImageOps.symmetricRectify(centered, alpha = 0.1)
    rect.select($"id", posexplode($"image").as(Seq("i", "raw")))
      .select($"id",
        floor($"i" / 2).cast("long").as("pixel"),
        ($"i" % 2).cast("long").as("ch"),
        round($"raw", 6).as("val"))
      .orderBy($"id", $"pixel", $"ch")
  }

  /** Oracle: the channel mean is summed in GrayScaler's fold order
    * (left-associated over c = 0, 1, 2) before the /3, so the double math
    * is bit-identical to Spark's `aggregate`. */
  val imageGrayscaleRectifySql: String =
    """WITH gray AS (
      |  SELECT t.id AS id, p.p AS p,
      |    ((CAST((t.id*31 + (p.p*3)*7) % 256 AS DOUBLE)/255.0
      |    + CAST((t.id*31 + (p.p*3+1)*7) % 256 AS DOUBLE)/255.0
      |    + CAST((t.id*31 + (p.p*3+2)*7) % 256 AS DOUBLE)/255.0) / 3.0 - 0.5) AS g
      |  FROM range(0,20) t(id), range(0,16) p(p))
      |SELECT id, p AS pixel, ch.ch AS ch,
      |  round(CASE WHEN ch.ch = 0 THEN greatest(g - 0.1, 0.0)
      |             ELSE greatest(-g - 0.1, 0.0) END, 6) AS val
      |FROM gray, range(0,2) ch(ch)
      |ORDER BY id, pixel, ch""".stripMargin

  /** Crop → PixelScaler → Windower composite (ref: Cropper, PixelScaler,
    * Windower/FastWindower) over 20 synthetic 6×4×1 images: crop the inner
    * 4×2 rectangle at (1,1), rescale, then tile 2×2 patches at stride 2
    * (origins (0,0) and (2,0)). Each output row addresses one patch pixel;
    * the oracle re-derives it straight from the pixel formula with the
    * crop/window offsets composed. */
  def qImageCropWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val imgs = ImageOps.syntheticImages(spark, n = 20, x = 6, y = 4, c = 1)
    val prepped = ImageOps.pixelScale(ImageOps.crop(imgs, x0 = 1, y0 = 1, w = 4, h = 2))
    ImageOps.windower(prepped, w = 2, h = 2, stride = 2)
      .select($"id", $"win_x".cast("long").as("win_x"),
        $"win_y".cast("long").as("win_y"),
        posexplode($"image").as(Seq("pos", "raw")))
      .select($"id", $"win_x", $"win_y", $"pos".cast("long").as("pos"),
        round($"raw", 6).as("val"))
      .orderBy($"id", $"win_y", $"win_x", $"pos")
  }

  val imageCropWindowSql: String =
    """SELECT t.id AS id, CAST(wx.wx AS BIGINT) AS win_x, CAST(0 AS BIGINT) AS win_y,
      |  p.p AS pos,
      |  round(CAST((t.id*31 + (((p.p // 2) + 1)*6 + ((p.p % 2) + wx.wx + 1))*7) % 256 AS DOUBLE)
      |        / 255.0 / 255.0, 6) AS val
      |FROM range(0, 20) t(id)
      |CROSS JOIN (VALUES (0), (2)) wx(wx)
      |CROSS JOIN range(0, 4) p(p)
      |ORDER BY id, win_y, win_x, pos""".stripMargin

  /** Valid 2-D convolution of a 2-filter bank (ref: Convolver — the
    * im2col + BLAS gemm mapPartitions path, the one operator family that
    * escapes Catalyst) over 20 synthetic 5×4×1 images → 4×3×2 outputs.
    * Integer filter coefficients keep the oracle a 4-term literal sum; the
    * oracle accumulates in the gemm's K order (dy-major, dx-minor), which
    * matches f2j dgemm's ascending-L loop. */
  def qImageConvolve(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val imgs = ImageOps.syntheticImages(spark, n = 20, x = 5, y = 4, c = 1)
      .as[ImageOps.Img]
    val filters = Array(Array(1.0, -1.0, 2.0, -2.0), Array(3.0, 1.0, -1.0, 2.0))
    ImageOps.convolve(imgs, filters, fx = 2, fy = 2).toDF()
      .select($"id", posexplode($"image").as(Seq("i", "raw")))
      .select($"id",
        floor($"i" / 8).cast("long").as("py"),
        (floor($"i" / 2) % 4).cast("long").as("px"),
        ($"i" % 2).cast("long").as("ch"),
        round($"raw", 6).as("val"))
      .orderBy($"id", $"py", $"px", $"ch")
  }

  val imageConvolveSql: String =
    """WITH base AS (
      |  SELECT t.id AS id, py.py AS py, px.px AS px,
      |    CAST((t.id*31 + ((py.py    )*5 + px.px    )*7) % 256 AS DOUBLE)/255.0 AS v00,
      |    CAST((t.id*31 + ((py.py    )*5 + px.px + 1)*7) % 256 AS DOUBLE)/255.0 AS v01,
      |    CAST((t.id*31 + ((py.py + 1)*5 + px.px    )*7) % 256 AS DOUBLE)/255.0 AS v10,
      |    CAST((t.id*31 + ((py.py + 1)*5 + px.px + 1)*7) % 256 AS DOUBLE)/255.0 AS v11
      |  FROM range(0, 20) t(id), range(0, 3) py(py), range(0, 4) px(px))
      |SELECT id, py, px, ch.ch AS ch,
      |  round(CASE WHEN ch.ch = 0
      |    THEN v00*1.0 + v01*(-1.0) + v10*2.0 + v11*(-2.0)
      |    ELSE v00*3.0 + v01*1.0 + v10*(-1.0) + v11*2.0 END, 6) AS val
      |FROM base, range(0, 2) ch(ch)
      |ORDER BY id, py, px, ch""".stripMargin

  /** Local color statistics (ref: LCSExtractor — per 4×4 cell mean and
    * std, the second mapPartitions descriptor under the gate) over 20
    * synthetic 8×8×1 images → 2×2 cells × (mu, sigma). The oracle
    * recomputes each cell's Σv and Σv² from the pixel formula and applies
    * the same mu/max(var,0)/sqrt arithmetic; 16-term double sums agree to
    * well past the 6-dp round on both engines. */
  def qImageLcs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val imgs = ImageOps.syntheticImages(spark, n = 20, x = 8, y = 8, c = 1)
      .as[ImageOps.Img]
    ImageOps.lcs(imgs, cell = 4).toDF()
      .select($"id", posexplode($"image").as(Seq("i", "raw")))
      .select($"id",
        floor($"i" / 4).cast("long").as("gy"),   // 2 cells/row x 2 stats
        (floor($"i" / 2) % 2).cast("long").as("gx"),
        ($"i" % 2).cast("long").as("stat"),      // 0 = mean, 1 = std
        round($"raw", 6).as("val"))
      .orderBy($"id", $"gy", $"gx", $"stat")
  }

  val imageLcsSql: String =
    """WITH px AS (
      |  SELECT t.id AS id, gy.gy AS gy, gx.gx AS gx,
      |    CAST((t.id*31 + ((gy.gy*4 + dy.dy)*8 + gx.gx*4 + dx.dx)*7) % 256 AS DOUBLE)/255.0 AS v
      |  FROM range(0, 20) t(id), range(0, 2) gy(gy), range(0, 2) gx(gx),
      |       range(0, 4) dy(dy), range(0, 4) dx(dx)),
      |agg AS (
      |  SELECT id, gy, gx, sum(v) AS s, sum(v*v) AS s2
      |  FROM px GROUP BY id, gy, gx)
      |SELECT id, gy, gx, st.st AS stat,
      |  CASE WHEN st.st = 0 THEN round(s/16.0, 6)
      |       ELSE round(sqrt(greatest(s2/16.0 - (s/16.0)*(s/16.0), 0.0)), 6)
      |  END AS val
      |FROM agg, range(0, 2) st(st)
      |ORDER BY id, gy, gx, stat""".stripMargin

  /** Fisher-vector encoding (ref: FisherVector/GMMFisherVectorEstimator —
    * the aggregation heart of the reference's image pipelines) under the
    * oracle gate: a FIXED 2-component diagonal GMM (integer-formula means,
    * shared σ = 0.5 so the log-normalizer is common-mode and cancels in
    * the softmax on both engines) encodes the 64-d embeddings grouped by
    * label, in the transformer's DETERMINISTIC fixed-point mode
    * (quantizeUnits = 1e9 — exact long sums, bit-stable under any
    * partitioning; see [[graft.ml.FisherVector.fromParams]]). The oracle
    * replays posterior → quantize → sum → normalize with the identical
    * IEEE expression shapes. */
  def qImageFisherVector(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val enc = graft.ml.FisherVector.fromParams("label", "embedding", "fv",
      weights = Array(0.4, 0.6),
      means = Array(
        Array.tabulate(64)(j => j / 128.0),
        Array.tabulate(64)(j => 0.25 + j / 256.0)),
      sigmas = Array(Array.fill(64)(0.5), Array.fill(64)(0.5)),
      quantizeUnits = Some(1000000000L))
    enc(graft.tables.Tables.embeddings(spark, sfDir).select($"label", $"embedding"))
      .select($"label".cast("long").as("label"),
        posexplode($"fv").as(Seq("pos", "raw")))
      .select($"label", $"pos".cast("long").as("pos"),
        // + 0.0 normalizes IEEE -0.0 (a tiny negative contribution sum
        // rounding to signed zero) to +0.0 on both engines — first seen
        // live at sf0.1 where one (label, pos) cell landed there
        (round($"raw", 6) + lit(0.0)).as("val"))
      .orderBy($"label", $"pos")
  }

  val imageFisherVectorSql: String =
    """WITH quads AS (
      |  SELECT label, embedding,
      |    list_sum(list_transform(range(1, 65), i ->
      |      ((CAST(embedding[i] AS DOUBLE) - CAST(i - 1 AS DOUBLE)/128.0)/0.5)
      |      * ((CAST(embedding[i] AS DOUBLE) - CAST(i - 1 AS DOUBLE)/128.0)/0.5))) AS quad0,
      |    list_sum(list_transform(range(1, 65), i ->
      |      ((CAST(embedding[i] AS DOUBLE) - (0.25 + CAST(i - 1 AS DOUBLE)/256.0))/0.5)
      |      * ((CAST(embedding[i] AS DOUBLE) - (0.25 + CAST(i - 1 AS DOUBLE)/256.0))/0.5))) AS quad1
      |  FROM embeddings),
      |lp AS (
      |  SELECT label, embedding,
      |    (ln(0.4) + (-0.5*64*ln(2*pi()) - 64*ln(0.5))) - quad0*0.5 AS lp0,
      |    (ln(0.6) + (-0.5*64*ln(2*pi()) - 64*ln(0.5))) - quad1*0.5 AS lp1
      |  FROM quads),
      |gam AS (
      |  SELECT label, embedding,
      |    exp(lp0 - greatest(lp0, lp1)) /
      |      (exp(lp0 - greatest(lp0, lp1)) + exp(lp1 - greatest(lp0, lp1))) AS g0,
      |    exp(lp1 - greatest(lp0, lp1)) /
      |      (exp(lp0 - greatest(lp0, lp1)) + exp(lp1 - greatest(lp0, lp1))) AS g1
      |  FROM lp),
      |contrib AS (
      |  SELECT label, p.i AS i,
      |    CAST(floor((g0 * ((CAST(embedding[p.i] AS DOUBLE) - CAST(p.i - 1 AS DOUBLE)/128.0)/0.5)) * 1000000000.0 + 0.5) AS BIGINT) AS c_mu_0,
      |    CAST(floor((g0 * (((CAST(embedding[p.i] AS DOUBLE) - CAST(p.i - 1 AS DOUBLE)/128.0)/0.5) * ((CAST(embedding[p.i] AS DOUBLE) - CAST(p.i - 1 AS DOUBLE)/128.0)/0.5) - 1.0)) * 1000000000.0 + 0.5) AS BIGINT) AS c_sg_0,
      |    CAST(floor((g1 * ((CAST(embedding[p.i] AS DOUBLE) - (0.25 + CAST(p.i - 1 AS DOUBLE)/256.0))/0.5)) * 1000000000.0 + 0.5) AS BIGINT) AS c_mu_1,
      |    CAST(floor((g1 * (((CAST(embedding[p.i] AS DOUBLE) - (0.25 + CAST(p.i - 1 AS DOUBLE)/256.0))/0.5) * ((CAST(embedding[p.i] AS DOUBLE) - (0.25 + CAST(p.i - 1 AS DOUBLE)/256.0))/0.5) - 1.0)) * 1000000000.0 + 0.5) AS BIGINT) AS c_sg_1
      |  FROM gam, range(1, 65) p(i)),
      |s AS (
      |  SELECT label, i, sum(c_mu_0) AS s_mu_0, sum(c_sg_0) AS s_sg_0,
      |         sum(c_mu_1) AS s_mu_1, sum(c_sg_1) AS s_sg_1, count(*) AS t
      |  FROM contrib GROUP BY label, i)
      |SELECT CAST(label AS BIGINT) AS label,
      |  CAST(b.b*64 + i - 1 AS BIGINT) AS pos,
      |  round(CASE b.b
      |    WHEN 0 THEN (CAST(s_mu_0 AS DOUBLE)/1000000000.0) / (CAST(t AS DOUBLE) * sqrt(0.4))
      |    WHEN 1 THEN (CAST(s_sg_0 AS DOUBLE)/1000000000.0) / (CAST(t AS DOUBLE) * sqrt(2.0*0.4))
      |    WHEN 2 THEN (CAST(s_mu_1 AS DOUBLE)/1000000000.0) / (CAST(t AS DOUBLE) * sqrt(0.6))
      |    ELSE        (CAST(s_sg_1 AS DOUBLE)/1000000000.0) / (CAST(t AS DOUBLE) * sqrt(2.0*0.6))
      |  END, 6) + 0.0 AS val
      |FROM s, range(0, 4) b(b)
      |ORDER BY label, pos""".stripMargin

  /** Histogram-of-oriented-gradients (ref: HogExtractor — the remaining
    * mapPartitions descriptor, now under the gate beside LCS) over 20
    * synthetic 8×8×1 images, cell = 4, bins = 9 → 2×2 cells × 9 bins.
    * The oracle replays the extractor's exact IEEE steps from the pixel
    * formula: per-pixel /255.0 BEFORE the central difference (subtracting
    * pre-rounded doubles, as the JVM does), clamped borders, unsigned
    * atan2 orientation with the same fold-into-[0,π) branch order, and
    * the per-cell L2 normalization with the +1e-12 guard. Bin boundaries
    * are safe across engines: the smallest nonzero gradient is 1/255, so
    * no orientation lands within an ulp of a π/9 multiple. */
  def qImageHog(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val imgs = ImageOps.syntheticImages(spark, n = 20, x = 8, y = 8, c = 1)
      .as[ImageOps.Img]
    ImageOps.hog(imgs, cell = 4, bins = 9).toDF()
      .select($"id", posexplode($"image").as(Seq("i", "raw")))
      .select($"id",
        floor($"i" / 18).cast("long").as("cy"),    // cellIdx = i / 9; 2 cells/row
        (floor($"i" / 9) % 2).cast("long").as("cx"),
        ($"i" % 9).cast("long").as("bin"),
        round($"raw", 6).as("val"))
      .orderBy($"id", $"cy", $"cx", $"bin")
  }

  val imageHogSql: String =
    """WITH grad AS (
      |  SELECT t.id AS id, y.y AS y, x.x AS x,
      |    CAST((t.id*31 + (y.y*8 + CASE WHEN x.x = 7 THEN x.x ELSE x.x + 1 END)*7) % 256 AS DOUBLE)/255.0
      |    - CAST((t.id*31 + (y.y*8 + CASE WHEN x.x = 0 THEN x.x ELSE x.x - 1 END)*7) % 256 AS DOUBLE)/255.0 AS gx,
      |    CAST((t.id*31 + ((CASE WHEN y.y = 7 THEN y.y ELSE y.y + 1 END)*8 + x.x)*7) % 256 AS DOUBLE)/255.0
      |    - CAST((t.id*31 + ((CASE WHEN y.y = 0 THEN y.y ELSE y.y - 1 END)*8 + x.x)*7) % 256 AS DOUBLE)/255.0 AS gy
      |  FROM range(0, 20) t(id), range(0, 8) y(y), range(0, 8) x(x)),
      |votes AS (
      |  SELECT id, y//4 AS cy, x//4 AS cx,
      |    least(CAST(floor(
      |      (CASE WHEN atan2(gy, gx) < 0 THEN atan2(gy, gx) + pi()
      |            WHEN atan2(gy, gx) >= pi() THEN atan2(gy, gx) - pi()
      |            ELSE atan2(gy, gx) END) / pi() * 9) AS BIGINT), 8) AS bin,
      |    sqrt(gx*gx + gy*gy) AS mag
      |  FROM grad WHERE sqrt(gx*gx + gy*gy) > 0),
      |acc AS (
      |  SELECT id, cy, cx, bin, sum(mag) AS v
      |  FROM votes GROUP BY id, cy, cx, bin),
      |norm AS (
      |  SELECT id, cy, cx, sum(v*v) AS s FROM acc GROUP BY id, cy, cx),
      |grid AS (
      |  SELECT t.id AS id, cy.cy AS cy, cx.cx AS cx, b.b AS bin
      |  FROM range(0, 20) t(id), range(0, 2) cy(cy), range(0, 2) cx(cx),
      |       range(0, 9) b(b))
      |SELECT g.id AS id, g.cy AS cy, g.cx AS cx, g.bin AS bin,
      |  round(coalesce(a.v, 0.0) / (sqrt(coalesce(n.s, 0.0)) + 1e-12), 6) AS val
      |FROM grid g
      |LEFT JOIN acc a ON a.id = g.id AND a.cy = g.cy AND a.cx = g.cx AND a.bin = g.bin
      |LEFT JOIN norm n ON n.id = g.id AND n.cy = g.cy AND n.cx = g.cx
      |ORDER BY id, cy, cx, bin""".stripMargin

  /** DAISY descriptor (ref: DaisyExtractor — the last §2.A image operator,
    * the HOG pattern applied to ring-sampled smoothed gradients) over 20
    * synthetic 16×16×1 images: 4 half-rectified axis-aligned orientation
    * maps → integer binomial smoothing pyramid (1 pass for the center +
    * r=2 ring layer, 2 passes for the r=4 ring layer) → 9 sample points
    * (center + 2 rings × 4) → per-point L2 normalization. Every value
    * before the normalize is EXACT integer arithmetic on both engines
    * (the 8-bit fixed-point trick documented on [[ImageOps.daisy]]), so
    * the oracle can use plain integer SUM-joins with no summation-order
    * caveats; the only IEEE ops are the final sqrt + divide, written with
    * the identical expression shape on both sides. */
  def qImageDaisy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val imgs = ImageOps.syntheticImages(spark, n = 20, x = 16, y = 16, c = 1)
      .as[ImageOps.Img]
    ImageOps.daisy(imgs, radii = Array(2, 4)).toDF()
      .select($"id", posexplode($"image").as(Seq("i", "raw")))
      .select($"id",
        floor($"i" / 4).cast("long").as("point"),
        ($"i" % 4).cast("long").as("orient"),
        round($"raw", 6).as("val"))
      .orderBy($"id", $"point", $"orient")
  }

  /** Oracle: replays the integer pipeline with SUM-joins (exact — all
    * integer until the final normalize). Layers: s1 = one binomial pass
    * (center + ring r=2), s2 = two passes (ring r=4); sample points are
    * numbered center=0, then (+x,+y,−x,−y) per ring, matching
    * [[ImageOps.daisy]]'s layout. */
  val imageDaisySql: String =
    """WITH g AS (
      |  SELECT t.id AS id, y.y AS y, x.x AS x,
      |    (t.id*31 + (y.y*16 + CASE WHEN x.x = 15 THEN x.x ELSE x.x + 1 END)*7) % 256
      |  - (t.id*31 + (y.y*16 + CASE WHEN x.x = 0  THEN x.x ELSE x.x - 1 END)*7) % 256 AS gx,
      |    (t.id*31 + ((CASE WHEN y.y = 15 THEN y.y ELSE y.y + 1 END)*16 + x.x)*7) % 256
      |  - (t.id*31 + ((CASE WHEN y.y = 0  THEN y.y ELSE y.y - 1 END)*16 + x.x)*7) % 256 AS gy
      |  FROM range(0, 20) t(id), range(0, 16) y(y), range(0, 16) x(x)),
      |m AS (
      |  SELECT id, y, x, o.o AS o,
      |    CASE o.o WHEN 0 THEN greatest(gx, 0) WHEN 1 THEN greatest(gy, 0)
      |             WHEN 2 THEN greatest(-gx, 0) ELSE greatest(-gy, 0) END AS v
      |  FROM g, range(0, 4) o(o)),
      |w(d, wt) AS (VALUES (-1, 1), (0, 2), (1, 1)),
      |s1 AS (
      |  SELECT c.id AS id, c.y AS y, c.x AS x, c.o AS o,
      |    sum(wy.wt * wx.wt * n.v) AS v
      |  FROM m c, w wy, w wx, m n
      |  WHERE n.id = c.id AND n.o = c.o
      |    AND n.y = greatest(least(c.y + wy.d, 15), 0)
      |    AND n.x = greatest(least(c.x + wx.d, 15), 0)
      |  GROUP BY 1, 2, 3, 4),
      |s2 AS (
      |  SELECT c.id AS id, c.y AS y, c.x AS x, c.o AS o,
      |    sum(wy.wt * wx.wt * n.v) AS v
      |  FROM s1 c, w wy, w wx, s1 n
      |  WHERE n.id = c.id AND n.o = c.o
      |    AND n.y = greatest(least(c.y + wy.d, 15), 0)
      |    AND n.x = greatest(least(c.x + wx.d, 15), 0)
      |  GROUP BY 1, 2, 3, 4),
      |pts(pt, lvl, sx, sy) AS (VALUES
      |  (0, 1, 8, 8),
      |  (1, 1, 10, 8), (2, 1, 8, 10), (3, 1, 6, 8), (4, 1, 8, 6),
      |  (5, 2, 12, 8), (6, 2, 8, 12), (7, 2, 4, 8), (8, 2, 8, 4)),
      |vals AS (
      |  SELECT s.id AS id, p.pt AS pt, s.o AS o, s.v AS v
      |  FROM pts p, s1 s WHERE p.lvl = 1 AND s.y = p.sy AND s.x = p.sx
      |  UNION ALL
      |  SELECT s.id AS id, p.pt AS pt, s.o AS o, s.v AS v
      |  FROM pts p, s2 s WHERE p.lvl = 2 AND s.y = p.sy AND s.x = p.sx),
      |nrm AS (SELECT id, pt, sum(v*v) AS ss FROM vals GROUP BY 1, 2)
      |SELECT v.id AS id, CAST(v.pt AS BIGINT) AS point, CAST(v.o AS BIGINT) AS orient,
      |  round(CAST(v.v AS DOUBLE) / (sqrt(CAST(n.ss AS DOUBLE)) + 1e-12), 6) AS val
      |FROM vals v JOIN nrm n ON v.id = n.id AND v.pt = n.pt
      |ORDER BY id, point, orient""".stripMargin

  /** Dense SIFT (ref: SIFTExtractor — the formerly JNI-only §2.A row,
    * re-expressed as pure-JVM math in [[ImageOps.sift]]) over 20
    * synthetic 16×16×1 images: one 16×16 patch per image → 4×4 spatial
    * cells × 8 SIGNED orientation bins = the canonical 128-dim
    * descriptor. The oracle replays the extractor's exact IEEE steps
    * from the pixel formula: clamped central differences on pre-rounded
    * /255.0 doubles, signed atan2 folded into [0, 2π) AFTER the half-bin
    * (+π/8) offset — bin boundaries at odd multiples of π/8 so the
    * |gx|=|gy| diagonals sit at bin CENTERS, never within an atan2 ulp
    * of an edge — integer tent-window weights applied in one double
    * multiply, and Lowe's normalize → clip(0.2) → renormalize with the
    * +1e-12 guards in identical order. 224 of the 2560 output
    * components exceed 0.2 post-renormalization, so the clip stage is
    * genuinely exercised by the gate, not just present. */
  def qImageSift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val imgs = ImageOps.syntheticImages(spark, n = 20, x = 16, y = 16, c = 1)
      .as[ImageOps.Img]
    ImageOps.sift(imgs, patch = 16, step = 16, cells = 4, bins = 8).toDF()
      .select($"id", posexplode($"image").as(Seq("i", "raw")))
      .select($"id",
        floor($"i" / 8).cast("long").as("cell"),
        ($"i" % 8).cast("long").as("bin"),
        round($"raw", 6).as("val"))
      .orderBy($"id", $"cell", $"bin")
  }

  val imageSiftSql: String =
    """WITH grad AS (
      |  SELECT t.id AS id, y.y AS y, x.x AS x,
      |    CAST((t.id*31 + (y.y*16 + CASE WHEN x.x = 15 THEN x.x ELSE x.x + 1 END)*7) % 256 AS DOUBLE)/255.0
      |    - CAST((t.id*31 + (y.y*16 + CASE WHEN x.x = 0 THEN x.x ELSE x.x - 1 END)*7) % 256 AS DOUBLE)/255.0 AS gx,
      |    CAST((t.id*31 + ((CASE WHEN y.y = 15 THEN y.y ELSE y.y + 1 END)*16 + x.x)*7) % 256 AS DOUBLE)/255.0
      |    - CAST((t.id*31 + ((CASE WHEN y.y = 0 THEN y.y ELSE y.y - 1 END)*16 + x.x)*7) % 256 AS DOUBLE)/255.0 AS gy
      |  FROM range(0, 20) t(id), range(0, 16) y(y), range(0, 16) x(x)),
      |votes AS (
      |  SELECT id, (y//4)*4 + x//4 AS cell,
      |    least(CAST(floor(
      |      (CASE WHEN atan2(gy, gx) + pi()/8 < 0 THEN atan2(gy, gx) + pi()/8 + 2*pi()
      |            ELSE atan2(gy, gx) + pi()/8 END) / (2*pi()) * 8) AS BIGINT), 7) AS bin,
      |    sqrt(gx*gx + gy*gy)
      |      * CAST((least(x, 15 - x) + 1) * (least(y, 15 - y) + 1) AS DOUBLE) AS v
      |  FROM grad WHERE sqrt(gx*gx + gy*gy) > 0),
      |acc AS (SELECT id, cell, bin, sum(v) AS v FROM votes GROUP BY id, cell, bin),
      |n1 AS (SELECT id, sqrt(sum(v*v)) + 1e-12 AS n FROM acc GROUP BY id),
      |grid AS (
      |  SELECT t.id AS id, c.c AS cell, b.b AS bin
      |  FROM range(0, 20) t(id), range(0, 16) c(c), range(0, 8) b(b)),
      |u AS (
      |  SELECT g.id AS id, g.cell AS cell, g.bin AS bin,
      |    least(coalesce(a.v, 0.0) / n1.n, 0.2) AS u
      |  FROM grid g
      |  JOIN n1 ON n1.id = g.id
      |  LEFT JOIN acc a ON a.id = g.id AND a.cell = g.cell AND a.bin = g.bin),
      |n2 AS (SELECT id, sqrt(sum(u*u)) + 1e-12 AS n FROM u GROUP BY id)
      |SELECT u.id AS id, CAST(u.cell AS BIGINT) AS cell,
      |  CAST(u.bin AS BIGINT) AS bin, round(u.u / n2.n, 6) AS val
      |FROM u JOIN n2 ON n2.id = u.id
      |ORDER BY id, cell, bin""".stripMargin

  /** Random flip + brightness jitter (ref: RandomImageTransformer — the
    * last §2.A image row outside the gate) over 20 synthetic 4×4×2
    * images. The "randomness" is [[ImageOps.randomTransform]]'s keyed
    * md5 digest, so the oracle replays the exact flip decision and
    * brightness factor per image id: even digest → horizontal mirror;
    * factor = 1 + (digest mod 11 − 5)/100. */
  def qImageFlipJitter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val imgs = ImageOps.syntheticImages(spark, n = 20, x = 4, y = 4, c = 2)
    ImageOps.randomTransform(imgs)
      .select($"id", posexplode($"image").as(Seq("i", "raw")))
      .select($"id",
        floor($"i" / 8).cast("long").as("py"),
        (floor($"i" / 2) % 4).cast("long").as("px"),
        ($"i" % 2).cast("long").as("ch"),
        round($"raw", 6).as("val"))
      .orderBy($"id", $"py", $"px", $"ch")
  }

  val imageFlipJitterSql: String =
    """WITH d AS (
      |  SELECT t.id AS id,
      |    CAST('0x' || substr(md5(CAST(t.id AS VARCHAR)), 1, 15) AS BIGINT) AS dg
      |  FROM range(0, 20) t(id)),
      |px AS (
      |  SELECT d.id AS id, py.py AS py, px.px AS px, c.c AS ch,
      |    CASE WHEN dg % 2 = 0
      |      THEN CAST((d.id*31 + ((py.py*4 + (3 - px.px))*2 + c.c)*7) % 256 AS DOUBLE)/255.0
      |      ELSE CAST((d.id*31 + ((py.py*4 + px.px)*2 + c.c)*7) % 256 AS DOUBLE)/255.0
      |    END * (1.0 + CAST(dg % 11 - 5 AS DOUBLE)/100.0) AS v
      |  FROM d, range(0, 4) py(py), range(0, 4) px(px), range(0, 2) c(c))
      |SELECT id, py, px, ch, round(v, 6) AS val
      |FROM px ORDER BY id, py, px, ch""".stripMargin

  // ------------------------------------------------- multimodal binary path

  /** Multimodal resize in the gate: 8 synthetic binary image assets
    * ([[MultimodalOps.syntheticAssets]]: byte(i) of asset `id` is
    * (id·131 + i·17) mod 256) run the REAL binary pipeline — opaque
    * `binary` column → [[MultimodalOps.decodeStub]] (the per-partition
    * decode seam) → [[MultimodalOps.resizeAvgPool]] — and the oracle
    * recomputes every output pixel from the byte formula alone. The gate
    * therefore proves the binary plumbing (schema, byte addressing, decode
    * batching, pooled resize) computes exactly what the math says. */
  def qMultimodalResize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val assets = MultimodalOps.syntheticAssets(spark, n = 8, x = 8, y = 8,
      c = 1, frames = 1)
    val rs = MultimodalOps.resizeAvgPool(MultimodalOps.decodeStub(assets).toDF(),
      factor = 2)
    rs.select($"id", posexplode($"image").as(Seq("i", "raw")))
      .select($"id",
        floor($"i" / 4).cast("long").as("py"),
        ($"i" % 4).cast("long").as("px"),
        round($"raw", 6).as("val"))
      .orderBy($"id", $"py", $"px")
  }

  val multimodalResizeSql: String =
    """WITH base AS (
      |  SELECT t.id AS id, py.py AS py, px.px AS px,
      |    CAST((t.id*131 + ((py.py*2  )*8 + px.px*2  )*17) % 256 AS DOUBLE)/255.0 AS v00,
      |    CAST((t.id*131 + ((py.py*2  )*8 + px.px*2+1)*17) % 256 AS DOUBLE)/255.0 AS v01,
      |    CAST((t.id*131 + ((py.py*2+1)*8 + px.px*2  )*17) % 256 AS DOUBLE)/255.0 AS v10,
      |    CAST((t.id*131 + ((py.py*2+1)*8 + px.px*2+1)*17) % 256 AS DOUBLE)/255.0 AS v11
      |  FROM range(0, 8) t(id), range(0, 4) py(py), range(0, 4) px(px))
      |SELECT id, py, px, round((v00 + v01 + v10 + v11) / 4.0, 6) AS val
      |FROM base ORDER BY id, py, px""".stripMargin

  /** Multimodal video frame sampling in the gate: 8 synthetic 6-frame
    * binary "videos" → [[MultimodalOps.frameSample]] (byte-slicing every
    * 2nd frame out of the binary column — no decode needed to split work
    * by frame) → decode → per-frame stats. The asset/frame composite key
    * is packed into the decode id (asset·10 + frame) and unpacked after,
    * exactly how a production pipeline threads frame identity through a
    * codec that only sees one blob. */
  def qMultimodalFrames(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val assets = MultimodalOps.syntheticAssets(spark, n = 8, x = 4, y = 4,
      c = 1, frames = 6)
    val frames = MultimodalOps.frameSample(assets, step = 2)
      .withColumn("asset_id", $"asset_id" * 10 + $"frame_id")
    MultimodalOps.decodeStub(frames).toDF()
      .select(
        floor($"id" / 10).cast("long").as("asset_id"),
        ($"id" % 10).cast("long").as("frame_id"),
        round(aggregate($"image", lit(0.0), (a, v) => a + v) / 16.0, 6).as("mean_px"),
        round(array_max($"image"), 6).as("max_px"))
      .orderBy($"asset_id", $"frame_id")
  }

  val multimodalFramesSql: String =
    """WITH f AS (
      |  SELECT a.id AS asset_id, fr.f AS frame_id
      |  FROM range(0, 8) a(id), (VALUES (0), (2), (4)) fr(f)),
      |s AS (
      |  SELECT asset_id, CAST(frame_id AS BIGINT) AS frame_id,
      |    list_transform(range(0, 16), i ->
      |      CAST((asset_id*131 + (frame_id*16 + i)*17) % 256 AS DOUBLE)/255.0) AS v
      |  FROM f)
      |SELECT asset_id, frame_id,
      |  round(list_sum(v) / 16.0, 6) AS mean_px,
      |  round(list_max(v), 6) AS max_px
      |FROM s ORDER BY asset_id, frame_id""".stripMargin

  /** REAL codec decode in the gate (ref: loaders/ImageNetLoader +
    * ImageLoaderUtils): 20 formula images are PNG-encoded with
    * `javax.imageio` on executors ([[MultimodalOps.encodedAssets]]), then
    * decoded back through the real codec ([[MultimodalOps.decodeImage]]).
    * PNG is lossless, so the decoded bytes reproduce the formula exactly
    * and the oracle verifies every pixel with pure arithmetic — what's
    * under test is the encode→compress→decode round trip plus the decoded
    * row-major interleaved-RGB layout contract. */
  def qImageDecodeReal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val assets = MultimodalOps.encodedAssets(spark, n = 20, x = 8, y = 8)
    MultimodalOps.decodeImage(assets).toDF()
      .select($"id", posexplode($"image").as(Seq("i", "raw")))
      .select($"id",
        floor($"i" / 3).cast("long").as("pixel"),
        ($"i" % 3).cast("long").as("ch"),
        round($"raw", 6).as("val"))
      .orderBy($"id", $"pixel", $"ch")
  }

  val imageDecodeRealSql: String =
    """SELECT t.id AS id, p.p AS pixel, c.c AS ch,
      |  round(CAST((t.id*31 + (p.p*3 + c.c)*7) % 256 AS DOUBLE)/255.0, 6) AS val
      |FROM range(0, 20) t(id), range(0, 64) p(p), range(0, 3) c(c)
      |ORDER BY id, pixel, ch""".stripMargin

  /** REAL audio-codec decode in the gate: 10 formula PCM16 clips are
    * WAV-encoded with `javax.sound.sampled` on executors
    * ([[MultimodalOps.encodedWavAssets]]), then decoded back through the
    * real codec ([[MultimodalOps.decodeWav]]). WAV is containerized raw
    * PCM (lossless), so the oracle verifies every decoded sample with
    * pure integer arithmetic — the audio twin of [[qImageDecodeReal]],
    * closing the audio modality with a real JDK codec. */
  def qAudioDecodeReal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val assets = MultimodalOps.encodedWavAssets(spark, n = 10, nSamples = 64)
    MultimodalOps.decodeWav(assets).toDF()
      .select($"id", posexplode($"samples").as(Seq("i", "sample")))
      .orderBy($"id", $"i")
  }

  val audioDecodeRealSql: String =
    """SELECT t.id AS id, CAST(s.s AS INT) AS i,
      |  CAST((t.id*31 + s.s*7) % 65536 - 32768 AS INT) AS sample
      |FROM range(0, 10) t(id), range(0, 64) s(s)
      |ORDER BY id, i""".stripMargin

  /** Binary-asset exact dedup: group multimodal assets by the md5 of the
    * raw `binary` content column — the first pass of any multimodal
    * curation pipeline (identical images/videos re-crawled under
    * different ids). The Spark side digests REAL bytes; the oracle derives
    * the same truth from the generator's period ([[MultimodalOps
    * .syntheticAssets]] content is `(id·131 + i·17) mod 256` per byte and
    * 131 is invertible mod 256, so assets collide exactly when
    * `id ≡ id' (mod 256)`). n = 640 assets → 256 groups of 2–3 copies.
    *
    * Scale shape: digest is the shuffle key (binary payloads never
    * shuffle whole — only the 16-byte digest plus ids), min-id keep rule,
    * same discipline as the text-side exact dedup. */
  def qAssetDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val assets = MultimodalOps.syntheticAssets(spark, n = 640, x = 4, y = 4,
      c = 1, frames = 1)
    assets
      .groupBy(md5($"content").as("h"))
      .agg(min($"asset_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select($"keep_id", $"n_copies")
      .orderBy($"keep_id")
  }

  val assetDedupSql: String =
    """WITH a AS (SELECT unnest(range(0, 640)) AS asset_id),
      |g AS (SELECT asset_id, (asset_id * 131) % 256 AS grp FROM a)
      |SELECT CAST(min(asset_id) AS BIGINT) AS keep_id,
      |  count(*) AS n_copies
      |FROM g GROUP BY grp ORDER BY keep_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asset_dedup" -> (qAssetDedup _),
    "q_multimodal_resize" -> (qMultimodalResize _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_image_decode_real" -> (qImageDecodeReal _),
    "q_audio_decode_real" -> (qAudioDecodeReal _),
    "q_image_pool" -> (qImagePool _),
    "q_image_grayscale_rectify" -> (qImageGrayscaleRectify _),
    "q_image_crop_window" -> (qImageCropWindow _),
    "q_image_convolve" -> (qImageConvolve _),
    "q_image_lcs" -> (qImageLcs _),
    "q_image_hog" -> (qImageHog _),
    "q_image_daisy" -> (qImageDaisy _),
    "q_image_sift" -> (qImageSift _),
    "q_image_flip_jitter" -> (qImageFlipJitter _),
    "q_image_fisher_vector" -> (qImageFisherVector _))

  val oracle: Map[String, String] = Map(
    "q_asset_dedup" -> assetDedupSql,
    "q_multimodal_resize" -> multimodalResizeSql,
    "q_multimodal_frames" -> multimodalFramesSql,
    "q_image_decode_real" -> imageDecodeRealSql,
    "q_audio_decode_real" -> audioDecodeRealSql,
    "q_image_pool" -> imagePoolSql,
    "q_image_grayscale_rectify" -> imageGrayscaleRectifySql,
    "q_image_crop_window" -> imageCropWindowSql,
    "q_image_convolve" -> imageConvolveSql,
    "q_image_lcs" -> imageLcsSql,
    "q_image_hog" -> imageHogSql,
    "q_image_daisy" -> imageDaisySql,
    "q_image_sift" -> imageSiftSql,
    "q_image_flip_jitter" -> imageFlipJitterSql,
    "q_image_fisher_vector" -> imageFisherVectorSql)
}
