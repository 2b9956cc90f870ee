package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal

/** The lossy-codec tolerance path: baseline JPEG encoded through
  * javax.imageio, decoded back through BOTH decode paths — the
  * from-scratch fused kernel ([[graft.functions.JpegDecode]], what the
  * gate rides) and the batched ImageIO seam (the independent
  * cross-decoder) — judged against the pre-encode raster. The POINT of
  * the tolerance design: decode output is implementation-defined (IDCT
  * rounding, chroma upsampling), so the gate pins in-band booleans, not
  * values — this spec pins the bound itself tight enough that a broken
  * decode (wrong channel order, off-by-one geometry, garbage) cannot
  * hide inside it, for EACH path.
  */
class JpegToleranceSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toSeq
      .map { case (id, t) => (id, t, t.length.toLong, "web", "en") }
      .toDF("doc_id", "text", "n_chars", "source", "lang")

  // both decode paths behind one signature: every pinned bound below
  // holds for the fused kernel AND the ImageIO seam
  private val paths: Seq[(String, (DataFrame, Double, Double) => DataFrame)] = Seq(
    "fused" -> ((m, mean, mae) => Multimodal.decodeJpegFused(m, mean, mae)),
    "imageio" -> ((m, mean, mae) => Multimodal.decodeJpegBatched(spark, m, mean, mae)))

  test("measured decode error on md5-hex rasters stays well inside the gate band") {
    // 40 good docs (ids chosen to dodge the %3/%7 bad-row mix)
    val ids = (0L until 200L).filter(i => i % 3 != 2 && i % 7 != 3).take(40)
    val docs = docsDf(ids.map(i => i -> s"document body $i with some text"): _*)
    val media = Multimodal.mediaTableJpeg(spark, docs).cache()
    for ((label, decode) <- paths) {
      // judge at STRICTER bounds than the gate's (3.0 mean / 48 MAE):
      // measured on period-33 md5-hex rasters at quality 0.97, |mean err|
      // tops out at ~1.0 here and 1.64 across the 285,714-image sf10
      // corpus; per-channel MAE at ~30 here and 40.4 at sf10 (4:2:0
      // chroma on noise — the gate's 48 carries the measured tail's
      // headroom and stays far under uniform-noise ~85)
      val strict = decode(media, 1.5, 34.0)
        .where(col("in_band_r") && col("in_band_g") && col("in_band_b") &&
          col("in_band_mae"))
        .count()
      assert(strict === 40L,
        s"[$label] quality-0.97 baseline JPEG must hold |mean err| <= 1.5 and MAE <= 34")
      // and a SHIFTED raster must fail the gate band (measured mean diff
      // ~29 vs the 3.0 band): the judge really compares pixels — a judge
      // that always says true cannot pass this
      val shifted = media.withColumn(
        "expected_px",
        when(col("expected_px").isNotNull,
          translate(col("expected_px"), "0123456789abcdef", "ffffffffffffffff"))
          .otherwise(col("expected_px")))
      val fooled = decode(shifted, 3.0, 40.0).where(col("in_band_r")).count()
      assert(fooled === 0L, s"[$label]")
      // a channel-order bug must flip booleans across the population: judge
      // decoded R against expected G by rotating the raster one char left
      val rotated = media.withColumn(
        "expected_px",
        when(col("expected_px").isNotNull,
          concat(expr("substring(expected_px, 2)"),
            expr("substring(expected_px, 1, 1)")))
          .otherwise(col("expected_px")))
      val swapped = decode(rotated, 3.0, 40.0)
        .where(!col("in_band_r") || !col("in_band_g") || !col("in_band_b"))
        .count()
      assert(swapped > 10L,
        s"[$label] a channel-order mismatch must flip mean-band booleans on most rows")
    }
    media.unpersist()
  }

  test("progressive streams hold the same strict bands; a shifted raster still fails") {
    // the q_multimodal_jpeg_prog gate's discriminating power, pinned the
    // same way as the baseline's: real multi-scan SOF2 payloads decode
    // inside the STRICT bands, and a shifted expected raster flips the
    // mean band on every row
    val ids = (0L until 200L).filter(i => i % 3 != 2 && i % 7 != 3).take(30)
    val docs = docsDf(ids.map(i => i -> s"progressive body $i with text"): _*)
    val media = Multimodal.mediaTableJpeg(spark, docs, progressive = true).cache()
    val strict = Multimodal.decodeJpegFused(media, 1.5, 34.0)
      .where(col("in_band_r") && col("in_band_g") && col("in_band_b") &&
        col("in_band_mae"))
      .count()
    assert(strict === 30L,
      "progressive decode must hold the baseline's strict bands")
    val shifted = media.withColumn(
      "expected_px",
      when(col("expected_px").isNotNull,
        translate(col("expected_px"), "0123456789abcdef", "ffffffffffffffff"))
        .otherwise(col("expected_px")))
    val fooled = Multimodal.decodeJpegFused(shifted, 3.0, 40.0)
      .where(col("in_band_r")).count()
    assert(fooled === 0L)
    media.unpersist()
  }

  test("the two decode paths agree row-for-row at the gate's bands") {
    // interchangeability behind the gate: same media, same bands, same
    // booleans and geometry from the from-scratch kernel and ImageIO
    val ids = (0L until 120L).take(60)
    val docs = docsDf(ids.map(i => i -> s"body $i for the parity check"): _*)
    val media = Multimodal.mediaTableJpeg(spark, docs).cache()
    val a = Multimodal.decodeJpegFused(media, 3.0, 48.0).orderBy("media_id").collect()
    val b = Multimodal.decodeJpegBatched(spark, media, 3.0, 48.0).orderBy("media_id").collect()
    media.unpersist()
    assert(a.length === b.length)
    (a zip b).foreach { case (x, y) => assert(x === y) }
  }

  test("geometry is exact; bad rows (raw text, corrupt magic) are null") {
    val docs = docsDf(
      0L -> "good row zero", // good: w=8, h by n_chars
      2L -> "raw text row",  // %3==2
      3L -> "corrupt magic")  // %7==3
    for ((label, decode) <- paths) {
      val out = decode(Multimodal.mediaTableJpeg(spark, docs), 3.0, 40.0)
        .orderBy("media_id").collect()
      val good = out(0)
      assert(good.getInt(1) === (0 % 9 + 8), s"[$label]")
      assert(good.getInt(2) === ("good row zero".length % 7 + 8), s"[$label]")
      assert(good.getLong(3) === good.getInt(1).toLong * good.getInt(2), s"[$label]")
      assert(out(1).isNullAt(1) && out(1).isNullAt(4), s"[$label]")
      assert(out(2).isNullAt(1) && out(2).isNullAt(4), s"[$label]")
    }
  }

  test("truncated JPEG never throws on either path; the fused kernel nulls strictly") {
    val docs = docsDf(0L -> "will be truncated")
    val media = Multimodal.mediaTableJpeg(spark, docs)
      .withColumn("payload", expr("substring(payload, 1, 40)"))
    // ImageIO either refuses (null row) or decodes partially (booleans
    // judge it); the fused kernel's contract is strict null — both are
    // fine, throwing is not
    val iio = Multimodal.decodeJpegBatched(spark, media, 3.0, 40.0).collect()
    assert(iio.length === 1)
    val fused = Multimodal.decodeJpegFused(media, 3.0, 40.0).collect()
    assert(fused.length === 1)
    assert(fused(0).isNullAt(1), "truncated payload must null on the strict kernel")
  }
}
