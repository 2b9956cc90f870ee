package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal

/** The lossy-codec tolerance path: baseline JPEG encoded through
  * javax.imageio, decoded back through javax.imageio on the batched
  * seam, judged against the pre-encode raster. The POINT of the
  * tolerance design: decode output is implementation-defined (IDCT
  * rounding, chroma upsampling), so the gate pins in-band booleans, not
  * values — this spec pins the bound itself tight enough that a broken
  * decode (wrong channel order, off-by-one geometry, garbage) cannot
  * hide inside it.
  */
class JpegToleranceSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toSeq
      .map { case (id, t) => (id, t, t.length.toLong, "web", "en") }
      .toDF("doc_id", "text", "n_chars", "source", "lang")

  test("measured decode error on md5-hex rasters stays well inside the gate band") {
    // 40 good docs (ids chosen to dodge the %3/%7 bad-row mix)
    val ids = (0L until 200L).filter(i => i % 3 != 2 && i % 7 != 3).take(40)
    val docs = docsDf(ids.map(i => i -> s"document body $i with some text"): _*)
    val media = Multimodal.mediaTableJpeg(spark, docs)
    // judge at STRICTER bounds than the gate's (3.0 mean / 48 MAE):
    // measured on period-33 md5-hex rasters at quality 0.97, |mean err|
    // tops out at ~1.0 here and 1.64 across the 285,714-image sf10
    // corpus; per-channel MAE at ~30 here and 40.4 at sf10 (4:2:0
    // chroma subsampling on noise — the gate's 48 carries the measured
    // tail's headroom and stays far under uniform-noise ~85)
    val strict = Multimodal.decodeJpegBatched(spark, media, 1.5, 34.0)
      .where(col("in_band_r") && col("in_band_g") && col("in_band_b") &&
        col("in_band_mae"))
      .count()
    assert(strict === 40L,
      "quality-0.97 baseline JPEG must hold |mean err| <= 1.5 and MAE <= 34")
    // and a SHIFTED raster must fail the gate band (measured mean diff
    // ~29 vs the 3.0 band): the judge really compares pixels — a judge
    // that always says true cannot pass this
    val shifted = media.withColumn(
      "expected_px",
      when(col("expected_px").isNotNull,
        translate(col("expected_px"), "0123456789abcdef", "ffffffffffffffff"))
        .otherwise(col("expected_px")))
    val fooled = Multimodal.decodeJpegBatched(spark, shifted, 3.0, 40.0)
      .where(col("in_band_r")).count()
    assert(fooled === 0L)
    // a channel-order bug must flip booleans across the population: judge
    // decoded R against expected G by rotating the raster one char left
    val rotated = media.withColumn(
      "expected_px",
      when(col("expected_px").isNotNull,
        concat(expr("substring(expected_px, 2)"),
          expr("substring(expected_px, 1, 1)")))
        .otherwise(col("expected_px")))
    val swapped = Multimodal.decodeJpegBatched(spark, rotated, 3.0, 40.0)
      .where(!col("in_band_r") || !col("in_band_g") || !col("in_band_b"))
      .count()
    assert(swapped > 10L,
      "a channel-order mismatch must flip mean-band booleans on most rows")
  }

  test("geometry is exact; bad rows (raw text, corrupt magic) are null") {
    val docs = docsDf(
      0L -> "good row zero", // good: w=8, h by n_chars
      2L -> "raw text row",  // %3==2
      3L -> "corrupt magic")  // %7==3
    val out = Multimodal.decodeJpegBatched(
      spark, Multimodal.mediaTableJpeg(spark, docs), 3.0, 40.0)
      .orderBy("media_id").collect()
    val good = out(0)
    assert(good.getInt(1) === (0 % 9 + 8))
    assert(good.getInt(2) === ("good row zero".length % 7 + 8))
    assert(good.getLong(3) === good.getInt(1).toLong * good.getInt(2))
    assert(out(1).isNullAt(1) && out(1).isNullAt(4))
    assert(out(2).isNullAt(1) && out(2).isNullAt(4))
  }

  test("truncated JPEG never throws on the batched seam") {
    val docs = docsDf(0L -> "will be truncated")
    val media = Multimodal.mediaTableJpeg(spark, docs)
      .withColumn("payload", expr("substring(payload, 1, 40)"))
    val out = Multimodal.decodeJpegBatched(spark, media, 3.0, 40.0).collect()
    // ImageIO either refuses (null row) or decodes partially (booleans
    // judge it); both are fine — throwing is not
    assert(out.length === 1)
  }
}
