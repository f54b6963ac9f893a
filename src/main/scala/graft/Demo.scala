package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.{BitplaneCompress, Refine}
import graft.sources.VecFiles

/**
 * CLI single-run entry path (the reference's primary UX: `main`,
 * `/root/reference/ANNCode.py:793-878`): load or synthesize DB/Q, run one
 * refinement mode, print the reference-style report — recall@K,
 * bandwidth-saving %, FPR %, and (with `--compress`) measured compressed
 * bytes per reduced vector.
 *
 * Flags mirror the reference CLI:
 * {{{
 * --mode cos-hoeff|cos-l1|cos-l2|l2-tz|l2-sym|l2-hoeff   (default cos-hoeff)
 * --k 20  --keep 6  --ekeep 5  --delta 0.7  --maxrows 100000
 * --db <path.vec|.fvecs|header-bin>   --q <path>   --compress <zlib level>
 * --quant fp16|int8|sq4  --qscale 4  (int8/sq4: scalar-quantized cheap
 *                                   copy at 8 or 4 bits per component,
 *                                   engine extension beyond the reference)
 * }}}
 * Without `--db`, synthesizes the seeded Gaussian demo corpus
 * (N=2000, D=128, Qn=30 — `ANNCode.py:816-822`). Loaded matrices get the
 * reference's precision prep (`ANNCode.py:825-828`): the full-precision
 * side is the fp16 round-trip of the raw values, the reduced copy and
 * delta derive from the raw values.
 */
object Demo {

  private val Known = Set("mode", "k", "keep", "ekeep", "delta", "maxrows",
    "db", "q", "compress", "n", "d", "quant", "qscale")

  private def parse(args: Array[String]): Map[String, String] = {
    require(args.length % 2 == 0,
      s"flags come in --key value pairs, got: ${args.mkString(" ")}")
    args.sliding(2, 2).map {
      case Array(k, v) =>
        require(k.startsWith("--") && Known(k.drop(2)), s"unknown flag $k")
        k.drop(2) -> v
    }.toMap
  }

  /** (id, vec) -> the engine's refine schema (id, vec, rvec, delta).
    * The DATA reduction always keeps the full exponent (keepE = 5, like
    * the reference ANNCode.py:827 and every fixture producer here):
    * [[VectorOps.deltaVec]]'s error bound is only valid for full-exponent
    * reductions — `--ekeep` affects the modeled bytes, never the data. */
  private def prep(raw: DataFrame, keepM: Int): DataFrame =
    raw.select(col("id"),
      VectorOps.fp16RoundTrip(col("vec")).as("vec"),
      VectorOps.reduceVec(col("vec"), 5, keepM).as("rvec"),
      VectorOps.deltaVec(col("vec"), keepM).as("delta"))

  def main(args: Array[String]): Unit = {
    val a = parse(args)
    val mode = a.getOrElse("mode", "cos-hoeff").replace('-', '_')
    val p = Refine.Params(mode,
      k = a.getOrElse("k", "20").toInt,
      keepM = a.getOrElse("keep", "6").toInt,
      keepE = a.getOrElse("ekeep", "5").toInt,
      delta = a.getOrElse("delta", "0.7").toDouble)
    val maxRows = a.getOrElse("maxrows", "100000").toInt
    // --quant int8 [--qscale j]: swap the fp16-truncation cheap copy for
    // the int8 scalar-quantization rung (dequantized codes k/2^j +
    // constant half-step bound — Fixture.int8Vectors). Every cushion
    // consumes an arbitrary element-wise bound EXCEPT l2-tz, whose
    // sign-aware per-coordinate bound assumes a truncated-toward-zero
    // copy (|rv| <= |v|, same sign) — rounding-to-nearest breaks both.
    val quant = a.getOrElse("quant", "fp16")
    require(Set("fp16", "int8", "sq4")(quant), s"unknown --quant $quant")
    require(quant == "fp16" || mode != "l2_tz",
      s"--quant $quant is incompatible with --mode l2-tz (the sign-aware " +
        "bound assumes a truncated copy); use l2-sym or l2-hoeff")
    require(quant == "fp16" || !a.contains("compress"),
      s"--compress models the fp16 bit-plane layout; undefined for --quant $quant")
    val qscale = a.getOrElse("qscale", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    // adopt a live session when one exists (embedded use: tests, REPLs,
    // notebooks) and only stop what we created — a CLI that kills its
    // host's SparkContext on exit is not embeddable
    val inherited = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .exists(s => !s.sparkContext.isStopped)
    // an inherited session is reused AS-IS: getOrCreate() applies
    // builder .config() runtime confs to an existing session, so routing
    // the inherited case through the configured builder would silently
    // rewrite the host's shuffle.partitions — the opposite of "leave the
    // host session untouched"
    val spark =
      if (inherited) SparkSession.builder().getOrCreate()
      else SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (v0, q, d) = a.get("db") match {
      case Some(db) =>
        // probe d BEFORE the subsample's keyed global sort (one cheap
        // unsorted limit(1), not a full sort pass), and fail with the
        // file name on empty input
        val loaded = VecFiles.readMatrix(spark, db)
        val head = loaded.select(size(col("vec"))).limit(1).collect()
        require(head.nonEmpty, s"--db $db contains no vector rows")
        val d = head(0).getInt(0)
        val vv = prep(VecFiles.subsample(loaded, maxRows), p.keepM)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // --q loads a query matrix; otherwise take the reference demo's
        // Qn=30 from the database side (smallest ids, like the fixtures)
        val qq = a.get("q") match {
          case Some(qp) => prep(VecFiles.subsample(
            VecFiles.readMatrix(spark, qp), maxRows), p.keepM)
            .select(col("id").as("qid"), col("vec").as("qvec"))
          case None => Fixture.queries(vv, 30).select(col("qid"), col("qvec"))
        }
        (vv, qq, d)
      case None =>
        val n = a.getOrElse("n", "2000").toInt
        val d = a.getOrElse("d", "128").toInt
        val vv = Fixture.gaussianVectors(spark, n, d, p.keepM)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (vv, Fixture.queries(vv, 30).select(col("qid"), col("qvec")), d)
    }

    val v =
      if (quant == "fp16") v0
      else {
        // int8 (|code| <= 127) or the 4-bit rung (16 levels, |code| <= 7
        // — the half-step bound is only valid when nothing clamps)
        val codeMax = if (quant == "sq4") 7.5 else 127.5
        val vq =
          if (quant == "sq4")
            Fixture.sq4Vectors(v0.select(col("id"), col("vec")), qscale)
          else Fixture.int8Vectors(v0.select(col("id"), col("vec")), qscale)
        // fail loudly if the data outruns the code range at this scale
        // instead of silently clipping semantics
        val maxAbsRv = vq.select(max(expr(
          "aggregate(vec, CAST(0.0 AS DOUBLE), (acc, x) -> " +
            "greatest(acc, abs(CAST(x AS DOUBLE))))"))).first().getDouble(0)
        require(maxAbsRv * (1 << qscale) <= codeMax,
          f"--qscale $qscale overflows $quant codes (max |code| = " +
            f"${maxAbsRv * (1 << qscale)}%.0f); lower --qscale")
        vq
      }

    // §4.3 composition: measured compressed reduced-page bytes replace the
    // modeled bit count in the saving (reference red_bytes_override);
    // for the int8 rung the model is its own 1 byte per component
    val redOverride = a.get("compress").map { lvl =>
      BitplaneCompress.measure(v.select(col("id"), col("vec")), d,
        p.keepE, p.keepM, level = lvl.toInt).first().getDouble(4)
    }.orElse(quant match {
      case "int8" => Some(d * 1.0)       // 1 byte per component
      case "sq4"  => Some(d * 0.5)       // two 4-bit codes per byte
      case _      => None
    })

    val row = Refine.metrics(v, q, p, d, redBytesOverride = redOverride).first()
    val (recall, save, fpr) =
      (row.getDouble(3), row.getDouble(4), row.getDouble(5))
    // the reference's stdout report shape (ANNCode.py:864-867)
    println(f"mode=$mode recall@${p.k}=$recall%.4f save=${save * 100}%.2f%% " +
      f"fpr=${fpr * 100}%.2f%%" +
      (if (quant != "fp16") s" quant=$quant/2^$qscale" else "") +
      redOverride.map(b => f" reduced_bytes_per_vec=$b%.2f").getOrElse(""))
    if (!inherited) spark.stop()
  }
}
