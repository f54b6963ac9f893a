package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/**
 * End-to-end test of the CLI entry path ([[Demo]], the reference's
 * primary UX — `ANNCode.py:793-878`): drive `main` the way a user would
 * (`--db` over a `.vec` file; `--compress`; the synthetic default) and
 * assert the stdout report. A regression here is invisible to the
 * oracle surface, which never goes through `main`.
 */
class DemoSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(args: String*): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
      Demo.main(args.toArray)
    }
    bos.toString("UTF-8")
  }

  private def writeVecFile(n: Int, d: Int): java.nio.file.Path = {
    val f = java.nio.file.Files.createTempFile("demo_db_", ".vec")
    val rnd = new scala.util.Random(7)
    val sb = new StringBuilder(s"$n $d\n")
    (0 until n).foreach { i =>
      sb.append(s"w$i")
      (0 until d).foreach(_ =>
        sb.append(f" ${rnd.nextDouble() * 2 - 1}%.4f"))
      sb.append("\n")
    }
    java.nio.file.Files.writeString(f, sb.toString)
    f
  }

  test("demo CLI over a .vec file prints the reference report and spares the host session") {
    spark.sparkContext // force a live session for main to adopt
    val f = writeVecFile(n = 60, d = 6)
    try {
      val out = run("--db", f.toString, "--mode", "cos-l2", "--k", "5")
      // zero-miss mode: recall is exactly 1
      assert(out.contains("mode=cos_l2 recall@5=1.0000"), s"report line wrong:\n$out")
      assert("save=-?\\d+\\.\\d+%".r.findFirstIn(out).nonEmpty, s"no save%:\n$out")
      assert("fpr=\\d+\\.\\d+%".r.findFirstIn(out).nonEmpty, s"no fpr%:\n$out")
      assert(!spark.sparkContext.isStopped,
        "Demo.main stopped the caller's SparkContext")

      val out2 = run("--db", f.toString, "--mode", "l2-tz", "--k", "5",
        "--compress", "6")
      assert(out2.contains("mode=l2_tz recall@5=1.0000"), s"report line wrong:\n$out2")
      assert(out2.contains("reduced_bytes_per_vec="), s"no compress report:\n$out2")

      // --q: a separate query matrix file
      val qf = writeVecFile(n = 10, d = 6)
      try {
        val out3 = run("--db", f.toString, "--q", qf.toString,
          "--mode", "l2-sym", "--k", "5")
        assert(out3.contains("mode=l2_sym recall@5=1.0000"),
          s"report line wrong:\n$out3")
      } finally java.nio.file.Files.deleteIfExists(qf)
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("demo CLI synthesizes the gaussian corpus without --db") {
    spark.sparkContext
    val out = run("--n", "300", "--d", "16", "--k", "5", "--mode", "cos-l1")
    assert(out.contains("mode=cos_l1 recall@5=1.0000"), s"report line wrong:\n$out")
  }

  test("demo CLI --quant int8 reports the quantized rung") {
    spark.sparkContext
    val out = run("--n", "300", "--d", "16", "--k", "5", "--mode", "cos-l1",
      "--quant", "int8")
    assert(out.contains("mode=cos_l1 recall@5=1.0000"), s"report line wrong:\n$out")
    assert(out.contains("quant=int8/2^4"), s"no quant tag:\n$out")
    assert(out.contains("reduced_bytes_per_vec=16.00"), s"no byte model:\n$out")
    // l2-tz must refuse int8 (its bound assumes a truncated copy)
    val err = intercept[IllegalArgumentException] {
      Demo.main(Array("--n", "100", "--d", "8", "--mode", "l2-tz",
        "--quant", "int8"))
    }
    assert(err.getMessage.contains("l2-tz"), err.getMessage)
  }

  test("demo CLI --quant sq4 reports the 4-bit rung") {
    spark.sparkContext
    // qscale 0 keeps the standard-normal domain inside the 16-level
    // range (|v| <= 7.5 — virtually certain at n*d = 4800 draws), so
    // the half-step bound stays valid and the zero-miss mode still hits
    // full recall despite integer-coarse codes
    val out = run("--n", "300", "--d", "16", "--k", "5", "--mode", "cos-l1",
      "--quant", "sq4", "--qscale", "0")
    assert(out.contains("mode=cos_l1 recall@5=1.0000"), s"report line wrong:\n$out")
    assert(out.contains("quant=sq4/2^0"), s"no quant tag:\n$out")
    assert(out.contains("reduced_bytes_per_vec=8.00"), s"no byte model:\n$out")
    // default qscale 4 overflows the 4-bit range on this domain — the
    // range check must refuse instead of silently clipping semantics
    val err = intercept[IllegalArgumentException] {
      Demo.main(Array("--n", "100", "--d", "8", "--mode", "cos-l1",
        "--quant", "sq4"))
    }
    assert(err.getMessage.contains("overflows sq4"), err.getMessage)
  }
}
