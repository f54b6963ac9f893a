package graft.operators

import java.awt.image.BufferedImage
import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.io.File

import org.apache.spark.sql.DataFrame

/**
 * K2 plot sink (reference `_plot_xy` + `sweep_and_plot` PNG outputs,
 * `/root/reference/ANNCode.py:712-726,782-788`): render the sweep metrics
 * table as XY line charts with circle markers and write PNG files.
 *
 * Deliberately dependency-free: `BufferedImage`/`Graphics2D`/`ImageIO`
 * ship with the JDK and work headless. This is a presentation sink — the
 * input is the driver-small sweep grid (one row per (mode, keepM, delta)
 * cell), so collecting it is bounded by the grid size, never by data
 * scale; the heavy lifting happened in [[Sweep.run]] on the cluster.
 */
object Plot {

  /** One chart: polyline + markers over labeled, ticked axes. */
  def writeXyPng(path: String, xs: Seq[Double], ys: Seq[Double],
                 xlabel: String, ylabel: String, title: String,
                 width: Int = 900, height: Int = 600): Unit = {
    require(xs.length == ys.length, s"xs(${xs.length}) != ys(${ys.length})")
    System.setProperty("java.awt.headless", "true")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_ON)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, width, height)

      val (l, r, t, b) = (80, 30, 50, 60) // margins
      val (pw, ph) = (width - l - r, height - t - b)

      // data ranges padded 5% so extreme markers stay inside the frame;
      // degenerate (constant) series get a symmetric unit band
      def range(vs: Seq[Double]): (Double, Double) = {
        val (lo, hi) = (vs.min, vs.max)
        if (hi - lo < 1e-12) (lo - 0.5, hi + 0.5)
        else { val pad = (hi - lo) * 0.05; (lo - pad, hi + pad) }
      }
      val (x0, x1) = range(if (xs.nonEmpty) xs else Seq(0.0, 1.0))
      val (y0, y1) = range(if (ys.nonEmpty) ys else Seq(0.0, 1.0))
      def px(x: Double) = l + ((x - x0) / (x1 - x0) * pw).round.toInt
      def py(y: Double) = t + ph - ((y - y0) / (y1 - y0) * ph).round.toInt

      // frame + ticks
      g.setColor(new Color(60, 60, 60))
      g.setStroke(new BasicStroke(1.2f))
      g.drawRect(l, t, pw, ph)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
      val fm = g.getFontMetrics
      val nTicks = 5
      for (i <- 0 to nTicks) {
        val fx = x0 + (x1 - x0) * i / nTicks
        val fy = y0 + (y1 - y0) * i / nTicks
        val (tx, ty) = (px(fx), py(fy))
        g.drawLine(tx, t + ph, tx, t + ph + 5)
        g.drawLine(l - 5, ty, l, ty)
        val xs_ = f"$fx%.3g"; val ys_ = f"$fy%.3g"
        g.drawString(xs_, tx - fm.stringWidth(xs_) / 2, t + ph + 20)
        g.drawString(ys_, l - 10 - fm.stringWidth(ys_), ty + fm.getAscent / 2 - 1)
      }

      // axis labels + title
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 14))
      val fm2 = g.getFontMetrics
      g.drawString(xlabel, l + (pw - fm2.stringWidth(xlabel)) / 2, height - 15)
      val old = g.getTransform
      g.rotate(-math.Pi / 2, 20, t + ph / 2)
      g.drawString(ylabel, 20 - fm2.stringWidth(ylabel) / 2, t + ph / 2 + 5)
      g.setTransform(old)
      g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 15))
      val fm3 = g.getFontMetrics
      g.drawString(title, l + (pw - fm3.stringWidth(title)) / 2, 30)

      // series: sorted-by-x polyline with circle markers (matplotlib
      // marker="o" look)
      val pts = xs.zip(ys).sortBy(_._1).map { case (x, y) => (px(x), py(y)) }
      g.setColor(new Color(31, 119, 180)) // matplotlib C0
      g.setStroke(new BasicStroke(2f))
      pts.sliding(2).foreach {
        case Seq((ax, ay), (bx, by)) => g.drawLine(ax, ay, bx, by)
        case _ =>
      }
      pts.foreach { case (x, y) => g.fillOval(x - 4, y - 4, 8, 8) }
    } finally g.dispose()

    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    require(javax.imageio.ImageIO.write(img, "png", f),
      s"no PNG writer available for $path")
  }

  /**
   * The reference's two per-mode sweep charts (`ANNCode.py:782-788`):
   * `{mode}_recall_vs_save.png` (x = bandwidth saving, y = recall@k) and
   * `{mode}_fpr_vs_mbits.png` (x = mantissa bits removed, y = FPR).
   * `metrics` is the [[Sweep.run]] output
   * (mode, m_keep, delta, recall, save, fpr); one chart pair per mode.
   * Returns the written paths.
   */
  def writeSweepPngs(metrics: DataFrame, outDir: String, k: Int): Seq[String] = {
    val rows = metrics
      .select("mode", "m_keep", "recall", "save", "fpr")
      .collect() // grid-sized by construction (see class doc)
    rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).flatMap { case (mode, rs) =>
      val p1 = s"$outDir/${mode}_recall_vs_save.png"
      writeXyPng(p1, rs.map(_.getDouble(3)).toSeq, rs.map(_.getDouble(2)).toSeq,
        "Bandwidth saving", s"Recall@$k", s"$mode: recall vs saving")
      val p2 = s"$outDir/${mode}_fpr_vs_mbits.png"
      writeXyPng(p2,
        rs.map(r => (graft.functions.Fp16.ManBits - r.getInt(1)).toDouble).toSeq,
        rs.map(_.getDouble(4)).toSeq,
        "Mantissa bits removed", "FPR per candidate",
        s"$mode: FPR vs mantissa removal")
      Seq(p1, p2)
    }
  }
}
