package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for the media codec path (not graded). */
object MediaProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new graft.Bench.CpuListener
    spark.sparkContext.addSparkListener(cpu)
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val c0 = cpu.settledCpuNs(); val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      val c = (cpu.settledCpuNs() - c0) / 1e9
      println(f"[mp] $label%-28s $sec%7.2f s  cpu=$c%7.2f s  rows=$n")
    }
    import graft.media.Media
    def cnt(ds: org.apache.spark.sql.Dataset[_]): Long = {
      ds.write.format("noop").mode("overwrite").save(); ds.count()
    }
    time("resize_all_1")(cnt(Media.resize(Media.synthesize(spark, sfDir), 128, 96)))
    time("resize_all_2")(cnt(Media.resize(Media.synthesize(spark, sfDir), 128, 96)))
    time("resize_img_only")(cnt(Media.resize(Media.synthesize(spark, sfDir, col("doc_id") % 3 =!= 2), 128, 96)))
    time("resize_mp4_only")(cnt(Media.resize(Media.synthesize(spark, sfDir, col("doc_id") % 3 === 2), 128, 96)))
    time("resize_png")(cnt(Media.resize(Media.synthesize(spark, sfDir, col("doc_id") % 3 === 0), 128, 96)))
    time("resize_jpg")(cnt(Media.resize(Media.synthesize(spark, sfDir, col("doc_id") % 3 === 1), 128, 96)))
    spark.stop()
  }
}
