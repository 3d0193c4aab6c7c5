package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev harness: stage-by-stage wall-clock of the qst14/qd27 pipeline
  * (bootstrap index → bootstrap pairs → bootstrap closure → per-batch
  * probe → incremental solve), to locate where the streaming
  * cluster-maintenance time actually goes.
  *
  * sbt -batch "runMain graft.tools.StreamCcProfile [sfDir]"
  */
object StreamCcProfile {
  private def lab0Touched(
      lab: org.apache.spark.sql.DataFrame,
      ends: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.core.OpCache.persist(
      lab.join(ends, Seq("node"), "left_semi")
        .select(col("component")).distinct())

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprof] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val corpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val batch = graft.core.OpCache.persist(
      docs.filter(pmod(col("doc_id"), lit(50)) === 0))
    val built = Dedup.buildCorpusIndex(corpus, "doc_id", "text")
    val index = Dedup.CorpusIndex(
      graft.core.OpCache.persist(built.hashes),
      graft.core.OpCache.persist(built.shingles),
      graft.core.OpCache.persist(built.bands))
    t("index materialize") {
      index.hashes.count(); index.shingles.count(); index.bands.count()
    }
    val pairs = t("pairsFromIndex construct+persist") {
      val p = graft.core.OpCache.persist(
        Dedup.pairsFromIndex(index, threshold = 0.5)
          .select(col("a_id"), col("b_id")))
      p.count(); p
    }
    val self = corpus.select(col("doc_id").as("a_id"), col("doc_id").as("b_id"))
    val labels0 = t("bootstrap closure") {
      val l = graft.core.OpCache.persist(
        Dedup.connectedComponents(pairs.unionByName(self), "a_id", "b_id"))
      l.count(); l
    }
    (1 to 2).foreach { i =>
      val edges = t(s"batch$i probe construct+count") {
        val e = graft.core.OpCache.persist(
          Dedup.batchNearDupPairs(index, batch, "doc_id", "text"))
        e.count(); e
      }
      t(s"batch$i incremental solve (stages)") {
        val lab = labels0
        val e = edges.select(col("a_id").cast("long").as("a_id"),
          col("b_id").cast("long").as("b_id"))
        val ends = e.select(col("a_id").as("node"))
          .unionByName(e.select(col("b_id").as("node"))).distinct()
        val touched = graft.core.OpCache.persist(
          lab.join(ends, Seq("node"), "left_semi")
            .select(col("component")).distinct())
        t(s"batch$i   touched") { println("touched=" + touched.count()) }
        val star = lab.join(touched, Seq("component"), "left_semi")
          .select(col("node").as("a_id"), col("component").as("b_id"))
        t(s"batch$i   star") { println("star=" + star.count()) }
        val selfNew = batch.select(col("doc_id").cast("long").as("a_id"),
          col("doc_id").cast("long").as("b_id"))
        val solved = t(s"batch$i   subgraph CC") {
          val s2 = Dedup.connectedComponents(
            star.unionByName(e).unionByName(selfNew), "a_id", "b_id")
          println("solved=" + s2.count()); s2
        }
        t(s"batch$i   assemble") {
          val untouched = graft.core.OpCache.persist(
            lab.join(touched, Seq("component"), "left_anti")
              .select(col("node"), col("component")))
          val out = untouched.unionByName(
            solved.select(col("node"), col("component"))
              .join(untouched.select(col("node")), Seq("node"), "left_anti"))
          graft.core.Lineage.cut(out).count()
        }
      }
      t(s"batch$i control: CC on 110 static edges") {
        import spark.implicits._
        val se = (0L until 110L).map(n => (n, n / 11)).toDF("a_id", "b_id")
        println("ctrl=" + Dedup.connectedComponents(se, "a_id", "b_id").count())
      }
      t(s"batch$i control: CC on materialized subgraph") {
        val e = edges.select(col("a_id").cast("long").as("a_id"),
          col("b_id").cast("long").as("b_id"))
        val ends = e.select(col("a_id").as("node"))
          .unionByName(e.select(col("b_id").as("node"))).distinct()
        val touched = lab0Touched(labels0, ends)
        val star = labels0.join(touched, Seq("component"), "left_semi")
          .select(col("node").as("a_id"), col("component").as("b_id"))
        val selfNew = batch.select(col("doc_id").cast("long").as("a_id"),
          col("doc_id").cast("long").as("b_id"))
        val asm = star.unionByName(e).unionByName(selfNew)
        val mat = graft.core.Lineage.cut(asm)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println("edges=" + mat.count())
        println("solved=" + Dedup.connectedComponents(mat, "a_id", "b_id").count())
      }
      t(s"batch$i index delta") {
        val g = Dedup.buildCorpusIndex(batch, "doc_id", "text")
        g.hashes.count(); g.shingles.count(); g.bands.count()
      }
    }
    spark.stop()
  }
}
