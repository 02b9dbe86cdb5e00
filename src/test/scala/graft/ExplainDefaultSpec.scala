package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Pins the invariant [[Explain.defaultSet]] documents: printing the
  * default plan set is read-only. Building these plans may trigger Spark's
  * parquet planning reads (footer/file-listing jobs), but must never write
  * a dataset, mutate the catalog, or materialize a checkpoint — queries
  * whose construction does (j_bucketed's bucketed-table writes,
  * s_partition_prune's scratch dataset, t_pipeline_v2's checkpoints) must
  * be named explicitly and can never silently join the default set.
  */
class ExplainDefaultSpec extends SparkSpec {

  /** Recursive listing of a directory tree (empty if absent). */
  private def snapshot(p: Path): Set[String] =
    if (!Files.exists(p)) Set.empty
    else {
      val s = Files.walk(p)
      try s.iterator().asScala.map(_.toString).toSet finally s.close()
    }

  test("default plan set explains without mutating catalog, warehouse, or scratch") {
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        descs.add(Option(jobStart.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(jobStart.stageInfos.headOption.map(_.name).getOrElse("?")))
    }
    val warehouse =
      Paths.get(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    val scratchRoot = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_vrfy_${spark.sparkContext.applicationId}")
    val tablesBefore = spark.catalog.listTables().collect().map(_.name).toSet
    val warehouseBefore = snapshot(warehouse)
    val scratchBefore = snapshot(scratchRoot)

    spark.sparkContext.addSparkListener(listener)
    try {
      Explain.defaultSet.foreach { n =>
        assert(SparkEntry.queries.contains(n), s"default set names unknown query $n")
        // same calls Explain.main makes: build the plan, format it
        SparkEntry.queries(n)(spark, sf).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      }
      // the listener bus is async; run a marker job and wait for it so
      // every earlier JobStart is guaranteed delivered before we assert
      spark.range(1).count()
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!descs.asScala.exists(_.contains("count at ExplainDefaultSpec"))
        && System.nanoTime() < deadline) Thread.sleep(20)
      val checkpointy = descs.asScala.filter(_.toLowerCase.contains("checkpoint"))
      assert(checkpointy.isEmpty,
        s"default-set explain materialized checkpoints: ${checkpointy.mkString(", ")}")
    } finally spark.sparkContext.removeSparkListener(listener)

    assert(spark.catalog.listTables().collect().map(_.name).toSet == tablesBefore,
      "default-set explain mutated the catalog")
    assert(snapshot(warehouse) == warehouseBefore,
      "default-set explain wrote into the warehouse dir")
    assert(snapshot(scratchRoot) == scratchBefore,
      "default-set explain wrote into the Verify scratch dir")
  }
}
