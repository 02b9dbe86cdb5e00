package graft.io

import org.apache.spark.sql.SparkSession

/** Per-JVM scratch root for queries that materialize an intermediate
  * dataset (ORC round-trip, schema-evolution batches, partitioned writes).
  *
  * The `applicationId` token keeps two Verify/test JVMs on the same machine
  * from overwriting each other's scratch outputs mid-read, while staying
  * stable within a run so repeated calls overwrite one directory in place
  * instead of leaking a fresh tempdir per call.
  */
object Scratch {
  def dir(spark: SparkSession, name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_vrfy_" +
      s"${spark.sparkContext.applicationId}/$name"
}
