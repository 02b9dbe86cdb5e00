package graft

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PqExpressions
import graft.operators.Similarity

/** r15 (r14 ADVICE #1): the whole-NULL-vector law of the native PQ
  * expressions. The ORIGINAL higher-order-function formulation — kept here
  * verbatim as the executable spec — maps a NULL embedding to code 0 per
  * subspace (`slice(NULL)` → null distances → null-first struct argmin)
  * and hence a FINITE adist `Σ_j table(j)(0)`; the first native cut used
  * `nullSafeEval`, returning NULL codes (changing persisted layouts) and a
  * NULL adist (re-ranking the row to the TOP of an ascending top-k). This
  * suite pins expression == HOF on a corpus that includes whole-NULL,
  * partially-null, short, and normal vectors.
  */
class PqNullVectorSpec extends SparkSpec {

  private val m = 2
  private val roundTo = 6
  private val dim = 8
  private val sub = dim / m

  private val seeds: Array[scala.collection.Seq[Float]] =
    Array.tabulate(4)(c => Vector.tabulate(dim)(d => (c * dim + d) / 10.0f))

  private def codebook: Array[Array[Array[Float]]] =
    Array.tabulate(m)(j =>
      seeds.map(_.slice(j * sub, (j + 1) * sub).toArray))

  /** The r13 HOF code expressions, verbatim (over a vector bound `__x`). */
  private def hofCodes: Column = {
    def dsub(j: Int, cw: Array[Float]): Column =
      aggregate(zip_with(slice(col("__x"), j * sub + 1, sub),
          array(cw.toIndexedSeq.map(lit): _*),
          (a, b) => (a.cast("double") - b.cast("double")) *
            (a.cast("double") - b.cast("double"))),
        lit(0.0), (acc, x) => acc + x)
    def code(j: Int): Column =
      array_min(array(codebook(j).zipWithIndex.toIndexedSeq.map {
        case (cw, c) => struct(round(dsub(j, cw), roundTo).as("d"),
          lit(c).as("cw"))
      }: _*))("cw")
    array((0 until m).map(code): _*)
  }

  /** The r13 HOF ADC lookup, verbatim: codes → Σ_j table(j)(code_j). */
  private def hofAdist(table: Array[Array[Double]]): Column = {
    def codeAt(j: Int): Column = hofCodes.getItem(j)
    aggregate(
      array(table.indices.map(j =>
        element_at(array(table(j).toIndexedSeq.map(lit): _*),
          codeAt(j) + 1)): _*),
      lit(0.0), (acc, x) => acc + x)
  }

  private def adcTable(query: Seq[Float]): Array[Array[Double]] =
    Array.tabulate(m)(j => codebook(j).map { cw =>
      var acc = 0.0
      var d = 0
      while (d < sub) {
        val diff = query(j * sub + d).toDouble - cw(d).toDouble
        acc = acc + diff * diff
        d += 1
      }
      acc
    })

  test("expression codes == HOF codes, including the whole-NULL vector") {
    PqExpressions.register(spark)
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("__x", ArrayType(FloatType, containsNull = true),
        nullable = true)))
    val rows = Seq(
      Row(1L, Vector.tabulate(dim)(d => d / 7.0f)),
      Row(2L, null),
      Row(3L, Vector.tabulate[java.lang.Float](dim)(d =>
        if (d == 3) null else java.lang.Float.valueOf(d * d / 11.0f))),
      Row(4L, Vector.tabulate(3)(d => d / 3.0f)),
      Row(5L, Vector.tabulate(dim)(d => (dim - d) / 5.0f)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val native = df.select(col("vec_id"),
      call_function(PqExpressions.ENCODE_FN, col("__x"),
        PqExpressions.codebookLit(seeds, m), lit(roundTo)).as("codes"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val hof = df.select(col("vec_id"), hofCodes.as("codes"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(native == hof)
    assert(native(2L) == Seq(0, 0),
      "whole-NULL vector must encode to code 0 per subspace")
  }

  test("expression adist == HOF adist; NULL vector ranks by finite Σ table(j)(0)") {
    PqExpressions.register(spark)
    val q = Seq.tabulate(dim)(d => d / 9.0f)
    val table = adcTable(q)
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("__x", ArrayType(FloatType, containsNull = true),
        nullable = true)))
    val rows = Seq(
      Row(1L, Vector.tabulate(dim)(d => d / 7.0f)),
      Row(2L, null),
      Row(4L, Vector.tabulate(3)(d => d / 3.0f)),
      Row(5L, Vector.tabulate(dim)(d => (dim - d) / 5.0f)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val native = df.select(col("vec_id"),
      call_function(PqExpressions.ADIST_FN, col("__x"),
        PqExpressions.codebookLit(seeds, m), lit(roundTo),
        PqExpressions.tableLit(table)).as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val hof = df.select(col("vec_id"), hofAdist(table).as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(native == hof)
    val expectNull = table.map(_(0)).sum
    assert(native(2L) == expectNull,
      "whole-NULL adist must be the finite code-0 table sum, not NULL")
  }

  test("pqTopK over a corpus with a NULL embedding ranks it by its code-0 distance") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true),
        nullable = true)))
    val rows = (1L to 19L).map(i =>
      Row(i, Vector.tabulate(dim)(d => (i * dim + d) / 40.0f))) :+
      Row(100L, null) // outside the smallest-id codebook seeds
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val q = Seq.tabulate(dim)(d => d / 9.0f)
    val top = Similarity.pqTopK(df, "vec_id", "embedding", q, 20,
      m = m).collect()
    assert(top.length == 20, "the NULL-vector row must not drop out")
    val nullRank = top.indexWhere(_.getLong(0) == 100L)
    assert(nullRank > 0,
      "NULL vector must NOT rank first: its code-0 distance is finite " +
        s"and non-minimal here (ranked $nullRank)")
  }
}
