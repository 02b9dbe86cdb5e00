package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.{EditorSession, Positional, Tables}
import graft.ops.CellOps

/** Property-based laws from SURVEY.md §5.3: positional invariants, edit-log
  * laws, cast-rejection laws. Spark actions are expensive, so each law
  * samples a handful of seeded ScalaCheck cases over the nation table
  * (25 rows) instead of the default 100 (the raw scalacheck runner — the
  * scalatest bridge artifact is not in the offline cache).
  */
class PropertySpec extends SparkSpec {

  /** Deterministic generator sampling (seeded — reproducible failures). */
  private def forAll[A](g: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private def nationSession() = EditorSession.fromDataFrame(
    Tables.load(spark, sf, "nation"), Seq("n_nationkey"))

  private def positions(s: EditorSession): Seq[Long] =
    s.current.orderBy("__pos").select("__pos").collect().map(_.getLong(0)).toSeq

  test("law: __pos stays dense 0..n-1 after any delete set") {
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 24L))) { dels =>
      val s = nationSession()
      s.deleteRows(dels.distinct)
      val got = positions(s)
      assert(got == (0L until (25 - dels.distinct.size)))
    }
  }

  test("law: cut then paste at the cut point is identity") {
    forAll(Gen.zip(Gen.choose(0L, 24L), Gen.choose(1, 4))) { case (start, len) =>
      val block = (start until math.min(25L, start + len))
      val s = nationSession()
      val before = s.current.orderBy("__pos").select("n_name")
        .collect().map(_.getString(0)).toSeq
      s.cut(block)
      assert(s.paste(start))
      val after = s.current.orderBy("__pos").select("n_name")
        .collect().map(_.getString(0)).toSeq
      assert(after == before)
      assert(positions(s) == (0L until 25))
    }
  }

  test("law: rejected cast never mutates state") {
    forAll(Gen.zip(Gen.choose(0L, 24L), Gen.alphaStr.suchThat(x =>
      scala.util.Try(x.trim.toInt).isFailure))) { case (pos, junk) =>
      val s = nationSession()
      val before = s.current.orderBy("__pos").collect().toSeq
      assert(!s.setCell(pos, "n_regionkey", junk))
      assert(s.current.orderBy("__pos").collect().toSeq == before)
    }
  }

  test("law: setCell is last-write-wins per cell") {
    forAll(Gen.zip(Gen.choose(0L, 24L), Gen.choose(0, 99), Gen.choose(0, 99))) {
      case (pos, v1, v2) =>
        val s = nationSession()
        assert(s.setCell(pos, "n_regionkey", v1.toString))
        assert(s.setCell(pos, "n_regionkey", v2.toString))
        val got = s.current.filter(col("__pos") === pos)
          .select("n_regionkey").head.getInt(0)
        assert(got == v2)
    }
  }

  test("law: castStrict round-trips rendered values for primitive types") {
    val cases = Seq[(DataType, Gen[String])](
      IntegerType -> Gen.choose(Int.MinValue, Int.MaxValue).map(_.toString),
      LongType -> Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString),
      BooleanType -> Gen.oneOf("true", "false"))
    cases.foreach { case (dt, gen) =>
      forAll(gen) { s =>
        val v = CellOps.castStrict(s, dt)
        assert(v.isSuccess && v.get.toString == s)
      }
    }
  }

  test("law: any gesture sequence fully undone restores the original table") {
    // gestures: 0 = cell edit, 1 = delete, 2 = cut+paste, 3 = bool-ish edit
    val gestureGen = Gen.listOfN(6,
      Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 20L), Gen.choose(0, 99)))
    forAll(gestureGen, n = 3) { gestures =>
      val s = nationSession()
      val before = s.current.orderBy("__pos").collect().toSeq
      var applied = 0
      gestures.foreach { case (kind, pos, v) =>
        kind match {
          case 0 => if (s.setCell(pos, "n_regionkey", v.toString)) applied += 1
          case 1 => if (s.deleteRows(Seq(pos))) applied += 1
          case 2 => if (s.cut(Seq(pos))) applied += 1
                    if (s.paste(pos)) applied += 1
          case 3 => if (s.setCell(pos, "n_name", s"N$v")) applied += 1
        }
      }
      (0 until applied).foreach(i => assert(s.undo(), s"undo $i of $applied"))
      assert(!s.undo(), "history should be exhausted")
      assert(s.current.orderBy("__pos").collect().toSeq == before)
      assert(s.rowCount == before.size)
    }
  }

  test("law: broadcast-join edit application equals the literal-map path") {
    // >32 DISTINCT positions so EditorSession.current actually takes the
    // editJoin (broadcast) path — results must match last-write-wins exactly
    forAll(Gen.listOfN(60, Gen.zip(Gen.choose(0L, 49L), Gen.choose(0, 999))), n = 3) { edits0 =>
      // guarantee the threshold is crossed whatever the generator drew
      val edits = edits0 ++ (0L until 40L).map(p => (p, 777))
      val s = EditorSession.fromDataFrame(
        Tables.load(spark, sf, "orders").limit(60), Seq("o_orderkey"))
      edits.foreach { case (p, v) =>
        assert(s.setCell(p, "o_custkey", v.toString))
      }
      assert(s.pendingEdits > EditorSession.literalEditMax,
        "test must exercise the broadcast-join path")
      // reference semantics: last write per position wins
      val expect = edits.groupBy(_._1).map { case (p, vs) => p -> vs.last._2 }
      val got = s.current.orderBy("__pos")
        .select("__pos", "o_custkey").collect()
        .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      expect.foreach { case (p, v) =>
        assert(got(p) == v, s"pos $p: expected $v got ${got(p)}")
      }
    }
  }

  test("law: crossing literalEditMax in one burst leaves table semantics unchanged") {
    // one burst at k = max-1, max, max+1, max+2 distinct positions: the
    // first two resolve through the literal-map projection, the last two
    // through the broadcast hash join. All four must match the same
    // independently computed expected table — pinning the switchover as
    // invisible to callers.
    val max = EditorSession.literalEditMax
    val baseline = Tables.load(spark, sf, "orders").limit(60)
      .orderBy("o_orderkey").select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    forAll(Gen.pick(max + 2, 0L until 60L), n = 2) { picked =>
      (max - 1 to max + 2).foreach { k =>
        val positions = picked.take(k).toSeq
        val s = EditorSession.fromDataFrame(
          Tables.load(spark, sf, "orders").limit(60), Seq("o_orderkey"))
        assert(s.setCells("o_custkey",
          positions.map(p => p -> (900000L + p).toString)))
        assert(s.pendingEdits == k)
        val expect = baseline.zipWithIndex.map { case ((ok, cust), pos) =>
          ok -> (if (positions.contains(pos.toLong)) 900000L + pos else cust)
        }.toMap
        val got = s.current.select("o_orderkey", "o_custkey").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expect, s"k=$k (boundary $max) diverged from expected table")
      }
    }
  }

  test("law: binned range join equals the naive non-equi join on random data") {
    val gen = Gen.zip(
      Gen.listOfN(12, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 400L),
        Gen.choose(1L, 150L))),
      Gen.listOfN(30, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 500L))))
    forAll(gen, n = 3) { case (ivRaw, ptRaw) =>
      import spark.implicits._
      val iv = ivRaw.zipWithIndex
        .map { case ((k, lo, w), i) => (i.toLong, k, lo, lo + w) }
        .toDF("iid", "k", "lo", "hi")
      val pt = ptRaw.zipWithIndex.map { case ((k, p), i) => (i.toLong, k, p) }
        .toDF("pid", "k", "pt")
      val binned = graft.operators.RangeJoin.pointInInterval(
          pt, iv, Seq("k"), "pt", "lo", "hi", binWidth = 64L)
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = pt.as("p").join(iv.as("i"),
          col("p.k") === col("i.k") && col("lo") <= col("pt") && col("pt") < col("hi"))
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned == naive, s"missing ${naive -- binned}, extra ${binned -- naive}")
    }
  }

  test("law: renumber is idempotent and order-preserving") {
    forAll(Gen.listOfN(8, Gen.choose(0L, 24L))) { keep =>
      val base = Positional.attachPos(
        Tables.load(spark, sf, "nation"), col("n_nationkey"))
      val holey = base.filter(col("__pos").isInCollection(keep.distinct))
      val once = Positional.renumber(holey)
      val keys = once.orderBy("__pos").select("n_nationkey")
        .collect().map(_.getInt(0)).toSeq
      assert(keys == keys.sorted)
      assert(once.select("__pos").collect().map(_.getLong(0)).sorted.toSeq ==
        (0L until keep.distinct.size))
    }
  }

  test("law: passageDedup conserves passages — Σ n_kept = |distinct passages|") {
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val docGen = Gen.listOfN(7, word).map(_.mkString(" "))
    forAll(Gen.listOfN(6, docGen)) { texts =>
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.operators.CorpusSignals.passageDedup(
        d, "doc_id", "text", window = 2).collect()
      val keptTotal = out.map(_.getLong(2)).sum
      // every distinct passage survives exactly once corpus-wide
      val distinctPassages = d
        .select(explode(org.apache.spark.sql.functions.transform(
          sequence(lit(0), lit(3)),
          i => array_join(slice(split(col("text"), " "), i * 2 + 1, lit(2)), " ")))
          .as("p"))
        .filter(col("p") =!= "").distinct().count()
      assert(keptTotal == distinctPassages,
        s"kept $keptTotal != distinct $distinctPassages for $texts")
    }
  }

  test("law: applyChangeset row-count arithmetic holds for disjoint-keyed deltas") {
    import spark.implicits._
    val tgt = (0L until 20L).map(k => (k, k * 2)).toDF("k", "v")
    forAll(Gen.zip(
      Gen.someOf(0L until 20L),            // deletes from target
      Gen.someOf(20L until 30L))) { case (delsRaw, insRaw) =>
      val dels = delsRaw.toSeq.distinct
      val ins = insRaw.toSeq.distinct
      val ch = (dels.map(k => (k, 0L, "D")) ++ ins.map(k => (k, k, "I")))
        .toDF("k", "v", "op")
      // no non-empty guard: the empty changeset must be the identity
      val out = graft.operators.Merge.applyChangeset(
        tgt, ch, Seq("k"), validate = true)
      assert(out.count() == 20 - dels.size + ins.size)
      // deletes gone, inserts present
      val keys = out.select("k").collect().map(_.getLong(0)).toSet
      assert(dels.forall(!keys(_)) && ins.forall(keys(_)))
    }
  }

  test("law: intervalOverlap equals the naive join on random interval sets") {
    import spark.implicits._
    val iv = Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 12L))
      .map { case (s, len) => (s, s + len) }
    forAll(Gen.zip(Gen.listOfN(8, iv), Gen.listOfN(8, iv))) { case (ls, rs) =>
      val l = ls.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("lid", "s_i", "e_i")
      val r = rs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("rid", "s_j", "e_j")
      val binned = graft.operators.RangeJoin.intervalOverlap(
          l, r, Nil, "s_i", "e_i", "s_j", "e_j", binWidth = 5L)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1)))
      val naive = l.crossJoin(r)
        .filter(col("s_i") <= col("e_j") && col("s_j") <= col("e_i"))
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(binned.length == binned.toSet.size, s"dup pair in ${binned.toSeq}")
      assert(binned.toSet == naive)
    }
  }
}
