package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Positional
import graft.core.Positional.POS

/** R4-R6: positional row DML over the `__pos` convention.
  *
  * Reference semantics: `drop(index[position])` (v1 `main.py:48-51`;
  * v2 pyc@122-126), multi-row cut to a clipboard (`main.py:53-56,107-114`),
  * paste-splice via order-preserving concat (`main.py:58-65`).
  *
  * Scale notes: delete and cut are single narrow filters (no shuffle);
  * only the dense re-numbering costs a pass. Splice is expressed with pure
  * position arithmetic — three filters + union + per-branch `__pos`
  * re-assignment — so no global sort is needed and the union stays
  * partition-local.
  */
object RowOps {

  /** R4: delete the row at `position`, then close the gap (rows after it
    * shift up by one). Pure arithmetic on `__pos` — no re-sort, no window.
    */
  def deleteRow(df: DataFrame, position: Long): DataFrame =
    deleteRows(df, Seq(position))

  /** R4 multi: delete a set of positions, re-pack densely.
    *
    * The shift (count of deleted positions below this row) is ONE
    * higher-order expression over an array LITERAL, not a sum of
    * per-position `when` terms: each `when` would reference `__pos`
    * again, and because `CollapseProject` merges stacked delete gestures
    * by SUBSTITUTING the previous gesture's `__pos` projection into
    * every reference, a k-position delete repeated g times would grow
    * the plan ~k^g — a delete-heavy session OOMed the driver around
    * nine 30-row gestures. The HOF form references `__pos` once, so
    * stacked gestures stay linear (and the array literal is a codegen
    * reference object, keeping generated code size flat too).
    */
  def deleteRows(df: DataFrame, positions: Seq[Long]): DataFrame = {
    if (positions.isEmpty) return df
    val sorted = positions.distinct.sorted
    val kept = df.filter(!col(POS).isInCollection(sorted))
    val arr = typedLit(sorted)
    kept.withColumn(POS,
      col(POS) - size(filter(arr, p => p < col(POS))))
  }

  /** R5: multi-row cut — returns (clipboard, remaining-table). Clipboard
    * rows get dense 0..k-1 positions in their original relative order
    * (`rows = sorted(set(...))`, `main.py:110`). The cut positions are known
    * on the driver, so the clipboard renumber is a literal old→new map —
    * no sort, no shuffle, no job; a gesture selects human-scale row counts.
    */
  def cutRows(df: DataFrame, positions: Seq[Long]): (DataFrame, DataFrame) = {
    val sorted = positions.distinct.sorted
    val clip = df.filter(col(POS).isInCollection(sorted))
    // typedLit keeps the generated source independent of the selected
    // positions (a MapType literal is a codegen reference object), so
    // successive cut gestures reuse the compiled plan instead of paying a
    // Janino recompile each time the selection changes.
    val renumMap = typedLit(sorted.zipWithIndex.map { case (p, i) =>
      p -> i.toLong }.toMap)
    val clipRenum = clip.withColumn(POS, element_at(renumMap, col(POS)))
    (clipRenum, deleteRows(df, sorted))
  }

  /** R6: paste-splice — insert the clipboard block at `position`:
    * `concat([iloc[:pos], clip, iloc[pos:]])` (`main.py:58-65`).
    * Upper keeps its positions, clipboard lands at pos..pos+k-1, lower
    * shifts down by k. `unionByName` + arithmetic; order is carried entirely
    * by `__pos`, so no branch needs a sort or single partition.
    */
  def pasteRows(df: DataFrame, clipboard: DataFrame, position: Long,
                knownSize: Option[Long] = None): DataFrame = {
    val k = knownSize.getOrElse(clipboard.count()) // size job only if unknown
    val upper = df.filter(col(POS) < position)
    val lower = df.filter(col(POS) >= position)
      .withColumn(POS, col(POS) + lit(k))
    val clip = clipboard.withColumn(POS, col(POS) + lit(position))
    upper.unionByName(clip).unionByName(lower)
  }

  /** R7: full table replace is a rebind — see [[graft.core.EditorSession]]. */
}
