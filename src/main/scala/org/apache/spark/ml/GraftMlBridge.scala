package org.apache.spark.ml

/** Bridge into Spark ML's `private[ml]` tree internals.
  *
  * A fitted [[org.apache.spark.ml.classification.DecisionTreeClassificationModel]]
  * exposes its structure (InternalNode.split/children) publicly, but the
  * per-leaf CLASS COUNTS — the numerators of the `probability` output —
  * sit behind `private[ml] impurityStats`. Compiling the tree to an
  * engine-neutral SQL expression (graft.text.QualityClassifier.treeToSql,
  * the content-oracle path for the distilled quality model) needs exactly
  * those counts, so this object lives in the `org.apache.spark.ml`
  * package purely to re-export them — the same pattern as
  * [[org.apache.spark.sql.GraftBridge]].
  */
object GraftMlBridge {

  /** The leaf's class-count vector (what `probability` normalizes). */
  def leafClassCounts(leaf: tree.LeafNode): Array[Double] =
    leaf.impurityStats.stats.clone()
}
