package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, md5}

/** Deterministic training sample shared by the trained ANN indexes
  * ([[IvfIndex]], [[PqIndex]]): the `n` vectors whose md5(vec_id)
  * sorts lowest, vec_id tiebreak. Content-addressed — no RNG seed to
  * manage, no insertion-order bias (unlike "lowest n ids", which
  * correlates with ingest order), and the SAME sample comes back on
  * any partitioning or cluster layout, so a retrained quantizer is
  * reproducible anywhere. Physically one TakeOrdered pass: per-
  * partition top-n on (16-byte hash, id), then one final merge —
  * never a global sort. k-means quality needs only ~256·k vectors,
  * so `n` stays dimension-sized while the corpus scales to 100 TB.
  */
object TrainSample {

  /** `n <= 0` means train on the whole corpus (the local/test path). */
  def sample(vectors: DataFrame, n: Int): DataFrame =
    if (n <= 0) vectors
    else vectors
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(n)
}
