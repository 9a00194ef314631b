package graft.queries

import graft.Q
import graft.Sql._
import org.apache.spark.sql.functions._

/** Embedding-column operators beyond similarity search (q24/q25/q33/
  * q52): storage quantization and per-label centroids.
  *
  * Determinism notes (the [[graft.Sql]] rules, applied to vectors):
  *  - float→double casts are exact; abs/max/floor and single
  *    multiply/divide ops are identical IEEE operations on both
  *    engines — only double ACCUMULATION order can diverge;
  *  - therefore every reduction over doubles here is an ORDERED fold:
  *    within a row, `aggregate(...)` walks the array in index order
  *    (DuckDB: `sum(... ORDER BY i)`); across rows, q84 folds in
  *    explicit (seg, vec_id) order on both engines;
  *  - rounding-to-int is floor(x+0.5), never round(): engines disagree
  *    on double round() ties (HALF_UP vs half-even), floor is exact.
  */
object Embeddings {

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------- q81
    // Symmetric int8 quantization (the embedding-storage form ANN
    // serving uses): per-vector scale = 127/max|x|, q = floor(x*scale
    // + 0.5). Pure scan projection — per-row max is an in-row ordered
    // fold, no shuffle anywhere; at 100 TB this runs at read
    // throughput and cuts the stored index 4x. Zero vectors quantize
    // to zero (scale guard).
    Q(
      "q81_embedding_quantize",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "embeddings")
          .withColumn("maxabs", expr(
            "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"))
          .select($"vec_id", $"maxabs", posexplode($"embedding"))
          .select($"vec_id", $"pos".cast("long").as("i"),
            when($"maxabs" === 0.0, 0L)
              .otherwise(floor($"col".cast("double") * (lit(127.0) / $"maxabs") + lit(0.5)))
              .cast("long").as("q"))
      },
      Some("""
        WITH m AS (
          SELECT vec_id, embedding,
            list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
          FROM embeddings),
        u AS (
          SELECT vec_id, maxabs,
            CAST(unnest(embedding) AS DOUBLE) AS x,
            CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i
          FROM m)
        SELECT vec_id, i,
          CASE WHEN maxabs = 0 THEN 0
               ELSE CAST(floor(x * (127.0 / maxabs) + 0.5) AS BIGINT) END AS q
        FROM u""")),

    // ---------------------------------------------------------------- q84
    // Per-label centroids (the k-means/IVF training primitive) via a
    // REPRODUCIBLE fixed-depth sum tree: grouped double sums are
    // order-dependent, and shuffle arrival order is nondeterministic —
    // so level 1 folds each bounded 64-vector segment in vec_id order,
    // level 2 folds each bounded 64-segment block (`seg div 64`) in
    // seg order, and level 3 folds the block sums in blk order. Both
    // engines evaluate the identical fixed reduction tree →
    // bit-identical centroids run-over-run AND engine-over-engine.
    // Depth is a STATIC part of the operator's definition, not derived
    // from the data: a data-dependent depth would change the
    // association grouping and with it the rounded result. At depth 3,
    // levels 1 and 2 are hard-bounded at 64 entries per collect_list
    // and the top list holds ceil(pop / 64²) structs per (label, i) —
    // one per 4096 vectors, so a label needs ≳4×10⁸ vectors (≈100 GB
    // of raw fp32 at d=64) before the top list reaches 10⁵ structs
    // (~2 MB, still comfortably inside one reducer). Past that,
    // extend the SAME pattern by one more `div 64` level — a new
    // operator version, not a runtime adaptation.
    Q(
      "q84_embedding_centroids",
      (s, dir) => {
        import s.implicits._
        val el = table(s, dir, "embeddings")
          .select($"label".cast("long").as("label"), $"vec_id", posexplode($"embedding"))
          .select($"label", $"vec_id", $"pos".cast("long").as("i"),
            $"col".cast("double").as("x"))
        val seg1 = el
          .groupBy($"label", $"i", expr("vec_id div 64").as("seg"))
          .agg(
            sort_array(collect_list(struct($"vec_id", $"x"))).as("xs"),
            count(lit(1)).as("n1"))
          .withColumn("ssum", expr("aggregate(xs, CAST(0.0 AS DOUBLE), (a, e) -> a + e.x)"))
        val seg2 = seg1
          .groupBy($"label", $"i", expr("seg div 64").as("blk"))
          .agg(
            sort_array(collect_list(struct($"seg", $"ssum"))).as("ss"),
            sum($"n1").cast("long").as("n2"))
          .withColumn("bsum", expr("aggregate(ss, CAST(0.0 AS DOUBLE), (a, e) -> a + e.ssum)"))
        seg2
          .groupBy($"label", $"i")
          .agg(
            sort_array(collect_list(struct($"blk", $"bsum"))).as("bs"),
            sum($"n2").cast("long").as("n"))
          .withColumn("vsum", expr("aggregate(bs, CAST(0.0 AS DOUBLE), (a, e) -> a + e.bsum)"))
          .select($"label", $"i", $"n", ($"vsum" / $"n".cast("double")).as("centroid"))
      },
      Some("""
        WITH el AS (
          SELECT CAST(label AS BIGINT) AS label, vec_id,
            CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
            CAST(unnest(embedding) AS DOUBLE) AS x
          FROM embeddings),
        s1 AS (
          SELECT label, i, vec_id // 64 AS seg,
            sum(x ORDER BY vec_id) AS ssum,
            CAST(count(*) AS BIGINT) AS n1
          FROM el GROUP BY label, i, seg),
        s2 AS (
          SELECT label, i, seg // 64 AS blk,
            sum(ssum ORDER BY seg) AS bsum,
            CAST(sum(n1) AS BIGINT) AS n2
          FROM s1 GROUP BY label, i, blk),
        c AS (
          SELECT label, i,
            sum(bsum ORDER BY blk) AS vsum,
            CAST(sum(n2) AS BIGINT) AS n
          FROM s2 GROUP BY label, i)
        SELECT label, i, n, vsum / CAST(n AS DOUBLE) AS centroid FROM c"""))
  )
}
