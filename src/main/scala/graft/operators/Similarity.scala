package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.Parity.pround

/** Similarity search over an embedding column (SURVEY.md §2.G [EXT]).
  *
  * Two plans:
  *  - Brute-force cosine top-k: broadcast the (small) query set against
  *    the corpus — the correct baseline, and the oracle-checkable one.
  *    At 100 TB this stays the *per-bucket* kernel, never the global plan.
  *  - Sign-LSH bucketing: deterministic integer hyperplanes partition
  *    vectors into 2^p buckets; search only inside a bucket. The bucket
  *    id is the shuffle key, so the plan scales linearly.
  *
  * Numeric parity: embeddings are quantized to fixed-point longs
  * (floor(x·10^5)) so dot products and norms are exact integer sums —
  * order-independent, hence bit-identical in Spark and DuckDB. sqrt and
  * the final division are single IEEE ops on identical operands.
  * (A float-sum cosine would differ in the last ulp between engines
  * because float addition is not associative.)
  */
object Similarity {

  /** Fixed-point embedding: array<long> of floor(x·1e5). */
  val fixedExpr =
    "transform(embedding, x -> cast(floor(cast(x as double) * 100000.0) as bigint))"

  /** Exact long dot product: the native codegen'd fp_dot expression when
    * graft.plans.GraftExtensions is installed (Verify/Bench sessions),
    * otherwise the equivalent — but interpreted, per-row-allocating —
    * higher-order-function form. Identical results either way. */
  def dotExpr(s: SparkSession, a: String, b: String): String =
    if (scala.util.Try(s.catalog.functionExists("fp_dot")).getOrElse(false))
      s"fp_dot($a, $b)"
    else
      s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"

  /** Per-vector squared norm of the fixed-point embedding (exact long). */
  private[operators] def withFixed(vecs: DataFrame): DataFrame = {
    val dot = dotExpr(vecs.sparkSession, "f", "f")
    vecs.select(col("vec_id"), col("label"), expr(fixedExpr).as("f"))
      .withColumn("nrm", expr(dot))
  }

  /** Exact cosine between two fixed-point vectors (columns fa/fb with
    * norms na/nb): long dot / (sqrt·sqrt). */
  private[operators] def cosExpr(s: SparkSession): String =
    s"cast(${dotExpr(s, "fa", "fb")} as double)" +
      " / (sqrt(cast(na as double)) * sqrt(cast(nb as double)))"

  /** Brute-force cosine top-k: queries (tiny) broadcast against all. */
  def cosineTopK(vecs: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val base = withFixed(vecs)
    val queries = base.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("f").as("fa"), col("nrm").as("na"))
    val corpus = base
      .select(col("vec_id").as("neighbor_id"), col("f").as("fb"), col("nrm").as("nb"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(queries).join(corpus, col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        expr(cosExpr(vecs.sparkSession)).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("q_id"), col("neighbor_id"), col("rn").as("rank"),
        pround(col("cos"), 6).as("cos_sim"))
  }

  /** Sign-LSH bucket id: p deterministic integer hyperplanes
    * w(p,i) = ((i·37 + p·61) mod 19) − 9; bit = (dot >= 0). */
  def lshBuckets(vecs: DataFrame, planes: Int): DataFrame =
    withFixed(vecs).select(col("vec_id"),
      concat((0 until planes).map { p =>
        when(expr(
          s"""aggregate(
             |  zip_with(f, transform(sequence(0, size(f) - 1),
             |                        i -> cast((i * 37 + $p * 61) % 19 - 9 as bigint)),
             |           (x, w) -> x * w),
             |  0L, (acc, x) -> acc + x)""".stripMargin) >= 0, lit("1"))
          .otherwise(lit("0"))
      }: _*).as("bucket"))

  /** Embedding-cosine near-dup pairs, LSH-prefiltered: exact cosine runs
    * only on pairs sharing a sign-LSH bucket (the dedup scale path — the
    * bucket key is the shuffle key, never all-pairs). Top-k by similarity
    * with deterministic tie-breaks. */
  def embeddingNearDupTop(vecs: DataFrame, planes: Int, k: Int): DataFrame = {
    val withB = withFixed(vecs).join(lshBuckets(vecs, planes), "vec_id")
    val a = withB.select(col("bucket"), col("vec_id").as("vec_a"),
      col("f").as("fa"), col("nrm").as("na"))
    val b = withB.select(col("bucket"), col("vec_id").as("vec_b"),
      col("f").as("fb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket")).where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        expr(cosExpr(vecs.sparkSession)).as("cos"))
      .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
      .limit(k)
      .select(col("vec_a"), col("vec_b"), pround(col("cos"), 6).as("cos_sim"))
  }

  /** IVF coarse quantization: a BOUNDED deterministic centroid subset
    * (the `nCents` smallest vec_ids — in production, k-means on a
    * sample), every vector assigned to its max-cosine centroid (ties →
    * smaller centroid id). At scale: centroids broadcast, assignment is
    * a map-only pass, and the centroid id becomes the partition key an
    * in-bucket search shuffles on.
    *
    * The centroid count MUST be independent of the input size: an
    * earlier draft selected `vec_id % mod == 0` — a sampling RATE — so
    * centroids (and the broadcast cross product) grew linearly with the
    * data, making assignment quadratic overall. The 20× ScaleDemo sweep
    * surfaced it as an 81× wall-time blowup. */
  def ivfAssign(vecs: DataFrame, nCents: Int): DataFrame = {
    val base = withFixed(vecs)
    val cents = base.orderBy("vec_id").limit(nCents)
      .select(col("vec_id").as("centroid_id"), col("f").as("fb"),
        col("nrm").as("nb"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("centroid_id"))
    base.select(col("vec_id"), col("f").as("fa"), col("nrm").as("na"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("centroid_id"),
        expr(cosExpr(vecs.sparkSession)).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"))
  }

  /** ANN quality measurement: recall@k of LSH-bucket-restricted search
    * vs exact brute force, per query — the evaluation loop every
    * approximate-search deployment needs ("measure, don't guess"
    * applied to the approximation itself). At scale the exact side runs
    * on a SAMPLE of queries (here: the nQueries smallest ids), which is
    * exactly how production recall monitoring works — the corpus-wide
    * search stays approximate; only the probe set pays brute force. */
  def annRecall(vecs: DataFrame, planes: Int, nQueries: Int, k: Int): DataFrame = {
    val exact = cosineTopK(vecs, nQueries, k)
      .select(col("q_id"), col("neighbor_id"))
    val withB = withFixed(vecs).join(lshBuckets(vecs, planes), "vec_id")
    val q = withB.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("f").as("fa"),
        col("nrm").as("na"), col("bucket"))
    val c = withB.select(col("vec_id").as("neighbor_id"), col("f").as("fb"),
      col("nrm").as("nb"), col("bucket"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
    val approx = broadcast(q)
      .join(c, Seq("bucket"))
      .where(col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        expr(cosExpr(vecs.sparkSession)).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("q_id"), col("neighbor_id"))
    exact.join(approx.withColumn("hit", lit(1)),
        Seq("q_id", "neighbor_id"), "left_outer")
      .groupBy("q_id")
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .select(col("q_id"), col("n_hits"),
        pround(col("n_hits").cast("double") / k, 6).as("recall"))
  }

  /** k-NN label vote: majority label of the top-k neighbors per query;
    * ties broken by smaller label. */
  def knnLabelVote(vecs: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val topk = cosineTopK(vecs, nQueries, k)
    val labels = vecs.select(col("vec_id").as("neighbor_id"), col("label"))
    val w = Window.partitionBy("q_id").orderBy(col("votes").desc, col("label"))
    topk.join(broadcast(labels), "neighbor_id")
      .groupBy("q_id", "label").agg(count(lit(1)).as("votes"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("q_id"), col("label").as("pred_label"), col("votes"))
  }
}

object SimilarityQueries {
  import Similarity._
  private def vecs(s: SparkSession, d: String) = Tables.embeddings(s, d)

  private[operators] val fixedSqlCte =
    """f AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding,
      |           x -> CAST(floor(CAST(x AS DOUBLE) * 100000.0) AS BIGINT)) AS f
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, label, f,
      |         CAST(list_sum(list_transform(f, x -> x * x)) AS BIGINT) AS nrm
      |  FROM f)""".stripMargin

  /** SQL fragment: the 4-plane sign-LSH bucket id over a fixed-point
    * column `f` (mirrors Similarity.lshBuckets). */
  private[operators] val bucketSqlExpr = (0 until 4).map(p =>
    s"""(CASE WHEN CAST(list_sum(list_transform(range(1, len(f) + 1),
       |   i -> f[i] * CAST(((i - 1) * 37 + $p * 61) % 19 - 9 AS BIGINT))) AS BIGINT) >= 0
       |   THEN '1' ELSE '0' END)""".stripMargin).mkString(" || ")

  /** SQL fragment: exact pair cosine between rows a/c of the `n` CTE. */
  private[operators] def pairCosSql(a: String, b: String) =
    s"""CAST(CAST(list_sum(list_transform(range(1, len($a.f) + 1),
       |     i -> $a.f[i] * $b.f[i])) AS BIGINT) AS DOUBLE)
       |  / (sqrt(CAST($a.nrm AS DOUBLE)) * sqrt(CAST($b.nrm AS DOUBLE)))""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("s5_ivf_assign",
      (s, d) => ivfAssign(vecs(s, d), 6).orderBy("vec_id"),
      Some(s"""WITH $fixedSqlCte,
              |cents AS (
              |  SELECT vec_id AS centroid_id, f, nrm FROM n
              |  ORDER BY vec_id LIMIT 6),
              |p AS (
              |  SELECT n.vec_id, c.centroid_id,
              |         ${pairCosSql("n", "c")} AS cos
              |  FROM n, cents c),
              |r AS (
              |  SELECT vec_id, centroid_id,
              |         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) AS rn
              |  FROM p)
              |SELECT vec_id, centroid_id FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin),
      doc = "IVF coarse quantization: max-cosine centroid assignment (broadcast centroids)"),

    Q("s1_cosine_topk",
      (s, d) => cosineTopK(vecs(s, d), 5, 5).orderBy("q_id", "rank"),
      Some(s"""WITH $fixedSqlCte,
              |p AS (
              |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
              |         CAST(CAST(list_sum(list_transform(range(1, len(a.f) + 1),
              |                i -> a.f[i] * b.f[i])) AS BIGINT) AS DOUBLE)
              |           / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS cos
              |  FROM n a JOIN n b ON b.vec_id <> a.vec_id
              |  WHERE a.vec_id < 5),
              |r AS (
              |  SELECT q_id, neighbor_id, cos,
              |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
              |  FROM p)
              |SELECT q_id, neighbor_id, rn AS rank,
              |       floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
              |FROM r WHERE rn <= 5 ORDER BY q_id, rank""".stripMargin),
      doc = "brute-force cosine top-k, fixed-point exact dot products"),

    Q("s2_lsh_buckets",
      (s, d) => lshBuckets(vecs(s, d), 4).orderBy("vec_id"),
      Some(s"""WITH $fixedSqlCte,
              |b AS (
              |  SELECT vec_id,
              |         $bucketSqlExpr AS bucket
              |  FROM n)
              |SELECT vec_id, bucket FROM b ORDER BY vec_id""".stripMargin),
      doc = "sign-LSH bucketing with deterministic integer hyperplanes (scale path)"),

    Q("s3_bucket_stats",
      (s, d) => lshBuckets(vecs(s, d), 4)
        .groupBy("bucket").agg(count(lit(1)).as("n_vectors"))
        .orderBy("bucket"),
      Some(s"""WITH $fixedSqlCte,
              |b AS (
              |  SELECT vec_id,
              |         $bucketSqlExpr AS bucket
              |  FROM n)
              |SELECT bucket, count(*) AS n_vectors FROM b
              |GROUP BY bucket ORDER BY bucket""".stripMargin),
      doc = "LSH bucket occupancy histogram"),

    Q("s6_ann_recall",
      (s, d) => annRecall(vecs(s, d), 4, 10, 3).orderBy("q_id"),
      Some(s"""WITH $fixedSqlCte,
              |ex AS (
              |  SELECT q_id, neighbor_id FROM (
              |    SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
              |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
              |             ${pairCosSql("a", "b")} DESC, b.vec_id) AS rn
              |    FROM n a JOIN n b ON b.vec_id <> a.vec_id
              |    WHERE a.vec_id < 10)
              |  WHERE rn <= 3),
              |bk AS (SELECT vec_id, $bucketSqlExpr AS bucket FROM n),
              |nb AS (SELECT n.vec_id, n.f, n.nrm, bk.bucket
              |       FROM n JOIN bk ON n.vec_id = bk.vec_id),
              |ap AS (
              |  SELECT q_id, neighbor_id FROM (
              |    SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
              |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
              |             ${pairCosSql("a", "b")} DESC, b.vec_id) AS rn
              |    FROM nb a JOIN nb b
              |      ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
              |    WHERE a.vec_id < 10)
              |  WHERE rn <= 3)
              |SELECT ex.q_id,
              |       CAST(sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
              |       floor(CAST(sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
              |             / 3.0 * 1000000.0 + 0.5) / 1000000.0 AS recall
              |FROM ex LEFT JOIN ap
              |  ON ex.q_id = ap.q_id AND ex.neighbor_id = ap.neighbor_id
              |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin),
      doc = "ANN recall@k: LSH-bucket-restricted top-k vs exact brute force " +
        "per probe query — the approximation-quality monitor"),

    Q("s4_knn_label_vote",
      (s, d) => knnLabelVote(vecs(s, d), 20, 5).orderBy("q_id"),
      Some(s"""WITH $fixedSqlCte,
              |p AS (
              |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
              |         CAST(CAST(list_sum(list_transform(range(1, len(a.f) + 1),
              |                i -> a.f[i] * b.f[i])) AS BIGINT) AS DOUBLE)
              |           / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS cos
              |  FROM n a JOIN n b ON b.vec_id <> a.vec_id
              |  WHERE a.vec_id < 20),
              |r AS (
              |  SELECT q_id, neighbor_id,
              |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
              |  FROM p),
              |v AS (
              |  SELECT q_id, e.label, count(*) AS votes
              |  FROM r JOIN embeddings e ON e.vec_id = r.neighbor_id
              |  WHERE rn <= 5 GROUP BY q_id, e.label),
              |rk AS (
              |  SELECT q_id, label, votes,
              |         row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, label) AS rk
              |  FROM v)
              |SELECT q_id, label AS pred_label, votes FROM rk
              |WHERE rk = 1 ORDER BY q_id""".stripMargin),
      doc = "k-NN majority-label vote over cosine top-k"),
  )
}
