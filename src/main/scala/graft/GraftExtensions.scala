package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimilarity

/** Engine extensions: registers the native expressions as SQL functions so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works anywhere the
  * DataFrame API does. Install with
  * `.withExtensions(new GraftExtensions)` on the session builder, or
  * `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimilarity)
    ext.injectFunction(GraftExtensions.sortedJaccard)
    ext.injectFunction(GraftExtensions.multisetIntersect)
    ext.injectFunction(GraftExtensions.sortedArrayContains)
    ext.injectFunction(GraftExtensions.wordShingles)
    ext.injectFunction(GraftExtensions.ngramClip)
    ext.injectFunction(GraftExtensions.charBigramClip)
    ext.injectFunction(GraftExtensions.hilbertIndex)
    ext.injectFunction(GraftExtensions.lcsLength)
    ext.injectFunction(GraftExtensions.tokenEditDistance)
    ext.injectFunction(GraftExtensions.gopherRepetition)
    ext.injectFunction(GraftExtensions.poissonDrawWeights)
    ext.injectFunction(GraftExtensions.squaredDistances)
    ext.injectFunction(GraftExtensions.kmvDistinct)
    GraftExtensions.composites.foreach(ext.injectFunction)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftcompat.ColumnCompat

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName, null, name,
      usage, "", "", "", "", "", "", "built-in")

  val cosineSimilarity: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    info("cosine_similarity",
      "_FUNC_(a, b) - cosine similarity of two array<double> vectors (codegen)"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "cosine_similarity takes exactly 2 arguments")
      CosineSimilarity(exprs.head, exprs(1))
    })

  val sortedJaccard: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_jaccard"),
    info("sorted_jaccard",
      "_FUNC_(a, b) - jaccard of two sorted distinct array<bigint> sets (codegen)"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "sorted_jaccard takes exactly 2 arguments")
      graft.functions.SortedJaccard(exprs.head, exprs(1))
    })

  val multisetIntersect: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("multiset_intersect"),
    info("multiset_intersect",
      "_FUNC_(a, b) - clipped match count of two sorted array<bigint> multisets (codegen)"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "multiset_intersect takes exactly 2 arguments")
      graft.functions.MultisetIntersect(exprs.head, exprs(1))
    })

  val sortedArrayContains: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_array_contains"),
    info("sorted_array_contains",
      "_FUNC_(arr, key) - binary-search membership in a sorted array<string> (codegen)"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "sorted_array_contains takes exactly 2 arguments")
      graft.functions.SortedArrayContains(exprs.head, exprs(1))
    })

  private def litInt(e: Expression, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(s"$arg must be an int literal")
  }

  val wordShingles: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_shingles"),
    info("word_shingles",
      "_FUNC_(text, w) - w-token space-joined shingles, one split per row (codegen)"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "word_shingles takes exactly 2 arguments")
      graft.functions.WordShingles(exprs.head, litInt(exprs(1), "w"))
    })

  val ngramClip: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("ngram_clip"),
    info("ngram_clip",
      "_FUNC_(cand, ref, n) - clipped word-n-gram overlap of two token arrays (codegen)"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3, "ngram_clip takes exactly 3 arguments")
      graft.functions.NgramClip(exprs.head, exprs(1), litInt(exprs(2), "n"))
    })

  val charBigramClip: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_bigram_clip"),
    info("char_bigram_clip",
      "_FUNC_(cand, ref) - clipped character-bigram overlap (the chrF kernel, codegen)"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "char_bigram_clip takes exactly 2 arguments")
      graft.functions.CharBigramClip(exprs.head, exprs(1))
    })

  val hilbertIndex: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hilbert_index"),
    info("hilbert_index",
      "_FUNC_(x, y, bits) - 2-D Hilbert curve index for layout clustering (codegen)"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3, "hilbert_index takes exactly 3 arguments")
      graft.functions.HilbertIndex(exprs.head, exprs(1), litInt(exprs(2), "bits"))
    })

  val lcsLength: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("lcs_length"),
    info("lcs_length",
      "_FUNC_(cand, ref) - longest-common-subsequence length of two token arrays (the ROUGE-L kernel, codegen)"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "lcs_length takes exactly 2 arguments")
      graft.functions.LcsLength(exprs.head, exprs(1))
    })

  val tokenEditDistance: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("token_edit_distance"),
    info("token_edit_distance",
      "_FUNC_(cand, ref) - token-level Levenshtein distance of two token arrays (the WER kernel, codegen)"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "token_edit_distance takes exactly 2 arguments")
      graft.functions.TokenEditDistance(exprs.head, exprs(1))
    })

  val gopherRepetition: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("gopher_repetition"),
    info("gopher_repetition",
      "_FUNC_(text, dupW) - Gopher within-doc repetition stats struct " +
        "(top-bigram/trigram fraction, duplicated-dupW-gram coverage; codegen)"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "gopher_repetition takes exactly 2 arguments")
      graft.functions.GopherRepetition(exprs.head, litInt(exprs(1), "dupW"))
    })

  val poissonDrawWeights: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("poisson_draw_weights"),
    info("poisson_draw_weights",
      "_FUNC_(key, b) - deterministic per-key Poisson(1) bootstrap draw counts for b resamples (codegen)"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "poisson_draw_weights takes exactly 2 arguments")
      graft.functions.PoissonDrawWeights(exprs.head, litInt(exprs(1), "b"))
    })

  val squaredDistances: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("squared_distances"),
    info("squared_distances",
      "_FUNC_(vec, centroids) - squared L2 distance to each row of a " +
        "FOLDABLE array<array<double>> centroid matrix (codegen)"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "squared_distances takes exactly 2 arguments")
      val cents = exprs(1) match {
        case c if c.foldable =>
          // route through a Cast so the natural SQL spelling
          // array(array(0.1, 0.2)) — which parses as DECIMAL literals —
          // reads as doubles instead of dying in toDoubleArray with an
          // opaque ClassCastException
          import org.apache.spark.sql.types.{ArrayType, DoubleType}
          val asDoubles = org.apache.spark.sql.catalyst.expressions.Cast(
            c, ArrayType(ArrayType(DoubleType)))
          require(asDoubles.resolved && asDoubles.checkInputDataTypes().isSuccess,
            s"centroids must be numeric array<array<...>>, got ${c.dataType.sql}")
          val arr = asDoubles.eval(null)
            .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          require(arr != null, "centroid matrix must not be null")
          (0 until arr.numElements()).map { i =>
            val row = arr.getArray(i)
            require(row != null, s"centroid row $i must not be null")
            row.toDoubleArray()
          }.toArray
        case _ => throw new IllegalArgumentException(
          "centroids must be a foldable array<array<double>> literal")
      }
      graft.functions.SquaredDistances(exprs.head, cents)
    })

  /** KMV bottom-k distinct-count sketch as a SQL AGGREGATE — the
    * analyzer wraps a bare AggregateFunction from a registry builder in
    * its AggregateExpression, so `SELECT kmv_distinct(hash, 1024)`
    * works. Takes a pre-hashed LONG (the [[graft.functions.KmvDistinct]]
    * contract — pair with the engine's md5-derived hash, e.g.
    * `CAST(conv(substring(md5(...), 1, 8), 16, 10) AS BIGINT)`, to
    * reproduce `KmvDistinct.onMd5` exactly). */
  val kmvDistinct: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_distinct"),
    info("kmv_distinct",
      "_FUNC_(hash64, k) - approximate distinct count via the bottom-k (KMV) sketch over a pre-hashed LONG; mergeable, k longs of state per group"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "kmv_distinct takes exactly 2 arguments")
      graft.functions.KmvDistinct(exprs.head, litInt(exprs(1), "k"))
    })

  /** Scalar training-data functions exposed to SQL: each is a composition
    * of built-in (codegen'd) expressions, registered by wrapping the
    * Column-level operator — `SELECT lang_id(text) FROM docs` works for
    * pure-SQL users with no DataFrame code. */
  private def composite(name: String, usage: String)(fn: Seq[Column] => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, usage),
      (exprs: Seq[Expression]) =>
        ColumnCompat.resolvedExpression(fn(exprs.map(ColumnCompat.column))))

  val composites: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    composite("lang_id", "_FUNC_(text) - stopword-profile language guess") {
      case Seq(t) => graft.ops.TextAnalysis.langId(t)
    },
    composite("unit_hash", "_FUNC_(id) - deterministic md5 unit-interval hash") {
      case Seq(id) => graft.ops.CorpusOps.unitHash(id)
    },
    composite("token_count", "_FUNC_(text) - whitespace token count") {
      case Seq(t) => graft.ops.TextAnalysis.tokenCount(t)
    },
    composite("redact_pii", "_FUNC_(text) - email/URL/phone redaction") {
      case Seq(t) => graft.ops.TextAnalysis.redactPii(t)
    },
    composite("repetition_score", "_FUNC_(text) - 1 - distinct-token ratio") {
      case Seq(t) => graft.ops.TextAnalysis.repetitionScore(t)
    },
    composite("rolling_hash", "_FUNC_(text) - polynomial fingerprint mod 1e9+7") {
      case Seq(t) => graft.ops.TextAnalysis.rollingHash(t)
    },
    composite("quality_score",
      "_FUNC_(text) - hashed-logistic quality classifier score in (0,1)") {
      case Seq(t) =>
        import org.apache.spark.sql.functions.{exp, lit}
        val z = graft.ops.TextAnalysis.classifierLogit(t)
        lit(1.0) / (lit(1.0) + exp(-z))
    })
}
