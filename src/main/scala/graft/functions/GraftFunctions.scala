package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Public surface of the graft engine — Column API + SQL registration for
 * every function the reference exposes (/root/reference/src/lib.rs:43-51),
 * re-expressed as native Catalyst aggregates.
 *
 * SQL names are `graft_`-prefixed so Spark's built-ins with different
 * semantics (`kurtosis` = population in Spark, sample-corrected in the
 * reference) are never silently shadowed.
 */
object GraftFunctions {

  private def agg(e: Expression): Column =
    ColumnBridge.column(e match {
      case a: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction =>
        a.toAggregateExpression()
      case other => other
    })

  private def ex(c: Column): Expression = ColumnBridge.expression(c)

  /** Cast-to-double at construction (AbstractDataType is private[sql] in
    * Spark 4, so implicit input-type coercion is done explicitly). */
  private def d(e: Expression): Expression = Cast(e, DoubleType)

  // ── reference surface ────────────────────────────────────────────────
  /** Sample (bias-corrected) excess kurtosis — reference `kurtosis`. */
  def kurtosis_samp(c: Column): Column = agg(GraftKurtosis(d(ex(c))))

  /** Population excess kurtosis — reference `kurtosis_pop`. */
  def kurtosis_pop(c: Column): Column = agg(GraftKurtosisPop(d(ex(c))))

  /** Sample (bias-corrected) skewness — reference `skewness`. */
  def skewness_samp(c: Column): Column = agg(GraftSkewness(d(ex(c))))

  /** Most frequent value; reference tie-break (max value, min for strings). */
  def mode_agg(c: Column): Column = agg(GraftMode(ex(c)))

  /** Element-wise mean of an array<double> column — one-shuffle centroid
    * aggregation with O(dim) map-side state (see
    * [[graft.functions.VectorMean]]). */
  def vector_mean(c: Column): Column = agg(VectorMean(ex(c)))

  /** Exact covariance sufficient statistics of a QUANTIZED array<bigint>
    * vector column: one O(d²) map-side state instead of a d²-row
    * explode per vector (see [[graft.functions.VectorOuterSum]];
    * [[graft.ops.Similarity.embedCovariance]] is the user entry). */
  def vector_outer_sum(c: Column): Column = agg(VectorOuterSum(ex(c)))

  /** Per-group KMV distinct-count estimate: at most k longs of state per
    * group vs countDistinct's full distinct-set shuffle (see
    * [[graft.functions.KmvDistinctAgg]]). */
  def kmv_distinct(c: Column, k: Int): Column =
    agg(KmvDistinctAgg(Cast(ex(c), org.apache.spark.sql.types.StringType), k))

  /** Bounded top-k per group: the k best (id, score) pairs, score desc,
    * ties → least id — O(k) state per group instead of a window sort of
    * every member (see [[graft.functions.TopKBy]]). */
  def topk_by(id: Column, score: Column, k: Int): Column =
    agg(TopKBy(ex(id), ex(score), k))

  /** Byte-based classic Jaro-Winkler similarity (DuckDB-contract:
    * window max/2−1, prefix ≤ 4 at 0.1 above jaro 0.7, empty → 0) —
    * codegen'd native expression, see [[graft.functions.JaroWinkler]]. */
  def jaro_winkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(ex(a), ex(b)))

  /** Journey-prefix aggregate: the labels of the group's k EARLIEST
    * rows (by ts, ties by id) joined with ">" — O(k) state, order-free
    * merge, usable under `session_window` in streaming (see
    * [[graft.functions.PathPrefix]]). */
  def path_prefix(ts: Column, id: Column, label: Column, k: Int): Column =
    agg(PathPrefix(ex(ts), ex(id), ex(label), k))

  /** Deterministic (md5-based) HyperLogLog distinct estimate with 2^b
    * byte registers — engine-replayable `approx_count_distinct` (see
    * [[graft.functions.HllSketchAgg]]). */
  def hll_distinct(c: Column, b: Int): Column =
    agg(HllSketchAgg(Cast(ex(c), org.apache.spark.sql.types.StringType), b))

  /** HLL register array (2^b bytes) as a mergeable value — pair with
    * [[hll_merge_est]] for rolling/rollup distinct counts (see
    * [[graft.functions.HllRegistersAgg]]). */
  def hll_registers(c: Column, b: Int): Column =
    agg(HllRegistersAgg(Cast(ex(c), org.apache.spark.sql.types.StringType), b))

  /** Merge [[hll_registers]] sketches (element-wise max; nulls skipped)
    * and return the distinct estimate. */
  def hll_merge_est(c: Column, b: Int): Column =
    agg(HllMergeAgg(ex(c), b))

  /** Fixed-grid histogram bin counts over [lo, hi) — O(nbins) mergeable
    * state; the streaming-safe carrier for windowed quantile estimation
    * (see [[graft.functions.HistogramAgg]]). */
  def histogram(c: Column, lo: Double, hi: Double, nbins: Int): Column =
    agg(HistogramAgg(Cast(ex(c), DoubleType), lo, hi, nbins))

  /** Value of `x` at the max of `y` (null `y` ignored; ties arbitrary).
    * Built as the Catalyst MaxBy node directly — NOT
    * `functions.max_by`, which on Spark 4 is `Column.fn("max_by", …)`
    * and resolves by NAME through the session registry, so in a
    * session that called [[registerReferenceNames]] the built-in form
    * silently flips to null-key-WINS semantics. */
  def max_by(x: Column, y: Column): Column =
    agg(org.apache.spark.sql.catalyst.expressions.aggregate.MaxBy(ex(x), ex(y)))

  /** Value of `x` at the min of `y` (null `y` ignored; ties arbitrary).
    * Direct Catalyst MinBy — registry-shadowing-immune (see [[max_by]]). */
  def min_by(x: Column, y: Column): Column =
    agg(org.apache.spark.sql.catalyst.expressions.aggregate.MinBy(ex(x), ex(y)))

  /** Deterministic max_by: ties on `y` broken by greatest `x`. Rows with
    * null `y` are ignored — the struct ordering key is nulled whole,
    * because struct(null, x) is itself non-null and would otherwise
    * re-enter the comparison (an all-null-y group must yield NULL, the
    * reference's null/empty-input semantics, max_min_by.rs:216-470). */
  def max_by_det(x: Column, y: Column): Column =
    agg(org.apache.spark.sql.catalyst.expressions.aggregate.MaxBy(
      ex(x), ex(when(y.isNotNull, struct(y, x)))))

  /** Deterministic min_by: ties on `y` broken by least `x`; null `y`
    * rows ignored (see [[max_by_det]]). Direct Catalyst MinBy so the
    * behavior is immune to name shadowing (see [[max_by_ref]]). */
  def min_by_det(x: Column, y: Column): Column =
    agg(org.apache.spark.sql.catalyst.expressions.aggregate.MinBy(
      ex(x), ex(when(y.isNotNull, struct(y, x)))))

  /**
   * EXACT reference-replay max_by. The reference rewrites
   * `max_by(x, y)` to `last_value(x ORDER BY y ASC NULLS LAST)`
   * (max_min_by.rs:99 `Sort::new(second_arg, true, false)`), so a row
   * whose ORDERING key is NULL sorts after every real value and WINS —
   * tests/main.rs:177-190 pin `max_by` over (1,10),(2,NULL),(3,15),
   * (NULL,8) to 2, not 3. [[max_by_det]] deliberately follows the
   * Spark/DuckDB convention instead (null keys ignored); this variant
   * replays the reference snapshot bit-for-bit. Among several null-key
   * rows the reference is input-order-dependent; here the tie breaks
   * deterministically to the greatest `x` (the only delta, and only on
   * that nondeterministic edge).
   */
  def max_by_ref(x: Column, y: Column): Column = {
    // direct Catalyst MaxBy, NOT functions.max_by: the Column form
    // resolves "max_by" by NAME through the registry, which recurses
    // forever in a session where registerReferenceNames shadowed it
    val key = struct(y.isNull.cast("int").as("n"), y.as("y"), x.as("x"))
    agg(org.apache.spark.sql.catalyst.expressions.aggregate.MaxBy(ex(x), ex(key)))
  }

  /**
   * EXACT reference-replay min_by: `last_value(x ORDER BY y DESC NULLS
   * LAST)` (max_min_by.rs:196 `Sort::new(second_arg, false, false)`) —
   * null ordering keys win min_by TOO (tests/main.rs:192-204 pin the
   * same NULL-keyed row 2 as the answer). A single MinBy over a struct
   * whose lead rank is 0 for null keys (sorting below every real row),
   * then the real `y`, ties to least `x` (the det-variant direction;
   * the reference is input-order-dependent on ties).
   */
  def min_by_ref(x: Column, y: Column): Column = {
    val key = struct(y.isNotNull.cast("int").as("n"), y.as("y"), x.as("x"))
    agg(org.apache.spark.sql.catalyst.expressions.aggregate.MinBy(ex(x), ex(key)))
  }

  /**
   * Scalable two-shuffle mode: groupBy(keys :+ value).count, then per keys
   * pick the value with (max count, reference tie-break). O(1) state per
   * reducer key — the 100 TB path for high-cardinality value columns.
   * Tie-break matches GraftMode: strings → min value, else max value.
   */
  def modeBy(df: DataFrame, keys: Seq[String], value: String, isStringTieMin: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted = df.filter(col(value).isNotNull)
      .groupBy((keys :+ value).map(col): _*).agg(count(lit(1)).as("__cnt"))
    val ord = if (isStringTieMin) col(value).asc else col(value).desc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__cnt").desc, ord)
    counted.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((keys.map(col) :+ col(value).as(s"mode_$value")): _*)
  }

  /** Arity-checked unary builder (matches the reference's exact Float64
    * signature erroring on wrong arity). */
  private def unary(name: String, f: Expression => Expression): Seq[Expression] => Expression = {
    case Seq(e) => f(e)
    case other =>
      throw new IllegalArgumentException(
        s"$name requires exactly 1 argument, got ${other.size}")
  }

  /** Register every graft SQL function in the session registry. */
  def registerAll(spark: SparkSession): Unit = {
    val fns: Seq[(String, Expression => Expression)] = Seq(
      "graft_kurtosis" -> (e => GraftKurtosis(Cast(e, DoubleType))),
      "graft_kurtosis_pop" -> (e => GraftKurtosisPop(Cast(e, DoubleType))),
      "graft_skewness" -> (e => GraftSkewness(Cast(e, DoubleType))),
      "graft_mode" -> (e => GraftMode(e)),
      "graft_vector_mean" -> (e => VectorMean(
        Cast(e, org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = true)))),
      "graft_vector_outer_sum" -> (e => VectorOuterSum(e)),
      // parity aliases for the non-conflicting reference names
      "kurtosis_pop" -> (e => GraftKurtosisPop(Cast(e, DoubleType))),
      "kurtosis_samp" -> (e => GraftKurtosis(Cast(e, DoubleType))),
      "skewness_samp" -> (e => GraftSkewness(Cast(e, DoubleType)))
    )
    fns.foreach { case (name, f) =>
      ColumnBridge.registerFunction(spark, name, unary(name, f))
    }
    // graft_kmv(x, k) — k must be a foldable integer literal
    ColumnBridge.registerFunction(spark, "graft_kmv", {
      case Seq(x, kExpr) if kExpr.foldable =>
        KmvDistinctAgg(Cast(x, org.apache.spark.sql.types.StringType),
          kExpr.eval().asInstanceOf[Number].intValue())
      case other =>
        throw new IllegalArgumentException(
          s"graft_kmv requires (value, k-literal), got ${other.size} args")
    })
    // graft_topk(id, score, k) — k must be a foldable integer literal
    ColumnBridge.registerFunction(spark, "graft_topk", {
      case Seq(id, score, kExpr) if kExpr.foldable =>
        TopKBy(id, Cast(score, DoubleType),
          kExpr.eval().asInstanceOf[Number].intValue())
      case other =>
        throw new IllegalArgumentException(
          s"graft_topk requires (id, score, k-literal), got ${other.size} args")
    })
    // graft_path_prefix(ts, id, label, k) — the earliest-k journey
    // aggregate in SQL (usable under session_window there too)
    ColumnBridge.registerFunction(spark, "graft_path_prefix", {
      case Seq(ts, id, label, kExpr) if kExpr.foldable =>
        PathPrefix(ts, id, label,
          kExpr.eval().asInstanceOf[Number].intValue())
      case other =>
        throw new IllegalArgumentException(
          s"graft_path_prefix requires (ts, id, label, k-literal), got ${other.size} args")
    })
    // graft_hll(x, b) — b must be a foldable integer literal
    ColumnBridge.registerFunction(spark, "graft_hll", {
      case Seq(x, bExpr) if bExpr.foldable =>
        HllSketchAgg(Cast(x, org.apache.spark.sql.types.StringType),
          bExpr.eval().asInstanceOf[Number].intValue())
      case other =>
        throw new IllegalArgumentException(
          s"graft_hll requires (value, b-literal), got ${other.size} args")
    })
    // graft_histogram(x, lo, hi, nbins) — fixed-grid bin counts;
    // lo/hi/nbins must be foldable literals
    ColumnBridge.registerFunction(spark, "graft_histogram", {
      case Seq(x, loE, hiE, nbE) if loE.foldable && hiE.foldable && nbE.foldable =>
        // SQL double literals fold to Decimal, not java.lang.Number
        def d(e: Expression): Double = e.eval() match {
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case n: Number => n.doubleValue()
          case other => throw new IllegalArgumentException(
            s"graft_histogram bound must be numeric, got $other")
        }
        HistogramAgg(Cast(x, DoubleType), d(loE), d(hiE),
          nbE.eval().asInstanceOf[Number].intValue())
      case other =>
        throw new IllegalArgumentException(
          s"graft_histogram requires (value, lo, hi, nbins literals), got ${other.size} args")
    })
    // graft_bloom_build(x, mBits, k) / graft_bloom_hits(bits, grams, mBits, k)
    // — the SQL face of the runtime-filter / decontamination pair;
    // mBits and k must be foldable integer literals
    def lit(e: Expression, what: String): Int =
      if (e.foldable) e.eval().asInstanceOf[Number].intValue()
      else throw new IllegalArgumentException(s"$what must be a literal")
    ColumnBridge.registerFunction(spark, "graft_bloom_build", {
      case Seq(x, m, k) =>
        BloomBitsAgg(Cast(x, org.apache.spark.sql.types.StringType),
          lit(m, "mBits"), lit(k, "numHashes"))
      case other =>
        throw new IllegalArgumentException(
          s"graft_bloom_build requires (value, mBits, k), got ${other.size} args")
    })
    ColumnBridge.registerFunction(spark, "graft_bloom_hits", {
      case Seq(bits, grams, m, k) =>
        BloomHitCount(bits, grams, lit(m, "mBits"), lit(k, "numHashes"))
      case other =>
        throw new IllegalArgumentException(
          s"graft_bloom_hits requires (bits, grams, mBits, k), got ${other.size} args")
    })
    registerTextFunctions(spark)
  }

  /** Lift a Column→Column pipeline function into a SQL builder. */
  private def unaryCol(name: String, f: Column => Column): Seq[Expression] => Expression = {
    case Seq(e) => ex(f(ColumnBridge.column(e)))
    case other =>
      throw new IllegalArgumentException(
        s"$name requires exactly 1 argument, got ${other.size}")
  }

  /**
   * SQL surface for the text-pipeline operators: everything in
   * [[graft.ops.TextOps]] callable from `spark.sql` (so a pure-SQL user
   * has the full pipeline, not just the aggregates). Registered by
   * [[registerAll]].
   */
  def registerTextFunctions(spark: SparkSession): Unit = {
    import graft.ops.TextOps
    val fns: Seq[(String, Column => Column)] = Seq(
      "graft_tokens" -> (TextOps.tokensNative(_)),
      "graft_langid" -> (TextOps.langIdText(_)),
      "graft_quality" -> (TextOps.qualityScore(_)),
      "graft_text_stats" -> (TextOps.textStats(_)),
      "graft_token_count_ws" -> (TextOps.tokenCountWs(_)),
      "graft_token_count_bpe" -> (TextOps.tokenCountBpe(_)),
      "graft_fingerprint" -> (TextOps.fingerprint(_)),
      "graft_simhash" -> (c => TextOps.simhash64(TextOps.tokensNative(c))),
      "graft_shingles" -> (TextOps.tokenShingles(_)),
      // the r15-r17 crawl family — a pure-SQL user gets the whole
      // page-cleaning chain, not just the classic text metrics
      "graft_extract_html" -> (TextOps.extractHtmlText(_)),
      "graft_normalize_text" -> (TextOps.normalizeUnicode(_)),
      "graft_mojibake" -> (TextOps.mojibakeScore(_)),
      "graft_langid_cjk" -> (TextOps.langIdCjk(_)),
      "graft_token_count_cjk" -> (TextOps.tokenCountCjk(_)),
      "graft_redact" -> (TextOps.redact(_)),
      "graft_redact_pii" -> (TextOps.redactPii(_)),
      "graft_gopher_keep" -> (TextOps.gopherKeep(_)),
      "graft_canonical_url" -> (TextOps.canonicalUrl(_)),
      // the r18 byte-level tokenizer family
      "graft_pretokenize" -> (TextOps.preTokenize(_)),
      "graft_byte_units" -> (c => TextOps.byteLevelUnits(TextOps.preTokenize(c))),
      // the r19 link-graph family
      "graft_extract_hrefs" -> (TextOps.extractHrefs(_))
    )
    fns.foreach { case (name, f) =>
      ColumnBridge.registerFunction(spark, name, unaryCol(name, f))
    }
    ColumnBridge.registerFunction(spark, "graft_minhash", {
      case Seq(e, Literal(k: Int, _)) =>
        MinHashSignature(
          ex(TextOps.tokenShingles(ColumnBridge.column(e))), k)
      case other =>
        throw new IllegalArgumentException(
          s"graft_minhash requires (text, k int literal), got $other")
    })
    // pairwise similarity: cosine over embeddings, Jaccard over texts
    def binaryCol(name: String, f: (Column, Column) => Column): Seq[Expression] => Expression = {
      case Seq(a, b) => ex(f(ColumnBridge.column(a), ColumnBridge.column(b)))
      case other => throw new IllegalArgumentException(
        s"$name requires exactly 2 arguments, got ${other.size}")
    }
    ColumnBridge.registerFunction(spark, "graft_cosine", binaryCol("graft_cosine", (a, b) => {
      import graft.ops.Similarity
      val (ad, bd) = (Similarity.toDouble(a), Similarity.toDouble(b))
      Similarity.dot(ad, bd) / (Similarity.l2norm(ad) * Similarity.l2norm(bd))
    }))
    ColumnBridge.registerFunction(spark, "graft_jaro_winkler",
      binaryCol("graft_jaro_winkler", (a, b) => jaro_winkler(a, b)))
    ColumnBridge.registerFunction(spark, "graft_jaccard", binaryCol("graft_jaccard", (a, b) => {
      val sa = array_distinct(TextOps.shingles3(TextOps.tokens(a)))
      val sb = array_distinct(TextOps.shingles3(TextOps.tokens(b)))
      val inter = size(array_intersect(sa, sb)).cast("double")
      inter / ((size(sa) + size(sb)).cast("double") - inter)
    }))
    // graft_srp(vec, planes, dim) — the SRP sign signature as SQL, so a
    // pure-SQL user can band/bucket embeddings for LSH dedup/ANN the
    // same way the Scala pipeline does (identical md5-seeded planes)
    ColumnBridge.registerFunction(spark, "graft_srp", {
      case Seq(v, p, d) if p.foldable && d.foldable =>
        SrpSignature(
          Cast(v, org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = true)),
          p.eval().asInstanceOf[Number].intValue(),
          d.eval().asInstanceOf[Number].intValue())
      case other =>
        throw new IllegalArgumentException(
          s"graft_srp requires (vector, planes-literal, dim-literal), got ${other.size} args")
    })
  }

  /**
   * Drop-in compatibility with the reference's SQL names
   * (/root/reference/src/lib.rs:43-51): registers `mode`, `skewness`,
   * `kurtosis`, `kurtosis_pop` with the REFERENCE semantics, shadowing
   * Spark's built-ins for this session (Spark's `skewness`/`kurtosis`
   * are population statistics; the reference's are sample
   * bias-corrected). Opt-in on purpose — call it only when migrating
   * reference SQL verbatim. `max_by`/`min_by` are ALSO shadowed, with
   * the reference's null-key-WINS semantics (the `*_ref` builders
   * below) — which diverges from Spark's null-ignoring built-ins, and
   * affects ANY name-resolved `max_by`/`min_by` in the same session
   * (Spark 4's `functions.max_by` is `Column.fn`, i.e. registry
   * resolution). Library operators are immune: they build the Catalyst
   * MinBy/MaxBy nodes directly ([[max_by]]/[[min_by]]/[[max_by_det]]/
   * [[min_by_det]]), proven by the shadowed-session spec.
   */
  def registerReferenceNames(spark: SparkSession): Unit = {
    val fns: Seq[(String, Expression => Expression)] = Seq(
      "mode" -> (e => GraftMode(e)),
      "skewness" -> (e => GraftSkewness(Cast(e, DoubleType))),
      "kurtosis" -> (e => GraftKurtosis(Cast(e, DoubleType))),
      "kurtosis_pop" -> (e => GraftKurtosisPop(Cast(e, DoubleType)))
    )
    fns.foreach { case (name, f) =>
      ColumnBridge.registerFunction(spark, name, unary(name, f))
    }
    // max_by/min_by differ from Spark's built-ins in the reference: a
    // NULL ordering key WINS (last_value ... NULLS LAST rewrite,
    // max_min_by.rs:99,196) — verbatim-migrated SQL gets the snapshot
    // semantics via the *_ref builders, not the ignore-nulls built-ins
    def binaryRef(name: String, f: (Column, Column) => Column): Unit =
      ColumnBridge.registerFunction(spark, name, {
        case Seq(x, y) => ex(f(ColumnBridge.column(x), ColumnBridge.column(y)))
        case other => throw new IllegalArgumentException(
          s"$name requires exactly 2 arguments, got ${other.size}")
      })
    binaryRef("max_by", max_by_ref)
    binaryRef("min_by", min_by_ref)
  }
}
