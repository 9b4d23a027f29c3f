package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CmEstimate, DotProduct, Fingerprint, HashedTriGrams, InterSize, KllQuantile, KllSketchAgg, SimHashBucket, TemplateMatch, TokenHashes}

/** Engine extensions, registered the idiomatic Spark way:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions` on a cluster.
  *
  * Registers the native codegen'd kernels:
  *  - `graft_template_match(message, id1, regex1, …)` — first-match
  *    template tagger (`graft.functions.TemplateMatch`); ids/regexes
  *    must be string literals (a dimension inlined into the plan, the
  *    same manual broadcast the reference does by collecting its
  *    template table);
  *  - `graft_dot(a, b)` — sequential double-array dot product;
  *  - `graft_simhash(v, planes)` — random-hyperplane LSH bucket;
  *  - `graft_token_hashes(tokens, p)` — portable md5 60-bit token
  *    hashes (mod p when p > 0);
  *  - `graft_fingerprint(tokens, p)` — rolling polynomial document
  *    fingerprint over token hashes;
  *  - `graft_inter_size(a, b)` — |A∩B| of two long-array sets
  *    without materializing the intersection (the Jaccard numerator);
  *  - `graft_cell_argmax(v, centroids)` — IVF cell assignment against
  *    a foldable centroid array as ONE plan node at any k;
  *  - `graft_i8_pack(v)` / `graft_i8_dot(a, b)` — int8 max-abs
  *    quantization codes + exact integer code dot (the quantized
  *    dense index's storage/prefilter kernels);
  *  - `graft_blockhash(payload)` — 63-bit perceptual block hash of an
  *    opaque binary payload (media-grain near-dup digests);
  *  - `graft_tri_grams(words)` — distinct hashed word 3-grams;
  *  - `graft_bloom_contains(bits, v)` — Bloom-filter probe of a long
  *    against a foldable serialized filter (`functions.Bloom`).
  * `planes`/`p` must be integer literals (plan-time parameters).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Rewrite the declarative aggregate(zip_with(...)) dot-product
    // idiom to the native kernel (kill switch:
    // spark.sql.graft.rewriteDotProduct=false).
    ext.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_dot(a, b)")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashBucket].getName, "graft_simhash"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_simhash(v, planes)")
        SimHashBucket(args(0), longLit(args(1), "planes").toInt)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_token_hashes"),
      new ExpressionInfo(classOf[TokenHashes].getName, "graft_token_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_token_hashes(tokens, p)")
        TokenHashes(args(0), longLit(args(1), "p"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_blockhash"),
      new ExpressionInfo(classOf[graft.functions.BlockHash].getName,
        "graft_blockhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "usage: graft_blockhash(payload)")
        graft.functions.BlockHash(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cell_argmax"),
      new ExpressionInfo(classOf[graft.functions.CellArgmax].getName,
        "graft_cell_argmax"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_cell_argmax(v, centroids)")
        graft.functions.CellArgmax(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_i8_pack"),
      new ExpressionInfo(classOf[graft.functions.I8Pack].getName,
        "graft_i8_pack"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "usage: graft_i8_pack(v)")
        graft.functions.I8Pack(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_i8_dot"),
      new ExpressionInfo(classOf[graft.functions.I8Dot].getName,
        "graft_i8_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_i8_dot(a, b)")
        graft.functions.I8Dot(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_pack"),
      new ExpressionInfo(classOf[graft.functions.PqPack].getName,
        "graft_pq_pack"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "usage: graft_pq_pack(codes)")
        graft.functions.PqPack(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_codes"),
      new ExpressionInfo(classOf[graft.functions.PqCodes].getName,
        "graft_pq_codes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "usage: graft_pq_codes(code)")
        graft.functions.PqCodes(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[graft.functions.PqAdc].getName,
        "graft_pq_adc"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_pq_adc(code, lut)")
        graft.functions.PqAdc(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_inter_size"),
      new ExpressionInfo(classOf[InterSize].getName, "graft_inter_size"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_inter_size(a, b)")
        InterSize(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[Fingerprint].getName, "graft_fingerprint"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_fingerprint(tokens, p)")
        Fingerprint(args(0), longLit(args(1), "p"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_extract_long"),
      new ExpressionInfo(classOf[graft.functions.ExtractLongAfter].getName, "graft_extract_long"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_extract_long(str, key)")
        val key = args(1) match {
          case Literal(v: UTF8String, _: StringType) => v.toString
          case other => throw new IllegalArgumentException(
            s"key must be a string literal, got $other")
        }
        graft.functions.ExtractLongAfter(args(0), key)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[graft.functions.NGramHashes].getName, "graft_ngrams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_ngrams(words, n)")
        graft.functions.NGramHashes(args(0), longLit(args(1), "n").toInt)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_try_long"),
      new ExpressionInfo(classOf[graft.functions.TryLong].getName, "graft_try_long"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "usage: graft_try_long(s)")
        graft.functions.TryLong(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_tri_grams"),
      new ExpressionInfo(classOf[HashedTriGrams].getName, "graft_tri_grams"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "usage: graft_tri_grams(words)")
        HashedTriGrams(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[graft.functions.BloomContains].getName,
        "graft_bloom_contains"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_bloom_contains(bits, v)")
        graft.functions.BloomContains(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cm_estimate"),
      new ExpressionInfo(classOf[CmEstimate].getName, "graft_cm_estimate"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_cm_estimate(sketch, item)")
        CmEstimate(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_subwords"),
      new ExpressionInfo(classOf[graft.functions.SubwordCount].getName,
        "graft_subwords"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_subwords(text, vocab_csv)")
        val vocab = args(1) match {
          case Literal(v: UTF8String, _: StringType) => v.toString.split(",").toSeq
          case other => throw new IllegalArgumentException(
            s"vocab_csv must be a string literal, got $other")
        }
        graft.functions.SubwordCount(args(0), vocab)
      }))
    // Aggregate functions: the analyzer wraps a bare AggregateFunction
    // returned by a builder into an AggregateExpression itself, so the
    // registration shape is identical to scalar kernels.
    ext.injectFunction((
      new FunctionIdentifier("graft_kll_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "graft_kll_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "usage: graft_kll_agg(value)")
        KllSketchAgg(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kll_quantile"),
      new ExpressionInfo(classOf[KllQuantile].getName, "graft_kll_quantile"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_kll_quantile(sketch, rank)")
        KllQuantile(args(0), args(1))
      }))
    // Raw-log line kernels (r20): exact byte-scan twins of the parse
    // regexes — see graft.functions.LogLineExprs.
    ext.injectFunction((
      new FunctionIdentifier("graft_log_ts_raw"),
      new ExpressionInfo(classOf[graft.functions.LogTsRaw].getName,
        "graft_log_ts_raw"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "usage: graft_log_ts_raw(line)")
        graft.functions.LogTsRaw(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_log_rest"),
      new ExpressionInfo(classOf[graft.functions.LogRestAfterTs].getName,
        "graft_log_rest"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "usage: graft_log_rest(line)")
        graft.functions.LogRestAfterTs(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_log_block_id"),
      new ExpressionInfo(classOf[graft.functions.LogBlockId].getName,
        "graft_log_block_id"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "usage: graft_log_block_id(line)")
        graft.functions.LogBlockId(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_template_match"),
      new ExpressionInfo(classOf[TemplateMatch].getName, "graft_template_match"),
      (args: Seq[Expression]) => {
        require(args.length >= 3 && args.length % 2 == 1,
          "usage: graft_template_match(message, id1, regex1, ...)")
        def str(e: Expression): String = e match {
          case Literal(v: UTF8String, _: StringType) => v.toString
          case other =>
            throw new IllegalArgumentException(
              s"template ids/regexes must be string literals, got $other")
        }
        val pairs = args.tail.map(str).grouped(2).toSeq
        TemplateMatch(args.head, pairs.map(_.head), pairs.map(_.last))
      }))
  }
}
