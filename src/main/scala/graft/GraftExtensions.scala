package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library entry point for cluster deployment: register everything the
  * engine adds to Catalyst in one place, the way Spark intends extension
  * libraries to ship —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or in code:
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * }}}
  *
  * Injects:
  *  - [[graft.plans.TopKStrategy]] — the planner strategy for the custom
  *    TopKPerKey operator (the per-DataFrame fallback in
  *    `TopKPerKey.topKPerKey` self-registers via
  *    `experimental.extraStrategies` for sessions built without
  *    extensions; both paths plan the same physical node);
  *  - `rolling_hash(expr)` — the codegen fingerprint Expression, usable
  *    from SQL text, not just the Column API;
  *  - `dot_product(a, b)` / `sq_l2_dist(a, b)` — the native codegen
  *    vector folds of the embedding tier, so SQL-text pipelines rank and
  *    verify embeddings at the same speed as the Column API (the
  *    interpreted `aggregate`/`zip_with` spelling is ~30× slower per
  *    evaluation);
  *  - `canonicalize_url(url)` / `url_domain(url)` — the crawl-curation
  *    URL normalizers as SQL macros: the builder expands the Column
  *    composition into the same standard-expression tree, so SQL text
  *    and Column pipelines share one definition of "canonical";
  *  - `nfc_normalize(text)` — the Unicode-composition codegen Expression
  *    — and `normalize_text(text)`, the full cleanup chain
  *    (NBSP → control strip → whitespace collapse → NFC, composition
  *    LAST per [[graft.operators.TextAnalysis.normalizeText]]'s
  *    idempotence contract) as a macro over it, so SQL text and Column
  *    pipelines share one definition of "clean text".
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // rewrite row_number()<=k window filters into the bounded-heap TopK
    // operator (guarded by spark.graft.topkRewrite.maxK)
    extensions.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    extensions.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[graft.functions.RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "rolling_hash takes exactly one argument")
        graft.functions.RollingHash(args.head)
      }))
    def binary(name: String, clazz: Class[_],
               mk: (Expression, Expression) => Expression): Unit =
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (args: Seq[Expression]) => {
          require(args.length == 2, s"$name takes exactly two arguments")
          mk(args.head, args(1))
        }))
    binary("dot_product", classOf[graft.functions.DotProduct],
      graft.functions.DotProduct(_, _))
    binary("sq_l2_dist", classOf[graft.functions.SqL2Dist],
      graft.functions.SqL2Dist(_, _))
    extensions.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize takes exactly one argument")
        graft.functions.NfcNormalize(args.head)
      }))
    // Column-composition macros: the registered builder expands to the
    // same standard-expression tree the Column API builds, so SQL text
    // and Column pipelines share one canonicalization definition (and
    // whole-stage codegen applies to both — there is no UDF here)
    def macro1(name: String, f: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column): Unit =
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(graft.operators.UrlOps.getClass.getName, name),
        (args: Seq[Expression]) => {
          require(args.length == 1, s"$name takes exactly one argument")
          org.apache.spark.sql.graftbridge.Bridge.convertedExpression(
            f(org.apache.spark.sql.graftbridge.Bridge.column(args.head)))
        }))
    macro1("canonicalize_url", graft.operators.UrlOps.canonicalizeUrl)
    macro1("url_domain", graft.operators.UrlOps.urlDomain)
    macro1("normalize_text", graft.operators.TextAnalysis.normalizeText)
  }
}
