package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions installer: makes the engine's native functions
  * available in ANY session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (cluster-wide
  * config, spark-submit, or SparkSession.builder.withExtensions) — no
  * per-session register() call needed.
  *
  * This is the (c)-path registration hook of the custom-operator ladder;
  * the expressions themselves stay plain Catalyst expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsofJoin)
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.cosineName),
      new ExpressionInfo(
        classOf[CosineSimilarity].getName,
        null,
        GraftFunctions.cosineName,
        "_FUNC_(a, b) - cosine similarity of two numeric-array vectors " +
          "in one fused codegen loop (float/long/int read natively)",
        "", "", "", "", "", "", "built-in"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.signBucketsName),
      new ExpressionInfo(
        classOf[SignBuckets].getName,
        null,
        GraftFunctions.signBucketsName,
        "_FUNC_(v, planes) - sign-of-projection LSH bucket id of a " +
          "numeric-array vector against a foldable plane matrix, fused loop",
        "", "", "", "", "", "", "built-in"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SignBuckets(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.projectPlanesName),
      new ExpressionInfo(
        classOf[ProjectPlanes].getName,
        null,
        GraftFunctions.projectPlanesName,
        "_FUNC_(v, planes) - all per-plane dot products of a numeric-array " +
          "vector against a foldable plane matrix as array<double>, fused loop",
        "", "", "", "", "", "", "built-in"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ProjectPlanes(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.quantizeName),
      new ExpressionInfo(
        classOf[QuantizeInt8].getName,
        null,
        GraftFunctions.quantizeName,
        "_FUNC_(a) - fused symmetric int8 quantization of an embedding " +
          "array, returning struct<scale, qvec>",
        "", "", "", "", "", "", "built-in"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        QuantizeInt8(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.winnowName),
      new ExpressionInfo(
        classOf[WinnowFingerprints].getName,
        null,
        GraftFunctions.winnowName,
        "_FUNC_(tokens, k, w) - winnowing fingerprint selection over a " +
          "token array: array<struct<pos, fp>> of each w-gram window's " +
          "minimal 60-bit md5 k-gram hash (rightmost on ties), one fused " +
          "O(G) deque pass per document",
        "", "", "", "", "", "", "built-in"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.winnowBuilder(exprs)))
  }
}
