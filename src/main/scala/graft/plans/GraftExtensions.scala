package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** SparkSessionExtensions entry point registering graft's native
  * expressions. Usable both programmatically
  * (`builder.withExtensions(new GraftExtensions)`) and via
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` on a
  * cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BandJoinBinning)
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      CosineSimilarity.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "cosine_similarity expects 2 arguments")
        CosineSimilarity(children.head, children(1))
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("sq_distance"),
      SqDistance.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "sq_distance expects 2 arguments")
        SqDistance(children.head, children(1))
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      DotProduct.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "dot_product expects 2 arguments")
        DotProduct(children.head, children(1))
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      Simhash64.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "simhash64 expects 1 argument")
        Simhash64(children.head)
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("rolling_gram_hash"),
      RollingGramHash.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "rolling_gram_hash expects 2 arguments")
        RollingGramHash(children.head, children(1))
      },
    ))
  }
}
