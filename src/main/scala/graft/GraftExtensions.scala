package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CmsSketch, CosineSim, Fnv1a32, HashExprs, KmvSketch, ShingleArray, SignBands, SketchAggs, TextExprs, TopKAgg, VectorExprs}

/** Library entry point for Spark's extension mechanism: makes every
  * graft native function available in plain `spark.sql(...)` without any
  * imperative registration call —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * The query-path code uses the same builders via the per-session
  * `register()` helpers (idempotent), so both wiring styles produce
  * identical expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      VectorExprs.cosineSimBuilder))
    ext.injectFunction((
      FunctionIdentifier("lsh_bands"),
      new ExpressionInfo(classOf[SignBands].getName, "lsh_bands"),
      VectorExprs.lshBandsBuilder))
    ext.injectFunction((
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShingleArray].getName, "shingles"),
      TextExprs.shinglesBuilder))
    ext.injectFunction((
      FunctionIdentifier("fnv1a32"),
      new ExpressionInfo(classOf[Fnv1a32].getName, "fnv1a32"),
      HashExprs.fnv1a32Builder))
    ext.injectFunction((
      FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CmsSketch].getName, "cms_sketch"),
      SketchAggs.cmsSketchBuilder))
    ext.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketch].getName, "kmv_sketch"),
      SketchAggs.kmvSketchBuilder))
    ext.injectFunction((
      FunctionIdentifier("topk_rows"),
      new ExpressionInfo(classOf[TopKAgg].getName, "topk_rows"),
      TopKAgg.topkRowsBuilder))
  }
}
