package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.types.{ArrayType, ByteType}

/** q87 int8 ANN: storage really is 1-byte-per-dimension, the quantized
  * score stays within the O(1/127) analytic envelope of the exact cosine,
  * and ranking quality against the exact q40 baseline holds the measured
  * floor (14/15 on sf0.001 at round 12; pinned at >= 12/15 so genuine
  * regressions trip without chasing rank flips on near-ties).
  */
class QuantizedAnnSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val d = "/root/testdata/sf0.001"

  test("quantized vectors are array<tinyint> and the plan broadcasts queries") {
    val df = QuantizedAnn.q87Int8Ann(spark, d)
    // the quantized column's type is visible on the pre-ranked relation;
    // reconstruct it via the public query's analyzed child instead of
    // reaching into internals: check the join inputs carry ByteType arrays
    val arrays = df.queryExecution.analyzed.collect {
      case p => p.output.filter(a =>
        a.dataType.isInstanceOf[ArrayType] &&
          a.dataType.asInstanceOf[ArrayType].elementType == ByteType)
    }.flatten
    assert(arrays.nonEmpty, "no array<tinyint> column anywhere in the plan")

    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan
    val bhj = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bhj.nonEmpty, s"query side must broadcast:\n$plan")
    val smj = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.isEmpty, s"no sort-merge join expected:\n$plan")
  }

  test("quantized cosine within 0.02 of exact; recall@3 vs q40 >= 12/15") {
    val exact = SimilarityQueries.q40CosineTopK(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    val quant = QuantizedAnn.q87Int8Ann(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    val quantMap = quant.toMap

    // score agreement on the exact top set (where both define the pair)
    for (((qid, nid), cos) <- exact; qcos <- quantMap.get((qid, nid)))
      assert(math.abs(cos - qcos) <= 0.02,
        s"quantization error too large for ($qid,$nid): exact=$cos int8=$qcos")

    val exactSets = exact.groupBy(_._1._1).view
      .mapValues(_.map(_._1._2).toSet).toMap
    val quantSets = quant.groupBy(_._1._1).view
      .mapValues(_.map(_._1._2).toSet).toMap
    assert(exactSets.keySet == quantSets.keySet)
    val hits = exactSets.map { case (qid, s) =>
      (s intersect quantSets(qid)).size
    }.sum
    assert(hits >= 12, s"recall@3 degraded: $hits/15 overlap with exact top-3")
  }
}
