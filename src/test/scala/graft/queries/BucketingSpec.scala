package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing: pre-bucketing both sides of a recurring
  * join key removes the per-query shuffle entirely — at 100 TB this is the
  * difference between re-exchanging the corpus on every pipeline run and
  * reading co-located buckets. The lineage/manifest join (resume path) and
  * doc-to-extraction joins share hash(doc_id), so both sides bucket by it.
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the join to show its exchange needs
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("bucketed doc tables join without a shuffle exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("docs_bucketed")
    docs.select(col("doc_id"), col("n_chars"))
      .write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("manifest_bucketed")

    val joined = spark.table("docs_bucketed")
      .join(spark.table("manifest_bucketed").withColumnRenamed("n_chars", "m_chars"), "doc_id")
    val plan = joined.queryExecution.executedPlan.toString

    // co-located: SortMergeJoin directly over the bucketed scans
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

    // and it computes the right thing
    val n = joined.count()
    assert(n == docs.count())

    // contrast: the same join over the unbucketed parquet DOES exchange
    val unbucketed = docs.join(
      docs.select(col("doc_id"), col("n_chars").as("m_chars")), "doc_id")
    assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
