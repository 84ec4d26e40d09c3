package graft

import org.apache.spark.sql.functions._

import graft.operators.Valuation

/** [[graft.operators.Valuation]] — the closed-form KNN-Shapley must
  * reproduce hand-traced recursion values, satisfy the efficiency
  * axiom (values sum to the full-set utility), and stay stable under
  * partitioning. */
class ValuationSpec extends TestBase {

  private def fx: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    // query 10 (label 1) against train {1: cos 1.0 label 1,
    // 2: cos .707 label 0, 3: cos 0 label 1}
    val train = Seq(
      (1L, Seq(2.0f, 0.0f), 1),
      (2L, Seq(1.0f, 1.0f), 0),
      (3L, Seq(0.0f, 1.0f), 1)).toDF("id", "vec", "y")
    val queries = Seq((10L, Seq(1.0f, 0.0f), 1)).toDF("id", "vec", "y")
    (train, queries)
  }

  test("knnShapley: hand-traced K=1 recursion (5/6, −1/6, 1/3) and " +
      "the efficiency axiom") {
    val (train, queries) = fx
    val got = Valuation.knnShapley(train, queries, "id", "vec", "y", 1)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("train_id")).toSeq == Seq(1L, 2L, 3L))
    // s_3 = 1/3; s_2 = 1/3 − 1/2 = −1/6; s_1 = −1/6 + 1 = 5/6
    assert(got.map(_.getAs[Double]("shapley")).toSeq ==
      Seq(0.833333, -0.166667, 0.333333), got.mkString(";"))
    // efficiency: Σ s_i = U(full) = 1[nearest label = query label] = 1
    val sumQ = got.map(_.getAs[Long]("shapley_q")).sum
    assert(math.abs(sumQ - 1000000000000L) <= 2, sumQ.toString)
  }

  test("knnShapley: K=2 hand case, partitioning invariance, and " +
      "null exclusion") {
    import spark.implicits._
    val (train, queries) = fx
    // K=2: s_3 = 1/3; s_2 = 1/3 + (0−1)·min(2,2)/(2·2) = −1/6;
    // s_1 = −1/6 + (1−0)·min(2,1)/(2·1) = 1/3
    val got = Valuation.knnShapley(train, queries, "id", "vec", "y", 2)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Double]("shapley")).toSeq ==
      Seq(0.333333, -0.166667, 0.333333), got.mkString(";"))
    // efficiency at K=2: U(full) = (1/2)(1[y1=y] + 1[y2=y]) = 1/2
    val sumQ = got.map(_.getAs[Long]("shapley_q")).sum
    assert(math.abs(sumQ - 500000000000L) <= 2, sumQ.toString)
    // invariance under repartition
    val g2 = Valuation.knnShapley(train.repartition(7), queries, "id",
      "vec", "y", 2).orderBy("rank").collect()
    assert(got.map(_.toString).toSeq == g2.map(_.toString).toSeq)
    // rows with a null vector drop out of the ranking entirely
    val gn = Valuation.knnShapley(
      train.union(Seq((4L, Option.empty[Seq[Float]], Option(1)))
        .toDF("id", "vec", "y")), queries, "id", "vec", "y", 1)
      .collect()
    assert(gn.length == 3, gn.mkString(";"))
  }

  test("knnShapley: self-pairs are excluded and k is validated") {
    val (train, queries) = fx
    import spark.implicits._
    // a train row sharing the query's id must not rank against it
    val withSelf = train.union(
      Seq((10L, Seq(1.0f, 0.0f), 1)).toDF("id", "vec", "y"))
    val got = Valuation.knnShapley(withSelf, queries, "id", "vec",
      "y", 1).collect()
    assert(got.length == 3 && !got.exists(
      _.getAs[Long]("train_id") == 10L))
    assert(intercept[IllegalArgumentException] {
      Valuation.knnShapley(train, queries, "id", "vec", "y", 0)
    }.getMessage.contains("k"))
  }
}
