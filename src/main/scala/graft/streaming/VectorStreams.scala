package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming twins of the embedding-space operators — the ingest half of
  * the [[graft.operators.Similarity]] deploy story: a stored k-means
  * clustering ([[graft.operators.Similarity.saveKmeansModel]]) scores
  * arriving vectors row-locally, and the SemDeDup near-duplicate gate
  * runs incrementally against cluster-scoped state, so the training-data
  * pipeline drops semantic re-uploads AT ingest instead of re-clustering
  * the archive per batch.
  *
  * Reference scope: the reference engine (survey §2) has no streaming or
  * vector surface; these follow the published SemDeDup construction
  * (arXiv:2303.09540) re-expressed over Structured Streaming state, the
  * same pattern as [[DedupStreams]]/[[MediaStreams]].
  */
object VectorStreams {

  /** A streamed vector's cluster assignment (the
    * [[graft.operators.Similarity.kmeansAssignWith]] row, at ingest).
    */
  final case class VecAssign(vecId: Long, cid: Long, d2: Double)

  /** One stored cluster member: id, double vector, precomputed norm. */
  final case class VecMember(vecId: Long, v: Array[Double], nrm: Double)

  /** A gate verdict: `keep = false` means some EARLIER arrival in the
    * same cluster (`dupOf`, the smallest matching id) reached `minSim`
    * cosine — the SemDeDup keep-first drop, incrementally.
    */
  final case class SemDedupVerdict(vecId: Long, cid: Long, dupOf: Long,
      sim: Double, keep: Boolean)

  /** Tag arriving embeddings with their nearest STORED centroid — the
    * streaming face of [[graft.operators.Similarity.kmeansAssignWith]]:
    * the centroid table is static (one broadcast row of packed
    * centroids), the assignment is a pure row-local argmin projection,
    * so the stream carries ZERO state and the scored rows are
    * bit-identical to the batch scorer (parity pinned in
    * VectorStreamsSpec).
    */
  def streamingKmeansAssign(embeddings: DataFrame,
      centroids: DataFrame): Dataset[VecAssign] = {
    import embeddings.sparkSession.implicits._
    graft.operators.Similarity.kmeansAssignWith(embeddings, centroids)
      .select(col("vec_id").as("vecId"), col("cid"), col("d2"))
      .as[VecAssign]
  }

  /** Per-cluster stateful SemDeDup verifier: each arriving vector
    * compares (exact rounded cosine, the
    * [[graft.operators.Similarity.cosineTopK]] contract) against every
    * EARLIER arrival of its cluster — stored members plus
    * earlier-in-batch rows — and drops when any reaches `minSim`. ALL
    * arrivals under the cap are stored, dropped ones included, exactly
    * as the batch rule compares against dropped lower-id mates too; with
    * id-ordered arrivals the verdicts equal the batch
    * [[graft.operators.Similarity.semDedupWith]] flags (parity pinned in
    * VectorStreamsSpec; out-of-order ingest replaces the id-order rule
    * with arrival order — the one declared divergence). Clusters cap at
    * `maxBucket` stored members; past it, later arrivals are gated
    * against the stored prefix but no longer stored (bounded state — the
    * batch op instead LSH-delegates oversized clusters, a declared
    * difference of the streaming shape).
    */
  final class ClusterDedupGate(minSim: Double, maxBucket: Int,
      ttl: Option[java.time.Duration] = None)
      extends StatefulProcessor[Long, (Long, Long, Array[Double], Double), SemDedupVerdict] {
    @transient private var seen: org.apache.spark.sql.streaming.ListState[VecMember] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[VecMember](
        "seen", Encoders.product[VecMember],
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))

    private def cos(a: VecMember, b: VecMember): Double = {
      val nn = a.nrm * b.nrm
      if (nn == 0d) -1.0
      else {
        var d = 0.0
        var i = 0
        while (i < a.v.length && i < b.v.length) { d += a.v(i) * b.v(i); i += 1 }
        // the batch contract: round(dot/(na*nb), 4) — Spark round is
        // BigDecimal HALF_UP, replicated here so stream == batch exactly
        BigDecimal(d / nn).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      }
    }

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Array[Double], Double)],
        timerValues: TimerValues): Iterator[SemDedupVerdict] = {
      val prior = seen.get().toArray
      val batch = scala.collection.mutable.ArrayBuffer.empty[VecMember]
      val out = scala.collection.mutable.ArrayBuffer.empty[SemDedupVerdict]
      var stored = prior.length
      rows.foreach { case (vecId, cid, v, nrm) =>
        val m = VecMember(vecId, v, nrm)
        var dupOf = -1L
        var dupSim = 0.0
        def consider(o: VecMember): Unit = if (o.vecId != m.vecId) {
          val s = cos(o, m)
          if (s >= minSim && (dupOf < 0 || o.vecId < dupOf)) {
            dupOf = o.vecId; dupSim = s
          }
        }
        prior.foreach(consider)
        batch.foreach(consider)
        out += SemDedupVerdict(vecId, cid, dupOf, dupSim, dupOf < 0)
        if (stored < maxBucket) {
          batch += m
          stored += 1
        }
      }
      batch.foreach(seen.appendValue)
      out.iterator
    }
  }

  /** Incremental SemDeDup at ingest — the streaming twin of
    * [[graft.operators.Similarity.semDedupWith]]: arriving embeddings
    * assign row-locally to the STORED clustering
    * ([[streamingKmeansAssign]]'s projection) and verify against
    * per-cluster state with the exact rounded-cosine contract. Emits one
    * verdict per arrival in its own batch; `keep = false` rows are the
    * semantic re-uploads a training pipeline quarantines before they
    * reach the corpus.
    *
    * Scale shape: the centroid table is one broadcast row; candidate
    * comparisons are cluster-scoped (Σcluster² amortized over arrival,
    * exactly the batch op's blocking); per-cluster state is the member
    * list, bounded by `maxBucket` and optionally `ttl` for
    * duplicates-against-recent on endless streams.
    */
  def streamingSemDedup(embeddings: DataFrame, centroids: DataFrame,
      minSim: Double = 0.6, maxBucket: Int = 4096,
      ttl: Option[java.time.Duration] = None): Dataset[SemDedupVerdict] = {
    import embeddings.sparkSession.implicits._
    graft.operators.Similarity.kmeansAssignFullWith(embeddings, centroids)
      .select(col("vec_id"), col("cid"), col("v"), col("nrm"))
      .as[(Long, Long, Array[Double], Double)]
      .groupByKey(_._2)
      .transformWithState(new ClusterDedupGate(minSim, maxBucket, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** One ANN result row: query, neighbor, rounded cosine, rank. */
  final case class AnnMatch(queryId: Long, nbrId: Long, sim: Double,
      rnk: Int)

  /** Per-query top-k selector for [[streamingIvfTopK]]: a query is ONE
    * streaming row, so all its scored candidates arrive inside its own
    * micro-batch — zero carried state. Ordering replicates the batch
    * window exactly: sim desc (already rounded on the 4dp grid), ties to
    * the smaller neighbor id.
    */
  final class BatchTopK(k: Int)
      extends StatefulProcessor[Long, (Long, Long, Double), AnnMatch] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Double)],
        timerValues: TimerValues): Iterator[AnnMatch] = {
      rows.toArray.sortBy(t => (-t._3, t._2)).take(k).zipWithIndex
        .map { case ((_, n, s), i) => AnnMatch(key, n, s, i + 1) }
        .iterator
    }
  }

  /** ANN search at ingest — the streaming twin of
    * [[graft.operators.Similarity.ivfTopKIndexed]] over a stored
    * [[graft.operators.Similarity.buildIvfIndex]] artifact: each
    * arriving query vector selects its `nProbe` nearest index cells
    * ROW-LOCALLY (the batch op's query-partitioned window replayed as an
    * array_sort over (−cs, cid) structs on one broadcast centroid row —
    * no window, no shuffle on the stream side), the candidates come from
    * a stream-static equi-join against the cell-partitioned stored
    * corpus, and the per-query top-k resolves in the arrival batch with
    * the batch op's exact (sim desc, nbr_id) ordering on the same
    * rounded-cosine grid (parity pinned in VectorStreamsSpec). The
    * "which existing documents does this new arrival match" primitive —
    * retrieval-dedup and contamination screens at ingest.
    *
    * Scale shape: probes are a row-local projection; the join is
    * cell-blocked (a query only meets the nProbe cells it probes, the
    * IVF contract); carried state is ZERO.
    */
  def streamingIvfTopK(queries: DataFrame,
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      nProbe: Int = 4, k: Int = 5,
      excludeSelf: Boolean = true): Dataset[AnnMatch] = {
    import queries.sparkSession.implicits._
    import graft.operators.Similarity.dot
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val corpus = spark.read.parquet(s"$indexDir/corpus")
    val q = graft.operators.Similarity.preparedFrame(queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val packed = cents
      .agg(array_sort(collect_list(struct(col("cid"), col("c")))).as("cl"))
    val probes = q.crossJoin(broadcast(packed))
      .withColumn("ps", slice(array_sort(transform(col("cl"), e =>
        struct((-dot(col("qv"), e.getField("c"))).as("ncs"),
          e.getField("cid").as("cid")))), 1, nProbe))
      .select(col("query_id"), col("qv"), col("qn"),
        explode(col("ps")).as("pe"))
      .select(col("query_id"), col("qv"), col("qn"),
        col("pe.cid").as("cid"))
    probes.join(corpus, Seq("cid"))
      .where(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("vec_id").as("nbr_id"),
        graft.operators.Similarity.cosSimCol(
          dot(col("qv"), col("v")), col("qn"), col("nrm")).as("sim"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new BatchTopK(k), TimeMode.None(),
        OutputMode.Append())
  }
}
