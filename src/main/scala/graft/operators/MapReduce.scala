package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Job-parameter surface: the reference's only job-config mechanism is
  * `get_argc()`/`get_argv(i)` read inside mapper/reducer bodies
  * (`/root/reference/src/mapreduce/dht/mapreduce.hh:739-747`). A plain
  * serializable value: close over it or pass it via
  * [[MapReduce.runWithParams]].
  */
final case class JobParams(args: IndexedSeq[String]) {
  def argc: Int = args.length
  def argv(i: Int): String = args(i)
  def getOrElse(i: Int, default: => String): String =
    if (i >= 0 && i < args.length) args(i) else default
}

object JobParams {
  def of(args: String*): JobParams = JobParams(args.toIndexedSeq)
}

/** The reference's entire user programming surface — `set_mapper(void(*)
  * (string))` + `set_reducer(void(*)(string))` with `write_keyvalue` /
  * `get_nextvalue` cursors (`/root/reference/src/mapreduce/dht/
  * mapreduce.hh:748-758, 812-823, 1023-1071`) — as a typed Spark facade.
  *
  * mapper: one input record → many (K,V) pairs   (M1/M2 in SURVEY.md §2.1)
  * reducer: (K, value iterator) → output records (R1)
  * partition/sort/merge (P1-P3) is Spark's sort-based shuffle: zero code.
  *
  * The reducer iterator is single-pass and value order is unspecified,
  * matching the reference's `get_nextvalue` contract (run-merge order
  * there, shuffle order here). Keys are NOT globally sorted (the
  * reference's sorted-key iteration is a std::map artifact, SURVEY.md
  * §7.4); use [[runSortedByKey]] when an op depends on it.
  */
object MapReduce {

  /** General map → groupByKey → reduce. Fully streaming: values for one key
    * are an Iterator, never materialized by the framework.
    */
  def run[K: Encoder, V, O: Encoder](input: Dataset[String])(
      mapper: String => IterableOnce[(K, V)])(
      reducer: (K, Iterator[V]) => IterableOnce[O])(
      implicit kvEnc: Encoder[(K, V)]): Dataset[O] =
    input
      .flatMap(mapper)
      .groupByKey(_._1)
      .flatMapGroups((k: K, it: Iterator[(K, V)]) => reducer(k, it.map(_._2)))

  /** [[run]] with an explicit parameter block threaded to both UDFs — the
    * reference's `get_argc`/`get_argv` job-config surface as arguments
    * instead of process-global state.
    */
  def runWithParams[K: Encoder, V, O: Encoder](input: Dataset[String], params: JobParams)(
      mapper: (JobParams, String) => IterableOnce[(K, V)])(
      reducer: (JobParams, K, Iterator[V]) => IterableOnce[O])(
      implicit kvEnc: Encoder[(K, V)]): Dataset[O] =
    run(input)(mapper(params, _))((k, it) => reducer(params, k, it))

  /** Per-FILE mapper parity: the reference invokes `map(inputpath)` once per
    * input file and lets the mapper keep cross-record state while pulling
    * records with `getnextrecord` (`/root/reference/src/mapreduce/dht/
    * mapreduce.hh:557-593, 905-942`). Spark-side: `binaryFiles` never
    * splits a file (it may PACK many small files into one task), the
    * mapper sees the file name and a streaming line iterator — lines are
    * never materialized whole-file, and each file's stream closes as soon
    * as its iterator drains, so a task over thousands of packed files
    * holds one descriptor at a time. Accepts many paths (reference
    * `add_inputpath` multi-input, `mapreduce.hh:760-774`).
    */
  def runPerFile[K: Encoder, V, O: Encoder](spark: SparkSession, paths: Seq[String])(
      mapper: (String, Iterator[String]) => IterableOnce[(K, V)])(
      reducer: (K, Iterator[V]) => IterableOnce[O])(
      implicit kvEnc: Encoder[(K, V)]): Dataset[O] = {
    require(paths.nonEmpty, "runPerFile needs at least one input path")
    val pairs = spark.sparkContext
      .binaryFiles(paths.mkString(","))
      .flatMap { case (file, portable) =>
        val in = portable.open()
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; in.close() }
        // completion listener is the safety net for mappers that never
        // drain their iterator; the exhaustion hook below is what bounds
        // open descriptors at 1 per task for packed small-file partitions
        Option(TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        val raw = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        val lines = new Iterator[String] {
          def hasNext: Boolean = { val h = raw.hasNext; if (!h) closeOnce(); h }
          def next(): String = raw.next()
        }
        mapper(file, lines)
      }
    spark.createDataset(pairs)(kvEnc)
      .groupByKey(_._1)
      .flatMapGroups((k: K, it: Iterator[(K, V)]) => reducer(k, it.map(_._2)))
  }

  /** Algebraic fast path: when the reduce is a fold, run it as a typed
    * Aggregator so Spark applies map-side partial aggregation — the
    * reference's iwriter partial grouping (`/root/reference/src/
    * file_distributor/iwriter.hh:76-91`) done by the engine before the
    * shuffle instead of by streaming whole value lists to the reducer.
    */
  def runAggregating[K: Encoder, V, B: Encoder, O: Encoder](input: Dataset[String])(
      mapper: String => IterableOnce[(K, V)])(
      zeroB: => B)(seqOp: (B, V) => B)(combOp: (B, B) => B)(finishOp: B => O)(
      implicit kvEnc: Encoder[(K, V)], koEnc: Encoder[(K, O)]): Dataset[(K, O)] = {
    val agg = new Aggregator[(K, V), B, O] {
      // zeroB is by-name: every group must get a FRESH buffer, or a
      // mutable B (e.g. Array) mutated in-place by seqOp would be shared
      // across all keys in a task and corrupt every aggregate
      def zero: B = zeroB
      def reduce(b: B, a: (K, V)): B = seqOp(b, a._2)
      def merge(b1: B, b2: B): B = combOp(b1, b2)
      def finish(b: B): O = finishOp(b)
      def bufferEncoder: Encoder[B] = implicitly[Encoder[B]]
      def outputEncoder: Encoder[O] = implicitly[Encoder[O]]
    }
    input.flatMap(mapper).groupByKey(_._1).agg(agg.toColumn)
  }

  /** Sorted-key variant: reproduces the reference's lexicographic key
    * iteration artifact (reducers there see keys in std::map order,
    * `/root/reference/src/file_distributor/ireader.hh:37`). Range-partition
    * by key + in-partition sort, then group consecutive runs. Values for
    * one key are buffered per partition — parity escape hatch only; prefer
    * [[run]]/[[runAggregating]].
    */
  def runSortedByKey[K: Encoder: Ordering, V, O: Encoder](input: Dataset[String])(
      mapper: String => IterableOnce[(K, V)])(
      reducer: (K, Iterator[V]) => IterableOnce[O])(
      implicit kvEnc: Encoder[(K, V)]): Dataset[O] = {
    val pairs = input.flatMap(mapper)
    pairs
      .repartitionByRange(pairs("_1"))
      .sortWithinPartitions(pairs("_1"))
      .mapPartitions { rows =>
        val buf = rows.buffered
        new Iterator[IterableOnce[O]] {
          def hasNext: Boolean = buf.hasNext
          def next(): IterableOnce[O] = {
            val k = buf.head._1
            val vs = scala.collection.mutable.ArrayBuffer.empty[V]
            while (buf.hasNext && buf.head._1 == k) vs += buf.next()._2
            reducer(k, vs.iterator)
          }
        }.flatten
      }
  }

  /** Parity text-KV codec: the reference frames a pair as `key + " " + value`
    * per line and splits on the first space (`/root/reference/src/
    * file_distributor/idistributor.hh:80-85`; keys may not contain spaces).
    */
  def encodeKV(pairs: Dataset[(String, String)]): Dataset[String] = {
    import pairs.sparkSession.implicits._
    pairs.map { case (k, v) => s"$k $v" }
  }

  def decodeKV(lines: Dataset[String]): Dataset[(String, String)] = {
    import lines.sparkSession.implicits._
    lines.map { line =>
      val i = line.indexOf(' ')
      if (i < 0) (line, "") else (line.substring(0, i), line.substring(i + 1))
    }
  }
}
