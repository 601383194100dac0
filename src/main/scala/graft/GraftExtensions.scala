package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._
import graft.pipeline.Hashing

/** Session extension registering graft's native codegen expressions as SQL
  * functions, so a SQL-first user reaches the fused kernels without the
  * Column API:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT sorted_intersect_count(a.hashes, b.hashes) FROM pairs
  * }}}
  *
  * Function registration is the only extension point graft needs: every plan
  * is built from Catalyst's own operators (so the stock optimizer — pushdown,
  * pruning, join selection, AQE — applies unchanged), and the custom scalar
  * kernels plug in at the expression tier, inside whole-stage codegen.
  *
  * We deliberately do NOT inject an optimizer rule rewriting
  * `size(array_intersect(a, b))` into the sorted-merge kernel: that rewrite
  * only pays when the sort+distinct normalization is amortized across many
  * probes per array (as the dedup operators arrange by pre-sorting once per
  * document); applied per pair it would pessimize one-shot use. Registering
  * the function and letting the query author opt in is the honest contract.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), GraftExtensions.info(name), builder))
    }
}

object GraftExtensions {

  /** Imperative registration fallback: `spark.sql.extensions` set via
    * `SparkSession.builder` is silently ignored when a session already
    * exists in the JVM (`getOrCreate` reuses it), so entry points that may
    * not own session creation call this after `getOrCreate` — idempotent
    * (re-registering the same builder is a no-op overwrite). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name), builder)
    }

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name)

  private def litLong(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$what must be a numeric literal, got $other")
    }
  }

  /** Exact Int conversion — `substring_hashes(t, 4294967304, m)` must error,
    * not silently truncate to width 8 (and `minhash_sig(h, 2^32+8)` must not
    * wrap into the valid range). */
  private def litInt(e: Expression, what: String): Int = {
    val v = litLong(e, what)
    require(v >= Int.MinValue && v <= Int.MaxValue,
      s"$what out of int range: $v")
    v.toInt
  }

  private def arity(n: Int, args: Seq[Expression], name: String): Seq[Expression] = {
    require(args.length == n, s"$name expects $n arguments, got ${args.length}")
    args
  }

  /** name → builder for every registered function. */
  val functions: Map[String, Seq[Expression] => Expression] = Map(
    // md5-48bit hash of every `width`-char window of a string
    "substring_hashes" -> { raw =>
      val args = arity(3, raw, "substring_hashes")
      SubstringHashes(args(0),
        litInt(args(1), "substring_hashes width"),
        litLong(args(2), "substring_hashes mod"))
    },
    // element-wise md5-48bit hash of a string array
    "string_hashes" -> { raw =>
      val args = arity(2, raw, "string_hashes")
      StringHashes(args(0), litLong(args(1), "string_hashes mod"))
    },
    // |A ∩ B| of two ascending-sorted distinct int64 arrays (merge walk)
    "sorted_intersect_count" -> { raw =>
      val args = arity(2, raw, "sorted_intersect_count")
      SortedIntersectCount(args(0), args(1))
    },
    // minhash signature over element hashes; optional second arg = number of
    // permutations (prefix of the shared md5-derived coefficient tables)
    "minhash_sig" -> { args =>
      require(args.length == 1 || args.length == 2,
        s"minhash_sig expects 1 or 2 arguments, got ${args.length}")
      val n =
        if (args.length == 2) litInt(args(1), "minhash_sig num_hashes")
        else Hashing.NumHashes
      require(n >= 1 && n <= Hashing.NumHashes,
        s"minhash_sig num_hashes must be in [1, ${Hashing.NumHashes}], got $n")
      MinHashSig(args(0), Hashing.minhashA.take(n), Hashing.minhashB.take(n), Hashing.P)
    },
    // Σ a(i)*b(i) over two int64 quantized vectors
    "quantized_dot" -> { raw =>
      val args = arity(2, raw, "quantized_dot")
      QuantizedDot(args(0), args(1))
    },
    // Σ (a(i)-b(i))² over two int64 quantized vectors
    "quantized_l2sq" -> { raw =>
      val args = arity(2, raw, "quantized_l2sq")
      QuantizedL2Sq(args(0), args(1))
    },
    // majority-bit 48-bit fingerprint of an int64 hash array
    "simhash48" -> { raw =>
      val args = arity(1, raw, "simhash48")
      SimHash48(args(0))
    }
  )
}
