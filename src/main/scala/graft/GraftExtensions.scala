package graft

import graft.functions.expressions._
import graft.text.ChunkTextGenerator
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL exposure of the engine's native expressions.
  *
  * Two entry points with one shared builder table:
  *  - `GraftExtensions` for `spark.sql.extensions=graft.GraftExtensions`
  *    (cluster deployment — functions exist in every new session);
  *  - `GraftFunctions.registerAll(spark)` for a live session (tests,
  *    notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    // ANN plan rewrite, conf-gated per session (mirrors
    // LshAnnPlan.enable for live sessions):
    //   spark.graft.ann.rewrite=true
    //   spark.graft.ann.tables/bits/probes  (optional overrides)
    //   spark.graft.ann.source=<sourceDir>  (optional: route matching
    //     queries onto the PERSISTED index built by AnnIndex.ensureLsh
    //     over that source — the cluster-deployment twin of
    //     Config.persistedSource, same guards and fallbacks)
    e.injectOptimizerRule { session =>
      new org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
        override def apply(
            plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
            : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
          // lenient conf parsing: the optimizer must never throw on a
          // malformed session conf (that would fail EVERY gated query with
          // an opaque error) — unparseable values fall back to defaults
          if (!session.conf.getOption("spark.graft.ann.rewrite")
            .exists(_.equalsIgnoreCase("true"))) plan
          else {
            val dft = graft.plans.LshAnnPlan.Config()
            def i(key: String, dflt: Int) =
              session.conf.getOption(s"spark.graft.ann.$key")
                .flatMap(_.toIntOption).getOrElse(dflt)
            graft.plans.LshAnnRewrite(session,
              graft.plans.LshAnnPlan.Config(i("tables", dft.tables),
                i("bits", dft.bits), i("probes", dft.probes),
                persistedSource = session.conf
                  .getOption("spark.graft.ann.source")
                  .filter(_.nonEmpty)))(plan)
          }
      }
    }
  }
}

object GraftFunctions {

  private def two(name: String)(f: (Expression, Expression) => Expression)
      : (String, Seq[Expression] => Expression) =
    name -> { exprs =>
      require(exprs.size == 2, s"$name(a, b)")
      f(exprs(0), exprs(1))
    }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    two("cosine_f")(CosineF),
    two("dot_f")(DotF),
    "norm_f" -> { exprs =>
      require(exprs.size == 1, "norm_f(vec)")
      NormF(exprs.head)
    },
    "simhash64" -> { exprs =>
      require(exprs.size == 1, "simhash64(tokens)")
      SimHash64F(exprs.head)
    },
    "minhash_sig" -> { exprs =>
      require(exprs.size == 2, "minhash_sig(tokens, numHashes)")
      MinHashSigF(exprs.head, intArg(exprs(1), "minhash_sig.numHashes"))
    },
    "shingles_k" -> { exprs =>
      require(exprs.size == 2, "shingles_k(tokens, k)")
      ShinglesF(exprs.head, intArg(exprs(1), "shingles_k.k"))
    },
    "rolling_min_hash" -> { exprs =>
      require(exprs.size == 2, "rolling_min_hash(tokens, k)")
      RollingMinHashF(exprs.head, intArg(exprs(1), "rolling_min_hash.k"))
    },
    "chunk_text" -> { exprs =>
      require(exprs.size == 2, "chunk_text(text, chunkSize)")
      graft.text.ChunkTextGenerator(exprs.head,
        intArg(exprs(1), "chunk_text.chunkSize"))
    },
    "lsh_buckets" -> { exprs =>
      require(exprs.size == 3, "lsh_buckets(vec, tables, bits)")
      LshBucketsF(exprs.head, intArg(exprs(1), "lsh_buckets.tables"),
        intArg(exprs(2), "lsh_buckets.bits"))
    },
    "lsh_buckets_probe" -> { exprs =>
      require(exprs.size == 4, "lsh_buckets_probe(vec, tables, bits, probes)")
      LshBucketsProbeF(exprs.head, intArg(exprs(1), "lsh_buckets_probe.tables"),
        intArg(exprs(2), "lsh_buckets_probe.bits"),
        intArg(exprs(3), "lsh_buckets_probe.probes"))
    })

  private def intArg(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval(null) match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$what must be an INT literal, got $other")
    }
  }

  /** Registers every graft function on a live session. */
  def registerAll(spark: SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    // keep the standalone generator registration path in sync
    ChunkTextGenerator.register(spark)
  }
}
