package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf1.0 fixture synthesis (round 16, VERDICT r15 ask #1):
  * the driver ships sf{0.001,0.01,0.1}; proving one MORE scale decade
  * for the quadratic-shaped terms (cell-join fan-out, positional-gram
  * collision mass, wedge fan-out) needs a 10× corpus, so this main
  * replicates sf0.1 ten-fold with DECORRELATED copies — a naive 10×
  * copy would make every document/vector an exact duplicate of nine
  * others, inflating dup-cluster sizes and candidate-pair mass ~100×
  * and measuring a fixture artifact instead of a scale trend:
  *
  *   - documents: copy i > 0 suffixes every whitespace token with
  *     `_i` — every shingle/4-gram/word differs across copies (no
  *     cross-copy near-dups) while WITHIN-copy dup structure is
  *     byte-for-byte the shipped corpus's; n_chars re-derived;
  *   - embeddings: copy i cyclically rotates the 64 dims by i — an
  *     isometry (within-copy geometry identical) whose cross-copy
  *     cosines behave like unrelated vectors;
  *   - events/orders/lineitem/customer/part/supplier: keys shift by
  *     copy-scaled constants chosen to preserve every CDC/mod-class
  *     rule (all shifts ≡ 0 mod 10 and mod 25) and referential
  *     integrity (o_custkey shifts with c_custkey, etc.);
  *   - nation/region: dimension enums, copied once unchanged.
  *
  * Output (default /tmp/graft_sf1) is plain `<table>.parquet` dirs —
  * the TESTDATA.md layout — so `SPARK_GRAFT_SF_DIR` points at it with
  * zero code changes. Fixtures under /root/testdata are never touched.
  * Usage: `runMain graft.ScaleGen [srcDir] [outDir] [copies]`.
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("/tmp/graft_sf1")
    val copies = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def union(table: String)(copy: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until copies).map(i => copy(base, i))
        .reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$table.parquet")
      println(s"[scalegen] $table x$copies -> $out/$table.parquet")
    }

    // key shifts: all ≡ 0 (mod 10) and (mod 25) so every doc/vec/media
    // CDC class rule sees the same class mix per copy; all far above
    // each table's max key so copies never collide; all small enough
    // that copy 9 stays far below the 1e9 minted-insert guard
    val DocShift = 10000000L   // max doc_id 4999
    val VecShift = 1000000L    // max vec_id 1999
    val UserShift = 100000L    // max user_id 1499
    val EventShift = 10000000L // max event_id 99999
    val OrdShift = 10000000L   // max o_orderkey ~6e5
    val CustShift = 1000000L
    val PartShift = 1000000L
    val SuppShift = 100000L

    union("documents") { (df, i) =>
      val txt = if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1_" + i)
      df.select((col("doc_id") + i * DocShift).as("doc_id"),
        txt.as("text"), col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    union("embeddings") { (df, i) =>
      val emb = if (i == 0) col("embedding")
        else concat(slice(col("embedding"), i + 1, 64 - i),
          slice(col("embedding"), 1, i))
      df.select((col("vec_id") + i * VecShift).as("vec_id"),
        emb.as("embedding"), col("label"))
    }
    union("events") { (df, i) =>
      df.select((col("event_id") + i * EventShift).as("event_id"),
        col("ts"), (col("user_id") + i * UserShift).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    union("customer") { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + i * CustShift)
    }
    union("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + i * OrdShift)
        .withColumn("o_custkey", col("o_custkey") + i * CustShift)
    }
    union("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + i * OrdShift)
        .withColumn("l_partkey", col("l_partkey") + i * PartShift)
        .withColumn("l_suppkey", col("l_suppkey") + i * SuppShift)
    }
    union("part") { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + i * PartShift)
    }
    union("supplier") { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + i * SuppShift)
    }
    Seq("nation", "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      println(s"[scalegen] $t (dim, copied once) -> $out/$t.parquet")
    }
    spark.stop()
    println(s"[scalegen] done: $out")
  }
}
