package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.JaroWinklerExpr

/**
 * Record linkage / entity resolution blocking — finding rows that refer
 * to the same real-world entity without an all-pairs comparison. The
 * mapping engine's Jaro–Winkler scorer (driver-side, metadata-sized;
 * `Mapping.scala`) reappears here as a compiled data-plane kernel
 * ([[graft.expressions.JaroWinklerExpr]]) so both surfaces share one
 * algorithm.
 */
object Linkage {

  /** Jaro–Winkler similarity of two string columns in [0, 1] — the exact
    * scorer the schema matcher uses, as a codegen expression. */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge.{column => exprCol, expression => colExpr}
    exprCol(JaroWinklerExpr(colExpr(a), colExpr(b)))
  }

  /**
   * P83 — sorted-neighborhood candidate pairs (Hernández–Stolfo): within
   * each block, rows sorted by (`sortCol`, `idCol`) are compared only to
   * their next `window − 1` neighbors — the classic linkage blocking
   * that turns O(n²) matching into O(n·w), catching near-identical
   * records that sort adjacently. Emits one row per neighbor pair:
   * (block, id_a, id_b, key_a, key_b, jw) with `jw` the Jaro–Winkler
   * similarity of the sort keys rounded at 6 (callers threshold it);
   * id_a is always the LOWER-ranked row, and each (id_a, id_b) pair is
   * unique (rank b − rank a has one solution per offset).
   *
   * Scale shape: ONE window shuffle on the block key for ranks, then an
   * offset explode (window − 1 rows per record) equi-joined on
   * (block, rank) — the iv3 positional-postings pattern, no
   * BroadcastNestedLoop, no theta join. A block is one rank partition,
   * so block keys must be chosen with bounded size (the classic SNM
   * discipline: multi-pass with different block/sort keys, not one
   * giant block); the tie on `idCol` makes each rank order total —
   * without it, equal sort keys would make the pair set
   * partition-order-dependent.
   */
  def sortedNeighborhood(df: DataFrame, idCol: String, sortCol: String,
      blockCol: String, window: Int): DataFrame = {
    require(window >= 2,
      s"sortedNeighborhood: window must be >= 2, got $window")
    val w = Window.partitionBy(col("block"))
      .orderBy(col("skey").asc, col("id").asc)
    val ranked = df
      .select(col(blockCol).as("block"), col(idCol).as("id"),
        col(sortCol).as("skey"))
      .withColumn("rnk", row_number().over(w))
    val probes = ranked
      .select(col("block"), col("id").as("id_a"), col("skey").as("key_a"),
        col("rnk").as("__base"),
        explode(array((1 until window).map(lit): _*)).as("__off"))
      .select(col("block"), col("id_a"), col("key_a"),
        (col("__base") + col("__off")).as("rnk"))
    probes
      // post-window sides carry no stats — pin shuffle-hash so the
      // planner can never fall back to sort-merge (the d11 lesson);
      // both sides already shuffle by block for the rank window
      .join(ranked.hint("shuffle_hash"), Seq("block", "rnk"))
      .select(col("block"), col("id_a"), col("id").as("id_b"),
        col("key_a"), col("skey").as("key_b"),
        round(jaroWinkler(col("key_a"), col("skey")), 6).as("jw"))
  }

  /**
   * P103 — q-gram blocking (Gravano et al.): candidate pairs are rows
   * sharing at least one RARE q-gram of the normalized key, verified by
   * Jaro–Winkler ≥ `minJw` — the second classic blocking scheme beside
   * [[sortedNeighborhood]], catching matches that sort far apart (SNM's
   * blind spot: a typo in the first character). Emits (id_a, id_b,
   * key_a, key_b, jw), id_a < id_b, each pair once.
   *
   * The `maxGramFreq` cap is the scale guard: a stop-gram shared by
   * millions of rows would turn the bucket self-join quadratic (the LSH
   * band-size discipline); capped grams bound candidates by
   * Σ f·(f−1)/2 over rare grams. Recall caveat, documented not hidden:
   * a pair whose EVERY shared gram is frequent is missed — multi-pass
   * with different q / key normalizations is the standard mitigation.
   * Shape: gram explode (narrow) → gram-frequency agg + filter →
   * bucket self-join on the gram key → distinct pairs → one keyed join
   * back for keys + the compiled JW kernel. Keys shorter than q form
   * one whole-string gram.
   */
  def qgramBlocking(df: DataFrame, idCol: String, keyCol: String, q: Int,
      maxGramFreq: Long, minJw: Double): DataFrame = {
    require(q >= 2, s"qgramBlocking: q must be >= 2, got $q")
    require(maxGramFreq >= 2,
      s"qgramBlocking: maxGramFreq must be >= 2, got $maxGramFreq")
    require(minJw >= 0.0 && minJw <= 1.0,
      s"qgramBlocking: minJw must be in [0, 1], got $minJw")
    val base = df.select(col(idCol).as("id"),
        lower(trim(col(keyCol))).as("key"))
      .where(col("id").isNotNull && col("key").isNotNull && col("key") =!= "")
    val grams = base.select(col("id"),
        explode(array_distinct(expr(
          s"transform(sequence(0, greatest(length(key) - $q, 0)), " +
            s"i -> substring(key, i + 1, $q))"))).as("gram"))
    val rare = grams.groupBy("gram").agg(count(lit(1)).as("__f"))
      .where(col("__f") <= maxGramFreq)
      .select("gram")
    val blocked = grams.join(rare.hint("shuffle_hash"), Seq("gram"))
    val pairs = blocked.select(col("gram"), col("id").as("id_a"))
      // both sides are the same derived (stats-free) frame — hint the
      // bucket self-join too, or the planner falls back to sort-merge
      .join(blocked.select(col("gram"), col("id").as("id_b"))
        .hint("shuffle_hash"), Seq("gram"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    pairs
      .join(base.select(col("id").as("id_a"), col("key").as("key_a"))
        .hint("shuffle_hash"), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("key").as("key_b"))
        .hint("shuffle_hash"), Seq("id_b"))
      .withColumn("jw", round(jaroWinkler(col("key_a"), col("key_b")), 6))
      .where(col("jw") >= minJw)
      .select("id_a", "id_b", "key_a", "key_b", "jw")
  }
}
