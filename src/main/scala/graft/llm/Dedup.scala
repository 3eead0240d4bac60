package graft.llm

import graft.functions.SimHash64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Document deduplication for training-data pipelines, designed for the
  * 100 TB shape: every method is shuffle-bounded by candidate pairs (LSH
  * bucketing), never all-pairs. Signatures are computed row-local (no
  * explode of shingles through a shuffle), so the only wide exchanges are
  * the bucket join and the final pair-dedup.
  */
object Dedup {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = F.split(F.trim(text), "\\s+")

  /** Distinct word k-shingles ("w1 w2 w3"). Documents shorter than k
    * tokens yield an empty array. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = tokens(text)
    F.when(F.size(toks) >= k,
      F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        i => F.concat_ws(" ", F.slice(toks, i, F.lit(k))))))
      .otherwise(F.array().cast("array<string>"))
  }

  /** Exact-duplicate groups by raw text hash: (fingerprint, keep_id = min
    * id, n_copies). Hash-groupBy — one shuffle on the 128-bit digest, the
    * canonical exact-dedup at any scale. */
  def exactDuplicateGroups(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(F.md5(textCol.cast("string")).as("fingerprint"))
      .agg(F.min(idCol).as("keep_id"), F.count(F.lit(1)).as("n_copies"))

  /** Order-insensitive normal form: lowercase, strip non-alnum, collapse
    * whitespace, sort the token multiset — catches shuffled/reformatted
    * copies that raw-hash dedup misses. */
  def normalizedFingerprint(text: Column): Column = {
    val norm = F.regexp_replace(
      F.regexp_replace(F.lower(text), "[^a-z0-9 ]", " "), "\\s+", " ")
    F.md5(F.concat_ws(" ", F.array_sort(F.split(F.trim(norm), " "))))
  }

  private val MersennePrime = (1L << 61) - 1

  /** MinHash signature (array<long>, length numHashes) over the distinct
    * shingle set, computed entirely row-local: xxhash64 each shingle once,
    * then k affine permutations min-reduced with array_min — no explode,
    * no shuffle. Affine coefficients from a fixed seed so signatures are
    * reproducible across runs/clusters. */
  def minHashSignature(shinglesCol: Column, numHashes: Int = 32, seed: Long = 1234L): Column = {
    val rnd = new scala.util.Random(seed)
    // a < 2^30 keeps a*x < 2^62 (x < 2^32), so a*x + b stays inside a
    // signed long even under ANSI overflow checking
    val coeffs = Seq.fill(numHashes)(
      (1L + rnd.nextLong((1L << 30) - 1), rnd.nextLong(MersennePrime)))
    // hash once into [0, 2^32)
    val xs = F.transform(shinglesCol, s => F.pmod(F.xxhash64(s), F.lit(1L << 32)))
    F.array(coeffs.map { case (a, b) =>
      F.array_min(F.transform(xs, x => F.pmod(x * a + b, F.lit(MersennePrime))))
    }: _*)
  }

  /** MinHash + LSH candidate pairs with exact-Jaccard verification.
    *
    * numHashes = bands × rowsPerBand. Each doc emits `bands` (band_idx,
    * band_hash) keys; the bucket self-join finds docs agreeing on ANY full
    * band — shuffle is by band key, proportional to corpus size, not n².
    * Candidates are then verified with exact Jaccard over the shingle
    * sets, so the threshold is exact, LSH only bounds recall.
    *
    * Returns (a_id, b_id, jaccard) with a_id < b_id.
    */
  def minHashPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.8,
      seed: Long = 1234L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    val docs = df.select(idCol.as("id"), shingles(textCol, shingleK).as("sh"))
      .filter(F.size(F.col("sh")) > 0)
      .withColumn("mh", minHashSignature(F.col("sh"), numHashes, seed))

    val bandCols = (0 until bands).map { bIdx =>
      F.struct(
        F.lit(bIdx).as("band"),
        F.xxhash64(F.concat_ws("_",
          (0 until r).map(j => F.col("mh").getItem(bIdx * r + j)): _*)).as("bh"))
    }
    val banded = docs.select(F.col("id"), F.col("sh"),
      F.explode(F.array(bandCols: _*)).as("bk"))

    val a = banded.select(F.col("id").as("a_id"), F.col("sh").as("a_sh"), F.col("bk"))
    val b = banded.select(F.col("id").as("b_id"), F.col("sh").as("b_sh"), F.col("bk"))
    val cand = a.join(b, a("bk") === b("bk") && F.col("a_id") < F.col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh")
      .dropDuplicates("a_id", "b_id") // same pair may collide in many bands

    cand
      .withColumn("jaccard",
        F.size(F.array_intersect(F.col("a_sh"), F.col("b_sh"))).cast("double") /
          F.size(F.array_union(F.col("a_sh"), F.col("b_sh"))))
      .filter(F.col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** SimHash near-dup pairs. 64-bit signature (custom codegen'd
    * expression), banded into four 16-bit chunks: any pair within Hamming
    * distance 3 shares ≥1 chunk (pigeonhole), so the chunk join finds all
    * of them without an all-pairs scan. */
  def simHashPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding is only exhaustive up to Hamming 3")
    // shingle features (not bare tokens): aligns the signature with
    // set-overlap similarity, so hamming tracks shingle-jaccard
    val docs = df.select(idCol.as("id"), SimHash64(shingles(textCol, 3)).as("sig"))
    val chunks = (0 until 4).map { i =>
      F.struct(F.lit(i).as("c"),
        F.shiftrightunsigned(F.col("sig"), i * 16).bitwiseAND(F.lit(0xFFFFL)).as("v"))
    }
    val banded = docs.select(F.col("id"), F.col("sig"),
      F.explode(F.array(chunks: _*)).as("ck"))
    val a = banded.select(F.col("id").as("a_id"), F.col("sig").as("a_sig"), F.col("ck"))
    val b = banded.select(F.col("id").as("b_id"), F.col("sig").as("b_sig"), F.col("ck"))
    a.join(b, a("ck") === b("ck") && F.col("a_id") < F.col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig"))))
      .filter(F.col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Exact n-gram Jaccard for all pairs within a blocking key (use LSH
    * above when no natural block exists — this is the verifier, not the
    * scale path). */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val docs = df.select(idCol.as("id"), shingles(textCol, n).as("sh"))
      .filter(F.size(F.col("sh")) > 0)
    val a = docs.select(F.col("id").as("a_id"), F.col("sh").as("a_sh"))
    val b = docs.select(F.col("id").as("b_id"), F.col("sh").as("b_sh"))
    a.join(b, F.col("a_id") < F.col("b_id"))
      .withColumn("jaccard",
        F.size(F.array_intersect(F.col("a_sh"), F.col("b_sh"))).cast("double") /
          F.size(F.array_union(F.col("a_sh"), F.col("b_sh"))))
      .filter(F.col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }
}
