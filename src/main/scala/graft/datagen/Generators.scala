package graft.datagen

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Seeded, key-derived data-generator expressions — SURVEY §2.A O9–O15.
  *
  * The reference generates mock data with Python `random`/Faker
  * (`dimension_tables_mock.py:49-56,85-97`, `transactions_mock_data.py:64-79`),
  * which is stream-stateful and irreproducible across partitionings. Here every
  * "random" value is a pure function of the row's key via multiplicative
  * hashing (Knuth 1998, TAOCP §6.4) — partition-independent, shuffle-stable,
  * and reproducible in any engine with 64-bit integer arithmetic (SURVEY §7
  * hard part (a)). All expressions are plain `Column` compositions: codegen'd,
  * no UDFs, safe at any scale.
  *
  * Multipliers are chosen so `key * mult` stays far below 2^63 for key ranges
  * up to ~10^9 (Spark 4 runs ANSI mode: silent overflow would instead throw).
  */
object Generators {

  /** Knuth's multiplicative-hash constant (2654435761 = 2^32 * φ). */
  val KnuthMult = 2654435761L

  /** Pseudo-uniform integer in [0, mod) derived from a key column. */
  def hashMod(key: Column, mult: Long, mod: Long): Column = (key * mult) % mod

  /** Fixed-width digit id with prefix — O9 (`prod-`+6 digits, `S`+4 digits,
    * `cust-`+6 digits; reference `dimension_tables_mock.py:49-51,55,85-86`).
    * Leading zeros legal, exactly as the reference's `random.randint` zfill. */
  def digitId(prefix: String, key: Column, width: Int): Column = {
    val mod = math.pow(10, width).toLong
    concat(lit(prefix), lpad((key % mod).cast("string"), width, "0"))
  }

  /** Uniform 2-dp money value in [lo, hi] — O10 (`round(uniform(10,500),2)`,
    * reference `dimension_tables_mock.py:54`). Computed as an exact
    * DECIMAL(12,2), surfaced as DOUBLE: the one exact→IEEE conversion is
    * engine-independent, and DOUBLE output columns hash identically under
    * every parquet/pandas reader (DECIMAL outputs don't — pyarrow yields
    * Decimal objects where DuckDB yields float64). */
  def uniformMoney(key: Column, lo: Double, hi: Double): Column = {
    val steps = ((hi - lo) * 100).toLong + 1 // inclusive hundredths
    (lit(lo) + hashMod(key, KnuthMult, steps) / lit(100.0))
      .cast(DecimalType(12, 2)).cast("double")
  }

  /** Uniform categorical choice — O11 (`random.choice`, reference
    * `dimension_tables_mock.py:53`, `transactions_mock_data.py:75-76`). */
  def choice(key: Column, mult: Long, options: Seq[String]): Column =
    element_at(
      array(options.map(lit): _*),
      (hashMod(key, mult, options.size.toLong) + 1).cast("int"))

  /** Weighted categorical choice — O12 (cumulative-weight draw, reference
    * `dimension_tables_mock.py:93-97`: Bronze/Silver/Gold/Platinum at
    * .60/.25/.10/.05). `cuts` are cumulative percentage thresholds. */
  def weightedChoice(key: Column, cuts: Seq[(Int, String)], default: String): Column = {
    val bucket = hashMod(key, KnuthMult, 100L)
    cuts.foldLeft(when(lit(false), lit(null))) { case (acc, (cut, v)) =>
      acc.when(bucket < cut, v)
    }.otherwise(default)
  }

  /** Synthetic person name + unique email — O13 (Faker name/unique email,
    * reference `dimension_tables_mock.py:89-91`). Names from fixed lookup
    * arrays; uniqueness guaranteed by the key suffix in the address. */
  val FirstNames: Seq[String] = Seq(
    "Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace", "Henry",
    "Irene", "Jack", "Karen", "Liam", "Maria", "Noah", "Olivia", "Peter",
    "Quinn", "Rosa", "Samuel", "Tara")
  val LastNames: Seq[String] = Seq(
    "Anderson", "Brown", "Clark", "Davis", "Evans", "Fischer", "Garcia",
    "Hill", "Ivanov", "Jones", "Kim", "Lopez", "Miller", "Nguyen", "Ortiz",
    "Patel", "Quint", "Rossi", "Smith", "Turner")

  def firstName(key: Column): Column = choice(key, 7919L, FirstNames)
  def lastName(key: Column): Column = choice(key, 104729L, LastNames)
  def email(key: Column): Column =
    concat(lower(firstName(key)), lit("."), lower(lastName(key)), lit("."),
      key.cast("string"), lit("@example.com"))

  /** Reference timestamp formats — O14 (`transactions_mock_data.py:69,74`):
    * compact `yyyyMMddHHmmss` and the non-ISO `yyyy-MM-dd-HH:mm:ss`. */
  def tsCompact(ts: Column): Column = date_format(ts, "yyyyMMddHHmmss")
  def tsDashed(ts: Column): Column = date_format(ts, "yyyy-MM-dd-HH:mm:ss")
}
