package graft.operators

/** Multi-column / transform PARTITION SPECS for catalog log tables
  * (r14 verdict #1) — the SQL `CREATE TABLE … PARTITIONED BY
  * (months(d), bucket(8, k), region)` surface Delta/Iceberg users
  * expect, over the commit log's existing per-file value lines.
  *
  * A spec is an ordered list of terms; each term derives ONE partition
  * value per row from a source column:
  *
  *  - `identity:c`    the column value itself (`=` stats line — the
  *                    existing q214 machinery, value-equality pruning,
  *                    KeyGroupedPartitioning, DPP)
  *  - `bucket:n:c`    a stable hash bucket in [0, n) (`#bucket:n` line —
  *                    equality pruning on the source column derives the
  *                    bucket and drops every other bucket's files)
  *  - `months:c`      the `yyyy-MM` month of a DATE column (`~month`
  *                    line — the SAME shape q195's generated partitions
  *                    record, so [[TimeTravel.readAsOfBetweenDates]]
  *                    prunes these tables unchanged)
  *  - `days:c`        the ISO day of a DATE column (`~day` line)
  *  - `years:c`       the `yyyy` year of a DATE column (`~year` line)
  *
  * Derived string values are ORDER-PRESERVING (ISO date prefixes) or
  * categorical (buckets), so read-side pruning is a string compare
  * against the literal's derived value — no footer reads, no file opens.
  * The spec is recorded once, at CREATE, as the `graft.partitionSpec`
  * table property; every later INSERT derives values at write
  * (Delta's generated-column discipline: the user never materializes,
  * filters on, or even sees a partition column).
  *
  * Reference: Javier009/eCommerce_Data_Pipeline's warehouse layout is a
  * MULTI-LEVEL hive partition tree (transactions_mock_data.py:85-91,
  * year/month/day/… directories) — this is that layout's declarative,
  * pruned form.
  */
sealed trait PartTerm extends Serializable {
  /** Source column (logical name). */
  def col: String
  /** The stats-line tag the commit records for this term's values. */
  def tag: String
  /** Derived partition value for one row, from the column's RAW value
    * (Long / Int / UTF8String.toString / epoch-day Int for DATE). */
  def derive(raw: Any): String
}

final case class IdentityTerm(col: String) extends PartTerm {
  override def tag: String = "="
  override def derive(raw: Any): String = {
    val v = raw.toString
    require(!v.contains("|"),
      s"partition value '$v' for $col contains '|' — the log's " +
        "stats-line separator; partition on a clean column")
    v
  }
}

final case class BucketTerm(n: Int, col: String) extends PartTerm {
  require(n > 0, s"bucket($n, $col): bucket count must be positive")
  override def tag: String = s"#bucket:$n"
  override def derive(raw: Any): String = (raw match {
    case l: Long => PartTransforms.bucketOfLong(l, n)
    case i: Int => PartTransforms.bucketOfLong(i.toLong, n)
    case s => PartTransforms.bucketOfString(s.toString, n)
  }).toString
}

final case class MonthsTerm(col: String) extends PartTerm {
  override def tag: String = "~month"
  override def derive(raw: Any): String =
    PartTransforms.monthStr(raw.asInstanceOf[Int])
}

final case class DaysTerm(col: String) extends PartTerm {
  override def tag: String = "~day"
  override def derive(raw: Any): String =
    PartTransforms.dayStr(raw.asInstanceOf[Int])
}

final case class YearsTerm(col: String) extends PartTerm {
  override def tag: String = "~year"
  override def derive(raw: Any): String =
    PartTransforms.yearStr(raw.asInstanceOf[Int])
}

object PartSpec {
  /** Serialize for the `graft.partitionSpec` table property. Terms are
    * colon-joined, the list comma-joined — none of which ever appears in
    * a column name the catalog accepts. */
  def format(spec: Seq[PartTerm]): String = spec.map {
    case IdentityTerm(c) => s"identity:$c"
    case BucketTerm(n, c) => s"bucket:$n:$c"
    case MonthsTerm(c) => s"months:$c"
    case DaysTerm(c) => s"days:$c"
    case YearsTerm(c) => s"years:$c"
  }.mkString(",")

  def parse(s: String): Seq[PartTerm] =
    s.split(',').toSeq.filter(_.nonEmpty).map(_.split(':') match {
      case Array("identity", c) => IdentityTerm(c)
      case Array("bucket", n, c) => BucketTerm(n.toInt, c)
      case Array("months", c) => MonthsTerm(c)
      case Array("days", c) => DaysTerm(c)
      case Array("years", c) => YearsTerm(c)
      case other => throw new IllegalArgumentException(
        s"bad partition spec term '${other.mkString(":")}'")
    })
}

/** The derivation functions, shared by the WRITER (per-row values), the
  * catalog's FunctionCatalog (the write shuffle's clustering keys) and
  * the SCAN (filter-literal → derived-value pruning) — one definition,
  * so the three sides can never disagree. */
object PartTransforms {
  /** splitmix64 finalizer — stable across JVMs, well-mixed for
    * power-of-two and prime bucket counts alike. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def bucketOfLong(v: Long, n: Int): Int =
    java.lang.Math.floorMod(mix64(v), n.toLong).toInt

  /** String keys hash via the JVM-spec-fixed 31-polynomial, then mix —
    * deterministic across sessions and executors. */
  def bucketOfString(s: String, n: Int): Int =
    bucketOfLong(s.hashCode.toLong, n)

  private def ld(epochDay: Int): java.time.LocalDate =
    java.time.LocalDate.ofEpochDay(epochDay.toLong)

  /** `yyyy-MM` — the q195 `~month` value shape (order-preserving). */
  def monthStr(epochDay: Int): String = {
    val d = ld(epochDay)
    f"${d.getYear}%04d-${d.getMonthValue}%02d"
  }

  def dayStr(epochDay: Int): String = ld(epochDay).toString // ISO yyyy-MM-dd

  def yearStr(epochDay: Int): String = f"${ld(epochDay).getYear}%04d"

  /** Months since the epoch — the FunctionCatalog `months` result (what
    * the write shuffle clusters on; bijective with [[monthStr]]). */
  def monthsInt(epochDay: Int): Int = {
    val d = ld(epochDay)
    (d.getYear - 1970) * 12 + d.getMonthValue - 1
  }

  def yearsInt(epochDay: Int): Int = ld(epochDay).getYear - 1970
}
