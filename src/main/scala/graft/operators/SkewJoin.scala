package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual complement to AQE's
  * skew-join splitting, for when one side's heavy-hitter keys would pin a
  * single reducer (the reference's sha256-mod sharding has exactly this
  * failure mode and no mitigation — `default/partition.py:4-12`, SURVEY.md
  * §7.2).
  *
  * Mechanics: each LEFT row gets a random salt in [0, salts); the RIGHT
  * side is replicated once per salt value. The join key becomes
  * (key, salt), so a key carrying 40% of the left table spreads over
  * `salts` reducers instead of one. Right-side replication costs
  * |right| × salts rows — use only when right is much smaller than the
  * skewed left (the usual shape: huge skewed fact ⋈ modest dimension that
  * is still too big to broadcast).
  *
  * The salt is derived from a hash of the whole left row (monotonically_
  * increasing_id is unstable under retries; rand() breaks determinism),
  * so results are reproducible and the operator is safe under task
  * re-execution.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // deterministic per-row salt: hash every left column
    val saltCol = pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salts))
    val l = left.withColumn("_salt", saltCol)
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, l(key) === r(key) && l("_salt") === r("_salt"))
      .drop("_salt").drop(r(key))
  }
}
