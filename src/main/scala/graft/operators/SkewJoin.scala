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
  * The salt is `rand(seed)` — safe here because JOIN CORRECTNESS is
  * salt-invariant: whatever salt a left row draws (even a different one
  * on task retry), the right side carries every salt value, so the row
  * matches exactly once either way. A row-hash salt would be
  * deterministic but collapses when the hot key's rows are IDENTICAL
  * (all duplicates hash to one salt and the skew returns) and fails on
  * un-hashable column types.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, seed: Long = 42L): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(!(left.columns ++ right.columns).contains("_salt"),
      "input columns may not use the reserved name _salt")
    val l = left.withColumn("_salt", (rand(seed) * salts).cast("int"))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, l(key) === r(key) && l("_salt") === r("_salt"))
      .drop("_salt").drop(r(key))
  }
}
