package graft.functions

/** The exact `round(x, 12) → cast DECIMAL(28,12)` scalar used by the
  * fused DSIR/LM scorers ([[DsirScore]], [[BigramScore]]), as a scaled
  * long — plus a memo, because the products being rounded are massively
  * repetitive (model counts are small integers, λ has ≤ B distinct
  * values), and the BigDecimal path costs two `Double.toString` parses
  * per call (the r17 per-job probe measured the scoring scan at ~1.8 s
  * of q80's 10× wall, dominated by exactly this).
  *
  * `scaled12(x)` ≡ Spark's
  * `cast(round(x, 12) AS DECIMAL(28,12)).unscaledValue`:
  * `BigDecimal.valueOf(x).setScale(12, HALF_UP).doubleValue()` (RoundBase,
  * DoubleType branch) then `BigDecimal.valueOf(t).setScale(12, HALF_UP)`
  * (Cast → Decimal.changePrecision — precision never binds at these
  * magnitudes). The memo is keyed on the double's raw bits, thread-local
  * (codegen reference objects are shared across a stage's tasks), and
  * capped — past the cap it computes without caching rather than grow.
  *
  * `toDouble(sum)` ≡ `cast(sum AS DOUBLE)` of the DECIMAL(·,12) sum:
  * `BigDecimal(unscaled, 12).doubleValue()`.
  */
private[graft] object Round12 {

  private val MemoCap = 1 << 20

  private val memo: ThreadLocal[java.util.HashMap[java.lang.Long, java.lang.Long]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[java.lang.Long, java.lang.Long]())

  def scaled12(x: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(x)
    val m = memo.get()
    val cached = m.get(bits)
    if (cached != null) cached.longValue()
    else {
      val t = java.math.BigDecimal.valueOf(x)
        .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
      val r = java.math.BigDecimal.valueOf(t)
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      if (m.size < MemoCap) m.put(bits, r)
      r
    }
  }

  def toDouble(sumScaled: Long): Double =
    java.math.BigDecimal.valueOf(sumScaled, 12).doubleValue()
}

/** Minimal open-address long→long map for the broadcast LM model:
  * [[BigramScore]] probes it twice per transition, and
  * `Arrays.binarySearch` over ~10⁶ keys is ~20 dependent cache misses
  * per probe where linear probing is ~1–2. Keys are hash64 values;
  * value 0 is reserved as "absent" (model counts are ≥ 1 by
  * construction, and the all-zero key slot is handled explicitly).
  */
private[graft] final class LongLongOpenHash private (
    keys: Array[Long], vals: Array[Long], mask: Int,
    zeroVal: Long) {

  /** Value for `k`, or 0 when absent. */
  def get(k: Long): Long = {
    if (k == 0L) return zeroVal
    var i = ((k * 0x9e3779b97f4a7c15L) >>> 32).toInt & mask
    while (true) {
      val kk = keys(i)
      if (kk == k) return vals(i)
      if (kk == 0L) return 0L
      i = (i + 1) & mask
    }
    0L // unreachable: load factor < 1 guarantees an empty slot
  }
}

private[graft] object LongLongOpenHash {

  def build(ks: Array[Long], vs: Array[Long]): LongLongOpenHash = {
    var cap = 16
    while (cap < ks.length * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val vals = new Array[Long](cap)
    val mask = cap - 1
    var zeroVal = 0L
    var j = 0
    while (j < ks.length) {
      val k = ks(j)
      if (k == 0L) zeroVal = vs(j)
      else {
        var i = ((k * 0x9e3779b97f4a7c15L) >>> 32).toInt & mask
        while (keys(i) != 0L && keys(i) != k) i = (i + 1) & mask
        keys(i) = k
        vals(i) = vs(j)
      }
      j += 1
    }
    new LongLongOpenHash(keys, vals, mask, zeroVal)
  }
}
