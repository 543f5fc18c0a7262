package graft.ops

/** Additive Holt-Winters forecast as a GENERATED sequential-fold SQL
  * expression, parameterized by season length `m` and the three smoothing
  * constants — the production generalization of the fixed m=4 inline form
  * the `win_holt_winters` key shipped with (r4 VERDICT follow-up).
  *
  * The expression folds strictly sequentially (Spark `aggregate`) over a
  * trailing `collect_list` window column, carrying state
  * `ARRAY<DOUBLE>[lv, tr, s0..s(m-1), i]` (m+3 slots): level, trend, the m
  * seasonal offsets, and the consumed-sample counter that selects the
  * season slot. Every constant is emitted with a `D` suffix (the DECIMAL
  * literal trap) and complements (1-α etc.) are computed in EXACT decimal
  * (`BigDecimal`) so the generated literal is character-identical to what
  * a hand-written oracle would state — the bit-identical cross-engine fold
  * contract the fixed key already proved.
  *
  * Seeding:
  *  - `seedFirstSeason = false` — the simple seed (x₀, 0, 0⃗, 1): fold
  *    starts at the second sample. This is the fixed key's exact seeding,
  *    so delegation keeps its oracle hash-green.
  *  - `seedFirstSeason = true` — production seeding: level = mean of the
  *    first full season, trend 0, seasonal slot j = xⱼ − mean, fold starts
  *    after the season. Windows shorter than one season fall back to the
  *    simple seed (an IF in the expression), so short history degrades
  *    gracefully instead of folding garbage offsets.
  *
  * Scale shape is unchanged by parameterization: one user-keyed shuffle +
  * in-partition sort; state is (m+3) doubles per row regardless of data
  * size.
  */
object HoltWinters {

  /** Exact-decimal literal for `1 - x`, D-suffixed (e.g. 0.3 → "0.7D"). */
  private def comp(x: Double): String = s"${(BigDecimal(1) - BigDecimal(x.toString)).toString}D"
  private def lit(x: Double): String = s"${BigDecimal(x.toString).toString}D"

  /** SQL expression (over a `collect_list` column `lcol`) computing the
    * one-step additive Holt-Winters forecast lv + tr + s[next], floor-1e-4
    * quantized. */
  def forecastExpr(lcol: String, m: Int, alpha: Double = 0.3, beta: Double = 0.2,
                   gamma: Double = 0.3, seedFirstSeason: Boolean = false): String = {
    require(m >= 2, s"season length must be >= 2, got $m")
    val iSlot = m + 3
    val P = s"(CAST(element_at(acc, $iSlot) AS INT) % $m)"
    val SI = s"element_at(acc, $P + 3)"
    val LV = s"(${lit(alpha)} * (x - $SI) + ${comp(alpha)} * (element_at(acc, 1) + element_at(acc, 2)))"
    val TR = s"(${lit(beta)} * ($LV - element_at(acc, 1)) + ${comp(beta)} * element_at(acc, 2))"
    val SN = s"(${lit(gamma)} * (x - $LV) + ${comp(gamma)} * $SI)"
    val step = s"array($LV, $TR, " +
      (0 until m).map(j => s"IF($P = $j, $SN, element_at(acc, ${j + 3}))").mkString(", ") +
      s", element_at(acc, $iSlot) + 1.0D)"
    val fin = s"element_at(acc, 1) + element_at(acc, 2) + element_at(acc, $P + 3)"

    def fold(sliceFrom: Int, seed: String) =
      s"""aggregate(slice($lcol, $sliceFrom, greatest(size($lcol) - ${sliceFrom - 1}, 0)),
         |  $seed,
         |  (acc, x) -> $step,
         |  acc -> $fin)""".stripMargin

    val zeroSeed = s"array(CAST(element_at($lcol, 1) AS DOUBLE), 0.0D, " +
      Seq.fill(m)("0.0D").mkString(", ") + ", 1.0D)"
    val body =
      if (!seedFirstSeason) fold(2, zeroSeed)
      else {
        // mean of the first season by sequential fold (order-pinned, so the
        // accumulated double matches any engine's ordered-list sum)
        val mean = s"(aggregate(slice($lcol, 1, $m), 0.0D, (s, x) -> s + CAST(x AS DOUBLE)) / $m.0D)"
        val seasonSeed = s"array($mean, 0.0D, " +
          (0 until m).map(j => s"CAST(element_at($lcol, ${j + 1}) AS DOUBLE) - $mean").mkString(", ") +
          s", ${m}.0D)"
        s"IF(size($lcol) >= $m, ${fold(m + 1, seasonSeed)}, ${fold(2, zeroSeed)})"
      }
    s"floor(($body) * 1e4) / 1e4"
  }
}
