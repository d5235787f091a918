package graft

/** Round-14 oracle statements.
  *
  * x308 reuses the proven x281 generated chain (OracleSqlRound12
  * .mChunkChainAt) with the Ave reducer swapped in — the only varying
  * fragment is the `partial` → `final_rb` fusion stage, so the
  * membership/weight/scoring SQL stays byte-identical to the committed
  * x281 contract.
  */
object OracleSqlRound14 {

  /** The Ave fusion stage (Chi-FRBCS-BigData-Ave): per (antecedent,
    * consequent) average the partial-RB weights — numerator an exact
    * BIGINT sum of once-quantized micro-unit weights, the cross-consequent
    * comparison scaled by 720720 // cnt (lcm(1..16)) so averages over
    * different chunk counts compare in exact integers. The emitted rw is
    * the quantized average, one IEEE divide spelled identically on the
    * engine side (ChiMl.mChunkAveFusedRbFrom). */
  private val aveFusionSql =
    """avew AS (SELECT a1, a2, rule_cls,
      |                CAST(SUM(CAST(ROUND(rw * 1000000, 0) AS BIGINT))
      |                     AS BIGINT) AS s_micro,
      |                COUNT(*) AS cnt
      |         FROM partial GROUP BY 1, 2, 3),
      |fused AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY a1, a2
      |                                       ORDER BY s_micro * (720720 // cnt) DESC,
      |                                                rule_cls) AS fn
      |          FROM avew),
      |final_rb AS (SELECT a1, a2, rule_cls,
      |                    CAST(s_micro AS DOUBLE)
      |                      / CAST(cnt * 1000000 AS DOUBLE) AS rw
      |             FROM fused WHERE fn = 1),""".stripMargin

  val round14: Map[String, String] = Map(
    // x308: the m-chunk ablation under Ave fusion — one generated
    // train+score chain per m ∈ {1, 4, 16}, unioned (the x281 device).
    "x308_chi_mchunk_ave" ->
      Seq(1, 4, 16)
        .map(m => OracleSqlRound12.mChunkChainAt(m, aveFusionSql))
        .mkString("", "\nUNION ALL\n", "\nORDER BY m")
  )
}
