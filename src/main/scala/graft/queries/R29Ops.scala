package graft.queries

import graft.QDef

/** Round-29 batch: a SQL-surface twin wave. Each query runs an existing
  * operator's portable oracle text VERBATIM through Spark's SQL parser
  * (the CcSql twin contract): one shared string is simultaneously the
  * DuckDB oracle and the whole Spark query, so the two engines cannot
  * drift — and the SQL surface a reference user would type is itself an
  * oracle-gated registered operator. Only texts whose plans stay bounded
  * qualify: these are all snapped-moment aggregate chains, bounded-frame
  * algebra, or bin-frame windows (x_sql_mood — carved out like
  * x_sql_cliffs); nothing here orders an sf-proportional frame.
  */
object R29Ops {

  private def twin(name: String, text: String, tables: String*): QDef =
    QDef(name, text) { (s, d) =>
      SqlSurface.viewed(s, d, tables: _*)
      s.sql(text)
    }

  val defs: Seq[QDef] = Seq(
    // One-way ANOVA F through Spark's SQL parser, same shared text.
    twin("x_sql_anova", R12Ops.AnovaSql, "orders", "customer"),
    // Jensen-Shannon divergence, same shared text.
    twin("x_sql_js", R15Ops.JsSql, "orders", "customer"),
    // Markov entropy rate, same shared text.
    twin("x_sql_entropy_rate", R16Ops.EntropyRateSql, "events"),
    // Gumbel extreme-value fit, same shared text.
    twin("x_sql_gumbel", R16Ops.GumbelSql, "events"),
    // Grubbs' outlier test, same shared text.
    twin("x_sql_grubbs", R18Ops.GrubbsSql, "orders", "customer"),
    // Hill-number diversity ladder, same shared text.
    twin("x_sql_hill", R18Ops.HillSql,
      "lineitem", "supplier", "nation", "part"),
    // Variance inflation factors, same shared text.
    twin("x_sql_vif", R23Ops.VifSql, "lineitem"),
    // Cohen's d / Hedges' g, same shared text.
    twin("x_sql_cohens", R28Ops.CohensSql, "orders", "customer"),
    // Tukey-Kramer HSD, same shared text.
    twin("x_sql_tukey", R28Ops.TukeySql, "orders", "customer"),
    // Friedman test, same shared text.
    twin("x_sql_friedman", R28Ops.FriedmanSql, "orders", "customer"),
    // Mood's median test, same shared text (bin-frame windows — the
    // x_sql_cliffs carve-out class).
    twin("x_sql_mood", R28Ops.MoodSql, "orders", "customer"),
    // Poisson dispersion, same shared text.
    twin("x_sql_poisson", R28Ops.PoissonSql, "events")
  )
}
