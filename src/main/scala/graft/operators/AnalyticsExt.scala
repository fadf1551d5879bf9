package graft.operators

/** Extended warehouse / statistics / graph / process-mining
  * operators — assembled from the three part traits (r10
  * file-size refactor); call sites are unchanged.
  */
object AnalyticsExt extends AnalyticsExtGraph with AnalyticsExtStats with AnalyticsExtStatsB
    with AnalyticsExtOps
