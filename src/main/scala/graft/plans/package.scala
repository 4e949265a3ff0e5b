package graft

/** Custom logical/physical plan nodes (the as-of join family) and the
  * rules/strategies that plant them, registered through
  * [[graft.GraftExtensions]].
  *
  * == Session invariant: cached-plan output partitioning is NOT stable ==
  *
  * [[graft.GraftSession]] sets
  * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true`,
  * so AQE is free to coalesce (and skew-split) the shuffles inside a
  * `.persist()`ed subtree — which means the partitioning and partition
  * COUNT of a cached DataFrame may differ run-to-run and scale-to-
  * scale. Every operator in this library honours that: no consumer
  * assumes a cached frame arrives hash-partitioned on any key; joins
  * and aggregations downstream of a persisted frame always declare
  * their own keys and let the planner insert (or AQE-reuse) the
  * exchange. Any NEW operator or plan node added here must keep that
  * contract — if it needs a specific physical partitioning it must
  * `repartition(...)` explicitly AFTER the cache boundary, never rely
  * on the cached plan's output partitioning. Rationale and the
  * measured cost of the pinned alternative (2–4× on the banded-dedup
  * family at sf0.1): SCALING.md, "Round 9: cached-plan pinning vs AQE
  * coalescing".
  */
package object plans
