"""DataFrame-to-DataFrame operators.

Each module maps a block of SURVEY.md §2's inventory:

* :mod:`select`    — Q1-Q4, Q6 (point/range/membership/nearest selection)
* :mod:`joins`     — §2.5 (semi/anti update split, combine_first, as-of /
  tolerance joins)
* :mod:`gaps`      — W9 (gaps-and-islands contiguous-region detection)
* :mod:`reindex`   — Q9, Q14 (dense reindex, completeness check)
* :mod:`aggregations` — Q12, Q16, Q17, A12 (extents, bbox, grouped/rolling)
* :mod:`qc`        — A1-A8 (statistical quality gates)
* :mod:`dedup`     — Q22 + north-star dedup family
* :mod:`similarity`— north-star ANN search (brute force, LSH, IVF, int8, PQ)
* :mod:`clustering`— spherical k-means + SemDeDup semantic dedup
* :mod:`spatial`   — great-circle nearest-cell snap (degree-bucket join)
* :mod:`text`      — north-star text analysis (+ resampling, epoch order)
* :mod:`regrid`    — coarsen / bilinear / conservative regridding
* :mod:`skew`      — 100 TB hardening: salted joins, two-phase aggs
* :mod:`zorder`    — Morton-code clustering maintenance
* :mod:`ivm`       — incremental rollup maintenance
"""
