from codemix_dense_retrieval_tpu.evals.metrics import (
    Measure,
    aggregate,
    iter_calc,
    ndcg_statistics,
    parse_measure,
    parse_measures,
)

__all__ = [
    "Measure",
    "parse_measure",
    "parse_measures",
    "iter_calc",
    "aggregate",
    "ndcg_statistics",
]
