from codemix_dense_retrieval_tpu.io.tsv import (
    read_queries_tsv,
    read_qrels,
    write_queries_tsv,
    write_qrels_tsv,
)
from codemix_dense_retrieval_tpu.io.trec import (
    RunEntry,
    collapse_run_max,
    read_run,
    write_run,
)
from codemix_dense_retrieval_tpu.io.shards import (
    ShardStore,
    ShardWriter,
    concat_stores,
)

__all__ = [
    "read_queries_tsv",
    "read_qrels",
    "write_queries_tsv",
    "write_qrels_tsv",
    "RunEntry",
    "read_run",
    "write_run",
    "collapse_run_max",
    "ShardStore",
    "ShardWriter",
    "concat_stores",
]
