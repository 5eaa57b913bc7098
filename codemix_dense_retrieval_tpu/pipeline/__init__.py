from codemix_dense_retrieval_tpu.pipeline.query_cache import (
    load_query_cache,
    save_query_cache,
)
from codemix_dense_retrieval_tpu.pipeline.corpus import (
    SelectionState,
    TsvCorpusSource,
    SyntheticCorpusSource,
    encode_corpus,
)
from codemix_dense_retrieval_tpu.pipeline.runs import (
    run_word_mix_search,
    run_vector_mix_search,
)
from codemix_dense_retrieval_tpu.pipeline.bilingual import (
    run_bilingual_word_mix,
    run_bilingual_vector_mix,
)

__all__ = [
    "load_query_cache",
    "save_query_cache",
    "SelectionState",
    "TsvCorpusSource",
    "SyntheticCorpusSource",
    "encode_corpus",
    "run_word_mix_search",
    "run_vector_mix_search",
    "run_bilingual_word_mix",
    "run_bilingual_vector_mix",
]
