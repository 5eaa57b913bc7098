from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig, XLMREncoder
from codemix_dense_retrieval_tpu.models.dialects import (
    detect_encoder_family,
    doc_prefix,
    query_prefix,
)

__all__ = [
    "XLMRConfig",
    "XLMREncoder",
    "detect_encoder_family",
    "query_prefix",
    "doc_prefix",
]
