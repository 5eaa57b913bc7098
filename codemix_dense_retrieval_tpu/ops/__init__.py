from codemix_dense_retrieval_tpu.ops.topk import topk_ip, topk_ip_full, topk_ip_bins
from codemix_dense_retrieval_tpu.ops.mix import mix_and_renorm, l2_normalize
from codemix_dense_retrieval_tpu.ops.sketch import (
    fit_sketch,
    sketch_rows,
    sketch_rows_int8,
    topk_ip_sketch,
    topk_ip_sketch_int8,
)
from codemix_dense_retrieval_tpu.ops.weight_quant import (
    QuantizedTensor,
    dequantize_tree,
    quantize_tree,
)

__all__ = [
    "topk_ip",
    "topk_ip_full",
    "topk_ip_bins",
    "mix_and_renorm",
    "l2_normalize",
    "fit_sketch",
    "sketch_rows",
    "topk_ip_sketch",
    "sketch_rows_int8",
    "topk_ip_sketch_int8",
    "QuantizedTensor",
    "quantize_tree",
    "dequantize_tree",
]
