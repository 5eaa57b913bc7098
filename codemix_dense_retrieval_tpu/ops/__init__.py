from codemix_dense_retrieval_tpu.ops.topk import topk_ip, topk_ip_full, topk_ip_bins
from codemix_dense_retrieval_tpu.ops.mix import mix_and_renorm, l2_normalize

__all__ = ["topk_ip", "topk_ip_full", "topk_ip_bins", "mix_and_renorm", "l2_normalize"]
