from codemix_dense_retrieval_tpu.index.flat import DenseFlatIndex

__all__ = ["DenseFlatIndex"]
