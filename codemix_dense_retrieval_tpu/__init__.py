"""TPU-native framework for code-mixed multilingual dense retrieval.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
reference pipeline ``cmHuang777/codemix-dense-retrieval``:

- multilingual corpus encoding (BGE-M3/XLM-R family, mE5, GTE, Jina-v3,
  Qwen3-Embedding) as jit/pjit programs with Pallas flash-attention;
- an exact inner-product vector index sharded across TPU HBM with a fused
  Pallas dot-product + k-selection kernel and an ICI all-gather top-k merge
  (replacing FAISS ``IndexFlatIP`` / ``GpuIndexFlatIP``);
- on-device vector-mix lambda-interpolation of bilingual query embeddings;
- bilingual hub indexes with max-score collapse;
- TREC runs and a native nDCG/MRR/P/R/AP evaluator with common-qid and
  indexed-docid filtering.

Subpackages (imported lazily; importing the top-level package is cheap and
does not pull in JAX):

- ``io``        host-side data contracts (TSV, TREC, shard store, naming)
- ``ops``       Pallas/XLA kernels (fused matmul+top-k, flash attention, mix)
- ``models``    Flax encoders + HF weight conversion + tokenizers
- ``parallel``  mesh construction, sharded search, tensor parallelism
- ``index``     the dense flat index (FAISS replacement)
- ``pipeline``  end-to-end drivers (encode, search runs, mix runs, bilingual)
- ``evals``     metrics + evaluate CLI
- ``analysis``  collectors / paper values / embedding-space analyzer
- ``orchestrate`` experiment scheduler (replaces the reference bash layer)
"""

from codemix_dense_retrieval_tpu.version import __version__

__all__ = ["__version__"]
