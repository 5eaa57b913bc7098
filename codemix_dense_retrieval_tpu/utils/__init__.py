from codemix_dense_retrieval_tpu.utils.logging import get_logger, setup_logging
from codemix_dense_retrieval_tpu.utils.timing import Timer, phase_timer
from codemix_dense_retrieval_tpu.utils.seeding import seed_everything


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (>= 1). Shape-bucketing helper: every
    distinct (batch, k, scatter-size) shape compiles a fresh XLA program,
    so dynamic sizes round up to powers of two throughout serving and the
    online-mutation paths."""
    return 1 << max(0, int(n - 1).bit_length())


__all__ = [
    "get_logger", "setup_logging", "Timer", "phase_timer",
    "seed_everything", "next_pow2",
]
